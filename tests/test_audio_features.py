"""Acoustic feature extraction: independent numpy parity, planted-defect
recall/precision on the audio_q fixture, null safety, and the
check_acoustics pipeline stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow import audio
from qcflow.parity.audio_q import _FIX, _materialize, audio_quality_flags
from qcflow.udfs import with_audio_features


def _ref_features(x: np.ndarray, sr: int) -> dict:
    """Independent reference (different code shape: loops + np.diff)."""
    x = x.astype(np.float64)
    out = {
        "ac_rms": float(np.sqrt((x**2).sum() / len(x))),
        "ac_peak": float(max(abs(x.min()), abs(x.max()))),
        "clip_ratio": float((np.abs(x) >= 0.95).sum() / len(x)),
        "dc_offset": float(x.sum() / len(x)),
        "zcr": float(
            (np.diff((x >= 0).astype(int)) != 0).sum() / (len(x) - 1)
        ),
    }
    fl = int(round(sr * 0.02))
    rmss = [
        float(np.sqrt(np.mean(x[s : s + fl] ** 2)))
        for s in range(0, len(x) - fl + 1, fl)
    ]
    out["silence_ratio"] = float(np.mean([r < 0.01 for r in rmss]))
    return out


def test_features_match_independent_reference(spark):
    rng = np.random.default_rng(77)
    rows, refs = [], []
    for i, sr in enumerate([8000, 16000, 8000, 16000]):
        n = int(sr * 0.5)
        t = np.arange(n) / sr
        x = [
            0.4 * np.sin(2 * np.pi * 440 * t),
            np.clip(3.0 * np.sin(2 * np.pi * 200 * t), -0.999, 0.999),
            np.full(n, 0.001),
            0.3 * np.sin(2 * np.pi * 100 * t) + 0.2,
        ][i]
        x = np.clip(x + rng.normal(0, 0.005, n), -0.999, 0.999).astype(np.float32)
        # pcm16 roundtrips near-exactly -> reference computed on the
        # DECODED wave so quantization isn't a tolerance term
        dec = audio.pcm16_decode(audio.pcm16_encode(x))
        rows.append((f"c{i}", audio.pcm16_encode(x), sr, "pcm16"))
        refs.append(_ref_features(dec, sr))
    df = spark.createDataFrame(
        rows, "clip_id string, bytes binary, sr_hz int, codec string"
    )
    got = with_audio_features(df).toPandas().set_index("clip_id").sort_index()
    for i, ref in enumerate(refs):
        row = got.loc[f"c{i}"]
        assert row["ac_n_samples"] == int(8000 * 0.5) or row["ac_n_samples"] == int(
            16000 * 0.5
        )
        for k, v in ref.items():
            assert row[k] == pytest.approx(v, abs=1e-9), (i, k)


def test_null_bytes_and_unknown_codec_yield_null_features(spark):
    """Garbage rows are row-level NULLs, never task-fatal: NULL bytes,
    unknown codec, NULL sr_hz (Arrow null -> NaN -> int() raises), and
    malformed payloads (odd-length pcm16 breaks frombuffer)."""
    df = spark.createDataFrame(
        [
            ("a", None, 8000, "pcm16"),
            ("b", b"\x00\x01", 8000, "opus"),
            ("d", b"\x00\x01\x02", 8000, "pcm16"),  # odd-length payload
        ],
        "clip_id string, bytes binary, sr_hz int, codec string",
    )
    got = with_audio_features(df).toPandas()
    feat_cols = [
        "ac_n_samples",
        "ac_rms",
        "ac_peak",
        "clip_ratio",
        "silence_ratio",
        "zcr",
        "dc_offset",
    ]
    assert got[feat_cols].isna().all().all()
    # valid bytes + NULL sr takes the 8000 frame-grid fallback instead:
    # real features, not a dead row (and definitely not a dead task)
    wave = audio.pcm16_encode(np.sin(np.arange(4000) / 10).astype(np.float32) * 0.4)
    df2 = spark.createDataFrame(
        [("e", wave, None, "pcm16")],
        "clip_id string, bytes binary, sr_hz int, codec string",
    )
    got2 = with_audio_features(df2).toPandas()
    assert got2["ac_n_samples"].iloc[0] == 4000
    assert not got2[feat_cols].isna().any().any()


def test_planted_defects_recovered_exactly(spark):
    """Every planted label recovered from bytes alone; zero false flags."""
    _materialize()
    got = audio_quality_flags(spark, "").toPandas().set_index("clip_id")
    truth = pd.read_parquet(_FIX, columns=["clip_id", "planted"]).set_index(
        "clip_id"
    )
    j = got.join(truth)
    assert len(j) == 400 and not j["planted"].isna().any()
    assert (j["is_clipped"] == (j["planted"] == "clipped_audio")).all()
    assert (j["is_silent"] == (j["planted"] == "silent_audio")).all()
    assert (j["has_dc_offset"] == (j["planted"] == "dc_offset")).all()
    assert (j["is_noisy"] == (j["planted"] == "noisy_audio")).all()
    # the fixture genuinely exercises each defect and the clean regime
    for plant in ("clipped_audio", "silent_audio", "dc_offset", "noisy_audio"):
        assert (j["planted"] == plant).sum() >= 50, plant
    assert (j["planted"] == "").sum() >= 100


def test_pipeline_check_acoustics_drops_planted(spark):
    """score_clips(check_acoustics=True) on the fixture: acoustic defects
    land in drop_reasons; clean rows carry no acoustic reason."""
    from qcflow.pipeline import score_clips
    from qcflow.rules import Thresholds

    _materialize()
    clips = (
        spark.read.parquet(_FIX)
        .withColumn("dur_ms", F.lit(1000))
        .withColumn("transcript", F.lit("plain normal words spoken here"))
    )
    # fixed thresholds: this test isolates the acoustic rules
    thr = Thresholds(repetition_lo=0.0, cps_lo=0.0, cps_hi=1e9, ppl_hi=1e9)
    res = score_clips(spark, clips, thresholds=thr, check_acoustics=True)
    got = res.scored.select("clip_id", "drop_reasons").toPandas().set_index("clip_id")
    res.release()
    truth = pd.read_parquet(_FIX, columns=["clip_id", "planted"]).set_index(
        "clip_id"
    )
    j = got.join(truth)
    for reason in ("clipped_audio", "silent_audio", "dc_offset", "noisy_audio"):
        planted = j["planted"] == reason
        fired = j["drop_reasons"].str.contains(reason)
        assert (planted == fired).all(), reason


def test_spectral_flatness_separates_tone_from_noise():
    """Calibration behind NOISY_FLATNESS_MAX: tonal content sits orders
    of magnitude below the threshold, broadband noise far above, and a
    sub-frame clip yields NaN (rule can never fire)."""
    from qcflow.rules import NOISY_FLATNESS_MAX
    from qcflow.udfs import spectral_flatness

    rng = np.random.default_rng(11)
    t = np.arange(16000) / 16000.0
    tone = (0.4 * np.sin(2 * np.pi * 440 * t) + rng.normal(0, 0.01, 16000)).astype(
        np.float32
    )
    noise = rng.normal(0, 0.25, 16000).astype(np.float32)
    assert spectral_flatness(tone) < 0.05 < NOISY_FLATNESS_MAX
    assert spectral_flatness(noise) > NOISY_FLATNESS_MAX
    assert np.isnan(spectral_flatness(tone[:2000]))


def test_audio_fp64_gain_invariant_and_jitter_robust():
    """Fingerprint sign bits survive global gain and low-amplitude
    additive noise; distinct content diverges toward ~32 bits."""
    from qcflow import audio

    rng = np.random.default_rng(77)
    sr, n = 16000, 12000
    t = np.arange(n) / sr
    x = sum(
        a * np.sin(2 * np.pi * f * t)
        for a, f in ((0.2, 440.0), (0.12, 1333.0), (0.08, 2741.0))
    ) + rng.normal(0, 0.01, n)
    fp = audio.audio_fp64(x, sr)
    assert fp == audio.audio_fp64(x.copy(), sr)  # deterministic
    assert audio.fp_hamming(fp, audio.audio_fp64(0.5 * x, sr)) == 0
    jit = x + rng.normal(0, 0.0005, n)
    assert audio.fp_hamming(fp, audio.audio_fp64(jit, sr)) <= 3
    other = sum(
        a * np.sin(2 * np.pi * f * t)
        for a, f in ((0.15, 620.0), (0.1, 987.0), (0.09, 3105.0))
    ) + rng.normal(0, 0.01, n)
    assert audio.fp_hamming(fp, audio.audio_fp64(other, sr)) >= 12
    assert audio.audio_fp64(np.zeros(3), sr) == 0  # degenerate input


def test_with_audio_fp_nulls_and_bit_exactness(spark):
    """NULL bytes / unknown codec -> NULL fingerprint; decodable rows
    reproduce the driver-side kernel BIT-exactly (catches any float64
    staging of the 64-bit word, which corrupts |fp| >= 2^53)."""
    from qcflow import audio
    from qcflow.udfs import with_audio_fp

    rng = np.random.default_rng(78)
    sr, n = 8000, 6000
    t = np.arange(n) / sr
    rows = []
    expect = {}
    for i in range(6):
        x = (
            0.3 * np.sin(2 * np.pi * (300.0 + 137.0 * i) * t)
            + rng.normal(0, 0.01, n)
        ).astype(np.float32)
        b = audio.pcm16_encode(x)
        rows.append((i, bytearray(b), "pcm16", sr))
        expect[i] = audio.audio_fp64(audio.pcm16_decode(b), sr)
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x00\x01"), "opus", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {
        r["clip_id"]: r["audio_fp"]
        for r in with_audio_fp(df).select("clip_id", "audio_fp").collect()
    }
    assert got[90] is None and got[91] is None
    for i, fp in expect.items():
        assert got[i] == fp, (i, got[i], fp)
    # at least one fixture-style fingerprint must exercise the high bits
    assert any(abs(v) >= 2**53 for v in expect.values())


def test_with_loudness_nulls_caps_and_bit_exactness(spark):
    """NULL bytes / unknown codec -> all-NULL loudness outputs; decodable
    rows reproduce the driver-side kernel bit-exactly; the gain cap and
    post-gain clip flag fire where constructed."""
    from qcflow.udfs import with_loudness

    sr, n = 8000, 5000
    t = np.arange(n) / sr
    base = np.sin(2 * np.pi * 440.0 * t)
    rows, expect = [], {}
    for i, target in enumerate((0.002, 0.05, 0.3)):
        x = (base * target / float(np.sqrt(np.mean(base**2)))).astype(
            np.float32
        )
        if i == 1:  # spike -> peak * gain > 1
            x[100] = 0.8
        b = audio.pcm16_encode(x)
        rows.append((i, bytearray(b), "pcm16", sr))
        expect[i] = audio.loudness_gain(audio.pcm16_decode(b))
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x00\x01"), "opus", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {
        r["clip_id"]: (r["rms"], r["gain_db"], r["clip_after"])
        for r in with_loudness(df).collect()
    }
    assert got[90] == (None, None, None)
    assert got[91] == (None, None, None)
    for i, (rms, gdb, clip) in expect.items():
        assert got[i] == (rms, gdb, clip), (i, got[i], expect[i])
    assert got[0][1] == 20.0 * np.log10(audio.MAX_GAIN)  # cap fires
    assert got[1][2] is True and got[2][2] is False  # clip flag
    assert got[2][1] < 0.0  # hot clip attenuates


def test_with_trim_silence_nulls_and_planted_bounds(spark):
    """NULL bytes / unknown codec -> all-NULL trim bounds; planted
    frame-aligned pads are recovered exactly through pcm16 bytes; an
    all-silent clip trims to nothing."""
    from qcflow.udfs import trim_bounds, with_trim_silence

    rng = np.random.default_rng(81)
    sr, fl = 8000, 160
    rows, expect = [], {}
    for i, (lead_fr, trail_fr) in enumerate(((3, 5), (0, 7), (11, 0))):
        tone = 0.3 * np.sin(2 * np.pi * 440.0 * np.arange(12 * fl) / sr)
        x = np.concatenate(
            [
                rng.normal(0.0, 0.0005, lead_fr * fl),
                tone,
                rng.normal(0.0, 0.0005, trail_fr * fl),
            ]
        ).astype(np.float32)
        b = audio.pcm16_encode(x)
        rows.append((i, bytearray(b), "pcm16", sr))
        # planted pads ARE the kernel's answer on the roundtrip
        s, e = trim_bounds(audio.pcm16_decode(b), sr)
        assert (s, e) == (lead_fr * fl, (lead_fr + 12) * fl)
        expect[i] = (s, e - s, len(x) - e)
    silent = rng.normal(0.0, 0.0005, 8 * fl).astype(np.float32)
    rows.append((3, bytearray(audio.pcm16_encode(silent)), "pcm16", sr))
    expect[3] = (0, 0, 8 * fl)
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x00\x01"), "amr", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {
        r["clip_id"]: (r["lead_samples"], r["kept_samples"], r["trail_samples"])
        for r in with_trim_silence(df).collect()
    }
    assert got[90] == (None, None, None) and got[91] == (None, None, None)
    for i, want in expect.items():
        assert got[i] == want, (i, got[i], want)


def test_resample_kernel_properties():
    """Windowed-sinc resampler: tone preserved through a rate change,
    DC exact, alias energy crushed on downsample, block-size/layout
    invariant, rational lengths exact."""
    from qcflow.audio import resample, snr_db

    sr = 16000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    y = resample(x, 16000, 8000)
    assert len(y) == 8000
    core = y[200:-200].astype(np.float64)
    assert abs(np.argmax(np.abs(np.fft.rfft(core))) * 8000 / len(core) - 1000.0) < 2.0
    z = resample(y, 8000, 16000)
    assert snr_db(x[400:-400], z[400:-400]) > 40.0  # band-limited roundtrip
    dc = np.full(5000, 0.25, dtype=np.float32)
    assert np.max(np.abs(resample(dc, 8000, 16000)[50:-50] - 0.25)) == 0.0
    a = resample(x, 16000, 22050, block=8192)
    b = resample(x, 16000, 22050, block=137)
    assert np.array_equal(a, b)  # integer tap phase -> layout-invariant
    alias = resample((0.4 * np.sin(2 * np.pi * 6500 * t)).astype(np.float32), 16000, 8000)
    assert float(np.sqrt(np.mean(alias**2))) < 0.01  # 6.5 kHz must not fold
    assert len(resample(np.zeros(44100, np.float32), 44100, 16000)) == 16000
    assert len(resample(np.zeros(0, np.float32), 8000, 16000)) == 0
    assert np.array_equal(resample(x, 16000, 16000), x)


def test_with_trim_reencode_substring_and_nulls(spark):
    """pcm16 re-encoded slice is byte-identical to the payload substring
    b[2*lead : 2*(lead+kept)]; all-silent clips emit EMPTY bytes; ulaw
    re-encode is idempotent on its own decode; NULL/unknown rows NULL."""
    from qcflow.udfs import trim_bounds, with_trim_reencode

    rng = np.random.default_rng(83)
    sr, fl = 8000, 160
    rows = []
    tone = 0.3 * np.sin(2 * np.pi * 500.0 * np.arange(10 * fl) / sr)
    x = np.concatenate(
        [rng.normal(0.0, 0.0005, 4 * fl), tone, rng.normal(0.0, 0.0005, 6 * fl)]
    ).astype(np.float32)
    b_pcm = audio.pcm16_encode(x)
    b_ulaw = audio.ulaw_encode(x)
    rows.append((0, bytearray(b_pcm), "pcm16", sr))
    rows.append((1, bytearray(b_ulaw), "ulaw", sr))
    silent = rng.normal(0.0, 0.0005, 5 * fl).astype(np.float32)
    rows.append((2, bytearray(audio.pcm16_encode(silent)), "pcm16", sr))
    rows.append((3, None, "pcm16", sr))
    rows.append((4, bytearray(b"\x00"), "mp3", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {r["clip_id"]: r for r in with_trim_reencode(df).collect()}
    s, e = trim_bounds(audio.pcm16_decode(b_pcm), sr)
    assert bytes(got[0]["trim_bytes"]) == b_pcm[2 * s : 2 * e]  # substring
    assert got[0]["trim_samples"] == e - s and got[0]["lead_samples"] == s
    su, eu = trim_bounds(audio.ulaw_decode(b_ulaw), sr)
    assert bytes(got[1]["trim_bytes"]) == b_ulaw[su:eu]  # ulaw idempotent
    assert bytes(got[2]["trim_bytes"]) == b"" and got[2]["trim_samples"] == 0
    for cid in (3, 4):
        assert got[cid]["trim_bytes"] is None
        assert got[cid]["trim_samples"] is None


def test_with_resample_lengths_content_and_nulls(spark):
    """rs_samples = floor(n * target / sr) for every valid rate; the
    executor-side bytes equal the driver-side kernel's bytes exactly;
    NULL/unknown rows NULL; bad target_sr raises."""
    import pytest as _pytest

    from qcflow.udfs import with_resample

    rng = np.random.default_rng(84)
    rows, want = [], {}
    for i, sr in enumerate(audio.VALID_SR):
        n = int(sr * 0.3)
        t = np.arange(n) / sr
        x = (
            0.3 * np.sin(2 * np.pi * 800.0 * t)
            + rng.normal(0.0, 0.01, n)
        ).astype(np.float32)
        x = np.clip(x, -0.999, 0.999)
        b = audio.pcm16_encode(x)
        rows.append((i, bytearray(b), "pcm16", sr))
        y = audio.resample(audio.pcm16_decode(b), sr, 16000)
        want[i] = (audio.pcm16_encode(y), len(y))
        assert len(y) == n * 16000 // sr
    rows.append((90, None, "pcm16", 8000))
    rows.append((91, bytearray(b"\x01\x02"), "aac", 8000))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {r["clip_id"]: r for r in with_resample(df, 16000).collect()}
    for i, (wb, wn) in want.items():
        assert bytes(got[i]["rs_bytes"]) == wb and got[i]["rs_samples"] == wn
    assert got[90]["rs_bytes"] is None and got[91]["rs_samples"] is None
    with _pytest.raises(ValueError):
        with_resample(df, 11025)


def test_with_snr_estimate_regimes_and_nulls(spark):
    """Clean tone bursts score a much higher blind SNR than the same
    bursts buried in heavy noise; pure noise scores near 0 dB; NULL /
    unknown-codec rows NULL out; empty clips hit the -140 dB floor."""
    from qcflow.udfs import snr_estimate, with_snr_estimate

    rng = np.random.default_rng(85)
    sr, fl, n_fr = 8000, 160, 40
    n = n_fr * fl
    t = np.arange(n) / sr
    tone = 0.4 * np.sin(2 * np.pi * 700.0 * t)
    on = np.repeat(rng.random(n_fr) < 0.4, fl)
    rows = []
    for cid, sigma in ((0, 0.002), (1, 0.1)):
        x = rng.normal(0.0, sigma, n)
        x[on] += tone[on]
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        rows.append((cid, bytearray(audio.pcm16_encode(x)), "pcm16", sr))
    noise = np.clip(rng.normal(0.0, 0.05, n), -0.999, 0.999).astype(np.float32)
    rows.append((2, bytearray(audio.pcm16_encode(noise)), "pcm16", sr))
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x01"), "ogg", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {r["clip_id"]: r for r in with_snr_estimate(df).collect()}
    assert got[0]["snr_est_db"] > 25.0  # clean
    assert got[1]["snr_est_db"] < got[0]["snr_est_db"] - 10.0  # buried
    assert got[2]["snr_est_db"] < 6.0  # pure noise: narrow RMS spread
    assert got[1]["noise_floor_db"] > got[0]["noise_floor_db"]  # hotter floor
    assert got[90]["snr_est_db"] is None and got[91]["noise_floor_db"] is None
    nf, sp, sn = snr_estimate(np.zeros(0, dtype=np.float32), sr)
    assert nf == sp == 20.0 * np.log10(1e-7) and sn == 0.0


def test_segment_clips_bounds_payloads_and_nulls(spark):
    """Fixed-window segmentation: boundary keep/drop for the trailing
    partial, pcm16 payloads equal to the decoded slices, undecodable
    rows vanish, and the plan crosses Python exactly once."""
    from qcflow import audio
    from qcflow.udfs import segment_clips

    sr = 8000
    win = int(sr * 0.4)  # 3200 samples
    rng = np.random.default_rng(77)

    def mk(n):
        return np.clip(rng.normal(0.0, 0.2, n), -0.999, 0.999).astype(np.float32)

    xs = {
        0: mk(2 * win),            # exact multiple -> 2 segments
        1: mk(2 * win + win // 2), # tail == min_keep -> kept (3 segs)
        2: mk(2 * win + win // 2 - 1),  # tail just below -> dropped (2)
        3: mk(win - 1),            # single sub-window clip -> 1 short seg
    }
    rows = [
        (cid, bytearray(audio.pcm16_encode(x)), "pcm16", sr)
        for cid, x in xs.items()
    ]
    rows.append((4, bytearray(audio.ulaw_encode(xs[0])), "ulaw", sr))
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x01\x02"), "flac", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    out = segment_clips(df, win_ms=400)
    assert "bytes" not in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    got = out.collect()
    by_clip: dict = {}
    for r in got:
        by_clip.setdefault(r["clip_id"], []).append(r)
    assert {len(by_clip[c]) for c in (0, 4)} == {2}
    assert len(by_clip[1]) == 3 and by_clip[1][-1]["n_samples"] == win // 2
    assert len(by_clip[2]) == 2
    assert len(by_clip[3]) == 1 and by_clip[3][0]["n_samples"] == win - 1
    assert 90 not in by_clip and 91 not in by_clip
    # payload bytes = pcm16 of the decoded slice (ulaw goes through its
    # roundtrip quantization first)
    seg0 = sorted(by_clip[0], key=lambda r: r["seg_idx"])[0]
    dec = audio.decode(audio.pcm16_encode(xs[0]), "pcm16")
    assert bytes(seg0["seg_bytes"]) == audio.pcm16_encode(dec[:win])
    dec_u = audio.decode(audio.ulaw_encode(xs[0]), "ulaw")
    seg4 = sorted(by_clip[4], key=lambda r: r["seg_idx"])[1]
    assert bytes(seg4["seg_bytes"]) == audio.pcm16_encode(dec_u[win : 2 * win])
    # every decodable clip's kept samples are a prefix partition of the
    # original: sum of n_samples == sum of bound spans
    for cid, x in xs.items():
        bounds = audio.segment_bounds(len(x), win)
        assert [r["n_samples"] for r in sorted(by_clip[cid], key=lambda r: r["seg_idx"])] == [
            e - s for s, e in bounds
        ]


def test_align_transcript_segments_partition_and_order(spark):
    """Alignment invariants: every word lands in exactly one segment,
    segment ids are within segment_bounds' count, and concatenating
    seg_text in seg order reproduces the normalized transcript."""
    from qcflow import audio
    from qcflow.features import align_transcript_segments

    sr, win = 8000, 3200
    rng = np.random.default_rng(5)
    rows = []
    for cid in range(12):
        n = int(rng.integers(win // 2, 5 * win))
        x = np.zeros(n, dtype=np.float32)
        words = " ".join(f"c{cid}w{k}" for k in range(int(rng.integers(1, 40))))
        codec = "pcm16" if cid % 2 == 0 else "ulaw"
        b = audio.pcm16_encode(x) if codec == "pcm16" else audio.ulaw_encode(x)
        rows.append((str(cid), bytearray(b), codec, sr, words, n))
    df = spark.createDataFrame(
        [r[:5] for r in rows],
        "clip_id string, bytes binary, codec string, sr_hz int, transcript string",
    )
    out = align_transcript_segments(df, win_ms=400).collect()
    by_clip: dict = {}
    for r in out:
        by_clip.setdefault(r["clip_id"], []).append(r)
    for cid, b, codec, _, words, n in [
        (r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows
    ]:
        segs = sorted(by_clip.get(cid, []), key=lambda r: r["seg_idx"])
        n_segs = len(audio.segment_bounds(n, win))
        if n_segs == 0:
            assert not segs
            continue
        assert segs and segs[-1]["seg_idx"] < n_segs
        assert " ".join(s["seg_text"] for s in segs) == words
        assert sum(s["n_words_seg"] for s in segs) == len(words.split())
        # monotone: word midpoints are increasing, so segment ids are too
        assert [s["seg_idx"] for s in segs] == sorted(s["seg_idx"] for s in segs)


def test_with_speed_perturb_lengths_content_and_nulls(spark):
    """Speed perturbation: output lengths are n*den//num, a pure tone at
    f comes back at f*num/den (measured by zero crossings), nulls and
    unknown codecs vanish, single Arrow crossing."""
    from qcflow import audio
    from qcflow.udfs import with_speed_perturb

    sr, n = 8000, 8000
    t = np.arange(n) / sr
    tone = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    rows = [
        (0, bytearray(audio.pcm16_encode(tone)), "pcm16", sr),
        (1, bytearray(audio.ulaw_encode(tone)), "ulaw", sr),
        (90, None, "pcm16", sr),
        (91, bytearray(b"\x01"), "mp3", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    out = with_speed_perturb(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    got = out.collect()
    by = {}
    for r in got:
        by.setdefault(r["clip_id"], {})[(r["f_num"], r["f_den"])] = r
    assert set(by) == {0, 1}
    for cid in (0, 1):
        assert by[cid][(9, 10)]["sp_samples"] == n * 10 // 9
        assert by[cid][(11, 10)]["sp_samples"] == n * 10 // 11
    # pitch scales with tempo: zero-crossing rate of the 1.1x payload is
    # ~1.1x the original's (440 Hz -> 484 Hz at the same sr)
    y = audio.pcm16_decode(bytes(by[0][(11, 10)]["sp_bytes"]))
    zc = lambda v: int(np.sum(np.signbit(v[:-1]) != np.signbit(v[1:])))  # noqa: E731
    r = (zc(y) / len(y)) / (zc(tone) / len(tone))
    assert 1.08 < r < 1.12, r


def test_with_noise_augment_snr_determinism_and_nulls(spark):
    """Noise augmentation: achieved SNR ~ the 20 dB target, identical
    bytes across two runs (counter-based determinism), silent clips
    pass through unchanged, nulls/unknown codecs NULL out."""
    from qcflow import audio
    from qcflow.udfs import with_noise_augment

    sr, n = 8000, 16000
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 500.0 * t)).astype(np.float32)
    rows = [
        (0, bytearray(audio.pcm16_encode(x)), "pcm16", sr),
        (1, bytearray(audio.pcm16_encode(np.zeros(n, dtype=np.float32))), "pcm16", sr),
        (90, None, "pcm16", sr),
        (91, bytearray(b"\x01"), "ogg", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    a = {r["clip_id"]: r for r in with_noise_augment(df).collect()}
    b = {r["clip_id"]: r for r in with_noise_augment(df.repartition(4)).collect()}
    assert bytes(a[0]["nz_bytes"]) == bytes(b[0]["nz_bytes"])  # layout-invariant
    assert a[90]["nz_bytes"] is None and a[91]["nz_samples"] is None
    # silent clip passes through: identical payload
    x0 = audio.decode(bytes(rows[1][1]), "pcm16")
    assert bytes(a[1]["nz_bytes"]) == audio.pcm16_encode(x0)
    # achieved SNR near target: noise power = |y - x|^2
    y = audio.pcm16_decode(bytes(a[0]["nz_bytes"])).astype(np.float64)
    x64 = audio.decode(audio.pcm16_encode(x), "pcm16").astype(np.float64)
    snr = 10.0 * np.log10(np.sum(x64**2) / np.sum((y - x64) ** 2))
    assert 18.5 < snr < 21.5, snr


def test_with_vad_segments_spans_blips_and_nulls(spark):
    """VAD segmentation: spans match the planted bursts, a 1-frame blip
    is dropped, payload bytes equal the decoded slices, all-silent and
    undecodable rows emit nothing, single Arrow crossing."""
    from qcflow import audio
    from qcflow.udfs import with_vad_segments

    sr = 8000
    fl = 160
    rng = np.random.default_rng(9)

    def pad(k):
        return rng.normal(0.0, 0.0005, k * fl)

    def burst(k, f=440.0):
        t = np.arange(k * fl) / sr
        return 0.3 * np.sin(2 * np.pi * f * t)

    x0 = np.concatenate([pad(2), burst(3), pad(2), burst(1), pad(1), burst(4)])
    x0 = np.clip(x0, -0.999, 0.999).astype(np.float32)
    rows = [
        (0, bytearray(audio.pcm16_encode(x0)), "pcm16", sr),
        (1, bytearray(audio.ulaw_encode(np.clip(pad(8), -0.999, 0.999).astype(np.float32))), "ulaw", sr),
        (90, None, "pcm16", sr),
        (91, bytearray(b"\x01"), "flac", sr),
    ]
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    out = with_vad_segments(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    got = out.collect()
    by = {}
    for r in got:
        by.setdefault(r["clip_id"], []).append(r)
    assert set(by) == {0}
    spans = sorted(by[0], key=lambda r: r["span_idx"])
    # two spans: frames 2-4 and frames 9-12; the 1-frame blip at 7 dropped
    assert [(r["start_sample"], r["n_samples"]) for r in spans] == [
        (2 * fl, 3 * fl),
        (9 * fl, 4 * fl),
    ]
    dec = audio.decode(audio.pcm16_encode(x0), "pcm16")
    for r in spans:
        s = r["start_sample"]
        assert bytes(r["span_bytes"]) == audio.pcm16_encode(
            dec[s : s + r["n_samples"]]
        )


def test_band_features_ann_bridge(spark):
    """The feat vector bridges audio into the ANN family: a lightly
    noised copy's band features are far closer (cosine) to the original
    than a distinct clip's, and the md5 gate's buffer equals the array."""
    from qcflow import audio
    from qcflow.udfs import with_band_features

    sr, n = 8000, 8000
    rng = np.random.default_rng(21)
    t = np.arange(n) / sr

    def mix(seed):
        r = np.random.default_rng(seed)
        x = np.zeros(n)
        for f in np.exp(r.uniform(np.log(200), np.log(3000), 3)):
            x = x + 0.15 * np.sin(2 * np.pi * f * t + r.uniform(0, 6.28))
        return x.astype(np.float32)

    a = mix(1)
    a_copy = (a + rng.normal(0, 0.005, n)).astype(np.float32)
    c = mix(2)
    df = spark.createDataFrame(
        [
            (0, bytearray(audio.pcm16_encode(a)), "pcm16", sr),
            (1, bytearray(audio.pcm16_encode(a_copy)), "pcm16", sr),
            (2, bytearray(audio.pcm16_encode(c)), "pcm16", sr),
        ],
        "clip_id int, bytes binary, codec string, sr_hz int",
    )
    got = {r["clip_id"]: r for r in with_band_features(df).collect()}
    v = {k: np.array(r["feat"], dtype=np.float32) for k, r in got.items()}
    assert np.frombuffer(bytes(got[0]["feat_bytes"]), dtype=np.float32).tolist() == v[0].tolist()
    cos = lambda x, y: float(np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y)))  # noqa: E731
    assert cos(v[0], v[1]) > cos(v[0], v[2]) + 0.05


def test_align_transcript_segments_degenerate_win_clamps_to_one(spark):
    """A --win-ms that rounds to a 0-sample window must clamp to the
    SAME 1-sample grid udfs.segment_clips uses (max(1, round(...))) —
    the unclamped column form divided by zero under ANSI mode instead
    (r6 review finding). win_ms=0: every sample is its own segment, so
    alignment runs on the win_n=1 grid without throwing."""
    from qcflow import audio
    from qcflow.features import align_transcript_segments

    n = 64
    b = audio.pcm16_encode(np.zeros(n, dtype=np.float32))
    df = spark.createDataFrame(
        [("c0", bytearray(b), "pcm16", 8000, "a b")],
        "clip_id string, bytes binary, codec string, sr_hz int, transcript string",
    )
    out = align_transcript_segments(df, win_ms=0).collect()
    # win_n clamps to 1 -> n segments; word midpoints ((2k+1)*n)//(2*2)//1
    # land at samples 16 and 48, one word each
    assert {(r["seg_idx"], r["seg_text"]) for r in out} == {(16, "a"), (48, "b")}
