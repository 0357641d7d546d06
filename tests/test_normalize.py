"""The composed audio-normalization stage (with_normalize /
normalize_clips / `qcflow.cli normalize`): one decode pass for
trim + resample + loudness, output = a VALID clips table that feeds
straight back into the QC pipeline."""

from __future__ import annotations

import json

import numpy as np
import pytest

from qcflow import audio


def test_with_normalize_composition_and_nulls(spark):
    """Mid-level clips land near TARGET_RMS after gain; near-silent
    clips hit the MAX_GAIN cap; all-silent clips trim to empty; NULL /
    unknown-codec rows NULL out; output decodes as pcm16 @ target."""
    from qcflow.udfs import with_normalize

    rng = np.random.default_rng(86)
    sr, fl = 8000, 160
    tone = np.sin(2 * np.pi * 440.0 * np.arange(20 * fl) / sr)
    rows = []
    for cid, amp in ((0, 0.05), (1, 0.004)):
        x = np.concatenate(
            [
                rng.normal(0.0, 0.0005, 3 * fl),
                amp * tone,
                rng.normal(0.0, 0.0005, 4 * fl),
            ]
        ).astype(np.float32)
        rows.append((cid, bytearray(audio.pcm16_encode(x)), "pcm16", sr))
    silent = rng.normal(0.0, 0.0005, 6 * fl).astype(np.float32)
    rows.append((2, bytearray(audio.pcm16_encode(silent)), "pcm16", sr))
    rows.append((90, None, "pcm16", sr))
    rows.append((91, bytearray(b"\x00"), "gsm", sr))
    df = spark.createDataFrame(
        rows, "clip_id int, bytes binary, codec string, sr_hz int"
    )
    got = {r["clip_id"]: r for r in with_normalize(df, 16000).collect()}
    y0 = audio.pcm16_decode(bytes(got[0]["norm_bytes"]))
    assert len(y0) == got[0]["norm_samples"] == 20 * fl * 2  # 8k -> 16k
    assert abs(float(np.sqrt(np.mean(y0.astype(np.float64) ** 2))) - audio.TARGET_RMS) < 0.01
    # a 0.004-amp tone sits UNDER the silence threshold: trim removes it
    # entirely and gain never applies — near-silence is dropped, not
    # amplified into noise
    assert got[1]["norm_samples"] == 0 and got[1]["gain_db"] == 0.0
    assert bytes(got[2]["norm_bytes"]) == b"" and got[2]["norm_samples"] == 0
    assert got[90]["norm_bytes"] is None and got[91]["gain_db"] is None
    # with trim OFF the same near-silent clip hits the MAX_GAIN cap
    notrim = {
        r["clip_id"]: r
        for r in with_normalize(df, 16000, trim=False).collect()
    }
    assert notrim[1]["gain_db"] == pytest.approx(
        20.0 * np.log10(audio.MAX_GAIN)
    )
    with pytest.raises(ValueError):
        with_normalize(df, 12345)


def test_cli_normalize_roundtrips_into_qc(spark, tmp_path, capsys):
    """gen -> normalize -> the output parquet is a valid clips table
    (uniform pcm16 @ 16 kHz, recomputed dur_ms, transcripts carried)
    that score_clips consumes directly."""
    from qcflow import cli
    from qcflow.pipeline import score_clips
    from qcflow.rules import Thresholds
    from qcflow.synth import generate_clips

    generate_clips(spark, 80, str(tmp_path / "clips"))
    rc = cli.main(
        [
            "normalize",
            "--clips",
            str(tmp_path / "clips/clips.parquet"),
            "--out",
            str(tmp_path / "norm"),
            "--cpus",
            "8",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_input"] == 80
    assert summary["n_normalized"] > 0
    norm = spark.read.parquet(str(tmp_path / "norm/normalized.parquet"))
    assert {"bytes", "codec", "sr_hz", "dur_ms", "transcript", "gain_db"} <= set(
        norm.columns
    )
    codecs = [r[0] for r in norm.select("codec").distinct().collect()]
    assert codecs == ["pcm16"]
    assert [r[0] for r in norm.select("sr_hz").distinct().collect()] == [16000]
    ok = norm.filter("bytes is not null")
    one = ok.select("bytes", "dur_ms").first()
    n_samp = len(bytes(one["bytes"])) // 2
    assert one["dur_ms"] == int(round(n_samp * 1000.0 / 16000))
    # composability: the normalized table IS a clips table
    res = score_clips(
        spark,
        ok,
        thresholds=Thresholds(
            repetition_lo=0.1, cps_lo=0.1, cps_hi=1000.0, ppl_hi=1000.0
        ),
    )
    assert res.scored.count() == ok.count()
    res.release()


def test_segment_table_valid_clips_and_alignment(spark):
    """segment_table emits a VALID clips table: '<parent>#<seg>' ids,
    pcm16 payloads whose byte length matches dur_ms, aligned transcripts
    that concatenate back to the parent's words, invalid-sr rows on the
    8000 Hz fallback grid, and the whole thing feeds into score_clips."""
    from qcflow.pipeline import score_clips, segment_table
    from qcflow.rules import Thresholds

    sr, n = 8000, 16000  # 2.0 s -> 5 segments of 400 ms
    x = np.clip(
        np.random.default_rng(3).normal(0.0, 0.2, n), -0.999, 0.999
    ).astype(np.float32)
    rows = [
        ("a", bytearray(audio.pcm16_encode(x)), "pcm16", sr, 2000, "w1 w2 w3 w4 w5"),
        ("b", bytearray(audio.ulaw_encode(x[:8000])), "ulaw", sr, 1000, "y1 y2"),
        ("badsr", bytearray(audio.pcm16_encode(x[:8000])), "pcm16", 0, 1000, "z1"),
        ("null", None, "pcm16", sr, 1000, "q1"),
        ("badc", bytearray(b"\x01"), "mp3", sr, 1000, "q2"),
    ]
    clips = spark.createDataFrame(
        rows,
        "clip_id string, bytes binary, codec string, sr_hz int, "
        "dur_ms int, transcript string",
    )
    segs = segment_table(clips).cache()
    got = {r["clip_id"]: r for r in segs.collect()}
    assert set(r.split("#")[0] for r in got) == {"a", "b", "badsr"}
    assert len([k for k in got if k.startswith("a#")]) == 5
    # valid clips contract: pcm16, byte length consistent with dur_ms
    for r in got.values():
        assert r["codec"] == "pcm16"
        n_samp = len(bytes(r["bytes"])) // 2
        assert r["dur_ms"] == int(round(n_samp * 1000.0 / r["sr_hz"]))
    # alignment: words concatenate back in order
    a_segs = sorted(
        (r for k, r in got.items() if k.startswith("a#")),
        key=lambda r: r["seg_idx"],
    )
    joined = " ".join(r["transcript"] for r in a_segs if r["transcript"])
    assert joined == "w1 w2 w3 w4 w5"
    # invalid sr rides the fallback grid and reports it
    bs = [r for k, r in got.items() if k.startswith("badsr#")]
    assert all(r["sr_hz"] == 8000 for r in bs)
    # composability: the segments table IS a clips table
    res = score_clips(
        spark,
        segs,
        thresholds=Thresholds(
            repetition_lo=0.1, cps_lo=0.01, cps_hi=1000.0, ppl_hi=1000.0
        ),
    )
    assert res.scored.count() == segs.count()
    res.release()
    segs.unpersist()
