"""Property tests (hypothesis) for the pure-Python kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from qcflow import audio
from qcflow.models import V_BUCKETS, char_classes, train_models, trigram_hashes
from qcflow.scrub import scrub_text

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=300
)


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(s):
    once = scrub_text(s)
    assert scrub_text(once) == once


@given(text_st)
@settings(max_examples=200, deadline=None)
def test_trigram_hashes_in_range(s):
    h = trigram_hashes(s)
    assert ((h >= 0) & (h < V_BUCKETS)).all()
    n = len(s.encode("utf-8", "ignore"))
    assert len(h) == max(n - 2, 0)


@given(text_st)
@settings(max_examples=100, deadline=None)
def test_char_classes_range(s):
    c = char_classes(s)
    assert ((c >= 0) & (c < 32)).all()


@given(st.integers(0, 10_000), st.integers(10, 5000))
@settings(max_examples=30, deadline=None)
def test_codec_roundtrip_snr(idx, n):
    x = audio.synth_wave(idx, n, 8000)
    assert audio.snr_db(x, audio.pcm16_decode(audio.pcm16_encode(x))) >= 60
    assert audio.snr_db(x, audio.ulaw_decode(audio.ulaw_encode(x))) >= 30


@given(st.lists(st.floats(-0.999, 0.999, allow_nan=False), min_size=8, max_size=64))
@settings(max_examples=100, deadline=None)
def test_ulaw_monotone_safe(vals):
    """ulaw decode(encode(x)) stays within quantization error of x."""
    x = np.array(vals, dtype=np.float32)
    y = audio.ulaw_decode(audio.ulaw_encode(x))
    assert len(y) == len(x)
    assert float(np.max(np.abs(y - x))) < 0.04  # worst-case mu-law step


def test_langid_deterministic_across_calls():
    m1 = train_models(1234)
    from qcflow.models import _train_models_uncached
    m2 = _train_models_uncached(1234)  # retrain from scratch
    assert np.array_equal(m1.langid_w, m2.langid_w)
    assert np.array_equal(m1.bigram_lp, m2.bigram_lp)


def test_nan_never_flags(spark):
    """§1.2 trap: a NULL feature must not fire a rule (reference parity)."""
    import pandas as pd

    from qcflow.features import clip_features
    from qcflow.rules import Thresholds, apply_rules

    pdf = pd.DataFrame(
        {
            "clip_id": ["a", "b"],
            "sr_hz": [16000, 16000],
            "dur_ms": [1000, 1000],
            "codec": ["pcm16", "pcm16"],
            # row a: normal text; row b: empty -> NULL distinct_ratio/cps
            "transcript": ["ka tiru ka ruti katu", ""],
        }
    )
    df = clip_features(spark.createDataFrame(pdf))
    df = df.withColumn("lang_conf", df.dur_ms * 0 + 0.9).withColumn(
        "perplexity", df.dur_ms * 0 + 5.0
    )
    thr = Thresholds(repetition_lo=0.1, cps_lo=1.0, cps_hi=100.0, ppl_hi=50.0)
    out = {r["clip_id"]: r["drop_reasons"] for r in apply_rules(df, thr).collect()}
    assert out["a"] == ""
    # empty transcript flags ONLY empty_transcript — the NULL-featured rules
    # (repetition, length_mismatch, symbol density) must stay silent
    assert out["b"] == "empty_transcript"


def test_flag_monotone_in_thresholds(spark):
    """SURVEY §5 property: tightening every threshold can only grow the
    flagged set (flag monotonicity)."""
    import pandas as pd

    from qcflow.features import clip_features
    from qcflow.rules import Thresholds, apply_rules
    from qcflow.synth import gen_pandas
    from qcflow.udfs import with_langid_ppl

    pdf = gen_pandas(200).drop(columns=["bytes", "true_lang", "planted"])
    df = with_langid_ppl(clip_features(spark.createDataFrame(pdf)), spark).persist()
    loose = Thresholds(repetition_lo=0.1, cps_lo=2.0, cps_hi=50.0, ppl_hi=500.0)
    tighter = [
        Thresholds(repetition_lo=0.3, cps_lo=2.0, cps_hi=50.0, ppl_hi=500.0),
        Thresholds(repetition_lo=0.1, cps_lo=8.0, cps_hi=25.0, ppl_hi=500.0),
        Thresholds(repetition_lo=0.1, cps_lo=2.0, cps_hi=50.0, ppl_hi=20.0),
        Thresholds(repetition_lo=0.5, cps_lo=9.0, cps_hi=20.0, ppl_hi=10.0),
    ]

    def flagged_ids(thr):
        out = apply_rules(df, thr).filter("NOT keep").select("clip_id").collect()
        return {r["clip_id"] for r in out}

    base = flagged_ids(loose)
    for thr in tighter:
        assert base <= flagged_ids(thr), thr
    df.unpersist()


@given(
    st.integers(0, 2**31 - 1),
    st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    st.integers(1, 40000),
    st.sampled_from([1.0, 3.0, 0.003]),  # clean / clipped / near-silent gain
    st.floats(-0.4, 0.4),
)
@settings(max_examples=60, deadline=None)
def test_blocked_acoustic_stats_match_naive(seed, sr, n, gain, dc):
    """The L2-blocked single-pass acoustic stats must equal the naive
    full-array form on arbitrary waveforms (counting stats exactly;
    summation stats to float tolerance)."""
    from qcflow.udfs import CLIP_SAMPLE_ABS, SILENCE_FRAME_RMS, acoustic_stats

    x = np.clip(
        gain * audio.synth_wave(seed % 100000, n, sr) + dc, -0.999, 0.999
    ).astype(np.float32)

    got = acoustic_stats(x, sr)
    # naive reference: whole-array numpy, same definitions
    xd = x.astype(np.float64)
    fl = max(1, int(round(sr * 0.02)))
    n_fr = len(xd) // fl
    if n_fr:
        fr = xd[: n_fr * fl].reshape(n_fr, fl)
        sil = float(np.mean(np.sqrt(np.mean(fr * fr, axis=1)) < SILENCE_FRAME_RMS))
    else:
        sil = float(np.sqrt(np.mean(xd * xd)) < SILENCE_FRAME_RMS)
    assert got["clip_ratio"] == float(np.mean(np.abs(xd) >= CLIP_SAMPLE_ABS))
    assert got["ac_peak"] == float(np.abs(xd).max())
    if len(xd) > 1:
        assert got["zcr"] == float(
            np.mean(np.signbit(xd[1:]) != np.signbit(xd[:-1]))
        )
    assert got["silence_ratio"] == sil
    np.testing.assert_allclose(got["ac_rms"], np.sqrt(np.mean(xd * xd)), atol=1e-12)
    np.testing.assert_allclose(got["dc_offset"], np.mean(xd), atol=1e-12)


def test_sampling_hash_not_periodic_in_id_blocks():
    """The stratified-sampling coin must depend on all id bits: under the
    old (id * K) % 1000 coin, every id in a residue class mod 1000 drew
    the SAME coin, so stride/block id allocation (shard s owning ids
    s, s+1000, ...) was sampled all-or-nothing. The prime-modulus hash
    must spread each such class over many coin values, and stay exact
    (no overflow) at 10^12-scale ids."""
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    for c in (0, 7, 999):
        ids = [c + 1000 * k for k in range(200)]
        coins = {(i % HASH_P) * HASH_K % HASH_P % 1000 for i in ids}
        assert len(coins) > 100, f"class {c}: {len(coins)} distinct coins"
    # overflow-safety at 10^12 ids: the reduced product stays under 2^63
    big = 10**12 + 123
    assert (big % HASH_P) * HASH_K < 2**63
