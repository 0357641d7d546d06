"""Acoustic-QC registry entry with a full DuckDB oracle.

A 400-clip fixture (pcm16 + ulaw, deterministic seed) plants exactly one
acoustic defect per defective row — hard clipping (3x gain), dead air
(0.003 amplitude), converter DC bias (+0.35), dead-mic white noise
(flatness ~0.9) — with construction margins far outside the detector
thresholds (rules.py: clip_ratio > 0.02, silence_ratio > 0.5,
|dc| > 0.1, flatness > 0.5). It is materialized ONCE to parquet under
.cache/audio_qc/ at import time (pure numpy, no Spark).

The Spark side must recover each planted label from the BYTES alone
(decode -> features -> flags, qcflow/udfs.py with_audio_features); the
DuckDB oracle derives the same booleans from the fixture's `planted`
truth column — so a hash match means the acoustic detectors have exact
precision AND recall on the planted corpus. Rows with an unknown codec
or NULL bytes must yield all-false flags (NaN-never-flags, SURVEY §1.2);
the fixture plants those too.

This extends the reference's rule-flag engine (Home.py:161-184) to the
audio payload the north rule targets; the flag/drop_reasons shape is the
same P5 contract.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query

N_ROWS = 400
_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "audio_qc",
)
_FIX = os.path.join(_DIR, "clips_v2.parquet")  # v2: + noisy_audio plant

# one defect per row, cycling; margins documented above
_PLANTS = (
    "",
    "clipped_audio",
    "silent_audio",
    "dc_offset",
    "noisy_audio",
    "",
    "no_bytes",
    "",
)


def _materialize() -> None:
    if os.path.exists(_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_ROWS):
        rng = np.random.default_rng([515151, i])
        sr = int(rng.choice([8000, 16000]))
        dur_s = float(rng.uniform(0.4, 1.2))
        n = int(sr * dur_s)
        t = np.arange(n) / sr
        f = float(rng.uniform(120.0, 2400.0))
        base = 0.4 * np.sin(2 * np.pi * f * t) + rng.normal(0.0, 0.01, n)
        plant = _PLANTS[i % len(_PLANTS)]
        if plant == "clipped_audio":
            x = 3.0 * base  # ~40% of samples land at/above |0.95|
        elif plant == "silent_audio":
            x = 0.003 * base  # every 20 ms frame RMS ~ 0.001
        elif plant == "dc_offset":
            x = base + 0.35
        elif plant == "noisy_audio":
            x = rng.normal(0.0, 0.25, n)  # dead mic: pure broadband noise
        else:
            x = base
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        if plant == "no_bytes":
            # undecodable rows: half NULL bytes, half unknown codec —
            # features NULL, flags all false (cycle length is even, so
            # the split keys on the cycle index, not the row index)
            if (i // len(_PLANTS)) % 2 == 0:
                b = None
            else:
                b, codec = b"\x01\x02\x03\x04", "opus"
        else:
            b = (
                audio.pcm16_encode(x)
                if codec == "pcm16"
                else audio.ulaw_encode(x)
            )
        rows.append(
            {
                "clip_id": f"aqc-{i:06d}",
                "bytes": b,
                "sr_hz": sr,
                "codec": codec,
                "planted": plant,
            }
        )
    pd.DataFrame(rows).to_parquet(_FIX, index=False)


_materialize()

_ORACLE = f"""
SELECT clip_id,
       planted = 'clipped_audio' AS is_clipped,
       planted = 'silent_audio' AS is_silent,
       planted = 'dc_offset' AS has_dc_offset,
       planted = 'noisy_audio' AS is_noisy
FROM '{_FIX}'
ORDER BY clip_id
"""


@query("audio_quality_flags", oracle=_ORACLE)
def audio_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> acoustic features -> boolean defect flags, compared
    against the construction truth. One Arrow crossing; the flags are the
    same column expressions score_clips(check_acoustics=True) feeds into
    the drop-reason engine."""
    from qcflow.rules import acoustic_rule_conditions
    from qcflow.udfs import with_audio_features

    _materialize()
    clips = spark.read.parquet(_FIX).select("clip_id", "bytes", "sr_hz", "codec")
    feats = with_audio_features(clips)
    conds = dict(acoustic_rule_conditions())
    return feats.select(
        "clip_id",
        F.coalesce(conds["clipped_audio"], F.lit(False)).alias("is_clipped"),
        F.coalesce(conds["silent_audio"], F.lit(False)).alias("is_silent"),
        F.coalesce(conds["dc_offset"], F.lit(False)).alias("has_dc_offset"),
        F.coalesce(conds["noisy_audio"], F.lit(False)).alias("is_noisy"),
    )


# --------------------------------------- audio near-dup (spectral fp)
#
# Construction-truth fixture for audio near-dup dedup, the audio-modality
# twin of dedup_image_phash: 160 base clips (sinusoid mixtures, pcm16 and
# ulaw); the first 50 get a NEAR-DUP copy — re-gained, lightly noised,
# possibly transcoded to the other codec — with the perturbation backed
# off per-clip until the 64-bit spectral fingerprint (audio.audio_fp64,
# band-energy-delta sign bits in the Haitsma-Kalker robust-hash family)
# stays within Hamming radius 3. The last-resort rung is the ORIGINAL
# bytes under the original codec (Hamming 0), so the bound is guaranteed
# deterministically. Truth columns (orig_id, copy_id, t_hamming) are
# computed at build time on the encode->decode ROUNDTRIPPED signal with
# the same kernel the executors run, so Spark's recovered distances are
# bit-identical through the bytes. Spark must find the pairs via decode
# -> fingerprint -> 4x16-bit banded self-join (pigeonhole: Hamming <= 3
# guarantees >= 1 clean band, recall 1); the oracle only projects truth.

N_AFP = 160
N_AFP_COPIES = 50
_AFP_OFF = 100_000
_AFP_BANDS, _AFP_BAND_BITS = 4, 16
_AFP_HAM_MAX = _AFP_BANDS - 1  # pigeonhole radius for guaranteed recall
_AFP_FIX = os.path.join(_DIR, "fp_v1.parquet")


def _afp_encode(x, codec):
    from qcflow import audio

    return (
        audio.pcm16_encode(x) if codec == "pcm16" else audio.ulaw_encode(x)
    )


def _decodable(clips: DataFrame) -> DataFrame:
    """Input-level decodability filter (NULL bytes / unknown codec),
    applied BEFORE the decode UDF. Filtering on the UDF's own output
    instead lets predicate pushdown clone the Python node (the filter
    and the downstream projection each get their own ArrowEvalPython =
    every clip decoded TWICE); this predicate references scan columns
    only, so it pushes to the parquet scan and the plan keeps exactly
    one Arrow crossing (gated in tests/test_plans.py). The UDFs' own
    row-level NULL guards stay unit-tested."""
    from qcflow import audio

    return clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )


def _materialize_fp() -> None:
    if os.path.exists(_AFP_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_AFP):
        rng = np.random.default_rng([515153, i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.4, 0.9)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3200.0), 3)):
            x = x + rng.uniform(0.08, 0.2) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.01, n)).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        b = _afp_encode(x, codec)
        base_fp = audio.audio_fp64(audio.decode(b, codec), sr)
        plant = "" if i % 9 else "no_bytes" if i % 18 else "bad_codec"
        rows.append(
            {
                "clip_id": i,
                "bytes": None if (i >= N_AFP_COPIES and plant == "no_bytes") else b,
                "codec": "opus" if (i >= N_AFP_COPIES and plant == "bad_codec") else codec,
                "sr_hz": sr,
                "orig_id": None,
                "copy_id": None,
                "t_hamming": None,
            }
        )
        if i < N_AFP_COPIES:
            other = "ulaw" if codec == "pcm16" else "pcm16"
            # (codec, noise amp, gain) backoff ladder; final rung = the
            # original bytes verbatim -> Hamming 0, deterministic bound
            for cc, amp, gain in (
                (other, 0.008, 0.8),
                (codec, 0.008, 0.8),
                (codec, 0.003, 1.0),
                (codec, 0.001, 1.0),
                (codec, 0.0, 1.0),
            ):
                nrng = np.random.default_rng([515154, i])
                cp = gain * x + (
                    nrng.normal(0.0, amp, n) if amp > 0 else 0.0
                )
                cb = b if (cc == codec and amp == 0.0 and gain == 1.0) else _afp_encode(
                    cp.astype(np.float32), cc
                )
                ham = audio.fp_hamming(
                    base_fp, audio.audio_fp64(audio.decode(cb, cc), sr)
                )
                if ham <= _AFP_HAM_MAX:
                    break
            rows.append(
                {
                    "clip_id": i + _AFP_OFF,
                    "bytes": cb,
                    "codec": cc,
                    "sr_hz": sr,
                    "orig_id": i,
                    "copy_id": i + _AFP_OFF,
                    "t_hamming": ham,
                }
            )
    pdf = pd.DataFrame(rows)
    for c in ("orig_id", "copy_id", "t_hamming"):
        pdf[c] = pdf[c].astype("Int64")
    pdf.to_parquet(_AFP_FIX, index=False)


_materialize_fp()


@query(
    "dedup_audio_fp",
    oracle=f"""
    SELECT CAST(orig_id AS BIGINT) AS id_a,
           CAST(copy_id AS BIGINT) AS id_b,
           CAST(t_hamming AS INT) AS hamming
    FROM '{_AFP_FIX}'
    WHERE copy_id IS NOT NULL AND t_hamming <= {_AFP_HAM_MAX}
    """,
)
def dedup_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup pairs by spectral fingerprint: decode ->
    audio_fp64 (one Arrow crossing, 8-byte rows out — clip bytes never
    reach a shuffle) -> 4x16-bit banded self-join -> exact Hamming
    filter, the dedup_simhash_pairs / dedup_image_phash banding applied
    to the audio modality. Hamming <= 3 guarantees >= 1 clean band
    (pigeonhole), so banded recall is 1 within the radius and full
    fingerprints are only compared inside shared buckets. Restricted to
    planted (orig, copy) pairs so the DuckDB oracle is a pure
    truth-column projection while Spark recovers everything THROUGH the
    bytes; NULL-bytes and unknown-codec rows yield NULL fingerprints and
    never join."""
    from qcflow.udfs import with_audio_fp

    _materialize_fp()
    clips = spark.read.parquet(_AFP_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    fp = with_audio_fp(_decodable(clips)).select("clip_id", "audio_fp")
    bands = fp.select(
        "clip_id",
        "audio_fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(
                            f"(audio_fp >> {j * _AFP_BAND_BITS})"
                            f" & {(1 << _AFP_BAND_BITS) - 1}"
                        ).alias("bucket"),
                    )
                    for j in range(_AFP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("clip_id", "audio_fp", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.expr("a.audio_fp ^ b.audio_fp"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.clip_id") == F.col("a.clip_id") + _AFP_OFF),
        )
        .select(
            F.col("a.clip_id").alias("id_a"),
            F.col("b.clip_id").alias("id_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _AFP_HAM_MAX)
        .dropDuplicates(["id_a", "id_b"])
    )


# ------------------------------------------- loudness normalization gate
#
# Construction-truth fixture for with_loudness (qcflow/udfs.py): 240
# clips in four regimes — near-silent (gain hits the MAX_GAIN cap),
# mid-level with planted 0.75 spikes (gain > 1 pushes the peak past full
# scale -> clip_after), hot (attenuation, gain < 1), and undecodable
# (NULL bytes / unknown codec -> NULL outputs, excluded from the gate by
# the `decodable` truth flag and covered by a unit test instead). Truth
# (rms / gain_db / clip_after) is computed AT BUILD TIME by running the
# identical kernel on the encode->decode roundtripped signal, so Spark's
# recovery through the bytes is bit-exact; the oracle only projects the
# truth columns.

N_GAIN = 240
_GAIN_FIX = os.path.join(_DIR, "gain_v1.parquet")


def _materialize_gain() -> None:
    if os.path.exists(_GAIN_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_GAIN):
        rng = np.random.default_rng([515155, i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.3, 0.8)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3000.0), 2)):
            x = x + np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
        regime = i % 4
        if regime == 0:  # near-silent -> MAX_GAIN cap
            target = float(rng.uniform(0.001, 0.005))
        elif regime == 1:  # mid-level + spikes -> clip_after
            target = float(rng.uniform(0.03, 0.06))
        elif regime == 2:  # hot -> attenuation
            target = float(rng.uniform(0.15, 0.5))
        else:  # undecodable
            target = 0.1
        base_rms = float(np.sqrt(np.mean(x * x)))
        x = x * (target / base_rms)
        if regime == 1:
            spikes = rng.integers(0, n, 5)
            x[spikes] = 0.75
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "rms_t": None,
            "gain_db_t": None,
            "clip_after_t": None,
            "decodable": regime != 3,
        }
        if regime == 3:
            if (i // 4) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x00\x01", codec="opus")
        else:
            b = _afp_encode(x, codec)
            rms, gdb, clip = audio.loudness_gain(audio.decode(b, codec))
            row.update(
                bytes=b, codec=codec, rms_t=rms, gain_db_t=gdb,
                clip_after_t=clip,
            )
        rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["clip_after_t"] = pdf["clip_after_t"].astype("boolean")
    pdf.to_parquet(_GAIN_FIX, index=False)


_materialize_gain()


@query(
    "audio_loudness_normalize",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           rms_t AS rms, gain_db_t AS gain_db, clip_after_t AS clip_after
    FROM '{_GAIN_FIX}'
    WHERE decodable
    """,
)
def audio_loudness_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness normalization over the gain fixture: decode -> blocked
    RMS -> target gain (dB) + post-gain clip flag, recovered THROUGH the
    bytes and hash-compared against build-time truth from the identical
    kernel. Map-only at any scale — one Arrow crossing, no shuffle, the
    bytes never leave the scan task. The undecodable regime yields NULLs
    and is excluded here via the truth flag (unit-tested instead: the
    guard is row-level, never task-fatal)."""
    from qcflow.udfs import with_loudness

    _materialize_gain()
    clips = spark.read.parquet(_GAIN_FIX).select("clip_id", "bytes", "codec")
    return with_loudness(_decodable(clips)).select(
        "clip_id", "rms", "gain_db", "clip_after"
    )


# ------------------------------------------------- silence-trim gate
#
# Construction-truth fixture for with_trim_silence: 200 clips with
# frame-aligned leading/trailing pads of sub-threshold noise around a
# voiced tone burst; every 5th-and-3rd row is all-silent (bounds (0,0))
# and every 5th-and-4th undecodable (NULLs, unit-tested; excluded here
# by the `decodable` flag). Truth (lead/kept/trail SAMPLES — integers,
# exact compare) computed at build time by the identical kernel on the
# encode->decode roundtripped signal.

N_TRIM = 200
_TRIM_FIX = os.path.join(_DIR, "trim_v1.parquet")


def _materialize_trim() -> None:
    if os.path.exists(_TRIM_FIX):
        return
    from qcflow import audio
    from qcflow.udfs import trim_bounds

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_TRIM):
        rng = np.random.default_rng([515156, i])
        sr = int(rng.choice([8000, 16000]))
        fl = int(round(sr * 0.02))
        regime = i % 5
        lead_fr = int(rng.integers(0, 20))
        trail_fr = int(rng.integers(0, 20))
        voiced_fr = int(rng.integers(8, 40))
        pad = lambda k: rng.normal(0.0, 0.0005, k * fl)  # noqa: E731
        t = np.arange(voiced_fr * fl) / sr
        tone = 0.3 * np.sin(2 * np.pi * float(rng.uniform(200, 2500)) * t)
        if regime == 3:  # all silent
            x = pad(lead_fr + voiced_fr + trail_fr)
        else:
            x = np.concatenate([pad(lead_fr), tone, pad(trail_fr)])
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "lead_t": None,
            "kept_t": None,
            "trail_t": None,
            "decodable": regime != 4,
        }
        if regime == 4:
            if (i // 5) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x7f\x00", codec="amr")
        else:
            b = _afp_encode(x, codec)
            s, e = trim_bounds(audio.decode(b, codec), sr)
            row.update(
                bytes=b, codec=codec, lead_t=s, kept_t=e - s,
                trail_t=len(x) - e,
            )
        rows.append(row)
    pdf = pd.DataFrame(rows)
    for c in ("lead_t", "kept_t", "trail_t"):
        pdf[c] = pdf[c].astype("Int64")
    pdf.to_parquet(_TRIM_FIX, index=False)


_materialize_trim()


@query(
    "audio_trim_silence",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           CAST(lead_t AS BIGINT) AS lead_samples,
           CAST(kept_t AS BIGINT) AS kept_samples,
           CAST(trail_t AS BIGINT) AS trail_samples
    FROM '{_TRIM_FIX}'
    WHERE decodable
    """,
)
def audio_trim_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD-style leading/trailing silence trim recovered THROUGH the
    bytes: decode -> 20 ms frame-RMS grid -> first/last voiced frame,
    integer sample bounds hash-compared exactly against build-time truth
    from the identical kernel. Map-only at any scale (one Arrow
    crossing, no shuffle); all-silent clips yield (0, 0, n); the
    undecodable regime yields NULLs, excluded via the truth flag and
    unit-tested."""
    from qcflow.udfs import with_trim_silence

    _materialize_trim()
    clips = spark.read.parquet(_TRIM_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return with_trim_silence(_decodable(clips)).select(
        "clip_id", "lead_samples", "kept_samples", "trail_samples"
    )


# ------------------------------------------- trim re-encode gate
#
# Completes audio_trim_silence: the fixture plants frame-aligned pads
# around a tone burst (same construction family, fresh seed/file), and
# the truth columns are md5 + length of the RE-ENCODED SLICE computed at
# build time with the identical kernel chain (decode -> trim_bounds ->
# slice -> same-codec encode) on the roundtripped bytes. Spark must
# reproduce the payload bytes exactly THROUGH the decode; DuckDB reads
# the truth columns only. All-silent rows carry md5(b"") with 0 samples.

N_TRIMENC = 200
_TRIMENC_FIX = os.path.join(_DIR, "trimenc_v1.parquet")


def _materialize_trimenc() -> None:
    if os.path.exists(_TRIMENC_FIX):
        return
    import hashlib

    from qcflow import audio
    from qcflow.udfs import trim_bounds

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_TRIMENC):
        rng = np.random.default_rng([515157, i])
        sr = int(rng.choice([8000, 16000]))
        fl = int(round(sr * 0.02))
        regime = i % 5
        lead_fr = int(rng.integers(0, 16))
        trail_fr = int(rng.integers(0, 16))
        voiced_fr = int(rng.integers(8, 32))
        pad = lambda k: rng.normal(0.0, 0.0005, k * fl)  # noqa: E731
        t = np.arange(voiced_fr * fl) / sr
        tone = 0.3 * np.sin(2 * np.pi * float(rng.uniform(200, 2500)) * t)
        if regime == 3:  # all silent -> empty re-encoded payload
            x = pad(lead_fr + voiced_fr + trail_fr)
        else:
            x = np.concatenate([pad(lead_fr), tone, pad(trail_fr)])
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "out_md5": None,
            "out_n": None,
            "decodable": regime != 4,
        }
        if regime == 4:
            if (i // 5) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x7f\x00", codec="amr")
        else:
            b = _afp_encode(x, codec)
            dec = audio.decode(b, codec)
            s, e = trim_bounds(dec, sr)
            out = _afp_encode(dec[s:e], codec)
            row.update(
                bytes=b, codec=codec,
                out_md5=hashlib.md5(out).hexdigest(), out_n=e - s,
            )
        rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["out_n"] = pdf["out_n"].astype("Int64")
    pdf.to_parquet(_TRIMENC_FIX, index=False)


_materialize_trimenc()


@query(
    "audio_trim_reencode",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           out_md5,
           CAST(out_n AS BIGINT) AS trim_samples
    FROM '{_TRIMENC_FIX}'
    WHERE decodable
    """,
)
def audio_trim_reencode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim -> slice -> same-codec re-encode recovered THROUGH the
    bytes: the produced payload's md5 + sample count hash-compared
    against build-time truth from the identical kernel chain. Map-only
    at any scale (one Arrow crossing, no shuffle); the md5 is computed
    JVM-side (F.md5) so the binary column never crosses back to Python.
    All-silent clips emit empty payloads; undecodable rows NULL out and
    are excluded via the truth flag (unit-tested)."""
    from qcflow.udfs import with_trim_reencode

    _materialize_trimenc()
    clips = spark.read.parquet(_TRIMENC_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return with_trim_reencode(_decodable(clips)).select(
        "clip_id",
        F.md5(F.col("trim_bytes")).alias("out_md5"),
        "trim_samples",
    )


# ------------------------------------------- resample-to-16k gate
#
# Construction truth for with_resample: clips synthesized at ALL FIVE
# valid rates (band-limited below the 16 kHz target Nyquist so the
# content survives conversion), both codecs, plus an undecodable
# regime; truth = md5 + length of the 16 kHz pcm16 payload computed at
# build with the identical windowed-sinc kernel on the roundtripped
# bytes. The kernel's integer tap phase makes the executor-side bytes
# bit-identical to the build-side truth on any partition layout.

N_RESAMP = 160
_RESAMP_FIX = os.path.join(_DIR, "resamp_v1.parquet")
_RESAMP_TARGET = 16000


def _materialize_resamp() -> None:
    if os.path.exists(_RESAMP_FIX):
        return
    import hashlib

    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_RESAMP):
        rng = np.random.default_rng([515158, i])
        sr = int(audio.VALID_SR[i % len(audio.VALID_SR)])
        n = int(sr * float(rng.uniform(0.2, 0.8)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for _ in range(3):
            f = float(rng.uniform(120.0, 3400.0))  # < target Nyquist
            x += float(rng.uniform(0.08, 0.25)) * np.sin(
                2 * np.pi * f * t + float(rng.uniform(0, 2 * np.pi))
            )
        x += rng.normal(0.0, 0.01, n)
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "out_md5": None,
            "out_n": None,
            "decodable": i % 8 != 7,
        }
        if i % 8 == 7:
            if (i // 8) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x00\x01\x02", codec="flac")
        else:
            b = _afp_encode(x, codec)
            y = audio.resample(audio.decode(b, codec), sr, _RESAMP_TARGET)
            out = audio.pcm16_encode(y)
            row.update(
                bytes=b, codec=codec,
                out_md5=hashlib.md5(out).hexdigest(), out_n=len(y),
            )
        rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["out_n"] = pdf["out_n"].astype("Int64")
    pdf.to_parquet(_RESAMP_FIX, index=False)


_materialize_resamp()


@query(
    "audio_resample_16k",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           out_md5,
           CAST(out_n AS BIGINT) AS rs_samples
    FROM '{_RESAMP_FIX}'
    WHERE decodable
    """,
)
def audio_resample_16k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Everything-to-16 kHz normalization recovered THROUGH the bytes:
    decode -> anti-aliased windowed-sinc resample -> pcm16 encode, the
    payload's md5 + sample count hash-compared exactly against
    build-time truth from the identical kernel (integer tap phase =>
    layout-invariant bytes). Map-only at any scale; md5 computed
    JVM-side so the binary never re-crosses Arrow; undecodable rows
    NULL out and are excluded via the truth flag (unit-tested)."""
    from qcflow.udfs import with_resample

    _materialize_resamp()
    clips = spark.read.parquet(_RESAMP_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return with_resample(_decodable(clips), target_sr=_RESAMP_TARGET).select(
        "clip_id",
        F.md5(F.col("rs_bytes")).alias("out_md5"),
        "rs_samples",
    )


# ------------------------------------------- blind SNR estimate gate
#
# Construction truth for with_snr_estimate: tone bursts over a noise
# bed at planted (amp, sigma) spanning clean -> buried regimes, plus
# all-noise and undecodable rows; truth (noise_floor_db / speech_db /
# snr_est_db) computed at build with the identical kernel on the
# roundtripped bytes — index-exact order statistics make the doubles
# bit-reproducible.

N_SNREST = 200
_SNREST_FIX = os.path.join(_DIR, "snrest_v1.parquet")


def _materialize_snrest() -> None:
    if os.path.exists(_SNREST_FIX):
        return
    from qcflow import audio
    from qcflow.udfs import snr_estimate

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_SNREST):
        rng = np.random.default_rng([515159, i])
        sr = int(rng.choice([8000, 16000]))
        fl = int(round(sr * 0.02))
        n_fr = int(rng.integers(20, 60))
        n = n_fr * fl
        regime = i % 5
        sigma = float(rng.uniform(0.001, 0.05))
        noise = rng.normal(0.0, sigma, n)
        if regime == 3:  # all-noise: low estimated SNR
            x = noise
        else:
            # tone bursts over ~40% of frames -> speech level at p90
            x = noise.copy()
            t = np.arange(n) / sr
            tone = float(rng.uniform(0.15, 0.5)) * np.sin(
                2 * np.pi * float(rng.uniform(200, 2500)) * t
            )
            on = rng.random(n_fr) < 0.4
            mask = np.repeat(on, fl)
            x[mask] += tone[mask]
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "nf_t": None,
            "sp_t": None,
            "snr_t": None,
            "decodable": regime != 4,
        }
        if regime == 4:
            if (i // 5) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x10\x20", codec="ogg")
        else:
            b = _afp_encode(x, codec)
            nf, sp, snr = snr_estimate(audio.decode(b, codec), sr)
            row.update(bytes=b, codec=codec, nf_t=nf, sp_t=sp, snr_t=snr)
        rows.append(row)
    pd.DataFrame(rows).to_parquet(_SNREST_FIX, index=False)


_materialize_snrest()


@query(
    "audio_snr_estimate",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           nf_t AS noise_floor_db,
           sp_t AS speech_db,
           snr_t AS snr_est_db
    FROM '{_SNREST_FIX}'
    WHERE decodable
    """,
)
def audio_snr_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blind per-clip SNR estimate recovered THROUGH the bytes: decode
    -> 20 ms frame-RMS order statistics -> noise floor (p10) / speech
    level (p90) / their dB gap, hash-compared bit-exactly against
    build-time truth from the identical kernel. Map-only at any scale
    (one Arrow crossing, decodability pre-filtered on scan columns);
    the estimate is the reference-free twin of the snr_vs_synth
    invariant and feeds quality filtering like the acoustic flags."""
    from qcflow.udfs import with_snr_estimate

    _materialize_snrest()
    clips = spark.read.parquet(_SNREST_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return with_snr_estimate(_decodable(clips)).select(
        "clip_id", "noise_floor_db", "speech_db", "snr_est_db"
    )


# ------------------------------------------- composed normalize gate
#
# Construction truth for the COMPOSED normalization chain
# (with_normalize: decode once -> trim -> resample to 16 kHz ->
# loudness gain -> pcm16): clips at every valid rate with frame-aligned
# pads around tone bursts at hot/quiet levels, plus all-silent and
# undecodable regimes; truth = md5 + length of the final payload plus
# gain_db / clip_after, computed at build with the identical kernel
# chain on the roundtripped bytes. A md5 match here certifies the whole
# composition, not just each stage.

N_NORM = 200
_NORM_FIX = os.path.join(_DIR, "norm_v1.parquet")
_NORM_TARGET = 16000


def _materialize_norm() -> None:
    if os.path.exists(_NORM_FIX):
        return
    import hashlib

    from qcflow import audio
    from qcflow.udfs import trim_bounds

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_NORM):
        rng = np.random.default_rng([515160, i])
        sr = int(audio.VALID_SR[i % len(audio.VALID_SR)])
        fl = max(1, int(round(sr * 0.02)))
        regime = i % 5
        lead_fr = int(rng.integers(0, 12))
        trail_fr = int(rng.integers(0, 12))
        voiced_fr = int(rng.integers(10, 30))
        pad = lambda k: rng.normal(0.0, 0.0005, k * fl)  # noqa: E731
        t = np.arange(voiced_fr * fl) / sr
        # hot (attenuate), mid (amplify), quiet (gain cap) levels cycle
        amp = (0.7, 0.05, 0.004)[i % 3]
        tone = amp * np.sin(2 * np.pi * float(rng.uniform(200, 3400)) * t)
        if regime == 3:  # all silent -> empty normalized payload
            x = pad(lead_fr + voiced_fr + trail_fr)
        else:
            x = np.concatenate([pad(lead_fr), tone, pad(trail_fr)])
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        row = {
            "clip_id": i,
            "sr_hz": sr,
            "out_md5": None,
            "out_n": None,
            "gain_db_t": None,
            "clip_after_t": None,
            "decodable": regime != 4,
        }
        if regime == 4:
            if (i // 5) % 2 == 0:
                row.update(bytes=None, codec=codec)
            else:
                row.update(bytes=b"\x05\x06", codec="wma")
        else:
            b = _afp_encode(x, codec)
            dec = audio.decode(b, codec)
            s, e = trim_bounds(dec, sr)
            y = audio.resample(dec[s:e], sr, _NORM_TARGET)
            g_db, clipped = 0.0, False
            if len(y):
                _, g_db, clipped = audio.loudness_gain(y)
                y = np.clip(
                    y * (10.0 ** (g_db / 20.0)), -1.0, 1.0
                ).astype(np.float32)
            out = audio.pcm16_encode(y)
            row.update(
                bytes=b, codec=codec,
                out_md5=hashlib.md5(out).hexdigest(), out_n=len(y),
                gain_db_t=g_db, clip_after_t=clipped,
            )
        rows.append(row)
    pdf = pd.DataFrame(rows)
    pdf["out_n"] = pdf["out_n"].astype("Int64")
    pdf["clip_after_t"] = pdf["clip_after_t"].astype("boolean")
    pdf.to_parquet(_NORM_FIX, index=False)


_materialize_norm()


@query(
    "audio_normalize_pipeline",
    oracle=f"""
    SELECT CAST(clip_id AS BIGINT) AS clip_id,
           out_md5,
           CAST(out_n AS BIGINT) AS norm_samples,
           gain_db_t AS gain_db,
           clip_after_t AS clip_after
    FROM '{_NORM_FIX}'
    WHERE decodable
    """,
)
def audio_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED normalization stage recovered THROUGH the bytes in
    one decode pass: trim -> resample-to-16k -> loudness gain -> pcm16,
    the final payload's md5 + length + gain/clip flags hash-compared
    bit-exactly against build-time truth from the identical chain
    (qcflow/udfs.py with_normalize — the kernel the `qcflow.cli
    normalize` stage runs). Map-only at any scale; md5 JVM-side;
    undecodable rows excluded via the truth flag (scan-column
    pre-filter, unit-tested row guard)."""
    from qcflow.udfs import with_normalize

    _materialize_norm()
    clips = spark.read.parquet(_NORM_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return with_normalize(_decodable(clips), target_sr=_NORM_TARGET).select(
        "clip_id",
        F.md5(F.col("norm_bytes")).alias("out_md5"),
        F.col("norm_samples"),
        "gain_db",
        "clip_after",
    )


# ------------------------------------------- fixed-window segmentation
#
# Construction truth for udfs.segment_clips (the audio twin of sequence
# packing): clip lengths are CONSTRUCTED around the window boundary —
# n = k*win_n + rem with rem cycling {0, min_keep-1, min_keep, win_n-1}
# — so the keep/drop rule for the trailing partial segment is exercised
# exactly at its edges. Truth = one row per EXPECTED segment
# (clip_id, seg_idx, n_samples, md5 of the pcm16 payload), computed at
# build time with the identical kernel chain (encode -> decode ->
# segment_bounds -> slice -> pcm16_encode) on the roundtripped bytes.
# Undecodable rows (NULL bytes / unknown codec) get no truth rows and
# must produce no output rows.

N_SEG = 180
_SEG_FIX = os.path.join(_DIR, "segclips_v1.parquet")
_SEG_TRUTH = os.path.join(_DIR, "segtruth_v1.parquet")
_SEG_WIN_MS = 400


def _materialize_seg() -> None:
    if os.path.exists(_SEG_FIX) and os.path.exists(_SEG_TRUTH):
        return
    import hashlib
    import math

    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for i in range(N_SEG):
        rng = np.random.default_rng([515160, i])
        sr = int(rng.choice([8000, 16000]))
        win_n = int(round(sr * _SEG_WIN_MS / 1000.0))
        min_keep = max(1, math.ceil(win_n * audio.SEG_MIN_TAIL_FRAC))
        k = int(rng.integers(1, 6))
        rem = (0, min_keep - 1, min_keep, win_n - 1)[i % 4]
        n = k * win_n + rem
        t = np.arange(n) / sr
        x = 0.35 * np.sin(2 * np.pi * float(rng.uniform(150.0, 2600.0)) * t)
        x += rng.normal(0.0, 0.01, n)
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        if i % 6 == 5:  # undecodable regime: no truth rows
            if (i // 6) % 2 == 0:
                rows.append(
                    {"clip_id": i, "bytes": None, "sr_hz": sr, "codec": codec}
                )
            else:
                rows.append(
                    {"clip_id": i, "bytes": b"\x00\x01", "sr_hz": sr, "codec": "mp3"}
                )
            continue
        b = _afp_encode(x, codec)
        dec = audio.decode(b, codec)
        rows.append({"clip_id": i, "bytes": b, "sr_hz": sr, "codec": codec})
        for si, (s, e) in enumerate(audio.segment_bounds(len(dec), win_n)):
            truth.append(
                {
                    "clip_id": i,
                    "seg_idx": si,
                    "n_samples": e - s,
                    "seg_md5": hashlib.md5(
                        audio.pcm16_encode(dec[s:e])
                    ).hexdigest(),
                }
            )
    pd.DataFrame(rows).to_parquet(_SEG_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_SEG_TRUTH, index=False)


_materialize_seg()


@query(
    "audio_segment_chunks",
    oracle=f"""
    SELECT clip_id, seg_idx, n_samples, seg_md5
    FROM '{_SEG_TRUTH}'
    """,
)
def audio_segment_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window training segmentation recovered THROUGH the bytes:
    decode -> integer-exact window bounds -> pcm16 segment payloads, one
    output row per segment, md5-compared against build-time truth from
    the identical kernel chain. Map-only at any scale (one Arrow
    crossing, JVM-side generator, no shuffle); md5 computed JVM-side so
    segment payloads never cross back to Python. Boundary semantics
    (trailing partial kept iff >= half a window) are planted exactly at
    the edge in the fixture; undecodable rows yield zero rows."""
    from qcflow.udfs import segment_clips

    _materialize_seg()
    clips = spark.read.parquet(_SEG_FIX)
    return segment_clips(clips, win_ms=_SEG_WIN_MS).select(
        "clip_id",
        "seg_idx",
        "n_samples",
        F.md5(F.col("seg_bytes")).alias("seg_md5"),
    )


# ------------------------------------------- label-noise (same audio,
# different transcript)
#
# The QC composition on top of audio near-dup detection: when two clips'
# AUDIO is a near-duplicate but their TRANSCRIPTS disagree, at least one
# label is wrong — a real corpus routes the pair to review instead of
# letting the deduper silently keep a mislabeled survivor. Fixture: 120
# base clips, the first 60 get a near-dup copy via the dedup_audio_fp
# backoff ladder (guaranteed Hamming <= 3); EVEN copies keep the same
# transcript re-spelled (casing + extra whitespace — normalization must
# erase it), ODD copies get one word substituted (a genuine conflict).
# Truth column `conflict` is planted at build; Spark recovers the pairs
# through the bytes and the verdict through the transcript strings.

N_LC = 120
N_LC_COPIES = 60
_LC_OFF = 200_000
_LC_FIX = os.path.join(_DIR, "labelconf_v1.parquet")
_LC_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
).split()


def _lc_transcript(rng, n_words: int) -> str:
    return " ".join(rng.choice(_LC_WORDS) for _ in range(n_words))


def _materialize_lc() -> None:
    if os.path.exists(_LC_FIX):
        return
    import random

    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_LC):
        rng = np.random.default_rng([515161, i])
        wrng = random.Random(515162 + i)
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.4, 0.9)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3200.0), 3)):
            x = x + rng.uniform(0.08, 0.2) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.01, n)).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        b = _afp_encode(x, codec)
        base_fp = audio.audio_fp64(audio.decode(b, codec), sr)
        words = [wrng.choice(_LC_WORDS) for _ in range(wrng.randint(4, 9))]
        transcript = " ".join(words)
        rows.append(
            {
                "clip_id": i,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "transcript": transcript,
                "orig_id": None,
                "conflict": None,
            }
        )
        if i < N_LC_COPIES:
            other = "ulaw" if codec == "pcm16" else "pcm16"
            for cc, amp, gain in (
                (other, 0.008, 0.8),
                (codec, 0.008, 0.8),
                (codec, 0.003, 1.0),
                (codec, 0.0, 1.0),
            ):
                nrng = np.random.default_rng([515163, i])
                cp = gain * x + (nrng.normal(0.0, amp, n) if amp > 0 else 0.0)
                cb = b if (cc == codec and amp == 0.0 and gain == 1.0) else _afp_encode(
                    cp.astype(np.float32), cc
                )
                if (
                    audio.fp_hamming(
                        base_fp, audio.audio_fp64(audio.decode(cb, cc), sr)
                    )
                    <= _AFP_HAM_MAX
                ):
                    break
            conflict = bool(i % 2)
            if conflict:  # substitute one word -> normalized strings differ
                cw = list(words)
                j = wrng.randrange(len(cw))
                cw[j] = next(w for w in _LC_WORDS if w != cw[j])
                ct = " ".join(cw)
            else:  # same words, different spelling: casing + extra spaces
                ct = "  ".join(w.upper() if k % 2 else w for k, w in enumerate(words))
            rows.append(
                {
                    "clip_id": i + _LC_OFF,
                    "bytes": cb,
                    "codec": cc,
                    "sr_hz": sr,
                    "transcript": ct,
                    "orig_id": i,
                    "conflict": conflict,
                }
            )
    pdf = pd.DataFrame(rows)
    pdf["orig_id"] = pdf["orig_id"].astype("Int64")
    pdf.to_parquet(_LC_FIX, index=False)


_materialize_lc()


@query(
    "audio_label_conflict",
    oracle=f"""
    SELECT CAST(orig_id AS BIGINT) AS id_a,
           CAST(clip_id AS BIGINT) AS id_b,
           conflict
    FROM '{_LC_FIX}'
    WHERE orig_id IS NOT NULL
    """,
)
def audio_label_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise QC: near-dup audio pairs (decode -> spectral
    fingerprint -> banded Hamming self-join, the dedup_audio_fp plan)
    whose normalized transcripts disagree. The transcript rides the
    8-byte fingerprint frame as a NORMALIZED HASH (lower + whitespace
    collapse + trim, then xxhash64), so the self-join still shuffles
    hash-sized rows — never payload bytes or raw strings — and the
    conflict verdict is one integer comparison per banded candidate.
    Same-content re-spellings (casing/whitespace) must compare equal;
    one-word substitutions must flag. Restricted to planted pairs so
    the oracle is a truth projection while Spark recovers pairs through
    the bytes and verdicts through the strings."""
    from qcflow.udfs import with_audio_fp

    _materialize_lc()
    clips = spark.read.parquet(_LC_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz", "transcript"
    )
    t_norm = F.xxhash64(
        F.trim(F.regexp_replace(F.lower(F.col("transcript")), " +", " "))
    )
    fp = with_audio_fp(_decodable(clips)).select(
        "clip_id", "audio_fp", t_norm.alias("t_hash")
    )
    bands = fp.select(
        "clip_id",
        "audio_fp",
        "t_hash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(
                            f"(audio_fp >> {j * _AFP_BAND_BITS})"
                            f" & {(1 << _AFP_BAND_BITS) - 1}"
                        ).alias("bucket"),
                    )
                    for j in range(_AFP_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("clip_id", "audio_fp", "t_hash", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.expr("a.audio_fp ^ b.audio_fp"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.clip_id") == F.col("a.clip_id") + _LC_OFF),
        )
        .filter(ham <= _AFP_HAM_MAX)
        .select(
            F.col("a.clip_id").alias("id_a"),
            F.col("b.clip_id").alias("id_b"),
            (F.col("a.t_hash") != F.col("b.t_hash")).alias("conflict"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


@query(
    "audio_segment_transcripts",
    oracle=f"""
    WITH c AS (
      SELECT clip_id,
             CAST(CASE codec WHEN 'pcm16' THEN octet_length(bytes) // 2
                             WHEN 'ulaw' THEN octet_length(bytes) END
                  AS BIGINT) AS n_samples,
             (CAST(sr_hz AS BIGINT) * {_SEG_WIN_MS}) // 1000 AS win_n,
             list_filter(string_split(transcript, ' '), x -> x <> '') AS toks
      FROM '{_LC_FIX}'
      WHERE bytes IS NOT NULL AND codec IN ('pcm16', 'ulaw')),
    s AS (
      SELECT *,
             (n_samples // win_n)
             + CASE WHEN n_samples - (n_samples // win_n) * win_n
                         >= GREATEST(1, CAST(CEIL(win_n / 2.0) AS BIGINT))
                    THEN 1 ELSE 0 END AS n_segs,
             len(toks) AS n_words
      FROM c WHERE len(toks) > 0),
    w AS (
      SELECT clip_id, n_samples, win_n, n_segs, n_words,
             u.word, u.pos
      FROM s, LATERAL (
        SELECT unnest(toks) AS word,
               generate_subscripts(toks, 1) AS pos) u
      WHERE n_segs > 0)
    SELECT clip_id,
           LEAST(((2 * (pos - 1) + 1) * n_samples) // (2 * n_words) // win_n,
                 n_segs - 1) AS seg_idx,
           COUNT(*) AS n_words_seg,
           string_agg(word, ' ' ORDER BY pos) AS seg_text
    FROM w
    GROUP BY clip_id, seg_idx
    """,
)
def audio_segment_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment transcript labels via uniform-rate alignment
    (features.align_transcript_segments): word midpoints map onto the
    segment_clips 400 ms grid with exact integer arithmetic, sample
    counts derived from BYTE LENGTH (pcm16 = 2 B/sample, ulaw = 1) — so
    the whole labeling stage is pure column expressions fused with the
    scan, no decode, no UDF; the only shuffle is the per-(clip, segment)
    regroup. The DuckDB twin recomputes the identical integer form, so
    this is a full-arithmetic oracle, not a truth projection."""
    from qcflow.features import align_transcript_segments

    _materialize_lc()
    clips = spark.read.parquet(_LC_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz", "transcript"
    )
    return align_transcript_segments(clips, win_ms=_SEG_WIN_MS)


# ------------------------------------------- speed-perturb augmentation
#
# Construction truth for udfs.with_speed_perturb (the standard ASR
# 0.9x/1.1x augmentation): truth = md5 + length of each (clip, factor)
# payload computed at build with the identical rational-resample kernel
# on the roundtripped bytes; the integer tap phase makes executor bytes
# bit-equal to build bytes on any layout. Undecodable regime included.

N_SP = 140
_SP_FIX = os.path.join(_DIR, "speedp_v1.parquet")
_SP_TRUTH = os.path.join(_DIR, "speedp_truth_v1.parquet")


def _materialize_sp() -> None:
    if os.path.exists(_SP_FIX) and os.path.exists(_SP_TRUTH):
        return
    import hashlib

    from qcflow import audio
    from qcflow.udfs import SPEED_FACTORS

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for i in range(N_SP):
        rng = np.random.default_rng([515164, i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.3, 1.0)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        # band-limit below 0.9x Nyquist so the 1.1x path keeps content
        for f in np.exp(rng.uniform(np.log(120.0), np.log(0.35 * sr), 3)):
            x = x + rng.uniform(0.08, 0.2) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.005, n)).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        if i % 7 == 6:  # undecodable: no truth rows
            if (i // 7) % 2 == 0:
                rows.append({"clip_id": i, "bytes": None, "sr_hz": sr, "codec": codec})
            else:
                rows.append(
                    {"clip_id": i, "bytes": b"\x05\x06", "sr_hz": sr, "codec": "aac"}
                )
            continue
        b = _afp_encode(x, codec)
        dec = audio.decode(b, codec)
        rows.append({"clip_id": i, "bytes": b, "sr_hz": sr, "codec": codec})
        for num, den in SPEED_FACTORS:
            y = audio.resample(dec, num, den)
            truth.append(
                {
                    "clip_id": i,
                    "f_num": num,
                    "f_den": den,
                    "sp_samples": len(y),
                    "sp_md5": hashlib.md5(audio.pcm16_encode(y)).hexdigest(),
                }
            )
    pd.DataFrame(rows).to_parquet(_SP_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_SP_TRUTH, index=False)


_materialize_sp()


@query(
    "audio_speed_perturb",
    oracle=f"""
    SELECT clip_id, CAST(f_num AS INT) AS f_num, CAST(f_den AS INT) AS f_den,
           sp_samples, sp_md5
    FROM '{_SP_TRUTH}'
    """,
)
def audio_speed_perturb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speed-perturbation augmentation recovered THROUGH the bytes: each
    decodable clip emits its 0.9x and 1.1x time-scaled pcm16 payloads
    (rational windowed-sinc, sox-speed semantics), md5-compared against
    build-time truth from the identical kernel. Map-only at any scale;
    md5 computed JVM-side; undecodable rows contribute nothing."""
    from qcflow.udfs import with_speed_perturb

    _materialize_sp()
    clips = spark.read.parquet(_SP_FIX)
    return with_speed_perturb(clips).select(
        "clip_id",
        "f_num",
        "f_den",
        "sp_samples",
        F.md5(F.col("sp_bytes")).alias("sp_md5"),
    )


# ------------------------------------------- noise augmentation gate
#
# Construction truth for udfs.with_noise_augment: deterministic
# counter-based noise keyed by (seed, clip_id) means the truth builder
# and the executor derive IDENTICAL bytes from the identical kernel —
# md5 + length per clip, undecodable regime included. Also plants a
# digitally-silent clip (passes through unchanged — no signal power to
# scale against).

N_NZ = 120
_NZ_FIX = os.path.join(_DIR, "noiseaug_v1.parquet")
_NZ_TRUTH = os.path.join(_DIR, "noiseaug_truth_v1.parquet")
_NZ_SEED = 424242


def _materialize_nz() -> None:
    if os.path.exists(_NZ_FIX) and os.path.exists(_NZ_TRUTH):
        return
    import hashlib

    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for i in range(N_NZ):
        rng = np.random.default_rng([515165, i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.3, 0.9)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3000.0), 2)):
            x = x + rng.uniform(0.1, 0.25) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = x.astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        if i % 8 == 7:  # undecodable: no truth rows
            if (i // 8) % 2 == 0:
                rows.append({"clip_id": i, "bytes": None, "sr_hz": sr, "codec": codec})
            else:
                rows.append(
                    {"clip_id": i, "bytes": b"\x09", "sr_hz": sr, "codec": "wma"}
                )
            continue
        if i % 8 == 6:  # digitally silent: augment must pass through
            x = np.zeros(n, dtype=np.float32)
        b = _afp_encode(x, codec)
        dec = audio.decode(b, codec)
        rows.append({"clip_id": i, "bytes": b, "sr_hz": sr, "codec": codec})
        y = audio.noise_augment(dec, i, seed=_NZ_SEED)
        truth.append(
            {
                "clip_id": i,
                "nz_samples": len(y),
                "nz_md5": hashlib.md5(audio.pcm16_encode(y)).hexdigest(),
            }
        )
    pd.DataFrame(rows).to_parquet(_NZ_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_NZ_TRUTH, index=False)


_materialize_nz()


@query(
    "audio_noise_augment",
    oracle=f"""
    SELECT clip_id, nz_samples, nz_md5
    FROM '{_NZ_TRUTH}'
    """,
)
def audio_noise_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic additive-noise augmentation at 20 dB SNR recovered
    THROUGH the bytes: counter-based rng keyed by (seed, clip_id) makes
    executor output byte-identical to build-time truth on any layout or
    retry — no RNG state ever crosses tasks. Map-only, one Arrow
    crossing, md5 JVM-side; silent clips pass through unchanged and
    undecodable rows contribute nothing."""
    from qcflow.udfs import with_noise_augment

    _materialize_nz()
    clips = spark.read.parquet(_NZ_FIX)
    return with_noise_augment(_decodable(clips), seed=_NZ_SEED).select(
        "clip_id",
        "nz_samples",
        F.md5(F.col("nz_bytes")).alias("nz_md5"),
    )


# ------------------------------------------- repeated-content detection
#
# The composition of segmentation + fingerprinting: speech corpora carry
# repeated non-speech content (jingles, ads, station idents) that should
# be detected and dropped at the SEGMENT level. Fixture: 40 groups x 3
# clips of otherwise-unique sinusoid mixtures, each carrying one SHARED
# 400 ms pcm16 block planted at a (varying) window-aligned position —
# identical bytes => identical spectral fingerprint, while distinct
# random content diverges to ~32/64 bits. Truth rows (clip_id, seg_idx,
# group_rep) are planted at build; Spark must recover them THROUGH the
# bytes: segment -> fingerprint per segment -> group fingerprints seen
# in >= 2 distinct parents.

N_RC_GROUPS = 40
_RC_FIX = os.path.join(_DIR, "repcontent_v1.parquet")
_RC_TRUTH = os.path.join(_DIR, "repcontent_truth_v1.parquet")
_RC_SR = 8000
_RC_WIN = int(_RC_SR * 0.4)


def _materialize_rc() -> None:
    if os.path.exists(_RC_FIX) and os.path.exists(_RC_TRUTH):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for g in range(N_RC_GROUPS):
        grng = np.random.default_rng([515166, g])
        t = np.arange(_RC_WIN) / _RC_SR
        shared = np.zeros(_RC_WIN)
        for f in np.exp(grng.uniform(np.log(150.0), np.log(3000.0), 3)):
            shared = shared + grng.uniform(0.1, 0.25) * np.sin(
                2 * np.pi * f * t + grng.uniform(0, 2 * np.pi)
            )
        shared = (shared + grng.normal(0.0, 0.01, _RC_WIN)).astype(np.float32)
        # quantization-stable block: what every clip's bytes carry
        shared_q = audio.decode(audio.pcm16_encode(shared), "pcm16")
        for j in range(3):
            cid = 3 * g + j
            crng = np.random.default_rng([515167, cid])
            n_segs = int(crng.integers(3, 7))
            at = int(crng.integers(0, n_segs))
            parts = []
            for s in range(n_segs):
                if s == at:
                    parts.append(shared_q)
                    continue
                u = np.zeros(_RC_WIN)
                for f in np.exp(crng.uniform(np.log(150.0), np.log(3000.0), 3)):
                    u = u + crng.uniform(0.1, 0.25) * np.sin(
                        2 * np.pi * f * t + crng.uniform(0, 2 * np.pi)
                    )
                parts.append(
                    (u + crng.normal(0.0, 0.01, _RC_WIN)).astype(np.float32)
                )
            x = np.concatenate(parts)
            rows.append(
                {
                    "clip_id": cid,
                    "bytes": audio.pcm16_encode(x),
                    "sr_hz": _RC_SR,
                    "codec": "pcm16",
                }
            )
            truth.append({"clip_id": cid, "seg_idx": at, "group_rep": 3 * g})
    pd.DataFrame(rows).to_parquet(_RC_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_RC_TRUTH, index=False)


_materialize_rc()


@query(
    "dedup_repeated_segment",
    oracle=f"""
    SELECT clip_id, seg_idx, group_rep
    FROM '{_RC_TRUTH}'
    """,
)
def dedup_repeated_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-content detection at segment granularity (jingle / ad /
    station-ident removal): segment every clip on the 400 ms grid,
    fingerprint each segment, and flag segments whose fingerprint occurs
    in >= 2 DISTINCT parent clips — emitting (clip_id, seg_idx,
    group_rep = min parent id of the fingerprint group). Scale shape:
    the shuffle ships (parent, seg_idx, 8-byte fp) — never payload
    bytes; the grouping is ONE hash Exchange on fp with O(1) window
    state (min/max parent — ">= 2 distinct" == min != max), no
    self-join fan-out (an exact-equality group, the chunk-dedup shape,
    not the banded near-dup shape —
    identical planted bytes make fingerprints exactly equal while
    distinct random content diverges to ~32/64 bits). The two Arrow
    crossings (segment, fingerprint) are a documented composition of
    the audited kernels; a fused single-crossing variant is a trivial
    specialization if the extra crossing ever shows up in a profile."""
    from qcflow.udfs import segment_clips, with_audio_fp

    _materialize_rc()
    clips = spark.read.parquet(_RC_FIX)
    segs = segment_clips(_decodable(clips), win_ms=400).select(
        F.col("clip_id").alias("parent_id"),
        "seg_idx",
        F.col("seg_bytes").alias("bytes"),
        F.lit("pcm16").alias("codec"),
        "sr_hz",
    )
    fps = with_audio_fp(segs).select("parent_id", "seg_idx", "audio_fp")
    from pyspark.sql import Window

    w = Window.partitionBy("audio_fp")
    # ">= 2 distinct parents" == min(parent) != max(parent): O(1) window
    # state (a collect_set buffer would grow with a pathologically hot
    # fingerprint — a corpus-wide jingle — on one reducer)
    marked = fps.select(
        "parent_id",
        "seg_idx",
        F.min("parent_id").over(w).alias("group_rep"),
        (F.min("parent_id").over(w) != F.max("parent_id").over(w)).alias(
            "is_repeated"
        ),
    )
    return marked.filter("is_repeated").select(
        F.col("parent_id").alias("clip_id"), "seg_idx", "group_rep"
    )


# ------------------------------------------- VAD segmentation gate
#
# Construction truth for udfs.with_vad_segments (variable-length voiced
# spans — the realistic chunker next to the fixed grid): clips built as
# frame-aligned alternations of sub-threshold pads and tone bursts,
# with planted edge regimes — a 1-frame blip (must be dropped by the
# min-span rule), bursts touching the clip edges, all-silent clips (no
# rows) and undecodable rows. Truth = one row per expected span
# (start, length, payload md5) from the identical kernel chain on the
# roundtripped bytes.

N_VAD = 160
_VAD_FIX = os.path.join(_DIR, "vadseg_v1.parquet")
_VAD_TRUTH = os.path.join(_DIR, "vadseg_truth_v1.parquet")


def _materialize_vad() -> None:
    if os.path.exists(_VAD_FIX) and os.path.exists(_VAD_TRUTH):
        return
    import hashlib

    from qcflow import audio
    from qcflow.udfs import voiced_spans

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for i in range(N_VAD):
        rng = np.random.default_rng([515168, i])
        sr = int(rng.choice([8000, 16000]))
        fl = int(round(sr * 0.02))
        regime = i % 6
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        if regime == 5:  # undecodable
            if (i // 6) % 2 == 0:
                rows.append({"clip_id": i, "bytes": None, "sr_hz": sr, "codec": codec})
            else:
                rows.append(
                    {"clip_id": i, "bytes": b"\x0a\x0b", "sr_hz": sr, "codec": "amr"}
                )
            continue
        pad = lambda k: rng.normal(0.0, 0.0005, k * fl)  # noqa: E731
        def burst(k):
            t = np.arange(k * fl) / sr
            return 0.3 * np.sin(2 * np.pi * float(rng.uniform(200, 2500)) * t)
        if regime == 4:  # all silent -> zero spans
            x = pad(int(rng.integers(6, 20)))
        else:
            parts = []
            if regime != 0:  # regime 0: burst touches the left edge
                parts.append(pad(int(rng.integers(1, 6))))
            for _b in range(int(rng.integers(1, 4))):
                parts.append(burst(int(rng.integers(2, 9))))
                parts.append(pad(int(rng.integers(1, 6))))
            if regime == 2:  # planted 1-frame blip: dropped by min-span
                parts.append(burst(1))
                parts.append(pad(int(rng.integers(1, 4))))
            if regime == 3:  # burst touches the right edge
                parts.append(burst(int(rng.integers(2, 6))))
            x = np.concatenate(parts)
        x = np.clip(x, -0.999, 0.999).astype(np.float32)
        b = _afp_encode(x, codec)
        dec = audio.decode(b, codec)
        rows.append({"clip_id": i, "bytes": b, "sr_hz": sr, "codec": codec})
        for si, (s, e) in enumerate(voiced_spans(dec, sr)):
            truth.append(
                {
                    "clip_id": i,
                    "span_idx": si,
                    "start_sample": s,
                    "n_samples": e - s,
                    "span_md5": hashlib.md5(
                        audio.pcm16_encode(dec[s:e])
                    ).hexdigest(),
                }
            )
    pd.DataFrame(rows).to_parquet(_VAD_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_VAD_TRUTH, index=False)


_materialize_vad()


@query(
    "audio_vad_segments",
    oracle=f"""
    SELECT clip_id, span_idx, start_sample, n_samples, span_md5
    FROM '{_VAD_TRUTH}'
    """,
)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAD segmentation recovered THROUGH the bytes: decode -> maximal
    voiced-frame runs on the 20 ms RMS grid (sub-40 ms blips dropped) ->
    one pcm16 payload row per span, md5-compared against build-time
    truth from the identical kernel. The variable-length chunker real
    speech corpora use, next to the fixed-grid audio_segment_chunks.
    Map-only at any scale, one Arrow crossing, md5 JVM-side; all-silent
    clips emit zero rows, undecodable rows contribute nothing."""
    from qcflow.udfs import with_vad_segments

    _materialize_vad()
    clips = spark.read.parquet(_VAD_FIX)
    return with_vad_segments(_decodable(clips)).select(
        "clip_id",
        "span_idx",
        "start_sample",
        "n_samples",
        F.md5(F.col("span_bytes")).alias("span_md5"),
    )


# ------------------------------------------- band-feature extraction gate
#
# Construction truth for udfs.with_band_features: the float32 buffer of
# the 16 log band energies is md5'd at build with the identical kernel
# on the roundtripped bytes — any arithmetic drift (fft layout, band
# edges, log floor) breaks the hash. The vector column is the bridge
# into the ANN family: audio-derived embeddings searchable by the same
# brute-force / IVF / PQ paths the embeddings table uses.

N_BF = 140
_BF_FIX = os.path.join(_DIR, "bandfeat_v1.parquet")
_BF_TRUTH = os.path.join(_DIR, "bandfeat_truth_v1.parquet")


def _materialize_bf() -> None:
    if os.path.exists(_BF_FIX) and os.path.exists(_BF_TRUTH):
        return
    import hashlib

    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    rows, truth = [], []
    for i in range(N_BF):
        rng = np.random.default_rng([515169, i])
        sr = int(rng.choice([8000, 16000]))
        regime = i % 7
        if regime == 6:  # undecodable
            if (i // 7) % 2 == 0:
                rows.append(
                    {"clip_id": i, "bytes": None, "sr_hz": sr, "codec": "pcm16"}
                )
            else:
                rows.append(
                    {"clip_id": i, "bytes": b"\x0c", "sr_hz": sr, "codec": "m4a"}
                )
            continue
        if regime == 5:  # near-empty clip -> all-floor vector
            n = int(rng.integers(0, 4))
            x = np.zeros(n, dtype=np.float32)
        else:
            n = int(sr * float(rng.uniform(0.3, 0.9)))
            t = np.arange(n) / sr
            x = np.zeros(n)
            for f in np.exp(rng.uniform(np.log(150.0), np.log(3000.0), 3)):
                x = x + rng.uniform(0.08, 0.2) * np.sin(
                    2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
                )
            x = (x + rng.normal(0.0, 0.01, n)).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        b = _afp_encode(x, codec)
        dec = audio.decode(b, codec)
        rows.append({"clip_id": i, "bytes": b, "sr_hz": sr, "codec": codec})
        v = audio.band_features(dec, sr)
        truth.append(
            {
                "clip_id": i,
                "n_dims": len(v),
                "feat_md5": hashlib.md5(v.tobytes()).hexdigest(),
            }
        )
    pd.DataFrame(rows).to_parquet(_BF_FIX, index=False)
    pd.DataFrame(truth).to_parquet(_BF_TRUTH, index=False)


_materialize_bf()


@query(
    "audio_band_features",
    oracle=f"""
    SELECT clip_id, CAST(n_dims AS INT) AS n_dims, feat_md5
    FROM '{_BF_TRUTH}'
    """,
)
def audio_band_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio embedding extraction recovered THROUGH the bytes: decode ->
    16 log band energies (float32) with the buffer md5-compared against
    build-time truth from the identical kernel — bit-exact floats, not
    rounded. Map-only at any scale, one Arrow crossing, md5 JVM-side;
    the `feat` array<float> column this UDF also emits plugs audio
    directly into the ANN family (brute force / IVF / PQ). Near-empty
    clips yield the all-floor vector; undecodable rows contribute
    nothing."""
    from qcflow.udfs import with_band_features

    _materialize_bf()
    clips = spark.read.parquet(_BF_FIX)
    return with_band_features(_decodable(clips)).select(
        "clip_id",
        F.size("feat").alias("n_dims"),
        F.md5(F.col("feat_bytes")).alias("feat_md5"),
    )


# ------------------------------------------- eval-set audio decontamination
#
# The audio twin of text_decontaminate (parity/text.py): clips whose
# spectral fingerprint near-matches a held-out EVAL clip are benchmark
# contamination and must be quarantined before training. Fixture: 24
# eval clips + 180 corpus clips; the first 40 corpus rows are
# transcoded / re-gained / noised copies of eval clips planted under the
# dedup_audio_fp backoff ladder (last rung = original bytes, Hamming 0),
# so recall 1 within the banded radius is guaranteed by construction.
# Clean corpus rows (random content, incl. NULL-bytes / unknown-codec
# regimes) are build-time ASSERTED to sit beyond the Hamming radius of
# EVERY eval fingerprint — the oracle is then a pure truth-column
# projection while Spark recovers the contamination set THROUGH the
# bytes on both sides.

N_DE_EVAL = 24
N_DE_CONTAM = 40
N_DE_CORPUS = 180
_DE_OFF = 10_000
_DECON_FIX = os.path.join(_DIR, "decon_v1.parquet")


def _materialize_decon() -> None:
    if os.path.exists(_DECON_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)

    def _synth(seed_i: int):
        rng = np.random.default_rng([515177, seed_i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.4, 0.9)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3200.0), 3)):
            x = x + rng.uniform(0.08, 0.2) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.01, n)).astype(np.float32)
        codec = "pcm16" if seed_i % 2 == 0 else "ulaw"
        return x, sr, codec

    rows = []
    eval_fps = []
    eval_src = []
    for i in range(N_DE_EVAL):
        x, sr, codec = _synth(i)
        b = _afp_encode(x, codec)
        eval_fps.append(audio.audio_fp64(audio.decode(b, codec), sr))
        eval_src.append((x, sr, codec, b))
        rows.append(
            {
                "clip_id": i,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "is_eval": True,
                "contam_eval_id": None,
                "t_hamming": None,
            }
        )
    for j in range(N_DE_CORPUS):
        cid = _DE_OFF + j
        if j < N_DE_CONTAM:
            src = j % N_DE_EVAL
            x, sr, codec, b = eval_src[src]
            other = "ulaw" if codec == "pcm16" else "pcm16"
            for cc, amp, gain in (
                (other, 0.008, 0.8),
                (codec, 0.008, 0.8),
                (codec, 0.003, 1.0),
                (codec, 0.001, 1.0),
                (codec, 0.0, 1.0),
            ):
                nrng = np.random.default_rng([515178, j])
                cp = gain * x + (nrng.normal(0.0, amp, len(x)) if amp > 0 else 0.0)
                cb = (
                    b
                    if (cc == codec and amp == 0.0 and gain == 1.0)
                    else _afp_encode(cp.astype(np.float32), cc)
                )
                fp = audio.audio_fp64(audio.decode(cb, cc), sr)
                ham = audio.fp_hamming(eval_fps[src], fp)
                if ham <= _AFP_HAM_MAX:
                    break
            # the copy must hit ONLY its source eval clip inside the radius
            for k, efp in enumerate(eval_fps):
                if k != src:
                    assert audio.fp_hamming(efp, fp) > _AFP_HAM_MAX
            rows.append(
                {
                    "clip_id": cid,
                    "bytes": cb,
                    "codec": cc,
                    "sr_hz": sr,
                    "is_eval": False,
                    "contam_eval_id": src,
                    "t_hamming": ham,
                }
            )
            continue
        plant = "" if j % 9 else "no_bytes" if j % 18 else "bad_codec"
        x, sr, codec = _synth(1_000 + j)
        b = _afp_encode(x, codec)
        if plant == "":
            fp = audio.audio_fp64(audio.decode(b, codec), sr)
            for efp in eval_fps:
                assert audio.fp_hamming(efp, fp) > _AFP_HAM_MAX
        rows.append(
            {
                "clip_id": cid,
                "bytes": None if plant == "no_bytes" else b,
                "codec": "opus" if plant == "bad_codec" else codec,
                "sr_hz": sr,
                "is_eval": False,
                "contam_eval_id": None,
                "t_hamming": None,
            }
        )
    pdf = pd.DataFrame(rows)
    for c in ("contam_eval_id", "t_hamming"):
        pdf[c] = pdf[c].astype("Int64")
    pdf.to_parquet(_DECON_FIX, index=False)


_materialize_decon()


@query(
    "audio_decontaminate",
    oracle=f"""
    SELECT clip_id,
           CAST(contam_eval_id AS BIGINT) AS eval_id,
           CAST(t_hamming AS INT) AS hamming
    FROM '{_DECON_FIX}'
    WHERE contam_eval_id IS NOT NULL AND t_hamming <= {_AFP_HAM_MAX}
    """,
)
def audio_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination for the AUDIO modality (the twin of
    text_decontaminate): corpus clips whose 64-bit spectral fingerprint
    sits within Hamming 3 of any held-out eval clip are
    flagged with the eval row they collide with. The eval set is
    dimension-sized at any corpus scale, so its (band, bucket, fp) rows
    are BROADCAST — the plan is corpus scan -> one Arrow fp crossing ->
    4-way band explode -> broadcast hash join -> exact Hamming filter;
    the corpus never shuffles and clip bytes never leave the scan task.
    Hamming <= 3 over 4x16 bands guarantees a shared clean band
    (pigeonhole), so banded recall is 1 within the radius. NULL-bytes /
    unknown-codec corpus rows yield NULL fingerprints and never join."""
    from qcflow.udfs import with_audio_fp

    _materialize_decon()
    clips = spark.read.parquet(_DECON_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz", "is_eval"
    )

    def _bands(fp_df: DataFrame, idc: str, fpc: str) -> DataFrame:
        return fp_df.select(
            idc,
            fpc,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(jj).alias("band"),
                            F.expr(
                                f"({fpc} >> {jj * _AFP_BAND_BITS})"
                                f" & {(1 << _AFP_BAND_BITS) - 1}"
                            ).alias("bucket"),
                        )
                        for jj in range(_AFP_BANDS)
                    ]
                )
            ).alias("bb"),
        ).select(idc, fpc, "bb.band", "bb.bucket")

    evalf = with_audio_fp(
        _decodable(clips.filter(F.col("is_eval")))
    ).select(
        F.col("clip_id").alias("eval_id"), F.col("audio_fp").alias("eval_fp")
    )
    corp = with_audio_fp(
        _decodable(clips.filter(~F.col("is_eval")))
    ).select("clip_id", "audio_fp")
    ham = F.bit_count(F.expr("audio_fp ^ eval_fp")).cast("int")
    return (
        _bands(corp, "clip_id", "audio_fp")
        .join(F.broadcast(_bands(evalf, "eval_id", "eval_fp")), ["band", "bucket"])
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= _AFP_HAM_MAX)
        .select("clip_id", "eval_id", "hamming")
        .dropDuplicates(["clip_id", "eval_id"])
    )


# --------------------------------------------- cross-modal speech-rate QC
#
# Words-per-voiced-second consistency between the AUDIO payload and its
# transcript — the cross-modal sanity rule ASR corpora filter on (a
# 20-word transcript over 0.1 s of speech is a mislabeled row even when
# both sides pass their single-modal checks). voiced_samples comes
# THROUGH the bytes (decode -> voiced_spans, the with_vad_segments
# kernel reduced to a scalar); the word count and the rate arithmetic
# are pure column expressions identical in both engines, so the oracle
# recomputes rate/status in SQL from the fixture's kernel-derived
# t_voiced_samples truth column. Regimes: normal / too-fast (planted
# rate >= 16x the threshold margin) / too-slow / silent-audio-with-
# nonempty-transcript (no_speech) / undecodable (excluded via truth
# flag). Build-time asserts pin every planted rate far from both cut
# points.

N_SRATE = 150
RATE_FAST_WPS = 8.0
RATE_SLOW_WPS = 0.5
_SRATE_FIX = os.path.join(_DIR, "sprate_v1.parquet")


def _materialize_srate() -> None:
    if os.path.exists(_SRATE_FIX):
        return
    from qcflow import audio
    from qcflow.udfs import voiced_spans

    os.makedirs(_DIR, exist_ok=True)
    rows = []
    for i in range(N_SRATE):
        rng = np.random.default_rng([515181, i])
        sr = int(rng.choice([8000, 16000]))
        regime = i % 5
        if regime == 0:  # normal: ~70% voiced, ~3 words/s
            total, v0, v1 = 2.0, 0.3, 1.7
            n_words = 4
        elif regime == 1:  # too fast: 0.12 s voiced, 20 words
            total, v0, v1 = 2.0, 0.5, 0.62
            n_words = 20
        elif regime == 2:  # too slow: 4 s voiced, 1 word
            total, v0, v1 = 4.2, 0.1, 4.1
            n_words = 1
        elif regime == 3:  # silent audio, non-empty transcript
            total, v0, v1 = 2.0, 0.0, 0.0
            n_words = 5
        else:  # undecodable
            rows.append(
                {
                    "clip_id": i,
                    "bytes": None if (i // 5) % 2 == 0 else b"\x07",
                    "codec": "pcm16" if (i // 5) % 2 == 0 else "m4a",
                    "sr_hz": sr,
                    "transcript": "w0 w1",
                    "t_voiced_samples": None,
                    "t_n_spans": None,
                    "decodable": False,
                }
            )
            continue
        n = int(sr * total)
        x = np.zeros(n, dtype=np.float32)
        if v1 > v0:
            a, b_ = int(sr * v0), int(sr * v1)
            t = np.arange(b_ - a) / sr
            f = float(rng.uniform(200.0, 1200.0))
            x[a:b_] = (
                0.3 * np.sin(2 * np.pi * f * t)
                + rng.normal(0.0, 0.02, b_ - a)
            ).astype(np.float32)
        codec = "pcm16" if i % 2 == 0 else "ulaw"
        b = _afp_encode(x, codec)
        spans = voiced_spans(audio.decode(b, codec), sr)
        vs = int(sum(e - s for s, e in spans))
        if regime == 3:
            assert vs == 0
        else:
            rate = n_words * float(sr) / vs
            if regime == 0:
                assert 1.0 < rate < 6.0, (i, rate)
            elif regime == 1:
                assert rate > 4 * RATE_FAST_WPS, (i, rate)
            else:
                assert rate < RATE_SLOW_WPS / 1.5, (i, rate)
        rows.append(
            {
                "clip_id": i,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "transcript": " ".join(f"w{k}" for k in range(n_words)),
                "t_voiced_samples": vs,
                "t_n_spans": len(spans),
                "decodable": True,
            }
        )
    pdf = pd.DataFrame(rows)
    for c in ("t_voiced_samples",):
        pdf[c] = pdf[c].astype("Int64")
    pdf["t_n_spans"] = pdf["t_n_spans"].astype("Int32")
    pdf.to_parquet(_SRATE_FIX, index=False)


_materialize_srate()

_SRATE_WORDS_SQL = (
    "len(list_filter(string_split(trim(transcript), ' '), x -> x <> ''))"
)


@query(
    "audio_speech_rate_qc",
    oracle=f"""
    SELECT clip_id,
           CAST(t_voiced_samples AS BIGINT) AS voiced_samples,
           CAST({_SRATE_WORDS_SQL} AS INT) AS n_words,
           CASE WHEN t_voiced_samples > 0
                THEN (CAST({_SRATE_WORDS_SQL} AS DOUBLE) * sr_hz)
                     / t_voiced_samples
                END AS rate_wps,
           CASE WHEN t_voiced_samples = 0
                     AND {_SRATE_WORDS_SQL} > 0 THEN 'no_speech'
                WHEN (CAST({_SRATE_WORDS_SQL} AS DOUBLE) * sr_hz)
                     / t_voiced_samples > {RATE_FAST_WPS} THEN 'too_fast'
                WHEN (CAST({_SRATE_WORDS_SQL} AS DOUBLE) * sr_hz)
                     / t_voiced_samples < {RATE_SLOW_WPS} THEN 'too_slow'
                ELSE 'ok' END AS status
    FROM '{_SRATE_FIX}'
    WHERE decodable
    """,
)
def audio_speech_rate_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal speech-rate QC: decode -> voiced_spans -> total
    voiced samples (one Arrow crossing, scalar columns out — no span
    payloads), then words-per-voiced-second and a status flag as pure
    column arithmetic (JVM codegen). Map-only at any scale: no shuffle,
    no driver traffic; the transcript side (word count) never touches
    Python. Rates: > 8 w/s too_fast, < 0.5 w/s too_slow, silent audio
    with a non-empty transcript no_speech. NULL-bytes / unknown-codec
    rows are pre-filtered on scan columns (the _decodable discipline —
    filtering on the UDF's own output would clone the Arrow node)."""
    from qcflow.udfs import with_voiced_stats

    _materialize_srate()
    clips = spark.read.parquet(_SRATE_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz", "transcript"
    )
    stats = with_voiced_stats(_decodable(clips))
    n_words = F.size(
        F.filter(
            F.split(F.trim(F.col("transcript")), " "),
            lambda x: x != F.lit(""),
        )
    )
    rate = (
        n_words.cast("double")
        * F.col("sr_hz")
        / F.col("voiced_samples")
    )
    return stats.select(
        "clip_id",
        "voiced_samples",
        n_words.cast("int").alias("n_words"),
        F.when(F.col("voiced_samples") > 0, rate).alias("rate_wps"),
        F.when(
            (F.col("voiced_samples") == 0) & (n_words > 0), F.lit("no_speech")
        )
        .when(rate > RATE_FAST_WPS, F.lit("too_fast"))
        .when(rate < RATE_SLOW_WPS, F.lit("too_slow"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


# ------------------------------------- speaker-style clustering THROUGH bytes
#
# End-to-end composition of the audio-feature and ANN families: decode
# -> 16 log band energies (with_band_features) -> distributed Lloyd's
# k-means (ann.kmeans_fit, farthest-first seeding) -> partition gate
# via the min-id representative (the ann_kmeans_assign pattern —
# label-permutation-free). Four planted "speakers", each with energy in
# a distinct 4-band signature set of the 16-band log grid; amplitude
# jitter + noise keep intra-speaker spread well under the inter-speaker
# gap (3x margin ASSERTED at build on the identical kernel's features),
# so Gonzalez seeding provably lands one seed per speaker and Lloyd's
# recovers the partition exactly. Clip ids 0..3 are the per-speaker
# minima by construction (i % 4), so the min-id representative IS the
# planted speaker index.

N_SPK_CLIPS = 160
_SPK_K = 4
_SPK_FIX = os.path.join(_DIR, "spk_v1.parquet")


def _materialize_spk() -> None:
    if os.path.exists(_SPK_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)
    sr = 16000
    # band centers of the 16-band log grid (100 Hz .. 0.45*sr)
    edges = np.exp(np.linspace(np.log(100.0), np.log(0.45 * sr), 17))
    centers = np.sqrt(edges[:-1] * edges[1:])
    rows, feats = [], {}
    for i in range(N_SPK_CLIPS):
        rng = np.random.default_rng([515199, i])
        spk = i % _SPK_K
        if i % 20 == 19:  # undecodable regime (never ids 0..3)
            rows.append(
                {
                    "clip_id": i,
                    "bytes": None if (i // 20) % 2 == 0 else b"\x03",
                    "codec": "pcm16" if (i // 20) % 2 == 0 else "m4a",
                    "sr_hz": sr,
                    "spk": spk,
                    "decodable": False,
                }
            )
            continue
        # fixed length + amplitude: intra-speaker spread is then only
        # phase/noise realization, far under the 8-band signature gap
        n = sr // 2
        t = np.arange(n) / sr
        x = np.zeros(n)
        for b in (spk, spk + 4, spk + 8, spk + 12):
            x = x + 0.3 * np.sin(
                2 * np.pi * centers[b] * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.002, n)).astype(np.float32)
        b_ = _afp_encode(x, "pcm16")
        feats[i] = audio.band_features(audio.decode(b_, "pcm16"), sr)
        rows.append(
            {
                "clip_id": i,
                "bytes": b_,
                "codec": "pcm16",
                "sr_hz": sr,
                "spk": spk,
                "decodable": True,
            }
        )
    # separation margin: 3x between the largest intra-speaker and the
    # smallest inter-speaker feature distance (Gonzalez + Lloyd's can
    # then never split a speaker or merge two)
    ids = sorted(feats)
    intra, inter = 0.0, float("inf")
    for a in ids:
        for b2 in ids:
            if b2 <= a:
                continue
            d = float(np.linalg.norm(feats[a] - feats[b2]))
            if a % _SPK_K == b2 % _SPK_K:
                intra = max(intra, d)
            else:
                inter = min(inter, d)
    assert intra * 3.0 < inter, (intra, inter)
    pdf = pd.DataFrame(rows)
    pdf.to_parquet(_SPK_FIX, index=False)


_materialize_spk()


@query(
    "audio_speaker_cluster",
    oracle=f"""
    SELECT clip_id, CAST(spk AS BIGINT) AS cluster_rep
    FROM '{_SPK_FIX}' WHERE decodable
    """,
)
def audio_speaker_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Speaker-style clip clustering recovered THROUGH the bytes: one
    Arrow crossing to band-energy features, distributed k-means over
    the float vectors (farthest-first seeds, Lloyd refinement —
    vocabulary-sized driver traffic), every clip tagged with the min
    clip_id of its trained cluster. The fixture's 3x separation margin
    plus ids 0..3 being the per-speaker minima make the gate exact:
    hash equality means the trained partition IS the planted one. At
    scale this is the audio corpus-organization pass (pseudo-speaker /
    domain discovery) the IVF coarse quantizer already implements for
    embeddings — here fed by audio-derived features end to end."""
    from pyspark.sql import Window

    from qcflow.ann import assign_clusters, kmeans_fit
    from qcflow.udfs import with_band_features

    _materialize_spk()
    clips = spark.read.parquet(_SPK_FIX).select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    vec = (
        with_band_features(_decodable(clips))
        .select("clip_id", F.col("feat").cast("array<double>").alias("emb"))
        .localCheckpoint()
    )
    codebook = kmeans_fit(
        vec, k=_SPK_K, id_col="clip_id", n_iter=4, init="farthest"
    )
    assigned = assign_clusters(vec, codebook, emb_col="emb")
    w = Window.partitionBy("cluster")
    return assigned.select(
        "clip_id", F.min("clip_id").over(w).alias("cluster_rep")
    )


# ------------------------------------------ duration-budget clip packing
#
# The audio twin of x_sequence_pack: clips folded into fixed-DURATION
# training examples (ASR batches pack by seconds the way LM batches pack
# by tokens). Durations derive from BYTE LENGTH and codec — integer
# arithmetic both engines replay exactly, no decode anywhere (the
# audio_segment_transcripts trick) — so the oracle is a full-arithmetic
# recursive CTE, not a truth projection. Greedy next-fit inside
# hash-ordered groups, the same per-group sequential recurrence as the
# token packer: one hash shuffle + applyInPandas, determinism from the
# hash order, never the partition layout.

_APACK_BUDGET_MS = 3000
_APACK_G = 8


def _apack_sql_h(col: str = "clip_id") -> str:
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    return f"((({col} % {HASH_P}) * {HASH_K}) % {HASH_P})"


def _apack_oracle() -> str:
    return f"""
    WITH RECURSIVE numbered AS (
      SELECT clip_id, h, dur_ms,
             CAST(h % {_APACK_G} AS INT) AS grp,
             ROW_NUMBER() OVER (
               PARTITION BY h % {_APACK_G} ORDER BY h, clip_id
             ) AS rn
      FROM (
        SELECT clip_id, {_apack_sql_h()} AS h,
               ((CASE WHEN codec = 'pcm16'
                      THEN octet_length(bytes) // 2
                      ELSE octet_length(bytes) END) * 1000) // sr_hz
                 AS dur_ms
        FROM '{_AFP_FIX}'
        WHERE bytes IS NOT NULL AND codec IN ('pcm16', 'ulaw')
      )
    ),
    packed AS (
      SELECT clip_id, grp, rn, dur_ms,
             0 AS pack_id, dur_ms AS used
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.clip_id, n.grp, n.rn, n.dur_ms,
             CASE WHEN p.used + n.dur_ms > {_APACK_BUDGET_MS}
                  THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.used + n.dur_ms > {_APACK_BUDGET_MS}
                  THEN n.dur_ms ELSE p.used + n.dur_ms END
      FROM packed p JOIN numbered n
        ON n.grp = p.grp AND n.rn = p.rn + 1
    )
    SELECT clip_id, grp, CAST(pack_id AS INT) AS pack_id,
           CAST(dur_ms AS BIGINT) AS dur_ms
    FROM packed
    """


@query("audio_duration_pack", oracle=_apack_oracle())
def audio_duration_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duration-budget packing of audio clips into training examples
    (3 s budget): duration from byte length + codec (pure integer
    column arithmetic — no decode, no UDF on the sizing side), greedy
    next-fit inside deterministic hash-ordered groups via ONE hash
    shuffle + applyInPandas (a linear pass per group — no driver loop,
    no global sort). Clips longer than the budget get a pack of their
    own. The DuckDB twin replays the identical integer recurrence as a
    recursive CTE over the same fixture bytes."""
    import pandas as pd

    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    _materialize_fp()
    clips = spark.read.parquet(_AFP_FIX).filter(
        F.col("bytes").isNotNull() & F.col("codec").isin("pcm16", "ulaw")
    )
    n_samples = F.when(
        F.col("codec") == "pcm16", F.expr("length(bytes) DIV 2")
    ).otherwise(F.length("bytes"))
    h = F.pmod(
        F.pmod(F.col("clip_id"), F.lit(HASH_P)) * F.lit(HASH_K), F.lit(HASH_P)
    )
    items = clips.select(
        "clip_id",
        h.alias("h"),
        (n_samples * 1000).cast("long").alias("_ns1000"),
        "sr_hz",
    ).select(
        "clip_id",
        "h",
        F.expr("_ns1000 DIV sr_hz").alias("dur_ms"),
        F.pmod(F.col("h"), F.lit(_APACK_G)).cast("int").alias("grp"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "clip_id"]).reset_index(drop=True)
        packs, used, cur = [], 0, 0
        for d in pdf["dur_ms"]:
            if packs and used + d > _APACK_BUDGET_MS:
                cur += 1
                used = 0
            used += int(d)
            packs.append(cur)
        pdf["pack_id"] = pd.Series(packs, dtype="int32")
        return pdf[["clip_id", "grp", "pack_id", "dur_ms"]]

    return items.groupBy("grp").applyInPandas(
        pack, "clip_id long, grp int, pack_id int, dur_ms long"
    )


# ---------------------------------------------- incremental near-dup dedup
#
# The resumable-load form of dedup (the index_store pattern applied to
# the dedup family): a NEW snapshot's clips dedup against the COMMITTED
# corpus via its persisted fingerprint table — 8 bytes/clip, history
# never rescanned, exactly what the snapshot manifest stages per commit
# — and against themselves (intra-increment copies, min-clip_id
# survivor). Fixture truth: committed fingerprints are STORED columns
# computed at build with the identical kernel (the staged-fp contract);
# new-side regimes — fresh / copy-of-committed (dropped) / intra-
# increment groups (one survivor) / undecodable (conservatively kept) —
# are planted with every cross-regime Hamming distance build-ASSERTED
# beyond the radius, so the survivor set is closed-form and the oracle
# is a pure truth projection while Spark re-derives it through the
# bytes and the staged table.

_INC_FIX = os.path.join(_DIR, "incdedup_v1.parquet")
N_INC_COMMITTED = 40


def _materialize_inc() -> None:
    if os.path.exists(_INC_FIX):
        return
    from qcflow import audio

    os.makedirs(_DIR, exist_ok=True)

    def _synth(seed_i: int):
        rng = np.random.default_rng([515207, seed_i])
        sr = int(rng.choice([8000, 16000]))
        n = int(sr * float(rng.uniform(0.4, 0.8)))
        t = np.arange(n) / sr
        x = np.zeros(n)
        for f in np.exp(rng.uniform(np.log(150.0), np.log(3200.0), 3)):
            x = x + rng.uniform(0.08, 0.2) * np.sin(
                2 * np.pi * f * t + rng.uniform(0, 2 * np.pi)
            )
        x = (x + rng.normal(0.0, 0.01, n)).astype(np.float32)
        codec = "pcm16" if seed_i % 2 == 0 else "ulaw"
        return x, sr, codec

    def _fp(b, codec, sr):
        return audio.audio_fp64(audio.decode(b, codec), sr)

    rows = []
    all_fps: dict[int, int] = {}
    committed: list[tuple] = []
    for i in range(N_INC_COMMITTED):
        x, sr, codec = _synth(i)
        b = _afp_encode(x, codec)
        fp = _fp(b, codec, sr)
        all_fps[i] = fp
        committed.append((i, x, sr, codec, b, fp))
        rows.append(
            {
                "clip_id": i,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "snapshot": "A",
                "committed_fp": fp,
                "survives": None,
                "t_cluster_size": None,
            }
        )

    def _ladder(x, sr, codec, b, target_fp, seed):
        other = "ulaw" if codec == "pcm16" else "pcm16"
        for cc, amp, gain in (
            (other, 0.008, 0.8),
            (codec, 0.008, 0.8),
            (codec, 0.003, 1.0),
            (codec, 0.0, 1.0),
        ):
            nrng = np.random.default_rng([515208, seed])
            cp = gain * x + (nrng.normal(0.0, amp, len(x)) if amp > 0 else 0.0)
            cb = (
                b
                if (cc == codec and amp == 0.0 and gain == 1.0)
                else _afp_encode(cp.astype(np.float32), cc)
            )
            fp = _fp(cb, cc, sr)
            if audio.fp_hamming(target_fp, fp) <= _AFP_HAM_MAX:
                return cb, cc, fp
        raise AssertionError("ladder failed")

    def _assert_isolated(fp, exempt=()):
        for k, other in all_fps.items():
            if k not in exempt:
                assert audio.fp_hamming(fp, other) > _AFP_HAM_MAX, k

    nid = 10_000
    # regime 1: fresh rows (survive alone)
    for j in range(30):
        x, sr, codec = _synth(1_000 + j)
        b = _afp_encode(x, codec)
        fp = _fp(b, codec, sr)
        _assert_isolated(fp)
        all_fps[nid] = fp
        rows.append(
            {
                "clip_id": nid,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "snapshot": "B",
                "committed_fp": None,
                "survives": True,
                "t_cluster_size": None,
            }
        )
        nid += 1
    # regime 2: copies of committed clips (dropped)
    for j in range(16):
        ci, x, sr, codec, b, cfp = committed[j % N_INC_COMMITTED]
        cb, cc, fp = _ladder(x, sr, codec, b, cfp, j)
        _assert_isolated(fp, exempt=(ci,))
        all_fps[nid] = fp
        rows.append(
            {
                "clip_id": nid,
                "bytes": cb,
                "codec": cc,
                "sr_hz": sr,
                "snapshot": "B",
                "committed_fp": None,
                "survives": False,
                "t_cluster_size": None,
            }
        )
        nid += 1
    # regime 3: intra-increment duplicate pairs (min clip_id survives)
    for j in range(10):
        x, sr, codec = _synth(2_000 + j)
        b = _afp_encode(x, codec)
        fp = _fp(b, codec, sr)
        _assert_isolated(fp)
        cb, cc, fp2 = _ladder(x, sr, codec, b, fp, 100 + j)
        _assert_isolated(fp2, exempt=())
        all_fps[nid] = fp
        all_fps[nid + 1] = fp2
        rows.append(
            {
                "clip_id": nid,
                "bytes": b,
                "codec": codec,
                "sr_hz": sr,
                "snapshot": "B",
                "committed_fp": None,
                "survives": True,
                "t_cluster_size": 2,
            }
        )
        rows.append(
            {
                "clip_id": nid + 1,
                "bytes": cb,
                "codec": cc,
                "sr_hz": sr,
                "snapshot": "B",
                "committed_fp": None,
                "survives": False,
                "t_cluster_size": None,
            }
        )
        nid += 2
    # regime 4: undecodable rows — conservatively kept
    for j in range(4):
        rows.append(
            {
                "clip_id": nid,
                "bytes": None if j % 2 == 0 else b"\x05",
                "codec": "pcm16" if j % 2 == 0 else "m4a",
                "sr_hz": 8000,
                "snapshot": "B",
                "committed_fp": None,
                "survives": True,
                "t_cluster_size": None,
            }
        )
        nid += 1
    pdf = pd.DataFrame(rows)
    # 64-bit fingerprints MUST come from the python-int list: DataFrame
    # inference routes a None-bearing int column through float64 and
    # silently corrupts the low bits (CLAUDE.md r5 — with_audio_fp had
    # the same bug pre-commit)
    pdf["committed_fp"] = pd.Series(
        [r["committed_fp"] for r in rows], dtype="Int64"
    )
    pdf["t_cluster_size"] = pdf["t_cluster_size"].astype("Int64")
    pdf["survives"] = pdf["survives"].astype("boolean")
    pdf.to_parquet(_INC_FIX, index=False)


_materialize_inc()


@query(
    "dedup_incremental",
    oracle=f"""
    SELECT clip_id, CAST(t_cluster_size AS BIGINT) AS cluster_size
    FROM '{_INC_FIX}'
    WHERE snapshot = 'B' AND survives
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new snapshot against the committed corpus
    (pipeline.dedup_increment): the committed side is its PERSISTED
    fingerprint table — stored at commit time, history never rescanned,
    never decoded again — and the increment's bytes cross into Python
    once. Hash joins on (band, bucket) over 8-byte rows on both the
    committed probe (corpus-sized side, never broadcast) and the
    intra-increment self-join; undecodable rows pass through
    conservatively (they fail QC decode rules downstream). Fresh rows
    survive, committed copies drop, intra-increment groups keep their
    min-clip_id member."""
    from qcflow.pipeline import dedup_increment

    _materialize_inc()
    fix = spark.read.parquet(_INC_FIX)
    committed_fp = fix.filter(F.col("snapshot") == "A").select(
        "clip_id", F.col("committed_fp").alias("audio_fp")
    )
    new = fix.filter(F.col("snapshot") == "B").select(
        "clip_id", "bytes", "codec", "sr_hz"
    )
    return dedup_increment(new, committed_fp).select(
        "clip_id", F.col("cluster_size").cast("long").alias("cluster_size")
    )
