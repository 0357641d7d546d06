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
