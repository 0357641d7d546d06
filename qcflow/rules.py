"""Threshold derivation (A8) + the keep/drop rule engine (P5).

Reimplements the reference's two-stage semantics from scratch
(Home.py:337-365 percentile thresholds -> Home.py:161-184 flag engine):
thresholds are derived ONCE globally from the batch (exact percentile in
correctness mode, approx sketch in throughput mode — Home.py:340 computes
them globally, so must we), then evaluated as pure column expressions.

Null semantics trap (SURVEY §1.2): pandas NaN comparisons are False, so a
NaN feature never flags. Every rule here is wrapped so NULL -> not flagged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcflow.features import known_codec_col, valid_sr_col

DUR_MIN_MS = 300
DUR_MAX_MS = 30000
SYMBOL_MAX = 0.08
LANG_CONF_MIN = 0.5

# Percentile probabilities for derived thresholds.
P_REPETITION = 0.02  # distinct_ratio below this pct -> high_repetition
P_CPS = (0.02, 0.98)  # chars/sec outside this band -> length_mismatch
P_PPL = 0.98  # perplexity above this pct -> high_perplexity


@dataclass(frozen=True)
class Thresholds:
    repetition_lo: float
    cps_lo: float
    cps_hi: float
    ppl_hi: float


def derive_thresholds(feats: DataFrame, exact: bool = True) -> Thresholds:
    """One pass over the scored feature frame -> 4 scalars. Exact
    `percentile` for label parity; `approx_percentile` (epsilon sketch,
    single pass, mergeable across partitions) at bench scale."""
    # ONE percentile buffer per column: cps needs two thresholds, and the
    # exact Percentile buffer holds every value — the array form builds
    # (and sorts) the cps buffer once and reads it at both points with
    # bit-identical interpolation. Same for the approx sketch: one
    # QuantileSummaries per column, queried at each p (query results are
    # independent of how many points are read).
    if exact:
        q = lambda c, p: F.percentile(F.col(c), p)  # noqa: E731
    else:
        q = lambda c, p: F.approx_percentile(F.col(c), p, F.lit(10000))  # noqa: E731
    row = feats.agg(
        q("distinct_ratio", F.lit(P_REPETITION)).alias("repetition_lo"),
        q("cps", F.array(F.lit(P_CPS[0]), F.lit(P_CPS[1]))).alias("_cps"),
        q("perplexity", F.lit(P_PPL)).alias("ppl_hi"),
    ).collect()[0]
    row = {
        "repetition_lo": row["repetition_lo"],
        "cps_lo": None if row["_cps"] is None else row["_cps"][0],
        "cps_hi": None if row["_cps"] is None else row["_cps"][1],
        "ppl_hi": row["ppl_hi"],
    }
    if any(row[k] is None for k in ("repetition_lo", "cps_lo", "cps_hi", "ppl_hi")):
        raise ValueError(
            "cannot derive thresholds: input is empty or every feature is "
            "null — pass explicit Thresholds (score_clips(thresholds=...)) "
            "or a calibration batch"
        )
    return Thresholds(
        repetition_lo=float(row["repetition_lo"]),
        cps_lo=float(row["cps_lo"]),
        cps_hi=float(row["cps_hi"]),
        ppl_hi=float(row["ppl_hi"]),
    )


def _flag(cond: Column) -> Column:
    """NULL-safe: NaN/NULL never flags (reference semantics, H:178/H:181)."""
    return F.coalesce(cond, F.lit(False))


def rule_conditions(thr: Thresholds) -> list[tuple[str, Column]]:
    """Ordered rule set; the order fixes the drop_reasons string layout."""
    return [
        ("invalid_sr", ~valid_sr_col()),
        (
            "bad_duration",
            (F.col("dur_ms") < DUR_MIN_MS) | (F.col("dur_ms") > DUR_MAX_MS),
        ),
        ("unknown_codec", ~known_codec_col()),
        (
            "empty_transcript",
            F.col("transcript").isNull() | (F.length("transcript") == 0),
        ),
        ("high_repetition", F.col("distinct_ratio") < thr.repetition_lo),
        ("symbol_dense", F.col("symbol_ratio") > SYMBOL_MAX),
        (
            "length_mismatch",
            (F.col("cps") < thr.cps_lo) | (F.col("cps") > thr.cps_hi),
        ),
        ("low_lang_conf", F.col("lang_conf") < LANG_CONF_MIN),
        ("high_perplexity", F.col("perplexity") > thr.ppl_hi),
    ]


# Acoustic rule thresholds (features from qcflow.udfs.with_audio_features).
# Margins are wide on both sides: healthy speech-band synth sits at
# clip_ratio ~ 0, silence_ratio ~ 0, |dc| < 0.01, while the defect regimes
# (hard clipping, dead air, converter bias) land at 0.05+/0.5+/0.1+.
CLIP_RATIO_MAX = 0.02
SILENCE_RATIO_MAX = 0.5
DC_OFFSET_MAX = 0.1
# spectral flatness: tonal content (speech/music) <= ~0.01, a tone in
# heavy noise ~0.5, white noise (dead mic / broken preamp) ~0.9
NOISY_FLATNESS_MAX = 0.5


def acoustic_rule_conditions() -> list[tuple[str, Column]]:
    """Drop rules over the decoded-PCM features; NULL features (no bytes /
    unknown codec / sub-frame clips) never flag, same as every other rule."""
    return [
        ("clipped_audio", F.col("clip_ratio") > CLIP_RATIO_MAX),
        ("silent_audio", F.col("silence_ratio") > SILENCE_RATIO_MAX),
        ("dc_offset", F.abs(F.col("dc_offset")) > DC_OFFSET_MAX),
        ("noisy_audio", F.col("spectral_flatness") > NOISY_FLATNESS_MAX),
    ]


def apply_rules(
    feats: DataFrame, thr: Thresholds, extra_rules: list[tuple[str, Column]] | None = None
) -> DataFrame:
    """Evaluate every rule -> drop_reasons csv (fixed order) + keep flag.
    One codegen'd projection; concat_ws skips non-fired (NULL) reasons."""
    rules = rule_conditions(thr) + list(extra_rules or [])
    reasons = F.concat_ws(
        ",", *[F.when(_flag(cond), F.lit(name)) for name, cond in rules]
    )
    return feats.select("*", reasons.alias("drop_reasons")).withColumn(
        "keep", F.col("drop_reasons") == ""
    )
