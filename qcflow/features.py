"""Per-row features as pure Spark column expressions (no UDFs).

Mirrors the reference's derived-column stage (P2/P3/P7, Home.py:100-139)
re-targeted at transcripts: everything here compiles into one
whole-stage-codegen projection fused with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcflow.audio import KNOWN_CODECS, VALID_SR


def _tokens(col: str) -> Column:
    return F.filter(F.split(F.col(col), " "), lambda x: x != F.lit(""))


def clip_features(df: DataFrame) -> DataFrame:
    """n_chars, n_tokens, distinct_ratio (repetition), symbol_ratio,
    cps (chars per second of audio — the transcript/duration length ratio)."""
    toks = _tokens("transcript")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_chars = F.length(F.coalesce(F.col("transcript"), F.lit("")))
    n_sym = F.length(
        F.regexp_replace(F.coalesce(F.col("transcript"), F.lit("")), "[a-z .]", "")
    )
    return df.select(
        "*",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens)
        .otherwise(F.lit(None).cast("double"))
        .alias("distinct_ratio"),
        F.when(n_chars > 0, n_sym.cast("double") / n_chars)
        .otherwise(F.lit(None).cast("double"))
        .alias("symbol_ratio"),
        F.when(
            (F.col("dur_ms") > 0) & (n_chars > 0),
            n_chars.cast("double") / (F.col("dur_ms").cast("double") / 1000.0),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("cps"),
    )


def valid_sr_col() -> Column:
    return F.col("sr_hz").isin(*VALID_SR)


def known_codec_col() -> Column:
    return F.col("codec").isin(*KNOWN_CODECS)


def pcm_consistency(df: DataFrame, tol_ms: float = 5.0) -> DataFrame:
    """Decode-free PCM consistency: sample count from byte length (pcm16 =
    2 bytes/sample, ulaw = 1) vs the declared duration. Pure column
    expressions — the JVM only touches byte lengths, no Python crossing.
    Null (never flags, §1.2 NaN semantics) when codec/sr is itself invalid."""
    n_samples = F.when(F.col("codec") == "pcm16", F.length("bytes") / 2).when(
        F.col("codec") == "ulaw", F.length("bytes")
    )
    pcm_dur = F.when(
        valid_sr_col(), n_samples * 1000.0 / F.col("sr_hz").cast("double")
    )
    return df.select(
        "*",
        pcm_dur.alias("pcm_dur_ms"),
        (F.abs(pcm_dur - F.col("dur_ms").cast("double")) > tol_ms).alias(
            "pcm_inconsistent"
        ),
    )
