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


def align_transcript_segments(df: DataFrame, win_ms: int = 400) -> DataFrame:
    """Uniform-rate transcript alignment onto fixed-window segments: word
    k of n (midpoint at (k+0.5)/n of the clip) is assigned to the segment
    covering that instant, giving every training segment produced by
    ``udfs.segment_clips`` a label WITHOUT decoding — sample counts come
    from byte length (pcm16 = 2 B/sample, ulaw = 1), so the whole
    alignment is pure integer column arithmetic fused into the scan
    (no UDF, no shuffle until the per-segment regroup). The segment
    count replicates ``audio.segment_bounds``'s tail rule
    (partial kept iff >= ceil(win/2) samples); word midpoints use
    the exact integer form ((2k+1)*n_samples) div (2*n_words) div win
    so any engine computing it agrees bit-for-bit. Clips with zero
    segments or empty transcripts yield no rows.

    Output: one row per (clip_id, seg_idx) holding that segment's word
    count and space-joined text, word order preserved."""
    n_samples = F.when(F.col("codec") == "pcm16", F.length("bytes") / 2).when(
        F.col("codec") == "ulaw", F.length("bytes")
    ).cast("long")
    # MUST mirror segment_clips' row guard: invalid/NULL sr falls back to
    # 8000 so both stages put the same clip on the same window grid (and
    # a 0/NULL sr cannot ANSI-throw DIVIDE_BY_ZERO below — hit by the
    # synth table's bad-sr defect rows through the CLI segment stage)
    sr_eff = F.when(valid_sr_col(), F.col("sr_hz").cast("long")).otherwise(
        F.lit(8000)
    )
    # bround = round-half-even, the SAME rounding udfs.segment_clips'
    # int(round(...)) applies — float truncation diverged from the actual
    # segment grid for non-default win_ms with a .5+ fraction (e.g.
    # sr=22050, win_ms=30: 661.5 -> 661 vs 662), silently mislabeling
    # segments through the CLI's --win-ms (advisor r5 finding). All
    # VALID_SR x 400 ms grids are exact integers, so default-path output
    # is unchanged. greatest(1, ...) mirrors segment_clips' max(1, ...)
    # clamp — a degenerate --win-ms that rounds to 0 must land on the
    # same 1-sample grid there AND here, not DIVIDE_BY_ZERO below.
    win_n = F.greatest(
        F.lit(1).cast("long"), F.bround(sr_eff * win_ms / 1000.0).cast("long")
    )
    n_full = (F.col("n_samples") / F.col("win_n")).cast("long")
    rem = F.col("n_samples") - n_full * F.col("win_n")
    min_keep = F.greatest(F.lit(1), F.ceil(F.col("win_n") / 2.0).cast("long"))
    n_segs = n_full + F.when(rem >= min_keep, 1).otherwise(0)
    toks = F.filter(F.split(F.col("transcript"), " "), lambda x: x != F.lit(""))
    base = (
        df.select(
            "clip_id",
            n_samples.alias("n_samples"),
            win_n.alias("win_n"),
            toks.alias("toks"),
        )
        .withColumn("n_segs", n_segs)
        .filter(
            F.col("n_samples").isNotNull()
            & (F.col("n_segs") > 0)
            & (F.size("toks") > 0)
        )
    )
    words = base.select(
        "clip_id",
        "n_samples",
        "win_n",
        "n_segs",
        F.size("toks").alias("n_words"),
        F.posexplode("toks").alias("pos", "word"),
    )
    # integer `div` keeps the midpoint arithmetic exact for any clip
    # length (values stay far below 2^53 anyway, but div avoids relying
    # on float rounding entirely)
    seg = F.least(
        F.expr(
            "((2 * pos + 1) * n_samples) div (2 * n_words) div win_n"
        ).cast("long"),
        F.col("n_segs") - 1,
    )
    return (
        words.select("clip_id", seg.alias("seg_idx"), "pos", "word")
        .groupBy("clip_id", "seg_idx")
        .agg(
            F.count("*").alias("n_words_seg"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s.word,
                ),
                " ",
            ).alias("seg_text"),
        )
    )
