"""Parameterized summary kernels (A1-A9 as reusable helpers).

The reference repeats one breakdown kernel 14 times with different
dimensions (Home.py:456-904); here it is a single parameterized function,
plus the pivot / fixed-bin histogram / ECDF helpers the render pass uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def breakdown(
    outliers: DataFrame,
    alldata: DataFrame,
    dim: str | list[str],
    weight: str | None = None,
) -> DataFrame:
    """A4+J5+P9 kernel: outlier counts (and optional weighted sum) per
    dimension value, joined to all-data counts, with pct-of-total. Both
    inputs aggregate before the join, so the join is dimension-sized and
    broadcast."""
    dims = [dim] if isinstance(dim, str) else list(dim)
    aggs_out = [F.count("*").alias("count_out")]
    aggs_all = [F.count("*").alias("count_all")]
    if weight:
        aggs_out.append(F.sum(weight).alias(f"{weight}_out"))
        aggs_all.append(F.sum(weight).alias(f"{weight}_all"))
    out = outliers.groupBy(*dims).agg(*aggs_out)
    alln = alldata.groupBy(*dims).agg(*aggs_all)
    return out.join(F.broadcast(alln), dims).withColumn(
        "pct_out", F.lit(100.0) * F.col("count_out") / F.col("count_all")
    )


def fixed_bins(
    df: DataFrame, col: str, edges: list[float], labels: list[str] | None = None
) -> DataFrame:
    """A6: fixed-edge histogram with a numeric bin index for ordering."""
    assert labels is None or len(labels) == len(edges) + 1
    idx = F.lit(len(edges))
    for i in reversed(range(len(edges))):
        idx = F.when(F.col(col) < edges[i], i).otherwise(idx)
    out = df.select(idx.alias("bin_idx"))
    hist = out.groupBy("bin_idx").agg(F.count("*").alias("n"))
    if labels:
        lab = F.lit(labels[-1])
        for i in reversed(range(len(edges))):
            lab = F.when(F.col("bin_idx") == i, labels[i]).otherwise(lab)
        hist = hist.withColumn("bin_label", lab)
    return hist


def drop_reason_histogram(flagged: DataFrame, *dims: str) -> DataFrame:
    """Per-(dims, reason) drop counts — the engine's main metrics table."""
    return (
        flagged.filter(F.col("drop_reasons") != "")
        .select(*dims, F.explode(F.split("drop_reasons", ",")).alias("drop_reason"))
        .groupBy(*dims, "drop_reason")
        .agg(F.count("*").alias("n"))
    )


CONF_BINS = 20


def conf_bin_col(n_bins: int = CONF_BINS) -> Column:
    return F.least(
        F.floor(F.col("lang_conf") * n_bins).cast("int"), F.lit(n_bins - 1)
    )


def grains_frame(scored: DataFrame) -> DataFrame:
    """The single grouping-sets aggregate both metric grains derive
    from, WITHOUT materialization — callers either localCheckpoint it
    (``metrics_grains``, for further distributed work) or collect it
    (the resumable write path: the frame is dimension-sized, so one
    driver collect replaces a checkpoint job + a write job + a collect
    job). gid bit = 1 means NOT grouped in that set."""
    return (
        scored.select(
            "bucket",
            "lang",
            conf_bin_col().alias("conf_bin"),
            "drop_reasons",
            ppl_bin_col().alias("ppl_bin"),
            "keep",
        )
        .groupingSets(
            [
                ["bucket", "lang", "conf_bin", "drop_reasons"],
                ["bucket", "lang", "ppl_bin"],
            ],
            "bucket",
            "lang",
            "conf_bin",
            "drop_reasons",
            "ppl_bin",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.grouping_id().alias("_gid"),
        )
    )


def metrics_grains(scored: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Both metrics grains — the cube (bucket, lang, conf_bin,
    drop_reasons) and the perplexity sketch histogram (bucket, lang,
    ppl_bin) — from ONE grouping-sets aggregation, so the scored frame
    is scanned and shuffled once for metrics instead of once per grain
    (at 10^12 rows the second full pass is the cost that matters;
    measured ~1.1 s of the bench write path at sf0.1).

    Returns (cube, ppl_hist) as two filters over a single
    localCheckpoint'ed frame; the grouping-set id (bit per grouping
    column, 1 = NOT grouped in this set) picks the grain."""
    g = grains_frame(scored).localCheckpoint(eager=True)
    cube = g.filter(F.col("_gid") == 1).select(  # ppl_bin bit only
        "bucket", "lang", "conf_bin", "drop_reasons", "n", "n_kept"
    )
    ppl_hist = g.filter(F.col("_gid") == 6).select(  # conf_bin+drop_reasons bits
        "bucket", "lang", "ppl_bin", "n"
    )
    return cube, ppl_hist


def cube_drop_reasons(cube: DataFrame, *dims: str) -> DataFrame:
    """(dims, drop_reason, n) from the cube: explode runs on the
    aggregated frame, not the raw rows."""
    return (
        cube.filter(F.col("drop_reasons") != "")
        .select(*dims, F.explode(F.split("drop_reasons", ",")).alias("drop_reason"), "n")
        .groupBy(*dims, "drop_reason")
        .agg(F.sum("n").alias("n"))
    )


def cube_conf_histogram(cube: DataFrame, *extra_dims: str) -> DataFrame:
    return (
        cube.groupBy(*extra_dims, "lang", "conf_bin")
        .agg(F.sum("n").alias("n"))
    )


def metrics_partials(cube: DataFrame, ppl_hist: DataFrame) -> DataFrame:
    """All three metric partial grains — drop-reason counts, langid
    confidence histogram, perplexity sketch histogram — as ONE long-form
    frame (kind, bucket, lang, drop_reason, bin, n), so a write attempt
    lands one parquet append instead of three serial dimension-sized
    jobs (the r4 resumable-increment fixed-cost fix: each tiny write
    paid full job+commit overhead). Readers filter on ``kind`` and
    re-alias (checkpoint.read_metrics)."""
    nul_s = F.lit(None).cast("string").alias("drop_reason")
    dr = cube_drop_reasons(cube, "bucket", "lang").select(
        F.lit("drop_reasons").alias("kind"),
        "bucket",
        "lang",
        "drop_reason",
        F.lit(None).cast("int").alias("bin"),
        "n",
    )
    cf = cube_conf_histogram(cube, "bucket").select(
        F.lit("lang_conf").alias("kind"),
        "bucket",
        "lang",
        nul_s,
        F.col("conf_bin").alias("bin"),
        "n",
    )
    pp = ppl_hist.select(
        F.lit("ppl_hist").alias("kind"),
        "bucket",
        "lang",
        nul_s,
        F.col("ppl_bin").alias("bin"),
        "n",
    )
    return dr.unionByName(cf).unionByName(pp)


def cube_lineage(cube: DataFrame) -> DataFrame:
    """Per-bucket lineage row (resume manifest) from the cube."""
    return cube.groupBy("bucket").agg(
        F.sum("n").alias("n_input"),
        F.sum("n_kept").alias("n_kept"),
        (F.sum("n") - F.sum("n_kept")).alias("n_dropped"),
    )


PPL_BINS_PER_OCTAVE = 8  # log2-scale bins: relative error <= 2^(1/8)-1 ~ 9%


def ppl_bin_col(col: str = "perplexity") -> Column:
    """Log-scale perplexity bin — the mergeable-sketch key for quantile
    partials. Fixed edges make per-(snapshot, bucket) histograms
    sum-combinable by construction; NULL perplexity maps to bin NULL and
    is excluded from quantile mass (the explicit isNotNull guard matters:
    ``greatest`` SKIPS nulls, so without it a NULL would silently land in
    the 1e-9 floor bin and drag quantiles toward zero)."""
    return F.when(
        F.col(col).isNotNull(),
        F.floor(
            F.log2(F.greatest(F.col(col), F.lit(1e-9))) * PPL_BINS_PER_OCTAVE
        ).cast("int"),
    )


def ppl_bin_upper(bin_col: Column) -> Column:
    """Upper edge of a log-scale perplexity bin (the quantile estimate)."""
    return F.pow(F.lit(2.0), (bin_col + 1).cast("double") / PPL_BINS_PER_OCTAVE)


def hist_quantiles(
    hist: DataFrame,
    dims: list[str],
    pcts: list[int],
    bin_col: str = "bin",
    n_col: str = "n",
) -> DataFrame:
    """Quantile extraction from merged fixed-edge histogram partials:
    per ``dims`` group, the smallest bin whose cumulative count reaches
    ceil(pct * total / 100) — integer target arithmetic so both engines
    agree exactly. Output columns ``p{pct}_bin``.

    This is the production-safe shape for per-group percentiles at scale
    (BENCH/BASELINE.md skew lesson, 5.6x): the raw-row aggregation is a
    map-side-combinable histogram count, and the ordering window runs on
    the AGGREGATED frame (bins-per-group rows, bounded), never buffering
    a hot group's raw values on one reducer the way exact per-group
    percentile does."""
    w_cum = Window.partitionBy(*dims).orderBy(bin_col)
    w_all = Window.partitionBy(*dims)
    rows = hist.filter(F.col(bin_col).isNotNull()).select(
        *dims,
        bin_col,
        F.sum(n_col).over(w_cum).alias("_cum"),
        F.sum(n_col).over(w_all).alias("_total"),
    )
    aggs = []
    for p in pcts:
        target = F.floor((F.col("_total") * p + 99) / 100)  # ceil(total*p/100)
        aggs.append(
            F.min(F.when(F.col("_cum") >= target, F.col(bin_col))).alias(
                f"p{p}_bin"
            )
        )
    return rows.groupBy(*dims).agg(*aggs)


def quantile_metrics(ppl_hist: DataFrame, conf_hist: DataFrame) -> DataFrame:
    """Per-lang p50/p99 of perplexity (log-edge bins -> upper-edge value)
    and langid confidence (CONF_BINS fixed bins) from merged histogram
    frames (lang, ppl_bin|conf_bin, n). Shared by the incremental reader
    (checkpoint.read_quantile_metrics) and the one-shot writer."""
    ppl = hist_quantiles(ppl_hist, ["lang"], [50, 99], bin_col="ppl_bin").select(
        "lang",
        ppl_bin_upper(F.col("p50_bin")).alias("ppl_p50"),
        ppl_bin_upper(F.col("p99_bin")).alias("ppl_p99"),
    )
    conf = hist_quantiles(conf_hist, ["lang"], [50, 99], bin_col="conf_bin").select(
        "lang",
        ((F.col("p50_bin") + 1) / CONF_BINS).alias("conf_p50"),
        ((F.col("p99_bin") + 1) / CONF_BINS).alias("conf_p99"),
    )
    return ppl.join(conf, "lang", "full")


def conf_histogram(scored: DataFrame, *extra_dims: str, n_bins: int = 20) -> DataFrame:
    """Langid-confidence distribution: fixed [0,1] bins. ``extra_dims``
    (e.g. bucket) key mergeable partials — fixed edges make per-partition
    histograms sum-combinable by construction."""
    return (
        scored.select(*extra_dims, "lang", conf_bin_col(n_bins).alias("conf_bin"))
        .groupBy(*extra_dims, "lang", "conf_bin")
        .agg(F.count("*").alias("n"))
    )
