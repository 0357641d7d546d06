"""Parameterized summary kernels (A1-A9 as reusable helpers).

The reference repeats one breakdown kernel 14 times with different
dimensions (Home.py:456-904); here it is a single parameterized function,
plus the pivot / fixed-bin histogram / ECDF helpers the render pass uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def metrics_cube(scored: DataFrame) -> DataFrame:
    """ONE full-data aggregate at the finest metrics grain — every
    metrics/lineage table derives from this cube with dimension-sized
    re-aggregations, so a 10^12-row scored frame is shuffled once for
    metrics instead of once per table. Cardinality is bounded:
    buckets x langs x conf bins x observed rule-combination strings."""
    return scored.groupBy(
        "bucket", "lang", conf_bin_col().alias("conf_bin"), "drop_reasons"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
    )


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


def cube_lineage(cube: DataFrame) -> DataFrame:
    """Per-bucket lineage row (resume manifest) from the cube."""
    return cube.groupBy("bucket").agg(
        F.sum("n").alias("n_input"),
        F.sum("n_kept").alias("n_kept"),
        (F.sum("n") - F.sum("n_kept")).alias("n_dropped"),
    )


def conf_histogram(scored: DataFrame, *extra_dims: str, n_bins: int = 20) -> DataFrame:
    """Langid-confidence distribution: fixed [0,1] bins. ``extra_dims``
    (e.g. bucket) key mergeable partials — fixed edges make per-partition
    histograms sum-combinable by construction."""
    return (
        scored.select(*extra_dims, "lang", conf_bin_col(n_bins).alias("conf_bin"))
        .groupBy(*extra_dims, "lang", "conf_bin")
        .agg(F.count("*").alias("n"))
    )
