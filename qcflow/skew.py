"""Skew-resistant per-group operators.

Spark's partial aggregation already flattens skew for algebraic
aggregates (sum/count/min/max combine map-side), and AQE splits skewed
JOIN partitions at runtime. The case neither covers is the per-group
HOLISTIC operator — top-k / rank / quantile per group via a window —
where `Window.partitionBy(hot_key)` serializes the hot group into ONE
task: with the clip table's ~70% Zipf language bucket, one reducer sorts
70% of the corpus while 31 cores idle.

``topk_per_group`` is the salted two-phase rewrite: a partial top-k per
(group, salt) spreads the hot group over ``n_salt`` reducers, then the
final top-k runs on the k * n_salt survivors per group (tiny). Top-k is
salt-decomposable — the global top-k is a subset of the union of
per-salt top-ks — so the rewrite is semantically invisible; the ordering
must be a TOTAL order (include a unique tiebreaker) or ranks at equal
keys are nondeterministic in any distributed plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group: list[str],
    order: list[Column],
    k: int,
    salt_by: str | None = None,
    n_salt: int = 16,
) -> DataFrame:
    """Top-k rows per group by ``order`` (must totally order rows).

    salt_by=None runs the plain single-window plan (one task per group —
    correct, but the hot group's sort is serialized). With ``salt_by``
    (any unique column), a partial top-k per (group, pmod(xxhash64(salt),
    n_salt)) bounds every reducer's input to ~group_size/n_salt rows
    before the final k * n_salt-row per-group pass."""
    w_final = Window.partitionBy(*group).orderBy(*order)
    if salt_by is None:
        return (
            df.withColumn("rank", F.row_number().over(w_final))
            .filter(F.col("rank") <= k)
        )
    salt = F.pmod(F.xxhash64(salt_by), F.lit(n_salt)).cast("int")
    w_partial = Window.partitionBy(*group, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_prank", F.row_number().over(w_partial))
        .filter(F.col("_prank") <= k)
        .drop("_salt", "_prank")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
    )


def worst_clips_per_lang(scored: DataFrame, k: int = 50, salted: bool = True) -> DataFrame:
    """Pipeline use of the pattern: the k highest-perplexity clips per
    language (the manual-review sample an LLM-data QC stage exports).
    The language key is the Zipf-skewed column, so the salted path is the
    default."""
    return topk_per_group(
        scored,
        ["lang"],
        [F.col("perplexity").desc(), F.col("clip_id")],
        k,
        salt_by="clip_id" if salted else None,
    ).select("lang", "clip_id", "perplexity", "rank")
