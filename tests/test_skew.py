"""Salted top-k: equality with the plain window plan on a skewed fixture,
and the reducer-load bound that is the point of the salt."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow.skew import topk_per_group, worst_clips_per_lang


@pytest.fixture(scope="module")
def skewed(spark):
    """200k rows, 70% on one key (the clip table's Zipf language shape),
    deterministic values via shared integer arithmetic."""
    df = spark.range(200_000).select(
        F.when(F.col("id") % 10 < 7, "eng")
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 10).cast("string")))
        .alias("lang"),
        F.col("id").alias("row_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(1_000_000_007)).cast("double"))
        .alias("perplexity"),
    )
    df = df.localCheckpoint(eager=True)
    return df


def test_salted_topk_equals_unsalted(spark, skewed):
    order = [F.col("perplexity").desc(), F.col("row_id")]
    plain = topk_per_group(skewed, ["lang"], order, 50).toPandas()
    salted = topk_per_group(skewed, ["lang"], order, 50, salt_by="row_id").toPandas()
    key = ["lang", "rank"]
    pd.testing.assert_frame_equal(
        plain.sort_values(key).reset_index(drop=True),
        salted.sort_values(key).reset_index(drop=True),
    )


def test_salt_bounds_reducer_load(spark, skewed):
    """The unsalted window sends every row of a group to ONE reducer: the
    hot group is 70% of the input. Salting by 16 caps any (group, salt)
    reducer at ~70%/16; the final pass sees only k * n_salt rows per
    group. These are the partition-size facts behind the task-time
    spread."""
    n = skewed.count()
    unsalted_max = (
        skewed.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
    )
    assert unsalted_max / n >= 0.65  # the fixture is genuinely skewed

    n_salt = 16
    salted_max = (
        skewed.withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(n_salt)))
        .groupBy("lang", "_salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert salted_max / n <= 0.7 / n_salt * 1.25  # spread within 25% of ideal
    # final-pass input is k * n_salt per group, independent of skew
    k = 50
    survivors = topk_per_group(
        skewed, ["lang"], [F.col("perplexity").desc(), F.col("row_id")], k,
        salt_by="row_id", n_salt=n_salt,
    )
    assert survivors.groupBy("lang").count().agg(F.max("count")).collect()[0][0] <= k


def test_worst_clips_per_lang_salted_equals_plain(spark, skewed):
    scored = skewed.withColumnRenamed("row_id", "clip_id")
    a = worst_clips_per_lang(scored, k=20, salted=True).toPandas()
    b = worst_clips_per_lang(scored, k=20, salted=False).toPandas()
    key = ["lang", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
