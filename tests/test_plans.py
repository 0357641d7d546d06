"""Physical-plan quality gates: the plan we want, not just the plan that
passes. Checks pushdown/pruning/broadcast/top-k properties that matter at
100 TB (SURVEY §4)."""

from __future__ import annotations

import contextlib
import io

from qcflow.parity.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(QUERIES["s2_scan_filter_pushdown"](spark, SF))
    assert "PushedFilters" in p
    assert "o_orderstatus" in p.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    p = plan_of(QUERIES["s1_scan_projection"](spark, SF))
    read = p.split("ReadSchema")[1][:300]
    assert "o_orderkey" in read and "o_custkey" not in read


def test_bytes_never_scanned_without_pcm(spark):
    """Binary-column discipline: the fat audio column must not reach the
    scan unless the PCM stage is on."""
    from qcflow.pipeline import score_clips

    clips = spark.read.parquet("/root/repo/.cache/clips_t2k/clips.parquet")
    res = score_clips(spark, clips, thresholds=_dummy_thr())
    p = plan_of(res.scored)
    read = [seg[:400] for seg in p.split("ReadSchema:")[1:]]
    assert read, "no scan found"
    for seg in read:
        assert "bytes" not in seg, f"bytes column reached the scan: {seg}"
    res.release()


def test_dimension_join_broadcasts(spark):
    p = plan_of(QUERIES["tpch_q3"](spark, SF))
    assert "BroadcastHashJoin" in p


def test_topk_is_take_ordered(spark):
    p = plan_of(QUERIES["o1_multisort_topk"](spark, SF))
    assert "TakeOrderedAndProject" in p


def test_q1_single_shuffle(spark):
    p = plan_of(QUERIES["tpch_q1"](spark, SF), "simple")
    assert p.count("Exchange") <= 2  # partial->final agg needs exactly one


def test_pairmatch_band_join_is_hash_not_nested_loop(spark):
    """The band predicate must ride the equi-join as a residual — a
    BroadcastNestedLoopJoin/CartesianProduct here would explode at scale."""
    p = plan_of(QUERIES["j2_pairmatch_band_join"](spark, SF))
    assert "NestedLoop" not in p and "Cartesian" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or ("BroadcastHashJoin" in p)


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join via bucketing: two tables bucketBy(8, clip_id) +
    sortBy join with NO Exchange in the plan — the big-join strategy when
    both sides are too large to broadcast and the join key is stable
    (clip_id everywhere in this engine). On a cluster this is the
    pre-bucketed Iceberg table layout."""
    from pyspark.sql import functions as F

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/bdemo'")
    a = spark.range(20000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("clip_id"),
        (F.col("id") % 7).alias("x"),
    )
    b = spark.range(20000).select(
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("clip_id"),
        (F.col("id") % 5).alias("y"),
    )
    for name, df in (("t1", a), ("t2", b)):
        df.write.bucketBy(8, "clip_id").sortBy("clip_id").mode(
            "overwrite"
        ).saveAsTable(f"bdemo.{name}")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("bdemo.t1").join(spark.table("bdemo.t2"), "clip_id")
        p = plan_of(j)
        assert "Exchange" not in p, f"bucketed join still shuffles:\n{p}"
        assert j.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdemo.t1")
        spark.sql("DROP TABLE IF EXISTS bdemo.t2")
        spark.sql("DROP DATABASE IF EXISTS bdemo")


def _dummy_thr():
    from qcflow.rules import Thresholds

    return Thresholds(repetition_lo=0.1, cps_lo=1.0, cps_hi=100.0, ppl_hi=100.0)
