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


def _dummy_thr():
    from qcflow.rules import Thresholds

    return Thresholds(repetition_lo=0.1, cps_lo=1.0, cps_hi=100.0, ppl_hi=100.0)
