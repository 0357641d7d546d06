"""PMIS pipeline registry entry (rows-only: runs on the deterministic F2
sections fixture, not the driver tables; exact parity vs the pandas twin
is enforced in tests/test_pmis.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow import pmis
from qcflow.parity.registry import query


@query("pmis_qc_pipeline")
def pmis_qc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference lifecycle on the F2 fixture: pair-match band join ->
    audit_percentile thresholds -> flag -> county breakdown."""
    a, b = pmis.synth_sections(500)
    matched = pmis.pair_match(spark.createDataFrame(a), spark.createDataFrame(b))
    # tiny fixture: recomputing the join beats holding a cache the caller
    # cannot release (the returned plan is collected after we return)
    thr = pmis.derive_pmis_thresholds(matched, "audit_percentile")
    flagged = pmis.flag_outliers(matched, thr, "audit")
    out = pmis.outlier_breakdowns(flagged, dims=["county"])["county"]
    return out.select(
        "county",
        "count_out",
        "count_all",
        F.round("pct_out", 6).alias("pct_out"),
    )
