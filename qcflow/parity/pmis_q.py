"""PMIS pipeline registry entry with a full DuckDB oracle.

The F2 sections fixture (two rating cycles, deterministic seed) is
materialized ONCE to parquet under .cache/pmis_f2/ at import time (pure
pandas, no Spark) — both the Spark query and the DuckDB oracle read the
same files, so the driver's hash gate covers the whole reference
lifecycle: band pair-match (H:128-139) -> audit_percentile thresholds
(H:356) -> rule flags (H:161-184) -> county breakdown (H:445-904).
Exact-pandas parity is additionally enforced in tests/test_pmis.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow import pmis
from qcflow.parity.registry import query

_F2_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "pmis_f2",
)


def _materialize_f2() -> None:
    """Write the deterministic F2 fixture if absent (pandas -> parquet;
    NaN measures land as parquet nulls, so both engines see NULL and the
    null-skipping percentile / never-flag semantics line up)."""
    a_path = os.path.join(_F2_DIR, "cycle_a.parquet")
    b_path = os.path.join(_F2_DIR, "cycle_b.parquet")
    if os.path.exists(a_path) and os.path.exists(b_path):
        return
    os.makedirs(_F2_DIR, exist_ok=True)
    a, b = pmis.synth_sections(500)
    # microsecond timestamps: Spark's reader rejects TIMESTAMP(NANOS)
    kw = dict(index=False, coerce_timestamps="us", allow_truncated_timestamps=True)
    a.to_parquet(a_path, **kw)
    b.to_parquet(b_path, **kw)


_materialize_f2()

_A = os.path.join(_F2_DIR, "cycle_a.parquet")
_B = os.path.join(_F2_DIR, "cycle_b.parquet")

_ORACLE = f"""
WITH matched AS (
  SELECT a.county,
         abs(a.end_dfo - a.begin_dfo) AS section_length,
         b.m1 - a.m1 AS diff_m1,
         b.m2 - a.m2 AS diff_m2,
         b.m3 - a.m3 AS diff_m3
  FROM '{_A}' a JOIN '{_B}' b
    ON a.hwy_id = b.hwy_id AND a.county = b.county
   AND abs(a.begin_dfo - b.begin_dfo) < {pmis.BAND_TOL}
   AND abs(a.end_dfo - b.end_dfo) < {pmis.BAND_TOL}
),
thr AS (
  SELECT quantile_cont(abs(diff_m1), 0.95) AS hi_m1,
         quantile_cont(abs(diff_m2), 0.95) AS hi_m2,
         quantile_cont(abs(diff_m3), 0.95) AS hi_m3
  FROM matched
),
flagged AS (
  SELECT m.*,
         CASE WHEN coalesce(abs(diff_m1) >= hi_m1, false)
                OR coalesce(abs(diff_m2) >= hi_m2, false)
                OR coalesce(abs(diff_m3) >= hi_m3, false)
              THEN 1 ELSE 0 END AS flag
  FROM matched m CROSS JOIN thr
),
outl AS (SELECT county, CAST(COUNT(*) AS BIGINT) AS count_out
         FROM flagged WHERE flag = 1 GROUP BY county),
alln AS (SELECT county, CAST(COUNT(*) AS BIGINT) AS count_all
         FROM flagged GROUP BY county)
SELECT o.county, count_out, count_all,
       ROUND(100.0 * count_out / count_all, 6) AS pct_out
FROM outl o JOIN alln a ON o.county = a.county
"""


@query("pmis_qc_pipeline", oracle=_ORACLE)
def pmis_qc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full reference lifecycle on the parquet-backed F2 fixture:
    pair-match band join -> audit_percentile thresholds -> flag ->
    county breakdown."""
    _materialize_f2()
    a = spark.read.parquet(_A)
    b = spark.read.parquet(_B)
    matched = pmis.pair_match(a, b)
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
