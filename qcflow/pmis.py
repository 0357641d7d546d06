"""PMIS-shaped QC: the reference's exact comparison semantics, generalized.

This is the reference app's own domain (two rating cycles of highway
sections; Home.py) re-expressed Spark-first, kept alongside the clip
pipeline as the direct parity surface:

- pair_match      = county semi-filter (H:124) + equi-join on section key
                    with the DFO band predicate IN the join condition
                    (H:128-132) + per-measure diff columns (H:138-139)
- thresholds      = all FOUR derivation variants (H:337-365)
- flag_outliers   = the rule engine (H:161-184) incl. NaN-never-flags
- summaries       = county means per cycle (H:215-222), traffic pivot
                    (H:233-252), parameterized outlier breakdowns
                    (H:445-904 via qcflow.summary.breakdown)

The pandas twin in tests/test_pmis.py re-implements the same semantics in
the reference's eager idiom and must agree exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEASURES = ("m1", "m2", "m3")
BAND_TOL = 0.05


# ------------------------------------------------------------ F2 fixture

def synth_sections(n: int = 500, seed: int = 77) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Two cycles of the same sections (FIXTURES.md F2): cycle_b jitters the
    DFO endpoints by ±[0, 0.1] so about half the pairs fall outside the
    0.05 band; ~5% NaN measures; planted exact-boundary rows."""
    rng = np.random.default_rng(seed)
    hwy = [f"IH{rng.integers(10, 99)}-{i % 40}" for i in range(n)]
    county = [f"C{int(rng.integers(0, 12)):02d}" for _ in range(n)]
    begin = np.round(rng.uniform(0, 100, n), 3)
    length = np.round(rng.uniform(0.4, 2.0, n), 3)

    def cycle(year: int, jitter: bool) -> pd.DataFrame:
        jb = rng.uniform(-0.1, 0.1, n) if jitter else np.zeros(n)
        je = rng.uniform(-0.1, 0.1, n) if jitter else np.zeros(n)
        df = pd.DataFrame(
            {
                "hwy_id": hwy,
                "county": county,
                "begin_dfo": np.round(begin + jb, 4),
                "end_dfo": np.round(begin + length + je, 4),
                "fiscal_year": year,
                "start_time": pd.Timestamp(f"{year}-03-01")
                + pd.to_timedelta(rng.integers(0, 200 * 24, n), unit="h"),
                "pav_type": rng.choice(["ACP", "CRCP", "JCP"], n),
                "lane_number": rng.integers(1, 4, n),
                "direction": rng.choice(["N", "S", "E", "W"], n),
                "vehicle_id": rng.integers(100, 105, n),
                "traffic_level": rng.choice(["LOW", "MEDIUM", "HIGH"], n),
                "avg_speed": np.round(rng.uniform(30, 75, n), 1),
            }
        )
        for m in MEASURES:
            vals = np.round(rng.normal(100, 25, n), 2)
            vals[rng.random(n) < 0.05] = np.nan
            df[m] = vals
        return df

    a, b = cycle(2023, False), cycle(2024, True)
    # planted edges: one pair at EXACTLY the 0.05 boundary (must NOT match,
    # comparison is strict <), one just inside
    b.loc[0, ["begin_dfo", "end_dfo"]] = [a.loc[0, "begin_dfo"] + BAND_TOL, a.loc[0, "end_dfo"]]
    b.loc[1, ["begin_dfo", "end_dfo"]] = [a.loc[1, "begin_dfo"] + BAND_TOL - 0.001, a.loc[1, "end_dfo"]]
    # planted NaN pair (never flags)
    a.loc[2, list(MEASURES)] = [np.nan, np.nan, np.nan]
    return a, b


# ------------------------------------------------------------- operators

def pair_match(df_a: DataFrame, df_b: DataFrame) -> DataFrame:
    """J1+J2+J3+P3: semi-filter, band equi-join, diff columns. One join,
    one shuffle; all columns carried (the reference's key-only join + two
    back-joins, H:128-136, is three shuffles for the same result)."""
    counties = df_b.select("county").distinct()
    a = df_a.join(counties, "county", "left_semi").alias("a")
    b = df_b.alias("b")
    cond = (
        (F.col("a.hwy_id") == F.col("b.hwy_id"))
        & (F.col("a.county") == F.col("b.county"))
        & (F.abs(F.col("a.begin_dfo") - F.col("b.begin_dfo")) < BAND_TOL)
        & (F.abs(F.col("a.end_dfo") - F.col("b.end_dfo")) < BAND_TOL)
    )
    sel = [F.col("a.hwy_id").alias("hwy_id"), F.col("a.county").alias("county")]
    for side in ("a", "b"):
        for c in [
            "begin_dfo",
            "end_dfo",
            "fiscal_year",
            "start_time",
            "pav_type",
            "lane_number",
            "direction",
            "vehicle_id",
            "traffic_level",
            "avg_speed",
            *MEASURES,
        ]:
            sel.append(F.col(f"{side}.{c}").alias(f"{c}_{side}"))
    out = a.join(b, cond, "inner").select(*sel)
    out = out.withColumn(
        "section_length", F.abs(F.col("end_dfo_a") - F.col("begin_dfo_a"))
    ).withColumn("time_gap_days", F.datediff("start_time_b", "start_time_a"))
    for m in MEASURES:
        out = out.withColumn(f"diff_{m}", F.col(f"{m}_b") - F.col(f"{m}_a"))
    return out


@dataclass(frozen=True)
class PmisThresholds:
    # per measure: (lower, upper); lower is None for audit styles
    bounds: dict


def derive_pmis_thresholds(
    matched: DataFrame, style: str, measures: tuple[str, ...] = MEASURES
) -> PmisThresholds:
    """The four H:337-365 variants, one aggregate pass for all measures:

    - yby_percentile : (P2.5, P97.5) of diff            (H:340)
    - yby_fence      : Q1-1.5*IQR, Q3+1.5*IQR of diff   (H:346-347)
    - audit_percentile: P95 of |diff|, upper only       (H:356)
    - audit_fence    : Q3+1.5*IQR of |diff|, upper only (H:362-363)

    All null-skipping (np.nanpercentile twin). Computed ONCE globally."""
    aggs = []
    for m in measures:
        d = F.col(f"diff_{m}")
        ad = F.abs(d)
        if style == "yby_percentile":
            aggs += [
                F.percentile(d, F.lit(0.025)).alias(f"lo_{m}"),
                F.percentile(d, F.lit(0.975)).alias(f"hi_{m}"),
            ]
        elif style == "yby_fence":
            iqr = F.percentile(d, F.lit(0.75)) - F.percentile(d, F.lit(0.25))
            aggs += [
                (F.percentile(d, F.lit(0.25)) - 1.5 * iqr).alias(f"lo_{m}"),
                (F.percentile(d, F.lit(0.75)) + 1.5 * iqr).alias(f"hi_{m}"),
            ]
        elif style == "audit_percentile":
            aggs.append(F.percentile(ad, F.lit(0.95)).alias(f"hi_{m}"))
        elif style == "audit_fence":
            iqr = F.percentile(ad, F.lit(0.75)) - F.percentile(ad, F.lit(0.25))
            aggs.append((F.percentile(ad, F.lit(0.75)) + 1.5 * iqr).alias(f"hi_{m}"))
        else:
            raise ValueError(style)
    row = matched.agg(*aggs).collect()[0]
    bounds = {}
    for m in measures:
        lo = row[f"lo_{m}"] if style.startswith("yby") else None
        bounds[m] = (lo, row[f"hi_{m}"])
    return PmisThresholds(bounds=bounds)


def flag_outliers(
    matched: DataFrame, thr: PmisThresholds, qctype: str
) -> DataFrame:
    """P5 (H:161-184): audit flags |diff| >= upper; year-by-year flags
    diff >= upper OR diff <= lower. NaN diffs never flag (H:178, H:181
    semantics). Returns the full frame + flag + fired-measures csv."""
    fired = []
    for m, (lo, hi) in thr.bounds.items():
        d = F.col(f"diff_{m}")
        if qctype == "audit":
            cond = F.abs(d) >= F.lit(hi)
        else:
            cond = (d >= F.lit(hi)) | (d <= F.lit(lo))
        fired.append((m, F.coalesce(cond, F.lit(False))))
    any_fired = None
    for _, c in fired:
        any_fired = c if any_fired is None else (any_fired | c)
    reasons = F.concat_ws(",", *[F.when(c, F.lit(m)) for m, c in fired])
    return matched.withColumn("flag", F.when(any_fired, 1).otherwise(0)).withColumn(
        "flagged_measures", reasons
    )


def county_summary(matched: DataFrame) -> DataFrame:
    """A1+U1 (H:215-222): per-county measure means for each cycle, unioned
    with a cycle label."""
    outs = []
    for side in ("a", "b"):
        outs.append(
            matched.groupBy("county")
            .agg(*[F.avg(f"{m}_{side}").alias(f"mean_{m}") for m in MEASURES])
            .withColumn("cycle", F.lit(side))
        )
    return outs[0].unionByName(outs[1])


def traffic_pivot(matched: DataFrame) -> DataFrame:
    """A5 (H:233-252): section-miles by county x traffic level (cycle a),
    explicit pivot values."""
    return (
        matched.groupBy("county")
        .pivot("traffic_level_a", ["LOW", "MEDIUM", "HIGH"])
        .sum("section_length")
    )


# pd.cut twins of the reference's fixed bin tables (H:623-624): right-
# closed intervals (lo, hi], out-of-range -> NULL, with a numeric bin
# index carried for ordering (SURVEY §1.2: categorical order is an
# explicit sort-key column in Spark).
SPEED_AVG_EDGES = [0, 10, 20, 30, 40, 50, 60, 70, 80, 90]
SPEED_AVG_LABELS = [f"{e}-{e + 10}" for e in SPEED_AVG_EDGES[:-1]]
_INF = float("inf")
SPEED_DIFF_EDGES = [-_INF, -40, -30, -20, -10, 0, 10, 20, 30, 40, _INF]
SPEED_DIFF_LABELS = [
    "<-40", "-40-30", "-30-20", "-20-10", "-10-0",
    "0-10", "10-20", "20-30", "30-40", ">40",
]


def _cut(c, edges: list[float], labels: list[str]):
    """pd.cut twin: (label, bin_idx) columns; NULL outside the edges."""
    lab = F.lit(None).cast("string")
    idx = F.lit(None).cast("int")
    for i, name in enumerate(labels):
        cond = (c > F.lit(edges[i])) & (c <= F.lit(edges[i + 1]))
        lab = F.when(cond, F.lit(name)).otherwise(lab)
        idx = F.when(cond, F.lit(i)).otherwise(idx)
    return lab, idx


def with_speed_bins(matched: DataFrame) -> DataFrame:
    """A6 binning for the speed breakdowns (H:626-630): cycle-a average
    speed into fixed 10 mph bins, cycle speed difference into signed
    bins."""
    avg_lab, avg_idx = _cut(F.col("avg_speed_a"), SPEED_AVG_EDGES, SPEED_AVG_LABELS)
    d = F.col("avg_speed_a") - F.col("avg_speed_b")
    diff_lab, diff_idx = _cut(d, SPEED_DIFF_EDGES, SPEED_DIFF_LABELS)
    return (
        matched.withColumn("avg_speed_bin", avg_lab)
        .withColumn("avg_speed_bin_idx", avg_idx)
        .withColumn("speed_diff_bin", diff_lab)
        .withColumn("speed_diff_bin_idx", diff_idx)
    )


def outlier_breakdowns(
    flagged: DataFrame, dims: list[str] | None = None
) -> dict[str, DataFrame]:
    """H:445-904: the breakdown pass as one parameterized kernel
    (qcflow.summary.breakdown), now including the reference's BINNED
    dimensions by default: avg-speed bins + speed-diff bins (bin first,
    then the A4 kernel, bin-index ordered — H:623-660) and the raw
    time-gap-days dimension sorted by outlier count (H:713-723). Rows
    whose value falls outside the bin edges (NULL bin) are excluded,
    matching pd.cut's NaN-group drop.

    INTENTIONAL divergence from the reference (advisor r3): the
    reference's categorical groupby (observed=False, H:630-637) emits a
    row for every bin LABEL even when no outlier landed in it
    (count_out=0), because its charts want empty bars; this kernel's
    aggregate-then-broadcast-join shape emits only bins that contain
    outliers — the table consumer's natural form, and the shape
    test_binned_breakdowns_match_pandas pins (observed=True +
    count_out>0 on the pandas side). Chart-side bin completion is a
    presentation concern: left-join from the label literal list at
    render time if empty bars are needed."""
    from qcflow.summary import breakdown

    flagged = with_speed_bins(flagged)
    dims = dims or [
        "county",
        "hwy_id",
        "lane_number_a",
        "direction_a",
        "vehicle_id_a",
        "traffic_level_a",
        "avg_speed_bin",
        "speed_diff_bin",
        "time_gap_days",
    ]
    outliers = flagged.filter(F.col("flag") == 1)
    out = {}
    for d in dims:
        if d in ("avg_speed_bin", "speed_diff_bin"):
            b = breakdown(
                outliers.filter(F.col(d).isNotNull()),
                flagged.filter(F.col(d).isNotNull()),
                [d, f"{d}_idx"],
                weight="section_length",
            ).orderBy(f"{d}_idx")
        elif d == "time_gap_days":
            b = breakdown(outliers, flagged, d, weight="section_length").orderBy(
                F.desc("count_out")
            )
        else:
            b = breakdown(outliers, flagged, d, weight="section_length")
        out[d] = b
    return out
