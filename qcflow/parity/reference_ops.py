"""Operator-by-operator parity with the reference (SURVEY.md §2).

Each query exercises ONE operator family from the reference's inventory at
TPC-H/event-table shape, with a DuckDB oracle. Docstrings cite the
reference implementation (``Home.py`` = H, ``Home copy.py`` = HC) the
operator re-expresses; the Spark form is the idiomatic primitive, never a
translation of the pandas eager dataflow.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t

D = "decimal(12,2)"


def dec(c: str):
    return F.col(c).cast(D)


# ---------------------------------------------------------------- S: scans

@query(
    "s1_scan_projection",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus FROM orders
    """,
)
def s1_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3 (H:98-105): scan with explicit projection + column reorder.
    Catalyst column pruning pushes ReadSchema down to the parquet footer —
    only 4 of 6 columns are decoded."""
    return t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice", "o_orderstatus"
    )


@query(
    "s2_scan_filter_pushdown",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000
    """,
)
def s2_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 (HC:93-95): scan-time predicate. The reference filters by hand
    during load; here the predicate lands in PushedFilters at the scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select("o_orderkey", "o_custkey", "o_orderpriority")
    )


@query(
    "s4_sink_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
    """,
)
def s4_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+S5 (H:321-324 CSV download, H:92 memo cache): write a filtered
    frame to a parquet sink, read it back, aggregate. The write/read pair is
    the engine's materialization point (Iceberg side table in production)."""
    out = os.path.join(tempfile.mkdtemp(prefix="qcflow_s4_"), "cust")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    cust.write.mode("overwrite").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


# ------------------------------------------------- P: projections / filters

@query(
    "p1_timestamp_parse",
    oracle="""
    SELECT event_id,
           strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S') AS parsed_ts
    FROM events
    """,
)
def p1_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 (H:99, H:102): `pd.to_datetime(col, '%Y%m%d%H%M%S')`. Round-trips
    through the reference's compact timestamp format (second granularity)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_timestamp(
            F.date_format("ts", "yyyyMMddHHmmss"), "yyyyMMddHHmmss"
        ).alias("parsed_ts"),
    )


@query(
    "p2_derived_abs_length",
    oracle="""
    SELECT event_id, ABS(value - CAST(user_id AS DOUBLE)) AS abs_span FROM events
    """,
)
def p2_derived_abs_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (H:100, H:103): derived `SECTION LENGTH = abs(a-b)` column."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.abs(F.col("value") - F.col("user_id").cast("double")).alias("abs_span"),
    )


@query(
    "p4_isin_filter",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def p4_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (H:156-157): literal IN-list filter (pavement-type selection)."""
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "p5_rule_flag_engine",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           concat_ws(',',
             CASE WHEN l_quantity >= 45 THEN 'qty_high' END,
             CASE WHEN l_extendedprice <= 1500 THEN 'price_low' END,
             CASE WHEN l_discount >= 0.09 THEN 'disc_high' END
           ) AS drop_reasons,
           1 AS flag
    FROM lineitem
    WHERE l_quantity >= 45 OR l_extendedprice <= 1500 OR l_discount >= 0.09
    """,
)
def p5_rule_flag_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (H:161-184): the core rule-flag engine — init flag=0, set flag=1
    where any rule fires, keep flagged rows; extended with the engine's
    drop_reasons so the histogram side table falls out of the same pass.
    One whole-stage-codegen projection, no UDFs."""
    li = t(spark, sf_dir, "lineitem")
    rules = [
        (F.col("l_quantity") >= 45, "qty_high"),
        (F.col("l_extendedprice") <= 1500, "price_low"),
        (F.col("l_discount") >= 0.09, "disc_high"),
    ]
    reasons = F.concat_ws(",", *[F.when(c, F.lit(r)) for c, r in rules])
    fired = None
    for c, _ in rules:
        fired = c if fired is None else (fired | c)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            reasons.alias("drop_reasons"),
            F.when(fired, 1).otherwise(0).alias("flag"),
        )
        .filter(F.col("flag") == 1)
    )


@query(
    "p6_row_number",
    oracle="""
    SELECT event_id, ROW_NUMBER() OVER (ORDER BY event_id) AS rn
    FROM events WHERE event_type = 'purchase'
    """,
)
def p6_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/W2 (H:125-126): np.arange row ids → deterministic row_number over
    an explicit key (NOT monotonically_increasing_id, which is
    partition-layout-dependent). Global-order window: acceptable only on
    filtered/plot-sized data; the engine uses natural keys instead."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select(
        "event_id", F.row_number().over(Window.orderBy("event_id")).alias("rn")
    )


@query(
    "p7_concat_indicator",
    oracle="""
    SELECT event_id,
           concat(event_type, '-', CAST(user_id AS VARCHAR)) AS indicator
    FROM events
    """,
)
def p7_concat_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 (H:520-521, H:814-815): string-pair indicator columns used as
    breakdown dimensions."""
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.concat_ws("-", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "indicator"
        ),
    )


@query(
    "p8_datediff",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           date_diff('day', o_orderdate, l_shipdate) AS ship_delay_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def p8_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 (H:713-721): cycle-to-cycle time gap reduced to days."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_delay_days"),
    )


@query(
    "p9_pct_of_total",
    oracle="""
    WITH g AS (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus),
         tot AS (SELECT COUNT(*) AS n_all FROM orders)
    SELECT o_orderstatus, n, 100.0 * n / n_all AS pct
    FROM g CROSS JOIN tot
    """,
)
def p9_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 (H:462 et al.): percentage-of-total after joining an aggregate to
    the grand total (broadcast — it's a single row)."""
    orders = t(spark, sf_dir, "orders")
    g = orders.groupBy("o_orderstatus").agg(F.count("*").alias("n"))
    tot = orders.agg(F.count("*").alias("n_all"))
    return g.crossJoin(F.broadcast(tot)).select(
        "o_orderstatus", "n", (F.lit(100.0) * F.col("n") / F.col("n_all")).alias("pct")
    )


# ------------------------------------------------------------------ J: joins

@query(
    "j1_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def j1_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (H:124): semi-join prefilter (`isin` against another frame's
    column) → left_semi, no payload duplication, no row explosion."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "j1b_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000)
    """,
)
def j1b_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join complement of J1 (engine addition — the reference lacks
    NOT EXISTS; needed for resume: 'clips not in completed lineage')."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "j2_pairmatch_band_join",
    oracle="""
    SELECT a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
           a.o_custkey AS o_custkey,
           CAST(CAST(a.o_totalprice AS DECIMAL(12,2))
                - CAST(b.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS diff_totalprice
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND ABS(a.o_totalprice - b.o_totalprice) < 20000
    WHERE a.o_orderdate >= TIMESTAMP '1996-01-01' AND a.o_orderdate < TIMESTAMP '1997-01-01'
      AND b.o_orderdate >= TIMESTAMP '1997-01-01' AND b.o_orderdate < TIMESTAMP '1998-01-01'
    """,
)
def j2_pairmatch_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+J3+P3 (H:128-139): the reference's core pair-match — two cycles of
    one entity equi-joined on the entity key with a band (tolerance)
    residual predicate, then per-measure diff columns. The band predicate
    lives IN the join condition: Catalyst plans hash/sort-merge on the equi
    key with the residual applied during the match — no nested-loop
    explosion, no post-join filter pass, and m:n duplication semantics
    identical to pandas (every in-tolerance pair survives). The reference's
    key-only-join-then-two-back-joins (J4, H:135-136) is deliberately NOT
    mirrored: carrying columns through one join is 1 shuffle instead of 3."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).alias("a")
    b = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).alias("b")
    return a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.abs(F.col("a.o_totalprice") - F.col("b.o_totalprice")) < 20000),
    ).select(
        F.col("a.o_orderkey").alias("orderkey_a"),
        F.col("b.o_orderkey").alias("orderkey_b"),
        F.col("a.o_custkey").alias("o_custkey"),
        (
            F.col("a.o_totalprice").cast(D) - F.col("b.o_totalprice").cast(D)
        ).cast("double").alias("diff_totalprice"),
    )


@query(
    "j5_agg_enrich_join",
    oracle="""
    WITH outl AS (
      SELECT o_custkey, COUNT(*) AS count_out,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_out
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey),
    alln AS (
      SELECT o_custkey, COUNT(*) AS count_all,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price_all
      FROM orders GROUP BY o_custkey)
    SELECT outl.o_custkey AS o_custkey, count_out, price_out, count_all, price_all,
           100.0 * count_out / count_all AS pct_out
    FROM outl JOIN alln ON outl.o_custkey = alln.o_custkey
    """,
)
def j5_agg_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+A4+P9 (H:456-462 and 13 sibling blocks): outlier-group stats
    joined to all-data group stats on the group key, then pct-of-total —
    the breakdown kernel. Both sides aggregate before joining, so the join
    input is dimension-sized; Spark broadcasts the smaller aggregate."""
    orders = t(spark, sf_dir, "orders")
    outl = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("count_out"),
            F.sum(dec("o_totalprice")).cast("double").alias("price_out"),
        )
    )
    alln = orders.groupBy("o_custkey").agg(
        F.count("*").alias("count_all"),
        F.sum(dec("o_totalprice")).cast("double").alias("price_all"),
    )
    return outl.join(alln, "o_custkey").select(
        "o_custkey",
        "count_out",
        "price_out",
        "count_all",
        "price_all",
        (F.lit(100.0) * F.col("count_out") / F.col("count_all")).alias("pct_out"),
    )


# ------------------------------------------------------------- A: aggregates

@query(
    "a1_groupby_mean_multi",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS mean_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS mean_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_discount) AS mean_disc,
           CAST(SUM(CAST(l_tax AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_tax) AS mean_tax
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a1_groupby_mean_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (H:215-221, H:263-270): group-by mean over many measure columns —
    the county/district summary kernel. Expressed as exact decimal sums over
    counts so the oracle hash is bit-stable."""
    li = t(spark, sf_dir, "lineitem")
    measures = {
        "mean_qty": "l_quantity",
        "mean_price": "l_extendedprice",
        "mean_disc": "l_discount",
        "mean_tax": "l_tax",
    }
    aggs = []
    for out, c in measures.items():
        aggs.append((F.sum(dec(c)).cast("double") / F.count(c)).alias(out))
    return li.groupBy("l_returnflag").agg(*aggs)


@query(
    "a4_multi_agg_breakdown",
    oracle="""
    SELECT event_type, COUNT(*) AS count_out,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_out,
           COUNT(DISTINCT user_id) AS n_users
    FROM events WHERE value > 50 GROUP BY event_type
    """,
)
def a4_multi_agg_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3+A4 (H:456-460): named multi-aggregate (count + sum) over a
    breakdown dimension, plus a distinct count (engine addition)."""
    ev = t(spark, sf_dir, "events").filter(F.col("value") > 50)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("count_out"),
        F.sum(dec("value")).cast("double").alias("value_out"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "a5_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0) AS BIGINT) AS O,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0) AS BIGINT) AS F,
           CAST(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def a5_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 (H:233-235, H:245-252): long→wide pivot with EXPLICIT pivot values
    — skips the extra distinct-scan job Spark otherwise runs to discover
    the pivot domain (a full extra pass at 100 TB)."""
    orders = t(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(f"`{c}`"), F.lit(0)).alias(c) for c in ["O", "F", "P"]],
    )


@query(
    "a6_fixed_bins",
    oracle="""
    SELECT CASE
             WHEN value < 50 THEN 0 WHEN value < 100 THEN 1
             WHEN value < 150 THEN 2 WHEN value < 200 THEN 3
             ELSE 4 END AS bin_idx,
           CASE
             WHEN value < 50 THEN '[0,50)' WHEN value < 100 THEN '[50,100)'
             WHEN value < 150 THEN '[100,150)' WHEN value < 200 THEN '[150,200)'
             ELSE '[200,inf)' END AS bin_label,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def a6_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (H:418-421, H:623-635): fixed-edge histogram via CASE chain, with
    a numeric bin index carried for ordering (pandas ordered-categorical
    equivalent, §1.2)."""
    ev = t(spark, sf_dir, "events")
    edges = [50, 100, 150, 200]
    labels = ["[0,50)", "[50,100)", "[100,150)", "[150,200)", "[200,inf)"]
    idx = F.lit(len(edges))
    lab = F.lit(labels[-1])
    for i in reversed(range(len(edges))):
        idx = F.when(F.col("value") < edges[i], i).otherwise(idx)
        lab = F.when(F.col("value") < edges[i], labels[i]).otherwise(lab)
    return (
        ev.select(idx.alias("bin_idx"), lab.alias("bin_label"))
        .groupBy("bin_idx", "bin_label")
        .agg(F.count("*").alias("n"))
    )


@query(
    "a7_auto_histogram",
    oracle="""
    WITH mm AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM events)
    SELECT LEAST(CAST(FLOOR((value - lo) * 20 / (hi - lo)) AS BIGINT), 19) AS bin_idx,
           COUNT(*) AS n
    FROM events CROSS JOIN mm
    GROUP BY 1
    """,
)
def a7_auto_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (H:408): auto-binned histogram — two-pass min/max (single-row
    aggregate broadcast into the scan pass) then 20 equal-width bins.
    Identical float arithmetic on both sides keeps bin edges bit-equal."""
    ev = t(spark, sf_dir, "events")
    mm = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    return (
        ev.crossJoin(F.broadcast(mm))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo"))).cast("bigint"),
                F.lit(19).cast("bigint"),
            ).alias("bin_idx")
        )
        .groupBy("bin_idx")
        .agg(F.count("*").alias("n"))
    )


@query(
    "a8_percentile_thresholds",
    oracle="""
    SELECT ROUND(quantile_cont(l_quantity, 0.025), 4) AS p_low,
           ROUND(quantile_cont(l_quantity, 0.975), 4) AS p_high,
           ROUND(quantile_cont(l_quantity, 0.25)
                 - 1.5 * (quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)), 4) AS fence_low,
           ROUND(quantile_cont(l_quantity, 0.75)
                 + 1.5 * (quantile_cont(l_quantity, 0.75) - quantile_cont(l_quantity, 0.25)), 4) AS fence_high,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem
    """,
)
def a8_percentile_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (H:337-365): percentile threshold derivation — the 2.5/97.5
    percentile pair, the Q1/Q3 ± 1.5·IQR fences, and a 95th percentile, all
    null-skipping like np.nanpercentile. Exact `percentile` (correctness
    mode); the pipeline swaps in approx_percentile at bench scale."""
    li = t(spark, sf_dir, "lineitem")
    # ONE percentile buffer per column (array-of-percentages form) instead
    # of one per threshold: exact Percentile is a TypedImperativeAggregate
    # whose buffer holds every value, so 4 separate l_quantity percentiles
    # would build (and sort) 4 full-column buffers — the array form builds
    # one and reads it at 4 points, bit-identical interpolation per point.
    qarr = li.agg(
        F.percentile(
            F.col("l_quantity"),
            F.array(F.lit(0.025), F.lit(0.25), F.lit(0.75), F.lit(0.975)),
        ).alias("_q"),
        F.percentile(F.col("l_extendedprice"), F.lit(0.95)).alias("_p95"),
    )
    q025, q25 = F.element_at("_q", 1), F.element_at("_q", 2)
    q75, q975 = F.element_at("_q", 3), F.element_at("_q", 4)
    iqr = q75 - q25
    return qarr.select(
        F.round(q025, 4).alias("p_low"),
        F.round(q975, 4).alias("p_high"),
        F.round(q25 - 1.5 * iqr, 4).alias("fence_low"),
        F.round(q75 + 1.5 * iqr, 4).alias("fence_high"),
        F.round(F.col("_p95"), 4).alias("p95_price"),
    )


@query(
    "a8b_derived_threshold_flags",
    oracle="""
    WITH thr AS (
      SELECT quantile_cont(l_quantity, 0.025) AS lo, quantile_cont(l_quantity, 0.975) AS hi
      FROM lineitem)
    SELECT l_returnflag, COUNT(*) AS flagged
    FROM lineitem CROSS JOIN thr
    WHERE l_quantity <= lo OR l_quantity >= hi
    GROUP BY l_returnflag
    """,
)
def a8b_derived_threshold_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8→P5 chain (H:337-365 feeding H:179-181): thresholds are derived
    once globally, broadcast into the rule expressions, and rows outside
    [lo, hi] are flagged — never recomputed per partition."""
    li = t(spark, sf_dir, "lineitem")
    thr = li.agg(
        F.percentile(F.col("l_quantity"), F.lit(0.025)).alias("lo"),
        F.percentile(F.col("l_quantity"), F.lit(0.975)).alias("hi"),
    )
    return (
        li.crossJoin(F.broadcast(thr))
        .filter((F.col("l_quantity") <= F.col("lo")) | (F.col("l_quantity") >= F.col("hi")))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("flagged"))
    )


@query(
    "a9_ecdf",
    oracle="""
    SELECT o_totalprice, cume_dist() OVER (ORDER BY o_totalprice) AS ecdf
    FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def a9_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/W1 (H:409-410): ECDF via cume_dist over a global-order window —
    restricted to a filtered, plot-sized subset (a global window is a
    single-partition sort; never run it on the raw table at scale)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "5-LOW")
    return orders.select(
        "o_totalprice",
        F.cume_dist().over(Window.orderBy("o_totalprice")).alias("ecdf"),
    )


@query(
    "a10_distinct_pick",
    oracle="SELECT DISTINCT event_type FROM events",
)
def a10_distinct_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (H:116): distinct scalar pick for cycle labels — hash-distinct."""
    return t(spark, sf_dir, "events").select("event_type").distinct()


# -------------------------------------------------- O / U: sort, limit, union

@query(
    "o1_multisort_topk",
    oracle="""
    SELECT event_id, user_id, value FROM events
    ORDER BY value DESC, event_id LIMIT 50
    """,
)
def o1_multisort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 (H:461 et al. sorts; engine adds LIMIT): multi-key sort + top-k.
    Compiles to TakeOrderedAndProject — per-partition heaps, no global sort."""
    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(50)
    )


@query(
    "u1_union_cycles",
    oracle="""
    SELECT '1996' AS cycle, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY o_orderstatus
    UNION ALL
    SELECT '1997' AS cycle, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_orderstatus
    """,
)
def u1_union_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (H:222, H:249, H:269): union of per-cycle aggregates with a cycle
    literal column (H:217, H:220) — unionByName after schema alignment."""
    orders = t(spark, sf_dir, "orders")

    def per_cycle(label: str, lo: str, hi: str) -> DataFrame:
        return (
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(dec("o_totalprice")).cast("double").alias("total"),
            )
            .select(F.lit(label).alias("cycle"), "o_orderstatus", "n", "total")
        )

    return per_cycle("1996", "1996-01-01", "1997-01-01").unionByName(
        per_cycle("1997", "1997-01-01", "1998-01-01")
    )
