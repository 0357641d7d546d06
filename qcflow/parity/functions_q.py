"""Scalar-function surface coverage (SURVEY §2.6 + engine additions):
JSON extraction, string functions, date/time functions, null handling.
One query per family, exact DuckDB twins (dialect deltas documented
inline)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t


@query(
    "f_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column
    (get_json_object — no UDF, no full from_json parse when one field is
    needed; at scale prefer from_json once into a struct if several fields
    are read)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
    )


@query(
    "f_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up,
           lower(c_mktsegment) AS lo,
           substr(c_name, 1, 8) AS pre,
           length(c_name) AS ln,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS tr,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           replace(c_name, '#', '-') AS repl,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS nh
    FROM customer
    """,
)
def f_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family: case, substring, pad, translate, trim,
    replace, null handling."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.length("c_name").alias("ln"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("tr"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")
        ).alias("nh"),
    )


@query(
    "f_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           dayofweek(o_orderdate) + 1 AS dow,      -- duckdb Sun=0, spark Sun=1
           quarter(o_orderdate) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           o_orderdate + INTERVAL 3 MONTH AS plus3m,
           CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS ym
    FROM orders
    """,
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: parts, quarter, truncation, month arithmetic,
    formatting (dialect deltas: Spark dayofweek is 1-based from Sunday;
    add_months vs INTERVAL)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.add_months("o_orderdate", 3)).cast("timestamp").alias("plus3m"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
    )


@query(
    "f_variant_extract",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
             AS max_k
    FROM events GROUP BY event_type
    """,
)
def f_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured scale path (Spark 4 VariantType): parse the JSON
    props column ONCE into the binary variant encoding, then extract
    typed fields with try_variant_get — at 10^12 rows this beats
    re-tokenizing JSON text per get_json_object call, and the parse +
    extract both stay inside whole-stage codegen (no UDF). DuckDB twin
    uses its native json_extract_string."""
    e = t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )
