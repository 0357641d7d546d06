"""Source/sink format breadth: CSV, JSON-lines, ORC roundtrips and
parquet schema evolution, each hash-gated against the DuckDB view the
data came from (the roundtrip must be lossless, so the oracle never
needs to read the intermediate files).

Extends S4 (reference CSV download path, Home.py:321-324) across the
formats a lake ingest actually meets. Scale discipline: every read
passes an EXPLICIT schema — ``inferSchema`` is a full extra scan of the
input at 100 TB, and JSON inference additionally samples with no schema
guarantee across partitions.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t


def _dec(c: str):
    return F.sum(F.col(c).cast("decimal(18,2)"))


def _finish(spark: SparkSession, out: DataFrame, tmp_dir: str) -> DataFrame:
    """Materialize the (dimension-sized) aggregate eagerly so the
    roundtrip directory can be deleted before returning — repeated sweep/
    test/bench invocations must not leak table copies into /tmp."""
    rows = out.collect()
    shutil.rmtree(tmp_dir, ignore_errors=True)
    return spark.createDataFrame(rows, out.schema)


@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer WHERE c_nationkey < 13 GROUP BY c_mktsegment
    """,
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + schema'd source: doubles survive because Spark writes
    shortest-roundtrip representations; the read passes the schema
    explicitly (no inferSchema scan)."""
    tmp = tempfile.mkdtemp(prefix="qcflow_srccsv_")
    cust = t(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 13)
    out = os.path.join(tmp, "cust")
    cust.write.mode("overwrite").option("header", True).csv(out)
    back = spark.read.schema(cust.schema).option("header", True).csv(out)
    agg = back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        _dec("c_acctbal").cast("double").alias("total_bal"),
    )
    return _finish(spark, agg, tmp)


@query(
    "src_jsonl_roundtrip",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + schema'd source over free text (quotes, unicode,
    embedded newlines all ride JSON escaping); re-derives lengths from
    the roundtripped text so corruption would show in the hash."""
    tmp = tempfile.mkdtemp(prefix="qcflow_srcjson_")
    docs = t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    out = os.path.join(tmp, "docs")
    docs.write.mode("overwrite").json(out)
    back = spark.read.schema(docs.schema).json(out)
    agg = back.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    return _finish(spark, agg, tmp)


@query(
    "src_orc_roundtrip",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (columnar twin to the parquet path; same
    pushdown/pruning machinery on read)."""
    tmp = tempfile.mkdtemp(prefix="qcflow_srcorc_")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    out = os.path.join(tmp, "orders")
    orders.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    agg = back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        _dec("o_totalprice").cast("double").alias("total"),
    )
    return _finish(spark, agg, tmp)


@query(
    "src_schema_evolution",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN p_partkey % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_with_price,
           CAST(SUM(CASE WHEN p_partkey % 2 = 1
                         THEN CAST(p_retailprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS total_price
    FROM part
    """,
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on an appended parquet table: batch v1 lacks the
    price column, batch v2 adds it; mergeSchema reads both with NULLs
    where v1 had no column — the add-column path of an evolving lake
    table (Iceberg schema evolution in fallback form)."""
    tmp = tempfile.mkdtemp(prefix="qcflow_srcevo_")
    part = t(spark, sf_dir, "part")
    out = os.path.join(tmp, "part")
    part.filter(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_size").write.mode(
        "overwrite"
    ).parquet(out)
    part.filter(F.col("p_partkey") % 2 == 1).select(
        "p_partkey", "p_size", "p_retailprice"
    ).write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", True).parquet(out)
    agg = back.agg(
        F.count("*").alias("n_rows"),
        F.count("p_retailprice").alias("n_with_price"),
        _dec("p_retailprice").cast("double").alias("total_price"),
    )
    return _finish(spark, agg, tmp)
