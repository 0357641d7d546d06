"""Registry for parity queries and their DuckDB oracles.

A parity query is ``fn(spark, sf_dir) -> DataFrame``; its oracle is an ANSI
SQL string DuckDB runs against the same parquet tables (pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``). The driver compares row count + schema + order-insensitive
value hash, sorting columns by name — so every computed column is aliased
identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def query(name: str, oracle: str | None = None):
    """Register a parity query; ``oracle`` is the DuckDB SQL twin (or None
    for non-SQL-expressible operators → driver does a rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load the named driver parquet tables (all of TABLES when empty)."""
    names = names or TABLES
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
