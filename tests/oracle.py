"""Local mirror of the driver's DuckDB-oracle comparison.

The driver runs each ``queries()`` entry and its ``oracle_sql()`` twin on
the same parquet tables and compares row count + schema + order-insensitive
value hash with columns sorted by name. This module reproduces that check
so a query is only shipped once it passes here.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from qcflow.parity.registry import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con.sql(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()

    def cell(v):
        if v is None:
            return "\0NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "\0NULL"
            return repr(v)  # full precision
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)

    out = df.map(cell)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    sp = spark_df.toPandas()
    problems: list[str] = []
    if len(sp) != len(oracle_pdf):
        problems.append(f"row count: spark={len(sp)} oracle={len(oracle_pdf)}")
    if sorted(sp.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns: spark={sorted(sp.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    a, b = canon(sp), canon(oracle_pdf)
    if len(a) == len(b):
        neq = (a != b).any(axis=1)
        if neq.any():
            i = int(neq.idxmax())
            problems.append(
                f"value mismatch at canon-row {i}:\n spark : {a.iloc[i].to_dict()}\n oracle: {b.iloc[i].to_dict()}"
            )
    return problems
