"""Driver-style oracle sweep at any SF: every registered query vs its
DuckDB twin (row count + order-insensitive value hash, columns sorted by
name — the exact comparison the driver's CORRECTNESS gate records).

Usage:
  python scripts/sweep.py                      # sf0.01 (the driver gate)
  python scripts/sweep.py /root/testdata/sf0.1 # 10x robustness pass

Prints one JSON line: {"fails": {...}, "n": N, "empties": [...]}.
Uses qcflow.session.get_spark — a bare 1g-driver session OOMs after
~15 sf0.1 queries of accumulated localCheckpoint blocks.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = pdf.astype(str).apply("|".join, axis=1)
    joined = "\n".join(rows.sort_values()) if len(rows) else ""
    return hashlib.md5(joined.encode()).hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from qcflow.parity.registry import TABLES
    from qcflow.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("qcflow-sweep", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for n in TABLES:
        con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{sf}/{n}.parquet'")
    res = {}
    for name, fn in sorted(e.queries().items()):
        try:
            sp = fn(spark, sf).toPandas()
            ok = True
            if name in e.oracle_sql():
                od = con.sql(e.oracle_sql()[name]).df()
                ok = value_hash(sp) == value_hash(od) and len(sp) == len(od)
            res[name] = {"ok": bool(ok), "rows": len(sp)}
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            res[name] = {"ok": False, "err": str(ex)[:200]}
    fails = {k: v for k, v in res.items() if not v["ok"]}
    print(
        json.dumps(
            {
                "sf": sf,
                "n": len(res),
                "fails": fails,
                "empties": [k for k, v in res.items() if v.get("rows") == 0],
            }
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
