"""Extra benchmarks (guide §1.4 noop-sink isolation) — NOT the driver
contract; bench.py stays frozen. Usage:

  python bench_extra.py sweep_times [sf_dir]   # time all registry queries

(qc-pipeline stage isolation was done with ad-hoc in-session A/Bs — see
OPTIMIZATION_r06.md — not a mode here.) Prints one JSON line per mode;
an unknown mode exits 2 with a message. Methodology mirrors bench.py: warm page
cache, get_spark(local[$SPARK_GRAFT_CPUS]), noop sinks, min-of-2 where a
key crosses the vdisk.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _warm(path: str) -> None:
    for root, _, files in os.walk(path):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def sweep_times(sf_dir: str) -> int:
    from qcflow.parity import QUERIES
    from qcflow.session import get_spark

    spark = get_spark("qcflow-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    _warm(sf_dir)
    out = {}
    for name, fn in sorted(QUERIES.items()):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as ex:  # noqa: BLE001
            out[name] = f"ERR {str(ex)[:100]}"
    print(json.dumps({"mode": "sweep_times", "sf_dir": sf_dir, "times": out}))
    return 0


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep_times"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if mode != "sweep_times":
        print(f"unknown mode {mode!r}; modes: sweep_times", file=sys.stderr)
        sys.exit(2)
    sys.exit(sweep_times(sf))
