"""spark-submit entry point.

Usage (local or cluster — on a cluster drop --cpus and let the master
decide; ship the package with ``--py-files qcflow.zip``):

  spark-submit --py-files qcflow.zip -m qcflow.cli ... # or:
  python -m qcflow.cli gen --rows 20000 --out /tmp/clips
  python -m qcflow.cli run --clips /tmp/clips/clips.parquet --out /tmp/qc \
      [--resume] [--check-pcm] [--approx-thresholds] [--cpus 32]

Prints one JSON line with counts + timings.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="qcflow")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate the synthetic clip table")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--cpus", type=int, default=None)
    g.add_argument("--partitions", type=int, default=None)

    r = sub.add_parser("run", help="run the QC pipeline")
    r.add_argument("--clips", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--cpus", type=int, default=None)
    r.add_argument("--resume", action="store_true")
    r.add_argument("--check-pcm", action="store_true")
    r.add_argument("--check-acoustics", action="store_true")
    r.add_argument("--approx-thresholds", action="store_true")
    r.add_argument("--n-buckets", type=int, default=64)

    args = p.parse_args(argv)

    from qcflow.session import get_spark

    spark = get_spark("qcflow-cli", cpus=args.cpus)
    t0 = time.time()
    if args.cmd == "gen":
        from qcflow.synth import generate_clips

        generate_clips(spark, args.rows, args.out, partitions=args.partitions)
        out = {"cmd": "gen", "rows": args.rows, "out": args.out}
    else:
        if args.resume:
            from qcflow.checkpoint import run_resumable

            out = run_resumable(
                spark,
                args.clips,
                args.out,
                n_buckets=args.n_buckets,
                exact_thresholds=not args.approx_thresholds,
            )
            out["cmd"] = "run-resumable"
        else:
            from qcflow.pipeline import score_clips, write_outputs

            clips = spark.read.parquet(args.clips)
            res = score_clips(
                spark,
                clips,
                exact_thresholds=not args.approx_thresholds,
                check_pcm=args.check_pcm,
                check_acoustics=args.check_acoustics,
                n_buckets=args.n_buckets,
            )
            out = write_outputs(res, args.out)
            out["cmd"] = "run"
            out["thresholds"] = res.thresholds.__dict__
    out["sec"] = round(time.time() - t0, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
