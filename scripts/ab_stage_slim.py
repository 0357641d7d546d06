"""A/B the acoustic staging layout IN ONE SESSION (repo variance lesson:
the staging write on the shared vdisk swings 3-5x run-to-run, so the two
variants must interleave under the same host conditions).

A = full-frame staging (r2 layout): the whole scored frame (transcripts +
    every feature) goes through the parquet staging table.
B = slim staging (score_clips slim_stage=True): only (clip_id, 8 acoustic
    doubles) staged; the narrow text/model frame joins them back.

Prints one JSON line with per-run seconds and the winner; paste into the
scaling template (scripts/scaling.py) history, not BENCH/BASELINE.md
directly (it is rewritten)."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from qcflow.pipeline import score_clips  # noqa: E402
from qcflow.session import get_spark  # noqa: E402

CLIPS = "/root/repo/.cache/clips_scale60000/clips.parquet"
ROUNDS = 2


def run(spark, clips, thr, slim: bool) -> tuple[float, int]:
    t0 = time.monotonic()
    res = score_clips(
        spark, clips, thresholds=thr, check_acoustics=True, slim_stage=slim,
    )
    n_kept = res.scored.filter(F.col("keep")).count()
    sec = time.monotonic() - t0
    res.release()
    return round(sec, 2), n_kept


def main() -> None:
    spark = get_spark()
    clips = spark.read.parquet(CLIPS)
    n = clips.count()  # page-cache warm + row count
    # thresholds derived ONCE and shared: percentile_approx sketch merges
    # are partition-layout-sensitive, so per-variant derivation would
    # compare thresholds, not staging layouts (measured: 1-row kept-set
    # delta between layouts at 60k clips)
    from qcflow.features import clip_features
    from qcflow.rules import derive_thresholds
    from qcflow.udfs import with_langid_ppl

    thr = derive_thresholds(
        with_langid_ppl(clip_features(clips.drop("bytes")), spark), exact=False
    )
    # warmup pass (fresh-JVM codegen/Arrow init, not charged to either)
    run(spark, clips.limit(2000), thr, slim=True)
    runs = {"full": [], "slim": []}
    kepts = set()
    for _ in range(ROUNDS):
        sec_a, k_a = run(spark, clips, thr, slim=False)
        sec_b, k_b = run(spark, clips, thr, slim=True)
        runs["full"].append(sec_a)
        runs["slim"].append(sec_b)
        kepts.update([k_a, k_b])
    assert len(kepts) == 1, f"variants disagree on kept set size: {kepts}"
    best_full, best_slim = min(runs["full"]), min(runs["slim"])
    session = {
        "host": "unlabeled re-run",  # relabel by hand if quoting this run
        "full_secs": runs["full"],
        "slim_secs": runs["slim"],
        "speedup_slim": round(best_full / best_slim, 3),
    }
    import os

    # APPEND a session to the committed file — scaling.py's BASELINE.md
    # rebuild iterates ab["sessions"] and reads the top-level
    # rows/winner/rationale keys, so the session-list schema must be
    # preserved (a flat overwrite here once broke the rebuild after the
    # 40-minute measurement completed)
    path = "/root/repo/BENCH/ab_stage_slim.json"
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    else:
        out = {"rows": n, "sessions": [], "winner": "", "rationale": ""}
    out["sessions"].append(session)
    out["winner"] = "slim" if best_slim <= best_full else "full"
    out.setdefault("rationale", "")
    out["full_clips_per_sec_best"] = round(n / best_full, 1)
    out["slim_clips_per_sec_best"] = round(n / best_slim, 1)
    with open(path, "w") as f:
        json.dump(out, f)  # scaling.py folds this into BENCH/BASELINE.md
    print(json.dumps(out))


if __name__ == "__main__":
    main()
