"""In-session A/B: slim acoustic staging via parquet write+readback vs
MEMORY_AND_DISK persist of the slim decode frame (score_clips
stage_mode). Interleaved A/B/A/B (variance lesson) with SHARED frozen
thresholds (sketch thresholds are partition-layout-sensitive; the two
variants have different physical layouts by construction). Writes
BENCH/ab_stage_persist.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from qcflow.pipeline import score_clips  # noqa: E402
from qcflow.rules import derive_thresholds  # noqa: E402
from qcflow.session import get_spark  # noqa: E402
from qcflow.udfs import with_langid_ppl  # noqa: E402
from qcflow.features import clip_features  # noqa: E402

CLIPS = "/root/repo/.cache/clips_scale60000/clips.parquet"


def run(spark, clips, thr, mode: str) -> tuple[float, int]:
    t0 = time.time()
    res = score_clips(
        spark,
        clips,
        thresholds=thr,
        check_acoustics=True,
        slim_stage=True,
        stage_mode=mode,
    )
    n = res.scored.filter("keep").count()
    sec = time.time() - t0
    res.release()
    return sec, n


def main() -> int:
    spark = get_spark("ab-stage-persist", cpus=32)
    clips = spark.read.parquet(CLIPS)
    n_rows = clips.count()
    thr = derive_thresholds(
        with_langid_ppl(clip_features(clips.limit(2000).drop("bytes")), spark),
        exact=False,
    )
    run(spark, clips.limit(2000), thr, "persist")  # warmup
    runs = {"parquet": [], "persist": []}
    kept = set()
    for _ in range(3):
        sec_a, k_a = run(spark, clips, thr, "parquet")
        sec_b, k_b = run(spark, clips, thr, "persist")
        runs["parquet"].append(round(sec_a, 2))
        runs["persist"].append(round(sec_b, 2))
        kept.update({k_a, k_b})
    assert len(kept) == 1, f"kept counts differ across variants: {kept}"
    best_a, best_b = min(runs["parquet"]), min(runs["persist"])
    out = {
        "rows": n_rows,
        "parquet_secs": runs["parquet"],
        "persist_secs": runs["persist"],
        "parquet_clips_per_sec": round(n_rows / best_a, 1),
        "persist_clips_per_sec": round(n_rows / best_b, 1),
        "speedup_persist": round(best_a / best_b, 3),
        "winner": "persist" if best_b <= best_a else "parquet",
        "n_kept": kept.pop(),
    }
    with open("/root/repo/BENCH/ab_stage_persist.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
