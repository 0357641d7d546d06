"""In-session A/B: langid/ppl UDF fed raw 256-row Arrow batches vs
iterator-side re-chunking to LANGID_CHUNK_ROWS (qcflow/udfs._rebatch).

Interleaved A/B/A/B under the same host conditions (variance lesson,
CLAUDE.md); the timed job is the text-side pipeline exactly as bench.py's
qc_pipeline runs it (features + langid/ppl + thresholds + rules + scrub +
count), no bytes column. Writes BENCH/ab_langid_rebatch.json.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import pandas as pd

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from qcflow import udfs  # noqa: E402
from qcflow.features import clip_features  # noqa: E402
from qcflow.rules import apply_rules, derive_thresholds  # noqa: E402
from qcflow.scrub import scrub  # noqa: E402
from qcflow.session import get_spark  # noqa: E402

CLIPS = "/root/repo/.cache/clips_scale60000/clips.parquet"


def _with_langid_rebatched(df, spark, chunk_rows: int):
    """The rebatching variant lives HERE, self-contained: the production
    with_langid_ppl deliberately has no rebatch layer (this A/B measured
    it a wash), so the script carries its own so a re-run still measures
    a real difference instead of toggling a dead attribute."""
    bc = udfs._broadcast_models(spark)

    # the Iterator type hints select the SCALAR_ITER UDF form; Iterator
    # and pd must be MODULE-level imports — with `from __future__ import
    # annotations` the hints are strings, and PySpark resolves them in
    # the function's global namespace
    @F.pandas_udf("lang string, lang_conf double, perplexity double")
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        models = bc.value
        pend, n = [], 0
        for s in it:
            pend.append(s)
            n += len(s)
            if n >= chunk_rows:
                yield udfs._score_batch(models, pd.concat(pend, ignore_index=True))
                pend, n = [], 0
        if pend:
            yield udfs._score_batch(models, pd.concat(pend, ignore_index=True))

    out = df.withColumn("_m", _udf(F.col("transcript")))
    return out.select("*", "_m.lang", "_m.lang_conf", "_m.perplexity").drop("_m")


def run(spark, clips, thr, chunk_rows: int) -> tuple[float, int]:
    t0 = time.time()
    if chunk_rows <= 1:  # production path: raw Arrow batches (256 rows)
        df = udfs.with_langid_ppl(clip_features(clips), spark)
    else:
        df = _with_langid_rebatched(clip_features(clips), spark, chunk_rows)
    flagged = scrub(apply_rules(df, thr))
    n = flagged.agg(F.sum(F.col("keep").cast("long"))).collect()[0][0]
    return time.time() - t0, int(n)


def main() -> int:
    spark = get_spark("ab-langid-rebatch", cpus=32)
    clips = spark.read.parquet(CLIPS).drop("bytes")
    n_rows = clips.count()  # also warms scan
    warm = clips.limit(2000)
    thr = derive_thresholds(
        udfs.with_langid_ppl(clip_features(warm), spark), exact=False
    )
    run(spark, warm, thr, 8192)  # worker pool + codegen warmup
    runs = {"raw256": [], "rebatch8k": []}
    kept = set()
    for _ in range(3):
        sec_a, k_a = run(spark, clips, thr, 1)  # chunk=1 -> passthrough 256
        sec_b, k_b = run(spark, clips, thr, 8192)
        runs["raw256"].append(round(sec_a, 2))
        runs["rebatch8k"].append(round(sec_b, 2))
        kept.update({k_a, k_b})
    assert len(kept) == 1, f"kept counts differ across variants: {kept}"
    best_a, best_b = min(runs["raw256"]), min(runs["rebatch8k"])
    out = {
        "rows": n_rows,
        "raw256_secs": runs["raw256"],
        "rebatch8k_secs": runs["rebatch8k"],
        "raw256_clips_per_sec": round(n_rows / best_a, 1),
        "rebatch8k_clips_per_sec": round(n_rows / best_b, 1),
        "speedup_rebatch": round(best_a / best_b, 3),
        "winner": "rebatch8k" if best_b <= best_a else "raw256",
    }
    with open("/root/repo/BENCH/ab_langid_rebatch.json", "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
