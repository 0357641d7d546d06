"""Snapshot checkpoint / resume over bucket manifests.

Iceberg snapshots are the production mechanism (BASELINE.json north_star);
the runtime jar is not available in this sandbox, so the same semantics are
implemented over parquet: the lineage table (one row per clip_id-hash
bucket) IS the manifest. A resumed run:

  1. loads the saved thresholds (derived from the FULL input on the first
     attempt — resuming must not re-derive them from a partial subset, or
     labels would drift between attempts),
  2. anti-joins the completed buckets out of the input (J1b pattern),
  3. appends kept/dropped/lineage for the remaining buckets only,
  4. finalizes metrics side tables from the materialized outputs.

Bucket = pmod(xxhash64(clip_id), n_buckets): stable across cluster sizes
and restarts, so a manifest written at N executors resumes correctly at 4N.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.pipeline import (
    DROP_COLS,
    KEEP_COLS,
    N_BUCKETS,
    bucket_col,
    score_clips,
)
from qcflow.rules import Thresholds, derive_thresholds
from qcflow.summary import conf_histogram
from qcflow.features import clip_features
from qcflow.udfs import with_langid_ppl


def _thr_path(out_dir: str) -> str:
    return os.path.join(out_dir, "thresholds.json")


def save_thresholds(thr: Thresholds, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(_thr_path(out_dir), "w") as f:
        json.dump(thr.__dict__, f)


def load_thresholds(out_dir: str) -> Thresholds | None:
    p = _thr_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return Thresholds(**json.load(f))


def completed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    path = f"{out_dir}/lineage.parquet"
    from pyspark.errors import AnalysisException

    try:
        return [
            r["bucket"] for r in spark.read.parquet(path).select("bucket").collect()
        ]
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return []  # first run: no manifest yet
        raise  # corrupted/unreadable manifest must NOT mean 'reprocess all'


def run_resumable(
    spark: SparkSession,
    clips_path: str,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
    exact_thresholds: bool = True,
    max_buckets: int | None = None,
) -> dict:
    """Process all not-yet-completed buckets (optionally capped at
    ``max_buckets`` — the test hook that simulates a mid-run kill).
    Idempotent: a completed run is a no-op."""
    clips = spark.read.parquet(clips_path)

    thr = load_thresholds(out_dir)
    if thr is None:
        feats = with_langid_ppl(clip_features(clips.drop("bytes")), spark)
        thr = derive_thresholds(feats, exact=exact_thresholds)
        save_thresholds(thr, out_dir)

    done = set(completed_buckets(spark, out_dir))
    todo = sorted(set(range(n_buckets)) - done)
    if max_buckets is not None:
        todo = todo[:max_buckets]
    if not todo:
        return {"processed_buckets": 0, "remaining": 0}

    subset = clips.withColumn("bucket", bucket_col(n_buckets)).filter(
        F.col("bucket").isin(todo)
    ).drop("bucket")
    res = score_clips(
        spark, subset, thresholds=thr, n_buckets=n_buckets
    )
    scored = res.scored
    scored.filter(F.col("keep")).select(*KEEP_COLS).repartition("bucket").write.mode(
        "append"
    ).partitionBy("bucket").parquet(f"{out_dir}/kept.parquet")
    scored.filter(~F.col("keep")).select(*DROP_COLS).repartition("bucket").write.mode(
        "append"
    ).partitionBy("bucket").parquet(f"{out_dir}/dropped.parquet")
    lin = scored.groupBy("bucket").agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
    )
    lin.write.mode("append").parquet(f"{out_dir}/lineage.parquet")
    res.release()
    remaining = n_buckets - len(done) - len(todo)
    if remaining == 0:
        finalize_metrics(spark, out_dir)
    return {"processed_buckets": len(todo), "remaining": remaining}


def finalize_metrics(spark: SparkSession, out_dir: str) -> None:
    """Recompute metrics side tables from the materialized outputs —
    correct regardless of how many attempts produced them."""
    dropped = spark.read.parquet(f"{out_dir}/dropped.parquet")
    kept = spark.read.parquet(f"{out_dir}/kept.parquet")
    (
        dropped.select(
            "lang", F.explode(F.split("drop_reasons", ",")).alias("drop_reason")
        )
        .groupBy("lang", "drop_reason")
        .agg(F.count("*").alias("n"))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/metrics_drop_reasons.parquet")
    )
    scored_conf = kept.select("lang", "lang_conf").unionByName(
        dropped.select("lang", "lang_conf")
    )
    conf_histogram(scored_conf).write.mode("overwrite").parquet(
        f"{out_dir}/metrics_lang_conf.parquet"
    )


def process_increment(
    spark: SparkSession,
    clips_path: str,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
) -> dict:
    """Snapshot-diff processing: score only clips NOT already in the
    outputs (row-level anti-join against kept+dropped ids), append, and
    refresh metrics. This is the daily-increment path at 10^12 rows — the
    new snapshot is never reprocessed from scratch; the anti-join keys are
    8-byte ids and prune to the bucket directories.

    Thresholds stay frozen from the first attempt (consistent labels
    across increments, like the reference's session-pinned thresholds)."""
    clips = spark.read.parquet(clips_path)
    thr = load_thresholds(out_dir)
    if thr is None:
        # first load: just run the resumable path
        return run_resumable(spark, clips_path, out_dir, n_buckets=n_buckets)

    seen = (
        spark.read.parquet(f"{out_dir}/kept.parquet")
        .select("clip_id")
        .unionByName(spark.read.parquet(f"{out_dir}/dropped.parquet").select("clip_id"))
    )
    new = clips.join(seen, "clip_id", "left_anti")
    res = score_clips(spark, new, thresholds=thr, n_buckets=n_buckets)
    # The scored plan READS kept/dropped (the anti-join) and we are about to
    # APPEND to them — materialize and cut the lineage first, or the later
    # actions re-evaluate against their own output (self-referential
    # read-modify-write). On a cluster use checkpoint(); local is fine here.
    scored = res.scored.localCheckpoint(eager=True)
    res.release()
    kept = scored.filter(F.col("keep")).select(*KEEP_COLS)
    dropped = scored.filter(~F.col("keep")).select(*DROP_COLS)
    kept.repartition("bucket").write.mode("append").partitionBy("bucket").parquet(
        f"{out_dir}/kept.parquet"
    )
    dropped.repartition("bucket").write.mode("append").partitionBy("bucket").parquet(
        f"{out_dir}/dropped.parquet"
    )
    lin = scored.groupBy("bucket").agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
    )
    n_new = int(lin.agg(F.sum("n_input")).collect()[0][0] or 0)
    # append the increment's lineage rows so kept/dropped contents and the
    # manifest totals never diverge (a bucket may appear in several rows:
    # one per attempt/increment; completed_buckets de-dups via set). A
    # crash mid-increment is recovered by re-running process_increment —
    # the row-level anti-join skips whatever the partial attempt landed.
    if n_new:
        lin.write.mode("append").parquet(f"{out_dir}/lineage.parquet")
    scored.unpersist()
    finalize_metrics(spark, out_dir)
    return {"n_new": n_new}
