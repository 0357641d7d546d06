"""Checkpoint/resume: kill-after-subset -> resume -> identical final state."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow.checkpoint import completed_buckets, run_resumable
from qcflow.pipeline import score_clips, write_outputs

CLIPS = "/root/repo/.cache/clips_t2k/clips.parquet"
N_BUCKETS = 16


@pytest.fixture()
def out_dirs(tmp_path, spark, clips_ready):
    return str(tmp_path / "resumed"), str(tmp_path / "oneshot")


@pytest.fixture(scope="session")
def clips_ready(spark):
    import os

    from qcflow import synth

    if not os.path.exists(f"{CLIPS}/_SUCCESS"):
        synth.generate_clips(spark, 2000, "/root/repo/.cache/clips_t2k", partitions=8)
    return CLIPS


def test_resume_matches_oneshot(spark, out_dirs):
    resumed, oneshot = out_dirs

    # attempt 1 "dies" after 5 of 16 buckets
    r1 = run_resumable(spark, CLIPS, resumed, n_buckets=N_BUCKETS, max_buckets=5)
    assert r1["processed_buckets"] == 5
    assert len(completed_buckets(spark, resumed)) == 5

    # attempt 2 finishes the rest
    r2 = run_resumable(spark, CLIPS, resumed, n_buckets=N_BUCKETS)
    assert r2["processed_buckets"] == 11
    assert r2["remaining"] == 0

    # attempt 3 is a no-op (idempotence)
    r3 = run_resumable(spark, CLIPS, resumed, n_buckets=N_BUCKETS)
    assert r3["processed_buckets"] == 0

    # one-shot ground truth
    clips = spark.read.parquet(CLIPS)
    res = score_clips(spark, clips, n_buckets=N_BUCKETS)
    write_outputs(res, oneshot)

    for table in ["kept.parquet", "dropped.parquet"]:
        a = (
            spark.read.parquet(f"{resumed}/{table}")
            .drop("bucket")
            .toPandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        b = (
            spark.read.parquet(f"{oneshot}/{table}")
            .drop("bucket")
            .toPandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    # lineage covers all buckets exactly once, totals match input
    lin = spark.read.parquet(f"{resumed}/lineage.parquet").toPandas()
    assert sorted(lin.bucket.tolist()) == sorted(set(lin.bucket.tolist()))
    assert lin.n_input.sum() == 2000
    assert (lin.n_kept + lin.n_dropped == lin.n_input).all()

    # metrics side tables were finalized
    hist = spark.read.parquet(f"{resumed}/metrics_drop_reasons.parquet").toPandas()
    assert hist.n.sum() > 0


def test_process_increment(spark, tmp_path, clips_ready):
    """Snapshot-diff: first 1500 clips processed, then the full 2000-row
    snapshot arrives -> only the 500 new ones are scored and appended."""
    from pyspark.sql import functions as F

    from qcflow.checkpoint import process_increment, run_resumable

    out = str(tmp_path / "incr")
    v1 = str(tmp_path / "clips_v1")
    clips = spark.read.parquet(CLIPS)
    clips.filter(F.col("clip_id") < "clip-000000001500").write.parquet(v1)

    r1 = run_resumable(spark, v1, out, n_buckets=N_BUCKETS)
    assert r1["remaining"] == 0
    n1 = spark.read.parquet(f"{out}/kept.parquet").count() + spark.read.parquet(
        f"{out}/dropped.parquet"
    ).count()
    assert n1 == 1500

    r2 = process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    assert r2["n_new"] == 500
    kept = spark.read.parquet(f"{out}/kept.parquet")
    dropped = spark.read.parquet(f"{out}/dropped.parquet")
    assert kept.count() + dropped.count() == 2000
    # no clip scored twice
    ids = kept.select("clip_id").unionByName(dropped.select("clip_id")).toPandas()
    assert ids.clip_id.is_unique

    # idempotent: re-running the same snapshot adds nothing
    r3 = process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    assert r3["n_new"] == 0
