"""Streaming ingest: incremental scoring equals batch scoring."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow.pipeline import score_clips
from qcflow.rules import Thresholds
from qcflow.streaming import (
    compact_stream_output,
    stateful_lang_monitor,
    stream_score,
    windowed_drop_metrics,
)

THR = Thresholds(repetition_lo=0.3, cps_lo=5.0, cps_hi=30.0, ppl_hi=50.0)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory, clips_t2k):
    src = clips_t2k
    d = tmp_path_factory.mktemp("stream_in")
    # land the clip table as multiple files (arrival batches)
    spark.read.parquet(src).repartition(6).write.mode("overwrite").parquet(str(d / "in"))
    return str(d / "in")


def test_stream_matches_batch(spark, stream_input, tmp_path):
    out = str(tmp_path / "out")
    q = stream_score(spark, stream_input, out, THR, max_files_per_trigger=2)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(f"{out}/kept.parquet")
        .select("clip_id", "lang", "scrubbed_transcript")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    batch = score_clips(
        spark, spark.read.parquet(stream_input), thresholds=THR
    )
    want = (
        batch.scored.filter(F.col("keep"))
        .select("clip_id", "lang", "scrubbed_transcript")
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    batch.release()
    pd.testing.assert_frame_equal(got, want)

    # multiple micro-batches actually happened (availableNow + 2 files/trigger)
    lin = spark.read.parquet(f"{out}/lineage.parquet").toPandas()
    assert lin.batch_id.nunique() >= 2
    assert lin.n_input.sum() == 2000


def test_stream_restart_is_exactly_once(spark, stream_input, tmp_path):
    out = str(tmp_path / "out2")
    q = stream_score(spark, stream_input, out, THR)
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/kept.parquet").count()
    # restart against the same checkpoint: no new files -> no duplicates
    q2 = stream_score(spark, stream_input, out, THR)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(f"{out}/kept.parquet").count()
    assert n1 == n2


def test_stream_dedup_within_watermark(spark, stream_input, tmp_path):
    """A duplicate-bearing stream (every clip delivered twice, in two
    separate arrival files) scores each clip exactly once when
    dedup_within is on."""
    src = str(tmp_path / "dup_in")
    clips = spark.read.parquet(stream_input).limit(300).withColumn(
        "ingest_ts", F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    )
    clips.coalesce(1).write.mode("overwrite").parquet(src)
    # redelivery 30s later, inside the 10-minute watermark
    clips.withColumn(
        "ingest_ts", F.to_timestamp(F.lit("2024-01-01 00:00:30"))
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "dedup_out")
    q = stream_score(spark, src, out, THR, dedup_within="10 minutes")
    q.awaitTermination(120)
    got = spark.read.parquet(f"{out}/kept.parquet").select("clip_id").unionByName(
        spark.read.parquet(f"{out}/dropped.parquet").select("clip_id")
    ).toPandas()
    assert len(got) == 300
    assert got.clip_id.is_unique


def test_compaction_bounds_files(spark, stream_input, tmp_path):
    """Many-trigger output folds into one compacted batch partition:
    file count drops, content identical, restart still exactly-once."""
    import glob

    out = str(tmp_path / "compact_out")
    q = stream_score(spark, stream_input, out, THR, max_files_per_trigger=1)
    q.awaitTermination(120)

    def files(table):
        return glob.glob(f"{out}/{table}.parquet/**/*.parquet", recursive=True)

    def content(table):
        return (
            spark.read.parquet(f"{out}/{table}.parquet")
            .drop("batch_id")
            .toPandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )

    lin = spark.read.parquet(f"{out}/lineage.parquet").toPandas()
    assert lin.batch_id.nunique() >= 3  # one trigger per file
    before_files = len(files("kept"))
    before = content("kept")

    compact_stream_output(spark, out)
    assert len(files("kept")) < before_files
    after = content("kept")
    pd.testing.assert_frame_equal(
        before[sorted(before.columns)], after[sorted(after.columns)]
    )
    # restart against the same checkpoint: no new files -> no duplicates
    q2 = stream_score(spark, stream_input, out, THR)
    q2.awaitTermination(120)
    assert spark.read.parquet(f"{out}/kept.parquet").count() == len(after)


def test_stateful_lang_monitor_accumulates(spark, tmp_path):
    """Two arrival files -> state carries per-lang totals across batches;
    the final emitted row per lang is the cumulative count."""
    src = str(tmp_path / "mon")
    pd.DataFrame({"lang": ["aru"] * 3 + ["bel"], "keep": [True, False, True, True]}).pipe(
        spark.createDataFrame
    ).coalesce(1).write.mode("overwrite").parquet(src)
    pd.DataFrame({"lang": ["aru"] * 2, "keep": [False, False]}).pipe(
        spark.createDataFrame
    ).coalesce(1).write.mode("append").parquet(src)

    q = stateful_lang_monitor(spark, src, queryName="qc_mon_test")
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM qc_mon_test").toPandas()
    # one file per trigger -> aru emits once per batch, proving the state
    # actually crossed micro-batches (not one big batch)
    assert (out.lang == "aru").sum() == 2
    last = out.groupby("lang").agg({"n_total": "max", "n_dropped_total": "max"})
    assert last.loc["aru", "n_total"] == 5
    assert last.loc["aru", "n_dropped_total"] == 3
    assert last.loc["bel", "n_total"] == 1
    assert last.loc["bel", "n_dropped_total"] == 0


def test_windowed_metrics(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:01", "2024-01-01 00:02", "2024-01-01 00:07"]
            ),
            "lang": ["aru", "aru", "bel"],
            "keep": [True, False, True],
        }
    )
    src = str(tmp_path / "ev")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    q = windowed_drop_metrics(spark, src, queryName="qc_win_test")
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM qc_win_test").toPandas()
    assert len(out) == 2  # two 5-minute windows
    aru = out[out.lang == "aru"].iloc[0]
    assert aru.n == 2 and aru.n_dropped == 1


def test_stream_acoustic_rules_drop_planted(spark, tmp_path):
    """check_acoustics on the stream: planted acoustic defects from the
    audio_q fixture are dropped with the right reasons, clean rows kept
    (thresholds frozen wide so only acoustic rules can fire)."""
    from qcflow.parity.audio_q import _FIX, _materialize

    _materialize()
    src = str(tmp_path / "in")
    (
        spark.read.parquet(_FIX)
        .withColumn("sr_hz", F.col("sr_hz").cast("int"))  # pandas wrote int64
        .withColumn("dur_ms", F.lit(1000))
        .withColumn("transcript", F.lit("plain normal words spoken here"))
        .select("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript")
        .repartition(3)
        .write.mode("overwrite")
        .parquet(src)
    )
    out = str(tmp_path / "out")
    wide = Thresholds(repetition_lo=0.0, cps_lo=0.0, cps_hi=1e9, ppl_hi=1e9)
    q = stream_score(spark, src, out, wide, check_acoustics=True)
    q.awaitTermination()
    dropped = spark.read.parquet(f"{out}/dropped.parquet").toPandas()
    kept = spark.read.parquet(f"{out}/kept.parquet").toPandas()
    truth = pd.read_parquet(_FIX, columns=["clip_id", "planted"])
    planted_bad = set(
        truth[
            truth.planted.isin(
                ["clipped_audio", "silent_audio", "dc_offset", "noisy_audio"]
            )
        ]["clip_id"]
    )
    # the fixture's undecodable rows split NULL-bytes (valid codec, never
    # flags) / unknown codec 'opus' (base unknown_codec rule fires)
    opus = set(
        cid
        for cid in truth[truth.planted == "no_bytes"]["clip_id"]
        if (int(cid.split("-")[1]) // 8) % 2 == 1
    )
    assert set(dropped["clip_id"]) == planted_bad | opus
    assert len(kept) + len(dropped) == len(truth)
    for reason in ("clipped_audio", "silent_audio", "dc_offset", "noisy_audio"):
        want = set(truth[truth.planted == reason]["clip_id"])
        got = set(dropped[dropped.drop_reasons.str.contains(reason)]["clip_id"])
        assert got == want, reason


def test_partial_batch_crash_is_exactly_once(spark, stream_input, tmp_path):
    """Crash INSIDE the at-least-once window (VERDICT r2 #6): the batch's
    kept/dropped partitions are already appended but the lineage write and
    the checkpoint offset commit never happen. The restart must re-run
    that batch under the SAME batch_id, and the batch_id-partitioned
    dynamic overwrite must swallow the orphaned partial — no duplicates,
    no loss."""
    out = str(tmp_path / "crash_out")
    q = stream_score(
        spark, stream_input, out, THR, max_files_per_trigger=2,
        _inject_fail_batch=1,
    )
    with pytest.raises(Exception):
        q.awaitTermination(120)

    # the crash landed in the window: data exists for a batch_id that the
    # lineage table does not know about
    data_batches = set(
        spark.read.parquet(f"{out}/kept.parquet")
        .select("batch_id").distinct().toPandas().batch_id
    ) | set(
        spark.read.parquet(f"{out}/dropped.parquet")
        .select("batch_id").distinct().toPandas().batch_id
    )
    lin_batches = set(
        spark.read.parquet(f"{out}/lineage.parquet")
        .select("batch_id").distinct().toPandas().batch_id
    )
    assert 1 in data_batches and 1 not in lin_batches

    # restart without the fault: finishes the stream exactly-once
    q2 = stream_score(spark, stream_input, out, THR, max_files_per_trigger=2)
    q2.awaitTermination(120)

    kept = spark.read.parquet(f"{out}/kept.parquet")
    dropped = spark.read.parquet(f"{out}/dropped.parquet")
    ids = kept.select("clip_id").unionByName(dropped.select("clip_id")).toPandas()
    n_in = spark.read.parquet(stream_input).count()
    assert ids.clip_id.is_unique, "partial batch rows were duplicated"
    assert len(ids) == n_in, "rows lost across the crash/restart"
    lin = spark.read.parquet(f"{out}/lineage.parquet").toPandas()
    assert lin.n_input.sum() == n_in
    assert (
        lin.groupby(["batch_id", "bucket"]).size().max() == 1
    ), "lineage bookkeeping duplicated"
