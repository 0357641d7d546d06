"""Checkpoint/resume/upsert semantics over the snapshot manifest:
kill-resume identity, crash-invisibility, incremental metrics,
MERGE-shaped bucket replace, zero-row buckets, vacuum."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qcflow.checkpoint import (
    completed_buckets,
    finalize_metrics,
    merge_replace_buckets,
    process_increment,
    read_committed,
    read_metrics,
    run_resumable,
    vacuum,
)
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


def _pdf(df, drop=("bucket", "snapshot_id")):
    cols = [c for c in df.columns if c not in drop]
    out = df.select(*cols).toPandas().sort_values("clip_id").reset_index(drop=True)
    return out[sorted(out.columns)]


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

    for table in ["kept", "dropped"]:
        a = _pdf(read_committed(spark, resumed, table))
        b = _pdf(spark.read.parquet(f"{oneshot}/{table}.parquet"))
        pd.testing.assert_frame_equal(a, b)

    # lineage covers all buckets exactly once, totals match input
    lin = spark.read.parquet(f"{resumed}/lineage.parquet").toPandas()
    assert sorted(lin.bucket.tolist()) == sorted(set(lin.bucket.tolist()))
    assert lin.n_input.sum() == 2000
    assert (lin.n_kept + lin.n_dropped == lin.n_input).all()

    # metrics side tables were finalized and equal the one-shot's — all
    # THREE tables, since finalize_metrics computes them driver-side
    # (pandas twins of the Spark aggregations must stay row-identical)
    hist = spark.read.parquet(f"{resumed}/metrics_drop_reasons.parquet").toPandas()
    assert hist.n.sum() > 0
    for table, key in [
        ("metrics_drop_reasons", ["lang", "drop_reason"]),
        ("metrics_lang_conf", ["lang", "conf_bin"]),
        ("metrics_quantiles", ["lang"]),
    ]:
        a = spark.read.parquet(f"{resumed}/{table}.parquet").toPandas()
        b = spark.read.parquet(f"{oneshot}/{table}.parquet").toPandas()
        cols = key + [c for c in sorted(b.columns) if c not in key]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True)[cols],
            b.sort_values(key).reset_index(drop=True)[cols],
            check_dtype=False,
        )


def test_crashed_attempt_rows_are_invisible(spark, tmp_path, clips_ready):
    """Rows appended by an attempt that never reached its lineage commit
    must not appear in the committed view, and a resume must land the
    identical final state (ADVICE r1: crash between kept/dropped append
    and lineage append). The dead rows carry the snapshot id a REAL crash
    leaves behind — allocated through the counter, so the resume must
    prove it never reuses it (an id derived from committed lineage alone
    would collide and resurrect these rows)."""
    from qcflow.checkpoint import next_snapshot_id

    out = str(tmp_path / "crashy")
    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS, max_buckets=4)

    # simulate a crash: the attempt allocates its snapshot id, appends
    # kept rows, and dies before the lineage commit
    burned = next_snapshot_id(spark, out)
    kept = spark.read.parquet(f"{out}/kept.parquet")
    dead = kept.limit(50).withColumn("snapshot_id", F.lit(burned).cast("long"))
    dead.write.mode("append").partitionBy("bucket").parquet(f"{out}/kept.parquet")

    assert (
        read_committed(spark, out, "kept")
        .filter(F.col("snapshot_id") == burned)
        .count()
        == 0
    )

    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS)
    committed = read_committed(spark, out, "kept")
    # committed view has no duplicates even though dead rows exist on disk
    n_raw = spark.read.parquet(f"{out}/kept.parquet").count()
    ids = committed.select("clip_id").toPandas().clip_id
    assert ids.is_unique
    assert n_raw == len(ids) + 50


def test_process_increment(spark, tmp_path, clips_ready):
    """Snapshot-diff: first 1500 clips processed, then the full 2000-row
    snapshot arrives -> only the 500 new ones are scored and appended;
    metrics merge across increments without rescanning history."""
    out = str(tmp_path / "incr")
    v1 = str(tmp_path / "clips_v1")
    clips = spark.read.parquet(CLIPS)
    clips.filter(F.col("clip_id") < "clip-000000001500").write.parquet(v1)

    r1 = run_resumable(spark, v1, out, n_buckets=N_BUCKETS)
    assert r1["remaining"] == 0
    n1 = read_committed(spark, out, "kept").count() + read_committed(
        spark, out, "dropped"
    ).count()
    assert n1 == 1500

    r2 = process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    assert r2["n_new"] == 500
    kept = read_committed(spark, out, "kept")
    dropped = read_committed(spark, out, "dropped")
    assert kept.count() + dropped.count() == 2000
    # no clip scored twice
    ids = kept.select("clip_id").unionByName(dropped.select("clip_id")).toPandas()
    assert ids.clip_id.is_unique

    # idempotent: re-running the same snapshot adds nothing
    r3 = process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    assert r3["n_new"] == 0

    # metrics across both increments equal a from-scratch recompute ...
    merged = read_metrics(spark, out, "drop_reasons").toPandas()
    scratch = (
        dropped.select("lang", F.explode(F.split("drop_reasons", ",")).alias("drop_reason"))
        .groupBy("lang", "drop_reason")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    key = ["lang", "drop_reason"]
    pd.testing.assert_frame_equal(
        merged.sort_values(key).reset_index(drop=True),
        scratch.sort_values(key).reset_index(drop=True),
    )
    # ... and the merge plan never scans the kept/dropped history
    plan = read_metrics(spark, out, "drop_reasons")._jdf.queryExecution().toString()
    assert "kept.parquet" not in plan and "dropped.parquet" not in plan


def test_merge_replace_buckets_upserts(spark, tmp_path, clips_ready):
    """MERGE-shaped upsert: re-processing a bucket from corrected input
    REPLACES its committed rows instead of duplicating them."""
    out = str(tmp_path / "merge")
    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS)
    before = read_committed(spark, out, "kept")
    total_before = before.count() + read_committed(spark, out, "dropped").count()

    bucket = int(before.select("bucket").first()["bucket"])
    n_bucket = (
        before.filter(F.col("bucket") == bucket).count()
        + read_committed(spark, out, "dropped").filter(F.col("bucket") == bucket).count()
    )

    # corrected input: same clips, transcripts upper-cased for the bucket
    fixed = str(tmp_path / "clips_fixed")
    spark.read.parquet(CLIPS).withColumn(
        "transcript", F.upper("transcript")
    ).write.parquet(fixed)
    r = merge_replace_buckets(spark, fixed, out, [bucket], n_buckets=N_BUCKETS)
    assert r["replaced_buckets"] == 1

    kept = read_committed(spark, out, "kept")
    dropped = read_committed(spark, out, "dropped")
    assert kept.count() + dropped.count() == total_before  # replaced, not duplicated
    assert (
        kept.filter(F.col("bucket") == bucket).count()
        + dropped.filter(F.col("bucket") == bucket).count()
        == n_bucket
    )
    ids = kept.select("clip_id").unionByName(dropped.select("clip_id")).toPandas()
    assert ids.clip_id.is_unique
    # the replacement actually took effect: scrubbed transcripts upper-cased
    sample = kept.filter(F.col("bucket") == bucket).select("scrubbed_transcript").first()
    if sample is not None:
        assert sample[0] == sample[0].upper()


def test_zero_row_buckets_commit(spark, tmp_path, clips_ready):
    """Sparse input (20 rows over 64 buckets): empty buckets still get
    lineage rows, so the second invocation is the documented no-op
    (ADVICE r1)."""
    out = str(tmp_path / "sparse")
    v = str(tmp_path / "clips_sparse")
    spark.read.parquet(CLIPS).limit(20).write.parquet(v)
    r1 = run_resumable(spark, v, out, n_buckets=64)
    assert r1["remaining"] == 0
    assert len(completed_buckets(spark, out)) == 64
    r2 = run_resumable(spark, v, out, n_buckets=64)
    assert r2["processed_buckets"] == 0


def test_vacuum_drops_dead_rows(spark, tmp_path, clips_ready):
    out = str(tmp_path / "vac")
    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS)
    # superseded snapshots: replace one bucket, creating dead history
    bucket = int(spark.read.parquet(f"{out}/kept.parquet").first()["bucket"])
    merge_replace_buckets(spark, CLIPS, out, [bucket], n_buckets=N_BUCKETS)
    kept = spark.read.parquet(f"{out}/kept.parquet")
    dead = kept.limit(30).withColumn("snapshot_id", F.lit(777).cast("long"))
    dead.write.mode("append").partitionBy("bucket").parquet(f"{out}/kept.parquet")

    before = _pdf(read_committed(spark, out, "kept"))
    metrics_before = read_metrics(spark, out, "drop_reasons").toPandas()
    vacuum(spark, out)
    raw = spark.read.parquet(f"{out}/kept.parquet")
    assert raw.filter(F.col("snapshot_id") == 777).count() == 0
    after = _pdf(read_committed(spark, out, "kept"))
    pd.testing.assert_frame_equal(before, after)
    # manifest + partials expired to the committed view: no dead slices
    lin = spark.read.parquet(f"{out}/lineage.parquet").toPandas()
    assert len(lin) == len(lin[["snapshot_id", "bucket"]].drop_duplicates())
    assert (
        lin.groupby("bucket").size().max() == 1
    ), "superseded lineage rows survived vacuum"
    metrics_after = read_metrics(spark, out, "drop_reasons").toPandas()
    key = ["lang", "drop_reason"]
    pd.testing.assert_frame_equal(
        metrics_before.sort_values(key).reset_index(drop=True),
        metrics_after.sort_values(key).reset_index(drop=True),
    )
    finalize_metrics(spark, out)  # still works post-compaction


def test_time_travel_read_as_of(spark, tmp_path, clips_ready):
    """read_as_of(S): later appends invisible, later replaces undone —
    the Iceberg snapshot-as-of contract over the parquet manifest."""
    from qcflow.checkpoint import read_as_of, valid_pairs

    out = str(tmp_path / "tt")
    v1 = str(tmp_path / "tt_clips_v1")
    clips = spark.read.parquet(CLIPS)
    clips.filter(F.col("clip_id") < "clip-000000001500").write.parquet(v1)

    run_resumable(spark, v1, out, n_buckets=N_BUCKETS)
    s1 = int(
        valid_pairs(spark, out).agg(F.max("snapshot_id")).collect()[0][0]
    )
    ids_s1 = sorted(
        r["clip_id"]
        for t in ("kept", "dropped")
        for r in read_committed(spark, out, t).select("clip_id").collect()
    )
    assert len(ids_s1) == 1500

    # append an increment, then replace one bucket with altered rows
    process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    bucket = 3
    fixed = str(tmp_path / "tt_fixed")
    clips.withColumn(
        "transcript", F.concat(F.lit("edited "), F.col("transcript"))
    ).write.parquet(fixed)
    merge_replace_buckets(spark, fixed, out, [bucket], n_buckets=N_BUCKETS)

    # current view: 2000 unique rows incl. the replaced bucket
    now_ids = sorted(
        r["clip_id"]
        for t in ("kept", "dropped")
        for r in read_committed(spark, out, t).select("clip_id").collect()
    )
    assert len(now_ids) == 2000

    # as-of s1: exactly the first 1500 rows, later append + replace gone
    tt_ids = sorted(
        r["clip_id"]
        for t in ("kept", "dropped")
        for r in read_as_of(spark, out, t, s1).select("clip_id").collect()
    )
    assert tt_ids == ids_s1

    # as-of the latest snapshot == the committed view
    s_latest = int(
        valid_pairs(spark, out).agg(F.max("snapshot_id")).collect()[0][0]
    )
    latest_ids = sorted(
        r["clip_id"]
        for t in ("kept", "dropped")
        for r in read_as_of(spark, out, t, s_latest).select("clip_id").collect()
    )
    assert latest_ids == now_ids


def test_quantile_metrics_survive_increments(spark, tmp_path, clips_ready):
    """Per-lang p50/p99 sketches (perplexity log-bins + conf bins) merge
    across >=2 committed snapshots exactly: the partial-histogram merge
    is lossless, so the incremental view equals a single-shot recompute
    over the full input — and the read plan never scans the kept/dropped
    history."""
    from qcflow.checkpoint import load_thresholds, read_quantile_metrics
    from qcflow.summary import conf_bin_col, hist_quantiles, ppl_bin_col, ppl_bin_upper

    out = str(tmp_path / "qtiles")
    v1 = str(tmp_path / "q_clips_v1")
    clips = spark.read.parquet(CLIPS)
    clips.filter(F.col("clip_id") < "clip-000000001500").write.parquet(v1)
    run_resumable(spark, v1, out, n_buckets=N_BUCKETS)
    process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)

    merged = read_quantile_metrics(spark, out).toPandas()
    assert len(merged) > 0

    # single-shot truth: same thresholds, full input, same sketch
    res = score_clips(
        spark, clips, thresholds=load_thresholds(out), n_buckets=N_BUCKETS
    )
    scored = res.scored
    truth_ppl = hist_quantiles(
        scored.groupBy("lang", ppl_bin_col().alias("ppl_bin")).agg(
            F.count("*").alias("n")
        ),
        ["lang"],
        [50, 99],
        bin_col="ppl_bin",
    ).select(
        "lang",
        ppl_bin_upper(F.col("p50_bin")).alias("ppl_p50"),
        ppl_bin_upper(F.col("p99_bin")).alias("ppl_p99"),
    ).toPandas()
    truth_conf = hist_quantiles(
        scored.groupBy("lang", conf_bin_col().alias("conf_bin")).agg(
            F.count("*").alias("n")
        ),
        ["lang"],
        [50, 99],
        bin_col="conf_bin",
    ).toPandas()
    res.release()

    m = merged.sort_values("lang").reset_index(drop=True)
    tp = truth_ppl.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(m[["lang", "ppl_p50", "ppl_p99"]], tp)
    from qcflow.summary import CONF_BINS

    tc = truth_conf.sort_values("lang").reset_index(drop=True)
    assert (m["conf_p50"].to_numpy() == ((tc["p50_bin"] + 1) / CONF_BINS).to_numpy()).all()
    assert (m["conf_p99"].to_numpy() == ((tc["p99_bin"] + 1) / CONF_BINS).to_numpy()).all()

    plan = read_quantile_metrics(spark, out)._jdf.queryExecution().toString()
    assert "kept.parquet" not in plan and "dropped.parquet" not in plan


def test_read_committed_missing_table_is_empty(spark, tmp_path, clips_ready):
    """A committed manifest whose table was never materialized (e.g. a
    corpus where nothing is dropped: the empty append leaves no data
    files) must read as an EMPTY committed view with the documented
    schema, not raise UNABLE_TO_INFER_SCHEMA (ADVICE r2)."""
    import shutil

    from qcflow.checkpoint import read_as_of

    out = str(tmp_path / "notables")
    v = str(tmp_path / "clips_few")
    spark.read.parquet(CLIPS).limit(30).write.parquet(v)
    run_resumable(spark, v, out, n_buckets=8)
    shutil.rmtree(f"{out}/dropped.parquet")

    empty = read_committed(spark, out, "dropped")
    assert empty.count() == 0
    assert set(empty.columns) == {
        "clip_id", "bucket", "lang", "lang_conf", "drop_reasons", "snapshot_id",
    }
    assert read_as_of(spark, out, "dropped", 0).count() == 0
    # kept view unaffected
    assert read_committed(spark, out, "kept").count() > 0


def test_driver_side_manifest_equals_spark_view(spark, tmp_path, clips_ready):
    """completed_buckets/next_snapshot_id read the manifest via pyarrow
    on the driver (r4 fixed-cost fix); their cutoff semantics must equal
    the Spark valid_pairs view through an append + replace history."""
    from qcflow.checkpoint import next_snapshot_id, valid_pairs

    out = str(tmp_path / "pdman")
    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS)
    merge_replace_buckets(spark, CLIPS, out, [2, 5], n_buckets=N_BUCKETS)

    vp = valid_pairs(spark, out)
    spark_buckets = sorted(
        r["bucket"] for r in vp.select("bucket").distinct().collect()
    )
    assert completed_buckets(spark, out) == spark_buckets
    max_snap = int(vp.agg(F.max("snapshot_id")).collect()[0][0])
    # the counter allocates strictly past everything ever written
    assert next_snapshot_id(spark, out) > max_snap


def test_legacy_partials_layout_reads_and_migrates(spark, tmp_path, clips_ready):
    """A pre-r4 out_dir stores metric partials as three per-grain tables.
    Readers must union legacy + unified (an upgraded directory holds old
    history AND new-format increments), and vacuum must migrate
    everything into the unified table."""
    import os
    import shutil

    out = str(tmp_path / "legacy")
    v1 = str(tmp_path / "legacy_v1")
    clips = spark.read.parquet(CLIPS)
    clips.filter(F.col("clip_id") < "clip-000000001500").write.parquet(v1)
    run_resumable(spark, v1, out, n_buckets=N_BUCKETS)

    # rewrite the unified partials into the PRE-r4 three-table layout
    uni = spark.read.parquet(f"{out}/metrics_partials.parquet").localCheckpoint(
        eager=True
    )
    uni.filter("kind = 'drop_reasons'").select(
        "snapshot_id", "bucket", "lang", "drop_reason", "n"
    ).write.parquet(f"{out}/metrics_drop_reasons_partials.parquet")
    uni.filter("kind = 'lang_conf'").select(
        "snapshot_id", "bucket", "lang", F.col("bin").alias("conf_bin"), "n"
    ).write.parquet(f"{out}/metrics_lang_conf_partials.parquet")
    uni.filter("kind = 'ppl_hist'").select(
        "snapshot_id", "bucket", "lang", F.col("bin").alias("ppl_bin"), "n"
    ).write.parquet(f"{out}/metrics_ppl_hist_partials.parquet")
    shutil.rmtree(f"{out}/metrics_partials.parquet")

    # an increment under the NEW code appends unified-format partials;
    # the merged view must cover old (legacy) + new (unified) history
    process_increment(spark, CLIPS, out, n_buckets=N_BUCKETS)
    dropped = read_committed(spark, out, "dropped")
    scratch = (
        dropped.select(
            "lang", F.explode(F.split("drop_reasons", ",")).alias("drop_reason")
        )
        .groupBy("lang", "drop_reason")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    merged = read_metrics(spark, out, "drop_reasons").toPandas()
    key = ["lang", "drop_reason"]
    pd.testing.assert_frame_equal(
        merged.sort_values(key).reset_index(drop=True),
        scratch.sort_values(key).reset_index(drop=True),
    )

    # vacuum migrates: legacy dirs gone, unified holds the whole view
    vacuum(spark, out)
    assert not os.path.exists(f"{out}/metrics_drop_reasons_partials.parquet")
    assert not os.path.exists(f"{out}/metrics_lang_conf_partials.parquet")
    assert not os.path.exists(f"{out}/metrics_ppl_hist_partials.parquet")
    after = read_metrics(spark, out, "drop_reasons").toPandas()
    pd.testing.assert_frame_equal(
        after.sort_values(key).reset_index(drop=True),
        scratch.sort_values(key).reset_index(drop=True),
    )


def test_staged_scores_exist_and_legacy_fallback(spark, tmp_path, clips_ready):
    """r5: the first attempt stages its threshold-pass scores; increments
    read them instead of re-running the langid UDF. A legacy out_dir
    (thresholds saved, no stage table) must still resume correctly via
    the re-score fallback, and both paths land the identical kept set."""
    import os
    import shutil

    staged_dir = str(tmp_path / "staged")
    run_resumable(spark, CLIPS, staged_dir, n_buckets=N_BUCKETS, max_buckets=6)
    assert os.path.exists(f"{staged_dir}/scores_stage.parquet")
    # staged table covers the FULL input (derivation pass), one row per clip
    staged = spark.read.parquet(f"{staged_dir}/scores_stage.parquet")
    assert staged.count() == 2000
    assert staged.select("clip_id").distinct().count() == 2000

    # legacy twin: same thresholds, stage table deleted before the resume
    legacy_dir = str(tmp_path / "legacy")
    run_resumable(spark, CLIPS, legacy_dir, n_buckets=N_BUCKETS, max_buckets=6)
    shutil.rmtree(f"{legacy_dir}/scores_stage.parquet")
    run_resumable(spark, CLIPS, legacy_dir, n_buckets=N_BUCKETS)

    run_resumable(spark, CLIPS, staged_dir, n_buckets=N_BUCKETS)
    for table in ["kept", "dropped"]:
        a = _pdf(read_committed(spark, staged_dir, table))
        b = _pdf(read_committed(spark, legacy_dir, table))
        pd.testing.assert_frame_equal(a, b)


def test_resume_with_byte_stages_matches_oneshot(spark, tmp_path, clips_ready):
    """r5: the staged-score resume path with check_pcm on (byte-derived
    columns joined onto the staged narrow frame) must equal the one-shot
    check_pcm pipeline row-for-row."""
    resumed = str(tmp_path / "resumed_pcm")
    oneshot = str(tmp_path / "oneshot_pcm")
    run_resumable(
        spark, CLIPS, resumed, n_buckets=N_BUCKETS, max_buckets=7, check_pcm=True
    )
    run_resumable(spark, CLIPS, resumed, n_buckets=N_BUCKETS, check_pcm=True)

    clips = spark.read.parquet(CLIPS)
    res = score_clips(spark, clips, n_buckets=N_BUCKETS, check_pcm=True)
    write_outputs(res, oneshot)
    res.release()
    for table in ["kept", "dropped"]:
        a = _pdf(read_committed(spark, resumed, table))
        b = _pdf(spark.read.parquet(f"{oneshot}/{table}.parquet"))
        pd.testing.assert_frame_equal(a, b)


def test_merge_replace_refreshes_stage(spark, tmp_path, clips_ready):
    """r5: replacing a bucket from a corrected input must refresh that
    bucket's STAGED scores too (dynamic partition overwrite), so the
    stage table never serves stale pre-correction rows, while other
    buckets' staged rows stay untouched."""
    from qcflow.checkpoint import merge_replace_buckets
    from qcflow.pipeline import bucket_col

    out = str(tmp_path / "replace_stage")
    run_resumable(spark, CLIPS, out, n_buckets=N_BUCKETS)

    corrected_path = str(tmp_path / "corrected.parquet")
    clips = spark.read.parquet(CLIPS)
    target = 3
    corrected = clips.withColumn(
        "transcript",
        F.when(
            F.pmod(F.xxhash64("clip_id"), F.lit(N_BUCKETS)).cast("int") == target,
            F.lit(""),  # corrected transcripts: now empty -> must drop
        ).otherwise(F.col("transcript")),
    )
    corrected.write.mode("overwrite").parquet(corrected_path)
    before = (
        spark.read.parquet(f"{out}/scores_stage.parquet")
        .filter(F.col("bucket") != target)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    merge_replace_buckets(spark, corrected_path, out, [target], n_buckets=N_BUCKETS)

    staged = spark.read.parquet(f"{out}/scores_stage.parquet")
    # replaced bucket's staged rows reflect the corrected (empty) transcripts
    tgt = staged.filter(F.col("bucket") == target).toPandas()
    assert len(tgt) > 0 and (tgt.n_chars == 0).all()
    # other buckets untouched
    after = (
        staged.filter(F.col("bucket") != target)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        before[sorted(before.columns)], after[sorted(after.columns)]
    )
    # and the committed view dropped every corrected clip
    dropped = read_committed(spark, out, "dropped").filter(
        F.col("bucket") == target
    )
    kept = read_committed(spark, out, "kept").filter(F.col("bucket") == target)
    assert kept.count() == 0
    assert dropped.filter(F.col("drop_reasons").contains("empty_transcript")).count() == dropped.count()
