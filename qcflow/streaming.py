"""Structured Streaming ingest for the QC pipeline.

The reference has no streams (SURVEY §2.7) and the batch engine's resume
is snapshot-based; this module is the engine addition for continuous
ingest: new clip parquet files landing in a directory are scored
incrementally with exactly-once sinks.

Semantics notes:
- Thresholds CANNOT be percentile-derived inside an unbounded stream
  (a global quantile over future data is undefined) — they come from a
  calibration batch / saved config (qcflow.checkpoint.load_thresholds),
  exactly how the batch resume path freezes them across attempts.
- foreachBatch is at-least-once; effectively-once comes from batch_id-
  partitioned dynamic-overwrite writes (a retried batch replaces its own
  partition) on top of checkpointLocation's source-progress tracking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from qcflow.features import clip_features
from qcflow.pipeline import DROP_COLS, KEEP_COLS, N_BUCKETS, bucket_col
from qcflow.rules import Thresholds, apply_rules
from qcflow.schema import CLIPS_SCHEMA
from qcflow.scrub import scrub
from qcflow.udfs import with_langid_ppl


def stream_score(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    thresholds: Thresholds,
    n_buckets: int = N_BUCKETS,
    max_files_per_trigger: int = 8,
) -> StreamingQuery:
    """File-source stream -> QC score -> exactly-once parquet appends."""
    stream = (
        spark.readStream.schema(CLIPS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    scored = stream.drop("bytes").withColumn("bucket", bucket_col(n_buckets))
    scored = clip_features(scored)
    scored = with_langid_ppl(scored, spark)
    scored = scrub(apply_rules(scored, thresholds))

    def sink(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a failed/restarted batch re-runs
        # with the SAME batch_id. Writes are batch_id-partitioned with
        # dynamic partition overwrite, so a retry replaces its own
        # partition instead of appending duplicates -> effectively-once.
        spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch = batch.withColumn("batch_id", F.lit(batch_id)).persist()
        batch.filter(F.col("keep")).select("batch_id", *KEEP_COLS).repartition(
            "bucket"
        ).write.mode("overwrite").partitionBy("batch_id", "bucket").parquet(
            f"{out_dir}/kept.parquet"
        )
        batch.filter(~F.col("keep")).select("batch_id", *DROP_COLS).repartition(
            "bucket"
        ).write.mode("overwrite").partitionBy("batch_id", "bucket").parquet(
            f"{out_dir}/dropped.parquet"
        )
        (
            batch.groupBy("batch_id", "bucket")
            .agg(
                F.count("*").alias("n_input"),
                F.sum(F.col("keep").cast("long")).alias("n_kept"),
                F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
            )
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/lineage.parquet")
        )
        batch.unpersist()

    return (
        scored.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{out_dir}/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )


def windowed_drop_metrics(
    spark: SparkSession,
    input_dir: str,
    queryName: str = "qc_drop_metrics",
) -> StreamingQuery:
    """Event-time windowed drop metrics demo: watermark + tumbling window
    over an event-shaped stream (ts, lang, keep). Memory sink for tests."""
    schema = "ts timestamp, lang string, keep boolean"
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "lang")
        .agg(
            F.count("*").alias("n"),
            F.sum((~F.col("keep")).cast("long")).alias("n_dropped"),
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .trigger(availableNow=True)
        .start()
    )
