"""End-to-end QC pipeline composition (the north-rule flagship).

Stages (lazy; one physical pass over the data per output, with the scored
frame persisted once — the single most important physical decision when
~5 downstream aggregates share it, SURVEY §4):

  read clips
    -> explicit clip_id-hash bucketing (the unit of parallelism & resume)
    -> optional acoustic features     [ONE decode Arrow crossing]
    -> optional PCM consistency       [byte-length column expressions]
    -> transcript features            [column expressions, codegen]
    -> langid + perplexity            [ONE Arrow crossing]
    -> thresholds (derived once, globally — exact or sketch)
    -> rule engine -> keep / drop_reasons
    -> scrub                          [regexp_replace chain]
  outputs: kept / dropped parquet (bucket-partitioned), metrics side
  tables (drop-reason histogram, langid-confidence histogram), lineage
  rows per bucket (input/kept/dropped counts) — the resume manifest.

Scale notes: `bytes` is pruned out of every path unless a bytes-reading
stage (PCM consistency or acoustic features) is on — verify with
.explain: ReadSchema excludes it; decode-crossing variants stage through
parquet instead of persist (measured 5x). Buckets are
pmod(xxhash64(clip_id), n_buckets) — stable across cluster sizes, so
lineage and resume are parallelism-independent. Skewed language buckets
only matter to the metrics aggregates, whose keys include lang; the salt
is the bucket id already present in the group key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.features import clip_features, pcm_consistency
from qcflow.rules import (
    Thresholds,
    acoustic_rule_conditions,
    apply_rules,
    derive_thresholds,
)
from qcflow.scrub import scrub
from qcflow.udfs import with_langid_ppl

N_BUCKETS = 64


@dataclass
class QcResult:
    scored: DataFrame  # full frame: features + lang + rules + scrub
    thresholds: Thresholds
    _cached: DataFrame | None = None  # the internal persisted frame
    _stage_dir: str | None = None  # parquet staging dir (decode path)
    _stage_cached: DataFrame | None = None  # persisted decode frame (slim path)

    def release(self) -> None:
        """Free the materialization backing ``scored`` (cache or staging
        files). ``scored`` itself is derived, so unpersisting it directly
        would be a silent no-op."""
        if self._cached is not None:
            self._cached.unpersist()
        if self._stage_cached is not None:
            self._stage_cached.unpersist()
        if self._stage_dir is not None:
            import shutil

            shutil.rmtree(self._stage_dir, ignore_errors=True)


def bucket_col(n_buckets: int = N_BUCKETS):
    return F.pmod(F.xxhash64("clip_id"), F.lit(n_buckets)).cast("int")


def score_clips(
    spark: SparkSession,
    clips: DataFrame,
    exact_thresholds: bool = True,
    check_pcm: bool = False,
    check_acoustics: bool = False,
    n_buckets: int = N_BUCKETS,
    thresholds: Thresholds | None = None,
    slim_stage: bool = True,
    stage_mode: str = "parquet",
    persist_scored: bool = True,
) -> QcResult:
    """Run features + models + rules + scrub; returns the scored frame
    (persisted) and the derived thresholds. ``check_acoustics`` adds the
    decoded-PCM feature stage (clip/silence/DC rules) — one extra Arrow
    crossing that reads the bytes column.

    ``slim_stage`` (acoustic path): stage only (clip_id, decode-derived
    columns) to parquet and hash-join them back onto the narrow
    text/model frame, instead of staging the FULL scored frame through
    the (shared, variance-prone) vdisk. The decode output is 8 doubles a
    row vs the full frame's transcripts + every feature — the staging
    write that dominated the acoustic stage's 309-1702 clips/s spread
    shrinks ~20x (A/B measured in one session, BENCH/BASELINE.md)."""
    if check_acoustics and not check_pcm and slim_stage:
        from qcflow.udfs import AUDIO_FEATURE_COLS, with_audio_features

        import tempfile

        # decode pass: bytes never leave the scan stage; only the derived
        # acoustic columns are staged
        dec = with_audio_features(
            clips.select("clip_id", "bytes", "codec", "sr_hz")
        ).select("clip_id", *AUDIO_FEATURE_COLS)
        stage_dir = None
        stage_cached = None
        if stage_mode == "persist":
            # ~80 B/row (clip_id + 8 doubles) in MEMORY_AND_DISK instead
            # of a parquet roundtrip. Measured a WASH vs parquet staging
            # (best-of-3 interleaved: parquet 10.3s vs persist 11.2s at
            # 60k clips, BENCH/ab_stage_persist.json): the slim staging
            # write is ~5 MB, so the stage is bounded by the decode
            # crossing itself, not the staging medium. parquet stays the
            # default (no lineage-recompute risk on executor loss, no
            # extra materializing job); this mode exists for
            # memory-rich clusters that want zero staging files.
            from pyspark import StorageLevel

            dec = dec.persist(StorageLevel.MEMORY_AND_DISK)
            dec.count()  # materialize: exactly one decode crossing
            dec_r = dec
            stage_cached = dec
        else:
            stage_dir = tempfile.mkdtemp(prefix="qcflow_stage_")
            dec.write.mode("overwrite").parquet(f"{stage_dir}/acoustic.parquet")
            dec_r = spark.read.parquet(f"{stage_dir}/acoustic.parquet")

        narrow = clips.drop("bytes").withColumn("bucket", bucket_col(n_buckets))
        # same narrow-frame de-fragmentation as the main path below
        narrow = narrow.coalesce(
            max(2 * spark.sparkContext.defaultParallelism, 1)
        )
        narrow = with_langid_ppl(clip_features(narrow), spark)
        df = narrow.join(dec_r, "clip_id")
        # the joined frame feeds threshold derivation AND the rule pass —
        # persist it (narrow columns only; the expensive decode is
        # already materialized in the staging table/cache)
        df = cached = df.persist()
        thr = thresholds or derive_thresholds(df, exact=exact_thresholds)
        flagged = scrub(
            apply_rules(df, thr, extra_rules=list(acoustic_rule_conditions()))
        )
        return QcResult(
            scored=flagged,
            thresholds=thr,
            _cached=cached,
            _stage_dir=stage_dir,
            _stage_cached=stage_cached,
        )
    df = clips.withColumn("bucket", bucket_col(n_buckets))
    if check_acoustics:
        # decode crossing while bytes are still in the plan
        from qcflow.udfs import with_audio_features

        df = with_audio_features(df)
    if check_pcm:
        # the consistency columns derive from byte LENGTHS only; drop the
        # payload right after so the persist/shuffles stay narrow
        df = pcm_consistency(df).drop("bytes")
    else:
        # Binary column discipline: never carry `bytes` past the scan.
        df = df.drop("bytes")
    # the payload-sized scan splits (files.maxPartitionBytes is tuned to
    # the BYTES column) over-fragment this narrow frame — merge to
    # ~2x cores without a shuffle so the persisted frame and every
    # downstream action run data-sized tasks, not one per 32 MB of
    # (pruned-away) audio payload. No-op when upstream is already
    # narrower; scales with cluster parallelism, not a constant.
    df = df.coalesce(max(2 * spark.sparkContext.defaultParallelism, 1))
    df = clip_features(df)
    df = with_langid_ppl(df, spark)
    # The UDF output feeds both threshold derivation and the rule pass, so
    # it must be materialized once, not recomputed per downstream action.
    # Narrow path: persist (in-memory columnar, cheap). Decode path: a
    # parquet staging table — persist on a plan whose scan stage carries
    # the audio bytes measured 5x slower than staging (cache-build GC
    # churn); at 10^12 rows the staged frame is the Iceberg intermediate
    # table anyway.
    cached = None
    stage_dir = None
    if check_pcm or check_acoustics:
        import tempfile

        stage_dir = tempfile.mkdtemp(prefix="qcflow_stage_")
        df.write.mode("overwrite").parquet(f"{stage_dir}/scored.parquet")
        df = spark.read.parquet(f"{stage_dir}/scored.parquet")
    elif persist_scored or thresholds is None:
        # persist_scored=False is the checkpoint path's hint that IT will
        # materialize the frame exactly once (the bucket-staged persist
        # in _write_attempt) — double caching cost ~0.4 s/increment.
        # Deriving thresholds always forces the persist: the derive
        # action would otherwise recompute the UDF chain downstream.
        df = cached = df.persist()
    thr = thresholds or derive_thresholds(df, exact=exact_thresholds)
    extra = []
    if check_pcm:
        extra.append(("pcm_inconsistent", F.col("pcm_inconsistent")))
    if check_acoustics:
        extra.extend(acoustic_rule_conditions())
    flagged = apply_rules(df, thr, extra_rules=extra)
    flagged = scrub(flagged)
    return QcResult(
        scored=flagged, thresholds=thr, _cached=cached, _stage_dir=stage_dir
    )


KEEP_COLS = [
    "clip_id",
    "bucket",
    "sr_hz",
    "dur_ms",
    "codec",
    "lang",
    "lang_conf",
    "perplexity",
    "scrubbed_transcript",
]
DROP_COLS = ["clip_id", "bucket", "lang", "lang_conf", "drop_reasons"]


def write_outputs(res: QcResult, out_dir: str, mode: str = "overwrite") -> dict:
    """Materialize kept/dropped/metrics/lineage. Returns counts.

    Writes cluster rows by bucket (rebalance hint) so each bucket
    directory gets contiguous, data-sized files instead of one per
    upstream task (tasks x buckets tiny files is the classic
    partitioned-write mistake at scale); oversized buckets may split
    into several files, which is the correct at-scale behavior.

    The one-shot output uses the SAME manifest schema as the resumable
    path (snapshot_id=0 everywhere, lineage kind='append'), so
    qcflow.checkpoint readers — read_committed, resume, vacuum,
    process_increment — work on a plain-run directory instead of
    crashing on missing columns.

    Fixed-cost shape (r6, the _write_attempt/r5-resume lesson applied to
    the one-shot): exactly THREE Spark jobs — kept write, dropped write,
    and ONE collect of the grouping-sets grains frame (both metric
    grains + lineage counts in one shuffle, dimension-sized at any
    corpus size). Partials, lineage and the three final metrics tables
    are split/merged in pandas (checkpoint's kernels — row-identical to
    the Spark aggregations, pinned by tests) and written driver-side via
    pyarrow: the previous five pooled dimension-sized Spark writes were
    latency-bound job overhead, ~2-3x the scoring cost at bench scale."""
    import pandas as pd

    from concurrent.futures import ThreadPoolExecutor

    from qcflow.checkpoint import (
        _LINEAGE_PA_SCHEMA,
        _PARTIALS_PA_SCHEMA,
        _PARTIALS_SPEC,
        _append_parquet_file,
        _split_grains_pandas,
        finalize_metrics,
    )
    from qcflow.summary import grains_frame

    scored = res.scored
    spark = scored.sparkSession
    snap = F.lit(0).cast("long").alias("snapshot_id")
    kept = scored.filter(F.col("keep")).select(*KEEP_COLS, snap)
    dropped = scored.filter(~F.col("keep")).select(*DROP_COLS, snap)

    def _kept_write():
        # rebalance (not repartition): still clusters rows by bucket so
        # each directory gets contiguous writers, but AQE sizes the task
        # count to the DATA (guide: REBALANCE before partitioned writes)
        # — a fixed spark.sql.shuffle.partitions fan-out made every
        # dimension-sized write pay ~64 near-empty reduce tasks, and at
        # scale it caps writer parallelism; oversized buckets may split
        # into several files per directory, which is the correct
        # at-scale behavior
        kept.hint("rebalance", "bucket").write.mode(mode).partitionBy(
            "bucket"
        ).parquet(f"{out_dir}/kept.parquet")

    def _dropped_write():
        dropped.hint("rebalance", "bucket").write.mode(mode).partitionBy(
            "bucket"
        ).parquet(f"{out_dir}/dropped.parquet")

    def _grains_collect():
        return grains_frame(scored).toPandas()

    # three independent jobs over the already-materialized scored frame
    # (score_clips persisted/staged it) — submitted together so the
    # dimension-sized grains shuffle hides behind the kept/dropped ones
    with ThreadPoolExecutor(max_workers=3) as ex:
        futs = [
            ex.submit(_kept_write),
            ex.submit(_dropped_write),
            ex.submit(_grains_collect),
        ]
        _, _, gpdf = [f.result() for f in futs]

    partials, by_bucket = _split_grains_pandas(gpdf, 0)
    if not len(partials):
        # keep the empty-input table contract: a schema-complete empty
        # partials table (the Spark path wrote one too)
        partials = pd.DataFrame({n: [] for n, _ in _PARTIALS_SPEC})
    tag = "snap0000000000"
    if mode == "overwrite":
        import shutil

        for tbl in ("metrics_partials", "lineage"):
            shutil.rmtree(f"{out_dir}/{tbl}.parquet", ignore_errors=True)
    else:
        # append mode: every one-shot run carries snapshot_id=0, so the
        # fixed file name would os.replace the PREVIOUS run's partials
        # and lineage while kept/dropped rows still accumulate —
        # uniquify the tag per run; finalize_metrics sums duplicate
        # (snapshot, bucket) partials, matching the accumulated rows
        import glob as _glob

        seq = max(
            len(_glob.glob(f"{out_dir}/{t}.parquet/part-{tag}*.parquet"))
            for t in ("metrics_partials", "lineage")
        )
        if seq:
            tag = f"{tag}-{seq:04d}"
    _append_parquet_file(
        f"{out_dir}/metrics_partials.parquet",
        partials,
        _PARTIALS_PA_SCHEMA,
        tag,
    )
    lin_pdf = pd.DataFrame(
        [(0, "append", b, *by_bucket[b]) for b in sorted(by_bucket)],
        columns=[
            "snapshot_id", "kind", "bucket", "n_input", "n_kept", "n_dropped",
        ],
    )
    _append_parquet_file(  # the commit point, written last like resume
        f"{out_dir}/lineage.parquet",
        lin_pdf,
        _LINEAGE_PA_SCHEMA,
        tag,
    )
    # final merged metrics tables — pandas kernels, zero Spark jobs
    finalize_metrics(spark, out_dir)
    return {
        "n_input": int(sum(v[0] for v in by_bucket.values())),
        "n_kept": int(sum(v[1] for v in by_bucket.values())),
    }


def normalize_clips(
    clips: DataFrame,
    target_sr: int = 16000,
    trim: bool = True,
    gain: bool = True,
) -> DataFrame:
    """Audio-normalization stage producing a VALID clips table: every
    decodable row is re-emitted with ``bytes`` = the trimmed, resampled
    (``target_sr``), loudness-normalized pcm16 payload, ``codec`` =
    'pcm16', ``sr_hz`` = target_sr and ``dur_ms`` recomputed — so the
    output parquet feeds straight back into score_clips / the stream /
    downstream models. All other input columns pass through unchanged;
    ``gain_db`` / ``clip_after`` / ``lead_samples`` ride along for
    metrics. Input rows with NULL bytes or an unknown codec are
    filtered at the SCAN (never decoded — filtering on the UDF output
    would clone the Arrow node, CLAUDE.md r5); rows whose payload fails
    decode despite a known codec keep NULL bytes in the output for
    lineage and are cheap to drop downstream. Map-only: one Arrow
    crossing, no shuffle at any scale."""
    from qcflow import audio
    from qcflow.udfs import with_normalize

    decodable = clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    carried = [
        c for c in clips.columns if c not in ("bytes", "codec", "sr_hz", "dur_ms")
    ]
    ndf = with_normalize(decodable, target_sr=target_sr, trim=trim, gain=gain)
    return ndf.select(
        *carried,
        F.col("norm_bytes").alias("bytes"),
        F.lit("pcm16").alias("codec"),
        F.lit(target_sr).alias("sr_hz"),
        F.round(F.col("norm_samples") * 1000.0 / F.lit(target_sr))
        .cast("int")
        .alias("dur_ms"),
        "gain_db",
        "clip_after",
        "lead_samples",
    )


def segment_table(
    clips: DataFrame, win_ms: int = 400, align: bool = True
) -> DataFrame:
    """Segmentation stage producing a VALID clips table of training
    segments: each decodable clip becomes one row per 400 ms window with
    ``clip_id`` = '<parent>#<seg_idx>', ``bytes`` = the pcm16 segment
    payload, ``dur_ms`` recomputed from the true segment length, and —
    when ``align`` and a transcript column exist — ``transcript`` = the
    words whose uniform-rate midpoints fall in that window
    (features.align_transcript_segments). The output feeds straight
    back into score_clips / the stream, closing the loop: normalize ->
    segment -> QC each training row.

    Scale shape: the decode/segment pass is map-only (one Arrow
    crossing, JVM-side generator); the alignment side derives counts
    from BYTE LENGTH (no second decode) and joins back on
    (clip_id, seg_idx) — both sides hash-partition on the same key, and
    segment rows are payload-heavy while alignment rows are strings, so
    the shuffle ships each exactly once. parent_id/seg_idx ride along
    for lineage."""
    from qcflow import audio
    from qcflow.features import align_transcript_segments, valid_sr_col
    from qcflow.udfs import segment_clips

    decodable = clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    # segment_clips decodes invalid/NULL sr on the 8000 Hz fallback grid;
    # the emitted rows must carry that EFFECTIVE rate (sr_hz=0 would both
    # mislabel the payload and ANSI-throw in the dur_ms division)
    sr_eff = F.when(valid_sr_col(), F.col("sr_hz")).otherwise(F.lit(8000))
    carried = [
        c
        for c in clips.columns
        if c not in ("clip_id", "bytes", "codec", "sr_hz", "dur_ms", "transcript")
    ]
    segs = segment_clips(decodable, win_ms=win_ms).select(
        F.col("clip_id").alias("parent_id"),
        "seg_idx",
        *carried,
        F.concat_ws(
            "#", F.col("clip_id").cast("string"), F.col("seg_idx").cast("string")
        ).alias("clip_id"),
        F.col("seg_bytes").alias("bytes"),
        F.lit("pcm16").alias("codec"),
        sr_eff.alias("sr_hz"),
        F.round(F.col("n_samples") * 1000.0 / sr_eff).cast("int").alias("dur_ms"),
    )
    if align and "transcript" in clips.columns:
        al = align_transcript_segments(decodable, win_ms=win_ms).select(
            F.col("clip_id").alias("parent_id"),
            "seg_idx",
            F.col("seg_text").alias("transcript"),
        )
        segs = segs.join(al, ["parent_id", "seg_idx"], "left").withColumn(
            "transcript", F.coalesce(F.col("transcript"), F.lit(""))
        )
    return segs


def _fp_bands(fp: DataFrame, id_col: str, fp_col: str = "audio_fp") -> DataFrame:
    """Explode a 64-bit fingerprint frame into its 4x16-bit
    (band, bucket) rows — the banded-Hamming join key (pigeonhole:
    Hamming <= 3 guarantees one shared clean band)."""
    return fp.select(
        id_col,
        fp_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(f"({fp_col} >> {j * 16}) & 65535").alias(
                            "bucket"
                        ),
                    )
                    for j in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, fp_col, "bb.band", "bb.bucket")


def dedup_table(
    clips: DataFrame, ham_max: int = 3, quality: str = "snr"
) -> DataFrame:
    """Audio near-dup dedup stage producing a VALID clips table of
    SURVIVORS: fingerprint every decodable clip (one Arrow crossing
    into a localCheckpointed 8-byte frame — the staged-fingerprint plan
    the dedup_audio_fp_10k bench key measures), banded Hamming
    self-join within ``ham_max``, distributed connected components over
    the pair graph, then ONE survivor per cluster — the
    highest-quality member (blind SNR estimate, decoded only for
    cluster MEMBERS — a tiny fraction of the corpus) with a min-id
    tie-break, the dedup_best_survivor shape. Non-clustered rows pass
    through untouched; ``cluster_rep`` / ``cluster_size`` ride along
    (NULL for singletons) for lineage.

    Scale shape: clip bytes cross into Python exactly once for the
    fingerprint (plus once more for the cluster members' quality
    score); everything that shuffles is 8-byte hashes and ids. The
    graph is keyed on xxhash64(clip_id) so string ids work with the
    long-keyed CC kernel; survivor choice never depends on the hash
    (quality + lexicographic clip_id only)."""
    from qcflow import audio
    from qcflow.graph import resolve_clusters
    from qcflow.udfs import with_audio_fp, with_snr_estimate

    decodable = clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    fp = (
        with_audio_fp(decodable)
        .select(F.xxhash64("clip_id").alias("nid"), "clip_id", "audio_fp")
        .filter(F.col("audio_fp").isNotNull())
        .localCheckpoint()
    )
    bands = _fp_bands(fp, "nid")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.nid") < F.col("b.nid")),
        )
        .filter(F.bit_count(F.expr("a.audio_fp ^ b.audio_fp")) <= ham_max)
        .select(F.col("a.nid").alias("id_a"), F.col("b.nid").alias("id_b"))
        .dropDuplicates()
    )
    clusters = resolve_clusters(pairs).withColumnRenamed("doc_id", "nid")
    withc = clips.withColumn("nid", F.xxhash64("clip_id")).join(
        clusters, "nid", "left"
    )
    members = withc.filter(F.col("cluster_rep").isNotNull())
    scored = with_snr_estimate(members).select(
        "nid",
        "cluster_rep",
        F.coalesce(F.col("snr_est_db"), F.lit(-1e9)).alias("_q"),
        F.col("clip_id").alias("_sid"),
    )
    best = (
        scored.groupBy("cluster_rep")
        .agg(
            F.min(
                F.struct((-F.col("_q")).alias("nq"), F.col("_sid").alias("sid"))
            ).alias("m")
        )
        .select("cluster_rep", F.col("m.sid").alias("_survivor"))
    )
    return (
        withc.join(best, "cluster_rep", "left")
        .filter(
            F.col("cluster_rep").isNull()
            | (F.col("clip_id") == F.col("_survivor"))
        )
        .drop("nid", "_survivor")
    )


def decontaminate_table(
    clips: DataFrame, eval_clips: DataFrame, ham_max: int = 3
) -> DataFrame:
    """Eval-set decontamination stage: every corpus clip gains
    ``contam_eval_id`` / ``contam_hamming`` (NULL = clean) by spectral-
    fingerprint banded-Hamming match against the held-out eval clips —
    the production form of the audio_decontaminate gate. The eval set
    is dimension-sized at any corpus scale, so its fingerprint band
    rows BROADCAST: corpus scan -> one Arrow fp crossing -> band
    explode -> broadcast hash join -> exact Hamming filter -> left join
    of the (tiny) hit set back onto the corpus; corpus bytes never
    shuffle. Rows the fingerprint can't read (NULL bytes, unknown
    codec) are conservatively left unflagged — they fail QC decode
    rules downstream anyway."""
    from qcflow import audio
    from qcflow.udfs import with_audio_fp

    decodable = clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    corp_fp = (
        with_audio_fp(decodable)
        .select("clip_id", "audio_fp")
        .filter(F.col("audio_fp").isNotNull())
    )
    eval_dec = eval_clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    eval_fp = (
        with_audio_fp(eval_dec)
        .select(
            F.col("clip_id").alias("contam_eval_id"),
            F.col("audio_fp").alias("eval_fp"),
        )
        .filter(F.col("eval_fp").isNotNull())
    )
    eval_bands = _fp_bands(eval_fp, "contam_eval_id", fp_col="eval_fp")
    hits = (
        _fp_bands(corp_fp, "clip_id")
        .join(F.broadcast(eval_bands), ["band", "bucket"])
        .withColumn(
            "contam_hamming",
            F.bit_count(F.expr("audio_fp ^ eval_fp")).cast("int"),
        )
        .filter(F.col("contam_hamming") <= ham_max)
        .groupBy("clip_id")
        .agg(
            F.min(
                F.struct(
                    F.col("contam_hamming").alias("h"),
                    F.col("contam_eval_id").alias("e"),
                )
            ).alias("m")
        )
        .select(
            "clip_id",
            F.col("m.e").alias("contam_eval_id"),
            F.col("m.h").alias("contam_hamming"),
        )
    )
    return clips.join(hits, "clip_id", "left")


def dedup_increment(
    new_clips: DataFrame, committed_fp: DataFrame, ham_max: int = 3
) -> DataFrame:
    """Incremental near-dup dedup for a resumable load: dedup a NEW
    snapshot's clips against (a) the already-committed corpus — via its
    persisted fingerprint table, 8 bytes/clip, history never rescanned —
    and (b) themselves (intra-increment copies). Returns the new rows
    that survive, with ``dup_of_committed`` (the committed fp it
    collided with, NULL if none — survivors always have NULL) dropped
    and intra-increment clusters reduced to their min-id member.

    Scale shape: the increment's bytes cross into Python once (the
    fingerprint); both the committed probe and the self-join are hash
    joins keyed on (band, bucket) over 8-byte rows — the committed side
    is corpus-sized, so it is NEVER broadcast; at 10^12 clips its
    fingerprint table is what the snapshot manifest stages per commit
    (the audio analogue of index_store's encoded appends)."""
    from qcflow import audio
    from qcflow.graph import resolve_clusters
    from qcflow.udfs import with_audio_fp

    decodable = new_clips.filter(
        F.col("bytes").isNotNull() & F.col("codec").isin(*audio.KNOWN_CODECS)
    )
    fp = (
        with_audio_fp(decodable)
        .select(F.xxhash64("clip_id").alias("nid"), "clip_id", "audio_fp")
        .filter(F.col("audio_fp").isNotNull())
        .localCheckpoint()
    )
    new_bands = _fp_bands(fp, "nid")
    # (a) probe the committed fingerprint table
    com_bands = _fp_bands(
        committed_fp.select(
            F.col("clip_id").alias("committed_id"),
            F.col("audio_fp").alias("committed_fp"),
        ),
        "committed_id",
        fp_col="committed_fp",
    )
    hit_committed = (
        new_bands.join(com_bands, ["band", "bucket"])
        .filter(
            F.bit_count(F.expr("audio_fp ^ committed_fp")) <= ham_max
        )
        .select("nid")
        .distinct()
    )
    # (b) intra-increment clusters -> min-id survivor
    a, b = new_bands.alias("a"), new_bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.nid") < F.col("b.nid")),
        )
        .filter(F.bit_count(F.expr("a.audio_fp ^ b.audio_fp")) <= ham_max)
        .select(F.col("a.nid").alias("id_a"), F.col("b.nid").alias("id_b"))
        .dropDuplicates()
    )
    clusters = resolve_clusters(pairs).withColumnRenamed("doc_id", "nid")
    withc = (
        new_clips.withColumn("nid", F.xxhash64("clip_id"))
        .join(clusters, "nid", "left")
        .join(hit_committed.withColumn("_hit", F.lit(1)), "nid", "left")
    )
    # cluster representative chosen among members that did NOT hit the
    # committed corpus — a cluster keeps one member unless every member
    # is a committed dup; the tie-break is min clip_id (never the graph
    # hash, which is layout-stable but not caller-meaningful)
    reps = (
        withc.filter(F.col("_hit").isNull() & F.col("cluster_rep").isNotNull())
        .groupBy("cluster_rep")
        .agg(F.min("clip_id").alias("_rep_cid"))
    )
    return (
        withc.join(reps, "cluster_rep", "left")
        .filter(
            F.col("_hit").isNull()
            & (
                F.col("cluster_rep").isNull()
                | (F.col("clip_id") == F.col("_rep_cid"))
            )
        )
        .drop("nid", "_hit", "_rep_cid")
    )


def pack_table(clips: DataFrame, budget_ms: int = 3000) -> DataFrame:
    """Packing stage producing a VALID clips table of training EXAMPLES:
    pcm16 rows (run `normalize` first — it emits uniform pcm16) are
    folded into ~``budget_ms`` packs (the next-fit decision sums
    per-member floor(dur_ms), so a pack's exact emitted duration can
    exceed the budget by up to n_members - 1 ms of accumulated sub-ms
    floor losses) by greedy next-fit inside
    deterministic hash-ordered groups, then each pack's payloads are
    physically CONCATENATED (JVM binary fold — bytes never enter
    Python) with transcripts joined in the same order and ``parents``
    carrying lineage. Rows longer than the budget pack alone; non-pcm16
    rows are dropped (mixed codecs cannot concatenate — the stage
    contract is normalize -> segment -> dedup -> pack). Packing groups
    key on (sr_hz, hash-group) so a pack never mixes sample rates.

    Scale shape: the packing DECISION runs on a SLIM frame (id, hash,
    duration from byte length — no payloads through Python); payloads
    shuffle exactly once, on the join that co-locates each pack's
    members, then reduce in a single collect_list aggregation whose
    output is the training row."""
    import pandas as pd

    from qcflow.features import valid_sr_col

    # defect rows (the synth table plants sr_hz=0 on ~1% of pcm16 rows)
    # must not ANSI-throw in the duration division: ride the same
    # valid-sr-else-8000 fallback segment_table uses, and key the pack
    # group on the EFFECTIVE rate so a bad-sr row never lands in a
    # mixed-rate pack (advisor r5 finding)
    sr_eff = F.when(valid_sr_col(), F.col("sr_hz")).otherwise(F.lit(8000))
    slim = clips.filter(F.col("codec") == "pcm16").select(
        "clip_id",
        sr_eff.alias("sr_hz"),
        F.pmod(F.xxhash64("clip_id"), F.lit(1_000_000_007)).alias("h"),
        F.expr("(length(bytes) DIV 2) * 1000").alias("_ns1000"),
    ).select(
        "clip_id",
        "sr_hz",
        "h",
        F.expr("_ns1000 DIV sr_hz").alias("dur_ms"),
    ).withColumn("grp", F.pmod(F.col("h"), F.lit(64)).cast("int"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "clip_id"]).reset_index(drop=True)
        packs, used, cur = [], 0, 0
        for d in pdf["dur_ms"]:
            if packs and used + d > budget_ms:
                cur += 1
                used = 0
            used += int(d)
            packs.append(cur)
        pdf["pack_id"] = pd.Series(packs, dtype="int32")
        return pdf[["clip_id", "sr_hz", "grp", "h", "pack_id"]]

    assign = slim.groupBy("sr_hz", "grp").applyInPandas(
        pack, "clip_id string, sr_hz int, grp int, h long, pack_id int"
    )
    tr_col = (
        F.col("transcript")
        if "transcript" in clips.columns
        else F.lit("").alias("transcript")
    )
    members = clips.select("clip_id", "bytes", tr_col).join(
        assign, "clip_id"
    )
    ms = F.array_sort(
        F.collect_list(
            F.struct(
                "h",
                "clip_id",
                F.col("bytes").alias("b"),
                F.coalesce(F.col("transcript"), F.lit("")).alias("tr"),
            )
        )
    )
    agg = members.groupBy("sr_hz", "grp", "pack_id").agg(ms.alias("ms"))
    payload = F.aggregate(
        "ms", F.expr("X''"), lambda acc, m: F.concat(acc, m["b"])
    )
    return agg.select(
        F.concat_ws(
            "-", F.lit("pack"), F.col("sr_hz"), F.col("grp"), F.col("pack_id")
        ).alias("clip_id"),
        payload.alias("bytes"),
        F.lit("pcm16").alias("codec"),
        F.col("sr_hz"),
        F.array_join(
            F.transform(F.col("ms"), lambda m: m["tr"]), " "
        ).alias("transcript"),
        F.transform(F.col("ms"), lambda m: m["clip_id"]).alias("parents"),
        F.size("ms").alias("n_members"),
    ).withColumn(
        "dur_ms",
        F.expr("((length(bytes) DIV 2) * 1000) DIV sr_hz").cast("int"),
    )
