"""Incremental maintenance of a TRAINED IVFPQ index with snapshot
semantics — the production embedding-store shape: the expensive part
(coarse k-means + PQ codebooks, ``ann.ivfpq_train``) is trained once;
every new batch of vectors is then appended by ``ann.ivfpq_encode``
(assign + residual + codes — one codegen'd projection, no retrain, no
shuffle) under a committed-snapshot manifest, so readers see exactly the
batches whose commit record landed and crashed appends stay invisible.

Manifest design mirrors qcflow/checkpoint.py (same Iceberg-over-parquet
idioms, generalized away from the QC kept/dropped tables):

- ``index_dir/codes.parquet/`` — append-only parquet rows
  (id, cluster, code_0.., snapshot_id). At 10^12 vectors this is the
  M-bytes/vector store, partitioned by cluster.
- ``index_dir/trained.npz`` — frozen centroids + codebooks, written once
  at ``init_index`` (atomic rename).
- ``index_dir/manifest.parquet`` — one row per COMMITTED snapshot
  (snapshot_id, n_rows), written by the driver via pyarrow after the
  data append succeeds (commit point; same single-writer contract as
  checkpoint.py's lineage).
- ``index_dir/snapshot_counter`` — ids burned BEFORE data is written, so
  a crashed append can never be resurrected by id reuse
  (checkpoint.next_snapshot_id rationale).

Per-list occupancy drift between snapshots (``list_drift``) is the
metric a production store watches to decide retraining: frozen centroids
slowly mismatch the data distribution, and the first symptom is lists
growing unevenly.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CODES = "codes.parquet"
_MANIFEST = "manifest.parquet"
_TRAINED = "trained.npz"
_COUNTER = "snapshot_counter"


def _p(index_dir: str, name: str) -> str:
    return os.path.join(index_dir, name)


def init_index(
    index_dir: str, centroids: np.ndarray, codebooks: np.ndarray
) -> None:
    """Freeze a trained index's parameters (atomic rename — the file
    either exists complete or not at all)."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = _p(index_dir, _TRAINED + ".tmp.npz")
    np.savez(tmp, centroids=centroids, codebooks=codebooks)
    os.replace(tmp, _p(index_dir, _TRAINED))


def load_trained(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    with np.load(_p(index_dir, _TRAINED)) as z:
        return z["centroids"], z["codebooks"]


def _next_snapshot_id(index_dir: str) -> int:
    """Burn an id before any data lands (crashed attempts keep theirs,
    and their uncommitted rows stay invisible forever)."""
    path = _p(index_dir, _COUNTER)
    prev = -1
    if os.path.exists(path):
        with open(path) as f:
            prev = int(f.read().strip())
    nxt = prev + 1
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, path)
    return nxt


def _committed_pandas(index_dir: str):
    path = _p(index_dir, _MANIFEST)
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pandas()


def _commit(index_dir: str, snapshot_id: int, n_rows: int) -> None:
    """Append the commit record driver-side (pyarrow, not a Spark job —
    manifest bookkeeping must not cost a cluster roundtrip)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    prev = _committed_pandas(index_dir)
    row = pd.DataFrame(
        {"snapshot_id": [snapshot_id], "n_rows": [n_rows]}
    ).astype({"snapshot_id": "int64", "n_rows": "int64"})
    out = row if prev is None else pd.concat([prev, row], ignore_index=True)
    tmp = _p(index_dir, _MANIFEST + ".tmp")
    pq.write_table(pa.Table.from_pandas(out, preserve_index=False), tmp)
    os.replace(tmp, _p(index_dir, _MANIFEST))


def append_vectors(
    spark: SparkSession,
    index_dir: str,
    vectors: DataFrame,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    residual: bool = True,
    _crash_before_commit: bool = False,
) -> int:
    """Encode a batch against the frozen trained index and append it as
    a new snapshot. Assign + encode ONLY — centroids/codebooks are read
    from disk and never touched; the append is one write job whose rows
    carry the burned snapshot_id, and the commit record lands only after
    the write succeeds (``_crash_before_commit`` simulates dying between
    the two for the fault-injection tests). Returns the snapshot id."""
    from qcflow.ann import ivfpq_encode

    centroids, codebooks = load_trained(index_dir)
    sid = _next_snapshot_id(index_dir)
    coded = ivfpq_encode(
        vectors, centroids, codebooks,
        emb_col=emb_col, id_col=id_col, residual=residual,
    ).withColumn("snapshot_id", F.lit(sid).cast("long"))
    coded.write.mode("append").parquet(_p(index_dir, _CODES))
    if _crash_before_commit:
        return sid
    n = spark.read.parquet(_p(index_dir, _CODES)).filter(
        F.col("snapshot_id") == sid
    ).count()
    _commit(index_dir, sid, n)
    return sid


def read_index(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> DataFrame:
    """Committed view of the codes table: rows whose snapshot_id has a
    commit record (optionally only up to ``as_of`` — time travel).
    Broadcast-semi-join against the driver-side manifest, same plan as
    checkpoint.read_committed."""
    man = _committed_pandas(index_dir)
    codes_path = _p(index_dir, _CODES)
    if man is None or not len(man) or not os.path.exists(codes_path):
        raise ValueError(f"no committed snapshots in {index_dir}")
    if as_of is not None:
        man = man[man["snapshot_id"] <= as_of]
    rows = spark.read.parquet(codes_path)
    sids = spark.createDataFrame(man[["snapshot_id"]])
    return rows.join(F.broadcast(sids), "snapshot_id", "left_semi")


def list_counts(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> DataFrame:
    """Per-list occupancy of the committed index: (cluster, n_vectors).
    One partial aggregation over the codes scan — the mergeable-partials
    shape, so at scale this is a map-side combine per file."""
    return (
        read_index(spark, index_dir, as_of=as_of)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def list_drift(
    spark: SparkSession, index_dir: str, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """Per-list count delta between two committed snapshots — the
    retrain-trigger metric (frozen centroids drift away from the data
    distribution list by list). Computed in ONE scan: rows grouped by
    cluster with conditional sums at each cutoff, never two reads."""
    rows = read_index(spark, index_dir, as_of=to_snapshot)
    return rows.groupBy("cluster").agg(
        F.sum(
            F.when(F.col("snapshot_id") <= from_snapshot, 1).otherwise(0)
        ).cast("long").alias("n_before"),
        F.count(F.lit(1)).cast("long").alias("n_after"),
    ).select(
        "cluster",
        "n_before",
        "n_after",
        (F.col("n_after") - F.col("n_before")).alias("delta"),
    )
