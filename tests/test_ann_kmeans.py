"""Distributed k-means + trained-IVF: blob recovery, objective descent,
and full recall within probed lists on separated data."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from qcflow.ann import assign_clusters, inertia, ivf_topk, kmeans_fit

D = 8
BLOBS = 3


@pytest.fixture(scope="module")
def blobs(spark):
    """3 well-separated gaussian blobs in 8-d, 1500 rows, deterministic."""
    rng = np.random.default_rng(99)
    centers = np.array(
        [[10.0] * D, [-10.0] * D, [10.0] * 4 + [-10.0] * 4]
    )
    rows = []
    for i in range(1500):
        b = i % BLOBS
        v = centers[b] + rng.normal(0, 0.5, D)
        rows.append((i, b, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, blob int, emb array<double>"
    ).localCheckpoint(eager=True)


def test_kmeans_recovers_blobs(spark, blobs):
    c0 = kmeans_fit(blobs, k=BLOBS, n_iter=1)
    c = kmeans_fit(blobs, k=BLOBS, n_iter=10)
    # the objective descends from the 1-iteration codebook to convergence
    assert inertia(blobs, c) <= inertia(blobs, c0) + 1e-6
    # perfect purity: every k-means cluster maps to exactly one blob
    assigned = assign_clusters(blobs, c).select("blob", "cluster").toPandas()
    purity = (
        assigned.groupby("cluster").blob.agg(lambda s: s.value_counts().iloc[0] / len(s))
    )
    assert (purity == 1.0).all()
    assert assigned.cluster.nunique() == BLOBS
    # centroids sit on the true centers (within the noise scale)
    truth = np.array([[10.0] * D, [-10.0] * D, [10.0] * 4 + [-10.0] * 4])
    for t in truth:
        assert np.abs(c - t).sum(axis=1).min() < 0.5


def test_trained_ivf_full_recall_on_blobs(spark, blobs):
    """With lists = blobs, every true neighbor of a query lives in its
    first probed list — IVF top-k must equal brute-force top-k."""
    c = kmeans_fit(blobs, k=BLOBS, n_iter=10)
    queries = blobs.filter(F.col("vec_id") < 6)
    got = ivf_topk(blobs, queries, c, k=5, nprobe=1).toPandas()

    # brute force twin in numpy
    pdf = blobs.toPandas().sort_values("vec_id")
    M = np.stack(pdf.emb.to_numpy())
    norms = np.linalg.norm(M, axis=1)
    for qid in range(6):
        cos = (M @ M[qid]) / (norms * norms[qid])
        cos[qid] = -np.inf
        top = np.argsort(np.stack([-cos, np.arange(len(cos))], axis=1).T[0], kind="stable")[:5]
        want = [int(pdf.vec_id.iloc[i]) for i in top]
        have = got[got.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert have == want, f"query {qid}: {have} != {want}"
