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


def test_join_assignment_equals_inline(spark):
    """The large-k broadcast-table assignment strategy must produce
    EXACTLY the inline-literal projection's clusters (same fold dot,
    same numpy |c|^2, same lexicographic tie-break) — including on
    planted exact-tie vectors."""
    import numpy as np
    import pandas as pd

    from qcflow.ann import _assign_clusters_join, assign_clusters

    rng = np.random.default_rng(123)
    k, d, n = 32, 8, 500
    cents = np.round(rng.normal(0.0, 1.0, (k, d)), 6)
    emb = np.round(rng.normal(0.0, 1.0, (n, d)), 6)
    emb[7] = cents[3]  # exact centroid hit
    emb[11] = (cents[5] + cents[5]) / 2.0  # still exact centroid hit
    vec = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "emb": [r.tolist() for r in emb]}),
        "vec_id long, emb array<double>",
    )
    a = (
        assign_clusters(vec, cents)  # 32*8=256 terms <= 512 -> literal path
        .select("vec_id", "cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        _assign_clusters_join(vec, cents, "emb", "cluster", "vec_id")
        .select("vec_id", "cluster")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_large_k_dispatch_recovers_planted_clusters(spark):
    """k above max_inline_k dispatches to the broadcast-table strategy
    (plan has a join, no k-literal array) and still recovers a planted
    160-cluster mixture exactly — the coarse-list scale a 10^12-vector
    index needs, where the literal expression tree stops being viable."""
    import contextlib
    import io

    import numpy as np
    import pandas as pd

    from qcflow.ann import assign_clusters

    rng = np.random.default_rng(321)
    k, d, per = 160, 6, 6  # 160*6=960 terms > 512 -> join strategy
    cents = rng.normal(0.0, 1.0, (k, d)) * 30.0
    emb = np.round(
        cents[np.repeat(np.arange(k), per)] + rng.normal(0.0, 0.05, (k * per, d)), 6
    )
    vec = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(k * per), "emb": [r.tolist() for r in emb]}
        ),
        "vec_id long, emb array<double>",
    )
    out = assign_clusters(vec, cents, id_col="vec_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("simple")
    assert "Join" in buf.getvalue()
    got = out.select("vec_id", "cluster").toPandas().sort_values("vec_id")
    want = (got.vec_id // per + 1).to_numpy()
    assert (got.cluster.to_numpy() == want).all()


def test_join_assignment_row_semantics(spark):
    """Row-level contract of the broadcast-table strategy (r4 review):
    NULL embeddings get a NULL cluster (the inline path's semantics),
    every input row appears exactly once, and the input column order is
    preserved with the cluster column appended."""
    import numpy as np
    import pandas as pd

    from qcflow.ann import _assign_clusters_join

    rng = np.random.default_rng(9)
    cents = np.round(rng.normal(0.0, 1.0, (3, 4)), 6)
    pdf = pd.DataFrame(
        {
            "vec_id": [0, 1, 2, 3],
            "tag": ["a", "b", "c", "d"],
            "emb": [
                cents[1].tolist(),
                None,
                cents[2].tolist(),
                cents[0].tolist(),
            ],
        }
    )
    vec = spark.createDataFrame(
        pdf, "vec_id long, tag string, emb array<double>"
    )
    out = _assign_clusters_join(vec, cents, "emb", "cluster", "vec_id")
    assert out.columns == ["vec_id", "tag", "emb", "cluster"]
    got = out.toPandas().sort_values("vec_id").reset_index(drop=True)
    assert len(got) == 4
    assert got.cluster.tolist()[0] == 2
    assert pd.isna(got.cluster.tolist()[1])
    assert got.cluster.tolist()[2] == 3 and got.cluster.tolist()[3] == 1
    assert got.tag.tolist() == ["a", "b", "c", "d"]


def test_sample_init_recovers_blobs(spark, blobs):
    """init='sample' (driver-side Gonzalez over a hash sample — one job
    for any k, the large-k seeding path) must recover the planted blobs
    exactly like init='farthest'."""
    c = kmeans_fit(blobs, k=BLOBS, n_iter=5, init="sample")
    assigned = assign_clusters(blobs, c).select("blob", "cluster").toPandas()
    purity = assigned.groupby("cluster").blob.agg(
        lambda s: s.value_counts().iloc[0] / len(s)
    )
    assert (purity == 1.0).all()
    assert assigned.cluster.nunique() == BLOBS
