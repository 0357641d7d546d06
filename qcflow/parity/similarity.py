"""Similarity search over the `embeddings` table (array<float>, 64-d).

Both engines compute cosine with the same sequential fold (array order), so
doubles agree bit-for-bit and rank order is identical — the oracle checks
the actual ANN outputs, not a tolerance band.

- brute-force top-k: the exactness baseline. O(Q*N); broadcast the Q side.
- LSH-bucketed: random-hyperplane signs -> bucket equi-join -> rerank.
  The hyperplanes are seeded-numpy literals inlined into BOTH dialects.
  At scale this is the path: the candidate join shuffles (bucket, id)
  pairs, never the O(Q*N) cross product.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t

TOP_K = 10
N_QUERIES = 5  # vec_id < 5
N_PLANES = 6  # 64 buckets

_planes = np.round(
    np.random.default_rng(4242).normal(0, 1, (N_PLANES, 64)), 6
)

# IVF coarse quantizer: a fixed random codebook (seeded, inlined into both
# dialects). A trained k-means codebook would tighten the lists but the
# PLAN is identical — assignment, inverted lists, probing, rerank — and a
# fixed codebook keeps the oracle exact.
N_CENTROIDS = 16
N_PROBE = 2
_centroids = np.round(np.random.default_rng(1717).normal(0, 1, (N_CENTROIDS, 64)), 6)
_centroid_norms = np.sqrt((_centroids**2).sum(axis=1))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _emb_double(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )


_SQL_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (acc, x) -> acc + x)"
)
_SQL_EMB = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_SQL_NORM = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(emb, x -> x * x)), (acc, x) -> acc + x))"
)


@query(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB} AS emb FROM embeddings),
    n AS (SELECT vec_id, emb, {_SQL_NORM} AS nrm FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_SQL_DOT.format(a="q.emb", b="c.emb")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-NN baseline: broadcast the (tiny) query side against every
    candidate, window top-k per query with a full tie-break."""
    emb = _emb_double(t(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    n = emb.withColumn("nrm", nrm)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


def _sql_plane_literal(h: int) -> str:
    return "[" + ", ".join(repr(v) for v in _planes[h]) + "]"


def _sql_bucket_expr() -> str:
    terms = []
    for h in range(N_PLANES):
        proj = _SQL_DOT.format(a="emb", b=_sql_plane_literal(h))
        terms.append(f"(CASE WHEN {proj} > 0 THEN {1 << h} ELSE 0 END)")
    return " + ".join(terms)


def _spark_bucket_expr() -> Column:
    total = F.lit(0)
    for h in range(N_PLANES):
        plane = F.array(*[F.lit(float(v)) for v in _planes[h]])
        proj = _dot(F.col("emb"), plane)
        total = total + F.when(proj > 0, F.lit(1 << h)).otherwise(F.lit(0))
    return total


@query(
    "ann_lsh_bucketed",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB} AS emb FROM embeddings),
    n AS (SELECT vec_id, emb, {_SQL_NORM} AS nrm, {_sql_bucket_expr()} AS bucket FROM e),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_SQL_DOT.format(a="q.emb", b="c.emb")} / (q.nrm * c.nrm) AS cos
      FROM n q JOIN n c ON q.bucket = c.bucket
       AND q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= 1
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path ANN: 6 random-hyperplane sign bits -> 64 buckets ->
    candidates only within the query's bucket -> exact rerank, top-1.
    The bucket equi-join replaces the cross product; at 10^9 vectors the
    shuffle key is (bucket), and rerank fan-in is n/buckets per query."""
    emb = _emb_double(t(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    n = emb.withColumn("nrm", nrm).withColumn("bucket", _spark_bucket_expr())
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    scored = (
        n.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("q_bucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 1)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


def _sql_probe_list() -> str:
    # the query's own bucket + every bucket at Hamming distance 1
    probes = ["q.bucket"] + [f"xor(q.bucket, {1 << h})" for h in range(N_PLANES)]
    return "[" + ", ".join(probes) + "]"


@query(
    "ann_lsh_multiprobe",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB} AS emb FROM embeddings),
    n AS (SELECT vec_id, emb, {_SQL_NORM} AS nrm, {_sql_bucket_expr()} AS bucket FROM e),
    probes AS (
      SELECT q.vec_id AS query_id, q.emb AS q_emb, q.nrm AS q_nrm,
             unnest({_sql_probe_list()}) AS probe
      FROM n q WHERE q.vec_id < {N_QUERIES}),
    scored AS (
      SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
             {_SQL_DOT.format(a="p.q_emb", b="c.emb")} / (p.q_nrm * c.nrm) AS cos
      FROM probes p JOIN n c ON c.bucket = p.probe AND c.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: each query probes its own bucket plus the 6
    Hamming-1 buckets (flip one hyperplane sign — the planes most likely
    to have mis-sorted a near neighbor), 7x the candidate fan-in of
    single-probe for a large recall jump at a tiny fraction of the
    brute-force cost. Candidates meet on a bucket equi-join (probe side
    exploded, broadcast); exact rerank, top-{TOP_K}. Recall vs the exact
    baseline is pinned in tests/test_ann_recall.py."""
    emb = _emb_double(t(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    n = emb.withColumn("nrm", nrm).withColumn("bucket", _spark_bucket_expr())
    probe = F.explode(
        F.array(
            F.col("bucket"),
            *[
                F.expr(f"bucket ^ {1 << h}").alias(f"p{h}")
                for h in range(N_PLANES)
            ],
        )
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        probe.alias("probe"),
    )
    scored = (
        n.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


# -------------------------------------------------------------- IVF ANN

# ------------------------------------------- trained-IVF construction truth
#
# The iterative Lloyd fixpoint has no SQL twin, so the oracle uses the
# repo's construction-truth pattern (parity/audio_q.py): a fixture corpus
# built as a mixture of 8 well-separated Gaussian clusters, with the true
# cluster label and the exact top-k neighbor list planted as truth
# columns at build time. DuckDB reads ONLY the truth; Spark must recover
# it THROUGH the full distributed path (farthest-first seeding -> Lloyd
# iterations -> inverted lists -> nprobe=2 -> exact rerank). Construction
# margins make recovery provable: inter-center distance 10*sqrt(2) vs
# intra-cluster diameter < 1.5, so farthest-first seeds every cluster
# exactly once (Gonzalez), one Lloyd step reaches the true partition, the
# query's own list holds its entire cluster, and every cross-cluster
# cosine (~0.01) is far below the intra-cluster top-k (~0.999). The truth
# cosines use the SAME sequential left-fold double arithmetic as
# qcflow/ann._dot, so the hash gate is exact, not a tolerance band.

_AT_K = 8  # mixture components
_AT_D = 16
_AT_PER = 100  # rows per component (vec_id i -> cluster i % _AT_K)
_AT_NQ = 16  # first 2 rows of each component are queries
_AT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_ivf",
)
_AT_VEC = os.path.join(_AT_DIR, "vectors_v1.parquet")
_AT_TRUTH = os.path.join(_AT_DIR, "truth_topk_v1.parquet")


def _seq_dot(a, b) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _round_half_up4(v: float) -> float:
    """Spark's ROUND(double, 4): HALF_UP on the shortest decimal repr
    (java BigDecimal.valueOf semantics) — NOT Python banker's round."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(v)).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _materialize_ann_truth() -> None:
    if os.path.exists(_AT_VEC) and os.path.exists(_AT_TRUTH):
        return
    import math

    import pandas as pd

    os.makedirs(_AT_DIR, exist_ok=True)
    rng = np.random.default_rng(31415)
    centers = np.zeros((_AT_K, _AT_D))
    for c in range(_AT_K):
        centers[c, 2 * c] = 10.0
    n = _AT_K * _AT_PER
    emb = np.round(
        centers[np.arange(n) % _AT_K] + rng.normal(0.0, 0.1, (n, _AT_D)), 6
    )
    pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "emb": [row.tolist() for row in emb],
            "true_cluster": (np.arange(n) % _AT_K).astype(np.int64),
        }
    ).to_parquet(_AT_VEC, index=False)

    norms = [math.sqrt(_seq_dot(e, e)) for e in emb]
    truth = []
    for q in range(_AT_NQ):
        cl = q % _AT_K
        cands = [i for i in range(n) if i % _AT_K == cl and i != q]
        scored = [
            (i, _seq_dot(emb[q], emb[i]) / (norms[q] * norms[i])) for i in cands
        ]
        scored.sort(key=lambda p: (-p[1], p[0]))
        for nb, cos in scored[:TOP_K]:
            truth.append(
                {
                    "query_id": np.int64(q),
                    "neighbor_id": np.int64(nb),
                    "cosine": _round_half_up4(cos),
                }
            )
    pd.DataFrame(truth).to_parquet(_AT_TRUTH, index=False)


_materialize_ann_truth()


@query(
    "ann_ivf_trained",
    oracle=f"SELECT query_id, neighbor_id, cosine FROM '{_AT_TRUTH}'",
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production IVF ANN: the codebook is TRAINED with distributed
    Lloyd's k-means (qcflow/ann.py — assignment is one codegen'd
    projection, the update one (cluster, dim)-keyed groupBy whose
    map-side partials reduce to a k x d codebook per iteration; seeding
    is the farthest-first traversal, k scalar jobs), then queries probe
    their 2 nearest trained lists and rerank exactly. Hash-gated against
    the construction-truth top-k planted in the fixture (see module
    comment); recall vs the exact baseline is additionally pinned in
    tests/test_ann_kmeans.py and tests/test_ann_recall.py."""
    from qcflow.ann import ivf_topk, kmeans_fit

    _materialize_ann_truth()
    vec = spark.read.parquet(_AT_VEC).select("vec_id", "emb")
    codebook = kmeans_fit(vec, k=_AT_K, id_col="vec_id", n_iter=4, init="farthest")
    qs = vec.filter(F.col("vec_id") < _AT_NQ)
    out = ivf_topk(vec, qs, codebook, k=TOP_K, nprobe=2, id_col="vec_id")
    return out.select(
        "query_id", "neighbor_id", F.round("cosine", 4).alias("cosine")
    )


@query(
    "ann_kmeans_assign",
    oracle=f"SELECT vec_id, true_cluster AS cluster_rep FROM '{_AT_VEC}'",
)
def ann_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-invariant gate on the trained k-means PARTITION itself:
    every vector tagged with the minimum vec_id of its trained cluster.
    Trained labels are an arbitrary permutation of the truth, but the
    min-id representative is permutation-free — and the fixture's
    construction (vec_id i belongs to component i % k, so ids 0..k-1 are
    the per-component minima) makes the truth column literally
    ``true_cluster``. Exact equality means Lloyd's recovered the planted
    mixture perfectly through the distributed path."""
    from qcflow.ann import assign_clusters, kmeans_fit

    _materialize_ann_truth()
    vec = spark.read.parquet(_AT_VEC).select("vec_id", "emb")
    codebook = kmeans_fit(vec, k=_AT_K, id_col="vec_id", n_iter=4, init="farthest")
    assigned = assign_clusters(vec, codebook)
    w = Window.partitionBy("cluster")
    return assigned.select(
        "vec_id", F.min("vec_id").over(w).alias("cluster_rep")
    )


def _sql_centroid_literal(h: int) -> str:
    return "[" + ", ".join(repr(v) for v in _centroids[h]) + "]"


def _sql_centroid_scores() -> str:
    """list of dot(emb, C_h)/|C_h| for every centroid (cosine up to the
    vector's own norm, which cancels in the per-vector argmax)."""
    terms = ", ".join(
        f"{_SQL_DOT.format(a='emb', b=_sql_centroid_literal(h))} / {repr(float(_centroid_norms[h]))}"
        for h in range(N_CENTROIDS)
    )
    return f"[{terms}]"


def _spark_centroid_scores() -> Column:
    terms = []
    for h in range(N_CENTROIDS):
        c = F.array(*[F.lit(float(v)) for v in _centroids[h]])
        terms.append(_dot(F.col("emb"), c) / F.lit(float(_centroid_norms[h])))
    return F.array(*terms)


@query(
    "ann_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, {_SQL_EMB} AS emb FROM embeddings),
    s AS (SELECT vec_id, emb, {_SQL_NORM} AS nrm,
                 {_sql_centroid_scores()} AS cs FROM e),
    n AS (SELECT vec_id, emb, nrm,
                 list_position(cs, list_max(cs)) AS cluster, cs FROM s),
    qp AS (  -- each query probes its top-{N_PROBE} centroids
      SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm,
             unnest([
               cluster,
               list_position(
                 list_transform(range(1, {N_CENTROIDS} + 1),
                                i -> CASE WHEN i = cluster THEN -1e300 ELSE cs[i] END),
                 list_max(
                   list_transform(range(1, {N_CENTROIDS} + 1),
                                  i -> CASE WHEN i = cluster THEN -1e300 ELSE cs[i] END)))
             ]) AS probe
      FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT qp.query_id, c.vec_id AS neighbor_id,
             {_SQL_DOT.format(a="qp.q_emb", b="c.emb")} / (qp.q_nrm * c.nrm) AS cos
      FROM qp JOIN n c ON c.cluster = qp.probe AND c.vec_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cos DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: every vector is assigned to its nearest coarse
    centroid (the inverted-list key); queries probe their top-{N_PROBE}
    centroids and rerank exactly within the probed lists. At 10^9 vectors
    the lists are the partition layout — assignment is a scan-side
    column, the probe join shuffles (cluster, id) pairs only, and rerank
    fan-in is nprobe/{N_CENTROIDS} of the corpus per query. Argmax ties
    break on first index in BOTH engines (array_position of the max)."""
    emb = _emb_double(t(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(_dot(F.col("emb"), F.col("emb")))
    n = (
        emb.withColumn("nrm", nrm)
        .withColumn("cs", _spark_centroid_scores())
        .withColumn("cluster", F.array_position(F.col("cs"), F.array_max("cs")))
    )
    # second-best centroid: mask the winner to -inf, argmax again
    masked = F.transform(
        F.sequence(F.lit(1), F.lit(N_CENTROIDS)),
        lambda i: F.when(i == F.col("cluster"), F.lit(-1e300)).otherwise(
            F.element_at(F.col("cs"), i.cast("int"))
        ),
    )
    q = (
        n.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("masked", masked)
        .withColumn("probe2", F.array_position(F.col("masked"), F.array_max("masked")))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(F.array("cluster", "probe2")).alias("probe"),
        )
    )
    scored = (
        n.join(
            F.broadcast(q),
            (F.col("cluster") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("q_emb"), F.col("emb")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "cos"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine"))
    )


# --------------------------------------------- PQ / ADC construction truth
#
# Product quantization (the 10^12-vector memory layout: M code bytes per
# vector instead of d floats) gated with the same construction-truth
# pattern as the trained IVF above: vectors are BUILT as a chosen
# sub-centroid per subspace plus noise far smaller than half the minimum
# intra-subspace centroid separation, so the nearest-sub-centroid code is
# provable and planted as truth columns; the ADC top-k truth is computed
# at build time with the exact sequential-fold arithmetic qcflow/ann.py
# uses (pq_lut + left-assoc adds), so the hash gate is exact. DuckDB
# reads ONLY the truth; Spark recovers codes through the codegen'd
# pq_assign projection and scores through the LUT projection + window
# top-k.

_PQ_M = 4  # subspaces
_PQ_KS = 8  # sub-centroids per subspace
_PQ_DSUB = 4  # dims per subspace (D = 16)
_PQ_N = 240
_PQ_NQ = 4  # vec_id < 4 are queries (full-precision, excluded from own list)
_PQ_NOISE = 0.005
_PQ_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_pq",
)
_PQ_VEC = os.path.join(_PQ_DIR, "vectors_v1.parquet")
_PQ_TRUTH = os.path.join(_PQ_DIR, "truth_adc_v1.parquet")


def _pq_codebooks() -> np.ndarray:
    """Deterministic (M, ks, dsub) codebooks, rounded so the literals in
    every dialect are the same shortest-repr doubles."""
    return np.round(
        np.random.default_rng(2718).normal(0.0, 1.0, (_PQ_M, _PQ_KS, _PQ_DSUB)), 6
    )


def _materialize_pq_truth() -> None:
    if os.path.exists(_PQ_VEC) and os.path.exists(_PQ_TRUTH):
        return
    import pandas as pd

    from qcflow.ann import pq_lut

    os.makedirs(_PQ_DIR, exist_ok=True)
    cb = _pq_codebooks()
    # provability margin: noise displaces each subvector by at most
    # ~|N(0, noise)|*sqrt(dsub+margin); require 4 sigma * sqrt(dsub)
    # below half the minimum centroid separation in every subspace
    for m in range(_PQ_M):
        d2 = (
            ((cb[m][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
            + np.eye(_PQ_KS) * 1e9
        )
        min_sep = float(np.sqrt(d2.min()))
        assert _PQ_NOISE * 8 * np.sqrt(_PQ_DSUB) < min_sep / 2, (m, min_sep)
    rng = np.random.default_rng(527)
    codes_true = rng.integers(0, _PQ_KS, (_PQ_N, _PQ_M))
    emb = np.empty((_PQ_N, _PQ_M * _PQ_DSUB))
    for m in range(_PQ_M):
        emb[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][codes_true[:, m]]
    emb = np.round(emb + rng.normal(0.0, _PQ_NOISE, emb.shape), 6)
    pd.DataFrame(
        {
            "vec_id": np.arange(_PQ_N, dtype=np.int64),
            "emb": [row.tolist() for row in emb],
            **{
                f"true_code_{m}": codes_true[:, m].astype(np.int32)
                for m in range(_PQ_M)
            },
        }
    ).to_parquet(_PQ_VEC, index=False)

    truth = []
    for q in range(_PQ_NQ):
        lut = pq_lut(emb[q], cb)
        scored = []
        for v in range(_PQ_N):
            if v == q:
                continue
            s = lut[0][codes_true[v, 0]]
            for m in range(1, _PQ_M):
                s = s + lut[m][codes_true[v, m]]
            scored.append((v, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for nb, s in scored[:TOP_K]:
            truth.append(
                {
                    "query_id": np.int64(q),
                    "neighbor_id": np.int64(nb),
                    "adc_score": _round_half_up4(s),
                }
            )
    pd.DataFrame(truth).to_parquet(_PQ_TRUTH, index=False)


_materialize_pq_truth()


@query(
    "ann_pq_assign",
    oracle=f"SELECT vec_id, "
    + ", ".join(f"true_code_{m} AS code_{m}" for m in range(_PQ_M))
    + f" FROM '{_PQ_VEC}'",
)
def ann_pq_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding as one codegen'd projection (qcflow/ann.pq_assign):
    every vector -> M sub-centroid codes, the 10^12-scale memory layout
    (M bytes/vector instead of d floats). Hash-gated against the planted
    construction-truth codes (margin argument in the module comment)."""
    from qcflow.ann import pq_assign

    _materialize_pq_truth()
    vec = spark.read.parquet(_PQ_VEC).select("vec_id", "emb")
    out = pq_assign(vec, _pq_codebooks())
    return out.select("vec_id", *[f"code_{m}" for m in range(_PQ_M)])


@query(
    "ann_pq_adc_topk",
    oracle=f"SELECT query_id, neighbor_id, adc_score FROM '{_PQ_TRUTH}'",
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k (qcflow/ann.pq_adc_topk): full-precision queries score
    coded vectors via M LUT lookups + adds in a pure projection — no
    decode, no Python, one scan of the codes table for all queries, then
    a WindowGroupLimit'd per-query top-k. Hash-gated against the ADC
    truth computed at fixture build with identical fold arithmetic."""
    from qcflow.ann import pq_adc_topk, pq_assign

    _materialize_pq_truth()
    cb = _pq_codebooks()
    vec = spark.read.parquet(_PQ_VEC).select("vec_id", "emb")
    codes = pq_assign(vec, cb).select(
        "vec_id", *[f"code_{m}" for m in range(_PQ_M)]
    )
    import pandas as pd  # fixture read for query vectors (driver-sized)

    qrows = pd.read_parquet(_PQ_VEC, columns=["vec_id", "emb"]).head(_PQ_NQ)
    queries = [(int(r.vec_id), np.asarray(r.emb)) for r in qrows.itertuples()]
    out = pq_adc_topk(codes, queries, cb, k=TOP_K)
    return out.select(
        "query_id", "neighbor_id", F.round("adc_score", 4).alias("adc_score")
    )


# ------------------------------------------ IVF+PQ composed construction truth
#
# Hierarchical planting gates the COMPOSED path (coarse pruning -> ADC)
# exactly: cluster i's vectors carry a large offset (+40) on dimension
# 4*i — the first dim of subspace i — and the PQ codebooks contain both
# the base sub-centroids and their offset variants (ks doubles to 16), so
# nearest-coarse-center AND nearest-sub-centroid are simultaneously
# provable (offset separation ~40 dwarfs base separation ~2 dwarfs noise
# 0.005). Truth replicates ivfpq_topk's driver arithmetic bit-for-bit:
# probe selection is the same numpy argsort of squared distances to the
# same planted centers, ADC scores the same pq_lut sequential fold.

_IP_NCL = 4  # coarse clusters (vec_id % 4 at build, provable via margin)
_IP_KS_BASE = 8
_IP_OFF = 40.0
_IP_N = 320
_IP_NQ = 4
_IP_NOISE = 0.005
_IP_NPROBE = 2
_IP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_ivfpq",
)
_IP_VEC = os.path.join(_IP_DIR, "vectors_v1.parquet")
_IP_TRUTH = os.path.join(_IP_DIR, "truth_v1.parquet")


def _ivfpq_centers() -> np.ndarray:
    d = _PQ_M * _PQ_DSUB
    centers = np.zeros((_IP_NCL, d))
    for i in range(_IP_NCL):
        centers[i, _PQ_DSUB * i] = _IP_OFF
    return centers


def _ivfpq_codebooks() -> np.ndarray:
    """(M, 16, dsub): base sub-centroids plus their coarse-offset
    variants (offset rides dim 0 of each subspace)."""
    base = np.round(
        np.random.default_rng(1618).normal(0.0, 1.0, (_PQ_M, _IP_KS_BASE, _PQ_DSUB)),
        6,
    )
    off = base.copy()
    off[:, :, 0] += _IP_OFF
    return np.concatenate([base, off], axis=1)


def _materialize_ivfpq_truth() -> None:
    if os.path.exists(_IP_VEC) and os.path.exists(_IP_TRUTH):
        return
    import pandas as pd

    from qcflow.ann import pq_lut

    os.makedirs(_IP_DIR, exist_ok=True)
    cb = _ivfpq_codebooks()
    for m in range(_PQ_M):
        d2 = (
            ((cb[m][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
            + np.eye(2 * _IP_KS_BASE) * 1e9
        )
        min_sep = float(np.sqrt(d2.min()))
        assert _IP_NOISE * 8 * np.sqrt(_PQ_DSUB) < min_sep / 2, (m, min_sep)
    rng = np.random.default_rng(941)
    clusters = (np.arange(_IP_N) % _IP_NCL).astype(np.int64)
    base_codes = rng.integers(0, _IP_KS_BASE, (_IP_N, _PQ_M))
    codes_true = base_codes.copy()
    emb = np.empty((_IP_N, _PQ_M * _PQ_DSUB))
    for m in range(_PQ_M):
        # subspace m gets the offset variant for vectors of cluster m
        codes_true[:, m] = base_codes[:, m] + _IP_KS_BASE * (clusters == m)
        emb[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][codes_true[:, m]]
    emb = np.round(emb + rng.normal(0.0, _IP_NOISE, emb.shape), 6)
    pd.DataFrame(
        {
            "vec_id": np.arange(_IP_N, dtype=np.int64),
            "emb": [row.tolist() for row in emb],
            "true_cluster": clusters,
            **{
                f"true_code_{m}": codes_true[:, m].astype(np.int32)
                for m in range(_PQ_M)
            },
        }
    ).to_parquet(_IP_VEC, index=False)

    centers = _ivfpq_centers()
    truth = []
    for q in range(_IP_NQ):
        d2 = ((centers - emb[q]) ** 2).sum(axis=1)
        probes = set(int(i) for i in np.argsort(d2)[:_IP_NPROBE])
        lut = pq_lut(emb[q], cb)
        scored = []
        for v in range(_IP_N):
            if v == q or int(clusters[v]) not in probes:
                continue
            s = lut[0][codes_true[v, 0]]
            for m in range(1, _PQ_M):
                s = s + lut[m][codes_true[v, m]]
            scored.append((v, s))
        scored.sort(key=lambda p: (-p[1], p[0]))
        for nb, s in scored[:TOP_K]:
            truth.append(
                {
                    "query_id": np.int64(q),
                    "neighbor_id": np.int64(nb),
                    "adc_score": _round_half_up4(s),
                }
            )
    pd.DataFrame(truth).to_parquet(_IP_TRUTH, index=False)


_materialize_ivfpq_truth()


@query(
    "ann_ivfpq_topk",
    oracle=f"SELECT query_id, neighbor_id, adc_score FROM '{_IP_TRUTH}'",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production ANN path (qcflow/ann.ivfpq_topk): coarse
    lists prune first (cluster-pruned scan of the codes table), ADC LUT
    lookups score within the probed lists, WindowGroupLimit'd top-k —
    hash-gated end to end against the hierarchical construction truth
    (module comment above: coarse margin 40 >> PQ margin ~2 >> noise)."""
    from qcflow.ann import ivfpq_topk

    _materialize_ivfpq_truth()
    vec = spark.read.parquet(_IP_VEC).select("vec_id", "emb")
    import pandas as pd

    qrows = pd.read_parquet(_IP_VEC, columns=["vec_id", "emb"]).head(_IP_NQ)
    queries = [(int(r.vec_id), np.asarray(r.emb)) for r in qrows.itertuples()]
    out = ivfpq_topk(
        vec,
        queries,
        _ivfpq_centers(),
        _ivfpq_codebooks(),
        k=TOP_K,
        nprobe=_IP_NPROBE,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("adc_score", 4).alias("adc_score")
    )


# --------------------------------------- residual IVFPQ construction truth
#
# The Faiss-style variant: PQ encodes the RESIDUAL v - center[cluster],
# so one shared codebook quantizes every list tightly (residuals
# concentrate near zero). Planting is SIMPLER than the absolute-space
# composed gate: vector = coarse_center + cb-chosen residual + noise,
# and the base codebook needs no offset variants because the center is
# subtracted before encoding. Margins: coarse separation 40*sqrt(2)
# between centers vs max residual norm ~4 (cluster assignment provable);
# residual sub-centroid separation ~2 vs noise 0.005 (codes provable).
# Truth replicates ivfpq_residual_topk's arithmetic: same numpy probe
# argsort, same pq_lut_l2 sequential fold, left-assoc adds.

_IR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_ivfpq_res",
)
_IR_VEC = os.path.join(_IR_DIR, "vectors_v1.parquet")
_IR_TRUTH = os.path.join(_IR_DIR, "truth_v1.parquet")


def _ir_codebooks() -> np.ndarray:
    return np.round(
        np.random.default_rng(3141).normal(0.0, 1.0, (_PQ_M, _IP_KS_BASE, _PQ_DSUB)),
        6,
    )


def _materialize_ivfpq_residual_truth() -> None:
    if os.path.exists(_IR_VEC) and os.path.exists(_IR_TRUTH):
        return
    import pandas as pd

    from qcflow.ann import pq_lut_l2

    os.makedirs(_IR_DIR, exist_ok=True)
    cb = _ir_codebooks()
    for m in range(_PQ_M):
        d2 = (
            ((cb[m][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
            + np.eye(_IP_KS_BASE) * 1e9
        )
        min_sep = float(np.sqrt(d2.min()))
        assert _IP_NOISE * 8 * np.sqrt(_PQ_DSUB) < min_sep / 2, (m, min_sep)
    centers = _ivfpq_centers()
    rng = np.random.default_rng(653)
    clusters = (np.arange(_IP_N) % _IP_NCL).astype(np.int64)
    codes_true = rng.integers(0, _IP_KS_BASE, (_IP_N, _PQ_M))
    resid = np.empty((_IP_N, _PQ_M * _PQ_DSUB))
    for m in range(_PQ_M):
        resid[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][codes_true[:, m]]
    emb = np.round(centers[clusters] + resid + rng.normal(0.0, _IP_NOISE, resid.shape), 6)
    # coarse-assignment margin: every vector strictly nearest its own center
    max_res = float(np.sqrt(((emb - centers[clusters]) ** 2).sum(1)).max())
    assert max_res < _IP_OFF / 4, max_res
    pd.DataFrame(
        {
            "vec_id": np.arange(_IP_N, dtype=np.int64),
            "emb": [row.tolist() for row in emb],
            "true_cluster": clusters,
            **{
                f"true_code_{m}": codes_true[:, m].astype(np.int32)
                for m in range(_PQ_M)
            },
        }
    ).to_parquet(_IR_VEC, index=False)

    truth = []
    for q in range(_IP_NQ):
        d2c = ((centers - emb[q]) ** 2).sum(axis=1)
        probes = [int(i) for i in np.argsort(d2c)[:_IP_NPROBE]]
        scored = []
        for probe in probes:
            lut = pq_lut_l2(emb[q] - centers[probe], cb)
            for v in range(_IP_N):
                if v == q or int(clusters[v]) != probe:
                    continue
                s = lut[0][codes_true[v, 0]]
                for m in range(1, _PQ_M):
                    s = s + lut[m][codes_true[v, m]]
                scored.append((v, s))
        scored.sort(key=lambda p: (p[1], p[0]))  # ASCENDING distance
        for nb, s in scored[:TOP_K]:
            truth.append(
                {
                    "query_id": np.int64(q),
                    "neighbor_id": np.int64(nb),
                    "adc_dist": _round_half_up4(s),
                }
            )
    pd.DataFrame(truth).to_parquet(_IR_TRUTH, index=False)


_materialize_ivfpq_residual_truth()


@query(
    "ann_ivfpq_residual_topk",
    oracle=f"SELECT query_id, neighbor_id, adc_dist FROM '{_IR_TRUTH}'",
)
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVFPQ (qcflow/ann.ivfpq_residual_topk): per-row centroid
    picked from a literal array-of-arrays, residual via zip_with, PQ
    codes in the same codegen'd projection; search is L2 ADC per
    (query, probed list) with per-list LUTs. Hash-gated end to end
    against the residual construction truth (module comment)."""
    from qcflow.ann import ivfpq_residual_topk

    _materialize_ivfpq_residual_truth()
    vec = spark.read.parquet(_IR_VEC).select("vec_id", "emb")
    import pandas as pd

    qrows = pd.read_parquet(_IR_VEC, columns=["vec_id", "emb"]).head(_IP_NQ)
    queries = [(int(r.vec_id), np.asarray(r.emb)) for r in qrows.itertuples()]
    out = ivfpq_residual_topk(
        vec,
        queries,
        _ivfpq_centers(),
        _ir_codebooks(),
        k=TOP_K,
        nprobe=_IP_NPROBE,
    )
    return out.select(
        "query_id", "neighbor_id", F.round("adc_dist", 4).alias("adc_dist")
    )


# ----------------------------------------- PQ TRAINING construction truth
#
# Gates qcflow/ann.pq_train (sample-Gonzalez seeding + one-shuffle-per-
# iteration Lloyd over all subspaces) label-permutation-free, the
# ann_kmeans_assign pattern lifted to per-subspace partitions: vectors
# are planted as a chosen sub-centroid per subspace plus noise far below
# half the minimum intra-subspace centroid separation, and — unlike the
# ann_pq fixture — each subspace gets a DIFFERENT partition of the rows
# (mixed base-ks digit functions of vec_id), so swapping subspace
# outputs cannot go unnoticed. The gated output is the min-vec_id
# representative of each row's trained code group per subspace; with
# margins the trained partition provably equals the planted one, so the
# representative equals the planted truth column regardless of how
# k-means permuted the code labels. DuckDB reads ONLY the truth.

_PT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_pq_train",
)
_PT_VEC = os.path.join(_PT_DIR, "vectors_v1.parquet")


def _pt_codebooks() -> np.ndarray:
    return np.round(
        np.random.default_rng(9273).normal(0.0, 1.0, (_PQ_M, _PQ_KS, _PQ_DSUB)), 6
    )


def _pt_codes(n: int) -> np.ndarray:
    """A different row partition per subspace (base-ks digit mixes), so
    the per-subspace gates are independent."""
    i = np.arange(n)
    hi = i // _PQ_KS
    cols = [
        i % _PQ_KS,
        hi % _PQ_KS,
        (i + hi) % _PQ_KS,
        (5 * i + 3 * hi) % _PQ_KS,
    ]
    return np.stack(cols[: _PQ_M], axis=1).astype(np.int64)


def _materialize_pq_train_truth() -> None:
    if os.path.exists(_PT_VEC):
        return
    import pandas as pd

    os.makedirs(_PT_DIR, exist_ok=True)
    cb = _pt_codebooks()
    for m in range(_PQ_M):
        d2 = (
            ((cb[m][:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
            + np.eye(_PQ_KS) * 1e9
        )
        min_sep = float(np.sqrt(d2.min()))
        assert _PQ_NOISE * 8 * np.sqrt(_PQ_DSUB) < min_sep / 2, (m, min_sep)
    rng = np.random.default_rng(3511)
    codes = _pt_codes(_PQ_N)
    assert all(
        len(np.unique(codes[:, m])) == _PQ_KS for m in range(_PQ_M)
    ), "every code must be occupied in every subspace"
    emb = np.empty((_PQ_N, _PQ_M * _PQ_DSUB))
    for m in range(_PQ_M):
        emb[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][codes[:, m]]
    emb = np.round(emb + rng.normal(0.0, _PQ_NOISE, emb.shape), 6)
    reps = np.empty_like(codes)
    ids = np.arange(_PQ_N)
    for m in range(_PQ_M):
        first = {j: int(ids[codes[:, m] == j].min()) for j in range(_PQ_KS)}
        reps[:, m] = [first[int(c)] for c in codes[:, m]]
    pd.DataFrame(
        {
            "vec_id": ids.astype(np.int64),
            "emb": [row.tolist() for row in emb],
            **{
                f"true_rep_{m}": reps[:, m].astype(np.int64)
                for m in range(_PQ_M)
            },
        }
    ).to_parquet(_PT_VEC, index=False)


_materialize_pq_train_truth()


@query(
    "ann_pq_train",
    oracle=f"SELECT vec_id, "
    + ", ".join(f"true_rep_{m} AS rep_{m}" for m in range(_PQ_M))
    + f" FROM '{_PT_VEC}'",
)
def ann_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED product quantizer, gated on the partition it recovers:
    pq_train seeds each subspace by farthest-first on a deterministic
    hash sample and runs Lloyd with ONE pq_assign projection + ONE
    (subspace, code, dim) groupBy per iteration; the fixture's planted
    margins (module comment) make the recovered per-subspace partition
    provably equal the planted one, and the min-vec_id representative
    makes the gate label-permutation-free."""
    from qcflow.ann import pq_assign, pq_train

    _materialize_pq_train_truth()
    vec = spark.read.parquet(_PT_VEC).select("vec_id", "emb")
    cb = pq_train(vec, M=_PQ_M, ks=_PQ_KS, n_iter=3, sample_size=100_000)
    coded = pq_assign(vec, cb)
    out = coded.select("vec_id", *[f"code_{m}" for m in range(_PQ_M)])
    for m in range(_PQ_M):
        w = Window.partitionBy(f"code_{m}")
        out = out.withColumn(f"rep_{m}", F.min("vec_id").over(w))
    return out.select("vec_id", *[f"rep_{m}" for m in range(_PQ_M)])


# ----------------------------- fully-TRAINED residual IVFPQ, rank-gated
#
# The end-to-end trained pipeline (ivfpq_train: coarse Lloyd k-means ->
# per-subspace residual pq_train -> batch ivfpq_residual_topk search)
# cannot be gated on ADC distance VALUES — trained centroids are data
# means, not the planted codebook — so the gate is the per-query
# neighbor RANK list, provable because the fixture is built so the
# trained index reproduces the planted geometry to ~1e-12:
#
# - ZERO planted noise: every vector is exactly center[cluster] +
#   cb[m][code_m] per subspace, so each per-(subspace, code) residual
#   group is a single point (up to ~1e-15 float-sum effects) and the
#   trained sub-centroid equals the planted one minus the cluster-mean
#   residual mu.
# - CODE-BALANCED clusters: within each coarse cluster every code value
#   appears equally often in every subspace (Latin-square digit
#   functions of the row index), so the mean residual mu is the SAME
#   constant for every cluster -> the trained coarse center is exactly
#   planted center + mu, and mu CANCELS in the trained ADC distance:
#   ||(q - (c+mu)) - (cb - mu)||^2 = ||(q - c) - cb||^2. Trained
#   distances equal planted distances up to ~1e-12 aggregation drift.
# - The builder ASSERTS every adjacent pair in each query's candidate
#   distance spectrum differs by > 1e-6 (unique (probe, code-tuple) per
#   candidate -> no ties at all), and that coarse probe-selection gaps
#   against the mu-shifted centers exceed 1e-3 — both orders of
#   magnitude above the drift, so the trained ranks provably equal the
#   planted truth.

_RT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "ann_ivfpq_trained",
)
_RT_VEC = os.path.join(_RT_DIR, "vectors_v2.parquet")
_RT_TRUTH = os.path.join(_RT_DIR, "truth_v2.parquet")
_RT_PER = 64  # rows per coarse cluster (8x8 digit square -> balanced codes)
_RT_N = _IP_NCL * _RT_PER
_RT_MIN_GAP = 1e-6
_RT_PROBE_GAP = 1e-3


def _rt_codebooks() -> np.ndarray:
    return np.round(
        np.random.default_rng(8117).normal(0.0, 1.0, (_PQ_M, _PQ_KS, _PQ_DSUB)), 6
    )


def _rt_codes() -> np.ndarray:
    """Per-cluster Latin-square digit codes: row r (0..63) of each
    cluster gets (a, b, a+b, a+3b) mod 8 with a = r % 8, b = r // 8 —
    every code value appears exactly 8 times per subspace per cluster
    (the balance that makes the cluster-mean residual constant), and
    every (cluster, tuple) is unique (no distance ties at all)."""
    r = np.arange(_RT_PER)
    a, b = r % _PQ_KS, r // _PQ_KS
    block = np.stack([a, b, (a + b) % _PQ_KS, (a + 3 * b) % _PQ_KS], axis=1)
    return np.tile(block, (_IP_NCL, 1)).astype(np.int64)


def _materialize_ivfpq_trained_truth() -> None:
    if os.path.exists(_RT_VEC) and os.path.exists(_RT_TRUTH):
        return
    import pandas as pd

    from qcflow.ann import pq_lut_l2

    os.makedirs(_RT_DIR, exist_ok=True)
    cb = _rt_codebooks()
    centers = _ivfpq_centers()
    clusters = np.repeat(np.arange(_IP_NCL), _RT_PER)
    codes = _rt_codes()
    resid = np.empty((_RT_N, _PQ_M * _PQ_DSUB))
    for m in range(_PQ_M):
        resid[:, m * _PQ_DSUB : (m + 1) * _PQ_DSUB] = cb[m][codes[:, m]]
    emb = centers[clusters] + resid  # ZERO noise (see module comment)
    pd.DataFrame(
        {
            "vec_id": np.arange(_RT_N, dtype=np.int64),
            "emb": [row.tolist() for row in emb],
            "true_cluster": clusters,
        }
    ).to_parquet(_RT_VEC, index=False)

    # the trained coarse centers are planted + mu (mu = mean residual,
    # identical per cluster by balance); probe SELECTION therefore runs
    # against the mu-shifted centers — mu cancels in the distances
    mu = np.concatenate([cb[m].mean(axis=0) for m in range(_PQ_M)])
    shifted = centers + mu
    truth = []
    q_ids = [c * _RT_PER for c in range(_IP_NCL)]
    for q in q_ids:
        d2c = np.sort(((shifted - emb[q]) ** 2).sum(axis=1))
        assert float(np.diff(d2c).min()) > _RT_PROBE_GAP, d2c
        probes = [
            int(i)
            for i in np.argsort(((shifted - emb[q]) ** 2).sum(axis=1))[:_IP_NPROBE]
        ]
        scored = []
        for probe in probes:
            lut = pq_lut_l2(emb[q] - centers[probe], cb)
            for v in range(_RT_N):
                if v == q or int(clusters[v]) != probe:
                    continue
                s = lut[0][codes[v, 0]]
                for m in range(1, _PQ_M):
                    s = s + lut[m][codes[v, m]]
                scored.append((v, s))
        scored.sort(key=lambda p: (p[1], p[0]))
        gaps = np.diff([s for _, s in scored])
        assert float(gaps.min()) > _RT_MIN_GAP, float(gaps.min())
        for rank, (nb, _s) in enumerate(scored[:TOP_K], start=1):
            truth.append(
                {
                    "query_id": np.int64(q),
                    "neighbor_id": np.int64(nb),
                    "rank": np.int64(rank),
                }
            )
    pd.DataFrame(truth).to_parquet(_RT_TRUTH, index=False)


_materialize_ivfpq_trained_truth()


@query(
    "ann_ivfpq_residual_trained",
    oracle=f"SELECT query_id, neighbor_id, rank FROM '{_RT_TRUTH}'",
)
def ann_ivfpq_residual_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-TRAINED residual IVFPQ pipeline, hash-gated end to end
    on neighbor ranks: ivfpq_train runs distributed coarse k-means
    (farthest-first seeding) and per-subspace residual pq_train (sample
    Gonzalez + one-shuffle Lloyd), then ivfpq_residual_topk searches
    through the batch single-join path. The zero-noise code-balanced
    construction (module comment) makes the trained index's distances
    equal the planted ones to ~1e-12, six orders below the asserted
    spectrum gaps — so the rank lists are provably identical."""
    from qcflow.ann import ivfpq_residual_topk, ivfpq_train

    _materialize_ivfpq_trained_truth()
    vec = spark.read.parquet(_RT_VEC).select("vec_id", "emb")
    cents, cbs = ivfpq_train(
        vec, k_coarse=_IP_NCL, M=_PQ_M, ks=_PQ_KS,
        coarse_iter=3, pq_iter=3, sample_size=100_000,
    )
    import pandas as pd

    qpdf = pd.read_parquet(_RT_VEC, columns=["vec_id", "emb"])
    qpdf = qpdf[qpdf.vec_id % _RT_PER == 0]
    queries = [(int(r.vec_id), np.asarray(r.emb)) for r in qpdf.itertuples()]
    out = ivfpq_residual_topk(
        vec, queries, cents, cbs, k=TOP_K, nprobe=_IP_NPROBE
    )
    return out.select("query_id", "neighbor_id", "rank")


# ---------------------------------------- incremental index maintenance
#
# Construction truth for the embedding-store lifecycle (qcflow/
# index_store.py): vectors are planted EXACTLY at centroid[c] +
# residual-codebook reconstruction of planted codes — zero noise, so
# cluster assignment and residual PQ codes are provably recovered
# (distance 0 to the planted codeword vs a positive asserted margin to
# every other; coarse separation dwarfs the reconstruction norm). Three
# batches: 0 committed, then a CRASHED append (id burned, no commit),
# then batch 1 committed with a deliberately skewed list distribution.
# The gates check (a) the committed view = batches 0+1 with the exact
# planted (cluster, codes, snapshot_id) — crashed rows invisible, the
# burned id visible in batch 1's snapshot_id=2 — and (b) the per-list
# drift metric between the two commits. DuckDB reads truth columns only.

_IX_NCL = 8
_IX_N0, _IX_N1, _IX_NCRASH = 400, 300, 100
_IX_FIX = os.path.join(_PQ_DIR, "index_store_v1.parquet")


def _ix_params() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(6151)
    centers = np.round(
        rng.normal(0.0, 1.0, (_IX_NCL, _PQ_M * _PQ_DSUB)) * 60.0, 6
    )
    cbs = np.round(rng.normal(0.0, 1.0, (_PQ_M, _PQ_KS, _PQ_DSUB)), 6)
    return centers, cbs


def _materialize_index_fixture() -> None:
    if os.path.exists(_IX_FIX):
        return
    import pandas as pd

    os.makedirs(_PQ_DIR, exist_ok=True)
    centers, cbs = _ix_params()
    # provability: distinct codewords per subspace, and coarse
    # separation > 2x the largest possible reconstruction norm
    for m in range(_PQ_M):
        d2 = (
            ((cbs[m][:, None, :] - cbs[m][None, :, :]) ** 2).sum(-1)
            + np.eye(_PQ_KS) * 1e9
        )
        assert float(d2.min()) > 1e-3, m
    cd2 = ((centers[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    min_sep = float(np.sqrt((cd2 + np.eye(_IX_NCL) * 1e18).min()))
    max_recon = float(
        np.sqrt((np.abs(cbs).max(axis=1) ** 2).sum()) * np.sqrt(_PQ_M)
    ) * 4  # loose bound on |recon|
    assert max_recon < min_sep / 2, (max_recon, min_sep)

    rng = np.random.default_rng(6152)
    rows = []
    n_total = _IX_N0 + _IX_NCRASH + _IX_N1
    for vid in range(n_total):
        if vid < _IX_N0:
            batch, cl = 0, vid % _IX_NCL
        elif vid < _IX_N0 + _IX_NCRASH:
            batch, cl = 2, vid % _IX_NCL  # crashed batch
        else:
            batch, cl = 1, vid % 4  # skewed: only lists 1..4 grow
        codes = rng.integers(0, _PQ_KS, _PQ_M)
        emb = centers[cl].copy()
        for m in range(_PQ_M):
            emb[m * _PQ_DSUB : (m + 1) * _PQ_DSUB] += cbs[m][codes[m]]
        rows.append(
            {
                "vec_id": vid,
                "emb": emb.tolist(),
                "batch": batch,
                "true_cluster": cl + 1,
                **{
                    f"true_code_{m}": int(codes[m]) for m in range(_PQ_M)
                },
            }
        )
    pd.DataFrame(rows).to_parquet(_IX_FIX, index=False)


def _build_index_store(spark: SparkSession) -> tuple[str, int, int]:
    """Replay the lifecycle into a fresh store dir: init (frozen planted
    params) -> append batch 0 -> CRASH mid-append of the poison batch ->
    append batch 1. Returns (dir, sid0, sid1)."""
    import shutil
    import tempfile

    from qcflow import index_store as ix

    _materialize_index_fixture()
    d = os.path.join(tempfile.gettempdir(), "qcflow_ix_store")
    shutil.rmtree(d, ignore_errors=True)
    centers, cbs = _ix_params()
    ix.init_index(d, centers, cbs)
    vec = spark.read.parquet(_IX_FIX).select("vec_id", "emb", "batch")
    sid0 = ix.append_vectors(
        spark, d, vec.filter("batch = 0").drop("batch")
    )
    ix.append_vectors(
        spark, d, vec.filter("batch = 2").drop("batch"),
        _crash_before_commit=True,
    )
    sid1 = ix.append_vectors(
        spark, d, vec.filter("batch = 1").drop("batch")
    )
    return d, sid0, sid1


@query(
    "ann_index_incremental",
    oracle=f"""
    SELECT vec_id,
           CAST(true_cluster AS INT) AS cluster,
           {", ".join(f"CAST(true_code_{m} AS INT) AS code_{m}" for m in range(_PQ_M))},
           CAST(CASE WHEN batch = 0 THEN 0 ELSE 2 END AS BIGINT) AS snapshot_id
    FROM '{_IX_FIX}'
    WHERE batch IN (0, 1)
    """,
)
def ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVFPQ maintenance, hash-gated end to end: new batches
    are appended to a frozen trained index via assign+encode only
    (ann.ivfpq_encode — no retrain), under the snapshot manifest of
    qcflow/index_store.py. The committed read must recover EXACTLY the
    planted (cluster, codes) of the two committed batches THROUGH the
    store: the crashed append's rows are invisible, and its burned
    snapshot id surfaces as batch 1 committing at id 2 — both gated by
    the snapshot_id column."""
    from qcflow.index_store import read_index

    d, _, _ = _build_index_store(spark)
    return read_index(spark, d).select(
        "vec_id",
        "cluster",
        *[f"code_{m}" for m in range(_PQ_M)],
        "snapshot_id",
    )


@query(
    "ann_index_drift",
    oracle=f"""
    SELECT CAST(true_cluster AS INT) AS cluster,
           CAST(COUNT(*) FILTER (WHERE batch = 0) AS BIGINT) AS n_before,
           CAST(COUNT(*) AS BIGINT) AS n_after,
           CAST(COUNT(*) FILTER (WHERE batch = 1) AS BIGINT) AS delta
    FROM '{_IX_FIX}'
    WHERE batch IN (0, 1)
    GROUP BY true_cluster
    """,
)
def ann_index_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-list occupancy drift between the two committed snapshots —
    the retrain-trigger metric: batch 1 deliberately lands only in lists
    1..4, so their deltas are positive and lists 5..8 stay flat. One
    scan with conditional sums (index_store.list_drift); the crashed
    batch must not count anywhere."""
    from qcflow.index_store import list_drift

    d, sid0, sid1 = _build_index_store(spark)
    return list_drift(spark, d, sid0, sid1)
