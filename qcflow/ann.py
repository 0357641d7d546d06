"""Distributed k-means + trained-IVF ANN over embedding columns.

The parity layer's ``ann_ivf`` uses a FIXED random codebook so its DuckDB
oracle stays exact; this module is the production path: Lloyd's algorithm
run as DataFrame jobs, then the trained codebook drives the same
inverted-list layout.

Scale shape of each Lloyd iteration (corpus of n vectors, k centroids,
d dims):
- ASSIGN is a pure column expression — the k squared-distance terms are
  inlined as array literals (broadcast-by-literal; k*d doubles, tiny),
  evaluated in one codegen'd projection. No shuffle, no Python.
- UPDATE is one groupBy: posexplode to (cluster, dim, value) and average
  — shuffle keys are (cluster, dim), k*d groups, with map-side partial
  aggregation doing almost all the work. The driver receives only the
  k x d codebook per iteration (the classic MLlib recipe).
- Empty clusters keep their previous centroid.

Initialization is a deterministic hash-sample (smallest xxhash64 of the
id column), so runs are reproducible across partitionings.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential left fold — the one dot-product definition every path
    in this module (and the oracle dialect in parity/similarity.py)
    shares, so float results agree bit-for-bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _sq_norm(c: Column) -> Column:
    return F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )


def _sq_dist(emb_col: str, centroid: np.ndarray) -> Column:
    """|v - c|^2 up to the constant |v|^2 (same for every centroid, so it
    cancels in the argmin): -2 * dot(v, c) + |c|^2."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return -2.0 * _dot(F.col(emb_col), c) + float((centroid**2).sum())


def assign_clusters(
    df: DataFrame, centroids: np.ndarray, emb_col: str = "emb", out_col: str = "cluster"
) -> DataFrame:
    """Nearest-centroid (L2) assignment as one column expression;
    1-based index, first-minimum tie-break."""
    scores = F.array(*[_sq_dist(emb_col, c) for c in centroids])
    return df.withColumn(
        out_col, F.array_position(scores, F.array_min(scores)).cast("int")
    )


def farthest_first_init(
    df: DataFrame, k: int, emb_col: str = "emb", id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic farthest-first traversal (Gonzalez): start from the
    hash-minimal row, then repeatedly take the point maximizing its
    distance to the chosen set. When the data is a mixture whose
    inter-center separation exceeds every intra-cluster diameter, this
    provably seeds each cluster exactly once (the classic 2-approximation
    argument) — the property the construction-truth ANN oracle relies on.
    Cost: k scalar-returning jobs; the driver only ever holds k x d."""
    first = (
        df.select(id_col, emb_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("farthest_first_init: empty input")
    cents = [np.array(first[0][emb_col], dtype=np.float64)]
    for _ in range(k - 1):
        # |v|^2 is constant across centroids: hoist the O(d) fold out of
        # the per-centroid array (Spark does not CSE higher-order
        # aggregate lambdas, so inlining it costs len(cents) redundant
        # folds per row) — min(|v|^2 + t_c) = |v|^2 + min(t_c)
        mind = _sq_norm(F.col(emb_col)) + F.array_min(
            F.array(*[_sq_dist(emb_col, c) for c in cents])
        )
        r = (
            df.select(id_col, emb_col, mind.alias("_d"))
            .orderBy(F.desc("_d"), id_col)
            .limit(1)
            .collect()
        )[0]
        if r["_d"] <= 0.0:
            raise ValueError(
                f"farthest_first_init: fewer than k={k} distinct vectors"
            )
        cents.append(np.array(r[emb_col], dtype=np.float64))
    return np.stack(cents)


def kmeans_fit(
    df: DataFrame,
    k: int,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    n_iter: int = 10,
    tol: float = 1e-6,
    init: str = "hash",
) -> np.ndarray:
    """Lloyd's k-means; returns the (k, d) codebook. ``df[emb_col]`` must
    be array<double>. Deterministic given the data and id column.
    ``init='farthest'`` uses the farthest-first traversal (one seed per
    well-separated cluster, guaranteed); ``'hash'`` is the cheap default
    (one job instead of k)."""
    if init == "farthest":
        centroids = farthest_first_init(df, k, emb_col=emb_col, id_col=id_col)
        return _lloyd(df, centroids, emb_col, id_col, n_iter, tol)
    init_rows = (
        df.select(id_col, emb_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(4 * k)  # headroom so duplicate vectors can be skipped
        .collect()
    )
    init = init_rows
    # distinct seed vectors only: hash-colliding duplicate embeddings
    # would seed coincident centroids that can never separate
    seeds, seen = [], set()
    for r in init:
        key = tuple(r[emb_col])
        if key not in seen:
            seen.add(key)
            seeds.append(r[emb_col])
        if len(seeds) == k:
            break
    if len(seeds) < k:
        raise ValueError(
            f"kmeans_fit: need k={k} distinct vectors, input has "
            f"{len(seeds)} among the first {len(init)} sampled rows"
        )
    centroids = np.array(seeds, dtype=np.float64)
    return _lloyd(df, centroids, emb_col, id_col, n_iter, tol)


def _lloyd(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str,
    id_col: str,
    n_iter: int,
    tol: float,
) -> np.ndarray:
    data = df.select(id_col, emb_col)
    for _ in range(n_iter):
        assigned = assign_clusters(data, centroids, emb_col=emb_col)
        rows = (
            assigned.select("cluster", F.posexplode(emb_col).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new = centroids.copy()  # empty clusters keep their centroid
        for r in rows:
            new[r["cluster"] - 1, r["dim"]] = r["mean"]
        shift = float(np.abs(new - centroids).max())
        centroids = new
        if shift < tol:
            break
    return centroids


def inertia(df: DataFrame, centroids: np.ndarray, emb_col: str = "emb") -> float:
    """Sum of squared distances to the assigned centroid (the k-means
    objective) — one aggregate, used to monitor convergence."""
    scores = F.array(*[_sq_dist(emb_col, c) for c in centroids])
    return float(
        df.select((F.array_min(scores) + _sq_norm(F.col(emb_col))).alias("d2"))
        .agg(F.sum("d2"))
        .collect()[0][0]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """Trained-IVF ANN: corpus rows live in their nearest-centroid list;
    each query probes its ``nprobe`` nearest lists and reranks exactly by
    cosine. Returns (query_id, neighbor_id, cosine, rank). At scale the
    cluster column is the partition layout and the probe join shuffles
    (cluster, id) pairs only."""
    nrm = F.sqrt(_sq_norm(F.col(emb_col)))
    lists = assign_clusters(corpus, centroids, emb_col=emb_col).withColumn("nrm", nrm)
    scores = F.array(*[_sq_dist(emb_col, c) for c in centroids])
    probes = (
        queries.withColumn("_s", scores)
        .withColumn("nrm", nrm)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(emb_col).alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.explode(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.transform(
                                F.sequence(F.lit(1), F.lit(len(centroids))),
                                lambda i: F.struct(
                                    F.element_at(F.col("_s"), i.cast("int")).alias("d"),
                                    i.cast("int").alias("idx"),
                                ),
                            )
                        ),
                        lambda s: s["idx"],
                    ),
                    1,
                    nprobe,
                )
            ).alias("probe"),
        )
    )
    dot = _dot(F.col("q_emb"), F.col(emb_col))
    scored = lists.join(
        F.broadcast(probes),
        (F.col("cluster") == F.col("probe"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (dot / (F.col("q_nrm") * F.col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ------------------------------------------------------ product quantization
#
# The 100 TB ANN memory layout: each vector is compressed to M subspace
# code bytes (here M small ints), so a 10^12-vector index is M TB of
# codes instead of 4*d TB of floats. Search is ADC (asymmetric distance
# computation): the QUERY stays full-precision; a per-query lookup table
# of subspace partial dot products (M x ks doubles, computed once on the
# driver) turns each candidate's score into M array lookups + adds — a
# pure codegen'd projection over the codes table, no decode, no Python.
# Jegou et al., "Product Quantization for Nearest Neighbor Search",
# TPAMI 2011. In production PQ nests inside IVF (probe lists, then ADC
# within them) — ``ivfpq_topk`` below; each layer AND the composition
# are hash-gated (parity/similarity.py construction truths).


def pq_assign(
    df: DataFrame,
    codebooks: np.ndarray,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as its nearest sub-centroid per subspace.

    ``codebooks``: (M, ks, dsub) — subspace m quantizes dims
    [m*dsub, (m+1)*dsub). Like ``assign_clusters``, the M * ks
    squared-distance terms are inlined literals evaluated in ONE
    codegen'd projection: no shuffle, no Python, no UDF. Output adds
    ``code_0 .. code_{M-1}`` (0-based int codes)."""
    M, ks, dsub = codebooks.shape
    cols = [df[c] for c in df.columns]
    for m in range(M):
        sub = F.slice(F.col(emb_col), m * dsub + 1, dsub)
        scores = F.array(
            *[
                -2.0 * _dot(sub, F.array(*[F.lit(float(x)) for x in c]))
                + float((c**2).sum())
                for c in codebooks[m]
            ]
        )
        cols.append(
            (F.array_position(scores, F.array_min(scores)) - 1)
            .cast("int")
            .alias(f"code_{m}")
        )
    return df.select(*cols)


def pq_lut(query: np.ndarray, codebooks: np.ndarray) -> list[list[float]]:
    """Per-query ADC lookup table: lut[m][j] = <query_sub_m, c_mj> as the
    same sequential left-fold double sum every dot in this module uses —
    bit-for-bit reproducible on the driver, in the executor projection,
    and in the parity oracle's truth builder. O(M * ks * dsub), driver-
    sized regardless of corpus size."""
    M, ks, dsub = codebooks.shape
    lut = []
    for m in range(M):
        sub = query[m * dsub : (m + 1) * dsub]
        row = []
        for j in range(ks):
            acc = 0.0
            for x, y in zip(sub, codebooks[m][j]):
                acc = acc + x * y
            row.append(acc)
        lut.append(row)
    return lut


def pq_adc_topk(
    codes: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k inner product: for each (query_id, vector), score every
    coded row as lut_0[code_0] + ... + lut_{M-1}[code_{M-1}] (left-assoc,
    so the float result is deterministic), then per-query top-k. Each
    query is one projection over the codes table with its LUT inlined as
    M literal arrays (broadcast-by-literal); the union of Q dimension-
    sized projections reuses one scan of the codes. Returns (query_id,
    neighbor_id, adc_score, rank)."""
    if not queries:
        raise ValueError("pq_adc_topk: queries must be non-empty")
    M = codebooks.shape[0]
    per_q = []
    for qid, qvec in queries:
        lut = pq_lut(np.asarray(qvec, dtype=np.float64), codebooks)
        score = None
        for m in range(M):
            arr = F.array(*[F.lit(v) for v in lut[m]])
            term = F.element_at(arr, F.col(f"code_{m}") + 1)
            score = term if score is None else score + term
        per_q.append(
            codes.filter(F.col(id_col) != qid).select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                score.alias("adc_score"),
            )
        )
    out = per_q[0]
    for df_q in per_q[1:]:
        out = out.unionByName(df_q)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """The production nesting: IVF coarse lists pruned first, ADC within
    the probed lists only. The corpus is stored ONCE as
    (cluster, id, code_0..code_{M-1}) — at 10^12 vectors that table is
    M bytes/vector partitioned by list, and a query touches
    nprobe/k_lists of it, scored by LUT lookups with no vector decode.

    Probes are resolved on the driver (k_lists x d is driver-sized, the
    same trick as the LUT); each query becomes a cluster-pruned
    projection over the codes table, so the scan prunes to the probed
    lists before any scoring work. Non-residual PQ (codes quantize the
    absolute vector, not v - centroid): simpler, and exact enough when
    the codebook spans the occupied space — recall vs the exact baseline
    is pinned in tests/test_ann_pq.py."""
    if not queries:
        raise ValueError("ivfpq_topk: queries must be non-empty")
    coded = pq_assign(
        assign_clusters(corpus, centroids, emb_col=emb_col),
        codebooks,
        emb_col=emb_col,
        id_col=id_col,
    ).select(id_col, "cluster", *[f"code_{m}" for m in range(codebooks.shape[0])])
    M = codebooks.shape[0]
    per_q = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        d2 = ((centroids - q) ** 2).sum(axis=1)
        probes = [int(i) + 1 for i in np.argsort(d2)[:nprobe]]  # 1-based
        lut = pq_lut(q, codebooks)
        score = None
        for m in range(M):
            arr = F.array(*[F.lit(v) for v in lut[m]])
            term = F.element_at(arr, F.col(f"code_{m}") + 1)
            score = term if score is None else score + term
        per_q.append(
            coded.filter(F.col("cluster").isin(probes) & (F.col(id_col) != qid))
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                score.alias("adc_score"),
            )
        )
    out = per_q[0]
    for df_q in per_q[1:]:
        out = out.unionByName(df_q)
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_lut_l2(query_res: np.ndarray, codebooks: np.ndarray) -> list[list[float]]:
    """Per-(query, probed-list) L2 ADC table for RESIDUAL PQ:
    lut[m][j] = ||qr_sub_m - c_mj||^2 as a sequential fold (d = x - y;
    acc + d*d), bit-for-bit reproducible across driver, executor
    projection and the parity truth builder."""
    M, ks, dsub = codebooks.shape
    lut = []
    for m in range(M):
        sub = query_res[m * dsub : (m + 1) * dsub]
        row = []
        for j in range(ks):
            acc = 0.0
            for x, y in zip(sub, codebooks[m][j]):
                d = x - y
                acc = acc + d * d
            row.append(acc)
        lut.append(row)
    return lut


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    emb_col: str = "emb",
    id_col: str = "vec_id",
) -> DataFrame:
    """Faiss-style residual IVFPQ: each vector's RESIDUAL against its
    coarse centroid is PQ-encoded (residuals concentrate near zero, so a
    shared residual codebook quantizes far tighter than absolute-space
    PQ), and search is L2 ADC per (query, probed list):
    ||q - v||^2 ~ sum_m ||(q - c_L)_sub_m - cb_m[code_m]||^2, smaller =
    closer. The encode pass is still one codegen'd projection — the
    per-row centroid is picked from a literal array-of-arrays by the
    cluster id, the residual is a zip_with, no shuffle, no Python. Each
    (query, probe) pair becomes one cluster-pruned projection with its
    own LUT literals; ranks ascend by distance."""
    if not queries:
        raise ValueError("ivfpq_residual_topk: queries must be non-empty")
    M = codebooks.shape[0]
    centers_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    assigned = assign_clusters(corpus, centroids, emb_col=emb_col)
    res = assigned.withColumn(
        "_res",
        F.zip_with(
            F.col(emb_col),
            F.element_at(centers_lit, F.col("cluster")),
            lambda x, c: x - c,
        ),
    )
    coded = pq_assign(res, codebooks, emb_col="_res", id_col=id_col).select(
        id_col, "cluster", *[f"code_{m}" for m in range(M)]
    )
    per_probe = []
    for qid, qvec in queries:
        q = np.asarray(qvec, dtype=np.float64)
        d2 = ((centroids - q) ** 2).sum(axis=1)
        for probe0 in np.argsort(d2)[:nprobe]:
            lut = pq_lut_l2(q - centroids[int(probe0)], codebooks)
            dist = None
            for m in range(M):
                arr = F.array(*[F.lit(v) for v in lut[m]])
                term = F.element_at(arr, F.col(f"code_{m}") + 1)
                dist = term if dist is None else dist + term
            per_probe.append(
                coded.filter(
                    (F.col("cluster") == int(probe0) + 1) & (F.col(id_col) != qid)
                ).select(
                    F.lit(qid).cast("long").alias("query_id"),
                    F.col(id_col).alias("neighbor_id"),
                    dist.alias("adc_dist"),
                )
            )
    out = per_probe[0]
    for df_q in per_probe[1:]:
        out = out.unionByName(df_q)
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
