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

Where inlined-literal expressions scale and where they don't (the r4
dual-strategy rule): codebook-literal expressions carry a one-time
Catalyst analysis + codegen cost AND, past the JVM's 64 KB codegen
method ceiling, fall back to interpreted evaluation. On the CORPUS side
(n huge — assign_clusters, pq_assign) interpreted per-row evaluation is
fatal, so both dispatch to broadcast-TABLE join strategies above a size
threshold (k*d > 512 fold terms / M*ks > 512), with bit-identical float
semantics.
On the QUERY side (Q small, broadcast — ADC LUTs, probe selection) the
compile cost is per-plan, not per-row, and interpreted evaluation of a
few thousand query rows is immaterial — so those stay expressions at
any codebook size.
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


def _sq_dist_from(emb: Column, centroid: np.ndarray) -> Column:
    """|v - c|^2 up to the constant |v|^2 (same for every centroid, so it
    cancels in the argmin): -2 * dot(v, c) + |c|^2."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return -2.0 * _dot(emb, c) + float((centroid**2).sum())


def _sq_dist(emb_col: str, centroid: np.ndarray) -> Column:
    return _sq_dist_from(F.col(emb_col), centroid)


def assign_clusters(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str = "emb",
    out_col: str = "cluster",
    id_col: str | None = None,
    max_inline_terms: int = 512,
) -> DataFrame:
    """Nearest-centroid (L2) assignment; 1-based index, first-minimum
    tie-break.

    Two physical strategies with IDENTICAL float semantics (same
    sequential-fold dot, same |c|^2 numpy-sum literal, same
    lexicographic tie-break), dispatched on k*d — the fold-term count
    that actually drives Catalyst analysis/codegen cost (measured: the
    k=16 x d=64 Lloyd assignment spent 3-10s PER ITERATION in analysis
    before this gate counted dims):
    - k*d <= max_inline_terms (or no id_col): ONE codegen'd projection
      with the centroid literals inlined — no shuffle, no join; the
      right plan for the small-codebook hot path.
    - larger codebooks (id_col required): the literal expression tree
      stops being viable (a 10^12-vector index wants k ~ 4096 coarse
      lists), so the codebook ships as a broadcast TABLE instead:
      expand to (row, centroid) pairs, reduce per row with a map-side
      combinable min(struct(d, cluster, row-payload)) aggregation — the
      payload rides the min, so ONE scan, one broadcast, one n-row
      shuffle, any k (_assign_clusters_join for the row-level
      contract)."""
    n_terms = int(centroids.shape[0]) * int(centroids.shape[1])
    if n_terms <= max_inline_terms or id_col is None:
        scores = F.array(*[_sq_dist(emb_col, c) for c in centroids])
        return df.withColumn(
            out_col, F.array_position(scores, F.array_min(scores)).cast("int")
        )
    return _assign_clusters_join(df, centroids, emb_col, out_col, id_col)


def _centroids_df(ref: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(cluster, c_emb, c_sqn) broadcast table; c_sqn is the SAME
    numpy-summed |c|^2 double the literal path inlines, so both
    strategies score bit-identically."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "cluster": list(range(1, len(centroids) + 1)),
            "c_emb": [[float(x) for x in c] for c in centroids],
            "c_sqn": [float((c**2).sum()) for c in centroids],
        }
    )
    return ref.sparkSession.createDataFrame(
        pdf, "cluster int, c_emb array<double>, c_sqn double"
    )


def _assign_clusters_join(
    df: DataFrame,
    centroids: np.ndarray,
    emb_col: str,
    out_col: str,
    id_col: str,
) -> DataFrame:
    """ONE scan of the input, one broadcast, one n-row shuffle (r4
    review: the first cut re-scanned the input for a winner join-back,
    doubling per-call scan cost — fatal at the corpus sizes this path
    exists for). The full row payload rides the min-struct aggregation
    as a trailing field: (d, cluster) is unique per (row, centroid)
    pair, so the payload never participates in the comparison.

    Row-level contract matching the inline path: ``id_col`` must be
    unique (it keys the reduction — a duplicated id would collapse to
    one winner row); NULL embeddings get a NULL cluster; output
    preserves the input column order with ``out_col`` appended."""
    cdf = _centroids_df(df, centroids)
    payload = F.struct(*[F.col(c) for c in df.columns])
    d = -2.0 * _dot(F.col(f"_p.{emb_col}"), F.col("c_emb")) + F.col("c_sqn")
    assigned = (
        df.filter(F.col(emb_col).isNotNull())
        .select(F.col(id_col).alias("_id"), payload.alias("_p"))
        .join(F.broadcast(cdf))
        .select(
            "_id",
            F.struct(
                d.alias("d"), F.col("cluster").alias("c"), F.col("_p").alias("p")
            ).alias("s"),
        )
        .groupBy("_id")
        .agg(F.min("s").alias("s"))  # lexicographic: min d, then min cluster
        .select("s.p.*", F.col("s.c").alias(out_col))
    )
    nulls = df.filter(F.col(emb_col).isNull()).withColumn(
        out_col, F.lit(None).cast("int")
    )
    return assigned.unionByName(nulls)


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
        # _d mixes a numpy-summed |c|^2 literal with Spark-fold dot terms,
        # so an exact duplicate can land a few ulps either side of zero:
        # compare against an epsilon scaled to the vector magnitudes, not
        # raw <= 0 (advisor r3 finding)
        # ~4 orders above the worst-case rounding (ulp ~2.2e-16 * scale)
        # yet far below any real squared distance; a larger factor would
        # falsely reject legitimately-close distinct points at large
        # vector magnitudes (r4 review finding)
        eps = 1e-12 * (1.0 + max(float((c**2).sum()) for c in cents))
        if r["_d"] <= eps:
            raise ValueError(
                f"farthest_first_init: fewer than k={k} distinct vectors"
                " (up to tolerance)"
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
    sample_size: int = 65536,
) -> np.ndarray:
    """Lloyd's k-means; returns the (k, d) codebook. ``df[emb_col]`` must
    be array<double>. Deterministic given the data and id column.
    ``init='farthest'`` runs the distributed farthest-first traversal
    (one seed per well-separated cluster, guaranteed — but k scalar
    jobs, so only for small k); ``'sample'`` runs the SAME Gonzalez
    traversal in numpy over one deterministic hash-ordered sample
    (<= sample_size rows, ONE job regardless of k — the pq_train
    recipe, and the right init for k ~ 4096 coarse lists; the guarantee
    holds whenever the sample covers every cluster); ``'hash'`` is the
    cheap default (one job, no separation guarantee)."""
    if init == "farthest":
        centroids = farthest_first_init(df, k, emb_col=emb_col, id_col=id_col)
        return _lloyd(df, centroids, emb_col, id_col, n_iter, tol)
    if init == "sample":
        rows = (
            df.select(id_col, emb_col)
            .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
            .orderBy("_h", id_col)
            .limit(sample_size)
            .collect()
        )
        x = np.array([r[emb_col] for r in rows], dtype=np.float64)
        centroids = _gonzalez_np(x, k)
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
        assigned = assign_clusters(data, centroids, emb_col=emb_col, id_col=id_col)
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
    exclude_self: bool = True,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Trained-IVF ANN: corpus rows live in their nearest-centroid list;
    each query probes its ``nprobe`` nearest lists and reranks exactly by
    cosine. Returns (query_id, neighbor_id, cosine, rank). At scale the
    cluster column is the partition layout and the probe join shuffles
    (cluster, id) pairs only. Queries here share the corpus id space
    (leave-one-out), so ``exclude_self`` defaults on; pass False for an
    external query table. ``broadcast_queries=False`` shuffle-joins on
    the cluster key for query sets too large to broadcast."""
    nrm = F.sqrt(_sq_norm(F.col(emb_col)))
    lists = assign_clusters(
        corpus, centroids, emb_col=emb_col, id_col=id_col
    ).withColumn("nrm", nrm)
    n_terms = int(centroids.shape[0]) * int(centroids.shape[1])
    if n_terms <= 512:
        # small-codebook hot path: per-query literal distance array in one
        # projection (same dispatch threshold as assign_clusters — beyond
        # it, Catalyst ANALYSIS of the k*d fold terms dominates runtime)
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
    else:
        # broadcast-TABLE probe selection (the assign_clusters join
        # strategy): centroids ship as data, each query row joins the k
        # centroid rows and keeps its nprobe nearest via a per-query
        # window over the SAME lexicographic (d, idx) struct order the
        # literal path's array_sort uses — identical float distances
        # (numpy-summed |c|^2 + the shared sequential-fold dot), so the
        # probe set matches the literal path exactly. Q*k tiny rows
        # shuffle once; no k*d expression tree to analyze.
        cdf = _centroids_df(queries, centroids)
        d = -2.0 * _dot(F.col("q_emb"), F.col("c_emb")) + F.col("c_sqn")
        pr_scored = (
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(emb_col).alias("q_emb"),
                nrm.alias("q_nrm"),
            )
            .join(F.broadcast(cdf))
            .select(
                "query_id",
                "q_emb",
                "q_nrm",
                F.struct(d.alias("d"), F.col("cluster").alias("idx")).alias("s"),
            )
        )
        w_pr = Window.partitionBy("query_id").orderBy("s")
        probes = (
            pr_scored.withColumn("_pr", F.row_number().over(w_pr))
            .filter(F.col("_pr") <= nprobe)
            .select("query_id", "q_emb", "q_nrm", F.col("s.idx").alias("probe"))
        )
    dot = _dot(F.col("q_emb"), F.col(emb_col))
    cond = F.col("cluster") == F.col("probe")
    if exclude_self:
        cond = cond & (F.col(id_col) != F.col("query_id"))
    scored = lists.join(
        F.broadcast(probes) if broadcast_queries else probes, cond
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
    max_inline_codes: int = 512,
) -> DataFrame:
    """Encode each vector as its nearest sub-centroid per subspace.

    ``codebooks``: (M, ks, dsub) — subspace m quantizes dims
    [m*dsub, (m+1)*dsub). Output adds ``code_0 .. code_{M-1}`` (0-based
    int codes). Two physical strategies, bit-identical float semantics:
    - M * ks <= max_inline_codes: the squared-distance terms are inlined
      literals evaluated in ONE codegen'd projection — no shuffle, no
      Python, no UDF (the small-codebook hot path, and the shape every
      oracle fixture exercises).
    - larger codebooks (production PQ is M=16 x ks=256 = 4096 terms —
      far past what Catalyst analysis/codegen handle gracefully): the
      codebook ships as a broadcast TABLE of (m, code, sub-centroid)
      rows; vectors explode to (id, m, subvector), the broadcast join +
      a map-side-combinable min(struct(d, code)) pick each subspace's
      winner, and one collect_list pivot re-assembles the code columns.
      Two n*M-row aggregations, any codebook size."""
    M, ks, dsub = codebooks.shape
    if M * ks <= max_inline_codes:
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
    return _pq_assign_join(df, codebooks, emb_col, id_col)


def _pq_assign_join(
    df: DataFrame, codebooks: np.ndarray, emb_col: str, id_col: str
) -> DataFrame:
    """ONE scan of the input (r4 review: no winner join-back — the full
    row payload rides subspace 0's exploded row and is re-attached by a
    null-skipping max in the per-id reduction, so it shuffles once per
    row, never once per subspace). Contract as in _assign_clusters_join:
    unique ids, NULL embeddings get NULL codes, input column order is
    preserved with code_0..code_{M-1} appended."""
    import pandas as pd

    M, ks, dsub = codebooks.shape
    cb_pdf = pd.DataFrame(
        {
            "m": [m for m in range(M) for _ in range(ks)],
            "code": [j for _ in range(M) for j in range(ks)],
            "c_sub": [
                [float(x) for x in codebooks[m][j]]
                for m in range(M)
                for j in range(ks)
            ],
            # the SAME numpy-summed |c|^2 double the literal path inlines
            "c_sqn": [
                float((codebooks[m][j] ** 2).sum())
                for m in range(M)
                for j in range(ks)
            ],
        }
    )
    cdf = df.sparkSession.createDataFrame(
        cb_pdf, "m int, code int, c_sub array<double>, c_sqn double"
    )
    payload = F.struct(*[F.col(c) for c in df.columns])
    subs = (
        df.filter(F.col(emb_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).alias("m"),
                            F.slice(
                                F.col(emb_col), m * dsub + 1, dsub
                            ).alias("sub"),
                            # payload rides ONLY subspace 0 (typed NULL
                            # elsewhere) so it shuffles once per row
                            F.when(F.lit(m == 0), payload).alias("p"),
                        )
                        for m in range(M)
                    ]
                )
            ).alias("s"),
        )
        .select("_id", "s.m", "s.sub", "s.p")
    )
    d = -2.0 * _dot(F.col("sub"), F.col("c_sub")) + F.col("c_sqn")
    best = (
        subs.join(F.broadcast(cdf), "m")
        .select(
            "_id",
            "m",
            F.struct(d.alias("d"), F.col("code").alias("c")).alias("s"),
            "p",
        )
        .groupBy("_id", "m")
        # lexicographic min: min d, then min code; max(p) keeps the one
        # non-null payload (nulls are skipped)
        .agg(F.min("s").alias("s"), F.max("p").alias("p"))
        .groupBy("_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("m"), F.col("s.c").alias("c")))
                ),
                lambda e: e["c"],
            ).alias("_codes"),
            F.max("p").alias("p"),
        )
    )
    assigned = best.select(
        "p.*",
        *[
            F.element_at("_codes", m + 1).cast("int").alias(f"code_{m}")
            for m in range(M)
        ],
    )
    nulls = df.filter(F.col(emb_col).isNull())
    for m in range(M):
        nulls = nulls.withColumn(f"code_{m}", F.lit(None).cast("int"))
    return assigned.unionByName(nulls)


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


def pq_lut_batch(q: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Vectorized batch twin of ``pq_lut``: (Q, d) queries -> (Q, M, ks)
    inner-product LUTs. The accumulation loops over (m, tap) in Python
    and vectorizes over (query, code), so every element's float64 adds
    happen in EXACTLY the sequential left-fold order pq_lut uses —
    outputs are bit-identical (asserted in tests), ~100x fewer
    interpreter iterations (Q*M*ks*dsub -> M*dsub)."""
    Q = q.shape[0]
    M, ks, dsub = codebooks.shape
    q = np.asarray(q, dtype=np.float64)
    out = np.zeros((Q, M, ks), dtype=np.float64)
    for m in range(M):
        sub = q[:, m * dsub : (m + 1) * dsub]
        acc = np.zeros((Q, ks), dtype=np.float64)
        for j in range(dsub):
            acc = acc + sub[:, j, None] * codebooks[m, None, :, j]
        out[:, m, :] = acc
    return out


def _queries_df(
    ref: DataFrame, queries: list[tuple[int, np.ndarray]]
) -> DataFrame:
    """Materialize a driver-side query list as a (query_id, q_emb)
    DataFrame — via pandas/Arrow, which lands as a JVM LocalTableScan
    (a plain-list createDataFrame routes through a Python RDD instead).
    float64 round-trips bit-exactly through Arrow, so batch-path
    arithmetic matches the driver-side pq_lut bit-for-bit."""
    import pandas as pd

    spark = ref.sparkSession
    pdf = pd.DataFrame(
        {
            "query_id": [int(qid) for qid, _ in queries],
            "q_emb": [[float(x) for x in qvec] for _, qvec in queries],
        }
    )
    return spark.createDataFrame(pdf, "query_id long, q_emb array<double>")


def _lut_ip_col(emb: Column, codebooks: np.ndarray) -> Column:
    """In-frame ADC inner-product LUT: array<array<double>> with
    lut[m][j] = <emb_sub_m, c_mj> as the module's sequential left fold —
    bit-for-bit the executor twin of the driver-side ``pq_lut``. The
    M * ks fold terms live in ONE projection over the (small) query side;
    the codebook rides along as literals, exactly like ``pq_assign``."""
    M, ks, dsub = codebooks.shape
    rows = []
    for m in range(M):
        sub = F.slice(emb, m * dsub + 1, dsub)
        rows.append(
            F.array(
                *[
                    _dot(sub, F.array(*[F.lit(float(x)) for x in c]))
                    for c in codebooks[m]
                ]
            )
        )
    return F.array(*rows)


def _lut_l2_col(res: Column, codebooks: np.ndarray) -> Column:
    """In-frame L2 ADC LUT (residual PQ): lut[m][j] = ||res_sub_m -
    c_mj||^2 as the sequential (x-y)*(x-y) fold — the executor twin of
    ``pq_lut_l2``."""
    M, ks, dsub = codebooks.shape
    rows = []
    for m in range(M):
        sub = F.slice(res, m * dsub + 1, dsub)
        rows.append(
            F.array(
                *[
                    F.aggregate(
                        F.zip_with(
                            sub,
                            F.array(*[F.lit(float(x)) for x in c]),
                            lambda x, y: (x - y) * (x - y),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    for c in codebooks[m]
                ]
            )
        )
    return F.array(*rows)


def _adc_from_lut(M: int, lut_col: str = "_lut") -> Column:
    """Score a coded row from a joined-in LUT column: left-assoc sum of
    lut[m][code_m] — M element_at lookups, the same add order as the
    literal path and the fixture truth builders."""
    score = None
    for m in range(M):
        term = F.element_at(
            F.element_at(F.col(lut_col), m + 1), F.col(f"code_{m}") + 1
        )
        score = term if score is None else score + term
    return score


def pq_adc_topk_df(
    codes: DataFrame,
    queries_df: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    exclude_self: bool = False,
    broadcast_queries: bool = True,
    n_corpus_buckets: int = 64,
    query_lut_col: str | None = None,
) -> DataFrame:
    """DataFrame-native batch ADC top-k: the queries are ANY DataFrame
    with (query_id, q_emb) — they never need to be driver-resident. The
    per-query inner-product LUT is computed in-frame (``_lut_ip_col``,
    same fold arithmetic as the driver-side pq_lut), the query side is
    broadcast against ONE scan of the codes table, and scoring is M
    element_at lookups per pair — one plan for any Q.

    ``exclude_self`` drops pairs where the corpus id equals the query
    id — ONLY for query sets drawn from the corpus itself (the dedup /
    leave-one-out shape). External query ids live in a different id
    space, so the default keeps every neighbor: a coincidental id
    collision must not silently drop a valid result.

    ``broadcast_queries=False`` is the huge-query-set escape hatch: the
    codes are bucketed by hash(id) % ``n_corpus_buckets`` and each query
    row is replicated once per bucket, so the pairing becomes a SHUFFLE
    hash join on the bucket key — no driver-sized broadcast, both sides
    distributed. Scoring and ranking are unchanged (same floats).

    ``query_lut_col`` names a PRECOMPUTED array<array<double>> LUT column
    on ``queries_df`` (the driver-resident-query fast path: ``pq_lut`` is
    the documented bit-exact twin of the in-frame fold, and shipping the
    LUT as data skips the M*ks*dsub-term expression tree whose Catalyst
    analysis — not execution — dominates the LUT projection)."""
    M = codebooks.shape[0]
    if query_lut_col is not None:
        q = queries_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_lut_col).alias("_lut"),
        )
    else:
        # normalize names FIRST, compute in a second select: referencing a
        # same-name alias from a sibling expression trips Spark 4's lateral
        # alias resolution (internal analyzer error)
        q0 = queries_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_emb_col).alias("q_emb"),
        )
        q = q0.select(
            "query_id", _lut_ip_col(F.col("q_emb"), codebooks).alias("_lut")
        )
    not_self = F.col(id_col) != F.col("query_id")
    if broadcast_queries:
        joined = codes.join(
            F.broadcast(q), not_self if exclude_self else F.lit(True)
        )
    else:
        bcodes = codes.withColumn(
            "_bkt",
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_corpus_buckets)).cast(
                "int"
            ),
        )
        bq = q.withColumn(
            "_bkt", F.explode(F.sequence(F.lit(0), F.lit(n_corpus_buckets - 1)))
        )
        joined = bcodes.join(
            bq.withColumnRenamed("_bkt", "_qbkt"),
            (F.col("_bkt") == F.col("_qbkt"))
            & (not_self if exclude_self else F.lit(True)),
        )
    out = joined.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_from_lut(M).alias("adc_score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_score"), "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_adc_topk(
    codes: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    inline: bool = False,
) -> DataFrame:
    """ADC top-k inner product: score every coded row as
    lut_0[code_0] + ... + lut_{M-1}[code_{M-1}] (left-assoc, so the float
    result is deterministic), then per-query top-k. Returns (query_id,
    neighbor_id, adc_score, rank).

    Default (batch) path — ONE plan for any Q: the queries become a
    DataFrame whose LUTs are computed in-frame (``_lut_ip_col``, same
    fold arithmetic as the driver's ``pq_lut``), broadcast-joined against
    the codes table, and scored with M element_at lookups. One scan of
    the codes regardless of Q; plan-gated (tests/test_plans.py) as a
    single join with no Q-way union.

    ``inline=True`` keeps the literal path (each query one projection
    with its LUT inlined, unioned): genuinely faster for interactive
    Q <= ~8 (no join, no broadcast), but the union branches each RESCAN
    the codes source — Q scans, not one — so it must never see large Q."""
    if not queries:
        raise ValueError("pq_adc_topk: queries must be non-empty")
    M = codebooks.shape[0]
    if not inline:
        # driver-resident queries: precompute each LUT with pq_lut (the
        # bit-exact driver twin of the in-frame fold) and ship it as DATA
        # in the query frame — the in-frame _lut_ip_col path builds an
        # M*ks*dsub-term expression tree whose Catalyst analysis time
        # scales with the codebook, not the data (the assign_clusters
        # dispatch lesson). Same floats, same plan shape minus the tree.
        import pandas as pd

        luts = pq_lut_batch(
            np.stack([np.asarray(v, dtype=np.float64) for _, v in queries]),
            codebooks,
        )
        pdf = pd.DataFrame(
            {
                "query_id": [int(qid) for qid, _ in queries],
                "q_lut": [lut.tolist() for lut in luts],
            }
        )
        qdf = codes.sparkSession.createDataFrame(
            pdf, "query_id long, q_lut array<array<double>>"
        )
        return pq_adc_topk_df(
            codes,
            qdf,
            codebooks,
            k=k,
            id_col=id_col,
            exclude_self=True,  # queries are corpus rows (leave-one-out)
            query_lut_col="q_lut",
        )
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


def _probe_col(emb: Column, centroids: np.ndarray, nprobe: int) -> Column:
    """In-frame top-``nprobe`` coarse probes (1-based cluster ids),
    ascending squared distance with first-index tie-break — the executor
    twin of the driver's ``np.argsort(((centroids - q)**2).sum(1))``.
    Uses -2<q,c> + |c|^2 (the |q|^2 constant cancels in the ordering)."""
    scores = F.array(*[_sq_dist_from(emb, c) for c in centroids])
    return F.slice(
        F.transform(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.lit(len(centroids))),
                    lambda i: F.struct(
                        F.element_at(scores, i.cast("int")).alias("d"),
                        i.cast("int").alias("idx"),
                    ),
                )
            ),
            lambda s: s["idx"],
        ),
        1,
        nprobe,
    )


def ivfpq_topk_df(
    coded: DataFrame,
    queries_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    exclude_self: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """DataFrame-native batch IVF+PQ search over an ALREADY-ENCODED
    corpus table (id, cluster, code_0..code_{M-1}) — the stored index
    layout, so repeated query batches never re-encode. Probes resolve
    in-frame, the inner-product LUT is shared across a query's probes,
    and the probe frame broadcast-hash-joins the codes on cluster ==
    probe (the join key IS the inverted-list pruning).

    ``exclude_self`` is for query sets drawn from the corpus (drops
    id == query_id pairs); external ids keep every neighbor by default.
    ``broadcast_queries=False`` drops the broadcast hint so a huge
    query-probe frame SHUFFLE-joins on the cluster key instead — both
    sides distributed, same floats, same ranks."""
    M = codebooks.shape[0]
    q0 = queries_df.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(query_emb_col).alias("q_emb"),
    )
    q = q0.select(
        "query_id",
        _lut_ip_col(F.col("q_emb"), codebooks).alias("_lut"),
        F.explode(
            _probe_col(F.col("q_emb"), centroids, nprobe)
        ).alias("probe"),
    )
    cond = F.col("cluster") == F.col("probe")
    if exclude_self:
        cond = cond & (F.col(id_col) != F.col("query_id"))
    out = coded.join(
        F.broadcast(q) if broadcast_queries else q, cond
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_from_lut(M).alias("adc_score"),
    )
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
    inline: bool = False,
) -> DataFrame:
    """The production nesting: IVF coarse lists pruned first, ADC within
    the probed lists only. The corpus is stored ONCE as
    (cluster, id, code_0..code_{M-1}) — at 10^12 vectors that table is
    M bytes/vector partitioned by list, and a query touches
    nprobe/k_lists of it, scored by LUT lookups with no vector decode.

    Default (batch) path — ONE plan for any Q: queries become a
    DataFrame, probes are resolved in-frame (``_probe_col``) and
    exploded, the inner-product LUT is computed in-frame per query
    (shared across its probes — absolute-space PQ), and the probe frame
    broadcast-HASH-joins the codes table on cluster == probe: the join
    key IS the list pruning, so at 10^12 vectors each query still
    touches only its nprobe lists. No Q-way union, one scan.

    ``inline=True`` keeps the literal path (per-query cluster-pruned
    projections, probes + LUT resolved on the driver, unioned): faster
    for interactive Q <= ~8, but each union branch RESCANS — and
    re-encodes, unless the caller pre-materializes the coded frame —
    the codes source, so it must never see large Q.

    Non-residual PQ (codes quantize the absolute vector, not
    v - centroid): simpler, and exact enough when the codebook spans the
    occupied space — recall vs the exact baseline is pinned in
    tests/test_ann_pq.py."""
    if not queries:
        raise ValueError("ivfpq_topk: queries must be non-empty")
    M = codebooks.shape[0]
    coded = pq_assign(
        assign_clusters(corpus, centroids, emb_col=emb_col, id_col=id_col),
        codebooks,
        emb_col=emb_col,
        id_col=id_col,
    ).select(id_col, "cluster", *[f"code_{m}" for m in range(M)])
    if not inline:
        return ivfpq_topk_df(
            coded,
            _queries_df(corpus, queries),
            centroids,
            codebooks,
            k=k,
            nprobe=nprobe,
            id_col=id_col,
            exclude_self=True,  # queries are corpus rows (leave-one-out)
        )
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


def ivfpq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    residual: bool = True,
) -> DataFrame:
    """Encode vectors against a TRAINED index — assign + residual + PQ
    codes, NO (re)training: the incremental-maintenance path. One
    codegen'd projection chain (cluster pick, zip_with residual, PQ
    assignment), no shuffle, no Python; new snapshots append through
    this with the centroids/codebooks frozen. Output
    (id, cluster, code_0..code_{M-1}) — the stored index layout.
    ``residual=False`` encodes the absolute vector (plain IVF+PQ)."""
    M = codebooks.shape[0]
    assigned = assign_clusters(df, centroids, emb_col=emb_col, id_col=id_col)
    if residual:
        centers_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
        )
        assigned = assigned.withColumn(
            "_res",
            F.zip_with(
                F.col(emb_col),
                F.element_at(centers_lit, F.col("cluster")),
                lambda x, c: x - c,
            ),
        )
        code_src = "_res"
    else:
        code_src = emb_col
    return pq_assign(assigned, codebooks, emb_col=code_src, id_col=id_col).select(
        id_col, "cluster", *[f"code_{m}" for m in range(M)]
    )


def ivfpq_residual_topk_df(
    coded: DataFrame,
    queries_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_emb_col: str = "q_emb",
    exclude_self: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """DataFrame-native batch residual-IVFPQ search over an
    ALREADY-ENCODED corpus (id, cluster, residual code_0..code_{M-1}).
    Each (query, probe) row computes its residual against that probe's
    centroid and its L2 ADC LUT in one projection; the probe frame
    broadcast-hash-joins the codes on cluster == probe. Ranks ascend by
    distance. ``exclude_self`` / ``broadcast_queries`` as in
    ``ivfpq_topk_df`` — external ids keep every neighbor by default,
    and dropping the broadcast hint shuffle-joins on the cluster key
    for query sets too large to broadcast."""
    M = codebooks.shape[0]
    centers_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )
    q = (
        queries_df.select(
            F.col(query_id_col).cast("long").alias("query_id"),
            F.col(query_emb_col).alias("q_emb"),
        )
        .select(
            "query_id",
            "q_emb",
            F.explode(
                _probe_col(F.col("q_emb"), centroids, nprobe)
            ).alias("probe"),
        )
        .select(
            "query_id",
            "probe",
            _lut_l2_col(
                F.zip_with(
                    F.col("q_emb"),
                    F.element_at(centers_lit, F.col("probe")),
                    lambda x, c: x - c,
                ),
                codebooks,
            ).alias("_lut"),
        )
    )
    cond = F.col("cluster") == F.col("probe")
    if exclude_self:
        cond = cond & (F.col(id_col) != F.col("query_id"))
    out = coded.join(
        F.broadcast(q) if broadcast_queries else q, cond
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        _adc_from_lut(M).alias("adc_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), "neighbor_id")
    return out.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_residual_topk(
    corpus: DataFrame,
    queries: list[tuple[int, np.ndarray]],
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 2,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    inline: bool = False,
) -> DataFrame:
    """Faiss-style residual IVFPQ: each vector's RESIDUAL against its
    coarse centroid is PQ-encoded (residuals concentrate near zero, so a
    shared residual codebook quantizes far tighter than absolute-space
    PQ), and search is L2 ADC per (query, probed list):
    ||q - v||^2 ~ sum_m ||(q - c_L)_sub_m - cb_m[code_m]||^2, smaller =
    closer. The encode pass is still one codegen'd projection — the
    per-row centroid is picked from a literal array-of-arrays by the
    cluster id, the residual is a zip_with, no shuffle, no Python.

    Default (batch) path — ONE plan for any Q: each query's probes are
    resolved in-frame and exploded, the per-(query, probe) residual and
    its L2 LUT are computed in the same projection, and the probe frame
    broadcast-hash-joins the codes table on cluster == probe (the join
    key IS the list pruning). ``inline=True`` keeps the literal path
    (one cluster-pruned projection per (query, probe), unioned — each
    branch RESCANS and re-encodes the source; interactive Q only).
    Ranks ascend by distance."""
    if not queries:
        raise ValueError("ivfpq_residual_topk: queries must be non-empty")
    M = codebooks.shape[0]
    coded = ivfpq_encode(
        corpus, centroids, codebooks, emb_col=emb_col, id_col=id_col
    )
    if not inline:
        return ivfpq_residual_topk_df(
            coded,
            _queries_df(corpus, queries),
            centroids,
            codebooks,
            k=k,
            nprobe=nprobe,
            id_col=id_col,
            exclude_self=True,  # queries are corpus rows (leave-one-out)
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


# ------------------------------------------------------------- PQ training
#
# Faiss's recipe, Spark-shaped: the product quantizer is M independent
# per-subspace k-means problems. Seeding runs on a driver-sized
# deterministic sample (exactly how Faiss trains on a corpus sample);
# every Lloyd iteration is ONE distributed pass for ALL subspaces — one
# codegen'd pq_assign projection for the M argmins, one
# (subspace, code, dim)-keyed groupBy whose map-side partials reduce to
# the (M, ks, dsub) codebook on the driver. Residual training
# (ivfpq_train) composes: coarse k-means first, then pq_train on the
# v - center[cluster] residual column.


def _gonzalez_np(x: np.ndarray, k: int) -> np.ndarray:
    """Deterministic farthest-first traversal on a driver-side sample:
    start from sample row 0 (the hash-minimal row), repeatedly take the
    point farthest from the chosen set (argmax ties -> first index).
    Same 2-approximation guarantee as the distributed variant — when the
    sample covers a mixture whose inter-center separation exceeds every
    intra-cluster diameter, each cluster is seeded exactly once."""
    if len(x) < k:
        raise ValueError(f"_gonzalez_np: need k={k} rows, sample has {len(x)}")
    scale = 1.0 + float((x**2).sum(axis=1).max())
    mind = ((x - x[0]) ** 2).sum(axis=1)
    idx = [0]
    for _ in range(k - 1):
        i = int(mind.argmax())
        if mind[i] <= 1e-12 * scale:
            raise ValueError(
                f"_gonzalez_np: fewer than k={k} distinct rows in the sample"
            )
        idx.append(i)
        mind = np.minimum(mind, ((x - x[i]) ** 2).sum(axis=1))
    return x[idx].astype(np.float64)


def pq_train(
    df: DataFrame,
    M: int,
    ks: int,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    n_iter: int = 10,
    tol: float = 1e-6,
    sample_size: int = 65536,
) -> np.ndarray:
    """Train the (M, ks, dsub) product-quantizer codebooks.

    INIT: one deterministic hash-ordered sample (<= sample_size rows)
    collected to the driver, Gonzalez farthest-first per subspace in
    numpy — O(sample * ks * d) driver work, zero extra cluster jobs.
    ITERATE: per Lloyd step, pq_assign encodes ALL subspaces in one
    codegen'd projection, then a single (m, code, dim) groupBy averages
    sub-vectors — one shuffle per iteration regardless of M, driver
    traffic M*ks*dsub doubles. Empty codes keep their previous
    sub-centroid. Deterministic given the data and id column."""
    first = df.select(emb_col).limit(1).collect()
    if not first:
        raise ValueError("pq_train: empty input")
    d = len(first[0][0])
    if d % M != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by M={M}")
    dsub = d // M
    sample = (
        df.select(id_col, emb_col)
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h", id_col)
        .limit(sample_size)
        .collect()
    )
    x = np.array([r[emb_col] for r in sample], dtype=np.float64)
    cbs = np.empty((M, ks, dsub), dtype=np.float64)
    for m in range(M):
        cbs[m] = _gonzalez_np(x[:, m * dsub : (m + 1) * dsub], ks)

    data = df.select(id_col, emb_col)
    for _ in range(n_iter):
        assigned = pq_assign(data, cbs, emb_col=emb_col, id_col=id_col)
        parts = F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    F.col(f"code_{m}").alias("j"),
                    F.slice(F.col(emb_col), m * dsub + 1, dsub).alias("sub"),
                )
                for m in range(M)
            ]
        )
        rows = (
            assigned.select(F.explode(parts).alias("s"))
            .select("s.m", "s.j", F.posexplode("s.sub").alias("dim", "val"))
            .groupBy("m", "j", "dim")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new = cbs.copy()  # empty codes keep their sub-centroid
        for r in rows:
            new[r["m"], r["j"], r["dim"]] = r["mean"]
        shift = float(np.abs(new - cbs).max())
        cbs = new
        if shift < tol:
            break
    return cbs


def ivfpq_train(
    df: DataFrame,
    k_coarse: int,
    M: int,
    ks: int,
    emb_col: str = "emb",
    id_col: str = "vec_id",
    coarse_iter: int = 10,
    pq_iter: int = 10,
    sample_size: int = 65536,
    coarse_init: str = "farthest",
) -> tuple[np.ndarray, np.ndarray]:
    """Train the full residual-IVFPQ index: coarse k-means over the raw
    vectors, then pq_train over the v - center[cluster] RESIDUAL column
    (computed in the same projection that assigns the cluster — the
    per-row center is an element_at into a literal array-of-arrays).
    Returns (centers (k_coarse, d), codebooks (M, ks, dsub)) — the
    inputs ivfpq_residual_topk searches with."""
    centers = kmeans_fit(
        df, k_coarse, emb_col=emb_col, id_col=id_col,
        n_iter=coarse_iter, init=coarse_init,
    )
    centers_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centers]
    )
    res = assign_clusters(
        df, centers, emb_col=emb_col, id_col=id_col
    ).withColumn(
        "_res",
        F.zip_with(
            F.col(emb_col),
            F.element_at(centers_lit, F.col("cluster")),
            lambda x, c: x - c,
        ),
    )
    cbs = pq_train(
        res, M, ks, emb_col="_res", id_col=id_col,
        n_iter=pq_iter, sample_size=sample_size,
    )
    return centers, cbs
