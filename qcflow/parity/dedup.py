"""Deduplication operators over the `documents` table.

The driver corpus has no natural duplicates, so every query plants them
deterministically INSIDE the query (union of exact/truncated copies for a
fixed doc_id slice) — both engines build the identical corpus, so the
oracle checks the full dedup computation, not fixture luck.

Shared-arithmetic convention: anything that must hash identically in Spark
and DuckDB uses explicit integer arithmetic (polynomial rolling hash mod
1e9+7) rather than engine-native hash functions. Spark-native xxhash64 is
used only where the oracle verifies the *output* (LSH candidates are
verified with exact Jaccard, so the oracle never needs Spark's hash).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.graph import resolve_clusters, survivors
from qcflow.parity.registry import query, t

# ---------------------------------------------------------------- corpora

_SQL_CORPUS_EXACT = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 7 = 0
"""

_SQL_CORPUS_NEAR = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, greatest(length(text) - 20, 1)) AS text
  FROM documents WHERE doc_id % 7 = 0
"""


def _corpus_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


# chain corpus: two truncation levels so near-dup components have size 3
# (orig -- copyA -- copyB) and cluster resolution is non-trivial
_SQL_CORPUS_CHAIN = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         substr(text, 1, greatest(length(text) - 20, 1)) AS text
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         substr(text, 1, greatest(length(text) - 40, 1)) AS text
  FROM documents WHERE doc_id % 14 = 0
"""


def _corpus_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copy_a = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 20, 1))").alias("text"),
    )
    copy_b = docs.filter(F.col("doc_id") % 14 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 40, 1))").alias("text"),
    )
    return docs.unionByName(copy_a).unionByName(copy_b)


def _corpus_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, 1, greatest(length(text) - 20, 1))").alias("text"),
    )
    return docs.unionByName(copies)


# shingle array (distinct word 3-grams) as a SQL expression usable in both
_SPARK_SHINGLES = """
  array_distinct(
    CASE WHEN size(toks) >= 3
         THEN transform(sequence(0, size(toks) - 3),
                        i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
         ELSE toks END)
"""

_SQL_SHINGLES = """
  list_distinct(
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE toks END)
"""


def _with_shingles(corpus: DataFrame) -> DataFrame:
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    return corpus.withColumn("toks", toks).withColumn(
        "shingles", F.expr(_SPARK_SHINGLES)
    )


def _sql_shingled(corpus_sql: str) -> str:
    return f"""
    SELECT doc_id, {_SQL_SHINGLES} AS shingles
    FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
          FROM ({corpus_sql}))
    """


# ------------------------------------------------------------ exact dedup

@query(
    "dedup_exact",
    oracle=f"""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM ({_SQL_CORPUS_EXACT})
    GROUP BY text HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content, keep the smallest id. At scale
    group on xxhash64(text) first (shuffle 8-byte keys, not documents) and
    only compare full text within colliding hash groups; here the direct
    groupBy keeps the oracle exact."""
    corpus = _corpus_exact(spark, sf_dir)
    return (
        corpus.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keep_id", "n_copies")
    )


# --------------------------------------------------- n-gram Jaccard dedup

# Inverted-index pruning: shingles shared by more than DF_CAP documents are
# excluded from the candidate join (power-law corpora have hot shingles that
# would otherwise fan out O(df^2) pairs from a single shuffle key). Pair
# recall bound: a pair where EVERY shared shingle is hot is dropped; with
# |A|,|B| >= m shingles and <= c of them hot, a true pair needs
# jaccard <= c/(2m - c) to be at risk, so for fixture docs (m >> c at
# DF_CAP=50) nothing above the 0.5 threshold can be lost. Applied in BOTH
# engines, so the oracle checks the capped computation exactly.
_DF_CAP = 50


def _sql_jaccard_pairs(corpus_sql: str, thr: float, df_cap: int = _DF_CAP) -> str:
    return f"""
    WITH sh_all AS (
      SELECT doc_id, unnest(shingles) AS shingle FROM ({_sql_shingled(corpus_sql)})
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh_all GROUP BY doc_id),
    hot AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) > {df_cap}),
    sh AS (SELECT * FROM sh_all WHERE shingle NOT IN (SELECT shingle FROM hot)),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= {thr}
"""


def _jaccard_pairs(corpus: DataFrame, thr: float, df_cap: int = _DF_CAP) -> DataFrame:
    """Exact near-dup pairs: word-3-gram shingles -> document-frequency cap
    -> inverted-index self-join (join on shingle, never a cross join) ->
    Jaccard >= thr. The shuffle key is the shingle; the df cap bounds the
    worst key's fan-out at df_cap^2/2 candidate rows, so one hot shingle
    can never melt a reducer. Jaccard denominators use the UNCAPPED
    shingle counts (sizes are computed before pruning)."""
    # three fixes measured together 18 -> ~1.5 s at sf0.1 (r6):
    # - repartition + localCheckpoint the corpus first: the documents
    #   table is a single small file, so the (expensive) tokenize+shingle
    #   expressions otherwise run in ONE scan task regardless of core
    #   count — and the checkpoint is the pushdown BARRIER that stops
    #   explode()'s injected size(arr)>0 filter from dragging the whole
    #   shingle expression below the repartition into that single scan
    #   task (see text._spread);
    # - localCheckpoint the exploded shingles: the frame feeds sizes,
    #   the hot-shingle cap AND both self-join sides — five lineage
    #   re-evaluations of the shingle expressions without it (the
    #   staged-fingerprint discipline the audio dedup path already uses).
    sc = corpus.sparkSession.sparkContext
    corpus = corpus.repartition(2 * sc.defaultParallelism).localCheckpoint()
    sh_all = (
        _with_shingles(corpus)
        .select("doc_id", F.explode("shingles").alias("shingle"))
        .localCheckpoint()
    )
    sizes = sh_all.groupBy("doc_id").agg(F.count("*").alias("n"))
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > df_cap)
        .select("shingle")
    )
    sh = sh_all.join(F.broadcast(hot), "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_inter").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_inter")
    )
    return (
        inter.join(F.broadcast(sa), F.col("id_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("id_b") == F.col("sb.doc_id"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= thr)
    )


@query(
    "dedup_ngram_jaccard",
    oracle=_sql_jaccard_pairs(_SQL_CORPUS_NEAR, thr=0.5),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs over the planted corpus (see _jaccard_pairs
    for the df-capped inverted-index plan)."""
    return _jaccard_pairs(_corpus_near(spark, sf_dir), thr=0.5)


# ------------------------------------------------------- MinHash-LSH dedup

_MH_K = 64  # signature length
_MH_B, _MH_R = 16, 4  # bands x rows
_MH_P = 4_294_967_311  # prime > 2^32
_rng = np.random.default_rng(97)
_MH_A = _rng.integers(1, 1 << 30, _MH_K).tolist()
_MH_B_COEF = _rng.integers(0, 1 << 30, _MH_K).tolist()


@query(
    "dedup_minhash_lsh",
    # uncapped exact Jaccard: the Spark side verifies candidates on full
    # shingle arrays (array_intersect), so the oracle must not prune either
    oracle=_sql_jaccard_pairs(_SQL_CORPUS_NEAR, thr=0.7, df_cap=1 << 30),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    shingle -> xxhash64 -> 64 universal-hash minima (one array expression,
    no UDF) -> 16 bands of 4 -> self-join per band bucket -> distinct
    candidate pairs -> exact Jaccard filter >= 0.7. The oracle is the exact
    pairwise Jaccard; LSH with these parameters has recall ~1 above 0.7
    (miss prob (1-j^4)^16 < 1e-7 at j=0.9).

    Scale discipline: the band self-join carries ONLY (doc_id, band,
    bucket) — never the shingle arrays. A payload-carrying band join
    would ship every document's shingle set through the 16-way explode
    and the self-join shuffle (corpus-sized wire traffic); instead the
    deduped candidate pairs re-join ``shingles`` by doc_id (two slim hash
    joins) for the exact-Jaccard verify. tests/test_plans.py pins that no
    array column crosses the band-join Exchange. The O(n^2) pair space is
    never formed."""
    shingled = _with_shingles(_corpus_near(spark, sf_dir)).select(
        "doc_id", "shingles"
    )
    hs = F.transform(F.col("shingles"), lambda s: F.pmod(F.xxhash64(s), F.lit(1 << 32)))
    def _minhash(a: int, b: int):
        def fn(h):
            return F.pmod(h * a + b, F.lit(_MH_P))

        return fn

    sig_cols = [
        F.array_min(F.transform(F.col("hs"), _minhash(_MH_A[k], _MH_B_COEF[k])))
        for k in range(_MH_K)
    ]
    sigs = shingled.withColumn("hs", hs).select(
        "doc_id", F.array(*sig_cols).alias("sig")
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[j * _MH_R + r].cast("string")
                                    for r in range(_MH_R)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for j in range(_MH_B)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # re-attach shingle sets to the (deduped, candidate-sized) pair list
    cand = cand.join(
        shingled.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")),
        "id_a",
    ).join(
        shingled.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")),
        "id_b",
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.7)
    )


# ------------------------------------------------------------ SimHash dedup

_SH_BITS = 24
_SH_BANDS, _SH_BAND_BITS = 4, 6
_SH_HAM_MAX = 3

# shared polynomial token hash (identical integer arithmetic in both engines)
_SPARK_TOKHASH = (
    "aggregate(sequence(1, length(tok)), 0L,"
    " (acc, i) -> (acc * 31 + ascii(substring(tok, i, 1))) % 1000000007)"
)
_SQL_TOKHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(range(1, length(tok) + 1),"
    " i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT))),"
    " (acc, x) -> (acc * 31 + x) % 1000000007)"
)


def _sql_simhash() -> str:
    bit_sums = ",\n".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(_SH_BITS)
    )
    recompose = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(_SH_BITS)
    )
    return f"""
    WITH tok_rows AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM ({_SQL_CORPUS_NEAR})
    ),
    hashed AS (SELECT doc_id, {_SQL_TOKHASH} AS h FROM tok_rows),
    bitsum AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id)
    SELECT doc_id, {recompose} AS simhash FROM bitsum
    """


def _spark_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _corpus_near(spark, sf_dir)
    tok_rows = corpus.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
        ).alias("tok"),
    ).withColumn("h", F.expr(_SPARK_TOKHASH))
    bit_sums = [
        F.sum(
            F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(_SH_BITS)
    ]
    bitsum = tok_rows.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(_SH_BITS):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        sim = term if sim is None else sim + term
    return bitsum.select("doc_id", sim.alias("simhash"))


@query("dedup_simhash", oracle=_sql_simhash())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints (24-bit, shared-arithmetic token hash) — the
    oracle recomputes the identical signature in SQL, so this checks the
    whole bit-vote construction bit-for-bit."""
    return _spark_simhash(spark, sf_dir)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH sh AS ({_sql_simhash()})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SH_HAM_MAX}
      AND b.doc_id = a.doc_id + 100000
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SimHash banding: 4 bands x 6 bits; Hamming<=3
    guarantees >=1 clean band (pigeonhole), so banded candidates have
    recall 1 within the radius. Restricted to planted (orig, copy) pairs so
    the oracle can use the O(n^2) form while Spark stays on the banded
    join; the band-bucket join is the scale path."""
    sh = _spark_simhash(spark, sf_dir)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.expr(
                            f"(simhash >> {j * _SH_BAND_BITS}) & {(1 << _SH_BAND_BITS) - 1}"
                        ).alias("bucket"),
                    )
                    for j in range(_SH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.expr("a.simhash ^ b.simhash"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.doc_id") == F.col("a.doc_id") + 100000),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH_HAM_MAX)
        .dropDuplicates(["id_a", "id_b"])
    )


# ------------------------------------------- embedding-cosine near-dup pairs

@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0) AS emb
      FROM embeddings WHERE vec_id % 11 = 0
    ),
    norms AS (
      SELECT vec_id, emb,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list_transform(emb, x -> x * x)), (acc, x) -> acc + x)) AS nrm
      FROM corpus
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(list_zip(a.emb, b.emb),
                                p -> p[1] * p[2])), (acc, x) -> acc + x)
                 / (a.nrm * b.nrm), 4) AS cosine
    FROM norms a JOIN norms b ON b.vec_id = a.vec_id + 100000
    WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(list_zip(a.emb, b.emb), p -> p[1] * p[2])),
          (acc, x) -> acc + x) / (a.nrm * b.nrm) >= 0.99
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: planted scaled copies must be found at cosine
    >= 0.99. Join is on the planted key here (the oracle needs a closed
    form); the unrestricted scale path is ann_lsh_bucketed in
    similarity.py. Dot/norm folds are sequential in both engines, so the
    doubles agree bit-for-bit before rounding."""
    emb = t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    copies = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double") * 2.0).alias("emb"),
    )
    corpus = base.unionByName(copies)
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("emb"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    norms = corpus.withColumn("nrm", nrm)
    a, b = norms.alias("a"), norms.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.emb"), F.col("b.emb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 100000)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") >= 0.99)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cosine"))
    )


# --------------------------------------------- near-dup cluster resolution

@query(
    "dedup_resolve_clusters",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_sql_jaccard_pairs(_SQL_CORPUS_CHAIN, thr=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
    comps AS (SELECT id AS doc_id, MIN(comp) AS cluster_rep
              FROM reach GROUP BY id)
    SELECT doc_id, cluster_rep,
           COUNT(*) OVER (PARTITION BY cluster_rep) AS cluster_size
    FROM comps
    """,
)
def dedup_resolve_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph -> survivor clusters: exact-Jaccard pairs on the
    chain corpus (orig -- minus-20-chars copy -- minus-40-chars copy, so
    doc_id%14 docs form size-3 chains, %7 docs size-2, plus incidental
    cross-doc near-dups up to size 5) resolved by distributed hash-min
    connected components (qcflow/graph.py — iterated hash joins, no
    driver-side union-find). cluster_rep = min doc_id of the component =
    the survivor; the oracle recomputes components with a recursive CTE."""
    pairs = _jaccard_pairs(_corpus_chain(spark, sf_dir), thr=0.5)
    return resolve_clusters(pairs)


@query(
    "dedup_survivors",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_sql_jaccard_pairs(_SQL_CORPUS_CHAIN, thr=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
    comps AS (SELECT id, MIN(comp) AS rep FROM reach GROUP BY id)
    SELECT doc_id FROM ({_SQL_CORPUS_CHAIN}) c
    WHERE NOT EXISTS (SELECT 1 FROM comps
                      WHERE comps.id = c.doc_id AND comps.rep <> c.doc_id)
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deduped corpus itself — what the dedup stage actually emits:
    every document minus non-representative cluster members (anti-join
    of the resolved losers; singletons survive untouched)."""
    corpus = _corpus_chain(spark, sf_dir)
    pairs = _jaccard_pairs(corpus, thr=0.5)
    return survivors(corpus.select("doc_id"), pairs)


# ------------------------------------------------- chunk-level exact dedup

# Sub-document granularity: the standard "exact substring dedup" shape
# (Lee et al., "Deduplicating Training Data Makes Language Models Better")
# at fixed word-window granularity. A document's text is split into
# consecutive CHUNK_WORDS-word chunks; a chunk OCCURRENCE survives iff it
# is the globally first occurrence of that chunk text (min (doc_id,
# chunk_idx)); the deduped document is its surviving chunks re-joined in
# order. Whole-doc copies lose every chunk; natural cross-doc repetition
# is trimmed where it occurs instead of dropping either document.
_CHUNK_WORDS = 8


@query(
    "dedup_chunk_exact",
    oracle=f"""
    WITH corpus AS ({_SQL_CORPUS_EXACT}),
    tok AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM corpus
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(
               toks[i*{_CHUNK_WORDS}+1 : i*{_CHUNK_WORDS}+{_CHUNK_WORDS}],
               ' ') AS chunk
      FROM tok, unnest(range((len(toks) + {_CHUNK_WORDS} - 1) // {_CHUNK_WORDS}))
           AS r(i)
    ),
    flagged AS (
      SELECT doc_id, chunk_idx, chunk,
             ROW_NUMBER() OVER (PARTITION BY chunk
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                               ORDER BY chunk_idx), '') AS dedup_text
    FROM flagged
    GROUP BY doc_id
    """,
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup over the exact-copy corpus.

    Scale shape (the skew-safe one): first-occurrence per chunk is a
    groupBy(chunk).agg(min(struct(doc_id, chunk_idx))) — partial min
    combines MAP-SIDE, so a chunk repeated a million times ships one row
    per map task, unlike a window over the chunk partition (whole hot key
    on one reducer). The join back is an equi-join on chunk whose right
    side is distinct-chunk-sized; AQE's skew-join split covers hot chunks
    on the probe side. Reassembly groups by doc_id (natural key, no skew).
    At 100 TB, chunk text would be replaced by xxhash64(chunk) for the
    shuffle key (8-byte keys) with full-text verify inside colliding
    groups — same plan shape; the literal text keeps the oracle exact here.
    """
    corpus = _corpus_exact(spark, sf_dir)
    c = _CHUNK_WORDS
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    chunk_arr = F.expr(
        f"""CASE WHEN size(toks) = 0 THEN array()
                ELSE transform(
                  sequence(0, CAST(ceil(size(toks) / {c}.0) AS INT) - 1),
                  i -> array_join(slice(toks, i * {c} + 1, {c}), ' '))
           END"""
    )
    occ = (
        corpus.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk"))
    )
    firsts = occ.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "chunk_idx")).alias("first_occ")
    )
    keep = (F.col("doc_id") == F.col("first_occ.doc_id")) & (
        F.col("chunk_idx") == F.col("first_occ.chunk_idx")
    )
    return (
        occ.join(firsts, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("chunk_idx", "chunk")))
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("dedup_text"),
        )
    )


# -------------------------------------------- leakage-safe split assignment
#
# Train/dev/test assignment that is DUP-GROUP-ATOMIC: every member of an
# exact-duplicate group lands in the same split, so a training document
# can never leak into dev/test as its own verbatim copy (the standard
# eval-integrity requirement downstream of dedup). The split coin is the
# shared multiplicative hash (advanced_ops.HASH_P/K — identical integer
# arithmetic in Spark and DuckDB) of the group REPRESENTATIVE (min
# doc_id), so assignment is deterministic across runs, partitionings and
# engines, and adding non-duplicate documents never reassigns existing
# groups.

_SPLIT_TRAIN, _SPLIT_DEV = 80, 90  # percent cut points


def _split_sql() -> str:
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    h = f"(((rep_id % {HASH_P}) * {HASH_K}) % {HASH_P}) % 100"
    return f"""
    WITH corpus AS ({_SQL_CORPUS_EXACT}),
    g AS (
      SELECT text, MIN(doc_id) AS rep_id,
             CAST(COUNT(*) AS BIGINT) AS group_size
      FROM corpus GROUP BY text
    )
    SELECT c.doc_id, g.rep_id, g.group_size,
           CASE WHEN {h} < {_SPLIT_TRAIN} THEN 'train'
                WHEN {h} < {_SPLIT_DEV} THEN 'dev'
                ELSE 'test' END AS split
    FROM corpus c JOIN g ON c.text = g.text
    """


@query("x_leakage_safe_split", oracle=_split_sql())
def x_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/dev/test split: group by exact content, pick
    the min-id representative, hash IT for the split coin, and join the
    assignment back to every member — duplicates can never straddle the
    eval boundary. Plan at 10^12 docs: group on xxhash64(text) (8-byte
    shuffle keys, full text compared only within colliding groups, as in
    dedup_exact), then ONE shuffle join back on the same key; groupBy
    (map-side combine) + join rather than a window so a viral document's
    million-copy group never buffers on one reducer. Extends naturally
    to near-dup groups by substituting dedup_survivors' cluster id for
    the content key."""
    corpus = _corpus_exact(spark, sf_dir)
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    groups = corpus.groupBy("text").agg(
        F.min("doc_id").alias("rep_id"), F.count("*").alias("group_size")
    )
    coin = F.pmod(
        F.pmod(F.pmod(F.col("rep_id"), F.lit(HASH_P)) * F.lit(HASH_K), F.lit(HASH_P)),
        F.lit(100),
    )
    return (
        corpus.join(groups, "text")
        .select(
            "doc_id",
            "rep_id",
            "group_size",
            F.when(coin < _SPLIT_TRAIN, F.lit("train"))
            .when(coin < _SPLIT_DEV, F.lit("dev"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


# ----------------------------------------- quality-preferring survivors
#
# dedup_survivors keeps the MIN-ID member of each near-dup cluster —
# the arbitrary-but-stable convention. Production dedup keeps the BEST
# member (longest form, highest quality score, original rather than the
# truncated mirror). This op picks argmax(quality) per cluster with a
# deterministic min-id tie-break, as a map-side-combining min(struct)
# aggregation — never a per-cluster sort, so a viral document's
# million-copy cluster reduces with partial aggregation instead of
# buffering on one reducer. Quality here is the engine-shared
# multiplicative-hash stand-in (identical integer arithmetic in DuckDB);
# production plugs any upstream scorer column (doc QC quality_score,
# audio snr_est_db).


def _best_survivor_sql() -> str:
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    q = f"(((id % {HASH_P}) * {HASH_K}) % {HASH_P}) % 1000"
    return f"""
    WITH RECURSIVE pairs AS ({_sql_jaccard_pairs(_SQL_CORPUS_CHAIN, thr=0.5)}),
    edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(id, comp) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
    comps AS (SELECT id, MIN(comp) AS rep, {q} AS quality
              FROM reach GROUP BY id),
    ranked AS (
      SELECT rep, id, quality,
             ROW_NUMBER() OVER (PARTITION BY rep
                                ORDER BY quality DESC, id) AS rn,
             COUNT(*) OVER (PARTITION BY rep) AS cluster_size
      FROM comps)
    SELECT rep AS cluster_rep, CAST(cluster_size AS BIGINT) AS cluster_size,
           id AS survivor_id, CAST(quality AS BIGINT) AS survivor_quality
    FROM ranked WHERE rn = 1
    """


@query("dedup_best_survivor", oracle=_best_survivor_sql())
def dedup_best_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-preferring survivor per near-dup cluster: resolve the
    pair graph with distributed connected components (qcflow/graph.py),
    score members with the engine-shared hash stand-in, and reduce each
    cluster to argmax(quality, tie-break min id) via min(struct(-q, id))
    — a partial-aggregating groupBy, skew-safe for viral-copy clusters.
    The DuckDB twin replays the components with a recursive CTE and the
    argmax with a deterministic window order."""
    from qcflow.parity.advanced_ops import HASH_K, HASH_P

    pairs = _jaccard_pairs(_corpus_chain(spark, sf_dir), thr=0.5)
    clusters = resolve_clusters(pairs)
    quality = F.pmod(
        F.pmod(F.pmod(F.col("doc_id"), F.lit(HASH_P)) * F.lit(HASH_K), F.lit(HASH_P)),
        F.lit(1000),
    ).cast("long")
    return (
        clusters.withColumn("quality", quality)
        .groupBy("cluster_rep")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min(
                F.struct(
                    (-F.col("quality")).alias("nq"),
                    F.col("doc_id").alias("id"),
                )
            ).alias("m"),
        )
        .select(
            "cluster_rep",
            "cluster_size",
            F.col("m.id").alias("survivor_id"),
            (-F.col("m.nq")).alias("survivor_quality"),
        )
    )
