"""Text-analysis operators over the `documents` table.

Language-ID heuristic (marker-token ratio), composite quality scoring,
token counting (whitespace + BPE-ish regex), and polynomial document
fingerprinting (rolling-window min-hash, winnowing-style). All pure column
expressions with exact DuckDB twins. The *trained* langid model runs over
the clip table (qcflow.udfs); this heuristic is the SQL-expressible tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t

MARKERS = ("the", "a")
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def _toks():
    return F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))


_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _spread(df: DataFrame) -> DataFrame:
    """Spread a SMALL-FILE corpus over the cluster before per-row-heavy
    expression work: the documents table is one ~2 MB parquet file at
    test SFs, so char-level expression passes (bigram/trigram explodes,
    levenshtein, shingles) otherwise run in ONE scan task regardless of
    core count. A 2 MB round-robin shuffle is noise next to the
    expression work it parallelizes; every consumer below is
    layout-invariant by construction (decimal sums / integer counts /
    map-only rows).

    The localCheckpoint is the PUSHDOWN BARRIER, not (only) a cache:
    explode() injects a `size(arr) > 0 AND isnotnull(arr)` filter on its
    input, and Catalyst pushes that predicate through the repartition
    into the scan — evaluating the whole array expression (several times,
    once per sub-expression reference) in the single scan task, which is
    exactly what the repartition was meant to prevent (the JVM-expression
    twin of the r5 ArrowEvalPython clone trap). A checkpointed 2 MB
    corpus costs one tiny job and pins every expression above it."""
    sc = df.sparkSession.sparkContext
    return df.repartition(2 * sc.defaultParallelism).localCheckpoint()


# bigram explode over a chars ARRAY: `substring(text, i, 2)` per position
# re-scans the string from the start on every access (UTF8String indexing
# is O(i)), an O(len^2) pass per document; zip_with over the split chars
# is O(len) and produces the IDENTICAL bigram strings.
_BIGRAM_ARR = (
    "zip_with(slice(split(text, ''), 1, length(text) - 1),"
    " slice(split(text, ''), 2, length(text) - 1),"
    " (a, b) -> concat(a, b))"
)


@query(
    "text_langid_heuristic",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, lang,
             len({_SQL_TOKS}) AS n_tokens,
             len(list_filter({_SQL_TOKS}, x -> x IN ('the', 'a'))) AS n_markers
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN n_tokens > 0 THEN CAST(n_markers AS DOUBLE) / n_tokens
                ELSE 0.0 END AS marker_ratio,
           CASE WHEN n_tokens > 0 AND CAST(n_markers AS DOUBLE) / n_tokens > 0.03
                THEN 'en' ELSE 'unk' END AS lang_pred
    FROM f
    """,
)
def text_langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker heuristic language ID: ratio of language-marker tokens.
    The cheap pre-filter tier before the trained model (route only
    low-margin rows to the UDF at scale)."""
    docs = t(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    n_markers = F.size(F.filter(toks, lambda x: x.isin(*MARKERS)))
    ratio = F.when(n_tokens > 0, n_markers.cast("double") / n_tokens).otherwise(0.0)
    return docs.select(
        "doc_id",
        "lang",
        ratio.alias("marker_ratio"),
        F.when(ratio > 0.03, "en").otherwise("unk").alias("lang_pred"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             len({_SQL_TOKS}) AS n_tokens,
             len(list_distinct({_SQL_TOKS})) AS n_distinct,
             length(text) AS n_len,
             length(regexp_replace(text, '[a-z .]', '', 'g')) AS n_sym
      FROM documents)
    SELECT doc_id,
           0.4 * LEAST(CAST(n_len AS DOUBLE) / 300.0, 1.0)
           + 0.4 * (CASE WHEN n_tokens > 0
                         THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END)
           + 0.2 * (1.0 - LEAST(CAST(n_sym AS DOUBLE) / GREATEST(n_len, 1) * 10.0, 1.0))
             AS quality,
           CASE WHEN 0.4 * LEAST(CAST(n_len AS DOUBLE) / 300.0, 1.0)
                     + 0.4 * (CASE WHEN n_tokens > 0
                                   THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END)
                     + 0.2 * (1.0 - LEAST(CAST(n_sym AS DOUBLE) / GREATEST(n_len, 1) * 10.0, 1.0))
                     >= 0.6 THEN 'high'
                WHEN 0.4 * LEAST(CAST(n_len AS DOUBLE) / 300.0, 1.0)
                     + 0.4 * (CASE WHEN n_tokens > 0
                                   THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END)
                     + 0.2 * (1.0 - LEAST(CAST(n_sym AS DOUBLE) / GREATEST(n_len, 1) * 10.0, 1.0))
                     >= 0.45 THEN 'medium'
                ELSE 'low' END AS tier
    FROM f
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score: length saturation + lexical diversity +
    symbol-density penalty, tiered high/medium/low."""
    docs = t(spark, sf_dir, "documents")
    toks = _toks()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_len = F.length("text")
    n_sym = F.length(F.regexp_replace(F.col("text"), "[a-z .]", ""))
    quality = (
        0.4 * F.least(n_len.cast("double") / 300.0, F.lit(1.0))
        + 0.4
        * F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens).otherwise(0.0)
        + 0.2
        * (
            1.0
            - F.least(
                n_sym.cast("double") / F.greatest(n_len, F.lit(1)) * 10.0, F.lit(1.0)
            )
        )
    )
    return docs.select(
        "doc_id",
        quality.alias("quality"),
        F.when(quality >= 0.6, "high")
        .when(quality >= 0.45, "medium")
        .otherwise("low")
        .alias("tier"),
    )


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           len({_SQL_TOKS}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
           CASE WHEN len({_SQL_TOKS}) > 0
                THEN CAST(length(replace(text, ' ', '')) AS DOUBLE) / len({_SQL_TOKS})
                ELSE 0.0 END AS avg_token_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex segmentation
    (letter runs / digit runs / single symbols) + mean token length."""
    docs = t(spark, sf_dir, "documents")
    toks = _toks()
    n_ws = F.size(toks)
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    avg_len = F.when(
        n_ws > 0,
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / n_ws,
    ).otherwise(0.0)
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        avg_len.alias("avg_token_len"),
    )


_SPARK_DOCHASH = (
    "aggregate(sequence(1, length(text)), 0L,"
    " (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007)"
)
_SQL_DOCHASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(range(1, length(text) + 1),"
    " i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),"
    " (acc, x) -> (acc * 31 + x) % 1000000007)"
)

_WIN = 16
_SPARK_WINHASH = (
    f"CASE WHEN length(text) >= {_WIN} THEN"
    f" array_min(transform(sequence(1, length(text) - {_WIN - 1}),"
    f" j -> aggregate(sequence(j, j + {_WIN - 1}), 0L,"
    " (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % 1000000007)))"
    f" ELSE {_SPARK_DOCHASH} END"
)
_SQL_WINHASH = (
    f"CASE WHEN length(text) >= {_WIN} THEN"
    f" list_min(list_transform(range(1, length(text) - {_WIN - 2}),"
    f" j -> list_reduce(list_prepend(CAST(0 AS BIGINT),"
    f" list_transform(range(j, j + {_WIN}),"
    " i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),"
    " (acc, x) -> (acc * 31 + x) % 1000000007)))"
    f" ELSE {_SQL_DOCHASH} END"
)


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           {_SQL_DOCHASH} AS fingerprint,
           {_SQL_WINHASH} AS min_window_hash
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-doc polynomial rolling hash (mod
    1e9+7) + winnowing-style minimum over 16-char window hashes. Shared
    integer arithmetic -> the oracle matches bit-for-bit."""
    docs = _spread(t(spark, sf_dir, "documents"))
    # One O(len) chars->codes pass, then hashes fold over the codes
    # ARRAY: the original per-window `ascii(substring(text, i, 1))` form
    # re-scans the string from the start on every character access
    # (UTF8String indexing is O(i)), making the winnowing pass
    # O(len^2 * win) — measured 24 s over 5k docs at sf0.1, ~1 s with
    # the array form. Identical integer arithmetic (same fold order,
    # same mod), so the frozen oracle still matches bit-for-bit.
    codes = (
        "CASE WHEN length(text) = 0 THEN array(0L, 0L)"
        " ELSE transform(split(text, ''), c -> bigint(ascii(c))) END"
    )
    dochash = (
        "aggregate(_codes, 0L, (acc, x) -> (acc * 31 + x) % 1000000007)"
    )
    winhash = (
        f"CASE WHEN length(text) >= {_WIN} THEN"
        f" array_min(transform(sequence(1, length(text) - {_WIN - 1}),"
        f" j -> aggregate(slice(_codes, j, {_WIN}), 0L,"
        " (acc, x) -> (acc * 31 + x) % 1000000007)))"
        f" ELSE {dochash} END"
    )
    return docs.select(
        "doc_id", F.col("text"), F.expr(codes).alias("_codes")
    ).select(
        "doc_id",
        F.expr(dochash).alias("fingerprint"),
        F.expr(winhash).alias("min_window_hash"),
    )


# --------------------------------------------------- decontamination
#
# The pretraining-data hygiene step every serious pipeline runs (the
# GPT-3 appendix recipe): flag corpus documents sharing word n-grams
# with a held-out benchmark/eval set so evaluation data never leaks
# into training. Scale shape: the benchmark side is TINY relative to a
# 10^12-doc corpus, so its distinct shingles BROADCAST and the corpus
# never shuffles — one scan, one broadcast hash join, one per-doc
# aggregate. The benchmark here is derived from the documents table
# itself (character spans of every 41st doc), so the oracle is pure SQL
# over the driver tables with guaranteed non-vacuous overlap.

_DC_N = 5  # word n-gram size (production uses 8-13; 5 suits fixture-length docs)

_DC_SPARK_SH = f"""
  array_distinct(
    CASE WHEN size(toks) >= {_DC_N}
         THEN transform(sequence(0, size(toks) - {_DC_N}),
                        i -> concat_ws(' ', slice(toks, i + 1, {_DC_N})))
         ELSE array() END)
"""

_DC_SQL_SH = f"""
  list_distinct(
    CASE WHEN len(toks) >= {_DC_N}
         THEN list_transform(range(1, len(toks) - {_DC_N} + 2),
                             i -> array_to_string(toks[i:i+{_DC_N}-1], ' '))
         ELSE [] END)
"""

_DC_SQL_BENCH = """
  SELECT doc_id AS bench_id, substring(text, 11, 120) AS text
  FROM documents WHERE doc_id % 41 = 0
"""


@query(
    "text_decontaminate",
    oracle=f"""
    WITH bt AS (SELECT bench_id,
                       list_filter(string_split(text, ' '), x -> x <> '') AS toks
                FROM ({_DC_SQL_BENCH})),
    bsh AS (SELECT DISTINCT bench_id, unnest({_DC_SQL_SH}) AS shingle FROM bt),
    ct AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x <> '') AS toks
           FROM documents),
    csh AS (SELECT doc_id, unnest({_DC_SQL_SH}) AS shingle FROM ct)
    SELECT c.doc_id,
           COUNT(DISTINCT c.shingle) AS n_shingles_hit,
           COUNT(DISTINCT b.bench_id) AS n_bench_hit
    FROM csh c JOIN bsh b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every corpus document sharing at least
    one word {n}-gram with the benchmark set, with how many distinct
    shingles and distinct benchmark rows it hits (the triage columns a
    removal/quarantine pass keys on). The benchmark's distinct shingles
    are dimension-sized and BROADCAST — at 10^12 corpus docs the plan is
    scan -> explode -> broadcast hash join -> per-doc aggregate, no
    corpus shuffle before the (contaminated-docs-sized) groupBy."""
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    bench = (
        docs.filter(F.col("doc_id") % 41 == 0)
        .select(
            F.col("doc_id").alias("bench_id"),
            F.substring("text", 11, 120).alias("text"),
        )
        .withColumn("toks", toks)
        .select("bench_id", F.explode(F.expr(_DC_SPARK_SH)).alias("shingle"))
        .distinct()
    )
    corpus = (
        docs.withColumn("toks", toks)
        .select("doc_id", F.explode(F.expr(_DC_SPARK_SH)).alias("shingle"))
    )
    return (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shingles_hit"),
            F.countDistinct("bench_id").alias("n_bench_hit"),
        )
    )


# ----------------------------------------------- transcript-draft CER QC

@query(
    "text_edit_distance_qc",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ),
    pair AS (
      SELECT doc_id,
             array_to_string(toks, ' ') AS canon,
             array_to_string(
               list_transform(
                 list_filter(range(len(toks)),
                             i -> i % (CASE WHEN doc_id % 5 = 0 THEN 7
                                            ELSE 29 END) <> 0),
                 i -> toks[i + 1]),
               ' ') AS draft
      FROM tok
    )
    SELECT doc_id,
           levenshtein(canon, draft) AS edit_dist,
           CAST(levenshtein(canon, draft) AS DOUBLE)
             / greatest(length(canon), 1) AS cer,
           CASE WHEN CAST(levenshtein(canon, draft) AS DOUBLE)
                     / greatest(length(canon), 1) > 0.05
                THEN 1 ELSE 0 END AS cer_flag
    FROM pair
    """,
)
def text_edit_distance_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript-vs-draft character error rate: the QC check a speech
    pipeline runs between the shipped transcript and an independent ASR
    draft (here a deterministic planted draft: every 7th word dropped for
    doc_id%5==0 docs — heavy corruption — every 29th otherwise). The
    distance is Spark's built-in ``levenshtein`` (JVM codegen, per-row
    compute, NO shuffle — the whole check is map-only and embarrassingly
    parallel at any scale); cer normalises by the canonical length and
    the flag marks rows a real pipeline would route to human review.
    Both engines derive the draft with identical integer arithmetic, so
    the oracle checks the full distance computation."""
    tok = _spread(t(spark, sf_dir, "documents")).select(
        "doc_id", _toks().alias("toks")
    )
    period = F.when(F.col("doc_id") % 5 == 0, F.lit(7)).otherwise(F.lit(29))
    pair = tok.select(
        "doc_id",
        F.array_join("toks", " ").alias("canon"),
        F.array_join(
            F.filter("toks", lambda x, i: i % period != 0), " "
        ).alias("draft"),
    )
    dist = F.levenshtein("canon", "draft")
    cer = dist.cast("double") / F.greatest(F.length("canon"), F.lit(1))
    return pair.select(
        "doc_id",
        dist.alias("edit_dist"),
        cer.alias("cer"),
        F.when(cer > 0.05, 1).otherwise(0).alias("cer_flag"),
    )


@query(
    "x_tokenizer_vocab",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents),
    c AS (
      SELECT token,
             COUNT(*) AS n_occurrences,
             COUNT(DISTINCT doc_id) AS n_docs
      FROM tok GROUP BY token),
    top AS (
      SELECT token, n_occurrences, n_docs
      FROM c ORDER BY n_occurrences DESC, token LIMIT 20)
    SELECT token, n_occurrences, n_docs,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token)
                AS INT) AS vocab_id
    FROM top
    """,
)
def x_tokenizer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-training vocabulary: global top-K tokens by corpus
    frequency with document frequency and a dense token id, deterministic
    tie-break on the token string (count ties otherwise make the top-K
    set partition-layout-dependent). Scale shape: explode fuses into the
    scan, the count is one hash aggregate with map-side partials, and the
    top-K is TakeOrderedAndProject (per-partition heap + K-row driver
    merge — the vocab never exists as a globally sorted frame). The
    K-row id assignment is a window over the already-K-sized result, the
    same plot-sized-only idiom as p6 (reference_ops.py docstring)."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(_toks()).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )
    top = counts.orderBy(F.col("n_occurrences").desc(), "token").limit(20)
    return top.select(
        "token",
        "n_occurrences",
        "n_docs",
        F.row_number()
        .over(Window.orderBy(F.col("n_occurrences").desc(), "token"))
        .alias("vocab_id"),
    )


@query(
    "x_bigram_lm_train",
    oracle="""
    WITH bg AS (
      SELECT substring(d.text, gs.i, 2) AS bigram
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(1, length(d.text) - 1))
                    AS i) gs
      WHERE length(d.text) >= 2),
    c AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram),
    p AS (SELECT substring(bigram, 1, 1) AS c0, SUM(n) AS n0
          FROM c GROUP BY c0)
    SELECT c.bigram, CAST(c.n AS BIGINT) AS n,
           ROUND(LN((c.n + 0.5) / (p.n0 + 0.5 * 64)), 6) AS logprob
    FROM c JOIN p ON substring(c.bigram, 1, 1) = p.c0
    """,
)
def x_bigram_lm_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the QC perplexity model's character-bigram table as a
    DISTRIBUTED job — the scale path for what qcflow/models.py trains
    driver-side on a seed corpus: scan-fused character-pair explode
    (sequence + substring, no Python), one map-side-combining count per
    bigram, prefix totals re-aggregated from the ALREADY-REDUCED bigram
    counts (alphabet² rows, not corpus rows), add-half smoothing to
    log-probs. The prefix join is alphabet-sized — broadcast, no second
    corpus shuffle. Rounded to 6 dp (a8's convention) so both engines'
    LN agree despite last-ulp libm differences. At 10^12 docs the only
    corpus-sized stage is the first count's map side; everything after
    is alphabet-sized."""
    docs = _spread(t(spark, sf_dir, "documents").filter(F.length("text") >= 2))
    bg = docs.select(F.explode(F.expr(_BIGRAM_ARR)).alias("bigram"))
    counts = bg.groupBy("bigram").agg(F.count("*").alias("n"))
    prefix = counts.groupBy(
        F.substring("bigram", 1, 1).alias("c0")
    ).agg(F.sum("n").alias("n0"))
    return (
        counts.join(
            F.broadcast(prefix),
            F.substring(F.col("bigram"), 1, 1) == F.col("c0"),
        )
        .select(
            "bigram",
            "n",
            F.round(
                F.log((F.col("n") + 0.5) / (F.col("n0") + 0.5 * 64)), 6
            ).alias("logprob"),
        )
    )


@query(
    "x_langid_train",
    oracle="""
    WITH tri AS (
      SELECT d.lang,
             (ascii(substring(d.text, gs.i, 1)) * 961
              + ascii(substring(d.text, gs.i + 1, 1)) * 31
              + ascii(substring(d.text, gs.i + 2, 1))) % 4096 AS h
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(1, length(d.text) - 2))
                    AS i) gs
      WHERE length(d.text) >= 3),
    c AS (SELECT lang, h, COUNT(*) AS n FROM tri GROUP BY lang, h),
    tot AS (SELECT lang, SUM(n) AS n_l FROM c GROUP BY lang)
    SELECT c.lang, CAST(c.h AS INT) AS h, CAST(c.n AS BIGINT) AS n,
           ROUND(LN((c.n + 1.0) / (tot.n_l + 4096.0)), 6) AS logprob
    FROM c JOIN tot ON c.lang = tot.lang
    """,
)
def x_langid_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the langid trigram table as a DISTRIBUTED job — the scale
    path for qcflow/models.py's driver-side seed training, same model
    family: hashed trigrams ((b0*961 + b1*31 + b2) mod 4096, here via
    ascii codes since the corpus is ASCII) -> per-(lang, bucket) counts
    -> add-1-smoothed log P(trigram | lang). One corpus-sized
    map-side-combining count; the per-lang totals re-aggregate the
    ALREADY-REDUCED (lang, bucket) counts (at most langs x 4096 rows)
    and join back broadcast — nothing after the first count touches
    corpus-sized data. 6-dp rounding per the a8 convention so both
    engines' LN agree."""
    docs = _spread(t(spark, sf_dir, "documents").filter(F.length("text") >= 3))
    # O(len) trigram hashing over the chars->codes array (identical
    # integer arithmetic to the per-position substring form, which paid
    # O(len^2) string re-scans — see _BIGRAM_ARR)
    codes = "transform(split(text, ''), c -> ascii(c))"
    tri_h = (
        f"transform(sequence(1, length(text) - 2),"
        f" i -> (element_at(_codes, i) * 961"
        f" + element_at(_codes, i + 1) * 31"
        f" + element_at(_codes, i + 2)) % 4096)"
    )
    tri = docs.select(
        "lang", "text", F.expr(codes).alias("_codes")
    ).select("lang", F.explode(F.expr(tri_h)).alias("h"))
    counts = tri.groupBy("lang", "h").agg(F.count("*").alias("n"))
    tot = counts.groupBy("lang").agg(F.sum("n").alias("n_l"))
    return counts.join(F.broadcast(tot), "lang").select(
        "lang",
        "h",
        "n",
        F.round(
            F.log((F.col("n") + 1.0) / (F.col("n_l") + 4096.0)), 6
        ).alias("logprob"),
    )


# -------------------------------------------- distributed BPE training
#
# The tokenizer-TRAINING job (Sennrich et al. 2016) as a Spark loop:
# one corpus-sized word count, then every merge round is
# vocabulary-sized (adjacent-pair explode over word TYPES weighted by
# count, one-row argmax collect, JVM-side fold merge — qcflow/bpe.py).
# Construction truth: a planted corpus whose per-round winning pair
# beats the runner-up by >= 2 occurrences for every round (asserted at
# build via the driver-side twin), so integer-exact engines can never
# disagree on any merge; the oracle reads the truth merge table while
# Spark re-derives it through the corpus.

_BPE_ROUNDS = 12
_BPE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache",
    "text_qc",
)
_BPE_FIX = os.path.join(_BPE_DIR, "bpe_corpus_v1.parquet")
_BPE_TRUTH = os.path.join(_BPE_DIR, "bpe_truth_v1.parquet")


def _materialize_bpe() -> None:
    import numpy as np
    import pandas as pd

    if os.path.exists(_BPE_FIX) and os.path.exists(_BPE_TRUTH):
        return
    from qcflow.bpe import bpe_train_py, margin_at_round

    os.makedirs(_BPE_DIR, exist_ok=True)
    alphabet = "abcde"
    for seed in range(200):
        rng = np.random.default_rng([515190, seed])
        n_types = 40
        words, seen = [], set()
        while len(words) < n_types:
            ln = int(rng.integers(3, 7))
            w = "".join(alphabet[k] for k in rng.integers(0, 5, ln))
            if w not in seen:
                seen.add(w)
                words.append(w)
        counts = {w: int(997 - 23 * i) for i, w in enumerate(words)}
        merges = bpe_train_py(counts, rounds=_BPE_ROUNDS)
        if len(merges) < _BPE_ROUNDS:
            continue
        try:
            gaps = margin_at_round(counts, merges)
        except AssertionError:
            continue
        if min(gaps) >= 2:
            break
    else:  # pragma: no cover — the search space makes this unreachable
        raise RuntimeError("no BPE fixture seed with per-round margin >= 2")
    # round-robin the word occurrences into documents
    n_docs = 60
    docs: list[list[str]] = [[] for _ in range(n_docs)]
    slot = 0
    for w, c in counts.items():
        for _ in range(c):
            docs[slot % n_docs].append(w)
            slot += 1
    pd.DataFrame(
        {"doc_id": range(n_docs), "text": [" ".join(d) for d in docs]}
    ).to_parquet(_BPE_FIX, index=False)
    tr = pd.DataFrame(merges)
    tr["n"] = tr["n"].astype("int64")
    tr["round"] = tr["round"].astype("int32")
    tr.to_parquet(_BPE_TRUTH, index=False)


_materialize_bpe()


@query(
    "x_bpe_train",
    oracle=f"""
    SELECT CAST("round" AS INT) AS round, "left" AS pair_left,
           "right" AS pair_right, merged, CAST(n AS BIGINT) AS n
    FROM '{_BPE_TRUTH}'
    """,
)
def x_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training recovered THROUGH the corpus:
    one corpus-sized word-type count, then 12 merge rounds each
    vocabulary-sized — pair counting is a scan-fused explode +
    map-side-combining sum over word TYPES, the argmax is a one-row
    collect (scalar-only driver traffic), and the merge applies as a
    JVM-side aggregate fold with localCheckpoint keeping the loop
    lineage flat (qcflow/bpe.py). The fixture plants >= 2-count margins
    between winner and runner-up at every round, so the integer-exact
    argmax can never flip; the oracle reads the build-time twin's merge
    table."""
    import pandas as pd

    from qcflow.bpe import bpe_train

    _materialize_bpe()
    corpus = spark.read.parquet(_BPE_FIX)
    merges = bpe_train(corpus, "text", rounds=_BPE_ROUNDS)
    pdf = pd.DataFrame(merges)[["round", "left", "right", "merged", "n"]]
    pdf.columns = ["round", "pair_left", "pair_right", "merged", "n"]
    pdf["round"] = pdf["round"].astype("int32")
    pdf["n"] = pdf["n"].astype("int64")
    return spark.createDataFrame(pdf)


_BPE_ENC_TRUTH = os.path.join(_BPE_DIR, "bpe_enc_truth_v1.parquet")


def _materialize_bpe_enc() -> None:
    import pandas as pd

    if os.path.exists(_BPE_ENC_TRUTH):
        return
    from qcflow.bpe import encode_word_py

    _materialize_bpe()
    corpus = pd.read_parquet(_BPE_FIX)
    merges = pd.read_parquet(_BPE_TRUTH).to_dict("records")
    rows = []
    for r in corpus.itertuples():
        words = [w for w in r.text.split(" ") if w]
        toks: list[str] = []
        for w in words:
            toks.extend(encode_word_py(w, merges))
        rows.append(
            {
                "doc_id": r.doc_id,
                "n_words": len(words),
                "n_tokens": len(toks),
                "token_stream": " ".join(toks),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["n_words"] = pdf["n_words"].astype("int32")
    pdf["n_tokens"] = pdf["n_tokens"].astype("int64")
    pdf.to_parquet(_BPE_ENC_TRUTH, index=False)


_materialize_bpe_enc()


@query(
    "x_bpe_encode",
    oracle=f"""
    SELECT doc_id, CAST(n_words AS INT) AS n_words,
           CAST(n_tokens AS BIGINT) AS n_tokens, token_stream
    FROM '{_BPE_ENC_TRUTH}'
    """,
)
def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merge table (the inference half of
    x_bpe_train): words explode scan-side, all 12 merges apply as
    chained JVM folds collapsed into one codegen projection — no Python
    — and the only shuffle is the per-document regroup (order restored
    via the posexplode index). The oracle is the build-time twin's
    encoding of the same corpus with the same merge table; a unit test
    additionally pins this literal-expression path byte-equal to
    bpe_encode_udf, the broadcast-ranks strategy production
    vocabularies (32k merges) dispatch to."""
    import pandas as pd

    from qcflow.bpe import bpe_encode

    _materialize_bpe_enc()
    merges = pd.read_parquet(_BPE_TRUTH).to_dict("records")
    corpus = spark.read.parquet(_BPE_FIX)
    return bpe_encode(corpus, merges)


# ------------------------------------- importance-based data selection
#
# DSIR-flavored contrastive selection: score every document by how much
# better the TARGET-domain character-bigram LM (here: the 'en' subset —
# the synthetic corpus's real domain axis) explains it than the
# whole-corpus LM (sum over bigram occurrences of lp_target -
# lp_source), and select documents scoring above the CORPUS MEAN.
# Everything is integer-gated: per-bigram log-probs reuse
# x_bigram_lm_train's 6-dp-rounded convention, per-doc sums run in
# DECIMAL (order-invariant — a double SUM over distributed partitions
# is not), the score ships as micro-units in a BIGINT, and the
# above-mean cut is the pure integer comparison
# score_micro * n_docs > sum(score_micro) — no division, no float
# threshold for the engines to disagree on. Bigrams the target never
# saw take a flat -15.0 floor (both engines); the source LM covers
# every corpus bigram by construction, so that side joins inner.

_IR_FLOOR = "-15.0"
_IR_TARGET_LANG = "en"


@query(
    "x_importance_resample",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, lang
      FROM documents WHERE length(text) >= 2
    ),
    bg AS (
      SELECT doc_id, substring(text, gs.i, 2) AS bigram
      FROM corpus,
           LATERAL (SELECT unnest(generate_series(1, length(text) - 1))
                    AS i) gs
    ),
    tbg AS (
      SELECT substring(text, gs.i, 2) AS bigram
      FROM corpus,
           LATERAL (SELECT unnest(generate_series(1, length(text) - 1))
                    AS i) gs
      WHERE lang = '{_IR_TARGET_LANG}'
    ),
    tc AS (SELECT bigram, COUNT(*) AS n FROM tbg GROUP BY bigram),
    tp AS (SELECT substring(bigram, 1, 1) AS c0, SUM(n) AS n0
           FROM tc GROUP BY c0),
    tlm AS (SELECT tc.bigram,
                   ROUND(LN((tc.n + 0.5) / (tp.n0 + 0.5 * 64)), 6) AS lp
            FROM tc JOIN tp ON substring(tc.bigram, 1, 1) = tp.c0),
    sc AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram),
    sp AS (SELECT substring(bigram, 1, 1) AS c0, SUM(n) AS n0
           FROM sc GROUP BY c0),
    slm AS (SELECT sc.bigram,
                   ROUND(LN((sc.n + 0.5) / (sp.n0 + 0.5 * 64)), 6) AS lp
            FROM sc JOIN sp ON substring(sc.bigram, 1, 1) = sp.c0),
    per_doc AS (
      SELECT bg.doc_id,
             COUNT(*) AS n_bigrams,
             CAST((SUM(CAST(COALESCE(t.lp, {_IR_FLOOR}) AS DECIMAL(20,6)))
                   - SUM(CAST(s.lp AS DECIMAL(20,6)))) * 1000000 AS BIGINT)
               AS score_micro
      FROM bg
      LEFT JOIN tlm t ON bg.bigram = t.bigram
      JOIN slm s ON bg.bigram = s.bigram
      GROUP BY bg.doc_id
    ),
    tot AS (SELECT COUNT(*) AS n_docs, SUM(score_micro) AS total
            FROM per_doc)
    SELECT doc_id, CAST(n_bigrams AS INT) AS n_bigrams, score_micro,
           (score_micro * tot.n_docs > tot.total) AS selected
    FROM per_doc, tot
    """,
)
def x_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-based data selection (the DSIR shape): train the
    target-domain ('en') and whole-corpus character-bigram LMs as
    distributed jobs (each = one corpus-sized map-side-combining count,
    everything after alphabet-sized), broadcast BOTH model tables (a
    few KB), and score every document in one more corpus pass —
    explode bigrams, two broadcast joins, one decimal-summing groupBy.
    No shuffle ever carries corpus text; the per-doc sum uses DECIMAL
    so the result is identical under any partitioning (a double SUM is
    reduction-order-sensitive); the contrastive score ships as exact
    micro-units in a BIGINT, and the above-mean selection is the pure
    integer comparison score * n_docs > total — no division for the
    engines to round differently. A test pins the selection bias
    toward the target language."""
    docs = _spread(t(spark, sf_dir, "documents").filter(F.length("text") >= 2))

    def _bigrams(d: DataFrame, *cols: str) -> DataFrame:
        return d.select(*cols, F.explode(F.expr(_BIGRAM_ARR)).alias("bigram"))

    def _lm(d: DataFrame) -> DataFrame:
        counts = _bigrams(d).groupBy("bigram").agg(F.count("*").alias("n"))
        prefix = counts.groupBy(
            F.substring("bigram", 1, 1).alias("c0")
        ).agg(F.sum("n").alias("n0"))
        return counts.join(
            F.broadcast(prefix),
            F.substring(F.col("bigram"), 1, 1) == F.col("c0"),
        ).select(
            "bigram",
            F.round(
                F.log((F.col("n") + 0.5) / (F.col("n0") + 0.5 * 64)), 6
            ).alias("lp"),
        )

    tlm = _lm(docs.filter(F.col("lang") == _IR_TARGET_LANG)).withColumnRenamed(
        "lp", "lp_t"
    )
    slm = _lm(docs).withColumnRenamed("lp", "lp_s")
    diff = F.col("st") - F.col("ss")
    per_doc = (
        _bigrams(docs, "doc_id")
        .join(F.broadcast(tlm), "bigram", "left")
        .join(F.broadcast(slm), "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_bigrams"),
            F.sum(
                F.coalesce(F.col("lp_t"), F.lit(float(_IR_FLOOR))).cast(
                    "decimal(20,6)"
                )
            ).alias("st"),
            F.sum(F.col("lp_s").cast("decimal(20,6)")).alias("ss"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            (diff * 1000000).cast("long").alias("score_micro"),
        )
        # doc-sized frame read TWICE below (global total + selection):
        # pin it, or the whole score pipeline (bigram explode + two
        # broadcast-LM joins) re-executes for each reference
        .localCheckpoint()
    )
    tot = per_doc.agg(
        F.count("*").alias("n_docs"), F.sum("score_micro").alias("total")
    )
    return per_doc.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "n_bigrams",
        "score_micro",
        (F.col("score_micro") * F.col("n_docs") > F.col("total")).alias(
            "selected"
        ),
    )
