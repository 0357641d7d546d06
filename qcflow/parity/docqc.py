"""Document QC — the flagship pipeline shape, on the driver `documents` table.

This is the reference's whole lifecycle (features → rules → flag+reasons →
filter → per-dimension outlier summaries; ``Home.py:161-184`` rule engine,
``Home.py:445-904`` breakdown kernel) re-expressed as pure Spark column
expressions over text rows, matching the north-rule target (language-ID +
quality-filter + scrub). Every step is SQL-expressible, so the whole
pipeline carries a DuckDB oracle.

The same rule engine runs over the synthetic audio-clip table in
``qcflow/pipeline.py``; here it runs on `documents` so the driver's
correctness gate covers it end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t

# Rule thresholds (documents table; clip thresholds are data-derived in
# qcflow.rules — these are fixed config, mirroring the reference's
# user-overridable sidebar scalars, Home.py:341-364).
MIN_CHARS = 100
MIN_DISTINCT_RATIO = 0.32
MAX_SYMBOL_RATIO = 0.05

# Scrub patterns — compatible subset of Java regex (Spark) and RE2 (DuckDB).
SCRUB_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
    (r"\b[A-Z]{2}[0-9]{6,}\b", "<ID>"),
    (r"\b(damn|hell|stupid|idiot)\b", "<TOX>"),
]


def _tokens() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))


def doc_features(docs: DataFrame) -> DataFrame:
    """Per-row text features as one projection (whole-stage codegen fuses
    all of them into the scan pass — the Spark analog of the reference's
    derived-column loop, Home.py:138-139)."""
    toks = _tokens()
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_sym = F.length(F.regexp_replace(F.col("text"), "[a-z ]", ""))
    n_len = F.length(F.col("text"))
    return docs.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.when(n_tokens > 0, n_distinct.cast("double") / n_tokens)
        .otherwise(F.lit(0.0))
        .alias("distinct_ratio"),
        F.when(n_len > 0, n_sym.cast("double") / n_len)
        .otherwise(F.lit(0.0))
        .alias("symbol_ratio"),
    )


def doc_rules(feats: DataFrame) -> DataFrame:
    """Rule engine P5 (Home.py:175-183): evaluate every rule, collect the
    fired reasons, keep = no rule fired. concat_ws drops NULLs, giving a
    deterministic ordered reason list identically in Spark and DuckDB."""
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_chars") < MIN_CHARS, F.lit("too_short")),
        F.when(F.col("distinct_ratio") < MIN_DISTINCT_RATIO, F.lit("too_repetitive")),
        F.when(F.col("symbol_ratio") > MAX_SYMBOL_RATIO, F.lit("symbol_dense")),
    )
    return feats.select("*", reasons.alias("drop_reasons")).withColumn(
        "keep", F.col("drop_reasons") == ""
    )


def doc_scrub(df: DataFrame, col: str = "text") -> DataFrame:
    """Ordered regexp_replace chain (PII then toxicity) — idempotent."""
    out = F.col(col)
    for pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn("scrubbed_text", out)


_SQL_FEATURES = f"""
  SELECT *,
    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
    CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
         THEN len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) * 1.0
              / len(list_filter(string_split(text, ' '), x -> x <> ''))
         ELSE 0.0 END AS distinct_ratio,
    CASE WHEN length(text) > 0
         THEN length(regexp_replace(text, '[a-z ]', '', 'g')) * 1.0 / length(text)
         ELSE 0.0 END AS symbol_ratio
  FROM documents
"""

_SQL_RULES = f"""
  SELECT *,
    concat_ws(',',
      CASE WHEN n_chars < {MIN_CHARS} THEN 'too_short' END,
      CASE WHEN distinct_ratio < {MIN_DISTINCT_RATIO} THEN 'too_repetitive' END,
      CASE WHEN symbol_ratio > {MAX_SYMBOL_RATIO} THEN 'symbol_dense' END
    ) AS drop_reasons
  FROM ({_SQL_FEATURES})
"""


@query(
    "doc_qc_flags",
    oracle=f"""
    SELECT doc_id, lang, n_tokens, distinct_ratio, symbol_ratio, drop_reasons,
           drop_reasons = '' AS keep,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '{SCRUB_PATTERNS[0][0]}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9 -]{{7,}}[0-9]', '<PHONE>', 'g'),
             '\\b[A-Z]{{2}}[0-9]{{6,}}\\b', '<ID>', 'g'),
             '\\b(damn|hell|stupid|idiot)\\b', '<TOX>', 'g') AS scrubbed_text
    FROM ({_SQL_RULES})
    """,
)
def doc_qc_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document QC verdict: features → rules → scrub (P5 + M4)."""
    docs = t(spark, sf_dir, "documents")
    flagged = doc_scrub(doc_rules(doc_features(docs)))
    return flagged.select(
        "doc_id",
        "lang",
        "n_tokens",
        "distinct_ratio",
        "symbol_ratio",
        "drop_reasons",
        "keep",
        "scrubbed_text",
    )


@query(
    "doc_qc_summary",
    oracle=f"""
    WITH flagged AS ({_SQL_RULES}),
    total AS (SELECT lang, COUNT(*) AS n_docs FROM flagged GROUP BY lang),
    outl AS (
      SELECT lang, unnest(string_split(drop_reasons, ',')) AS drop_reason
      FROM flagged WHERE drop_reasons <> ''
    ),
    hist AS (SELECT lang, drop_reason, COUNT(*) AS count_out
             FROM outl GROUP BY lang, drop_reason)
    SELECT hist.lang AS lang, drop_reason, count_out, n_docs,
           100.0 * count_out / n_docs AS pct_of_lang
    FROM hist JOIN total ON hist.lang = total.lang
    """,
)
def doc_qc_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship summary: drop-reason histogram per language with
    pct-of-total — the reference's outlier-breakdown kernel (A4+J5+P9,
    Home.py:456-462) over QC verdicts. The per-lang totals aggregate is
    broadcast into the join (it is dimension-sized by construction)."""
    flagged = doc_rules(doc_features(t(spark, sf_dir, "documents")))
    total = flagged.groupBy("lang").agg(F.count("*").alias("n_docs"))
    hist = (
        flagged.filter(F.col("drop_reasons") != "")
        .select("lang", F.explode(F.split("drop_reasons", ",")).alias("drop_reason"))
        .groupBy("lang", "drop_reason")
        .agg(F.count("*").alias("count_out"))
    )
    return hist.join(F.broadcast(total), "lang").select(
        "lang",
        "drop_reason",
        "count_out",
        "n_docs",
        (F.lit(100.0) * F.col("count_out") / F.col("n_docs")).alias("pct_of_lang"),
    )
