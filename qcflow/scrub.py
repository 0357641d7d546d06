"""PII/toxicity scrub: an ordered, idempotent regexp_replace chain.

The pattern table is config (broadcast-sized); the transform is pure JVM
column expressions — Catalyst fuses the whole chain into the same codegen
stage as the feature projection. Patterns use the common subset of Java
regex (Spark), RE2 (DuckDB oracle), and Python ``re`` (reference labeler).

Idempotence (property-tested): replacement tokens ``<EMAIL>`` etc. cannot
themselves match any pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCRUB_PATTERNS: list[tuple[str, str]] = [
    # PII first, then toxicity — order is part of the contract.
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9 -]{7,}[0-9]", "<PHONE>"),
    (r"\b[A-Z]{2}[0-9]{6,}\b", "<ID>"),
    (r"\b(damn|hell|stupid|idiot)\b", "<TOX>"),
]


def scrub_col(col: Column) -> Column:
    out = col
    for pat, repl in SCRUB_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub(df: DataFrame, col: str = "transcript", out: str = "scrubbed_transcript") -> DataFrame:
    return df.withColumn(out, scrub_col(F.col(col)))


def scrub_text(text: str | None) -> str | None:
    """Python twin of scrub_col (used by the reference labeler and tests)."""
    import re

    if text is None:
        return None
    for pat, repl in SCRUB_PATTERNS:
        text = re.sub(pat, repl, text)
    return text
