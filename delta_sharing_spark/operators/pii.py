"""PII detection and redaction over text columns — corpus-prep operators.

Standard large-scale training-data hygiene (the reference's protocol carries
no row-level compute, so this extends the engine the way the brief's
LLM-pipeline section asks): detect and mask emails, URLs, IPv4 addresses
and SSN-shaped identifiers with JVM-side regex expressions only —
``regexp_count`` / ``regexp_replace`` run inside whole-stage codegen, no
Python in the hot path, no shuffle for per-document work.

Patterns are written in the common subset of Java regex (Spark) and RE2
(DuckDB oracles): character classes, bounded repetition and ``\\b`` word
boundaries — no backreferences or lookaround, so both engines and any
future RE2-based executor agree byte-for-byte.

At 100 TB: detection is a map-only projection (no shuffle at all until the
caller aggregates); redaction is a chained projection the scanner pipelines
with the read. Pattern order is fixed (email → url → ipv4 → ssn) so
overlapping matches resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered: applied in this sequence during redaction
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[A-Za-z0-9./_-]+", "<URL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
]


def pii_counts(text: Column) -> list[Column]:
    """Per-category match-count columns (``<name>_count``) for one text
    column — a pure projection, pipelined with the scan. NULL text counts
    as zero matches (so ``has_pii`` stays two-valued and NULL-text rows
    never vanish from both sides of a has_pii split)."""
    return [
        F.coalesce(F.regexp_count(text, F.lit(pattern)), F.lit(0))
        .alias(f"{name}_count")
        for name, pattern, _mask in PII_PATTERNS
    ]


def detect_pii(df: DataFrame, text_col: str) -> DataFrame:
    """Append per-category PII match counts and a ``has_pii`` flag."""
    counts = pii_counts(F.col(text_col))
    out = df.select("*", *counts)
    total = None
    for name, _p, _m in PII_PATTERNS:
        c = F.col(f"{name}_count")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def redact_pii(df: DataFrame, text_col: str,
               out_col: str | None = None) -> DataFrame:
    """Mask every PII match with its category token, in fixed pattern
    order. Chained ``regexp_replace`` stays one codegen'd projection."""
    redacted = F.col(text_col)
    for _name, pattern, mask in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pattern, mask)
    return df.withColumn(out_col or text_col, redacted)
