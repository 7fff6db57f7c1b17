"""PII detection + redaction for training corpora: emails, IPv4 addresses,
phone numbers, long digit runs — the cheap regex layer every web-scale
pipeline runs before anything model-based.

Reference parity note: the reference engine (mark-hartmann/jsonschema) has
no corpus operators — this is training-data-pipeline surface layered on the
validation engine.

Patterns are deliberately restricted to the RE2 ∩ java.util.regex common
subset (no lookaround, no backreferences, ASCII classes + \\b), so the
DuckDB oracle evaluates the IDENTICAL pattern text and the contract query
hash-matches, including the md5 of every redacted document.

Scale shape: pure Column expressions (regexp_count / regexp_replace run
JVM-side inside whole-stage codegen) — a single projection over the
corpus, zero shuffles, zero Python.  Counting runs each pattern on the RAW
text independently (a digit run inside an email counts for both families —
deterministic, documented); redaction applies the patterns sequentially
(email → phone → IPv4 → digit run), so earlier placeholders stop later
patterns from re-matching inside consumed spans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE = r"\+\d[\d\- ]{6,}\d"  # international-form: requires the leading +
DIGIT_RUN = r"\b\d{9,}\b"  # SSN/CC/account-shaped long ids

# (name, pattern, placeholder) in redaction order
PII_PATTERNS = (
    ("emails", EMAIL, "<EMAIL>"),
    ("phones", PHONE, "<PHONE>"),
    ("ipv4s", IPV4, "<IP>"),
    ("digit_runs", DIGIT_RUN, "<NUM>"),
)


def pii_count(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern)).cast("bigint")


def redact(col: Column) -> Column:
    """All PII spans replaced by typed placeholders, in PII_PATTERNS order."""
    out = col
    for _, pattern, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def pii_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII profile: one count column per pattern family,
    pii_total, and the redacted text.  Single codegen'd projection."""
    counts = [pii_count(F.col(text_col), p).alias(name) for name, p, _ in PII_PATTERNS]
    total = sum(
        (pii_count(F.col(text_col), p) for _, p, _ in PII_PATTERNS),
        F.lit(0).cast("bigint"),
    )
    return df.select(
        F.col(id_col),
        *counts,
        total.alias("pii_total"),
        redact(F.col(text_col)).alias("redacted"),
    )


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The corpus with ``text_col`` redacted in place — the write-path op."""
    return df.withColumn(text_col, redact(F.col(text_col)))
