"""Raw-crawl text hygiene: HTML -> text extraction and encoding health.

The two steps every web-scale LLM corpus runs BEFORE the quality/dedup
ladder (operators/text.py) sees a document:

- ``extract_html_text``: strip script/style blocks, comments, and tags;
  decode the common entities; collapse whitespace. A trafilatura-grade
  extractor is model/heuristic territory — this is the deterministic
  regex layer (the jusText/WET baseline) that turns markup into text at
  scan speed.
- ``encoding_profile`` / ``encoding_gates``: count the signatures of
  broken decoding — UTF-8-read-as-Latin-1/cp1252 mojibake sequences
  ("Ã©", "â€™", "Â "), U+FFFD replacement characters, raw control
  bytes — and an ASCII ratio. Double-decoded or binary-contaminated
  documents poison tokenizers; they are cheap to catch here.

Reference parity note: the reference engine has no corpus operators —
this is training-data-pipeline surface layered on the validation engine.

Patterns stay in the RE2 ∩ java.util.regex common subset (inline (?is)
flags, non-greedy quantifiers, explicit \\x escapes; NO \\s — Java's
\\s includes \\x0B, RE2's does not, so whitespace classes are spelled
out) — the DuckDB oracle evaluates the IDENTICAL pattern text.

Scale shape: pure Column expressions (regexp_replace / regexp_count run
JVM-side inside whole-stage codegen) — one projection over the corpus,
zero shuffles, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WS = "[ \\t\\n\\r\\f]"  # engine-identical whitespace class (no \\x0B)

# (pattern, replacement) applied in order: blocks first, then tags, then
# entities (&amp; LAST so "&amp;lt;" decodes to the text "&lt;", not "<"),
# then whitespace collapse.
HTML_STRIP_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (_WS + "+", " "),
)

# The high-frequency UTF-8-as-Latin-1/cp1252 double-decode signatures:
# Ã + Latin-1 letter (é è ä ö ü ñ á ó í ú ç), the â€ prefix every
# mis-decoded curly quote/dash/ellipsis starts with, and Â before
# NBSP-ish spacing. No alternative is a prefix of another, so the
# non-overlapping match count is engine-order-independent.
MOJIBAKE = r"(Ã©|Ã¨|Ã¤|Ã¶|Ã¼|Ã±|Ã¡|Ã³|Ã­|Ãº|Ã§|â€|Â )"
REPLACEMENT_CHAR = "�"
CONTROL_CHARS = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
NON_ASCII = r"[^\x00-\x7F]"


def extract_html_text(col: Column | str) -> Column:
    """Markup -> plain text (see HTML_STRIP_STEPS); trimmed."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def encoding_profile(col: Column | str) -> Column:
    """struct(mojibake_count, replacement_count, control_count,
    non_ascii_count, n_chars, ascii_ratio) — one codegen projection."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)
    non_ascii = F.regexp_count(c, F.lit(NON_ASCII)).cast("bigint")
    return F.struct(
        F.regexp_count(c, F.lit(MOJIBAKE)).cast("bigint").alias("mojibake_count"),
        F.regexp_count(c, F.lit(REPLACEMENT_CHAR)).cast("bigint").alias(
            "replacement_count"
        ),
        F.regexp_count(c, F.lit(CONTROL_CHARS)).cast("bigint").alias(
            "control_count"
        ),
        non_ascii.alias("non_ascii_count"),
        n.cast("bigint").alias("n_chars"),
        (
            (n - non_ascii).cast("double")
            / F.greatest(n, F.lit(1)).cast("double")
        ).alias("ascii_ratio"),
    )


def encoding_gates(
    prof: Column,
    max_mojibake: int = 0,
    max_replacement: int = 0,
    max_control: int = 0,
) -> Column:
    """struct(mojibake_ok, replacement_ok, control_ok, encoding_ok) over an
    ``encoding_profile`` struct — NULL-safe (NULL text fails loudly)."""
    ok = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    m = ok(prof["mojibake_count"] <= max_mojibake)
    r = ok(prof["replacement_count"] <= max_replacement)
    c = ok(prof["control_count"] <= max_control)
    return F.struct(
        m.alias("mojibake_ok"),
        r.alias("replacement_ok"),
        c.alias("control_ok"),
        (m & r & c).alias("encoding_ok"),
    )
