"""Compile-time regex-subset lint (plans/regexlint.py).

The engine evaluates `pattern` in java.util.regex (Spark rlike) while
the oracles evaluate RE2 (DuckDB) — VERDICT r2 item 7 asked for a lint
that rejects patterns outside the common subset instead of silently
diverging between engines.
"""

import pytest

from jsonschema_spark.plans.compile import CompileOptions, compile_schema
from jsonschema_spark.plans.regexlint import RegexSubsetError, lint_pattern
from jsonschema_spark.schema import Schema

ACCEPTED = [
    "^[a-z0-9_]+$",
    "foo|bar",
    "a{2,5}b*c+?d??",
    r"\d{4}-\d{2}-\d{2}",
    r"^\w+@\w+\.[a-z]{2,}$",
    "(?i)hello",
    "(?:non)capturing",
    r"[\^\]x-]",
    r"\p{L}+",
    "x}+y",  # literal '}' quantified — same meaning in both engines
]

REJECTED = [
    ("(?=ahead)x", "lookahead"),
    ("(?!no)x", "lookahead"),
    ("(?<=behind)x", "lookbehind"),
    ("(?<!not)x", "lookbehind"),
    (r"(a)\1", "backreference"),
    ("(?>atomic)", "atomic"),
    ("a*+", "possessive"),
    ("a++", "possessive"),
    ("a?+", "possessive"),
    ("a{2,3}+", "possessive"),
    ("[a-z&&[^aeiou]]", "intersection"),
    ("(?<name>x)", "named group"),
    ("(?P<name>x)", "named group"),
    (r"x\Z", "dialect-specific"),
    (r"\Gx", "dialect-specific"),
    ("(?x)spaced", "inline flag"),
    ("(?u)x", "inline flag"),
    ("[unterminated", "unterminated"),
]


def test_accepted_subset_patterns_pass():
    for p in ACCEPTED:
        lint_pattern(p)  # no raise
    lint_pattern(r"x\}+y")  # escaped spelling also passes


def test_rejected_constructs_raise_with_position():
    for p, _why in REJECTED:
        with pytest.raises(RegexSubsetError, match="outside the documented|does not compile|unterminated"):
            lint_pattern(p)


def test_compile_rejects_lookahead_pattern_loudly(spark):
    import pyspark.sql.types as T

    schema = Schema.from_value(
        {
            "type": "object",
            "properties": {
                "s": {"type": "string", "pattern": "(?=x)y"},
            },
        }
    )
    st = T.StructType([T.StructField("s", T.StringType())])
    with pytest.raises(RegexSubsetError, match="lookahead"):
        compile_schema(schema, st, CompileOptions())


def test_compile_rejects_backref_in_pattern_properties(spark):
    import pyspark.sql.types as T

    schema = Schema.from_value(
        {
            "type": "object",
            "patternProperties": {r"(a)\1": {"type": "string"}},
        }
    )
    st = T.StructType([T.StructField("aa", T.StringType())])
    with pytest.raises(RegexSubsetError, match="backreference"):
        compile_schema(schema, st, CompileOptions())


def test_compile_accepts_subset_pattern(spark):
    import pyspark.sql.types as T

    schema = Schema.from_value(
        {
            "type": "object",
            "properties": {
                "s": {"type": "string", "pattern": "^[a-z]{1,8}$"},
            },
        }
    )
    st = T.StructType([T.StructField("s", T.StringType())])
    compile_schema(schema, st, CompileOptions())  # no raise


def test_illegal_repetition_braces_rejected():
    """ADVICE r3: '{' bodies Java rejects at rlike time ('{,5}', '{}',
    unclosed '{', quantifier with nothing to repeat) must be caught at
    COMPILE time — Python/RE2 read them as literals, so the earlier
    Python-re sanity check alone let them through to a runtime job
    failure."""
    for bad in ["a{,5}", "a{}", "a{", "{2}", "a{x}"]:
        with pytest.raises(RegexSubsetError):
            lint_pattern(bad)
    # valid quantifiers and escaped literal braces stay in the subset
    for good in ["a{2}", "a{2,}", "a{2,5}", r"\{x\}", "[{}]",
                 r"\p{Lu}{2}", r"x\pL{1,3}"]:
        lint_pattern(good)


def test_non_strict_downgrades_to_warning():
    """CompileOptions.strict=False opts out of rejection: the lint warns
    (RegexSubsetWarning) instead of raising, so previously-compiling
    lookaround/possessive schemas keep compiling when the author accepts
    the dialect risk."""
    import warnings

    from jsonschema_spark.plans.regexlint import RegexSubsetWarning

    for pat in ["(?=x)y", "a{,5}", "a*+"]:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            lint_pattern(pat, strict=False)
        assert any(issubclass(x.category, RegexSubsetWarning) for x in w)
