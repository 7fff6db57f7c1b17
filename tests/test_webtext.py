# -*- coding: utf-8 -*-
"""Raw-crawl text hygiene (operators/webtext).

Pins: the HTML strip chain on hand-built markup (script-with-raw-'<',
style, comments, entity decode order incl. double-encoded &amp;amp;,
whitespace collapse), encoding-profile counts on planted defects,
NULL handling, and the zero-Python plan shape.
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.webtext import (
    encoding_gates,
    encoding_profile,
    extract_html_text,
)


def _extract_one(spark, html: str) -> str:
    return (
        spark.range(1)
        .select(extract_html_text(F.lit(html)).alias("x"))
        .collect()[0]["x"]
    )


def test_html_strip_basic(spark):
    html = (
        "<html><head><title>T</title><style>p { color: red }</style>"
        "<script>if (1 < 2 && x > 0) { y = \"</p>\"; }</script></head>"
        "<body>\n<h1>Head</h1>\n<p>one   two</p><!-- gone --></body></html>"
    )
    assert _extract_one(spark, html) == "T Head one two"


def test_html_entity_decode_order(spark):
    # &amp;amp; must decode to the TEXT "&amp;", never recurse to "&"
    html = "<p>it&#39;s &quot;q&quot; &lt;b&gt; a&nbsp;b &amp;amp; c</p>"
    assert _extract_one(spark, html) == "it's \"q\" <b> a b &amp; c"


def test_html_multiline_blocks(spark):
    html = "a<script>\nvar s = '<div>';\n</script>b<!--\nmulti\n-->c"
    assert _extract_one(spark, html) == "a b c"


def test_encoding_profile_counts(spark):
    rows = (
        spark.createDataFrame(
            [
                ("clean ascii text",),
                ("caf\u00c3\u00a9 and \u00e2\u20ac\u2122quoted",),  # \u00c3\u00a9 + \u00e2\u20ac prefix
                ("bad � byte",),
                ("ctl \x07 here",),
                (None,),
            ],
            "t string",
        )
        .select(encoding_profile("t").alias("p"))
        .select(
            F.col("p")["mojibake_count"].alias("m"),
            F.col("p")["replacement_count"].alias("r"),
            F.col("p")["control_count"].alias("c"),
            F.col("p")["ascii_ratio"].alias("a"),
        )
        .collect()
    )
    assert (rows[0]["m"], rows[0]["r"], rows[0]["c"]) == (0, 0, 0)
    assert rows[0]["a"] == 1.0
    assert rows[1]["m"] == 2  # Ã© and the â€ prefix
    assert rows[2]["r"] == 1
    assert rows[3]["c"] == 1
    assert rows[4]["m"] is None  # NULL text -> NULL profile fields


def test_encoding_gates_null_fails_loudly(spark):
    out = (
        spark.createDataFrame([("ok",), (None,)], "t string")
        .select(encoding_gates(encoding_profile("t")).alias("g"))
        .select(F.col("g")["encoding_ok"].alias("ok"))
        .collect()
    )
    assert out[0]["ok"] is True
    assert out[1]["ok"] is False


def test_webtext_plan_is_pure_codegen(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "t string").select(
        extract_html_text("t").alias("x"),
        encoding_profile("t").alias("p"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_extract_differential_fuzz(spark):
    """Spark's regex chain vs a pure-Python re replay on random markup —
    the patterns live in the RE2∩java.regex∩python-re subset, so all
    three engines must agree character-for-character."""
    import random
    import re

    from jsonschema_spark.operators.webtext import HTML_STRIP_STEPS

    rng = random.Random(99)
    pieces = [
        "plain words ", "<b>bold</b>", "<script>junk < 1 && 2</script>",
        "<style>a{b:c}</style>", "<!-- note -->", "&amp;amp;", "&lt;x&gt;",
        "&quot;q&quot;", "&#39;", "&nbsp;", "\n\t ", "a<br/>b",
        "<p class='x'>para</p>", "tail",
    ]
    docs = [
        "".join(rng.choice(pieces) for _ in range(rng.randrange(1, 12)))
        for _ in range(60)
    ]

    def py_extract(s: str) -> str:
        for pat, rep in HTML_STRIP_STEPS:
            s = re.sub(pat, rep, s)
        return s.strip()

    from jsonschema_spark.operators.webtext import extract_html_text

    df = spark.createDataFrame([(d,) for d in docs], "t string")
    got = [r["x"] for r in df.select(extract_html_text("t").alias("x")).collect()]
    assert got == [py_extract(d) for d in docs]


def test_encoding_profile_differential_fuzz(spark):
    import random
    import re

    from jsonschema_spark.operators.webtext import (
        CONTROL_CHARS,
        MOJIBAKE,
        NON_ASCII,
        REPLACEMENT_CHAR,
    )

    rng = random.Random(7)
    atoms = ["word ", "cafÃ©", "â€", "Â ", "�",
             "\x07", "\x1f", "ok", "é"]
    docs = ["".join(rng.choice(atoms) for _ in range(rng.randrange(0, 15)))
            for _ in range(60)]
    df = spark.createDataFrame([(d,) for d in docs], "t string")
    got = (
        df.select(encoding_profile("t").alias("p"))
        .select("p.mojibake_count", "p.replacement_count",
                "p.control_count", "p.non_ascii_count")
        .collect()
    )
    for d, r in zip(docs, got):
        assert r["mojibake_count"] == len(re.findall(MOJIBAKE, d))
        assert r["replacement_count"] == len(re.findall(REPLACEMENT_CHAR, d))
        assert r["control_count"] == len(re.findall(CONTROL_CHARS, d))
        assert r["non_ascii_count"] == len(re.findall(NON_ASCII, d))
