"""CTC label encoding (operators/labels.py): transcript -> id arrays
with blank 0 reserved; instr IS the mapping."""

import pyspark.sql.types as T
import pytest

from jsonschema_spark.operators.labels import (
    DEFAULT_VOCAB,
    decode_labels,
    encode_labels,
)


def _frame(spark, rows):
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("transcript", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _encode_py(text, vocab=DEFAULT_VOCAB, oov="drop"):
    import re

    if text is None:
        return [], 0
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    raw = [vocab.find(c) + 1 for c in norm]
    oovs = sum(1 for v in raw if v == 0)
    ids = [v for v in raw if v > 0] if oov == "drop" else raw
    return ids, oovs


def test_encode_matches_python_replay(spark):
    rows = [
        ("c0", "Hello World"),
        ("c1", "  weird   SPACING\tand tabs "),
        ("c2", "numbers 123 and 'quotes'"),
        ("c3", "emoji éü✓ chars"),  # OOV chars
        ("c4", ""),
        ("c5", None),
    ]
    out = {
        r["clip_id"]: r
        for r in encode_labels(_frame(spark, rows)).collect()
    }
    for cid, txt in rows:
        ids, oovs = _encode_py(txt)
        r = out[cid]
        assert list(r["label_ids"]) == ids, cid
        assert r["label_len"] == len(ids), cid
        assert r["oov_count"] == oovs, cid
    # never NULL, even for NULL transcript
    assert out["c5"]["label_ids"] == [] and out["c5"]["oov_count"] == 0


def test_keep_policy_and_roundtrip(spark):
    rows = [("c0", "café au lait")]
    out = encode_labels(_frame(spark, rows), oov="keep").withColumn(
        "back", decode_labels("label_ids")
    ).collect()[0]
    ids, oovs = _encode_py(rows[0][1], oov="keep")
    assert list(out["label_ids"]) == ids
    assert out["oov_count"] == 1  # the e-acute
    # round trip drops exactly the OOV char
    assert out["back"] == "caf au lait"


def test_bad_args(spark):
    with pytest.raises(ValueError, match="oov policy"):
        encode_labels(_frame(spark, [("c", "x")]), oov="explode")
    with pytest.raises(ValueError, match="duplicate"):
        encode_labels(_frame(spark, [("c", "x")]), vocab="aba")


def test_learn_char_vocab(spark):
    from collections import Counter
    import re

    from jsonschema_spark.operators.labels import (
        char_counts,
        learn_char_vocab,
    )

    rows = [
        ("c0", "Hello  World"),
        ("c1", "hello there"),
        ("c2", "zzz!"),
        ("c3", None),
        ("c4", ""),
    ]
    df = _frame(spark, rows)
    cnt = Counter()
    for _, t in rows:
        if t:
            cnt.update(re.sub(r"\s+", " ", t.lower()).strip())
    got = {
        r["char"]: r["n_occurrences"]
        for r in char_counts(df).collect()
    }
    assert got == dict(cnt)
    v = learn_char_vocab(df)
    # most frequent first, codepoint tie-break, every observed char
    expect = "".join(
        c for c, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    )
    assert v == expect
    # min_occurrences drops singletons into OOV territory
    v2 = learn_char_vocab(df, min_occurrences=2)
    assert set(v2) == {c for c, n in cnt.items() if n >= 2}
    # the learned vocab round-trips through the encoder with zero OOV
    from jsonschema_spark.operators.labels import encode_labels

    enc = encode_labels(df, vocab=v).agg(
        __import__("pyspark.sql.functions", fromlist=["sum"]).sum(
            "oov_count"
        )
    ).collect()[0][0]
    assert enc == 0
