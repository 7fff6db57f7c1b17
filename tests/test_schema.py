"""Schema model tests: parse/serialize round-trip, boolean-schema collapse,
emptiness predicates, deep copy — semantics from /root/reference/schema.go
(schema_test.go:10-108) and copy.go (copy_test.go:11-128).
"""

import json
from decimal import Decimal

from jsonschema_spark.schema import FALSE, TRUE, Schema


def test_boolean_schema_parse():
    assert Schema.from_json("true").is_true()
    assert Schema.from_json("false").is_false()
    # false is {"not": {}} — schema.go:39-42
    f = Schema.from_json("false")
    assert f.not_ is not None and f.not_.is_true()


def test_boolean_schema_collapse_on_marshal():
    assert Schema.from_json("true").to_value() is True
    assert Schema.from_json("false").to_value() is False
    assert json.loads(TRUE().to_json()) is True
    assert json.loads(FALSE().to_json()) is False


def test_is_true_counts_metadata():
    # schema_test.go:10-24 — annotations make the schema non-empty.
    assert Schema().is_true()
    assert not Schema(default=True).is_true()
    assert not Schema(all_of=[Schema()]).is_true()
    assert not Schema(deprecated=False).is_true()


def test_type_set_scalar_normalizes_to_list():
    s = Schema.from_json('{"type": "string"}')
    assert s.type == ["string"]
    s = Schema.from_json('{"type": ["string", "null"]}')
    assert s.type == ["string", "null"]


def test_round_trip_preserves_keywords():
    doc = {
        "$id": "https://example.com/root.json",
        "type": "object",
        "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 10},
            "b": {"type": "string", "pattern": "^x", "minLength": 0},
        },
        "required": ["a"],
        "additionalProperties": False,
        "allOf": [True],
        "enum": [1, "two", None, [1, 2, 3]],
    }
    s = Schema.from_value(doc)
    out = s.to_value()
    assert out["$id"] == doc["$id"]
    assert out["type"] == "object" or out["type"] == ["object"]  # list form kept
    assert out["properties"]["a"] == {"type": ["integer"], "minimum": 0, "maximum": 10}
    assert out["properties"]["b"]["minLength"] == 0  # zero survives (pointer field)
    assert out["additionalProperties"] is False
    assert out["allOf"] == [True]
    assert out["enum"] == [1, "two", None, [1, 2, 3]]


def test_fractional_numbers_parse_as_decimal():
    s = Schema.from_json('{"multipleOf": 0.1, "minimum": 2}')
    assert s.multiple_of == Decimal("0.1")
    assert isinstance(s.minimum, int) and s.minimum == 2


def test_deep_copy_no_aliasing():
    # copy_test.go:55-117 — mutating the copy must not affect the source.
    src = Schema.from_value(
        {
            "items": {"type": "string"},
            "allOf": [{"minimum": 1}],
            "properties": {"x": {"const": "c"}},
            "enum": [[1, 2], {"k": "v"}],
            "required": ["x"],
        }
    )
    cp = src.copy()
    assert cp.to_value() == src.to_value()
    cp.items.type = ["integer"]
    cp.all_of[0].minimum = 99
    cp.properties["x"].const = "changed"
    cp.enum[0].append(3)
    cp.enum[1]["k"] = "changed"
    cp.required.append("y")
    assert src.items.type == ["string"]
    assert src.all_of[0].minimum == 1
    assert src.properties["x"].const == "c"
    assert src.enum == [[1, 2], {"k": "v"}]
    assert src.required == ["x"]


def test_unknown_keywords_ignored():
    s = Schema.from_json('{"type": "string", "x-vendor": 42}')
    assert s.type == ["string"]


def test_string_form_is_compact_json():
    s = Schema.from_value({"minItems": 1})
    assert str(s) == '{"minItems":1}'
