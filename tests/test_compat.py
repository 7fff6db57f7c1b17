"""Schema-compatibility checker (plans/compat.py): direction classification
and registry-mode verdicts. Driver-side only — no Spark fixture needed."""

from jsonschema_spark.plans.compat import (
    INCOMPARABLE,
    LOOSENED,
    METADATA,
    TIGHTENED,
    compat_changes,
    is_compatible,
)


def dirs(old, new):
    return {(c.pointer, c.keyword): c.direction for c in compat_changes(old, new)}


def test_identical_schemas_no_changes():
    s = {"type": "object", "properties": {"a": {"type": "string"}}}
    assert compat_changes(s, s) == []


def test_ref_refactor_compares_equal():
    inline = {"type": "object", "properties": {"a": {"type": "string", "minLength": 1}}}
    refd = {
        "type": "object",
        "properties": {"a": {"$ref": "#/$defs/name"}},
        "$defs": {"name": {"type": "string", "minLength": 1}},
    }
    assert compat_changes(inline, refd) == []


def test_required_added_is_tightened_removed_is_loosened():
    old = {"type": "object", "required": ["a"]}
    new = {"type": "object", "required": ["a", "b"]}
    assert dirs(old, new) == {("", "required"): TIGHTENED}
    assert dirs(new, old) == {("", "required"): LOOSENED}


def test_type_widening_narrowing_and_integer_number():
    assert dirs({"type": "integer"}, {"type": ["integer", "string"]}) == {
        ("", "type"): LOOSENED
    }
    # integer -> number widens (every integer is a number)
    assert dirs({"type": "integer"}, {"type": "number"}) == {("", "type"): LOOSENED}
    assert dirs({"type": "number"}, {"type": "integer"}) == {("", "type"): TIGHTENED}
    assert dirs({"type": "string"}, {"type": "boolean"}) == {("", "type"): INCOMPARABLE}


def test_numeric_bounds():
    assert dirs({"minimum": 1}, {"minimum": 2}) == {("", "minimum"): TIGHTENED}
    assert dirs({"minimum": 1}, {"exclusiveMinimum": 1}) == {("", "minimum"): TIGHTENED}
    assert dirs({"maximum": 10}, {"maximum": 20}) == {("", "maximum"): LOOSENED}
    assert dirs({}, {"maximum": 10}) == {("", "maximum"): TIGHTENED}
    assert dirs({"maximum": 10}, {}) == {("", "maximum"): LOOSENED}


def test_multiple_of_divisibility():
    assert dirs({"multipleOf": 4}, {"multipleOf": 2}) == {("", "multipleOf"): LOOSENED}
    assert dirs({"multipleOf": 2}, {"multipleOf": 4}) == {("", "multipleOf"): TIGHTENED}
    assert dirs({"multipleOf": 2}, {"multipleOf": 3}) == {("", "multipleOf"): INCOMPARABLE}
    assert dirs({"multipleOf": 0.5}, {"multipleOf": 0.25}) == {("", "multipleOf"): LOOSENED}


def test_enum_and_const():
    assert dirs({"enum": ["a", "b"]}, {"enum": ["a", "b", "c"]}) == {
        ("", "enum"): LOOSENED
    }
    assert dirs({"enum": ["a", "b"]}, {"enum": ["a"]}) == {("", "enum"): TIGHTENED}
    assert dirs({"enum": ["a"]}, {"enum": ["b"]}) == {("", "enum"): INCOMPARABLE}
    assert dirs({"const": "a"}, {"enum": ["a", "b"]}) == {("", "enum"): LOOSENED}


def test_pattern_changes_incomparable():
    assert dirs({}, {"pattern": "^x"}) == {("", "pattern"): TIGHTENED}
    assert dirs({"pattern": "^x"}, {"pattern": "^y"}) == {("", "pattern"): INCOMPARABLE}


def test_property_added_against_additional_properties():
    old = {"type": "object"}
    new = {"type": "object", "properties": {"a": {"type": "string"}}}
    # old additionalProperties defaults true: constraining a new name tightens
    assert dirs(old, new) == {("/properties/a", "type"): TIGHTENED}
    # removing that constraint loosens
    assert dirs(new, old) == {("/properties/a", "type"): LOOSENED}


def test_property_removed_under_closed_world():
    old = {
        "type": "object",
        "properties": {"a": {"type": "string"}},
    }
    new = {
        "type": "object",
        "properties": {},
        "additionalProperties": False,
    }
    d = dirs(old, new)
    # the removed property now falls under additionalProperties: false
    assert d[("/properties/a", "$schema(false)")] == TIGHTENED


def test_contains_true_is_not_vacuous():
    assert dirs({}, {"contains": True}) == {("/contains", "contains"): TIGHTENED}


def test_nested_recursion_pointer():
    old = {"properties": {"a": {"items": {"minimum": 1}}}}
    new = {"properties": {"a": {"items": {"minimum": 5}}}}
    assert dirs(old, new) == {("/properties/a/items", "minimum"): TIGHTENED}


def test_logic_applicators():
    assert dirs({"allOf": [{"minimum": 1}]}, {"allOf": [{"minimum": 1}, {"maximum": 9}]}) == {
        ("/allOf", "allOf"): TIGHTENED
    }
    assert dirs({"anyOf": [{"minimum": 1}]}, {"anyOf": [{"minimum": 1}, {"maximum": 9}]}) == {
        ("/anyOf", "anyOf"): LOOSENED
    }
    assert dirs({"oneOf": [{"minimum": 1}]}, {"oneOf": [{"maximum": 9}]}) == {
        ("/oneOf", "oneOf"): INCOMPARABLE
    }
    assert dirs({"not": {"minimum": 1}}, {"not": {"minimum": 2}}) == {
        ("/not", "not"): INCOMPARABLE
    }


def test_metadata_never_breaks():
    old = {"type": "string", "title": "Old"}
    new = {"type": "string", "title": "New", "description": "d"}
    changes = compat_changes(old, new)
    assert all(c.direction == METADATA for c in changes)
    for mode in ("backward", "forward", "full"):
        ok, breaking = is_compatible(old, new, mode)
        assert ok and breaking == []


def test_mode_verdicts():
    old = {"type": "object", "required": ["a"]}
    loosening = {"type": "object"}
    tightening = {"type": "object", "required": ["a", "b"]}

    ok, _ = is_compatible(old, loosening, "backward")
    assert ok
    ok, br = is_compatible(old, tightening, "backward")
    assert not ok and br[0].keyword == "required"

    ok, _ = is_compatible(old, tightening, "forward")
    assert ok
    ok, _ = is_compatible(old, loosening, "forward")
    assert not ok

    ok, _ = is_compatible(old, old, "full")
    assert ok
    ok, _ = is_compatible(old, loosening, "full")
    assert not ok


def test_incomparable_breaks_every_mode():
    old = {"pattern": "^a"}
    new = {"pattern": "^b"}
    for mode in ("backward", "forward", "full"):
        ok, br = is_compatible(old, new, mode)
        assert not ok and br[0].direction == INCOMPARABLE


def test_boolean_schema_collapse():
    assert dirs(True, {"type": "string"}) == {("", "type"): TIGHTENED}
    d = dirs({"type": "string"}, False)
    assert d == {("", "$schema(false)"): TIGHTENED}


def test_dependent_required():
    old = {"dependentRequired": {"a": ["b"]}}
    new = {"dependentRequired": {"a": ["b", "c"]}}
    assert dirs(old, new) == {("/dependentRequired/a", "dependentRequired"): TIGHTENED}


def test_change_message_readable():
    c = compat_changes({"minimum": 1}, {"minimum": 2})[0]
    assert "minimum" in c.message and "tightened" in c.message
