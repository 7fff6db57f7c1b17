"""Golden tables ported from /root/reference/jsonptr/ptr_test.go and
/root/reference/ptr_test.go — error strings must match verbatim.
"""

import pytest

from jsonschema_spark import jsonptr
from jsonschema_spark.pointer import validate_reference_pointer


# (pointer, expected error string or None) — jsonptr/ptr_test.go:9-43
POINTER_CASES = [
    ("#", "invalid JSON pointer: #"),
    ("#/", "invalid JSON pointer: #/"),
    ("/#", None),
    ("//foo", None),
    ("/foo///bar", None),
    ("/~0", None),
    ("/foo/~1", None),
    ("/~/", 'invalid segment "~": invalid escape sequence: ~'),
    ("/~2abc/", 'invalid segment "~2abc": invalid escape sequence: ~2'),
    ("/foo/b#ar/ä", None),
    ("/+1", None),
    ("/foo/🙂/baz", None),
    ("/foo/0//", None),
    ("/foo/0//bar/1/baz/2//", None),
    ("/-1", None),
    # RFC 6901 examples
    ("", None),
    ("/foo", None),
    ("/foo/0", None),
    ("/", None),
    ("/a~1b", None),
    ("/c%d", None),
    ("/e^f", None),
    ("/g|h", None),
    ("/i\\j", None),
    ('/k"l', None),
    ("/ ", None),
    ("/m~0n", None),
]


@pytest.mark.parametrize("ptr,err", POINTER_CASES)
def test_validate_json_pointer(ptr, err):
    if err is None:
        jsonptr.validate_json_pointer(ptr, None)
    else:
        with pytest.raises(jsonptr.JSONPointerError) as exc:
            jsonptr.validate_json_pointer(ptr, None)
        assert str(exc.value) == err


def test_fn_called_once_per_segment():
    counts = {}

    def fn(i, segments):
        counts[segments[i]] = counts.get(segments[i], 0) + 1

    jsonptr.validate_json_pointer("/foo/bar//baz", fn)
    assert counts == {"foo": 1, "bar": 1, "": 1, "baz": 1}


def test_escape_error_unwrap():
    with pytest.raises(jsonptr.SegmentError) as exc:
        jsonptr.validate_json_pointer("/~2", None)
    assert str(exc.value.unwrap()) == "invalid escape sequence: ~2"


# jsonptr/ptr_test.go:78-95 (plus the implicit empty-segment behavior that
# makes "#/anyOf/" valid in ptr_test.go).
ARRAY_INDEX_CASES = [
    ("1", True),
    ("-1", False),
    ("+1", False),
    ("12", True),
    ("102", True),
    ("02", False),
    ("0", True),
    ("三", False),
    ("", True),
]


@pytest.mark.parametrize("seg,ok", ARRAY_INDEX_CASES)
def test_is_array_index(seg, ok):
    assert jsonptr.is_array_index(seg) is ok


# ptr_test.go:8-110 — schema reference pointers.
REF_CASES = {
    "empty string": ("", None),
    "rel self": ("/", None),
    "root": ("#/", None),
    "anyOf with index": ("#/anyOf/0", None),
    "anyOf without index but /": ("#/anyOf/", None),
    "not": ("/not", None),
    "if then": ("/if/then", None),
    "unevaluated properties": ("/unevaluatedProperties", None),
    "if unevaluated items": ("/if/unevaluatedItems", None),
    "one of content schema": ("/oneOf/1/contentSchema", None),
    "anchor": ("#anchor", None),
    "anchor #2": ("#+anchor", "invalid JSON pointer: +anchor"),
    "anchor #3": ("#anch~or", "invalid JSON pointer: anch~or"),
    "if then with slash": ("/if/then/", 'invalid segment "": unknown keyword'),
    "properties map key": ("#/properties/foo", None),
    "properties digit map key": ("#/properties/123", None),
    "escaped properties map key": ("/properties/fo~1o", None),
    "umlauts": ("#/$defs/äöü", None),
    "trailing slashes": ("/if/properties//items", None),
    "trailing slashes 2x": ("/if/properties///", 'invalid segment "": unknown keyword'),
    "illegal map key": ("#/foo", 'invalid segment "foo": unknown keyword'),
    "anyOf without index": ("#/anyOf", 'invalid segment "anyOf": does not point to schema'),
    "anyOf zero padded index": ("#/anyOf/01", 'invalid segment "01": invalid array index: "01"'),
    "anyOf with non digit index": (
        "#/anyOf/one",
        'invalid segment "one": invalid array index: "one"',
    ),
    "illegal index": ("/then/1", 'invalid segment "1": unknown keyword'),
    "illegal map key #2": ("/else/foo", 'invalid segment "foo": unknown keyword'),
    "oneOf invalid signed index": (
        "#/oneOf/+123",
        'invalid segment "+123": invalid array index: "+123"',
    ),
    "oneOf invalid signed index #2": (
        "#/oneOf/-123",
        'invalid segment "-123": invalid array index: "-123"',
    ),
    "invalid escape": (
        "/properties/fo~ao",
        'invalid segment "fo~ao": invalid escape sequence: ~a',
    ),
    "missing map/object key": (
        "/properties/foo/properties",
        'invalid segment "properties": does not point to schema',
    ),
    "illegal escape char": ("#/properties/~", 'invalid segment "~": invalid escape sequence: ~'),
    "invalid JSON pointer": ("properties/foo", "invalid JSON pointer: properties/foo"),
}


@pytest.mark.parametrize("name", sorted(REF_CASES))
def test_validate_reference_pointer(name):
    ref, err = REF_CASES[name]
    if err is None:
        validate_reference_pointer(ref)
    else:
        with pytest.raises(ValueError) as exc:
            validate_reference_pointer(ref)
        assert str(exc.value) == err
