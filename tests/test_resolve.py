"""$ref resolution goldens ported from /root/reference/resolve_test.go —
both the resolved subschemas and the exact error strings.
"""

import pytest

from jsonschema_spark.loader import new_embedded_loader
from jsonschema_spark.resolve import ResolveConfig, ResolveError, resolve_reference
from jsonschema_spark.schema import Schema

from .conftest import require_testdata

ROOT_DOC = """{
    "$id": "https://example.net/root.json",
    "items": {
        "type": "array",
        "items": {
            "$ref": "#item",
            "additionalProperties": {
                "type": "string"
            }
        }
    },
    "$defs": {
        "single": {
            "$anchor": "item",
            "type": "object",
            "additionalProperties": { "$ref": "other.json" }
        },
        "feinted-ref": {
            "$ref": "/items/items"
        },
        "absolute-refs": {
            "$id": "abs.json",
            "oneOf": [
                { "$ref": "file:///testdata/miscellaneous-examples/arrays.schema.json" },
                { "$ref": "file:///testdata/miscellaneous-examples/arrays.schema.json#/properties/vegetables" }
            ]
        },
        "special-cases": {
            "$defs": {
                "fo~o": true,
                "ba/r": true
            }
        },
        "vocabs": {
            "$defs": {
                "unevaluatedItems": true,
                "unevaluatedProperties": true,
                "contentSchema": {
                    "$ref": "#/$defs/special-cases"
                }
            }
        }
    }
}"""


@pytest.fixture(scope="module")
def root():
    return Schema.from_json(ROOT_DOC)


@pytest.fixture(scope="module")
def fs_loader():
    return new_embedded_loader(require_testdata())


def test_empty_string_returns_root(root):
    assert resolve_reference(ResolveConfig(), "", root) is root


def test_self(root):
    assert resolve_reference(ResolveConfig(), "#", root) is root


def test_self_with_forward_slash(root):
    assert resolve_reference(ResolveConfig(), "#/", root) is root


def test_known_definition(root):
    got = resolve_reference(ResolveConfig(), "#/$defs/single", root)
    assert got.anchor == "item"
    assert got.type == ["object"]
    assert got.additional_properties.ref == "other.json"


def test_external_ref_without_loader(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/single/additionalProperties", root)
    assert str(exc.value) == (
        'failed to resolve {"$ref": "other.json"} at '
        '"https://example.net/root.json#/$defs/single/additionalProperties": '
        'unable to locate non-embedded resource '
        '{"$id": "https://example.net/other.json"}: no loader configured'
    )


def test_non_nil_subschema(root):
    got = resolve_reference(ResolveConfig(), "#/items", root)
    assert got.type == ["array"]
    assert got.items.ref == "#item"
    assert got.items.additional_properties.type == ["string"]


def test_forward_slash_equals_empty_string(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/items/", root)
    assert str(exc.value) == 'unknown keyword "" at "https://example.net/root.json#/items"'


def test_nil_subschema(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/propertyNames", root)
    assert str(exc.value) == 'missing schema at "https://example.net/root.json#/propertyNames"'


def test_nested_non_nil_subschema(root):
    got = resolve_reference(ResolveConfig(), "#/items/items/additionalProperties", root)
    assert got == Schema(type=["string"])


def test_unknown_keyword_mid_pointer(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/items/unknown/additionalProperties", root)
    assert str(exc.value) == 'unknown keyword "unknown" at "https://example.net/root.json#/items"'


def test_unknown_definition(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/unknown/additionalProperties", root)
    assert str(exc.value) == 'unknown key "unknown" at "https://example.net/root.json#/$defs"'


def test_feinted_reference_pointer(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/feinted-ref", root)
    assert str(exc.value) == (
        'failed to resolve {"$ref": "/items/items"} at '
        '"https://example.net/root.json#/$defs/feinted-ref": '
        'unable to locate non-embedded resource '
        '{"$id": "https://example.net/items/items"}: no loader configured'
    )


def test_missing_def_name(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs", root)
    assert str(exc.value) == 'missing key at "https://example.net/root.json#/$defs"'


def test_absolute_uri(root):
    got = resolve_reference(ResolveConfig(), "https://example.net/root.json#/$defs/single", root)
    assert got.anchor == "item"
    assert got.type == ["object"]


def test_absolute_uri_with_anchor(root):
    got = resolve_reference(ResolveConfig(), "https://example.net/root.json#item", root)
    assert got.anchor == "item"
    assert got.type == ["object"]


def test_absolute_uri_with_unknown_anchor(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "https://example.net/abs.json#item", root)
    assert str(exc.value) == (
        'unable to locate embedded resource: unknown anchor "item" at "https://example.net/abs.json"'
    )


def test_existing_subschema_in_array(root, fs_loader):
    got = resolve_reference(
        ResolveConfig(loader=fs_loader), "#/$defs/absolute-refs/oneOf/0", root
    )
    assert got.id == "file:///testdata/miscellaneous-examples/arrays.schema.json"
    assert got.type == ["object"]
    assert got.properties["fruits"].items.type == ["string"]
    assert got.properties["vegetables"].items.ref == "#/$defs/veggie"
    assert got.defs["veggie"].required == ["veggieName", "veggieLike"]


def test_existing_subschema_in_array_different_index(root, fs_loader):
    got = resolve_reference(
        ResolveConfig(loader=fs_loader), "#/$defs/absolute-refs/oneOf/1", root
    )
    assert got == Schema(type=["array"], items=Schema(ref="#/$defs/veggie"))


def test_array_index_out_of_bounds(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/absolute-refs/oneOf/2", root)
    assert str(exc.value) == (
        'index out of bounds (2/1) at "https://example.net/abs.json#/$defs/absolute-refs/oneOf"'
    )


def test_invalid_array_index(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/absolute-refs/oneOf/two", root)
    assert str(exc.value) == (
        'invalid array index "two" at "https://example.net/abs.json#/$defs/absolute-refs/oneOf": '
        'strconv.Atoi: parsing "two": invalid syntax'
    )


def test_missing_array_index(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/absolute-refs/oneOf", root)
    assert str(exc.value) == (
        'missing array index at "https://example.net/abs.json#/$defs/absolute-refs/oneOf"'
    )


def test_unknown_keyword_after_id_rebase(root):
    with pytest.raises(ResolveError) as exc:
        resolve_reference(ResolveConfig(), "#/$defs/absolute-refs/test", root)
    assert str(exc.value) == (
        'unknown keyword "test" at "https://example.net/abs.json#/$defs/absolute-refs"'
    )


def test_escaping_tilde(root):
    got = resolve_reference(ResolveConfig(), "#/$defs/special-cases/$defs/fo~0o", root)
    assert got == Schema()


def test_escaping_slash(root):
    got = resolve_reference(ResolveConfig(), "#/$defs/special-cases/$defs/ba~1r", root)
    assert got == Schema()


def test_defs_named_like_unevaluated_keywords(root):
    got = resolve_reference(ResolveConfig(), "#/$defs/vocabs/$defs/unevaluatedItems", root)
    assert got == Schema()
    got = resolve_reference(ResolveConfig(), "#/$defs/vocabs/$defs/unevaluatedProperties", root)
    assert got == Schema()


def test_content_schema_def_chases_ref(root):
    got = resolve_reference(ResolveConfig(), "#/$defs/vocabs/$defs/contentSchema", root)
    assert got.defs == {"fo~o": Schema(), "ba/r": Schema()}


# ---- TestResolveReference_Embedded (resolve_test.go:310-416) ----

IDS_DOC = """{
  "$id": "https://example.com/schema.json",
  "$defs": {
    "A": {
      "$anchor": "foo"
    },
    "B": {
      "$id": "other.json",
      "$defs": {
        "X": {
          "$anchor": "bar",
          "not": {
            "$ref": "#/$defs/Y/oneOf/2"
          }
        },
        "Y": {
          "oneOf": [
            {"$ref": "#/$defs/X"},
            {"$ref": "file:///testdata/miscellaneous-examples/arrays.schema.json#/properties/vegetables"},
            {"$ref": "https://domain.tld/schema.json#/not"},
            {"$ref": "/schema.json#/$defs/C"}
          ]
        }
      }
    },
    "C": {
      "type": "string"
    },
    "D": {
      "$id": "https://domain.tld/schema.json",
      "not": {
        "$ref": "https://example.com/other.json#bar"
      }
    }
  }
}"""


@pytest.fixture(scope="module")
def ids_root():
    return Schema.from_json(IDS_DOC)


def x_schema():
    return Schema(anchor="bar", not_=Schema(ref="#/$defs/Y/oneOf/2"))


def test_embedded_anchor(ids_root, fs_loader):
    got = resolve_reference(ResolveConfig(loader=fs_loader), "#foo", ids_root)
    assert got == Schema(anchor="foo")


def test_embedded_relative_anchor(ids_root, fs_loader):
    got = resolve_reference(ResolveConfig(loader=fs_loader), "other.json#bar", ids_root)
    assert got == x_schema()


def test_embedded_resource_by_base_uri(ids_root, fs_loader):
    got = resolve_reference(ResolveConfig(loader=fs_loader), "other.json", ids_root)
    assert got.id == "other.json"
    assert set(got.defs) == {"X", "Y"}
    assert got.defs["X"] == x_schema()
    assert [s.ref for s in got.defs["Y"].one_of] == [
        "#/$defs/X",
        "file:///testdata/miscellaneous-examples/arrays.schema.json#/properties/vegetables",
        "https://domain.tld/schema.json#/not",
        "/schema.json#/$defs/C",
    ]


def test_pointer_into_rebased_resource(ids_root, fs_loader):
    got = resolve_reference(ResolveConfig(loader=fs_loader), "#/$defs/B/$defs/X/not", ids_root)
    assert got == x_schema()


def test_pointer_chases_file_ref(ids_root, fs_loader):
    got = resolve_reference(
        ResolveConfig(loader=fs_loader), "#/$defs/B/$defs/Y/oneOf/1", ids_root
    )
    assert got == Schema(type=["array"], items=Schema(ref="#/$defs/veggie"))


def test_embedded_absolute_id(ids_root, fs_loader):
    got = resolve_reference(
        ResolveConfig(loader=fs_loader), "https://domain.tld/schema.json", ids_root
    )
    assert got.id == "https://domain.tld/schema.json"
    assert got.not_.ref == "https://example.com/other.json#bar"
