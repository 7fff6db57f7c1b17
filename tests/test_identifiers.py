"""Identifier computation goldens ported from
/root/reference/identifiers_test.go:12-105 (schema-id-examples fixture).
"""

import os

from jsonschema_spark.identifiers import Identifiers, compute_identifiers, is_embedded
from jsonschema_spark.loader import new_embedded_loader
from jsonschema_spark.uris import URI

from .conftest import require_testdata


def load_root():
    d = require_testdata()
    loader = new_embedded_loader(d)
    res = loader.load(
        URI.parse("file:///testdata/miscellaneous-examples/schema-id-examples.schema.json")
    )
    return res.schema


GOLDEN = {
    "/$defs/A": Identifiers(
        base_uri="https://example.com/root.json",
        canon_resource_plain_uri="https://example.com/root.json#foo",
        canon_resource_pointer_uri="https://example.com/root.json#/$defs/A",
    ),
    "/$defs/B": Identifiers(
        base_uri="https://example.com/other.json",
        canon_resource_pointer_uri="https://example.com/other.json#",
        enclosing_resource_uris=["https://example.com/root.json#/$defs/B"],
    ),
    "/$defs/C": Identifiers(
        base_uri="urn:uuid:ee564b8a-7a87-4125-8c96-e9f123d6766f",
        canon_resource_pointer_uri="urn:uuid:ee564b8a-7a87-4125-8c96-e9f123d6766f#",
        enclosing_resource_uris=["https://example.com/root.json#/$defs/C"],
    ),
    "/$defs/B/$defs/X": Identifiers(
        base_uri="https://example.com/other.json",
        canon_resource_plain_uri="https://example.com/other.json#bar",
        canon_resource_pointer_uri="https://example.com/other.json#/$defs/X",
        enclosing_resource_uris=["https://example.com/root.json#/$defs/B/$defs/X"],
    ),
    "/$defs/B/$defs/Y": Identifiers(
        base_uri="https://example.com/t/inner.json",
        canon_resource_plain_uri="https://example.com/t/inner.json#bar",
        canon_resource_pointer_uri="https://example.com/t/inner.json#",
        enclosing_resource_uris=[
            "https://example.com/other.json#/$defs/Y",
            "https://example.com/root.json#/$defs/B/$defs/Y",
        ],
    ),
    "/$defs/B/$defs/Z": Identifiers(
        base_uri="https://example.com/z.json",
        canon_resource_pointer_uri="https://example.com/z.json#",
        enclosing_resource_uris=[
            "https://example.com/other.json#/$defs/Z",
            "https://example.com/root.json#/$defs/B/$defs/Z",
        ],
    ),
    "/$defs/B/$defs/Z/allOf/0": Identifiers(
        base_uri="https://example.com/z.json",
        canon_resource_plain_uri="https://example.com/z.json#foo",
        canon_resource_pointer_uri="https://example.com/z.json#/allOf/0",
        enclosing_resource_uris=[
            "https://example.com/other.json#/$defs/Z/allOf/0",
            "https://example.com/root.json#/$defs/B/$defs/Z/allOf/0",
        ],
    ),
    "/$defs/B/$defs/Z/allOf/0/$defs/_": Identifiers(
        base_uri="https://example.com/z.json",
        canon_resource_plain_uri="https://example.com/z.json#bar",
        canon_resource_pointer_uri="https://example.com/z.json#/allOf/0/$defs/_",
        enclosing_resource_uris=[
            "https://example.com/root.json#/$defs/B/$defs/Z/allOf/0/$defs/_",
            "https://example.com/other.json#/$defs/Z/allOf/0/$defs/_",
        ],
    ),
}


def test_compute_identifiers_golden():
    m = compute_identifiers(load_root())
    assert len(m) == len(GOLDEN), (sorted(m), sorted(GOLDEN))
    for ptr, want in GOLDEN.items():
        assert ptr in m, ptr
        have = m[ptr]
        assert have.base_uri == want.base_uri, ptr
        assert have.canon_resource_plain_uri == want.canon_resource_plain_uri, ptr
        assert have.canon_resource_pointer_uri == want.canon_resource_pointer_uri, ptr
        assert sorted(have.enclosing_resource_uris) == sorted(want.enclosing_resource_uris), ptr


def test_is_embedded():
    m = compute_identifiers(load_root())
    assert is_embedded("https://example.com/other.json", m)
    assert is_embedded("https://example.com/other.json#bar", m)
    assert is_embedded("https://example.com/z.json", m)
    assert not is_embedded("https://example.com/unknown.json", m)
