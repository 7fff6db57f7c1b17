"""Walk semantics ported from /root/reference/walk_test.go:16-298."""

import json
import os

import pytest

from jsonschema_spark.resolve import ResolveConfig, resolve_reference
from jsonschema_spark.schema import FALSE, Schema
from jsonschema_spark.walk import Skip, SkipAll, Walk

from .conftest import require_testdata


def load_fixture(rel):
    d = require_testdata()
    with open(os.path.join(d, "testdata", rel)) as f:
        return Schema.from_json(f.read())


def test_skipall_at_root_visits_once():
    schema = load_fixture("miscellaneous-examples/conditional-validation-if-else.schema.json")
    visits = []

    def fn(scope, s):
        visits.append(scope.pointer)
        return SkipAll

    Walk(schema, fn)
    assert len(visits) == 1


def test_skip_prunes_subtrees():
    schema = load_fixture("miscellaneous-examples/conditional-validation-if-else.schema.json")
    seen = []

    def fn(scope, s):
        if scope.pointer != "/":
            seen.append(scope.pointer)
            return Skip
        return None

    Walk(schema, fn)
    assert sorted(seen) == sorted(
        ["/if", "/then", "/else", "/properties/isMember", "/properties/membershipNumber"]
    )


def test_full_visit_set():
    schema = load_fixture("miscellaneous-examples/conditional-validation-if-else.schema.json")
    seen = []
    Walk(schema, lambda scope, s: seen.append(scope.pointer) if scope.pointer != "/" else None)
    assert sorted(seen) == sorted(
        [
            "/properties/isMember",
            "/properties/membershipNumber",
            "/if",
            "/if/properties/isMember",
            "/then",
            "/then/properties/membershipNumber",
            "/else",
            "/else/properties/membershipNumber",
        ]
    )


def test_nested_pointer_path():
    seen = {}
    Walk(
        Schema(all_of=[Schema(properties={"foo": Schema()})]),
        lambda scope, s: seen.update({scope.pointer: True}),
    )
    assert "/allOf/0/properties/foo" in seen


def test_error_propagates_from_root():
    with pytest.raises(RuntimeError, match="unexpected error"):
        Walk(FALSE(), lambda scope, s: (_ for _ in ()).throw(RuntimeError("unexpected error")))


def test_error_propagates_from_children():
    ptr_test = Schema(
        all_of=[Schema()],
        defs={"foo": Schema(), "bar": Schema()},
        items=Schema(),
    )
    for cause in ["/items", "/allOf/0", "/$defs/foo"]:

        def fn(scope, s, cause=cause):
            if scope.pointer == cause:
                raise RuntimeError("unexpected error")

        with pytest.raises(RuntimeError):
            Walk(ptr_test, fn)


def test_filtered_walk():
    # walk_test.go:136-176 — filter allOf members that are true schemas.
    schema = Schema(
        all_of=[Schema(), Schema(not_=Schema()), Schema()],
        not_=Schema(description="foo"),
    )
    seen = []

    def fn(scope, s):
        if scope.pointer == "/":
            return None
        keyword = scope.pointer.rsplit("/", 1)[-1]
        if keyword not in (
            "not", "if", "then", "else", "items", "contains",
            "additionalProperties", "propertyNames",
        ):
            keyword = scope.pointer.split("/")[-2]
        if keyword == "allOf" and s.is_true():
            seen.append(scope.pointer)
            return None
        return Skip

    Walk(schema, fn)
    assert sorted(seen) == ["/allOf/0", "/allOf/2"]


def test_walk_modifying():
    # walk_test.go:207-263 — in-place mutation + full replacement, and the
    # replacement node is itself walked.
    ptr_test = Schema(
        defs={"foo": Schema(), "bar": Schema()},
        all_of=[Schema(), Schema()],
        additional_properties=FALSE(),
    )

    def fn(scope, s):
        if scope.pointer == "/$defs/foo":
            s.replace_with(Schema(comment="replaced"))
        elif scope.pointer == "/allOf/0":
            s.comment = "modified"
        elif scope.pointer == "/additionalProperties":
            s.replace_with(
                Schema(
                    comment="replaced",
                    type=["array"],
                    items=Schema(type=["integer"]),
                )
            )
        elif scope.pointer == "/additionalProperties/items":
            s.replace_with(Schema(type=["number"]))

    Walk(ptr_test, fn)

    expected = Schema(
        defs={"foo": Schema(comment="replaced"), "bar": Schema()},
        all_of=[Schema(comment="modified"), Schema()],
        additional_properties=Schema(
            comment="replaced",
            type=["array"],
            items=Schema(type=["number"]),
        ),
    )
    assert ptr_test == expected


def test_ref_inlining_example():
    # ExampleWalk (walk_test.go:265-298): replace {$ref, ...siblings} with
    # {allOf: [siblings, resolved]} — our compile-time ref-elimination pass.
    doc = """
    {
      "$ref": "#/$defs/len",
      "minItems": 1,
      "$defs": {
        "len": {
          "minItems": 2
        }
      }
    }"""
    s = Schema.from_json(doc)

    def fn(scope, schema):
        if schema.ref != "":
            resolved = resolve_reference(ResolveConfig(), schema.ref, schema)
            schema.ref = ""
            left = schema.copy()
            schema.replace_with(Schema(all_of=[left, resolved]))

    Walk(s, fn)
    assert json.loads(str(s)) == {
        "allOf": [
            {"$defs": {"len": {"minItems": 2}}, "minItems": 1},
            {"minItems": 2},
        ]
    }
