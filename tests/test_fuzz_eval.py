"""Semantic fuzz: hypothesis-generated schemas + rows, evaluated by an
INDEPENDENT pure-Python draft-2020-12 evaluator and cross-checked against
the compiled Spark plan's per-row verdict.

The Python evaluator below is written from the JSON Schema spec (and the
engine's documented null-as-absent contract, plans/compile.py docstring) —
NOT from the compiler's code — so agreement is genuine cross-validation of
the whole keyword algebra, independent of the DuckDB oracles.

Shared semantics under test:
- NULL column value == absent property: every keyword passes vacuously,
  only `required` (and additionalProperties:false etc.) detects absence.
- Type-gated keywords (numeric keywords ignore strings, string keywords
  ignore arrays, ...) — standard JSON Schema applicability.
- Applicator algebra incl. if/then/else, dependent*, oneOf counting, and
  unevaluatedProperties annotation flow (branch annotations only count
  when the branch validates).
"""

from __future__ import annotations

import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.operators.validate import validate

COLS = ("a", "b", "s", "arr")

SPARK_SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType(), False),
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("arr", T.ArrayType(T.IntegerType(), False), True),
    ]
)


# ---------------------------------------------------------------------------
# Independent evaluator (instance-based, spec semantics)
# ---------------------------------------------------------------------------


def _is_true(s) -> bool:
    return s is True or s == {}


def _is_false(s) -> bool:
    return s is False or s == {"not": {}} or s == {"not": True}


def _type_match(t: str, v) -> bool:
    if t == "integer":
        return (isinstance(v, int) and not isinstance(v, bool)) or (
            isinstance(v, float) and float(v).is_integer()
        )
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "string":
        return isinstance(v, str)
    if t == "array":
        return isinstance(v, list)
    if t == "object":
        return isinstance(v, dict)
    if t == "boolean":
        return isinstance(v, bool)
    if t == "null":
        return v is None
    return False


def py_valid(s, v) -> bool:
    """Validate instance ``v`` (None == absent) against schema ``s``."""
    if _is_true(s):
        return True
    if _is_false(s):
        return v is None
    if v is None:
        return True

    ok = True
    is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
    is_str = isinstance(v, str)
    is_arr = isinstance(v, list)
    is_obj = isinstance(v, dict)

    if "type" in s:
        ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
        ok &= any(_type_match(t, v) for t in ts)
    if "const" in s:
        ok &= v == s["const"]
    if "enum" in s:
        ok &= any(v == m for m in s["enum"])

    if is_num:
        if "minimum" in s:
            ok &= v >= s["minimum"]
        if "maximum" in s:
            ok &= v <= s["maximum"]
        if "exclusiveMinimum" in s:
            ok &= v > s["exclusiveMinimum"]
        if "exclusiveMaximum" in s:
            ok &= v < s["exclusiveMaximum"]
        if "multipleOf" in s:
            ok &= math.fmod(v, s["multipleOf"]) == 0
    if is_str:
        if "minLength" in s:
            ok &= len(v) >= s["minLength"]
        if "maxLength" in s:
            ok &= len(v) <= s["maxLength"]
        if "pattern" in s:
            ok &= re.search(s["pattern"], v) is not None
    if is_arr:
        if "minItems" in s:
            ok &= len(v) >= s["minItems"]
        if "maxItems" in s:
            ok &= len(v) <= s["maxItems"]
        if s.get("uniqueItems"):
            ok &= len(set(map(repr, v))) == len(v)
        prefix = s.get("prefixItems", [])
        for i, sub in enumerate(prefix):
            if i < len(v):
                ok &= py_valid(sub, v[i])
        if "items" in s:
            ok &= all(py_valid(s["items"], x) for x in v[len(prefix):])
        if "contains" in s:
            n = sum(1 for x in v if py_valid(s["contains"], x))
            ok &= n >= s.get("minContains", 1)
            if "maxContains" in s:
                ok &= n <= s["maxContains"]
        if "unevaluatedItems" in s:
            sub = s["unevaluatedItems"]
            for i, x in enumerate(v):
                if _item_evaluated(s, v, i, py_valid):
                    continue
                ok &= False if _is_false(sub) else py_valid(sub, x)
    if is_obj:
        ok &= _object_valid(s, v)

    for sub in s.get("allOf", []):
        ok &= py_valid(sub, v)
    if "anyOf" in s:
        ok &= any(py_valid(sub, v) for sub in s["anyOf"])
    if "oneOf" in s:
        ok &= sum(1 for sub in s["oneOf"] if py_valid(sub, v)) == 1
    if "not" in s and not _is_false(s):
        sub = s["not"]
        ok &= False if _is_true(sub) else not py_valid(sub, v)
    if "if" in s:
        if py_valid(s["if"], v):
            ok &= py_valid(s["then"], v) if "then" in s else True
        else:
            ok &= py_valid(s["else"], v) if "else" in s else True
    return bool(ok)


def _present(row: dict, k: str) -> bool:
    return row.get(k) is not None


def _object_valid(s, row: dict) -> bool:
    ok = True
    props = s.get("properties", {})
    pats = s.get("patternProperties", {})
    for k in s.get("required", []):
        ok &= _present(row, k)
    for k, sub in props.items():
        if k in row:
            ok &= py_valid(sub, row[k])
    for pat, sub in pats.items():
        for k in row:
            if re.search(pat, k) and row[k] is not None:
                ok &= py_valid(sub, row[k])
    if "additionalProperties" in s:
        ap = s["additionalProperties"]
        extras = [
            k for k in row
            if k not in props and not any(re.search(p, k) for p in pats)
        ]
        for k in extras:
            if _is_false(ap):
                ok &= row[k] is None
            elif not _is_true(ap) and row[k] is not None:
                ok &= py_valid(ap, row[k])
    if "minProperties" in s:
        ok &= sum(1 for k in row if row[k] is not None) >= s["minProperties"]
    if "maxProperties" in s:
        ok &= sum(1 for k in row if row[k] is not None) <= s["maxProperties"]
    for k, deps in s.get("dependentRequired", {}).items():
        if _present(row, k):
            ok &= all(_present(row, d) for d in deps)
    for k, sub in s.get("dependentSchemas", {}).items():
        if _present(row, k):
            ok &= py_valid(sub, row)
    if "unevaluatedProperties" in s:
        sub = s["unevaluatedProperties"]
        for k in row:
            if row[k] is None or _prop_evaluated(s, row, k):
                continue
            ok &= False if _is_false(sub) else py_valid(sub, row[k])
    return bool(ok)


def _prop_evaluated(s, row: dict, k: str) -> bool:
    """Annotation flow: is property k evaluated by s or by a successfully-
    validating in-place applicator branch?"""
    if _is_true(s) or _is_false(s):
        return False
    if "additionalProperties" in s:
        return True
    if k in s.get("properties", {}):
        return True
    if any(re.search(p, k) for p in s.get("patternProperties", {})):
        return True
    branches = list(s.get("allOf", [])) + list(s.get("anyOf", [])) + list(
        s.get("oneOf", [])
    )
    if "if" in s:
        branches.append(s["if"])
        if py_valid(s["if"], row):
            if "then" in s:
                branches.append(s["then"])
        elif "else" in s:
            branches.append(s["else"])
    for dk, sub in s.get("dependentSchemas", {}).items():
        if _present(row, dk):
            branches.append(sub)
    return any(
        py_valid(b, row) and _prop_evaluated(b, row, k) for b in branches
    )


def _item_evaluated(s, arr, i, valid_fn) -> bool:
    """Annotation flow over array elements: is arr[i] evaluated by s or by
    a successfully-validating in-place applicator branch? Mirrors the
    engine's _items_evaluated / _variant_items_evaluated."""
    if _is_true(s) or _is_false(s):
        return False
    if "items" in s:
        return True
    if i < len(s.get("prefixItems", [])):
        return True
    if "contains" in s and valid_fn(s["contains"], arr[i]):
        return True
    branches = list(s.get("allOf", [])) + list(s.get("anyOf", [])) + list(
        s.get("oneOf", [])
    )
    if "if" in s:
        branches.append(s["if"])
        if valid_fn(s["if"], arr):
            if "then" in s:
                branches.append(s["then"])
        elif "else" in s:
            branches.append(s["else"])
    return any(
        valid_fn(b, arr) and _item_evaluated(b, arr, i, valid_fn) for b in branches
    )


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

_ints = st.integers(-5, 5)
_halves = st.sampled_from([-4.5, -2.0, -0.5, 0.0, 0.5, 1.0, 2.5, 4.0])
_words = st.sampled_from(["", "x", "xy", "yyy", "abc", "zz9"])
_patterns = st.sampled_from(["^x", "y$", "^[a-z]+$", "9"])


def _int_schema():
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(["integer", ["integer", "null"], "number", "string"]),
            "minimum": _ints,
            "maximum": _ints,
            "exclusiveMinimum": _ints,
            "exclusiveMaximum": _ints,
            "multipleOf": st.sampled_from([2, 3]),
            "enum": st.lists(_ints, min_size=1, max_size=3),
            "const": _ints,
        },
    )


def _double_schema():
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(["number", "integer"]),
            "minimum": _halves,
            "maximum": _halves,
            "exclusiveMinimum": _halves,
            "exclusiveMaximum": _halves,
            "const": _halves,
        },
    )


def _string_schema():
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.just("string"),
            "minLength": st.integers(0, 4),
            "maxLength": st.integers(0, 4),
            "pattern": _patterns,
            "enum": st.lists(_words, min_size=1, max_size=3),
            "const": _words,
        },
    )


def _array_schema():
    elem = st.fixed_dictionaries(
        {}, optional={"minimum": _ints, "maximum": _ints}
    )
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.just("array"),
            "minItems": st.integers(0, 3),
            "maxItems": st.integers(0, 4),
            "uniqueItems": st.booleans(),
            "prefixItems": st.lists(elem, min_size=1, max_size=2),
            "items": elem,
            "contains": elem,
            "minContains": st.integers(0, 2),
            "maxContains": st.integers(0, 3),
            "unevaluatedItems": st.sampled_from(
                [False, {"minimum": 0}, {"maximum": 2}]
            ),
        },
    )


_PROP = {"a": _int_schema(), "b": _double_schema(), "s": _string_schema(), "arr": _array_schema()}


def _prop_schema_for(col):
    return _PROP[col]


def _props_subset():
    return st.lists(st.sampled_from(COLS), unique=True, min_size=1, max_size=3).flatmap(
        lambda cols: st.fixed_dictionaries({c: _prop_schema_for(c) for c in cols})
    )


def _root_branch():
    """Depth-1 in-place applicator branch at the root: an object schema."""
    return _props_subset().map(lambda p: {"properties": p})


def _root_schema():
    return st.fixed_dictionaries(
        {"type": st.just("object")},
        optional={
            "properties": _props_subset(),
            "required": st.lists(st.sampled_from(COLS), unique=True, max_size=2),
            "patternProperties": st.fixed_dictionaries(
                {}, optional={"^a": _int_schema()}
            ),
            "dependentRequired": st.fixed_dictionaries(
                {}, optional={"a": st.lists(st.sampled_from(("b", "s")), unique=True, min_size=1, max_size=2)}
            ),
            "dependentSchemas": st.fixed_dictionaries(
                {}, optional={"s": _root_branch()}
            ),
            "allOf": st.lists(_root_branch(), min_size=1, max_size=2),
            "anyOf": st.lists(_root_branch(), min_size=1, max_size=2),
            "oneOf": st.lists(_root_branch(), min_size=1, max_size=2),
            "not": _root_branch(),
            "if": _root_branch(),
            "then": _root_branch(),
            "else": _root_branch(),
            "minProperties": st.integers(0, 3),
            "maxProperties": st.integers(2, 5),
            "unevaluatedProperties": st.sampled_from(
                [False, {"minimum": 0}, {"type": "string"}]
            ),
        },
    )


def _row():
    return st.fixed_dictionaries(
        {
            "a": st.none() | _ints,
            "b": st.none() | _halves,
            "s": st.none() | _words,
            "arr": st.none() | st.lists(_ints, max_size=4),
        }
    )


# ---------------------------------------------------------------------------
# The cross-check
# ---------------------------------------------------------------------------


_EXAMPLES = int(os.environ.get("JSS_FUZZ_EXAMPLES", "25"))


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(schema=_root_schema(), rows=st.lists(_row(), min_size=4, max_size=8))
def test_spark_matches_independent_evaluator(spark, schema, rows):
    data = [
        {"rid": i, **r, "arr": list(r["arr"]) if r["arr"] is not None else None}
        for i, r in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SPARK_SCHEMA)
    got = {
        r["rid"]: r["_valid"]
        for r in validate(df, schema).annotated.select("rid", "_valid").collect()
    }
    for i, r in enumerate(rows):
        # rid is part of the row object for root-level object keywords
        inst = {"rid": i, **r}
        want = py_valid(schema, inst)
        assert got[i] == want, (
            f"row {i}: spark={got[i]} python={want}\nschema={schema}\nrow={r}"
        )


# ---------------------------------------------------------------------------
# Variant fuzz: dynamic JSON instances against the same independent evaluator
# ---------------------------------------------------------------------------


class _JNull:
    """Sentinel for a PRESENT JSON null (distinct from absent/None)."""

    def __repr__(self):
        return "JNULL"


JNULL = _JNull()


def _jeq(v, m):
    """Instance-vs-member equality with the JNULL sentinel folded to None."""
    if v is JNULL:
        return m is None
    return v == m


def py_valid_v(s, v) -> bool:
    """py_valid over dynamic JSON instances: JNULL = present JSON null
    (matches type:'null', satisfies presence, inapplicable elsewhere)."""
    if _is_true(s):
        return True
    if _is_false(s):
        return v is None
    if v is None:
        return True
    if v is JNULL:
        ok = True
        if "type" in s:
            ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
            ok &= "null" in ts
        if "const" in s:
            ok &= s["const"] is None
        if "enum" in s:
            ok &= any(m is None for m in s["enum"])
        for sub in s.get("allOf", []):
            ok &= py_valid_v(sub, v)
        if "anyOf" in s:
            ok &= any(py_valid_v(sub, v) for sub in s["anyOf"])
        if "oneOf" in s:
            ok &= sum(1 for sub in s["oneOf"] if py_valid_v(sub, v)) == 1
        if "not" in s and not _is_false(s):
            sub = s["not"]
            ok &= False if _is_true(sub) else not py_valid_v(sub, v)
        if "if" in s:
            if py_valid_v(s["if"], v):
                ok &= py_valid_v(s["then"], v) if "then" in s else True
            else:
                ok &= py_valid_v(s["else"], v) if "else" in s else True
        return bool(ok)

    ok = True
    is_num = isinstance(v, (int, float)) and not isinstance(v, bool)
    is_str = isinstance(v, str)
    is_arr = isinstance(v, list)
    is_obj = isinstance(v, dict)

    if "type" in s:
        ts = s["type"] if isinstance(s["type"], list) else [s["type"]]
        ok &= any(_type_match(t, v) for t in ts)
    if "const" in s:
        ok &= _jeq(v, s["const"])
    if "enum" in s:
        ok &= any(_jeq(v, m) for m in s["enum"])
    if is_num:
        if "minimum" in s:
            ok &= v >= s["minimum"]
        if "maximum" in s:
            ok &= v <= s["maximum"]
        if "exclusiveMinimum" in s:
            ok &= v > s["exclusiveMinimum"]
        if "exclusiveMaximum" in s:
            ok &= v < s["exclusiveMaximum"]
        if "multipleOf" in s:
            ok &= math.fmod(v, s["multipleOf"]) == 0
    if is_str:
        if "minLength" in s:
            ok &= len(v) >= s["minLength"]
        if "maxLength" in s:
            ok &= len(v) <= s["maxLength"]
        if "pattern" in s:
            ok &= re.search(s["pattern"], v) is not None
    if is_arr:
        if "minItems" in s:
            ok &= len(v) >= s["minItems"]
        if "maxItems" in s:
            ok &= len(v) <= s["maxItems"]
        if s.get("uniqueItems"):
            ok &= len(set(map(repr, v))) == len(v)
        prefix = s.get("prefixItems", [])
        for i, sub in enumerate(prefix):
            if i < len(v):
                ok &= py_valid_v(sub, v[i])
        if "items" in s:
            ok &= all(py_valid_v(s["items"], x) for x in v[len(prefix):])
        if "contains" in s:
            n = sum(1 for x in v if py_valid_v(s["contains"], x))
            ok &= n >= s.get("minContains", 1)
            if "maxContains" in s:
                ok &= n <= s["maxContains"]
        if "unevaluatedItems" in s:
            sub = s["unevaluatedItems"]
            for i, x in enumerate(v):
                if _item_evaluated(s, v, i, py_valid_v):
                    continue
                ok &= False if _is_false(sub) else py_valid_v(sub, x)
    if is_obj:
        ok &= _object_valid_v(s, v)

    for sub in s.get("allOf", []):
        ok &= py_valid_v(sub, v)
    if "anyOf" in s:
        ok &= any(py_valid_v(sub, v) for sub in s["anyOf"])
    if "oneOf" in s:
        ok &= sum(1 for sub in s["oneOf"] if py_valid_v(sub, v)) == 1
    if "not" in s and not _is_false(s):
        sub = s["not"]
        ok &= False if _is_true(sub) else not py_valid_v(sub, v)
    if "if" in s:
        if py_valid_v(s["if"], v):
            ok &= py_valid_v(s["then"], v) if "then" in s else True
        else:
            ok &= py_valid_v(s["else"], v) if "else" in s else True
    return bool(ok)


def _object_valid_v(s, row: dict) -> bool:
    ok = True
    props = s.get("properties", {})
    pats = s.get("patternProperties", {})
    for k in s.get("required", []):
        ok &= k in row  # JSON-null values still satisfy presence
    for k, sub in props.items():
        if k in row:
            ok &= py_valid_v(sub, row[k])
    for pat, sub in pats.items():
        for k in row:
            if re.search(pat, k):
                ok &= py_valid_v(sub, row[k])
    if "additionalProperties" in s:
        ap = s["additionalProperties"]
        extras = [
            k for k in row
            if k not in props and not any(re.search(p, k) for p in pats)
        ]
        for k in extras:
            if _is_false(ap):
                ok &= False  # keys in a variant object are always present
            elif not _is_true(ap):
                ok &= py_valid_v(ap, row[k])
    if "propertyNames" in s:
        ok &= all(py_valid_v(s["propertyNames"], k) for k in row)
    if "minProperties" in s:
        ok &= len(row) >= s["minProperties"]
    if "maxProperties" in s:
        ok &= len(row) <= s["maxProperties"]
    for k, deps in s.get("dependentRequired", {}).items():
        if k in row:
            ok &= all(d in row for d in deps)
    for k, sub in s.get("dependentSchemas", {}).items():
        if k in row:
            ok &= py_valid_v(sub, row)
    return bool(ok)


_j_scal = st.one_of(
    st.just(JNULL), _ints, _words, st.sampled_from([-2.5, 0.5, 3.0])
)
_j_elem = st.one_of(_ints, _words)
_j_inst = st.one_of(
    _j_scal,
    st.lists(_j_elem, max_size=4),
    st.dictionaries(
        st.sampled_from(["k", "v", "w", "x1"]),
        st.one_of(_j_scal, st.lists(_j_elem, max_size=3)),
        max_size=4,
    ),
)

_j_members = st.lists(
    st.one_of(st.none(), _ints, _words), min_size=1, max_size=3
)


def _v_scalar_schema():
    elem = st.fixed_dictionaries(
        {}, optional={"type": st.sampled_from(["integer", "string"]), "minimum": _ints}
    )
    return st.fixed_dictionaries(
        {},
        optional={
            "type": st.sampled_from(
                ["integer", "number", "string", "array", "object", "null",
                 ["integer", "null"], ["string", "number"]]
            ),
            "enum": _j_members,
            # const: null is unrepresentable in the document model (None ==
            # keyword absent) — same conflation as the reference's Go
            # `Const any` field (nil == unset), so don't generate it
            "const": st.one_of(_ints, _words),
            "minimum": _ints,
            "maximum": _ints,
            "multipleOf": st.sampled_from([2, 3]),
            "minLength": st.integers(0, 4),
            "maxLength": st.integers(0, 4),
            "pattern": _patterns,
            "minItems": st.integers(0, 3),
            "maxItems": st.integers(0, 4),
            "uniqueItems": st.booleans(),
            "items": elem,
            "prefixItems": st.lists(elem, min_size=1, max_size=2),
            "contains": elem,
            "minContains": st.integers(0, 2),
            "maxContains": st.integers(0, 3),
            "unevaluatedItems": st.sampled_from(
                [False, {"minimum": 0}, {"maximum": 2}]
            ),
        },
    )


def _v_object_schema():
    return st.fixed_dictionaries(
        {},
        optional={
            "properties": st.dictionaries(
                st.sampled_from(["k", "v", "w"]), _v_scalar_schema(),
                min_size=1, max_size=2,
            ),
            "required": st.lists(
                st.sampled_from(["k", "v", "w"]), unique=True, max_size=2
            ),
            "patternProperties": st.fixed_dictionaries(
                {}, optional={"^k": _v_scalar_schema()}
            ),
            "additionalProperties": st.sampled_from([False]) | _v_scalar_schema(),
            "propertyNames": st.fixed_dictionaries(
                {}, optional={"pattern": _patterns, "maxLength": st.integers(1, 3)}
            ),
            "minProperties": st.integers(0, 3),
            "maxProperties": st.integers(0, 4),
            "dependentRequired": st.fixed_dictionaries(
                {}, optional={"k": st.lists(st.sampled_from(["v", "w"]), unique=True, min_size=1, max_size=2)}
            ),
            "dependentSchemas": st.fixed_dictionaries(
                {}, optional={"k": st.deferred(_v_object_schema)}
            ),
        },
    )


def _v_schema():
    base = st.one_of(_v_scalar_schema(), _v_object_schema())
    return st.fixed_dictionaries(
        {},
        optional={
            "allOf": st.lists(base, min_size=1, max_size=2),
            "anyOf": st.lists(base, min_size=1, max_size=2),
            "oneOf": st.lists(base, min_size=1, max_size=2),
            "not": base,
            "if": base,
            "then": base,
            "else": base,
        },
    ).flatmap(
        lambda apps: base.map(lambda b: {**b, **apps})
    )


def _encode(v):
    if v is JNULL:
        return None
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    return v


@settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(schema=_v_schema(), insts=st.lists(st.none() | _j_inst, min_size=4, max_size=8))
def test_variant_matches_independent_evaluator(spark, schema, insts):
    import json as _json

    rows = [
        (i, None if v is None else _json.dumps(_encode(v)))
        for i, v in enumerate(insts)
    ]
    df = spark.createDataFrame(rows, "rid long, js string").select(
        "rid", F.parse_json("js").alias("v")
    )
    doc = {"type": "object", "properties": {"v": schema}}
    got = {
        r["rid"]: r["_valid"]
        for r in validate(df, doc).annotated.select("rid", "_valid").collect()
    }
    for i, v in enumerate(insts):
        want = py_valid_v(schema, v)
        assert got[i] == want, (
            f"inst {i}: spark={got[i]} python={want}\nschema={schema}\ninst={v!r}"
        )
