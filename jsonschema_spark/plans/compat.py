"""Schema-compatibility checking (registry-style BACKWARD / FORWARD / FULL).

The schema-evolution gate a validation pipeline needs between snapshots:
before swapping the enforced schema document from version A to version B,
classify every keyword-level difference as

- ``loosened``      B accepts instances A rejected (new optional field,
                    widened bound, extended enum, ...)
- ``tightened``     B rejects instances A accepted (new required member,
                    narrowed type set, raised minimum, ...)
- ``incomparable``  the change is not monotone at the keyword level
                    (pattern rewritten, oneOf restructured) — treated as
                    breaking in EVERY mode, conservatively
- ``metadata``      annotation-only (title/description/default/...)
                    — never breaking

and decide compatibility per mode: BACKWARD (every instance valid under A
stays valid under B — B only loosens), FORWARD (B only tightens), FULL
(annotation-only changes). This is keyword-wise structural entailment, not
full logical entailment (which is undecidable for 2020-12): applicator
rewrites that the keyword lattice cannot order are reported
``incomparable`` rather than guessed at.

Both documents are ``inline_refs``-normalized first, so a pure $ref
refactor (same resolved shape) compares equal and $ref retargeting shows
up as a structural diff. Driver-side only — nothing here touches row data;
the compare is O(schema size).

Approximations (documented contract): a property added to ``properties``
is compared against what the OLD schema enforced for that name —
``additionalProperties`` (default True); a removed property is compared
the mirror way. allOf extension is tightening, anyOf extension loosening
(set semantics on equal members); oneOf is non-monotone and any change is
incomparable.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from decimal import Decimal
from typing import Any, Optional

from jsonschema_spark.plans.compile import inline_refs
from jsonschema_spark.resolve import ResolveConfig
from jsonschema_spark.schema import ALL_TYPES, Schema

LOOSENED = "loosened"
TIGHTENED = "tightened"
INCOMPARABLE = "incomparable"
METADATA = "metadata"

MODE_BACKWARD = "backward"  # B must accept everything A accepts
MODE_FORWARD = "forward"    # A must accept everything B accepts
MODE_FULL = "full"

_METADATA_ATTRS = (
    "title", "description", "default", "deprecated", "read_only",
    "write_only", "examples", "comment", "schema", "vocabulary",
    "id", "anchor", "format",  # format is annotation-only by default
)


@dataclass(frozen=True)
class Change:
    pointer: str
    keyword: str
    direction: str  # LOOSENED / TIGHTENED / INCOMPARABLE / METADATA
    old: Any
    new: Any

    @property
    def message(self) -> str:
        return (
            f"{self.pointer or '/'}: {self.keyword} {self.direction} "
            f"({_show(self.old)} -> {_show(self.new)})"
        )


def _show(v: Any) -> str:
    if isinstance(v, Schema):
        return v.to_json()
    if isinstance(v, Decimal):
        return str(v)
    try:
        return json.dumps(v)
    except TypeError:
        return repr(v)


class _Diff:
    def __init__(self) -> None:
        self.changes: list[Change] = []

    def add(self, ptr: str, kw: str, direction: str, old: Any, new: Any) -> None:
        self.changes.append(Change(ptr, kw, direction, old, new))

    # -- scalar keyword helpers ------------------------------------------

    def presence(self, ptr: str, kw: str, old: Any, new: Any, *, add_dir: str) -> bool:
        """Handle None<->value transitions; returns True when both present."""
        if old is None and new is None:
            return False
        if old is None:
            self.add(ptr, kw, add_dir, None, new)
            return False
        if new is None:
            rm = LOOSENED if add_dir == TIGHTENED else TIGHTENED
            self.add(ptr, kw, rm, old, None)
            return False
        return True

    def lower_bound(self, ptr: str, kw: str, old, new) -> None:
        # (value, exclusive) tuples; a raised or newly-exclusive lower bound
        # tightens. Missing bound = -inf.
        if old == new:
            return
        if old is None:
            self.add(ptr, kw, TIGHTENED, None, new)
        elif new is None:
            self.add(ptr, kw, LOOSENED, old, None)
        elif (new[0], new[1]) > (old[0], old[1]):  # exclusive > inclusive at same value
            self.add(ptr, kw, TIGHTENED, old, new)
        else:
            self.add(ptr, kw, LOOSENED, old, new)

    def upper_bound(self, ptr: str, kw: str, old, new) -> None:
        if old == new:
            return
        if old is None:
            self.add(ptr, kw, TIGHTENED, None, new)
        elif new is None:
            self.add(ptr, kw, LOOSENED, old, None)
        elif (new[0], -new[1]) < (old[0], -old[1]):
            self.add(ptr, kw, TIGHTENED, old, new)
        else:
            self.add(ptr, kw, LOOSENED, old, new)

    def count_bound(self, ptr: str, kw: str, old, new, *, is_min: bool) -> None:
        dflt = 0 if is_min else None  # min* default 0; max* default inf
        o = old if old is not None else dflt
        n = new if new is not None else dflt
        if o == n:
            return
        if is_min:
            if n is None or (o is not None and n < o):
                self.add(ptr, kw, LOOSENED, old, new)
            else:
                self.add(ptr, kw, TIGHTENED, old, new)
        else:
            if n is None or (o is not None and n > o):
                self.add(ptr, kw, LOOSENED, old, new)
            else:
                self.add(ptr, kw, TIGHTENED, old, new)


def _type_set(s: Schema) -> Optional[frozenset[str]]:
    if s.type is None:
        return None
    out = set(s.type)
    if "number" in out:
        out.add("integer")  # integer instances satisfy "number"
    return frozenset(out)


def _enum_set(s: Schema) -> Optional[list[Any]]:
    if s.const is not None:
        return [s.const]
    return s.enum


def _effective_lower(s: Schema):
    best = None
    if s.minimum is not None:
        best = (s.minimum, 0)
    if s.exclusive_minimum is not None:
        cand = (s.exclusive_minimum, 1)
        if best is None or cand >= best:
            best = cand
    return best


def _effective_upper(s: Schema):
    best = None
    if s.maximum is not None:
        best = (s.maximum, 0)
    if s.exclusive_maximum is not None:
        cand = (s.exclusive_maximum, 1)
        # tighter upper bound: smaller value, or same value exclusive
        if best is None or (cand[0], -cand[1]) <= (best[0], -best[1]):
            best = cand
    return best


def _divides(big, small) -> bool:
    """True when every multiple of ``big`` is a multiple of ``small``."""
    b, s = Decimal(str(big)), Decimal(str(small))
    if s == 0:
        return False
    return (b % s) == 0


def _schemas_equal(a: Optional[Schema], b: Optional[Schema]) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a.to_value() == b.to_value()


def _diff_node(d: _Diff, ptr: str, old: Schema, new: Schema) -> None:
    if old.to_value() == new.to_value():
        return

    # boolean-schema collapse first: False rejects everything, True is empty
    if new.is_false() and not old.is_false():
        d.add(ptr, "$schema(false)", TIGHTENED, old, new)
        return
    if old.is_false() and not new.is_false():
        d.add(ptr, "$schema(false)", LOOSENED, old, new)
        return

    # ---- type -----------------------------------------------------------
    ot, nt = _type_set(old), _type_set(new)
    if ot != nt:
        o_eff = ot if ot is not None else frozenset(ALL_TYPES)
        n_eff = nt if nt is not None else frozenset(ALL_TYPES)
        if n_eff > o_eff:
            d.add(ptr, "type", LOOSENED, old.type, new.type)
        elif n_eff < o_eff:
            d.add(ptr, "type", TIGHTENED, old.type, new.type)
        else:
            d.add(ptr, "type", INCOMPARABLE, old.type, new.type)

    # ---- enum / const ---------------------------------------------------
    oe, ne = _enum_set(old), _enum_set(new)
    if oe != ne:
        if oe is None:
            d.add(ptr, "enum", TIGHTENED, None, ne)
        elif ne is None:
            d.add(ptr, "enum", LOOSENED, oe, None)
        else:
            def key(vs):
                return {json.dumps(v, sort_keys=True, default=str) for v in vs}
            ok, nk = key(oe), key(ne)
            if nk > ok:
                d.add(ptr, "enum", LOOSENED, oe, ne)
            elif nk < ok:
                d.add(ptr, "enum", TIGHTENED, oe, ne)
            elif nk != ok:
                d.add(ptr, "enum", INCOMPARABLE, oe, ne)

    # ---- numeric bounds -------------------------------------------------
    d.lower_bound(ptr, "minimum", _effective_lower(old), _effective_lower(new))
    d.upper_bound(ptr, "maximum", _effective_upper(old), _effective_upper(new))
    if old.multiple_of != new.multiple_of:
        if old.multiple_of is None:
            d.add(ptr, "multipleOf", TIGHTENED, None, new.multiple_of)
        elif new.multiple_of is None:
            d.add(ptr, "multipleOf", LOOSENED, old.multiple_of, None)
        elif _divides(old.multiple_of, new.multiple_of):
            d.add(ptr, "multipleOf", LOOSENED, old.multiple_of, new.multiple_of)
        elif _divides(new.multiple_of, old.multiple_of):
            d.add(ptr, "multipleOf", TIGHTENED, old.multiple_of, new.multiple_of)
        else:
            d.add(ptr, "multipleOf", INCOMPARABLE, old.multiple_of, new.multiple_of)

    # ---- string / array / object count bounds ---------------------------
    d.count_bound(ptr, "minLength", old.min_length, new.min_length, is_min=True)
    d.count_bound(ptr, "maxLength", old.max_length, new.max_length, is_min=False)
    d.count_bound(ptr, "minItems", old.min_items, new.min_items, is_min=True)
    d.count_bound(ptr, "maxItems", old.max_items, new.max_items, is_min=False)
    d.count_bound(ptr, "minProperties", old.min_properties, new.min_properties, is_min=True)
    d.count_bound(ptr, "maxProperties", old.max_properties, new.max_properties, is_min=False)
    if old.contains is not None or new.contains is not None:
        d.count_bound(ptr, "minContains", old.min_contains, new.min_contains, is_min=True)
        d.count_bound(ptr, "maxContains", old.max_contains, new.max_contains, is_min=False)

    # ---- pattern --------------------------------------------------------
    if old.pattern != new.pattern:
        if old.pattern is None:
            d.add(ptr, "pattern", TIGHTENED, None, new.pattern)
        elif new.pattern is None:
            d.add(ptr, "pattern", LOOSENED, old.pattern, None)
        else:
            d.add(ptr, "pattern", INCOMPARABLE, old.pattern, new.pattern)

    # ---- uniqueItems ----------------------------------------------------
    ou = bool(old.unique_items)
    nu = bool(new.unique_items)
    if ou != nu:
        d.add(ptr, "uniqueItems", TIGHTENED if nu else LOOSENED, ou, nu)

    # ---- required / dependentRequired -----------------------------------
    oreq = set(old.required or [])
    nreq = set(new.required or [])
    for name in sorted(nreq - oreq):
        d.add(ptr, "required", TIGHTENED, None, name)
    for name in sorted(oreq - nreq):
        d.add(ptr, "required", LOOSENED, name, None)
    odr = old.dependent_required or {}
    ndr = new.dependent_required or {}
    for k in sorted(set(odr) | set(ndr)):
        os_, ns_ = set(odr.get(k, [])), set(ndr.get(k, []))
        for name in sorted(ns_ - os_):
            d.add(f"{ptr}/dependentRequired/{k}", "dependentRequired", TIGHTENED, None, name)
        for name in sorted(os_ - ns_):
            d.add(f"{ptr}/dependentRequired/{k}", "dependentRequired", LOOSENED, name, None)

    # ---- properties (recurse; additions/removals vs additionalProperties)
    oprops = old.properties or {}
    nprops = new.properties or {}
    for name in sorted(set(oprops) | set(nprops)):
        child_ptr = f"{ptr}/properties/{name}"
        if name in oprops and name in nprops:
            _diff_node(d, child_ptr, oprops[name], nprops[name])
        elif name in nprops:
            # previously governed by old's additionalProperties (default True)
            baseline = old.additional_properties or Schema()
            _diff_node(d, child_ptr, baseline, nprops[name])
        else:
            baseline = new.additional_properties or Schema()
            _diff_node(d, child_ptr, oprops[name], baseline)

    # ---- patternProperties ----------------------------------------------
    opp = old.pattern_properties or {}
    npp = new.pattern_properties or {}
    for pat in sorted(set(opp) | set(npp)):
        child_ptr = f"{ptr}/patternProperties/{pat}"
        if pat in opp and pat in npp:
            _diff_node(d, child_ptr, opp[pat], npp[pat])
        elif pat in npp:
            if not npp[pat].is_true():
                d.add(child_ptr, "patternProperties", TIGHTENED, None, npp[pat])
        else:
            if not opp[pat].is_true():
                d.add(child_ptr, "patternProperties", LOOSENED, opp[pat], None)

    # ---- single-schema applicators (monotone recursion) ------------------
    for attr, kw in (
        ("additional_properties", "additionalProperties"),
        ("property_names", "propertyNames"),
        ("items", "items"),
        ("contains", "contains"),
        ("unevaluated_properties", "unevaluatedProperties"),
        ("unevaluated_items", "unevaluatedItems"),
        ("content_schema", "contentSchema"),
    ):
        osub = getattr(old, attr)
        nsub = getattr(new, attr)
        if _schemas_equal(osub, nsub):
            continue
        child_ptr = f"{ptr}/{kw}"
        # contains is existential: even `contains: true` asserts a non-empty
        # array (minContains default 1), so presence alone tightens.
        vacuous_when_true = kw != "contains"
        if osub is None:
            if nsub.is_true() and vacuous_when_true:
                continue
            d.add(child_ptr, kw, TIGHTENED, None, nsub)
        elif nsub is None:
            if osub.is_true() and vacuous_when_true:
                continue
            d.add(child_ptr, kw, LOOSENED, osub, None)
        else:
            _diff_node(d, child_ptr, osub, nsub)

    # ---- prefixItems -----------------------------------------------------
    opi = old.prefix_items or []
    npi = new.prefix_items or []
    for i in range(max(len(opi), len(npi))):
        child_ptr = f"{ptr}/prefixItems/{i}"
        if i < len(opi) and i < len(npi):
            _diff_node(d, child_ptr, opi[i], npi[i])
        elif i < len(npi):
            baseline = old.items or Schema()
            _diff_node(d, child_ptr, baseline, npi[i])
        else:
            baseline = new.items or Schema()
            _diff_node(d, child_ptr, opi[i], baseline)

    # ---- logic applicators (set semantics where monotone) ----------------
    _diff_schema_list(d, ptr, "allOf", old.all_of, new.all_of, extend_dir=TIGHTENED)
    _diff_schema_list(d, ptr, "anyOf", old.any_of, new.any_of, extend_dir=LOOSENED)
    if not _lists_equal(old.one_of, new.one_of):
        d.add(f"{ptr}/oneOf", "oneOf", INCOMPARABLE, old.one_of, new.one_of)
    if not _schemas_equal(old.not_, new.not_):
        d.add(f"{ptr}/not", "not", INCOMPARABLE, old.not_, new.not_)
    for attr, kw in (("if_", "if"), ("then", "then"), ("else_", "else")):
        if not _schemas_equal(getattr(old, attr), getattr(new, attr)):
            d.add(f"{ptr}/{kw}", kw, INCOMPARABLE, getattr(old, attr), getattr(new, attr))
            break
    ods = old.dependent_schemas or {}
    nds = new.dependent_schemas or {}
    for k in sorted(set(ods) | set(nds)):
        child_ptr = f"{ptr}/dependentSchemas/{k}"
        if k in ods and k in nds:
            _diff_node(d, child_ptr, ods[k], nds[k])
        elif k in nds:
            if not nds[k].is_true():
                d.add(child_ptr, "dependentSchemas", TIGHTENED, None, nds[k])
        else:
            if not ods[k].is_true():
                d.add(child_ptr, "dependentSchemas", LOOSENED, ods[k], None)

    # ---- content assertions ----------------------------------------------
    if old.content_encoding != new.content_encoding:
        if old.content_encoding is None:
            d.add(ptr, "contentEncoding", TIGHTENED, None, new.content_encoding)
        elif new.content_encoding is None:
            d.add(ptr, "contentEncoding", LOOSENED, old.content_encoding, None)
        else:
            d.add(ptr, "contentEncoding", INCOMPARABLE,
                  old.content_encoding, new.content_encoding)

    # ---- metadata (annotation-only, never breaking) ----------------------
    for attr in _METADATA_ATTRS:
        ov, nv = getattr(old, attr), getattr(new, attr)
        if ov != nv:
            from jsonschema_spark.schema import ATTR_TO_KEYWORD
            d.add(ptr, ATTR_TO_KEYWORD[attr], METADATA, ov, nv)


def _lists_equal(a: Optional[list[Schema]], b: Optional[list[Schema]]) -> bool:
    av = [s.to_value() for s in (a or [])]
    bv = [s.to_value() for s in (b or [])]
    return av == bv


def _diff_schema_list(
    d: _Diff, ptr: str, kw: str,
    old: Optional[list[Schema]], new: Optional[list[Schema]], *, extend_dir: str,
) -> None:
    if _lists_equal(old, new):
        return
    o = {json.dumps(s.to_value(), sort_keys=True, default=str) for s in (old or [])}
    n = {json.dumps(s.to_value(), sort_keys=True, default=str) for s in (new or [])}
    if n > o:
        d.add(f"{ptr}/{kw}", kw, extend_dir, old, new)
    elif n < o:
        shrink = LOOSENED if extend_dir == TIGHTENED else TIGHTENED
        d.add(f"{ptr}/{kw}", kw, shrink, old, new)
    else:
        d.add(f"{ptr}/{kw}", kw, INCOMPARABLE, old, new)


def _as_schema(s: Schema | dict | str | bool) -> Schema:
    if isinstance(s, Schema):
        return s
    if isinstance(s, str):
        return Schema.from_json(s)
    return Schema.from_value(s)


def compat_changes(
    old: Schema | dict | str | bool,
    new: Schema | dict | str | bool,
    resolve_config: Optional[ResolveConfig] = None,
) -> list[Change]:
    """Keyword-level differences between two schema documents ($refs
    inlined first, so refactors that preserve the resolved shape compare
    equal). Order: document order of the walk, deterministic."""
    o = inline_refs(_as_schema(old), resolve_config)
    n = inline_refs(_as_schema(new), resolve_config)
    d = _Diff()
    _diff_node(d, "", o, n)
    return d.changes


def is_compatible(
    old: Schema | dict | str | bool,
    new: Schema | dict | str | bool,
    mode: str = MODE_BACKWARD,
    resolve_config: Optional[ResolveConfig] = None,
) -> tuple[bool, list[Change]]:
    """Registry-style verdict. Returns (ok, breaking_changes).

    BACKWARD: instances valid under ``old`` must stay valid under ``new``
    -> tightenings break. FORWARD: the mirror -> loosenings break. FULL:
    both. ``incomparable`` changes break every mode.
    """
    changes = compat_changes(old, new, resolve_config)
    if mode == MODE_BACKWARD:
        bad = {TIGHTENED, INCOMPARABLE}
    elif mode == MODE_FORWARD:
        bad = {LOOSENED, INCOMPARABLE}
    elif mode == MODE_FULL:
        bad = {TIGHTENED, LOOSENED, INCOMPARABLE}
    else:
        raise ValueError(f"unknown mode {mode!r}")
    breaking = [c for c in changes if c.direction in bad]
    return (not breaking, breaking)
