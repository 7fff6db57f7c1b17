"""$id / $anchor identifier computation — the compile-time symbol table.

Reference parity: /root/reference/identifiers.go (Identifiers struct
identifiers.go:8-13, ComputeIdentifiers identifiers.go:17-67, isEmbedded
identifiers.go:72-81). Golden behavior pinned by identifiers_test.go:12-105.

The resulting map is the symbol table consumed by ``resolve`` and by the
compiler's ref-inlining pass; it is built once on the driver and (being tiny)
captured in task closures — executors never recompute it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from jsonschema_spark.schema import Schema
from jsonschema_spark.uris import URI, resolve_uri
from jsonschema_spark.walk import Scope, Skip, Walk


@dataclass
class Identifiers:
    base_uri: str = ""
    canon_resource_plain_uri: str = ""
    canon_resource_pointer_uri: str = ""
    enclosing_resource_uris: list[str] = field(default_factory=list)


def compute_identifiers(root: Schema) -> dict[str, Identifiers]:
    """Return all identifiers defined in root's subschemas, excluding root.

    Map key is the JSON pointer to the id-defining schema. Mirrors
    identifiers.go:17-67 including the nested-``$id`` recursion that re-roots
    URI resolution and prefixes enclosing URIs.
    """
    base = root.id
    m: dict[str, Identifiers] = {}

    def fn(scope: Scope, s: Schema) -> object:
        if scope.pointer == "/" or (s.id == "" and s.anchor == ""):
            return None

        ids = Identifiers()
        result = None

        if s.id != "":
            resolved_id = resolve_uri(base, s.id)
            # Recurse with the sub-resource re-rooted at its resolved $id
            # (weak copy: only the id needs to differ).
            sub = _weak_copy_with_id(s, resolved_id)
            m2 = compute_identifiers(sub)
            for k, v in m2.items():
                enc_uri = base + "#" + scope.pointer + k
                v.enclosing_resource_uris.append(enc_uri)
                m[scope.pointer + k] = v

            ids.base_uri = resolved_id
            ids.canon_resource_pointer_uri = ids.base_uri + "#"
            result = Skip
        else:
            ids.base_uri = base
            ids.canon_resource_pointer_uri = ids.base_uri + "#" + scope.pointer

        if s.anchor != "":
            ids.canon_resource_plain_uri = ids.base_uri + "#" + s.anchor

        enc_uri = base + "#" + scope.pointer
        if enc_uri != ids.canon_resource_pointer_uri:
            ids.enclosing_resource_uris.append(enc_uri)

        m[scope.pointer] = ids
        return result

    Walk(root, fn)
    return m


def _weak_copy_with_id(s: Schema, new_id: str) -> Schema:
    """Shallow copy with overridden id (identifiers.go:22-24, 34-36)."""
    from dataclasses import fields as _fields

    out = Schema()
    for f in _fields(Schema):
        setattr(out, f.name, getattr(s, f.name))
    out.id = new_id
    return out


def is_embedded(raw_uri: str, identifiers: dict[str, Identifiers]) -> bool:
    """Whether the root schema resource embeds a resource with this base URI
    (identifiers.go:72-81). Does not check that the fragment target exists.
    """
    uri = URI.parse(raw_uri).without_fragment().string()
    return any(ids.base_uri == uri for ids in identifiers.values())
