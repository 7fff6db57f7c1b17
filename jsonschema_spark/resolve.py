"""$ref resolution and JSON-pointer evaluation over schema documents.

Reference parity: /root/reference/resolve.go (ResolveConfig resolve.go:11-21,
applyDefaults resolve.go:23-47, ResolveReference resolve.go:52-113, position
formatting resolve.go:115-136, resolveRef resolve.go:138-253, getUnescapedPath
resolve.go:255-269). Error strings mirror the golden oracle in
resolve_test.go:98-144,237-255 verbatim — including the ``strconv.Atoi``
wording — because our compile diagnostics are pinned to the same taxonomy.

In the Spark engine this is pure driver-side compile: ``$ref`` resolution is
view/CTE expansion that happens before Catalyst ever sees an expression.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from jsonschema_spark.loader import Loader, LoaderFunc, LoadResult, new_local_loader
from jsonschema_spark.schema import Schema
from jsonschema_spark.uris import URI

__all__ = ["ResolveConfig", "ResolveError", "resolve_reference", "get_unescaped_path"]


class ResolveError(ValueError):
    pass


@dataclass
class ResolveConfig:
    loader: Optional[Loader] = None

    # internal state (resolve.go:15-20)
    resource: Optional[Schema] = None
    root_resource: Optional[Schema] = None
    root_resource_loader: Optional[Loader] = None
    resource_uri: Optional[URI] = None
    computed_identifiers: Optional[dict] = None
    ignore_refs: bool = False

    def clone(self) -> "ResolveConfig":
        """Configs pass by value in the reference; mimic with shallow copies."""
        return ResolveConfig(
            loader=self.loader,
            resource=self.resource,
            root_resource=self.root_resource,
            root_resource_loader=self.root_resource_loader,
            resource_uri=self.resource_uri,
            computed_identifiers=self.computed_identifiers,
            ignore_refs=self.ignore_refs,
        )


def _no_loader(_uri: URI) -> LoadResult:
    raise ResolveError("no loader configured")


def _apply_defaults(config: ResolveConfig, resource: Schema) -> None:
    """resolve.go:23-47."""
    from jsonschema_spark.identifiers import compute_identifiers

    if config.loader is None:
        config.loader = LoaderFunc(_no_loader)

    if config.resource is None:
        config.resource = resource

    if config.resource_uri is None:
        config.resource_uri = URI.parse(resource.id)

    if config.root_resource is None:
        config.root_resource = resource
        config.root_resource_loader = new_local_loader(resource, None)
        config.computed_identifiers = compute_identifiers(resource)


def resolve_reference(config: ResolveConfig, ref: str, resource: Schema) -> Optional[Schema]:
    """Resolve ``ref`` against ``resource`` (resolve.go:52-113).

    Pointer fragments walk locally; other refs resolve as URIs — embedded
    resources through the root-resource loader, external ones through the
    user loader with a fresh config.
    """
    from jsonschema_spark.identifiers import compute_identifiers, is_embedded

    config = config.clone()
    _apply_defaults(config, resource)

    if resource.id != "":
        config.resource = resource
        config.resource_uri = config.resource_uri.resolve_str(resource.id)
        if config.computed_identifiers is None or not is_embedded(
            resource.id, config.computed_identifiers
        ):
            config.computed_identifiers = compute_identifiers(resource)

    uri = URI.parse(ref)
    is_pointer_reference = len(ref) == 0 or (len(ref) > 2 and ref[0] == "#" and ref[1] == "/")

    if is_pointer_reference:
        path = get_unescaped_path(uri.fragment)
    else:
        uri = config.resource_uri.resolve(uri)
        if is_embedded(uri.string(), config.computed_identifiers):
            ids = None
            for ident in config.computed_identifiers.values():
                if ident.base_uri == uri.string():
                    ids = ident
                    break

            try:
                res = config.root_resource_loader.load(uri)
            except Exception as e:
                raise ResolveError(f"unable to locate embedded resource: {e}") from e

            resource = res.schema
            config.resource = res.schema
            config.resource_uri = URI.parse(ids.base_uri if ids is not None else "")
            uri = res.uri
        else:
            try:
                res = config.loader.load(uri)
            except Exception as e:
                raise ResolveError(
                    f'unable to locate non-embedded resource {{"$id": "{uri.string()}"}}: {e}'
                ) from e
            # Go loaders rewrite the URI in place (EmbeddedLoader strips it to
            # fragment-only, loader.go:42); the recursion sees the rewrite, so
            # the fragment resolves as a local pointer in the loaded document.
            return resolve_reference(
                ResolveConfig(loader=config.loader), res.uri.string(), res.schema
            )

        if uri.path != "":
            path = get_unescaped_path(uri.path)
        else:
            path = get_unescaped_path(uri.fragment)

    config.ignore_refs = True
    return _resolve_ref(config, config.resource, path, 0)


def _fmt_pos(config: ResolveConfig, path: list[str], pos: int) -> str:
    uri_str = config.resource_uri.string() if config.resource_uri is not None else ""
    res = uri_str if uri_str != "" else "<root>"
    return f"{res}{_fmt_ptr_position(path, pos)}"


def _fmt_ptr_position(path: list[str], pos: int) -> str:
    return "#/" + "/".join(path[:pos])


# resolveRef keyword classes (resolve.go:165-251). Note: the reference's outer
# switch does NOT route unevaluatedItems/unevaluatedProperties/contentSchema
# (its inner cases at resolve.go:239-244 are unreachable), so pointers through
# those keywords fail with "unknown keyword" — we mirror that exactly.
_ARRAY_SEGMENTS = {"allOf": "all_of", "anyOf": "any_of", "oneOf": "one_of", "prefixItems": "prefix_items"}
_MAP_SEGMENTS = {
    "$defs": "defs",
    "dependentSchemas": "dependent_schemas",
    "properties": "properties",
    "patternProperties": "pattern_properties",
}
_SINGLE_SEGMENTS = {
    "not": "not_",
    "if": "if_",
    "then": "then",
    "else": "else_",
    "items": "items",
    "contains": "contains",
    "additionalProperties": "additional_properties",
    "propertyNames": "property_names",
}


def _resolve_ref(
    config: ResolveConfig, current: Optional[Schema], path: list[str], pos: int
) -> Optional[Schema]:
    """Walk pointer segments through the schema tree (resolve.go:138-253)."""
    rest = path[pos:]
    if current is None or (len(rest) == 0 and current.ref == ""):
        return current

    config = config.clone()

    if current.id != "":
        config.resource = current
        # A None base mirrors Go's nil resourceURI in the LocalLoader
        # prefetch path: resolution against it only works because schema
        # resource ids at that point are absolute (net/url takes its
        # absolute-ref fast path before dereferencing the nil receiver).
        base = config.resource_uri if config.resource_uri is not None else URI.parse("")
        config.resource_uri = base.resolve_str(current.id)

    if current.ref != "" and (not config.ignore_refs and len(rest) == 0):
        r = current.ref
        try:
            current = resolve_reference(config, current.ref, current)
        except Exception as e:
            raise ResolveError(
                f'failed to resolve {{"$ref": "{r}"}} at "{_fmt_pos(config, path, pos)}": {e}'
            ) from e

    if len(path[pos:]) == 0:
        return current

    config.ignore_refs = False
    segment = path[pos]

    if segment in _ARRAY_SEGMENTS:
        if len(path[pos:]) == 1:
            raise ResolveError(f'missing array index at "{_fmt_pos(config, path, pos + 1)}"')
        next_segment = path[pos + 1]
        col = getattr(current, _ARRAY_SEGMENTS[segment]) or []
        try:
            i = _atoi(next_segment)
        except ValueError as e:
            raise ResolveError(
                f'invalid array index "{next_segment}" at "{_fmt_pos(config, path, pos + 1)}": {e}'
            ) from e
        if len(col) <= i:
            raise ResolveError(
                f'index out of bounds ({i}/{len(col) - 1}) at "{_fmt_pos(config, path, pos + 1)}"'
            )
        return _resolve_ref(config, col[i], path, pos + 2)

    if segment in _MAP_SEGMENTS:
        if len(path[pos:]) == 1:
            raise ResolveError(f'missing key at "{_fmt_pos(config, path, pos + 1)}"')
        col = getattr(current, _MAP_SEGMENTS[segment]) or {}
        key = path[pos + 1]
        if key not in col:
            raise ResolveError(
                f'unknown key "{key}" at "{_fmt_pos(config, path, pos + 1)}"'
            )
        return _resolve_ref(config, col[key], path, pos + 2)

    if segment in _SINGLE_SEGMENTS:
        s = getattr(current, _SINGLE_SEGMENTS[segment])
        if s is None:
            raise ResolveError(f'missing schema at "{_fmt_pos(config, path, pos + 1)}"')
        return _resolve_ref(config, s, path, pos + 1)

    raise ResolveError(f'unknown keyword "{segment}" at "{_fmt_pos(config, path, pos)}"')


def _atoi(s: str) -> int:
    """strconv.Atoi with its exact error wording (pinned by resolve_test.go).

    Stricter than Python's int(): no whitespace, no underscores.
    """
    body = s[1:] if s[:1] in ("+", "-") else s
    if not body or not all("0" <= c <= "9" for c in body):
        raise ValueError(f'strconv.Atoi: parsing "{s}": invalid syntax')
    return int(s, 10)


def get_unescaped_path(ref: str) -> list[str]:
    """Split and ~-unescape a pointer (resolve.go:255-269)."""
    ref = ref[1:] if ref.startswith("/") else ref
    if ref == "":
        return []
    return [seg.replace("~0", "~").replace("~1", "/") for seg in ref.split("/")]
