"""External schema loaders.

Reference parity: /root/reference/loader.go (Loader iface loader.go:17-25,
NewEmbeddedLoader loader.go:31-51, NewLocalLoader loader.go:58-118).

In our engine a loader is the schema-registry hook: schemas ship with the job
(``--py-files`` resources or a local directory); loaders run only during the
driver-side compile, never on executors.
"""

from __future__ import annotations

import json
from decimal import Decimal
from pathlib import Path
from typing import Callable, Optional, Protocol

from jsonschema_spark.identifiers import compute_identifiers, Identifiers
from jsonschema_spark.pointer import is_ncname
from jsonschema_spark.schema import Schema
from jsonschema_spark.uris import URI


class UnsupportedURIError(ValueError):
    """Loader cannot process this URI (loader.go:15)."""

    def __str__(self) -> str:
        return "unsupported URI"


class LoadResult:
    """A loaded schema plus the (possibly rewritten) URI.

    Go loaders mutate the passed ``*url.URL`` in place (loader.go:42,
    loader.go:106-110); we return the rewrite explicitly.
    """

    __slots__ = ("schema", "uri")

    def __init__(self, schema: Optional[Schema], uri: URI):
        self.schema = schema
        self.uri = uri


class Loader(Protocol):
    def load(self, uri: URI) -> LoadResult: ...


class LoaderFunc:
    def __init__(self, fn: Callable[[URI], LoadResult]):
        self._fn = fn

    def load(self, uri: URI) -> LoadResult:
        return self._fn(uri)


def new_embedded_loader(root_dir: str | Path) -> Loader:
    """Loader over a local directory tree, the analogue of Go's ``embed.FS``
    loader (loader.go:31-51). Only ``file`` scheme URIs are supported; the
    URI is rewritten to fragment-only after a successful load.
    """
    root = Path(root_dir)

    def _load(uri: URI) -> LoadResult:
        if uri.scheme != "file":
            raise UnsupportedURIError()
        rel = uri.path.lstrip("/")
        p = root / rel
        try:
            data = p.read_bytes()
        except OSError as e:
            raise FileNotFoundError(f"open {rel}: file does not exist") from e
        try:
            s = Schema.from_value(json.loads(data, parse_float=Decimal))
        except (ValueError, TypeError) as e:
            raise ValueError(f"failed to read schema: {e}") from e
        return LoadResult(s, URI(fragment=uri.fragment, has_fragment=True))

    return LoaderFunc(_load)


def new_local_loader(root: Schema, next_loader: Optional[Loader]) -> Loader:
    """Loader resolving URIs against identifiable sub-resources embedded in
    the root schema (loader.go:58-118). Identifiers are computed and all
    embedded resources prefetched exactly once.
    """
    # Deferred import: resolve imports loader for defaults.
    from jsonschema_spark.resolve import ResolveConfig, _resolve_ref, get_unescaped_path

    ids = compute_identifiers(root)
    ids["/"] = Identifiers(
        base_uri=root.id,
        canon_resource_pointer_uri=root.id + "#",
    )

    prefetched: dict[str, Schema] = {}
    for ptr, identifiers in ids.items():
        if identifiers.base_uri + "#" == identifiers.canon_resource_pointer_uri:
            cfg = ResolveConfig()
            cfg.ignore_refs = True
            prefetched[identifiers.base_uri] = _resolve_ref(
                cfg, root, get_unescaped_path(ptr), 0
            )

    def _load(uri: URI) -> LoadResult:
        b = ""
        r = ""

        # Direct match on a canonical plain (anchor) URI.
        for ident in ids.values():
            if ident.canon_resource_plain_uri == uri.string():
                b = ident.base_uri
                # The pointer in ids is relative to the document root; we
                # need it relative to the resolved resource (loader.go:82-86).
                p = URI.parse(ident.canon_resource_pointer_uri)
                r = p.fragment
                break

        if b == "" and r == "":
            u2 = uri.without_fragment()
            for ident in ids.values():
                if (
                    ident.base_uri + "#" == ident.canon_resource_pointer_uri
                    and ident.base_uri == u2.string()
                ):
                    b = ident.base_uri
                    r = "#" + uri.fragment
                    break

        if len(r) > 1 and is_ncname(r[1:]):
            raise ValueError(f'unknown anchor "{r[1:]}" at "{b}"')

        if b in prefetched and r != "":
            return LoadResult(prefetched[b], URI.parse(r))

        if next_loader is not None:
            return next_loader.load(uri)
        return LoadResult(None, uri)

    return LoaderFunc(_load)
