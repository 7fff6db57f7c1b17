"""Minimal URI helpers mirroring the parts of Go's ``net/url`` the reference
relies on (parse, ResolveReference, fragment handling, String round-trip).

Only driver-side compile code uses this; nothing here touches row data.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from urllib.parse import urljoin, urlsplit


@dataclass(frozen=True)
class URI:
    scheme: str = ""
    netloc: str = ""
    path: str = ""
    query: str = ""
    fragment: str = ""
    has_fragment: bool = False

    @classmethod
    def parse(cls, raw: str) -> "URI":
        parts = urlsplit(raw)
        # urn:uuid:... parses with everything in path under scheme 'urn'.
        return cls(
            scheme=parts.scheme,
            netloc=parts.netloc,
            path=parts.path,
            query=parts.query,
            fragment=parts.fragment,
            has_fragment="#" in raw,
        )

    def string(self) -> str:
        out = ""
        if self.scheme:
            out += self.scheme + ":"
        if self.netloc or self.scheme in ("http", "https", "file", "ftp"):
            out += "//" + self.netloc
        out += self.path
        if self.query:
            out += "?" + self.query
        if self.fragment:
            out += "#" + self.fragment
        return out

    def resolve(self, ref: "URI") -> "URI":
        """RFC 3986 resolution, Go ``base.ResolveReference(ref)``."""
        base = self.string()
        if not base:
            return ref
        target = ref.string()
        if not target and not ref.has_fragment:
            # Go resolves an empty ref to the base sans fragment.
            return replace(self.without_fragment(), has_fragment=False)
        return URI.parse(urljoin(base, target))

    def resolve_str(self, ref: str) -> "URI":
        return self.resolve(URI.parse(ref))

    def without_fragment(self) -> "URI":
        return replace(self, fragment="", has_fragment=False)


def resolve_uri(base: str, ref: str) -> str:
    """Resolve ``ref`` against ``base``; either may be empty."""
    if not base:
        return ref
    if not ref:
        return URI.parse(base).without_fragment().string()
    return urljoin(base, ref)
