"""Schema-aware reference-pointer validation.

Reference parity: /root/reference/ptr.go (ValidateReferencePointer ptr.go:21-28,
isNCName ptr.go:30-44, schemaSegmentValidator ptr.go:46-80), golden error
strings pinned by ptr_test.go:8-110.
"""

from __future__ import annotations

from jsonschema_spark import jsonptr

# Sentinel error messages (ptr.go:14,18).
ERR_UNKNOWN_KEYWORD = "unknown keyword"
ERR_NO_SCHEMA = "does not point to schema"


class UnknownKeywordError(ValueError):
    def __str__(self) -> str:
        return ERR_UNKNOWN_KEYWORD


class NoSchemaError(ValueError):
    def __str__(self) -> str:
        return ERR_NO_SCHEMA


# Keyword taxonomy from schemaSegmentValidator (ptr.go:46-80) — the canonical
# keyword classes also used by the resolver and the compiler.
CONTAINER_KEYWORDS_ARRAY = ("allOf", "anyOf", "oneOf", "prefixItems")
CONTAINER_KEYWORDS_MAP = ("$defs", "dependentSchemas", "properties", "patternProperties")
SINGLE_SCHEMA_KEYWORDS = (
    "not",
    "if",
    "then",
    "else",
    "items",
    "contains",
    "additionalProperties",
    "propertyNames",
    "unevaluatedItems",
    "unevaluatedProperties",
    "contentSchema",
)


def is_ncname(s: str) -> bool:
    """NCName check for ``$anchor`` fragments (ptr.go:30-44).

    Letters/digits/underscore anywhere; '-' and '.' allowed except first.
    Mirrors the reference, including: empty string returns True.
    """
    for i, ch in enumerate(s):
        is_number = "0" <= ch <= "9"
        is_letter = ("A" <= ch <= "Z") or ("a" <= ch <= "z")
        if not is_letter and not is_number and ch != "_":
            if i > 0 and ch in ("-", "."):
                continue
            return False
    return True


def schema_segment_validator(i: int, segments: list[str]) -> None:
    """Per-segment keyword check (ptr.go:46-80); raises jsonptr.SegmentError."""
    segment = segments[i]
    if segment in CONTAINER_KEYWORDS_ARRAY or segment in CONTAINER_KEYWORDS_MAP:
        if i >= len(segments) - 1:
            raise jsonptr.SegmentError(segment, i, NoSchemaError())
        return
    if segment in SINGLE_SCHEMA_KEYWORDS:
        return

    if i > 0:
        prev = segments[i - 1]
        if prev in CONTAINER_KEYWORDS_MAP:
            return
        if prev in CONTAINER_KEYWORDS_ARRAY:
            if not jsonptr.is_array_index(segment):
                raise jsonptr.SegmentError(segment, i, jsonptr.InvalidIndexError(segment))
            return

    raise jsonptr.SegmentError(segment, i, UnknownKeywordError())


def validate_reference_pointer(ref: str) -> None:
    """Validate a schema ``$ref`` pointer (ptr.go:21-28).

    ``#name`` anchors pass the NCName rule; everything else (with a leading
    ``#`` stripped) must be an RFC 6901 pointer whose segments follow the
    schema keyword grammar. Raises on invalid input.
    """
    if len(ref) > 1 and ref[0] == "#":
        ref = ref[1:]
        if is_ncname(ref):
            return
    jsonptr.validate_json_pointer(ref, schema_segment_validator)
