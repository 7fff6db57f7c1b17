"""RFC 6901 JSON-pointer validation.

Reference parity: /root/reference/jsonptr/ptr.go — including the exact error
message wording (golden strings pinned by jsonptr/ptr_test.go:9-97), because
our violation records reuse the same error taxonomy.
"""

from __future__ import annotations

from typing import Callable, Optional


class JSONPointerError(ValueError):
    """Base class for all pointer errors."""


class SegmentError(JSONPointerError):
    """An error in one segment of a path (jsonptr/ptr.go:10-29)."""

    def __init__(self, seg: str, pos: int, err: Exception):
        self.seg = seg
        self.pos = pos
        self.err = err
        super().__init__(f'invalid segment "{seg}": {err}')

    def unwrap(self) -> Exception:
        return self.err


class EscapeSequenceError(JSONPointerError):
    """A tilde not followed by 0 or 1 (jsonptr/ptr.go:34-38)."""

    def __init__(self, seq: str):
        self.seq = seq
        super().__init__(f"invalid escape sequence: {seq}")


class InvalidJSONPointerError(JSONPointerError):
    """The pointer does not start with '/' (jsonptr/ptr.go:40-44)."""

    def __init__(self, pointer: str):
        self.pointer = pointer
        super().__init__(f"invalid JSON pointer: {pointer}")


class InvalidIndexError(JSONPointerError):
    """A segment that must be an array index is not (jsonptr/ptr.go:46-50)."""

    def __init__(self, segment: str):
        self.segment = segment
        super().__init__(f'invalid array index: "{segment}"')


def validate_json_pointer(
    pointer: str,
    fn: Optional[Callable[[int, list[str]], None]] = None,
) -> None:
    """Validate ``pointer`` per RFC 6901 (jsonptr/ptr.go:56-95).

    ``fn(i, segments)`` is called after each segment passes escape validation;
    it may raise to abort. All segments are treated as object properties —
    array indices must be checked by ``fn``. Raises on invalid input, returns
    None when valid (the Go nil-error contract).
    """
    if len(pointer) == 0 or pointer == "/":
        return

    if pointer[0] != "/":
        raise InvalidJSONPointerError(pointer)

    # First char is "/" so drop the first empty split; later "//" stays valid.
    path = pointer[1:].split("/")

    for i, segment in enumerate(path):
        token = segment
        n = len(token)
        for j in range(n):
            if token[j] != "~" or (j < n - 1 and token[j + 1] in ("0", "1")):
                continue
            s = token[j] if j == n - 1 else token[j : j + 2]
            raise SegmentError(segment, i, EscapeSequenceError(s))

        if fn is not None:
            fn(i, path)


def is_array_index(segment: str) -> bool:
    """True if ``segment`` is a valid pointer array index (jsonptr/ptr.go:98-110).

    No leading zeros except the single digit "0"; digits only. NOTE: the
    empty segment returns True, mirroring the reference exactly (its loop
    body never executes), which is what makes ``#/anyOf/`` a valid pointer
    (ptr_test.go "anyOf without index but /").
    """
    if segment == "0":
        return True
    for j, ch in enumerate(segment):
        if (j == 0 and ch == "0") or not ("0" <= ch <= "9"):
            return False
    return True
