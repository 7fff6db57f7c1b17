"""Compile-time lint for the regex dialect of ``pattern`` /
``patternProperties`` / ``propertyNames.pattern``.

JSON Schema specifies ECMA-262 regexes; Spark's ``rlike`` evaluates
java.util.regex and the DuckDB oracles evaluate RE2. The engine
therefore documents a COMMON SUBSET (SURVEY §2B) and this lint rejects
anything outside it at compile time with a clear diagnostic — the
alternative is a pattern that silently matches differently between
engines (VERDICT r2 "What's missing" item 5).

Rejected constructs (not in RE2 ∩ java.util.regex, or differing
semantics):

- lookaround            ``(?=``  ``(?!``  ``(?<=``  ``(?<!``  (RE2: none)
- backreferences        ``\\1``..``\\9``, ``\\k<name>``       (RE2: none)
- atomic groups         ``(?>``                               (Java only)
- conditionals          ``(?(``                               (neither, loud)
- named groups          ``(?<name>`` (Java spelling) / ``(?P<name>`` (RE2
                        spelling) — each is a syntax error in the OTHER engine
- possessive quantifiers ``*+`` ``++`` ``?+`` ``{m,n}+``      (Java only)
- char-class intersection ``&&`` inside ``[...]``             (Java only)
- inline flags other than ``i``/``m``/``s``                   (x/u/d/U differ)
- ``\\Z`` ``\\G`` ``\\K`` ``\\R`` ``\\X`` ``\\g``             (dialect-specific)

Allowed: everything else both engines share — literals, ``.``, anchors
``^ $ \\A \\z``, classes ``[...]`` (no ``&&``), POSIX/perl classes
(``\\d \\w \\s \\b`` + negations, ``\\p{...}`` names common to both),
alternation, greedy/lazy quantifiers, plain + non-capturing groups,
``(?i)``-style flags for i/m/s.

Reference note: the Go reference (mark-hartmann/jsonschema) stores
patterns verbatim and never evaluates them (schema model only); the
evaluation dialect problem is introduced by OUR executor, so the lint
is engine surface, not reference parity.
"""

from __future__ import annotations

import re
import warnings


class RegexSubsetError(ValueError):
    """Pattern uses a construct outside the documented RE2∩Java subset."""


class RegexSubsetWarning(UserWarning):
    """Non-strict compile: pattern is outside the subset but the schema
    author opted out of rejection (CompileOptions.strict=False) — the
    pattern may evaluate differently (or fail) at runtime."""


_INLINE_FLAGS_OK = set("ims")


def lint_pattern(
    pattern: str, where: str = "pattern", strict: bool = True
) -> None:
    """Raise RegexSubsetError if ``pattern`` is outside the documented
    cross-engine subset; otherwise return None. Also rejects patterns
    that do not compile at all. With ``strict=False`` (the
    CompileOptions.strict opt-out) subset violations downgrade to a
    RegexSubsetWarning — the schema compiles, the dialect risk is the
    author's."""
    if not strict:
        try:
            _lint(pattern, where)
        except RegexSubsetError as e:
            warnings.warn(str(e), RegexSubsetWarning, stacklevel=2)
        return
    _lint(pattern, where)


def _lint(pattern: str, where: str) -> None:

    def bad(construct: str, at: int) -> None:
        raise RegexSubsetError(
            f"{where}: regex {pattern!r} uses {construct} at position "
            f"{at}, which is outside the documented RE2∩Java subset "
            f"this engine evaluates identically in Spark (java.util."
            f"regex) and its oracles (RE2). Rewrite without it."
        )

    i = 0
    n = len(pattern)
    in_class = False
    prev_quant_ok = False  # previous token can take a quantifier
    while i < n:
        ch = pattern[i]
        if ch == "\\":
            if i + 1 >= n:
                bad("a trailing backslash", i)
            nxt = pattern[i + 1]
            if not in_class and nxt.isdigit() and nxt != "0":
                bad(f"a backreference \\{nxt}", i)
            if nxt in "kgGZKRX":
                bad(f"the dialect-specific escape \\{nxt}", i)
            if nxt in "pP" and not in_class:
                # \p{Name} / \P{Name} / single-letter \pL — consume the
                # whole construct so its '{' never reaches the brace lint
                if i + 2 < n and pattern[i + 2] == "{":
                    j = pattern.find("}", i + 3)
                    if j == -1:
                        bad(f"an unterminated \\{nxt}{{...}}", i)
                    i = j + 1
                else:
                    i += 3
                prev_quant_ok = True
                continue
            i += 2
            prev_quant_ok = True
            continue
        if in_class:
            if ch == "&" and i + 1 < n and pattern[i + 1] == "&":
                bad("character-class intersection '&&'", i)
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
            i += 1
            # leading ^ / ] literals
            if i < n and pattern[i] == "^":
                i += 1
            if i < n and pattern[i] == "]":
                i += 1
            prev_quant_ok = True
            continue
        if ch == "(":
            if pattern.startswith("(?", i):
                rest = pattern[i + 2 : i + 4]
                if rest[:1] in ("=", "!"):
                    bad("lookahead '(?=' / '(?!'", i)
                if rest[:2] in ("<=", "<!"):
                    bad("lookbehind '(?<=' / '(?<!'", i)
                if rest[:1] == ">":
                    bad("an atomic group '(?>'", i)
                if rest[:1] == "(":
                    bad("a conditional group '(?('", i)
                if rest[:1] == "P":
                    bad("an RE2-spelling named group '(?P<'", i)
                if rest[:1] == "<":
                    bad("a Java-spelling named group '(?<name>'", i)
                # inline flags: (?flags) or (?flags:...) or (?-flags...)
                j = i + 2
                while j < n and pattern[j] in "imsxuUd-":
                    if pattern[j] not in "-" and pattern[j] not in _INLINE_FLAGS_OK:
                        bad(f"the inline flag '{pattern[j]}'", j)
                    j += 1
                if j >= n or pattern[j] not in "):":
                    bad("an unrecognized '(?' group", i)
                i = j + 1
                prev_quant_ok = False
                continue
            i += 1
            prev_quant_ok = False
            continue
        if ch in "*?" or ch == "+":
            # possessive: quantifier followed by '+'
            if i + 1 < n and pattern[i + 1] == "+":
                bad(f"a possessive quantifier '{ch}+'", i)
            i += 1
            prev_quant_ok = False
            continue
        if ch == "{":
            j = pattern.find("}", i)
            body = pattern[i + 1 : j] if j != -1 else ""
            if j != -1 and re.fullmatch(r"\d+(,\d*)?", body):
                # a real {m}/{m,}/{m,n} quantifier — possessive if
                # followed by '+'; Java rejects a quantifier with no
                # preceding token where RE2/Python read a literal
                if j + 1 < n and pattern[j + 1] == "+":
                    bad("a possessive quantifier '{m,n}+'", i)
                if not prev_quant_ok:
                    bad("a quantifier '{...}' with nothing to repeat "
                        "(java.util.regex rejects it; escape as \\{)", i)
                i = j + 1
                prev_quant_ok = False
                continue
            # an unescaped '{' NOT forming a valid quantifier: Java
            # throws 'Illegal repetition' at rlike time for bodies like
            # '{,5}', '{}' or an unclosed '{' while RE2/Python silently
            # match it literally — the exact cross-engine divergence
            # this lint exists to reject. Escape as \{ for a literal.
            bad("a bare '{' not forming a valid {m}/{m,}/{m,n} "
                "quantifier (java.util.regex 'Illegal repetition'; "
                "escape as \\{)", i)
        i += 1
        prev_quant_ok = ch not in "|^$"
    if in_class:
        bad("an unterminated character class", n - 1)
    try:
        # syntactic sanity check via Python re (close to the common
        # subset); \p{...}/\P{...} are shared by Java+RE2 but absent
        # from Python re — substitute a plain class first
        re.compile(
            re.sub(r"\\[pP](\{[^}]*\}|[A-Za-z])", "[a-z]", pattern)
        )
    except re.error as e:
        raise RegexSubsetError(
            f"{where}: regex {pattern!r} does not compile: {e}"
        ) from e
