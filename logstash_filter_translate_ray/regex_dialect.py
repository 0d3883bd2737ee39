"""Ruby (Onigmo) → Python ``re`` regex dialect shim for ExactRegex keys.

The reference compiles regex dictionary KEYS with Ruby's ``Regexp.new``
(lib/logstash/filters/fetch_strategy/memory.rb:21-23), whose dialect
differs from Python's ``re`` in a few constructs that would otherwise
compile DIFFERENTLY (silent divergence) or raise confusing errors.
:func:`ruby_regex_to_python` translates the translatable constructs and
REJECTS the rest with a :class:`ConfigurationError` naming the offending
construct — a reference config either behaves identically or fails loudly,
never silently diverges.

Translated:
- ``\\h`` / ``\\H``     → ``[0-9a-fA-F]`` / ``[^0-9a-fA-F]`` (hex digit —
  Python ``re`` has no ``\\h``; unescaped it would match a literal 'h')
- ``\\z``             → ``\\Z``   (absolute end; Python's ``\\Z``)
- ``\\Z``             → ``(?=\\n?\\Z)`` (Ruby: end, before a final newline)
- ``(?<name>…)``      → ``(?P<name>…)`` (named group; lookbehind untouched)
- ``\\k<name>``        → ``(?P=name)`` (named backref)
- ``[[:alpha:]]`` etc. → ASCII expansions (POSIX bracket classes)
- inline flag ``m``    → ``s`` (Ruby ``m`` is DOT-ALL — Onigmo MULTILINE —
  not Python's line-anchor MULTILINE; ``(?m)a.b`` must keep matching
  "a\\nb"); Onigmo ``a``/``d`` options drop (the shim compiles ``re.ASCII``
  already)

Passed through (Python 3.11 supports them natively, same semantics):
possessive quantifiers ``*+ ++ ?+ {m,n}+``, atomic groups ``(?>…)``,
``\\A``, inline flags ``(?i:…)``.

Rejected (no faithful Python equivalent):
``\\g<…>`` subroutine calls, ``(?~…)`` absence operator, ``\\k<name±n>``
backrefs with recursion level, negated POSIX classes ``[[:^alpha:]]``,
character-class intersection ``[a&&b]`` and nested classes ``[a[bc]]``
(Python silently parses both as a different class), ``(?u)``.
"""

from __future__ import annotations

import re

from .errors import ConfigurationError

_POSIX_CLASSES = {
    "alpha": "a-zA-Z",
    "digit": "0-9",
    "alnum": "0-9a-zA-Z",
    "upper": "A-Z",
    "lower": "a-z",
    "space": r" \t\r\n\v\f",
    "blank": r" \t",
    "xdigit": "0-9a-fA-F",
    "word": r"0-9a-zA-Z_",
    "punct": r"!-/:-@\[-`{-~",
    "cntrl": r"\x00-\x1f\x7f",
    "graph": r"!-~",
    "print": r" -~",
}


def ruby_regex_to_python(pattern: str) -> str:
    """Translate a Ruby (Onigmo) regex to an equivalent Python ``re``
    pattern, or raise :class:`ConfigurationError` for constructs with no
    faithful translation. The result is also valid RE2 for the common
    subset, so the vectorized Arrow path keeps working."""
    out: list[str] = []
    i, n = 0, len(pattern)
    in_class = False
    class_opened = -2
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "h":
                out.append("0-9a-fA-F" if in_class else "[0-9a-fA-F]")
                i += 2
                continue
            if nxt == "H":
                if in_class:
                    raise ConfigurationError(
                        r"Ruby '\H' inside a character class has no Python "
                        "equivalent")
                out.append("[^0-9a-fA-F]")
                i += 2
                continue
            if not in_class and nxt == "z":
                out.append(r"\Z")
                i += 2
                continue
            if not in_class and nxt == "Z":
                out.append("(?=\\n?\\Z)")
                i += 2
                continue
            if not in_class and nxt == "k" and i + 2 < n and pattern[i + 2] == "<":
                j = pattern.find(">", i + 3)
                if j == -1:
                    raise ConfigurationError(r"unterminated '\k<' backref")
                name = pattern[i + 3:j]
                if any(ch in name for ch in "+-"):
                    raise ConfigurationError(
                        rf"Ruby '\k<{name}>' recursion-level backref has no "
                        "Python equivalent")
                if name.isdigit():
                    # Ruby numeric backref \k<1> == \1 (review r3: the
                    # (?P=1) form is an invalid Python group name)
                    out.append(f"\\{int(name)}")
                else:
                    out.append(f"(?P={name})")
                i = j + 1
                continue
            if not in_class and nxt == "g" and i + 2 < n and pattern[i + 2] in "<'":
                raise ConfigurationError(
                    r"Ruby '\g<…>' subroutine call has no Python equivalent")
            out.append(c + nxt)
            i += 2
            continue
        if in_class and pattern.startswith("&&", i):
            raise ConfigurationError(
                "Onigmo character-class intersection '&&' has no Python "
                "equivalent (Python reads the class completely differently)")
        if in_class and pattern.startswith("[:", i):
            j = pattern.find(":]", i)
            if j != -1:
                name = pattern[i + 2:j]
                if name.startswith("^"):
                    raise ConfigurationError(
                        f"negated POSIX class [[:{name}:]] has no Python "
                        "equivalent")
                if name not in _POSIX_CLASSES:
                    raise ConfigurationError(
                        f"unknown POSIX class [[:{name}:]]")
                out.append(_POSIX_CLASSES[name])
                i = j + 2
                continue
        if c == "[" and in_class:
            # Onigmo nests character classes ([a[bc]] is a union); Python
            # reads the inner '[' as a literal and the class ends at the
            # FIRST ']' — silent divergence either way, so fail loudly
            raise ConfigurationError(
                "'[' inside a character class: Onigmo set nesting has no "
                r"Python equivalent — escape a literal '[' as '\['")
        if c == "[" and not in_class:
            in_class = True
            class_opened = i        # ']' right after '[' or '[^' is literal
            out.append(c)
            i += 1
            continue
        if c == "]" and in_class:
            at_start = (i == class_opened + 1
                        or (i == class_opened + 2
                            and pattern[class_opened + 1] == "^"))
            out.append(c)
            i += 1
            if not at_start:        # ']' first-in-class stays a literal
                in_class = False    # (both dialects agree)
            continue
        if c == "(" and not in_class and pattern.startswith("(?~", i):
            raise ConfigurationError(
                "Ruby '(?~…)' absence operator has no Python equivalent")
        if c == "(" and not in_class and pattern.startswith("(?<", i) \
                and i + 3 < n and pattern[i + 3] not in "=!":
            out.append("(?P<")
            i += 3
            continue
        if c == "(" and not in_class and i + 1 < n and pattern[i + 1] == "?":
            # inline flag groups: Ruby 'm' means DOT-ALL (Python/RE2 's');
            # passing it through silently compiled to MULTILINE — the
            # exact silent divergence this module exists to prevent
            fm = re.match(r"\(\?([adimsux]+)?(?:-([imx]+))?([):])",
                          pattern[i:])
            if fm and (fm.group(1) or fm.group(2)):
                on, off, close = fm.group(1) or "", fm.group(2) or "", \
                    fm.group(3)
                if "u" in on:
                    raise ConfigurationError(
                        "Onigmo '(?u)' unicode-class option conflicts with "
                        "the reference's ASCII matching semantics")
                if "s" in on:
                    raise ConfigurationError(
                        "'(?s)' is not a Ruby (Onigmo) flag — Ruby dot-all "
                        "is 'm'")
                # m → s; a/d → drop (the shim already compiles re.ASCII,
                # Onigmo's default semantics here)
                on_t = "".join("s" if ch == "m" else ch
                               for ch in on if ch not in "ad")
                off_t = "".join("s" if ch == "m" else ch for ch in off)
                flags = on_t + (f"-{off_t}" if off_t else "")
                if flags:
                    out.append(f"(?{flags}{close}")
                elif close == ":":
                    out.append("(?:")
                # flags-only group that translated to nothing: emit nothing
                i += fm.end()
                continue
        out.append(c)
        i += 1
    return "".join(out)


def compile_ruby_regex(key: str) -> "re.Pattern":
    """Translate + compile a regex dictionary key; errors name the key."""
    try:
        translated = ruby_regex_to_python(key)
    except ConfigurationError as e:
        raise ConfigurationError(f"regex dictionary key {key!r}: {e}")
    try:
        # Ruby semantics (review r3): ^/$ are LINE anchors (MULTILINE) and
        # \d/\w/\s/\b are ASCII-only (ASCII) — also what RE2 does by
        # default, so the Python fallback and the Arrow kernels agree.
        return re.compile(translated, re.MULTILINE | re.ASCII)
    except re.error as e:
        raise ConfigurationError(f"invalid regex dictionary key {key!r}: {e}")
