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

Passed through (Python 3.11 supports them natively, same semantics):
possessive quantifiers ``*+ ++ ?+ {m,n}+``, atomic groups ``(?>…)``,
``\\A``, inline flags ``(?i:…)``.

Rejected (no faithful Python equivalent):
``\\g<…>`` subroutine calls, ``(?~…)`` absence operator, ``\\k<name±n>``
backrefs with recursion level, negated POSIX classes ``[[:^alpha:]]``.
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
        if c == "[" and not in_class:
            in_class = True
            out.append(c)
            i += 1
            continue
        if c == "]" and in_class:
            in_class = False
            out.append(c)
            i += 1
            continue
        if c == "(" and not in_class and pattern.startswith("(?~", i):
            raise ConfigurationError(
                "Ruby '(?~…)' absence operator has no Python equivalent")
        if c == "(" and not in_class and pattern.startswith("(?<", i) \
                and i + 3 < n and pattern[i + 3] not in "=!":
            out.append("(?P<")
            i += 3
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
