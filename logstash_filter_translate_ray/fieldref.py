"""Logstash-style field references for row-oriented (dict) events.

The reference addresses event fields as ``"status"`` or nested
``"[foo][0][baz]"`` (see ``array_of_maps_value_update.rb:23-25``, which
composes ``"#{@iterate_on}[#{index}]#{@field}"``). This module parses
those references and implements get / set / include? over plain Python
dict/list events — used by the row oracle and the conformance tests.

The columnar kernels (kernel.py) use top-level column names and struct
child paths instead; `parse_field_ref` is shared.
"""

from __future__ import annotations

import re
from typing import Any

_BRACKET = re.compile(r"\[([^\[\]]*)\]")

_SENTINEL = object()


def parse_field_ref(ref: str) -> list[str | int]:
    """``"[foo][0][baz]"`` → ``["foo", 0, "baz"]``; ``"status"`` → ``["status"]``.

    Integer-looking segments become ints (list indices). A bracketed ref
    must be a pure run of ``[seg]`` groups with non-empty segments —
    ``[foo]bar[baz]`` or ``[]`` silently ADDRESSED THE WRONG FIELD before
    (findall dropped the stray text); Logstash's strict field-reference
    parser errors, so we do too (review r4).
    """
    if ref.startswith("[") and ref.endswith("]"):
        if not re.fullmatch(r"(?:\[[^\[\]]+\])+", ref):
            from .errors import ConfigurationError
            raise ConfigurationError(
                f"malformed field reference {ref!r}: expected "
                "[seg][seg]... with non-empty segments")
        parts: list[str | int] = []
        for seg in _BRACKET.findall(ref):
            parts.append(int(seg) if re.fullmatch(r"-?\d+", seg) else seg)
        return parts
    return [ref]


def event_get(event: dict, ref: str) -> Any:
    """event.get(ref) — None when the path is absent."""
    cur: Any = event
    for part in parse_field_ref(ref):
        if isinstance(part, int):
            if not isinstance(cur, list) or not (-len(cur) <= part < len(cur)):
                return None
            cur = cur[part]
        else:
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
    return cur


def event_include(event: dict, ref: str, nil_present: bool = False) -> bool:
    """event.include?(ref) — presence check.

    Engine convention (SURVEY §2.5 S1 note, hard part (b)): in the
    fixed-schema columnar model "field absent" ⇔ null cell, so a
    present-but-None value counts as ABSENT by default — keeping the row
    oracle and the Arrow kernel bit-identical. With ``nil_present=True``
    (the opt-in ``TranslateConfig.nil_is_present`` mode) a key that EXISTS
    with a None value counts as present, exactly LogStash's
    ``Event#include?`` (single_value_update.rb:29-31).
    """
    cur: Any = event
    parts = parse_field_ref(ref)
    for part in parts:
        if isinstance(part, int):
            if not isinstance(cur, list) or not (-len(cur) <= part < len(cur)):
                return False
            cur = cur[part]
        else:
            if not isinstance(cur, dict) or part not in cur:
                return False
            cur = cur[part]
    return nil_present or cur is not None


def event_set(event: dict, ref: str, value: Any) -> None:
    """event.set(ref, value) — creates intermediate dicts; list indices must
    already exist (the reference only ever sets into existing array slots)."""
    parts = parse_field_ref(ref)
    cur: Any = event
    for part in parts[:-1]:
        if isinstance(part, int):
            cur = cur[part]
        else:
            if not isinstance(cur, dict):
                raise TypeError(f"cannot set {ref!r}: non-map intermediate")
            if part not in cur or not isinstance(cur[part], (dict, list)):
                cur[part] = {}
            cur = cur[part]
    cur[parts[-1]] = value
