"""Parse stage — vectorized grok-lite regex extraction over string columns.

The reference plugin does no parsing (Logstash's grok does); the north-star
DAG needs a parse step in front of the translate/enrich stage (SURVEY §3.4).
Implemented as stateless ``map_batches`` with patterns compiled ONCE at
stage-build time and executed with Arrow's RE2 kernels
(``pc.extract_regex`` / ``pc.match_substring_regex``) — zero Python per row.
Patterns RE2 can't compile fall back to Python ``re`` applied per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass(frozen=True)
class ExtractRule:
    """Extract the first match of ``pattern`` group ``group`` from column
    ``source`` into new column ``out`` (null on no match)."""
    out: str
    source: str
    pattern: str          # must contain exactly one capture group
    cast: Optional[str] = None  # arrow type name to cast the capture to


@dataclass(frozen=True)
class GrokRule:
    """Grok-style multi-capture rule: a pattern with NAMED groups
    (``(?P<a>..)...(?P<b>..)``) extracting several columns from one column
    in a single RE2 pass (``pc.extract_regex`` returns a struct; each named
    group becomes a column, all-null on non-matching rows)."""
    source: str
    pattern: str          # named groups only
    casts: tuple = ()     # optional ((group, arrow_type_name), ...)


@dataclass(frozen=True)
class ParseConfig:
    rules: tuple = ()

    @staticmethod
    def transcripts() -> "ParseConfig":
        """Default transcript parse: status codes + sentiment-ish token from
        ``text``, normalized tool token from ``tool``."""
        return ParseConfig(rules=(
            ExtractRule(out="status", source="text",
                        pattern=r"\b([1-5][0-9]{2})\b"),
            ExtractRule(out="word", source="text",
                        pattern=r"\b(merci|thanks|error|retry|ok)\b"),
            ExtractRule(out="tool_norm", source="tool", pattern=r"^\s*([a-z_]+)"),
        ))


def _compile_plan(cfg: ParseConfig):
    """Pre-validate rules against RE2; mark the ones needing Python re."""
    plan = []
    probe = pa.array([], type=pa.string())
    for r in cfg.rules:
        if isinstance(r, GrokRule):
            pc.extract_regex(probe, pattern=r.pattern)   # raises on bad RE2
            plan.append((r, r.pattern, None))
            continue
        # pc.extract_regex needs a named group
        named = re.sub(r"\((?!\?)", f"(?P<{r.out}>", r.pattern, count=1)
        try:
            pc.extract_regex(probe, pattern=named)
            plan.append((r, named, None))
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            plan.append((r, None, re.compile(r.pattern)))
    return plan


def parse_batch(tbl: pa.Table, plan) -> pa.Table:
    for rule, named, pyre in plan:
        if isinstance(rule, GrokRule):
            tbl = _apply_grok(tbl, rule)
            continue
        if rule.source not in tbl.column_names:
            tbl = tbl.append_column(rule.out, pa.nulls(len(tbl), pa.string()))
            continue
        col = tbl[rule.source]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if named is not None:
            ext = pc.extract_regex(col, pattern=named)
            vals = pc.struct_field(ext, rule.out)
        else:
            src = col.to_numpy(zero_copy_only=False)
            out = np.full(len(tbl), None, dtype=object)
            for i, s in enumerate(src):
                if s is not None:
                    m = pyre.search(s)
                    if m:
                        out[i] = m.group(1)
            vals = pa.array(out, type=pa.string())
        if rule.cast:
            vals = pc.cast(vals, rule.cast)
        tbl = tbl.append_column(rule.out, vals)
    return tbl


def _apply_grok(tbl: pa.Table, rule: "GrokRule") -> pa.Table:
    group_names = re.findall(r"\(\?P<([^>]+)>", rule.pattern)
    casts = dict(rule.casts)
    if rule.source not in tbl.column_names:
        for g in group_names:
            tbl = tbl.append_column(g, pa.nulls(len(tbl),
                                                casts.get(g, pa.string())))
        return tbl
    col = tbl[rule.source]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    ext = pc.extract_regex(col, pattern=rule.pattern)   # one RE2 pass
    for g in group_names:
        vals = pc.struct_field(ext, g)
        if g in casts:
            vals = pc.cast(vals, casts[g])
        tbl = tbl.append_column(g, vals)
    return tbl


def parse_dataset(ds: "ray.data.Dataset", cfg: Optional[ParseConfig] = None,
                  batch_size: Optional[int] = None) -> "ray.data.Dataset":
    cfg = cfg or ParseConfig.transcripts()
    plan = _compile_plan(cfg)

    def _fn(batch: pa.Table) -> pa.Table:
        return parse_batch(batch, plan)

    # None ⇒ whole blocks (avoid Ray's 1024-row default micro-batching)
    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size)
