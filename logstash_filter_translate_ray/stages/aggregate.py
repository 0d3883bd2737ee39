"""Aggregate stage — per-sink counts, matched/unmatched counters, and the
salted per-conversation aggregate for skewed conv_id distributions.

Scale design (SURVEY §4): a bare ``groupby(key).count()`` shuffles every
row. All aggregates here PRE-AGGREGATE inside ``map_batches`` — each batch
emits one row per key — so the shuffle moves ``O(distinct keys × blocks)``
rows instead of ``O(N)``. For conv_id (Zipf-skewed hot conversations) the
per-batch partials ARE the salt: a hot conversation appearing in B blocks
contributes B partial rows regardless of its row count, so no single
reducer sees more than B rows per key (the explicit
salted-repartition of the north_rule, realized combiner-style).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import ray
from ray.data.aggregate import Sum


NULL_LABEL = "(null)"   # null group keys → label (Ray's sort-shuffle groupby
                        # can't order null keys; oracle SQL uses COALESCE)


def _partial_counts(keys: Sequence[str], count_name: str):
    import pyarrow.compute as pc

    def _fn(batch: pa.Table) -> pa.Table:
        sub = batch.select(list(keys))
        for i, k in enumerate(keys):
            col = sub[k]
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                sub = sub.set_column(i, k, pc.fill_null(col, NULL_LABEL))
        return sub.group_by(list(keys)).aggregate([([], "count_all")]) \
            .rename_columns(list(keys) + [count_name])
    return _fn


def grouped_counts(ds: "ray.data.Dataset", keys: Sequence[str],
                   count_name: str = "n") -> "ray.data.Dataset":
    """Two-phase (combiner + small shuffle) grouped row count."""
    partial = ds.map_batches(_partial_counts(keys, count_name),
                             batch_format="pyarrow", batch_size=None)
    return partial.groupby(list(keys)).aggregate(
        Sum(count_name, alias_name=count_name))


def sink_counts(ds: "ray.data.Dataset", route_col: str = "route",
                by: Optional[Sequence[str]] = None) -> "ray.data.Dataset":
    """Per-sink aggregate counts (north_rule 'matching the reference's
    per-sink aggregate counts')."""
    keys = [route_col] + list(by or [])
    return grouped_counts(ds, keys)


def matched_counts(ds: "ray.data.Dataset",
                   matched_col: str = "translate_matched") -> "ray.data.Dataset":
    """matched/unmatched counters — the filter_matched bookkeeping (S15)."""
    return grouped_counts(ds, [matched_col])


def conv_turn_counts(ds: "ray.data.Dataset", conv_col: str = "conv_id") -> "ray.data.Dataset":
    """Turns per conversation; skew-safe via per-batch partials (see module
    docstring for why this is the salted two-phase aggregate)."""
    return grouped_counts(ds, [conv_col], count_name="turns")
