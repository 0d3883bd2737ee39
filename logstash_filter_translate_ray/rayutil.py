"""Small shared Ray Data helpers.

``anchor_empty_schema`` works around a Ray 2.49 behavior: when the input to
``groupby(...).map_groups(fn)`` is EMPTY, ``fn`` is never called and the
resulting dataset has no schema at all (``schema() is None``) — a fully
filtered pipeline then loses its column list at the sink (``to_pandas()``
returns a 0-column frame, ``write_parquet`` an empty directory with no
schema). Unioning a zero-row block of the declared output schema is a data
no-op and a schema anchor for the empty case.

The anchor schema must EXACTLY match the non-empty output's block types:
Arrow/pandas concatenation would otherwise silently promote (e.g. an int64
result column unified with a float64 anchor comes back float64, changing
the driver's value hash). Callers therefore derive the anchor from the
input dataset's fetched schema or from the same literal types their group
fn emits — never from a guess.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa


def input_arrow_schema(ds) -> Optional[pa.Schema]:
    """The dataset's arrow schema, executing at most ONE upstream block
    (``fetch_if_missing=True``); None when it cannot be resolved. Call this
    on pre-shuffle datasets only — on a groupby/sort output the first block
    costs the whole exchange."""
    try:
        sch = ds.schema(fetch_if_missing=True)
    except Exception:
        return None
    base = getattr(sch, "base_schema", sch)
    return base if isinstance(base, pa.Schema) else None


def anchor_empty_schema(out_ds, schema: Optional[pa.Schema]):
    """Union a zero-row block of ``schema`` onto ``out_ds`` (see module
    docstring). ``schema=None`` (resolution failed) is a pass-through."""
    if schema is None:
        return out_ds
    import ray.data as rd

    return out_ds.union(rd.from_arrow(schema.empty_table()))


def anchor_from_input(out_ds, in_ds, schema_of):
    """Anchor ``out_ds``'s schema derived from ``in_ds``'s (pre-shuffle)
    schema: ``schema_of(input_schema) -> output pa.Schema``. Any failure
    in resolution or derivation (e.g. a keyed column missing from the
    input) degrades to a pass-through — the anchor is a best-effort guard
    for the all-blocks-empty case, never a correctness gate."""
    in_sch = input_arrow_schema(in_ds)
    try:
        anchor = schema_of(in_sch) if in_sch is not None else None
    except Exception:
        anchor = None
    return anchor_empty_schema(out_ds, anchor)
