"""Route + fan-out sinks.

Routing is itself a translate: a dictionary from route key (role, tool, …)
to sink name with a fallback route — so it reuses the exact-match kernel.
Fan-out is single-pass: ONE ``write_parquet(partition_cols=["route"])``
writes every sink directory in the same streaming pass (no per-sink filter
re-scans — N sinks cost one traversal, SURVEY §3.4).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray

from ..config import TranslateConfig
from ..kernel import DictSnapshot, translate_table


def route_dataset(ds: "ray.data.Dataset", routes: dict[str, str], *,
                  key: str = "role", route_col: str = "route",
                  default_route: str = "other") -> "ray.data.Dataset":
    """Add a ``route`` column from a route-key dictionary (broadcast)."""
    cfg = TranslateConfig(source=key, target=route_col,
                          dictionary=dict(routes), fallback=default_route,
                          override=True)
    snap_ref = ray.put(DictSnapshot(cfg.dictionary))

    def _fn(batch: pa.Table) -> pa.Table:
        snap = ray.get(snap_ref) if isinstance(snap_ref, ray.ObjectRef) else snap_ref
        return translate_table(batch, cfg, snap, matched_col=None)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def write_routed(ds: "ray.data.Dataset", out_dir: str, *,
                 route_col: str = "route",
                 min_rows_per_file: Optional[int] = None) -> None:
    """Single-pass fan-out sink: hive-partitioned parquet by route."""
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(out_dir, partition_cols=[route_col], **kwargs)
