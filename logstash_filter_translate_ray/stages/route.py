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
                  default_route: str = "other",
                  regex: bool = False) -> "ray.data.Dataset":
    """Add a ``route`` column from a route-key dictionary (broadcast).
    ``regex=True`` routes by ordered regex patterns over the key column
    (first match wins — the exact_regex strategy)."""
    cfg = TranslateConfig(source=key, target=route_col,
                          dictionary=dict(routes), fallback=default_route,
                          override=True, regex=regex)
    snap_ref = ray.put(DictSnapshot(cfg.dictionary))
    # slim-cfg rule (CLAUDE.md): the snapshot is the broadcast; the closure
    # must not ALSO pickle the full route table per task
    slim_cfg = TranslateConfig(source=key, target=route_col, dictionary={},
                               fallback=default_route, override=True,
                               regex=regex)

    def _fn(batch: pa.Table) -> pa.Table:
        snap = ray.get(snap_ref) if isinstance(snap_ref, ray.ObjectRef) else snap_ref
        return translate_table(batch, slim_cfg, snap, matched_col=None)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def write_routed(ds: "ray.data.Dataset", out_dir: str, *,
                 route_col: str = "route", file_format: str = "parquet",
                 min_rows_per_file: Optional[int] = None) -> None:
    """Single-pass fan-out sink: hive-partitioned output by route
    (parquet default; JSON-lines for downstream text consumers)."""
    kwargs = {}
    if min_rows_per_file is not None:
        kwargs["min_rows_per_file"] = min_rows_per_file
    if file_format == "parquet":
        ds.write_parquet(out_dir, partition_cols=[route_col], **kwargs)
    elif file_format == "json":
        # this Ray release's write_json has no partition_cols — single-pass
        # manual fan-out: each task splits its block by route and writes one
        # JSONL file per (block, route), named by content hash so task
        # RETRIES overwrite the same file (idempotent sink)
        import hashlib
        import json as _json
        import os

        def _write(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            routes = pc.unique(batch[route_col]).to_pylist()
            for r in routes:
                part = batch.filter(pc.equal(batch[route_col], r))
                rows = part.to_pylist()
                payload = "\n".join(
                    _json.dumps(row, default=str) for row in rows) + "\n"
                d = os.path.join(out_dir, f"{route_col}={r}")
                os.makedirs(d, exist_ok=True)
                # sha1 (not crc32): a 32-bit collision between two blocks'
                # payloads in the same route would silently drop a block
                name = f"part-{hashlib.sha1(payload.encode()).hexdigest()[:16]}.jsonl"
                tmp = os.path.join(d, name + ".tmp")
                with open(tmp, "w") as f:
                    f.write(payload)
                os.replace(tmp, os.path.join(d, name))
            return pa.table({"rows": pa.array([len(batch)], type=pa.int64())})

        ds.map_batches(_write, batch_format="pyarrow",
                       batch_size=None).count()
    else:
        raise ValueError(f"unsupported sink format {file_format!r}")
