"""Time-shaped operators over event streams (guide: 'Streaming-shaped
workloads') — tumbling windows, per-key previous-event gaps (as-of style),
and inactivity-gap sessionization.

Partitioning contract (documented per north_rule): the per-key operators
co-locate each key's rows via ``groupby(key)`` — a hash shuffle of the
full rows — then order by (ts, id) INSIDE the group. At 10^12-row scale the
shuffle is the dominant cost; mitigate by pre-filtering columns (only key,
ts, id move) and, for skewed keys, falling back to the combiner pattern
where the per-key computation allows it (counts do; gaps don't — a gap
needs its neighbor, so a hot key's rows genuinely must meet).

The tumbling-window count needs NO per-key shuffle at all: the bucket is a
row-local function of ts, so it composes with the combiner aggregate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .aggregate import grouped_counts


def add_time_bucket(tbl: pa.Table, ts_col: str = "ts",
                    unit: str = "hour", out: str = "bucket") -> pa.Table:
    """Row-local tumbling-window assignment (floor to the window start)."""
    b = pc.floor_temporal(tbl[ts_col], unit=unit)
    return tbl.append_column(out, b)


def tumbling_counts(ds, keys=("event_type",), ts_col: str = "ts",
                    unit: str = "hour", driver_merge: bool = False):
    """Tumbling-window counts per key — bucket in map_batches (no per-key
    shuffle), then the combiner-style grouped count."""
    def _fn(t: pa.Table) -> pa.Table:
        return add_time_bucket(t, ts_col, unit)
    bucketed = ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
    return grouped_counts(bucketed, ["bucket", *keys],
                          driver_merge=driver_merge)


def prev_event_gap(ds, key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", out: str = "gap_us"):
    """Per-key previous-event gap (as-of/self-lag): for each row, µs since
    the key's previous event ordered by (ts, id); null for the first."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        ts_us = g[ts_col].astype("int64")
        # keep float64 (NaN for the first event): nullable-BIGINT window
        # results come back as float64 from SQL engines too, so the driver's
        # value comparison sees identical representations on both sides
        g[out] = ts_us.diff()
        return g[[id_col, out]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def session_counts(ds, key: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   gap: "pd.Timedelta | str" = "30min"):
    """Inactivity-gap sessionization: a new session starts when the gap to
    the key's previous event exceeds ``gap``; returns sessions per key."""
    gap_us = int(pd.Timedelta(gap).value // 1000)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        ts_us = g[ts_col].astype("int64")
        new_session = ts_us.diff().isna() | (ts_us.diff() > gap_us)
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_sessions": [int(new_session.sum())]})

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")
