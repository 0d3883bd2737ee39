"""Shared canonicalization + comparison for the differential fuzz
harnesses (ONE copy of the parity rules — five near-copies had already
drifted on -0.0 and null rendering before this module existed)."""
import numpy as np
import pandas as pd


def _render(v) -> str:
    """One rendering per VALUE, independent of the dtype that carried it:
    a null-bearing int64 aggregate rides as float64 (NaN) on the DuckDB
    side but as object ints on a driver-merge pandas side — 100000000
    and 100000000.0 must print the same. Integral floats inside the
    exact-int range render as ints; bool stays bool (True, not 1)."""
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        v = v + 0.0                      # fold -0.0 into 0.0
        if v == v and float(v).is_integer() and abs(v) <= 2.0 ** 53:
            return str(int(v))
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """The harnesses' value-parity form: columns sorted by name, every
    value stringified via ``_render`` (float -0.0 == 0.0, integral floats
    == ints), and None/NaN/NaT all as '<null>' (pandas renders the same
    absent value differently depending on which side's dtype carried
    the null)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        nulls = pd.isna(df[c])
        df[c] = df[c].map(_render)
        df.loc[nulls, c] = "<null>"
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare_result(name: str, got, want: pd.DataFrame) -> None:
    """Driver-style comparison of a Ray query result against its DuckDB
    oracle frame. ``got`` may be a Dataset / pyarrow Table / DataFrame.
    A fully-empty Dataset loses its column list in to_pandas (Ray 2.49
    quirk) — the schema() check covers that case."""
    import pyarrow as pa
    import ray.data

    if isinstance(got, ray.data.Dataset):
        if len(want) == 0:
            sch = got.schema()
            assert sch is not None, f"{name}: empty result lost schema"
            assert sorted(sch.names) == sorted(want.columns), \
                (name, sch.names, list(want.columns))
            assert got.count() == 0, name
            return
        got = got.to_pandas()
    elif isinstance(got, pa.Table):
        got = got.to_pandas()
    g, w = canon(got), canon(want)
    assert list(g.columns) == list(w.columns), (name, g.columns, w.columns)
    assert len(g) == len(w), (name, len(g), len(w), g, w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                  check_like=True, obj=name)
