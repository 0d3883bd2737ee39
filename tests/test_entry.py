"""Driver-contract test: every queries() entry runs at sf0.001 and, where an
oracle_sql() entry exists, matches DuckDB on row count, column names and
order-insensitive values (mimicking the driver's CORRECTNESS gate)."""

import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Strict canonical form: every column stringified (the driver's
    value-hash is representation-sensitive, so the test is too)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def test_entry_smoke(ray_session):
    res = entry_mod.entry()
    df = to_pandas(res)
    assert len(df) >= 0
    assert "route" in df.columns and "text" in df.columns


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs(ray_session, sf_dir, con, name):
    fn = entry_mod.queries()[name]
    got = to_pandas(fn(sf_dir))
    assert len(got) >= 0
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        return
    if name == "transcripts_pipeline":
        # its registered oracle pins the sf0.01 transcripts cache (the
        # driver's comparison scale); the sf_dir-parameterized comparison
        # lives in test_transcripts_pipeline_vs_duckdb below
        return
    want = con.execute(sql).df()
    g, w = canon(got), canon(want)
    assert list(g.columns) == list(w.columns), (g.columns, w.columns)
    assert len(g) == len(w), f"{name}: rows {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_like=True)


def test_transcripts_pipeline_vs_duckdb(ray_session, sf_dir, con):
    """Flagship DAG per-sink counts vs a DuckDB reconstruction of the same
    parse → enrich → route chain over the SAME transcripts parquet. Since
    round 3 the same SQL is ALSO registered in oracle_sql() (the driver's
    DuckDB reads absolute paths for its testdata views, so /tmp works by
    the same mechanism); this pytest stays as the known-good backstop."""
    from logstash_filter_translate_ray.pipelines.transcripts import (
        ROLE_ROUTES, TOOL_DICT)

    got = to_pandas(entry_mod.q_transcripts_pipeline(sf_dir))
    tdir = entry_mod._transcripts_dir(sf_dir)
    route_case = " ".join(f"WHEN role = '{k}' THEN '{v}'"
                          for k, v in ROLE_ROUTES.items())
    tool_case = " ".join(f"WHEN tn = '{k}' THEN '{v}'"
                         for k, v in TOOL_DICT.items())
    sql = (
        f"WITH t AS (SELECT role, tool FROM read_parquet('{tdir}/*.parquet')), "
        "e AS (SELECT "
        f"CASE WHEN role IS NULL THEN NULL {route_case} ELSE 'other' END AS route, "
        "CASE WHEN tool IS NULL OR NOT regexp_matches(tool, '^\\s*[a-z_]+') "
        "THEN NULL ELSE regexp_extract(tool, '^\\s*([a-z_]+)', 1) END AS tn "
        "FROM t) "
        # '(null)' mirrors grouped_counts' null-key sentinel
        "SELECT COALESCE(route, '(null)') AS route, "
        f"COALESCE(CASE WHEN tn IS NULL THEN NULL {tool_case} "
        "ELSE 'no tool' END, '(null)') AS tool_label, COUNT(*) AS n "
        "FROM e GROUP BY 1, 2")
    want = con.execute(sql).df()
    g, w = canon(got), canon(want)
    assert len(g) == len(w), f"rows {len(g)} vs {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_like=True)


def test_registered_transcripts_oracle_sql_executes(ray_session):
    """(review r3) the REGISTERED oracle_sql() string for
    transcripts_pipeline — the one the driver will execute, /tmp
    read_parquet included — runs and matches the Ray query at the
    driver's comparison scale (sf0.01)."""
    import duckdb
    sql = entry_mod.oracle_sql().get("transcripts_pipeline")
    if sql is None:
        pytest.skip("oracle degraded to rows-only (cache generation failed)")
    got = to_pandas(entry_mod.q_transcripts_pipeline("/root/testdata/sf0.01"))
    want = duckdb.connect().execute(sql).df()
    g, w = canon(got), canon(want)
    assert len(g) == len(w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_like=True)
