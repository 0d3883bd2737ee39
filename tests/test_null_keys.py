"""Null group/sort keys through Ray's sort-based shuffle (r4 fuzz class).

Ray 2.49's range partitioner compares raw key values across block
boundaries, so a null key in a multi-block dataset raises
``TypeError: '<' not supported`` depending on which boundaries get
sampled. The engine wraps every wide op that can see a null key in
mask_null_keys/unmask_null_keys (fill + __knull flag); these tests pin
both the no-crash property and SQL-parity of the results on inputs with
null keys spread across several blocks.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod

MIXED_ROWS = [
    ("click", 1, 1, 1.0, "k=1"),
    (None, None, None, None, None),
    ("error", 2, None, 2.0, None),
    (None, 3, 2, None, "x9"),
    ("click", 4, 1, -3.5, "k=2"),
    (None, 5, None, 0.005, ""),
] * 3


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsf")
    rows = MIXED_ROWS
    n = len(rows)
    tbl = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), type=pa.int64()),
        "ts": pa.array([None if r[1] is None else r[1] * 1_000_000
                        for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[0] for r in rows], type=pa.string()),
        "value": pa.array([r[3] for r in rows], type=pa.float64()),
        "props": pa.array([r[4] for r in rows], type=pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(d), "events.parquet"))
    return str(d)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        nulls = pd.isna(df[c])
        df[c] = df[c].astype(str)
        df.loc[nulls, c] = "<null>"
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle(null_sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM read_parquet("
                f"'{os.path.join(null_sf_dir, 'events.parquet')}')")
    return con.execute(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import ray.data
    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
        if not len(df.columns):
            # Ray 2.49 to_pandas drops the (known) schema of a fully-empty
            # dataset; rebuild the column list from Dataset.schema()
            sch = res.schema()
            df = pd.DataFrame(columns=list(sch.names) if sch else [])
        return df
    return res.to_pandas() if hasattr(res, "to_pandas") else res


EVENT_QUERIES = [
    "translate_exact", "translate_exact_nofallback", "translate_regex",
    "route_counts", "matched_counts", "parse_extract", "agg_value_by_type",
    "user_event_counts", "zscore_outliers", "quantiles", "event_paths",
    "events_pipeline", "filter_pushdown", "topk_users",
    "tumbling_counts", "window_quantiles", "prev_event_gap",
    "session_counts", "distinct_types", "translate_file_dict",
    "translate_iterate_maps"]


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_null_key_queries_match_oracle(ray_session, null_sf_dir, name):
    got = _to_pandas(entry_mod.queries()[name](null_sf_dir))
    want = _oracle(null_sf_dir, entry_mod.oracle_sql()[name])
    g, w = _canon(got), _canon(want)
    assert list(g.columns) == list(w.columns)
    assert len(g) == len(w), (name, g, w)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=name)


def test_null_safe_groupby_aggregate_multiblock(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Sum

    from logstash_filter_translate_ray.stages.aggregate import (
        null_safe_groupby_aggregate)
    tbl = pa.table({"k": ["a", None, "b", None, "a", ""] * 4,
                    "v": list(range(24))})
    out = null_safe_groupby_aggregate(
        rd.from_arrow(tbl).repartition(5), ["k"],
        Sum("v", alias_name="s")).to_pandas()
    want = tbl.to_pandas().groupby("k", dropna=False, as_index=False)["v"] \
        .sum().rename(columns={"v": "s"})
    got = out.sort_values("k", na_position="last").reset_index(drop=True)
    want = want.sort_values("k", na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the "" zero-token group stays distinct from the null group
    assert set(out["s"][out["k"] == ""].tolist()) != set()


def test_null_safe_sort_nulls_last_both_directions(ray_session):
    import ray.data as rd

    from logstash_filter_translate_ray.stages.aggregate import (
        null_safe_sort)
    tbl = pa.table({"a": [3, None, 1, 2, None, 1],
                    "b": ["x", "y", None, "z", None, "q"]})
    out = null_safe_sort(rd.from_arrow(tbl).repartition(3), ["a", "b"],
                         descending=[True, False]).to_pandas()
    want = tbl.to_pandas().sort_values(
        ["a", "b"], ascending=[False, True],
        na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_grouped_quantiles_distributed_null_timestamp_key(ray_session):
    """The distributed fallback now restores null keys of ANY type (the
    old string-sentinel contract excluded timestamp/int keys)."""
    import ray.data as rd

    from logstash_filter_translate_ray.stages.aggregate import (
        grouped_quantiles)
    tbl = pa.table({
        "bucket": pa.array([0, 0, None, None, 3_600_000_000, None],
                           type=pa.timestamp("us")),
        "value": [1.0, 2.0, 5.0, 7.0, 4.0, None],
    })
    driver = grouped_quantiles(rd.from_arrow(tbl).repartition(3),
                               key="bucket", qs=(0.5,))
    fb = grouped_quantiles(rd.from_arrow(tbl).repartition(3), key="bucket",
                           qs=(0.5,), driver_partial_rows_max=0).to_pandas()
    d = driver.sort_values("bucket", na_position="last") \
        .reset_index(drop=True)
    f = fb.sort_values("bucket", na_position="last").reset_index(drop=True)
    assert pd.isna(f.loc[len(f) - 1, "bucket"])
    assert list(d["p50"].fillna(-1)) == list(f["p50"].fillna(-1))


def test_similarity_tolerates_empty_blocks(ray_session):
    """_batch_matrix infers dim by division — an empty block (tiny inputs
    repartitioned, or an IVF probe-filter emptying a block) raised
    ZeroDivisionError in the exact-pairs / brute-force paths (r4 fuzz)."""
    import ray.data as rd

    from logstash_filter_translate_ray.functions.similarity import (
        brute_force_topk, embedding_neardup_pairs, ivf_topk)
    tbl = pa.table({"vec_id": pa.array([0, 1, 2], type=pa.int64()),
                    "embedding": [[1.0, 0.0], [0.0, 1.0], [0.5, 0.0]]})
    ds = rd.from_arrow(tbl).repartition(5)      # 3 rows in 5 blocks → empties
    pairs = embedding_neardup_pairs(ds, threshold=0.9)
    assert [(r.id_a, r.id_b) for r in pairs.itertuples()] == [(0, 2)]
    bf = brute_force_topk(ds, np.array([[1.0, 0.0]]), k=2)
    assert bf["vec_id"].tolist() == [0, 2]
    out = ivf_topk(ds, np.array([[1.0, 0.0]]), k=1, n_cells=2, n_probe=1)
    assert len(out) == 1


def test_brute_force_topk_tie_break_and_zero_query(ray_session):
    """(r4 review) brute_force_topk must order by (cosine DESC, id ASC)
    like the SQL mirror: a zero query vector scores 0 against everything
    (engine convention), so the top-k is exactly the k smallest ids; and
    duplicate vectors tied at the k boundary break to the smaller id even
    across blocks."""
    import ray.data as rd

    from logstash_filter_translate_ray.functions.similarity import (
        brute_force_topk)
    vecs = [[float(i % 3), float((i * 7) % 5), 1.0] for i in range(20)]
    tbl = pa.table({"vec_id": pa.array(range(20), type=pa.int64()),
                    "embedding": pa.array(vecs,
                                          type=pa.list_(pa.float32()))})
    out = brute_force_topk(rd.from_arrow(tbl).repartition(3),
                           np.zeros((1, 3)), k=10)
    assert out["vec_id"].tolist() == list(range(10))
    dup = [[1.0, 0.0]] * 6 + [[0.9, 0.1]] * 6
    tbl2 = pa.table({"vec_id": pa.array(range(12), type=pa.int64()),
                     "embedding": pa.array(dup,
                                           type=pa.list_(pa.float32()))})
    out2 = brute_force_topk(rd.from_arrow(tbl2).repartition(4),
                            np.array([[1.0, 0.0]]), k=4)
    assert out2["vec_id"].tolist() == [0, 1, 2, 3]


def test_knn_join_cross_block_duplicate_tie(ray_session):
    """A vector and its exact duplicate in DIFFERENT blocks must tie and
    rank by neighbor id ASC: BLAS dgemm summation order varies with matrix
    shape, so without score rounding the duplicate scored from another
    block can land 1 ulp higher and steal the lower rank (r4 fuzz)."""
    import ray.data as rd

    from logstash_filter_translate_ray.functions.similarity import knn_join
    v5 = [1.0, 1.0, 2.0, 0.0, 0.5, 0.5, 0.0, 1.0]
    v6 = [1.0, 0.0, -0.5, 0.0, 0.5, 0.0, 0.0, 0.0]
    vecs = [[0.0] * 8] * 5 + [v5, v6, [0.0] * 8, [-0.0] * 8,
                              list(v5), [-x for x in v5]]
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array(
            [[np.float32(x) for x in v] for v in vecs],
            type=pa.list_(pa.float32()))})
    out = knn_join(rd.from_arrow(tbl).repartition(4), k=3,
                   target_block_rows=3)
    mine = out[out["vec_id"] == 6].sort_values("nn_rank")
    # v5 (id 5) and its copy (id 9) tie exactly; id 5 must rank first
    assert mine["neighbor_id"].tolist()[:2] == [5, 9]


def test_spec_fully_filtered_keeps_schema(ray_session, tmp_path):
    """A spec whose filters drop every row must still return a dataset
    with its (statically derived) column list — Ray 2.49 drops all-empty
    blocks and schema() would otherwise be None (unwritable sink)."""
    import pyarrow.parquet as pq_mod
    import ray.data  # noqa: F401

    from logstash_filter_translate_ray.pipelines.spec import build_from_spec
    p = str(tmp_path / "events.parquet")
    pq_mod.write_table(pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "event_type": pa.array(["click", None], type=pa.string()),
        "props": pa.array(["k=1", None], type=pa.string())}), p)
    spec = {"input": {"path": p},
            "filters": [
                {"translate": {"source": "event_type", "target": "label",
                               "dictionary": {"click": "C"},
                               "fallback": "?", "override": True}},
                {"extract": {"out": "k_value", "source": "props",
                             "pattern": r"(\d+)", "cast": "int64"}},
                {"keep": {"column": "event_id", "op": ">", "value": 99}}],
            "route": {"routes": {"click": "hot"}, "key": "event_type",
                      "default": "ops"}}
    ds = build_from_spec(spec)
    assert ds.count() == 0
    assert list(ds.schema().names) == [
        "event_id", "event_type", "props", "label", "k_value", "route"]


def test_grouped_counts_distributed_empty_keeps_schema(ray_session):
    import ray.data as rd

    from logstash_filter_translate_ray.stages.aggregate import (
        grouped_counts, grouped_quantiles)
    tbl = pa.table({"k": pa.array([], type=pa.string()),
                    "value": pa.array([], type=pa.float64())})
    out = grouped_counts(rd.from_arrow(tbl), ["k"], driver_merge=False)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["k", "n"]
    q = grouped_quantiles(rd.from_arrow(tbl), key="k", qs=(0.5,))
    assert len(q) == 0 and list(q.columns) == ["k", "p50"]


def test_zscore_outliers_all_null_keys_empty(ray_session):
    import ray.data as rd

    from logstash_filter_translate_ray.stages.aggregate import (
        zscore_outliers)
    tbl = pa.table({"event_id": [1, 2], "event_type": pa.array(
        [None, None], type=pa.string()), "value": [1.0, 2.0]})
    out = zscore_outliers(rd.from_arrow(tbl).repartition(2))
    assert out.count() == 0
    # the schema anchor keeps the column list on a fully-empty result
    # (Ray's to_pandas still returns a bare frame there — known quirk)
    assert list(out.schema().names) == ["event_id", "event_type", "z"]
