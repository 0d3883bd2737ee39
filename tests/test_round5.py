"""Round-5 regression tests: the three r4 ADVICE findings plus the
round-5 VERDICT tasks (IVF kNN join, missing_file_ok, grouped-partial
top-k, spill-pressure smoke) as they land."""

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# --------------------------------------------------------------------------
# ADVICE r4 #1: window segment boundaries must not merge distinct int64
# keys >= 2^53 when the key column carries nulls (float64 promotion)
# --------------------------------------------------------------------------

def test_window_segments_large_int_keys_with_nulls(ray_session):
    import ray.data as rd
    from logstash_filter_translate_ray.stages.window import prev_event_gap

    k1 = 9007199254740992          # 2^53
    k2 = 9007199254740993          # 2^53 + 1: equal in float64!
    tbl = pa.table({
        "user_id": pa.array([k1, k1, k2, k2, None, None], type=pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "ts": pa.array([100, 200, 300, 400, 500, 600],
                       type=pa.timestamp("us")),
    })
    out = prev_event_gap(rd.from_arrow(tbl), num_buckets=1).to_pandas() \
        .set_index("event_id")["gap_us"]
    # k1 and k2 are DISTINCT keys: each key's first event has a null gap
    assert pd.isna(out[1]) and out[2] == 100.0
    assert pd.isna(out[3]) and out[4] == 100.0      # would be 100,100 only
    # null keys form ONE segment (SQL GROUP BY null-group convention)
    assert pd.isna(out[5]) and out[6] == 100.0


def test_window_segments_null_type_key(ray_session):
    """An all-null (null-typed) key column is one segment, not a crash."""
    import ray.data as rd
    from logstash_filter_translate_ray.stages.window import prev_event_gap
    tbl = pa.table({
        "user_id": pa.array([None, None, None], type=pa.null()),
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "ts": pa.array([10, 20, 40], type=pa.timestamp("us")),
    })
    out = prev_event_gap(rd.from_arrow(tbl), num_buckets=1).to_pandas() \
        .set_index("event_id")["gap_us"]
    assert pd.isna(out[1]) and out[2] == 10.0 and out[3] == 20.0


# --------------------------------------------------------------------------
# ADVICE r4 #2: checkpoint tmp ownership — host + pid + start time
# --------------------------------------------------------------------------

def test_checkpoint_tmp_ownership(tmp_path):
    from logstash_filter_translate_ray.checkpoint import (
        CheckpointStore, _local_host, _owner_alive, _proc_start, _tmp_owner,
        _tmp_suffix)

    sfx = _tmp_suffix()
    host, pid, start = _tmp_owner("base" + sfx)
    assert host == _local_host() and pid == os.getpid()
    assert start == (_proc_start(os.getpid()) or 0)
    # legacy suffix forms still parse (and are treated as same-host)
    assert _tmp_owner("base.1234.tmp") == (None, 1234, None)
    assert _tmp_owner("base.tmp") == (None, None, None)

    store = CheckpointStore(str(tmp_path))
    # our own live tmp is reclaimed, not a spurious 'live process' error
    t1 = store.begin_shard("s1")
    assert store.begin_shard("s1") == t1

    # a FRESH foreign-host tmp is presumed live -> loud failure
    foreign = tmp_path / "shard=s2.otherhost.99-1.tmp"
    foreign.mkdir()
    with pytest.raises(RuntimeError, match="live process"):
        store.begin_shard("s2")
    # ... but past the lease it is crash litter and is reclaimed
    short = CheckpointStore(str(tmp_path), foreign_lease_s=0.0)
    time.sleep(0.01)
    short.begin_shard("s2")
    assert not foreign.exists()

    # dead same-host pid -> stale
    dead = tmp_path / f"shard=s3.{_local_host()}.999999-1.tmp"
    dead.mkdir()
    store.begin_shard("s3")
    assert not dead.exists()

    # recycled PID: pid 1 is alive but its start time differs -> stale
    rec = tmp_path / f"shard=s4.{_local_host()}.1-123456789.tmp"
    rec.mkdir()
    store.begin_shard("s4")
    assert not rec.exists()

    # manifest-tmp litter in load_all: foreign-fresh kept, dead removed
    (tmp_path / "_manifests" / "m.otherhost.99-1.tmp").write_text("x")
    (tmp_path / "_manifests" / f"m.{_local_host()}.999999-1.tmp") \
        .write_text("x")
    assert store.load_all() == []
    assert (tmp_path / "_manifests" / "m.otherhost.99-1.tmp").exists()
    assert not (tmp_path / "_manifests"
                / f"m.{_local_host()}.999999-1.tmp").exists()


# --------------------------------------------------------------------------
# ADVICE r4 #3: _coerce_plain_scalar is thread-safe (thread-local
# SafeConstructor — concurrent FileDictionary loads in one process)
# --------------------------------------------------------------------------

def test_scalar_coercion_thread_safety():
    import threading
    from logstash_filter_translate_ray.dictionary import _coerce_plain_scalar

    results, errors = {}, []

    def work(i):
        try:
            results[i] = [_coerce_plain_scalar(str(j)) for j in range(2000)]
        except Exception as e:          # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(results[i] == list(range(2000)) for i in range(8))
    # typing parity retained
    assert _coerce_plain_scalar("yes") is True
    assert _coerce_plain_scalar("1e3") == "1e3"
    # YAML 1.1 floats need a SIGNED exponent — '1.5e3' stays a string
    assert _coerce_plain_scalar("1.5e+3") == 1500.0
