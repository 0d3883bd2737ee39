"""Durability / concurrency regressions from the r4 review: checkpoint
cross-process exclusion and tmp hygiene, the dictionary mtime gate under
transient load failures, CSV null literals, and per-config dictionary
services."""

import json
import os

import pyarrow as pa
import pytest

from logstash_filter_translate_ray.checkpoint import (CheckpointStore,
                                                      ShardManifest)


def _manifest(sid: str, out: str) -> ShardManifest:
    return ShardManifest(shard_id=sid, input_files=["x"], output_dir=out,
                         rows_in=1, rows_out=1)


def test_begin_shard_rejects_live_foreign_tmp(tmp_path):
    """A tmp dir owned by a LIVE other process = two runs sharing one
    checkpoint root — must fail loudly, not rmtree the other's work."""
    store = CheckpointStore(str(tmp_path))
    # PID 1 (init) is always alive and never us (legacy pid-only suffix:
    # no start time recorded, so the live-pid probe alone decides)
    foreign = store.shard_output_dir("00001") + ".1.tmp"
    os.makedirs(foreign)
    with pytest.raises(RuntimeError, match="live process") as ei:
        store.begin_shard("00001")
    assert foreign in str(ei.value)
    os.rmdir(foreign)


def test_begin_shard_clears_dead_and_legacy_tmps(tmp_path):
    store = CheckpointStore(str(tmp_path))
    base = store.shard_output_dir("00002")
    os.makedirs(base + ".999999999.tmp")      # dead pid
    os.makedirs(base + ".tmp")                # legacy pid-less
    tmp = store.begin_shard("00002")
    assert os.path.isdir(tmp)
    assert not os.path.exists(base + ".999999999.tmp")
    assert not os.path.exists(base + ".tmp")
    # our own leftover tmp from a prior attempt is cleared too
    with open(os.path.join(tmp, "junk"), "w") as f:
        f.write("x")
    tmp2 = store.begin_shard("00002")
    assert tmp2 == tmp and os.listdir(tmp2) == []


def test_finish_shard_promotes_pid_tmp(tmp_path):
    store = CheckpointStore(str(tmp_path))
    tmp = store.begin_shard("00003")
    with open(os.path.join(tmp, "part.parquet"), "w") as f:
        f.write("data")
    final = store.finish_shard("00003")
    assert os.path.isdir(final) and not os.path.exists(tmp)
    assert os.listdir(final) == ["part.parquet"]


def test_load_all_cleans_dead_manifest_tmp_litter(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.commit(_manifest("00004", str(tmp_path / "shard=00004")))
    dead = os.path.join(store.manifest_dir, "00009.json.999999999.tmp")
    legacy = os.path.join(store.manifest_dir, "00008.json.tmp")
    live = os.path.join(store.manifest_dir, f"00007.json.{os.getpid()}.tmp")
    for p in (dead, legacy, live):
        with open(p, "w") as f:
            f.write("{")
    out = store.load_all()
    assert [m.shard_id for m in out] == ["00004"]
    assert not os.path.exists(dead) and not os.path.exists(legacy)
    assert os.path.exists(live)      # a live writer's tmp is left alone
    os.unlink(live)


def test_is_done_requires_output_dir(tmp_path):
    """A manifest certifying rows whose shard dir is GONE (manual delete,
    crash window) must re-run, not silently drop its rows forever."""
    store = CheckpointStore(str(tmp_path))
    tmp = store.begin_shard("00005")
    with open(os.path.join(tmp, "p.parquet"), "w") as f:
        f.write("d")
    final = store.finish_shard("00005")
    store.commit(_manifest("00005", final))
    assert store.is_done("00005")
    import shutil
    shutil.rmtree(final)
    assert not store.is_done("00005")
    # zero-row shards legitimately have no files to point at
    store.commit(ShardManifest(shard_id="00006", input_files=["x"],
                               output_dir=str(tmp_path / "shard=00006"),
                               rows_in=0, rows_out=0))
    assert store.is_done("00006")


def test_dictionary_failed_reload_does_not_poison_mtime_gate(tmp_path):
    """A transient parse failure (catching a non-atomic writer mid-write)
    must not record the new mtime: the valid content that lands at the
    SAME mtime moments later must still reload."""
    from logstash_filter_translate_ray.dictionary import FileDictionary
    p = str(tmp_path / "d.yml")
    with open(p, "w") as f:
        f.write("a: '1'\n")
    d = FileDictionary(p, refresh_interval=1)    # short refresh: mtime gate
    assert d.snapshot.map["a"] == "1"
    t = os.path.getmtime(p) + 5
    with open(p, "w") as f:                      # torn write: unparseable
        f.write("a: [unclosed\n")
    os.utime(p, (t, t))
    assert d.reload() is False                   # old dict kept (S13)
    assert d.snapshot.map["a"] == "1"
    with open(p, "w") as f:                      # completed write, SAME mtime
        f.write("a: '2'\nb: '3'\n")
    os.utime(p, (t, t))
    assert d.reload() is True
    assert d.snapshot.map["b"] == "3"


def test_csv_null_is_only_the_unquoted_empty_cell(ray_session, tmp_path):
    """Literal 'NA'/'null'/'NaN' strings are legitimate values (and dict
    keys) — only the unquoted empty cell maps to null."""
    from logstash_filter_translate_ray.sources.readers import (
        read_transcripts_csv)
    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("conv_id,turn_idx,role,text,tool,ts\n"
                'c1,0,user,hello,NA,2024-01-01T00:00:00\n'
                'c2,1,user,null,,2024-01-01T00:00:01\n'
                'c3,2,NaN,"",search,2024-01-01T00:00:02\n')
    df = read_transcripts_csv(p).to_pandas().sort_values("turn_idx")
    assert df["tool"].tolist()[0] == "NA"        # literal survives
    assert df["tool"].isna().tolist() == [False, True, False]
    assert df["text"].tolist()[1] == "null"      # literal survives
    assert df["role"].tolist()[2] == "NaN"       # literal survives
    assert df["text"].tolist()[2] == ""          # quoted "" stays a string


def test_dictionary_service_per_config_actors(ray_session, tmp_path):
    """Two pipelines sharing a dictionary path but differing in refresh
    config must get SEPARATE service actors (get_if_exists silently
    ignores kwargs, so a shared default name would make one pipeline run
    with the other's refresh semantics)."""
    import ray
    import ray.data as rd

    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("click,C\n")
    ds = rd.from_arrow(pa.table({"event_type": ["click", "x"]}))
    def _names():
        return {a["name"] for a in
                ray.util.list_named_actors(all_namespaces=True)
                if a.get("namespace") == "lftr-dictionaries"}
    before = _names()
    for behaviour in ("merge", "replace"):
        cfg = TranslateConfig(source="event_type", target="label",
                              dictionary_path=p,
                              refresh_behaviour=behaviour)
        out = translate_dataset(ds, cfg, matched_col=None).to_pandas()
        assert out["label"].tolist()[0] == "C"
    created = {n for n in _names()
               if "lftr-dict" in n and str(tmp_path) in n} - before
    assert len(created) == 2, created
