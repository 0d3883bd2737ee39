"""CheckpointStore unit behavior: manifest round-trip, atomic rename,
leftover-tmp cleanup."""

import json
import os

from logstash_filter_translate_ray.checkpoint import CheckpointStore, ShardManifest


def test_manifest_roundtrip(tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"))
    out = str(tmp_path / "ck" / "shard=00003")
    import os
    os.makedirs(out)
    # is_done requires the certified output dir to EXIST for rows_out > 0
    m = ShardManifest(shard_id="00003", input_files=["a.parquet"],
                      output_dir=out, rows_in=10, rows_out=10,
                      route_counts={"r": 10}, matched_counts={"True": 4})
    assert not store.is_done("00003")
    store.commit(m)
    assert store.is_done("00003")
    back = store.load("00003")
    assert back == m
    assert store.load_all() == [m]
    assert store.load("99999") is None


def test_atomic_shard_promotion(tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"))
    tmp = store.begin_shard("00001")
    assert tmp.endswith(".tmp") and os.path.isdir(tmp)
    with open(os.path.join(tmp, "data.bin"), "w") as f:
        f.write("x")
    final = store.finish_shard("00001")
    assert os.path.exists(os.path.join(final, "data.bin"))
    assert not os.path.exists(tmp)


def test_begin_shard_clears_stale_tmp(tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"))
    tmp = store.begin_shard("00002")
    with open(os.path.join(tmp, "stale.bin"), "w") as f:
        f.write("leftover from a crash")
    tmp2 = store.begin_shard("00002")   # crash-restart path
    assert tmp2 == tmp
    assert os.listdir(tmp2) == []


def test_manifest_write_is_atomic(tmp_path):
    store = CheckpointStore(str(tmp_path / "ck"))
    m = ShardManifest(shard_id="00004", input_files=[], output_dir="/y",
                      rows_in=0, rows_out=0)
    store.commit(m)
    # no .tmp residue, file is valid JSON
    files = os.listdir(store.manifest_dir)
    assert files == ["00004.json"]
    with open(os.path.join(store.manifest_dir, files[0])) as f:
        json.load(f)
