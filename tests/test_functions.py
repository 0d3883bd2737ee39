"""Training-data ops: dedup / similarity / text analysis / multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from logstash_filter_translate_ray.functions import dedup, multimodal, similarity, text


@pytest.fixture()
def docs_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture()
def emb_ds(ray_session, sf_dir):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_removes_duplicates(ray_session):
    import ray.data as rd
    tbl = pa.table({"doc_id": [3, 1, 2, 4],
                    "text": ["same", "same", "other", "third"]})
    out = dedup.exact_dedup(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 4]   # min-id kept


def test_exact_dedup_no_dupes_is_identity(docs_ds):
    n = docs_ds.count()
    assert dedup.exact_dedup(docs_ds).count() == n


def test_minhash_finds_near_duplicates(ray_session):
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    near = base.replace("lazy", "sleepy")
    far = "completely different content about ray data pipelines at scale"
    tbl = pa.table({"doc_id": [1, 2, 3], "text": [base, near, far]})
    ds = rd.from_arrow(tbl)
    deduped, dropped = dedup.minhash_dedup(ds, threshold=0.5, concurrency=1)
    assert dropped == [2]
    assert sorted(deduped.to_pandas()["doc_id"]) == [1, 3]


def test_simhash_near_texts_close(ray_session):
    a = dedup.simhash64("the quick brown fox jumps over the lazy dog")
    b = dedup.simhash64("the quick brown fox jumps over the sleepy dog")
    c = dedup.simhash64("entirely unrelated words about databases and planes")
    assert dedup.hamming64(a, b) < dedup.hamming64(a, c)


def test_simhash_dataset_column(docs_ds):
    out = dedup.simhash_dataset(docs_ds.limit(50)).to_pandas()
    assert out["simhash"].nunique() > 1


def test_ngram_jaccard_pairs(ray_session):
    import ray.data as rd
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    tbl = pa.table({"doc_id": [1, 2, 3],
                    "text": [base, near, "unrelated text entirely here now"]})
    pairs = dedup.ngram_jaccard_pairs(rd.from_arrow(tbl), threshold=0.4,
                                      concurrency=1)
    assert {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])} == {(1, 2)}


def test_brute_force_topk_matches_numpy(emb_ds):
    tbl = emb_ds.to_pandas()
    m = np.stack(tbl["embedding"].to_numpy())
    q = m[0]
    got = similarity.brute_force_topk(emb_ds, q, k=5)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    want_ids = tbl["vec_id"].to_numpy()[np.argsort(-(mn @ qn))[:5]]
    assert got["vec_id"].tolist() == want_ids.tolist()
    assert got["score"].iloc[0] == pytest.approx(1.0, abs=1e-5)


def test_lsh_topk_contains_self(emb_ds):
    tbl = emb_ds.to_pandas()
    q = np.stack(tbl["embedding"].to_numpy())[0]
    got = similarity.lsh_topk(emb_ds, q, k=5, n_planes=6, concurrency=1)
    assert int(tbl["vec_id"].iloc[0]) in got["vec_id"].tolist()


def test_token_count(docs_ds):
    out = text.token_count_dataset(docs_ds.limit(20)).to_pandas()
    row = out.iloc[0]
    assert row["n_tokens_ws"] == len(row["text"].split())
    assert row["n_tokens_bpe"] >= row["n_tokens_ws"]


def test_quality_scores_bounded(docs_ds):
    out = text.quality_dataset(docs_ds.limit(50)).to_pandas()
    assert ((out["quality_score"] >= 0) & (out["quality_score"] <= 1)).all()
    assert ((out["punct_ratio"] >= 0) & (out["stop_ratio"] >= 0)).all()


def test_langid_heuristic(ray_session):
    import ray.data as rd
    tbl = pa.table({"text": [
        "the cat and the dog sat with you",
        "der Hund und die Katze ist nicht da",
        "le chat est avec la souris je pense",
        "el perro y los gatos no es una cosa",
        "你好世界这是中文",
        "zzz qqq",
    ]})
    out = text.langid_dataset(rd.from_arrow(tbl)).to_pandas()
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "es", "zh", "und"]


def test_fingerprint_deterministic(docs_ds):
    a = text.fingerprint_dataset(docs_ds.limit(10)).to_pandas()
    b = text.fingerprint_dataset(docs_ds.limit(10)).to_pandas()
    assert a["fingerprint"].tolist() == b["fingerprint"].tolist()
    assert a["fingerprint"].nunique() == 10


def test_multimodal_decode_stage(ray_session):
    import ray.data as rd
    media = multimodal.make_fake_media(100)
    ds = rd.from_arrow(media)
    out = multimodal.decode_features_dataset(ds, concurrency=1).to_pandas()
    assert len(out) == 100
    assert (out["payload_bytes"] == 4096).all()
    assert out["features"].map(len).eq(8).all()
    # deterministic across runs
    out2 = multimodal.decode_features_dataset(rd.from_arrow(media),
                                              concurrency=1).to_pandas()
    assert out["payload_digest"].tolist() == out2["payload_digest"].tolist()


def test_multimodal_resize_stage(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(multimodal.make_fake_media(20))
    out = multimodal.resize_dataset(ds, max_side=128, concurrency=1).to_pandas()
    assert (out[["resized_width", "resized_height"]].max(axis=1) <= 128).all()


def test_multimodal_pool_modes_equivalent(ray_session):
    """pool="tasks" (instance shipped per task; default — the numpy codecs
    have zero init and the actor pool's spin-up measured 1.4 s alone) and
    pool="actors" (class + concurrency, the heavy-codec-library shape)
    must produce identical rows."""
    import ray.data as rd
    media = multimodal.make_fake_media(60)
    key = ["media_id"]
    for fn, cols in [
            (multimodal.decode_features_dataset,
             ["media_id", "payload_bytes", "payload_digest"]),
            (lambda ds, **kw: multimodal.resize_dataset(ds, max_side=96, **kw),
             ["media_id", "resized_width", "resized_height"])]:
        a = fn(rd.from_arrow(media), pool="tasks").to_pandas() \
            .sort_values(key).reset_index(drop=True)
        b = fn(rd.from_arrow(media), pool="actors", concurrency=1) \
            .to_pandas().sort_values(key).reset_index(drop=True)
        assert a[cols].equals(b[cols])


def test_multimodal_real_codecs_gated():
    """The gate is now per-PAYLOAD: uncompressed formats decode for real,
    compressed codec payloads still raise clearly."""
    stage = multimodal.DecodeFeatureStage(use_real_codecs=True)
    with pytest.raises(NotImplementedError):
        stage._real_features(b"\xff\xd8\xff\xe0 fake jpeg bytes")


def test_embedding_neardup_matches_bruteforce(emb_ds):
    import numpy as np
    from logstash_filter_translate_ray.functions.similarity import (
        embedding_neardup_pairs)
    got = embedding_neardup_pairs(emb_ds, threshold=0.4)
    tbl = emb_ds.to_pandas()
    m = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    ids = tbl["vec_id"].to_numpy()
    want = sorted((int(ids[i]), int(ids[j]))
                  for i in range(len(ids)) for j in range(len(ids))
                  if ids[i] < ids[j] and s[i, j] >= 0.4)
    assert list(zip(got["id_a"], got["id_b"])) == want


def test_csv_json_transcript_sources(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import json as _json
    from logstash_filter_translate_ray.sources import make_transcripts
    from logstash_filter_translate_ray.sources.readers import (
        read_transcripts_csv, read_transcripts_json)
    from logstash_filter_translate_ray.pipelines import build_enriched_dataset

    tbl = make_transcripts(500, seed=7)
    csv_path = str(tmp_path / "t.csv")
    pacsv.write_csv(tbl, csv_path)
    out_csv = build_enriched_dataset(read_transcripts_csv(csv_path)).to_pandas()
    assert len(out_csv) == 500 and "route" in out_csv.columns

    json_path = str(tmp_path / "t.jsonl")
    with open(json_path, "w") as f:
        for r in tbl.to_pylist():
            r["ts"] = r["ts"].isoformat()
            f.write(_json.dumps(r) + "\n")
    out_json = build_enriched_dataset(read_transcripts_json(json_path)).to_pandas()
    assert len(out_json) == 500
    assert sorted(out_json["conv_id"]) == sorted(out_csv["conv_id"])


def test_frame_sample_plan():
    from logstash_filter_translate_ray.functions.multimodal import frame_sample_plan
    assert frame_sample_plan(100, every=10) == list(range(0, 100, 10))
    assert frame_sample_plan(5, every=10) == [0]
    assert frame_sample_plan(0) == []


def test_json_fanout_sink(ray_session, tmp_path):
    import os
    import ray.data as rd
    from logstash_filter_translate_ray.stages.route import write_routed
    tbl = pa.table({"x": [1, 2, 3], "route": ["a", "a", "b"]})
    out = str(tmp_path / "j")
    write_routed(rd.from_arrow(tbl), out, file_format="json")
    parts = sorted(p for p in os.listdir(out) if p.startswith("route="))
    assert parts == ["route=a", "route=b"]


def test_ivf_topk_contains_self_and_close_to_exact(emb_ds):
    from logstash_filter_translate_ray.functions.similarity import (
        brute_force_topk, ivf_topk)
    tbl = emb_ds.to_pandas()
    q = np.stack(tbl["embedding"].to_numpy())[0]
    approx = ivf_topk(emb_ds, q, k=5, n_cells=8, n_probe=3)
    exact = brute_force_topk(emb_ds, q, k=5)
    assert int(tbl["vec_id"].iloc[0]) in approx["vec_id"].tolist()
    # decent recall on a small table with 3/8 cells probed
    overlap = set(approx["vec_id"]) & set(exact["vec_id"])
    assert len(overlap) >= 2


def test_winnow_shared_substring_guarantee(ray_session):
    from logstash_filter_translate_ray.functions.text import winnow_fingerprints
    k, w = 5, 4
    a = "prefix AAA the quick brown fox jumps ZZZ suffix"
    b = "other START the quick brown fox jumps END tail!"
    fa = set(winnow_fingerprints(a, k, w))
    fb = set(winnow_fingerprints(b, k, w))
    assert fa & fb            # shared substring ≥ w+k-1 chars ⇒ shared print
    c = "completely disjoint characters 0123456789"
    assert not (fa & set(winnow_fingerprints(c, k, w)))
    # deterministic
    assert winnow_fingerprints(a, k, w) == winnow_fingerprints(a, k, w)


def test_winnow_dataset_column(docs_ds):
    from logstash_filter_translate_ray.functions.text import winnow_dataset
    out = winnow_dataset(docs_ds.limit(20)).to_pandas()
    assert out["fingerprints"].map(len).gt(0).all()


def test_embedding_neardup_exact_is_distributed_blockwise(emb_ds):
    """Exact pairs via the block cross-product must equal a local all-pairs
    reference (no driver matrix materialization in the path)."""
    from logstash_filter_translate_ray.functions.similarity import (
        embedding_neardup_pairs)
    got = embedding_neardup_pairs(emb_ds, threshold=0.4, max_blocks=4)
    tbl = emb_ds.to_pandas()
    m = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = tbl["vec_id"].to_numpy()
    sc = m @ m.T
    want = set()
    iu, ju = np.triu_indices(len(ids), 1)
    for i, j in zip(iu[sc[iu, ju] >= 0.4], ju[sc[iu, ju] >= 0.4]):
        want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert {(a, b) for a, b in zip(got["id_a"], got["id_b"])} == want


def test_embedding_neardup_lsh_recall(emb_ds):
    """LSH-blocked variant: ≥90% recall vs exact at the default params, and
    every reported pair must be a true pair with its true cosine
    (precision is exact by construction)."""
    from logstash_filter_translate_ray.functions.similarity import (
        embedding_neardup_pairs, embedding_neardup_pairs_lsh)
    exact = embedding_neardup_pairs(emb_ds, threshold=0.4)
    # the LSH path normalizes in float32 → scores differ by ~1e-7; compare
    # against a slightly loosened exact set for the precision claim
    loose = embedding_neardup_pairs(emb_ds, threshold=0.4 - 1e-5)
    # params matched to the LOW test threshold (c=0.4 → p≈0.63): r=2, L=16
    # gives 1-(1-p²)^L ≈ 0.999 expected recall. The r=4/L=12 defaults are
    # tuned for real near-dup thresholds (c≥0.9).
    approx = embedding_neardup_pairs_lsh(emb_ds, threshold=0.4,
                                         planes_per_table=2, n_tables=16)
    exact_pairs = {(a, b): c for a, b, c in
                   zip(exact["id_a"], exact["id_b"], exact["cosine"])}
    loose_pairs = {(a, b): c for a, b, c in
                   zip(loose["id_a"], loose["id_b"], loose["cosine"])}
    approx_pairs = {(a, b): c for a, b, c in
                    zip(approx["id_a"], approx["id_b"], approx["cosine"])}
    assert set(approx_pairs) <= set(loose_pairs)          # exact precision
    for p, c in approx_pairs.items():
        assert abs(c - loose_pairs[p]) < 1e-5
    recall = len(approx_pairs) / max(1, len(exact_pairs))
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(approx_pairs)}/{len(exact_pairs)})"


def test_ivf_centroid_cache_skips_kmeans(emb_ds):
    """Second ivf_topk with the same cache_key must reuse centroids
    (provably: a poisoned cache entry is what the second call returns)."""
    import numpy as np
    from logstash_filter_translate_ray.functions import similarity

    similarity._IVF_CENTROID_CACHE.clear()
    c1 = similarity.build_ivf_centroids(emb_ds, n_cells=4, cache_key="fp-x")
    assert len(similarity._IVF_CENTROID_CACHE) == 1
    c2 = similarity.build_ivf_centroids(emb_ds, n_cells=4, cache_key="fp-x")
    assert c2 is c1                      # same object → k-means skipped
    # poisoned entry is returned verbatim → the cache is authoritative
    key = next(iter(similarity._IVF_CENTROID_CACHE))
    poisoned = np.zeros_like(c1)
    similarity._IVF_CENTROID_CACHE[key] = poisoned
    assert similarity.build_ivf_centroids(emb_ds, n_cells=4,
                                          cache_key="fp-x") is poisoned
    # different fingerprint → rebuild
    c3 = similarity.build_ivf_centroids(emb_ds, n_cells=4, cache_key="fp-y")
    assert c3 is not poisoned and np.allclose(c3, c1)
    similarity._IVF_CENTROID_CACHE.clear()


def test_minlabel_components_matches_union_find(ray_session):
    """Distributed min-label propagation == driver union-find on a random
    graph (chains force multi-round propagation)."""
    import ray.data as rd
    rng = np.random.RandomState(7)
    # several chains + stars + singleton pairs
    pairs = []
    base = 0
    for clen in [2, 3, 5, 8, 13]:          # chains: diameter forces rounds
        for i in range(clen - 1):
            pairs.append((base + i, base + i + 1))
        base += clen
    for _ in range(30):                     # random extra edges
        a, b = rng.randint(0, base, 2)
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    tbl = pa.table({"id_a": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "id_b": pa.array([p[1] for p in pairs], type=pa.int64())})
    comp = dedup.connected_components(pairs)
    roots = {x: r for x, r in comp.items()}
    got = dedup.minlabel_components(rd.from_arrow(tbl)).to_pandas()
    got_map = dict(zip(got["node"], got["label"]))
    assert set(got_map) == set(roots)
    for node, label in got_map.items():
        assert label == roots[node], (node, label, roots[node])


def test_minhash_dedup_distributed_cc_matches_driver(ray_session):
    """cc='distributed' (min-label + anti-join filter) keeps the same
    survivors as the default driver union-find."""
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    texts = [base, base.replace("lazy", "sleepy"), base.replace("dog", "cat"),
             "completely different content about ray data pipelines at scale",
             "another unrelated document speaking of benchmarks and engines"]
    tbl = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                    "text": texts})
    ds = rd.from_arrow(tbl)
    kept_drv, drop_drv = dedup.minhash_dedup(ds, threshold=0.5, concurrency=1)
    kept_dist, drop_dist = dedup.minhash_dedup(ds, threshold=0.5,
                                               concurrency=1,
                                               cc="distributed")
    a = sorted(kept_drv.to_pandas()["doc_id"])
    b = sorted(kept_dist.to_pandas()["doc_id"])
    assert a == b
    assert sorted(drop_dist.to_pandas()["node"]) == drop_drv


def test_simhash_pairs_banding_recall(ray_session):
    """Pigeonhole guarantee: hamming ≤ bands-1 pairs ALWAYS share an exact
    band — banded candidates + popcount verify find exactly the brute-force
    hamming ≤ 3 pair set."""
    import itertools
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base,
             base.replace("lazy", "sleepy"),
             base.replace("dog", "cat").replace("quick", "swift"),
             "completely different content about ray pipelines at scale ok",
             base]                              # exact dup of doc 0
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts})
    got = dedup.simhash_pairs(rd.from_arrow(tbl), max_hamming=3,
                              hot_cap=None).to_pandas()
    sims = {i: dedup.simhash64(t) for i, t in enumerate(texts)}
    want = {(a, b): dedup.hamming64(sims[a], sims[b])
            for a, b in itertools.combinations(range(len(texts)), 2)
            if dedup.hamming64(sims[a], sims[b]) <= 3}
    got_map = {(a, b): h for a, b, h in
               zip(got["id_a"], got["id_b"], got["hamming"])}
    assert got_map == want
    assert (0, 4) in got_map and got_map[(0, 4)] == 0   # the exact dup


# ---------------------------------------------------------------------------
# round-3: arbitrary-k shingles, batch Jaccard, auto CC, convergence warning
# ---------------------------------------------------------------------------

def test_shingle_hashes_arbitrary_k():
    """k > 8 must work (ADVICE r3): multipliers beyond the fixed table come
    from splitmix64; k <= 8 hashes are unchanged by the extension."""
    text = "a b c d e f g h i j k l m n o p"
    for k in (3, 8, 12, 20):    # 20 > word count → single combined shingle
        sh = dedup.shingle_hashes(text, k=k)
        words = len(text.split())
        assert len(sh) == max(words - k + 1, 1)
    # pinned: extending the table must not change small-k hashes
    assert dedup._kgram_mult(3).tolist() == dedup._KGRAM_MULT[:3].tolist()
    assert dedup._kgram_mult(12)[:8].tolist() == dedup._KGRAM_MULT.tolist()
    # distinct positions get distinct odd multipliers
    m = dedup._kgram_mult(32)
    assert len(set(m.tolist())) == 32 and all(v % 2 == 1 for v in m.tolist())


def test_batch_jaccard_matches_scalar():
    """Segmented batch Jaccard == per-pair scalar on every edge shape."""
    rng = np.random.RandomState(7)
    blobs = []
    for _ in range(30):
        n = rng.randint(0, 12)
        vals = np.unique(rng.randint(0, 20, size=n).astype(np.uint64))
        blobs.append(vals.tobytes())
    blobs.append(b"")            # empty set
    a = [blobs[rng.randint(len(blobs))] for _ in range(40)] + [b"", b"x8bytes!"]
    b = [blobs[rng.randint(len(blobs))] for _ in range(40)] + [b"", b""]
    got = dedup._batch_jaccard_from_blobs(a, b)
    want = np.array([dedup._jaccard_from_blobs(x, y) for x, y in zip(a, b)])
    np.testing.assert_allclose(got, want)
    assert dedup._batch_jaccard_from_blobs([], []).shape == (0,)


def test_minhash_dedup_auto_cc(ray_session):
    """cc='auto' picks the driver path under the pair threshold and the
    distributed path above it, with identical survivors."""
    import ray.data as rd
    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = {"doc_id": [1, 2, 3],
            "text": [base, base.replace("lazy", "sleepy"),
                     "completely different content about ray data pipelines"]}
    ds = rd.from_arrow(pa.table(rows))
    kept_auto, drop_auto = dedup.minhash_dedup(ds, threshold=0.5,
                                               concurrency=1)  # auto→driver
    assert drop_auto == [2]                    # driver path: a plain list
    # force the distributed branch by dropping the threshold to 0
    old = dedup._CC_DRIVER_MAX_PAIRS
    dedup._CC_DRIVER_MAX_PAIRS = 0
    try:
        kept_dist, drop_dist = dedup.minhash_dedup(ds, threshold=0.5,
                                                   concurrency=1)
    finally:
        dedup._CC_DRIVER_MAX_PAIRS = old
    assert hasattr(drop_dist, "to_pandas")     # distributed path: a Dataset
    assert sorted(kept_dist.to_pandas()["doc_id"]) == \
        sorted(kept_auto.to_pandas()["doc_id"]) == [1, 3]


def test_minlabel_components_warns_when_unconverged(ray_session):
    """A chain whose diameter exceeds max_iters must WARN, not silently
    return under-merged labels (ADVICE r3)."""
    import ray.data as rd
    chain = pa.table({"id_a": [1, 2, 3, 4, 5, 6, 7],
                      "id_b": [2, 3, 4, 5, 6, 7, 8]})
    with pytest.warns(RuntimeWarning, match="did not converge"):
        dedup.minlabel_components(rd.from_arrow(chain), max_iters=1)


def test_winnow_batch_matches_scalar():
    """Batched winnowing == per-doc winnow_fingerprints on every edge
    shape (empty, sub-k, window-sized, long, repeated substrings)."""
    import random, string
    rng = random.Random(42)

    def rand_text(n):
        return "".join(rng.choice("ab cd" + string.ascii_lowercase[:6])
                       for _ in range(n))
    texts = ["", "a", "ab", "abcd", "abcde", "hello world hello world",
             "x" * 3, "x" * 50] + \
        [rand_text(rng.randint(0, 80)) for _ in range(120)]
    for k, w in [(5, 4), (3, 2), (7, 5)]:
        vals, ptr = text.winnow_batch(texts, k, w)
        for i, t in enumerate(texts):
            assert vals[ptr[i]:ptr[i + 1]].tolist() == \
                text.winnow_fingerprints(t, k, w), (i, repr(t), k, w)


def test_ivf_centroid_cache_invalidates_on_file_change(emb_ds, tmp_path):
    """ADVICE r3: the cache key folds (mtime, size) of the cache_key path,
    so regenerating a dataset at the same path rebuilds centroids."""
    import os
    import time
    p = tmp_path / "ds.parquet"
    p.write_bytes(b"v1 contents")
    similarity._IVF_CENTROID_CACHE.clear()
    c1 = similarity.build_ivf_centroids(emb_ds, cache_key=str(p))
    assert len(similarity._IVF_CENTROID_CACHE) == 1
    c2 = similarity.build_ivf_centroids(emb_ds, cache_key=str(p))
    assert c1 is c2                        # unchanged file ⇒ cache hit
    p.write_bytes(b"v2 contents longer")   # new size+mtime ⇒ new key
    os.utime(p, (time.time() + 5, time.time() + 5))
    c3 = similarity.build_ivf_centroids(emb_ds, cache_key=str(p))
    assert c3 is not c2
    assert len(similarity._IVF_CENTROID_CACHE) == 2
    # the cache is bounded
    assert similarity._IVF_CACHE_MAX >= 2


# ---------------------------------------------------------------------------
# cross-dataset (incremental) dedup: exact anti-join + bloom pre-filter
# ---------------------------------------------------------------------------

def test_incremental_dedup_exact(ray_session):
    import ray.data as rd
    seen = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                   "text": ["alpha", "beta"]}))
    new = rd.from_arrow(pa.table({"doc_id": [10, 11, 12, 13],
                                  "text": ["alpha", "gamma", "beta",
                                           "delta"]}))
    out = dedup.incremental_dedup(new, seen).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]        # gamma, delta survive
    assert sorted(out.columns) == ["doc_id", "text"]


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    """Every seen doc must be flagged (no false negatives); on disjoint
    new docs the drop rate stays near the theoretical FP bound."""
    import ray.data as rd
    n_seen, n_new = 2000, 2000
    seen_t = pa.table({"doc_id": list(range(n_seen)),
                       "text": [f"seen doc {i} xyz" for i in range(n_seen)]})
    new_t = pa.table({"doc_id": list(range(n_new)),
                      "text": [f"new doc {i} abc" for i in range(n_new)]})
    bloom = dedup.build_seen_bloom(rd.from_arrow(seen_t), n_bits=1 << 18,
                                   k=7)
    # no false negatives: re-filtering the seen set drops EVERYTHING
    kept_seen = dedup.bloom_filter_dedup(rd.from_arrow(seen_t),
                                         bloom).count()
    assert kept_seen == 0
    # disjoint new set: drops ≈ fp rate; (1-e^{-kn/m})^k ≈ 2.6e-6 at these
    # params — allow a generous 1% bound
    kept_new = dedup.bloom_filter_dedup(rd.from_arrow(new_t), bloom).count()
    assert kept_new >= n_new * 0.99
    # survivors of the bloom are guaranteed-new: exact verify agrees
    exact = dedup.incremental_dedup(rd.from_arrow(new_t),
                                    rd.from_arrow(seen_t)).count()
    assert exact == n_new


def test_incremental_dedup_empty_edges(ray_session):
    """Empty seen ⇒ identity; empty new ⇒ empty (Acero rejects zero-column
    empty join operands, so both short-circuit)."""
    import ray.data as rd
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    new = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["a", "b"]}))
    assert sorted(dedup.incremental_dedup(new, empty)
                  .to_pandas()["doc_id"]) == [1, 2]
    assert dedup.incremental_dedup(empty, new).count() == 0


# ---------------------------------------------------------------------------
# deterministic sampling / splitting / mixing
# ---------------------------------------------------------------------------

def test_hash_sample_deterministic_and_fractional(docs_ds):
    from logstash_filter_translate_ray.functions import sampling
    a = sorted(sampling.hash_sample(docs_ds, fraction=0.2)
               .to_pandas()["doc_id"])
    b = sorted(sampling.hash_sample(docs_ds, fraction=0.2)
               .to_pandas()["doc_id"])
    assert a == b and len(a) > 0            # same rows every run
    n = docs_ds.count()
    assert abs(len(a) / n - 0.2) < 0.1      # near the target fraction
    # monotone: a smaller fraction is a SUBSET (same bucket rule)
    small = set(sampling.hash_sample(docs_ds, fraction=0.05)
                .to_pandas()["doc_id"])
    assert small <= set(a)


def test_split_column_partition_and_stability(docs_ds):
    from logstash_filter_translate_ray.functions import sampling
    df = sampling.split_column(docs_ds).to_pandas()
    n = len(df)
    counts = df["split"].value_counts()
    assert set(counts.index) <= {"train", "val", "test"}
    assert counts.sum() == n
    assert counts["train"] > counts.get("val", 0)
    # membership is per-row stable: recompute on a shuffled subset
    sub = df.sample(frac=0.5, random_state=0)
    import ray.data as rd
    import pyarrow as pa
    re_split = sampling.split_column(
        rd.from_arrow(pa.table({"doc_id": sub["doc_id"]}))).to_pandas()
    merged = sub.merge(re_split, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["split_a"] == merged["split_b"]).all()


def test_weighted_mix_rates(docs_ds):
    from logstash_filter_translate_ray.functions import sampling
    mixed = sampling.weighted_mix([(docs_ds, 0.5), (docs_ds, 0.1)])
    df = mixed.to_pandas()
    n = docs_ds.count()
    # 0.1-sample ⊂ 0.5-sample (same rule) ⇒ every 0.1 row appears twice
    from collections import Counter
    c = Counter(df["doc_id"])
    assert abs(len([k for k in c if c[k] >= 1]) / n - 0.5) < 0.1
    assert abs(len([k for k in c if c[k] == 2]) / n - 0.1) < 0.05


def test_knn_join_matches_numpy(emb_ds):
    """Exact k-NN join == local numpy reference (incl. id-asc tie-break)."""
    from logstash_filter_translate_ray.functions.similarity import knn_join
    got = knn_join(emb_ds, k=3)
    t = emb_ds.to_pandas()
    ids = t["vec_id"].to_numpy()
    m = np.stack(t["embedding"].to_numpy())
    mn = (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float64)
    s = mn @ mn.T
    np.fill_diagonal(s, -np.inf)
    g = got.set_index(["vec_id", "nn_rank"])["neighbor_id"]
    for r in range(len(ids)):
        order = np.lexsort((ids, -s[r]))[:3]
        for rank, nb in enumerate(order, 1):
            assert g.loc[(ids[r], rank)] == ids[nb]


# ---------------------------------------------------------------------------
# sketches: HyperLogLog distinct counting
# ---------------------------------------------------------------------------

def test_hll_accuracy_and_merge(ray_session):
    """Estimate within ~3σ of the true distinct count at several
    cardinalities; splitting a corpus into partial sketches and merging
    gives the SAME registers as one pass (associativity)."""
    import ray.data as rd
    from logstash_filter_translate_ray.functions.sketch import (
        HyperLogLog, approx_distinct)
    import pandas as pd_
    for true_n in (100, 5_000, 100_000):
        vals = np.asarray([f"v{i}" for i in range(true_n)] * 2,
                          dtype=object)                 # dups don't count
        one = HyperLogLog()
        one.add_hashes(pd_.util.hash_array(vals))
        est = one.estimate()
        sigma = 1.04 / np.sqrt(one.m)
        assert abs(est - true_n) / true_n < 3 * sigma + 0.01, (true_n, est)
        # merge of halves == single pass (register-exact)
        a, b = HyperLogLog(), HyperLogLog()
        a.add_hashes(pd_.util.hash_array(vals[: len(vals) // 2]))
        b.add_hashes(pd_.util.hash_array(vals[len(vals) // 2:]))
        assert np.array_equal(a.merge(b).registers, one.registers)
    # dataset wrapper over real blocks
    tbl = pa.table({"k": [f"u{i % 3000}" for i in range(10_000)]})
    est = approx_distinct(rd.from_arrow(tbl).repartition(8), "k")
    assert abs(est - 3000) / 3000 < 0.06


# ---------------------------------------------------------------------------
# real pure-numpy codecs (uncompressed formats)
# ---------------------------------------------------------------------------

def test_ppm_bmp_wav_roundtrip():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 7, 3)).astype(np.uint8)
    assert np.array_equal(multimodal.decode_ppm(multimodal.encode_ppm(img)),
                          img)
    assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(img)),
                          img)
    samples = (rng.randn(1234) * 3000).astype(np.int16)
    out, rate = multimodal.decode_wav(multimodal.encode_wav(samples, 8000))
    assert rate == 8000 and np.array_equal(out, samples)
    # comment + multi-space PPM headers parse too
    hdr = b"P6\n# a comment\n7  13\n255\n" + img.tobytes()
    assert np.array_equal(multimodal.decode_ppm(hdr), img)


def test_real_decode_and_resize_through_ray(ray_session):
    """Actor-pool decode + REAL pixel resize over mixed-format payloads."""
    import ray.data as rd
    rng = np.random.RandomState(5)
    img_big = rng.randint(0, 256, (64, 48, 3)).astype(np.uint8)
    img_small = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    wav = (rng.randn(16000) * 8000).astype(np.int16)
    tbl = pa.table({
        "media_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array([multimodal.encode_ppm(img_big),
                             multimodal.encode_bmp(img_small),
                             multimodal.encode_wav(wav, 16000)],
                            type=pa.binary()),
        "media_type": pa.array(["image", "image", "audio"]),
        "width": pa.array([48, 8, None], type=pa.int32()),
        "height": pa.array([64, 8, None], type=pa.int32()),
        "sample_rate": pa.array([None, None, 16000], type=pa.int32()),
    })
    ds = rd.from_arrow(tbl)
    feats = multimodal.decode_features_dataset(
        ds, concurrency=1, use_real_codecs=True).to_pandas() \
        .set_index("media_id")
    # image features: channel means in [0,1]; audio: duration == 1.0 s
    f1 = feats.loc[1, "features"]
    assert 0.3 < f1[0] < 0.7 and abs(f1[0] - img_big[..., 0].mean() / 255) < 1e-3
    f3 = feats.loc[3, "features"]
    assert abs(f3[2] - 1.0) < 1e-6              # 16000 samples @ 16 kHz
    resized = multimodal.resize_dataset(
        ds, max_side=32, concurrency=1, use_real_codecs=True).to_pandas() \
        .set_index("media_id")
    out_img = multimodal.decode_ppm(resized.loc[1, "payload"])
    assert out_img.shape == (32, 24, 3)         # 64x48 → fit 32
    assert (resized.loc[1, "resized_width"],
            resized.loc[1, "resized_height"]) == (24, 32)
    # nearest-neighbor: every output pixel exists in the source
    assert np.array_equal(out_img[0, 0],
                          img_big[0, 0])        # corner maps to corner
    small_out = multimodal.decode_bmp(resized.loc[2, "payload"])
    assert small_out.shape == (8, 8, 3)         # under max_side: unchanged
    assert bytes(resized.loc[3, "payload"])[:4] == b"RIFF"  # passthrough


def test_incremental_dedup_join_path_matches_broadcast(ray_session):
    """The shuffle-join path (big seen sets) keeps the same survivors as
    the broadcast semi-join path."""
    import ray.data as rd
    seen = rd.from_arrow(pa.table({"doc_id": [1, 2],
                                   "text": ["alpha", "beta"]}))
    new = rd.from_arrow(pa.table({"doc_id": [10, 11, 12, 13],
                                  "text": ["alpha", "gamma", "beta",
                                           "delta"]}))
    a = sorted(dedup.incremental_dedup(new, seen).to_pandas()["doc_id"])
    old = dedup._BROADCAST_MAX_SEEN
    dedup._BROADCAST_MAX_SEEN = 0            # force the join path
    try:
        b = sorted(dedup.incremental_dedup(new, seen)
                   .to_pandas()["doc_id"])
    finally:
        dedup._BROADCAST_MAX_SEEN = old
    assert a == b == [11, 13]


def test_repetition_scores():
    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["a a a b",               # 2/4 words duplicated
                           "x\ny\nx\nx",            # 2/4 lines duplicated
                           "all distinct words"]})
    out = text.repetition_batch(t)
    assert out["dup_word_frac"].to_pylist() == [0.5, 0.5, 0.0]
    assert out["dup_line_frac"].to_pylist() == [0.0, 0.5, 0.0]


def test_hll_rank_exact_at_power_of_two_boundaries():
    """floor(log2) must be integer-exact: naive float log2 rounds up a few
    ulps below powers of two (found in round-3 review; fixed with a 32-bit
    split + frexp)."""
    from logstash_filter_translate_ray.functions.sketch import HyperLogLog
    for p in (4, 12, 16):
        sb = 64 - p
        for k in (1, 31, 32, 33, sb - 1):
            if k >= sb:
                continue
            for w in ((1 << k), (1 << k) - 1):
                if w == 0:
                    continue
                h = HyperLogLog(p)
                h.add_hashes(np.array([w], dtype=np.uint64))
                assert int(h.registers[0]) == sb - (w.bit_length() - 1), \
                    (p, k, w)


def test_incremental_dedup_drop_broadcast_path(ray_session):
    """Big-seen / small-dropped regime: the slim inner join finds dropped
    ids and broadcasts them back — the text column never joins."""
    import ray.data as rd
    seen = rd.from_arrow(pa.table({"doc_id": [1, 2, 3],
                                   "text": ["alpha", "beta", "gamma"]}))
    new = rd.from_arrow(pa.table({"doc_id": [10, 11],
                                  "text": ["beta", "delta"]}))
    old = dedup._BROADCAST_MAX_SEEN
    dedup._BROADCAST_MAX_SEEN = 2      # seen(3) > 2 → join; drop(1) ≤ 2
    try:
        out = sorted(dedup.incremental_dedup(new, seen)
                     .to_pandas()["doc_id"])
    finally:
        dedup._BROADCAST_MAX_SEEN = old
    assert out == [11]


def test_png_round_trip_all_filters_and_color_types():
    """REAL pure-numpy+zlib PNG codec: encode/decode round-trips exactly
    for gray, RGB and RGBA across ALL five spec filter types (the encoder
    can emit each filter so every unfilter path is driven with
    spec-defined inputs, not just the filter-0 fast path)."""
    rng = np.random.RandomState(3)
    for shape in [(13, 7), (13, 7, 3), (13, 7, 4), (1, 1, 3), (2, 300, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for f in range(5):
            p = multimodal.encode_png(img, row_filter=f)
            assert multimodal.sniff_format(p) == "png"
            assert np.array_equal(multimodal.decode_png(p), img), (shape, f)
    # smooth gradient: filter deltas are non-trivial numbers here
    grad = np.tile(np.arange(256, dtype=np.uint8), (8, 1))[:, :, None] \
        .repeat(3, 2)
    for f in range(5):
        assert np.array_equal(
            multimodal.decode_png(multimodal.encode_png(grad, row_filter=f)),
            grad)


def test_png_external_fixture_and_gates():
    """An externally-published minimal 1x1 RGBA PNG decodes (independent
    of our own encoder); unsupported variants raise the honest gate."""
    import base64

    import pytest
    p = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg==")
    img = multimodal.decode_png(p)
    assert img.shape == (1, 1, 4) and img.dtype == np.uint8
    # palette PNG (color type 3) → honest NotImplementedError
    import struct
    import zlib
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n"
           + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
           + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(NotImplementedError, match="PNG"):
        multimodal.decode_png(bad)


def test_png_through_feature_and_resize_stages(ray_session):
    """PNG payloads flow through the REAL-codec feature and resize stages
    like PPM/BMP: features come from decoded pixels (gray expands to 3
    channels, RGBA drops alpha), resize re-encodes PNG preserving the
    color type."""
    import ray.data as rd
    rng = np.random.RandomState(9)
    rgb = rng.randint(0, 256, (40, 60, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (32, 16)).astype(np.uint8)
    rgba = rng.randint(0, 256, (20, 20, 4)).astype(np.uint8)
    tbl = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "payload": pa.array([multimodal.encode_png(x)
                             for x in (rgb, gray, rgba)], type=pa.binary()),
        "media_type": pa.array(["image"] * 3, type=pa.string()),
        "width": pa.array([60, 16, 20], type=pa.int32()),
        "height": pa.array([40, 32, 20], type=pa.int32()),
        "sample_rate": pa.array([None] * 3, type=pa.int32()),
    }, schema=multimodal.MEDIA_SCHEMA)
    feats = multimodal.decode_features_dataset(
        rd.from_arrow(tbl), use_real_codecs=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    want_mean = rgb[:, :, 0].astype(np.float64).mean() / 255.0
    assert abs(feats.loc[0, "features"][0] - want_mean) < 1e-6
    gray_mean = gray.astype(np.float64).mean() / 255.0
    for c in range(3):      # gray replicates across channels
        assert abs(feats.loc[1, "features"][c] - gray_mean) < 1e-6

    resized = multimodal.resize_dataset(
        rd.from_arrow(tbl), max_side=16, use_real_codecs=True).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    out0 = multimodal.decode_png(resized.loc[0, "payload"])
    assert out0.shape == (10, 16, 3)            # 60x40 → 16x10, still RGB
    out2 = multimodal.decode_png(resized.loc[2, "payload"])
    assert out2.shape == (16, 16, 4)            # RGBA preserved
    assert (resized.loc[0, "resized_width"],
            resized.loc[0, "resized_height"]) == (16, 10)


def test_rawv_roundtrip_and_single_frame_read():
    rng = np.random.RandomState(7)
    frames = rng.randint(0, 256, (9, 12, 16, 3)).astype(np.uint8)
    payload = multimodal.encode_rawv(frames)
    assert multimodal.rawv_info(payload) == (9, 16, 12)
    for k in (0, 4, 8):
        assert np.array_equal(multimodal.decode_rawv_frame(payload, k),
                              frames[k])
    with pytest.raises(IndexError):
        multimodal.decode_rawv_frame(payload, 9)
    with pytest.raises(ValueError):
        multimodal.rawv_info(b"NOPE" + payload[4:])


def test_frame_sample_stage(ray_session):
    """Video rows fan out to one PPM row per sampled frame; non-video
    rows pass through unsampled (frame_idx -1); the sampled frames'
    pixels round-trip exactly; compressed containers raise; composes
    with DecodeFeatureStage downstream."""
    import ray.data as rd
    vids = multimodal.make_fake_videos(3, n_frames=24, w=8, h=6, seed=3)
    audio = multimodal.make_fake_media(20, seed=5).filter(
        pa.compute.equal(pa.compute.field("media_type"), "audio")).slice(0, 2)
    src = pa.concat_tables([
        vids, audio.set_column(0, "media_id",
                               pa.array([100 + i for i in range(len(audio))],
                                        type=pa.int64()))])
    out = multimodal.frame_sample_dataset(
        rd.from_arrow(src).repartition(3), every=10).to_pandas()
    v = out[out["frame_idx"] >= 0]
    assert sorted(v["frame_idx"].unique().tolist()) == [0, 10, 20]
    assert len(v) == 3 * 3 and set(v["media_type"]) == {"image"}
    # pixel-exact: sampled frame k re-decodes to the source frame k
    p0 = vids["payload"][0].as_py()
    row = v[(v["media_id"] == 0) & (v["frame_idx"] == 10)].iloc[0]
    assert np.array_equal(multimodal.decode_ppm(row["payload"]),
                          multimodal.decode_rawv_frame(p0, 10))
    # pass-through rows keep their metadata
    a = out[out["frame_idx"] < 0]
    assert len(a) == len(audio) and set(a["media_type"]) == {"audio"}
    assert a["sample_rate"].notna().all()
    # frames compose with the image feature stage
    feats = multimodal.decode_features_dataset(
        rd.from_arrow(pa.Table.from_pandas(v[multimodal.MEDIA_SCHEMA.names],
                                           preserve_index=False)),
        use_real_codecs=True).to_pandas()
    assert len(feats) == 9 and feats["features"].map(len).eq(9).all()
    # honest gate for compressed containers
    bad = vids.set_column(1, "payload",
                          pa.array([b"\x00\x00\x00 ftypmp42" + b"x" * 64] * 3,
                                   type=pa.binary()))
    with pytest.raises(Exception) as ei:
        multimodal.frame_sample_dataset(rd.from_arrow(bad)).to_pandas()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)
