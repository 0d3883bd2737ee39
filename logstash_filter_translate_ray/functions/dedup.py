"""Deduplication operators over the ``documents`` table.

- exact:   content-hash → hash-partitioned groupby → per-group first
- minhash: shingle → minhash signature → banded LSH buckets → candidate
           pairs → Jaccard verify → connected components
- simhash: 64-bit simhash, banded for hamming-distance blocking
- ngram_jaccard: shared-shingle candidate generation + exact Jaccard verify

Scale notes (SURVEY 'Aggregation at scale' pattern): signatures are computed
embarrassingly-parallel in ``map_batches``; the only shuffles are groupbys
on (band_id, band_hash) whose cardinality ≈ docs × bands but whose rows are
tiny (three ints). Candidate-pair verification happens inside the bucket
groups. Connected components run on the driver over candidate PAIRS only —
valid while duplicate clusters are sparse (the common case); the docstring
of :func:`connected_components` states the assumption.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterable, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_content_hash(tbl: pa.Table, col: str = "text",
                     out: str = "content_hash") -> pa.Table:
    texts = tbl[col].to_pylist()
    h = [hashlib.sha1((t or "").encode()).hexdigest() for t in texts]
    return tbl.append_column(out, pa.array(h, type=pa.string()))


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct content (hash-partition + per-group
    first). The groupby shuffles only (hash, id) pairs logically; Ray Data
    hash-partitions the blocks by the groupby key."""
    hashed = ds.map_batches(lambda t: add_content_hash(t, col),
                            batch_format="pyarrow", batch_size=None)

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash") \
        .map_groups(first_per_group, batch_format="pandas") \
        .drop_columns(["content_hash"])


# ---------------------------------------------------------------------------
# shingles + minhash
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles → uint64 hashes (crc32 pairs, deterministic)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        e = s.encode()
        out[i] = (zlib.crc32(e) << 32) | zlib.crc32(e[::-1])
    return out


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod p universal-hash minima — one numpy matmul-shaped op
    per doc, no Python per shingle."""
    x = sh.astype(np.int64)[None, :]            # 1 × S
    hv = (a[:, None] * x + b[:, None]) % _MERSENNE   # P × S
    return hv.min(axis=1)


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, col: str = "text", id_col: str = "doc_id",
                 k: int = 3, num_perm: int = 64, bands: int = 16, seed: int = 42):
        assert num_perm % bands == 0
        self.col, self.id_col = col, id_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        """doc → (bands) rows of (id, band_id, band_hash)."""
        texts = tbl[self.col].to_pylist()
        ids = tbl[self.id_col].to_pylist()
        out_id, out_band, out_hash = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(shingle_hashes(t or "", self.k),
                                    self.a, self.b)
            for bnd in range(self.bands):
                seg = sig[bnd * self.rows_per_band:(bnd + 1) * self.rows_per_band]
                bh = zlib.crc32(seg.tobytes())
                out_id.append(ids[i])
                out_band.append(bnd)
                out_hash.append(bh)
        return pa.table({
            self.id_col: pa.array(out_id),
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
        })


def minhash_candidate_pairs(ds, col: str = "text", id_col: str = "doc_id",
                            k: int = 3, num_perm: int = 64, bands: int = 16,
                            concurrency: int = 4):
    """Banded-LSH candidate pairs: (id_a, id_b) with id_a < id_b that share
    at least one band bucket."""
    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, k=k,
                                   num_perm=num_perm, bands=bands),
        batch_format="pyarrow", batch_size=None, concurrency=concurrency)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids))
                     for j in range(i + 1, len(ids))])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    pairs = banded.groupby(["band_id", "band_hash"]) \
        .map_groups(pairs_in_bucket, batch_format="pandas")
    return pairs


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def connected_components(pairs: Iterable[tuple]) -> dict:
    """Driver-side union-find over candidate PAIRS (not docs). Valid while
    the verified-duplicate pair set fits the driver (sparse duplicates —
    at 100 TB run the min-label-propagation groupby variant instead)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in list(parent)}


def minhash_dedup(ds, col: str = "text", id_col: str = "doc_id",
                  k: int = 3, num_perm: int = 64, bands: int = 16,
                  threshold: float = 0.8, concurrency: int = 4):
    """Full near-dup pipeline: LSH candidates → Jaccard verify (against a
    broadcast id→text lookup for the candidate ids only) → keep min-id per
    component. Returns (deduped_dataset, dropped_id_list)."""
    import ray

    pairs_ds = minhash_candidate_pairs(ds, col, id_col, k, num_perm, bands,
                                       concurrency)
    pairs = pairs_ds.to_pandas().drop_duplicates()
    if len(pairs) == 0:
        return ds, []
    cand_ids = set(pairs["id_a"]) | set(pairs["id_b"])
    # fetch candidate texts only (semi-join via broadcast id set)
    ids_ref = ray.put(cand_ids)

    def only_candidates(t: pa.Table) -> pa.Table:
        idset = ray.get(ids_ref)
        mask = pa.array([i in idset for i in t[id_col].to_pylist()])
        return t.filter(mask)

    cand = ds.map_batches(only_candidates, batch_format="pyarrow", batch_size=None) \
        .select_columns([id_col, col]).to_pandas()
    text_of = dict(zip(cand[id_col], cand[col]))
    verified = [(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])
                if jaccard(text_of.get(a, ""), text_of.get(b, ""), k) >= threshold]
    comp = connected_components(verified)
    drop = sorted(x for x, root in comp.items() if root != x)
    drop_ref = ray.put(set(drop))

    def keep(t: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pa.array([i not in d for i in t[id_col].to_pylist()])
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=None), drop


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def _token_hash64(w: str) -> int:
    e = w.encode()
    return (zlib.crc32(e) << 32) | zlib.crc32(e[::-1])


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (crc32-derived token hashes)."""
    words = text.split()
    if not words:
        return 0
    h = np.array([_token_hash64(w) for w in words], dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)          # T × 64
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) <<
                np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash_batch(tbl: pa.Table, col: str = "text",
                  out: str = "simhash") -> pa.Table:
    """Batch-vectorized SimHash: ONE token pass for the whole batch —
    per-token crc32 (C speed), then a single (T × 64) bit matrix and a
    segmented sum per doc (np.add.at) instead of per-word Python."""
    texts = tbl[col].to_pylist()
    tokens: list[str] = []
    doc_of: list[int] = []
    for i, t in enumerate(texts):
        ws = (t or "").split()
        tokens.extend(ws)
        doc_of.extend([i] * len(ws))
    n = len(texts)
    if not tokens:
        return tbl.append_column(out, pa.array(np.zeros(n, dtype=np.int64)))
    h = np.array([_token_hash64(w) for w in tokens], dtype=np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) &
            np.uint64(1)).astype(np.int64)          # T × 64
    contrib = 2 * bits - 1
    acc = np.zeros((n, 64), dtype=np.int64)
    np.add.at(acc, np.asarray(doc_of), contrib)
    vals = ((acc > 0).astype(np.uint64) <<
            np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return tbl.append_column(out, pa.array(vals.view(np.int64)))


def simhash_dataset(ds, col: str = "text"):
    return ds.map_batches(lambda t: simhash_batch(t, col),
                          batch_format="pyarrow", batch_size=None)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (shared-shingle blocking)
# ---------------------------------------------------------------------------

class ShingleExplode:
    def __init__(self, col: str = "text", id_col: str = "doc_id", k: int = 3,
                 sample_mod: int = 4):
        self.col, self.id_col, self.k = col, id_col, k
        self.sample_mod = sample_mod  # keep 1/mod shingles (cheap blocking)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids, sh = [], []
        for i, t in zip(tbl[self.id_col].to_pylist(), tbl[self.col].to_pylist()):
            hs = shingle_hashes(t or "", self.k)
            keep = hs[hs % self.sample_mod == 0]
            ids.extend([i] * len(keep))
            sh.extend(keep.view(np.int64).tolist())
        return pa.table({self.id_col: pa.array(ids),
                         "shingle": pa.array(sh, type=pa.int64())})


def ngram_jaccard_pairs(ds, col: str = "text", id_col: str = "doc_id",
                        k: int = 3, threshold: float = 0.5,
                        concurrency: int = 4):
    """Candidate pairs sharing ≥1 sampled shingle, then exact Jaccard —
    returns a pandas frame (id_a, id_b, jaccard ≥ threshold)."""
    exploded = ds.map_batches(
        ShingleExplode, fn_constructor_kwargs=dict(col=col, id_col=id_col, k=k),
        batch_format="pyarrow", batch_size=None, concurrency=concurrency)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2 or len(ids) > 200:   # skip degenerate hot buckets
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        a, b = zip(*[(ids[i], ids[j]) for i in range(len(ids))
                     for j in range(i + 1, len(ids))])
        return pd.DataFrame({"id_a": list(a), "id_b": list(b)})

    pairs = exploded.groupby("shingle") \
        .map_groups(bucket_pairs, batch_format="pandas").to_pandas() \
        .drop_duplicates()
    if len(pairs) == 0:
        return pairs.assign(jaccard=pd.Series([], dtype="float64"))
    texts = ds.select_columns([id_col, col]).to_pandas()
    text_of = dict(zip(texts[id_col], texts[col]))
    jac = [jaccard(text_of.get(a, ""), text_of.get(b, ""), k)
           for a, b in zip(pairs["id_a"], pairs["id_b"])]
    pairs = pairs.assign(jaccard=jac)
    return pairs[pairs["jaccard"] >= threshold].reset_index(drop=True)
