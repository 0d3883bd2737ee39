"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  ``ray.put`` ONCE (broadcast), every batch does one numpy matmul, emits
  only its local top-k, and the driver merges tiny partials (never the
  full score matrix).
- :class:`LshIndexStage` / :func:`lsh_topk` — the scale path: seeded
  random-hyperplane signatures bucket vectors; queries probe only their
  own bucket (+ optional hamming-1 neighbors). Bucketing is a plain
  ``map_batches`` + filter, no shuffle.
"""

from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa


def _batch_matrix(tbl: pa.Table, vec_col: str) -> np.ndarray:
    col = tbl[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    dim = len(flat) // len(tbl)
    return flat.reshape(len(tbl), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds, query: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact cosine top-k of ``query`` (1 × D or Q × D) against the dataset.
    Returns a pandas frame (query_idx, vec_id, score) of Q×k rows."""
    import ray

    q = np.atleast_2d(np.asarray(query, dtype=np.float32))
    qn = _normalize(q)
    q_ref = ray.put(qn)

    def local_topk(tbl: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)                       # zero-copy per node
        m = _normalize(_batch_matrix(tbl, vec_col))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        scores = qm @ m.T                          # Q × B
        kk = min(k, scores.shape[1])
        top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
        qi, vid, sc = [], [], []
        for qidx in range(scores.shape[0]):
            sel = top[qidx]
            qi.extend([qidx] * len(sel))
            vid.extend(ids[sel].tolist())
            sc.extend(scores[qidx, sel].tolist())
        return pa.table({"query_idx": pa.array(qi, type=pa.int32()),
                         id_col: pa.array(vid),
                         "score": pa.array(sc, type=pa.float32())})

    partials = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None).to_pandas()
    out = partials.sort_values(["query_idx", "score"],
                               ascending=[True, False]) \
        .groupby("query_idx", as_index=False).head(k).reset_index(drop=True)
    return out


def embedding_neardup_pairs(ds, threshold: float = 0.9,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id"):
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with cosine
    ≥ threshold.

    Implementation: the normalized matrix is broadcast (``ray.put`` once);
    each batch computes its rows against the full matrix — one numpy matmul
    per batch, emitting only the above-threshold pairs. O(N²) work split
    across batches; for 100 TB-scale N, route through
    :class:`LshIndexStage` buckets first (compare only within a bucket and
    its hamming-1 neighbors) — same per-batch kernel, candidate set shrunk
    by ~2^n_planes.
    """
    import ray

    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    m_all = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids_all, m_all))

    def batch_pairs(tbl: pa.Table) -> pa.Table:
        ids_g, m_g = ray.get(ref)
        mine = _normalize(_batch_matrix(tbl, vec_col).astype(np.float64))
        my_ids = tbl[id_col].to_numpy(zero_copy_only=False)
        scores = mine @ m_g.T
        ia, ib, sc = [], [], []
        for r in range(scores.shape[0]):
            hits = np.nonzero(scores[r] >= threshold)[0]
            for h in hits:
                if my_ids[r] < ids_g[h]:
                    ia.append(int(my_ids[r]))
                    ib.append(int(ids_g[h]))
                    sc.append(float(scores[r, h]))
        return pa.table({"id_a": pa.array(ia, type=pa.int64()),
                         "id_b": pa.array(ib, type=pa.int64()),
                         "cosine": pa.array(sc, type=pa.float64())})

    return ds.map_batches(batch_pairs, batch_format="pyarrow",
                          batch_size=None).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)


class LshIndexStage:
    """Random-hyperplane signature stage: ``__init__`` draws the (seeded)
    hyperplanes once per actor; ``__call__`` adds a bucket column."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42,
                 vec_col: str = "embedding"):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(dim, n_planes).astype(np.float32)
        self.vec_col = vec_col

    def signature(self, m: np.ndarray) -> np.ndarray:
        return ((m @ self.planes) > 0) @ (1 << np.arange(self.planes.shape[1]))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        m = _batch_matrix(tbl, self.vec_col)
        sig = self.signature(m).astype(np.int64)
        return tbl.append_column("lsh_bucket", pa.array(sig))


def build_ivf_centroids(ds, n_cells: int = 16, sample_n: int = 2048,
                        iters: int = 10, seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """Driver-side k-means on a seeded sample → IVF coarse centroids.

    The sample (≤ sample_n rows) is the only data pulled to the driver;
    Lloyd iterations are numpy matmuls. Deterministic (seeded init, no
    wall-clock)."""
    sample = ds.limit(sample_n).to_pandas()
    m = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_cells, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(ds, query: np.ndarray, k: int = 10, n_cells: int = 16,
             n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF approximate top-k: assign every vector to its nearest coarse
    centroid (one matmul per batch against the broadcast centroids), search
    only the ``n_probe`` cells nearest the query. The scale path for ANN:
    candidate set shrinks ~n_cells/n_probe-fold; centroids build once."""
    import ray

    q = np.atleast_2d(np.asarray(query, dtype=np.float64))
    qn = _normalize(q)
    cent = build_ivf_centroids(ds, n_cells, seed=seed, vec_col=vec_col)
    cent_ref = ray.put(cent)
    probe_cells = set(np.argsort(-(qn @ cent.T))[0][:n_probe].tolist())
    probe_ref = ray.put(probe_cells)

    def keep_probed(tbl: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        cells = ray.get(probe_ref)
        m = _normalize(_batch_matrix(tbl, vec_col).astype(np.float64))
        assign = np.argmax(m @ c.T, axis=1)
        mask = pa.array(np.isin(assign, list(cells)))
        return tbl.filter(mask)

    cand = ds.map_batches(keep_probed, batch_format="pyarrow",
                          batch_size=None)
    return brute_force_topk(cand, q, k, vec_col, id_col)


def lsh_topk(ds, query: np.ndarray, k: int = 10, dim: Optional[int] = None,
             n_planes: int = 8, seed: int = 42, probe_hamming1: bool = True,
             vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency: int = 2):
    """Approximate cosine top-k: probe only the query's LSH bucket (and its
    hamming-1 neighbors). Recall < 1.0 by design; n_planes trades recall
    for candidate-set size."""
    q = np.atleast_2d(np.asarray(query, dtype=np.float32))
    if dim is None:
        dim = q.shape[1]
    stage = LshIndexStage(dim, n_planes, seed, vec_col)
    bucketed = ds.map_batches(
        LshIndexStage,
        fn_constructor_kwargs=dict(dim=dim, n_planes=n_planes, seed=seed,
                                   vec_col=vec_col),
        batch_format="pyarrow", batch_size=None, concurrency=concurrency)
    q_sig = int(stage.signature(_normalize(q))[0])
    probes = {q_sig}
    if probe_hamming1:
        probes |= {q_sig ^ (1 << b) for b in range(n_planes)}

    import pyarrow.compute as pc
    probe_arr = pa.array(sorted(probes), type=pa.int64())
    cand = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["lsh_bucket"], value_set=probe_arr)),
        batch_format="pyarrow", batch_size=None)
    return brute_force_topk(cand, q, k, vec_col, id_col)
