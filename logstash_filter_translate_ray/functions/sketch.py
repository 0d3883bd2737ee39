"""Mergeable sketches for whole-corpus statistics at 100 TB scale.

HyperLogLog distinct counting: per-block register partials computed in
``map_batches`` (fully vectorized — hashes from the repo-standard fixed-key
siphash, ranks via exact float64 log2 on the 52-bit suffix), merged by an
element-wise max (associative + commutative ⇒ retry/ordering-safe), and
estimated once on the driver. The sketch is ``2^p`` bytes total no matter
how many rows it summarizes; standard error ≈ 1.04/√(2^p) (~1.6% at the
default p=12). Ranks come from exact integer-width floor(log2) — see
``add_hashes``.

An EXACT distinct count at scale is the ``exact_dedup_ids`` groupby shape;
this sketch answers the same question with zero shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_DEFAULT_P = 12


class HyperLogLog:
    """Classic HLL (Flajolet et al.) over 64-bit hashes, p index bits.

    Rank extraction is EXACT for any p: the suffix splits into 32-bit
    halves (each float64-exact) before the frexp exponent is read."""

    def __init__(self, p: int = _DEFAULT_P,
                 registers: "np.ndarray | None" = None):
        if not 4 <= p <= 16:
            raise ValueError("p must be in [4, 16]")
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None \
            else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        if not len(h):
            return
        h = h.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        # rank = leading zeros of the (64-p)-bit suffix + 1
        #      = (64-p) - floor(log2(w)) for w > 0; w == 0 → (64-p) + 1.
        # floor(log2) must be EXACT: np.log2 + floor rounds UP a few ulps
        # below powers of two (floor(log2(2^52-1)) would come out 52), and
        # even frexp is only exact below 2^53. Split into 32-bit halves —
        # each converts to float64 exactly — and take frexp exponents.
        rho = np.empty(len(h), dtype=np.uint8)
        nz = w > 0
        wn = w[nz]
        hi = (wn >> np.uint64(32)).astype(np.float64)
        lo = (wn & np.uint64(0xFFFFFFFF)).astype(np.float64)
        _, ehi = np.frexp(hi)
        _, elo = np.frexp(lo)
        flog2 = np.where(hi > 0, 32 + ehi - 1, elo - 1)
        rho[nz] = (64 - self.p) - flog2
        rho[~nz] = (64 - self.p) + 1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches of different p")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        raw = alpha * m * m / np.sum(
            np.power(2.0, -self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)       # linear counting
        return float(raw)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int = _DEFAULT_P) -> "HyperLogLog":
        return cls(p, np.frombuffer(blob, dtype=np.uint8).copy())


def approx_distinct(ds, col: str, p: int = _DEFAULT_P) -> float:
    """Approximate COUNT(DISTINCT col) with one streaming pass and zero
    shuffle: per-block HLL partials (one 2^p-byte blob row each), max-merge
    on the driver. Values hash via the repo-standard fixed-key siphash
    (``pd.util.hash_array`` — stable across processes/nodes)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        c = c.drop_null()
        hll = HyperLogLog(p)
        if len(c):
            if pa.types.is_integer(c.type) or pa.types.is_floating(c.type):
                # numeric: hash the C buffer directly — no Python objects
                h = pd.util.hash_array(
                    np.asarray(c.to_numpy(zero_copy_only=False)))
            else:
                # strings (and anything castable): hash only the UNIQUE
                # values via dictionary_encode, then fan the digest back
                # out by code — the same unique-only trick as the MinHash
                # vocabulary hashing (the old per-row str() listcomp was
                # the block cost at 16M rows)
                try:
                    if not (pa.types.is_string(c.type)
                            or pa.types.is_large_string(c.type)):
                        c = pc.cast(c, pa.string())
                    enc = c.dictionary_encode()
                    dh = pd.util.hash_array(np.asarray(
                        enc.dictionary.to_pylist(), dtype=object))
                    h = dh[enc.indices.to_numpy(zero_copy_only=False)]
                except pa.ArrowInvalid:        # uncastable exotic type
                    h = pd.util.hash_array(np.asarray(
                        [str(v) for v in c.to_pylist()], dtype=object))
            hll.add_hashes(h)
        return pa.table({"blob": pa.array([hll.to_bytes()],
                                          type=pa.binary())})

    out = HyperLogLog(p)
    for batch in ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=None).iter_batches(
                                    batch_format="pyarrow"):
        for blob in batch["blob"].to_pylist():
            out.merge(HyperLogLog.from_bytes(blob, p))
    return out.estimate()
