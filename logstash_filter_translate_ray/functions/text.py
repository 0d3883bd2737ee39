"""Text analysis over the ``documents`` table — language-ID, quality
scoring, token counting, document fingerprinting.

All stages are stateless ``map_batches`` transforms over zero-copy Arrow
with RE2 kernels (``pc.count_substring_regex``) — no Python in the per-row
path except the fingerprint's C-speed crc32 loop.
"""

from __future__ import annotations

import zlib
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

WS_TOKEN_RE = r"\S+"
# BPE-ish pre-tokenizer (GPT-2 style simplification): letter runs, digit
# runs, or single non-space punctuation
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_batch(tbl: pa.Table, col: str = "text") -> pa.Table:
    c = tbl[col]
    ws = pc.count_substring_regex(c, pattern=WS_TOKEN_RE)
    bpe = pc.count_substring_regex(c, pattern=BPE_TOKEN_RE)
    tbl = tbl.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
    tbl = tbl.append_column("n_tokens_bpe", pc.cast(bpe, pa.int64()))
    return tbl


def token_count_dataset(ds, col: str = "text"):
    return ds.map_batches(lambda t: token_count_batch(t, col),
                          batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "that", "for")
_STOP_RE = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"[^\w\s]"


def quality_batch(tbl: pa.Table, col: str = "text") -> pa.Table:
    """length / punctuation-ratio / stopword-ratio quality features and a
    [0,1] composite score (heuristics in the C4/Gopher style: too-short,
    punctuation-heavy and stopword-free text scores low)."""
    c = tbl[col]
    n_chars = pc.cast(pc.utf8_length(c), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(c, pattern=WS_TOKEN_RE),
                      pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(c, pattern=_PUNCT_RE),
                      pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(c, pattern=_STOP_RE),
                     pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    safe_words = pc.max_element_wise(n_words, pa.scalar(1.0))
    punct_ratio = pc.divide(n_punct, safe_chars)
    stop_ratio = pc.divide(n_stop, safe_words)
    len_score = pc.min_element_wise(pc.divide(n_chars, pa.scalar(200.0)),
                                    pa.scalar(1.0))
    score = pc.multiply(
        len_score,
        pc.multiply(pc.subtract(pa.scalar(1.0),
                                pc.min_element_wise(punct_ratio, pa.scalar(1.0))),
                    pc.min_element_wise(
                        pc.add(pa.scalar(0.5),
                               pc.multiply(stop_ratio, pa.scalar(2.0))),
                        pa.scalar(1.0))))
    for name, col_ in [("punct_ratio", punct_ratio), ("stop_ratio", stop_ratio),
                       ("quality_score", score)]:
        tbl = tbl.append_column(name, col_)
    return tbl


def quality_dataset(ds, col: str = "text"):
    return ds.map_batches(lambda t: quality_batch(t, col),
                          batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# language ID (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

LANG_PROFILES: dict[str, str] = {
    "en": r"(?i)\b(the|and|of|to|is|you|that|it|with)\b",
    "de": r"(?i)\b(der|die|das|und|ist|nicht|ich|mit|ein)\b",
    "fr": r"(?i)\b(le|la|les|et|est|pas|je|avec|une)\b",
    "es": r"(?i)\b(el|los|las|es|y|no|con|una|que)\b",
    "zh": r"[一-鿿]",
}


def langid_batch(tbl: pa.Table, col: str = "text",
                 out: str = "lang_pred") -> pa.Table:
    """Deterministic heuristic language-ID: one vectorized RE2 count per
    language profile, argmax wins; 'und' when every profile scores 0."""
    c = tbl[col]
    langs = list(LANG_PROFILES)
    scores = np.stack([
        pc.count_substring_regex(c, pattern=p).to_numpy(zero_copy_only=False)
        for p in LANG_PROFILES.values()]).astype(np.float64)
    best = np.argmax(scores, axis=0)
    top = scores[best, np.arange(scores.shape[1])]
    pred = np.where(top > 0, np.array(langs, dtype=object)[best], "und")
    return tbl.append_column(out, pa.array(pred.astype(object),
                                           type=pa.string()))


def langid_dataset(ds, col: str = "text"):
    return ds.map_batches(lambda t: langid_batch(t, col),
                          batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling hash, MOSS-style)
# ---------------------------------------------------------------------------

_B = 257
_M = (1 << 61) - 1


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> list[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken): k-gram Rabin-Karp rolling
    hashes → per-window minima → fingerprint set (sorted, deduped).
    Guarantees any shared substring of length ≥ w+k-1 yields a shared
    fingerprint. Rolling update is O(1) per character."""
    n = len(text)
    if n < k:
        return [_rk_hash(text)] if text else []
    hashes = np.empty(n - k + 1, dtype=np.int64)
    h = 0
    for c in text[:k]:
        h = (h * _B + ord(c)) % _M
    hashes[0] = h
    pow_k = pow(_B, k - 1, _M)
    for i in range(1, n - k + 1):
        h = ((h - ord(text[i - 1]) * pow_k) * _B + ord(text[i + k - 1])) % _M
        hashes[i] = h
    if len(hashes) <= w:
        return [int(hashes.min())]
    # sliding-window minima (vectorized via stride trick)
    from numpy.lib.stride_tricks import sliding_window_view
    mins = sliding_window_view(hashes, w).min(axis=1)
    return sorted(set(int(x) for x in mins))


def _rk_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * _B + ord(c)) % _M
    return h


def winnow_dataset(ds, col: str = "text", k: int = 5, w: int = 4,
                   out: str = "fingerprints"):
    def _fn(tbl: pa.Table) -> pa.Table:
        fps = [winnow_fingerprints(t or "", k, w)
               for t in tbl[col].to_pylist()]
        return tbl.append_column(out, pa.array(fps, type=pa.list_(pa.int64())))
    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# document fingerprint (whole-document rolling hash digest)
# ---------------------------------------------------------------------------

def fingerprint_batch(tbl: pa.Table, col: str = "text",
                      out: str = "fingerprint") -> pa.Table:
    """64-bit deterministic content fingerprint: crc32 of the text plus a
    crc32 of its whitespace-normalized form, packed into one int64 (stable
    across processes/runs — no Python ``hash``)."""
    c = tbl[col]
    norm = pc.replace_substring_regex(c, pattern=r"\s+", replacement=" ")
    raw = c.to_pylist()
    norm_py = norm.to_pylist()
    fp = np.empty(len(raw), dtype=np.int64)
    for i, (a, b) in enumerate(zip(raw, norm_py)):
        if a is None:
            fp[i] = -1
        else:
            v = (zlib.crc32(a.encode()) << 32) | zlib.crc32(b.encode())
            fp[i] = v - (1 << 64) if v >= (1 << 63) else v  # wrap to int64
    return tbl.append_column(out, pa.array(fp, type=pa.int64()))


def fingerprint_dataset(ds, col: str = "text"):
    return ds.map_batches(lambda t: fingerprint_batch(t, col),
                          batch_format="pyarrow", batch_size=None)
