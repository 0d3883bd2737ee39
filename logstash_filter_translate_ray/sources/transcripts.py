"""Deterministic synthetic transcript table (BASELINE.json input_hint).

Schema (exact shape required):
  conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
  ts:timestamp[us]

Fully vectorized numpy generation (seeded, no wall clock), Zipf-skewed
conversation sizes so the conv_id aggregate exercises the hot-key path.
``text`` embeds translatable tokens — HTTP-ish status codes and a small
word vocabulary — so parse → enrich produces real hits AND misses.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "code", "browser", "calc", ""])
WORDS = np.array(["merci", "thanks", "error", "retry", "ok", "hello", "goodbye",
                  "please", "compute", "fetch"])
STATUS = np.array(["200", "201", "301", "404", "500", "503", "042", "999"])
FILLER = np.array(["the quick brown fox", "lorem ipsum dolor", "stack trace follows",
                   "model responded with", "user asked about", "tool call returned"])

BASE_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z, deterministic


def make_transcripts(n_turns: int, seed: int = 42, zipf_a: float = 1.5,
                     mean_turns: int = 12) -> pa.Table:
    """Build ~``n_turns`` transcript rows (exact count returned may differ by
    at most one conversation's tail, then is trimmed to exactly n_turns)."""
    rng = np.random.RandomState(seed)
    # conversation sizes: 1 + capped Zipf, mean ≈ mean_turns
    est_convs = max(1, n_turns // mean_turns)
    sizes = 1 + np.minimum(rng.zipf(zipf_a, est_convs * 2) * (mean_turns // 4),
                           10_000)
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:n_convs]
    total = int(sizes.sum())

    conv_idx = np.repeat(np.arange(n_convs), sizes)
    turn_idx = (np.arange(total) - np.repeat(np.concatenate([[0], cum[:n_convs - 1]]),
                                             sizes)).astype(np.int32)

    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype(str), 8))
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    special = rng.rand(total)
    role[special < 0.05] = "system"
    role[(special >= 0.05) & (special < 0.15)] = "tool"

    tool = TOOLS[rng.randint(0, len(TOOLS), total)]
    word = WORDS[rng.randint(0, len(WORDS), total)]
    status = STATUS[rng.randint(0, len(STATUS), total)]
    filler = FILLER[rng.randint(0, len(FILLER), total)]
    # ~25% of turns carry no status token (parse misses)
    has_status = rng.rand(total) >= 0.25

    text = pc.binary_join_element_wise(
        pa.array(filler), pa.array(word),
        pc.if_else(pa.array(has_status),
                   pc.binary_join_element_wise(
                       pa.array(np.full(total, "code", dtype=object)),
                       pa.array(status), " "),
                   pa.scalar("no code here")),
        " ")

    ts = BASE_EPOCH_US + np.cumsum(rng.randint(1, 5_000_000, total).astype(np.int64))

    tbl = pa.table({
        "conv_id": pa.array(conv_id.astype(object), type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": text,
        "tool": pa.array(tool.astype(object), type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    return tbl.slice(0, n_turns)


def transcripts_parquet_path(n_turns: int, seed: int = 42,
                             cache_dir: str = "/tmp/lftr_transcripts",
                             n_files: int = 8,
                             row_group_size: int = 50_000) -> str:
    """Write (once, cached) the deterministic transcript table as a
    directory of parquet files — multiple files × row groups so
    ``read_parquet`` yields real block parallelism."""
    out = os.path.join(cache_dir, f"n{n_turns}_s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    # PER-PROCESS tmp: two concurrent generators (driver + bench, or two
    # bench runs) must not share a tmp dir, and the loser must never
    # rmtree the winner's LIVE cache out from under an in-flight read
    # (review r4) — losers discard their own tmp instead.
    tmp = out + f".tmp.{os.getpid()}"
    import shutil as _sh
    _sh.rmtree(tmp, ignore_errors=True)   # this pid's crashed leftovers
    os.makedirs(tmp, exist_ok=True)
    tbl = make_transcripts(n_turns, seed)
    n_files = max(1, min(n_files, max(1, n_turns // 10_000)))
    per = (len(tbl) + n_files - 1) // n_files
    for i in range(n_files):
        part = tbl.slice(i * per, per)
        if len(part):
            pq.write_table(part, os.path.join(tmp, f"part-{i:05d}.parquet"),
                           row_group_size=row_group_size)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(done):
        # another process finished while we generated — its cache is live
        # (identical bytes: deterministic seed); keep it, drop ours
        _sh.rmtree(tmp, ignore_errors=True)
        return out
    if os.path.exists(out):
        # _DONE missing ⇒ crashed partial from an earlier run — replace it
        _sh.rmtree(out, ignore_errors=True)
    try:
        os.replace(tmp, out)
    except OSError:
        # lost a publish race after the checks above: os.replace onto the
        # winner's non-empty dir raises ENOTEMPTY. The winner's copy is
        # COMPLETE (its rename was atomic) and byte-identical
        # (deterministic seed), so adopt it — stamping _DONE ourselves
        # covers the microsecond window before the winner stamps it.
        _sh.rmtree(tmp, ignore_errors=True)
        if os.path.exists(out):
            try:
                with open(done, "w") as f:
                    f.write("ok")
            except OSError:
                pass
            return out
        raise
    with open(done, "w") as f:
        f.write("ok")
    return out
