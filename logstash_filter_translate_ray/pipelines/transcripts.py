"""The flagship parse → enrich → route → aggregate DAG over transcript
Parquet (BASELINE.json north_star), expressed Ray-Data-first:

  read_parquet (column-pruned)
    → parse_dataset          (stateless map_batches, RE2 kernels)
    → translate tool         (exact dict, broadcast snapshot)
    → translate status       (regex-key dict, ordered first-match)
    → route by role          (dictionary-driven route column, fallback)
    → ONE pass fan-out write (partition_cols=["route"])
    → aggregates             (combiner-style pre-agg, then tiny shuffle)

Every stage is a batch transform over zero-copy Arrow; the only shuffles
are the final tiny aggregates over per-batch partials. The per-turn
``text`` column is never rewritten (input_hint invariant: per-turn text
equality under stable (conv_id, turn_idx) ordering).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Optional

import pyarrow.parquet as pq
import ray.data as rd

from ..config import TranslateConfig
from ..checkpoint import CheckpointStore, ShardManifest
from ..stages.aggregate import (conv_turn_counts, grouped_counts,
                                matched_counts, sink_counts)
from ..stages.parse import ParseConfig, parse_dataset
from ..stages.route import route_dataset, write_routed
from ..stages.translate_stage import translate_dataset

# Default dictionaries for the transcript DAG (FIXTURES.md §B): small,
# broadcast, deterministic.
TOOL_DICT = {"search": "Web Search", "code": "Code Interpreter",
             "browser": "Browser", "calc": "Calculator"}
STATUS_REGEX_DICT = {"^2[0-9][0-9]$": "OK", "^3..": "Redirect",
                     "^4..": "Client Error", "^5..": "Server Error"}
WORD_DICT = {"merci": "thanks", "thanks": "thanks", "ok": "ack",
             "error": "failure", "retry": "failure"}
ROLE_ROUTES = {"user": "user_turns", "assistant": "assistant_turns",
               "system": "control", "tool": "tool_calls"}
# union-substitution redaction dictionary (O8 at scale): every occurrence of
# any key in `text` replaced, result written to text_redacted (text itself is
# never rewritten — input_hint invariant)
REDACT_DICT = {"merci": "[MERCI]", "error": "[ERR]", "200": "[OK]",
               "404": "[NOTFOUND]", "503": "[UNAVAIL]"}
# key set chosen to satisfy DictSnapshot.union_sequential_safe (no cross-key
# overlaps), so the hot redaction stage takes the vectorized
# pc.replace_substring fast path instead of per-row re.sub

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

CONV_SEGMENTS = ("free", "pro", "team", "enterprise", "edu", "gov", "trial")


def make_conv_segment_dict(n_convs: int = 100_000) -> dict[str, str]:
    """Deterministic 100k-entry conv_id → segment dictionary — the
    reference's tested dictionary scale (docs/index.asciidoc:75-77,
    'internally tested with 100,000 key/values')."""
    return {f"conv-{i:08d}": CONV_SEGMENTS[i % len(CONV_SEGMENTS)]
            for i in range(n_convs)}


@dataclass
class TranscriptPipelineConfig:
    tool_dict: dict[str, str] = field(default_factory=lambda: dict(TOOL_DICT))
    status_regex_dict: dict[str, str] = field(
        default_factory=lambda: dict(STATUS_REGEX_DICT))
    word_dict: dict[str, str] = field(default_factory=lambda: dict(WORD_DICT))
    routes: dict[str, str] = field(default_factory=lambda: dict(ROLE_ROUTES))
    tool_fallback: str = "no tool"
    status_fallback: Optional[str] = "unknown status %{status}"
    default_route: str = "other"
    tool_dict_path: Optional[str] = None      # file-backed + refresh variant
    refresh_interval: float = 300
    batch_size: Optional[int] = None           # None → Ray Data default sizing
    parse: ParseConfig = field(default_factory=ParseConfig.transcripts)
    # heavy enrich stages (on by default; the bench + oracle cover them):
    # 100k-key conv_id → segment broadcast lookup, and union-substitution
    # redaction of text → text_redacted
    redact_dict: dict[str, str] = field(default_factory=lambda: dict(REDACT_DICT))
    conv_dict_size: int = 100_000


def build_enriched_dataset(ds: "rd.Dataset",
                           cfg: Optional[TranscriptPipelineConfig] = None,
                           ) -> "rd.Dataset":
    """parse → enrich(tool, status, word) → route. Lazy — nothing executes."""
    cfg = cfg or TranscriptPipelineConfig()
    ds = parse_dataset(ds, cfg.parse, batch_size=cfg.batch_size)

    # enrich 1: tool → tool_label (exact; file-backed actor pool if a path
    # is configured, else broadcast stateless tasks)
    tool_cfg = TranslateConfig(
        source="tool_norm", target="tool_label",
        dictionary={} if cfg.tool_dict_path else dict(cfg.tool_dict),
        dictionary_path=cfg.tool_dict_path,
        refresh_interval=cfg.refresh_interval,
        fallback=cfg.tool_fallback, override=True)
    ds = translate_dataset(ds, tool_cfg, matched_col="tool_matched",
                           batch_size=cfg.batch_size)

    # enrich 2: parsed status code → class (regex keys, ordered first-match)
    status_cfg = TranslateConfig(
        source="status", target="status_class", exact=True, regex=True,
        dictionary=dict(cfg.status_regex_dict),
        fallback=cfg.status_fallback, override=True)
    ds = translate_dataset(ds, status_cfg, matched_col="status_matched",
                           batch_size=cfg.batch_size)

    # enrich 3: parsed word → normalized sentiment token (exact, no fallback)
    word_cfg = TranslateConfig(source="word", target="word_norm",
                               dictionary=dict(cfg.word_dict), override=True)
    ds = translate_dataset(ds, word_cfg, matched_col="word_matched",
                           batch_size=cfg.batch_size)

    # enrich 4: conv_id → account segment, 100k-key exact dict broadcast via
    # ray.put once (the reference's tested dictionary scale)
    if cfg.conv_dict_size > 0:
        seg_cfg = TranslateConfig(
            source="conv_id", target="conv_segment",
            dictionary=make_conv_segment_dict(cfg.conv_dict_size),
            fallback="anon", override=True)
        ds = translate_dataset(ds, seg_cfg, matched_col=None,
                               batch_size=cfg.batch_size)

    # enrich 5: union-substitution redaction (exact=false gsub, O8) —
    # writes text_redacted, never mutates text
    if cfg.redact_dict:
        redact_cfg = TranslateConfig(source="text", target="text_redacted",
                                     exact=False,
                                     dictionary=dict(cfg.redact_dict))
        ds = translate_dataset(ds, redact_cfg, matched_col=None,
                               batch_size=cfg.batch_size)

    # route by role (dictionary-driven, single pass)
    ds = route_dataset(ds, cfg.routes, key="role",
                       default_route=cfg.default_route)
    return ds


def read_transcripts(path: "str | list[str]",
                     override_num_blocks: Optional[int] = None) -> "rd.Dataset":
    """Column-pruned transcript read. ``override_num_blocks`` pins the block
    count — fewer, larger blocks (~250k rows) cut per-task scheduling gaps
    substantially vs Ray's adaptive splitting (measured 5.2s vs 7.9s for a
    16M-row pass at 16 CPUs)."""
    kw = {}
    if override_num_blocks is not None:
        kw["override_num_blocks"] = override_num_blocks
    return rd.read_parquet(path, columns=TRANSCRIPT_COLUMNS, **kw)


def run_pipeline(input_path: "str | list[str]", out_dir: Optional[str] = None,
                 cfg: Optional[TranscriptPipelineConfig] = None,
                 ) -> dict[str, Any]:
    """Run the DAG once (non-resumable form). Returns the low-cardinality
    aggregates as small pandas frames; ``conv_turn_counts`` (one row PER
    CONVERSATION — whole-input cardinality) stays a lazy Dataset so the
    driver never materializes it — callers sample, aggregate, or sink it.
    When ``out_dir`` is given the routed rows are written as
    hive-partitioned parquet first and the aggregates are then computed
    over the written files (single source of truth)."""
    cfg = cfg or TranscriptPipelineConfig()
    if out_dir is not None and os.path.isdir(out_dir) and os.listdir(out_dir):
        # write_parquet APPENDS uniquely-named files: rerunning into a
        # non-empty dir would double rows and inflate every aggregate
        # (review r3) — the resumable runner is the rerun-into-same-dir API
        raise ValueError(
            f"out_dir {out_dir!r} is not empty — remove it or use "
            "run_resumable for checkpointed reruns")
    ds = build_enriched_dataset(read_transcripts(input_path), cfg)
    if out_dir is not None:
        write_routed(ds, out_dir)
        # aggregates over what was written (single source of truth)
        ds = rd.read_parquet(out_dir)
    # ONE execution of the (lazy) DAG for both small aggregates: the joint
    # count's marginals are the per-sink and matched counters (review r3:
    # two separate grouped_counts calls re-ran the whole enrich chain)
    joint = grouped_counts(ds, ["route", "tool_label", "status_matched"],
                           driver_merge=True)
    routes = joint.groupby(["route", "tool_label"], as_index=False,
                           dropna=False)["n"].sum()
    matched = joint.groupby("status_matched", as_index=False,
                            dropna=False)["n"].sum()
    convs = conv_turn_counts(ds)
    return {"sink_counts": routes, "status_matched_counts": matched,
            "conv_turn_counts": convs}


# ---------------------------------------------------------------------------
# Resumable form: shard = group of input files, manifest per shard
# ---------------------------------------------------------------------------

def _shard_inputs(input_path: "str | list[str]", shard_files: int) -> list[list[str]]:
    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            # RECURSE: nested/hive-partitioned layouts (e.g. a previous
            # route=... fan-out output) must shard like the non-resumable
            # rd.read_parquet would read them — the top-level-only listing
            # found zero files and returned a silently-successful empty run
            files = sorted(
                os.path.join(r, f)
                for r, _dirs, fnames in os.walk(input_path)
                for f in fnames if f.endswith(".parquet"))
            if not files:
                raise FileNotFoundError(
                    f"no *.parquet files under {input_path!r} — refusing a "
                    "0-shard (silently empty) resumable run")
        else:
            files = [input_path]
    else:
        files = sorted(input_path)
    return [files[i:i + shard_files] for i in range(0, len(files), shard_files)]


def run_resumable(input_path: "str | list[str]", out_dir: str,
                  cfg: Optional[TranscriptPipelineConfig] = None,
                  shard_files: int = 4) -> dict[str, Any]:
    """Checkpointed run: one manifest + one atomically-renamed output dir
    per input shard; re-running skips completed shards and merges their
    recorded metrics (exactly-once aggregate accounting over at-least-once
    task retries — SURVEY §4 'Retries / faults')."""
    cfg = cfg or TranscriptPipelineConfig()
    store = CheckpointStore(out_dir)
    shards = _shard_inputs(input_path, shard_files)
    # fail FAST if the input shrank since a previous run at this out_dir:
    # stale manifests would otherwise poison the totals, and checking only
    # after the loop would waste the whole run before erroring (review r3)
    want_ids = {f"{i:05d}" for i in range(len(shards))}
    extra = sorted(m.shard_id for m in store.load_all()
                   if m.shard_id not in want_ids)
    if extra:
        raise RuntimeError(
            f"out_dir has manifests {extra} beyond this run's "
            f"{len(shards)} shards — the input shrank since the previous "
            "run; use a fresh out_dir")
    ran, skipped = 0, 0
    for i, files in enumerate(shards):
        shard_id = f"{i:05d}"
        if store.is_done(shard_id):
            done = store.load(shard_id)
            if done is not None and done.input_files != list(files):
                raise RuntimeError(
                    f"checkpoint mismatch for shard {shard_id}: manifest "
                    f"covers {done.input_files}, run asked for {list(files)} "
                    "— the input list or shard_files changed; use a fresh "
                    "out_dir")
            skipped += 1
            continue
        tmp = store.begin_shard(shard_id)
        ds = build_enriched_dataset(read_transcripts(files), cfg)
        write_routed(ds, tmp)
        # ONE read pass over the written shard: the joint (route, matched)
        # count yields both manifest metrics as marginals
        from ..stages.aggregate import grouped_counts
        joint = grouped_counts(rd.read_parquet(tmp),
                               ["route", "status_matched"], driver_merge=True)
        routes = joint.groupby("route", as_index=False)["n"].sum()
        matched = joint.groupby("status_matched", as_index=False)["n"].sum()
        rows_out = int(joint["n"].sum())
        rows_in = sum(pq.read_metadata(f).num_rows for f in files)
        final = store.finish_shard(shard_id)
        store.commit(ShardManifest(
            shard_id=shard_id, input_files=list(files), output_dir=final,
            rows_in=rows_in, rows_out=rows_out,
            route_counts={str(r): int(n) for r, n in
                          zip(routes["route"], routes["n"])},
            matched_counts={str(m): int(n) for m, n in
                            zip(matched["status_matched"], matched["n"])}))
        ran += 1
    manifests = store.load_all()
    route_totals: dict[str, int] = {}
    matched_totals: dict[str, int] = {}
    for m in manifests:
        for k, v in m.route_counts.items():
            route_totals[k] = route_totals.get(k, 0) + v
        for k, v in m.matched_counts.items():
            matched_totals[k] = matched_totals.get(k, 0) + v
    return {"shards_run": ran, "shards_skipped": skipped,
            "rows_out": sum(m.rows_out for m in manifests),
            "route_counts": route_totals, "matched_counts": matched_totals}
