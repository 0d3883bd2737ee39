"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse → enrich → route DAG on deterministic
synthetic transcripts (BASELINE.json input_hint schema). ``queries()`` maps
every implemented operator from SURVEY.md §2 (see §8 coverage map) onto the
sf parquet tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL where
the op is SQL-expressible (same column names both sides).

Query inventory (50 — the driver checks at most 50 rows, so the r4 set is
pruned to exactly that; ★ = DuckDB-oracled. EVERY query now carries an
oracle: the approximate trio (lsh_topk / ivf_topk — recall-gate rows;
embedding_neardup_lsh — deterministic seeded planes make it ID-exact vs
the exact-pairs SQL at sf0.01, P(miss per pair) ≈ 3e-4) included.
r3's text_stats / sort_limit / union_counts were folded out to fit the
cap: their operator coverage is held by quality_scores (the same
punct/stopword RE2 counts feed quality_score), topk_users (grouped-
partial top-k since r5) and weighted_mix (Dataset.union) respectively.
  translate:   exact★ exact_nofallback★ regex★ union★ iterate_values★
               iterate_maps★ file_dict★(actor pool)
  pipeline:    events_pipeline★ transcripts_pipeline★ curation_pipeline★
               route_counts★ matched_counts★ filter_pushdown★
  parse:       parse_extract★ (grok multi-capture inside events_pipeline)
  aggregates:  agg_value_by_type★(sum+min+max) user_event_counts★
               topk_users★ distinct_types★ zscore_outliers★ vocab_topk★
               quantiles★
  windows:     tumbling_counts★ window_quantiles★ prev_event_gap★
               event_paths★ session_counts★
  dedup:       dedup_exact★ incremental_dedup★ minhash_pairs★ simhash★
               simhash_pairs★ embedding_neardup★ embedding_neardup_lsh★
               jaccard_pairs★
  sampling:    hash_sample★ split_counts★ weighted_mix★
  similarity:  ann_topk★ knn_join★ lsh_topk★(recall gate)
               ivf_topk★(recall gate)
  text:        token_count★ quality_scores★ langid★ repetition_scores★
               fingerprint★ winnow★
  multimodal:  multimodal_features★ multimodal_real_decode★

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- shared dictionaries (keys/routes chosen against the sf tables) --------

EVENT_LABELS = {"click": "Click", "error": "Error", "purchase": "Purchase"}
EVENT_REGEX = {"^si": "starts-si", "rr": "double-r", "e": "has-e"}
UNION_DICT = {"order": "ORDER", "data": "DATA", "slow": "SLOW"}
TOKEN_DICT = {"the": "DET", "fast": "ADJ", "slow": "ADJ", "data": "NOUN"}
EVENT_ROUTES = {"click": "engagement", "view": "engagement",
                "purchase": "revenue", "signup": "revenue"}


def _read(sf_dir: str, table: str, columns=None):
    """Column-pruned read with a SIZE-AWARE block count: Ray's default
    splits these small sf tables into ~64 tiny blocks and every downstream
    stage then pays fixed per-block cost (measured at sf0.1: vocab_topk
    2.1 s → 0.4-0.6 s, dedup_ids 1.2 s → 0.6-0.7 s at ~8 blocks;
    translate_exact 0.9 s → 0.3 s). Blocks scale with the footer row
    count — ≥25k rows per block, floor 8 for map parallelism, cap 64
    (the default) so big tables are unchanged."""
    import ray.data as rd
    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        rows = pq.read_metadata(path).num_rows
        nb = min(64, max(8, rows // 25_000))
    except Exception:
        nb = None
    kw = {"override_num_blocks": nb} if nb else {}
    return rd.read_parquet(path, columns=columns, **kw)


def _transcripts_dir(sf_dir: str) -> str:
    from logstash_filter_translate_ray.sources import transcripts_parquet_path
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        n = max(2_000, int(float(sf) * 2_000_000))
    except ValueError:
        n = 20_000
    return transcripts_parquet_path(n, seed=42)


# --------------------------------------------------------------------------
# entry — flagship DAG smoke
# --------------------------------------------------------------------------

def entry() -> Any:
    """Flagship transcripts DAG (parse → enrich ×3 → route) at tiny scale,
    plus a translate over the sf0.001 events table to touch the sf data."""
    from logstash_filter_translate_ray.pipelines import build_enriched_dataset
    from logstash_filter_translate_ray.pipelines.transcripts import read_transcripts
    path = _transcripts_dir("/root/testdata/sf0.001")
    return build_enriched_dataset(read_transcripts(path))


# --------------------------------------------------------------------------
# queries — one per operator/pipeline (SURVEY.md §2)
# --------------------------------------------------------------------------

def q_translate_exact(sf_dir: str):
    """O3/O6: exact dictionary lookup with fallback (single-value shape)."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    cfg = TranslateConfig(source="event_type", target="label",
                          dictionary=dict(EVENT_LABELS), fallback="unknown",
                          override=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return translate_dataset(ds, cfg, matched_col=None) \
        .select_columns(["event_id", "event_type", "label"])


def q_translate_exact_nofallback(sf_dir: str):
    """O3/O6: exact lookup, miss ⇒ null target (no fallback)."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    cfg = TranslateConfig(source="event_type", target="label",
                          dictionary=dict(EVENT_LABELS), override=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return translate_dataset(ds, cfg, matched_col=None) \
        .select_columns(["event_id", "event_type", "label"])


def q_translate_regex(sf_dir: str):
    """O7: regex-key lookup, unanchored search, insertion-order first match."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    cfg = TranslateConfig(source="event_type", target="label", regex=True,
                          dictionary=dict(EVENT_REGEX), fallback="none",
                          override=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return translate_dataset(ds, cfg, matched_col=None) \
        .select_columns(["event_id", "event_type", "label"])


def q_translate_union(sf_dir: str):
    """O8: exact=false gsub-substitution of every key occurrence."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    cfg = TranslateConfig(source="text", target="translated", exact=False,
                          dictionary=dict(UNION_DICT))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return translate_dataset(ds, cfg, matched_col=None) \
        .select_columns(["doc_id", "translated"])


def q_translate_iterate_values(sf_dir: str):
    """O4: iterate_on == source over a list column (tokens), '|'-joined for
    a hash-stable comparison."""
    import pyarrow.compute as pc
    from logstash_filter_translate_ray import TranslateConfig, DictSnapshot, translate_table
    cfg = TranslateConfig(source="tokens", iterate_on="tokens",
                          target="tags", dictionary=dict(TOKEN_DICT),
                          fallback="?")
    snap = DictSnapshot(cfg.dictionary)

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t["text"], pattern=" ")
        t = t.append_column("tokens", toks)
        out = translate_table(t, cfg, snap, matched_col=None)
        tags = out["tags"]
        if isinstance(tags, pa.ChunkedArray):
            tags = tags.combine_chunks()
        joined = pc.binary_join(tags, "|")
        return pa.table({"doc_id": out["doc_id"], "tags_joined": joined})

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def q_route_counts(sf_dir: str):
    """Route + per-sink aggregate counts (north_rule core)."""
    from logstash_filter_translate_ray.stages import route_dataset, sink_counts
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    ds = route_dataset(ds, EVENT_ROUTES, key="event_type",
                       default_route="ops")
    return sink_counts(ds)


def q_matched_counts(sf_dir: str):
    """S15 matched/unmatched counters."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset, matched_counts
    cfg = TranslateConfig(source="event_type", target="label",
                          dictionary=dict(EVENT_LABELS), override=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    ds = translate_dataset(ds, cfg, matched_col="translate_matched")
    return matched_counts(ds)


def q_parse_extract(sf_dir: str):
    """Parse stage: vectorized regex extraction (RE2) from a string column."""
    from logstash_filter_translate_ray.stages.parse import (ExtractRule,
                                                            ParseConfig,
                                                            parse_dataset)
    cfg = ParseConfig(rules=(
        ExtractRule(out="k_value", source="props", pattern=r"(\d+)",
                    cast="int64"),))
    ds = _read(sf_dir, "events", ["event_id", "props"])
    return parse_dataset(ds, cfg).select_columns(["event_id", "k_value"])


def q_agg_value_by_type(sf_dir: str):
    """Combiner-style grouped SUM + MIN + MAX in ONE pass (pre-aggregated
    in map_batches, exact via integer cents). Absorbed the former
    standalone ``agg_minmax`` query (r5: driver's 50-query cap needed a
    slot for ``knn_join_ivf``) — the same three aggregates, one shuffle."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(t: pa.Table) -> pa.Table:
        from logstash_filter_translate_ray.stages.aggregate import _cents
        t2 = pa.table({"event_type": t["event_type"],
                       "cents": _cents(t["value"])})
        return t2.group_by(["event_type"]).aggregate(
            [("cents", "sum"), ("cents", "min"), ("cents", "max")]) \
            .rename_columns(["event_type", "sum_cents", "min_cents",
                             "max_cents"])

    from logstash_filter_translate_ray.stages.aggregate import (
        null_safe_groupby_aggregate)
    ds = _read(sf_dir, "events", ["event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return null_safe_groupby_aggregate(
        partials, ["event_type"],
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"))


def q_dedup_exact(sf_dir: str):
    """Exact dedup: content-hash groupby + native min aggregate (no
    per-group callbacks)."""
    from logstash_filter_translate_ray.functions.dedup import exact_dedup_ids
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup_ids(ds)


def q_token_count(sf_dir: str):
    from logstash_filter_translate_ray.functions.text import token_count_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return token_count_dataset(ds).select_columns(
        ["doc_id", "n_tokens_ws", "n_tokens_bpe"])


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 embedding (float64 math)."""
    from logstash_filter_translate_ray.functions.similarity import brute_force_topk
    qv = _query_vec(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, qv, k=10)
    return out[["vec_id"]]


def q_langid(sf_dir: str):
    """Heuristic language-ID — SQL-mirrored: per-language RE2 counts +
    ordered-argmax CASE (ties break to the earlier profile, same as
    np.argmax)."""
    from logstash_filter_translate_ray.functions.text import langid_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return langid_dataset(ds).select_columns(["doc_id", "lang_pred"])


def q_fingerprint(sf_dir: str):
    """Content fingerprint: md5-lower64(text) XOR md5-lower64(ws-normalized
    text) — exactly DuckDB's xor(md5_number_lower(...), ...)."""
    from logstash_filter_translate_ray.functions.text import fingerprint_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return fingerprint_dataset(ds).select_columns(["doc_id", "fingerprint"])


def q_simhash(sf_dir: str):
    """64-bit SimHash with the md5 word hash (== DuckDB md5_number_lower)
    so the bit-majority algorithm is SQL-verifiable end-to-end; the library
    default keeps the faster siphash batch (rows-only pytest oracle)."""
    from logstash_filter_translate_ray.functions.dedup import simhash_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_dataset(ds, word_hash="md5") \
        .select_columns(["doc_id", "simhash"])


def q_simhash_pairs(sf_dir: str):
    """SimHash banded near-dup pairs (hamming ≤ 3, 4×16-bit bands —
    pigeonhole gives PERFECT candidate recall at ≤3 differing bits, so the
    bounded O(N²) SQL oracle matches exactly). md5 word hash for SQL
    parity; bounded doc_id < 1000 like the other pair oracles."""
    import pyarrow.compute as pc
    import ray.data as rd
    from logstash_filter_translate_ray.functions.dedup import simhash_pairs
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         filter=(pc.field("doc_id") < 1000))
    return simhash_pairs(ds, word_hash="md5", max_hamming=3, hot_cap=None)


def q_minhash_pairs(sf_dir: str):
    """Word-3-gram-shingle Jaccard ≥0.5 pairs through the scale blocking +
    distributed verify path. Bounded to doc_id < 1000 (the ORACLE's O(N²)
    list-algebra cross join is the binding cost); sample_mod=1 + hot_cap=None
    give exact candidate recall on the bounded input, so the approximate
    MinHash band stage (rows-only by design) is covered separately in
    pytest while the verify semantics are SQL-checked here."""
    import pyarrow.compute as pc
    import ray.data as rd
    from logstash_filter_translate_ray.functions.dedup import ngram_jaccard_pairs
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         filter=(pc.field("doc_id") < 1000))
    out = ngram_jaccard_pairs(ds, k=3, threshold=0.5, sample_mod=1,
                              hot_cap=None, concurrency=2)
    return out[["id_a", "id_b"]]


def q_user_event_counts(sf_dir: str):
    """High-cardinality grouped count through the DISTRIBUTED merge path
    (combiner partials → groupby shuffle) — the conv_id-style aggregate."""
    from logstash_filter_translate_ray.stages.aggregate import grouped_counts
    ds = _read(sf_dir, "events", ["user_id"])
    return grouped_counts(ds, ["user_id"], driver_merge=False)


def q_translate_file_dict(sf_dir: str):
    """File-backed dictionary through the actor-pool stage (DictionaryService
    + TranslateFn hot path), exact mode with fallback."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import translate_dataset
    path = "/tmp/lftr_event_dict.csv"
    content = "".join(f"{k},{v}\n" for k, v in EVENT_LABELS.items())
    if not os.path.exists(path) or open(path).read() != content:
        with open(path, "w") as f:
            f.write(content)
    cfg = TranslateConfig(source="event_type", target="label",
                          dictionary_path=path, refresh_interval=-1,
                          fallback="unknown", override=True)
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return translate_dataset(ds, cfg, matched_col=None, concurrency=2) \
        .select_columns(["event_id", "event_type", "label"])


def q_translate_iterate_maps(sf_dir: str):
    """O5: iterate_on ≠ source over list<struct> — translate the ``bar``
    child of each element into a ``baz`` child; output '|'-joined."""
    import pyarrow.compute as pc
    from logstash_filter_translate_ray import (DictSnapshot, TranslateConfig,
                                               translate_table)
    cfg = TranslateConfig(iterate_on="items", source="bar", target="baz",
                          dictionary=dict(EVENT_LABELS), fallback="?")
    snap = DictSnapshot(cfg.dictionary)

    def fn(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        second = pa.array(["error"] * len(t), type=pa.string())
        structs0 = pa.StructArray.from_arrays([et], ["bar"])
        structs1 = pa.StructArray.from_arrays([second], ["bar"])
        # interleave into 2-element lists [{bar: event_type}, {bar: 'error'}]
        import numpy as np
        flat = pa.concat_arrays([structs0, structs1]).take(
            pa.array(np.arange(2 * len(t)).reshape(2, len(t)).T.ravel()))
        offsets = pa.array(np.arange(0, 2 * len(t) + 1, 2, dtype=np.int32))
        items = pa.ListArray.from_arrays(offsets, flat)
        t2 = pa.table({"event_id": t["event_id"], "items": items})
        out = translate_table(t2, cfg, snap, matched_col=None)
        col = out["items"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        baz = pc.struct_field(pc.list_flatten(col), "baz")
        n = len(t)
        baz_np = baz.to_pylist()
        # SQL string-concat null propagation: a null member (null source →
        # baz never written, S1) nulls the whole joined value — never
        # render Python's 'None'
        joined = [None if baz_np[2 * i] is None or baz_np[2 * i + 1] is None
                  else f"{baz_np[2 * i]}|{baz_np[2 * i + 1]}"
                  for i in range(n)]
        return pa.table({"event_id": out["event_id"],
                         "baz_joined": pa.array(joined, type=pa.string())})

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def q_event_paths(sf_dir: str):
    """Per-user ordered event-type path (conversation-assembly shape:
    bucketed segments + vectorized pc.binary_join)."""
    from logstash_filter_translate_ray.stages.window import event_paths
    ds = _read(sf_dir, "events", ["user_id", "event_id", "event_type", "ts"])
    return event_paths(ds)


def q_quantiles(sf_dir: str):
    """Exact per-type p50/p95/p99 over integer cents (combiner histogram
    partials; quantile rule identical to DuckDB quantile_disc)."""
    from logstash_filter_translate_ray.stages.aggregate import (
        grouped_quantiles)
    ds = _read(sf_dir, "events", ["event_type", "value"])
    return grouped_quantiles(ds)


def q_zscore_outliers(sf_dir: str):
    """Per-type z-score anomaly flag (|z| > 2). Exact int64 cent sums make
    the float math order-independent and SQL-mirrorable."""
    from logstash_filter_translate_ray.stages.aggregate import zscore_outliers
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return zscore_outliers(ds, key="event_type", val="value", threshold=2.0)


def q_vocab_topk(sf_dir: str):
    """Top-20 vocabulary by occurrence (map-reduce wordcount shape:
    per-batch np.unique partials → native sum → distributed sort+limit).
    Returned as a typed arrow Table (bounded by k): Ray's sort/limit wipe
    an all-empty stream's schema and a schema anchor union under a limit
    trips 2.49's LimitPushdown planner, so the ≤k-row result is collected
    with an explicit schema instead (fuzz_docqueries: all-null corpus)."""
    from logstash_filter_translate_ray.functions.text import vocab_topk
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rows = vocab_topk(ds, k=20).take_all()
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("word", pa.string()), ("n", pa.int64())]))


def q_quality_scores(sf_dir: str):
    """Composite quality scoring — SQL-mirrored float64 arithmetic (the
    oracle reproduces the exact operation ORDER, so IEEE doubles match
    bit-for-bit)."""
    from logstash_filter_translate_ray.functions.text import quality_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return quality_dataset(ds).select_columns(["doc_id", "quality_score"])


def q_curation_pipeline(sf_dir: str):
    """Flagship LLM-data CURATION chain over the documents table — the
    composition a training-data pipeline actually runs: quality score →
    filter ≥ 0.5 → language-ID → keep 'en' → exact dedup (min-id per
    distinct text among survivors) → per-doc token counts. Every stage is
    SQL-mirrorable, so the WHOLE chain is hash-checked against one DuckDB
    oracle. Single fused map_batches for the row-local stages; the only
    shuffle is the dedup groupby."""
    import pyarrow.compute as pc
    from logstash_filter_translate_ray.functions.dedup import exact_dedup
    from logstash_filter_translate_ray.functions.text import (
        langid_batch, quality_batch, token_count_batch)

    def enrich_filter(t: pa.Table) -> pa.Table:
        t = quality_batch(t)
        t = t.filter(pc.greater_equal(t["quality_score"], 0.5))
        t = langid_batch(t)
        t = t.filter(pc.equal(t["lang_pred"], "en"))
        return t.select(["doc_id", "text", "quality_score", "lang_pred"])

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = ds.map_batches(enrich_filter, batch_format="pyarrow",
                          batch_size=None)
    surv = exact_dedup(kept)          # full rows, min doc_id per text
    out = surv.map_batches(
        lambda t: token_count_batch(t).drop_columns(["text"]),
        batch_format="pyarrow", batch_size=None)
    # final-op schema anchor: Ray wipes block schemas when a map stage
    # skips empty inputs, so a corpus that filters to nothing would lose
    # its column list (rayutil.anchor_empty_schema docstring)
    from logstash_filter_translate_ray.rayutil import anchor_empty_schema
    return anchor_empty_schema(out, pa.schema(
        [("doc_id", pa.int64()), ("quality_score", pa.float64()),
         ("lang_pred", pa.string()), ("n_tokens_ws", pa.int64()),
         ("n_tokens_bpe", pa.int64())]))


def _query_vec(sf_dir: str) -> np.ndarray:
    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")) \
        .filter(pa.compute.equal(pa.compute.field("vec_id"), 0))
    return np.asarray(q["embedding"].to_pylist()[0], dtype=np.float64)


def _recall_gate(approx_ids, exact_ids, k: int, bound: float) -> pa.Table:
    """Driver-VISIBLE accuracy gate for approximate top-k (VERDICT r3 #3):
    the query computes the exact answer alongside and emits
    (k, recall_ok). The oracle asserts the same constants, so a recall
    regression below ``bound`` hash-mismatches in CORRECTNESS — no more
    rows-only rows. (The raw recall value is deliberately NOT a column:
    it is not SQL-derivable; the asserted bound is.)"""
    n_hit = len(set(approx_ids) & set(exact_ids))
    return pa.table({"k": pa.array([k], type=pa.int64()),
                     "recall_ok": pa.array([n_hit >= bound * k])})


def q_lsh_topk(sf_dir: str):
    """LSH-bucketed approximate cosine top-k, gated vs the exact answer.
    n_planes=3 probes 4 of 8 buckets (hamming-1) — measured 7/10 recall on
    the RANDOM sf embeddings (LSH's worst case: near-orthogonal vectors);
    the gate asserts ≥ 0.5. Deterministic (seeded planes) ⇒ stable row."""
    from logstash_filter_translate_ray.functions.similarity import (
        brute_force_topk, lsh_topk)
    qv = _query_vec(sf_dir)
    approx = lsh_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      qv, k=10, n_planes=3, concurrency=2)
    exact = brute_force_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), qv, k=10)
    return _recall_gate(approx["vec_id"].tolist(),
                        exact["vec_id"].tolist(), k=10, bound=0.5)


def q_ivf_topk(sf_dir: str):
    """IVF approximate cosine top-k (hash-sampled centroid build), gated vs
    the exact answer: n_probe=4 of 16 cells, measured 7-8/10 recall on the
    random sf embeddings; the gate asserts ≥ 0.5. Deterministic."""
    from logstash_filter_translate_ray.functions.similarity import (
        brute_force_topk, ivf_topk)
    qv = _query_vec(sf_dir)
    approx = ivf_topk(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                      qv, k=10, n_cells=16, n_probe=4,
                      cache_key=os.path.join(sf_dir, "embeddings.parquet"))
    exact = brute_force_topk(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), qv, k=10)
    return _recall_gate(approx["vec_id"].tolist(),
                        exact["vec_id"].tolist(), k=10, bound=0.5)


def q_knn_join_ivf(sf_dir: str):
    """IVF-partitioned approximate kNN JOIN (the 100 TB replacement for the
    exact O(N²) kernel — VERDICT r4 #2), gated vs the exact join: pair
    recall = |approx ∩ exact| / |exact| over (vec_id, neighbor_id) pairs,
    asserted ≥ 0.5 (measured ~0.8 at n_probe=8/16 cells on the random sf
    embeddings — random near-orthogonal vectors are IVF's worst case).
    Deterministic: hash-sample centroids + seeded k-means + quantized
    tie-break ⇒ stable row."""
    from logstash_filter_translate_ray.functions.similarity import (
        knn_join, knn_join_ivf)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    approx = knn_join_ivf(ds, k=5, n_cells=16, n_probe=8,
                          cache_key=os.path.join(sf_dir,
                                                 "embeddings.parquet"))
    exact = knn_join(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                     k=5)
    a = set(map(tuple, approx[["vec_id", "neighbor_id"]].to_numpy()))
    e = set(map(tuple, exact[["vec_id", "neighbor_id"]].to_numpy()))
    recall = len(a & e) / max(len(e), 1)
    return pa.table({"k": pa.array([5], type=pa.int64()),
                     "recall_ok": pa.array([recall >= 0.5])})


def q_winnow(sf_dir: str):
    """Winnowing fingerprints per document (k=5, w=4), first 8 joined as a
    CSV string — SQL-mirrored: the k-gram polynomial mod 2^31-1 is
    list_reduce-expressible and window minima are list_min over slices."""
    from logstash_filter_translate_ray.functions.text import winnow_dataset
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = winnow_dataset(ds)

    def first8(t: pa.Table) -> pa.Table:
        # empty fingerprint list ("" text) renders NULL like the oracle's
        # array_to_string([]) — DuckDB returns NULL, not '' (fuzz-found)
        fps = [None if not v else ",".join(str(x) for x in v[:8])
               for v in t["fingerprints"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fp8": pa.array(fps, type=pa.string())})
    return out.map_batches(first8, batch_format="pyarrow", batch_size=None)


def q_distinct_types(sf_dir: str):
    """Set op: distinct values of a column — a null-safe distributed
    groupby-count with the counts dropped (Ray's own ``unique`` rides the
    same sort-shuffle and crashes on null keys in multi-block inputs).
    A null value is a distinct value, like SQL DISTINCT; nulls sort last."""
    from ray.data.aggregate import Count

    from logstash_filter_translate_ray.stages.aggregate import (
        null_safe_groupby_aggregate)
    ds = _read(sf_dir, "events", ["event_type"])
    counts = null_safe_groupby_aggregate(ds, ["event_type"],
                                         Count(alias_name="n"))
    vals = [r["event_type"] for r in
            counts.select_columns(["event_type"]).take_all()]
    has_null = any(v is None for v in vals)
    vals = sorted(v for v in vals if v is not None)
    if has_null:
        vals.append(None)
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


def q_tumbling_counts(sf_dir: str):
    """Tumbling 1-hour window counts per event_type (row-local bucket +
    combiner aggregate — no per-key shuffle)."""
    from logstash_filter_translate_ray.stages.window import tumbling_counts
    ds = _read(sf_dir, "events", ["ts", "event_type"])
    return tumbling_counts(ds, keys=("event_type",), unit="hour")


def q_window_quantiles(sf_dir: str):
    """Composition: tumbling 1-hour buckets × exact discrete quantiles —
    per-window latency percentiles, the log-dashboard staple. Row-local
    bucketing + the histogram-combiner quantile merge; no per-key
    shuffle."""
    from logstash_filter_translate_ray.stages.aggregate import (
        grouped_quantiles)
    from logstash_filter_translate_ray.stages.window import add_time_bucket
    ds = _read(sf_dir, "events", ["ts", "value"])
    bucketed = ds.map_batches(lambda t: add_time_bucket(t, "ts", "hour"),
                              batch_format="pyarrow", batch_size=None)
    return grouped_quantiles(bucketed, key="bucket", val="value")


def q_prev_event_gap(sf_dir: str):
    """Per-user previous-event gap in µs (as-of/self-lag via per-key
    groups ordered by (ts, event_id))."""
    from logstash_filter_translate_ray.stages.window import prev_event_gap
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return prev_event_gap(ds)


def q_session_counts(sf_dir: str):
    """Sessionization: 30-minute inactivity gap, sessions per user."""
    from logstash_filter_translate_ray.stages.window import session_counts
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    return session_counts(ds, gap="30min")


def q_topk_users(sf_dir: str):
    """Grouped-partial top-k (VERDICT r4 #5): exact distributed counts,
    per-block local top-10, tiny driver fold — no full range-partition
    sort. Null user_ids are real groups and order LAST (DuckDB NULLS
    LAST) in both the block and driver folds."""
    from logstash_filter_translate_ray.stages.aggregate import grouped_topk
    ds = _read(sf_dir, "events", ["user_id"])
    return grouped_topk(ds, ["user_id"], k=10)


def q_filter_pushdown(sf_dir: str):
    """Predicate + column pruning at the read (row-group pushdown via a
    pyarrow dataset expression — only matching row groups leave storage)."""
    import pyarrow.compute as pc
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "event_type", "value"],
                         filter=(pc.field("event_type") == "error"))
    return ds


def q_events_pipeline(sf_dir: str):
    """Full parse → enrich → route → aggregate DAG over the events table in
    one query (grok multi-capture parse of props, dictionary enrich with
    fallback, dictionary routing, per-sink × label counts)."""
    from logstash_filter_translate_ray import TranslateConfig
    from logstash_filter_translate_ray.stages import (GrokRule, ParseConfig,
                                                      parse_dataset,
                                                      route_dataset,
                                                      sink_counts,
                                                      translate_dataset)
    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])
    ds = parse_dataset(ds, ParseConfig(rules=(
        GrokRule(source="props", pattern=r'"k": (?P<k_value>\d+)',
                 casts=(("k_value", "int64"),)),)))
    cfg = TranslateConfig(source="event_type", target="label",
                          dictionary=dict(EVENT_LABELS), fallback="unknown",
                          override=True)
    ds = translate_dataset(ds, cfg, matched_col=None)
    ds = route_dataset(ds, EVENT_ROUTES, key="event_type",
                       default_route="ops")
    return sink_counts(ds, by=["label"])


def q_jaccard_pairs(sf_dir: str):
    """Unigram-set Jaccard near-dup pairs (≥0.9, id_a < id_b) through the
    SCALE pipeline: shared-shingle blocking → hash-bucketed in-group pair
    generation → distributed join-attached exact-Jaccard verify
    (functions/dedup.py). k=1 shingles = word sets, so the result is
    SQL-checkable (k>1 shingles aren't list-algebra-expressible).

    Bounded to doc_id < 1000 at every sf because the ORACLE's O(N²)
    list-algebra join is the binding cost. sample_mod=1 + hot_cap=None make
    candidate recall exact on this bounded input (every shared word blocks;
    J ≥ 0.9 ⇒ ≥1 shared word); word hashing is a fixed-key 64-bit siphash,
    so hash-set Jaccard equals word-set Jaccard (collisions negligible).
    Zero-word docs (empty/whitespace/null text) all carry the single
    _EMPTY_SHINGLE, so they pair with each other at J=1 (the engine's
    J(∅,∅)=1 convention, mirrored in the oracle's [''] singleton)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from logstash_filter_translate_ray.functions.dedup import (
        ngram_jaccard_pairs)
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         filter=(pc.field("doc_id") < 1000))
    out = ngram_jaccard_pairs(ds, k=1, threshold=0.9, sample_mod=1,
                              hot_cap=None, concurrency=2)
    return out[["id_a", "id_b"]]


def q_knn_join(sf_dir: str):
    """Exact cosine k-NN join (k=3) over the embeddings table — the
    kNN-graph builder; deterministic (cosine DESC, neighbor id ASC)."""
    from logstash_filter_translate_ray.functions.similarity import knn_join
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_join(ds, k=3)


def q_multimodal_real_decode(sf_dir: str):
    """REAL image decode through the actor pool: deterministic P6 PPM
    payloads (dims derived from doc_id) → ResizeStage(use_real_codecs)
    decodes the actual bytes, resizes the pixels and re-encodes. The
    output dims come from the PPM HEADER, not the metadata columns, so the
    SQL mirror (same dims arithmetic in double math) verifies the parse
    end-to-end."""
    import pyarrow.compute as pc
    from logstash_filter_translate_ray.functions.multimodal import (
        ResizeStage, encode_ppm)

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        payloads = []
        for i in ids:
            w = int(i) % 48 + 8
            h = (int(i) * 7) % 48 + 8
            # deterministic pixels (content is not part of the oracle)
            img = (np.arange(h * w * 3, dtype=np.int64) * (int(i) + 1)
                   % 256).astype(np.uint8).reshape(h, w, 3)
            payloads.append(encode_ppm(img))
        return pa.table({"media_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary()),
                         "media_type": pa.array(["image"] * len(t)),
                         "width": pa.array(np.zeros(len(t), np.int32)),
                         "height": pa.array(np.zeros(len(t), np.int32)),
                         "sample_rate": pa.nulls(len(t), pa.int32())})

    ds = _read(sf_dir, "documents", ["doc_id"])
    # task pool, not actor pool: the pure-numpy codecs have zero init and
    # the 2-actor pool's spin-up alone measured 1.4 s (4× the whole decode
    # at sf0.1; see resize_dataset pool="tasks"). 512 × ~9 KB payloads per
    # batch; real MB-scale media would use DEFAULT_MEDIA_BATCH_SIZE.
    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=512)
    out = media.map_batches(
        ResizeStage(max_side=16, use_real_codecs=True),
        batch_format="pyarrow", batch_size=512)
    return out.select_columns(["media_id", "resized_width",
                               "resized_height"])


def q_repetition_scores(sf_dir: str):
    """Gopher-style repetition signals (dup-word / dup-line fractions)."""
    from logstash_filter_translate_ray.functions.text import (
        repetition_dataset)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return repetition_dataset(ds).select_columns(
        ["doc_id", "dup_word_frac", "dup_line_frac"])


def q_hash_sample(sf_dir: str):
    """Deterministic 10% corpus sample (md5-bucket row rule — no RNG, no
    shuffle; the DuckDB mirror is the identical expression)."""
    from logstash_filter_translate_ray.functions.sampling import hash_sample
    from logstash_filter_translate_ray.rayutil import anchor_empty_schema
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = hash_sample(ds, col="doc_id", fraction=0.1) \
        .select_columns(["doc_id"])
    # a corpus sampled to nothing must keep its projected column list
    # (without the anchor, schema() walks back up to the pre-project read)
    return anchor_empty_schema(out, pa.schema([("doc_id", pa.int64())]))


def q_split_counts(sf_dir: str):
    """Deterministic 80/10/10 train/val/test split — per-split row counts."""
    from logstash_filter_translate_ray.functions.sampling import split_column
    from logstash_filter_translate_ray.stages.aggregate import grouped_counts
    ds = _read(sf_dir, "documents", ["doc_id"])
    return grouped_counts(split_column(ds, col="doc_id"), ["split"],
                          driver_merge=True)


def q_weighted_mix(sf_dir: str):
    """Deterministic corpus mixing: a 'high-quality' slice (doc_id < 250)
    at rate 0.5 unioned with the rest at rate 0.1 — the down-weight-the-
    crawl shape, reproducible with no random state."""
    import pyarrow.compute as pc
    from logstash_filter_translate_ray.functions.sampling import weighted_mix
    hq = _read(sf_dir, "documents", ["doc_id"]).filter(expr="doc_id < 250")
    rest = _read(sf_dir, "documents", ["doc_id"]).filter(expr="doc_id >= 250")
    return weighted_mix([(hq, 0.5), (rest, 0.1)], col="doc_id")


def q_incremental_dedup(sf_dir: str):
    """Cross-dataset exact dedup (incremental-ingest shape): the full
    documents table filtered against a 'seen' corpus (doc_id < 250) by a
    16-byte content-hash anti-join — the text itself never shuffles."""
    from logstash_filter_translate_ray.functions.dedup import (
        incremental_dedup)
    import pyarrow.compute as pc
    seen = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .filter(expr="doc_id < 250")
    new = _read(sf_dir, "documents", ["doc_id", "text"])
    out = incremental_dedup(new, seen)
    return out.select_columns(["doc_id"])


def q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.4, id_a < id_b)."""
    from logstash_filter_translate_ray.functions.similarity import (
        embedding_neardup_pairs)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_neardup_pairs(ds, threshold=0.4)[["id_a", "id_b"]]


def q_embedding_neardup_lsh(sf_dir: str):
    """LSH-bucketed embedding near-dup — the 100 TB path (banded hyperplane
    buckets, per-segment matmuls). Oracled against the EXACT pairs SQL:
    with planes_per_table=2 × n_tables=16, P(missing a 0.4-cosine pair) ≈
    3e-4 and the seeded planes are deterministic, so the result is
    ID-exact on the sf tables (verified at sf0.001 and sf0.01); the
    general ≥0.9-recall guarantee is pinned by
    tests/test_functions.py::test_embedding_neardup_lsh_recall."""
    from logstash_filter_translate_ray.functions.similarity import (
        embedding_neardup_pairs_lsh)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_neardup_pairs_lsh(ds, threshold=0.4,
                                       planes_per_table=2,
                                       n_tables=16)[["id_a", "id_b"]]


def q_transcripts_pipeline(sf_dir: str):
    """Flagship DAG per-sink counts on deterministic synthetic transcripts.
    Oracled since r3 via _transcripts_pipeline_sql(), which PINS the
    sf0.01 (n=20k) /tmp cache — the scale the driver compares at; this
    query follows sf_dir, so a comparison at any OTHER sf would mismatch
    by design (the oracle SQL string cannot be parameterized)."""
    from logstash_filter_translate_ray.pipelines import run_pipeline
    res = run_pipeline(_transcripts_dir(sf_dir))
    return res["sink_counts"]


def q_multimodal_features(sf_dir: str):
    """Multimodal decode plumbing with payloads DERIVED from the documents
    table (payload = utf-8 bytes of text), so byte-size and md5 digest are
    SQL-verifiable while exercising the real binary actor-pool stage."""
    from logstash_filter_translate_ray.functions.multimodal import (
        decode_features_dataset)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [(s or "").encode() for s in t["text"].to_pylist()]
        return pa.table({"media_id": t["doc_id"],
                         "payload": pa.array(payloads, type=pa.binary())})

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=None)
    return decode_features_dataset(media).select_columns(
        ["media_id", "payload_bytes", "payload_digest"])


def queries() -> dict[str, Callable[[str], Any]]:
    # EXACTLY 50 entries — the driver's CORRECTNESS file caps at 50 rows
    # (r3 registered 53 and the last three never got a row). The r3
    # orphans (winnow, jaccard_pairs, ivf_topk) sit early in insertion
    # order now so a future over-cap regression can't orphan them again.
    return {
        "translate_exact": q_translate_exact,
        "translate_exact_nofallback": q_translate_exact_nofallback,
        "translate_regex": q_translate_regex,
        "translate_union": q_translate_union,
        "translate_iterate_values": q_translate_iterate_values,
        "winnow": q_winnow,
        "jaccard_pairs": q_jaccard_pairs,
        "ivf_topk": q_ivf_topk,
        "knn_join_ivf": q_knn_join_ivf,
        "lsh_topk": q_lsh_topk,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "route_counts": q_route_counts,
        "matched_counts": q_matched_counts,
        "parse_extract": q_parse_extract,
        "agg_value_by_type": q_agg_value_by_type,
        "dedup_exact": q_dedup_exact,
        "token_count": q_token_count,
        "ann_topk": q_ann_topk,
        "langid": q_langid,
        "fingerprint": q_fingerprint,
        "simhash": q_simhash,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "transcripts_pipeline": q_transcripts_pipeline,
        "multimodal_features": q_multimodal_features,
        "user_event_counts": q_user_event_counts,
        "translate_file_dict": q_translate_file_dict,
        "translate_iterate_maps": q_translate_iterate_maps,
        "quality_scores": q_quality_scores,
        "vocab_topk": q_vocab_topk,
        "zscore_outliers": q_zscore_outliers,
        "quantiles": q_quantiles,
        "event_paths": q_event_paths,
        "curation_pipeline": q_curation_pipeline,
        "embedding_neardup": q_embedding_neardup,
        "incremental_dedup": q_incremental_dedup,
        "hash_sample": q_hash_sample,
        "repetition_scores": q_repetition_scores,
        "multimodal_real_decode": q_multimodal_real_decode,
        "knn_join": q_knn_join,
        "split_counts": q_split_counts,
        "weighted_mix": q_weighted_mix,
        "events_pipeline": q_events_pipeline,
        "filter_pushdown": q_filter_pushdown,
        "topk_users": q_topk_users,
        "tumbling_counts": q_tumbling_counts,
        "window_quantiles": q_window_quantiles,
        "prev_event_gap": q_prev_event_gap,
        "session_counts": q_session_counts,
        "distinct_types": q_distinct_types,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB, same column names)
# --------------------------------------------------------------------------

def _case_exact(col: str, d: dict[str, str], fallback: "str | None") -> str:
    whens = " ".join(f"WHEN {col} = '{k}' THEN '{v}'" for k, v in d.items())
    els = f"ELSE '{fallback}'" if fallback is not None else "ELSE NULL"
    # leading NULL arm: a null source means the filter never ran (null ⇔
    # absent, S1) — the fallback applies to MISSES, not to absent sources
    return f"CASE WHEN {col} IS NULL THEN NULL {whens} {els} END"


def _langid_sql() -> str:
    """Ordered-argmax CASE over per-language RE2 counts, mirroring
    np.argmax's first-max tie-break (profile order en, de, fr, es, zh)."""
    from logstash_filter_translate_ray.functions.text import LANG_PROFILES
    langs = list(LANG_PROFILES)
    # profiles contain no quotes; backslashes pass through SQL strings as-is
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{LANG_PROFILES[l]}')) AS {l}"
        for l in langs)
    tie = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"{l} >= {m}" for m in langs[i + 1:])
        tie.append(f"WHEN {conds} THEN '{l}'")
    # leading NULL guard: null text → null prediction (matches
    # langid_batch's null ⇔ absent convention; without it the CASE's NULL
    # comparisons fall through to the ELSE arm)
    return (
        f"WITH s AS (SELECT doc_id, text, {counts} FROM documents) "
        f"SELECT doc_id, CASE WHEN text IS NULL THEN NULL "
        f"WHEN greatest({', '.join(langs)}) = 0 "
        f"THEN 'und' {' '.join(tie)} ELSE '{langs[-1]}' END AS lang_pred "
        "FROM s")


def _quality_sql() -> str:
    from logstash_filter_translate_ray.functions.text import (
        _PUNCT_RE, _STOP_RE, WS_TOKEN_RE)
    return (
        "WITH s AS (SELECT doc_id, "
        "CAST(length(text) AS DOUBLE) AS n_chars, "
        f"CAST(len(regexp_extract_all(text, '{WS_TOKEN_RE}')) AS DOUBLE) AS n_words, "
        f"CAST(len(regexp_extract_all(text, '{_PUNCT_RE}')) AS DOUBLE) AS n_punct, "
        f"CAST(len(regexp_extract_all(text, '{_STOP_RE}')) AS DOUBLE) AS n_stop "
        "FROM documents), "
        "r AS (SELECT doc_id, "
        "n_punct / greatest(n_chars, 1.0) AS punct_ratio, "
        "n_stop / greatest(n_words, 1.0) AS stop_ratio, "
        "least(n_chars / 200.0, 1.0) AS len_score FROM s) "
        "SELECT doc_id, len_score * ((1.0 - least(punct_ratio, 1.0)) * "
        "least(0.5 + stop_ratio * 2.0, 1.0)) AS quality_score FROM r")


def _simhash_sql(where: str = "") -> str:
    # word split (the engine's exact Unicode-whitespace tokenization) →
    # md5_number_lower per word → 64-bit bit-majority → sum of winning
    # bits (bits are disjoint, so SUM == OR)
    from logstash_filter_translate_ray.functions.text import UNICODE_TOKEN_RE
    return (
        "WITH w AS (SELECT doc_id, "
        f"unnest(regexp_extract_all(text, '{UNICODE_TOKEN_RE}')) AS word "
        f"FROM documents {where}), "
        "h AS (SELECT doc_id, md5_number_lower(word) AS hv FROM w), "
        "b AS (SELECT doc_id, bit, SUM(CASE WHEN (hv >> bit) & 1 = 1 "
        "THEN 1 ELSE -1 END) AS acc FROM h "
        "CROSS JOIN (SELECT unnest(range(64)) AS bit) bits "
        "GROUP BY doc_id, bit), "
        "sh AS (SELECT doc_id, CAST(SUM(CASE WHEN acc > 0 THEN "
        "(1::UBIGINT << bit)::HUGEINT ELSE 0 END) AS UBIGINT) AS simhash "
        "FROM b GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(sh.simhash, 0::UBIGINT) AS simhash "
        "FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id "
        f"{where.replace('doc_id', 'd.doc_id') if where else ''}")


def _winnow_sql() -> str:
    # k=5, w=4, B=257, M=2^31-1: k-gram Horner via list_reduce == the
    # engine's windowed-dot-product mod M; window minima via list_min over
    # 4-slices; first 8 sorted-distinct minima joined as CSV
    return (
        "WITH cp AS (SELECT doc_id, length(text) AS n, "
        "list_transform(range(1, length(text)+1), "
        "i -> CAST(unicode(text[i]) AS BIGINT)) AS cps "
        "FROM documents), "
        "h AS (SELECT doc_id, CASE WHEN n = 0 THEN CAST([] AS BIGINT[]) "
        "WHEN n < 5 THEN [list_reduce(cps, (a,b) -> (a*257+b) % 2147483647)] "
        "ELSE list_transform(range(1, n-3), i -> list_reduce("
        "list_slice(cps, i, i+4), (a,b) -> (a*257+b) % 2147483647)) END AS hs "
        "FROM cp), "
        "m AS (SELECT doc_id, CASE WHEN len(hs) = 0 THEN hs "
        "WHEN len(hs) <= 4 THEN [list_min(hs)] "
        "ELSE list_sort(list_distinct(list_transform(range(1, len(hs)-2), "
        "j -> list_min(list_slice(hs, j, j+3))))) END AS fps FROM h) "
        "SELECT doc_id, array_to_string(list_transform(list_slice(fps, 1, 8), "
        "x -> CAST(x AS VARCHAR)), ',') AS fp8 FROM m")


def _transcripts_pipeline_sql() -> str:
    """DuckDB reconstruction of the flagship parse → enrich → route chain
    over the SAME deterministic /tmp transcripts parquet the Ray query
    reads (the driver compares at sf=0.01 ⇒ the n=20k cache). Calling this
    GENERATES the cache if absent, so the oracle works regardless of
    whether the driver runs the SQL before or after the Ray query. The
    driver's DuckDB reads /tmp by the same mechanism it already uses for
    the /root/testdata views (read_parquet on absolute paths), so external
    file access is known-enabled; tests/test_entry.py keeps the same
    comparison as a pytest backstop."""
    from logstash_filter_translate_ray.pipelines.transcripts import (
        ROLE_ROUTES, TOOL_DICT)
    tdir = _transcripts_dir("/root/testdata/sf0.01")
    route_case = " ".join(f"WHEN role = '{k}' THEN '{v}'"
                          for k, v in ROLE_ROUTES.items())
    tool_case = " ".join(f"WHEN tn = '{k}' THEN '{v}'"
                         for k, v in TOOL_DICT.items())
    return (
        f"WITH t AS (SELECT role, tool FROM read_parquet('{tdir}/*.parquet')), "
        "e AS (SELECT "
        f"CASE WHEN role IS NULL THEN NULL {route_case} ELSE 'other' END AS route, "
        "CASE WHEN tool IS NULL OR NOT regexp_matches(tool, '^\\s*[a-z_]+') "
        "THEN NULL ELSE regexp_extract(tool, '^\\s*([a-z_]+)', 1) END AS tn "
        "FROM t) "
        # '(null)' mirrors grouped_counts' null-key sentinel
        "SELECT COALESCE(route, '(null)') AS route, "
        f"COALESCE(CASE WHEN tn IS NULL THEN NULL {tool_case} "
        "ELSE 'no tool' END, '(null)') AS tool_label, COUNT(*) AS n "
        "FROM e GROUP BY 1, 2")


def _curation_sql() -> str:
    """One oracle for the whole curation chain (quality filter → langid
    filter → exact dedup → token counts), reusing the per-stage SQL
    mirrors as derived tables (DuckDB allows a WITH inside a subquery)."""
    from logstash_filter_translate_ray.functions.text import (
        BPE_TOKEN_RE, WS_TOKEN_RE)
    return (
        f"WITH q AS (SELECT * FROM ({_quality_sql()})), "
        f"l AS (SELECT * FROM ({_langid_sql()})), "
        "keep AS (SELECT d.doc_id, d.text, q.quality_score, l.lang_pred "
        "FROM documents d JOIN q USING (doc_id) JOIN l USING (doc_id) "
        "WHERE q.quality_score >= 0.5 AND l.lang_pred = 'en'), "
        "surv AS (SELECT min(doc_id) AS doc_id FROM keep GROUP BY text) "
        "SELECT k.doc_id, k.quality_score, k.lang_pred, "
        f"CAST(len(regexp_extract_all(k.text, '{WS_TOKEN_RE}')) AS BIGINT) "
        "AS n_tokens_ws, "
        f"CAST(len(regexp_extract_all(k.text, '{BPE_TOKEN_RE}')) AS BIGINT) "
        "AS n_tokens_bpe "
        "FROM keep k JOIN surv USING (doc_id)")


def oracle_sql() -> dict[str, str]:
    # the exact RE2 mirror of the engine's utf8_split_whitespace / .split()
    # tokenization — RE2 \s is ASCII-only, see text.UNICODE_TOKEN_RE
    from logstash_filter_translate_ray.functions.text import UNICODE_TOKEN_RE
    exact_case = _case_exact("event_type", EVENT_LABELS, "unknown")
    exact_case_nf = _case_exact("event_type", EVENT_LABELS, None)
    regex_case = (
        "CASE WHEN event_type IS NULL THEN NULL "
        "WHEN regexp_matches(event_type, '^si') THEN 'starts-si' "
        "WHEN regexp_matches(event_type, 'rr') THEN 'double-r' "
        "WHEN regexp_matches(event_type, 'e') THEN 'has-e' "
        "ELSE 'none' END")
    union_expr = "replace(replace(replace(text, 'order', 'ORDER'), 'data', 'DATA'), 'slow', 'SLOW')"
    token_case = ("CASE WHEN x = 'the' THEN 'DET' WHEN x = 'fast' THEN 'ADJ' "
                  "WHEN x = 'slow' THEN 'ADJ' WHEN x = 'data' THEN 'NOUN' "
                  "ELSE '?' END")
    route_case = _case_exact("event_type", EVENT_ROUTES, "ops")

    def _cos(a: str, b: str) -> str:
        # engine convention: a ZERO vector has cosine 0 to everything
        # (similarity._normalize maps zero norm → 1, "no information");
        # DuckDB's list_cosine_similarity returns -1 there instead
        return (f"CASE WHEN list_dot_product({a}, {a}) = 0 "
                f"OR list_dot_product({b}, {b}) = 0 THEN 0.0 "
                f"ELSE list_cosine_similarity({a}, {b}) END")
    out = {
        "translate_exact":
            f"SELECT event_id, event_type, {exact_case} AS label FROM events",
        "translate_exact_nofallback":
            f"SELECT event_id, event_type, {exact_case_nf} AS label FROM events",
        "translate_regex":
            f"SELECT event_id, event_type, {regex_case} AS label FROM events",
        "translate_union":
            f"SELECT doc_id, CASE WHEN {union_expr} <> text THEN {union_expr} "
            "ELSE NULL END AS translated FROM documents",
        "translate_iterate_values":
            "SELECT doc_id, array_to_string(list_transform(string_split(text, ' '), "
            f"x -> {token_case}), '|') AS tags_joined FROM documents",
        "route_counts":
            # '(null)' mirrors sink_counts' null-route sentinel (a null
            # key routes nowhere — same convention as transcripts_pipeline)
            f"SELECT COALESCE({route_case}, '(null)') AS route, "
            "COUNT(*) AS n FROM events GROUP BY 1",
        "matched_counts":
            # coalesce: NULL IN (...) is NULL, but a null source means the
            # filter never matched (S15) — the engine counts it false
            "SELECT COALESCE(event_type IN ('click','error','purchase'), "
            "FALSE) AS translate_matched, "
            "COUNT(*) AS n FROM events GROUP BY 1",
        "parse_extract":
            # nullif: DuckDB regexp_extract returns '' (not NULL) on no
            # match; TRY_CAST mirrors the engine's null-on-overflow cast
            "SELECT event_id, TRY_CAST(nullif(regexp_extract(props, "
            "'(\\d+)', 1), '') AS BIGINT) AS k_value FROM events",
        "agg_value_by_type":
            "SELECT event_type, CAST(SUM(CAST(round(value * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_cents, "
            "MIN(CAST(round(value * 100) AS BIGINT)) AS min_cents, "
            "MAX(CAST(round(value * 100) AS BIGINT)) AS max_cents "
            "FROM events GROUP BY event_type",
        "dedup_exact":
            "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
        "token_count":
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens_ws, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) "
            "AS n_tokens_bpe FROM documents",
        "ann_topk":
            "WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) "
            "SELECT e.vec_id FROM embeddings e, q "
            f"ORDER BY {_cos('e.embedding', 'q.qv')} DESC, e.vec_id "
            "LIMIT 10",
        "user_event_counts":
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id",
        "translate_file_dict":
            f"SELECT event_id, event_type, {exact_case} AS label FROM events",
        "translate_iterate_maps":
            f"SELECT event_id, ({_case_exact('event_type', EVENT_LABELS, '?')})"
            " || '|Error' AS baz_joined FROM events",
        "embedding_neardup":
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            f"WHERE {_cos('a.embedding', 'b.embedding')} >= 0.4",
        # LSH path: deterministic seeded planes + P(miss/pair) ≈ 3e-4 make
        # the approximate result ID-exact vs the same exact-pairs SQL on
        # the sf tables (see q_embedding_neardup_lsh docstring)
        "embedding_neardup_lsh":
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM embeddings a "
            "JOIN embeddings b ON a.vec_id < b.vec_id "
            f"WHERE {_cos('a.embedding', 'b.embedding')} >= 0.4",
        # recall GATES: the Ray query computes exact-vs-approx recall and
        # emits (k, recall_ok) — the driver hash checks the asserted bound
        "lsh_topk":
            "SELECT CAST(10 AS BIGINT) AS k, true AS recall_ok",
        "ivf_topk":
            "SELECT CAST(10 AS BIGINT) AS k, true AS recall_ok",
        "knn_join_ivf":
            "SELECT CAST(5 AS BIGINT) AS k, true AS recall_ok",
        "events_pipeline":
            # '(null)' mirrors sink_counts' null-key sentinel for string
            # group keys (route AND label both null when the source is)
            f"SELECT COALESCE({route_case}, '(null)') AS route, "
            f"COALESCE({exact_case}, '(null)') AS label, "
            "COUNT(*) AS n FROM events GROUP BY 1, 2",
        "filter_pushdown":
            "SELECT event_id, event_type, value FROM events "
            "WHERE event_type = 'error'",
        "topk_users":
            "SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id "
            "ORDER BY n DESC, user_id LIMIT 10",
        "tumbling_counts":
            # string keys ride grouped_counts' '(null)' sentinel; the
            # timestamp bucket key stays a REAL null (non-string keys do)
            "SELECT date_trunc('hour', ts) AS bucket, "
            "COALESCE(event_type, '(null)') AS event_type, "
            "COUNT(*) AS n FROM events GROUP BY 1, 2",
        "window_quantiles":
            "WITH c AS (SELECT date_trunc('hour', ts) AS bucket, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
            "SELECT bucket, quantile_disc(cents, 0.5) AS p50, "
            "quantile_disc(cents, 0.95) AS p95, "
            "quantile_disc(cents, 0.99) AS p99 FROM c GROUP BY bucket",
        "prev_event_gap":
            "SELECT event_id, CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us "
            "FROM events",
        "session_counts":
            "WITH g AS (SELECT user_id, epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS gap_us FROM events) "
            "SELECT user_id, CAST(SUM(CASE WHEN gap_us IS NULL OR "
            "gap_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions "
            "FROM g GROUP BY user_id",
        "distinct_types":
            "SELECT DISTINCT event_type FROM events",
        "jaccard_pairs":
            # zero-word docs (empty / whitespace-only / NULL text) carry
            # the [''] singleton — the SQL analogue of the engine's
            # _EMPTY_SHINGLE for <k-word docs (J(∅,∅)=1 convention, same
            # edge treatment as the minhash_pairs oracle's ELSE arm); the
            # plain 0/0 form returns NULL and silently drops those pairs
            "WITH d AS (SELECT doc_id, "
            f"list_distinct(regexp_extract_all(text, '{UNICODE_TOKEN_RE}')) "
            "AS w FROM documents WHERE doc_id < 1000), "
            "s AS (SELECT doc_id, CASE WHEN len(w) >= 1 THEN w "
            "ELSE [''] END AS ws FROM d) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) / "
            "greatest(len(list_distinct(list_concat(a.ws, b.ws))), 1) "
            ">= 0.9",
        "langid": _langid_sql(),
        "incremental_dedup":
            "SELECT d.doc_id FROM documents d WHERE NOT EXISTS ("
            "SELECT 1 FROM documents s WHERE s.doc_id < 250 "
            "AND s.text = d.text)",
        "knn_join":
            "SELECT a.vec_id, b.vec_id AS neighbor_id, "
            "row_number() OVER (PARTITION BY a.vec_id "
            f"ORDER BY {_cos('a.embedding', 'b.embedding')} "
            "DESC, b.vec_id) AS nn_rank "
            "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id "
            "QUALIFY nn_rank <= 3",
        "multimodal_real_decode":
            # same dims arithmetic as ResizeStage on the decoded header
            # (double math both sides): w = id%48+8, h = (id*7)%48+8,
            # sc = min(1, 16/max(w,h)), out = max(1, trunc(dim*sc))
            "WITH d AS (SELECT doc_id AS media_id, "
            "doc_id % 48 + 8 AS w, (doc_id * 7) % 48 + 8 AS h "
            "FROM documents), "
            "s AS (SELECT media_id, w, h, "
            "least(1.0, 16.0 / greatest(w, h)) AS sc FROM d) "
            "SELECT media_id, "
            "greatest(1, CAST(trunc(w * sc) AS INT)) AS resized_width, "
            "greatest(1, CAST(trunc(h * sc) AS INT)) AS resized_height "
            "FROM s",
        "repetition_scores":
            "WITH s AS (SELECT doc_id, "
            f"regexp_extract_all(text, '{UNICODE_TOKEN_RE}') AS w, "
            "string_split(text, chr(10)) AS l FROM documents) "
            "SELECT doc_id, "
            "CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / "
            "greatest(len(w), 1) AS dup_word_frac, "
            "CAST(len(l) - len(list_distinct(l)) AS DOUBLE) / "
            "greatest(len(l), 1) AS dup_line_frac FROM s",
        "hash_sample":
            "SELECT doc_id FROM documents "
            "WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 < 1000",
        "quantiles":
            "WITH c AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
            "SELECT event_type, quantile_disc(cents, 0.5) AS p50, "
            "quantile_disc(cents, 0.95) AS p95, "
            "quantile_disc(cents, 0.99) AS p99 FROM c GROUP BY event_type",
        "split_counts":
            "SELECT CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 < 8000 THEN 'train' "
            "WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 < 9000 THEN 'val' ELSE 'test' END AS split, "
            "COUNT(*) AS n FROM documents GROUP BY 1",
        "weighted_mix":
            "SELECT doc_id FROM documents WHERE doc_id < 250 "
            "AND md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 < 5000 "
            "UNION ALL SELECT doc_id FROM documents WHERE doc_id >= 250 "
            "AND md5_number_lower(CAST(doc_id AS VARCHAR)) % 10000 < 1000",
        # transcripts_pipeline is built separately AFTER this literal: its
        # /tmp cache generation must not take every other oracle down
        "curation_pipeline": _curation_sql(),
        "vocab_topk":
            "SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM "
            f"(SELECT unnest(regexp_extract_all(text, '{UNICODE_TOKEN_RE}')) "
            "AS word FROM documents) GROUP BY word "
            "ORDER BY n DESC, word LIMIT 20",
        "event_paths":
            "SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM events GROUP BY user_id",
        "zscore_outliers":
            "WITH c AS (SELECT event_id, event_type, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "s AS (SELECT event_type, COUNT(cents) AS cnt, SUM(cents) AS s1, "
            "SUM(cents * cents) AS s2 FROM c GROUP BY event_type), "
            "st AS (SELECT event_type, CAST(s1 AS DOUBLE)/cnt AS mean, "
            "sqrt(CAST(s2 AS DOUBLE)/cnt - (CAST(s1 AS DOUBLE)/cnt) * "
            "(CAST(s1 AS DOUBLE)/cnt)) AS std FROM s) "
            "SELECT c.event_id, c.event_type, "
            "(CAST(c.cents AS DOUBLE) - st.mean)/st.std AS z "
            "FROM c JOIN st USING (event_type) "
            "WHERE isfinite((CAST(c.cents AS DOUBLE) - st.mean)/st.std) "
            "AND abs((CAST(c.cents AS DOUBLE) - st.mean)/st.std) > 2.0",
        "quality_scores": _quality_sql(),
        "simhash": _simhash_sql(),
        "simhash_pairs":
            f"WITH s0 AS ({_simhash_sql('WHERE doc_id < 1000')}) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
            "FROM s0 a JOIN s0 b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3",
        "winnow": _winnow_sql(),
        "fingerprint":
            "SELECT doc_id, xor(md5_number_lower(text), md5_number_upper("
            "regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint "
            "FROM documents",
        "multimodal_features":
            "SELECT doc_id AS media_id, "
            "CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes, "
            "md5_number_lower(text) AS payload_digest FROM documents",
        "minhash_pairs":
            "WITH d AS (SELECT doc_id, "
            f"regexp_extract_all(text, '{UNICODE_TOKEN_RE}') AS w "
            "FROM documents WHERE doc_id < 1000), "
            # coalesce: array_to_string([]) is NULL and [NULL] never
            # intersects — zero-word docs must carry the '' singleton
            # (engine _EMPTY_SHINGLE, J(∅,∅)=1; fuzz-found)
            "s AS (SELECT doc_id, CASE WHEN len(w) >= 3 THEN "
            "list_distinct(list_transform(range(1, len(w)-1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
            "ELSE [coalesce(array_to_string(w, ' '), '')] END AS sh "
            "FROM d) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM s a JOIN s b ON a.doc_id < b.doc_id "
            "WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / "
            "greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.5",
    }
    try:
        # generates the deterministic /tmp transcripts cache as a side
        # effect; if that ever fails (read-only /tmp, disk full) this entry
        # degrades to a rows-only check instead of erroring EVERY oracle
        out["transcripts_pipeline"] = _transcripts_pipeline_sql()
    except Exception:
        pass
    return out
