#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and print ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "turns": N, "turns_per_sec": N}

--scaling: run the identical headline job in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and print both throughputs
plus scaling efficiency (the sandbox proxy for N vs 4N nodes —
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# headline transcript volume scales with sf: sf0.1 → 2M turns
TURNS_PER_SF = 20_000_000


def _sf_value(sf_dir: str) -> float:
    try:
        return float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        return 0.1


def run_bench() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd
    from logstash_filter_translate_ray.pipelines import build_enriched_dataset
    from logstash_filter_translate_ray.pipelines.transcripts import read_transcripts
    from logstash_filter_translate_ray.sources import transcripts_parquet_path

    sf = _sf_value(SF_DIR)
    n_turns = max(100_000, int(TURNS_PER_SF * sf))
    tpath = transcripts_parquet_path(n_turns, seed=42, n_files=32)

    # warm (untimed): OS page cache, Ray worker pool, and per-worker imports
    # of the UDF chain — we measure compute + shuffle, not process spawn
    build_enriched_dataset(read_transcripts(tpath)).count()

    out_dir = f"/tmp/lftr_bench_out/ncpu{NUM_CPUS}"
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    ds = build_enriched_dataset(read_transcripts(tpath))
    ds.write_parquet(out_dir, partition_cols=["route"])
    # per-sink counts from the written parquet footers (the same accounting
    # the checkpoint manifests use — exact, and O(#files) not O(rows))
    route_counts = {}
    for root, _, files in os.walk(out_dir):
        for f in files:
            if f.endswith(".parquet"):
                route = os.path.basename(root).split("=", 1)[-1]
                import pyarrow.parquet as pq
                route_counts[route] = route_counts.get(route, 0) + \
                    pq.read_metadata(os.path.join(root, f)).num_rows
    headline = time.perf_counter() - t0
    total_rows = sum(route_counts.values())
    assert total_rows == n_turns, (total_rows, n_turns)

    # per-query timings over the sf tables (the SQL-checked operator suite)
    import __ray_entry__ as em
    qtimes = {}
    for name in ["translate_exact", "translate_regex", "translate_union",
                 "translate_iterate_values", "route_counts",
                 "agg_value_by_type", "parse_extract", "dedup_exact",
                 "token_count", "langid", "fingerprint", "simhash",
                 "ann_topk", "sort_limit"]:
        fn = em.queries()[name]
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas()
        qtimes[name] = round(time.perf_counter() - t0, 4)

    result = {
        "metric": "transcripts parse→enrich→route→aggregate wall time",
        "value": round(headline, 4),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs → scaling efficiency."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling efficiency (num_cpus 8 → 32, fresh sessions, same input)",
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "speedup": round(r_lo["value"] / r_hi["value"], 3),
        "scaling_efficiency": round(eff, 3),
        "turns": r_lo["turns"], "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
