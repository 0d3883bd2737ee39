"""CLI entrypoint — the ``ray job submit`` surface (north_rule: "resumes
idempotently under ray job submit on fixed-size clusters"):

    ray job submit -- python -m logstash_filter_translate_ray \
        run --input /data/transcripts --out /data/routed [--shard-files 4]

    python -m logstash_filter_translate_ray spec --spec pipeline.yaml \
        [--out /data/curated --shard-files 4]      # checkpointed + resumable

``run`` executes the flagship parse → enrich → route → aggregate DAG through
the checkpoint store: re-submitting the SAME command after a failure skips
finished shards (per-shard manifests carry lineage + metrics) and converges
to identical totals. ``spec`` runs a declarative YAML/JSON pipeline.

Ray ownership: attaches to an existing session (`ray job submit` sets one
up); only initializes/shuts down a session it created itself.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="logstash_filter_translate_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run", help="resumable flagship transcripts DAG")
    r.add_argument("--input", required=True,
                   help="transcript parquet file/dir (input_hint schema)")
    r.add_argument("--out", required=True, help="checkpointed output dir")
    r.add_argument("--shard-files", type=int, default=4,
                   help="input files per resumable shard")
    s = sub.add_parser("spec", help="run a declarative YAML/JSON pipeline")
    s.add_argument("--spec", required=True)
    s.add_argument("--out", default=None,
                   help="checkpointed output dir: run RESUMABLY with "
                        "per-shard manifests (run_spec_resumable)")
    s.add_argument("--shard-files", type=int, default=4)
    args = p.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init()
    try:
        if args.cmd == "run":
            from .pipelines import run_resumable
            res = run_resumable(args.input, args.out,
                                shard_files=args.shard_files)
            print(json.dumps(res, default=str))
        elif args.out:
            from .pipelines.spec import run_spec_resumable
            res = run_spec_resumable(args.spec, args.out,
                                     shard_files=args.shard_files)
            res.pop("result", None)      # Datasets don't JSON-serialize
            print(json.dumps(res, default=str))
        else:
            from .pipelines.spec import run_spec
            ds = run_spec(args.spec)
            if ds is not None:
                print(json.dumps({"rows": ds.count()}))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
