"""Cluster job entrypoint — the module a multi-node deployment submits:

    ray job submit --working-dir . -- python -m stakgraph_ray.job \
        --input /data/pages --output /data/graph [--incremental]

Reads the pages Parquet corpus, runs the checkpointed flagship build
(extract -> link -> canonicalize -> typed extract -> nodes/edges ->
epilogue), and writes partitioned node/edge Parquet + per-stage manifests
under --output. Re-submitting the same job resumes from the last complete
stage (checkpoint manifests); --incremental re-extracts only changed urls.

In this sandbox it runs single-node (`ray.init(address="local")` guarded);
on a real cluster `ray job submit` provides the address and the same code
path scales by partitioning alone — no driver-side state grows with the
corpus (see README "Scale design")."""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="stakgraph_ray.job")
    p.add_argument("--input", required=True,
                   help="directory with pages parquet (or a documents table "
                        "to derive pages from)")
    p.add_argument("--output", required=True,
                   help="output directory (stage checkpoints + nodes/ edges/)")
    p.add_argument("--incremental", action="store_true",
                   help="diff against existing checkpoints; re-extract only "
                        "changed urls")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local-mode CPU cap (ignored under ray job submit, "
                        "which provides the cluster address)")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # no explicit address: RAY_ADDRESS wins (the cluster address under
        # `ray job submit`; "local" in this sandbox where it is preset),
        # falling back to a local instance — passing address="local" here
        # would boot a fresh single-node Ray ON the head node and ignore
        # the submitted-to cluster entirely.
        kw = {"include_dashboard": False}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    from .sources.pages import read_pages
    from .stages.materialize import build_graph_materialized

    t0 = time.time()
    if args.incremental:
        from .stages.incremental import incremental_update

        result = incremental_update(read_pages(args.input), args.output)
    else:
        result = build_graph_materialized(read_pages(args.input), args.output)
    dt = time.time() - t0
    summary = {"output": args.output, "sec": round(dt, 2),
               "stages": sorted(result) if isinstance(result, dict) else None}
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
