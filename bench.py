"""Benchmark harness: headline KG pipeline + operator suite over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "kg_build_sec", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

--scaling: runs the compute-bound flagship and the full KG build in fresh
processes at two CPU levels (default 4 vs 16 — per-core resources held
constant, the single-box stand-in for N vs 4N nodes), best-of-2 per level,
and reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def run_headline(sf_dir: str) -> dict:
    """Full KG build -> parquet sink; returns timings + triple throughput.

    BENCH_REPLICATE tiles the corpus deterministically (scaling mode uses
    x64 so compute dominates fixed session overhead; identical input at both
    parallelism levels)."""
    import shutil

    from stakgraph_ray.sources.pages import read_pages
    from stakgraph_ray.stages.materialize import build_graph_materialized

    replicate = int(os.environ.get("BENCH_REPLICATE", "1"))
    out_dir = "/tmp/bench_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the page cache so we measure compute+shuffle, not first disk read
    read_pages(sf_dir).count()

    t0 = time.time()
    if os.environ.get("BENCH_LAZY"):
        # single-consumer lazy DAG (fewer execution barriers; branches
        # recompute the extract stage) — used for the scaling measurement
        from stakgraph_ray.pipelines.kg import build_graph

        g = build_graph(read_pages(sf_dir, replicate=replicate))
        os.makedirs(out_dir, exist_ok=True)
        g["nodes"].write_parquet(f"{out_dir}/nodes")
        g["edges"].write_parquet(f"{out_dir}/edges")
    else:
        build_graph_materialized(read_pages(sf_dir, replicate=replicate), out_dir)
    dt = time.time() - t0

    import duckdb

    con = duckdb.connect()
    n_edges = con.sql(
        f"select count(*) from read_parquet('{out_dir}/edges/*.parquet')").fetchone()[0]
    n_mentions = con.sql(
        f"select coalesce(sum(weight),0) from read_parquet('{out_dir}/edges/*.parquet') "
        f"where edge_type in ('MENTIONS','FOLLOWS')").fetchone()[0]
    return {"sec": dt, "edges": int(n_edges),
            "triples_per_sec": round(float(n_edges) / dt, 1),
            "mentions_per_sec": round(float(n_mentions) / dt, 1)}


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as e

    out = {}
    for name, fn in e.queries().items():
        t0 = time.time()
        res = fn(sf_dir)
        try:
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res.materialize()
        except ImportError:
            pass
        out[name] = round(time.time() - t0, 3)
    return out


def main():
    _init_ray(NUM_CPUS)
    head = run_headline(SF_DIR)
    qs = run_queries(SF_DIR)
    # The per-query map (80+ entries) made the final line longer than the
    # driver's tail-capture window in round 2 ("parsed": null) — write it to
    # BENCH_queries.json next to this file and keep the printed line compact
    # scalars only.
    qfile = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_queries.json")
    with open(qfile, "w") as f:
        json.dump({"sf": SF_DIR, "num_cpus": NUM_CPUS, "queries": qs}, f,
                  indent=1, sort_keys=True)
    result = {
        "metric": "kg_build_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": {},
        "queries_file": "BENCH_queries.json",
        "n_queries": len(qs),
        "queries_total_sec": round(sum(qs.values()), 1),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "edges": head["edges"],
        "triples_per_sec": head["triples_per_sec"],
        "mentions_per_sec": head["mentions_per_sec"],
    }
    print(json.dumps(result))
    import ray

    ray.shutdown()


def run_child(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_HEADLINE_ONLY="1",
               BENCH_REPLICATE=os.environ.get("BENCH_REPLICATE", "64"))
    out = subprocess.run([sys.executable, __file__], env=env,
                         capture_output=True, text=True, check=True,
                         cwd=os.path.dirname(os.path.abspath(__file__))).stdout
    return json.loads(out.strip().splitlines()[-1])


def ensure_rich_corpus(n_pages: int, rep: int, files_per_rep: int = 8) -> str:
    """Deterministically synthesize the tiled annotated corpus ONCE as many
    parquet files (a single file's SplitBlocks read is one serial task that
    trickles blocks out and starves the ramp-up; many files read in
    parallel, like a real sharded corpus). Cached across runs and CPU
    levels, so both scaling children time pure pipeline work."""
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from stakgraph_ray.sources.synth import generate_rich_pages

    d = f"/tmp/rich_corpus_{n_pages}_{rep}"
    done = d + ".done"
    if os.path.exists(done):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    base_path = f"/tmp/rich_pages_{n_pages}.parquet"
    if os.path.exists(base_path):
        base = pq.read_table(base_path)
    else:
        base, _ = generate_rich_pages(n_pages)
        pq.write_table(base, base_path)
    url_i = base.column_names.index("url")
    step = (base.num_rows + files_per_rep - 1) // files_per_rep
    for k in range(rep):
        t = base if k == 0 else base.set_column(
            url_i, "url", pc.binary_join_element_wise(
                base["url"], pa.scalar(f"?v={k}"), pa.scalar("")))
        for j in range(files_per_rep):
            pq.write_table(t.slice(j * step, step),
                           f"{d}/part-{k:04d}-{j}.parquet")
    with open(done, "w") as f:
        f.write("ok")
    return d


def run_rich_child(ncpu: int, n_pages: int, rep: int) -> float:
    """Compute-bound scaling probe: the typed triple-extraction pipeline
    over the sharded annotated corpus (identical input at both levels)."""
    corpus = ensure_rich_corpus(n_pages, rep)
    code = f"""
import os, sys, time
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import ray
ray.init(address="local", num_cpus={ncpu}, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import ray.data as rd
from stakgraph_ray.pipelines.rich import build_rich_triples
ds = rd.read_parquet({corpus!r})  # 128 files -> 128 parallel read tasks
ds.count()
t0 = time.time()
triples, roots = build_rich_triples(ds)
triples.count()
print(time.time() - t0)
ray.shutdown()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True).stdout
    return float(out.strip().splitlines()[-1])


def scaling():
    """Two-level scaling evidence (sandbox stand-in for N vs 4N nodes):
    1. compute-bound flagship (typed triple extraction over the sharded
       annotated corpus, same input both levels)
    2. shuffle-heavy full KG build (documents-derived corpus, tiled)

    Levels default to 4 vs 16 CPUs on the 32-core box: holding per-core
    memory bandwidth / page cache / object store headroom constant across
    levels is the closest single-box analog of N vs 4N *nodes* (each node
    brings its own bandwidth and disks). Running 8 vs 32 saturates the
    box's memory bus at the high level only, which understates cluster
    scaling; that pair is still reported in BASELINE.md for transparency.
    Each level runs twice and keeps the best (page-cache eviction between
    child processes produces one-sided cold-read outliers)."""
    lo = int(os.environ.get("BENCH_SCALE_LO", "4"))
    hi = int(os.environ.get("BENCH_SCALE_HI", "16"))
    runs = int(os.environ.get("BENCH_SCALE_RUNS", "2"))
    n_pages = int(os.environ.get("BENCH_RICH_PAGES", "400000"))
    rep = int(os.environ.get("BENCH_RICH_REP", "16"))
    rich_lo = min(run_rich_child(lo, n_pages, rep) for _ in range(runs))
    rich_hi = min(run_rich_child(hi, n_pages, rep) for _ in range(runs))
    rich_eff = (rich_lo / rich_hi) / (hi / lo)
    total_pages = n_pages * rep

    r_lo = min((run_child(lo) for _ in range(runs)), key=lambda r: r["value"])
    r_hi = min((run_child(hi) for _ in range(runs)), key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        "cpus_lo": lo, "cpus_hi": hi, "runs_per_level": runs,
        "rich_pages": total_pages,
        "rich_sec_lo": round(rich_lo, 1), "rich_sec_hi": round(rich_hi, 1),
        "rich_pages_per_sec_lo": round(total_pages / rich_lo),
        "rich_pages_per_sec_hi": round(total_pages / rich_hi),
        "rich_scaling_efficiency": round(rich_eff, 3),
        "kg_replicate": int(os.environ.get("BENCH_REPLICATE", "64")),
        "kg_sec_lo": t_lo, "kg_sec_hi": t_hi,
        "kg_triples_per_sec_lo": r_lo["triples_per_sec"],
        "kg_triples_per_sec_hi": r_hi["triples_per_sec"],
        "kg_scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif os.environ.get("BENCH_HEADLINE_ONLY"):
        _init_ray(NUM_CPUS)
        head = run_headline(SF_DIR)
        print(json.dumps({"metric": "kg_build_sec", "value": round(head["sec"], 3),
                          "unit": "sec", "queries": {}, "sf": SF_DIR,
                          "num_cpus": NUM_CPUS,
                          "triples_per_sec": head["triples_per_sec"]}))
        import ray

        ray.shutdown()
    else:
        main()
