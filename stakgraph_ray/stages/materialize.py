"""Checkpointed, resumable graph materialization with per-stage lineage.

Re-expresses the reference's per-stage streaming flush + incremental resume
(/root/reference/ast/src/builder/streaming.rs:96-130,
ast/src/lang/graphs/graph_ops.rs:95-275 — commit-hash diff, delete+reparse)
as Parquet stage checkpoints:

  workdir/
    extracted/   part-*.parquet + _MANIFEST.json   (html already dropped)
    linked/      part-*.parquet + _MANIFEST.json
    nodes/       part-*.parquet + _MANIFEST.json   (final product)
    edges/       part-*.parquet + _MANIFEST.json
    metrics.jsonl                                   (per-stage wall time/rows)

A stage whose _MANIFEST.json exists and row-counts match is SKIPPED on
re-run (kill-and-resume), and each downstream branch re-reads the checkpoint
instead of recomputing the upstream DAG (the reference's 16-stage builder
reads earlier stages' results the same way, builder/core.rs:70-217).

At 100 TB these checkpoints are exactly the partitioned intermediate tables
you want anyway: they bound recompute after failure and let each wide stage
read only the columns it needs.
"""

from __future__ import annotations


import json
import os
import sys
import time


def _pin_fsspec_http_stub() -> None:
    """Make ``import fsspec.implementations.http`` permanently succeed.

    Ray probes every read/write path with ``from fsspec.implementations.http
    import HTTPFileSystem`` catching only ModuleNotFoundError. In this
    environment aiohttp is absent, so the probe module FAILS to initialize
    and is re-executed on every call — and two driver threads (the parallel
    nodes_raw/edges_raw checkpoints) racing that re-import intermittently
    see each other's partially-initialized module, raising a plain
    ImportError that escapes Ray's handler. Pinning a stub whose
    HTTPFileSystem is a never-instantiated class makes the import succeed
    once and cache forever; Ray's isinstance check then returns False —
    the same outcome as the ModuleNotFoundError path, now race-free.
    No-op when the real module imports (aiohttp present)."""
    name = "fsspec.implementations.http"
    try:
        __import__(name)
        return
    except ImportError:
        pass
    import types

    mod = types.ModuleType(name)

    class HTTPFileSystem:  # noqa: N801 - mirrors the fsspec class name
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules[name] = mod


_pin_fsspec_http_stub()


class _DaemonJob:
    """Run ``fn`` on a daemon thread; ``result()`` joins and re-raises.

    Replaces the single-slot ThreadPoolExecutor for the typed-extract
    overlap: pool worker threads are non-daemon and concurrent.futures
    joins them at interpreter exit, so a build that raised while the
    overlapped materialize was in flight blocked process exit until the
    orphaned background pass finished. A daemon thread dies with the
    process; mid-process, ``result()`` re-raises the job's exception."""

    def __init__(self, fn):
        import threading

        self._value = None
        self._exc = None

        def _run():
            try:
                self._value = fn()
            except BaseException as e:  # noqa: BLE001 - re-raised in result()
                self._exc = e

        self._thread = threading.Thread(target=_run, daemon=True,
                                        name="typed-extract-overlap")
        self._thread.start()

    def result(self):
        self._thread.join()
        if self._exc is not None:
            raise self._exc
        return self._value


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_MANIFEST.json")


def _parquet_rows(stage_dir: str) -> int:
    import pyarrow.parquet as pq

    return sum(pq.read_metadata(os.path.join(stage_dir, f)).num_rows
               for f in os.listdir(stage_dir) if f.endswith(".parquet"))


def manifest_complete(stage_dir: str) -> bool:
    p = _manifest_path(stage_dir)
    if not os.path.exists(p):
        return False
    try:
        m = json.load(open(p))
    except (json.JSONDecodeError, OSError):
        return False
    return bool(m.get("complete"))


def write_manifest(stage_dir: str, *, rows: int, stage: str, extra: dict | None = None):
    files = sorted(f for f in os.listdir(stage_dir) if f.endswith(".parquet"))
    m = {"stage": stage, "rows": rows, "files": files,
         "complete": True, **(extra or {})}
    tmp = _manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(stage_dir))  # atomic publish


def checkpoint(ds, stage_dir: str, stage: str, metrics: list | None = None,
               extra: dict | None = None, min_rows_per_file: int = 100_000):
    """Write ``ds`` to ``stage_dir`` unless a complete manifest exists;
    return a fresh Dataset reading the checkpoint.

    ``min_rows_per_file`` balances two failure modes at the stage handoff:
    KB-sized files (lazy union DAGs emit hundreds of tiny blocks; per-file
    overhead dominates and re-reads inherit the fragmentation) vs TOO FEW
    files — ReadParquet parallelism is bounded by file count, so a
    100 k-row floor on a 320 k-row pages table yields 3 files and every
    downstream consumer trickles through 3 serial read tasks (measured:
    the link stage's mention explode ran a FLAT ~3.5 s at 4 and 16 CPUs).
    Stages with few, wide rows (the extracted pages corpus) should pass a
    smaller floor so the file count stays ≳ the cluster's CPU count."""
    import shutil

    import ray.data as rd

    from ..util import default_num_blocks

    t0 = time.time()
    if not manifest_complete(stage_dir):
        shutil.rmtree(stage_dir, ignore_errors=True)  # write_parquet appends
        os.makedirs(stage_dir, exist_ok=True)
        ds.write_parquet(stage_dir, min_rows_per_file=min_rows_per_file)
        rows = _parquet_rows(stage_dir)  # metadata scan, no Ray execution
        out = rd.read_parquet(stage_dir,
                              override_num_blocks=default_num_blocks())
        write_manifest(stage_dir, rows=rows, stage=stage, extra=extra)
        skipped = False
    else:
        out = rd.read_parquet(stage_dir,
                              override_num_blocks=default_num_blocks())
        rows = json.load(open(_manifest_path(stage_dir)))["rows"]
        skipped = True
    if metrics is not None:
        metrics.append({"stage": stage, "rows": rows, "skipped": skipped,
                        "sec": round(time.time() - t0, 3)})
    return out


def append_metrics(workdir: str, metrics: list):
    with open(os.path.join(workdir, "metrics.jsonl"), "a") as f:
        for m in metrics:
            f.write(json.dumps(m) + "\n")


class EventList(list):
    """Metrics list that also pushes each appended stage event to a
    subscriber callback — the reference's SSE status stream analog
    (/root/reference/ast/src/builder/progress.rs:6-121 streams per-stage
    progress events to HTTP clients; here the build's consumer subscribes
    in-process and metrics.jsonl stays the durable record)."""

    def __init__(self, on_event=None):
        super().__init__()
        self._on_event = on_event

    def append(self, item):  # noqa: A003 - list API
        super().append(item)
        if self._on_event is not None:
            try:
                self._on_event(item)
            except Exception:
                pass  # a slow/broken subscriber must never fail the build

    def extend(self, items):
        for it in items:
            self.append(it)


def stream_metrics(workdir: str, poll: float = 0.25, timeout: float | None = None):
    """Generator tailing ``workdir/metrics.jsonl`` — the consumer side of
    the status stream (progress.rs SSE client analog) for an observer in
    another process. Yields parsed event dicts as they are flushed; stops
    after ``timeout`` seconds without new events (None = single pass over
    what exists now)."""
    path = os.path.join(workdir, "metrics.jsonl")
    pos = 0
    waited = 0.0
    while True:
        if os.path.exists(path):
            with open(path) as f:
                f.seek(pos)
                chunk = f.read()
                pos = f.tell()
            got = False
            for line in chunk.splitlines():
                line = line.strip()
                if line:
                    got = True
                    yield json.loads(line)
            if got:
                waited = 0.0
                continue
        if timeout is None:
            return
        waited += poll
        if waited >= timeout:
            return
        time.sleep(poll)


def build_graph_materialized(pages_ds, workdir: str, cfg=None,
                             dictionary: dict | None = None,
                             on_event=None) -> dict:
    """Flagship production path: pages -> checkpointed stages -> partitioned
    nodes/ + edges/ Parquet with lineage manifests. Resumable: completed
    stages are skipped on re-run. Returns stage paths + metrics.

    ``on_event``: optional callable receiving each per-stage metric dict as
    the stage completes (the progress.rs status-stream analog; see
    EventList / stream_metrics)."""
    import pyarrow as pa

    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..ops.dedup import distinct, first_per_key_batch
    from ..ops.partition import dedup_min_hp, first_wins_hp, grouped_aggregate
    from ..stages.extract import ExtractTextStage, bigram_rows, link_edge_rows, mention_rows
    from ..stages.link import bigram_linker_fn, make_linker_stage, term_linker_fn
    from ..stages.canonicalize import (alias_of_edges, canonical_roots,
                                       canonicalize_column)
    from ..pipelines import kg

    cfg = cfg or DEFAULT_CONFIG
    os.makedirs(workdir, exist_ok=True)
    metrics: list = EventList(on_event)

    # ---- stage 1: extract (html dropped at the checkpoint boundary) -------
    extracted = pages_ds.map_batches(ExtractTextStage(cfg),
                                     batch_format="pyarrow",
                                     batch_size=None)
    if cfg.dedup_pages:
        extracted = extracted.map_batches(
            lambda t: first_per_key_batch(t, "url", "warc_ts"),
            batch_format="pyarrow")
        extracted = first_wins_hp(extracted, "url", "warc_ts")
    # 8 k-row files: the pages table has FEW, WIDE rows, and this checkpoint
    # is re-read by ~6 downstream branches — at 100 k rows/file a 320 k-page
    # corpus became 3 files = 3 serial read tasks per consumer (see
    # checkpoint docstring)
    ex = checkpoint(extracted, os.path.join(workdir, "extracted"), "extract",
                    metrics, min_rows_per_file=8_000)

    # ---- stage 4b prologue: typed extraction overlaps stages 2-3 ----------
    # The per-language router pass depends ONLY on the extracted checkpoint,
    # not on linking or canonicalization, so its pure-map execution runs
    # from a driver thread concurrently with the link checkpoint + roots
    # computation below — at 16 CPUs those stages leave idle slots during
    # their shuffle barriers that the router's map tasks fill (measured
    # ~4 s off the x64 wall). Same >=4-CPU guard as the parallel
    # nodes_raw/edges_raw checkpoints: two executors on a tiny cluster
    # starve each other (the round-3 livelock).
    import ray

    from ..pipelines.rich import (_partial_agg, entity_types_table,
                                  reduce_triples, typed_graph_tables)
    from ..stages.registry import make_router

    typed_t0 = time.time()
    typed_lazy = ex.map_batches(make_router(), batch_format="pyarrow",
                                batch_size=None) \
        .map_batches(_partial_agg, batch_format="pyarrow")

    def _typed_job():
        # the WHOLE typed branch — router materialize AND the vocab-scale
        # reduce (its own LSH canonicalization + re-aggregate) — runs off
        # the critical path; round 4 overlapped only the materialize, so
        # reduce_triples sat serially between stage 3 and the stage-4
        # checkpoints (part of the profiled non-scaling driver fraction)
        typed = typed_lazy.materialize()
        typed, troots = reduce_triples(typed, cfg, canon_threshold=0.85)
        return typed, troots, typed.count()

    # The overlap runs on a DAEMON thread, not a ThreadPoolExecutor: pool
    # worker threads are non-daemon and concurrent.futures joins them at
    # interpreter exit, so if stages 2-4 raise while the typed materialize
    # is in flight, a failed build would block process exit until the
    # orphaned background pass finished (cancel() is a no-op once the
    # single-slot pool has started the job). A daemon thread dies with the
    # process; mid-process the exception propagates immediately and the
    # stray Ray tasks are reaped when the driver exits.
    typed_future = None
    if int(ray.cluster_resources().get("CPU", 0)) >= 4:
        typed_future = _DaemonJob(_typed_job)

    # ---- stage 2: mentions + linking (task pool, broadcast dictionary) ----
    linker_kwargs = make_linker_stage(cfg, dictionary)
    linked = ex.map_batches(mention_rows, batch_format="pyarrow") \
        .map_batches(term_linker_fn(linker_kwargs),
                     batch_format="pyarrow", batch_size=None)
    li = checkpoint(linked, os.path.join(workdir, "linked"), "link",
                    metrics)

    # ---- stage 3: canonicalization (LSH merge over distinct names) ----
    t0 = time.time()
    names = distinct(
        li.map_batches(lambda t: pa.table({"name": t["canonical"]}),
                       batch_format="pyarrow"), ["name"])
    roots = canonical_roots(names, cfg)
    metrics.append({"stage": "canonicalize", "rows": len(roots),
                    "sec": round(time.time() - t0, 3), "skipped": False})
    li = canonicalize_column(li, "canonical", roots)

    # ---- stage 4: node + edge tables (each branch reads checkpoints) ------
    node_cols = [f.name for f in kg._NODES_ORDER]

    page_nodes = ex.map_batches(kg.page_node_rows, batch_format="pyarrow")
    # distinct hosts shared by Host nodes and Corpus CONTAINS Host edges
    # (materialized: |hosts| rows, tiny)
    host_distinct = distinct(
        ex.map_batches(kg.host_rows, batch_format="pyarrow"),
        ["host"]).materialize()
    host_nodes = host_distinct.map_batches(kg.host_node_rows,
                                           batch_format="pyarrow")
    lang_nodes = distinct(ex.map_batches(kg.lang_rows, batch_format="pyarrow"),
                          ["lang"]).map_batches(kg.lang_node_rows, batch_format="pyarrow")
    term_nodes = dedup_min_hp(
        li.map_batches(kg.entity_node_rows, batch_format="pyarrow"),
        "node_key", columns=node_cols).map_batches(kg._cast_nodes,
                                                   batch_format="pyarrow")
    corpus_node = rd.from_arrow(kg._node_table(1, "Corpus", "webcorpus", "webcorpus"))
    nodes = corpus_node.union(host_nodes, lang_nodes, page_nodes, term_nodes)

    # struct/link ref_ids are unique across batches by construction
    # (kg.page_edge_rows + kg.links_to_edges_from_extracted docstrings:
    # explode + distinct share one UDF so inter-stage block slicing can't
    # split a url's link rows) -> pure map branches, no keyed dedup
    # exchange; two of the four edges_raw sort barriers deleted
    struct_edges = ex.map_batches(kg.page_edge_rows, batch_format="pyarrow") \
        .union(host_distinct.map_batches(kg.corpus_host_edge_rows,
                                         batch_format="pyarrow")) \
        .map_batches(kg._cast_edges, batch_format="pyarrow")
    link_edges = ex.map_batches(kg.links_to_edges_from_extracted,
                                batch_format="pyarrow") \
        .map_batches(kg._cast_edges, batch_format="pyarrow")
    mention_edges = grouped_aggregate(
        li.map_batches(kg.mention_edge_partial, batch_format="pyarrow"),
        ["url", "canonical"], [("confidence", "max"), ("weight", "sum")],
        ["confidence", "weight"]) \
        .map_batches(kg.mention_edge_final, batch_format="pyarrow")
    bigrams = ex.map_batches(bigram_rows, batch_format="pyarrow") \
        .map_batches(kg.bigram_surface_partial, batch_format="pyarrow") \
        .map_batches(bigram_linker_fn(linker_kwargs),
                     batch_format="pyarrow", batch_size=None)
    bigrams = canonicalize_column(bigrams, "a", roots)
    bigrams = canonicalize_column(bigrams, "b", roots)
    bigram_edges = grouped_aggregate(
        bigrams.map_batches(kg.bigram_weight_partial, batch_format="pyarrow"),
        ["a", "b"], [("weight", "sum")], ["weight"]) \
        .map_batches(kg.bigram_edge_final, batch_format="pyarrow")
    alias_edges = rd.from_arrow(alias_of_edges(roots))

    # ---- stage 4b: typed entity graph (per-language routed extraction) ----
    # Person/Org/Place nodes + FOUNDED/ACQUIRED/... edges merged into the one
    # graph product (cf. ast/src/builder/core.rs:48-235); the relation year
    # attribute rides in edge.operand. Corpora without relation patterns
    # contribute zero rows at the cost of one regex pass over extracted text.
    # The full typed branch (router materialize + vocab-scale reduce; typed
    # entity names canonicalize in their OWN namespace, see
    # pipelines/rich.reduce_triples) was launched before stage 2 (prologue
    # above); join it here — the reported sec spans launch to reduce, so an
    # overlapped run shows the stage's wall-clock footprint, most of it
    # shared with stages 2-3.
    if typed_future is not None:
        typed, troots, n_typed = typed_future.result()
    else:
        typed = typed_lazy.materialize()
        typed, troots = reduce_triples(typed, cfg, canon_threshold=0.85)
        n_typed = typed.count()
    metrics.append({"stage": "typed_extract", "rows": n_typed,
                    "sec": round(time.time() - typed_t0, 3), "skipped": False,
                    "overlapped": typed_future is not None})
    edges = struct_edges.union(link_edges, mention_edges, bigram_edges,
                               alias_edges)
    if n_typed:  # corpora without relation patterns contribute nothing
        etypes = entity_types_table(typed)
        typed_nodes, typed_edges = typed_graph_tables(typed, etypes)
        nodes = nodes.union(typed_nodes)
        edges = edges.union(typed_edges)

    # ---- stage 5: graph epilogue (prefer-typed dedup, orphan prune,
    # edge cascade — cf. btreemap_graph.rs:664-756) -------------------------
    if cfg.epilogue:
        from ..ops.epilogue import apply_epilogue

        # Checkpoint the raw tables FIRST, run the epilogue over the parquet
        # reads. Two reasons, both measured: (a) the lazy union DAGs produce
        # hundreds of KB-sized blocks and the epilogue's keyed shuffles pay
        # per-block scheduling overhead far exceeding their compute (67 s of
        # executor time for <1 s of work at sf0.1); the checkpoint read
        # re-blocks to ~2xCPU healthy blocks. (b) the epilogue consumes
        # nodes+edges twice each — lazy inputs would re-execute both full
        # DAGs. Also buys resume-past-build granularity.
        # The two writes are INDEPENDENT branches over already-checkpointed
        # inputs — run them from two driver threads so their executors
        # interleave (each spends much of its wall in barriers/stragglers
        # the other can fill); measured ~25% off the build's tail.
        # ONLY when the cluster can host two executors: on a tiny cluster
        # (observed at num_cpus=2) each execution's actor-pool stage pins a
        # CPU and the two executors starve each other's map tasks — a
        # livelock, not slowness (0 output files after 22 min on an idle
        # box; 4+ CPUs measured fine across three rounds). Below 4 CPUs
        # the tail-filling win is noise anyway; write sequentially.
        import ray

        m_nodes: list = []
        m_edges: list = []
        if int(ray.cluster_resources().get("CPU", 0)) >= 4:
            # _DaemonJob, not ThreadPoolExecutor: if one write fails the
            # exception surfaces as soon as its thread is joined instead of
            # being held until the sibling write finishes, and a failed
            # build can't block interpreter exit on a non-daemon worker.
            f_nodes = _DaemonJob(
                lambda: checkpoint(nodes, os.path.join(workdir, "nodes_raw"),
                                   "nodes_raw", m_nodes,
                                   min_rows_per_file=8_000))
            f_edges = _DaemonJob(
                lambda: checkpoint(edges, os.path.join(workdir, "edges_raw"),
                                   "edges_raw", m_edges))
            nodes, edges = f_nodes.result(), f_edges.result()
        else:
            nodes = checkpoint(nodes, os.path.join(workdir, "nodes_raw"),
                               "nodes_raw", m_nodes, min_rows_per_file=8_000)
            edges = checkpoint(edges, os.path.join(workdir, "edges_raw"),
                               "edges_raw", m_edges)
        metrics.extend(m_nodes + m_edges)
        t0 = time.time()
        nodes, edges = apply_epilogue(nodes, edges)
        metrics.append({"stage": "epilogue", "rows": None,
                        "sec": round(time.time() - t0, 3), "skipped": False})

    # Final product checkpoints are independent branches (epilogue's edges
    # are already materialized; nodes is a map-only filter over nodes_raw):
    # same two-driver-thread interleave as nodes_raw/edges_raw above, same
    # >=4-CPU guard — the final-nodes write was a profiled non-scaling
    # phase (9.7 -> 8.3 s at 4 -> 16 CPUs on the x64 build) that the edges
    # write's idle slots can absorb.
    m_fn: list = []
    m_fe: list = []
    if int(ray.cluster_resources().get("CPU", 0)) >= 4:
        # same _DaemonJob rationale as the nodes_raw/edges_raw pair above
        f_nodes = _DaemonJob(
            lambda: checkpoint(nodes, os.path.join(workdir, "nodes"),
                               "nodes", m_fn))
        f_edges = _DaemonJob(
            lambda: checkpoint(edges, os.path.join(workdir, "edges"),
                               "edges", m_fe))
        nodes_out, edges_out = f_nodes.result(), f_edges.result()
    else:
        nodes_out = checkpoint(nodes, os.path.join(workdir, "nodes"),
                               "nodes", m_fn)
        edges_out = checkpoint(edges, os.path.join(workdir, "edges"),
                               "edges", m_fe)
    metrics.extend(m_fn + m_fe)

    append_metrics(workdir, metrics)
    return {"workdir": workdir, "metrics": metrics,
            "nodes": nodes_out, "edges": edges_out,
            "roots": roots}


def export_graph_partitioned(workdir: str, out_dir: str) -> dict:
    """Bulk-sink analog of the reference's per-label Neo4j upload
    (/root/reference/neo4j/helpers.rs:8 batch=4096, builder/streaming.rs:58):
    re-exports the built graph as Parquet partitioned one directory per
    node_type / edge_type, so a bulk loader (or a 256-node cluster reading
    one label) touches only its partition. Reads the flagship checkpoints;
    returns the per-type row counts."""
    import shutil

    import pyarrow.dataset as pads
    import ray.data as rd

    from ..util import default_num_blocks

    counts: dict[str, dict[str, int]] = {}
    for table, part_col in (("nodes", "node_type"), ("edges", "edge_type")):
        src = os.path.join(workdir, table)
        dst = os.path.join(out_dir, table)
        shutil.rmtree(dst, ignore_errors=True)
        ds = rd.read_parquet(src, override_num_blocks=default_num_blocks())
        ds.write_parquet(dst, partition_cols=[part_col],
                         min_rows_per_file=100_000)
        # per-partition counts from parquet metadata (no Ray execution)
        c: dict[str, int] = {}
        for frag in pads.dataset(dst, partitioning="hive").get_fragments():
            key = frag.path.split(f"{part_col}=")[1].split("/")[0]
            c[key] = c.get(key, 0) + frag.count_rows()
        counts[table] = c
    return counts


def export_graph_jsonl(workdir: str, out_dir: str) -> dict:
    """JSONL graph sink — the reference's line-delimited export surface
    (/root/reference/standalone & mcp stream node/edge JSON objects per
    line): streams the built node/edge checkpoints through Ray's JSON
    datasink, one object per line, sharded one file per block. Returns
    row counts; ``read_graph_jsonl`` is the matching source."""
    import shutil

    import ray.data as rd

    from ..util import default_num_blocks

    counts: dict[str, int] = {}
    for table in ("nodes", "edges"):
        src = os.path.join(workdir, table)
        dst = os.path.join(out_dir, table)
        shutil.rmtree(dst, ignore_errors=True)
        ds = rd.read_parquet(src, override_num_blocks=default_num_blocks())
        ds.write_json(dst)
        counts[table] = ds.count()
    return counts


def read_graph_jsonl(out_dir: str) -> dict:
    """JSONL graph source: {'nodes': Dataset, 'edges': Dataset} from an
    export_graph_jsonl directory. JSON has one number type, so integer
    columns (weight, start/end) may read back widened to double — keys and
    row identity are exact; cast on read if downstream needs int64."""
    import ray.data as rd

    return {table: rd.read_json(os.path.join(out_dir, table))
            for table in ("nodes", "edges")}
