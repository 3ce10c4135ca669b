"""Graph analytics over the edges table: degrees, PageRank, BFS, importance.

Re-expresses the reference's post-hoc graph enrichment
(/root/reference/mcp/src/importance/detector.ts:12-120 — Neo4j GDS pagerank
+ degree query -> percentile thresholds -> importance tag;
mcp/src/graph/queries.ts:1126-1170 — write-back) as Dataset ops.

Scale design:
  - degrees: one union + grouped aggregate (no join)
  - pagerank: bounded power iteration with DANGLING-MASS redistribution;
    per round ONE hash join (edges pre-augmented with the destination's
    out-degree, so the rank table carries out_degree through the grouped
    aggregate instead of re-joining it every round). A guarded local fast
    path handles small graphs in one numpy pass (identical formula).
  - bfs: the frontier and the seen set stay DATASETS end-to-end; the
    broadcast expansion path is taken only under an explicit size guard,
    else a distributed hash semi-join / left-anti join per hop.
  - importance: p90 via ops.quantile.distributed_quantile (bounded driver
    memory), not a take_all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .partition import grouped_aggregate


def degrees(edges_ds, num_partitions: int | None = None):
    """edges (src_key, dst_key) -> (node_key, out_degree, in_degree).

    One shuffle: explode each edge into two (node, out, in) partial rows,
    then a grouped sum — no join needed."""

    def explode(t: pa.Table) -> pa.Table:
        src = pc.cast(t["src_key"], pa.string())
        dst = pc.cast(t["dst_key"], pa.string())
        n = t.num_rows
        ones = pa.array(np.ones(n, dtype=np.int64))
        zeros = pa.array(np.zeros(n, dtype=np.int64))
        out = pa.table({"node_key": src, "out_degree": ones, "in_degree": zeros})
        inn = pa.table({"node_key": dst, "out_degree": zeros, "in_degree": ones})
        both = pa.concat_tables([out, inn])
        g = both.group_by(["node_key"]).aggregate(
            [("out_degree", "sum"), ("in_degree", "sum")])
        return g.rename_columns(["node_key", "out_degree", "in_degree"])

    partials = edges_ds.map_batches(explode, batch_format="pyarrow")
    return grouped_aggregate(partials, "node_key",
                             [("out_degree", "sum"), ("in_degree", "sum")],
                             ["out_degree", "in_degree"], num_partitions)


def _pagerank_local(edge_rows: list[tuple[str, str]], damping: float,
                    iterations: int):
    """Guarded small-graph fast path — identical formula, one numpy pass."""
    nodes = sorted({x for e in edge_rows for x in e})
    idx = {x: i for i, x in enumerate(nodes)}
    n = len(nodes)
    src = np.array([idx[a] for a, _ in edge_rows], dtype=np.int64)
    dst = np.array([idx[b] for _, b in edge_rows], dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    base = (1.0 - damping) / n
    dang = out_deg == 0
    for _ in range(iterations):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / out_deg[src])
        dmass = r[dang].sum()
        r = base + damping * (contrib + dmass / n)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node_key": pa.array(nodes, pa.string()),
        "rank": pa.array(r, pa.float64()),
    }))


def pagerank(edges_ds, damping: float = 0.85, iterations: int = 10,
             num_partitions: int | None = None, local_limit: int = 100_000):
    """edges -> (node_key, pagerank) via bounded power iteration with
    dangling-mass redistribution:

        r'(i) = (1-d)/n + d * (sum_{j->i} r(j)/out(j) + D/n),
        D = sum of r over nodes with out_degree == 0.

    Each round: ONE hash join (edges carry the destination's out-degree, so
    the grouped sum re-emits it — no second join), a grouped aggregate, a
    union with the static no-in-edge node set, and a dangling-mass scalar
    aggregate over the (materialized) rank table."""
    from ..util import join_num_partitions

    num_partitions = num_partitions or join_num_partitions()
    edges = edges_ds.map_batches(
        lambda t: pa.table({"src_key": pc.cast(t["src_key"], pa.string()),
                            "dst_key": pc.cast(t["dst_key"], pa.string())}),
        batch_format="pyarrow")
    edges = edges.materialize()  # reused every iteration

    nodes = degrees(edges, num_partitions).materialize()
    n_total = nodes.count()
    if n_total == 0:
        return nodes.map_batches(
            lambda t: pa.table({"node_key": t["node_key"],
                                "rank": pa.array([], pa.float64())}),
            batch_format="pyarrow")
    n_edges = edges.count()
    if n_total <= local_limit and n_edges <= local_limit:
        rows = edges.take_all()
        return _pagerank_local([(r["src_key"], r["dst_key"]) for r in rows],
                               damping, iterations)

    base = (1.0 - damping) / n_total

    from .partition import cogroup_join_hp

    # one-time setup join: each edge carries its DESTINATION's out-degree so
    # the per-round grouped aggregate keeps out_degree in the rank table
    out_deg = nodes.map_batches(
        lambda t: pa.table({"dst_key": t["node_key"],
                            "dst_out": t["out_degree"]}),
        batch_format="pyarrow")
    edges_aug = cogroup_join_hp(
        edges, out_deg, "dst_key",
        pa.schema([("dst_key", pa.string()), ("src_key", pa.string())]),
        pa.schema([("dst_key", pa.string()), ("dst_out", pa.int64())]),
        num_partitions=num_partitions).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table({"node_key": t["node_key"],
                            "rank": pa.array(np.full(t.num_rows, 1.0 / n_total)),
                            "out_degree": t["out_degree"]}),
        batch_format="pyarrow").materialize()
    # nodes with no in-edges never receive contributions; static set
    no_in = nodes.map_batches(
        lambda t: t.filter(pc.equal(t["in_degree"], pa.scalar(0, pa.int64())))
                   .select(["node_key", "out_degree"]),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        dangling = ranks.map_batches(
            lambda t: t.filter(pc.equal(t["out_degree"], pa.scalar(0, pa.int64())))
                       .select(["rank"]),
            batch_format="pyarrow").sum("rank") or 0.0
        add = base + damping * dangling / n_total

        contrib = ranks.map_batches(
            lambda t: (lambda f: pa.table({
                "src_key": f["node_key"],
                "contrib": pc.divide(pc.cast(f["rank"], pa.float64()),
                                     pc.cast(f["out_degree"], pa.float64()))}))(
                t.filter(pc.greater(t["out_degree"], pa.scalar(0, pa.int64())))),
            batch_format="pyarrow")
        sent = cogroup_join_hp(
            edges_aug, contrib, "src_key",
            pa.schema([("src_key", pa.string()), ("dst_key", pa.string()),
                       ("dst_out", pa.int64())]),
            pa.schema([("src_key", pa.string()), ("contrib", pa.float64())]),
            num_partitions=num_partitions)
        summed = grouped_aggregate(
            sent.map_batches(lambda t: pa.table({"node_key": t["dst_key"],
                                                 "contrib": t["contrib"],
                                                 "out_degree": t["dst_out"]}),
                             batch_format="pyarrow"),
            "node_key", [("contrib", "sum"), ("out_degree", "min")],
            ["contrib", "out_degree"], num_partitions)
        new_ranks = summed.map_batches(
            lambda t, _a=add: pa.table({
                "node_key": t["node_key"],
                "rank": pc.add(pa.scalar(_a),
                               pc.multiply(pa.scalar(damping),
                                           pc.cast(t["contrib"], pa.float64()))),
                "out_degree": t["out_degree"]}),
            batch_format="pyarrow")
        top_up = no_in.map_batches(
            lambda t, _a=add: pa.table({
                "node_key": t["node_key"],
                "rank": pa.array(np.full(t.num_rows, _a)),
                "out_degree": t["out_degree"]}),
            batch_format="pyarrow")
        ranks = new_ranks.union(top_up).materialize()
    return ranks.map_batches(
        lambda t: t.select(["node_key", "rank"]), batch_format="pyarrow")


def bfs_reachable(edges_ds, sources: list[str], max_depth: int = 3,
                  broadcast_limit: int = 500_000):
    """Frontier-expansion BFS over the edge table: nodes reachable from
    ``sources`` within ``max_depth`` hops (the get_map/shortest-path shape,
    /root/reference/mcp/src/graph/queries.ts:635-700, 837-855).

    The frontier and the visited set are DATASETS throughout — nothing
    corpus-sized ever lands on the driver. Under ``broadcast_limit`` a hop
    uses the cheap broadcast semi-join (frontier keys -> is_in filter over
    the edges); above it, a distributed hash semi-join expands and a
    left-anti hash join subtracts the seen set. Returns (node_key, depth)
    with the minimal depth."""
    import ray.data as rd

    from ..util import join_num_partitions
    from .partition import distinct_hp

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src_key": pc.cast(t["src_key"], pa.string()),
                            "dst_key": pc.cast(t["dst_key"], pa.string())}),
        batch_format="pyarrow").materialize()
    num_partitions = join_num_partitions()

    seen = rd.from_arrow(pa.table({
        "node_key": pa.array(sorted(set(sources)), pa.string()),
        "depth": pa.array([0] * len(set(sources)), pa.int64()),
    })).materialize()
    frontier = seen
    n_seen = seen.count()

    for depth in range(1, max_depth + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            # guarded broadcast expansion (bounded driver set)
            from .relational import broadcast

            keys = sorted(r["node_key"] for r in frontier.take_all())
            ref = broadcast(keys)

            def expand(t: pa.Table, _ref=ref) -> pa.Table:
                from .relational import _resolve

                vs = pa.array(_resolve(_ref))
                hit = t.filter(pc.is_in(t["src_key"], value_set=vs))
                return pa.table({"node_key": hit["dst_key"]})

            nexts = edges.map_batches(expand, batch_format="pyarrow")
        else:
            from .partition import cogroup_join_hp

            fkeys = frontier.map_batches(
                lambda t: pa.table({"src_key": t["node_key"]}),
                batch_format="pyarrow")
            # frontier keys are distinct, so the inner co-group join is a
            # semi-join of the edges against the frontier
            nexts = cogroup_join_hp(
                edges, fkeys, "src_key",
                pa.schema([("src_key", pa.string()), ("dst_key", pa.string())]),
                pa.schema([("src_key", pa.string())]),
                num_partitions=num_partitions).map_batches(
                lambda t: pa.table({"node_key": t["dst_key"]}),
                batch_format="pyarrow")
        nexts = distinct_hp(nexts, "node_key")

        if n_seen <= broadcast_limit:
            from .relational import broadcast

            seen_keys = sorted(r["node_key"] for r in
                               seen.select_columns(["node_key"]).take_all())
            sref = broadcast(seen_keys)

            def unseen(t: pa.Table, _ref=sref) -> pa.Table:
                from .relational import _resolve

                vs = pa.array(_resolve(_ref))
                return t.filter(pc.invert(pc.is_in(t["node_key"], value_set=vs)))

            fresh = nexts.map_batches(unseen, batch_format="pyarrow")
        else:
            from .partition import cogroup_join_hp

            marked = seen.map_batches(
                lambda t: pa.table({"node_key": t["node_key"],
                                    "seen_mark": pa.array([1] * t.num_rows, pa.int8())}),
                batch_format="pyarrow")
            # left-anti: left-outer co-group join, keep null-marker rows
            fresh = cogroup_join_hp(
                nexts, marked, "node_key",
                pa.schema([("node_key", pa.string())]),
                pa.schema([("node_key", pa.string()), ("seen_mark", pa.int8())]),
                join_type="left outer",
                num_partitions=num_partitions).map_batches(
                lambda t: t.filter(pc.is_null(t["seen_mark"]))
                           .select(["node_key"]),
                batch_format="pyarrow")

        frontier = fresh.map_batches(
            lambda t, _d=depth: t.append_column(
                "depth", pa.array(np.full(t.num_rows, _d, dtype=np.int64))),
            batch_format="pyarrow").materialize()
        seen = seen.union(frontier).materialize()
        n_seen = seen.count()
    return seen


# Sorts below every character that can appear in a node key / canonical
# term (lowercase alnum + '-'), so comparing sep-joined path strings equals
# element-wise (list-lexicographic) path comparison at equal hop counts.
_PATH_SEP = "\x1f"


def bfs_shortest_paths(edges_ds, source: str, max_depth: int = 3,
                       broadcast_limit: int = 500_000):
    """Single-source BFS shortest paths WITH path reconstruction (the
    shortest_path consumer shape, /root/reference/mcp/src/graph/
    queries.ts:837-855 — bfs_reachable returns (node, depth) only; a
    get_map-style consumer needs the actual path).

    Returns (node_key, depth, path): hop distance from ``source`` and the
    '->'-joined node keys of the lexicographically-smallest shortest path.

    The frontier carries its own path column, grown one hop at a time and
    min-reduced per discovered node — no backward parent joins at the end.
    The per-node winner is exact: candidate paths to a node at its BFS
    depth all extend shortest paths of the previous hop with the same
    final element, and with a separator below every key character the
    string min equals the element-wise path min (greedy exchange holds).
    Frontier and seen stay Datasets; the broadcast expansion runs only
    under the size guard, else a co-group hash join per hop (mirrors
    bfs_reachable)."""
    import ray.data as rd

    from ..util import join_num_partitions
    from .partition import cogroup_join_hp
    from .relational import broadcast, _resolve

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src_key": pc.cast(t["src_key"], pa.string()),
                            "dst_key": pc.cast(t["dst_key"], pa.string())}),
        batch_format="pyarrow").materialize()
    num_partitions = join_num_partitions()

    seen = rd.from_arrow(pa.table({
        "node_key": pa.array([source], pa.string()),
        "depth": pa.array([0], pa.int64()),
        "path": pa.array([source], pa.string()),
    })).materialize()
    frontier = seen
    n_seen = 1

    for depth in range(1, max_depth + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier <= broadcast_limit:
            paths = {r["node_key"]: r["path"] for r in frontier.take_all()}
            ref = broadcast(paths)

            def expand(t: pa.Table, _ref=ref) -> pa.Table:
                import pandas as pd

                pmap = _resolve(_ref)
                src = t["src_key"].to_pandas()
                ppath = src.map(pmap)
                hit = ppath.notna().to_numpy()
                dst = t["dst_key"].to_pandas()[hit]
                return pa.table({
                    "node_key": pa.array(dst, pa.string()),
                    "path": pa.array(ppath[hit] + _PATH_SEP + dst,
                                     pa.string()),
                })

            cands = edges.map_batches(expand, batch_format="pyarrow")
        else:
            fr = frontier.map_batches(
                lambda t: pa.table({"src_key": t["node_key"],
                                    "ppath": t["path"]}),
                batch_format="pyarrow")
            cands = cogroup_join_hp(
                edges, fr, "src_key",
                pa.schema([("src_key", pa.string()), ("dst_key", pa.string())]),
                pa.schema([("src_key", pa.string()), ("ppath", pa.string())]),
                num_partitions=num_partitions).map_batches(
                lambda t: pa.table({
                    "node_key": t["dst_key"],
                    "path": pc.binary_join_element_wise(
                        t["ppath"], t["dst_key"], _PATH_SEP)}),
                batch_format="pyarrow")
        # one keyed shuffle: per discovered node, the minimal path
        best = grouped_aggregate(cands, ["node_key"], [("path", "min")],
                                 ["path"], num_partitions=num_partitions)

        if n_seen <= broadcast_limit:
            skeys = sorted(r["node_key"] for r in
                           seen.select_columns(["node_key"]).take_all())
            sref = broadcast(skeys)

            def unseen(t: pa.Table, _ref=sref) -> pa.Table:
                vs = pa.array(_resolve(_ref))
                return t.filter(
                    pc.invert(pc.is_in(t["node_key"], value_set=vs)))

            fresh = best.map_batches(unseen, batch_format="pyarrow")
        else:
            marked = seen.map_batches(
                lambda t: pa.table({
                    "node_key": t["node_key"],
                    "seen_mark": pa.array([1] * t.num_rows, pa.int8())}),
                batch_format="pyarrow")
            fresh = cogroup_join_hp(
                best, marked, "node_key",
                pa.schema([("node_key", pa.string()), ("path", pa.string())]),
                pa.schema([("node_key", pa.string()), ("seen_mark", pa.int8())]),
                join_type="left outer",
                num_partitions=num_partitions).map_batches(
                lambda t: t.filter(pc.is_null(t["seen_mark"]))
                           .select(["node_key", "path"]),
                batch_format="pyarrow")

        frontier = fresh.map_batches(
            lambda t, _d=depth: pa.table({
                "node_key": t["node_key"],
                "depth": pa.array(np.full(t.num_rows, _d, dtype=np.int64)),
                "path": t["path"]}),
            batch_format="pyarrow").materialize()
        seen = seen.union(frontier).materialize()
        n_seen = seen.count()

    return seen.map_batches(
        lambda t: pa.table({
            "node_key": t["node_key"],
            "depth": t["depth"],
            "path": pc.replace_substring(t["path"], _PATH_SEP, "->"),
        }),
        batch_format="pyarrow")


def importance_tags(pagerank_ds, degrees_ds, num_partitions: int | None = None):
    """Percentile-threshold importance tags (cf. detector.ts:54-120):
    p90 pagerank -> 'hub'; in>0 & out==0 -> 'sink'; out>0 & in==0 ->
    'entry_point'; degree 0 -> 'isolated'; else 'normal'.

    The p90 threshold comes from the bounded-memory distributed quantile
    (ops.quantile), not a driver take_all."""
    from ..util import join_num_partitions
    from .quantile import distributed_quantile

    from .partition import cogroup_join_hp

    num_partitions = num_partitions or join_num_partitions()
    pagerank_ds = pagerank_ds.materialize()  # two consumers: join + quantile
    joined = cogroup_join_hp(
        pagerank_ds, degrees_ds, "node_key",
        pa.schema([("node_key", pa.string()), ("rank", pa.float64())]),
        pa.schema([("node_key", pa.string()), ("out_degree", pa.int64()),
                   ("in_degree", pa.int64())]),
        num_partitions=num_partitions)
    p90 = distributed_quantile(pagerank_ds, "rank", 0.9)

    def tag(t: pa.Table) -> pa.Table:
        pr = t["rank"].to_numpy(zero_copy_only=False)
        ind = t["in_degree"].to_numpy(zero_copy_only=False)
        outd = t["out_degree"].to_numpy(zero_copy_only=False)
        tags = np.where(pr >= p90, "hub",
                        np.where((ind == 0) & (outd == 0), "isolated",
                                 np.where((ind == 0), "entry_point",
                                          np.where(outd == 0, "sink", "normal"))))
        return t.append_column("importance", pa.array(tags.astype(object), pa.string()))

    return joined.map_batches(tag, batch_format="pyarrow")
