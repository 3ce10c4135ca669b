"""Graph analytics over the edges table: degrees, PageRank, importance tags.

Re-expresses the reference's post-hoc graph enrichment
(/root/reference/mcp/src/importance/detector.ts:12-120 — Neo4j GDS pagerank
+ degree query -> percentile thresholds -> importance tag;
mcp/src/graph/queries.ts:1126-1170 — write-back) as Dataset ops:
degrees are one union + grouped aggregate (no join); PageRank is bounded
power iteration, each round = one hash join + one grouped aggregate.
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


def pagerank(edges_ds, damping: float = 0.85, iterations: int = 10,
             num_partitions: int | None = None):
    """edges -> (node_key, pagerank) via bounded power iteration.

    Each round: contributions = ranks ⋈ edges on src (hash-partitioned
    Dataset.join), then grouped sum on dst; teleport term re-added per
    round. Dangling-node mass is dropped (documented deviation — matches
    the common simplified formulation)."""
    import ray.data as rd

    from ..util import join_num_partitions

    num_partitions = num_partitions or join_num_partitions()
    edges = edges_ds.map_batches(
        lambda t: pa.table({"src_key": pc.cast(t["src_key"], pa.string()),
                            "dst_key": pc.cast(t["dst_key"], pa.string())}),
        batch_format="pyarrow")
    edges = edges.materialize()  # reused every iteration

    nodes = degrees(edges, num_partitions)
    nodes = nodes.materialize()
    n_total = nodes.count()
    base = (1.0 - damping) / n_total

    ranks = nodes.map_batches(
        lambda t: pa.table({"node_key": t["node_key"],
                            "rank": pa.array(np.full(t.num_rows, 1.0 / n_total))}),
        batch_format="pyarrow")
    out_deg = nodes.map_batches(
        lambda t: pa.table({"node_key": t["node_key"],
                            "out_degree": t["out_degree"]}),
        batch_format="pyarrow").materialize()
    # nodes with no in-edges always sit at the teleport-only rank —
    # precomputed once from degrees instead of a per-iteration driver pass
    _teleport_only = nodes.map_batches(
        lambda t: t.filter(pc.equal(t["in_degree"], pa.scalar(0, pa.int64()))),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({"node_key": t["node_key"],
                            "rank": pa.array(np.full(t.num_rows, base))}),
        batch_format="pyarrow").materialize()

    for _ in range(iterations):
        r = ranks.join(out_deg, join_type="inner", num_partitions=num_partitions,
                       on=("node_key",))
        contrib_src = r.map_batches(
            lambda t: pa.table({
                "src_key": t["node_key"],
                "contrib": pc.divide(
                    pc.cast(t["rank"], pa.float64()),
                    pc.cast(pc.max_element_wise(t["out_degree"], pa.scalar(1, pa.int64())),
                            pa.float64()))}),
            batch_format="pyarrow")
        sent = edges.join(contrib_src, join_type="inner",
                          num_partitions=num_partitions, on=("src_key",))
        summed = grouped_aggregate(
            sent.map_batches(lambda t: pa.table({"node_key": t["dst_key"],
                                                 "contrib": t["contrib"]}),
                             batch_format="pyarrow"),
            "node_key", [("contrib", "sum")], ["contrib"], num_partitions)
        new_ranks = summed.map_batches(
            lambda t: pa.table({
                "node_key": t["node_key"],
                "rank": pc.add(pa.scalar(base),
                               pc.multiply(pa.scalar(damping),
                                           pc.cast(t["contrib"], pa.float64())))}),
            batch_format="pyarrow")
        ranks = new_ranks.union(_teleport_only).materialize()
    return ranks


def bfs_reachable(edges_ds, sources: list[str], max_depth: int = 3):
    """Frontier-expansion BFS over the edge table: nodes reachable from
    ``sources`` within ``max_depth`` hops (the get_map/shortest-path shape,
    /root/reference/mcp/src/graph/queries.ts:635-700, 837-855).

    Each hop = one broadcast-semi-join over the edges (frontier is small;
    edges never move). Returns (node_key, depth) with the minimal depth."""
    import pyarrow as pa

    from .relational import broadcast

    edges = edges_ds.map_batches(
        lambda t: pa.table({"src_key": pc.cast(t["src_key"], pa.string()),
                            "dst_key": pc.cast(t["dst_key"], pa.string())}),
        batch_format="pyarrow").materialize()

    seen: dict[str, int] = {s: 0 for s in sources}
    frontier = set(sources)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        ref = broadcast(sorted(frontier))

        class Expand:
            def __init__(self, ref):
                from .relational import _resolve

                self.frontier = pa.array(sorted(set(_resolve(ref))))

            def __call__(self, t: pa.Table) -> pa.Table:
                hit = t.filter(pc.is_in(t["src_key"], value_set=self.frontier))
                return hit.select(["dst_key"])

        from ..util import pool_size

        nexts = edges.map_batches(Expand, fn_constructor_kwargs={"ref": ref},
                                  batch_format="pyarrow",
                                  concurrency=pool_size())
        reached = {r["dst_key"] for r in nexts.take_all()}
        frontier = {n for n in reached if n not in seen}
        for n in frontier:
            seen[n] = depth
    items = sorted(seen.items())
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "node_key": pa.array([k for k, _ in items], pa.string()),
        "depth": pa.array([d for _, d in items], pa.int64()),
    }))


def importance_tags(pagerank_ds, degrees_ds, num_partitions: int | None = None):
    """Percentile-threshold importance tags (cf. detector.ts:54-120):
    p90 pagerank -> 'hub'; in>0 & out==0 -> 'sink'; out>0 & in==0 ->
    'entry_point'; degree 0 -> 'isolated'; else 'normal'."""
    from ..util import join_num_partitions

    num_partitions = num_partitions or join_num_partitions()
    joined = pagerank_ds.join(degrees_ds, join_type="inner",
                              num_partitions=num_partitions, on=("node_key",))
    # percentile threshold: tiny rank table -> driver-side quantile
    ranks = [r["rank"] for r in pagerank_ds.select_columns(["rank"]).take_all()]
    p90 = float(np.quantile(ranks, 0.9)) if ranks else 0.0

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
