"""Graph epilogue passes over the built nodes/edges tables.

Concrete re-expressions of the reference's post-build cleanup:
  - ``prune_orphan_nodes``      ~ prune_orphan_functions
    (/root/reference/ast/src/lang/graphs/btreemap_graph.rs:756+): drop
    nodes with no incident edge at all (root types exempt).
  - ``filter_childless_parents``~ filter_out_nodes_without_children
    (btreemap_graph.rs:664-710): drop parent-type nodes lacking a given
    child edge, then cascade-drop their dangling edges.
  - ``prefer_typed_dedup``      ~ deduplicate_nodes prefer-Class rule
    (btreemap_graph.rs:718-755): when the same name exists under several
    node types, keep the highest-priority type and re-point edges.

All passes are Dataset-native: membership tests are hash-co-partitioned
semi/anti joins (ops.partition.membership_filter_hp), never driver sets;
only the (vocabulary-bounded) cross-type rename map is broadcast, under an
explicit size guard.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import EDGES_SCHEMA, NODES_SCHEMA
from .partition import membership_filter_hp, partitioned_apply

_KEYS_SCHEMA = pa.schema([("node_key", pa.string())])

# prefer-type priority: typed entities beat structural beat Term stubs
DEFAULT_TYPE_PRIORITY = (
    "Corpus", "Host", "Page", "Section", "Link", "Person", "Org", "Place",
    "Year", "Topic", "Language", "Term",
)


def _key_hash(arr: pa.Array | pa.ChunkedArray):
    """uint64 fingerprint of a string key column (shared by both sides of
    the orphan filter — MUST be the same function on both).

    ``pd.util.hash_array`` is an implementation detail of the INSTALLED
    pandas: the probe side (node batches) and build side (edge batches) run
    in different worker processes, so a cluster mixing pandas versions could
    fingerprint the same key differently and falsely DROP a live node. A
    homogeneous pandas version across workers is therefore a deployment
    REQUIREMENT of this operator (standard for Ray clusters — one image per
    cluster); a version-stable primitive (md5low64, ~10x slower per key)
    is the fallback if that ever can't be guaranteed."""
    import numpy as np
    import pandas as pd

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = pc.cast(arr, pa.string()).to_numpy(zero_copy_only=False)
    return pd.util.hash_array(vals).astype(np.uint64)


def _endpoint_hashes(edges_ds):
    """uint64 fingerprints of node keys referenced by any edge, unique per
    block: 8 bytes/key instead of ~70 for the string. Cross-block key
    duplication is structural (a page key rides ~17 edge rows spread over
    unrelated branch blocks), so the per-block-unique stream is ~17x the
    distinct set — at the x256 build that was 22 M rows / 1.6 GB of
    STRINGS (over any sane broadcast guard) but only ~170 MB of hashes."""
    import numpy as np

    def sides(t: pa.Table) -> pa.Table:
        u = pc.unique(pa.concat_arrays(
            [pc.cast(t["src_key"].combine_chunks() if isinstance(
                t["src_key"], pa.ChunkedArray) else t["src_key"], pa.string()),
             pc.cast(t["dst_key"].combine_chunks() if isinstance(
                 t["dst_key"], pa.ChunkedArray) else t["dst_key"], pa.string())]))
        # a null endpoint must not whitelist null-key nodes: drop it here so
        # both prune paths treat null keys identically (see prune docstring)
        u = u.drop_null()
        return pa.table({"h": pa.array(np.unique(_key_hash(u)), pa.uint64())})

    return edges_ds.map_batches(sides, batch_format="pyarrow")


def prune_orphan_nodes(nodes_ds, edges_ds, exempt_types: tuple = ("Corpus",),
                       broadcast_byte_limit: int = 512 << 20):
    """Drop nodes with no incident edge (cf. prune_orphan_functions).

    Adaptive: the DISTINCT endpoint-key set is node-table-scale, so the
    filter broadcasts it and runs MAP-ONLY over nodes — no node-side
    all-to-all (the co-partition path cost a flat ~8 s at both 4 and 16
    CPUs on the x64 build, and its 1.6 GB key sort 65 s at x256). To keep
    the broadcast probe small the keys travel as uint64 fingerprints
    (``_key_hash``, 8 bytes/key); a fingerprint collision would FALSELY
    KEEP an orphan (never drop a live node) with probability ~n^2/2^64 —
    ~5e-8 at a million keys, the md5low64 trade-off used elsewhere
    (pipelines/queries_kg.py). Above ``broadcast_byte_limit`` of hashed
    keys (~70 M distinct endpoints per 512 MB) the keyed-shuffle
    membership filter runs over the SAME materialized fingerprint scan
    (no second edges pass; 8 bytes/key through the shuffle instead of the
    ~70-byte strings whose sort cost 65 s at x256) — identical collision
    direction, so both paths keep the never-drop-a-live-node invariant.

    Null keys are dropped on BOTH paths: a null-key node is an orphan by
    construction and a null edge endpoint whitelists nothing (keys are
    built non-null today; this pins the semantics either way)."""
    import ray

    exempt = nodes_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["node_type"],
                                    value_set=pa.array(sorted(exempt_types)))),
        batch_format="pyarrow")
    rest = nodes_ds.map_batches(
        lambda t: t.filter(pc.and_(
            pc.invert(pc.is_in(
                t["node_type"], value_set=pa.array(sorted(exempt_types)))),
            pc.is_valid(t["node_key"]))),
        batch_format="pyarrow")

    hashes = _endpoint_hashes(edges_ds).materialize()
    kb = hashes.size_bytes()
    if kb is not None and kb <= broadcast_byte_limit:
        import numpy as np

        chunks = []
        for t in ray.get(hashes.to_arrow_refs()):
            if isinstance(t, pa.RecordBatch):
                t = pa.Table.from_batches([t])
            if t.num_rows:
                chunks.append(t["h"].combine_chunks().to_numpy())
        uniq = (np.unique(np.concatenate(chunks)) if chunks
                else np.array([], np.uint64))
        ref = ray.put(pa.array(uniq, pa.uint64()))

        def keep_fn(t: pa.Table) -> pa.Table:
            vs = ray.get(ref)  # plasma shared-memory, zero-copy per worker
            h = pa.array(_key_hash(t["node_key"]), pa.uint64())
            return t.filter(pc.is_in(h, value_set=vs))

        kept = rest.map_batches(keep_fn, batch_format="pyarrow")
    else:
        hashed_schema = pa.schema(list(NODES_SCHEMA)
                                  + [pa.field("h", pa.uint64())])

        def tag_hash(t: pa.Table) -> pa.Table:
            return t.append_column(
                "h", pa.array(_key_hash(t["node_key"]), pa.uint64()))

        kept = membership_filter_hp(
            rest.map_batches(tag_hash, batch_format="pyarrow"), hashes,
            "h", keep=True, payload_schema=hashed_schema,
        ).map_batches(lambda t: t.drop_columns(["h"]),
                      batch_format="pyarrow")
    return exempt.union(kept)


def cascade_edges(nodes_ds, edges_ds):
    """Keep only edges whose BOTH endpoints exist in the nodes table."""
    from .partition import distinct_hp

    node_keys = distinct_hp(
        nodes_ds.map_batches(lambda t: pa.table(
            {"node_key": pc.cast(t["node_key"], pa.string())}),
            batch_format="pyarrow"), "node_key").materialize()
    src_keys = node_keys.map_batches(
        lambda t: pa.table({"src_key": t["node_key"]}), batch_format="pyarrow")
    dst_keys = node_keys.map_batches(
        lambda t: pa.table({"dst_key": t["node_key"]}), batch_format="pyarrow")
    out = membership_filter_hp(edges_ds, src_keys, "src_key", keep=True,
                               payload_schema=EDGES_SCHEMA)
    return membership_filter_hp(out, dst_keys, "dst_key", keep=True,
                                payload_schema=EDGES_SCHEMA)


def filter_childless_parents(nodes_ds, edges_ds, parent_type: str,
                             child_edge: str, cascade: bool = True):
    """Drop ``parent_type`` nodes lacking an outgoing ``child_edge``
    (cf. filter_out_nodes_without_children), then cascade-drop edges that
    referenced them. Returns (nodes_ds, edges_ds)."""
    from .partition import distinct_hp

    parents = nodes_ds.map_batches(
        lambda t: t.filter(pc.equal(t["node_type"], parent_type)),
        batch_format="pyarrow")
    others = nodes_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["node_type"], parent_type)),
        batch_format="pyarrow")
    with_child = distinct_hp(
        edges_ds.map_batches(
            lambda t: pa.table({"node_key": pc.cast(
                t.filter(pc.equal(t["edge_type"], child_edge))["src_key"],
                pa.string())}),
            batch_format="pyarrow"), "node_key")
    kept_parents = membership_filter_hp(parents, with_child, "node_key",
                                        keep=True, payload_schema=NODES_SCHEMA)
    nodes_out = others.union(kept_parents)
    if not cascade:
        return nodes_out, edges_ds
    nodes_out = nodes_out.materialize()
    return nodes_out, cascade_edges(nodes_out, edges_ds)


def _mark_prefer_typed(t: pa.Table, rank: dict) -> pa.Table:
    """Pure kernel shared by the distributed and local epilogue paths:
    per name, rank-order the rows and tag losers with the winner's key."""
    import numpy as np

    names = t["name"].to_numpy(zero_copy_only=False)
    types = t["node_type"].to_numpy(zero_copy_only=False)
    keys = t["node_key"].to_numpy(zero_copy_only=False)
    ranks = np.array([rank.get(x, len(rank)) for x in types])
    order = np.lexsort((keys, ranks, names))  # per name: best rank first
    names_s = names[order]
    first = np.zeros(len(names_s), dtype=bool)
    if len(names_s):
        first[0] = True
        first[1:] = names_s[1:] != names_s[:-1]
    winner_idx = np.flatnonzero(first)
    counts = np.diff(np.concatenate((winner_idx, [len(names_s)])))
    winner_key = np.repeat(keys[order][winner_idx], counts)
    replaced_by = np.where(first, None, winner_key)
    out = t.take(pa.array(order, pa.int64()))
    return out.append_column("_replaced_by",
                             pa.array(replaced_by, pa.string()))


def prefer_typed_dedup(nodes_ds, edges_ds,
                       priority: tuple = DEFAULT_TYPE_PRIORITY,
                       rename_limit: int = 1_000_000):
    """Same ``name`` under several node types -> keep the highest-priority
    node, re-point edges of the dropped keys (cf. deduplicate_nodes).
    Returns (nodes_ds, edges_ds)."""
    rank = {t: i for i, t in enumerate(priority)}

    def per_name(t: pa.Table) -> pa.Table:
        return _mark_prefer_typed(t, rank)

    marked = partitioned_apply(nodes_ds, "name", per_name).materialize()
    nodes_out = marked.map_batches(
        lambda t: t.filter(pc.is_null(t["_replaced_by"]))
                   .drop_columns(["_replaced_by"]),
        batch_format="pyarrow")
    renames = marked.map_batches(
        lambda t: (lambda f: pa.table({"old": f["node_key"],
                                       "new": f["_replaced_by"]}))(
            t.filter(pc.is_valid(t["_replaced_by"]))),
        batch_format="pyarrow")
    rows = renames.take(rename_limit + 1)
    if len(rows) > rename_limit:
        raise RuntimeError(
            f"cross-type rename map exceeds {rename_limit}; re-point edges "
            "via cogroup_join_hp instead of the broadcast map")
    if not rows:
        return nodes_out, edges_ds
    mapping = {r["old"]: r["new"] for r in rows}

    from ..stages.canonicalize import canonicalize_columns

    edges_out = canonicalize_columns(edges_ds, ["src_key", "dst_key"], mapping)
    return nodes_out, edges_out


def _epilogue_local(nodes: pa.Table, edges: pa.Table,
                    priority: tuple = DEFAULT_TYPE_PRIORITY,
                    exempt_types: tuple = ("Corpus",)):
    """Driver-side epilogue over in-memory tables — IDENTICAL semantics to
    the distributed path (parity-tested), one pass, zero shuffles."""
    import pandas as pd

    rank = {t: i for i, t in enumerate(priority)}
    marked = _mark_prefer_typed(nodes, rank)
    nodes = marked.filter(pc.is_null(marked["_replaced_by"])) \
        .drop_columns(["_replaced_by"])
    ren = marked.filter(pc.is_valid(marked["_replaced_by"]))
    if ren.num_rows:
        mapping = dict(zip(ren["node_key"].to_pylist(),
                           ren["_replaced_by"].to_pylist()))
        cols = {}
        for c in ("src_key", "dst_key"):
            s = pd.Series(edges[c].to_numpy(zero_copy_only=False))
            cols[c] = pa.array(s.map(mapping).fillna(s), pa.string())
        for i, c in enumerate(("src_key", "dst_key")):
            edges = edges.set_column(
                edges.schema.get_field_index(c), c, cols[c])
    # orphan prune (exempt root types), cf. prune_orphan_functions
    src = edges["src_key"].combine_chunks() if isinstance(
        edges["src_key"], pa.ChunkedArray) else edges["src_key"]
    dst = edges["dst_key"].combine_chunks() if isinstance(
        edges["dst_key"], pa.ChunkedArray) else edges["dst_key"]
    keys = pc.unique(pa.concat_arrays(
        [pc.cast(src, pa.string()), pc.cast(dst, pa.string())]))
    keep = pc.or_(
        pc.is_in(nodes["node_key"], value_set=keys),
        pc.is_in(nodes["node_type"], value_set=pa.array(sorted(exempt_types))))
    keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
    return nodes.filter(keep), edges


def apply_epilogue(nodes_ds, edges_ds, childless: tuple | None = None,
                   local_limit: int | None = 5_000_000,
                   local_byte_limit: int = 4 << 30):
    """The flagship's post-build cleanup: prefer-typed dedup -> optional
    childless-parent filter -> orphan prune -> edge cascade.

    Guarded local fast path (the pagerank precedent, ops/graph.py): under
    ``local_limit`` total rows the distributed path's four keyed shuffles
    cost far more task scheduling than compute (measured ~10 s of a 44 s
    sf0.1 build for <1 s of work); the same kernels run in one driver pass
    instead. 5 M is MEASURED, not conservative: at the x64 8.2 M-row build
    the local path cost 11.5 s of serial driver time (pd mapping + unique
    over 16 M keys) plus single-block writes vs ~10.5 s distributed —
    above ~5 M rows the driver pass loses even before it OOMs. The callers' inputs are checkpoint reads, so the count()s are
    parquet-metadata cheap. ``local_limit=None`` forces distributed.

    The guard is rows AND bytes: a row count alone would let a text-heavy
    corpus (nodes carry body/docs columns) pull unbounded bytes onto the
    driver — exactly what the distributed path exists to avoid — so above
    ``local_byte_limit`` (in-memory estimate from the datasets' metadata)
    the distributed path runs regardless of row count."""
    if childless is None and local_limit:
        import ray

        n = nodes_ds.count() + edges_ds.count()
        try:
            nbytes = ((nodes_ds.size_bytes() or 0)
                      + (edges_ds.size_bytes() or 0))
        except Exception:
            nbytes = None
        if nbytes is not None and nbytes > local_byte_limit:
            n = local_limit + 1  # force the distributed branch below
        if n <= local_limit:
            nt = pa.concat_tables(
                [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
                 else b for b in ray.get(nodes_ds.to_arrow_refs())])
            et = pa.concat_tables(
                [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch)
                 else b for b in ray.get(edges_ds.to_arrow_refs())])
            import ray.data as rd

            nodes_t, edges_t = _epilogue_local(nt, et)
            return rd.from_arrow(nodes_t), rd.from_arrow(edges_t)
    nodes_ds, edges_ds = prefer_typed_dedup(nodes_ds, edges_ds)
    if childless:
        parent_type, child_edge = childless
        nodes_ds, edges_ds = filter_childless_parents(
            nodes_ds, edges_ds, parent_type, child_edge)
    edges_ds = edges_ds.materialize()
    nodes_ds = prune_orphan_nodes(nodes_ds, edges_ds)
    return nodes_ds, edges_ds
