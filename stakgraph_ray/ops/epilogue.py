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


def _endpoint_keys(edges_ds):
    """Distinct node keys referenced by any edge (src or dst)."""
    from .partition import distinct_hp

    def sides(t: pa.Table) -> pa.Table:
        src = t["src_key"].combine_chunks() if isinstance(t["src_key"], pa.ChunkedArray) else t["src_key"]
        dst = t["dst_key"].combine_chunks() if isinstance(t["dst_key"], pa.ChunkedArray) else t["dst_key"]
        return pa.table({"node_key": pa.concat_arrays(
            [pc.cast(src, pa.string()), pc.cast(dst, pa.string())])})

    return distinct_hp(edges_ds.map_batches(sides, batch_format="pyarrow"),
                       "node_key")


def prune_orphan_nodes(nodes_ds, edges_ds, exempt_types: tuple = ("Corpus",)):
    """Drop nodes with no incident edge (cf. prune_orphan_functions)."""
    keys = _endpoint_keys(edges_ds)
    exempt = nodes_ds.map_batches(
        lambda t: t.filter(pc.is_in(t["node_type"],
                                    value_set=pa.array(sorted(exempt_types)))),
        batch_format="pyarrow")
    rest = nodes_ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(
            t["node_type"], value_set=pa.array(sorted(exempt_types))))),
        batch_format="pyarrow")
    kept = membership_filter_hp(rest, keys, "node_key", keep=True,
                                payload_schema=NODES_SCHEMA)
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


def prefer_typed_dedup(nodes_ds, edges_ds,
                       priority: tuple = DEFAULT_TYPE_PRIORITY,
                       rename_limit: int = 1_000_000):
    """Same ``name`` under several node types -> keep the highest-priority
    node, re-point edges of the dropped keys (cf. deduplicate_nodes).
    Returns (nodes_ds, edges_ds)."""
    rank = {t: i for i, t in enumerate(priority)}

    def per_name(t: pa.Table) -> pa.Table:
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


def apply_epilogue(nodes_ds, edges_ds, childless: tuple | None = None):
    """The flagship's post-build cleanup: prefer-typed dedup -> optional
    childless-parent filter -> orphan prune -> edge cascade."""
    nodes_ds, edges_ds = prefer_typed_dedup(nodes_ds, edges_ds)
    if childless:
        parent_type, child_edge = childless
        nodes_ds, edges_ds = filter_childless_parents(
            nodes_ds, edges_ds, parent_type, child_edge)
    edges_ds = edges_ds.materialize()
    nodes_ds = prune_orphan_nodes(nodes_ds, edges_ds)
    return nodes_ds, edges_ds
