"""Graph epilogue passes: orphan prune, childless-parent filter,
prefer-typed dedup with edge re-pointing (btreemap_graph.rs:664-756)."""

import pyarrow as pa
import pytest

from stakgraph_ray.schema import EDGES_SCHEMA, NODES_SCHEMA


def _nodes(rows):
    cols = {f.name: [] for f in NODES_SCHEMA}
    for key, typ, name in rows:
        vals = {"node_key": key, "node_type": typ, "name": name, "file": name}
        for f in NODES_SCHEMA:
            cols[f.name].append(vals.get(f.name))
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in NODES_SCHEMA], schema=NODES_SCHEMA)


def _edges(rows):
    cols = {f.name: [] for f in EDGES_SCHEMA}
    for src, et, dst in rows:
        vals = {"src_key": src, "edge_type": et, "dst_key": dst,
                "ref_id": f"{src}|{et}|{dst}"}
        for f in EDGES_SCHEMA:
            cols[f.name].append(vals.get(f.name))
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in EDGES_SCHEMA], schema=EDGES_SCHEMA)


NODES = [
    ("corpus-c-c", "Corpus", "c"),
    ("page-p1-p1", "Page", "p1"),
    ("page-p2-p2", "Page", "p2"),          # childless (no MENTIONS)
    ("term-x-", "Term", "x"),
    ("term-orphan-", "Term", "orphan"),    # no edges at all
    ("person-x-", "Person", "x"),          # same name as term-x -> wins
]
EDGES = [
    ("page-p1-p1", "MENTIONS", "term-x-"),
    ("corpus-c-c", "CONTAINS", "page-p1-p1"),
    ("corpus-c-c", "CONTAINS", "page-p2-p2"),
    ("page-p1-p1", "WORKS_AT", "person-x-"),
]


def test_prune_orphan_nodes(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.epilogue import prune_orphan_nodes

    out = prune_orphan_nodes(rd.from_arrow(_nodes(NODES)),
                             rd.from_arrow(_edges(EDGES)))
    keys = {r["node_key"] for r in out.take_all()}
    assert "term-orphan-" not in keys
    assert {"corpus-c-c", "page-p1-p1", "page-p2-p2", "term-x-",
            "person-x-"} <= keys


def test_prune_broadcast_and_shuffle_paths_agree(ray_session):
    """The uint64-fingerprint broadcast path and the keyed-shuffle fallback
    (broadcast_byte_limit=0 forces it) must keep the same node set — the
    fallback is the 100-TB path when the key stream outgrows the broadcast
    guard. Includes a null node_key + null edge endpoint: both paths must
    DROP the null-key node (a null endpoint whitelists nothing)."""
    import ray.data as rd

    from stakgraph_ray.ops.epilogue import prune_orphan_nodes

    nodes_t = _nodes(NODES + [(None, "Term", "nullkey")])
    edges_t = _edges(EDGES + [("page-p1-p1", "MENTIONS", None)])
    nodes, edges = rd.from_arrow(nodes_t), rd.from_arrow(edges_t)
    bcast = {r["node_key"]
             for r in prune_orphan_nodes(nodes, edges).take_all()}
    shuffled = {r["node_key"]
                for r in prune_orphan_nodes(
                    nodes, edges, broadcast_byte_limit=0).take_all()}
    assert bcast == shuffled
    assert "term-orphan-" not in bcast
    assert None not in bcast


def test_filter_childless_parents_and_cascade(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.epilogue import filter_childless_parents

    nodes, edges = filter_childless_parents(
        rd.from_arrow(_nodes(NODES)), rd.from_arrow(_edges(EDGES)),
        "Page", "MENTIONS")
    keys = {r["node_key"] for r in nodes.take_all()}
    assert "page-p2-p2" not in keys and "page-p1-p1" in keys
    erows = {(r["src_key"], r["edge_type"], r["dst_key"])
             for r in edges.take_all()}
    assert ("corpus-c-c", "CONTAINS", "page-p2-p2") not in erows  # cascaded
    assert ("page-p1-p1", "MENTIONS", "term-x-") in erows


def test_prefer_typed_dedup_repoints_edges(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.epilogue import prefer_typed_dedup

    nodes, edges = prefer_typed_dedup(rd.from_arrow(_nodes(NODES)),
                                      rd.from_arrow(_edges(EDGES)))
    rows = nodes.take_all()
    by_name = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r["node_type"])
    assert by_name["x"] == ["Person"]  # Term dropped, Person kept
    erows = {(r["src_key"], r["edge_type"], r["dst_key"])
             for r in edges.take_all()}
    # the MENTIONS edge re-pointed from term-x- to person-x-
    assert ("page-p1-p1", "MENTIONS", "person-x-") in erows
    assert not any(dst == "term-x-" for _s, _e, dst in erows)


def test_apply_epilogue_local_matches_distributed(ray_session):
    """The guarded local fast path and the distributed shuffle path must
    produce identical graphs (same input: cross-type name dupes whose edges
    need re-pointing, orphans, exempt Corpus node)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stakgraph_ray.ops.epilogue import apply_epilogue
    from stakgraph_ray.schema import EDGES_SCHEMA, NODES_SCHEMA

    rng = np.random.RandomState(3)
    names = [f"n{i}" for i in range(40)]
    rows = []
    for i, nm in enumerate(names):
        types = ["Term"] if i % 3 else ["Term", "Person"]  # cross-type dupes
        for ty in types:
            rows.append({"node_key": f"{ty.lower()}-{nm}", "node_type": ty,
                         "name": nm, "file": "u", "body": "", "start": 0,
                         "end": 0, "docs": None, "hash": None,
                         "data_type": None, "meta": "{}"})
    rows.append({"node_key": "corpus-root", "node_type": "Corpus",
                 "name": "root", "file": "", "body": "", "start": 0,
                 "end": 0, "docs": None, "hash": None, "data_type": None,
                 "meta": "{}"})
    nodes = pa.Table.from_pylist(rows, schema=NODES_SCHEMA)
    er = []
    for j in range(60):
        a, b = rng.randint(0, len(rows) - 1), rng.randint(0, len(rows) - 1)
        er.append({"src_key": rows[a]["node_key"],
                   "edge_type": "MENTIONS", "dst_key": rows[b]["node_key"],
                   "ref_id": f"e{j}", "operand": None, "confidence": 1.0,
                   "strategy": "exact", "weight": 1})
    edges = pa.Table.from_pylist(er, schema=EDGES_SCHEMA)

    def norm(nds, eds):
        nt = nds.to_pandas().sort_values("node_key").reset_index(drop=True)
        et = eds.to_pandas().sort_values(
            ["src_key", "dst_key", "ref_id"]).reset_index(drop=True)
        return nt, et

    ln, le = norm(*apply_epilogue(rd.from_arrow(nodes), rd.from_arrow(edges)))
    dn, de = norm(*apply_epilogue(rd.from_arrow(nodes), rd.from_arrow(edges),
                                  local_limit=None))
    assert ln.equals(dn)
    assert le.equals(de)
    # the fast path really engaged the rename: some Term dupe lost to Person
    assert (ln.node_type == "Person").any()
    assert not set(le.src_key) & set("term-" + ln[ln.node_type == "Person"].name)
