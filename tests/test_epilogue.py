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
