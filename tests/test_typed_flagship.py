"""The flagship materialized build merges the typed entity graph
(Person/Org/Place nodes, FOUNDED/... edges with year in operand) into the
one nodes/edges product — cf. ast/src/builder/core.rs:48-235."""

import shutil

import pytest


def test_flagship_merges_typed_graph(ray_session, tmp_path):
    import ray.data as rd

    from stakgraph_ray.sources.synth_ml import generate_multilingual_pages
    from stakgraph_ray.stages.materialize import build_graph_materialized

    pages, golden = generate_multilingual_pages(80)
    workdir = str(tmp_path / "mlgraph")
    out = build_graph_materialized(rd.from_arrow(pages), workdir)

    node_types = set(out["nodes"].unique("node_type"))
    assert {"Person", "Org", "Place", "Page", "Host"} <= node_types
    edge_types = set(out["edges"].unique("edge_type"))
    assert {"FOUNDED", "WORKS_AT", "MENTIONS", "CONTAINS"} <= edge_types

    rows = out["edges"].take_all()
    founded = [r for r in rows if r["edge_type"] == "FOUNDED"]
    assert founded and all(r["operand"] and r["operand"].isdigit()
                           for r in founded)
    # typed node names survive with their golden types
    node_rows = [r for r in out["nodes"].take_all()
                 if r["node_type"] in ("Person", "Org", "Place")]
    by_name = {r["name"]: r["node_type"] for r in node_rows}
    for name, typ in golden["types"].items():
        assert by_name.get(name) == typ
