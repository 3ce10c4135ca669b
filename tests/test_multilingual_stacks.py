"""Per-language stack gates: de/fr/es/it/pt/nl/sv/pl/ro P/R on the
annotated multilingual corpus, worker-side registration of user stacks, and
the typed graph product (year attribute + entity types)."""

import pyarrow as pa
import pytest

from stakgraph_ray.pipelines.rich import (build_rich_triples,
                                          entity_types_table,
                                          precision_recall,
                                          typed_graph_tables)
from stakgraph_ray.sources.synth_ml import generate_multilingual_pages


def test_ml_generator_deterministic():
    p1, g1 = generate_multilingual_pages(60)
    p2, g2 = generate_multilingual_pages(60)
    assert p1.equals(p2)
    assert g1["triples"] == g2["triples"] and g1["years"] == g2["years"]
    assert set(p1["lang"].to_pylist()) == {
        "de", "fr", "es", "it", "pt", "nl", "sv", "pl", "ro",
        "da", "fi", "cs", "hu", "tr", "el"}


def test_ml_precision_recall_and_years(ray_session):
    import ray.data as rd

    pages, golden = generate_multilingual_pages(200)
    triples_ds, _roots = build_rich_triples(rd.from_arrow(pages))
    rows = triples_ds.take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    p, r = precision_recall(got, golden["triples"])
    assert p >= 0.95, f"precision {p}: extra={sorted(got - golden['triples'])[:10]}"
    assert r >= 0.95, f"recall {r}: missing={sorted(golden['triples'] - got)[:10]}"
    # the year relation attribute is kept and aggregated (min)
    got_years = {(r["subj"], r["pred"], r["obj"]): r["year"] for r in rows}
    for k, y in golden["years"].items():
        assert got_years.get(k) == y, f"year mismatch for {k}: {got_years.get(k)} != {y}"


def test_user_stack_ships_to_ray_workers(ray_session):
    """A driver-registered stack must reach worker processes (the factory
    snapshot travels with the routed batch fn, not via module globals)."""
    import ray.data as rd

    from stakgraph_ray.stages import registry

    class KlingonStack:
        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "url": t["url"],
                "subj": pa.array(["Qapla"] * n),
                "pred": pa.array(["SAYS"] * n),
                "obj": pa.array(["Heghlu"] * n),
                "confidence": pa.array([1.0] * n, pa.float32()),
                "strategy": pa.array(["custom"] * n),
            })

    saved = registry.factories_snapshot()
    try:
        registry.register_stack("tlh", KlingonStack)
        from stakgraph_ray.sources.synth import generate_rich_pages

        pages, _ = generate_rich_pages(30)
        pages = pages.set_column(
            pages.column_names.index("lang"), "lang",
            pa.array(["tlh"] * pages.num_rows, pa.string()))
        triples, _ = build_rich_triples(rd.from_arrow(pages))
        preds = {r["pred"] for r in triples.take_all()}
        assert preds == {"SAYS"}
    finally:
        registry._FACTORIES.clear()
        registry._FACTORIES.update(saved)


def test_typed_graph_tables(ray_session):
    import ray.data as rd

    pages, golden = generate_multilingual_pages(120)
    agg, _roots = build_rich_triples(rd.from_arrow(pages))
    agg = agg.materialize()
    types = entity_types_table(agg)
    for name, typ in golden["types"].items():
        assert types.get(name) == typ, f"{name}: {types.get(name)} != {typ}"

    nodes, edges = typed_graph_tables(agg, types)
    node_rows = nodes.take_all()
    assert {r["node_type"] for r in node_rows} <= {"Person", "Org", "Place", "Topic"}
    by_name = {r["name"]: r for r in node_rows}
    for name, typ in golden["types"].items():
        assert by_name[name]["node_type"] == typ
        assert by_name[name]["node_key"].startswith(typ.lower() + "-")

    edge_rows = edges.take_all()
    assert edge_rows and {r["edge_type"] for r in edge_rows} <= set(
        ("FOUNDED", "ACQUIRED", "WORKS_AT", "LOCATED_IN"))
    # year attribute surfaces in operand for dated relations
    founded = [r for r in edge_rows if r["edge_type"] == "FOUNDED"]
    assert founded and all(r["operand"] and r["operand"].isdigit() for r in founded)
    undated = [r for r in edge_rows if r["edge_type"] == "WORKS_AT"]
    assert undated and all(r["operand"] is None for r in undated)
