"""Typed entity-graph queries over the annotated multilingual corpus, with
by-construction DuckDB oracles.

The corpus (sources/synth_ml.py) is seeded and deterministic, and the
golden triples / entity types / relation years are derived from the
sentence templates independently of the pipeline — so the oracle is an
inline VALUES relation built from the golden set (the driver registers the
testdata parquet views, which these generated-corpus queries don't need).
P/R = 1.0 by the pytest gate (tests/test_multilingual_stacks.py) makes the
golden an exact oracle, not just a bound.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..sources.synth_ml import generate_multilingual_pages

_N_PAGES = 200


def _agg_triples():
    import ray.data as rd

    from .rich import build_rich_triples

    pages, _golden = generate_multilingual_pages(_N_PAGES)
    agg, _roots = build_rich_triples(rd.from_arrow(pages))
    return agg


def q_typed_nodes(sf_dir: str):
    """Typed entity nodes: node_key, node_type, name (Person/Org/Place;
    dictionary type wins over slot-archetype for stubs)."""
    from .rich import entity_types_table, typed_graph_tables

    agg = _agg_triples().materialize()
    types = entity_types_table(agg)
    nodes, _edges = typed_graph_tables(agg, types)
    return nodes.map_batches(
        lambda t: t.select(["node_key", "node_type", "name"]),
        batch_format="pyarrow")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sql_typed_nodes() -> str:
    from ..schema import node_key

    _pages, golden = generate_multilingual_pages(_N_PAGES)
    rows = ", ".join(
        f"({_sql_quote(node_key(t, n, ''))}, {_sql_quote(t)}, {_sql_quote(n)})"
        for n, t in sorted(golden["types"].items()))
    return (f"select * from (values {rows}) "
            "as t(node_key, node_type, name)")


def q_typed_edges(sf_dir: str):
    """Distinct typed relation triples with the year attribute:
    subj, pred, obj, year (0 when the relation template carries no year)."""
    agg = _agg_triples()
    return agg.map_batches(
        lambda t: pa.table({
            "subj": pc.cast(t["subj"], pa.string()),
            "pred": pc.cast(t["pred"], pa.string()),
            "obj": pc.cast(t["obj"], pa.string()),
            "year": pc.fill_null(pc.cast(t["year"], pa.int64()), 0),
        }), batch_format="pyarrow")


def sql_typed_edges() -> str:
    _pages, golden = generate_multilingual_pages(_N_PAGES)
    rows = ", ".join(
        f"({_sql_quote(s)}, {_sql_quote(p)}, {_sql_quote(o)}, "
        f"{golden['years'].get((s, p, o)) or 0})"
        for s, p, o in sorted(golden["triples"]))
    return (f"select subj, pred, obj, cast(year as bigint) as year "
            f"from (values {rows}) as t(subj, pred, obj, year)")


TYPED_QUERIES: dict[str, tuple] = {
    "kg_typed_nodes": (q_typed_nodes, sql_typed_nodes()),
    "kg_typed_edges": (q_typed_edges, sql_typed_edges()),
}
