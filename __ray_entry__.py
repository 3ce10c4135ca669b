"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in stakgraph_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: build the full KG over the sf0.001 pages corpus and
    return the edges table (a lazy ray.data.Dataset)."""
    from stakgraph_ray.pipelines.kg import build_graph
    from stakgraph_ray.sources.pages import read_pages

    g = build_graph(read_pages("/root/testdata/sf0.001"))
    return g["edges"]


def _catalog() -> dict[str, tuple]:
    from stakgraph_ray.pipelines.queries_dedup import DEDUP_QUERIES
    from stakgraph_ray.pipelines.queries_kg import KG_QUERIES
    from stakgraph_ray.pipelines.queries_rel import REL_QUERIES
    from stakgraph_ray.pipelines.queries_llm import LLM_QUERIES
    from stakgraph_ray.pipelines.queries_probes import PROBE_QUERIES
    from stakgraph_ray.pipelines.queries_typed import TYPED_QUERIES

    # Insertion order matters: the driver walks this catalog in order under a
    # time budget (r02 stopped at entry 50 of 83). Tiers:
    #   1. families with no prior driver-verified round (TYPED/PROBE/LLM/
    #      DEDUP had none in r02), which also hold most round-3 additions;
    #   2. KG/REL queries that are NEW or whose oracle/pipeline CHANGED in
    #      round 3 (dtype-parity casts, task-pool joins, the r02 pivot fix —
    #      the round's one FAIL must land inside the budget);
    #   3. the rest of KG/REL (two green rounds behind them).
    changed = [
        "kg_shortest_path", "kg_adamic_adar", "kg_term_importance",
        "rel_event_weekday_pivot", "rel_pricing_cube", "rel_priority_mode",
        "rel_qty_price_corr", "rel_nation_balance_disc",
        "rel_intersect_custkeys", "rel_shipping_priority",
        "rel_nation_balance_mad", "rel_nation_customer_list",
        "rel_status_distinct_customers", "txt_sentence_split",
        "rel_hourly_event_stats", "rel_hopping_event_stats",
        "rel_nation_balance_stats", "rel_funnel_conversion",
        "rel_top_customers", "rel_orders_lineitem_join", "rel_running_value",
        "rel_promo_events", "kg_mention_edges", "kg_mention_edges_sharded",
        "kg_term_components", "sim_knn_bruteforce",
    ]
    rest: dict[str, tuple] = {}
    rest.update(KG_QUERIES)
    rest.update(REL_QUERIES)
    cat: dict[str, tuple] = {}
    cat.update(TYPED_QUERIES)
    cat.update(PROBE_QUERIES)
    cat.update(LLM_QUERIES)
    cat.update(DEDUP_QUERIES)
    for name in changed:
        if name in rest and name not in cat:
            cat[name] = rest[name]
    cat.update({k: v for k, v in rest.items() if k not in cat})
    return cat


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
