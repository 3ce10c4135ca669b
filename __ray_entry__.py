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
    # time budget (r03 stopped at entry 50 of 102). Round-4 tiers — every
    # entry whose CURRENT code has no driver row goes first:
    #   1. never driver-checked (past r03's budget, or new this round);
    #   2. changed in round 3 AFTER their last green row (r02), so their
    #      green rows predate the dtype-cast / task-pool rewrites;
    #   3. changed THIS round (join fusions, finisher batch_size, ANN
    #      sampling, canonicalize guard consumers);
    #   4. r02-green KG/REL entries not re-proved since;
    #   5. the r03-green remainder (freshest rows).
    priority = [
        # tier 1 — never checked (incl. round-4 additions)
        "rel_except_custkeys", "rel_semi_join_bloom",
        "rel_status_distinct_customers", "txt_sentence_split",
        "mm_media_feature_stats", "rel_local_supplier_volume",
        "rel_order_quartiles", "llm_token_entropy",
        "rel_status_priority_sets",
        # tier 2 — r03-changed, green row predates the change
        "rel_hourly_event_stats", "rel_hopping_event_stats",
        "rel_nation_balance_stats", "rel_funnel_conversion",
        "rel_top_customers", "rel_running_value",
        "rel_promo_events", "kg_mention_edges", "kg_mention_edges_sharded",
        "kg_term_components", "sim_knn_bruteforce",
        # tier 3 — changed this round (incl. the TermLinker task-fn and
        # single-shuffle orphan-prune rewrites late in round 4)
        "rel_orders_lineitem_join", "rel_shipping_priority",
        "rel_priority_mode", "kg_rich_triples", "kg_epilogue_pages",
        "kg_term_nodes", "kg_term_frequencies", "dedup_simhash",
        "sim_knn_ivf", "sim_knn_pq", "mm_media_features",
        "kg_term_link_prediction", "kg_adamic_adar",
        "kg_probe_endpoint_links", "rel_endpoint_requests", "sim_knn_lsh",
        "sim_node_embedding_ann",
    ]
    every: dict[str, tuple] = {}
    every.update(TYPED_QUERIES)
    every.update(PROBE_QUERIES)
    every.update(LLM_QUERIES)
    every.update(DEDUP_QUERIES)
    every.update(KG_QUERIES)
    every.update(REL_QUERIES)
    # tier 4 — r02-green, never re-proved in r03 (everything KG/REL that is
    # neither in `priority` nor in the r03-checked set below)
    r03_checked = {
        "kg_typed_nodes", "kg_typed_edges", "kg_test_ids", "kg_http_probes",
        "kg_page_kinds", "kg_link_sections", "kg_maximal_mentions",
        "kg_probe_endpoint_links", "kg_shortest_path", "kg_adamic_adar",
        "kg_term_importance", "rel_event_weekday_pivot", "rel_pricing_cube",
        "rel_qty_price_corr", "rel_nation_balance_disc",
        "rel_intersect_custkeys", "rel_nation_balance_mad",
        "rel_nation_customer_list",
    }
    cat: dict[str, tuple] = {}
    for name in priority:
        if name in every:
            cat[name] = every[name]
    for name, v in every.items():
        if name not in cat and name not in r03_checked \
                and (name in KG_QUERIES or name in REL_QUERIES):
            cat[name] = v
    cat.update({k: v for k, v in every.items() if k not in cat})
    return cat


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
