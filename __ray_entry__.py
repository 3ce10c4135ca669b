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
    # time budget (r02 stopped at entry 50 of 83).  Families with the fewest
    # prior driver-verified rounds go first (TYPED/PROBE/LLM/DEDUP had none in
    # r02); KG and REL have two green rounds behind them and go last.
    cat: dict[str, tuple] = {}
    cat.update(TYPED_QUERIES)
    cat.update(PROBE_QUERIES)
    cat.update(LLM_QUERIES)
    cat.update(DEDUP_QUERIES)
    cat.update(KG_QUERIES)
    cat.update(REL_QUERIES)
    return cat


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
