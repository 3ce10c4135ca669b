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


_REPO = __import__("os").path.dirname(__import__("os").path.abspath(__file__))


def _latest_checked_round() -> tuple[dict[str, int], str | None]:
    """Scan the driver's CORRECTNESS_r*.json records: per query name, the
    newest round that produced ANY row (PASS / no_oracle / FAIL all count as
    'checked against current code of that round'). Also returns the path of
    the newest record file (the staleness baseline for _git_ts)."""
    import json
    import os
    import re

    rounds: dict[str, int] = {}
    newest: tuple[int, str | None] = (0, None)
    for f in os.listdir(_REPO):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if not m:
            continue
        n = int(m.group(1))
        try:
            with open(os.path.join(_REPO, f)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if n > newest[0]:
            newest = (n, f)
        for name in data:
            rounds[name] = max(rounds.get(name, 0), n)
    return rounds, newest[1]


def _git_ts(rel_path: str) -> int:
    """Last-commit unix time of a repo file (mtime fallback when git is
    unavailable in the driver's environment)."""
    import os
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", _REPO, "log", "-1", "--format=%ct", "--", rel_path],
            capture_output=True, text=True, timeout=10)
        ts = out.stdout.strip()
        if ts:
            return int(ts)
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    try:
        return int(os.path.getmtime(os.path.join(_REPO, rel_path)))
    except OSError:
        return 0


def _catalog() -> dict[str, tuple]:
    from stakgraph_ray.pipelines.queries_dedup import DEDUP_QUERIES
    from stakgraph_ray.pipelines.queries_kg import KG_QUERIES
    from stakgraph_ray.pipelines.queries_rel import REL_QUERIES
    from stakgraph_ray.pipelines.queries_llm import LLM_QUERIES
    from stakgraph_ray.pipelines.queries_probes import PROBE_QUERIES
    from stakgraph_ray.pipelines.queries_typed import TYPED_QUERIES

    every: dict[str, tuple] = {}
    every.update(TYPED_QUERIES)
    every.update(PROBE_QUERIES)
    every.update(LLM_QUERIES)
    every.update(DEDUP_QUERIES)
    every.update(KG_QUERIES)
    every.update(REL_QUERIES)

    # Insertion order matters: the driver walks this catalog in order under
    # a time budget (~50 entries/round). The priority order is DERIVED, not
    # hand-listed (rounds 2-4 hand-maintained tiers; a forgotten retier
    # could silently strand a changed query):
    #   effective_round(name) =
    #     0                 if never driver-checked (new this round)
    #     min checked round if its defining module was committed AFTER the
    #                       newest CORRECTNESS record (changed this round —
    #                       its green row predates the current code)
    #     latest checked round otherwise
    #   sorted ascending, stable on the original dict order — so the
    #   stalest rows always lead and fresh green rows go last.
    rounds, newest_file = _latest_checked_round()
    base_ts = _git_ts(newest_file) if newest_file else 0
    stalest = min((r for r in rounds.values()), default=0)
    mod_changed: dict[str, bool] = {}

    def changed(fn) -> bool:
        mod = getattr(fn, "__module__", "") or ""
        if mod not in mod_changed:
            rel = mod.replace(".", "/") + ".py"
            mod_changed[mod] = base_ts > 0 and _git_ts(rel) > base_ts
        return mod_changed[mod]

    def eff_round(name: str, fn) -> int:
        r = rounds.get(name, 0)
        if r and changed(fn):
            return min(r, stalest)
        return r

    order = sorted(every, key=lambda n: eff_round(n, every[n][0]))
    return {name: every[name] for name in order}


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
