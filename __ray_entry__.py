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


def _latest_checked_round() -> tuple[dict[str, int], dict[int, str]]:
    """Scan the driver's CORRECTNESS_r*.json records: per query name, the
    newest round that produced ANY row (PASS / no_oracle / FAIL all count as
    'checked against current code of that round'). Also returns the record
    filename per round (the per-entry staleness baselines for _git_ts)."""
    import json
    import os
    import re

    rounds: dict[str, int] = {}
    files: dict[int, str] = {}
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
        files[n] = f
        for name in data:
            rounds[name] = max(rounds.get(name, 0), n)
    return rounds, files


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


_DIFF_CACHE: dict[tuple[str, str], str | None] = {}


def _module_diff(rel_path: str, rec_file: str | None) -> str | None:
    """git diff of a module between the commit that recorded a CORRECTNESS
    file and the working tree (uncommitted edits included). None when git
    can't answer (no repo, unknown record) — callers fall back to
    module-timestamp staleness."""
    import subprocess

    if not rec_file:
        return None
    ck = (rel_path, rec_file)
    if ck in _DIFF_CACHE:
        return _DIFF_CACHE[ck]
    out = None
    try:
        h = subprocess.run(
            ["git", "-C", _REPO, "log", "-1", "--format=%H", "--", rec_file],
            capture_output=True, text=True, timeout=10).stdout.strip()
        if h:
            d = subprocess.run(
                ["git", "-C", _REPO, "diff", h, "--", rel_path],
                capture_output=True, text=True, timeout=10)
            if d.returncode == 0:
                out = d.stdout
    except (OSError, subprocess.SubprocessError):
        out = None
    _DIFF_CACHE[ck] = out
    return out


def _diff_ranges(rel_path: str, rec_file: str | None):
    """New-file (line_start, line_end) ranges of the module's diff since the
    record commit, from the @@ hunk headers; None = no diff evidence."""
    import re

    text = _module_diff(rel_path, rec_file)
    if text is None:
        return None
    return [(int(m.group(1)), int(m.group(1)) + int(m.group(2) or 1))
            for m in re.finditer(r"^@@ [^+]*\+(\d+)(?:,(\d+))? @@",
                                 text, re.M)]


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
    # could silently strand a changed query). Per entry with latest checked
    # round r:
    #   tier 0  never driver-checked (new this round)
    #   tier 1  its defining module was committed AFTER the CORRECTNESS
    #           record of ITS OWN round r (its green row predates the code
    #           it would run today) — compared against the entry's own
    #           record, not the newest one, so a query edited in round N
    #           but last checked in round N-1 is still caught
    #   tier 2  green row postdates the code — fresh
    # sorted by (tier, r), stable on the original dict order: the stalest
    # rows always lead and fresh green rows go last.
    # Staleness is FUNCTION-granular where git can tell: a changed module
    # pulls forward only the entries whose own def overlaps the diff since
    # their record commit — otherwise editing one query in a 40-query
    # module would flood tier 1 with 39 unchanged module-mates and push
    # the genuinely-edited one past the driver's budget. Falls back to
    # module-timestamp staleness when the diff is unavailable.
    rounds, rec_files = _latest_checked_round()
    rec_ts = {n: _git_ts(f) for n, f in rec_files.items()}
    mod_ts: dict[str, int] = {}

    def module_ts(fn) -> int:
        mod = getattr(fn, "__module__", "") or ""
        if mod not in mod_ts:
            mod_ts[mod] = _git_ts(mod.replace(".", "/") + ".py")
        return mod_ts[mod]

    def fn_stale(name: str, r: int) -> bool:
        fn = every[name][0]
        if module_ts(fn) <= rec_ts.get(r, 0):
            return False
        rel = (getattr(fn, "__module__", "") or "").replace(".", "/") + ".py"
        ranges = _diff_ranges(rel, rec_files.get(r))
        if ranges is None:        # no diff evidence -> module-level verdict
            return True
        # SQL-constant / registration edits don't touch the def: a changed
        # diff line naming the entry (its *_QUERIES wiring) also marks it
        if f'"{name}"' in (_module_diff(rel, rec_files.get(r)) or ""):
            return True
        import inspect

        try:
            lines, start = inspect.getsourcelines(fn)
        except (OSError, TypeError):
            return True
        end = start + len(lines)
        return any(a < end and start < b for a, b in ranges)

    def key(name: str) -> tuple[int, int]:
        r = rounds.get(name, 0)
        if r == 0:
            return (0, 0)
        return (1, r) if fn_stale(name, r) else (2, r)

    order = sorted(every, key=key)
    return {name: every[name] for name in order}


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
