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


_TS_CACHE: dict[str, int] = {}
_DIRTY_FILES: set[str] | None = None


def _dirty_files() -> set[str]:
    """Repo-relative paths with uncommitted working-tree changes (one git
    status for the whole repo, cached). An edited-but-uncommitted query
    module must count as stale even though its last COMMIT predates the
    CORRECTNESS record."""
    import subprocess

    global _DIRTY_FILES
    if _DIRTY_FILES is None:
        try:
            out = subprocess.run(
                ["git", "-C", _REPO, "status", "--porcelain"],
                capture_output=True, text=True, timeout=10).stdout
            _DIRTY_FILES = {ln[3:].split(" -> ")[-1].strip()
                            for ln in out.splitlines() if len(ln) > 3}
        except (OSError, subprocess.SubprocessError):
            _DIRTY_FILES = set()
    return _DIRTY_FILES


def _git_ts(rel_path: str) -> int:
    """Last-change unix time of a repo file: last-commit time, bumped to
    file mtime when the working tree has uncommitted edits to it (mtime
    fallback when git is unavailable in the driver's environment)."""
    import os
    import subprocess

    if rel_path in _TS_CACHE:
        return _TS_CACHE[rel_path]
    ts = 0
    try:
        out = subprocess.run(
            ["git", "-C", _REPO, "log", "-1", "--format=%ct", "--", rel_path],
            capture_output=True, text=True, timeout=10)
        s = out.stdout.strip()
        if s:
            ts = int(s)
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    if ts == 0 or rel_path in _dirty_files():
        try:
            ts = max(ts, int(os.path.getmtime(os.path.join(_REPO, rel_path))))
        except OSError:
            pass
    _TS_CACHE[rel_path] = ts
    return ts


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


_DEP_CLOSURE_CACHE: dict[str, frozenset[str]] = {}


def _mod_file(dotted: str) -> str | None:
    import os

    p = dotted.replace(".", "/")
    for cand in (p + ".py", p + "/__init__.py"):
        if os.path.exists(os.path.join(_REPO, cand)):
            return cand
    return None


def _direct_deps(rel: str) -> set[str]:
    """Repo-relative .py files the module imports from stakgraph_ray
    (absolute and relative forms, module-level and function-local)."""
    import ast
    import os

    try:
        with open(os.path.join(_REPO, rel)) as fh:
            tree = ast.parse(fh.read())
    except (OSError, SyntaxError, ValueError):
        return set()
    pkg_parts = rel[:-3].split("/")          # strip .py
    if pkg_parts[-1] == "__init__":
        pkg_parts = pkg_parts[:-1]
    else:
        pkg_parts = pkg_parts[:-1]           # module's parent package
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            names.update(a.name for a in node.names
                         if a.name.startswith("stakgraph_ray"))
        elif isinstance(node, ast.ImportFrom):
            if node.level:
                base = pkg_parts[:len(pkg_parts) - (node.level - 1)]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if mod.startswith("stakgraph_ray"):
                names.add(mod)
                # ``from pkg import mod`` — the imported name may itself
                # be a module
                names.update(f"{mod}.{a.name}" for a in node.names)
    return {f for f in (_mod_file(n) for n in names) if f}


def _dep_closure(dotted_mod: str) -> frozenset[str]:
    """Transitive stakgraph_ray file closure of a module, excluding the
    module's own file (whose staleness is judged function-granularly)."""
    start = _mod_file(dotted_mod)
    if start is None:
        return frozenset()
    if start in _DEP_CLOSURE_CACHE:
        return _DEP_CLOSURE_CACHE[start]
    seen: set[str] = {start}
    frontier = [start]
    while frontier:
        for dep in _direct_deps(frontier.pop()):
            if dep not in seen:
                seen.add(dep)
                frontier.append(dep)
    out = frozenset(seen - {start})
    _DEP_CLOSURE_CACHE[start] = out
    return out


def _dep_ts(dotted_mod: str) -> int:
    """Newest last-change time across the module's transitive stakgraph_ray
    dependencies. A query whose shared helpers (ops/, stages/, sources/,
    pipelines/kg.py, ...) changed after its green CORRECTNESS row must
    re-lead the catalog even though its defining queries_* module did not
    change — round-5 review finding: epilogue.py / kg.py edits postdating
    CORRECTNESS_r04 left every kg_* query classified 'fresh'."""
    return max((_git_ts(f) for f in _dep_closure(dotted_mod)), default=0)


_CATALOG_CACHE: dict[str, tuple] | None = None


def _catalog() -> dict[str, tuple]:
    global _CATALOG_CACHE
    if _CATALOG_CACHE is not None:
        return dict(_CATALOG_CACHE)
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
    #   tier 1  its defining module OR any module in its transitive
    #           stakgraph_ray import closure was changed AFTER the
    #           CORRECTNESS record of ITS OWN round r (its green row
    #           predates the code it would run today) — compared against
    #           the entry's own record, not the newest one, so a query
    #           edited in round N but last checked in round N-1 is still
    #           caught; uncommitted working-tree edits count (mtime bump)
    #   tier 2  green row postdates the code — fresh
    # sorted by (tier, r), stable on the original dict order: the stalest
    # rows always lead and fresh green rows go last.
    # Staleness is FUNCTION-granular where git can tell: a changed module
    # pulls forward only the entries whose own def overlaps the diff since
    # their record commit — otherwise editing one query in a 40-query
    # module would flood tier 1 with 39 unchanged module-mates and push
    # the genuinely-edited one past the driver's budget. A hunk landing
    # OUTSIDE every entry's def is a shared region of the module (a local
    # helper like _read/_round_cols, an SQL-oracle constant, the
    # registration dict) whose change can alter any module-mate's output,
    # so it marks the WHOLE module stale — function granularity only
    # applies to edits the def map can actually attribute. Falls back to
    # module-timestamp staleness when the diff is unavailable.
    rounds, rec_files = _latest_checked_round()
    rec_ts = {n: _git_ts(f) for n, f in rec_files.items()}
    mod_ts: dict[str, int] = {}
    mod_defs: dict[str, list[tuple[int, int]]] = {}

    def module_ts(fn) -> int:
        mod = getattr(fn, "__module__", "") or ""
        if mod not in mod_ts:
            mod_ts[mod] = _git_ts(mod.replace(".", "/") + ".py")
        return mod_ts[mod]

    def fn_span(fn) -> tuple[int, int] | None:
        import inspect

        try:
            lines, start = inspect.getsourcelines(fn)
        except (OSError, TypeError):
            return None
        return start, start + len(lines)

    def module_def_spans(mod: str) -> list[tuple[int, int]]:
        # def ranges of ALL catalog entries defined in this module
        if mod not in mod_defs:
            mod_defs[mod] = [
                s for f, _sql in every.values()
                if (getattr(f, "__module__", "") or "") == mod
                and (s := fn_span(f)) is not None]
        return mod_defs[mod]

    def fn_stale(name: str, r: int) -> bool:
        fn = every[name][0]
        mod = getattr(fn, "__module__", "") or ""
        rec = rec_ts.get(r, 0)
        # a shared helper in the module's transitive import closure changed
        # after the green row -> stale regardless of the defining module
        if _dep_ts(mod) > rec:
            return True
        if module_ts(fn) <= rec:
            return False
        rel = mod.replace(".", "/") + ".py"
        ranges = _diff_ranges(rel, rec_files.get(r))
        if ranges is None:        # no diff evidence -> module-level verdict
            return True
        # SQL-constant / registration edits don't touch the def: a changed
        # diff line naming the entry (its *_QUERIES wiring) also marks it
        if f'"{name}"' in (_module_diff(rel, rec_files.get(r)) or ""):
            return True
        span = fn_span(fn)
        if span is None:
            return True
        start, end = span
        if any(a < end and start < b for a, b in ranges):
            return True
        # a hunk attributable to NO entry's def = shared-region change
        spans = module_def_spans(mod)
        return any(not any(a < e and s < b for s, e in spans)
                   for a, b in ranges)

    def key(name: str) -> tuple[int, int]:
        r = rounds.get(name, 0)
        if r == 0:
            return (0, 0)
        return (1, r) if fn_stale(name, r) else (2, r)

    order = sorted(every, key=key)
    _CATALOG_CACHE = {name: every[name] for name in order}
    return dict(_CATALOG_CACHE)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    return {name: fn for name, (fn, _sql) in _catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted for
    non-SQL-expressible ops — driver records a rows-only check)."""
    return {name: sql for name, (_fn, sql) in _catalog().items() if sql}
