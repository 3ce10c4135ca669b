"""The driver walks __ray_entry__.queries() in order under a ~50-entry
budget, so the DERIVED priority order is correctness-critical: a bug that
strands a stale entry past the budget means its green row silently
predates the code it would run today. These tests pin the derivation
contract without Ray or real CORRECTNESS files."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __ray_entry__ as ent


def test_catalog_complete_and_unique():
    q = ent.queries()
    o = ent.oracle_sql()
    assert len(q) >= 107
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "select" in s.lower()
               for s in o.values())


def test_priority_tiers(monkeypatch):
    """never-checked < stale-since-own-record < fresh, each tier sorted by
    the entry's own latest round."""
    monkeypatch.setattr(ent, "_CATALOG_CACHE", None)
    monkeypatch.setattr(ent, "_dep_ts", lambda mod: 0)
    fns_all = ent.queries()
    names = list(fns_all)
    a, b = names[:2]
    b_mod = getattr(fns_all[b], "__module__", "")
    # c must live in a DIFFERENT module than b (the diff stub below keys
    # on module path)
    c = next(n for n in names[2:]
             if getattr(fns_all[n], "__module__", "") != b_mod)
    d = next(n for n in names[2:]
             if n != c and getattr(fns_all[n], "__module__", "") != b_mod)
    # a: never checked; b: checked r2, module newer than its record
    # (stale); c: checked r2, record newer than module (fresh); d:
    # checked r4, fresh — expected order a < b < c < d
    monkeypatch.setattr(ent, "_latest_checked_round",
                        lambda: ({b: 2, c: 2, d: 4},
                                 {2: "CORRECTNESS_r02.json",
                                  4: "CORRECTNESS_r04.json"}))
    rec_ts = {"CORRECTNESS_r02.json": 10, "CORRECTNESS_r04.json": 10 ** 9}
    monkeypatch.setattr(ent, "_git_ts", lambda rel: rec_ts.get(rel, 100))
    # diff evidence: for b the whole module counts changed (fall back to
    # the module-timestamp verdict); for c the diff shows no hunks
    ent._CATALOG_CACHE = None
    fns = ent.queries()
    c_mod = (getattr(fns[c], "__module__", "") or "").replace(".", "/") \
        + ".py"
    monkeypatch.setattr(
        ent, "_module_diff",
        lambda rel, rec: "" if (rel == c_mod and rec ==
                                "CORRECTNESS_r02.json") else None)
    ent._DIFF_CACHE.clear()
    ent._CATALOG_CACHE = None
    order = list(ent.queries())
    ia, ib, ic, id_ = (order.index(x) for x in (a, b, c, d))
    assert ia < ib < ic < id_, (ia, ib, ic, id_)


def test_dep_closure_staleness(monkeypatch):
    """A shared-helper change (ops/, stages/, pipelines/kg.py, ...) after a
    query's green row marks it stale even when its defining queries_*
    module is untouched — the round-5 review gap: epilogue.py edits after
    CORRECTNESS_r04 left kg_* entries classified fresh."""
    monkeypatch.setattr(ent, "_CATALOG_CACHE", None)
    names = list(ent.queries())
    x = names[0]
    monkeypatch.setattr(ent, "_latest_checked_round",
                        lambda: ({n: 4 for n in names},
                                 {4: "CORRECTNESS_r04.json"}))
    # defining modules are all OLDER than the record -> without dep info
    # everything is fresh
    monkeypatch.setattr(ent, "_git_ts",
                        lambda rel: 100 if rel.endswith(".json") else 10)
    monkeypatch.setattr(ent, "_dep_ts", lambda mod: 0)
    ent._CATALOG_CACHE = None
    fresh = ent.queries()
    assert len(fresh) == len(names)
    # now one dependency of x's module changed after the record
    x_mod = getattr(fresh[x], "__module__", "")
    monkeypatch.setattr(ent, "_dep_ts",
                        lambda mod: 10 ** 9 if mod == x_mod else 0)
    ent._CATALOG_CACHE = None
    order = list(ent.queries())
    stale = [n for n in order
             if getattr(ent.queries()[n], "__module__", "") == x_mod]
    # every entry of the dep-stale module now leads every fresh entry
    n_stale = len(stale)
    assert order[:n_stale] == stale or set(order[:n_stale]) == set(stale)


def test_dep_closure_real_modules():
    """The real import-closure walk finds shared helpers for the query
    modules (no monkeypatching): queries_kg must transitively depend on
    pipelines/kg.py and at least one ops/ module."""
    clo = ent._dep_closure("stakgraph_ray.pipelines.queries_kg")
    assert "stakgraph_ray/pipelines/kg.py" in clo
    assert any(f.startswith("stakgraph_ray/ops/") for f in clo)
    assert "stakgraph_ray/pipelines/queries_kg.py" not in clo
    clo_rel = ent._dep_closure("stakgraph_ray.pipelines.queries_rel")
    assert "stakgraph_ray/ops/relational.py" in clo_rel


def test_git_ts_dirty_file_bumps(tmp_path, monkeypatch):
    """An uncommitted working-tree edit counts as a change: _git_ts returns
    at least the file's mtime when git reports it dirty."""
    import os

    monkeypatch.setattr(ent, "_DIRTY_FILES", {"somefile.py"})
    ent._TS_CACHE.pop("somefile.py", None)
    p = os.path.join(ent._REPO, "somefile.py")
    try:
        with open(p, "w") as fh:
            fh.write("x = 1\n")
        ts = ent._git_ts("somefile.py")
        assert ts >= int(os.path.getmtime(p))
    finally:
        os.unlink(p)
        ent._TS_CACHE.pop("somefile.py", None)


def test_diff_ranges_hunk_parsing(monkeypatch):
    monkeypatch.setattr(
        ent, "_module_diff",
        lambda rel, rec: "@@ -1,3 +10,5 @@ def f():\n+x\n@@ -9 +42 @@\n+y\n")
    assert ent._diff_ranges("m.py", "CORRECTNESS_r04.json") == \
        [(10, 15), (42, 43)]
    monkeypatch.setattr(ent, "_module_diff", lambda rel, rec: None)
    assert ent._diff_ranges("m.py", "CORRECTNESS_r04.json") is None


def test_shared_region_hunk_marks_module_stale(monkeypatch):
    """A diff hunk attributable to NO entry's def (module-local helper, SQL
    oracle constant, registration dict) marks every module-mate stale; a
    hunk inside exactly one entry's def marks only that entry — the
    function-granular rule applies only to edits the def map can
    attribute."""
    import inspect

    monkeypatch.setattr(ent, "_CATALOG_CACHE", None)
    fns_all = ent.queries()
    names = list(fns_all)
    mod = getattr(fns_all[names[0]], "__module__", "")
    mates = [n for n in names if getattr(fns_all[n], "__module__", "") == mod]
    assert len(mates) >= 2
    target = mates[0]
    rel = mod.replace(".", "/") + ".py"

    monkeypatch.setattr(ent, "_latest_checked_round",
                        lambda: ({n: 4 for n in names},
                                 {4: "CORRECTNESS_r04.json"}))
    monkeypatch.setattr(ent, "_git_ts",
                        lambda p: 50 if p.endswith(".json")
                        else (100 if p == rel else 10))
    monkeypatch.setattr(ent, "_dep_ts", lambda m: 0)
    monkeypatch.setattr(ent, "_module_diff", lambda p, rec: "")  # no names

    # case A: hunk at module top (imports/constants) -> whole module stale
    monkeypatch.setattr(ent, "_diff_ranges",
                        lambda p, rec: [(1, 2)] if p == rel else None)
    ent._CATALOG_CACHE = None
    order = list(ent.queries())
    assert all(order.index(m) < len(mates) for m in mates)

    # case B: hunk inside ONE entry's def -> only that entry stale
    lines, start = inspect.getsourcelines(fns_all[target])
    span = [(start + 1, start + 2)]
    monkeypatch.setattr(ent, "_diff_ranges",
                        lambda p, rec: span if p == rel else None)
    ent._CATALOG_CACHE = None
    order = list(ent.queries())
    assert order.index(target) == 0
    assert all(order.index(m) > 0 for m in mates[1:])
