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
    fns = ent.queries()
    c_mod = (getattr(fns[c], "__module__", "") or "").replace(".", "/") \
        + ".py"
    monkeypatch.setattr(
        ent, "_module_diff",
        lambda rel, rec: "" if (rel == c_mod and rec ==
                                "CORRECTNESS_r02.json") else None)
    ent._DIFF_CACHE.clear()
    order = list(ent.queries())
    ia, ib, ic, id_ = (order.index(x) for x in (a, b, c, d))
    assert ia < ib < ic < id_, (ia, ib, ic, id_)


def test_diff_ranges_hunk_parsing(monkeypatch):
    monkeypatch.setattr(
        ent, "_module_diff",
        lambda rel, rec: "@@ -1,3 +10,5 @@ def f():\n+x\n@@ -9 +42 @@\n+y\n")
    assert ent._diff_ranges("m.py", "CORRECTNESS_r04.json") == \
        [(10, 15), (42, 43)]
    monkeypatch.setattr(ent, "_module_diff", lambda rel, rec: None)
    assert ent._diff_ranges("m.py", "CORRECTNESS_r04.json") is None
