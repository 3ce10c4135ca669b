"""Pin the float-parity convention every SQL oracle rests on: within the
domain |x| * 10^nd < 2^52 (all oracle-facing value ranges sit orders of
magnitude inside it), ``util.round_half_away`` is BIT-IDENTICAL to
DuckDB's ``round()`` on DOUBLE. Outside that domain ``abs(x) * scale``
loses integer precision and the two engines may differ by 1 ulp — no
repo query emits values there (revenue sums travel as exact int64 cents
and are divided down before rounding)."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stakgraph_ray.util import round_half_away

_CON = duckdb.connect()


def _duck_round(vals, nd):
    return np.array(_CON.execute(
        "select list_transform($1, x -> round(x, $2))",
        [list(map(float, vals)), nd]).fetchone()[0])


@given(st.integers(0, 6),
       st.lists(st.floats(allow_nan=False, allow_infinity=False,
                          min_value=-1e15, max_value=1e15),
                min_size=1, max_size=50))
@settings(max_examples=60, deadline=None)
def test_round_half_away_matches_duckdb_in_domain(nd, xs):
    lim = (2.0 ** 52) / (10.0 ** nd)
    vals = np.asarray([x for x in xs if abs(x) < lim], np.float64)
    if not len(vals):
        return
    got = round_half_away(vals, nd)
    want = _duck_round(vals, nd)
    assert (got == want).all(), (nd, vals[got != want][:3])


def test_round_half_away_half_ties_and_signs():
    """The exact half-tie cases the name promises (away from zero, not
    banker's), per ulp-exact doubles."""
    vals = np.array([0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.125, -0.125])
    assert list(round_half_away(vals, 0)) == [1.0, -1.0, 2.0, -2.0,
                                              3.0, -3.0, 0.0, -0.0]
    assert list(round_half_away(vals, 2)) == [0.5, -0.5, 1.5, -1.5,
                                              2.5, -2.5, 0.13, -0.13]
    assert (round_half_away(vals, 0) == _duck_round(vals, 0)).all()
    assert (round_half_away(vals, 2) == _duck_round(vals, 2)).all()
