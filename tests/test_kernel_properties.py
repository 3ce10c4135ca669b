"""Property tests for the remaining shared kernels: distributed quantiles
vs numpy's linear interpolation, HLL register-merge determinism (merge of
any split == one pass over the union), vectorized sanitize vs the scalar
reference on arbitrary unicode, and global first-wins dedup vs a pandas
oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(vals=st.lists(st.floats(allow_nan=False, allow_infinity=False,
                               min_value=-1e6, max_value=1e6),
                     min_size=2, max_size=80),
       qs=st.lists(st.floats(min_value=0.0, max_value=1.0),
                   min_size=1, max_size=4))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distributed_quantiles_match_numpy(ray_session, vals, qs):
    import ray.data as rd

    from stakgraph_ray.ops.quantile import distributed_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    got = distributed_quantiles(ds, "x", qs)
    want = np.quantile(np.asarray(vals, np.float64), qs)  # linear interp
    assert np.allclose(got, want, rtol=0, atol=1e-7), (got, want)


@given(vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=300),
       split=st.integers(0, 300), p=st.sampled_from([8, 12]))
@settings(max_examples=20, deadline=None)
def test_hll_merge_equals_single_pass(vals, split, p):
    """max-merge of the two halves' registers == one pass over the whole —
    the mergeability every distributed HLL rollup relies on."""
    from stakgraph_ray.ops.sketch import hll_batch_registers, \
        hll_estimate_exact

    arr = np.asarray(vals, np.int64)
    cut = min(split, len(arr))
    merged = np.maximum(hll_batch_registers(arr[:cut], p),
                        hll_batch_registers(arr[cut:], p))
    whole = hll_batch_registers(arr, p)
    assert (merged == whole).all()
    assert hll_estimate_exact(merged) == hll_estimate_exact(whole)


def _assigned(c: str) -> bool:
    import unicodedata

    return unicodedata.category(c) != "Cn"


@given(texts=st.lists(st.text(max_size=12).map(
    lambda s: "".join(c for c in s if _assigned(c))),
    min_size=1, max_size=30))
@settings(max_examples=25, deadline=None)
def test_sanitize_array_matches_scalar_on_assigned_unicode(texts):
    """The vectorized RE2 \\p{L}\\p{N} sanitize and the scalar
    str.isalnum agree on every codepoint ASSIGNED in the runtime's
    Unicode tables. (They may disagree on codepoints newer than
    CPython's unicodedata — e.g. CJK Ext-H — where RE2's tables are
    ahead; keys only need INTERNAL consistency, which sanitize_array
    provides everywhere production builds keys.)"""
    from stakgraph_ray.schema import sanitize, sanitize_array

    got = sanitize_array(pa.array(texts, pa.string())).to_pylist()
    assert got == [sanitize(t) for t in texts]


@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 30),
                               st.integers(0, 99)),
                     min_size=1, max_size=40))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_first_wins_hp_matches_pandas(ray_session, rows):
    """Global first-wins on (key, min order_by): ties on order_by may keep
    either payload, so compare on the (key, winning order) pairs plus the
    payload wherever the minimum is unique."""
    import ray.data as rd

    from stakgraph_ray.ops.partition import first_wins_hp

    t = pa.table({"k": pa.array([str(r[0]) for r in rows], pa.string()),
                  "o": pa.array([r[1] for r in rows], pa.int64()),
                  "v": pa.array([r[2] for r in rows], pa.int64())})
    out = first_wins_hp(rd.from_arrow(t), "k", "o", num_partitions=3)
    got = pa.Table.from_pylist(out.take_all(), schema=t.schema).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    df = t.to_pandas()
    mins = df.groupby("k", sort=True)["o"].min().reset_index()
    assert list(got["k"]) == list(mins["k"])
    assert list(got["o"]) == list(mins["o"])
    unique_min = df.merge(mins, on=["k", "o"]).groupby("k").size()
    for k, cnt in unique_min.items():
        if cnt == 1:
            want_v = df[(df["k"] == k) & (
                df["o"] == mins[mins["k"] == k]["o"].iloc[0])]["v"].iloc[0]
            assert got[got["k"] == k]["v"].iloc[0] == want_v
