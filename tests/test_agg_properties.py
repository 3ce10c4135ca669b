"""Property tests for the aggregation primitives dozens of queries run
through: grouped_aggregate / low_card_aggregate vs a pandas-groupby
oracle (same random inputs through both code paths), distinct_hp vs
drop_duplicates, global_running_sum vs an exact cumsum, first_per_group
vs a sort-head oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(st.tuples(st.integers(0, 6), st.integers(-50, 50)),
                min_size=1, max_size=40)


def _ds(pairs):
    import ray.data as rd

    t = pa.table({"k": pa.array([p[0] for p in pairs], pa.int64()),
                  "v": pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t), t.to_pandas()


def _want(df):
    w = df.groupby("k", sort=True).agg(s=("v", "sum"), n=("v", "count"),
                                       mx=("v", "max"))
    return w.reset_index()


def _got_frame(out_rows):
    got = pa.Table.from_pylist(out_rows, schema=pa.schema(
        [("k", pa.int64()), ("s", pa.int64()), ("n", pa.int64()),
         ("mx", pa.int64())])).to_pandas()
    return got.sort_values("k").reset_index(drop=True)


@given(pairs=rows)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_grouped_aggregate_matches_pandas(ray_session, pairs):
    from stakgraph_ray.ops.partition import grouped_aggregate

    ds, df = _ds(pairs)
    out = grouped_aggregate(ds, "k",
                            [("v", "sum"), ("v", "count"), ("v", "max")],
                            ["s", "n", "mx"], num_partitions=3)
    pd.testing.assert_frame_equal(_got_frame(out.take_all()), _want(df),
                                  check_dtype=False)


@given(pairs=rows)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_low_card_aggregate_matches_grouped(ray_session, pairs):
    """The combiner-first driver-merge path and the keyed-shuffle path are
    the SAME aggregate — a low-card result must equal the hp result."""
    from stakgraph_ray.ops.partition import low_card_aggregate

    ds, df = _ds(pairs)
    out = low_card_aggregate(ds, "k",
                             [("v", "sum"), (None, "count_all"),
                              ("v", "max")],
                             ["s", "n", "mx"])
    pd.testing.assert_frame_equal(_got_frame(out.take_all()), _want(df),
                                  check_dtype=False)


@given(pairs=rows)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_distinct_hp_matches_drop_duplicates(ray_session, pairs):
    from stakgraph_ray.ops.partition import distinct_hp

    ds, df = _ds(pairs)
    out = distinct_hp(ds, ["k", "v"], num_partitions=3)
    got = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("k", pa.int64()), ("v", pa.int64())])).to_pandas() \
        .sort_values(["k", "v"]).reset_index(drop=True)
    want = df.drop_duplicates().sort_values(["k", "v"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
       width=st.sampled_from([1, 7, 4096]))
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_running_sum_is_exact_prefix(ray_session, vals, width):
    """The bucketed two-pass prefix sum equals the naive ordered cumsum,
    including the row's own value, at any bucket width — ids sparse and
    non-contiguous."""
    import ray.data as rd

    from stakgraph_ray.ops.relational import global_running_sum

    ids = np.cumsum(np.random.default_rng(3).integers(
        1, 5, len(vals))).astype(np.int64)          # strictly increasing
    t = pa.table({"i": pa.array(ids, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    out = global_running_sum(rd.from_arrow(t), "i", "v", out_col="run",
                             bucket_size=width, num_partitions=3)
    got = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("i", pa.int64()), ("v", pa.int64()), ("run", pa.int64())])) \
        .to_pandas().sort_values("i").reset_index(drop=True)
    want = pd.DataFrame({"i": ids, "v": vals,
                         "run": np.cumsum(vals).astype(np.int64)})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@given(pairs=rows)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_first_per_group_matches_sort_head(ray_session, pairs):
    from stakgraph_ray.ops.relational import first_per_group

    ds, df = _ds(pairs)
    out = first_per_group(ds, ["k"], "v", descending=True)
    got = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("k", pa.int64()), ("v", pa.int64())])).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.sort_values(["k", "v"], ascending=[True, False]) \
        .groupby("k", sort=True).head(1).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]],
                                  check_dtype=False)
