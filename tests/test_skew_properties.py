"""Property tests for the skew-safe aggregation and ordered running-sum
kernels: the salted two-stage reduction must equal the plain grouped
aggregate on ANY input (the salt is a routing detail, never a semantic
one), and running_sum must equal the per-group ordered cumsum."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(st.tuples(st.integers(0, 5), st.integers(-30, 30)),
                min_size=1, max_size=40)


def _ds(pairs):
    import ray.data as rd

    t = pa.table({"k": pa.array([str(p[0]) for p in pairs], pa.string()),
                  "v": pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t), t.to_pandas()


@given(pairs=rows, num_salts=st.sampled_from([1, 3, 8]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_salted_sum_count_matches_plain_groupby(ray_session, pairs,
                                                num_salts):
    from stakgraph_ray.ops.skew import salted_sum_count

    ds, df = _ds(pairs)
    out = salted_sum_count(ds, "k", value_col="v", num_salts=num_salts)
    got = pa.Table.from_pylist(out.take_all()).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k", sort=True).agg(
        n=("v", "count"), sum_v=("v", "sum")).reset_index()
    assert list(got["k"]) == list(want["k"])
    assert list(got["n"]) == list(want["n"])
    sum_col = [c for c in got.columns if c.startswith("sum")][0]
    assert list(got[sum_col]) == list(want["sum_v"])


@given(pairs=rows)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_running_sum_matches_grouped_cumsum(ray_session, pairs):
    import ray.data as rd

    from stakgraph_ray.ops.relational import running_sum

    # unique, increasing order key so the cumsum order is unambiguous
    t = pa.table({
        "k": pa.array([str(p[0]) for p in pairs], pa.string()),
        "o": pa.array(list(range(len(pairs))), pa.int64()),
        "v": pa.array([float(p[1]) for p in pairs], pa.float64())})
    out = running_sum(rd.from_arrow(t), "k", "o", "v", out_col="run",
                      num_partitions=3)
    got = pa.Table.from_pylist(out.take_all()).to_pandas() \
        .sort_values(["k", "o"]).reset_index(drop=True)
    df = t.to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
    df["run"] = df.groupby("k")["v"].cumsum()
    pd.testing.assert_frame_equal(got[["k", "o", "v", "run"]], df,
                                  check_dtype=False)
