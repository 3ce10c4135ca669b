"""Property test: the broadcast as-of join (latest right row with
right_on <= left_on, per key) must match a brute-force scan on random
data — duplicate timestamps, keys with no right rows, and exact-match
boundaries included."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

left_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 40)),
                  min_size=1, max_size=20)
right_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 40),
                             st.integers(-99, 99)),
                   min_size=1, max_size=15)


def _us(seconds):
    return np.array(seconds, dtype="datetime64[s]").astype("datetime64[us]")


@given(left=left_s, right=right_s)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_join_matches_bruteforce(ray_session, left, right):
    import ray.data as rd

    from stakgraph_ray.ops.relational import asof_join

    lt = pa.table({
        "lid": pa.array(list(range(len(left))), pa.int64()),
        "user_id": pa.array([l[0] for l in left], pa.int64()),
        "ts": pa.array(_us([l[1] for l in left]))})
    rt = pa.table({
        "user_id": pa.array([r[0] for r in right], pa.int64()),
        "pts": pa.array(_us([r[1] for r in right])),
        "val": pa.array([r[2] for r in right], pa.int64())})
    out = asof_join(rd.from_arrow(lt), rt, by="user_id", left_on="ts",
                    right_on="pts", value_cols=["val"], concurrency=2)
    got = {r["lid"]: r["val"] for r in out.take_all()}

    # brute force: per left row, the right row with the LATEST pts <= ts
    # for the same key; pandas merge_asof resolves equal-pts ties by taking
    # the LAST such row in right order, so mirror that
    for lid, (k, ts) in enumerate(left):
        best = None
        for rk, pts, val in right:
            if rk == k and pts <= ts and (best is None or pts >= best[0]):
                best = (pts, val)
        assert got[lid] == (best[1] if best else None), (lid, k, ts)
