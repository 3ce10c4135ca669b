"""Property test: the broadcast interval join must emit exactly the
(event, interval) pairs a brute-force double loop finds — key equality
plus the half-open lo <= ts < hi window — on random overlapping,
nested, empty and duplicate intervals."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

events_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                    min_size=1, max_size=25)
ivals_s = st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                             st.integers(0, 50)),
                   min_size=1, max_size=12)


def _us(seconds):
    return np.array(seconds, dtype="datetime64[s]").astype("datetime64[us]")


@given(events=events_s, ivals=ivals_s)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interval_join_matches_bruteforce(ray_session, events, ivals):
    import ray.data as rd

    from stakgraph_ray.ops.relational import interval_join

    ev = pa.table({
        "eid": pa.array(list(range(len(events))), pa.int64()),
        "k": pa.array([str(e[0]) for e in events], pa.string()),
        "ts": pa.array(_us([e[1] for e in events]))})
    iv = pa.table({
        "k": pa.array([str(i[0]) for i in ivals], pa.string()),
        "pid": pa.array(list(range(len(ivals))), pa.int64()),
        "lo": pa.array(_us([min(i[1], i[2]) for i in ivals])),
        "hi": pa.array(_us([max(i[1], i[2]) for i in ivals]))})
    got = interval_join(rd.from_arrow(ev), iv, "k", "ts", "lo", "hi",
                        ["pid"]).to_pandas()
    # an all-empty result arrives as Ray's schema-less empty block
    got_pairs = (sorted(zip(got["eid"], got["pid"]))
                 if len(got) else [])
    want = sorted(
        (eid, pid)
        for eid, (ek, ets) in enumerate(events)
        for pid, (ik, lo, hi) in enumerate(
            (i[0], min(i[1], i[2]), max(i[1], i[2])) for i in ivals)
        if ek == ik and lo <= ets < hi)
    assert got_pairs == want
