"""Property test for the load-bearing join primitive: cogroup_join_hp on
random tables must match a pandas-merge oracle for every supported join
type — duplicate keys (cross-products inside a key), keys unique to each
side, and empty sides included."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows = st.lists(st.tuples(st.integers(0, 8), st.integers(-100, 100)),
                min_size=0, max_size=24)


def _ds(pairs, val_name):
    import ray.data as rd

    t = pa.table({"k": pa.array([p[0] for p in pairs], pa.int64()),
                  val_name: pa.array([p[1] for p in pairs], pa.int64())})
    return rd.from_arrow(t), t


def _oracle(lt, rt, how):
    ldf, rdf = lt.to_pandas(), rt.to_pandas()
    m = ldf.merge(rdf, on="k", how=how)
    return m.sort_values(list(m.columns)).reset_index(drop=True)


@pytest.mark.parametrize("jt,how", [("inner", "inner"),
                                    ("left outer", "left"),
                                    ("full outer", "outer")])
@given(left=rows, right=rows)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cogroup_join_matches_pandas(ray_session, jt, how, left, right):
    from stakgraph_ray.ops.partition import cogroup_join_hp

    lds, lt = _ds(left, "a")
    rds, rt = _ds(right, "b")
    out = cogroup_join_hp(
        lds, rds, "k",
        pa.schema([("k", pa.int64()), ("a", pa.int64())]),
        pa.schema([("k", pa.int64()), ("b", pa.int64())]),
        join_type=jt, num_partitions=3)
    got = pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema([("k", pa.int64()), ("a", pa.int64()),
                          ("b", pa.int64())])).to_pandas()
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    want = _oracle(lt, rt, how).astype("float64")
    pd.testing.assert_frame_equal(got.astype("float64"), want,
                                  check_dtype=False)


@pytest.mark.parametrize("keep", [True, False])
@given(payload=rows, keys=st.lists(st.integers(0, 8), max_size=16))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_membership_filter_matches_isin(ray_session, keep, payload, keys):
    """Semi (keep=True) / anti (keep=False) join vs a pandas isin oracle,
    duplicate keys on both sides included."""
    import ray.data as rd

    from stakgraph_ray.ops.partition import membership_filter_hp

    pds_, pt = _ds(payload, "a")
    kt = pa.table({"k": pa.array(keys, pa.int64())})
    kds = rd.from_arrow(kt)
    out = membership_filter_hp(
        pds_, kds, "k", keep=keep,
        payload_schema=pa.schema([("k", pa.int64()), ("a", pa.int64())]),
        num_partitions=3)
    got = pa.Table.from_pylist(
        out.take_all(), schema=pt.schema).to_pandas() \
        .sort_values(["k", "a"]).reset_index(drop=True)
    df = pt.to_pandas()
    mask = df["k"].isin(keys)
    want = df[mask if keep else ~mask] \
        .sort_values(["k", "a"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
