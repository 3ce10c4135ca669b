"""Unit gates for the SQL-window family (window_rank / window_lag /
top_n_per_group) and the grouped exact quantile — each compared against a
pandas/numpy brute force on adversarial inputs (ties, single-row groups,
null-free floats)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from stakgraph_ray.ops.quantile import grouped_quantile
from stakgraph_ray.ops.relational import top_n_per_group, window_lag, window_rank


def _orders():
    rng = np.random.RandomState(7)
    n = 500
    # duplicate prices on purpose: rank()/dense_rank() must differ from
    # row_number() inside ties
    return pa.table({
        "cust": pa.array(rng.randint(0, 37, n), pa.int64()),
        "okey": pa.array(np.arange(n), pa.int64()),
        "price": pa.array(rng.randint(0, 25, n).astype("float64")),
    })


def test_window_rank_matches_pandas(ray_session):
    import ray.data as rd

    t = _orders()
    got = window_rank(rd.from_arrow(t), "cust",
                      [("price", "descending"), ("okey", "ascending")],
                      rank_cols=["price"], out_row_number="rn",
                      out_rank="rnk", out_dense_rank="drnk") \
        .to_pandas().sort_values("okey").reset_index(drop=True)
    df = t.to_pandas()
    g = df.sort_values(["cust", "price", "okey"],
                       ascending=[True, False, True]).groupby("cust")
    df["rn"] = g.cumcount().sort_index() + 1
    df["rnk"] = df.groupby("cust")["price"].rank("min", ascending=False).astype(int)
    df["drnk"] = df.groupby("cust")["price"].rank("dense", ascending=False).astype(int)
    df = df.sort_values("okey").reset_index(drop=True)
    assert got.rn.tolist() == df.rn.tolist()
    assert got.rnk.tolist() == df.rnk.tolist()
    assert got.drnk.tolist() == df.drnk.tolist()


def test_window_lag_null_at_group_start(ray_session):
    import ray.data as rd

    t = _orders()
    got = window_lag(rd.from_arrow(t), "cust", [("okey", "ascending")],
                     "price", out_col="prev") \
        .to_pandas().sort_values("okey").reset_index(drop=True)
    df = t.to_pandas().sort_values(["cust", "okey"])
    df["prev"] = df.groupby("cust")["price"].shift(1)
    df = df.sort_values("okey").reset_index(drop=True)
    assert ((got.prev.isna() & df.prev.isna()) | (got.prev == df.prev)).all()
    # exactly one null per group (the group's first row)
    assert got.prev.isna().sum() == df.cust.nunique()


def test_top_n_per_group_matches_pandas(ray_session):
    import ray.data as rd

    t = _orders()
    got = top_n_per_group(rd.from_arrow(t), "cust",
                          [("price", "descending"), ("okey", "ascending")], 3) \
        .to_pandas()
    df = t.to_pandas()
    want = df.sort_values(["price", "okey"], ascending=[False, True]) \
        .groupby("cust").head(3)
    assert sorted(got.okey.tolist()) == sorted(want.okey.tolist())
    assert (got.groupby("cust").size() <= 3).all()
    assert set(got.rn.unique()) <= {1, 2, 3}


def test_grouped_quantile_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    t = pa.table({
        "k": pa.array(rng.randint(0, 11, 400), pa.int64()),
        "v": pa.array(rng.randn(400)),
    })
    got = grouped_quantile(rd.from_arrow(t), "k", "v", [0.25, 0.5, 0.9],
                           ["p25", "p50", "p90"]) \
        .to_pandas().set_index("k").sort_index()
    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        for q, col in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
            # 1-ulp tolerance: numpy's _lerp switches interpolation side at
            # t>=0.5; the op pins the DuckDB quantile_cont expression
            # (lower + frac*(upper-lower)) instead
            assert abs(got.loc[k, col] - np.quantile(grp.v.to_numpy(), q)) \
                < 1e-12, (k, q)


def test_grouped_quantile_single_row_groups(ray_session):
    import ray.data as rd

    t = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([5.0, -1.0, 2.5])})
    got = grouped_quantile(rd.from_arrow(t), "k", "v", [0.5], ["p50"]) \
        .to_pandas().set_index("k").sort_index()
    assert got.p50.tolist() == [5.0, -1.0, 2.5]


def test_distributed_quantiles_shared_pass_matches_numpy(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.quantile import distributed_quantiles

    rng = np.random.RandomState(11)
    v = rng.lognormal(0, 2, 5000)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
    got = distributed_quantiles(ds, "v", [0.1, 0.5, 0.99])
    want = [np.quantile(v, q) for q in (0.1, 0.5, 0.99)]
    assert np.allclose(got, want, rtol=1e-12, atol=0), (got, want)


def test_hll_accuracy_and_merge(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import (approx_distinct,
                                          hll_batch_registers, hll_estimate)

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 50_000, 200_000)  # ~49k distinct after collisions
    exact = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    est = approx_distinct(ds, "x", p=12)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # mergeability: max of two half-sketches == sketch of the union
    a, b = vals[:100_000], vals[100_000:]
    merged = np.maximum(hll_batch_registers(a, 12), hll_batch_registers(b, 12))
    assert hll_estimate(merged) == hll_estimate(hll_batch_registers(vals, 12))


def test_hll_small_range_linear_counting(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import approx_distinct

    ds = rd.from_arrow(pa.table({"x": pa.array(np.arange(100) % 17)}))
    est = approx_distinct(ds, "x", p=12)
    assert abs(est - 17) < 1.0, est  # linear-counting regime is near-exact


def test_interval_join_overlaps_and_misses(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.relational import interval_join

    ts = np.array([5, 15, 25, 99], dtype="datetime64[s]").astype("datetime64[us]")
    ev = pa.table({"eid": pa.array([0, 1, 2, 3], pa.int64()),
                   "k": pa.array(["a", "a", "b", "a"]),
                   "ts": pa.array(ts)})
    iv = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "pid": pa.array([0, 1, 0], pa.int64()),
        "lo": pa.array(np.array([0, 10, 20], dtype="datetime64[s]").astype("datetime64[us]")),
        "hi": pa.array(np.array([20, 30, 30], dtype="datetime64[s]").astype("datetime64[us]")),
    })
    got = interval_join(rd.from_arrow(ev), iv, "k", "ts", "lo", "hi",
                        ["pid"]).to_pandas().sort_values(["eid", "pid"])
    pairs = list(zip(got.eid.tolist(), got.pid.tolist()))
    # eid=1 (ts=15, key a) sits in BOTH overlapping a-intervals; eid=3 in none
    assert pairs == [(0, 0), (1, 0), (1, 1), (2, 0)]


def test_cms_one_sided_and_mergeable(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import (cms_batch_counts, cms_estimate,
                                          cms_frequencies)

    rng = np.random.RandomState(9)
    # zipf-ish: few heavy tokens + a long tail
    vals = np.array([f"tok{i}" for i in rng.zipf(1.5, 30_000) if i < 5000],
                    dtype=object)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals.tolist(), pa.string())}))
    probes = [f"tok{i}" for i in range(1, 20)]
    est = cms_frequencies(ds, "x", probes, width=8192, depth=4)
    exact = pd.Series(vals).value_counts()
    n = len(vals)
    for p in probes:
        true = int(exact.get(p, 0))
        assert est[p] >= true, p                      # CMS never undercounts
        assert est[p] <= true + 2 * n // 8192 + 1, p  # one-sided bound

    # mergeability: sum of two half-sketches == sketch of the whole
    a, b = vals[: n // 2], vals[n // 2:]
    merged = cms_batch_counts(a, 1024, 3) + cms_batch_counts(b, 1024, 3)
    whole = cms_batch_counts(vals, 1024, 3)
    assert (merged == whole).all()
    probe_arr = np.array(probes, dtype=object)
    assert (cms_estimate(merged, probe_arr) == cms_estimate(whole, probe_arr)).all()


def test_stable_sketches_accuracy_and_exact_estimate(ray_session):
    """The md5/oracle-checkable sketch variants: same accuracy as the
    siphash family, and hll_estimate_exact agrees with the float-path
    hll_estimate to rounding (identical registers -> same estimator)."""
    import ray.data as rd

    from stakgraph_ray.ops.sketch import (approx_distinct_stable,
                                          cms_frequencies_stable,
                                          grouped_approx_distinct_stable,
                                          hll_batch_registers, hll_estimate,
                                          hll_estimate_exact)

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 50_000, 150_000)
    exact = len(np.unique(vals))
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    est = approx_distinct_stable(ds, "x", p=12)
    assert isinstance(est, int)
    assert abs(est - exact) / exact < 0.05, (est, exact)

    # exact-integer estimate == float estimate to rounding, both regimes
    for n in (40, 300, 60_000):
        reg = hll_batch_registers(np.arange(n, dtype=np.int64), 12)
        assert abs(hll_estimate_exact(reg) - hll_estimate(reg)) <= 1.0

    # grouped: null keys form one group, null values dropped
    t = pa.table({"k": pa.array(["a", "a", None, "b", "a", None]),
                  "v": pa.array([1, 2, 3, 1, None, 3], pa.int64())})
    g = grouped_approx_distinct_stable(rd.from_arrow(t), "k", "v", p=12)
    assert g == {"a": 2, None: 1, "b": 1}, g

    # CMS stable: never undercounts, one-sided bound
    toks = np.array([f"tok{i}" for i in rng.zipf(1.5, 20_000) if i < 5000],
                    dtype=object)
    ds2 = rd.from_arrow(pa.table({"x": pa.array(toks.tolist(), pa.string())}))
    probes = [f"tok{i}" for i in range(1, 10)] + ["absent"]
    est2 = cms_frequencies_stable(ds2, "x", probes, width=8192, depth=4)
    counts = pd.Series(toks).value_counts()
    for p in probes:
        true = int(counts.get(p, 0))
        assert est2[p] >= true, p
        assert est2[p] <= true + 2 * len(toks) // 8192 + 1, p


def test_global_running_sum_exact_and_bucketed(ray_session):
    """Exact int64 global prefix (includes own value) across bucket and
    block boundaries; shuffled input order must not matter."""
    import ray.data as rd

    from stakgraph_ray.ops.relational import global_running_sum

    rng = np.random.RandomState(3)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    vals = rng.randint(1, 10_000, n).astype(np.int64)
    perm = rng.permutation(n)  # out-of-order arrival, many blocks
    ds = rd.from_arrow(pa.table({"i": ids[perm], "v": vals[perm]})) \
        .repartition(13)
    out = global_running_sum(ds, "i", "v", out_col="r",
                             bucket_size=64).take_all()
    got = {r["i"]: r["r"] for r in out}
    want = np.cumsum(vals)
    assert len(got) == n
    assert all(got[i] == int(want[i]) for i in range(n))

    # sparse/hashed id space: the adaptive width (min/max pre-pass) must
    # cap the driver carry at max_buckets whatever the id range — with a
    # fixed 4096 width each 52-bit id would land in its own bucket and the
    # combiner would pull O(rows) to the driver
    sparse_ids = (ids * 982_451_653 + 7) % (1 << 52)
    order = np.argsort(sparse_ids)
    ds2 = rd.from_arrow(pa.table({"i": sparse_ids[perm],
                                  "v": vals[perm]})).repartition(7)
    out2 = {r["i"]: r["r"]
            for r in global_running_sum(ds2, "i", "v", out_col="r").take_all()}
    want2 = np.cumsum(vals[order])
    assert all(out2[int(sparse_ids[order][j])] == int(want2[j])
               for j in range(n))

    # degenerate cap: max_buckets=16 coarsens the width, many ids share a
    # bucket — within-bucket segmented cumsum must still be exact
    out3 = {r["i"]: r["r"]
            for r in global_running_sum(ds2, "i", "v", out_col="r",
                                        max_buckets=16).take_all()}
    assert all(out3[int(sparse_ids[order][j])] == int(want2[j])
               for j in range(n))

    # caller-supplied id_bounds (a SUPERSET of the observed ids, e.g.
    # parquet footer stats over a later-filtered table) skip the min/max
    # pass and must not change the result
    out4 = {r["i"]: r["r"]
            for r in global_running_sum(ds2, "i", "v", out_col="r",
                                        id_bounds=(0, 1 << 52)).take_all()}
    assert out4 == out2

    # empty input
    empty = rd.from_arrow(pa.table({"i": pa.array([], pa.int64()),
                                    "v": pa.array([], pa.int64())}))
    assert global_running_sum(empty, "i", "v").take_all() == []


def test_cms_depth_rows_independent_on_numeric_values():
    from stakgraph_ray.ops.sketch import cms_batch_counts

    vals = np.arange(1000, dtype=np.int64)
    cms = cms_batch_counts(vals, 256, 4)
    # pandas hash_array ignores hash_key on numeric dtypes; the splitmix64
    # per-depth families must NOT collapse to one function
    for d in range(1, 4):
        assert not (cms[0] == cms[d]).all(), d


def test_interval_join_mixed_timestamp_units(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.relational import interval_join

    # events in SECONDS, intervals in MICROSECONDS — ticks must normalize
    ev = pa.table({"eid": pa.array([0, 1], pa.int64()),
                   "k": pa.array(["a", "a"]),
                   "ts": pa.array(np.array([5, 50], dtype="datetime64[s]"))})
    iv = pa.table({
        "k": pa.array(["a"]),
        "pid": pa.array([7], pa.int64()),
        "lo": pa.array(np.array([0], dtype="datetime64[s]").astype("datetime64[us]")),
        "hi": pa.array(np.array([10], dtype="datetime64[s]").astype("datetime64[us]")),
    })
    got = interval_join(rd.from_arrow(ev), iv, "k", "ts", "lo", "hi",
                        ["pid"]).to_pandas()
    assert got.eid.tolist() == [0] and got.pid.tolist() == [7]


def test_quantiles_ignore_nulls(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.quantile import (distributed_quantiles,
                                            grouped_quantile)

    rng = np.random.RandomState(2)
    v = rng.randn(300)
    vals = pa.array(
        [None if i % 7 == 0 else float(v[i]) for i in range(300)], pa.float64())
    t = pa.table({"k": pa.array([i % 3 for i in range(300)], pa.int64()),
                  "v": vals})
    clean = np.array([v[i] for i in range(300) if i % 7 != 0])
    got = distributed_quantiles(rd.from_arrow(t), "v", [0.5])
    assert abs(got[0] - np.quantile(clean, 0.5)) < 1e-12
    gq = grouped_quantile(rd.from_arrow(t), "k", "v", [0.5], ["p50"]) \
        .to_pandas().set_index("k").sort_index()
    for k in range(3):
        want = np.quantile(np.array([v[i] for i in range(300)
                                     if i % 7 != 0 and i % 3 == k]), 0.5)
        assert abs(gq.loc[k, "p50"] - want) < 1e-12, k


def test_window_dist_and_lead_match_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from stakgraph_ray.ops.relational import window_dist, window_lead

    t = _orders()  # heavy ties by construction
    order = [("price", "descending"), ("okey", "ascending")]
    out = window_dist(rd.from_arrow(t), "cust", order, rank_cols=["price"],
                      ntile=3, out_percent_rank="pr", out_cume_dist="cd",
                      out_ntile="tercile")
    out = window_lead(out, "cust", order, "price", out_col="nxt")
    got = out.to_pandas().sort_values("okey").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.sql("""
      select okey,
             percent_rank() over (partition by cust order by price desc) as pr,
             cume_dist() over (partition by cust order by price desc) as cd,
             ntile(3) over (partition by cust order by price desc, okey) as tercile,
             lead(price) over (partition by cust order by price desc, okey) as nxt
      from t order by okey""").df()
    assert (got.pr == want.pr).all()
    assert (got.cd == want.cd).all()
    assert got.tercile.tolist() == want.tercile.tolist()
    assert ((got.nxt.isna() & want.nxt.isna()) | (got.nxt == want.nxt)).all()


def test_grouped_hll_accuracy(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import grouped_approx_distinct

    rng = np.random.RandomState(13)
    n = 60_000
    t = pa.table({
        "k": pa.array([f"g{i % 4}" for i in range(n)]),
        "v": pa.array(rng.randint(0, 8000, n), pa.int64()),
    })
    est = grouped_approx_distinct(rd.from_arrow(t), "k", "v", p=12)
    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        exact = grp.v.nunique()
        assert abs(est[k] - exact) / exact < 0.05, (k, est[k], exact)


def test_grouped_hll_null_key_is_one_group(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import grouped_approx_distinct

    t = pa.table({"k": pa.array(["a", None, "a", None, "b"]),
                  "v": pa.array([1, 2, 3, 2, 9], pa.int64())})
    est = grouped_approx_distinct(rd.from_arrow(t), "k", "v", p=12)
    # null keys form ONE group (SQL GROUP BY), never silently dropped
    assert set(est) == {"a", "b", None}
    assert round(est[None]) == 1 and round(est["a"]) == 2


def test_grouped_hll_stable_all_null_group_kept(ray_session):
    """A key whose values are ALL null must still appear with estimate 0 —
    SQL: select k, count(distinct v) ... group by k gives ('c', 0), so
    filtering null-value ROWS before grouping (the old shape) would
    silently delete the key."""
    import ray.data as rd

    from stakgraph_ray.ops.sketch import grouped_approx_distinct_stable

    t = pa.table({"k": pa.array(["a", "c", "a", "c"]),
                  "v": pa.array(["x", None, "y", None], pa.string())})
    est = grouped_approx_distinct_stable(rd.from_arrow(t), "k", "v", p=12)
    assert est == {"a": 2, "c": 0}


def test_hll_null_values_not_counted(ray_session):
    """SQL count(distinct v) ignores nulls: the float HLL family must not
    hash None into the sketch (one phantom distinct per null-bearing
    column), and an all-null group estimates 0 but keeps its key."""
    import ray.data as rd

    from stakgraph_ray.ops.sketch import approx_distinct, grouped_approx_distinct

    t = pa.table({"k": pa.array(["a", "a", "c", "c"]),
                  "v": pa.array(["x", None, None, None], pa.string())})
    ds = rd.from_arrow(t)
    assert round(approx_distinct(ds, "v", p=12)) == 1
    g = grouped_approx_distinct(ds, "k", "v", p=12)
    assert set(g) == {"a", "c"}
    assert round(g["a"]) == 1 and round(g["c"]) == 0


def test_window_dist_fused_lead_matches_separate(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.relational import window_dist, window_lead

    t = _orders()
    order = [("price", "descending"), ("okey", "ascending")]
    fused = window_dist(rd.from_arrow(t), "cust", order,
                        rank_cols=["price"], lead_col="price", out_lead="nxt") \
        .to_pandas().sort_values("okey").reset_index(drop=True)
    sep = window_lead(rd.from_arrow(t), "cust", order, "price",
                      out_col="nxt").to_pandas() \
        .sort_values("okey").reset_index(drop=True)
    assert ((fused.nxt.isna() & sep.nxt.isna()) | (fused.nxt == sep.nxt)).all()


def test_interval_join_empty_block(ray_session):
    """An empty input block (tiny-file splits, upstream filters) must pass
    through the IntervalJoiner instead of crashing its factorize path."""
    import ray.data as rd

    from stakgraph_ray.ops.relational import interval_join

    ev = pa.table({"eid": pa.array([], pa.int64()),
                   "k": pa.array([], pa.string()),
                   "ts": pa.array([], pa.timestamp("us"))})
    iv = pa.table({
        "k": pa.array(["a"]),
        "pid": pa.array([0], pa.int64()),
        "lo": pa.array(np.array([0], dtype="datetime64[s]").astype("datetime64[us]")),
        "hi": pa.array(np.array([20], dtype="datetime64[s]").astype("datetime64[us]")),
    })
    got = interval_join(rd.from_arrow(ev), iv, "k", "ts", "lo", "hi", ["pid"])
    assert got.count() == 0


def test_grouped_quantile_keeps_all_null_groups(ray_session):
    """SQL quantile_cont ... GROUP BY keeps a group whose values are ALL
    null (with a null quantile); the op must not drop it."""
    import ray.data as rd

    from stakgraph_ray.ops.quantile import grouped_quantile

    t = pa.table({
        "k": pa.array([0, 0, 1, 1, 2], pa.int64()),
        "v": pa.array([1.0, 3.0, None, None, 5.0], pa.float64()),
    })
    got = grouped_quantile(rd.from_arrow(t), "k", "v", [0.5], ["p50"]) \
        .to_pandas().set_index("k").sort_index()
    assert list(got.index) == [0, 1, 2]
    assert got.loc[0, "p50"] == 2.0
    assert pd.isna(got.loc[1, "p50"])
    assert got.loc[2, "p50"] == 5.0


def test_window_key_is_timestamp_us(ray_session):
    """Window keys normalize to timestamp[us] whatever the source unit
    (Ray's Aggregate collapses a us key back to the source unit)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from stakgraph_ray.ops.relational import hopping_window, tumbling_window

    t = pa.table({"ts": pa.array(np.arange(10) * 4000, pa.timestamp("s")),
                  "v": pa.array(np.arange(10.0))})
    out = tumbling_window(rd.from_arrow(t), "ts", "hour", [],
                          [Count(alias_name="n")])
    tbl = pa.Table.from_pandas(out.to_pandas(), preserve_index=False)
    assert tbl.schema.field("window").type == pa.timestamp("us")
    out2 = hopping_window(rd.from_arrow(t), "ts", 7200, 3600, [],
                          [Count(alias_name="n")])
    tbl2 = pa.Table.from_pandas(out2.to_pandas(), preserve_index=False)
    assert tbl2.schema.field("window").type == pa.timestamp("us")


def test_grouped_quantile_disc_matches_duckdb(ray_session):
    """Discrete quantile = the element at max(ceil(q*n)-1, 0): float-exact
    vs DuckDB quantile_disc, all-null groups survive as null."""
    import duckdb
    import ray.data as rd

    from stakgraph_ray.ops.quantile import grouped_quantile_disc

    rng = np.random.RandomState(11)
    n = 400
    t = pa.table({
        "k": pa.array(rng.randint(0, 7, n), pa.int64()),
        "v": pa.array([None if i % 13 == 0 else float(rng.randn())
                       for i in range(n)], pa.float64()),
    })
    # plus one all-null group
    t = pa.concat_tables([t, pa.table({
        "k": pa.array([99, 99], pa.int64()),
        "v": pa.array([None, None], pa.float64())})])
    got = grouped_quantile_disc(rd.from_arrow(t), "k", "v", [0.5, 0.9],
                                ["p50", "p90"]) \
        .to_pandas().set_index("k").sort_index()
    con = duckdb.connect()
    want = con.sql(
        "select k, quantile_disc(v, 0.5) as p50, quantile_disc(v, 0.9) as p90 "
        "from t group by k order by k").df().set_index("k")
    assert list(got.index) == list(want.index)
    for c in ("p50", "p90"):
        same = (got[c].values == want[c].values) | \
               (pd.isna(got[c].values) & pd.isna(want[c].values))
        assert same.all(), c
    assert pd.isna(got.loc[99, "p50"])


def test_grouped_mad_matches_duckdb(ray_session):
    """MAD = median(|x - median(x)|), quantile_cont interpolation at both
    levels; nulls ignored, all-null groups survive as null."""
    import duckdb
    import ray.data as rd

    from stakgraph_ray.ops.quantile import grouped_mad

    rng = np.random.RandomState(21)
    n = 500
    t = pa.table({
        "k": pa.array(rng.randint(0, 9, n), pa.int64()),
        "v": pa.array([None if i % 17 == 0 else float(rng.randn() * 10)
                       for i in range(n)], pa.float64()),
    })
    t = pa.concat_tables([t, pa.table({
        "k": pa.array([50], pa.int64()), "v": pa.array([None], pa.float64())})])
    got = grouped_mad(rd.from_arrow(t), "k", "v", "m") \
        .to_pandas().set_index("k").sort_index()
    con = duckdb.connect()
    want = con.sql("select k, mad(v) as m from t group by k order by k") \
        .df().set_index("k")
    assert list(got.index) == list(want.index)
    same = (np.isclose(got.m.values.astype(float), want.m.values.astype(float),
                       rtol=0, atol=1e-12)) | \
           (pd.isna(got.m.values) & pd.isna(want.m.values))
    assert same.all()
    assert pd.isna(got.loc[50, "m"])


def test_new_grouped_ops_empty_input(ray_session):
    """Zero-row inputs flow through mad/disc-quantile without crashing
    (Ray emits empty blocks from filters/tiny files)."""
    import ray.data as rd

    from stakgraph_ray.ops.quantile import grouped_mad, grouped_quantile_disc

    t = pa.table({"k": pa.array([], pa.int64()),
                  "v": pa.array([], pa.float64())})
    assert grouped_mad(rd.from_arrow(t), "k", "v", "m").count() == 0
    assert grouped_quantile_disc(rd.from_arrow(t), "k", "v", [0.5],
                                 ["p"]).count() == 0


def test_bloom_no_false_negatives_and_merge(ray_session):
    import ray.data as rd

    from stakgraph_ray.ops.sketch import (bloom_batch_bits, bloom_build,
                                          bloom_might_contain)

    rng = np.random.RandomState(6)
    members = np.unique(rng.randint(0, 10**9, 5000).astype(np.int64))
    ds = rd.from_arrow(pa.table({"x": pa.array(members, pa.int64())}))
    bits = bloom_build(ds, "x", n_bits=1 << 16, k=4)
    # no false negatives, ever
    assert bloom_might_contain(bits, members, k=4).all()
    # FP rate bounded: ~ (1 - e^{-kn/m})^k ≈ 0.024 for n=5k, m=64k, k=4
    probes = np.unique(rng.randint(2 * 10**9, 3 * 10**9, 20000).astype(np.int64))
    fp = bloom_might_contain(bits, probes, k=4).mean()
    assert fp < 0.06, fp
    # mergeable: OR of two half-bitmaps == bitmap of the union
    a, b = members[:2000], members[2000:]
    merged = bloom_batch_bits(a, 1 << 16, 4) | bloom_batch_bits(b, 1 << 16, 4)
    assert (merged == bloom_batch_bits(members, 1 << 16, 4)).all()


def test_q5_broadcast_and_cogroup_paths_identical(ray_session, sf_tiny):
    """rel_local_supplier_volume's guarded dim-broadcast path (1 exchange)
    must equal the 3-exchange co-group fallback exactly."""
    from stakgraph_ray.pipelines.queries_rel import q_local_supplier_volume

    fast = q_local_supplier_volume(sf_tiny)
    slow = q_local_supplier_volume(sf_tiny, dim_broadcast_limit=0)
    assert fast.schema == slow.schema
    assert fast.to_pylist() == slow.to_pylist()
    assert fast.num_rows >= 1


def _write_q4_q17_dir(tmp_path):
    """Hand-built micro tables with known Q4/Q17 answers."""
    from datetime import datetime

    import pyarrow.parquet  # noqa: F401 — enables the pa.parquet accessor

    d = str(tmp_path)
    inside, outside = datetime(1996, 8, 15), datetime(1997, 3, 1)
    pa.parquet.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([inside, inside, inside, outside],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH",
                                     "1-URGENT"], pa.string()),
    }), f"{d}/orders.parquet")
    # order 1: has an R lineitem; order 2: only N; order 3: R; order 4: R
    # but outside the window. Q17 side: part 1 qty [1, 10] (only qty=1 is
    # < 0.2*avg: 5*1*2=10 < 11), part 2 qty [4,4,4] (none), part 3 other
    # brand (excluded).
    pa.parquet.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4, 1], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "R", "R", "N"],
                                 pa.string()),
        "l_partkey": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 4.0, 4.0, 4.0, 99.0],
                               pa.float64()),
        "l_extendedprice": pa.array([100.0, 5.0, 7.0, 7.0, 7.0, 1.0],
                                    pa.float64()),
    }), f"{d}/lineitem.parquet")
    pa.parquet.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#2"], pa.string()),
    }), f"{d}/part.parquet")
    return d


def test_order_priority_exists_semantics(ray_session, tmp_path):
    """Q4 shape: window gate + EXISTS semi join + priority count, verified
    against a hand-computed answer (order 1 and 3 qualify; 2 has no R
    lineitem; 4 is outside the date window)."""
    from stakgraph_ray.pipelines.queries_rel import q_order_priority_exists

    d = _write_q4_q17_dir(tmp_path)
    got = {r["o_orderpriority"]: r["order_count"]
           for r in q_order_priority_exists(d).take_all()}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_small_qty_revenue_exact_integer_filter(ray_session, tmp_path):
    """Q17 shape: the 0.2x-avg gate is exact integer arithmetic — qty=1 of
    part 1 (avg 5.5) qualifies, the uniform-qty part 2 contributes nothing,
    and the other-brand part 3 is excluded by the broadcast gate."""
    from stakgraph_ray.pipelines.queries_rel import q_small_qty_revenue

    d = _write_q4_q17_dir(tmp_path)
    out = q_small_qty_revenue(d).to_pylist()[0]
    assert out["n_small"] == 1
    assert out["avg_yearly"] == round(100.0 / 7.0, 2)


def test_full_outer_join_keeps_both_unmatched_sides(ray_session, tmp_path):
    """rel_full_outer_join: BUILDING customers with zero F orders survive
    (f_orders=0), F orders from non-BUILDING customers survive with a null
    c_name, and each custkey appears exactly once."""
    import pyarrow.parquet  # noqa: F401 — enables the pa.parquet accessor

    from stakgraph_ray.pipelines.queries_rel import q_building_f_orders_full

    d = str(tmp_path)
    pa.parquet.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["alice", "bob", "carol"], pa.string()),
        "c_mktsegment": pa.array(["BUILDING", "BUILDING", "OTHER"],
                                 pa.string()),
    }), f"{d}/customer.parquet")
    pa.parquet.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 2, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12, 13], pa.int64()),
        "o_orderstatus": pa.array(["P", "F", "F", "F"], pa.string()),
    }), f"{d}/orders.parquet")
    rows = {r["c_custkey"]: r for r in q_building_f_orders_full(d).take_all()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["c_name"] == "alice" and rows[1]["f_orders"] == 0
    assert rows[2]["c_name"] == "bob" and rows[2]["f_orders"] == 2
    assert rows[3]["c_name"] is None and rows[3]["f_orders"] == 1


def test_kmv_accuracy_merge_and_exact_tail(ray_session):
    """KMV sketch: (a) below k the count is exact, (b) above k the estimate
    is within the order-statistic error envelope (~1/sqrt(k)), (c) merging
    split summaries equals the whole-stream summary (any tree order)."""
    import ray.data as rd

    from stakgraph_ray.ops.sketch import (kmv_distinct_stable, kmv_merge,
                                          kmv_estimate_exact,
                                          _md5_hashes_distinct)

    # (a) exact below k
    small = pa.table({"x": pa.array(list(range(100)), pa.int64())})
    assert kmv_distinct_stable(rd.from_arrow(small), "x", k=256) == 100

    # (b) accuracy: 20k distinct ints, k=256 -> rel std err ~6.3%
    rng = np.random.RandomState(11)
    vals = np.unique(rng.randint(0, 10**12, 20000).astype(np.int64))
    ds = rd.from_arrow(pa.table({"x": pa.array(
        np.repeat(vals, 3), pa.int64())}))  # duplicates must not matter
    est = kmv_distinct_stable(ds, "x", k=256)
    assert abs(est - len(vals)) / len(vals) < 0.25, (est, len(vals))

    # (c) merge == whole, in either order
    h = np.sort(_md5_hashes_distinct(pa.array([str(v) for v in vals])))
    a, b = h[::2], h[1::2]
    whole = h[:256]
    m1 = kmv_merge(np.sort(a)[:256], np.sort(b)[:256], 256)
    m2 = kmv_merge(np.sort(b)[:256], np.sort(a)[:256], 256)
    assert (m1 == whole).all() and (m2 == whole).all()
    assert kmv_estimate_exact(m1, 256) == kmv_estimate_exact(whole, 256)
