"""Planted-corpus semantics for the remaining round-5 entries that had only
SQL-oracle coverage: KMV grouped distinct, term-degree histogram, sequence
packing, TPC-H Q8/Q9/Q10 branch logic, equi-depth histogram edges, and the
Lloyd centroid update."""

from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def _docs(tmp_path, texts):
    n = len(texts)
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))


def _nations(tmp_path, n=25):
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array(list(range(n)), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(n)], pa.int32())}))


def test_kmv_grouped_distinct_exact_under_k(ray_session, tmp_path):
    """Fewer than k distinct values per group -> the KMV estimate is the
    exact distinct count; null custkeys are not counted."""
    from stakgraph_ray.pipelines.queries_dedup import q_kmv_distinct

    _write(tmp_path, "orders", pa.table({
        "o_orderstatus": pa.array(["O", "O", "O", "O", "F", "F", "O"],
                                  pa.string()),
        "o_custkey": pa.array([1, 2, 3, 3, 1, 2, None], pa.int64())}))
    out = {r["o_orderstatus"]: r["approx_distinct_custkeys"]
           for r in q_kmv_distinct(str(tmp_path)).to_pylist()}
    assert out == {"O": 3, "F": 2}


def test_term_degree_histogram_clique_and_chain(ray_session, tmp_path):
    """A 4-clique walk yields four degree-3 nodes; a 2-token chain yields
    two degree-1 nodes — histogram rows (1, 2) and (3, 4)."""
    from stakgraph_ray.pipelines.queries_kg import q_term_degree_histogram

    clique = "alpha beta gamma delta alpha gamma beta delta"
    chain = "epsilon zeta"
    _docs(tmp_path, [clique, chain])
    out = q_term_degree_histogram(str(tmp_path)).to_pylist()
    assert out == [{"degree": 1, "n_nodes": 2}, {"degree": 3, "n_nodes": 4}]


def test_pack_sequences_bin_spanning(ray_session, tmp_path):
    """A doc that straddles the 2048-token boundary spans bins 0-1; the
    next doc starts inside bin 1."""
    from stakgraph_ray.pipelines.queries_llm import q_pack_sequences

    _docs(tmp_path, [" ".join(["w"] * 2047), "a b c", "x"])
    rows = {r["doc_id"]: r for r in
            q_pack_sequences(str(tmp_path)).take_all()}
    assert rows[1] == {"doc_id": 1, "n_tokens": 2047,
                       "start_bin": 0, "end_bin": 0}
    assert rows[2] == {"doc_id": 2, "n_tokens": 3,
                       "start_bin": 0, "end_bin": 1}
    assert rows[3] == {"doc_id": 3, "n_tokens": 1,
                       "start_bin": 1, "end_bin": 1}


def test_market_share_target_vs_total(ray_session, tmp_path):
    """Q8: only PROMO parts sold to ASIA-region customers count; the share
    is the target nation's supplier volume over the total, per year."""
    from stakgraph_ray.pipelines.queries_rel import q_market_share

    _nations(tmp_path)
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE", "AFRICA", "AMERICA",
                            "MIDDLE EAST"], pa.string())}))
    # nation 5 has n_regionkey 0 = ASIA; nation 1 has regionkey 1 (not ASIA)
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_nationkey": pa.array([5, 1], pa.int32())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([3, 8], pa.int32())}))   # 1 is the target
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([100, 200], pa.int64()),
        "p_type": pa.array(["PROMO", "OTHER"], pa.string())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([7, 8, 9], pa.int64()),
        "o_custkey": pa.array([10, 10, 20], pa.int64()),
        "o_orderdate": pa.array([datetime(1996, 5, 1),
                                 datetime(1997, 5, 1),
                                 datetime(1996, 5, 1)], pa.timestamp("us"))}))
    _write(tmp_path, "lineitem", pa.table({
        # o7: target 100 + other-supp 300 -> 1996 share 0.25
        # o8: target 200 alone -> 1997 share 1.0
        # non-promo part on o7: excluded; o9 (non-ASIA cust): excluded
        "l_orderkey": pa.array([7, 7, 8, 7, 9], pa.int64()),
        "l_partkey": pa.array([100, 100, 100, 200, 100], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 1, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0, 200.0, 999.0, 555.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64())}))
    out = q_market_share(str(tmp_path)).to_pylist()
    assert out == [{"o_year": 1996, "mkt_share": 0.25},
                   {"o_year": 1997, "mkt_share": 1.0}]


def test_product_profit_like_gate_and_rollup(ray_session, tmp_path):
    """Q9: only parts whose name contains the token count; profit rolls up
    by (supplier nation, order year) in exact cents."""
    from stakgraph_ray.pipelines.queries_rel import q_product_profit

    _nations(tmp_path)
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_name": pa.array(["blue widget", "red gadget"], pa.string())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([2, 4], pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([7, 8], pa.int64()),
        "o_orderdate": pa.array([datetime(1996, 5, 1),
                                 datetime(1997, 5, 1)], pa.timestamp("us"))}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([7, 7, 8], pa.int64()),
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([100.0, 999.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.1], pa.float64())}))
    out = q_product_profit(str(tmp_path)).to_pylist()
    assert out == [
        {"nation": "NATION_2", "o_year": 1996, "sum_profit": 100.0},
        {"nation": "NATION_4", "o_year": 1997, "sum_profit": 45.0}]


def test_returned_item_revenue_gates_and_attrs(ray_session, tmp_path):
    """Q10: only R-flag lineitems on orders inside the H1-1996 window
    count; the winner row carries the customer's name/balance/nation."""
    from stakgraph_ray.pipelines.queries_rel import q_returned_item_revenue

    _nations(tmp_path)
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["cust-ten", "cust-twenty"], pa.string()),
        "c_acctbal": pa.array([12.5, 99.0], pa.float64()),
        "c_nationkey": pa.array([2, 3], pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([7, 8], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderdate": pa.array([datetime(1996, 2, 1),
                                 datetime(1996, 9, 1)],   # outside window
                                pa.timestamp("us"))}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([7, 7, 8], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R"], pa.string()),
        "l_extendedprice": pa.array([100.0, 999.0, 555.0], pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64())}))
    out = q_returned_item_revenue(str(tmp_path)).to_pylist()
    assert out == [{"c_custkey": 10, "c_name": "cust-ten",
                    "revenue": 100.0, "c_acctbal": 12.5,
                    "n_name": "NATION_2"}]


def test_equidepth_histogram_edges_and_counts(ray_session, tmp_path):
    """8 evenly spread values -> the 7 interpolated octile edges put
    exactly one row in each band."""
    from stakgraph_ray.pipelines.queries_rel import q_price_histogram_equidepth

    vals = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]
    _write(tmp_path, "lineitem", pa.table({
        "l_extendedprice": pa.array(vals, pa.float64())}))
    out = q_price_histogram_equidepth(str(tmp_path)).to_pylist()
    edges = np.round(np.quantile(np.asarray(vals), [i / 8 for i in
                                                    range(1, 8)]), 2)
    lo = np.concatenate(([-np.inf], edges))
    hi = np.concatenate((edges, [np.inf]))
    assert [r["n"] for r in out] == [1] * 8
    assert [r["bin"] for r in out] == list(range(8))
    assert [r["lo"] for r in out] == list(lo)
    assert [r["hi"] for r in out] == list(hi)


def test_centroid_update_means_and_counts(ray_session, tmp_path):
    """Anchors assign to themselves; a duplicate of anchor 0 doubles its
    cluster count without moving the centroid."""
    from stakgraph_ray.pipelines.queries_dedup import q_centroid_update

    d = 8
    ids, vecs = [], []
    for i in range(8):                     # anchors: one-hot e_i
        ids.append(i)
        vecs.append([1.0 if j == i else 0.0 for j in range(d)])
    ids.append(10)                         # duplicate of anchor 0
    vecs.append(vecs[0])
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64()))}))
    out = q_centroid_update(str(tmp_path)).to_pylist()
    assert len(out) == 8 * d
    for r in out:
        want_n = 2 if r["cluster"] == 0 else 1
        assert r["n"] == want_n
        want = 1.0 if r["dim"] == r["cluster"] + 1 else 0.0
        assert r["centroid"] == want
