"""Planted-corpus semantic tests for the round-5 TPC-H shapes (Q6/Q7/Q13/
Q15/Q21) and the new curation gates — the DuckDB oracles prove value parity
at scale; these pin the branch logic: pair direction, zero buckets, max
ties, sole-blame exclusions, rule thresholds."""

import math
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def _nations(tmp_path, n=25):
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array(list(range(n)), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(n)], pa.string()),
        "n_regionkey": pa.array([i % 5 for i in range(n)], pa.int32())}))


def test_nation_trade_volume_pair_direction(ray_session, tmp_path):
    """Same-nation rows are excluded; both cross directions are kept and
    keyed by the SUPPLIER nation first."""
    from stakgraph_ray.pipelines.queries_rel import q_nation_trade_volume

    _nations(tmp_path)
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_nationkey": pa.array([3, 8], pa.int32()),
        "s_name": pa.array(["s1", "s2"], pa.string()),
        "s_acctbal": pa.array([0.0, 0.0], pa.float64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
        "c_name": pa.array(["c10", "c20"], pa.string()),
        "c_nationkey": pa.array([8, 3], pa.int32()),
        "c_acctbal": pa.array([0.0, 0.0], pa.float64()),
        "c_mktsegment": pa.array(["B", "B"], pa.string())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([100, 200], pa.int64()),
        "o_custkey": pa.array([10, 20], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([0.0, 0.0], pa.float64()),
        "o_orderdate": pa.array([datetime(1996, 2, 1)] * 2,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["3-MEDIUM"] * 2, pa.string())}))
    # supp nation 3 -> cust nation 8 (order 100); supp 8 -> cust 3 (200);
    # plus a same-nation line (supp 2 nation 8 on order 100 cust nation 8):
    # must be dropped; plus an out-of-window line: dropped.
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([100, 200, 100, 100], pa.int64()),
        "l_partkey": pa.array([1] * 4, pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1, 2, 3], pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([100.0, 200.0, 400.0, 800.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_shipdate": pa.array([datetime(1996, 3, 1), datetime(1997, 3, 1),
                                datetime(1996, 3, 1), datetime(1999, 1, 1)],
                               pa.timestamp("us"))}))
    out = q_nation_trade_volume(str(tmp_path)).to_pylist()
    assert out == [
        {"supp_nation": "NATION_3", "cust_nation": "NATION_8",
         "l_year": 1996, "revenue": 100.0},
        {"supp_nation": "NATION_8", "cust_nation": "NATION_3",
         "l_year": 1997, "revenue": 200.0}]


def test_customer_order_distribution_zero_bucket(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import (
        q_customer_order_distribution)

    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_name": pa.array(["a", "b", "c"], pa.string()),
        "c_nationkey": pa.array([0, 0, 0], pa.int32()),
        "c_acctbal": pa.array([0.0] * 3, pa.float64()),
        "c_mktsegment": pa.array(["B"] * 3, pa.string())}))
    # cust 1: two kept orders; cust 2: one URGENT (filtered -> zero);
    # cust 3: no orders at all (zero bucket)
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([0.0] * 3, pa.float64()),
        "o_orderdate": pa.array([datetime(1996, 1, 1)] * 3,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["3-MEDIUM", "5-LOW", "1-URGENT"],
                                    pa.string())}))
    out = q_customer_order_distribution(str(tmp_path)).to_pylist()
    assert out == [{"c_count": 0, "custdist": 2},
                   {"c_count": 2, "custdist": 1}]


def test_sole_blame_supplier_exclusions(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_sole_blame_supplier

    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 0, 0], pa.int32()),
        "s_name": pa.array(["SUPP_1", "SUPP_2", "SUPP_3"], pa.string()),
        "s_acctbal": pa.array([0.0] * 3, pa.float64())}))

    def li(orderkey, suppkey, flag):
        return (orderkey, suppkey, flag)

    rows = [
        # order 1: suppliers {1,2}, only supplier 1 has an R -> blame 1
        li(1, 1, "R"), li(1, 2, "N"),
        # order 2: single supplier with R -> excluded (needs >=2 suppliers)
        li(2, 1, "R"),
        # order 3: two suppliers BOTH with R -> excluded (not sole)
        li(3, 1, "R"), li(3, 2, "R"),
        # order 4: suppliers {2,3}, supplier 3 sole R (two R lines, one
        # distinct R supplier) -> blame 3
        li(4, 3, "R"), li(4, 3, "R"), li(4, 2, "A"),
    ]
    ok, sk, fl = zip(*rows)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(list(range(len(rows))), pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([1.0] * len(rows), pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(fl, pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([datetime(1996, 1, 1)] * len(rows),
                               pa.timestamp("us"))}))
    out = q_sole_blame_supplier(str(tmp_path)).to_pylist()
    assert out == [{"s_name": "SUPP_1", "blame_ct": 1},
                   {"s_name": "SUPP_3", "blame_ct": 1}]


def test_top_supplier_keeps_max_ties(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_top_supplier

    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 0, 0], pa.int32()),
        "s_name": pa.array(["SUPP_1", "SUPP_2", "SUPP_3"], pa.string()),
        "s_acctbal": pa.array([0.0] * 3, pa.float64())}))
    # suppliers 1 and 2 tie at 50.0; supplier 3 lower; out-of-window big
    # line for supplier 3 must not count
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_partkey": pa.array([1] * 4, pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 3], pa.int64()),
        "l_linenumber": pa.array([1] * 4, pa.int32()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([50.0, 50.0, 10.0, 9999.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_shipdate": pa.array([datetime(1996, 2, 1), datetime(1996, 2, 1),
                                datetime(1996, 2, 1), datetime(1997, 1, 1)],
                               pa.timestamp("us"))}))
    out = q_top_supplier(str(tmp_path)).to_pylist()
    assert out == [
        {"s_suppkey": 1, "s_name": "SUPP_1", "total_revenue": 50.0},
        {"s_suppkey": 2, "s_name": "SUPP_2", "total_revenue": 50.0}]


def test_gopher_rules_thresholds(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_gopher_rules

    good = " ".join((["the", "a"] + ["spark"] * 38))       # 40 toks, 2 stops
    short = "the a spark"                                  # under word count
    no_stops = " ".join(["spark"] * 50)                    # 0 stop hits
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([good, short, no_stops], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([len(good), len(short), len(no_stops)],
                            pa.int64())}))
    out = {r["doc_id"]: r for r in
           q_gopher_rules(str(tmp_path)).take_all()}
    assert out[1]["keep"] is True and out[1]["stop_hits"] == 2
    assert out[2]["keep"] is False          # word count below 40
    assert out[3]["keep"] is False          # no stop words
    assert out[1]["n_tokens"] == 40


def test_unigram_logprob_hand_computed(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_unigram_logprob

    # corpus: doc1 = "x x y", doc2 = "y" -> counts x:2 y:2, N=4,
    # logp(x)=logp(y)=ln(2)-ln(4)=-ln 2
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["x x y", "y"], pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
        "source": pa.array(["s"] * 2, pa.string()),
        "n_chars": pa.array([5, 1], pa.int64())}))
    out = {r["doc_id"]: r for r in
           q_unigram_logprob(str(tmp_path)).take_all()}
    expect = round(-math.log(2.0), 4)
    assert out[1]["mean_logprob"] == pytest.approx(expect, abs=1e-9)
    assert out[2]["mean_logprob"] == pytest.approx(expect, abs=1e-9)
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1


def test_li_orders_family_empty_window(ray_session, tmp_path):
    """All lineitems outside the date window: the family must return
    schema-pinned EMPTY (or zero-valued) results, not crash on schema-less
    empty blocks (the repo's known Ray empty-block hazard)."""
    from stakgraph_ray.pipelines.queries_rel import (
        q_forecast_revenue, q_priority_line_counts)

    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderstatus": pa.array(["F"], pa.string()),
        "o_totalprice": pa.array([1.0], pa.float64()),
        "o_orderdate": pa.array([datetime(1990, 1, 1)], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_partkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_linenumber": pa.array([1], pa.int32()),
        "l_quantity": pa.array([1.0], pa.float64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.06], pa.float64()),
        "l_tax": pa.array([0.0], pa.float64()),
        "l_returnflag": pa.array(["N"], pa.string()),
        "l_linestatus": pa.array(["O"], pa.string()),
        "l_shipdate": pa.array([datetime(1990, 6, 1)],  # outside every window
                               pa.timestamp("us"))}))
    plc = q_priority_line_counts(str(tmp_path))
    assert plc.num_rows == 0
    assert plc.column_names == ["l_returnflag", "high_line_count",
                                "low_line_count"]
    fr = q_forecast_revenue(str(tmp_path)).to_pylist()
    assert fr == [{"revenue": 0.0}]


def test_top_supplier_empty_window(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_top_supplier

    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_nationkey": pa.array([0], pa.int32()),
        "s_name": pa.array(["SUPP_1"], pa.string()),
        "s_acctbal": pa.array([0.0], pa.float64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_suppkey": pa.array([1], pa.int64()),
        "l_extendedprice": pa.array([10.0], pa.float64()),
        "l_discount": pa.array([0.0], pa.float64()),
        "l_shipdate": pa.array([datetime(1990, 1, 1)],  # outside Q1-1996
                               pa.timestamp("us"))}))
    out = q_top_supplier(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["s_suppkey", "s_name", "total_revenue"]
