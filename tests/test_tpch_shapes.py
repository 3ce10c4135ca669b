"""Semantic tests for the TPC-H Q14/Q18/Q19/Q22 shapes, the similarity
range search, and the linear quality classifier — planted tiny corpora with
hand-computed expectations (the DuckDB oracles cover value parity at scale;
these pin the operator semantics: thresholds, branch logic, exclusions)."""

import math
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def test_promo_revenue_conditional_share(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_promo_revenue

    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"], pa.string())}))
    # rows: in-window promo 100@0% disc, in-window standard 300@50%,
    # out-of-window promo 999 (ignored)
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 2, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0, 999.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.5, 0.0], pa.float64()),
        "l_shipdate": pa.array([datetime(1997, 2, 1), datetime(1997, 3, 1),
                                datetime(1998, 1, 1)],
                               pa.timestamp("us"))}))
    row = q_promo_revenue(str(tmp_path)).take_all()[0]
    # promo 100 of total 250 -> 40%
    assert row["promo_pct"] == pytest.approx(40.0)
    assert row["total_rev"] == pytest.approx(250.0)


def test_disjunctive_revenue_branch_logic(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_disjunctive_revenue

    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#9"], pa.string()),
        "p_size": pa.array([10, 20, 10], pa.int32())}))
    _write(tmp_path, "lineitem", pa.table({
        # part 1: qty 20 in-branch-1; qty 21 out of branch 1 qty range
        # part 2: qty 30 in branch 2; part 3: brand matches no branch
        # partkey 99: no part row at all (inner-join drop)
        "l_partkey": pa.array([1, 1, 2, 3, 99], pa.int64()),
        "l_quantity": pa.array([20.0, 21.0, 30.0, 20.0, 20.0], pa.float64()),
        "l_extendedprice": pa.array([10.0, 100.0, 7.0, 1000.0, 1000.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0] * 5, pa.float64())}))
    row = q_disjunctive_revenue(str(tmp_path)).take_all()[0]
    assert row["n_rows"] == 2 and row["revenue"] == pytest.approx(17.0)


def test_large_orders_having_threshold_is_strict(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_large_orders

    # order 1 sums to exactly 250 (excluded); order 2 sums to 251 (kept)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_quantity": pa.array([100.0, 150.0, 200.0, 51.0], pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([7, 8], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
        "o_orderdate": pa.array([datetime(1999, 1, 1)] * 2,
                                pa.timestamp("us"))}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([7, 8], pa.int64()),
        "c_name": pa.array(["c7", "c8"], pa.string())}))
    rows = q_large_orders(str(tmp_path)).take_all()
    assert [(r["o_orderkey"], r["c_name"], r["total_qty"])
            for r in rows] == [(2, "c8", 251.0)]


def test_idle_customer_balance_gates(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_idle_customer_balance

    # positive balances: 100.00, 200.00, 300.00 -> avg 200.00 exactly.
    # cust 1 (100) below avg; cust 2 (200) AT avg (strict > excludes);
    # cust 3 (300) above but has a recent order; cust 4 (300) above + idle;
    # cust 5 negative balance (not in avg, never passes the gate)
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 1, 1], pa.int32()),
        "c_acctbal": pa.array([100.0, 200.0, 300.0, 300.0, -50.0],
                              pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([3, 4], pa.int64()),
        "o_orderdate": pa.array([datetime(2001, 1, 1),
                                 datetime(1999, 1, 1)],  # cust 4: old only
                                pa.timestamp("us"))}))
    rows = q_idle_customer_balance(str(tmp_path)).take_all()
    assert rows == [{"c_nationkey": 1, "n_cust": 1, "sum_bal": 300.0}]


def test_range_search_threshold_and_self_match(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_range_search

    q = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    near = np.array([1.0, 0.1, 0.0, 0.0], np.float32)   # cos ~0.995
    orth = np.array([0.0, 1.0, 0.0, 0.0], np.float32)   # cos 0
    mid = np.array([1.0, 3.0, 0.0, 0.0], np.float32)    # cos ~0.316
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([0, 10, 11, 12], pa.int64()),
        "embedding": pa.array([q.tolist(), near.tolist(), orth.tolist(),
                               mid.tolist()],
                              pa.list_(pa.float32()))}))
    rows = q_range_search(str(tmp_path)).take_all()
    got = {(r["query_id"], r["neighbor_id"]): r["cos"] for r in rows}
    assert set(got) == {(0, 0), (0, 10), (0, 12)}   # orth excluded
    assert got[(0, 0)] == pytest.approx(1.0)
    assert got[(0, 12)] == pytest.approx(1 / math.sqrt(10), abs=1e-4)


def test_quality_logit_score_and_gate(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_quality_logit

    # doc 0: 100 tokens, none stop -> z = -0.1 + 0.4 = 0.3 > 0
    # doc 1: "the a" -> nt=2, sr=1 -> z = -0.1 + 0.008 - 1.5 < 0
    long = " ".join(f"w{i}" for i in range(100))
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([long, "the a"], pa.string())}))
    rows = sorted(q_quality_logit(str(tmp_path)).take_all(),
                  key=lambda r: r["doc_id"])
    assert rows[0]["n_tokens"] == 100 and rows[0]["quality_pass"]
    assert rows[0]["z"] == pytest.approx(0.3)
    assert rows[1]["n_tokens"] == 2 and not rows[1]["quality_pass"]
    assert rows[1]["z"] == pytest.approx(round(-0.1 + 0.008 - 1.5, 4))


def test_moving_avg_range_frame_semantics(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_moving_avg

    d0 = datetime(2024, 1, 10)
    rows = [  # user 1: t0, t0+1d (both in one 3d window), t0+5d (alone);
              # user 2: two events at the SAME ts (RANGE peers: both frames
              # include both rows)
        (1, datetime(2024, 1, 10), 100.0),
        (1, datetime(2024, 1, 11), 200.0),
        (1, datetime(2024, 1, 15), 400.0),
        (2, d0, 10.0),
        (2, d0, 30.0),
    ]
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64())}))
    got = sorted(
        ((r["user_id"], r["ts"], r["n_window"], r["win_sum"], r["win_avg"])
         for r in q_moving_avg(str(tmp_path)).take_all()))
    assert got == [
        (1, datetime(2024, 1, 10), 1, 100.0, 100.0),
        (1, datetime(2024, 1, 11), 2, 300.0, 150.0),
        (1, datetime(2024, 1, 15), 1, 400.0, 400.0),
        (2, d0, 2, 40.0, 20.0),
        (2, d0, 2, 40.0, 20.0),
    ]


def test_ngram_novelty_first_doc_wins(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_ngram_novelty

    base = " ".join(f"w{i}" for i in range(10))       # 8 shingles, all novel
    uniq = " ".join(f"u{i}" for i in range(5))        # 3 novel shingles
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([base, base, uniq, "too short"], pa.string())}))
    got = {r["doc_id"]: (r["n_novel"], r["n_shingles"], r["novelty"])
           for r in q_ngram_novelty(str(tmp_path)).take_all()}
    assert got[0] == (8, 8, 1.0)       # first occurrence of everything
    assert got[1] == (0, 8, 0.0)       # exact copy: nothing novel
    assert got[2] == (3, 3, 1.0)
    assert 3 not in got                # < 3 tokens -> no shingles


def test_domain_temperature_sqrt_scaling(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_domain_temperature

    _write(tmp_path, "documents", pa.table({
        "source": pa.array(["big"] * 100 + ["small"] * 25, pa.string())}))
    got = {r["source"]: (r["n_docs"], r["temp_ratio"], r["target_per_10k"])
           for r in q_domain_temperature(str(tmp_path)).take_all()}
    assert got == {"big": (100, 1.0, 10000), "small": (25, 0.5, 5000)}
