"""Relational / windowed / text-analysis queries over the TPC-H-ish testdata
tables, exercising each operator family from SURVEY.md §2.4-2.7 with a DuckDB
oracle."""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..ops.relational import (anti_join, broadcast_join, first_per_group,
                              running_sum, semi_join, sessionize,
                              tumbling_window, top_k)


def _read(sf_dir: str, table: str, columns=None, **kw):
    import ray.data as rd

    from ..util import adaptive_num_blocks

    path = f"{sf_dir}/{table}.parquet"
    kw.setdefault("override_num_blocks", adaptive_num_blocks(path))
    return rd.read_parquet(path, columns=columns, **kw)


def _round_cols(t: pa.Table, cols: dict[str, int]) -> pa.Table:
    # see util.round_half_away — the one DuckDB-round-compatible kernel
    from ..util import round_half_away

    for c, nd in cols.items():
        x = pc.cast(t[c], pa.float64()).to_numpy(zero_copy_only=False)
        t = t.set_column(t.column_names.index(c), c,
                         pa.array(round_half_away(x, nd), pa.float64()))
    return t


# ------------------------------------------------------------ aggregations

def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with a computed column; the
    partial-then-final aggregation pattern (stats rollup,
    cf. /root/reference/ast/src/builder/utils.rs:61-74)."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("rev", rev)

    out = low_card_aggregate(
        ds.map_batches(revenue, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("l_quantity", "sum"), ("l_extendedprice", "sum"),
         ("rev", "sum"), (None, "count_all")],
        ["sum_qty", "sum_base_price", "sum_revenue", "n_rows"])
    return out.map_batches(
        lambda t: _round_cols(t, {"sum_qty": 2, "sum_base_price": 2,
                                  "sum_revenue": 2}),
        batch_format="pyarrow")


SQL_PRICING = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty,
       round(sum(l_extendedprice), 2) as sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_revenue,
       count(*) as n_rows
from lineitem group by l_returnflag, l_linestatus
"""


def q_pricing_rollup(sf_dir: str):
    """GROUP BY ROLLUP — the OLAP multi-level total: (flag, status) cells,
    per-flag subtotals, grand total, distinguished by null level columns.
    Each level is one per-batch combiner aggregate (no shuffle — the levels
    reuse the same partials shape), unioned with null-filled keys; at any
    scale the output is bounded by the dimension cardinality."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"]) \
        .materialize()  # three level aggregates share one scan

    spec = [("l_quantity", "sum"), (None, "count_all")]
    names = ["sum_qty", "n_rows"]
    cells = low_card_aggregate(ds, ["l_returnflag", "l_linestatus"], spec, names)
    flags = low_card_aggregate(ds, "l_returnflag", spec, names)
    total = low_card_aggregate(
        ds.map_batches(lambda t: t.append_column(
            "_all", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow"),
        "_all", spec, names)

    def lvl_cells(t: pa.Table) -> pa.Table:
        return _round_cols(t, {"sum_qty": 2})

    def lvl_flags(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_qty": 2})
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "l_linestatus": pa.nulls(t.num_rows, pa.string()),
                         "sum_qty": t["sum_qty"], "n_rows": t["n_rows"]})

    def lvl_total(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_qty": 2})
        return pa.table({"l_returnflag": pa.nulls(t.num_rows, pa.string()),
                         "l_linestatus": pa.nulls(t.num_rows, pa.string()),
                         "sum_qty": t["sum_qty"], "n_rows": t["n_rows"]})

    return cells.map_batches(lvl_cells, batch_format="pyarrow").union(
        flags.map_batches(lvl_flags, batch_format="pyarrow"),
        total.map_batches(lvl_total, batch_format="pyarrow"))


SQL_PRICING_ROLLUP = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty, count(*) as n_rows
from lineitem
group by rollup(l_returnflag, l_linestatus)
"""


def q_pricing_cube(sf_dir: str):
    """GROUP BY CUBE — all four grouping sets over (flag, status): the
    rollup's levels plus the per-status slice. Four per-batch combiner
    aggregates over one shared scan, null-filled union; output bounded by
    the dimension cardinality at any corpus size."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity"]) \
        .materialize()  # four level aggregates share one scan

    spec = [("l_quantity", "sum"), (None, "count_all")]
    names = ["sum_qty", "n_rows"]
    cells = low_card_aggregate(ds, ["l_returnflag", "l_linestatus"], spec, names)
    flags = low_card_aggregate(ds, "l_returnflag", spec, names)
    stats = low_card_aggregate(ds, "l_linestatus", spec, names)
    total = low_card_aggregate(
        ds.map_batches(lambda t: t.append_column(
            "_all", pa.array(np.zeros(t.num_rows, np.int8))),
            batch_format="pyarrow"),
        "_all", spec, names)

    def shape(flag_col, stat_col):
        def f(t: pa.Table) -> pa.Table:
            t = _round_cols(t, {"sum_qty": 2})
            n = t.num_rows
            return pa.table({
                "l_returnflag": t[flag_col] if flag_col else pa.nulls(n, pa.string()),
                "l_linestatus": t[stat_col] if stat_col else pa.nulls(n, pa.string()),
                "sum_qty": t["sum_qty"], "n_rows": t["n_rows"]})
        return f

    return cells.map_batches(shape("l_returnflag", "l_linestatus"),
                             batch_format="pyarrow").union(
        flags.map_batches(shape("l_returnflag", None), batch_format="pyarrow"),
        stats.map_batches(shape(None, "l_linestatus"), batch_format="pyarrow"),
        total.map_batches(shape(None, None), batch_format="pyarrow"))


SQL_PRICING_CUBE = """
select l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) as sum_qty, count(*) as n_rows
from lineitem
group by cube(l_returnflag, l_linestatus)
"""


def q_priority_mode(sf_dir: str):
    """Grouped MODE with a deterministic tie-break (most frequent order
    priority per status, ties -> lexicographically smallest): per-batch
    (status, priority) count combiner — both dims low-card, so at most
    |status|x|priority| rows cross the driver merge — then a vectorized
    per-status argmax."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
    counts = low_card_aggregate(ds, ["o_orderstatus", "o_orderpriority"],
                                [(None, "count_all")], ["n"])

    def pick(t: pa.Table) -> pa.Table:
        from ..ops.relational import _key_change_mask

        t = t.sort_by([("o_orderstatus", "ascending"), ("n", "descending"),
                       ("o_orderpriority", "ascending")])
        mask = _key_change_mask(t, ["o_orderstatus"])
        head = pa.array(np.flatnonzero(mask), pa.int64())
        return pa.table({
            "o_orderstatus": pc.take(t["o_orderstatus"], head),
            "mode_priority": pc.take(t["o_orderpriority"], head),
            "n": pc.take(t["n"], head)})

    # the combiner output is dimension-bounded AND single-block
    # (low_card_aggregate ends in from_arrow); batch_size=None makes the
    # cross-row argmax see the whole table even if the group count ever
    # exceeded the default map_batches batch size
    return counts.map_batches(pick, batch_format="pyarrow", batch_size=None)


SQL_PRIORITY_MODE = """
select o_orderstatus, o_orderpriority as mode_priority, n
from (select o_orderstatus, o_orderpriority, count(*) as n,
             row_number() over (partition by o_orderstatus
                                order by count(*) desc, o_orderpriority) as rn
      from orders group by 1, 2)
where rn = 1
"""


def q_qty_price_correlation(sf_dir: str):
    """Grouped Pearson correlation + sample covariance via the
    sums/sums-of-squares/cross-sum combiner (one pure-map pass, no
    shuffle): corr(l_quantity, l_extendedprice) per return flag. Matches
    DuckDB corr()/covar_samp() at 4 decimals (same 4-decimal contract as
    the stddev combiner)."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        x = t["l_quantity"]
        y = t["l_extendedprice"]
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "x": x, "y": y,
            "xx": pc.multiply(x, x), "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y)})

    agg = low_card_aggregate(
        ds.map_batches(moments, batch_format="pyarrow"), "l_returnflag",
        [(None, "count_all"), ("x", "sum"), ("y", "sum"),
         ("xx", "sum"), ("yy", "sum"), ("xy", "sum")],
        ["n", "sx", "sy", "sxx", "syy", "sxy"])

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        n = pc.cast(t["n"], pa.float64()).to_numpy(zero_copy_only=False)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        cov = (sxy - sx * sy / n) / np.maximum(n - 1, 1)
        vx = (sxx - sx * sx / n) / np.maximum(n - 1, 1)
        vy = (syy - sy * sy / n) / np.maximum(n - 1, 1)
        corr = cov / np.sqrt(vx * vy)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": t["n"],
            "covar": pa.array(round_half_away(cov, 4), pa.float64()),
            "corr": pa.array(round_half_away(corr, 4), pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_QTY_PRICE_CORR = """
select l_returnflag, count(*) as n,
       round(covar_samp(l_quantity, l_extendedprice), 4) as covar,
       round(corr(l_quantity, l_extendedprice), 4) as corr
from lineitem group by l_returnflag
"""


def q_nation_balance_stats(sf_dir: str):
    """Grouped variance/stddev via the sum/sum-of-squares combiner (one
    pure-map pass, no shuffle): avg and stddev_samp per nation. The
    two-pass textbook formula is fine here because the oracle comparison is
    at 4 decimals (DuckDB's Welford accumulation differs only in low-order
    bits at this scale)."""
    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    ds = ds.map_batches(
        lambda t: t.append_column("sq", pc.multiply(t["c_acctbal"],
                                                    t["c_acctbal"])),
        batch_format="pyarrow")
    agg = low_card_aggregate(ds, "c_nationkey",
                             [(None, "count_all"), ("c_acctbal", "sum"),
                              ("sq", "sum")], ["n", "s", "ss"])

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.float64()).to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        ss = t["ss"].to_numpy(zero_copy_only=False)
        avg = s / n
        var = (ss - s * s / n) / np.maximum(n - 1, 1)
        return pa.table({
            "c_nationkey": t["c_nationkey"],
            "n_customers": t["n"],
            "avg_acctbal": pa.array(round_half_away(avg, 4), pa.float64()),
            "std_acctbal": pa.array(round_half_away(np.sqrt(np.maximum(var, 0)), 4),
                                    pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_NATION_BALANCE_STATS = """
select cast(c_nationkey as bigint) as c_nationkey, count(*) as n_customers,
       round(avg(c_acctbal), 4) as avg_acctbal,
       round(stddev_samp(c_acctbal), 4) as std_acctbal
from customer group by c_nationkey
"""


def q_region_rollup(sf_dir: str):
    """Broadcast dimension joins (customer ⋈ nation ⋈ region) + rollup."""
    from ..ops.partition import low_card_aggregate

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    dim = nation.join(region, keys=["n_regionkey"], right_keys=["r_regionkey"])
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    ds = broadcast_join(ds, dim.select(["n_nationkey", "r_name"]),
                        keys="c_nationkey", right_keys="n_nationkey")
    out = low_card_aggregate(ds, "r_name",
                             [(None, "count_all"), ("c_acctbal", "sum")],
                             ["n_customers", "sum_acctbal"])
    return out.map_batches(lambda t: _round_cols(t, {"sum_acctbal": 2}),
                           batch_format="pyarrow")


SQL_REGION_ROLLUP = """
select r_name, count(*) as n_customers, round(sum(c_acctbal), 2) as sum_acctbal
from customer join nation on c_nationkey = n_nationkey
              join region on n_regionkey = r_regionkey
group by r_name
"""


def q_nation_customers(sf_dir: str):
    from ..ops.partition import low_card_aggregate

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    ds = broadcast_join(ds, nation, keys="c_nationkey", right_keys="n_nationkey")
    out = low_card_aggregate(ds, "n_name",
                             [(None, "count_all"), ("c_acctbal", "mean")],
                             ["n_customers", "avg_acctbal"])
    return out.map_batches(lambda t: _round_cols(t, {"avg_acctbal": 4}),
                           batch_format="pyarrow")


SQL_NATION_CUSTOMERS = """
select n_name, count(*) as n_customers, round(avg(c_acctbal), 4) as avg_acctbal
from customer join nation on c_nationkey = n_nationkey
group by n_name
"""


# ------------------------------------------------------------ joins / top-k

def q_top_customers(sf_dir: str):
    """Join + grouped sum + global top-k (vector search top-k shape,
    cf. mcp/src/graph/queries.ts:564+)."""
    from ..ops.partition import grouped_aggregate
    from ..ops.search import partial_topk

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    ds = broadcast_join(ds, cust, keys="o_custkey", right_keys="c_custkey")
    # corpus-cardinality key: hash-partitioned aggregate, then each
    # partition forwards only its top 10; the global merge happens on the
    # driver over O(partitions x 10) rows — a full .sort().limit(10)
    # exchange here cost 5x the whole query in the round-2 bench
    agg = grouped_aggregate(ds, ["o_custkey", "c_name"],
                            [("o_totalprice", "sum")], ["total_spent"])
    parts = agg.map_batches(
        lambda t: partial_topk(t, "total_spent", "o_custkey", 10),
        batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(parts, schema=pa.schema([
        ("o_custkey", pa.int64()), ("c_name", pa.string()),
        ("total_spent", pa.float64())]))
    top = merged.sort_by([("total_spent", "descending"),
                          ("o_custkey", "ascending")]).slice(0, 10)
    return _round_cols(top, {"total_spent": 2})


SQL_TOP_CUSTOMERS = """
select o_custkey, c_name, round(sum(o_totalprice), 2) as total_spent
from orders join customer on o_custkey = c_custkey
group by o_custkey, c_name
order by sum(o_totalprice) desc, o_custkey
limit 10
"""


def q_customers_with_failed_orders(sf_dir: str):
    """Semi join via broadcast key set."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    keys = set(
        orders.map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"]),
            batch_format="pyarrow").unique("o_custkey"))
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return semi_join(ds, "c_custkey", keys)


SQL_SEMI = """
select c_custkey, c_name from customer
where c_custkey in (select o_custkey from orders where o_orderstatus = 'F')
"""


def q_customers_without_pending_orders(sf_dir: str):
    """Anti join via broadcast key set (cf. prune_orphan_functions,
    btreemap_graph.rs:756+): customers with no 'P'-status order."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    keys = set(
        orders.map_batches(
            lambda t: t.filter(pc.equal(t["o_orderstatus"], "P")).select(["o_custkey"]),
            batch_format="pyarrow").unique("o_custkey"))
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return anti_join(ds, "c_custkey", keys)


SQL_ANTI = """
select c_custkey, c_name from customer
where c_custkey not in (select o_custkey from orders where o_orderstatus = 'P')
"""


def q_orders_lineitem_join(sf_dir: str):
    """Both-sides-large hash join + rollup: revenue per order priority.
    ONE exchange: the per-priority combiner is fused into the join's
    per-partition apply (``post``), so only |priorities| rows per partition
    leave the join and the final merge is a driver-side re-aggregate of
    those partials (the low_card_aggregate shape) instead of a second
    all-to-all."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})

    li = li.map_batches(revenue, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]) \
        .map_batches(lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
                     batch_format="pyarrow")
    # cogroup path instead of Dataset.join: the native join's one-aggregator-
    # actor-per-partition pool regressed this query 3x in the round-2 bench
    # (precedent: kg_two_hop, commit c6b0b1c); this is one tagged-union keyed
    # shuffle + per-partition pyarrow join, task-based throughout
    from ..ops.partition import cogroup_join_hp

    def partial(t: pa.Table) -> pa.Table:
        # per-partition combiner: only |priorities| rows leave the join
        g = t.group_by(["o_orderpriority"]).aggregate(
            [("rev", "sum"), ("rev", "count")])
        return g.rename_columns(["o_orderpriority", "rev", "n"])

    parts = cogroup_join_hp(
        li, orders, "l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("rev", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("o_orderpriority", pa.string())]),
        post=partial).take_all()
    merged = pa.Table.from_pylist(parts, schema=pa.schema(
        [("o_orderpriority", pa.string()), ("rev", pa.float64()),
         ("n", pa.int64())]))
    out = merged.group_by("o_orderpriority").aggregate(
        [("rev", "sum"), ("n", "sum")]) \
        .rename_columns(["o_orderpriority", "revenue", "n_items"])
    return _round_cols(out, {"revenue": 2})


SQL_ORDERS_LINEITEM = """
select o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
       count(*) as n_items
from lineitem join orders on l_orderkey = o_orderkey
group by o_orderpriority
"""


# ------------------------------------------------- per-group order-aware ops

def q_first_order_per_customer(sf_dir: str):
    """First-wins per key (MERGE semantics, neo4j/queries/nodes.rs:49-50)."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])
    return first_per_group(ds, "o_custkey",
                           [("o_orderdate", "ascending"), ("o_orderkey", "ascending")])


SQL_FIRST_ORDER = """
select o_custkey, o_orderkey, o_orderdate from orders
qualify row_number() over (partition by o_custkey
                           order by o_orderdate, o_orderkey) = 1
"""


def q_priciest_part_per_brand(sf_dir: str):
    """argmax per group (longest-prefix top-1 analog, btreemap_graph.rs:542-563)."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_partkey", "p_retailprice"])
    out = first_per_group(ds, "p_brand",
                          [("p_retailprice", "descending"), ("p_partkey", "ascending")])
    return out.map_batches(lambda t: _round_cols(t, {"p_retailprice": 2}),
                           batch_format="pyarrow")


SQL_PRICIEST_PART = """
select p_brand, p_partkey, round(p_retailprice, 2) as p_retailprice
from part
qualify row_number() over (partition by p_brand
                           order by p_retailprice desc, p_partkey) = 1
"""


def q_distinct_flags(sf_dir: str):
    from ..ops.dedup import distinct

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return distinct(ds, ["l_returnflag", "l_linestatus"])


SQL_DISTINCT_FLAGS = "select distinct l_returnflag, l_linestatus from lineitem"


# ------------------------------------------------------------ event streams

def q_running_value(sf_dir: str):
    """Per-user running sum in event order (ordered-log window op)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])
    out = running_sum(ds, "user_id", ["ts", "event_id"], "value", out_col="running")
    return out.map_batches(
        lambda t: _round_cols(t.select(["event_id", "user_id", "running"]),
                              {"running": 2}),
        batch_format="pyarrow")


SQL_RUNNING = """
select event_id, user_id,
       round(sum(value) over (partition by user_id order by ts, event_id
                              rows unbounded preceding), 2) as running
from events
"""


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (30 min), session count per user."""
    from ray.data.aggregate import Max

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    s = sessionize(ds, "user_id", "ts", gap_seconds=1800)
    out = s.groupby("user_id").aggregate(Max("session_id", alias_name="max_sid"))
    return out.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "n_sessions": pc.add(t["max_sid"], pa.scalar(1, pa.int64()))}),
        batch_format="pyarrow")


SQL_SESSIONS = """
with d as (
  select user_id,
         case when ts - lag(ts) over (partition by user_id order by ts, event_id)
                   > interval 1800 seconds then 1 else 0 end as brk
  from events)
select user_id, cast(sum(brk) as bigint) + 1 as n_sessions
from d group by user_id
"""


def q_hourly_event_stats(sf_dir: str):
    """Tumbling 1h event-time windows per event_type."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = tumbling_window(ds, "ts", "hour", ["event_type"],
                          [Count(alias_name="n"), Sum("value", alias_name="sum_value")])
    return out.map_batches(lambda t: _round_cols(t, {"sum_value": 2}),
                           batch_format="pyarrow")


SQL_HOURLY = """
select date_trunc('hour', ts) as window, event_type,
       count(*) as n, round(sum(value), 2) as sum_value
from events group by 1, 2
"""


def q_price_quantiles(sf_dir: str):
    """Exact p50/p90/p99 of lineitem extended price via the distributed
    two-pass quantile (histogram partials -> candidate-bin refinement;
    driver holds O(bins) counts, never the column — the scale-correct
    replacement for np.quantile(take_all()))."""
    from ..ops.quantile import distributed_quantiles
    from ..util import round_half_away

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    p50, p90, p99 = distributed_quantiles(ds, "l_extendedprice",
                                          [0.5, 0.9, 0.99])
    return pa.table({name: pa.array([round_half_away(v, 4)], pa.float64())
                     for name, v in (("p50", p50), ("p90", p90), ("p99", p99))})


SQL_PRICE_QUANTILES = """
select round(quantile_cont(l_extendedprice, 0.5), 4) as p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) as p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) as p99
from lineitem
"""


def q_order_rank_in_customer(sf_dir: str):
    """SQL window ranking family (row_number / rank / dense_rank per
    partition): orders ranked by price within each customer — one keyed
    shuffle + vectorized segmented-index pass (the reference sorts child
    lists per parent when materializing, btreemap_graph.rs:542-563)."""
    from ..ops.relational import window_rank

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = window_rank(ds, "o_custkey",
                      [("o_totalprice", "descending"),
                       ("o_orderkey", "ascending")],
                      rank_cols=["o_totalprice"],
                      out_row_number="rn", out_rank="rnk",
                      out_dense_rank="drnk")
    return out.map_batches(
        lambda t: t.select(["o_custkey", "o_orderkey", "rn", "rnk", "drnk"]),
        batch_format="pyarrow")


SQL_ORDER_RANK = """
select o_custkey, o_orderkey,
       row_number() over (partition by o_custkey
                          order by o_totalprice desc, o_orderkey) as rn,
       rank() over (partition by o_custkey
                    order by o_totalprice desc) as rnk,
       dense_rank() over (partition by o_custkey
                          order by o_totalprice desc) as drnk
from orders
"""


def q_prev_order_price(sf_dir: str):
    """lag() window op: each order carries the customer's previous order
    price in date order (null on the first). Values are copied, not
    recomputed — bit-identical to the source column."""
    from ..ops.relational import window_lag

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    out = window_lag(ds, "o_custkey",
                     [("o_orderdate", "ascending"), ("o_orderkey", "ascending")],
                     "o_totalprice", out_col="prev_price")
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey", "prev_price"]),
        batch_format="pyarrow")


SQL_PREV_ORDER_PRICE = """
select o_orderkey, o_custkey,
       lag(o_totalprice) over (partition by o_custkey
                               order by o_orderdate, o_orderkey) as prev_price
from orders
"""


def q_top3_orders_per_customer(sf_dir: str):
    """Top-n per group (generalizes the argmax/top-1 family): only n rows
    per group survive the partition boundary."""
    from ..ops.relational import top_n_per_group

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = top_n_per_group(ds, "o_custkey",
                          [("o_totalprice", "descending"),
                           ("o_orderkey", "ascending")], 3)
    return out.map_batches(
        lambda t: _round_cols(
            t.select(["o_custkey", "o_orderkey", "o_totalprice", "rn"]),
            {"o_totalprice": 2}),
        batch_format="pyarrow")


SQL_TOP3_ORDERS = """
select o_custkey, o_orderkey, round(o_totalprice, 2) as o_totalprice,
       row_number() over (partition by o_custkey
                          order by o_totalprice desc, o_orderkey) as rn
from orders
qualify rn <= 3
"""


def q_order_window_dist(sf_dir: str):
    """Distribution window functions per customer (percent_rank, cume_dist,
    ntile(4)) plus lead() — the rest of the SQL window family. The ratios
    are small-integer divisions in double, so they match the oracle
    bit-for-bit; ntile follows SQL's earlier-buckets-take-remainder rule."""
    from ..ops.relational import window_dist

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])
    order = [("o_totalprice", "descending"), ("o_orderkey", "ascending")]
    out = window_dist(ds, "o_custkey", order, rank_cols=["o_totalprice"],
                      ntile=4, out_percent_rank="pr", out_cume_dist="cd",
                      out_ntile="quartile",
                      lead_col="o_totalprice", out_lead="next_price")
    return out.map_batches(
        lambda t: t.select(["o_custkey", "o_orderkey", "pr", "cd",
                            "quartile", "next_price"]),
        batch_format="pyarrow")


SQL_ORDER_WINDOW_DIST = """
select o_custkey, o_orderkey,
       percent_rank() over (partition by o_custkey
                            order by o_totalprice desc) as pr,
       cume_dist() over (partition by o_custkey
                         order by o_totalprice desc) as cd,
       ntile(4) over (partition by o_custkey
                      order by o_totalprice desc, o_orderkey) as quartile,
       lead(o_totalprice) over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey)
         as next_price
from orders
"""


def q_nation_balance_quantiles(sf_dir: str):
    """Per-group exact quantiles (quantile_cont ... GROUP BY): one keyed
    shuffle + a single vectorized segmented-interpolation pass per
    partition — no per-group Python, no driver materialization."""
    from ..ops.quantile import grouped_quantile

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    out = grouped_quantile(ds, "c_nationkey", "c_acctbal",
                           [0.25, 0.5, 0.9], ["p25", "p50", "p90"])
    return out.map_batches(
        lambda t: _round_cols(t, {"p25": 4, "p50": 4, "p90": 4}),
        batch_format="pyarrow")


SQL_NATION_BALANCE_QUANTILES = """
select c_nationkey,
       round(quantile_cont(c_acctbal, 0.25), 4) as p25,
       round(quantile_cont(c_acctbal, 0.5), 4) as p50,
       round(quantile_cont(c_acctbal, 0.9), 4) as p90
from customer group by c_nationkey
"""


def q_nation_balance_disc(sf_dir: str):
    """Per-group DISCRETE quantiles (quantile_disc ... GROUP BY): the
    element at max(ceil(q*n)-1, 0) per group — an exact member of the
    group, so the comparison is float-EXACT (no rounding, no interpolation
    arithmetic). Same one-shuffle segmented pass as the _cont variant."""
    from ..ops.quantile import grouped_quantile_disc

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    return grouped_quantile_disc(ds, "c_nationkey", "c_acctbal",
                                 [0.5, 0.9], ["med_disc", "p90_disc"])


SQL_NATION_BALANCE_DISC = """
select c_nationkey,
       quantile_disc(c_acctbal, 0.5) as med_disc,
       quantile_disc(c_acctbal, 0.9) as p90_disc
from customer group by c_nationkey
"""


def q_nation_balance_mad(sf_dir: str):
    """Per-group median absolute deviation (robust spread): ONE keyed
    shuffle, two vectorized segmented order-stat passes per partition
    (second over |x - med| via one lexsort). Matches DuckDB mad() at 4
    decimals (quantile_cont interpolation at both levels)."""
    from ..ops.quantile import grouped_mad

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    out = grouped_mad(ds, "c_nationkey", "c_acctbal", "mad_acctbal")
    return out.map_batches(lambda t: _round_cols(t, {"mad_acctbal": 4}),
                           batch_format="pyarrow")


SQL_NATION_BALANCE_MAD = """
select c_nationkey, round(mad(c_acctbal), 4) as mad_acctbal
from customer group by c_nationkey
"""


def q_nation_customer_list(sf_dir: str):
    """Ordered string aggregation per group (string_agg ... order by):
    one keyed shuffle, then a fully vectorized per-partition pass — sort
    by (key, value), build ONE ListArray over the segment offsets, and
    pc.binary_join does every group's concatenation in C."""
    from ..ops.partition import partitioned_apply
    from ..ops.relational import _key_change_mask

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_name"])

    def agg(t: pa.Table) -> pa.Table:
        t = t.sort_by([("c_nationkey", "ascending"), ("c_name", "ascending")])
        n = t.num_rows
        starts = np.flatnonzero(_key_change_mask(t, ["c_nationkey"]))
        head = pa.array(starts, pa.int64())
        if n == 0:
            return pa.table({"c_nationkey": t["c_nationkey"],
                             "names": pa.array([], pa.string())})
        offsets = pa.array(np.concatenate((starts, [n])), pa.int32())
        vals = t["c_name"].combine_chunks() if isinstance(
            t["c_name"], pa.ChunkedArray) else t["c_name"]
        lists = pa.ListArray.from_arrays(offsets, vals)
        return pa.table({
            "c_nationkey": pc.take(t["c_nationkey"], head),
            "names": pc.binary_join(lists, ","),
        })

    return partitioned_apply(ds, "c_nationkey", agg)


SQL_NATION_CUSTOMER_LIST = """
select c_nationkey, string_agg(c_name, ',' order by c_name) as names
from customer group by c_nationkey
"""


def q_status_distinct_customers(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): one keyed shuffle, per-partition
    pyarrow count_distinct — the exact twin of the grouped-HLL sketch."""
    from ..ops.partition import partitioned_apply

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_custkey"])

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus"]).aggregate(
            [("o_custkey", "count_distinct")])
        return g.rename_columns(["o_orderstatus", "n_customers"])

    return partitioned_apply(ds, "o_orderstatus", agg)


SQL_STATUS_DISTINCT_CUSTOMERS = """
select o_orderstatus, cast(count(distinct o_custkey) as bigint) as n_customers
from orders group by o_orderstatus
"""


def q_semi_join_bloom(sf_dir: str):
    """Bloom-prefiltered distributed semi join — the 100-TB pattern: the
    build side folds into a fixed-size mergeable bitmap (O(blocks x bits/8)
    to the driver, broadcast in KBs regardless of key count), the probe
    side drops definite non-members INSIDE map_batches, and only true hits
    + the small FP tail enter the exact membership shuffle. Result is
    EXACT (no false negatives; FPs removed by the final co-partition
    filter), so the oracle is the plain SQL semi join."""
    import ray.data as rd

    from ..ops.partition import membership_filter_hp
    from ..ops.relational import broadcast, _resolve
    from ..ops.sketch import bloom_build, bloom_might_contain

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def fonly(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["o_orderstatus"], "F")
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        return pa.table({"o_custkey": t.filter(keep)["o_custkey"]})

    fkeys = orders.map_batches(fonly, batch_format="pyarrow") \
        .materialize()  # two consumers: bloom pass + exact pass
    bits = bloom_build(fkeys, "o_custkey", n_bits=1 << 18, k=4)
    ref = broadcast(bits)

    def prefilter(t: pa.Table) -> pa.Table:
        b = _resolve(ref)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(bloom_might_contain(b, keys, k=4)))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"]) \
        .map_batches(prefilter, batch_format="pyarrow")
    return membership_filter_hp(
        cust, fkeys.map_batches(
            lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"),
        "c_custkey", keep=True,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_name", pa.string())]))


def q_both_status_customers(sf_dir: str):
    """Set INTERSECTION (SQL INTERSECT): customers holding BOTH an 'F' and
    an 'O' order. Distinct key sets per side, then one keyed co-partition
    membership filter — the same one-shuffle shape as the distributed
    semi-join, no pyarrow join, no driver key set."""
    from ..ops.partition import distinct_hp, membership_filter_hp

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def side(status):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["o_orderstatus"], status)
            keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
            return pa.table({"o_custkey": t.filter(keep)["o_custkey"]})
        return f

    f_keys = distinct_hp(orders.map_batches(side("F"), batch_format="pyarrow"),
                         "o_custkey")
    o_keys = orders.map_batches(side("O"), batch_format="pyarrow")
    return membership_filter_hp(
        f_keys, o_keys, "o_custkey", keep=True,
        payload_schema=pa.schema([("o_custkey", pa.int64())]))


SQL_BOTH_STATUS = """
select o_custkey from orders where o_orderstatus = 'F'
intersect
select o_custkey from orders where o_orderstatus = 'O'
"""


def q_f_only_customers(sf_dir: str):
    """Set DIFFERENCE (SQL EXCEPT): customers with an 'F' order but no 'O'
    order — the INTERSECT's complement via the same one-shuffle
    co-partition membership filter, keep=False."""
    from ..ops.partition import distinct_hp, membership_filter_hp

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def side(status):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.equal(t["o_orderstatus"], status)
            keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
            return pa.table({"o_custkey": t.filter(keep)["o_custkey"]})
        return f

    f_keys = distinct_hp(orders.map_batches(side("F"), batch_format="pyarrow"),
                         "o_custkey")
    o_keys = orders.map_batches(side("O"), batch_format="pyarrow")
    return membership_filter_hp(
        f_keys, o_keys, "o_custkey", keep=False,
        payload_schema=pa.schema([("o_custkey", pa.int64())]))


SQL_F_ONLY = """
select o_custkey from orders where o_orderstatus = 'F'
except
select o_custkey from orders where o_orderstatus = 'O'
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the 3-table join composition: BUILDING-segment
    customers -> orders before 1998 (pruned read + filter) -> lineitem
    revenue (cogroup hash join on orderkey) -> grouped sum -> top 10.
    ONE exchange total (r03: 4, r04: 2): the BUILDING customer-key set is
    dimension-scale, so under a 1 M-key guard it broadcasts (ray.put once,
    is_in per batch — the Q5 dim pattern) and the orders semi-filter is a
    pure map; above the guard the keyed membership co-filter runs instead.
    The revenue rollup + top-10 partials stay FUSED into the cogroup
    join's per-partition apply via ``post`` (rows are co-located by
    l_orderkey there)."""
    import ray

    from ..ops.partition import cogroup_join_hp, membership_filter_hp
    from ..ops.search import partial_topk

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: pa.table({
            "o_custkey": t.filter(pc.equal(
                t["c_mktsegment"], "BUILDING"))["c_custkey"]}),
            batch_format="pyarrow")
    cutoff = pa.scalar(np.datetime64("1998-01-01", "us"),
                       pa.timestamp("us"))

    def before(t: pa.Table) -> pa.Table:
        keep = pc.less(pc.cast(t["o_orderdate"], pa.timestamp("us")), cutoff)
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        return pa.table({"o_custkey": t.filter(keep)["o_custkey"],
                         "l_orderkey": pc.cast(t.filter(keep)["o_orderkey"],
                                               pa.int64())})

    orders_pre = _read(sf_dir, "orders",
                       columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(before, batch_format="pyarrow")
    dim_guard = 1_000_000
    key_rows = cust.take(dim_guard + 1)
    if len(key_rows) <= dim_guard:
        keys_ref = ray.put(pa.array(
            [r["o_custkey"] for r in key_rows], pa.int64()))

        def semi(t: pa.Table, _ref=keys_ref) -> pa.Table:
            vs = ray.get(_ref)  # plasma shared-memory, zero-copy per worker
            return t.filter(pc.is_in(t["o_custkey"], value_set=vs))

        orders = orders_pre.map_batches(semi, batch_format="pyarrow")
    else:
        orders = membership_filter_hp(
            orders_pre, cust, "o_custkey", keep=True,
            payload_schema=pa.schema([("o_custkey", pa.int64()),
                                      ("l_orderkey", pa.int64())]))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": pc.multiply(t["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0), t["l_discount"]))}),
            batch_format="pyarrow")
    def rollup_topk(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "revenue"])
        return partial_topk(g, "revenue", "l_orderkey", 10)

    parts = cogroup_join_hp(
        li, orders.map_batches(lambda t: t.select(["l_orderkey"]),
                               batch_format="pyarrow"),
        "l_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("rev", pa.float64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64())]),
        post=rollup_topk).take_all()
    merged = pa.Table.from_pylist(parts, schema=pa.schema([
        ("l_orderkey", pa.int64()), ("revenue", pa.float64())]))
    top = merged.sort_by([("revenue", "descending"),
                          ("l_orderkey", "ascending")]).slice(0, 10)
    return _round_cols(top, {"revenue": 2})


SQL_SHIPPING_PRIORITY = """
select l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from customer join orders on c_custkey = o_custkey
              join lineitem on l_orderkey = o_orderkey
where c_mktsegment = 'BUILDING' and o_orderdate < timestamp '1998-01-01'
group by l_orderkey
order by sum(l_extendedprice * (1 - l_discount)) desc, l_orderkey
limit 10
"""


def q_hopping_event_stats(sf_dir: str):
    """Hopping 2h-wide / 1h-hop event-time windows per event_type (each
    event lands in 2 windows; fan-out is vectorized in-batch)."""
    from ray.data.aggregate import Count, Sum

    from ..ops.relational import hopping_window

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = hopping_window(ds, "ts", 7200, 3600, ["event_type"],
                         [Count(alias_name="n"),
                          Sum("value", alias_name="sum_value")])
    return out.map_batches(lambda t: _round_cols(t, {"sum_value": 2}),
                           batch_format="pyarrow")


SQL_HOPPING = """
with w as (
  select unnest([date_trunc('hour', ts),
                 date_trunc('hour', ts) - interval 1 hour]) as window,
         event_type, value
  from events)
select "window", event_type, count(*) as n, round(sum(value), 2) as sum_value
from w group by 1, 2
"""


def q_promo_events(sf_dir: str):
    """Interval/range join: events ⋈ overlapping promo windows on event_type
    + ts containment. The windows (10 per type, 60h wide every 48h — the
    12h overlaps make some events match TWO intervals) are a small driver
    artifact broadcast once; matching is a vectorized per-key containment
    matrix inside map_batches — the distributed range-join shape Ray Data
    has no native operator for."""
    from ..ops.dedup import distinct
    from ..ops.relational import interval_join

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])
    types = sorted(r["event_type"]
                   for r in distinct(ds.select_columns(["event_type"]),
                                     ["event_type"]).take_all())
    base = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    h_us = 3_600_000_000
    iv = pa.table({
        "event_type": pa.array([t for t in types for _ in range(10)], pa.string()),
        "promo_id": pa.array([i for _ in types for i in range(10)], pa.int64()),
        "lo": pa.array(np.array([base + i * 48 * h_us for _ in types
                                 for i in range(10)]).astype("datetime64[us]")),
        "hi": pa.array(np.array([base + (i * 48 + 60) * h_us for _ in types
                                 for i in range(10)]).astype("datetime64[us]")),
    })
    out = interval_join(ds, iv, "event_type", "ts", "lo", "hi", ["promo_id"])
    return out.map_batches(
        lambda t: t.select(["event_id", "event_type", "promo_id"]),
        batch_format="pyarrow")


SQL_PROMO_EVENTS = """
with iv as (
  select t.event_type, i.i as promo_id,
         timestamp '2024-01-01 00:00:00' + i.i * (interval 48 hour) as lo,
         timestamp '2024-01-01 00:00:00' + i.i * (interval 48 hour)
           + interval 60 hour as hi
  from (select distinct event_type from events) t
  cross join (select unnest(generate_series(0, 9)) as i) i)
select e.event_id, e.event_type, iv.promo_id
from events e
join iv on e.event_type = iv.event_type and e.ts >= iv.lo and e.ts < iv.hi
"""


def q_event_weekday_pivot(sf_dir: str):
    """Pivot/crosstab: per event_type, event counts spread across 7 fixed
    weekday columns — indicator columns per batch, then the low-cardinality
    combiner aggregate (at most G rows per block cross the driver merge,
    no shuffle)."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def indicators(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # 1970-01-01 was a Thursday; DuckDB dayofweek: 0=Sunday..6=Saturday
        dow = ((us // 86_400_000_000) + 4) % 7
        cols = {"event_type": t["event_type"]}
        for d in range(7):
            cols[f"dow{d}"] = pa.array((dow == d).astype(np.int64))
        return pa.table(cols)

    return low_card_aggregate(
        ds.map_batches(indicators, batch_format="pyarrow"),
        "event_type", [(f"dow{d}", "sum") for d in range(7)],
        [f"dow{d}" for d in range(7)])


# Each sum is cast to bigint: DuckDB types sum(INTEGER) as HUGEINT (int128),
# while the pipeline emits int64 — the driver's value-hash is dtype-sensitive
# (the round-2 hash mismatch on this query was exactly this).
SQL_EVENT_WEEKDAY_PIVOT = """
select event_type,
       cast(sum(case when dayofweek(ts) = 0 then 1 else 0 end) as bigint) as dow0,
       cast(sum(case when dayofweek(ts) = 1 then 1 else 0 end) as bigint) as dow1,
       cast(sum(case when dayofweek(ts) = 2 then 1 else 0 end) as bigint) as dow2,
       cast(sum(case when dayofweek(ts) = 3 then 1 else 0 end) as bigint) as dow3,
       cast(sum(case when dayofweek(ts) = 4 then 1 else 0 end) as bigint) as dow4,
       cast(sum(case when dayofweek(ts) = 5 then 1 else 0 end) as bigint) as dow5,
       cast(sum(case when dayofweek(ts) = 6 then 1 else 0 end) as bigint) as dow6
from events group by event_type
"""


def q_funnel_conversion(sf_dir: str):
    """Funnel analysis over the event log: of the users who ever 'click',
    how many 'purchase' strictly AFTER their first click (first-touch
    attribution). One filtered read (two event types) into ONE keyed
    shuffle on user_id; the per-partition pass computes each user's
    first-click / first-purchase mins and the compare together (a separate
    (user, step) aggregate first would pay a second exchange for nothing —
    it hashes on a key the next stage immediately re-partitions away)."""
    from ..ops.partition import partitioned_apply

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def steps(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t["event_type"], value_set=pa.array(["click", "purchase"]))
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        return t.filter(keep)

    def partial(t: pa.Table) -> pa.Table:
        is_click = pc.equal(t["event_type"], "click").to_numpy(zero_copy_only=False)
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        import pandas as pd

        df = pd.DataFrame({"uid": uid, "click": np.where(is_click, ts, np.nan),
                           "buy": np.where(~is_click, ts, np.nan)})
        # dropna=False: SQL GROUP BY keeps a null-user group — a null
        # clicker/converter must still be counted (repo null-key convention)
        g = df.groupby("uid", dropna=False).min()
        clickers = g["click"].notna()
        converted = clickers & g["buy"].notna() & (g["buy"] > g["click"])
        return pa.table({"n_clickers": pa.array([int(clickers.sum())], pa.int64()),
                         "n_converted": pa.array([int(converted.sum())], pa.int64())})

    # each user's step rows share a partition (hash on user_id), so the
    # per-partition mins + compare are exact; the per-partition scalar
    # pairs then sum on the driver
    parts = partitioned_apply(ds.map_batches(steps, batch_format="pyarrow"),
                              "user_id", partial)
    rows = parts.take_all()
    return pa.table({
        "n_clickers": pa.array([sum(r["n_clickers"] for r in rows)], pa.int64()),
        "n_converted": pa.array([sum(r["n_converted"] for r in rows)], pa.int64()),
    })


SQL_FUNNEL = """
with f as (
  select user_id,
         min(case when event_type = 'click' then ts end) as first_click,
         min(case when event_type = 'purchase' then ts end) as first_buy
  from events
  where event_type in ('click', 'purchase')
  group by user_id)
select cast(count(*) filter (first_click is not null) as bigint) as n_clickers,
       cast(count(*) filter (first_click is not null and first_buy > first_click)
            as bigint) as n_converted
from f
"""


# ------------------------------------------------------------ text analysis

def q_token_stats(sf_dir: str):
    """Token count + char count + avg token length per document
    (token-counting op, cf. mcp/src/graph/neo4j.ts:349-369)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks() if isinstance(t["text"], pa.ChunkedArray) else t["text"]
        toks = pc.split_pattern(text, " ")
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        from ..util import round_half_away

        nt = n_tokens.to_numpy(zero_copy_only=False).astype("float64")
        nc = n_chars.to_numpy(zero_copy_only=False).astype("float64")
        avg_len = pa.array(round_half_away((nc + 1 - nt) / nt, 4),
                           pa.float64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n_tokens,
                         "n_chars": n_chars, "avg_token_len": avg_len})

    return ds.map_batches(stats, batch_format="pyarrow")


SQL_TOKEN_STATS = """
select doc_id,
       len(string_split(text, ' ')) as n_tokens,
       length(text) as n_chars,
       round((length(text) + 1 - len(string_split(text, ' ')))
             / cast(len(string_split(text, ' ')) as double), 4) as avg_token_len
from documents
"""


def q_sentence_split(sf_dir: str):
    """Sentence segmentation (flat_map shape — the north-star's
    sentence-split stage): explode each document into ('. '-delimited)
    sentences with a 1-based index and length, fully vectorized (split +
    list_flatten + parent-offset arithmetic; no Python per row)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks() if isinstance(
            t["text"], pa.ChunkedArray) else t["text"]
        sents = pc.split_pattern(pc.cast(text, pa.large_string()), ". ")
        sents = sents.combine_chunks() if isinstance(
            sents, pa.ChunkedArray) else sents
        flat = pc.list_flatten(sents)
        parent = pc.list_parent_indices(sents).to_numpy(zero_copy_only=False)
        offsets = sents.offsets.to_numpy(zero_copy_only=False)
        idx = np.arange(len(flat), dtype=np.int64) - offsets[parent] + 1
        doc = t["doc_id"].to_numpy(zero_copy_only=False)[parent]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "sent_idx": pa.array(idx, pa.int64()),
            "sentence": pc.cast(flat, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(flat), pa.int64()),
        })

    return ds.map_batches(split, batch_format="pyarrow")


SQL_SENTENCE_SPLIT = """
with s as (select doc_id, string_split(text, '. ') as sents from documents),
u as (select doc_id, generate_subscripts(sents, 1) as sent_idx,
             unnest(sents) as sentence from s)
select doc_id, cast(sent_idx as bigint) as sent_idx, sentence,
       cast(length(sentence) as bigint) as n_chars
from u
"""


def q_quality_scores(sf_dir: str):
    """Quality scoring: stopword ratio per doc (explode + in-batch bincount,
    no shuffle — each doc's tokens stay in its batch)."""
    from ..functions.textutils import explode_tokens

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.large_string())
        parent, flat, _pos, _s, _e = explode_tokens(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text)
        is_stop = pc.is_in(flat, value_set=pa.array(sorted(["the", "a"]))) \
            .to_numpy(zero_copy_only=False)
        n = t.num_rows
        stops = np.bincount(parent, weights=is_stop.astype("float64"), minlength=n)
        total = np.bincount(parent, minlength=n)
        from ..util import round_half_away

        ratio = pa.array(round_half_away(stops / np.maximum(total, 1), 4),
                         pa.float64())
        return pa.table({"doc_id": t["doc_id"], "stop_ratio": ratio})

    return ds.map_batches(score, batch_format="pyarrow")


SQL_QUALITY = """
select doc_id,
       round(len(list_filter(string_split(text, ' '), x -> x in ('the', 'a')))
             / cast(len(string_split(text, ' ')) as double), 4) as stop_ratio
from documents
"""


def q_exact_dedup_docs(sf_dir: str):
    """Exact content dedup: md5 fingerprint -> first doc_id + group size.

    High-cardinality shape: the key vocabulary is corpus-sized, so the
    rollup runs per-batch combiner -> hash-partitioned pyarrow aggregate
    (ops.partition.grouped_aggregate), NOT Ray's native per-group-Python
    aggregate."""
    from ..ops.partition import grouped_aggregate

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp_partial(t: pa.Table) -> pa.Table:
        import hashlib

        md5 = pa.array([hashlib.md5(x.encode()).hexdigest()
                        for x in t["text"].to_pylist()], pa.string())
        g = pa.table({"doc_id": t["doc_id"], "text_md5": md5}) \
            .group_by(["text_md5"]).aggregate(
                [("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["text_md5", "first_doc_id", "n_docs"])

    return grouped_aggregate(
        ds.map_batches(fp_partial, batch_format="pyarrow"), "text_md5",
        [("first_doc_id", "min"), ("n_docs", "sum")], ["first_doc_id", "n_docs"])


SQL_EXACT_DEDUP = """
select md5(text) as text_md5, min(doc_id) as first_doc_id, count(*) as n_docs
from documents group by 1
"""


# ------------------------------------------------------------ similarity

def q_knn_bruteforce(sf_dir: str):
    """Brute-force cosine top-5 per query vector (numpy matmul per batch
    against a broadcast query matrix; queries = vec_id < 3)."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qmask = pc.less(emb["vec_id"], 3)
    qt = emb.filter(qmask)
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    from ..ops.relational import broadcast
    ref = broadcast({"qids": qids, "qm": qm})

    class Scorer:
        def __init__(self, ref):
            from ..ops.relational import _resolve
            d = _resolve(ref)
            self.qids, self.qm = d["qids"], d["qm"]

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "neighbor_id": pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            from ..ops.ann import _vecs_of

            m = _vecs_of(t["embedding"])  # zero-copy flatten, no to_pylist
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cos = m @ self.qm.T  # (batch, nq)
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            nb, nq = cos.shape
            # per-batch PARTIAL top-k under the same composite order as the
            # final reduce ((-cos, neighbor_id)): only nq*k rows per batch
            # enter the shuffle, not the full batch x nq cross product
            k = min(5, nb)
            qs, ns, cs = [], [], []
            for j in range(nq):
                keep = np.lexsort((vec_ids, -cos[:, j]))[:k]
                qs.append(np.full(k, self.qids[j]))
                ns.append(vec_ids[keep])
                cs.append(cos[keep, j])
            return pa.table({
                "query_id": pa.array(np.concatenate(qs), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(ns), pa.int64()),
                "cos": pa.array(np.concatenate(cs), pa.float64()),
            })

    import ray.data as rd

    from ..util import make_task_stage, ref_key

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # task pool + per-process cache (round-2 lesson: actor-pool startup
    # costs 3-5x on short scans)
    scored = ds.map_batches(make_task_stage(Scorer, ref_key(ref), ref=ref),
                            batch_format="pyarrow")

    def topk(g: pa.Table) -> pa.Table:
        return g.sort_by([("cos", "descending"), ("neighbor_id", "ascending")]).slice(0, 5)

    out = scored.groupby("query_id").map_groups(topk, batch_format="pyarrow")
    return out.map_batches(lambda t: _round_cols(t, {"cos": 4}),
                           batch_format="pyarrow")


SQL_KNN = """
with q as (select vec_id as qid, embedding as qe from embeddings where vec_id < 3)
select q.qid as query_id, e.vec_id as neighbor_id,
       cast(round(list_cosine_similarity(q.qe, e.embedding), 4) as double) as cos
from q, embeddings e
qualify row_number() over (partition by q.qid
                           order by list_cosine_similarity(q.qe, e.embedding) desc,
                                    e.vec_id) <= 5
"""


def q_prev_purchase_asof(sf_dir: str):
    """As-of join: each event <- the user's most recent STRICTLY-earlier
    'purchase' event value (broadcast right side + per-batch merge_asof)."""
    import pyarrow.parquet as pq

    from ..ops.relational import asof_join

    right = pq.read_table(f"{sf_dir}/events.parquet",
                          columns=["user_id", "ts", "event_type", "value"])
    right = right.filter(pc.equal(right["event_type"], "purchase"))
    right = right.rename_columns(["user_id", "pts", "event_type", "prev_purchase_value"]) \
        .select(["user_id", "pts", "prev_purchase_value"])
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    # strict inequality: shift right-side ts forward by 1us so ts == pts
    # rows are excluded (merge_asof allow_exact_matches=False equivalent,
    # kept vectorized)
    right = right.set_column(
        1, "pts", pc.add(right["pts"], pa.scalar(1, pa.duration("us"))))

    out = asof_join(ds, right, by="user_id", left_on="ts", right_on="pts",
                    value_cols=["prev_purchase_value"])
    return out.map_batches(
        lambda t: _round_cols(t.select(["event_id", "user_id", "prev_purchase_value"]),
                              {"prev_purchase_value": 2}),
        batch_format="pyarrow")


SQL_ASOF = """
select e.event_id, e.user_id, round(p.value, 2) as prev_purchase_value
from events e asof left join
     (select user_id, ts, value from events where event_type = 'purchase') p
  on e.user_id = p.user_id and e.ts > p.ts
"""


def q_endpoint_requests(sf_dir: str):
    """Request↔Endpoint segment-match + verb join (linker.rs:362-396,
    472-506): deterministic request/endpoint tables derived from documents;
    ``:id`` segments match any value, query strings are normalized away."""
    from ..ops.relational import endpoint_match_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def to_requests(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        ids = doc_id.to_numpy()
        path = pc.binary_join_element_wise(
            pa.scalar("/api/"), pc.cast(t["source"], pa.string()),
            pa.scalar("/"), pc.cast(doc_id, pa.string()), "")
        # every 5th request carries a query string the normalizer must strip
        path = pc.if_else(pa.array(ids % 5 == 0),
                          pc.binary_join_element_wise(path, pa.scalar("?q=1"), ""),
                          path)
        verb = pc.if_else(pa.array(ids % 2 == 0),
                          pa.scalar("GET"), pa.scalar("POST"))
        return pa.table({"doc_id": doc_id, "path": path,
                         "verb": pc.cast(verb, pa.string())})

    reqs = docs.map_batches(to_requests, batch_format="pyarrow")

    sources = sorted(set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        ["source"].to_pylist()))
    eps = pa.table({
        "endpoint_path": pa.array([f"/api/{s}/:id" for s in sources for _ in (0, 1)],
                                  pa.string()),
        "verb": pa.array([v for _ in sources for v in ("GET", "POST")], pa.string()),
        "handler": pa.array([f"{s}_{v.lower()}" for s in sources
                             for v in ("GET", "POST")], pa.string()),
    })
    out = endpoint_match_join(reqs, eps)
    return out.map_batches(
        lambda t: t.select(["doc_id", "verb", "endpoint_path", "handler"]),
        batch_format="pyarrow")


SQL_ENDPOINT_REQUESTS = """
with reqs as (
  select doc_id,
         regexp_replace('/api/' || source || '/' || doc_id ||
                        case when doc_id % 5 = 0 then '?q=1' else '' end,
                        '[?#].*$', '') as path,
         case when doc_id % 2 = 0 then 'GET' else 'POST' end as verb
  from documents),
eps as (
  select distinct '/api/' || source || '/:id' as endpoint_path, v.verb,
         source || '_' || lower(v.verb) as handler
  from documents, (values ('GET'), ('POST')) v(verb))
select r.doc_id, r.verb, e.endpoint_path, e.handler
from reqs r join eps e
  on r.verb = e.verb
 and regexp_full_match(r.path,
                       regexp_replace(e.endpoint_path, ':[a-zA-Z_]+', '[^/]+', 'g'))
"""


REL_QUERIES: dict[str, tuple] = {
    "rel_endpoint_requests": (q_endpoint_requests, SQL_ENDPOINT_REQUESTS),
    "rel_prev_purchase_asof": (q_prev_purchase_asof, SQL_ASOF),
    "rel_pricing_summary": (q_pricing_summary, SQL_PRICING),
    "rel_region_rollup": (q_region_rollup, SQL_REGION_ROLLUP),
    "rel_nation_customers": (q_nation_customers, SQL_NATION_CUSTOMERS),
    "rel_top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
    "rel_semi_join": (q_customers_with_failed_orders, SQL_SEMI),
    "rel_anti_join": (q_customers_without_pending_orders, SQL_ANTI),
    "rel_orders_lineitem_join": (q_orders_lineitem_join, SQL_ORDERS_LINEITEM),
    "rel_first_order_per_customer": (q_first_order_per_customer, SQL_FIRST_ORDER),
    "rel_priciest_part_per_brand": (q_priciest_part_per_brand, SQL_PRICIEST_PART),
    "rel_distinct_flags": (q_distinct_flags, SQL_DISTINCT_FLAGS),
    "rel_running_value": (q_running_value, SQL_RUNNING),
    "rel_user_sessions": (q_user_sessions, SQL_SESSIONS),
    "rel_hourly_event_stats": (q_hourly_event_stats, SQL_HOURLY),
    "rel_hopping_event_stats": (q_hopping_event_stats, SQL_HOPPING),
    "rel_price_quantiles": (q_price_quantiles, SQL_PRICE_QUANTILES),
    "rel_order_rank_in_customer": (q_order_rank_in_customer, SQL_ORDER_RANK),
    "rel_prev_order_price": (q_prev_order_price, SQL_PREV_ORDER_PRICE),
    "rel_top3_orders_per_customer": (q_top3_orders_per_customer, SQL_TOP3_ORDERS),
    "rel_nation_balance_quantiles": (q_nation_balance_quantiles,
                                     SQL_NATION_BALANCE_QUANTILES),
    "rel_promo_events": (q_promo_events, SQL_PROMO_EVENTS),
    "rel_order_window_dist": (q_order_window_dist, SQL_ORDER_WINDOW_DIST),
    "rel_funnel_conversion": (q_funnel_conversion, SQL_FUNNEL),
    "rel_pricing_rollup": (q_pricing_rollup, SQL_PRICING_ROLLUP),
    "rel_pricing_cube": (q_pricing_cube, SQL_PRICING_CUBE),
    "rel_nation_balance_disc": (q_nation_balance_disc, SQL_NATION_BALANCE_DISC),
    "rel_intersect_custkeys": (q_both_status_customers, SQL_BOTH_STATUS),
    "rel_except_custkeys": (q_f_only_customers, SQL_F_ONLY),
    "rel_shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "rel_nation_balance_mad": (q_nation_balance_mad, SQL_NATION_BALANCE_MAD),
    "rel_nation_customer_list": (q_nation_customer_list,
                                 SQL_NATION_CUSTOMER_LIST),
    "rel_status_distinct_customers": (q_status_distinct_customers,
                                      SQL_STATUS_DISTINCT_CUSTOMERS),
    "rel_semi_join_bloom": (q_semi_join_bloom, SQL_SEMI),
    "rel_priority_mode": (q_priority_mode, SQL_PRIORITY_MODE),
    "rel_qty_price_corr": (q_qty_price_correlation, SQL_QTY_PRICE_CORR),
    "rel_nation_balance_stats": (q_nation_balance_stats,
                                 SQL_NATION_BALANCE_STATS),
    "rel_event_weekday_pivot": (q_event_weekday_pivot, SQL_EVENT_WEEKDAY_PIVOT),
    "txt_token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "txt_sentence_split": (q_sentence_split, SQL_SENTENCE_SPLIT),
    "txt_quality_scores": (q_quality_scores, SQL_QUALITY),
    "txt_exact_dedup_docs": (q_exact_dedup_docs, SQL_EXACT_DEDUP),
    "sim_knn_bruteforce": (q_knn_bruteforce, SQL_KNN),
}


def q_local_supplier_volume(sf_dir: str,
                            dim_broadcast_limit: int = 1_000_000):
    """TPC-H Q5 shape — the 6-table join composition (the widest in the
    suite): region ⋈ nation are driver-joined tiny dims, customer/supplier
    prune to ASIA nations at the read. Adaptive join strategy (the repo's
    broadcast-small-side-with-guard convention): when customer AND supplier
    fit ``dim_broadcast_limit`` their (key -> nationkey) maps broadcast via
    ray.put and the whole query is ONE co-group exchange (lineitem ⋈
    filtered orders on orderkey) with the supplier lookup, same-nation
    filter and per-nation rollup all fused into the join's per-partition
    apply; above the guard the fallback runs THREE co-group exchanges
    (orders ⋈ customer on custkey, ⋈ lineitem on orderkey, ⋈ supplier on
    suppkey). Cf. the reference's multi-hop linker joins (linker.rs
    EdgeIndex 2-hop) composed at warehouse shape."""
    import pyarrow.parquet as pq_

    from ..ops.partition import cogroup_join_hp

    nat = pq_.read_table(f"{sf_dir}/nation.parquet")
    reg = pq_.read_table(f"{sf_dir}/region.parquet")
    rk = reg.filter(pc.equal(reg["r_name"], "ASIA"))["r_regionkey"]
    rk = rk.combine_chunks() if isinstance(rk, pa.ChunkedArray) else rk
    asia = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rk))
    nation_name = dict(zip(asia["n_nationkey"].to_pylist(),
                           asia["n_name"].to_pylist()))
    nk = pa.array(sorted(nation_name), pa.int64())

    def asia_only(col: str, t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(pc.cast(t[col], pa.int64()), value_set=nk))

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(lambda t: (lambda f: pa.table({
            "o_custkey": pc.cast(f["c_custkey"], pa.int64()),
            "c_nationkey": pc.cast(f["c_nationkey"], pa.int64())}))(
                asia_only("c_nationkey", t)), batch_format="pyarrow")
    lo = pa.scalar(np.datetime64("1996-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    def in_window(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.timestamp("us"))
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        f = t.filter(keep)
        return pa.table({"o_custkey": pc.cast(f["o_custkey"], pa.int64()),
                         "l_orderkey": pc.cast(f["o_orderkey"], pa.int64())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(in_window, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]) \
        .map_batches(lambda t: pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pc.multiply(t["l_extendedprice"],
                               pc.subtract(pa.scalar(1.0), t["l_discount"]))}),
            batch_format="pyarrow")

    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda t: (lambda f: pa.table({
            "s_suppkey": pc.cast(f["s_suppkey"], pa.int64()),
            "s_nationkey": pc.cast(f["s_nationkey"], pa.int64())}))(
                asia_only("s_nationkey", t)), batch_format="pyarrow")

    # dims are pure reads -> count() is parquet-metadata cheap
    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    n_supp = _read(sf_dir, "supplier", columns=["s_suppkey"]).count()
    if max(n_cust, n_supp) <= dim_broadcast_limit:
        from ..ops.relational import _cached_resolve, broadcast

        cmap = {r["o_custkey"]: r["c_nationkey"] for r in cust.take_all()}
        smap = {r["s_suppkey"]: r["s_nationkey"] for r in supp.take_all()}
        cref, sref = broadcast(cmap), broadcast(smap)

        def orders_with_nation(t: pa.Table, _ref=cref) -> pa.Table:
            import pandas as pd

            cm = _cached_resolve(_ref)
            ck = pd.Series(t["o_custkey"].to_numpy(zero_copy_only=False))
            nat_ = ck.map(cm)  # NaN = non-ASIA customer -> drop
            keep = nat_.notna().to_numpy()
            return pa.table({
                "l_orderkey": pa.array(
                    t["l_orderkey"].to_numpy(zero_copy_only=False)[keep]),
                "c_nationkey": pa.array(
                    nat_.to_numpy(dtype=np.float64)[keep].astype(np.int64)),
            })

        def bcast_rollup(t: pa.Table, _ref=sref) -> pa.Table:
            import pandas as pd

            sm = _cached_resolve(_ref)
            sk = pd.Series(t["s_suppkey"].to_numpy(zero_copy_only=False))
            snat = sk.map(sm).to_numpy(dtype=np.float64)
            cnat = t["c_nationkey"].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            keep = pa.array(snat == cnat)  # NaN never equals -> non-ASIA out
            f = t.filter(keep)
            return f.group_by("c_nationkey").aggregate([("rev", "sum")]) \
                .rename_columns(["s_nationkey", "rev"])

        parts = cogroup_join_hp(
            li, orders.map_batches(orders_with_nation, batch_format="pyarrow"),
            "l_orderkey",
            pa.schema([("l_orderkey", pa.int64()), ("s_suppkey", pa.int64()),
                       ("rev", pa.float64())]),
            pa.schema([("l_orderkey", pa.int64()),
                       ("c_nationkey", pa.int64())]),
            post=bcast_rollup).take_all()
    else:
        j1 = cogroup_join_hp(
            orders, cust, "o_custkey",
            pa.schema([("o_custkey", pa.int64()), ("l_orderkey", pa.int64())]),
            pa.schema([("o_custkey", pa.int64()), ("c_nationkey", pa.int64())]))
        j2 = cogroup_join_hp(
            li,
            j1.map_batches(lambda t: t.select(["l_orderkey", "c_nationkey"]),
                           batch_format="pyarrow"),
            "l_orderkey",
            pa.schema([("l_orderkey", pa.int64()), ("s_suppkey", pa.int64()),
                       ("rev", pa.float64())]),
            pa.schema([("l_orderkey", pa.int64()), ("c_nationkey", pa.int64())]))

        def local_rollup(t: pa.Table) -> pa.Table:
            # Q5's signature predicate: customer + supplier share the nation
            same = pc.equal(t["c_nationkey"], t["s_nationkey"])
            same = same.combine_chunks() if isinstance(same, pa.ChunkedArray) else same
            f = t.filter(same)
            return f.group_by("s_nationkey").aggregate([("rev", "sum")]) \
                .rename_columns(["s_nationkey", "rev"])

        parts = cogroup_join_hp(
            j2.map_batches(lambda t: t.select(["s_suppkey", "rev",
                                               "c_nationkey"]),
                           batch_format="pyarrow"),
            supp, "s_suppkey",
            pa.schema([("s_suppkey", pa.int64()), ("rev", pa.float64()),
                       ("c_nationkey", pa.int64())]),
            pa.schema([("s_suppkey", pa.int64()), ("s_nationkey", pa.int64())]),
            post=local_rollup).take_all()
    merged = pa.Table.from_pylist(parts, schema=pa.schema(
        [("s_nationkey", pa.int64()), ("rev", pa.float64())]))
    out = merged.group_by("s_nationkey").aggregate([("rev", "sum")]) \
        .rename_columns(["s_nationkey", "revenue"])
    names = pa.array([nation_name[k] for k in
                      out["s_nationkey"].to_pylist()], pa.string())
    out = pa.table({"n_name": names, "revenue": out["revenue"]})
    out = _round_cols(out, {"revenue": 2})
    return out.sort_by([("revenue", "descending"), ("n_name", "ascending")])


SQL_LOCAL_SUPPLIER_VOLUME = """
select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
from customer join orders on c_custkey = o_custkey
              join lineitem on l_orderkey = o_orderkey
              join supplier on l_suppkey = s_suppkey
                           and c_nationkey = s_nationkey
              join nation on s_nationkey = n_nationkey
              join region on n_regionkey = r_regionkey
where r_name = 'ASIA'
  and o_orderdate >= timestamp '1996-01-01'
  and o_orderdate < timestamp '1998-01-01'
group by n_name
"""

REL_QUERIES["rel_local_supplier_volume"] = (q_local_supplier_volume,
                                            SQL_LOCAL_SUPPLIER_VOLUME)


def q_order_quartiles(sf_dir: str):
    """NTILE(4) window function per status partition (order by totalprice,
    key): ONE keyed shuffle, then a fully vectorized per-partition pass —
    sort by (status, price, key), segment boundaries from the key-change
    mask, exact SQL NTILE fill (first n%4 tiles one row larger) via
    np.repeat over per-segment tile sizes."""
    from ..ops.partition import partitioned_apply
    from ..ops.relational import _key_change_mask

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def tiles(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_orderstatus": pa.array([], pa.string()),
                             "tile": pa.array([], pa.int64())})
        t = t.sort_by([("o_orderstatus", "ascending"),
                       ("o_totalprice", "ascending"),
                       ("o_orderkey", "ascending")])
        n = t.num_rows
        starts = np.flatnonzero(_key_change_mask(t, ["o_orderstatus"]))
        ends = np.concatenate((starts[1:], [n]))
        tile = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):  # loop over STATUSES (low-card)
            m = e - s
            q, r = divmod(m, 4)
            sizes = np.full(min(4, m), q, dtype=np.int64)
            sizes[:r] += 1
            tile[s:e] = np.repeat(np.arange(1, len(sizes) + 1), sizes)
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderstatus": t["o_orderstatus"],
            "tile": pa.array(tile)})

    return partitioned_apply(ds, "o_orderstatus", tiles)


SQL_ORDER_QUARTILES = """
select o_orderkey, o_orderstatus,
       ntile(4) over (partition by o_orderstatus
                      order by o_totalprice, o_orderkey) as tile
from orders
"""

REL_QUERIES["rel_order_quartiles"] = (q_order_quartiles, SQL_ORDER_QUARTILES)


def q_status_priority_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((status), (priority)) — the explicit-set
    sibling of ROLLUP/CUBE (an arbitrary subset of the lattice, not the
    full expansion): one shared scan, one per-batch combiner aggregate per
    requested set, null-filled union. Output bounded by dimension
    cardinality at any corpus size."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderpriority", "o_totalprice"]) \
        .materialize()  # both set aggregates share one scan

    spec = [("o_totalprice", "sum"), (None, "count_all")]
    names = ["sum_price", "n_orders"]
    by_status = low_card_aggregate(ds, "o_orderstatus", spec, names)
    by_prio = low_card_aggregate(ds, "o_orderpriority", spec, names)

    def shape(status_col, prio_col):
        def f(t: pa.Table) -> pa.Table:
            t = _round_cols(t, {"sum_price": 2})
            n = t.num_rows
            return pa.table({
                "o_orderstatus": t[status_col] if status_col
                else pa.nulls(n, pa.string()),
                "o_orderpriority": t[prio_col] if prio_col
                else pa.nulls(n, pa.string()),
                "sum_price": t["sum_price"], "n_orders": t["n_orders"]})
        return f

    return by_status.map_batches(shape("o_orderstatus", None),
                                 batch_format="pyarrow").union(
        by_prio.map_batches(shape(None, "o_orderpriority"),
                            batch_format="pyarrow"))


SQL_STATUS_PRIORITY_SETS = """
select o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) as sum_price, count(*) as n_orders
from orders
group by grouping sets ((o_orderstatus), (o_orderpriority))
"""

REL_QUERIES["rel_status_priority_sets"] = (q_status_priority_sets,
                                           SQL_STATUS_PRIORITY_SETS)


def q_order_priority_exists(sf_dir: str):
    """TPC-H Q4 shape — correlated EXISTS as a distributed semi join:
    orders in a 3-month window are kept iff at least one of their lineitems
    has l_returnflag='R', then counted per priority. Scale shape: the
    R-lineitem orderkeys NEVER collect to the driver — the exact membership
    check is membership_filter_hp's ONE keyed shuffle (key rows ride as
    tagged rows next to the payload), and the final count is a per-batch
    combiner (priority has 5 values). Cf. the reference's existence-gated
    probe edges (ast/src/builder probes: emit iff a matching child row
    exists)."""
    from datetime import datetime

    from ..ops.partition import low_card_aggregate, membership_filter_hp

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
                   filter=_window_expr("o_orderdate", "1996-07-01",
                                       "1996-10-01"))

    def window(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(datetime(1996, 7, 1))),
            pc.less(t["o_orderdate"], pa.scalar(datetime(1996, 10, 1))))
        return t.filter(keep).select(["o_orderkey", "o_orderpriority"])

    win = orders.map_batches(window, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    # per-batch unique BEFORE the exchange: an order ships one key row, not
    # one per R lineitem (membership only needs presence)
    rkeys = li.map_batches(
        lambda t: pa.table({"o_orderkey": pc.unique(t.filter(
            pc.equal(t["l_returnflag"], "R"))["l_orderkey"]
            .combine_chunks())}),
        batch_format="pyarrow")

    kept = membership_filter_hp(
        win, rkeys, "o_orderkey", keep=True,
        payload_schema=pa.schema([("o_orderkey", pa.int64()),
                                  ("o_orderpriority", pa.string())]))
    return low_card_aggregate(kept, ["o_orderpriority"],
                              [(None, "count_all")], ["order_count"])


SQL_ORDER_PRIORITY_EXISTS = """
select o_orderpriority, count(*) as order_count
from orders
where o_orderdate >= timestamp '1996-07-01'
  and o_orderdate < timestamp '1996-10-01'
  and exists (select 1 from lineitem
              where l_orderkey = o_orderkey and l_returnflag = 'R')
group by o_orderpriority
"""

REL_QUERIES["rel_order_priority_exists"] = (q_order_priority_exists,
                                            SQL_ORDER_PRIORITY_EXISTS)


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — correlated scalar subquery against the SAME table
    (lineitems whose quantity is below 0.2x their part's average quantity):
    the grouped average and the row filter are fused into ONE hash
    partition by l_partkey (partitioned_apply), so the self-"join" never
    leaves the partition. The brand gate is a broadcast semi filter (part
    is the dim side: |partkeys of one brand| ~ |part|/25). The 0.2x-avg
    comparison is EXACT integer arithmetic (quantities are integral):
    qty < 0.2 * sum/cnt  <=>  5*qty*cnt < sum — no float division on
    either side, so only the final revenue sum needs the round(,2)
    convention."""
    from ..ops.partition import partitioned_apply
    from ..ops.relational import broadcast, _resolve

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    pk = part.map_batches(
        lambda t: pa.table({"p_partkey": t.filter(
            pc.equal(t["p_brand"], "Brand#1"))["p_partkey"]}),
        batch_format="pyarrow").unique("p_partkey")
    ref = broadcast(np.asarray(sorted(pk), dtype=np.int64))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def brand_gate(t: pa.Table) -> pa.Table:
        keys = _resolve(ref)
        got = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, got)
        idx[idx == len(keys)] = 0
        return t.filter(pa.array(keys[idx] == got))

    gated = li.map_batches(brand_gate, batch_format="pyarrow")

    def small_qty(t: pa.Table) -> pa.Table:
        import pandas as pd

        codes, _ = pd.factorize(
            t["l_partkey"].to_numpy(zero_copy_only=False))
        qty = t["l_quantity"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = np.bincount(codes)
        sumq = np.bincount(codes, weights=qty).astype(np.int64)
        keep = 5 * qty * cnt[codes] < sumq[codes]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({"sum_price": pa.array([float(price.sum())],
                                               pa.float64()),
                         "n_small": pa.array([int(keep.sum())], pa.int64())})

    parts = partitioned_apply(gated, "l_partkey", small_qty).take_all()
    total = sum(r["sum_price"] for r in parts)
    n = sum(r["n_small"] for r in parts)
    from ..util import round_half_away

    return pa.table({"avg_yearly": pa.array(
        round_half_away(np.array([total / 7.0]), 2), pa.float64()),
        "n_small": pa.array([n], pa.int64())})


SQL_SMALL_QTY_REVENUE = """
select round(sum(l.l_extendedprice) / 7.0, 2) as avg_yearly,
       count(*) as n_small
from lineitem l join part p on p.p_partkey = l.l_partkey
where p.p_brand = 'Brand#1'
  and 5 * cast(l.l_quantity as bigint)
        * (select count(*) from lineitem l2
           where l2.l_partkey = l.l_partkey)
      < (select cast(sum(l2.l_quantity) as bigint) from lineitem l2
         where l2.l_partkey = l.l_partkey)
"""

REL_QUERIES["rel_small_qty_revenue"] = (q_small_qty_revenue,
                                        SQL_SMALL_QTY_REVENUE)


def q_building_f_orders_full(sf_dir: str):
    """FULL OUTER equi-join — the last uncovered join type: BUILDING-segment
    customers x their 'F'-status order counts, keeping BOTH unmatched sides
    (customers with zero F orders AND F orders whose customer is outside
    the segment, c_name null). One cogroup_join_hp exchange; the per-key
    count is fused into the join's per-partition `post` hook (rows are
    still hash-co-located by custkey there, so the grouped count is
    globally correct without a second exchange)."""
    from ..ops.partition import cogroup_join_hp

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name",
                                              "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], "BUILDING"))
            .select(["c_custkey", "c_name"]), batch_format="pyarrow")
    def f_orders(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t["o_orderstatus"], "F"))
        return pa.table({"c_custkey": f["o_custkey"],
                         "o_orderkey": f["o_orderkey"]})

    ords = _read(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_orderstatus"]) \
        .map_batches(f_orders, batch_format="pyarrow")

    def count_per_cust(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_custkey", "c_name"]).aggregate(
            [("o_orderkey", "count")])
        return g.rename_columns(["c_custkey", "c_name", "f_orders"])

    return cogroup_join_hp(
        cust, ords, "c_custkey",
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_name", pa.string())]),
        right_schema=pa.schema([("c_custkey", pa.int64()),
                                ("o_orderkey", pa.int64())]),
        join_type="full outer", post=count_per_cust)


SQL_BUILDING_F_ORDERS_FULL = """
select coalesce(c.c_custkey, o.o_custkey) as c_custkey,
       c.c_name,
       count(o.o_orderkey) as f_orders
from (select c_custkey, c_name from customer
      where c_mktsegment = 'BUILDING') c
full join (select o_custkey, o_orderkey from orders
           where o_orderstatus = 'F') o
  on c.c_custkey = o.o_custkey
group by 1, 2
"""

REL_QUERIES["rel_full_outer_join"] = (q_building_f_orders_full,
                                      SQL_BUILDING_F_ORDERS_FULL)


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — conditional-share ratio over a fact x dim join:
    the % of a quarter's revenue that came from PROMO parts. The dim side
    (promo partkeys) is broadcast once (ray.put) and probed per batch with
    a searchsorted membership test; the two revenue sums are per-batch
    partials merged on the driver (2 doubles per block — no shuffle at any
    corpus size). Cf. the reference's conditional coverage rollups
    (ast/src/builder/utils.rs:61-74)."""
    from datetime import datetime

    from ..ops.relational import broadcast, _resolve

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    promo = np.sort(part.filter(pc.equal(part["p_type"], "PROMO"))
                    ["p_partkey"].to_numpy(zero_copy_only=False))
    ref = broadcast(promo)

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t["l_shipdate"],
                             pa.scalar(datetime(1997, 1, 1))),
            pc.less(t["l_shipdate"], pa.scalar(datetime(1997, 4, 1))))
        t = t.filter(keep)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"])) \
            .to_numpy(zero_copy_only=False)
        keys = _resolve(ref)
        got = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, got)
        if len(keys):
            idx[idx == len(keys)] = 0
            is_promo = keys[idx] == got
        else:
            is_promo = np.zeros(len(got), dtype=bool)
        return pa.table({
            "promo_rev": pa.array([float(rev[is_promo].sum())], pa.float64()),
            "total_rev": pa.array([float(rev.sum())], pa.float64())})

    parts = li.map_batches(partial, batch_format="pyarrow").take_all()
    promo_rev = sum(r["promo_rev"] for r in parts)
    total_rev = sum(r["total_rev"] for r in parts)
    from ..util import round_half_away

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "promo_pct": pa.array(
            round_half_away(np.array([100.0 * promo_rev / total_rev]), 4),
            pa.float64()),
        "total_rev": pa.array(
            round_half_away(np.array([total_rev]), 2), pa.float64())}))


SQL_PROMO_REVENUE = """
select round(100.0 * sum(case when p.p_type = 'PROMO'
                              then l.l_extendedprice * (1 - l.l_discount)
                              else 0 end)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) as promo_pct,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as total_rev
from lineitem l join part p on p.p_partkey = l.l_partkey
where l.l_shipdate >= timestamp '1997-01-01'
  and l.l_shipdate < timestamp '1997-04-01'
"""

REL_QUERIES["rel_promo_revenue"] = (q_promo_revenue, SQL_PROMO_REVENUE)


def q_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape — OR-of-conjunctions predicate join: revenue from
    three (brand, size-range, qty-range) branches. The dim attributes
    (partkey -> brand, size) are broadcast as parallel sorted arrays; each
    batch evaluates the whole disjunction vectorized (numpy boolean
    algebra) — no shuffle, one broadcast, partial sums to the driver."""
    from ..ops.relational import broadcast, _resolve

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    order = np.argsort(part["p_partkey"].to_numpy(zero_copy_only=False))
    ref = broadcast({
        "pk": part["p_partkey"].to_numpy(zero_copy_only=False)[order],
        "brand": part["p_brand"].to_numpy(zero_copy_only=False)[order],
        "size": part["p_size"].to_numpy(zero_copy_only=False)[order]})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    BRANCHES = [("Brand#1", 1, 15, 1, 20),
                ("Brand#2", 10, 30, 10, 30),
                ("Brand#3", 20, 50, 20, 40)]

    def partial(t: pa.Table) -> pa.Table:
        d = _resolve(ref)
        got = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(d["pk"], got)
        idx[idx == len(d["pk"])] = 0
        found = d["pk"][idx] == got
        brand, size = d["brand"][idx], d["size"][idx]
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = np.zeros(t.num_rows, dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in BRANCHES:
            keep |= ((brand == b) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        keep &= found
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"])) \
            .to_numpy(zero_copy_only=False)[keep]
        return pa.table({"revenue": pa.array([float(rev.sum())], pa.float64()),
                         "n_rows": pa.array([int(keep.sum())], pa.int64())})

    parts = li.map_batches(partial, batch_format="pyarrow").take_all()
    from ..util import round_half_away

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "revenue": pa.array(round_half_away(
            np.array([sum(r["revenue"] for r in parts)]), 2), pa.float64()),
        "n_rows": pa.array([sum(r["n_rows"] for r in parts)], pa.int64())}))


SQL_DISJUNCTIVE_REVENUE = """
select round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) as revenue,
       count(*) as n_rows
from lineitem l join part p on p.p_partkey = l.l_partkey
where (p.p_brand = 'Brand#1' and p.p_size between 1 and 15
       and l.l_quantity between 1 and 20)
   or (p.p_brand = 'Brand#2' and p.p_size between 10 and 30
       and l.l_quantity between 10 and 30)
   or (p.p_brand = 'Brand#3' and p.p_size between 20 and 50
       and l.l_quantity between 20 and 40)
"""

REL_QUERIES["rel_disjunctive_revenue"] = (q_disjunctive_revenue,
                                          SQL_DISJUNCTIVE_REVENUE)


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape — HAVING-subquery semi join: orders whose lineitems
    sum to > 250 units, with customer names. The qty rollup is ONE
    hash-partitioned aggregate (grouped_aggregate — orderkey is
    corpus-cardinality); the surviving keys stay a Dataset and meet orders
    in a second co-group exchange (cogroup_join_hp, never collected);
    customer is the broadcast dim side. Output is bounded by the HAVING
    selectivity (~1% of orders)."""
    from ..ops.partition import cogroup_join_hp, grouped_aggregate

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    totals = grouped_aggregate(li, "l_orderkey", [("l_quantity", "sum")],
                               ["total_qty"])
    big = totals.map_batches(
        lambda t: t.filter(pc.greater(t["total_qty"], 250.0))
        .rename_columns(["o_orderkey", "total_qty"]),
        batch_format="pyarrow")

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice",
                            "o_orderdate"])
    joined = cogroup_join_hp(
        orders, big, "o_orderkey",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64()),
                               ("o_totalprice", pa.float64()),
                               ("o_orderdate", pa.timestamp("us"))]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("total_qty", pa.float64())]),
        join_type="inner")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    out = broadcast_join(joined, cust, keys="o_custkey",
                         right_keys="c_custkey")
    return out.map_batches(lambda t: _round_cols(t, {"total_qty": 2}),
                           batch_format="pyarrow")


SQL_LARGE_ORDERS = """
select o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate,
       round(t.total_qty, 2) as total_qty, c.c_name
from orders o
join (select l_orderkey, sum(l_quantity) as total_qty
      from lineitem group by 1 having sum(l_quantity) > 250) t
  on t.l_orderkey = o.o_orderkey
join customer c on c.c_custkey = o.o_custkey
"""

REL_QUERIES["rel_large_orders"] = (q_large_orders, SQL_LARGE_ORDERS)


def q_idle_customer_balance(sf_dir: str):
    """TPC-H Q22 shape — scalar-subquery broadcast + anti join: customers
    whose balance exceeds the global positive-balance average AND who have
    placed no order since 2000-01-01, counted per nation. The global
    average is two integers (cent sum + count) merged from per-batch
    partials, so the 'above average' gate is EXACT integer arithmetic
    (cents * n > total_cents — no float boundary); the no-recent-order
    gate is membership_filter_hp's ONE keyed shuffle (recent-order
    custkeys never collect to the driver)."""
    from datetime import datetime

    from ..ops.partition import low_card_aggregate, membership_filter_hp
    from ..util import round_half_away

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def cents_partial(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = round_half_away(bal * 100.0, 0).astype(np.int64)
        pos = cents[cents > 0]
        return pa.table({"total": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([int(len(pos))], pa.int64())})

    parts = cust.map_batches(cents_partial, batch_format="pyarrow").take_all()
    total_cents = sum(r["total"] for r in parts)
    n_pos = sum(r["n"] for r in parts)

    def above_avg(t: pa.Table) -> pa.Table:
        bal = t["c_acctbal"].to_numpy(zero_copy_only=False)
        cents = round_half_away(bal * 100.0, 0).astype(np.int64)
        return t.filter(pa.array(cents * n_pos > total_cents))

    rich = cust.map_batches(above_avg, batch_format="pyarrow")

    import pyarrow.dataset as pds

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"],
                   filter=(pds.field("o_orderdate")
                           >= _ts("2000-01-01").as_py()))
    # per-batch unique: a customer with many recent orders ships ONE key row
    recent = orders.map_batches(
        lambda t: pa.table({"c_custkey": pc.unique(t.filter(
            pc.greater_equal(t["o_orderdate"],
                             pa.scalar(datetime(2000, 1, 1))))["o_custkey"]
            .combine_chunks())}),
        batch_format="pyarrow")

    idle = membership_filter_hp(
        rich, recent, "c_custkey", keep=False,
        payload_schema=pa.schema([("c_custkey", pa.int64()),
                                  ("c_nationkey", pa.int32()),
                                  ("c_acctbal", pa.float64())]))

    out = low_card_aggregate(idle, ["c_nationkey"],
                             [(None, "count_all"), ("c_acctbal", "sum")],
                             ["n_cust", "sum_bal"])

    def finish(t: pa.Table) -> pa.Table:
        t = _round_cols(t, {"sum_bal": 2})
        # the driver merge's from_pylist widens the int32 key; restore it
        return t.set_column(t.column_names.index("c_nationkey"),
                            "c_nationkey",
                            pc.cast(t["c_nationkey"], pa.int32()))

    return out.map_batches(finish, batch_format="pyarrow")


SQL_IDLE_CUSTOMER_BALANCE = """
with pos as (select cast(round(c_acctbal * 100) as bigint) as cents
             from customer where round(c_acctbal * 100) > 0),
     s as (select sum(cents) as total, count(*) as n from pos)
select c.c_nationkey, count(*) as n_cust,
       round(sum(c.c_acctbal), 2) as sum_bal
from customer c, s
where cast(round(c.c_acctbal * 100) as bigint) * s.n > s.total
  and not exists (select 1 from orders o
                  where o.o_custkey = c.c_custkey
                    and o.o_orderdate >= timestamp '2000-01-01')
group by c.c_nationkey
"""

REL_QUERIES["rel_idle_customer_balance"] = (q_idle_customer_balance,
                                            SQL_IDLE_CUSTOMER_BALANCE)


def q_range_search(sf_dir: str):
    """Similarity RANGE search (radius query) — the threshold sibling of
    sim_knn_bruteforce: ALL (query, vector) pairs with cosine >= 0.25,
    queries = vec_id < 3 broadcast as a normalized float64 matrix. Unlike
    top-k there is no reduce at all: each batch emits its qualifying pairs
    and the pipeline streams (output is data-dependent but the scan is one
    pass, no shuffle). The threshold is applied to the ROUND(cos, 4) value
    on both sides so the gate has no raw-float boundary."""
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qt = emb.filter(pc.less(emb["vec_id"], 3))
    qids = qt["vec_id"].to_numpy(zero_copy_only=False)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    from ..ops.relational import broadcast
    from ..util import make_task_stage, ref_key

    ref = broadcast({"qids": qids, "qm": qm})

    class RangeScorer:
        def __init__(self, ref):
            from ..ops.relational import _resolve
            d = _resolve(ref)
            self.qids, self.qm = d["qids"], d["qm"]

        def __call__(self, t: pa.Table) -> pa.Table:
            empty = pa.table({"query_id": pa.array([], pa.int64()),
                              "neighbor_id": pa.array([], pa.int64()),
                              "cos": pa.array([], pa.float64())})
            if t.num_rows == 0:
                return empty
            from ..ops.ann import _vecs_of
            from ..util import round_half_away

            m = _vecs_of(t["embedding"])
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            cos = round_half_away(m @ self.qm.T, 4)  # (batch, nq)
            vec_ids = t["vec_id"].to_numpy(zero_copy_only=False)
            rows, cols = np.nonzero(cos >= 0.25)
            if not len(rows):
                return empty
            return pa.table({
                "query_id": pa.array(self.qids[cols], pa.int64()),
                "neighbor_id": pa.array(vec_ids[rows], pa.int64()),
                "cos": pa.array(cos[rows, cols], pa.float64())})

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    return ds.map_batches(make_task_stage(RangeScorer, ref_key(ref), ref=ref),
                          batch_format="pyarrow")


SQL_RANGE_SEARCH = """
with q as (select vec_id as qid, embedding as qe
           from embeddings where vec_id < 3)
select q.qid as query_id, e.vec_id as neighbor_id,
       cast(round(list_cosine_similarity(q.qe, e.embedding), 4) as double) as cos
from q, embeddings e
where round(cast(list_cosine_similarity(q.qe, e.embedding) as double), 4)
      >= 0.25
"""

REL_QUERIES["sim_range_search"] = (q_range_search, SQL_RANGE_SEARCH)


def q_moving_avg(sf_dir: str):
    """Time-RANGE window frame (the one window shape the suite lacked —
    ROWS frames, ranks, lags and ntiles are covered elsewhere): per user,
    the running 3-day moving sum/avg of event value, frame = RANGE BETWEEN
    INTERVAL 3 DAYS PRECEDING AND CURRENT ROW (peers included on both
    ends, per SQL RANGE semantics). ONE keyed shuffle on user_id, then a
    vectorized per-partition kernel: sort by (user, ts), int64-cents
    prefix sums (exact — no float window-sum drift), per-run searchsorted
    for the [ts-3d, ts] bounds. The avg divides two exact integers in
    double, so every output is bit-reproducible."""
    from ..ops.partition import partitioned_apply
    from ..util import round_half_away

    WINDOW_US = 3 * 86400 * 1_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def kernel(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        n = t.num_rows
        ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = round_half_away(val * 100.0, 0).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(cents)))
        from ..ops.relational import _key_change_mask

        starts = np.flatnonzero(_key_change_mask(t, ["user_id"]))
        bounds = np.concatenate((starts, [n]))
        lo = np.empty(n, np.int64)
        hi = np.empty(n, np.int64)
        for b, e in zip(bounds[:-1], bounds[1:]):   # one searchsorted per run
            seg = ts[b:e]
            lo[b:e] = b + np.searchsorted(seg, seg - WINDOW_US, side="left")
            hi[b:e] = b + np.searchsorted(seg, seg, side="right")
        cnt = hi - lo
        sumc = cum[hi] - cum[lo]
        return pa.table({
            "user_id": t["user_id"], "ts": t["ts"],
            "n_window": pa.array(cnt, pa.int64()),
            "win_sum": pa.array(round_half_away(sumc / 100.0, 2),
                                pa.float64()),
            "win_avg": pa.array(round_half_away(
                (sumc / cnt) / 100.0, 4), pa.float64())})

    return partitioned_apply(ds, "user_id", kernel)


SQL_MOVING_AVG = """
with e as (select user_id, ts,
                  cast(round(value * 100) as bigint) as cents from events)
select user_id, ts,
       count(*) over w as n_window,
       round(sum(cents) over w / 100.0, 2) as win_sum,
       round((sum(cents) over w / cast(count(*) over w as double)) / 100.0,
             4) as win_avg
from e
window w as (partition by user_id order by ts
             range between interval 3 days preceding and current row)
"""

REL_QUERIES["rel_moving_avg"] = (q_moving_avg, SQL_MOVING_AVG)


# ------------------------------------------------- lineitem ⋈ orders family
#
# TPC-H Q7/Q8/Q10/Q12 share one distributed shape: every dimension
# (nation/region/customer/supplier/part) broadcasts as a small map, and the
# only corpus-scale exchange is lineitem ⋈ orders on orderkey — expressed
# once here as a cogroup join with the query's rollup fused into the
# per-partition ``post`` hook, so each query is exactly ONE keyed shuffle
# whose output is partial aggregates bounded by the group cardinality.
# Cf. the reference's repeated "edges ⋈ nodes then reduce" linker passes
# (ast/src/lang/linker.rs) composed at warehouse shape.

def _li_orders_cogroup(sf_dir: str, li_map, ord_map, li_schema: pa.Schema,
                       ord_schema: pa.Schema, post, out_schema: pa.Schema,
                       li_cols=None, ord_cols=None,
                       li_filter=None, ord_filter=None) -> pa.Table:
    """ONE co-group exchange lineitem ⋈ orders on l_orderkey; ``post`` runs
    per partition on the joined rows (still key-co-located) and must emit
    group-bounded partials; the driver merges them into ``out_schema``.

    ``li_filter`` / ``ord_filter``: optional pyarrow.dataset expressions
    pushed into the Parquet scan — at warehouse scale a date-windowed query
    skips whole row groups at the read instead of shipping them to the map
    stage (the SURVEY prune-at-the-read rule); the map fns keep their own
    exact filters, so pushdown is purely an I/O optimization."""
    from ..ops.partition import cogroup_join_hp

    lkw = {"filter": li_filter} if li_filter is not None else {}
    okw = {"filter": ord_filter} if ord_filter is not None else {}
    li = _read(sf_dir, "lineitem", columns=li_cols, **lkw) \
        .map_batches(li_map, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", columns=ord_cols, **okw) \
        .map_batches(ord_map, batch_format="pyarrow")
    parts = cogroup_join_hp(li, orders, "l_orderkey", li_schema, ord_schema,
                            post=post).take_all()
    return pa.Table.from_pylist(parts, schema=out_schema)


def _ts(day: str) -> pa.Scalar:
    return pa.scalar(np.datetime64(day, "us"), pa.timestamp("us"))


def _window_expr(col: str, lo: str, hi: str):
    """pyarrow.dataset scan filter for a [lo, hi) timestamp window."""
    import pyarrow.dataset as pds

    f = pds.field(col)
    return (f >= _ts(lo).as_py()) & (f < _ts(hi).as_py())


def _between(t: pa.Table, col: str, lo: str, hi: str) -> pa.Table:
    d = pc.cast(t[col], pa.timestamp("us"))
    keep = pc.and_(pc.greater_equal(d, _ts(lo)), pc.less(d, _ts(hi)))
    keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
    return t.filter(keep)


def _dim_map(sf_dir: str, table: str, key: str, val: str) -> dict:
    """key -> val dict from a dimension parquet (driver-side, dim-bounded)."""
    t = pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
    return dict(zip(t[key].to_pylist(), t[val].to_pylist()))


def _map_filter(t: pa.Table, col: str, ref, out: str,
                keep_cols: list[str]) -> pa.Table:
    """Map ``col`` through a broadcast dict; drop rows with no entry.
    Vectorized pd.Series.map over the per-worker cached broadcast."""
    import pandas as pd

    from ..ops.relational import _cached_resolve

    m = _cached_resolve(ref)
    mapped = pd.Series(t[col].to_numpy(zero_copy_only=False)).map(m)
    keep = mapped.notna().to_numpy()
    cols = {c: t[c].combine_chunks().take(pa.array(np.flatnonzero(keep)))
            if isinstance(t[c], pa.ChunkedArray)
            else t[c].take(pa.array(np.flatnonzero(keep)))
            for c in keep_cols}
    cols[out] = pa.array(mapped.to_numpy(dtype=np.float64)[keep]
                         .astype(np.int64))
    return pa.table(cols)


def q_nation_trade_volume(sf_dir: str,
                          nations: tuple[str, str] = ("NATION_3",
                                                      "NATION_8")):
    """TPC-H Q7 shape — two-nation trade volume by year: lineitems shipped
    1996-1997 where the SUPPLIER sits in one of the two nations and the
    ordering CUSTOMER in the other. Supplier and customer nation maps are
    broadcast (dims), restricted to the two target nations so both join
    inputs prune to ~2/|nations| of the corpus BEFORE the one orderkey
    exchange; the cross-pair filter and (supp_nation, cust_nation, year)
    rollup are fused into the join partition."""
    from ..ops.relational import broadcast

    nat = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    target = {k: v for k, v in nat.items() if v in nations}
    smap = {k: v for k, v in _dim_map(sf_dir, "supplier", "s_suppkey",
                                      "s_nationkey").items() if v in target}
    cmap = {k: v for k, v in _dim_map(sf_dir, "customer", "c_custkey",
                                      "c_nationkey").items() if v in target}
    sref, cref = broadcast(smap), broadcast(cmap)

    def li_map(t: pa.Table, _ref=sref) -> pa.Table:
        from ..util import round_half_away

        f = _between(t, "l_shipdate", "1996-01-01", "1998-01-01")
        vol = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        # integer-cents accumulation: half-cent ties round identically per
        # row on both sides, and int64 sums are order-independent
        cents = round_half_away(
            vol.to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        year = pc.cast(pc.year(pc.cast(f["l_shipdate"],
                                       pa.timestamp("us"))), pa.int64())
        f = pa.table({"l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
                      "l_suppkey": pc.cast(f["l_suppkey"], pa.int64()),
                      "l_year": year, "volume": pa.array(cents, pa.int64())})
        return _map_filter(f, "l_suppkey", _ref, "s_nat",
                           ["l_orderkey", "l_year", "volume"])

    def ord_map(t: pa.Table, _ref=cref) -> pa.Table:
        f = pa.table({"l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                      "o_custkey": pc.cast(t["o_custkey"], pa.int64())})
        return _map_filter(f, "o_custkey", _ref, "c_nat", ["l_orderkey"])

    def post(t: pa.Table) -> pa.Table:
        cross = pc.invert(pc.equal(t["s_nat"], t["c_nat"]))
        cross = cross.combine_chunks() if isinstance(cross, pa.ChunkedArray) else cross
        f = t.filter(cross)
        return f.group_by(["s_nat", "c_nat", "l_year"]) \
            .aggregate([("volume", "sum")]) \
            .rename_columns(["s_nat", "c_nat", "l_year", "volume"])

    out = _li_orders_cogroup(
        sf_dir, li_map, ord_map,
        pa.schema([("l_orderkey", pa.int64()), ("l_year", pa.int64()),
                   ("volume", pa.int64()), ("s_nat", pa.int64())]),
        pa.schema([("l_orderkey", pa.int64()), ("c_nat", pa.int64())]),
        post,
        pa.schema([("s_nat", pa.int64()), ("c_nat", pa.int64()),
                   ("l_year", pa.int64()), ("volume", pa.int64())]),
        li_cols=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
        ord_cols=["o_orderkey", "o_custkey"],
        li_filter=_window_expr("l_shipdate", "1996-01-01", "1998-01-01"))
    merged = out.group_by(["s_nat", "c_nat", "l_year"]) \
        .aggregate([("volume", "sum")]) \
        .rename_columns(["s_nat", "c_nat", "l_year", "volume"])
    res = pa.table({
        "supp_nation": pa.array([nat[k] for k in
                                 merged["s_nat"].to_pylist()], pa.string()),
        "cust_nation": pa.array([nat[k] for k in
                                 merged["c_nat"].to_pylist()], pa.string()),
        "l_year": merged["l_year"],
        "revenue": pc.divide(pc.cast(merged["volume"], pa.float64()),
                             pa.scalar(100.0))})
    return res.sort_by([("supp_nation", "ascending"),
                        ("cust_nation", "ascending"),
                        ("l_year", "ascending")])


SQL_NATION_TRADE_VOLUME = """
select n1.n_name as supp_nation, n2.n_name as cust_nation,
       cast(extract(year from l_shipdate) as bigint) as l_year,
       sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                as bigint)) / 100.0 as revenue
from supplier join lineitem on s_suppkey = l_suppkey
     join orders on o_orderkey = l_orderkey
     join customer on c_custkey = o_custkey
     join nation n1 on s_nationkey = n1.n_nationkey
     join nation n2 on c_nationkey = n2.n_nationkey
where ((n1.n_name = 'NATION_3' and n2.n_name = 'NATION_8')
    or (n1.n_name = 'NATION_8' and n2.n_name = 'NATION_3'))
  and l_shipdate >= timestamp '1996-01-01'
  and l_shipdate < timestamp '1998-01-01'
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year
"""

REL_QUERIES["rel_nation_trade_volume"] = (q_nation_trade_volume,
                                          SQL_NATION_TRADE_VOLUME)


def q_priority_line_counts(sf_dir: str):
    """TPC-H Q12 shape — per return-flag class, how many lineitems shipped
    in 1996 belong to HIGH-priority orders (1-URGENT/2-HIGH) vs the rest:
    the join + CASE-bucketed count. ONE orderkey co-group exchange; the
    CASE rollup is fused per partition (3-row partials), driver merges."""
    HIGH = ("1-URGENT", "2-HIGH")

    def li_map(t: pa.Table) -> pa.Table:
        f = _between(t, "l_shipdate", "1996-01-01", "1997-01-01")
        return pa.table({"l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
                         "l_returnflag": f["l_returnflag"]})

    def ord_map(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t["o_orderpriority"],
                      value_set=pa.array(sorted(HIGH)))
        return pa.table({"l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "is_high": pc.cast(hi, pa.int64())})

    def post(t: pa.Table) -> pa.Table:
        g = t.group_by("l_returnflag").aggregate(
            [("is_high", "sum"), ([], "count_all")])
        return g.rename_columns(["l_returnflag", "high", "n"])

    out = _li_orders_cogroup(
        sf_dir, li_map, ord_map,
        pa.schema([("l_orderkey", pa.int64()), ("l_returnflag", pa.string())]),
        pa.schema([("l_orderkey", pa.int64()), ("is_high", pa.int64())]),
        post,
        pa.schema([("l_returnflag", pa.string()), ("high", pa.int64()),
                   ("n", pa.int64())]),
        li_cols=["l_orderkey", "l_returnflag", "l_shipdate"],
        ord_cols=["o_orderkey", "o_orderpriority"],
        li_filter=_window_expr("l_shipdate", "1996-01-01", "1997-01-01"))
    m = out.group_by("l_returnflag").aggregate([("high", "sum"), ("n", "sum")])
    return pa.table({
        "l_returnflag": m["l_returnflag"],
        "high_line_count": m["high_sum"],
        "low_line_count": pc.subtract(m["n_sum"], m["high_sum"]),
    }).sort_by([("l_returnflag", "ascending")])


SQL_PRIORITY_LINE_COUNTS = """
select l_returnflag,
       cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 1 else 0 end) as bigint) as high_line_count,
       cast(sum(case when o_orderpriority in ('1-URGENT', '2-HIGH')
                then 0 else 1 end) as bigint) as low_line_count
from orders join lineitem on o_orderkey = l_orderkey
where l_shipdate >= timestamp '1996-01-01'
  and l_shipdate < timestamp '1997-01-01'
group by l_returnflag order by l_returnflag
"""

REL_QUERIES["rel_priority_line_counts"] = (q_priority_line_counts,
                                           SQL_PRIORITY_LINE_COUNTS)


def _key_filter(t: pa.Table, col: str, ref) -> pa.Table:
    """Keep rows whose ``col`` is in the broadcast int64 key array."""
    from ..ops.relational import _cached_resolve

    keys = _cached_resolve(ref)
    keep = pc.is_in(pc.cast(t[col], pa.int64()), value_set=pa.array(keys))
    keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
    return t.filter(keep)


def q_market_share(sf_dir: str, target_nation: str = "NATION_3",
                   market_region: str = "ASIA", part_type: str = "PROMO"):
    """TPC-H Q8 shape — the target nation's supplier share of PROMO-part
    volume sold into the ASIA market per year. All four dims broadcast
    (PROMO part keys, ASIA customer keys, supplier→nation, nation names);
    lineitem prunes to the part set and orders to the region customers
    BEFORE the one orderkey exchange, where the (year, is_target) two-sum
    rollup is fused. The share is a driver-side divide of two partial-sum
    doubles, round 6."""
    from ..ops.relational import broadcast

    nat = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    tkey = {k for k, v in nat.items() if v == target_nation}
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = set(reg.filter(pc.equal(reg["r_name"], market_region))
             ["r_regionkey"].to_pylist())
    region_nations = {k for k, v in _dim_map(
        sf_dir, "nation", "n_nationkey", "n_regionkey").items() if v in rk}

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pkeys = np.asarray(part.filter(pc.equal(part["p_type"], part_type))
                       ["p_partkey"].to_pylist(), np.int64)
    ckeys = np.asarray(sorted(
        k for k, v in _dim_map(sf_dir, "customer", "c_custkey",
                               "c_nationkey").items()
        if v in region_nations), np.int64)
    smap = _dim_map(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    starget = np.asarray(sorted(k for k, v in smap.items() if v in tkey),
                         np.int64)
    pref, cref, sref = broadcast(pkeys), broadcast(ckeys), broadcast(starget)

    def li_map(t: pa.Table, _pref=pref, _sref=sref) -> pa.Table:
        from ..ops.relational import _cached_resolve

        f = _key_filter(t, "l_partkey", _pref)
        vol = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        is_tgt = pc.cast(pc.is_in(pc.cast(f["l_suppkey"], pa.int64()),
                                  value_set=pa.array(_cached_resolve(_sref))),
                         pa.float64())
        return pa.table({"l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
                         "volume": vol,
                         "tgt_volume": pc.multiply(vol, is_tgt)})

    def ord_map(t: pa.Table, _cref=cref) -> pa.Table:
        f = _between(t, "o_orderdate", "1996-01-01", "1998-01-01")
        f = _key_filter(f, "o_custkey", _cref)
        year = pc.cast(pc.year(pc.cast(f["o_orderdate"], pa.timestamp("us"))),
                       pa.int64())
        return pa.table({"l_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
                         "o_year": year})

    def post(t: pa.Table) -> pa.Table:
        return t.group_by("o_year").aggregate(
            [("volume", "sum"), ("tgt_volume", "sum")]) \
            .rename_columns(["o_year", "volume", "tgt_volume"])

    out = _li_orders_cogroup(
        sf_dir, li_map, ord_map,
        pa.schema([("l_orderkey", pa.int64()), ("volume", pa.float64()),
                   ("tgt_volume", pa.float64())]),
        pa.schema([("l_orderkey", pa.int64()), ("o_year", pa.int64())]),
        post,
        pa.schema([("o_year", pa.int64()), ("volume", pa.float64()),
                   ("tgt_volume", pa.float64())]),
        li_cols=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
        ord_cols=["o_orderkey", "o_custkey", "o_orderdate"],
        ord_filter=_window_expr("o_orderdate", "1996-01-01", "1998-01-01"))
    m = out.group_by("o_year").aggregate(
        [("volume", "sum"), ("tgt_volume", "sum")])
    share = pc.divide(m["tgt_volume_sum"], m["volume_sum"])
    res = pa.table({"o_year": m["o_year"], "mkt_share": share})
    res = _round_cols(res, {"mkt_share": 6})
    return res.sort_by([("o_year", "ascending")])


SQL_MARKET_SHARE = """
select o_year,
       round(sum(case when nation = 'NATION_3' then volume else 0 end)
             / sum(volume), 6) as mkt_share
from (select cast(extract(year from o_orderdate) as bigint) as o_year,
             l_extendedprice * (1 - l_discount) as volume,
             n2.n_name as nation
      from part join lineitem on p_partkey = l_partkey
           join supplier on s_suppkey = l_suppkey
           join orders on l_orderkey = o_orderkey
           join customer on o_custkey = c_custkey
           join nation n1 on c_nationkey = n1.n_nationkey
           join region on n1.n_regionkey = r_regionkey
           join nation n2 on s_nationkey = n2.n_nationkey
      where r_name = 'ASIA' and p_type = 'PROMO'
        and o_orderdate >= timestamp '1996-01-01'
        and o_orderdate < timestamp '1998-01-01') t
group by o_year order by o_year
"""

REL_QUERIES["rel_market_share"] = (q_market_share, SQL_MARKET_SHARE)


def q_product_profit(sf_dir: str, name_like: str = "widget"):
    """TPC-H Q9 shape — per (supplier nation, order year) revenue over the
    parts whose name contains a token (the LIKE-driven star join). Part-key
    set and supplier→nation map broadcast; lineitem prunes to matching
    parts before the one orderkey exchange; (nation, year) rollup fused."""
    from ..ops.relational import broadcast

    nat = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    hit = pc.match_substring(part["p_name"], name_like)
    pkeys = np.asarray(part.filter(hit)["p_partkey"].to_pylist(), np.int64)
    smap = _dim_map(sf_dir, "supplier", "s_suppkey", "s_nationkey")
    pref, sref = broadcast(pkeys), broadcast(smap)

    def li_map(t: pa.Table, _pref=pref, _sref=sref) -> pa.Table:
        from ..util import round_half_away

        f = _key_filter(t, "l_partkey", _pref)
        amount = pc.multiply(f["l_extendedprice"],
                             pc.subtract(pa.scalar(1.0), f["l_discount"]))
        # 4-decimal amounts sit EXACTLY on half-cent ties: round per row to
        # integer cents (bit-identical on both sides), sum exactly as int64
        cents = round_half_away(
            amount.to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        f = pa.table({"l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
                      "l_suppkey": pc.cast(f["l_suppkey"], pa.int64()),
                      "amount": pa.array(cents, pa.int64())})
        return _map_filter(f, "l_suppkey", _sref, "s_nat",
                           ["l_orderkey", "amount"])

    def ord_map(t: pa.Table) -> pa.Table:
        year = pc.cast(pc.year(pc.cast(t["o_orderdate"], pa.timestamp("us"))),
                       pa.int64())
        return pa.table({"l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                         "o_year": year})

    def post(t: pa.Table) -> pa.Table:
        return t.group_by(["s_nat", "o_year"]).aggregate(
            [("amount", "sum")]).rename_columns(["s_nat", "o_year", "amount"])

    out = _li_orders_cogroup(
        sf_dir, li_map, ord_map,
        pa.schema([("l_orderkey", pa.int64()), ("amount", pa.int64()),
                   ("s_nat", pa.int64())]),
        pa.schema([("l_orderkey", pa.int64()), ("o_year", pa.int64())]),
        post,
        pa.schema([("s_nat", pa.int64()), ("o_year", pa.int64()),
                   ("amount", pa.int64())]),
        li_cols=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
        ord_cols=["o_orderkey", "o_orderdate"])
    m = out.group_by(["s_nat", "o_year"]).aggregate([("amount", "sum")])
    res = pa.table({
        "nation": pa.array([nat[k] for k in m["s_nat"].to_pylist()],
                           pa.string()),
        "o_year": m["o_year"],
        "sum_profit": pc.divide(pc.cast(m["amount_sum"], pa.float64()),
                                pa.scalar(100.0))})
    return res.sort_by([("nation", "ascending"), ("o_year", "ascending")])


SQL_PRODUCT_PROFIT = """
select n_name as nation,
       cast(extract(year from o_orderdate) as bigint) as o_year,
       sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                as bigint)) / 100.0 as sum_profit
from part join lineitem on p_partkey = l_partkey
     join supplier on s_suppkey = l_suppkey
     join orders on o_orderkey = l_orderkey
     join nation on s_nationkey = n_nationkey
where p_name like '%widget%'
group by n_name, o_year order by n_name, o_year
"""

REL_QUERIES["rel_product_profit"] = (q_product_profit, SQL_PRODUCT_PROFIT)


def q_returned_item_revenue(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape — top-k customers by revenue lost to returned ('R')
    lineitems on H1-1996 orders, with customer attributes. The only
    corpus-scale exchange is the orderkey co-group (lineitem pre-filtered
    to R rows); per-custkey cents partials are dim-bounded, the driver
    merges them, and the customer/nation attribute join + top-k run on the
    merged dim-sized table. Ties at rank k are pinned by c_custkey."""
    from ..util import round_half_away

    def li_map(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], "R")
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        f = t.filter(keep)
        vol = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        cents = round_half_away(
            vol.to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        return pa.table({"l_orderkey": pc.cast(f["l_orderkey"], pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    def ord_map(t: pa.Table) -> pa.Table:
        f = _between(t, "o_orderdate", "1996-01-01", "1996-07-01")
        return pa.table({"l_orderkey": pc.cast(f["o_orderkey"], pa.int64()),
                         "o_custkey": pc.cast(f["o_custkey"], pa.int64())})

    def post(t: pa.Table) -> pa.Table:
        return t.group_by("o_custkey").aggregate([("cents", "sum")]) \
            .rename_columns(["o_custkey", "cents"])

    out = _li_orders_cogroup(
        sf_dir, li_map, ord_map,
        pa.schema([("l_orderkey", pa.int64()), ("cents", pa.int64())]),
        pa.schema([("l_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        post,
        pa.schema([("o_custkey", pa.int64()), ("cents", pa.int64())]),
        li_cols=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
        ord_cols=["o_orderkey", "o_custkey", "o_orderdate"],
        ord_filter=_window_expr("o_orderdate", "1996-01-01", "1996-07-01"))
    m = out.group_by("o_custkey").aggregate([("cents", "sum")])
    m = m.sort_by([("cents_sum", "descending"), ("o_custkey", "ascending")]) \
        .slice(0, k)
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_nationkey"])
    nat = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    # attribute lookup only for the k winners: never pylist the whole
    # customer table on the driver (k rows, not |customer| dicts)
    cust = cust.filter(pc.is_in(
        pc.cast(cust["c_custkey"], pa.int64()),
        value_set=pa.array(m["o_custkey"].to_pylist(), pa.int64())))
    attrs = {r["c_custkey"]: r for r in cust.to_pylist()}
    rows = []
    for ck, cents in zip(m["o_custkey"].to_pylist(),
                         m["cents_sum"].to_pylist()):
        a = attrs[ck]
        rows.append({"c_custkey": ck, "c_name": a["c_name"],
                     "revenue": cents / 100.0, "c_acctbal": a["c_acctbal"],
                     "n_name": nat[a["c_nationkey"]]})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()),
         ("revenue", pa.float64()), ("c_acctbal", pa.float64()),
         ("n_name", pa.string())]))


SQL_RETURNED_ITEM_REVENUE = """
select c_custkey, c_name,
       sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint))
           / 100.0 as revenue,
       c_acctbal, n_name
from customer join orders on c_custkey = o_custkey
     join lineitem on l_orderkey = o_orderkey
     join nation on c_nationkey = n_nationkey
where o_orderdate >= timestamp '1996-01-01'
  and o_orderdate < timestamp '1996-07-01'
  and l_returnflag = 'R'
group by c_custkey, c_name, c_acctbal, n_name
order by revenue desc, c_custkey limit 20
"""

REL_QUERIES["rel_returned_item_revenue"] = (q_returned_item_revenue,
                                            SQL_RETURNED_ITEM_REVENUE)


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape — the supplier(s) whose Q1-1996 revenue equals the
    global maximum (the view + scalar-subquery-max pattern, ties kept).
    Per-batch combiner partials by suppkey (supplier is a dim, so the
    partial table is dim-bounded — no shuffle at all); exact integer-cents
    revenue makes the max-equality tie test deterministic."""
    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    ds = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                        "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        f = _between(t, "l_shipdate", "1996-01-01", "1996-04-01")
        vol = pc.multiply(f["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), f["l_discount"]))
        cents = round_half_away(
            vol.to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        return pa.table({"s_suppkey": pc.cast(f["l_suppkey"], pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    empty = pa.table({"s_suppkey": pa.array([], pa.int64()),
                      "cents": pa.array([], pa.int64())})
    try:
        rev = low_card_aggregate(
            ds.map_batches(prep, batch_format="pyarrow"),
            "s_suppkey", [("cents", "sum")], ["cents"])
        t = pa.Table.from_pylist(rev.take_all(), schema=empty.schema)
    except ValueError:   # window matched nothing anywhere -> typed empty
        t = empty
    mx = pc.max(t["cents"])
    top = t.filter(pc.equal(t["cents"], mx))
    names = _dim_map(sf_dir, "supplier", "s_suppkey", "s_name")
    out = pa.table({
        "s_suppkey": top["s_suppkey"],
        "s_name": pa.array([names[k] for k in top["s_suppkey"].to_pylist()],
                           pa.string()),
        "total_revenue": pc.divide(pc.cast(top["cents"], pa.float64()),
                                   pa.scalar(100.0))})
    return out.sort_by([("s_suppkey", "ascending")])


SQL_TOP_SUPPLIER = """
with revenue as (
  select l_suppkey as s_suppkey,
         sum(cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint))
             / 100.0 as total_revenue
  from lineitem
  where l_shipdate >= timestamp '1996-01-01'
    and l_shipdate < timestamp '1996-04-01'
  group by l_suppkey)
select r.s_suppkey, s_name, total_revenue
from revenue r join supplier on r.s_suppkey = supplier.s_suppkey
where total_revenue = (select max(total_revenue) from revenue)
order by r.s_suppkey
"""

REL_QUERIES["rel_top_supplier"] = (q_top_supplier, SQL_TOP_SUPPLIER)


def q_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape — the customer-order-count distribution including
    the ZERO bucket (the LEFT OUTER JOIN + double aggregate). No join is
    executed at all: every o_custkey is a customer (enforced referential
    integrity), so the per-custkey count is ONE hash-partitioned aggregate
    over filtered orders, the count histogram is a combiner aggregate over
    that dim-bounded table, and the zero bucket is total-customers minus
    the histogram mass — parquet-metadata arithmetic on the driver."""
    from ..ops.partition import grouped_aggregate, low_card_aggregate

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def keep(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t["o_orderpriority"], "1-URGENT"))
        m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
        return pa.table({"o_custkey": pc.cast(t.filter(m)["o_custkey"],
                                              pa.int64())})

    per_cust = grouped_aggregate(orders.map_batches(keep,
                                                    batch_format="pyarrow"),
                                 "o_custkey", [([], "count_all")],
                                 ["c_count"])
    hist = low_card_aggregate(per_cust, "c_count", [(None, "count_all")],
                              ["custdist"])
    t = pa.Table.from_pylist(hist.take_all(), schema=pa.schema(
        [("c_count", pa.int64()), ("custdist", pa.int64())]))
    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    zero = n_cust - pc.sum(t["custdist"]).as_py()
    if zero:
        t = pa.concat_tables([t, pa.Table.from_pylist(
            [{"c_count": 0, "custdist": zero}], schema=t.schema)])
    return t.sort_by([("custdist", "descending"), ("c_count", "descending")])


SQL_CUSTOMER_ORDER_DISTRIBUTION = """
select c_count, count(*) as custdist
from (select c_custkey, count(o_custkey) as c_count
      from customer left outer join orders
           on c_custkey = o_custkey and o_orderpriority <> '1-URGENT'
      group by c_custkey) t
group by c_count
order by custdist desc, c_count desc
"""

REL_QUERIES["rel_customer_order_distribution"] = (
    q_customer_order_distribution, SQL_CUSTOMER_ORDER_DISTRIBUTION)


def q_sole_blame_supplier(sf_dir: str, k: int = 10):
    """TPC-H Q21 shape adapted to this schema (no commit/receipt dates):
    on orders with >= 2 distinct suppliers, find the lineitems' single
    supplier with a returned ('R') line while no other supplier on the
    order has one — the EXISTS / NOT-EXISTS self-join pair. ONE orderkey
    hash partition; per partition the exists tests are two vectorized
    group_by passes (distinct-supplier count, distinct-R-supplier count +
    its min = the culprit when unique), and only dim-bounded per-supplier
    partial counts leave the worker. Top-k pinned by s_name."""
    from ..ops.partition import partitioned_apply

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "is_r": pc.equal(t["l_returnflag"], "R")})

    def blame(t: pa.Table) -> pa.Table:
        g_all = t.group_by("l_orderkey").aggregate(
            [("l_suppkey", "count_distinct")]) \
            .rename_columns(["l_orderkey", "nsupp"])
        rmask = t["is_r"].combine_chunks() if isinstance(t["is_r"], pa.ChunkedArray) else t["is_r"]
        rf = t.filter(rmask)
        g_r = rf.group_by("l_orderkey").aggregate(
            [("l_suppkey", "count_distinct"), ("l_suppkey", "min")]) \
            .rename_columns(["l_orderkey", "nr", "culprit"])
        j = g_all.join(g_r, keys=["l_orderkey"], join_type="inner")
        hit = pc.and_(pc.greater_equal(j["nsupp"], 2), pc.equal(j["nr"], 1))
        hit = hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit
        f = j.filter(hit)
        return f.group_by("culprit").aggregate([([], "count_all")]) \
            .rename_columns(["s_suppkey", "blame_ct"])

    parts = partitioned_apply(ds.map_batches(prep, batch_format="pyarrow"),
                              "l_orderkey", blame).take_all()
    m = pa.Table.from_pylist(parts, schema=pa.schema(
        [("s_suppkey", pa.int64()), ("blame_ct", pa.int64())]))
    m = m.group_by("s_suppkey").aggregate([("blame_ct", "sum")]) \
        .rename_columns(["s_suppkey", "blame_ct"])
    names = _dim_map(sf_dir, "supplier", "s_suppkey", "s_name")
    out = pa.table({
        "s_name": pa.array([names[key] for key in
                            m["s_suppkey"].to_pylist()], pa.string()),
        "blame_ct": m["blame_ct"]})
    return out.sort_by([("blame_ct", "descending"),
                        ("s_name", "ascending")]).slice(0, k)


SQL_SOLE_BLAME_SUPPLIER = """
select s_name, count(*) as blame_ct from (
  select min(case when l_returnflag = 'R' then l_suppkey end) as culprit
  from lineitem group by l_orderkey
  having count(distinct l_suppkey) >= 2
     and count(distinct case when l_returnflag = 'R' then l_suppkey end) = 1
) t join supplier on culprit = s_suppkey
group by s_name
order by blame_ct desc, s_name limit 10
"""

REL_QUERIES["rel_sole_blame_supplier"] = (q_sole_blame_supplier,
                                          SQL_SOLE_BLAME_SUPPLIER)


def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — the pure scan-filter-global-sum (no group, no
    join): potential revenue increase from discounted small-quantity 1996
    lineitems. Per-batch integer-cents partials, one driver add — the
    cheapest possible distributed aggregate, included to complete the
    classic shape sweep (Q2/Q11/Q16/Q20 need the partsupp table, which
    TESTDATA.md does not ship)."""
    from ..util import round_half_away

    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        # one partial row per batch ALWAYS (never 0-row: Ray strips the
        # schema off empty blocks, so an all-filtered corpus would lose
        # the partial's type information before the driver merge)
        f = _between(t, "l_shipdate", "1996-01-01", "1997-01-01")
        keep = pc.and_(
            pc.and_(pc.greater_equal(f["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(f["l_discount"], pa.scalar(0.07))),
            pc.less(f["l_quantity"], pa.scalar(24.0)))
        keep = keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep
        f = f.filter(keep)
        amt = pc.multiply(f["l_extendedprice"], f["l_discount"])
        cents = round_half_away(
            amt.to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        return pa.table({"cents": pa.array([int(cents.sum())], pa.int64())})

    rows = ds.map_batches(prep, batch_format="pyarrow").take_all()
    total = sum(r["cents"] for r in rows)
    return pa.table({"revenue": pa.array([total / 100.0], pa.float64())})


SQL_FORECAST_REVENUE = """
select coalesce(sum(cast(round(l_extendedprice * l_discount * 100)
                         as bigint)), 0) / 100.0 as revenue
from lineitem
where l_shipdate >= timestamp '1996-01-01'
  and l_shipdate < timestamp '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""

REL_QUERIES["rel_forecast_revenue"] = (q_forecast_revenue,
                                       SQL_FORECAST_REVENUE)


def q_price_histogram(sf_dir: str, width: float = 5000.0):
    """Equi-width histogram of lineitem extended price (the profiling /
    binning operator every EDA pass runs): bin = floor(price / width).
    Pure per-batch combiner — bin indices are computed vectorized and only
    (bin, count) partials leave the worker; bin boundaries are the SAME
    double ops on both sides (floor of an identical division), so bucket
    edges agree bit-for-bit."""
    from ..ops.partition import low_card_aggregate

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def binify(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        b = np.floor(x / width).astype(np.int64)
        return pa.table({"bin": pa.array(b, pa.int64())})

    out = low_card_aggregate(ds.map_batches(binify, batch_format="pyarrow"),
                             "bin", [(None, "count_all")], ["n"])
    t = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("bin", pa.int64()), ("n", pa.int64())]))
    lo = pc.multiply(pc.cast(t["bin"], pa.float64()), pa.scalar(width))
    return pa.table({"bin": t["bin"], "lo": lo, "n": t["n"]}) \
        .sort_by([("bin", "ascending")])


SQL_PRICE_HISTOGRAM = """
select cast(floor(l_extendedprice / 5000.0) as bigint) as bin,
       floor(l_extendedprice / 5000.0) * 5000.0 as lo,
       count(*) as n
from lineitem group by 1, 2 order by bin
"""

REL_QUERIES["rel_price_histogram"] = (q_price_histogram, SQL_PRICE_HISTOGRAM)


def q_event_props_extract(sf_dir: str):
    """Semi-structured metadata extraction (the JSON props sidecar every
    event stream carries): pull the integer field ``k`` out of the JSON
    props string with ONE vectorized RE2 kernel (pc.extract_regex — no
    Python JSON loop), then a combiner rollup per event_type: count, sum
    and mean of k plus a count of rows where the field is absent. The mean
    is an integer-ratio division (bit-exact vs SQL); extraction parity
    holds because DuckDB's JSON reader and the anchored regex agree on
    this single-field object layout."""
    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        props = pc.cast(t["props"], pa.string())
        props = props.combine_chunks() if isinstance(props, pa.ChunkedArray) else props
        m = pc.extract_regex(props, r'"k":\s*(?P<k>-?\d+)')
        k = pc.if_else(pc.is_valid(m),
                       pc.cast(pc.struct_field(m, "k"), pa.int64()),
                       pa.scalar(None, pa.int64()))
        missing = pc.cast(pc.is_null(k), pa.int64())
        return pa.table({"event_type": t["event_type"],
                         "k": pc.fill_null(k, 0),
                         "has_k": pc.subtract(pa.scalar(1), missing),
                         "missing": missing})

    out = low_card_aggregate(
        ds.map_batches(extract, batch_format="pyarrow"), "event_type",
        [("k", "sum"), ("has_k", "sum"), ("missing", "sum")],
        ["sum_k", "n_k", "n_missing"])
    t = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("event_type", pa.string()), ("sum_k", pa.int64()),
         ("n_k", pa.int64()), ("n_missing", pa.int64())]))
    avg = round_half_away(
        t["sum_k"].to_numpy(zero_copy_only=False).astype(np.float64)
        / t["n_k"].to_numpy(zero_copy_only=False).astype(np.float64), 4)
    return pa.table({"event_type": t["event_type"], "sum_k": t["sum_k"],
                     "n_k": t["n_k"], "n_missing": t["n_missing"],
                     "avg_k": pa.array(avg, pa.float64())}) \
        .sort_by([("event_type", "ascending")])


SQL_EVENT_PROPS_EXTRACT = """
with x as (select event_type,
                  cast(json_extract_string(props, '$.k') as bigint) as k
           from events)
select event_type,
       cast(coalesce(sum(k), 0) as bigint) as sum_k,
       cast(count(k) as bigint) as n_k,
       cast(sum(case when k is null then 1 else 0 end) as bigint)
         as n_missing,
       round(cast(sum(k) as double) / count(k), 4) as avg_k
from x group by event_type order by event_type
"""

REL_QUERIES["rel_event_props_extract"] = (q_event_props_extract,
                                          SQL_EVENT_PROPS_EXTRACT)


def q_nation_balance_moments(sf_dir: str):
    """Higher-moment grouped aggregates — adjusted sample skewness and
    excess kurtosis of customer balance per nation (completing the moment
    ladder next to stddev/MAD/quantiles/corr). Distributed as raw power
    sums (n, Σx..Σx⁴) per nation — per-batch combiner partials, trivially
    mergeable at any scale — with the central-moment algebra and the
    n-adjustments (g1·√(n(n-1))/(n-2); ((n-1)/((n-2)(n-3)))·((n+1)g2+6),
    verified to match DuckDB bit-for-bit up to the last 2 ulps) evaluated
    on the driver over the dim-bounded merged row set. Rounded to 4
    decimals: the two engines' accumulation orders differ in the last
    bits, and the 5e-5 boundary gives ~9 orders of magnitude of margin."""
    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def powers(t: pa.Table) -> pa.Table:
        x = t["c_acctbal"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(x)
        x = x[ok]
        nk = pc.cast(t["c_nationkey"], pa.int64()) \
            .to_numpy(zero_copy_only=False)[ok]
        x2 = x * x
        return pa.table({"n_nationkey": pa.array(nk, pa.int64()),
                         "s1": pa.array(x), "s2": pa.array(x2),
                         "s3": pa.array(x2 * x), "s4": pa.array(x2 * x2)})

    agg = low_card_aggregate(
        ds.map_batches(powers, batch_format="pyarrow"), "n_nationkey",
        [(None, "count_all"), ("s1", "sum"), ("s2", "sum"),
         ("s3", "sum"), ("s4", "sum")],
        ["n", "s1", "s2", "s3", "s4"])
    t = pa.Table.from_pylist(agg.take_all(), schema=pa.schema(
        [("n_nationkey", pa.int64()), ("n", pa.int64()),
         ("s1", pa.float64()), ("s2", pa.float64()),
         ("s3", pa.float64()), ("s4", pa.float64())]))
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    s1 = t["s1"].to_numpy(zero_copy_only=False)
    s2 = t["s2"].to_numpy(zero_copy_only=False)
    s3 = t["s3"].to_numpy(zero_copy_only=False)
    s4 = t["s4"].to_numpy(zero_copy_only=False)
    mean = s1 / n
    m2 = s2 / n - mean ** 2
    m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean ** 3
    m4 = s4 / n - 4 * mean * (s3 / n) + 6 * mean ** 2 * (s2 / n) \
        - 3 * mean ** 4
    # DuckDB null semantics: skewness NULL when n < 3 or zero variance;
    # kurtosis NULL when n < 4 or zero variance
    ok2 = m2 > 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        g1 = m3 / m2 ** 1.5
        skew = g1 * np.sqrt(n * (n - 1)) / (n - 2)
        g2 = m4 / m2 ** 2 - 3
        kurt = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
    skew_ok = (n >= 3) & ok2
    kurt_ok = (n >= 4) & ok2
    nat = _dim_map(sf_dir, "nation", "n_nationkey", "n_name")
    out = pa.table({
        "n_name": pa.array([nat[k] for k in
                            t["n_nationkey"].to_pylist()], pa.string()),
        "n": t["n"],
        "skew": pa.array(round_half_away(np.where(skew_ok, skew, 0.0), 4),
                         pa.float64(), mask=~skew_ok),
        "kurt": pa.array(round_half_away(np.where(kurt_ok, kurt, 0.0), 4),
                         pa.float64(), mask=~kurt_ok)})
    return out.sort_by([("n_name", "ascending")])


SQL_NATION_BALANCE_MOMENTS = """
select n_name, count(*) as n,
       round(skewness(c_acctbal), 4) as skew,
       round(kurtosis(c_acctbal), 4) as kurt
from customer join nation on c_nationkey = n_nationkey
group by n_name order by n_name
"""

REL_QUERIES["rel_nation_balance_moments"] = (q_nation_balance_moments,
                                             SQL_NATION_BALANCE_MOMENTS)


def q_session_paths(sf_dir: str, gap_seconds: int = 1800, k: int = 10):
    """Sequence mining over sessionized event logs: the top-k most common
    event-type PATHS (the '>'-joined type sequence of one session) — the
    clickstream-analytics op next to rel_user_sessions' duration rollup.
    Two bounded exchanges: (1) keyed shuffle on user_id, per partition the
    gap-cumsum sessionizer (the ops/relational.sessionize kernel with an
    explicit (ts, event_id) tie order so path strings are deterministic)
    plus a per-partition path count partial; (2) hash partition on path to
    merge counts, per-partition top-k partials, global (n desc, path) sort
    limit k. No session list ever reaches the driver — only path-count
    partials bounded by distinct-path cardinality."""
    import pandas as pd

    from ..ops.partition import partitioned_apply
    from ..ops.relational import _key_change_mask

    gap_us = gap_seconds * 1_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id",
                                          "event_type"])

    def paths(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("ts", "ascending"),
                       ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        new_key = _key_change_mask(t, ["user_id"])
        ts = t["ts"].to_numpy(zero_copy_only=False).view("int64")
        brk = np.zeros(n, np.int64)
        brk[1:] = (~new_key[1:]) & ((ts[1:] - ts[:-1]) > gap_us)
        sid = np.cumsum(brk + new_key) - 1      # global session index
        df = pd.DataFrame({
            "sid": sid,
            "et": t["event_type"].to_numpy(zero_copy_only=False)})
        joined = df.groupby("sid", sort=False)["et"].agg(">".join)
        counts = joined.value_counts()
        return pa.table({"path": pa.array(counts.index.to_numpy(object),
                                          pa.string()),
                         "n": pa.array(counts.to_numpy(np.int64),
                                       pa.int64())})

    partials = partitioned_apply(ds, "user_id", paths)

    def merge(t: pa.Table) -> pa.Table:
        g = t.group_by("path").aggregate([("n", "sum")]) \
            .rename_columns(["path", "n"])
        # top-k needs (n desc, path asc): numeric-sortable key via negation
        if g.num_rows <= k:
            return g
        order = np.lexsort((np.asarray(g["path"].to_pylist(), object),
                            -g["n"].to_numpy(zero_copy_only=False)))[:k]
        return g.take(pa.array(order, pa.int64()))

    top = partitioned_apply(partials, "path", merge) \
        .sort(["n", "path"], descending=[True, False]).limit(k).take_all()
    return pa.Table.from_pylist(top, schema=pa.schema(
        [("path", pa.string()), ("n", pa.int64())]))


SQL_SESSION_PATHS = """
with e as (select user_id, ts, event_id, event_type,
                  case when lag(ts) over w is null
                         or epoch_us(ts) - epoch_us(lag(ts) over w)
                            > 1800000000
                       then 1 else 0 end as new_s
           from events
           window w as (partition by user_id order by ts, event_id)),
s as (select *, sum(new_s) over (partition by user_id order by ts, event_id
                                 rows unbounded preceding) as sid
      from e),
p as (select user_id, sid,
             string_agg(event_type, '>' order by ts, event_id) as path
      from s group by user_id, sid)
select path, count(*) as n from p
group by path order by n desc, path limit 10
"""

REL_QUERIES["rel_session_paths"] = (q_session_paths, SQL_SESSION_PATHS)


def q_cohort_retention(sf_dir: str):
    """Cohort retention — users grouped by first-activity week, counted in
    each later week (the product-analytics triangle next to sessions and
    funnels). ONE keyed shuffle on user_id: inside a partition every
    user's full history is co-located, so the first-week anchor, the
    per-user distinct (cohort, offset) pairs and the count partials are
    all vectorized in-partition work; the driver merges partials bounded
    by |weeks|². Week indices are integer epoch arithmetic
    (epoch_us // 604800000000) — identical on both sides, no calendar
    truncation semantics to disagree on."""
    import pandas as pd

    from ..ops.partition import partitioned_apply

    WEEK_US = 7 * 86400 * 1_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def cohort(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        week = t["ts"].to_numpy(zero_copy_only=False).view("int64") // WEEK_US
        df = pd.DataFrame({"u": uid, "w": week})
        first = df.groupby("u", sort=False)["w"].transform("min")
        df["cohort_week"] = first
        df["week_offset"] = df["w"] - first
        pairs = df[["u", "cohort_week", "week_offset"]].drop_duplicates()
        out = pairs.groupby(["cohort_week", "week_offset"], sort=False) \
            .size().reset_index(name="n_users")
        return pa.table({
            "cohort_week": pa.array(out["cohort_week"].to_numpy(np.int64)),
            "week_offset": pa.array(out["week_offset"].to_numpy(np.int64)),
            "n_users": pa.array(out["n_users"].to_numpy(np.int64))})

    parts = partitioned_apply(ds, "user_id", cohort).take_all()
    t = pa.Table.from_pylist(parts, schema=pa.schema(
        [("cohort_week", pa.int64()), ("week_offset", pa.int64()),
         ("n_users", pa.int64())]))
    m = t.group_by(["cohort_week", "week_offset"]) \
        .aggregate([("n_users", "sum")]) \
        .rename_columns(["cohort_week", "week_offset", "n_users"])
    return m.sort_by([("cohort_week", "ascending"),
                      ("week_offset", "ascending")])


SQL_COHORT_RETENTION = """
with e as (select user_id, epoch_us(ts) // 604800000000 as w from events),
f as (select user_id, w,
             min(w) over (partition by user_id) as cohort_week from e),
p as (select distinct user_id, cohort_week, w - cohort_week as week_offset
      from f)
select cohort_week, week_offset, count(*) as n_users
from p group by cohort_week, week_offset
order by cohort_week, week_offset
"""

REL_QUERIES["rel_cohort_retention"] = (q_cohort_retention,
                                       SQL_COHORT_RETENTION)


def q_late_events(sf_dir: str, allowed_lateness_s: int = 3600):
    """Out-of-order arrival audit (the watermark question every streaming
    ingest asks: how much data would a 1-hour watermark have dropped?):
    per user, events whose timestamp lags the running max event-time of
    their earlier ARRIVALS (event_id = arrival order) by more than the
    allowed lateness. ONE keyed shuffle on user_id, then a vectorized
    per-partition pass — sort by (user, event_id), segmented running max
    via np.maximum.accumulate restarted at user boundaries. All-integer
    microsecond arithmetic."""
    from ..ops.partition import partitioned_apply
    from ..ops.relational import _key_change_mask

    late_us = allowed_lateness_s * 1_000_000

    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])

    def audit(t: pa.Table) -> pa.Table:
        t = t.sort_by([("user_id", "ascending"), ("event_id", "ascending")])
        n = t.num_rows
        if n == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_late": pa.array([], pa.int64()),
                             "max_lateness_us": pa.array([], pa.int64())})
        import pandas as pd

        ts = t["ts"].to_numpy(zero_copy_only=False).view("int64")
        new_key = _key_change_mask(t, ["user_id"])
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.concatenate((starts, [n])))
        # per-user running max of PRIOR arrivals: segmented cummax, shifted
        # one inside each user run (first arrival has no prior)
        seg_ids = np.repeat(np.arange(len(starts)), counts)
        sts = pd.Series(ts)
        grp = sts.groupby(seg_ids)
        prior = grp.cummax().groupby(seg_ids).shift(1)
        lateness = np.where(prior.isna().to_numpy(),
                            0, np.maximum(prior.fillna(0).to_numpy(np.int64)
                                          - ts, 0))
        is_late = (lateness > late_us).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        seg = np.repeat(np.arange(len(starts)), counts)
        n_late = np.bincount(seg, weights=is_late).astype(np.int64)
        max_late = np.zeros(len(starts), np.int64)
        np.maximum.at(max_late, seg, lateness)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "n_late": pa.array(n_late, pa.int64()),
            "max_lateness_us": pa.array(max_late, pa.int64())})

    return partitioned_apply(ds, "user_id", audit)


SQL_LATE_EVENTS = """
with w as (select user_id, event_id, epoch_us(ts) as tus,
                  max(epoch_us(ts)) over (partition by user_id
                                          order by event_id
                                          rows between unbounded preceding
                                          and 1 preceding) as prior_max
           from events),
l as (select user_id,
             case when prior_max is null then 0
                  when prior_max - tus > 0 then prior_max - tus
                  else 0 end as lateness
      from w)
select user_id, count(*) as n_events,
       cast(sum(case when lateness > 3600000000 then 1 else 0 end)
            as bigint) as n_late,
       cast(max(lateness) as bigint) as max_lateness_us
from l group by user_id
"""

REL_QUERIES["rel_late_events"] = (q_late_events, SQL_LATE_EVENTS)


def q_price_histogram_equidepth(sf_dir: str, bins: int = 8):
    """Equi-DEPTH histogram of extended price — the optimizer-statistics
    complement of rel_price_histogram's equi-width bins: bin edges are the
    global 1/8..7/8 quantiles (distributed exact-interpolation kernel, no
    driver materialization), then ONE combiner pass counts rows per
    half-open [lo, hi) band (last band closed). Edges are rounded to 2 on
    BOTH sides before the comparisons, so band membership is decided on
    identical doubles."""
    from ..ops.partition import low_card_aggregate
    from ..ops.quantile import distributed_quantiles
    from ..util import round_half_away

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])
    qs = [i / bins for i in range(1, bins)]
    edges = round_half_away(
        np.asarray(distributed_quantiles(ds, "l_extendedprice", qs),
                   np.float64), 2)

    def binify(t: pa.Table) -> pa.Table:
        x = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(edges, x, side="right").astype(np.int64)
        return pa.table({"bin": pa.array(b, pa.int64())})

    out = low_card_aggregate(ds.map_batches(binify, batch_format="pyarrow"),
                             "bin", [(None, "count_all")], ["n"])
    t = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("bin", pa.int64()), ("n", pa.int64())]))
    lo = np.concatenate(([float("-inf")], edges))
    hi = np.concatenate((edges, [float("inf")]))
    bs = t["bin"].to_numpy(zero_copy_only=False)
    return pa.table({
        "bin": t["bin"],
        "lo": pa.array(lo[bs], pa.float64()),
        "hi": pa.array(hi[bs], pa.float64()),
        "n": t["n"]}).sort_by([("bin", "ascending")])


SQL_PRICE_HISTOGRAM_EQUIDEPTH = """
with el as (select quantile_cont(l_extendedprice,
            [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) as qs
            from lineitem),
e as (select round(qs[i], 2) as edge, i from el,
      lateral (select unnest(generate_series(1, 7)) as i) ii),
b as (select (select count(*) from e
              where e.edge <= l.l_extendedprice) as bin
      from lineitem l),
c as (select bin, count(*) as n from b group by bin),
edges as (select i as bin, edge from e)
select c.bin,
       coalesce(lo.edge, cast('-infinity' as double)) as lo,
       coalesce(hi.edge, cast('infinity' as double)) as hi,
       c.n
from c left join edges lo on lo.bin = c.bin
       left join edges hi on hi.bin = c.bin + 1
order by c.bin
"""

REL_QUERIES["rel_price_histogram_equidepth"] = (
    q_price_histogram_equidepth, SQL_PRICE_HISTOGRAM_EQUIDEPTH)
