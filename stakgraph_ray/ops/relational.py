"""Relational operators: joins, semi/anti joins, top-k, windows, sessions.

Ray-Data re-expressions of the reference's join/lookup family
(/root/reference/ast/src/lang/linker.rs — api linking, EdgeIndex 2-hop joins;
ast/src/builder/core.rs:521-582 — implements resolution;
btreemap_graph.rs:523-601 — longest-prefix top-1 per group).

Scale policy:
  - small side -> broadcast (`ray.put` once, resolved in actor __init__;
    never re-shipped per batch, no shuffle)
  - both large  -> `Dataset.join` (hash-partitioned) via `hash_join`
  - ordered per-key ops (running sums, sessions, first/top-1 per key) ->
    one keyed shuffle, vectorized in-group compute
"""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _resolve(ref):
    if isinstance(ref, (pa.Table, set, frozenset, dict, pd.DataFrame)):
        return ref
    import ray

    return ray.get(ref)


def broadcast(obj):
    """ray.put when a session is live (tests may run without Ray)."""
    import ray

    return ray.put(obj) if ray.is_initialized() else obj


class BroadcastJoiner:
    """Actor-pool stage: per-batch pyarrow hash join against a broadcast
    small side (the dimension-table pattern; no shuffle)."""

    def __init__(self, right_ref, keys, right_keys=None, join_type="inner"):
        self.right = _resolve(right_ref)
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.right_keys = ([right_keys] if isinstance(right_keys, str)
                           else list(right_keys)) if right_keys else self.keys
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch.join(self.right, keys=self.keys,
                         right_keys=self.right_keys, join_type=self.join_type)
        return out.combine_chunks()


def broadcast_join(ds, right: pa.Table, keys, right_keys=None,
                   join_type="inner", concurrency=None):
    concurrency = concurrency or _pool()
    ref = broadcast(right)
    return ds.map_batches(
        BroadcastJoiner, fn_constructor_kwargs={
            "right_ref": ref, "keys": keys, "right_keys": right_keys,
            "join_type": join_type},
        batch_format="pyarrow", concurrency=concurrency)


class KeySetFilter:
    """Semi/anti join via a broadcast key set (cf. create_filtered_graph
    semi-join, btreemap_graph.rs:141-167; remove_nodes_by_files anti-join,
    graph_ops.rs:148-157)."""

    def __init__(self, keys_ref, column, keep: bool):
        keys = _resolve(keys_ref)
        self.value_set = pa.array(sorted(keys))
        self.column = column
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[self.column], value_set=self.value_set)
        if not self.keep:
            mask = pc.invert(mask)
        return batch.filter(mask)


def semi_join(ds, column: str, keys, concurrency=None):
    concurrency = concurrency or _pool()
    return ds.map_batches(KeySetFilter,
                          fn_constructor_kwargs={"keys_ref": broadcast(keys),
                                                 "column": column, "keep": True},
                          batch_format="pyarrow", concurrency=concurrency)


def anti_join(ds, column: str, keys, concurrency=None):
    concurrency = concurrency or _pool()
    return ds.map_batches(KeySetFilter,
                          fn_constructor_kwargs={"keys_ref": broadcast(keys),
                                                 "column": column, "keep": False},
                          batch_format="pyarrow", concurrency=concurrency)


def hash_join(left, right, on, right_on=None, join_type="inner",
              num_partitions=None):
    """Both-sides-large join: Ray's hash-partitioned Dataset.join.

    num_partitions defaults adaptively (one aggregator actor per partition;
    too many starves the cluster)."""
    from ..util import join_num_partitions

    num_partitions = num_partitions or join_num_partitions()
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = ((right_on,) if isinstance(right_on, str) else tuple(right_on)) if right_on else on
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=on, right_on=right_on)


def top_k(ds, key: str, k: int, descending: bool = True):
    return ds.sort(key, descending=descending).limit(k)


def first_per_group(ds, group_keys, order_by, descending=False):
    """Top-1 per group with full-row integrity and deterministic tiebreak
    (argmax family, cf. endpoint-group longest-prefix top-1,
    btreemap_graph.rs:542-563). ``order_by``: list of (col, "ascending"|"descending")."""
    if isinstance(order_by, str):
        order_by = [(order_by, "descending" if descending else "ascending")]
    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)

    def first(g: pa.Table) -> pa.Table:
        return g.sort_by(order_by).slice(0, 1)

    return ds.groupby(keys[0] if len(keys) == 1 else keys).map_groups(
        first, batch_format="pyarrow")


def running_sum(ds, group_key: str, order_keys, value_col: str,
                out_col: str = "running"):
    """Per-key running sum in event order (one keyed shuffle; vectorized
    cumsum per group)."""
    order_keys = [order_keys] if isinstance(order_keys, str) else list(order_keys)

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_keys, kind="mergesort")
        g[out_col] = g[value_col].cumsum()
        return g

    return ds.groupby(group_key).map_groups(cum, batch_format="pandas")


def sessionize(ds, group_key: str, ts_col: str, gap_seconds: float,
               out_col: str = "session_id"):
    """Gap-based session ids per key (0-based), one keyed shuffle.
    Streaming-shaped op: input treated as an ordered, partitioned log."""
    gap_us = int(gap_seconds * 1_000_000)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        ts = g[ts_col].astype("int64")
        new = (ts.diff() > gap_us).fillna(False)
        g[out_col] = new.cumsum().astype("int64")
        return g

    return ds.groupby(group_key).map_groups(sess, batch_format="pandas")


class AsofJoiner:
    """Per-batch pandas merge_asof against a broadcast (sorted) right side.

    Small-right-side as-of join (each order ← latest prior event). For a
    both-sides-large as-of join, co-partition by key and merge_asof per
    partition (ops/partition.partitioned_apply over a tagged union)."""

    def __init__(self, right_ref, by, left_on, right_on, value_cols):
        right = _resolve(right_ref)
        self.right = (right.to_pandas() if isinstance(right, pa.Table) else right) \
            .sort_values(right_on, kind="mergesort")
        self.by, self.left_on, self.right_on = by, left_on, right_on
        self.value_cols = value_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        left = batch.to_pandas().sort_values(self.left_on, kind="mergesort")
        out = pd.merge_asof(left, self.right[[self.by, self.right_on, *self.value_cols]],
                            left_on=self.left_on, right_on=self.right_on,
                            by=self.by, direction="backward")
        out = out.drop(columns=[self.right_on])
        return pa.Table.from_pandas(out, preserve_index=False)


def asof_join(ds, right: pa.Table, by: str, left_on: str, right_on: str,
              value_cols: list[str], concurrency=None):
    concurrency = concurrency or _pool()
    ref = broadcast(right)
    return ds.map_batches(AsofJoiner,
                          fn_constructor_kwargs={"right_ref": ref, "by": by,
                                                 "left_on": left_on,
                                                 "right_on": right_on,
                                                 "value_cols": value_cols},
                          batch_format="pyarrow", concurrency=concurrency)


def tumbling_window(ds, ts_col: str, width: str, keys: list[str], aggs):
    """Tumbling event-time windows: truncate ts (vectorized), then a grouped
    aggregate on (window, *keys). ``width``: pyarrow round unit ("hour", "day")."""

    def trunc(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], unit=width)
        return batch.append_column("window", w)

    ds = ds.map_batches(trunc, batch_format="pyarrow")
    return ds.groupby(["window", *keys]).aggregate(*aggs)
