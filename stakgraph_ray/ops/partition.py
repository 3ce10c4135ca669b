"""Hash-partitioned apply: the high-cardinality groupby workhorse.

Ray Data's native ``groupby(key).aggregate(...)`` does per-group Python work
inside its sort-based reducer — fine for dozens of groups, pathological for
100k+ (measured ~170µs/row on 2-string-key aggregates). The scalable shape
for high-cardinality keyed ops is:

  1. add ``_part = siphash(key columns) % P``  (vectorized, deterministic)
  2. ``groupby("_part").map_groups(fn)`` — P groups only, and ``fn`` sees
     each partition as ONE Arrow table: all rows for a given key are in
     exactly one partition, so any per-key logic (aggregate / distinct /
     first-wins / top-k) runs as a single vectorized pyarrow kernel there.

P defaults to ~2×CPUs — the same hash-partitioning a multi-node exchange
would use, so this is the single-node stand-in for the cluster shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import default_num_blocks

_PART = "_part"


def partition_column(batch: pa.Table, keys: list[str], num_partitions: int) -> np.ndarray:
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch[k].to_numpy(zero_copy_only=False)
        h = h * np.uint64(1000003) + pd.util.hash_array(col)  # deterministic siphash
    return (h % np.uint64(num_partitions)).astype(np.int64)


def partitioned_apply(ds, keys, fn, num_partitions: int | None = None):
    """Apply ``fn(table) -> table`` once per hash partition of ``keys``.

    ``fn`` receives the partition WITHOUT the internal ``_part`` column and
    must be a pure vectorized table transform (pyarrow group_by, sort+mask,
    …). One keyed shuffle; ~P Python calls total."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    P = num_partitions or default_num_blocks()

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(_PART, pa.array(partition_column(batch, keys, P)))

    def apply(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns([_PART]))

    return ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby(_PART).map_groups(apply, batch_format="pyarrow")


def grouped_aggregate(ds, keys, spec: list[tuple[str, str]],
                      out_names: list[str], num_partitions: int | None = None):
    """High-cardinality grouped aggregate via partitioned_apply.

    ``spec``: pyarrow group_by aggregate spec [(col, "sum"|"max"|...)];
    output columns are [*keys, *out_names]."""
    keys = [keys] if isinstance(keys, str) else list(keys)

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(spec)
        return g.rename_columns([*keys, *out_names])

    return partitioned_apply(ds, keys, agg, num_partitions)


def low_card_aggregate(ds, keys, spec: list[tuple[str, str]],
                       out_names: list[str]):
    """Grouped aggregate for LOW-cardinality keys (groups ≪ rows — status
    flags, regions, hosts): per-batch pyarrow group_by combiner sends at
    most G rows per block to the driver, which merges the partials — no
    corpus-scale sort/shuffle exchange at all. For corpus-cardinality keys
    use grouped_aggregate (hash-partitioned) instead: the driver merge here
    is bounded by blocks × groups.

    ``spec``: [(col, fn)] with fn in sum|min|max|mean|count_all (count_all
    ignores ``col``); output columns are [*keys, *out_names]."""
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)
    partial_plan: list[tuple] = []
    for col, fn in spec:
        if fn == "mean":
            partial_plan += [(col, "sum"), (col, "count")]
        elif fn == "count_all":
            partial_plan.append(([], "count_all"))
        else:
            partial_plan.append((col, fn))
    # dedup partial columns (same (col, fn) may serve several spec entries)
    seen: dict[tuple, str] = {}
    plan = []
    for col, fn in partial_plan:
        name = "count_all" if fn == "count_all" else f"{col}_{fn}"
        if (col if fn != "count_all" else "", fn) not in seen:
            seen[(col if fn != "count_all" else "", fn)] = name
            plan.append((col, fn))

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate(plan)

    # Collect partials as ARROW BLOCKS, not dict rows: take_all() on an
    # all-empty result loses the schema entirely (Table.from_pylist([]) is
    # 0-column and the merge group_by crashes on FieldRef), and dict-row
    # round-trips re-infer dtypes. concat of real blocks keeps both; Ray's
    # occasional schema-less empty blocks (0 columns) are dropped.
    import ray

    blocks = ray.get(
        list(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()))
    typed = [b for b in blocks if b.num_columns]
    if not typed:
        # Ray does not invoke map stages on empty input blocks, so an
        # all-filtered stream arrives here with every block schema-less
        # and no types to rebuild from. Callers whose input can
        # legitimately be empty must aggregate inside their own map fn
        # and emit >= 1 typed partial row per batch (see
        # queries_rel.q_forecast_revenue) — surface that contract instead
        # of crashing on a cryptic FieldRef miss below.
        raise ValueError(
            "low_card_aggregate: every input block is empty and "
            "schema-less; pin the partial schema in the caller (emit one "
            "typed row per batch) when the filtered input can be empty")
    merged = pa.concat_tables(typed, promote_options="default")
    # re-aggregate the partials: sums/counts add, min/max idempotent
    merge_plan = []
    for col, fn in plan:
        name = "count_all" if fn == "count_all" else f"{col}_{fn}"
        merge_plan.append((name, "sum" if fn in ("sum", "count", "count_all")
                           else fn))
    final = merged.group_by(keys).aggregate(merge_plan)
    cols: dict[str, object] = {k: final[k] for k in keys}
    import pyarrow.compute as _pc

    for (col, fn), out in zip(spec, out_names):
        if fn == "mean":
            cols[out] = _pc.divide(
                _pc.cast(final[f"{col}_sum_sum"], pa.float64()),
                _pc.cast(final[f"{col}_count_sum"], pa.float64()))
        elif fn == "count_all":
            cols[out] = final["count_all_sum"]
        else:
            cols[out] = final[f"{col}_{fn}_{'sum' if fn == 'sum' else fn}"]
    import ray.data as rd

    return rd.from_arrow(pa.table(cols))


def distinct_hp(ds, keys, num_partitions: int | None = None):
    keys = [keys] if isinstance(keys, str) else list(keys)
    return partitioned_apply(
        ds, keys, lambda t: t.group_by(keys).aggregate([]), num_partitions)


def dedup_min_hp(ds, key, columns: list[str], num_partitions: int | None = None):
    """dedup_by_key_min semantics (per-column min of non-key columns) at
    high key cardinality."""
    keys = [key] if isinstance(key, str) else list(key)
    others = [c for c in columns if c not in keys]
    spec = [(c, "min") for c in others]

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(spec)
        g = g.rename_columns([*keys, *others])
        return g.select(columns)

    return partitioned_apply(ds, keys, agg, num_partitions)


def first_wins_hp(ds, key: str, order_by: str, num_partitions: int | None = None):
    """Global first-wins dedup (sort + first-occurrence mask per partition)."""
    from .dedup import first_per_key_batch

    return partitioned_apply(
        ds, key, lambda t: first_per_key_batch(t, key, order_by), num_partitions)


def membership_filter_hp(payload_ds, keys_ds, key_col: str, keep: bool,
                         num_partitions: int | None = None,
                         payload_schema: pa.Schema | None = None):
    """Keep (or drop) payload rows whose ``key_col`` appears in ``keys_ds``
    — the distributed semi/anti join that preserves ALL payload columns
    (incl. list-typed) with ONE keyed shuffle and no pyarrow join. Key rows
    ride along as null-padded payload rows tagged ``_mf_side=1``."""
    side_col = "_mf_side"
    schema = payload_schema or payload_ds.schema().base_schema
    fields = list(schema)

    def tag_payload(t: pa.Table) -> pa.Table:
        t = t.select([f.name for f in fields])  # align column order w/ keys side
        return t.append_column(side_col, pa.array([0] * t.num_rows, pa.int8()))

    def tag_keys(t: pa.Table) -> pa.Table:
        n = t.num_rows
        arrays = []
        for fld in fields:
            if fld.name == key_col:
                col = t[key_col]
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                arrays.append(col.cast(fld.type) if col.type != fld.type else col)
            else:
                arrays.append(pa.nulls(n, fld.type))
        arrays.append(pa.array([1] * n, pa.int8()))
        return pa.Table.from_arrays(
            arrays, schema=pa.schema(fields + [pa.field(side_col, pa.int8())]))

    def co_filter(t: pa.Table) -> pa.Table:
        side = t[side_col]
        keys = t.filter(pc.equal(side, 1))[key_col]
        rows = t.filter(pc.equal(side, 0))
        mask = pc.is_in(rows[key_col], value_set=keys.combine_chunks())
        if not keep:
            mask = pc.invert(mask)
        return rows.filter(mask).drop_columns([side_col])

    both = payload_ds.map_batches(tag_payload, batch_format="pyarrow").union(
        keys_ds.map_batches(tag_keys, batch_format="pyarrow"))
    return partitioned_apply(both, key_col, co_filter, num_partitions)


_SIDE = "_side"


def cogroup_join_hp(left_ds, right_ds, key: str, left_schema: pa.Schema,
                    right_schema: pa.Schema, join_type: str = "inner",
                    num_partitions: int | None = None, post=None):
    """Hash-partitioned equi-join via tagged union + ONE keyed shuffle +
    per-partition pyarrow join.

    Why not ``Dataset.join``: (a) it spawns one aggregator ACTOR per
    partition (pool startup + deadlock risk at high partition counts), and
    (b) Ray emits SCHEMA-LESS empty blocks from map stages with empty
    outputs, which crash the hash-join aggregator ("No match for FieldRef").
    This path shares ``partitioned_apply``'s shuffle and is robust to both.

    ``left_schema`` / ``right_schema``: full column schemas including
    ``key`` (non-key column names must be disjoint). ``join_type``:
    pyarrow's ("inner", "left outer", ...). ``post``: optional
    table->table finisher fused into the per-partition apply — it sees the
    joined rows while they are still hash-co-located by ``key``, so keyed
    aggregates / per-key top-k run there without another exchange.
    """
    lcols = [f.name for f in left_schema if f.name != key]
    rcols = [f.name for f in right_schema if f.name != key]
    assert not (set(lcols) & set(rcols)), "non-key columns must be disjoint"
    key_type = left_schema.field(key).type
    union_schema = pa.schema(
        [pa.field(key, key_type)]
        + [left_schema.field(c) for c in lcols]
        + [right_schema.field(c) for c in rcols]
        + [pa.field(_SIDE, pa.int8())])

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = []
            for fld in union_schema:
                if fld.name == _SIDE:
                    arrays.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif fld.name in t.column_names:
                    col = t[fld.name]
                    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                    arrays.append(col.cast(fld.type) if col.type != fld.type else col)
                else:
                    arrays.append(pa.nulls(n, fld.type))
            return pa.Table.from_arrays(arrays, schema=union_schema)
        return f

    both = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow"))

    def apply(t: pa.Table) -> pa.Table:
        side = t[_SIDE]
        l = t.filter(pc.equal(side, 0)).select([key, *lcols])
        r = t.filter(pc.equal(side, 1)).select([key, *rcols])
        out = l.join(r, keys=[key], join_type=join_type)
        # pyarrow join may reorder; restore deterministic column order
        out = out.select([key, *lcols, *rcols]).combine_chunks()
        # fused per-partition finisher: runs while the rows are STILL
        # hash-co-located by `key`, so a keyed aggregate / top-k here is
        # globally correct without the extra all-to-all a downstream
        # grouped_aggregate would pay (block boundaries after map_groups
        # are not partition boundaries, so callers cannot do this safely
        # themselves)
        return post(out) if post is not None else out

    return partitioned_apply(both, key, apply, num_partitions)
