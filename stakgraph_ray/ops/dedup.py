"""Exact dedup / distinct operators (BTreeMap-insert & Neo4j-MERGE semantics,
/root/reference/ast/src/lang/graphs/btreemap_graph.rs:57-62,
neo4j/queries/nodes.rs:49-50).

Scale notes: all global dedups here are ONE hash shuffle on the key. Where the
non-key payload is functionally dependent on the key (true for node tables:
the payload is derived from the key's source row), ``dedup_by_key_min`` uses
per-column Min aggregation — a native sort-based aggregate, no per-group
Python. ``dedup_first_wins`` is the general order-aware variant (per-group
head(1) after an in-group sort) for when payloads can genuinely differ.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def distinct_per_batch(batch: pa.Table, keys: list[str]) -> pa.Table:
    """Per-batch distinct on `keys` (a combiner — shrinks the shuffle input)."""
    return batch.group_by(keys).aggregate([])


def distinct(ds, keys: list[str]):
    """Global distinct rows on `keys`: per-batch combine, then one shuffle."""
    ds = ds.map_batches(lambda t: distinct_per_batch(t, keys), batch_format="pyarrow")
    gb = ds.groupby(keys[0] if len(keys) == 1 else keys)
    from ray.data.aggregate import Count

    out = gb.aggregate(Count(alias_name="_n"))
    return out.drop_columns(["_n"])


def dedup_by_key_min(ds, key: str | list[str], columns: list[str] | None = None):
    """Exact dedup keeping the per-column minimum for every non-key column.

    Valid (and exact) when every non-key column is functionally dependent on
    the key; deterministic always. Pass ``columns`` (the full column list)
    when known — calling ``ds.schema()`` on a lazy pipeline blocks on
    execution."""
    from ray.data.aggregate import Min

    names = columns if columns is not None else ds.schema().names
    keys = [key] if isinstance(key, str) else list(key)
    others = [n for n in names if n not in keys]
    aggs = [Min(n, alias_name=n) for n in others]
    return ds.groupby(key if isinstance(key, str) else keys).aggregate(*aggs)


def dedup_first_wins(ds, key: str | list[str], order_by: str):
    """Keep the first row per key ordered by ``order_by`` (Neo4j MERGE
    first-wins, cf. neo4j/queries/nodes.rs:49-50).

    Arrow-native per group (list/binary columns don't survive pandas)."""
    keys = [key] if isinstance(key, str) else list(key)

    def first(g: pa.Table) -> pa.Table:
        return g.sort_by([(order_by, "ascending")]).slice(0, 1)

    return ds.groupby(key if isinstance(key, str) else keys).map_groups(
        first, batch_format="pyarrow")


def first_per_key_batch(batch: pa.Table, key: str, order_by: str) -> pa.Table:
    """Batch-local first-wins combiner (vectorized; run before the global
    keyed shuffle to shrink it)."""
    t = batch.sort_by([(key, "ascending"), (order_by, "ascending")])
    k = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
    if len(k) == 0:
        return t
    neq = pa.chunked_array([pa.array([True]),
                            pc.not_equal(k.slice(1), k.slice(0, len(k) - 1))])
    return t.filter(pc.fill_null(neq.combine_chunks(), True))
