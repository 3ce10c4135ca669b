"""Skew-aware aggregation: salted two-stage rollups for hub keys.

A bare groupby(key) sends every row for a hot key ("wikipedia.org"-style hub
entities) to one reducer. Mitigations, composable:

  1. per-batch combiner (map-side partial aggregate) — already shrinks each
     batch to <= 1 row per key;
  2. salting: first aggregate on (key, salt) with salt = row_index % S, so a
     hub key's partials spread over S reducers; then a second, tiny
     groupby(key) merges the S partials.

(cf. SURVEY.md §7.3 salted LSH/canonicalization keys; the reference has no
skew handling at all — per-file work only, ast/src/builder/utils.rs:24-35.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def add_salt(batch: pa.Table, num_salts: int) -> pa.Table:
    return batch.append_column(
        "_salt", pa.array(np.arange(batch.num_rows, dtype=np.int64) % num_salts))


def salted_sum_count(ds, key, value_col: str | None = None, num_salts: int = 8):
    """Grouped count (+ optional sum of ``value_col``) with salted two-stage
    reduction. Returns columns: *key, n [, sum_<value_col>].

    The final merge is a hash-partitioned pyarrow aggregate
    (ops.partition.grouped_aggregate) — safe at corpus-cardinality key
    vocabularies where Ray's native per-group-Python aggregate degrades."""
    from .partition import grouped_aggregate

    keys = [key] if isinstance(key, str) else list(key)

    def partial(batch: pa.Table) -> pa.Table:
        b = add_salt(batch, num_salts)
        spec = [(value_col, "sum")] if value_col else []
        spec.append((keys[0], "count"))
        g = b.group_by([*keys, "_salt"]).aggregate(spec)
        names = [*keys, "_salt"] + ([f"sum_{value_col}"] if value_col else []) + ["n"]
        g = g.rename_columns(names)
        return g.drop_columns(["_salt"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    spec = [("n", "sum")]
    out_names = ["n"]
    if value_col:
        spec.insert(0, (f"sum_{value_col}", "sum"))
        out_names.insert(0, f"sum_{value_col}")
    return grouped_aggregate(partials, keys, spec, out_names)
