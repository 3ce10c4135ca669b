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
    reduction. Returns columns: *key, n [, sum_<value_col>]."""
    from ray.data.aggregate import Sum

    keys = [key] if isinstance(key, str) else list(key)

    def partial(batch: pa.Table) -> pa.Table:
        b = add_salt(batch, num_salts)
        aggs = [([value_col, "sum"] if value_col else None),
                ([keys[0], "count"])]
        spec = [(value_col, "sum")] if value_col else []
        spec.append((keys[0], "count"))
        g = b.group_by([*keys, "_salt"]).aggregate(spec)
        names = [*keys, "_salt"] + ([f"sum_{value_col}"] if value_col else []) + ["n"]
        return g.rename_columns(names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("n", alias_name="n")]
    if value_col:
        aggs.insert(0, Sum(f"sum_{value_col}", alias_name=f"sum_{value_col}"))
    out = partials.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*aggs)
    return out
