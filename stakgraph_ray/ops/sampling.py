"""Deterministic sampling / splitting / budgeting operators for
training-data curation: hash-bucket corpus splits, per-group stratified
samples, and a distributed global prefix-sum for token-budget selection.

Everything here is DETERMINISTIC (md5-keyed, no RNG) so runs are
reproducible and each op carries an exact DuckDB oracle
(``md5_number_lower`` == functions.minhash.md5low64, parity-tested).

Scale notes:
- ``hash_split`` is a pure map — no shuffle, no driver state.
- ``stratified_sample`` is ONE hash shuffle on the group key, then a
  vectorized in-partition sort + run-position mask (no per-group Python).
- ``global_running_sum`` is the classic two-pass distributed prefix sum:
  one range shuffle (sort), per-block partial sums (bytes per block to the
  driver), per-block offset broadcast — never the data itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.minhash import _md5low64_raw as md5low64  # ids are near-unique: uncached kernel


def hash_key_column(arr, modulus: int = 10_000) -> pa.Array:
    """md5-low-64 of each value's string form, mod ``modulus`` — the
    deterministic bucket assignment (DuckDB:
    ``md5_number_lower(cast(col as varchar)) % modulus``). Per-row md5 is
    inherent (unique keys defeat memoization); one md5 per ROW, not per
    token, so it is the same cost class as exact-dedup's content md5."""
    vals = arr.to_pylist()
    out = np.fromiter((md5low64(str(v)) % modulus for v in vals),
                      dtype=np.int64, count=len(vals))
    return pa.array(out, pa.int64())


def hash_split(ds, key_col: str, splits: list[tuple[str, float]],
               modulus: int = 10_000):
    """Deterministic train/val/test-style split: bucket by md5(key) and
    assign cumulative fraction ranges. Pure map, stable across runs and
    cluster sizes — the property a 100-TB corpus split needs (re-runs and
    late-arriving shards land in the same split)."""
    bounds = []
    acc = 0.0
    for name, frac in splits:
        acc += frac
        bounds.append((name, int(round(acc * modulus))))
    # snap the last bound over float drift ONLY when the fractions cover the
    # whole corpus — a partial spec ([("sample", 0.01)]) must leave the
    # remaining buckets unassigned (split = null), not absorb them
    if bounds and abs(acc - 1.0) < 1e-9:
        bounds[-1] = (bounds[-1][0], modulus)

    def assign(t: pa.Table) -> pa.Table:
        b = hash_key_column(t[key_col], modulus).to_numpy(zero_copy_only=False)
        out = np.empty(len(b), dtype=object)
        lo = 0
        for name, hi in bounds:
            out[(b >= lo) & (b < hi)] = name
            lo = hi
        return t.append_column("split", pa.array(out, pa.string())) \
                .append_column("bucket", pa.array(b, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def _run_positions(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Position of each row within its key run (table must be sorted by
    ``keys`` first): vectorized cumcount, no per-group Python."""
    n = t.num_rows
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        col = t[k]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        a, b = col.slice(1), col.slice(0, n - 1)
        # nulls compare EQUAL to each other (SQL partition-by semantics:
        # NULL keys form one group); a null-vs-value boundary is a change
        neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
            zero_copy_only=False)
        null_a = pc.is_null(a).to_numpy(zero_copy_only=False)
        null_b = pc.is_null(b).to_numpy(zero_copy_only=False)
        change[1:] |= neq | (null_a != null_b)
    idx = np.arange(n, dtype=np.int64)
    starts = np.where(change, idx, 0)
    return idx - np.maximum.accumulate(starts)


def stratified_sample(ds, group_keys, n_per_group: int, id_col: str,
                      num_partitions: int | None = None):
    """Deterministic per-group sample: the ``n_per_group`` rows with the
    smallest md5(id) rank in each group (ties broken by id). Equivalent
    SQL: ``qualify row_number() over (partition by g order by
    md5_number_lower(cast(id as varchar)), id) <= n``.

    One hash shuffle on the group key; in-partition sort + run-position
    mask, vectorized (argmax/top-1 family generalized to top-n,
    cf. ops.relational.first_per_group)."""
    from .partition import partitioned_apply

    keys = [group_keys] if isinstance(group_keys, str) else list(group_keys)

    def add_rank(t: pa.Table) -> pa.Table:
        # int64 view of the uint64 rank preserves order only for values
        # < 2^63 — keep the rank unsigned end-to-end instead.
        r = np.fromiter((md5low64(str(v)) for v in t[id_col].to_pylist()),
                        dtype=np.uint64, count=t.num_rows)
        return t.append_column("sample_rank", pa.array(r, pa.uint64()))

    sort_spec = [(k, "ascending") for k in keys] + \
        [("sample_rank", "ascending"), (id_col, "ascending")]

    def pick(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_spec)
        pos = _run_positions(t, keys)
        return t.filter(pa.array(pos < n_per_group))

    out = partitioned_apply(ds.map_batches(add_rank, batch_format="pyarrow"),
                            keys, pick, num_partitions)
    return out.map_batches(lambda t: t.drop_columns(["sample_rank"]),
                           batch_format="pyarrow")


def global_running_sum(ds, order_col: str, value_col: str,
                       out_col: str = "running_total"):
    """Global prefix sum of ``value_col`` in ``order_col`` order, as a
    distributed two-pass: range-shuffle sort, per-block sums to the driver
    (one scalar per block), per-block offsets added back in a map. The
    driver holds O(num_blocks) scalars, never rows.

    Returns a Dataset with ``out_col`` = inclusive running total."""
    import ray

    sorted_ds = ds.sort(order_col).materialize()

    # pass 1: per-block totals (order preserved by materialized block list)
    refs = [r for b in sorted_ds.iter_internal_ref_bundles()
            for r in b.block_refs]

    @ray.remote
    def block_sum(block) -> float:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:
            return 0.0
        s = pc.sum(pc.cast(t[value_col], pa.float64())).as_py()
        return float(s or 0.0)

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.concatenate(([0.0], np.cumsum(sums)[:-1]))

    @ray.remote
    def add_cum(block, offset: float):
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(zero_copy_only=False)
        cum = np.cumsum(v) + offset
        return t.append_column(out_col, pa.array(cum, pa.float64()))

    import ray.data as rd

    out_refs = [add_cum.remote(r, o) for r, o in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def token_budget_subset(ds, order_col: str, value_col: str, budget: float):
    """Keep rows, in ``order_col`` order, while the inclusive running total
    of ``value_col`` stays within ``budget`` (the deterministic
    token-budget corpus subset). SQL: ``qualify sum(v) over (order by o)
    <= budget``."""
    cum = global_running_sum(ds, order_col, value_col, out_col="_cum")
    out = cum.filter(expr=f"_cum <= {budget!r}")
    return out.map_batches(lambda t: t.drop_columns(["_cum"]),
                           batch_format="pyarrow")
