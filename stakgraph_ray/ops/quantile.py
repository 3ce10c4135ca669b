"""Distributed quantile: histogram partials + exact refinement.

The scale-correct replacement for ``np.quantile(ds.take_all())`` (which
materializes every value on the driver): two bounded passes —

  1. per-batch fixed-width histogram partials -> grouped sum -> the driver
     sees at most ``bins`` (bin, count) rows;
  2. the two order statistics straddling each target rank live in (at most
     two) known bins; collect ONLY those bins' values (expected n/bins per
     bin, guarded) and interpolate exactly like ``np.quantile(..., 'linear')``.

All requested quantiles share ONE stats pass, ONE histogram pass and ONE
candidate-gather pass. Driver memory is bounded by ``bins`` + the
candidate-bin occupancy guard, independent of dataset size.

``grouped_quantile`` is the keyed variant (quantile_cont ... GROUP BY):
one hash shuffle co-locates each group, then a single vectorized
sort + segmented-interpolation pass per partition — the same
rows-of-a-group-fit-one-partition contract as running_sum/sessionize.
For a single giant group use ``distributed_quantiles``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def distributed_quantiles(ds, col: str, qs: list[float], bins: int = 4096,
                          candidate_cap: int = 2_000_000) -> list[float]:
    """Exact linear-interpolation quantiles of ``ds[col]`` (np.quantile
    semantics) without materializing the column on the driver. All ``qs``
    share the stats/histogram/candidate executions."""
    from ray.data.aggregate import Count, Max, Min

    # drop nulls at the cast (quantile_cont ignores them); a null would
    # otherwise cast to NaN, bin-index to garbage via NaN.astype(int64) and
    # corrupt both the histogram and the candidate sort
    vals = ds.map_batches(
        lambda t: pa.table({col: pc.drop_null(pc.cast(t[col], pa.float64()))}),
        batch_format="pyarrow")
    vals = vals.materialize()  # reused: stats pass + histogram + refinement
    stats = vals.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"),
                           Count(alias_name="n"))
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return [0.0 for _ in qs]
    if lo == hi:
        return [float(lo) for _ in qs]

    width = (hi - lo) / bins

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        counts = np.bincount(b, minlength=bins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz, pa.int64()),
                         "cnt": pa.array(counts[nz], pa.int64())})

    from .partition import grouped_aggregate

    hist_rows = grouped_aggregate(
        vals.map_batches(hist_partial, batch_format="pyarrow"),
        "bin", [("cnt", "sum")], ["cnt"]).take_all()
    counts = np.zeros(bins, dtype=np.int64)
    for r in hist_rows:
        counts[r["bin"]] = r["cnt"]
    cum = np.cumsum(counts)

    # ranks needed across ALL quantiles -> one candidate-bin set
    need: set[int] = set()
    for q in qs:
        k = int(np.floor((n - 1) * q))
        need.update((k, min(k + 1, n - 1)))
    cand_bins = sorted({int(np.searchsorted(cum, rank + 1)) for rank in need})
    n_cand = int(counts[cand_bins].sum())
    if n_cand > candidate_cap:
        # pathological concentration: every value in a bin is within `width`
        # of its answer — return bin midpoints (documented approximation;
        # error <= width per quantile)
        out = []
        for q in qs:
            k = int(np.floor((n - 1) * q))
            b = int(np.searchsorted(cum, k + 1))
            out.append(float(lo + (b + 0.5) * width))
        return out

    bset = pa.array(cand_bins, pa.int64())

    def in_bins(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        return t.filter(pc.is_in(pa.array(b), value_set=bset))

    cand = np.sort(np.array(
        [r[col] for r in vals.map_batches(in_bins, batch_format="pyarrow").take_all()]))
    cand_bin_of = np.clip(((cand - lo) / width).astype(np.int64), 0, bins - 1)

    def order_stat(rank: int) -> float:
        b = int(np.searchsorted(cum, rank + 1))
        below = cum[b - 1] if b > 0 else 0  # values in earlier bins
        # rank within the candidate pool: offset by candidates from earlier
        # candidate bins only
        offset = int(np.searchsorted(cand_bin_of, b))
        return float(cand[offset + (rank - below)])

    out = []
    for q in qs:
        h = (n - 1) * q
        k = int(np.floor(h))
        v_k = order_stat(k)
        v_k1 = order_stat(min(k + 1, n - 1))
        out.append(v_k + (h - k) * (v_k1 - v_k))
    return out


def distributed_quantile(ds, col: str, q: float, bins: int = 4096,
                         candidate_cap: int = 2_000_000) -> float:
    return distributed_quantiles(ds, col, [q], bins, candidate_cap)[0]


def grouped_quantile(ds, keys, col: str, qs: list[float],
                     out_names: list[str], num_partitions: int | None = None):
    """Exact per-group linear-interpolation quantiles (DuckDB
    ``quantile_cont(col, q) GROUP BY keys`` semantics): one keyed shuffle,
    then per partition a single vectorized sort + segmented gather —
    positions ``start + (cnt-1)*q`` interpolated with one take per bound,
    no per-group Python. Output: one row per group, [*keys, *out_names]."""
    from .partition import partitioned_apply
    from .relational import _key_change_mask

    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_spec = [(k, "ascending") for k in keys] + [(col, "ascending")]

    def gq(t: pa.Table) -> pa.Table:
        # quantile_cont ignores null VALUES but SQL keeps every group: a
        # group whose values are all null survives with a null quantile.
        # Sorting by (keys, col) puts nulls last within each key group, so
        # each group's valid rows are contiguous at its start — group starts
        # come from the FULL table, valid counts via one reduceat.
        t = t.sort_by(sort_spec)
        n = t.num_rows
        starts = np.flatnonzero(_key_change_mask(t, keys))
        cols: dict[str, object] = {}
        head = pa.array(starts, pa.int64())
        for k in keys:
            cols[k] = pc.take(t[k], head)
        if n == 0:
            for name in out_names:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        counts = np.add.reduceat(valid.astype(np.int64), starts)
        nz = counts > 0
        safe = np.maximum(counts, 1)
        v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        for q, name in zip(qs, out_names):
            pos = starts + (safe - 1) * q
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(np.ceil(pos).astype(np.int64), starts + safe - 1)
            frac = pos - lo
            # same FP expression as the global path / DuckDB quantile_cont
            # (lower + frac*(upper-lower)); the algebraic twin
            # v_lo*(1-frac)+v_hi*frac can drift 1 ulp
            vals = v[lo] + frac * (v[hi] - v[lo])
            cols[name] = pa.array(vals, pa.float64(), mask=~nz)
        return pa.table(cols)

    return partitioned_apply(ds, keys, gq, num_partitions)


def grouped_quantile_disc(ds, keys, col: str, qs: list[float],
                          out_names: list[str],
                          num_partitions: int | None = None):
    """Exact per-group DISCRETE quantiles (DuckDB ``quantile_disc(col, q)
    GROUP BY keys``): the element at index max(ceil(q*n)-1, 0) of each
    group's non-null sorted values — an exact element, so the result is
    float-EXACT vs any SQL engine (no interpolation arithmetic at all).
    Same one-shuffle segmented shape as grouped_quantile; all-null groups
    survive with null outputs."""
    from .partition import partitioned_apply
    from .relational import _key_change_mask

    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_spec = [(k, "ascending") for k in keys] + [(col, "ascending")]

    def gq(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_spec)
        n = t.num_rows
        starts = np.flatnonzero(_key_change_mask(t, keys))
        cols: dict[str, object] = {}
        head = pa.array(starts, pa.int64())
        for k in keys:
            cols[k] = pc.take(t[k], head)
        if n == 0:
            for name in out_names:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        counts = np.add.reduceat(valid.astype(np.int64), starts)
        nz = counts > 0
        safe = np.maximum(counts, 1)
        v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        for q, name in zip(qs, out_names):
            idx = starts + np.maximum(
                np.ceil(q * safe).astype(np.int64) - 1, 0)
            cols[name] = pa.array(v[idx], pa.float64(), mask=~nz)
        return pa.table(cols)

    return partitioned_apply(ds, keys, gq, num_partitions)


def grouped_mad(ds, keys, col: str, out_name: str = "mad",
                num_partitions: int | None = None):
    """Exact per-group MEDIAN ABSOLUTE DEVIATION (DuckDB ``mad(col) GROUP
    BY keys``): median(|x - median(x)|) with quantile_cont interpolation at
    both levels. ONE keyed shuffle; per partition two vectorized segmented
    order-stat passes (the second over |x - med| via one lexsort — group
    sizes don't change, so the segment starts are reused). Null values are
    ignored; all-null groups survive with a null MAD."""
    from .partition import partitioned_apply
    from .relational import _key_change_mask

    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_spec = [(k, "ascending") for k in keys] + [(col, "ascending")]

    def _order_stat(v: np.ndarray, starts: np.ndarray, safe: np.ndarray,
                    q: float) -> np.ndarray:
        pos = starts + (safe - 1) * q
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(np.ceil(pos).astype(np.int64), starts + safe - 1)
        frac = pos - lo
        return v[lo] + frac * (v[hi] - v[lo])

    def gmad(t: pa.Table) -> pa.Table:
        t = t.sort_by(sort_spec)
        n = t.num_rows
        mask = _key_change_mask(t, keys)
        starts = np.flatnonzero(mask)
        cols: dict[str, object] = {}
        head = pa.array(starts, pa.int64())
        for k in keys:
            cols[k] = pc.take(t[k], head)
        if n == 0:
            cols[out_name] = pa.array([], pa.float64())
            return pa.table(cols)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        counts = np.add.reduceat(valid.astype(np.int64), starts)
        nz = counts > 0
        safe = np.maximum(counts, 1)
        v = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        med = _order_stat(v, starts, safe, 0.5)
        gidx = np.cumsum(mask) - 1  # group index per row
        absdev = np.abs(v - med[gidx])  # NaN on null rows (sort last below)
        order2 = np.lexsort((absdev, gidx))
        mad = _order_stat(absdev[order2], starts, safe, 0.5)
        cols[out_name] = pa.array(mad, pa.float64(), mask=~nz)
        return pa.table(cols)

    return partitioned_apply(ds, keys, gmad, num_partitions)
