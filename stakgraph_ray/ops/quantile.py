"""Distributed quantile: histogram partials + exact refinement.

The scale-correct replacement for ``np.quantile(ds.take_all())`` (which
materializes every value on the driver): two bounded passes —

  1. per-batch fixed-width histogram partials -> grouped sum -> the driver
     sees at most ``bins`` (bin, count) rows;
  2. the two order statistics straddling the target rank live in (at most
     two) known bins; collect ONLY those bins' values (expected n/bins,
     guarded) and interpolate exactly like ``np.quantile(..., 'linear')``.

Driver memory is bounded by ``bins`` + the candidate-bin occupancy guard,
independent of dataset size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def distributed_quantile(ds, col: str, q: float, bins: int = 4096,
                         candidate_cap: int = 2_000_000) -> float:
    """Exact linear-interpolation quantile of ``ds[col]`` (np.quantile
    semantics) without materializing the column on the driver."""
    from ray.data.aggregate import Count, Max, Min

    vals = ds.map_batches(lambda t: pa.table({col: pc.cast(t[col], pa.float64())}),
                          batch_format="pyarrow")
    vals = vals.materialize()  # reused: stats pass + histogram + refinement
    stats = vals.aggregate(Min(col, alias_name="lo"), Max(col, alias_name="hi"),
                           Count(alias_name="n"))
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    if n == 0:
        return 0.0
    if lo == hi:
        return float(lo)

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

    h = (n - 1) * q
    k = int(np.floor(h))
    need = sorted({k, min(k + 1, n - 1)})
    # bins containing the needed order statistics (0-indexed ranks)
    cand_bins = sorted({int(np.searchsorted(cum, rank + 1)) for rank in need})
    n_cand = int(counts[cand_bins].sum())
    if n_cand > candidate_cap:
        # pathological concentration: every value in the bin is within
        # `width` of the answer — return the bin midpoint (documented
        # approximation; error <= width)
        b = cand_bins[0]
        return float(lo + (b + 0.5) * width)

    bset = pa.array(cand_bins, pa.int64())

    def in_bins(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        return t.filter(pc.is_in(pa.array(b), value_set=bset))

    cand = np.sort(np.array(
        [r[col] for r in vals.map_batches(in_bins, batch_format="pyarrow").take_all()]))

    def order_stat(rank: int) -> float:
        b = int(np.searchsorted(cum, rank + 1))
        below = cum[b - 1] if b > 0 else 0  # values in earlier bins
        # rank within the candidate pool: offset by candidates from earlier
        # candidate bins only
        offset = sum(int(counts[cb]) for cb in cand_bins if cb < b)
        return float(cand[offset + (rank - below)])

    v_k = order_stat(k)
    v_k1 = order_stat(min(k + 1, n - 1))
    return v_k + (h - k) * (v_k1 - v_k)
