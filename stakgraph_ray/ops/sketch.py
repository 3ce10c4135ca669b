"""HyperLogLog approximate distinct count — the cardinality sketch for
corpus-scale columns where an exact ``distinct`` would be an all-to-all
shuffle over the full key vocabulary.

Shape: each batch folds its values into a 2^p-register sketch (vectorized
hash -> register index / leading-zero rank, ``np.maximum.at``), so ONE
pure-map pass emits O(blocks) fixed-size register rows; the driver merges
them with an elementwise max (register arrays are mergeable — the same
property that lets a 256-node cluster combine per-node sketches without
moving rows). Standard error ~1.04/sqrt(2^p) (~1.6% at p=12).

Deterministic: the hash is pandas' 64-bit siphash with a fixed key, so the
estimate is reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ilog2_u64(x: np.ndarray) -> np.ndarray:
    """Exact floor(log2(x)) for uint64 x > 0 (split in 32-bit halves so the
    float64 log2 never sees >2^53 and stays exact)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    return np.where(hi > 0,
                    32 + np.floor(np.log2(np.maximum(hi, 1))),
                    np.floor(np.log2(np.maximum(lo, 1)))).astype(np.int64)


def hll_fold_hashes(h: np.ndarray, p: int,
                    reg: np.ndarray | None = None) -> np.ndarray:
    """Fold precomputed uint64 hashes into a 2^p uint8 register array (the
    hash-agnostic HLL kernel shared by the siphash and md5 variants)."""
    m = 1 << p
    if reg is None:
        reg = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return reg
    h = np.asarray(h, dtype=np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    # rank = leading zeros of the low (64-p)-bit window + 1: for w != 0
    # rho = (64-p) - floor(log2(w)); an all-zero window gives the saturated
    # rank 64 - p + 1. (Equivalent to the shift-window formulation, but the
    # mask form mirrors the SQL oracle, which has no wrapping <<.)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = np.where(w == 0, 64 - p + 1,
                   (64 - p) - _ilog2_u64(w)).astype(np.uint8)
    np.maximum.at(reg, idx, rho)
    return reg


def hll_batch_registers(values: np.ndarray, p: int) -> np.ndarray:
    """Fold one batch of values into a fresh 2^p uint8 register array."""
    if len(values) == 0:
        return np.zeros(1 << p, dtype=np.uint8)
    return hll_fold_hashes(pd.util.hash_array(values), p)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected HLL estimate with the small-range (linear counting)
    correction; 64-bit hashes need no large-range correction."""
    m = float(len(reg))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.sum(reg == 0))
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def hll_estimate_exact(reg: np.ndarray) -> int:
    """Integer HLL estimate whose arithmetic a SQL oracle reproduces
    BIT-FOR-BIT: the harmonic sum is carried as the exact integer
    S = sum_j 2^(64 - r_j) (<= m * 2^64, fits Python int / DuckDB HUGEINT),
    so the only float ops are one literal-mirrored multiply/divide chain
    plus ln() on the linear-counting branch — each a single correctly-
    rounded operation on identical inputs on both sides. Same estimator as
    ``hll_estimate`` (values agree to float rounding); this variant exists
    so sketch queries can be driver-hash-checked against DuckDB."""
    import math

    m = len(reg)
    cnt = int((reg > 0).sum())
    rs, counts = np.unique(reg[reg > 0], return_counts=True)
    s = sum(int(c) << (64 - int(r)) for r, c in zip(rs, counts)) \
        + (m - cnt) * (1 << 64)
    mf = float(m)
    # keep this chain literal-identical to the SQL oracle (left-assoc)
    e = 0.7213 / (1.0 + 1.079 / mf) * mf * mf \
        * 18446744073709551616.0 / float(s)
    zeros = m - cnt
    if e <= 2.5 * mf and zeros > 0:
        e = mf * math.log(mf / float(zeros))
    return int(math.floor(e + 0.5))


def _md5_hashes_distinct(arr) -> np.ndarray:
    """md5-low-64 hashes of an Arrow array's DISTINCT non-null values,
    hashed as str(value) == DuckDB ``md5_number_lower(cast(v as varchar))``.
    Dedup-before-hash bounds the per-row Python md5 loop to the batch
    vocabulary (duplicates are no-ops for a max-fold — the uncached raw
    md5 is deliberate: an lru across batches would hold ~1M str keys per
    worker for a loop the dedup already bounds); version-stable across
    pandas/numpy upgrades, unlike ``pd.util.hash_array`` — heterogeneous
    workers all agree on md5."""
    import pyarrow.compute as pc

    from ..functions.minhash import _md5low64_raw

    u = pc.unique(arr.combine_chunks() if hasattr(arr, "combine_chunks")
                  else arr).drop_null().to_pylist()
    return np.fromiter((_md5low64_raw(str(v)) for v in u), np.uint64, len(u))


def approx_distinct_stable(ds, col: str, p: int = 12) -> int:
    """``approx_distinct`` with the version-stable md5 hash family and the
    exact-integer estimate — ONE pure-map pass, O(blocks) register rows,
    driver max-merge, and a SQL oracle can reproduce the integer result
    exactly (see queries_dedup.SQL_HLL_DISTINCT)."""

    def partial(t: pa.Table) -> pa.Table:
        reg = hll_fold_hashes(_md5_hashes_distinct(t[col]), p)
        return pa.table({"reg": pa.array([reg], pa.list_(pa.uint8(), len(reg)))})

    m = 1 << p
    merged = np.zeros(m, dtype=np.uint8)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged = np.maximum(merged, np.asarray(r["reg"], dtype=np.uint8))
    return hll_estimate_exact(merged)


def grouped_approx_distinct_stable(ds, key: str, col: str,
                                   p: int = 12) -> dict:
    """Grouped ``approx_distinct_stable`` for LOW-cardinality keys: each
    batch emits one (key, registers) row per key present, the driver
    max-merges G x blocks rows and reads off exact-integer estimates.
    Null keys form ONE group (SQL GROUP BY semantics); null values are
    dropped per group but the GROUP itself is kept — a key whose values
    are all null estimates 0, like SQL's ``count(distinct v)`` over a
    GROUP BY (filtering null-value ROWS before grouping would delete the
    key entirely)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        keys_np = np.array(t[key].to_pylist(), dtype=object)
        codes, uniques = pd.factorize(keys_np, use_na_sentinel=False)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        out_keys, out_regs = [], []
        c = t[col]
        vcol = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        for gi, k in enumerate(uniques):
            hs = _md5_hashes_distinct(
                vcol.filter(pa.array((codes == gi) & valid)))
            out_keys.append(None if (k is None or k != k) else k)
            out_regs.append(hll_fold_hashes(hs, p))
        return pa.table({key: pa.array(out_keys),
                         "reg": pa.array(out_regs, pa.list_(pa.uint8(),
                                                            1 << p))})

    merged: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        reg = np.asarray(r["reg"], dtype=np.uint8)
        k = r[key]
        merged[k] = np.maximum(merged[k], reg) if k in merged else reg
    return {k: hll_estimate_exact(reg) for k, reg in merged.items()}


def cms_frequencies_stable(ds, col: str, probes, width: int = 8192,
                           depth: int = 4) -> dict:
    """``cms_frequencies`` with the md5 hash family (row d hashes token t
    as md5low64(f"{d}:{t}") % width == DuckDB
    ``md5_number_lower(d || ':' || t) % width``): counters are exact
    integer sums and the estimate is an integer min, so a SQL oracle
    reproduces every output exactly. Per-batch value_counts bounds the
    md5 loop to the batch VOCABULARY (cached kernel — web-corpus tokens
    repeat heavily across batches within a worker)."""
    from ..functions.minhash import md5low64

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        import pyarrow.compute as pc
        vc = pc.value_counts(c.drop_null())
        toks = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(zero_copy_only=False)
        cms = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            cells = np.fromiter(
                (md5low64(f"{d}:{tok}") % width for tok in toks),
                np.int64, len(toks))
            np.add.at(cms[d], cells, cnts)
        return pa.table({"cms": pa.array([cms.ravel()],
                                         pa.list_(pa.int64(), depth * width))})

    merged = np.zeros(depth * width, dtype=np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged += np.asarray(r["cms"], dtype=np.int64)
    merged = merged.reshape(depth, width)
    return {p_: int(min(merged[d][md5low64(f"{d}:{p_}") % width]
                        for d in range(depth)))
            for p_ in probes}


def _splitmix64(h: np.ndarray, seed: int) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 — derives an independent
    hash family per seed from ONE base hash. (pd.util.hash_array silently
    IGNORES hash_key for numeric dtypes, so seeding through it would
    collapse every depth row to the same function on numeric columns.)"""
    x = h ^ np.uint64(seed)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_CMS_SEEDS = [0x243F6A8885A308D3, 0x13198A2E03707344,
              0xA4093822299F31D0, 0x082EFA98EC4E6C89,
              0x452821E638D01377, 0xBE5466CF34E90C6C]


def _cms_rows(values: np.ndarray, depth: int) -> list[np.ndarray]:
    base = pd.util.hash_array(np.asarray(values))
    return [_splitmix64(base, _CMS_SEEDS[d % len(_CMS_SEEDS)] + d)
            for d in range(depth)]


def cms_batch_counts(values: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Fold one batch of values into a fresh (depth, width) int64 count-min
    sketch. Depth rows use independent splitmix64-derived hash families
    over one deterministic base hash; sketches merge by elementwise SUM."""
    cms = np.zeros((depth, width), dtype=np.int64)
    if len(values) == 0:
        return cms
    for d, h in enumerate(_cms_rows(values, depth)):
        np.add.at(cms[d], (h % np.uint64(width)).astype(np.int64), 1)
    return cms


def cms_estimate(cms: np.ndarray, probes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates (count-min: min over rows; never
    underestimates, overestimates by <= 2N/width w.h.p. per row)."""
    depth, width = cms.shape
    est = np.full(len(probes), np.iinfo(np.int64).max, dtype=np.int64)
    for d, h in enumerate(_cms_rows(probes, depth)):
        est = np.minimum(est, cms[d][(h % np.uint64(width)).astype(np.int64)])
    return est


def cms_frequencies(ds, col: str, probes, width: int = 8192,
                    depth: int = 4) -> dict:
    """Approximate frequencies of ``probes`` in a Dataset column via one
    map pass emitting O(blocks) mergeable sketches; the driver sums them
    (depth x width ints, independent of dataset size) and reads off the
    probe estimates."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        cms = cms_batch_counts(c.to_numpy(zero_copy_only=False), width, depth)
        return pa.table({"cms": pa.array([cms.ravel()],
                                         pa.list_(pa.int64(), depth * width))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged = np.zeros(depth * width, dtype=np.int64)
    for r in rows:
        merged += np.asarray(r["cms"], dtype=np.int64)
    merged = merged.reshape(depth, width)
    probes_np = np.asarray(probes)
    est = cms_estimate(merged, probes_np)
    return {p: int(e) for p, e in zip(probes, est)}


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate ``count(distinct col)`` of a Dataset column. One map
    pass; driver state = O(blocks) sketches of 2^p bytes each."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        # SQL count(distinct) ignores nulls — hashing None would count it
        # as one extra distinct value
        vals = c.drop_null().to_numpy(zero_copy_only=False)
        reg = hll_batch_registers(vals, p)
        return pa.table({"reg": pa.array([reg], pa.list_(pa.uint8(), len(reg)))})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    m = 1 << p
    merged = np.zeros(m, dtype=np.uint8)
    for r in rows:
        merged = np.maximum(merged, np.asarray(r["reg"], dtype=np.uint8))
    return hll_estimate(merged)


def grouped_approx_distinct(ds, key: str, col: str, p: int = 12) -> dict:
    """Approximate ``count(distinct col) GROUP BY key`` for LOW-cardinality
    keys (status/type dimensions): each batch emits one (key, registers)
    row per key present (vectorized factorize + per-group fold), the driver
    merges G x blocks register rows with elementwise max — the grouped
    composition of the HLL sketch. For corpus-cardinality keys use exact
    distinct_hp instead (per-group sketches would not fit the driver)."""

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        vals = c.to_numpy(zero_copy_only=False)
        # SQL count(distinct) ignores null VALUES (hashing None would count
        # one extra distinct) but the GROUP is kept: all-null -> estimate 0
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        keys_np = np.array(t[key].to_pylist(), dtype=object)
        # null keys form ONE group (SQL GROUP BY semantics — the repo-wide
        # convention); the default sentinel would silently drop those rows
        codes, uniques = pd.factorize(keys_np, use_na_sentinel=False)
        out_keys, out_regs = [], []
        for gi, k in enumerate(uniques):
            reg = hll_batch_registers(vals[(codes == gi) & valid], p)
            out_keys.append(None if (k is None or k != k) else k)
            out_regs.append(reg)
        m = 1 << p
        return pa.table({
            key: pa.array(out_keys),
            "reg": pa.array(out_regs, pa.list_(pa.uint8(), m)),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    merged: dict = {}
    for r in rows:
        reg = np.asarray(r["reg"], dtype=np.uint8)
        k = r[key]
        merged[k] = np.maximum(merged[k], reg) if k in merged else reg
    return {k: hll_estimate(reg) for k, reg in merged.items()}


# ------------------------------------------------------------ Bloom filter

def bloom_batch_bits(values: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Fold one batch of values into a fresh n_bits/8 uint8 bitmap.
    k hash functions derive from ONE pd.util.hash_array base via the
    splitmix64 finalizer (the same derivation rule as the CMS rows)."""
    bits = np.zeros(n_bits >> 3, dtype=np.uint8)
    if len(values) == 0:
        return bits
    base = pd.util.hash_array(np.asarray(values))
    for i in range(k):
        idx = (_splitmix64(base, _CMS_SEEDS[i % len(_CMS_SEEDS)] + i)
               % np.uint64(n_bits)).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits


def bloom_build(ds, col: str, n_bits: int = 1 << 20, k: int = 4) -> np.ndarray:
    """Mergeable Bloom filter over a key column: per-batch bitmaps OR-merge
    on the driver — O(blocks x n_bits/8) transferred, O(n_bits/8) held.
    No false negatives ever; FP rate ~ (1 - e^{-k n / m})^k.

    The 100-TB semi-join pattern: broadcast the filter (kilobytes-to-MBs
    regardless of key count) and prefilter the probe side INSIDE
    map_batches before the exact membership shuffle — the shuffle then
    moves only true hits + the small FP tail instead of the whole table."""
    import pyarrow as _pa

    def partial(t: _pa.Table) -> _pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        b = bloom_batch_bits(v, n_bits, k)
        return _pa.table({"bits": _pa.array([b.tobytes()], _pa.large_binary())})

    bits = np.zeros(n_bits >> 3, dtype=np.uint8)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    return bits


def bloom_might_contain(bits: np.ndarray, values: np.ndarray,
                        k: int = 4) -> np.ndarray:
    """Vectorized membership probe: True = maybe present, False = definitely
    absent. Must use the same k as bloom_build."""
    n_bits = len(bits) << 3
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    base = pd.util.hash_array(np.asarray(values))
    out = np.ones(len(values), dtype=bool)
    for i in range(k):
        idx = (_splitmix64(base, _CMS_SEEDS[i % len(_CMS_SEEDS)] + i)
               % np.uint64(n_bits)).astype(np.int64)
        out &= (bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
    return out


def mg_compress(keys: np.ndarray, counts: np.ndarray,
                capacity: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Misra-Gries summary compress: keep at most ``capacity`` (key, count)
    entries by decrementing every count by the (capacity+1)-th largest and
    dropping the non-positive remainder (Misra & Gries 1982; mergeable form
    per Agarwal et al., "Mergeable Summaries", PODS 2012).

    Returns (keys, counts, decrement). Retained counts are LOWER bounds on
    the true counts; across a merge tree the total error of any key is at
    most the sum of the decrements applied along its path, so any key whose
    true stream count exceeds that sum is guaranteed to survive. Exact
    heavy-hitter queries use this as the bounded-memory candidate pass and
    recount the candidates exactly in a second pass."""
    if len(keys) <= capacity:
        return keys, counts, 0
    kth = int(np.partition(counts, len(counts) - capacity - 1)
              [len(counts) - capacity - 1])
    kept = counts > kth
    return keys[kept], counts[kept] - kth, kth


# ----------------------------------------------------------------- KMV

def kmv_merge(mins: np.ndarray, more: np.ndarray, k: int) -> np.ndarray:
    """Merge two KMV (k-minimum-values) summaries: union of the distinct
    hash sets, keep the k smallest (sorted ascending). Associative and
    commutative, so any merge tree yields the same summary."""
    u = np.unique(np.concatenate([mins.astype(np.uint64),
                                  more.astype(np.uint64)]))
    return u[:k]


def kmv_estimate_exact(mins: np.ndarray, k: int) -> int:
    """KMV distinct estimate (Bar-Yossef et al. 2002): if fewer than k
    distinct hashes were seen the count is exact; otherwise
    (k-1) / R_k where R_k is the k-th smallest hash normalized to (0,1].
    The float chain is one multiply + one divide + floor(x+0.5), each a
    single IEEE op, so a SQL oracle reproduces the integer bit-for-bit
    (queries_dedup.SQL_KMV_DISTINCT)."""
    if len(mins) < k:
        return int(len(mins))
    e = (k - 1) * 18446744073709551616.0 / float(int(mins[k - 1]))
    return int(np.floor(e + 0.5))


def kmv_distinct_stable(ds, col: str, k: int = 256) -> int:
    """Distributed KMV distinct count with the version-stable md5 hash
    family: ONE pure-map pass, O(blocks x k) uint64s to the driver, driver
    merge — the order-statistic sibling of approx_distinct_stable (HLL).
    Unlike HLL its state is a set of raw hash minima, so summaries also
    support set UNION estimates for free (merge = union of minima)."""

    def partial(t: pa.Table) -> pa.Table:
        mins = np.sort(_md5_hashes_distinct(t[col]))[:k]
        return pa.table({"mins": pa.array([mins], pa.list_(pa.uint64()))})

    merged = np.array([], dtype=np.uint64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged = kmv_merge(merged, np.asarray(r["mins"], dtype=np.uint64), k)
    return kmv_estimate_exact(merged, k)


def grouped_kmv_distinct_stable(ds, key: str, col: str, k: int = 256) -> dict:
    """Grouped KMV for LOW-cardinality keys (per-batch per-group minima
    rows, driver merge). Null keys form ONE group; null values are dropped
    per group but the group itself is kept (SQL count(distinct v) GROUP BY
    semantics) — mirrors grouped_approx_distinct_stable."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        keys_np = np.array(t[key].to_pylist(), dtype=object)
        codes, uniques = pd.factorize(keys_np, use_na_sentinel=False)
        valid = pc.is_valid(t[col]).to_numpy(zero_copy_only=False)
        c = t[col]
        vcol = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        out_keys, out_mins = [], []
        for gi, kk in enumerate(uniques):
            hs = _md5_hashes_distinct(
                vcol.filter(pa.array((codes == gi) & valid)))
            out_keys.append(None if (kk is None or kk != kk) else kk)
            out_mins.append(np.sort(hs)[:k])
        return pa.table({key: pa.array(out_keys),
                         "mins": pa.array(out_mins, pa.list_(pa.uint64()))})

    merged: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        mins = np.asarray(r["mins"], dtype=np.uint64)
        g = r[key]
        merged[g] = kmv_merge(merged[g], mins, k) if g in merged else mins
    return {g: kmv_estimate_exact(m, k) for g, m in merged.items()}
