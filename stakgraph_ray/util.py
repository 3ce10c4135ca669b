"""Small runtime helpers."""

from __future__ import annotations


def default_num_blocks(minimum: int = 8) -> int:
    """Target block count for reads: ~2 blocks per CPU so every stage of a
    single-file-parquet pipeline can parallelize (a one-file read otherwise
    yields ONE block and the whole downstream DAG runs on one task)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", minimum))
            return max(minimum, cpus * 2)
    except Exception:
        pass
    return max(minimum, 16)


def adaptive_num_blocks(path: str, rows_per_block: int = 512,
                        minimum: int = 4) -> int:
    """Block count for a parquet read, scaled to the file's actual row
    count (parquet footer metadata — no scan): ~2 blocks per CPU like
    default_num_blocks, but never slicing a small file into sub-512-row
    blocks, where per-task scheduling (~tens of ms) dwarfs the work. At
    cluster scale the corpus is many files and this returns the 2xCPU cap;
    the floor only engages on the small single-file test tables."""
    cap = default_num_blocks()
    try:
        import pyarrow.parquet as pq

        n = pq.ParquetFile(path).metadata.num_rows
        return max(minimum, min(cap, (n + rows_per_block - 1) // rows_per_block))
    except Exception:
        return cap


def parquet_col_bounds(path: str, col: str) -> tuple | None:
    """(min, max) of a parquet column from row-group FOOTER statistics —
    no data scan. None when any row group lacks statistics for the column
    (callers fall back to a distributed min/max aggregate). The 100-TB
    use: ops like global_running_sum need the id range BEFORE their first
    pass; footer stats answer it for free where the writer recorded them."""
    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mins.append(st.min)
            maxs.append(st.max)
        return (min(mins), max(maxs)) if mins else None
    except Exception:
        return None


def join_num_partitions(cap: int = 32) -> int:
    """Partition count for Dataset.join: the join spawns one aggregator
    ACTOR per partition, so this must stay below the CPU count or the pool
    starves the rest of the DAG (observed deadlock at 16 partitions on a
    4-CPU cluster)."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
            return max(2, min(cap, cpus // 2))
    except Exception:
        pass
    return 4


def pool_size(frac: float = 1.0, cap: int = 8) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (1, N): N scales with the cluster CPUs
    (leaving headroom for read/write tasks) instead of a hard-coded 4 —
    a fixed pool size silently caps stage throughput at high CPU counts.
    Capped at 8: these stages are vectorized (cheap per batch), so beyond
    ~8 actors the pool's startup cost outweighs added throughput."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
            return (1, max(2, min(cap, int((cpus - 2) * frac))))
    except Exception:
        pass
    return (1, 4)


def fixed_pool(frac: float = 1.0, cap: int = 64, reserve: int = 2) -> int:
    """Fixed-size actor pool for CPU-bound stages: all actors start up
    front (autoscaling (1,N) pools ramp too slowly for short stages).
    Leaves ``reserve`` CPUs for read/write tasks."""
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 4))
            return max(2, min(cap, int((cpus - reserve) * frac)))
    except Exception:
        pass
    return 4


def round_half_away(x, nd: int):
    """DuckDB ``round()`` on DOUBLE: half away from zero, then a correctly
    rounded true DIVISION by 10^nd. ``pc.round`` instead multiplies by the
    inexact constant 10^-nd (and defaults to half-to-even), which can land
    1 ulp off DuckDB's result — every oracle-facing rounding must go
    through this one kernel. Accepts scalars or arrays; returns float64."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** nd
    out = np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)
    return float(out) if out.ndim == 0 else out


def cache_put(cache: dict, key, val, cap: int = 8):
    """Insert into a per-worker-process broadcast/stage cache with a small
    FIFO cap. These caches live in long-lived Ray worker processes across a
    100+ query session; each entry can pin a resolved broadcast table AND
    its plasma ObjectRef, so an unbounded dict grows monotonically. A tiny
    cap keeps the hot entry (the current query's broadcast) resident while
    letting stale refs drop so plasma can reclaim them."""
    if len(cache) >= cap:
        # dicts preserve insertion order -> FIFO eviction of the oldest
        for old in list(cache)[:max(1, len(cache) - cap + 1)]:
            del cache[old]
    cache[key] = val
    return val


_STAGE_CACHE: dict = {}


def ref_key(ref) -> str:
    """Stable cache key for a broadcast handle: ObjectRef.hex() is globally
    unique; id() could recycle after GC and alias two objects."""
    return ref.hex() if hasattr(ref, "hex") else str(id(ref))


def make_task_stage(cls, cache_key, **ctor_kwargs):
    """Task-pool variant of an actor-pool stage class: a plain batch fn with
    a per-worker-process instance cache, so per-process setup (broadcast
    resolve, table prep) runs once per worker instead of per batch — without
    an actor pool's startup latency or static cluster partitioning (round 2
    measured actor pools 3-5x slower on short queries; make_minhash_fn /
    knn_pq precedent). ``cache_key`` must identify the constructed state
    (include the broadcast ref's ``ref_key`` when state is broadcast)."""
    key = (cls.__module__, cls.__qualname__, cache_key)

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            inst = cache_put(_STAGE_CACHE, key, cls(**ctor_kwargs))
        return inst(batch)

    return fn
