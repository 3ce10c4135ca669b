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
