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
