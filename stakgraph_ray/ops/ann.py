"""Approximate nearest neighbor over embedding columns.

Baseline: brute-force cosine (queries_rel.q_knn_bruteforce — numpy matmul
per batch against a broadcast query matrix).

Scale path here: random-hyperplane LSH bucketing (sign-bit sketch of each
vector; cosine-similar vectors collide with probability 1 - theta/pi per
bit). Search touches only the query's bucket plus multi-probe neighbors
(Hamming-1 flips), so per-query work drops from O(N) to O(N / 2^bits *
probes) — the IVF-style partition-pruned layout. Recall < 1 by design;
tested against the brute-force oracle in tests/test_ann.py."""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pyarrow as pa


def _hyperplanes(dim: int, n_bits: int) -> np.ndarray:
    rng = np.random.RandomState(1234)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0  # (n, n_bits)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def multi_probe(bucket: int, n_bits: int, radius: int = 1) -> list[int]:
    """The bucket itself + all neighbors within Hamming distance ``radius``."""
    import itertools

    out = {bucket}
    for r in range(1, radius + 1):
        for comb in itertools.combinations(range(n_bits), r):
            x = bucket
            for i in comb:
                x ^= 1 << i
            out.add(x)
    return sorted(out)


class BucketAssigner:
    """Stateless-per-batch stage; hyperplanes built once per actor."""

    def __init__(self, vec_col: str, n_bits: int, dim: int):
        self.vec_col = vec_col
        self.planes = _hyperplanes(dim, n_bits)

    def __call__(self, t: pa.Table) -> pa.Table:
        m = np.array(t[self.vec_col].to_pylist(), dtype=np.float64)
        return t.append_column("bucket", pa.array(bucket_of(m, self.planes)))


class ProbedScorer:
    """Scores only rows whose bucket is in some query's probe set."""

    def __init__(self, queries_ref, n_bits: int, radius: int = 2):
        from .relational import _resolve

        q = _resolve(queries_ref)
        self.qids = q["qids"]
        self.qm = q["qm"]          # (nq, dim) L2-normalized
        self.qbuckets = q["qbuckets"]
        self.probe_sets = [set(multi_probe(int(b), n_bits, radius))
                           for b in self.qbuckets]
        self.all_probed = set().union(*self.probe_sets) if len(self.qids) else set()

    def __call__(self, t: pa.Table) -> pa.Table:
        buckets = t["bucket"].to_numpy(zero_copy_only=False)
        mask = np.isin(buckets, list(self.all_probed))
        if not mask.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        sub = t.filter(pa.array(mask))
        m = np.array(sub["embedding"].to_pylist(), dtype=np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        vec_ids = sub["vec_id"].to_numpy(zero_copy_only=False)
        sub_buckets = buckets[mask]
        out_q, out_n, out_c = [], [], []
        cos_all = m @ self.qm.T  # (n_sub, nq)
        for j, (qid, probes) in enumerate(zip(self.qids, self.probe_sets)):
            in_probe = np.isin(sub_buckets, list(probes))
            if not in_probe.any():
                continue
            out_q.append(np.full(in_probe.sum(), qid, dtype=np.int64))
            out_n.append(vec_ids[in_probe])
            out_c.append(cos_all[in_probe, j])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_n)),
            "cos": pa.array(np.concatenate(out_c)),
        })


def knn_lsh(ds, query_table: pa.Table, k: int = 5, n_bits: int = 6,
            vec_col: str = "embedding", id_col: str = "vec_id",
            concurrency=None, radius: int = 2):
    """LSH-bucketed approximate top-k: (query_id, neighbor_id, cos).

    Defaults (6 bits, Hamming-2 probes) measured on the synthetic random
    embeddings: recall@5 ~ 0.68 scanning ~34% of rows. Random uniform
    vectors are the worst case for LSH — real embedding distributions
    (clustered) give far better recall/scan tradeoffs; raise n_bits on
    clustered data to prune harder."""
    from .relational import broadcast

    concurrency = concurrency or _pool()
    qm = np.array(query_table[vec_col].to_pylist(), dtype=np.float64)
    dim = qm.shape[1]
    qm_n = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    planes = _hyperplanes(dim, n_bits)
    q = {"qids": query_table[id_col].to_numpy(zero_copy_only=False),
         "qm": qm_n, "qbuckets": bucket_of(qm, planes)}
    ref = broadcast(q)

    ds = ds.map_batches(BucketAssigner,
                        fn_constructor_kwargs={"vec_col": vec_col,
                                               "n_bits": n_bits, "dim": dim},
                        batch_format="pyarrow", concurrency=concurrency)
    scored = ds.map_batches(ProbedScorer,
                            fn_constructor_kwargs={"queries_ref": ref,
                                                   "n_bits": n_bits,
                                                   "radius": radius},
                            batch_format="pyarrow", concurrency=concurrency)

    def topk(g: pa.Table) -> pa.Table:
        return g.sort_by([("cos", "descending"),
                          ("neighbor_id", "ascending")]).slice(0, k)

    return scored.groupby("query_id").map_groups(topk, batch_format="pyarrow")
