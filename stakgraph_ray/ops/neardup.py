"""Near-duplicate detection operators: MinHash+LSH, SimHash, token-set
Jaccard, embedding-cosine — the training-data dedup family (net-new vs the
exact-only reference, cf. SURVEY.md §2.7).

Scale design:
  - signatures/fingerprints: stateless vectorized map_batches
  - LSH blocking: explode (band_id, band_hash) rows -> ONE groupby shuffle
  - candidate verification: signature-estimate Jaccard inside the band
    group (no second pass over raw text)
  - connected components: union-find over the *verified pair set* on the
    driver. Assumption (documented): verified near-dup pairs are orders of
    magnitude smaller than the corpus (true for web dedup; the pair set is
    bounded by duplicate mass, not corpus size). ``max_pairs`` guards the
    assumption; exceeding it raises rather than OOMs. For a pathological
    duplicate mass, swap in iterative min-label propagation (same keyed
    shuffle repeated O(log diameter) times).
"""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.minhash import (_perm_params, band_keys, char_shingle_hashes,
                                 minhash_signature, simhash64, token_ngram_set)


class MinHashStage:
    """Actor-pool stage: (id, text) -> (id, band_id, band_hash, sig bytes).

    Permutation params are built once per actor (__init__), not per batch.
    ``shingle``: "token" = token n-grams (documents), "char" = char k-grams
    (entity-name canonicalization). Ids may be int64 or string."""

    def __init__(self, id_col: str, text_col: str, n_perms: int = 64,
                 n_bands: int = 16, ngram: int = 3, shingle: str = "token"):
        self.id_col, self.text_col = id_col, text_col
        self.n_perms, self.n_bands, self.ngram = n_perms, n_bands, ngram
        self.shingle = shingle
        self.a, self.b = _perm_params(n_perms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        texts = batch[self.text_col].to_pylist()
        id_arr = batch[self.id_col]
        id_arr = id_arr.combine_chunks() if isinstance(id_arr, pa.ChunkedArray) else id_arr
        n = len(texts)
        sigs = np.empty((n, self.n_perms), dtype=np.uint64)
        for i, t in enumerate(texts):
            if self.shingle == "char":
                hashes = char_shingle_hashes(t or "", self.ngram)
            else:
                grams = token_ngram_set(t or "", self.ngram)
                hashes = np.fromiter((zlib.crc32(g.encode("utf-8")) for g in grams),
                                     dtype=np.uint64, count=len(grams))
            sigs[i] = minhash_signature(hashes, self.a, self.b)
        bands = band_keys(sigs, self.n_bands)  # (n, n_bands)
        nb = self.n_bands
        sig_bytes = [sigs[i].tobytes() for i in range(n)]
        idx = np.repeat(np.arange(n), nb)
        return pa.table({
            "id": pc.take(id_arr, pa.array(idx, pa.int64())),
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(bands.ravel().astype("int64")),
            "sig": pa.array([sig_bytes[i] for i in idx], pa.binary()),
        })


def _pairs_in_band(g: pa.Table, threshold: float, id_type=pa.int64()) -> pa.Table:
    """All id pairs in one (band_id, band_hash) group whose signature-
    estimated Jaccard >= threshold. Ids sorted, so a < b."""
    ids = g["id"].to_numpy(zero_copy_only=False)
    if len(ids) < 2:
        return pa.table({"a": pa.array([], id_type),
                         "b": pa.array([], id_type)})
    order = np.argsort(ids)
    ids = ids[order]
    sigs = np.stack([np.frombuffer(g["sig"][int(i)].as_py(), dtype=np.uint64)
                     for i in order])
    n = len(ids)
    ai, bi = np.triu_indices(n, k=1)
    est = (sigs[ai] == sigs[bi]).mean(axis=1)
    keep = est >= threshold
    return pa.table({"a": pa.array(list(ids[ai[keep]]), id_type),
                     "b": pa.array(list(ids[bi[keep]]), id_type)})


def union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id becomes the root -> cluster id = min member id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def minhash_lsh_pairs(ds, id_col: str, text_col: str, n_perms: int = 64,
                      n_bands: int = 16, ngram: int = 3,
                      threshold: float = 0.7, concurrency=None,
                      shingle: str = "token", id_type=pa.int64()):
    """-> distinct verified candidate pairs Dataset (a < b)."""
    concurrency = concurrency or _pool()
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col,
                               "n_perms": n_perms, "n_bands": n_bands,
                               "ngram": ngram, "shingle": shingle},
        batch_format="pyarrow", concurrency=concurrency)
    # Two consumers below (collision count + candidate filter): pin the
    # signatures once instead of recomputing MinHash per branch. The object
    # store spills if needed; at extreme scale swap for a parquet checkpoint
    # (stages.materialize.checkpoint).
    sigs = sigs.materialize()

    # Most (band_id, band_hash) groups are singletons; running the per-group
    # pair UDF on each would cost one Python call per corpus row. First find
    # the collision bands with a native count aggregate, then run the pair
    # UDF only on rows in those bands (bounded by duplicate mass).
    from ray.data.aggregate import Sum

    counts = sigs.map_batches(
        lambda t: t.group_by(["band_id", "band_hash"]).aggregate([("sig", "count")])
                   .rename_columns(["band_id", "band_hash", "n_part"]),
        batch_format="pyarrow") \
        .groupby(["band_id", "band_hash"]).aggregate(Sum("n_part", alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["band_id", "band_hash"]),
        batch_format="pyarrow").take_all()
    hot_keys = {(r["band_id"], r["band_hash"]) for r in hot}

    from .relational import broadcast

    ref = broadcast(hot_keys)

    class HotBandFilter:
        def __init__(self, ref):
            from .relational import _resolve

            keys = _resolve(ref)
            self.hashes_by_band: dict[int, set] = {}
            for band_id, band_hash in keys:
                self.hashes_by_band.setdefault(band_id, set()).add(band_hash)

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = t["band_id"].to_numpy(zero_copy_only=False)
            bhs = t["band_hash"].to_numpy(zero_copy_only=False)
            mask = np.fromiter(
                (bh in self.hashes_by_band.get(int(bi), ())
                 for bi, bh in zip(bids, bhs)), dtype=bool, count=len(bids))
            return t.filter(pa.array(mask))

    candidates = sigs.map_batches(HotBandFilter,
                                  fn_constructor_kwargs={"ref": ref},
                                  batch_format="pyarrow", concurrency=concurrency)
    pairs = candidates.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _pairs_in_band(g, threshold, id_type), batch_format="pyarrow")
    from .dedup import distinct

    return distinct(pairs, ["a", "b"])


def minhash_lsh_clusters(ds, id_col: str, text_col: str, max_pairs: int = 2_000_000,
                         **kw):
    """-> (id, cluster_id) Dataset: cluster_id = min id of the connected
    component; singletons map to themselves."""
    pairs_ds = minhash_lsh_pairs(ds, id_col, text_col, **kw)
    pairs = pairs_ds.take_all()  # bounded: verified near-dup pairs only
    if len(pairs) > max_pairs:
        raise RuntimeError(
            f"near-dup pair set {len(pairs)} exceeds max_pairs={max_pairs}; "
            "use iterative label propagation instead")
    roots = union_find([(p["a"], p["b"]) for p in pairs])

    from .relational import broadcast

    ref = broadcast(roots)

    class AssignCluster:
        def __init__(self, ref):
            from .relational import _resolve

            self.roots = _resolve(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            cl = np.array([self.roots.get(int(i), int(i)) for i in ids],
                          dtype=np.int64)
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "cluster_id": pa.array(cl)})

    return ds.map_batches(AssignCluster, fn_constructor_kwargs={"ref": ref},
                          batch_format="pyarrow", concurrency=_pool())


class SimHashStage:
    """(id, text) -> (id, simhash hex, bucket) — bucket = top 16 bits, the
    blocking key for hamming-radius search."""

    def __init__(self, id_col: str, text_col: str):
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        hs = [simhash64(t or "") for t in texts]
        return pa.table({
            "doc_id": pc.cast(batch[self.id_col], pa.int64()),
            "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
            "bucket": pa.array([h >> 48 for h in hs], pa.int64()),
        })


def token_jaccard_pairs_in_group(g: pa.Table, id_col: str, text_col: str,
                                 threshold: float) -> pa.Table:
    """Exact distinct-token-set Jaccard >= threshold for all pairs in one
    group (vectorized set ops over a membership matrix)."""
    ids = g[id_col].to_numpy(zero_copy_only=False)
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    order = np.argsort(ids)
    ids = ids[order]
    texts = [g[text_col][int(i)].as_py() for i in order]
    vocab: dict[str, int] = {}
    rows = []
    for t in texts:
        s = set((t or "").split(" "))
        s.discard("")
        rows.append([vocab.setdefault(w, len(vocab)) for w in s])
    m = np.zeros((len(texts), len(vocab)), dtype=bool)
    for i, r in enumerate(rows):
        m[i, r] = True
    inter = (m.astype(np.int32) @ m.T.astype(np.int32))
    sizes = m.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    jac = inter / np.maximum(union, 1)
    ai, bi = np.triu_indices(len(texts), k=1)
    keep = jac[ai, bi] >= threshold
    return pa.table({"a": pa.array(ids[ai[keep]], pa.int64()),
                     "b": pa.array(ids[bi[keep]], pa.int64()),
                     "jaccard": pa.array(jac[ai, bi][keep], pa.float64())})


def embedding_pairs_in_group(g: pa.Table, id_col: str, vec_col: str,
                             threshold: float) -> pa.Table:
    """Cosine >= threshold pairs within one bucket (numpy matmul)."""
    ids = g[id_col].to_numpy(zero_copy_only=False)
    if len(ids) < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    order = np.argsort(ids)
    ids = ids[order]
    m = np.array([g[vec_col][int(i)].as_py() for i in order], dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cos = m @ m.T
    ai, bi = np.triu_indices(len(ids), k=1)
    keep = cos[ai, bi] >= threshold
    return pa.table({"a": pa.array(ids[ai[keep]], pa.int64()),
                     "b": pa.array(ids[bi[keep]], pa.int64()),
                     "cos": pa.array(cos[ai, bi][keep], pa.float64())})
