"""Near-duplicate detection operators: MinHash+LSH, SimHash, token-set
Jaccard, embedding-cosine — the training-data dedup family (net-new vs the
exact-only reference, cf. SURVEY.md §2.7).

Scale design:
  - signatures/fingerprints: stateless vectorized map_batches (task pool,
    per-worker-process permutation cache — no actor-pool startup)
  - LSH blocking + candidate verification: ONE keyed shuffle
    (hash-partitioned on (band_id, band_hash)); inside each partition the
    colliding bands are found vectorized and only THEIR rows run the pair
    kernel — singleton bands (the overwhelming majority) cost zero Python.
  - band rows carry an 8-BIT-per-perm compressed signature (64 bytes, not
    512): the signature-estimate Jaccard on low bytes inflates estimates by
    at most (1-J)/256 ≈ 0.004 — far below the threshold separation — and
    cuts the shuffled signature bytes 8x.
  - skewed bands: a (band_id, band_hash) group larger than ``band_cap``
    (cfg.salt_group_limit) switches from all-pairs O(n²) to STAR pairing
    against the min-id member — O(n), preserves component connectivity
    (huge bands are near-identical content in practice).
  - connected components: union-find over the verified pair set on the
    driver while it fits (``max_pairs`` guard); above the guard the
    DISTRIBUTED min-label-propagation fallback runs instead (same keyed
    shuffle repeated O(component diameter) times).
"""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.minhash import (_perm_params, band_keys, char_shingle_hashes,
                                 minhash_signature, minhash_token_signatures,
                                 simhash64)


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
        id_arr = batch[self.id_col]
        id_arr = id_arr.combine_chunks() if isinstance(id_arr, pa.ChunkedArray) else id_arr
        n = batch.num_rows
        if self.shingle == "token":
            # whole-batch vectorized kernel: pyarrow tokenize + distinct-token
            # siphash + reduceat minima — no per-row Python
            sigs = minhash_token_signatures(batch[self.text_col], self.a,
                                            self.b, self.ngram)
        else:
            texts = batch[self.text_col].to_pylist()
            sigs = np.empty((n, self.n_perms), dtype=np.uint64)
            for i, t in enumerate(texts):
                hashes = char_shingle_hashes(t or "", self.ngram)
                sigs[i] = minhash_signature(hashes, self.a, self.b)
        bands = band_keys(sigs, self.n_bands)  # (n, n_bands)
        nb = self.n_bands
        # 8-bit compressed signature for in-band verification (8x less
        # shuffle volume; estimate inflation <= (1-J)/256, see module doc)
        sig8 = sigs.astype(np.uint8)
        sig_bytes = [sig8[i].tobytes() for i in range(n)]
        idx = np.repeat(np.arange(n), nb)
        return pa.table({
            "id": pc.take(id_arr, pa.array(idx, pa.int64())),
            "band_id": pa.array(np.tile(np.arange(nb, dtype=np.int32), n)),
            "band_hash": pa.array(bands.ravel().astype("int64")),
            "sig": pa.array([sig_bytes[i] for i in idx], pa.binary()),
        })


_MINHASH_CACHE: dict[tuple, MinHashStage] = {}


def make_minhash_fn(**kw):
    """Task-pool variant of MinHashStage: a plain batch fn with a
    per-worker-process stage cache (the permutation table is ~1KB — an
    actor pool would pay startup and statically partition the cluster)."""
    key = tuple(sorted(kw.items()))

    def fn(batch: pa.Table) -> pa.Table:
        stage = _MINHASH_CACHE.get(key)
        if stage is None:
            stage = MinHashStage(**dict(key))
            _MINHASH_CACHE[key] = stage
        return stage(batch)

    return fn


def _pairs_in_partition(t: pa.Table, threshold: float, id_type,
                        band_cap: int) -> pa.Table:
    """All verified id pairs across every COLLIDING (band_id, band_hash)
    group inside one hash partition. Vectorized group detection (sort +
    boundary diff); the Python loop runs only over colliding groups —
    bounded by collision mass, not partition size. Groups above
    ``band_cap`` use star pairing against the min id (O(n) skew guard)."""
    empty = pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type)})
    if t.num_rows < 2:
        return empty
    t = t.sort_by([("band_id", "ascending"), ("band_hash", "ascending")])
    bid = t["band_id"].to_numpy(zero_copy_only=False)
    bh = t["band_hash"].to_numpy(zero_copy_only=False)
    ids = t["id"].to_numpy(zero_copy_only=False)
    sig_col = t["sig"].to_numpy(zero_copy_only=False)
    starts = np.concatenate(
        ([0], np.flatnonzero((bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])) + 1,
         [len(bid)]))
    out_a: list = []
    out_b: list = []
    for s, e in zip(starts[:-1], starts[1:]):
        n = e - s
        if n < 2:
            continue
        gids = ids[s:e]
        sigs = np.frombuffer(b"".join(sig_col[s:e]), dtype=np.uint8) \
            .reshape(n, -1)
        order = np.argsort(gids, kind="stable")
        gids, sigs = gids[order], sigs[order]
        if n > band_cap:
            est = (sigs[0] == sigs[1:]).mean(axis=1)
            keep = est >= threshold
            out_a.extend([gids[0]] * int(keep.sum()))
            out_b.extend(gids[1:][keep])
        else:
            ai, bi = np.triu_indices(n, k=1)
            est = (sigs[ai] == sigs[bi]).mean(axis=1)
            keep = est >= threshold
            out_a.extend(gids[ai[keep]])
            out_b.extend(gids[bi[keep]])
    if not out_a:
        return empty
    # local dedup: the same pair often collides in several bands of one
    # partition; dedup via an Arrow group_by, which (unlike
    # np.unique(axis=0)) also works for STRING ids — the canonicalization
    # large-vocabulary path calls this with id_type=pa.string()
    dup = pa.table({"a": pa.array(list(out_a)).cast(id_type),
                    "b": pa.array(list(out_b)).cast(id_type)})
    return dup.group_by(["a", "b"]).aggregate([]).select(["a", "b"])


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
                      shingle: str = "token", id_type=pa.int64(),
                      band_cap: int | None = None,
                      num_partitions: int | None = None,
                      unique: bool = True):
    """-> verified candidate pairs Dataset (a < b), distinct when ``unique``.

    One streaming pass: signatures (task pool, cached perm params) ->
    hash-partitioned collide-and-pair on (band_id, band_hash) -> distinct.
    No execution barrier, no driver round trip. ``band_cap`` defaults to
    PipelineConfig.salt_group_limit (star-pairing skew guard).

    ``unique=False`` skips the global distinct exchange: pairs are already
    deduped per partition, and consumers that only need connectivity
    (union-find / label propagation are idempotent over repeated edges)
    save one all-to-all; residual cross-partition duplicates are bounded by
    n_bands - 1 copies."""
    from ..config import DEFAULT_CONFIG
    from .partition import distinct_hp, partitioned_apply

    band_cap = band_cap or DEFAULT_CONFIG.salt_group_limit
    sigs = ds.map_batches(
        make_minhash_fn(id_col=id_col, text_col=text_col, n_perms=n_perms,
                        n_bands=n_bands, ngram=ngram, shingle=shingle),
        batch_format="pyarrow")
    pairs = partitioned_apply(
        sigs, ["band_id", "band_hash"],
        lambda t: _pairs_in_partition(t, threshold, id_type, band_cap),
        num_partitions)
    if not unique:
        return pairs
    return distinct_hp(pairs, ["a", "b"], num_partitions)


def label_propagation_clusters(ds, id_col: str, pairs_ds,
                               num_partitions: int | None = None,
                               max_iters: int = 64):
    """Distributed connected components via iterative min-label propagation
    (the fallback when the verified pair set exceeds the driver guard).

    labels(v) <- min(labels(v), min over neighbors u of labels(u)), iterated
    to fixpoint — converges in O(component diameter) keyed shuffles; every
    step is a co-group join + grouped min, nothing driver-sized."""
    from .partition import cogroup_join_hp, grouped_aggregate

    ids = ds.map_batches(
        lambda t: pa.table({"id": pc.cast(t[id_col], pa.int64())}),
        batch_format="pyarrow")
    labels = ids.map_batches(
        lambda t: pa.table({"id": t["id"], "label": t["id"]}),
        batch_format="pyarrow").materialize()
    # symmetric edge list (src -> dst both directions)
    def symmetrize(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([a, b])),
                         "dst": pa.array(np.concatenate([b, a]))})

    sym = pairs_ds.map_batches(symmetrize, batch_format="pyarrow").materialize()

    for _ in range(max_iters):
        # candidate label for dst = neighbor's current label
        cand = cogroup_join_hp(
            sym.map_batches(lambda t: pa.table({"id": t["src"], "dst": t["dst"]}),
                            batch_format="pyarrow"),
            labels, "id",
            pa.schema([("id", pa.int64()), ("dst", pa.int64())]),
            pa.schema([("id", pa.int64()), ("label", pa.int64())]),
            num_partitions=num_partitions)
        cand_min = grouped_aggregate(
            cand.map_batches(lambda t: pa.table({"id": t["dst"],
                                                 "cand": t["label"]}),
                             batch_format="pyarrow"),
            "id", [("cand", "min")], ["cand"], num_partitions)
        merged = cogroup_join_hp(
            labels, cand_min, "id",
            pa.schema([("id", pa.int64()), ("label", pa.int64())]),
            pa.schema([("id", pa.int64()), ("cand", pa.int64())]),
            join_type="left outer", num_partitions=num_partitions)
        labels = merged.map_batches(
            lambda t: pa.table({
                "id": t["id"],
                "label": pc.min_element_wise(
                    t["label"], pc.fill_null(t["cand"], pa.scalar((1 << 62), pa.int64()))),
                "chg": pc.cast(
                    pc.less(pc.fill_null(t["cand"], pa.scalar((1 << 62), pa.int64())),
                            t["label"]), pa.int64()),
            }), batch_format="pyarrow").materialize()
        changed = labels.sum("chg") or 0
        labels = labels.map_batches(
            lambda t: t.select(["id", "label"]), batch_format="pyarrow")
        if changed == 0:
            break
        labels = labels.materialize()
    else:
        # a silent non-fixpoint would return WRONG cluster labels (chain
        # components longer than max_iters keep distinct labels at the two
        # ends) on exactly the above-guard runs nobody can eyeball
        raise RuntimeError(
            f"label propagation did not converge in {max_iters} rounds "
            f"(component diameter exceeds max_iters; raise max_iters)")
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["id"], "cluster_id": t["label"]}),
        batch_format="pyarrow")


def minhash_lsh_clusters(ds, id_col: str, text_col: str, max_pairs: int = 2_000_000,
                         **kw):
    """-> (id, cluster_id) Dataset: cluster_id = min id of the connected
    component; singletons map to themselves.

    Components come from driver union-find while the verified pair set fits
    ``max_pairs`` (pairs are bounded by duplicate mass, not corpus size);
    beyond the guard the distributed label-propagation fallback runs.
    Both consumers are idempotent over repeated edges, so the pair feed
    skips the global distinct exchange (``unique=False``); the guard
    therefore counts near-distinct pairs (per-partition deduped, at most
    n_bands - 1 stray copies each)."""
    pairs_ds = minhash_lsh_pairs(ds, id_col, text_col, unique=False,
                                 **kw).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs > max_pairs:
        return label_propagation_clusters(ds, id_col, pairs_ds)
    pairs = pairs_ds.take_all()
    roots = union_find([(p["a"], p["b"]) for p in pairs])

    from .relational import broadcast

    ref = broadcast(roots)

    class AssignCluster:
        def __init__(self, ref):
            from .relational import _resolve

            self.roots = _resolve(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pandas as pd

            ids = t[id_col].to_numpy(zero_copy_only=False)
            # Series.map keeps the dict lookup in C (link.py precedent);
            # ids absent from roots are their own cluster root
            cl = pd.Series(ids).map(self.roots).fillna(
                pd.Series(ids)).to_numpy(dtype=np.int64)
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
        from ..functions.minhash import simhash64_batch

        hs = simhash64_batch(batch[self.text_col])
        return pa.table({
            "doc_id": pc.cast(batch[self.id_col], pa.int64()),
            "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
            "bucket": pa.array((hs >> np.uint64(48)).astype(np.int64)),
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
    # one take + to_pylist keeps the gather in C (per-row .as_py() was the
    # round-2 hygiene note)
    col = g[text_col].combine_chunks() if isinstance(
        g[text_col], pa.ChunkedArray) else g[text_col]
    texts = col.take(pa.array(order, pa.int64())).to_pylist()
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
    vc = g[vec_col].combine_chunks() if isinstance(
        g[vec_col], pa.ChunkedArray) else g[vec_col]
    vc = vc.take(pa.array(order, pa.int64()))
    m = np.asarray(pc.list_flatten(vc).to_numpy(zero_copy_only=False),
                   dtype=np.float64).reshape(len(ids), -1)
    # not in-place: a float64 list column flattens zero-copy -> read-only
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    cos = m @ m.T
    ai, bi = np.triu_indices(len(ids), k=1)
    keep = cos[ai, bi] >= threshold
    return pa.table({"a": pa.array(ids[ai[keep]], pa.int64()),
                     "b": pa.array(ids[bi[keep]], pa.int64()),
                     "cos": pa.array(cos[ai, bi][keep], pa.float64())})
