"""Entity canonicalization: MinHash/LSH blocking + union-find merge.

The north-rule net-new stage (the reference dedups by exact keys only,
/root/reference/ast/src/lang/graphs/btreemap_graph.rs:57-62): coreferent
entity names ("International Business Machines" / "International  Business
Machines Corp") merge into one canonical id.

Dataflow (no driver-side pass over the corpus):
  distinct names -> char-shingle MinHash signatures (actor pool)
  -> LSH band groupby (ONE shuffle over the *name* table, not the corpus)
  -> verified pairs (signature-estimate Jaccard)
  -> union-find over the pair set (driver; bounded by duplicate mass)
  -> broadcast {merged name -> canonical} dict -> rewrite stage.

Guard rails:
  - names shorter than ``min_len`` only merge on exact equality (short
    strings shingle-collide; "scan"/"span" must not merge)
  - pair-set size guard inherited from minhash_lsh_clusters' assumption
"""

from __future__ import annotations

from ..util import pool_size as _pool

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..ops.neardup import minhash_lsh_pairs, union_find


SMALL_NAMES_LIMIT = 200_000


def canonical_roots(names_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                    min_len: int = 8, threshold: float = 0.85,
                    max_pairs: int = 2_000_000) -> dict[str, str]:
    """Distinct-name Dataset (column ``name``) -> {merged name: canonical}.

    Only names that actually merge appear in the dict (small side);
    everything else maps to itself implicitly.

    Adaptive: a small distinct-name table (the common case — entity
    vocabulary, not corpus size) is collected and LSH'd driver-side in one
    numpy pass (zero extra Ray round trips); a large one runs the full
    Dataset LSH path. Both use identical hash functions -> identical merges.

    The large path's verified pair set is counted against ``max_pairs``
    BEFORE any driver collection (the minhash_lsh_clusters guard —
    a template-generated web corpus can make boilerplate-name pair mass
    corpus-shaped): under the guard, driver union-find over the pairs;
    above it, the distributed label-propagation fallback runs over
    md5-hashed names and only the MERGED members (vocabulary-bounded, one
    row per non-singleton-cluster member — never the pair set) reach the
    driver. Both tails emit identical merges (min name per component);
    parity-tested in tests/test_neardup.py."""
    eligible = names_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(pc.utf8_length(t["name"]), min_len)),
        batch_format="pyarrow")
    # one execution: fetch up to LIMIT+1 names; short result -> driver path
    head = eligible.take(SMALL_NAMES_LIMIT + 1)
    if len(head) <= SMALL_NAMES_LIMIT:
        return _roots_driver_side([r["name"] for r in head], threshold)
    # unique=False: both consumers (union-find / label propagation) are
    # idempotent over repeated edges, so skip the global distinct exchange
    pairs_ds = minhash_lsh_pairs(eligible, "name", "name", shingle="char",
                                 ngram=3, threshold=threshold,
                                 id_type=pa.string(),
                                 unique=False).materialize()
    if pairs_ds.count() > max_pairs:
        return _roots_label_propagation(eligible, pairs_ds)
    pairs = pairs_ds.take_all()
    roots = union_find([(p["a"], p["b"]) for p in pairs])
    return {k: v for k, v in roots.items() if k != v}


def _roots_label_propagation(eligible, pairs_ds) -> dict[str, str]:
    """Above-guard tail: hash names to int64 (the md5low64 precedent,
    pipelines/queries_kg.py), run distributed min-label propagation over
    the hashed pair graph, join labels back to names, and reduce each
    cluster to its lexicographic-min name — the same root the driver
    union-find picks (its root is always the min member). Only merged
    members cross back to the driver."""
    from ..functions.minhash import _md5low64_raw
    from ..ops.neardup import label_propagation_clusters
    from ..ops.partition import cogroup_join_hp, partitioned_apply

    mask63 = (1 << 63) - 1

    def hash_col(col) -> pa.Array:
        """md5low64 per DISTINCT value only (the sanitize_array
        dictionary-encode trick): the pair table repeats each name ~degree
        times, so hashing the dictionary and gathering by indices keeps the
        Python md5 loop vocabulary-bounded, not row-bounded — and md5 stays
        version-stable across workers (unlike pd.util.hash_array)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        d = col.dictionary_encode()
        distinct = d.dictionary.to_pylist()
        hd = np.fromiter((_md5low64_raw(s) & mask63 for s in distinct),
                         dtype=np.int64, count=len(distinct))
        idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.array(hd[idx], pa.int64())

    hashed_names = eligible.map_batches(
        lambda t: pa.table({"id": hash_col(t["name"]), "name": t["name"]}),
        batch_format="pyarrow").materialize()
    hashed_pairs = pairs_ds.map_batches(
        lambda t: pa.table({"a": hash_col(t["a"]), "b": hash_col(t["b"])}),
        batch_format="pyarrow")
    labels = label_propagation_clusters(hashed_names, "id", hashed_pairs)
    named = cogroup_join_hp(
        labels.map_batches(
            lambda t: pa.table({"id": t["doc_id"], "label": t["cluster_id"]}),
            batch_format="pyarrow"),
        hashed_names, "id",
        pa.schema([("id", pa.int64()), ("label", pa.int64())]),
        pa.schema([("id", pa.int64()), ("name", pa.string())]))

    def merged_members(t: pa.Table) -> pa.Table:
        empty = pa.table({"name": pa.array([], pa.string()),
                          "canonical": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        t = t.sort_by([("label", "ascending"), ("name", "ascending")])
        lab = t["label"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(
            ([0], np.flatnonzero(lab[1:] != lab[:-1]) + 1))
        seg = np.zeros(len(lab), dtype=np.int64)
        seg[starts] = 1
        head_idx = starts[np.cumsum(seg) - 1]  # canonical row per member
        names = t["name"].combine_chunks() if isinstance(
            t["name"], pa.ChunkedArray) else t["name"]
        canon = pc.take(names, pa.array(head_idx, pa.int64()))
        keep = pa.array(head_idx != np.arange(len(lab)))
        return pa.table({"name": names, "canonical": canon}).filter(keep)

    rows = partitioned_apply(
        named.map_batches(lambda t: t.select(["label", "name"]),
                          batch_format="pyarrow"),
        "label", merged_members).take_all()
    return {r["name"]: r["canonical"] for r in rows}


def _roots_driver_side(names: list[str], threshold: float,
                       band_cap: int | None = None) -> dict[str, str]:
    from ..config import DEFAULT_CONFIG
    from ..functions.minhash import (_perm_params, band_keys,
                                     char_shingle_hashes, minhash_signature)

    band_cap = band_cap or DEFAULT_CONFIG.salt_group_limit
    if len(names) < 2:
        return {}
    a, b = _perm_params(64)
    sigs = np.stack([minhash_signature(char_shingle_hashes(nm, 3), a, b)
                     for nm in names])
    bands = band_keys(sigs, 16)
    # compare the SAME uint8-truncated signatures the distributed path
    # ships (ops/neardup.py sig8 transport) — full-width comparison here
    # would make the small-vocab and sharded paths merge differently on
    # threshold-boundary pairs, breaking the documented path parity
    sigs = sigs.astype(np.uint8)
    buckets: dict[tuple[int, int], list[int]] = {}
    for i in range(len(names)):
        for bnd in range(16):
            buckets.setdefault((bnd, int(bands[i, bnd])), []).append(i)
    pairs = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        if len(members) > band_cap:
            # degenerate shared band (template vocabulary): STAR pairing
            # against the min-NAME member — O(n) pairs, connectivity
            # preserved, same hub rule as the distributed path's
            # _pairs_in_partition skew guard (ops/neardup.py band_cap)
            members = sorted(members, key=lambda i: names[i])
            hub = members[0]
            for j in members[1:]:
                if (sigs[hub] == sigs[j]).mean() >= threshold:
                    pairs.add((min(names[hub], names[j]),
                               max(names[hub], names[j])))
            continue
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                i, j = members[x], members[y]
                if (sigs[i] == sigs[j]).mean() >= threshold:
                    pairs.add((min(names[i], names[j]), max(names[i], names[j])))
    roots = union_find(sorted(pairs))
    return {k: v for k, v in roots.items() if k != v}


class CanonicalMapper:
    """Rewrite a string column through the broadcast canonical dict."""

    def __init__(self, roots_ref, column: str):
        from ..ops.relational import _resolve

        self.roots = _resolve(roots_ref)
        self.column = column

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.roots:
            return t
        import pandas as pd

        s = t[self.column].to_pandas()
        mapped = s.map(self.roots).fillna(s)  # vectorized dict map
        return t.set_column(t.column_names.index(self.column), self.column,
                            pa.array(mapped.values, pa.string()))


def canonicalize_columns(ds, columns: list[str], roots: dict[str, str]):
    """Rewrite several columns through the broadcast canonical dict in ONE
    task-pool stage (a per-column actor pool would pay pool startup per
    column and statically partition the cluster; the roots dict is tiny so a
    closure + per-batch object-store get is cheaper)."""
    if not roots:
        return ds
    from ..ops.relational import broadcast

    ref = broadcast(roots)
    cols = tuple(columns)

    def rewrite(t: pa.Table, _ref=ref, _cols=cols) -> pa.Table:
        from ..ops.relational import _resolve

        rd_ = _resolve(_ref)
        import pandas as pd

        for col in _cols:
            s = t[col].to_pandas()
            mapped = s.map(rd_).fillna(s)  # vectorized dict map
            t = t.set_column(t.column_names.index(col), col,
                             pa.array(mapped.values, pa.string()))
        return t

    return ds.map_batches(rewrite, batch_format="pyarrow")


def canonicalize_column(ds, column: str, roots: dict[str, str],
                        concurrency=None):
    return canonicalize_columns(ds, [column], roots)


def alias_of_edges(roots: dict[str, str]) -> pa.Table:
    """ALIAS_OF provenance edges (merged Term -> canonical Term),
    cf. deduplicate_nodes keeping provenance (btreemap_graph.rs:718-755)."""
    from ..pipelines.kg import _const, _edge_table
    from ..schema import node_key_array

    names = sorted(roots)
    n = len(names)
    if n == 0:
        from ..schema import EDGES_SCHEMA

        return EDGES_SCHEMA.empty_table()
    name_a = pa.array(names, pa.string())
    root_a = pa.array([roots[x] for x in names], pa.string())
    src = node_key_array(_const(n, "Term"), name_a, _const(n, ""))
    dst = node_key_array(_const(n, "Term"), root_a, _const(n, ""))
    return _edge_table(n, src, "ALIAS_OF", dst,
                       operand=name_a,
                       confidence=pa.array([0.85] * n, pa.float32()),
                       strategy=_const(n, "lsh_merge"))
