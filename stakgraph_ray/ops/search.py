"""Offline search utilities: hybrid RRF fusion and token-budget limiting.

Faithful re-expressions of the reference's query-side rankers:
  - reciprocal-rank fusion with score blending and both-sides boost
    (/root/reference/mcp/src/graph/graph.ts:152-236):
    score_contribution = (1/(K+rank)) * (0.5 + 0.5*norm_score);
    items appearing in BOTH lists get a 1.5x multiplier.
  - pagerank re-rank (graph.ts:140,193-200) -> plain sort.
  - token-budget limit (graph.ts:203-216): greedy prefix while
    cumulative token_count <= max_tokens.
"""

from __future__ import annotations

import numpy as np

RRF_K = 60


def _norm_scores(items: list[tuple]) -> dict:
    if not items:
        return {}
    scores = np.array([s for _id, s in items], dtype=np.float64)
    lo, hi = scores.min(), scores.max()
    rng = (hi - lo) or 1.0
    return {i: (s - lo) / rng for i, s in items}


def rrf_fuse(fulltext: list[tuple], vector: list[tuple], k: int = RRF_K,
             limit: int | None = None) -> list[tuple]:
    """Fuse two ranked [(id, score), ...] lists (descending score order).

    Returns [(id, fused_score), ...] sorted desc, ties broken by id."""
    fused: dict = {}
    seen_ft = {i for i, _ in fulltext}
    seen_v = {i for i, _ in vector}
    for items in (fulltext, vector):
        norm = _norm_scores(items)
        for rank, (i, _score) in enumerate(items, start=1):
            fused[i] = fused.get(i, 0.0) + (1.0 / (k + rank)) * (0.5 + 0.5 * norm[i])
    for i in seen_ft & seen_v:
        fused[i] *= 1.5
    out = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    return out[:limit] if limit else out


def token_budget_limit(items: list[dict], max_tokens: int,
                       count_key: str = "token_count") -> list[dict]:
    """Greedy prefix: keep items while the running token sum fits."""
    out, total = [], 0
    for it in items:
        c = int(it.get(count_key, 0))
        if total + c > max_tokens:
            break
        out.append(it)
        total += c
    return out


def fulltext_scores(texts: dict, query_terms: list[str]) -> list[tuple]:
    """Toy fulltext ranking: per doc, count of query-term occurrences
    (whitespace tokens). [(id, score)] desc, ties by id. (Driver-side
    reference implementation; the pipeline path is fulltext_topk.)"""
    qs = set(query_terms)
    scored = []
    for i, t in texts.items():
        toks = (t or "").split(" ")
        s = sum(1 for w in toks if w in qs)
        if s > 0:
            scored.append((i, float(s)))
    return sorted(scored, key=lambda kv: (-kv[1], kv[0]))


def partial_topk(t, score_col: str, id_col: str, k: int):
    """Keep each batch's top-k (desc score, asc id tie-break) so the global
    sort exchange moves at most k rows per block instead of every scored
    row — the combiner that makes top-k scale to corpus-sized inputs."""
    import pyarrow as pa

    if t.num_rows <= k:
        return t
    s = t[score_col].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    keep = np.lexsort((ids, -s))[:k]
    return t.take(pa.array(keep, pa.int64()))


def fulltext_topk(docs_ds, id_col: str, text_col: str,
                  query_terms: list[str], k: int = 50) -> list[tuple]:
    """Pipeline-native fulltext top-k: vectorized term-count scoring inside
    map_batches (explode + is_in + bincount), per-batch partial top-k,
    distributed sort over the partials, limit k. Only the k winners reach
    the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    terms = pa.array(sorted(set(query_terms)))

    def score(t: pa.Table) -> pa.Table:
        text = pc.cast(t[text_col], pa.large_string())
        toks = pc.split_pattern(
            text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hit = pc.is_in(flat, value_set=terms).to_numpy(zero_copy_only=False)
        n = t.num_rows
        s = np.bincount(parent, weights=hit.astype("float64"), minlength=n)
        out = pa.table({id_col: t[id_col], "score": pa.array(s, pa.float64())})
        out = out.filter(pc.greater(out["score"], 0.0))
        return partial_topk(out, "score", id_col, k)

    top = docs_ds.map_batches(score, batch_format="pyarrow") \
        .sort(["score", id_col], descending=[True, False]).limit(k)
    return [(r[id_col], r["score"]) for r in top.take_all()]


def vector_topk(emb_ds, id_col: str, vec_col: str, qvec,
                k: int = 50) -> list[tuple]:
    """Pipeline-native brute-force cosine top-k for ONE query vector:
    numpy matmul per batch against the broadcast query, distributed sort,
    limit k."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import broadcast

    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    ref = broadcast(q)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        from .relational import _resolve

        if t.num_rows == 0:  # map stages can emit empty blocks
            return pa.table({id_col: t[id_col],
                             "cos": pa.array([], pa.float64())})
        qv = _resolve(_ref)
        col = t[vec_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # fixed-width list<float> -> zero-copy flatten + reshape
        m = pc.list_flatten(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(t.num_rows, -1)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cos = m @ qv
        out = pa.table({id_col: t[id_col], "cos": pa.array(cos, pa.float64())})
        return partial_topk(out, "cos", id_col, k)

    top = emb_ds.map_batches(score, batch_format="pyarrow") \
        .sort(["cos", id_col], descending=[True, False]).limit(k)
    return [(r[id_col], r["cos"]) for r in top.take_all()]
