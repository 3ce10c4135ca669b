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
    (whitespace tokens). [(id, score)] desc, ties by id."""
    qs = set(query_terms)
    scored = []
    for i, t in texts.items():
        toks = (t or "").split(" ")
        s = sum(1 for w in toks if w in qs)
        if s > 0:
            scored.append((i, float(s)))
    return sorted(scored, key=lambda kv: (-kv[1], kv[0]))
