"""Closed vocabulary + alias dictionary for the documents-derived corpus.

The driver's synthetic ``documents`` table draws from a closed 31-word
vocabulary. We treat each non-stopword token as a mention of a ``Term``
entity and link it through the confidence cascade
(cf. /root/reference/ast/src/lang/call_finder.rs:41-130). The alias
dictionary below is the corpus's equivalent of the per-language type
registry (ast/src/lang/registry/) — a small, broadcastable side table.

Everything here is deterministic and mirrored 1:1 in the DuckDB oracle SQL
(inline VALUES lists), so keep the three sets in sync with
``stakgraph_ray.oracle_support``.
"""

from __future__ import annotations

STOPWORDS: frozenset[str] = frozenset({"the", "a"})

# alias surface -> canonical entity name (strategy "alias", confidence 0.90)
ALIASES: dict[str, str] = {
    "agg": "aggregate",
    "dup": "duplicate",
    "big": "large",
    "fast": "quick",
    "vec": "vector",
}

# Terms that ARE canonical entities (strategy "exact", confidence 1.0).
CANONICAL_TERMS: frozenset[str] = frozenset({
    "aggregate", "batch", "column", "customer", "data", "duplicate", "filter",
    "group", "hash", "join", "key", "large", "line", "merge", "order", "part",
    "query", "quick", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window",
})


# Sharded-dictionary linking lives in stages.shardlink (build_dict_shards
# + link_mentions_sharded): shard assignment reuses the pipeline's
# partition hash so a mention's partition and its shard coincide.
