"""Pipeline configuration.

Mirrors the reference's env-flag + ``.ast.json`` config surface
(/root/reference/ast/src/repo.rs:266-284, ast/src/builder/utils.rs:13) as one
dataclass passed through the pipeline instead of globals.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # Reference caps file bodies at 500_000 bytes (ast/src/builder/utils.rs:13);
    # larger html payloads become empty-body Page nodes tagged meta.skipped.
    max_html_size: int = 500_000

    # Languages routed to the full mention/relation extractor stack; others get
    # the default tokenizing stack (cf. language routing, ast/src/repo.rs:368-515).
    full_stack_langs: tuple[str, ...] = ("en",)

    # Entity-linking cascade confidences, ordered (cf. the 7-strategy cascade
    # ast/src/lang/call_finder.rs:41-130). Strategy name -> confidence.
    link_confidences: tuple[tuple[str, float], ...] = (
        ("exact", 1.0),
        ("alias", 0.90),
        ("normalized", 0.80),
        ("same_page_unique", 0.70),
        ("unverified", 0.30),
    )
    keep_unverified: bool = True  # reference keeps <unverified> stubs (btreemap_graph.rs:426-430)

    # MinHash / LSH canonicalization.
    minhash_perms: int = 64
    lsh_bands: int = 16           # 16 bands x 4 rows
    shingle_k: int = 3
    jaccard_threshold: float = 0.7

    # Skew handling: band-key groups larger than this get salted into
    # sub-groups with per-salt partial processing (hub mitigation).
    salt_group_limit: int = 10_000
    num_salts: int = 8

    # Physical tuning.
    batch_size: int = 2048          # rows per batch for heavy text stages
    link_concurrency: int = 4       # actor-pool size for the linker
    extract_concurrency: int = 4    # actor-pool size for mention extraction
    output_partitions: int = 16     # hash(url) % P output layout

    # Graph epilogue in the materialized build (cf. deduplicate_nodes /
    # prune_orphan_functions, btreemap_graph.rs:664-756): prefer-typed node
    # dedup + orphan prune + edge cascade. Childless-parent filtering is a
    # separate explicit call (ops.epilogue.filter_childless_parents).
    epilogue: bool = True

    # Dedup policy: first-wins by (node_key, warc_ts) — the Neo4j MERGE
    # semantics (neo4j/queries/nodes.rs:49-50), chosen over BTreeMap last-wins.
    dedup_first_wins: bool = True
    # Global first-wins dedup of duplicate urls (one keyed shuffle). Turn off
    # when the upstream crawl store already guarantees unique urls.
    dedup_pages: bool = True


DEFAULT_CONFIG = PipelineConfig()
