"""Rich typed-entity pipeline: per-language routed pattern extraction,
per-page linking cascade (incl. same-page-unique), LSH canonicalization,
distinct triple table, and the typed node/edge graph product.

This is the full analog of the reference's per-file parse→collect→link flow
(/root/reference/ast/src/lang/parse/collect.rs — typed extractors;
ast/src/lang/call_finder.rs:41-130 — ordered-strategy cascade with
confidences; graph-reads-during-extraction re-architected as per-page
context + a second canonicalization pass, cf. SURVEY.md §7.4). The typed
graph product mirrors the reference's one-graph output
(ast/src/builder/core.rs:48-235): Person/Org/Place nodes and
FOUNDED/ACQUIRED/WORKS_AT/LOCATED_IN edges in the NODES/EDGES schema, with
the relation's ``year`` attribute kept in the edge ``operand``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..stages.extract import ExtractTextStage
from ..stages.stacks import EnglishTripleExtractor

# Backward-compatible name: the English stack IS the original rich extractor.
RichTripleExtractor = EnglishTripleExtractor


def extract_typed_triples(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                          factories: dict | None = None):
    """pages -> raw linked triples Dataset (lazy, per-language routed).

    Task-pool stage with a per-worker-process stack cache (NOT an actor
    pool): the pattern bank costs ~1ms to build, so elastic tasks that
    share CPUs with the upstream extract stage beat a fixed actor pool
    that statically partitions the cluster. The registered-stack table is
    snapshotted driver-side and ships with the function (worker processes
    would otherwise only see the default stacks)."""
    from ..stages.registry import make_router

    extracted = pages_ds.map_batches(ExtractTextStage(cfg),
                                     batch_format="pyarrow",
                                     batch_size=None)
    return extracted.map_batches(make_router(factories),
                                 batch_format="pyarrow", batch_size=None)


def _partial_agg(t: pa.Table) -> pa.Table:
    """Per-batch combiner on (subj, pred, obj): max confidence, min year,
    min type-source tags, occurrence count — shrinks everything downstream
    (names pass, canonicalization, final shuffle)."""
    g = t.group_by(["subj", "pred", "obj"]).aggregate(
        [("confidence", "max"), ("year", "min"),
         ("subj_ts", "min"), ("obj_ts", "min"), ("url", "count")])
    return g.rename_columns(["subj", "pred", "obj", "confidence", "year",
                             "subj_ts", "obj_ts", "weight"])


_TRIPLE_AGG_SPEC = ([("confidence", "max"), ("year", "min"),
                     ("subj_ts", "min"), ("obj_ts", "min"),
                     ("weight", "sum")],
                    ["confidence", "year", "subj_ts", "obj_ts", "weight"])


def build_rich_triples(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                       canon_threshold: float = 0.8,
                       factories: dict | None = None):
    """pages -> (distinct linked triples Dataset, lsh_roots dict).

    Output columns: subj, pred, obj, confidence, year, subj_ts, obj_ts,
    weight (select a subset for presentation)."""
    from ..ops.dedup import distinct
    from ..ops.partition import grouped_aggregate
    from ..stages.canonicalize import canonical_roots, canonicalize_columns

    triples = extract_typed_triples(pages_ds, cfg, factories)
    # combiner BEFORE the materialize barrier: the pinned intermediate is
    # vocabulary-sized (distinct triples per batch), not corpus-sized
    triples = triples.map_batches(_partial_agg, batch_format="pyarrow")
    # two consumers below (names pass + rewrite): pin the partial-aggregated
    # table once instead of re-running extraction per consumer
    triples = triples.materialize()

    # second pass: LSH-merge residual surface variants (e.g. "... Corp")
    names = distinct(
        triples.map_batches(
            lambda t: pa.table({"name": pa.concat_arrays([
                t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
                t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]])}),
            batch_format="pyarrow"), ["name"])
    roots = canonical_roots(names, cfg, min_len=8, threshold=canon_threshold)
    triples = canonicalize_columns(triples, ["subj", "obj"], roots)

    spec, out_names = _TRIPLE_AGG_SPEC
    agg = grouped_aggregate(triples, ["subj", "pred", "obj"], spec, out_names)
    return agg, roots


def entity_types_table(agg_triples_ds, limit: int = 1_000_000) -> dict[str, str]:
    """Aggregated triples -> {canonical name: entity type}.

    Dictionary-typed occurrences beat slot-archetype (unverified-stub)
    occurrences — the "{src}:{type}" tag encoding makes that a plain min.
    The result is entity-vocabulary-sized (the same small side the broadcast
    alias dictionary assumes); ``limit`` guards the driver collect."""
    from ..ops.partition import grouped_aggregate

    sides = agg_triples_ds.map_batches(
        lambda t: pa.table({
            "name": pa.concat_arrays([
                t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
                t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]]),
            "ts": pa.concat_arrays([
                t["subj_ts"].combine_chunks() if isinstance(t["subj_ts"], pa.ChunkedArray) else t["subj_ts"],
                t["obj_ts"].combine_chunks() if isinstance(t["obj_ts"], pa.ChunkedArray) else t["obj_ts"]]),
        }), batch_format="pyarrow")
    typed = grouped_aggregate(sides, "name", [("ts", "min")], ["ts"])
    rows = typed.take(limit + 1)
    if len(rows) > limit:
        raise RuntimeError(
            f"entity vocabulary exceeds {limit}; switch the typed-edge key "
            "derivation to a hash join (ops.relational.hash_join)")
    return {r["name"]: r["ts"].split(":", 1)[1] for r in rows}


def typed_graph_tables(agg_triples_ds, types: dict[str, str]):
    """Aggregated triples + name->type map -> (nodes_ds, edges_ds) in the
    NODES/EDGES schema (year attribute kept in edge ``operand``)."""
    from ..ops.relational import broadcast
    from .kg import _cast_edges, _cast_nodes, _const, _edge_table, _node_table, \
        strategy_from_confidence
    from ..schema import node_key_array

    ref = broadcast(types)

    def node_rows(t: pa.Table) -> pa.Table:
        from ..ops.dedup import distinct_per_batch

        names = pa.concat_arrays([
            t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
            t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]])
        d = distinct_per_batch(pa.table({"name": names}), ["name"])
        return d

    def finish_nodes(t: pa.Table, _types=ref) -> pa.Table:
        from ..ops.relational import _resolve

        tm = _resolve(_types)
        names = t["name"].to_pylist()
        typs = pa.array([tm.get(n, "Topic") for n in names], pa.string())
        out = _node_table(t.num_rows, typs, t["name"], _const(t.num_rows, ""))
        return _cast_nodes(out)

    def edge_rows(t: pa.Table, _types=ref) -> pa.Table:
        from ..ops.relational import _resolve

        tm = _resolve(_types)
        n = t.num_rows
        subj = t["subj"].to_pylist()
        obj = t["obj"].to_pylist()
        s_typ = pa.array([tm.get(x, "Topic") for x in subj], pa.string())
        o_typ = pa.array([tm.get(x, "Topic") for x in obj], pa.string())
        src = node_key_array(s_typ, pc.cast(t["subj"], pa.string()), _const(n, ""))
        dst = node_key_array(o_typ, pc.cast(t["obj"], pa.string()), _const(n, ""))
        conf = t["confidence"].to_numpy(zero_copy_only=False).astype("float32")
        strat = strategy_from_confidence(conf)
        year = pc.cast(t["year"], pa.string())
        out = _edge_table(n, src, pc.cast(t["pred"], pa.string()), dst,
                          operand=year,
                          confidence=pa.array(conf, pa.float32()),
                          strategy=pa.array(strat, pa.string()),
                          weight=t["weight"])
        return _cast_edges(out)

    from ..ops.dedup import distinct

    nodes = distinct(agg_triples_ds.map_batches(node_rows, batch_format="pyarrow"),
                     ["name"]).map_batches(finish_nodes, batch_format="pyarrow")
    edges = agg_triples_ds.map_batches(edge_rows, batch_format="pyarrow")
    return nodes, edges


def precision_recall(got: set, want: set) -> tuple[float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else 1.0
    r = tp / len(want) if want else 1.0
    return p, r
