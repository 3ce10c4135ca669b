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

# Combiner outputs up to this many rows take the single-driver reduce path
# (one guarded collect of distinct surface triples — the same vocab-scale
# bound the broadcast alias dictionaries already assume). Above it, the
# distributed keyed-shuffle path runs.
DRIVER_TAIL_LIMIT = 2_000_000

# schema of the aggregated triple table (grouped_aggregate output)
AGG_TRIPLES_SCHEMA = pa.schema([
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj", pa.string()),
    pa.field("confidence", pa.float32()),
    pa.field("year", pa.int32()),
    pa.field("subj_ts", pa.string()),
    pa.field("obj_ts", pa.string()),
    pa.field("weight", pa.int64()),
])


def _agg_table(t: pa.Table, spec, out_names) -> pa.Table:
    g = t.group_by(["subj", "pred", "obj"]).aggregate(spec)
    return g.rename_columns(["subj", "pred", "obj", *out_names])


def _driver_tail(local: pa.Table, spec, out_names, canon_threshold: float,
                 min_len: int = 8):
    """Vocab-scale reduce on the driver: aggregate → LSH roots → canonical
    rewrite → re-aggregate. Kernel-for-kernel identical to the distributed
    path (same pyarrow group_by spec, same `_roots_driver_side` hash
    functions, same dict-map rewrite), so both paths emit the same table."""
    import pyarrow.compute as pc

    from ..stages.canonicalize import _roots_driver_side

    agg = _agg_table(local, spec, out_names)
    names = pc.unique(pa.concat_arrays(
        [agg["subj"].combine_chunks(), agg["obj"].combine_chunks()]))
    eligible = sorted(names.filter(
        pc.greater_equal(pc.utf8_length(names), min_len)).to_pylist())
    roots = _roots_driver_side(eligible, canon_threshold)
    if not roots:
        return agg, roots
    import pandas as pd

    for col in ("subj", "obj"):
        s = agg[col].to_pandas()
        mapped = s.map(roots).fillna(s)
        agg = agg.set_column(agg.column_names.index(col), col,
                             pa.array(mapped.values, pa.string()))
    return _agg_table(agg, spec, out_names), roots


def reduce_triples(m, cfg: PipelineConfig = DEFAULT_CONFIG,
                   canon_threshold: float = 0.8, min_len: int = 8):
    """Materialized combiner output -> (final aggregated triples, roots).

    Every aggregate (max confidence, min year/ts, sum weight) is
    associative+commutative, so aggregating the combiner output, then
    re-aggregating after the canonical rewrite, is exact. Two shapes:
      small (combiner output ≤ DRIVER_TAIL_LIMIT rows): single driver
        reduce — the same guarded vocab-scale collect the broadcast
        dictionaries already assume; avoids 4+ executor round trips.
      large: hash-partitioned keyed shuffle (grouped_aggregate) and
        Dataset passes throughout — the 100-TB shape.
    Both paths run identical kernels (see test_rich_corpus parity test)
    and return a MATERIALIZED Dataset (consumers fan out)."""
    import ray
    import ray.data as rd

    from ..ops.dedup import distinct
    from ..ops.partition import grouped_aggregate
    from ..stages.canonicalize import canonical_roots, canonicalize_columns

    spec, out_names = _TRIPLE_AGG_SPEC

    n = m.count()
    if n == 0:  # corpora without relation patterns (empty blocks lose schema)
        return rd.from_arrow(AGG_TRIPLES_SCHEMA.empty_table()), {}
    if n <= DRIVER_TAIL_LIMIT:
        local = pa.concat_tables(
            [t for t in ray.get(m.to_arrow_refs()) if t.num_rows],
            promote_options="permissive")
        final_t, roots = _driver_tail(local, spec, out_names,
                                      canon_threshold=canon_threshold,
                                      min_len=min_len)
        return rd.from_arrow(final_t), roots

    agg = grouped_aggregate(m, ["subj", "pred", "obj"], spec, out_names)
    agg = agg.materialize()  # vocab-sized pin; two small consumers below

    # second pass: LSH-merge residual surface variants (e.g. "... Corp")
    names = distinct(
        agg.map_batches(
            lambda t: pa.table({"name": pa.concat_arrays([
                t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
                t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]])}),
            batch_format="pyarrow"), ["name"])
    roots = canonical_roots(names, cfg, min_len=min_len,
                            threshold=canon_threshold)
    if not roots:
        return agg, roots
    rewritten = canonicalize_columns(agg, ["subj", "obj"], roots)
    final = grouped_aggregate(rewritten, ["subj", "pred", "obj"], spec, out_names)
    return final.materialize(), roots


def build_rich_triples(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                       canon_threshold: float = 0.8,
                       factories: dict | None = None):
    """pages -> (distinct linked triples Dataset, lsh_roots dict).

    Output columns: subj, pred, obj, confidence, year, subj_ts, obj_ts,
    weight (select a subset for presentation)."""
    triples = extract_typed_triples(pages_ds, cfg, factories)
    # Combiner fused into the extract chain, then ONE materialize barrier.
    # No all-to-all inside this execution: the streaming executor reserves
    # resources for shuffle operators, which would starve the (dominant)
    # extraction map — keep this execution pure-map so it gets every CPU.
    # The pinned intermediate is per-block-distinct triples: bounded by
    # 256 bytes/row × surface vocabulary × #blocks, not corpus size.
    triples = triples.map_batches(_partial_agg, batch_format="pyarrow")
    m = triples.materialize()
    return reduce_triples(m, cfg, canon_threshold=canon_threshold)


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
