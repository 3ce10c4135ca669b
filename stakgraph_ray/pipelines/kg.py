"""The flagship pipeline: pages corpus -> typed node/edge graph tables.

Ray-Data re-expression of the reference's 16-stage builder
(/root/reference/ast/src/builder/core.rs:48-235) over web pages:

  read pages ->
    ExtractTextStage        (stateless mb; html dropped immediately)
    mention_rows            (stateless mb; vectorized token explode)
    TermLinker              (task fn, per-worker cache; broadcast dictionary)
    node tables             (Page / Host / Language / Term entity nodes)
    edge tables             (CONTAINS / LINKS_TO / OF / MENTIONS / FOLLOWS)
    exact dedup + aggregate (one hash shuffle per table, combiner first)

Everything stays a lazy Dataset; callers consume via write_parquet /
to_pandas (small results only).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.textutils import host_of_url_column
from ..schema import node_key_array
from ..stages.extract import (ExtractTextStage, bigram_rows, link_edge_rows,
                              mention_rows)
from ..stages.link import bigram_linker_fn, make_linker_stage, term_linker_fn
from ..ops.dedup import (dedup_by_key_min, distinct, distinct_per_batch,
                         first_per_key_batch)
from ..ops.partition import (dedup_min_hp, first_wins_hp, grouped_aggregate)

_CORPUS_NAME = "webcorpus"
_CORPUS_KEY = "corpus-webcorpus-webcorpus"  # = node_key("Corpus", name, file)


def _const(n: int, v, typ=pa.string()) -> pa.Array:
    return pa.array(np.full(n, v, dtype=object) if v is not None else [None] * n, typ)


def _node_table(n, node_type, name, file, *, body=None, start=None, end=None,
                docs=None, hash_=None, data_type=None, meta_json=None,
                with_key_start: bool = False) -> pa.Table:
    """Assemble a nodes-schema table from arrays/scalars (vectorized)."""
    def arr(v, typ=pa.string()):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            a = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            return pc.cast(a, typ)
        return _const(n, v, typ)

    name_a = arr(name)
    file_a = arr(file)
    key = node_key_array(node_type if isinstance(node_type, (pa.Array, pa.ChunkedArray)) else _const(n, node_type),
                         name_a, file_a,
                         start=arr(start, pa.int64()) if with_key_start else None)
    return pa.table({
        "node_key": pc.cast(key, pa.string()),
        "node_type": arr(node_type),
        "name": name_a,
        "file": file_a,
        "body": arr(body, pa.large_string()),
        "start": arr(start, pa.int64()),
        "end": arr(end, pa.int64()),
        "docs": arr(docs),
        "hash": arr(hash_),
        "data_type": arr(data_type),
        "meta": arr(meta_json),
    })


def _edge_table(n, src_key, edge_type, dst_key, *, operand=None,
                confidence=None, strategy=None, weight=None) -> pa.Table:
    def arr(v, typ=pa.string()):
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            a = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
            return pc.cast(a, typ)
        return _const(n, v, typ)

    src = arr(src_key)
    et = arr(edge_type)
    dst = arr(dst_key)
    sep = pa.scalar("|")
    ref = pc.binary_join_element_wise(src, et, dst, sep)
    return pa.table({
        "src_key": src,
        "edge_type": et,
        "dst_key": dst,
        "ref_id": ref,
        "operand": arr(operand),
        "confidence": arr(confidence, pa.float32()),
        "strategy": arr(strategy),
        "weight": arr(weight, pa.int64()),
    })


# ---------------------------------------------------------------- node stages

def page_node_rows(batch: pa.Table) -> pa.Table:
    """Extract-stage batch -> Page nodes (cf. prepare_file_data,
    /root/reference/ast/src/builder/utils.rs:247-258: File node + sha256)."""
    n = batch.num_rows
    meta = _meta_json(batch)
    text = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    return _node_table(
        n, "Page", batch["url"], batch["url"],
        body=pc.cast(text, pa.large_string()),
        start=pa.array(np.zeros(n, dtype="int64")),
        end=pc.cast(pc.utf8_length(text), pa.int64()),  # char offsets (contract)
        docs=batch["title"] if "title" in batch.column_names else None,
        hash_=batch["text_sha256"],
        meta_json=meta,
    )


def _meta_json(batch: pa.Table) -> pa.Array:
    """meta = canonical JSON {lang, skipped} (open property bag,
    cf. NodeData.meta ast/src/lang/asg.rs:144-228). Vectorized concat."""
    lang = pc.cast(batch["lang"], pa.string())
    skipped = pc.if_else(batch["skipped"].combine_chunks() if isinstance(batch["skipped"], pa.ChunkedArray) else batch["skipped"],
                         pa.scalar("true"), pa.scalar("false"))
    return pc.binary_join_element_wise(
        pa.scalar('{"lang":"'), lang, pa.scalar('","skipped":'), skipped,
        pa.scalar("}"), pa.scalar(""))


def host_rows(batch: pa.Table) -> pa.Table:
    host = host_of_url_column(batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"])
    return distinct_per_batch(pa.table({"host": pc.cast(host, pa.string())}), ["host"])


def host_node_rows(batch: pa.Table) -> pa.Table:
    return _node_table(batch.num_rows, "Host", batch["host"], batch["host"])


def lang_rows(batch: pa.Table) -> pa.Table:
    return distinct_per_batch(pa.table({"lang": pc.cast(batch["lang"], pa.string())}), ["lang"])


def lang_node_rows(batch: pa.Table) -> pa.Table:
    return _node_table(batch.num_rows, "Language", batch["lang"], batch["lang"])


def entity_node_rows(batch: pa.Table) -> pa.Table:
    """Linked-mention batch -> Term entity nodes (per-batch distinct)."""
    d = distinct_per_batch(pa.table({"canonical": batch["canonical"]}), ["canonical"])
    return _node_table(d.num_rows, "Term", d["canonical"], "")


# ---------------------------------------------------------------- edge stages

def page_edge_rows(batch: pa.Table) -> pa.Table:
    """Extract-stage batch -> per-page structural edges: Host CONTAINS Page,
    Page OF Language. One edge of each kind per page row, and urls are
    globally unique after extraction (first-wins dedup when
    cfg.dedup_pages, the source contract otherwise), so these ref_ids are
    unique ACROSS batches by construction — no keyed dedup exchange needed
    downstream (the r04 build paid a corpus-scale sort here for an
    identity dedup). Corpus CONTAINS Host edges moved to
    ``corpus_host_edge_rows`` over the distinct-host table: the same host
    repeats in every batch, which is exactly the cross-batch duplication
    this stage no longer has."""
    n = batch.num_rows
    url = batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    host = pc.cast(host_of_url_column(url), pa.string())
    page_key = node_key_array(_const(n, "Page"), url, url)
    host_key = node_key_array(_const(n, "Host"), host, host)
    lang = pc.cast(batch["lang"], pa.string())
    lang_key = node_key_array(_const(n, "Language"), lang, lang)

    contains = _edge_table(n, host_key, "CONTAINS", page_key)
    of = _edge_table(n, page_key, "OF", lang_key)
    return pa.concat_tables([contains, of])


def corpus_host_edge_rows(batch: pa.Table) -> pa.Table:
    """Distinct-host batch (column ``host``) -> Corpus CONTAINS Host edges.
    Runs over the SAME vocabulary-scale distinct-host table that feeds
    host_node_rows (one shared tiny exchange), not over page batches."""
    n = batch.num_rows
    host = pc.cast(batch["host"], pa.string())
    host_key = node_key_array(_const(n, "Host"), host, host)
    return _edge_table(n, _CORPUS_KEY, "CONTAINS", host_key)


def links_to_edge_rows(batch: pa.Table) -> pa.Table:
    """link rows (url, dst_host) -> Page LINKS_TO Host edges (per-batch distinct)."""
    d = distinct_per_batch(batch.select(["url", "dst_host"]), ["url", "dst_host"])
    n = d.num_rows
    page_key = node_key_array(_const(n, "Page"), d["url"], d["url"])
    host_key = node_key_array(_const(n, "Host"), d["dst_host"], d["dst_host"])
    return _edge_table(n, page_key, "LINKS_TO", host_key)


def links_to_edges_from_extracted(batch: pa.Table) -> pa.Table:
    """Extract-stage batch -> distinct Page LINKS_TO Host edges, in ONE UDF.

    The href explode (``link_edge_rows``) and the per-batch distinct
    (``links_to_edge_rows``) must share a single map_batches call: as two
    fused stages, Ray's intermediate output buffer slices stage-1 output at
    ``target_max_block_size`` (128 MiB), and a slice landing mid-page puts
    the same (url, dst_host) pair in two stage-2 batches — the per-batch
    distinct cannot see across the split and duplicate LINKS_TO edges
    (identical ref_ids) reach the final table. LINKS_TO has no downstream
    keyed combine to absorb them (unlike the mention/bigram partials, which
    a global grouped aggregate follows). Inside one UDF the no-duplicates
    invariant is structural: a url's hrefs live in one input ROW, urls are
    globally unique post-extract, and Ray never splits a row."""
    return links_to_edge_rows(link_edge_rows(batch))


def mention_edge_partial(batch: pa.Table) -> pa.Table:
    """Linked mentions -> per-batch partial aggregate on (url, canonical):
    weight=count, confidence=max (combiner before the global shuffle,
    the partial-aggregation pattern)."""
    g = batch.group_by(["url", "canonical"]).aggregate(
        [("confidence", "max"), ("surface", "count")])
    return g.rename_columns(["url", "canonical", "confidence", "weight"])


def bigram_partial(batch: pa.Table) -> pa.Table:
    g = batch.group_by(["a", "b"]).aggregate([("pos", "count")])
    return g.rename_columns(["a", "b", "weight"])


def bigram_surface_partial(batch: pa.Table) -> pa.Table:
    """Raw bigram rows -> per-batch (a, b, weight) on SURFACE forms.

    Run BEFORE the linker so the cascade touches only the distinct surface
    pairs of each batch (vocab², not corpus-size) — same final weights."""
    g = batch.group_by(["a", "b"]).aggregate([("pos", "count")])
    return g.rename_columns(["a", "b", "weight"])


def bigram_weight_partial(batch: pa.Table) -> pa.Table:
    """Canonicalized partial (a, b, weight) -> re-combined per batch."""
    g = batch.group_by(["a", "b"]).aggregate([("weight", "sum")])
    return g.rename_columns(["a", "b", "weight"])


_STRATEGY_BOUNDS = (  # confidence -> strategy (bijective cascade levels)
    (0.95, "exact"), (0.85, "alias"), (0.75, "normalized"),
    (0.5, "same_page_unique"), (0.0, "unverified"),
)


def strategy_from_confidence(conf: np.ndarray) -> np.ndarray:
    conds = [conf >= lo for lo, _ in _STRATEGY_BOUNDS]
    return np.select(conds, [n for _, n in _STRATEGY_BOUNDS], default="unverified")


def mention_edge_final(batch: pa.Table) -> pa.Table:
    """Globally aggregated (url, canonical, confidence, weight) -> MENTIONS edges."""
    n = batch.num_rows
    url = pc.cast(batch["url"], pa.string())
    canon = pc.cast(batch["canonical"], pa.string())
    page_key = node_key_array(_const(n, "Page"), url, url)
    term_key = node_key_array(_const(n, "Term"), canon, _const(n, ""))
    conf = batch["confidence"].to_numpy(zero_copy_only=False).astype("float32")
    strat = strategy_from_confidence(conf)
    return _edge_table(n, page_key, "MENTIONS", term_key,
                       operand=canon,
                       confidence=pa.array(conf, pa.float32()),
                       strategy=pa.array(strat, pa.string()),
                       weight=batch["weight"])


def bigram_edge_final(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    a = pc.cast(batch["a"], pa.string())
    b = pc.cast(batch["b"], pa.string())
    a_key = node_key_array(_const(n, "Term"), a, _const(n, ""))
    b_key = node_key_array(_const(n, "Term"), b, _const(n, ""))
    return _edge_table(n, a_key, "FOLLOWS", b_key, weight=batch["weight"])


# ---------------------------------------------------------------- pipeline

def build_graph(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                dictionary: dict | None = None) -> dict:
    """pages Dataset -> {"extracted", "mentions", "nodes", "edges"} Datasets.

    Outputs are lazy past the `extracted` branch point, which is pinned
    (materialized) once — ~7 consumers re-read its blocks instead of
    re-running HTML extraction each; `host_distinct` is a second pin at
    vocabulary scale (rows = |hosts|). `nodes` and `edges` have the full
    typed schema. The checkpointed flagship (stages/materialize.py) writes
    Parquet at these same branch points instead — the 100-TB shape.
    """
    from ray.data.aggregate import Max, Sum

    extracted = pages_ds.map_batches(ExtractTextStage(cfg), batch_format="pyarrow",
                                     batch_size=None)
    if cfg.dedup_pages:
        # First-wins on url by warc_ts (Neo4j MERGE semantics,
        # neo4j/queries/nodes.rs:49-50): per-batch combiner, then one keyed
        # shuffle. Disable when the source guarantees unique urls.
        extracted = extracted.map_batches(
            lambda t: first_per_key_batch(t, "url", "warc_ts"),
            batch_format="pyarrow")
        extracted = first_wins_hp(extracted, "url", "warc_ts")

    # ~7 consumers branch off `extracted` below; a lazy branch point would
    # re-run HTML extraction per consumer. Pin it once — object-store backed,
    # spills under pressure (the checkpointed flagship writes parquet
    # instead, stages/materialize.py).
    extracted = extracted.materialize()

    mentions = extracted.map_batches(mention_rows, batch_format="pyarrow")
    linker_kwargs = make_linker_stage(cfg, dictionary)
    linked = mentions.map_batches(
        term_linker_fn(linker_kwargs),
        batch_format="pyarrow", batch_size=None)

    # --- nodes -------------------------------------------------------------
    page_nodes = extracted.map_batches(page_node_rows, batch_format="pyarrow")
    # vocabulary-scale distinct hosts, shared by Host nodes AND the
    # Corpus CONTAINS Host edges (materialized: rows = |hosts|, tiny)
    host_distinct = distinct(
        extracted.map_batches(host_rows, batch_format="pyarrow"),
        ["host"]).materialize()
    host_nodes = host_distinct.map_batches(host_node_rows,
                                           batch_format="pyarrow")
    lang_nodes = distinct(extracted.map_batches(lang_rows, batch_format="pyarrow"), ["lang"]) \
        .map_batches(lang_node_rows, batch_format="pyarrow")
    node_cols = [f.name for f in _NODES_ORDER]
    term_nodes = dedup_min_hp(
        linked.map_batches(entity_node_rows, batch_format="pyarrow"), "node_key",
        columns=node_cols)
    # restore column order after groupby-aggregate moved the key first
    term_nodes = term_nodes.map_batches(_cast_nodes, batch_format="pyarrow")

    import ray.data as rd

    corpus_node = rd.from_arrow(_node_table(1, "Corpus", _CORPUS_NAME, _CORPUS_NAME))
    nodes = corpus_node.union(host_nodes, lang_nodes, page_nodes, term_nodes)

    # --- edges -------------------------------------------------------------
    # struct/link ref_ids are unique across batches by construction (see
    # page_edge_rows + links_to_edges_from_extracted docstrings: explode and
    # distinct share one UDF so Ray's inter-stage block slicing can't split
    # a url's link rows) -> pure map branches, no keyed dedup exchange.
    # Corpus edges ride the tiny host_distinct table.
    struct_edges = extracted.map_batches(page_edge_rows, batch_format="pyarrow")
    struct_edges = struct_edges.union(host_distinct.map_batches(
        corpus_host_edge_rows, batch_format="pyarrow"))
    struct_edges = struct_edges.map_batches(_cast_edges, batch_format="pyarrow")

    link_edges = extracted.map_batches(links_to_edges_from_extracted,
                                       batch_format="pyarrow")
    link_edges = link_edges.map_batches(_cast_edges, batch_format="pyarrow")

    mention_partial = linked.map_batches(mention_edge_partial, batch_format="pyarrow")
    mention_agg = grouped_aggregate(
        mention_partial, ["url", "canonical"],
        [("confidence", "max"), ("weight", "sum")], ["confidence", "weight"])
    mention_edges = mention_agg.map_batches(mention_edge_final, batch_format="pyarrow")

    bigrams = extracted.map_batches(bigram_rows, batch_format="pyarrow") \
        .map_batches(bigram_surface_partial, batch_format="pyarrow")
    bigrams = bigrams.map_batches(
        bigram_linker_fn(linker_kwargs),
        batch_format="pyarrow", batch_size=None)
    bigram_agg = grouped_aggregate(
        bigrams.map_batches(bigram_weight_partial, batch_format="pyarrow"),
        ["a", "b"], [("weight", "sum")], ["weight"])
    bigram_edges = bigram_agg.map_batches(bigram_edge_final, batch_format="pyarrow")

    edges = struct_edges.union(link_edges, mention_edges, bigram_edges)

    return {"extracted": extracted, "mentions": linked,
            "nodes": nodes, "edges": edges}


from ..schema import NODES_SCHEMA as _NS, EDGES_SCHEMA as _ES  # noqa: E402

_NODES_ORDER = list(_NS)
_EDGES_ORDER = list(_ES)


def _cast_to(schema: pa.Schema):
    def cast(t: pa.Table) -> pa.Table:
        cols = [pc.cast(t[f.name], f.type) if t.schema.field(f.name).type != f.type
                else t[f.name] for f in schema]
        return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                                     for c in cols], schema=schema)
    return cast


_cast_nodes = _cast_to(_NS)
_cast_edges = _cast_to(_ES)
