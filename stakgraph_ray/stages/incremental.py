"""Incremental re-index: recompute only changed pages, merge into the
existing checkpointed graph.

Re-expresses the reference's commit-diff incremental flow
(/root/reference/ast/src/lang/graphs/graph_ops.rs:95-275 — stored commit
hash vs current, git-diff changed files, delete those files' nodes,
re-parse only them; ast/src/gat.rs:4-57) against the checkpoint layout of
``stages.materialize``:

  1. detect changed urls: new pages whose text_sha256 differs from the
     stored extract checkpoint (or urls absent from it) — a DISTRIBUTED
     left-outer co-group join; nothing corpus-sized touches the driver
     (urls broadcast only under an explicit size guard)
  2. anti-join the old ``extracted`` checkpoint against changed urls
     (delete), union the re-extracted changed pages (insert) — the new
     pages are extracted ONCE and first-wins-deduplicated exactly like the
     full build (Neo4j MERGE semantics), so duplicate urls in the delta
     feed cannot produce duplicate Page nodes
  3. rebuild downstream stages from the merged extract checkpoint
     (mentions/links/nodes/edges are derived tables — recomputed, like the
     reference re-runs its stages over the merged file set)
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc

BROADCAST_LIMIT = 500_000


def _fresh_extracted(new_pages_ds, cfg):
    """Extract + first-wins dedup of the delta feed (same invariants as the
    full build path)."""
    from ..ops.dedup import first_per_key_batch
    from ..ops.partition import first_wins_hp
    from ..stages.extract import ExtractTextStage

    fresh = new_pages_ds.map_batches(ExtractTextStage(cfg),
                                     batch_format="pyarrow", batch_size=None)
    if cfg.dedup_pages:
        fresh = fresh.map_batches(
            lambda t: first_per_key_batch(t, "url", "warc_ts"),
            batch_format="pyarrow")
        fresh = first_wins_hp(fresh, "url", "warc_ts")
    return fresh


def changed_urls_ds(fresh_extracted_ds, workdir: str):
    """-> Dataset of urls whose extracted text differs from the stored
    checkpoint (or are new). Distributed hash-column comparison
    (precedent: /root/reference/ast/src/builder/utils.rs:256)."""
    import ray.data as rd

    from ..ops.partition import cogroup_join_hp
    from ..util import default_num_blocks

    old_dir = os.path.join(workdir, "extracted")
    new_hashes = fresh_extracted_ds.map_batches(
        lambda t: pa.table({"url": pc.cast(t["url"], pa.string()),
                            "text_sha256": pc.cast(t["text_sha256"], pa.string())}),
        batch_format="pyarrow")
    old_hashes = rd.read_parquet(old_dir, columns=["url", "text_sha256"],
                                 override_num_blocks=default_num_blocks()) \
        .map_batches(lambda t: pa.table({"url": pc.cast(t["url"], pa.string()),
                                         "old_sha": pc.cast(t["text_sha256"], pa.string())}),
                     batch_format="pyarrow")
    joined = cogroup_join_hp(
        new_hashes, old_hashes, "url",
        pa.schema([("url", pa.string()), ("text_sha256", pa.string())]),
        pa.schema([("url", pa.string()), ("old_sha", pa.string())]),
        join_type="left outer")
    return joined.map_batches(
        lambda t: t.filter(pc.or_kleene(
            pc.is_null(t["old_sha"]),
            pc.not_equal(t["old_sha"], t["text_sha256"])))
                   .select(["url"]),
        batch_format="pyarrow")


def _membership_filter_hp(payload_ds, keys_ds, keep: bool,
                          num_partitions: int | None = None):
    from ..ops.partition import membership_filter_hp

    return membership_filter_hp(payload_ds, keys_ds, "url", keep, num_partitions)


def changed_urls(new_pages_ds, workdir: str, cfg=None) -> set[str]:
    """Driver-side convenience wrapper (bounded use only — the pipeline
    path keeps the changed set a Dataset, see ``incremental_update``)."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    fresh = _fresh_extracted(new_pages_ds, cfg)
    return {r["url"] for r in changed_urls_ds(fresh, workdir).take_all()}


PRESERVE_EDGE_TYPES = ("ALIAS_OF",)
_TRIPLE_SEP = "\x1f"


def _snapshot_preserved_edges(workdir: str, preserve_types, tmp_dir: str) -> int:
    """Before the derived-stage rebuild: save the old edge checkpoint's
    DYNAMIC edges (the reference restores preserved dynamic edges after
    delete+reparse, /root/reference/ast/src/lang/graphs/graph_ops.rs:206-275
    — without this, out-of-band edges like ALIAS_OF provenance from a prior
    canonicalization round vanish in the wholesale rebuild). Returns the
    snapshot row count (0 = nothing to restore)."""
    import ray.data as rd

    from ..stages.materialize import manifest_complete
    from ..util import default_num_blocks

    edges_dir = os.path.join(workdir, "edges")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    if not preserve_types or not manifest_complete(edges_dir):
        return 0
    vs = pa.array(sorted(preserve_types), pa.string())
    kept = rd.read_parquet(edges_dir,
                           override_num_blocks=default_num_blocks()) \
        .map_batches(lambda t: t.filter(pc.is_in(t["edge_type"], value_set=vs)),
                     batch_format="pyarrow")
    kept.write_parquet(tmp_dir)
    from ..stages.materialize import _parquet_rows

    # an all-empty dataset may write no files (or no directory) at all
    return _parquet_rows(tmp_dir) if os.path.isdir(tmp_dir) else 0


def _triple_col(t: pa.Table) -> pa.Table:
    return t.append_column("_triple", pc.binary_join_element_wise(
        pc.cast(t["src_key"], pa.string()), t["edge_type"],
        pc.cast(t["dst_key"], pa.string()), _TRIPLE_SEP))


def _restore_preserved_edges(workdir: str, tmp_dir: str,
                             broadcast_limit: int) -> int:
    """After the rebuild: re-apply snapshot edges whose BOTH endpoints
    survive in the rebuilt node table and whose (src, type, dst) triple the
    rebuild did not regenerate. Guarded broadcast fast path (the snapshot is
    alias-vocabulary-sized in practice); distributed membership filters
    above the guard. Returns rows appended to the edges checkpoint."""
    import ray.data as rd

    from ..stages.materialize import _parquet_rows, write_manifest
    from ..util import default_num_blocks

    n = _parquet_rows(tmp_dir) if os.path.isdir(tmp_dir) else 0
    if n == 0:
        return 0
    nodes_dir = os.path.join(workdir, "nodes")
    edges_dir = os.path.join(workdir, "edges")
    preserved = rd.read_parquet(tmp_dir)
    nodes = rd.read_parquet(nodes_dir, columns=["node_key"],
                            override_num_blocks=default_num_blocks())
    new_edges = rd.read_parquet(
        edges_dir, columns=["src_key", "edge_type", "dst_key"],
        override_num_blocks=default_num_blocks())
    if n <= broadcast_limit:
        keys = preserved.map_batches(
            lambda t: t.select(["src_key", "edge_type", "dst_key"]),
            batch_format="pyarrow").take_all()
        want = sorted({r["src_key"] for r in keys}
                      | {r["dst_key"] for r in keys})
        want_a = pa.array(want, pa.string())
        surviving = {r["node_key"] for r in nodes.map_batches(
            lambda t: t.filter(pc.is_in(t["node_key"], value_set=want_a)),
            batch_format="pyarrow").take_all()}
        trip_a = pa.array(
            sorted(_TRIPLE_SEP.join((r["src_key"], r["edge_type"],
                                     r["dst_key"])) for r in keys),
            pa.string())
        def found_triples(t: pa.Table) -> pa.Table:
            t2 = _triple_col(t)
            return t2.filter(pc.is_in(t2["_triple"], value_set=trip_a)) \
                .select(["_triple"])

        regenerated = {r["_triple"] for r in new_edges.map_batches(
            found_triples, batch_format="pyarrow").take_all()}
        surv_a = pa.array(sorted(surviving), pa.string())
        regen_a = pa.array(sorted(regenerated), pa.string())

        def filt(t: pa.Table) -> pa.Table:
            t2 = _triple_col(t)
            mask = pc.and_(
                pc.and_(pc.is_in(t2["src_key"], value_set=surv_a),
                        pc.is_in(t2["dst_key"], value_set=surv_a)),
                pc.invert(pc.is_in(t2["_triple"], value_set=regen_a)))
            return t.filter(mask)

        kept = preserved.map_batches(filt, batch_format="pyarrow")
    else:
        from ..ops.partition import membership_filter_hp

        node_keys_as_src = nodes.map_batches(
            lambda t: pa.table({"src_key": t["node_key"]}),
            batch_format="pyarrow")
        node_keys_as_dst = nodes.map_batches(
            lambda t: pa.table({"dst_key": t["node_key"]}),
            batch_format="pyarrow")
        schema = preserved.schema().base_schema
        kept = membership_filter_hp(preserved, node_keys_as_src, "src_key",
                                    keep=True, payload_schema=schema)
        kept = membership_filter_hp(kept, node_keys_as_dst, "dst_key",
                                    keep=True, payload_schema=schema)
        trip_schema = pa.schema(list(schema)
                                + [pa.field("_triple", pa.string())])
        kept = membership_filter_hp(
            kept.map_batches(_triple_col, batch_format="pyarrow"),
            new_edges.map_batches(
                lambda t: _triple_col(t).select(["_triple"]),
                batch_format="pyarrow"),
            "_triple", keep=False, payload_schema=trip_schema) \
            .map_batches(lambda t: t.drop_columns(["_triple"]),
                         batch_format="pyarrow")
    kept = kept.materialize()
    k = kept.count()
    if k:
        kept.write_parquet(edges_dir)  # write_parquet APPENDS new files
        write_manifest(edges_dir, rows=_parquet_rows(edges_dir),
                       stage="edges", extra={"preserved_appended": k})
    return k


def incremental_update(new_pages_ds, workdir: str, cfg=None,
                       dictionary: dict | None = None,
                       broadcast_limit: int = BROADCAST_LIMIT,
                       preserve_edge_types=PRESERVE_EDGE_TYPES) -> dict:
    """Merge changed pages into an existing materialized graph.

    Returns build_graph_materialized's result dict plus ``n_changed`` and
    ``n_preserved`` (out-of-band edges of ``preserve_edge_types`` carried
    across the rebuild — restored when both endpoints survive and the
    rebuild didn't regenerate the triple, graph_ops.rs:206-275 analog).
    When nothing changed, all stages are skipped (manifests intact)."""
    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..ops.partition import cogroup_join_hp
    from ..stages.materialize import (_parquet_rows, build_graph_materialized,
                                      write_manifest)
    from ..util import default_num_blocks

    cfg = cfg or DEFAULT_CONFIG
    # extract the delta feed ONCE; reused by the hash diff and the merge
    fresh_all = _fresh_extracted(new_pages_ds, cfg).materialize()
    changed = changed_urls_ds(fresh_all, workdir).materialize()
    n_changed = changed.count()
    if n_changed == 0:
        out = build_graph_materialized(new_pages_ds, workdir, cfg, dictionary)
        out["n_changed"] = 0
        return out

    old_dir = os.path.join(workdir, "extracted")
    old = rd.read_parquet(old_dir, override_num_blocks=default_num_blocks())

    if n_changed <= broadcast_limit:
        # guarded broadcast path: the changed-url set fits comfortably
        from ..ops.relational import broadcast

        ref = broadcast(sorted(r["url"] for r in changed.take_all()))

        def keep_unchanged(t: pa.Table, _ref=ref) -> pa.Table:
            from ..ops.relational import _resolve

            vs = pa.array(_resolve(_ref))
            return t.filter(pc.invert(pc.is_in(t["url"], value_set=vs)))

        def keep_changed(t: pa.Table, _ref=ref) -> pa.Table:
            from ..ops.relational import _resolve

            vs = pa.array(_resolve(_ref))
            return t.filter(pc.is_in(t["url"], value_set=vs))

        kept = old.map_batches(keep_unchanged, batch_format="pyarrow")
        fresh = fresh_all.map_batches(keep_changed, batch_format="pyarrow")
    else:
        # distributed path: payload-preserving semi/anti membership filter —
        # hash-co-partition the payload rows with the changed-url keys and
        # decide membership inside the partition (is_in, no pyarrow join, so
        # list-typed payload columns like `hrefs` are safe)
        kept = _membership_filter_hp(old, changed, keep=False)
        fresh = _membership_filter_hp(fresh_all, changed, keep=True)
    merged = kept.union(fresh)

    tmp_dir = old_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    merged.write_parquet(tmp_dir, min_rows_per_file=100_000)
    shutil.rmtree(old_dir, ignore_errors=True)
    os.replace(tmp_dir, old_dir)
    write_manifest(old_dir, rows=_parquet_rows(old_dir), stage="extract",
                   extra={"incremental": True, "n_changed": n_changed})

    # snapshot out-of-band dynamic edges BEFORE the derived-stage rebuild
    # wipes them (graph_ops.rs:206-275 restore analog)
    preserved_dir = os.path.join(workdir, "_preserved_edges.tmp")
    n_snap = _snapshot_preserved_edges(workdir, preserve_edge_types,
                                       preserved_dir)

    # downstream stages are derived: invalidate their manifests
    for stage in ("linked", "nodes_raw", "edges_raw", "nodes", "edges"):
        mp = os.path.join(workdir, stage, "_MANIFEST.json")
        if os.path.exists(mp):
            os.remove(mp)

    out = build_graph_materialized(new_pages_ds, workdir, cfg, dictionary)
    out["n_changed"] = n_changed
    out["n_preserved"] = 0
    if n_snap:
        k = _restore_preserved_edges(workdir, preserved_dir, broadcast_limit)
        if k:
            import ray.data as rd

            from ..util import default_num_blocks

            out["edges"] = rd.read_parquet(
                os.path.join(workdir, "edges"),
                override_num_blocks=default_num_blocks())
        out["n_preserved"] = k
    shutil.rmtree(preserved_dir, ignore_errors=True)
    return out
