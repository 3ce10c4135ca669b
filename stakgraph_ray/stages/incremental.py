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


def incremental_update(new_pages_ds, workdir: str, cfg=None,
                       dictionary: dict | None = None,
                       broadcast_limit: int = BROADCAST_LIMIT) -> dict:
    """Merge changed pages into an existing materialized graph.

    Returns build_graph_materialized's result dict plus ``n_changed``.
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

    # downstream stages are derived: invalidate their manifests
    for stage in ("linked", "nodes_raw", "edges_raw", "nodes", "edges"):
        mp = os.path.join(workdir, stage, "_MANIFEST.json")
        if os.path.exists(mp):
            os.remove(mp)

    out = build_graph_materialized(new_pages_ds, workdir, cfg, dictionary)
    out["n_changed"] = n_changed
    return out
