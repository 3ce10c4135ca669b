"""Incremental re-index: recompute only changed pages, merge into the
existing checkpointed graph.

Re-expresses the reference's commit-diff incremental flow
(/root/reference/ast/src/lang/graphs/graph_ops.rs:95-275 — stored commit
hash vs current, git-diff changed files, delete those files' nodes,
re-parse only them; ast/src/gat.rs:4-57) against the checkpoint layout of
``stages.materialize``:

  1. detect changed urls: new pages whose text_sha256 differs from the
     stored Page-node hash (or urls absent from the old graph)
  2. anti-join the old ``extracted`` checkpoint against changed urls
     (delete), union the re-extracted changed pages (insert)
  3. rebuild downstream stages from the merged extract checkpoint
     (mentions/links/nodes/edges are derived tables — recomputed, like the
     reference re-runs its stages over the merged file set)
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc


def changed_urls(new_pages_ds, workdir: str) -> set[str]:
    """urls whose extracted text differs from the stored graph (or are new).

    Compares sha256 of the new pages' extracted text against the previous
    ``extracted`` checkpoint (hash-column comparison, precedent:
    /root/reference/ast/src/builder/utils.rs:256)."""
    import duckdb

    from ..config import DEFAULT_CONFIG
    from ..stages.extract import ExtractTextStage

    old_dir = os.path.join(workdir, "extracted")
    new_hashes = new_pages_ds.map_batches(
        ExtractTextStage(DEFAULT_CONFIG), batch_format="pyarrow") \
        .map_batches(lambda t: t.select(["url", "text_sha256"]),
                     batch_format="pyarrow")
    new_tbl = pa.concat_tables(
        [b for b in new_hashes.iter_batches(batch_format="pyarrow")])

    con = duckdb.connect()
    con.register("new_hashes", new_tbl)
    rows = con.sql(
        f"""
        select n.url from new_hashes n
        left join read_parquet('{old_dir}/*.parquet') o on n.url = o.url
        where o.url is null or o.text_sha256 != n.text_sha256
        """).fetchall()
    return {r[0] for r in rows}


def incremental_update(new_pages_ds, workdir: str, cfg=None,
                       dictionary: dict | None = None) -> dict:
    """Merge changed pages into an existing materialized graph.

    Returns build_graph_materialized's result dict plus ``n_changed``.
    When nothing changed, all stages are skipped (manifests intact)."""
    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..stages.extract import ExtractTextStage
    from ..stages.materialize import (_parquet_rows, build_graph_materialized,
                                      manifest_complete, write_manifest)

    cfg = cfg or DEFAULT_CONFIG
    changed = changed_urls(new_pages_ds, workdir)
    if not changed:
        out = build_graph_materialized(new_pages_ds, workdir, cfg, dictionary)
        out["n_changed"] = 0
        return out

    old_dir = os.path.join(workdir, "extracted")
    changed_arr = pa.array(sorted(changed))

    kept = rd.read_parquet(old_dir).map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(t["url"], value_set=changed_arr))),
        batch_format="pyarrow")
    fresh = new_pages_ds.map_batches(ExtractTextStage(cfg), batch_format="pyarrow") \
        .map_batches(lambda t: t.filter(pc.is_in(t["url"], value_set=changed_arr)),
                     batch_format="pyarrow")
    merged = kept.union(fresh)

    tmp_dir = old_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    merged.write_parquet(tmp_dir)
    shutil.rmtree(old_dir, ignore_errors=True)
    os.replace(tmp_dir, old_dir)
    write_manifest(old_dir, rows=_parquet_rows(old_dir), stage="extract",
                   extra={"incremental": True, "n_changed": len(changed)})

    # downstream stages are derived: invalidate their manifests
    for stage in ("linked", "nodes", "edges"):
        mp = os.path.join(workdir, stage, "_MANIFEST.json")
        if os.path.exists(mp):
            os.remove(mp)

    out = build_graph_materialized(new_pages_ds, workdir, cfg, dictionary)
    out["n_changed"] = len(changed)
    return out
