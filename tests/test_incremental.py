"""Incremental re-index: only changed pages recomputed, graph stays exact."""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from stakgraph_ray.functions.textutils import filter_nested_spans

WORKDIR = "/tmp/test_incremental"


def _pages(texts: dict[str, str]) -> pa.Table:
    urls = sorted(texts)
    n = len(urls)
    ts = pa.array(np.arange(n).astype("datetime64[us]"))
    html = [f"<p>{texts[u]}</p>".encode() for u in urls]
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "html": pa.array(html, pa.large_binary()),
        "text": pa.array([texts[u] for u in urls], pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
    })


BASE = {
    "https://x.org/a": "spark join table",
    "https://x.org/b": "merge sort key",
    "https://x.org/c": "the batch stream",
}


def test_incremental_update(ray_session):
    import ray.data as rd

    from stakgraph_ray.stages.incremental import changed_urls, incremental_update
    from stakgraph_ray.stages.materialize import build_graph_materialized

    shutil.rmtree(WORKDIR, ignore_errors=True)
    build_graph_materialized(rd.from_arrow(_pages(BASE)), WORKDIR)

    # unchanged corpus -> zero changed urls, all stages skipped
    out = incremental_update(rd.from_arrow(_pages(BASE)), WORKDIR)
    assert out["n_changed"] == 0
    assert all(m.get("skipped") for m in out["metrics"]
               if m["stage"] in ("extract", "link", "nodes", "edges"))

    # change one page -> only that url re-extracted; graph == full rebuild
    new = dict(BASE)
    new["https://x.org/b"] = "merge sort key vector"
    changed = changed_urls(rd.from_arrow(_pages(new)), WORKDIR)
    assert changed == {"https://x.org/b"}

    out2 = incremental_update(rd.from_arrow(_pages(new)), WORKDIR)
    assert out2["n_changed"] == 1
    inc_edges = out2["edges"].to_pandas()

    shutil.rmtree(WORKDIR + "_full", ignore_errors=True)
    full = build_graph_materialized(rd.from_arrow(_pages(new)), WORKDIR + "_full")
    full_edges = full["edges"].to_pandas()

    key = ["src_key", "edge_type", "dst_key", "weight"]
    a = inc_edges[key].sort_values(key).reset_index(drop=True).fillna(-1)
    b = full_edges[key].sort_values(key).reset_index(drop=True).fillna(-1)
    assert a.equals(b)


def test_incremental_distributed_membership_path(ray_session):
    """broadcast_limit=0 forces the hash-co-partitioned semi/anti path;
    result must equal a full rebuild."""
    import ray.data as rd

    from stakgraph_ray.stages.incremental import incremental_update
    from stakgraph_ray.stages.materialize import build_graph_materialized

    wd = WORKDIR + "_dist"
    shutil.rmtree(wd, ignore_errors=True)
    build_graph_materialized(rd.from_arrow(_pages(BASE)), wd)
    new = dict(BASE)
    new["https://x.org/a"] = "spark join table stream"
    out = incremental_update(rd.from_arrow(_pages(new)), wd, broadcast_limit=0)
    assert out["n_changed"] == 1

    shutil.rmtree(wd + "_full", ignore_errors=True)
    full = build_graph_materialized(rd.from_arrow(_pages(new)), wd + "_full")
    key = ["src_key", "edge_type", "dst_key", "weight"]
    a = out["edges"].to_pandas()[key].sort_values(key).reset_index(drop=True).fillna(-1)
    b = full["edges"].to_pandas()[key].sort_values(key).reset_index(drop=True).fillna(-1)
    assert a.equals(b)


def test_incremental_dedups_duplicate_delta_urls(ray_session):
    """Duplicate urls in the delta feed must first-wins-collapse (MERGE
    semantics) — no duplicate rows in the extract checkpoint."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from stakgraph_ray.stages.incremental import incremental_update
    from stakgraph_ray.stages.materialize import build_graph_materialized

    wd = WORKDIR + "_dup"
    shutil.rmtree(wd, ignore_errors=True)
    build_graph_materialized(rd.from_arrow(_pages(BASE)), wd)

    new = dict(BASE)
    new["https://x.org/b"] = "merge sort key vector"
    dup = pa.concat_tables([_pages(new), _pages(new)])  # every url twice
    out = incremental_update(rd.from_arrow(dup), wd)
    assert out["n_changed"] == 1
    ex = pq.read_table(f"{wd}/extracted")
    urls = ex["url"].to_pylist()
    assert len(urls) == len(set(urls)) == 3


def test_filter_nested_spans():
    starts = np.array([0, 2, 2, 10, 12, 0], dtype=np.int64)
    ends = np.array([8, 5, 5, 20, 15, 8], dtype=np.int64)
    keep = filter_nested_spans(starts, ends)
    # [0,8) kept; [2,5) nested x2 dropped; [10,20) kept; [12,15) nested;
    # duplicate [0,8) dropped
    assert list(keep) == [True, False, False, True, False, False]
    assert list(filter_nested_spans(np.array([], np.int64), np.array([], np.int64))) == []


@pytest.mark.parametrize("bl", [500_000, 0])
def test_incremental_preserves_out_of_band_edges(ray_session, bl):
    """Out-of-band dynamic edges (e.g. ALIAS_OF provenance added after a
    prior round) must survive the wholesale derived-stage rebuild when both
    endpoints survive — and must NOT be restored when an endpoint is gone
    (graph_ops.rs:206-275 preserved-dynamic-edge analog). bl=0 forces the
    distributed membership-filter restore path."""
    import glob

    import pyarrow.parquet as pq
    import ray.data as rd

    from stakgraph_ray.stages.incremental import incremental_update
    from stakgraph_ray.stages.materialize import (_parquet_rows,
                                                  build_graph_materialized,
                                                  write_manifest)

    wd = WORKDIR + f"_preserve{bl}"
    shutil.rmtree(wd, ignore_errors=True)
    build_graph_materialized(rd.from_arrow(_pages(BASE)), wd)

    nodes = pq.read_table(f"{wd}/nodes", columns=["node_key", "node_type"])
    terms = sorted(k for k, t in zip(nodes["node_key"].to_pylist(),
                                     nodes["node_type"].to_pylist())
                   if t == "Term" and ("spark" in k or "batch" in k))
    assert len(terms) >= 2
    sch = pq.read_table(glob.glob(f"{wd}/edges/*.parquet")[0]).schema

    def row(src, dst):
        base = {"src_key": src, "edge_type": "ALIAS_OF", "dst_key": dst,
                "ref_id": f"oob:{src}|{dst}", "operand": "external",
                "confidence": 0.5, "strategy": "manual", "weight": 1}
        return {f.name: base.get(f.name) for f in sch}

    extra = pa.Table.from_pylist(
        [row(terms[0], terms[1]),          # both endpoints survive
         row(terms[0], "Term|gone|")],     # dangling endpoint -> dropped
        schema=sch)
    pq.write_table(extra, f"{wd}/edges/part-out-of-band.parquet")
    write_manifest(f"{wd}/edges", rows=_parquet_rows(f"{wd}/edges"),
                   stage="edges")

    new = dict(BASE)
    new["https://x.org/b"] = "merge sort key vector"
    out = incremental_update(rd.from_arrow(_pages(new)), wd,
                             broadcast_limit=bl)
    assert out["n_changed"] == 1
    assert out["n_preserved"] == 1
    e = out["edges"].to_pandas()
    oob = e[(e.edge_type == "ALIAS_OF") & (e.src_key == terms[0])]
    assert list(oob.dst_key) == [terms[1]]

    # idempotence: a second identical update changes nothing and does not
    # duplicate the preserved edge
    out2 = incremental_update(rd.from_arrow(_pages(new)), wd,
                              broadcast_limit=bl)
    assert out2["n_changed"] == 0
    e2 = out2["edges"].to_pandas()
    assert len(e2[(e2.edge_type == "ALIAS_OF")
                  & (e2.src_key == terms[0])]) == 1
