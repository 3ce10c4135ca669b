"""Checkpointed build + kill-and-resume lineage tests."""

import json
import os
import shutil

import pytest

from stakgraph_ray.sources.pages import read_pages
from stakgraph_ray.stages.materialize import (build_graph_materialized,
                                              manifest_complete)

WORKDIR = "/tmp/test_materialize"


@pytest.fixture(scope="module")
def built(ray_session, sf_tiny):
    shutil.rmtree(WORKDIR, ignore_errors=True)
    return build_graph_materialized(read_pages(sf_tiny), WORKDIR)


def test_stage_checkpoints_and_manifests(built):
    for stage in ("extracted", "linked", "nodes", "edges"):
        d = os.path.join(WORKDIR, stage)
        assert manifest_complete(d), stage
        m = json.load(open(os.path.join(d, "_MANIFEST.json")))
        assert m["rows"] > 0 and m["files"]
    assert os.path.exists(os.path.join(WORKDIR, "metrics.jsonl"))


def test_same_results_as_lazy_build(built, sf_tiny):
    from stakgraph_ray.pipelines.kg import build_graph

    lazy = build_graph(read_pages(sf_tiny))
    lazy_edges = lazy["edges"].to_pandas()
    mat_edges = built["edges"].to_pandas()
    key = ["src_key", "edge_type", "dst_key"]
    a = lazy_edges[key].sort_values(key).reset_index(drop=True)
    b = mat_edges[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_resume_skips_completed_stages(built, sf_tiny):
    # re-run over the same workdir: every stage must be skipped, results equal
    n_before = built["nodes"].count()
    again = build_graph_materialized(read_pages(sf_tiny), WORKDIR)
    skipped = {m["stage"]: m.get("skipped") for m in again["metrics"]}
    assert skipped["extract"] and skipped["link"]
    assert skipped["nodes"] and skipped["edges"]
    assert again["nodes"].count() == n_before


def test_resume_recomputes_incomplete_stage(built, sf_tiny):
    # kill-and-resume: drop one stage's manifest -> only that stage reruns
    edges_dir = os.path.join(WORKDIR, "edges")
    os.remove(os.path.join(edges_dir, "_MANIFEST.json"))
    n_edges = built["edges"].count()
    again = build_graph_materialized(read_pages(sf_tiny), WORKDIR)
    skipped = {m["stage"]: m.get("skipped") for m in again["metrics"]}
    assert skipped["extract"] and skipped["link"] and skipped["nodes"]
    assert not skipped["edges"]
    assert again["edges"].count() == n_edges  # no duplicate output


def test_export_graph_partitioned(built, tmp_path):
    import duckdb

    from stakgraph_ray.stages.materialize import export_graph_partitioned

    out = str(tmp_path / "bulk")
    counts = export_graph_partitioned(WORKDIR, out)
    assert counts["nodes"].get("Page") and counts["edges"].get("MENTIONS")
    con = duckdb.connect()
    # a per-label read touches only its partition and matches the flat table
    n_pages = con.sql(
        f"select count(*) from read_parquet('{out}/nodes/node_type=Page/*.parquet')"
    ).fetchone()[0]
    flat = con.sql(
        f"select count(*) from read_parquet('{WORKDIR}/nodes/*.parquet') "
        "where node_type = 'Page'").fetchone()[0]
    assert n_pages == flat == counts["nodes"]["Page"]
    total = con.sql(
        f"select count(*) from read_parquet('{out}/edges/*/*.parquet')"
    ).fetchone()[0]
    flat_e = con.sql(
        f"select count(*) from read_parquet('{WORKDIR}/edges/*.parquet')"
    ).fetchone()[0]
    assert total == flat_e == sum(counts["edges"].values())


def test_export_graph_jsonl_roundtrip(built, tmp_path):
    from stakgraph_ray.stages.materialize import (export_graph_jsonl,
                                                  read_graph_jsonl)

    out = str(tmp_path / "jsonl")
    counts = export_graph_jsonl(WORKDIR, out)
    back = read_graph_jsonl(out)
    assert back["nodes"].count() == counts["nodes"] > 0
    assert back["edges"].count() == counts["edges"] > 0
    # node keys survive the JSONL roundtrip exactly
    import duckdb

    con = duckdb.connect()
    want = {r[0] for r in con.sql(
        f"select node_key from read_parquet('{WORKDIR}/nodes/*.parquet')").fetchall()}
    got = {r["node_key"] for r in back["nodes"].take_all()}
    assert got == want


def test_event_list_and_stream_metrics(tmp_path):
    """Status-stream analog (progress.rs SSE): EventList pushes per-stage
    events to the subscriber in order (and survives a broken subscriber);
    stream_metrics tails metrics.jsonl incrementally."""
    import json

    from stakgraph_ray.stages.materialize import (EventList, append_metrics,
                                                  stream_metrics)

    got = []
    ev = EventList(got.append)
    ev.append({"stage": "extract", "rows": 10})
    ev.extend([{"stage": "link", "rows": 5}, {"stage": "nodes", "rows": 3}])
    assert [e["stage"] for e in got] == ["extract", "link", "nodes"]
    assert list(ev) == got

    def boom(_):
        raise RuntimeError("subscriber died")

    bad = EventList(boom)
    bad.append({"stage": "edges"})  # must not raise
    assert len(bad) == 1

    wd = str(tmp_path)
    append_metrics(wd, got[:2])
    first = list(stream_metrics(wd))  # single pass, no timeout
    assert [e["stage"] for e in first] == ["extract", "link"]
    append_metrics(wd, got[2:])
    again = list(stream_metrics(wd))
    assert [e["stage"] for e in again] == ["extract", "link", "nodes"]


def test_build_emits_stage_events(ray_session, tmp_path):
    """The flagship build pushes each stage event to on_event as it
    completes — the in-process subscriber sees the same stages metrics.jsonl
    records, in completion order."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stakgraph_ray.stages.materialize import build_graph_materialized

    texts = {"https://ev.org/a": "spark join table",
             "https://ev.org/b": "merge sort key"}
    urls = sorted(texts)
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(np.arange(len(urls)).astype("datetime64[us]")),
        "html": pa.array([f"<p>{texts[u]}</p>".encode() for u in urls],
                         pa.large_binary()),
        "text": pa.array([texts[u] for u in urls], pa.string()),
        "lang": pa.array(["en"] * len(urls), pa.string()),
    })
    events = []
    out = build_graph_materialized(rd.from_arrow(pages), str(tmp_path / "wd"),
                                   on_event=events.append)
    assert [e["stage"] for e in events] == [m["stage"] for m in out["metrics"]]
    assert {"extract", "link", "nodes", "edges"} <= {e["stage"] for e in events}


def test_daemon_job_result_and_reraise():
    """_DaemonJob replaces the typed-overlap ThreadPoolExecutor so a build
    that raises mid-overlap can't block interpreter exit: the thread must be
    daemon, result() returns the value, and a job exception re-raises at
    result() (not silently swallowed)."""
    from stakgraph_ray.stages.materialize import _DaemonJob

    ok = _DaemonJob(lambda: 41 + 1)
    assert ok._thread.daemon
    assert ok.result() == 42

    def boom():
        raise ValueError("typed branch failed")

    bad = _DaemonJob(boom)
    with pytest.raises(ValueError, match="typed branch failed"):
        bad.result()
