"""Corrupt-input guard: a Common-Crawl-scale run WILL contain records with
null url / html / lang / warc_ts — the build must not crash (a null string
key used to blow up Ray's sort-exchange partition search with
None < str), must drop identity-less rows, and must keep referential
integrity in the output graph."""

from datetime import datetime

import pyarrow as pa
import pytest


def _hostile_pages():
    import ray.data as rd

    t = pa.table({
        "url": pa.array(["http://a.com/x", None, "http://b.com/y",
                         "http://c.com/z"], pa.string()),
        "warc_ts": pa.array([datetime(2020, 1, 1), datetime(2020, 1, 2),
                             None, datetime(2020, 1, 3)],
                            pa.timestamp("us")),
        "html": pa.array([b"<p>Alpha Beta founded Gamma Corp.</p>",
                          b"<p>x</p>", b"<p>y</p>", None], pa.binary()),
        "text": pa.array([None] * 4, pa.string()),
        "lang": pa.array(["en", "en", "en", None], pa.string()),
    })
    return rd.from_arrow(t)


def test_lazy_build_survives_hostile_rows(ray_session):
    from stakgraph_ray.pipelines.kg import build_graph

    g = build_graph(_hostile_pages())
    nodes = g["nodes"].take_all()
    edges = g["edges"].take_all()
    assert not any(r["node_key"] is None for r in nodes)
    assert not any(r["src_key"] is None or r["dst_key"] is None
                   for r in edges)
    pages = [r for r in nodes if r["node_type"] == "Page"]
    assert len(pages) == 3                      # null-url row dropped
    by_name = {r["name"]: r for r in pages}
    # null html -> deterministic skip: empty body, tagged skipped
    assert by_name["http://c.com/z"]["body"] == ""
    assert '"skipped":true' in by_name["http://c.com/z"]["meta"]
    # null lang -> "und" Language node, never a null key
    langs = {r["name"] for r in nodes if r["node_type"] == "Language"}
    assert langs == {"en", "und"}


def test_all_null_urls_degrade_to_empty_graph(ray_session):
    """Every row identity-less -> batches become EMPTY after the url guard;
    the 0-row path used to crash on a null-typed empty invalid mask
    (pa.array([]) infers NULL type; fill_null rejects it)."""
    import ray.data as rd

    from stakgraph_ray.pipelines.kg import build_graph

    t = pa.table({
        "url": pa.array([None, None], pa.string()),
        "warc_ts": pa.array([datetime(2020, 1, 1)] * 2, pa.timestamp("us")),
        "html": pa.array([b"<p>x</p>"] * 2, pa.binary()),
        "text": pa.array([None] * 2, pa.string()),
        "lang": pa.array(["en"] * 2, pa.string()),
    })
    g = build_graph(rd.from_arrow(t))
    assert [(r["node_type"], r["name"]) for r in g["nodes"].take_all()] == \
        [("Corpus", "webcorpus")]
    assert g["edges"].take_all() == []


def test_empty_pages_table_yields_corpus_only(ray_session):
    import ray.data as rd

    from stakgraph_ray.pipelines.kg import build_graph

    t = pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
        "html": pa.array([], pa.binary()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
    })
    g = build_graph(rd.from_arrow(t))
    nodes = g["nodes"].take_all()
    assert [(r["node_type"], r["name"]) for r in nodes] == \
        [("Corpus", "webcorpus")]
    assert g["edges"].take_all() == []


def test_materialized_build_survives_hostile_rows(ray_session, tmp_path):
    import duckdb

    from stakgraph_ray.stages.materialize import build_graph_materialized

    out = str(tmp_path / "g")
    build_graph_materialized(_hostile_pages(), out)
    con = duckdb.connect()
    dangling = con.sql(f"""
        with n as (select node_key from read_parquet('{out}/nodes/*.parquet'))
        select count(*) from read_parquet('{out}/edges/*.parquet')
        where src_key not in (select node_key from n)
           or dst_key not in (select node_key from n)
           or src_key is null or dst_key is null""").fetchone()[0]
    assert dangling == 0
    null_keys = con.sql(
        f"select count(*) from read_parquet('{out}/nodes/*.parquet') "
        f"where node_key is null").fetchone()[0]
    assert null_keys == 0
