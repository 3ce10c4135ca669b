"""End-to-end KG pipeline tests on the sf0.001 corpus (Ray, local)."""

import duckdb
import pyarrow as pa
import pytest

from stakgraph_ray.config import DEFAULT_CONFIG
from stakgraph_ray.functions import vocab
from stakgraph_ray.pipelines.kg import build_graph
from stakgraph_ray.sources.pages import read_pages
from stakgraph_ray.stages.extract import mention_rows
from stakgraph_ray.stages.link import TermLinker


@pytest.fixture(scope="module")
def graph(ray_session, sf_tiny):
    ds = read_pages(sf_tiny)
    g = build_graph(ds)
    # materialize once; results at sf0.001 are tiny
    return {"nodes": g["nodes"].to_pandas(), "edges": g["edges"].to_pandas()}


def _duck(sf_dir):
    con = duckdb.connect()
    con.sql(f"create view documents as select * from read_parquet('{sf_dir}/documents.parquet')")
    return con


def test_page_nodes(graph, sf_tiny):
    nodes = graph["nodes"]
    pages = nodes[nodes.node_type == "Page"]
    con = _duck(sf_tiny)
    n_docs = con.sql("select count(*) from documents").fetchone()[0]
    assert len(pages) == n_docs
    # skipped rows tagged in meta
    n_skip = con.sql("select count(*) from documents where doc_id % 1000 in (13,29)").fetchone()[0]
    assert (pages.meta.str.contains('"skipped":true')).sum() == n_skip
    # page body == document text for non-skipped
    row = con.sql("select doc_id, text, source from documents where doc_id % 1000 not in (13,29) limit 1").fetchone()
    url = f"https://{row[2]}.example.org/doc/{row[0]:08d}"
    assert pages[pages.file == url].body.iloc[0] == row[1]


def test_host_and_lang_nodes(graph, sf_tiny):
    nodes = graph["nodes"]
    con = _duck(sf_tiny)
    hosts = sorted(nodes[nodes.node_type == "Host"].name)
    want_hosts = sorted(r[0] + ".example.org" for r in con.sql("select distinct source from documents").fetchall())
    assert hosts == want_hosts
    langs = sorted(nodes[nodes.node_type == "Language"].name)
    want_langs = sorted(r[0] for r in con.sql("select distinct lang from documents").fetchall())
    assert langs == want_langs
    assert (nodes.node_type == "Corpus").sum() == 1


def test_term_nodes_and_mention_edges(graph, sf_tiny):
    nodes = graph["nodes"]
    edges = graph["edges"]
    con = _duck(sf_tiny)
    terms = set(nodes[nodes.node_type == "Term"].name)
    # expected: canonical of every non-stop token in non-skipped docs
    toks = [r[0] for r in con.sql(
        "select distinct unnest(string_split(text,' ')) from documents where doc_id % 1000 not in (13,29)").fetchall()]
    expect = set()
    for t in toks:
        if t in vocab.STOPWORDS:
            continue
        expect.add(vocab.ALIASES.get(t, t))
    assert terms == expect

    mentions = edges[edges.edge_type == "MENTIONS"]
    # weight sum == total non-stop tokens
    total = con.sql(
        "select count(*) from (select unnest(string_split(text,' ')) tok from documents "
        "where doc_id % 1000 not in (13,29)) where tok not in ('the','a')").fetchone()[0]
    assert mentions.weight.sum() == total
    # every mention edge confidence matches its strategy
    strat_conf = dict(DEFAULT_CONFIG.link_confidences)
    for s, c in zip(mentions.strategy, mentions.confidence):
        assert abs(strat_conf[s] - c) < 1e-6


def test_structural_edges(graph, sf_tiny):
    edges = graph["edges"]
    con = _duck(sf_tiny)
    n_docs = con.sql("select count(*) from documents").fetchone()[0]
    n_hosts = con.sql("select count(distinct source) from documents").fetchone()[0]
    contains = edges[edges.edge_type == "CONTAINS"]
    assert len(contains) == n_docs + n_hosts  # host->page + corpus->host
    of = edges[edges.edge_type == "OF"]
    assert len(of) == n_docs
    links = edges[edges.edge_type == "LINKS_TO"]
    # every non-skipped page links to its own host exactly once
    n_ok = con.sql("select count(*) from documents where doc_id % 1000 not in (13,29)").fetchone()[0]
    assert len(links) == n_ok


def test_bigram_edges(graph, sf_tiny):
    edges = graph["edges"]
    con = _duck(sf_tiny)
    follows = edges[edges.edge_type == "FOLLOWS"]
    want = con.sql("""
        with s as (select doc_id, string_split(text,' ') toks from documents
                   where doc_id % 1000 not in (13,29)),
        t as (select doc_id, generate_subscripts(toks,1) i, unnest(toks) tok from s)
        select count(*) from t a join t b on a.doc_id=b.doc_id and b.i=a.i+1
        where a.tok not in ('the','a') and b.tok not in ('the','a')
    """).fetchone()[0]
    assert follows.weight.sum() == want
    # endpoints are canonical Term keys — no dangling aliases/stopwords
    assert not follows.src_key.str.contains("term-agg-").any()
    assert not follows.src_key.str.startswith("term-the-").any()


def test_mention_offsets_match_python():
    tbl = pa.table({
        "url": ["u1", "u2", "u3"],
        "lang": ["en", "en", "en"],
        "text": ["hello world foo", "x", ""],
    })
    out = mention_rows(tbl)
    rows = out.to_pylist()
    # python reference: str.split with offsets
    expect = []
    for u, t in [("u1", "hello world foo"), ("u2", "x"), ("u3", "")]:
        off = 0
        for i, w in enumerate(t.split(" ") if t else []):
            expect.append((u, w, i, off, off + len(w)))
            off += len(w) + 1
    got = [(r["url"], r["surface"], r["pos"], r["start"], r["end"]) for r in rows]
    assert got == expect


def test_linker_cascade():
    linker = TermLinker()
    batch = pa.table({
        "url": ["u"] * 6,
        "surface": ["spark", "agg", "Spark", "J.O.I.N", "zzz", "the"],
    })
    out = linker(batch).to_pylist()
    by = {r["surface"]: r for r in out}
    assert by["spark"]["strategy"] == "exact" and by["spark"]["canonical"] == "spark"
    assert by["agg"]["strategy"] == "alias" and by["agg"]["canonical"] == "aggregate"
    assert by["Spark"]["strategy"] == "normalized" and by["Spark"]["canonical"] == "spark"
    assert by["J.O.I.N"]["strategy"] == "normalized" and by["J.O.I.N"]["canonical"] == "join"
    assert by["zzz"]["strategy"] == "unverified"
    assert abs(by["zzz"]["confidence"] - 0.3) < 1e-6
    assert "the" not in by  # stopword dropped


def test_links_to_explode_and_distinct_share_one_udf():
    """Explode + per-batch distinct MUST run in one UDF: as two fused
    map_batches stages, Ray's inter-stage block slicing can land mid-page
    and the same (url, dst_host) pair reaches two distinct calls — the
    duplicate LINKS_TO edge survives (LINKS_TO has no downstream keyed
    combine). Pins (a) the split hazard on the two-stage shape and (b) the
    composed links_to_edges_from_extracted being duplicate-free and equal
    to a global distinct of the explode."""
    from stakgraph_ray.pipelines.kg import (links_to_edge_rows,
                                            links_to_edges_from_extracted)
    from stakgraph_ray.stages.extract import link_edge_rows

    extracted = pa.table({
        "url": ["https://a.org/x", "https://a.org/y"],
        "hrefs": [["https://b.org/1", "https://b.org/2", "https://b.org/3"],
                  ["https://c.org/1"]],
    })
    exploded = link_edge_rows(extracted)          # 4 (url, dst_host) rows

    # (a) the hazard: a mid-page slice between the two stages duplicates
    split = pa.concat_tables([links_to_edge_rows(exploded.slice(0, 1)),
                              links_to_edge_rows(exploded.slice(1))])
    assert split.num_rows == 3                    # duplicate a.org/x->b.org

    # (b) the fix: one UDF over the extracted batch, structural invariant
    edges = links_to_edges_from_extracted(extracted)
    assert edges.num_rows == 2                    # x->b.org, y->c.org
    assert edges.num_rows == len(set(zip(
        edges["src_key"].to_pylist(), edges["dst_key"].to_pylist())))
