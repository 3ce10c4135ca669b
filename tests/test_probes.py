"""Unit tests for the test-linking extractor analogs (stages/probes.py)."""

import pyarrow as pa

from stakgraph_ray.sources.pages import build_pages_batch
from stakgraph_ray.stages.probes import (http_probe_rows, link_section_rows,
                                         page_kind_rows, data_testid_rows)


def _pages():
    docs = pa.table({
        "doc_id": pa.array([0, 1, 3, 5, 13, 15, 29], pa.int64()),
        "text": ["alpha beta"] * 7,
        "lang": ["en"] * 7,
        "source": ["news"] * 7,
    })
    return build_pages_batch(docs)


def test_testid_rows_capture_and_skip_gate():
    rows = data_testid_rows(_pages()).to_pylist()
    got = {(r["url"].rsplit("/", 1)[-1], r["testid"]) for r in rows}
    # doc 0, 3, 15 have testids (doc_id % 3 == 0); 13/29 skipped either way
    assert got == {
        ("00000000", "main-0"), ("00000000", "nav-news"),
        ("00000003", "main-3"), ("00000003", "nav-news"),
        ("00000015", "main-15"), ("00000015", "nav-news"),
    }


def test_http_probe_rows_verbs_and_paths():
    rows = http_probe_rows(_pages()).to_pylist()
    got = {(r["url"].rsplit("/", 1)[-1], r["verb"], r["path"]) for r in rows}
    # doc 0, 5, 15 carry probes (doc_id % 5 == 0); verbs cycle by doc_id % 4
    assert got == {
        ("00000000", "GET", "/api/news/0"),
        ("00000005", "POST", "/api/news/5"),
        ("00000015", "DELETE", "/api/news/15"),
    }


def test_page_kind_classification():
    rows = page_kind_rows(_pages()).to_pylist()
    kinds = {r["url"].rsplit("/", 1)[-1]: r["kind"] for r in rows}
    assert kinds == {
        "00000000": "e2e",          # probe + testid
        "00000001": "page",
        "00000003": "unit",         # testid only
        "00000005": "integration",  # probe only
        "00000015": "e2e",
    }  # 13/29 skipped -> absent


def test_link_section_sorted_dedup():
    batch = pa.table({
        "url": ["a", "b", "c"],
        "skipped": [False, False, True],
        "hrefs": pa.array([["z", "m", "z", "a"], [], ["x"]],
                          pa.list_(pa.string())),
    })
    rows = link_section_rows(batch).to_pylist()
    assert rows == [
        {"url": "a", "n_links": 3, "section": "a\nm\nz"},
        {"url": "b", "n_links": 0, "section": ""},
    ]
