"""P/R gate on the annotated rich corpus (BASELINE.md: triple P/R >= 0.95)."""

import pyarrow as pa
import pytest

from stakgraph_ray.pipelines.rich import (RichTripleExtractor,
                                          build_rich_triples,
                                          precision_recall)
from stakgraph_ray.sources.synth import generate_rich_pages


def test_generator_deterministic():
    p1, g1 = generate_rich_pages(50)
    p2, g2 = generate_rich_pages(50)
    assert p1.equals(p2)
    assert g1["triples"] == g2["triples"]


def test_extractor_unit():
    ex = RichTripleExtractor()
    t = pa.table({
        "url": ["u"],
        "text": ["Grace Hopper founded Acme Data Systems in 1960. "
                 "I.B.M. acquired ACME in 1999. "
                 "Hopper works at Globex Analytics. "
                 "Zorbak1 works at Initech. "
                 "the quick brown fox jumps over the lazy dog."],
    })
    rows = ex(t).to_pylist()
    got = {(r["subj"], r["pred"], r["obj"]): (r["confidence"], r["strategy"])
           for r in rows}
    assert got[("Grace Hopper", "FOUNDED", "Acme Data Systems")][1] == "exact"
    c, s = got[("International Business Machines", "ACQUIRED", "Acme Data Systems")]
    assert s == "alias" and abs(c - 0.9) < 1e-6
    c, s = got[("Grace Hopper", "WORKS_AT", "Globex Analytics")]
    assert s == "same_page_unique" and abs(c - 0.7) < 1e-6
    c, s = got[("Zorbak1", "WORKS_AT", "Initech Software")]
    assert s == "unverified" and abs(c - 0.3) < 1e-6


def test_triple_precision_recall_gate(ray_session):
    import ray.data as rd

    pages, golden = generate_rich_pages(300)
    triples_ds, roots = build_rich_triples(rd.from_arrow(pages))
    rows = triples_ds.take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    p, r = precision_recall(got, golden["triples"])
    assert p >= 0.95, f"precision {p}: extra={sorted(got - golden['triples'])[:10]}"
    assert r >= 0.95, f"recall {r}: missing={sorted(golden['triples'] - got)[:10]}"
    # the LSH variant merged into its canonical
    assert "International Business Machines Corp" in roots
    assert roots["International Business Machines Corp"] == "International Business Machines"


def test_strategies_all_exercised(ray_session):
    import ray.data as rd

    pages, golden = generate_rich_pages(300)
    triples_ds, _roots = build_rich_triples(rd.from_arrow(pages))
    # strategy column survives aggregation? confidence does; re-extract raw
    ex = RichTripleExtractor()
    import pyarrow.compute as pc

    from stakgraph_ray.stages.extract import ExtractTextStage

    t = ExtractTextStage()(pages)
    raw = ex(t)
    strategies = set(raw["strategy"].to_pylist())
    assert {"exact", "alias", "same_page_unique", "unverified"} <= strategies


def test_driver_and_distributed_tails_identical(ray_session, monkeypatch):
    """The adaptive reduce (vocab-scale driver tail vs distributed keyed
    shuffle) must emit the same triple table and the same roots."""
    import ray.data as rd

    import stakgraph_ray.pipelines.rich as rich

    pages, _ = generate_rich_pages(200)
    small_ds, small_roots = build_rich_triples(rd.from_arrow(pages))
    small = small_ds.to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)

    monkeypatch.setattr(rich, "DRIVER_TAIL_LIMIT", 0)
    big_ds, big_roots = build_rich_triples(rd.from_arrow(pages))
    big = big_ds.to_pandas().sort_values(
        ["subj", "pred", "obj"]).reset_index(drop=True)

    assert small_roots == big_roots
    assert list(small.columns) == list(big.columns)
    import pandas.testing as pdt

    pdt.assert_frame_equal(small, big[small.columns], check_dtype=False)
