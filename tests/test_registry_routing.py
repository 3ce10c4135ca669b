"""Per-language extractor-stack routing (§2.9 user-extension surface)."""

import pyarrow as pa
import pytest

from stakgraph_ray.stages import registry
from stakgraph_ray.stages.registry import (register_stack, registered_langs,
                                           route_extract)


@pytest.fixture(autouse=True)
def _restore_registry():
    saved = dict(registry._FACTORIES)
    yield
    registry._FACTORIES.clear()
    registry._FACTORIES.update(saved)
    registry._INSTANCES.clear()


def _page(url, text, lang):
    return {"url": url, "text": text, "lang": lang}


def test_unregistered_language_yields_no_triples():
    batch = pa.table({
        "url": ["u1", "u2"],
        "text": ["Grace Hopper works at Globex Analytics."] * 2,
        "lang": ["en", "de"],
    })
    out = route_extract(batch)
    assert set(out["url"].to_pylist()) == {"u1"}  # de row routed nowhere


def test_registering_a_stack_enables_the_language():
    class UpperStack:
        def __call__(self, t: pa.Table) -> pa.Table:
            return pa.table({
                "url": t["url"],
                "subj": pa.array(["X"] * t.num_rows),
                "pred": pa.array(["CUSTOM"] * t.num_rows),
                "obj": pa.array(["Y"] * t.num_rows),
                "confidence": pa.array([1.0] * t.num_rows, pa.float32()),
                "strategy": pa.array(["custom"] * t.num_rows),
            })

    register_stack("de", UpperStack)
    assert "de" in registered_langs()
    batch = pa.table({"url": ["u2"], "text": ["was auch immer."], "lang": ["de"]})
    out = route_extract(batch).to_pylist()
    assert out and out[0]["pred"] == "CUSTOM"


def test_rich_pipeline_skips_non_english_pages(ray_session):
    import ray.data as rd

    from stakgraph_ray.pipelines.rich import build_rich_triples
    from stakgraph_ray.sources.synth import generate_rich_pages

    pages, _ = generate_rich_pages(100)
    de_urls = {u for u, l in zip(pages["url"].to_pylist(),
                                 pages["lang"].to_pylist()) if l == "de"}
    assert de_urls  # the corpus plants routing-gate pages
    # extract on the de pages only: with just the default 'en' stack they
    # must produce nothing, despite containing an English-pattern sentence
    de_pages = pages.filter(
        pa.compute.is_in(pages["lang"], value_set=pa.array(["de"])))
    triples, _roots = build_rich_triples(rd.from_arrow(de_pages))
    assert triples.count() == 0
