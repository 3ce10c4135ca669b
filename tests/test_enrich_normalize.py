"""Embedding backfill, token counts, url-normalizer unit tables
(linker-style input->expected tables, cf. FIXTURES.md §4 and
/root/reference/ast/src/lang/linker.rs:508-615)."""

import numpy as np
import pyarrow as pa
import pytest

from stakgraph_ray.functions.textutils import (normalize_url,
                                               normalize_url_column,
                                               host_of_url_column)
from stakgraph_ray.stages.enrich import (EMBED_DIM, EmbedBodies, FakeEmbedder,
                                         chunk_code, token_count_column,
                                         weighted_pooling)

URL_CASES = [
    ("https://a.org/x/y", "a.org/x/y"),
    ("http://a.org/x/", "a.org/x"),
    ("//cdn.a.org/js", "cdn.a.org/js"),
    ("https://a.org/p?q=1#frag", "a.org/p"),
    ("https://a.org/u/${id}/edit", "a.org/u/:param/edit"),
    ("a.org/plain", "a.org/plain"),
    ("https://a.org/", "a.org"),
]


@pytest.mark.parametrize("raw,want", URL_CASES)
def test_normalize_url_scalar(raw, want):
    assert normalize_url(raw) == want


def test_normalize_url_vectorized_matches_scalar():
    arr = pa.array([r for r, _ in URL_CASES])
    got = normalize_url_column(arr).to_pylist()
    assert got == [w for _, w in URL_CASES]


def test_host_of_url():
    arr = pa.array(["https://x.org/a/b", "http://y.net", "//z.io/p?x"])
    assert host_of_url_column(arr).to_pylist() == ["x.org", "y.net", "z.io"]


def test_chunking_and_pooling():
    text = "\n".join(["line " + str(i) * 50 for i in range(20)])
    chunks = chunk_code(text)
    assert all(len(c) <= 400 for c in chunks)
    assert "".join(chunks).replace("\n", "") == text.replace("\n", "")
    v = weighted_pooling(np.stack([np.ones(4), -np.ones(4)]))
    # first chunk weighted 1.2: mean = (1.2 - 1)/2.2 > 0, normalized
    assert v[0] > 0 and abs(np.linalg.norm(v) - 1) < 1e-9


def test_fake_embedder_deterministic():
    m = FakeEmbedder()
    a = m.embed(["hello world", ""])
    b = m.embed(["hello world", ""])
    assert np.allclose(a, b)
    assert a.shape == (2, EMBED_DIM)
    assert abs(np.linalg.norm(a[0]) - 1) < 1e-5


def test_embed_nodes_pipeline(ray_session):
    import ray.data as rd

    nodes = rd.from_arrow(pa.table({
        "node_key": ["k1", "k2"],
        "body": ["some text body here", None],
    }))
    from stakgraph_ray.stages.enrich import embed_nodes

    out = embed_nodes(nodes).take_all()
    assert len(out) == 2
    by = {r["node_key"]: r for r in out}
    assert by["k1"]["token_count"] == 4
    assert by["k2"]["token_count"] == 0
    assert len(by["k1"]["embedding"]) == EMBED_DIM


def test_embed_nodes_model_factory_injection(ray_session):
    """The opt-in real-model hook: a custom factory runs once per actor
    (inside __init__, not on the driver) and its embed() output flows
    through the list<float32> plumbing unchanged."""
    import ray.data as rd

    from stakgraph_ray.stages.enrich import embed_nodes

    class ConstModel:
        def embed(self, texts):
            return np.full((len(texts), EMBED_DIM), 0.5, dtype=np.float32)

    nodes = rd.from_arrow(pa.table({
        "node_key": ["k1", "k2"],
        "body": ["alpha", "beta"],
    }))
    out = embed_nodes(nodes, model_factory=ConstModel).take_all()
    assert len(out) == 2
    for r in out:
        v = np.asarray(r["embedding"])
        assert v.shape == (EMBED_DIM,)
        assert np.allclose(v, 0.5)


def test_default_model_factory_falls_back_to_fake():
    from stakgraph_ray.stages.enrich import FakeEmbedder, default_model_factory

    m = default_model_factory()
    # fastembed is absent in this container -> deterministic fake
    assert isinstance(m, FakeEmbedder)
    assert m.embed(["x"]).shape == (1, EMBED_DIM)


@pytest.mark.realmodel
def test_real_embedder_smoke():
    """Opt-in (`pytest -m realmodel`): exercises the fastembed factory path
    (enrich.default_model_factory) with real BGE-Small weights where the
    package is installed; import-skipped in the hermetic container."""
    pytest.importorskip("fastembed")
    import numpy as np

    from stakgraph_ray.stages.enrich import EMBED_DIM, default_model_factory

    m = default_model_factory()
    v = m.embed(["hello world", "spark join window functions"])
    assert v.shape == (2, EMBED_DIM)
    norms = np.linalg.norm(np.asarray(v, dtype=np.float64), axis=1)
    assert np.all(norms > 0.1)
