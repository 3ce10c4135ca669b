"""Node enrichment stages: embedding backfill + token counts.

Mirrors the reference's post-build enrichment:
  - embed_data_bank_bodies (/root/reference/ast/src/lang/graphs/
    graph_ops.rs:424-448): bodies embedded in batches of 32 with a
    384-d model held once per worker (embedding.rs:6-22).
  - token_count property (mcp/src/graph/neo4j.ts:349-369).

The real fastembed model is not in this container: ``FakeEmbedder`` is a
deterministic stand-in (seeded hash -> unit vector) with the same chunking
(400-char chunks, embedding.rs:48-76) and weighted pooling (first chunk
x1.2, embedding.rs:23-46), so the Ray-side plumbing — actor pool, batch
size 32, list<float32,384> output — is real and tested.
"""

from __future__ import annotations

from ..util import pool_size as _pool

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EMBED_DIM = 384
CHUNK_CHARS = 400
EMBED_BATCH = 32  # reference batch size, graph_ops.rs:425


def chunk_code(text: str, chunk: int = CHUNK_CHARS) -> list[str]:
    """Line-based chunking at ~400 chars (cf. embedding.rs:48-76)."""
    if not text:
        return [""]
    lines = text.split("\n")
    out, cur = [], ""
    for ln in lines:
        if cur and len(cur) + len(ln) + 1 > chunk:
            out.append(cur)
            cur = ln
        else:
            cur = cur + "\n" + ln if cur else ln
        while len(cur) > chunk:
            out.append(cur[:chunk])
            cur = cur[chunk:]
    if cur:
        out.append(cur)
    return out or [""]


def weighted_pooling(chunks: np.ndarray) -> np.ndarray:
    """Weighted mean of chunk embeddings, first chunk x1.2, L2-normalized
    (cf. embedding.rs:23-46)."""
    w = np.ones(len(chunks))
    w[0] = 1.2
    v = (chunks * w[:, None]).sum(axis=0) / w.sum()
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


class FakeEmbedder:
    """Deterministic stand-in for the BGE-Small model: seeded-hash unit
    vectors. Swap `_embed_chunk` for a real model when available."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def _embed_chunk(self, text: str) -> np.ndarray:
        seed = zlib.crc32(text.encode("utf-8"))
        rng = np.random.RandomState(seed)
        v = rng.normal(size=self.dim)
        return v / np.linalg.norm(v)

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            chunks = np.stack([self._embed_chunk(c) for c in chunk_code(t)])
            out[i] = weighted_pooling(chunks)
        return out


def default_model_factory(dim: int = EMBED_DIM):
    """Opt-in real-model hook: try fastembed BGE-Small-EN-v1.5 (the
    reference's model, embedding.rs:6-22); fall back to the deterministic
    fake in this hermetic container. A real model object only needs an
    ``embed(texts) -> (n, dim) ndarray``-shaped method."""
    try:  # pragma: no cover - fastembed absent in this container
        from fastembed import TextEmbedding  # type: ignore

        class _Real:
            def __init__(self):
                self._m = TextEmbedding("BAAI/bge-small-en-v1.5")

            def embed(self, texts):
                import numpy as _np

                out = _np.empty((len(texts), dim), dtype=_np.float32)
                for i, t in enumerate(texts):
                    ch = _np.stack(list(self._m.embed(chunk_code(t))))
                    out[i] = weighted_pooling(ch)
                return out

        return _Real()
    except ImportError:
        return FakeEmbedder(dim)


class EmbedBodies:
    """Actor-pool stage: nodes batch -> + embedding list<float32>[384].

    Model loaded ONCE per actor (the reference's OnceCell singleton,
    embedding.rs:6-22) via ``model_factory`` — a zero-arg callable run in
    the actor's __init__, so real weights load per worker, never on the
    driver / in the task closure. Callers should pass
    batch_size=EMBED_BATCH."""

    def __init__(self, text_col: str = "body", dim: int = EMBED_DIM,
                 model_factory=None):
        self.model = (model_factory or (lambda: default_model_factory(dim)))()
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        vecs = self.model.embed(texts)
        return batch.append_column(
            "embedding", pa.array(list(vecs), pa.list_(pa.float32())))


def token_count_column(batch: pa.Table, text_col: str = "body") -> pa.Table:
    """+ token_count (whitespace tokens; cf. mcp/src/graph/neo4j.ts:349-369)."""
    text = pc.fill_null(pc.cast(batch[text_col], pa.large_string()),
                        pa.scalar("", pa.large_string()))
    n = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")), pa.int64())
    empty = pc.equal(pc.binary_length(text), 0)
    n = pc.if_else(empty, pa.scalar(0, pa.int64()), n)
    return batch.append_column("token_count", n)


def embed_nodes(nodes_ds, concurrency=None, model_factory=None):
    """The backfill pipeline: token counts (stateless) + embeddings
    (actor pool, batch 32). ``model_factory`` (optional zero-arg callable)
    injects a real model per actor; default resolves fastembed when
    available, else the deterministic fake."""
    concurrency = concurrency or _pool()
    ds = nodes_ds.map_batches(token_count_column, batch_format="pyarrow")
    return ds.map_batches(
        EmbedBodies, batch_format="pyarrow", batch_size=EMBED_BATCH,
        concurrency=concurrency,
        fn_constructor_kwargs={"model_factory": model_factory}
        if model_factory else {})
