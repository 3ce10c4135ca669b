"""Deterministically augmented corpora for near-dup / similarity operators.

No external data: mutants are pure functions of the driver-provided tables.

- documents_with_neardups: every doc with doc_id % 10 == MUT_MOD and
  >= MIN_TOKENS tokens gets a near-duplicate twin (doc_id + ID_OFFSET, text
  with one out-of-vocabulary token appended -> token-3-gram Jaccard >= 0.89).
- embeddings_with_neardups: every vec with vec_id % 10 == VEC_MOD gets a
  twin (vec_id + ID_OFFSET) with a tiny deterministic perturbation
  (cosine >= 0.999 vs the original; background pairs stay far below 0.95).

Expected clusters/pairs are therefore derivable in SQL by construction.
"""

from __future__ import annotations

from ..util import adaptive_num_blocks as _anb

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ID_OFFSET = 1_000_000
MUT_MOD = 3
MIN_TOKENS = 10
MUT_TOKEN = "mutantxq"          # not in the 31-word vocabulary
VEC_MOD = 7
JITTER = 1e-3

MUT_COND_SQL = (f"doc_id % 10 = {MUT_MOD} "
                f"and len(string_split(text, ' ')) >= {MIN_TOKENS}")
VEC_COND_SQL = f"vec_id % 10 = {VEC_MOD}"


def mutate_documents_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> mutant rows only (doc_id+OFFSET, text + ' MUT')."""
    toks = pc.list_value_length(pc.split_pattern(batch["text"], " "))
    ids = batch["doc_id"].to_numpy()
    mask = pa.array((ids % 10 == MUT_MOD) &
                    (toks.to_numpy(zero_copy_only=False) >= MIN_TOKENS))
    m = batch.filter(mask)
    new_text = pc.binary_join_element_wise(
        pc.cast(m["text"], pa.string()), pa.scalar(" " + MUT_TOKEN), pa.scalar(""))
    return pa.table({
        "doc_id": pc.add(m["doc_id"], pa.scalar(ID_OFFSET, pa.int64())),
        "text": new_text,
    })


def documents_with_neardups(sf_dir: str):
    """(doc_id, text) Dataset: originals + deterministic near-dup mutants.

    Mutants are appended INSIDE each batch (one read, one map) — a
    ``ds.union(ds.map_batches(...))`` re-reads the corpus and doubles the
    block count with tiny mutant blocks, and at these block sizes task
    scheduling dominates the wall clock (same pathology the pages
    replicate path documents)."""
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"],
                         override_num_blocks=_anb(path))

    def augment(batch: pa.Table) -> pa.Table:
        base = pa.table({"doc_id": pc.cast(batch["doc_id"], pa.int64()),
                         "text": pc.cast(batch["text"], pa.string())})
        return pa.concat_tables([base, mutate_documents_batch(batch)])

    return ds.map_batches(augment, batch_format="pyarrow")


def jitter_embeddings_batch(batch: pa.Table) -> pa.Table:
    ids = batch["vec_id"].to_numpy()
    mask = ids % 10 == VEC_MOD
    if not mask.any():
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "embedding": pa.array([], pa.list_(pa.float32())),
                         "label": pa.array([], pa.int32())})
    m = batch.filter(pa.array(mask))
    vecs = np.array(m["embedding"].to_pylist(), dtype=np.float32)
    # deterministic per-dimension perturbation (same for every vec — tiny
    # relative to unit-scale vectors, keeps cosine ~0.9999)
    pert = (np.arange(vecs.shape[1], dtype=np.float32) % 7 - 3.0) * JITTER
    vecs = vecs + pert[None, :]
    return pa.table({
        "vec_id": pc.add(m["vec_id"], pa.scalar(ID_OFFSET, pa.int64())),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": m["label"],
    })


def embeddings_with_neardups(sf_dir: str):
    """Originals + jittered twins, appended in-batch (see
    documents_with_neardups for why not union)."""
    import ray.data as rd

    path = f"{sf_dir}/embeddings.parquet"
    ds = rd.read_parquet(path, override_num_blocks=_anb(path))

    def augment(batch: pa.Table) -> pa.Table:
        twins = jitter_embeddings_batch(batch)
        base = pa.table({
            "vec_id": pc.cast(batch["vec_id"], pa.int64()),
            "embedding": pc.cast(batch["embedding"], pa.list_(pa.float32())),
            "label": pc.cast(batch["label"], pa.int32()),
        })
        return pa.concat_tables([base, twins.cast(base.schema)])

    return ds.map_batches(augment, batch_format="pyarrow")
