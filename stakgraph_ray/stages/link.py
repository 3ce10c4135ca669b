"""Entity linking: the confidence cascade against a broadcast alias dictionary.

Re-expresses the reference's 7-strategy call-resolution cascade
(/root/reference/ast/src/lang/call_finder.rs:41-130 — ordered strategies,
early exit, per-link confidence + strategy columns kept, cf. Calls
ast/src/lang/asg.rs:237-246) as a stateful actor-pool ``map_batches`` stage:

  exact 1.0  ->  alias 0.90  ->  normalized 0.80  ->  unverified 0.30
  (unverified mentions kept as stubs, cf. btreemap_graph.rs:426-430)

The alias dictionary is the small side: resolved ONCE per actor in
``__init__`` from a ``ray.put`` object ref (broadcast — never re-shipped per
batch, never shuffled).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions import vocab
from ..functions.textutils import normalize_surface


def default_dictionary() -> dict:
    """(canonical_set, alias_map, stopwords) for the documents-derived corpus."""
    return {
        "canonical": frozenset(vocab.CANONICAL_TERMS),
        "aliases": dict(vocab.ALIASES),
        "stopwords": frozenset(vocab.STOPWORDS),
    }


def _resolve_dict(dict_ref) -> dict:
    if dict_ref is None:
        return default_dictionary()
    if isinstance(dict_ref, dict):
        return dict_ref
    import ray

    return ray.get(dict_ref)


class Cascade:
    """The vectorized cascade core, built once per actor."""

    def __init__(self, d: dict, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.canonical = d["canonical"]
        self.stopwords = d["stopwords"]
        self.alias_map = pd.Series(d["aliases"], dtype="object")
        self.norm_map = pd.Series(
            {self._norm(c): c for c in sorted(self.canonical)}, dtype="object")
        conf = dict(cfg.link_confidences)
        self.c_exact = conf["exact"]
        self.c_alias = conf["alias"]
        self.c_norm = conf["normalized"]
        self.c_unverified = conf["unverified"]

    @staticmethod
    def _norm(s: str) -> str:
        return "".join(ch for ch in s.lower() if ch.isalnum())

    def apply(self, surface: pa.Array | pa.ChunkedArray):
        """-> (canonical: object ndarray, confidence: f32 ndarray,
              strategy: object ndarray, stop_mask: bool ndarray)."""
        s = pd.Series(surface.to_pandas().values)
        n = len(s)
        stop_mask = s.isin(self.stopwords).values
        canonical = np.empty(n, dtype=object)
        confidence = np.zeros(n, dtype="float32")
        strategy = np.empty(n, dtype=object)

        exact = s.isin(self.canonical).values
        canonical[exact] = s.values[exact]
        confidence[exact] = self.c_exact
        strategy[exact] = "exact"

        resolved = exact.copy()
        rest = ~resolved
        if rest.any():
            hit = s[rest].map(self.alias_map)
            ok = hit.notna().values
            idx = np.flatnonzero(rest)[ok]
            canonical[idx] = hit.values[ok]
            confidence[idx] = self.c_alias
            strategy[idx] = "alias"
            resolved[idx] = True

        rest = ~resolved
        if rest.any():
            norm = pd.Series(normalize_surface(pa.array(s.values[rest], pa.string())).to_pylist())
            hit = norm.map(self.norm_map)
            ok = hit.notna().values
            idx = np.flatnonzero(rest)[ok]
            canonical[idx] = hit.values[ok]
            confidence[idx] = self.c_norm
            strategy[idx] = "normalized"
            resolved[idx] = True

        rest = ~resolved
        if rest.any():
            canonical[rest] = s.values[rest]
            confidence[rest] = self.c_unverified
            strategy[rest] = "unverified"
        return canonical, confidence, strategy, stop_mask


class TermLinker:
    """Actor-pool stage: mention rows -> linked mention rows.

    Input batch columns:  url, surface (+ passthrough).
    Output adds:          canonical, confidence (float32), strategy.
    Stopword mentions are dropped (predicate gate, cf. filter_attribute
    family /root/reference/ast/src/lang/queries/mod.rs:204-214).
    """

    def __init__(self, dict_ref=None, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.cascade = Cascade(_resolve_dict(dict_ref), cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        canonical, confidence, strategy, stop_mask = self.cascade.apply(batch["surface"])
        out = batch.append_column("canonical", pa.array(canonical, pa.string()))
        out = out.append_column("confidence", pa.array(confidence, pa.float32()))
        out = out.append_column("strategy", pa.array(strategy, pa.string()))
        keep = ~stop_mask
        if not self.cfg.keep_unverified:
            keep &= np.asarray(strategy != "unverified", dtype=bool)
        return out.filter(pa.array(keep))


class BigramLinker:
    """Actor-pool stage: canonicalize the ``a`` and ``b`` columns of bigram
    rows (other columns pass through). Rows where either side is a stopword
    are dropped, so FOLLOWS edges always reference existing Term nodes.

    Feed it per-batch SURFACE partials (kg.bigram_surface_partial) so the
    cascade touches distinct pairs, not every corpus token."""

    def __init__(self, dict_ref=None, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        self.cascade = Cascade(_resolve_dict(dict_ref), cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ca, _, strat_a, stop_a = self.cascade.apply(batch["a"])
        cb, _, strat_b, stop_b = self.cascade.apply(batch["b"])
        out = batch.set_column(batch.column_names.index("a"), "a",
                               pa.array(ca, pa.string()))
        out = out.set_column(out.column_names.index("b"), "b",
                             pa.array(cb, pa.string()))
        drop = stop_a | stop_b
        if not self.cfg.keep_unverified:
            # mirror TermLinker's gate: with keep_unverified=False no Term
            # node exists for unverified surfaces, so a FOLLOWS edge keeping
            # them would dangle (entity_node_rows sees TermLinker output only)
            drop |= np.asarray(strat_a == "unverified", dtype=bool)
            drop |= np.asarray(strat_b == "unverified", dtype=bool)
        return out.filter(pa.array(~drop))


def make_linker_stage(cfg: PipelineConfig = DEFAULT_CONFIG, dictionary: dict | None = None):
    """Returns (dict_ref, cfg) with the dictionary broadcast via ray.put when a
    Ray session is active (falls back to in-process dict otherwise)."""
    import ray

    d = dictionary or default_dictionary()
    ref = ray.put(d) if ray.is_initialized() else d
    return {"dict_ref": ref, "cfg": cfg}


def term_linker_fn(linker_kwargs: dict):
    """Task-pool form of TermLinker (util.make_task_stage): a plain batch fn
    with a per-worker-process Cascade cache. The linking stage is a pure
    vectorized batch transform whose only state is dictionary-scale, so an
    actor pool bought nothing and cost twice: pool startup sat on the build's
    critical path, and the pool's static CPU split (capped at 8 actors)
    left the stage at ~half the cluster while map tasks held the rest —
    measured 4-vs-16-CPU stage scaling of only 1.9x on the x64 build. As a
    task fn every CPU runs link work interleaved with the surrounding map
    stages and the broadcast dictionary still resolves once per worker
    process (cache key carries the ref + the cfg fields Cascade reads)."""
    from ..util import make_task_stage, ref_key

    cfg = linker_kwargs.get("cfg", DEFAULT_CONFIG)
    key = (ref_key(linker_kwargs.get("dict_ref")), cfg.keep_unverified,
           cfg.link_confidences)
    return make_task_stage(TermLinker, key, **linker_kwargs)


def bigram_linker_fn(linker_kwargs: dict):
    """Task-pool form of BigramLinker (util.make_task_stage): a plain batch
    fn with a per-worker-process Cascade cache. BigramLinker's input is
    per-batch surface PARTIALS (dictionary-scale, short stream), so the
    actor-pool form paid startup for little work — and inside the flagship's
    five-branch edges union its ActorPoolMapOperator pinned a CPU that, on a
    tiny cluster (num_cpus=2), livelocked the whole execution against the
    plan's four Sort exchanges. The cache key carries the broadcast ref and
    the two cfg fields the Cascade reads."""
    from ..util import make_task_stage, ref_key

    cfg = linker_kwargs.get("cfg", DEFAULT_CONFIG)
    key = (ref_key(linker_kwargs.get("dict_ref")), cfg.keep_unverified,
           cfg.link_confidences)
    return make_task_stage(BigramLinker, key, **linker_kwargs)
