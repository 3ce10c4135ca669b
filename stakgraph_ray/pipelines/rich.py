"""Rich typed-entity pipeline over the annotated synthetic corpus:
dictionary+pattern mention extraction, per-page linking cascade (incl.
same-page-unique), LSH canonicalization, triple table.

This is the full analog of the reference's per-file parse→collect→link flow
(/root/reference/ast/src/lang/parse/collect.rs — typed extractors;
ast/src/lang/call_finder.rs:41-130 — ordered-strategy cascade with
confidences; graph-reads-during-extraction re-architected as per-page
context + a second canonicalization pass, cf. SURVEY.md §7.4).
"""

from __future__ import annotations

from ..util import pool_size as _pool

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..sources.synth import all_surfaces, entity_dictionary
from ..stages.extract import ExtractTextStage

_CONF = {"exact": 1.0, "alias": 0.9, "normalized": 0.8,
         "same_page_unique": 0.7, "unverified": 0.3}


def _norm(s: str) -> str:
    return "".join(c for c in s.lower() if c.isalnum())


class RichTripleExtractor:
    """Actor-pool stage: extracted pages -> linked relation triples.

    One actor holds the compiled pattern bank (built once in __init__, like
    the reference's tree-sitter Query cache, ast/src/lang/mod.rs:55) and the
    entity dictionary (broadcast small side). Per page: regex relation
    extraction, then the ordered linking cascade with page-local context
    (same_page_unique needs the page's resolved entities — the reference's
    graph-reads-during-extraction, done per-page instead of globally)."""

    def __init__(self, dict_ref=None):
        from ..ops.relational import _resolve

        d = _resolve(dict_ref) if dict_ref is not None else entity_dictionary()
        self.dict = d
        self.norm_map = {}
        for surface, (canon, typ) in d.items():
            self.norm_map.setdefault(_norm(surface), (canon, typ))
        ent = "|".join(re.escape(s) for s in all_surfaces())
        ent = f"(?:{ent}|[A-Z][A-Za-z0-9]*)"  # dict surfaces first, then
        # single-token capitalized fallback (unknown/surname mentions)
        self.patterns = [
            (re.compile(rf"(?P<s>{ent}) founded (?P<o>{ent}) in (?P<y>\d{{4}})\."),
             "FOUNDED"),
            (re.compile(rf"(?P<s>{ent}) acquired (?P<o>{ent}) in (?P<y>\d{{4}})\."),
             "ACQUIRED"),
            (re.compile(rf"(?P<s>{ent}) works at (?P<o>{ent})\."), "WORKS_AT"),
            (re.compile(rf"(?P<s>{ent}) is located in (?P<o>{ent})\."),
             "LOCATED_IN"),
        ]

    def _link(self, surface: str, page_entities: list[tuple[str, str]]):
        """The ordered cascade -> (canonical, confidence, strategy)."""
        hit = self.dict.get(surface)
        if hit is not None:
            canon, _typ = hit
            if surface == canon:
                return canon, _CONF["exact"], "exact"
            return canon, _CONF["alias"], "alias"
        nhit = self.norm_map.get(_norm(surface))
        if nhit is not None:
            return nhit[0], _CONF["normalized"], "normalized"
        if " " not in surface:
            cands = {canon for canon, typ in page_entities
                     if typ == "Person" and surface in canon.split()}
            if len(cands) == 1:
                return next(iter(cands)), _CONF["same_page_unique"], "same_page_unique"
        return surface, _CONF["unverified"], "unverified"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, subjs, preds, objs, confs, strats = [], [], [], [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            raw: list[tuple[str, str, str]] = []
            page_entities: list[tuple[str, str]] = []
            for rx, pred in self.patterns:
                for m in rx.finditer(text or ""):
                    raw.append((m.group("s"), pred, m.group("o")))
                    for surf in (m.group("s"), m.group("o")):
                        hit = self.dict.get(surf)
                        if hit is not None:
                            page_entities.append(hit)
            for s_surf, pred, o_surf in raw:
                s_c, s_conf, s_strat = self._link(s_surf, page_entities)
                o_c, o_conf, o_strat = self._link(o_surf, page_entities)
                urls.append(url)
                subjs.append(s_c)
                preds.append(pred)
                objs.append(o_c)
                confs.append(min(s_conf, o_conf))
                strats.append(s_strat if s_conf <= o_conf else o_strat)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
            "confidence": pa.array(confs, pa.float32()),
            "strategy": pa.array(strats, pa.string()),
        })


def _rich_extract_batch(batch: pa.Table) -> pa.Table:
    """Per-language routed extraction (per-worker-process stack cache,
    cf. the reference's OnceCell/DashMap query cache, ast/src/lang/mod.rs:55,
    and language routing repo.rs:368-515): only pages whose lang has a
    registered stack yield typed triples."""
    from ..stages.registry import route_extract

    return route_extract(batch)


def build_rich_triples(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                       canon_threshold: float = 0.8):
    """pages -> (distinct linked triples Dataset, lsh_roots dict)."""
    from ..ops.dedup import distinct
    from ..stages.canonicalize import canonical_roots, canonicalize_column

    extracted = pages_ds.map_batches(ExtractTextStage(cfg),
                                     batch_format="pyarrow",
                                     batch_size=cfg.batch_size)
    # Task-pool stage with a per-worker-process lazy singleton (NOT an actor
    # pool): the pattern bank costs ~1ms to build, so elastic tasks that
    # share CPUs with the upstream extract stage beat a fixed actor pool
    # that statically partitions the cluster (measured: a 30-actor pool left
    # 2 CPUs for the upstream tasks and capped scaling).
    triples = extracted.map_batches(
        _rich_extract_batch, batch_format="pyarrow", batch_size=None)
    # three consumers below (names, rewrite, final agg): pin the raw triple
    # table once (tiny relative to the corpus) instead of re-running the
    # extraction per consumer
    triples = triples.materialize()

    # second pass: LSH-merge residual surface variants (e.g. "... Corp")
    names = distinct(
        triples.map_batches(
            lambda t: pa.table({"name": pa.concat_arrays([
                t["subj"].combine_chunks() if isinstance(t["subj"], pa.ChunkedArray) else t["subj"],
                t["obj"].combine_chunks() if isinstance(t["obj"], pa.ChunkedArray) else t["obj"]])}),
            batch_format="pyarrow"), ["name"])
    roots = canonical_roots(names, cfg, min_len=8, threshold=canon_threshold)
    triples = canonicalize_column(triples, "subj", roots)
    triples = canonicalize_column(triples, "obj", roots)

    from ..ops.partition import grouped_aggregate

    partial = triples.map_batches(
        lambda t: t.group_by(["subj", "pred", "obj"])
                   .aggregate([("confidence", "max")])
                   .rename_columns(["subj", "pred", "obj", "confidence"]),
        batch_format="pyarrow")
    agg = grouped_aggregate(partial, ["subj", "pred", "obj"],
                            [("confidence", "max")], ["confidence"])
    return agg, roots


def precision_recall(got: set, want: set) -> tuple[float, float]:
    tp = len(got & want)
    p = tp / len(got) if got else 1.0
    r = tp / len(want) if want else 1.0
    return p, r
