"""Per-language extractor-stack registry — the user-extension surface.

Mirrors the reference's ``Stack`` trait + per-language implementations
(/root/reference/ast/src/lang/queries/mod.rs:54-435 — ~80 hook methods a
language implements; language routing ast/src/repo.rs:368-515; ``ONLY_LANG``
gating ast/src/repo.rs:382): a page's ``lang`` column selects which
extractor stack processes it. Pages whose language has no registered stack
yield no typed triples (they still flow through the token-level pipeline).

Register a stack per language:

    from stakgraph_ray.stages.registry import register_stack
    register_stack("de", MyGermanExtractorFactory)

Factories are zero-arg callables returning an extractor with the batch
``__call__(pa.Table) -> pa.Table`` contract; instances are cached per
worker process (built once, like the reference's query cache).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_FACTORIES: dict[str, object] = {}
_INSTANCES: dict[str, object] = {}

EMPTY_TRIPLES = pa.schema([
    pa.field("url", pa.string()),
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj", pa.string()),
    pa.field("confidence", pa.float32()),
    pa.field("strategy", pa.string()),
]).empty_table()


def register_stack(lang: str, factory) -> None:
    _FACTORIES[lang] = factory
    _INSTANCES.pop(lang, None)


def registered_langs() -> list[str]:
    return sorted(_FACTORIES)


def _instance(lang: str):
    inst = _INSTANCES.get(lang)
    if inst is None:
        inst = _FACTORIES[lang]()
        _INSTANCES[lang] = inst
    return inst


def route_extract(batch: pa.Table) -> pa.Table:
    """Split a pages batch by ``lang`` and run each registered stack on its
    rows; unregistered languages contribute no triples."""
    outs = []
    langs = set(pc.unique(batch["lang"]).to_pylist())
    for lang in sorted(langs):
        if lang not in _FACTORIES:
            continue
        rows = batch.filter(pc.equal(batch["lang"], lang))
        outs.append(_instance(lang)(rows))
    if not outs:
        return EMPTY_TRIPLES
    return pa.concat_tables(outs)


def _register_defaults() -> None:
    from ..pipelines.rich import RichTripleExtractor

    if "en" not in _FACTORIES:
        register_stack("en", RichTripleExtractor)


_register_defaults()
