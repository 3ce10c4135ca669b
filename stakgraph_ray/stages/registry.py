"""Per-language extractor-stack registry — the user-extension surface.

Mirrors the reference's ``Stack`` trait + per-language implementations
(/root/reference/ast/src/lang/queries/mod.rs:54-435 — ~80 hook methods a
language implements; language routing ast/src/repo.rs:368-515; ``ONLY_LANG``
gating ast/src/repo.rs:382): a page's ``lang`` column selects which
extractor stack processes it. Pages whose language has no registered stack
yield no typed triples (they still flow through the token-level pipeline).

Register a stack per language:

    from stakgraph_ray.stages.registry import register_stack
    register_stack("xx", MyExtractorFactory)

Factories are zero-arg callables returning an extractor with the batch
``__call__(pa.Table) -> pa.Table`` contract; instances are cached per
worker process (built once, like the reference's query cache).

IMPORTANT — Ray worker processes re-import this module and only see the
DEFAULT stacks: a driver-side ``register_stack`` call does not travel.
Pipelines must snapshot the table with ``make_router()`` (driver side) and
pass the returned batch fn to ``map_batches`` — the snapshot ships with the
function, and instances are still cached per worker process.
"""

from __future__ import annotations

import pyarrow as pa

from .stacks import TRIPLES_SCHEMA

_FACTORIES: dict[str, object] = {}
# instance cache keyed by (lang, factory): a snapshot shipped to a worker
# hits the same cache entries as the worker's own defaults
_INSTANCES: dict[tuple, object] = {}

EMPTY_TRIPLES = TRIPLES_SCHEMA.empty_table()


def register_stack(lang: str, factory) -> None:
    _FACTORIES[lang] = factory


def registered_langs() -> list[str]:
    return sorted(_FACTORIES)


def factories_snapshot() -> dict[str, object]:
    return dict(_FACTORIES)


def _instance(lang: str, factory):
    key = (lang, factory)
    inst = _INSTANCES.get(key)
    if inst is None:
        inst = factory()
        _INSTANCES[key] = inst
    return inst


def route_extract(batch: pa.Table, factories: dict | None = None) -> pa.Table:
    """Split a pages batch by ``lang`` and run each stack on its rows;
    unregistered languages contribute no triples."""
    import pyarrow.compute as pc

    facs = factories if factories is not None else _FACTORIES
    outs = []
    langs = set(pc.unique(batch["lang"]).to_pylist())
    for lang in sorted(langs):
        factory = facs.get(lang)
        if factory is None:
            continue
        rows = batch.filter(pc.equal(batch["lang"], lang))
        outs.append(_instance(lang, factory)(rows))
    if not outs:
        return EMPTY_TRIPLES
    # promote: user stacks may emit a column subset (missing cols -> null)
    outs = [EMPTY_TRIPLES] + outs
    return pa.concat_tables(outs, promote_options="permissive")


def make_router(factories: dict | None = None):
    """Driver-side: snapshot the registered stacks and return a picklable
    batch fn routing with THAT table on Ray workers (module globals do not
    travel to worker processes — without this, a user-registered stack is
    silently ignored in any real Ray run)."""
    snap = dict(factories if factories is not None else _FACTORIES)

    def route(batch: pa.Table) -> pa.Table:
        return route_extract(batch, snap)

    return route


def _register_defaults() -> None:
    from . import stacks as s

    for lang, cls in (
            ("en", s.EnglishTripleExtractor),
            ("de", s.GermanTripleExtractor),
            ("fr", s.FrenchTripleExtractor),
            ("es", s.SpanishTripleExtractor),
            ("it", s.ItalianTripleExtractor),
            ("pt", s.PortugueseTripleExtractor),
            ("nl", s.DutchTripleExtractor),
            ("sv", s.SwedishTripleExtractor),
            ("pl", s.PolishTripleExtractor),
            ("ro", s.RomanianTripleExtractor),
            ("da", s.DanishTripleExtractor),
            ("fi", s.FinnishTripleExtractor),
            ("cs", s.CzechTripleExtractor),
            ("hu", s.HungarianTripleExtractor),
            ("tr", s.TurkishTripleExtractor),
            ("el", s.GreekTripleExtractor)):
        _FACTORIES.setdefault(lang, cls)


_register_defaults()
