"""Per-language extractor stacks: a generic pattern-bank triple extractor
plus concrete language implementations
(en / de / fr / es / it / pt / nl / sv / pl / ro).

This is the analog of the reference's per-language ``Stack`` implementations
(/root/reference/ast/src/lang/queries/{python,go,react_ts,...}.rs — each
language ships its own query bank over the shared trait,
ast/src/lang/queries/mod.rs:54-435). Each stack owns:

  - an alias dictionary (surface -> (canonical, type)) — the per-language
    type registry (small, broadcastable),
  - a compiled relation pattern bank (built once per actor/worker process,
    like the reference's tree-sitter Query cache, ast/src/lang/mod.rs:55),
  - the ordered linking cascade with per-page context
    (ast/src/lang/call_finder.rs:41-130).

Relation ATTRIBUTES are kept, not dropped: the ``year`` capture group
becomes a typed column on the triple (cf. collect_endpoints keeping
verb/path attributes, ast/src/lang/parse/format.rs:326-580), and each slot
carries its entity type (dictionary type when linked, predicate-archetype
type for unverified stubs) so the typed node table is derivable downstream.
"""

from __future__ import annotations

import re

import pyarrow as pa

_CONF = {"exact": 1.0, "alias": 0.9, "normalized": 0.8,
         "same_page_unique": 0.7, "unverified": 0.3}

# predicate -> (subject archetype, object archetype): the fallback entity
# type for unverified stubs (dictionary type wins when the surface links).
SLOT_TYPES = {
    "FOUNDED": ("Person", "Org"),
    "ACQUIRED": ("Org", "Org"),
    "WORKS_AT": ("Person", "Org"),
    "LOCATED_IN": ("Org", "Place"),
    "BORN_IN": ("Person", "Place"),
    "CEO_OF": ("Person", "Org"),
    "SUBSIDIARY_OF": ("Org", "Org"),
    "PARTNERED_WITH": ("Org", "Org"),
    "HEADQUARTERED_IN": ("Org", "Place"),
}

TRIPLES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("subj", pa.string()),
    pa.field("pred", pa.string()),
    pa.field("obj", pa.string()),
    pa.field("confidence", pa.float32()),
    pa.field("strategy", pa.string()),
    pa.field("year", pa.int32()),          # relation attribute (nullable)
    pa.field("subj_ts", pa.string()),      # "{src}:{type}", src 0=dict 1=slot
    pa.field("obj_ts", pa.string()),
])


def _norm(s: str) -> str:
    return "".join(c for c in s.lower() if c.isalnum())


class PatternTripleExtractor:
    """Batch callable: extracted pages -> linked relation triples.

    ``dictionary``: surface -> (canonical, type).
    ``templates``: list of (pattern_fmt, pred) where pattern_fmt contains
    ``{ent}`` placeholders and named groups ``s``, ``o`` and optional ``y``.
    ``fallback``: regex alternative for out-of-dictionary entity surfaces
    (single capitalized token by default).
    """

    fallback = r"[A-Z][A-Za-z0-9]*"

    def __init__(self, dictionary: dict, templates: list[tuple[str, str]],
                 extra_surfaces: list[str] = ()):
        """``extra_surfaces``: matched by the entity pattern but absent from
        the dictionary — they link as unverified stubs until the downstream
        LSH canonicalization pass merges them (synth.LSH_VARIANTS)."""
        self.dict = dictionary
        self.norm_map = {}
        for surface, (canon, typ) in dictionary.items():
            self.norm_map.setdefault(_norm(surface), (canon, typ))
        surfaces = sorted(set(dictionary) | set(extra_surfaces),
                          key=len, reverse=True)  # longest-match-first
        ent = "|".join(re.escape(s) for s in surfaces)
        ent = f"(?:{ent}|{self.fallback})"
        # ONE combined alternation: each page body is scanned once, not once
        # per relation family (9 families = 9 full scans otherwise; matches
        # are disjoint sentences, so the union of per-pattern match sets is
        # preserved). Group names are suffixed per branch; ``preds`` maps the
        # branch sentinel back to its predicate.
        self.preds = [pred for _fmt, pred in templates]
        branches = []
        for i, (fmt, _pred) in enumerate(templates):
            p = fmt.format(ent=ent)
            for g in ("s", "o", "y"):
                p = p.replace(f"(?P<{g}>", f"(?P<{g}{i}>")
            branches.append(f"(?:{p})")
        self.combined = re.compile("|".join(branches))

    def _link(self, surface: str, pred: str, slot: int,
              page_entities: list[tuple[str, str]]):
        """Ordered cascade -> (canonical, conf, strategy, type, type_src)."""
        slot_type = SLOT_TYPES.get(pred, ("Topic", "Topic"))[slot]
        hit = self.dict.get(surface)
        if hit is not None:
            canon, typ = hit
            if surface == canon:
                return canon, _CONF["exact"], "exact", typ, 0
            return canon, _CONF["alias"], "alias", typ, 0
        nhit = self.norm_map.get(_norm(surface))
        if nhit is not None:
            return nhit[0], _CONF["normalized"], "normalized", nhit[1], 0
        if " " not in surface:
            cands = {canon for canon, typ in page_entities
                     if typ == "Person" and surface in canon.split()}
            if len(cands) == 1:
                return (next(iter(cands)), _CONF["same_page_unique"],
                        "same_page_unique", "Person", 0)
        return surface, _CONF["unverified"], "unverified", slot_type, 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {f.name: [] for f in TRIPLES_SCHEMA}
        npred = len(self.preds)
        for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
            raw: list[tuple[str, str, str, int | None]] = []
            page_entities: list[tuple[str, str]] = []
            for m in self.combined.finditer(text or ""):
                gd = m.groupdict()
                for i in range(npred):
                    s = gd.get(f"s{i}")
                    if s is not None:
                        year = gd.get(f"y{i}")
                        raw.append((s, self.preds[i], gd[f"o{i}"],
                                    int(year) if year else None))
                        for surf in (s, gd[f"o{i}"]):
                            hit = self.dict.get(surf)
                            if hit is not None:
                                page_entities.append(hit)
                        break
            for s_surf, pred, o_surf, year in raw:
                s_c, s_conf, s_strat, s_typ, s_src = self._link(
                    s_surf, pred, 0, page_entities)
                o_c, o_conf, o_strat, o_typ, o_src = self._link(
                    o_surf, pred, 1, page_entities)
                cols["url"].append(url)
                cols["subj"].append(s_c)
                cols["pred"].append(pred)
                cols["obj"].append(o_c)
                cols["confidence"].append(min(s_conf, o_conf))
                cols["strategy"].append(s_strat if s_conf <= o_conf else o_strat)
                cols["year"].append(year)
                cols["subj_ts"].append(f"{s_src}:{s_typ}")
                cols["obj_ts"].append(f"{o_src}:{o_typ}")
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in TRIPLES_SCHEMA})


# ------------------------------------------------------------ en (default)

class EnglishTripleExtractor(PatternTripleExtractor):
    """The annotated-corpus English stack (synth.py vocabulary)."""

    TEMPLATES = [
        (r"(?P<s>{ent}) founded (?P<o>{ent}) in (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) acquired (?P<o>{ent}) in (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) works at (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) is located in (?P<o>{ent})\.", "LOCATED_IN"),
        (r"(?P<s>{ent}) was born in (?P<o>{ent})\.", "BORN_IN"),
        (r"(?P<s>{ent}) is the chief executive of (?P<o>{ent})\.", "CEO_OF"),
        (r"(?P<s>{ent}) is a subsidiary of (?P<o>{ent})\.", "SUBSIDIARY_OF"),
        (r"(?P<s>{ent}) partnered with (?P<o>{ent}) in (?P<y>\d{{4}})\.",
         "PARTNERED_WITH"),
        (r"(?P<s>{ent}) is headquartered in (?P<o>{ent})\.",
         "HEADQUARTERED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth import LSH_VARIANTS, entity_dictionary

        extra = sorted(LSH_VARIANTS) if dictionary is None else ()
        super().__init__(dictionary or entity_dictionary(), self.TEMPLATES,
                         extra_surfaces=extra)


# ------------------------------------------------------------ de / fr

class GermanTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÄÖÜ][A-Za-zÄÖÜäöüß0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) gründete (?P<o>{ent}) im Jahr (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) übernahm (?P<o>{ent}) im Jahr (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) arbeitet bei (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) liegt in (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_de

        super().__init__(dictionary or entity_dictionary_de(), self.TEMPLATES)


class FrenchTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÉÈÀÂ][A-Za-zÉÈÀÂéèàâêîôûç0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) a fondé (?P<o>{ent}) en (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) a acquis (?P<o>{ent}) en (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) travaille chez (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) se trouve à (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_fr

        super().__init__(dictionary or entity_dictionary_fr(), self.TEMPLATES)


class SpanishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÁÉÍÓÚÑ][A-Za-zÁÉÍÓÚÑáéíóúñü0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) fundó (?P<o>{ent}) en (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) adquirió (?P<o>{ent}) en (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) trabaja en (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) está ubicada en (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_es

        super().__init__(dictionary or entity_dictionary_es(), self.TEMPLATES)


class ItalianTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÀÈÉÌÒÙ][A-Za-zÀÈÉÌÒÙàèéìòù0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) fondò (?P<o>{ent}) nel (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) acquisì (?P<o>{ent}) nel (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) lavora presso (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) si trova a (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_it

        super().__init__(dictionary or entity_dictionary_it(), self.TEMPLATES)


class PortugueseTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÁÂÃÉÊÍÓÔÕÚÇ][A-Za-zÁÂÃÉÊÍÓÔÕÚÇáâãéêíóôõúç0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) fundou (?P<o>{ent}) em (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) adquiriu (?P<o>{ent}) em (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) trabalha na (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) fica em (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_pt

        super().__init__(dictionary or entity_dictionary_pt(), self.TEMPLATES)


class DutchTripleExtractor(PatternTripleExtractor):
    TEMPLATES = [
        (r"(?P<s>{ent}) richtte (?P<o>{ent}) op in (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) nam (?P<o>{ent}) over in (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) werkt bij (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) is gevestigd in (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_nl

        super().__init__(dictionary or entity_dictionary_nl(), self.TEMPLATES)


class SwedishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÅÄÖ][A-Za-zÅÄÖåäö0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) grundade (?P<o>{ent}) år (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) förvärvade (?P<o>{ent}) år (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) arbetar hos (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) ligger i (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_sv

        super().__init__(dictionary or entity_dictionary_sv(), self.TEMPLATES)


class PolishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZĄĆĘŁŃÓŚŹŻ][A-Za-zĄĆĘŁŃÓŚŹŻąćęłńóśźż0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) założył (?P<o>{ent}) w (?P<y>\d{{4}}) roku\.", "FOUNDED"),
        (r"(?P<s>{ent}) przejął (?P<o>{ent}) w (?P<y>\d{{4}}) roku\.", "ACQUIRED"),
        (r"(?P<s>{ent}) pracuje w (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) znajduje się w (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_pl

        super().__init__(dictionary or entity_dictionary_pl(), self.TEMPLATES)


class RomanianTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZĂÂÎȘȚ][A-Za-zĂÂÎȘȚăâîșț0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) a fondat (?P<o>{ent}) în (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) a achiziționat (?P<o>{ent}) în (?P<y>\d{{4}})\.",
         "ACQUIRED"),
        (r"(?P<s>{ent}) lucrează la (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) se află în (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_ro

        super().__init__(dictionary or entity_dictionary_ro(), self.TEMPLATES)


class DanishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÆØÅ][A-Za-zÆØÅæøå0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) grundlagde (?P<o>{ent}) i (?P<y>\d{{4}})\.", "FOUNDED"),
        (r"(?P<s>{ent}) opkøbte (?P<o>{ent}) i (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) arbejder hos (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) er beliggende i (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_da

        super().__init__(dictionary or entity_dictionary_da(), self.TEMPLATES)


class FinnishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÄÖ][A-Za-zÄÖäö0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) perusti (?P<o>{ent}) vuonna (?P<y>\d{{4}})\.",
         "FOUNDED"),
        (r"(?P<s>{ent}) osti (?P<o>{ent}) vuonna (?P<y>\d{{4}})\.", "ACQUIRED"),
        (r"(?P<s>{ent}) työskentelee yrityksessä (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) sijaitsee kaupungissa (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_fi

        super().__init__(dictionary or entity_dictionary_fi(), self.TEMPLATES)


class CzechTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÁČĎÉĚÍŇÓŘŠŤÚŮÝŽ][A-Za-záčďéěíňóřšťúůýž0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) založil (?P<o>{ent}) v roce (?P<y>\d{{4}})\.",
         "FOUNDED"),
        (r"(?P<s>{ent}) koupil (?P<o>{ent}) v roce (?P<y>\d{{4}})\.",
         "ACQUIRED"),
        (r"(?P<s>{ent}) pracuje ve firmě (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) sídlí ve městě (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_cs

        super().__init__(dictionary or entity_dictionary_cs(), self.TEMPLATES)


class HungarianTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÁÉÍÓÖŐÚÜŰ][A-Za-záéíóöőúüű0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) megalapította a (?P<o>{ent}) vállalatot "
         r"(?P<y>\d{{4}})-ben\.", "FOUNDED"),
        (r"(?P<s>{ent}) felvásárolta a (?P<o>{ent}) vállalatot "
         r"(?P<y>\d{{4}})-ben\.", "ACQUIRED"),
        (r"(?P<s>{ent}) a (?P<o>{ent}) munkatársa\.", "WORKS_AT"),
        (r"(?P<s>{ent}) a (?P<o>{ent}) városban található\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_hu

        super().__init__(dictionary or entity_dictionary_hu(), self.TEMPLATES)


class TurkishTripleExtractor(PatternTripleExtractor):
    fallback = r"[A-ZÇĞİÖŞÜ][A-Za-zçğıİöşü0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}), (?P<o>{ent}) şirketini (?P<y>\d{{4}}) yılında "
         r"kurdu\.", "FOUNDED"),
        (r"(?P<s>{ent}), (?P<o>{ent}) şirketini (?P<y>\d{{4}}) yılında "
         r"satın aldı\.", "ACQUIRED"),
        (r"(?P<s>{ent}), (?P<o>{ent}) bünyesinde çalışıyor\.", "WORKS_AT"),
        (r"(?P<s>{ent}), (?P<o>{ent}) şehrinde bulunuyor\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_tr

        super().__init__(dictionary or entity_dictionary_tr(), self.TEMPLATES)


class GreekTripleExtractor(PatternTripleExtractor):
    # Latin range kept for out-of-dictionary stubs in mixed-script pages
    fallback = r"[A-ZΑ-ΩΆΈΉΊΌΎΏ][A-Za-zΑ-Ωα-ωάέήίόύώϊϋΐΰς0-9]*"
    TEMPLATES = [
        (r"(?P<s>{ent}) ίδρυσε την (?P<o>{ent}) το (?P<y>\d{{4}})\.",
         "FOUNDED"),
        (r"(?P<s>{ent}) εξαγόρασε την (?P<o>{ent}) το (?P<y>\d{{4}})\.",
         "ACQUIRED"),
        (r"(?P<s>{ent}) εργάζεται στην (?P<o>{ent})\.", "WORKS_AT"),
        (r"(?P<s>{ent}) βρίσκεται στην (?P<o>{ent})\.", "LOCATED_IN"),
    ]

    def __init__(self, dictionary: dict | None = None):
        from ..sources.synth_ml import entity_dictionary_el

        super().__init__(dictionary or entity_dictionary_el(), self.TEMPLATES)
