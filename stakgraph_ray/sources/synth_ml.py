"""Deterministic annotated multilingual corpus (de / fr / es / it / pt /
nl / sv / pl / ro) for the per-language extractor stacks.

Mirrors the reference's per-language test fixtures
(/root/reference/ast/src/testing/{go,python,react,...} — one annotated
corpus per language, each exercised only by its own stack) on web pages:
sentence templates embed entities from per-language closed dictionaries, so
golden triples (and entity types / relation years) are derivable by
construction. Seeded — byte-identical across runs.

Cross-language exclusion is part of the fixture: every page carries one
sentence in the OTHER language's pattern shape, which must NOT be extracted
by that page's stack (cf. ONLY_LANG routing, ast/src/repo.rs:368-515).
"""

from __future__ import annotations

import html as html_mod
import random

import numpy as np
import pyarrow as pa

PERSONS_DE = {
    "Johann Müller": ["Johann Müller", "J. Müller"],
    "Greta Weiß": ["Greta Weiß"],
    "Karl Bauer": ["Karl Bauer"],
}
ORGS_DE = {
    "Beispiel Datenwerk": ["Beispiel Datenwerk", "BDW"],
    "Nordlicht Software": ["Nordlicht Software", "Nordlicht"],
    "Süddata Analytik": ["Süddata Analytik", "Süddata"],
}
PLACES_DE = {"München": ["München"], "Zürich": ["Zürich"], "Köln": ["Köln"]}

PERSONS_FR = {
    "Marie Dubois": ["Marie Dubois"],
    "Jean Moreau": ["Jean Moreau"],
    "Élise Laurent": ["Élise Laurent"],
}
ORGS_FR = {
    "Lumière Logiciels": ["Lumière Logiciels", "Lumière"],
    "Exemple Données": ["Exemple Données"],
    "Réseau Azur": ["Réseau Azur", "Azur"],
}
PLACES_FR = {"Paris": ["Paris"], "Lyon": ["Lyon"], "Marseille": ["Marseille"]}

PERSONS_ES = {
    "Lucía García": ["Lucía García", "L. García"],
    "Diego Fernández": ["Diego Fernández"],
    "Carmen Ruiz": ["Carmen Ruiz"],
}
ORGS_ES = {
    "Datos Ejemplo": ["Datos Ejemplo"],
    "Software Meridiano": ["Software Meridiano", "Meridiano"],
    "Análisis Austral": ["Análisis Austral", "Austral"],
}
PLACES_ES = {"Madrid": ["Madrid"], "Sevilla": ["Sevilla"],
             "Valencia": ["Valencia"]}

PERSONS_IT = {
    "Giulia Rossi": ["Giulia Rossi", "G. Rossi"],
    "Marco Bianchi": ["Marco Bianchi"],
    "Elena Conti": ["Elena Conti"],
}
ORGS_IT = {
    "Dati Esempio": ["Dati Esempio"],
    "Software Tramonto": ["Software Tramonto", "Tramonto"],
    "Analisi Adriatica": ["Analisi Adriatica", "Adriatica"],
}
PLACES_IT = {"Roma": ["Roma"], "Milano": ["Milano"], "Torino": ["Torino"]}

PERSONS_PT = {
    "Ana Silva": ["Ana Silva", "A. Silva"],
    "Pedro Santos": ["Pedro Santos"],
    "Beatriz Costa": ["Beatriz Costa"],
}
ORGS_PT = {
    "Dados Exemplo": ["Dados Exemplo"],
    "Software Horizonte": ["Software Horizonte", "Horizonte"],
    "Análise Atlântica": ["Análise Atlântica", "Atlântica"],
}
PLACES_PT = {"Lisboa": ["Lisboa"], "Porto": ["Porto"], "Coimbra": ["Coimbra"]}

PERSONS_NL = {
    "Daan de Vries": ["Daan de Vries", "D. de Vries"],
    "Sanne Bakker": ["Sanne Bakker"],
    "Ruben Visser": ["Ruben Visser"],
}
ORGS_NL = {
    "Voorbeeld Gegevens": ["Voorbeeld Gegevens"],
    "Molenwerk Software": ["Molenwerk Software", "Molenwerk"],
    "Analyse Noordzee": ["Analyse Noordzee", "Noordzee"],
}
PLACES_NL = {"Amsterdam": ["Amsterdam"], "Utrecht": ["Utrecht"],
             "Rotterdam": ["Rotterdam"]}

PERSONS_SV = {
    "Erik Lindqvist": ["Erik Lindqvist", "E. Lindqvist"],
    "Astrid Nilsson": ["Astrid Nilsson"],
    "Oskar Berg": ["Oskar Berg"],
}
ORGS_SV = {
    "Exempel Data": ["Exempel Data"],
    "Norrsken Programvara": ["Norrsken Programvara", "Norrsken"],
    "Analys Polstjärna": ["Analys Polstjärna", "Polstjärna"],
}
PLACES_SV = {"Stockholm": ["Stockholm"], "Göteborg": ["Göteborg"],
             "Uppsala": ["Uppsala"]}

PERSONS_PL = {
    "Jan Kowalski": ["Jan Kowalski", "J. Kowalski"],
    "Anna Nowak": ["Anna Nowak"],
    "Piotr Wiśniewski": ["Piotr Wiśniewski"],
}
ORGS_PL = {
    "Dane Przykład": ["Dane Przykład"],
    "Oprogramowanie Wisła": ["Oprogramowanie Wisła", "Wisła"],
    "Analiza Bałtyk": ["Analiza Bałtyk", "Bałtyk"],
}
PLACES_PL = {"Warszawa": ["Warszawa"], "Kraków": ["Kraków"],
             "Gdańsk": ["Gdańsk"]}

PERSONS_RO = {
    "Andrei Popescu": ["Andrei Popescu", "A. Popescu"],
    "Ioana Ionescu": ["Ioana Ionescu"],
    "Mihai Dumitrescu": ["Mihai Dumitrescu"],
}
ORGS_RO = {
    "Date Exemplu": ["Date Exemplu"],
    "Software Carpați": ["Software Carpați", "Carpați"],
    "Analiză Dunărea": ["Analiză Dunărea", "Dunărea"],
}
PLACES_RO = {"București": ["București"], "Cluj": ["Cluj"],
             "Timișoara": ["Timișoara"]}

PERSONS_DA = {
    "Mette Jensen": ["Mette Jensen", "M. Jensen"],
    "Lars Holm": ["Lars Holm"],
    "Freja Dahl": ["Freja Dahl"],
}
ORGS_DA = {
    "Eksempel Data": ["Eksempel Data"],
    "Havvind Software": ["Havvind Software", "Havvind"],
    "Analyse Kattegat": ["Analyse Kattegat", "Kattegat"],
}
PLACES_DA = {"København": ["København"], "Aarhus": ["Aarhus"],
             "Odense": ["Odense"]}

PERSONS_FI = {
    "Aino Virtanen": ["Aino Virtanen", "A. Virtanen"],
    "Eero Korhonen": ["Eero Korhonen"],
    "Helmi Nieminen": ["Helmi Nieminen"],
}
ORGS_FI = {
    "Esimerkki Data": ["Esimerkki Data"],
    "Revontuli Ohjelmistot": ["Revontuli Ohjelmistot", "Revontuli"],
    "Analyysi Saimaa": ["Analyysi Saimaa", "Saimaa"],
}
PLACES_FI = {"Helsinki": ["Helsinki"], "Tampere": ["Tampere"],
             "Turku": ["Turku"]}

PERSONS_CS = {
    "Jana Svobodová": ["Jana Svobodová", "J. Svobodová"],
    "Petr Dvořák": ["Petr Dvořák"],
    "Eva Černá": ["Eva Černá"],
}
ORGS_CS = {
    "Data Ukázka": ["Data Ukázka"],
    "Software Vltava": ["Software Vltava", "Vltava"],
    "Analýza Morava": ["Analýza Morava", "Morava"],
}
PLACES_CS = {"Praha": ["Praha"], "Brno": ["Brno"], "Ostrava": ["Ostrava"]}

PERSONS_HU = {
    "Kovács Bence": ["Kovács Bence", "K. Bence"],
    "Nagy Réka": ["Nagy Réka"],
    "Szabó Dániel": ["Szabó Dániel"],
}
ORGS_HU = {
    "Példa Adat": ["Példa Adat"],
    "Délibáb Szoftver": ["Délibáb Szoftver", "Délibáb"],
    "Elemzés Balaton": ["Elemzés Balaton", "Balaton"],
}
PLACES_HU = {"Budapest": ["Budapest"], "Debrecen": ["Debrecen"],
             "Szeged": ["Szeged"]}

PERSONS_TR = {
    "Ayşe Yılmaz": ["Ayşe Yılmaz", "A. Yılmaz"],
    "Mehmet Demir": ["Mehmet Demir"],
    "Zeynep Kaya": ["Zeynep Kaya"],
}
ORGS_TR = {
    "Örnek Veri": ["Örnek Veri"],
    "Anadolu Yazılım": ["Anadolu Yazılım", "Anadolu"],
    "Analiz Boğaziçi": ["Analiz Boğaziçi", "Boğaziçi"],
}
PLACES_TR = {"İstanbul": ["İstanbul"], "Ankara": ["Ankara"],
             "İzmir": ["İzmir"]}

PERSONS_EL = {
    "Μαρία Παπαδοπούλου": ["Μαρία Παπαδοπούλου", "Μ. Παπαδοπούλου"],
    "Γιώργος Νικολάου": ["Γιώργος Νικολάου"],
    "Ελένη Βασιλείου": ["Ελένη Βασιλείου"],
}
ORGS_EL = {
    "Παράδειγμα Δεδομένα": ["Παράδειγμα Δεδομένα"],
    "Λογισμικό Αιγαίο": ["Λογισμικό Αιγαίο", "Αιγαίο"],
    "Ανάλυση Όλυμπος": ["Ανάλυση Όλυμπος", "Όλυμπος"],
}
PLACES_EL = {"Αθήνα": ["Αθήνα"], "Θεσσαλονίκη": ["Θεσσαλονίκη"],
             "Πάτρα": ["Πάτρα"]}

FILLERS = {
    "de": ["der schnelle braune fuchs springt über den faulen hund.",
           "jeder datenstrom fließt durch die leitung."],
    "fr": ["le renard brun rapide saute par-dessus le chien paresseux.",
           "chaque flux de données passe par le canal."],
    "es": ["el rápido zorro marrón salta sobre el perro perezoso.",
           "cada flujo de datos pasa por el canal."],
    "it": ["la rapida volpe marrone salta sopra il cane pigro.",
           "ogni flusso di dati passa per il canale."],
    "pt": ["a rápida raposa marrom salta sobre o cão preguiçoso.",
           "cada fluxo de dados passa pelo canal."],
    "nl": ["de snelle bruine vos springt over de luie hond.",
           "elke datastroom loopt door het kanaal."],
    "sv": ["den snabba bruna räven hoppar över den lata hunden.",
           "varje dataström flödar genom kanalen."],
    "pl": ["szybki brązowy lis przeskakuje nad leniwym psem.",
           "każdy strumień danych przepływa przez kanał."],
    "ro": ["vulpea maro rapidă sare peste câinele leneș.",
           "fiecare flux de date trece prin canal."],
    "da": ["den hurtige brune ræv springer over den dovne hund.",
           "hver datastrøm løber gennem kanalen."],
    "fi": ["nopea ruskea kettu hyppää laiskan koiran yli.",
           "jokainen datavirta kulkee kanavan läpi."],
    "cs": ["rychlá hnědá liška skáče přes líného psa.",
           "každý datový tok proudí kanálem."],
    "hu": ["a gyors barna róka átugrik a lusta kutya felett.",
           "minden adatfolyam a csatornán halad át."],
    "tr": ["hızlı kahverengi tilki tembel köpeğin üzerinden atlar.",
           "her veri akışı kanaldan geçer."],
    "el": ["η γρήγορη καφέ αλεπού πηδά πάνω από τον τεμπέλη σκύλο.",
           "κάθε ροή δεδομένων περνά από το κανάλι."],
}
# ANOTHER language's pattern shape — must not be extracted by this stack
CROSS = {
    "de": "Marie Dubois travaille chez Exemple Données.",
    "fr": "Johann Müller arbeitet bei Nordlicht Software.",
    "es": "Greta Weiß arbeitet bei Süddata Analytik.",
    "it": "Ana Silva trabalha na Dados Exemplo.",
    "pt": "Giulia Rossi lavora presso Dati Esempio.",
    "nl": "Erik Lindqvist arbetar hos Exempel Data.",
    "sv": "Jan Kowalski pracuje w Dane Przykład.",
    "pl": "Andrei Popescu lucrează la Date Exemplu.",
    "ro": "Daan de Vries werkt bij Voorbeeld Gegevens.",
    "da": "Aino Virtanen työskentelee yrityksessä Esimerkki Data.",
    "fi": "Jana Svobodová pracuje ve firmě Data Ukázka.",
    "cs": "Kovács Bence a Példa Adat munkatársa.",
    "hu": "Ayşe Yılmaz, Örnek Veri bünyesinde çalışıyor.",
    "tr": "Μαρία Παπαδοπούλου εργάζεται στην Παράδειγμα Δεδομένα.",
    "el": "Mette Jensen arbejder hos Eksempel Data.",
}

TEMPLATES = {
    "de": {
        "FOUNDED": "{s} gründete {o} im Jahr {y}.",
        "ACQUIRED": "{s} übernahm {o} im Jahr {y}.",
        "WORKS_AT": "{s} arbeitet bei {o}.",
        "LOCATED_IN": "{s} liegt in {o}.",
    },
    "fr": {
        "FOUNDED": "{s} a fondé {o} en {y}.",
        "ACQUIRED": "{s} a acquis {o} en {y}.",
        "WORKS_AT": "{s} travaille chez {o}.",
        "LOCATED_IN": "{s} se trouve à {o}.",
    },
    "es": {
        "FOUNDED": "{s} fundó {o} en {y}.",
        "ACQUIRED": "{s} adquirió {o} en {y}.",
        "WORKS_AT": "{s} trabaja en {o}.",
        "LOCATED_IN": "{s} está ubicada en {o}.",
    },
    "it": {
        "FOUNDED": "{s} fondò {o} nel {y}.",
        "ACQUIRED": "{s} acquisì {o} nel {y}.",
        "WORKS_AT": "{s} lavora presso {o}.",
        "LOCATED_IN": "{s} si trova a {o}.",
    },
    "pt": {
        "FOUNDED": "{s} fundou {o} em {y}.",
        "ACQUIRED": "{s} adquiriu {o} em {y}.",
        "WORKS_AT": "{s} trabalha na {o}.",
        "LOCATED_IN": "{s} fica em {o}.",
    },
    "nl": {
        "FOUNDED": "{s} richtte {o} op in {y}.",
        "ACQUIRED": "{s} nam {o} over in {y}.",
        "WORKS_AT": "{s} werkt bij {o}.",
        "LOCATED_IN": "{s} is gevestigd in {o}.",
    },
    "sv": {
        "FOUNDED": "{s} grundade {o} år {y}.",
        "ACQUIRED": "{s} förvärvade {o} år {y}.",
        "WORKS_AT": "{s} arbetar hos {o}.",
        "LOCATED_IN": "{s} ligger i {o}.",
    },
    "pl": {
        "FOUNDED": "{s} założył {o} w {y} roku.",
        "ACQUIRED": "{s} przejął {o} w {y} roku.",
        "WORKS_AT": "{s} pracuje w {o}.",
        "LOCATED_IN": "{s} znajduje się w {o}.",
    },
    "ro": {
        "FOUNDED": "{s} a fondat {o} în {y}.",
        "ACQUIRED": "{s} a achiziționat {o} în {y}.",
        "WORKS_AT": "{s} lucrează la {o}.",
        "LOCATED_IN": "{s} se află în {o}.",
    },
    "da": {
        "FOUNDED": "{s} grundlagde {o} i {y}.",
        "ACQUIRED": "{s} opkøbte {o} i {y}.",
        "WORKS_AT": "{s} arbejder hos {o}.",
        "LOCATED_IN": "{s} er beliggende i {o}.",
    },
    "fi": {
        "FOUNDED": "{s} perusti {o} vuonna {y}.",
        "ACQUIRED": "{s} osti {o} vuonna {y}.",
        "WORKS_AT": "{s} työskentelee yrityksessä {o}.",
        "LOCATED_IN": "{s} sijaitsee kaupungissa {o}.",
    },
    "cs": {
        "FOUNDED": "{s} založil {o} v roce {y}.",
        "ACQUIRED": "{s} koupil {o} v roce {y}.",
        "WORKS_AT": "{s} pracuje ve firmě {o}.",
        "LOCATED_IN": "{s} sídlí ve městě {o}.",
    },
    "hu": {
        "FOUNDED": "{s} megalapította a {o} vállalatot {y}-ben.",
        "ACQUIRED": "{s} felvásárolta a {o} vállalatot {y}-ben.",
        "WORKS_AT": "{s} a {o} munkatársa.",
        "LOCATED_IN": "{s} a {o} városban található.",
    },
    "tr": {
        "FOUNDED": "{s}, {o} şirketini {y} yılında kurdu.",
        "ACQUIRED": "{s}, {o} şirketini {y} yılında satın aldı.",
        "WORKS_AT": "{s}, {o} bünyesinde çalışıyor.",
        "LOCATED_IN": "{s}, {o} şehrinde bulunuyor.",
    },
    "el": {
        "FOUNDED": "{s} ίδρυσε την {o} το {y}.",
        "ACQUIRED": "{s} εξαγόρασε την {o} το {y}.",
        "WORKS_AT": "{s} εργάζεται στην {o}.",
        "LOCATED_IN": "{s} βρίσκεται στην {o}.",
    },
}


def _dict_of(persons, orgs, places) -> dict:
    d: dict[str, tuple[str, str]] = {}
    for canon, aliases in persons.items():
        for a in aliases:
            d[a] = (canon, "Person")
    for canon, aliases in orgs.items():
        for a in aliases:
            d[a] = (canon, "Org")
    for canon, aliases in places.items():
        for a in aliases:
            d[a] = (canon, "Place")
    return d


def entity_dictionary_de() -> dict:
    return _dict_of(PERSONS_DE, ORGS_DE, PLACES_DE)


def entity_dictionary_fr() -> dict:
    return _dict_of(PERSONS_FR, ORGS_FR, PLACES_FR)


def entity_dictionary_es() -> dict:
    return _dict_of(PERSONS_ES, ORGS_ES, PLACES_ES)


def entity_dictionary_it() -> dict:
    return _dict_of(PERSONS_IT, ORGS_IT, PLACES_IT)


def entity_dictionary_pt() -> dict:
    return _dict_of(PERSONS_PT, ORGS_PT, PLACES_PT)


def entity_dictionary_nl() -> dict:
    return _dict_of(PERSONS_NL, ORGS_NL, PLACES_NL)


def entity_dictionary_sv() -> dict:
    return _dict_of(PERSONS_SV, ORGS_SV, PLACES_SV)


def entity_dictionary_pl() -> dict:
    return _dict_of(PERSONS_PL, ORGS_PL, PLACES_PL)


def entity_dictionary_ro() -> dict:
    return _dict_of(PERSONS_RO, ORGS_RO, PLACES_RO)


def entity_dictionary_da() -> dict:
    return _dict_of(PERSONS_DA, ORGS_DA, PLACES_DA)


def entity_dictionary_fi() -> dict:
    return _dict_of(PERSONS_FI, ORGS_FI, PLACES_FI)


def entity_dictionary_cs() -> dict:
    return _dict_of(PERSONS_CS, ORGS_CS, PLACES_CS)


def entity_dictionary_hu() -> dict:
    return _dict_of(PERSONS_HU, ORGS_HU, PLACES_HU)


def entity_dictionary_tr() -> dict:
    return _dict_of(PERSONS_TR, ORGS_TR, PLACES_TR)


def entity_dictionary_el() -> dict:
    return _dict_of(PERSONS_EL, ORGS_EL, PLACES_EL)


_VOCAB = {"de": (PERSONS_DE, ORGS_DE, PLACES_DE),
          "fr": (PERSONS_FR, ORGS_FR, PLACES_FR),
          "es": (PERSONS_ES, ORGS_ES, PLACES_ES),
          "it": (PERSONS_IT, ORGS_IT, PLACES_IT),
          "pt": (PERSONS_PT, ORGS_PT, PLACES_PT),
          "nl": (PERSONS_NL, ORGS_NL, PLACES_NL),
          "sv": (PERSONS_SV, ORGS_SV, PLACES_SV),
          "pl": (PERSONS_PL, ORGS_PL, PLACES_PL),
          "ro": (PERSONS_RO, ORGS_RO, PLACES_RO),
          "da": (PERSONS_DA, ORGS_DA, PLACES_DA),
          "fi": (PERSONS_FI, ORGS_FI, PLACES_FI),
          "cs": (PERSONS_CS, ORGS_CS, PLACES_CS),
          "hu": (PERSONS_HU, ORGS_HU, PLACES_HU),
          "tr": (PERSONS_TR, ORGS_TR, PLACES_TR),
          "el": (PERSONS_EL, ORGS_EL, PLACES_EL)}
LANG_CYCLE = tuple(_VOCAB)


def generate_multilingual_pages(n_pages: int = 200, seed: int = 7):
    """-> (pages table with the input_hint schema, golden dict).

    golden["triples"]: {(subj, pred, obj)}; golden["years"]: {(s,p,o): min
    year or None}; golden["types"]: {canonical: type} — all per-language
    expectations combined (languages never share entities)."""
    rng = random.Random(seed)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    gold: set[tuple[str, str, str]] = set()
    years: dict[tuple[str, str, str], int | None] = {}
    types: dict[str, str] = {}

    def note(s, p, o, y, s_typ, o_typ):
        gold.add((s, p, o))
        if y is None:
            years.setdefault((s, p, o), None)
        else:
            prev = years.get((s, p, o))
            years[(s, p, o)] = y if prev is None else min(prev, y)
        types.setdefault(s, s_typ)
        types.setdefault(o, o_typ)

    for i in range(n_pages):
        lang = LANG_CYCLE[i % len(LANG_CYCLE)]
        persons, orgs, places = _VOCAB[lang]
        pl_sorted = sorted(persons), sorted(orgs), sorted(places)
        tpl = TEMPLATES[lang]
        host = f"{lang}.example.net"
        url = f"https://{host}/seite/{i:06d}"
        sents = [rng.choice(FILLERS[lang])]
        for _ in range(rng.randint(2, 5)):
            kind = rng.randrange(8)
            if kind <= 1:      # FOUNDED
                p = rng.choice(pl_sorted[0])
                o = rng.choice(pl_sorted[1])
                y = 1950 + rng.randrange(70)
                sents.append(tpl["FOUNDED"].format(
                    s=rng.choice(persons[p]), o=rng.choice(orgs[o]), y=y))
                note(p, "FOUNDED", o, y, "Person", "Org")
            elif kind <= 3:    # ACQUIRED
                o1, o2 = rng.sample(pl_sorted[1], 2)
                y = 1990 + rng.randrange(30)
                sents.append(tpl["ACQUIRED"].format(
                    s=rng.choice(orgs[o1]), o=rng.choice(orgs[o2]), y=y))
                note(o1, "ACQUIRED", o2, y, "Org", "Org")
            elif kind <= 5:    # WORKS_AT
                p = rng.choice(pl_sorted[0])
                o = rng.choice(pl_sorted[1])
                sents.append(tpl["WORKS_AT"].format(
                    s=rng.choice(persons[p]), o=rng.choice(orgs[o])))
                note(p, "WORKS_AT", o, None, "Person", "Org")
            elif kind == 6:    # LOCATED_IN
                o = rng.choice(pl_sorted[1])
                pl = rng.choice(pl_sorted[2])
                sents.append(tpl["LOCATED_IN"].format(
                    s=rng.choice(orgs[o]), o=rng.choice(places[pl])))
                note(o, "LOCATED_IN", pl, None, "Org", "Place")
            else:              # unverified stub (unknown entity)
                o = rng.choice(pl_sorted[1])
                stub = f"Zorbix{i % 4}"
                sents.append(tpl["WORKS_AT"].format(
                    s=stub, o=rng.choice(orgs[o])))
                note(stub, "WORKS_AT", o, None, "Person", "Org")
        sents.append(CROSS[lang])  # cross-language exclusion probe

        text = " ".join(sents)
        body = html_mod.escape(text)
        html = (f"<html><head><title>Seite {i}</title></head>\n"
                f"<body><div><p>{body}</p></div>\n"
                f"<a href=\"https://{host}/\"></a></body></html>")
        urls.append(url)
        tss.append(i)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)

    epoch = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array((epoch + np.array(tss, dtype="int64") * 1_000_000)
                            .astype("datetime64[us]")),
        "html": pa.array(htmls, pa.large_binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    return pages, {"triples": gold, "years": years, "types": types}
