"""Deterministic annotated synthetic page corpus (FIXTURES.md §2-3).

Sentence templates embed entities/relations from a closed vocabulary, so
golden triples are derivable by construction; alias variants
("IBM"/"I.B.M."/"International Business Machines") exercise the linking
cascade; an out-of-dictionary "... Corp" surface exercises LSH
canonicalization; unknown names exercise unverified stubs; surname-only
mentions exercise the same-page-unique strategy. Seeded (42) — every run
produces byte-identical pages and goldens.
"""

from __future__ import annotations

import html as html_mod
import random

import numpy as np
import pyarrow as pa

PERSONS = {
    # canonical -> aliases (the canonical itself is always a valid surface)
    "Ada Lovelace": ["Ada Lovelace"],
    "Grace Hopper": ["Grace Hopper"],
    "Alan Turing": ["Alan Turing"],
    "Edsger Dijkstra": ["Edsger Dijkstra"],
    "Barbara Liskov": ["Barbara Liskov"],
    "Donald Knuth": ["Donald Knuth"],
}
ORGS = {
    "International Business Machines": ["International Business Machines",
                                        "IBM", "I.B.M."],
    "Acme Data Systems": ["Acme Data Systems", "ACME"],
    "Globex Analytics": ["Globex Analytics", "Globex"],
    "Initech Software": ["Initech Software", "Initech"],
    "Umbrella Research": ["Umbrella Research", "Umbrella"],
    "Stark Computing": ["Stark Computing", "Stark"],
}
# out-of-dictionary surface that must merge into its canonical via LSH
LSH_VARIANTS = {
    "International Business Machines Corp": "International Business Machines",
}
PLACES = {
    "Zurich": ["Zurich"],
    "New York": ["New York"],
    "San Francisco": ["San Francisco"],
    "London": ["London"],
}

FILLERS = [
    "the quick brown fox jumps over the lazy dog.",
    "a fast river flows past the old stone mill.",
    "every batch of data moves through the stream.",
]

HOSTS = ["alpha.example.net", "beta.example.net", "hub.example.net",
         "hub.example.net", "hub.example.net"]  # hub skew: one hot host


def entity_dictionary() -> dict:
    """Alias dictionary for the rich corpus: surface -> (canonical, type)."""
    d: dict[str, tuple[str, str]] = {}
    for canon, aliases in PERSONS.items():
        for a in aliases:
            d[a] = (canon, "Person")
    for canon, aliases in ORGS.items():
        for a in aliases:
            d[a] = (canon, "Org")
    for canon, aliases in PLACES.items():
        for a in aliases:
            d[a] = (canon, "Place")
    return d


def all_surfaces() -> list[str]:
    surfaces = set(entity_dictionary()) | set(LSH_VARIANTS)
    return sorted(surfaces, key=len, reverse=True)  # longest-match-first


def generate_rich_pages(n_pages: int = 300, seed: int = 42):
    """-> (pages: pa.Table with input_hint schema, golden: dict).

    golden["triples"]: list of (subj_canonical, pred, obj_canonical) —
    post-linking, post-LSH-canonicalization expectations.
    golden["strategies"]: {strategy: count>0 expectations}.
    """
    rng = random.Random(seed)
    persons = sorted(PERSONS)
    orgs = sorted(ORGS)
    places = sorted(PLACES)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    gold_triples: set[tuple[str, str, str]] = set()
    used_strategies: set[str] = set()

    for i in range(n_pages):
        host = HOSTS[rng.randrange(len(HOSTS))]
        url = f"https://{host}/page/{i:06d}"
        sents: list[str] = []
        page_persons: list[str] = []

        if i % 25 == 24:
            # routing gate: an English-pattern sentence on a NON-English
            # page must NOT be extracted (no 'de' stack registered by
            # default, cf. language routing ast/src/repo.rs:368-515);
            # nothing from this page enters the golden set
            o = rng.choice(orgs)
            sents = [rng.choice(FILLERS),
                     f"{rng.choice(persons)} works at {rng.choice(ORGS[o])}."]
            text = " ".join(sents)
            body = html_mod.escape(text)
            html = (f"<html><head><title>Page {i}</title></head>\n"
                    f"<body><div><p>{body}</p></div>\n"
                    f"<a href=\"https://{host}/\"></a></body></html>")
            urls.append(url)
            tss.append(i)
            htmls.append(html.encode("utf-8"))
            texts.append(text)
            langs.append("de")
            continue

        for _ in range(rng.randint(3, 7)):
            kind = rng.randrange(15)
            if kind <= 1:      # FOUNDED
                p, o = rng.choice(persons), rng.choice(orgs)
                ps = rng.choice(PERSONS[p])
                os_ = rng.choice(ORGS[o])
                sents.append(f"{ps} founded {os_} in {1950 + rng.randrange(70)}.")
                gold_triples.add((p, "FOUNDED", o))
                page_persons.append(p)
                used_strategies.add("exact" if ps == p else "alias")
            elif kind <= 3:    # ACQUIRED
                o1, o2 = rng.sample(orgs, 2)
                sents.append(f"{rng.choice(ORGS[o1])} acquired {rng.choice(ORGS[o2])} "
                             f"in {1990 + rng.randrange(30)}.")
                gold_triples.add((o1, "ACQUIRED", o2))
            elif kind <= 5:    # WORKS_AT
                p, o = rng.choice(persons), rng.choice(orgs)
                sents.append(f"{rng.choice(PERSONS[p])} works at {rng.choice(ORGS[o])}.")
                gold_triples.add((p, "WORKS_AT", o))
                page_persons.append(p)
            elif kind == 6:    # LOCATED_IN
                o, pl = rng.choice(orgs), rng.choice(places)
                sents.append(f"{rng.choice(ORGS[o])} is located in {rng.choice(PLACES[pl])}.")
                gold_triples.add((o, "LOCATED_IN", pl))
            elif kind == 7 and page_persons:   # surname-only (same_page_unique)
                # unique-surname guarantee: surnames are distinct across PERSONS
                p = rng.choice(page_persons)
                surname = p.split()[-1]
                o = rng.choice(orgs)
                sents.append(f"{surname} works at {rng.choice(ORGS[o])}.")
                gold_triples.add((p, "WORKS_AT", o))
                used_strategies.add("same_page_unique")
            elif kind == 8 and i % 7 == 0:     # unknown entity -> stub
                o = rng.choice(orgs)
                sents.append(f"Zorbak{i % 5} works at {rng.choice(ORGS[o])}.")
                gold_triples.add((f"Zorbak{i % 5}", "WORKS_AT", o))
                used_strategies.add("unverified")
            elif kind == 9 and i % 11 == 0:    # LSH-canonicalized variant
                v = "International Business Machines Corp"
                pl = rng.choice(places)
                sents.append(f"{v} is located in {rng.choice(PLACES[pl])}.")
                gold_triples.add((LSH_VARIANTS[v], "LOCATED_IN", pl))
                used_strategies.add("lsh_merge")
            elif kind == 10:   # BORN_IN
                p, pl = rng.choice(persons), rng.choice(places)
                sents.append(f"{rng.choice(PERSONS[p])} was born in "
                             f"{rng.choice(PLACES[pl])}.")
                gold_triples.add((p, "BORN_IN", pl))
            elif kind == 11:   # CEO_OF
                p, o = rng.choice(persons), rng.choice(orgs)
                sents.append(f"{rng.choice(PERSONS[p])} is the chief executive "
                             f"of {rng.choice(ORGS[o])}.")
                gold_triples.add((p, "CEO_OF", o))
                page_persons.append(p)
            elif kind == 12:   # SUBSIDIARY_OF
                o1, o2 = rng.sample(orgs, 2)
                sents.append(f"{rng.choice(ORGS[o1])} is a subsidiary of "
                             f"{rng.choice(ORGS[o2])}.")
                gold_triples.add((o1, "SUBSIDIARY_OF", o2))
            elif kind == 13:   # PARTNERED_WITH (year attribute)
                o1, o2 = rng.sample(orgs, 2)
                sents.append(f"{rng.choice(ORGS[o1])} partnered with "
                             f"{rng.choice(ORGS[o2])} in {2000 + rng.randrange(25)}.")
                gold_triples.add((o1, "PARTNERED_WITH", o2))
            elif kind == 14:   # HEADQUARTERED_IN
                o, pl = rng.choice(orgs), rng.choice(places)
                sents.append(f"{rng.choice(ORGS[o])} is headquartered in "
                             f"{rng.choice(PLACES[pl])}.")
                gold_triples.add((o, "HEADQUARTERED_IN", pl))
            else:
                sents.append(rng.choice(FILLERS))

        text = " ".join(sents)
        body = html_mod.escape(text)
        html = (f"<html><head><title>Page {i}</title></head>\n"
                f"<body><!-- synthetic rich page -->\n"
                f"<div><p>{body}</p></div>\n"
                f"<a href=\"https://{host}/\"></a></body></html>")
        urls.append(url)
        tss.append(i)
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append("en")

    epoch = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array((epoch + np.array(tss, dtype="int64") * 1_000_000)
                            .astype("datetime64[us]")),
        "html": pa.array(htmls, pa.large_binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    return pages, {"triples": gold_triples, "strategies": used_strategies}
