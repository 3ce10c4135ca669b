"""Driver queries for the test-linking extractor analogs (stages/probes.py),
each with a by-construction DuckDB oracle over ``documents``.

The page corpus embeds deterministic markers (sources/pages.py:
PROBE_MOD / TESTID_MOD), so every extractor output is SQL-expressible."""

from __future__ import annotations

import pyarrow as pa

from .queries_kg import pages_cached
from ..stages.probes import (http_probe_rows, link_section_rows,
                             page_kind_rows, data_testid_rows)
from .queries_kg import NOT_SKIP_SQL, URL_SQL


def q_test_ids(sf_dir: str):
    """data-testid capture (extract_test_ids analog, linker.rs:302-314)."""
    return pages_cached(sf_dir).map_batches(data_testid_rows, batch_format="pyarrow")


SQL_TEST_IDS = f"""
select {URL_SQL} as url, 'main-' || cast(doc_id % 97 as varchar) as testid
from documents where {NOT_SKIP_SQL} and doc_id % 3 = 0
union all
select {URL_SQL} as url, 'nav-' || source as testid
from documents where {NOT_SKIP_SQL} and doc_id % 3 = 0
"""


def q_http_probes(sf_dir: str):
    """HTTP verb+route mentions from raw bodies (linker.rs:329-360)."""
    return pages_cached(sf_dir).map_batches(http_probe_rows,
                                          batch_format="pyarrow")


SQL_HTTP_PROBES = f"""
select {URL_SQL} as url,
       case doc_id % 4 when 0 then 'GET' when 1 then 'POST'
                       when 2 then 'PUT' else 'DELETE' end as verb,
       '/api/' || source || '/' || cast(doc_id % 50 as varchar) as path
from documents where {NOT_SKIP_SQL} and doc_id % 5 = 0
"""


def q_page_kinds(sf_dir: str):
    """Page classification (collect_tests family, collect.rs:222-253)."""
    return pages_cached(sf_dir).map_batches(page_kind_rows,
                                          batch_format="pyarrow")


SQL_PAGE_KINDS = f"""
select {URL_SQL} as url,
       case when doc_id % 5 = 0 and doc_id % 3 = 0 then 'e2e'
            when doc_id % 5 = 0 then 'integration'
            when doc_id % 3 = 0 then 'unit'
            else 'page' end as kind
from documents where {NOT_SKIP_SQL}
"""


def q_link_sections(sf_dir: str):
    """Per-page link-section reduce (combine_import_sections analog,
    builder/utils.rs:158-218)."""
    from .queries_kg import _extracted

    return _extracted(sf_dir).map_batches(link_section_rows,
                                          batch_format="pyarrow")


SQL_LINK_SECTIONS = f"""
select {URL_SQL} as url,
       2::bigint as n_links,
       'https://' || source || '.example.org/' || chr(10) ||
       'https://' || source || '.example.org/about/' ||
       cast(doc_id % 7 as varchar) as section
from documents where {NOT_SKIP_SQL}
"""


PROBE_QUERIES = {
    "kg_test_ids": (q_test_ids, SQL_TEST_IDS),
    "kg_http_probes": (q_http_probes, SQL_HTTP_PROBES),
    "kg_page_kinds": (q_page_kinds, SQL_PAGE_KINDS),
    "kg_link_sections": (q_link_sections, SQL_LINK_SECTIONS),
}


def q_maximal_mentions(sf_dir: str):
    """Outermost mention spans (no_nested rule over unigram+bigram spans,
    ast/src/lang/mod.rs:331-354)."""
    from ..stages.probes import maximal_span_rows
    from .queries_kg import _extracted

    return _extracted(sf_dir).map_batches(maximal_span_rows,
                                          batch_format="pyarrow")


SQL_MAXIMAL_MENTIONS = f"""
with base as (
  select doc_id, source, text from documents
  where {NOT_SKIP_SQL} and text <> ''
), tok as (
  select doc_id, source, unnest(string_split(text, ' ')) as t,
         generate_subscripts(string_split(text, ' '), 1) as pos,
         len(string_split(text, ' ')) as n
  from base
), off as (
  select doc_id, source, t, pos, n,
         cast(coalesce(sum(length(t) + 1) over (
             partition by doc_id order by pos
             rows between unbounded preceding and 1 preceding), 0) as bigint) as s
  from tok
), big as (
  select doc_id, source,
         t || ' ' || lead(t) over w as surface,
         s as start,
         lead(s) over w + length(lead(t) over w) as stop
  from off window w as (partition by doc_id order by pos)
)
select {URL_SQL} as url, surface, start, stop from big where surface is not null
union all
select {URL_SQL} as url, t as surface, s as start, s + length(t) as stop
from off where n = 1
"""

PROBE_QUERIES["kg_maximal_mentions"] = (q_maximal_mentions, SQL_MAXIMAL_MENTIONS)


def q_probe_endpoint_links(sf_dir: str):
    """Probe → Endpoint linking: the extracted HTTP-probe mentions
    (extract_http_verbs_from_test analog) joined to the endpoint table via
    the segment-match + verb-equality join — the reference's full
    test→endpoint linking flow (linker.rs:316-396). PUT/DELETE probes have
    no endpoint and drop out (unmatched path exercised)."""
    import pyarrow.parquet as pq

    from ..ops.relational import endpoint_match_join
    from ..stages.probes import http_probe_rows

    probes = pages_cached(sf_dir).map_batches(http_probe_rows,
                                            batch_format="pyarrow")
    sources = sorted(set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["source"])
        ["source"].to_pylist()))
    eps = pa.table({
        "endpoint_path": pa.array([f"/api/{s}/:id" for s in sources
                                   for _ in (0, 1)], pa.string()),
        "verb": pa.array([v for _ in sources for v in ("GET", "POST")],
                         pa.string()),
        "handler": pa.array([f"{s}_{v.lower()}" for s in sources
                             for v in ("GET", "POST")], pa.string()),
    })
    out = endpoint_match_join(probes, eps)
    return out.map_batches(
        lambda t: t.select(["url", "verb", "endpoint_path", "handler"]),
        batch_format="pyarrow")


SQL_PROBE_ENDPOINT_LINKS = f"""
with probes as (
  select {URL_SQL} as url,
         case doc_id % 4 when 0 then 'GET' when 1 then 'POST'
                         when 2 then 'PUT' else 'DELETE' end as verb,
         '/api/' || source || '/' || cast(doc_id % 50 as varchar) as path
  from documents where {NOT_SKIP_SQL} and doc_id % 5 = 0),
eps as (
  select distinct '/api/' || source || '/:id' as endpoint_path, v.verb,
         source || '_' || lower(v.verb) as handler
  from documents, (values ('GET'), ('POST')) v(verb))
select p.url, p.verb, e.endpoint_path, e.handler
from probes p join eps e
  on p.verb = e.verb
 and regexp_full_match(p.path,
                       regexp_replace(e.endpoint_path, ':[a-zA-Z_]+', '[^/]+', 'g'))
"""

PROBE_QUERIES["kg_probe_endpoint_links"] = (q_probe_endpoint_links,
                                            SQL_PROBE_ENDPOINT_LINKS)
