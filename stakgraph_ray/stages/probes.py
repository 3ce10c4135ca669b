"""Test-linking extractor analogs over web pages.

The reference links *test* sources to the graph through four small
extractors; these are their web-domain analogs over the pages corpus
(file:line cites into /root/reference):

  - ``data_testid_rows``       <- ``extract_test_ids`` (ast/src/lang/linker.rs:302-314):
    per-language ``data-testid`` regex capture — here literally ``data-testid``
    attributes in page HTML.
  - ``http_probe_rows``   <- ``extract_http_verbs_from_test``
    (linker.rs:329-360): regex bank over the raw body -> (verb, route)
    mentions; here HTTP-probe annotations embedded in page comments.
  - ``page_kind_rows``    <- ``collect_tests`` / ``collect_integration_tests``
    / ``collect_e2e_tests`` (ast/src/lang/parse/collect.rs:222-253, 358-423):
    deterministic classification by which probe surfaces are present
    (both -> e2e, probes only -> integration, testids only -> unit).
  - ``link_section_rows`` <- ``combine_import_sections``
    (ast/src/builder/utils.rs:158-218): merge a document's import (here:
    link) entries into ONE synthetic section row — sorted, deduped,
    newline-joined — a pure per-document reduce inside map_batches.

All four are stateless vectorized batch fns (pyarrow re2 kernels / numpy),
gated by the same size/UTF-8 skip mask as text extraction
(functions/html.decode_valid_html), mirroring collect_all_files' filters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.html import decode_valid_html

# one vectorized extract per surface (each page carries at most one match
# per pattern by construction of the corpus)
_DIV_TID = r'(?s)<div class="main" data-testid="(?P<tid>[^"]*)"'
_NAV_TID = r'(?s)<a href="[^"]*" data-testid="(?P<tid>[^"]*)"'
_PROBE = r"(?s)<!-- probe: (?P<verb>[A-Z]+) (?P<path>\S+) -->"


def _valid_html(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
    s, skipped = decode_valid_html(batch["html"])
    url = batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    keep = pc.invert(skipped)
    return url.filter(keep), s.filter(keep)


def data_testid_rows(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, testid) rows, one per captured attribute."""
    url, s = _valid_html(batch)
    outs = []
    for pattern in (_DIV_TID, _NAV_TID):
        m = pc.extract_regex(s, pattern)
        tid = pc.struct_field(m, "tid")
        ok = pc.is_valid(tid)
        outs.append(pa.table({"url": pc.cast(url.filter(ok), pa.string()),
                              "testid": pc.cast(tid.filter(ok), pa.string())}))
    return pa.concat_tables(outs)


def http_probe_rows(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, verb, path) probe-mention rows."""
    url, s = _valid_html(batch)
    m = pc.extract_regex(s, _PROBE)
    verb = pc.struct_field(m, "verb")
    path = pc.struct_field(m, "path")
    ok = pc.is_valid(verb)
    return pa.table({"url": pc.cast(url.filter(ok), pa.string()),
                     "verb": pc.cast(verb.filter(ok), pa.string()),
                     "path": pc.cast(path.filter(ok), pa.string())})


def page_kind_rows(batch: pa.Table) -> pa.Table:
    """pages batch -> (url, kind): e2e / integration / unit / page."""
    url, s = _valid_html(batch)
    has_probe = pc.is_valid(pc.struct_field(pc.extract_regex(s, _PROBE), "verb"))
    has_tid = pc.is_valid(pc.struct_field(pc.extract_regex(s, _DIV_TID), "tid"))
    kind = pc.if_else(
        pc.and_(has_probe, has_tid), pa.scalar("e2e"),
        pc.if_else(has_probe, pa.scalar("integration"),
                   pc.if_else(has_tid, pa.scalar("unit"), pa.scalar("page"))))
    return pa.table({"url": pc.cast(url, pa.string()),
                     "kind": pc.cast(kind, pa.string())})


def link_section_rows(batch: pa.Table) -> pa.Table:
    """extract-stage batch (url, skipped, hrefs) -> one section row per
    non-skipped page: (url, n_links, section) with the page's DISTINCT
    hrefs sorted and newline-joined (gap-free reconstruction analog).

    Vectorized per-document reduce: flatten + parent indices, one lexsort,
    consecutive-duplicate mask, then an Arrow list re-wrap + binary_join —
    no per-row Python."""
    keep = pc.invert(batch["skipped"])
    t = batch.filter(keep)
    url = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"]
    hrefs = t["hrefs"].combine_chunks() if isinstance(t["hrefs"], pa.ChunkedArray) else t["hrefs"]
    n = len(url)
    flat = pc.list_flatten(hrefs)
    parent = pc.list_parent_indices(hrefs).to_numpy(zero_copy_only=False)
    vals = flat.to_numpy(zero_copy_only=False)
    order = np.lexsort((vals, parent))
    parent_s, vals_s = parent[order], vals[order]
    if len(vals_s):
        dup = np.concatenate([[False], (parent_s[1:] == parent_s[:-1])
                              & (vals_s[1:] == vals_s[:-1])])
    else:
        dup = np.zeros(0, dtype=bool)
    parent_d, vals_d = parent_s[~dup], vals_s[~dup]
    counts = np.bincount(parent_d, minlength=n)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype("int32")
    lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                   pa.array(vals_d, pa.string()))
    section = pc.binary_join(lst, "\n")
    return pa.table({"url": pc.cast(url, pa.string()),
                     "n_links": pa.array(counts, pa.int64()),
                     "section": pc.cast(section, pa.string())})


def maximal_span_rows(batch: pa.Table) -> pa.Table:
    """extract-stage batch -> maximal mention spans (url, surface, start,
    stop): unigram + adjacent-bigram spans with nested spans dropped via
    ``filter_nested_spans`` (the outermost-span rule: filter_nested_datamodels
    / no_nested, /root/reference/ast/src/lang/mod.rs:331-354,
    builder/stages.rs:244-260, 305-323). In an n>=2-token page every unigram
    is contained in an adjacent bigram, so only bigrams (and single-token
    pages' unigrams) survive — all vectorized, one keep-mask call with
    per-page span-offset isolation."""
    from ..functions.textutils import explode_tokens, filter_nested_spans

    keep = pc.and_(pc.invert(batch["skipped"]),
                   pc.not_equal(batch["text"], ""))
    t = batch.filter(keep)
    url = t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"]
    parent, flat, _pos, start, end = explode_tokens(t["text"])

    if len(flat):
        adj = parent[1:] == parent[:-1]
        a, b = flat.slice(0, len(flat) - 1), flat.slice(1)
        bi_surface = pc.binary_join_element_wise(a, b, " ").filter(pa.array(adj))
        bi_parent = parent[:-1][adj]
        bi_start = start[:-1][adj]
        bi_end = end[1:][adj]
    else:
        bi_surface = pa.array([], pa.string())
        bi_parent = bi_start = bi_end = np.empty(0, dtype="int64")

    all_parent = np.concatenate([parent, bi_parent])
    all_start = np.concatenate([start, bi_start])
    all_end = np.concatenate([end, bi_end])
    all_surface = pa.concat_arrays([pc.cast(flat, pa.string()),
                                    pc.cast(bi_surface, pa.string())])
    span_bound = int(all_end.max()) + 2 if len(all_end) else 1
    mask = filter_nested_spans(all_start + all_parent * span_bound,
                               all_end + all_parent * span_bound)
    kept_parent = all_parent[mask]
    return pa.table({
        "url": pc.cast(url.take(pa.array(kept_parent, pa.int64())), pa.string()),
        "surface": all_surface.filter(pa.array(mask)),
        "start": pa.array(all_start[mask], pa.int64()),
        "stop": pa.array(all_end[mask], pa.int64()),
    })
