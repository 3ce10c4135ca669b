"""Extraction stages: html→text, link extraction, mention extraction.

All stages are stateless vectorized ``map_batches`` callables over Arrow
batches (the reference's per-file collect_* extractors,
/root/reference/ast/src/lang/parse/collect.rs, re-expressed batch-wise).
No Python per-row loops in any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.html import (clean_html_text, decode_valid_html,
                              extract_title_column, sha256_column)
from ..functions.textutils import explode_tokens, host_of_url_column

_LS = pa.large_string()


def extract_hrefs_column(html_s: pa.Array) -> pa.Array:
    """All ``href="..."`` values per page as a list<string> column.

    Vectorized: split on ``href="``, drop each row's first fragment, trim each
    kept fragment at its first quote. (cf. import-edge collection,
    /root/reference/ast/src/lang/parse/collect.rs:424-581)
    """
    parts = pc.split_pattern(html_s, 'href="')
    flat = pc.list_flatten(parts)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype("int64")
    total = int(counts.sum())
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(counts) else np.empty(0, dtype="int64")
    pos = np.arange(total, dtype="int64") - np.repeat(starts, counts)
    keep = pos > 0
    hrefs = pc.replace_substring_regex(flat.filter(pa.array(keep)), r'(?s)".*$', "")
    new_counts = np.maximum(counts - 1, 0)
    offsets = np.concatenate(([0], np.cumsum(new_counts)))
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pc.cast(hrefs, pa.string()))


class ExtractTextStage:
    """pages batch -> (url, warc_ts, lang, text, text_sha256, skipped, hrefs).

    Drops the heavy ``html`` column immediately after extraction so only
    extracted text flows through the rest of the pipeline.
    """

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG, with_hash: bool = True):
        self.cfg = cfg
        self.with_hash = with_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Corrupt-input guards (Common-Crawl reality — the build must not
        # crash on a bad WARC record): a row with a null url has no
        # identity and is dropped here, at the single entry point both
        # build variants share (a null string key would crash Ray's
        # sort-exchange partition search: None < str). Null lang / warc_ts
        # are FILLED ("und" / epoch) so keyed sorts and the first-wins
        # dedup never compare None; null html is a deterministic skip
        # (decode_valid_html).
        if batch["url"].null_count:
            batch = batch.filter(pc.is_valid(batch["url"]))
        html_s, skipped = decode_valid_html(batch["html"], self.cfg)
        text = clean_html_text(html_s)
        cols = {
            "url": batch["url"],
            "warc_ts": pc.fill_null(
                pc.cast(batch["warc_ts"], pa.timestamp("us")),
                pa.scalar(0, pa.timestamp("us"))),
            "lang": pc.fill_null(pc.cast(batch["lang"], pa.string()), "und"),
            "text": pc.cast(text, pa.string()),
            "title": extract_title_column(html_s),  # docs analog (null if skipped)
            "skipped": skipped,
            "hrefs": extract_hrefs_column(html_s),
        }
        if self.with_hash:
            cols["text_sha256"] = sha256_column(text)
        if "doc_id" in batch.column_names:
            cols["doc_id"] = batch["doc_id"]
        return pa.table(cols)


def mention_rows(batch: pa.Table) -> pa.Table:
    """Extracted-text batch -> one row per token mention.

    Output: (url, lang, surface, pos, start, end). Empty-text (skipped) pages
    produce no mentions. (cf. collect_calls_in_function emitting unlinked
    mentions, /root/reference/ast/src/lang/parse/collect.rs:254-290)
    """
    parent, flat, pos, start, end = explode_tokens(
        pc.cast(batch["text"], _LS))
    url = pc.take(batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
                  pa.array(parent))
    lang = pc.take(batch["lang"].combine_chunks() if isinstance(batch["lang"], pa.ChunkedArray) else batch["lang"],
                   pa.array(parent))
    tbl = pa.table({
        "url": pc.cast(url, pa.string()),
        "lang": pc.cast(lang, pa.string()),
        "surface": pc.cast(flat, pa.string()),
        "pos": pa.array(pos),
        "start": pa.array(start),
        "end": pa.array(end),
    })
    return tbl.filter(pc.greater(pc.binary_length(tbl["surface"]), 0))


def bigram_rows(batch: pa.Table) -> pa.Table:
    """Extracted-text batch -> adjacent-token relation mentions.

    Output: (url, a, b, pos) where b directly follows a in the same page —
    the corpus's relation-mention extractor (FOLLOWED_BY candidate triples).
    """
    parent, flat, pos, _start, _end = explode_tokens(pc.cast(batch["text"], _LS))
    if len(flat) == 0:
        return pa.table({"url": pa.array([], pa.string()),
                         "a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "pos": pa.array([], pa.int64())})
    same = parent[:-1] == parent[1:]
    keep = pa.array(same)
    a = flat.slice(0, len(flat) - 1).filter(keep)
    b = flat.slice(1).filter(keep)
    urls = batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    url = pc.take(urls, pa.array(parent[:-1][same]))
    tbl = pa.table({
        "url": pc.cast(url, pa.string()),
        "a": pc.cast(a, pa.string()),
        "b": pc.cast(b, pa.string()),
        "pos": pa.array(pos[:-1][same]),
    })
    mask = pc.and_(pc.greater(pc.binary_length(tbl["a"]), 0),
                   pc.greater(pc.binary_length(tbl["b"]), 0))
    return tbl.filter(mask)


def link_edge_rows(batch: pa.Table) -> pa.Table:
    """Extract-stage batch -> (url, dst_host) LINKS_TO rows (href explode)."""
    hrefs = batch["hrefs"].combine_chunks() if isinstance(batch["hrefs"], pa.ChunkedArray) else batch["hrefs"]
    flat = pc.list_flatten(hrefs)
    parent = pc.list_parent_indices(hrefs)
    urls = batch["url"].combine_chunks() if isinstance(batch["url"], pa.ChunkedArray) else batch["url"]
    return pa.table({
        "url": pc.take(urls, parent),
        "dst_host": pc.cast(host_of_url_column(flat), pa.string()),
    })
