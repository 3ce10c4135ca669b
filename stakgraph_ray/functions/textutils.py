"""Scalar/vector text utilities (cf. normalizers in
/root/reference/ast/src/lang/linker.rs:398-470 and ast/src/utils.rs:71-80).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_url(url: str) -> str:
    """Strip scheme, query/hash, `${...}` interpolations, trailing slash —
    modeled on normalize_frontend_path (linker.rs:398-430)."""
    u = url
    for scheme in ("https://", "http://", "//"):
        if u.startswith(scheme):
            u = u[len(scheme):]
            break
    for sep in ("?", "#"):
        if sep in u:
            u = u.split(sep, 1)[0]
    while "${" in u:
        i = u.index("${")
        j = u.find("}", i)
        if j == -1:
            u = u[:i]
            break
        u = u[:i] + ":param" + u[j + 1:]
    if u.endswith("/") and len(u) > 1:
        u = u[:-1]
    return u


def normalize_url_column(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized normalize_url (re2 chain)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    s = pc.replace_substring_regex(url, r"^(https?:)?//", "")
    s = pc.replace_substring_regex(s, r"[?#].*$", "")
    s = pc.replace_substring_regex(s, r"\$\{[^}]*\}", ":param")
    s = pc.replace_substring_regex(s, r"\$\{.*$", "")
    s = pc.replace_substring_regex(s, r"(.)/$", "\\1")
    return s


def host_of_url_column(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Host part of an absolute url (vectorized)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    s = pc.replace_substring_regex(url, r"^(https?:)?//", "")
    return pc.replace_substring_regex(s, r"[/?#].*$", "")


def normalize_surface(s: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Normalized surface form for the 'normalized' link strategy:
    lowercase, strip non-alphanumerics (e.g. 'I.B.M.' -> 'ibm')."""
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    return pc.replace_substring_regex(pc.utf8_lower(s), r"[^a-z0-9]", "")


def filter_nested_spans(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Boolean keep-mask dropping spans strictly contained in another span
    (cf. filter_nested_datamodels / no_nested,
    /root/reference/ast/src/lang/mod.rs:331-354, builder/stages.rs:305-323).

    Vectorized: sort by (start asc, end desc); a span is nested iff a
    previously-seen span's end >= its end (running max over the sort order,
    excluding itself). Equal spans are kept once (first wins)."""
    n = len(starts)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-ends, starts))
    s, e = starts[order], ends[order]
    run_max = np.maximum.accumulate(e)
    prev_max = np.concatenate(([np.iinfo(np.int64).min], run_max[:-1]))
    nested = e <= prev_max  # some earlier span (start<=s) ends at/after e
    keep = np.zeros(n, dtype=bool)
    keep[order] = ~nested
    return keep


def explode_tokens(text: pa.Array | pa.ChunkedArray):
    """Whitespace-tokenize a string column and explode, fully vectorized.

    Returns (parent_indices: int64 np.ndarray, token: pa.Array,
             pos: np.ndarray token ordinal within row,
             start: np.ndarray char offset, end: np.ndarray char offset).
    Offsets assume single-space joins (the extraction contract collapses all
    whitespace to single spaces, so this holds for extracted text).
    """
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype("int64")
    total = int(counts.sum())
    starts_of_row = np.concatenate(([0], np.cumsum(counts)[:-1])) if len(counts) else np.empty(0, dtype="int64")
    pos = np.arange(total, dtype="int64") - np.repeat(starts_of_row, counts)
    # utf8_length = CHARACTER counts (the documented contract); binary_length
    # would yield byte offsets that disagree on multibyte text
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype("int64")
    # char start = cumsum of (len+1) of previous tokens within the row
    adv = lens + 1
    g = np.cumsum(adv) - adv  # global exclusive cumsum
    base = np.repeat(g[starts_of_row], counts) if total else np.empty(0, dtype="int64")
    start = g - base
    end = start + lens
    return parent, flat, pos, start, end
