r"""Deterministic HTML → text extraction (the byte-identical per-url invariant).

Extraction contract (fixed; both this vectorized implementation and the
independent single-process oracle in ``stakgraph_ray.pipelines.oracle``
implement exactly this spec):

  1. html larger than ``cfg.max_html_size`` bytes, or not valid UTF-8,
     is *skipped*: text = "" and the row is tagged skipped=True
     (mirrors the reference's file-size/UTF-8 skip path,
     /root/reference/ast/src/builder/core.rs:318-336, cap at builder/utils.rs:13).
  2. ``<head>...</head>``, ``<script>...</script>``, ``<style>...</style>``
     and ``<!-- ... -->`` comment blocks are removed (case-insensitive,
     non-greedy, dot-matches-newline).
  3. Every remaining tag ``<...>`` is replaced by a single space.
  4. The closed HTML-entity set {&amp; &lt; &gt; &quot; &#x27; &#39; &nbsp;}
     is decoded (&amp; decoded last, single pass — no double decoding); raw
     NBSP characters become plain spaces.
  5. All ASCII-whitespace runs collapse to one space; leading and trailing
     whitespace is stripped. (ASCII because re2's \s is ASCII-only; the
     oracle pins Python re to the same set.)

The whole chain runs as pyarrow.compute re2 kernels over a string array —
no Python per-row loop. UTF-8 validation casts the whole binary column at
once and only falls back to per-row on failure (rare).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG

# Block-removal patterns, applied in order. re2: (?is) = case-insensitive,
# dot-matches-newline; re2 has no backreferences but none are needed.
_BLOCK_PATTERNS = (
    r"(?is)<head[\s>].*?</head\s*>",
    r"(?is)<head></head\s*>",
    r"(?is)<script[\s>].*?</script\s*>",
    r"(?is)<script></script\s*>",
    r"(?is)<style[\s>].*?</style\s*>",
    r"(?is)<style></style\s*>",
    r"(?s)<!--.*?-->",
)
_TAG_PATTERN = r"(?s)<[^>]*>"

# Entity decode table; &amp; MUST come last (single-pass, no double decode).
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("\xa0", " "),   # raw NBSP is whitespace too
    ("&amp;", "&"),
)
_WS_PATTERN = r"\s+"


def decode_utf8_column(html: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """binary column -> (string column with ""-for-invalid, bool invalid mask)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        s = pc.cast(html, pa.large_string())
        # explicit bool_: pa.array([]) infers NULL type on a 0-row batch
        # and downstream fill_null/or_ kernels reject it
        invalid = pa.array([False] * len(s), pa.bool_())
        return s, invalid
    except pa.ArrowInvalid:
        out, bad = [], []
        for v in html:
            b = v.as_py()
            if b is None:
                out.append("")
                bad.append(True)
                continue
            try:
                out.append(b.decode("utf-8"))
                bad.append(False)
            except UnicodeDecodeError:
                out.append("")
                bad.append(True)
        return pa.array(out, pa.large_string()), pa.array(bad, pa.bool_())


def decode_valid_html(html: pa.ChunkedArray | pa.Array,
                      cfg: PipelineConfig = DEFAULT_CONFIG
                      ) -> tuple[pa.Array, pa.Array]:
    """binary html -> (string with skipped rows blanked, skipped mask)."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    size = pc.binary_length(html)
    too_big = pc.greater(size, cfg.max_html_size)
    s, invalid = decode_utf8_column(html)
    # null html (corrupt WARC record) must be a DETERMINISTIC skip: both
    # comparisons are null there and pc.or_ would propagate the null into
    # the mask (and from there a null text/meta downstream)
    skipped = pc.or_(pc.fill_null(too_big, True), pc.fill_null(invalid, True))
    # Blank out skipped rows before the regex chain so oversized bodies don't
    # burn regex time.
    s = pc.if_else(skipped, pa.scalar("", pa.large_string()), s)
    return s, skipped


def clean_html_text(s: pa.Array) -> pa.Array:
    """The tag-strip / entity-decode / whitespace-collapse chain (steps 2-5)."""
    for pat in _BLOCK_PATTERNS:
        s = pc.replace_substring_regex(s, pat, "")
    s = pc.replace_substring_regex(s, _TAG_PATTERN, " ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, _WS_PATTERN, " ")
    return pc.utf8_trim_whitespace(s)


def extract_text_column(html: pa.ChunkedArray | pa.Array,
                        cfg: PipelineConfig = DEFAULT_CONFIG
                        ) -> tuple[pa.Array, pa.Array]:
    """Vectorized extraction. Returns (text: large_string, skipped: bool)."""
    s, skipped = decode_valid_html(html, cfg)
    return clean_html_text(s), skipped


_TITLE_RE = r"(?is)<title[^>]*>(?P<t>[^<]*)</title\s*>"


def extract_title_column(html_s: pa.Array) -> pa.Array:
    """First ``<title>`` text per page (entity-decoded, whitespace-collapsed,
    trimmed — same rules as body text); null when absent/skipped. This is
    the ``docs`` analog: comment/JSDoc attachment in the reference
    (/root/reference/ast/src/lang/mod.rs:85-197) re-targeted at the page's
    self-describing metadata."""
    m = pc.extract_regex(html_s, _TITLE_RE)
    t = pc.struct_field(m, "t")
    for ent, ch in _ENTITIES:
        t = pc.replace_substring(t, ent, ch)
    t = pc.replace_substring_regex(t, _WS_PATTERN, " ")
    return pc.cast(pc.utf8_trim_whitespace(t), pa.string())


def sha256_column(text: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 hex of each string (hash-column precedent:
    /root/reference/ast/src/builder/utils.rs:256). hashlib per row — cheap
    relative to the regex chain; numpy has no sha256 kernel."""
    import hashlib

    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pa.array(
        [hashlib.sha256(t.encode("utf-8")).hexdigest() if t is not None else None
         for t in text.to_pylist()],
        pa.string(),
    )
