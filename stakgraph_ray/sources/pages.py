"""Page-corpus source: Common-Crawl-style pages per BASELINE.json input_hint.

Schema: ``url: string, warc_ts: timestamp[us], html: binary,
text: string, lang: string``.

``pages_from_documents`` derives the corpus *deterministically* from the
driver-provided ``documents`` table (doc_id, text, lang, source), so that:

  - extracted text is byte-identical to ``documents.text`` (golden side), and
  - every downstream result stays expressible as DuckDB SQL over ``documents``
    for the correctness oracle.

Deterministic skip-path rows (exercising the reference's size/UTF-8 skip,
/root/reference/ast/src/builder/core.rs:318-336):
  - doc_id % 1000 == OVERSIZE_MOD  -> html padded past max_html_size
  - doc_id % 1000 == BADUTF8_MOD   -> invalid UTF-8 bytes in the body
Oracle SQL for extracted text is therefore:
  CASE WHEN doc_id % 1000 IN (13, 29) THEN '' ELSE text END
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG

OVERSIZE_MOD = 13
BADUTF8_MOD = 29
SKIP_MODS = (OVERSIZE_MOD, BADUTF8_MOD)
# deterministic page markers (oracle SQL mirrors these by construction)
PROBE_MOD = 5     # doc_id % 5 == 0 -> HTTP-probe comment in the body
TESTID_MOD = 3    # doc_id % 3 == 0 -> data-testid attributes
_VERBS = ("GET", "POST", "PUT", "DELETE")
_EPOCH_US = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")

# Built once per process: a comment block that pushes any page past the cap.
_OVERSIZE_PAD = "<!-- " + "x" * (DEFAULT_CONFIG.max_html_size + 16) + " -->"

# html.escape order: & first, then the rest (single pass, no double escape).
_ESCAPES = (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
            ('"', "&quot;"), ("'", "&#x27;"))


def escape_column(s: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    s = pc.cast(s, pa.large_string())
    for ch, ent in _ESCAPES:
        s = pc.replace_substring(s, ch, ent)
    return s


def host_column(source: pa.Array | pa.ChunkedArray) -> pa.Array:
    return pc.binary_join_element_wise(source, pa.scalar(".example.org"), "")


def url_column(doc_id: pa.Array, source: pa.Array) -> pa.Array:
    padded = pc.utf8_lpad(pc.cast(doc_id, pa.string()), 8, "0")
    return pc.binary_join_element_wise(
        pa.scalar("https://"), host_column(source), pa.scalar("/doc/"), padded, "")


def build_pages_batch(batch: pa.Table) -> pa.Table:
    """documents batch (doc_id, text, lang, source) -> pages batch."""
    doc_id = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
    text = batch["text"]
    source = batch["source"]
    lang = batch["lang"]

    url = url_column(doc_id, source)
    host = host_column(source)
    esc = escape_column(text)
    id_str = pc.cast(doc_id, pa.string())

    id_np = doc_id.to_numpy()
    src_ls = pc.cast(source.combine_chunks() if isinstance(source, pa.ChunkedArray) else source, pa.large_string())
    empty = pa.scalar("", pa.large_string())

    # Deterministic markers (see PROBE_MOD/TESTID_MOD): an HTTP-probe comment
    # (analog of test bodies naming verbs+routes, linker.rs:329-360) and
    # data-testid attributes (linker.rs:302-314). Comments/attributes are
    # stripped by text extraction, so documents.text stays byte-identical.
    probe = pc.if_else(
        pa.array(id_np % PROBE_MOD == 0),
        pc.binary_join_element_wise(
            pa.scalar("<!-- probe: ", pa.large_string()),
            pa.array([_VERBS[i] for i in id_np % 4], pa.large_string()),
            pa.scalar(" /api/", pa.large_string()), src_ls,
            pa.scalar("/", pa.large_string()),
            pc.cast(pa.array(id_np % 50), pa.large_string()),
            pa.scalar(" -->\n", pa.large_string()), empty),
        empty)
    has_tid = pa.array(id_np % TESTID_MOD == 0)
    div_tid = pc.if_else(
        has_tid,
        pc.binary_join_element_wise(
            pa.scalar(' data-testid="main-', pa.large_string()),
            pc.cast(pa.array(id_np % 97), pa.large_string()),
            pa.scalar('"', pa.large_string()), empty),
        empty)
    nav_tid = pc.if_else(
        has_tid,
        pc.binary_join_element_wise(
            pa.scalar(' data-testid="nav-', pa.large_string()), src_ls,
            pa.scalar('"', pa.large_string()), empty),
        empty)

    html = pc.binary_join_element_wise(
        pa.scalar("<html><head><title>Doc ", pa.large_string()), pc.cast(id_str, pa.large_string()),
        pa.scalar("</title><style>p { color: #000; }</style>"
                  "<script>var t = 1 < 2;</script></head>\n<body><!-- src=", pa.large_string()),
        src_ls,
        pa.scalar(" -->\n", pa.large_string()),
        probe,
        pa.scalar("<div class=\"main\"", pa.large_string()),
        div_tid,
        pa.scalar("><p>", pa.large_string()),
        esc,
        pa.scalar("</p></div>\n<a href=\"https://", pa.large_string()),
        pc.cast(host, pa.large_string()),
        pa.scalar("/\"></a>\n<a href=\"https://", pa.large_string()),
        pc.cast(host, pa.large_string()),
        pa.scalar("/about/", pa.large_string()),
        pc.cast(pa.array(id_np % 7), pa.large_string()),
        pa.scalar("\"", pa.large_string()),
        nav_tid,
        pa.scalar("></a></body></html>", pa.large_string()),
        pa.scalar("", pa.large_string()))

    mod_np = doc_id.to_numpy() % 1000  # pyarrow 16 has no modulo kernel
    # Build the pad column DIRECTLY ("" except the 1/1000 oversize rows) —
    # both pc.if_else(mask, joined, html) and pc.if_else(mask, pad_scalar,
    # "") materialize the 500KB value for EVERY row before selecting
    # (~row_count x max_html_size of discarded allocations: 20 GB and 214 s
    # of kernel time per 40k-row batch in the x64 scaling run).
    over_idx = np.flatnonzero(mod_np == OVERSIZE_MOD)
    if len(over_idx):
        vals = np.full(len(mod_np), "", dtype=object)
        vals[over_idx] = _OVERSIZE_PAD
        pad = pa.array(vals, pa.large_string())
        html = pc.binary_join_element_wise(
            html, pad, pa.scalar("", pa.large_string()))

    hb = pc.cast(html, pa.large_binary())
    bad = mod_np == BADUTF8_MOD
    if bad.any():
        # Per-row only for the rare invalid rows.
        vals = hb.to_pylist()
        for i in np.flatnonzero(bad):
            vals[i] = vals[i] + b"\xff\xfe\x00binary"
        hb = pa.array(vals, pa.large_binary())

    ts = pa.array((_EPOCH_US + doc_id.to_numpy() * 1_000_000).astype("datetime64[us]"))

    return pa.table({
        "url": pc.cast(url, pa.string()),
        "warc_ts": ts,
        "html": hb,
        "text": pc.cast(text, pa.string()),
        "lang": pc.cast(lang, pa.string()),
        "doc_id": doc_id,  # kept for oracle joins; dropped by the pipeline
    })


def read_pages(sf_dir: str, include_doc_id: bool = False, override_num_blocks=None,
               replicate: int = 1):
    """documents.parquet -> pages Dataset (lazy; html built inside map_batches).

    ``replicate=R`` tiles the corpus R times with shifted doc_ids (distinct
    urls/timestamps, deterministic) — used by the scaling benchmark so real
    compute dominates fixed session overhead; both parallelism levels see
    the identical tiled input."""
    import ray.data as rd

    from ..util import default_num_blocks

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=override_num_blocks or default_num_blocks(),
    )
    if replicate > 1:
        # tile INSIDE each task but YIELD the copies as separate batches —
        # a Dataset union of R copies would explode the block count R-fold
        # (tiny-block overhead dominates at high parallelism), while a
        # single concat of R copies held R x batch bytes in one worker
        # heap (at x1024 that was several GB per batch and the build
        # thrashed; the generator keeps peak memory at ~one input batch
        # and Ray's dynamic block splitting shapes the output stream)
        def tile(t: pa.Table):
            yield t
            for k in range(1, replicate):
                off = pa.scalar(k * 10_000_000, pa.int64())
                yield t.set_column(
                    t.column_names.index("doc_id"), "doc_id",
                    pc.add(t["doc_id"], off))

        ds = ds.map_batches(tile, batch_format="pyarrow")
    ds = ds.map_batches(build_pages_batch, batch_format="pyarrow")
    if not include_doc_id:
        ds = ds.drop_columns(["doc_id"])
    return ds


def pages_table(sf_dir: str) -> pa.Table:
    """Eager single-process variant for tests and the oracle (no Ray)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    return build_pages_batch(docs)
