"""Single-process pure-Python oracle for the KG pipeline.

An *independent* implementation of the extraction contract (see
``stakgraph_ray.functions.html``) used for differential testing, mirroring the
reference's two-engines-as-mutual-oracles strategy
(/root/reference/ast/src/testing/graphs/compare_graphs.rs:26-50):
Python ``re`` + ``str.replace`` per row here vs vectorized Arrow re2 kernels
in the pipeline. Must agree byte-for-byte on every input.
"""

from __future__ import annotations

import hashlib
import re

from ..config import PipelineConfig, DEFAULT_CONFIG

_BLOCK_RES = [
    re.compile(r"<head[\s>].*?</head\s*>", re.I | re.S),
    re.compile(r"<head></head\s*>", re.I | re.S),
    re.compile(r"<script[\s>].*?</script\s*>", re.I | re.S),
    re.compile(r"<script></script\s*>", re.I | re.S),
    re.compile(r"<style[\s>].*?</style\s*>", re.I | re.S),
    re.compile(r"<style></style\s*>", re.I | re.S),
    re.compile(r"<!--.*?-->", re.S),
]
_TAG_RE = re.compile(r"<[^>]*>", re.S)
_WS_RE = re.compile(r"\s+", re.ASCII)  # pinned to re2's ASCII \s
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#x27;", "'"),
             ("&#39;", "'"), ("&nbsp;", " "), (" ", " "), ("&amp;", "&")]


def extract_text(html: bytes, cfg: PipelineConfig = DEFAULT_CONFIG) -> tuple[str, bool]:
    """(text, skipped) for one page, per the fixed extraction contract."""
    if html is None or len(html) > cfg.max_html_size:
        return "", True
    try:
        s = html.decode("utf-8")
    except UnicodeDecodeError:
        return "", True
    for rx in _BLOCK_RES:
        s = rx.sub("", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _WS_RE.sub(" ", s).strip()
    return s, False


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def extract_pages(rows: list[dict], cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict]:
    """Oracle over page rows [{url, html, ...}] -> [{url, text, skipped, text_sha256}]."""
    out = []
    for r in rows:
        text, skipped = extract_text(r["html"], cfg)
        out.append({"url": r["url"], "text": text, "skipped": skipped,
                    "text_sha256": text_sha256(text)})
    return out
