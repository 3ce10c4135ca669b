"""Unit + differential tests for the deterministic HTML->text extractor."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from stakgraph_ray.functions.html import extract_text_column, sha256_column
from stakgraph_ray.pipelines import oracle
from stakgraph_ray.sources.pages import SKIP_MODS, pages_table

CASES = [
    (b"<html><body><p>hello world</p></body></html>", "hello world"),
    (b"<p>a</p><p>b</p>", "a b"),
    (b"<head><title>t</title></head><body>x</body>", "x"),
    (b"<script>var a=1;</script>ok", "ok"),
    (b"<SCRIPT>x</SCRIPT>hi", "hi"),
    (b"<style>p{}</style>s", "s"),
    (b"<!-- comment -->text", "text"),
    (b"<!-- multi\nline -->y", "y"),
    (b"a&amp;b", "a&b"),
    (b"&lt;p&gt; literal", "<p> literal"),
    (b"q&#x27;s &#39;x", "q's 'x"),
    (b"n&nbsp;b", "n b"),
    (b"&amp;lt;", "&lt;"),  # no double decoding
    (b"  lots   \n\t of \r ws  ", "lots of ws"),
    (b"<div><b>in</b>line</div>", "in line"),
    (b"", ""),
    (b"no tags at all", "no tags at all"),
    (b"<a href=\"https://x.org/\"></a>tail", "tail"),
]


@pytest.mark.parametrize("html,expected", CASES)
def test_oracle_contract(html, expected):
    text, skipped = oracle.extract_text(html)
    assert not skipped
    assert text == expected


def test_vectorized_matches_oracle_on_cases():
    arr = pa.array([h for h, _ in CASES], pa.large_binary())
    text, skipped = extract_text_column(arr)
    for (html, expected), got, sk in zip(CASES, text.to_pylist(), skipped.to_pylist()):
        assert not sk
        assert got == expected, html


def test_skip_paths():
    big = b"<p>" + b"x" * 600_000 + b"</p>"
    bad = b"<p>ok</p>\xff\xfe"
    arr = pa.array([big, bad, b"<p>fine</p>"], pa.large_binary())
    text, skipped = extract_text_column(arr)
    assert skipped.to_pylist() == [True, True, False]
    assert text.to_pylist() == ["", "", "fine"]
    ot, osk = oracle.extract_text(big)
    assert osk and ot == ""
    ot, osk = oracle.extract_text(bad)
    assert osk and ot == ""


def test_byte_identical_on_corpus(sf_tiny):
    """The invariant: extracted text == documents.text byte-for-byte
    (except deterministic skip rows), and oracle == vectorized everywhere."""
    pages = pages_table(sf_tiny)
    docs = pq.read_table(f"{sf_tiny}/documents.parquet")
    text, skipped = extract_text_column(pages["html"])
    for t, sk, o, d in zip(text.to_pylist(), skipped.to_pylist(),
                           docs["text"].to_pylist(), docs["doc_id"].to_pylist()):
        if d % 1000 in SKIP_MODS:
            assert sk and t == ""
        else:
            assert not sk
            assert t == o
    # differential: independent oracle implementation agrees byte-for-byte
    for h, t in zip(pages["html"].to_pylist(), text.to_pylist()):
        ot, _ = oracle.extract_text(h)
        assert ot == t


def test_sha256_column():
    arr = pa.array(["abc", ""], pa.large_string())
    got = sha256_column(arr).to_pylist()
    assert got[0] == hashlib.sha256(b"abc").hexdigest()
    assert got[1] == hashlib.sha256(b"").hexdigest()
