"""Unit tests for node-key sanitization (Unicode-aware) and token offsets
(character semantics on multibyte text)."""

import numpy as np
import pyarrow as pa

from stakgraph_ray.functions.textutils import explode_tokens
from stakgraph_ray.schema import node_key, node_key_array, sanitize, sanitize_array


def test_sanitize_array_unicode_agrees_with_scalar():
    vals = ["Müller-Straße 7", "北京大学", "Ελλάδα 2024", "Москва!",
            "abc DEF 42", "مرحبا", "--", ""]
    vec = sanitize_array(pa.array(vals, pa.string())).to_pylist()
    assert vec == [sanitize(v) for v in vals]
    # non-ASCII names must NOT collapse to the empty key
    assert vec[1] == "北京大学" and vec[2] == "ελλάδα2024" and vec[3] == "москва"


def test_sanitize_array_dict_encode_edges():
    # the dictionary-encode fast path must keep scalar parity through
    # heavy duplication, nulls, and chunked inputs
    vals = ["A b!", "A b!", None, "", "A b!", "çÇ 9", None, "çÇ 9"] * 5
    vec = sanitize_array(pa.array(vals, pa.string())).to_pylist()
    assert vec == [sanitize(v) if v is not None else None for v in vals]
    chunked = pa.chunked_array([pa.array(vals[:10], pa.string()),
                                pa.array(vals[10:], pa.string())])
    assert sanitize_array(chunked).to_pylist() == vec


def test_node_key_array_distinct_for_nonascii_names():
    names = pa.array(["北京大学", "Москва", "Ελλάδα"], pa.string())
    keys = node_key_array("Term", names, pa.array([""] * 3)).to_pylist()
    assert len(set(keys)) == 3
    assert keys[0] == node_key("Term", "北京大学", "")


def test_explode_tokens_char_offsets_multibyte():
    text = pa.array(["héllo wörld", "日本 語 x"], pa.large_string())
    parent, flat, pos, start, end = explode_tokens(text)
    assert flat.to_pylist() == ["héllo", "wörld", "日本", "語", "x"]
    # char offsets, not byte offsets
    assert list(start) == [0, 6, 0, 3, 5]
    assert list(end) == [5, 11, 2, 4, 6]
    assert list(pos) == [0, 1, 0, 1, 2]
    assert list(parent) == [0, 0, 1, 1, 1]


def test_bigram_linker_drops_unverified_when_configured():
    from stakgraph_ray.config import PipelineConfig
    from stakgraph_ray.stages.link import BigramLinker, default_dictionary

    batch = pa.table({
        "a": pa.array(["spark", "zzznotaword", "agg"], pa.string()),
        "b": pa.array(["join", "spark", "zzzother"], pa.string()),
        "weight": pa.array([1, 1, 1], pa.int64()),
    })
    keep = BigramLinker(default_dictionary(), PipelineConfig())( batch)
    assert keep.num_rows == 3  # default keeps unverified stubs
    strict = BigramLinker(default_dictionary(),
                          PipelineConfig(keep_unverified=False))(batch)
    assert strict["a"].to_pylist() == ["spark"]
    assert strict["b"].to_pylist() == ["join"]


def test_meta_to_map_roundtrip():
    import json

    import pyarrow as pa

    from stakgraph_ray.schema import meta_to_map

    metas = [json.dumps({"a": "1", "b": "2"}, sort_keys=True,
                        separators=(",", ":")), None, "{}"]
    m = meta_to_map(pa.array(metas, pa.string()))
    assert m.type == pa.map_(pa.string(), pa.string())
    py = m.to_pylist()
    assert py[0] == [("a", "1"), ("b", "2")]
    assert py[1] == [] and py[2] == []
