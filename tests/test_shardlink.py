"""Sharded-dictionary linking must be byte-identical to the broadcast
TermLinker cascade (same mentions, same dictionary)."""

import pyarrow as pa
import pytest


def test_sharded_linking_matches_broadcast(ray_session):
    import ray.data as rd

    from stakgraph_ray.sources.pages import read_pages
    from stakgraph_ray.stages.extract import ExtractTextStage, mention_rows
    from stakgraph_ray.stages.link import TermLinker, make_linker_stage
    from stakgraph_ray.stages.shardlink import link_mentions_sharded

    mentions = read_pages("/root/testdata/sf0.001") \
        .map_batches(ExtractTextStage(), batch_format="pyarrow") \
        .map_batches(mention_rows, batch_format="pyarrow").materialize()

    kw = make_linker_stage()
    broad = mentions.map_batches(TermLinker, fn_constructor_kwargs=kw,
                                 batch_format="pyarrow", batch_size=None,
                                 concurrency=(1, 2))
    shard = link_mentions_sharded(mentions, num_partitions=8)

    cols = ["url", "surface", "pos", "canonical", "confidence", "strategy"]

    def norm(ds):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    a, b = norm(broad), norm(shard)
    assert len(a) == len(b) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_shard_assignment_partitions_dictionary():
    from stakgraph_ray.stages.link import default_dictionary
    from stakgraph_ray.stages.shardlink import build_dict_shards

    from stakgraph_ray.ops.relational import _resolve

    ss, ns = build_dict_shards(default_dictionary(), 4)
    surface_shards = [_resolve(s) for s in ss]
    norm_shards = [_resolve(s) for s in ns]
    d = default_dictionary()
    total = sum(len(s) for s in surface_shards)
    assert total == len(d["canonical"]) + len(d["aliases"]) + len(d["stopwords"])
    # every shard holds a strict subset (the point: 1/P of memory each)
    assert all(len(s) < total for s in surface_shards)
    assert sum(len(s) for s in norm_shards) == len(d["canonical"])


def test_overlapping_dictionary_namespaces_match_broadcast(ray_session):
    """A key present in several dictionary namespaces must resolve the same
    way on both paths: stopword beats exact (TermLinker drops stop_mask
    after resolution), exact beats alias (Cascade checks exact first)."""
    import pandas as pd
    import ray.data as rd

    from stakgraph_ray.stages.link import TermLinker, make_linker_stage
    from stakgraph_ray.stages.shardlink import link_mentions_sharded

    d = {
        "canonical": frozenset({"spark", "flink", "the"}),
        # 'spark' is ALSO an alias key; 'the' is canonical AND stopword
        "aliases": {"spark": "flink", "sprk": "spark"},
        "stopwords": frozenset({"the", "of"}),
    }
    rows = pa.table({
        "url": pa.array(["u"] * 6),
        "surface": pa.array(["spark", "flink", "the", "of", "sprk", "zzz"]),
        "pos": pa.array(range(6), pa.int64()),
    })
    mentions = rd.from_arrow(rows).materialize()
    kw = make_linker_stage(dictionary=d)
    broad = mentions.map_batches(TermLinker, fn_constructor_kwargs=kw,
                                 batch_format="pyarrow", batch_size=None,
                                 concurrency=(1, 2))
    shard = link_mentions_sharded(mentions, dictionary=d, num_partitions=4)

    cols = ["surface", "canonical", "confidence", "strategy"]

    def norm(ds):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols, kind="mergesort").reset_index(drop=True)

    a, b = norm(broad), norm(shard)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # and the semantics themselves: spark resolves exact (not alias),
    # 'the'/'of' are dropped as stopwords
    assert set(a.surface) == {"spark", "flink", "sprk", "zzz"}
    assert a.set_index("surface").strategy["spark"] == "exact"
