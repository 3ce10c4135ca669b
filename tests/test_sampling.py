"""Unit gates for the deterministic sampling/splitting/budget operators
(ops/sampling.py): hash-split stability, stratified top-n vs brute force,
distributed prefix sum vs numpy."""

import numpy as np
import pyarrow as pa
import pytest

from stakgraph_ray.functions.minhash import md5low64
from stakgraph_ray.ops.sampling import (global_running_sum, hash_split,
                                        stratified_sample,
                                        token_budget_subset)


@pytest.fixture()
def ids_table():
    return pa.table({"doc_id": pa.array(range(100), pa.int64()),
                     "source": pa.array([f"s{i % 7}" for i in range(100)]),
                     "w": pa.array([float((i * 13) % 11) for i in range(100)])})


def test_hash_split_deterministic_and_partitioned(ray_session, ids_table):
    import ray.data as rd

    ds = rd.from_arrow(ids_table)
    out = hash_split(ds, "doc_id", [("train", 0.8), ("val", 0.1),
                                    ("test", 0.1)]).to_pandas()
    out2 = hash_split(rd.from_arrow(ids_table), "doc_id",
                      [("train", 0.8), ("val", 0.1), ("test", 0.1)]).to_pandas()
    assert out.sort_values("doc_id").split.tolist() == \
        out2.sort_values("doc_id").split.tolist()
    # every row assigned exactly one split; buckets agree with md5low64
    assert set(out.split.unique()) <= {"train", "val", "test"}
    for _, r in out.head(20).iterrows():
        b = md5low64(str(int(r.doc_id))) % 10_000
        assert b == r.bucket
        assert r.split == ("train" if b < 8000 else "val" if b < 9000 else "test")


def test_stratified_sample_matches_bruteforce(ray_session, ids_table):
    import ray.data as rd

    got = stratified_sample(rd.from_arrow(ids_table), "source", 3,
                            "doc_id").to_pandas()
    # brute force: per group, 3 smallest (md5 rank, id)
    df = ids_table.to_pandas()
    df["rank"] = [md5low64(str(int(i))) for i in df.doc_id]
    want = (df.sort_values(["rank", "doc_id"]).groupby("source").head(3))
    assert sorted(got.doc_id.tolist()) == sorted(want.doc_id.tolist())
    assert got.columns.tolist() == ["doc_id", "source", "w"]
    assert (got.groupby("source").size() <= 3).all()


def test_hash_split_partial_spec_leaves_rest_unassigned(ray_session, ids_table):
    import ray.data as rd

    out = hash_split(rd.from_arrow(ids_table), "doc_id",
                     [("sample", 0.1)]).to_pandas()
    n_assigned = (out.split == "sample").sum()
    # ~10% of 100 rows; the rest must be null, NOT absorbed into 'sample'
    assert 0 < n_assigned < 50
    assert out.split.isna().sum() == 100 - n_assigned
    assert (out.loc[out.split == "sample", "bucket"] < 1000).all()


def test_stratified_sample_null_group_is_one_group(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "source": pa.array([None] * 20 +
                                     ["s1"] * 20, pa.string())})
    got = stratified_sample(rd.from_arrow(t), "source", 3, "doc_id") \
        .to_pandas()
    # NULL keys form ONE group (SQL partition-by semantics): 3 rows, not 20
    assert (got.source.isna()).sum() == 3
    assert (got.source == "s1").sum() == 3


def test_global_running_sum_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    order = rng.permutation(500)
    vals = rng.randint(0, 50, 500).astype(float)
    ds = rd.from_arrow(pa.table({"o": pa.array(order, pa.int64()),
                                 "v": pa.array(vals)})).repartition(13)
    out = global_running_sum(ds, "o", "v").to_pandas().sort_values("o")
    want = np.cumsum(vals[np.argsort(order, kind="stable")])
    assert np.allclose(out.running_total.to_numpy(), want)


def test_token_budget_subset_boundary(ray_session):
    import ray.data as rd

    t = pa.table({"o": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array([4.0, 3.0, 3.0, 1.0])})
    out = token_budget_subset(rd.from_arrow(t), "o", "v", 10.0) \
        .to_pandas().sort_values("o")
    # 4+3+3 = 10 <= 10 keeps rows 1-3; adding row 4 exceeds
    assert out.o.tolist() == [1, 2, 3]
    assert out.columns.tolist() == ["o", "v"]


def test_hopping_window_units(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Count

    from stakgraph_ray.ops.relational import hopping_window

    # timestamp[s] column: 3 events at 0s, 3500s, 7300s; width 7200/hop 3600
    for unit, scale in (("s", 1), ("ms", 1000), ("us", 1_000_000)):
        ts = pa.array([0, 3500 * scale, 7300 * scale], pa.timestamp(unit))
        t = pa.table({"ts": ts, "k": pa.array(["x"] * 3)})
        out = hopping_window(rd.from_arrow(t), "ts", 7200, 3600, ["k"],
                             [Count(alias_name="n")]).to_pandas()
        # evt0 (0s) and evt1 (3500s) both hop-floor to 0 -> windows -3600, 0;
        # evt2 (7300s) floors to 7200 -> windows 3600, 7200
        got = {(r.window.timestamp(), r.n) for r in out.itertuples()}
        assert got == {(-3600.0, 2), (0.0, 2), (3600.0, 1), (7200.0, 1)}, unit


def test_audio_empty_waveform_zero_features():
    import numpy as np
    import pyarrow as pa

    from stakgraph_ray.stages.multimodal import (ImageFeatureStage,
                                                 encode_audio)

    t = pa.table({"media_id": [1], "kind": ["audio"],
                  "payload": pa.array(
                      [encode_audio(np.array([], np.int16), 8000)],
                      pa.large_binary())})
    f = ImageFeatureStage()(t).to_pylist()[0]["features"]
    assert len(f) == 11 and all(x == 0.0 for x in f)
