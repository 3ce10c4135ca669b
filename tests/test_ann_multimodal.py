"""ANN recall vs brute force, and multimodal decode/feature plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from stakgraph_ray.ops.ann import bucket_of, knn_lsh, multi_probe, _hyperplanes
from stakgraph_ray.stages.multimodal import (ImageFeatureStage, decode_payload,
                                             encode_image, encode_video,
                                             media_features, synth_media_table)


def test_bucket_similar_vectors_collide():
    planes = _hyperplanes(16, 8)
    v = np.random.RandomState(0).normal(size=(1, 16))
    near = v + 1e-4
    far = -v
    assert bucket_of(v, planes)[0] == bucket_of(near, planes)[0]
    assert bucket_of(v, planes)[0] != bucket_of(far, planes)[0]
    probes = multi_probe(5, 8)
    assert len(probes) == 9 and 5 in probes and 4 in probes


def test_knn_lsh_recall_vs_bruteforce(ray_session, sf_tiny):
    import pyarrow.parquet as pq

    import ray.data as rd

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.slice(0, 5)
    ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    approx = knn_lsh(ds, queries, k=5).take_all()

    # brute-force oracle
    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    recall_hits = total = 0
    for qi in range(5):
        cos = M @ M[qi]
        order = np.lexsort((ids, -cos))[:5]
        want = set(ids[order])
        got = {r["neighbor_id"] for r in approx if r["query_id"] == ids[qi]}
        recall_hits += len(got & want)
        total += len(want)
    recall = recall_hits / total
    assert recall >= 0.55, f"recall@5 {recall}"
    # self is always in its own bucket -> always found
    for qi in range(5):
        assert ids[qi] in {r["neighbor_id"] for r in approx
                           if r["query_id"] == ids[qi]}


def test_knn_ivf_recall_vs_bruteforce(ray_session, sf_tiny):
    import pyarrow.parquet as pq

    import ray.data as rd

    from stakgraph_ray.ops.ann import knn_ivf

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.slice(0, 5)
    ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    approx = knn_ivf(ds, queries, k=5, n_centroids=8, n_probe=4).take_all()

    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    recall_hits = total = 0
    for qi in range(5):
        cos = M @ M[qi]
        order = np.lexsort((ids, -cos))[:5]
        want = set(ids[order])
        got = {r["neighbor_id"] for r in approx if r["query_id"] == ids[qi]}
        recall_hits += len(got & want)
        total += len(want)
        # a query's own vector lands in its nearest cell, which is always
        # probed first -> self always found
        assert ids[qi] in got
    recall = recall_hits / total
    assert recall >= 0.6, f"recall@5 {recall}"
    # per-query output is exactly k rows with cos descending
    for qi in range(5):
        rows = sorted((r for r in approx if r["query_id"] == ids[qi]),
                      key=lambda r: -r["cos"])
        assert len(rows) == 5


def test_ivf_deterministic(ray_session, sf_tiny):
    import ray.data as rd
    import pyarrow.parquet as pq

    from stakgraph_ray.ops.ann import knn_ivf

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.slice(0, 3)

    def run():
        ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        rows = knn_ivf(ds, queries, k=3, n_centroids=8, n_probe=3).take_all()
        return sorted((r["query_id"], r["neighbor_id"]) for r in rows)

    assert run() == run()


def test_fake_container_roundtrip():
    from stakgraph_ray.stages.multimodal import encode_audio

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    assert (decode_payload(encode_image(img)) == img).all()
    vid = np.arange(2 * 8 * 4, dtype=np.uint8).reshape(2, 8, 4)
    assert (decode_payload(encode_video(vid)) == vid).all()
    wav = (np.arange(1000) % 256 - 128).astype(np.int16) * 100
    assert (decode_payload(encode_audio(wav, 16000)) == wav).all()
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG\r\n\x1a\nrest")


def test_audio_feature_stage_unit():
    from stakgraph_ray.stages.multimodal import encode_audio

    # constant positive wave: rms == value, zero crossings == 0
    wav = np.full(2048, 500, dtype=np.int16)
    t = pa.table({"media_id": [1], "kind": ["audio"],
                  "payload": pa.array([encode_audio(wav, 8000)],
                                      pa.large_binary())})
    f = ImageFeatureStage()(t).to_pylist()[0]["features"]
    assert abs(f[0] - 500.0) < 1e-6    # rms mean
    assert abs(f[1] - 0.0) < 1e-6      # rms std
    assert abs(f[2] - 0.0) < 1e-6      # zcr
    assert abs(sum(f[3:]) - 1.0) < 1e-6


def test_feature_stage_unit():
    img = np.full((16, 16), 7, dtype=np.uint8)
    t = pa.table({"media_id": [1], "kind": ["image"],
                  "payload": pa.array([encode_image(img)], pa.large_binary())})
    out = ImageFeatureStage()(t).to_pylist()[0]
    f = out["features"]
    assert abs(f[0] - 7.0) < 1e-5      # mean
    assert abs(f[1] - 0.0) < 1e-5      # std
    assert abs(sum(f[3:]) - 1.0) < 1e-5  # histogram sums to 1


def test_media_pipeline(ray_session, sf_tiny):
    out = media_features(sf_tiny).take_all()
    tbl = synth_media_table(sf_tiny)
    assert len(out) == tbl.num_rows
    kinds = {r["kind"] for r in out}
    assert kinds == {"image", "video", "audio"}
    # deterministic across runs
    out2 = media_features(sf_tiny).take_all()
    a = sorted((r["media_id"], tuple(r["features"])) for r in out)
    b = sorted((r["media_id"], tuple(r["features"])) for r in out2)
    assert a == b


def test_knn_pq_recall_vs_bruteforce(ray_session, sf_tiny):
    import pyarrow.parquet as pq

    import ray.data as rd

    from stakgraph_ray.ops.ann import knn_pq

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.slice(0, 5)
    ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    approx = knn_pq(ds, queries, k=5, n_sub=8, n_codes=64).take_all()

    M = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    recall_hits = total = 0
    for qi in range(5):
        cos = M @ M[qi]
        order = np.lexsort((ids, -cos))[:5]
        want = set(ids[order])
        got = {r["neighbor_id"] for r in approx if r["query_id"] == ids[qi]}
        assert len(got) == 5  # exactly k per query (PQ scans every row)
        recall_hits += len(got & want)
        total += len(want)
    recall = recall_hits / total
    # random uniform vectors are PQ's worst case (no subspace structure);
    # the gate documents the floor rather than a typical-corpus recall
    assert recall >= 0.4, f"recall@5 {recall}"


def test_knn_pq_deterministic(ray_session, sf_tiny):
    import pyarrow.parquet as pq

    import ray.data as rd

    from stakgraph_ray.ops.ann import knn_pq

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.slice(0, 3)

    def run():
        ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        rows = knn_pq(ds, queries, k=5, n_sub=8, n_codes=64).take_all()
        return sorted((r["query_id"], r["neighbor_id"], round(r["cos"], 12))
                      for r in rows)

    assert run() == run()


def test_hash_sample_string_and_no_id(ray_session, sf_tiny):
    """The centroid-training sample must be deterministic and block-layout
    independent for ALL id shapes: integer ids, string ids, and no id at
    all (the round-2/3 head-sample fallback is gone)."""
    import ray.data as rd

    from stakgraph_ray.ops.ann import hash_sample_vectors

    ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    str_ids = ds.map_batches(
        lambda t: pa.table({
            "sid": pa.array([f"node-{i}" for i in
                             t["vec_id"].to_pylist()], pa.string()),
            "embedding": t["embedding"]}),
        batch_format="pyarrow")
    noid = ds.map_batches(lambda t: t.select(["embedding"]),
                          batch_format="pyarrow")

    m_int = hash_sample_vectors(ds, "embedding", 40, "vec_id")
    m_str = hash_sample_vectors(str_ids, "embedding", 40, "sid")
    m_none = hash_sample_vectors(noid, "embedding", 40, None)
    for m in (m_int, m_str, m_none):
        assert 10 <= len(m) <= 120, len(m)

    # block-layout independence: repartition and re-sample -> identical
    m_none2 = hash_sample_vectors(noid.repartition(7), "embedding", 40, None)
    assert np.array_equal(m_none, m_none2)
    m_str2 = hash_sample_vectors(str_ids.repartition(5), "embedding", 40, "sid")
    assert np.array_equal(m_str, m_str2)


def test_knn_det_variants_recall_and_self(ray_session, sf_tiny):
    """The deterministic oracle-checkable variants (md5-sign LSH, anchor-
    codebook PQ over quantized ints) still behave like ANN: self is its own
    top hit and recall@5 vs quantized-dot brute force is reasonable."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from stakgraph_ray.ops.ann import (knn_ivf_det, knn_lsh_det, knn_pq_det,
                                       _quantize)

    emb = pq.read_table(f"{sf_tiny}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 5))
    ds = rd.read_parquet(f"{sf_tiny}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    lsh = knn_lsh_det(ds, queries, k=5, n_bits=4).take_all()
    pq_ = knn_pq_det(ds, queries, k=5, n_sub=4, n_codes=16).take_all()
    ivf = knn_ivf_det(ds, queries, k=5, n_centroids=16, n_probe=4).take_all()

    vq = _quantize(np.array(emb["embedding"].to_pylist(), np.float64), 1024)
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    hits_lsh = hits_pq = hits_ivf = total = 0
    for qi in range(5):
        score = vq @ vq[qi]
        order = np.lexsort((ids, -score))[:5]
        want = set(ids[order])
        got_lsh = {r["neighbor_id"] for r in lsh if r["query_id"] == ids[qi]}
        got_pq = {r["neighbor_id"] for r in pq_ if r["query_id"] == ids[qi]}
        got_ivf = {r["neighbor_id"] for r in ivf if r["query_id"] == ids[qi]}
        assert ids[qi] in got_lsh  # self shares its own bucket
        assert ids[qi] in got_ivf  # self's cell is always probed first
        hits_lsh += len(got_lsh & want)
        hits_pq += len(got_pq & want)
        hits_ivf += len(got_ivf & want)
        total += len(want)
    assert hits_lsh / total >= 0.5, f"lsh_det recall {hits_lsh / total}"
    assert hits_pq / total >= 0.3, f"pq_det recall {hits_pq / total}"
    assert hits_ivf / total >= 0.3, f"ivf_det recall {hits_ivf / total}"
    # integer scores only
    assert all(isinstance(r["score"], int) for r in lsh + pq_ + ivf)
