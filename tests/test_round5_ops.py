"""Planted-corpus semantics for the round-5 continuation operators: BM25
ranking, k-means assignment ties, JSON props extraction with missing
fields, moment null semantics, histogram binning, percentile trim,
vocabulary growth, and session path mining."""

import math
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, name, table):
    pq.write_table(table, tmp_path / f"{name}.parquet")


def _docs(tmp_path, texts, sources=None):
    n = len(texts)
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(sources or ["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))


def test_bm25_rare_term_outranks_common(ray_session, tmp_path):
    """A doc matching the RARE query term must outrank one matching the
    corpus-saturating term the same number of times (IDF at work) — the
    exact inversion the raw term-count scorer cannot produce."""
    from stakgraph_ray.pipelines.queries_dedup import q_bm25_topk

    # 'join' appears in every doc (low idf); 'spark' only in doc 1
    _docs(tmp_path, ["spark x x x", "join x x x", "join y y y",
                     "join z z z", "join w w w"])
    out = q_bm25_topk(str(tmp_path)).to_pylist()
    assert out[0]["doc_id"] == 1
    assert out[0]["score"] > out[1]["score"]
    # every other doc matched 'join' once with identical length -> equal
    # scores, ordered by doc_id
    rest = [r["doc_id"] for r in out[1:]]
    assert rest == [2, 3, 4, 5]
    assert len({r["score"] for r in out[1:]}) == 1


def test_kmeans_assign_nearest_and_tie(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_dedup import q_kmeans_assign

    # anchors: ids 0 and 1 at (0,0) and (10,0); id 2 on top of anchor 1;
    # id 3 EQUIDISTANT from both -> lower anchor id (0) must win
    vecs = [[0.0, 0.0], [10.0, 0.0], [10.0, 1.0], [5.0, 0.0]]
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32())}))
    out = {r["vec_id"]: r for r in
           q_kmeans_assign(str(tmp_path), n_anchors=2).take_all()}
    assert out[0]["cluster"] == 0 and out[0]["dist"] == 0.0
    assert out[2]["cluster"] == 1 and out[2]["dist"] == 1.0
    assert out[3]["cluster"] == 0 and out[3]["dist"] == 5.0


def test_event_props_extract_missing_field(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_event_props_extract

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([datetime(2026, 1, 1)] * 3, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["click", "click", "click"], pa.string()),
        "value": pa.array([0.0] * 3, pa.float64()),
        "props": pa.array(['{"k": 7}', '{"other": 1}', '{"k": -3}'],
                          pa.string())}))
    row = q_event_props_extract(str(tmp_path)).to_pylist()[0]
    assert row == {"event_type": "click", "sum_k": 4, "n_k": 2,
                   "n_missing": 1, "avg_k": 2.0}


def test_moments_null_semantics(ray_session, tmp_path):
    """n=3 nation: skew defined, kurt NULL; constant-balance nation: both
    NULL (zero variance) — the DuckDB semantics pinned by experiment."""
    from stakgraph_ray.pipelines.queries_rel import q_nation_balance_moments

    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["NATION_A", "NATION_B"], pa.string()),
        "n_regionkey": pa.array([0, 0], pa.int32())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(7)], pa.string()),
        "c_nationkey": pa.array([0, 0, 0, 1, 1, 1, 1], pa.int32()),
        "c_acctbal": pa.array([1.0, 2.0, 4.0, 5.0, 5.0, 5.0, 5.0],
                              pa.float64()),
        "c_mktsegment": pa.array(["B"] * 7, pa.string())}))
    out = {r["n_name"]: r for r in
           q_nation_balance_moments(str(tmp_path)).to_pylist()}
    assert out["NATION_A"]["n"] == 3
    assert out["NATION_A"]["skew"] is not None
    assert out["NATION_A"]["kurt"] is None          # n < 4
    assert out["NATION_B"]["skew"] is None          # zero variance
    assert out["NATION_B"]["kurt"] is None


def test_price_histogram_bins(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_price_histogram

    _write(tmp_path, "lineitem", pa.table({
        "l_extendedprice": pa.array([0.0, 4999.99, 5000.0, 12000.0],
                                    pa.float64())}))
    out = q_price_histogram(str(tmp_path)).to_pylist()
    assert out == [{"bin": 0, "lo": 0.0, "n": 2},
                   {"bin": 1, "lo": 5000.0, "n": 1},
                   {"bin": 2, "lo": 10000.0, "n": 1}]


def test_length_trim_band(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_length_trim

    # 1..20 chars; p5=1.95, p95=19.05 -> keep 2..19 (18 docs)
    texts = ["x" * i for i in range(1, 21)]
    _docs(tmp_path, texts)
    row = q_length_trim(str(tmp_path)).to_pylist()[0]
    assert row["n_total"] == 20 and row["n_kept"] == 18
    assert row["kept_chars"] == sum(range(2, 20))


def test_vocab_growth_monotone_first_seen(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_vocab_growth

    # doc1 introduces a b; doc2 repeats a; doc10 introduces c
    texts = ["a b", "a"] + ["a"] * 7 + ["c"]
    _docs(tmp_path, texts)
    out = q_vocab_growth(str(tmp_path)).to_pylist()
    assert [r["vocab"] for r in out] == [2] * 9 + [3]
    assert all(out[i]["vocab"] <= out[i + 1]["vocab"]
               for i in range(len(out) - 1))


def test_session_paths_gap_split(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_session_paths

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1: a>b then (after 31 min) c  -> paths "a>b", "c"
        (1, t0, 1, "a"), (1, t0 + timedelta(minutes=5), 2, "b"),
        (1, t0 + timedelta(minutes=36), 3, "c"),
        # user 2: a>b in one session -> "a>b" again
        (2, t0, 4, "a"), (2, t0 + timedelta(minutes=10), 5, "b"),
    ]
    uid, ts, eid, et = zip(*rows)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}))
    out = q_session_paths(str(tmp_path)).to_pylist()
    assert out[0] == {"path": "a>b", "n": 2}
    assert {"path": "c", "n": 1} in out


def test_kmv_jaccard_exact_when_under_k(ray_session, tmp_path):
    """Vocabulary smaller than k: the sketch IS the full set, so the
    estimate equals the exact shingle Jaccard."""
    from stakgraph_ray.pipelines.queries_dedup import q_kmv_jaccard

    # src0 shingles: {a b c, b c d}; src1: {b c d, c d e} -> J = 1/3
    _docs(tmp_path, ["a b c d", "b c d e"], sources=["src0", "src1"])
    row = q_kmv_jaccard(str(tmp_path)).to_pylist()[0]
    assert row["n_union_sketch"] == 3 and row["n_both"] == 1
    assert row["jaccard_est"] == pytest.approx(1 / 3, abs=1e-6)


def test_cohort_retention_triangle(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_cohort_retention

    wk = 7 * 86400
    base = datetime(2026, 1, 1)  # whatever week index this lands in
    rows = [
        # user 1: active week 0 and week 2 (offsets 0, 2)
        (1, base), (1, base + timedelta(seconds=2 * wk)),
        # user 2: joins one week later, active twice that week (offset 0 once)
        (2, base + timedelta(seconds=wk)),
        (2, base + timedelta(seconds=wk, hours=1)),
    ]
    uid, ts = zip(*rows)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}))
    out = q_cohort_retention(str(tmp_path)).to_pylist()
    w0 = out[0]["cohort_week"]
    # normalize to relative weeks for assertion stability
    rel = [(r["cohort_week"] - w0, r["week_offset"], r["n_users"])
           for r in out]
    assert (0, 0, 1) in rel and (0, 2, 1) in rel
    # user 2's duplicate same-week events collapse to ONE distinct pair
    assert any(c >= 0 and o == 0 and n == 1 for c, o, n in rel if c > 0) or \
        (1, 0, 1) in rel


def test_dup_size_histogram_counts_mass(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_dup_size_histogram

    _docs(tmp_path, ["same text", "same text", "same text",
                     "unique one", "unique two"])
    out = q_dup_size_histogram(str(tmp_path)).to_pylist()
    assert out == [{"size": 1, "n_clusters": 2, "n_docs": 2},
                   {"size": 3, "n_clusters": 1, "n_docs": 3}]


def test_langid_confusion_rates(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_dedup import q_langid_confusion

    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the word", "word word", "a word"], pa.string()),
        "lang": pa.array(["en", "en", "fr"], pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([8, 9, 6], pa.int64())}))
    out = q_langid_confusion(str(tmp_path)).to_pylist()
    assert {"lang": "en", "lang_guess": "en", "n": 1, "rate": 0.5} in out
    assert {"lang": "en", "lang_guess": "und", "n": 1, "rate": 0.5} in out
    assert {"lang": "fr", "lang_guess": "en", "n": 1, "rate": 1.0} in out


def test_term_kcore_clique_survives_chain_peeled(ray_session, tmp_path):
    """A 4-clique (every degree 3) survives k=3 peeling; a pendant chain
    is stripped in round 1."""
    from stakgraph_ray.pipelines.queries_kg import q_term_kcore

    # consecutive bigrams of this walk produce ALL 6 clique edges
    clique = "alpha beta gamma delta alpha gamma beta delta"
    chain = "epsilon zeta"
    _docs(tmp_path, [clique, chain])
    out = q_term_kcore(str(tmp_path)).to_pylist()
    names = {r["node_key"] for r in out}
    assert {"alpha", "beta", "gamma", "delta"} <= {n.split(":")[-1] for n in names} or \
           len(out) == 4  # clique survives under whatever key prefixing
    degs = {r["node_key"]: r["degree"] for r in out}
    assert all(d == 3 for d in degs.values())
    assert not any("epsilon" in n or "zeta" in n for n in names)


def test_late_events_detects_planted_disorder(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_rel import q_late_events

    t0 = datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        # user 1 arrivals: t0, t0+2h, then an event stamped t0 (2h late),
        # then t0+30s before the max (inside the 1h allowance)
        (1, 1, t0), (1, 2, t0 + timedelta(hours=2)), (1, 3, t0),
        (1, 4, t0 + timedelta(hours=2) - timedelta(seconds=30)),
        # user 2: in order
        (2, 5, t0), (2, 6, t0 + timedelta(minutes=1)),
    ]
    uid, eid, ts = zip(*rows)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string())}))
    out = {r["user_id"]: r for r in q_late_events(str(tmp_path)).take_all()}
    assert out[1]["n_events"] == 4 and out[1]["n_late"] == 1
    assert out[1]["max_lateness_us"] == 2 * 3600 * 1_000_000
    assert out[2]["n_late"] == 0 and out[2]["max_lateness_us"] == 0


def test_bpe_token_count_fertility(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_bpe_token_count

    # "the dog's 42 bones!!" -> ws tokens 4; BPE-ish: the| dog|'s| 42|
    # bones|!! = 6 -> fertility 1.5
    _docs(tmp_path, ["the dog's 42 bones!!"])
    row = q_bpe_token_count(str(tmp_path)).take_all()[0]
    assert row["n_ws_tokens"] == 4 and row["n_bpe_tokens"] == 6
    assert row["fertility"] == 1.5


def test_bigram_logprob_hand_computed(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_bigram_logprob

    # corpus: "x y x y" (bigrams: x y, y x, x y) and "y" (no bigram).
    # V = 2; c(x y)=2, c(y x)=1; left counts c(x.)=2, c(y.)=1
    # p(y|x) = (2+1)/(2+2) = 0.75 ; p(x|y) = (1+1)/(1+2) = 2/3
    _docs(tmp_path, ["x y x y", "y"])
    out = {r["doc_id"]: r for r in q_bigram_logprob(str(tmp_path)).take_all()}
    assert 2 not in out                       # no-bigram doc emits no row
    exp = round((2 * math.log(0.75) + math.log(2 / 3)) / 3, 4)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["mean_logprob"] == pytest.approx(exp, abs=2e-4)


def test_perplexity_buckets_partition(ray_session, tmp_path):
    from stakgraph_ray.pipelines.queries_llm import q_perplexity_buckets

    # rare-token docs score lower (tail); common-token docs higher (head)
    texts = (["common common common"] * 3
             + ["common common middlish"] * 3
             + ["rareone raretwo rarethree"] * 3)
    _docs(tmp_path, texts)
    out = q_perplexity_buckets(str(tmp_path)).take_all()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["mean_logprob"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
