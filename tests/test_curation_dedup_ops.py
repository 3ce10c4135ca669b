"""Unit gates for the paragraph-level exact dedup and the Misra-Gries
heavy-hitter operators: MG compress bound semantics, window-explode edge
cases (short docs, all-duplicate corpus), and end-to-end agreement with a
brute-force reference on a planted corpus."""

import numpy as np
import pyarrow as pa
import pytest

from stakgraph_ray.ops.sketch import mg_compress


def test_mg_compress_under_capacity_is_identity():
    k, c, d = mg_compress(np.array(["a", "b"]), np.array([5, 3]), 8)
    assert list(k) == ["a", "b"] and list(c) == [5, 3] and d == 0


def test_mg_compress_decrements_by_kth_largest():
    keys = np.array(["a", "b", "c", "d", "e"])
    cnts = np.array([10, 8, 4, 4, 1])
    k, c, d = mg_compress(keys, cnts, 2)
    # (capacity+1)-th largest = 4; survivors are counts > 4, decremented by 4
    assert d == 4
    assert list(k) == ["a", "b"] and list(c) == [6, 4]


def test_mg_compress_tie_at_threshold_drops_to_capacity():
    # ties AT the threshold all drop — never returns more than capacity
    keys = np.array(["a", "b", "c", "d"])
    cnts = np.array([5, 5, 5, 9])
    k, c, d = mg_compress(keys, cnts, 2)
    assert len(k) <= 2 and d == 5
    assert list(k) == ["d"] and list(c) == [4]


def test_mg_merge_tree_lower_bounds_and_survival():
    # two batch summaries + a merge: every retained count is a lower bound,
    # and a key with true count > total decrement survives
    rng = np.random.RandomState(7)
    stream = np.concatenate([np.repeat("hot", 500),
                             rng.choice([f"t{i}" for i in range(200)], 2000)])
    rng.shuffle(stream)
    halves = np.array_split(stream, 2)
    total_dec = 0
    merged: dict[str, int] = {}
    for h in halves:
        t, c = np.unique(h, return_counts=True)
        t, c, d = mg_compress(t, c, 16)
        total_dec += d
        for tok, n in zip(t, c):
            merged[tok] = merged.get(tok, 0) + int(n)
    mk = np.array(list(merged))
    mc = np.array(list(merged.values()))
    mk, mc, d = mg_compress(mk, mc, 16)
    total_dec += d
    true_hot = int((stream == "hot").sum())
    assert true_hot > total_dec
    got = dict(zip(mk, mc))
    assert "hot" in got and got["hot"] <= true_hot  # lower bound


def _brute_paragraph_rollup(docs: list[tuple[int, str]], w: int = 10):
    seen: set[str] = set()
    out = {}
    for doc_id, text in sorted(docs):
        toks = text.split(" ")
        paras = [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]
        dups = 0
        for p in paras:
            if p in seen:
                dups += 1
            else:
                seen.add(p)
        out[doc_id] = (len(paras), dups)
    return out


def test_paragraph_dedup_matches_bruteforce_on_planted_corpus(
        ray_session, tmp_path):
    import pyarrow.parquet as pq

    from stakgraph_ray.pipelines.queries_dedup import q_paragraph_dedup

    base = " ".join(f"w{i % 9}" for i in range(25))    # 3 windows (10/10/5)
    docs = [
        (0, base),
        (1, base),                                     # all 3 paras dup doc 0
        (2, " ".join(f"u{i}" for i in range(12))),     # 2 unique windows
        (3, base + " tail extra"),  # first 2 windows dup, 3rd differs
        (4, "short"),                                  # 1 sub-window doc
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }), tmp_path / "documents.parquet")

    got = {r["doc_id"]: (r["n_paras"], r["n_dup"], r["dup_frac"])
           for r in q_paragraph_dedup(str(tmp_path)).take_all()}
    want = _brute_paragraph_rollup(docs)
    assert set(got) == set(want)
    for doc_id, (n_paras, n_dup) in want.items():
        g = got[doc_id]
        assert (g[0], g[1]) == (n_paras, n_dup), (doc_id, g)
        assert g[2] == pytest.approx(round(n_dup / n_paras, 4))
    # the planted expectations themselves
    assert want[1] == (3, 3) and want[3][1] == 2 and want[4] == (1, 0)


def test_paragraph_dedup_first_wins_is_doc_then_window_order(
        ray_session, tmp_path):
    import pyarrow.parquet as pq

    from stakgraph_ray.pipelines.queries_dedup import q_paragraph_dedup

    # same paragraph appears at doc 5 win 2 and doc 2 win 1: the doc-2 copy
    # wins regardless of read/block order
    para = " ".join(f"p{i}" for i in range(10))
    other = " ".join(f"q{i}" for i in range(10))
    pq.write_table(pa.table({
        "doc_id": pa.array([5, 2], pa.int64()),
        "text": pa.array([other + " " + para, para], pa.string()),
    }), tmp_path / "documents.parquet")
    got = {r["doc_id"]: r["n_dup"]
           for r in q_paragraph_dedup(str(tmp_path)).take_all()}
    assert got == {2: 0, 5: 1}


def _write_docs(tmp_path, texts):
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), tmp_path / "documents.parquet")


def test_heavy_hitters_exact_under_compression(ray_session, tmp_path):
    """Vocabulary > capacity forces real MG compression; the skewed head is
    frequent enough that the guarantee certifies and the result equals the
    brute-force top-k."""
    from collections import Counter

    from stakgraph_ray.pipelines.queries_llm import q_heavy_hitters

    rng = np.random.RandomState(11)
    tokens = [f"hot{i}" for i in range(5) for _ in range(400)] + \
        list(rng.choice([f"cold{i}" for i in range(300)], 1500))
    rng.shuffle(tokens)
    texts = [" ".join(tokens[i:i + 50]) for i in range(0, len(tokens), 50)]
    _write_docs(tmp_path, texts)

    got = q_heavy_hitters(str(tmp_path), capacity=64, k=5).take_all()
    cnt = Counter(tokens)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["n"]) for r in got] == want


def test_heavy_hitters_raises_when_uncertifiable(ray_session, tmp_path):
    """A flat distribution against a tiny capacity collapses the summary;
    the query must raise, never silently return an approximate answer."""
    from stakgraph_ray.pipelines.queries_llm import q_heavy_hitters

    tokens = [f"t{i}" for i in range(200)] * 5
    texts = [" ".join(tokens[i:i + 50]) for i in range(0, len(tokens), 50)]
    _write_docs(tmp_path, texts)

    with pytest.raises(RuntimeError, match="MG guarantee"):
        q_heavy_hitters(str(tmp_path), capacity=4, k=10)


def test_weighted_sample_matches_bruteforce_aes(ray_session, tmp_path):
    """A-ES top-n by u^(1/w) (== ln(u)/w order) computed brute-force in
    Python must equal the distributed result exactly, and the heaviest doc
    must rank above a same-u light doc."""
    import math

    from stakgraph_ray.ops.sampling import md5low64
    from stakgraph_ray.pipelines.queries_llm import q_weighted_sample

    texts = ["x" * (10 + 37 * (i % 13) + (1000 if i == 7 else 0))
             for i in range(60)]
    _write_docs(tmp_path, texts)

    M = 1 << 20
    prio = {}
    for i, t in enumerate(texts):
        u = (md5low64(str(i)) % M + 1) / float(M + 1)
        prio[i] = math.log(u) / max(len(t), 1)
    want = sorted(prio, key=lambda i: (-prio[i], i))[:25]

    got = q_weighted_sample(str(tmp_path)).take_all()
    assert [r["doc_id"] for r in got] == want
    assert {r["doc_id"]: r["w"] for r in got} == \
        {i: len(texts[i]) for i in want}


def test_paragraph_rewrite_reconstructs_and_nulls(ray_session, tmp_path):
    """Rewrite property gates: an all-unique doc reconstructs its original
    text byte-exactly (windows partition the token stream), an all-dup doc
    becomes NULL (not empty string, not dropped), and a partial doc keeps
    exactly its non-duplicate windows in window order."""
    from stakgraph_ray.pipelines.queries_dedup import q_paragraph_rewrite

    base = " ".join(f"w{i % 9}" for i in range(25))
    uniq = " ".join(f"u{i}" for i in range(23))
    texts = [base, base, uniq, base + " tail extra bit"]
    _write_docs(tmp_path, texts)

    got = {r["doc_id"]: r for r in q_paragraph_rewrite(str(tmp_path)).take_all()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["clean_text"] == base and got[0]["n_kept"] == 3
    assert got[1]["clean_text"] is None and got[1]["n_kept"] == 0
    assert got[2]["clean_text"] == uniq and got[2]["n_kept"] == 3
    # doc 3: windows 1-2 duplicate doc 0's; window 3 ("w0..w4 tail extra
    # bit") differs from doc 0's third window, so only it survives
    toks = texts[3].split(" ")
    assert got[3]["clean_text"] == " ".join(toks[20:]) and got[3]["n_kept"] == 1


def test_boilerplate_is_per_source_and_thresholded(ray_session, tmp_path):
    """A paragraph in 3/10 docs of source A is boilerplate for those docs;
    the SAME paragraph in 1 doc of source B is not (per-source statistic);
    a paragraph in only 1 doc anywhere never is."""
    import pyarrow.parquet as pq

    from stakgraph_ray.pipelines.queries_dedup import q_boilerplate_paras

    footer = " ".join(f"f{i}" for i in range(10))
    rows = []
    for i in range(10):  # source A: docs 0-9, footer on docs 0,1,2
        body = " ".join(f"a{i}x{j}" for j in range(10))
        rows.append((i, (footer + " " + body) if i < 3 else body, "A"))
    rows.append((10, footer + " " + " ".join(f"b{j}" for j in range(10)), "B"))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }), tmp_path / "documents.parquet")

    got = {r["doc_id"]: r for r in q_boilerplate_paras(str(tmp_path)).take_all()}
    for i in range(3):   # footer docs in A: 1 of 2 windows is boilerplate
        assert got[i]["n_paras"] == 2 and got[i]["n_boiler"] == 1, got[i]
    for i in range(3, 10):
        assert got[i]["n_boiler"] == 0
    # source B has 1 doc: nd=1 for its footer there -> not boilerplate
    assert got[10]["n_boiler"] == 0 and got[10]["n_paras"] == 2
