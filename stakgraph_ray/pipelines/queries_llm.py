"""Training-data curation queries over the documents table: deterministic
corpus splits, stratified sampling, n-gram statistics, the composed
C4/Gopher-style cleaning pipeline, and token-budget subsetting. Each op is
deterministic (md5-keyed) and carries an exact DuckDB oracle.

These are the corpus-curation operators a 100-TB text pipeline runs between
ingestion and training — the same operator families the KG build uses
(pure maps, one-shuffle grouped aggregates, partitioned top-n, distributed
prefix sum), applied to data curation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import adaptive_num_blocks as _anb


def _docs(sf_dir: str, columns):
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=_anb(path))


def _tokens(t: pa.Table, col: str = "text") -> pa.LargeListArray:
    """Whitespace tokens of a string column as one flat LargeListArray —
    the single tokenization used by every curation query (must stay
    consistent with the oracles' ``string_split(text, ' ')``)."""
    text = pc.cast(t[col], pa.large_string())
    text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


# ------------------------------------------------------- hash split

def q_hash_split(sf_dir: str):
    """Deterministic train/val/test split by md5(doc_id) bucket — pure map,
    stable across runs and cluster sizes."""
    from ..ops.sampling import hash_split

    ds = _docs(sf_dir, ["doc_id"])
    return hash_split(ds, "doc_id",
                      [("train", 0.8), ("val", 0.1), ("test", 0.1)])


SQL_HASH_SPLIT = """
with b as (
  select doc_id,
         cast(md5_number_lower(cast(doc_id as varchar)) % 10000 as bigint)
           as bucket
  from documents)
select doc_id,
       case when bucket < 8000 then 'train'
            when bucket < 9000 then 'val'
            else 'test' end as split,
       bucket
from b
"""


# ------------------------------------------------------- stratified sample

def q_stratified_sample(sf_dir: str):
    """Deterministic 10-per-source sample (smallest md5(doc_id) rank per
    group): one hash shuffle + vectorized in-partition top-n."""
    from ..ops.sampling import stratified_sample

    ds = _docs(sf_dir, ["doc_id", "source"])
    return stratified_sample(ds, "source", 10, "doc_id")


SQL_STRATIFIED = """
select doc_id, source from documents
qualify row_number() over (
  partition by source
  order by md5_number_lower(cast(doc_id as varchar)), doc_id) <= 10
"""


# ------------------------------------------------------- n-gram top-k

def q_bigram_topk(sf_dir: str):
    """Corpus-wide top-20 bigrams (count desc, bigram asc): per-batch
    vectorized pair-join + local count, one grouped-aggregate shuffle over
    the bigram vocabulary, per-partition top-k so the final sort moves
    k rows per block."""
    from ..ops.partition import grouped_aggregate

    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        flat = toks.values
        n = len(flat)
        if n < 2:
            return pa.table({"bigram": pa.array([], pa.large_string()),
                             "n_part": pa.array([], pa.int64())})
        # adjacent pairs within the same document: position i pairs with
        # i+1 unless i+1 starts a new doc's token list
        offs = toks.offsets.to_numpy().astype(np.int64)
        valid = np.ones(n - 1, dtype=bool)
        starts = offs[1:-1]  # interior list starts
        valid[starts[(starts > 0) & (starts < n)] - 1] = False
        pairs = pc.binary_join_element_wise(
            flat.slice(0, n - 1), flat.slice(1, n - 1),
            pa.scalar(" ", pa.large_string()))
        pairs = pairs.filter(pa.array(valid))
        g = pa.table({"bigram": pairs}).group_by(["bigram"]) \
            .aggregate([("bigram", "count")])
        return g.rename_columns(["bigram", "n_part"])

    agg = grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                            "bigram", [("n_part", "sum")], ["n"])

    def local_topk(t: pa.Table) -> pa.Table:
        return t.sort_by([("n", "descending"), ("bigram", "ascending")]) \
                .slice(0, 20)

    return agg.map_batches(local_topk, batch_format="pyarrow") \
        .sort(["n", "bigram"], descending=[True, False]).limit(20)


SQL_BIGRAM_TOPK = """
with toks as (select string_split(text, ' ') as s from documents),
pos as (select s, unnest(generate_series(1, len(s) - 1)) as i from toks)
select s[i] || ' ' || s[i + 1] as bigram, count(*) as n
from pos group by 1
order by n desc, bigram
limit 20
"""


# ------------------------------------------------------- decontamination

def _shingle_table(t: pa.Table, k: int = 5) -> pa.Table:
    """(doc_id, text) batch -> (doc_id, g) k-token shingles, vectorized:
    one split, windows materialized as k aligned takes + an element-wise
    join — no per-row Python. A document's text is one row, so all its
    shingles land in one batch and an in-batch distinct is globally
    distinct per (doc_id, g)."""
    toks = _tokens(t)
    flat = toks.values
    offs = toks.offsets.to_numpy().astype(np.int64)
    lens = np.diff(offs)
    wins = np.maximum(lens - (k - 1), 0)
    total = int(wins.sum())
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "g": pa.array([], pa.large_string())})
    if total == 0:
        return empty
    # start index of every window: per-doc arange + doc's flat offset
    idx = np.arange(total, dtype=np.int64)
    excl = np.concatenate(([0], np.cumsum(wins)[:-1]))
    starts = idx - np.repeat(excl, wins) + np.repeat(offs[:-1], wins)
    parts = [pc.take(flat, pa.array(starts + j, pa.int64()))
             for j in range(k)]
    sep = pa.scalar(" ", pa.large_string())
    g = pc.binary_join_element_wise(*parts, sep)
    doc_ids = pc.take(t["doc_id"], pa.array(
        np.repeat(np.arange(len(lens), dtype=np.int64), wins), pa.int64()))
    out = pa.table({"doc_id": pc.cast(doc_ids, pa.int64()), "g": g})
    return out.group_by(["doc_id", "g"]).aggregate([]).select(["doc_id", "g"])


def q_decontaminate(sf_dir: str):
    """Train/benchmark contamination scan: documents sharing >= 1 distinct
    3-token shingle with the deterministic benchmark subset
    (doc_id % 97 == 0), with the count of distinct shared shingles.
    Both sides shingle in a pure map; overlap is ONE hash-partitioned join
    on the shingle key (no broadcast of a corpus-scale shingle set), then a
    grouped count — the shape n-gram decontamination needs at 100 TB."""
    from ..ops.partition import distinct_hp, grouped_aggregate

    ds = _docs(sf_dir, ["doc_id", "text"])
    # pin the shingle set: both branches below consume it, and a lazy
    # branch point would re-run the read + shingling once per branch
    sh = ds.map_batches(lambda t: _shingle_table(t, k=3),
                        batch_format="pyarrow").materialize()

    def _is_bench(t: pa.Table) -> pa.Array:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.array((ids % 97) == 0)

    bench = sh.map_batches(
        lambda t: t.filter(_is_bench(t)).select(["g"])
                   .group_by(["g"]).aggregate([]),
        batch_format="pyarrow")
    bench = distinct_hp(bench, ["g"])
    test = sh.map_batches(lambda t: t.filter(pc.invert(_is_bench(t))),
                          batch_format="pyarrow")
    # distributed semi-join (one keyed shuffle, task-based — no join-actor
    # spin-up); bench shingles are distinct so match multiplicity == 1
    from ..ops.partition import membership_filter_hp

    hits = membership_filter_hp(
        test, bench, "g", keep=True,
        payload_schema=pa.schema([("doc_id", pa.int64()),
                                  ("g", pa.large_string())]))
    partial = hits.map_batches(
        lambda t: t.group_by(["doc_id"]).aggregate([("g", "count")])
                   .rename_columns(["doc_id", "n_part"]),
        batch_format="pyarrow")
    return grouped_aggregate(partial, "doc_id", [("n_part", "sum")],
                             ["n_shared"])


SQL_DECONTAMINATE = """
with toks as (select doc_id, string_split(text, ' ') as s from documents),
pos as (select doc_id, s, unnest(generate_series(1, len(s) - 2)) as i
        from toks),
sh as (select distinct doc_id,
              s[i] || ' ' || s[i+1] || ' ' || s[i+2] as g
       from pos),
bsh as (select distinct g from sh where doc_id % 97 = 0)
select t.doc_id, count(*) as n_shared
from sh t join bsh using (g)
where t.doc_id % 97 <> 0
group by t.doc_id
"""


# ------------------------------------------------------- cleaning pipeline

def q_clean_corpus(sf_dir: str):
    """The composed curation pipeline: language gate (stopword evidence) ->
    quality gates (token count, stopword ratio) -> exact near-source dedup
    (md5 first-wins). Pure map until ONE grouped-aggregate shuffle over the
    content-hash vocabulary; no driver materialization."""
    from ..ops.partition import grouped_aggregate

    ds = _docs(sf_dir, ["doc_id", "text"])

    def gate_and_fingerprint(t: pa.Table) -> pa.Table:
        import hashlib

        toks = _tokens(t)
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(["the", "a"])) \
            .to_numpy(zero_copy_only=False)
        n = t.num_rows
        stops = np.bincount(parent, weights=is_stop.astype("float64"),
                            minlength=n)
        keep = (stops > 0) & (n_tokens >= 5) & (n_tokens <= 2000) & \
               (stops / np.maximum(n_tokens, 1) <= 0.5)
        kept = t.filter(pa.array(keep))
        md5 = pa.array([hashlib.md5(x.encode()).hexdigest()
                        for x in kept["text"].to_pylist()], pa.string())
        return pa.table({
            "text_md5": md5,
            "doc_id": pc.cast(kept["doc_id"], pa.int64()),
            "n_tokens": pa.array(n_tokens[keep], pa.int64()),
            "n_copies": pa.array(np.ones(kept.num_rows, np.int64)),
        })

    partial = ds.map_batches(gate_and_fingerprint, batch_format="pyarrow")
    # pre-combine per batch before the shuffle
    partial = partial.map_batches(
        lambda t: t.group_by(["text_md5"]).aggregate(
            [("doc_id", "min"), ("n_tokens", "min"), ("n_copies", "sum")])
        .rename_columns(["text_md5", "doc_id", "n_tokens", "n_copies"]),
        batch_format="pyarrow")
    agg = grouped_aggregate(partial, "text_md5",
                            [("doc_id", "min"), ("n_tokens", "min"),
                             ("n_copies", "sum")],
                            ["doc_id", "n_tokens", "n_copies"])
    return agg.map_batches(lambda t: t.drop_columns(["text_md5"]),
                           batch_format="pyarrow")


SQL_CLEAN_CORPUS = """
with f as (
  select doc_id, text,
         len(string_split(text, ' ')) as n_tokens,
         len(list_filter(string_split(text, ' '), x -> x in ('the', 'a')))
           as n_stop
  from documents),
g as (select * from f
      where n_stop > 0 and n_tokens between 5 and 2000
        and n_stop / cast(n_tokens as double) <= 0.5)
select min(doc_id) as doc_id, min(n_tokens) as n_tokens,
       count(*) as n_copies
from g group by md5(text)
"""


# ------------------------------------------------------- token budget

def q_token_budget(sf_dir: str):
    """Deterministic token-budget subset: keep documents in doc_id order
    while the inclusive running token total stays <= 10,000 — distributed
    two-pass prefix sum (per-block partials, scalar offsets), driver holds
    O(blocks) scalars."""
    from ..ops.sampling import token_budget_subset

    ds = _docs(sf_dir, ["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    return token_budget_subset(counted, "doc_id", "n_tokens", 10_000.0)


SQL_TOKEN_BUDGET = """
with t as (select doc_id, len(string_split(text, ' ')) as n_tokens
           from documents)
select doc_id, n_tokens from t
qualify sum(n_tokens) over (order by doc_id) <= 10000
"""


# ------------------------------------------------------- bigram PMI

def q_bigram_pmi(sf_dir: str):
    """Pointwise mutual information of the corpus's top-20 bigrams:
    collocation scoring, the association-strength analog of the reference's
    term-weighting. Three bounded stages — (1) the bigram-count shuffle
    (same partial as llm_bigram_topk) keeps only the top-20 driver-side
    (k rows per partition cross the final sort), (2) unigram counts are
    computed ONLY for the ≤40 words those bigrams mention (per-batch is_in
    filter + low-card combiner — never a vocab-scale exchange), (3) corpus
    token/pair totals are two scalar count partials. The ≤20-row PMI table
    is assembled on the driver with math.log (glibc libm, the same ln DuckDB
    binds), so values match the oracle bit-for-bit before rounding."""
    import math

    from ..ops.partition import grouped_aggregate, low_card_aggregate
    from ..util import round_half_away

    ds = _docs(sf_dir, ["text"]).materialize()  # 3 consumers share one scan

    def bigram_partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        flat = toks.values
        n = len(flat)
        empty = pa.table({"w1": pa.array([], pa.large_string()),
                          "w2": pa.array([], pa.large_string()),
                          "n_part": pa.array([], pa.int64())})
        if n < 2:
            return empty
        offs = toks.offsets.to_numpy().astype(np.int64)
        valid = np.ones(n - 1, dtype=bool)
        starts = offs[1:-1]
        valid[starts[(starts > 0) & (starts < n)] - 1] = False
        vmask = pa.array(valid)
        g = pa.table({"w1": flat.slice(0, n - 1).filter(vmask),
                      "w2": flat.slice(1, n - 1).filter(vmask)}) \
            .group_by(["w1", "w2"]).aggregate([("w1", "count")])
        return g.rename_columns(["w1", "w2", "n_part"])

    agg = grouped_aggregate(ds.map_batches(bigram_partial, batch_format="pyarrow"),
                            ["w1", "w2"], [("n_part", "sum")], ["n"])
    top = pa.Table.from_pylist(
        agg.map_batches(
            lambda t: t.sort_by([("n", "descending"), ("w1", "ascending"),
                                 ("w2", "ascending")]).slice(0, 20),
            batch_format="pyarrow")
        .sort(["n", "w1", "w2"], descending=[True, False, False]).limit(20)
        .take_all())

    words = sorted(set(top["w1"].to_pylist()) | set(top["w2"].to_pylist()))
    wset = pa.array(words, pa.large_string())

    def totals(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        # fill_null BEFORE astype: a null text row's NaN length would
        # astype(int64) into INT64_MIN and poison the corpus totals
        lens = pc.fill_null(pc.list_value_length(toks), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.values
        kept = flat.filter(pc.is_in(flat, value_set=wset))
        g = pa.table({"w": kept}).group_by(["w"]).aggregate([("w", "count")])
        # totals ride along as a sentinel key ("" is never a split token
        # of interest — it is excluded from `words` membership by is_in)
        return pa.table({
            "w": pa.concat_arrays([g["w"].combine_chunks(),
                                   pa.array(["\x00uni", "\x00big"], pa.large_string())]),
            "c": pa.concat_arrays([pc.cast(g["w_count"], pa.int64()).combine_chunks(),
                                   pa.array([int(lens.sum()),
                                             int(np.maximum(lens - 1, 0).sum())],
                                            pa.int64())]),
        })

    counts = {r["w"]: r["c"]
              for r in low_card_aggregate(
                  ds.map_batches(totals, batch_format="pyarrow"),
                  "w", [("c", "sum")], ["c"]).take_all()}
    n_uni = float(counts["\x00uni"])
    n_big = float(counts["\x00big"])

    rows = sorted(zip(top["w1"].to_pylist(), top["w2"].to_pylist(),
                      top["n"].to_pylist()), key=lambda r: (-r[2], r[0], r[1]))
    pmi = [round_half_away(
               math.log((float(n) * n_uni * n_uni) /
                        (float(counts[w1]) * float(counts[w2]) * n_big)), 4)
           for w1, w2, n in rows]
    return pa.table({
        "bigram": pa.array([f"{w1} {w2}" for w1, w2, _ in rows], pa.string()),
        "n": pa.array([n for _, _, n in rows], pa.int64()),
        "pmi": pa.array(pmi, pa.float64()),
    })


SQL_BIGRAM_PMI = """
with toks as (select string_split(text, ' ') as s from documents),
n_uni as (select cast(sum(len(s)) as double) as c from toks),
n_big as (select cast(sum(greatest(len(s) - 1, 0)) as double) as c from toks),
pos as (select s, unnest(generate_series(1, len(s) - 1)) as i from toks),
big as (select s[i] as w1, s[i + 1] as w2 from pos),
topb as (select w1, w2, count(*) as n from big group by 1, 2
         order by n desc, w1, w2 limit 20),
uc as (select w, cast(count(*) as double) as c
       from (select unnest(s) as w from toks)
       where w in (select w1 from topb union select w2 from topb)
       group by w)
select t.w1 || ' ' || t.w2 as bigram, t.n,
       round(ln((cast(t.n as double) * nu.c * nu.c) / (u1.c * u2.c * nb.c)),
             4) as pmi
from topb t
join uc u1 on t.w1 = u1.w
join uc u2 on t.w2 = u2.w
cross join n_uni nu cross join n_big nb
order by t.n desc, bigram
"""


# ------------------------------------------------------- TF-IDF

def q_tfidf_top_terms(sf_dir: str):
    """Top-5 TF-IDF terms per document — the classic corpus-weighting op
    (the relevance analog of the reference's fulltext scoring,
    mcp/src/graph/neo4j.ts:349-369). Shape: one tokenize map emits the
    (doc_id, term, tf) table (a document is one row, so in-batch counts are
    globally exact); df is ONE vocab-keyed grouped aggregate over that
    table; tf⋈df is a co-group hash join on the term key (vocab-scale, not
    corpus-scale); ranking is the window top-n — only 5 rows per doc
    survive its partition. N comes from parquet metadata (no scan)."""
    import pyarrow.parquet as pq

    from ..ops.partition import cogroup_join_hp, grouped_aggregate
    from ..ops.relational import top_n_per_group

    n_docs = float(pq.ParquetFile(f"{sf_dir}/documents.parquet")
                   .metadata.num_rows)
    ds = _docs(sf_dir, ["doc_id", "text"])

    def tf_rows(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        flat = toks.values
        parent = pc.list_parent_indices(toks)
        doc = pc.take(t["doc_id"], parent)
        g = pa.table({"doc_id": pc.cast(doc, pa.int64()),
                      "term": pc.cast(flat, pa.string())}) \
            .group_by(["doc_id", "term"]).aggregate([("term", "count")])
        return g.rename_columns(["doc_id", "term", "tf"])

    tf = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    df = grouped_aggregate(tf, "term", [("tf", "count")], ["df"])
    joined = cogroup_join_hp(
        tf, df, "term",
        pa.schema([("term", pa.string()), ("doc_id", pa.int64()),
                   ("tf", pa.int64())]),
        pa.schema([("term", pa.string()), ("df", pa.int64())]))

    def score(t: pa.Table) -> pa.Table:
        import math

        tf_v = pc.cast(t["tf"], pa.float64()).to_numpy(zero_copy_only=False)
        df_v = pc.cast(t["df"], pa.float64()).to_numpy(zero_copy_only=False)
        # same expression as the oracle: tf * ln(N / df). ln via math.log
        # over the (few) distinct df values — glibc libm, the ln DuckDB
        # binds; np.log's SIMD path drifts 1 ulp on ~20% of inputs, enough
        # to flip a rounded 4th decimal or swap an rn=5/rn=6 rank
        u, inv = np.unique(df_v, return_inverse=True)
        ln_u = np.array([math.log(n_docs / x) for x in u], dtype=np.float64)
        return t.append_column("tfidf", pa.array(tf_v * ln_u[inv], pa.float64()))

    scored = joined.map_batches(score, batch_format="pyarrow")
    top = top_n_per_group(scored, "doc_id",
                          [("tfidf", "descending"), ("term", "ascending")], 5)

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        v = t["tfidf"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": t["doc_id"], "term": t["term"], "tf": t["tf"],
            "df": t["df"],
            "tfidf": pa.array(round_half_away(v, 4), pa.float64()),
            "rn": t["rn"],
        })

    return top.map_batches(finish, batch_format="pyarrow")


SQL_TFIDF = """
with toks as (select doc_id, unnest(string_split(text, ' ')) as term
              from documents),
tf as (select doc_id, term, count(*) as tf from toks group by 1, 2),
df as (select term, cast(count(*) as bigint) as df from tf group by term),
n as (select cast(count(*) as double) as n from documents)
select doc_id, term, tf, df,
       round(tf * ln(n.n / df), 4) as tfidf,
       row_number() over (partition by doc_id
                          order by tf * ln(n.n / df) desc, term) as rn
from tf join df using (term) cross join n
qualify rn <= 5
"""


def q_repetition_filter(sf_dir: str):
    """Repetition-based quality gate (the Gopher/MassiveText duplicate
    n-gram signal): per document, the fraction of bigrams that are
    repeats — 1 - distinct/total — surfacing boilerplate/spam docs above
    0.05. Pure per-batch map (bigrams never leave the worker): consecutive
    same-doc token pairs via parent indices, one pandas groupby
    count+nunique per batch. The fraction is one exact integer-ratio
    division + subtraction (bit-exact vs SQL)."""
    import pandas as pd

    ds = _docs(sf_dir, ["doc_id", "text"])

    def rep(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        out_schema = pa.schema([("doc_id", pa.int64()),
                                ("n_bigrams", pa.int64()),
                                ("dup_frac", pa.float64())])
        if len(flat) < 2:
            return out_schema.empty_table()
        same = parent[1:] == parent[:-1]
        bg_parent = parent[1:][same]
        bg = pd.Series(flat[:-1][same]).str.cat(
            pd.Series(flat[1:][same]), sep=" ")
        g = pd.DataFrame({"p": bg_parent, "bg": bg.to_numpy()}) \
            .groupby("p")["bg"].agg(["count", "nunique"])
        nb = g["count"].to_numpy(np.int64)
        nd = g["nunique"].to_numpy(np.int64)
        dup = 1.0 - nd.astype(np.float64) / nb.astype(np.float64)
        keep = dup > 0.05
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[
            g.index.to_numpy()][keep]
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_bigrams": pa.array(nb[keep], pa.int64()),
            "dup_frac": pa.array(dup[keep], pa.float64()),
        })

    return ds.map_batches(rep, batch_format="pyarrow")


SQL_REPETITION = """
with s as (select doc_id, string_split(text, ' ') as toks from documents),
t as (select doc_id, generate_subscripts(toks, 1) as i, unnest(toks) as tok
      from s),
bg as (select x.doc_id, x.tok || ' ' || y.tok as bg
       from t x join t y on x.doc_id = y.doc_id and y.i = x.i + 1),
agg as (select doc_id, cast(count(*) as bigint) as n_bigrams,
               cast(count(distinct bg) as bigint) as n_distinct
        from bg group by doc_id)
select doc_id, n_bigrams,
       1.0 - cast(n_distinct as double) / cast(n_bigrams as double) as dup_frac
from agg
where 1.0 - cast(n_distinct as double) / cast(n_bigrams as double) > 0.05
"""


def q_domain_mix(sf_dir: str):
    """Corpus data-mix report (the pretraining mixing table): per source,
    document share and token share of the whole corpus. One per-batch
    combiner over (source, doc-count, token-count) — at most |sources| rows
    per block cross the driver merge — then exact integer-ratio shares
    (bit-exact division in double)."""
    from ..ops.partition import low_card_aggregate

    ds = _docs(sf_dir, ["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({"source": t["source"], "n_tokens": n_tokens})

    agg = low_card_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), "source",
        [(None, "count_all"), ("n_tokens", "sum")], ["n_docs", "n_tokens"])

    def shares(t: pa.Table) -> pa.Table:
        nd = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        nt = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "source": t["source"],
            "n_docs": t["n_docs"], "n_tokens": t["n_tokens"],
            "doc_share": pa.array(nd / nd.sum(), pa.float64()),
            "token_share": pa.array(nt / nt.sum(), pa.float64()),
        })

    # the combiner output is |sources|-bounded: the share denominators are
    # exact totals because every group is present in this single table
    return agg.map_batches(shares, batch_format="pyarrow", batch_size=None)


SQL_DOMAIN_MIX = """
with a as (select source, count(*) as n_docs,
                  cast(sum(len(string_split(text, ' '))) as bigint) as n_tokens
           from documents group by source)
select source, n_docs, n_tokens,
       cast(n_docs as double) / (select sum(n_docs) from a) as doc_share,
       cast(n_tokens as double) / (select sum(n_tokens) from a) as token_share
from a
"""


# ------------------------------------------------------- URL curation gate

def q_url_filter(sf_dir: str):
    """URL/domain curation gate over the pages corpus: domain-blocklist
    drop (the blocklist is a small driver artifact broadcast into the
    filter — here derived deterministically as the two lexicographically
    smallest hosts so the oracle can reproduce it), minimum-content gate
    (≥ 60 text chars) and language gate (en only). Pure vectorized map —
    the shape of a C4-style URL/domain cleaning pass."""
    import ray.data as rd

    # derive the blocklist distributed: per-batch distinct + min-2 partials
    # (each block contributes at most 2 rows to the driver — O(blocks)
    # driver state, never the full source column)
    def min2(t: pa.Table) -> pa.Table:
        u = pc.unique(t["source"])
        u = u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u
        return pa.table({"source": u.sort().slice(0, 2)})

    parts = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"]) \
        .map_batches(min2, batch_format="pyarrow").take_all()
    blocked = sorted({r["source"] for r in parts})[:2]
    bset = pa.array([f"{s}.example.org" for s in blocked], pa.large_string())

    from ..functions.textutils import host_of_url_column

    from .queries_kg import pages_cached

    ds = pages_cached(sf_dir)

    def gate(t: pa.Table) -> pa.Table:
        host = pc.cast(host_of_url_column(
            t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray)
            else t["url"]), pa.large_string())
        n_chars = pc.cast(pc.utf8_length(t["text"]), pa.int64())
        keep = pc.and_(
            pc.and_(pc.invert(pc.is_in(host, value_set=bset)),
                    pc.greater_equal(n_chars, pa.scalar(60, pa.int64()))),
            pc.equal(t["lang"], pa.scalar("en")))
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        kept = t.filter(keep)
        host_k = host.filter(keep)
        return pa.table({
            "url": pc.cast(kept["url"], pa.string()),
            "host": pc.cast(host_k, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(kept["text"]), pa.int64()),
        })

    return ds.map_batches(gate, batch_format="pyarrow")


def _sql_url_filter() -> str:
    from .queries_kg import URL_SQL

    return f"""
with b as (select source || '.example.org' as host
           from (select distinct source from documents
                 order by source limit 2)),
p as (select {URL_SQL} as url, source || '.example.org' as host,
             length(text) as n_chars, lang
      from documents)
select url, host, n_chars from p
where host not in (select host from b)
  and n_chars >= 60 and lang = 'en'
"""


SQL_URL_FILTER = _sql_url_filter()


LLM_QUERIES = {
    "llm_hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "llm_stratified_sample": (q_stratified_sample, SQL_STRATIFIED),
    "llm_bigram_topk": (q_bigram_topk, SQL_BIGRAM_TOPK),
    "llm_clean_corpus": (q_clean_corpus, SQL_CLEAN_CORPUS),
    "llm_repetition_filter": (q_repetition_filter, SQL_REPETITION),
    "llm_domain_mix": (q_domain_mix, SQL_DOMAIN_MIX),
    "llm_decontaminate": (q_decontaminate, SQL_DECONTAMINATE),
    "llm_token_budget": (q_token_budget, SQL_TOKEN_BUDGET),
    "llm_bigram_pmi": (q_bigram_pmi, SQL_BIGRAM_PMI),
    "llm_url_filter": (q_url_filter, SQL_URL_FILTER),
    "llm_tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF),
}


def q_token_entropy(sf_dir: str):
    """Per-document unigram Shannon entropy (nats) — the
    repetitiveness/quality signal next to the repetition gate: H = -Σ p·ln p
    over the doc's token distribution. Pure map, no shuffle (a document's
    distribution lives inside its row): whole-batch vectorized kernel —
    split_pattern -> factorize -> one np.unique over (doc, code) keys ->
    bincount-reduced entropy. ln goes through math.log per DISTINCT
    probability (repo float-parity convention: np.log drifts 1 ulp vs
    DuckDB's libm ln on ~20% of inputs)."""
    import math

    import pandas as pd

    ds = _docs(sf_dir, ["doc_id", "text"])

    def entropy(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "entropy": pa.array([], pa.float64())})
        toks = _tokens(t)
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = pc.list_flatten(toks)
        codes, _ = pd.factorize(flat.to_numpy(zero_copy_only=False))
        vocab = int(codes.max()) + 1 if len(codes) else 1
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = doc_idx * np.int64(vocab) + codes
        uniq, cnt = np.unique(key, return_counts=True)
        d = uniq // vocab
        p = cnt.astype(np.float64) / lens[d].astype(np.float64)
        logs = {v: math.log(v) for v in np.unique(p)}
        lp = pd.Series(p).map(logs).to_numpy(dtype=np.float64)
        h = -np.bincount(d, weights=p * lp, minlength=n)
        from ..util import round_half_away

        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_tokens": pa.array(lens),
            "entropy": pa.array(round_half_away(h, 4), pa.float64()),
        })

    return ds.map_batches(entropy, batch_format="pyarrow")


SQL_TOKEN_ENTROPY = """
with tok as (select doc_id, unnest(string_split(text, ' ')) as t
             from documents),
c as (select doc_id, t, count(*) as c from tok group by 1, 2),
n as (select doc_id, cast(sum(c) as bigint) as n from c group by 1)
select c.doc_id, n.n as n_tokens,
       round(-sum((cast(c.c as double) / n.n) * ln(cast(c.c as double) / n.n)),
             4) as entropy
from c join n using (doc_id)
group by c.doc_id, n.n
"""

LLM_QUERIES["llm_token_entropy"] = (q_token_entropy, SQL_TOKEN_ENTROPY)


def q_pack_sequences(sf_dir: str):
    """GPT-style sequence packing: concatenate documents in doc_id order
    and split into fixed 2048-token training bins (docs may span bins) —
    the standard pretraining batch-packing layout. Per doc: token count
    and its (start_bin, end_bin) span. Scale shape (ops/relational.py
    global_running_sum): one combiner pass reduces per-bucket token totals
    to the driver (adaptive bucket width caps the carry state at 64 Ki
    entries whatever the id range or sparsity — never the corpus),
    carry-ins broadcast back, ONE balanced keyed shuffle computes the
    exact int64 global prefix — no global sort, no driver
    materialization. Bins are
    contiguous in doc_id order, so a 256-node writer can emit per-bin
    shards independently."""
    from ..ops.relational import global_running_sum

    budget = 2048
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        n = pc.cast(pc.list_value_length(_tokens(t)), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_tokens": n})

    # id bounds from the parquet footer (no scan): skips the adaptive
    # width's min/max pass, which would re-run the tokenize map
    from ..util import parquet_col_bounds

    bounds = parquet_col_bounds(f"{sf_dir}/documents.parquet", "doc_id")
    r = global_running_sum(ds.map_batches(prep, batch_format="pyarrow"),
                           "doc_id", "n_tokens", out_col="_run",
                           id_bounds=bounds)

    def bins(t: pa.Table) -> pa.Table:
        run = t["_run"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        off = run - n
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
            "start_bin": pa.array(off // budget, pa.int64()),
            "end_bin": pa.array((off + n - 1) // budget, pa.int64()),
        })

    return r.map_batches(bins, batch_format="pyarrow")


# Pure-integer mirror: the window prefix sum IS the packing (n >= 1 always
# — string_split of any non-null string yields at least one token — so
# end_bin >= start_bin and integer division agrees exactly).
SQL_PACK_SEQUENCES = """
with t as (select doc_id, len(string_split(text, ' ')) as n
           from documents where text is not null),
o as (select doc_id, n,
        coalesce(sum(n) over (order by doc_id
          rows between unbounded preceding and 1 preceding), 0) as off
      from t)
select doc_id, cast(n as bigint) as n_tokens,
       cast(off // 2048 as bigint) as start_bin,
       cast((off + n - 1) // 2048 as bigint) as end_bin
from o
"""

LLM_QUERIES["llm_pack_sequences"] = (q_pack_sequences, SQL_PACK_SEQUENCES)


def q_heavy_hitters(sf_dir: str, capacity: int = 512, k: int = 10):
    """Exact corpus top-10 tokens WITHOUT a corpus-wide grouped shuffle:
    Misra-Gries candidate pass + exact recount (the bounded-memory heavy-
    hitter plan — at 100 TB the token vocabulary is corpus-scale, so
    llm_bigram_topk's hash-partitioned exchange moves every distinct token;
    this plan moves O(blocks x capacity) sketch rows to the driver and one
    broadcast-filtered recount instead).

      pass 1 (pure map): per-batch exact counts -> mg_compress(512); each
        partial also emits one null-token row carrying its decrement so the
        driver can bound the total underestimate D without batch identity;
      driver merge: sum partial counters (<= blocks x 513 rows), compress
        once more — candidates provably include every token whose true
        count exceeds D (Agarwal et al., PODS 2012 mergeable summaries);
      pass 2 (pure map): recount ONLY the candidate set exactly (broadcast
        is_in filter, <= capacity rows per block to the driver) and verify
        the guarantee: the 10th exact count must be >= D, else the result
        could be inexact (raises — never silently approximate).

    Output = exact top-10 (count desc, token asc), identical to the SQL
    grouped count."""
    import pandas as pd
    import ray.data as rd

    from ..ops.sketch import mg_compress

    CAP, K = capacity, k
    ds = _docs(sf_dir, ["text"])

    def partial(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_tokens(t))
        toks, cnts = np.unique(flat.to_numpy(zero_copy_only=False),
                               return_counts=True)
        toks, cnts, dec = mg_compress(toks, cnts.astype(np.int64), CAP)
        return pa.table({
            "token": pa.array(np.append(toks, [None]), pa.large_string()),
            "n_part": pa.array(np.append(cnts, [dec]), pa.int64()),
        })

    parts = pa.Table.from_pylist(
        ds.map_batches(partial, batch_format="pyarrow").take_all())
    tok = parts["token"].to_numpy(zero_copy_only=False)
    cnt = parts["n_part"].to_numpy(zero_copy_only=False).astype(np.int64)
    null = pd.isna(tok)
    D = int(cnt[null].sum())
    merged = pd.Series(cnt[~null]).groupby(tok[~null]).sum()
    cand, _, dec = mg_compress(merged.index.to_numpy(),
                               merged.to_numpy(), CAP)
    D += dec
    cand_set = pa.array(np.sort(cand), pa.large_string())

    def recount(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_tokens(t))
        flat = flat.filter(pc.is_in(flat, value_set=cand_set))
        toks, cnts = np.unique(flat.to_numpy(zero_copy_only=False),
                               return_counts=True)
        return pa.table({"token": pa.array(toks, pa.large_string()),
                         "n_part": pa.array(cnts, pa.int64())})

    rows = ds.map_batches(recount, batch_format="pyarrow").take_all() \
        if len(cand) else []
    if rows:
        ex = pa.Table.from_pylist(rows)
        exact = pd.Series(ex["n_part"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)) \
            .groupby(ex["token"].to_numpy(zero_copy_only=False)).sum() \
            .reset_index()
        exact.columns = ["token", "n"]
    else:
        # a collapsed summary (flat distribution vs capacity) reaches here
        # with D > 0 and fails the certification below, never returns empty
        exact = pd.DataFrame({"token": pd.array([], dtype=object),
                              "n": pd.array([], dtype=np.int64)})
    exact = exact.sort_values(["n", "token"], ascending=[False, True],
                              kind="mergesort").head(K)
    # a non-candidate's true count can be as large as D: the k-th exact
    # count must dominate it, and a short result with D > 0 means the
    # summary collapsed (flat distribution vs capacity) — never silently
    # return an uncertified answer
    if D > 0 and (len(exact) < K or int(exact["n"].iloc[K - 1]) < D):
        kth = int(exact["n"].iloc[K - 1]) if len(exact) >= K else 0
        raise RuntimeError(
            f"MG guarantee violated: kth count {kth} < dropped-mass "
            f"bound {D}; raise capacity")
    return rd.from_arrow(pa.table({
        "token": pa.array(exact["token"].to_numpy(), pa.string()),
        "n": pa.array(exact["n"].to_numpy(), pa.int64()),
    }))


SQL_HEAVY_HITTERS = """
select token, count(*) as n
from (select unnest(string_split(text, ' ')) as token from documents)
group by token
order by n desc, token
limit 10
"""

LLM_QUERIES["llm_heavy_hitters"] = (q_heavy_hitters, SQL_HEAVY_HITTERS)


def q_weighted_sample(sf_dir: str, n: int = 25):
    """Weighted sampling without replacement, weight = document length
    (Efraimidis-Spirakis A-ES: key_i = u_i^(1/w_i), keep the n largest —
    the data-mixing primitive for 'sample a budget proportional to bytes').
    Deterministic and cluster-size-invariant: u_i is an md5-derived uniform
    of doc_id, and the order statistic is taken on ln(u)/w (monotone in the
    A-ES key; ln via math.log over distinct values = DuckDB's libm ln, and
    IEEE division makes both sides bit-identical, repo float-parity
    convention). Plan: pure map -> per-block top-n partial -> n-row global
    sort; the driver never sees more than blocks x n rows."""
    import math

    from ..ops.sampling import md5low64

    M = 1 << 20
    ds = _docs(sf_dir, ["doc_id", "text"])

    def prio(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        u = np.fromiter(((md5low64(str(v)) % M + 1) / float(M + 1)
                         for v in ids), dtype=np.float64, count=t.num_rows)
        logs = {v: math.log(v) for v in np.unique(u)}
        import pandas as pd

        lu = pd.Series(u).map(logs).to_numpy(dtype=np.float64)
        w = np.maximum(pc.utf8_length(t["text"]).to_numpy(
            zero_copy_only=False).astype(np.int64), 1)
        out = pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "w": pa.array(w, pa.int64()),
            "priority": pa.array(lu / w, pa.float64()),
        })
        return out.sort_by([("priority", "descending"),
                            ("doc_id", "ascending")]).slice(0, n)

    return ds.map_batches(prio, batch_format="pyarrow") \
        .sort(["priority", "doc_id"], descending=[True, False]).limit(n) \
        .map_batches(lambda t: t.drop_columns(["priority"]),
                     batch_format="pyarrow")


SQL_WEIGHTED_SAMPLE = """
select doc_id, w from (
  select doc_id, cast(greatest(length(text), 1) as bigint) as w,
         ln((md5_number_lower(cast(doc_id as varchar)) % 1048576 + 1)
            / 1048577.0) / greatest(length(text), 1) as priority
  from documents)
order by priority desc, doc_id
limit 25
"""

LLM_QUERIES["llm_weighted_sample"] = (q_weighted_sample, SQL_WEIGHTED_SAMPLE)


def q_quality_logit(sf_dir: str):
    """Deterministic linear quality classifier (the fasttext/logistic-score
    stand-in every curation pipeline runs): per doc, a fixed-weight linear
    score over vectorized features (token count, stopword ratio) and a
    pass flag. Pure map, no shuffle; the score is evaluated in the SAME
    operation order as the SQL oracle (left-assoc sum of products over
    identical doubles), so z and the z > 0 gate are bit-exact — no
    model-randomness, no float boundary."""
    from ..util import round_half_away

    ds = _docs(sf_dir, ["doc_id", "text"])
    stopset = pa.array(sorted(["the", "a"]))

    def score(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        n_tok = np.asarray(toks.value_lengths(), dtype=np.int64)
        flat = toks.flatten()
        is_stop = pc.is_in(flat, value_set=stopset) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        parent = np.repeat(np.arange(t.num_rows), n_tok)
        stops = np.bincount(parent, weights=is_stop, minlength=t.num_rows)
        sr = stops / np.maximum(n_tok, 1)
        z = (-0.1 + 0.004 * n_tok) - 1.5 * sr  # order pinned to the oracle
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "z": pa.array(round_half_away(z, 4), pa.float64()),
            "quality_pass": pa.array(z > 0.0)})

    return ds.map_batches(score, batch_format="pyarrow")


SQL_QUALITY_LOGIT = """
with f as (select doc_id,
                  cast(len(string_split(text, ' ')) as bigint) as n_tokens,
                  len(list_filter(string_split(text, ' '),
                                  x -> x in ('the', 'a')))
                    / cast(len(string_split(text, ' ')) as double) as sr
           from documents)
select doc_id, n_tokens,
       round((cast(-0.1 as double) + cast(0.004 as double) * n_tokens)
             - cast(1.5 as double) * sr, 4) as z,
       ((cast(-0.1 as double) + cast(0.004 as double) * n_tokens)
        - cast(1.5 as double) * sr) > 0.0 as quality_pass
from f
"""

LLM_QUERIES["llm_quality_logit"] = (q_quality_logit, SQL_QUALITY_LOGIT)


def q_ngram_novelty(sf_dir: str):
    """Corpus novelty scoring (the dedup-adjacent curation signal): per
    doc, the fraction of its DISTINCT 3-token shingles whose global FIRST
    occurrence (min doc_id) is this doc — 1.0 = all-new content, 0.0 =
    everything seen earlier. Two keyed exchanges, both on bounded keys:
    (1) shingle-hash partition, where each shingle's min doc and the
    per-occurrence novelty mark are computed with an in-partition group_by
    + join (no corpus-scale broadcast); (2) doc-keyed rollup of the
    (novel, total) partials. The shape RefinedWeb-style first-seen
    filtering needs at 100 TB."""
    from ..ops.partition import grouped_aggregate, partitioned_apply

    ds = _docs(sf_dir, ["doc_id", "text"])
    sh = ds.map_batches(lambda t: _shingle_table(t, k=3),
                        batch_format="pyarrow")

    def mark(t: pa.Table) -> pa.Table:
        firsts = t.group_by(["g"]).aggregate([("doc_id", "min")]) \
            .rename_columns(["g", "first_doc"])
        j = t.join(firsts, keys=["g"])
        novel = pc.cast(pc.equal(j["doc_id"], j["first_doc"]), pa.int64())
        p = pa.table({"doc_id": j["doc_id"], "novel": novel}) \
            .group_by(["doc_id"]).aggregate([("novel", "sum"),
                                             ("novel", "count")])
        return p.rename_columns(["doc_id", "n_novel", "n_shingles"])

    parts = partitioned_apply(sh, "g", mark)
    out = grouped_aggregate(parts, "doc_id",
                            [("n_novel", "sum"), ("n_shingles", "sum")],
                            ["n_novel", "n_shingles"])

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        novel = t["n_novel"].to_numpy(zero_copy_only=False)
        total = t["n_shingles"].to_numpy(zero_copy_only=False)
        return t.append_column("novelty", pa.array(
            round_half_away(novel / total.astype(np.float64), 4),
            pa.float64()))

    return out.map_batches(finish, batch_format="pyarrow")


SQL_NGRAM_NOVELTY = """
with toks as (select doc_id, string_split(text, ' ') as s from documents),
pos as (select doc_id, s, unnest(generate_series(1, len(s) - 2)) as i
        from toks),
sh as (select distinct doc_id,
              s[i] || ' ' || s[i+1] || ' ' || s[i+2] as g
       from pos),
f as (select g, min(doc_id) as first_doc from sh group by 1)
select s.doc_id,
       count(*) filter (where f.first_doc = s.doc_id) as n_novel,
       count(*) as n_shingles,
       round(count(*) filter (where f.first_doc = s.doc_id)
             / cast(count(*) as double), 4) as novelty
from sh s join f using (g)
group by s.doc_id
"""

LLM_QUERIES["txt_ngram_novelty"] = (q_ngram_novelty, SQL_NGRAM_NOVELTY)


def q_domain_temperature(sf_dir: str):
    """Temperature-scaled domain mixture (the alpha=0.5 up-sampling rule
    from multilingual/multi-domain LM training): per source, the sampling
    ratio sqrt(n_d)/sqrt(max_d n_d) and the per-10k target count. Source
    is low-cardinality, so the counts are per-batch combiner partials
    (low_card_aggregate — no shuffle); sqrt is IEEE-exactly-rounded, and
    the ratio divides two such doubles, so parity holds bit-for-bit with
    no ordered-float-sum hazard (the denominator is a MAX, not a SUM)."""
    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    ds = _docs(sf_dir, ["source"])
    counts = low_card_aggregate(ds, ["source"], [(None, "count_all")],
                                ["n_docs"])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        mx = float(n.max())
        ratio = np.sqrt(n) / np.sqrt(mx)
        return pa.table({
            "source": t["source"], "n_docs": t["n_docs"],
            "temp_ratio": pa.array(round_half_away(ratio, 6), pa.float64()),
            "target_per_10k": pa.array(
                round_half_away(10000 * ratio, 0).astype(np.int64),
                pa.int64())})

    # single tiny block (one row per source) — the finisher sees all groups
    return counts.repartition(1).map_batches(finish, batch_format="pyarrow")


SQL_DOMAIN_TEMPERATURE = """
with c as (select source, count(*) as n from documents group by 1),
m as (select max(n) as mx from c)
select source, n as n_docs,
       round(sqrt(cast(n as double)) / sqrt(cast(mx as double)), 6)
         as temp_ratio,
       cast(round(10000 * (sqrt(cast(n as double))
                           / sqrt(cast(mx as double)))) as bigint)
         as target_per_10k
from c, m
"""

LLM_QUERIES["llm_domain_temperature"] = (q_domain_temperature,
                                         SQL_DOMAIN_TEMPERATURE)


# ------------------------------------------------- Gopher-style rule gate

def q_gopher_rules(sf_dir: str):
    """Gopher/MassiveText-style multi-rule quality gate (Rae et al. 2021
    §A1.1): per document, token count bounds, mean-token-length bounds and
    a minimum stop-word count, plus the conjunction `keep`. Pure per-batch
    map — every signal is a vectorized Arrow kernel over the row's own
    text, nothing leaves the worker but the verdict row. Mean token length
    uses the (n_chars + 1 - n_tokens) / n_tokens identity over space-split
    tokens (exact integer-ratio division — bit-equal to the SQL oracle);
    the rule comparisons run on the UNROUNDED double so both sides gate
    identically. Complements llm_repetition_filter (the duplicate-n-gram
    Gopher signal) and llm_quality_logit (the classifier stand-in)."""
    from ..util import round_half_away

    WC_LO, WC_HI = 40, 10_000
    MWL_LO, MWL_HI = 3.0, 10.0
    MIN_STOP = 2

    ds = _docs(sf_dir, ["doc_id", "text"])
    stopset = pa.array(sorted(["the", "a"]))

    def gate(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
        n_chr = pc.cast(pc.utf8_length(pc.cast(t["text"], pa.string())),
                        pa.int64())
        nt = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)
        nc = n_chr.to_numpy(zero_copy_only=False).astype(np.float64)
        mwl = (nc + 1.0 - nt) / nt
        flat = toks.flatten()
        is_stop = pc.cast(pc.is_in(flat, value_set=stopset), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        parents = np.asarray(pc.list_parent_indices(toks))
        stop_hits = np.zeros(t.num_rows, np.int64)
        np.add.at(stop_hits, parents, is_stop)
        nt_i = n_tok.to_numpy(zero_copy_only=False)
        keep = ((nt_i >= WC_LO) & (nt_i <= WC_HI)
                & (mwl >= MWL_LO) & (mwl <= MWL_HI)
                & (stop_hits >= MIN_STOP))
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": n_tok,
            "mean_tok_len": pa.array(round_half_away(mwl, 4), pa.float64()),
            "stop_hits": pa.array(stop_hits, pa.int64()),
            "keep": pa.array(keep)})

    return ds.map_batches(gate, batch_format="pyarrow")


SQL_GOPHER_RULES = """
with t as (select doc_id,
                  cast(len(string_split(text, ' ')) as bigint) as n_tokens,
                  cast(length(text) as bigint) as n_chars,
                  cast(len(list_filter(string_split(text, ' '),
                                       x -> x in ('the', 'a'))) as bigint)
                    as stop_hits
           from documents)
select doc_id, n_tokens,
       round((n_chars + 1 - n_tokens) / cast(n_tokens as double), 4)
         as mean_tok_len,
       stop_hits,
       (n_tokens between 40 and 10000)
         and ((n_chars + 1 - n_tokens) / cast(n_tokens as double))
             between 3.0 and 10.0
         and stop_hits >= 2 as keep
from t
"""

LLM_QUERIES["llm_gopher_rules"] = (q_gopher_rules, SQL_GOPHER_RULES)


# ------------------------------------- corpus-unigram-LM perplexity proxy

def q_unigram_logprob(sf_dir: str):
    """CCNet-style language-model quality score with the LM replaced by a
    corpus-trained unigram model (the KenLM stand-in that needs no external
    artifact): pass 1 counts global token frequencies (per-batch combiner
    partials — vocabulary-bounded, the same broadcast budget as the alias
    dictionary); pass 2 scores each document's mean token log-probability
    under the broadcast vocab→ln p table. ln goes through math.log per
    DISTINCT count (repo float-parity convention); the per-doc sum of ~1e2
    doubles is order-sensitive in the last bits, so the mean is rounded to
    4 decimals on both sides. Cf. llm_token_entropy (within-doc
    distribution) — this scores against the CROSS-doc distribution."""
    import math

    import pandas as pd

    from ..ops.partition import low_card_aggregate
    from ..ops.relational import _cached_resolve, broadcast
    from ..util import round_half_away

    def explode(t: pa.Table) -> pa.Table:
        flat = _tokens(t).flatten()
        return pa.table({"t": pc.cast(flat, pa.string())})

    counts = low_card_aggregate(
        _docs(sf_dir, ["text"]).map_batches(explode, batch_format="pyarrow"),
        "t", [(None, "count_all")], ["c"])
    vocab = pa.Table.from_pylist(counts.take_all(), schema=pa.schema(
        [("t", pa.string()), ("c", pa.int64())]))
    n_total = pc.sum(vocab["c"]).as_py()
    ln_n = math.log(float(n_total))
    ln_by_count = {c: math.log(float(c)) - ln_n
                   for c in set(vocab["c"].to_pylist())}
    logp = {tok: ln_by_count[c] for tok, c in
            zip(vocab["t"].to_pylist(), vocab["c"].to_pylist())}
    ref = broadcast(logp)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        lp = _cached_resolve(_ref)
        toks = _tokens(t)
        flat = pc.cast(toks.flatten(), pa.string())
        vals = pd.Series(flat.to_pylist()).map(lp).to_numpy(np.float64)
        parents = np.asarray(pc.list_parent_indices(toks))
        sums = np.zeros(t.num_rows, np.float64)
        np.add.at(sums, parents, vals)
        n_tok = pc.cast(pc.list_value_length(toks), pa.int64())
        nt = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"], "n_tokens": n_tok,
            "mean_logprob": pa.array(round_half_away(sums / nt, 4),
                                     pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


SQL_UNIGRAM_LOGPROB = """
with tok as (select doc_id, unnest(string_split(text, ' ')) as t
             from documents),
freq as (select t, count(*) as c from tok group by t),
tot as (select cast(sum(c) as double) as n from freq),
lp as (select t, ln(cast(c as double)) - ln((select n from tot)) as logp
       from freq)
select doc_id, cast(count(*) as bigint) as n_tokens,
       round(sum(logp) / count(*), 4) as mean_logprob
from tok join lp on tok.t = lp.t
group by doc_id
"""

LLM_QUERIES["llm_unigram_logprob"] = (q_unigram_logprob, SQL_UNIGRAM_LOGPROB)


# ------------------------------------------------ quantile length trim

def q_length_trim(sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95):
    """Percentile length gate (trim the corpus to docs inside the global
    [p5, p95] character-length band — the outlier-document cut every
    curation pipeline applies before training): the bounds come from the
    distributed exact-interpolation quantile kernel (no driver
    materialization of the column), then ONE combiner pass rolls up
    kept/total counts and kept characters per source. Bound comparisons
    are int-vs-double — identical on both sides; the quantile kernel's
    lo + frac*(hi-lo) interpolation is the DuckDB quantile_cont parity
    convention (ops/quantile.py)."""
    from ..ops.partition import low_card_aggregate
    from ..ops.quantile import distributed_quantiles

    ds = _docs(sf_dir, ["source", "n_chars"])
    lo, hi = distributed_quantiles(ds, "n_chars", [q_lo, q_hi])

    def rollup(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        keep = (n >= lo) & (n <= hi)
        return pa.table({
            "source": t["source"],
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "kept": pa.array(keep.astype(np.int64), pa.int64()),
            "kept_chars": pa.array(np.where(keep, n, 0), pa.int64())})

    out = low_card_aggregate(
        ds.map_batches(rollup, batch_format="pyarrow"), "source",
        [("one", "sum"), ("kept", "sum"), ("kept_chars", "sum")],
        ["n_total", "n_kept", "kept_chars"])
    t = pa.Table.from_pylist(out.take_all(), schema=pa.schema(
        [("source", pa.string()), ("n_total", pa.int64()),
         ("n_kept", pa.int64()), ("kept_chars", pa.int64())]))
    return t.sort_by([("source", "ascending")])


SQL_LENGTH_TRIM = """
with q as (select quantile_cont(n_chars, 0.05) as lo,
                  quantile_cont(n_chars, 0.95) as hi from documents)
select source, count(*) as n_total,
       cast(sum(case when n_chars >= lo and n_chars <= hi
                     then 1 else 0 end) as bigint) as n_kept,
       cast(sum(case when n_chars >= lo and n_chars <= hi
                     then n_chars else 0 end) as bigint) as kept_chars
from documents, q
group by source order by source
"""

LLM_QUERIES["llm_length_trim"] = (q_length_trim, SQL_LENGTH_TRIM)


# ------------------------------------------------ vocabulary growth curve

def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth: distinct-token count among documents
    with doc_id <= each decile threshold of the id space — the novelty
    curve data curators read to decide when a corpus stops paying for
    itself. ONE vocabulary-bounded aggregate: min(doc_id) per token
    (per-batch combiner partials, min is idempotent under re-aggregation),
    then the curve is a driver-side cumulative count over the dim-sized
    first-seen table. All-integer — bit-exact by construction."""
    from ..ops.partition import low_card_aggregate

    ds = _docs(sf_dir, ["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks = _tokens(t)
        flat = pc.cast(toks.flatten(), pa.string())
        parents = np.asarray(pc.list_parent_indices(toks))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)[parents]
        return pa.table({"t": flat, "doc_id": pa.array(ids, pa.int64())})

    first = low_card_aggregate(
        ds.map_batches(explode, batch_format="pyarrow"), "t",
        [("doc_id", "min")], ["first_doc"])
    t = pa.Table.from_pylist(first.take_all(), schema=pa.schema(
        [("t", pa.string()), ("first_doc", pa.int64())]))
    n_docs = _docs(sf_dir, ["doc_id"]).count()
    fd = np.sort(t["first_doc"].to_numpy(zero_copy_only=False))
    rows = []
    for decile in range(1, 11):
        thresh = (n_docs * decile) // 10
        rows.append({"decile": decile, "doc_id_max": thresh,
                     "vocab": int(np.searchsorted(fd, thresh, side="right"))})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("decile", pa.int64()), ("doc_id_max", pa.int64()),
         ("vocab", pa.int64())]))


SQL_VOCAB_GROWTH = """
with fs as (select t, min(doc_id) as first_doc
            from (select doc_id, unnest(string_split(text, ' ')) as t
                  from documents) group by t),
n as (select count(*) as n_docs from documents),
d as (select unnest(range(1, 11)) as decile)
select decile, (n_docs * decile) // 10 as doc_id_max,
       (select count(*) from fs
        where first_doc <= (n_docs * decile) // 10) as vocab
from d, n order by decile
"""

LLM_QUERIES["llm_vocab_growth"] = (q_vocab_growth, SQL_VOCAB_GROWTH)


# ------------------------------------------------ duplicate-mass profile

def q_dup_size_histogram(sf_dir: str):
    """Duplicate-mass profile: how much of the corpus sits in exact-text
    duplicate clusters of each size (the before/after chart of every dedup
    run). One hash-partitioned exchange on the text fingerprint (sha-free:
    the md5-low64 family used by the sketch oracles) to size each cluster,
    then a combiner histogram over the dim-bounded (size) column; emits
    cluster-count and document-mass per size — all integers."""
    from ..ops.partition import grouped_aggregate, low_card_aggregate
    from ..ops.sketch import _md5_hashes_distinct  # noqa: F401 (family doc)

    ds = _docs(sf_dir, ["text"])

    def fp(t: pa.Table) -> pa.Table:
        from ..functions.minhash import _md5low64_raw

        text = pc.cast(t["text"], pa.string())
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        # dictionary-encode first: md5 runs once per DISTINCT batch text
        d = text.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        hs = np.fromiter((_md5low64_raw(s) for s in uniq), np.uint64,
                         len(uniq))
        idx = d.indices.to_numpy(zero_copy_only=False)
        return pa.table({"fp": pa.array(hs[idx], pa.uint64())})

    sizes = grouped_aggregate(ds.map_batches(fp, batch_format="pyarrow"),
                              "fp", [([], "count_all")], ["size"])
    hist = low_card_aggregate(sizes, "size", [(None, "count_all")],
                              ["n_clusters"])
    t = pa.Table.from_pylist(hist.take_all(), schema=pa.schema(
        [("size", pa.int64()), ("n_clusters", pa.int64())]))
    docs_mass = pc.multiply(t["size"], t["n_clusters"])
    return pa.table({"size": t["size"], "n_clusters": t["n_clusters"],
                     "n_docs": docs_mass}).sort_by([("size", "ascending")])


SQL_DUP_SIZE_HISTOGRAM = """
with c as (select md5_number_lower(text) as fp, count(*) as sz
           from documents group by text)
select sz as size, count(*) as n_clusters,
       cast(sz * count(*) as bigint) as n_docs
from c group by sz order by sz
"""

LLM_QUERIES["txt_dup_size_histogram"] = (q_dup_size_histogram,
                                         SQL_DUP_SIZE_HISTOGRAM)


# ------------------------------------------ BPE-style token accounting

_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"


def q_bpe_token_count(sf_dir: str):
    """Token counting under a GPT-2-style pre-tokenizer regex next to the
    whitespace count (the two token accountings every budget/pricing pass
    needs; the real GPT-2 pattern's (?!\\S) lookahead is replaced by a
    plain \\s+ branch so the expression stays in RE2, which pyarrow and
    DuckDB share — match counts are engine-identical by construction).
    Pure per-batch map: two vectorized count kernels and one exact
    integer-ratio fertility division."""
    from ..util import round_half_away

    ds = _docs(sf_dir, ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        ws = pc.cast(pc.list_value_length(pc.split_pattern(text, " ")),
                     pa.int64())
        bpe = pc.cast(pc.count_substring_regex(text, _BPE_PAT), pa.int64())
        fert = round_half_away(
            bpe.to_numpy(zero_copy_only=False).astype(np.float64)
            / ws.to_numpy(zero_copy_only=False).astype(np.float64), 4)
        return pa.table({"doc_id": t["doc_id"], "n_ws_tokens": ws,
                         "n_bpe_tokens": bpe,
                         "fertility": pa.array(fert, pa.float64())})

    return ds.map_batches(count, batch_format="pyarrow")


SQL_BPE_TOKEN_COUNT = """
select doc_id,
       cast(len(string_split(text, ' ')) as bigint) as n_ws_tokens,
       cast(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+'))
            as bigint) as n_bpe_tokens,
       round(cast(len(regexp_extract_all(text,
            '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+|\\s+'))
            as double)
            / len(string_split(text, ' ')), 4) as fertility
from documents
"""

LLM_QUERIES["llm_bpe_token_count"] = (q_bpe_token_count, SQL_BPE_TOKEN_COUNT)


# ----------------------------------------- bigram-LM conditional scorer

def q_bigram_logprob(sf_dir: str):
    """Per-document mean conditional log-probability under a
    corpus-trained add-1-smoothed BIGRAM LM — the next-order CCNet-style
    quality scorer after llm_unigram_logprob: p(w2|w1) = (c(w1 w2) + 1) /
    (c(w1·) + |V|). Pass 1 is two combiner aggregates (bigram counts and
    bigram-left counts, both bigram-vocabulary-bounded — the broadcast
    budget documented for the alias dictionary) plus the distinct-token
    |V|; ln runs once per DISTINCT bigram via math.log (float-parity
    convention). Pass 2 maps each doc's bigrams through the broadcast
    log-prob table and means them (round 4 — per-doc float-sum order).
    Docs with fewer than 2 tokens have no bigrams and emit no row (the
    SQL join drops them identically)."""
    import math

    import pandas as pd

    from ..ops.partition import low_card_aggregate
    from ..ops.relational import _cached_resolve, broadcast
    from ..util import round_half_away

    def _bigram_occurrences(t: pa.Table) -> pa.Table:
        # every adjacent pair, duplicates INCLUDED (the LM needs counts;
        # _shingle_table dedups per doc, which is the novelty/decontam
        # semantics, not this one)
        toks = _tokens(t)
        flat = toks.values
        offs = toks.offsets.to_numpy().astype(np.int64)
        lens = np.diff(offs)
        wins = np.maximum(lens - 1, 0)
        total = int(wins.sum())
        if total == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string()),
                             "w1": pa.array([], pa.string())})
        idx = np.arange(total, dtype=np.int64)
        excl = np.concatenate(([0], np.cumsum(wins)[:-1]))
        starts = idx - np.repeat(excl, wins) + np.repeat(offs[:-1], wins)
        w1 = pc.take(flat, pa.array(starts, pa.int64()))
        w2 = pc.take(flat, pa.array(starts + 1, pa.int64()))
        g = pc.binary_join_element_wise(w1, w2,
                                        pa.scalar(" ", pa.large_string()))
        doc_ids = pc.take(t["doc_id"], pa.array(
            np.repeat(np.arange(len(lens), dtype=np.int64), wins),
            pa.int64()))
        return pa.table({"doc_id": pc.cast(doc_ids, pa.int64()),
                         "g": pc.cast(g, pa.string()),
                         "w1": pc.cast(w1, pa.string())})

    def explode_bigrams(t: pa.Table) -> pa.Table:
        b = _bigram_occurrences(t)
        return b.select(["g", "w1"])

    big = low_card_aggregate(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(explode_bigrams, batch_format="pyarrow"),
        "g", [(None, "count_all")], ["c12"])
    left = low_card_aggregate(
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(explode_bigrams, batch_format="pyarrow"),
        "w1", [(None, "count_all")], ["c1"])

    def explode_tokens(t: pa.Table) -> pa.Table:
        return pa.table({"t": pc.cast(_tokens(t).flatten(), pa.string())})

    vocab = low_card_aggregate(
        _docs(sf_dir, ["text"])
        .map_batches(explode_tokens, batch_format="pyarrow"),
        "t", [(None, "count_all")], ["c"])
    V = float(pa.Table.from_pylist(vocab.take_all()).num_rows)

    c1 = {r["w1"]: r["c1"] for r in left.take_all()}
    logp = {}
    ln_den = {}     # ln(c1 + V) memoized per distinct left count
    for r in big.take_all():
        w1 = r["g"].split(" ", 1)[0]
        den = c1[w1]
        if den not in ln_den:
            ln_den[den] = math.log(den + V)
        logp[r["g"]] = math.log(float(r["c12"] + 1)) - ln_den[den]
    ref = broadcast(logp)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        lp = _cached_resolve(_ref)
        sh = _bigram_occurrences(t)
        ids = sh["doc_id"].to_numpy(zero_copy_only=False)
        vals = pd.Series(sh["g"].to_pylist()).map(lp).to_numpy(np.float64)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), np.float64)
        np.add.at(sums, inv, vals)
        cnt = np.bincount(inv).astype(np.float64)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "n_bigrams": pa.array(cnt.astype(np.int64), pa.int64()),
            "mean_logprob": pa.array(round_half_away(sums / cnt, 4),
                                     pa.float64())})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


SQL_BIGRAM_LOGPROB = """
with toks as (select doc_id, string_split(text, ' ') as s from documents),
v as (select cast(count(distinct w) as double) as v
      from (select unnest(s) as w from toks)),
pos as (select doc_id, s, unnest(generate_series(1, len(s) - 1)) as i
        from toks),
big as (select doc_id, s[i] as w1, s[i + 1] as w2 from pos),
cb as (select w1, w2, cast(count(*) as double) as c12
       from big group by 1, 2),
cl as (select w1, cast(count(*) as double) as c1 from big group by 1),
lp as (select cb.w1, cb.w2,
              ln(c12 + 1) - ln(c1 + (select v from v)) as logp
       from cb join cl using (w1))
select b.doc_id, cast(count(*) as bigint) as n_bigrams,
       round(sum(lp.logp) / count(*), 4) as mean_logprob
from big b join lp on b.w1 = lp.w1 and b.w2 = lp.w2
group by b.doc_id
"""

LLM_QUERIES["llm_bigram_logprob"] = (q_bigram_logprob, SQL_BIGRAM_LOGPROB)


# ----------------------------------------- CCNet head/middle/tail buckets

def q_perplexity_buckets(sf_dir: str):
    """The CCNet bucketing step that consumes the LM score: every document
    lands in head / middle / tail by the global terciles of its unigram
    mean log-prob (higher = more typical = head). Composes the existing
    distributed pieces: the llm_unigram_logprob scorer (rounded to 4 — the
    rounded score is the bucketing KEY on both sides, so tercile
    comparisons see identical doubles) and the exact-interpolation
    distributed quantile kernel for the two cutoffs; the bucket map is
    then a pure per-batch comparison."""
    from ..ops.quantile import distributed_quantiles

    scored = q_unigram_logprob(sf_dir).materialize()   # scored twice below
    lo, hi = distributed_quantiles(scored, "mean_logprob", [1 / 3, 2 / 3])

    def bucket(t: pa.Table) -> pa.Table:
        x = t["mean_logprob"].to_numpy(zero_copy_only=False)
        b = np.where(x > hi, "head", np.where(x > lo, "middle", "tail"))
        return pa.table({"doc_id": t["doc_id"],
                         "mean_logprob": t["mean_logprob"],
                         "bucket": pa.array(b, pa.string())})

    return scored.map_batches(bucket, batch_format="pyarrow")


SQL_PERPLEXITY_BUCKETS = """
with tok as (select doc_id, unnest(string_split(text, ' ')) as t
             from documents),
freq as (select t, count(*) as c from tok group by t),
tot as (select cast(sum(c) as double) as n from freq),
lp as (select t, ln(cast(c as double)) - ln((select n from tot)) as logp
       from freq),
sc as (select doc_id, round(sum(lp.logp) / count(*), 4) as mean_logprob
       from tok join lp on tok.t = lp.t group by doc_id),
q as (select quantile_cont(mean_logprob, 1.0/3.0) as lo,
             quantile_cont(mean_logprob, 2.0/3.0) as hi from sc)
select doc_id, mean_logprob,
       case when mean_logprob > hi then 'head'
            when mean_logprob > lo then 'middle'
            else 'tail' end as bucket
from sc, q
"""

LLM_QUERIES["llm_perplexity_buckets"] = (q_perplexity_buckets,
                                         SQL_PERPLEXITY_BUCKETS)
