"""Deduplication / fingerprint / language-ID queries (the training-data
pipeline ops), with by-construction DuckDB oracles where SQL can express the
result (planted near-dups, see stakgraph_ray.sources.augmented)."""

from __future__ import annotations


from ..util import adaptive_num_blocks as _anb

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ops.neardup import (SimHashStage, embedding_pairs_in_group,
                           minhash_lsh_clusters, token_jaccard_pairs_in_group)
from ..sources.augmented import (MUT_COND_SQL, VEC_COND_SQL, ID_OFFSET,
                                 documents_with_neardups,
                                 embeddings_with_neardups)


def q_minhash_lsh_clusters(sf_dir: str):
    """MinHash(64) + LSH(16x4) near-dup clustering over the augmented corpus.
    cluster_id = min doc_id of the connected component.

    The input is materialized once: minhash_lsh_clusters consumes its input
    twice (signature pass + cluster-assign pass), and handing it the lazy
    augment chain would re-execute read+mutate per pass. At scale the input
    is a parquet checkpoint, where the second pass is just a re-read."""
    ds = documents_with_neardups(sf_dir).materialize()
    return minhash_lsh_clusters(ds, "doc_id", "text")


# Oracle: exact token-3-gram Jaccard >= threshold pairs + recursive
# transitive closure (min-member cluster id). Valid because the corpus's
# true Jaccard distribution is cleanly separated (near-dups >= 0.89,
# background <= 0.3), so the pipeline's signature-estimated threshold and
# the exact threshold classify identically.
SQL_MINHASH = f"""
with recursive aug as (
  select doc_id, text from documents
  union all
  select doc_id + {ID_OFFSET} as doc_id, text || ' {{MUT_TOKEN}}' as text
  from documents where {MUT_COND_SQL}
),
tok as (
  select doc_id, generate_subscripts(string_split(text, ' '), 1) as i,
         unnest(string_split(text, ' ')) as tok from aug
),
tri as (
  select doc_id, tok || ' ' || lead(tok) over w || ' ' || lead(tok, 2) over w as g
  from tok window w as (partition by doc_id order by i)
),
gs as (
  select doc_id, list_distinct(list(g)) as grams
  from tri where g is not null group by doc_id
),
pairs as (
  select a.doc_id as a, b.doc_id as b
  from gs a join gs b on a.doc_id < b.doc_id
  where len(list_intersect(a.grams, b.grams)) /
        cast(len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))
             as double) >= 0.7
),
sym as (select a, b from pairs union select b as a, a as b from pairs),
r(src, dst) as (
  select a, b from sym
  union
  select r.src, s.b from r join sym s on r.dst = s.a where s.b != r.src
),
clusters as (
  select src as doc_id, least(src, min(dst)) as cluster_id from r group by src
)
select d.doc_id, coalesce(c.cluster_id, d.doc_id) as cluster_id
from aug d left join clusters c on d.doc_id = c.doc_id
"""
SQL_MINHASH = SQL_MINHASH.replace("{MUT_TOKEN}", "mutantxq")


def q_token_jaccard_pairs(sf_dir: str):
    """Exact distinct-token-set Jaccard >= 0.8 pairs, blocked by source
    (n-gram-Jaccard dedup family; blocking key documented: same source)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "source"])
    pairs = ds.groupby("source").map_groups(
        lambda g: token_jaccard_pairs_in_group(g, "doc_id", "text", 0.8),
        batch_format="pyarrow")
    from ..util import round_half_away

    def _r4(t: pa.Table, col: str) -> pa.Table:
        x = pc.cast(t[col], pa.float64()).to_numpy(zero_copy_only=False)
        return t.set_column(t.column_names.index(col), col,
                            pa.array(round_half_away(x, 4), pa.float64()))

    return pairs.map_batches(lambda t: _r4(t, "jaccard"),
                             batch_format="pyarrow")


SQL_TOKEN_JACCARD = """
with d as (select doc_id, source, list_distinct(string_split(text, ' ')) as toks
           from documents)
select a.doc_id as a, b.doc_id as b,
       round(len(list_intersect(a.toks, b.toks)) /
             cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
                  as double), 4) as jaccard
from d a join d b on a.source = b.source and a.doc_id < b.doc_id
where len(list_intersect(a.toks, b.toks)) /
      cast(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))
           as double) >= 0.8
"""


def q_embedding_neardup_pairs(sf_dir: str):
    """Embedding-cosine near-dup pairs (>= 0.95), blocked by label bucket
    over the augmented embeddings; outputs the pair ids."""
    ds = embeddings_with_neardups(sf_dir)
    pairs = ds.groupby("label").map_groups(
        lambda g: embedding_pairs_in_group(g, "vec_id", "embedding", 0.95),
        batch_format="pyarrow")
    return pairs.map_batches(lambda t: t.select(["a", "b"]),
                             batch_format="pyarrow")


SQL_EMBEDDING_PAIRS = f"""
select vec_id as a, vec_id + {ID_OFFSET} as b
from embeddings where {VEC_COND_SQL}
"""


def q_simhash_fingerprints(sf_dir: str):
    """64-bit SimHash per document + 16-bit blocking bucket. The token hash
    is md5-low-64 (= DuckDB md5_number_lower), so the whole fingerprint is
    SQL-expressible: the oracle unrolls the per-bit majority vote."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                         override_num_blocks=_anb(f"{sf_dir}/documents.parquet"))
    from ..util import make_task_stage

    return ds.map_batches(make_task_stage(SimHashStage, ("doc_id", "text"),
                                          id_col="doc_id", text_col="text"),
                          batch_format="pyarrow")


SQL_SIMHASH = """
with tok as (
  select doc_id, unnest(string_split(text, ' ')) as tok from documents
),
h as (select doc_id, md5_number_lower(tok) as h from tok where tok != ''),
bits as (
  select doc_id, b.bit,
         sum(case when (h >> b.bit) & 1 = 1 then 1 else -1 end) as s
  from h cross join (select unnest(generate_series(0, 63)) as bit) b
  group by doc_id, b.bit
),
sim as (
  select doc_id,
         cast(sum(case when s > 0 then (1::ubigint << bit)
                       else 0::ubigint end) as ubigint) as h64
  from bits group by doc_id
)
select d.doc_id,
       lower(lpad(to_hex(coalesce(s.h64, 0::ubigint)), 16, '0')) as simhash,
       cast(coalesce(s.h64, 0::ubigint) >> 48 as bigint) as bucket
from documents d left join sim s on d.doc_id = s.doc_id
"""


def q_doc_fingerprints(sf_dir: str):
    """Winnowing-style rolling-hash fingerprint per doc: min md5-low-64 over
    8-char windows (oracle: min(md5_number_lower(substring(...))))."""
    import ray.data as rd

    from ..functions.minhash import rolling_fingerprint

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                         override_num_blocks=_anb(f"{sf_dir}/documents.parquet"))

    def fp(t: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint(x or "") for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(vals, pa.uint64())})

    return ds.map_batches(fp, batch_format="pyarrow")


SQL_FINGERPRINTS = """
select doc_id,
       (select min(md5_number_lower(substring(text, w.i, 8)))
        from (select unnest(generate_series(
                1, greatest(length(text) - 7, 1))) as i) w) as fingerprint
from documents
"""


def q_langid(sf_dir: str):
    """Heuristic language ID: English stopword evidence -> 'en', else 'und'
    (n-gram-heuristic langid family; this corpus's closed vocab makes the
    stopword test the whole signal)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
                         override_num_blocks=_anb(f"{sf_dir}/documents.parquet"))

    def guess(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t["text"], pa.large_string()), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(["a", "the"])) \
            .to_numpy(zero_copy_only=False)
        n = t.num_rows
        has = np.bincount(parent, weights=is_stop.astype("float64"),
                          minlength=n) > 0
        lang = np.where(has, "en", "und")
        return pa.table({"doc_id": t["doc_id"],
                         "lang_guess": pa.array(lang, pa.string())})

    return ds.map_batches(guess, batch_format="pyarrow")


SQL_LANGID = """
select doc_id,
       case when len(list_filter(string_split(text, ' '),
                                 x -> x in ('the', 'a'))) > 0
            then 'en' else 'und' end as lang_guess
from documents
"""


def q_rich_triples(sf_dir: str):
    """Full typed-entity pipeline over the annotated synthetic corpus
    (dictionary+pattern extraction, cascade linking incl. same-page-unique,
    LSH canonicalization), projected to the (subj, pred, obj) triple set.
    Oracle: the generator's by-construction golden as an inline VALUES
    relation — exact because the pytest gate holds P = R = 1.0
    (tests/test_rich_corpus.py); confidence/year/type columns are asserted
    there as well."""
    import ray.data as rd

    from ..pipelines.rich import build_rich_triples
    from ..sources.synth import generate_rich_pages

    pages, _golden = generate_rich_pages(300)
    triples, _roots = build_rich_triples(rd.from_arrow(pages))
    return triples.map_batches(
        lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow")


def _sql_rich_triples() -> str:
    from ..sources.synth import generate_rich_pages

    def q(x: str) -> str:
        return "'" + x.replace("'", "''") + "'"

    _pages, golden = generate_rich_pages(300)
    rows = ", ".join(f"({q(s)}, {q(p)}, {q(o)})"
                     for s, p, o in sorted(golden["triples"]))
    return (f"select * from (values {rows}) as t(subj, pred, obj)")


SQL_RICH_TRIPLES = _sql_rich_triples()


def q_knn_lsh(sf_dir: str):
    """LSH-bucketed approximate top-k, deterministic variant: md5-sign
    planes over int64-quantized vectors, bucket-collision pruning, integer
    dot scores — exactly reproducible by SQL_KNN_LSH_DET (the float
    Gaussian-plane knn_lsh stays the production operator, recall-gated in
    tests/test_ann_multimodal.py and exercised by sim_node_embedding_ann)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..ops.ann import knn_lsh_det

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 5))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"], override_num_blocks=_anb(f"{sf_dir}/embeddings.parquet"))
    return knn_lsh_det(ds, queries, k=5, n_bits=4)


def q_knn_ivf(sf_dir: str):
    """IVF approximate top-k, deterministic variant: anchor centroids (the
    quantized vectors of the 16 smallest-id rows), integer-L2 cell
    assignment with ties to the lowest centroid, probe-pruned scan with
    integer dot scores — exactly reproducible by SQL_KNN_IVF_DET (the
    k-means knn_ivf stays the production operator, recall-gated in
    tests/test_ann_multimodal.py)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..ops.ann import knn_ivf_det

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 5))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         override_num_blocks=_anb(f"{sf_dir}/embeddings.parquet"))
    return knn_ivf_det(ds, queries, k=5, n_centroids=16, n_probe=4)


def q_knn_pq(sf_dir: str):
    """Product-quantization approximate top-k, deterministic variant:
    anchor codebooks (quantized subvectors of the 16 smallest-id rows),
    integer-L2 encode, integer ADC table-lookup scores — exactly
    reproducible by SQL_KNN_PQ_DET (the k-means knn_pq stays the
    production operator, recall-gated in tests/test_ann_multimodal.py)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..ops.ann import knn_pq_det

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    queries = emb.filter(pc.less(emb["vec_id"], 5))
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         override_num_blocks=_anb(f"{sf_dir}/embeddings.parquet"))
    return knn_pq_det(ds, queries, k=5, n_sub=4, n_codes=16)


def q_media_features(sf_dir: str):
    """Multimodal actor-pool pipeline: binary payload decode -> resize ->
    feature vectors (rows-only: decode is not SQL-expressible; determinism
    and feature math tested in tests/test_ann_multimodal.py)."""
    from ..stages.multimodal import media_features

    return media_features(sf_dir)


def q_hybrid_search(sf_dir: str):
    """Hybrid search: pipeline-native fulltext + vector rankings (scored in
    map_batches, distributed sort, only top-k on the driver), fused with the
    reference's RRF formula (mcp/src/graph/graph.ts:152-236), token-budget-
    limited. Rows-only; formula unit-tested in tests/test_graph_search_ops.py."""
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..ops.search import (fulltext_topk, rrf_fuse, token_budget_limit,
                              vector_topk)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"], override_num_blocks=_anb(f"{sf_dir}/documents.parquet"))
    ft = fulltext_topk(docs, "doc_id", "text",
                       ["spark", "join", "window"], k=50)

    # the query vector: one row fetched by id (row-group-pruned read)
    q = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", 0)])["embedding"][0].as_py()
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"],
                          override_num_blocks=_anb(f"{sf_dir}/embeddings.parquet"))
    vec = vector_topk(emb, "vec_id", "embedding", q, k=50)

    fused = rrf_fuse(ft, vec, limit=25)  # driver fuses top-k lists only
    # token counts for the 25 fused ids: row-group-pruned point read (no
    # third corpus-wide execution — predicate pushdown does the work)
    hits = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         filters=[("doc_id", "in", [i for i, _ in fused])])
    counts = dict(zip(
        hits["doc_id"].to_pylist(),
        pc.list_value_length(pc.split_pattern(
            pc.cast(hits["text"], pa.large_string()), " ")).to_pylist()))
    from ..util import round_half_away

    def r6(x: float) -> float:
        return round_half_away(x, 6)

    items = [{"doc_id": i, "score": r6(s),
              "token_count": counts.get(i, 0)} for i, s in fused]
    kept = token_budget_limit(items, max_tokens=1500)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([x["doc_id"] for x in kept], pa.int64()),
        "score": pa.array([x["score"] for x in kept], pa.float64()),
        "token_count": pa.array([x["token_count"] for x in kept], pa.int64()),
    }))


def q_node_embedding_ann(sf_dir: str):
    """Embedding backfill wired into the graph product: Term nodes from the
    pages corpus -> EmbedBodies actor pool (batch 32, model once per actor)
    -> LSH-bucketed ANN against the first 3 term vectors. Pipeline-native
    end to end (rows-only: approximate by design; recall-vs-bruteforce
    gated in tests/test_ann_multimodal.py)."""
    import zlib

    from ..ops.ann import knn_lsh
    from ..ops.dedup import distinct
    from ..stages.enrich import embed_nodes
    from ..stages.extract import mention_rows
    from ..stages.link import make_linker_stage, term_linker_fn
    from .queries_kg import _extracted

    ds = _extracted(sf_dir).map_batches(mention_rows, batch_format="pyarrow")
    kw = make_linker_stage()
    linked = ds.map_batches(term_linker_fn(kw),
                            batch_format="pyarrow", batch_size=None)
    terms = distinct(linked.map_batches(
        lambda t: t.select(["canonical"]), batch_format="pyarrow"),
        ["canonical"])

    def as_nodes(t: pa.Table) -> pa.Table:
        names = t["canonical"].to_pylist()
        return pa.table({
            "vec_id": pa.array([zlib.crc32(n.encode()) for n in names],
                               pa.int64()),
            "name": pc.cast(t["canonical"], pa.string()),
            "body": pc.cast(t["canonical"], pa.large_string()),
        })

    nodes = terms.map_batches(as_nodes, batch_format="pyarrow")
    embedded = embed_nodes(nodes).materialize()  # queries + corpus consumers
    queries = embedded.sort("vec_id").limit(3) \
        .select_columns(["vec_id", "embedding"]).take_all()
    qt = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in queries], pa.int64()),
        "embedding": pa.array([r["embedding"] for r in queries],
                              pa.list_(pa.float32())),
    })
    out = knn_lsh(embedded.select_columns(["vec_id", "embedding"]), qt, k=5)
    from ..util import round_half_away

    def _r4(t: pa.Table) -> pa.Table:
        x = pc.cast(t["cos"], pa.float64()).to_numpy(zero_copy_only=False)
        return t.set_column(t.column_names.index("cos"), "cos",
                            pa.array(round_half_away(x, 4), pa.float64()))

    return out.map_batches(_r4, batch_format="pyarrow")


def q_fulltext_topk(sf_dir: str):
    """Fulltext top-k, oracle-backed: vectorized term-count scoring inside
    map_batches (the Lucene fulltext-index analog, queries.ts:512-560),
    distributed (score, id) sort, limit k — only winners reach the driver."""
    import ray.data as rd

    from ..ops.search import fulltext_topk

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=_anb(f"{sf_dir}/documents.parquet"))
    top = fulltext_topk(docs, "doc_id", "text",
                        ["spark", "join", "window"], k=50)
    return pa.table({
        "doc_id": pa.array([i for i, _ in top], pa.int64()),
        "score": pa.array([s for _, s in top], pa.float64()),
    })


SQL_FULLTEXT_TOPK = """
with toks as (
  select doc_id, unnest(string_split(text, ' ')) as tok from documents
), sc as (
  select doc_id,
         cast(count(*) filter (where tok in ('spark', 'join', 'window'))
              as double) as score
  from toks group by doc_id
)
select doc_id, score from sc where score > 0
order by score desc, doc_id limit 50
"""


def _lev1(a: str, b: str) -> bool:
    """Exact edit-distance == 1 (candidates already differ, lengths within 1)."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif not skipped:
            skipped = True
            j += 1
        else:
            return False
    return True


def q_fuzzy_name_pairs(sf_dir: str):
    """Edit-distance-1 alias-candidate pairs over the part-name vocabulary
    via DELETION-NEIGHBORHOOD (FastSS) blocking — the canonicalization
    alias-candidate generator: each name emits itself plus every
    single-char-deletion variant as block keys; names sharing a key are the
    only possible lev-1 pairs (substitution -> same deletion position;
    insertion -> the shorter IS a variant of the longer), verified exactly
    inside the block. ONE keyed shuffle on the variant; candidate groups
    are collision-bounded, so the per-pair Python verify runs on a tiny
    set (the token_jaccard blocked-verify precedent). Distinct (a, b),
    a < b."""
    import itertools

    from ..ops.partition import distinct_hp, partitioned_apply

    import ray.data as rd

    path = f"{sf_dir}/part.parquet"
    ds = rd.read_parquet(path, columns=["p_name"],
                         override_num_blocks=_anb(path))
    names = distinct_hp(ds.map_batches(
        lambda t: pa.table({"nm": pc.cast(t["p_name"], pa.string())}),
        batch_format="pyarrow"), "nm")

    def variants(t: pa.Table) -> pa.Table:
        # vocabulary-bounded loop: |distinct names| x length emissions
        ks, ns = [], []
        for s in t["nm"].to_pylist():
            ks.append(s)
            ns.append(s)
            for i in range(len(s)):
                ks.append(s[:i] + s[i + 1:])
                ns.append(s)
        return pa.table({"k": pa.array(ks, pa.string()),
                         "nm": pa.array(ns, pa.string())})

    cand = names.map_batches(variants, batch_format="pyarrow")

    def pairs(t: pa.Table) -> pa.Table:
        t = t.sort_by([("k", "ascending"), ("nm", "ascending")])
        ks = t["k"].to_pylist()
        nms = t["nm"].to_pylist()
        out_a, out_b = [], []
        start = 0
        for i in range(1, len(ks) + 1):
            if i == len(ks) or ks[i] != ks[start]:
                group = sorted(set(nms[start:i]))
                for a, b in itertools.combinations(group, 2):
                    if _lev1(a, b):
                        out_a.append(a)
                        out_b.append(b)
                start = i
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())})

    return distinct_hp(partitioned_apply(cand, "k", pairs), ["a", "b"])


SQL_FUZZY_NAMES = """
with t as (select distinct p_name as nm from part)
select a.nm as a, b.nm as b
from t a join t b on a.nm < b.nm and levenshtein(a.nm, b.nm) = 1
"""


# Deterministic LSH ANN (ops/ann.knn_lsh_det): int64-quantized vectors,
# md5-sign planes (last hex digit parity), bucket-equality candidates,
# integer dot scores. Every step is integer arithmetic, so SUM order
# cannot change values — bit-exact vs the Ray path.
SQL_KNN_LSH_DET = """
with eq as (
  select vec_id, i.i as dim,
         cast(round(cast(list_extract(embedding, i.i + 1) as double) * 1024)
              as bigint) as v
  from embeddings, range(0, 64) as i(i)
),
planes as (
  select b.b as b, j.j as dim,
         case when instr('13579bdf',
                         substr(md5('lshplane:' || b.b || ':' || j.j), 32, 1)) > 0
              then -1 else 1 end as s
  from range(0, 4) b(b), range(0, 64) j(j)
),
dots as (
  select eq.vec_id, p.b, cast(sum(p.s * eq.v) as bigint) as dp
  from eq join planes p on p.dim = eq.dim
  group by eq.vec_id, p.b
),
bk as (
  select vec_id,
         cast(sum(case when dp > 0 then (1::bigint << b) else 0 end) as bigint)
           as bucket
  from dots group by vec_id
),
cand as (
  -- Hamming<=1 multi-probe: bucket XOR is 0 or a power of two
  select q.vec_id as query_id, e.vec_id as neighbor_id
  from bk q join bk e
    on (xor(q.bucket, e.bucket) & (xor(q.bucket, e.bucket) - 1)) = 0
  where q.vec_id < 5
),
sc as (
  select c.query_id, c.neighbor_id, cast(sum(a.v * b.v) as bigint) as score
  from cand c
  join eq a on a.vec_id = c.query_id
  join eq b on b.vec_id = c.neighbor_id and b.dim = a.dim
  group by c.query_id, c.neighbor_id
)
select query_id, neighbor_id, score from (
  select sc.*, row_number() over (
    partition by query_id order by score desc, neighbor_id) as rn
  from sc) where rn <= 5
"""


# Deterministic IVF ANN (ops/ann.knn_ivf_det): anchor centroids = the
# quantized vectors of the 16 smallest vec_ids, integer-L2 assignment
# (ties to the lowest code — the constant ||x||^2 term is dropped on both
# sides, preserving order), queries probe their 4 nearest cells, integer
# dot scores. All-integer, so the driver hash matches bit-for-bit.
SQL_KNN_IVF_DET = """
with eq as (
  select vec_id, i.i as dim,
         cast(round(cast(list_extract(embedding, i.i + 1) as double) * 1024)
              as bigint) as v
  from embeddings, range(0, 64) as i(i)
),
anch as (
  select vec_id, row_number() over (order by vec_id) - 1 as code
  from (select vec_id from embeddings order by vec_id limit 16)
),
cb as (
  select a.code, eq.dim, eq.v from eq join anch a using (vec_id)
),
d2 as (
  select eq.vec_id, cb.code,
         cast(sum(cb.v * cb.v) - 2 * sum(eq.v * cb.v) as bigint) as d
  from eq join cb on cb.dim = eq.dim
  group by eq.vec_id, cb.code
),
assign as (
  select vec_id, code from (
    select d2.*, row_number() over (
      partition by vec_id order by d, code) as rn
    from d2) where rn = 1
),
probes as (
  select vec_id as query_id, code from (
    select d2.*, row_number() over (
      partition by vec_id order by d, code) as rn
    from d2 where vec_id < 5) where rn <= 4
),
cand as (
  select p.query_id, a.vec_id as neighbor_id
  from probes p join assign a using (code)
),
sc as (
  select c.query_id, c.neighbor_id, cast(sum(a.v * b.v) as bigint) as score
  from cand c
  join eq a on a.vec_id = c.query_id
  join eq b on b.vec_id = c.neighbor_id and b.dim = a.dim
  group by c.query_id, c.neighbor_id
)
select query_id, neighbor_id, score from (
  select sc.*, row_number() over (
    partition by query_id order by score desc, neighbor_id) as rn
  from sc) where rn <= 5
"""


# Deterministic PQ ANN (ops/ann.knn_pq_det): codebooks = quantized
# subvectors of the 16 smallest vec_ids (4 subspaces x 16 dims), encode =
# integer-L2 argmin with ties to the lowest code, ADC score = integer
# table lookups summed over subspaces.
SQL_KNN_PQ_DET = """
with eq as (
  select vec_id, i.i as dim,
         cast(round(cast(list_extract(embedding, i.i + 1) as double) * 1024)
              as bigint) as v
  from embeddings, range(0, 64) as i(i)
),
anch as (
  select vec_id, row_number() over (order by vec_id) - 1 as code
  from (select vec_id from embeddings order by vec_id limit 16)
),
cb as (
  select a.code, eq.dim // 16 as s, eq.dim % 16 as sd, eq.v
  from eq join anch a using (vec_id)
),
d2 as (
  select eq.vec_id, cb.s, cb.code,
         cast(sum((eq.v - cb.v) * (eq.v - cb.v)) as bigint) as d
  from eq join cb on cb.s = eq.dim // 16 and cb.sd = eq.dim % 16
  group by eq.vec_id, cb.s, cb.code
),
best as (
  select vec_id, s, code from (
    select d2.*, row_number() over (
      partition by vec_id, s order by d, code) as rn
    from d2) where rn = 1
),
qt as (
  select eq.vec_id as query_id, cb.s, cb.code,
         cast(sum(eq.v * cb.v) as bigint) as dp
  from eq join cb on cb.s = eq.dim // 16 and cb.sd = eq.dim % 16
  where eq.vec_id < 5
  group by eq.vec_id, cb.s, cb.code
),
sc as (
  select qt.query_id, b.vec_id as neighbor_id,
         cast(sum(qt.dp) as bigint) as score
  from best b join qt on qt.s = b.s and qt.code = b.code
  group by qt.query_id, b.vec_id
)
select query_id, neighbor_id, score from (
  select sc.*, row_number() over (
    partition by query_id order by score desc, neighbor_id) as rn
  from sc) where rn <= 5
"""


DEDUP_QUERIES: dict[str, tuple] = {
    "dedup_fuzzy_names": (q_fuzzy_name_pairs, SQL_FUZZY_NAMES),
    "search_fulltext_topk": (q_fulltext_topk, SQL_FULLTEXT_TOPK),
    "sim_node_embedding_ann": (q_node_embedding_ann, None),
    "kg_rich_triples": (q_rich_triples, SQL_RICH_TRIPLES),
    "search_hybrid_rrf": (q_hybrid_search, None),
    "sim_knn_lsh": (q_knn_lsh, SQL_KNN_LSH_DET),
    "sim_knn_ivf": (q_knn_ivf, SQL_KNN_IVF_DET),
    "sim_knn_pq": (q_knn_pq, SQL_KNN_PQ_DET),
    "mm_media_features": (q_media_features, None),
    "dedup_minhash_lsh": (q_minhash_lsh_clusters, SQL_MINHASH),
    "dedup_token_jaccard": (q_token_jaccard_pairs, SQL_TOKEN_JACCARD),
    "dedup_embedding_pairs": (q_embedding_neardup_pairs, SQL_EMBEDDING_PAIRS),
    "dedup_simhash": (q_simhash_fingerprints, SQL_SIMHASH),
    "txt_fingerprints": (q_doc_fingerprints, SQL_FINGERPRINTS),
    "txt_langid": (q_langid, SQL_LANGID),
}


def q_media_metadata(sf_dir: str):
    """Multimodal typed-metadata columns, oracle-backed: the media table is
    derived inside map_batches (kind / width / height / n_frames are pure
    functions of doc_id), so the distributed derivation and schema are
    SQL-checkable even though the binary payload features are not."""
    from ..stages.multimodal import synth_media_ds

    return synth_media_ds(sf_dir).map_batches(
        lambda t: t.select(["media_id", "kind", "width", "height", "n_frames",
                            "n_samples", "sample_rate"]),
        batch_format="pyarrow")


SQL_MEDIA_METADATA = """
select doc_id as media_id,
       case when doc_id % 10 = 0 then 'video'
            when doc_id % 10 = 5 then 'audio'
            else 'image' end as kind,
       cast(16 + (doc_id % 5) * 8 as int) as width,
       cast(16 + (doc_id % 7) * 8 as int) as height,
       cast(case when doc_id % 10 = 0 then 4
                 when doc_id % 10 = 5 then 0
                 else 1 end as int) as n_frames,
       cast(case when doc_id % 10 = 5 then 2048 + (doc_id % 4) * 1024
                 else 0 end as int) as n_samples,
       cast(case when doc_id % 10 = 5 then 8000 + (doc_id % 3) * 4000
                 else 0 end as int) as sample_rate
from documents
"""

DEDUP_QUERIES["mm_media_metadata"] = (q_media_metadata, SQL_MEDIA_METADATA)


# Hybrid-RRF oracle: the full reference formula in SQL — per-list min-max
# normalization ((s-lo)/(hi-lo), range 0 -> 1.0 divisor), contribution
# (1/(60+rank))*(0.5+0.5*norm), 1.5x both-lists boost, (-score, id) order,
# limit 25, then the greedy token-budget prefix as a window cumsum.
SQL_HYBRID_RRF = """
with ft0 as (
  select doc_id,
         cast(len(list_filter(string_split(text, ' '),
                              x -> x in ('spark', 'join', 'window')))
              as double) as score
  from documents
),
ftl as (select doc_id, score from ft0 where score > 0
        order by score desc, doc_id limit 50),
ftr as (select doc_id, score,
               row_number() over (order by score desc, doc_id) as rnk,
               min(score) over () as lo, max(score) over () as hi from ftl),
v0 as (
  select vec_id,
         list_cosine_similarity(embedding,
             (select embedding from embeddings where vec_id = 0)) as cos
  from embeddings
),
vl as (select vec_id, cos from v0 order by cos desc, vec_id limit 50),
vr as (select vec_id, cos,
              row_number() over (order by cos desc, vec_id) as rnk,
              min(cos) over () as lo, max(cos) over () as hi from vl),
contrib as (
  select doc_id as id,
         (1.0 / (60 + rnk)) *
         (0.5 + 0.5 * (score - lo) / (case when hi = lo then 1.0
                                           else hi - lo end)) as c
  from ftr
  union all
  select vec_id as id,
         (1.0 / (60 + rnk)) *
         (0.5 + 0.5 * (cos - lo) / (case when hi = lo then 1.0
                                         else hi - lo end)) as c
  from vr
),
fused as (
  select id, sum(c) * (case when count(*) = 2 then 1.5 else 1.0 end) as s
  from contrib group by id
),
top as (select id, s from fused order by s desc, id limit 25),
tok as (select doc_id, len(string_split(text, ' ')) as token_count
        from documents),
budgeted as (
  select t.id as doc_id, t.s, coalesce(k.token_count, 0) as token_count,
         sum(coalesce(k.token_count, 0)) over (
             order by t.s desc, t.id
             rows between unbounded preceding and current row) as cum
  from top t left join tok k on t.id = k.doc_id
)
select doc_id, round(s, 6) as score, token_count
from budgeted where cum <= 1500
"""

DEDUP_QUERIES["search_hybrid_rrf"] = (q_hybrid_search, SQL_HYBRID_RRF)


def q_hll_distinct(sf_dir: str):
    """Approximate distinct prices over lineitem via the HyperLogLog sketch
    (ops/sketch.py): one pure-map pass emitting O(blocks) mergeable
    register rows — the cardinality analog of the MinHash family, for
    columns where exact distinct would be a vocabulary-scale shuffle.
    Hash family is md5-low-64 over the cents string (version-stable across
    pandas upgrades AND == DuckDB md5_number_lower), and the estimate
    carries its harmonic sum as an exact integer, so the SQL oracle
    reproduces the integer result bit-for-bit; the accuracy gate (<5% vs
    exact at p=12) stays in pytest (tests/test_windows_quantile.py)."""
    import ray.data as rd

    from ..ops.sketch import approx_distinct_stable
    from ..util import adaptive_num_blocks

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice"],
                         override_num_blocks=adaptive_num_blocks(
                             f"{sf_dir}/lineitem.parquet"))
    # float prices -> exact integer cents (floor(x*100 + 0.5), the same
    # IEEE ops the oracle runs) so both sides hash identical strings
    cents = ds.map_batches(
        lambda t: pa.table({"cents": pc.cast(pc.floor(pc.add(
            pc.multiply(t["l_extendedprice"], 100.0), 0.5)), pa.int64())}),
        batch_format="pyarrow")
    est = approx_distinct_stable(cents, "cents", p=12)
    return pa.table({"approx_distinct_prices": pa.array([est], pa.int64())})


# The SQL mirror of ops/sketch.py hll_fold_hashes + hll_estimate_exact at
# p=12: bucket = h >> 52 via integer division, rho from the low-52-bit
# window with the same 32-bit-split floor(log2) (float64 log2 of a full
# 64-bit value can round up across a 2^k boundary), harmonic sum as an
# exact HUGEINT, and a literal-identical float chain for the estimate.
_SQL_HLL_BODY = """
parts as (select cast(h // 4503599627370496 as bigint) as bucket,
                 h % 4503599627370496 as w {kcol} from h),
rho as (select bucket,
    case when w = 0 then 53
         when w >= 4294967296
           then 52 - (32 + cast(floor(log2(cast(w // 4294967296 as double)))
                               as bigint))
         else 52 - cast(floor(log2(cast(w as double))) as bigint)
    end as rho {kcol} from parts),
reg as (select {kgrp} bucket, max(rho) as r from rho group by {kgrp} bucket),
s as (select {kgrp}
        coalesce(sum(cast(power(2, 64 - r) as hugeint)), 0)
          + (4096 - count(*)) * cast(18446744073709551616 as hugeint) as S,
        4096 - count(*) as zeros
      from reg {kgroupby}),
est as (select {kgrp} case
    when 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
         * 18446744073709551616.0 / cast(S as double) <= 2.5 * 4096.0
         and zeros > 0
    then 4096.0 * ln(4096.0 / cast(zeros as double))
    else 0.7213 / (1.0 + 1.079 / 4096.0) * 4096.0 * 4096.0
         * 18446744073709551616.0 / cast(S as double)
    end as e from s)
"""

SQL_HLL_DISTINCT = ("""
with v as (select distinct cast(floor(l_extendedprice * 100.0 + 0.5)
                                as bigint) as cents
           from lineitem where l_extendedprice is not null),
h as (select md5_number_lower(cast(cents as varchar)) as h from v),
""" + _SQL_HLL_BODY.format(kcol="", kgrp="", kgroupby="") + """
select cast(floor(e + 0.5) as bigint) as approx_distinct_prices from est
""")

DEDUP_QUERIES["agg_hll_distinct"] = (q_hll_distinct, SQL_HLL_DISTINCT)


def q_cms_token_freq(sf_dir: str):
    """Count-min-sketch frequency estimates for a fixed token probe set
    over the documents corpus: one tokenize map emits O(blocks) mergeable
    (depth x width) sketches, the driver sums them — the heavy-hitter
    companion of the HLL sketch (never underestimates; one-sided error
    bound gated in pytest). md5 cell hashing + pure-integer counters make
    every output SQL-reproducible, so this is a full hash-checked row."""
    import ray.data as rd

    from ..ops.sketch import cms_frequencies_stable
    from ..util import adaptive_num_blocks
    from .queries_llm import _tokens

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["text"],
                         override_num_blocks=adaptive_num_blocks(path))
    toks = ds.map_batches(
        lambda t: pa.table({"tok": pc.cast(pc.list_flatten(_tokens(t)),
                                           pa.string())}),
        batch_format="pyarrow")
    probes = ["the", "a", "spark", "join", "window"]
    freqs = cms_frequencies_stable(toks, "tok", probes)
    return pa.table({"token": pa.array(probes, pa.string()),
                     "est_count": pa.array([freqs[p] for p in probes],
                                           pa.int64())})


# Exact mirror of cms_frequencies_stable (width 8192, depth 4): counters
# are integer sums over md5 cell hashes, the estimate an integer min —
# no float anywhere, so the driver hash matches bit-for-bit.
SQL_CMS_TOKEN_FREQ = """
with tok as (select unnest(string_split(text, ' ')) as tok
             from documents where text is not null),
d as (select unnest([0, 1, 2, 3]) as d),
cells as (select d.d,
                 md5_number_lower(cast(d.d as varchar) || ':' || tok) % 8192
                   as cell,
                 count(*) as c
          from tok cross join d group by 1, 2),
probes(token) as (values ('the'), ('a'), ('spark'), ('join'), ('window')),
p as (select token, d.d,
             md5_number_lower(cast(d.d as varchar) || ':' || token) % 8192
               as cell
      from probes cross join d)
select p.token, cast(min(coalesce(cells.c, 0)) as bigint) as est_count
from p left join cells on p.d = cells.d and p.cell = cells.cell
group by p.token
"""

DEDUP_QUERIES["agg_cms_token_freq"] = (q_cms_token_freq, SQL_CMS_TOKEN_FREQ)


def q_hll_distinct_by_type(sf_dir: str):
    """Grouped HLL: approximate distinct users per event_type (the sketch
    composed with a low-cardinality group-by — per-batch per-group register
    rows, driver merges G x blocks sketches). md5 hash family + exact-
    integer estimates make each group's value SQL-reproducible; accuracy
    stays gated in pytest alongside the global sketch."""
    import ray.data as rd

    from ..ops.sketch import grouped_approx_distinct_stable
    from ..util import adaptive_num_blocks

    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(path, columns=["event_type", "user_id"],
                         override_num_blocks=adaptive_num_blocks(path))
    est = grouped_approx_distinct_stable(ds, "event_type", "user_id", p=12)
    keys = sorted(est, key=lambda k: (k is None, k))  # null group sorts last
    return pa.table({"event_type": pa.array(keys, pa.string()),
                     "approx_distinct_users": pa.array(
                         [est[k] for k in keys], pa.int64())})


SQL_HLL_DISTINCT_BY_TYPE = ("""
with v as (select distinct event_type, user_id from events
           where user_id is not null),
h as (select event_type as k,
             md5_number_lower(cast(user_id as varchar)) as h from v),
""" + _SQL_HLL_BODY.format(kcol=", k", kgrp="k,", kgroupby="group by k")
    + """
select k as event_type,
       cast(floor(e + 0.5) as bigint) as approx_distinct_users
from est
""")

DEDUP_QUERIES["agg_hll_distinct_by_type"] = (q_hll_distinct_by_type,
                                             SQL_HLL_DISTINCT_BY_TYPE)


def q_media_feature_stats(sf_dir: str):
    """Decoded-payload scalar stats from the REAL actor-pool decode path
    (MediaFeatureStatStage): decoded element count, frames sampled, feature
    dims — the mm_media_metadata oracle pattern extended to the feature
    stage so the decode/frame-sample/waveform plumbing is hash-checked by
    the driver (the float vectors stay pytest-gated in mm_media_features)."""
    from ..stages.multimodal import media_feature_stats

    return media_feature_stats(sf_dir)


SQL_MEDIA_FEATURE_STATS = """
select doc_id as media_id,
       case when doc_id % 10 = 0 then 'video'
            when doc_id % 10 = 5 then 'audio'
            else 'image' end as kind,
       cast(case when doc_id % 10 = 0
                 then 4 * (16 + (doc_id % 7) * 8) * (16 + (doc_id % 5) * 8)
                 when doc_id % 10 = 5 then 2048 + (doc_id % 4) * 1024
                 else (16 + (doc_id % 7) * 8) * (16 + (doc_id % 5) * 8)
            end as bigint) as decoded_len,
       cast(case when doc_id % 10 = 0 then 2
                 when doc_id % 10 = 5 then 0
                 else 1 end as bigint) as frames_sampled,
       cast(case when doc_id % 10 = 5 then 11 else 19 end as bigint) as feat_dim
from documents
"""

DEDUP_QUERIES["mm_media_feature_stats"] = (q_media_feature_stats,
                                           SQL_MEDIA_FEATURE_STATS)


# ------------------------------------------------- paragraph-level dedup

_PARA_W = 10  # tokens per paragraph window (both sides must agree)


def _paragraph_windows(t: pa.Table, carry: tuple = ()) -> pa.Table:
    """(doc_id, text) batch -> one row per fixed 10-token window: zero-copy
    — the window list array is rebuilt over the SAME flat token buffer with
    new offsets, paragraph strings come from one vectorized binary_join.
    ``carry`` names additional doc-level columns replicated per window."""
    empty = pa.table({"para": pa.array([], pa.large_string()),
                      "doc_id": pa.array([], pa.int64()),
                      "win_idx": pa.array([], pa.int64()),
                      **{c: t[c].slice(0, 0) for c in carry}})
    if t.num_rows == 0:
        return empty
    text = pc.cast(t["text"], pa.large_string())
    toks = pc.split_pattern(
        text.combine_chunks() if isinstance(text, pa.ChunkedArray)
        else text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = pc.list_flatten(toks)
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nwin = (lens + _PARA_W - 1) // _PARA_W
    total = int(nwin.sum())
    if total == 0:
        return empty
    doc_rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), nwin)
    win_first = np.concatenate(([0], np.cumsum(nwin)))
    win_within = np.arange(total, dtype=np.int64) \
        - np.repeat(win_first[:-1], nwin)
    tok_first = np.concatenate(([0], np.cumsum(lens)))
    starts = tok_first[doc_rep] + _PARA_W * win_within
    offsets = np.append(starts, tok_first[-1]).astype(np.int64)
    win_list = pa.LargeListArray.from_arrays(pa.array(offsets), flat)
    para = pc.binary_join(win_list, pa.scalar(" ", pa.large_string()))
    doc = t["doc_id"].to_numpy(zero_copy_only=False)[doc_rep]
    rep_idx = pa.array(doc_rep, pa.int64())
    return pa.table({"para": para,
                     "doc_id": pa.array(doc, pa.int64()),
                     "win_idx": pa.array(win_within + 1, pa.int64()),
                     **{c: (t[c].combine_chunks()
                            if isinstance(t[c], pa.ChunkedArray)
                            else t[c]).take(rep_idx) for c in carry}})


def _marked_windows(sf_dir: str, carry_para: bool):
    """Explode windows and mark every non-first copy of each distinct
    paragraph (first = smallest (doc_id, win_idx)) — ONE hash partition on
    the paragraph string; the mark is a vectorized factorize + lexsort.
    carry_para keeps (win_idx, para) through the mark for the rewrite
    variant; the rollup drops them so its second shuffle ships one slim row
    per window."""
    import ray.data as rd

    from ..ops.partition import partitioned_apply

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"],
                         override_num_blocks=_anb(path))

    def mark(part: pa.Table) -> pa.Table:
        import pandas as pd

        codes, _ = pd.factorize(part["para"].to_numpy(zero_copy_only=False))
        doc = part["doc_id"].to_numpy(zero_copy_only=False)
        idx = part["win_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, doc, codes))
        cs = codes[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        cols = {
            "doc_id": pa.array(doc[order], pa.int64()),
            "is_dup": pa.array((~first).astype(np.int64), pa.int64()),
        }
        if carry_para:
            oi = pa.array(order, pa.int64())
            cols["win_idx"] = pa.array(idx[order], pa.int64())
            cols["para"] = part["para"].combine_chunks().take(oi) \
                if isinstance(part["para"], pa.ChunkedArray) \
                else part["para"].take(oi)
        return pa.table(cols)

    return partitioned_apply(
        ds.map_batches(_paragraph_windows, batch_format="pyarrow"),
        "para", mark)


def q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph-level exact dedup (Wenzek et al. 2019): split
    each document into fixed 10-token windows ("paragraphs" — the synthetic
    corpus has no newline structure, so the window boundary is the
    deterministic stand-in), first occurrence of each distinct paragraph
    across the corpus wins (order = (doc_id, win_idx)), and every later
    copy is marked duplicate. Output is the per-document rollup a cleaning
    pipeline acts on: paragraph count, duplicated-paragraph count, dup
    fraction.

    Plan shape (2 exchanges, both linear): window explode (pure map) ->
    paragraph-hash mark (_marked_windows) -> per-batch combiner +
    grouped_aggregate on doc_id. No driver-side state at any point."""
    from ..ops.partition import grouped_aggregate
    from ..util import round_half_away

    marked = _marked_windows(sf_dir, carry_para=False)

    def combiner(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id"]).aggregate(
            [("is_dup", "count"), ("is_dup", "sum")])
        return g.rename_columns(["doc_id", "n_paras", "n_dup"])

    agg = grouped_aggregate(
        marked.map_batches(combiner, batch_format="pyarrow"),
        "doc_id", [("n_paras", "sum"), ("n_dup", "sum")],
        ["n_paras", "n_dup"])

    def frac(t: pa.Table) -> pa.Table:
        nd = t["n_dup"].to_numpy(zero_copy_only=False).astype(np.float64)
        np_ = t["n_paras"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_paras": pc.cast(t["n_paras"], pa.int64()),
            "n_dup": pc.cast(t["n_dup"], pa.int64()),
            "dup_frac": pa.array(round_half_away(nd / np_, 4), pa.float64()),
        })

    return agg.map_batches(frac, batch_format="pyarrow")


SQL_PARAGRAPH_DEDUP = f"""
with tok as (select doc_id, string_split(text, ' ') as ts from documents),
w as (select doc_id, cast(i as bigint) as win_idx,
             array_to_string(
               list_slice(ts, (i - 1) * {_PARA_W} + 1, i * {_PARA_W}),
               ' ') as para
      from tok, lateral (select unnest(generate_series(1,
             cast(ceil(len(ts) / {_PARA_W}.0) as bigint))) as i) g),
m as (select doc_id, win_idx,
             case when row_number() over (partition by para
                    order by doc_id, win_idx) = 1 then 0 else 1 end as is_dup
      from w)
select doc_id, count(*) as n_paras, cast(sum(is_dup) as bigint) as n_dup,
       round(cast(sum(is_dup) as double) / count(*), 4) as dup_frac
from m group by doc_id
"""

DEDUP_QUERIES["dedup_paragraph_exact"] = (q_paragraph_dedup,
                                          SQL_PARAGRAPH_DEDUP)


def q_paragraph_rewrite(sf_dir: str):
    """The CCNet rewrite itself: each document with its duplicate
    paragraphs REMOVED (kept windows re-joined in window order; a document
    whose every paragraph was seen earlier becomes NULL, matching SQL
    string_agg-over-empty). This is the operator a 100-TB cleaning run
    materializes — the rollup (dedup_paragraph_exact) is its audit table.

    Plan: window explode -> paragraph-hash mark (carrying the paragraph
    text) -> ONE hash partition on doc_id where each doc's kept windows are
    re-joined vectorized (sort + run-boundary ListArray + binary_join);
    docs whose windows were all duplicates are re-emitted with NULL text
    via a searchsorted alignment, never dropped."""
    from ..ops.partition import partitioned_apply

    marked = _marked_windows(sf_dir, carry_para=True)

    def assemble(part: pa.Table) -> pa.Table:
        doc = part["doc_id"].to_numpy(zero_copy_only=False)
        idx = part["win_idx"].to_numpy(zero_copy_only=False)
        dup = part["is_dup"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, doc))
        doc_s, dup_s = doc[order], dup[order]
        para_col = part["para"]
        para_s = (para_col.combine_chunks()
                  if isinstance(para_col, pa.ChunkedArray)
                  else para_col).take(pa.array(order, pa.int64()))
        docs_all = np.unique(doc_s)
        keep = dup_s == 0
        kept_doc = doc_s[keep]
        kept_para = para_s.filter(pa.array(keep))
        # per-doc slice boundaries inside the kept (doc-sorted) run
        lo = np.searchsorted(kept_doc, docs_all, side="left")
        hi = np.searchsorted(kept_doc, docs_all, side="right")
        # ListArray offsets must be monotone: lo == previous hi because
        # kept_doc is sorted, so [lo_0..lo_n, total] is exactly the fence
        fence = np.append(lo, len(kept_doc)).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(pa.array(fence), kept_para)
        joined = pc.binary_join(lists, pa.scalar(" ", pa.large_string()))
        n_kept = (hi - lo).astype(np.int64)
        clean = pc.if_else(pa.array(n_kept > 0),
                           pc.cast(joined, pa.string()),
                           pa.scalar(None, pa.string()))
        return pa.table({
            "doc_id": pa.array(docs_all, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "clean_text": clean,
        })

    return partitioned_apply(marked, "doc_id", assemble)


SQL_PARAGRAPH_REWRITE = f"""
with tok as (select doc_id, string_split(text, ' ') as ts from documents),
w as (select doc_id, cast(i as bigint) as win_idx,
             array_to_string(
               list_slice(ts, (i - 1) * {_PARA_W} + 1, i * {_PARA_W}),
               ' ') as para
      from tok, lateral (select unnest(generate_series(1,
             cast(ceil(len(ts) / {_PARA_W}.0) as bigint))) as i) g),
m as (select doc_id, win_idx, para,
             case when row_number() over (partition by para
                    order by doc_id, win_idx) = 1 then 0 else 1 end as is_dup
      from w)
select doc_id,
       cast(count(*) filter (where is_dup = 0) as bigint) as n_kept,
       string_agg(para, ' ' order by win_idx) filter (where is_dup = 0)
         as clean_text
from m group by doc_id
"""

DEDUP_QUERIES["dedup_paragraph_rewrite"] = (q_paragraph_rewrite,
                                            SQL_PARAGRAPH_REWRITE)


def q_boilerplate_paras(sf_dir: str):
    """Per-host boilerplate paragraph detection (the C4/CCNet boilerplate-
    removal half — headers/footers/navigation repeat WITHIN a host, which
    global dedup's first-wins keeps once per corpus instead of removing):
    a paragraph is boilerplate for its source when >= 2 distinct docs of
    that source contain it AND it appears in > 5% of the source's docs.
    Output is the per-doc rollup (n_paras, n_boiler, boiler_frac).

    Plan (2 linear exchanges, mirror of dedup_paragraph_exact): window
    explode carrying source -> ONE hash partition on (source, para) where
    the distinct-doc count per paragraph and the threshold test are
    vectorized (factorize + unique pairs), docs-per-source resolved from a
    |sources|-row broadcast dict -> per-doc combiner + grouped_aggregate.
    The threshold compare is cast(nd as double)/D > 0.05 on BOTH sides
    (IEEE division, identical literal), so the mark is bit-consistent with
    the oracle."""
    import ray.data as rd

    from ..ops.partition import grouped_aggregate, low_card_aggregate, \
        partitioned_apply
    from ..util import round_half_away

    path = f"{sf_dir}/documents.parquet"
    docs_per_src = {
        r["source"]: r["n_docs"]
        for r in low_card_aggregate(
            rd.read_parquet(path, columns=["source"],
                            override_num_blocks=_anb(path)),
            "source", [("source", "count_all")], ["n_docs"]).take_all()}

    ds = rd.read_parquet(path, columns=["doc_id", "text", "source"],
                         override_num_blocks=_anb(path))
    wins = ds.map_batches(
        lambda t: _paragraph_windows(t, carry=("source",)),
        batch_format="pyarrow")

    def mark(part: pa.Table) -> pa.Table:
        import pandas as pd

        src = part["source"].to_numpy(zero_copy_only=False)
        para = part["para"].to_numpy(zero_copy_only=False)
        doc = part["doc_id"].to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(
            pd.MultiIndex.from_arrays([src, para]), sort=False)
        # distinct docs per (source, para): unique over (code, doc) pairs
        pair = np.unique(np.stack([codes, doc], axis=1), axis=0)
        nd = np.bincount(pair[:, 0], minlength=int(codes.max()) + 1 if
                         len(codes) else 0).astype(np.float64)
        D = pd.Series(src).map(docs_per_src).to_numpy(dtype=np.float64)
        nd_row = nd[codes]
        boiler = (nd_row >= 2) & (nd_row / D > 0.05)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "is_boiler": pa.array(boiler.astype(np.int64), pa.int64()),
        })

    marked = partitioned_apply(wins, ["source", "para"], mark)

    def combiner(t: pa.Table) -> pa.Table:
        g = t.group_by(["doc_id"]).aggregate(
            [("is_boiler", "count"), ("is_boiler", "sum")])
        return g.rename_columns(["doc_id", "n_paras", "n_boiler"])

    agg = grouped_aggregate(
        marked.map_batches(combiner, batch_format="pyarrow"),
        "doc_id", [("n_paras", "sum"), ("n_boiler", "sum")],
        ["n_paras", "n_boiler"])

    def frac(t: pa.Table) -> pa.Table:
        nb = t["n_boiler"].to_numpy(zero_copy_only=False).astype(np.float64)
        np_ = t["n_paras"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_paras": pc.cast(t["n_paras"], pa.int64()),
            "n_boiler": pc.cast(t["n_boiler"], pa.int64()),
            "boiler_frac": pa.array(round_half_away(nb / np_, 4),
                                    pa.float64()),
        })

    return agg.map_batches(frac, batch_format="pyarrow")


SQL_BOILERPLATE = f"""
with tok as (select doc_id, source, string_split(text, ' ') as ts
             from documents),
w as (select doc_id, source, cast(i as bigint) as win_idx,
             array_to_string(
               list_slice(ts, (i - 1) * {_PARA_W} + 1, i * {_PARA_W}),
               ' ') as para
      from tok, lateral (select unnest(generate_series(1,
             cast(ceil(len(ts) / {_PARA_W}.0) as bigint))) as i) g),
d as (select source, count(*) as n_docs from documents group by source),
f as (select source, para, count(distinct doc_id) as nd
      from w group by 1, 2),
m as (select w.doc_id,
             case when f.nd >= 2
                   and cast(f.nd as double) / d.n_docs > 0.05
                  then 1 else 0 end as is_boiler
      from w join f using (source, para) join d using (source))
select doc_id, count(*) as n_paras,
       cast(sum(is_boiler) as bigint) as n_boiler,
       round(cast(sum(is_boiler) as double) / count(*), 4) as boiler_frac
from m group by doc_id
"""

DEDUP_QUERIES["txt_boilerplate_paras"] = (q_boilerplate_paras,
                                          SQL_BOILERPLATE)


def q_kmv_distinct(sf_dir: str):
    """KMV (k-minimum-values) approximate distinct customers per order
    status — the order-statistic sketch next to HLL (Bar-Yossef et al.
    2002): each batch keeps the k=256 smallest md5 hashes of its distinct
    values per group, the driver unions minima (O(blocks x groups x k)
    uint64s, mergeable in any tree order). Estimate (k-1)/R_k is a single
    multiply+divide float chain over exact integers, so the SQL oracle
    reproduces every group's integer bit-for-bit; the accuracy/merge gates
    live in pytest (tests/test_windows_quantile.py)."""
    import ray.data as rd

    from ..ops.sketch import grouped_kmv_distinct_stable
    from ..util import adaptive_num_blocks

    path = f"{sf_dir}/orders.parquet"
    ds = rd.read_parquet(path, columns=["o_orderstatus", "o_custkey"],
                         override_num_blocks=adaptive_num_blocks(path))
    est = grouped_kmv_distinct_stable(ds, "o_orderstatus", "o_custkey",
                                      k=256)
    keys = sorted(est, key=lambda k: (k is None, k))
    return pa.table({"o_orderstatus": pa.array(keys, pa.string()),
                     "approx_distinct_custkeys": pa.array(
                         [est[k] for k in keys], pa.int64())})


# Exact mirror of grouped_kmv_distinct_stable at k=256: the distinct md5
# hash SET per group (set semantics — a hash collision collapses on both
# sides), the 256 smallest by window rank, count + max as the summary,
# and the same single-multiply single-divide float chain.
SQL_KMV_DISTINCT = """
with v as (select distinct o_orderstatus as k, o_custkey as v from orders
           where o_custkey is not null),
h as (select distinct k, md5_number_lower(cast(v as varchar)) as h from v),
r as (select k, h, row_number() over (partition by k order by h) as rn
      from h),
kk as (select k, count(*) as c, max(h) as hk from r where rn <= 256
       group by k)
select k as o_orderstatus,
       case when c < 256 then cast(c as bigint)
            else cast(floor(255 * 18446744073709551616.0
                            / cast(hk as double) + 0.5) as bigint)
       end as approx_distinct_custkeys
from kk
"""

DEDUP_QUERIES["agg_kmv_distinct"] = (q_kmv_distinct, SQL_KMV_DISTINCT)


# ---------------------------------------------------------- BM25 top-k

def q_bm25_topk(sf_dir: str, terms=("spark", "join", "window"),
                k: int = 50, k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 fulltext top-k (the production ranking function behind
    the toy term-count scorer in search_fulltext_topk; cf. the reference's
    Lucene fulltext index, mcp/src/graph/queries.ts:512-560). Two passes:
    (1) a combiner stats pass — per-batch (n_docs, Σdl) plus per-query-term
    document frequencies, one tiny partial row per block; (2) a scoring
    pass — vectorized per-term tf bincounts, the BM25 formula evaluated in
    EXACTLY the SQL oracle's operator order (same left-assoc sums, same
    literal k1+1 = 2.2, ln per distinct df via math.log), so scores are
    bit-identical and the (score desc, doc_id) order — including the rank-k
    boundary — is deterministic on both sides. Per-batch partial top-k
    means only k rows per block reach the sort exchange."""
    import math

    import ray.data as rd

    from ..ops.search import partial_topk

    terms = list(terms)
    path = f"{sf_dir}/documents.parquet"
    docs = rd.read_parquet(path, columns=["doc_id", "text"],
                           override_num_blocks=_anb(path))

    term_arrs = [pa.array([t]) for t in terms]

    def _tf_matrix(t: pa.Table):
        text = pc.cast(t["text"], pa.large_string())
        text = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        toks = pc.split_pattern(text, " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        n = t.num_rows
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        tfs = []
        for ta in term_arrs:
            hit = pc.is_in(flat, value_set=ta).to_numpy(zero_copy_only=False)
            tfs.append(np.bincount(parent, weights=hit.astype(np.float64),
                                   minlength=n))
        return dl, tfs

    def stats(t: pa.Table) -> pa.Table:
        dl, tfs = _tf_matrix(t)
        row = {"n_docs": np.int64(t.num_rows),
               "sum_dl": np.int64(dl.sum())}
        for i, tf in enumerate(tfs):
            row[f"df{i}"] = np.int64((tf > 0).sum())
        return pa.Table.from_pylist([row])

    parts = docs.map_batches(stats, batch_format="pyarrow").take_all()
    n_docs = float(sum(r["n_docs"] for r in parts))
    avgdl = sum(r["sum_dl"] for r in parts) / sum(r["n_docs"] for r in parts)
    idf = []
    for i in range(len(terms)):
        df = float(sum(r[f"df{i}"] for r in parts))
        idf.append(math.log(1 + (n_docs - df + 0.5) / (df + 0.5)))

    def score(t: pa.Table) -> pa.Table:
        dl, tfs = _tf_matrix(t)
        # mirror the oracle: 1 - b + b*dl/avgdl parses ((1-b) + ((b*dl)/avgdl))
        norm = (1 - b) + (b * dl) / avgdl
        s = np.zeros(t.num_rows, np.float64)
        for i, tf in enumerate(tfs):       # left-assoc term sum, fixed order
            s = s + idf[i] * (tf * (k1 + 1)) / (tf + k1 * norm)
        out = pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                        "score": pa.array(s, pa.float64())})
        out = out.filter(pc.greater(out["score"], 0.0))
        return partial_topk(out, "score", "doc_id", k)

    top = docs.map_batches(score, batch_format="pyarrow") \
        .sort(["score", "doc_id"], descending=[True, False]).limit(k) \
        .take_all()
    from ..util import round_half_away

    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
        "score": pa.array(round_half_away(
            np.asarray([r["score"] for r in top], np.float64), 6),
            pa.float64())})


SQL_BM25_TOPK = """
with toks as (select doc_id, unnest(string_split(text, ' ')) as tok
              from documents),
dl as (select doc_id, cast(count(*) as double) as dl from toks group by doc_id),
stats as (select cast(count(*) as double) as n, sum(dl) / count(*) as avgdl
          from dl),
df as (select
  cast(count(distinct case when tok = 'spark' then doc_id end) as double) as df0,
  cast(count(distinct case when tok = 'join' then doc_id end) as double) as df1,
  cast(count(distinct case when tok = 'window' then doc_id end) as double) as df2
  from toks),
tf as (select doc_id,
  cast(count(*) filter (where tok = 'spark') as double) as tf0,
  cast(count(*) filter (where tok = 'join') as double) as tf1,
  cast(count(*) filter (where tok = 'window') as double) as tf2
  from toks group by doc_id),
sc as (select tf.doc_id,
  ln(1 + (n - df0 + 0.5) / (df0 + 0.5))
    * (tf0 * 2.2) / (tf0 + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
  + ln(1 + (n - df1 + 0.5) / (df1 + 0.5))
    * (tf1 * 2.2) / (tf1 + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl))
  + ln(1 + (n - df2 + 0.5) / (df2 + 0.5))
    * (tf2 * 2.2) / (tf2 + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgdl)) as score
  from tf join dl on tf.doc_id = dl.doc_id, stats, df)
select doc_id, round(score, 6) as score from sc
where score > 0 order by score desc, doc_id limit 50
"""

DEDUP_QUERIES["search_bm25_topk"] = (q_bm25_topk, SQL_BM25_TOPK)


# ----------------------------------------------- k-means assignment step

def q_kmeans_assign(sf_dir: str, n_anchors: int = 8):
    """One k-means ASSIGNMENT step over the embedding table (the building
    block of distributed Lloyd iterations and of IVF coarse quantization —
    cf. ops/ann.py's deterministic IVF): the first ``n_anchors`` vectors
    are the broadcast codebook, every embedding goes to its nearest anchor
    by Euclidean distance. Distances are rounded to 4 decimals BEFORE the
    argmin and ties break on anchor id, so the assignment is deterministic
    and SQL-reproducible (the sim_range_search rounding convention);
    per-batch the kernel is one (rows × anchors) vectorized distance
    matrix against the plasma-cached codebook. Output: per-vector cluster
    + distance, plus nothing corpus-scale on the driver (per-cluster
    rollups live in the oracle's hands)."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    from ..ops.relational import _cached_resolve, broadcast
    from ..util import round_half_away

    path = f"{sf_dir}/embeddings.parquet"
    anchors_t = pq_.read_table(path, columns=["vec_id", "embedding"])
    mask = pc.less(anchors_t["vec_id"], n_anchors)
    mask = mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask
    at = anchors_t.filter(mask).sort_by([("vec_id", "ascending")])
    A = np.asarray(at["embedding"].to_pylist(), np.float64)   # (k, d)
    aids = np.asarray(at["vec_id"].to_pylist(), np.int64)
    ref = broadcast((aids, A))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"],
                         override_num_blocks=_anb(path))

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        aids_, A_ = _cached_resolve(_ref)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        X = np.asarray(emb.to_pylist(), np.float64)            # (n, d)
        # per-dim left-assoc accumulation == DuckDB list_distance term order
        n, k = X.shape[0], A_.shape[0]
        sq = np.zeros((n, k), np.float64)
        for d in range(X.shape[1]):
            diff = X[:, d:d + 1] - A_[None, :, d]
            sq = sq + diff * diff
        dist = round_half_away(np.sqrt(sq), 4)
        best = np.argmin(dist, axis=1)      # first index wins = lowest aid
        return pa.table({
            "vec_id": pc.cast(t["vec_id"], pa.int64()),
            "cluster": pa.array(aids_[best], pa.int64()),
            "dist": pa.array(dist[np.arange(n), best], pa.float64())})

    return ds.map_batches(assign, batch_format="pyarrow")


SQL_KMEANS_ASSIGN = """
with q as (select vec_id as aid, embedding as ae
           from embeddings where vec_id < 8),
d as (select e.vec_id, q.aid,
             round(cast(list_distance(cast(e.embedding as double[]),
                                      cast(q.ae as double[])) as double), 4)
               as dist
      from embeddings e, q),
r as (select *, row_number() over (partition by vec_id
                                   order by dist, aid) as rn from d)
select vec_id, aid as cluster, dist from r where rn = 1
"""

DEDUP_QUERIES["sim_kmeans_assign"] = (q_kmeans_assign, SQL_KMEANS_ASSIGN)


# ----------------------------------------- KMV Jaccard between sources

def q_kmv_jaccard(sf_dir: str, src_a: str = "src0", src_b: str = "src1",
                  k: int = 256):
    """Cross-corpus similarity from mergeable sketches: the KMV-estimated
    Jaccard between two sources' 3-token-shingle sets (Beyer et al. 2007 —
    the sketch that prices a candidate corpus against what you already
    have WITHOUT a corpus-scale set intersection). Per batch, each
    source's k smallest md5-low64 shingle hashes (same version-stable hash
    family as the KMV/HLL/CMS queries); the driver unions O(blocks·k)
    uint64s per source, takes the union sketch's k minima and counts
    membership in both sides — all exact integer ops plus ONE integer-
    ratio division, so the SQL oracle reproduces the estimate bit-for-bit."""
    from ..ops.sketch import _md5_hashes_distinct
    from ..pipelines.queries_llm import _shingle_table
    from ..util import round_half_away

    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text", "source"],
                         override_num_blocks=_anb(path))

    def partial(t: pa.Table) -> pa.Table:
        out_src, out_mins = [], []
        for src in (src_a, src_b):
            m = pc.equal(t["source"], src)
            m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
            f = t.filter(m)
            if f.num_rows == 0:
                continue
            sh = _shingle_table(f, k=3)
            hs = _md5_hashes_distinct(sh["g"])
            out_src.append(src)
            out_mins.append(np.sort(hs)[:k])
        return pa.table({"source": pa.array(out_src, pa.string()),
                         "mins": pa.array(out_mins, pa.list_(pa.uint64()))})

    sketches: dict[str, np.ndarray] = {src_a: np.array([], np.uint64),
                                       src_b: np.array([], np.uint64)}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        merged = np.concatenate((sketches[r["source"]],
                                 np.asarray(r["mins"], np.uint64)))
        sketches[r["source"]] = np.unique(merged)[:k]
    A, B = sketches[src_a], sketches[src_b]
    U = np.unique(np.concatenate((A, B)))[:k]
    both = int(np.sum(np.isin(U, A) & np.isin(U, B)))
    n_u = int(len(U))
    est = round_half_away(np.array([both / n_u if n_u else 0.0]), 6)
    return pa.table({"n_union_sketch": pa.array([n_u], pa.int64()),
                     "n_both": pa.array([both], pa.int64()),
                     "jaccard_est": pa.array(est, pa.float64())})


SQL_KMV_JACCARD = """
with ta as (
  select distinct md5_number_lower(g) as h from (
    select s[i] || ' ' || s[i+1] || ' ' || s[i+2] as g
    from (select string_split(text, ' ') as s from documents
          where source = 'src0') t,
         lateral (select unnest(generate_series(1, len(s) - 2)) as i) ii)),
ra as (select h from (select h, row_number() over (order by h) as rn
                      from ta) where rn <= 256),
tb as (
  select distinct md5_number_lower(g) as h from (
    select s[i] || ' ' || s[i+1] || ' ' || s[i+2] as g
    from (select string_split(text, ' ') as s from documents
          where source = 'src1') t,
         lateral (select unnest(generate_series(1, len(s) - 2)) as i) ii)),
rb as (select h from (select h, row_number() over (order by h) as rn
                      from tb) where rn <= 256),
u as (select distinct h from (select h from ra union all
                              select h from rb)),
uk as (select h from (select h, row_number() over (order by h) as rn
                      from u) where rn <= 256)
select cast(count(*) as bigint) as n_union_sketch,
       cast(sum(case when h in (select h from ra)
                      and h in (select h from rb)
                     then 1 else 0 end) as bigint) as n_both,
       round(cast(sum(case when h in (select h from ra)
                            and h in (select h from rb)
                           then 1 else 0 end) as double)
             / count(*), 6) as jaccard_est
from uk
"""

DEDUP_QUERIES["agg_kmv_jaccard"] = (q_kmv_jaccard, SQL_KMV_JACCARD)


def q_langid_confusion(sf_dir: str):
    """Classifier-evaluation rollup: the labeled-lang × predicted-lang
    confusion matrix of the stopword langid heuristic (the eval every
    curation pipeline runs before trusting a filter) with per-cell counts
    and the per-actual-class rate. ONE combiner pass — the prediction is
    computed inline per batch (same kernel as txt_langid) and only
    |langs|² count partials leave the worker; the rate is an exact
    integer-ratio division."""
    import ray.data as rd

    from ..ops.partition import low_card_aggregate
    from ..util import round_half_away

    path = f"{sf_dir}/documents.parquet"
    ds = rd.read_parquet(path, columns=["lang", "text"],
                         override_num_blocks=_anb(path))

    def cell(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(t["text"], pa.large_string()), " ")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=pa.array(["a", "the"])) \
            .to_numpy(zero_copy_only=False)
        has = np.bincount(parent, weights=is_stop.astype("float64"),
                          minlength=t.num_rows) > 0
        guess = np.where(has, "en", "und")
        return pa.table({"lang": t["lang"],
                         "lang_guess": pa.array(guess, pa.string())})

    m = low_card_aggregate(ds.map_batches(cell, batch_format="pyarrow"),
                           ["lang", "lang_guess"],
                           [(None, "count_all")], ["n"])
    t = pa.Table.from_pylist(m.take_all(), schema=pa.schema(
        [("lang", pa.string()), ("lang_guess", pa.string()),
         ("n", pa.int64())]))
    per_lang = t.group_by("lang").aggregate([("n", "sum")]) \
        .rename_columns(["lang", "lang_total"])
    j = t.join(per_lang, keys=["lang"])
    rate = round_half_away(
        j["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        / j["lang_total"].to_numpy(zero_copy_only=False).astype(np.float64),
        4)
    out = pa.table({"lang": j["lang"], "lang_guess": j["lang_guess"],
                    "n": j["n"], "rate": pa.array(rate, pa.float64())})
    return out.sort_by([("lang", "ascending"), ("lang_guess", "ascending")])


SQL_LANGID_CONFUSION = """
with g as (select lang,
                  case when len(list_filter(string_split(text, ' '),
                                            x -> x in ('the', 'a'))) > 0
                       then 'en' else 'und' end as lang_guess
           from documents),
c as (select lang, lang_guess, count(*) as n from g group by 1, 2),
t as (select lang, sum(n) as lang_total from c group by 1)
select c.lang, c.lang_guess, c.n,
       round(cast(c.n as double) / t.lang_total, 4) as rate
from c join t on c.lang = t.lang
order by c.lang, c.lang_guess
"""

DEDUP_QUERIES["txt_langid_confusion"] = (q_langid_confusion,
                                         SQL_LANGID_CONFUSION)


def q_centroid_update(sf_dir: str, n_anchors: int = 8):
    """The UPDATE half of a distributed Lloyd iteration (sim_kmeans_assign
    is the assignment half): per cluster, the element-wise mean of its
    member vectors, emitted long-form (cluster, dim, centroid) so SQL can
    reproduce it via unnest-with-ordinality. Per batch the kernel is one
    assignment matmul plus a per-cluster np.add.at fold into (k, d) sum
    partials — constant-size rows leave each worker regardless of corpus
    scale; the driver adds k×d doubles and divides by exact counts (sum
    order inside a cluster differs from DuckDB's, so centroids round to
    6 — values are O(0.1), eleven orders of margin)."""
    import pyarrow.parquet as pq_
    import ray.data as rd

    from ..ops.relational import _cached_resolve, broadcast
    from ..util import round_half_away

    path = f"{sf_dir}/embeddings.parquet"
    anchors_t = pq_.read_table(path, columns=["vec_id", "embedding"])
    mask = pc.less(anchors_t["vec_id"], n_anchors)
    mask = mask.combine_chunks() if isinstance(mask, pa.ChunkedArray) else mask
    at = anchors_t.filter(mask).sort_by([("vec_id", "ascending")])
    A = np.asarray(at["embedding"].to_pylist(), np.float64)
    aids = np.asarray(at["vec_id"].to_pylist(), np.int64)
    ref = broadcast((aids, A))

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"],
                         override_num_blocks=_anb(path))

    def partial(t: pa.Table, _ref=ref) -> pa.Table:
        aids_, A_ = _cached_resolve(_ref)
        emb = t["embedding"]
        emb = emb.combine_chunks() if isinstance(emb, pa.ChunkedArray) else emb
        X = np.asarray(emb.to_pylist(), np.float64)
        n, k, d = X.shape[0], A_.shape[0], A_.shape[1]
        sq = np.zeros((n, k), np.float64)
        for dim in range(d):
            diff = X[:, dim:dim + 1] - A_[None, :, dim]
            sq = sq + diff * diff
        dist = round_half_away(np.sqrt(sq), 4)
        best = np.argmin(dist, axis=1)
        sums = np.zeros((k, d), np.float64)
        np.add.at(sums, best, X)
        cnt = np.bincount(best, minlength=k).astype(np.int64)
        return pa.table({
            "cluster": pa.array(aids_, pa.int64()),
            "n": pa.array(cnt, pa.int64()),
            "sums": pa.array(list(sums), pa.list_(pa.float64()))})

    k, d = A.shape
    tot = np.zeros((k, d), np.float64)
    cnt = np.zeros(k, np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        i = int(np.searchsorted(aids, r["cluster"]))
        tot[i] += np.asarray(r["sums"], np.float64)
        cnt[i] += r["n"]
    rows = []
    for i, aid in enumerate(aids):
        if cnt[i] == 0:
            continue
        cen = round_half_away(tot[i] / cnt[i], 6)
        for dim in range(d):
            rows.append({"cluster": int(aid), "dim": dim + 1,
                         "n": int(cnt[i]), "centroid": float(cen[dim])})
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("cluster", pa.int64()), ("dim", pa.int64()), ("n", pa.int64()),
         ("centroid", pa.float64())]))


SQL_CENTROID_UPDATE = """
with q as (select vec_id as aid, embedding as ae
           from embeddings where vec_id < 8),
dd as (select e.vec_id, q.aid,
              round(cast(list_distance(cast(e.embedding as double[]),
                                       cast(q.ae as double[]))
                         as double), 4) as dist,
              e.embedding as emb
       from embeddings e, q),
r as (select *, row_number() over (partition by vec_id
                                   order by dist, aid) as rn from dd),
asgn as (select vec_id, aid as cluster, emb from r where rn = 1),
x as (select cluster, i.i as dim, cast(emb[i.i] as double) as v
      from asgn, lateral (select unnest(generate_series(1, len(emb))) as i) i)
select cluster, cast(dim as bigint) as dim,
       cast(count(*) as bigint) as n,
       round(avg(v), 6) as centroid
from x group by cluster, dim order by cluster, dim
"""

DEDUP_QUERIES["sim_centroid_update"] = (q_centroid_update,
                                        SQL_CENTROID_UPDATE)
