"""KG-pipeline queries over the documents-derived pages corpus, each with a
DuckDB oracle over the raw ``documents`` table.

The pages corpus is a deterministic function of ``documents``
(see stakgraph_ray.sources.pages), so every pipeline result is expressible
as SQL over ``documents`` — that's the correctness gate: the Ray pipeline
and the SQL must agree on row count, schema and values.
"""

from __future__ import annotations


import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG
from ..functions import vocab
from ..sources.pages import read_pages
from ..stages.extract import ExtractTextStage, bigram_rows, mention_rows
from ..stages.link import bigram_linker_fn, make_linker_stage, term_linker_fn

# ---------------------------------------------------------------- SQL pieces

URL_SQL = ("'https://' || source || '.example.org/doc/' || "
           "lpad(cast(doc_id as varchar), 8, '0')")
SKIP_SQL = "doc_id % 1000 in (13, 29)"
NOT_SKIP_SQL = "doc_id % 1000 not in (13, 29)"


def _sql_list(vals) -> str:
    return ", ".join(f"'{v}'" for v in sorted(vals))


STOP_LIST = _sql_list(vocab.STOPWORDS)
CANON_LIST = _sql_list(vocab.CANONICAL_TERMS)
ALIAS_WHENS = " ".join(
    f"when {{c}} = '{a}' then '{c2}'" for a, c2 in sorted(vocab.ALIASES.items()))
ALIAS_KEYS = _sql_list(vocab.ALIASES)


def canon_sql(col: str) -> str:
    whens = ALIAS_WHENS.replace("{c}", col)
    return (f"case when {col} in ({CANON_LIST}) then {col} {whens} "
            f"else {col} end")


def conf_sql(col: str) -> str:
    # cast: bare 1.0/0.9/0.3 literals make the CASE a DECIMAL(2,1) in DuckDB
    # while the pipeline emits float64 — the driver's value-hash is
    # dtype-sensitive, so force double.
    return (f"cast(case when {col} in ({CANON_LIST}) then 1.0 "
            f"when {col} in ({ALIAS_KEYS}) then 0.9 else 0.3 end as double)")


STRATEGY_SQL = ("case when confidence >= 0.95 then 'exact' "
                "when confidence >= 0.85 then 'alias' "
                "when confidence >= 0.75 then 'normalized' "
                "else 'unverified' end")

SANITIZE_SQL = "lower(regexp_replace({c}, '[^a-zA-Z0-9]', '', 'g'))"

# ---------------------------------------------------------------- Ray side


_EXTRACT_CACHE: dict[str, object] = {}
_PAGES_CACHE: dict[str, object] = {}


def pages_cached(sf_dir: str):
    """Materialized synthetic pages corpus shared across queries in a
    session. Five query families consume the RAW html column (the probe
    extractors live in comments that text extraction strips), and each was
    re-deriving the corpus from documents.parquet per query — the dominant
    cost of the probe suite at sf0.1. Same session-cache pattern as
    ``_extracted`` below; object-store backed (sf0.1 ≈ 10 MB), spillable."""
    ds = _PAGES_CACHE.get(sf_dir)
    if ds is None:
        ds = read_pages(sf_dir).materialize()
        _PAGES_CACHE[sf_dir] = ds
    return ds


def _extracted(sf_dir: str):
    """Materialized extract checkpoint shared across queries in a session —
    the flagship's extract-checkpoint analog (materialize.py stage 1):
    HTML extraction runs once per corpus, every downstream consumer streams
    from the materialized blocks instead of re-executing the chain."""
    ds = _EXTRACT_CACHE.get(sf_dir)
    if ds is None:
        ds = pages_cached(sf_dir).map_batches(
            ExtractTextStage(), batch_format="pyarrow",
            batch_size=DEFAULT_CONFIG.batch_size).materialize()
        _EXTRACT_CACHE[sf_dir] = ds
    return ds


def q_extract_text(sf_dir: str):
    """url, text_sha256, skipped — the byte-identical invariant surface."""
    ds = _extracted(sf_dir)
    return ds.map_batches(
        lambda t: t.select(["url", "text_sha256", "skipped"]),
        batch_format="pyarrow")


SQL_EXTRACT_TEXT = f"""
select {URL_SQL} as url,
       case when {SKIP_SQL} then sha256('') else sha256(text) end as text_sha256,
       {SKIP_SQL} as skipped
from documents
"""


def q_page_nodes(sf_dir: str):
    """Page-node identity columns: node_key, name, file, hash, docs
    (docs = extracted <title>, the comment-attachment analog)."""
    from .kg import page_node_rows

    ds = _extracted(sf_dir).map_batches(page_node_rows, batch_format="pyarrow")
    return ds.map_batches(
        lambda t: t.select(["node_key", "name", "file", "hash", "docs"]),
        batch_format="pyarrow")


_SAN_URL = SANITIZE_SQL.replace("{c}", "url")
SQL_PAGE_NODES = f"""
with p as (select {URL_SQL} as url,
                  case when {SKIP_SQL} then sha256('') else sha256(text) end as hash,
                  case when {SKIP_SQL} then NULL
                       else 'Doc ' || cast(doc_id as varchar) end as docs
           from documents)
select 'page-' || {_SAN_URL} || '-' || {_SAN_URL} as node_key,
       url as name, url as file, hash, docs
from p
"""


def q_mention_edges(sf_dir: str):
    """Aggregated MENTIONS: url, canonical, weight, confidence, strategy."""
    from ..ops.partition import grouped_aggregate
    from .kg import mention_edge_partial

    ds = _extracted(sf_dir).map_batches(mention_rows, batch_format="pyarrow")
    kw = make_linker_stage()
    linked = ds.map_batches(term_linker_fn(kw),
                            batch_format="pyarrow", batch_size=None)
    agg = grouped_aggregate(
        linked.map_batches(mention_edge_partial, batch_format="pyarrow"),
        ["url", "canonical"], [("confidence", "max"), ("weight", "sum")],
        ["confidence", "weight"])

    def final(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        conf = pa.array(round_half_away(
            pc.cast(t["confidence"], pa.float64())
              .to_numpy(zero_copy_only=False), 2), pa.float64())
        import numpy as np

        from .kg import strategy_from_confidence

        strat = strategy_from_confidence(
            t["confidence"].to_numpy(zero_copy_only=False))
        return pa.table({
            "url": t["url"], "canonical": t["canonical"],
            "weight": t["weight"], "confidence": conf,
            "strategy": pa.array(strat, pa.string()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def q_mention_edges_sharded(sf_dir: str):
    """Same MENTIONS aggregate through the SHARDED-dictionary linking path
    (stages.shardlink — partition-by-lookup-key, 1/P of the dictionary per
    worker); verified against the identical SQL oracle as the broadcast
    path."""
    from ..ops.partition import grouped_aggregate
    from ..stages.shardlink import link_mentions_sharded
    from .kg import mention_edge_partial

    ds = _extracted(sf_dir).map_batches(mention_rows, batch_format="pyarrow")
    linked = link_mentions_sharded(ds)
    agg = grouped_aggregate(
        linked.map_batches(mention_edge_partial, batch_format="pyarrow"),
        ["url", "canonical"], [("confidence", "max"), ("weight", "sum")],
        ["confidence", "weight"])

    def final(t: pa.Table) -> pa.Table:
        import numpy as np

        from .kg import strategy_from_confidence

        from ..util import round_half_away

        conf = pa.array(round_half_away(
            pc.cast(t["confidence"], pa.float64())
              .to_numpy(zero_copy_only=False), 2), pa.float64())
        strat = strategy_from_confidence(
            t["confidence"].to_numpy(zero_copy_only=False))
        return pa.table({
            "url": t["url"], "canonical": t["canonical"],
            "weight": t["weight"], "confidence": conf,
            "strategy": pa.array(strat, pa.string()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


SQL_MENTION_EDGES = f"""
with toks as (
  select {URL_SQL} as url, unnest(string_split(text, ' ')) as tok
  from documents where {NOT_SKIP_SQL}
), linked as (
  select url, {canon_sql('tok')} as canonical, {conf_sql('tok')} as conf
  from toks where tok not in ({STOP_LIST})
), agg as (
  select url, canonical, count(*) as weight, round(max(conf), 2) as confidence
  from linked group by url, canonical
)
select url, canonical, weight, confidence, {STRATEGY_SQL} as strategy
from agg
"""


def q_term_nodes(sf_dir: str):
    """Distinct canonical Term entities: node_key, name."""
    from ..ops.dedup import distinct
    from ..schema import node_key_array

    ds = _extracted(sf_dir).map_batches(mention_rows, batch_format="pyarrow")
    kw = make_linker_stage()
    linked = ds.map_batches(term_linker_fn(kw),
                            batch_format="pyarrow", batch_size=None)
    d = distinct(linked.map_batches(
        lambda t: t.select(["canonical"]), batch_format="pyarrow"), ["canonical"])

    def final(t: pa.Table) -> pa.Table:
        n = t.num_rows
        canon = t["canonical"].combine_chunks() if isinstance(t["canonical"], pa.ChunkedArray) else t["canonical"]
        key = node_key_array(pa.array(["Term"] * n), canon, pa.array([""] * n))
        return pa.table({"node_key": pc.cast(key, pa.string()),
                         "name": pc.cast(canon, pa.string())})

    return d.map_batches(final, batch_format="pyarrow")


SQL_TERM_NODES = f"""
with toks as (
  select unnest(string_split(text, ' ')) as tok
  from documents where {NOT_SKIP_SQL}
), linked as (
  select distinct {canon_sql('tok')} as canonical
  from toks where tok not in ({STOP_LIST})
)
select 'term-' || {SANITIZE_SQL.replace('{c}', 'canonical')} || '-' as node_key,
       canonical as name
from linked
"""


def q_follows_edges(sf_dir: str):
    """Canonicalized adjacent-token relations: a, b, weight (global agg)."""
    return _follows_edges_ds(sf_dir)


SQL_FOLLOWS_EDGES = f"""
with s as (select doc_id, string_split(text, ' ') as toks
           from documents where {NOT_SKIP_SQL}),
t as (select doc_id, generate_subscripts(toks, 1) as i, unnest(toks) as tok from s),
p as (select x.tok as ta, y.tok as tb
      from t x join t y on x.doc_id = y.doc_id and y.i = x.i + 1
      where x.tok not in ({STOP_LIST}) and y.tok not in ({STOP_LIST}))
select {canon_sql('ta')} as a, {canon_sql('tb')} as b, count(*) as weight
from p group by 1, 2
"""


def q_host_stats(sf_dir: str):
    """Per-host page counts + skip counts (per-stage stats rollup,
    cf. /root/reference/ast/src/builder/core.rs:88-95)."""
    from ray.data.aggregate import Count, Sum

    from ..functions.textutils import host_of_url_column

    ds = _extracted(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        host = pc.cast(host_of_url_column(
            t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"]), pa.string())
        sk = pc.cast(t["skipped"], pa.int64())
        tt = pa.table({"host": host, "skip": sk})
        g = tt.group_by(["host"]).aggregate([("skip", "sum"), ("skip", "count")])
        return g.rename_columns(["host", "n_skipped", "n_pages"])

    ds = ds.map_batches(partial, batch_format="pyarrow")
    out = ds.groupby("host").aggregate(Sum("n_pages", alias_name="n_pages"),
                                       Sum("n_skipped", alias_name="n_skipped"))
    return out.map_batches(lambda t: t.select(["host", "n_pages", "n_skipped"]),
                           batch_format="pyarrow")


SQL_HOST_STATS = f"""
select source || '.example.org' as host,
       count(*) as n_pages,
       count(*) filter (where {SKIP_SQL}) as n_skipped
from documents group by 1
"""


def q_term_frequencies(sf_dir: str):
    """Corpus-wide mention count per canonical term — the hub-entity rollup,
    via the salted two-stage aggregation (ops/skew.py)."""
    from ..ops.skew import salted_sum_count

    ds = _extracted(sf_dir).map_batches(mention_rows, batch_format="pyarrow")
    kw = make_linker_stage()
    linked = ds.map_batches(term_linker_fn(kw),
                            batch_format="pyarrow", batch_size=None)
    out = salted_sum_count(linked, "canonical")
    return out.map_batches(lambda t: t.select(["canonical", "n"]),
                           batch_format="pyarrow")


SQL_TERM_FREQUENCIES = f"""
with toks as (
  select unnest(string_split(text, ' ')) as tok
  from documents where {NOT_SKIP_SQL}
)
select {canon_sql('tok')} as canonical, count(*) as n
from toks where tok not in ({STOP_LIST})
group by 1
"""


def _follows_edges_ds(sf_dir: str):
    from ..ops.partition import grouped_aggregate
    from .kg import bigram_surface_partial, bigram_weight_partial

    ds = _extracted(sf_dir).map_batches(bigram_rows, batch_format="pyarrow") \
        .map_batches(bigram_surface_partial, batch_format="pyarrow")
    kw = make_linker_stage()
    ds = ds.map_batches(bigram_linker_fn(kw),
                        batch_format="pyarrow", batch_size=None)
    return grouped_aggregate(
        ds.map_batches(bigram_weight_partial, batch_format="pyarrow"),
        ["a", "b"], [("weight", "sum")], ["weight"])


_FOLLOWS_CTE = f"""
with s as (select doc_id, string_split(text, ' ') as toks
           from documents where {NOT_SKIP_SQL}),
t as (select doc_id, generate_subscripts(toks, 1) as i, unnest(toks) as tok from s),
bg as (select {{ca}} as a, {{cb}} as b
       from t x join t y on x.doc_id = y.doc_id and y.i = x.i + 1
       where x.tok not in ({STOP_LIST}) and y.tok not in ({STOP_LIST})),
p as (select a, b from bg group by a, b)
""".replace("{ca}", canon_sql("x.tok")).replace("{cb}", canon_sql("y.tok"))


def q_two_hop(sf_dir: str):
    """2-hop self-join of the FOLLOWS edge table: (a, c, n_paths) — the
    edge-index 2-hop join shape (cf. integration-test linking,
    /root/reference/ast/src/lang/linker.rs:34-140)."""
    from ..ops.partition import grouped_aggregate

    # materialize the AGGREGATED edge table once: it is vocabulary-bounded
    # (|canonical terms|^2 worst case), not corpus-bounded, and both join
    # sides derive from it — without this the whole extract->link->aggregate
    # chain executes twice (once per lazy join input).
    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow").materialize()
    right = edges.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"]}), batch_format="pyarrow")
    # task-based co-group join (one keyed shuffle + per-partition pyarrow
    # join) instead of Dataset.join: no per-partition aggregator ACTORS to
    # spin up, which dominates wall time in long-lived sessions
    from ..ops.partition import cogroup_join_hp

    paths = cogroup_join_hp(
        edges, right, "b",
        pa.schema([("b", pa.string()), ("a", pa.string())]),
        pa.schema([("b", pa.string()), ("c", pa.string())]))
    partial = paths.map_batches(
        lambda t: t.group_by(["a", "c"]).aggregate([("b", "count")])
                   .rename_columns(["a", "c", "n_part"]),
        batch_format="pyarrow")
    return grouped_aggregate(partial, ["a", "c"], [("n_part", "sum")], ["n_paths"])


SQL_TWO_HOP = _FOLLOWS_CTE + """
select x.a, y.b as c, count(*) as n_paths
from p x join p y on x.b = y.a
group by 1, 2
"""


def q_term_components(sf_dir: str, max_pairs: int = 2_000_000):
    """Connected components of the undirected FOLLOWS term graph via
    distributed min-label propagation (ops.neardup.label_propagation_clusters
    — every step a co-group join + grouped min, nothing driver-sized).
    Labels live in a 62-bit md5 space so the Ray int64 min and the DuckDB
    UBIGINT min order identically; comp = min masked-hash in the component."""
    from ..functions.minhash import md5low64
    from ..ops.neardup import label_propagation_clusters
    from ..ops.partition import cogroup_join_hp, distinct_hp

    mask = (1 << 62) - 1

    def _h(col) -> pa.Array:
        return pa.array([md5low64(s) & mask for s in col.to_pylist()],
                        pa.int64())

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow").materialize()
    pairs = edges.map_batches(
        lambda t: pa.table({"a": _h(t["a"]), "b": _h(t["b"])}),
        batch_format="pyarrow")
    def _flat(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    terms = distinct_hp(edges.map_batches(
        lambda t: pa.table(
            {"term": pa.concat_arrays([_flat(t["a"]), _flat(t["b"])])}),
        batch_format="pyarrow"), ["term"])
    ids = terms.map_batches(
        lambda t: pa.table({"term": t["term"], "id": _h(t["term"])}),
        batch_format="pyarrow")
    # adaptive tail, mirroring minhash_lsh_clusters: the pair set is
    # vocabulary-bounded (|terms|^2 worst case), so under the guard a
    # driver union-find + broadcast assign replaces ~diameter keyed-shuffle
    # rounds; above it the distributed label propagation runs.
    pairs = pairs.materialize()
    if pairs.count() <= max_pairs:
        from ..ops.neardup import union_find
        from ..ops.relational import broadcast, _resolve

        roots = union_find([(p["a"], p["b"]) for p in pairs.take_all()])
        ref = broadcast(roots)

        def assign(t: pa.Table) -> pa.Table:
            import numpy as np
            import pandas as pd

            r = _resolve(ref)
            ids_np = t["id"].to_numpy(zero_copy_only=False)
            comp = pd.Series(ids_np).map(r).fillna(
                pd.Series(ids_np)).to_numpy(dtype=np.int64)
            return pa.table({"term": t["term"],
                             "comp": pa.array(comp, pa.int64())})

        return ids.map_batches(assign, batch_format="pyarrow")

    labels = label_propagation_clusters(ids, "id", pairs)
    labels = labels.map_batches(
        lambda t: pa.table({"id": t["doc_id"], "comp": t["cluster_id"]}),
        batch_format="pyarrow")
    out = cogroup_join_hp(
        ids, labels, "id",
        pa.schema([("id", pa.int64()), ("term", pa.string())]),
        pa.schema([("id", pa.int64()), ("comp", pa.int64())]))
    return out.map_batches(lambda t: t.select(["term", "comp"]),
                           batch_format="pyarrow")


SQL_TERM_COMPONENTS = _FOLLOWS_CTE.replace("with ", "with recursive ", 1) + """
, e as (select a, b from p union select b, a from p),
n as (select a as t from p union select b from p),
reach as (
  select t as node, t as r from n
  union
  select x.node, e.b as r from reach x join e on e.a = x.r
),
h as (select node, cast(md5_number_lower(r) % 4611686018427387904 as bigint)
             as hr
      from reach)
select node as term, min(hr) as comp from h group by node
"""


def q_term_degrees(sf_dir: str):
    """In/out degree per term over the FOLLOWS graph (degree enrichment,
    cf. mcp/src/importance/detector.ts)."""
    from ..ops.graph import degrees

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: pa.table({"src_key": t["a"], "dst_key": t["b"]}),
        batch_format="pyarrow")
    return degrees(edges)


SQL_TERM_DEGREES = _FOLLOWS_CTE + """
, sides as (
  select a as node_key, 1 as o, 0 as i from p
  union all
  select b as node_key, 0 as o, 1 as i from p
)
select node_key, cast(sum(o) as bigint) as out_degree,
       cast(sum(i) as bigint) as in_degree
from sides group by node_key
"""


def q_host_coverage(sf_dir: str):
    """Coverage rollup per host: extracted pages / total, percent
    (cf. test-coverage rollup, ast/src/lang/graphs/coverage/mod.rs:38-80)."""
    from ray.data.aggregate import Sum

    from ..functions.textutils import host_of_url_column

    ds = _extracted(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        host = pc.cast(host_of_url_column(
            t["url"].combine_chunks() if isinstance(t["url"], pa.ChunkedArray) else t["url"]), pa.string())
        ok = pc.cast(pc.invert(t["skipped"].combine_chunks() if isinstance(t["skipped"], pa.ChunkedArray) else t["skipped"]), pa.int64())
        tt = pa.table({"host": host, "ok": ok})
        g = tt.group_by(["host"]).aggregate([("ok", "sum"), ("ok", "count")])
        return g.rename_columns(["host", "n_ok", "n_pages"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n_ok", alias_name="n_ok"),
                                   Sum("n_pages", alias_name="n_pages"))

    def finish(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        ok = pc.cast(t["n_ok"], pa.float64()).to_numpy(zero_copy_only=False)
        npg = pc.cast(t["n_pages"], pa.float64()).to_numpy(zero_copy_only=False)
        pct = pa.array(round_half_away(ok / npg * 100.0, 2), pa.float64())
        return pa.table({"host": t["host"], "n_pages": t["n_pages"],
                         "n_ok": t["n_ok"], "pct_extracted": pct})

    return agg.map_batches(finish, batch_format="pyarrow")


SQL_HOST_COVERAGE = f"""
select source || '.example.org' as host,
       count(*) as n_pages,
       count(*) filter (where {NOT_SKIP_SQL}) as n_ok,
       round(100.0 * (count(*) filter (where {NOT_SKIP_SQL})) / count(*), 2)
         as pct_extracted
from documents group by 1
"""


def q_term_pagerank(sf_dir: str):
    """PageRank over the FOLLOWS term graph (bounded power iteration;
    rows-only — verified against a dense numpy oracle in
    tests/test_graph_ops.py)."""
    from ..ops.graph import pagerank

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: pa.table({"src_key": t["a"], "dst_key": t["b"]}),
        batch_format="pyarrow")
    ranks = pagerank(edges, iterations=10)

    def _r(t: pa.Table) -> pa.Table:
        from ..util import round_half_away

        x = pc.cast(t["rank"], pa.float64()).to_numpy(zero_copy_only=False)
        # DuckDB-round kernel, NOT pc.round (half-to-even + inexact
        # multiply) — this query carries a SQL oracle that rounds to 6
        return pa.table({"node_key": t["node_key"],
                         "rank": pa.array(round_half_away(x, 6),
                                          pa.float64())})

    return ranks.map_batches(_r, batch_format="pyarrow")


def q_reachable_from_spark(sf_dir: str):
    """BFS reachability over the FOLLOWS graph from 'spark' within 2 hops
    (get_map/shortest-path analog; frontier semi-join per hop)."""
    from ..ops.graph import bfs_reachable

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: pa.table({"src_key": t["a"], "dst_key": t["b"]}),
        batch_format="pyarrow")
    return bfs_reachable(edges, ["spark"], max_depth=2)


SQL_REACHABLE = _FOLLOWS_CTE + """
, d0 as (select 'spark' as node_key, 0 as depth),
d1 as (select distinct b as node_key, 1 as depth from p
       where a = 'spark' and b != 'spark'),
d2 as (select distinct y.b as node_key, 2 as depth
       from p x join p y on x.b = y.a
       where x.a = 'spark' and y.b != 'spark'
         and y.b not in (select node_key from d1)),
u as (select * from d0 union all select * from d1 union all select * from d2)
select node_key, cast(min(depth) as bigint) as depth from u group by node_key
"""


def q_shortest_path_from_spark(sf_dir: str):
    """Single-source shortest paths WITH path reconstruction over the
    FOLLOWS graph (shortest_path consumer,
    /root/reference/mcp/src/graph/queries.ts:837-855): (node_key, depth,
    path) where path is the lexicographically-smallest shortest path,
    '->'-joined."""
    from ..ops.graph import bfs_shortest_paths

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: pa.table({"src_key": t["a"], "dst_key": t["b"]}),
        batch_format="pyarrow")
    return bfs_shortest_paths(edges, "spark", max_depth=3)


# Recursive CTE walks (depth-bounded; no cycle check needed — a revisiting
# walk always loses the (depth, path) row_number to the first visit, and the
# vocabulary-bounded FOLLOWS graph keeps walk counts small). chr(31) is the
# pipeline's path separator: it sorts below every canonical-term character,
# so ORDER BY the joined string == element-wise path comparison.
SQL_SHORTEST_PATH = _FOLLOWS_CTE.replace("with s as", "with recursive s as", 1) + """
, walk(node, depth, path) as (
  select 'spark', 0, 'spark'
  union all
  select p.b, w.depth + 1, w.path || chr(31) || p.b
  from walk w join p on p.a = w.node
  where w.depth < 3)
select node as node_key, cast(depth as bigint) as depth,
       replace(path, chr(31), '->') as path
from (select node, depth, path,
             row_number() over (partition by node
                                order by depth, path) as rn
      from walk)
where rn = 1
"""


def q_epilogue_pages(sf_dir: str):
    """Childless-parent epilogue pass (filter_out_nodes_without_children,
    /root/reference/ast/src/lang/graphs/btreemap_graph.rs:664-710): Page
    nodes lacking a MENTIONS child edge (skipped pages, stopword-only pages)
    are filtered out; survivors listed by url."""
    from ..ops.epilogue import filter_childless_parents
    from ..schema import node_key_array
    from .kg import page_node_rows, _const, _edge_table

    ex = _extracted(sf_dir)
    page_nodes = ex.map_batches(page_node_rows, batch_format="pyarrow")
    kw = make_linker_stage()
    linked = ex.map_batches(mention_rows, batch_format="pyarrow") \
        .map_batches(term_linker_fn(kw),
                     batch_format="pyarrow", batch_size=None)

    def mention_edges(t: pa.Table) -> pa.Table:
        from ..ops.dedup import distinct_per_batch

        d = distinct_per_batch(t.select(["url"]), ["url"])
        n = d.num_rows
        url = d["url"].combine_chunks() if isinstance(d["url"], pa.ChunkedArray) else d["url"]
        key = node_key_array(_const(n, "Page"), url, url)
        return _edge_table(n, key, "MENTIONS", _const(n, ""))

    edges = linked.map_batches(mention_edges, batch_format="pyarrow")
    nodes_out, _edges_out = filter_childless_parents(
        page_nodes, edges, "Page", "MENTIONS", cascade=False)
    return nodes_out.map_batches(
        lambda t: pa.table({"url": pc.cast(t["name"], pa.string())}),
        batch_format="pyarrow")


SQL_EPILOGUE_PAGES = f"""
select {URL_SQL} as url
from documents
where {NOT_SKIP_SQL}
  and len(list_filter(string_split(text, ' '),
                      x -> x not in ({STOP_LIST}))) > 0
"""


def q_term_triangles(sf_dir: str):
    """Triangle count of the undirected FOLLOWS term graph — the classic
    clustering-coefficient building block (one step past kg_two_hop's
    wedge join). Canonical orientation makes it a pure dataflow: every
    triangle x<y<z is counted exactly once as wedge (x<y, y<z) + closing
    edge (x,z); wedge = ONE co-group join on the middle vertex, closure =
    ONE keyed membership filter on the (x,z) composite key. All tables are
    vocabulary-bounded; nothing touches the driver but the final count."""
    from ..ops.partition import cogroup_join_hp, distinct_hp, membership_filter_hp

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")

    def orient(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t["a"], t["b"])
        v = pc.max_element_wise(t["a"], t["b"])
        keep = pc.not_equal(u, v)
        return pa.table({"u": pc.cast(u, pa.string()),
                         "v": pc.cast(v, pa.string())}).filter(
            keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep)

    und = distinct_hp(edges.map_batches(orient, batch_format="pyarrow"),
                      ["u", "v"]).materialize()  # wedge sides + closure probe

    left = und.map_batches(lambda t: pa.table({"y": t["v"], "x": t["u"]}),
                           batch_format="pyarrow")
    right = und.map_batches(lambda t: pa.table({"y": t["u"], "z": t["v"]}),
                            batch_format="pyarrow")
    wedges = cogroup_join_hp(
        left, right, "y",
        pa.schema([("y", pa.string()), ("x", pa.string())]),
        pa.schema([("y", pa.string()), ("z", pa.string())]))

    def wedge_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            t["x"], t["z"], pa.scalar("\x1f"))})

    def edge_key(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.binary_join_element_wise(
            t["u"], t["v"], pa.scalar("\x1f"))})

    closed = membership_filter_hp(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        und.map_batches(edge_key, batch_format="pyarrow"),
        "k", keep=True,
        payload_schema=pa.schema([("k", pa.string())]))
    n = closed.count()
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


SQL_TERM_TRIANGLES = _FOLLOWS_CTE + """
, e as (select distinct least(a, b) as u, greatest(a, b) as v
        from p where a <> b)
select cast(count(*) as bigint) as n_triangles
from e e1
join e e2 on e1.v = e2.u
join e e3 on e3.u = e1.u and e3.v = e2.v
"""


LINKPRED_EDGE_LIMIT = 200_000       # undirected edges -> driver tail
LINKPRED_PAIR_LIMIT = 5_000_000     # sum over nodes of C(deg, 2)


_UND_CACHE: dict = {}


def _und_follows(sf_dir: str):
    """Materialized distinct undirected FOLLOWS edge list (u < v) — the
    shared front end of the link-prediction family, cached per session like
    _extracted (both predictors consume the same list)."""
    hit = _UND_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    from ..ops.partition import distinct_hp

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")

    def orient(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t["a"], t["b"])
        v = pc.max_element_wise(t["a"], t["b"])
        keep = pc.not_equal(u, v)
        return pa.table({"u": pc.cast(u, pa.string()),
                         "v": pc.cast(v, pa.string())}).filter(
            keep.combine_chunks() if isinstance(keep, pa.ChunkedArray) else keep)

    out = distinct_hp(edges.map_batches(orient, batch_format="pyarrow"),
                      ["u", "v"]).materialize()
    _UND_CACHE[sf_dir] = out
    return out


def _linkpred_local(rows, mode: str):
    """Driver tail for the link predictors — kernel-identical to the
    distributed path (same two-hop enumeration, same double arithmetic,
    same ordering), run when the undirected edge list fits the guard AND
    the two-hop pair mass (sum of C(deg,2)) fits LINKPRED_PAIR_LIMIT;
    returns None above the pair guard so the caller falls back to the
    distributed exchanges. The term graph is vocabulary-sized in practice,
    where the 6-exchange distributed plan is pure scheduling overhead
    (the reduce_triples / apply_epilogue adaptive-tail precedent)."""
    import math

    from collections import defaultdict

    from ..util import round_half_away

    adj: dict = defaultdict(set)
    for r in rows:
        adj[r["u"]].add(r["v"])
        adj[r["v"]].add(r["u"])
    deg = {x: len(ns) for x, ns in adj.items()}
    if sum(d * (d - 1) // 2 for d in deg.values()) > LINKPRED_PAIR_LIMIT:
        return None
    wlog = {d: 1.0 / math.log(d) for d in set(deg.values()) if d > 1}
    cn: dict = defaultdict(int)
    aa: dict = defaultdict(float)
    for y, ns in adj.items():
        nl = sorted(ns)
        w = wlog.get(deg[y], float("nan"))
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                p = (nl[i], nl[j])
                cn[p] += 1
                aa[p] += w
    edge_set = {(r["u"], r["v"]) for r in rows}
    col = "jaccard" if mode == "jaccard" else "aa"
    out = []
    for (a, b), c in cn.items():
        if (a, b) in edge_set:
            continue
        if mode == "jaccard":
            # same op order as the distributed kernel: ints are exact in
            # double, so float(da+db) - float(cn) is bit-identical
            val = float(c) / (float(deg[a] + deg[b]) - float(c))
        else:
            val = float(round_half_away(aa[(a, b)], 4))
        out.append({"a": a, "b": b, "cn": c, col: val})
    schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                        ("cn", pa.int64()), (col, pa.float64())])
    tbl = pa.Table.from_pylist(out, schema=schema)
    return tbl.sort_by([(col, "descending"), ("a", "ascending"),
                        ("b", "ascending")]).slice(0, 20)


def q_term_link_prediction(sf_dir: str,
                           local_limit: int = LINKPRED_EDGE_LIMIT):
    """Common-neighbors link prediction over the undirected FOLLOWS term
    graph — the KG-completion op: for non-adjacent term pairs, Jaccard of
    neighbor sets = |N(a)∩N(b)| / (deg a + deg b - |∩|); top 20 predicted
    links. Adaptive: a vocabulary-sized edge list runs the guarded driver
    tail (_linkpred_local, parity-tested); a corpus-shaped one runs the
    distributed shape — symmetrized adjacency -> ONE co-group join on the
    shared neighbor (two-hop a<b pairs + grouped count) -> two vocab-keyed
    degree joins -> membership anti-filter against existing edges ->
    per-partition top-k into the global 20-row sort. The Jaccard is one
    small-integer division in double, bit-exact vs SQL."""
    from ..ops.partition import (cogroup_join_hp, grouped_aggregate,
                                 membership_filter_hp)

    und = _und_follows(sf_dir)
    head = und.take(local_limit + 1) if local_limit else []
    if local_limit and len(head) <= local_limit:
        tbl = _linkpred_local(head, "jaccard")
        if tbl is not None:
            return tbl

    def _flat(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    sym = und.map_batches(
        lambda t: pa.table({"y": pa.concat_arrays([_flat(t["u"]), _flat(t["v"])]),
                            "n": pa.concat_arrays([_flat(t["v"]), _flat(t["u"])])}),
        batch_format="pyarrow").materialize()  # pair join + degree count

    left = sym.map_batches(lambda t: pa.table({"y": t["y"], "a": t["n"]}),
                           batch_format="pyarrow")
    right = sym.map_batches(lambda t: pa.table({"y": t["y"], "b": t["n"]}),
                            batch_format="pyarrow")
    pairs = cogroup_join_hp(
        left, right, "y",
        pa.schema([("y", pa.string()), ("a", pa.string())]),
        pa.schema([("y", pa.string()), ("b", pa.string())]))
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.less(t["a"], t["b"])), batch_format="pyarrow")
    inter = grouped_aggregate(pairs, ["a", "b"], [("y", "count")], ["cn"])

    deg = grouped_aggregate(sym, "y", [("n", "count")], ["d"])
    j1 = cogroup_join_hp(
        inter.map_batches(lambda t: t.select(["a", "b", "cn"]),
                          batch_format="pyarrow"),
        deg.map_batches(lambda t: pa.table({"a": t["y"], "da": t["d"]}),
                        batch_format="pyarrow"),
        "a",
        pa.schema([("a", pa.string()), ("b", pa.string()), ("cn", pa.int64())]),
        pa.schema([("a", pa.string()), ("da", pa.int64())]))
    j2 = cogroup_join_hp(
        j1, deg.map_batches(lambda t: pa.table({"b": t["y"], "db": t["d"]}),
                            batch_format="pyarrow"),
        "b",
        pa.schema([("b", pa.string()), ("a", pa.string()), ("cn", pa.int64()),
                   ("da", pa.int64())]),
        pa.schema([("b", pa.string()), ("db", pa.int64())]))

    def score(t: pa.Table) -> pa.Table:
        cn = pc.cast(t["cn"], pa.float64())
        un = pc.subtract(pc.cast(pc.add(t["da"], t["db"]), pa.float64()), cn)
        return pa.table({
            "k": pc.binary_join_element_wise(
                pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()),
                pa.scalar("\x1f")),
            "a": t["a"], "b": t["b"],
            "cn": pc.cast(t["cn"], pa.int64()),
            "jaccard": pc.divide(cn, un),
        })

    scored = j2.map_batches(score, batch_format="pyarrow")
    non_adjacent = membership_filter_hp(
        scored,
        und.map_batches(lambda t: pa.table({"k": pc.binary_join_element_wise(
            pc.cast(t["u"], pa.string()), pc.cast(t["v"], pa.string()),
            pa.scalar("\x1f"))}), batch_format="pyarrow"),
        "k", keep=False,
        payload_schema=pa.schema([("k", pa.string()), ("a", pa.string()),
                                  ("b", pa.string()), ("cn", pa.int64()),
                                  ("jaccard", pa.float64())]))
    out = non_adjacent.map_batches(
        lambda t: t.select(["a", "b", "cn", "jaccard"])
                   .sort_by([("jaccard", "descending"), ("a", "ascending"),
                             ("b", "ascending")]).slice(0, 20),
        batch_format="pyarrow")
    # final 20-row merge on the driver with a PINNED schema: a dense graph
    # can make the prediction set empty, and Ray's schema-less empty blocks
    # would otherwise drop the column names from the result
    schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                        ("cn", pa.int64()), ("jaccard", pa.float64())])
    tbl = pa.Table.from_pylist(out.take_all(), schema=schema)
    return tbl.sort_by([("jaccard", "descending"), ("a", "ascending"),
                        ("b", "ascending")]).slice(0, 20)


SQL_TERM_LINK_PREDICTION = _FOLLOWS_CTE + """
, e as (select distinct least(a, b) as u, greatest(a, b) as v
        from p where a <> b),
sym as (select u as y, v as n from e union all select v as y, u as n from e),
inter as (select s1.n as a, s2.n as b, count(*) as cn
          from sym s1 join sym s2 on s1.y = s2.y and s1.n < s2.n
          group by 1, 2),
deg as (select y as node, count(*) as d from sym group by y)
select i.a, i.b, i.cn,
       cast(i.cn as double) /
         (cast(da.d + db.d as double) - cast(i.cn as double)) as jaccard
from inter i
join deg da on i.a = da.node
join deg db on i.b = db.node
where not exists (select 1 from e where e.u = i.a and e.v = i.b)
order by jaccard desc, i.a, i.b
limit 20
"""


def q_adamic_adar(sf_dir: str, local_limit: int = LINKPRED_EDGE_LIMIT):
    """Adamic-Adar link prediction over the undirected FOLLOWS term graph:
    for non-adjacent pairs, sum over common neighbors y of 1/ln(deg(y)) —
    the degree-discounted refinement of the Jaccard predictor (hub
    neighbors count less). Adaptive driver tail like q_term_link_prediction;
    the distributed shape attaches the weight to the shared-neighbor rows
    BEFORE the pair join so the per-pair score is one grouped sum.
    1/ln(d) is computed via math.log per DISTINCT degree (repo float-parity
    convention: np.log drifts 1 ulp vs DuckDB's libm ln); a common neighbor
    always has degree >= 2, so ln is never 0 where the weight is used."""
    import math

    from ..ops.partition import (cogroup_join_hp, grouped_aggregate,
                                 membership_filter_hp)
    from ..util import round_half_away

    und = _und_follows(sf_dir)
    head = und.take(local_limit + 1) if local_limit else []
    if local_limit and len(head) <= local_limit:
        tbl = _linkpred_local(head, "aa")
        if tbl is not None:
            return tbl

    def _flat(c):
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    sym = und.map_batches(
        lambda t: pa.table({"y": pa.concat_arrays([_flat(t["u"]), _flat(t["v"])]),
                            "n": pa.concat_arrays([_flat(t["v"]), _flat(t["u"])])}),
        batch_format="pyarrow").materialize()

    deg = grouped_aggregate(sym, "y", [("n", "count")], ["d"])

    def add_w(t: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        d = t["d"].to_numpy(zero_copy_only=False)
        wmap = {int(x): (1.0 / math.log(int(x)) if x > 1 else np.nan)
                for x in np.unique(d)}
        w = pd.Series(d).map(wmap).to_numpy(dtype=np.float64)
        return pa.table({"y": t["y"], "w": pa.array(w, pa.float64())})

    wdeg = deg.map_batches(add_w, batch_format="pyarrow")
    symw = cogroup_join_hp(
        sym, wdeg, "y",
        pa.schema([("y", pa.string()), ("n", pa.string())]),
        pa.schema([("y", pa.string()), ("w", pa.float64())]))

    left = symw.map_batches(
        lambda t: pa.table({"y": t["y"], "a": t["n"], "w": t["w"]}),
        batch_format="pyarrow")
    right = symw.map_batches(
        lambda t: pa.table({"y": t["y"], "b": t["n"]}), batch_format="pyarrow")
    pairs = cogroup_join_hp(
        left, right, "y",
        pa.schema([("y", pa.string()), ("a", pa.string()), ("w", pa.float64())]),
        pa.schema([("y", pa.string()), ("b", pa.string())]))
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.less(t["a"], t["b"])), batch_format="pyarrow")
    inter = grouped_aggregate(pairs, ["a", "b"],
                              [("y", "count"), ("w", "sum")], ["cn", "aa"])

    def score(t: pa.Table) -> pa.Table:
        return pa.table({
            "k": pc.binary_join_element_wise(
                pc.cast(t["a"], pa.string()), pc.cast(t["b"], pa.string()),
                pa.scalar("\x1f")),
            "a": t["a"], "b": t["b"],
            "cn": pc.cast(t["cn"], pa.int64()),
            "aa": pa.array(round_half_away(
                t["aa"].to_numpy(zero_copy_only=False), 4), pa.float64()),
        })

    scored = inter.map_batches(score, batch_format="pyarrow")
    non_adjacent = membership_filter_hp(
        scored,
        und.map_batches(lambda t: pa.table({"k": pc.binary_join_element_wise(
            pc.cast(t["u"], pa.string()), pc.cast(t["v"], pa.string()),
            pa.scalar("\x1f"))}), batch_format="pyarrow"),
        "k", keep=False,
        payload_schema=pa.schema([("k", pa.string()), ("a", pa.string()),
                                  ("b", pa.string()), ("cn", pa.int64()),
                                  ("aa", pa.float64())]))
    out = non_adjacent.map_batches(
        lambda t: t.select(["a", "b", "cn", "aa"])
                   .sort_by([("aa", "descending"), ("a", "ascending"),
                             ("b", "ascending")]).slice(0, 20),
        batch_format="pyarrow")
    schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                        ("cn", pa.int64()), ("aa", pa.float64())])
    tbl = pa.Table.from_pylist(out.take_all(), schema=schema)
    return tbl.sort_by([("aa", "descending"), ("a", "ascending"),
                        ("b", "ascending")]).slice(0, 20)


SQL_ADAMIC_ADAR = _FOLLOWS_CTE + """
, e as (select distinct least(a, b) as u, greatest(a, b) as v
        from p where a <> b),
sym as (select u as y, v as n from e union all select v as y, u as n from e),
deg as (select y as node, count(*) as d from sym group by y),
symw as (select s.y, s.n, 1.0 / ln(d.d) as w
         from sym s join deg d on s.y = d.node),
inter as (select s1.n as a, s2.n as b, cast(count(*) as bigint) as cn,
                 round(sum(s1.w), 4) as aa
          from symw s1 join symw s2 on s1.y = s2.y and s1.n < s2.n
          group by 1, 2)
select i.a, i.b, i.cn, i.aa
from inter i
where not exists (select 1 from e where e.u = i.a and e.v = i.b)
order by aa desc, a, b
limit 20
"""


KG_QUERIES: dict[str, tuple] = {
    "kg_term_triangles": (q_term_triangles, SQL_TERM_TRIANGLES),
    "kg_term_link_prediction": (q_term_link_prediction,
                                SQL_TERM_LINK_PREDICTION),
    "kg_adamic_adar": (q_adamic_adar, SQL_ADAMIC_ADAR),
    "kg_epilogue_pages": (q_epilogue_pages, SQL_EPILOGUE_PAGES),
    "kg_term_frequencies": (q_term_frequencies, SQL_TERM_FREQUENCIES),
    "kg_reachable_from_spark": (q_reachable_from_spark, SQL_REACHABLE),
    "kg_shortest_path": (q_shortest_path_from_spark, SQL_SHORTEST_PATH),
    "kg_two_hop": (q_two_hop, SQL_TWO_HOP),
    "kg_term_degrees": (q_term_degrees, SQL_TERM_DEGREES),
    "kg_term_components": (q_term_components, SQL_TERM_COMPONENTS),
    "kg_host_coverage": (q_host_coverage, SQL_HOST_COVERAGE),
    "kg_term_pagerank": (q_term_pagerank, None),
    "kg_extract_text": (q_extract_text, SQL_EXTRACT_TEXT),
    "kg_page_nodes": (q_page_nodes, SQL_PAGE_NODES),
    "kg_mention_edges": (q_mention_edges, SQL_MENTION_EDGES),
    "kg_mention_edges_sharded": (q_mention_edges_sharded, SQL_MENTION_EDGES),
    "kg_term_nodes": (q_term_nodes, SQL_TERM_NODES),
    "kg_follows_edges": (q_follows_edges, SQL_FOLLOWS_EDGES),
    "kg_host_stats": (q_host_stats, SQL_HOST_STATS),
}


def q_parse_stats(sf_dir: str):
    """Per-language parse stats (pages / skipped) — the reference's parse
    statistics rollup (ast/src/lang/mod.rs:39-50) as an oracle-backed query
    instead of metrics-file-only."""
    from ray.data.aggregate import Sum

    ds = _extracted(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "lang": t["lang"],
            "skip": pc.cast(t["skipped"], pa.int64()),
        }).group_by(["lang"]).aggregate([("skip", "sum"), ("skip", "count")])
        return g.rename_columns(["lang", "n_skipped", "n_pages"])

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang").aggregate(Sum("n_pages", alias_name="n_pages"),
                                   Sum("n_skipped", alias_name="n_skipped"))
    return out.map_batches(
        lambda t: t.select(["lang", "n_pages", "n_skipped"]),
        batch_format="pyarrow")


SQL_PARSE_STATS = f"""
select lang, count(*) as n_pages,
       count(*) filter (where {SKIP_SQL}) as n_skipped
from documents group by 1
"""

KG_QUERIES["kg_parse_stats"] = (q_parse_stats, SQL_PARSE_STATS)


def _sql_pagerank(iterations: int = 10, damping: float = 0.85) -> str:
    """Unrolled power-iteration PageRank oracle over the FOLLOWS term graph.

    SQL cannot express the iterative loop in one recursive CTE (aggregates
    over the recursive reference are not allowed), but the iteration count
    is FIXED (10), so the loop unrolls into chained CTEs r0..r10 — each
    round the exact update the pipeline uses (ops/graph.pagerank):
        r'(i) = (1-d)/n + d * (sum_{j->i} r(j)/out(j) + D/n)
    with D the dangling (out-degree-0) rank mass."""
    follows = SQL_FOLLOWS_EDGES.strip().rstrip(";")
    parts = [f"""
with edges as materialized (select a as src, b as dst from ({follows}) f),
deg as materialized (select src, count(*) as outd from edges group by src),
nodes as materialized (select distinct k from
          (select src as k from edges union all select dst as k from edges)),
meta as materialized (select count(*) as n from nodes),
r0 as materialized (select k, 1.0 / (select n from meta) as r from nodes)"""]
    for i in range(iterations):
        parts.append(f"""
d{i} as materialized (select coalesce(sum(r.r), 0) as dm
         from r{i} r left join deg on r.k = deg.src where deg.src is null),
r{i + 1} as materialized (
  select n.k,
         {1.0 - damping} / (select n from meta) +
         {damping} * (coalesce(c.s, 0) + (select dm from d{i}) /
                      (select n from meta)) as r
  from nodes n left join (
      select e.dst as k, sum(r.r / deg.outd) as s
      from edges e join r{i} r on e.src = r.k
                   join deg on deg.src = e.src
      group by e.dst) c on n.k = c.k)""")
    return (",".join(parts) +
            f"\nselect k as node_key, round(r, 6) as rank from r{iterations}")


SQL_TERM_PAGERANK = _sql_pagerank()

KG_QUERIES["kg_term_pagerank"] = (q_term_pagerank, SQL_TERM_PAGERANK)


def q_term_importance(sf_dir: str):
    """Importance tagging over the FOLLOWS graph (detector.ts:54-120):
    p90-pagerank hubs, entry points (in=0), sinks (out=0) — pagerank +
    degrees + distributed-quantile threshold + vectorized CASE, the full
    enrichment chain in one query. Ranks are rounded to 6 BEFORE the
    threshold/compare on BOTH sides: the unrolled-SQL and pipeline
    pagerank agree only to ~1e-15 (different summation order), and a
    boundary node must not flip the >= p90 comparison."""
    from ..ops.graph import degrees, importance_tags, pagerank
    from ..util import round_half_away

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: pa.table({"src_key": t["a"], "dst_key": t["b"]}),
        batch_format="pyarrow").materialize()  # pagerank + degrees branches

    def _r(t: pa.Table) -> pa.Table:
        x = pc.cast(t["rank"], pa.float64()).to_numpy(zero_copy_only=False)
        return pa.table({"node_key": t["node_key"],
                         "rank": pa.array(round_half_away(x, 6),
                                          pa.float64())})

    ranks = pagerank(edges, iterations=10).map_batches(_r,
                                                       batch_format="pyarrow")
    return importance_tags(ranks, degrees(edges))


SQL_TERM_IMPORTANCE = f"""
with pr as materialized ({SQL_TERM_PAGERANK}),
deg as materialized ({SQL_TERM_DEGREES}),
thr as (select quantile_cont(rank, 0.9) as p90 from pr)
select p.node_key, p.rank, d.out_degree, d.in_degree,
       case when p.rank >= t.p90 then 'hub'
            when d.in_degree = 0 and d.out_degree = 0 then 'isolated'
            when d.in_degree = 0 then 'entry_point'
            when d.out_degree = 0 then 'sink'
            else 'normal' end as importance
from pr p join deg d using (node_key) cross join thr t
"""

KG_QUERIES["kg_term_importance"] = (q_term_importance, SQL_TERM_IMPORTANCE)


def q_term_kcore(sf_dir: str, k: int = 3, rounds: int = 3):
    """Bounded k-core peeling over the undirected FOLLOWS term graph — the
    iterative degeneracy-pruning family (community cores, influence
    backbones) next to PageRank/components: ``rounds`` passes of "drop
    every node with fewer than k alive neighbors", unrolled so the SQL
    oracle can mirror it exactly (full k-core is the fixpoint; a bounded
    peel is the distributed-friendly prefix and is deterministic). The
    edge table is vocabulary-bounded (canonical-term pairs), so each round
    is ONE degree aggregate plus a broadcast-set edge filter; the alive
    set on the driver is bounded by the term vocabulary — the same budget
    the alias dictionary and canonicalizer already assume."""
    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow").materialize()

    def undirect(t: pa.Table) -> pa.Table:
        ne = pc.invert(pc.equal(t["a"], t["b"]))
        ne = ne.combine_chunks() if isinstance(ne, pa.ChunkedArray) else ne
        f = t.filter(ne)
        return pa.table({
            "a": pa.concat_arrays([pc.cast(f["a"], pa.string())
                                   .combine_chunks(),
                                   pc.cast(f["b"], pa.string())
                                   .combine_chunks()]),
            "b": pa.concat_arrays([pc.cast(f["b"], pa.string())
                                   .combine_chunks(),
                                   pc.cast(f["a"], pa.string())
                                   .combine_chunks()])})

    from ..ops.partition import distinct_hp, grouped_aggregate

    und = distinct_hp(edges.map_batches(undirect, batch_format="pyarrow"),
                      ["a", "b"]).materialize()

    alive: set | None = None
    deg_tbl = None
    for _ in range(rounds):
        cur = und
        if alive is not None:
            keep = pa.array(sorted(alive))

            def flt(t: pa.Table, _keep=keep) -> pa.Table:
                m = pc.and_(pc.is_in(t["a"], value_set=_keep),
                            pc.is_in(t["b"], value_set=_keep))
                m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
                return t.filter(m)

            cur = und.map_batches(flt, batch_format="pyarrow")
        deg = grouped_aggregate(cur, "a", [([], "count_all")], ["d"])
        deg_tbl = pa.Table.from_pylist(deg.take_all(), schema=pa.schema(
            [("a", pa.string()), ("d", pa.int64())]))
        alive = set(deg_tbl.filter(
            pc.greater_equal(deg_tbl["d"], k))["a"].to_pylist())
    surv = deg_tbl.filter(pc.greater_equal(deg_tbl["d"], k))
    return pa.table({"node_key": surv["a"], "degree": surv["d"]}) \
        .sort_by([("node_key", "ascending")])


SQL_TERM_KCORE = _FOLLOWS_CTE + """
, und as (select a, b from p where a <> b
          union
          select b as a, a as b from p where a <> b),
d1 as (select a, count(*) as d from und group by a),
a1 as (select a from d1 where d >= 3),
e2 as (select * from und where a in (select a from a1)
                           and b in (select a from a1)),
d2 as (select a, count(*) as d from e2 group by a),
a2 as (select a from d2 where d >= 3),
e3 as (select * from und where a in (select a from a2)
                           and b in (select a from a2)),
d3 as (select a, count(*) as d from e3 group by a)
select a as node_key, cast(d as bigint) as degree
from d3 where d >= 3 order by node_key
"""

KG_QUERIES["kg_term_kcore"] = (q_term_kcore, SQL_TERM_KCORE)


def q_term_degree_histogram(sf_dir: str):
    """Degree-distribution profile of the undirected FOLLOWS term graph —
    the first chart of any graph audit (power-law check, hub census):
    distinct-neighbor degree per node, then the (degree, n_nodes)
    histogram. Both aggregates are vocabulary-bounded; the undirected
    distinct edge set reuses the k-core construction."""
    from ..ops.partition import distinct_hp, grouped_aggregate, \
        low_card_aggregate

    edges = _follows_edges_ds(sf_dir).map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")

    def undirect(t: pa.Table) -> pa.Table:
        ne = pc.invert(pc.equal(t["a"], t["b"]))
        ne = ne.combine_chunks() if isinstance(ne, pa.ChunkedArray) else ne
        f = t.filter(ne)
        return pa.table({
            "a": pa.concat_arrays([pc.cast(f["a"], pa.string())
                                   .combine_chunks(),
                                   pc.cast(f["b"], pa.string())
                                   .combine_chunks()]),
            "b": pa.concat_arrays([pc.cast(f["b"], pa.string())
                                   .combine_chunks(),
                                   pc.cast(f["a"], pa.string())
                                   .combine_chunks()])})

    und = distinct_hp(edges.map_batches(undirect, batch_format="pyarrow"),
                      ["a", "b"])
    deg = grouped_aggregate(und, "a", [([], "count_all")], ["degree"])
    hist = low_card_aggregate(deg, "degree", [(None, "count_all")],
                              ["n_nodes"])
    t = pa.Table.from_pylist(hist.take_all(), schema=pa.schema(
        [("degree", pa.int64()), ("n_nodes", pa.int64())]))
    return t.sort_by([("degree", "ascending")])


SQL_TERM_DEGREE_HISTOGRAM = _FOLLOWS_CTE + """
, und as (select a, b from p where a <> b
          union
          select b as a, a as b from p where a <> b),
d as (select a, count(*) as deg from und group by a)
select cast(deg as bigint) as degree, count(*) as n_nodes
from d group by deg order by degree
"""

KG_QUERIES["kg_term_degree_histogram"] = (q_term_degree_histogram,
                                          SQL_TERM_DEGREE_HISTOGRAM)
