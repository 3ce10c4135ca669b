"""stakgraph_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of stakwork/stakgraph (a source-code →
typed-property-graph builder, see /root/reference) as idiomatic Ray Data
pipelines over Common-Crawl-style web pages:

    pages (url, warc_ts, html, text, lang) Parquet
      → deterministic HTML→text extraction        (map_batches, Arrow)
      → typed mention + triple extraction          (actor pool, compiled patterns)
      → entity linking vs sharded alias dictionary (actor pool, broadcast side)
      → MinHash/LSH canonicalization               (groupby shuffle, salted keys)
      → partitioned Parquet node/edge tables       (resumable, lineage manifests)

Nothing here calls ray.init()/ray.shutdown(); sessions are owned by the
driver, bench.py, or the pytest fixture.
"""

__version__ = "0.1.0"
