"""Sharded-dictionary entity linking: the scale path for alias dictionaries
too large to broadcast whole.

The broadcast TermLinker (stages.link) resolves every surface against ONE
copy of the dictionary per actor — right while the dictionary is MBs. At
web scale the registry is GBs: this path SHARDS it by lookup key
(north-star: "entity-link scoring against an alias dictionary sharded
across stateful actors"; cf. the reference's per-language type registry,
/root/reference/ast/src/lang/queries/mod.rs + concurrent graph reads
re-architected per SURVEY.md §7.4):

  1. mentions hash-partition by SURFACE (the exact/alias/stopword lookup
     key); each partition task resolves against ONLY its dictionary shard
     (a ray.put object fetched once per worker process and cached — worker
     processes are the long-lived state holders, 1/P of the dictionary
     in memory each);
  2. rows still unresolved re-partition by NORMALIZED surface (the
     "normalized"-strategy lookup key lives in its own shard space);
  3. union of the two resolutions, stopword rows dropped, unverified stubs
     kept per cfg — byte-identical output to the broadcast TermLinker
     (asserted by tests and by the shared SQL oracle).

Shard assignment reuses ops.partition.partition_column, so a mention's
partition ID and its dictionary shard ID coincide by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..functions.textutils import normalize_surface
from ..ops.partition import partition_column, partitioned_apply
from ..util import default_num_blocks


def _hash_keys(keys: list[str], P: int) -> np.ndarray:
    tbl = pa.table({"k": pa.array(keys, pa.string())})
    return partition_column(tbl, ["k"], P)


def build_dict_shards(d: dict, P: int):
    """Split the (canonical, aliases, stopwords) dictionary into P shards
    keyed by the lookup keyspaces. Returns (surface_shards, norm_shards) —
    lists of ray.put refs (plain dicts when Ray is down, for tests)."""
    from ..ops.relational import broadcast

    # priority order mirrors the broadcast Cascade exactly: a stopword key
    # is dropped even if also canonical (TermLinker filters stop_mask after
    # resolution), and exact beats alias (Cascade checks exact first) —
    # entries are added highest-priority first and setdefault keeps the
    # first, so a key in several namespaces resolves identically here
    surface_entries: list[tuple[str, tuple]] = []
    for s in sorted(d["stopwords"]):
        surface_entries.append((s, ("stop", s)))
    for c in sorted(d["canonical"]):
        surface_entries.append((c, ("exact", c)))
    for a, c in sorted(d["aliases"].items()):
        surface_entries.append((a, ("alias", c)))
    keys = [k for k, _ in surface_entries]
    shard_ids = _hash_keys(keys, P)
    surface_shards: list[dict] = [{} for _ in range(P)]
    for (k, v), p in zip(surface_entries, shard_ids):
        surface_shards[int(p)].setdefault(k, v)

    norm_keys, norm_vals = [], []
    for c in sorted(d["canonical"]):
        nk = normalize_surface(pa.array([c], pa.string()))[0].as_py()
        norm_keys.append(nk)
        norm_vals.append(c)
    norm_ids = _hash_keys(norm_keys, P)
    norm_shards: list[dict] = [{} for _ in range(P)]
    for k, v, p in zip(norm_keys, norm_vals, norm_ids):
        # LAST canonical (sorted order) wins, mirroring Cascade's
        # {_norm(c): c for c in sorted(canonical)} dict-comprehension
        # overwrite — both paths must pick the same canonical on collision
        norm_shards[int(p)][k] = v
    return ([broadcast(s) for s in surface_shards],
            [broadcast(s) for s in norm_shards])


_SHARD_CACHE: dict = {}  # per worker process: ref hex -> resolved shard


def _get_shard(ref):
    from ..ops.relational import _resolve

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    s = _SHARD_CACHE.get(key)
    if s is None:
        s = _resolve(ref)
        _SHARD_CACHE[key] = s
    return s


def link_mentions_sharded(mentions_ds, dictionary: dict | None = None,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          num_partitions: int | None = None):
    """mentions (url, surface, ...) -> linked rows (adds canonical,
    confidence (float32), strategy) — TermLinker semantics, sharded state."""
    from .link import default_dictionary

    d = dictionary or default_dictionary()
    P = num_partitions or default_num_blocks()
    surface_shards, norm_shards = build_dict_shards(d, P)
    conf = dict(cfg.link_confidences)
    keep_unverified = cfg.keep_unverified

    def pass1(t: pa.Table) -> pa.Table:
        p = int(partition_column(t.slice(0, 1), ["surface"], P)[0])
        shard = _get_shard(surface_shards[p])
        s = pd.Series(t["surface"].to_pandas().values)
        hit = s.map(shard)  # NaN | (kind, canonical)
        kinds = np.array([h[0] if isinstance(h, tuple) else "" for h in hit],
                         dtype=object)
        canon = np.array([h[1] if isinstance(h, tuple) else None for h in hit],
                         dtype=object)
        n = len(s)
        confidence = np.zeros(n, dtype="float32")
        strategy = np.empty(n, dtype=object)
        exact = kinds == "exact"
        alias = kinds == "alias"
        stop = kinds == "stop"
        confidence[exact] = conf["exact"]
        strategy[exact] = "exact"
        confidence[alias] = conf["alias"]
        strategy[alias] = "alias"
        resolved = exact | alias
        out = t.append_column("canonical", pa.array(
            np.where(resolved, canon, s.values), pa.string()))
        out = out.append_column("confidence", pa.array(confidence, pa.float32()))
        out = out.append_column("strategy", pa.array(
            np.where(resolved, strategy, None), pa.string()))
        return out.filter(pa.array(~stop))  # stopword gate

    def pass2(t: pa.Table) -> pa.Table:
        unresolved = pc.is_null(t["strategy"])
        done = t.filter(pc.invert(unresolved))
        rest = t.filter(unresolved)
        if rest.num_rows == 0:
            return done
        norm = normalize_surface(rest["norm_key"]
                                 if "norm_key" in rest.column_names
                                 else rest["surface"])
        p = int(partition_column(pa.table({"k": norm.slice(0, 1)}), ["k"], P)[0])
        shard = _get_shard(norm_shards[p])
        s = pd.Series(norm.to_pylist())
        hit = s.map(shard)
        ok = hit.notna().values
        canon = np.where(ok, hit.values, rest["surface"].to_numpy(zero_copy_only=False))
        confidence = np.where(ok, conf["normalized"], conf["unverified"]) \
            .astype("float32")
        strategy = np.where(ok, "normalized", "unverified").astype(object)
        rest = rest.set_column(rest.column_names.index("canonical"), "canonical",
                               pa.array(canon, pa.string()))
        rest = rest.set_column(rest.column_names.index("confidence"), "confidence",
                               pa.array(confidence, pa.float32()))
        rest = rest.set_column(rest.column_names.index("strategy"), "strategy",
                               pa.array(strategy, pa.string()))
        if not keep_unverified:
            rest = rest.filter(pc.not_equal(rest["strategy"], "unverified"))
        return pa.concat_tables([done, rest])

    linked1 = partitioned_apply(mentions_ds, "surface", pass1, P)
    # pass 2 re-partitions by the NORMALIZED key; resolved rows ride along
    # (their strategy is non-null, pass2 forwards them untouched)
    def add_norm(t: pa.Table) -> pa.Table:
        return t.append_column("norm_key", normalize_surface(
            t["surface"].combine_chunks() if isinstance(t["surface"], pa.ChunkedArray)
            else t["surface"]))

    linked1 = linked1.map_batches(add_norm, batch_format="pyarrow")
    out = partitioned_apply(linked1, "norm_key", pass2, P)
    return out.map_batches(lambda t: t.drop_columns(["norm_key"]),
                           batch_format="pyarrow")
