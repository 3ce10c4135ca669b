"""Typed graph schema: node/edge enums, Arrow schemas, node keys.

Mirrors the reference's fixed-enum + open-map data model:
  - NodeType / EdgeType enums: /root/reference/ast/src/lang/graphs/mod.rs:31-99
  - NodeData payload:          /root/reference/ast/src/lang/asg.rs:66-82
  - create_node_key identity:  /root/reference/ast/src/utils.rs:82-136
re-targeted at web pages (Page/Host/Entity... instead of File/Function/...).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Closed node-type vocabulary (cf. the 21-variant NodeType enum).
NODE_TYPES = (
    "Corpus",      # ~ Repository
    "Host",        # ~ Package / Directory
    "Page",        # ~ File
    "Section",     # ~ Class (structural container within a page)
    "Link",        # ~ Import
    "Term",        # ~ Var (a vocabulary token mention target)
    "Person",      # ~ Function (primary typed entity)
    "Org",         # ~ Class
    "Place",       # ~ DataModel
    "Year",        # ~ Instance
    "Topic",       # ~ Concept
    "Language",    # Language (kept verbatim)
)

# Closed edge-type vocabulary, serialized UPPERCASE like the reference
# (ast/src/lang/graphs/mod.rs:339-358).
EDGE_TYPES = (
    "CONTAINS",    # Corpus->Host, Host->Page, Page->Section
    "LINKS_TO",    # Page->Host/Page   (~ Imports)
    "MENTIONS",    # Page->Entity      (~ Uses)
    "FOUNDED",     # Person->Org       (~ Calls, relation triple)
    "ACQUIRED",    # Org->Org
    "WORKS_AT",    # Person->Org
    "LOCATED_IN",  # Org->Place
    "OF",          # Entity->Language
    "ALIAS_OF",    # Entity->Entity (canonicalization provenance, ~ Implements)
    "FOLLOWS",     # Term->Term (adjacent-token relation mention, aggregated)
)

MAX_KEY_LEN = 5000  # truncation cap, cf. ast/src/utils.rs:135

NODES_SCHEMA = pa.schema(
    [
        pa.field("node_key", pa.string()),
        pa.field("node_type", pa.string()),
        pa.field("name", pa.string()),
        pa.field("file", pa.string()),          # = url for page-derived nodes
        pa.field("body", pa.large_string()),
        pa.field("start", pa.int64()),
        pa.field("end", pa.int64()),
        pa.field("docs", pa.string()),
        pa.field("hash", pa.string()),
        pa.field("data_type", pa.string()),
        # Open string->string property bag (NodeData.meta,
        # ast/src/lang/asg.rs:66-82). CONTRACT (deliberate deviation from
        # SURVEY.md §1.5's pa.map_ sketch): stored as CANONICAL JSON text —
        # keys sorted, no whitespace (json.dumps(..., sort_keys=True,
        # separators=(",", ":"))) — because (a) map<string,string> does not
        # survive Ray's pandas block conversions in shuffle/groupby stages,
        # (b) canonical text makes the column directly hashable/comparable
        # for dedup and the driver's value-hash, and (c) DuckDB reads it
        # back with json_extract_string(meta, '$.key') while Arrow map
        # kernels offer no comparable win for a ~20-key bag. Consumers
        # parse JSON; meta_to_map() re-exposes map<string,string>.
        pa.field("meta", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        pa.field("src_key", pa.string()),
        pa.field("edge_type", pa.string()),
        pa.field("dst_key", pa.string()),
        pa.field("ref_id", pa.string()),
        pa.field("operand", pa.string()),
        pa.field("confidence", pa.float32()),
        pa.field("strategy", pa.string()),
        pa.field("weight", pa.int64()),   # extension: aggregated mention count
    ]
)


def sanitize(s: str) -> str:
    """Lowercase, alphanumeric-only (cf. sanitize_string, ast/src/utils.rs:219-225)."""
    return "".join(c for c in s.lower() if c.isalnum())


def node_key(node_type: str, name: str, file: str, start: int | None = None,
             verb: str | None = None) -> str:
    """Scalar node key: `{type}-{name}-{file}[-{start}][-{verb}]`, sanitized parts,
    truncated at MAX_KEY_LEN (cf. create_node_key, ast/src/utils.rs:82-136)."""
    parts = [sanitize(node_type), sanitize(name), sanitize(file)]
    if start is not None:
        parts.append(str(start))
    if verb:
        parts.append(sanitize(verb))
    return "-".join(parts)[:MAX_KEY_LEN]


# Unicode-aware: keep letters and numbers in ANY script (re2 \p classes),
# matching the scalar sanitize()'s str.isalnum(). An ASCII-only class here
# would collapse every CJK/Cyrillic/Arabic name to "" and merge all such
# entities into one node_key — silent graph corruption on real web text.
_SANITIZE_RE = r"[^\p{L}\p{N}]"


def sanitize_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized sanitize over an Arrow string array (Unicode-aware,
    agrees with the scalar ``sanitize``).

    Dictionary-encodes first and regex-sanitizes only the DISTINCT values:
    the callers' inputs repeat heavily (node-type constants, urls repeated
    per mention, a vocabulary-bounded canonical column), and the Unicode
    regex is ~4-10x the cost of the hash pass even at low repetition —
    profiled at ~35 CPU-s of the x64 build's mention_edge_final before."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        clean = pc.replace_substring_regex(
            pc.utf8_lower(arr.dictionary), _SANITIZE_RE, "")
        return pc.take(clean, arr.indices)
    enc = pc.dictionary_encode(arr)
    clean = pc.replace_substring_regex(
        pc.utf8_lower(enc.dictionary), _SANITIZE_RE, "")
    return pc.take(clean, enc.indices)


def node_key_array(node_type, name, file, start=None, verb=None) -> pa.Array:
    """Vectorized node_key over Arrow arrays (any arg may be a scalar str)."""
    n = None
    for a in (node_type, name, file, start, verb):
        if isinstance(a, (pa.Array, pa.ChunkedArray)):
            n = len(a)
            break
    assert n is not None, "at least one array argument required"

    def col(a):
        if isinstance(a, (pa.Array, pa.ChunkedArray)):
            return a
        return pa.array([a] * n)

    parts = [sanitize_array(col(node_type)), sanitize_array(col(name)),
             sanitize_array(col(file))]
    if start is not None:
        parts.append(pc.cast(col(start), pa.string()))
    if verb is not None:
        parts.append(sanitize_array(col(verb)))
    joined = pc.binary_join_element_wise(*parts, "-")
    return pc.utf8_slice_codeunits(joined, 0, MAX_KEY_LEN)


def meta_to_map(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Re-expose the canonical-JSON ``meta`` column as
    ``map<string,string>`` for consumers that want Arrow map kernels
    (the SURVEY §1.5 shape). Null / empty JSON -> empty map."""
    import json

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col.to_pylist():
        d = json.loads(v) if v else {}
        out.append(list(d.items()))
    return pa.array(out, pa.map_(pa.string(), pa.string()))
