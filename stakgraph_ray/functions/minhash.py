"""MinHash / SimHash / shingle fingerprints (deterministic, numpy-vectorized).

The reference deduplicates by exact keys only (BTreeMap insert,
/root/reference/ast/src/lang/graphs/btreemap_graph.rs:57-62); near-dup
blocking via MinHash+LSH is the net-new web-scale piece required by the
north rule (canonicalization blocking + training-data dedup).

All hashing is explicit-arithmetic (no Python ``hash``), so signatures are
stable across processes and runs.
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(n_perms: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(42)
    a = rng.randint(1, (1 << 61) - 1, size=n_perms, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=n_perms, dtype=np.uint64)
    return a, b


def char_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-char shingle hashes of one string (crc32, uint64)."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode("utf-8"))], dtype=np.uint64)
    enc = text.encode("utf-8")
    # byte-level shingles over the utf-8 encoding (k chars ~ k bytes for the
    # synthetic corpora; deterministic regardless)
    seen = {zlib.crc32(enc[i:i + k]) for i in range(len(enc) - k + 1)}
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))


def token_ngram_set(text: str, n: int = 3) -> set[str]:
    """Token n-gram set (whitespace tokens joined by a space)."""
    toks = text.split(" ") if text else []
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over shingles of (a*h + b) mod 2^61-1."""
    if len(shingle_hashes) == 0:
        return np.zeros(len(a), dtype=np.uint64)
    h = shingle_hashes[:, None]  # (m, 1)
    vals = (h * a[None, :] + b[None, :]) % _MERSENNE  # (m, p)
    return vals.min(axis=0).astype(np.uint64)


_POLY = np.uint64(1000003)


def minhash_token_signatures(texts, a: np.ndarray, b: np.ndarray,
                             ngram: int = 3) -> np.ndarray:
    """(n_rows, n_perms) signatures over token n-grams for a whole Arrow
    string column at once — zero per-row Python.

    Tokenization (pyarrow split) and token hashing (pandas siphash over the
    flattened value array) are batch-level; gram hashes are a polynomial
    combine of ``ngram`` consecutive token hashes (min over a multiset ==
    min over the set, so no per-doc gram dedup is needed); per-doc minima
    come from one argsort-free reduceat per permutation. Semantics match
    token_ngram_set: <ngram tokens -> one whole-text gram, empty text ->
    all-zero signature. The gram hash differs from the scalar crc32 path by
    design — MinHash only needs a fixed uniform hash, and no consumer
    compares signatures across the two kernels."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    n = len(texts)
    n_perms = len(a)
    if n == 0:
        return np.empty((0, n_perms), dtype=np.uint64)
    tok = pc.split_pattern(texts, " ")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    offs = tok.offsets.to_numpy().astype(np.int64)
    # hash DISTINCT tokens only (dictionary-encode), then gather: web-text
    # vocabulary per batch is far smaller than the token count
    venc = tok.values.dictionary_encode()
    if len(venc) == 0:
        tokh = np.empty(0, dtype=np.uint64)
    else:
        dich = pd.util.hash_array(
            np.asarray(venc.dictionary.to_pylist(), dtype=object)
        ).astype(np.uint64)
        tokh = dich[venc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    counts = np.diff(offs)                      # tokens per doc
    empty = np.asarray(pc.equal(texts, "")).astype(bool)  # -> zero signature

    # long docs: grams = every window of `ngram` consecutive tokens
    doc_of_tok = np.repeat(np.arange(n, dtype=np.int64), counts)
    if len(tokh) >= ngram:
        gram_h = tokh[: len(tokh) - ngram + 1].copy()
        for k in range(1, ngram):
            gram_h = gram_h * _POLY + tokh[k: len(tokh) - ngram + 1 + k]
        valid = doc_of_tok[: len(tokh) - ngram + 1] == \
            doc_of_tok[ngram - 1:]
        valid &= ~empty[doc_of_tok[: len(tokh) - ngram + 1]]
        gram_h = gram_h[valid]
        gram_doc = doc_of_tok[: len(tokh) - ngram + 1][valid]
    else:
        gram_h = np.empty(0, dtype=np.uint64)
        gram_doc = np.empty(0, dtype=np.int64)

    # short docs (1 <= tokens < ngram, non-empty text): one whole-text gram
    short = (counts >= 1) & (counts < ngram) & ~empty
    if short.any():
        sdocs = np.flatnonzero(short)
        sh = np.zeros(len(sdocs), dtype=np.uint64)
        for k in range(ngram - 1):          # bounded by ngram, not rows
            has = counts[sdocs] > k
            sh[has] = sh[has] * _POLY + tokh[offs[sdocs[has]] + k]
        gram_h = np.concatenate([gram_h, sh])
        gram_doc = np.concatenate([gram_doc, sdocs])

    out = np.zeros((n, n_perms), dtype=np.uint64)
    if len(gram_h) == 0:
        return out
    order = np.argsort(gram_doc, kind="stable")
    gram_h, gram_doc = gram_h[order], gram_doc[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(gram_doc[1:] != gram_doc[:-1]) + 1))
    docs_with = gram_doc[starts]
    for p in range(n_perms):
        vals = (gram_h * a[p] + b[p]) % _MERSENNE
        out[docs_with, p] = np.minimum.reduceat(vals, starts)
    return out


def minhash_batch(texts: list[str], n_perms: int = 64, k: int = 3) -> np.ndarray:
    """(n_rows, n_perms) uint64 signature matrix for a batch of strings."""
    a, b = _perm_params(n_perms)
    out = np.empty((len(texts), n_perms), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = minhash_signature(char_shingle_hashes(t or "", k), a, b)
    return out


def band_keys(signatures: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_rows, n_bands) uint32 band hashes — vectorized xor-multiply mix
    over the band's minhash values (the loop is rows_per_band wide, i.e.
    ~4 iterations, each a whole-matrix numpy op; the previous per-row
    per-band crc32 Python loop dominated the signature stage at corpus
    scale). Any deterministic function of band CONTENT works here: equal
    bands always collide, so LSH recall is unchanged, and spurious
    collisions are verified away by the signature-similarity check."""
    n_rows, n_perms = signatures.shape
    assert n_perms % n_bands == 0
    rpb = n_perms // n_bands
    s = signatures.astype(np.uint64).reshape(n_rows, n_bands, rpb)
    mult = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier
    acc = np.full((n_rows, n_bands), np.uint64(0x243F6A8885A308D3))
    with np.errstate(over="ignore"):
        for j in range(rpb):
            acc = (acc ^ s[:, :, j]) * mult
        acc ^= acc >> np.uint64(33)
        acc *= mult
    return (acc >> np.uint64(32)).astype(np.uint32)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


_M64 = 0xFFFFFFFFFFFFFFFF


from functools import lru_cache as _lru_cache
import hashlib as _hashlib


def _md5low64_raw(s: str) -> int:
    """Uncached kernel — for callers whose inputs are near-unique (rolling
    char windows, per-row ids), where an LRU insert per call is pure
    overhead and evicts the genuinely repeated token entries."""
    return int.from_bytes(_hashlib.md5(s.encode("utf-8")).digest()[8:16],
                          "little")


@_lru_cache(maxsize=1 << 20)
def md5low64(s: str) -> int:
    """Upper-half-little-endian 64 bits of md5 — the exact value DuckDB's
    ``md5_number_lower`` computes, so SimHash / fingerprints built on it are
    SQL-reproducible oracle-side. Memoized: web-corpus TOKEN sets are
    heavily repeated (closed-ish vocabulary), so per-distinct-string cost
    amortizes to a dict hit inside long-lived worker processes. Near-unique
    inputs should call ``_md5low64_raw`` instead of thrashing this cache."""
    return _md5low64_raw(s)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (md5-low-64 token hash);
    pure-int arithmetic (numpy shifts overflow on the top bit)."""
    acc = [0] * 64
    for tok in (text or "").split(" "):
        if not tok:
            continue
        h = md5low64(tok)
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash64_batch(texts) -> np.ndarray:
    """Vectorized simhash64 over a whole Arrow string column: pyarrow
    tokenize, md5-low-64 on DISTINCT tokens only (dictionary encode — the
    token hash must stay md5 so the DuckDB oracle reproduces it), then the
    ±1 bit accumulation as numpy reduceat per doc (8-bit chunks bound the
    (tokens, bits) working set). Bit i of doc d is set iff
    2 * count(tokens with bit i set) > count(tokens) — identical to the
    scalar acc>0 rule. Matches simhash64 exactly (parity-tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(pc.cast(texts, pa.string()), "")
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return out
    tok = pc.split_pattern(texts, " ")
    if isinstance(tok, pa.ChunkedArray):
        tok = tok.combine_chunks()
    counts = np.diff(tok.offsets.to_numpy().astype(np.int64))
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    venc = tok.values.dictionary_encode()
    if len(venc) == 0:
        return out
    dic = venc.dictionary.to_pylist()
    dich = np.array([md5low64(s) if s else 0 for s in dic], dtype=np.uint64)
    nonempty_dic = np.array([s != "" for s in dic], dtype=bool)
    idx = venc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    keep = nonempty_dic[idx]
    H = dich[idx][keep]
    doc = doc_of[keep]                  # monotonic: filter preserves order
    if len(H) == 0:
        return out
    starts = np.concatenate(([0], np.flatnonzero(doc[1:] != doc[:-1]) + 1))
    docs_with = doc[starts]
    ntok = np.diff(np.concatenate((starts, [len(doc)])))
    hbits = np.zeros(len(docs_with), dtype=np.uint64)
    for lo in range(0, 64, 8):
        shifts = np.arange(lo, lo + 8, dtype=np.uint64)
        bits = ((H[:, None] >> shifts[None, :]) &
                np.uint64(1)).astype(np.int32)      # (T, 8)
        ones = np.add.reduceat(bits, starts, axis=0)  # (D, 8)
        set_bits = (2 * ones) > ntok[:, None]
        hbits |= (set_bits.astype(np.uint64) <<
                  shifts[None, :]).sum(axis=1, dtype=np.uint64)
    out[docs_with] = hbits
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style document fingerprint: min md5-low-64 over CHAR
    windows (char-based, consistent with the char-offset mention contract;
    md5-low-64 keeps it DuckDB-reproducible)."""
    t = text or ""
    if len(t) <= window:
        return _md5low64_raw(t)
    return min(_md5low64_raw(t[i:i + window])
               for i in range(len(t) - window + 1))
