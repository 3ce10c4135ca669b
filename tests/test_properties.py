"""Property-based gates (hypothesis) for the pure kernels that the
distributed operators lean on: the nested-span filter and the
hash-partitioned grouped aggregate. Both are checked against brute-force
reference implementations on arbitrary inputs."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from stakgraph_ray.functions.textutils import filter_nested_spans
from stakgraph_ray.ops.partition import partition_column

spans = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 50)).map(
        lambda p: (min(p), max(p) + 1)),
    max_size=40)


@settings(max_examples=200, deadline=None)
@given(spans)
def test_filter_nested_spans_matches_bruteforce(pairs):
    starts = np.array([a for a, _ in pairs], dtype=np.int64)
    ends = np.array([b for _, b in pairs], dtype=np.int64)
    keep = filter_nested_spans(starts, ends)
    # brute force: drop span i iff some other span strictly contains it,
    # or an identical span with a smaller (start, -end, index) sort position
    # exists (equal spans kept once, first-in-sort-order wins)
    order = np.lexsort((-ends, starts))
    first_equal = {}
    for pos in order:
        key = (starts[pos], ends[pos])
        first_equal.setdefault(key, pos)
    for i in range(len(pairs)):
        contained = any(
            (starts[j] <= starts[i] and ends[j] >= ends[i]
             and (starts[j], ends[j]) != (starts[i], ends[i]))
            for j in range(len(pairs)) if j != i)
        dup_loser = first_equal[(starts[i], ends[i])] != i
        assert keep[i] == (not contained and not dup_loser), (
            i, pairs, keep.tolist())


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=6), st.integers(-1000, 1000)),
                min_size=1, max_size=200),
       st.integers(1, 16))
def test_partition_column_is_total_and_deterministic(rows, P):
    t = pa.table({"k": [k for k, _ in rows], "v": [v for _, v in rows]})
    p1 = partition_column(t, ["k"], P)
    p2 = partition_column(t, ["k"], P)
    assert (p1 == p2).all()
    assert ((p1 >= 0) & (p1 < P)).all()
    # same key -> same partition (the co-location invariant every
    # partitioned_apply consumer relies on)
    seen = {}
    for k, p in zip(t["k"].to_pylist(), p1.tolist()):
        assert seen.setdefault(k, p) == p


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=0, max_size=400),
       st.integers(1, 12),
       st.integers(1, 4))
def test_mg_merge_tree_guarantee(stream_ids, capacity, n_batches):
    """Misra-Gries merge-tree property (Agarwal et al., PODS'12): after
    compressing each batch and the merged summary, (a) every retained count
    is a lower bound on the true count, (b) no retained count underestimates
    by more than the total decrement D, and (c) every key with true count
    > D survives."""
    from stakgraph_ray.ops.sketch import mg_compress

    stream = np.array([f"k{i}" for i in stream_ids])
    true = {k: int(c) for k, c in
            zip(*np.unique(stream, return_counts=True))} if len(stream) else {}
    D = 0
    merged: dict[str, int] = {}
    for chunk in np.array_split(stream, n_batches):
        if len(chunk) == 0:
            continue
        t, c = np.unique(chunk, return_counts=True)
        t, c, d = mg_compress(t, c.astype(np.int64), capacity)
        D += d
        for k, n in zip(t, c):
            merged[k] = merged.get(k, 0) + int(n)
    if merged:
        mk, mc, d = mg_compress(np.array(list(merged)),
                                np.array(list(merged.values())), capacity)
        D += d
        merged = dict(zip(mk, (int(x) for x in mc)))
    assert len(merged) <= capacity
    for k, n in merged.items():
        assert n <= true[k]            # lower bound
        assert true[k] - n <= D        # bounded underestimate
    for k, n in true.items():
        if n > D:
            assert k in merged         # heavy keys always survive
