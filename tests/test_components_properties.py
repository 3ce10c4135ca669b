"""Property test: distributed min-label propagation on RANDOM graphs must
produce exactly the components a pure union-find computes — across chain,
star, clique and disconnected shapes hypothesis generates."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edges_s = st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                   min_size=1, max_size=25)


def _uf_components(nodes, pairs):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@given(pairs=edges_s)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_label_propagation_matches_union_find_random(ray_session, pairs):
    import ray.data as rd

    from stakgraph_ray.ops.neardup import label_propagation_clusters

    nodes = sorted({x for p in pairs for x in p})
    ds = rd.from_arrow(pa.table({"id": pa.array(nodes, pa.int64())}))
    pds = rd.from_arrow(pa.table(
        {"a": pa.array([p[0] for p in pairs], pa.int64()),
         "b": pa.array([p[1] for p in pairs], pa.int64())}))
    out = {r["doc_id"]: r["cluster_id"]
           for r in label_propagation_clusters(ds, "id", pds,
                                               num_partitions=3).take_all()}
    want = _uf_components(nodes, pairs)
    # min-label propagation labels each component by its smallest node id,
    # and the min-root union-find does the same
    assert out == want
