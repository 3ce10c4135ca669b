"""Connected-components query: driver union-find tail vs distributed
label-propagation parity (guard forced to 0 for the distributed path)."""

def test_term_components_driver_and_distributed_agree(ray_session, sf_tiny):
    from stakgraph_ray.pipelines.queries_kg import q_term_components

    fast = sorted((r["term"], r["comp"])
                  for r in q_term_components(sf_tiny).take_all())
    # max_pairs=0 forces the distributed label-propagation path
    slow = sorted((r["term"], r["comp"])
                  for r in q_term_components(sf_tiny, max_pairs=0).take_all())
    assert fast == slow and len(fast) > 0


def test_bfs_shortest_paths_tiebreak_and_cycles(ray_session):
    """Path reconstruction: min-lex shortest path wins ties, cycles don't
    revisit, unreachable nodes are absent, source has depth 0."""
    import pyarrow as pa
    import ray.data as rd

    from stakgraph_ray.ops.graph import bfs_shortest_paths

    # s->a->t, s->b->t (tie at t: via 'a' wins lexicographically),
    # t->s closes a cycle, z is unreachable, s->t2 is a longer direct miss
    edges = pa.table({
        "src_key": ["s", "s", "a", "b", "t", "z"],
        "dst_key": ["a", "b", "t", "t", "s", "z2"],
    })
    got = {r["node_key"]: r for r in
           bfs_shortest_paths(rd.from_arrow(edges), "s", max_depth=3).take_all()}
    assert set(got) == {"s", "a", "b", "t"}
    assert got["s"]["depth"] == 0 and got["s"]["path"] == "s"
    assert got["a"]["depth"] == 1 and got["a"]["path"] == "s->a"
    assert got["b"]["depth"] == 1 and got["b"]["path"] == "s->b"
    assert got["t"]["depth"] == 2 and got["t"]["path"] == "s->a->t"


def test_bfs_shortest_paths_distributed_branch_parity(ray_session):
    """broadcast_limit=0 forces the co-group expansion + left-anti seen
    subtraction; results must equal the broadcast path exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from stakgraph_ray.ops.graph import bfs_shortest_paths

    rng = np.random.RandomState(5)
    n = 40
    src = rng.randint(0, n, 120)
    dst = rng.randint(0, n, 120)
    edges = pa.table({"src_key": [f"n{a}" for a in src],
                      "dst_key": [f"n{b}" for b in dst]})

    def run(limit):
        rows = bfs_shortest_paths(rd.from_arrow(edges), "n0", max_depth=4,
                                  broadcast_limit=limit).take_all()
        return sorted((r["node_key"], r["depth"], r["path"]) for r in rows)

    assert run(500_000) == run(0)


def test_linkpred_driver_and_distributed_parity(ray_session, sf_tiny):
    """The link predictors' guarded driver tail must emit IDENTICAL tables
    to the 6-exchange distributed path (local_limit=0 forces distributed;
    the apply_epilogue / reduce_triples adaptive-tail precedent)."""
    from stakgraph_ray.pipelines.queries_kg import (q_adamic_adar,
                                                    q_term_link_prediction)

    for fn in (q_term_link_prediction, q_adamic_adar):
        fast = fn(sf_tiny)
        slow = fn(sf_tiny, local_limit=0)
        assert fast.schema == slow.schema
        assert fast.to_pylist() == slow.to_pylist()
        assert fast.num_rows > 0  # the tiny corpus actually predicts links
