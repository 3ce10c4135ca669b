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
