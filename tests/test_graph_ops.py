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
