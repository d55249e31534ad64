"""q_reciprocity's canonical-pair kernel on a hand digraph with mutual links."""

import numpy as np
import pyarrow as pa
import ray.data


def test_reciprocity_counts_mutual_edges(ray_session):
    from ontoea_ray.queries import q_reciprocity
    import ontoea_ray.queries as Q

    # monkey-free direct kernel exercise: build a domain_edges-shaped
    # dataset and run the same plan via the module-level helpers
    edges = [
        ("a", "b"), ("b", "a"),          # mutual pair
        ("a", "c"),                        # one-way
        ("c", "d"), ("d", "c"), ("d", "c"),  # mutual with duplicate row
        ("e", "e"),                        # self loop: excluded
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src_domain": pa.array([s for s, _ in edges], pa.string()),
                "dst_domain": pa.array([d for _, d in edges], pa.string()),
            }
        )
    ).repartition(3)

    import ontoea_ray.sources.pages as pages_mod
    import ontoea_ray.stages.weblinks as wl

    orig_pages, orig_edges = pages_mod.pages_from_documents, wl.domain_edges
    try:
        pages_mod.pages_from_documents = lambda sf: None
        wl.domain_edges = lambda pages: ds
        out = q_reciprocity("ignored").take_all()
    finally:
        pages_mod.pages_from_documents, wl.domain_edges = orig_pages, orig_edges
    # distinct non-self edges: ab, ba, ac, cd, dc -> 5; reciprocal: ab, ba, cd, dc -> 4
    assert out == [{"n_edges": 5, "n_reciprocal": 4}]
