"""Connected components (stages/graph.py): hand-graph fixpoints."""

import pyarrow as pa
import ray.data

from ontoea_ray.stages.graph import connected_components


def _cc(edge_list):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edge_list], pa.int64()),
                "id_b": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    rows = connected_components(ds).take_all()
    return {r["node"]: r["component"] for r in rows}


def test_cc_chain_clique_and_separate_pairs(ray_session):
    # chain 1-2-3-4-5 (diameter forces multiple propagation rounds),
    # clique {10,11,12}, pair {20,21}
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _cc(edges)
    assert {n: c for n, c in got.items() if n <= 5} == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert {n: c for n, c in got.items() if 10 <= n <= 12} == {10: 10, 11: 10, 12: 10}
    assert {n: c for n, c in got.items() if n >= 20} == {20: 20, 21: 20}


def test_cc_long_chain_converges(ray_session):
    # a 30-node chain: min label must travel the full diameter
    edges = [(i, i + 1) for i in range(100, 130)]
    got = _cc(edges)
    assert set(got.values()) == {100}
    assert len(got) == 31


def test_cc_partitioned_input(ray_session):
    edges = [(i, i + 1) for i in range(0, 40, 2)]  # 20 disjoint pairs
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(7)
    rows = connected_components(ds).take_all()
    got = {r["node"]: r["component"] for r in rows}
    for a, b in edges:
        assert got[a] == got[b] == a
