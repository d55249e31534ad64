"""Neighbourhood-overlap link prediction (`stages/graph.common_neighbor_pairs`)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.graph import common_neighbor_pairs


def _edges(pairs):
    a, b = zip(*pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
            }
        )
    )


def test_hand_graph_counts_degrees_and_jaccard():
    # 1-2, 1-3, 2-3, 2-4, 3-4, 4-5
    ds = common_neighbor_pairs(
        _edges([(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]), min_common=1
    )
    df = ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    got = {
        (r.id_a, r.id_b): (r.cn, r.da, r.db, r.jac_milli) for r in df.itertuples()
    }
    # non-adjacent distance-2 pairs only: (1,4) via {2,3}; (2,5), (3,5) via 4
    assert set(got) == {(1, 4), (2, 5), (3, 5)}
    assert got[(1, 4)] == (2, 2, 3, 1000 * 2 // (2 + 3 - 2))
    assert got[(2, 5)] == (1, 3, 1, 1000 * 1 // (3 + 1 - 1))
    assert got[(3, 5)] == (1, 3, 1, 333)


def test_min_common_filters_and_adjacent_pairs_excluded():
    ds = common_neighbor_pairs(
        _edges([(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]), min_common=2
    )
    df = ds.to_pandas()
    assert set(zip(df["id_a"], df["id_b"])) == {(1, 4)}
    # adjacent pairs never appear even when they share neighbours (1-2 share 3)
    assert (1, 2) not in set(zip(df["id_a"], df["id_b"]))


def test_partitioning_invariance():
    pairs = [(i, i + 1) for i in range(1, 40)] + [(i, i + 2) for i in range(1, 30)]
    one = common_neighbor_pairs(_edges(pairs), min_common=1).to_pandas()
    many = common_neighbor_pairs(
        _edges(pairs).repartition(7), min_common=1
    ).to_pandas()
    key = ["id_a", "id_b"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        one.sort_values(key).reset_index(drop=True),
        many.sort_values(key).reset_index(drop=True),
    )
