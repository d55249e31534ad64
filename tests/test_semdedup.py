"""SemDeDup-style semantic dedup (`stages/ann.semantic_dedup`)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.ann import semantic_dedup


def _emb_ds(vecs):
    v = np.asarray(vecs, np.float32)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(v)), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1), pa.float32()), v.shape[1]
                ),
            }
        )
    )


def _unit(v):
    v = np.asarray(v, np.float64)
    return v / np.linalg.norm(v)


def test_near_duplicates_drop_keep_lowest_id():
    d = 8
    a = _unit(np.ones(d))
    b = _unit(np.ones(d) + 0.01)        # ~cos 1 with a -> dropped
    c = _unit(np.eye(d)[0] - np.eye(d)[1])  # far from a within any cluster
    ds = _emb_ds([a, b, c])
    cents = np.stack([a])  # one cluster holds everything
    out = semantic_dedup(ds, cents, tau_num=9, tau_den=10).to_pandas()
    assert sorted(out["vec_id"]) == [0, 2]
    assert (out["centroid"] == 0).all()


def test_dropped_vector_still_witnesses_later_drops():
    # chain: v0 ~ v1 (close), v1 ~ v2 (close), v0 !~ v2.  Pairwise rule:
    # v1 dropped by v0; v2 dropped by v1 EVEN THOUGH v1 itself is dropped.
    d = 16
    base = np.ones(d)
    step = np.zeros(d); step[0] = 1.0
    v0 = _unit(base)
    v1 = _unit(base + 1.2 * step)
    v2 = _unit(base + 2.4 * step)
    cos01 = float(v0 @ v1); cos12 = float(v1 @ v2); cos02 = float(v0 @ v2)
    # pick tau between cos02 and min(cos01, cos12)
    assert cos02 < 0.96 < min(cos01, cos12)
    out = semantic_dedup(
        _emb_ds([v0, v1, v2]), np.stack([v0]), tau_num=24, tau_den=25
    ).to_pandas()
    assert sorted(out["vec_id"]) == [0]


def test_different_clusters_never_compared():
    d = 8
    a = _unit(np.eye(d)[0])
    b = _unit(np.eye(d)[1])
    ds = _emb_ds([a, a, b, b])  # identical pairs, but split by centroids
    cents = np.stack([a, b])
    out = semantic_dedup(ds, cents, tau_num=9, tau_den=10).to_pandas()
    # within each cluster the higher id of the identical pair drops
    assert sorted(out["vec_id"]) == [0, 2]
    # sanity: with ONE centroid, cross pairs still aren't tau-close
    out1 = semantic_dedup(ds, np.stack([a]), tau_num=9, tau_den=10).to_pandas()
    assert sorted(out1["vec_id"]) == [0, 2]


def test_max_cluster_guard_keeps_everything_and_logs(caplog):
    d = 8
    a = _unit(np.ones(d))
    rows = [a, a, a, a]
    import logging

    with caplog.at_level(logging.WARNING):
        out = semantic_dedup(
            _emb_ds(rows), np.stack([a]), tau_num=9, tau_den=10, max_cluster=2
        ).to_pandas()
    assert sorted(out["vec_id"]) == [0, 1, 2, 3]
