"""stages/mining.csls_mutual_pairs vs a dense numpy replay."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.mining import csls_mutual_pairs


def _dense_mutual(A, B, k):
    an = A / np.linalg.norm(A, axis=1, keepdims=True)
    bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    s = an @ bn.T
    kk = min(k, s.shape[1])
    r = -np.partition(-s, kk - 1, axis=1)[:, :kk].mean(1)
    kk2 = min(k, s.shape[0])
    c = -np.partition(-s.T, kk2 - 1, axis=1)[:, :kk2].mean(1)
    csls = 2 * s - r[:, None] - c[None, :]
    ba = csls.argmax(1)
    bb = csls.argmax(0)
    return {(i, ba[i]) for i in range(len(A)) if bb[ba[i]] == i}


def _ds(ids, M):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(M.astype(np.float32).reshape(-1), pa.float32()), M.shape[1]
                ),
            }
        )
    )


def test_csls_mutual_matches_dense(ray_session):
    rng = np.random.default_rng(3)
    A = rng.normal(size=(23, 8))
    B = rng.normal(size=(31, 8))
    # plant two obvious mutual pairs
    B[5] = A[7] + 0.01 * rng.normal(size=8)
    B[20] = A[2] + 0.01 * rng.normal(size=8)
    ids_a = np.arange(0, 46, 2)
    ids_b = np.arange(1, 62, 2)
    want = {
        (ids_a[i], ids_b[j]) for i, j in _dense_mutual(A, B, 4)
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in csls_mutual_pairs(
            _ds(ids_a, A).repartition(4), _ds(ids_b, B).repartition(5), k=4
        ).take_all()
    }
    assert got == want
    assert (ids_a[7], ids_b[5]) in got and (ids_a[2], ids_b[20]) in got


def test_csls_mutual_block_invariance(ray_session):
    rng = np.random.default_rng(11)
    A = rng.normal(size=(40, 6))
    B = rng.normal(size=(40, 6))

    def run(pa_, pb_):
        return sorted(
            (r["id_a"], r["id_b"])
            for r in csls_mutual_pairs(
                _ds(np.arange(40), A).repartition(pa_),
                _ds(np.arange(100, 140), B).repartition(pb_),
                k=3,
            ).take_all()
        )

    assert run(1, 1) == run(7, 3)
