"""CSLS reference-parity boundary: what IS and ISN'T reproducible.

The reference's ``calculate_nearest_k`` (similarity.py:78-81) runs
``np.partition(-sim, k+1)`` and means the first k slots.  Partition at
kth=k+1 only guarantees slots 0..k hold the top-(k+1) values AS A SET —
which one of those k+1 lands in slot k (and is therefore EXCLUDED from the
mean) depends on introselect's internal pivot walk over the full row
layout, not on the values.  Consequences, pinned here:

1. the dense kernel (`functions.similarity.nearest_k_mean`) replicates the
   reference bit-for-bit — same call shape on the same layout;
2. a distributed path cannot: per-block top-k partials determine the
   top-(k+1) SET but not introselect's slot assignment, so the engine's
   distributed CSLS uses the well-defined exact top-k mean
   (`topk_mean_exact`) instead;
3. the two differ by at most (max - min of the top-(k+1) values) / k per
   row — the bound that makes "documented, not replicated" a quantified
   statement rather than a shrug.
"""

import numpy as np

from ontoea_ray.functions.similarity import nearest_k_mean, topk_mean_exact


def _reference_nearest_k(sim_mat, k):
    # verbatim reference call shape (similarity.py:78-81)
    sorted_mat = -np.partition(-sim_mat, k + 1, axis=1)
    return np.mean(sorted_mat[:, 0:k], axis=1)


def test_dense_kernel_is_bitwise_reference_parity():
    rng = np.random.default_rng(0)
    for shape in [(40, 60), (7, 13), (1, 30)]:
        m = rng.standard_normal(shape)
        k = 5
        assert np.array_equal(nearest_k_mean(m, k), _reference_nearest_k(m, k))


def test_quirk_mean_is_k_of_topk1_and_bound_holds():
    rng = np.random.default_rng(1)
    m = rng.standard_normal((50, 80))
    k = 10
    quirk = nearest_k_mean(m, k)
    exact = topk_mean_exact(m, k)
    topk1 = -np.partition(-m, k, axis=1)[:, : k + 1]  # exact top-(k+1) values
    # the quirk mean equals the mean of SOME k of the top-(k+1) values:
    # sum(quirk)*k = sum(top-(k+1)) - (one element of the top-(k+1))
    dropped = topk1.sum(axis=1) - quirk * k
    lo = topk1.min(axis=1) - 1e-9
    hi = topk1.max(axis=1) + 1e-9
    assert ((dropped >= lo) & (dropped <= hi)).all()
    # and the deviation from the exact top-k mean is bounded by spread/k
    bound = (topk1.max(axis=1) - topk1.min(axis=1)) / k + 1e-12
    assert (np.abs(quirk - exact) <= bound).all()


def test_layout_dependence_demonstrates_why_distributed_cannot_replay():
    # same VALUES, different layout -> different quirk mean: the dropped
    # element is an artifact of introselect over the row layout, so no
    # value-only (distributed top-k) computation can reproduce it in general
    rng = np.random.default_rng(2)
    k = 4
    diffs = 0
    for _ in range(50):
        row = rng.standard_normal(64)
        perm = rng.permutation(64)
        a = nearest_k_mean(row[None, :], k)[0]
        b = nearest_k_mean(row[perm][None, :], k)[0]
        diffs += a != b
    assert diffs > 0  # at least one permutation changed the quirk mean
