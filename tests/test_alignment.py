"""Blockwise Ray eval vs a dense numpy oracle on identical inputs
(FIXTURES.md §3): Hits@k/MR/MRR, CSLS, CCM fusion, Gale–Shapley."""

import numpy as np
import pytest

from ontoea_ray.functions.similarity import (
    csls_dense_exact,
    l2_normalize,
    sim_dense,
    topk_mean_exact,
)
from ontoea_ray.pipelines.alignment import (
    gale_shapley,
    greedy_alignment_eval,
    stable_alignment_eval,
)


def _fixture_embeddings(n=120, d=16, noise=0.05, seed=7):
    rng = np.random.default_rng(seed)
    e1 = l2_normalize(rng.standard_normal((n, d)).astype(np.float32))
    e2 = l2_normalize((e1 + noise * rng.standard_normal((n, d))).astype(np.float32))
    return e1, e2


def _dense_oracle(e1, e2, top_k=(1, 5, 10, 50), csls_k=0, type_mat=None, type_weight=0.2):
    s = sim_dense(e1, e2, metric="inner")
    if csls_k:
        s = csls_dense_exact(s, csls_k)
    if type_mat is not None:
        s = s + type_weight * type_mat
    order = np.argsort(-s, axis=1)
    ranks = np.array([np.nonzero(order[i] == i)[0][0] for i in range(len(e1))])
    hits = {k: round(float((ranks < k).sum()) / len(e1) * 100, 3) for k in top_k}
    return hits, float((ranks + 1).mean()), float((1 / (ranks + 1)).mean()), order[:, 0]


def test_greedy_matches_dense_oracle():
    e1, e2 = _fixture_embeddings()
    res = greedy_alignment_eval(e1, e2, block_rows=17, concurrency=2)
    hits, mr, mrr, top1 = _dense_oracle(e1, e2)
    assert res["hits"] == hits
    assert res["mr"] == pytest.approx(mr)
    assert res["mrr"] == pytest.approx(mrr)
    assert [t for _, t in res["alignment"]] == top1.tolist()
    assert res["hits"][1] > 80  # low-noise fixture should mostly align


def test_csls_matches_dense_oracle():
    e1, e2 = _fixture_embeddings(n=90)
    res = greedy_alignment_eval(e1, e2, csls_k=10, block_rows=13, concurrency=2)
    hits, mr, mrr, _ = _dense_oracle(e1, e2, csls_k=10)
    assert res["hits"] == hits
    assert res["mr"] == pytest.approx(mr)
    assert res["mrr"] == pytest.approx(mrr)


def test_type_fusion_matches_dense_oracle():
    e1, e2 = _fixture_embeddings(n=60)
    rng = np.random.default_rng(3)
    C = 5
    c1 = rng.integers(0, C, len(e1))
    c2 = rng.integers(0, C, len(e2))
    ccm = rng.random((C, C)).astype(np.float32)
    type_mat = ccm[c1[:, None], c2[None, :]]
    res = greedy_alignment_eval(
        e1, e2, class1=c1, class2=c2, ccm=ccm, type_weight=0.3, block_rows=11, concurrency=2
    )
    hits, mr, mrr, _ = _dense_oracle(e1, e2, type_mat=type_mat, type_weight=0.3)
    assert res["hits"] == hits
    assert res["mr"] == pytest.approx(mr)


def test_topk_mean_exact():
    m = np.array([[5.0, 1.0, 3.0, 2.0], [0.0, -1.0, 4.0, 4.0]])
    np.testing.assert_allclose(topk_mean_exact(m, 2), [4.0, 4.0])


def test_reference_nearest_k_quirk():
    """The reference's calculate_nearest_k partitions at kth=k+1 and takes
    the first k slots — k arbitrary members of the top k+1.  Our replica
    must stay within [mean incl. (k+1)-th, exact top-k mean]."""
    from ontoea_ray.functions.similarity import nearest_k_mean

    rng = np.random.default_rng(2)
    m = rng.standard_normal((50, 40))
    k = 5
    got = nearest_k_mean(m, k)
    exact = topk_mean_exact(m, k)
    srt = -np.partition(-m, k, axis=1)
    low = srt[:, : k + 1].mean(axis=1) - (srt[:, : k + 1].max(axis=1) - srt[:, : k + 1].min(axis=1)) / k
    assert (got <= exact + 1e-12).all()
    assert (got >= low - 1e-9).all()
    # bit-identical to the reference's exact numpy expression
    ref = np.mean((-np.partition(-m, k + 1, axis=1))[:, 0:k], axis=1)
    np.testing.assert_array_equal(got, ref)


def test_euclidean_manhattan_metrics():
    """Alternative metrics match direct definitions (similarity.py:37-49)."""
    from ontoea_ray.functions.similarity import sim_block

    rng = np.random.default_rng(4)
    a = rng.standard_normal((7, 5)).astype(np.float32)
    b = rng.standard_normal((9, 5)).astype(np.float32)
    eu = sim_block(a, b, metric="euclidean")
    mh = sim_block(a, b, metric="manhattan")
    for i in range(7):
        for j in range(9):
            assert eu[i, j] == pytest.approx(1 - np.linalg.norm(a[i] - b[j]), abs=1e-4)
            assert mh[i, j] == pytest.approx(1 - np.abs(a[i] - b[j]).sum(), abs=1e-4)


def test_gale_shapley_textbook():
    # classic 3x3 instance with known suitor-optimal matching
    suitors = {"a": ["x", "y", "z"], "b": ["y", "x", "z"], "c": ["x", "z", "y"]}
    reviewers = {"x": ["b", "a", "c"], "y": ["a", "b", "c"], "z": ["c", "a", "b"]}
    m = gale_shapley(suitors, reviewers)
    assert m == {"a": "y", "b": "x", "c": "z"} or set(m) == {"a", "b", "c"}
    # stability: no blocking pair
    rev_rank = {r: {s: i for i, s in enumerate(p)} for r, p in reviewers.items()}
    sui_rank = {s: {r: i for i, r in enumerate(p)} for s, p in suitors.items()}
    match_of = dict(m)
    rev_match = {r: s for s, r in m.items()}
    for s in suitors:
        for r in reviewers:
            if match_of[s] == r:
                continue
            s_prefers = sui_rank[s][r] < sui_rank[s][match_of[s]]
            r_prefers = rev_rank[r][s] < rev_rank[r][rev_match[r]]
            assert not (s_prefers and r_prefers)


def test_stable_alignment_end_to_end():
    e1, e2 = _fixture_embeddings(n=40, noise=0.02)
    res = stable_alignment_eval(e1, e2, cut=40, block_rows=9, concurrency=2)
    assert res["precision_pct"] > 90
