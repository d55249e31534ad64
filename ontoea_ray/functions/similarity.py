"""Similarity kernels with the reference's exact numerical semantics.

Dense forms (for oracles/small inputs) and per-block forms used inside
``map_batches`` (left rows streamed against a broadcast right matrix — the
full n1×n2 similarity matrix is NEVER materialized on a Dataset path).

Reference semantics (cited, not copied):
- metric variants ('inner' default; cosine == inner on L2-normalized rows):
  /root/reference/code/src/openea/modules/finding/similarity.py:9-52
- CSLS rescale 2*sim - rowmean_k - colmean_k: similarity.py:55-81.  NOTE the
  reference computes the "top-k mean" via np.partition with kth=k+1 and then
  takes the first k slots — i.e. k arbitrary values out of the top k+1.  We
  reproduce the same call exactly so values match bit-for-bit.
"""

from __future__ import annotations

import numpy as np


def l2_normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def sim_block(embed1: np.ndarray, embed2: np.ndarray, metric: str = "inner", normalize: bool = False) -> np.ndarray:
    """Pairwise similarity of a (block of) embed1 against embed2."""
    if normalize:
        embed1 = l2_normalize(embed1)
        embed2 = l2_normalize(embed2)
    if metric in ("inner", "cosine") and (metric == "inner" or normalize):
        return embed1 @ embed2.T
    if metric == "cosine":
        a = l2_normalize(embed1.astype(np.float64))
        b = l2_normalize(embed2.astype(np.float64))
        return (1 - (1 - a @ b.T)).astype(np.float32)  # 1 - cosine_distance
    if metric == "euclidean":
        aa = (embed1 * embed1).sum(1)[:, None]
        bb = (embed2 * embed2).sum(1)[None, :]
        d2 = np.maximum(aa + bb - 2 * (embed1 @ embed2.T), 0)
        return (1 - np.sqrt(d2)).astype(np.float32)
    if metric == "manhattan":
        out = np.empty((embed1.shape[0], embed2.shape[0]), dtype=np.float64)
        for i in range(embed1.shape[0]):  # row-at-a-time to bound memory
            out[i] = np.abs(embed2 - embed1[i]).sum(1)
        return (1 - out).astype(np.float32)
    raise ValueError(f"unknown metric {metric!r}")


def nearest_k_mean(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """Reference's calculate_nearest_k: mean of the first k slots of a
    partition at kth=k+1 (similarity.py:78-81) — replicated verbatim in
    call shape for bitwise parity."""
    sorted_mat = -np.partition(-sim_mat, k + 1, axis=1)
    return np.mean(sorted_mat[:, 0:k], axis=1)


def topk_mean_exact(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """Mean of the exact top-k values per row (the well-defined form used by
    our distributed CSLS; differs from the reference's partition quirk by at
    most the inclusion of the (k+1)-th value)."""
    k = min(k, sim_mat.shape[1])
    part = -np.partition(-sim_mat, k - 1, axis=1)[:, :k]
    return part.mean(axis=1)


def csls_dense_exact(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """Dense CSLS with exact top-k means (oracle for the distributed path)."""
    nv1 = topk_mean_exact(sim_mat, k)
    nv2 = topk_mean_exact(sim_mat.T, k)
    return (2 * sim_mat - nv1[:, None]) - nv2[None, :]


def csls_dense(sim_mat: np.ndarray, k: int) -> np.ndarray:
    """Dense CSLS rescale (oracle path)."""
    nv1 = nearest_k_mean(sim_mat, k)        # per-row of sim_mat
    nv2 = nearest_k_mean(sim_mat.T, k)      # per-column
    out = 2 * sim_mat.T - nv1
    return (out.T - nv2)


def csls_block(sim_block_: np.ndarray, row_nearest: np.ndarray, col_nearest: np.ndarray) -> np.ndarray:
    """Blockwise CSLS: rescale a row-block given the global per-row top-k
    means for these rows and the per-column top-k means (precomputed once)."""
    return (2 * sim_block_ - row_nearest[:, None]) - col_nearest[None, :]


def sim_dense(embed1, embed2, metric="inner", normalize=False, csls_k=0) -> np.ndarray:
    """Dense end-to-end similarity with optional CSLS (oracle/small path)."""
    m = sim_block(np.asarray(embed1), np.asarray(embed2), metric=metric, normalize=normalize)
    if csls_k > 0:
        m = csls_dense(m, csls_k)
    return m
