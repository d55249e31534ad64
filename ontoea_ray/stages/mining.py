"""Embedding-pair mining: mutual CSLS-top-1 matches between two embedding
sets — the bitext-mining / cross-corpus alignment primitive (CSLS: Conneau
et al. 2018; margin criterion: Artetxe & Schwenk 2019).  A pair (x, y) is
emitted iff y is x's best candidate AND x is y's best candidate under the
hubness-corrected score ``csls(x,y) = 2·cos(x,y) − r_k(x) − c_k(y)`` with
``r_k``/``c_k`` the mean cosine of each row's exact k nearest neighbours on
the other side.

The whole computation is EXACT all-pairs, yet never materializes an n×m
similarity matrix and never broadcasts a full side: both sides are
materialized as sorted block lists, and every stage is a Ray task over ONE
block that STREAMS the other side's blocks through ``ray.get`` (one block
resident at a time, plasma zero-copy), maintaining running per-row top-k /
argmax state that is associative under block concatenation:

- pass 1: per-block neighbour stats — ``r_k`` for each A block, ``c_k``
  for each B block (a [rows] float64 array ref per block, aligned with the
  block list so pass 2 can zip them);
- pass 2: per-block argmax — for A rows ``argmax_y 2cos − c_k(y)`` (the
  row constant r_k(x) cannot change its own row's argmax, so it is never
  shipped), for B rows symmetrically with ``r_k``;
- pass 3: mutuality — one hash join of the two (ia, ib) best tables.

Shuffle cost: zero exchanges until the final small join; network cost is
#blocks_A × #blocks_B block reads, the unavoidable lower bound of an exact
all-pairs scan (the LSH/IVF stages in `stages/ann.py` are the sub-linear
approximate alternatives).  Ids are sorted ascending before blocking so
score ties break toward the smaller id — the order the oracle replays.
Determinism: ids-only output; cosine uses float64 end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.stages.ann import _batch_vectors


def _norm_block(tbl: pa.Table, id_col: str, vec_col: str):
    ids = np.asarray(tbl[id_col].combine_chunks(), np.int64)
    v = _batch_vectors(tbl, vec_col)
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
    return ids, v


@ray.remote
def _knn_mean(my_ref, other_refs, id_col, vec_col, k) -> np.ndarray:
    """Mean cosine of each my-row's exact k nearest on the other side."""
    mine = my_ref if isinstance(my_ref, pa.Table) else ray.get(my_ref)
    if mine.num_columns == 0 or len(mine) == 0:
        return np.zeros(0, np.float64)
    _, mv = _norm_block(mine, id_col, vec_col)
    acc = None
    for ref in other_refs:
        t = ray.get(ref)
        if t.num_columns == 0 or len(t) == 0:
            continue
        _, ov = _norm_block(t, id_col, vec_col)
        s = mv @ ov.T
        acc = s if acc is None else np.concatenate([acc, s], axis=1)
        if acc.shape[1] > k:
            acc = -np.partition(-acc, k - 1, axis=1)[:, :k]
    if acc is None:
        return np.zeros(len(mine), np.float64)
    return acc.mean(axis=1)


@ray.remote
def _best(my_ref, other_refs, other_stat_refs, id_col, vec_col, out_my, out_other) -> pa.Table:
    """Per my-row argmax of 2*cos(my, other) - stat(other) over all other
    blocks (strict > keeps the earliest = smallest id on ties)."""
    mine = my_ref if isinstance(my_ref, pa.Table) else ray.get(my_ref)
    empty = pa.table(
        {out_my: pa.array([], pa.int64()), out_other: pa.array([], pa.int64())}
    )
    if mine.num_columns == 0 or len(mine) == 0:
        return empty
    my_ids, mv = _norm_block(mine, id_col, vec_col)
    n = len(my_ids)
    best = np.full(n, -np.inf)
    best_id = np.full(n, -1, np.int64)
    for ref, sref in zip(other_refs, other_stat_refs):
        t = ray.get(ref)
        if t.num_columns == 0 or len(t) == 0:
            continue
        o_ids, ov = _norm_block(t, id_col, vec_col)
        stat = ray.get(sref)
        s = 2.0 * (mv @ ov.T) - stat[None, :]
        j = np.argmax(s, axis=1)
        v = s[np.arange(n), j]
        upd = v > best
        best[upd] = v[upd]
        best_id[upd] = o_ids[j[upd]]
    ok = best_id >= 0
    return pa.table(
        {
            out_my: pa.array(my_ids[ok], pa.int64()),
            out_other: pa.array(best_id[ok], pa.int64()),
        }
    )


def csls_mutual_pairs(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
) -> ray.data.Dataset:
    """Mutual CSLS-top-1 pairs between embedding sets A and B.

    Returns ``(id_a, id_b)`` — int64 ids of pairs that are each other's
    best CSLS candidate.  Exact; see module docstring for the plan."""
    a_refs = a.select_columns([id_col, vec_col]).sort(id_col).materialize().to_arrow_refs()
    b_refs = b.select_columns([id_col, vec_col]).sort(id_col).materialize().to_arrow_refs()

    r_refs = [_knn_mean.remote(ar, b_refs, id_col, vec_col, k) for ar in a_refs]
    c_refs = [_knn_mean.remote(br, a_refs, id_col, vec_col, k) for br in b_refs]

    best_a = ray.data.from_arrow_refs(
        [_best.remote(ar, b_refs, c_refs, id_col, vec_col, "id_a", "id_b") for ar in a_refs]
    )
    best_b = ray.data.from_arrow_refs(
        [_best.remote(br, a_refs, r_refs, id_col, vec_col, "id_b", "id_a") for br in b_refs]
    )

    from ontoea_ray.functions.join import hash_join

    return hash_join(best_a, best_b, on=["id_a", "id_b"]).select_columns(
        ["id_a", "id_b"]
    )
