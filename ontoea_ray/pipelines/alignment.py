"""OntoEA-style alignment evaluation, Ray-Data-first.

Reproduces the reference's evaluation contract — greedy alignment with
Hits@k / MR / MRR, optional CSLS, optional class-compatibility fusion, and
Gale–Shapley stable matching — WITHOUT ever materializing the dense n1×n2
similarity matrix on the distributed path: left-side embedding rows stream
through ``map_batches`` blocks against a broadcast right-side matrix, and
each block emits only per-row (gold rank, top-1, top-cut candidates).

Reference semantics (cited, not copied):
- greedy alignment + rank: /root/reference/code/src/openea/modules/finding/
  alignment.py:9-87,149-171  (rank = position of gold in argsort(-row))
- fused type-aware score: alignment.py:40-44
- CSLS: similarity.py:55-81 (we use exact top-k means; see
  functions/similarity.py for the reference's partition quirk)
- stable matching: alignment.py:90-136,174-227 (suitor-optimal Gale–Shapley
  on truncated preference lists, iteration-capped)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data


# --------------------------------------------------------------------------
# broadcast state
# --------------------------------------------------------------------------

@dataclass
class EvalState:
    embed2: np.ndarray                 # [n2, d] right side (broadcast once)
    metric: str = "inner"
    normalize: bool = False
    csls_k: int = 0
    col_nearest: np.ndarray | None = None   # [n2] per-column top-k means (csls)
    class1: np.ndarray | None = None   # [n1] class id per left row
    class2: np.ndarray | None = None   # [n2] class id per right row
    ccm: np.ndarray | None = None      # [C, C]
    type_weight: float = 0.2
    enum_weight: bool = False
    top_cut: int = 0                   # if >0, also emit top-cut candidate lists
    # per-row type FEATURES: the blockwise alternative to a precomputed
    # dense ccm gather — each block computes its own block_rows x n2 type
    # similarity chunk (type1[rows] @ type2.T), so no caller ever has to
    # materialize an n1 x n2 type matrix (the trainer's eval used to build
    # exactly that in-actor; at the 100K tier it is a 40 GB array)
    type1: np.ndarray | None = None    # [n1, d_t] (pre-normalized)
    type2: np.ndarray | None = None    # [n2, d_t] (pre-normalized)


def _left_dataset(embed1: np.ndarray, block_rows: int) -> ray.data.Dataset:
    """Left rows as a Dataset of (row, vec) with stable global row ids."""
    n, d = embed1.shape
    tables = []
    for s in range(0, n, block_rows):
        e = min(n, s + block_rows)
        tables.append(
            pa.table(
                {
                    "row": pa.array(np.arange(s, e), pa.int64()),
                    "vec": pa.FixedSizeListArray.from_arrays(
                        pa.array(embed1[s:e].reshape(-1), pa.float32()), d
                    ),
                }
            )
        )
    return ray.data.from_arrow(tables)


def _block_scores(batch: pa.Table, st: EvalState) -> tuple[np.ndarray, np.ndarray]:
    from ontoea_ray.functions.similarity import sim_block

    rows = batch["row"].to_numpy(zero_copy_only=False)
    d = st.embed2.shape[1]
    vecs = np.asarray(batch["vec"].combine_chunks().flatten().to_numpy(zero_copy_only=False), np.float32).reshape(-1, d)
    s = sim_block(vecs, st.embed2, metric=st.metric, normalize=st.normalize)
    if st.csls_k > 0:
        from ontoea_ray.functions.similarity import topk_mean_exact

        row_nearest = topk_mean_exact(s, st.csls_k)
        s = (2 * s - row_nearest[:, None]) - st.col_nearest[None, :]
    if st.type1 is not None:
        tm = st.type1[rows] @ st.type2.T  # block_rows x n2, never n1 x n2
        s = (1 - st.type_weight) * s + st.type_weight * tm if st.enum_weight else s + st.type_weight * tm
    elif st.ccm is not None:
        tm = st.ccm[st.class1[rows][:, None], st.class2[None, :]]
        s = (1 - st.type_weight) * s + st.type_weight * tm if st.enum_weight else s + st.type_weight * tm
    return rows, s


class _ColStats:
    """Pass 1 (CSLS only): per-column top-k values of the similarity matrix,
    compressed to a k×n2 partial per block and merged on the driver."""

    def __init__(self, state_ref):
        self.st: EvalState = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self.st
        csls_k = st.csls_k
        st2 = EvalState(embed2=st.embed2, metric=st.metric, normalize=st.normalize)  # no csls/type in pass 1
        _, s = _block_scores(batch, st2)
        k = min(csls_k, s.shape[0])
        part = -np.partition(-s, k - 1, axis=0)[:k] if s.shape[0] > k else s
        return pa.table({"topk": pa.array([part.astype(np.float32).tobytes()]),
                         "rows": pa.array([part.shape[0]], pa.int64())})


class _EvalBlock:
    def __init__(self, state_ref):
        self.st: EvalState = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        st = self.st
        rows, s = _block_scores(batch, st)
        order = np.argsort(-s, axis=1)
        gold = rows  # test row i's gold counterpart is right row i (aligned inputs)
        rank_index = (order == gold[:, None]).argmax(axis=1).astype(np.int64)
        out = {
            "row": pa.array(rows, pa.int64()),
            "rank_index": pa.array(rank_index, pa.int64()),
            "top1": pa.array(order[:, 0], pa.int64()),
        }
        if st.top_cut > 0:
            cut = min(st.top_cut, s.shape[1])
            out["prefs"] = pa.array([order[i, :cut].tolist() for i in range(len(rows))],
                                    pa.list_(pa.int64()))
        return pa.table(out)


def _col_nearest(embed1, state: EvalState, block_rows: int, concurrency) -> np.ndarray:
    ref = ray.put(state)
    ds = _left_dataset(embed1, block_rows)
    parts = ds.map_batches(_ColStats, fn_constructor_args=(ref,), batch_format="pyarrow",
                           batch_size=block_rows, concurrency=concurrency).take_all()
    n2 = state.embed2.shape[0]
    acc = np.full((0, n2), -np.inf, np.float32)
    for p in parts:
        r = int(p["rows"])
        block = np.frombuffer(p["topk"], np.float32).reshape(r, n2)
        acc = np.concatenate([acc, block], axis=0)
        if acc.shape[0] > state.csls_k:
            acc = -np.partition(-acc, state.csls_k - 1, axis=0)[: state.csls_k]
    k = min(state.csls_k, acc.shape[0])
    top = -np.partition(-acc, k - 1, axis=0)[:k] if acc.shape[0] > k else acc
    return np.sort(top, axis=0)[::-1].mean(axis=0)


def greedy_alignment_eval(
    embed1: np.ndarray,
    embed2: np.ndarray,
    *,
    top_k: tuple[int, ...] = (1, 5, 10, 50),
    metric: str = "inner",
    normalize: bool = False,
    csls_k: int = 0,
    class1: np.ndarray | None = None,
    class2: np.ndarray | None = None,
    ccm: np.ndarray | None = None,
    type_weight: float = 0.2,
    enum_weight: bool = False,
    block_rows: int = 2048,
    concurrency: int | tuple[int, int] = 4,
    top_cut: int = 0,
    type1: np.ndarray | None = None,
    type2: np.ndarray | None = None,
) -> dict:
    """Distributed greedy alignment; returns metrics + per-row alignment.

    ``embed1[i]``'s gold counterpart is ``embed2[i]`` (OpenEA aligned-test
    convention).  Result: {"hits": {k: pct}, "mr", "mrr", "alignment":
    [(i, top1_i)], optional "prefs"}.

    Type fusion: pass either a class-compatibility gather (``class1`` /
    ``class2`` / ``ccm``) or per-row type FEATURE matrices (``type1`` /
    ``type2``, pre-normalized) — the latter keeps the type similarity
    blockwise too (no n1 x n2 matrix anywhere in the pipeline)."""
    embed1 = np.ascontiguousarray(embed1, np.float32)
    embed2 = np.ascontiguousarray(embed2, np.float32)
    st = EvalState(
        embed2=embed2, metric=metric, normalize=normalize, csls_k=csls_k,
        class1=class1, class2=class2, ccm=ccm,
        type_weight=type_weight, enum_weight=enum_weight, top_cut=top_cut,
        type1=None if type1 is None else np.ascontiguousarray(type1, np.float32),
        type2=None if type2 is None else np.ascontiguousarray(type2, np.float32),
    )
    if csls_k > 0:
        st.col_nearest = _col_nearest(embed1, st, block_rows, concurrency).astype(np.float32)
    ref = ray.put(st)
    ds = _left_dataset(embed1, block_rows)
    res = ds.map_batches(
        _EvalBlock, fn_constructor_args=(ref,), batch_format="pyarrow",
        batch_size=block_rows, concurrency=concurrency,
    )
    tbl = pa.Table.from_pylist(res.take_all()).sort_by("row")
    rank = np.asarray(tbl["rank_index"].to_pylist(), np.int64)
    n = len(rank)
    hits = {k: round(float((rank < k).sum()) / n * 100, 3) for k in top_k}
    out = {
        "hits": hits,
        "mr": float((rank + 1).mean()),
        "mrr": float((1.0 / (rank + 1)).mean()),
        "alignment": list(zip(tbl["row"].to_pylist(), tbl["top1"].to_pylist())),
    }
    if top_cut > 0:
        out["prefs"] = {int(r): list(p) for r, p in zip(tbl["row"].to_pylist(), tbl["prefs"].to_pylist())}
    return out


# --------------------------------------------------------------------------
# stable matching (driver-side, on truncated candidate lists)
# --------------------------------------------------------------------------

def gale_shapley(suitor_prefs: dict, reviewer_prefs: dict, max_iteration: int = 100) -> dict:
    """Suitor-optimal stable matching on (possibly truncated) preference
    lists, capped at ``max_iteration`` proposal rounds."""
    suitor_prefs = {s: list(p) for s, p in suitor_prefs.items()}
    reviewer_rank = {r: {s: i for i, s in enumerate(p)} for r, p in reviewer_prefs.items()}
    matching: dict = {}
    rev_matching: dict = {}
    free = list(suitor_prefs.keys())
    for _ in range(max_iteration):
        if not free:
            break
        for s in free:
            if not suitor_prefs[s]:
                continue
            r = suitor_prefs[s][0]
            if r not in rev_matching:
                matching[s] = r
                rev_matching[r] = s
            else:
                cur = rev_matching[r]
                rr = reviewer_rank.get(r, {})
                if rr.get(s, len(rr)) < rr.get(cur, len(rr)):
                    del matching[cur]
                    matching[s] = r
                    rev_matching[r] = s
                else:
                    suitor_prefs[s].pop(0)
        free = [s for s in suitor_prefs if s not in matching and suitor_prefs[s]]
    return matching


def stable_alignment_eval(
    embed1: np.ndarray,
    embed2: np.ndarray,
    *,
    metric: str = "inner",
    normalize: bool = False,
    csls_k: int = 0,
    cut: int = 100,
    block_rows: int = 2048,
    concurrency: int | tuple[int, int] = 4,
) -> dict:
    """Stable matching over blockwise top-``cut`` candidate lists from both
    directions; returns {"matching", "precision_pct"}."""
    fw = greedy_alignment_eval(
        embed1, embed2, metric=metric, normalize=normalize, csls_k=csls_k,
        block_rows=block_rows, concurrency=concurrency, top_cut=cut,
    )
    bw = greedy_alignment_eval(
        embed2, embed1, metric=metric, normalize=normalize, csls_k=csls_k,
        block_rows=block_rows, concurrency=concurrency, top_cut=cut,
    )
    suitors = {f"x_{i}": [f"y_{j}" for j in p] for i, p in fw["prefs"].items()}
    reviewers = {f"y_{i}": [f"x_{j}" for j in p] for i, p in bw["prefs"].items()}
    matching = gale_shapley(suitors, reviewers, max_iteration=cut)
    good = sum(1 for s, r in matching.items() if s.split("_")[1] == r.split("_")[1])
    return {
        "matching": matching,
        "precision_pct": round(good / max(len(matching), 1) * 100, 3),
    }
