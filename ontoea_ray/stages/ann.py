"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: each ``map_batches`` block
  does one numpy matmul against the broadcast query matrix and emits only
  its per-block top-k partials; a tiny driver-side merge finishes (the
  global result is q×k rows).  This is the correctness baseline.
- :func:`lsh_bucketed_topk` — the scale path: random-hyperplane signatures
  bucket rows, only the query's bucket (and Hamming-adjacent buckets) is
  scanned.  Approximate; falls back to brute force per scanned bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
import ray.data


def _batch_vectors(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ListArray) or isinstance(arr, pa.LargeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        d = int(widths[0])
        assert (widths == d).all(), "ragged embedding column"
        return np.asarray(flat, np.float64).reshape(-1, d)
    flat = arr.flatten().to_numpy(zero_copy_only=False)  # FixedSizeList
    d = arr.type.list_size
    return np.asarray(flat, np.float64).reshape(-1, d)


def _cosine(block: np.ndarray, queries: np.ndarray) -> np.ndarray:
    bn = block / np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-30)
    qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
    return bn @ qn.T  # [rows, q]


def brute_force_topk(
    embeddings: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k: returns (query_id, vec_id, rnk, cos) sorted by
    (query_id, rnk); ties broken by ascending vec_id (deterministic)."""
    queries = np.atleast_2d(np.asarray(query_vectors, np.float64))
    q_ref = ray.put(queries)

    def partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        cos = _cosine(_batch_vectors(batch, vec_col), qs)  # [rows, q]
        nq = qs.shape[0]
        kk = min(k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for qi in range(nq):
            part = np.argpartition(-cos[:, qi], kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            out_q.append(np.full(len(part), qi, np.int64))
            out_id.append(ids[part])
            out_cos.append(cos[part, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "cos": pa.array(np.concatenate(out_cos), pa.float64()),
            }
        )

    parts = pa.Table.from_pylist(
        embeddings.map_batches(partial, batch_format="pyarrow").take_all()
    )
    # driver merge: q×k×blocks rows — tiny
    import pandas as pd

    df = parts.to_pandas()
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    return _from_pandas_clean(df[["query_id", id_col, "rnk", "cos"]])


def hyperplane_signatures(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit signature per row: int64 bucket id from (vectors @ planes.T > 0)."""
    bits = (vectors @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def lsh_bucketed_topk(
    embeddings: ray.data.Dataset,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hamming_radius: int = 1,
) -> pa.Table:
    """Approximate cosine top-k: scan only rows whose hyperplane bucket is
    within ``hamming_radius`` of the query's bucket.  Same output schema as
    brute force; recall < 1 by construction (documented scale path)."""
    queries = np.atleast_2d(np.asarray(query_vectors, np.float64))
    d = queries.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, d))
    q_sigs = hyperplane_signatures(queries, planes)
    # buckets to scan per query
    masks = [0]
    if hamming_radius >= 1:
        masks += [1 << i for i in range(n_planes)]
    if hamming_radius >= 2:
        masks += [(1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)]
    wanted = {int(s ^ m) for s in q_sigs for m in masks}
    state = ray.put((planes, queries, sorted(wanted)))

    def partial(batch: pa.Table) -> pa.Table:
        pl, qs, want = ray.get(state)
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        vecs = _batch_vectors(batch, vec_col)
        sigs = hyperplane_signatures(vecs, pl)
        keep = np.isin(sigs, np.asarray(want, np.int64))
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids, vecs = ids[keep], vecs[keep]
        cos = _cosine(vecs, qs)
        nq = qs.shape[0]
        kk = min(k, len(ids))
        out_q, out_id, out_cos = [], [], []
        for qi in range(nq):
            part = np.argpartition(-cos[:, qi], kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            out_q.append(np.full(len(part), qi, np.int64))
            out_id.append(ids[part])
            out_cos.append(cos[part, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "cos": pa.array(np.concatenate(out_cos), pa.float64()),
            }
        )

    parts = pa.Table.from_pylist(embeddings.map_batches(partial, batch_format="pyarrow").take_all())
    df = parts.to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    return _from_pandas_clean(df[["query_id", id_col, "rnk", "cos"]])
