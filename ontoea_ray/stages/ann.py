"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: each ``map_batches`` block
  does one numpy matmul against the broadcast query matrix and emits only
  its per-block top-k partials; a tiny driver-side merge finishes (the
  global result is q×k rows).  This is the correctness baseline.
- :func:`build_lsh_index` / :func:`lsh_index_topk` — the 100-TB scale path:
  a ONE-TIME pass writes the table partitioned by random-hyperplane bucket
  (Parquet ``bucket=<sig>`` directories + the plane matrix); queries then
  READ only the partitions within ``hamming_radius`` of their signature —
  I/O itself is pruned, not just the matmul.
- :func:`lsh_bucketed_topk` — index-free variant (single-shot queries where
  building an index would cost more than one full scan): same signature
  filter applied during a full streaming pass.
- :func:`build_ivf_index` / :func:`ivf_index_topk` — the IVF (inverted-file)
  scale path: a spherical k-means coarse quantizer trained on a BOUNDED
  sample (driver state is O(sample), not O(table)), one assignment pass
  writes the table partitioned by nearest-centroid list, and queries read
  only their ``nprobe`` closest lists.  Unlike hyperplane LSH the partition
  count and balance are chosen (k-means adapts to the data distribution),
  which is why IVF is the standard billion-scale layout.
"""

from __future__ import annotations

import json
import os

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
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
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
    return _merge_topk(parts, k, id_col)


def _merge_topk(parts: pa.Table, k: int, id_col: str) -> pa.Table:
    """Driver-side merge of per-block top-k partials (q×k×blocks rows)."""
    import pandas as pd

    df = parts.to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    df = df.sort_values(["query_id", "cos", id_col], ascending=[True, False, True], kind="mergesort")
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["rnk"] = df.groupby("query_id").cumcount() + 1
    return _from_pandas_clean(df[["query_id", id_col, "rnk", "cos"]])


def _topk_partial_table(ids: np.ndarray, cos: np.ndarray, k: int, id_col: str) -> pa.Table:
    """Per-block top-k rows for every query column of ``cos`` [rows, q]."""
    nq = cos.shape[1]
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


def _wanted_buckets(q_sigs: np.ndarray, n_planes: int, hamming_radius: int) -> list[int]:
    masks = [0]
    if hamming_radius >= 1:
        masks += [1 << i for i in range(n_planes)]
    if hamming_radius >= 2:
        masks += [(1 << i) | (1 << j) for i in range(n_planes) for j in range(i + 1, n_planes)]
    return sorted({int(s ^ m) for s in q_sigs for m in masks})


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
    wanted = _wanted_buckets(q_sigs, n_planes, hamming_radius)
    state = ray.put((planes, queries, wanted))

    def partial(batch: pa.Table) -> pa.Table:
        pl, qs, want = ray.get(state)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _batch_vectors(batch, vec_col)
        sigs = hyperplane_signatures(vecs, pl)
        keep = np.isin(sigs, np.asarray(want, np.int64))
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        ids, vecs = ids[keep], vecs[keep]
        return _topk_partial_table(ids, _cosine(vecs, qs), k, id_col)

    parts = pa.Table.from_pylist(embeddings.map_batches(partial, batch_format="pyarrow").take_all())
    return _merge_topk(parts, k, id_col)


def cosine_neardup_pairs(
    embeddings: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    seed: int = 42,
    hamming_radius: int = 1,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos >= t).

    ``n_planes=0`` (exact): every block joins against the full broadcast
    matrix — one matmul per block, correct for tables whose (id, vec)
    matrix fits the broadcast byte budget; the matrix is assembled INSIDE
    a Ray task from the dataset's blocks (the driver never holds a
    vector) and read zero-copy per task.  Above the budget the call
    AUTO-FLIPS to the LSH-bucketed plan (16 planes) — an exact broadcast
    would not fit any single node at that size.  ``n_planes>0`` (scale
    path): candidate pairs are restricted to rows whose hyperplane buckets
    are within ``hamming_radius`` (explode to (bucket, id, vec) ->
    pkey-co-located pairwise cosine per bucket) — the 100 TB shape,
    approximate recall per the hyperplane S-curve; precision stays exact
    (every emitted pair is cosine-verified).
    """
    if n_planes <= 0:
        from ontoea_ray.functions.broadcast import assemble_table_ref

        embeddings, tbl_ref = assemble_table_ref(
            embeddings, columns=[id_col, vec_col]
        )
        if tbl_ref is None:
            import logging

            logging.getLogger(__name__).warning(
                "cosine_neardup_pairs: embedding table exceeds the broadcast "
                "budget; flipping from the exact all-pairs plan to the "
                "LSH-bucketed plan (n_planes=16) — recall follows the "
                "hyperplane S-curve, precision stays exact"
            )
            return cosine_neardup_pairs(
                embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col,
                n_planes=16, seed=seed, hamming_radius=hamming_radius,
            )

        @ray.remote
        def _norm_matrix(tref) -> tuple:
            mat = tref if isinstance(tref, pa.Table) else ray.get(tref)
            ids_all = mat[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            vecs_all = _batch_vectors(mat, vec_col)
            norm_all = vecs_all / np.maximum(
                np.linalg.norm(vecs_all, axis=1, keepdims=True), 1e-30
            )
            return ids_all, norm_all

        ref = _norm_matrix.remote(tbl_ref)

        def partial(batch: pa.Table) -> pa.Table:
            ids_r, norm_r = ray.get(ref)
            ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            v = _batch_vectors(batch, vec_col)
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            cos = vn @ norm_r.T
            ii, jj = np.nonzero(cos >= threshold)
            a, b = ids[ii], ids_r[jj]
            keep = a < b
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(b[keep], pa.int64()),
                }
            )

        return embeddings.map_batches(partial, batch_format="pyarrow")

    # LSH-bucketed scale path
    rng = np.random.default_rng(seed)
    probe = embeddings.take(1)
    d = len(probe[0][vec_col])
    planes = rng.standard_normal((n_planes, d))
    pl_ref = ray.put(planes)
    masks = [0]
    if hamming_radius >= 1:
        masks += [1 << i for i in range(n_planes)]

    def explode(batch: pa.Table):
        import pandas as pd

        pl = ray.get(pl_ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _batch_vectors(batch, vec_col)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sigs = hyperplane_signatures(vn, pl)
        out = []
        for m in masks:
            out.append(pd.DataFrame({
                "bucket": sigs ^ m if m else sigs,
                id_col: ids,
                "home": np.full(len(ids), m == 0),
                "vec_idx": np.arange(len(ids)),
            }))
        df = pd.concat(out, ignore_index=True)
        tbl = _from_pandas_clean(df[["bucket", id_col, "home"]])
        reps = np.concatenate([np.arange(len(ids))] * len(masks))
        flat = vn[reps].reshape(-1)
        return tbl.append_column(
            vec_col, pa.FixedSizeListArray.from_arrays(pa.array(flat, pa.float64()), vn.shape[1])
        )

    from ontoea_ray.functions.shuffle import with_partition_key

    exploded = embeddings.map_batches(explode, batch_format="pyarrow")
    parted = with_partition_key(exploded, ["bucket"])

    def pairs_in_partition(df) -> "pd.DataFrame":
        import pandas as pd

        outs = []
        for _, g in df.groupby("bucket", sort=False):
            if len(g) < 2 or not g["home"].any():
                continue
            ids = g[id_col].to_numpy(np.int64)
            vn = np.stack(g[vec_col].to_numpy())
            home = g["home"].to_numpy(bool)
            cos = vn @ vn.T
            ii, jj = np.nonzero(cos >= threshold)
            # at least one side must be in its home bucket (avoid
            # radius-radius double-expansion duplicates)
            keep = (ids[ii] < ids[jj]) & (home[ii] | home[jj])
            if keep.any():
                outs.append(pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep]}))
        if not outs:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    pairs = parted.groupby("pkey").map_groups(pairs_in_partition, batch_format="pandas")

    def distinct(batch: pa.Table) -> pa.Table:
        import pandas as pd

        return _from_pandas_clean(batch.to_pandas().drop_duplicates())

    from ray.data.aggregate import Count

    from ontoea_ray.functions.shuffle import compact

    dd = compact(pairs.map_batches(distinct, batch_format="pyarrow")).groupby(
        ["id_a", "id_b"]
    ).aggregate(Count(alias_name="_c"))
    return dd.drop_columns(["_c"])


def build_lsh_index(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """One-time pass: write the embedding table to ``index_dir`` as Parquet
    partitioned by hyperplane bucket (``bucket=<sig>`` directories) plus the
    plane matrix.  Queries against the index read ONLY matching partitions —
    at 100 TB this is the difference between scanning the table per query
    batch and touching 1/2^n_planes of it.

    Returns the index meta (also persisted as ``_meta.json``)."""
    rng = np.random.default_rng(seed)
    probe = embeddings.take(1)
    d = len(probe[0][vec_col])
    planes = rng.standard_normal((n_planes, d))
    planes_ref = ray.put(planes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        sigs = hyperplane_signatures(_batch_vectors(batch, vec_col), pl)
        batch = batch.replace_schema_metadata(None)
        return batch.append_column("bucket", pa.array(sigs, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    embeddings.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"]
    )
    np.save(os.path.join(index_dir, "_planes.npy"), planes)
    meta = {"n_planes": n_planes, "seed": seed, "dim": d, "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def lsh_index_upsert(
    embeddings: ray.data.Dataset,
    index_dir: str,
) -> dict:
    """Incremental INSERT into a :func:`build_lsh_index` directory — the
    index-maintenance path a 10^12-row store needs (a nightly crawl
    increment must not trigger a full rebuild): the increment is bucketed
    with the PERSISTED plane matrix (never re-drawn — signatures stay
    comparable across generations) and written as NEW parquet files inside
    the same ``bucket=<sig>`` partitions; readers list every file per
    bucket, so queries see old + new rows with no index rewrite and no
    coordination beyond the filesystem append.

    Append-only semantics: rows are INSERTS of new ids.  Re-inserting an
    existing id duplicates it in its bucket (both rows would surface as
    candidates); delete/update needs a tombstone generation scheme on top.

    Returns the (unchanged) index meta plus ``n_added``."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    planes = np.load(os.path.join(index_dir, "_planes.npy"))
    vec_col = meta["vec_col"]
    planes_ref = ray.put(planes)

    def add_bucket(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        sigs = hyperplane_signatures(_batch_vectors(batch, vec_col), pl)
        batch = batch.replace_schema_metadata(None)
        return batch.append_column("bucket", pa.array(sigs, pa.int64()))

    bucketed = embeddings.map_batches(add_bucket, batch_format="pyarrow")
    bucketed.write_parquet(index_dir, partition_cols=["bucket"])
    n_added = embeddings.count()
    return {**meta, "n_added": n_added}


def lsh_index_topk(
    index_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    hamming_radius: int = 1,
    return_stats: bool = False,
):
    """Approximate cosine top-k against a :func:`build_lsh_index` directory.

    Reads only the ``bucket=<sig>`` partitions within ``hamming_radius`` of
    each query signature (partition pruning at the READ — unscanned buckets
    never leave storage).  With ``return_stats=True`` also returns
    ``{"scanned_rows": ..., "scanned_buckets": ..., "total_buckets": ...}``.
    """
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    planes = np.load(os.path.join(index_dir, "_planes.npy"))
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    queries = np.atleast_2d(np.asarray(query_vectors, np.float64))
    q_sigs = hyperplane_signatures(queries, planes)
    wanted = _wanted_buckets(q_sigs, meta["n_planes"], hamming_radius)
    all_buckets = [p for p in os.listdir(index_dir) if p.startswith("bucket=")]
    # expand to file paths (read_parquet treats list entries as files)
    paths = [
        os.path.join(index_dir, f"bucket={s}", f)
        for s in wanted
        if os.path.isdir(os.path.join(index_dir, f"bucket={s}"))
        for f in os.listdir(os.path.join(index_dir, f"bucket={s}"))
        if f.endswith(".parquet")
    ]
    empty = pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    n_bucket_dirs = sum(
        1 for s in wanted if os.path.isdir(os.path.join(index_dir, f"bucket={s}"))
    )
    stats = {"scanned_buckets": n_bucket_dirs, "total_buckets": len(all_buckets), "scanned_rows": 0}
    if not paths:
        return (empty, stats) if return_stats else empty
    scanned = ray.data.read_parquet(paths)
    q_ref = ray.put(queries)
    n_scanned = 0

    def partial(batch: pa.Table) -> pa.Table:
        qs = ray.get(q_ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        return _topk_partial_table(ids, _cosine(_batch_vectors(batch, vec_col), qs), k, id_col)

    if return_stats:
        n_scanned = scanned.count()
    parts = pa.Table.from_pylist(scanned.map_batches(partial, batch_format="pyarrow").take_all())
    out = _merge_topk(parts, k, id_col)
    if return_stats:
        stats["scanned_rows"] = n_scanned
        return out, stats
    return out


def train_centroids(
    embeddings: ray.data.Dataset,
    *,
    n_centroids: int = 64,
    sample_size: int = 20_000,
    iters: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means coarse quantizer on a bounded random sample.

    The sample (≤ ``sample_size`` rows) is the ONLY driver-side state — at
    100 TB the training cost is constant while the assignment pass below
    stays fully streaming.  Vectors and centroids are L2-normalized, so
    assignment-by-dot == assignment-by-cosine.  Deterministic per seed."""
    n_total = embeddings.count()
    frac = min(1.0, sample_size / max(1, n_total))
    sample = embeddings.random_sample(frac, seed=seed) if frac < 1.0 else embeddings
    tbl = pa.Table.from_pylist(sample.select_columns([vec_col]).take_all())
    vecs = _batch_vectors(tbl, vec_col)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    kc = min(n_centroids, len(vn))
    rng = np.random.default_rng(seed)
    cent = vn[rng.choice(len(vn), size=kc, replace=False)]
    for _ in range(iters):
        assign = np.argmax(vn @ cent.T, axis=1)
        for c in range(kc):
            m = assign == c
            if m.any():
                v = vn[m].sum(axis=0)
                cent[c] = v / np.maximum(np.linalg.norm(v), 1e-30)
            else:  # dead centroid: re-seed on the farthest point
                far = np.argmin(np.max(vn @ cent.T, axis=1))
                cent[c] = vn[far]
    return cent


def _quantize_int(vecs: np.ndarray, scale: int) -> np.ndarray:
    """floor(float64(v) * scale) per element — the integer lattice both the
    engine and the DuckDB oracle quantize onto (float32 -> float64 is
    exact; the product and floor are IEEE-identical on both sides)."""
    return np.floor(vecs.astype(np.float64) * scale).astype(np.int64)


def train_centroids_integer(
    embeddings: ray.data.Dataset,
    *,
    n_centroids: int = 16,
    iters: int = 4,
    scale: int = 1000,
    sample_size: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """SQL-replayable integer k-means coarse quantizer — every step is
    integer-exact and order-independent, so DuckDB re-trains bit-identical
    centroids (`functions.lsh_sql.ann_ivf_topk_sql`); the float spherical
    trainer (:func:`train_centroids`) remains for recall-tuned paths.

    Steps (mirrored in the oracle SQL):
    - training sample = first ``sample_size`` rows by (splitmix64(id), id)
      order (per-block partial top-N, merged INSIDE a Ray task — the
      driver holds only the final sample);
    - init = the first ``n_centroids`` sample rows;
    - assign by integer squared-Euclidean argmin (ties -> lowest centroid
      index), update per-dim floor(sum/count); an empty cluster keeps its
      previous centroid.

    Returns int64 [n_centroids, dim]."""
    sample = _hash_ordered_sample(
        embeddings, sample_size=sample_size, id_col=id_col, vec_col=vec_col
    )
    qv = _quantize_int(_batch_vectors(sample, vec_col), scale)
    return _lloyd_integer(qv, n_centroids, iters)


def _hash_ordered_sample(
    embeddings: ray.data.Dataset, *, sample_size: int, id_col: str, vec_col: str
) -> pa.Table:
    """Deterministic bounded training sample: the first ``sample_size``
    rows by (splitmix64(id), id) order — per-block partial top-N, merged
    INSIDE a Ray task so the driver holds only the final sample."""
    from ontoea_ray.stages.sampling import splitmix64

    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].combine_chunks(), np.int64)
        h = splitmix64(ids)
        order = np.lexsort((ids, h))[:sample_size]
        t = b.select([id_col, vec_col]).take(pa.array(order))
        return t.append_column("_h", pa.array(h[order], pa.uint64()))

    partials = embeddings.map_batches(partial, batch_format="pyarrow")

    @ray.remote
    def _merge_sample(*tbls: pa.Table) -> pa.Table:
        t = pa.concat_tables([x for x in tbls if x.num_columns > 0])
        ids = np.asarray(t[id_col].combine_chunks(), np.int64)
        h = t["_h"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:sample_size]
        return t.take(pa.array(order)).drop_columns(["_h"])

    return ray.get(_merge_sample.remote(*partials.materialize().to_arrow_refs()))


def _lloyd_integer(qv: np.ndarray, n_centroids: int, iters: int) -> np.ndarray:
    """Integer-exact Lloyd rounds on an already-quantized matrix: init =
    first ``n_centroids`` rows, assign by squared-Euclidean argmin (ties ->
    lowest centroid id), update per-dim floor(sum/count); an empty cluster
    keeps its previous centroid.  Bit-identical to the SQL replay."""
    kc = min(n_centroids, len(qv))
    cent = qv[:kc].copy()
    for _ in range(iters):
        # per-centroid distance columns keep memory O(n*k), ints exact
        dist = np.stack([((qv - c) ** 2).sum(axis=1) for c in cent], axis=1)
        assign = np.argmin(dist, axis=1)  # first min -> lowest centroid id
        for c in range(kc):
            m = assign == c
            if m.any():
                cent[c] = np.floor_divide(qv[m].sum(axis=0), m.sum())
    return cent


def train_pq_codebooks_integer(
    embeddings: ray.data.Dataset,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 3,
    scale: int = 1000,
    sample_size: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebooks: the dim axis splits into ``m``
    contiguous subspaces and each gets its own integer k-means
    (:func:`_lloyd_integer`) over the SAME hash-ordered bounded sample —
    every step integer-exact and order-independent, so the DuckDB oracle
    (`functions.lsh_sql.ann_pq_topk_sql`) re-trains every codebook
    bit-identically.  Returns int64 [m, ksub, dim // m]."""
    sample = _hash_ordered_sample(
        embeddings, sample_size=sample_size, id_col=id_col, vec_col=vec_col
    )
    qv = _quantize_int(_batch_vectors(sample, vec_col), scale)
    dim = qv.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    dsub = dim // m
    return np.stack(
        [
            _lloyd_integer(qv[:, s * dsub : (s + 1) * dsub].copy(), ksub, iters)
            for s in range(m)
        ]
    )


def build_pq_index(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    m: int = 4,
    ksub: int = 8,
    iters: int = 3,
    scale: int = 1000,
    sample_size: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Product-quantization index — the COMPRESSION scale path (LSH and
    IVF prune which rows are read; PQ shrinks what a row costs): each
    vector is encoded as ``m`` small centroid codes (~m bytes/vector vs
    dim*4 raw — a 100 TB float32 embedding table scans from a ~1.5 TB code
    table), queries score by asymmetric-distance LUT gather, no raw
    vectors touched at query time.  One encode pass (codebooks broadcast
    via ``ray.put``, argmin ties -> lowest code), codes written as plain
    int64 columns ``code_0..code_{m-1}``."""
    books = train_pq_codebooks_integer(
        embeddings, m=m, ksub=ksub, iters=iters, scale=scale,
        sample_size=sample_size, id_col=id_col, vec_col=vec_col,
    )
    dsub = books.shape[2]
    books_ref = ray.put(books)
    encode = _pq_encoder(books_ref, m, dsub, scale, id_col, vec_col)

    os.makedirs(index_dir, exist_ok=True)
    embeddings.map_batches(encode, batch_format="pyarrow").write_parquet(index_dir)
    # build-time distortion baseline for upsert drift detection: one
    # column-pruned streaming pass over the just-written code table
    mean_qerr = ray.data.read_parquet(index_dir, columns=["qerr"]).mean("qerr")
    np.save(os.path.join(index_dir, "_codebooks.npy"), books)
    meta = {
        "kind": "pq", "m": m, "ksub": int(books.shape[1]), "dsub": int(dsub),
        "scale": scale, "id_col": id_col, "vec_col": vec_col,
        "mean_qerr": float(mean_qerr) if mean_qerr is not None else None,
    }
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _pq_encoder(books_ref, m: int, dsub: int, scale: int, id_col: str, vec_col: str):
    """Shared PQ encode kernel: codes + the row's integer quantization
    error (``qerr`` — sum over subspaces of the assigned code's squared
    distance).  ``qerr`` rides in the code table as one extra int64 column
    (queries column-prune it away); its mean is the distortion signal the
    upsert drift check compares against the build baseline."""

    def encode(batch: pa.Table) -> pa.Table:
        bk = ray.get(books_ref)
        q = _quantize_int(_batch_vectors(batch, vec_col), scale)
        cols = {id_col: batch[id_col].combine_chunks().cast(pa.int64())}
        err = np.zeros(len(batch), np.int64)
        for s in range(m):
            sub = q[:, s * dsub : (s + 1) * dsub]
            dist = ((sub[:, None, :] - bk[s][None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(dist, axis=1)
            err += dist[np.arange(len(code)), code]
            cols[f"code_{s}"] = pa.array(code.astype(np.int64))
        cols["qerr"] = pa.array(err)
        return pa.table(cols)

    return encode


def pq_index_upsert(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    drift_threshold: float = 1.5,
) -> dict:
    """Incremental INSERT into a :func:`build_pq_index` directory — the PQ
    twin of :func:`lsh_index_upsert` / :func:`ivf_index_upsert`: the
    increment is encoded with the PERSISTED codebooks (never re-trained,
    so codes stay comparable across generations) and appended as new
    parquet files in the same directory; queries see old + new rows with
    no index rewrite.  Append-only semantics, as for LSH/IVF.

    Drift check (the rebuild trigger FAISS-style PQ maintenance needs):
    the increment's mean integer quantization error is compared against
    the build-time baseline recorded in ``_meta.json`` — codebooks frozen
    at build slowly stop fitting a drifting feed, and rising distortion
    is the signal.  Returns meta + ``n_added``, ``inc_mean_qerr``,
    ``drift`` (ratio vs baseline, None for pre-baseline indexes) and
    ``rebuild_recommended`` (drift > ``drift_threshold``).  The increment
    is materialized once to compute its distortion — increment-sized by
    assumption, never corpus-sized."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    books = np.load(os.path.join(index_dir, "_codebooks.npy"))
    m, dsub, scale = meta["m"], meta["dsub"], meta["scale"]
    books_ref = ray.put(books)
    encode = _pq_encoder(books_ref, m, dsub, scale, meta["id_col"], meta["vec_col"])

    coded = embeddings.map_batches(encode, batch_format="pyarrow").materialize()
    n_added = coded.count()
    inc_mean = coded.mean("qerr") if n_added else None
    coded.write_parquet(index_dir)
    base = meta.get("mean_qerr")
    if inc_mean is None or base is None:
        drift = None  # pre-baseline index or empty increment
    elif float(base) == 0.0:
        # a perfectly-fitting build (every vector on a centroid) must not
        # disable the detector: any nonzero increment error is infinite
        # relative drift
        drift = float("inf") if float(inc_mean) > 0 else 1.0
    else:
        drift = float(inc_mean) / float(base)
    return {
        **meta,
        "n_added": n_added,
        "inc_mean_qerr": float(inc_mean) if inc_mean is not None else None,
        "drift": drift,
        "rebuild_recommended": bool(drift is not None and drift > drift_threshold),
    }


def pq_index_topk(
    index_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    rerank_against: "ray.data.Dataset | None" = None,
    shortlist: int | None = None,
) -> pa.Table:
    """Approximate top-k by asymmetric PQ distance against a
    :func:`build_pq_index` directory: per query one integer LUT
    [m, ksub] of subspace distances, then the code scan is a pure LUT
    gather + row sum — vectorized, integer-exact, no raw vectors read.
    Returns (query_id, vec_id, rnk, adist) ranked by (adist ASC, vec_id
    ASC) — every column bit-replayable by the SQL oracle.

    ``rerank_against``: the canonical PQ serving pipeline — the code scan
    produces a ``shortlist`` (default 10*k) of ADC candidates per query,
    then ONLY those rows' raw vectors are read from the given embedding
    Dataset (an is_in filter — at scale a pruned read, never a full
    gather) and reranked by exact cosine; output is (query_id, vec_id,
    rnk, cos).  ADC alone cannot order near-equidistant neighbours (the
    quantization cell is coarser than their distance gaps); shortlist +
    exact rerank recovers brute-force quality while still never scanning
    raw vectors for the 99%+ of rows the codes exclude."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    books = np.load(os.path.join(index_dir, "_codebooks.npy"))
    m, dsub, id_col = meta["m"], meta["dsub"], meta["id_col"]
    queries = np.atleast_2d(np.asarray(query_vectors, np.float64))
    qq = _quantize_int(queries, meta["scale"])
    # luts[qi, s, c] = squared distance from query qi's subspace s to code c
    luts = np.stack(
        [
            ((qq[:, s * dsub : (s + 1) * dsub][:, None, :] - books[s][None, :, :]) ** 2).sum(
                axis=2
            )
            for s in range(m)
        ],
        axis=1,
    )
    lut_ref = ray.put(luts)

    codes = ray.data.read_parquet(
        index_dir, columns=[id_col] + [f"code_{s}" for s in range(m)]
    )

    def partial(batch: pa.Table) -> pa.Table:
        lt = ray.get(lut_ref)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        code_mat = np.stack(
            [
                batch[f"code_{s}"].combine_chunks().to_numpy(zero_copy_only=False)
                for s in range(m)
            ],
            axis=1,
        )
        out = []
        for qi in range(lt.shape[0]):
            adist = lt[qi][np.arange(m)[None, :], code_mat].sum(axis=1)
            kk = min(k, len(ids))
            part = (
                np.argpartition(adist, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            )
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(part), qi, np.int64), pa.int64()),
                        id_col: pa.array(ids[part], pa.int64()),
                        "adist": pa.array(adist[part].astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    parts = pa.Table.from_pylist(
        codes.map_batches(partial, batch_format="pyarrow").take_all()
    )
    import pandas as pd

    df = parts.to_pandas()
    if df.empty:
        return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64()), "adist": pa.array([], pa.int64())})
    n_keep = k if rerank_against is None else max(shortlist or 10 * k, k)
    df = df.sort_values(["query_id", "adist", id_col], kind="mergesort")
    df = df.groupby("query_id", sort=True).head(n_keep).reset_index(drop=True)
    if rerank_against is None:
        df["rnk"] = (df.groupby("query_id").cumcount() + 1).astype(np.int64)
        return _from_pandas_clean(df[["query_id", id_col, "rnk", "adist"]])

    # exact-cosine rerank over the UNION of shortlists: one is_in-filtered
    # pass over the raw table (pruned read at scale), then brute-force
    # ranking restricted to each query's own candidate set
    cand_ids = np.unique(df[id_col].to_numpy(np.int64))
    vec_col = meta["vec_col"]
    cand = rerank_against.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b[id_col].combine_chunks(), value_set=pa.array(cand_ids))
        ),
        batch_format="pyarrow",
    )
    scored = brute_force_topk(
        cand, queries, k=len(cand_ids), id_col=id_col, vec_col=vec_col
    )
    sdf = scored.to_pandas().merge(
        df[["query_id", id_col]], on=["query_id", id_col], how="inner"
    )
    sdf = sdf.sort_values(["query_id", "cos", id_col], ascending=[True, False, True], kind="mergesort")
    sdf = sdf.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    sdf["rnk"] = (sdf.groupby("query_id").cumcount() + 1).astype(np.int64)
    return _from_pandas_clean(sdf[["query_id", id_col, "rnk", "cos"]])


def build_ivf_index(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    n_centroids: int = 64,
    sample_size: int = 20_000,
    iters: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantizer: str = "float",
    scale: int = 1000,
) -> dict:
    """One-time pass: assign every row to its nearest centroid (broadcast
    centroid matrix, one matmul per batch) and write Parquet partitioned by
    ``list_id``.  Queries then read only their ``nprobe`` closest lists —
    partition pruning at the READ, like :func:`build_lsh_index`, but with
    data-adaptive balanced partitions.

    ``quantizer="float"`` (default): spherical k-means, cosine assignment.
    ``quantizer="integer"``: the SQL-replayable integer k-means
    (:func:`train_centroids_integer`) with squared-Euclidean assignment on
    the ``scale``-quantized lattice — bit-exact against the DuckDB oracle
    end to end (only the final cosine ranking is float)."""
    assert quantizer in ("float", "integer")
    if quantizer == "integer":
        cent = train_centroids_integer(
            embeddings, n_centroids=n_centroids, sample_size=sample_size,
            iters=iters, scale=scale, id_col=id_col, vec_col=vec_col,
        )
    else:
        cent = train_centroids(
            embeddings, n_centroids=n_centroids, sample_size=sample_size,
            iters=iters, seed=seed, vec_col=vec_col,
        )
    cent_ref = ray.put(cent)

    def add_list(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        v = _batch_vectors(batch, vec_col)
        if quantizer == "integer":
            q = _quantize_int(v, scale)
            dist = np.stack([((q - cc) ** 2).sum(axis=1) for cc in c], axis=1)
            lists = np.argmin(dist, axis=1).astype(np.int64)
        else:
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            lists = np.argmax(vn @ c.T, axis=1).astype(np.int64)
        batch = batch.replace_schema_metadata(None)
        return batch.append_column("list_id", pa.array(lists, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    embeddings.map_batches(add_list, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    np.save(os.path.join(index_dir, "_centroids.npy"), cent)
    meta = {
        "kind": "ivf", "n_centroids": int(cent.shape[0]), "dim": int(cent.shape[1]),
        "seed": seed, "id_col": id_col, "vec_col": vec_col,
        "quantizer": quantizer, "scale": scale,
    }
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_index_upsert(
    embeddings: ray.data.Dataset,
    index_dir: str,
) -> dict:
    """Incremental INSERT into a :func:`build_ivf_index` directory — the
    IVF twin of :func:`lsh_index_upsert`: the increment is assigned with
    the PERSISTED centroid matrix (never re-trained, so list membership
    stays consistent across generations) and appended as new parquet files
    inside the existing ``list_id=`` partitions.  Append-only; heavy
    drift in the increment's distribution eventually unbalances the lists
    — re-train + rebuild is the rebalance path, exactly as in FAISS-style
    IVF maintenance.  Returns meta + ``n_added``."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    cent = np.load(os.path.join(index_dir, "_centroids.npy"))
    vec_col, quantizer, scale = meta["vec_col"], meta["quantizer"], meta["scale"]
    cent_ref = ray.put(cent)

    def add_list(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        v = _batch_vectors(batch, vec_col)
        if quantizer == "integer":
            q = _quantize_int(v, scale)
            dist = np.stack([((q - cc) ** 2).sum(axis=1) for cc in c], axis=1)
            lists = np.argmin(dist, axis=1).astype(np.int64)
        else:
            vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-30)
            lists = np.argmax(vn @ c.T, axis=1).astype(np.int64)
        batch = batch.replace_schema_metadata(None)
        return batch.append_column("list_id", pa.array(lists, pa.int64()))

    embeddings.map_batches(add_list, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    return {**meta, "n_added": embeddings.count()}


def ivf_index_topk(
    index_dir: str,
    query_vectors: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    return_stats: bool = False,
):
    """Approximate cosine top-k against a :func:`build_ivf_index` directory:
    for each query, only its ``nprobe`` closest centroid lists are read.
    With ``return_stats=True`` also returns scanned/total row+list counts."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    cent = np.load(os.path.join(index_dir, "_centroids.npy"))
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    queries = np.atleast_2d(np.asarray(query_vectors, np.float64))
    npr = min(nprobe, cent.shape[0])
    if meta.get("quantizer") == "integer":
        # integer-exact probe order (dist ASC, cid ASC) — matches the SQL
        # oracle's deterministic tie-break
        q = _quantize_int(queries, meta["scale"])
        dist = np.stack([((q - cc) ** 2).sum(axis=1) for cc in cent], axis=1)
        cids = np.arange(cent.shape[0])
        probe_lists = np.stack(
            [np.lexsort((cids, d))[:npr] for d in dist], axis=0
        )
    else:
        qn = queries / np.maximum(np.linalg.norm(queries, axis=1, keepdims=True), 1e-30)
        probe_lists = np.argpartition(-(qn @ cent.T), npr - 1, axis=1)[:, :npr]
    wanted = sorted({int(x) for x in probe_lists.ravel()})
    paths = [
        os.path.join(index_dir, f"list_id={s}", f)
        for s in wanted
        if os.path.isdir(os.path.join(index_dir, f"list_id={s}"))
        for f in os.listdir(os.path.join(index_dir, f"list_id={s}"))
        if f.endswith(".parquet")
    ]
    total_lists = sum(1 for p in os.listdir(index_dir) if p.startswith("list_id="))
    stats = {"scanned_lists": len(wanted), "total_lists": total_lists, "scanned_rows": 0}
    empty = pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                      "rnk": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
    if not paths:
        return (empty, stats) if return_stats else empty
    scanned = ray.data.read_parquet(paths)
    state = ray.put((queries, probe_lists))

    def partial(batch: pa.Table) -> pa.Table:
        qs, probes = ray.get(state)
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        lists = batch["list_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        cos = _cosine(_batch_vectors(batch, vec_col), qs)  # [rows, q]
        # a row only competes for queries that probe its list
        out = []
        for qi in range(qs.shape[0]):
            qmask = np.isin(lists, probes[qi])
            if not qmask.any():
                continue
            sub_ids, sub_cos = ids[qmask], cos[qmask, qi]
            kk = min(k, len(sub_ids))
            part = (
                np.argpartition(-sub_cos, kk - 1)[:kk] if len(sub_ids) > kk else np.arange(len(sub_ids))
            )
            out.append(
                pa.table(
                    {
                        "query_id": pa.array(np.full(len(part), qi, np.int64), pa.int64()),
                        id_col: pa.array(sub_ids[part], pa.int64()),
                        "cos": pa.array(sub_cos[part], pa.float64()),
                    }
                )
            )
        if not out:
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.concat_tables(out)

    if return_stats:
        stats["scanned_rows"] = scanned.count()
    parts = pa.Table.from_pylist(scanned.map_batches(partial, batch_format="pyarrow").take_all())
    out = _merge_topk(parts, k, id_col)
    if return_stats:
        return out, stats
    return out


def knn_graph_bucketed(
    embeddings: ray.data.Dataset,
    *,
    k: int = 3,
    n_centroids: int = 16,
    iters: int = 4,
    scale: int = 1000,
    nprobe: int = 4,
    work_list: int = 10,
    refine_rounds: int = 2,
    degree_cap: int = 64,
    sample_size: int = 20_000,
    small_n: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_bits: int = 21,
    return_stats: bool = False,
):
    """kNN-graph construction at corpus scale — the path the exact
    all-pairs ``q_knn_graph`` fails fast toward past its broadcast budget
    (the serving structure behind HNSW/NSG index builds and semantic-dedup
    clustering).  Two phases, both integer-exact and SQL-replayable:

    SEED (IVF-bucketed, pruned-quadratic): train the integer k-means
    coarse quantizer on a BOUNDED sample (:func:`train_centroids_integer`
    — driver state is O(n_centroids x dim) ints); one corpus pass assigns
    every vector a home list (integer argmin, ties -> lowest cid) and its
    ``nprobe`` closest probe lists, exploding into nprobe (list, id, qv)
    rows — home rows double as CANDIDATES, all rows are QUERIES in their
    probed lists.  One list-keyed exchange; per bucket the integer
    composite-key kernel ((dot << id_bits) | ~id — dot DESC, id ASC)
    takes each query's top candidates in one matmul.  Seed work =
    sum_b |queries_b| x |candidates_b| ~ N^2 * nprobe / n_centroids —
    size n_centroids ~ N / list_size so this is N * list_size * nprobe,
    LINEAR in N at fixed list size.

    REFINE (NN-descent local joins, Dong et al. WWW'11): each vector
    keeps a working list of ``work_list`` >= k best neighbours; per round
    the undirected edge set is partitioned by SHARED VERTEX (each
    endpoint's quantized vector travels WITH the edge — the standard
    distributed NN-descent shape), every group emits all ordered pairs of
    its <= ``degree_cap`` lowest-id members with their integer dot
    computed in-group, and a vec-keyed reduce merges new pairs with the
    previous lists (distinct, top-``work_list`` by dot DESC, id ASC).
    Round work is O(N * (2*work_list)^2) — linear in N, independent of
    corpus size per vector.  ``degree_cap`` bounds hub blowup with a
    deterministic lowest-id rule the oracle replays.

    Output: global top-k from the final working lists —
    (vec_id, rnk, nbr_id, dot), same schema as the exact operator;
    recall vs the exact graph is pinned in pytest, precision is exact
    (every edge carries its true integer dot, and the full chain is
    bit-replayed by `functions.lsh_sql.knn_graph_bucketed_sql`).

    ``return_stats=True`` additionally returns ``{"seed_pairs": ...,
    "exact_pairs": ..., "n_vectors": ..., "list_sizes": {...},
    "refine_pairs_per_round": [...]}`` — the pruned-work evidence
    (seed_pairs << exact_pairs; refine pairs ~ C * N).

    Input-execution note: the plan choice costs one ``count()`` and the
    trainer one bounded-sample pass — metadata-cheap / streaming for
    file-backed datasets, but a DERIVED pipeline (map_batches upstream)
    re-executes per pass; ``.materialize()`` such inputs before calling
    (or pass ``small_n=0`` to skip the count at true scale)."""
    import pandas as pd

    from ontoea_ray.functions.shuffle import with_partition_key

    L = max(work_list, k)
    cent = train_centroids_integer(
        embeddings, n_centroids=n_centroids, iters=iters, scale=scale,
        sample_size=sample_size, id_col=id_col, vec_col=vec_col,
    )
    npr = min(nprobe, cent.shape[0])

    # two-plan shape (the repo-wide pattern for graph-ish operators): a
    # corpus at most ``small_n`` rows runs the IDENTICAL integer algorithm
    # in ONE Ray task — the distributed plan's ~7 per-round exchanges are
    # pure fixed cost at that size.  Bit-equality between plans is pinned
    # in tests/test_knn_bucketed.py.
    if small_n and embeddings.count() <= small_n:
        res = _knn_bucketed_small(
            embeddings, cent, k=k, L=L, npr=npr, scale=scale,
            refine_rounds=refine_rounds, degree_cap=degree_cap,
            id_col=id_col, vec_col=vec_col, id_bits=id_bits,
            return_stats=return_stats,
        )
        if res is not None:  # None: row count small but bytes over budget
            return res

    cent_ref = ray.put(cent)

    def explode(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids = np.asarray(
            batch[id_col].combine_chunks().to_numpy(zero_copy_only=False), np.int64
        )
        if len(ids):
            assert int(ids.max()) < (1 << id_bits), "vec_id exceeds id_bits budget"
        q = _quantize_int(_batch_vectors(batch, vec_col), scale)
        dist = np.stack([((q - cc) ** 2).sum(axis=1) for cc in c], axis=1)
        # stable argsort: equal distances keep ascending cid order — the
        # same (dist ASC, cid ASC) tie-break the SQL oracle replays
        probe = np.argsort(dist, axis=1, kind="stable")[:, :npr]
        d = q.shape[1] if len(ids) else 0
        reps = np.repeat(np.arange(len(ids)), npr)
        return pa.table(
            {
                "list_id": pa.array(probe.reshape(-1).astype(np.int64)),
                id_col: pa.array(ids[reps]),
                "home": pa.array(np.tile(np.arange(npr) == 0, len(ids))),
                "qv": pa.FixedSizeListArray.from_arrays(
                    pa.array(q[reps].reshape(-1), pa.int64()), d
                ),
            }
        )

    exploded = embeddings.select_columns([id_col, vec_col]).map_batches(
        explode, batch_format="pyarrow"
    )

    stats = None
    if return_stats:
        from ray.data.aggregate import Count, Sum

        def to_flags(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "list_id": b["list_id"],
                    "is_home": b["home"].combine_chunks().cast(pa.int64()),
                }
            )

        per_list = (
            exploded.map_batches(to_flags, batch_format="pyarrow")
            .groupby("list_id")
            .aggregate(Count(alias_name="nq"), Sum("is_home", alias_name="nc"))
            .take_all()
        )  # <= n_centroids rows: constant driver state
        work = sum(int(r["nq"]) * int(r["nc"]) for r in per_list)
        n = sum(int(r["nc"]) for r in per_list)
        stats = {
            "seed_pairs": work,
            "exact_pairs": n * max(n - 1, 0),
            "n_vectors": n,
            "list_sizes": {int(r["list_id"]): int(r["nc"]) for r in per_list},
            "refine_pairs_per_round": [],
        }

    parted = with_partition_key(exploded, ["list_id"])
    sentinel = np.iinfo(np.int64).min + 1

    def _lst(mat: np.ndarray) -> pa.ListArray:
        # plain list<int64> (NOT FixedSizeList): the type is width-free, so
        # empty partitions concat cleanly with d-wide ones
        n = len(mat)
        d = mat.shape[1] if n else 0
        offs = np.arange(0, (n + 1) * d, d, dtype=np.int64) if n else np.zeros(1, np.int64)
        return pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(mat.reshape(-1), pa.int64())
        )

    def _edge_table(vids, nbrs, dots, vmat, nmat) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array(np.asarray(vids, np.int64)),
                "nbr_id": pa.array(np.asarray(nbrs, np.int64)),
                "dot": pa.array(np.asarray(dots, np.int64)),
                "qv_v": _lst(vmat),
                "qv_n": _lst(nmat),
            }
        )

    _Z = np.zeros((0, 0), np.int64)
    _EMPTY_EDGES = _edge_table(
        np.array([], np.int64), np.array([], np.int64), np.array([], np.int64), _Z, _Z
    )

    def bucket_topk(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _EMPTY_EDGES
        outs = []
        for _, g in df.groupby("list_id", sort=False):
            cand = g[g["home"].to_numpy(bool)]
            if len(cand) == 0:
                continue
            cids = cand[id_col].to_numpy(np.int64)
            cmat = np.stack(cand["qv"].to_numpy())
            qids = g[id_col].to_numpy(np.int64)
            qmat = np.stack(g["qv"].to_numpy())
            dots = qmat @ cmat.T
            key = dots * (1 << id_bits) + ((1 << id_bits) - 1 - cids)[None, :]
            key[qids[:, None] == cids[None, :]] = sentinel
            # top (L+1) within the bucket is enough: the global reduce
            # re-ranks, so only >= L non-self survivors per query matter
            kk = min(L + 1, len(cids))
            order = np.argsort(-key, axis=1, kind="stable")[:, :kk]
            sel_key = np.take_along_axis(key, order, axis=1).reshape(-1)
            rows = np.repeat(np.arange(len(qids)), kk)
            cols = order.reshape(-1)
            keep = sel_key != sentinel
            rows, cols = rows[keep], cols[keep]
            outs.append(
                _edge_table(
                    qids[rows], cids[cols], dots[rows, cols], qmat[rows], cmat[cols]
                )
            )
        if not outs:
            return _EMPTY_EDGES
        return pa.concat_tables(outs)

    def reduce_list(df: pd.DataFrame) -> pa.Table:
        """Per-vector merge: distinct neighbours, top-L by (dot DESC, id ASC)."""
        if df.empty:
            return _EMPTY_EDGES
        df = df.sort_values(
            [id_col, "dot", "nbr_id"], ascending=[True, False, True], kind="mergesort"
        )
        df = df.drop_duplicates([id_col, "nbr_id"])
        df = df.groupby(id_col, sort=False).head(L).reset_index(drop=True)
        return _edge_table(
            df[id_col].to_numpy(np.int64),
            df["nbr_id"].to_numpy(np.int64),
            df["dot"].to_numpy(np.int64),
            np.stack(df["qv_v"].to_numpy()),
            np.stack(df["qv_n"].to_numpy()),
        )

    seeded = parted.groupby("pkey").map_groups(bucket_topk, batch_format="pandas")
    edges = (
        with_partition_key(seeded, [id_col])
        .groupby("pkey")
        .map_groups(reduce_list, batch_format="pandas")
    )

    def local_join(df: pd.DataFrame) -> pa.Table:
        """Per shared-vertex group: all ordered pairs of the <= degree_cap
        lowest-id members, dots computed in-group from the carried qv."""
        if df.empty:
            return _EMPTY_EDGES
        outs = []
        n_capped = 0
        for _, g in df.groupby("x", sort=False):
            g = g.drop_duplicates("s").sort_values("s", kind="mergesort")
            if len(g) > degree_cap:
                g = g.head(degree_cap)
                n_capped += 1
            if len(g) < 2:
                continue
            sids = g["s"].to_numpy(np.int64)
            smat = np.stack(g["qv_s"].to_numpy())
            dots = smat @ smat.T
            n = len(sids)
            ii, jj = np.nonzero(~np.eye(n, dtype=bool))
            outs.append(
                _edge_table(sids[ii], sids[jj], dots[ii, jj], smat[ii], smat[jj])
            )
        if n_capped:
            import logging

            # not silent: a heavily-capped round means hub recall loss —
            # the cap itself is deterministic (lowest ids) and replayed by
            # the SQL oracle, so correctness-vs-oracle is unaffected
            logging.getLogger(__name__).warning(
                "knn_graph_bucketed: %d hub vertices truncated to degree_cap=%d "
                "in this partition", n_capped, degree_cap,
            )
        if not outs:
            return _EMPTY_EDGES
        return pa.concat_tables(outs)

    for _ in range(refine_rounds):
        edges = edges.materialize()  # consumed three times per round

        def to_und(b: pa.Table) -> pa.Table:
            # both directions: each row contributes its NEIGHBOUR's vector
            # to the shared-vertex group (vectors travel with the edge)
            return pa.table(
                {
                    "x": pa.concat_arrays(
                        [b[id_col].combine_chunks(), b["nbr_id"].combine_chunks()]
                    ),
                    "s": pa.concat_arrays(
                        [b["nbr_id"].combine_chunks(), b[id_col].combine_chunks()]
                    ),
                    "qv_s": pa.concat_arrays(
                        [b["qv_n"].combine_chunks(), b["qv_v"].combine_chunks()]
                    ),
                }
            )

        und = edges.map_batches(to_und, batch_format="pyarrow")
        joined = (
            with_partition_key(und, ["x"])
            .groupby("pkey")
            .map_groups(local_join, batch_format="pandas")
        )

        def to_rev(b: pa.Table) -> pa.Table:
            # reversed edges as candidates (dot is symmetric)
            return pa.table(
                {
                    id_col: b["nbr_id"],
                    "nbr_id": b[id_col],
                    "dot": b["dot"],
                    "qv_v": b["qv_n"],
                    "qv_n": b["qv_v"],
                }
            )

        cand = edges.union(
            edges.map_batches(to_rev, batch_format="pyarrow"), joined
        )
        if return_stats:
            # materialize so the count does not force the union pipeline
            # to execute twice (once counted, once exchanged)
            cand = cand.materialize()
            stats["refine_pairs_per_round"].append(cand.count())
        edges = (
            with_partition_key(cand, [id_col])
            .groupby("pkey")
            .map_groups(reduce_list, batch_format="pandas")
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=np.int64),
                    "rnk": pd.Series([], dtype=np.int64),
                    "nbr_id": pd.Series([], dtype=np.int64),
                    "dot": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(
            [id_col, "dot", "nbr_id"], ascending=[True, False, True], kind="mergesort"
        )
        df = df.groupby(id_col, sort=False).head(k).reset_index(drop=True)
        df["rnk"] = (df.groupby(id_col, sort=False).cumcount() + 1).astype(np.int64)
        return df[[id_col, "rnk", "nbr_id", "dot"]]

    out = (
        with_partition_key(edges.drop_columns(["qv_v", "qv_n"]), [id_col])
        .groupby("pkey")
        .map_groups(finish, batch_format="pandas")
    )
    return (out, stats) if return_stats else out


def _knn_bucketed_small(
    embeddings: ray.data.Dataset,
    cent: np.ndarray,
    *,
    k: int,
    L: int,
    npr: int,
    scale: int,
    refine_rounds: int,
    degree_cap: int,
    id_col: str,
    vec_col: str,
    id_bits: int,
    return_stats: bool,
):
    """Single-task plan of :func:`knn_graph_bucketed` for corpora small
    enough that one worker holds the (N, N) integer dot block: the SAME
    integer seed + NN-descent rounds, same tie rules and degree cap —
    bit-identical to the distributed plan (pinned in pytest) without its
    per-round exchange fixed costs."""
    from ontoea_ray.functions.broadcast import assemble_table_ref

    _, tref = assemble_table_ref(embeddings, columns=[id_col, vec_col])
    if tref is None:  # bytes over the broadcast budget: distributed plan
        return None
    sentinel = np.iinfo(np.int64).min + 1

    @ray.remote
    def _solve(tbl: pa.Table):
        ids = np.asarray(
            tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False), np.int64
        )
        n = len(ids)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
            }
        )
        stats = {
            "seed_pairs": 0, "exact_pairs": 0, "n_vectors": n,
            "list_sizes": {}, "refine_pairs_per_round": [],
        }
        if n == 0:
            return empty, stats
        assert int(ids.max()) < (1 << id_bits)
        q = _quantize_int(_batch_vectors(tbl, vec_col), scale)
        dist = np.stack([((q - cc) ** 2).sum(axis=1) for cc in cent], axis=1)
        probe = np.argsort(dist, axis=1, kind="stable")[:, :npr]
        home = probe[:, 0]
        dots = q @ q.T
        key = dots * (1 << id_bits) + ((1 << id_bits) - 1 - ids)[None, :]
        key[np.arange(n), np.arange(n)] = sentinel
        kk = cent.shape[0]
        pmat = np.zeros((n, kk), bool)
        pmat[np.repeat(np.arange(n), probe.shape[1]), probe.reshape(-1)] = True
        allowed = pmat[:, home]  # allowed[i, j]: j's home list is probed by i
        nc = np.bincount(home, minlength=kk)
        nq = np.bincount(probe.reshape(-1), minlength=kk)
        stats.update(
            seed_pairs=int((nc * nq).sum()),
            exact_pairs=n * (n - 1),
            # nq[c] > 0 (not nc) mirrors the distributed plan's groupby
            # over exploded rows: a probed-but-home-empty list appears
            # with size 0 there, so it must here too
            list_sizes={int(c): int(nc[c]) for c in range(kk) if nq[c]},
        )

        def topL(kmask: np.ndarray) -> list[np.ndarray]:
            keym = np.where(kmask, key, sentinel)
            order = np.argsort(-keym, axis=1, kind="stable")[:, :L]
            sel = np.take_along_axis(keym, order, axis=1)
            return [order[i][sel[i] != sentinel] for i in range(n)]

        edges = topL(allowed)  # seed working lists
        for _ in range(refine_rounds):
            und = np.zeros((n, n), bool)
            for i, nb in enumerate(edges):
                und[i, nb] = True
            und |= und.T
            cand = und.copy()
            n_cand_rows = 2 * sum(len(nb) for nb in edges)  # in1 + in2
            for x in range(n):
                s = np.flatnonzero(und[x])
                if len(s) > degree_cap:
                    # deterministic lowest-id cap, as in the distributed plan
                    s = s[np.argsort(ids[s], kind="stable")[:degree_cap]]
                if len(s) >= 2:
                    cand[np.ix_(s, s)] = True
                    n_cand_rows += len(s) * (len(s) - 1)
            cand[np.arange(n), np.arange(n)] = False
            stats["refine_pairs_per_round"].append(n_cand_rows)
            edges = topL(cand)
        rows = np.concatenate([np.full(len(nb), i, np.int64) for i, nb in enumerate(edges)])
        nbrs = np.concatenate(edges) if edges else np.array([], np.int64)
        # per-row the lists are already key-ordered; cut to top-k
        rnk = np.concatenate(
            [np.arange(1, len(nb) + 1, dtype=np.int64) for nb in edges]
        )
        keep = rnk <= k
        rows, nbrs, rnk = rows[keep], nbrs[keep], rnk[keep]
        return (
            pa.table(
                {
                    id_col: pa.array(ids[rows]),
                    "rnk": pa.array(rnk),
                    "nbr_id": pa.array(ids[nbrs]),
                    "dot": pa.array(dots[rows, nbrs]),
                }
            ),
            stats,
        )

    tbl, stats = ray.get(_solve.remote(tref))
    out = ray.data.from_arrow(tbl)
    return (out, stats) if return_stats else out


def build_knn_graph_index(
    embeddings: ray.data.Dataset,
    index_dir: str,
    *,
    k: int = 3,
    exact: bool = False,
    n_shards: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_bits: int = 21,
    **bucketed_kwargs,
) -> dict:
    """Persist a kNN graph as a SERVING index for graph-ANN search
    (:func:`graph_ann_topk`) — the HNSW/NSG-style layout where each
    node's adjacency is stored WITH the neighbours' quantized vectors
    (denormalized, so a walk step scores candidates without a second
    lookup), partitioned by ``shard = vec_id % n_shards`` so a search
    reads only its frontier's shards.

    ``exact=False`` (default): edges from :func:`knn_graph_bucketed` —
    the corpus-scale build.  ``exact=True``: brute all-pairs integer
    top-k (same kernel/tie rules as q_knn_graph) — the oracle-friendly
    build for broadcast-sized corpora.  Row schema:
    (vec_id, qv, rnk, nbr_id, nbr_qv); vectors are floor(v*scale) int64
    lists, identical on both sides of every oracle."""
    if exact:
        from ontoea_ray.functions.broadcast import assemble_table_ref

        embeddings, tref = assemble_table_ref(embeddings, columns=[id_col, vec_col])
        if tref is None:
            raise ValueError(
                "build_knn_graph_index(exact=True) needs a broadcast-sized "
                "corpus; use exact=False (knn_graph_bucketed) at scale"
            )
        sentinel = np.iinfo(np.int64).min + 1

        @ray.remote
        def _exact_edges(tbl: pa.Table) -> pa.Table:
            ids = np.asarray(
                tbl[id_col].combine_chunks().to_numpy(zero_copy_only=False), np.int64
            )
            assert int(ids.max(initial=0)) < (1 << id_bits)
            q = _quantize_int(_batch_vectors(tbl, vec_col), scale)
            n = len(ids)
            keff = min(k, n - 1)
            if keff <= 0:
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "qv": pa.array([], pa.list_(pa.int64())),
                        "rnk": pa.array([], pa.int64()),
                        "nbr_id": pa.array([], pa.int64()),
                        "nbr_qv": pa.array([], pa.list_(pa.int64())),
                    }
                )
            dots = q @ q.T
            key = dots * (1 << id_bits) + ((1 << id_bits) - 1 - ids)[None, :]
            key[np.arange(n), np.arange(n)] = sentinel
            order = np.argsort(-key, axis=1, kind="stable")[:, :keff]
            rows = np.repeat(np.arange(n), keff)
            cols = order.reshape(-1)
            return pa.table(
                {
                    id_col: pa.array(ids[rows]),
                    "qv": pa.array([v.tolist() for v in q[rows]], pa.list_(pa.int64())),
                    "rnk": pa.array(np.tile(np.arange(1, keff + 1, dtype=np.int64), n)),
                    "nbr_id": pa.array(ids[cols]),
                    "nbr_qv": pa.array([v.tolist() for v in q[cols]], pa.list_(pa.int64())),
                }
            )

        edges = ray.data.from_arrow(ray.get(_exact_edges.remote(tref)))
    else:
        graph = knn_graph_bucketed(
            embeddings, k=k, scale=scale, id_col=id_col, vec_col=vec_col,
            id_bits=id_bits, **bucketed_kwargs,
        )
        # re-attach both endpoint vectors (the bucketed output drops them):
        # one quantize pass builds (id, qv), then two co-located joins
        vecs = embeddings.select_columns([id_col, vec_col])

        def quantize(b: pa.Table) -> pa.Table:
            ids = b[id_col].combine_chunks().cast(pa.int64())
            q = _quantize_int(_batch_vectors(b, vec_col), scale)
            return pa.table(
                {
                    id_col: ids,
                    "qv": pa.array([v.tolist() for v in q], pa.list_(pa.int64())),
                }
            )

        from ontoea_ray.functions.join import hash_join

        qtab = vecs.map_batches(quantize, batch_format="pyarrow")
        edges = hash_join(graph.drop_columns(["dot"]), qtab, on=[id_col])
        nbr_q = qtab.map_batches(
            lambda b: pa.table({"nbr_id": b[id_col], "nbr_qv": b["qv"]}),
            batch_format="pyarrow",
        )
        edges = hash_join(edges, nbr_q, on=["nbr_id"])

    def shard(b: pa.Table) -> pa.Table:
        ids = np.asarray(b[id_col].combine_chunks().to_numpy(zero_copy_only=False), np.int64)
        b = b.replace_schema_metadata(None)
        return b.append_column("shard", pa.array(ids % n_shards))

    os.makedirs(index_dir, exist_ok=True)
    edges.map_batches(shard, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["shard"]
    )
    # the walk's entry point (global min id) and its quantized vector are
    # index metadata, computed once at build by a per-batch min-reduce
    # that carries the winning row's vector out (no search-time scans,
    # and a zero-out-degree entry still answers with itself)
    def batch_min(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "qv": pa.array([], pa.list_(pa.int64()))}
            )
        ids = np.asarray(b[id_col].combine_chunks().to_numpy(zero_copy_only=False), np.int64)
        j = int(np.argmin(ids))
        qv = _quantize_int(_batch_vectors(b.slice(j, 1), vec_col), scale)[0]
        return pa.table(
            {id_col: pa.array([int(ids[j])], pa.int64()),
             "qv": pa.array([qv.tolist()], pa.list_(pa.int64()))}
        )

    mins = (
        embeddings.select_columns([id_col, vec_col])
        .map_batches(batch_min, batch_format="pyarrow")
        .sort(id_col)
        .limit(1)
        .take_all()
    )
    entry = int(mins[0][id_col]) if mins else None
    meta = {
        "kind": "knn_graph", "k": k, "n_shards": n_shards, "scale": scale,
        "exact": exact, "id_col": id_col, "vec_col": vec_col,
        "entry": entry,
        "entry_qv": [int(x) for x in mins[0]["qv"]] if mins else None,
    }
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def graph_ann_topk(
    index_dir: str,
    query_vector: np.ndarray,
    *,
    k: int = 10,
    beam: int = 4,
    hops: int = 4,
    return_stats: bool = False,
):
    """Graph-ANN beam search over a :func:`build_knn_graph_index`
    directory — the serving walk an HNSW/NSG-style index runs, made
    fully deterministic and SQL-replayable:

    - entry = the smallest vec_id; visited = {entry};
    - each hop expands the frontier's out-neighbours (reading ONLY the
      frontier's ``shard=`` partitions — pruned I/O), scores the NEW
      candidates by integer milli dot against the query, adds them all
      to the visited pool, and keeps the top-``beam`` new candidates
      (dot DESC, id ASC) as the next frontier;
    - after ``hops`` hops the answer is the visited pool's top-``k``.

    Driver state is the visited pool (<= 1 + hops*beam*k_graph entries)
    and the frontier — constant-bounded, never corpus-sized.  Returns
    (vec_id, rnk, dot); with ``return_stats=True`` also
    ``{"scanned_shards": [...], "total_shards": N, "n_visited": ...}``."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pqm

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    n_shards, scale, id_col = meta["n_shards"], meta["scale"], meta["id_col"]
    qq = np.floor(np.asarray(query_vector, np.float64).reshape(-1) * scale).astype(np.int64)

    def shard_files(s: int) -> list[str]:
        d = os.path.join(index_dir, f"shard={s}")
        if not os.path.isdir(d):
            return []
        return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]

    _empty_rows = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "qv": pa.array([], pa.list_(pa.int64())),
            "nbr_id": pa.array([], pa.int64()),
            "nbr_qv": pa.array([], pa.list_(pa.int64())),
        }
    )

    def read_rows(frontier: np.ndarray) -> pa.Table:
        shards = sorted({int(v) % n_shards for v in frontier})
        paths = [p for s in shards for p in shard_files(s)]
        scanned.update(shards)
        if not paths:
            return _empty_rows
        tbl = pa.concat_tables(
            [pqm.read_table(p, columns=[id_col, "qv", "nbr_id", "nbr_qv"]) for p in paths]
        )
        return tbl.filter(pc.is_in(tbl[id_col], value_set=pa.array(frontier)))

    scanned: set[int] = set()
    if meta.get("entry") is None:
        empty = pa.table({ "vec_id": pa.array([], pa.int64()),
                           "rnk": pa.array([], pa.int64()),
                           "dot": pa.array([], pa.int64())})
        stats = {"scanned_shards": [], "total_shards": n_shards, "n_visited": 0}
        return (empty, stats) if return_stats else empty

    # the entry's quantized vector is INDEX METADATA (stored at build):
    # an entry with zero out-edges still answers with itself, exactly as
    # the SQL oracle does, and the walk never reads a shard just for it
    entry = int(meta["entry"])
    eq = np.asarray(meta["entry_qv"], np.int64)
    visited: dict[int, int] = {entry: int(eq @ qq)}
    frontier = np.array([entry], np.int64)
    for _ in range(hops):
        if len(frontier) == 0:
            break
        # reads happen at the hop that consumes them — no trailing read
        # after the final hop
        frontier_rows = read_rows(frontier)
        nbrs = np.asarray(
            frontier_rows["nbr_id"].combine_chunks().to_numpy(zero_copy_only=False),
            np.int64,
        )
        nq = frontier_rows["nbr_qv"].combine_chunks()
        flat = np.asarray(nq.values, np.int64)
        d = len(flat) // max(len(nbrs), 1)
        mats = flat.reshape(len(nbrs), d) if len(nbrs) else np.zeros((0, len(qq)), np.int64)
        new_mask = np.array([int(v) not in visited for v in nbrs], bool)
        ids_new, mat_new = nbrs[new_mask], mats[new_mask]
        if len(ids_new):
            uniq, first = np.unique(ids_new, return_index=True)
            dots = mat_new[first] @ qq
            for v, dt in zip(uniq, dots):
                visited[int(v)] = int(dt)
            order = np.lexsort((uniq, -dots))[:beam]
            frontier = uniq[order]
        else:
            frontier = np.array([], np.int64)
    ids = np.array(sorted(visited), np.int64)
    dots = np.array([visited[int(v)] for v in ids], np.int64)
    order = np.lexsort((ids, -dots))[: min(k, len(ids))]
    out = pa.table(
        {
            "vec_id": pa.array(ids[order]),
            "rnk": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "dot": pa.array(dots[order]),
        }
    )
    stats = {
        "scanned_shards": sorted(scanned),
        "total_shards": n_shards,
        "n_visited": len(visited),
    }
    return (out, stats) if return_stats else out


def centroid_assign(
    embeddings: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1000,
) -> ray.data.Dataset:
    """Assign every vector to its max-inner-product centroid — the k-means
    assignment step / broadcast similarity join, in INTEGER arithmetic so
    the scores are bit-deterministic and SQL-replayable (both sides
    quantized ``floor(float64(x) * quant)``; int64 dot products are
    order-independent, float dots are not).

    ``centroids``: (K, d) float array, broadcast once (K is small by
    definition); ties go to the lowest centroid id.  One shuffle-free
    corpus pass, int matmul per batch."""
    cq = np.floor(centroids.astype(np.float64) * quant).astype(np.int64)
    cref = ray.put(cq)

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = batch[vec_col].combine_chunks()
            flat = np.asarray(vecs.values, np.float32).astype(np.float64)
            mat = np.floor(flat.reshape(len(batch), -1) * quant).astype(np.int64)
            scores = mat @ self.c.T  # (n, K) int64
            best = np.argmax(scores, axis=1)  # first max = lowest cid
            return pa.table(
                {
                    id_col: batch[id_col],
                    "centroid": pa.array(best.astype(np.int64)),
                    "score": pa.array(scores[np.arange(len(batch)), best]),
                }
            )

    from ontoea_ray.stages.scan_link import default_pool_size

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        Assign, batch_format="pyarrow", concurrency=default_pool_size(None)
    )


def semantic_dedup(
    embeddings: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    tau_num: int = 7,
    tau_den: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant: int = 1000,
    max_cluster: int | None = None,
) -> ray.data.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster
    vectors by max-inner-product against broadcast centroids, then within
    each cluster drop every vector that has a LOWER-id neighbour with
    quantized cosine >= tau_num/tau_den.  Returns the survivors
    (id_col, centroid).

    Exactness: both sides are milli-quantized ints; the cosine test is the
    cross-multiplied integer comparison dot >= 0 AND dot^2 * den^2 >=
    num^2 * |a|^2 * |b|^2 — no float anywhere, so DuckDB replays every
    decision bit-for-bit.  int64 bounds (unit-norm vectors, quant=1000,
    d <= 64): |dot| <= 6.4e7, dot^2 * den^2 <= 1.6e18 < 2^63 for den <= 20.
    Keep tau as a SMALL fraction (den <= ~30) to stay inside int64.

    Scale shape: ONE pass computes assignment + quantized vector; the only
    exchange is the cluster-keyed partition of the (quantized) embedding
    table — the SemDeDup design point, with K sized so n/K rows fit a
    worker.  The per-cluster O(c^2 d) matmul is the algorithm's stated
    cost.  The drop rule is the pairwise epsilon-ball (a dropped vector
    still witnesses later drops) — deterministic without transitive
    closure; chain-merging dedup composes via connected_components
    (q_dup_clusters) instead.  ``max_cluster`` (production guard) skips —
    and LOGS — clusters too big to pair, keeping all their rows.
    """
    import pandas as pd

    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.stages.scan_link import default_pool_size

    cq = np.floor(centroids.astype(np.float64) * quant).astype(np.int64)
    cref = ray.put(cq)
    den2 = np.int64(tau_den * tau_den)
    num2 = np.int64(tau_num * tau_num)

    class AssignQ:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = batch[vec_col].combine_chunks()
            flat = np.asarray(vecs.values, np.float32).astype(np.float64)
            mat = np.floor(flat.reshape(len(batch), -1) * quant).astype(np.int64)
            best = np.argmax(mat @ self.c.T, axis=1)  # first max = lowest cid
            d = mat.shape[1]
            return pa.table(
                {
                    id_col: batch[id_col],
                    "centroid": pa.array(best.astype(np.int64)),
                    "qv": pa.FixedSizeListArray.from_arrays(
                        pa.array(mat.reshape(-1), pa.int64()), d
                    ),
                }
            )

    assigned = embeddings.select_columns([id_col, vec_col]).map_batches(
        AssignQ, batch_format="pyarrow", concurrency=default_pool_size(None)
    )

    def dedup_clusters(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {id_col: pd.Series([], dtype=np.int64), "centroid": pd.Series([], dtype=np.int64)}
        )
        if df.empty:
            return empty
        df = df.sort_values(["centroid", id_col], kind="mergesort")
        cent = df["centroid"].to_numpy(np.int64)
        ids = df[id_col].to_numpy(np.int64)
        qmat = np.stack(df["qv"].to_numpy())
        keep_mask = np.ones(len(df), bool)
        starts = np.flatnonzero(np.concatenate([[True], cent[1:] != cent[:-1]]))
        bounds = np.concatenate([starts, [len(df)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            c = e - s
            if c < 2:
                continue
            if max_cluster is not None and c > max_cluster:
                import logging

                logging.getLogger(__name__).warning(
                    "semantic_dedup: skipped cluster %d with %d rows (> max_cluster=%d); all kept",
                    int(cent[s]), c, max_cluster,
                )
                continue
            Q = qmat[s:e]
            G = Q @ Q.T
            n2 = np.diag(G).copy()
            cond = (G >= 0) & (G * G * den2 >= num2 * np.outer(n2, n2))
            # strict lower triangle: row i dropped if any j < i is tau-close
            cond[np.triu_indices(c)] = False
            keep_mask[s:e] = ~cond.any(axis=1)
        out = pd.DataFrame({id_col: ids[keep_mask], "centroid": cent[keep_mask]})
        return out if len(out) else empty

    parted = with_partition_key(assigned, ["centroid"])
    return parted.groupby("pkey").map_groups(dedup_clusters, batch_format="pandas")
