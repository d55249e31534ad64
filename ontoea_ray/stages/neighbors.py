"""Truncated-neighbor generation for hard-negative sampling.

Reference semantics (/root/reference/code/src/openea/modules/train/
batch.py:268-299): blockwise ``sub_embed @ embed.T`` + argpartition top-k
per row, giving each entity its k nearest neighbors by inner product; the
trainer then corrupts triples using only these candidates
(``neg_sampling: truncated``, refreshed every ``truncated_freq`` epochs).

Ray-Data-first: the right-side matrix is broadcast once via ``ray.put``;
left rows stream through ``map_batches`` blocks; only (row, top-k ids)
leaves each task.  At web scale the north_star swaps this dense kNN for
MinHash/LSH blocking (stages/dedup.py, stages/ann.py) — this operator is
the exact-parity path at benchmark scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def generate_neighbours(
    embeds: np.ndarray,
    entity_ids: np.ndarray,
    k: int,
    *,
    block_rows: int = 2048,
    concurrency: int | tuple[int, int] = 4,
) -> dict[int, np.ndarray]:
    """entity_id -> k nearest entity_ids (inner product, self included —
    matching the reference, which does not exclude the entity itself)."""
    embeds = np.ascontiguousarray(embeds, np.float32)
    entity_ids = np.asarray(entity_ids, np.int64)
    mat_ref = ray.put((embeds, entity_ids))

    tables = []
    n = len(embeds)
    for s in range(0, n, block_rows):
        e = min(n, s + block_rows)
        tables.append(pa.table({"row": pa.array(np.arange(s, e), pa.int64())}))
    ds = ray.data.from_arrow(tables)

    kk = min(k, n)

    def topk(batch: pa.Table) -> pa.Table:
        emb, ids = ray.get(mat_ref)
        rows = batch["row"].to_numpy(zero_copy_only=False)
        sim = emb[rows] @ emb.T
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk] if n > kk else np.tile(np.arange(n), (len(rows), 1))
        return pa.table(
            {
                "entity": pa.array(ids[rows], pa.int64()),
                "neighbors": pa.array([ids[p].tolist() for p in part], pa.list_(pa.int64())),
            }
        )

    out = ds.map_batches(topk, batch_format="pyarrow", batch_size=block_rows, concurrency=concurrency)
    return {r["entity"]: np.asarray(r["neighbors"], np.int64) for r in out.take_all()}


def generate_neighbours_blockwise(
    embeddings: ray.data.Dataset,
    k: int,
    *,
    id_col: str = "ent_id",
    vec_col: str = "vec",
    batch_size: int = 2048,
    concurrency: int | tuple[int, int] = 4,
) -> ray.data.Dataset:
    """Artifact-sharded variant of :func:`generate_neighbours`: both sides
    come from an embedding ARTIFACT Dataset (e.g. the trainer's saved
    ``ent_embeds.parquet``), the broadcast matrix is assembled INSIDE a Ray
    task (`functions.broadcast.assemble_table_ref` — the driver never
    holds a vector), left rows stream through the same dataset, and the
    result is a Dataset of (entity, neighbors list<int64>) the caller can
    write partitioned or stream — no O(n*k) driver/actor dict.

    This is the first step toward the sharded trainer (SURVEY §2.4): the
    kNN refresh no longer requires the full matrix to live in one actor's
    heap.  Top-k semantics are identical to :func:`generate_neighbours`
    (inner product, self included, ties by np.argpartition over the same
    float32 matrix — the test pins pool equality)."""
    from ontoea_ray.functions.broadcast import assemble_table_ref

    embeddings, tbl_ref = assemble_table_ref(embeddings, columns=[id_col, vec_col])
    if tbl_ref is None:
        raise ValueError(
            "embedding table exceeds the broadcast budget; exact kNN "
            "refresh needs the right side resident — use the ANN refresh "
            "(stages/ann.py LSH/IVF) above this size"
        )

    @ray.remote
    def _norm(tref):
        t = tref if isinstance(tref, pa.Table) else ray.get(tref)
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = t[vec_col].combine_chunks()
        flat = vecs.flatten().to_numpy(zero_copy_only=False)
        d = len(flat) // max(len(ids), 1)
        return ids, np.ascontiguousarray(flat.reshape(-1, d), np.float32)

    mat_ref = _norm.remote(tbl_ref)

    class _TopK:
        def __init__(self):
            self.ids, self.emb = ray.get(mat_ref)
            order = np.argsort(self.ids, kind="stable")
            self.ids, self.emb = self.ids[order], self.emb[order]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            vecs = batch[vec_col].combine_chunks()
            flat = vecs.flatten().to_numpy(zero_copy_only=False)
            rows = np.ascontiguousarray(
                flat.reshape(-1, self.emb.shape[1]), np.float32
            )
            n = len(self.ids)
            kk = min(k, n)
            sim = rows @ self.emb.T
            part = (
                np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
                if n > kk
                else np.tile(np.arange(n), (len(rows), 1))
            )
            return pa.table(
                {
                    "entity": pa.array(ids, pa.int64()),
                    "neighbors": pa.array(
                        [self.ids[p].tolist() for p in part], pa.list_(pa.int64())
                    ),
                }
            )

    return embeddings.map_batches(
        _TopK, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )
