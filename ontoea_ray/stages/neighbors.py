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
