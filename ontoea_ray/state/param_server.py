"""Sharded entity-embedding parameter server.

The reference trains every embedding table inside ONE process
(/root/reference/code/src/openea/approaches/ontoea.py:120-182 creates all
TF variables in a single graph), which caps the entity table at one
machine's heap.  Here the entity table (and its Adagrad accumulator) is
row-partitioned across K Ray actors: the trainer gathers only the rows a
minibatch touches and pushes row-sparse updates back to the owning shard.

Consistency model: Ray actor tasks execute FIFO per actor, so an `update`
submitted before a `gather` on the same shard is applied first — the
trainer never needs a barrier between steps; cross-shard ordering is
irrelevant because rows are partitioned.  Update math is byte-identical to
`pipelines.training._Adagrad.update_rows` restricted to the shard's rows
(per-row accumulation order is preserved by the client's stable masking),
so a sharded run reproduces the dense trainer bit-for-bit — pinned by
tests/test_training.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _unit_rows(rng: np.random.Generator, n: int, dim: int) -> np.ndarray:
    m = rng.standard_normal((n, dim)).astype(np.float32)
    norm = np.maximum(np.sqrt((m * m).sum(axis=1, keepdims=True)), 1e-12)
    return m / norm


@ray.remote(num_cpus=1)
class EmbeddingShard:
    """Owns the contiguous global-row range [start, start+rows)."""

    def __init__(
        self,
        start: int,
        rows: int,
        dim: int,
        lr: float,
        *,
        init: np.ndarray | None = None,
        seed: int | None = None,
        shard_idx: int = 0,
    ):
        self.start = int(start)
        self.lr = np.float32(lr)
        if init is not None:
            # plasma-backed arrays arrive zero-copy and read-only
            self.param = np.array(init, np.float32, copy=True, order="C")
        else:
            # shard-local init: seeded by (seed, shard_idx) so the table
            # never exists densely anywhere (the at-scale path; the
            # scatter path preserves bit-parity with the dense trainer)
            rng = np.random.default_rng([int(seed or 0), shard_idx])
            self.param = _unit_rows(rng, rows, dim)
        self.acc = np.zeros_like(self.param)

    def gather(self, ids: np.ndarray) -> np.ndarray:
        return self.param[np.asarray(ids, np.int64) - self.start]

    def update(self, rows: np.ndarray, grads: np.ndarray) -> None:
        """Adagrad row update — same math as _Adagrad.update_rows."""
        local = np.asarray(rows, np.int64) - self.start
        uniq, inv = np.unique(local, return_inverse=True)
        g = np.zeros((len(uniq), self.param.shape[1]), np.float32)
        np.add.at(g, inv, grads.astype(np.float32, copy=False))
        self.acc[uniq] += g * g
        self.param[uniq] -= self.lr * g / (np.sqrt(self.acc[uniq]) + 1e-8)

    def block(
        self,
        ids: np.ndarray | None = None,
        *,
        normalize: bool = False,
        id_col: str = "ent_id",
        vec_col: str = "vec",
    ) -> pa.Table:
        """This shard's rows (optionally a subset, optionally L2-normalized)
        as an Arrow table — feeds Dataset-based eval / kNN / artifact
        writes without the table ever concatenating anywhere."""
        if ids is None:
            gids = np.arange(self.start, self.start + len(self.param), dtype=np.int64)
            vecs = self.param
        else:
            gids = np.asarray(ids, np.int64)
            vecs = self.param[gids - self.start]
        if normalize:
            n = np.maximum(np.sqrt((vecs * vecs).sum(axis=1, keepdims=True)), 1e-12)
            vecs = vecs / n
        dim = self.param.shape[1]
        flat = pa.array(np.ascontiguousarray(vecs, np.float32).reshape(-1), pa.float32())
        return pa.table(
            {
                id_col: pa.array(gids, pa.int64()),
                vec_col: pa.FixedSizeListArray.from_arrays(flat, dim),
            }
        )

    def snapshot(self) -> np.ndarray:
        return self.param


class ShardedEntityStore:
    """Client for a row-partitioned embedding table + Adagrad state.

    gather() fans the id list out by ownership range and reassembles rows
    in request order; update() partitions (rows, grads) with stable masks
    and fires per-shard actor tasks without blocking (FIFO per actor keeps
    read-your-writes); sync() drains pending update refs to surface
    errors."""

    def __init__(
        self,
        num_rows: int,
        dim: int,
        lr: float,
        *,
        num_shards: int | None = None,
        init_array: np.ndarray | None = None,
        seed: int | None = None,
        cpus_per_shard: float | None = None,
    ):
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if num_shards is None:
            num_shards = max(2, min(8, cpus // 4))
        num_shards = max(1, min(num_shards, num_rows)) if num_rows else 1
        if cpus_per_shard is None:
            # never reserve more than half the cluster for parameter
            # shards — the data-plane stages (eval, kNN, Dataset consumes)
            # must always be able to start (a fully-reserved cluster
            # deadlocks the streaming executor)
            cpus_per_shard = min(1.0, max(0.25, (cpus / 2) / num_shards))
        self.reserved_cpus = cpus_per_shard * num_shards
        self.num_rows, self.dim = int(num_rows), int(dim)
        bounds = np.linspace(0, num_rows, num_shards + 1).astype(np.int64)
        self.starts, self.stops = bounds[:-1], bounds[1:]
        self.shards = []
        for i, (s, e) in enumerate(zip(self.starts, self.stops)):
            init = None
            if init_array is not None:
                init = ray.put(np.ascontiguousarray(init_array[s:e], np.float32))
            self.shards.append(
                EmbeddingShard.options(num_cpus=cpus_per_shard).remote(
                    int(s), int(e - s), dim, lr, init=init, seed=seed, shard_idx=i
                )
            )
        self._pending: list = []

    def _masks(self, ids: np.ndarray):
        for i in range(len(self.shards)):
            m = (ids >= self.starts[i]) & (ids < self.stops[i])
            if m.any():
                yield i, m

    def gather(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids, np.int64)
        out = np.empty((len(ids), self.dim), np.float32)
        parts = [(m, self.shards[i].gather.remote(ids[m])) for i, m in self._masks(ids)]
        matched = 0
        for (m, _), res in zip(parts, ray.get([r for _, r in parts])):
            out[m] = res
            matched += int(m.sum())
        if matched != len(ids):
            # an unmatched id would otherwise return uninitialized memory
            bad = ids[(ids < 0) | (ids >= self.num_rows)]
            raise IndexError(f"ids outside [0, {self.num_rows}): {bad[:5]}...")
        return out

    def update(self, rows: np.ndarray, grads: np.ndarray) -> None:
        rows = np.asarray(rows, np.int64)
        grads = grads.astype(np.float32, copy=False)
        # validate BEFORE any submission: a post-hoc check would leave a
        # half-applied step in the store (breaking dense bit-parity for
        # callers that catch and continue)
        parts = list(self._masks(rows))
        if sum(int(m.sum()) for _, m in parts) != len(rows):
            bad = rows[(rows < 0) | (rows >= self.num_rows)]
            raise IndexError(f"update rows outside [0, {self.num_rows}): {bad[:5]}...")
        for i, m in parts:
            self._pending.append(self.shards[i].update.remote(rows[m], grads[m]))
        if len(self._pending) > 512:
            self.sync()

    def sync(self) -> None:
        if self._pending:
            ray.get(self._pending)
            self._pending = []

    def matrix(self) -> np.ndarray:
        """Full dense table — O(num_rows); tests/artifacts at fixture scale
        only.  At scale use to_dataset()/write_parquet_stream()."""
        self.sync()
        return np.concatenate(ray.get([s.snapshot.remote() for s in self.shards]))

    def to_dataset(
        self,
        ids: np.ndarray | None = None,
        *,
        normalize: bool = False,
        id_col: str = "ent_id",
        vec_col: str = "vec",
    ) -> ray.data.Dataset:
        """One Arrow block per shard (optionally row-subset / normalized) —
        the embedding table as a Dataset without any dense concat."""
        import ray.data

        self.sync()
        refs = []
        for i, sh in enumerate(self.shards):
            sub = None
            if ids is not None:
                gids = np.asarray(ids, np.int64)
                m = (gids >= self.starts[i]) & (gids < self.stops[i])
                if not m.any():
                    continue
                sub = gids[m]
            refs.append(
                sh.block.remote(sub, normalize=normalize, id_col=id_col, vec_col=vec_col)
            )
        return ray.data.from_arrow_refs(refs)

    def write_parquet_stream(self, path: str, *, id_col: str = "id", vec_col: str = "vec") -> None:
        """Write the table to one Parquet file, one row group per shard,
        never holding more than a shard in memory."""
        import pyarrow.parquet as pq

        self.sync()
        writer = None
        try:
            for sh in self.shards:
                tbl = ray.get(sh.block.remote(None, id_col=id_col, vec_col=vec_col))
                if writer is None:
                    writer = pq.ParquetWriter(path, tbl.schema)
                writer.write_table(tbl)
        finally:
            if writer is not None:
                writer.close()
