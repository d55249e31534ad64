"""Z-order (Morton) data layout — the multi-dimensional clustering
primitive behind scan pruning on huge tables (Delta/Iceberg `OPTIMIZE
ZORDER BY`): rows sorted by the bit-interleaving of two bucketed key
columns land so that any 2-D key-range predicate touches a small, bounded
set of contiguous tiles, letting a reader prune by per-file/ per-tile
min-max stats on BOTH columns at once (a 1-D sort can only prune one).

Everything is integer arithmetic, so layout decisions are bit-replayable:

- bucket: ``(v - mn) * 2^bits // (mx - mn + 1)`` maps each column onto
  ``[0, 2^bits)`` (equi-width; mn/mx are two scalar aggregates — O(1)
  driver state, the same footprint as a parquet footer read);
- z-value: bit interleave ``x0 y0 x1 y1 ...`` (x in even positions);
- tile: the top ``2*tile_bits`` z bits = a 2^tile_bits × 2^tile_bits grid
  cell; sorting by z makes tiles contiguous runs, so "write one file per
  tile" gives each file a tight 2-D bounding box.

``zorder_value`` is a pure vectorized row function (zero shuffle);
the one wide op a real re-layout needs is the final ``sort(zv)`` /
partitioned write, which callers own.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data


def compaction_plan(
    sizes: ray.data.Dataset,
    *,
    key_cols: list[str],
    bytes_col: str,
    target_bytes: int,
    out_col: str = "bucket",
) -> ray.data.Dataset:
    """Small-file compaction planner — the table-maintenance op every
    partitioned 100 TB store needs (Iceberg/Delta `rewrite_data_files`):
    given a manifest of (partition keys, bytes), assign each partition to
    an output bucket by key-ordered cumulative START offset,
    ``bucket = cum_bytes_before // target_bytes`` — key order is preserved
    (range reads stay contiguous), no bucket splits a partition, and the
    bucket count is bounded by ``total_bytes // target + 1`` (an individual
    bucket can fall under target when a large neighbour spills past a
    boundary; the COUNT bound is what compaction is for).

    The ORDERED prefix sum runs inside ONE Ray task over the assembled
    manifest: the planner's input is file-manifest-scale (O(#files), like
    an Iceberg manifest list), never data-scale — callers aggregate sizes
    from the data FIRST (combiner + one keyed exchange), so what reaches
    this step is metadata.  Raises if the manifest itself exceeds the
    broadcast budget (at that point the store needs manifest sharding, a
    different design).
    """
    from ontoea_ray.functions.broadcast import assemble_table_ref

    _, tbl_ref = assemble_table_ref(sizes, columns=[*key_cols, bytes_col])
    if tbl_ref is None:
        raise NotImplementedError(
            "compaction_plan: manifest exceeds the broadcast budget — shard "
            "the manifest (per top-level key) before planning"
        )

    @ray.remote
    def _plan(tref) -> pa.Table:
        import pyarrow.compute as pc

        t = tref if not isinstance(tref, ray.ObjectRef) else ray.get(tref)
        idx = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in key_cols])
        t = t.take(idx)
        b = np.asarray(t[bytes_col].combine_chunks(), np.int64)
        cum_before = np.concatenate([[0], np.cumsum(b)[:-1]])
        return t.append_column(
            out_col, pa.array(cum_before // target_bytes, pa.int64())
        )

    return ray.data.from_arrow_refs([_plan.remote(tbl_ref)])


def interleave_bits(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Morton code of two ``[0, 2^bits)`` int arrays (x in even bits)."""
    z = np.zeros(len(x), np.int64)
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def column_ranges(
    ds: ray.data.Dataset, cols: list[str]
) -> dict[str, tuple[int, int]]:
    """(min, max) per column — two scalars each, via one distributed
    aggregate (O(1) driver state)."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"_mn_{c}"), Max(c, alias_name=f"_mx_{c}")]
    row = ds.aggregate(*aggs)
    return {c: (int(row[f"_mn_{c}"]), int(row[f"_mx_{c}"])) for c in cols}


def zorder_value(
    ds: ray.data.Dataset,
    *,
    x_col: str,
    y_col: str,
    ranges: dict[str, tuple[int, int]],
    bits: int = 8,
    out_col: str = "zv",
) -> ray.data.Dataset:
    """Append the Morton code of the two bucketed key columns."""
    mnx, mxx = ranges[x_col]
    mny, mxy = ranges[y_col]
    width = 1 << bits

    def fn(b: pa.Table) -> pa.Table:
        x = np.asarray(b[x_col].combine_chunks(), np.int64)
        y = np.asarray(b[y_col].combine_chunks(), np.int64)
        bx = (x - mnx) * width // (mxx - mnx + 1)
        by = (y - mny) * width // (mxy - mny + 1)
        return b.append_column(out_col, pa.array(interleave_bits(bx, by, bits)))

    return ds.map_batches(fn, batch_format="pyarrow")


def sample_range_bounds(
    ds,
    *,
    col: str,
    key_col: str,
    n_ranges: int,
    denom: int = 50,
) -> np.ndarray:
    """Sample-sort range boundaries: n_ranges - 1 split values of ``col``
    from a deterministic splitmix64(key) % denom == 0 row sample.

    The sample-sort primitive behind every distributed range partitioner
    (TeraSort, Spark's RangePartitioner): boundaries need only BALANCE the
    ranges, so a bounded sample suffices — pick ``denom`` so n / denom is
    a single-task sort (e.g. ~64k rows; at 100 TB that means denom grows
    with the data, the boundary count does not).  The sample is hash-
    deterministic (reproducible, SQL-replayable), the boundary rule is the
    integer index (i * (m - 1)) // n_ranges over the sorted sample, and
    the returned array is (n_ranges - 1) scalars — the only driver state.
    """
    import pyarrow as pa

    from ontoea_ray.stages.sampling import splitmix64

    def keep(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(keys.view(np.uint64)) % np.uint64(denom)
        return batch.filter(pa.array(h == 0)).select([col])

    sample = ds.map_batches(keep, batch_format="pyarrow").repartition(1)

    def bounds(batch: pa.Table) -> pa.Table:
        v = np.sort(batch[col].to_numpy(zero_copy_only=False))
        m = len(v)
        if m == 0:
            # degenerate: no sampled rows -> no boundaries, every row
            # lands in range 0 (matches the SQL oracle's NULL-bounds case)
            return pa.table({"b": pa.array([], pa.int64())})
        idx = [(i * (m - 1)) // n_ranges for i in range(1, n_ranges)]
        return pa.table({"b": pa.array(v[idx].astype(np.int64))})

    rows = sample.map_batches(bounds, batch_format="pyarrow").take_all()
    return np.array([r["b"] for r in rows], np.int64)


def range_partition_stats(
    ds,
    *,
    col: str,
    key_col: str,
    n_ranges: int,
    denom: int = 50,
):
    """Per-range row count + value bounds under sample-sort boundaries —
    exactly the statistics a range exchange (distributed sort, range-
    partitioned write) is planned from.  range_id = #boundaries < value
    (searchsorted left), so every row lands in exactly one range and the
    assignment is a pure broadcast-lookup map: no shuffle beyond the final
    per-range aggregate, whose key space IS n_ranges."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.tables import from_pandas as _fp

    b = sample_range_bounds(
        ds, col=col, key_col=key_col, n_ranges=n_ranges, denom=denom
    )
    b_ref = ray.put(b)

    def assign(batch: pa.Table) -> pa.Table:
        bounds = ray.get(b_ref)
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        rid = np.searchsorted(bounds, v, side="left").astype(np.int64)
        df = pd.DataFrame({"range_id": rid, "v": v})
        g = df.groupby("range_id", sort=False).agg(
            n_rows=("v", "size"), min_v=("v", "min"), max_v=("v", "max")
        ).reset_index()
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return _fp(g)

    parts = ds.map_batches(assign, batch_format="pyarrow")
    return keyed_aggregate(
        parts, ["range_id"], sums=["n_rows"], mins=["min_v"], maxs=["max_v"]
    )
