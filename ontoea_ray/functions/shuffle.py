"""Shuffle-width tuning.

Ray Data's sort-based groupby/aggregate inherits the upstream block count
as its partition count; a combiner output of 64 near-empty blocks then pays
~10s of task/barrier overhead for milliseconds of work.  ``compact()``
repartitions (cheap block move, no row shuffle semantics change) to a width
proportional to the session's CPUs before a wide op, so the shuffle has
O(cpus) partitions regardless of how finely the input was split.  On a
multi-node cluster ``cluster_resources`` grows with the node count, so the
width scales with the cluster exactly like a Spark ``spark.sql.shuffle
partitions`` tuned to cores.

Override with ONTOEA_SHUFFLE_PARTITIONS when a workload needs more
(e.g. very high-cardinality keys on huge inputs).
"""

from __future__ import annotations

import os

import ray
import ray.data


def shuffle_width(lo: int = 2, hi: int | None = None) -> int:
    """Default shuffle partition count: half the cluster's CPUs.

    No fixed upper cap — on a 4N-node cluster ``cluster_resources`` grows
    with the node count and the width must grow with it (a hard cap would
    serialize wide ops at 256 nodes).  Callers can pass ``hi`` to bound a
    specific small exchange; ONTOEA_SHUFFLE_PARTITIONS overrides globally."""
    env = os.environ.get("ONTOEA_SHUFFLE_PARTITIONS")
    if env:
        return max(1, int(env))
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    w = max(lo, cpus // 2)
    return min(w, hi) if hi is not None else w


def sized_width(size_bytes: int | None, *, per_partition_bytes: int = 32 << 20) -> int:
    """Partition width proportional to DATA size, capped by cluster width.

    Shuffling a combiner-sized table (a few MB) across cpus//2 partitions
    pays seconds of task/barrier overhead for milliseconds of work; at
    100 TB the same call returns the full cluster width.  Use for wide ops
    whose input size is known (e.g. a materialized combiner output)."""
    if size_bytes is None:
        return shuffle_width()
    return max(1, min(shuffle_width(), int(size_bytes // per_partition_bytes) + 1))


def _strip_schema_metadata(batch):
    # Parquet files written by pandas carry a b'pandas' dict in the schema;
    # Ray's block-schema dedup can't hash it and warns on every wide op.
    # Zero-copy schema swap.
    return batch.replace_schema_metadata(None)


def compact(ds: ray.data.Dataset, width: int | None = None) -> ray.data.Dataset:
    """Coalesce blocks ahead of a wide op (groupby/sort/aggregate)."""
    return ds.map_batches(_strip_schema_metadata, batch_format="pyarrow").repartition(
        width or shuffle_width()
    )


def with_partition_key(
    ds: ray.data.Dataset, keys: list[str], *, width: int | None = None, col: str = "pkey"
) -> ray.data.Dataset:
    """Append ``col`` = stable_hash(keys) % width.

    ``groupby(col).map_groups(fn)`` then gives width-way key-co-located
    partition processing with ONE fn call per partition — the portable
    alternative to hash-shuffle ``repartition(keys=...)`` (whose aggregator
    actor fleet starves small sessions).  Rows with equal key values always
    share a partition.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    w = width or shuffle_width()

    def add(batch: pa.Table) -> pa.Table:
        acc = np.zeros(len(batch), np.uint64)
        for k in keys:
            vals = batch[k].to_pandas().to_numpy()
            acc = acc * np.uint64(1099511628211) ^ pd.util.hash_array(vals).astype(np.uint64)
        batch = batch.replace_schema_metadata(None)
        return batch.append_column(col, pa.array((acc % np.uint64(w)).astype(np.int64), pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def salted_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
    count_alias: str | None = None,
    salt: int = 16,
    width: int | None = None,
):
    """Two-stage aggregate with explicit hot-key salting (north_rule's hub
    guard, as a reusable operator).

    Stage 1 groups by ``keys + _salt`` (``_salt`` = block-local row index
    mod ``salt`` — deterministic per batch, uniform by construction), so a
    key holding half the corpus lands in ``salt`` different partitions of
    the first exchange instead of one; stage 2 re-aggregates the partials
    (count -> sum of counts) on the true keys, over a table at most
    ``salt × |distinct keys|`` rows.  Every supported aggregate
    (sum/min/max/count) is associative, so the result is bit-equal to the
    unsalted groupby (pytest pins it; q_salted_agg value-checks vs plain
    SQL GROUP BY).

    Note the engine's usual answer to skew is a per-batch combiner fused
    into the scan (canonicalize.py) — strictly stronger than salting; this
    operator covers the cases where a combiner can't run (pre-aggregated
    inputs arriving already keyed, e.g. upserts of per-increment partials
    with a hub entity)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count, Max, Min, Sum

    sums, mins, maxs = list(sums), list(mins), list(maxs)

    def add_salt(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_salt", pa.array(np.arange(len(b), dtype=np.int64) % salt)
        )

    s1_aggs = (
        [Sum(c, alias_name=c) for c in sums]
        + [Min(c, alias_name=c) for c in mins]
        + [Max(c, alias_name=c) for c in maxs]
        + ([Count(alias_name=count_alias)] if count_alias else [])
    )
    partial = (
        compact(ds.map_batches(add_salt, batch_format="pyarrow"), width=width)
        .groupby(keys + ["_salt"])
        .aggregate(*s1_aggs)
    )
    s2_aggs = (
        [Sum(c, alias_name=c) for c in sums]
        + [Min(c, alias_name=c) for c in mins]
        + [Max(c, alias_name=c) for c in maxs]
        + ([Sum(count_alias, alias_name=count_alias)] if count_alias else [])
    )
    return (
        partial.drop_columns(["_salt"])
        .groupby(keys)
        .aggregate(*s2_aggs)
    )


def argmax_by(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    *,
    width: int | None = None,
):
    """Latest/greatest record per key: the full row whose ``order_cols``
    tuple is maximal within each key (the crawl-dedup primitive — newest
    snapshot per url; latest event per user).

    Combiner-first: each batch keeps only its per-key argmax rows (a
    vectorized lexsort + boundary take, no Python rows), so the single
    keyed exchange moves at most ``#blocks x |keys-in-block|`` rows; the
    per-key groups after the shuffle are combiner-sized.  Ties broken by
    the full ``order_cols`` tuple — make it unique (e.g. append an id) for
    a deterministic result."""
    import numpy as np
    import pyarrow as pa

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b
        cols = [
            np.asarray(b[c].to_numpy(zero_copy_only=False)) for c in key_cols + order_cols
        ]
        # lexsort: last key is primary -> sort by (keys..., order...) with
        # order DESCENDING last so the FIRST row of each key run is the max
        order = np.lexsort(tuple(reversed(cols)))
        keys_sorted = [np.asarray(b[c].to_numpy(zero_copy_only=False))[order] for c in key_cols]
        is_last = np.ones(len(b), bool)
        same = np.ones(len(b) - 1, bool)
        for k in keys_sorted:
            same &= k[1:] == k[:-1]
        is_last[:-1] = ~same  # last row of each key run = per-key max
        return b.take(pa.array(order[is_last]))

    part = compact(ds.map_batches(partial, batch_format="pyarrow"), width=width)

    # merge per PARTITION, not per key: one vectorized sort + boundary take
    # over each co-located partition (a per-key map_groups pays a Python
    # call per key — measured 11 s for 20k part keys vs ~1 s this way)
    parted = with_partition_key(part, key_cols, width=width)

    def merge_part(df):
        df = df.sort_values(key_cols + order_cols, kind="mergesort")
        out = df.groupby(key_cols, sort=False).tail(1).drop(columns=["pkey"])
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return parted.groupby("pkey").map_groups(merge_part, batch_format="pandas")


def keyed_aggregate(
    ds: ray.data.Dataset,
    group_cols: list[str],
    *,
    sums: list[str] = (),
    mins: list[str] = (),
    maxs: list[str] = (),
    count_alias: str | None = None,
    width: int | None = None,
):
    """Hash-partitioned multi-key aggregate: per-batch pandas combine, ONE
    int-pkey exchange, per-partition vectorized merge.

    Use instead of ``Dataset.groupby(cols).aggregate(...)`` whenever the
    key is multi-column AND corpus-proportional: Ray's sort-based aggregate
    compares composite keys row-by-row (measured 21 s for 1.3M rows / 1.1M
    groups on a 4-column key; this helper does the identical reduction in
    ~1 s).  For LOW-cardinality keys the engine aggregate is fine and this
    helper buys nothing.  All aggregates here are associative, so partial
    -> merge is exact."""
    import pandas as pd
    import pyarrow as pa

    from ontoea_ray.functions.tables import from_pandas as _fp

    sums, mins, maxs = list(sums), list(mins), list(maxs)
    agg1 = {
        **{c: "sum" for c in sums},
        **{c: "min" for c in mins},
        **{c: "max" for c in maxs},
    }

    def partial(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            # keep the output schema stable for empty blocks (a zero-column
            # table poisons any later concat)
            cols = {c: df[c] for c in group_cols + sums + mins + maxs}
            if count_alias:
                cols[count_alias] = pd.Series([], dtype="int64")
            return _fp(pd.DataFrame(cols))
        gb = df.groupby(group_cols, sort=False)
        out = gb.agg(agg1) if agg1 else pd.DataFrame(index=gb.size().index)
        if count_alias:
            out[count_alias] = gb.size()
        return _fp(out.reset_index())

    parts = compact(ds.map_batches(partial, batch_format="pandas"), width=width)
    parted = with_partition_key(parts, group_cols, width=width)
    agg2 = dict(agg1)
    if count_alias:
        agg2[count_alias] = "sum"

    def merge(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            # pandas dict-agg on an empty frame raises ("No objects to
            # concatenate"); empty partitions (e.g. an empty dataset unioned
            # into the input) reduce to an empty stable-schema table
            needed = group_cols + sums + mins + maxs
            if count_alias:
                needed = needed + [count_alias]
            if all(c in df.columns for c in needed):
                return _fp(df[needed])
            return pa.table({})
        if not agg2:
            # distinct-only reduction (no aggregates): pandas agg({}) raises
            out = df[group_cols].drop_duplicates()
        else:
            out = df.groupby(group_cols, sort=False).agg(agg2).reset_index()
        return _fp(out)

    return parted.groupby("pkey").map_groups(merge, batch_format="pandas")
