"""Exact distributed quantiles by global sort + positional block lookup.

Scale shape: ONE all-to-all (the sort — which materializes its output by
nature); afterwards no full pass is made.  Target global positions are
located with per-block row counts read from BLOCK METADATA only, and just
the handful of blocks that contain a target position are fetched to the
driver (k blocks for k quantiles, not the dataset).  At 100 TB the driver
holds k rows.

The selection rule is lower-interpolation on the 0-based sorted index:
``value at floor(p * (n - 1))`` — exactly replayable in SQL with
``ROW_NUMBER() - 1`` (the DuckDB oracle in queries.py does), and
insensitive to tie ORDER among equal values since only the value at the
position is reported.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray
import ray.data


def with_global_rank(
    ds: ray.data.Dataset,
    keys: list[str],
    *,
    rank_col: str = "rank",
    descending: bool = False,
) -> ray.data.Dataset:
    """Exact 0-based global rank by ``keys`` appended as ``rank_col``.

    Scale shape: ONE all-to-all (Ray Data's range-partitioned sort); global
    offsets come from per-block row counts in BLOCK METADATA only, and each
    block gets its rank column appended by a remote task on the worker that
    holds it — no block ever reaches the driver (the driver holds one int
    per block).  Ties across equal key tuples get an arbitrary order, so
    pass a unique tiebreaker (an id) for a deterministic result — then the
    rank replays SQL ``ROW_NUMBER() OVER (ORDER BY keys) - 1`` exactly.
    This is the primitive behind deterministic global shuffles (rank by a
    splitmix64 hash) and exact NTILE bucketing.
    """
    sorted_mat = ds.sort(keys, descending=descending).materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in sorted_mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            # skip empty blocks: a zero-row block out of an empty sort
            # partition can carry a ZERO-COLUMN schema, and from_arrow_refs
            # would infer the output schema from it (rank-only); offsets
            # are unaffected (the block contributes 0 rows)
            if meta.num_rows == 0:
                continue
            refs.append(ref)
            counts.append(meta.num_rows)
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    @ray.remote
    def _append(block, off: int):
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        return tbl.replace_schema_metadata(None).append_column(
            rank_col, pa.array(np.arange(off, off + len(tbl), dtype=np.int64))
        )

    out = [_append.remote(r, int(o)) for r, o in zip(refs, offs[:-1])]
    return ray.data.from_arrow_refs(out)


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    probs: dict[str, float],
    *,
    descending: bool = False,
) -> pa.Table:
    """-> pa.Table(q, <col>) with one row per entry of ``probs`` (sorted by
    label).  ``probs`` maps label -> p in [0, 1]."""
    sorted_mat = ds.sort(col, descending=descending).materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in sorted_mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
    n = int(sum(counts))
    if n == 0:
        raise ValueError("exact_quantiles over an empty dataset")
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    wanted = {label: int(np.floor(p * (n - 1))) for label, p in probs.items()}
    by_block: dict[int, list[tuple[str, int]]] = defaultdict(list)
    for label, pos in wanted.items():
        b = int(np.searchsorted(offs, pos, side="right") - 1)
        by_block[b].append((label, pos - int(offs[b])))

    # fetch ONLY the blocks that hold a target position (k of them)
    blocks = dict(zip(by_block, ray.get([refs[b] for b in by_block])))
    out: list[tuple[str, object]] = []
    for b, items in by_block.items():
        block = blocks[b]
        tbl = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        for label, local in items:
            out.append((label, tbl[col][local].as_py()))
    out.sort(key=lambda t: t[0])
    return pa.table(
        {
            "q": pa.array([label for label, _ in out], pa.string()),
            col: pa.array([v for _, v in out]),
        }
    )
