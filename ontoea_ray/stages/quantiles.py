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
