"""Task-side broadcast assembly with a byte budget.

A broadcast lookup (vocabulary rank table, frequency table, embedding
matrix, BFS frontier) must never be assembled ON THE DRIVER: at web scale
the driver is the one process that cannot grow with the data.  The helpers
here concatenate a Dataset's blocks into one Arrow value INSIDE a Ray task
(the blocks stay in the object store end-to-end; workers ``ray.get`` the
result zero-copy), and report when the table exceeds a byte budget so the
caller can switch to its distributed (exploded-join / Bloom-semi-join)
plan instead of broadcasting at all.

Budget knob: ``ONTOEA_BROADCAST_BUDGET_BYTES`` (default 256 MiB — a
per-node object-store copy of the small side; tests set it to 1 to force
every caller's distributed path).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

DEFAULT_BROADCAST_BUDGET_BYTES = 256 << 20


def broadcast_budget_bytes() -> int:
    env = os.environ.get("ONTOEA_BROADCAST_BUDGET_BYTES")
    return int(env) if env else DEFAULT_BROADCAST_BUDGET_BYTES


@ray.remote
def _concat_blocks(columns, *tbls: pa.Table) -> pa.Table:
    # zero-row blocks from empty exchange partitions carry a zero-column
    # schema — skip them or concat_tables raises on the mismatch
    keep = [t if columns is None else t.select(columns) for t in tbls if t.num_columns > 0]
    if not keep:
        return pa.table({})
    return pa.concat_tables(keep).combine_chunks()


def assemble_table_ref(
    ds: ray.data.Dataset,
    *,
    columns: list[str] | None = None,
    budget: int | None = None,
) -> tuple[ray.data.Dataset, "ray.ObjectRef | None"]:
    """Materialize ``ds``; if its bytes fit the budget, return an object
    ref to ONE concatenated Arrow table of ``columns`` (assembled in a Ray
    task — the driver never holds a row).

    Returns ``(materialized_ds, table_ref_or_None)``: a ``None`` ref means
    the table is over budget and the caller must run its distributed plan
    against the returned (already-materialized) dataset."""
    if not isinstance(ds, ray.data.dataset.MaterializedDataset):
        ds = ds.materialize()
    budget = broadcast_budget_bytes() if budget is None else budget
    sz = ds.size_bytes()
    if sz is not None and sz > budget:
        return ds, None
    return ds, _concat_blocks.remote(columns, *ds.to_arrow_refs())


def assemble_value_set_ref(
    ds: ray.data.Dataset,
    column: str,
    *,
    budget: int | None = None,
) -> tuple[ray.data.Dataset, "ray.ObjectRef | None"]:
    """Like :func:`assemble_table_ref` but reduces to the DISTINCT values
    of one column (an ``pc.is_in`` value set).  Used for broadcast
    semi-joins (BFS frontiers, candidate-involved ids)."""
    if not isinstance(ds, ray.data.dataset.MaterializedDataset):
        ds = ds.materialize()
    budget = broadcast_budget_bytes() if budget is None else budget
    sz = ds.size_bytes()
    if sz is not None and sz > budget:
        return ds, None

    try:
        empty_type = ds.schema().base_schema.field(column).type
    except Exception:
        empty_type = pa.string()

    @ray.remote
    def _distinct(*tbls: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        chunks = [t[column].combine_chunks() for t in tbls if t.num_columns > 0]
        if not chunks:
            # typed from the dataset schema — a hardcoded string here
            # breaks is_in against int-keyed callers
            return pa.array([], empty_type)
        uniq = pc.unique(pa.chunked_array(chunks))
        return uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq

    return ds, _distinct.remote(*ds.to_arrow_refs())
