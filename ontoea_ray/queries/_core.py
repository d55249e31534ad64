"""Driver-checkable operator queries + DuckDB oracle SQL.

Every entry in QUERIES is a callable ``sf_dir -> Dataset|DataFrame|Table``;
ORACLE_SQL holds the equivalent ANSI SQL for the SQL-expressible ones (the
driver registers views named region nation customer supplier part orders
lineitem events documents embeddings).  Column names and dtypes are matched
deliberately: float aggregates are integer-ized (cents / milli) so the
order-insensitive value hash is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
import ray.data
from ray.data.aggregate import Count, Sum

from ontoea_ray.functions.shuffle import compact


_KG_EDGE_CACHE: dict = {}


def _kg_cached(sf_dir: str):
    """Materialized flagship edge table, one per sf_dir per session — a
    materialized VIEW: a dozen KG-analytics queries derive from the same
    edge table, and recomputing the flagship inside each one measures the
    flagship, not the operator.  The handle lives on the driver; the
    blocks live in the (spillable) object store.  q_kg_construct itself
    never uses the cache — it IS the flagship measurement."""
    ds = _KG_EDGE_CACHE.get(sf_dir)
    if ds is None:
        from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

        ds = _KG_EDGE_CACHE[sf_dir] = kg_construct_pipeline(sf_dir).materialize()
    return ds


QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _register(name: str, sql: str | None = None):
    def deco(fn):
        # dict registration is silent on duplicates — a second @_register
        # with the same name would SHADOW the first query and its oracle
        # without any test failing (it happened: q_hash_split)
        assert name not in QUERIES, f"duplicate query registration: {name}"
        QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _read(sf_dir: str, table: str, columns=None) -> ray.data.Dataset:
    # - metadata-free schema: blocks carry no writer (pandas) dict metadata,
    #   so wide ops don't log schema-dedup warnings / re-unify per block
    # - block count sized from the FILE, not the default cpus*2 floor: a
    #   4 MB table split into 64 x 65 KB blocks makes every downstream
    #   sort/groupby pay barrier cost per block (measured 2.5s -> 0.4s on a
    #   40k-row exchange); at real scale the bytes term dominates and the
    #   count grows with the data exactly as before
    import os

    path = f"{sf_dir}/{table}.parquet"
    schema = pq.read_schema(path).remove_metadata()
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    est_mem = os.path.getsize(path) * 4  # parquet -> in-memory expansion
    target = ray.data.DataContext.get_current().target_max_block_size or (16 << 20)
    blocks = max(min(cpus, 8), min(cpus * 2, -(-est_mem // target)))
    return ray.data.read_parquet(
        path, columns=columns, schema=schema, override_num_blocks=blocks
    )


