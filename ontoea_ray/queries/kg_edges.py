"""Queries: kg_edges (split from the former single-module registry)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ontoea_ray.functions.shuffle import compact
from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
from ontoea_ray.queries._core import ORACLE_SQL, QUERIES, _kg_cached, _read, _register


# KG-flavored relational: edge table from the star schema
# ---------------------------------------------------------------------------

@_register(
    "q_edge_counts",
    """
    WITH edges AS (
      SELECT DISTINCT 'cust/' || o_custkey AS subj, 'placed' AS pred, 'order/' || o_orderkey AS obj
      FROM orders
      UNION ALL
      SELECT DISTINCT 'order/' || l_orderkey, 'contains', 'part/' || l_partkey FROM lineitem
      UNION ALL
      SELECT DISTINCT 'supp/' || s_suppkey, 'located_in', 'nation/' || n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
    )
    SELECT pred, COUNT(*) AS n_edges FROM edges GROUP BY pred
    """,
)
def q_edge_counts(sf_dir: str):
    """Materialize a (subj, pred, obj) edge table from the relational star
    schema (union + distinct + broadcast join) and count edges per
    predicate — the relational analog of the flagship's edge sink."""

    def o_edges(batch: pa.Table) -> pa.Table:
        subj = pc.binary_join_element_wise("cust/", pc.cast(batch["o_custkey"].combine_chunks(), pa.string()), "")
        obj = pc.binary_join_element_wise("order/", pc.cast(batch["o_orderkey"].combine_chunks(), pa.string()), "")
        return pa.table({"subj": subj, "pred": pa.array(["placed"] * len(batch)), "obj": obj})

    def l_edges(batch: pa.Table) -> pa.Table:
        subj = pc.binary_join_element_wise("order/", pc.cast(batch["l_orderkey"].combine_chunks(), pa.string()), "")
        obj = pc.binary_join_element_wise("part/", pc.cast(batch["l_partkey"].combine_chunks(), pa.string()), "")
        return pa.table({"subj": subj, "pred": pa.array(["contains"] * len(batch)), "obj": obj})

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist()))
    nref = ray.put(nmap)

    def s_edges(batch: pa.Table) -> pa.Table:
        nm = ray.get(nref)
        subj = pc.binary_join_element_wise("supp/", pc.cast(batch["s_suppkey"].combine_chunks(), pa.string()), "")
        obj = pa.array([f"nation/{nm[k]}" for k in batch["s_nationkey"].to_pylist()], pa.string())
        return pa.table({"subj": subj, "pred": pa.array(["located_in"] * len(batch)), "obj": obj})

    edges = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderkey"]).map_batches(o_edges, batch_format="pyarrow")
        .union(_read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(l_edges, batch_format="pyarrow"))
        .union(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(s_edges, batch_format="pyarrow"))
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        g = df.groupby("pred", sort=False).size().reset_index(name="n_edges")
        return _from_pandas_clean(g)

    # distinct per (subj,pred,obj) requires a full dedup before counting —
    # a 3-column corpus-proportional key, i.e. exactly the case the
    # hash-partitioned keyed_aggregate exists for (the engine's sort-based
    # composite aggregate compares such keys row-by-row)
    from ontoea_ray.functions.shuffle import keyed_aggregate

    distinct = keyed_aggregate(
        edges, ["subj", "pred", "obj"], count_alias="_c"
    ).drop_columns(["_c"])
    return keyed_aggregate(
        distinct.map_batches(partial, batch_format="pyarrow"),
        ["pred"],
        sums=["n_edges"],
    )


@_register(
    "q_region_revenue",
    """
    SELECT r.r_name,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_region_revenue(sf_dir: str):
    """Three-way broadcast join chain (customer -> nation -> region are all
    small sides, composed into ONE driver-built lookup shipped once) +
    partial aggregation."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()))
    r2name = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    cust_region = {
        ck: r2name[n2r[nk]]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cust_region)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = batch.to_pandas()
        df["r_name"] = df["o_custkey"].map(m)
        df["revenue_cents"] = np.round(df["o_totalprice"] * 100).astype(np.int64)
        g = df.groupby("r_name", sort=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_orders=("r_name", "size")
        ).reset_index()
        return _from_pandas_clean(g)

    return (
        compact(orders.map_batches(partial, batch_format="pyarrow"))
        .groupby("r_name")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_orders", alias_name="n_orders"))
    )


@_register(
    "q_distinct_counts",
    """
    SELECT COUNT(DISTINCT p_brand) AS n_brands,
           COUNT(DISTINCT p_type) AS n_types,
           COUNT(DISTINCT p_size) AS n_sizes
    FROM part
    """,
)
def q_distinct_counts(sf_dir: str):
    """Distinct-count aggregate via per-batch unique partials + final merge
    (the vocab/KG-stats pattern: ds.unique at scale)."""
    ds = _read(sf_dir, "part", ["p_brand", "p_type", "p_size"])
    n_brands = len(ds.unique("p_brand"))
    n_types = len(ds.unique("p_type"))
    n_sizes = len(ds.unique("p_size"))
    return pa.table(
        {
            "n_brands": pa.array([n_brands], pa.int64()),
            "n_types": pa.array([n_types], pa.int64()),
            "n_sizes": pa.array([n_sizes], pa.int64()),
        }
    )


@_register(
    "q_group_topk",
    """
    SELECT l_orderkey, l_partkey, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT l_orderkey, l_partkey,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY CAST(ROUND(l_extendedprice * 100) AS BIGINT) DESC,
                        l_partkey ASC, l_linenumber ASC) AS rnk
      FROM lineitem
    ) WHERE rnk <= 2
    """,
)
def q_group_topk(sf_dir: str):
    """Per-group top-k (top-2 parts per order by price): hash-partitioned
    blockwise processing via the pkey pattern — no per-group task.

    Combiner: each block first keeps only ITS top-2 rows per group (a
    correct superset of the global top-2), so the keyed exchange moves at
    most 2×groups-per-block rows instead of every row — at 100 TB this
    prunes the shuffle by the per-group fan-in factor."""
    from ontoea_ray.functions.shuffle import with_partition_key

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_extendedprice", "l_linenumber"])

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["l_orderkey", "cents", "l_partkey", "l_linenumber"],
            ascending=[True, False, True, True], kind="mergesort",
        )
        df["rnk"] = df.groupby("l_orderkey", sort=False).cumcount() + 1
        return df[df["rnk"] <= 2]

    def prune_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        return _rank(df)[["l_orderkey", "l_partkey", "l_linenumber", "cents"]]

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        return _rank(df)[["l_orderkey", "l_partkey", "rnk"]]

    pruned = ds.map_batches(prune_block, batch_format="pandas")
    parted = with_partition_key(pruned, ["l_orderkey"])
    return parted.groupby("pkey").map_groups(topk_block, batch_format="pandas")


_INTERLEAVE_SQL = """
    WITH tok AS (
      SELECT doc_id % 2 AS kg, unnest(str_split(text, ' ')) AS token
      FROM documents
    ),
    f AS (SELECT kg, token, COUNT(*) AS freq FROM tok GROUP BY kg, token),
    r AS (SELECT kg, token, freq,
                 ROW_NUMBER() OVER (PARTITION BY kg ORDER BY freq DESC, token DESC) - 1 AS rnk
          FROM f),
    n AS (SELECT
            (SELECT COUNT(*) FROM r WHERE kg = 0) AS n1,
            (SELECT COUNT(*) FROM r WHERE kg = 1) AS n2)
    SELECT r.kg AS kg, r.token AS token,
           CAST(CASE
             WHEN r.kg = 0 AND r.rnk < n.n2 THEN 2 * r.rnk
             WHEN r.kg = 0 THEN 2 * n.n2 + (r.rnk - n.n2)
             WHEN r.kg = 1 AND r.rnk < n.n1 THEN 2 * r.rnk + 1
             ELSE 2 * n.n1 + (r.rnk - n.n1)
           END AS BIGINT) AS id
    FROM r, n
"""


@_register("q_interleaved_ids", _INTERLEAVE_SQL)
def q_interleaved_ids(sf_dir: str):
    """The reference's interleaved two-KG dense-id assignment
    (read.py:64-96) end-to-end over two derived vocabularies (documents
    split by doc_id parity), checked against a pure-SQL restatement."""
    from ontoea_ray.state.ids import interleaved_ids, rank_by_frequency, token_frequencies

    def side(parity: int):
        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        filt = ds.map_batches(
            lambda b, p=parity: b.filter(
                pc.equal(pc.bit_wise_and(b["doc_id"].combine_chunks(), 1), p)
            ),
            batch_format="pyarrow",
        )
        ranked = rank_by_frequency(token_frequencies(filt), key="token")
        return pa.Table.from_pylist(ranked.take_all()).sort_by("rank")

    r1, r2 = side(0), side(1)
    ids1, ids2 = interleaved_ids(r1, r2, key="token")
    rows_kg = [0] * len(ids1) + [1] * len(ids2)
    rows_tok = list(ids1.keys()) + list(ids2.keys())
    rows_id = list(ids1.values()) + list(ids2.values())
    return pa.table(
        {
            "kg": pa.array(rows_kg, pa.int64()),
            "token": pa.array(rows_tok, pa.string()),
            "id": pa.array(rows_id, pa.int64()),
        }
    )


@_register(
    "q_semi_join",
    "SELECT o_orderkey FROM orders WHERE o_orderkey IN (SELECT DISTINCT l_orderkey FROM lineitem)",
)
def q_semi_join(sf_dir: str):
    """Budget-switched semi-join (the remove_unlinked_triples family,
    kgs.py:643-654): orders that have lineitems.  The distinct key
    vocabulary is reduced distributed (per-block distinct + one keyed
    exchange) and assembled INSIDE a Ray task; under the broadcast budget
    it ships as an is_in value set, above it the filter runs Bloom
    pre-prune + exact keyed semi-join — the driver never holds a key."""
    from ontoea_ray.functions.broadcast import assemble_value_set_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    distinct = keyed_aggregate(
        li.map_batches(
            lambda b: pa.table({"l_orderkey": b["l_orderkey"].combine_chunks().unique()}),
            batch_format="pyarrow",
        ),
        ["l_orderkey"],
    ).select_columns(["l_orderkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    distinct, ref = assemble_value_set_ref(distinct, "l_orderkey")
    if ref is not None:

        def filt(batch: pa.Table) -> pa.Table:
            a = ray.get(ref)
            return batch.filter(pc.is_in(batch["o_orderkey"].combine_chunks(), value_set=a))

        return orders.map_batches(filt, batch_format="pyarrow")
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.stages.bloom import bloom_semi_join

    pruned = bloom_semi_join(
        orders, distinct, probe_key="o_orderkey", build_key="l_orderkey", m_bits=1 << 20
    )
    return hash_join(pruned, distinct, on=["o_orderkey"], right_on=["l_orderkey"], how="inner")


@_register(
    "q_anti_join",
    "SELECT o_orderkey FROM orders WHERE o_orderkey NOT IN (SELECT DISTINCT l_orderkey FROM lineitem)",
)
def q_anti_join(sf_dir: str):
    """Budget-switched anti-join: orders with no lineitems.  Broadcast
    inverted is_in under the budget; above it an exact LEFT keyed join
    against the distinct vocabulary (with a match marker) keeps the
    null-marker rows — a Bloom cannot serve an anti-join alone (its false
    positives would DROP real rows), so the exact path is the fallback."""
    from ontoea_ray.functions.broadcast import assemble_value_set_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate

    li = _read(sf_dir, "lineitem", ["l_orderkey"])
    distinct = keyed_aggregate(
        li.map_batches(
            lambda b: pa.table({"l_orderkey": b["l_orderkey"].combine_chunks().unique()}),
            batch_format="pyarrow",
        ),
        ["l_orderkey"],
    ).select_columns(["l_orderkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    distinct, ref = assemble_value_set_ref(distinct, "l_orderkey")
    if ref is not None:

        def filt(batch: pa.Table) -> pa.Table:
            a = ray.get(ref)
            return batch.filter(
                pc.invert(pc.is_in(batch["o_orderkey"].combine_chunks(), value_set=a))
            )

        return orders.map_batches(filt, batch_format="pyarrow")
    from ontoea_ray.functions.join import hash_join

    marked = distinct.map_batches(
        lambda b: b.append_column("_hit", pa.array(np.ones(len(b), np.int8))),
        batch_format="pyarrow",
    )
    j = hash_join(orders, marked, on=["o_orderkey"], right_on=["l_orderkey"], how="left")
    return j.map_batches(
        lambda b: b.filter(pc.is_null(b["_hit"].combine_chunks())).select(["o_orderkey"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
