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


# ---------------------------------------------------------------------------
# relational core: aggregate / join / sort / window over TPC-H-ish tables
# ---------------------------------------------------------------------------

@_register(
    "q_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(sf_dir: str):
    """Grouped aggregate with per-batch partial pre-aggregation (the
    combiner bounds the shuffle to #blocks × #groups rows)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sum_qty"] = df["l_quantity"].astype(np.int64)
        df["sum_price_cents"] = np.round(df["l_extendedprice"] * 100).astype(np.int64)
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            .agg(sum_qty=("sum_qty", "sum"), sum_price_cents=("sum_price_cents", "sum"), n=("l_quantity", "size"))
            .reset_index()
        )
        return _from_pandas_clean(g)

    return (
        compact(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("n", alias_name="n"),
        )
    )


@_register(
    "q_top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY total_cents DESC, c_custkey ASC
    LIMIT 10
    """,
)
def q_top_customers(sf_dir: str):
    """Broadcast hash join (customer is the small side, shipped once via
    ray.put) + partial aggregation + global top-k."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    name_of = dict(zip(cust["c_custkey"].to_pylist(), cust["c_name"].to_pylist()))
    ref = ray.put(name_of)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["total_cents"] = np.round(df["o_totalprice"] * 100).astype(np.int64)
        g = df.groupby("o_custkey", sort=False)["total_cents"].sum().reset_index()
        return _from_pandas_clean(g)

    from ontoea_ray.functions.shuffle import keyed_aggregate

    # custkey is corpus-proportional: hash-partitioned merge, not the
    # engine's sort-based aggregate
    agg = keyed_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"],
        sums=["total_cents"],
    )

    # global top-10 WITHOUT a sort shuffle: per-block top-k partials
    # (10 × #blocks rows) merged on the driver — the group sums are final
    # after the keyed aggregate, so block-local top-k is safe.
    def part_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(
            ["total_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(10)
        return _from_pandas_clean(df)

    rows = pd.DataFrame(agg.map_batches(part_top, batch_format="pyarrow").take_all())
    rows = rows.sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    names = name_of
    return pa.table(
        {
            "c_custkey": pa.array(rows["o_custkey"].to_numpy(np.int64), pa.int64()),
            "c_name": pa.array([names[k] for k in rows["o_custkey"]], pa.string()),
            "total_cents": pa.array(rows["total_cents"].to_numpy(np.int64), pa.int64()),
        }
    )


@_register(
    "q_events_hourly",
    """
    SELECT event_type,
           CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
    FROM events
    GROUP BY event_type, hour_epoch
    """,
)
def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate (streaming-shaped workload over the
    events log; event-time from ts)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"].combine_chunks(), unit="hour")
        hour_epoch = pc.divide(hour.cast(pa.int64()), 1_000_000)
        vmilli = pc.cast(pc.floor(pc.multiply(batch["value"].combine_chunks(), 1000.0)), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "hour_epoch": hour_epoch.to_numpy(zero_copy_only=False),
                "v": vmilli.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby(["event_type", "hour_epoch"], sort=False).agg(
            n=("v", "size"), sum_value_milli=("v", "sum")
        ).reset_index()
        return _from_pandas_clean(g)

    return (
        compact(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby(["event_type", "hour_epoch"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_value_milli", alias_name="sum_value_milli"))
    )


@_register(
    "q_sessionize",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           CAST(epoch_us(MIN(ts)) // 1000000 AS BIGINT) AS start_epoch
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(sf_dir: str):
    """Session windows (30-min gap) per user via `stages/sessions.
    session_table`: ONE width-bounded keyed exchange, vectorized label +
    aggregate in the same partition pass.  The earlier plan here grouped
    by user_id directly — one map_groups CALL per user, i.e. millions of
    calls at corpus scale; the stage pays one per partition."""
    from ontoea_ray.stages.sessions import session_table

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    sess = session_table(
        ds,
        key_col="user_id",
        ts_col="ts",
        gap_us=30 * 60 * 1_000_000,
        tie_cols=["event_id"],
    )

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "session_id": pc.add(b["session_idx"], 1),
                "n_events": b["n_events"],
                "start_epoch": pc.divide(b["start_us"], 1_000_000),
            }
        )

    return sess.map_batches(shape, batch_format="pyarrow")


@_register(
    "q_asof_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts, CAST(FLOOR(value * 1000) AS BIGINT) AS v
               FROM events WHERE event_type = 'click')
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS ts_epoch_us,
           c.event_id AS click_event_id,
           CAST(epoch_us(c.ts) AS BIGINT) AS click_ts_epoch_us,
           c.v AS click_value_milli
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(sf_dir: str):
    """Backward as-of join (each purchase ↔ the user's latest click at or
    before it) — the custom temporal operator (`stages/temporal.asof_join`):
    one keyed exchange, vectorized merge_asof per partition."""
    from ontoea_ray.stages.temporal import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    purchases = ev.filter(expr="event_type == 'purchase'")
    clicks = ev.filter(expr="event_type == 'click'")

    def milli(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["event_id", "user_id", "ts", "value"]].copy()
        df["click_value_milli"] = np.floor(df.pop("value") * 1000).astype(np.int64)
        return df.rename(columns={"event_id": "click_event_id"})

    joined = asof_join(
        purchases,
        clicks.map_batches(milli, batch_format="pandas"),
        key="user_id",
        on="ts",
        left_cols=["event_id"],
        right_cols=["click_event_id", "click_value_milli"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "event_id": df["event_id"].astype(np.int64),
                "user_id": df["user_id"].astype(np.int64),
            }
        )
        out["ts_epoch_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out["click_event_id"] = df["click_event_id"].astype(np.int64)
        out["click_ts_epoch_us"] = df["ts_r"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        out["click_value_milli"] = df["click_value_milli"].astype(np.int64)
        return out

    return joined.map_batches(finish, batch_format="pandas")


@_register(
    "q_range_join",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts, CAST(FLOOR(value * 1000) AS BIGINT) AS v
               FROM events WHERE event_type = 'click')
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           CAST(epoch_us(p.ts) AS BIGINT) AS ts_epoch_us,
           COUNT(c.v) AS n_clicks,
           CAST(COALESCE(SUM(c.v), 0) AS BIGINT) AS click_value_milli
    FROM p LEFT JOIN c
      ON c.user_id = p.user_id AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def q_range_join(sf_dir: str):
    """Range-join aggregate (clicks per user in the hour before each
    purchase) via `stages/temporal.range_join_agg` — a difference of two
    as-of lookups into running totals, no left×right row explosion."""
    from ontoea_ray.stages.temporal import range_join_agg

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])
    purchases = ev.filter(expr="event_type == 'purchase'")

    def milli(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["user_id", "ts", "value"]].copy()
        df["v"] = np.floor(df.pop("value") * 1000).astype(np.int64)
        return df

    clicks = ev.filter(expr="event_type == 'click'").map_batches(milli, batch_format="pandas")
    agg = range_join_agg(
        purchases,
        clicks,
        key="user_id",
        on="ts",
        left_cols=["event_id"],
        val="v",
        lo_offset=pd.Timedelta(hours=-1),
        hi_offset=pd.Timedelta(0),
        count_as="n_clicks",
        sum_as="click_value_milli",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "user_id", "n_clicks", "click_value_milli"]].astype(np.int64)
        out["ts_epoch_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return out[["event_id", "user_id", "ts_epoch_us", "n_clicks", "click_value_milli"]]

    return agg.map_batches(finish, batch_format="pandas")


@_register(
    "q_window_sliding",
    """
    WITH e AS (SELECT event_id, event_type, ts,
                      CAST(FLOOR(value * 1000) AS BIGINT) AS v
               FROM events)
    SELECT event_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS ts_epoch_us,
           COUNT(*) OVER w AS w_n,
           CAST(SUM(v) OVER w AS BIGINT) AS w_sum
    FROM e
    WINDOW w AS (PARTITION BY event_type ORDER BY ts
                 RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_window_sliding(sf_dir: str):
    """Per-type 3-hour sliding sum over every event via
    `stages/temporal.sliding_window_sum` — time-bucket partitioning with a
    window-length halo, the scale shape for low-cardinality window keys."""
    from ontoea_ray.stages.temporal import sliding_window_sum

    ev = _read(sf_dir, "events", ["event_id", "event_type", "ts", "value"])

    def milli(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["event_id", "event_type", "ts", "value"]].copy()
        df["v"] = np.floor(df.pop("value") * 1000).astype(np.int64)
        return df

    win = sliding_window_sum(
        ev.map_batches(milli, batch_format="pandas"),
        part="event_type",
        on="ts",
        val="v",
        window=pd.Timedelta(hours=3),
        keep_cols=["event_id"],
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["event_id", "event_type", "w_n", "w_sum"]].copy()
        out["ts_epoch_us"] = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        return out[["event_id", "event_type", "ts_epoch_us", "w_n", "w_sum"]]

    return win.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
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
# text analysis over documents
# ---------------------------------------------------------------------------

@_register(
    "q_token_counts",
    "SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents",
)
def q_token_counts(sf_dir: str):
    from ontoea_ray.functions.text import token_count

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "n_tokens": token_count(b["text"])}),
        batch_format="pyarrow",
    )


@_register(
    "q_doc_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_text,
           CAST(len(list_filter(str_split(text, ' '),
                t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT) AS n_stopwords
    FROM documents
    """,
)
def q_doc_stats(sf_dir: str):
    from ontoea_ray.functions.text import quality_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        q = quality_stats(b["text"])
        return pa.table({"doc_id": b["doc_id"], "n_chars_text": q["n_chars"], "n_stopwords": q["n_stopwords"]})

    return ds.map_batches(fn, batch_format="pyarrow")


_REP_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    d AS (SELECT doc_id, COUNT(*) AS nd FROM sh GROUP BY doc_id),
    t AS (SELECT doc_id, greatest(len(t) - 2, 1) AS nt FROM toks)
    SELECT t.doc_id,
           CAST(t.nt AS BIGINT) AS n_shingles,
           CAST(d.nd AS BIGINT) AS n_distinct_shingles,
           CAST((t.nt - d.nd) * 1000 // t.nt AS BIGINT) AS dup_ngram_milli
    FROM t JOIN d ON t.doc_id = d.doc_id
"""


@_register("q_repetition", _REP_SQL)
def q_repetition(sf_dir: str):
    """Duplicate-3-gram repetition signal per document (Gopher-style
    quality rule), integer milli-units for an exact oracle."""
    from ontoea_ray.functions.text import repetition_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        r = repetition_stats(b["text"].combine_chunks())
        return pa.table({"doc_id": b["doc_id"], **r})

    return ds.map_batches(fn, batch_format="pyarrow")


@_register(
    "q_quality_filter",
    """
    WITH s AS (
      SELECT doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS nt,
             CAST(length(text) AS BIGINT) AS nc,
             CAST(len(list_filter(str_split(text, ' '),
                  t -> t IN ('the','a','of','and','to','in','is','on'))) AS BIGINT) AS ns
      FROM documents)
    SELECT doc_id,
           CAST(nt >= 30 AND nt <= 100000 AS BIGINT) AS ok_len,
           CAST((nc - greatest(nt - 1, 0)) >= 3 * nt
                AND (nc - greatest(nt - 1, 0)) <= 10 * nt AS BIGINT) AS ok_wordlen,
           CAST(ns * 50 >= nt AS BIGINT) AS ok_stopwords,
           CAST(nt >= 30 AND nt <= 100000
                AND (nc - greatest(nt - 1, 0)) >= 3 * nt
                AND (nc - greatest(nt - 1, 0)) <= 10 * nt
                AND ns * 50 >= nt AS BIGINT) AS keep
    FROM s
    """,
)
def q_quality_filter(sf_dir: str):
    """Composite rule-based quality filter (RefinedWeb/Gopher-style): token
    count bounds, mean-word-length bounds (integer cross-multiplied — no
    float compare), stopword presence >= 2%.  Emits per-rule flags + keep."""
    from ontoea_ray.functions.text import quality_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        q = quality_stats(b["text"].combine_chunks())
        nt = q["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        nc = q["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = q["n_stopwords"].to_numpy(zero_copy_only=False).astype(np.int64)
        letters = nc - np.maximum(nt - 1, 0)
        ok_len = (nt >= 30) & (nt <= 100000)
        ok_wordlen = (letters >= 3 * nt) & (letters <= 10 * nt)
        ok_stop = ns * 50 >= nt
        return pa.table({
            "doc_id": b["doc_id"],
            "ok_len": pa.array(ok_len.astype(np.int64), pa.int64()),
            "ok_wordlen": pa.array(ok_wordlen.astype(np.int64), pa.int64()),
            "ok_stopwords": pa.array(ok_stop.astype(np.int64), pa.int64()),
            "keep": pa.array((ok_len & ok_wordlen & ok_stop).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


@_register(
    "q_fingerprint",
    "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
)
def q_fingerprint(sf_dir: str):
    from ontoea_ray.functions.text import fingerprint_md5

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "fp": fingerprint_md5(b["text"])}),
        batch_format="pyarrow",
    )


@_register(
    "q_term_freq",
    """
    SELECT token, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, token DESC) - 1 AS BIGINT) AS rank
    FROM (
      SELECT token, COUNT(*) AS freq
      FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
      GROUP BY token
    )
    """,
)
def q_term_freq(sf_dir: str):
    """Vocabulary frequency + global rank — the reference's sort_elements
    total order (freq desc, uri desc) as a distributed sort + block-offset
    zip-with-index (state/ids.py)."""
    from ontoea_ray.state.ids import rank_by_frequency, token_frequencies

    ds = _read(sf_dir, "documents", ["text"])
    return rank_by_frequency(token_frequencies(ds), key="token")


@_register(
    "q_langid",
    """
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ), scores AS (
      SELECT doc_id,
        COUNT(*) FILTER (WHERE tok IN ('der','die','und','das','nicht','ist','ein')) AS s_de,
        COUNT(*) FILTER (WHERE tok IN ('the','and','of','to','a','in','is')) AS s_en,
        COUNT(*) FILTER (WHERE tok IN ('el','la','que','los','una','es','y')) AS s_es,
        COUNT(*) FILTER (WHERE tok IN ('le','la','et','les','des','un','est')) AS s_fr
      FROM toks GROUP BY doc_id
    )
    SELECT doc_id,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS pred_lang
    FROM scores
    """,
)
def q_langid(sf_dir: str):
    """Stopword-profile language ID; the SQL mirrors predict_lang exactly:
    per-language profile hit counts, argmax with first-max-wins in sorted
    language order (de, en, es, fr), zero hits -> 'und'."""
    from ontoea_ray.functions.text import predict_lang

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "pred_lang": predict_lang(b["text"])}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

@_register(
    "q_dedup_exact",
    "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
)
def q_dedup_exact(sf_dir: str):
    from ontoea_ray.stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds).select_columns(["doc_id"])


_CROSS_DUP_N = 8

_CROSS_DUP_SQL = f"""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= {_CROSS_DUP_N}
                  THEN [array_to_string(t[i : i + {_CROSS_DUP_N - 1}], ' ')
                        FOR i IN range(1, len(t) - {_CROSS_DUP_N - 2})]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s),
    d AS (SELECT sh.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct,
                 CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
          FROM sh JOIN df USING (s) GROUP BY 1)
    SELECT doc_id, n_distinct, n_dup,
           CAST(n_dup * 1000 // n_distinct AS BIGINT) AS dup_milli
    FROM d
"""


@_register("q_cross_dup_spans", _CROSS_DUP_SQL)
def q_cross_dup_spans(sf_dir: str):
    """CROSS-document duplicated-span fraction per doc — the token-window
    form of exact-substring dedup (Lee et al. ACL 2022), distinct from
    q_repetition's WITHIN-doc signal: an 8-token span is duplicated when
    the identical span occurs in any other document.  Combiner-first:
    distinct (doc, span) explode with per-doc counts carried in-batch, one
    span-keyed exchange flags doc-frequency >= 2, per-doc keyed sum."""
    from ontoea_ray.stages.dedup import cross_doc_dup_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return cross_doc_dup_spans(ds, n=_CROSS_DUP_N)


_TILE_DEDUP_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    tl AS (SELECT doc_id,
                  [{'idx': i - 1, 'tile': array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ')}
                   FOR i IN range(1, CAST(ceil(len(t)/8.0) AS BIGINT) + 1)] AS tiles
           FROM toks),
    tiles AS (SELECT doc_id, u.idx AS tile_idx, u.tile AS tile
              FROM (SELECT doc_id, unnest(tiles) AS u FROM tl)),
    f1 AS (SELECT tile, min(doc_id) AS fdoc FROM tiles GROUP BY tile),
    f2 AS (SELECT ti.tile, ti.doc_id AS fdoc, min(ti.tile_idx) AS fidx
           FROM tiles ti JOIN f1 ON ti.tile = f1.tile AND ti.doc_id = f1.fdoc
           GROUP BY 1, 2),
    flagged AS (
      SELECT ti.doc_id, ti.tile_idx, ti.tile,
             (ti.doc_id = f2.fdoc AND ti.tile_idx = f2.fidx) AS keep
      FROM tiles ti JOIN f2 ON ti.tile = f2.tile)
    SELECT doc_id,
           COALESCE(string_agg(tile, ' ' ORDER BY tile_idx) FILTER (WHERE keep), '') AS clean_text,
           CAST(count(*) AS BIGINT) AS n_tiles,
           CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
    FROM flagged GROUP BY doc_id
"""


_BOILERPLATE_SQL = """
    WITH toks AS (SELECT doc_id, source, str_split(text, ' ') AS t FROM documents),
    tl AS (SELECT doc_id, source,
                  unnest([array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ')
                          FOR i IN range(1, CAST(ceil(len(t)/8.0) AS BIGINT) + 1)]) AS tile
           FROM toks),
    d AS (SELECT source, tile, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM tl GROUP BY 1, 2),
    tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n_total FROM documents GROUP BY 1)
    SELECT d.source, d.tile, d.n_docs,
           CAST(d.n_docs * 1000 // tot.n_total AS BIGINT) AS share_milli
    FROM d JOIN tot USING (source)
    WHERE d.n_docs >= 2
"""


@_register("q_boilerplate_tiles", _BOILERPLATE_SQL)
def q_boilerplate_tiles(sf_dir: str):
    """Per-source template-tile table (boilerplate discovery, the CCNet-
    style cleaning artifact): an 8-token tile appearing in >= 2 distinct
    documents of the same source is template text, reported with its
    doc count and integer-milli share of the source's documents.
    Combiner-first: in-batch distinct (source, tile, doc) collapses to
    per-batch partial counts, one keyed exchange, min_docs filter BEFORE
    the planner-routed totals join."""
    from ontoea_ray.stages.dedup import boilerplate_tiles

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    return boilerplate_tiles(ds, n=8, min_docs=2)


@_register("q_tile_dedup", _TILE_DEDUP_SQL)
def q_tile_dedup(sf_dir: str):
    """Duplicated-tile REMOVAL (a transform, not just a statistic): docs
    chunked into non-overlapping 8-token tiles, a tile duplicated anywhere
    in the corpus survives only at its global first occurrence
    (lexicographic min (doc_id, tile_idx)), surviving tiles re-joined in
    order — exact-substring dedup a la Lee et al. ACL 2022, tile-
    simplified so DuckDB replays the cleaned text byte-for-byte."""
    from ontoea_ray.stages.dedup import dedup_tiles

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup_tiles(ds, n=8)


_SHINGLE_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b
    FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
               JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE c * 1.0 / (sa.sz + sb.sz - c) >= 0.5
"""


@_register("q_jaccard_pairs", _SHINGLE_SQL)
def q_jaccard_pairs(sf_dir: str):
    """Exact 3-gram-shingle Jaccard near-dup pairs at threshold 0.5."""
    from ontoea_ray.stages.dedup import jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_pairs(ds, threshold=0.5, shingle_n=3)


_CONTAINMENT_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(1000 * c // LEAST(sa.sz, sb.sz) AS BIGINT) AS cont_milli
    FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
               JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE 1000 * c // LEAST(sa.sz, sb.sz) >= 500
"""


@_register("q_containment_pairs", _CONTAINMENT_SQL)
def q_containment_pairs(sf_dir: str):
    """Shingle-set CONTAINMENT pairs (Broder 1997's asymmetric measure):
    1000·|A∩B| // min(|A|,|B|) >= 500 — catches a document embedded inside
    a larger one (boilerplate-wrapped reposts, quote farms), which
    symmetric Jaccard misses because the union term drowns the small side.
    Same one-exchange shingle-co-location machinery as q_jaccard_pairs
    (`stages/dedup._pair_intersections`); integer milli-units so the
    oracle replays every value."""
    from ontoea_ray.stages.dedup import containment_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return containment_pairs(ds, threshold_milli=500, shingle_n=3)


_DUP_CLUSTER_SQL = f"""
    WITH RECURSIVE pairs AS ({_SHINGLE_SQL}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.b, r.label FROM edges e JOIN reach r ON r.node = e.a
    )
    SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node
"""


@_register("q_dup_clusters", _DUP_CLUSTER_SQL)
def q_dup_clusters(sf_dir: str):
    """Near-duplicate CLUSTERS: exact-Jaccard pairs (q_jaccard_pairs) closed
    into connected components (component = min doc_id reachable) — the step
    that turns pairwise dedup output into keep-one groups.  Size-adaptive
    closure (stages/graph.connected_components_auto): dup-pair graphs are
    usually tiny relative to the corpus, so below the broadcast budget a
    driver union-find replaces ~8 keyed exchanges of pure latency
    (measured 3.1 s for a 256-edge graph); the distributed min-label
    propagation takes over past the budget.  The oracle closes the same
    pair SQL with a recursive CTE (safe here: duplicate clusters are tiny,
    so the closure's accumulated state is bounded)."""
    from ontoea_ray.stages.dedup import jaccard_pairs
    from ontoea_ray.stages.graph import connected_components_auto

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_pairs(ds, threshold=0.5, shingle_n=3)
    cc = connected_components_auto(pairs, src="id_a", dst="id_b")
    return cc.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["component"]}),
        batch_format="pyarrow",
    )


from ontoea_ray.functions.lsh_sql import lsh_neardup_sql, minhash_lsh_candidates_sql


@_register("q_minhash_lsh", minhash_lsh_candidates_sql(num_perm=64, bands=16))
def q_minhash_lsh(sf_dir: str):
    """MinHash-LSH candidate pairs with a FULL value oracle: the whole
    chain (md5[:8] token hashes -> wrap-mod-2^64 shingle fold -> seeded
    (a*h+b) mod M perms -> FNV band keys -> capped buckets) is replayed
    bit-for-bit in DuckDB by `functions.lsh_sql` (constants inlined)."""
    from ontoea_ray.stages.dedup import lsh_candidate_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lsh_candidate_pairs(ds, num_perm=64, bands=16)


@_register("q_lsh_neardup", lsh_neardup_sql(threshold=0.5))
def q_lsh_neardup(sf_dir: str):
    """MinHash-LSH near-duplicates verified by exact shingle Jaccard.
    Full value oracle: LSH candidate SQL (see q_minhash_lsh) intersected
    with the distinct-string-shingle Jaccard >= 0.5 predicate."""
    from ontoea_ray.stages.dedup import lsh_near_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return lsh_near_duplicates(ds, threshold=0.5)


from ontoea_ray.functions.lsh_sql import (
    count_min_topk_sql,
    hll_registers_sql,
    splitmix64_ctes,
)


@_register(
    "q_hash_join",
    """
    SELECT o.o_orderkey, o.o_custkey, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
           CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_hash_join(sf_dir: str):
    """General distributed hash join (functions/join.py): tagged union +
    one keyed exchange + per-partition vectorized pandas merge — the
    engine's portable alternative to Ray's aggregator-actor join."""
    from ontoea_ray.functions.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda b: pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "acctbal_cents": pc.cast(pc.round(pc.multiply(b["c_acctbal"], 100)), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    out = hash_join(orders, cust, on=["o_custkey"], right_on=["c_custkey"], how="inner")
    return out.select_columns(["o_orderkey", "o_custkey", "c_nationkey", "acctbal_cents"])


from ontoea_ray.functions.lsh_sql import bloom_semi_join_sql


@_register(
    "q_bloom_semi_join",
    bloom_semi_join_sql(
        probe_sql="SELECT o_orderkey, o_custkey FROM orders",
        probe_key="o_custkey",
        build_sql="SELECT c_custkey FROM customer WHERE c_acctbal > 5000",
        build_key="c_custkey",
        out_cols="p.o_orderkey, p.o_custkey",
    ),
)
def q_bloom_semi_join(sf_dir: str):
    """Bloom-filter semi-join (large x large, shuffle-free): orders whose
    custkey MAY be a high-balance customer.  The m-bit filter is built in
    one streaming pass, broadcast once, and the probe side filters
    streaming.  Superset semantics (false positives only) — and because
    the oracle rebuilds the same bit set, even the FPs value-hash match."""
    from ontoea_ray.stages.bloom import bloom_semi_join

    probe = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    build = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], 5000)).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    return bloom_semi_join(probe, build, probe_key="o_custkey", build_key="c_custkey")


@_register(
    "q_inverted_postings",
    """
    SELECT doc_id, unnest(t) AS token,
           CAST(unnest(range(1, len(t) + 1)) - 1 AS BIGINT) AS pos
    FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents)
    """,
)
def q_inverted_postings(sf_dir: str):
    """Inverted-index postings (token, doc_id, pos) — the explode an index
    writer hash-partitions by token; vectorized offsets arithmetic."""
    from ontoea_ray.functions.text import postings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return postings(
            b["text"].combine_chunks(),
            np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), np.int64),
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_PREFIX_JACCARD_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
    i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON b.s = a.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT i.id_a, i.id_b
    FROM i JOIN sz sa ON sa.doc_id = i.id_a JOIN sz sb ON sb.doc_id = i.id_b
    WHERE 1500 * i.i >= 500 * (sa.sz + sb.sz)
"""


@_register("q_prefix_jaccard", _PREFIX_JACCARD_SQL)
def q_prefix_jaccard(sf_dir: str):
    """Exact 3-gram-shingle Jaccard >= 0.5 pairs by PREFIX FILTERING
    (`stages/dedup.prefix_jaccard_pairs`, PPJoin family): candidates come
    only from shared rarest-first prefix shingles (sz - ceil(t*sz) + 1 per
    doc), which is provably lossless for J >= t while skipping the hot
    buckets that dominate the naive shingle join; survivors are verified
    exactly on the candidate set only.  Same shingle space and threshold
    as q_jaccard_pairs, so the two plans are directly comparable.  The
    oracle is deliberately the PLAIN all-pairs exact join, so the value
    hash checks losslessness itself — a dropped true pair fails the
    gate."""
    from ontoea_ray.stages.dedup import prefix_jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return prefix_jaccard_pairs(ds, threshold_milli=500, shingle_n=3)


_KWIC_TERMS = ("hash", "join", "sort")

_KWIC_SQL = f"""
    WITH p AS (SELECT doc_id, unnest(t) AS token,
                      CAST(unnest(range(1, len(t) + 1)) - 1 AS BIGINT) AS pos
               FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents)),
    m AS (SELECT doc_id, pos, token FROM p
          WHERE token IN {str(tuple(_KWIC_TERMS))})
    SELECT m.token AS term,
           COALESCE(l.token, '^') AS left_tok,
           COALESCE(r.token, '$') AS right_tok,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM m
    LEFT JOIN p l ON l.doc_id = m.doc_id AND l.pos = m.pos - 1
    LEFT JOIN p r ON r.doc_id = m.doc_id AND r.pos = m.pos + 1
    GROUP BY 1, 2, 3
"""


@_register("q_mention_contexts", _KWIC_SQL)
def q_mention_contexts(sf_dir: str):
    """KWIC mention-context table — the disambiguation-feature extractor
    an entity linker trains its context priors from: for every corpus
    occurrence of a gazetteer term, its (left, right) neighbour tokens
    ('^'/'$' at document edges), reduced to (term, left, right) counts.
    Context gathering is a pure per-batch vectorized index+-1 take over
    the flattened token array (document boundaries masked from the list
    offsets — no positional join, no shuffle of the corpus); only the
    counted context triples reach the one keyed exchange.  The oracle
    takes the positional-postings double self-join form; values must
    agree."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = set(_KWIC_TERMS)

    def contexts(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        flat = toks.flatten().to_pandas().to_numpy(object)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        if len(flat) == 0:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        "term": pd.Series([], dtype=object),
                        "left_tok": pd.Series([], dtype=object),
                        "right_tok": pd.Series([], dtype=object),
                        "n": pd.Series([], dtype=np.int64),
                    }
                )
            )
        starts = np.zeros(len(flat), bool)
        starts[offs[:-1][offs[:-1] < len(flat)]] = True
        ends = np.zeros(len(flat), bool)
        ends[offs[1:][offs[1:] <= len(flat)] - 1] = True
        hit = np.flatnonzero(np.isin(flat, list(terms)))
        left = np.where(starts[hit], "^", flat[np.maximum(hit - 1, 0)])
        right = np.where(ends[hit], "$", flat[np.minimum(hit + 1, len(flat) - 1)])
        df = pd.DataFrame(
            {"term": flat[hit], "left_tok": left, "right_tok": right}
        )
        g = df.groupby(["term", "left_tok", "right_tok"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        ds.map_batches(contexts, batch_format="pyarrow"),
        ["term", "left_tok", "right_tok"],
        sums=["n"],
    )


_PHRASE = ("hash", "join")

_PHRASE_SQL = f"""
    WITH p AS (SELECT doc_id, unnest(t) AS token,
                      CAST(unnest(range(1, len(t) + 1)) - 1 AS BIGINT) AS pos
               FROM (SELECT doc_id, str_split(text, ' ') AS t FROM documents)),
    a AS (SELECT doc_id, pos FROM p WHERE token = '{_PHRASE[0]}'),
    b AS (SELECT doc_id, pos FROM p WHERE token = '{_PHRASE[1]}')
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_phrase
    FROM a JOIN b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
    GROUP BY 1
"""


@_register("q_phrase_search", _PHRASE_SQL)
def q_phrase_search(sf_dir: str):
    """Phrase query over POSITIONAL postings — the search-engine primitive
    an inverted index exists for: find every document containing the exact
    token sequence 'hash join' with its occurrence count.  The plan mirrors
    a real token-partitioned index read: postings explode, PRUNE to the two
    query terms inside the scan (in an indexed store this is a two-term
    read — nothing else leaves storage), ONE doc_id-keyed exchange
    co-locates each doc's surviving positions, and the adjacency intersect
    is one vectorized int64-key isin per partition (key = doc·2^32 + pos,
    collision-free).  Corpus bytes shuffled: only the two terms' postings,
    never the text."""
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.functions.text import postings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    t1, t2 = _PHRASE

    def pruned(b: pa.Table) -> pa.Table:
        p = postings(
            b["text"].combine_chunks(),
            np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), np.int64),
        )
        keep = pc.is_in(p["token"], value_set=pa.array([t1, t2]))
        return p.filter(keep)

    parted = with_partition_key(
        ds.map_batches(pruned, batch_format="pyarrow"), ["doc_id"]
    )

    def intersect(df: pd.DataFrame) -> pa.Table:
        doc = df["doc_id"].to_numpy(np.int64)
        pos = df["pos"].to_numpy(np.int64)
        tok = df["token"].to_numpy(object)
        k1 = (doc[tok == t1] << np.int64(32)) | (pos[tok == t1] + 1)
        k2 = (doc[tok == t2] << np.int64(32)) | pos[tok == t2]
        hit = k2[np.isin(k2, k1)]
        d = hit >> np.int64(32)
        u, n = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_phrase": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return parted.groupby("pkey").map_groups(intersect, batch_format="pandas")


def _corpus_prep_sql():
    from ontoea_ray.pipelines.corpus_prep import corpus_prep_sql

    return corpus_prep_sql(budget=4096, neardup_threshold=0.5)


@_register("q_corpus_prep", _corpus_prep_sql())
def q_corpus_prep(sf_dir: str):
    """End-to-end LLM corpus prep: quality filter -> exact dedup ->
    MinHash-LSH near-dup removal -> token-budget packing, composed as one
    streaming graph with a single CHAINED DuckDB oracle (including the LSH
    SQL replay) — the whole pipeline is value-hash-checked."""
    from ontoea_ray.pipelines.corpus_prep import corpus_prep

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return corpus_prep(ds, budget=4096, neardup_threshold=0.5)


@_register("q_cmin_topk", count_min_topk_sql(k=20, depth=4, width=1024, seed=7))
def q_cmin_topk(sf_dir: str):
    """Count-Min heavy hitters: per-block partial sketches merge through a
    constant-size (depth x width) shuffle; top-20 tokens by sketch
    estimate.  Registers AND estimates are replayed exactly in DuckDB
    (md5 token hashes + seeded perm rows inlined)."""
    from ontoea_ray.stages.sketch import count_min_topk

    ds = _read(sf_dir, "documents", ["text"])
    return count_min_topk(ds, k=20, depth=4, width=1024, seed=7)


@_register("q_hll_registers", hll_registers_sql(p=10))
def q_hll_registers(sf_dir: str):
    """HyperLogLog register table over the distinct whitespace tokens of
    the corpus: bucket = top-10 hash bits, rho = leading-zero rank of the
    rest.  Registers are integers -> exact oracle; the float cardinality
    estimate is derived from them (`stages.sketch.hll_estimate`,
    accuracy pinned in pytest)."""
    from ontoea_ray.stages.sketch import hyperloglog_registers

    ds = _read(sf_dir, "documents", ["text"])
    return hyperloglog_registers(ds, col="text", p=10, tokens=True)


def _join_card_sql(p: int = 6) -> str:
    from ontoea_ray.functions.lsh_sql import _h
    from ontoea_ray.stages.sketch import hll_int_params

    m, num, cap = hll_int_params(p)
    nbits = 64 - p
    rho = (
        f"CASE WHEN h % {1 << nbits} = 0 THEN {nbits + 1}"
        f" ELSE {nbits} - length(bin(CAST(h % {1 << nbits} AS BIGINT))) + 1 END"
    )
    est = (
        f"CAST({num} // ((({m} - COUNT(*)) * ({1 << cap}::BIGINT))"
        f" + SUM(1::BIGINT << ({cap} - LEAST(rho, {cap})))) AS BIGINT)"
    )
    return f"""
    WITH ha AS (SELECT {_h('v')} AS h FROM
                (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS v FROM customer)),
    hb AS (SELECT {_h('v')} AS h FROM
           (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS v FROM orders)),
    ra AS (SELECT CAST(h // {1 << nbits} AS BIGINT) AS bucket,
                  MAX({rho}) AS rho FROM ha GROUP BY 1),
    rb AS (SELECT CAST(h // {1 << nbits} AS BIGINT) AS bucket,
                  MAX({rho}) AS rho FROM hb GROUP BY 1),
    ru AS (SELECT bucket, MAX(rho) AS rho FROM
           (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY 1),
    ea AS (SELECT {est} AS e FROM ra),
    eb AS (SELECT {est} AS e FROM rb),
    eu AS (SELECT {est} AS e FROM ru)
    SELECT ea.e AS e_a_milli, eb.e AS e_b_milli, eu.e AS e_union_milli,
           CAST(GREATEST(ea.e + eb.e - eu.e, 0) AS BIGINT) AS e_intersect_milli
    FROM ea, eb, eu
"""


@_register("q_join_cardinality", _join_card_sql())
def q_join_cardinality(sf_dir: str):
    """Sketch-based join-cardinality estimation (the ANALYZE statistic a
    distributed planner sizes joins with): HLL registers of customer keys
    on each side, merged by register max, give |A|, |B|, |A∪B| and by
    inclusion–exclusion |A∩B| — in one streaming pass per side with a
    <= 2^p-row shuffle, never counting distincts exactly.  Estimates use
    the INTEGER estimator (stages/sketch.hll_int_params: exact 3-decimal
    alpha, rho capped to keep the numerator in int64, one floor division)
    so every value is SQL-replayable; m=64 gives sigma ~ 1.04/8 = 13%,
    the documented sketch tradeoff."""
    from ray.data.aggregate import Max

    from ontoea_ray.stages.sketch import hll_estimate_milli, hyperloglog_registers

    p = 6
    ra = hyperloglog_registers(
        _read(sf_dir, "customer", ["c_custkey"]), col="c_custkey", p=p
    ).materialize()
    rb = hyperloglog_registers(
        _read(sf_dir, "orders", ["o_custkey"]), col="o_custkey", p=p
    ).materialize()
    ru = (
        ra.union(rb)
        .repartition(1)
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
    )

    def fold(label: str):
        from ontoea_ray.stages.sketch import hll_int_params

        _, _, cap = hll_int_params(p)

        def fn(b: pa.Table) -> pa.Table:
            rho = np.asarray(b["rho"].combine_chunks(), np.int64)
            term = (np.int64(1) << (cap - np.minimum(rho, cap))).sum()
            e = hll_estimate_milli(
                np.array([term]), np.array([len(rho)]), p
            )[0]
            return pa.table({"label": pa.array([label]), "e": pa.array([e], pa.int64())})

        return fn

    parts = (
        ra.repartition(1).map_batches(fold("a"), batch_format="pyarrow")
        .union(rb.repartition(1).map_batches(fold("b"), batch_format="pyarrow"))
        .union(ru.repartition(1).map_batches(fold("u"), batch_format="pyarrow"))
    )

    def finish(b: pa.Table) -> pa.Table:
        d = dict(zip(b["label"].to_pylist(), b["e"].to_pylist()))
        inter = max(d["a"] + d["b"] - d["u"], 0)
        return pa.table(
            {
                "e_a_milli": pa.array([d["a"]], pa.int64()),
                "e_b_milli": pa.array([d["b"]], pa.int64()),
                "e_union_milli": pa.array([d["u"]], pa.int64()),
                "e_intersect_milli": pa.array([inter], pa.int64()),
            }
        )

    return parts.repartition(1).map_batches(finish, batch_format="pyarrow")


@_register(
    "q_sample_hash",
    f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT doc_id FROM sm3 WHERE _h % 100 < 10
    """,
)
def q_sample_hash(sf_dir: str):
    """Deterministic 10% sample by splitmix64(doc_id) — reproducible,
    resumable, join-stable (unlike random_sample); exact SQL oracle via
    `functions.lsh_sql.splitmix64_ctes`."""
    from ontoea_ray.stages.sampling import hash_sample

    ds = _read(sf_dir, "documents", ["doc_id"])
    return hash_sample(ds, key_col="doc_id", rate_pct=10)


@_register(
    "q_split_labels",
    f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT doc_id,
           CASE WHEN _h % 100 < 80 THEN 'train'
                WHEN _h % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM sm3
    """,
)
def q_split_labels(sf_dir: str):
    """Deterministic 80/10/10 train/valid/test labels by splitmix64 hash
    range — no shuffle, no coordination, per-row reproducible.  (Renamed
    from q_hash_split: a later LCG audit-aggregate query reused that name
    and dict registration silently shadowed this one.)"""
    from ontoea_ray.stages.sampling import hash_split

    ds = _read(sf_dir, "documents", ["doc_id"])
    return hash_split(ds, key_col="doc_id")


_ZORDER_SQL = """
    WITH st AS (SELECT min(l_partkey) AS mnx, max(l_partkey) AS mxx,
                       min(l_suppkey) AS mny, max(l_suppkey) AS mxy
                FROM lineitem),
    b AS (SELECT l_partkey AS x, l_suppkey AS y,
                 ((l_partkey - mnx) * 256) // (mxx - mnx + 1) AS bx,
                 ((l_suppkey - mny) * 256) // (mxy - mny + 1) AS by
          FROM lineitem, st),
    z AS (SELECT x, y,
                 (SELECT SUM(((bx // (1 << i.i)) % 2) * (1 << (2 * i.i))
                           + ((by // (1 << i.i)) % 2) * (1 << (2 * i.i + 1)))
                  FROM (SELECT unnest(range(8)) AS i) i) AS zv
          FROM b)
    SELECT CAST(zv // 256 AS BIGINT) AS tile,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
           CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
    FROM z GROUP BY 1
"""


@_register("q_zorder_tiles", _ZORDER_SQL)
def q_zorder_tiles(sf_dir: str):
    """Z-order layout audit (`stages/layout.zorder_value`): Morton-code
    every lineitem row on (l_partkey, l_suppkey) bucketed to 8 bits each,
    then reduce to per-TILE (top 8 z bits = a 16x16 grid cell) row counts
    and 2-D bounding boxes — exactly the per-file min-max stats a reader
    would prune with after an `OPTIMIZE ZORDER BY` re-layout (each tile's
    box covers ~1/256 of the key plane, vs a full-width box per file under
    a 1-D sort).  Bucketing is integer equi-width from two scalar
    aggregates (O(1) driver state); the z computation is a pure vectorized
    row function with zero shuffle; the reduction is one combiner-first
    keyed exchange.  The oracle replays bucket, interleave and tile bit
    for bit."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.layout import column_ranges, zorder_value

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    ranges = column_ranges(li, ["l_partkey", "l_suppkey"])
    z = zorder_value(
        li, x_col="l_partkey", y_col="l_suppkey", ranges=ranges, bits=8
    )

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b["l_partkey"].combine_chunks(), np.int64)
        y = np.asarray(b["l_suppkey"].combine_chunks(), np.int64)
        t = np.asarray(b["zv"].combine_chunks(), np.int64) >> 8
        df = pd.DataFrame({"tile": t, "x": x, "y": y})
        g = df.groupby("tile", sort=False).agg(
            n=("x", "size"),
            min_x=("x", "min"), max_x=("x", "max"),
            min_y=("y", "min"), max_y=("y", "max"),
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        z.map_batches(partial, batch_format="pyarrow"),
        ["tile"],
        sums=["n"],
        mins=["min_x", "min_y"],
        maxs=["max_x", "max_y"],
    )


_COMPACT_TARGET = 8192

_COMPACTION_SQL = f"""
    WITH g AS (SELECT source, lang, CAST(SUM(n_chars) AS BIGINT) AS bytes
               FROM documents GROUP BY 1, 2),
    c AS (SELECT source, lang, bytes,
                 COALESCE(SUM(bytes) OVER (ORDER BY source, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM g)
    SELECT source, lang, bytes,
           CAST(cb // {_COMPACT_TARGET} AS BIGINT) AS bucket
    FROM c
"""


@_register("q_compaction_plan", _COMPACTION_SQL)
def q_compaction_plan(sf_dir: str):
    """Small-file compaction plan (`stages/layout.compaction_plan`): treat
    each (source, lang) slice as a 'file' of SUM(n_chars) bytes and assign
    key-ordered output buckets of >= 8 KiB by cumulative start offset —
    the Iceberg/Delta rewrite_data_files planning step.  Sizes reduce
    combiner-first through one keyed exchange (data-scale work); the
    ordered prefix sum then runs in ONE Ray task over the assembled
    manifest, which is O(#files) metadata by construction.  Key order is
    preserved so range reads stay contiguous; the oracle replays the
    window sum."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.layout import compaction_plan

    docs = _read(sf_dir, "documents", ["source", "lang", "n_chars"])
    sizes = keyed_aggregate(
        docs.map_batches(
            lambda b: pa.table(
                {"source": b["source"], "lang": b["lang"], "bytes": b["n_chars"]}
            ),
            batch_format="pyarrow",
        ),
        ["source", "lang"],
        sums=["bytes"],
    )
    return compaction_plan(
        sizes,
        key_cols=["source", "lang"],
        bytes_col="bytes",
        target_bytes=_COMPACT_TARGET,
    )


_RV_SALT = 7_777_777


def _rendezvous_sql(k_old: int = 8, k_new: int = 9) -> str:
    from ontoea_ray.functions.lsh_sql import TWO64

    key = f"((CAST(doc_id AS HUGEINT) * {_RV_SALT} + shard) % {TWO64})"
    parts = ["WITH"]
    for tag, k in (("o", k_old), ("n", k_new)):
        parts.append(
            f"x_{tag} AS (SELECT doc_id, unnest(range({k})) AS shard FROM documents),"
        )
        parts.append(splitmix64_ctes(f"x_{tag}", key, sfx=f"_{tag}") + ",")
        parts.append(
            f"a_{tag} AS (SELECT doc_id, shard FROM"
            f" (SELECT doc_id, shard, ROW_NUMBER() OVER"
            f" (PARTITION BY doc_id ORDER BY _h DESC, shard ASC) AS rn FROM sm3_{tag})"
            f" WHERE rn = 1),"
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        """
    SELECT a_o.shard AS shard,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN a_n.shard <> a_o.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
    FROM a_o JOIN a_n USING (doc_id) GROUP BY 1
    """
    )
    return "\n".join(parts)


@_register("q_rendezvous_shards", _rendezvous_sql())
def q_rendezvous_shards(sf_dir: str):
    """Rendezvous-hashing shard stability audit: every doc assigned under
    K=8 and K=9 shards (stages/sampling.rendezvous_assign — highest-
    random-weight, the stable-partitioning scheme crawl frontiers and
    shard stores use), reduced to per-old-shard key counts and moved-key
    counts.  The HRW property under test: adding a shard moves ONLY the
    keys won by the new shard (~1/9 of each old shard), never a global
    reshuffle.  Assignment is a pure row function (one splitmix pass per
    shard, zero shuffle); the reduction is one combiner-first keyed
    exchange.  The oracle replays both assignments via an exploded
    (doc, shard) splitmix chain + per-doc argmax."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import rendezvous_assign

    ds = _read(sf_dir, "documents", ["doc_id"])
    a8 = rendezvous_assign(ds, key_col="doc_id", n_shards=8, salt=_RV_SALT)
    both = rendezvous_assign(
        a8, key_col="doc_id", n_shards=9, salt=_RV_SALT, out_col="shard9"
    )

    def partial(b: pa.Table) -> pa.Table:
        s8 = np.asarray(b["shard"].combine_chunks(), np.int64)
        s9 = np.asarray(b["shard9"].combine_chunks(), np.int64)
        df = pd.DataFrame({"shard": s8, "n_moved": (s9 != s8).astype(np.int64)})
        g = (
            df.groupby("shard", sort=False)["n_moved"]
            .agg(n_keys="size", n_moved="sum")
            .reset_index()
        )
        g["n_keys"] = g["n_keys"].astype(np.int64)
        g["n_moved"] = g["n_moved"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        both.map_batches(partial, batch_format="pyarrow"),
        ["shard"],
        sums=["n_keys", "n_moved"],
    )


@_register(
    "q_pack_sequences",
    """
    SELECT doc_id,
           CAST(COALESCE(SUM(len(str_split(text, ' ')))
                  OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 4096 AS BIGINT) AS pack_id
    FROM documents
    """,
)
def q_pack_sequences(sf_dir: str):
    """Fixed token-budget sequence packing (pack_id = exclusive prefix
    token count // 4096 in doc_id order) via the distributed prefix-sum in
    `stages.sampling.pack_sequences` — the corpus is touched twice,
    aggregated nowhere."""
    from ontoea_ray.stages.sampling import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = pack_sequences(ds, key_col="doc_id", budget=4096)
    return out.select_columns(["doc_id", "pack_id"])


@_register(
    "q_embed_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.35
    """,
)
def q_embed_neardup(sf_dir: str):
    """Embedding-cosine near-duplicate pairs (exact, cos >= 0.35 — the
    synthetic embeddings are near-random, max pairwise cosine ~0.51, so the
    threshold sits where pairs exist): every block matmuls against the
    broadcast normalized matrix; both sides computed in float64.  The
    LSH-bucketed variant (cosine_neardup_pairs(n_planes>0)) is the 100 TB
    path, recall-tested in pytest against this exact output."""
    from ontoea_ray.stages.ann import cosine_neardup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_neardup_pairs(ds, threshold=0.35)


_CSLS_K = 4

_CSLS_MUTUAL_SQL = f"""
    WITH av AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id % 2 = 0),
    bv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
           FROM embeddings WHERE vec_id % 2 = 1),
    sim AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             list_cosine_similarity(a.v, b.v) AS s
      FROM av a, bv b),
    ra AS (SELECT ia, AVG(s) AS r FROM (
             SELECT ia, s, ROW_NUMBER() OVER
               (PARTITION BY ia ORDER BY s DESC, ib ASC) AS rn FROM sim)
           WHERE rn <= {_CSLS_K} GROUP BY ia),
    cb AS (SELECT ib, AVG(s) AS c FROM (
             SELECT ib, s, ROW_NUMBER() OVER
               (PARTITION BY ib ORDER BY s DESC, ia ASC) AS rn FROM sim)
           WHERE rn <= {_CSLS_K} GROUP BY ib),
    sc AS (SELECT sim.ia, sim.ib, 2 * sim.s - ra.r - cb.c AS csls
           FROM sim JOIN ra ON ra.ia = sim.ia JOIN cb ON cb.ib = sim.ib),
    best_a AS (SELECT ia, ib FROM (
                 SELECT ia, ib, ROW_NUMBER() OVER
                   (PARTITION BY ia ORDER BY csls DESC, ib ASC) AS rn FROM sc)
               WHERE rn = 1),
    best_b AS (SELECT ia, ib FROM (
                 SELECT ia, ib, ROW_NUMBER() OVER
                   (PARTITION BY ib ORDER BY csls DESC, ia ASC) AS rn FROM sc)
               WHERE rn = 1)
    SELECT best_a.ia AS id_a, best_a.ib AS id_b
    FROM best_a JOIN best_b ON best_a.ia = best_b.ia AND best_a.ib = best_b.ib
"""


@_register("q_csls_mutual", _CSLS_MUTUAL_SQL)
def q_csls_mutual(sf_dir: str):
    """Mutual CSLS-top-1 pairs between the even- and odd-id embedding sets
    (`stages/mining.csls_mutual_pairs`) — the bitext-mining / cross-corpus
    alignment primitive: a pair is kept iff each side is the other's best
    candidate under the hubness-corrected score 2·cos − r_k(x) − c_k(y)
    (exact k-NN means, k=4).  Exact all-pairs with NO n×m matrix and NO
    full-side broadcast: per-block tasks stream the other side's blocks
    one at a time (running top-k / argmax state), then one small hash join
    checks mutuality.  The row constant r_k(x) never ships — it cannot
    change its own row's argmax.  The oracle replays the same ranking with
    window functions over the n×m cosine table; ids-only output keeps the
    comparison float-drift-proof."""
    from ontoea_ray.stages.mining import csls_mutual_pairs

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def side(parity: int):
        def fn(b: pa.Table) -> pa.Table:
            ids = np.asarray(b["vec_id"].combine_chunks(), np.int64)
            return b.filter(pa.array(ids % 2 == parity))

        return fn

    a = emb.map_batches(side(0), batch_format="pyarrow")
    b = emb.map_batches(side(1), batch_format="pyarrow")
    return csls_mutual_pairs(a, b, k=_CSLS_K)


@_register(
    "q_simhash",
    # full bit-level oracle: the engine's token hash is md5[:8] (big-endian)
    # precisely so DuckDB can recompute every SimHash value exactly
    """
    WITH tok AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents
    ),
    h AS (
      SELECT doc_id, CAST(('0x' || substr(md5(token), 1, 16)) AS UBIGINT) AS hv
      FROM tok
    ),
    b AS (
      SELECT doc_id, i.bit AS bit,
             SUM(CASE WHEN (hv >> i.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h, (SELECT unnest(range(63)) AS bit) i
      GROUP BY doc_id, i.bit
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (1::UBIGINT << bit) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM b GROUP BY doc_id
    """,
)
def q_simhash(sf_dir: str):
    """64-bit SimHash per document (majority vote over unigram md5 token
    hashes; bit 63 masked off so the value fits int64 — the oracle therefore
    only votes bits 0..62)."""
    from ontoea_ray.stages.dedup import simhash64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash64(ds)


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

@_register(
    "q_ann_topk",
    """
    SELECT vec_id, CAST(rnk AS BIGINT) AS rnk FROM (
      SELECT e.vec_id,
             ROW_NUMBER() OVER (
               ORDER BY list_cosine_similarity(e.embedding,
                        (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                        e.vec_id ASC) AS rnk
      FROM embeddings e
    ) WHERE rnk <= 10
    """,
)
def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 against the vec_id=0 query vector."""
    from ontoea_ray.stages.ann import brute_force_topk

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"].to_pylist()[0], np.float64)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, q[None, :], k=10)
    return out.select(["vec_id", "rnk"])


from ontoea_ray.functions.lsh_sql import ann_lsh_topk_sql


@_register("q_ann_lsh", ann_lsh_topk_sql(k=10, n_planes=8, dim=64, hamming_radius=1))
def q_ann_lsh(sf_dir: str):
    """Index-backed ANN: builds (once per sf_dir, cached under /tmp) the
    bucket-partitioned LSH index, then answers from the index reading only
    the Hamming-adjacent bucket partitions.

    Full value oracle: the seeded hyperplane matrix is inlined into the SQL
    (`functions.lsh_sql.ann_lsh_topk_sql`) — DuckDB recomputes bucket sign
    bits, Hamming-radius candidate pruning and the cosine top-k ranking.
    Approximation is vs brute force (recall pinned in pytest), not
    nondeterminism."""
    import hashlib
    import os

    from ontoea_ray.stages.ann import build_lsh_index, lsh_index_topk

    src = f"{sf_dir}/embeddings.parquet"
    tag = hashlib.blake2b(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}".encode(), digest_size=8
    ).hexdigest()
    index_dir = f"/tmp/ontoea_ann_index/{tag}"
    if not os.path.exists(os.path.join(index_dir, "_meta.json")):
        build_lsh_index(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), index_dir)
    tbl = pq.read_table(src, columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"].to_pylist()[0], np.float64)
    out = lsh_index_topk(index_dir, q[None, :], k=10)
    return out.select(["vec_id", "rnk"])


from ontoea_ray.functions.lsh_sql import ann_ivf_topk_sql


@_register(
    "q_ann_ivf",
    ann_ivf_topk_sql(k=10, n_centroids=16, dim=64, iters=4, scale=1000, nprobe=4),
)
def q_ann_ivf(sf_dir: str):
    """IVF-indexed ANN: integer-k-means coarse quantizer (bounded
    hash-ordered sample, SQL-replayable training — see
    `stages.ann.train_centroids_integer`), table written partitioned by
    nearest-centroid list (once per sf_dir, cached under /tmp), queries
    read only their nprobe lists.

    Full value oracle: DuckDB RE-TRAINS the quantizer (every training step
    is integer-exact and order-independent) and replays list assignment,
    probe selection and the cosine top-k — approximation is vs brute force
    (recall pinned in pytest), not nondeterminism."""
    import hashlib
    import os

    from ontoea_ray.stages.ann import build_ivf_index, ivf_index_topk

    src = f"{sf_dir}/embeddings.parquet"
    tag = hashlib.blake2b(
        f"ivf-int:{os.path.abspath(src)}:{os.path.getmtime(src)}".encode(), digest_size=8
    ).hexdigest()
    index_dir = f"/tmp/ontoea_ann_index/{tag}"
    if not os.path.exists(os.path.join(index_dir, "_meta.json")):
        build_ivf_index(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            index_dir, n_centroids=16, iters=4, quantizer="integer", scale=1000,
        )
    tbl = pq.read_table(src, columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"].to_pylist()[0], np.float64)
    out = ivf_index_topk(index_dir, q[None, :], k=10, nprobe=4)
    return out.select(["vec_id", "rnk"])


from ontoea_ray.functions.lsh_sql import ann_pq_topk_sql


@_register(
    "q_ann_pq",
    ann_pq_topk_sql(k=10, m=4, ksub=8, dim=64, iters=3, scale=1000),
)
def q_ann_pq(sf_dir: str):
    """Product-quantization ANN — the COMPRESSION scale path (LSH/IVF
    prune which rows are read; PQ shrinks what a row costs: ~m bytes per
    vector instead of dim*4, so a 100 TB float32 embedding table answers
    from a ~1.5 TB code table with no raw vectors touched at query time).
    Per-subspace integer k-means codebooks (`stages.ann.
    train_pq_codebooks_integer`), one encode pass cached under /tmp,
    query = integer asymmetric-distance LUT gather.

    Full value oracle: DuckDB RE-TRAINS all m codebooks, re-encodes every
    row and replays the LUT ranking — there is NO float step anywhere, so
    unlike the LSH/IVF oracles even the final ranking hash-matches
    bit-for-bit.  Approximation is vs brute force (recall pinned in
    pytest), not nondeterminism."""
    import hashlib
    import os

    from ontoea_ray.stages.ann import build_pq_index, pq_index_topk

    src = f"{sf_dir}/embeddings.parquet"
    tag = hashlib.blake2b(
        f"pq-int:{os.path.abspath(src)}:{os.path.getmtime(src)}".encode(), digest_size=8
    ).hexdigest()
    index_dir = f"/tmp/ontoea_ann_index/{tag}"
    if not os.path.exists(os.path.join(index_dir, "_meta.json")):
        build_pq_index(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            index_dir, m=4, ksub=8, iters=3, scale=1000,
        )
    tbl = pq.read_table(src, columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"].to_pylist()[0], np.float64)
    out = pq_index_topk(index_dir, q[None, :], k=10)
    return out.select(["vec_id", "rnk", "adist"])


# ---------------------------------------------------------------------------
# flagship pipeline (non-SQL — rows-only driver check; pytest holds the
# oracle-comparison tests)
# ---------------------------------------------------------------------------

@_register("q_multimodal_features")  # binary plumbing — rows-only driver check
def q_multimodal_features(sf_dir: str):
    """Multimodal actor-pool plumbing over the documents table: each doc's
    text bytes stand in as an opaque binary payload (mime image/fake), the
    deterministic fake decoder produces pixels (codec stubbed — none in the
    sandbox) and the REAL vectorized feature kernel reduces them.  Output is
    deterministic per input, so rows+schema are a meaningful check."""
    from ontoea_ray.stages.multimodal import decode_image_stage, image_features_stage

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "payload": batch["text"].combine_chunks().cast(pa.binary()),
            }
        )

    media = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    feats = image_features_stage(decode_image_stage(media, fake=True))

    def summarize(batch: pa.Table) -> pa.Table:
        d = batch["features"].combine_chunks()
        vals = np.asarray(d.flatten().to_numpy(zero_copy_only=False), np.float64).reshape(
            len(batch), d.type.list_size
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "feat_mean_milli": pa.array(
                    np.floor(vals.mean(axis=1) * 1000).astype(np.int64), pa.int64()
                ),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


@_register("q_multimodal_audio")  # binary plumbing — rows-only driver check
def q_multimodal_audio(sf_dir: str):
    """Audio branch of the multimodal plumbing: doc bytes as an opaque
    audio payload, deterministic fake PCM decode (codec stubbed), REAL
    vectorized per-window RMS / zero-crossing feature kernel with integer
    outputs — deterministic per input, so rows+schema are meaningful."""
    from ontoea_ray.stages.multimodal import audio_features_stage, decode_audio_stage

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "payload": batch["text"].combine_chunks().cast(pa.binary()),
            }
        )

    media = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    feats = audio_features_stage(decode_audio_stage(media, fake=True))

    def summarize(batch: pa.Table) -> pa.Table:
        d = batch["features"].combine_chunks()
        vals = np.asarray(
            d.flatten().to_numpy(zero_copy_only=False), np.int64
        ).reshape(len(batch), d.type.list_size)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "rms_sum": pa.array(vals[:, :8].sum(axis=1), pa.int64()),
                "zc_sum": pa.array(vals[:, 8:].sum(axis=1), pa.int64()),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


_FLAGSHIP_SQL = r"""
WITH pages AS (
  SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url, text
  FROM documents
),
tok AS (
  SELECT url, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS i
  FROM (SELECT url, str_split(text, ' ') AS t FROM pages)
),
freq AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
params AS (
  SELECT LEAST(48, GREATEST(1, (2 * COUNT(*)) // 3)) AS n_ent,
         LEAST(12, COUNT(*) - LEAST(48, GREATEST(1, (2 * COUNT(*)) // 3))) AS n_pred
  FROM freq
),
ranked AS (SELECT tok, ROW_NUMBER() OVER (ORDER BY c DESC, tok DESC) AS rnk FROM freq),
ents AS (SELECT tok FROM ranked, params WHERE rnk <= n_ent),
preds AS (SELECT tok FROM ranked, params WHERE rnk > n_ent AND rnk <= n_ent + n_pred),
matches AS (
  SELECT a.url, a.tok AS s_surf, b.tok AS p_tok, c.tok AS o_surf
  FROM tok a
  JOIN tok b ON b.url = a.url AND b.i = a.i + 1
  JOIN tok c ON c.url = a.url AND c.i = a.i + 2
  WHERE a.tok IN (SELECT tok FROM ents)
    AND b.tok IN (SELECT tok FROM preds)
    AND c.tok IN (SELECT tok FROM ents)
),
uricnt AS (
  SELECT lower(regexp_extract(u, '([^/]*)$', 1)) AS ckey, 'kg://ent/' || u AS uri, COUNT(*) AS n
  FROM (SELECT s_surf AS u FROM matches UNION ALL SELECT o_surf FROM matches)
  GROUP BY 1, 2
),
canon AS (
  SELECT ckey, uri AS canonical
  FROM (SELECT ckey, uri, ROW_NUMBER() OVER (PARTITION BY ckey ORDER BY n DESC, uri ASC) AS rn FROM uricnt)
  WHERE rn = 1
),
subbed AS (
  SELECT cs.canonical AS subj, m.p_tok AS pred, co.canonical AS obj, m.url
  FROM matches m
  JOIN canon cs ON cs.ckey = lower(regexp_extract('kg://ent/' || m.s_surf, '([^/]*)$', 1))
  JOIN canon co ON co.ckey = lower(regexp_extract('kg://ent/' || m.o_surf, '([^/]*)$', 1))
)
SELECT subj, pred, obj, MIN(url) AS first_url, COUNT(*) AS n_mentions
FROM subbed GROUP BY subj, pred, obj
"""


@_register(
    "q_pii_scrub",
    r"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(
             text || ' mail user' || doc_id || '@ex-mail.example.com ip 10.'
                  || (doc_id % 256) || '.0.' || (doc_id % 100)
                  || ' tel +1-555-' || (doc_id % 10000) || '-99',
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+\d[\d-]{7,}\d', '<PHONE>', 'g') AS scrubbed
    FROM documents
    """,
)
def q_pii_scrub(sf_dir: str):
    """PII redaction (emails / IPv4 / phone -> typed tags) — the standard
    pre-training privacy scrub, as a pure map stage.  The synthetic corpus
    carries no PII, so the query plants deterministic doc_id-derived PII in
    every row first; the oracle replays the same plant + the same RE2
    replacement chain, checking the scrubber's substitutions value-exactly."""
    from ontoea_ray.functions.text import pii_scrub

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_pandas()
        aug = pa.array(
            b["text"].to_pandas()
            + " mail user" + did.astype(str) + "@ex-mail.example.com ip 10."
            + (did % 256).astype(str) + ".0." + (did % 100).astype(str)
            + " tel +1-555-" + (did % 10000).astype(str) + "-99"
        )
        return pa.table({"doc_id": b["doc_id"], "scrubbed": pii_scrub(aug)})

    return ds.map_batches(fn, batch_format="pyarrow")


@_register(
    "q_domain_cap",
    """
    SELECT doc_id, source, rnk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 10
    """,
)
def q_domain_cap(sf_dir: str):
    """Per-domain document cap (keep the 10 lowest-doc_id docs per source) —
    the CommonCrawl-style anti-domination sampler.

    Combiner-first per-key top-k, same shape as q_group_topk: each block
    keeps only ITS 10 best rows per source before the keyed exchange, so
    the shuffle moves at most 10 x sources-per-block rows — a domain with a
    billion documents ships 10 rows per upstream block, never the domain."""
    from ontoea_ray.functions.shuffle import with_partition_key

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def _rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        df["rnk"] = (df.groupby("source", sort=False).cumcount() + 1).astype(np.int64)
        return df[df["rnk"] <= 10]

    pruned = ds.map_batches(
        lambda df: _rank(df)[["doc_id", "source"]], batch_format="pandas"
    )
    parted = with_partition_key(pruned, ["source"])
    return parted.groupby("pkey").map_groups(
        lambda df: _rank(df)[["doc_id", "source", "rnk"]], batch_format="pandas"
    )


@_register(
    "q_bigram_freq",
    """
    SELECT bigram, freq,
           CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, bigram DESC) - 1 AS BIGINT) AS rank
    FROM (
      SELECT bigram, COUNT(*) AS freq FROM (
        SELECT t[unnest(range(1, len(t)))] || ' ' || t[unnest(range(2, len(t) + 1))] AS bigram
        FROM (SELECT str_split(text, ' ') AS t FROM documents)
      ) GROUP BY bigram
    )
    """,
)
def q_bigram_freq(sf_dir: str):
    """Corpus bigram frequencies + global rank — the n-gram LM count table.

    Adjacent-token pairs are built with pure offset arithmetic on the
    tokenized ListArray (a shifted-slice zip, no row loop; document
    boundaries masked via the offsets), counted per block, then one
    combiner-sized keyed aggregate + the same distributed rank as
    q_term_freq."""
    from ontoea_ray.functions.text import bigram_counts
    from ontoea_ray.state.ids import rank_by_frequency

    ds = _read(sf_dir, "documents", ["text"])
    partial = ds.map_batches(
        lambda b: bigram_counts(b["text"].combine_chunks()), batch_format="pyarrow"
    )
    freq = partial.groupby("bigram").sum("freq").map_batches(
        lambda b: pa.table({"bigram": b["bigram"], "freq": b["sum(freq)"]}),
        batch_format="pyarrow",
    )
    return rank_by_frequency(freq, key="bigram")


@_register(
    "q_tfidf",
    """
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           tf.tf * ((n.n * 1000000) // df.df) AS score
    FROM tf JOIN df USING (token), n
    """,
)
def q_tfidf(sf_dir: str):
    """Integer-quantized TF-IDF: per-(doc, token) term frequency joined with
    document frequency; idf is the exact rational ``(N * 1e6) // df`` so the
    score is integer-deterministic (no libm ln to diverge between engines).

    Scale shape: tf needs NO shuffle (each document is one row, so the
    per-doc counts are block-local); df is a combiner-first keyed aggregate
    (per-block partial doc-counts, then one small groupby); N is a scalar
    count; the tf-df join is the engine's one-exchange distributed hash
    join on the token key — big x big, never broadcast."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.text import doc_term_frequencies

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    tf = ds.map_batches(
        lambda b: doc_term_frequencies(
            b["text"].combine_chunks(),
            np.asarray(b["doc_id"].to_numpy(zero_copy_only=False), np.int64),
        ),
        batch_format="pyarrow",
    )

    # combiner: per-block partial document-counts per token (each (doc,
    # token) appears once in tf, so counting rows counts documents)
    df_partial = tf.map_batches(
        lambda b: pa.table(
            {"token": b["token"], "df_part": pa.array(np.ones(b.num_rows, np.int64), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    df = df_partial.groupby("token").sum("df_part").map_batches(
        lambda b: pa.table({"token": b["token"], "df": b["sum(df_part)"]}),
        batch_format="pyarrow",
    )

    joined = hash_join(tf, df, on=["token"])

    def score(b: pa.Table) -> pa.Table:
        tf_v = b["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df_v = b["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = tf_v * ((np.int64(n_docs) * np.int64(1_000_000)) // df_v)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "token": b["token"],
                "tf": b["tf"],
                "df": b["df"],
                "score": pa.array(s, pa.int64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


@_register(
    "q_quantiles",
    """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
    o AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) - 1 AS idx FROM c),
    n AS (SELECT COUNT(*) AS cnt FROM c)
    SELECT q, cents FROM (
      SELECT 'p25' AS q, CAST(FLOOR(0.25 * (cnt - 1)) AS BIGINT) AS tgt FROM n
      UNION ALL SELECT 'p50', CAST(FLOOR(0.50 * (cnt - 1)) AS BIGINT) FROM n
      UNION ALL SELECT 'p75', CAST(FLOOR(0.75 * (cnt - 1)) AS BIGINT) FROM n
      UNION ALL SELECT 'p90', CAST(FLOOR(0.90 * (cnt - 1)) AS BIGINT) FROM n
      UNION ALL SELECT 'p99', CAST(FLOOR(0.99 * (cnt - 1)) AS BIGINT) FROM n
    ) t JOIN o ON o.idx = t.tgt
    ORDER BY q
    """,
)
def q_quantiles(sf_dir: str):
    """Exact distributed quantiles of the price column (integer cents):
    one global sort, then per-block metadata locates each target position
    and only those k blocks are fetched — the driver holds k rows, never
    the table (stages/quantiles.py)."""
    from ontoea_ray.stages.quantiles import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    cents = ds.map_batches(
        lambda b: pa.table(
            {"cents": pc.cast(pc.round(pc.multiply(b["l_extendedprice"], 100)), pa.int64())}
        ),
        batch_format="pyarrow",
    )
    return exact_quantiles(
        cents, "cents", {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p90": 0.90, "p99": 0.99}
    )


@_register("q_kg_construct", _FLAGSHIP_SQL)
def q_kg_construct(sf_dir: str):
    """End-to-end flagship WITH a full DuckDB oracle: the corpus-derived
    gazetteer maps every surface to exactly one candidate, so mention scan +
    linking + canonicalization + dedup are all relationally expressible —
    the SQL reproduces the pipeline bit-exactly (verified at sf0.001 and
    sf0.01: every row, url and mention count identical)."""
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    return kg_construct_pipeline(sf_dir)


@_register("q_ontoea_align")
def q_ontoea_align(sf_dir: str):
    """OntoEA parity track on the deterministic fixture benchmark (the
    input is seeded, not sf-dependent): loaders -> interleaved ids -> CCM ->
    joint training -> fused Hits@k/MR/MRR.  Rows-only check (iterative
    model training is not SQL-expressible); the quality gate lives in
    tests/test_training.py."""
    import tempfile

    from ontoea_ray.pipelines.kg_parity import run_parity
    from ontoea_ray.pipelines.training import OntoEAConfig
    from ontoea_ray.sources import fixtures as FX

    kg = FX.generate_fixture_kg(n_entities=120, seed=42)
    root = tempfile.mkdtemp(prefix="ontoea_parity_")
    FX.write_reference_layout(kg, root)
    cfg = OntoEAConfig(
        dim=64, onto_dim=32, max_epoch=200, sub_epoch=10, start_valid=100,
        eval_freq=2, batch_size=512, neg_triple_num=10,
    )
    res = run_parity(root, cfg, as_actor=True)
    t = res["test"]
    return pa.table(
        {
            "hits1": pa.array([t["hits"][1]], pa.float64()),
            "hits5": pa.array([t["hits"][5]], pa.float64()),
            "hits10": pa.array([t["hits"][10]], pa.float64()),
            "mr": pa.array([t["mr"]], pa.float64()),
            "mrr": pa.array([t["mrr"]], pa.float64()),
        }
    )


_ENTITY_MERGE_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    ents AS (SELECT DISTINCT uri FROM (SELECT subj AS uri FROM kg UNION SELECT obj FROM kg)),
    grp AS (SELECT uri, substr(lower(regexp_extract(uri, '([^/]*)$', 1)), 1, 1) AS g FROM ents),
    rep AS (SELECT uri, MIN(uri) OVER (PARTITION BY g) AS rep FROM grp)
    SELECT r1.rep AS subj, kg.pred, r2.rep AS obj,
           CAST(SUM(kg.n_mentions) AS BIGINT) AS n_mentions,
           MIN(kg.first_url) AS first_url
    FROM kg JOIN rep r1 ON r1.uri = kg.subj JOIN rep r2 ON r2.uri = kg.obj
    GROUP BY 1, 2, 3
"""


@_register("q_entity_merge", _ENTITY_MERGE_SQL)
def q_entity_merge(sf_dir: str):
    """Transitive same-as entity merge on the flagship KG: same-as pairs
    are derived deterministically (entities whose canonical key shares a
    1-char prefix, chained CONSECUTIVELY in sorted order — worst-case
    diameter, so the closure genuinely exercises connected-components
    propagation), closed with stages/graph.connected_components, and every
    edge is rewritten to component representatives and re-aggregated.  The
    oracle replays the flagship SQL and closes the same prefix groups with
    a window MIN (the chain spans the whole group, so component == group
    min)."""
    from ontoea_ray.functions.shuffle import compact
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
    from ontoea_ray.stages.canonicalize import cluster_key
    from ontoea_ray.stages.graph import merge_entities
    from ray.data.aggregate import Min

    kg = _kg_cached(sf_dir)

    def ent_part(b: pa.Table) -> pa.Table:
        uris = pa.chunked_array(
            [b["subj"].combine_chunks(), b["obj"].combine_chunks()]
        ).combine_chunks()
        uniq = pc.unique(uris)
        return pa.table(
            {"uri": uniq, "g": pc.utf8_slice_codeunits(cluster_key(uniq), 0, 1)}
        )

    ents = (
        compact(kg.map_batches(ent_part, batch_format="pyarrow"))
        .groupby("uri")
        .aggregate(Min("g", alias_name="g"))  # g is a function of uri; Min = distinct
    )

    def chain(df: pd.DataFrame) -> pa.Table:
        u = sorted(df["uri"])
        return pa.table(
            {"a": pa.array(u[:-1], pa.string()), "b": pa.array(u[1:], pa.string())}
        )

    sameas = ents.groupby("g").map_groups(chain, batch_format="pandas")
    return merge_entities(kg, sameas, src="a", dst="b")


from ontoea_ray.functions.lsh_sql import decontaminate_overlap_sql


@_register("q_decontaminate", decontaminate_overlap_sql(shingle_n=3, bench_mod=97))
def q_decontaminate(sf_dir: str):
    """Benchmark decontamination overlap: docs with doc_id % 97 == 0 form
    the held-out benchmark; every other doc sharing >= 1 word-3-gram with it
    is flagged with its DISTINCT-overlap count.  Shuffle-free corpus pass:
    the benchmark's distinct shingle-hash set is broadcast (`ray.put`) and
    each actor tests membership with a vectorized `searchsorted` — the
    GPT-3/Gopher-style n-gram decontamination shape at 100 TB.  The oracle
    replays the identical hash chain in DuckDB
    (`functions.lsh_sql.decontaminate_overlap_sql`)."""
    from ontoea_ray.stages.decontaminate import (
        benchmark_ngram_hashes,
        contamination_overlap,
    )

    def _mod_is(b: pa.Table, rem_eq: bool) -> pa.Table:
        mod = np.asarray(b["doc_id"].combine_chunks(), np.int64) % 97
        return b.filter(pa.array((mod == 0) == rem_eq))

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(lambda b: _mod_is(b, True), batch_format="pyarrow")
    corpus = docs.map_batches(lambda b: _mod_is(b, False), batch_format="pyarrow")
    return contamination_overlap(corpus, benchmark_ngram_hashes(bench))


def _pagerank_sql(
    iters: int = 5, scale: int = 10**9, damping_pct: int = 85,
    edge_ctes: list[str] | None = None,
) -> str:
    """Unrolled integer power iteration replaying stages/graph.pagerank
    exactly (floor divisions, dropped dangling/rounding mass).
    ``edge_ctes`` overrides the edge-table source: a CTE list whose last
    entry defines ``e(s, d)`` (defaults to the flagship KG edges)."""
    base = (100 - damping_pct) * scale // 100
    ctes = list(edge_ctes) if edge_ctes is not None else [
        f"kg AS ({_FLAGSHIP_SQL})",
        "e AS (SELECT subj AS s, obj AS d FROM kg)",
    ]
    ctes += [
        "nodes AS (SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION SELECT d FROM e))",
        "deg AS (SELECT s, COUNT(*) AS dg FROM e GROUP BY s)",
        f"m0 AS (SELECT n, CAST({scale} AS HUGEINT) AS m FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT e.d AS n, SUM(m{i}.m // deg.dg) AS recv"
            f" FROM e JOIN m{i} ON m{i}.n = e.s JOIN deg ON deg.s = e.s GROUP BY 1)"
        )
        ctes.append(
            f"m{i + 1} AS (SELECT nodes.n, {base} + ({damping_pct} * COALESCE(r{i + 1}.recv, 0)) // 100 AS m"
            f" FROM nodes LEFT JOIN r{i + 1} ON r{i + 1}.n = nodes.n)"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT n AS node, CAST(m AS BIGINT) AS rank_units FROM m{iters}
"""


@_register("q_pagerank", _pagerank_sql())
def q_pagerank(sf_dir: str):
    """Integer PageRank over the flagship KG edge table — hub-entity
    scoring (the entities that would need salting in the canonicalization
    shuffle).  Bit-deterministic by construction (integer mass units), so
    the oracle unrolls the identical power iteration in SQL."""
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
    from ontoea_ray.stages.graph import pagerank

    kg = _kg_cached(sf_dir)
    return pagerank(kg, iters=5)


def _kge_negatives_sql(n_neg: int = 2) -> str:
    from ontoea_ray.functions.lsh_sql import TWO64, _h, splitmix64_ctes

    key = (
        f"((2 * {_h('subj')} + 3 * {_h('pred')} + 5 * {_h('obj')} + k) % {TWO64})"
    )
    return f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    nodes AS (SELECT DISTINCT n FROM (SELECT subj AS n FROM kg UNION SELECT obj FROM kg)),
    v AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) - 1 AS rank FROM nodes),
    cnt AS (SELECT COUNT(*) AS c FROM v),
    cand0 AS (SELECT subj, pred, obj, kk.k AS k
              FROM kg, (SELECT unnest(range({n_neg})) AS k) kk),
    {splitmix64_ctes("cand0", key)},
    cand AS (SELECT subj, pred, CAST(k AS BIGINT) AS k,
                    (_h % (SELECT c FROM cnt)) AS idx FROM sm3),
    neg AS (SELECT c.subj, c.pred, v.n AS obj_neg, c.k
            FROM cand c JOIN v ON v.rank = c.idx)
    SELECT subj, pred, obj_neg, k FROM neg
    WHERE NOT EXISTS (SELECT 1 FROM kg t
                      WHERE t.subj = neg.subj AND t.pred = neg.pred
                        AND t.obj = neg.obj_neg)
"""


@_register("q_kge_negatives", _kge_negatives_sql())
def q_kge_negatives(sf_dir: str):
    """Negative sampling for KG-embedding training (the corrupt-triple
    generator behind TransE/RotatE-style losses, reference eval's implicit
    counterpart): for every flagship edge, corrupt the object with 2
    deterministic draws from the node vocabulary — draw = splitmix64 over
    the triple's md5 hashes — then drop accidental TRUE triples with an
    exact anti-join (left join + null filter) against the edge table, so
    no negative is secretly positive.  The vocabulary index is a sorted
    global rank (state/ids.zip_with_index: per-block offsets from
    metadata, order-safe, no driver rows); the draw joins back by rank
    through the planner-routed hash join.  Every step (md5, splitmix,
    rank, modulo) is the engine-wide convention, so the oracle replays
    each sampled id exactly.

    NOTE: the synthetic flagship KG has a 20x10x20 triple space that the
    sf0.1 corpus SATURATES (all 4000 possible triples exist), so at that
    scale the correct output is zero rows — every corruption is a true
    triple.  At sf0.01 ~40% of draws survive; on a real KG (sparse by
    many orders of magnitude) virtually all do."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.state.ids import zip_with_index

    n_neg = 2
    kg = _kg_cached(sf_dir)

    def ends(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n": pa.chunked_array(
                    [b["subj"].combine_chunks(), b["obj"].combine_chunks()]
                ).combine_chunks()
            }
        )

    vocab = zip_with_index(
        keyed_aggregate(
            kg.map_batches(ends, batch_format="pyarrow"), ["n"], count_alias="_c"
        )
        .drop_columns(["_c"])
        .sort("n"),
        col="rank",
    )
    n_vocab = vocab.count()

    def draws(b: pa.Table) -> pa.Table:
        hs = _token_hashes(b["subj"].combine_chunks(), backend="md5")
        hp = _token_hashes(b["pred"].combine_chunks(), backend="md5")
        ho = _token_hashes(b["obj"].combine_chunks(), backend="md5")
        base = (
            np.uint64(2) * hs + np.uint64(3) * hp + np.uint64(5) * ho
        )  # wraps mod 2^64
        parts = []
        for k in range(n_neg):
            idx = splitmix64(base + np.uint64(k)) % np.uint64(n_vocab)
            parts.append(
                pa.table(
                    {
                        "subj": b["subj"],
                        "pred": b["pred"],
                        "k": pa.array(np.full(len(b), k, np.int64)),
                        "idx": pa.array(idx.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    cand = kg.map_batches(draws, batch_format="pyarrow")
    neg = hash_join(cand, vocab, on=["idx"], right_on=["rank"]).map_batches(
        lambda b: pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj_neg": b["n"],
                "k": b["k"],
            }
        ),
        batch_format="pyarrow",
    )
    truth = kg.map_batches(
        lambda b: pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj_neg": b["obj"],
                "is_true": pa.array(np.ones(len(b), np.int64)),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(neg, truth, on=["subj", "pred", "obj_neg"], how="left")
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b["is_true"])).select(
            ["subj", "pred", "obj_neg", "k"]
        ),
        batch_format="pyarrow",
    )


_KG_UPSERT_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    delta AS (SELECT * FROM kg WHERE pred = 'batch'),
    uni AS (SELECT * FROM kg UNION ALL SELECT * FROM delta)
    SELECT subj, pred, obj,
           CAST(SUM(n_mentions) AS BIGINT) AS n_mentions,
           MIN(first_url) AS first_url
    FROM uni GROUP BY 1, 2, 3
"""


@_register("q_kg_upsert", _KG_UPSERT_SQL)
def q_kg_upsert(sf_dir: str):
    """Incremental edge-table upsert: merge a deterministic delta (the
    'batch'-predicate slice, standing in for a new crawl increment) into
    the flagship KG — evidence counts add, provenance urls min-merge."""
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline, kg_upsert

    kg = _kg_cached(sf_dir)
    delta = kg.map_batches(
        lambda b: b.filter(pc.equal(b["pred"], "batch")), batch_format="pyarrow"
    )
    return kg_upsert(kg, delta)


_OUTER_JOIN_SQL = """
    WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
               FROM customer WHERE c_nationkey % 2 = 0 GROUP BY 1),
    s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
          FROM supplier WHERE s_nationkey % 3 = 0 GROUP BY 1)
    SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
           CAST(COALESCE(c.n_cust, -1) AS BIGINT) AS n_cust,
           CAST(COALESCE(s.n_supp, -1) AS BIGINT) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


@_register("q_outer_join", _OUTER_JOIN_SQL)
def q_outer_join(sf_dir: str):
    """Full-outer distributed hash join: per-nation customer counts (even
    nations) vs supplier counts (nations % 3 == 0) — each side has rows the
    other lacks, so both null-fill paths are value-checked (-1 sentinel
    keeps the hash dtype-stable)."""
    from ontoea_ray.functions.join import hash_join

    def counts(table: str, keycol: str, mod: int, alias: str):
        ds = _read(sf_dir, table, [keycol])

        def flt(b: pa.Table) -> pa.Table:
            k = np.asarray(b[keycol].combine_chunks(), np.int64)
            return pa.table({"nationkey": pa.array(k[k % mod == 0])})

        return (
            ds.map_batches(flt, batch_format="pyarrow")
            .groupby("nationkey")
            .aggregate(Count(alias_name=alias))
        )

    c = counts("customer", "c_nationkey", 2, "n_cust")
    s = counts("supplier", "s_nationkey", 3, "n_supp")
    joined = hash_join(c, s, on=["nationkey"], how="outer")
    return joined.map_batches(
        lambda b: pa.table(
            {
                "nationkey": b["nationkey"],
                "n_cust": pc.coalesce(b["n_cust"], pa.scalar(-1, pa.int64())),
                "n_supp": pc.coalesce(b["n_supp"], pa.scalar(-1, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )


_SALTED_AGG_SQL = """
    SELECT event_type,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
"""


@_register("q_salted_agg", _SALTED_AGG_SQL)
def q_salted_agg(sf_dir: str):
    """Hot-key-salted two-stage aggregate (functions/shuffle.salted_aggregate):
    event_type is low-cardinality/skewed, the worst groupby shape — stage 1
    spreads each key over 16 salt partitions, stage 2 merges partials.
    Result is bit-equal to the plain GROUP BY (associative aggregates), so
    the oracle is the unsalted SQL."""
    from ontoea_ray.functions.shuffle import salted_aggregate

    ev = _read(sf_dir, "events", ["event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        v = np.asarray(b["value"].combine_chunks(), np.float64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "sum_value_milli": pa.array(np.floor(v * 1000).astype(np.int64)),
            }
        )

    return salted_aggregate(
        ev.map_batches(prep, batch_format="pyarrow"),
        ["event_type"],
        sums=["sum_value_milli"],
        count_alias="n",
    )


_LATENESS_SQL = """
    WITH l AS (
      SELECT CASE WHEN MAX(ts) OVER w IS NULL THEN 0
                  ELSE GREATEST(date_diff('microsecond', ts, MAX(ts) OVER w), 0)
             END AS late_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT CASE WHEN late_us = 0 THEN -1
                ELSE CAST(FLOOR(LOG2(late_us)) AS BIGINT) END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM l GROUP BY 1
"""


@_register("q_event_lateness", _LATENESS_SQL)
def q_event_lateness(sf_dir: str):
    """Out-of-orderness audit — the watermark-tuning statistic a streaming
    ingester needs: for each event, its lateness = how far its event time
    sits BEHIND the running maximum event time already seen in its user's
    arrival sequence (arrival order = event_id), reduced to a log2-bucket
    histogram (-1 = in order).  A watermark delayed by the p99 bucket
    bound drops at most 1% of events.  ONE user-keyed co-location,
    in-partition arrival sort + vectorized running max; bucket counts
    combine in the same pass (floor(log2(int)) is IEEE-exact, the
    q_event_gap_hist convention)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
    parted = with_partition_key(ev, ["user_id"])

    def lateness(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        # per-user running max over the arrival order (C cummax, no loop)
        seg_max = pd.Series(ts).groupby(pd.Series(uid)).cummax().to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        prev = np.empty(len(ts), np.int64)
        prev[1:] = seg_max[:-1]
        prev[starts] = ts[starts]  # lateness 0 for each user's first event
        late = np.maximum(prev - ts, 0)
        bucket = np.full(len(late), -1, np.int64)
        pos = late > 0
        bucket[pos] = np.floor(np.log2(late[pos])).astype(np.int64)
        g = (
            pd.DataFrame({"bucket": bucket})
            .groupby("bucket", sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        parted.groupby("pkey").map_groups(lateness, batch_format="pandas"),
        ["bucket"],
        sums=["n"],
    )


_DEBOUNCE_US = 30 * 60 * 1_000_000

_DEBOUNCE_SQL = f"""
    WITH l AS (
      SELECT event_type,
             CASE WHEN LAG(ts) OVER w IS NOT NULL
                   AND date_diff('microsecond', LAG(ts) OVER w, ts)
                       <= {_DEBOUNCE_US}
                  THEN 1 ELSE 0 END AS sup
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(SUM(1 - sup) AS BIGINT) AS n_kept,
           CAST(SUM(sup) AS BIGINT) AS n_suppressed
    FROM l GROUP BY 1
"""


@_register("q_debounce", _DEBOUNCE_SQL)
def q_debounce(sf_dir: str):
    """TTL-window temporal dedup (the re-crawl suppressor: skip a fetch if
    the SAME key was fetched within the previous 30 minutes): an event is
    suppressed when its immediate (user, type) predecessor lies within the
    window — predecessor means previous RAW event (the LAG semantic, which
    one SQL window replays exactly), not previous kept one (that chained
    variant is a sequential scan per key; same exchange, different kernel).
    ONE (user, type)-keyed co-location, in-partition sort + vectorized
    diff, per-type counts combine in the same pass before a small keyed
    sum."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
    parted = with_partition_key(ev, ["user_id", "event_type"])

    def flags(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        typ = df["event_type"].to_numpy(object)
        same = np.zeros(len(df), bool)
        if len(df) > 1:
            same[1:] = (uid[1:] == uid[:-1]) & (typ[1:] == typ[:-1])
        sup = same & np.r_[False, (ts[1:] - ts[:-1]) <= _DEBOUNCE_US]
        g = (
            pd.DataFrame({"event_type": typ, "sup": sup.astype(np.int64)})
            .groupby("event_type", sort=False)["sup"]
            .agg(n_suppressed="sum", n="size")
            .reset_index()
        )
        g["n_kept"] = (g["n"] - g["n_suppressed"]).astype(np.int64)
        g["n_suppressed"] = g["n_suppressed"].astype(np.int64)
        return _from_pandas_clean(g[["event_type", "n_kept", "n_suppressed"]])

    return keyed_aggregate(
        parted.groupby("pkey").map_groups(flags, batch_format="pandas"),
        ["event_type"],
        sums=["n_kept", "n_suppressed"],
    )


_RUNNING_TOTAL_SQL = """
    SELECT event_id,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_milli
    FROM events
"""


@_register("q_running_total", _RUNNING_TOTAL_SQL)
def q_running_total(sf_dir: str):
    """Per-key ordered cumulative sum (running account balance shape):
    user-co-located map_groups, in-group vectorized sort + cumsum — the
    ordered-window-per-key primitive behind sessionization/packing, exposed
    directly.  Groups are per-user event streams (bounded); the exchange is
    one user-keyed shuffle."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def running(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        v = np.floor(df["value"].to_numpy(np.float64) * 1000).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(df["event_id"].to_numpy(np.int64)),
                "running_milli": pa.array(np.cumsum(v)),
            }
        )

    return compact(ev).groupby("user_id").map_groups(running, batch_format="pandas")


_GROUP_QUANTILES_SQL = """
    SELECT lang,
           CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS p50_chars,
           CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
"""


@_register("q_group_quantiles", _GROUP_QUANTILES_SQL)
def q_group_quantiles(sf_dir: str):
    """Exact per-group quantiles (median / p90 document length per lang):
    key-co-located map_groups, in-group sort + discrete-quantile index
    (ceil(q*n)-1 — DuckDB's quantile_disc convention).  Complements the
    GLOBAL exact quantiles (stages/quantiles.py, sort + positional block
    fetch): per-group distributions fit their group, so the group-local
    kernel is the right scale shape."""
    docs = _read(sf_dir, "documents", ["lang", "n_chars"])

    def grp(df: pd.DataFrame) -> pa.Table:
        v = np.sort(df["n_chars"].to_numpy(np.int64))
        n = len(v)
        idx = lambda q: v[max(0, int(np.ceil(q * n)) - 1)]
        return pa.table(
            {
                "lang": pa.array([df["lang"].iloc[0]], pa.string()),
                "p50_chars": pa.array([idx(0.5)], pa.int64()),
                "p90_chars": pa.array([idx(0.9)], pa.int64()),
                "n_docs": pa.array([n], pa.int64()),
            }
        )

    return compact(docs).groupby("lang").map_groups(grp, batch_format="pandas")


_TEMP_MIX_SQL = f"""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
    mn AS (SELECT MIN(n) AS nmin FROM c),
    q0 AS (SELECT source, n, (100000000 * mn.nmin) // n AS x,
                  CAST(FLOOR(SQRT(CAST((100000000 * mn.nmin) // n AS DOUBLE)))
                       AS BIGINT) AS s0
           FROM c, mn),
    q AS (SELECT source, n,
                 CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
                      WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS bps
          FROM q0),
    {splitmix64_ctes("documents", "doc_id")}
    SELECT d.source, q.bps AS keep_bps, CAST(q.n AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN d._h % 10000 < q.bps THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept
    FROM sm3 d JOIN q ON q.source = d.source
    GROUP BY 1, 2, 3
"""


@_register("q_temperature_mix", _TEMP_MIX_SQL)
def q_temperature_mix(sf_dir: str):
    """Temperature-based source rebalancing (T=2, the multilingual-mix
    downsampler: kept docs per source proportional to sqrt(n_s), so large
    sources stop drowning small ones without discarding them entirely):
    keep-probability bps(s) = isqrt(10^8 · n_min / n_s), EXACT integer
    square root on both sides (the oracle corrects FLOOR(SQRT(double))
    with a ±1 integer check, so the boundary is bit-stable), and the
    per-doc keep decision is the engine-wide splitmix64(doc_id) % 10^4
    threshold.  Pass 1 counts per source combiner-first; the per-source
    probability table is manifest-scale and rides to the filter through
    the planner-routed broadcast join; pass 2 counts kept docs.  Output:
    (source, keep_bps, n_total, n_kept)."""
    import math

    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id", "source"])
    counts = keyed_aggregate(docs, ["source"], count_alias="n")

    from ontoea_ray.functions.broadcast import assemble_table_ref

    _, cref = assemble_table_ref(counts, columns=["source", "n"])
    assert cref is not None, "per-source count table is manifest-scale"

    @ray.remote
    def probs(tref) -> pa.Table:
        t = tref if not isinstance(tref, ray.ObjectRef) else ray.get(tref)
        n = np.asarray(t["n"].combine_chunks(), np.int64)
        nmin = int(n.min())
        bps = np.array(
            [math.isqrt((100_000_000 * nmin) // int(v)) for v in n], np.int64
        )
        return pa.table(
            {
                "source": t["source"],
                "n_total": pa.array(n, pa.int64()),
                "keep_bps": pa.array(bps, pa.int64()),
            }
        )

    ptab = ray.data.from_arrow_refs([probs.remote(cref)])
    joined = hash_join(docs, ptab, on=["source"])

    def partial(b: pa.Table) -> pa.Table:
        h = splitmix64(
            np.asarray(b["doc_id"].combine_chunks(), np.int64).astype(np.uint64)
        )
        kept = (
            (h % np.uint64(10_000)).astype(np.int64)
            < np.asarray(b["keep_bps"].combine_chunks(), np.int64)
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "source": b["source"].to_pandas(),
                "keep_bps": np.asarray(b["keep_bps"].combine_chunks(), np.int64),
                "n_total": np.asarray(b["n_total"].combine_chunks(), np.int64),
                "n_kept": kept,
            }
        )
        g = (
            df.groupby(["source", "keep_bps", "n_total"], sort=False)["n_kept"]
            .sum()
            .reset_index()
        )
        g["n_kept"] = g["n_kept"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["source", "keep_bps", "n_total"],
        sums=["n_kept"],
    )


@_register("q_compress_ratio")
def q_compress_ratio(sf_dir: str):
    """Compression-ratio quality signal (no SQL oracle — zlib is
    deterministic but not SQL-expressible; pytest pins golden values):
    ``ratio_milli = 1000 * deflate_len(text) / len(text)`` per document —
    the RefinedWeb/Gopher-family heuristic where highly repetitive or
    templated text compresses far below prose (low ratio → machine
    boilerplate, high → random-like noise).  zlib level is pinned at 6 so
    the value is a pure function of the bytes; the scan is embarrassingly
    parallel (per-doc C-library call inside map_batches, no shuffle at
    all), returning (doc_id, n_bytes, comp_bytes, ratio_milli)."""
    import zlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def ratios(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        texts = b["text"].to_pylist()
        raw = [t.encode("utf-8") for t in texts]
        nb = np.array([len(x) for x in raw], np.int64)
        cb = np.array([len(zlib.compress(x, 6)) for x in raw], np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
                "comp_bytes": pa.array(cb, pa.int64()),
                "ratio_milli": pa.array(1000 * cb // np.maximum(nb, 1), pa.int64()),
            }
        )

    return ds.map_batches(ratios, batch_format="pyarrow")


_ADAPTIVE_Q_SQL = """
    WITH th AS (SELECT lang, CAST(quantile_disc(n_chars, 0.10) AS BIGINT) AS p10
                FROM documents GROUP BY 1)
    SELECT d.lang, th.p10,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN d.n_chars >= th.p10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept
    FROM documents d JOIN th ON th.lang = d.lang
    GROUP BY 1, 2
"""


@_register("q_adaptive_filter", _ADAPTIVE_Q_SQL)
def q_adaptive_filter(sf_dir: str):
    """Adaptive per-group quality threshold — the curation pattern that
    replaces one global cutoff with a per-language percentile (a fixed
    length floor over-filters terse languages and under-filters verbose
    ones): pass 1 computes each lang's exact p10 document length
    (key-co-located sort + discrete-quantile index, DuckDB quantile_disc
    convention); the tiny thresholds table then rides to every filter
    task (hash_join auto-broadcasts under budget), and pass 2 counts
    kept-vs-total per lang combiner-first.  Two passes over the corpus is
    the honest price of a data-dependent threshold — no driver state
    beyond Dataset handles."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])

    def grp(df: pd.DataFrame) -> pa.Table:
        v = np.sort(df["n_chars"].to_numpy(np.int64))
        return pa.table(
            {
                "lang": pa.array([df["lang"].iloc[0]], pa.string()),
                "p10": pa.array([v[max(0, int(np.ceil(0.10 * len(v))) - 1)]], pa.int64()),
            }
        )

    th = compact(docs).groupby("lang").map_groups(grp, batch_format="pandas")
    joined = hash_join(docs, th, on=["lang"])

    def partial(b: pa.Table) -> pa.Table:
        n = np.asarray(b["n_chars"].combine_chunks(), np.int64)
        p = np.asarray(b["p10"].combine_chunks(), np.int64)
        df = pd.DataFrame(
            {
                "lang": b["lang"].to_pandas(),
                "p10": p,
                "n_kept": (n >= p).astype(np.int64),
            }
        )
        g = df.groupby(["lang", "p10"], sort=False)["n_kept"].agg(
            n_total="size", n_kept="sum"
        ).reset_index()
        g["n_total"] = g["n_total"].astype(np.int64)
        g["n_kept"] = g["n_kept"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["lang", "p10"],
        sums=["n_total", "n_kept"],
    )


_STRAT_RATES = {"en": 40, "de": 80, "fr": 65}

_STRAT_CASE = " ".join(f"WHEN '{g}' THEN {p}" for g, p in _STRAT_RATES.items())

_STRAT_SAMPLE_SQL = f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT doc_id, lang FROM sm3
    WHERE _h % 100 < CASE lang {_STRAT_CASE} ELSE 15 END
"""


@_register("q_stratified_sample", _STRAT_SAMPLE_SQL)
def q_stratified_sample(sf_dir: str):
    """Per-language stratified sampling (training-mix rebalancing):
    deterministic splitmix64 keep-predicate with a per-group threshold from
    a broadcast rate map — shuffle-free, join-stable; the oracle replays
    the hash chain with a CASE over the same rates."""
    from ontoea_ray.stages.sampling import stratified_hash_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_hash_sample(
        ds, key_col="doc_id", group_col="lang", rates_pct=_STRAT_RATES, default_pct=15
    )


_KG_DIFF_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    old AS (SELECT subj, pred, obj, n_mentions FROM kg WHERE pred <> 'spark'),
    new AS (SELECT subj, pred, obj,
                   n_mentions + CASE WHEN pred = 'group' THEN 1 ELSE 0 END AS n_mentions
            FROM kg WHERE pred <> 'window'),
    j AS (SELECT COALESCE(old.subj, new.subj) AS subj,
                 COALESCE(old.pred, new.pred) AS pred,
                 COALESCE(old.obj, new.obj) AS obj,
                 COALESCE(old.n_mentions, -1) AS old_mentions,
                 COALESCE(new.n_mentions, -1) AS new_mentions
          FROM old FULL OUTER JOIN new
          ON old.subj = new.subj AND old.pred = new.pred AND old.obj = new.obj)
    SELECT subj, pred, obj,
           CASE WHEN old_mentions < 0 THEN 'added'
                WHEN new_mentions < 0 THEN 'removed'
                ELSE 'changed' END AS status,
           CAST(old_mentions AS BIGINT) AS old_mentions,
           CAST(new_mentions AS BIGINT) AS new_mentions
    FROM j WHERE old_mentions <> new_mentions
"""


@_register("q_kg_diff", _KG_DIFF_SQL)
def q_kg_diff(sf_dir: str):
    """KG snapshot diff (added / removed / changed edges between two crawl
    increments) — full-outer hash join on the edge key; the old/new
    snapshots are deterministic slices of the flagship KG so every status
    path is exercised and value-checked."""
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline, kg_diff

    kg = _kg_cached(sf_dir)
    old = kg.map_batches(
        lambda b: b.filter(pc.not_equal(b["pred"], "spark")), batch_format="pyarrow"
    )

    def bump(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b["pred"], "window"))
        inc = pc.add(
            b["n_mentions"],
            pc.cast(pc.equal(b["pred"], "group"), pa.int64()),
        )
        return b.set_column(b.schema.get_field_index("n_mentions"), "n_mentions", inc)

    new = kg.map_batches(bump, batch_format="pyarrow")
    return kg_diff(old, new)


_DEGREE_HIST_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    deg AS (SELECT subj, COUNT(*) AS dg FROM kg GROUP BY 1)
    SELECT CAST(LENGTH(bin(dg)) - 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MAX(dg) AS BIGINT) AS max_degree
    FROM deg GROUP BY 1
"""


@_register("q_degree_hist", _DEGREE_HIST_SQL)
def q_degree_hist(sf_dir: str):
    """Out-degree log2-bucket histogram of the KG — the skew diagnostic
    that sizes hub salting (how heavy is the tail before the
    canonicalization shuffle).  Per-subject count, then a bucket fold
    (floor(log2 dg) via the float exponent — exact for counts < 2^53,
    replayed in SQL as LENGTH(bin(dg))-1)."""
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
    from ray.data.aggregate import Max

    kg = _kg_cached(sf_dir)
    deg = compact(kg).groupby("subj").aggregate(Count(alias_name="dg"))

    def bucketize(b: pa.Table) -> pa.Table:
        dg = np.asarray(b["dg"].combine_chunks(), np.int64)
        bucket = (np.frexp(dg.astype(np.float64))[1] - 1).astype(np.int64)
        return pa.table({"bucket": pa.array(bucket), "dg": pa.array(dg)})

    return (
        deg.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n_nodes"), Max("dg", alias_name="max_degree"))
    )


_LATEST_EVENT_SQL = """
    SELECT event_id, user_id, event_type
    FROM (SELECT event_id, user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
"""


@_register("q_latest_event", _LATEST_EVENT_SQL)
def q_latest_event(sf_dir: str):
    """Latest record per key (functions/shuffle.argmax_by): newest event
    per user, ties broken by event_id — the crawl-dedup primitive (newest
    snapshot per url) on the events table.  Combiner-first: per-batch
    argmax partials, one keyed exchange."""
    from ontoea_ray.functions.shuffle import argmax_by

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    latest = argmax_by(ev, ["user_id"], ["ts", "event_id"])
    return latest.map_batches(
        lambda b: b.select(["event_id", "user_id", "event_type"]),
        batch_format="pyarrow",
    )


_KMEANS_ASSIGN_SQL = """
    WITH q AS (SELECT vec_id,
                      [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                       FOR i IN range(1, 65)] AS qv
               FROM embeddings),
    cents AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 4),
    scores AS (SELECT q.vec_id, cents.cid,
                      CAST(list_sum([q.qv[i] * cents.cv[i] FOR i IN range(1, 65)]) AS BIGINT) AS score
               FROM q CROSS JOIN cents),
    best AS (SELECT vec_id, cid, score,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
             FROM scores)
    SELECT vec_id, CAST(cid AS BIGINT) AS centroid, score FROM best WHERE rn = 1
"""


@_register("q_kmeans_assign", _KMEANS_ASSIGN_SQL)
def q_kmeans_assign(sf_dir: str):
    """Broadcast-centroid assignment (the k-means E-step / small-side
    similarity join) in integer arithmetic: centroids = the first 4
    embeddings, both sides quantized to milli-units, int64 dot products —
    bit-deterministic, so DuckDB replays every score exactly."""
    from ontoea_ray.stages.ann import centroid_assign

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent_rows = sorted(
        emb.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 4)), batch_format="pyarrow"
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    cents = np.array([r["embedding"] for r in cent_rows], np.float64)
    return centroid_assign(emb, cents)


from ontoea_ray.functions.url import normalize_url_ctes, normalize_urls

_MESSY_URL_SQL_EXPR = (
    "'HTTPS://WWW.' || upper(source) || '.Example.ORG'"
    " || CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END"
    " || '/Doc/' || CAST(doc_id // 10 AS VARCHAR)"
    " || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=' || CAST(doc_id % 5 AS VARCHAR)"
    "         WHEN doc_id % 4 = 1 THEN '?ref=' || CAST(doc_id % 5 AS VARCHAR) || '&utm_campaign=x'"
    "         ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END"
)

_URL_DEDUP_SQL = f"""
    WITH messy AS (SELECT doc_id, {_MESSY_URL_SQL_EXPR} AS url FROM documents),
    {normalize_url_ctes("messy")}
    SELECT canon_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM u6 GROUP BY 1
"""


def _url_query_part(d: np.ndarray) -> pd.Series:
    ref = pd.Series((d % 5).astype(str))
    q = pd.Series(np.full(len(d), "", object))
    m0, m1 = d % 4 == 0, d % 4 == 1
    q[m0] = "?utm_source=feed&ref=" + ref[m0]
    q[m1] = "?ref=" + ref[m1] + "&utm_campaign=x"
    return q


_ROBOTS_RULES = [
    ("src0.example.org", "/doc/1"),
    ("src1.example.org", "/doc/"),
    ("src2.example.org", "/doc/2"),
]

_ROBOTS_SQL = """
    WITH p AS (
      SELECT source || '.example.org' AS domain,
             'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url
      FROM documents),
    b AS (SELECT domain,
                 CASE WHEN (url LIKE 'https://src0.example.org/doc/1%')
                        OR (url LIKE 'https://src1.example.org/doc/%')
                        OR (url LIKE 'https://src2.example.org/doc/2%')
                      THEN 1 ELSE 0 END AS blocked
          FROM p)
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(blocked) AS BIGINT) AS n_blocked
    FROM b GROUP BY 1
"""


@_register("q_robots_filter", _ROBOTS_SQL)
def q_robots_filter(sf_dir: str):
    """Robots-exclusion URL filtering (crawl politeness): a small parsed
    disallow-rule table — (domain, path_prefix) pairs, the content of
    per-host robots.txt Disallow lines — is applied to the pages table
    with prefix semantics (functions/url.disallowed_mask, one vectorized
    starts_with pass per rule), reporting per-domain total vs blocked
    page counts.  The rule list ships inside the task closure (bytes ~
    rule count, not corpus size); registry-scale rule tables take the
    domain-keyed join path the function documents."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.url import disallowed_mask
    from ontoea_ray.sources.pages import pages_from_documents

    pages = pages_from_documents(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        url = b["url"].combine_chunks()
        blocked = disallowed_mask(url, _ROBOTS_RULES)
        # domain = the url head between scheme and first path slash
        dom = pc.list_element(
            pc.split_pattern(
                pc.utf8_slice_codeunits(url, start=len("https://")), pattern="/", max_splits=1
            ),
            0,
        )
        df = pd.DataFrame(
            {
                "domain": dom.to_pandas(),
                "n_blocked": blocked.cast(pa.int64()).to_numpy(zero_copy_only=False),
            }
        )
        g = (
            df.groupby("domain", sort=False)["n_blocked"]
            .agg(n_total="size", n_blocked="sum")
            .reset_index()
        )
        g["n_total"] = g["n_total"].astype(np.int64)
        g["n_blocked"] = g["n_blocked"].astype(np.int64)
        return _from_pandas_clean(g)

    parts = compact(pages.map_batches(partial, batch_format="pyarrow"))
    return keyed_aggregate(parts, ["domain"], sums=["n_total", "n_blocked"])


@_register("q_url_dedup", _URL_DEDUP_SQL)
def q_url_dedup(sf_dir: str):
    """Canonical-URL dedup: messy crawl URLs (deterministically derived —
    mixed case, default ports, utm params, fragments, trailing slashes) are
    normalized with functions/url.normalize_urls (RE2 steps DuckDB replays
    verbatim) and reduced to one representative per canonical url."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def messy(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        src = b["source"].combine_chunks()
        s = pd.Series(src.to_pandas().to_numpy())
        parts = (
            "HTTPS://WWW." + s.str.upper() + ".Example.ORG"
            + pd.Series(np.where(d % 3 == 0, ":443", ""))
            + "/Doc/" + pd.Series((d // 10).astype(str))
            + pd.Series(np.where(d % 2 == 0, "/", ""))
            + _url_query_part(d)
            + pd.Series(np.where(d % 7 == 0, "#frag", ""))
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "canon_url": normalize_urls(pa.array(parts.tolist(), pa.string())),
            }
        )

    canon = docs.map_batches(messy, batch_format="pyarrow")
    agg = keyed_aggregate(
        canon, ["canon_url"], mins=["doc_id"], count_alias="n_variants"
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "canon_url": b["canon_url"],
                "n_variants": b["n_variants"],
                "min_doc_id": b["doc_id"],
            }
        ),
        batch_format="pyarrow",
    )


_EVENT_BIGRAMS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events)
    SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY 1, 2
"""


@_register("q_event_bigrams", _EVENT_BIGRAMS_SQL)
def q_event_bigrams(sf_dir: str):
    """Sequential-pattern counts (clickstream path mining): consecutive
    event-type pairs per user ordered by time.  User-co-located map_groups,
    in-group vectorized sort + shift; bigram counts pre-reduced per
    partition before one small keyed merge."""
    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def bigrams(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        part = (
            pd.DataFrame({"a": et[:-1][same], "b": et[1:][same]})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return _from_pandas_clean(part)

    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    parted = with_partition_key(compact(ev), ["user_id"])
    per_part = parted.groupby("pkey").map_groups(bigrams, batch_format="pandas")
    return keyed_aggregate(per_part, ["a", "b"], sums=["n"]).map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"], "n": b["n"]}),
        batch_format="pyarrow",
    )


_PRED_COOC_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    sp AS (SELECT DISTINCT subj, pred FROM kg)
    SELECT a.pred AS pred_a, b.pred AS pred_b, CAST(COUNT(*) AS BIGINT) AS n_subjects
    FROM sp a JOIN sp b ON a.subj = b.subj AND a.pred < b.pred
    GROUP BY 1, 2
"""


@_register("q_pred_cooc", _PRED_COOC_SQL)
def q_pred_cooc(sf_dir: str):
    """Predicate co-occurrence (schema discovery: which predicate pairs
    share subjects — the association signal behind ontology-property
    grouping).  Distinct (subj, pred) explode, subject-co-located pair
    emission (the vectorized segment-pairs kernel from dedup), one keyed
    merge.  Predicates are dictionary-encoded to ints for the pair kernel
    and decoded after."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
    from ontoea_ray.stages.dedup import _pairs_from_bucket_block

    kg = _kg_cached(sf_dir)
    sp = keyed_aggregate(
        kg.map_batches(
            lambda b: pa.table({"subj": b["subj"], "pred": b["pred"]}),
            batch_format="pyarrow",
        ),
        ["subj", "pred"],
        count_alias="_c",
    ).drop_columns(["_c"])

    # encode pred -> int id so the pair kernel stays numeric; vocabulary is
    # tiny (predicate inventory), broadcast via sorted factorize per batch
    preds = sorted(
        r["pred"]
        for r in keyed_aggregate(
            sp.map_batches(lambda b: pa.table({"pred": b["pred"]}), batch_format="pyarrow"),
            ["pred"],
            count_alias="_c",
        ).take_all()
    )
    lookup = pa.array(preds, pa.string())

    def encode(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["pred"].combine_chunks(), value_set=lookup)
        return pa.table({"subj": b["subj"], "pid": idx.cast(pa.int64())})

    enc = sp.map_batches(encode, batch_format="pyarrow")
    parted = with_partition_key(enc, ["subj"])
    pair_rows = parted.groupby("pkey").map_groups(
        _pairs_from_bucket_block("pid", None, keys=("subj",), distinct=False),
        batch_format="pandas",
    )
    counts = keyed_aggregate(pair_rows, ["id_a", "id_b"], count_alias="n_subjects")

    def decode(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        bb = np.asarray(b["id_b"].combine_chunks(), np.int64)
        return pa.table(
            {
                "pred_a": lookup.take(pa.array(a)),
                "pred_b": lookup.take(pa.array(bb)),
                "n_subjects": b["n_subjects"],
            }
        )

    return counts.map_batches(decode, batch_format="pyarrow")


_RANK_SCORE_SQL = """
    WITH vocab AS (
      SELECT token,
             ROW_NUMBER() OVER (ORDER BY freq DESC, token DESC) - 1 AS rank
      FROM (SELECT token, COUNT(*) AS freq
            FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
            GROUP BY token)),
    ex AS (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents),
    j AS (SELECT doc_id, v.rank AS rank FROM ex JOIN vocab v USING (token))
    SELECT doc_id,
           CAST(SUM(rank) AS BIGINT) AS sum_rank,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST((1000 * SUM(rank)) // COUNT(*) AS BIGINT) AS mean_rank_milli
    FROM j GROUP BY 1
"""


def _tokens_exploded(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus explode to (doc_id, token) rows — streams, never materialized
    by this function; the input of the over-budget vocabulary join paths."""
    from ontoea_ray.functions.text import tokenize

    def explode(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"])
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_ids = np.repeat(
            np.asarray(b["doc_id"].combine_chunks(), np.int64), np.diff(offs)
        )
        return pa.table({"doc_id": pa.array(doc_ids), "token": toks.flatten()})

    return docs.map_batches(explode, batch_format="pyarrow")


@_register("q_rank_score", _RANK_SCORE_SQL)
def q_rank_score(sf_dir: str):
    """Rank-based LM quality proxy: each token scored by its global
    frequency rank (common token = low rank), per-doc mean in integer
    milli-units — an order-independent, exactly-replayable stand-in for
    unigram-LM perplexity scoring.  The corpus rank table is the engine's
    distributed sort_elements order (q_term_freq), assembled INSIDE a Ray
    task (the driver never holds the vocabulary) and broadcast once; the
    corpus pass is shuffle-free index_in + gather.  Above the broadcast
    byte budget (`ONTOEA_BROADCAST_BUDGET_BYTES`) the same score runs as a
    token-exploded hash join + per-doc keyed aggregate instead."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.state.ids import rank_by_frequency, token_frequencies

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    ranked = rank_by_frequency(token_frequencies(docs), key="token")
    ranked, lk_ref = assemble_table_ref(ranked, columns=["token", "rank"])

    if lk_ref is None:  # web-scale vocabulary: distributed join plan
        from ontoea_ray.functions.join import hash_join
        from ontoea_ray.functions.shuffle import keyed_aggregate

        vocab = ranked.select_columns(["token", "rank"])
        j = hash_join(_tokens_exploded(docs), vocab, on=["token"])
        agg = keyed_aggregate(j, ["doc_id"], sums=["rank"], count_alias="n_tokens")

        def final(b: pa.Table) -> pa.Table:
            s = np.asarray(b["rank"].combine_chunks(), np.int64)
            n = np.asarray(b["n_tokens"].combine_chunks(), np.int64)
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                    "sum_rank": pa.array(s),
                    "n_tokens": pa.array(n),
                    "mean_rank_milli": pa.array((1000 * s) // n),
                }
            )

        return agg.map_batches(final, batch_format="pyarrow")

    class Score:
        def __init__(self):
            t = ray.get(lk_ref)  # zero-copy arrow from the object store
            self.lookup = t.column("token").combine_chunks()
            self.ranks = t.column("rank").combine_chunks().to_numpy(zero_copy_only=False)

        def __call__(self, b: pa.Table) -> pa.Table:
            from ontoea_ray.functions.text import tokenize

            toks = tokenize(b["text"])
            offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            idx = pc.index_in(toks.flatten(), value_set=self.lookup)
            r = self.ranks[np.asarray(idx.cast(pa.int64()), np.int64)]
            csum = np.concatenate([[0], np.cumsum(r)])
            sums = csum[offs[1:]] - csum[offs[:-1]]
            n = np.diff(offs)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "sum_rank": pa.array(sums.astype(np.int64)),
                    "n_tokens": pa.array(n.astype(np.int64)),
                    "mean_rank_milli": pa.array((1000 * sums) // n),
                }
            )

    from ontoea_ray.stages.scan_link import default_pool_size

    return docs.map_batches(
        Score, batch_format="pyarrow", concurrency=default_pool_size(None)
    )


_CHUNK_W, _CHUNK_S = 64, 48

_CHUNK_WINDOWS_SQL = f"""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    st AS (SELECT doc_id, t, unnest(range(0, len(t), {_CHUNK_S})) AS s FROM tok)
    SELECT doc_id,
           CAST(s // {_CHUNK_S} AS BIGINT) AS chunk_id,
           CAST(least(s + {_CHUNK_W}, len(t)) - s AS BIGINT) AS n_tokens,
           array_to_string(t[s + 1 : least(s + {_CHUNK_W}, len(t))], ' ') AS chunk
    FROM st
"""


@_register("q_chunk_windows", _CHUNK_WINDOWS_SQL)
def q_chunk_windows(sf_dir: str):
    """Overlapping token-window chunking (context-window prep): 64-token
    windows every 48 tokens; vectorized explode (stages/sampling.
    chunk_token_windows), chunk text value-checked against DuckDB list
    slices."""
    from ontoea_ray.stages.sampling import chunk_token_windows

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return chunk_token_windows(docs, window=_CHUNK_W, stride=_CHUNK_S)


# ---------------------------------------------------------------------------
# global order statistics: deterministic shuffle, NTILE bucketing
# ---------------------------------------------------------------------------

from ontoea_ray.functions.lsh_sql import splitmix64_ctes as _sm_ctes

_DET_SHUFFLE_SQL = f"""
    WITH {_sm_ctes("documents", "doc_id")}
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY _h, doc_id) - 1 AS BIGINT) AS pos
    FROM sm3
"""


@_register("q_det_shuffle", _DET_SHUFFLE_SQL)
def q_det_shuffle(sf_dir: str):
    """Deterministic global corpus shuffle with exact position: rank rows
    by splitmix64(doc_id) (uniform, reproducible, resumable — rerunning
    yields the same training order, unlike random_shuffle).  ONE all-to-all
    (the range-partitioned sort); global positions from block-metadata
    offsets appended worker-side (stages/quantiles.with_global_rank) — the
    driver holds one int per block."""
    from ontoea_ray.stages.quantiles import with_global_rank
    from ontoea_ray.stages.sampling import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id"])

    def add_hash(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        return pa.table(
            {"doc_id": b["doc_id"], "_h": pa.array(splitmix64(d.view(np.uint64)))}
        )

    ranked = with_global_rank(
        docs.map_batches(add_hash, batch_format="pyarrow"),
        ["_h", "doc_id"],
        rank_col="pos",
    )
    return ranked.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "pos": b["pos"]}),
        batch_format="pyarrow",
    )


_NTILE_K = 8

_NTILE_SQL = f"""
    SELECT doc_id,
           CAST(NTILE({_NTILE_K}) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
    FROM documents
"""


@_register("q_ntile", _NTILE_SQL)
def q_ntile(sf_dir: str):
    """Exact global quantile bucketing (quality-score NTILE: route docs to
    curriculum tiers by corpus-wide rank, not per-block approximation).
    Global rank via sort + block-metadata offsets, then the 1-based NTILE
    assignment (first n%k buckets take one extra row) computed vectorized
    from (rank, n) — bit-equal to SQL NTILE with a unique tiebreaker."""
    from ontoea_ray.stages.quantiles import with_global_rank

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    ranked = with_global_rank(docs, ["n_chars", "doc_id"], rank_col="_rank")
    n = ranked.count()
    q, r = divmod(n, _NTILE_K)

    def bucket(b: pa.Table) -> pa.Table:
        i = np.asarray(b["_rank"].combine_chunks(), np.int64)
        cut = r * (q + 1)
        big = i // (q + 1)
        small = r + (i - cut) // max(q, 1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "bucket": pa.array(np.where(i < cut, big, small) + 1),
            }
        )

    return ranked.map_batches(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicated-span quality signal (MassiveText/RefinedWeb-style dup fraction)
# ---------------------------------------------------------------------------

_DUP_N = 4

_DUP_SPANS_SQL = f"""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i : i + {_DUP_N - 1}], ' ') AS shingle
           FROM tok, LATERAL (SELECT unnest(range(1, greatest(len(t) - {_DUP_N - 2}, 2))) AS i) r),
    cnt AS (SELECT shingle, COUNT(*) AS nd FROM sh GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(1000 * SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
             AS dup_frac_milli
    FROM sh JOIN cnt USING (shingle)
    GROUP BY 1
"""


@_register("q_dup_spans", _DUP_SPANS_SQL)
def q_dup_spans(sf_dir: str):
    """Per-doc duplicated-span fraction: how many of a doc's distinct
    4-token shingles occur in more than one document (the
    MassiveText duplicate-fraction quality signal).  Vectorized shingle
    explode (dedup.shingle_strings), then ONE shingle-hash co-location:
    with every copy of a shingle in the same partition, its global doc
    count AND the per-doc dup partials come out of the same in-partition
    pass — no shingle-count join (the earlier count -> full hash-join-back
    plan moved the corpus-sized shingle table through TWO extra exchanges
    and re-ran the explode once per consumer; 2 exchanges now vs 3)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.stages.dedup import shingle_strings

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def sh_batch(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        df = shingle_strings(b["text"], ids, _DUP_N)
        return _from_pandas_clean(df.rename(columns={"id": "doc_id"}))

    sh = docs.map_batches(sh_batch, batch_format="pyarrow")
    parted = with_partition_key(sh, ["shingle"])

    def per_part(df: pd.DataFrame) -> pa.Table:
        nd = df.groupby("shingle", sort=False)["doc_id"].transform("size")
        df["n_dup"] = (nd >= 2).astype(np.int64)
        g = (
            df.groupby("doc_id", sort=False)
            .agg(n_shingles=("n_dup", "size"), n_dup=("n_dup", "sum"))
            .reset_index()
        )
        return _from_pandas_clean(g)

    per_doc = keyed_aggregate(
        parted.groupby("pkey").map_groups(per_part, batch_format="pandas"),
        ["doc_id"],
        sums=["n_shingles", "n_dup"],
    )
    return per_doc.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_shingles": b["n_shingles"],
                "n_dup": b["n_dup"],
                "dup_frac_milli": pc.divide(
                    pc.multiply(pa.scalar(1000, pa.int64()), b["n_dup"].combine_chunks()),
                    b["n_shingles"].combine_chunks(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# graph analytics on co-occurrence / KG edge tables
# ---------------------------------------------------------------------------

_COPURCHASE_E_CTE = """
    lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
          FROM lp a JOIN lp b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
"""

_TRIANGLES_SQL = f"""
    WITH {_COPURCHASE_E_CTE}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


def _copurchase_pairs(sf_dir: str) -> ray.data.Dataset:
    """Order-co-located co-purchase pair emission (a < b part pairs sharing
    an order), with the per-order distinct FUSED into the same partition
    pass (all copies of an order share a pkey partition, so an in-partition
    drop_duplicates is exact) — one keyed exchange instead of a distinct
    aggregate followed by a second partition pass.  Pairs still carry
    cross-order multiplicity; callers dedupe on (id_a, id_b)."""
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.stages.dedup import _pairs_from_bucket_block

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    parted = with_partition_key(li, ["l_orderkey"])
    emit = _pairs_from_bucket_block(
        "l_partkey", None, keys=("l_orderkey",), distinct=True
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return emit(df.drop_duplicates(["l_orderkey", "l_partkey"]))

    return parted.groupby("pkey").map_groups(pairs, batch_format="pandas")


def _copurchase_edges(sf_dir: str) -> ray.data.Dataset:
    """Distinct co-purchase edges: pair emission + one keyed distinct."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    return keyed_aggregate(
        _copurchase_pairs(sf_dir), ["id_a", "id_b"], count_alias="_c"
    ).drop_columns(["_c"])


_COPURCHASE_CACHE: dict = {}


def _copurchase_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized distinct co-purchase edge table, one per sf_dir per
    session — the same materialized-VIEW contract as `_kg_cached`: eight
    graph queries (triangles, two-hop, assortativity, k-core, communities,
    link-predict, hyperball, pagerank) derive from the same edge table,
    and re-running the wedge-sized pair emission inside each one measures
    the emission, not the operator.  Blocks live in the (spillable) object
    store; the handle lives on the driver."""
    ds = _COPURCHASE_CACHE.get(sf_dir)
    if ds is None:
        ds = _COPURCHASE_CACHE[sf_dir] = _copurchase_edges(sf_dir).materialize()
    return ds


_ASSORT_SQL = f"""
    WITH {_COPURCHASE_E_CTE},
    d AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
         FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY node)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(da.deg) AS BIGINT) AS s_da,
           CAST(SUM(db.deg) AS BIGINT) AS s_db,
           CAST(SUM(da.deg * da.deg) AS BIGINT) AS s_dada,
           CAST(SUM(db.deg * db.deg) AS BIGINT) AS s_dbdb,
           CAST(SUM(da.deg * db.deg) AS BIGINT) AS s_dadb
    FROM e JOIN d da ON e.a = da.node JOIN d db ON e.b = db.node
"""


@_register("q_assortativity", _ASSORT_SQL)
def q_assortativity(sf_dir: str):
    """Degree-assortativity moment sums over the co-purchase graph: the
    six integer moments (n, sum da, sum db, sum da², sum db², sum da·db
    across oriented edges) from which the Pearson degree-correlation
    coefficient follows exactly — emitted as BIGINTs so the oracle is
    bit-exact with no float hashing.  Degrees gather onto edges via the
    distributed hash join; moments reduce as one-row per-batch partials."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.stages.graph import _degree_table

    # cached materialized view: degree pass + two join consumers would
    # otherwise re-run the whole pair emission from lineage per consumer
    edges = _copurchase_cached(sf_dir)
    deg = _degree_table(edges, "id_a", "id_b").materialize()
    da = hash_join(edges, deg, on=["id_a"], right_on=["node"]).map_batches(
        lambda b: pa.table({"id_b": b["id_b"], "da": b["deg"]}), batch_format="pyarrow"
    )
    both = hash_join(da, deg, on=["id_b"], right_on=["node"])

    def partial(b: pa.Table) -> pa.Table:
        x = np.asarray(b["da"].combine_chunks(), np.int64)
        y = np.asarray(b["deg"].combine_chunks(), np.int64)
        return pa.table(
            {
                "n_edges": pa.array([len(x)], pa.int64()),
                "s_da": pa.array([int(x.sum())], pa.int64()),
                "s_db": pa.array([int(y.sum())], pa.int64()),
                "s_dada": pa.array([int((x * x).sum())], pa.int64()),
                "s_dbdb": pa.array([int((y * y).sum())], pa.int64()),
                "s_dadb": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    parts = pa.Table.from_pylist(
        both.map_batches(partial, batch_format="pyarrow").take_all()
    ).to_pandas()
    return pa.table({c: pa.array([int(parts[c].sum())], pa.int64()) for c in parts.columns})


def _kcore_sql(k: int, rounds: int, *, pct: int = 7) -> str:
    """Unrolled R-round k-core peel over the splitmix64-sampled co-purchase
    graph.  Every round CTE is MATERIALIZED: each e_r is referenced three
    times (twice by the degree UNION ALL, once by the survivor join), so an
    inlined chain would re-scan the base 4^R times."""
    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
    ]
    for r in range(rounds):
        p.append(
            f", d{r} AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg"
            f" FROM (SELECT a AS node FROM e{r} UNION ALL SELECT b AS node FROM e{r})"
            f" GROUP BY node)"
        )
        p.append(f", k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= {k})")
        p.append(
            f", e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}"
            f" JOIN k{r} ka ON e{r}.a = ka.node JOIN k{r} kb ON e{r}.b = kb.node)"
        )
    p.append(
        f", dF AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg"
        f" FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b AS node FROM e{rounds})"
        f" GROUP BY node)"
    )
    p.append(f"SELECT node, deg FROM dF WHERE deg >= {k}")
    return "\n".join(p)


@_register("q_kcore", _kcore_sql(6, 6))
def q_kcore(sf_dir: str):
    """6-round 6-core peel of the splitmix64-sampled (7%) co-purchase
    graph — the dense-subgraph primitive (spam-farm / mirror-cluster
    detection at corpus scale).  The sampling makes the synthetic graph
    sparse enough to cascade; the peel itself is `stages/graph.
    kcore_rounds`: combiner-first degree aggregates, survivor sets shipped
    as in-task-assembled is_in value sets under the broadcast budget
    (Bloom + exact keyed semi-join above it), fixpoint short-circuit —
    exactly the unrolled SQL's R-round semantics either way."""
    from ontoea_ray.stages.graph import kcore_rounds
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    out = kcore_rounds(sampled, k=6, rounds=6, src="id_a", dst="id_b")
    return out.map_batches(
        lambda b: pa.table(
            {"node": b["node"].combine_chunks().cast(pa.int64()),
             "deg": b["deg"].combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _mis_sql(rounds: int = 4, *, pct: int = 7) -> str:
    """Unrolled R-round deterministic Luby MIS over the splitmix64-sampled
    co-purchase graph: per round a fresh splitmix chain assigns node
    priorities (key = node * salt + round, the engine's convention), each
    surviving edge marks its worse (priority, id) endpoint as a loser,
    winners = survivors with no losing edge (isolated survivors win
    vacuously), and winners + their neighbours leave.  Round CTEs are
    MATERIALIZED — each feeds several downstream scans."""
    from ontoea_ray.functions.lsh_sql import TWO64
    from ontoea_ray.stages.graph import _MIS_SALT

    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
        ", s0 AS MATERIALIZED (SELECT a AS node FROM e0 UNION SELECT b AS node FROM e0)",
    ]
    for r in range(rounds):
        key = f"((CAST(node AS HUGEINT) * {_MIS_SALT} + {r}) % {TWO64})"
        p.append(f", pr{r} AS (SELECT node FROM s{r}),")
        p.append(splitmix64_ctes(f"pr{r}", key, sfx=f"_m{r}"))
        p.append(
            f", l{r} AS MATERIALIZED (SELECT CASE WHEN (pa._h > pb._h)"
            f" OR (pa._h = pb._h AND e{r}.a > e{r}.b)"
            f" THEN e{r}.a ELSE e{r}.b END AS node"
            f" FROM e{r} JOIN sm3_m{r} pa ON pa.node = e{r}.a"
            f" JOIN sm3_m{r} pb ON pb.node = e{r}.b)"
        )
        p.append(
            f", w{r} AS MATERIALIZED (SELECT node FROM s{r}"
            f" WHERE node NOT IN (SELECT node FROM l{r}))"
        )
        p.append(
            f", nb{r} AS (SELECT e{r}.b AS node FROM e{r} JOIN w{r} ON e{r}.a = w{r}.node"
            f" UNION SELECT e{r}.a AS node FROM e{r} JOIN w{r} ON e{r}.b = w{r}.node)"
        )
        p.append(
            f", s{r + 1} AS MATERIALIZED (SELECT node FROM s{r} WHERE node NOT IN"
            f" (SELECT node FROM w{r} UNION ALL SELECT node FROM nb{r}))"
        )
        p.append(
            f", e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}"
            f" JOIN s{r + 1} sa ON e{r}.a = sa.node JOIN s{r + 1} sb ON e{r}.b = sb.node)"
        )
    selects = [
        f"SELECT CAST(node AS BIGINT) AS node, CAST({r} AS BIGINT) AS round FROM w{r}"
        for r in range(rounds)
    ]
    p.append("\n" + "\nUNION ALL ".join(selects))
    return "\n".join(p)


@_register("q_mis", _mis_sql(4))
def q_mis(sf_dir: str):
    """4-round deterministic Luby maximal independent set over the
    splitmix64-sampled (7%) co-purchase graph — the parallel-MIS primitive
    (Luby 1986) behind distributed graph coloring / conflict-free
    scheduling, with per-round priorities splitmix64(node * salt + round)
    so the set is a pure function of the graph.  `stages/graph.mis_rounds`:
    single-task numpy scatter-or plan under the broadcast budget; in-batch
    loser emission + exact node anti-joins + frontier neighbourhoods above
    it (budget=1 test pins the plans equal)."""
    from ontoea_ray.stages.graph import mis_rounds
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return mis_rounds(sampled, rounds=4, src="id_a", dst="id_b")


_PPR_SALT = 424_242
_PPR_MOD = 8


def _ppr_sql(iters: int = 4, scale: int = 10**9, damping_pct: int = 85) -> str:
    """Unrolled integer personalized-PageRank oracle over the co-purchase
    graph, replaying `stages/graph.personalized_pagerank` exactly: seeds
    are nodes with splitmix64(node * salt) % mod == 0, initial mass
    ``scale`` on seeds / 0 elsewhere, restart base only at seeds."""
    from ontoea_ray.functions.lsh_sql import TWO64, splitmix64_ctes

    base = (100 - damping_pct) * scale // 100
    ctes = [
        _COPURCHASE_E_CTE.strip(),
        "nodes AS (SELECT DISTINCT n FROM (SELECT a AS n FROM e UNION SELECT b FROM e))",
        splitmix64_ctes(
            "nodes", f"((CAST(n AS HUGEINT) * {_PPR_SALT}) % {TWO64})", sfx="_sd"
        ).strip(),
        f"seeds AS (SELECT n FROM sm3_sd WHERE _h % {_PPR_MOD} = 0)",
        "deg AS (SELECT a AS s, COUNT(*) AS dg FROM e GROUP BY 1)",
        f"""m0 AS (SELECT nodes.n,
             CAST(CASE WHEN seeds.n IS NOT NULL THEN {scale} ELSE 0 END AS HUGEINT) AS m
             FROM nodes LEFT JOIN seeds ON seeds.n = nodes.n)""",
    ]
    for i in range(iters):
        ctes.append(
            f"r{i + 1} AS (SELECT e.b AS n, SUM(m{i}.m // deg.dg) AS recv"
            f" FROM e JOIN m{i} ON m{i}.n = e.a JOIN deg ON deg.s = e.a GROUP BY 1)"
        )
        ctes.append(
            f"m{i + 1} AS (SELECT nodes.n,"
            f" (CASE WHEN sd.n IS NOT NULL THEN {base} ELSE 0 END)"
            f" + ({damping_pct} * COALESCE(r{i + 1}.recv, 0)) // 100 AS m"
            f" FROM nodes LEFT JOIN seeds sd ON sd.n = nodes.n"
            f" LEFT JOIN r{i + 1} ON r{i + 1}.n = nodes.n)"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT CAST(n AS VARCHAR) AS node, CAST(m AS BIGINT) AS rank_units FROM m{iters}
"""


@_register("q_ppr", _ppr_sql())
def q_ppr(sf_dir: str):
    """Personalized PageRank over the co-purchase graph (`stages/graph.
    personalized_pagerank`): random walk with restart to a deterministic
    seed set (splitmix64(node * salt) % 8 == 0 — ~1/8 of nodes), the
    entity-relatedness primitive (Jeh & Widom 2003) a KG linker uses to
    rank candidates near known-good anchors.  Integer mass units keep the
    iteration bit-deterministic under any execution order; two value-equal
    plans (single-task numpy under the broadcast budget, per-round hash
    joins + keyed sums above it, seed flag carried as a node column)."""
    from ontoea_ray.stages.graph import personalized_pagerank
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def seed_rows(b: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                np.asarray(b["id_a"].combine_chunks(), np.int64),
                np.asarray(b["id_b"].combine_chunks(), np.int64),
            ]
        )
        h = splitmix64(ids.astype(np.uint64) * np.uint64(_PPR_SALT))
        return pa.table(
            {"node": pa.array(ids[h % np.uint64(_PPR_MOD) == 0], pa.int64())}
        )

    seeds = edges.map_batches(seed_rows, batch_format="pyarrow")
    return personalized_pagerank(
        edges, seeds, src="id_a", dst="id_b", iters=4
    )


_CONFIDENCE_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    tot AS (SELECT subj, SUM(n_mentions) AS t FROM kg GROUP BY 1)
    SELECT kg.subj, kg.pred, kg.obj,
           CAST((10000 * kg.n_mentions) // tot.t AS BIGINT) AS conf_bps
    FROM kg JOIN tot ON tot.subj = kg.subj
"""


@_register("q_triple_confidence", _CONFIDENCE_SQL)
def q_triple_confidence(sf_dir: str):
    """Evidence-normalized triple confidence: each flagship edge's mention
    count as basis points of its SUBJECT's total evidence — the relative-
    support score a KG consumer thresholds on before trusting an assertion
    (an edge seen twice under a subject mentioned 10,000 times is noise;
    the same count under a rare subject is signal).  One combiner-first
    per-subject sum, one subject-keyed join back (the planner broadcasts
    the totals side when it fits), one integer floor division — all
    replayed by the oracle."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    kg = _kg_cached(sf_dir)
    tot = keyed_aggregate(
        kg.map_batches(
            lambda b: pa.table({"subj": b["subj"], "t": b["n_mentions"]}),
            batch_format="pyarrow",
        ),
        ["subj"],
        sums=["t"],
    )
    joined = hash_join(kg, tot, on=["subj"])
    return joined.map_batches(
        lambda b: pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "conf_bps": pa.array(
                    10000
                    * np.asarray(b["n_mentions"].combine_chunks(), np.int64)
                    // np.asarray(b["t"].combine_chunks(), np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


@_register("q_mst")
def q_mst(sf_dir: str):
    """Minimum spanning forest of the splitmix64-weighted co-purchase
    graph (`stages/graph.boruvka_mst`) — distributed Borůvka: every
    component picks its min-weight outgoing edge each round, picked edges
    merge through pointer-jumping CC, component count at least halves per
    round.  Weights are splitmix64(a*1e5 + b) % 1e9, unique with
    overwhelming probability, so the forest is a pure function of the
    graph (ties break by (w, a, b) regardless).  No SQL oracle — MST is a
    data-dependent fixpoint no unrolled CTE expresses; correctness is
    pinned against a scalar Kruskal in pytest and the driver records the
    rows-only check."""
    from ontoea_ray.stages.graph import boruvka_mst
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def weigh(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        w = (splitmix64((a * 100000 + c).astype(np.uint64)) % np.uint64(10**9)).astype(
            np.int64
        )
        return b.append_column("w", pa.array(w, pa.int64()))

    return boruvka_mst(edges.map_batches(weigh, batch_format="pyarrow"))


def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled R-round k-truss peel over the FULL co-purchase graph (no
    sampling — co-purchase orders form cliques, so truss support is high
    and the k=12 peel cascades 115k -> 1.1k edges at sf0.01).  Each round
    enumerates every triangle (x < y < z) ONCE via the oriented 3-way
    self-join, credits all three of its edges, and keeps edges with
    support >= k-2; a zero-support edge never appears in the support
    aggregate, which is exactly the drop the threshold implies (k >= 3).
    Round CTEs are MATERIALIZED — each e_r feeds three scans of the
    triangle join plus the survivor filter."""
    thresh = k - 2
    p = ["WITH", _COPURCHASE_E_CTE, ", e0 AS MATERIALIZED (SELECT a, b FROM e)"]
    for r in range(rounds + 1):
        p.append(
            f", t{r} AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z"
            f" FROM e{r} e1 JOIN e{r} e2 ON e1.a = e2.a AND e1.b < e2.b"
            f" JOIN e{r} e3 ON e3.a = e1.b AND e3.b = e2.b)"
        )
        p.append(
            f", s{r} AS MATERIALIZED (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup"
            f" FROM (SELECT x AS a, y AS b FROM t{r}"
            f"       UNION ALL SELECT x, z FROM t{r}"
            f"       UNION ALL SELECT y, z FROM t{r}) GROUP BY a, b)"
        )
        if r < rounds:
            p.append(
                f", e{r + 1} AS MATERIALIZED"
                f" (SELECT a, b FROM s{r} WHERE sup >= {thresh})"
            )
    p.append(
        f"SELECT a AS id_a, b AS id_b, sup FROM s{rounds} WHERE sup >= {thresh}"
    )
    return "\n".join(p)


@_register("q_ktruss", _ktruss_sql(12, 4))
def q_ktruss(sf_dir: str):
    """4-round 12-truss peel of the co-purchase graph — the EDGE-peel
    dense-subgraph primitive (Cohen 2008) complementary to the k-core node
    peel: an edge survives only while it closes >= k-2 triangles in the
    surviving subgraph, so trusses isolate clique-like cores (spam rings /
    mirror clusters) that degree alone can't.  `stages/graph.ktruss_rounds`:
    single-task chunked oriented-wedge support kernel under the broadcast
    budget, wedge-emission + keyed support exchange + edge co-location
    above it — the unrolled SQL's R-round semantics either way (plan
    equality pinned by the budget=1 pytest)."""
    from ontoea_ray.stages.graph import ktruss_rounds

    edges = _copurchase_cached(sf_dir)
    out = ktruss_rounds(edges, k=12, rounds=4, src="id_a", dst="id_b")
    return out.map_batches(
        lambda b: pa.table(
            {"id_a": b["id_a"].combine_chunks().cast(pa.int64()),
             "id_b": b["id_b"].combine_chunks().cast(pa.int64()),
             "sup": b["sup"].combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def _communities_sql(rounds: int, *, pct: int = 10) -> str:
    """Unrolled R-round synchronous label propagation over the
    splitmix64-sampled co-purchase graph.  Round CTEs are MATERIALIZED
    (each l_r feeds both the next count join and — transitively — every
    later round)."""
    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
        ", nb AS MATERIALIZED (SELECT a AS node, b AS nbr FROM e0"
        "  UNION ALL SELECT b AS node, a AS nbr FROM e0)",
        ", l0 AS MATERIALIZED (SELECT DISTINCT node, node AS label FROM nb)",
    ]
    for r in range(rounds):
        p.append(
            f", n{r} AS MATERIALIZED (SELECT nb.node, l.label,"
            f" CAST(COUNT(*) AS BIGINT) AS c"
            f" FROM nb JOIN l{r} l ON nb.nbr = l.node GROUP BY nb.node, l.label)"
        )
        p.append(
            f", l{r + 1} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, ROW_NUMBER() OVER (PARTITION BY node"
            f" ORDER BY c DESC, label ASC) AS rn FROM n{r}) WHERE rn = 1)"
        )
    p.append(f"SELECT node, label FROM l{rounds}")
    return "\n".join(p)


@_register("q_communities", _communities_sql(4))
def q_communities(sf_dir: str):
    """4-round synchronous label-propagation communities over the
    splitmix64-sampled (10%) co-purchase graph — the corpus-clustering
    primitive (mirror-site / template-family grouping) complementary to
    connected components: LP finds DENSE regions without an explicit
    same-as edge.  `stages/communities.labelprop_rounds`: single-task
    numpy mode-rounds under the broadcast budget, per-round join +
    combiner count + node-co-located argmax above it — exactly the
    unrolled SQL's R-round semantics (max neighbour-label count, ties to
    the smallest label) either way."""
    from ontoea_ray.stages.communities import labelprop_rounds
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(10)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    out = labelprop_rounds(sampled, rounds=4, src="id_a", dst="id_b")
    return out.map_batches(
        lambda b: pa.table(
            {"node": b["node"].combine_chunks().cast(pa.int64()),
             "label": b["label"].combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


# Above this many distinct edges the broadcast CSR (~24 B/edge per worker)
# stops fitting comfortably in worker heaps; fall back to the exchange plan
# (wedge emission -> hash-join against the edge set), which never holds the
# graph in one place.  Env-tunable for bigger-RAM clusters.
def _graph_broadcast_max_edges() -> int:
    import os

    return int(os.environ.get("ONTOEA_GRAPH_BROADCAST_MAX_EDGES", 50_000_000))


def _triangles_exchange(edges: ray.data.Dataset) -> int:
    """Fallback triangle plan for graphs too big to broadcast: wedge
    emission from id_a-co-located groups, ONE distributed hash-join of
    wedges against the edge set (the node-iterator join form)."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.stages.dedup import _pairs_from_bucket_block

    ep = with_partition_key(edges, ["id_a"])
    emit = _pairs_from_bucket_block("id_b", None, keys=("id_a",), distinct=False)
    wedges = ep.groupby("pkey").map_groups(
        lambda df: emit(df), batch_format="pandas"
    )
    closed = hash_join(
        edges.map_batches(
            lambda b: pa.table({"id_a": b["id_a"], "id_b": b["id_b"]}),
            batch_format="pyarrow",
        ),
        wedges,
        on=["id_a", "id_b"],
    )
    return closed.count()


@_register("q_triangles", _TRIANGLES_SQL)
def q_triangles(sf_dir: str):
    """Triangle counting on the co-purchase graph.  The wedge expansion
    (sum deg^2: 49M at sf0.1) dwarfs the edge set (1.2M), so the edge set is
    the broadcast side: ship the oriented CSR once via ray.put and expand +
    membership-test wedges worker-locally (stages/graph.triangle_count_
    broadcast) — zero wedge bytes shuffled (measured 185 s -> 6 s at sf0.1
    vs the wedge-join plan, which remains the documented fallback above
    the broadcast edge budget)."""
    from ontoea_ray.stages.graph import triangle_count_broadcast

    edges = _copurchase_cached(sf_dir)
    if edges.count() <= _graph_broadcast_max_edges():
        n = triangle_count_broadcast(edges)
    else:
        n = _triangles_exchange(edges)
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


_CLUSTERING_SQL = f"""
    WITH {_COPURCHASE_E_CTE},
    t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1 JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    cr AS (SELECT x AS n FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t),
    tc AS (SELECT n, COUNT(*) AS tri FROM cr GROUP BY n),
    d AS (SELECT n, COUNT(*) AS deg
          FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n)
    SELECT d.n AS node, CAST(COALESCE(tc.tri, 0) AS BIGINT) AS tri,
           CAST(d.deg AS BIGINT) AS deg
    FROM d LEFT JOIN tc ON tc.n = d.n
"""


@_register("q_clustering_coef", _CLUSTERING_SQL)
def q_clustering_coef(sf_dir: str):
    """Per-node local clustering counts over the co-purchase graph
    (`stages/graph.clustering_counts`): (node, tri, deg) — the clustering
    coefficient tri/(deg*(deg-1)/2) left as a ratio of exact integers so
    the value hash is drift-proof.  Under the broadcast budget the k-truss
    per-edge support kernel runs once and folds to nodes (tri(v) =
    sum of incident-edge supports / 2); above it the wedge-join fallback
    carries the wedge center so each closed wedge explodes to its three
    node credits.  The oracle enumerates every oriented triangle once and
    credits all three corners."""
    from ontoea_ray.stages.graph import clustering_counts

    return clustering_counts(_copurchase_cached(sf_dir))


_TWO_HOP_SQL = f"""
    WITH {_COPURCHASE_E_CTE}
    SELECT e1.a AS node, CAST(COUNT(DISTINCT e2.b) AS BIGINT) AS n_two_hop
    FROM e e1 JOIN e e2 ON e1.b = e2.a
    GROUP BY 1
"""


def _two_hop_exchange(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Fallback 2-hop plan for graphs too big to broadcast: hash self-join
    on the mid node, keyed distinct, per-node count — two exchanges."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    left = edges.map_batches(
        lambda b: pa.table({"node": b["id_a"], "mid": b["id_b"]}),
        batch_format="pyarrow",
    )
    right = edges.map_batches(
        lambda b: pa.table({"mid": b["id_a"], "nb": b["id_b"]}),
        batch_format="pyarrow",
    )
    hops = hash_join(left, right, on=["mid"])
    dist = keyed_aggregate(
        hops.map_batches(
            lambda b: pa.table({"node": b["node"], "nb": b["nb"]}),
            batch_format="pyarrow",
        ),
        ["node", "nb"],
        count_alias="_c",
    ).drop_columns(["_c"])
    return keyed_aggregate(dist, ["node"], count_alias="n_two_hop")


@_register("q_two_hop", _TWO_HOP_SQL)
def q_two_hop(sf_dir: str):
    """2-hop neighborhood size per node over the oriented co-purchase
    graph (feature propagation / graph-context prep).  The 2-hop expansion
    is wedge-sized (49M at sf0.1) while the edge set is 1.2M rows, so
    broadcast the CSR and do the two-level gather + per-segment distinct
    worker-locally (stages/graph.two_hop_counts_broadcast) — zero expansion
    bytes shuffled (74 s -> ~4 s at sf0.1); the self-join + keyed-distinct
    plan remains the fallback above the broadcast edge budget."""
    from ontoea_ray.stages.graph import two_hop_counts_broadcast

    edges = _copurchase_cached(sf_dir)
    if edges.count() <= _graph_broadcast_max_edges():
        return two_hop_counts_broadcast(edges)
    return _two_hop_exchange(edges)


_ADJACENCY_SQL = f"""
    WITH kg AS ({{flagship}}),
    e AS (SELECT DISTINCT subj, obj FROM kg)
    SELECT subj, CAST(COUNT(*) AS BIGINT) AS degree,
           string_agg(obj, '|' ORDER BY obj) AS neighbors
    FROM e GROUP BY 1
""".format(flagship=_FLAGSHIP_SQL)


@_register("q_adjacency_list", _ADJACENCY_SQL)
def q_adjacency_list(sf_dir: str):
    """Sorted adjacency-list export of the flagship KG edge table (the
    dense serialization GNN samplers and the reference's triples_dict
    consume): distinct (subj, obj), subject-co-located map_groups, in-group
    vectorized sort + join — parity with SQL string_agg(... ORDER BY)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    kg = _kg_cached(sf_dir)
    e = keyed_aggregate(
        kg.map_batches(
            lambda b: pa.table({"subj": b["subj"], "obj": b["obj"]}),
            batch_format="pyarrow",
        ),
        ["subj", "obj"],
        count_alias="_c",
    ).drop_columns(["_c"])
    parted = with_partition_key(e, ["subj"])

    def adj(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["subj", "obj"], kind="mergesort")
        g = (
            df.groupby("subj", sort=False)["obj"]
            .agg(degree="size", neighbors="|".join)
            .reset_index()
        )
        g["degree"] = g["degree"].astype(np.int64)
        return _from_pandas_clean(g[["subj", "degree", "neighbors"]])

    return parted.groupby("pkey").map_groups(adj, batch_format="pandas")


# ---------------------------------------------------------------------------
# reshaping aggregates: pivot (long -> wide) and ROLLUP (multi-level)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_SQL = "SELECT user_id, " + ", ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
    for t in _EVENT_TYPES
) + " FROM events GROUP BY 1"


@_register("q_pivot", _PIVOT_SQL)
def q_pivot(sf_dir: str):
    """Pivot long event rows into one wide count row per user (the
    feature-table reshape).  The category set is a fixed schema decision
    (as in SQL), so each batch emits indicator columns vectorized and the
    per-user merge is an ordinary associative sum — one keyed exchange
    over combiner-sized partials."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    ev = _read(sf_dir, "events", ["user_id", "event_type"])
    cols = [f"n_{t}" for t in _EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({"user_id": df["user_id"]})
        et = df["event_type"].to_numpy()
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = (et == t).astype(np.int64)
        return _from_pandas_clean(out.groupby("user_id", sort=False).sum().reset_index())

    return keyed_aggregate(
        ev.map_batches(partial, batch_format="pandas"), ["user_id"], sums=cols
    )


_ROLLUP_SQL = """
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(n.n_name, 'ALL') AS nation,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
"""


@_register("q_rollup", _ROLLUP_SQL)
def q_rollup(sf_dir: str):
    """Hierarchical ROLLUP aggregate (region -> nation -> grand total) in
    one pass: the combiner reduces each batch to (region, nation) partials,
    each partial row is exploded into its 3 rollup levels (leaf, region,
    'ALL'), and one keyed merge sums them — rollup levels are derived from
    partials, never from a second corpus scan."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey", "n_name"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    r2name = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    n2rn = {
        nk: (r2name[rk], nn)
        for nk, rk, nn in zip(
            nat["n_nationkey"].to_pylist(),
            nat["n_regionkey"].to_pylist(),
            nat["n_name"].to_pylist(),
        )
    }
    cust_rn = {
        ck: n2rn[nk]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(cust_rn)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = batch.to_pandas()
        rn = df["o_custkey"].map(m)
        df["region"] = rn.str[0]
        df["nation"] = rn.str[1]
        df["revenue_cents"] = np.round(df["o_totalprice"] * 100).astype(np.int64)
        leaf = (
            df.groupby(["region", "nation"], sort=False)
            .agg(revenue_cents=("revenue_cents", "sum"), n_orders=("region", "size"))
            .reset_index()
        )
        lvl_region = leaf.assign(nation="ALL")
        lvl_all = leaf.assign(region="ALL", nation="ALL")
        out = pd.concat([leaf, lvl_region, lvl_all], ignore_index=True)
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return _from_pandas_clean(out)

    return keyed_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["region", "nation"],
        sums=["revenue_cents", "n_orders"],
    )


# ---------------------------------------------------------------------------
# distributed numeric reduction: per-dimension embedding moments
# ---------------------------------------------------------------------------

_EMBED_MOMENTS_SQL = """
    WITH ex AS (
      SELECT i, CAST(ROUND(embedding[i] * 1000) AS BIGINT) AS v
      FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r)
    SELECT CAST(i - 1 AS BIGINT) AS dim,
           CAST(SUM(v) AS BIGINT) AS sum_milli,
           CAST(SUM(v * v) AS BIGINT) AS sumsq_milli,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY 1
"""


@_register("q_embed_moments", _EMBED_MOMENTS_SQL)
def q_embed_moments(sf_dir: str):
    """Per-dimension embedding mean/variance moments (feature-drift and
    normalization stats): each block reduces its BxD matrix to ONE D-row
    partial (sum, sum-of-squares, count over milli-quantized values — the
    integer quantization keeps the partial->merge sums associative and
    bit-replayable; int64 holds 1e12 rows of |v|<=2 at this scale), then a
    D-row keyed merge.  Shuffle volume is D x #blocks rows regardless of
    corpus size."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    emb = _read(sf_dir, "embeddings", ["embedding"])

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        mat = np.stack(col.to_numpy(zero_copy_only=False)).astype(np.float64)
        q = np.round(mat * 1000).astype(np.int64)
        d = q.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "sum_milli": pa.array(q.sum(axis=0)),
                "sumsq_milli": pa.array((q * q).sum(axis=0)),
                "n": pa.array(np.full(d, len(b), np.int64)),
            }
        )

    return keyed_aggregate(
        emb.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        sums=["sum_milli", "sumsq_milli", "n"],
    )


# ---------------------------------------------------------------------------
# multiway join pipeline, deterministic split, k-means M-step
# ---------------------------------------------------------------------------

_SHIPPING_PRIORITY_SQL = """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch_s,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-06-01'
      AND l_shipdate > TIMESTAMP '1997-06-01'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cents DESC, o_orderkey ASC
    LIMIT 10
"""


@_register("q_shipping_priority", _SHIPPING_PRIORITY_SQL)
def q_shipping_priority(sf_dir: str):
    """TPC-H Q3-shaped 3-table pipeline: segment-filtered customers become
    a broadcast sorted key array (semi-join via searchsorted — the filter
    side is selectivity-reduced, the big sides never co-shuffle with it);
    lineitem revenue is combiner-aggregated per order BEFORE the one
    distributed hash join with date-filtered orders (the join then moves
    one row per order, not one per lineitem); top-10 via per-block top-k
    partials merged on the driver (k x #blocks rows).  Revenue uses
    FLOOR(x*100) int cents so DuckDB replays every sum exactly."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    cut = np.datetime64("1997-06-01")
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"]
    keyset = ray.put(np.sort(np.asarray(keys.combine_chunks(), np.int64)))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    def ofilt(b: pa.Table) -> pa.Table:
        ks = ray.get(keyset)
        dt = b["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        ck = np.asarray(b["o_custkey"].combine_chunks(), np.int64)
        pos = np.searchsorted(ks, ck)
        pos[pos >= len(ks)] = 0
        keep = (dt < cut) & (ks[pos] == ck) if len(ks) else np.zeros(len(b), bool)
        sel = b.filter(pa.array(keep))
        ep = sel["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": sel["o_orderkey"].combine_chunks().cast(pa.int64()),
                "order_epoch_s": pa.array(ep.astype("datetime64[s]").astype(np.int64)),
                "o_orderpriority": sel["o_orderpriority"].combine_chunks(),
            }
        )

    ofiltered = orders.map_batches(ofilt, batch_format="pyarrow")

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def rev_partial(b: pa.Table) -> pa.Table:
        sd = b["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        sel = b.filter(pa.array(sd > cut))
        df = pd.DataFrame(
            {
                "o_orderkey": np.asarray(sel["l_orderkey"].combine_chunks(), np.int64),
                "revenue_cents": np.floor(
                    sel["l_extendedprice"].combine_chunks().to_numpy()
                    * (1.0 - sel["l_discount"].combine_chunks().to_numpy())
                    * 100.0
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(
            df.groupby("o_orderkey", sort=False)["revenue_cents"].sum().reset_index()
        )

    revenue = keyed_aggregate(
        li.map_batches(rev_partial, batch_format="pyarrow"),
        ["o_orderkey"],
        sums=["revenue_cents"],
    )
    joined = hash_join(revenue, ofiltered, on=["o_orderkey"])

    def part_top(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["revenue_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10)
        return _from_pandas_clean(df)

    rows = pd.DataFrame(joined.map_batches(part_top, batch_format="pyarrow").take_all())
    rows = rows.sort_values(
        ["revenue_cents", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    return pa.table(
        {
            "o_orderkey": pa.array(rows["o_orderkey"].to_numpy(np.int64)),
            "revenue_cents": pa.array(rows["revenue_cents"].to_numpy(np.int64)),
            "order_epoch_s": pa.array(rows["order_epoch_s"].to_numpy(np.int64)),
            "o_orderpriority": pa.array(rows["o_orderpriority"].astype(str), pa.string()),
        }
    )


_HASH_SPLIT_SQL = """
    SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM (SELECT n_chars,
                 ((doc_id * 1103515245 + 12345) % 2147483648) % 10 AS b
          FROM documents)
    GROUP BY 1
"""


@_register("q_hash_split", _HASH_SPLIT_SQL)
def q_hash_split(sf_dir: str):
    """Deterministic train/val/test assignment by arithmetic id hash (the
    split must be a pure function of the stable id so re-runs, late-arriving
    shards and other teams reproduce it — never RNG, never row order): LCG
    mix -> bucket 0-9 -> 80/10/10.  Embarrassingly parallel one-pass map;
    the per-split audit aggregate is a 3-row combiner merge."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        bkt = ((d * 1103515245 + 12345) % 2147483648) % 10
        split = np.where(bkt < 8, "train", np.where(bkt == 8, "val", "test"))
        df = pd.DataFrame(
            {"split": split, "n_docs": np.ones(len(d), np.int64),
             "sum_chars": np.asarray(b["n_chars"].combine_chunks(), np.int64)}
        )
        return _from_pandas_clean(
            df.groupby("split", sort=False).agg(
                n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
            ).reset_index()
        )

    return keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["split"],
        sums=["n_docs", "sum_chars"],
    )


_KMEANS_UPDATE_SQL = """
    WITH q AS (SELECT vec_id,
                      [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                       FOR i IN range(1, 65)] AS qv
               FROM embeddings),
    cents AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 4),
    scores AS (SELECT q.vec_id, cents.cid,
                      CAST(list_sum([q.qv[i] * cents.cv[i] FOR i IN range(1, 65)]) AS BIGINT) AS score
               FROM q CROSS JOIN cents),
    best AS (SELECT vec_id, cid,
                    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
             FROM scores),
    assign AS (SELECT vec_id, cid FROM best WHERE rn = 1),
    ex AS (SELECT a.cid, i - 1 AS dim, q.qv[i] AS v
           FROM assign a JOIN q USING (vec_id),
                LATERAL (SELECT unnest(range(1, 65)) AS i) r)
    SELECT CAST(cid AS BIGINT) AS centroid, CAST(dim AS BIGINT) AS dim,
           CAST(SUM(v) AS BIGINT) AS sum_milli, CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY 1, 2
"""


@_register("q_kmeans_update", _KMEANS_UPDATE_SQL)
def q_kmeans_update(sf_dir: str):
    """The k-means M-step fused with the E-step in ONE corpus pass: each
    block assigns its vectors to the broadcast centroids (int64 quantized
    dots, as q_kmeans_assign) and immediately reduces to a K x D partial
    (one-hot^T @ matrix — a single matmul) plus per-centroid counts, so the
    exchange moves K x D x #blocks rows regardless of corpus size.  New
    centroids = sum_milli / n on the 256-row result."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent_rows = sorted(
        emb.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 4)), batch_format="pyarrow"
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    cq = np.floor(
        np.array([r["embedding"] for r in cent_rows], np.float64) * 1000
    ).astype(np.int64)
    cref = ray.put(cq)
    k, d = cq.shape

    def partial(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        vecs = b["embedding"].combine_chunks()
        flat = np.asarray(vecs.values, np.float32).astype(np.float64)
        mat = np.floor(flat.reshape(len(b), -1) * 1000).astype(np.int64)
        best = np.argmax(mat @ c.T, axis=1)  # first max = lowest cid
        onehot = np.zeros((len(b), k), np.int64)
        onehot[np.arange(len(b)), best] = 1
        sums = onehot.T @ mat  # (K, D)
        cnt = np.bincount(best, minlength=k).astype(np.int64)
        return pa.table(
            {
                "centroid": pa.array(np.repeat(np.arange(k, dtype=np.int64), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "sum_milli": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    parts = emb.map_batches(partial, batch_format="pyarrow")
    out = keyed_aggregate(parts, ["centroid", "dim"], sums=["sum_milli", "n"])
    # empty clusters contribute zero partial rows in SQL's inner join; the
    # engine's zero-count rows must be dropped to match
    return out.filter(expr="n > 0")


# ---------------------------------------------------------------------------
# table profiling and global-threshold outlier filtering
# ---------------------------------------------------------------------------

_PROFILE_COLS = [("doc_id", "int"), ("lang", "str"), ("source", "str"), ("n_chars", "int")]

_PROFILE_SQL = "\n    UNION ALL\n".join(
    f"""
    SELECT '{c}' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(MIN({c}) AS VARCHAR) AS min_v, CAST(MAX({c}) AS VARCHAR) AS max_v
    FROM documents"""
    for c, _ in _PROFILE_COLS
)


@_register("q_profile", _PROFILE_SQL)
def q_profile(sf_dir: str):
    """Table profiling (the data-quality audit run before any training-data
    job): per-column row/null counts and typed min/max.  Each block reduces
    to ONE row per column (O(1) partial state — no distinct sets, which at
    10^12 rows would need their own shuffle), merged by a #cols-row keyed
    aggregate; numeric min/max stay TYPED through the merge (a lexicographic
    merge of stringified ints would rank '9' > '10') and stringify only at
    the end."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    cols = _PROFILE_COLS
    docs = _read(sf_dir, "documents", [c for c, _ in cols])

    def partial(b: pa.Table) -> pa.Table:
        out = {"col": [], "n_rows": [], "n_null": [], "min_i": [], "max_i": [], "min_s": [], "max_s": []}
        for c, kind in cols:
            arr = b[c].combine_chunks()
            mm = pc.min_max(arr)
            out["col"].append(c)
            out["n_rows"].append(len(b))
            out["n_null"].append(arr.null_count)
            if kind == "int":
                out["min_i"].append(mm["min"].as_py())
                out["max_i"].append(mm["max"].as_py())
                out["min_s"].append(None)
                out["max_s"].append(None)
            else:
                out["min_i"].append(None)
                out["max_i"].append(None)
                out["min_s"].append(mm["min"].as_py())
                out["max_s"].append(mm["max"].as_py())
        return pa.table(
            {
                "col": pa.array(out["col"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "min_i": pa.array(out["min_i"], pa.int64()),
                "max_i": pa.array(out["max_i"], pa.int64()),
                "min_s": pa.array(out["min_s"], pa.string()),
                "max_s": pa.array(out["max_s"], pa.string()),
            }
        )

    merged = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["col"],
        sums=["n_rows", "n_null"],
        mins=["min_i", "min_s"],
        maxs=["max_i", "max_s"],
    )

    def finish(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        is_int = df["min_s"].isna()
        mn = np.where(is_int, df["min_i"].map(lambda v: None if pd.isna(v) else str(int(v))), df["min_s"])
        mx = np.where(is_int, df["max_i"].map(lambda v: None if pd.isna(v) else str(int(v))), df["max_s"])
        return pa.table(
            {
                "col": pa.array(df["col"], pa.string()),
                "n_rows": pa.array(df["n_rows"].to_numpy(np.int64)),
                "n_null": pa.array(df["n_null"].to_numpy(np.int64)),
                "min_v": pa.array(mn, pa.string()),
                "max_v": pa.array(mx, pa.string()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_OUTLIER_FILTER_SQL = """
    WITH o AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS idx
               FROM documents),
    n AS (SELECT COUNT(*) AS cnt FROM documents),
    thr AS (SELECT
      (SELECT n_chars FROM o, n WHERE idx = CAST(FLOOR(0.01 * (cnt - 1)) AS BIGINT)) AS lo,
      (SELECT n_chars FROM o, n WHERE idx = CAST(FLOOR(0.99 * (cnt - 1)) AS BIGINT)) AS hi)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents, thr
    WHERE n_chars >= lo AND n_chars <= hi
    GROUP BY 1
"""


@_register("q_outlier_filter", _OUTLIER_FILTER_SQL)
def q_outlier_filter(sf_dir: str):
    """Global-percentile outlier filter (drop truncated fragments and
    boilerplate mega-pages outside [p1, p99] length): pass 1 computes the
    EXACT thresholds with the distributed sort + positional-block-fetch
    quantiles (driver holds 2 scalars, never the column); pass 2 is an
    embarrassingly parallel filter + per-lang combiner audit."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.quantiles import exact_quantiles

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    thr = exact_quantiles(docs, "n_chars", {"lo": 0.01, "hi": 0.99})
    vals = dict(zip(thr["q"].to_pylist(), thr["n_chars"].to_pylist()))
    lo, hi = int(vals["lo"]), int(vals["hi"])

    def partial(b: pa.Table) -> pa.Table:
        n = b["n_chars"].combine_chunks()
        sel = b.filter(pc.and_(pc.greater_equal(n, lo), pc.less_equal(n, hi)))
        df = pd.DataFrame(
            {
                "lang": sel["lang"].to_pandas(),
                "n_kept": np.ones(len(sel), np.int64),
                "sum_chars": np.asarray(sel["n_chars"].combine_chunks(), np.int64),
            }
        )
        return _from_pandas_clean(
            df.groupby("lang", sort=False).agg(
                n_kept=("n_kept", "sum"), sum_chars=("sum_chars", "sum")
            ).reset_index()
        )

    return keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        sums=["n_kept", "sum_chars"],
    )


# ---------------------------------------------------------------------------
# clickstream funnel analysis
# ---------------------------------------------------------------------------

_FUNNEL_SQL = """
    WITH a AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
    b AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN a USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > a.t1 GROUP BY 1),
    c AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN b USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > b.t2 GROUP BY 1)
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click_purchase
"""


@_register("q_funnel", _FUNNEL_SQL)
def q_funnel(sf_dir: str):
    """3-step ordered funnel (view -> click -> purchase, strictly increasing
    ts): ONE user-hash co-location, then the per-user step times come from
    three masked groupby-min transforms (no per-user Python loop, no
    self-joins — the SQL's three join+MIN rounds collapse into one pass
    because every user's rows share a partition); per-partition counts
    merge in a 1-row aggregate."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    parted = with_partition_key(ev, ["user_id"])

    def steps(df: pd.DataFrame) -> pa.Table:
        t1 = (
            df["ts"].where(df["event_type"].eq("view"))
            .groupby(df["user_id"], sort=False).transform("min")
        )
        m2 = df["event_type"].eq("click") & (df["ts"] > t1)
        t2 = df["ts"].where(m2).groupby(df["user_id"], sort=False).transform("min")
        m3 = df["event_type"].eq("purchase") & (df["ts"] > t2)
        t3 = df["ts"].where(m3).groupby(df["user_id"], sort=False).transform("min")
        per_user = pd.DataFrame(
            {"u": df["user_id"], "s1": t1.notna(), "s2": t2.notna(), "s3": t3.notna()}
        ).groupby("u", sort=False).max()
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_view": pa.array([int(per_user["s1"].sum())], pa.int64()),
                "n_view_click": pa.array([int(per_user["s2"].sum())], pa.int64()),
                "n_view_click_purchase": pa.array([int(per_user["s3"].sum())], pa.int64()),
            }
        )

    out = keyed_aggregate(
        parted.groupby("pkey").map_groups(steps, batch_format="pandas"),
        ["k"],
        sums=["n_view", "n_view_click", "n_view_click_purchase"],
    )
    return out.drop_columns(["k"])


_REVENUE_SHARE_SQL = """
    WITH r AS (SELECT n.n_nationkey AS nk,
                      SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
               FROM orders o
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey
               GROUP BY 1)
    SELECT CAST(nk AS BIGINT) AS nationkey,
           CAST(cents AS BIGINT) AS revenue_cents,
           CAST(cents * 10000 // (SELECT SUM(cents) FROM r) AS BIGINT) AS share_bps
    FROM r
"""


@_register("q_revenue_share", _REVENUE_SHARE_SQL)
def q_revenue_share(sf_dir: str):
    """Percent-of-total reshaping (per-nation revenue share in integer
    basis points): the grand total is ONE scalar produced by the same
    keyed aggregate that yields the groups — it is folded back as a
    broadcast constant in a stateless second map, never a self-join.
    Integer floor-division keeps the shares bit-replayable."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat_of = dict(
        zip(cust["c_custkey"].to_pylist(), pc.cast(cust["c_nationkey"], pa.int64()).to_pylist())
    )
    ref = ray.put(nat_of)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = pd.DataFrame(
            {
                "nationkey": pd.Series(b["o_custkey"].to_pylist()).map(m).astype(np.int64),
                "revenue_cents": np.round(
                    b["o_totalprice"].combine_chunks().to_numpy() * 100
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(
            df.groupby("nationkey", sort=False)["revenue_cents"].sum().reset_index()
        )

    per_nation = keyed_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["nationkey"],
        sums=["revenue_cents"],
    ).materialize()
    total = per_nation.sum("revenue_cents")

    def share(b: pa.Table) -> pa.Table:
        cents = np.asarray(b["revenue_cents"].combine_chunks(), np.int64)
        return pa.table(
            {
                "nationkey": b["nationkey"],
                "revenue_cents": b["revenue_cents"],
                "share_bps": pa.array(cents * 10000 // total, pa.int64()),
            }
        )

    return per_nation.map_batches(share, batch_format="pyarrow")


_MAD_SQL = """
    WITH n AS (SELECT COUNT(*) AS cnt FROM documents),
    o AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) - 1 AS idx FROM documents),
    med AS (SELECT n_chars AS m FROM o, n WHERE idx = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT)),
    d AS (SELECT ABS(n_chars - (SELECT m FROM med)) AS dev FROM documents),
    o2 AS (SELECT dev, ROW_NUMBER() OVER (ORDER BY dev) - 1 AS idx FROM d)
    SELECT CAST((SELECT m FROM med) AS BIGINT) AS median_chars,
           CAST((SELECT dev FROM o2, n WHERE idx = CAST(FLOOR(0.5 * (cnt - 1)) AS BIGINT)) AS BIGINT) AS mad_chars
"""


@_register("q_mad", _MAD_SQL)
def q_mad(sf_dir: str):
    """Median absolute deviation of document length — the robust spread
    statistic outlier rules use when corpora are heavy-tailed.  Two chained
    exact-quantile passes (each: distributed sort + positional block fetch,
    driver holds one scalar); the deviation map between them is
    embarrassingly parallel."""
    from ontoea_ray.stages.quantiles import exact_quantiles

    docs = _read(sf_dir, "documents", ["n_chars"])
    med = int(exact_quantiles(docs, "n_chars", {"m": 0.5})["n_chars"][0].as_py())
    dev = docs.map_batches(
        lambda b: pa.table(
            {"dev": pc.abs(pc.subtract(b["n_chars"].combine_chunks().cast(pa.int64()), med))}
        ),
        batch_format="pyarrow",
    )
    mad = int(exact_quantiles(dev, "dev", {"m": 0.5})["dev"][0].as_py())
    return pa.table(
        {"median_chars": pa.array([med], pa.int64()), "mad_chars": pa.array([mad], pa.int64())}
    )


_EVENT_GAP_SQL = """
    WITH e AS (SELECT user_id, ts, event_id,
                      CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
               FROM events),
    g AS (SELECT user_id,
                 ts_s - LAG(ts_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS gap_s
          FROM e),
    b AS (SELECT CASE WHEN gap_s <= 0 THEN -1
                      ELSE CAST(FLOOR(LOG2(gap_s)) AS BIGINT) END AS bucket
          FROM g WHERE gap_s IS NOT NULL)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n FROM b GROUP BY 1
"""


@_register("q_event_gap_hist", _EVENT_GAP_SQL)
def q_event_gap_hist(sf_dir: str):
    """Inter-event gap histogram (log2-bucketed seconds between a user's
    consecutive events — the inter-arrival profile sessionization windows
    are tuned from): ONE user-hash co-location, in-partition (user, ts,
    event_id) sort + vectorized diff, then a log2 bucket combiner count.
    floor(log2(int)) is IEEE-exact at bucket boundaries (powers of two are
    exact doubles), so DuckDB replays every bucket."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    parted = with_partition_key(ev, ["user_id"])

    def gaps(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_s = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        uid = df["user_id"].to_numpy(np.int64)
        gap = np.diff(ts_s)
        same = uid[1:] == uid[:-1]
        gap = gap[same]
        bucket = np.full(len(gap), -1, np.int64)
        pos = gap > 0
        bucket[pos] = np.floor(np.log2(gap[pos])).astype(np.int64)
        out = pd.DataFrame({"bucket": bucket})
        g = out.groupby("bucket", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        parted.groupby("pkey").map_groups(gaps, batch_format="pandas"),
        ["bucket"],
        sums=["n"],
    )


_LANG_CENTROID_SQL = """
    WITH j AS (SELECT d.lang, e.embedding
               FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    ex AS (SELECT lang, i - 1 AS dim,
                  CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS v
           FROM j, LATERAL (SELECT unnest(range(1, 65)) AS i) r)
    SELECT lang, CAST(dim AS BIGINT) AS dim, CAST(SUM(v) AS BIGINT) AS sum_milli,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM ex GROUP BY 1, 2
"""


@_register("q_lang_centroid", _LANG_CENTROID_SQL)
def q_lang_centroid(sf_dir: str):
    """Per-language embedding centroid sums (grouped-by-METADATA matrix
    reduction — the domain/language drift monitor): one distributed hash
    join ships each vector to its metadata row once, then every block
    reduces its slab with one one-hot^T @ matrix multiply per local lang
    set, so the final exchange is (#langs x D x #blocks) rows regardless
    of corpus size.  Milli-quantized int64 sums keep it bit-replayable."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    docs = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        lambda b: pa.table({"vec_id": b["doc_id"], "lang": b["lang"]}),
        batch_format="pyarrow",
    )
    joined = hash_join(emb, docs, on=["vec_id"])

    def partial(b: pa.Table) -> pa.Table:
        vecs = b["embedding"].combine_chunks()
        flat = np.asarray(vecs.values, np.float32).astype(np.float64)
        q = np.floor(flat.reshape(len(b), -1) * 1000).astype(np.int64)
        d = q.shape[1]
        langs, codes = np.unique(
            np.asarray(b["lang"].combine_chunks().to_pandas()), return_inverse=True
        )
        k = len(langs)
        onehot = np.zeros((len(b), k), np.int64)
        onehot[np.arange(len(b)), codes] = 1
        sums = onehot.T @ q  # (k, D)
        cnt = np.bincount(codes, minlength=k).astype(np.int64)
        return pa.table(
            {
                "lang": pa.array(np.repeat(langs, d), pa.string()),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "sum_milli": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    return keyed_aggregate(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["lang", "dim"],
        sums=["sum_milli", "n"],
    )


# ---------------------------------------------------------------------------
# round-2 batch 9: CUBE, sufficient-statistics, mode, bottom-k sample,
# skyline, JSON extraction, daily-active / retention, trigrams, cluster rep
# ---------------------------------------------------------------------------

_CUBE_SQL = """
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           COALESCE(o.o_orderpriority, 'ALL') AS priority,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE(r.r_name, o.o_orderpriority)
"""


@_register("q_cube", _CUBE_SQL)
def q_cube(sf_dir: str):
    """CUBE multi-dimensional aggregate (all 4 grouping sets of
    region x priority) in ONE corpus pass: the combiner reduces each batch
    to (region, priority) leaf partials, each partial row is exploded into
    its 4 cube levels, and one keyed merge sums them — like q_rollup but
    over the full lattice, so shuffle volume is 4 x leaf-partials rows."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    r2name = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    n2r = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_regionkey"].to_pylist()))
    c2region = {
        ck: r2name[n2r[nk]]
        for ck, nk in zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist())
    }
    ref = ray.put(c2region)
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        df = batch.to_pandas()
        df["region"] = df["o_custkey"].map(m)
        df["priority"] = df["o_orderpriority"]
        df["revenue_cents"] = np.round(df["o_totalprice"] * 100).astype(np.int64)
        leaf = (
            df.groupby(["region", "priority"], sort=False)
            .agg(revenue_cents=("revenue_cents", "sum"), n_orders=("region", "size"))
            .reset_index()
        )
        out = pd.concat(
            [
                leaf,
                leaf.assign(priority="ALL"),
                leaf.assign(region="ALL"),
                leaf.assign(region="ALL", priority="ALL"),
            ],
            ignore_index=True,
        )
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return _from_pandas_clean(out)

    return keyed_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["region", "priority"],
        sums=["revenue_cents", "n_orders"],
    )


_CORR_STATS_SQL = """
    WITH s AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                      CAST(ROUND(l_extendedprice) AS BIGINT) AS y
               FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sum_x,
           CAST(SUM(y) AS BIGINT) AS sum_y,
           CAST(SUM(x * x) AS BIGINT) AS sum_xx,
           CAST(SUM(y * y) AS BIGINT) AS sum_yy,
           CAST(SUM(x * y) AS BIGINT) AS sum_xy
    FROM s
"""


@_register("q_corr_stats", _CORR_STATS_SQL)
def q_corr_stats(sf_dir: str):
    """Pearson-correlation sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy)
    over quantity vs price in ONE pass: every block reduces to a single
    6-value row, the merge is a constant-size global sum — the pattern for
    any moment/covariance statistic at 100 TB (the float correlation is a
    driver-side O(1) epilogue, kept out of the oracle to stay integer-exact)."""
    from ray.data.aggregate import Sum as RSum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["l_quantity"].to_numpy(zero_copy_only=False), np.int64)
        # DuckDB ROUND is half-away-from-zero; np.round is half-even —
        # prices are positive so floor(y + 0.5) replays the oracle exactly
        yf = np.asarray(batch["l_extendedprice"].to_numpy(zero_copy_only=False))
        y = np.floor(yf + 0.5).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sum_x": pa.array([int(x.sum())], pa.int64()),
                "sum_y": pa.array([int(y.sum())], pa.int64()),
                "sum_xx": pa.array([int((x * x).sum())], pa.int64()),
                "sum_yy": pa.array([int((y * y).sum())], pa.int64()),
                "sum_xy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    cols = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[RSum(c, alias_name=c) for c in cols]
    )
    return pa.table({c: pa.array([int(agg[c])], pa.int64()) for c in cols})


_USER_MODE_SQL = """
    WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
          FROM c)
    SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1
"""


@_register("q_user_mode", _USER_MODE_SQL)
def q_user_mode(sf_dir: str):
    """Per-key modal value (most frequent event_type per user, ties to the
    lexicographically smallest): per-batch (user, type) count partials,
    ONE user-co-located exchange, in-partition vectorized count-merge +
    argmax — mode never needs raw rows to shuffle, only count partials."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["user_id", "event_type"], sort=False).size().reset_index(name="n")
        return _from_pandas_clean(g)

    def mode(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False)["n"].sum().reset_index()
        g = g.sort_values(
            ["user_id", "n", "event_type"], ascending=[True, False, True], kind="mergesort"
        )
        out = g.groupby("user_id", sort=False).head(1).rename(columns={"event_type": "mode_type"})
        out["n"] = out["n"].astype(np.int64)
        return out[["user_id", "mode_type", "n"]]

    parts = compact(ev.map_batches(partial, batch_format="pandas"))
    parted = with_partition_key(parts, ["user_id"])
    return parted.groupby("pkey").map_groups(mode, batch_format="pandas")


def _bottomk_sql() -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    return f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT doc_id FROM sm3 ORDER BY _h, doc_id LIMIT 100
    """


@_register("q_bottomk_sample", _bottomk_sql())
def q_bottomk_sample(sf_dir: str):
    """Deterministic fixed-SIZE sample (k=100) via bottom-k-by-hash — the
    distributed, mergeable equivalent of reservoir sampling: each block
    keeps its k smallest splitmix64(doc_id) rows (k x #blocks partial, the
    only data that ever leaves a worker), the driver merges the bounded
    partials.  Unlike rate-based hash_sample the output size is exact, and
    unlike random_sample it is reproducible and join-stable."""
    from ontoea_ray.stages.sampling import splitmix64

    k = 100
    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(ids.view(np.uint64))
        order = np.lexsort((ids, h))[:k]
        # carry the hash as an order-preserving SIGNED value (uint64 - 2^63)
        # so the partial survives row-dict materialization without overflow
        h_signed = (h[order] ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "_hs": pa.array(h_signed, pa.int64()),
            }
        )

    parts = pa.Table.from_pylist(ds.map_batches(partial, batch_format="pyarrow").take_all())
    ids = np.asarray(parts["doc_id"].to_pylist(), np.int64)
    hs = np.asarray(parts["_hs"].to_pylist(), np.int64)
    order = np.lexsort((ids, hs))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64())})


_SKYLINE_SQL = """
    WITH p AS (SELECT p_partkey,
                      CAST(p_size AS BIGINT) AS psize,
                      CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents
               FROM part)
    SELECT p_partkey, psize, price_cents
    FROM p a
    WHERE NOT EXISTS (
      SELECT 1 FROM p b
      WHERE b.psize >= a.psize AND b.price_cents >= a.price_cents
        AND (b.psize > a.psize OR b.price_cents > a.price_cents))
"""


def _pareto_front(df: pd.DataFrame) -> pd.DataFrame:
    """2-D maximal (Pareto) front of (psize, price_cents), vectorized:
    sort size-desc, keep a size group's max-cents rows iff that max
    strictly exceeds the running max over all larger sizes."""
    df = df.sort_values(["psize", "price_cents"], ascending=False, kind="mergesort")
    gmax = df.groupby("psize", sort=False)["price_cents"].max()
    prev = gmax.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    alive = gmax > prev
    keep = df["psize"].map(alive) & (df["price_cents"] == df["psize"].map(gmax))
    return df[keep.to_numpy(bool)]


@_register("q_skyline", _SKYLINE_SQL)
def q_skyline(sf_dir: str):
    """Skyline / Pareto-front query (parts not dominated on
    (size, price)): each block computes ITS local front — a superset of
    the global front, typically O(log n) rows — and only fronts ever leave
    the workers; the driver reduces the bounded union of fronts with the
    same vectorized kernel.  The oracle is the quadratic NOT EXISTS
    dominance SQL."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "p_partkey": np.asarray(batch["p_partkey"].to_numpy(zero_copy_only=False), np.int64),
                "psize": np.asarray(batch["p_size"].to_numpy(zero_copy_only=False), np.int64),
                "price_cents": np.round(
                    np.asarray(batch["p_retailprice"].to_numpy(zero_copy_only=False)) * 100
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(_pareto_front(df))

    fronts = pa.Table.from_pylist(ds.map_batches(partial, batch_format="pyarrow").take_all())
    final = _pareto_front(fronts.to_pandas())
    return pa.table(
        {
            "p_partkey": pa.array(final["p_partkey"].to_numpy(np.int64), pa.int64()),
            "psize": pa.array(final["psize"].to_numpy(np.int64), pa.int64()),
            "price_cents": pa.array(final["price_cents"].to_numpy(np.int64), pa.int64()),
        }
    )


_JSON_EXTRACT_SQL = """
    SELECT event_type,
           CAST(SUM(COALESCE(TRY_CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT), 0)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
"""


@_register("q_json_extract", _JSON_EXTRACT_SQL)
def q_json_extract(sf_dir: str):
    """Semi-structured field extraction (JSON props column -> typed int)
    aggregated per event type: the extraction is ONE vectorized RE2 kernel
    per batch (pyarrow.compute.extract_regex — no Python-level JSON parse
    per row), mirrored exactly by DuckDB's regexp_extract; non-matches
    count 0.  The web-payload pattern: parse-at-read, aggregate partials."""
    from ontoea_ray.functions.shuffle import compact
    from ray.data.aggregate import Sum as RSum

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"].combine_chunks(), r'"k": (?P<v>[0-9]+)')
        v = pc.cast(pc.struct_field(ext, "v"), pa.int64())
        v = pc.fill_null(v, 0)
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pandas(),
                "sum_k": v.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("event_type", sort=False).agg(
            sum_k=("sum_k", "sum"), n=("sum_k", "size")
        ).reset_index()
        return _from_pandas_clean(g)

    return (
        compact(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("event_type")
        .aggregate(RSum("sum_k", alias_name="sum_k"), RSum("n", alias_name="n"))
    )


_DAILY_ACTIVE_SQL = """
    SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
"""


@_register("q_daily_active", _DAILY_ACTIVE_SQL)
def q_daily_active(sf_dir: str):
    """Daily active users (exact COUNT DISTINCT per window): two-level
    reduction — per-batch (day, user) partials collapse duplicates early,
    one keyed exchange makes them globally distinct, a second tiny
    aggregate counts per day.  The shuffle carries (day x active-user)
    rows, never raw events."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        day_epoch = pc.divide(day.cast(pa.int64()), 1_000_000)
        df = pd.DataFrame(
            {
                "day_epoch": day_epoch.to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_pandas(),
            }
        )
        g = df.groupby(["day_epoch", "user_id"], sort=False).size().reset_index(name="n_events")
        return _from_pandas_clean(g)

    day_user = keyed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day_epoch", "user_id"],
        sums=["n_events"],
    )
    return keyed_aggregate(
        day_user, ["day_epoch"], sums=["n_events"], count_alias="n_users"
    ).map_batches(
        lambda b: pa.table(
            {"day_epoch": b["day_epoch"], "n_users": b["n_users"], "n_events": b["n_events"]}
        ),
        batch_format="pyarrow",
    )


_RETENTION_SQL = """
    WITH d AS (SELECT DISTINCT user_id,
                      CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch
               FROM events),
    f AS (SELECT user_id, MIN(day_epoch) AS cohort FROM d GROUP BY 1)
    SELECT f.cohort,
           CAST((d.day_epoch - f.cohort) // 86400 AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d JOIN f ON d.user_id = f.user_id
    GROUP BY 1, 2
"""


@_register("q_retention", _RETENTION_SQL)
def q_retention(sf_dir: str):
    """Cohort retention matrix (users active on day cohort+k, by first-seen
    cohort): per-batch distinct (user, day) partials, then ONE user-keyed
    exchange — inside a user-co-located partition the cohort is just the
    group MIN, so offsets and per-(cohort, offset) counts reduce in the
    same pass; a final tiny merge sums the per-partition counts (distinct
    users never span partitions, so counts add).  Two exchanges total,
    both over per-user-day rows, never raw events."""
    from ontoea_ray.functions.shuffle import compact, keyed_aggregate, with_partition_key

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        day_epoch = pc.divide(day.cast(pa.int64()), 1_000_000)
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_pandas(),
                "day_epoch": day_epoch.to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return _from_pandas_clean(df)

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day_epoch"])
        coh = df.groupby("user_id", sort=False)["day_epoch"].transform("min")
        out = pd.DataFrame(
            {
                "cohort": coh.to_numpy(np.int64),
                "day_offset": (df["day_epoch"].to_numpy(np.int64) - coh.to_numpy(np.int64)) // 86400,
            }
        )
        return out.groupby(["cohort", "day_offset"], sort=False).size().reset_index(name="n_users")

    parts = compact(ds.map_batches(partial, batch_format="pyarrow"))
    parted = with_partition_key(parts, ["user_id"])
    per_part = parted.groupby("pkey").map_groups(per_user, batch_format="pandas")
    return keyed_aggregate(per_part, ["cohort", "day_offset"], sums=["n_users"])


_EVENT_TRIGRAMS_SQL = """
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS n1,
             LEAD(event_type, 2) OVER w AS n2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_type AS a, n1 AS b, n2 AS c, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    GROUP BY 1, 2, 3
"""


@_register("q_event_trigrams", _EVENT_TRIGRAMS_SQL)
def q_event_trigrams(sf_dir: str):
    """Length-3 sequential patterns per user (the n-gram LM over event
    streams): user-co-located sort + double shift, counts pre-reduced per
    partition before one small keyed merge — q_event_bigrams extended one
    order, same single-exchange plan."""
    from ontoea_ray.functions.shuffle import compact, keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def trigrams(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        ok = same[:-1] & same[1:]
        part = (
            pd.DataFrame({"a": et[:-2][ok], "b": et[1:-1][ok], "c": et[2:][ok]})
            .groupby(["a", "b", "c"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return _from_pandas_clean(part)

    parted = with_partition_key(compact(ev), ["user_id"])
    per_part = parted.groupby("pkey").map_groups(trigrams, batch_format="pandas")
    return keyed_aggregate(per_part, ["a", "b", "c"], sums=["n"]).map_batches(
        lambda b: pa.table({"a": b["a"], "b": b["b"], "c": b["c"], "n": b["n"]}),
        batch_format="pyarrow",
    )


_CLUSTER_REP_SQL = f"""
    WITH cc AS ({_DUP_CLUSTER_SQL}),
    j AS (SELECT cc.component, cc.doc_id, d.n_chars
          FROM cc JOIN documents d ON cc.doc_id = d.doc_id),
    r AS (SELECT component, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY component
                                    ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM j)
    SELECT component, doc_id AS rep_doc_id FROM r WHERE rn = 1
"""


@_register("q_cluster_rep", _CLUSTER_REP_SQL)
def q_cluster_rep(sf_dir: str):
    """Canonical-document selection from near-duplicate clusters (keep the
    LONGEST member, ties to min doc_id — the keep-best flavor of dedup
    rather than keep-first): exact-Jaccard pairs -> connected components ->
    distributed hash join against the documents metadata -> per-component
    argmax.  Each stage reuses the engine's primitives (jaccard_pairs, CC,
    hash_join, argmax_by)."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import argmax_by
    from ontoea_ray.stages.dedup import jaccard_pairs
    from ontoea_ray.stages.graph import connected_components_auto

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_pairs(ds, threshold=0.5, shingle_n=3)
    cc = connected_components_auto(pairs, src="id_a", dst="id_b").map_batches(
        lambda b: pa.table({"doc_id": b["node"], "component": b["component"]}),
        batch_format="pyarrow",
    )
    meta = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    joined = hash_join(cc, meta, on=["doc_id"])

    def order_cols(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_neg_id",
            pc.negate(pc.cast(batch["doc_id"].combine_chunks(), pa.int64())),
        )

    best = argmax_by(
        joined.map_batches(order_cols, batch_format="pyarrow"),
        ["component"],
        ["n_chars", "_neg_id"],
    )
    return best.map_batches(
        lambda b: pa.table({"component": b["component"], "rep_doc_id": b["doc_id"]}),
        batch_format="pyarrow",
    )


# BPE-ish regex pre-tokenization (GPT-2-style pattern minus the lookahead,
# which RE2 — used by BOTH Arrow and DuckDB — rejects; public pattern from
# Radford et al. 2019 / the open tiktoken/GPT-2 tokenizer family)
_BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"

_REGEX_TOKENS_SQL = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens
    FROM documents
"""


@_register("q_regex_tokens", _REGEX_TOKENS_SQL)
def q_regex_tokens(sf_dir: str):
    """BPE-ish token counting (the LM cost estimator that whitespace splits
    undercount): ONE vectorized RE2 match-count kernel per batch
    (pc.count_substring_regex) — Arrow and DuckDB share the RE2 engine, so
    the oracle replays the same pattern with regexp_extract_all."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(b["text"].combine_chunks(), pattern=_BPE_PATTERN)
        return pa.table({"doc_id": b["doc_id"], "n_bpe_tokens": pc.cast(n, pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")


def _daily_uniques_sql(p: int = 8) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    nbits = 64 - p
    return f"""
    WITH base AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch, user_id
                  FROM events),
    {splitmix64_ctes("base", "user_id")},
    parts AS (SELECT day_epoch,
                     CAST(_h // {1 << nbits} AS BIGINT) AS bucket,
                     CAST(_h % {1 << nbits} AS BIGINT) AS rest
              FROM sm3)
    SELECT day_epoch, bucket,
           CAST(MAX(CASE WHEN rest = 0 THEN {nbits + 1}
                         ELSE {nbits} - length(bin(rest)) + 1 END) AS BIGINT) AS rho
    FROM parts GROUP BY 1, 2
    """


@_register("q_daily_uniques_hll", _daily_uniques_sql(p=8))
def q_daily_uniques_hll(sf_dir: str):
    """Per-WINDOW approximate distinct counts (HLL registers per day — the
    sketch shape of q_daily_active): every block reduces its rows to
    (day, bucket) -> max-rho partials, so the exchange is <= days x 2^p
    rows no matter how many raw events stream through; register tables
    merge across days/runs by max.  Registers are integer-exact (oracle);
    the float estimate comes from `stages.sketch.hll_estimate`."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.stages.sketch import hll_rho

    p = 8
    nbits = 64 - p
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        day_epoch = pc.divide(day.cast(pa.int64()), 1_000_000).to_numpy(zero_copy_only=False)
        uid = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(uid.view(np.uint64))
        bucket = (h >> np.uint64(nbits)).astype(np.int64)
        rest = h & np.uint64((1 << nbits) - 1)
        rho = hll_rho(rest, nbits)
        df = (
            pd.DataFrame({"day_epoch": day_epoch, "bucket": bucket, "rho": rho})
            .groupby(["day_epoch", "bucket"], sort=False)["rho"]
            .max()
            .reset_index()
        )
        return _from_pandas_clean(df)

    return keyed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day_epoch", "bucket"],
        maxs=["rho"],
    )


_FUZZY_PAIRS_SQL = """
    WITH n AS (SELECT DISTINCT c_name FROM customer)
    SELECT a.c_name AS name_a, b.c_name AS name_b
    FROM n a JOIN n b ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
"""


@_register("q_fuzzy_pairs", _FUZZY_PAIRS_SQL)
def q_fuzzy_pairs(sf_dir: str):
    """Edit-distance-1 surface-form pairs (stages/fuzzy.edit1_pairs): the
    near-miss canonicalization primitive for short strings where shingle
    Jaccard has no signal.  SymSpell deletion-neighborhood blocking makes
    the engine linear in vocabulary x length while the oracle pays the
    quadratic levenshtein self-join — same exact pair set (blocking is
    lossless for distance <= 1; every candidate is verified)."""
    from ontoea_ray.stages.fuzzy import edit1_pairs

    ds = _read(sf_dir, "customer", ["c_name"])
    return edit1_pairs(ds, "c_name")


def _weighted_sample_sql(k: int = 100) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    return f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT doc_id FROM sm3
    ORDER BY _h // greatest(n_chars, 1), _h, doc_id LIMIT {k}
    """


@_register("q_weighted_sample", _weighted_sample_sql(k=100))
def q_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED bottom-k sample (k=100, weight = n_chars):
    integer priority splitmix64(id) // weight makes heavier rows
    proportionally likelier to rank low — the data-mixing sampler
    (upweight long documents) with the same mergeable bottom-k shape as
    q_bottomk_sample: per-block partials, bounded driver merge, exact
    integer SQL replay."""
    from ontoea_ray.stages.sampling import splitmix64

    k = 100
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        w = np.maximum(np.asarray(batch["n_chars"].to_numpy(zero_copy_only=False), np.int64), 1)
        h = splitmix64(ids.view(np.uint64))
        prio = h // w.view(np.uint64)
        order = np.lexsort((ids, h, prio))[:k]
        sign = np.uint64(1 << 63)
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "_ps": pa.array((prio[order] ^ sign).view(np.int64), pa.int64()),
                "_hs": pa.array((h[order] ^ sign).view(np.int64), pa.int64()),
            }
        )

    parts = pa.Table.from_pylist(ds.map_batches(partial, batch_format="pyarrow").take_all())
    ids = np.asarray(parts["doc_id"].to_pylist(), np.int64)
    ps = np.asarray(parts["_ps"].to_pylist(), np.int64)
    hs = np.asarray(parts["_hs"].to_pylist(), np.int64)
    order = np.lexsort((ids, hs, ps))[:k]
    return pa.table({"doc_id": pa.array(ids[order], pa.int64())})


_ZSCORE_SQL = """
    WITH e AS (SELECT event_id, user_id,
                      CAST(FLOOR(value * 1000) AS BIGINT) AS v
               FROM events),
    s AS (SELECT user_id, COUNT(*) AS n, SUM(v) AS sv, SUM(v * v) AS svv
          FROM e GROUP BY 1)
    SELECT e.event_id, e.user_id,
           CAST((s.n * e.v - s.sv) * (s.n * e.v - s.sv)
                > 9 * (s.n * s.svv - s.sv * s.sv) AS BIGINT) AS is_outlier
    FROM e JOIN s ON e.user_id = s.user_id
"""


@_register("q_zscore_outliers", _ZSCORE_SQL)
def q_zscore_outliers(sf_dir: str):
    """Per-key z-score anomaly flags (|v - mean| > 3 sigma within each
    user), INTEGER-exact: the float test is cross-multiplied to
    (n*v - sum)^2 > 9*(n*sumsq - sum^2), so engine and oracle compare the
    same integers and the driver hash is bit-stable.  One user-co-located
    exchange; mean/var come from vectorized group transforms in the same
    pass (no second scan, no join).  int64 bound: needs n * v^2 < 2^63 per
    key — holds through v <= 1e6 milli-units and n <= 1e6 events/user;
    beyond that the comparison needs the int128 the oracle already uses."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def milli(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch["value"].combine_chunks(), 1000.0)), pa.int64())
        return pa.table({"event_id": batch["event_id"], "user_id": batch["user_id"], "v": v})

    def flags(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        g = df.groupby("user_id", sort=False)["v"]
        n = g.transform("size").to_numpy(np.int64)
        sv = g.transform("sum").to_numpy(np.int64)
        svv = (
            df.assign(vv=v * v).groupby("user_id", sort=False)["vv"].transform("sum").to_numpy(np.int64)
        )
        lhs = (n * v - sv) ** 2
        rhs = 9 * (n * svv - sv * sv)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(np.int64),
                "user_id": df["user_id"].to_numpy(np.int64),
                "is_outlier": (lhs > rhs).astype(np.int64),
            }
        )

    parted = with_partition_key(compact(ev.map_batches(milli, batch_format="pyarrow")), ["user_id"])
    return parted.groupby("pkey").map_groups(flags, batch_format="pandas")


def _rolling_uniques_sql(p: int = 8, window_days: int = 7) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    nbits = 64 - p
    return f"""
    WITH base AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch, user_id
                  FROM events),
    {splitmix64_ctes("base", "user_id")},
    parts AS (SELECT day_epoch,
                     CAST(_h // {1 << nbits} AS BIGINT) AS bucket,
                     CAST(_h % {1 << nbits} AS BIGINT) AS rest
              FROM sm3),
    win AS (SELECT day_epoch + 86400 * o AS window_end, bucket, rest
            FROM parts, LATERAL (SELECT unnest(range(0, {window_days})) AS o) r)
    SELECT window_end, bucket,
           CAST(MAX(CASE WHEN rest = 0 THEN {nbits + 1}
                         ELSE {nbits} - length(bin(rest)) + 1 END) AS BIGINT) AS rho
    FROM win GROUP BY 1, 2
    """


@_register("q_rolling_uniques_hll", _rolling_uniques_sql(p=8, window_days=7))
def q_rolling_uniques_hll(sf_dir: str):
    """ROLLING 7-day distinct-user sketch: the per-day HLL register
    partials of q_daily_uniques_hll are exploded to the 7 windows each day
    contributes to and max-merged per (window_end, bucket) — overlapping
    windows SHARE the day sketches instead of rescanning events 7x, the
    mergeability win that makes sketches the right tool for sliding
    distinct counts.  Exchange stays <= windows x 2^p rows."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.stages.sketch import hll_rho

    p, window_days = 8, 7
    nbits = 64 - p
    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch["ts"].combine_chunks(), unit="day")
        day_epoch = pc.divide(day.cast(pa.int64()), 1_000_000).to_numpy(zero_copy_only=False)
        uid = np.asarray(batch["user_id"].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(uid.view(np.uint64))
        bucket = (h >> np.uint64(nbits)).astype(np.int64)
        rho = hll_rho(h & np.uint64((1 << nbits) - 1), nbits)
        # reduce to per-day registers FIRST, then explode days -> windows
        # (7x the register partial, never 7x the events)
        df = (
            pd.DataFrame({"day_epoch": day_epoch, "bucket": bucket, "rho": rho})
            .groupby(["day_epoch", "bucket"], sort=False)["rho"]
            .max()
            .reset_index()
        )
        reps = pd.concat(
            [df.assign(window_end=df["day_epoch"] + 86400 * o) for o in range(window_days)],
            ignore_index=True,
        )
        return _from_pandas_clean(reps[["window_end", "bucket", "rho"]])

    return keyed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_end", "bucket"],
        maxs=["rho"],
    )


_LANG_MISMATCH_SQL = """
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents
    ), scores AS (
      SELECT doc_id,
        COUNT(*) FILTER (WHERE tok IN ('der','die','und','das','nicht','ist','ein')) AS s_de,
        COUNT(*) FILTER (WHERE tok IN ('the','and','of','to','a','in','is')) AS s_en,
        COUNT(*) FILTER (WHERE tok IN ('el','la','que','los','una','es','y')) AS s_es,
        COUNT(*) FILTER (WHERE tok IN ('le','la','et','les','des','un','est')) AS s_fr
      FROM toks GROUP BY doc_id
    ), pred AS (
      SELECT doc_id,
        CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
             WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_fr THEN 'es'
             ELSE 'fr' END AS pred_lang
      FROM scores)
    SELECT d.doc_id, d.lang, p.pred_lang,
           CAST(d.lang <> p.pred_lang AS BIGINT) AS mismatch
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
"""


@_register("q_lang_mismatch", _LANG_MISMATCH_SQL)
def q_lang_mismatch(sf_dir: str):
    """Metadata-quality audit: the corpus's LABELED language vs the
    content-predicted language (predict_lang), flagging disagreements —
    the mislabeled-metadata detector every crawl pipeline runs before
    per-language routing.  One pass: both columns live in the same batch,
    so prediction and comparison fuse with zero joins."""
    from ontoea_ray.functions.text import predict_lang

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def fn(b: pa.Table) -> pa.Table:
        pred = predict_lang(b["text"])
        mismatch = pc.cast(pc.invert(pc.equal(b["lang"].combine_chunks(), pred)), pa.int64())
        return pa.table(
            {"doc_id": b["doc_id"], "lang": b["lang"], "pred_lang": pred, "mismatch": mismatch}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


_PCTRANK_SQL = """
    SELECT doc_id,
           CAST((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1) * 10000
                // (COUNT(*) OVER () - 1) AS BIGINT) AS pct_rank_bps
    FROM documents
"""


@_register("q_percentile_rank", _PCTRANK_SQL)
def q_percentile_rank(sf_dir: str):
    """Exact global percentile rank in integer basis points
    (rank * 10000 // (n-1)) by document length — the corpus-wide quality
    placement signal (curriculum ordering, filtering thresholds).  Uses
    the sort + block-metadata-offset global rank (`stages/quantiles`):
    one all-to-all, ranks appended worker-side, never on the driver."""
    from ontoea_ray.stages.quantiles import with_global_rank

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    n = ds.count()
    ranked = with_global_rank(ds, ["n_chars", "doc_id"], rank_col="_r")

    def fin(b: pa.Table) -> pa.Table:
        r = np.asarray(b["_r"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "pct_rank_bps": pa.array(r * 10000 // max(n - 1, 1), pa.int64()),
            }
        )

    return ranked.map_batches(fin, batch_format="pyarrow")


_SOURCE_DUP_SQL = f"""
    WITH pairs AS ({_SHINGLE_SQL}),
    lab AS (SELECT p.id_a, p.id_b, da.source AS src_a, db.source AS src_b
            FROM pairs p
            JOIN documents da ON p.id_a = da.doc_id
            JOIN documents db ON p.id_b = db.doc_id),
    counts AS (
      SELECT least(src_a, src_b) AS source_a,
             greatest(src_a, src_b) AS source_b,
             COUNT(*) AS n_pairs
      FROM lab GROUP BY 1, 2)
    SELECT source_a, source_b, CAST(n_pairs AS BIGINT) AS n_pairs FROM counts
"""


@_register("q_source_dup_rate", _SOURCE_DUP_SQL)
def q_source_dup_rate(sf_dir: str):
    """Near-duplication structure ACROSS sources (which feeds copy which —
    mirror detection, license laundering, scraper loops): exact-Jaccard
    near-dup pairs labeled with each side's source, reduced to an
    unordered source-pair count matrix.

    The doc->source map is a dimension table (one short row per doc):
    under the broadcast budget it ships once as a sorted-id gather and
    BOTH sides label in a single map pass (no joins); above it the two
    distributed hash joins are the fallback."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.dedup import jaccard_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = jaccard_pairs(ds, threshold=0.5, shingle_n=3)
    meta = _read(sf_dir, "documents", ["doc_id", "source"])

    meta, meta_ref = assemble_table_ref(meta, columns=["doc_id", "source"])
    if meta_ref is not None:

        class _Label:
            def __init__(self):   # sort once per actor, not per batch
                import ray as _ray

                m = _ray.get(meta_ref)
                ids = m["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
                src = m["source"].combine_chunks().to_numpy(zero_copy_only=False)
                order = np.argsort(ids, kind="stable")
                self.ids, self.src = ids[order], src[order]

            def __call__(self, b: pa.Table) -> pa.Table:
                ia = np.searchsorted(self.ids, np.asarray(b["id_a"].combine_chunks(), np.int64))
                ib = np.searchsorted(self.ids, np.asarray(b["id_b"].combine_chunks(), np.int64))
                return pa.table(
                    {"src_a": pa.array(self.src[ia]), "source": pa.array(self.src[ib])}
                )

        from ontoea_ray.stages.scan_link import default_pool_size

        both = pairs.map_batches(
            _Label, batch_format="pyarrow", concurrency=default_pool_size(None)
        )
    else:
        a = hash_join(
            pairs.map_batches(
                lambda b: pa.table({"doc_id": b["id_a"], "id_b": b["id_b"]}), batch_format="pyarrow"
            ),
            meta,
            on=["doc_id"],
        ).map_batches(
            lambda b: pa.table({"doc_id": b["id_b"], "src_a": b["source"]}), batch_format="pyarrow"
        )
        both = hash_join(a, meta, on=["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        sa = b["src_a"].to_pandas()
        sb = b["source"].to_pandas()
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        df = pd.DataFrame({"source_a": lo, "source_b": hi})
        g = df.groupby(["source_a", "source_b"], sort=False).size().reset_index(name="n_pairs")
        return _from_pandas_clean(g)

    return keyed_aggregate(
        both.map_batches(partial, batch_format="pyarrow"),
        ["source_a", "source_b"],
        sums=["n_pairs"],
    )


_PRICE_HIST_SQL = """
    SELECT CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders GROUP BY 1
"""


@_register("q_price_histogram", _PRICE_HIST_SQL)
def q_price_histogram(sf_dir: str):
    """Equi-width integer histogram ($50k bins over order totals): the
    profiling primitive for choosing filter thresholds / partition ranges.
    Binning is pure arithmetic per batch, so the combiner reduces each
    block to <= #bins rows and the exchange is bins x blocks no matter the
    corpus size."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    ds = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.round(
            np.asarray(batch["o_totalprice"].to_numpy(zero_copy_only=False)) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"bin": cents // 5_000_000, "sum_cents": cents})
        g = df.groupby("bin", sort=False).agg(
            n=("sum_cents", "size"), sum_cents=("sum_cents", "sum")
        ).reset_index()
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g[["bin", "n", "sum_cents"]])

    return keyed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"), ["bin"], sums=["n", "sum_cents"]
    )


_SOURCE_TOPN_SQL = """
    SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, CAST(rn AS BIGINT) AS rn
    FROM (SELECT source, doc_id, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id ASC) AS rn
          FROM documents)
    WHERE rn <= 3
"""


@_register("q_source_topn", _SOURCE_TOPN_SQL)
def q_source_topn(sf_dir: str):
    """Top-3 longest documents per source (per-group top-k on the corpus
    metadata): block-local top-3 per source first (a correct superset), so
    the keyed exchange moves <= 3 x sources-per-block rows — the
    group_topk combiner pattern on the documents table."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key

    ds = _read(sf_dir, "documents", ["source", "doc_id", "n_chars"])

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["source", "n_chars", "doc_id"], ascending=[True, False, True], kind="mergesort"
        )
        df["rn"] = df.groupby("source", sort=False).cumcount() + 1
        return df[df["rn"] <= 3]

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return _top(df)[["source", "doc_id", "n_chars"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = _top(df)[["source", "doc_id", "n_chars", "rn"]].copy()
        out["rn"] = out["rn"].astype(np.int64)
        return out

    pruned = ds.map_batches(prune, batch_format="pandas")
    parted = with_partition_key(compact(pruned), ["source"])
    return parted.groupby("pkey").map_groups(final, batch_format="pandas")


_SIMHASH_SIG_SQL = ORACLE_SQL["q_simhash"]

_SIMHASH_PAIRS_SQL = f"""
    WITH sh AS ({_SIMHASH_SIG_SQL})
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@_register("q_simhash_pairs", _SIMHASH_PAIRS_SQL)
def q_simhash_pairs(sf_dir: str):
    """SimHash near-duplicate pairs at Hamming <= 3 (Manku WWW'07 banding:
    4 bands over the 63 stored bits, pigeonhole blocking, popcount
    verification) — the oracle pays the quadratic bit_count self-join, the
    engine one band-keyed exchange."""
    from ontoea_ray.stages.dedup import simhash_neardup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_neardup_pairs(ds, max_hamming=3)


_VOCAB_COVERAGE_SQL = """
    WITH freq AS (
      SELECT token, COUNT(*) AS c
      FROM (SELECT unnest(str_split(text, ' ')) AS token FROM documents)
      GROUP BY token),
    vocab AS (
      SELECT token FROM (
        SELECT token, ROW_NUMBER() OVER (ORDER BY c DESC, token DESC) AS rnk FROM freq)
      WHERE rnk <= 1000),
    per_doc AS (
      SELECT doc_id, tok IN (SELECT token FROM vocab) AS hit
      FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) * 10000 // COUNT(*) AS BIGINT) AS coverage_bps
    FROM per_doc GROUP BY doc_id
"""


@_register("q_vocab_coverage", _VOCAB_COVERAGE_SQL)
def q_vocab_coverage(sf_dir: str):
    """Per-document vocabulary coverage against the corpus top-1000
    frequency vocabulary (the tokenizer-prep OOV-rate signal): pass 1
    builds the ranked vocab (combiner-reduced freq + global rank), which
    broadcasts as ONE small set; pass 2 scores every document vectorized
    (pc.is_in) — no join, no re-shuffle of the corpus."""
    from ontoea_ray.state.ids import rank_by_frequency, token_frequencies
    from ontoea_ray.functions.text import tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ranked = rank_by_frequency(token_frequencies(_read(sf_dir, "documents", ["text"])), key="token")
    vocab = pa.array(
        [r["token"] for r in ranked.take_all() if r["rank"] < 1000], pa.string()
    )
    ref = ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        v = ray.get(ref)
        toks = tokenize(b["text"].combine_chunks())
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        hit = pc.is_in(toks.flatten(), value_set=v).to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(hit)])
        n_in = csum[offs[1:]] - csum[offs[:-1]]
        n_tok = np.diff(offs)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_in_vocab": pa.array(n_in, pa.int64()),
                "coverage_bps": pa.array(n_in * 10000 // np.maximum(n_tok, 1), pa.int64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


_PRED_PROFILE_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL})
    SELECT pred,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(DISTINCT subj) AS BIGINT) AS n_subjects,
           CAST(COUNT(DISTINCT obj) AS BIGINT) AS n_objects
    FROM kg GROUP BY pred
"""


@_register("q_pred_profile", _PRED_PROFILE_SQL)
def q_pred_profile(sf_dir: str):
    """Per-predicate cardinality profile over the constructed KG (edge
    count, distinct subjects/objects — the functionality / inverse-
    functionality signal ontology induction needs): runs the flagship,
    then ONE combiner pass builds per-block (pred, subj) / (pred, obj)
    distinct partials so the distinct-count exchange carries per-block
    distinct pairs, never edges."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    kg = _kg_cached(sf_dir)

    def partial(df: pd.DataFrame) -> pa.Table:
        e = df.groupby("pred", sort=False).size().reset_index(name="n_edges")
        s = df[["pred", "subj"]].drop_duplicates()
        o = df[["pred", "obj"]].drop_duplicates()
        return _from_pandas_clean(
            pd.concat(
                [
                    e.assign(kind="e", val=""),
                    s.rename(columns={"subj": "val"}).assign(kind="s", n_edges=0),
                    o.rename(columns={"obj": "val"}).assign(kind="o", n_edges=0),
                ],
                ignore_index=True,
            )[["pred", "kind", "val", "n_edges"]]
        )

    mixed = kg.map_batches(partial, batch_format="pandas")
    # distinct (pred, kind, val) with edge partial sums riding along
    dd = keyed_aggregate(mixed, ["pred", "kind", "val"], sums=["n_edges"])

    def reduce_part(df: pd.DataFrame) -> pd.DataFrame:
        kind = df["kind"].to_numpy()
        ind = pd.DataFrame(
            {
                "pred": df["pred"],
                "n_edges": df["n_edges"].to_numpy(np.int64),
                "n_subjects": (kind == "s").astype(np.int64),
                "n_objects": (kind == "o").astype(np.int64),
            }
        )
        return ind.groupby("pred", sort=False, as_index=False).sum()

    parted = with_partition_key(dd, ["pred"])
    return parted.groupby("pkey").map_groups(reduce_part, batch_format="pandas")


from ontoea_ray.stages.bpe import bpe_merges_sql


@_register("q_bpe_merges", bpe_merges_sql(n_merges=3))
def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training, first 3 merges (stages/bpe.py):
    after the frequency combiner every iteration touches only the
    VOCABULARY (pair-count exchange + bounded top-1 + vectorized replace)
    — the oracle unrolls the identical loop in SQL, including the
    non-overlapping left-to-right merge semantics."""
    from ontoea_ray.stages.bpe import bpe_merges

    ds = _read(sf_dir, "documents", ["text"])
    return bpe_merges(ds, n_merges=3)


from ontoea_ray.stages.bpe import bpe_token_counts_sql


@_register("q_bpe_tokenize", bpe_token_counts_sql(n_merges=3))
def q_bpe_tokenize(sf_dir: str):
    """Tokenizer APPLICATION: per-document subword counts under the
    3-merge BPE learned by q_bpe_merges — merges apply once to the
    vocabulary, the word -> n_subwords map broadcasts, and the corpus is
    scanned exactly once (index_in + prefix-sum gather)."""
    from ontoea_ray.stages.bpe import bpe_token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return bpe_token_counts(ds, n_merges=3)


_RECENT_WINDOW_SQL = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
    GROUP BY 1
"""


@_register("q_recent_window", _RECENT_WINDOW_SQL)
def q_recent_window(sf_dir: str):
    """Predicate pushdown at the READ: the last-7-days cutoff comes from
    the Parquet FOOTER statistics alone (no data scan), and the row filter
    is handed to read_parquet so row groups outside the window never leave
    storage — the read-pruning shape the 100 TB time-windowed jobs need
    (a scan-then-filter plan reads everything to drop most of it)."""
    import pyarrow.parquet as pqt

    path = f"{sf_dir}/events.parquet"
    md = pqt.read_metadata(path)
    ts_idx = md.schema.to_arrow_schema().get_field_index("ts")
    max_ts = max(
        md.row_group(i).column(ts_idx).statistics.max for i in range(md.num_row_groups)
    )
    cutoff = pd.Timestamp(max_ts) - pd.Timedelta(days=7)
    ds = ray.data.read_parquet(
        path,
        columns=["event_type", "ts", "value"],
        filter=(pc.field("ts") >= pa.scalar(cutoff.to_pydatetime(), pa.timestamp("us"))),
    )

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.floor(pc.multiply(batch["value"].combine_chunks(), 1000.0)), pa.int64())
        df = pd.DataFrame(
            {"event_type": batch["event_type"].to_pandas(), "v": v.to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("event_type", sort=False).agg(
            n=("v", "size"), sum_value_milli=("v", "sum")
        ).reset_index()
        return _from_pandas_clean(g)

    from ray.data.aggregate import Sum as RSum

    from ontoea_ray.functions.shuffle import compact

    return (
        compact(ds.map_batches(partial, batch_format="pyarrow"))
        .groupby("event_type")
        .aggregate(RSum("n", alias_name="n"), RSum("sum_value_milli", alias_name="sum_value_milli"))
    )


def _group_reservoir_sql(k: int = 2) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    return f"""
    WITH {splitmix64_ctes("documents", "doc_id")}
    SELECT source, doc_id FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY _h, doc_id) AS rn
      FROM sm3)
    WHERE rn <= {k}
    """


@_register("q_group_reservoir", _group_reservoir_sql(k=2))
def q_group_reservoir(sf_dir: str):
    """Exactly-k-per-group deterministic sample (k=2 docs per source) via
    per-group bottom-k-by-hash: each block keeps its local per-group
    bottom-k (a correct superset), one group-co-located exchange finishes
    — the balanced-evaluation-set sampler (unlike stratified RATE
    sampling, output size per group is exact)."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key
    from ontoea_ray.stages.sampling import splitmix64

    k = 2
    ds = _read(sf_dir, "documents", ["source", "doc_id"])

    def hashed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(ids.view(np.uint64))
        hs = (h ^ np.uint64(1 << 63)).view(np.int64)
        return pa.table(
            {"source": batch["source"], "doc_id": pa.array(ids), "_hs": pa.array(hs)}
        )

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "_hs", "doc_id"], kind="mergesort")
        return df.groupby("source", sort=False).head(k)

    pruned = ds.map_batches(hashed, batch_format="pyarrow").map_batches(
        bottomk, batch_format="pandas"
    )
    parted = with_partition_key(compact(pruned), ["source"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return bottomk(df)[["source", "doc_id"]]

    return parted.groupby("pkey").map_groups(final, batch_format="pandas")


_PEAK_CONC_SQL = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), sess AS (
      SELECT user_id, sid, MIN(ts) AS start_ts, MAX(ts) AS end_ts
      FROM s GROUP BY 1, 2
    ), st AS (SELECT DISTINCT start_ts AS t FROM sess),
    conc AS (
      SELECT t, (SELECT COUNT(*) FROM sess
                 WHERE sess.start_ts <= st.t AND sess.end_ts >= st.t) AS c
      FROM st)
    SELECT CAST(epoch(date_trunc('day', t)) AS BIGINT) AS day_epoch,
           CAST(MAX(c) AS BIGINT) AS peak
    FROM conc GROUP BY 1
"""


@_register("q_peak_concurrency", _PEAK_CONC_SQL)
def q_peak_concurrency(sf_dir: str):
    """Peak concurrent sessions per day — interval analytics via a GLOBAL
    sweep-line (`stages/temporal.peak_concurrency`): sessionize (user-co-
    located), reduce sessions to per-timestamp delta partials, one keyed
    merge, then the distributed prefix-sum gives exact concurrency at
    every start instant.  The oracle pays the quadratic overlap-count
    subquery the sweep avoids."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key
    from ontoea_ray.stages.temporal import peak_concurrency

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = (g["ts"].diff() > pd.Timedelta(minutes=30)) | new_user
        sid = gap.cumsum()
        out = (
            g.assign(_sid=sid)
            .groupby("_sid", sort=False)
            .agg(start_ts=("ts", "min"), end_ts=("ts", "max"))
            .reset_index(drop=True)
        )
        return out

    parted = with_partition_key(compact(ev), ["user_id"])
    sess = parted.groupby("pkey").map_groups(sessions, batch_format="pandas")
    return peak_concurrency(sess)

# ---------------------------------------------------------------------------
# HAVING-filtered join, outer-join count distribution, unigram-popularity
# ---------------------------------------------------------------------------

_LARGE_ORDERS_SQL = """
    WITH qty AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_centi
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity * 100.0) AS BIGINT)) > 26000)
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch_s,
           qty_centi
    FROM orders JOIN qty ON l_orderkey = o_orderkey
"""


@_register("q_large_orders", _LARGE_ORDERS_SQL)
def q_large_orders(sf_dir: str):
    """TPC-H Q18-shaped HAVING-filtered join (large-volume orders): the
    corpus-proportional side (lineitem) is reduced to one row per order by
    a combiner-first keyed aggregate, the HAVING filter then drops ~99% of
    orders BEFORE the only distributed join, so the join moves the
    selected 1%, never raw lineitems.  Quantities are FLOOR(x*100) centi
    so DuckDB replays every sum bit-exactly."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": np.asarray(b["l_orderkey"].combine_chunks(), np.int64),
                "qty_centi": np.floor(
                    b["l_quantity"].combine_chunks().to_numpy() * 100.0
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(
            df.groupby("o_orderkey", sort=False)["qty_centi"].sum().reset_index()
        )

    qty = keyed_aggregate(
        li.map_batches(partial, batch_format="pyarrow"),
        ["o_orderkey"],
        sums=["qty_centi"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b["qty_centi"], 26000)), batch_format="pyarrow"
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def oproj(b: pa.Table) -> pa.Table:
        ep = b["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
                "o_custkey": b["o_custkey"].combine_chunks().cast(pa.int64()),
                "order_epoch_s": pa.array(ep.astype("datetime64[s]").astype(np.int64)),
            }
        )

    return hash_join(
        orders.map_batches(oproj, batch_format="pyarrow"), qty, on=["o_orderkey"]
    )


_CUST_ORDER_DIST_SQL = """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
"""


@_register("q_cust_order_dist", _CUST_ORDER_DIST_SQL)
def q_cust_order_dist(sf_dir: str):
    """TPC-H Q13-shaped outer-join count distribution: non-urgent orders
    reduce to one (custkey, count) row per customer via the combiner-first
    keyed aggregate, a distributed LEFT join against the customer table
    keeps zero-order customers (null -> 0), and the final histogram
    groups by the count value — a key whose cardinality is tiny (max
    orders per customer), so the last aggregate is a narrow exchange."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def partial(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.not_equal(b["o_orderpriority"], "1-URGENT"))
        df = pd.DataFrame(
            {"c_custkey": np.asarray(sel["o_custkey"].combine_chunks(), np.int64)}
        )
        out = df.groupby("c_custkey", sort=False).size().rename("c_count").reset_index()
        return _from_pandas_clean(out)

    counts = keyed_aggregate(
        orders.map_batches(partial, batch_format="pyarrow"),
        ["c_custkey"],
        sums=["c_count"],
    )
    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda b: pa.table({"c_custkey": b["c_custkey"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    )
    joined = hash_join(cust, counts, on=["c_custkey"], how="left")

    def histo(b: pa.Table) -> pa.Table:
        cc = b["c_count"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"c_count": cc.astype(np.int64)})
        out = df.groupby("c_count", sort=False).size().rename("custdist").reset_index()
        return _from_pandas_clean(out)

    return keyed_aggregate(
        joined.map_batches(histo, batch_format="pyarrow"),
        ["c_count"],
        sums=["custdist"],
    )


_DOC_POPULARITY_SQL = """
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
    tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok)
    SELECT doc_id,
           CAST(SUM(tf.freq) AS BIGINT) AS popularity_sum,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM toks JOIN tf USING (tok) GROUP BY doc_id
"""


@_register("q_doc_popularity", _DOC_POPULARITY_SQL)
def q_doc_popularity(sf_dir: str):
    """Unigram-popularity document score (the integer-exact core of a
    unigram language-model quality signal): corpus term frequencies are
    computed distributed, broadcast ONCE per actor (natural-language
    vocabulary is sublinear in corpus size; at extreme vocabularies the
    same shape runs as a token-exploded hash join), then a second corpus
    pass scores each doc with a vectorized sorted-vocab searchsorted
    lookup + segment sum — no per-row Python, two corpus scans total."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.state.ids import token_frequencies

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tf = token_frequencies(ds)
    tf, tf_ref = assemble_table_ref(tf, columns=["token", "freq"])

    if tf_ref is None:  # web-scale vocabulary: token-exploded join plan
        from ontoea_ray.functions.join import hash_join
        from ontoea_ray.functions.shuffle import keyed_aggregate

        j = hash_join(_tokens_exploded(ds), tf, on=["token"])
        agg = keyed_aggregate(j, ["doc_id"], sums=["freq"], count_alias="n_tokens")

        def final(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                    "popularity_sum": b["freq"].combine_chunks().cast(pa.int64()),
                    "n_tokens": b["n_tokens"].combine_chunks().cast(pa.int64()),
                }
            )

        return agg.map_batches(final, batch_format="pyarrow")

    class _Score:
        def __init__(self):
            # frequency table assembled in a task; the sort for searchsorted
            # is per-actor (vocab-sized, once per actor lifetime)
            t = ray.get(tf_ref)
            vocab = np.asarray(t.column("token").to_pandas(), dtype=object)
            order = np.argsort(vocab)
            self.vocab = vocab[order]
            self.freqs = t.column("freq").combine_chunks().to_numpy(
                zero_copy_only=False
            )[order]

        def __call__(self, b: pa.Table) -> pa.Table:
            toks = tokenize(b["text"])
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = np.asarray(toks.flatten().to_pandas(), dtype=object)
            idx = np.searchsorted(self.vocab, flat)
            f = self.freqs[idx]
            seg = np.repeat(np.arange(len(b)), lens)
            pop = np.zeros(len(b), np.int64)
            np.add.at(pop, seg, f)
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                    "popularity_sum": pa.array(pop),
                    "n_tokens": pa.array(lens),
                }
            )

    from ontoea_ray.stages.scan_link import default_pool_size

    return ds.map_batches(
        _Score, batch_format="pyarrow", concurrency=default_pool_size(None)
    )


_TTR_SQL = """
    WITH toks AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
    SELECT doc_id,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM toks GROUP BY doc_id
"""


@_register("q_ttr", _TTR_SQL)
def q_ttr(sf_dir: str):
    """Type-token ratio inputs per document (lexical-diversity quality
    signal used by corpus filters): distinct-token and total-token counts
    per doc, computed entirely inside one map_batches — a doc's tokens
    never leave its block, so there is NO shuffle at any corpus size (the
    dedup is within-document by definition)."""
    from ontoea_ray.functions.text import tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pd.Series(np.asarray(toks.flatten().to_pandas(), dtype=object))
        seg = np.repeat(np.arange(len(b)), lens)
        nd = flat.groupby(seg, sort=True).nunique().reindex(range(len(b)), fill_value=0)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                "n_distinct": pa.array(nd.to_numpy(np.int64)),
                "n_tokens": pa.array(lens),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _bigrams_exploded(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus explode to (doc_id, bigram) occurrence rows — the bigram
    analogue of `_tokens_exploded`; streams, never materialized here."""
    from ontoea_ray.functions.text import tokenize

    def explode(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"])
        flat = toks.flatten().to_pandas()
        if len(flat) < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "bigram": pa.array([], pa.string())}
            )
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        start = np.zeros(len(flat) + 1, np.bool_)
        start[offs] = True
        valid = ~start[1 : len(flat)]  # pair (i, i+1) inside one document
        pairs = (
            flat.iloc[:-1].reset_index(drop=True)
            + " "
            + flat.iloc[1:].reset_index(drop=True)
        )[valid]
        doc_ids = np.repeat(
            np.asarray(b["doc_id"].combine_chunks(), np.int64), np.diff(offs)
        )[: len(flat) - 1][valid]
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "bigram": pa.array(pairs, pa.string())}
        )

    return docs.map_batches(explode, batch_format="pyarrow")


_LM_SCORE_SQL = """
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    db AS (SELECT doc_id,
                  t[unnest(range(1, len(t)))] || ' ' || t[unnest(range(2, len(t) + 1))] AS bigram
           FROM t),
    c2 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2 FROM db GROUP BY bigram),
    c1 AS (SELECT str_split(bigram, ' ')[1] AS w1, CAST(SUM(c2) AS BIGINT) AS c1
           FROM c2 GROUP BY w1),
    p AS (SELECT c2.bigram, (1000000 * c2.c2) // c1.c1 AS p
          FROM c2 JOIN c1 ON str_split(c2.bigram, ' ')[1] = c1.w1)
    SELECT db.doc_id,
           CAST(SUM(p.p) AS BIGINT) AS pred_sum,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams
    FROM db JOIN p USING (bigram) GROUP BY db.doc_id
"""


@_register("q_lm_score", _LM_SCORE_SQL)
def q_lm_score(sf_dir: str):
    """Bigram-predictability document score — the integer-exact core of an
    n-gram LM perplexity filter (the CCNet-style quality signal): each
    bigram occurrence scores the conditional probability of its second
    token given its first, as the exact rational
    ``(1e6 * count(w1 w2)) // count(w1 _)``, summed per document (low sum
    = surprising text).  Pure integer ratios, so the oracle replays every
    value bit-for-bit — no libm log to diverge.

    Scale shape: bigram counts are combiner-first (per-block partials, one
    keyed aggregate); the prefix marginal derives from the count table
    itself (never re-scans the corpus); the per-bigram score table is
    assembled INSIDE a Ray task and broadcast once per actor for a
    shuffle-free searchsorted scoring pass — above the broadcast byte
    budget the same score runs as a bigram-exploded hash join + per-doc
    keyed aggregate instead (budget=1 test pins the plans equal)."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import bigram_counts, tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    partial = ds.map_batches(
        lambda b: bigram_counts(b["text"].combine_chunks()), batch_format="pyarrow"
    )
    c2 = partial.groupby("bigram").sum("freq").map_batches(
        lambda b: pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "w1": pc.list_element(
                    pc.split_pattern(b["bigram"].combine_chunks(), pattern=" "), 0
                ),
                "c2": b["sum(freq)"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    c1 = keyed_aggregate(c2.select_columns(["w1", "c2"]), ["w1"], sums=["c2"])
    c1 = c1.map_batches(
        lambda b: pa.table(
            {"w1": b["w1"].combine_chunks(),
             "c1": b["c2"].combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )
    ptab = hash_join(c2, c1, on=["w1"]).map_batches(
        lambda b: pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "p": pc.divide(
                    pc.multiply(
                        pa.scalar(1_000_000, pa.int64()),
                        b["c2"].combine_chunks().cast(pa.int64()),
                    ),
                    b["c1"].combine_chunks().cast(pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    ptab, p_ref = assemble_table_ref(ptab, columns=["bigram", "p"])

    if p_ref is None:  # web-scale bigram vocabulary: exploded join plan
        j = hash_join(_bigrams_exploded(ds), ptab, on=["bigram"])
        agg = keyed_aggregate(j, ["doc_id"], sums=["p"], count_alias="n_bigrams")
        return agg.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
                    "pred_sum": b["p"].combine_chunks().cast(pa.int64()),
                    "n_bigrams": b["n_bigrams"].combine_chunks().cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    class _Score:
        def __init__(self):
            t = ray.get(p_ref)
            vocab = np.asarray(t.column("bigram").to_pandas(), dtype=object)
            order = np.argsort(vocab)
            self.vocab = vocab[order]
            self.p = t.column("p").combine_chunks().to_numpy(zero_copy_only=False)[
                order
            ]

        def __call__(self, b: pa.Table) -> pa.Table:
            toks = tokenize(b["text"])
            flat = toks.flatten().to_pandas()
            n = len(b)
            if len(flat) < 2:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "pred_sum": pa.array([], pa.int64()),
                     "n_bigrams": pa.array([], pa.int64())}
                )
            offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            start = np.zeros(len(flat) + 1, np.bool_)
            start[offs] = True
            valid = ~start[1 : len(flat)]
            pairs = np.asarray(
                (
                    flat.iloc[:-1].reset_index(drop=True)
                    + " "
                    + flat.iloc[1:].reset_index(drop=True)
                )[valid],
                dtype=object,
            )
            seg_all = np.repeat(np.arange(n), np.diff(offs))[: len(flat) - 1][valid]
            idx = np.searchsorted(self.vocab, pairs)
            scores = self.p[idx]  # every corpus bigram is in the table
            pred = np.zeros(n, np.int64)
            np.add.at(pred, seg_all, scores)
            cnt = np.bincount(seg_all, minlength=n).astype(np.int64)
            keep = cnt > 0  # docs with no bigram don't appear (SQL inner join)
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()).take(
                        pa.array(np.flatnonzero(keep))
                    ),
                    "pred_sum": pa.array(pred[keep]),
                    "n_bigrams": pa.array(cnt[keep]),
                }
            )

    from ontoea_ray.stages.scan_link import default_pool_size

    return ds.map_batches(
        _Score, batch_format="pyarrow", concurrency=default_pool_size(None)
    )


_PMI_MIN_COUNT = 5

_PMI_SQL = f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    db AS (SELECT t[unnest(range(1, len(t)))] || ' ' || t[unnest(range(2, len(t) + 1))] AS bigram
           FROM t),
    c2 AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c12 FROM db GROUP BY 1
           HAVING COUNT(*) >= {_PMI_MIN_COUNT}),
    uni AS (SELECT unnest(t) AS w FROM t),
    c1 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM uni)
    SELECT c2.bigram, c2.c12,
           CAST((CAST(1000000 AS HUGEINT) * c2.c12 * n.n)
                // (CAST(ca.c1 AS HUGEINT) * cb.c1) AS BIGINT) AS pmi_ppm
    FROM c2
    JOIN c1 ca ON str_split(c2.bigram, ' ')[1] = ca.w
    JOIN c1 cb ON str_split(c2.bigram, ' ')[2] = cb.w
    CROSS JOIN n
"""


@_register("q_pmi_collocations", _PMI_SQL)
def q_pmi_collocations(sf_dir: str):
    """Collocation detection by pointwise-mutual-information lift — the
    word2vec-era phrase-mining statistic (Mikolov et al. 2013's phrase
    score): for every bigram seen >= {min_count} times,
    ``pmi_ppm = (1e6 * c12 * N) // (c1a * c1b)`` with c12 the bigram
    occurrences, c1 the token occurrences, N the corpus token total —
    an exact integer rational (no libm log), so the DuckDB oracle
    replays every value via HUGEINT.

    Scale shape: bigram and unigram counts reduce combiner-first; the
    ``min_count`` filter applies BEFORE the two unigram joins, so only
    the repeated-bigram vocabulary (a vanishing fraction of all bigrams)
    rides them; N is a one-row scalar aggregate; scoring runs over the
    filtered collocation table with Python-int intermediates (the DSIR
    convention: 128-bit products, int64-overflow guard raises loudly)."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import bigram_counts
    from ontoea_ray.state.ids import token_frequencies

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    partial = ds.map_batches(
        lambda b: bigram_counts(b["text"].combine_chunks()), batch_format="pyarrow"
    )
    c2 = compact(partial).groupby("bigram").sum("freq").map_batches(
        lambda b: pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "c12": b["sum(freq)"].combine_chunks().cast(pa.int64()),
            }
        ).filter(
            pc.greater_equal(
                b["sum(freq)"].combine_chunks().cast(pa.int64()),
                pa.scalar(_PMI_MIN_COUNT, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
    c2 = c2.map_batches(
        lambda b: pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "c12": b["c12"].combine_chunks(),
                "w1": pc.list_element(
                    pc.split_pattern(b["bigram"].combine_chunks(), pattern=" "), 0
                ),
                "w2": pc.list_element(
                    pc.split_pattern(b["bigram"].combine_chunks(), pattern=" "), 1
                ),
            }
        ),
        batch_format="pyarrow",
    )
    c1 = token_frequencies(ds).materialize()  # two join consumers
    n_total = int(
        c1.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b["freq"].combine_chunks()).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("s")
    )
    ja = hash_join(c2, c1, on=["w1"], right_on=["token"]).map_batches(
        lambda b: pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "c12": b["c12"].combine_chunks(),
                "w2": b["w2"].combine_chunks(),
                "c1a": b["freq"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    jb = hash_join(ja, c1, on=["w2"], right_on=["token"])

    def score(b: pa.Table) -> pa.Table:
        c12 = b["c12"].combine_chunks().to_pylist()
        c1a = b["c1a"].combine_chunks().to_pylist()
        c1b = b["freq"].combine_chunks().to_pylist()
        imax = np.iinfo(np.int64).max
        out = []
        for x, a, bb in zip(c12, c1a, c1b):
            v = (1_000_000 * x * n_total) // (a * bb)
            if v > imax:
                raise OverflowError("pmi_ppm exceeds int64 — rescale the unit")
            out.append(v)
        return pa.table(
            {
                "bigram": b["bigram"].combine_chunks(),
                "c12": b["c12"].combine_chunks().cast(pa.int64()),
                "pmi_ppm": pa.array(out, pa.int64()),
            }
        )

    return jb.map_batches(score, batch_format="pyarrow")


_USER_ACTIVE_TIME_SQL = """
    WITH e AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    ), sess AS (
      SELECT user_id, sid,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
      FROM s GROUP BY 1, 2)
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(SUM(dur_us) AS BIGINT) AS active_us,
           CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM sess GROUP BY user_id
"""


@_register("q_user_active_time", _USER_ACTIVE_TIME_SQL)
def q_user_active_time(sf_dir: str):
    """Per-user total active time: sessionize (30-min gap) and roll the
    merged intervals up to (user, total-duration, session-count) INSIDE
    the same user-co-located map_groups — sessionization's one exchange is
    the whole job's shuffle, and durations are exact integer microseconds
    so the SQL replay is bit-identical."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = (g["ts"].diff() > pd.Timedelta(minutes=30)) | new_user
        sid = gap.cumsum()
        ns = g["ts"].astype("datetime64[ns]").astype("int64")
        sess = (
            pd.DataFrame({"user_id": g["user_id"], "_sid": sid, "_ns": ns})
            .groupby("_sid", sort=False)
            .agg(user_id=("user_id", "first"), lo=("_ns", "min"), hi=("_ns", "max"))
        )
        sess["dur_us"] = (sess["hi"] - sess["lo"]) // 1000
        out = sess.groupby("user_id", sort=False).agg(
            active_us=("dur_us", "sum"), n_sessions=("dur_us", "size")
        ).reset_index()
        out["user_id"] = out["user_id"].astype("int64")
        return out

    parted = with_partition_key(compact(ev), ["user_id"])
    return parted.groupby("pkey").map_groups(per_user, batch_format="pandas")


_CHEAPEST_SUPPLIER_SQL = """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             CAST(FLOOR(l_extendedprice * 100.0 / l_quantity) AS BIGINT) AS unit_cents
      FROM lineitem),
    best AS (
      SELECT l_partkey, l_suppkey, unit_cents,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY unit_cents ASC, l_suppkey ASC) AS rn
      FROM unit)
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
           CAST(l_suppkey AS BIGINT) AS l_suppkey,
           unit_cents
    FROM best WHERE rn = 1
"""


@_register("q_cheapest_supplier", _CHEAPEST_SUPPLIER_SQL)
def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2-shaped per-key argmin (cheapest observed supplier per
    part): reuses the combiner-first ``argmax_by`` primitive on NEGATED
    order columns, so each block first reduces to one candidate row per
    part and the single keyed exchange moves |parts-per-block| rows, never
    raw lineitems.  Unit price is FLOOR(p*100/q) — double division is
    IEEE-identical in DuckDB and numpy, so the oracle replays it."""
    from ontoea_ray.functions.shuffle import argmax_by

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.floor(
            b["l_extendedprice"].combine_chunks().to_numpy() * 100.0
            / b["l_quantity"].combine_chunks().to_numpy()
        ).astype(np.int64)
        supp = np.asarray(b["l_suppkey"].combine_chunks(), np.int64)
        return pa.table(
            {
                "l_partkey": b["l_partkey"].combine_chunks().cast(pa.int64()),
                "l_suppkey": pa.array(supp),
                "unit_cents": pa.array(cents),
                "_neg_cents": pa.array(-cents),
                "_neg_supp": pa.array(-supp),
            }
        )

    best = argmax_by(
        li.map_batches(prep, batch_format="pyarrow"),
        ["l_partkey"],
        ["_neg_cents", "_neg_supp"],
    )
    return best.map_batches(
        lambda b: b.select(["l_partkey", "l_suppkey", "unit_cents"]),
        batch_format="pyarrow",
    )


_TRADE_VOLUME_SQL = """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem, orders, customer, supplier, nation sn, nation cn
    WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = sn.n_nationkey AND c_nationkey = cn.n_nationkey
    GROUP BY 1, 2
"""


@_register("q_trade_volume", _TRADE_VOLUME_SQL)
def q_trade_volume(sf_dir: str):
    """TPC-H Q7-shaped bilateral trade matrix (supplier nation x customer
    nation revenue): the two dimension chains (supplier->nation,
    customer->nation) are broadcast as sorted int arrays — dimension-sized
    sides ship once per actor, never shuffle — while the one big-big edge
    (lineitem x orders on orderkey) is combiner-reduced per (order,
    supp_nation) BEFORE the distributed hash join, so the join moves
    ~|orders| rows.  The final nation x nation aggregate is a tiny keyed
    exchange."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nkeys = np.asarray(nation["n_nationkey"].combine_chunks(), np.int64)
    nnames = np.asarray(nation["n_name"].combine_chunks().to_pylist(), object)
    norder = np.argsort(nkeys)
    nkeys, nnames = nkeys[norder], nnames[norder]

    supp = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    skeys = np.asarray(supp["s_suppkey"].combine_chunks(), np.int64)
    snat = nnames[np.searchsorted(nkeys, np.asarray(supp["s_nationkey"].combine_chunks(), np.int64))]
    sorder = np.argsort(skeys)
    supp_map = ray.put((skeys[sorder], snat[sorder]))

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    ckeys = np.asarray(cust["c_custkey"].combine_chunks(), np.int64)
    cnat = nnames[np.searchsorted(nkeys, np.asarray(cust["c_nationkey"].combine_chunks(), np.int64))]
    corder = np.argsort(ckeys)
    cust_map = ray.put((ckeys[corder], cnat[corder]))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_partial(b: pa.Table) -> pa.Table:
        sk, sn = ray.get(supp_map)
        rev = np.floor(
            b["l_extendedprice"].combine_chunks().to_numpy()
            * (1.0 - b["l_discount"].combine_chunks().to_numpy())
            * 100.0
        ).astype(np.int64)
        snames = sn[np.searchsorted(sk, np.asarray(b["l_suppkey"].combine_chunks(), np.int64))]
        df = pd.DataFrame(
            {
                "o_orderkey": np.asarray(b["l_orderkey"].combine_chunks(), np.int64),
                "supp_nation": snames,
                "revenue_cents": rev,
            }
        )
        g = df.groupby(["o_orderkey", "supp_nation"], sort=False).agg(
            revenue_cents=("revenue_cents", "sum"), n_items=("revenue_cents", "size")
        ).reset_index()
        return _from_pandas_clean(g)

    # per-block partials join directly: they are already combiner-reduced
    # (one row per (order, supp_nation) per block), the join's own exchange
    # co-locates them by orderkey, and the final aggregate re-sums — an
    # intermediate keyed merge would add an exchange and reduce nothing
    li_red = li.map_batches(li_partial, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def o_proj(b: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_map)
        cnames = cn[np.searchsorted(ck, np.asarray(b["o_custkey"].combine_chunks(), np.int64))]
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"].combine_chunks().cast(pa.int64()),
                "cust_nation": pa.array(cnames, pa.string()),
            }
        )

    # NOTE: materializing the projected orders side to trigger the
    # broadcast plan was MEASURED SLOWER here (3.1 s vs 2.4 s at sf0.1):
    # the blocking materialize serializes the two scans that the exchange
    # plan overlaps, and the map-side pandas merge costs more than the
    # o_orderkey exchange of already-combiner-reduced rows
    joined = hash_join(li_red, orders.map_batches(o_proj, batch_format="pyarrow"), on=["o_orderkey"])
    return keyed_aggregate(
        joined, ["supp_nation", "cust_nation"], sums=["revenue_cents", "n_items"]
    )


_GROUPING_SETS_SQL = """
    WITH base AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
             CAST(ROUND(value * 1000) AS BIGINT) AS v_milli
      FROM events)
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(day_epoch, -1) AS day_epoch,
           CAST(SUM(v_milli) AS BIGINT) AS sum_value_milli,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM base
    GROUP BY GROUPING SETS ((event_type, day_epoch), (event_type), (day_epoch))
"""


@_register("q_grouping_sets", _GROUPING_SETS_SQL)
def q_grouping_sets(sf_dir: str):
    """GROUPING SETS aggregate over an ARBITRARY level list — (type, day),
    (type), (day), deliberately NOT a lattice so neither CUBE nor ROLLUP
    expresses it: the combiner reduces each batch to (type, day) leaf
    partials, explodes each partial into its 3 requested levels, and one
    keyed merge finishes — shuffle volume is levels x leaf-partials rows
    no matter the corpus size."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ns = b["ts"].combine_chunks().cast(pa.timestamp("ns")).to_numpy(zero_copy_only=False)
        day = ns.astype("datetime64[D]").astype("datetime64[s]").astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "day_epoch": day,
                "v": np.round(b["value"].combine_chunks().to_numpy() * 1000).astype(np.int64),
            }
        )
        leaf = (
            df.groupby(["event_type", "day_epoch"], sort=False)
            .agg(sum_value_milli=("v", "sum"), n=("v", "size"))
            .reset_index()
        )
        out = pd.concat(
            [leaf, leaf.assign(day_epoch=np.int64(-1)), leaf.assign(event_type="ALL")],
            ignore_index=True,
        )
        out["n"] = out["n"].astype(np.int64)
        return _from_pandas_clean(out)

    return keyed_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day_epoch"],
        sums=["sum_value_milli", "n"],
    )


_PRED_COMPOSITION_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    e AS (SELECT DISTINCT subj, pred, obj FROM kg)
    SELECT e1.pred AS pred_a, e2.pred AS pred_b,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM e e1 JOIN e e2 ON e1.obj = e2.subj
    GROUP BY 1, 2
"""


@_register("q_pred_composition", _PRED_COMPOSITION_SQL)
def q_pred_composition(sf_dir: str):
    """Predicate-composition profile over the constructed KG: how often a
    pred_a edge's object starts a pred_b edge (the 2-hop path statistics
    rule mining / ontology induction consumes).  Distinct edges via one
    keyed aggregate, then ONE distributed self-join co-located on the
    shared node (obj == subj), combiner-counted per (pred_a, pred_b) —
    path multiplicity never materializes, only pred-pair counts move."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    kg = _kg_cached(sf_dir)
    # materialize the distinct edge table ONCE: both join sides derive from
    # it, and probing two lazy sides would re-run the flagship per side
    edges = keyed_aggregate(
        kg.map_batches(
            lambda b: b.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        ),
        ["subj", "pred", "obj"],
        count_alias="_c",
    ).drop_columns(["_c"]).materialize()

    lhs = edges.map_batches(
        lambda b: pa.table({"node": b["obj"], "pred_a": b["pred"]}), batch_format="pyarrow"
    )
    rhs = edges.map_batches(
        lambda b: pa.table({"node": b["subj"], "pred_b": b["pred"]}), batch_format="pyarrow"
    )
    paths = hash_join(lhs, rhs, on=["node"])

    def cnt(b: pa.Table) -> pa.Table:
        df = b.select(["pred_a", "pred_b"]).to_pandas()
        return _from_pandas_clean(
            df.groupby(["pred_a", "pred_b"], sort=False).size().reset_index(name="n_paths")
        )

    return keyed_aggregate(
        paths.map_batches(cnt, batch_format="pyarrow"),
        ["pred_a", "pred_b"],
        sums=["n_paths"],
    )


_PRED_SYMMETRY_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    e AS (SELECT DISTINCT subj, pred, obj FROM kg)
    SELECT e1.pred,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(e2.subj) AS BIGINT) AS n_symmetric
    FROM e e1 LEFT JOIN e e2
      ON e1.subj = e2.obj AND e1.obj = e2.subj AND e1.pred = e2.pred
    GROUP BY 1
"""


@_register("q_pred_symmetry", _PRED_SYMMETRY_SQL)
def q_pred_symmetry(sf_dir: str):
    """Per-predicate symmetry score (n_symmetric / n_edges — the
    symmetric-relation detector ontology induction uses): distinct edges
    LEFT-joined against their own reversal on the full (subj, obj, pred)
    key — edge and mirror hash to the same partition, so the check is one
    exchange — then a pred-level count of matches vs total."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    kg = _kg_cached(sf_dir)
    # one materialize: the edge table feeds both the probe and its mirror
    edges = keyed_aggregate(
        kg.map_batches(
            lambda b: b.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        ),
        ["subj", "pred", "obj"],
        count_alias="_c",
    ).drop_columns(["_c"]).materialize()

    rev = edges.map_batches(
        lambda b: pa.table(
            {"subj": b["obj"], "obj": b["subj"], "pred": b["pred"],
             "_hit": pa.array(np.ones(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    )
    matched = hash_join(edges, rev, on=["subj", "obj", "pred"], how="left")

    def cnt(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "pred": b["pred"].to_pandas(),
                "n_symmetric": b["_hit"].combine_chunks().fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("pred", sort=False).agg(
            n_edges=("n_symmetric", "size"), n_symmetric=("n_symmetric", "sum")
        ).reset_index()
        g["n_edges"] = g["n_edges"].astype(np.int64)
        return _from_pandas_clean(g[["pred", "n_edges", "n_symmetric"]])

    return keyed_aggregate(
        matched.map_batches(cnt, batch_format="pyarrow"),
        ["pred"],
        sums=["n_edges", "n_symmetric"],
    )


_TOKEN_COOC_SQL = """
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
    SELECT t1.tok AS tok_a, t2.tok AS tok_b,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM toks t1 JOIN toks t2 ON t1.doc_id = t2.doc_id AND t1.tok < t2.tok
    GROUP BY 1, 2
"""


@_register("q_token_cooc", _TOKEN_COOC_SQL)
def q_token_cooc(sf_dir: str):
    """Document-level token co-occurrence counts (the PMI / word-embedding
    sufficient statistic): per-doc DISTINCT tokens expand to unordered
    pairs INSIDE the batch via one vectorized self-merge (a doc's tokens
    never leave its block), the combiner reduces the quadratic expansion
    to per-block pair counts, and one keyed exchange merges — shuffle
    volume is |vocab-pairs| x blocks, independent of corpus size.  The
    per-doc expansion is inherently quadratic in distinct tokens per doc
    (cap the tokenizer upstream for pathological docs)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "doc": np.repeat(np.arange(len(b)), lens),
                "tok": np.asarray(toks.flatten().to_pandas(), dtype=object),
            }
        ).drop_duplicates()
        m = df.merge(df, on="doc", suffixes=("_a", "_b"))
        m = m[m["tok_a"] < m["tok_b"]]
        g = m.groupby(["tok_a", "tok_b"], sort=False).size().reset_index(name="n_docs")
        return _from_pandas_clean(g)

    return keyed_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow"),
        ["tok_a", "tok_b"],
        sums=["n_docs"],
    )


_VOCAB_OVERLAP_SQL = """
    WITH sv AS (
      SELECT DISTINCT source, unnest(str_split(text, ' ')) AS tok FROM documents),
    sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM sv GROUP BY 1)
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b
    FROM sv a JOIN sv b ON a.tok = b.tok AND a.source < b.source
    JOIN sz sa ON sa.source = a.source
    JOIN sz sb ON sb.source = b.source
    GROUP BY 1, 2, sa.vocab, sb.vocab
"""


@_register("q_vocab_overlap", _VOCAB_OVERLAP_SQL)
def q_vocab_overlap(sf_dir: str):
    """Cross-source vocabulary overlap matrix (lexical-similarity audit
    between corpus sources — the Jaccard numerator/denominators in exact
    integers): per-batch distinct (source, token) partials reduce to the
    global distinct table in one keyed exchange, a token-co-located pass
    emits source pairs per token (bounded by #sources^2 per token — the
    pair dimension is small even when the vocabulary is huge), and a tiny
    (source_a, source_b) merge finishes; per-source vocab sizes ride along
    from the same distinct table, broadcast once."""
    from ontoea_ray.functions.shuffle import compact, keyed_aggregate, with_partition_key
    from ontoea_ray.functions.text import tokenize

    ds = _read(sf_dir, "documents", ["source", "text"])

    def sv_partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(
            {
                "source": np.repeat(np.asarray(b["source"].to_pandas(), object), lens),
                "tok": np.asarray(toks.flatten().to_pandas(), dtype=object),
            }
        ).drop_duplicates()
        return _from_pandas_clean(df)

    sv = keyed_aggregate(
        ds.map_batches(sv_partial, batch_format="pyarrow"),
        ["source", "tok"],
        count_alias="_c",
    ).drop_columns(["_c"])

    sizes = {
        r["source"]: r["n"]
        for r in keyed_aggregate(sv, ["source"], count_alias="n").take_all()
    }
    sz_ref = ray.put(sizes)

    parted = with_partition_key(compact(sv), ["tok"])

    def pairs_per_token(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="tok", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        return m.groupby(["source_a", "source_b"], sort=False).size().reset_index(name="n_shared")

    shared = keyed_aggregate(
        parted.groupby("pkey").map_groups(pairs_per_token, batch_format="pandas"),
        ["source_a", "source_b"],
        sums=["n_shared"],
    )

    def attach_sizes(b: pa.Table) -> pa.Table:
        sz = ray.get(sz_ref)
        sa = pd.Series(b["source_a"].to_pandas()).map(sz).to_numpy(np.int64)
        sb = pd.Series(b["source_b"].to_pandas()).map(sz).to_numpy(np.int64)
        return pa.table(
            {
                "source_a": b["source_a"],
                "source_b": b["source_b"],
                "n_shared": b["n_shared"].combine_chunks().cast(pa.int64()),
                "vocab_a": pa.array(sa),
                "vocab_b": pa.array(sb),
            }
        )

    return shared.map_batches(attach_sizes, batch_format="pyarrow")


_DOD_CHANGE_SQL = """
    WITH d AS (
      SELECT event_type,
             CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
             CAST(SUM(CAST(ROUND(value * 1000) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2)
    SELECT event_type, day_epoch, v AS sum_value_milli,
           CAST(v - COALESCE(LAG(v) OVER (PARTITION BY event_type ORDER BY day_epoch), 0) AS BIGINT) AS delta_milli
    FROM d
"""


@_register("q_dod_change", _DOD_CHANGE_SQL)
def q_dod_change(sf_dir: str):
    """Day-over-day change per event type (LAG over an AGGREGATED series —
    the trend-monitoring shape): the corpus reduces to (type, day) daily
    sums via the combiner-first keyed aggregate, and the window diff runs
    over that aggregate — whose size is types x days, independent of
    corpus size — in one type-co-located sorted pass."""
    from ontoea_ray.functions.shuffle import compact, keyed_aggregate, with_partition_key

    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ns = b["ts"].combine_chunks().cast(pa.timestamp("ns")).to_numpy(zero_copy_only=False)
        day = ns.astype("datetime64[D]").astype("datetime64[s]").astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_pandas(),
                "day_epoch": day,
                "sum_value_milli": np.round(
                    b["value"].combine_chunks().to_numpy() * 1000
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(
            df.groupby(["event_type", "day_epoch"], sort=False)["sum_value_milli"]
            .sum()
            .reset_index()
        )

    daily = keyed_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day_epoch"],
        sums=["sum_value_milli"],
    )
    parted = with_partition_key(compact(daily), ["event_type"])

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "day_epoch"], kind="mergesort")
        prev = g.groupby("event_type", sort=False)["sum_value_milli"].shift().fillna(0)
        g["delta_milli"] = (g["sum_value_milli"] - prev).astype(np.int64)
        return g[["event_type", "day_epoch", "sum_value_milli", "delta_milli"]]

    return parted.groupby("pkey").map_groups(diff, batch_format="pandas")


_BFS_DEPTH_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    e AS (SELECT DISTINCT subj, obj FROM kg),
    l0 AS (SELECT DISTINCT subj AS node FROM e ORDER BY subj LIMIT 3),
    l1 AS (SELECT DISTINCT e.obj AS node FROM e JOIN l0 ON e.subj = l0.node),
    l2 AS (SELECT DISTINCT e.obj AS node FROM e JOIN l1 ON e.subj = l1.node),
    l3 AS (SELECT DISTINCT e.obj AS node FROM e JOIN l2 ON e.subj = l2.node),
    reach AS (
      SELECT node FROM l0 UNION SELECT node FROM l1
      UNION SELECT node FROM l2 UNION SELECT node FROM l3)
    SELECT node,
           CAST(CASE WHEN node IN (SELECT node FROM l0) THEN 0
                     WHEN node IN (SELECT node FROM l1) THEN 1
                     WHEN node IN (SELECT node FROM l2) THEN 2
                     ELSE 3 END AS BIGINT) AS depth
    FROM reach
"""


@_register("q_bfs_depth", _BFS_DEPTH_SQL)
def q_bfs_depth(sf_dir: str):
    """Depth-bounded BFS hop distance from a deterministic seed set (graph
    reachability / influence-radius primitive), fully distributed
    (`stages/graph.bfs_depths`): every level is a Dataset — the driver
    never holds a frontier or a seen set.  Per round, the frontier ships
    as an is_in value-set assembled inside a Ray task when it fits the
    broadcast byte budget; above the budget the edges are Bloom-pre-pruned
    then exactly verified by a keyed semi-join.  Depth = keyed min over
    depth-tagged levels (the SQL oracle's first-level-that-reaches
    semantics)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.graph import bfs_depths

    kg = _kg_cached(sf_dir)
    edges = keyed_aggregate(
        kg.map_batches(lambda b: b.select(["subj", "obj"]), batch_format="pyarrow"),
        ["subj", "obj"],
        count_alias="_c",
    ).drop_columns(["_c"]).materialize()

    def bottom3(b: pa.Table) -> pa.Table:
        # per-block 3 smallest subjects: a correct superset of the global 3
        s = sorted(set(b["subj"].to_pylist()))[:3]
        return pa.table({"node": pa.array(s, pa.string())})

    seed_rows = edges.map_batches(bottom3, batch_format="pyarrow").take_all()
    seeds = sorted({r["node"] for r in seed_rows})[:3]

    return bfs_depths(edges, seeds, max_depth=3)


_TEXT_NORMALIZE_SQL = """
    WITH messy AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0 THEN chr(160) || 'E' || chr(769) || 'Cafe' ELSE '' END
             || CASE WHEN doc_id % 2 = 0 THEN '  TAIL ' ELSE '' END AS raw
      FROM documents)
    SELECT doc_id,
           regexp_replace(trim(lower(replace(nfc_normalize(raw), chr(160), ' '))),
                          ' +', ' ', 'g') AS norm_text,
           CAST(length(regexp_replace(trim(lower(replace(nfc_normalize(raw), chr(160), ' '))),
                                      ' +', ' ', 'g')) AS BIGINT) AS n_chars_norm
    FROM messy
"""


@_register("q_text_normalize", _TEXT_NORMALIZE_SQL)
def q_text_normalize(sf_dir: str):
    """Unicode text normalization chain (NFC compose + NBSP -> space +
    casefold + whitespace collapse + trim — the standard web-text cleanup
    pass): every step is a vectorized Arrow kernel (`utf8_normalize`,
    `replace_substring`, `utf8_lower`, `replace_substring_regex`,
    `utf8_trim_whitespace`) inside one map_batches — zero shuffle, zero
    Python rows; input messiness (combining accents, NBSP, ragged spaces)
    is constructed deterministically so DuckDB replays the identical
    chain."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def norm(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        base = pd.Series(b["text"].to_pandas(), dtype=object)
        suf1 = np.where(ids % 3 == 0, " ÉCafe", "")
        suf2 = np.where(ids % 2 == 0, "  TAIL ", "")
        raw = pa.array((base + suf1 + suf2).tolist(), pa.string())
        # NFC compose: pyarrow 16's utf8_normalize does not compose
        # combining marks, so ASCII rows (the vast majority of web
        # text) take the vectorized zero-copy path and only the
        # non-ASCII minority pays a per-string unicodedata call
        ascii_mask = pc.string_is_ascii(raw).to_numpy(zero_copy_only=False)
        if not ascii_mask.all():
            import unicodedata
            vals = raw.to_pylist()
            for k in np.flatnonzero(~ascii_mask):
                vals[k] = unicodedata.normalize("NFC", vals[k])
            raw = pa.array(vals, pa.string())
        x = pc.replace_substring(raw, pattern=" ", replacement=" ")
        x = pc.utf8_lower(x)
        x = pc.utf8_trim_whitespace(x)
        x = pc.replace_substring_regex(x, pattern=" +", replacement=" ")
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "norm_text": x,
                "n_chars_norm": pc.utf8_length(x).cast(pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


_TYPE_RUNS_SQL = """
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), r AS (
      SELECT user_id, event_type, ts,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS run
      FROM e)
    SELECT user_id, event_type,
           CAST(epoch_us(MIN(ts)) AS BIGINT) AS valid_from_us,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS valid_to_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id, event_type, run
"""


@_register("q_type_runs", _TYPE_RUNS_SQL)
def q_type_runs(sf_dir: str):
    """Run-length intervals per user (the SCD2 / state-change collapse: a
    row per maximal run of consecutive same-type events with its validity
    window): sessionization's one user-co-located exchange, then a
    vectorized change-flag cumsum + run groupby inside the partition —
    the standard change-data-capture compaction at any scale."""
    from ontoea_ray.functions.shuffle import compact, with_partition_key

    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        chg = (
            g["user_id"].ne(g["user_id"].shift())
            | g["event_type"].ne(g["event_type"].shift())
        )
        rid = chg.cumsum()
        us = g["ts"].astype("datetime64[ns]").astype("int64") // 1000
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].astype("int64"),
                    "event_type": g["event_type"],
                    "_us": us,
                    "_rid": rid,
                }
            )
            .groupby("_rid", sort=False)
            .agg(
                user_id=("user_id", "first"),
                event_type=("event_type", "first"),
                valid_from_us=("_us", "min"),
                valid_to_us=("_us", "max"),
                n_events=("_us", "size"),
            )
            .reset_index(drop=True)
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    parted = with_partition_key(compact(ev), ["user_id"])
    return parted.groupby("pkey").map_groups(runs, batch_format="pandas")


@_register("q_multimodal_video")  # binary plumbing — rows-only driver check
def q_multimodal_video(sf_dir: str):
    """Video branch of the multimodal plumbing: doc bytes as an opaque
    video payload, deterministic fake frame sampling (codecs stubbed) in
    an actor-pool stage, then a vectorized per-frame byte-statistics
    kernel — one output row per (media, frame), deterministic per input,
    so rows+schema are meaningful."""
    from ontoea_ray.stages.multimodal import frame_sample_stage

    def to_media(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": batch["doc_id"],
                "payload": batch["text"].combine_chunks().cast(pa.binary()),
            }
        )

    media = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    frames = frame_sample_stage(media, n_frames=4, fake=True)

    def frame_stats(batch: pa.Table) -> pa.Table:
        pay = batch["payload"].combine_chunks()
        flat = np.frombuffer(b"".join(pay.to_pylist()), np.uint8).reshape(len(batch), -1)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame": batch["frame"],
                "byte_sum": pa.array(flat.astype(np.int64).sum(axis=1), pa.int64()),
                "byte_max": pa.array(flat.max(axis=1).astype(np.int64), pa.int64()),
            }
        )

    return frames.map_batches(frame_stats, batch_format="pyarrow")


_BIGRAM_EXPLODE_SQL = """
      SELECT t[unnest(range(1, len(t)))] || ' ' || t[unnest(range(2, len(t) + 1))] AS bigram
      FROM (SELECT str_split(text, ' ') AS t FROM documents)
"""

from ontoea_ray.functions.lsh_sql import lsh_cross_verified_sql as _lsh_cross_sql  # noqa: E402


@_register(
    "q_surface_blocking",
    _lsh_cross_sql(
        f"SELECT DISTINCT bigram AS id FROM ({_BIGRAM_EXPLODE_SQL})",
        f"""SELECT bigram AS id FROM (
              SELECT bigram,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram DESC) - 1 AS rank
              FROM ({_BIGRAM_EXPLODE_SQL}) GROUP BY bigram)
            WHERE rank < 64""",
        num_perm=16, bands=8, shingle_n=3, seed=7, max_group=4000, jaccard_pct=40,
    ),
)
def q_surface_blocking(sf_dir: str):
    """Entity-linking candidate blocking by MinHash-LSH over surface forms
    (the north-star blocking stage; `stages/blocking.py`).

    Mention surfaces = every distinct corpus bigram; gazetteer = the 64
    most frequent bigrams (freq desc, surface desc — the reference's
    vocabulary order, read.py:23-25).  Cross-table CHAR-shingle LSH pairs
    each mention with near-miss gazetteer entries, verified by exact
    char-shingle Jaccard >= 0.40 — typo-tolerant candidate generation that
    exact dict lookup (the reference's linker) cannot express.  Every hash,
    band key and Jaccard count is integer arithmetic the oracle replays
    bit-for-bit.  Scale shape: the corpus is touched once (bigram combiner);
    blocking exchanges only (band, band_key)- and shingle-keyed rows over
    the SURFACE VOCABULARY, never the corpus; the gazetteer head is k x
    #blocks driver-merged (bounded by k, not data)."""
    from ontoea_ray.functions.text import bigram_counts
    from ontoea_ray.stages.blocking import lsh_link_candidates
    from ontoea_ray.state.ids import top_k_by_frequency

    from ontoea_ray.functions.shuffle import keyed_aggregate, sized_width

    ds = _read(sf_dir, "documents", ["text"])
    # per-batch bigram combiner -> blocks are vocabulary-sized partials:
    # materialize them so every downstream exchange is sized by the VOCAB
    # bytes (width 1-2 at test scale, cluster width at 100 TB) instead of
    # paying cpus/2 partition barriers per wide op on a 7k-row table
    partial = compact(
        ds.map_batches(
            lambda b: bigram_counts(b["text"].combine_chunks()), batch_format="pyarrow"
        )
    ).materialize()
    w = sized_width(partial.size_bytes())
    freq = keyed_aggregate(
        partial, ["bigram"], sums=["freq"], width=w
    ).materialize()  # two consumers below; vocabulary-sized
    mentions = freq.map_batches(
        lambda b: pa.table({"mention": b["bigram"]}), batch_format="pyarrow"
    )
    top = top_k_by_frequency(freq, 64, key="bigram")
    gaz = ray.data.from_arrow(
        pa.table({"entity": pa.array([t for t, _ in top], pa.string())})
    )
    return lsh_link_candidates(
        mentions, gaz, width=w, jaccard_pct=40, num_perm=16, bands=8,
        shingle_n=3, seed=7, max_group=4000,
    )


_SEMDEDUP_SQL = """
    WITH q AS (SELECT vec_id,
                      [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)
                       FOR i IN range(1, 65)] AS qv
               FROM embeddings),
    cents AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < 8),
    scores AS (SELECT q.vec_id, cents.cid,
                      CAST(list_sum([q.qv[i] * cents.cv[i] FOR i IN range(1, 65)]) AS BIGINT) AS score
               FROM q CROSS JOIN cents),
    assigned AS (SELECT vec_id, cid AS centroid FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score DESC, cid ASC) AS rn
        FROM scores) WHERE rn = 1),
    pairdots AS (SELECT b.vec_id AS v,
                        CAST(list_sum([x.qv[i] * y.qv[i] FOR i IN range(1, 65)]) AS HUGEINT) AS dot,
                        CAST(list_sum([x.qv[i] * x.qv[i] FOR i IN range(1, 65)]) AS HUGEINT) AS na2,
                        CAST(list_sum([y.qv[i] * y.qv[i] FOR i IN range(1, 65)]) AS HUGEINT) AS nb2
                 FROM assigned a
                 JOIN assigned b ON a.centroid = b.centroid AND a.vec_id < b.vec_id
                 JOIN q x ON x.vec_id = a.vec_id
                 JOIN q y ON y.vec_id = b.vec_id),
    dropped AS (SELECT DISTINCT v FROM pairdots
                WHERE dot >= 0 AND dot * dot * 400 >= 49 * na2 * nb2)
    SELECT a.vec_id, CAST(a.centroid AS BIGINT) AS centroid
    FROM assigned a WHERE a.vec_id NOT IN (SELECT v FROM dropped)
"""


@_register("q_semdedup", _SEMDEDUP_SQL)
def q_semdedup(sf_dir: str):
    """SemDeDup semantic deduplication (Abbas et al. 2023): k-means-style
    cluster assignment against broadcast centroids (the first 8 embeddings
    — deterministic; production swaps in the IVF-trained quantizer), then
    within each cluster every vector with a lower-id neighbour at quantized
    cosine >= 7/20 is dropped.  The cosine test is the cross-multiplied
    integer comparison (milli-quantized int dots, no float, no sqrt), so
    the oracle replays every keep/drop decision exactly.  One corpus pass
    fuses assignment + quantization; the only exchange partitions the
    quantized table by centroid; the per-cluster O(c^2 d) matmul is the
    SemDeDup design cost (K sized so n/K fits a worker)."""
    from ontoea_ray.stages.ann import semantic_dedup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent_rows = sorted(
        emb.map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 8)), batch_format="pyarrow"
        ).take_all(),
        key=lambda r: r["vec_id"],
    )
    cents = np.array([r["embedding"] for r in cent_rows], np.float64)
    return semantic_dedup(emb, cents, tau_num=7, tau_den=20)


def _link_predict_sql(min_common: int = 2, pct: int = 7) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    return f"""
WITH
{_COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS ")},
eall AS MATERIALIZED (SELECT a, b FROM eall0),
{splitmix64_ctes("eall", "(a * 100000 + b)")},
e AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct}),
nbr AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
cn AS (SELECT n1.v AS id_a, n2.v AS id_b, CAST(COUNT(*) AS BIGINT) AS cn
       FROM nbr n1 JOIN nbr n2 ON n1.u = n2.u AND n1.v < n2.v
       GROUP BY n1.v, n2.v HAVING COUNT(*) >= {min_common}),
ne AS (SELECT cn.* FROM cn
       WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.id_a AND e.b = cn.id_b)),
d AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
     FROM (SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e) GROUP BY node)
SELECT ne.id_a, ne.id_b, ne.cn, da.deg AS da, db.deg AS db,
       CAST(1000 * ne.cn // (da.deg + db.deg - ne.cn) AS BIGINT) AS jac_milli
FROM ne JOIN d da ON ne.id_a = da.node JOIN d db ON ne.id_b = db.node
"""


@_register("q_link_predict", _link_predict_sql())
def q_link_predict(sf_dir: str):
    """Neighbourhood-overlap link prediction over the splitmix64-sampled
    (7%) co-purchase graph: non-adjacent node pairs at distance 2 with
    common-neighbour count >= 2, endpoint degrees, and integer-milli
    neighbourhood Jaccard — the classic common-neighbours/Jaccard link
    scorer, and the KG-completion primitive (predict missing same-as /
    co-occurrence edges).  `stages/graph.common_neighbor_pairs`: wedge
    pairs emit per center node through the shared segment-pairs kernel,
    combine in-block before one (id_a, id_b) exchange, filter BEFORE the
    adjacency anti-join (pair-co-located) and the two degree hash joins.
    All outputs are integers; the oracle replays the sampling, counts and
    floor-divided Jaccard bit-for-bit."""
    from ontoea_ray.stages.graph import common_neighbor_pairs
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return common_neighbor_pairs(sampled, min_common=2)


def _hyperball_sql(
    p: int = 4, rounds: int = 3, pct: int = 7, tail: str | None = None
) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    nbits = 64 - p
    parts = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct}),",
        "nbr AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),",
        "nodes AS (SELECT DISTINCT u AS node FROM nbr),",
        # splitmix over the node id (fresh sm chain names would collide with
        # the edge-sampling chain above, so inline with n-prefixed names)
        splitmix64_ctes("nodes", "node")
        .replace("sm0", "nsm0").replace("sm1", "nsm1")
        .replace("sm2", "nsm2").replace("sm3", "nsm3")
        .replace("_z0", "_y0").replace("_z1", "_y1").replace("_z2", "_y2"),
        f""", r0 AS MATERIALIZED (
   SELECT node, CAST(_h // {1 << nbits} AS BIGINT) AS slot,
          CAST(CASE WHEN _h % {1 << nbits} = 0 THEN {nbits + 1}
               ELSE {nbits} - length(bin(CAST(_h % {1 << nbits} AS BIGINT))) + 1 END AS BIGINT) AS rho
   FROM nsm3)""",
    ]
    for r in range(rounds):
        parts.append(
            f""", r{r + 1} AS MATERIALIZED (
   SELECT node, slot, CAST(MAX(rho) AS BIGINT) AS rho FROM (
     SELECT nbr.u AS node, x.slot, x.rho FROM r{r} x JOIN nbr ON nbr.v = x.node
     UNION ALL SELECT node, slot, rho FROM r{r}
   ) GROUP BY node, slot)"""
        )
    parts.append(tail or f"SELECT node, slot, rho FROM r{rounds}")
    return "\n".join(parts)


def _hll_e_ctes(p: int, rounds: int) -> str:
    """CTEs e0..eR: per-node integer HLL ball estimates from the hyperball
    register CTEs r0..rR (shared by q_harmonic and q_eff_diameter)."""
    from ontoea_ray.stages.graph import _HLL_E_NUM, _HLL_RHO_CAP

    m = 1 << p
    cap = _HLL_RHO_CAP
    return "".join(
        f""", e{r} AS (
   SELECT node, CAST({_HLL_E_NUM} // ((({m} - COUNT(*)) * ({1 << cap}::BIGINT))
        + SUM(1::BIGINT << ({cap} - LEAST(rho, {cap})))) AS BIGINT) AS e
   FROM r{r} GROUP BY node)"""
        for r in range(rounds + 1)
    )


def _harmonic_sql(p: int = 4, rounds: int = 3, pct: int = 7) -> str:
    """q_harmonic oracle: the hyperball register rounds + the integer HLL
    estimate per round + the telescoping harmonic sum — replays
    `stages/graph.harmonic_milli` division for division."""
    e_ctes = _hll_e_ctes(p, rounds)
    terms = " + ".join(
        f"(e{r}.e - e{r - 1}.e) // {r}" for r in range(1, rounds + 1)
    )
    joins = " ".join(f"JOIN e{r} USING (node)" for r in range(1, rounds + 1))
    tail = (
        e_ctes
        + f"\nSELECT e0.node AS node, CAST({terms} AS BIGINT) AS h_milli FROM e0 {joins}"
    )
    return _hyperball_sql(p=p, rounds=rounds, pct=pct, tail=tail)


def _sampled_copurchase(sf_dir: str) -> ray.data.Dataset:
    """The splitmix64-sampled (7%) co-purchase graph shared by the sketch
    queries (hyperball / harmonic / effective diameter / mis / walks use
    the same sampling rule)."""
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    return edges.map_batches(sample, batch_format="pyarrow")


_HYPERBALL_ROUNDS_CACHE: dict = {}


def _hyperball_rounds_cached(sf_dir: str) -> list:
    """Materialized per-round hyperball registers (p=4, rounds=3, sampled
    graph) — the same materialized-VIEW contract as `_kg_cached`: harmonic
    centrality and the neighbourhood function both derive from the rounds
    q_hyperball measures, and re-running the R max-merge rounds inside
    each one measures the rounds, not the operator."""
    rounds = _HYPERBALL_ROUNDS_CACHE.get(sf_dir)
    if rounds is None:
        from ontoea_ray.stages.graph import hyperball_registers

        per_round = hyperball_registers(
            _sampled_copurchase(sf_dir), p=4, rounds=3, keep_rounds=True
        )
        rounds = _HYPERBALL_ROUNDS_CACHE[sf_dir] = [d.materialize() for d in per_round]
    return rounds


@_register("q_hyperball", _hyperball_sql())
def q_hyperball(sf_dir: str):
    """HyperBall distance sketching (Boldi & Vigna 2013) over the
    splitmix64-sampled (7%) co-purchase graph: each node's HyperLogLog
    registers of its radius-3 ball after 3 synchronous max-merge rounds —
    the neighbourhood-function / effective-diameter primitive at graph
    scale (per-node BFS is quadratic; HyperBall is R keyed max-merges).
    `stages/graph.hyperball_registers`: register rows move along edges via
    one hash join per round and shrink through in-block max combiners
    before each (node, slot) exchange.  Node hashes, slots and rho ranks
    are the engine-wide splitmix64/bit-length conventions, so the unrolled
    oracle replays every register bit-for-bit."""
    from ontoea_ray.stages.graph import hyperball_registers
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return hyperball_registers(sampled, p=4, rounds=3)


@_register("q_harmonic", _harmonic_sql())
def q_harmonic(sf_dir: str):
    """Harmonic centrality estimated from HyperBall sketches over the
    splitmix64-sampled (7%) co-purchase graph (`stages/graph.
    harmonic_milli`): H(v) = sum_r (|ball_r| - |ball_{r-1}|)/r with ball
    sizes from each round's HLL registers — the distance-based centrality
    per-node BFS cannot afford at graph scale, here as a pure integer
    function of the graph (the 673/1000-alpha HLL estimate computed as one
    int64 floor division, rho capped at 44 bits) so the unrolled oracle
    replays every register, estimate and telescoping term exactly.
    Register rounds come from the `_hyperball_rounds_cached` materialized
    view (q_hyperball measures them; this operator is the estimate +
    telescoping sum)."""
    from ontoea_ray.stages.graph import harmonic_milli

    return harmonic_milli(
        None, p=4, rounds=3, registers=_hyperball_rounds_cached(sf_dir)
    )


def _eff_diameter_sql(p: int = 4, rounds: int = 3, pct: int = 90, sample_pct: int = 7) -> str:
    e_ctes = _hll_e_ctes(p, rounds)
    t_ctes = "".join(
        f", t{r} AS (SELECT CAST(SUM(e) AS BIGINT) AS n FROM e{r})"
        for r in range(rounds + 1)
    )
    rows = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, tr.n AS n_milli,"
        f" CAST(CASE WHEN 100 * tr.n >= {pct} * tf.n THEN 1 ELSE 0 END"
        f" AS BIGINT) AS reaches_pct FROM t{r} tr, t{rounds} tf"
        for r in range(rounds + 1)
    )
    return _hyperball_sql(p=p, rounds=rounds, pct=sample_pct, tail=e_ctes + t_ctes + "\n" + rows)


@_register("q_eff_diameter", _eff_diameter_sql())
def q_eff_diameter(sf_dir: str):
    """Neighbourhood function + effective diameter from HyperBall
    (`stages/graph.neighbourhood_function`) over the sampled co-purchase
    graph: N(r) = sum of per-node integer ball estimates per round, one
    row per round with the all-integer 100*N(r) >= 90*N(R) flag — the
    first flagged round IS the 90% effective diameter, computed without a
    single BFS.  Per round one combiner-first global sum; the <= R+1
    totals compare in one tiny task.  Valid while the summed milli-mass
    fits int64 (documented unit rescale beyond).  Register rounds come
    from the `_hyperball_rounds_cached` materialized view."""
    from ontoea_ray.stages.graph import neighbourhood_function

    return neighbourhood_function(
        None, p=4, rounds=3, pct=90, registers=_hyperball_rounds_cached(sf_dir)
    )


# ---------------------------------------------------------------------------
# Web link graph (stages/weblinks.py) — the Common-Crawl-side edge table
# ---------------------------------------------------------------------------

_ESC_TOK_SQL = (
    "replace(replace(replace(tok, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
)

_OUTLINK_EDGES_CTE = f"""
  link_tok AS (
    SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS src_url,
           source || '.example.org' AS src_domain,
           unnest(list_slice(str_split(text, ' '), 1, 3)) AS tok
    FROM documents
  ),
  outlink_edges AS (
    SELECT src_url, src_domain,
           'https://' || {_ESC_TOK_SQL} || '.example.org/t/' || {_ESC_TOK_SQL} AS href,
           {_ESC_TOK_SQL} || '.example.org' AS dst_domain
    FROM link_tok
  )"""


_WARC_SQL = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_pages,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(epoch_us(TIMESTAMP '2024-01-01') + min(doc_id) * 1000000 AS BIGINT) AS min_ts_us,
           CAST(epoch_us(TIMESTAMP '2024-01-01') + max(doc_id) * 1000000 AS BIGINT) AS max_ts_us
    FROM documents GROUP BY lang
"""


@_register("q_warclite_roundtrip", _WARC_SQL)
def q_warclite_roundtrip(sf_dir: str):
    """Crawl-archive record-format round trip: the pages table is written
    as concatenated WARC-lite records (header block + length-framed body,
    many records per shard file — the real crawl interchange shape) and
    read back with one reader task per shard + a vectorized in-batch
    record parse (sources/warclite.py), then reduced to per-lang page
    counts, byte totals and crawl-time bounds.  The oracle replays the
    deterministic url/warc_ts derivation from the documents table, so a
    value mismatch means the FORMAT lost or corrupted a record."""
    import hashlib
    import os

    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.sources.warclite import read_warclite, write_warclite

    out_dir = os.path.join(
        "/tmp/ontoea_warclite", hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    )
    # shard names derive from block splits, and the split can differ
    # between sessions (cpu count) — clear the dir so the read sees
    # exactly this write, never a stale shard from a previous layout
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    pages = pages_from_documents(sf_dir).drop_columns(["html"])
    write_warclite(pages, out_dir)

    back = read_warclite(out_dir)

    def partial(b: pa.Table) -> pa.Table:
        ts = b["warc_ts"].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "lang": b["lang"].combine_chunks(),
                "n_pages": pa.array(np.ones(len(b), np.int64)),
                "sum_chars": pc.binary_length(b["text"].combine_chunks()).cast(pa.int64()),
                "min_ts_us": ts,
                "max_ts_us": ts,
            }
        )

    return keyed_aggregate(
        back.map_batches(partial, batch_format="pyarrow"),
        ["lang"],
        sums=["n_pages", "sum_chars"],
        mins=["min_ts_us"],
        maxs=["max_ts_us"],
    )


@_register(
    "q_outlinks",
    f"WITH {_OUTLINK_EDGES_CTE} SELECT src_url, href FROM outlink_edges",
)
def q_outlinks(sf_dir: str):
    """Web link-graph extraction: every ``href`` attribute of every page
    becomes a (src_url, href) edge — the Common-Crawl link-graph primitive.
    One streaming zero-copy pass (`stages/weblinks.outlink_edges`): the
    vectorized `functions/text.outlink_lists` splitter consumes the html
    bytes inside the batch, so the multi-MB payload never rides past the
    stage.  The oracle replays the deterministic nav-link generation rule
    (first 3 escaped tokens) from the documents table, pinning that
    extraction inverts generation exactly."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.weblinks import outlink_edges

    return outlink_edges(pages_from_documents(sf_dir))


@_register(
    "q_domain_indegree",
    f"""WITH {_OUTLINK_EDGES_CTE}
    SELECT dst_domain,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(COUNT(DISTINCT src_domain) AS BIGINT) AS n_src_domains
    FROM outlink_edges GROUP BY dst_domain""",
)
def q_domain_indegree(sf_dir: str):
    """Host-level link-graph indegree: per destination domain, total inbound
    anchors and distinct source hosts — the web-centrality aggregate the
    public web-graph releases ship.  Combiner-first two-level reduction
    (`stages/weblinks.domain_indegree`): the (dst, src) pair exchange moves
    the distinct-pair vocabulary, never raw edges, and the distinct-source
    count falls out of the first level's group count."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.weblinks import domain_indegree

    return domain_indegree(pages_from_documents(sf_dir))


@_register(
    "q_anchor_text",
    f"""WITH {_OUTLINK_EDGES_CTE}
    SELECT {_ESC_TOK_SQL} || '.example.org' AS dst_domain,
           {_ESC_TOK_SQL} AS anchor,
           CAST(COUNT(*) AS BIGINT) AS n_anchors
    FROM link_tok GROUP BY dst_domain, anchor""",
)
def q_anchor_text(sf_dir: str):
    """Anchor-text alias table: per (destination domain, anchor TEXT)
    inbound-anchor counts — the surface-form prior entity linking builds
    from the web (anchor text is how the web names the page it links to;
    Mihalcea & Csomai 2007 / Wikipedia anchor dictionaries are the public
    precedent).  `functions/text.anchor_lists` extracts (href, anchor-text)
    pairs vectorized from generic HTML in the same zero-copy streaming pass
    as the outlink splitter; the reduction is one combiner-first keyed
    exchange over the (domain, anchor) vocabulary.  The oracle replays the
    nav generation rule: each nav anchor's text IS its escaped token."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.weblinks import anchor_text_table

    return anchor_text_table(pages_from_documents(sf_dir))


# ---------------------------------------------------------------------------
# Random-walk corpus (stages/walks.py) — DeepWalk / node2vec p=q=1
# ---------------------------------------------------------------------------


def _random_walks_sql(
    steps: int = 3, pct: int = 7, salt: int = 1_000_003, *, as_cte: bool = False
) -> str:
    """Unrolled walk oracle over the splitmix64-sampled co-purchase graph:
    replays the indexed adjacency (ROW_NUMBER over sorted neighbours) and
    every hash-indexed hop bit-for-bit.  ``as_cte=True`` closes the chain
    with a ``walks(walk_id, step, node)`` CTE instead of the final SELECT,
    so derived oracles (skip-gram pairs) build on the identical corpus."""
    from ontoea_ray.functions.lsh_sql import TWO64

    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
        ", und AS MATERIALIZED (SELECT a AS u, b AS v FROM e0 UNION SELECT b AS u, a AS v FROM e0)",
        ", adj AS MATERIALIZED (SELECT u, v,"
        "  CAST(ROW_NUMBER() OVER (PARTITION BY u ORDER BY v) - 1 AS HUGEINT) AS idx FROM und)",
        ", deg AS MATERIALIZED (SELECT u, CAST(COUNT(*) AS HUGEINT) AS deg FROM und GROUP BY u)",
        ", w0 AS (SELECT u AS walk_id, u AS cur FROM deg)",
    ]
    for s in range(1, steps + 1):
        key = f"((CAST(walk_id AS HUGEINT) * {salt} + {s}) % {TWO64})"
        p.append(f", k{s} AS (SELECT walk_id, cur FROM w{s - 1}),")
        p.append(splitmix64_ctes(f"k{s}", key, sfx=f"_w{s}"))
        p.append(
            f", w{s} AS (SELECT s.walk_id, a.v AS cur FROM sm3_w{s} s"
            f" JOIN deg d ON d.u = s.cur"
            f" JOIN adj a ON a.u = s.cur AND a.idx = (s._h % d.deg))"
        )
    selects = [
        f"SELECT CAST(walk_id AS BIGINT) AS walk_id, CAST({s} AS BIGINT) AS step,"
        f" CAST(cur AS BIGINT) AS node FROM w{s}"
        for s in range(steps + 1)
    ]
    if as_cte:
        p.append(", walks AS (" + " UNION ALL ".join(selects) + ")")
    else:
        p.append("\n" + "\nUNION ALL ".join(selects))
    return "\n".join(p)


@_register("q_random_walks", _random_walks_sql())
def q_random_walks(sf_dir: str):
    """Deterministic random-walk corpus (DeepWalk, Perozzi et al. KDD 2014)
    over the splitmix64-sampled (7%) co-purchase graph: one 3-hop walk per
    node, step s moving to sorted-neighbour index
    splitmix64(walk_id * salt + s) % deg(cur) — uniform per step yet a pure
    function of the graph, so walks are reproducible, resumable, and
    replayed bit-for-bit by the unrolled oracle.  `stages/walks.
    random_walks`: indexed adjacency from one distinct exchange + one
    u-co-located ranking pass; each round is two planner-routed hash joins
    over walk-front-sized tables (auto-broadcast under budget), with no
    driver state beyond Dataset handles."""
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.stages.walks import random_walks

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return random_walks(sampled, steps=3)


_WALK_WINDOW = 2

_WALK_PAIRS_SQL = (
    _random_walks_sql(as_cte=True)
    + f"""
    SELECT w1.node AS center, w2.node AS context,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM walks w1 JOIN walks w2
      ON w1.walk_id = w2.walk_id
     AND abs(w1.step - w2.step) BETWEEN 1 AND {_WALK_WINDOW}
    GROUP BY 1, 2
"""
)


@_register("q_walk_pairs", _WALK_PAIRS_SQL)
def q_walk_pairs(sf_dir: str):
    """Skip-gram training pairs from the deterministic walk corpus — the
    DeepWalk -> word2vec step (Perozzi et al. KDD 2014): every (center,
    context) node pair within a +-{window}-step window of the same walk,
    with its corpus count.  One walk_id-keyed exchange co-locates each
    walk's steps; pair emission inside the group is a vectorized
    shift-and-compare over the step-sorted frame (both directions, as the
    skip-gram objective consumes them); counts reduce combiner-first
    through a (center, context) vocabulary exchange.  The oracle derives
    pairs from the SAME unrolled walk CTE as q_random_walks, so a mismatch
    isolates the pairing, not the walk."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.stages.walks import random_walks

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    walks = random_walks(edges.map_batches(sample, batch_format="pyarrow"), steps=3)
    parted = with_partition_key(walks, ["walk_id"])

    def emit(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["walk_id", "step"], kind="mergesort")
        wid = df["walk_id"].to_numpy(np.int64)
        node = df["node"].to_numpy(np.int64)
        cs, xs = [], []
        for d in range(1, _WALK_WINDOW + 1):
            if len(wid) <= d:
                break
            same = wid[:-d] == wid[d:]
            a, b_ = node[:-d][same], node[d:][same]
            cs.append(np.concatenate([a, b_]))  # both directions
            xs.append(np.concatenate([b_, a]))
        if not cs:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        "center": pd.Series([], dtype=np.int64),
                        "context": pd.Series([], dtype=np.int64),
                        "n": pd.Series([], dtype=np.int64),
                    }
                )
            )
        g = (
            pd.DataFrame({"center": np.concatenate(cs), "context": np.concatenate(xs)})
            .groupby(["center", "context"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    pairs = parted.groupby("pkey").map_groups(emit, batch_format="pandas")
    return keyed_aggregate(pairs, ["center", "context"], sums=["n"])


# ---------------------------------------------------------------------------
# DSIR importance weighting (stages/dsir.py)
# ---------------------------------------------------------------------------


def _dsir_sql(n_buckets: int = 1024, scale: int = 1_000_000) -> str:
    from ontoea_ray.functions.lsh_sql import _h

    return f"""
    WITH tok AS (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS tok FROM documents),
    tb AS (SELECT doc_id, lang, CAST({_h("tok")} % {n_buckets} AS BIGINT) AS bucket FROM tok),
    cnt AS (SELECT bucket,
                   CAST(COUNT(*) AS HUGEINT) AS n_raw,
                   CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS HUGEINT) AS n_tgt
            FROM tb GROUP BY bucket),
    tot AS (SELECT SUM(n_raw) AS raw_total, SUM(n_tgt) AS tgt_total FROM cnt),
    w AS (SELECT bucket,
                 ({scale} * (n_tgt + 1) * (raw_total + {n_buckets}))
                 // ((n_raw + 1) * (tgt_total + {n_buckets})) AS w
          FROM cnt, tot),
    per_doc AS (SELECT tb.doc_id,
                       CAST(SUM(w.w) AS BIGINT) AS dsir_sum,
                       CAST(COUNT(*) AS BIGINT) AS n_tokens
                FROM tb JOIN w USING (bucket) GROUP BY tb.doc_id)
    SELECT doc_id, dsir_sum, n_tokens,
           CAST(dsir_sum // GREATEST(n_tokens, 1) AS BIGINT) AS dsir_mean
    FROM per_doc
"""


@_register("q_dsir_weights", _dsir_sql())
def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights (Xie et al., NeurIPS 2023): every raw
    document scored by how target-like (lang='en') its hashed-token
    distribution is — the data-selection primitive for domain-matched
    pre-training corpora.  Hashed features keep the fitted state at
    n_buckets integers regardless of corpus scale; scoring uses exact
    integer ratios with add-one smoothing instead of log-probabilities, so
    the oracle replays every weight bit-for-bit (`stages/dsir.py`).
    Combiner-first bucket counts (one <= B-row keyed aggregate), weight
    table assembled inside a Ray task and broadcast once per actor, then a
    shuffle-free per-block scoring pass."""
    from ontoea_ray.stages.dsir import dsir_weights

    return dsir_weights(_read(sf_dir, "documents", ["doc_id", "text", "lang"]))


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (stages/bm25.py) over the partitioned inverted index
# ---------------------------------------------------------------------------

_BM25_TERMS = ("scan", "merge", "vector")


def _bm25_sql(terms=_BM25_TERMS, k: int = 10, scale: int = 1_000_000,
              k1m: int = 1200, bm: int = 750) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n_docs,
                     CAST(SUM(len(t)) AS HUGEINT) AS total_toks FROM t),
    dl AS (SELECT doc_id, CAST(len(t) AS HUGEINT) AS dl FROM t),
    tok AS (SELECT doc_id, unnest(t) AS token FROM t),
    tf AS (SELECT token, doc_id, CAST(COUNT(*) AS HUGEINT) AS tf FROM tok
           WHERE token IN ({tlist}) GROUP BY token, doc_id),
    df AS (SELECT token, CAST(COUNT(*) AS HUGEINT) AS df FROM tf GROUP BY token),
    sc AS (SELECT tf.doc_id,
                  ((({scale} * (s.n_docs - df.df + 1)) // (df.df + 1)) * tf.tf * ({k1m} + 1000))
                  // (1000 * tf.tf + ({k1m} * (1000 - {bm} + ({bm} * dl.dl * s.n_docs) // s.total_toks)) // 1000)
                  AS sv
           FROM tf JOIN df USING (token) JOIN dl ON dl.doc_id = tf.doc_id, stats s),
    agg AS (SELECT doc_id, CAST(SUM(sv) AS BIGINT) AS score FROM sc GROUP BY doc_id)
    SELECT doc_id, score,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rnk
    FROM agg ORDER BY score DESC, doc_id LIMIT {k}
"""


@_register("q_bm25", _bm25_sql())
def q_bm25(sf_dir: str):
    """BM25 ranked retrieval (Robertson & Walker, SIGIR 1994) for a fixed
    term set over the hash-partitioned inverted index — the search-side
    serving primitive: only the query terms' bucket partitions leave
    storage, tf/df reduce combiner-first, document lengths join through
    the planner, and the final top-k sorts the candidate score table,
    never the corpus.  Scores are exact integer rationals (rational IDF +
    milli-unit k1/b — `stages/bm25.py`), so the oracle replays the full
    ranking bit-for-bit including ties."""
    import hashlib
    import os

    from ontoea_ray.stages.bm25 import bm25_topk
    from ontoea_ray.stages.inverted_index import build_inverted_index

    src = f"{sf_dir}/documents.parquet"
    tag = hashlib.blake2b(
        f"inv:{os.path.abspath(src)}:{os.path.getmtime(src)}".encode(), digest_size=8
    ).hexdigest()
    index_dir = f"/tmp/ontoea_inv_index/{tag}"
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    if not os.path.exists(os.path.join(index_dir, "_meta.json")):
        build_inverted_index(docs, index_dir, n_buckets=64)
    return bm25_topk(index_dir, docs, list(_BM25_TERMS), k=10)


def _hits_sql(
    rounds: int = 3, scale: int = 1000, edge_ctes: list[str] | None = None
) -> str:
    """Unrolled integer HITS replaying stages/graph.hits_rounds exactly:
    per half-round, HUGEINT sum of the opposite units over the (multi-)edge
    join, then max-rescale with floor division.  ``edge_ctes``'s last entry
    must define ``e(s, d)`` (multi-rows weight naturally)."""
    ctes = list(edge_ctes) if edge_ctes is not None else [
        f"kg AS ({_FLAGSHIP_SQL})",
        "e AS (SELECT subj AS s, obj AS d FROM kg)",
    ]
    ctes += [
        "nodes AS (SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION SELECT d FROM e))",
        f"h0 AS (SELECT n, CAST({scale} AS HUGEINT) AS u FROM nodes)",
    ]
    for r in range(rounds):
        ctes.append(
            f"araw{r} AS (SELECT e.d AS n, SUM(h{r}.u) AS raw"
            f" FROM e JOIN h{r} ON h{r}.n = e.s GROUP BY 1)"
        )
        ctes.append(f"amax{r} AS (SELECT MAX(raw) AS mx FROM araw{r})")
        ctes.append(
            f"a{r + 1} AS (SELECT n, (raw * {scale}) // mx AS u"
            f" FROM araw{r}, amax{r})"
        )
        ctes.append(
            f"hraw{r} AS (SELECT e.s AS n, SUM(a{r + 1}.u) AS raw"
            f" FROM e JOIN a{r + 1} ON a{r + 1}.n = e.d GROUP BY 1)"
        )
        ctes.append(f"hmax{r} AS (SELECT MAX(raw) AS mx FROM hraw{r})")
        ctes.append(
            f"h{r + 1} AS (SELECT n, (raw * {scale}) // mx AS u"
            f" FROM hraw{r}, hmax{r})"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT nodes.n AS node,
           CAST(COALESCE(h{rounds}.u, 0) AS BIGINT) AS hub_units,
           CAST(COALESCE(a{rounds}.u, 0) AS BIGINT) AS auth_units
    FROM nodes LEFT JOIN h{rounds} ON h{rounds}.n = nodes.n
               LEFT JOIN a{rounds} ON a{rounds}.n = nodes.n
"""


@_register(
    "q_hits",
    _hits_sql(
        rounds=3,
        edge_ctes=[
            _OUTLINK_EDGES_CTE.strip(),
            "e AS (SELECT src_domain AS s, dst_domain AS d FROM outlink_edges)",
        ],
    ),
)
def q_hits(sf_dir: str):
    """Integer HITS hubs & authorities (Kleinberg 1999) over the extracted
    host-level web link graph — the complementary centrality to PageRank
    (a domain can be a great DIRECTORY without being a great DESTINATION;
    hubs/authorities separate the two).  `stages/graph.hits_rounds`:
    bit-deterministic integer half-rounds with exact max-rescale instead of
    the float L2 norm, multi-edges weighting naturally; single-task
    scatter-add plan under the broadcast budget, join + keyed-sum + O(1)
    scalar-max half-rounds above it (plan equality pinned by the budget=1
    pytest).  The unrolled oracle replays every unit."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.graph import hits_rounds
    from ontoea_ray.stages.weblinks import domain_edges

    e = domain_edges(pages_from_documents(sf_dir))
    return hits_rounds(e, src="src_domain", dst="dst_domain", rounds=3)


_RECIPROCITY_SQL = f"""
    WITH {_OUTLINK_EDGES_CTE.strip()},
    e AS (SELECT DISTINCT src_domain AS s, dst_domain AS d
          FROM outlink_edges WHERE src_domain <> dst_domain)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM e r
                                      WHERE r.s = e.d AND r.d = e.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_reciprocal
    FROM e
"""


@_register("q_reciprocity", _RECIPROCITY_SQL)
def q_reciprocity(sf_dir: str):
    """Link reciprocity of the directed web domain graph (distinct
    non-self edges with an existing reverse edge) — the classic directed-
    graph statistic separating mutual-citation cores from one-way link
    farms.  ONE canonical-pair exchange answers it without a self-join:
    each distinct edge maps to key (min(s,d), max(s,d)) with a direction
    bit, and a keyed sum of the two bits decides reciprocity per pair —
    both directions of a pair always co-locate, so the count is a
    combiner-first aggregate over pair keys.  The oracle takes the EXISTS
    self-join form; values must agree."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.weblinks import domain_edges

    e = domain_edges(pages_from_documents(sf_dir))

    def canon(b: pa.Table) -> pa.Table:
        s = b["src_domain"].to_pandas().to_numpy(object)
        d = b["dst_domain"].to_pandas().to_numpy(object)
        keep = s != d
        s, d = s[keep], d[keep]
        fwd = s < d
        lo = np.where(fwd, s, d)
        hi = np.where(fwd, d, s)
        df = pd.DataFrame(
            {
                "lo": lo,
                "hi": hi,
                "has_fwd": fwd.astype(np.int64),
                "has_rev": (~fwd).astype(np.int64),
            }
        )
        g = df.groupby(["lo", "hi"], sort=False)[["has_fwd", "has_rev"]].max().reset_index()
        return _from_pandas_clean(g)

    pairs = keyed_aggregate(
        e.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"],
        maxs=["has_fwd", "has_rev"],
    )

    def finish(b: pa.Table) -> pa.Table:
        f = np.asarray(b["has_fwd"].combine_chunks(), np.int64)
        r = np.asarray(b["has_rev"].combine_chunks(), np.int64)
        both = f & r
        n_edges = int((f + r).sum())
        n_recip = int((2 * both).sum())
        return pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_reciprocal": pa.array([n_recip], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    partials = pairs.map_batches(finish, batch_format="pyarrow")
    return (
        compact(partials, width=1)
        .groupby(None)
        .aggregate(
            Sum("n_edges", alias_name="n_edges"),
            Sum("n_reciprocal", alias_name="n_reciprocal"),
        )
    )


def _scc_sql(rounds: int = 4) -> str:
    ctes = [
        _OUTLINK_EDGES_CTE.strip(),
        "e AS (SELECT src_domain AS s, dst_domain AS d FROM outlink_edges)",
        "nodes AS (SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION SELECT d FROM e))",
        "f0 AS (SELECT n, n AS l FROM nodes)",
        "b0 AS (SELECT n, n AS l FROM nodes)",
    ]
    for i in range(rounds):
        ctes.append(
            f"f{i + 1} AS (SELECT f{i}.n, LEAST(f{i}.l, COALESCE(m.ml, f{i}.l)) AS l"
            f" FROM f{i} LEFT JOIN (SELECT e.s AS n, MIN(f{i}.l) AS ml"
            f"   FROM e JOIN f{i} ON f{i}.n = e.d GROUP BY 1) m ON m.n = f{i}.n)"
        )
        ctes.append(
            f"b{i + 1} AS (SELECT b{i}.n, LEAST(b{i}.l, COALESCE(m.ml, b{i}.l)) AS l"
            f" FROM b{i} LEFT JOIN (SELECT e.d AS n, MIN(b{i}.l) AS ml"
            f"   FROM e JOIN b{i} ON b{i}.n = e.s GROUP BY 1) m ON m.n = b{i}.n)"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT f{rounds}.n AS node, f{rounds}.l AS fmin, b{rounds}.l AS bmin,
           CAST(CASE WHEN f{rounds}.l = b{rounds}.l THEN 1 ELSE 0 END AS BIGINT)
             AS in_core
    FROM f{rounds} JOIN b{rounds} ON b{rounds}.n = f{rounds}.n
"""


@_register("q_scc_labels", _scc_sql())
def q_scc_labels(sf_dir: str):
    """Forward-backward SCC coloring of the DIRECTED web domain graph
    (`stages/graph.scc_labels`, 4 rounds): fmin/bmin = min domain
    reachable from / reaching each node within R hops, and fmin == bmin
    certifies membership in that minimum's strongly connected component —
    the bowtie-structure primitive (Broder et al. 2000) behind web-graph
    IN/OUT/CORE decomposition.  Min-label rounds are associative string
    LEAST merges, so the unrolled oracle replays both chains; two
    value-equal plans (single-task synchronous scatter-min under the
    broadcast budget, per-round hash join + keyed min above)."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.graph import scc_labels
    from ontoea_ray.stages.weblinks import domain_edges

    e = domain_edges(pages_from_documents(sf_dir))
    return scc_labels(e, rounds=4)


@_register(
    "q_domain_pagerank",
    _pagerank_sql(
        iters=3,
        edge_ctes=[
            _OUTLINK_EDGES_CTE.strip(),
            "e AS (SELECT src_domain AS s, dst_domain AS d FROM outlink_edges)",
        ],
    ),
)
def q_domain_pagerank(sf_dir: str):
    """Integer PageRank over the EXTRACTED web link graph at host level —
    the Common-Crawl centrality ranking (which domains dominate the crawl;
    the host-rank the public web-graph releases publish).  Edges come from
    `stages/weblinks.domain_edges` (href extraction, one zero-copy pass);
    the power iteration is `stages/graph.pagerank`'s bit-deterministic
    integer mass scheme, multi-edges weighting naturally, so the unrolled
    oracle replays every rank unit.  3 iterations keep the oracle's
    unrolled join chain tractable at sf0.01."""
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.graph import pagerank
    from ontoea_ray.stages.weblinks import domain_edges

    e = domain_edges(pages_from_documents(sf_dir))
    return pagerank(e, src="src_domain", dst="dst_domain", iters=3)


# ---------------------------------------------------------------------------
# ontology-constraint validation / crawl scheduling / attribution
# ---------------------------------------------------------------------------

def _disjoint_audit_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h, splitmix64_ctes
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.state.ontology import THING

    onto = bootstrap_ontology()
    non_root = [c for c in onto.classes() if c != THING]
    tops = sorted({p for p in onto.subclass.values() if p != THING} |
                  {c for c, p in onto.subclass.items() if p == THING})
    top_idx = [tops.index(onto.path(c)[-2]) for c in non_root]
    in_top0 = ", ".join(str(i) for i, t in enumerate(top_idx) if t == 0)
    return f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    ent0 AS (SELECT DISTINCT e
             FROM (SELECT subj AS e FROM kg UNION SELECT obj AS e FROM kg)),
    {splitmix64_ctes("ent0", _h("e"))},
    top AS (SELECT e, CASE WHEN (_h % {len(non_root)}) IN ({in_top0})
                           THEN 0 ELSE 1 END AS topc FROM sm3),
    j AS (SELECT kg.pred, kg.n_mentions,
                 CASE WHEN ts.topc <> tt.topc THEN 1 ELSE 0 END AS viol
          FROM kg JOIN top ts ON ts.e = kg.subj JOIN top tt ON tt.e = kg.obj)
    SELECT pred,
           CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(viol) AS BIGINT) AS n_viol,
           CAST(SUM(viol * n_mentions) AS BIGINT) AS viol_mentions,
           CAST(SUM(viol) * 1000 // COUNT(*) AS BIGINT) AS viol_milli
    FROM j GROUP BY pred
"""


@_register("q_disjoint_audit", _disjoint_audit_sql())
def q_disjoint_audit(sf_dir: str):
    """Ontology-constraint validation of the constructed KG (the north-star
    "ontology-guided" audit a KG consumer runs before publishing an edge
    table): every flagship edge whose subject and object fall under
    DISJOINT top-level classes of the bootstrap ontology is a type
    violation, reported per predicate with edge- and evidence-weighted
    counts plus an integer-milli violation rate — the per-predicate signal
    that flags extraction rules emitting type-incoherent triples.

    Class assignment here is the audit's own deterministic map — each
    entity URI hashes to one of the non-root classes via the engine-wide
    md5[:8] + splitmix64 convention (NOT the linker's blake2b gazetteer
    classes, which no SQL engine can replay); the disjointness logic on
    top of it is exactly `state/ontology.check_disjoint` on ancestor
    paths, precomputed to a class->top lookup because the bootstrap
    ontology's only disjoint axis is its top pair.  Scale shape: the
    class map is a pure per-row hash (no broadcast, no join — at 10^12
    edges the per-batch cost is two vectorized hash passes), and the
    per-pred reduction is combiner-first over a dozen keys.  The DuckDB
    oracle extends the flagship CTE chain with the same splitmix
    assignment and replays every count bit-for-bit."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.state.ontology import THING, check_disjoint

    onto = bootstrap_ontology()
    non_root = [c for c in onto.classes() if c != THING]
    tops = sorted({c for c, p in onto.subclass.items() if p == THING})
    top_idx = np.array([tops.index(onto.path(c)[-2]) for c in non_root], np.int64)
    # Precondition for the class->top reduction: two classes violate iff
    # their tops are the declared disjoint pair (true for any tree ontology
    # whose only disjoint axis is between top-level classes).
    paths = {c: onto.path(c) for c in non_root}
    for i, a in enumerate(non_root):
        for j, b in enumerate(non_root):
            assert check_disjoint(onto.disjoint, paths[a], paths[b]) == (
                top_idx[i] != top_idx[j]
            )
    n_cls = np.uint64(len(non_root))

    kg = _kg_cached(sf_dir)

    def flag(b: pa.Table) -> pa.Table:
        def top_of(col: str) -> np.ndarray:
            h = _token_hashes(b[col].combine_chunks(), backend="md5")
            return top_idx[(splitmix64(h) % n_cls).astype(np.int64)]

        viol = (top_of("subj") != top_of("obj")).astype(np.int64)
        nm = np.asarray(b["n_mentions"].combine_chunks(), np.int64)
        return pa.table(
            {
                "pred": b["pred"],
                "n_viol": pa.array(viol),
                "viol_mentions": pa.array(viol * nm),
            }
        )

    agg = keyed_aggregate(
        kg.map_batches(flag, batch_format="pyarrow"),
        ["pred"],
        sums=["n_viol", "viol_mentions"],
        count_alias="n_edges",
    )

    def finish(b: pa.Table) -> pa.Table:
        nv = np.asarray(b["n_viol"].combine_chunks(), np.int64)
        ne = np.asarray(b["n_edges"].combine_chunks(), np.int64)
        return pa.table(
            {
                "pred": b["pred"],
                "n_edges": b["n_edges"],
                "n_viol": b["n_viol"],
                "viol_mentions": b["viol_mentions"],
                "viol_milli": pa.array(nv * 1000 // ne, pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


_ATTRIB_WIN_US = 7 * 24 * 3600 * 1_000_000

_ATTRIBUTION_SQL = f"""
    WITH w AS (
      SELECT event_id, user_id, event_type, ts, value,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
               OVER win AS click_id,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
               OVER win AS click_ts
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           CAST(FLOOR(value * 100) AS BIGINT) AS purchase_cents,
           CAST(CASE WHEN click_ts IS NOT NULL
                      AND date_diff('microsecond', click_ts, ts) <= {_ATTRIB_WIN_US}
                     THEN click_id ELSE -1 END AS BIGINT) AS click_event_id,
           CAST(CASE WHEN click_ts IS NOT NULL
                      AND date_diff('microsecond', click_ts, ts) <= {_ATTRIB_WIN_US}
                     THEN date_diff('microsecond', click_ts, ts) ELSE -1 END AS BIGINT)
             AS lag_us
    FROM w WHERE event_type = 'purchase'
"""


@_register("q_attribution", _ATTRIBUTION_SQL)
def q_attribution(sf_dir: str):
    """Last-touch conversion attribution — the credit-assignment join ad
    and growth pipelines run at clickstream scale: each purchase is
    attributed to its user's most recent PRECEDING click within a 7-day
    window (ties broken by event_id, so the order is total and the result
    a pure function of the table), emitting one row per purchase with the
    credited click id and the click->purchase lag (-1 = organic / outside
    window).  The shape q_asof_join cannot express directly: the match key
    is a FILTERED subset (clicks only) of the same stream being scanned,
    so it is ONE user-keyed co-location with a per-partition vectorized
    last-click forward-fill (segment-reset cummax over click row indices —
    no per-user loop, no self-join, no second exchange), the streaming
    sessionization skeleton reused for credit assignment.  At 10^12 events
    the exchange is the only data movement and hot users salt like any
    keyed stage.  The window-function oracle replays every credited id and
    lag exactly (purchase cents via FLOOR(value*100), IEEE-identical)."""
    from ontoea_ray.functions.shuffle import with_partition_key

    ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])
    parted = with_partition_key(ev, ["user_id"])

    def attrib(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        etype = df["event_type"].to_numpy()
        is_click = etype == "click"
        # last click INDEX at or before each row, reset per user segment:
        # click rows carry their own position, others -1; per-user cummax
        # forward-fills the latest click position (C kernel, no row loop)
        pos = np.where(is_click, np.arange(len(df)), -1)
        idx = (
            pd.Series(pos).groupby(pd.Series(uid), sort=False).cummax().to_numpy(np.int64)
        )
        pm = etype == "purchase"
        pidx = idx[pm]
        has = pidx >= 0
        safe = np.maximum(pidx, 0)
        lag = np.where(has, ts[pm] - ts[safe], -1)
        ok = has & (lag <= _ATTRIB_WIN_US)
        cents = np.floor(df["value"].to_numpy(np.float64)[pm] * 100).astype(np.int64)
        return pa.table(
            {
                "event_id": pa.array(eid[pm]),
                "user_id": pa.array(uid[pm]),
                "purchase_cents": pa.array(cents),
                "click_event_id": pa.array(np.where(ok, eid[safe], -1)),
                "lag_us": pa.array(np.where(ok, lag, -1)),
            }
        )

    return parted.groupby("pkey").map_groups(attrib, batch_format="pandas")


def _politeness_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h, splitmix64_ctes

    return f"""
    WITH hosts0 AS (SELECT DISTINCT source FROM documents),
    {splitmix64_ctes("hosts0", _h("source"))},
    hosts AS (SELECT source, CAST(100 * (1 + _h % 9) AS BIGINT) AS delay_ms FROM sm3),
    r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS slot
          FROM documents)
    SELECT r.doc_id, r.source, CAST(r.slot AS BIGINT) AS slot, h.delay_ms,
           CAST((r.slot - 1) * h.delay_ms AS BIGINT) AS start_ms
    FROM r JOIN hosts h USING (source)
"""


@_register("q_politeness_schedule", _politeness_sql())
def q_politeness_schedule(sf_dir: str):
    """Per-host politeness scheduling — the fetch-slot assignment a
    distributed crawler derives from robots crawl-delay before dispatching
    a frontier (one fetch per host at a time, consecutive fetches spaced by
    the host's delay): each document gets its host-local slot (rank by
    doc_id within source) and an absolute start offset slot*delay, with the
    per-host delay a deterministic function of the host name (100 ms x
    (1 + splitmix64(md5(host)) % 9) — the engine-wide replayable hash
    chain standing in for a parsed robots value, cf. q_robots_filter for
    the actual parser).  ONE host-keyed co-location + in-partition
    cumcount; the delay is a vectorized hash of the batch's UNIQUE hosts
    (dictionary trick), so no broadcast and no join anywhere — at frontier
    scale each host's queue ships once and hot hosts are exactly the rows
    a real crawler must serialize anyway.  ROW_NUMBER + the splitmix CTE
    chain replay every slot and start offset bit-for-bit."""
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    parted = with_partition_key(ds, ["source"])

    def schedule(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["source", "doc_id"], kind="mergesort")
        slot = (df.groupby("source", sort=False).cumcount() + 1).to_numpy(np.int64)
        src = pa.array(df["source"].to_numpy(object), pa.string())
        h = splitmix64(_token_hashes(src, backend="md5"))
        delay = (100 * (1 + (h % np.uint64(9)).astype(np.int64))).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "source": src,
                "slot": pa.array(slot),
                "delay_ms": pa.array(delay),
                "start_ms": pa.array((slot - 1) * delay),
            }
        )

    return parted.groupby("pkey").map_groups(schedule, batch_format="pandas")


def _type_infer_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h, splitmix64_ctes
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.state.ontology import THING

    n_cls = len([c for c in bootstrap_ontology().classes() if c != THING])
    return f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    obj0 AS (SELECT DISTINCT obj AS e FROM kg),
    {splitmix64_ctes("obj0", _h("e"))},
    ocls AS (SELECT e, CAST(_h % {n_cls} AS BIGINT) AS cls FROM sm3),
    v AS (SELECT kg.subj AS entity, ocls.cls,
                 SUM(kg.n_mentions) AS votes
          FROM kg JOIN ocls ON ocls.e = kg.obj GROUP BY 1, 2),
    t AS (SELECT entity, SUM(votes) AS total FROM v GROUP BY 1),
    r AS (SELECT entity, cls, votes,
                 ROW_NUMBER() OVER (PARTITION BY entity
                                    ORDER BY votes DESC, cls ASC) AS rn
          FROM v)
    SELECT r.entity, r.cls, CAST(r.votes AS BIGINT) AS votes,
           CAST(t.total AS BIGINT) AS total_votes,
           CAST(r.votes * 1000 // t.total AS BIGINT) AS conf_milli
    FROM r JOIN t USING (entity) WHERE rn = 1
"""


@_register("q_type_infer", _type_infer_sql())
def q_type_infer(sf_dir: str):
    """Neighbor-majority type inference (type completion): each SUBJECT's
    class is inferred as the evidence-weighted modal class of the objects
    it points at (votes = n_mentions, ties to the smaller class id), with
    an integer-milli confidence — the relation-based typing step a KG
    pipeline runs for entities the gazetteer could not type directly
    (untyped subjects inherit what their neighborhood consistently points
    at; a low confidence marks type-incoherent hubs for review, the same
    signal q_disjoint_audit aggregates per predicate).  Object classes
    reuse the audit's SQL-replayable md5+splitmix assignment.

    Scale shape: the object class is a pure per-row hash (no class-map
    join), per-batch partials collapse (entity, cls) votes in-block, and
    ONE subject-keyed exchange computes votes, totals and the argmax in a
    single co-located pass — no second shuffle, no window function over
    the corpus.  The oracle replays votes, winner and confidence exactly."""
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.state.ontology import THING

    n_cls = np.uint64(
        len([c for c in bootstrap_ontology().classes() if c != THING])
    )
    kg = _kg_cached(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        h = splitmix64(_token_hashes(b["obj"].combine_chunks(), backend="md5"))
        df = pd.DataFrame(
            {
                "entity": b["subj"].to_pandas(),
                "cls": (h % n_cls).astype(np.int64),
                "votes": np.asarray(b["n_mentions"].combine_chunks(), np.int64),
            }
        )
        g = df.groupby(["entity", "cls"], sort=False)["votes"].sum().reset_index()
        return _from_pandas_clean(g)

    parted = with_partition_key(
        kg.map_batches(partial, batch_format="pyarrow"), ["entity"]
    )

    def infer(df: pd.DataFrame) -> pa.Table:
        g = df.groupby(["entity", "cls"], sort=False)["votes"].sum().reset_index()
        g["total_votes"] = g.groupby("entity", sort=False)["votes"].transform("sum")
        g = g.sort_values(
            ["entity", "votes", "cls"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("entity", keep="first")
        out = pd.DataFrame(
            {
                "entity": g["entity"],
                "cls": g["cls"].astype(np.int64),
                "votes": g["votes"].astype(np.int64),
                "total_votes": g["total_votes"].astype(np.int64),
            }
        )
        out["conf_milli"] = out["votes"] * 1000 // out["total_votes"]
        return _from_pandas_clean(out)

    return parted.groupby("pkey").map_groups(infer, batch_format="pandas")


def _coloring_sql(rounds: int = 6, *, pct: int = 7) -> str:
    """Unrolled R-round Jones–Plassmann coloring over the splitmix64-
    sampled co-purchase graph: the q_mis round chain with the single
    semantic difference replayed — winners leave, their neighbours STAY
    (no nb{r} CTE; survivors are simply s{r} minus w{r})."""
    from ontoea_ray.functions.lsh_sql import TWO64, splitmix64_ctes
    from ontoea_ray.stages.graph import _JP_SALT

    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
        ", s0 AS MATERIALIZED (SELECT a AS node FROM e0 UNION SELECT b AS node FROM e0)",
    ]
    for r in range(rounds):
        key = f"((CAST(node AS HUGEINT) * {_JP_SALT} + {r}) % {TWO64})"
        p.append(f", pr{r} AS (SELECT node FROM s{r}),")
        p.append(splitmix64_ctes(f"pr{r}", key, sfx=f"_m{r}"))
        p.append(
            f", l{r} AS MATERIALIZED (SELECT CASE WHEN (pa._h > pb._h)"
            f" OR (pa._h = pb._h AND e{r}.a > e{r}.b)"
            f" THEN e{r}.a ELSE e{r}.b END AS node"
            f" FROM e{r} JOIN sm3_m{r} pa ON pa.node = e{r}.a"
            f" JOIN sm3_m{r} pb ON pb.node = e{r}.b)"
        )
        p.append(
            f", w{r} AS MATERIALIZED (SELECT node FROM s{r}"
            f" WHERE node NOT IN (SELECT node FROM l{r}))"
        )
        p.append(
            f", s{r + 1} AS MATERIALIZED (SELECT node FROM s{r}"
            f" WHERE node NOT IN (SELECT node FROM w{r}))"
        )
        p.append(
            f", e{r + 1} AS MATERIALIZED (SELECT e{r}.a, e{r}.b FROM e{r}"
            f" JOIN s{r + 1} sa ON e{r}.a = sa.node JOIN s{r + 1} sb ON e{r}.b = sb.node)"
        )
    selects = [
        f"SELECT CAST(node AS BIGINT) AS node, CAST({r} AS BIGINT) AS color FROM w{r}"
        for r in range(rounds)
    ]
    p.append("\n" + "\nUNION ALL ".join(selects))
    return "\n".join(p)


@_register("q_coloring", _coloring_sql(6))
def q_coloring(sf_dir: str):
    """6-round deterministic Jones–Plassmann greedy coloring over the
    splitmix64-sampled (7%) co-purchase graph — the parallel coloring
    primitive (Jones & Plassmann 1993) that turns a conflict graph into
    conflict-free update batches (all nodes of one color mutate in
    parallel): per round the surviving local priority minima take the
    round index as their color and leave, losers stay for the next color.
    Adjacent nodes can never win the same round, so the coloring is proper
    by construction; the q_mis machinery with winners-only removal
    (`stages/graph.jp_coloring`, same two budget-switched plans).  The
    unrolled oracle replays every priority, win and residual bit-for-bit."""
    from ontoea_ray.stages.graph import jp_coloring
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return jp_coloring(sampled, rounds=6, src="id_a", dst="id_b")


def _blocking_quality_sql() -> str:
    from ontoea_ray.functions.lsh_sql import (
        lsh_neardup_sql,
        minhash_lsh_candidates_sql,
    )

    cand = minhash_lsh_candidates_sql(num_perm=64, bands=16)
    hits = lsh_neardup_sql(threshold=0.5)
    return f"""
    WITH cand AS ({cand}),
    tp AS ({_SHINGLE_SQL}),
    hits AS ({hits}),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT (SELECT n FROM nd) AS n_docs,
           (SELECT COUNT(*) FROM cand) AS n_cand,
           (SELECT COUNT(*) FROM tp) AS n_true,
           (SELECT COUNT(*) FROM hits) AS n_hit,
           CAST(CASE WHEN (SELECT COUNT(*) FROM tp) = 0 THEN -1
                ELSE (SELECT COUNT(*) FROM hits) * 1000 // (SELECT COUNT(*) FROM tp)
                END AS BIGINT) AS recall_milli,
           CAST((SELECT COUNT(*) FROM cand) * 1000000
                // (((SELECT n FROM nd) * ((SELECT n FROM nd) - 1)) // 2)
                AS BIGINT) AS reduction_ppm
"""


@_register("q_blocking_quality", _blocking_quality_sql())
def q_blocking_quality(sf_dir: str):
    """Blocking-quality audit — pairs completeness and reduction ratio
    (Christen, "Data Matching" 2012), the two numbers that decide whether
    a candidate-blocking scheme is safe to deploy at corpus scale: recall
    = how many of the TRUE near-dup pairs (exact 3-shingle Jaccard >= 0.5,
    q_jaccard_pairs' ground truth) survive into the MinHash-LSH candidate
    set (64 perms / 16 bands, q_minhash_lsh's exact chain), and
    reduction_ppm = the candidate set as parts-per-million of all n(n-1)/2
    possible pairs (the work the blocker saves).  A recall drop after a
    band/perm retune — or a reduction blow-up after a shingle change — is
    the regression this query catches in CI before a 10^12-doc run.

    All three pair sets are the engine's existing distributed operators
    (bucketed banding, capped hot buckets, pair-keyed verify — nothing new
    lands on the driver; the four scalars arrive via count()).  n_hit
    reuses the verified-pair operator because candidates ∩ truth IS the
    verify step.  The oracle composes the same three replayable sub-SQLs
    and recomputes every scalar, recall and reduction bit-for-bit."""
    from ontoea_ray.stages.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        lsh_near_duplicates,
    )

    n_docs = _read(sf_dir, "documents", ["doc_id"]).count()
    n_cand = lsh_candidate_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), num_perm=64, bands=16
    ).count()
    n_true = jaccard_pairs(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5, shingle_n=3
    ).count()
    n_hit = lsh_near_duplicates(
        _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.5
    ).count()
    recall = n_hit * 1000 // n_true if n_true else -1
    reduction = n_cand * 1_000_000 // ((n_docs * (n_docs - 1)) // 2)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_cand": pa.array([n_cand], pa.int64()),
            "n_true": pa.array([n_true], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "recall_milli": pa.array([recall], pa.int64()),
            "reduction_ppm": pa.array([reduction], pa.int64()),
        }
    )


def _triple_pr_sql(rate: int = 9, denom: int = 10) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    sampled = _FLAGSHIP_SQL.replace("FROM documents", "FROM sdocs")
    return f"""
    WITH d0 AS (SELECT doc_id, text, source FROM documents),
    {splitmix64_ctes("d0", "CAST(doc_id AS HUGEINT)")},
    sdocs AS (SELECT doc_id, text, source FROM sm3 WHERE _h % {denom} < {rate}),
    ref AS ({_FLAGSHIP_SQL}),
    got AS ({sampled}),
    hit AS (SELECT ref.subj FROM ref JOIN got USING (subj, pred, obj))
    SELECT (SELECT COUNT(*) FROM ref) AS n_ref,
           (SELECT COUNT(*) FROM got) AS n_got,
           (SELECT COUNT(*) FROM hit) AS n_hit,
           CAST((SELECT COUNT(*) FROM hit) * 1000
                // (SELECT COUNT(*) FROM got) AS BIGINT) AS prec_milli,
           CAST((SELECT COUNT(*) FROM hit) * 1000
                // (SELECT COUNT(*) FROM ref) AS BIGINT) AS rec_milli
"""


@_register("q_triple_pr", _triple_pr_sql())
def q_triple_pr(sf_dir: str):
    """Triple-level precision/recall between two KG builds — the north
    rule's P/R >= 0.95 measurement as a first-class operator, exercised
    here as a sampled-ingest ablation: the full flagship edge table is the
    reference, the candidate is the SAME pipeline run end-to-end (its own
    corpus-derived gazetteer included) over a deterministic 90% document
    sample (splitmix64(doc_id) % 10 < 9) — the question a crawl operator
    actually asks ("how much KG do I lose ingesting 90% of the crawl?").
    The measured answer at sf0.01 is the finding: ~0.65/0.61 P/R, NOT
    ~0.9 — dropping 10% of documents reshuffles the frequency-ranked
    gazetteer head, and every entity that changes rank changes its URI
    and all its edges.  Gazetteer stability, not raw coverage, dominates
    edge churn; a production pipeline must pin the vocabulary prepass
    (bootstrap_linker_cached's artifact contract) across crawl increments
    exactly as kg_upsert assumes.

    Scale shape: both edge tables are combiner-sized pipeline outputs;
    the intersection is ONE (subj, pred, obj)-keyed co-location of the
    side-tagged union, and the driver sees five scalars.  The oracle
    nests two full flagship CTE chains (the candidate chain reading the
    splitmix-sampled document CTE) and replays every count."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_from_corpus,
        construct_kg,
    )
    from ontoea_ray.sources.pages import _docs_to_pages
    from ontoea_ray.stages.extract import extract_text_stage
    from ontoea_ray.stages.sampling import hash_sample

    ref = _kg_cached(sf_dir)

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    sampled_pages = hash_sample(
        docs, key_col="doc_id", rate_pct=9, denom=10
    ).map_batches(_docs_to_pages, batch_format="pyarrow")
    state = bootstrap_linker_from_corpus(extract_text_stage(sampled_pages))
    got = construct_kg(sampled_pages, state)

    def tag(flag: str):
        def fn(b: pa.Table) -> pa.Table:
            one = np.zeros(len(b), np.int64)
            return pa.table(
                {
                    "subj": b["subj"],
                    "pred": b["pred"],
                    "obj": b["obj"],
                    "in_ref": pa.array(one + (flag == "ref")),
                    "in_got": pa.array(one + (flag == "got")),
                }
            )

        return fn

    both = keyed_aggregate(
        ref.map_batches(tag("ref"), batch_format="pyarrow").union(
            got.map_batches(tag("got"), batch_format="pyarrow")
        ),
        ["subj", "pred", "obj"],
        sums=["in_ref", "in_got"],
    )
    def only_hits(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater(b["in_ref"], 0), pc.greater(b["in_got"], 0)
        )
        return b.filter(m).select(["subj"])

    n_hit = both.map_batches(only_hits, batch_format="pyarrow").count()
    n_ref, n_got = ref.count(), got.count()
    return pa.table(
        {
            "n_ref": pa.array([n_ref], pa.int64()),
            "n_got": pa.array([n_got], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "prec_milli": pa.array([n_hit * 1000 // n_got], pa.int64()),
            "rec_milli": pa.array([n_hit * 1000 // n_ref], pa.int64()),
        }
    )


def _triple_pr_pinned_sql(rate: int = 9, denom: int = 10) -> str:
    from ontoea_ray.functions.lsh_sql import splitmix64_ctes

    # candidate chain = flagship chain with the MENTION SCAN reading the
    # sampled corpus while freq/ents/preds (the gazetteer) still read the
    # full corpus: insert sampled pages/tok CTEs, then point the 3-token
    # window joins in `matches` at them (unique anchors, asserted)
    ins = (
        "spages AS (\n"
        "  SELECT 'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR) AS url, text\n"
        "  FROM sdocs\n"
        "),\n"
        "stok AS (\n"
        "  SELECT url, unnest(t) AS tok, unnest(range(1, len(t) + 1)) AS i\n"
        "  FROM (SELECT url, str_split(text, ' ') AS t FROM spages)\n"
        "),\n"
        "freq AS"
    )
    for anchor in ("freq AS", "FROM tok a", "JOIN tok b", "JOIN tok c"):
        assert _FLAGSHIP_SQL.count(anchor) == 1, anchor
    pinned = (
        _FLAGSHIP_SQL.replace("freq AS", ins, 1)
        .replace("FROM tok a", "FROM stok a")
        .replace("JOIN tok b", "JOIN stok b")
        .replace("JOIN tok c", "JOIN stok c")
    )
    return f"""
    WITH d0 AS (SELECT doc_id, text, source FROM documents),
    {splitmix64_ctes("d0", "CAST(doc_id AS HUGEINT)")},
    sdocs AS (SELECT doc_id, text, source FROM sm3 WHERE _h % {denom} < {rate}),
    ref AS ({_FLAGSHIP_SQL}),
    got AS ({pinned}),
    hit AS (SELECT ref.subj FROM ref JOIN got USING (subj, pred, obj))
    SELECT (SELECT COUNT(*) FROM ref) AS n_ref,
           (SELECT COUNT(*) FROM got) AS n_got,
           (SELECT COUNT(*) FROM hit) AS n_hit,
           CAST((SELECT COUNT(*) FROM hit) * 1000
                // (SELECT COUNT(*) FROM got) AS BIGINT) AS prec_milli,
           CAST((SELECT COUNT(*) FROM hit) * 1000
                // (SELECT COUNT(*) FROM ref) AS BIGINT) AS rec_milli
"""


@_register("q_triple_pr_pinned", _triple_pr_pinned_sql())
def q_triple_pr_pinned(sf_dir: str):
    """The q_triple_pr ablation with the gazetteer PINNED to the full-
    corpus artifact (bootstrap_linker_cached — the contract kg_upsert
    assumes across crawl increments): only the mention scan reads the 90%
    sample, so the P/R gap isolates pure document-coverage loss from the
    gazetteer churn q_triple_pr measures.  Together the two queries answer
    the operational question pair: "what does sampled ingest cost with a
    frozen vocabulary?" (this query — precision near 1000: a subset corpus
    with the same gazetteer and evidence-majority canonicalization rarely
    invents edges) vs "what if the vocabulary prepass re-runs too?"
    (q_triple_pr — P/R collapses to ~0.65 because rank reshuffles rename
    entities wholesale).  Same one-exchange intersection; the oracle
    splices sampled page/token CTEs into the flagship chain's mention
    window while freq/ents/preds keep reading the full corpus."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_cached,
        construct_kg,
    )
    from ontoea_ray.sources.pages import _docs_to_pages
    from ontoea_ray.stages.sampling import hash_sample

    ref = _kg_cached(sf_dir)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    sampled_pages = hash_sample(
        docs, key_col="doc_id", rate_pct=9, denom=10
    ).map_batches(_docs_to_pages, batch_format="pyarrow")
    got = construct_kg(sampled_pages, bootstrap_linker_cached(sf_dir))

    def tag(flag: str):
        def fn(b: pa.Table) -> pa.Table:
            one = np.zeros(len(b), np.int64)
            return pa.table(
                {
                    "subj": b["subj"],
                    "pred": b["pred"],
                    "obj": b["obj"],
                    "in_ref": pa.array(one + (flag == "ref")),
                    "in_got": pa.array(one + (flag == "got")),
                }
            )

        return fn

    both = keyed_aggregate(
        ref.map_batches(tag("ref"), batch_format="pyarrow").union(
            got.map_batches(tag("got"), batch_format="pyarrow")
        ),
        ["subj", "pred", "obj"],
        sums=["in_ref", "in_got"],
    )

    def only_hits(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(b["in_ref"], 0), pc.greater(b["in_got"], 0))
        return b.filter(m).select(["subj"])

    n_hit = both.map_batches(only_hits, batch_format="pyarrow").count()
    n_ref, n_got = ref.count(), got.count()
    return pa.table(
        {
            "n_ref": pa.array([n_ref], pa.int64()),
            "n_got": pa.array([n_got], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "prec_milli": pa.array([n_hit * 1000 // n_got], pa.int64()),
            "rec_milli": pa.array([n_hit * 1000 // n_ref], pa.int64()),
        }
    )


_LIFESPAN_FINAL = """SELECT subj, pred, obj, MIN(url) AS first_url, COUNT(*) AS n_mentions
FROM subbed GROUP BY subj, pred, obj"""

_LIFESPAN_SQL = _FLAGSHIP_SQL.replace(
    _LIFESPAN_FINAL,
    """SELECT subj, pred, obj, MIN(url) AS first_url, COUNT(*) AS n_mentions,
       MIN(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT)) AS first_seen,
       MAX(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT)) AS last_seen,
       MAX(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT))
         - MIN(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT)) AS span_s
FROM subbed GROUP BY subj, pred, obj""",
)
assert _LIFESPAN_SQL != _FLAGSHIP_SQL  # anchor must match


@_register("q_edge_lifespan", _LIFESPAN_SQL)
def q_edge_lifespan(sf_dir: str):
    """Temporal KG: each canonical edge's observation window — first/last
    crawl timestamp any supporting mention was seen at (warc_ts is
    epoch + doc_id seconds, so the integer doc_id IS the second offset)
    plus the span between them.  The freshness signal an incremental KG
    consumer filters on (an edge last seen one crawl generation ago is
    stale; a wide span is a stable fact, a zero span a single-crawl blip)
    — and the temporal complement of q_kg_diff's between-snapshot view.

    Scale shape: IDENTICAL to the flagship — a lifespan-aware combiner
    runs INSIDE the scan actors (`scan_and_link_stage(combine_fn=...)`,
    the combine_dedup hook generalized), so raw mention rows still never
    enter the object store; the combiner carries (min url, count, min/max
    seen) per distinct triple, canonical substitution passes the extra
    columns through, and ONE triple-keyed exchange merges with min/max/sum
    — every aggregate associative, so the merge is exact.  The oracle is
    the flagship CTE chain with min/max doc-id extraction added to the
    final reduction."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, sized_width
    from ontoea_ray.pipelines.kg_construct import bootstrap_linker_cached
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.canonicalize import (
        _triple_key,
        build_canonical_map,
        make_canonicalizer,
    )
    from ontoea_ray.stages.extract import extract_text_stage
    from ontoea_ray.stages.scan_link import scan_and_link_stage

    def lifespan_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "tkey": pa.array([], pa.string()),
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "n_mentions": pa.array([], pa.int64()),
                    "first_seen": pa.array([], pa.int64()),
                    "last_seen": pa.array([], pa.int64()),
                }
            )
        key = _triple_key(
            batch["subj"].combine_chunks(),
            batch["pred"].combine_chunks(),
            batch["obj"].combine_chunks(),
        )
        enc = pc.dictionary_encode(key)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        first = np.full(len(enc.dictionary), n, np.int64)
        np.minimum.at(first, codes, np.arange(n, dtype=np.int64))
        url = batch["url"].combine_chunks()
        doc = pc.cast(
            pc.extract_regex(url, r"(?P<d>[0-9]+)$").field("d"), pa.int64()
        )
        gb = (
            pa.table({"c": pa.array(codes), "u": url, "d": doc})
            .group_by("c")
            .aggregate([("u", "min"), ("d", "min"), ("d", "max"), ("c", "count")])
        )
        order = pc.sort_indices(gb["c"])
        take = pa.array(first)
        return pa.table(
            {
                "tkey": enc.dictionary,
                "subj": batch["subj"].combine_chunks().take(take),
                "pred": batch["pred"].combine_chunks().take(take),
                "obj": batch["obj"].combine_chunks().take(take),
                "url": gb["u_min"].combine_chunks().take(order),
                "n_mentions": gb["c_count"].combine_chunks().take(order).cast(pa.int64()),
                "first_seen": gb["d_min"].combine_chunks().take(order),
                "last_seen": gb["d_max"].combine_chunks().take(order),
            }
        )

    pages = pages_from_documents(sf_dir)
    state_ref = ray.put(bootstrap_linker_cached(sf_dir))
    partials = scan_and_link_stage(
        extract_text_stage(pages), state_ref, combine_fn=lifespan_partial
    ).materialize()
    canon_map = build_canonical_map(partials, weight_col="n_mentions")
    canon = partials.map_batches(
        make_canonicalizer(ray.put(canon_map), partial=True), batch_format="pyarrow"
    )
    merged = keyed_aggregate(
        canon.drop_columns(["tkey"]),
        ["subj", "pred", "obj"],
        sums=["n_mentions"],
        mins=["url", "first_seen"],
        maxs=["last_seen"],
        width=sized_width(partials.size_bytes()),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "first_url": b["url"],
                "n_mentions": b["n_mentions"],
                "first_seen": b["first_seen"],
                "last_seen": b["last_seen"],
                "span_s": pc.subtract(b["last_seen"], b["first_seen"]),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


_PRED_INVERSE_SQL = f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    e AS (SELECT DISTINCT subj, pred, obj FROM kg),
    tot AS (SELECT pred, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1),
    inv AS (
      SELECT e1.pred AS pred_a, e2.pred AS pred_b,
             CAST(COUNT(*) AS BIGINT) AS n_inverse
      FROM e e1 JOIN e e2
        ON e1.subj = e2.obj AND e1.obj = e2.subj AND e1.pred < e2.pred
      GROUP BY 1, 2)
    SELECT pred_a, pred_b, n_inverse,
           ta.n AS n_a, tb.n AS n_b,
           CAST(1000 * n_inverse // LEAST(ta.n, tb.n) AS BIGINT) AS score_milli
    FROM inv
    JOIN tot ta ON ta.pred = inv.pred_a
    JOIN tot tb ON tb.pred = inv.pred_b
"""


@_register("q_pred_inverse", _PRED_INVERSE_SQL)
def q_pred_inverse(sf_dir: str):
    """Inverse-relation mining over the constructed KG — the PARIS-style
    relation-alignment signal (Suchanek et al., VLDB 2012: p aligns with
    q^-1 when p(s,o) edges systematically co-occur with q(o,s)): for every
    unordered predicate pair p < q, the count of (s,o) pairs asserted by p
    whose reversal (o,s) is asserted by q, normalized by the smaller
    predicate's edge count (integer milli).  Distinct from q_pred_symmetry
    (same-predicate reversal only) and q_pred_composition (2-hop paths).

    Plan: the mirror join is ONE (subj,obj)-keyed exchange — an edge and
    any reversal of it hash to mirrored keys, so matching is local after
    the exchange; pair counts reduce combiner-first so the second exchange
    carries per-block (pred_a, pred_b) partials (|preds|^2-bounded, never
    edges); the per-predicate totals table is manifest-scale and rides the
    planner-routed broadcast joins.  No driver state."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    kg = _kg_cached(sf_dir)

    # flagship output is one row per canonical (subj, pred, obj)
    tot = keyed_aggregate(
        kg.map_batches(lambda b: b.select(["pred"]), batch_format="pyarrow"),
        ["pred"],
        count_alias="n",
    ).materialize()

    lhs = kg.map_batches(
        lambda b: pa.table(
            {"subj": b["subj"], "obj": b["obj"], "pred_a": b["pred"]}
        ),
        batch_format="pyarrow",
    )
    rhs = kg.map_batches(
        lambda b: pa.table(
            {"subj": b["obj"], "obj": b["subj"], "pred_b": b["pred"]}
        ),
        batch_format="pyarrow",
    )
    matched = hash_join(lhs, rhs, on=["subj", "obj"])

    def cnt(b: pa.Table) -> pa.Table:
        keep = pc.less(b["pred_a"], b["pred_b"])
        df = b.filter(keep).select(["pred_a", "pred_b"]).to_pandas()
        return _from_pandas_clean(
            df.groupby(["pred_a", "pred_b"], sort=False)
            .size()
            .reset_index(name="n_inverse")
        )

    inv = keyed_aggregate(
        matched.map_batches(cnt, batch_format="pyarrow"),
        ["pred_a", "pred_b"],
        sums=["n_inverse"],
    )

    ta = tot.map_batches(
        lambda b: pa.table({"pred_a": b["pred"], "n_a": b["n"]}),
        batch_format="pyarrow",
    ).materialize()
    tb = tot.map_batches(
        lambda b: pa.table({"pred_b": b["pred"], "n_b": b["n"]}),
        batch_format="pyarrow",
    ).materialize()
    scored = hash_join(hash_join(inv, ta, on=["pred_a"]), tb, on=["pred_b"])

    def finish(b: pa.Table) -> pa.Table:
        n_inv = b["n_inverse"].combine_chunks().to_numpy(zero_copy_only=False)
        n_a = b["n_a"].combine_chunks().to_numpy(zero_copy_only=False)
        n_b = b["n_b"].combine_chunks().to_numpy(zero_copy_only=False)
        score = (1000 * n_inv) // np.minimum(n_a, n_b)
        return pa.table(
            {
                "pred_a": b["pred_a"],
                "pred_b": b["pred_b"],
                "n_inverse": b["n_inverse"],
                "n_a": b["n_a"],
                "n_b": b["n_b"],
                "score_milli": pa.array(score.astype(np.int64)),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


_SKEW_JOIN_SQL = """
    WITH probe AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 1 ELSE l_suppkey END AS key,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem),
    build AS (SELECT s_suppkey AS key, s_nationkey FROM supplier)
    SELECT CAST(s_nationkey AS BIGINT) AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM probe JOIN build USING (key)
    GROUP BY 1
"""


@_register("q_skew_join", _SKEW_JOIN_SQL)
def q_skew_join(sf_dir: str):
    """Skew-resilient salted join (functions/join.salted_join) under a
    deliberately pathological 90%-hot-key probe: lineitem rows collapse
    onto key 1 for 9 of every 10 orders, so a plain (key)-partitioned
    exchange sends ~90% of the probe through ONE partition — the salted
    plan splits the hot key into 8 sub-keys and replicates only the
    matching build rows, spreading the exchange while staying row-for-row
    identical to the plain join (the oracle IS the plain join).  Join
    output reduces per-nation combiner-first."""
    from ontoea_ray.functions.join import salted_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice"])

    def probe(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["l_suppkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.where(ok % 10 < 9, np.int64(1), sk)
        cents = np.round(
            b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({"key": pa.array(key), "cents": pa.array(cents)})

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def build(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": b["s_suppkey"].combine_chunks().cast(pa.int64()),
                "nation": b["s_nationkey"].combine_chunks().cast(pa.int64()),
            }
        )

    joined = salted_join(
        li.map_batches(probe, batch_format="pyarrow"),
        sup.map_batches(build, batch_format="pyarrow"),
        on=["key"],
        salts=8,
        hot_threshold=1_000,
    )

    def cnt(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "nation": b["nation"].combine_chunks().to_numpy(zero_copy_only=False),
                "cents": b["cents"].combine_chunks().to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("nation", sort=False).agg(
            n_rows=("cents", "size"), sum_cents=("cents", "sum")
        ).reset_index()
        g["n_rows"] = g["n_rows"].astype(np.int64)
        return _from_pandas_clean(g)

    return keyed_aggregate(
        joined.map_batches(cnt, batch_format="pyarrow"),
        ["nation"],
        sums=["n_rows", "sum_cents"],
    )


from ontoea_ray.functions.lsh_sql import splitmix64_ctes as _sm_ctes

_RANGE_PARTITION_SQL = f"""
    WITH li AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             l_orderkey * 8 + l_linenumber AS rk
      FROM lineitem),
    {_sm_ctes("li", "rk")},
    samp AS (SELECT cents FROM sm3 WHERE _h % 50 = 0),
    sc AS (SELECT LIST(cents ORDER BY cents) AS v, COUNT(*) AS m FROM samp),
    bounds AS (
      SELECT v[1 + CAST((i.i * (m - 1)) // 8 AS BIGINT)] AS b
      FROM sc, (SELECT unnest(range(1, 8)) AS i) i),
    assigned AS (
      SELECT cents,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM bounds WHERE b < cents)
               AS range_id
      FROM li)
    SELECT range_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(cents) AS min_v,
           MAX(cents) AS max_v
    FROM assigned GROUP BY 1
"""


@_register("q_range_partition", _RANGE_PARTITION_SQL)
def q_range_partition(sf_dir: str):
    """Sample-sort range partitioning (stages/layout.range_partition_stats):
    the boundary-planning primitive behind every distributed sort / range-
    partitioned write (TeraSort, Spark RangePartitioner).  A deterministic
    splitmix64 2% row sample yields 7 split values of the price column
    (single-task sort over the BOUNDED sample — denom grows with the data,
    the boundary count does not), the 7 scalars broadcast, and one
    vectorized searchsorted pass reduces to per-range (count, min, max) —
    the statistics that prove the planned ranges are balanced before the
    expensive exchange runs.  Everything integer and hash-deterministic,
    so the oracle replays the sample, the boundary indices and the
    assignment bit-for-bit."""
    from ontoea_ray.stages.layout import range_partition_stats

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        cents = np.round(
            b["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rk = (
            b["l_orderkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64) * 8
            + b["l_linenumber"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table({"cents": pa.array(cents), "rk": pa.array(rk)})

    ds = li.map_batches(prep, batch_format="pyarrow")
    return range_partition_stats(
        ds, col="cents", key_col="rk", n_ranges=8, denom=50
    )
