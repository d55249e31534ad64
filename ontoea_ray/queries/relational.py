"""Queries: relational (split from the former single-module registry)."""

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
               FROM events WHERE event_type = 'click'),
    pairs AS (
      SELECT p.event_id AS event_id, p.user_id AS user_id, p.ts AS pts,
             c.event_id AS click_event_id, c.ts AS cts, c.v,
             ROW_NUMBER() OVER (PARTITION BY p.event_id
                                ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
    SELECT event_id, user_id,
           CAST(epoch_us(pts) AS BIGINT) AS ts_epoch_us,
           click_event_id,
           CAST(epoch_us(cts) AS BIGINT) AS click_ts_epoch_us,
           v AS click_value_milli
    FROM pairs WHERE rn = 1
    """,
)
def q_asof_join(sf_dir: str):
    """Backward as-of join (each purchase ↔ the user's latest click at or
    before it, ties among same-timestamp clicks to the LARGEST event_id —
    a plain SQL ASOF JOIN leaves that tie unspecified, so the oracle is
    the explicit windowed formulation and the engine passes right_tie)
    — the custom temporal operator (`stages/temporal.asof_join`): one
    keyed exchange, vectorized merge_asof per partition."""
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
        right_tie="click_event_id",
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
# time-grid resample with forward fill (gap-fill to a regular series)
# ---------------------------------------------------------------------------

_RESAMPLE_SQL = """
    WITH b AS (SELECT user_id, date_trunc('hour', MIN(ts)) AS mn,
                      date_trunc('hour', MAX(ts)) AS mx
               FROM events GROUP BY 1),
    grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS slot
             FROM b),
    ec AS (SELECT user_id, ts, event_id,
                  CAST(ROUND(value * 100) AS BIGINT) AS cents
           FROM events),
    vals AS (SELECT g.user_id, g.slot, e.cents,
                    ROW_NUMBER() OVER (PARTITION BY g.user_id, g.slot
                                       ORDER BY e.ts DESC, e.event_id DESC) AS rn
             FROM grid g JOIN ec e
               ON e.user_id = g.user_id AND e.ts < g.slot + INTERVAL 1 HOUR),
    cnt AS (SELECT user_id, date_trunc('hour', ts) AS slot, COUNT(*) AS n
            FROM events GROUP BY 1, 2)
    SELECT v.user_id, CAST(epoch_us(v.slot) AS BIGINT) AS slot_us,
           v.cents AS value_cents,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM vals v LEFT JOIN cnt c ON c.user_id = v.user_id AND c.slot = v.slot
    WHERE v.rn = 1
"""


@_register("q_resample", _RESAMPLE_SQL)
def q_resample(sf_dir: str):
    """Time-grid resample with forward fill: each user's irregular event
    stream is re-expressed on a regular hourly grid spanning their first
    to last event, every slot carrying the latest-observed value (ties by
    event_id) and the in-slot event count (0 for gap hours) — the gap-fill
    a feature pipeline or monitoring rollup runs before windowed models
    that assume regular sampling.

    Scale shape: ONE user-keyed co-location; inside each partition the
    fill is vectorized per user — events sorted by (ts, event_id), the
    grid materialized with np.arange, and the carried value located with
    ONE np.searchsorted over the sorted event times (no per-slot scan, no
    join); in-slot counts are an np.bincount over the same pass.  Grid
    rows ~ users x active-hours stream straight out of the partition, so
    nothing corpus-sized ever concentrates.  The SQL replays the identical
    latest-within-bound rule via ROW_NUMBER."""
    from ontoea_ray.functions.shuffle import with_partition_key

    HOUR = 3_600_000_000  # us

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    parted = with_partition_key(ev, ["user_id"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "slot_us": pa.array([], pa.int64()),
            "value_cents": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
    )

    def fill(df: pd.DataFrame) -> pa.Table:
        # empty-frame guard BEFORE the segment loop: the loop's zip would
        # otherwise produce one (0, 0) segment and dereference t[0]
        if df.empty:
            return _empty
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts_us = df["ts"].astype("int64").to_numpy()
        cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        uids, slots, vals, cnts = [], [], [], []
        uvals = df["user_id"].to_numpy(np.int64)
        bounds = np.flatnonzero(np.diff(uvals)) + 1
        for lo, hi in zip(
            np.concatenate([[0], bounds]), np.concatenate([bounds, [len(df)]])
        ):
            t = ts_us[lo:hi]
            grid = np.arange(t[0] - t[0] % HOUR, t[-1] - t[-1] % HOUR + 1, HOUR)
            # latest event with ts < slot+1h = rightmost index strictly
            # below the bound; sorted (ts, event_id) makes it the tie-winner
            idx = np.searchsorted(t, grid + HOUR, side="left") - 1
            vals.append(cents[lo:hi][idx])
            cnts.append(np.bincount((t - grid[0]) // HOUR, minlength=len(grid)).astype(np.int64))
            slots.append(grid)
            uids.append(np.full(len(grid), uvals[lo], np.int64))
        return pa.table(
            {
                "user_id": pa.array(np.concatenate(uids)),
                "slot_us": pa.array(np.concatenate(slots)),
                "value_cents": pa.array(np.concatenate(vals)),
                "n_events": pa.array(np.concatenate(cnts)),
            }
        )

    return parted.groupby("pkey").map_groups(fill, batch_format="pandas")


# ---------------------------------------------------------------------------
# tumbling OHLC bars (open/high/low/close per event_type per hour)
# ---------------------------------------------------------------------------

_OHLC_SQL = """
    WITH e AS (SELECT event_type,
                      CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS slot_us,
                      ts, event_id,
                      CAST(ROUND(value * 100) AS BIGINT) AS cents
               FROM events),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type, slot_us
                                    ORDER BY ts ASC, event_id ASC) AS rna,
                 ROW_NUMBER() OVER (PARTITION BY event_type, slot_us
                                    ORDER BY ts DESC, event_id DESC) AS rnd
          FROM e),
    agg AS (SELECT event_type, slot_us,
                   MAX(cents) AS high_cents, MIN(cents) AS low_cents,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cents) AS BIGINT) AS sum_cents
            FROM e GROUP BY 1, 2)
    SELECT a.event_type, a.slot_us,
           o.cents AS open_cents, c.cents AS close_cents,
           a.high_cents, a.low_cents, a.n, a.sum_cents
    FROM agg a
    JOIN r o ON o.event_type = a.event_type AND o.slot_us = a.slot_us AND o.rna = 1
    JOIN r c ON c.event_type = a.event_type AND c.slot_us = a.slot_us AND c.rnd = 1
"""


@_register("q_ohlc", _OHLC_SQL)
def q_ohlc(sf_dir: str):
    """Tumbling OHLC bars: per (event_type, hour) the opening value
    (first by ts, event_id), closing value (last), high, low, count and
    sum, all integer cents — the candlestick downsample a metrics store
    materializes from a raw event stream.

    Scale shape: combiner-first.  Each batch reduces to ONE row per
    (event_type, slot) carrying open/close candidates WITH their
    (ts, event_id) order keys plus the associative high/low/n/sum, so the
    single keyed exchange moves block x groups partials; the co-located
    merge resolves open (lexicographic-min key) and close (max) with two
    vectorized boundary takes, never re-reading raw events."""
    from ontoea_ray.functions.shuffle import with_partition_key

    HOUR = 3_600_000_000

    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        "event_type": pd.Series([], dtype=object),
                        "slot_us": pd.Series([], dtype=np.int64),
                        "open_ts": pd.Series([], dtype=np.int64),
                        "open_id": pd.Series([], dtype=np.int64),
                        "open_cents": pd.Series([], dtype=np.int64),
                        "close_ts": pd.Series([], dtype=np.int64),
                        "close_id": pd.Series([], dtype=np.int64),
                        "close_cents": pd.Series([], dtype=np.int64),
                        "high_cents": pd.Series([], dtype=np.int64),
                        "low_cents": pd.Series([], dtype=np.int64),
                        "n": pd.Series([], dtype=np.int64),
                        "sum_cents": pd.Series([], dtype=np.int64),
                    }
                )
            )
        ts_us = df["ts"].astype("int64")
        d = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "slot_us": (ts_us - ts_us % HOUR).astype(np.int64),
                "ts": ts_us.astype(np.int64),
                "event_id": df["event_id"].astype(np.int64),
                "cents": np.round(df["value"].to_numpy() * 100).astype(np.int64),
            }
        ).sort_values(["event_type", "slot_us", "ts", "event_id"], kind="mergesort")
        g = d.groupby(["event_type", "slot_us"], sort=False)
        out = g.agg(
            open_ts=("ts", "first"),
            open_id=("event_id", "first"),
            open_cents=("cents", "first"),
            close_ts=("ts", "last"),
            close_id=("event_id", "last"),
            close_cents=("cents", "last"),
            high_cents=("cents", "max"),
            low_cents=("cents", "min"),
            n=("cents", "size"),
            sum_cents=("cents", "sum"),
        ).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return _from_pandas_clean(out)

    parts = ev.map_batches(partial, batch_format="pandas")
    parted = with_partition_key(parts, ["event_type", "slot_us"])

    def merge(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            cols = [
                "event_type", "slot_us", "open_cents", "close_cents",
                "high_cents", "low_cents", "n", "sum_cents",
            ]
            return _from_pandas_clean(
                pd.DataFrame({c: pd.Series([], dtype=object if c == "event_type" else np.int64) for c in cols})
            )
        keys = ["event_type", "slot_us"]
        a = df.sort_values(keys + ["open_ts", "open_id"], kind="mergesort")
        opens = a.groupby(keys, sort=False)[["open_cents"]].first()
        b = df.sort_values(keys + ["close_ts", "close_id"], kind="mergesort")
        closes = b.groupby(keys, sort=False)[["close_cents"]].last()
        g = df.groupby(keys, sort=False).agg(
            high_cents=("high_cents", "max"),
            low_cents=("low_cents", "min"),
            n=("n", "sum"),
            sum_cents=("sum_cents", "sum"),
        )
        out = opens.join([closes, g]).reset_index()
        for c in out.columns[2:]:
            out[c] = out[c].astype(np.int64)
        return _from_pandas_clean(out)

    return parted.groupby("pkey").map_groups(merge, batch_format="pandas")
# top session paths (clickstream sequence mining over 30-min sessions)
# ---------------------------------------------------------------------------

_SESSION_PATHS_TOP = 10

_SESSION_PATHS_SQL = f"""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    ), p AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, session_id
    ), c AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions FROM p GROUP BY path
    )
    SELECT path, n_sessions,
           CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS BIGINT) AS rank
    FROM c
    QUALIFY rank <= {_SESSION_PATHS_TOP}
"""


@_register("q_session_paths", _SESSION_PATHS_SQL)
def q_session_paths(sf_dir: str):
    """Top session paths: each 30-min-gap session's ordered event-type
    sequence becomes a path string (click>view>purchase), counted across
    all sessions, top-{_SESSION_PATHS_TOP} out — the clickstream
    sequence-mining primitive behind funnel discovery (q_funnel checks a
    GIVEN sequence; this surfaces which sequences dominate).

    Scale shape: ONE user-keyed co-location does everything row-local —
    per-partition vectorized sessionization (the q_sessionize break
    chain), then path assembly as a per-session string join (the one
    inherently string-typed group op) — and path counts collapse
    combiner-first into a path-vocabulary exchange; the final top-K
    sorts the reduced path table only."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    GAP = 30 * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    parted = with_partition_key(ev, ["user_id"])

    def paths(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[True, (ts[1:] - ts[:-1]) > GAP]
        sess = np.cumsum(brk)
        g = (
            pd.DataFrame({"s": sess, "t": df["event_type"].to_numpy(object)})
            .groupby("s", sort=False)["t"]
            .agg(">".join)
        )
        out = (
            g.to_frame("path")
            .groupby("path", sort=False)
            .size()
            .reset_index(name="n_sessions")
        )
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return _from_pandas_clean(out)

    counts = keyed_aggregate(
        parted.groupby("pkey").map_groups(paths, batch_format="pandas"),
        ["path"],
        sums=["n_sessions"],
    )
    top = (
        counts.sort(["n_sessions", "path"], descending=[True, False])
        .limit(_SESSION_PATHS_TOP)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    top["n_sessions"] = top["n_sessions"].astype(np.int64)
    return ray.data.from_arrow(_from_pandas_clean(top))


# ---------------------------------------------------------------------------
