"""Queries: profiling (split from the former single-module registry)."""

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
