"""Queries: stats (split from the former single-module registry)."""

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
from ontoea_ray.queries.dedup import _DUP_CLUSTER_SQL, _SHINGLE_SQL, splitmix64_ctes
from ontoea_ray.queries.flagship import _FLAGSHIP_SQL


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

        # autoscaling (1, cluster-sized) — see the q_doc_popularity note
        both = pairs.map_batches(
            _Label, batch_format="pyarrow", concurrency=(1, default_pool_size(None))
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

# per-source token concentration (Gini impurity, integer-exact)
# ---------------------------------------------------------------------------

_GINI_SQL = """
    WITH t AS (SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents),
    c AS (SELECT source, tok, CAST(COUNT(*) AS HUGEINT) AS c FROM t GROUP BY 1, 2),
    s AS (SELECT source, SUM(c) AS total, SUM(c * c) AS ss FROM c GROUP BY 1)
    SELECT source,
           CAST(total AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(*) FROM c WHERE c.source = s.source) AS BIGINT) AS n_distinct,
           CAST(((total * total - ss) * 1000000) // (total * total) AS BIGINT) AS gini_ppm
    FROM s
"""


@_register("q_gini_source", _GINI_SQL)
def q_gini_source(sf_dir: str):
    """Per-source token concentration: Gini impurity of each source's
    token distribution in exact ppm (1 - Σ pᵢ², integer cross-multiplied
    — no float, no log, so the oracle is bit-exact unlike an entropy in
    floating point).  A low-impurity source is dominated by few tokens —
    the template/boilerplate-heavy feed a corpus curator down-weights;
    the same diversity signal q_ttr approximates per document, here per
    source over the whole corpus.

    Scale shape: (source, token) counts collapse in-block so ONE keyed
    exchange carries vocab x sources partials; the per-source fold then
    runs on a source-keyed co-location of that reduced table, with the
    squared-count sum taken over Python ints (counts at 100 TB square
    past int64; the reduced table is vocab-sized, so object-dtype there
    costs nothing corpus-proportional)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.text import tokenize

    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        src = np.repeat(np.asarray(b["source"].combine_chunks(), object), lengths)
        df = pd.DataFrame({"source": src, "tok": np.asarray(toks.values, object)})
        g = df.groupby(["source", "tok"], sort=False).size().reset_index(name="c")
        g["c"] = g["c"].astype(np.int64)
        return _from_pandas_clean(g)

    counts = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["source", "tok"],
        sums=["c"],
    )
    parted = with_partition_key(counts, ["source"])

    def fold(df: pd.DataFrame) -> pa.Table:
        rows = []
        for src, g in df.groupby("source", sort=False):
            cs = [int(x) for x in g["c"]]
            total = sum(cs)
            ss = sum(x * x for x in cs)
            rows.append(
                {
                    "source": src,
                    "n_tokens": total,
                    "n_distinct": len(cs),
                    "gini_ppm": ((total * total - ss) * 1_000_000) // (total * total),
                }
            )
        out = pd.DataFrame(rows, columns=["source", "n_tokens", "n_distinct", "gini_ppm"])
        for c in out.columns[1:]:
            out[c] = out[c].astype(np.int64)
        return _from_pandas_clean(out)

    return parted.groupby("pkey").map_groups(fold, batch_format="pandas")


# burst / trending-token detection across crawl slices
# ---------------------------------------------------------------------------

_BURST_MIN_TOTAL = 20
_BURST_TOP = 20

_BURST_SQL = f"""
    WITH tok AS (SELECT CAST(doc_id % 4 AS BIGINT) AS slice,
                        unnest(str_split(text, ' ')) AS token
                 FROM documents),
    c AS (SELECT token, slice, CAST(COUNT(*) AS HUGEINT) AS cnt
          FROM tok GROUP BY 1, 2),
    tt AS (SELECT token, SUM(cnt) AS token_total FROM c GROUP BY 1),
    st AS (SELECT slice, SUM(cnt) AS slice_total FROM c GROUP BY 1),
    ct AS (SELECT SUM(cnt) AS corpus_total FROM c),
    r AS (SELECT c.token, c.slice, CAST(c.cnt AS BIGINT) AS cnt,
                 CAST((c.cnt * ct.corpus_total * 1000)
                      // (tt.token_total * st.slice_total) AS BIGINT) AS ratio_milli
          FROM c JOIN tt USING (token) JOIN st USING (slice), ct
          WHERE tt.token_total >= {_BURST_MIN_TOTAL})
    SELECT token, slice, cnt, ratio_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY ratio_milli DESC, token ASC, slice ASC)
                AS BIGINT) AS rank
    FROM r
    QUALIFY rank <= {_BURST_TOP}
"""


@_register("q_burst_tokens", _BURST_SQL)
def q_burst_tokens(sf_dir: str):
    """Burst / trending-token detection across crawl slices (doc_id % 4 —
    the same slice convention as the incremental-ingest composites): each
    (token, slice) cell scores its observed count against the
    independence expectation token_total x slice_total / corpus_total, in
    exact integer milli (a lift/chi-square-numerator surrogate with no
    float or log), rare tokens (< {_BURST_MIN_TOTAL} total) filtered as
    noise, top-{_BURST_TOP} out — what a crawl-monitoring pipeline uses
    to spot topic surges between increments.

    Scale shape: (token, slice) counts collapse in-block into ONE keyed
    exchange of vocab x 4 partials; token totals, slice totals (4 rows)
    and the corpus scalar all derive from that reduced table, and the
    ratio is computed over Python ints in the vocabulary-sized fold
    (count x corpus_total squares past int64 at 100 TB).  The final
    top-K sorts the reduced table only."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        sl = np.repeat(
            np.asarray(b["doc_id"].combine_chunks(), np.int64) % 4, lengths
        )
        df = pd.DataFrame({"token": np.asarray(toks.values, object), "slice": sl})
        g = df.groupby(["token", "slice"], sort=False).size().reset_index(name="cnt")
        g["cnt"] = g["cnt"].astype(np.int64)
        return _from_pandas_clean(g)

    from ontoea_ray.functions.join import hash_join

    c = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token", "slice"],
        sums=["cnt"],
    ).materialize()

    # token totals: a second vocabulary-sized reduction over the SAME
    # reduced table (never the corpus); slice totals are 4 rows and the
    # corpus total one scalar — constant driver state
    tt = keyed_aggregate(
        c.map_batches(
            lambda b: pa.table(
                {"token": b["token"], "token_total": b["cnt"]}
            ),
            batch_format="pyarrow",
        ),
        ["token"],
        sums=["token_total"],
    ).materialize()
    st = {
        int(r["slice"]): int(r["cnt"])
        for r in keyed_aggregate(
            c.select_columns(["slice", "cnt"]), ["slice"], sums=["cnt"]
        ).take_all()
    }
    corpus_total = sum(st.values())

    joined = hash_join(c, tt, on=["token"]).filter(
        expr=f"token_total >= {_BURST_MIN_TOTAL}"
    )

    def ratio(b: pa.Table) -> pa.Table:
        # Python-int arithmetic: cnt x corpus_total squares past int64 at
        # 100 TB; this runs over the (vocabulary-sized) reduced table only
        cnt = b["cnt"].to_pylist()
        ttl = b["token_total"].to_pylist()
        sl = b["slice"].to_pylist()
        r = np.array(
            [
                (cv * corpus_total * 1000) // (tv * st[sv])
                for cv, tv, sv in zip(cnt, ttl, sl)
            ],
            np.int64,
        )
        return pa.table(
            {
                "token": b["token"],
                "slice": b["slice"],
                "cnt": b["cnt"],
                "ratio_milli": pa.array(r),
            }
        )

    top = (
        joined.map_batches(ratio, batch_format="pyarrow")
        .sort(["ratio_milli", "token", "slice"], descending=[True, False, False])
        .limit(_BURST_TOP)
        .to_pandas()
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    for col in ("slice", "cnt", "ratio_milli"):
        top[col] = top[col].astype(np.int64)
    return ray.data.from_arrow(_from_pandas_clean(top))


# vocabulary growth curve (Heaps' law deciles via first appearance)
# ---------------------------------------------------------------------------

_VOCAB_GROWTH_SQL = """
    WITH bounds AS (SELECT MAX(doc_id) + 1 AS n FROM documents),
    fs AS (SELECT token, MIN(doc_id) AS first_seen
           FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
           GROUP BY token),
    dec AS (SELECT unnest(range(1, 11)) AS decile),
    v AS (SELECT d.decile,
                 CAST((SELECT n FROM bounds) * d.decile // 10 AS BIGINT) AS n_docs,
                 CAST(COUNT(*) FILTER (
                     WHERE fs.first_seen < (SELECT n FROM bounds) * d.decile // 10
                 ) AS BIGINT) AS vocab_size
          FROM dec d, fs GROUP BY d.decile)
    SELECT decile, n_docs, vocab_size,
           CAST(vocab_size - COALESCE(LAG(vocab_size) OVER (ORDER BY decile), 0)
                AS BIGINT) AS new_tokens
    FROM v
"""


@_register("q_vocab_growth", _VOCAB_GROWTH_SQL)
def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (Heaps' law diagnostic): distinct-token
    count after each successive tenth of the corpus in doc-id order, plus
    the per-decile novel-token increment — the saturation curve a corpus
    curator reads to judge how much new vocabulary (entities, typos,
    spam) additional crawl volume still buys.

    Scale shape: the curve needs no per-decile rescan — a token enters
    the vocabulary at its FIRST appearance, so one combiner-first min
    reduction (token -> min doc_id) plus a 10-bucket histogram over that
    vocabulary-sized table answers all deciles; the histogram partials
    are 10 integers per block and the only driver state is the 10-row
    curve."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    mx = docs.max("doc_id")
    n_docs_total = (int(mx) if mx is not None else -1) + 1
    cuts = np.array([n_docs_total * d // 10 for d in range(1, 11)], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        dids = np.repeat(np.asarray(b["doc_id"].combine_chunks(), np.int64), lengths)
        df = pd.DataFrame({"token": np.asarray(toks.values, object), "first_seen": dids})
        g = df.groupby("token", sort=False)["first_seen"].min().reset_index()
        return _from_pandas_clean(g)

    fs = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token"],
        mins=["first_seen"],
    )

    def hist(b: pa.Table) -> pa.Table:
        f = np.asarray(b["first_seen"].combine_chunks(), np.int64)
        # counts of first appearances below each cut: 10 partial integers
        counts = (f[None, :] < cuts[:, None]).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "decile": pa.array(np.arange(1, 11, dtype=np.int64)),
                "vocab_size": pa.array(counts),
            }
        )

    curve = keyed_aggregate(
        fs.map_batches(hist, batch_format="pyarrow"), ["decile"], sums=["vocab_size"]
    ).to_pandas().sort_values("decile").reset_index(drop=True)
    curve["n_docs"] = cuts
    curve["new_tokens"] = curve["vocab_size"].diff().fillna(curve["vocab_size"].iloc[0] if len(curve) else 0).astype(np.int64)
    curve["vocab_size"] = curve["vocab_size"].astype(np.int64)
    out = curve[["decile", "n_docs", "vocab_size", "new_tokens"]]
    return ray.data.from_arrow(_from_pandas_clean(out))


# Benford first-digit audit of order totals
# ---------------------------------------------------------------------------

_BENFORD_MILLI = {d: int(__import__("math").log10(1 + 1 / d) * 1000) for d in range(1, 10)}

_BENFORD_SQL = f"""
    WITH c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
               WHERE o_totalprice > 0),
    d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),
    n AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT SUM(n) AS total FROM n),
    b(digit, benford_milli) AS (VALUES {", ".join(f"({d}, {m})" for d, m in _BENFORD_MILLI.items())})
    SELECT CAST(b.digit AS BIGINT) AS digit, CAST(COALESCE(n.n, 0) AS BIGINT) AS n,
           CAST(COALESCE(n.n, 0) * 1000 // t.total AS BIGINT) AS pct_milli,
           CAST(b.benford_milli AS BIGINT) AS benford_milli
    FROM b LEFT JOIN n USING (digit), t
"""


@_register("q_benford", _BENFORD_SQL)
def q_benford(sf_dir: str):
    """Benford first-digit audit of order totals (Newcomb 1881 / Benford
    1938; Nigrini's fraud-audit standard): observed first-significant-
    digit frequencies of o_totalprice cents against the log10(1+1/d)
    expectation (inlined as integer milli constants, so no float ever
    crosses the oracle) — the data-quality screen an ingest pipeline
    runs to flag fabricated or truncated numeric feeds.  Digits extract
    from the cents' decimal string (exact), counts reduce combiner-first
    to 9 partials, and the 9-row audit is the only driver state."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        raw = b["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
        # filter on the RAW value like the oracle's WHERE o_totalprice > 0 —
        # a price in (0, 0.005) rounds to 0 cents but must still count in the
        # denominator, and its digit string is "0" handled below
        raw = raw[raw > 0]
        cents = np.round(raw * 100).astype(np.int64)
        digit = cents.copy()
        while (digit >= 10).any():
            digit[digit >= 10] //= 10
        g = pd.DataFrame({"digit": digit}).groupby("digit", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    counts = {
        int(r["digit"]): int(r["n"])
        for r in keyed_aggregate(
            orders.map_batches(partial, batch_format="pyarrow"), ["digit"], sums=["n"]
        ).take_all()
    }  # 9-row audit: constant driver state
    total = sum(counts.values())
    out = pd.DataFrame(
        {
            "digit": np.arange(1, 10, dtype=np.int64),
            "n": np.array([counts.get(d, 0) for d in range(1, 10)], np.int64),
        }
    )
    out["pct_milli"] = (out["n"] * 1000 // max(total, 1)).astype(np.int64)
    out["benford_milli"] = np.array(
        [_BENFORD_MILLI[d] for d in range(1, 10)], np.int64
    )
    return ray.data.from_arrow(_from_pandas_clean(out))


# lag-1 autocorrelation moments of the daily revenue series per event type
# ---------------------------------------------------------------------------

_AUTOCORR_SQL = """
    WITH daily AS (SELECT event_type,
                          CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS day,
                          CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev
                   FROM events GROUP BY 1, 2),
    lagged AS (SELECT event_type, day, rev,
                      LAG(rev) OVER (PARTITION BY event_type ORDER BY day) AS prev,
                      LAG(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day
               FROM daily),
    p AS (SELECT event_type, rev AS y, prev AS x FROM lagged
          WHERE prev IS NOT NULL AND day = prev_day + 1)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
           CAST(SUM(x * x) AS BIGINT) AS s_xx, CAST(SUM(y * y) AS BIGINT) AS s_yy,
           CAST(SUM(x * y) AS BIGINT) AS s_xy
    FROM p GROUP BY event_type
"""


@_register("q_autocorr", _AUTOCORR_SQL)
def q_autocorr(sf_dir: str):
    """Lag-1 autocorrelation moment sums of each event type's daily
    revenue series (consecutive-day pairs only — a gap breaks the lag):
    the six integer moments from which the Pearson lag-1 coefficient
    follows exactly, the persistence-vs-noise diagnostic a forecaster
    reads before fitting anything (the time-series sibling of
    q_assortativity's degree moments, and exact-oracle-friendly for the
    same reason: BIGINT moments, no float).

    Scale shape: per-(type, day) revenue collapses combiner-first into
    one keyed exchange (days x types partials); the lag pairing is a
    per-type co-located vectorized shift, and the moment reduction is a
    second constant-width (|types|) exchange."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    DAY = 86_400_000_000
    ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = np.round(
            b["value"].combine_chunks().to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": b["event_type"].to_pandas(), "day": ts // DAY, "rev": cents}
        )
        g = df.groupby(["event_type", "day"], sort=False)["rev"].sum().reset_index()
        g["rev"] = g["rev"].astype(np.int64)
        return _from_pandas_clean(g)

    daily = keyed_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"],
        sums=["rev"],
    )
    parted = with_partition_key(daily, ["event_type"])

    def moments(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["event_type", "day"], kind="mergesort")
        et = df["event_type"].to_numpy(object)
        day = df["day"].to_numpy(np.int64)
        rev = df["rev"].to_numpy(np.int64)
        same = np.r_[False, (et[1:] == et[:-1]) & (day[1:] == day[:-1] + 1)]
        x, y, e = rev[np.r_[same[1:], False]], rev[same], et[same]
        g = pd.DataFrame(
            {
                "event_type": e, "n_pairs": 1,
                "s_x": x, "s_y": y, "s_xx": x * x, "s_yy": y * y, "s_xy": x * y,
            }
        ).groupby("event_type", sort=False).sum().reset_index()
        for c in g.columns[1:]:
            g[c] = g[c].astype(np.int64)
        return _from_pandas_clean(g)

    return parted.groupby("pkey").map_groups(moments, batch_format="pandas")
