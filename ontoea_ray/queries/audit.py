"""Queries: audit (split from the former single-module registry)."""

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
from ontoea_ray.queries.dedup import _SHINGLE_SQL, lsh_neardup_sql, minhash_lsh_candidates_sql, splitmix64_ctes
from ontoea_ray.queries.flagship import _FLAGSHIP_SQL
from ontoea_ray.queries.graph import _COPURCHASE_E_CTE, _copurchase_cached


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
    consumer filters on — and the temporal complement of q_kg_diff's
    between-snapshot view.  Implementation:
    `pipelines/kg_construct.construct_kg_lifespan` (the flagship chain
    with a lifespan-aware combiner inside the scan actors; see its
    docstring for the scale shape).  The oracle is the flagship CTE chain
    with min/max doc-id extraction added to the final reduction."""
    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_cached,
        construct_kg_lifespan,
    )
    from ontoea_ray.sources.pages import pages_from_documents

    return construct_kg_lifespan(
        pages_from_documents(sf_dir), bootstrap_linker_cached(sf_dir)
    )


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


# predicate schema induction: domain/range classes per predicate
# ---------------------------------------------------------------------------

def _pred_domain_range_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h, splitmix64_ctes
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.state.ontology import THING

    n_cls = len([c for c in bootstrap_ontology().classes() if c != THING])
    return f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    s0 AS (SELECT DISTINCT subj AS e FROM kg),
    {splitmix64_ctes("s0", _h("e"), sfx="_s")},
    scls AS (SELECT e, CAST(_h % {n_cls} AS BIGINT) AS cls FROM sm3_s),
    o0 AS (SELECT DISTINCT obj AS e FROM kg),
    {splitmix64_ctes("o0", _h("e"), sfx="_o")},
    ocls AS (SELECT e, CAST(_h % {n_cls} AS BIGINT) AS cls FROM sm3_o),
    v AS (
      SELECT kg.pred, 0 AS side, scls.cls, SUM(kg.n_mentions) AS votes
      FROM kg JOIN scls ON scls.e = kg.subj GROUP BY 1, 3
      UNION ALL
      SELECT kg.pred, 1 AS side, ocls.cls, SUM(kg.n_mentions) AS votes
      FROM kg JOIN ocls ON ocls.e = kg.obj GROUP BY 1, 3),
    t AS (SELECT pred, side, SUM(votes) AS total FROM v GROUP BY 1, 2),
    r AS (SELECT pred, side, cls, votes,
                 ROW_NUMBER() OVER (PARTITION BY pred, side
                                    ORDER BY votes DESC, cls ASC) AS rn
          FROM v),
    n AS (SELECT pred, COUNT(*) AS n_edges FROM kg GROUP BY 1)
    SELECT n.pred,
           CAST(d.cls AS BIGINT) AS dom_cls,
           CAST(d.votes * 1000 // td.total AS BIGINT) AS dom_conf_milli,
           CAST(g.cls AS BIGINT) AS rng_cls,
           CAST(g.votes * 1000 // tg.total AS BIGINT) AS rng_conf_milli,
           CAST(n.n_edges AS BIGINT) AS n_edges
    FROM n
    JOIN r d ON d.pred = n.pred AND d.side = 0 AND d.rn = 1
    JOIN t td ON td.pred = n.pred AND td.side = 0
    JOIN r g ON g.pred = n.pred AND g.side = 1 AND g.rn = 1
    JOIN t tg ON tg.pred = n.pred AND tg.side = 1
"""


@_register("q_pred_domain_range", _pred_domain_range_sql())
def q_pred_domain_range(sf_dir: str):
    """Predicate schema induction (rdfs:domain / rdfs:range mining): for
    every predicate of the flagship edge table, the evidence-weighted
    modal class of its SUBJECTS (the induced domain) and of its OBJECTS
    (the induced range), each with integer-milli support — the schema a
    KG consumer derives before writing SHACL shapes or validating new
    assertions, and the per-predicate aggregate of the same typing signal
    q_type_infer resolves per entity.  Classes reuse the engine's
    SQL-replayable md5+splitmix assignment; ties break to the smaller
    class id.

    Scale shape: class is a pure per-row hash (no class-map join, no
    entity-table broadcast); per-batch partials collapse (pred, side,
    cls) votes in-block so ONE keyed exchange carries |preds| x 2 x
    |classes| partials — constant in the corpus — and the final
    per-predicate argmax runs on a pred-keyed co-location of that tiny
    table.  n_edges rides the same partials (counted on the subject side
    only), so the corpus is read exactly once."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.state.ontology import THING

    n_cls = np.uint64(
        len([c for c in bootstrap_ontology().classes() if c != THING])
    )
    kg = _kg_cached(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        sc = (splitmix64(_token_hashes(b["subj"].combine_chunks(), backend="md5")) % n_cls).astype(np.int64)
        oc = (splitmix64(_token_hashes(b["obj"].combine_chunks(), backend="md5")) % n_cls).astype(np.int64)
        votes = np.asarray(b["n_mentions"].combine_chunks(), np.int64)
        pred = b["pred"].to_pandas()
        n = len(b)
        df = pd.DataFrame(
            {
                "pred": pd.concat([pred, pred], ignore_index=True),
                "side": np.repeat(np.array([0, 1], np.int64), n),
                "cls": np.concatenate([sc, oc]),
                "votes": np.concatenate([votes, votes]),
                "n": np.concatenate([np.ones(n, np.int64), np.zeros(n, np.int64)]),
            }
        )
        g = df.groupby(["pred", "side", "cls"], sort=False)[["votes", "n"]].sum().reset_index()
        return _from_pandas_clean(g)

    parts = kg.map_batches(partial, batch_format="pyarrow")
    agg = keyed_aggregate(parts, ["pred", "side", "cls"], sums=["votes", "n"])
    parted = with_partition_key(agg, ["pred"])

    def finalize(df: pd.DataFrame) -> pa.Table:
        out = []
        for pred, g in df.groupby("pred", sort=False):
            n_edges = int(g.loc[g["side"] == 0, "n"].sum())
            row = {"pred": pred, "n_edges": n_edges}
            for side, dom in ((0, "dom"), (1, "rng")):
                s = g[g["side"] == side].sort_values(
                    ["votes", "cls"], ascending=[False, True], kind="mergesort"
                )
                total = int(s["votes"].sum())
                row[f"{dom}_cls"] = int(s["cls"].iloc[0])
                row[f"{dom}_conf_milli"] = int(s["votes"].iloc[0]) * 1000 // total
            out.append(row)
        res = pd.DataFrame(
            out,
            columns=["pred", "dom_cls", "dom_conf_milli", "rng_cls", "rng_conf_milli", "n_edges"],
        )
        for c in res.columns[1:]:
            res[c] = res[c].astype(np.int64)
        return _from_pandas_clean(res)

    return parted.groupby("pkey").map_groups(finalize, batch_format="pandas")


# hierarchical evidence rollup over the bootstrap ontology tree
# ---------------------------------------------------------------------------

def _class_rollup_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h, splitmix64_ctes
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.state.ontology import THING

    onto = bootstrap_ontology()
    non_root = [c for c in onto.classes() if c != THING]
    idx = {c: i for i, c in enumerate(non_root)}
    anc_rows = ", ".join(
        f"({idx[c]}, {idx[a]})"
        for c in non_root
        for a in onto.path(c)
        if a != THING
    )
    meta_rows = ", ".join(
        f"({idx[c]}, '{c}', {len(onto.path(c)) - 1})" for c in non_root
    )
    n = len(non_root)
    return f"""
    WITH kg AS ({_FLAGSHIP_SQL}),
    s0 AS (SELECT DISTINCT subj AS e FROM kg),
    {splitmix64_ctes("s0", _h("e"))},
    scls AS (SELECT e, CAST(_h % {n} AS BIGINT) AS cls FROM sm3),
    own AS (SELECT scls.cls, SUM(kg.n_mentions) AS own
            FROM kg JOIN scls ON scls.e = kg.subj GROUP BY 1),
    anc(cls, anc) AS (VALUES {anc_rows}),
    meta(cls, name, depth) AS (VALUES {meta_rows}),
    sub AS (SELECT anc.anc AS cls, SUM(own.own) AS subtree
            FROM anc JOIN own ON own.cls = anc.cls GROUP BY 1)
    SELECT CAST(m.cls AS BIGINT) AS cls, m.name AS class_name,
           CAST(m.depth AS BIGINT) AS depth,
           CAST(COALESCE(o.own, 0) AS BIGINT) AS own_mentions,
           CAST(COALESCE(s.subtree, 0) AS BIGINT) AS subtree_mentions
    FROM meta m LEFT JOIN own o ON o.cls = m.cls
                LEFT JOIN sub s ON s.cls = m.cls
"""


@_register("q_class_rollup", _class_rollup_sql())
def q_class_rollup(sf_dir: str):
    """Hierarchical evidence rollup over the bootstrap ontology TREE: each
    class's own mention evidence (subjects hashing to it, the audit's
    replayable md5+splitmix assignment) and its SUBTREE total (own + all
    descendants via the class's ancestor path) — the DAG-aware aggregate
    an ontology-guided pipeline reports (how much evidence lives under
    Organisation vs under its leaf classes), structurally different from
    the flat ROLLUP/CUBE reshapes: the hierarchy is the ontology, not a
    column lattice.

    Scale shape: per-class own evidence is ONE combiner-first keyed
    exchange of <= |classes| partials (class is a per-row hash — no join
    against an entity table); the ancestor expansion then runs on that
    CONSTANT-size table (|classes| x depth pairs, ontology-bounded, never
    corpus-bounded) — the one place a driver fold is legitimate.  The
    oracle inlines the same ancestor pairs as VALUES and replays every
    total."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.pipelines.kg_construct import bootstrap_ontology
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.state.ontology import THING

    onto = bootstrap_ontology()
    non_root = [c for c in onto.classes() if c != THING]
    idx = {c: i for i, c in enumerate(non_root)}
    n_cls = np.uint64(len(non_root))
    depth = np.array([len(onto.path(c)) - 1 for c in non_root], np.int64)

    kg = _kg_cached(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        h = splitmix64(_token_hashes(b["subj"].combine_chunks(), backend="md5"))
        cls = (h % n_cls).astype(np.int64)
        nm = np.asarray(b["n_mentions"].combine_chunks(), np.int64)
        own = np.bincount(cls, weights=nm, minlength=int(n_cls)).astype(np.int64)
        return pa.table(
            {
                "cls": pa.array(np.arange(int(n_cls), dtype=np.int64)),
                "own": pa.array(own),
            }
        )

    own_rows = keyed_aggregate(
        kg.map_batches(partial, batch_format="pyarrow"), ["cls"], sums=["own"]
    ).take_all()  # constant-size: one row per ontology class
    own = np.zeros(int(n_cls), np.int64)
    for r in own_rows:
        own[int(r["cls"])] = int(r["own"])
    subtree = np.zeros(int(n_cls), np.int64)
    for c in non_root:
        for a in onto.path(c):
            if a != THING:
                subtree[idx[a]] += own[idx[c]]
    out = pa.table(
        {
            "cls": pa.array(np.arange(int(n_cls), dtype=np.int64)),
            "class_name": pa.array(non_root, pa.string()),
            "depth": pa.array(depth),
            "own_mentions": pa.array(own),
            "subtree_mentions": pa.array(subtree),
        }
    )
    return ray.data.from_arrow(out)
