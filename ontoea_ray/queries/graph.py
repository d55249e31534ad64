"""Queries: graph (split from the former single-module registry)."""

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
from ontoea_ray.queries.dedup import splitmix64_ctes
from ontoea_ray.queries.flagship import _FLAGSHIP_SQL


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
# truncated Katz centrality over the flagship KG (integer recurrence)
# ---------------------------------------------------------------------------

_KATZ_ROUNDS = 4
_KATZ_ALPHA_MILLI = 150


def _katz_sql(rounds: int = _KATZ_ROUNDS, scale: int = 1000,
              alpha: int = _KATZ_ALPHA_MILLI) -> str:
    from ontoea_ray.queries.flagship import _FLAGSHIP_SQL

    ctes = [
        f"kg AS ({_FLAGSHIP_SQL})",
        "e AS (SELECT subj AS s, obj AS d FROM kg)",
        "nodes AS (SELECT DISTINCT n FROM (SELECT s AS n FROM e UNION SELECT d FROM e))",
        f"x0 AS (SELECT n, CAST({scale} AS HUGEINT) AS u FROM nodes)",
    ]
    for r in range(rounds):
        ctes.append(
            f"raw{r} AS (SELECT e.d AS n, SUM(x{r}.u) AS raw"
            f" FROM e JOIN x{r} ON x{r}.n = e.s GROUP BY 1)"
        )
        ctes.append(
            f"x{r + 1} AS (SELECT nodes.n,"
            f" CAST({scale} + ({alpha} * COALESCE(raw{r}.raw, 0)) // 1000 AS HUGEINT) AS u"
            f" FROM nodes LEFT JOIN raw{r} ON raw{r}.n = nodes.n)"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT n AS node, CAST(u AS BIGINT) AS katz_units FROM x{rounds}
"""


@_register("q_katz", _katz_sql())
def q_katz(sf_dir: str):
    """Truncated Katz centrality (Katz 1953) over the flagship KG edge
    graph: the α-damped count of walks ENDING at each entity, in exact
    integer units (x <- scale + α_milli·Σ_in x // 1000, 4 rounds) — the
    in-link prestige score complementing q_pagerank (random surfer) and
    q_hits (hub/authority) on the same engine; multi-predicate edges
    weight naturally.  Two value-equal plans via the broadcast budget
    (single-task scatter-add / per-round join + keyed sum), and the
    unrolled oracle replays every unit including the floor divisions."""
    from ontoea_ray.stages.graph import katz_rounds

    kg = _kg_cached(sf_dir)
    return katz_rounds(kg, src="subj", dst="obj", rounds=_KATZ_ROUNDS,
                       alpha_milli=_KATZ_ALPHA_MILLI)


# modularity of the label-propagation partition (Newman-Girvan Q)
# ---------------------------------------------------------------------------

def _modularity_sql() -> str:
    from ontoea_ray.queries.dedup import splitmix64_ctes

    return f"""
    WITH lab AS ({_communities_sql(4)}),
    {_COPURCHASE_E_CTE.replace(" e AS ", " eallm AS ").lstrip()},
    {splitmix64_ctes("eallm", "(a * 100000 + b)", sfx="_m")},
    e0m AS (SELECT a, b FROM sm3_m WHERE _h % 100 < 10),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM e0m),
    deg AS (SELECT n, COUNT(*) AS d
            FROM (SELECT a AS n FROM e0m UNION ALL SELECT b FROM e0m) GROUP BY 1),
    el AS (SELECT la.label AS ca, lb.label AS cb
           FROM e0m JOIN lab la ON la.node = e0m.a JOIN lab lb ON lb.node = e0m.b),
    ec AS (SELECT ca AS c, CAST(COUNT(*) AS HUGEINT) AS e FROM el WHERE ca = cb GROUP BY 1),
    dc AS (SELECT lab.label AS c, CAST(SUM(deg.d) AS HUGEINT) AS d
           FROM lab JOIN deg ON deg.n = lab.node GROUP BY 1),
    terms AS (SELECT dc.c, (4 * m.m * COALESCE(ec.e, 0) - dc.d * dc.d) AS t
              FROM dc LEFT JOIN ec ON ec.c = dc.c, m)
    SELECT CAST(m.m AS BIGINT) AS m,
           CAST((SELECT COUNT(*) FROM dc) AS BIGINT) AS n_communities,
           CAST((SELECT COALESCE(SUM(e), 0) FROM ec) AS BIGINT) AS intra_edges,
           CAST((1000000 * (SELECT SUM(t) FROM terms)) // (4 * m.m * m.m) AS BIGINT) AS q_micro
    FROM m
"""


@_register("q_modularity", _modularity_sql())
def q_modularity(sf_dir: str):
    """Newman-Girvan modularity Q of the label-propagation partition
    (q_communities' own 4-round labels on the same sampled co-purchase
    graph): Q = Σ_c [e_c/m − (d_c/2m)²] in exact integer micro-units via
    the common-denominator form Σ_c (4m·e_c − d_c²) · 10⁶ // 4m² — the
    partition-quality gate that catches a label-prop retune collapsing
    into one giant community (Q→0) before anyone ships cluster ids
    downstream.  Division mirrors SQL's truncate-toward-zero.

    Scale shape: labels come from the existing budget-switched
    labelprop_rounds; the edge table joins its two endpoint labels
    through the planner (broadcast under budget), intra-edge counts and
    community degree sums reduce combiner-first to a
    communities-count-sized table, and the final fold over that reduced
    table runs as Python-int arithmetic (4m·e_c products overflow int64
    at web scale) inside one Ray task — only the 1-row summary reaches
    the driver."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.communities import labelprop_rounds
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(10)))

    sampled = edges.map_batches(sample, batch_format="pyarrow").materialize()
    labels = labelprop_rounds(sampled, rounds=4, src="id_a", dst="id_b").map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "label": b["label"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    el = hash_join(
        hash_join(sampled, labels, on=["id_a"], right_on=["node"]),
        labels,
        on=["id_b"],
        right_on=["node"],
        rsuffix="_b",
    )

    def edge_part(b: pa.Table) -> pa.Table:
        ca = np.asarray(b["label"].combine_chunks(), np.int64)
        cb = np.asarray(b["label_b"].combine_chunks(), np.int64)
        intra = (ca == cb).astype(np.int64)
        # every edge adds 1 degree at each endpoint's community
        df = pd.DataFrame(
            {
                "c": np.concatenate([ca, cb]),
                "e": np.concatenate([intra, np.zeros(len(cb), np.int64)]),
                "d": np.ones(2 * len(ca), np.int64),
            }
        )
        g = df.groupby("c", sort=False)[["e", "d"]].sum().reset_index()
        return _from_pandas_clean(g)

    per_c = keyed_aggregate(
        el.map_batches(edge_part, batch_format="pyarrow"), ["c"], sums=["e", "d"]
    )
    m = int(sampled.count())
    # the per-community table is communities-count-sized; assemble it in a
    # task unconditionally (a community table past the broadcast budget
    # means the partition is near-discrete — the fold is still one task's
    # worth of integers, and nothing corpus-sized is involved)
    _, ref = assemble_table_ref(per_c)

    @ray.remote
    def _fold(tbl: pa.Table, m: int) -> pa.Table:
        e = [int(x) for x in tbl["e"].to_pylist()]
        d = [int(x) for x in tbl["d"].to_pylist()]
        num = 1_000_000 * sum(4 * m * ec - dc * dc for ec, dc in zip(e, d))
        den = 4 * m * m
        q = abs(num) // den if den else 0  # truncate toward zero, as SQL //
        if num < 0:
            q = -q
        return pa.table(
            {
                "m": pa.array([m], pa.int64()),
                "n_communities": pa.array([len(e)], pa.int64()),
                "intra_edges": pa.array([sum(e)], pa.int64()),
                "q_micro": pa.array([q], pa.int64()),
            }
        )

    if ref is None:  # beyond-budget: communities table itself is huge
        _, ref = assemble_table_ref(per_c, budget=1 << 62)
    return ray.data.from_arrow_refs([_fold.remote(ref, m)])


# greedy maximal matching (Israeli-Itai proposal rounds)
# ---------------------------------------------------------------------------

def _matching_sql(rounds: int = 4, *, pct: int = 7) -> str:
    """Unrolled R-round deterministic proposal matching over the
    splitmix64-sampled co-purchase graph: per round each alive node
    proposes to its alive neighbour with the smallest (priority, id) —
    priorities from a fresh splitmix chain (node * salt + round) —
    mutual proposals match, endpoints leave.  Round CTEs MATERIALIZED."""
    from ontoea_ray.functions.lsh_sql import TWO64
    from ontoea_ray.queries.dedup import splitmix64_ctes
    from ontoea_ray.stages.graph import _MATCH_SALT

    p = [
        "WITH",
        _COPURCHASE_E_CTE.replace(" e AS ", " eall0 AS "),
        ", eall AS MATERIALIZED (SELECT a, b FROM eall0),",
        splitmix64_ctes("eall", "(a * 100000 + b)"),
        f", e0 AS MATERIALIZED (SELECT a, b FROM sm3 WHERE _h % 100 < {pct})",
        ", s0 AS MATERIALIZED (SELECT a AS node FROM e0 UNION SELECT b AS node FROM e0)",
    ]
    for r in range(rounds):
        key = f"((CAST(node AS HUGEINT) * {_MATCH_SALT} + {r}) % {TWO64})"
        p.append(f", pr{r} AS (SELECT node FROM s{r}),")
        p.append(splitmix64_ctes(f"pr{r}", key, sfx=f"_x{r}"))
        p.append(
            f", d{r} AS (SELECT a AS x, b AS y FROM e{r}"
            f" UNION ALL SELECT b AS x, a AS y FROM e{r})"
        )
        p.append(
            f", prop{r} AS MATERIALIZED (SELECT x AS node, y AS nbr FROM ("
            f"SELECT d.x, d.y, ROW_NUMBER() OVER (PARTITION BY d.x"
            f" ORDER BY py._h ASC, d.y ASC) AS rn"
            f" FROM d{r} d JOIN sm3_x{r} py ON py.node = d.y) WHERE rn = 1)"
        )
        p.append(
            f", m{r} AS MATERIALIZED (SELECT pa.node AS a, pa.nbr AS b"
            f" FROM prop{r} pa JOIN prop{r} pb"
            f" ON pb.node = pa.nbr AND pb.nbr = pa.node"
            f" WHERE pa.node < pa.nbr)"
        )
        p.append(
            f", s{r + 1} AS MATERIALIZED (SELECT node FROM s{r} WHERE node NOT IN"
            f" (SELECT a FROM m{r} UNION ALL SELECT b FROM m{r}))"
        )
        p.append(
            f", e{r + 1} AS MATERIALIZED (SELECT a, b FROM e{r}"
            f" WHERE a IN (SELECT node FROM s{r + 1})"
            f" AND b IN (SELECT node FROM s{r + 1}))"
        )
    picks = " UNION ALL ".join(
        f"SELECT a, b, {r} AS round FROM m{r}" for r in range(rounds)
    )
    p.append(
        f" SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
        f" CAST(round AS BIGINT) AS round FROM ({picks})"
    )
    return "\n".join(p)


@_register("q_matching", _matching_sql(4))
def q_matching(sf_dir: str):
    """4-round deterministic greedy maximal matching (Israeli-Itai 1986
    proposal rounds, splitmix priorities) over the splitmix64-sampled
    (7%) co-purchase graph — the conflict-free PAIRING primitive next to
    q_mis's node selection and q_coloring's scheduling: mutually-
    proposing neighbours pair up and leave, so the output is a valid
    matching by construction and maximal once converged (1-to-1 entity
    pairing, co-ownership dedup).  `stages/graph.matching_rounds`:
    single-task two-pass vectorized argmin under the broadcast budget,
    directed-edge argmin co-location + proposal self-join + exact
    node/edge removals above it; the unrolled oracle replays every
    proposal, mutuality test and removal."""
    from ontoea_ray.stages.graph import matching_rounds
    from ontoea_ray.stages.sampling import splitmix64

    edges = _copurchase_cached(sf_dir)

    def sample(b: pa.Table) -> pa.Table:
        a = np.asarray(b["id_a"].combine_chunks(), np.int64)
        c = np.asarray(b["id_b"].combine_chunks(), np.int64)
        h = splitmix64((a * 100000 + c).astype(np.uint64))
        return b.filter(pa.array(h % np.uint64(100) < np.uint64(7)))

    sampled = edges.map_batches(sample, batch_format="pyarrow")
    return matching_rounds(sampled, rounds=4, src="id_a", dst="id_b")
