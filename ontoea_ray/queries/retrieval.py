"""Queries: retrieval (split from the former single-module registry)."""

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
from ontoea_ray.queries.flagship import _FLAGSHIP_SQL, _pagerank_sql
from ontoea_ray.queries.weblinks import _OUTLINK_EDGES_CTE


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
# reciprocal rank fusion over two lexical rankings (Cormack et al. 2009)
# ---------------------------------------------------------------------------

_RRF_K = 60          # the standard RRF damping constant
_RRF_DEPTH = 20      # fuse the top-20 of each ranking
_RRF_OUT = 10


def _tfsum_sql(terms=_BM25_TERMS, k: int = _RRF_DEPTH) -> str:
    tlist = ", ".join(f"'{t}'" for t in terms)
    return f"""
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score,
           CAST(ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, doc_id) AS BIGINT) AS rnk
    FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token, 1 AS c FROM documents)
    WHERE token IN ({tlist})
    GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT {k}
"""


def _rrf_sql() -> str:
    return f"""
    WITH bm AS ({_bm25_sql(k=_RRF_DEPTH)}),
    ts AS ({_tfsum_sql()}),
    u AS (SELECT doc_id, rnk FROM bm UNION ALL SELECT doc_id, rnk FROM ts),
    f AS (SELECT doc_id,
                 CAST(SUM(1000000 // ({_RRF_K} + rnk)) AS BIGINT) AS rrf_micro,
                 CAST(COUNT(*) AS BIGINT) AS n_lists
          FROM u GROUP BY doc_id)
    SELECT doc_id, rrf_micro, n_lists,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT) AS rnk
    FROM f ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_OUT}
"""


@_register("q_rank_fusion", _rrf_sql())
def q_rank_fusion(sf_dir: str):
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    the BM25 top-20 and a raw term-frequency top-20 for the same fixed
    query terms are fused by RRF(d) = Σ_lists 1/(60 + rank_d), in exact
    integer micro-units (floor(1e6/(60+r)) — no floats, so the oracle
    replays the fused ranking including ties).  RRF is the standard
    zero-tuning way to combine lexical + secondary rankings in a
    retrieval stack.

    Scale shape: both input rankings are already top-K reductions (BM25
    reads only the query terms' index buckets; the tf-sum ranking is one
    combiner-first per-doc sum over a vocabulary-filtered scan), so the
    fusion itself touches 2K rows — constant in the corpus."""
    import hashlib
    import os

    from ontoea_ray.functions.shuffle import keyed_aggregate
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
    bm = bm25_topk(index_dir, docs, list(_BM25_TERMS), k=_RRF_DEPTH).to_pandas()

    terms = pa.array(list(_BM25_TERMS), pa.string())

    def tf_part(b: pa.Table) -> pa.Table:
        from ontoea_ray.functions.text import tokenize

        toks = tokenize(b["text"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        dids = np.repeat(np.asarray(b["doc_id"].combine_chunks(), np.int64), lengths)
        hit = pc.is_in(toks.values, value_set=terms).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"doc_id": dids[hit]})
        g = df.groupby("doc_id", sort=False).size().reset_index(name="score")
        g["score"] = g["score"].astype(np.int64)
        return _from_pandas_clean(g)

    tfsum = (
        keyed_aggregate(
            docs.map_batches(tf_part, batch_format="pyarrow"),
            ["doc_id"],
            sums=["score"],
        )
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(_RRF_DEPTH)
        .to_pandas()
    )
    tfsum["rnk"] = np.arange(1, len(tfsum) + 1, dtype=np.int64)

    u = pd.concat(
        [bm[["doc_id", "rnk"]], tfsum[["doc_id", "rnk"]]], ignore_index=True
    )
    u["c"] = 1_000_000 // (_RRF_K + u["rnk"].to_numpy(np.int64))
    f = u.groupby("doc_id", sort=False).agg(
        rrf_micro=("c", "sum"), n_lists=("rnk", "size")
    ).reset_index()
    f = f.sort_values(["rrf_micro", "doc_id"], ascending=[False, True], kind="mergesort")
    f = f.head(_RRF_OUT).reset_index(drop=True)
    f["rnk"] = np.arange(1, len(f) + 1, dtype=np.int64)
    for c in ("doc_id", "rrf_micro", "n_lists", "rnk"):
        f[c] = f[c].astype(np.int64)
    return ray.data.from_arrow(_from_pandas_clean(f))


# inverted-index compression cost model (delta gaps + Elias gamma)
# ---------------------------------------------------------------------------

_POSTINGS_COST_SQL = """
    WITH p AS (SELECT DISTINCT token, doc_id
               FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token
                     FROM documents)),
    g AS (SELECT token,
                 COALESCE(doc_id - LAG(doc_id) OVER (PARTITION BY token
                                                     ORDER BY doc_id),
                          doc_id + 1) AS gap
          FROM p),
    b AS (SELECT token,
                 CAST(2 * (length(bin(CAST(gap AS BIGINT))) - 1) + 1 AS BIGINT) AS bits
          FROM g)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(bits) AS BIGINT) AS total_bits,
           CAST(SUM(bits) * 1000 // COUNT(*) AS BIGINT) AS bits_per_posting_milli
    FROM b GROUP BY token
"""


@_register("q_postings_cost", _POSTINGS_COST_SQL)
def q_postings_cost(sf_dir: str):
    """Inverted-index compression cost model: each token's posting list
    (sorted distinct doc ids) is delta-gap encoded (first id stored as
    id+1) and costed under Elias gamma — bits(g) = 2*floor(log2 g)+1 —
    yielding per-token df, total bits and milli bits-per-posting; the
    size model an index builder uses to pick codecs and to spot
    high-churn terms (dense lists compress toward 1 bit/posting, sparse
    hub terms stay expensive).

    Scale shape: in-block (token, doc) dedupe partials, then ONE
    token-keyed exchange; inside each partition the gap chain is a
    vectorized diff over the token-sorted run and the bit cost uses the
    float-free bit_length64 kernel (np.log2 is unsafe past 2^53).  Output
    is vocabulary-sized, like q_term_freq."""
    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.stages.sketch import bit_length64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        dids = np.repeat(np.asarray(b["doc_id"].combine_chunks(), np.int64), lengths)
        df = pd.DataFrame(
            {"token": np.asarray(toks.values, object), "doc_id": dids}
        ).drop_duplicates()
        return _from_pandas_clean(df)

    parted = with_partition_key(
        docs.map_batches(explode, batch_format="pyarrow"), ["token"]
    )

    def cost(df: pd.DataFrame) -> pa.Table:
        df = df.drop_duplicates(["token", "doc_id"]).sort_values(
            ["token", "doc_id"], kind="mergesort"
        )
        tok = df["token"].to_numpy(object)
        did = df["doc_id"].to_numpy(np.int64)
        n = len(df)
        if n == 0:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        "token": pd.Series([], dtype=object),
                        "df": pd.Series([], dtype=np.int64),
                        "total_bits": pd.Series([], dtype=np.int64),
                        "bits_per_posting_milli": pd.Series([], dtype=np.int64),
                    }
                )
            )
        first = np.r_[True, tok[1:] != tok[:-1]]
        gap = np.empty(n, np.int64)
        gap[first] = did[first] + 1
        gap[~first] = (did[1:] - did[:-1])[~first[1:]]
        bits = 2 * (bit_length64(gap.astype(np.uint64)).astype(np.int64) - 1) + 1
        g = (
            pd.DataFrame({"token": tok, "bits": bits})
            .groupby("token", sort=False)["bits"]
            .agg(df="size", total_bits="sum")
            .reset_index()
        )
        g["df"] = g["df"].astype(np.int64)
        g["total_bits"] = g["total_bits"].astype(np.int64)
        g["bits_per_posting_milli"] = g["total_bits"] * 1000 // g["df"]
        return _from_pandas_clean(g)

    return parted.groupby("pkey").map_groups(cost, batch_format="pandas")


# greedy max-coverage document selection (submodular greedy)
# ---------------------------------------------------------------------------

_COVER_K = 10


def _greedy_cover_sql(k: int = _COVER_K) -> str:
    # every cov/pick CTE is MATERIALIZED: cov{r} feeds both the round's
    # anti-join and cov{r+1}, so inlining would expand the chain into a
    # 2^k-node tree (measured: the un-materialized form never finishes)
    ctes = [
        "toks AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents)",
        """t AS MATERIALIZED (SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(tk) >= 3
                    THEN [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                          FOR i IN range(1, len(tk) - 1)]
                    ELSE [array_to_string(tk, ' ')] END) AS token
           FROM toks)""",
        "d AS MATERIALIZED (SELECT DISTINCT doc_id FROM t)",
        "cov0(token) AS MATERIALIZED (SELECT token FROM t WHERE 1 = 0)",
    ]
    for r in range(k):
        ctes.append(
            f"""g{r} AS (SELECT t.doc_id, COUNT(*) AS gain
             FROM t ANTI JOIN cov{r} c ON t.token = c.token
             GROUP BY t.doc_id)"""
        )
        ctes.append(
            f"""pick{r} AS MATERIALIZED (
             SELECT d.doc_id, COALESCE(g.gain, 0) AS gain
             FROM d LEFT JOIN g{r} g USING (doc_id)
             ORDER BY gain DESC, doc_id ASC LIMIT 1)"""
        )
        ctes.append(
            f"""cov{r + 1}(token) AS MATERIALIZED (SELECT token FROM cov{r}
             UNION SELECT t.token FROM t JOIN pick{r} p ON t.doc_id = p.doc_id)"""
        )
    picks = " UNION ALL ".join(
        f"SELECT {r + 1} AS rank, doc_id, gain, "
        f"(SELECT COUNT(*) FROM cov{r + 1}) AS covered_after FROM pick{r}"
        for r in range(k)
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT CAST(rank AS BIGINT) AS rank, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(gain AS BIGINT) AS gain,
           CAST(covered_after AS BIGINT) AS covered_after
    FROM ({picks})
"""


@_register("q_greedy_cover", _greedy_cover_sql())
def q_greedy_cover(sf_dir: str):
    """Greedy max-coverage document selection (the classic submodular
    greedy, Nemhauser-Wolsey-Fisher 1978): pick K documents one at a
    time, each maximizing the count of 3-gram SHINGLES not yet covered
    (ties to the smaller doc_id; shingles, not unigrams — the 31-token
    synthetic unigram vocabulary would make one pick cover everything) —
    the coverage-based subset-selection primitive behind corpus
    summarization and diversity-first training-data curation, with the
    (1 - 1/e) guarantee.  Output: pick rank, doc id, marginal gain,
    cumulative covered-universe size.

    Scale shape: K distributed rounds.  The covered set lives in the
    object store (vocabulary-bounded; ships once per round via ray.put)
    and each round is ONE shuffle-free map_batches pass emitting per-doc
    uncovered counts (pc.is_in against the broadcast set) reduced by a
    tiny (doc, gain) top-1 — the only driver state is K (doc_id, gain)
    scalars and the pick's own token list, never the corpus.  The
    unrolled oracle replays every pick and tie-break."""
    from ontoea_ray.functions.text import tokenize

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_part(b: pa.Table) -> pa.Table:
        from ontoea_ray.stages.dedup import shingle_strings

        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        df = shingle_strings(b["text"], ids, 3).rename(
            columns={"id": "doc_id", "shingle": "token"}
        )
        return _from_pandas_clean(df)

    t = docs.map_batches(tok_part, batch_format="pyarrow").materialize()

    covered_ref = ray.put(pa.array([], pa.string()))
    n_covered = 0
    rows = []
    for r in range(_COVER_K):
        def gains(b: pa.Table, _ref=covered_ref) -> pa.Table:
            cov = ray.get(_ref)
            new = pc.invert(pc.is_in(b["token"].combine_chunks(), value_set=cov))
            df = pd.DataFrame(
                {
                    "doc_id": np.asarray(b["doc_id"].combine_chunks(), np.int64),
                    "gain": new.to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            g = df.groupby("doc_id", sort=False)["gain"].sum().reset_index()
            return _from_pandas_clean(g)

        from ontoea_ray.functions.shuffle import keyed_aggregate

        per_doc = keyed_aggregate(
            t.map_batches(gains, batch_format="pyarrow"), ["doc_id"], sums=["gain"]
        )
        best = per_doc.sort(["gain", "doc_id"], descending=[True, False]).limit(1).take_all()[0]
        pick, gain = int(best["doc_id"]), int(best["gain"])

        @ray.remote
        def _extend(cov: pa.Array, picked: pa.Table) -> pa.Array:
            merged = pc.unique(
                pa.chunked_array([cov, picked["token"].combine_chunks()])
            )
            return merged.combine_chunks() if isinstance(merged, pa.ChunkedArray) else merged

        # task-side set extension: the pick's tokens are extracted by a
        # DISTRIBUTED filter (doc-bounded result), so the one extension
        # task only ever sees the covered set + one document — never the
        # corpus-sized shingle table; the covered vocabulary never touches
        # the driver and the ref auto-dereferences into the next round
        from ontoea_ray.functions.broadcast import assemble_table_ref

        _, picked_ref = assemble_table_ref(
            t.filter(expr=f"doc_id == {pick}"), columns=["token"], budget=1 << 62
        )
        covered_ref = _extend.remote(covered_ref, picked_ref)
        n_covered += gain
        rows.append({"rank": r + 1, "doc_id": pick, "gain": gain, "covered_after": n_covered})

    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_arrow(_from_pandas_clean(out))
