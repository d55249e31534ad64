"""Queries: weblinks (split from the former single-module registry)."""

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
from ontoea_ray.queries.graph import _COPURCHASE_E_CTE, _copurchase_cached


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
# redirect-chain resolution (list ranking by pointer doubling)
# ---------------------------------------------------------------------------

def _redirect_sql() -> str:
    from ontoea_ray.queries.dedup import splitmix64_ctes

    return f"""
WITH RECURSIVE docs AS (SELECT doc_id FROM documents),
{splitmix64_ctes("docs", "doc_id")},
red AS (SELECT doc_id,
               CASE WHEN doc_id > 0 AND _h % 3 <> 0 THEN doc_id // 2
                    ELSE doc_id END AS nxt
        FROM sm3),
chain(doc_id, cur, hops) AS (
  SELECT doc_id, doc_id, 0 FROM red
  UNION ALL
  SELECT c.doc_id, r.nxt, c.hops + 1
  FROM chain c JOIN red r ON r.doc_id = c.cur
  WHERE r.nxt <> c.cur
)
SELECT doc_id,
       CAST(arg_max(cur, hops) AS BIGINT) AS final_doc,
       CAST(MAX(hops) AS BIGINT) AS n_hops
FROM chain GROUP BY doc_id
"""


@_register("q_redirect_chains", _redirect_sql())
def q_redirect_chains(sf_dir: str):
    """Redirect-chain resolution: every crawled page resolves to its final
    destination and hop count — the canonical-URL step a crawler runs
    before dedup/link analysis (3xx chains, URL moves).  Redirects are
    deterministic so the oracle replays them: page d redirects to d//2
    iff d > 0 and splitmix64(d) % 3 != 0 (chains halve toward 0, length
    <= log2(max_id); every target exists — the assumption the chain
    join relies on).

    Scale shape: classic LIST RANKING, budget-switched like q_mst.  Under
    ONTOEA_BROADCAST_BUDGET_BYTES the (node -> next, hops) mapping is
    assembled INSIDE a Ray task (never on the driver) and resolved there
    with vectorized numpy pointer doubling (j <- j[j], microseconds per
    round).  Above budget the mapping is corpus-sized, so the resolution
    runs ceil(log2 L) keyed self-join exchanges (ptr <- ptr[ptr], hops <-
    hops + hops[ptr]) — 6 rounds for L ~ 40 chains at 100 TB; terminal
    pages are their own fixpoint and the only driver state is the round
    count (one max() scalar).  Budget-forced plan equality is pinned in
    tests/test_new_ops.py."""
    import math

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.stages.sampling import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id"])

    def init(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64))
        redirects = (ids > 0) & (h % np.uint64(3) != 0)
        ptr = np.where(redirects, ids // 2, ids)
        hops = redirects.astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "final_doc": pa.array(ptr),
                "n_hops": pa.array(hops),
            }
        )

    m, ref = assemble_table_ref(compact(docs.map_batches(init, batch_format="pyarrow")))
    if ref is not None:
        # single-task vectorized plan: j is each row's index of its pointer
        # row; doubling j <- j[j] squares the covered hop distance per round
        @ray.remote
        def _resolve(tbl: pa.Table) -> pa.Table:
            node = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.argsort(node, kind="stable")
            node_s = node[order]
            ptr = tbl["final_doc"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            hops = tbl["n_hops"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
            j = np.searchsorted(node_s, ptr)
            while not np.array_equal(j[j], j):
                hops = hops + hops[j]
                j = j[j]
            return pa.table(
                {
                    "doc_id": pa.array(node_s),
                    "final_doc": pa.array(node_s[j]),
                    "n_hops": pa.array(hops),
                }
            )

        return ray.data.from_arrow_refs([_resolve.remote(ref)])

    max_doc = int(m.max("doc_id") or 0)
    # longest chain = halvings from max_doc to 0; doubling rounds = log2 of it
    chain_max = max(1, int(math.log2(max(1, max_doc))) + 1)
    rounds = int(math.ceil(math.log2(chain_max))) + 1
    for _ in range(rounds):
        nxt = m.select_columns(["doc_id", "final_doc", "n_hops"])
        m = hash_join(
            m,
            nxt,
            on=["final_doc"],
            right_on=["doc_id"],
            how="inner",
            broadcast="none",
        )

        def step(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"].combine_chunks(),
                    "final_doc": b["final_doc_r"].combine_chunks(),
                    "n_hops": pc.add(
                        b["n_hops"].combine_chunks(), b["n_hops_r"].combine_chunks()
                    ),
                }
            )

        m = compact(m.map_batches(step, batch_format="pyarrow")).materialize()
    return m


# content stability across crawl slices (persistence histogram)
# ---------------------------------------------------------------------------

_CONTENT_STABILITY_SQL = """
    WITH f AS (SELECT md5(lower(array_to_string(list_slice(str_split(text, ' '), 1, 2), ' '))) AS fp,
                      CAST(doc_id % 4 AS BIGINT) AS slice
               FROM documents),
    per AS (SELECT fp, COUNT(DISTINCT slice) AS n_slices, COUNT(*) AS n_pages
            FROM f GROUP BY fp)
    SELECT CAST(n_slices AS BIGINT) AS n_slices,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(SUM(n_pages) AS BIGINT) AS n_pages
    FROM per GROUP BY 1
"""


@_register("q_content_stability", _CONTENT_STABILITY_SQL)
def q_content_stability(sf_dir: str):
    """Content persistence across crawl increments: each page's content
    FAMILY (md5 of its lowercased first-2-token prefix — the lede-based
    family key; full-text md5 is vacuous on this all-unique corpus) is
    counted over the 4 crawl slices (doc_id % 4, the incremental-ingest
    convention), reduced to a histogram of how many slices each family
    appears in — the stability profile a crawler uses to tune revisit
    rates (1-slice families are churn; 4-slice families are persistent
    content a dedup pass should collapse).

    Scale shape: per-batch (fp, slice) dedupe + page-count partials feed
    ONE fingerprint-keyed exchange; the per-fp fold (distinct slices,
    pages) emits 4-row histogram partials, so the second exchange is
    constant-width and the final histogram is the only driver state."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.text import fingerprint_md5

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        from ontoea_ray.functions.text import tokenize

        toks = tokenize(b["text"].combine_chunks())
        lede = pc.binary_join(pc.list_slice(toks, 0, 2), " ")
        fp = fingerprint_md5(lede)
        sl = (np.asarray(b["doc_id"].combine_chunks(), np.int64) % 4)
        g = (
            pd.DataFrame({"fp": np.asarray(fp, object), "slice": sl})
            .groupby(["fp", "slice"], sort=False)
            .size()
            .reset_index(name="n_pages")
        )
        g["n_pages"] = g["n_pages"].astype(np.int64)
        return _from_pandas_clean(g)

    per_fp_slice = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["fp", "slice"],
        sums=["n_pages"],
    )
    parted = with_partition_key(per_fp_slice, ["fp"])

    def fold(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("fp", sort=False).agg(
            n_slices=("slice", "nunique"), n_pages=("n_pages", "sum")
        )
        h = g.groupby("n_slices", sort=False).agg(
            n_fingerprints=("n_pages", "size"), n_pages=("n_pages", "sum")
        ).reset_index()
        for c in h.columns:
            h[c] = h[c].astype(np.int64)
        return _from_pandas_clean(h)

    hist = parted.groupby("pkey").map_groups(fold, batch_format="pandas")
    return keyed_aggregate(hist, ["n_slices"], sums=["n_fingerprints", "n_pages"])
