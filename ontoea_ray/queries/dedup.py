"""Queries: dedup (split from the former single-module registry)."""

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


# per-doc n-gram novelty (corpus-first shingle fraction)
# ---------------------------------------------------------------------------

_NOVELTY_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    fs AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
    per AS (SELECT sh.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN fs.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM sh JOIN fs ON fs.s = sh.s GROUP BY sh.doc_id)
    SELECT doc_id, n_shingles, n_novel,
           CAST(n_novel * 1000 // n_shingles AS BIGINT) AS novelty_milli
    FROM per
"""


@_register("q_ngram_novelty", _NOVELTY_SQL)
def q_ngram_novelty(sf_dir: str):
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles whose corpus-FIRST appearance (min doc_id) is this
    doc, in integer milli — the "how much of this page is new text"
    signal an ingest-ordered dedup pass scores before deciding to keep a
    page (near-zero novelty = assembled from already-seen text; the
    doc-granular sibling of q_vocab_growth's corpus curve).

    Scale shape: one (shingle -> min doc_id) combiner-first reduction —
    the same first-appearance trick as q_vocab_growth — then the
    ownership check rides a shingle-keyed join back to the per-doc
    partials (planner-broadcast under budget), reducing to one row per
    doc with no window function and no second corpus scan."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.dedup import shingle_strings

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        df = shingle_strings(b["text"], ids, 3).rename(
            columns={"id": "doc_id", "shingle": "s"}
        )
        return _from_pandas_clean(df)

    sh = docs.map_batches(explode, batch_format="pyarrow").materialize()
    fs = keyed_aggregate(
        sh.map_batches(
            lambda b: pa.table({"s": b["s"], "first_doc": b["doc_id"]}),
            batch_format="pyarrow",
        ),
        ["s"],
        mins=["first_doc"],
    ).materialize()
    joined = hash_join(sh, fs, on=["s"])

    def per_doc(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        novel = (
            np.asarray(b["first_doc"].combine_chunks(), np.int64) == d
        ).astype(np.int64)
        df = pd.DataFrame({"doc_id": d, "n_shingles": 1, "n_novel": novel})
        g = df.groupby("doc_id", sort=False)[["n_shingles", "n_novel"]].sum().reset_index()
        g["n_shingles"] = g["n_shingles"].astype(np.int64)
        g["n_novel"] = g["n_novel"].astype(np.int64)
        return _from_pandas_clean(g)

    agg = keyed_aggregate(
        joined.map_batches(per_doc, batch_format="pyarrow"),
        ["doc_id"],
        sums=["n_shingles", "n_novel"],
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_shingles": b["n_shingles"],
                "n_novel": b["n_novel"],
                "novelty_milli": pc.divide(
                    pc.multiply(b["n_novel"].combine_chunks(), pa.scalar(1000, pa.int64())),
                    b["n_shingles"].combine_chunks(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# consistent-hash ring remap audit (vnodes, shard removal)
# ---------------------------------------------------------------------------

_CHASH_SHARDS = 8
_CHASH_VNODES = 16
_CHASH_REMOVED = "s3"


def _chash_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h

    shard_rows = ", ".join(f"('s{i}')" for i in range(_CHASH_SHARDS))
    return f"""
    WITH shards(s) AS (VALUES {shard_rows}),
    v AS MATERIALIZED (SELECT s, {_h("s || ':' || CAST(i AS VARCHAR)")} AS pos
         FROM shards, (SELECT unnest(range({_CHASH_VNODES})) AS i)),
    v2 AS MATERIALIZED (SELECT * FROM v WHERE s <> '{_CHASH_REMOVED}'),
    k AS (SELECT doc_id, {_h("CAST(doc_id AS VARCHAR)")} AS kp FROM documents),
    a AS (SELECT doc_id,
            COALESCE((SELECT v.s FROM v WHERE v.pos > k.kp ORDER BY v.pos ASC LIMIT 1),
                     (SELECT v.s FROM v ORDER BY v.pos ASC LIMIT 1)) AS before,
            COALESCE((SELECT v2.s FROM v2 WHERE v2.pos > k.kp ORDER BY v2.pos ASC LIMIT 1),
                     (SELECT v2.s FROM v2 ORDER BY v2.pos ASC LIMIT 1)) AS after
          FROM k),
    m AS (SELECT before, after, COUNT(*) AS n FROM a GROUP BY 1, 2)
    SELECT s.s AS shard,
           CAST(COALESCE((SELECT SUM(n) FROM m WHERE before = s.s), 0) AS BIGINT) AS n_before,
           CAST(COALESCE((SELECT SUM(n) FROM m WHERE after = s.s), 0) AS BIGINT) AS n_after,
           CAST(COALESCE((SELECT SUM(n) FROM m
                          WHERE after = s.s AND before <> s.s), 0) AS BIGINT) AS n_moved_in
    FROM shards s
"""


@_register("q_chash_remap", _chash_sql())
def q_chash_remap(sf_dir: str):
    """Consistent-hash ring remap audit (Karger et al. 1997): documents
    are placed on a 64-bit hash ring owned by 8 shards x 16 virtual
    nodes (successor-with-wrap), shard '{_CHASH_REMOVED}' is removed,
    and the before/after assignment matrix is reduced to per-shard
    counts — verifying the property the ring exists for: ONLY the
    removed shard's keys move (n_moved_in sums to its n_before; every
    other shard's keys stay put), unlike mod-N hashing where removal
    remaps nearly everything.  Complements q_rendezvous_shards (HRW),
    the other minimal-remap scheme.

    Scale shape: the ring is 128 (pos, shard) pairs — constant closure
    state; each batch assigns both rings with ONE np.searchsorted over
    the sorted vnode positions and reduces to (before, after) matrix
    partials (<= 64 cells), so the exchange is constant-width and the
    8-row audit is the only driver state.  md5-hash positions make the
    oracle replay every placement."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.dedup import _token_hashes

    names = [f"s{i}" for i in range(_CHASH_SHARDS)]

    def ring(shard_names):
        labels, keys = [], []
        for s in shard_names:
            for i in range(_CHASH_VNODES):
                labels.append(s)
                keys.append(f"{s}:{i}")
        pos = _token_hashes(pa.array(keys, pa.string()), backend="md5")
        order = np.argsort(pos, kind="stable")
        return pos[order], np.array(labels, object)[order]

    pos1, lab1 = ring(names)
    pos2, lab2 = ring([s for s in names if s != _CHASH_REMOVED])

    def assign(kp, pos, lab):
        # successor with wrap: first vnode strictly above the key
        j = np.searchsorted(pos, kp, side="right")
        return lab[np.where(j == len(pos), 0, j) % len(pos)]

    docs = _read(sf_dir, "documents", ["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        kp = _token_hashes(
            pa.array(ids.astype(str), pa.string()), backend="md5"
        )
        before = assign(kp, pos1, lab1)
        after = assign(kp, pos2, lab2)
        g = (
            pd.DataFrame({"before": before, "after": after})
            .groupby(["before", "after"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return _from_pandas_clean(g)

    m = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["before", "after"],
        sums=["n"],
    ).to_pandas()  # <= 64 cells: constant-size audit matrix

    rows = []
    for s in names:
        rows.append(
            {
                "shard": s,
                "n_before": int(m.loc[m.before == s, "n"].sum()),
                "n_after": int(m.loc[m.after == s, "n"].sum()),
                "n_moved_in": int(m.loc[(m.after == s) & (m.before != s), "n"].sum()),
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return ray.data.from_arrow(_from_pandas_clean(out))


# generalized (multiset) Jaccard near-dup pairs
# ---------------------------------------------------------------------------

_WJACCARD_SQL = """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh_all AS (SELECT doc_id,
           unnest(CASE WHEN len(t) >= 3
                  THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                  ELSE [array_to_string(t, ' ')] END) AS s
           FROM toks),
    tf AS (SELECT doc_id, s, CAST(COUNT(*) AS BIGINT) AS tf FROM sh_all GROUP BY 1, 2),
    sizes AS (SELECT doc_id, SUM(tf) AS sz FROM tf GROUP BY 1),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     SUM(LEAST(a.tf, b.tf)) AS c
              FROM tf a JOIN tf b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(c * 1000 // (sa.sz + sb.sz - c) AS BIGINT) AS jw_milli
    FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
               JOIN sizes sb ON inter.id_b = sb.doc_id
    WHERE (1000 + 500) * c >= 500 * (sa.sz + sb.sz)
"""


@_register("q_weighted_jaccard", _WJACCARD_SQL)
def q_weighted_jaccard(sf_dir: str):
    """Generalized (multiset) Jaccard near-dup pairs at J_w >= 0.5:
    Σ min(tf)/Σ max(tf) over 3-gram shingle term frequencies — the
    repetition-aware measure that distinguishes a doc repeating a phrase
    50x from one mentioning it once, where q_jaccard_pairs' SET measure
    sees identical sets (`stages/dedup.weighted_jaccard_pairs`, which
    reuses the whole set machinery via the level-explosion trick).  The
    plain weighted self-join oracle value-checks the distributed plan
    including every milli score."""
    from ontoea_ray.stages.dedup import weighted_jaccard_pairs

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return weighted_jaccard_pairs(docs, threshold_milli=500)
