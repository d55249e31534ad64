"""Queries: flagship (split from the former single-module registry)."""

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
    """Audio branch of the multimodal plumbing, REAL end-to-end since
    round 5: each doc becomes a deterministic 16-bit PCM WAV payload
    (integer triangle wave parameterized by doc_id — no float synth to
    disagree about), the stage decodes it with the pure-Python RIFF
    parser (`stages.multimodal.decode_wav_pcm` — NOT the fake path), and
    the vectorized per-window RMS / zero-crossing kernel emits integer
    features.  Compressed-codec formats remain stubbed; this query proves
    the decode plumbing on the one audio container that needs no codec."""
    from ontoea_ray.stages.multimodal import (
        audio_features_stage,
        decode_audio_stage,
        encode_wav_pcm,
    )

    def to_media(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].combine_chunks(), np.int64)
        # integer triangle wave: period 8 + (doc_id % 23), amplitude
        # 500 + 31*(doc_id % 97) — every sample integer-exact
        payloads = []
        t = np.arange(2048, dtype=np.int64)
        for did in ids:
            period = 8 + int(did) % 23
            amp = 500 + 31 * (int(did) % 97)
            phase = t % period
            tri = np.where(phase * 2 < period, phase, period - phase)
            wave = (tri * (2 * amp) // max(period // 2, 1) - amp).astype(np.int16)
            payloads.append(encode_wav_pcm(wave, 16000))
        return pa.table(
            {
                "media_id": pa.array(ids),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    media = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        to_media, batch_format="pyarrow"
    )
    feats = audio_features_stage(decode_audio_stage(media, fake=False))

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
