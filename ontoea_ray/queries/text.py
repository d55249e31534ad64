"""Queries: text (split from the former single-module registry)."""

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
# RAKE keyword extraction (Rose et al. 2010)
# ---------------------------------------------------------------------------

_RAKE_STOP_K = 8
_RAKE_TOP_K = 20

_RAKE_SQL = f"""
    WITH alltok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok,
                           unnest(range(1, len(str_split(text, ' ')) + 1)) AS p
                    FROM documents),
    stop AS (SELECT tok FROM alltok GROUP BY tok
             ORDER BY COUNT(*) DESC, tok ASC LIMIT {_RAKE_STOP_K}),
    flags AS (SELECT doc_id, p, tok,
                     CASE WHEN tok IN (SELECT tok FROM stop) THEN 1 ELSE 0 END AS s
              FROM alltok),
    g AS (SELECT doc_id, p, tok, s,
                 SUM(s) OVER (PARTITION BY doc_id ORDER BY p) AS grp
          FROM flags),
    ph AS (SELECT doc_id, grp,
                  string_agg(tok, ' ' ORDER BY p) AS phrase,
                  COUNT(*) AS plen
           FROM g WHERE s = 0 GROUP BY doc_id, grp),
    w AS (SELECT g.tok, ph.plen
          FROM g JOIN ph ON ph.doc_id = g.doc_id AND ph.grp = g.grp
          WHERE g.s = 0),
    wsc AS (SELECT tok, SUM(plen) * 1000 // COUNT(*) AS sc
            FROM w GROUP BY tok),
    pd AS (SELECT phrase, COUNT(*) AS n_occ FROM ph GROUP BY phrase),
    pw AS (SELECT phrase, unnest(str_split(phrase, ' ')) AS tok FROM pd),
    psc AS (SELECT pw.phrase, SUM(wsc.sc) AS score_milli
            FROM pw JOIN wsc USING (tok) GROUP BY 1)
    SELECT phrase, CAST(n_occ AS BIGINT) AS n_occ,
           CAST(score_milli AS BIGINT) AS score_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY score_milli DESC, phrase ASC) AS BIGINT) AS rank
    FROM psc JOIN pd USING (phrase)
    QUALIFY rank <= {_RAKE_TOP_K}
"""


@_register("q_rake_keywords", _RAKE_SQL)
def q_rake_keywords(sf_dir: str):
    """RAKE keyword extraction (Rose et al., "Automatic keyword extraction
    from individual documents", 2010): candidate phrases are the maximal
    stopword-free token runs, each word scores deg/freq (deg = sum of the
    lengths of phrases containing it, freq = its phrase-occurrence count,
    integer milli), and a phrase scores the sum of its words — the cheap
    unsupervised keyword signal a corpus-curation pipeline tags documents
    with.  Stopwords are the corpus's own top-{_RAKE_STOP_K} tokens by
    frequency (ties token-asc) — fully corpus-derived, so the oracle
    replays the whole chain.

    Scale shape: stopword election is a vocabulary-sized reduction
    (token_frequencies' combiner partials) with a bounded top-K on the
    driver (K = 8 strings of constant size); phrase/word partials are
    built per batch fully vectorized (one cumsum over the stop mask makes
    the island ids; phrase join is the one per-group string op) and
    collapse in-block, so ONE keyed exchange carries (kind, key) partials
    bounded by vocab + distinct-phrase counts; phrase scoring explodes
    only DISTINCT phrases and joins word scores through the planner's
    budget-switched hash join; the final top-{_RAKE_TOP_K} sorts a
    reduced table."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.state.ids import token_frequencies

    docs = _read(sf_dir, "documents", ["text"])
    tf = token_frequencies(docs)
    top = tf.sort(["freq", "token"], descending=[True, False]).limit(_RAKE_STOP_K)
    stopwords = pa.array([r["token"] for r in top.take_all()], pa.string())

    def partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b["text"].combine_chunks())
        flat = toks.values
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        doc_idx = np.repeat(np.arange(len(b), dtype=np.int64), lengths)
        stop = pc.is_in(flat, value_set=stopwords).to_numpy(zero_copy_only=False)
        grp = np.cumsum(stop)
        keep = ~stop
        if not keep.any():
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        "kind": pd.Series([], dtype=np.int64),
                        "key": pd.Series([], dtype=object),
                        "deg": pd.Series([], dtype=np.int64),
                        "n": pd.Series([], dtype=np.int64),
                    }
                )
            )
        df = pd.DataFrame(
            {
                "d": doc_idx[keep],
                "g": grp[keep],
                "tok": np.asarray(flat, dtype=object)[keep],
            }
        )
        gb = df.groupby(["d", "g"], sort=False)["tok"]
        phrases = gb.agg(" ".join)
        plen_per_row = gb.transform("size").to_numpy(np.int64)
        wpart = (
            pd.DataFrame({"key": df["tok"], "deg": plen_per_row, "n": 1})
            .groupby("key", sort=False)[["deg", "n"]]
            .sum()
            .reset_index()
        )
        wpart.insert(0, "kind", np.int64(0))
        ppart = (
            pd.DataFrame({"key": phrases.to_numpy(object), "deg": 0, "n": 1})
            .groupby("key", sort=False)[["deg", "n"]]
            .sum()
            .reset_index()
        )
        ppart.insert(0, "kind", np.int64(1))
        out = pd.concat([wpart, ppart], ignore_index=True)
        out["kind"] = out["kind"].astype(np.int64)
        out["deg"] = out["deg"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return _from_pandas_clean(out)

    agg = keyed_aggregate(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["kind", "key"],
        sums=["deg", "n"],
    ).materialize()

    wsc = agg.filter(expr="kind == 0").map_batches(
        lambda b: pa.table(
            {
                "tok": b["key"].combine_chunks(),
                "sc": pc.divide(
                    pc.multiply(b["deg"].combine_chunks(), pa.scalar(1000, pa.int64())),
                    b["n"].combine_chunks(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    phrases = agg.filter(expr="kind == 1").select_columns(["key", "n"]).materialize()

    def explode(b: pa.Table) -> pa.Table:
        toks = tokenize(b["key"].combine_chunks())
        lengths = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "phrase": pa.array(
                    np.repeat(np.asarray(b["key"].combine_chunks(), object), lengths),
                    pa.string(),
                ),
                "tok": toks.values,
            }
        )

    pw = phrases.map_batches(explode, batch_format="pyarrow")
    joined = hash_join(pw, wsc, on=["tok"])
    psc = keyed_aggregate(joined.select_columns(["phrase", "sc"]), ["phrase"], sums=["sc"])
    scored = hash_join(
        psc,
        phrases.map_batches(
            lambda b: pa.table(
                {"phrase": b["key"].combine_chunks(), "n_occ": b["n"].combine_chunks()}
            ),
            batch_format="pyarrow",
        ),
        on=["phrase"],
    )

    rows = (
        scored.sort(["sc", "phrase"], descending=[True, False])
        .limit(_RAKE_TOP_K)
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "phrase": rows["phrase"],
            "n_occ": rows["n_occ"].astype(np.int64),
            "score_milli": rows["sc"].astype(np.int64),
            "rank": np.arange(1, len(rows) + 1, dtype=np.int64),
        }
    )
    return ray.data.from_arrow(_from_pandas_clean(out))

# winnowing document fingerprints (Schleimer-Wilkerson-Aiken, SIGMOD 2003)
# ---------------------------------------------------------------------------

_WINNOW_W = 4  # window of consecutive 3-gram hashes
_WINNOW_MASK_SQL = 4611686018427387904  # 2^62: digest domain (fits BIGINT)


def _winnow_sql() -> str:
    from ontoea_ray.functions.lsh_sql import _h

    return f"""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT doc_id,
             unnest(CASE WHEN len(t) >= 3
                    THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
                    ELSE [array_to_string(t, ' ')] END) AS s,
             unnest(CASE WHEN len(t) >= 3 THEN range(1, len(t) - 1)
                    ELSE [1] END) AS p
           FROM toks),
    sh2 AS (SELECT doc_id, p, {_h('s')} AS h FROM sh),
    m AS (SELECT doc_id, COUNT(*) AS m FROM sh2 GROUP BY 1),
    wins AS (SELECT doc_id, unnest(range(1, greatest(m - {_WINNOW_W - 1}, 1) + 1)) AS i
             FROM m),
    win AS (SELECT w.doc_id, w.i, s.p, s.h,
                   ROW_NUMBER() OVER (PARTITION BY w.doc_id, w.i
                                      ORDER BY s.h ASC, s.p DESC) AS rn
            FROM wins w JOIN sh2 s
              ON s.doc_id = w.doc_id AND s.p >= w.i AND s.p <= w.i + {_WINNOW_W - 1}),
    sel AS (SELECT DISTINCT doc_id, p, h FROM win WHERE rn = 1),
    selh AS (SELECT DISTINCT doc_id, h FROM sel),
    cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_selected FROM sel GROUP BY 1),
    dig AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(bit_xor(CAST(h % {_WINNOW_MASK_SQL} AS BIGINT)) AS BIGINT) AS fp_digest
            FROM selh GROUP BY 1)
    SELECT doc_id, n_selected, n_distinct, fp_digest FROM cnt JOIN dig USING (doc_id)
"""


@_register("q_winnow_fingerprints", _winnow_sql())
def q_winnow_fingerprints(sf_dir: str):
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, "Winnowing:
    local algorithms for document fingerprinting", SIGMOD 2003 — the MOSS
    algorithm): slide a window of w consecutive 3-gram hashes over each
    document and select each window's minimum (rightmost on ties); the
    distinct selections are the document's fingerprint set, with the
    guarantee that any shared substring of length >= w+2 tokens yields a
    shared fingerprint.  Output per doc: selection count, distinct-hash
    count, and an order-independent xor digest over the distinct
    fingerprints reduced to 2^62 (BIGINT-safe on both sides).

    Scale shape: EMBARRASSINGLY parallel — one map_batches pass, zero
    exchange.  The sliding-window argmin is vectorized across the whole
    batch's flat hash array (windows crossing doc boundaries are masked
    out; rightmost-min via argmin over the reversed window view), short
    docs (< w shingles) reduce by one vectorized sort + boundary take,
    and the per-doc fold is a pandas groupby.  Hashes are the md5[:8]
    convention, so the oracle replays every selection bit-for-bit."""
    from ontoea_ray.stages.dedup import _token_hashes
    from ontoea_ray.functions.text import tokenize

    W = _WINNOW_W
    MASK = np.uint64(_WINNOW_MASK_SQL)

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(b: pa.Table) -> pa.Table:
        text = b["text"].combine_chunks()
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        toks = tokenize(text)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        flat = toks.flatten()
        nf = len(flat)
        frames = []
        if nf >= 3:
            row_id = np.repeat(np.arange(len(counts)), counts)
            parts = [flat.slice(j, nf - 2) for j in range(3)]
            joined = pc.binary_join_element_wise(*parts, " ")
            valid = row_id[: nf - 2] == row_id[2:]
            d_idx = row_id[: nf - 2][valid]
            # 1-based position within the doc's shingle sequence
            pos_all = np.arange(nf - 2) - offs[:-1][row_id[: nf - 2]]
            pos = pos_all[valid] + 1
            h = _token_hashes(joined.filter(pa.array(valid)), backend="md5")
            frames.append(pd.DataFrame({"d": d_idx, "p": pos, "h": h}))
        short = counts < 3
        if short.any():
            h = _token_hashes(text.filter(pa.array(short)), backend="md5")
            frames.append(
                pd.DataFrame(
                    {
                        "d": np.flatnonzero(short),
                        "p": np.ones(int(short.sum()), np.int64),
                        "h": h,
                    }
                )
            )
        if not frames:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_selected": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "fp_digest": pa.array([], pa.int64()),
                }
            )
        df = (
            pd.concat(frames, ignore_index=True)
            .sort_values(["d", "p"], kind="mergesort")
            .reset_index(drop=True)  # labels must BE positions: sel indexes d/h positionally
        )
        d = df["d"].to_numpy(np.int64)
        h = df["h"].to_numpy(np.uint64)
        n = len(df)

        sel_idx = []
        if n >= W:
            from numpy.lib.stride_tricks import sliding_window_view

            wv = sliding_window_view(h, W)
            ok = d[: n - W + 1] == d[W - 1 :]  # window inside one doc
            # rightmost min: argmin over the reversed window view
            j = np.argmin(wv[:, ::-1], axis=1)
            picks = (np.arange(n - W + 1) + (W - 1 - j))[ok]
            sel_idx.append(picks)
        # docs with fewer than W shingles: rightmost min over the whole doc
        mcounts = np.bincount(d, minlength=len(ids))
        short_docs = np.flatnonzero((mcounts > 0) & (mcounts < W))
        if len(short_docs):
            sd = df[np.isin(d, short_docs)].sort_values(
                ["d", "h", "p"], ascending=[True, True, False], kind="mergesort"
            )
            sel_idx.append(sd.index.to_numpy()[
                np.r_[True, sd["d"].to_numpy()[1:] != sd["d"].to_numpy()[:-1]]
            ])
        sel = np.unique(np.concatenate(sel_idx)) if sel_idx else np.zeros(0, np.int64)
        sd, sh_ = d[sel], h[sel]
        g = pd.DataFrame({"d": sd, "h": sh_})
        n_selected = g.groupby("d", sort=False).size()
        gd = g.drop_duplicates(["d", "h"])
        red = (gd["h"].to_numpy(np.uint64) % MASK).astype(np.int64)
        gg = pd.DataFrame({"d": gd["d"].to_numpy(np.int64), "r": red}).groupby("d", sort=False)
        out = pd.DataFrame(
            {
                "doc_id": ids[n_selected.index.to_numpy(np.int64)],
                "n_selected": n_selected.to_numpy(np.int64),
                "n_distinct": gg.size().to_numpy(np.int64),
                "fp_digest": gg["r"].agg(lambda x: np.bitwise_xor.reduce(x.to_numpy(np.int64))).to_numpy(np.int64),
            }
        )
        return _from_pandas_clean(out)

    return docs.map_batches(fp, batch_format="pyarrow")
