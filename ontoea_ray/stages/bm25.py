"""BM25 ranked retrieval over the partitioned inverted index.

The classic probabilistic retrieval scorer (Robertson & Walker, SIGIR 1994),
re-expressed with exact integer rationals so the DuckDB oracle replays every
score bit-for-bit (the engine-wide no-libm-log convention; cf. q_lm_score,
stages/dsir.py).  Per (term, doc):

    idf   = (SCALE * (N - df + 1)) // (df + 1)          # rational IDF
    norm  = 1000 - b_milli + (b_milli * dl * N) // total_tokens
    denom = 1000 * tf + (k1_milli * norm) // 1000
    score = (idf * tf * (k1_milli + 1000)) // denom

with k1_milli=1200, b_milli=750 the standard k1=1.2 / b=0.75 in milli-units.
Monotone in the same direction as the log-IDF original; the substitution is
the documented price of value-hash replayability.

Scale shape: only the query terms' hash-bucket partitions leave storage
(``tb = md5_64(token) % n_buckets`` — the read-pruning the index was built
for); tf/df reduce combiner-first; document lengths join in through the
planner (auto-broadcast / Bloom-pruned exchange), so the corpus itself is
touched only by the dl projection; the final top-k is a sort of the
candidate-doc score table, never the corpus.

Integer bound: scores stay exact in int64 while SCALE * N * max_tf *
(k1_milli + 1000) < 2^63 (~4e9 docs at the defaults); the SQL oracle uses
HUGEINT throughout.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

BM25_SCALE = 1_000_000
K1_MILLI = 1200
B_MILLI = 750


def _corpus_stats(docs: ray.data.Dataset, text_col: str) -> tuple[int, int]:
    """(n_docs, total_tokens) via one-row-per-block partials (the
    q_assortativity moment convention — block-count rows on the driver)."""
    from ontoea_ray.functions.text import token_count

    def partial(b: pa.Table) -> pa.Table:
        tc = token_count(b[text_col])
        return pa.table(
            {
                "n_docs": pa.array([len(b)], pa.int64()),
                "n_toks": pa.array([int(pc.sum(tc).as_py() or 0)], pa.int64()),
            }
        )

    rows = docs.map_batches(partial, batch_format="pyarrow").take_all()
    return sum(r["n_docs"] for r in rows), sum(r["n_toks"] for r in rows)


def term_postings(index_dir: str, terms: list[str]) -> ray.data.Dataset:
    """Dataset of (token, doc_id) postings for ``terms``, reading ONLY their
    bucket partitions (distributed read — common terms' posting lists are
    corpus-proportional and must not land on the driver like the point
    `lookup_token` path)."""
    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    dirs = sorted(
        {
            os.path.join(
                index_dir,
                f"tb={int.from_bytes(hashlib.md5(t.encode()).digest()[:8], 'big') % meta['n_buckets']}",
            )
            for t in terms
        }
    )
    # multi-path read_parquet expects FILES — expand each bucket dir
    files = sorted(
        os.path.join(d, f)
        for d in dirs
        if os.path.isdir(d)
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    if not files:
        return ray.data.from_arrow(
            pa.table({"token": pa.array([], pa.string()), "doc_id": pa.array([], pa.int64())})
        )
    ds = ray.data.read_parquet(files, columns=["token", "doc_id"])
    tset = pa.array(sorted(set(terms)))
    return ds.map_batches(
        lambda b: b.filter(pc.is_in(b["token"].combine_chunks(), value_set=tset)),
        batch_format="pyarrow",
    )


def bm25_topk(
    index_dir: str,
    docs: ray.data.Dataset,
    terms: list[str],
    *,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = BM25_SCALE,
    k1_milli: int = K1_MILLI,
    b_milli: int = B_MILLI,
) -> pa.Table:
    """Top-``k`` documents for the term set, ranked by the integer BM25
    score (ties broken by ascending doc_id).  Returns (doc_id, score, rnk)."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import token_count

    n_docs, total_toks = _corpus_stats(docs, text_col)

    tf = keyed_aggregate(
        term_postings(index_dir, terms), ["token", "doc_id"], count_alias="tf"
    ).materialize()
    # df: <= |terms| rows — constant-size driver state
    df_rows = keyed_aggregate(
        tf.select_columns(["token"]), ["token"], count_alias="df"
    ).take_all()
    df = {r["token"]: int(r["df"]) for r in df_rows}
    if not df:  # no term matched anything: the empty ranking, typed
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
            }
        )
    idf = {
        t: (scale * (n_docs - d + 1)) // (d + 1) for t, d in df.items()
    }

    def dl_rows(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().cast(pa.int64()),
                "dl": token_count(b[text_col]),
            }
        )

    dl = docs.map_batches(dl_rows, batch_format="pyarrow")
    joined = hash_join(tf, dl, on=[id_col])

    def score(b: pa.Table) -> pa.Table:
        t = np.asarray(b["tf"].combine_chunks(), np.int64)
        d = np.asarray(b["dl"].combine_chunks(), np.int64)
        toks = b["token"].combine_chunks().to_pylist()
        iv = np.fromiter((idf[x] for x in toks), np.int64, len(toks))
        norm = 1000 - b_milli + (b_milli * d * n_docs) // total_toks
        denom = 1000 * t + (k1_milli * norm) // 1000
        s = (iv * t * (k1_milli + 1000)) // denom
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().cast(pa.int64()),
                "s": pa.array(s),
            }
        )

    per_doc = keyed_aggregate(
        joined.map_batches(score, batch_format="pyarrow"), [id_col], sums=["s"]
    )
    rows = (
        per_doc.sort(["s", id_col], descending=[True, False]).limit(k).take_all()
    )
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in rows], pa.int64()),
            "score": pa.array([r["s"] for r in rows], pa.int64()),
            "rnk": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
        }
    )
