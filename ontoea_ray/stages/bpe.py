"""Distributed BPE merge induction (tokenizer training) over a corpus.

The byte-pair-encoding loop of Sennrich/Haddow/Birch, "Neural machine
translation of rare words with subword units", ACL 2016 — the operator a
training-data pipeline runs to LEARN its tokenizer before token counting,
packing and budget math mean anything.

Engine variant (defined precisely so the DuckDB oracle replays it
bit-for-bit):

- words = whitespace tokens; symbol sequences start as single characters,
  NO end-of-word marker;
- each iteration picks the adjacent symbol pair with the highest
  freq-weighted count, ties broken by (left ASC, right ASC);
- the merge applies LEFT-TO-RIGHT NON-OVERLAPPING within each word (the
  run "a a a a" under merge (a,a) becomes "aa aa", "a a a" becomes
  "aa a") — exactly the semantics of Python/pandas ``str.replace`` and
  DuckDB ``replace`` over the delimiter-wrapped rendering ``|s1||s2||s3|``
  (each symbol independently wrapped, so consecutive matches share no
  boundary characters).

Scale shape: after the frequency combiner the loop never touches the
corpus again — every iteration is ONE vocabulary-sized pair-count
exchange (per-batch weighted bigram partials -> keyed merge), a bounded
per-block-top-1 -> driver argmax (one row per block), and a vectorized
replace pass over the vocabulary.  n_merges iterations cost n_merges
vocab passes, independent of corpus size.

Precondition: symbols must not contain the ``|`` delimiter (asserted).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean


def _wrap(word: str) -> str:
    return "|" + "||".join(word) + "|"


def _seq_table(vocab: ray.data.Dataset, token_col: str, freq_col: str) -> ray.data.Dataset:
    def to_seq(df: pd.DataFrame) -> pa.Table:
        toks = df[token_col].astype(str)
        assert not toks.str.contains("|", regex=False).any(), "BPE delimiter '|' in token"
        return _from_pandas_clean(
            pd.DataFrame({"seq": toks.map(_wrap), "freq": df[freq_col].astype(np.int64)})
        )

    return vocab.map_batches(to_seq, batch_format="pandas")


def _pair_partial(df: pd.DataFrame) -> pa.Table:
    syms = df["seq"].str.slice(1, -1).str.split("||", regex=False)
    lens = syms.str.len().to_numpy(np.int64)
    if not len(df) or int(lens.sum()) == 0:
        return _from_pandas_clean(
            pd.DataFrame({"l": pd.Series([], dtype=str), "r": pd.Series([], dtype=str),
                          "n": pd.Series([], dtype=np.int64)})
        )
    flat = np.concatenate([np.asarray(x, dtype=object) for x in syms.to_numpy()])
    freq = df["freq"].to_numpy(np.int64)
    ends = np.cumsum(lens)
    # pair (i, i+1) valid where i+1 is not a word start
    valid = np.ones(len(flat) - 1, bool) if len(flat) > 1 else np.zeros(0, bool)
    valid[ends[:-1] - 1] = False  # last symbol of each word (except final) pairs across words
    w = np.repeat(freq, lens)[:-1][valid] if len(flat) > 1 else np.array([], np.int64)
    out = pd.DataFrame({"l": flat[:-1][valid], "r": flat[1:][valid], "n": w})
    g = out.groupby(["l", "r"], sort=False)["n"].sum().reset_index()
    g["n"] = g["n"].astype(np.int64)
    return _from_pandas_clean(g)


def _local_top1(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return df
    df = df.sort_values(["n", "l", "r"], ascending=[False, True, True], kind="mergesort")
    return df.head(1)


def bpe_merges(
    docs: ray.data.Dataset,
    *,
    n_merges: int = 3,
    text_col: str = "text",
) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns (it, left, right, n) —
    the merge picked at each iteration with its freq-weighted pair count."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.state.ids import token_frequencies

    vocab = token_frequencies(docs.select_columns([text_col]))
    seqs = _seq_table(vocab, "token", "freq").materialize()

    merges: list[tuple[int, str, str, int]] = []
    for it in range(n_merges):
        counts = keyed_aggregate(
            seqs.map_batches(_pair_partial, batch_format="pandas"), ["l", "r"], sums=["n"]
        )
        tops = counts.map_batches(_local_top1, batch_format="pandas").take_all()
        if not tops:
            break
        best = sorted(tops, key=lambda t: (-t["n"], t["l"], t["r"]))[0]
        l, r, n = best["l"], best["r"], int(best["n"])
        merges.append((it, l, r, n))
        old, new = f"|{l}||{r}|", f"|{l}{r}|"

        def apply(df: pd.DataFrame, old=old, new=new) -> pa.Table:
            return _from_pandas_clean(
                pd.DataFrame(
                    {"seq": df["seq"].str.replace(old, new, regex=False), "freq": df["freq"]}
                )
            )

        seqs = seqs.map_batches(apply, batch_format="pandas").materialize()

    return pa.table(
        {
            "it": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_merges_sql(n_merges: int = 3, source: str = "documents", text_col: str = "text") -> str:
    """Unrolled DuckDB replay of :func:`bpe_merges` (same pair counting,
    same tie-break, same delimiter-wrapped non-overlapping replace)."""
    parts = [
        f"""w0 AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest(str_split({text_col}, ' ')) AS token FROM {source})
      GROUP BY token),
    s0 AS (SELECT '|' || array_to_string(str_split(token, ''), '||') || '|' AS seq, freq FROM w0)"""
    ]
    for k in range(n_merges):
        parts.append(
            f"""p{k} AS (
      SELECT l, r, CAST(SUM(freq) AS BIGINT) AS n FROM (
        SELECT freq, syms[i] AS l, syms[i + 1] AS r
        FROM (SELECT freq, str_split(trim(seq, '|'), '||') AS syms FROM s{k}),
             LATERAL (SELECT unnest(range(1, len(syms))) AS i) t)
      GROUP BY l, r),
    b{k} AS (SELECT l, r, n FROM p{k} ORDER BY n DESC, l ASC, r ASC LIMIT 1),
    s{k + 1} AS (
      SELECT replace(seq,
                     '|' || (SELECT l FROM b{k}) || '||' || (SELECT r FROM b{k}) || '|',
                     '|' || (SELECT l FROM b{k}) || (SELECT r FROM b{k}) || '|') AS seq,
             freq
      FROM s{k})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS it, l AS left, r AS right, n FROM b{k}"
        for k in range(n_merges)
    )
    return "WITH " + ",\n    ".join(parts) + "\n    " + selects


def bpe_token_counts(
    docs: ray.data.Dataset,
    *,
    n_merges: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """APPLY learned BPE merges: per-document subword count after
    ``n_merges`` merges — the tokenizer-accurate budget signal whitespace
    counts overestimate.

    Scale shape: subword counts are a PER-WORD function, so the merges are
    applied once to the VOCABULARY (the bpe_merges loop already holds the
    merged sequences); the resulting word -> n_subwords map broadcasts via
    one ray.put and every document reduces vectorized (token index_in +
    bincount-style gather) — the corpus is scanned once, merges never
    touch it."""
    import pyarrow.compute as pc

    import ray

    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.state.ids import token_frequencies

    vocab = token_frequencies(docs.select_columns([text_col]))
    merges = bpe_merges(docs.select_columns([text_col]), n_merges=n_merges)
    pairs = list(zip(merges["left"].to_pylist(), merges["right"].to_pylist()))

    # word -> n_subwords map computed DISTRIBUTED over the vocabulary
    # (vectorized str.replace per merge), then collected once — the map is
    # (token, int64) only, the smallest thing that can broadcast
    def word_counts(df: pd.DataFrame) -> pa.Table:
        toks = df["token"].astype(str)
        assert not toks.str.contains("|", regex=False).any(), "BPE delimiter '|' in token"
        s = toks.map(_wrap)
        for l, r in pairs:
            s = s.str.replace(f"|{l}||{r}|", f"|{l}{r}|", regex=False)
        n = s.str.slice(1, -1).str.split("||", regex=False).str.len().astype(np.int64)
        return _from_pandas_clean(pd.DataFrame({"token": toks, "n_sub": n}))

    wmap = pa.Table.from_pylist(
        vocab.map_batches(word_counts, batch_format="pandas").take_all()
    )
    word_arr = wmap["token"].combine_chunks()
    cnt_arr = np.asarray(wmap["n_sub"].to_numpy(zero_copy_only=False), np.int64)
    ref = ray.put((word_arr, cnt_arr))

    def per_doc(b: pa.Table) -> pa.Table:
        wa, ca = ray.get(ref)
        toks = tokenize(b[text_col].combine_chunks())
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(toks.flatten(), value_set=wa).to_numpy(zero_copy_only=False)
        sub = ca[idx.astype(np.int64)]
        csum = np.concatenate([[0], np.cumsum(sub)])
        return pa.table(
            {
                id_col: b[id_col],
                "n_subwords": pa.array(csum[offs[1:]] - csum[offs[:-1]], pa.int64()),
            }
        )

    return docs.map_batches(per_doc, batch_format="pyarrow")


def bpe_token_counts_sql(
    n_merges: int = 3, source: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB replay of :func:`bpe_token_counts`: run the unrolled merge
    CTEs, map each vocabulary word to its merged-sequence length, sum per
    document."""
    base = bpe_merges_sql(n_merges=n_merges, source=source, text_col=text_col)
    ctes = base[len("WITH ") : base.rindex("SELECT CAST(0")].rstrip().rstrip(",")
    # s{n_merges} holds fully-merged sequences but lost the token column;
    # rebuild the token -> subword count map by re-deriving from w0 order
    merge_exprs = "seq"
    for k in range(n_merges):
        merge_exprs = (
            f"replace({merge_exprs}, "
            f"'|' || (SELECT l FROM b{k}) || '||' || (SELECT r FROM b{k}) || '|', "
            f"'|' || (SELECT l FROM b{k}) || (SELECT r FROM b{k}) || '|')"
        )
    return f"""WITH {ctes},
    wmap AS (
      SELECT token,
             len(str_split(trim({merge_exprs}, '|'), '||')) AS n_sub
      FROM (SELECT token, '|' || array_to_string(str_split(token, ''), '||') || '|' AS seq FROM w0)),
    toks AS (SELECT {id_col}, unnest(str_split({text_col}, ' ')) AS token FROM {source})
    SELECT toks.{id_col}, CAST(SUM(wmap.n_sub) AS BIGINT) AS n_subwords
    FROM toks JOIN wmap ON toks.token = wmap.token
    GROUP BY toks.{id_col}
"""
