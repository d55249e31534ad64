"""Deterministic sampling / splitting / sequence packing for training-data
pipelines.

All three are the 100-TB shapes of operations every LLM-data pipeline runs
before training:

- :func:`hash_sample` — keep a deterministic p-fraction of rows by a
  splitmix64 hash of the key.  Unlike ``Dataset.random_sample`` the result
  is reproducible across runs, resumable per partition, and join-stable
  (the same key samples identically in every table), and the oracle can
  replay it exactly in SQL.
- :func:`hash_split` — the same mechanism cut into named train/valid/test
  ranges (e.g. 80/10/10): every row gets a split label from its own key,
  no global shuffle, no coordination.
- :func:`pack_sequences` — assign rows (ordered by key) to fixed
  token-budget packs via a DISTRIBUTED PREFIX SUM: one streaming pass
  computes per-block token totals (tiny, O(#blocks) driver state), the
  exclusive block offsets are broadcast back, and a second vectorized pass
  labels each row ``pack_id = exclusive_prefix_tokens // budget``.  No
  sort, no shuffle — the corpus is read in key order and touched twice.

Every step is integer arithmetic with public constants so DuckDB replays
it bit-for-bit (`functions.lsh_sql.splitmix64_sql_expr`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SPLITMIX_GAMMA = 0x9E3779B97F4A7C15
SPLITMIX_M1 = 0xBF58476D1CE4E5B9
SPLITMIX_M2 = 0x94D049BB133111EB


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants; Steele et
    al., "Fast splittable pseudorandom number generators", OOPSLA 2014)."""
    z = x.astype(np.uint64) + np.uint64(SPLITMIX_GAMMA)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(SPLITMIX_M1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(SPLITMIX_M2)
    return z ^ (z >> np.uint64(31))


def hash_sample(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    rate_pct: int,
    denom: int = 100,
) -> ray.data.Dataset:
    """Deterministic sample: keep rows with splitmix64(key) % denom < rate_pct."""

    def keep(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(keys.view(np.uint64)) % np.uint64(denom)
        return batch.filter(pa.array(h < rate_pct))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_split(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    splits: dict[str, int] | None = None,
    denom: int = 100,
) -> ray.data.Dataset:
    """Label every row with a deterministic split name by hash range.

    ``splits`` maps name -> share (must sum to ``denom``); ranges are
    assigned in the given order (dicts preserve insertion order)."""
    splits = splits or {"train": 80, "valid": 10, "test": 10}
    assert sum(splits.values()) == denom
    names = list(splits)
    bounds = np.cumsum([splits[n] for n in names])

    def label(batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        h = (splitmix64(keys.view(np.uint64)) % np.uint64(denom)).astype(np.int64)
        idx = np.searchsorted(bounds, h, side="right")
        lab = np.asarray(names, object)[idx]
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(label, batch_format="pyarrow")


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    budget: int,
    text_col: str | None = "text",
    tokens_col: str | None = None,
) -> ray.data.Dataset:
    """Assign rows (in ascending ``key_col`` order) to fixed token-budget
    packs: ``pack_id = (exclusive prefix sum of tokens) // budget``.

    Distributed prefix sum: sort by key (one ranged exchange), then pass 1
    reduces each block to its token total (O(#blocks) numbers on the
    driver), pass 2 re-runs with the exclusive block offsets broadcast and
    labels rows vectorized.  The corpus itself never aggregates anywhere.
    Exactly one of ``text_col`` (whitespace token count) / ``tokens_col``
    (precomputed) selects the token source.
    """
    from ontoea_ray.functions.text import token_count

    def n_tokens(batch: pa.Table) -> np.ndarray:
        if tokens_col is not None:
            return np.asarray(batch[tokens_col].to_numpy(zero_copy_only=False), np.int64)
        return np.asarray(token_count(batch[text_col].combine_chunks()).to_numpy(
            zero_copy_only=False), np.int64)

    from ontoea_ray.functions.shuffle import _strip_schema_metadata

    ordered = (
        ds.map_batches(_strip_schema_metadata, batch_format="pyarrow")
        .sort(key_col)
        .materialize()
    )

    # pass 1: per-block (first_key, token_total) — tiny
    def block_total(batch: pa.Table) -> pa.Table:
        toks = n_tokens(batch)
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        return pa.table({
            "first_key": pa.array([int(keys[0]) if len(keys) else 0], pa.int64()),
            "total": pa.array([int(toks.sum())], pa.int64()),
            "n": pa.array([len(keys)], pa.int64()),
        })

    totals = ordered.map_batches(
        block_total, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values("first_key")
    totals = totals[totals["n"] > 0]
    offsets = dict(zip(
        totals["first_key"].to_numpy(np.int64),
        np.concatenate([[0], np.cumsum(totals["total"].to_numpy(np.int64))[:-1]]),
    ))
    off_ref = ray.put(offsets)

    # pass 2: local exclusive cumsum + broadcast block offset
    def label(batch: pa.Table) -> pa.Table:
        import ray as _ray

        if len(batch) == 0:
            return batch.append_column("pack_id", pa.array([], pa.int64()))
        offs = _ray.get(off_ref)
        toks = n_tokens(batch)
        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        base = offs[int(keys[0])]
        excl = base + np.concatenate([[0], np.cumsum(toks)[:-1]])
        return batch.append_column("pack_id", pa.array(excl // budget, pa.int64()))

    return ordered.map_batches(label, batch_format="pyarrow", batch_size=None)


def stratified_hash_sample(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    group_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
    denom: int = 100,
) -> ray.data.Dataset:
    """Per-group deterministic sampling (language/domain rebalancing: the
    standard training-mix step — downsample the dominant group, keep the
    rare ones).  Same splitmix64 keep-predicate as :func:`hash_sample` but
    the threshold is looked up per row from the broadcast ``rates_pct``
    map — shuffle-free, join-stable, replayable in SQL with a CASE over
    the same hash chain."""
    groups = list(rates_pct)
    lookup = pa.array(groups, pa.string())
    rate_arr = np.array([rates_pct[g] for g in groups] + [default_pct], np.uint64)

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        h = splitmix64(keys.view(np.uint64)) % np.uint64(denom)
        idx = pc.index_in(batch[group_col].combine_chunks(), value_set=lookup)
        idx = idx.to_numpy(zero_copy_only=False)
        idx = np.where(np.isnan(idx.astype(np.float64)), len(groups), idx).astype(np.int64) \
            if idx.dtype.kind == "f" else np.where(idx < 0, len(groups), idx).astype(np.int64)
        return batch.filter(pa.array(h < rate_arr[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def chunk_token_windows(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> ray.data.Dataset:
    """Overlapping token-window chunking — the context-window prep step
    (split long documents into model-sized windows with ``window - stride``
    tokens of overlap).  A flat_map-shaped explode, fully vectorized: chunk
    boundaries by repeat/cumsum index arithmetic over the tokenized batch,
    chunk text rebuilt zero-copy with a ``take`` + ``binary_join`` over the
    flat token values — no per-chunk Python.  Shuffle-free single pass.

    Every doc yields ``ceil(n_tokens / stride)`` chunks (min 1); the last
    chunks may be shorter than ``window``.  Exactly replayable in SQL via
    1-based inclusive list slices (see queries.q_chunk_windows)."""
    import pyarrow.compute as pc

    from ontoea_ray.functions.text import tokenize

    assert stride >= 1 and window >= stride

    def explode(b: pa.Table) -> pa.Table:
        toks = tokenize(b[text_col])
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        n = np.diff(offs)
        n_chunks = (n + stride - 1) // stride
        total_chunks = int(n_chunks.sum())
        row_of_chunk = np.repeat(np.arange(len(n), dtype=np.int64), n_chunks)
        chunk_starts_cum = np.concatenate([[0], np.cumsum(n_chunks)])
        local = np.arange(total_chunks) - chunk_starts_cum[row_of_chunk]
        tok_start = offs[:-1][row_of_chunk] + local * stride
        tok_end = np.minimum(tok_start + window, offs[1:][row_of_chunk])
        lens = tok_end - tok_start
        total_toks = int(lens.sum())
        run_cum = np.concatenate([[0], np.cumsum(lens)])
        idxs = np.repeat(tok_start, lens) + (np.arange(total_toks) - np.repeat(run_cum[:-1], lens))
        values = flat.take(pa.array(idxs))
        chunks_list = pa.ListArray.from_arrays(pa.array(run_cum, pa.int32()), values)
        chunk_text = pc.binary_join(chunks_list, " ")
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(pa.array(row_of_chunk)),
                "chunk_id": pa.array(local),
                "n_tokens": pa.array(lens),
                "chunk": chunk_text,
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )


def rendezvous_assign(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    n_shards: int,
    salt: int = 7_777_777,
    out_col: str = "shard",
) -> ray.data.Dataset:
    """Rendezvous (highest-random-weight) shard assignment: each key goes
    to ``argmax_s splitmix64(key * salt + s)`` over shards ``0..n_shards-1``
    (ties, astronomically rare, to the smallest shard).  The stable-
    partitioning primitive (Thaler & Ravishankar 1998) crawl frontiers and
    shard stores use: adding shard K+1 moves ONLY the ~1/(K+1) of keys
    whose new-shard hash wins — no global reshuffle, unlike modulo
    hashing.  One vectorized splitmix pass per shard, no shuffle at all
    (assignment is a pure row function)."""

    def fn(b: pa.Table) -> pa.Table:
        k = np.asarray(b[key_col].combine_chunks(), np.int64).astype(np.uint64)
        best = np.zeros(len(k), np.int64)
        besth = splitmix64(k * np.uint64(salt))
        for s in range(1, n_shards):
            h = splitmix64(k * np.uint64(salt) + np.uint64(s))
            m = h > besth
            best[m] = s
            besth[m] = h[m]
        return b.append_column(out_col, pa.array(best, pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow")
