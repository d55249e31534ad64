"""Deduplication operators for web-scale training-data pipelines.

All built combiner-first so the only all-to-all exchanges are over partial
(already reduced) tables:

- :func:`exact_dedup` — one shuffle keyed by content, min-id representative.
- :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash + LSH
  banding: shingle -> minhash (vectorized reduceat) -> (band, key, doc)
  explode -> groupby band bucket -> candidate pairs -> exact-Jaccard verify.
- :func:`simhash64` — 64-bit SimHash per document.
- :func:`token_jaccard_pairs` — exact unigram-set Jaccard join (the
  SQL-checkable oracle path; the LSH variant is the 100TB-scale path whose
  candidates are a superset filter of the same verify predicate).

Hot-token candidate groups are the skew risk: group sizes are capped with an
explicit ``max_group`` (hot shingles/bands are dropped with a logged count —
a standard MinHash-LSH guard; a token present in half the corpus carries no
dedup signal but would emit O(n²) pairs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean

_MERSENNE = (1 << 61) - 1


def _fnv_hash_strings(arr: pa.Array) -> np.ndarray:
    """Fully-vectorized 64-bit string hash: FNV-1a over the array's raw
    UTF-8 buffer (max-string-length passes over a shrinking mask — no
    per-string Python) finished with the splitmix64 avalanche.  Equally
    stable/uniform as the md5 backend but ~two orders faster on large
    vocabularies; NOT DuckDB-replayable, so oracle-checked paths keep md5."""
    from ontoea_ray.stages.sampling import SPLITMIX_M1, SPLITMIX_M2

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    offs = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = np.diff(offs)
    starts = offs[:-1]
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    P = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for p in range(int(lens.max())):
            m = lens > p
            h[m] = (h[m] ^ data[starts[m] + p].astype(np.uint64)) * P
        z = (h ^ (h >> np.uint64(30))) * np.uint64(SPLITMIX_M1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(SPLITMIX_M2)
        return z ^ (z >> np.uint64(31))


def _token_hashes(tokens: pa.Array, backend: str | None = None) -> np.ndarray:
    """64-bit stable hashes for a flat token array (unique-dict trick: only
    unique tokens are hashed; the gather back is vectorized).

    Backends (param, else env ``ONTOEA_TOKEN_HASH``, default ``md5``):
    - ``md5`` — first 8 bytes big-endian, NOT blake2b: DuckDB's md5() lets
      the driver oracle reproduce every downstream value bit-for-bit
      (CAST('0x' || substr(md5(t),1,16) AS UBIGINT)).  Python-loop over
      UNIQUE tokens only, the price of bit-replayability.
    - ``fast`` — the vectorized FNV-1a/splitmix mixer
      (:func:`_fnv_hash_strings`) for production runs where no SQL oracle
      replays the values; flips every dedup operator (minhash / simhash /
      jaccard / bloom) off the Python hashing loop."""
    import pyarrow.compute as pc

    if backend is None:
        import os

        backend = os.environ.get("ONTOEA_TOKEN_HASH", "md5")
    uniq = tokens.unique()
    if backend == "fast":
        vals = _fnv_hash_strings(uniq)
    else:
        vals = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in uniq.to_pylist()
            ),
            np.uint64,
            len(uniq),
        )
    idx = pc.index_in(tokens, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
    return vals[idx]


def default_hash_backend() -> str:
    """Token-hash backend from ``ONTOEA_TOKEN_HASH`` (md5 | fast).

    Resolve this ON THE DRIVER when building map_batches closures — worker
    processes do not see env vars set after ``ray.init`` — and pass the
    resolved value down explicitly."""
    import os

    return os.environ.get("ONTOEA_TOKEN_HASH", "md5")


def _shingle_hashes(text_col, n: int = 3, backend: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    """Word-n-gram shingle hashes per row: returns (flat_hashes, row_offsets).

    Rows shorter than n tokens contribute a single whole-row shingle."""
    from ontoea_ray.functions.text import tokenize

    toks = tokenize(text_col)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = _token_hashes(toks.flatten(), backend=backend)
    counts = np.diff(offsets)
    sh_counts = np.maximum(counts - (n - 1), 1)
    out_offsets = np.concatenate([[0], np.cumsum(sh_counts)])
    flat_sh = np.zeros(int(out_offsets[-1]), np.uint64)
    P = np.uint64(0x9E3779B97F4A7C15)
    nf = len(flat)
    # Rolling combine over shifted views of the FLAT token-hash array (the
    # shingle_strings pattern) — no per-row Python loop.  A window starting
    # at flat index i is a valid shingle iff positions i..i+n-1 fall in the
    # same row.
    row_id = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    if nf >= n:
        acc = flat[: nf - n + 1].copy()
        for j in range(1, n):
            acc = acc * P + flat[j : nf - n + 1 + j]
        valid = row_id[: nf - n + 1] == row_id[n - 1 :]
    else:
        acc = np.zeros(0, np.uint64)
        valid = np.zeros(0, bool)
    # Short rows (< n tokens) contribute ONE whole-row fold; at most n-1
    # vectorized passes over the short-row subset.
    short = counts < n
    short_acc = np.full(len(counts), np.uint64(1469598103934665603))
    for k in range(n - 1):
        has_k = short & (counts > k)
        if not has_k.any():
            break
        short_acc[has_k] = short_acc[has_k] * P + flat[offsets[:-1][has_k] + k]
    sh_row = np.repeat(np.arange(len(counts), dtype=np.int64), sh_counts)
    long_slot = counts[sh_row] >= n
    flat_sh[long_slot] = acc[valid]
    flat_sh[~long_slot] = short_acc[short]
    return flat_sh, out_offsets


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_row_signatures(texts, *, num_perm=64, shingle_n=3, seed=42,
                           id_col="doc_id", text_col="text", hash_backend=None):
    """Per-batch minhash: returns a map_batches-compatible callable.

    ``hash_backend`` (default: env, see :func:`default_hash_backend`) is
    resolved HERE, on the driver, and baked into the closure."""
    a, b = _perm_params(num_perm, seed)
    hash_backend = hash_backend or default_hash_backend()

    def fn(batch: pa.Table) -> pa.Table:
        flat_sh, offs = _shingle_hashes(
            batch[text_col].combine_chunks(), shingle_n, backend=hash_backend
        )
        sigs = np.empty((len(batch), num_perm), np.uint64)
        M = np.uint64(_MERSENNE)
        for p in range(num_perm):
            hv = (a[p] * flat_sh + b[p]) % M
            sigs[:, p] = np.minimum.reduceat(hv, offs[:-1])
            empty = offs[:-1] == offs[1:]
            if empty.any():
                sigs[empty, p] = M
        return pa.table(
            {
                id_col: batch[id_col],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).astype(np.int64) & ((1 << 63) - 1), pa.int64()), num_perm
                ),
            }
        )

    return fn


def minhash_signatures(docs: ray.data.Dataset, **kw) -> ray.data.Dataset:
    return docs.map_batches(minhash_row_signatures(docs, **kw), batch_format="pyarrow")


def _pairs_from_bucket_block(
    id_col: str,
    max_group: int | None,
    keys: tuple[str, ...] = ("band", "band_key"),
    distinct: bool = True,
    size_col: str | None = None,
):
    """Blockwise candidate-pair emitter for hash-partitioned bucket rows.

    ``distinct=False`` keeps one pair row PER shared bucket (the Jaccard
    intersection-count path); True dedups within the block (LSH candidates).
    ``max_group=None`` disables the hot-bucket cap (exact-verify path).
    ``size_col`` carries a per-doc size column through to the pairs as
    (sz_a, sz_b) so downstream Jaccard needs no driver-side size lookup.
    """
    extra = ("sz_a", "sz_b") if size_col else ()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        # Fully vectorized segment-pairs kernel: sort rows by (keys, id),
        # find group boundaries, then emit every in-group (i < j) pair with
        # repeat/cumsum index arithmetic — no Python loop over groups (a
        # per-group loop measured 20s on a 5k-doc block with a dense
        # shared-shingle graph; this kernel does the same block in <1s).
        is_str = df[id_col].dtype.kind not in "iu"
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=object if is_str else np.int64),
                "id_b": pd.Series([], dtype=object if is_str else np.int64),
                **{c: pd.Series([], dtype=np.int64) for c in extra},
            }
        )
        if df.empty:
            return empty
        key_arrays = [df[k].to_numpy() for k in keys]
        codes = [
            a if a.dtype.kind in "iu" else pd.factorize(a)[0] for a in key_arrays
        ]
        if is_str:
            # string ids: sorted-unique inverse codes preserve lexicographic
            # order, so in-group pair orientation (id_a < id_b) matches the
            # integer path exactly; codes map back at emission
            id_uniq, ids = np.unique(
                df[id_col].to_numpy(object).astype(str), return_inverse=True
            )
            ids = ids.astype(np.int64)
        else:
            ids = df[id_col].to_numpy(np.int64)
        order = np.lexsort((ids, *reversed(codes)))
        codes_s = [c[order] for c in codes]
        ids_s = ids[order]
        sz_s = df[size_col].to_numpy(np.int64)[order] if size_col else None
        n = len(ids_s)
        newgrp = np.zeros(n, bool)
        newgrp[0] = True
        for c in codes_s:
            newgrp[1:] |= c[1:] != c[:-1]
        gid = np.cumsum(newgrp) - 1
        row_sz = np.bincount(gid)[gid]
        keep = row_sz >= 2
        if max_group is not None:
            hot = row_sz > max_group
            keep &= ~hot
            if hot.any():
                # no-silent-caps rule: a dropped hub bucket is a coverage
                # decision, not an implementation detail — surface it
                import logging

                n_hot = int(np.unique(gid[hot]).size)
                logging.getLogger(__name__).warning(
                    "dropped %d hot bucket(s) over max_group=%d "
                    "(largest=%d members; %d rows skipped)",
                    n_hot, max_group, int(row_sz[hot].max()), int(hot.sum()),
                )
        if not keep.any():
            return empty
        ids_s, gid = ids_s[keep], gid[keep]
        if size_col:
            sz_s = sz_s[keep]
        newg = np.ones(len(gid), bool)
        newg[1:] = gid[1:] != gid[:-1]
        g2 = np.cumsum(newg) - 1
        cnt = np.bincount(g2)
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        local_i = np.arange(len(g2)) - starts[g2]
        rep = cnt[g2] - 1 - local_i  # pairs where this row is the 'a' side
        total = int(rep.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(len(g2)), rep)
        runstart = np.concatenate([[0], np.cumsum(rep)[:-1]])
        off = np.arange(total) - np.repeat(runstart, rep)
        b_idx = a_idx + 1 + off
        if is_str:
            cols = {"id_a": id_uniq[ids_s[a_idx]], "id_b": id_uniq[ids_s[b_idx]]}
        else:
            cols = {"id_a": ids_s[a_idx], "id_b": ids_s[b_idx]}
        if size_col:
            cols["sz_a"] = sz_s[a_idx]
            cols["sz_b"] = sz_s[b_idx]
        out = pd.DataFrame(cols)
        return out.drop_duplicates() if distinct else out

    return emit


def lsh_candidate_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 200,
    hash_backend: str | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH candidate pairs: (id_a, id_b) with id_a < id_b.

    signatures -> explode to (band, band_key, doc) -> groupby bucket ->
    pairwise within bucket (capped at max_group) -> distinct pairs.
    """
    assert num_perm % bands == 0
    r = num_perm // bands
    sig_fn = minhash_row_signatures(docs, num_perm=num_perm, shingle_n=shingle_n,
                                    seed=seed, id_col=id_col, text_col=text_col,
                                    hash_backend=hash_backend)

    def explode_bands(batch: pa.Table) -> pa.Table:
        sigs_tbl = sig_fn(batch)
        ids = np.asarray(sigs_tbl[id_col].to_pylist(), np.int64)
        sig = np.asarray(sigs_tbl["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(len(ids), num_perm)
        out_id, out_band, out_key = [], [], []
        P = np.uint64(0x100000001B3)
        for bnd in range(bands):
            chunk = sig[:, bnd * r : (bnd + 1) * r].astype(np.uint64)
            acc = np.full(len(ids), np.uint64(1469598103934665603))
            for j in range(r):
                acc = (acc ^ chunk[:, j]) * P
            out_id.append(ids)
            out_band.append(np.full(len(ids), bnd, np.int64))
            out_key.append(acc.astype(np.int64) & ((1 << 63) - 1))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "band": pa.array(np.concatenate(out_band), pa.int64()),
                "band_key": pa.array(np.concatenate(out_key), pa.int64()),
            }
        )

    buckets = docs.map_batches(explode_bands, batch_format="pyarrow")

    from ontoea_ray.functions.shuffle import compact, with_partition_key  # noqa: F401

    # Co-locate buckets via an explicit pkey = hash(band_key) % width column
    # and group by THAT: map_groups then runs once per partition (width
    # calls total), and pair generation inside is one vectorized pandas pass
    # — no per-bucket task, no hash-shuffle actor fleet.
    parted = with_partition_key(buckets, ["band", "band_key"])
    pairs = parted.groupby("pkey").map_groups(
        _pairs_from_bucket_block(id_col, max_group), batch_format="pandas"
    )

    def partial_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return _from_pandas_clean(df)

    pairs = pairs.map_batches(partial_distinct, batch_format="pyarrow")
    from ontoea_ray.functions.shuffle import keyed_aggregate

    distinct = keyed_aggregate(pairs, ["id_a", "id_b"], count_alias="_c")
    return distinct.drop_columns(["_c"])


def lsh_near_duplicates(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 200,
    hash_backend: str | None = None,
) -> ray.data.Dataset:
    """MinHash-LSH candidates VERIFIED by exact shingle Jaccard: output
    pairs all satisfy jaccard >= threshold (precision 1.0); recall follows
    the banding S-curve (1-(1-t^r)^b; near 1.0 for t >= ~0.9 at 16x4).

    Fully distributed verify: the corpus is semi-joined (streaming id-set
    filter; the id array is assembled inside a Ray task and lives in the
    object store, never on the driver) down to candidate-involved docs,
    exact Jaccard runs over those via the shingle-co-occurrence machinery
    (sizes carried with the pairs — no driver state), and the result is
    intersected with the candidate set by a partition-key co-located
    group join.  No ``take_all`` on candidate pairs anywhere.
    """
    import ray as _ray

    pairs = lsh_candidate_pairs(
        docs, num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        id_col=id_col, text_col=text_col, max_group=max_group,
        hash_backend=hash_backend,
    ).materialize()
    if pairs.count() == 0:
        return pairs

    @_ray.remote
    def _involved_ids(*tbls: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        # groupby(pkey).map_groups emits a zero-column block for an empty
        # partition; skip those before concat (schema mismatch otherwise)
        t = pa.concat_tables([x for x in tbls if x.num_columns > 0])
        both = pa.chunked_array(t["id_a"].chunks + t["id_b"].chunks)
        uniq = pc.unique(both)
        return uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq

    inv_ref = _involved_ids.remote(*pairs.to_arrow_refs())

    def keep_involved(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch[id_col].combine_chunks(), value_set=_ray.get(inv_ref)))

    involved_docs = docs.map_batches(keep_involved, batch_format="pyarrow")
    # Exact verify: no hot-bucket cap (precision must be exact); the input
    # here is already candidate-involved docs, so group sizes are bounded
    # by the candidate structure, not corpus-wide hub shingles.
    exact = _exact_jaccard_core(
        involved_docs, threshold=threshold, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col, max_group=None,
    )
    return _pair_semijoin(exact, pairs)


def _pair_semijoin(left: ray.data.Dataset, right: ray.data.Dataset) -> ray.data.Dataset:
    """Rows of ``left`` whose (id_a, id_b) also appear in ``right`` — a
    distributed semi-join via partition-key co-location (both sides are
    pair-sized tables; the corpus is never shuffled)."""
    from ontoea_ray.functions.shuffle import with_partition_key

    def tag(src: int):
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(["id_a", "id_b"])
            return batch.append_column("_src", pa.array(np.full(len(batch), src, np.int8)))

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def keep_in_both(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64), "id_b": pd.Series([], dtype=np.int64)})
        ok = df.groupby(["id_a", "id_b"], sort=False)["_src"].transform("nunique") == 2
        return df.loc[ok & (df["_src"] == 0), ["id_a", "id_b"]]

    parted = with_partition_key(both, ["id_a", "id_b"])
    return parted.groupby("pkey").map_groups(keep_in_both, batch_format="pandas")


def exact_dedup(docs: ray.data.Dataset, *, key_col: str = "text", id_col: str = "doc_id") -> ray.data.Dataset:
    """Representative (min id) per distinct key — combiner then one groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: batch[key_col].to_pandas(), id_col: batch[id_col].to_pandas()})
        part = df.groupby(key_col, sort=False)[id_col].min().reset_index()
        return _from_pandas_clean(part)

    from ray.data.aggregate import Min

    from ontoea_ray.functions.shuffle import compact

    partials = docs.select_columns([key_col, id_col]).map_batches(partial, batch_format="pyarrow")
    return compact(partials).groupby(key_col).aggregate(Min(id_col, alias_name=id_col))


def simhash64_kernel(batch: pa.Table, *, id_col="doc_id", text_col="text", backend=None) -> pa.Table:
    """64-bit SimHash over unigram token hashes (majority vote per bit).
    Module-level so tests can pin golden values without a Dataset."""
    from ontoea_ray.functions.text import tokenize

    import pyarrow.compute as pc

    toks = tokenize(batch[text_col].combine_chunks())
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_toks = toks.flatten()
    counts = np.diff(offs)
    n_rows = len(counts)
    uniq = flat_toks.unique()
    n_uniq = len(uniq)
    if n_uniq * max(n_rows, 1) <= (1 << 26):
        # small-vocab fast path: per-row unique-token occurrence matrix @
        # unique bit matrix (BLAS) instead of materializing a |tokens|x64
        # bit matrix (the latter moves ~GBs for long corpora)
        h_uniq = _token_hashes(uniq, backend=backend)
        bits_uniq = (
            (h_uniq[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.float64)
        idx = pc.index_in(flat_toks, value_set=uniq).to_numpy(zero_copy_only=False).astype(np.int64)
        row_id = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        occ = np.bincount(row_id * n_uniq + idx, minlength=n_rows * n_uniq).reshape(
            n_rows, n_uniq
        ).astype(np.float64)
        ones = np.rint(occ @ bits_uniq).astype(np.int64)  # per-row count of 1-bits
        per_row = 2 * ones - counts[:, None]
    else:
        flat = _token_hashes(flat_toks, backend=backend)
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        contrib = 2 * bits - 1
        csum = np.concatenate([np.zeros((1, 64), np.int64), np.cumsum(contrib, axis=0)])
        per_row = csum[offs[1:]] - csum[offs[:-1]]
    sh = (per_row > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
    return pa.table(
        {
            id_col: batch[id_col],
            "simhash": pa.array((sh.astype(np.int64) & ((1 << 63) - 1)), pa.int64()),
        }
    )


def simhash64(docs: ray.data.Dataset, *, id_col="doc_id", text_col="text",
              hash_backend=None) -> ray.data.Dataset:
    import functools

    return docs.map_batches(
        functools.partial(simhash64_kernel, id_col=id_col, text_col=text_col,
                          backend=hash_backend or default_hash_backend()),
        batch_format="pyarrow",
    )


def shingle_strings(text_col, id_vals: np.ndarray, n: int) -> pd.DataFrame:
    """Distinct (id, shingle-string) rows for word n-grams, vectorized:
    shingles come from joining shifted views of the flat token array; rows
    with fewer than n tokens contribute the whole text as one shingle."""
    import pyarrow.compute as pc

    from ontoea_ray.functions.text import tokenize

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = tokenize(text_col)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    flat = toks.flatten()
    if n == 1:
        df = pd.DataFrame({"id": np.repeat(id_vals, counts), "shingle": flat.to_pandas()})
        return df.drop_duplicates()
    row_id = np.repeat(np.arange(len(counts)), counts)
    nf = len(flat)
    if nf >= n:
        parts = [flat.slice(j, nf - n + 1) for j in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        valid = row_id[: nf - n + 1] == row_id[n - 1 :]
        sh = pd.DataFrame(
            {"id": id_vals[row_id[: nf - n + 1][valid]], "shingle": joined.to_pandas()[valid]}
        )
    else:
        sh = pd.DataFrame({"id": [], "shingle": []})
    short = counts < n
    if short.any():
        whole = pd.DataFrame({"id": id_vals[short], "shingle": pd.Series(text_col.to_pandas())[short]})
        sh = pd.concat([sh, whole], ignore_index=True)
    sh["id"] = sh["id"].astype(np.int64)
    return sh.drop_duplicates()


def jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 1000,
) -> ray.data.Dataset:
    """Exact shingle-set Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Explode distinct shingles -> groupby shingle -> pairwise co-occurrence
    counts -> |A∩B| / (|A|+|B|-|A∩B|).  SQL-expressible, so it carries a
    DuckDB oracle; MinHash-LSH is the approximate scale path whose candidate
    set this operator verifies.
    """
    return _exact_jaccard_core(
        docs, threshold=threshold, shingle_n=shingle_n,
        id_col=id_col, text_col=text_col, max_group=max_group,
    )


def containment_pairs(
    docs: ray.data.Dataset,
    *,
    threshold_milli: int = 500,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 1000,
) -> ray.data.Dataset:
    """Shingle-set CONTAINMENT near-dup pairs (Broder 1997's other measure):
    ``cont_milli = 1000 * |A∩B| // min(|A|, |B|)`` — catches a document
    embedded inside a larger one (quote farms, boilerplate-wrapped
    reposts), which symmetric Jaccard misses because the union term drowns
    the small side.  Integer milli-units so the oracle hashes exactly.
    Returns (id_a, id_b, cont_milli) with id_a < id_b, cont >= threshold."""
    inter = _pair_intersections(
        docs, shingle_n=shingle_n, id_col=id_col, text_col=text_col,
        max_group=max_group,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        mn = np.minimum(df["sz_a"].to_numpy(np.int64), df["sz_b"].to_numpy(np.int64))
        cont = 1000 * df["inter"].to_numpy(np.int64) // np.maximum(mn, 1)
        df["cont_milli"] = cont
        return _from_pandas_clean(
            df.loc[cont >= threshold_milli, ["id_a", "id_b", "cont_milli"]]
        )

    return inter.map_batches(finalize, batch_format="pyarrow")


def _exact_jaccard_core(
    docs: ray.data.Dataset,
    *,
    threshold: float,
    shingle_n: int,
    id_col: str,
    text_col: str,
    max_group: int | None,
) -> ray.data.Dataset:
    """Exact-Jaccard finalize over :func:`_pair_intersections` (shared with
    the LSH verify step)."""
    inter = _pair_intersections(
        docs, shingle_n=shingle_n, id_col=id_col, text_col=text_col,
        max_group=max_group,
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        na = df["sz_a"].to_numpy(np.float64)
        nb = df["sz_b"].to_numpy(np.float64)
        it = df["inter"].to_numpy(np.float64)
        jac = it / (na + nb - it)
        keep = jac >= threshold
        return _from_pandas_clean(df.loc[keep, ["id_a", "id_b"]])

    return inter.map_batches(finalize, batch_format="pyarrow")


def _pair_intersections(
    docs: ray.data.Dataset,
    *,
    shingle_n: int,
    id_col: str,
    text_col: str,
    max_group: int | None,
) -> ray.data.Dataset:
    """Distributed shingle-set pair machinery shared by Jaccard and
    containment: -> (id_a, id_b, sz_a, sz_b, inter).  Per-doc set sizes are
    computed during the shingle explode (each doc's text is one row, so its
    full distinct set is in-batch) and carried WITH the pairs as
    (sz_a, sz_b) — no driver-side size dict, no second pass over the
    corpus."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        df = shingle_strings(batch[text_col], ids, shingle_n)
        df["sz"] = df.groupby("id", sort=False)["shingle"].transform("size").astype(np.int64)
        df = df.rename(columns={"id": id_col, "shingle": "token"})
        return _from_pandas_clean(df)

    tok_rows = docs.map_batches(explode, batch_format="pyarrow")

    from ontoea_ray.functions.shuffle import compact, with_partition_key

    parted = with_partition_key(tok_rows, ["token"])
    pair_rows = parted.groupby("pkey").map_groups(
        _pairs_from_bucket_block(id_col, max_group, keys=("token",), distinct=False, size_col="sz"),
        batch_format="pandas",
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        part = (
            df.groupby(["id_a", "id_b", "sz_a", "sz_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        return _from_pandas_clean(part)

    # Merge the partials with a pkey-co-located vectorized groupby, NOT the
    # engine-level multi-key sort aggregate: Ray's sort-based aggregate on a
    # 4-column key measured 21s on 1.3M rows / 1.1M groups (per-key Python
    # comparisons); one int-hash exchange + per-partition pandas sum does
    # the same in ~1s and moves the same bytes.
    parts = compact(pair_rows.map_batches(partial_counts, batch_format="pyarrow"))
    parted2 = with_partition_key(parts, ["id_a", "id_b"])

    def merge_counts(df: pd.DataFrame) -> pa.Table:
        out = (
            df.groupby(["id_a", "id_b", "sz_a", "sz_b"], sort=False)["inter"]
            .sum()
            .reset_index()
        )
        return _from_pandas_clean(out)

    return parted2.groupby("pkey").map_groups(merge_counts, batch_format="pandas")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR; public-domain bit trick,
    Hacker's Delight fig. 5-2) — numpy has no popcount kernel."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


# 63 stored SimHash bits cut into 4 bands (16/16/16/15): Hamming <= 3 over
# the whole word pigeonholes into "at least one band identical"
_SIMHASH_BANDS = ((0, 16), (16, 16), (32, 16), (48, 15))


def simhash_neardup_pairs(
    docs: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 4096,
    width: int | None = None,
) -> ray.data.Dataset:
    """SimHash near-duplicate PAIRS (id_a < id_b, Hamming(sig) <= 3): the
    classic web-dedup blocking of Manku/Jain/Das Sarma (WWW 2007) — split
    the signature into max_hamming+1 bands, pairs within distance bound
    must agree on >= 1 band (pigeonhole), so candidates come from ONE
    band-keyed co-location instead of all-pairs; every candidate is then
    popcount-VERIFIED, so precision is exact.  Scale: the explode is
    4 rows/doc, groups are capped (``max_group``; a band value shared by
    half the corpus carries no signal but would emit O(g²) candidates),
    and the final pair distinct is one keyed merge."""
    import pandas as pd

    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    sigs = simhash64(docs, id_col=id_col, text_col=text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        sh = np.asarray(batch["simhash"].to_numpy(zero_copy_only=False), np.int64).view(np.uint64)
        bands, keys, out_ids, out_sig = [], [], [], []
        for bi, (lo, nbits) in enumerate(_SIMHASH_BANDS):
            bands.append(np.full(len(ids), bi, np.int64))
            keys.append(((sh >> np.uint64(lo)) & np.uint64((1 << nbits) - 1)).astype(np.int64))
            out_ids.append(ids)
            out_sig.append(sh.view(np.int64))
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands)),
                "key": pa.array(np.concatenate(keys)),
                id_col: pa.array(np.concatenate(out_ids)),
                "simhash": pa.array(np.concatenate(out_sig)),
            }
        )

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    parted = with_partition_key(exploded, ["band", "key"], width=width)

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(["band", "key"], sort=False):
            g = g.drop_duplicates(id_col)
            if len(g) < 2 or len(g) > max_group:
                continue
            ids = g[id_col].to_numpy(np.int64)
            sh = g["simhash"].to_numpy(np.int64)
            order = np.argsort(ids)
            ids, sh = ids[order], sh[order]
            ii, jj = np.triu_indices(len(ids), k=1)
            d = popcount64(np.bitwise_xor(sh[ii].view(np.uint64), sh[jj].view(np.uint64)))
            ok = d <= max_hamming
            if ok.any():
                outs.append(
                    pd.DataFrame({"id_a": ids[ii][ok], "id_b": ids[jj][ok], "hamming": d[ok]})
                )
        if not outs:
            return pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(outs, ignore_index=True).drop_duplicates(["id_a", "id_b"])

    pairs = parted.groupby("pkey").map_groups(pairs_in_partition, batch_format="pandas")
    return keyed_aggregate(pairs, ["id_a", "id_b"], mins=["hamming"], width=width)


def cross_doc_dup_spans(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int | None = None,
) -> ray.data.Dataset:
    """Per-document CROSS-document duplicated-span statistics — the
    token-window form of exact-substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): a window is
    duplicated if the identical n-token span occurs in ANY other document.
    Complements :func:`exact_dedup` (whole-doc) and q_repetition
    (WITHIN-doc 3-gram repetition).

    Returns (doc_id, n_distinct, n_dup, dup_milli): distinct n-gram spans
    per doc, how many of them are cross-doc duplicated, and the integer
    milli fraction.  Rows shorter than n tokens count their whole text as
    one span (same convention as the repetition/Jaccard shingles).

    Plan (combiner-first, one span-keyed exchange): in-batch DISTINCT
    (doc, span) explode with the per-doc distinct count carried on each
    row -> span-partitioned doc-frequency groups emit one (doc, dup-flag)
    row per member -> per-doc keyed sum.  The exchange carries distinct
    (doc, span) rows — never raw windows — and no state sits on the
    driver."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks(), np.int64)
        df = shingle_strings(batch[text_col], ids, n)
        df["sz"] = df.groupby("id", sort=False)["shingle"].transform("size").astype(np.int64)
        df = df.rename(columns={"id": id_col, "shingle": "span"})
        return _from_pandas_clean(df)

    rows = docs.map_batches(explode, batch_format="pyarrow")
    parted = with_partition_key(rows, ["span"], width=width)

    def flag_dups(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return _from_pandas_clean(
                pd.DataFrame({
                    id_col: pd.Series([], dtype=np.int64),
                    "sz": pd.Series([], dtype=np.int64),
                    "dup": pd.Series([], dtype=np.int64),
                })
            )
        # (doc, span) rows are distinct, so group size == doc frequency
        g = df.groupby("span", sort=False)[id_col].transform("size")
        out = pd.DataFrame({
            id_col: df[id_col].to_numpy(np.int64),
            "sz": df["sz"].to_numpy(np.int64),
            "dup": (g.to_numpy(np.int64) >= 2).astype(np.int64),
        })
        return _from_pandas_clean(out)

    flagged = parted.groupby("pkey").map_groups(flag_dups, batch_format="pandas")
    agg = keyed_aggregate(
        flagged, [id_col], sums=["dup"], mins=["sz"], width=width
    )

    def finalize(b: pa.Table) -> pa.Table:
        nd = np.asarray(b["sz"].combine_chunks(), np.int64)
        dup = np.asarray(b["dup"].combine_chunks(), np.int64)
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().cast(pa.int64()),
                "n_distinct": pa.array(nd),
                "n_dup": pa.array(dup),
                "dup_milli": pa.array((1000 * dup) // nd),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _tile_rows(text, n: int):
    """Vectorized non-overlapping n-token tile cut over a string column:
    returns ``(row_positions, tile_idx, tile_strings)`` as numpy arrays,
    where ``row_positions`` index back into the batch (callers gather
    whatever per-row columns they carry).  Full tiles are cut from the
    same windowed join the shingle kernel uses (no per-token Python);
    each row's trailing ``len % n`` tokens form one short tile (the whole
    row when it has fewer than n tokens)."""
    import pyarrow.compute as pc

    from ontoea_ray.functions.text import tokenize

    toks = tokenize(text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    flat = toks.flatten()
    nf = len(flat)
    row_id = np.repeat(np.arange(len(counts)), counts)
    out_row, out_idx, out_tile = [], [], []
    if nf >= n:
        parts = [flat.slice(j, nf - n + 1) for j in range(n)]
        joined = pc.binary_join_element_wise(*parts, " ")
        starts = np.arange(nf - n + 1)
        srow = row_id[: nf - n + 1]
        rel = starts - offs[srow]
        pick = (srow == row_id[n - 1 :]) & (rel % n == 0)
        out_row.append(srow[pick])
        out_idx.append(rel[pick] // n)
        out_tile.append(joined.to_pandas()[pick].to_numpy())
    rem = counts % n
    if rem.any():
        pos = np.arange(nf) - offs[row_id]
        sel = (pos >= (counts[row_id] // n) * n) & (rem[row_id] != 0)
        part = pd.DataFrame({"r": row_id[sel], "tok": flat.to_pandas()[sel]})
        joined_part = part.groupby("r", sort=True)["tok"].agg(" ".join)
        rows = joined_part.index.to_numpy()
        out_row.append(rows)
        out_idx.append(counts[rows] // n)
        out_tile.append(joined_part.to_numpy())
    if not out_row:
        return (
            np.array([], np.int64),
            np.array([], np.int64),
            np.array([], object),
        )
    return (
        np.concatenate(out_row).astype(np.int64),
        np.concatenate(out_idx).astype(np.int64),
        np.concatenate(out_tile),
    )


def boilerplate_tiles(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    width: int | None = None,
) -> ray.data.Dataset:
    """Per-group (domain / crawl-source) template-tile detection — the
    boilerplate-discovery half of CCNet-style cleaning: an n-token tile
    that appears in >= ``min_docs`` DISTINCT documents of the same group
    is template text (nav bars, footers, legal blurbs), not content.
    Returns ``(group, tile, n_docs, share_milli)`` with
    ``share_milli = 1000 * n_docs // group_doc_total`` (integer-exact).

    Distinct from :func:`dedup_tiles` (which REMOVES global duplicates at
    all but the first occurrence): this builds the per-domain boilerplate
    TABLE — the artifact a cleaning pass broadcasts to strip template
    lines, and a per-site quality signal in its own right.

    Plan (combiner-first): in-batch distinct (group, tile, doc) explode
    collapses straight to per-batch (group, tile) partial doc-counts (a
    doc's text lives in one row, so in-batch distinct is globally
    distinct); one keyed exchange sums them; the ``min_docs`` filter
    applies BEFORE the totals join so only repeated tiles (usually a
    vanishing fraction) ride it; per-group doc totals reduce combiner-
    first to a domain-vocabulary-sized table routed through the join
    planner (auto-broadcast under budget)."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks(), np.int64)
        grp = batch[group_col].combine_chunks().to_pandas().to_numpy()
        rows, _, tiles = _tile_rows(batch[text_col], n)
        df = pd.DataFrame({group_col: grp[rows], "tile": tiles, "_d": ids[rows]})
        df = df.drop_duplicates([group_col, "tile", "_d"])
        partial = (
            df.groupby([group_col, "tile"], sort=False)
            .size()
            .reset_index(name="n_docs")
        )
        partial["n_docs"] = partial["n_docs"].astype(np.int64)
        return _from_pandas_clean(partial)

    partials = docs.map_batches(explode, batch_format="pyarrow")
    cnt = keyed_aggregate(partials, [group_col, "tile"], sums=["n_docs"], width=width)
    rep = cnt.map_batches(
        lambda b: b.filter(
            pc.greater_equal(b["n_docs"].combine_chunks(), pa.scalar(min_docs, pa.int64()))
        ),
        batch_format="pyarrow",
    )

    def per_group(batch: pa.Table) -> pa.Table:
        vc = batch[group_col].combine_chunks().value_counts()
        return pa.table(
            {
                group_col: vc.field("values"),
                "n_total": vc.field("counts").cast(pa.int64()),
            }
        )

    tot = keyed_aggregate(
        docs.select_columns([group_col]).map_batches(per_group, batch_format="pyarrow"),
        [group_col],
        sums=["n_total"],
        width=width,
    )
    joined = hash_join(rep, tot, on=[group_col], width=width)

    def finalize(b: pa.Table) -> pa.Table:
        nd = np.asarray(b["n_docs"].combine_chunks(), np.int64)
        ntot = np.asarray(b["n_total"].combine_chunks(), np.int64)
        return pa.table(
            {
                group_col: b[group_col].combine_chunks(),
                "tile": b["tile"].combine_chunks(),
                "n_docs": pa.array(nd),
                "share_milli": pa.array((1000 * nd) // ntot),
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


def dedup_tiles(
    docs: ray.data.Dataset,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int | None = None,
) -> ray.data.Dataset:
    """Cross-document duplicated-TILE removal — exact-substring dedup in
    the spirit of Lee et al. (ACL 2022), simplified to NON-overlapping
    n-token tiles so the transform is deterministic and SQL-replayable:
    each doc is chunked into consecutive n-token tiles (last tile may be
    short), a tile whose exact content occurs anywhere else in the corpus
    is kept only at its global first occurrence (lexicographic min
    (doc_id, tile_idx)), and each doc's surviving tiles are re-joined in
    order.

    Returns (doc_id, clean_text, n_tiles, n_dropped).

    Plan: vectorized tile explode (tiles cut from the same windowed join
    the shingle kernel uses — no per-token Python for full tiles) ->
    tile-keyed exchange flags first occurrences -> doc-keyed exchange
    reassembles.  The exchanges carry each doc's text ~once (tiles do not
    overlap, unlike shingles) and nothing lands on the driver."""
    from ontoea_ray.functions.shuffle import with_partition_key

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].combine_chunks(), np.int64)
        rows, idx, tiles = _tile_rows(batch[text_col], n)
        return pa.table(
            {
                id_col: pa.array(ids[rows], pa.int64()),
                "tile_idx": pa.array(idx, pa.int64()),
                "tile": pa.array(tiles, pa.string()),
            }
        )

    tiles = docs.map_batches(explode, batch_format="pyarrow")
    by_tile = with_partition_key(tiles, ["tile"], width=width)

    def flag(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "tile_idx": pa.array([], pa.int64()),
                    "tile": pa.array([], pa.string()),
                    "keep": pa.array([], pa.int64()),
                }
            )
        doc = df[id_col].to_numpy(np.int64)
        idx = df["tile_idx"].to_numpy(np.int64)
        fdoc = df.groupby("tile", sort=False)[id_col].transform("min").to_numpy(np.int64)
        k = np.where(doc == fdoc, idx, np.iinfo(np.int64).max)
        fidx = (
            pd.Series(k)
            .groupby(df["tile"].to_numpy(), sort=False)
            .transform("min")
            .to_numpy(np.int64)
        )
        keep = ((doc == fdoc) & (idx == fidx)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(doc),
                "tile_idx": pa.array(idx),
                "tile": df["tile"].to_numpy(),
                "keep": pa.array(keep),
            }
        )

    flagged = by_tile.groupby("pkey").map_groups(flag, batch_format="pandas")
    by_doc = with_partition_key(flagged, [id_col], width=width)

    def rebuild(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_tiles": pa.array([], pa.int64()),
                    "n_dropped": pa.array([], pa.int64()),
                }
            )
        df = df.sort_values([id_col, "tile_idx"], kind="mergesort")
        g = df.groupby(id_col, sort=True)
        n_tiles = g.size()
        n_dropped = n_tiles - g["keep"].sum()
        kept = df[df["keep"] == 1]
        clean = kept.groupby(id_col, sort=True)["tile"].agg(" ".join)
        clean = clean.reindex(n_tiles.index, fill_value="")
        return pa.table(
            {
                id_col: pa.array(n_tiles.index.to_numpy(np.int64)),
                "clean_text": pa.array(clean.to_numpy(), pa.string()),
                "n_tiles": pa.array(n_tiles.to_numpy(np.int64)),
                "n_dropped": pa.array(n_dropped.to_numpy(np.int64)),
            }
        )

    return by_doc.groupby("pkey").map_groups(rebuild, batch_format="pandas")


# per-worker-process cache for the prefix-jaccard verify index: plain map
# tasks reuse worker processes, so a module-level slot gives actor-style
# build-once reuse without paying actor-pool startup.  BOUNDED: one slot
# per family ("df" frame / "idx" verify index) — inserting a new ref evicts
# the family's previous entry, so repeated executions in one long-lived
# session (bench loops, budget-path re-runs) cannot grow worker memory.
_PJ_INDEX_CACHE: dict = {}


def _pj_cache_put(family: str, key: tuple, value):
    for stale in [k for k in _PJ_INDEX_CACHE if k[0] == family and k != key]:
        del _PJ_INDEX_CACHE[stale]
    _PJ_INDEX_CACHE[key] = value


def prefix_jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    threshold_milli: int = 500,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 1000,
) -> ray.data.Dataset:
    """EXACT shingle-set Jaccard join by PREFIX FILTERING (Chaudhuri et
    al. 2006 / PPJoin, Xiao et al. 2008) — the third set-similarity join
    strategy next to all-pairs (`jaccard_pairs`) and approximate LSH:
    order every document's distinct n-gram shingles by ascending global document
    frequency (rarest first, ties by token), keep only the first
    ``sz − ceil(t·sz) + 1`` as its PREFIX, and enumerate candidate pairs
    only from shared PREFIX tokens — any pair with Jaccard ≥ t provably
    shares one, so the filter is lossless while skipping the stop-word
    buckets that dominate the naive token join.  Candidates are then
    verified exactly against the two docs' full sorted token sets.

    Integer threshold: keep iff ``(1000+thr)·|A∩B| ≥ thr·(|A|+|B|)``
    (equivalent to J ≥ thr/1000), so the DuckDB oracle — the PLAIN exact
    join, deliberately not the prefix plan — value-checks losslessness.

    Shuffle shape: one token-df exchange, one doc co-location for the
    prefix mark, one PREFIX-token exchange for candidates (the big win:
    prefix tokens are the rare ones), then candidate-keyed joins shipping
    the two token lists per surviving pair.  The per-pair verify is a
    sorted-array intersect over the CANDIDATE set only — candidate-sized,
    never corpus-sized.
    """

    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    thr = threshold_milli

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        df = shingle_strings(batch[text_col], ids, shingle_n)
        df = df.rename(columns={"id": id_col, "shingle": "token"})
        df["sz"] = df.groupby(id_col, sort=False)["token"].transform("size").astype(np.int64)
        return _from_pandas_clean(df)

    rows = docs.map_batches(explode, batch_format="pyarrow")
    dfreq = keyed_aggregate(
        rows.map_batches(
            lambda b: pa.table({"token": b["token"]}), batch_format="pyarrow"
        ),
        ["token"],
        count_alias="df",
    )

    # prefix length: sz - ceil(thr/1000 * sz) + 1, integer:
    # ceil(thr*sz/1000) = (thr*sz + 999) // 1000
    def _mark(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([id_col, "df", "token"], kind="mergesort")
        sz = g["sz"].to_numpy(np.int64)
        ids = g[id_col].to_numpy(np.int64)
        n = len(ids)
        if n == 0:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype=np.int64),
                        "token": pd.Series([], dtype=object),
                        "sz": pd.Series([], dtype=np.int64),
                    }
                )
            )
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        seg = np.repeat(np.arange(len(starts)), np.diff(np.r_[starts, n]))
        rnk = np.arange(n) - starts[seg]
        plen = sz - ((thr * sz + 999) // 1000) + 1
        keep = rnk < plen
        out = g.loc[keep, [id_col, "token", "sz"]]
        return _from_pandas_clean(out)

    # budget switch on the document-frequency table (vocabulary-sized):
    # under budget it ships once per actor and the prefix mark is BATCH-
    # LOCAL (each doc's shingles are born in one explode batch, and the
    # in-batch pandas merge preserves that locality) — zero exchange
    # between the corpus and the candidate stage; above budget the mark
    # runs the df hash-join + doc-keyed co-location exchange plan
    from ontoea_ray.functions.broadcast import assemble_table_ref

    dfreq, dfref = assemble_table_ref(dfreq)
    if dfref is not None:

        def prefix_batch(b: pa.Table) -> pa.Table:
            g = pd.DataFrame(
                {
                    id_col: np.asarray(b[id_col].to_pylist(), np.int64),
                    "token": np.asarray(b["token"].combine_chunks(), object),
                    "sz": np.asarray(b["sz"].combine_chunks(), np.int64),
                }
            )
            # per-process cache: the vocab-sized Arrow->pandas conversion
            # must happen once per worker, not once per batch
            key = ("df", dfref.hex() if hasattr(dfref, "hex") else id(dfref))
            dtab = _PJ_INDEX_CACHE.get(key)
            if dtab is None:
                dtab = ray.get(dfref).to_pandas()
                _pj_cache_put("df", key, dtab)
            return _mark(g.merge(dtab, on="token", how="left", sort=False))

        prefix = rows.map_batches(prefix_batch, batch_format="pyarrow")
    else:
        joined = hash_join(rows, dfreq, on=["token"])
        parted = with_partition_key(joined, [id_col])
        prefix = parted.groupby("pkey").map_groups(_mark, batch_format="pandas")

    cand_raw = with_partition_key(prefix, ["token"]).groupby("pkey").map_groups(
        _pairs_from_bucket_block(
            id_col, max_group, keys=("token",), distinct=True, size_col="sz"
        ),
        batch_format="pandas",
    )
    cand = keyed_aggregate(
        cand_raw, ["id_a", "id_b"], maxs=["sz_a", "sz_b"]
    )

    # --- verify: intersect INTEGER shingle hashes, not strings ----------
    # 64-bit hashes make the per-pair intersection a C-speed int64 merge
    # and cut the shipped bytes ~3x vs 3-gram strings.  EXACTNESS is kept
    # by construction, not assumption: the hash is asserted INJECTIVE over
    # this corpus's (vocabulary-sized) distinct-shingle table before any
    # verify result is produced — a collision raises instead of silently
    # breaking the exact-join contract the oracle value-checks.
    def lists(batch: pa.Table) -> pa.Table:
        # sorted-distinct hash list per doc, fully vectorized: hashed
        # (id, shingle) rows sort once, list offsets come from the id runs
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        df = shingle_strings(batch[text_col], ids, shingle_n)
        hv = _token_hashes(
            pa.array(df["shingle"].to_numpy(object), pa.string()), backend="fast"
        ).view(np.int64)
        d = pd.DataFrame({"id": df["id"].to_numpy(np.int64), "h": hv}).sort_values(
            ["id", "h"], kind="mergesort"
        )
        uid = d["id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]]) if len(uid) else np.zeros(0, np.int64)
        counts = np.diff(np.r_[starts, len(uid)])
        loffs = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
        arr = pa.ListArray.from_arrays(
            pa.array(loffs, pa.int32()), pa.array(d["h"].to_numpy(np.int64), pa.int64())
        )
        present = uid[starts] if len(uid) else np.zeros(0, np.int64)
        return pa.table({"did": pa.array(present, pa.int64()), "toks": arr})

    def _intersect_counts(pA, A, pB, B, n_pairs):
        m = pd.DataFrame({"p": pA, "t": A}).merge(
            pd.DataFrame({"p": pB, "t": B}), on=["p", "t"]
        )
        return np.bincount(m["p"].to_numpy(np.int64), minlength=n_pairs).astype(np.int64)

    if dfref is not None:
        # injectivity over the corpus vocabulary, checked task-side on the
        # already-assembled df table
        @ray.remote
        def _check_injective(tbl: pa.Table) -> bool:
            hv = _token_hashes(tbl["token"].combine_chunks(), backend="fast")
            if len(np.unique(hv)) != len(hv):
                raise ValueError(
                    "prefix_jaccard: shingle hash collision in corpus "
                    "vocabulary — rerun with string verification"
                )
            return True

        inj_ref = _check_injective.remote(dfref)
    else:
        # distributed injectivity check: hash the (globally distinct)
        # vocabulary rows and count per hash — any count > 1 is a collision
        hcnt = keyed_aggregate(
            dfreq.map_batches(
                lambda b: pa.table(
                    {
                        "h": pa.array(
                            _token_hashes(
                                b["token"].combine_chunks(), backend="fast"
                            ).view(np.int64)
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            ["h"],
            count_alias="cnt",
        )
        if int(hcnt.max("cnt") or 0) > 1:
            raise ValueError(
                "prefix_jaccard: shingle hash collision in corpus "
                "vocabulary — rerun with string verification"
            )
        inj_ref = None

    tok_lists, tok_ref = assemble_table_ref(
        docs.map_batches(lists, batch_format="pyarrow")
    )

    if tok_ref is not None:
        # broadcast plan: the doc -> sorted-hash index ships ONCE per
        # worker (plain tasks, not actors — the index build is one argsort
        # over the doc-id column, far cheaper than actor-pool startup, and
        # the per-PROCESS cache below gives actor-like reuse anyway); only
        # the (4 x int64)-wide candidate rows ever move, and each batch's
        # intersections run as one int64 merge
        if inj_ref is not None:
            ray.get(inj_ref)

        def _index(ref):
            cache = _PJ_INDEX_CACHE
            key = ("idx", ref.hex() if hasattr(ref, "hex") else id(ref))
            got = cache.get(key)
            if got is None:
                tbl = ray.get(ref)
                did = np.asarray(tbl["did"].combine_chunks(), np.int64)
                arr = tbl["toks"].combine_chunks()
                flat = np.asarray(arr.values, np.int64)
                offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                order = np.argsort(did, kind="stable")
                got = (did[order], offs[:-1][order], (offs[1:] - offs[:-1])[order], flat)
                # the df frame and verify index of ONE query coexist in a
                # streaming run; _pj_cache_put keeps exactly one per family
                _pj_cache_put("idx", key, got)
            return got

        def verify_bcast(b: pa.Table) -> pa.Table:
            n_pairs = len(b)
            if not n_pairs:
                return pa.table(
                    {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
                )
            did, starts, counts, flat = _index(tok_ref)

            def _gather(doc_ids):
                j = np.searchsorted(did, doc_ids)
                cnt = counts[j]
                off = np.concatenate([[0], np.cumsum(cnt)])
                pos = np.arange(off[-1]) - np.repeat(off[:-1], cnt)
                vals = flat[np.repeat(starts[j], cnt) + pos]
                return np.repeat(np.arange(len(doc_ids)), cnt), vals

            ia = np.asarray(b["id_a"].combine_chunks(), np.int64)
            ib = np.asarray(b["id_b"].combine_chunks(), np.int64)
            sa = np.asarray(b["sz_a"].combine_chunks(), np.int64)
            sb = np.asarray(b["sz_b"].combine_chunks(), np.int64)
            pA, A = _gather(ia)
            pB, B = _gather(ib)
            inter = _intersect_counts(pA, A, pB, B, n_pairs)
            keep = (1000 + thr) * inter >= thr * (sa + sb)
            return pa.table({"id_a": pa.array(ia[keep]), "id_b": pa.array(ib[keep])})

        return cand.map_batches(verify_bcast, batch_format="pyarrow")

    # exchange plan (corpus-sized lists): two keyed joins ship each
    # candidate's two hash lists, then the same int64 merge verifies
    if inj_ref is not None:
        ray.get(inj_ref)
    with_a = hash_join(cand, tok_lists, on=["id_a"], right_on=["did"]).map_batches(
        lambda b: pa.table(
            {
                "id_a": b["id_a"], "id_b": b["id_b"],
                "sz_a": b["sz_a"], "sz_b": b["sz_b"], "toks_a": b["toks"],
            }
        ),
        batch_format="pyarrow",
    )
    with_ab = hash_join(with_a, tok_lists, on=["id_b"], right_on=["did"])

    def verify(b: pa.Table) -> pa.Table:
        n_pairs = len(b)
        sa = np.asarray(b["sz_a"].combine_chunks(), np.int64)
        sb = np.asarray(b["sz_b"].combine_chunks(), np.int64)

        def _explode(col):
            arr = b[col].combine_chunks()
            offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            return (
                np.repeat(np.arange(n_pairs), np.diff(offs)),
                np.asarray(arr.values, np.int64),
            )

        if n_pairs:
            inter = _intersect_counts(*_explode("toks_a"), *_explode("toks"), n_pairs)
        else:
            inter = np.zeros(0, np.int64)
        keep = (1000 + thr) * inter >= thr * (sa + sb)
        return pa.table(
            {
                "id_a": pc.array_filter(b["id_a"].combine_chunks(), pa.array(keep)),
                "id_b": pc.array_filter(b["id_b"].combine_chunks(), pa.array(keep)),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")


def weighted_jaccard_pairs(
    docs: ray.data.Dataset,
    *,
    threshold_milli: int = 500,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_group: int = 1000,
) -> ray.data.Dataset:
    """Exact GENERALIZED (multiset) Jaccard near-dup pairs over shingle
    term frequencies: ``J_w = Σ_s min(tf_A, tf_B) / Σ_s max(tf_A, tf_B)``
    (Σmax = sz_A + sz_B − Σmin with sz the total shingle count incl.
    duplicates) — the repetition-aware measure that separates a doc that
    repeats a phrase 50x from one mentioning it once, where the SET
    Jaccard of `jaccard_pairs` sees them as identical.  Returns
    (id_a, id_b, jw_milli) with id_a < id_b, J_w >= threshold.

    Scale shape — the LEVEL-EXPLOSION trick reuses the set machinery
    unchanged: each (doc, shingle, tf) row explodes into levels
    k = 1..tf keyed (shingle, k), and a pair's co-occurrence count over
    level buckets IS Σ min(tf_A, tf_B), so the existing segment-pairs
    kernel + pair-keyed count (one bucket co-location + one pair
    exchange, hot buckets capped with the logged-drop rule) computes the
    weighted intersection with zero new shuffle machinery; total level
    rows equal the corpus shingle instances, not more."""
    import pyarrow.compute as pc

    from ontoea_ray.functions.shuffle import compact, with_partition_key
    from ontoea_ray.functions.text import tokenize

    thr = threshold_milli

    def explode(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        ids = np.asarray(batch[id_col].to_pylist(), np.int64)
        toks = tokenize(text)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        flat = toks.flatten()
        nf = len(flat)
        frames = []
        if nf >= shingle_n:
            row_id = np.repeat(np.arange(len(counts)), counts)
            parts = [flat.slice(j, nf - shingle_n + 1) for j in range(shingle_n)]
            joined = pc.binary_join_element_wise(*parts, " ")
            valid = row_id[: nf - shingle_n + 1] == row_id[shingle_n - 1 :]
            frames.append(
                pd.DataFrame(
                    {
                        "d": row_id[: nf - shingle_n + 1][valid],
                        "s": joined.to_pandas().to_numpy(object)[valid],
                    }
                )
            )
        short = counts < shingle_n
        if short.any():
            frames.append(
                pd.DataFrame(
                    {
                        "d": np.flatnonzero(short),
                        "s": np.asarray(text.filter(pa.array(short)), object),
                    }
                )
            )
        if not frames:
            return _from_pandas_clean(
                pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype=np.int64),
                        "skey": pd.Series([], dtype=object),
                        "sz": pd.Series([], dtype=np.int64),
                    }
                )
            )
        df = pd.concat(frames, ignore_index=True)
        tf = df.groupby(["d", "s"], sort=False).size().reset_index(name="tf")
        sz = tf.groupby("d", sort=False)["tf"].transform("sum").to_numpy(np.int64)
        # level explosion: (d, s, tf) -> k = 1..tf rows keyed (s, k)
        reps = tf["tf"].to_numpy(np.int64)
        d_out = np.repeat(ids[tf["d"].to_numpy(np.int64)], reps)
        sz_out = np.repeat(sz, reps)
        lvl_base = np.concatenate([[0], np.cumsum(reps)])
        k = (np.arange(int(reps.sum())) - np.repeat(lvl_base[:-1], reps) + 1).astype(np.int64)
        s_out = np.repeat(tf["s"].to_numpy(object), reps)
        skey = np.char.add(
            np.char.add(s_out.astype(str), "\x1f"), k.astype(str)
        ).astype(object)
        return _from_pandas_clean(
            pd.DataFrame({id_col: d_out, "skey": skey, "sz": sz_out})
        )

    lvl_rows = docs.map_batches(explode, batch_format="pyarrow")
    parted = with_partition_key(lvl_rows, ["skey"])
    pair_rows = parted.groupby("pkey").map_groups(
        _pairs_from_bucket_block(
            id_col, max_group, keys=("skey",), distinct=False, size_col="sz"
        ),
        batch_format="pandas",
    )

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        part = (
            df.groupby(["id_a", "id_b", "sz_a", "sz_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        return _from_pandas_clean(part)

    parts = compact(pair_rows.map_batches(partial_counts, batch_format="pyarrow"))
    parted2 = with_partition_key(parts, ["id_a", "id_b"])

    def merge_and_filter(df: pd.DataFrame) -> pa.Table:
        g = (
            df.groupby(["id_a", "id_b", "sz_a", "sz_b"], sort=False)["inter"]
            .sum()
            .reset_index()
        )
        c = g["inter"].to_numpy(np.int64)
        tot = g["sz_a"].to_numpy(np.int64) + g["sz_b"].to_numpy(np.int64)
        keep = (1000 + thr) * c >= thr * tot
        g = g.loc[keep]
        out = pd.DataFrame(
            {
                "id_a": g["id_a"].to_numpy(np.int64),
                "id_b": g["id_b"].to_numpy(np.int64),
                "jw_milli": (
                    g["inter"].to_numpy(np.int64) * 1000
                    // (
                        g["sz_a"].to_numpy(np.int64)
                        + g["sz_b"].to_numpy(np.int64)
                        - g["inter"].to_numpy(np.int64)
                    )
                ).astype(np.int64),
            }
        )
        return _from_pandas_clean(out)

    return parted2.groupby("pkey").map_groups(merge_and_filter, batch_format="pandas")
