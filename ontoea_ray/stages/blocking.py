"""Fuzzy surface-form candidate blocking for entity linking.

The north-star pipeline links mentions to gazetteer entities with
"candidate blocking by minhash/LSH over surface forms" before the
embedding/ontology-scored inner loop.  The reference resolves mentions by
EXACT surface lookup (`/root/reference/code/src/openea/modules/load/kgs.py`
builds dict(name -> entity) maps); at web scale the mention vocabulary is
full of typos, casing variants and morphological near-misses, so exact
lookup silently drops recall.  This module adds the missing blocking stage
as a CROSS-TABLE MinHash-LSH over CHARACTER shingles:

  mentions (surface strings)  x  gazetteer (entity surface strings)
    -> char-n-gram shingle hashes      (codepoint fold, SQL-replayable)
    -> per-surface MinHash signature   (same perm family as stages/dedup)
    -> band keys                       (same FNV-1a fold)
    -> bucket co-location              (ONE exchange on (band, band_key))
    -> in-bucket left x right pairs    (vectorized segment cross product)
    -> exact char-shingle Jaccard verify (optional, integer threshold)

Every step is integer arithmetic DuckDB replays bit-for-bit
(`functions/lsh_sql.lsh_cross_verified_sql`), so the "fuzzy" blocking is an
exact, value-hash-checked operator.

Scale shape: both sides stream; the only exchange keys are (band,
band_key) and the shingle hash — never the corpus.  Hot buckets (stopword
shingles shared by everything) are capped at ``max_group`` and LOGGED
(no-silent-caps rule).  The gazetteer side is typically dimension-sized but
nothing here assumes it: blocking is symmetric large x large.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
from ontoea_ray.stages.dedup import _MERSENNE, _perm_params

logger = logging.getLogger(__name__)

_P_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(0x100000001B3)


def _char_codepoints(arr) -> tuple[np.ndarray, np.ndarray]:
    """(flat codepoints as uint64, row offsets) for a string array.

    ASCII batches read the Arrow UTF-8 buffer zero-copy (byte == codepoint);
    batches with any non-ASCII fall back to one utf-32 decode pass so the
    values still equal DuckDB's ``unicode(substring(s, i, 1))``."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(1, np.int64)
    offs = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, np.uint8) if buf is not None else np.zeros(0, np.uint8)
    seg = data[offs[0] : offs[-1]]
    if seg.size == 0 or (seg < 128).all():
        return seg.astype(np.uint64), (offs - offs[0]).astype(np.int64)
    import pyarrow.compute as pc

    counts = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "".join(arr.to_pylist())
    flat = np.frombuffer(joined.encode("utf-32-le"), np.uint32).astype(np.uint64)
    return flat, np.concatenate([[0], np.cumsum(counts)])


def char_shingle_hashes(text_col, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Char-n-gram shingle hashes per row: (flat_hashes, row_offsets).

    Same fold as ``dedup._shingle_hashes`` with codepoints in place of token
    hashes: a full window folds ``acc = acc * P + cp`` starting from its
    first codepoint; rows shorter than n chars contribute ONE whole-row fold
    seeded from the FNV offset (empty row -> the offset itself).  Replayed
    in SQL by ``lsh_sql._char_shingle_hash_exprs``."""
    flat, offs = _char_codepoints(text_col)
    counts = np.diff(offs)
    nrows = len(counts)
    sh_counts = np.maximum(counts - (n - 1), 1)
    out_offsets = np.concatenate([[0], np.cumsum(sh_counts)])
    flat_sh = np.zeros(int(out_offsets[-1]), np.uint64)
    nf = len(flat)
    row_id = np.repeat(np.arange(nrows, dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        if nf >= n:
            acc = flat[: nf - n + 1].copy()
            for j in range(1, n):
                acc = acc * _P_GOLDEN + flat[j : nf - n + 1 + j]
            valid = row_id[: nf - n + 1] == row_id[n - 1 :]
        else:
            acc = np.zeros(0, np.uint64)
            valid = np.zeros(0, bool)
        short = counts < n
        short_acc = np.full(nrows, _FNV_OFFSET)
        for k in range(n - 1):
            has_k = short & (counts > k)
            if not has_k.any():
                break
            short_acc[has_k] = short_acc[has_k] * _P_GOLDEN + flat[offs[:-1][has_k] + k]
    sh_row = np.repeat(np.arange(nrows, dtype=np.int64), sh_counts)
    long_slot = counts[sh_row] >= n
    flat_sh[long_slot] = acc[valid]
    flat_sh[~long_slot] = short_acc[short]
    return flat_sh, out_offsets


def _band_explode_fn(
    *, num_perm: int, bands: int, shingle_n: int, seed: int,
    id_col: str, side: int,
):
    """map_batches callable: surface rows -> (id, side, band, band_key)."""
    assert num_perm % bands == 0
    r = num_perm // bands
    a, b = _perm_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        flat_sh, offs = char_shingle_hashes(ids, shingle_n)
        nrows = len(batch)
        sigs = np.empty((nrows, num_perm), np.uint64)
        M = np.uint64(_MERSENNE)
        with np.errstate(over="ignore"):
            for p in range(num_perm):
                hv = (a[p] * flat_sh + b[p]) % M
                sigs[:, p] = np.minimum.reduceat(hv, offs[:-1]) if nrows else hv[:0]
            out_band = np.empty(nrows * bands, np.int64)
            out_key = np.empty(nrows * bands, np.uint64)
            for bnd in range(bands):
                chunk = sigs[:, bnd * r : (bnd + 1) * r]
                acc = np.full(nrows, _FNV_OFFSET)
                for j in range(r):
                    acc = (acc ^ chunk[:, j]) * _FNV_PRIME
                out_band[bnd * nrows : (bnd + 1) * nrows] = bnd
                out_key[bnd * nrows : (bnd + 1) * nrows] = acc
        rep_ids = pa.chunked_array([ids] * bands) if bands > 1 else ids
        return pa.table(
            {
                "id": rep_ids.combine_chunks() if isinstance(rep_ids, pa.ChunkedArray) else rep_ids,
                "side": pa.array(np.full(nrows * bands, side, np.int8)),
                "band": pa.array(out_band, pa.int64()),
                "band_key": pa.array((out_key.astype(np.int64) & ((1 << 63) - 1)), pa.int64()),
            }
        )

    return fn


def _cross_pairs_kernel(
    keys: tuple[str, ...],
    *,
    max_group: int | None,
    distinct: bool,
    carry_sz: bool,
    out_a: str = "mention",
    out_b: str = "entity",
):
    """Blockwise left x right pair emitter over co-located bucket rows.

    Rows carry (id, side, *keys[, sz]); within each exact key group every
    (side=0, side=1) combination is emitted — a vectorized segment cross
    product (repeat/div/mod index arithmetic, no Python loop over groups).
    Groups with more than ``max_group`` total rows are dropped AND logged."""
    extra = ("sz_a", "sz_b") if carry_sz else ()

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                out_a: pd.Series([], dtype=object),
                out_b: pd.Series([], dtype=object),
                **{c: pd.Series([], dtype=np.int64) for c in extra},
            }
        )
        if df.empty:
            return empty
        key_arrays = [df[k].to_numpy() for k in keys]
        codes = [
            c if c.dtype.kind in "iu" else pd.factorize(c)[0] for c in key_arrays
        ]
        side = df["side"].to_numpy(np.int8)
        idc, id_uniq = pd.factorize(df["id"].to_numpy())
        order = np.lexsort((idc, side, *reversed(codes)))
        codes_s = [c[order] for c in codes]
        side_s = side[order]
        idc_s = idc[order]
        sz_s = df["sz"].to_numpy(np.int64)[order] if carry_sz else None
        n = len(order)
        newgrp = np.zeros(n, bool)
        newgrp[0] = True
        for c in codes_s:
            newgrp[1:] |= c[1:] != c[:-1]
        gid = np.cumsum(newgrp) - 1
        ngroups = int(gid[-1]) + 1
        total_per = np.bincount(gid, minlength=ngroups)
        l_per = np.bincount(gid[side_s == 0], minlength=ngroups)
        r_per = total_per - l_per
        keep_g = (l_per > 0) & (r_per > 0)
        if max_group is not None:
            hot = total_per > max_group
            if (hot & keep_g).any():
                nh = int((hot & keep_g).sum())
                logger.warning(
                    "blocking: dropped %d hot bucket(s) over max_group=%d (largest=%d rows)",
                    nh, max_group, int(total_per[hot].max()),
                )
            keep_g &= ~hot
        pairs_per = np.where(keep_g, l_per * r_per, 0)
        tot = int(pairs_per.sum())
        if tot == 0:
            return empty
        group_start = np.concatenate([[0], np.cumsum(total_per)[:-1]])
        gsel = np.flatnonzero(pairs_per > 0)
        pp = pairs_per[gsel]
        grp_rep = np.repeat(np.arange(len(gsel)), pp)
        runstart = np.concatenate([[0], np.cumsum(pp)[:-1]])
        within = np.arange(tot) - runstart[grp_rep]
        r_sel = r_per[gsel][grp_rep]
        li = within // r_sel
        ri = within % r_sel
        a_rows = group_start[gsel][grp_rep] + li
        b_rows = group_start[gsel][grp_rep] + l_per[gsel][grp_rep] + ri
        cols = {out_a: id_uniq[idc_s[a_rows]], out_b: id_uniq[idc_s[b_rows]]}
        if carry_sz:
            cols["sz_a"] = sz_s[a_rows]
            cols["sz_b"] = sz_s[b_rows]
        out = pd.DataFrame(cols)
        return out.drop_duplicates() if distinct else out

    return emit


def lsh_cross_candidates(
    mentions: ray.data.Dataset,
    gazetteer: ray.data.Dataset,
    *,
    mention_col: str = "mention",
    entity_col: str = "entity",
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 7,
    max_group: int = 4000,
    width: int | None = None,
) -> ray.data.Dataset:
    """Distinct (mention, entity) LSH candidate pairs across two tables.

    Both inputs are one-surface-per-row string tables (callers pass DISTINCT
    surfaces; duplicate rows would only inflate bucket sizes).  One exchange
    on (band, band_key); pair emission is bucket-local."""
    lb = mentions.map_batches(
        _band_explode_fn(num_perm=num_perm, bands=bands, shingle_n=shingle_n,
                         seed=seed, id_col=mention_col, side=0),
        batch_format="pyarrow",
    )
    rb = gazetteer.map_batches(
        _band_explode_fn(num_perm=num_perm, bands=bands, shingle_n=shingle_n,
                         seed=seed, id_col=entity_col, side=1),
        batch_format="pyarrow",
    )
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    parted = with_partition_key(lb.union(rb), ["band", "band_key"], width=width)
    pairs = parted.groupby("pkey").map_groups(
        _cross_pairs_kernel(("band", "band_key"), max_group=max_group,
                            distinct=True, carry_sz=False,
                            out_a=mention_col, out_b=entity_col),
        batch_format="pandas",
    )
    distinct = keyed_aggregate(pairs, [mention_col, entity_col], count_alias="_c", width=width)
    return distinct.drop_columns(["_c"])


def _distinct_shingle_explode(id_col: str, side: int, shingle_n: int):
    """map_batches callable: surface rows -> distinct (id, side, sh, sz).

    A surface's full shingle set is in its own row, so the distinct set and
    its size are exact in-batch — no shuffle, no driver state."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        flat_sh, offs = char_shingle_hashes(ids, shingle_n)
        counts = np.diff(offs)
        row_id = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        df = pd.DataFrame({"row": row_id, "sh": flat_sh.astype(np.int64)})
        df = df.drop_duplicates()
        sz = df.groupby("row", sort=False)["sh"].transform("size").astype(np.int64)
        out = pd.DataFrame(
            {
                "id": ids.to_pandas().to_numpy()[df["row"].to_numpy()],
                "side": np.full(len(df), side, np.int8),
                "sh": df["sh"].to_numpy(),
                "sz": sz.to_numpy(),
            }
        )
        return _from_pandas_clean(out)

    return fn


def lsh_link_candidates(
    mentions: ray.data.Dataset,
    gazetteer: ray.data.Dataset,
    *,
    mention_col: str = "mention",
    entity_col: str = "entity",
    jaccard_pct: int = 40,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 7,
    max_group: int = 4000,
    width: int | None = None,
) -> ray.data.Dataset:
    """LSH candidates VERIFIED by exact char-shingle Jaccard: output rows
    (mention, entity, inter_sz, union_sz) with 100*inter >= pct*union.

    The verify mirrors ``dedup.lsh_near_duplicates``' fully-distributed
    shape: candidate-involved surfaces are selected by a streaming is_in
    filter (value sets assembled inside Ray tasks, never on the driver),
    exact intersection counts ride a shingle-keyed exchange, and the result
    is intersected with the candidate set by pair-co-located grouping."""
    import pyarrow.compute as pc

    cands = lsh_cross_candidates(
        mentions, gazetteer, mention_col=mention_col, entity_col=entity_col,
        num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        max_group=max_group, width=width,
    ).materialize()
    empty = pa.table(
        {
            mention_col: pa.array([], pa.string()),
            entity_col: pa.array([], pa.string()),
            "inter_sz": pa.array([], pa.int64()),
            "union_sz": pa.array([], pa.int64()),
        }
    )
    if cands.count() == 0:
        return ray.data.from_arrow(empty)

    @ray.remote
    def _involved(col: str, *tbls: pa.Table) -> pa.Array:
        t = pa.concat_tables([x for x in tbls if x.num_columns > 0])
        uniq = pc.unique(t[col].combine_chunks())
        return uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq

    refs = cands.to_arrow_refs()
    m_ref = _involved.remote(mention_col, *refs)
    e_ref = _involved.remote(entity_col, *refs)

    def _keep(col: str, ref):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch[col].combine_chunks(), value_set=ray.get(ref))
            )

        return fn

    m_rows = mentions.map_batches(_keep(mention_col, m_ref), batch_format="pyarrow").map_batches(
        _distinct_shingle_explode(mention_col, 0, shingle_n), batch_format="pyarrow"
    )
    e_rows = gazetteer.map_batches(_keep(entity_col, e_ref), batch_format="pyarrow").map_batches(
        _distinct_shingle_explode(entity_col, 1, shingle_n), batch_format="pyarrow"
    )

    from ontoea_ray.functions.shuffle import compact, with_partition_key

    parted = with_partition_key(m_rows.union(e_rows), ["sh"], width=width)
    # no cap on the verify: precision must be exact, and the input is already
    # candidate-involved surfaces (bounded by the candidate structure)
    pair_rows = parted.groupby("pkey").map_groups(
        _cross_pairs_kernel(("sh",), max_group=None, distinct=False,
                            carry_sz=True, out_a=mention_col, out_b=entity_col),
        batch_format="pandas",
    )

    gcols = [mention_col, entity_col, "sz_a", "sz_b"]

    def partial_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return _from_pandas_clean(
            df.groupby(gcols, sort=False).size().reset_index(name="inter_sz")
        )

    parts = compact(pair_rows.map_batches(partial_counts, batch_format="pyarrow"), width=width)
    parted2 = with_partition_key(parts, [mention_col, entity_col], width=width)

    def merge_and_filter(df: pd.DataFrame) -> pa.Table:
        out = df.groupby(gcols, sort=False)["inter_sz"].sum().reset_index()
        inter = out["inter_sz"].to_numpy(np.int64)
        union = out["sz_a"].to_numpy(np.int64) + out["sz_b"].to_numpy(np.int64) - inter
        out["union_sz"] = union
        keep = 100 * inter >= jaccard_pct * union
        return _from_pandas_clean(
            out.loc[keep, [mention_col, entity_col, "inter_sz", "union_sz"]]
        )

    verified = parted2.groupby("pkey").map_groups(merge_and_filter, batch_format="pandas")

    # pair semi-join with the candidate set (string keys, extra columns ride)
    def tag(src: int, with_stats: bool):
        def fn(batch: pa.Table) -> pa.Table:
            z = pa.array(np.zeros(len(batch), np.int64))
            return pa.table(
                {
                    mention_col: batch[mention_col],
                    entity_col: batch[entity_col],
                    "inter_sz": batch["inter_sz"] if with_stats else z,
                    "union_sz": batch["union_sz"] if with_stats else z,
                    "_src": pa.array(np.full(len(batch), src, np.int8)),
                }
            )

        return fn

    both = verified.map_batches(tag(0, True), batch_format="pyarrow").union(
        cands.map_batches(tag(1, False), batch_format="pyarrow")
    )

    def keep_in_both(df: pd.DataFrame) -> pa.Table:
        if df.empty:
            return empty
        ok = df.groupby([mention_col, entity_col], sort=False)["_src"].transform("nunique") == 2
        out = df.loc[ok & (df["_src"] == 0), [mention_col, entity_col, "inter_sz", "union_sz"]]
        return _from_pandas_clean(out) if len(out) else empty

    parted3 = with_partition_key(both, [mention_col, entity_col])
    return parted3.groupby("pkey").map_groups(keep_in_both, batch_format="pandas")
