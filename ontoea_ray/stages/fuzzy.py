"""Fuzzy surface-form matching: edit-distance-1 pairs via
deletion-neighborhood blocking (SymSpell-style, public algorithm:
Garbe, "1000x faster spelling correction", 2012 — every pair of strings
with Levenshtein distance <= 1 shares at least one key in
{s} ∪ {s with one char deleted}).

This is the canonicalization primitive the KG pipeline needs for NEAR-miss
surface forms (OCR slips, digit typos, singular/plural-ish variants) that
exact dedup and shingle-Jaccard both miss on SHORT strings.

100-TB shape: this is a VOCABULARY operator — run it after a distinct over
surface forms, so its input is vocabulary-sized, not corpus-sized.  The
explode emits len(s)+1 keys per form (all vectorized string slicing, no
per-row Python), candidate generation is key-co-located via one pkey
exchange, every candidate is VERIFIED (zero false positives), and hub keys
are capped like the LSH buckets (a key shared by >max_group forms carries
no discriminating signal but would emit O(g²) candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean


def _is_edit1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) == 1 check (a != b assumed), O(len)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1 :]


def _deletion_keys(names: pd.Series) -> pd.DataFrame:
    """(key, name) rows: identity + every single-deletion variant.
    Vectorized per deletion POSITION (max_len slice-concat kernels),
    never per row."""
    frames = [pd.DataFrame({"key": names, "name": names})]
    max_len = int(names.str.len().max() or 0)
    for d in range(max_len):
        has = names.str.len() > d
        s = names[has]
        frames.append(pd.DataFrame({"key": s.str.slice(0, d) + s.str.slice(d + 1), "name": s}))
    return pd.concat(frames, ignore_index=True)


def edit1_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    max_group: int = 256,
    width: int | None = None,
    out_a: str = "name_a",
    out_b: str = "name_b",
) -> ray.data.Dataset:
    """All unordered pairs of DISTINCT values of ``col`` with Levenshtein
    distance exactly 1 (out_a < out_b).

    Plan: per-batch distinct -> deletion-key explode -> pkey-co-located
    candidate pairs per key (capped at ``max_group`` forms/key) ->
    in-partition exact verification -> global pair distinct (a pair can
    surface under several shared keys / partitions)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    def explode(batch: pa.Table) -> pa.Table:
        names = pd.Series(batch[col].to_pandas()).dropna().drop_duplicates()
        if names.empty:
            return pa.table({"key": pa.array([], pa.string()), "name": pa.array([], pa.string())})
        return _from_pandas_clean(_deletion_keys(names.astype(str)))

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    # the same (key, name) row can come from several input blocks: make the
    # postings distinct first so group sizes are true form counts
    postings = keyed_aggregate(
        exploded, ["key", "name"], count_alias="_c", width=width
    ).drop_columns(["_c"])
    parted = with_partition_key(postings, ["key"], width=width)

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs_a: list[list] = []
        outs_b: list[list] = []

        def emit_equal_len(names: np.ndarray) -> None:
            # same length L: verify ALL pairs at once — byte matrix (g x L),
            # pair mismatch counts via one broadcast compare
            g_n = len(names)
            if g_n < 2:
                return
            # the byte-matrix compare is exact ONLY when every name is pure
            # ASCII (UTF-8 byte length == char length): a divisible total is
            # not enough (mixed groups like {'ba', '日a'} are 2+4=6 bytes and
            # 6 % 2 == 0 but the reshape misaligns rows), and even EQUAL byte
            # lengths are not enough (a single multi-byte char substitution
            # is edit distance 1 but 2-3 byte diffs).  names here all share
            # one char length, so all-ASCII <=> every byte length == it.
            char_len = len(names[0])
            blens = np.fromiter(
                (len(s.encode("utf-8", "surrogatepass")) for s in names), np.int64, g_n
            )
            mat = np.frombuffer("".join(names.tolist()).encode("utf-8", "surrogatepass"), np.uint8)
            L = mat.size // g_n
            if blens.max() != char_len:  # any non-ASCII — scalar check
                ii, jj = np.triu_indices(g_n, k=1)
                ok = np.fromiter(
                    (_is_edit1(a, b) for a, b in zip(names[ii], names[jj])), bool, len(ii)
                )
                outs_a.append(names[ii][ok].tolist())
                outs_b.append(names[jj][ok].tolist())
                return
            mat = mat.reshape(g_n, L)
            ii, jj = np.triu_indices(g_n, k=1)
            diff = (mat[ii] != mat[jj]).sum(axis=1)
            ok = diff == 1
            outs_a.append(names[ii][ok].tolist())
            outs_b.append(names[jj][ok].tolist())

        for _, g in df.groupby("key", sort=False):
            if len(g) < 2 or len(g) > max_group:
                continue
            names = np.sort(pd.unique(g["name"]))
            lens = np.fromiter((len(s) for s in names), np.int64, len(names))
            for ln in np.unique(lens):
                emit_equal_len(names[lens == ln])
                # cross-length candidates (insert/delete): |len diff| == 1
                shorter = names[lens == ln - 1]
                if len(shorter):
                    longer = names[lens == ln]
                    for a in shorter:
                        hits = [b for b in longer if _is_edit1(a, b)]
                        if hits:
                            outs_a.append([min(a, b) for b in hits])
                            outs_b.append([max(a, b) for b in hits])

        flat_a = [s for chunk in outs_a for s in chunk]
        flat_b = [s for chunk in outs_b for s in chunk]
        if not flat_a:
            return pd.DataFrame(
                {out_a: pd.Series([], dtype=str), out_b: pd.Series([], dtype=str)}
            )
        return pd.DataFrame({out_a: flat_a, out_b: flat_b}).drop_duplicates()

    pairs = parted.groupby("pkey").map_groups(pairs_in_partition, batch_format="pandas")
    return keyed_aggregate(pairs, [out_a, out_b], count_alias="_c", width=width).drop_columns(
        ["_c"]
    )
