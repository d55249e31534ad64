"""Frequency-sorted dense id assignment, Ray-Data-first.

Reproduces the reference's deterministic URI->id encoding (SURVEY.md §2.3):

- element frequency count over triples and rank by (freq desc, uri desc)
  — reference ``sort_elements`` /root/reference/code/src/openea/modules/
  load/read.py:14-26 (total order, so ranks are bit-stable at any
  parallelism level);
- interleaved two-KG ids: rank i < min(n1,n2) -> KG1 2i / KG2 2i+1, tails
  offset past the interleaved range — reference ``generate_mapping_id``
  read.py:64-96;
- single-KG dense ids — read.py:99-117;
- sharing variant (aligned train pairs share KG1's id) — read.py:29-61.

The global rank is computed distributed: sort (one shuffle) then a
zip-with-index built from materialized block row-counts (block offsets come
from metadata, not arrival order — SURVEY.md §7.4's order-dependence risk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
import ray.data


@ray.remote
def _add_rank(block: pa.Table, offset: int, col: str) -> pa.Table:
    return block.append_column(col, pa.array(np.arange(offset, offset + len(block)), pa.int64()))


def zip_with_index(ds: ray.data.Dataset, col: str = "rank") -> ray.data.Dataset:
    """Append a 0-based global row index to an (already ordered) Dataset.

    Materializes the input (it is vocabulary-sized, far smaller than the
    corpus), reads per-block row counts from metadata, and launches one Ray
    task per block to append offset+local index — order-safe and parallel.
    """
    mat = ds.materialize()
    refs, offsets = [], []
    off = 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            # skip empty blocks: a zero-row block out of an empty sort
            # partition can carry a ZERO-COLUMN schema, and from_arrow_refs
            # would infer the dataset schema from it (rank-only), hiding
            # every payload column from downstream schema probes
            if meta.num_rows == 0:
                continue
            refs.append(ref)
            offsets.append(off)
            off += meta.num_rows
    out = [_add_rank.remote(r, o, col) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)


def token_frequencies(texts: ray.data.Dataset, column: str = "text") -> ray.data.Dataset:
    """Distributed token frequency: per-batch combiner then a small groupby.

    Returns a Dataset (token, freq).  The per-batch partial aggregation
    bounds the shuffle to (#blocks × vocab) partial rows.
    """
    from ontoea_ray.functions.text import tokenize

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize(batch[column]).flatten()
        vc = pd.Series(toks.to_pandas()).value_counts()
        return pa.table({"token": pa.array(vc.index, pa.string()), "freq": pa.array(vc.values, pa.int64())})

    partials = texts.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    from ontoea_ray.functions.shuffle import compact

    return compact(partials).groupby("token").aggregate(Sum("freq", alias_name="freq"))


def element_frequencies(triples: ray.data.Dataset, columns: tuple[str, ...]) -> ray.data.Dataset:
    """Frequency of URIs over the given triple columns (e.g. subj+obj for
    entities, pred for relations).  Reference: read.py:14-22."""

    def partial(batch: pa.Table) -> pa.Table:
        parts = [batch[c].combine_chunks() for c in columns]
        allv = pa.concat_arrays([p.cast(pa.string()) for p in parts])
        vc = pd.Series(allv.to_pandas()).value_counts()
        return pa.table({"uri": pa.array(vc.index, pa.string()), "freq": pa.array(vc.values, pa.int64())})

    partials = triples.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    from ontoea_ray.functions.shuffle import compact

    return compact(partials).groupby("uri").aggregate(Sum("freq", alias_name="freq"))


def top_k_by_frequency(freq: ray.data.Dataset, k: int, key: str = "uri") -> list[tuple[str, int]]:
    """Top-k elements by (freq desc, key desc) WITHOUT a global sort:
    per-block top-k partials, merged on the driver (k × #blocks rows).
    Same total order as rank_by_frequency; use when only the head of the
    ranking is needed (e.g. gazetteer bootstrap)."""

    def part(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: batch[key].to_pandas(), "freq": batch["freq"].to_pandas()})
        df = df.sort_values(["freq", key], ascending=False, kind="mergesort").head(k)
        return _from_pandas_clean(df)

    rows = freq.map_batches(part, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["freq"], r[key]), reverse=True)
    return [(r[key], r["freq"]) for r in rows[:k]]


def rank_by_frequency(freq: ray.data.Dataset, key: str = "uri") -> ray.data.Dataset:
    """Global rank by (freq desc, key desc) — the reference's total order
    (read.py:23-25).  One shuffle (sort) + metadata-offset indexing."""
    return zip_with_index(freq.sort(["freq", key], descending=[True, True]), "rank")


def interleaved_ids(rank1: pa.Table, rank2: pa.Table, key: str = "uri") -> tuple[dict, dict]:
    """Interleave two ranked vocabularies into one dense id space.

    rank < min(n1,n2): KG1 -> 2*rank, KG2 -> 2*rank+1; KG1 tail ->
    2*n2 + (rank-n2); KG2 tail -> 2*n1 + (rank-n1).  (read.py:76-83)
    """
    r1 = np.asarray(rank1["rank"].to_pylist(), np.int64)
    r2 = np.asarray(rank2["rank"].to_pylist(), np.int64)
    n1, n2 = len(r1), len(r2)
    id1 = np.where(r1 < n2, 2 * r1, 2 * n2 + (r1 - n2))
    id2 = np.where(r2 < n1, 2 * r2 + 1, 2 * n1 + (r2 - n1))
    ids1 = dict(zip(rank1[key].to_pylist(), id1.tolist()))
    ids2 = dict(zip(rank2[key].to_pylist(), id2.tolist()))
    return ids1, ids2


def sharing_ids(
    rank1: pa.Table, rank2_unlinked: pa.Table, train_links: list[tuple[str, str]], key: str = "uri"
) -> tuple[dict, dict]:
    """Sharing variant: aligned train pairs collapse to KG1's id; KG2's
    vocabulary is ranked WITHOUT the linked elements first (read.py:29-42)."""
    ids1, ids2 = interleaved_ids(rank1, rank2_unlinked, key)
    for e1, e2 in train_links:
        ids2[e2] = ids1[e1]
    return ids1, ids2


def single_kg_ids(rank: pa.Table, key: str = "uri") -> dict:
    """Dense ids by frequency rank for one vocabulary (read.py:99-117)."""
    return dict(zip(rank[key].to_pylist(), rank["rank"].to_pylist()))


def encode_pairs(links: ray.data.Dataset, ids1: dict, ids2: dict) -> ray.data.Dataset:
    """Dictionary-encode (e1, e2) link pairs, SILENTLY dropping pairs whose
    either URI is unknown — the reference's exact drop semantics
    (uris_pair_2ids, read.py:129-138)."""
    ref1, ref2 = ray.put(ids1), ray.put(ids2)

    def enc(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d1, d2 = ray.get(ref1), ray.get(ref2)
        k1 = pa.array(list(d1.keys()), pa.string())
        v1 = np.fromiter(d1.values(), np.int64, len(d1))
        k2 = pa.array(list(d2.keys()), pa.string())
        v2 = np.fromiter(d2.values(), np.int64, len(d2))
        i1 = pc.index_in(batch["e1"].combine_chunks(), value_set=k1).to_numpy(zero_copy_only=False)
        i2 = pc.index_in(batch["e2"].combine_chunks(), value_set=k2).to_numpy(zero_copy_only=False)
        m1 = np.isnan(i1) if i1.dtype.kind == "f" else i1 < 0
        m2 = np.isnan(i2) if i2.dtype.kind == "f" else i2 < 0
        keep = ~(m1 | m2)
        return pa.table(
            {
                "id1": pa.array(v1[np.where(keep, i1, 0).astype(np.int64)][keep], pa.int64()),
                "id2": pa.array(v2[np.where(keep, i2, 0).astype(np.int64)][keep], pa.int64()),
            }
        )

    return links.map_batches(enc, batch_format="pyarrow")


def encode_triples(
    triples: ray.data.Dataset,
    ent_ids: dict,
    rel_ids: dict,
    *,
    drop_unknown: bool = False,
) -> ray.data.Dataset:
    """Dictionary-encode (subj, pred, obj) URIs to dense ids via broadcast
    lookup inside map_batches (no shuffle; the id dicts are the small side).

    drop_unknown=False asserts full coverage (reference
    uris_relation_triple_2ids, read.py:141-149); True silently drops rows
    with any unknown URI (the reference's pair/attr drop semantics,
    read.py:129-163).
    """
    ent_ref = ray.put(ent_ids)
    rel_ref = ray.put(rel_ids)

    class Encode:
        def __init__(self):
            self.ent = ray.get(ent_ref)
            self.rel = ray.get(rel_ref)
            self.ent_keys = pa.array(list(self.ent.keys()), pa.string())
            self.ent_vals = np.fromiter(self.ent.values(), np.int64, len(self.ent))
            self.rel_keys = pa.array(list(self.rel.keys()), pa.string())
            self.rel_vals = np.fromiter(self.rel.values(), np.int64, len(self.rel))

        def _lookup(self, col, keys, vals):
            import pyarrow.compute as pc

            idx = pc.index_in(col.combine_chunks(), value_set=keys).to_numpy(zero_copy_only=False)
            miss = np.isnan(idx) if idx.dtype.kind == "f" else idx < 0
            return vals[np.where(miss, 0, idx).astype(np.int64)], miss

        def __call__(self, batch: pa.Table) -> pa.Table:
            s, sm = self._lookup(batch["subj"], self.ent_keys, self.ent_vals)
            p, pm = self._lookup(batch["pred"], self.rel_keys, self.rel_vals)
            o, om = self._lookup(batch["obj"], self.ent_keys, self.ent_vals)
            bad = sm | pm | om
            if not drop_unknown and bad.any():
                raise ValueError("encode_triples: URI missing from id dicts")
            keep = ~bad
            return pa.table(
                {
                    "subj_id": pa.array(s[keep], pa.int64()),
                    "pred_id": pa.array(p[keep], pa.int64()),
                    "obj_id": pa.array(o[keep], pa.int64()),
                }
            )

    return triples.map_batches(Encode, batch_format="pyarrow", concurrency=2)
