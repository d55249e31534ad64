"""Supervised augmentation operators ('swapping' alignment mode).

Reference semantics (/root/reference/code/src/openea/modules/load/
read.py:166-216, applied at kgs.py:75-84): for every seed link (e1, e2),
every triple with e1 as head yields (e2, r, t) and every triple with e1 as
tail yields (h, r, e2) — and symmetrically for KG2 with e2 -> e1.

Ray-Data-first: instead of driver-side adjacency dicts, this is a broadcast
substitution join — the seed map (small side) ships once via ``ray.put``;
one vectorized pass over the triple stream emits the substituted copies;
distinctness comes from the caller's dedup (the reference uses sets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def generate_sup_relation_triples(
    triples: ray.data.Dataset, seed_map: dict[str, str]
) -> ray.data.Dataset:
    """Triples of one KG + {its entity -> counterpart}: emit the copies with
    head and/or tail substituted by the aligned counterpart."""
    ref = ray.put(seed_map)

    def sub(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = pa.array(list(m.keys()), pa.string())
        vals = np.asarray(list(m.values()), dtype=object)

        def lookup(col):
            idx = pc.index_in(col.combine_chunks(), value_set=keys).to_numpy(zero_copy_only=False)
            miss = np.isnan(idx) if idx.dtype.kind == "f" else idx < 0
            out = vals[np.where(miss, 0, idx).astype(np.int64)]
            return out, ~miss

        subj_sub, subj_hit = lookup(batch["subj"])
        obj_sub, obj_hit = lookup(batch["obj"])
        subj = np.asarray(batch["subj"].to_pylist(), dtype=object)
        pred = np.asarray(batch["pred"].to_pylist(), dtype=object)
        obj = np.asarray(batch["obj"].to_pylist(), dtype=object)
        out_s, out_p, out_o = [], [], []
        # head substituted
        out_s.append(subj_sub[subj_hit]); out_p.append(pred[subj_hit]); out_o.append(obj[subj_hit])
        # tail substituted
        out_s.append(subj[obj_hit]); out_p.append(pred[obj_hit]); out_o.append(obj_sub[obj_hit])
        return pa.table(
            {
                "subj": pa.array(np.concatenate(out_s).tolist(), pa.string()),
                "pred": pa.array(np.concatenate(out_p).tolist(), pa.string()),
                "obj": pa.array(np.concatenate(out_o).tolist(), pa.string()),
            }
        )

    return triples.map_batches(sub, batch_format="pyarrow")


def generate_sup_attribute_triples(
    attr_triples: ray.data.Dataset, seed_map: dict[str, str]
) -> ray.data.Dataset:
    """(e, a, v) with e linked -> (counterpart(e), a, v)."""
    ref = ray.put(seed_map)

    def sub(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        keys = pa.array(list(m.keys()), pa.string())
        vals = np.asarray(list(m.values()), dtype=object)
        idx = pc.index_in(batch["subj"].combine_chunks(), value_set=keys).to_numpy(zero_copy_only=False)
        miss = np.isnan(idx) if idx.dtype.kind == "f" else idx < 0
        hit = ~miss
        new_subj = vals[np.where(miss, 0, idx).astype(np.int64)][hit]
        attr = np.asarray(batch["attr"].to_pylist(), dtype=object)[hit]
        value = np.asarray(batch["value"].to_pylist(), dtype=object)[hit]
        return pa.table(
            {
                "subj": pa.array(new_subj.tolist(), pa.string()),
                "attr": pa.array(attr.tolist(), pa.string()),
                "value": pa.array(value.tolist(), pa.string()),
            }
        )

    return attr_triples.map_batches(sub, batch_format="pyarrow")


def generate_sup_cv_links(align_links: list[tuple[str, str]], cv_links: dict[str, str]) -> set:
    """Propagate classes across seed pairs when they differ or are missing
    (reference read.py:184-200, exact drop-through semantics)."""
    out = set()
    for e1, e2 in align_links:
        o1 = cv_links.get(e1, -1)
        o2 = cv_links.get(e2, -1)
        if o1 == o2:
            continue
        if o1 == -1:
            out.add((e1, o2))
        elif o2 == -1:
            out.add((e2, o1))
        else:
            out.add((e1, o2))
            out.add((e2, o1))
    return out
