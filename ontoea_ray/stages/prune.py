"""Semi-join pruning: remove_unlinked_triples / remove_no_triples_link and
their fixpoint loop.

Reference semantics (/root/reference/code/src/openea/modules/load/
kgs.py:599-654): keep triples whose head AND tail appear in the linked
entity set; keep links whose both sides appear in the triple entity sets;
alternate until the triple counts stop changing.

Ray-Data-first: both filters are broadcast-set semi-joins inside
``map_batches`` (the link set / entity vocabulary is the small side — at
web scale a Bloom filter takes its place); no shuffle.  The fixpoint loop
is driver-side over lazily re-filtered Datasets, with counts as the
convergence check.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def _filter_in_set(ds: ray.data.Dataset, cols: list[str], allowed_ref) -> ray.data.Dataset:
    def filt(batch: pa.Table) -> pa.Table:
        allowed = ray.get(allowed_ref) if isinstance(allowed_ref, ray.ObjectRef) else allowed_ref
        mask = None
        for c in cols:
            m = pc.is_in(batch[c].combine_chunks(), value_set=allowed)
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def remove_unlinked_triples(triples: ray.data.Dataset, linked_entities: set[str]) -> ray.data.Dataset:
    """Keep triples with BOTH endpoints in the linked set (semi-join ×2)."""
    ref = ray.put(pa.array(sorted(linked_entities), pa.string()))
    return _filter_in_set(triples, ["subj", "obj"], ref)


def triple_entities(triples: ray.data.Dataset) -> set[str]:
    """Distinct endpoint vocabulary (combiner-first distinct, driver set)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays(
            [batch["subj"].combine_chunks().cast(pa.string()), batch["obj"].combine_chunks().cast(pa.string())]
        ).unique()
        return pa.table({"uri": vals})

    rows = triples.map_batches(partial, batch_format="pyarrow").take_all()
    return {r["uri"] for r in rows}


def remove_no_triples_link(
    links: list[tuple[str, str]], kg1_entities: set[str], kg2_entities: set[str]
) -> list[tuple[str, str]]:
    """Keep links whose e1 has KG1 triples and e2 has KG2 triples."""
    return [(a, b) for a, b in links if a in kg1_entities and b in kg2_entities]


def prune_to_consistency(
    triples1: ray.data.Dataset,
    triples2: ray.data.Dataset,
    links: list[tuple[str, str]],
    *,
    max_rounds: int = 10000,
) -> tuple[ray.data.Dataset, ray.data.Dataset, list[tuple[str, str]]]:
    """Alternate the two filters until the triple counts are stable
    (reference fixpoint loop, kgs.py:599-615).  Each round materializes the
    pruned triples so the next filter runs on the reduced set."""
    t1, t2 = triples1, triples2
    for _ in range(max_rounds):
        linked = {e for pair in links for e in pair}
        t1 = remove_unlinked_triples(t1, linked).materialize()
        t2 = remove_unlinked_triples(t2, linked).materialize()
        n1, n2 = t1.count(), t2.count()
        links = remove_no_triples_link(links, triple_entities(t1), triple_entities(t2))
        linked = {e for pair in links for e in pair}
        t1 = remove_unlinked_triples(t1, linked).materialize()
        t2 = remove_unlinked_triples(t2, linked).materialize()
        if t1.count() == n1 and t2.count() == n2:
            break
    return t1, t2, links
