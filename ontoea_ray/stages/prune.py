"""Semi-join pruning: remove_unlinked_triples / remove_no_triples_link and
their fixpoint loop.

Reference semantics (/root/reference/code/src/openea/modules/load/
kgs.py:599-654): keep triples whose head AND tail appear in the linked
entity set; keep links whose both sides appear in the triple entity sets;
alternate until the triple counts stop changing.

Ray-Data-first with a byte-budget plan switch (the BFS pattern,
functions/broadcast.py): the entity vocabulary / linked set is assembled
INSIDE a Ray task and ships as a broadcast ``pc.is_in`` value set while it
fits ``ONTOEA_BROADCAST_BUDGET_BYTES``; above the budget each filter runs
as a Bloom pre-prune (shuffle-free, superset) followed by an exact keyed
semi-join against the globally-distinct vocabulary — the driver never
holds an entity, only the convergence counts.  The list-based wrappers
(`remove_no_triples_link`, `triple_entities`) keep the reference's
driver-RAM signatures for the small parity tiers; the fixpoint itself is
vocabulary-size-independent.
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


def _semi_join_cols(
    ds: ray.data.Dataset, cols: list[str], vocab: ray.data.Dataset
) -> ray.data.Dataset:
    """Exact semi-join: rows whose EVERY ``cols`` value appears in
    ``vocab`` (column ``uri``, globally distinct — required: an inner join
    against a vocabulary with duplicates would duplicate probe rows).
    Bloom pre-prune kills most non-members without a shuffle; the keyed
    join kills the false positives."""
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.stages.bloom import bloom_semi_join

    out = ds
    for c in cols:
        pruned = bloom_semi_join(out, vocab, probe_key=c, build_key="uri", m_bits=1 << 20)
        out = hash_join(pruned, vocab, on=[c], right_on=["uri"], how="inner")
    return out


def _distinct_uris(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """Globally-distinct value vocabulary of ``cols`` as column ``uri``
    (per-block distinct combiner, then ONE keyed exchange)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays(
            [batch[c].combine_chunks().cast(pa.string()) for c in cols]
        ).unique()
        return pa.table({"uri": vals})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return keyed_aggregate(parts, ["uri"]).select_columns(["uri"])


def filter_endpoints_in(
    triples: ray.data.Dataset,
    vocab: ray.data.Dataset,
    cols: list[str] = ("subj", "obj"),
) -> ray.data.Dataset:
    """Rows of ``triples`` whose endpoints ALL appear in ``vocab`` (column
    ``uri``, globally distinct).  Broadcast ``is_in`` under the byte
    budget; Bloom + exact keyed semi-join above it."""
    from ontoea_ray.functions.broadcast import assemble_value_set_ref

    vocab, ref = assemble_value_set_ref(vocab, "uri")
    if ref is not None:
        return _filter_in_set(triples, list(cols), ref)
    return _semi_join_cols(triples, list(cols), vocab)


def remove_unlinked_triples(triples: ray.data.Dataset, linked_entities: set[str]) -> ray.data.Dataset:
    """Keep triples with BOTH endpoints in the linked set (semi-join ×2).

    Reference-parity signature (driver set in, kgs.py:643-654); the
    scale path is :func:`filter_endpoints_in` on a vocabulary Dataset."""
    ref = ray.put(pa.array(sorted(linked_entities), pa.string()))
    return _filter_in_set(triples, ["subj", "obj"], ref)


def triple_entities(triples: ray.data.Dataset) -> set[str]:
    """Distinct endpoint vocabulary as a driver set — reference-parity
    helper for the small tiers ONLY (kgs.py:623-640); the fixpoint no
    longer calls it.  Scale path: :func:`_distinct_uris` (a Dataset)."""
    rows = _distinct_uris(triples, ["subj", "obj"]).take_all()
    return {r["uri"] for r in rows}


def remove_no_triples_link(
    links: list[tuple[str, str]], kg1_entities: set[str], kg2_entities: set[str]
) -> list[tuple[str, str]]:
    """Keep links whose e1 has KG1 triples and e2 has KG2 triples
    (reference-parity list signature, kgs.py:617-621)."""
    return [(a, b) for a, b in links if a in kg1_entities and b in kg2_entities]


def _links_to_ds(links) -> ray.data.Dataset:
    if isinstance(links, ray.data.Dataset):
        return links
    e1 = pa.array([a for a, _ in links], pa.string())
    e2 = pa.array([b for _, b in links], pa.string())
    return ray.data.from_arrow(pa.table({"e1": e1, "e2": e2}))


def prune_to_consistency_ds(
    triples1: ray.data.Dataset,
    triples2: ray.data.Dataset,
    links: ray.data.Dataset,
    *,
    max_rounds: int = 10000,
) -> tuple[ray.data.Dataset, ray.data.Dataset, ray.data.Dataset]:
    """Distributed fixpoint (reference kgs.py:599-615): alternate the two
    filters until the triple counts are stable.  All link/entity sets are
    Datasets end-to-end — each round is two budget-switched endpoint
    filters plus two link-side semi-joins; the only driver state is the
    pair of convergence counts."""
    t1, t2, lk = triples1, triples2, links
    for _ in range(max_rounds):
        linked = _distinct_uris(lk, ["e1", "e2"])
        t1 = filter_endpoints_in(t1, linked).materialize()
        t2 = filter_endpoints_in(t2, linked).materialize()
        n1, n2 = t1.count(), t2.count()
        lk = filter_endpoints_in(lk, _distinct_uris(t1, ["subj", "obj"]), cols=["e1"])
        lk = filter_endpoints_in(lk, _distinct_uris(t2, ["subj", "obj"]), cols=["e2"])
        lk = lk.materialize()
        linked = _distinct_uris(lk, ["e1", "e2"])
        t1 = filter_endpoints_in(t1, linked).materialize()
        t2 = filter_endpoints_in(t2, linked).materialize()
        if t1.count() == n1 and t2.count() == n2:
            break
    return t1, t2, lk


def prune_to_consistency(
    triples1: ray.data.Dataset,
    triples2: ray.data.Dataset,
    links: list[tuple[str, str]],
    *,
    max_rounds: int = 10000,
) -> tuple[ray.data.Dataset, ray.data.Dataset, list[tuple[str, str]]]:
    """Reference-parity wrapper over :func:`prune_to_consistency_ds`:
    list links in / list links out (the links side IS small — seed
    alignment pairs — but the entity vocabulary never touches the
    driver)."""
    t1, t2, lk = prune_to_consistency_ds(
        triples1, triples2, _links_to_ds(links), max_rounds=max_rounds
    )
    out = [(r["e1"], r["e2"]) for r in lk.take_all()]
    # preserve the caller's link order (reference keeps list order)
    pos = {pair: i for i, pair in enumerate(links)}
    out.sort(key=lambda p: pos.get(p, len(pos)))
    return t1, t2, out
