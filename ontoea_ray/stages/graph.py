"""Distributed connected components by min-label propagation.

The dedup story needs this: near-duplicate PAIRS (LSH-verified or exact
Jaccard) must become duplicate CLUSTERS before a keep-one policy can run —
pairs (a,b),(b,c) are one 3-document group.  Components also back KG
entity-merge (same-as edges -> merged entity).

Algorithm: every node starts labeled with min(own id, neighbor ids); each
round a node takes the min of its label and its neighbors' labels; fixpoint
= each node holds the min id of its component.  One round = one distributed
hash join (edges x labels on the neighbor key) + one keyed min-aggregate —
both the engine's standard one-exchange wide ops.  Convergence is detected
with a NON-INCREASING global label sum (labels only ever decrease — the min
always includes the node's previous label, and pointer jumping replaces
label with label[label] <= label — so an unchanged sum means a fixpoint):
an O(1)-state aggregate instead of a full old-vs-new join.  Labels are
materialized per round so lineage stays O(1) deep.

Each round ALSO pointer-jumps (label <- label[label], one more hash join),
which halves the remaining propagation distance every round — the
large-star idea from Kiveris et al., "Connected Components in MapReduce
and Beyond" — so rounds are O(log diameter), not O(diameter): a 1M-link
chain converges in ~20 rounds, and duplicate-cluster graphs (near-cliques)
in 2-3.

Scale shape: per round the data moved is O(|edges| + |nodes|), partitioned
by key hash at a width sized from the edge table's bytes (grows with data,
O(cpus) floor) — no driver-side state beyond the O(1) convergence sums.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ontoea_ray.functions.join import hash_join
from ontoea_ray.functions.shuffle import compact, sized_width


def _bidirect(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    # build (node, nb) in both directions with one concat per column
    def both(b: pa.Table) -> pa.Table:
        a = b[src].combine_chunks().cast(pa.int64())
        c = b[dst].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "node": pa.chunked_array([a, c]).combine_chunks(),
                "nb": pa.chunked_array([c, a]).combine_chunks(),
            }
        )

    return edges.map_batches(both, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """-> Dataset(node, component) where component = min node id reachable.

    Nodes are every id appearing in ``edges`` (isolated docs never enter a
    pair, so they are their own trivial cluster and need no row)."""
    bidir = _bidirect(edges, src, dst).materialize()
    # exchange width from DATA size (tiny graph -> 1 partition, no
    # per-partition barrier tax; 100 TB edge table -> cluster width)
    width = sized_width(bidir.size_bytes())

    # init fused with round 1: label = min(own id, direct neighbor ids)
    labels = (
        bidir.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.chunked_array([b["node"], b["node"]]).combine_chunks(),
                    "label": pa.chunked_array(
                        [b["node"].combine_chunks(), pc.min_element_wise(b["node"], b["nb"]).combine_chunks()]
                    ).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("label")
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        nb_labels = labels.map_batches(
            lambda b: pa.table({"nb": b["node"], "cand": b["label"]}),
            batch_format="pyarrow",
        )
        proposals = hash_join(bidir, nb_labels, on=["nb"], width=width).map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["cand"]}),
            batch_format="pyarrow",
        )
        # materialize BEFORE the pointer jump: the jump consumes the new
        # labels twice (as source and as jump target), and an
        # unmaterialized aggregate chain would re-execute per consumer
        # compact before the wide op: union doubles the block count every
        # round (labels blocks + proposals blocks) and sort-based groupby
        # inherits it — without this the block count is 2^rounds
        labels = (
            compact(labels.union(proposals), width)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        # pointer jumping: label <- label[label]  (halves the remaining
        # distance to the component min every round, so rounds are
        # O(log diameter) instead of O(diameter) — the large-star idea)
        as_target = labels.map_batches(
            lambda b: pa.table({"label": b["node"], "label2": b["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            hash_join(labels, as_target, on=["label"], how="left", width=width)
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "label": pc.coalesce(b["label2"], b["label"]),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:  # labels only decrease -> fixpoint
            break
        prev_sum = cur_sum

    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )


def merge_entities(
    triples: ray.data.Dataset,
    sameas: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    entity_cols: tuple[str, ...] = ("subj", "obj"),
    group_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    sum_cols: tuple[str, ...] = ("n_mentions",),
    min_cols: tuple[str, ...] = ("first_url",),
) -> ray.data.Dataset:
    """Transitive same-as entity merge over a KG edge table.

    The KG-construct step after canonicalization: pairwise same-as
    evidence (string URI pairs) is closed into equivalence classes with
    :func:`connected_components`, every entity column is rewritten to its
    class representative (the LEXICOGRAPHICALLY SMALLEST URI — a
    deterministic choice any node can compute locally), and the edge table
    is re-aggregated so merged duplicates collapse into one edge with
    summed evidence.  Reference analog: the canonicalizer's
    cluster-key merge (stages/canonicalize.py) handles trivially-equal
    surfaces; this stage handles arbitrary, transitive same-as graphs.

    Scale shape: the same-as vocabulary (distinct entity URIs under merge)
    is dictionary-encoded to dense ordered int ids (sort + metadata
    zip_with_index — rank order == lexicographic order, so CC's min-id
    component representative IS the min URI); everything else is the
    engine's standard one-exchange joins.  No driver-side state.
    """
    from ray.data.aggregate import Count, Min, Sum

    from ontoea_ray.state.ids import zip_with_index

    # 1. ordered vocabulary of nodes under merge: (uri, nid), nid = lex rank
    def _both(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uri": pa.chunked_array(
                    [b[src].combine_chunks().cast(pa.string()),
                     b[dst].combine_chunks().cast(pa.string())]
                ).combine_chunks()
            }
        )

    vocab = zip_with_index(
        compact(sameas.map_batches(_both, batch_format="pyarrow"))
        .groupby("uri")
        .aggregate(Count(alias_name="_c"))
        .map_batches(lambda b: pa.table({"uri": b["uri"]}), batch_format="pyarrow")
        .sort("uri"),
        "nid",
    ).materialize()
    width = sized_width(vocab.size_bytes())

    aggs = [Sum(c, alias_name=c) for c in sum_cols] + [Min(c, alias_name=c) for c in min_cols]
    if vocab.count() == 0:  # no same-as evidence: identity merge
        return compact(triples).groupby(list(group_cols)).aggregate(*aggs)

    # 2. encode string pairs -> int edges
    enc_a = hash_join(sameas, vocab, on=[src], right_on=["uri"], width=width).map_batches(
        lambda b: pa.table({"id_a": b["nid"], dst: b[dst]}), batch_format="pyarrow"
    )
    int_edges = hash_join(enc_a, vocab, on=[dst], right_on=["uri"], width=width).map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["nid"]}), batch_format="pyarrow"
    )

    # 3. components, 4. decode (node uri, representative uri)
    cc = connected_components(int_edges, src="id_a", dst="id_b")
    dec = hash_join(cc, vocab, on=["node"], right_on=["nid"], width=width).map_batches(
        lambda b: pa.table({"uri": b["uri"], "component": b["component"]}),
        batch_format="pyarrow",
    )
    rep_map = hash_join(dec, vocab, on=["component"], right_on=["nid"], width=width).map_batches(
        lambda b: pa.table({"uri": b["uri"], "rep": b["uri_r"]}),
        batch_format="pyarrow",
    ).materialize()

    # 5. rewrite entity columns (left join: unmerged entities keep their uri)
    out = triples
    for col in entity_cols:
        out = hash_join(out, rep_map, on=[col], right_on=["uri"], how="left").map_batches(
            lambda b, c=col: b.set_column(
                b.schema.get_field_index(c), c, pc.coalesce(b["rep"], b[c])
            ).drop_columns(["rep"]),
            batch_format="pyarrow",
        )

    # 6. re-aggregate merged edges
    return compact(out).groupby(list(group_cols)).aggregate(*aggs)
