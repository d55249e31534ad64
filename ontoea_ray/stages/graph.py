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
    from ray.data.aggregate import Count

    from ontoea_ray.functions.shuffle import keyed_aggregate
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

    # multi-key corpus-proportional reduction: pkey-partitioned merge, not
    # the engine sort aggregate (see functions/shuffle.keyed_aggregate)
    def _reagg(ds):
        return keyed_aggregate(
            ds, list(group_cols), sums=list(sum_cols), mins=list(min_cols)
        )

    if vocab.count() == 0:  # no same-as evidence: identity merge
        return _reagg(triples)

    # 2. encode string pairs -> int edges
    enc_a = hash_join(sameas, vocab, on=[src], right_on=["uri"], width=width).map_batches(
        lambda b: pa.table({"id_a": b["nid"], dst: b[dst]}), batch_format="pyarrow"
    )
    int_edges = hash_join(enc_a, vocab, on=[dst], right_on=["uri"], width=width).map_batches(
        lambda b: pa.table({"id_a": b["id_a"], "id_b": b["nid"]}), batch_format="pyarrow"
    )

    # 3. components (size-adaptive: same-as graphs are usually small
    # relative to the triple table; the gate keeps corpus-sized ones on the
    # distributed path), 4. decode (node uri, representative uri)
    cc = connected_components_auto(int_edges, src="id_a", dst="id_b")
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
    return _reagg(out)


def pagerank(
    edges: ray.data.Dataset,
    *,
    src: str = "subj",
    dst: str = "obj",
    iters: int = 5,
    scale: int = 10**9,
    damping_pct: int = 85,
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> ray.data.Dataset:
    """Integer-arithmetic PageRank over an edge table — hub scoring for the
    KG (which entities dominate the canonicalization shuffle; the salting
    targets).

    Deliberately INTEGER power iteration so the result is bit-deterministic
    under ANY execution order (int addition is associative/commutative —
    float partial sums are not) and hence exactly DuckDB-replayable:

    - every node starts with ``scale`` rank units;
    - each iteration a node with out-degree g sends ``floor(m / g)`` units
      along EVERY out-edge (per-edge flooring, replayed identically in
      SQL; the flooring remainder and dangling-node mass are dropped — a
      documented, deterministic leak rather than a redistribution shuffle);
    - new mass = ``(100-damping_pct)*scale//100 + damping_pct*recv//100``.

    Per iteration: two one-exchange hash joins (mass x degree, edges x
    per-node quotient) + one keyed sum + one left join back onto the node
    vocabulary — all O(|edges|+|nodes|) movement, no driver state.  Mass is
    materialized per round so lineage stays O(1) deep.  Returns
    ``(node:string, rank_units:int64)``.

    ``checkpoint_dir`` (exchange plan only — a checkpointing caller is in
    the huge-graph regime, so the broadcast fast path is disabled):
    persists each round's mass table as partitioned parquet plus a
    ``_ROUND_COMPLETE`` marker; a restarted run resumes from the highest
    complete round (the integer iteration is a pure function of the graph
    + round, so a resumed run is bit-identical to an uninterrupted one —
    pinned by test).  ``stats['rounds_run']`` reports how many rounds
    actually executed.
    """
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": b[src].combine_chunks().cast(pa.string()),
                "d": b[dst].combine_chunks().cast(pa.string()),
            }
        )

    from ontoea_ray.functions.broadcast import assemble_table_ref

    e, tbl_ref = assemble_table_ref(
        compact(edges.map_batches(_proj, batch_format="pyarrow")),
        columns=["s", "d"],
        budget=0 if checkpoint_dir else None,
    )
    if tbl_ref is not None:
        # under the broadcast budget the WHOLE power iteration runs inside
        # one Ray task (np.unique factorize + int64 scatter-add rounds) —
        # bit-equal to the exchange plan below (integer mass is execution-
        # order independent), pinned by a budget=1 test
        _iters, _scale, _damp = iters, scale, damping_pct

        @ray.remote
        def _pr(tref) -> pa.Table:
            import numpy as np

            s = tref["s"].to_pandas().to_numpy(object)
            d = tref["d"].to_pandas().to_numpy(object)
            nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
            si, di = inv[: len(s)], inv[len(s):]
            deg = np.bincount(si, minlength=len(nodes))
            b = (100 - _damp) * _scale // 100
            m = np.full(len(nodes), _scale, np.int64)
            for _ in range(_iters):
                q = m[si] // deg[si]
                recv = np.zeros(len(nodes), np.int64)
                np.add.at(recv, di, q)
                m = b + _damp * recv // 100
            return pa.table(
                {
                    "node": pa.array(nodes.astype(str), pa.string()),
                    "rank_units": pa.array(m, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_pr.remote(tbl_ref)])

    width = sized_width(e.size_bytes())

    def _nodes_part(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array([b["s"].combine_chunks(), b["d"].combine_chunks()])
        )
        return pa.table({"node": u})

    nodes = (
        e.map_batches(_nodes_part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "m": pa.array(np.full(len(b), scale, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    deg = e.groupby("s").aggregate(Count(alias_name="deg")).materialize()

    base = (100 - damping_pct) * scale // 100
    mass = nodes  # (node, m)
    start_round = 0
    if checkpoint_dir:
        import os

        for r in range(iters, 0, -1):
            rdir = os.path.join(checkpoint_dir, f"round_{r}")
            if os.path.exists(os.path.join(rdir, "_ROUND_COMPLETE")):
                mass = ray.data.read_parquet(rdir).materialize()
                start_round = r
                break
    if stats is not None:
        stats["rounds_run"] = iters - start_round
    for _round in range(start_round, iters):
        quot = hash_join(deg, mass, on=["s"], right_on=["node"], width=width).map_batches(
            lambda b: pa.table(
                {
                    "s": b["s"],
                    "q": pa.array(
                        np.asarray(b["m"].combine_chunks(), np.int64)
                        // np.asarray(b["deg"].combine_chunks(), np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sent = hash_join(e, quot, on=["s"], width=width).map_batches(
            lambda b: pa.table({"d": b["d"], "q": b["q"]}), batch_format="pyarrow"
        )
        recv = compact(sent).groupby("d").aggregate(Sum("q", alias_name="recv"))
        mass = (
            hash_join(nodes, recv, on=["node"], right_on=["d"], how="left", width=width)
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "m": pa.array(
                            base
                            + damping_pct
                            * np.asarray(
                                pc.coalesce(b["recv"], pa.scalar(0, pa.int64())),
                                np.int64,
                            )
                            // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if checkpoint_dir:
            import os

            rdir = os.path.join(checkpoint_dir, f"round_{_round + 1}")
            os.makedirs(rdir, exist_ok=True)
            mass.write_parquet(rdir)
            # marker AFTER the (synchronous) write: a crash mid-write
            # leaves an incomplete round that resume ignores
            with open(os.path.join(rdir, "_ROUND_COMPLETE"), "w") as f:
                f.write("ok")
    return mass.map_batches(
        lambda b: pa.table({"node": b["node"], "rank_units": b["m"]}),
        batch_format="pyarrow",
    )


def personalized_pagerank(
    edges: ray.data.Dataset,
    seeds: ray.data.Dataset,
    *,
    src: str = "subj",
    dst: str = "obj",
    seed_col: str = "node",
    iters: int = 5,
    scale: int = 10**9,
    damping_pct: int = 85,
) -> ray.data.Dataset:
    """Integer-arithmetic personalized PageRank (random walk with restart
    to a SEED set) — the entity-relatedness / local-relevance primitive
    (Jeh & Widom 2003): mass restarts only at seed nodes, so rank measures
    proximity TO THE SEEDS rather than global hubness.

    Same bit-deterministic integer conventions as :func:`pagerank` (per-
    edge ``floor(m/deg)`` sends, dropped flooring/dangling mass), with two
    deliberate restart conventions the oracle replays: every seed receives
    the FULL restart base ``(100-damping_pct)*scale//100`` (not a split of
    it — keeps mass integral per seed), and initial mass is ``scale`` on
    seeds / 0 elsewhere.  Non-seed nodes therefore hold exactly the mass
    that flowed to them from seeds.

    Two value-equal plans: under the broadcast budget the whole iteration
    runs in one Ray task (np.unique factorize + scatter-add, seed mask via
    ``np.isin``); above it each round is the same two hash joins + keyed
    sum as :func:`pagerank`, with the node vocabulary carrying a persistent
    ``seed`` flag column from ONE left join — no driver state either way.
    Returns ``(node:string, rank_units:int64)``.
    """
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from ontoea_ray.functions.broadcast import (
        assemble_table_ref,
        assemble_value_set_ref,
    )

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": b[src].combine_chunks().cast(pa.string()),
                "d": b[dst].combine_chunks().cast(pa.string()),
            }
        )

    sd = seeds.map_batches(
        lambda b: pa.table({"node": b[seed_col].combine_chunks().cast(pa.string())}),
        batch_format="pyarrow",
    )
    e, tbl_ref = assemble_table_ref(
        compact(edges.map_batches(_proj, batch_format="pyarrow")), columns=["s", "d"]
    )
    sd, seed_ref = assemble_value_set_ref(sd, "node")
    if tbl_ref is not None and seed_ref is not None:
        _iters, _scale, _damp = iters, scale, damping_pct

        @ray.remote
        def _ppr(tref, sref) -> pa.Table:
            import numpy as np

            s = tref["s"].to_pandas().to_numpy(object)
            d = tref["d"].to_pandas().to_numpy(object)
            nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
            si, di = inv[: len(s)], inv[len(s):]
            deg = np.bincount(si, minlength=len(nodes))
            seedvals = np.asarray(pa.chunked_array([sref]).to_pandas().to_numpy(object))
            is_seed = np.isin(nodes, seedvals)
            b = (100 - _damp) * _scale // 100
            m = np.where(is_seed, _scale, 0).astype(np.int64)
            for _ in range(_iters):
                q = np.zeros(len(si), np.int64)
                has = deg[si] > 0
                q[has] = m[si][has] // deg[si][has]
                recv = np.zeros(len(nodes), np.int64)
                np.add.at(recv, di, q)
                m = is_seed.astype(np.int64) * b + _damp * recv // 100
            return pa.table(
                {
                    "node": pa.array(nodes.astype(str), pa.string()),
                    "rank_units": pa.array(m, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_ppr.remote(tbl_ref, seed_ref)])

    width = sized_width(e.size_bytes())

    def _nodes_part(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array([b["s"].combine_chunks(), b["d"].combine_chunks()])
        )
        return pa.table({"node": u})

    sflag = (
        sd.groupby("node")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "seed": pa.array(np.ones(len(b), np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
    )
    nodes = (
        hash_join(
            e.map_batches(_nodes_part, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Count(alias_name="_c"))
            .drop_columns(["_c"]),
            sflag,
            on=["node"],
            how="left",
            width=width,
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "seed": pc.coalesce(b["seed"], pa.scalar(0, pa.int64())),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    deg = e.groupby("s").aggregate(Count(alias_name="deg")).materialize()

    base = (100 - damping_pct) * scale // 100
    mass = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "m": pc.multiply(b["seed"], pa.scalar(scale, pa.int64())),
            }
        ),
        batch_format="pyarrow",
    )
    for _ in range(iters):
        quot = hash_join(deg, mass, on=["s"], right_on=["node"], width=width).map_batches(
            lambda b: pa.table(
                {
                    "s": b["s"],
                    "q": pa.array(
                        np.asarray(b["m"].combine_chunks(), np.int64)
                        // np.asarray(b["deg"].combine_chunks(), np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sent = hash_join(e, quot, on=["s"], width=width).map_batches(
            lambda b: pa.table({"d": b["d"], "q": b["q"]}), batch_format="pyarrow"
        )
        recv = compact(sent).groupby("d").aggregate(Sum("q", alias_name="recv"))
        mass = (
            hash_join(nodes, recv, on=["node"], right_on=["d"], how="left", width=width)
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "m": pa.array(
                            np.asarray(b["seed"].combine_chunks(), np.int64) * base
                            + damping_pct
                            * np.asarray(
                                pc.coalesce(b["recv"], pa.scalar(0, pa.int64())),
                                np.int64,
                            )
                            // 100
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
    return mass.map_batches(
        lambda b: pa.table({"node": b["node"], "rank_units": b["m"]}),
        batch_format="pyarrow",
    )


def hits_rounds(
    edges: ray.data.Dataset,
    *,
    src: str = "src_domain",
    dst: str = "dst_domain",
    rounds: int = 3,
    scale: int = 1000,
) -> ray.data.Dataset:
    """Integer-arithmetic HITS (Kleinberg 1999) over an edge table:
    ``(node, hub_units, auth_units)`` after R alternating rounds.

    Deliberately INTEGER like :func:`pagerank`, so the result is
    bit-deterministic under any execution order and exactly
    DuckDB-replayable: every node starts with ``scale`` hub units; each
    round computes raw authority ``a_raw(v) = Σ_{(u,v)} h(u)`` (multi-edges
    weight naturally), rescales ``a = a_raw * scale // max(a_raw)``, then
    raw hubs ``h_raw(u) = Σ_{(u,v)} a(v)`` rescaled the same way — the
    max-normalization replaces the float L2 norm with an exact scalar the
    SQL replays (products stay inside int64: values ≤ scale, so raw sums ≤
    weighted-degree · scale, guarded below).

    Two value-equal plans (budget=1 pytest): under the broadcast budget the
    whole iteration runs in one Ray task (np.unique factorize + int64
    scatter-add); above it each half-round is one planner-routed hash join
    (units onto the weighted edge list) + one keyed sum + one O(1) scalar
    max — no node table ever lands on the driver beyond that scalar."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": b[src].combine_chunks().cast(pa.string()),
                "d": b[dst].combine_chunks().cast(pa.string()),
            }
        )

    e, tbl_ref = assemble_table_ref(
        compact(edges.map_batches(_proj, batch_format="pyarrow")), columns=["s", "d"]
    )
    if tbl_ref is not None:
        _rounds, _scale = rounds, scale

        @ray.remote
        def _hits(tref) -> pa.Table:
            import numpy as np

            s = tref["s"].to_pandas().to_numpy(object)
            d = tref["d"].to_pandas().to_numpy(object)
            nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
            si, di = inv[: len(s)], inv[len(s):]
            # raw sums are bounded by max-degree * scale; rescale multiplies
            # by scale again — guard the int64 headroom explicitly
            max_deg = int(
                max(
                    np.bincount(si, minlength=1).max(),
                    np.bincount(di, minlength=1).max(),
                )
            )
            if max_deg * _scale * _scale >= np.iinfo(np.int64).max:
                raise ValueError("hits_rounds: scale too large for int64 rescale")
            h = np.full(len(nodes), _scale, np.int64)
            a = np.zeros(len(nodes), np.int64)

            def half(units, from_i, to_i):
                raw = np.zeros(len(nodes), np.int64)
                np.add.at(raw, to_i, units[from_i])
                mx = raw.max() if len(raw) else 0
                return raw * _scale // mx if mx > 0 else raw

            for _ in range(_rounds):
                a = half(h, si, di)
                h = half(a, di, si)
            return pa.table(
                {
                    "node": pa.array(nodes.astype(str), pa.string()),
                    "hub_units": pa.array(h, pa.int64()),
                    "auth_units": pa.array(a, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_hits.remote(tbl_ref)])

    # ---- exchange plan: weighted edge list + per-half-round join/sum/max
    width = sized_width(e.size_bytes())
    we = keyed_aggregate(e, ["s", "d"], count_alias="w", width=width).materialize()

    def _nodes_part(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array([b["s"].combine_chunks(), b["d"].combine_chunks()])
        )
        return pa.table({"node": u})

    nodes = (
        we.map_batches(_nodes_part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )

    def _units(ds, col):
        # (node, u) view of a (node, <col>) table
        return ds.map_batches(
            lambda b: pa.table({"node": b["node"], "u": b[col].combine_chunks()}),
            batch_format="pyarrow",
        )

    def half_round(units, join_key, out_key):
        """units(node,u) -> rescaled sums at the other endpoint."""
        contrib = hash_join(we, units, on=[join_key], right_on=["node"], width=width).map_batches(
            lambda b: pa.table(
                {
                    "node": b[out_key].combine_chunks(),
                    "raw": pa.array(
                        np.asarray(b["w"].combine_chunks(), np.int64)
                        * np.asarray(b["u"].combine_chunks(), np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = keyed_aggregate(
            compact(contrib), ["node"], sums=["raw"], width=width
        ).materialize()
        mx = int(sums.max("raw") or 0)  # O(1) scalar on the driver

        def rescale(b: pa.Table) -> pa.Table:
            raw = np.asarray(b["raw"].combine_chunks(), np.int64)
            out = raw * scale // mx if mx > 0 else raw
            return pa.table({"node": b["node"], "u": pa.array(out, pa.int64())})

        return sums.map_batches(rescale, batch_format="pyarrow").materialize()

    h = nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "u": pa.array(np.full(len(b), scale, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    a = None
    for _ in range(max(rounds, 0)):
        # authority: hub units flow ALONG edges (join at s, land at d);
        # hubs: authority units flow BACK (join at d, land at s)
        a = half_round(h, "s", "d")
        h = half_round(a, "d", "s")
    out = hash_join(nodes, h, on=["node"], how="left", width=width)
    out = hash_join(out, a if a is not None else h, on=["node"], how="left",
                    rsuffix="_a", width=width)

    def final(b: pa.Table) -> pa.Table:
        hu = pc.coalesce(b["u"], pa.scalar(0, pa.int64()))
        au = pc.coalesce(b["u_a"], pa.scalar(0, pa.int64()))
        return pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.string()),
                "hub_units": hu.cast(pa.int64()),
                "auth_units": au.cast(pa.int64()),
            }
        )

    return out.map_batches(final, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# broadcast-CSR neighborhood kernels (triangles, two-hop)
# ---------------------------------------------------------------------------
#
# Regime: the ORIENTED (a < b) edge list fits in worker memory (|E| * 24 B —
# 20M edges = 480 MB), while the wedge expansion (sum of deg^2, easily 50-100x
# |E|) does NOT.  Shuffling wedges is therefore the wrong plan: put the CSR
# arrays in the object store ONCE and iterate nodes with plain tasks — each
# task's ray.get is a zero-copy mmap of the shared numpy arrays (no per-actor
# copy, no pool warm-up), and wedges are expanded + tested worker-locally in
# bounded chunks, so zero wedge bytes ever enter the object store.  Measured
# at sf0.1 (1.2M edges, 49M wedges): exchange-based triangle join 185 s ->
# CSR broadcast ~5 s on the same session.  Above the caller's broadcast edge
# budget use the exchange plans instead — the crossover is worker RAM.

def _csr_from_table(tbl, src: str, dst: str):
    """Oriented edge Arrow table -> CSR + sorted encoded-pair form, deduping
    (np.unique over the encoded pairs) so callers can hand in raw pair
    emissions without a distinct exchange.  Runs INSIDE the assembly Ray
    task (`_broadcast_csr`) so no |E|-sized array ever lives on the
    driver; callers gate on their broadcast edge budget first."""
    import numpy as np

    a = tbl[src].to_pandas().to_numpy(np.int64)
    b = tbl[dst].to_pandas().to_numpy(np.int64)
    m = int(max(a.max(), b.max())) + 1 if len(a) else 1
    if m >= np.iinfo(np.int64).max // m:
        raise ValueError("node-id space too large for int64 pair encoding; remap ids first")
    enc = np.unique(a * m + b)  # sorted distinct pairs, searchsorted-ready
    a, b = enc // m, enc % m
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(a, minlength=m), out=indptr[1:])
    # Packed bitset over the m*m oriented-pair space: one memory touch per
    # membership probe instead of searchsorted's ~log|E| branchy touches
    # (measured 16 s -> 5 s single-thread on the sf0.1 49M-wedge pass).
    # Quadratic in the node-id space, so gated on a byte budget — beyond it
    # probes fall back to searchsorted on `enc`.
    bits = None
    nbytes = (m * m + 7) // 8
    if nbytes <= _BITSET_MAX_BYTES:
        bits = np.zeros(nbytes, np.uint8)
        np.bitwise_or.at(bits, enc >> 3, np.uint8(1) << (enc & 7).astype(np.uint8))
    return indptr, b, enc, m, bits


def _bitset_max_bytes() -> int:
    import os

    return int(os.environ.get("ONTOEA_GRAPH_BITSET_MAX_BYTES", 128 << 20))


_BITSET_MAX_BYTES = _bitset_max_bytes()


def _gather_segments(indptr, indices, keys):
    """(seg, values, counts) of the concatenated adjacency lists of
    ``keys`` — pure index arithmetic, no Python loop."""
    import numpy as np

    start, end = indptr[keys], indptr[keys + 1]
    cnt = end - start
    total = int(cnt.sum())
    seg = np.repeat(np.arange(len(keys), dtype=np.int64), cnt)
    offs = np.zeros(len(keys), np.int64)
    np.cumsum(cnt[:-1], out=offs[1:])
    pos = np.arange(total, dtype=np.int64) - offs[seg] + start[seg]
    return seg, indices[pos], cnt


def _triangle_chunk(indptr, indices, enc, m, bits, nodes) -> int:
    """Triangles closed at ``nodes``: emit each node's in-adjacency wedge
    pairs (repeat/cumsum arithmetic) and membership-test them with one
    searchsorted against the sorted encoded edge array."""
    import numpy as np

    seg, nb, deg = _gather_segments(indptr, indices, nodes)
    if not len(nb):
        return 0
    offs = np.zeros(len(nodes), np.int64)
    np.cumsum(deg[:-1], out=offs[1:])
    local_i = np.arange(len(nb), dtype=np.int64) - offs[seg]
    rep = deg[seg] - 1 - local_i
    total = int(rep.sum())
    if total == 0:
        return 0
    # the expansion arrays dominate the kernel's memory traffic: run them
    # in int32 when the composite key space m^2 fits (the kernel is
    # bandwidth-bound — halving element width halves wall time on a
    # saturated memory bus); chunk length < 2^31 by _CHUNK_PAIRS
    it = np.int32 if m * m < 2**31 else np.int64
    row = np.repeat(np.arange(len(nb), dtype=it), rep)
    starts = np.zeros(len(nb), it)
    starts[1:] = np.cumsum(rep[:-1], dtype=it)
    k = np.arange(total, dtype=it) - starts[row]
    nbt = nb if it is np.int64 else nb.astype(it)
    b1 = nbt[row]
    b2 = nbt[row + 1 + k]  # same segment: rep never crosses the boundary
    keys = b1 * it(m) + b2
    if bits is not None:
        hit = bits[keys >> 3] & (np.uint8(1) << (keys & 7).astype(np.uint8))
        return int(np.count_nonzero(hit))
    pos = np.searchsorted(enc, keys.astype(np.int64))
    ok = pos < len(enc)
    return int(np.count_nonzero(enc[pos[ok]] == keys[ok].astype(np.int64)))


def _two_hop_chunk(indptr, indices, nodes):
    """(nodes_with_hits, distinct-2-hop counts): two-level adjacency
    gather, per-segment distinct via ONE single-key sort (seg * m + c —
    both factors < m, so the composite key is collision-free int64)."""
    import numpy as np

    seg1, b, _ = _gather_segments(indptr, indices, nodes)
    if not len(b):
        return None
    seg2, c, _ = _gather_segments(indptr, indices, b)
    if not len(c):
        return None
    seg_node = seg1[seg2]
    m = len(indptr)  # > any c value
    # sort dominates the kernel; run it in int32 when the composite key
    # space len(nodes)*m fits — half the bytes through a saturated bus
    if len(nodes) * m < 2**31:
        key = np.sort(seg_node.astype(np.int32) * np.int32(m) + c.astype(np.int32))
    else:
        key = np.sort(seg_node * m + c)
    first = np.ones(len(key), bool)
    first[1:] = key[1:] != key[:-1]
    cnt = np.bincount((key[first] // m), minlength=len(nodes))
    keep = cnt > 0
    return nodes[keep], cnt[keep]


_CHUNK_PAIRS = 4_000_000  # per-task expansion cap (pairs / gathered elems)


def _triangle_fn(ref):
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import ray as _ray

        indptr, indices, enc, m, bits = _ray.get(ref)  # zero-copy plasma mmap
        nodes = np.asarray(batch["id"].combine_chunks(), np.int64)
        nodes = nodes[nodes < m]
        deg = indptr[nodes + 1] - indptr[nodes]
        nodes, deg = nodes[deg > 1], deg[deg > 1]
        tri = 0
        if len(nodes):
            chunk = np.cumsum(deg * (deg - 1) // 2) // _CHUNK_PAIRS
            for c in np.unique(chunk):
                tri += _triangle_chunk(indptr, indices, enc, m, bits, nodes[chunk == c])
        return pa.table({"n": pa.array([tri], pa.int64())})

    return fn


def _two_hop_fn(ref):
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np
        import ray as _ray

        indptr, indices, enc, m, _bits = _ray.get(ref)
        nodes = np.asarray(batch["id"].combine_chunks(), np.int64)
        nodes = nodes[nodes < m]
        deg = indptr[nodes + 1] - indptr[nodes]
        nodes = nodes[deg > 0]
        empty = pa.table(
            {"node": pa.array([], pa.int64()), "n_two_hop": pa.array([], pa.int64())}
        )
        if not len(nodes):
            return empty
        # exact expansion size per node = sum of its neighbors' degrees
        seg1, b, _ = _gather_segments(indptr, indices, nodes)
        degb = indptr[b + 1] - indptr[b]
        w = np.bincount(seg1, weights=degb, minlength=len(nodes)).astype(np.int64)
        chunk = np.cumsum(w) // _CHUNK_PAIRS
        outs = []
        for cid in np.unique(chunk):
            r = _two_hop_chunk(indptr, indices, nodes[chunk == cid])
            if r is not None:
                outs.append(r)
        if not outs:
            return empty
        n = np.concatenate([o[0] for o in outs])
        k = np.concatenate([o[1] for o in outs])
        return pa.table({"node": pa.array(n), "n_two_hop": pa.array(k.astype(np.int64))})

    return fn


def _broadcast_csr(edges: ray.data.Dataset, src: str, dst: str):
    """CSR tuple assembled INSIDE a Ray task from the edge table's block
    refs (the `assemble_table_ref` pattern) — the driver receives only the
    node count; the |E|-sized arrays go block refs -> task -> object
    store without ever landing driver-side."""
    import ray as _ray

    from ontoea_ray.functions.broadcast import assemble_table_ref

    # callers gate on their own (edge-count) broadcast budget, so the
    # assembly itself is uncapped here
    _, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst], budget=1 << 62
    )

    @_ray.remote(num_returns=2)
    def _build(tref):
        t = tref if not isinstance(tref, _ray.ObjectRef) else _ray.get(tref)
        csr = _csr_from_table(t, src, dst)
        return csr, csr[3]

    ref, m_ref = _build.remote(tbl_ref)
    return ref, int(_ray.get(m_ref))


def _node_range(m: int) -> ray.data.Dataset:
    # cpus*4 blocks: the per-node work (sum of neighbor degrees) is skewed
    # ~3x across contiguous id ranges, so over-split to smooth it.  Callers
    # must pass batch_size=None so each block IS a task's batch — a fixed
    # batch_size larger than m/blocks makes Ray Data bundle every block
    # into ONE task and the whole kernel runs serially (measured: the
    # 49M-wedge two-hop at sf0.1 got zero speedup at batch_size=65536).
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return ray.data.range(m, override_num_blocks=max(4, cpus * 4))


def triangle_count_broadcast(
    edges: ray.data.Dataset, *, src: str = "id_a", dst: str = "id_b"
) -> int:
    """Total triangles of an oriented (src < dst) edge/pair table (pairs may
    carry duplicates — the CSR build dedups) — broadcast-CSR node-iterator
    over plain tasks (see module comment for the regime / fallback)."""
    ref, m = _broadcast_csr(edges, src, dst)
    parts = _node_range(m).map_batches(
        _triangle_fn(ref), batch_format="pyarrow", batch_size=None
    )
    return sum(r["n"] for r in parts.take_all())


def two_hop_counts_broadcast(
    edges: ray.data.Dataset, *, src: str = "id_a", dst: str = "id_b"
) -> ray.data.Dataset:
    """Per-node distinct 2-hop neighborhood sizes over an oriented edge/pair
    table (duplicates allowed; deduped in the CSR build) — broadcast-CSR
    two-level gather (regime: see module comment)."""
    ref, m = _broadcast_csr(edges, src, dst)
    return _node_range(m).map_batches(
        _two_hop_fn(ref), batch_format="pyarrow", batch_size=None
    )


def _cc_broadcast_max_edges() -> int:
    import os

    return int(os.environ.get("ONTOEA_CC_BROADCAST_MAX_EDGES", 10_000_000))


def connected_components_auto(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Size-adaptive connected components, same output contract as
    :func:`connected_components` (component = min node id reachable).

    Duplicate-pair graphs are usually tiny relative to the corpus (dup
    fraction x cluster size), and the distributed fixpoint pays ~8 keyed
    exchanges of pure latency on them (measured 3.1 s for a 256-edge graph
    on 32 CPUs).  Below the broadcast edge budget the pair set is collected
    and closed with a driver union-find (min-id representative — identical
    labels); above it the distributed min-label propagation runs.  The
    budget is a gate, not an assumption: a corpus-sized same-as graph takes
    the distributed path."""
    import numpy as np

    mat = edges.materialize()
    if mat.count() > _cc_broadcast_max_edges():
        return connected_components(mat, src=src, dst=dst, max_rounds=max_rounds)

    df = mat.select_columns([src, dst]).to_pandas()
    a = df[src].to_numpy(np.int64)
    b = df[dst].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([a, b]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]  # path halving
            i = parent[i]
        return i

    for x, y in zip(a, b):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            # union by smaller NODE id so the final root is the min id
            if nodes[rx] < nodes[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([nodes[find(i)] for i in range(len(nodes))], np.int64)
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes), "component": pa.array(roots)})
    )


def _frontier_successors(
    edges: ray.data.Dataset,
    frontier: ray.data.Dataset,
    *,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> ray.data.Dataset:
    """DISTINCT successor nodes of ``frontier`` (column ``node``) over
    ``edges`` — the per-round BFS step, exact under both plans.

    Under the broadcast byte budget the frontier ships as an ``is_in``
    value set assembled INSIDE a Ray task (the driver never holds a node).
    Above it, the edges are pre-pruned with a Bloom of the frontier
    (shuffle-free, superset) and the survivors pass an exact keyed
    semi-join (`hash_join`) that kills the Bloom false positives — the
    round stays exact at any frontier size."""
    from ontoea_ray.functions.broadcast import assemble_value_set_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate

    frontier, vs_ref = assemble_value_set_ref(frontier, "node")
    if vs_ref is not None:

        def sel(b: pa.Table) -> pa.Table:
            import ray as _ray

            keep = pc.is_in(
                b[subj_col].combine_chunks(), value_set=_ray.get(vs_ref)
            )
            return pa.table({"node": b.filter(keep)[obj_col].combine_chunks()})

        matched = edges.map_batches(sel, batch_format="pyarrow")
    else:
        from ontoea_ray.stages.bloom import bloom_semi_join

        pruned = bloom_semi_join(
            edges, frontier, probe_key=subj_col, build_key="node", m_bits=1 << 20
        )
        j = hash_join(pruned, frontier, on=[subj_col], right_on=["node"], how="inner")
        matched = j.map_batches(
            lambda b: pa.table({"node": b[obj_col].combine_chunks()}),
            batch_format="pyarrow",
        )
    # per-block distinct first, then size the exchange by the MEASURED
    # partial bytes: a hop frontier is usually tiny, and paying cpus/2
    # partition barriers per BFS round on a few-KB table is pure latency
    # (at 100 TB the same call returns the full cluster width)
    part = matched.map_batches(
        lambda b: pa.table({"node": pc.unique(b["node"].combine_chunks())}),
        batch_format="pyarrow",
    ).materialize()
    w = sized_width(part.size_bytes())
    return keyed_aggregate(part, ["node"], count_alias="_c", width=w).drop_columns(["_c"])


def bfs_depths(
    edges: ray.data.Dataset,
    seeds: list,
    *,
    max_depth: int,
    subj_col: str = "subj",
    obj_col: str = "obj",
) -> ray.data.Dataset:
    """Hop distance (min depth <= max_depth) from ``seeds`` over directed
    ``edges``, fully distributed: each level is a Dataset (never a driver
    set), each round is one :func:`_frontier_successors` pass, and the
    final depth is a keyed min-aggregate over the depth-tagged levels —
    the exact semantics of the SQL level-CTE oracle (a node's depth is the
    FIRST level that reaches it).  Driver state: O(1) per round (each
    level is materialized so lineage stays flat, its rows stay in the
    object store)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    # infer the node type from the seeds (string URIs or int ids) so the
    # frontier value set matches the edge columns' type
    level = ray.data.from_arrow(
        pa.table({"node": pa.array(sorted(set(seeds)))})
    ).materialize()
    tagged = []

    def tag_depth(d: int):
        def fn(b: pa.Table) -> pa.Table:
            import numpy as np

            return pa.table(
                {
                    "node": b["node"].combine_chunks(),
                    "depth": pa.array(np.full(len(b), d, np.int64)),
                }
            )

        return fn

    tagged.append(level.map_batches(tag_depth(0), batch_format="pyarrow"))
    total_bytes = level.size_bytes() or 0
    for d in range(1, max_depth + 1):
        level = _frontier_successors(
            edges, level, subj_col=subj_col, obj_col=obj_col
        ).materialize()
        total_bytes += level.size_bytes() or 0
        tagged.append(level.map_batches(tag_depth(d), batch_format="pyarrow"))

    allv = tagged[0]
    for t in tagged[1:]:
        allv = allv.union(t)
    # levels are materialized -> the min-exchange is sized by their bytes
    from ontoea_ray.functions.shuffle import sized_width as _sw

    return keyed_aggregate(
        allv, ["node"], mins=["depth"], width=_sw(total_bytes or None)
    )


def _degree_table(
    edges: ray.data.Dataset, src: str, dst: str, *, width: int | None = None
) -> ray.data.Dataset:
    """(node, deg) over an undirected distinct edge table — combiner-first
    (endpoints exploded in-batch, one keyed exchange)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def explode(b: pa.Table) -> pa.Table:
        a = b[src].combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b[dst].combine_chunks().cast(a.type)])})

    ends = edges.map_batches(explode, batch_format="pyarrow")
    return keyed_aggregate(ends, ["node"], count_alias="deg", width=width)


def _edges_within(
    edges: ray.data.Dataset, keep: ray.data.Dataset, src: str, dst: str
) -> ray.data.Dataset:
    """Edges whose BOTH endpoints appear in ``keep`` (column ``node``) —
    exact under both plans: ``is_in`` value set assembled inside a Ray task
    under the broadcast byte budget, else per-endpoint Bloom prune + exact
    keyed semi-join (the `_frontier_successors` pattern)."""
    from ontoea_ray.functions.broadcast import assemble_value_set_ref

    keep, vs_ref = assemble_value_set_ref(keep, "node")
    if vs_ref is not None:

        def sel(b: pa.Table) -> pa.Table:
            import ray as _ray

            vals = _ray.get(vs_ref)
            if len(vals) == 0:
                return b.slice(0, 0)
            ka = pc.is_in(b[src].combine_chunks(), value_set=vals)
            kb = pc.is_in(b[dst].combine_chunks(), value_set=vals)
            return b.filter(pc.and_(ka, kb))

        return edges.map_batches(sel, batch_format="pyarrow")

    from ontoea_ray.stages.bloom import bloom_semi_join

    cur = edges
    for col in (src, dst):
        pruned = bloom_semi_join(cur, keep, probe_key=col, build_key="node", m_bits=1 << 20)
        cur = hash_join(pruned, keep, on=[col], right_on=["node"], how="inner")
    return cur.select_columns([src, dst])


def kcore_rounds(
    edges: ray.data.Dataset,
    *,
    k: int,
    rounds: int,
    src: str = "a",
    dst: str = "b",
) -> ray.data.Dataset:
    """R-round k-core peel of an undirected DISTINCT edge table: each
    round drops every node with degree < k (over the surviving subgraph)
    and all incident edges; returns (node, deg) for nodes with deg >= k in
    the round-R subgraph — the exact semantics of the unrolled SQL oracle,
    converged or not (fixpoint short-circuits early: once no node is
    dropped, further rounds are identities in both engines).

    Two plans, bit-equal (pinned by test): under the broadcast byte
    budget the WHOLE peel runs inside one Ray task over the assembled
    edge table (numpy bincount rounds — peeling is a node-iterator
    problem like the CSR kernels, so R distributed exchanges would buy
    nothing but latency); above it, every round is a combiner-first
    degree aggregate + exact both-endpoint semi-join (is_in value set /
    Bloom + keyed semi-join) and no node or edge set ever lands on the
    driver."""
    from ontoea_ray.functions.broadcast import assemble_table_ref

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _peel(tref) -> pa.Table:
            import numpy as np

            t = tref
            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            for _ in range(max(rounds, 0)):
                if not len(a):
                    break
                nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
                deg = np.bincount(inv)
                alive = deg >= k
                if alive.all():
                    break
                m = alive[inv[: len(a)]] & alive[inv[len(a) :]]
                a, b = a[m], b[m]
            if len(a):
                nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
                deg = np.bincount(inv)
                sel = deg >= k
                nodes, deg = nodes[sel], deg[sel]
            else:
                nodes = deg = np.array([], np.int64)
            return pa.table(
                {"node": pa.array(nodes, pa.int64()), "deg": pa.array(deg.astype(np.int64))}
            )

        return ray.data.from_arrow_refs([_peel.remote(tbl_ref)])

    cur = edges2
    for _ in range(max(rounds, 0)):
        deg = _degree_table(cur, src, dst).materialize()
        keep = deg.filter(expr=f"deg >= {int(k)}").materialize()
        n_all, n_keep = deg.count(), keep.count()
        if n_keep == n_all:
            break   # fixpoint: every further round is an identity
        cur = _edges_within(cur, keep.select_columns(["node"]), src, dst).materialize()
    final = _degree_table(cur, src, dst)
    return final.filter(expr=f"deg >= {int(k)}")


def _nodes_minus(
    nodes: ray.data.Dataset, rm: ray.data.Dataset
) -> ray.data.Dataset:
    """Exact node-set difference ``nodes \\ rm`` (both single-column
    ``node`` tables): ``is_in`` inverse over a value set assembled inside
    a Ray task under the broadcast budget; above it a keyed co-location
    anti-join (Bloom cannot serve an ANTI — a false positive would drop a
    surviving node)."""
    import numpy as np
    import pandas as pd

    from ontoea_ray.functions.broadcast import assemble_value_set_ref

    rm, vs_ref = assemble_value_set_ref(rm, "node")
    if vs_ref is not None:

        def sel(b: pa.Table) -> pa.Table:
            import ray as _ray

            vals = _ray.get(vs_ref)
            if len(vals) == 0:
                return b
            return b.filter(
                pc.invert(pc.is_in(b["node"].combine_chunks(), value_set=vals))
            )

        return nodes.map_batches(sel, batch_format="pyarrow")

    from ontoea_ray.functions.shuffle import with_partition_key

    tag = nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"].combine_chunks(), "_rm": pa.array(np.zeros(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    ).union(
        rm.map_batches(
            lambda b: pa.table(
                {"node": b["node"].combine_chunks(), "_rm": pa.array(np.ones(len(b), np.int64))}
            ),
            batch_format="pyarrow",
        )
    )
    parted = with_partition_key(tag, ["node"])

    def anti_typed(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("node", sort=False)["_rm"].max().reset_index()
        keep = g.loc[g["_rm"] == 0, ["node"]]
        from ontoea_ray.functions.tables import from_pandas as _fp

        return _fp(keep)

    return parted.groupby("pkey").map_groups(anti_typed, batch_format="pandas")


_MIS_SALT = 1_000_033


def mis_rounds(
    edges: ray.data.Dataset,
    *,
    rounds: int,
    src: str = "a",
    dst: str = "b",
) -> ray.data.Dataset:
    """R-round deterministic Luby maximal-independent-set over a DISTINCT
    undirected edge table — the parallel-MIS primitive (Luby 1986), with
    the per-round random priorities replaced by the engine-wide
    ``splitmix64(node * salt + round)`` convention so the set is a pure
    function of the graph and the unrolled SQL oracle replays every
    decision.  Returns ``(node, round)`` — MIS members with the round they
    joined.

    Round semantics (identical in both engines): a surviving node joins
    when NO surviving neighbour has a strictly smaller ``(priority, id)``
    pair (ties broken by node id; a node with no surviving edges joins
    vacuously — that is what makes the R-round output a maximal set once
    converged); winners and their neighbours leave the graph.  The global
    minimum always wins, so every round makes progress.

    Two value-equal plans (pinned by a budget=1 test): under the broadcast
    byte budget the whole peel runs inside one Ray task (numpy scatter-or
    loser flags per round — MIS is a node-iterator problem like the k-core
    peel); above it each round is an in-batch loser emission + distinct,
    an exact node-set anti-join (:func:`_nodes_minus`), the BFS frontier
    machinery for winner neighbourhoods, and the `_edges_within` exact
    semi-join — no node or edge set ever lands on the driver."""
    import numpy as np

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _mis(t) -> pa.Table:
            import numpy as np

            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            ea, eb = inv[: len(a)], inv[len(a) :]
            alive = np.ones(len(nodes), bool)
            out_n, out_r = [], []
            for r in range(max(rounds, 0)):
                if not alive.any():
                    break
                m = alive[ea] & alive[eb]
                ca, cb = ea[m], eb[m]
                p = splitmix64(
                    nodes.astype(np.uint64) * np.uint64(_MIS_SALT) + np.uint64(r)
                )
                loser = np.zeros(len(nodes), bool)
                pa_, pb_ = p[ca], p[cb]
                a_worse = (pa_ > pb_) | ((pa_ == pb_) & (nodes[ca] > nodes[cb]))
                loser[ca[a_worse]] = True
                loser[cb[~a_worse]] = True
                win = alive & ~loser
                out_n.append(nodes[win])
                out_r.append(np.full(int(win.sum()), r, np.int64))
                nb = np.zeros(len(nodes), bool)
                nb[cb[win[ca]]] = True
                nb[ca[win[cb]]] = True
                alive &= ~(win | nb)
            n_out = np.concatenate(out_n) if out_n else np.array([], np.int64)
            r_out = np.concatenate(out_r) if out_r else np.array([], np.int64)
            return pa.table(
                {"node": pa.array(n_out, pa.int64()), "round": pa.array(r_out)}
            )

        return ray.data.from_arrow_refs([_mis.remote(tbl_ref)])

    def endpoints(b: pa.Table) -> pa.Table:
        x = b[src].combine_chunks().cast(pa.int64())
        return pa.table(
            {"node": pa.concat_arrays([x, b[dst].combine_chunks().cast(x.type)])}
        )

    nodes = keyed_aggregate(
        edges2.map_batches(endpoints, batch_format="pyarrow"), ["node"], count_alias="_c"
    ).drop_columns(["_c"]).materialize()
    e = edges2.materialize()
    tagged = []
    for r in range(max(rounds, 0)):
        if nodes.count() == 0:
            break

        def losers_fn(b: pa.Table, _r=r) -> pa.Table:
            av = np.asarray(b[src].combine_chunks(), np.int64)
            bv = np.asarray(b[dst].combine_chunks(), np.int64)
            pa_ = splitmix64(av.astype(np.uint64) * np.uint64(_MIS_SALT) + np.uint64(_r))
            pb_ = splitmix64(bv.astype(np.uint64) * np.uint64(_MIS_SALT) + np.uint64(_r))
            a_worse = (pa_ > pb_) | ((pa_ == pb_) & (av > bv))
            return pa.table(
                {"node": pa.array(np.where(a_worse, av, bv), pa.int64())}
            )

        losers = keyed_aggregate(
            e.map_batches(losers_fn, batch_format="pyarrow"), ["node"], count_alias="_c"
        ).drop_columns(["_c"])
        winners = _nodes_minus(nodes, losers).materialize()

        def tag_round(b: pa.Table, _r=r) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.int64()),
                    "round": pa.array(np.full(len(b), _r, np.int64)),
                }
            )

        tagged.append(winners.map_batches(tag_round, batch_format="pyarrow"))
        nb1 = _frontier_successors(e, winners, subj_col=src, obj_col=dst)
        nb2 = _frontier_successors(e, winners, subj_col=dst, obj_col=src)
        rm = keyed_aggregate(
            winners.select_columns(["node"]).union(nb1).union(nb2),
            ["node"],
            count_alias="_c",
        ).drop_columns(["_c"])
        nodes = _nodes_minus(nodes, rm).materialize()
        e = _edges_within(e, nodes, src, dst).materialize()

    if not tagged:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "round": pa.array([], pa.int64())})
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


_JP_SALT = 1_000_099


def jp_coloring(
    edges: ray.data.Dataset,
    *,
    rounds: int,
    src: str = "a",
    dst: str = "b",
) -> ray.data.Dataset:
    """R-round deterministic Jones–Plassmann greedy coloring over a
    DISTINCT undirected edge table — the parallel graph-coloring primitive
    (Jones & Plassmann 1993) behind conflict-free scheduling of mutating
    graph updates, with the per-round random priorities replaced by the
    engine-wide ``splitmix64(node * salt + round)`` convention so the
    coloring is a pure function of the graph and the unrolled SQL oracle
    replays every decision.  Returns ``(node, color)`` for the nodes
    colored within R rounds (color = the round they won).

    Round semantics (identical in both engines, and exactly the MIS round
    from :func:`mis_rounds` with ONE difference): a surviving node takes
    color ``r`` when no surviving neighbour has a strictly smaller
    ``(priority, id)`` pair; winners leave the graph but — unlike MIS —
    their neighbours STAY and compete for the next color.  Adjacent nodes
    can never win the same round (one of them is the worse endpoint of
    their shared edge), so the coloring is proper by construction; each
    round removes at least the global minimum, and with re-randomized
    priorities the expected round count is O(log n) (Luby-style analysis).

    Two value-equal plans (pinned by a budget=1 test): under the broadcast
    byte budget the whole peel runs inside one Ray task (numpy scatter-or
    loser flags per round); above it each round is an in-batch loser
    emission + distinct, an exact node-set anti-join (:func:`_nodes_minus`)
    and the `_edges_within` exact semi-join — no node or edge set ever
    lands on the driver."""
    import numpy as np

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _jp(t) -> pa.Table:
            import numpy as np

            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            ea, eb = inv[: len(a)], inv[len(a) :]
            alive = np.ones(len(nodes), bool)
            out_n, out_c = [], []
            for r in range(max(rounds, 0)):
                if not alive.any():
                    break
                m = alive[ea] & alive[eb]
                ca, cb = ea[m], eb[m]
                p = splitmix64(
                    nodes.astype(np.uint64) * np.uint64(_JP_SALT) + np.uint64(r)
                )
                loser = np.zeros(len(nodes), bool)
                pa_, pb_ = p[ca], p[cb]
                a_worse = (pa_ > pb_) | ((pa_ == pb_) & (nodes[ca] > nodes[cb]))
                loser[ca[a_worse]] = True
                loser[cb[~a_worse]] = True
                win = alive & ~loser
                out_n.append(nodes[win])
                out_c.append(np.full(int(win.sum()), r, np.int64))
                alive &= ~win  # losers stay — the ONLY divergence from MIS
            n_out = np.concatenate(out_n) if out_n else np.array([], np.int64)
            c_out = np.concatenate(out_c) if out_c else np.array([], np.int64)
            return pa.table(
                {"node": pa.array(n_out, pa.int64()), "color": pa.array(c_out)}
            )

        return ray.data.from_arrow_refs([_jp.remote(tbl_ref)])

    def endpoints(b: pa.Table) -> pa.Table:
        x = b[src].combine_chunks().cast(pa.int64())
        return pa.table(
            {"node": pa.concat_arrays([x, b[dst].combine_chunks().cast(x.type)])}
        )

    nodes = keyed_aggregate(
        edges2.map_batches(endpoints, batch_format="pyarrow"), ["node"], count_alias="_c"
    ).drop_columns(["_c"]).materialize()
    e = edges2.materialize()
    tagged = []
    for r in range(max(rounds, 0)):
        if nodes.count() == 0:
            break

        def losers_fn(b: pa.Table, _r=r) -> pa.Table:
            av = np.asarray(b[src].combine_chunks(), np.int64)
            bv = np.asarray(b[dst].combine_chunks(), np.int64)
            pa_ = splitmix64(av.astype(np.uint64) * np.uint64(_JP_SALT) + np.uint64(_r))
            pb_ = splitmix64(bv.astype(np.uint64) * np.uint64(_JP_SALT) + np.uint64(_r))
            a_worse = (pa_ > pb_) | ((pa_ == pb_) & (av > bv))
            return pa.table(
                {"node": pa.array(np.where(a_worse, av, bv), pa.int64())}
            )

        losers = keyed_aggregate(
            e.map_batches(losers_fn, batch_format="pyarrow"), ["node"], count_alias="_c"
        ).drop_columns(["_c"])
        winners = _nodes_minus(nodes, losers).materialize()

        def tag_color(b: pa.Table, _r=r) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"].combine_chunks().cast(pa.int64()),
                    "color": pa.array(np.full(len(b), _r, np.int64)),
                }
            )

        tagged.append(winners.map_batches(tag_color, batch_format="pyarrow"))
        nodes = _nodes_minus(nodes, winners).materialize()
        e = _edges_within(e, nodes, src, dst).materialize()

    if not tagged:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "color": pa.array([], pa.int64())})
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out


def common_neighbor_pairs(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    min_common: int = 2,
) -> ray.data.Dataset:
    """Link-prediction candidates over an undirected distinct edge table:
    NON-adjacent node pairs at distance 2, with common-neighbour count,
    endpoint degrees and integer-milli Jaccard of the neighbourhoods —
    (id_a, id_b, cn, da, db, jac_milli), id_a < id_b, cn >= min_common.

    jac_milli = 1000 * cn // (da + db - cn): |N(a) ∩ N(b)| over
    |N(a) ∪ N(b)| (for non-adjacent pairs the union is da + db - cn) —
    integer floor, so every value is oracle-replayable.

    Scale shape: wedge pairs emit per CENTER node (one keyed co-location of
    the symmetric neighbour table; the segment-pairs kernel is the shared
    triangle/jaccard machinery), shrink through an in-block combiner before
    the (id_a, id_b) exchange, and the min_common filter applies BEFORE the
    anti-join/degree joins so only candidate-grade pairs ride them.  The
    adjacency anti-join co-locates two pair-sized tables by pkey; degrees
    gather via the distributed hash join.  Nothing lands on the driver.
    """
    import numpy as np
    import pandas as pd

    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.tables import from_pandas as _fp
    from ontoea_ray.stages.dedup import _pairs_from_bucket_block

    edges = edges.materialize()  # three consumers: wedges, anti-join, degrees
    w_e = sized_width(edges.size_bytes())
    nbr = _bidirect(edges, src, dst)
    parted = with_partition_key(nbr, ["node"], width=w_e)
    emit = _pairs_from_bucket_block("nb", None, keys=("node",), distinct=False)
    wedges = parted.groupby("pkey").map_groups(emit, batch_format="pandas")

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return _fp(df.groupby(["id_a", "id_b"], sort=False).size().reset_index(name="cn"))

    # measure the combiner output and size every downstream exchange from
    # it (pair vocabulary ≪ wedges; a tiny sampled graph then pays 1-2
    # partitions instead of cpus/2 barriers, the full cluster width at
    # 100 TB)
    parts = compact(wedges.map_batches(partial, batch_format="pyarrow")).materialize()
    w_p = sized_width(parts.size_bytes())
    cn = keyed_aggregate(parts, ["id_a", "id_b"], sums=["cn"], width=w_p)
    cn = cn.map_batches(
        lambda b: b.filter(pc.greater_equal(b["cn"].combine_chunks(), min_common)),
        batch_format="pyarrow",
    )

    def tag(flag: int, a_col: str, b_col: str, cn_col: str | None):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            return pa.table(
                {
                    "id_a": b[a_col].combine_chunks().cast(pa.int64()),
                    "id_b": b[b_col].combine_chunks().cast(pa.int64()),
                    "cn": b[cn_col].combine_chunks().cast(pa.int64())
                    if cn_col
                    else pa.array(np.zeros(n, np.int64)),
                    "_src": pa.array(np.full(n, flag, np.int8)),
                }
            )

        return fn

    both = cn.map_batches(tag(0, "id_a", "id_b", "cn"), batch_format="pyarrow").union(
        edges.map_batches(tag(1, src, dst, None), batch_format="pyarrow")
    )

    def keep_non_edges(df: pd.DataFrame) -> pa.Table:
        empty = pd.DataFrame(
            {c: pd.Series([], dtype=np.int64) for c in ("id_a", "id_b", "cn")}
        )
        if df.empty:
            return _fp(empty)
        is_edge = df.groupby(["id_a", "id_b"], sort=False)["_src"].transform("max") == 1
        out = df.loc[~is_edge & (df["_src"] == 0), ["id_a", "id_b", "cn"]]
        return _fp(out if len(out) else empty)

    parted2 = with_partition_key(both, ["id_a", "id_b"], width=w_p)
    cand = parted2.groupby("pkey").map_groups(keep_non_edges, batch_format="pandas")

    deg = _degree_table(edges, src, dst, width=w_e).materialize()
    j1 = hash_join(cand, deg, on=["id_a"], right_on=["node"], width=w_p).map_batches(
        lambda b: pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "cn": b["cn"], "da": b["deg"]}
        ),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, deg, on=["id_b"], right_on=["node"], width=w_p)

    def finalize(b: pa.Table) -> pa.Table:
        cnv = np.asarray(b["cn"].combine_chunks(), np.int64)
        da = np.asarray(b["da"].combine_chunks(), np.int64)
        db = np.asarray(b["deg"].combine_chunks(), np.int64)
        jac = 1000 * cnv // (da + db - cnv)
        return pa.table(
            {
                "id_a": b["id_a"].combine_chunks().cast(pa.int64()),
                "id_b": b["id_b"].combine_chunks().cast(pa.int64()),
                "cn": pa.array(cnv, pa.int64()),
                "da": pa.array(da, pa.int64()),
                "db": pa.array(db, pa.int64()),
                "jac_milli": pa.array(jac, pa.int64()),
            }
        )

    return j2.map_batches(finalize, batch_format="pyarrow")


def hyperball_registers(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    p: int = 4,
    rounds: int = 3,
    keep_rounds: bool = False,
) -> ray.data.Dataset:
    """HyperBall (Boldi & Vigna 2013): per-node HyperLogLog registers of
    the radius-``rounds`` ball, via R max-merge rounds over the edge table
    — the distance-distribution / effective-diameter sketch that exact BFS
    from every node cannot afford.  Returns (node, slot, rho): node's ball
    sketch as the q_hll_registers row convention (absent slots empty).

    Exactness: node hashes are splitmix64, slot = top p bits, rho = the
    1-based leading-zero rank of the low 64-p bits (float-free bit length),
    and each round is ``reg_r(u) = max(reg_{r-1}(u), max_{v in N(u)}
    reg_{r-1}(v))`` — all integer max-merges the oracle unrolls exactly.

    Scale shape: state is |V| x 2^p register rows; each round moves
    |E| x (slots present) rows through ONE keyed max aggregate whose
    in-block combiner pre-merges before the exchange.  No driver state —
    the round loop on the driver holds only Dataset handles.
    """
    import numpy as np

    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64
    from ontoea_ray.stages.sketch import hll_rho

    nbits = 64 - p
    nbr = _bidirect(edges, src, dst).materialize()
    nodes = keyed_aggregate(
        nbr.map_batches(lambda b: pa.table({"node": b["node"]}), batch_format="pyarrow"),
        ["node"],
        count_alias="_c",
    ).drop_columns(["_c"])

    def seed(b: pa.Table) -> pa.Table:
        n = np.asarray(b["node"].combine_chunks(), np.int64)
        h = splitmix64(n.astype(np.uint64))
        slot = (h >> np.uint64(nbits)).astype(np.int64)
        rest = h & np.uint64((1 << nbits) - 1)
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "slot": pa.array(slot, pa.int64()),
                "rho": pa.array(hll_rho(rest, nbits), pa.int64()),
            }
        )

    regs = nodes.map_batches(seed, batch_format="pyarrow")
    per_round = [regs]
    for _ in range(rounds):
        regs = regs.materialize()  # two consumers: neighbour move + self union
        per_round[-1] = regs
        moved = hash_join(nbr, regs, on=["nb"], right_on=["node"]).map_batches(
            lambda b: pa.table(
                {"node": b["node"], "slot": b["slot"], "rho": b["rho"]}
            ),
            batch_format="pyarrow",
        )
        regs = keyed_aggregate(moved.union(regs), ["node", "slot"], maxs=["rho"])
        per_round.append(regs)
    return per_round if keep_rounds else regs


_HLL_RHO_CAP = 44  # rho cap of the p=4 integer HLL estimate (sketch.hll_int_params)
_HLL_E_NUM = 673 * 256 * (1 << _HLL_RHO_CAP)  # numerator inside int64


def _hll_round_estimates(
    edges: ray.data.Dataset | None,
    *,
    src: str,
    dst: str,
    p: int,
    rounds: int,
    registers: list[ray.data.Dataset] | None = None,
) -> list[ray.data.Dataset]:
    """Per-round (node, round, e_milli) ball-size estimate tables from the
    hyperball register rounds — the shared front half of harmonic
    centrality and the neighbourhood function.  Each round folds a node's
    ≤2^p register rows combiner-first, then one vectorized floor division
    yields the integer HLL estimate (see `sketch.hll_int_params`).

    ``registers`` lets callers supply precomputed (e.g. materialized-view
    cached) register rounds; otherwise they are computed from ``edges``."""
    import numpy as np

    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.tables import from_pandas as _fp
    from ontoea_ray.stages.sketch import hll_estimate_milli

    per_round = registers if registers is not None else hyperball_registers(
        edges, src=src, dst=dst, p=p, rounds=rounds, keep_rounds=True
    )
    cap = _HLL_RHO_CAP

    tagged = []
    for r, regs in enumerate(per_round):

        def partial(b: pa.Table, _r=r) -> pa.Table:
            import pandas as pd

            n = np.asarray(b["node"].combine_chunks(), np.int64)
            rho = np.asarray(b["rho"].combine_chunks(), np.int64)
            term = np.int64(1) << (cap - np.minimum(rho, cap))
            df = pd.DataFrame({"node": n, "term": term})
            g = df.groupby("node", sort=False)["term"].agg(
                term_sum="sum", cnt="size"
            ).reset_index()
            g["cnt"] = g["cnt"].astype(np.int64)
            return _fp(g)

        folded = keyed_aggregate(
            regs.map_batches(partial, batch_format="pyarrow"),
            ["node"],
            sums=["term_sum", "cnt"],
        )

        def e_milli(b: pa.Table, _r=r) -> pa.Table:
            e = hll_estimate_milli(
                np.asarray(b["term_sum"].combine_chunks(), np.int64),
                np.asarray(b["cnt"].combine_chunks(), np.int64),
                p,
            )
            return pa.table(
                {
                    "node": b["node"],
                    "round": pa.array(np.full(len(b), _r, np.int64)),
                    "e_milli": pa.array(e, pa.int64()),
                }
            )

        tagged.append(folded.map_batches(e_milli, batch_format="pyarrow"))
    return tagged


def harmonic_milli(
    edges: ray.data.Dataset | None,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    p: int = 4,
    rounds: int = 3,
    registers: list[ray.data.Dataset] | None = None,
) -> ray.data.Dataset:
    """Harmonic-centrality estimates from HyperBall sketches (Boldi &
    Vigna 2013 §5): ``H(v) = Σ_{r=1..R} (|ball_r(v)| − |ball_{r−1}(v)|)/r``
    with ball sizes estimated per round from the node's HLL registers —
    the centrality that per-node BFS cannot afford at graph scale.

    INTEGER-EXACT estimator so the result is bit-replayable: with m=2^p=16
    registers, the raw HLL estimate ``α_16·m²/Σ_j 2^(−M_j)`` becomes
    ``E_milli = (673·256·2^44) // S`` where ``S = Σ_j 2^(44 − min(M_j,44))``
    (absent slots contribute 2^44; α_16 = 0.673 = 673/1000 exactly; the
    rho cap at 44 keeps the numerator inside int64 and costs < 2^-44 of
    relative mass).  Registers only grow, so E_milli is nondecreasing and
    each per-round term ``(E_r − E_{r−1}) // r`` is a nonnegative floor —
    the oracle replays every division.  Returns ``(node, h_milli)``.

    Plan: the R hyperball rounds (one hash join + keyed max-merge each),
    then per round a combiner-first keyed sum folds each node's ≤16
    register rows to (term_sum, slot_count) and one vectorized map yields
    E_milli; the R+1 round tables union with a round tag through ONE
    node-keyed exchange where the telescoping sum reduces in-partition.
    """
    import numpy as np

    from ontoea_ray.functions.shuffle import with_partition_key
    from ontoea_ray.functions.tables import from_pandas as _fp

    tagged = _hll_round_estimates(
        edges, src=src, dst=dst, p=p, rounds=rounds, registers=registers
    )
    allr = tagged[0]
    for t in tagged[1:]:
        allr = allr.union(t)
    parted = with_partition_key(allr, ["node"])

    def fold(df) -> pa.Table:
        import pandas as pd

        df = df.sort_values(["node", "round"], kind="mergesort")
        e = df["e_milli"].to_numpy(np.int64).reshape(-1, rounds + 1)
        nodes_col = df["node"].to_numpy()[:: rounds + 1]
        diffs = e[:, 1:] - e[:, :-1]
        h = (diffs // np.arange(1, rounds + 1)).sum(axis=1)
        return _fp(pd.DataFrame({"node": nodes_col, "h_milli": h.astype(np.int64)}))

    return parted.groupby("pkey").map_groups(fold, batch_format="pandas")


def boruvka_mst(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    weight: str = "w",
    max_rounds: int = 12,
) -> ray.data.Dataset:
    """Minimum spanning forest by distributed Borůvka (1926; the parallel
    MST algorithm — Kruskal's global sort is inherently sequential): each
    round every component picks its minimum-weight outgoing edge, the
    picked edges merge components via pointer-jumping connected
    components, and the component count at least halves, so
    ``O(log |V|)`` rounds suffice.  With UNIQUE weights the MSF is unique,
    so the output is a pure function of the weighted graph (ties broken
    by (weight, src, dst) otherwise) — pinned against a scalar Kruskal in
    pytest; no SQL oracle (MST needs a fixpoint no unrolled CTE chain
    expresses at data-dependent depth).

    Per round: two hash joins label the edge endpoints, a combiner-first
    per-component argmin (``argmax_by`` on negated order columns) picks
    edges, `connected_components` on the COMPONENT graph (component-count
    sized, not node sized) merges labels, and one left join relabels the
    nodes.  Driver state: one ``count()`` scalar per round (the
    convergence check) and the Dataset handles."""
    import numpy as np

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import argmax_by, keyed_aggregate

    e, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst, weight]), columns=[src, dst, weight]
    )
    if tbl_ref is not None:
        # under the broadcast budget the whole Borůvka runs in ONE Ray
        # task (vectorized per-round argmin + union-find merge) — picked
        # edges per round are the same pure function of the labels as the
        # exchange plan's, so the forests are identical (budget=1 test)
        _rounds = max_rounds

        @ray.remote
        def _mst(tref) -> pa.Table:
            import numpy as np

            t = tref if not isinstance(tref, ray.ObjectRef) else ray.get(tref)
            a = np.asarray(t[src].combine_chunks(), np.int64)
            b = np.asarray(t[dst].combine_chunks(), np.int64)
            w = np.asarray(t[weight].combine_chunks(), np.int64)
            nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            ai, bi = inv[: len(a)], inv[len(a):]
            m = len(nodes)
            parent = np.arange(m)

            def roots():
                p = parent
                while (p[p] != p).any():
                    p = p[p]
                return p

            picked_all: list[np.ndarray] = []
            for _ in range(_rounds):
                r = roots()
                la, lb = r[ai], r[bi]
                live = la != lb
                if not live.any():
                    break
                eidx = np.flatnonzero(live)
                comp = np.concatenate([la[eidx], lb[eidx]])
                ei = np.concatenate([eidx, eidx])
                order = np.lexsort((b[ei], a[ei], w[ei], comp))
                comp_s = comp[order]
                first = np.r_[True, comp_s[1:] != comp_s[:-1]]
                picked = np.unique(ei[order[first]])
                picked_all.append(picked)
                for i in picked:
                    ra, rb = int(r[ai[i]]), int(r[bi[i]])
                    # union by direct parent write; roots() re-derives
                    pa_, pb_ = ra, rb
                    while parent[pa_] != pa_:
                        pa_ = parent[pa_]
                    while parent[pb_] != pb_:
                        pb_ = parent[pb_]
                    if pa_ != pb_:
                        parent[max(pa_, pb_)] = min(pa_, pb_)
            if picked_all:
                idx = np.unique(np.concatenate(picked_all))
            else:
                idx = np.zeros(0, np.int64)
            return pa.table(
                {
                    src: pa.array(a[idx], pa.int64()),
                    dst: pa.array(b[idx], pa.int64()),
                    weight: pa.array(w[idx], pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_mst.remote(tbl_ref)])
    nodes = keyed_aggregate(
        e.map_batches(
            lambda b: pa.table(
                {
                    "node": pa.chunked_array(
                        [b[src].combine_chunks(), b[dst].combine_chunks()]
                    ).combine_chunks()
                }
            ),
            batch_format="pyarrow",
        ),
        ["node"],
        count_alias="_c",
    ).drop_columns(["_c"])
    labels = nodes.map_batches(
        lambda b: pa.table({"node": b["node"], "lab": b["node"]}),
        batch_format="pyarrow",
    ).materialize()

    forest = None
    for _ in range(max_rounds):
        la = hash_join(e, labels, on=[src], right_on=["node"]).map_batches(
            lambda b: pa.table(
                {src: b[src], dst: b[dst], weight: b[weight], "la": b["lab"]}
            ),
            batch_format="pyarrow",
        )
        lab2 = hash_join(la, labels, on=[dst], right_on=["node"]).map_batches(
            lambda b: pa.table(
                {
                    src: b[src], dst: b[dst], weight: b[weight],
                    "la": b["la"], "lb": b["lab"],
                }
            ),
            batch_format="pyarrow",
        )
        inter = lab2.map_batches(
            lambda b: b.filter(pc.invert(pc.equal(b["la"], b["lb"]))),
            batch_format="pyarrow",
        ).materialize()
        if inter.count() == 0:
            break

        def explode_comp(b: pa.Table) -> pa.Table:
            both = pa.concat_tables(
                [
                    pa.table(
                        {
                            "comp": b["la"], src: b[src], dst: b[dst],
                            weight: b[weight],
                        }
                    ),
                    pa.table(
                        {
                            "comp": b["lb"], src: b[src], dst: b[dst],
                            weight: b[weight],
                        }
                    ),
                ]
            )
            neg = {
                "_nw": pc.negate(both[weight]),
                "_na": pc.negate(both[src]),
                "_nb": pc.negate(both[dst]),
            }
            for k, v in neg.items():
                both = both.append_column(k, v)
            return both

        chosen = argmax_by(
            inter.map_batches(explode_comp, batch_format="pyarrow"),
            ["comp"],
            ["_nw", "_na", "_nb"],
        )
        picked = keyed_aggregate(
            chosen.map_batches(
                lambda b: pa.table(
                    {src: b[src], dst: b[dst], weight: b[weight]}
                ),
                batch_format="pyarrow",
            ),
            [src, dst],
            maxs=[weight],
        ).materialize()
        forest = picked if forest is None else forest.union(picked).materialize()

        comp_edges = hash_join(
            hash_join(picked, labels, on=[src], right_on=["node"]).map_batches(
                lambda b: pa.table({"ca": b["lab"], dst: b[dst]}),
                batch_format="pyarrow",
            ),
            labels,
            on=[dst],
            right_on=["node"],
        ).map_batches(
            lambda b: pa.table({"id_a": b["ca"], "id_b": b["lab"]}),
            batch_format="pyarrow",
        )
        compmap = connected_components(comp_edges)
        labels = (
            hash_join(labels, compmap, on=["lab"], right_on=["node"], how="left")
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "lab": pc.coalesce(b["component"], b["lab"]),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

    if forest is None:
        return e.limit(0)
    # dedupe across rounds (an edge can only be picked in one round, but
    # keep the output contract explicit)
    return keyed_aggregate(forest, [src, dst], maxs=[weight])


def scc_labels(
    edges: ray.data.Dataset,
    *,
    src: str = "src_domain",
    dst: str = "dst_domain",
    rounds: int = 4,
) -> ray.data.Dataset:
    """R-round forward–backward SCC coloring of a DIRECTED edge table —
    the bowtie-structure primitive for web graphs (Broder et al. 2000):
    ``fmin(v)`` = min id reachable FROM v within R hops, ``bmin(v)`` = min
    id that REACHES v within R hops, and ``fmin(v) = bmin(v) = c`` proves
    v and c mutually reachable, i.e. v belongs to c's strongly connected
    component (exact for every SCC of radius ≤ R; the classic FW-BW
    algorithm recurses on the rest).  Returns ``(node, fmin, bmin,
    in_core)`` with in_core = 1 iff fmin == bmin.

    Synchronous integer/string min rounds (LEAST is associative and
    execution-order free), so the oracle unrolls both label chains
    exactly.  Two value-equal plans: single-task numpy scatter-min under
    the broadcast budget (old-value pulls keep rounds synchronous); above
    it each round is one hash join + keyed min per direction over
    label-table-sized rows — no driver state.
    """
    import numpy as np
    from ray.data.aggregate import Count, Min

    from ontoea_ray.functions.broadcast import assemble_table_ref

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": b[src].combine_chunks().cast(pa.string()),
                "d": b[dst].combine_chunks().cast(pa.string()),
            }
        )

    e, tbl_ref = assemble_table_ref(
        compact(edges.map_batches(_proj, batch_format="pyarrow")), columns=["s", "d"]
    )
    if tbl_ref is not None:
        _rounds = rounds

        @ray.remote
        def _scc(tref) -> pa.Table:
            import numpy as np

            s = tref["s"].to_pandas().to_numpy(object)
            d = tref["d"].to_pandas().to_numpy(object)
            nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
            si, di = inv[: len(s)], inv[len(s):]
            f = np.arange(len(nodes))
            b = np.arange(len(nodes))
            for _ in range(_rounds):
                # pulls read OLD values so each round is synchronous
                pf = f[di]
                pb = b[si]
                nf, nb = f.copy(), b.copy()
                np.minimum.at(nf, si, pf)
                np.minimum.at(nb, di, pb)
                f, b = nf, nb
            return pa.table(
                {
                    "node": pa.array(nodes.astype(str), pa.string()),
                    "fmin": pa.array(nodes[f].astype(str), pa.string()),
                    "bmin": pa.array(nodes[b].astype(str), pa.string()),
                    "in_core": pa.array((f == b).astype(np.int64), pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_scc.remote(tbl_ref)])

    width = sized_width(e.size_bytes())

    def _nodes_part(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array([b["s"].combine_chunks(), b["d"].combine_chunks()])
        )
        return pa.table({"node": u})

    nodes = (
        e.map_batches(_nodes_part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "lbl": b["node"]})

    lbls = {"f": nodes.map_batches(seed, batch_format="pyarrow"),
            "b": nodes.map_batches(seed, batch_format="pyarrow")}
    pulls = {"f": ("d", "s"), "b": ("s", "d")}  # join labels at X, emit at Y
    for _ in range(rounds):
        for dirn, (at, out) in pulls.items():
            cur = lbls[dirn].materialize()
            moved = hash_join(e, cur, on=[at], right_on=["node"], width=width).map_batches(
                lambda b, _o=out: pa.table({"node": b[_o], "lbl": b["lbl"]}),
                batch_format="pyarrow",
            )
            lbls[dirn] = (
                compact(moved.union(cur), width=width)
                .groupby("node")
                .aggregate(Min("lbl", alias_name="lbl"))
            )
    joined = hash_join(
        lbls["f"].map_batches(
            lambda b: pa.table({"node": b["node"], "fmin": b["lbl"]}),
            batch_format="pyarrow",
        ),
        lbls["b"].map_batches(
            lambda b: pa.table({"node": b["node"], "bmin": b["lbl"]}),
            batch_format="pyarrow",
        ),
        on=["node"],
        width=width,
    )
    return joined.map_batches(
        lambda b: b.append_column(
            "in_core",
            pc.cast(pc.equal(b["fmin"], b["bmin"]), pa.int64()),
        ),
        batch_format="pyarrow",
    )


def neighbourhood_function(
    edges: ray.data.Dataset | None,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    p: int = 4,
    rounds: int = 3,
    pct: int = 90,
    registers: list[ray.data.Dataset] | None = None,
) -> ray.data.Dataset:
    """Neighbourhood function + effective diameter from HyperBall (Boldi &
    Vigna 2013): ``N(r) = Σ_v |ball_r(v)|`` estimated per round from the
    integer HLL ball sketches, and the smallest radius reaching ``pct``%
    of the converged mass — the graph's distance profile without a single
    BFS.  Returns one row per round ``(round, n_milli, reaches_pct)``
    where ``reaches_pct = 1`` iff ``100·N(r) ≥ pct·N(R)`` (all-integer, so
    the oracle replays the comparison; the effective diameter is the
    first round with the flag set).  Per round: one combiner-first global
    sum of the per-node estimates; the ≤R+1 totals then compare in one
    tiny task."""
    import numpy as np

    tagged = _hll_round_estimates(
        edges, src=src, dst=dst, p=p, rounds=rounds, registers=registers
    )

    parts = None
    for t in tagged:

        def partial(b: pa.Table) -> pa.Table:
            import pandas as pd

            df = pd.DataFrame(
                {
                    "round": np.asarray(b["round"].combine_chunks(), np.int64),
                    "n_milli": np.asarray(b["e_milli"].combine_chunks(), np.int64),
                }
            )
            g = df.groupby("round", sort=False)["n_milli"].sum().reset_index()
            from ontoea_ray.functions.tables import from_pandas as _fp

            return _fp(g)

        d = t.map_batches(partial, batch_format="pyarrow")
        parts = d if parts is None else parts.union(d)

    from ontoea_ray.functions.shuffle import keyed_aggregate

    totals = keyed_aggregate(parts, ["round"], sums=["n_milli"])

    def finish(b: pa.Table) -> pa.Table:
        r = np.asarray(b["round"].combine_chunks(), np.int64)
        n = np.asarray(b["n_milli"].combine_chunks(), np.int64)
        order = np.argsort(r)
        r, n = r[order], n[order]
        flag = (100 * n >= pct * n[-1]).astype(np.int64)
        return pa.table(
            {
                "round": pa.array(r, pa.int64()),
                "n_milli": pa.array(n, pa.int64()),
                "reaches_pct": pa.array(flag, pa.int64()),
            }
        )

    return totals.repartition(1).map_batches(finish, batch_format="pyarrow")


def _truss_support(enc: "np.ndarray", m: int) -> "np.ndarray":
    """Per-edge triangle support for a sorted encoded oriented edge array
    (``enc = a*m + b``, a < b): each triangle (x < y < z) is enumerated
    exactly once at its smallest vertex (oriented wedge pairs, the
    `_triangle_chunk` expansion) and credits ALL THREE of its edges —
    support(e) = number of triangles containing e = |N(a) ∩ N(b)|.
    Chunked by the `_CHUNK_PAIRS` expansion cap; int64 throughout."""
    import numpy as np

    sup = np.zeros(len(enc), np.int64)
    if not len(enc):
        return sup
    a, b = enc // m, enc % m
    indptr = np.zeros(m + 1, np.int64)
    np.cumsum(np.bincount(a, minlength=m), out=indptr[1:])
    # packed m*m bitset pre-probe (one memory touch per wedge) so the
    # positional searchsorted runs only over CLOSED wedges (= triangles,
    # usually ≪ wedges); same budget gate as the triangle kernel
    bits = None
    nbytes = (m * m + 7) // 8
    if nbytes <= _BITSET_MAX_BYTES:
        bits = np.zeros(nbytes, np.uint8)
        np.bitwise_or.at(bits, enc >> 3, np.uint8(1) << (enc & 7).astype(np.uint8))
    centers = np.unique(a)
    degc = indptr[centers + 1] - indptr[centers]
    centers, degc = centers[degc > 1], degc[degc > 1]
    if not len(centers):
        return sup
    chunk = np.cumsum(degc * (degc - 1) // 2) // _CHUNK_PAIRS
    # int32 expansion when the m^2 key space fits: the wedge arrays are the
    # kernel's memory traffic, and it is bandwidth-bound
    it = np.int32 if m * m < 2**31 else np.int64
    L = len(enc)
    for cid in np.unique(chunk):
        nodes = centers[chunk == cid]
        seg, nb, deg = _gather_segments(indptr, b, nodes)
        offs = np.zeros(len(nodes), np.int64)
        np.cumsum(deg[:-1], out=offs[1:])
        local_i = np.arange(len(nb), dtype=np.int64) - offs[seg]
        rep = deg[seg] - 1 - local_i
        total = int(rep.sum())
        if total == 0:
            continue
        row = np.repeat(np.arange(len(nb), dtype=it), rep)
        starts = np.zeros(len(nb), it)
        starts[1:] = np.cumsum(rep[:-1], dtype=it)
        k = np.arange(total, dtype=it) - starts[row]
        nbt = nb if it is np.int64 else nb.astype(it)
        b1 = nbt[row]
        b2 = nbt[row + 1 + k]  # same segment: rep never crosses the boundary
        keys = b1 * it(m) + b2
        if bits is not None:
            hit = (bits[keys >> 3] & (np.uint8(1) << (keys & 7).astype(np.uint8))) != 0
            pos_yz = np.searchsorted(enc, keys[hit].astype(np.int64))
        else:
            pos = np.searchsorted(enc, keys.astype(np.int64))
            hit = (pos < L) & (enc[np.minimum(pos, L - 1)] == keys.astype(np.int64))
            pos_yz = pos[hit]
        if not hit.any():
            continue
        # (x,b1)/(x,b2) are edges by construction and their enc positions
        # are the gather positions themselves (nb is the slice of b = the
        # tails of enc's CSR rows) — no searchsorted needed for them
        gpos = (
            np.arange(len(nb), dtype=np.int64)
            - offs[seg]
            + indptr[nodes][seg]
        )
        rh = row[hit].astype(np.int64)
        all_pos = np.concatenate(
            [pos_yz, gpos[rh], gpos[rh + 1 + k[hit].astype(np.int64)]]
        )
        sup += np.bincount(all_pos, minlength=L)
    return sup


def clustering_counts(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
) -> ray.data.Dataset:
    """Per-node local-clustering numerator/denominator over an oriented
    (src < dst) DISTINCT undirected edge table: ``(node, tri, deg)`` with
    ``tri`` = triangles containing the node and ``deg`` its degree — the
    local clustering coefficient is ``tri / (deg*(deg-1)/2)``, left as a
    ratio of exact integers so the result is bit-replayable.

    Two value-equal plans:

    - under the broadcast budget: one Ray task assembles the edge blocks,
      relabels via ``np.unique``, runs the k-truss per-EDGE support kernel
      (`_truss_support` — each triangle credits all three edges), and
      folds edges to nodes: ``tri(v) = Σ_{e∋v} support(e) / 2`` (a
      triangle through v covers exactly two of v's incident edges);
    - above it: wedge emission from src-co-located partitions WITH the
      wedge center carried, ONE hash join against the edge set closes the
      wedges, each closed wedge explodes to its three node credits, and a
      keyed sum + left join onto the degree table finishes — the same
      wedge-join shape as the global triangle fallback, shuffling only
      wedges (the documented cost of the exchange regime).
    """
    import numpy as np
    import pandas as pd

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.tables import from_pandas as _fp

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    if tbl_ref is not None:

        @ray.remote
        def _cc(tref) -> pa.Table:
            import numpy as np

            t = tref if not isinstance(tref, ray.ObjectRef) else ray.get(tref)
            a_raw = t[src].to_pandas().to_numpy()
            b_raw = t[dst].to_pandas().to_numpy()
            nodes, inv = np.unique(np.concatenate([a_raw, b_raw]), return_inverse=True)
            ai, bi = inv[: len(a_raw)], inv[len(a_raw):]
            lo, hi = np.minimum(ai, bi), np.maximum(ai, bi)
            m = len(nodes)
            enc = np.unique(lo.astype(np.int64) * m + hi.astype(np.int64))
            sup = _truss_support(enc, m)
            ea, eb = enc // m, enc % m
            tri = (
                np.bincount(ea, weights=sup, minlength=m)
                + np.bincount(eb, weights=sup, minlength=m)
            ).astype(np.int64) // 2
            deg = (
                np.bincount(ea, minlength=m) + np.bincount(eb, minlength=m)
            ).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(nodes),
                    "tri": pa.array(tri, pa.int64()),
                    "deg": pa.array(deg, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_cc.remote(tbl_ref)])

    width = sized_width(edges2.size_bytes())

    def _wedges(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values([src, dst], kind="mergesort")
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        n = len(a)
        if n == 0:
            return _fp(
                pd.DataFrame(
                    {
                        "center": pd.Series([], dtype=df[src].dtype),
                        src: pd.Series([], dtype=df[dst].dtype),
                        dst: pd.Series([], dtype=df[dst].dtype),
                    }
                )
            )
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        counts = np.diff(np.r_[starts, n])
        seg = np.repeat(np.arange(len(starts)), counts)
        local_i = np.arange(n) - starts[seg]
        rep = counts[seg] - 1 - local_i
        total = int(rep.sum())
        if total == 0:
            return _fp(pd.DataFrame({"center": a[:0], src: b[:0], dst: b[:0]}))
        row = np.repeat(np.arange(n), rep)
        off = np.zeros(n, np.int64)
        off[1:] = np.cumsum(rep[:-1])
        k = np.arange(total) - off[row]
        return _fp(
            pd.DataFrame(
                {"center": a[row], src: b[row], dst: b[row + 1 + k]}
            )
        )

    wedges = with_partition_key(edges2, [src], width=width).groupby("pkey").map_groups(
        _wedges, batch_format="pandas"
    )
    closed = hash_join(
        edges2.select_columns([src, dst]), wedges, on=[src, dst], width=width
    )

    def _credits(b: pa.Table) -> pa.Table:
        ns = pa.chunked_array(
            [
                b["center"].combine_chunks(),
                b[src].combine_chunks(),
                b[dst].combine_chunks(),
            ]
        ).combine_chunks()
        return pa.table(
            {
                "node": ns,
                "tri": pa.array(np.ones(len(ns), np.int64)),
            }
        )

    tric = keyed_aggregate(
        closed.map_batches(_credits, batch_format="pyarrow"),
        ["node"],
        sums=["tri"],
        width=width,
    )

    def _ends(b: pa.Table) -> pa.Table:
        ns = pa.chunked_array(
            [b[src].combine_chunks(), b[dst].combine_chunks()]
        ).combine_chunks()
        return pa.table(
            {"node": ns, "deg": pa.array(np.ones(len(ns), np.int64))}
        )

    degt = keyed_aggregate(
        edges2.map_batches(_ends, batch_format="pyarrow"),
        ["node"],
        sums=["deg"],
        width=width,
    )
    return hash_join(degt, tric, on=["node"], how="left", width=width).map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "tri": pc.coalesce(b["tri"], pa.scalar(0, pa.int64())),
                "deg": b["deg"],
            }
        ),
        batch_format="pyarrow",
    )


def ktruss_rounds(
    edges: ray.data.Dataset,
    *,
    k: int,
    rounds: int,
    src: str = "id_a",
    dst: str = "id_b",
) -> ray.data.Dataset:
    """R-round k-truss peel of an undirected DISTINCT edge table: each
    round drops every edge in fewer than ``k - 2`` triangles (over the
    surviving subgraph); returns (id_a, id_b, sup) for edges with
    sup >= k-2 in the round-R subgraph — the edge analogue of the k-core
    node peel and the dense-subgraph / community-backbone primitive
    (Cohen 2008).  Fixpoint short-circuits are identities in the unrolled
    SQL semantics, exactly like `kcore_rounds`.

    Two plans, value-equal (pinned by a budget=1 test): under the
    broadcast byte budget the WHOLE peel runs inside one Ray task
    (`_truss_support` chunked oriented-wedge kernel per round); above it,
    every round emits wedge pairs per center node through the shared
    segment-pairs kernel, counts them with one (id_a, id_b) keyed
    exchange, pair-co-locates the count table with the edge table to keep
    only actual edges, and filters — no edge set ever lands on the
    driver."""
    import numpy as np
    import pandas as pd

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.tables import from_pandas as _fp
    from ontoea_ray.stages.dedup import _pairs_from_bucket_block

    assert k >= 3, "k-truss needs k >= 3 (support threshold k-2 >= 1)"
    thresh = k - 2

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _peel(tref) -> pa.Table:
            t = tref
            x = t[src].to_pandas().to_numpy(np.int64)
            y = t[dst].to_pandas().to_numpy(np.int64)
            lo, hi = np.minimum(x, y), np.maximum(x, y)
            m = int(hi.max()) + 1 if len(hi) else 1
            if m and m >= np.iinfo(np.int64).max // m:
                raise ValueError("node-id space too large for int64 pair encoding")
            enc = np.unique(lo * m + hi)
            for _ in range(max(rounds, 0)):
                if not len(enc):
                    break
                keep = _truss_support(enc, m) >= thresh
                if keep.all():
                    break
                enc = enc[keep]
            if len(enc):
                sup = _truss_support(enc, m)
                sel = sup >= thresh
                enc, sup = enc[sel], sup[sel]
            else:
                sup = np.array([], np.int64)
            return pa.table(
                {
                    "id_a": pa.array(enc // m if len(enc) else np.array([], np.int64), pa.int64()),
                    "id_b": pa.array(enc % m if len(enc) else np.array([], np.int64), pa.int64()),
                    "sup": pa.array(sup, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_peel.remote(tbl_ref)])

    # every block of the exchange plan pins this node type explicitly so
    # empty partitions (pandas object -> Arrow null) can't fork the schema
    node_t = pa.int64() if int_nodes else pa.string()

    def edge_support(cur: ray.data.Dataset) -> ray.data.Dataset:
        """(id_a, id_b, sup) for pairs that ARE edges of ``cur`` (zero-
        support edges are absent — they fail thresh >= 1 anyway).
        ``cur`` always carries (id_a, id_b) columns here."""

        def bidir(b: pa.Table) -> pa.Table:
            a = b["id_a"].combine_chunks().cast(node_t)
            c = b["id_b"].combine_chunks().cast(node_t)
            return pa.table(
                {
                    "node": pa.chunked_array([a, c]).combine_chunks(),
                    "nb": pa.chunked_array([c, a]).combine_chunks(),
                }
            )

        nbr = cur.map_batches(bidir, batch_format="pyarrow")
        parted = with_partition_key(nbr, ["node"])
        emit = _pairs_from_bucket_block("nb", None, keys=("node",), distinct=False)
        wedges = parted.groupby("pkey").map_groups(emit, batch_format="pandas")

        def partial(b: pa.Table) -> pa.Table:
            g = (
                b.to_pandas()
                .groupby(["id_a", "id_b"], sort=False)
                .size()
                .reset_index(name="sup")
            )
            return pa.table(
                {
                    "id_a": pa.array(g["id_a"], type=node_t, from_pandas=True),
                    "id_b": pa.array(g["id_b"], type=node_t, from_pandas=True),
                    "sup": pa.array(g["sup"].to_numpy(np.int64)),
                }
            )

        cn = keyed_aggregate(
            compact(wedges.map_batches(partial, batch_format="pyarrow")),
            ["id_a", "id_b"],
            sums=["sup"],
        )

        def tag(flag: int, sup_col: str | None):
            def fn(b: pa.Table) -> pa.Table:
                n = len(b)
                return pa.table(
                    {
                        "id_a": b["id_a"].combine_chunks().cast(node_t),
                        "id_b": b["id_b"].combine_chunks().cast(node_t),
                        "sup": b[sup_col].combine_chunks().cast(pa.int64())
                        if sup_col
                        else pa.array(np.zeros(n, np.int64)),
                        "_src": pa.array(np.full(n, flag, np.int8)),
                    }
                )

            return fn

        both = cn.map_batches(tag(0, "sup"), batch_format="pyarrow").union(
            cur.map_batches(tag(1, None), batch_format="pyarrow")
        )

        def keep_edges(df: pd.DataFrame) -> pa.Table:
            if df.empty:
                out = df
            else:
                is_edge = (
                    df.groupby(["id_a", "id_b"], sort=False)["_src"].transform("max")
                    == 1
                )
                out = df.loc[is_edge & (df["_src"] == 0)]
            return pa.table(
                {
                    "id_a": pa.array(out.get("id_a", []), type=node_t, from_pandas=True),
                    "id_b": pa.array(out.get("id_b", []), type=node_t, from_pandas=True),
                    "sup": pa.array(
                        out["sup"].to_numpy(np.int64) if len(out) else np.array([], np.int64)
                    ),
                }
            )

        parted2 = with_partition_key(both, ["id_a", "id_b"])
        return parted2.groupby("pkey").map_groups(keep_edges, batch_format="pandas")

    def orient(b: pa.Table) -> pa.Table:
        if not int_nodes:  # string nodes: lexicographic orientation
            df = b.to_pandas()
            lo = df[[src, dst]].min(axis=1)
            hi = df[[src, dst]].max(axis=1)
            return pa.table(
                {
                    src: pa.array(lo, type=node_t, from_pandas=True),
                    dst: pa.array(hi, type=node_t, from_pandas=True),
                }
            )
        x = np.asarray(b[src].combine_chunks().cast(pa.int64()), np.int64)
        y = np.asarray(b[dst].combine_chunks().cast(pa.int64()), np.int64)
        return pa.table(
            {src: pa.array(np.minimum(x, y)), dst: pa.array(np.maximum(x, y))}
        )

    cur = keyed_aggregate(
        edges2.map_batches(orient, batch_format="pyarrow"), [src, dst], count_alias="_c"
    ).drop_columns(["_c"])
    if (src, dst) != ("id_a", "id_b"):
        cur = cur.map_batches(
            lambda b: pa.table({"id_a": b[src], "id_b": b[dst]}), batch_format="pyarrow"
        )
    cur = cur.materialize()
    for _ in range(max(rounds, 0)):
        n_before = cur.count()
        if n_before == 0:
            break
        sup = edge_support(cur).materialize()
        surv = sup.filter(expr=f"sup >= {int(thresh)}").materialize()
        if surv.count() == n_before:
            break  # fixpoint: every further round is an identity
        cur = surv.select_columns(["id_a", "id_b"]).materialize()
    final = edge_support(cur)
    return final.filter(expr=f"sup >= {int(thresh)}")


def katz_rounds(
    edges: ray.data.Dataset,
    *,
    src: str = "subj",
    dst: str = "obj",
    rounds: int = 4,
    scale: int = 1000,
    alpha_milli: int = 150,
) -> ray.data.Dataset:
    """Integer-arithmetic truncated Katz centrality: ``(node, katz_units)``
    after R rounds of ``x_{r+1}(v) = scale + α_milli·(Σ_{(u,v)} x_r(u)) //
    1000`` from ``x_0 = scale`` — the damped count of walks ENDING at v
    (Katz 1953), the in-link prestige complement to PageRank's
    random-surfer and HITS' mutual reinforcement.  Multi-edges weight
    naturally; the floor-divided recurrence is bit-deterministic and
    exactly SQL-replayable (cf. :func:`hits_rounds`, whose two-plan shape
    this clones).

    Plans (budget=1 pytest pins equality): under the broadcast budget the
    whole iteration is one Ray task (np.unique factorize + int64
    scatter-add per round); above it each round is one planner-routed
    hash join (units onto the weighted edge list) + one keyed sum + one
    left join back onto the node table (sourceless nodes stay at
    ``scale``).  Values stay bounded by scale·(α·max_w_indegree/1000)^R —
    guarded against int64 overflow in both plans."""
    import numpy as np
    from ray.data.aggregate import Count

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def _proj(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": b[src].combine_chunks().cast(pa.string()),
                "d": b[dst].combine_chunks().cast(pa.string()),
            }
        )

    e, tbl_ref = assemble_table_ref(
        compact(edges.map_batches(_proj, batch_format="pyarrow")), columns=["s", "d"]
    )
    if tbl_ref is not None:
        _rounds, _scale, _alpha = rounds, scale, alpha_milli

        @ray.remote
        def _katz(tref) -> pa.Table:
            import numpy as np

            s = tref["s"].to_pandas().to_numpy(object)
            d = tref["d"].to_pandas().to_numpy(object)
            nodes, inv = np.unique(np.concatenate([s, d]), return_inverse=True)
            si, di = inv[: len(s)], inv[len(s):]
            # the overflow guard must run BEFORE the scatter-add: numpy
            # wraps silently, so a post-hoc raw.max() check can pass on a
            # wrapped value.  max possible sum = max_units * max weighted
            # indegree, checked per round against the alpha headroom.
            max_indeg = int(np.bincount(di, minlength=1).max())
            limit = np.iinfo(np.int64).max // max(_alpha, 1)
            x = np.full(len(nodes), _scale, np.int64)
            for _ in range(_rounds):
                if int(x.max(initial=0)) * max(max_indeg, 1) > limit:
                    raise ValueError("katz_rounds: units overflow int64")
                raw = np.zeros(len(nodes), np.int64)
                np.add.at(raw, di, x[si])
                x = _scale + _alpha * raw // 1000
            return pa.table(
                {
                    "node": pa.array(nodes.astype(str), pa.string()),
                    "katz_units": pa.array(x, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_katz.remote(tbl_ref)])

    # ---- exchange plan: weighted edges + per-round join/sum/left-join
    width = sized_width(e.size_bytes())
    we = keyed_aggregate(e, ["s", "d"], count_alias="w", width=width).materialize()

    def _nodes_part(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array([b["s"].combine_chunks(), b["d"].combine_chunks()])
        )
        return pa.table({"node": u})

    nodes = (
        we.map_batches(_nodes_part, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )
    # pre-accumulation overflow guard (int64 wraps silently): the max
    # possible per-node sum is max_units * max weighted indegree — both
    # O(1) scalars per round — checked against the alpha headroom
    wdeg = keyed_aggregate(
        we.map_batches(
            lambda b: pa.table({"node": b["d"], "w": b["w"]}), batch_format="pyarrow"
        ),
        ["node"],
        sums=["w"],
    )
    max_indeg = int(wdeg.max("w") or 0)
    limit = np.iinfo(np.int64).max // max(alpha_milli, 1)

    x = nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "u": pa.array(np.full(len(b), scale, np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(max(rounds, 0)):
        if int(x.max("u") or 0) * max(max_indeg, 1) > limit:
            raise ValueError("katz_rounds: units overflow int64")
        contrib = hash_join(we, x, on=["s"], right_on=["node"], width=width).map_batches(
            lambda b: pa.table(
                {
                    "node": b["d"].combine_chunks(),
                    "raw": pa.array(
                        np.asarray(b["w"].combine_chunks(), np.int64)
                        * np.asarray(b["u"].combine_chunks(), np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = keyed_aggregate(compact(contrib), ["node"], sums=["raw"], width=width)
        joined = hash_join(nodes, sums, on=["node"], how="left", width=width)

        def step(b: pa.Table) -> pa.Table:
            raw = np.asarray(
                pc.coalesce(b["raw"], pa.scalar(0, pa.int64())).combine_chunks(),
                np.int64,
            )
            return pa.table(
                {
                    "node": b["node"].combine_chunks(),
                    "u": pa.array(scale + alpha_milli * raw // 1000, pa.int64()),
                }
            )

        x = joined.map_batches(step, batch_format="pyarrow").materialize()

    return x.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"].combine_chunks().cast(pa.string()),
                "katz_units": b["u"].combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )


_MATCH_SALT = 1_000_151


def matching_rounds(
    edges: ray.data.Dataset,
    *,
    rounds: int,
    src: str = "a",
    dst: str = "b",
) -> ray.data.Dataset:
    """R-round deterministic greedy maximal MATCHING over a DISTINCT
    undirected edge table (the Israeli–Itai 1986 proposal shape with the
    engine's ``splitmix64(node * salt + round)`` priorities): each round
    every alive node proposes to its alive neighbour with the smallest
    (priority, id); mutually-proposing edges MATCH, their endpoints
    leave, and surviving edges continue.  Returns ``(a, b, round)`` with
    a < b — the conflict-free pairing primitive (co-ownership dedup,
    1-to-1 entity pairing, switch scheduling) complementary to the MIS
    node-selection peel, and a pure function of the graph the unrolled
    SQL replays decision-for-decision.

    Two value-equal plans (budget=1 pytest): under the broadcast budget
    the whole peel runs inside one Ray task (two minimum.at passes per
    round resolve the lexicographic (priority, id) argmin vectorized);
    above it each round is one directed-edge argmin co-location
    (:func:`~ontoea_ray.functions.shuffle.argmax_by` on order-inverted
    columns), one proposal self-join for mutuality, and the exact
    node-set/edge-set removals (`_nodes_minus` / `_edges_within`) — no
    node or edge set ever lands on the driver."""
    import numpy as np

    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import argmax_by, keyed_aggregate
    from ontoea_ray.stages.sampling import splitmix64

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if not int_nodes:
        # both plans index, invert (~y) and cast node ids as int64 — fail
        # fast rather than let the exchange plan raise ArrowInvalid mid-run
        raise ValueError(
            "matching_rounds requires integer node ids; map string ids to "
            "ints first (e.g. state/ids.py)"
        )
    if tbl_ref is not None:

        @ray.remote
        def _match(t) -> pa.Table:
            import numpy as np

            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
            ea, eb = inv[: len(a)], inv[len(a):]
            alive = np.ones(len(nodes), bool)
            oa, ob, orr = [], [], []
            for r in range(max(rounds, 0)):
                m = alive[ea] & alive[eb]
                if not m.any():
                    break
                dx = np.concatenate([ea[m], eb[m]])
                dy = np.concatenate([eb[m], ea[m]])
                p = splitmix64(
                    nodes.astype(np.uint64) * np.uint64(_MATCH_SALT) + np.uint64(r)
                )
                # lexicographic (priority, id) argmin in two vectorized passes;
                # node INDEX order == id order (nodes sorted), so min index
                # resolves the id tie-break
                minp = np.full(len(nodes), np.iinfo(np.uint64).max, np.uint64)
                np.minimum.at(minp, dx, p[dy])
                tie = p[dy] == minp[dx]
                prop = np.full(len(nodes), len(nodes), np.int64)
                np.minimum.at(prop, dx[tie], dy[tie])
                has = prop < len(nodes)
                mutual = has.copy()
                idx = np.flatnonzero(has)
                mutual[idx] = (prop[prop[idx]] == idx) & has[prop[idx]]
                x = np.flatnonzero(mutual)
                x = x[x < prop[x]]
                oa.append(nodes[x])
                ob.append(nodes[prop[x]])
                orr.append(np.full(len(x), r, np.int64))
                alive[x] = False
                alive[prop[x]] = False
            av = np.concatenate(oa) if oa else np.array([], np.int64)
            bv = np.concatenate(ob) if ob else np.array([], np.int64)
            rv = np.concatenate(orr) if orr else np.array([], np.int64)
            return pa.table(
                {
                    "a": pa.array(av, pa.int64()),
                    "b": pa.array(bv, pa.int64()),
                    "round": pa.array(rv, pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_match.remote(tbl_ref)])

    # ---- exchange plan ---------------------------------------------------
    e = edges2.materialize()
    tagged = []
    for r in range(max(rounds, 0)):
        if e.count() == 0:
            break

        def directed(b: pa.Table, _r=r) -> pa.Table:
            av = np.asarray(b[src].combine_chunks(), np.int64)
            bv = np.asarray(b[dst].combine_chunks(), np.int64)
            x = np.concatenate([av, bv])
            y = np.concatenate([bv, av])
            p = splitmix64(y.astype(np.uint64) * np.uint64(_MATCH_SALT) + np.uint64(_r))
            # order-inverted int64 views: argmax of (~signed(p), ~y) is the
            # lexicographic (p, y) MINIMUM
            p_inv = ~(p ^ np.uint64(1 << 63)).view(np.int64)
            return pa.table(
                {
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "p_inv": pa.array(p_inv),
                    "y_inv": pa.array(~y),
                }
            )

        prop = argmax_by(
            e.map_batches(directed, batch_format="pyarrow"), ["x"], ["p_inv", "y_inv"]
        ).select_columns(["x", "y"]).materialize()

        mutual = hash_join(prop, prop, on=["y"], right_on=["x"], rsuffix="_r")
        # columns: y (joined key = my proposal), x (me), y_r (its proposal)
        matched = mutual.filter(expr="y_r == x").filter(expr="x < y")

        def tag(b: pa.Table, _r=r) -> pa.Table:
            return pa.table(
                {
                    "a": b["x"].combine_chunks(),
                    "b": b["y"].combine_chunks(),
                    "round": pa.array(np.full(len(b), _r, np.int64)),
                }
            )

        mt = matched.map_batches(tag, batch_format="pyarrow").materialize()
        tagged.append(mt)
        ends = keyed_aggregate(
            mt.map_batches(
                lambda b: pa.table(
                    {
                        "node": pa.concat_arrays(
                            [b["a"].combine_chunks(), b["b"].combine_chunks()]
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            ["node"],
            count_alias="_c",
        ).drop_columns(["_c"]).materialize()
        nodes_alive = _nodes_minus(
            keyed_aggregate(
                e.map_batches(
                    lambda b: pa.table(
                        {
                            "node": pa.concat_arrays(
                                [
                                    b[src].combine_chunks().cast(pa.int64()),
                                    b[dst].combine_chunks().cast(pa.int64()),
                                ]
                            )
                        }
                    ),
                    batch_format="pyarrow",
                ),
                ["node"],
                count_alias="_c",
            ).drop_columns(["_c"]),
            ends,
        ).materialize()
        e = _edges_within(e, nodes_alive, src, dst).materialize()

    if not tagged:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "round": pa.array([], pa.int64()),
                }
            )
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.union(t)
    return out
