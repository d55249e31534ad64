"""Deterministic random-walk corpus generation (DeepWalk / node2vec p=q=1).

Random walks over the KG / co-purchase graph are the classic graph-embedding
corpus generator (Perozzi et al., DeepWalk, KDD 2014): each node emits a
fixed-length walk whose step ``s`` moves to neighbour number
``splitmix64(walk_id * salt + s) % deg(cur)`` in the current node's sorted
adjacency list.  The hash-indexed step makes every walk a pure function of
the graph — reproducible, resumable, and DuckDB-replayable — while remaining
uniform over neighbours per step (splitmix64 is the engine-wide PRNG).

Distributed shape: the indexed adjacency (u, v, idx, deg) builds with one
distinct exchange plus one u-co-located ranking pass; each walk round is two
hash joins (state -> deg for the modulus, then (cur, idx) -> adjacency for
the hop) over walk-front-sized tables — the walk state never lands on the
driver, and the per-round joins ride the engine's auto-broadcast/exchange
planner, so a node-table that fits the broadcast budget makes every round a
map-side gather.

Reference parity note: the reference trains embeddings directly from triples
(no walk corpus); this stage serves the wider KG-embedding pipeline family
(DeepWalk/node2vec-style corpus at graph scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

WALK_SALT = 1_000_003


def indexed_adjacency(
    edges: ray.data.Dataset,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    width: int | None = None,
) -> ray.data.Dataset:
    """(u, v, idx, deg): distinct undirected adjacency, ``idx`` = rank of
    ``v`` ascending within ``u``, ``deg`` = |N(u)|.  One distinct exchange
    (both orientations exploded in-batch) + one u-co-located ranking pass."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.functions.tables import from_pandas as _fp

    def both(b: pa.Table) -> pa.Table:
        a = b[src].combine_chunks().cast(pa.int64())
        c = b[dst].combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "u": pa.concat_arrays([a, c]),
                "v": pa.concat_arrays([c, a]),
            }
        )

    und = keyed_aggregate(
        edges.map_batches(both, batch_format="pyarrow"), ["u", "v"],
        count_alias="_c", width=width,
    ).drop_columns(["_c"])
    parted = with_partition_key(und, ["u"], width=width)

    def rank_part(df: pd.DataFrame) -> pa.Table:
        df = df.drop(columns=["pkey"]).sort_values(["u", "v"], kind="mergesort")
        g = df.groupby("u", sort=False)
        df["idx"] = g.cumcount().astype("int64")
        df["deg"] = g["v"].transform("size").astype("int64")
        return _fp(df)

    return parted.groupby("pkey").map_groups(rank_part, batch_format="pandas")


def random_walks(
    edges: ray.data.Dataset,
    *,
    steps: int = 3,
    src: str = "id_a",
    dst: str = "id_b",
    salt: int = WALK_SALT,
    width: int | None = None,
) -> ray.data.Dataset:
    """(walk_id, step, node): one ``steps``-hop walk per graph node.

    Step rule (exactly what the SQL oracle replays): from ``cur`` move to
    the neighbour at sorted-adjacency index
    ``splitmix64(walk_id * salt + step) % deg(cur)``.

    Two plans, bit-equal (pinned by test): under the broadcast byte budget
    the WHOLE walk runs inside one Ray task over the assembled edge table
    (CSR + vectorized searchsorted hops — walking is a node-iterator
    problem like the k-core peel, so R distributed exchanges buy nothing
    but latency); above it, every round is two planner-routed hash joins
    over walk-front-sized tables and no state ever lands on the driver."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.stages.sampling import splitmix64

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _walk(tref) -> pa.Table:
            t = tref
            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            u = np.concatenate([a, b])
            v = np.concatenate([b, a])
            order = np.lexsort((v, u))
            u, v = u[order], v[order]
            if len(u):
                keep = np.ones(len(u), bool)
                keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
                u, v = u[keep], v[keep]
            nodes, counts = np.unique(u, return_counts=True)
            indptr = np.concatenate([[0], np.cumsum(counts)])
            cur = nodes.copy()
            out_w = [nodes] * (steps + 1)
            out_s = [np.full(len(nodes), s, np.int64) for s in range(steps + 1)]
            out_n = [nodes]
            for s in range(1, steps + 1):
                pos = np.searchsorted(nodes, cur)
                h = splitmix64(nodes.astype(np.uint64) * np.uint64(salt) + np.uint64(s))
                idx = (h % counts[pos].astype(np.uint64)).astype(np.int64)
                cur = v[indptr[pos] + idx]
                out_n.append(cur)
            return pa.table(
                {
                    "walk_id": pa.array(np.concatenate(out_w), pa.int64()),
                    "step": pa.array(np.concatenate(out_s), pa.int64()),
                    "node": pa.array(np.concatenate(out_n), pa.int64()),
                }
            )

        return ray.data.from_arrow_refs([_walk.remote(tbl_ref)])

    adj = indexed_adjacency(edges2, src=src, dst=dst, width=width).materialize()

    def deg_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        first = b.filter(pc.equal(b["idx"], 0))
        return pa.table({"u": first["u"], "deg": first["deg"]})

    deg = adj.map_batches(deg_rows, batch_format="pyarrow").materialize()
    hops = adj.select_columns(["u", "idx", "v"]).materialize()

    def start(b: pa.Table) -> pa.Table:
        return pa.table({"walk_id": b["u"], "cur": b["u"]})

    state = deg.map_batches(start, batch_format="pyarrow").materialize()

    def emit(step: int):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "walk_id": b["walk_id"].combine_chunks().cast(pa.int64()),
                    "step": pa.array(np.full(len(b), step, np.int64)),
                    "node": b["cur"].combine_chunks().cast(pa.int64()),
                }
            )

        return fn

    outs = [state.map_batches(emit(0), batch_format="pyarrow")]
    for s in range(1, steps + 1):

        def pick(b: pa.Table, _s=s) -> pa.Table:
            w = np.asarray(b["walk_id"].combine_chunks(), np.int64).astype(np.uint64)
            d = np.asarray(b["deg"].combine_chunks(), np.int64).astype(np.uint64)
            h = splitmix64(w * np.uint64(salt) + np.uint64(_s))
            return pa.table(
                {
                    "walk_id": b["walk_id"],
                    "cur": b["cur"],
                    "tgt": pa.array((h % d).astype(np.int64)),
                }
            )

        with_deg = hash_join(state, deg, on=["cur"], right_on=["u"])
        picked = with_deg.map_batches(pick, batch_format="pyarrow")
        hopped = hash_join(picked, hops, on=["cur", "tgt"], right_on=["u", "idx"])
        state = hopped.map_batches(
            lambda b: pa.table({"walk_id": b["walk_id"], "cur": b["v"]}),
            batch_format="pyarrow",
        ).materialize()
        outs.append(state.map_batches(emit(s), batch_format="pyarrow"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out
