"""Label-propagation community detection over a distinct undirected edge
table — the corpus-clustering primitive (mirror-site / template-family /
near-dup-cluster grouping at web scale) the flagship's entity-merge CC pass
does not cover: CC needs an explicit same-as edge, label propagation finds
DENSE regions of the co-occurrence graph without one.

Semantics (deterministic, exactly the unrolled SQL oracle's):
  - label(n) starts as n itself;
  - each synchronous round every node adopts the most frequent label among
    its neighbours' CURRENT labels, ties broken by the smallest label;
  - exactly R rounds (a fixpoint short-circuit fires only when NO label
    changed, which is an identity round in both engines).

Two bit-equal plans (pinned by a budget=1 test, like ``kcore_rounds``):
under the broadcast byte budget the whole R-round propagation runs inside
ONE Ray task over the in-task-assembled edge table (numpy lexsort +
run-length mode rounds — like k-core peeling this is a node-iterator
problem, so R distributed exchanges buy nothing but latency at small |E|);
above it every round is the distributed plan: oriented-edge hash join
against the label table, combiner-first (node, label) count aggregate, and
a node-co-located argmax (count desc, label asc) — no node, edge or label
set ever lands on the driver.

Reference parity note: the reference has no community operator; this is an
engine extension (SURVEY §2.14) in the family of its alignment-clustering
post-passes (/root/reference/code/src/openea/modules/finding/alignment.py's
greedy clustering), re-expressed as a graph kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _lp_rounds_numpy(
    a: np.ndarray, b: np.ndarray, rounds: int
) -> tuple[np.ndarray, np.ndarray]:
    """In-memory R-round propagation over int64 endpoint arrays; returns
    (nodes, labels) sorted by node.  Label values are node ids."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a) :]
    nidx = np.concatenate([ia, ib])
    nbidx = np.concatenate([ib, ia])
    labels = nodes.copy()
    for _ in range(max(rounds, 0)):
        nl = labels[nbidx]
        order = np.lexsort((nl, nidx))
        n_s, l_s = nidx[order], nl[order]
        if not len(n_s):
            break
        new_grp = np.empty(len(n_s), bool)
        new_grp[0] = True
        new_grp[1:] = (n_s[1:] != n_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(new_grp)
        counts = np.diff(np.append(starts, len(n_s)))
        gn, gl = n_s[starts], l_s[starts]
        # per node: max count, tie -> smallest label (rows already label-asc)
        ord2 = np.lexsort((gl, -counts, gn))
        gn2 = gn[ord2]
        first = np.empty(len(gn2), bool)
        first[0] = True
        first[1:] = gn2[1:] != gn2[:-1]
        sel = ord2[first]
        new_labels = np.empty_like(labels)
        new_labels[gn[sel]] = gl[sel]  # every node has >= 1 neighbour
        if np.array_equal(new_labels, labels):
            break  # fixpoint: further rounds are identities
        labels = new_labels
    return nodes, labels


def labelprop_rounds(
    edges: ray.data.Dataset,
    *,
    rounds: int,
    src: str = "a",
    dst: str = "b",
) -> ray.data.Dataset:
    """R-round synchronous label propagation over a DISTINCT undirected
    edge table; returns (node, label)."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.join import hash_join
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key

    edges2, tbl_ref = assemble_table_ref(
        edges.select_columns([src, dst]), columns=[src, dst]
    )
    int_nodes = all(
        pa.types.is_integer(f.type) for f in edges2.schema().base_schema
    )
    if tbl_ref is not None and int_nodes:

        @ray.remote
        def _prop(t: pa.Table) -> pa.Table:
            a = t[src].to_pandas().to_numpy(np.int64)
            b = t[dst].to_pandas().to_numpy(np.int64)
            nodes, labels = _lp_rounds_numpy(a, b, rounds)
            return pa.table(
                {"node": pa.array(nodes, pa.int64()),
                 "label": pa.array(labels, pa.int64())}
            )

        return ray.data.from_arrow_refs([_prop.remote(tbl_ref)])

    # distributed plan: per round one join exchange + one (node,label)
    # count exchange + one node-co-located argmax exchange
    def orient(b: pa.Table) -> pa.Table:
        s = b[src].combine_chunks()
        d = b[dst].combine_chunks().cast(s.type)
        return pa.table(
            {"node": pa.concat_arrays([s, d]), "nbr": pa.concat_arrays([d, s])}
        )

    oriented = edges2.map_batches(orient, batch_format="pyarrow").materialize()
    labels = keyed_aggregate(oriented, ["node"], count_alias="_c").map_batches(
        lambda b: pa.table(
            {"node": b["node"].combine_chunks(),
             "label": b["node"].combine_chunks()}
        ),
        batch_format="pyarrow",
    ).materialize()

    def pick(df):
        import pandas as pd  # noqa: F401  (pandas batch format)

        df = df.sort_values(
            ["node", "c", "label"], ascending=[True, False, True], kind="mergesort"
        )
        out = df.groupby("node", sort=False).head(1)[["node", "label"]]
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    for _ in range(max(rounds, 0)):
        j = hash_join(oriented, labels, on=["nbr"], right_on=["node"])
        counts = keyed_aggregate(j, ["node", "label"], count_alias="c")
        parted = with_partition_key(counts, ["node"])
        labels = (
            parted.groupby("pkey").map_groups(pick, batch_format="pandas").materialize()
        )
    return labels
