"""S6+S7 — entity canonicalization (groupby-aggregate clustering) and exact
triple dedup, designed for skew.

Canonicalization: every linked URI gets a cluster key (normalized local
name); the canonical representative per cluster is the most frequent URI
(ties -> lexicographically smallest).  At web scale hub entities make these
groups enormous, so raw rows are NEVER grouped by cluster key: a vectorized
per-batch combiner reduces each batch to (ckey, uri, partial_count) — the
moral equivalent of salting by block — and only that tiny partial table is
shuffled.  The resulting uri->canonical map is vocabulary-sized, broadcast
via ``ray.put`` and applied to the triple stream with a gather (no second
shuffle of the big table).

Exact dedup: within-batch combiner (distinct triple + partial count + min
url) then ONE native groupby-aggregate shuffle on the composite key (all
non-key columns are constant within a group, so Min/Sum merge is exact).
Reference analog: the ``set()`` dedup on triple load
(`/root/reference/code/src/openea/modules/load/kg.py:56-75`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min, Sum

SEP = "\x1f"


def cluster_key(uri: pa.Array) -> pa.Array:
    """Normalized clustering key for an entity URI: lowercased local name."""
    if isinstance(uri, pa.ChunkedArray):
        uri = uri.combine_chunks()
    slashed = pc.binary_join_element_wise("/", uri, "")  # guarantee >=1 separator
    parts = pc.split_pattern(slashed, pattern="/", max_splits=1, reverse=True)
    local = pc.list_element(parts, 1)
    return pc.utf8_lower(local)


def _partial_uri_counts(batch: pa.Table) -> pa.Table:
    """One pass over subj+obj columns -> (ckey, uri, n) partials."""
    uris = pa.concat_arrays(
        [batch["subj"].combine_chunks().cast(pa.string()), batch["obj"].combine_chunks().cast(pa.string())]
    )
    key = cluster_key(uris)
    df = pd.DataFrame({"ckey": key.to_pandas(), "uri": uris.to_pandas()})
    part = df.groupby(["ckey", "uri"], sort=False).size().reset_index(name="n")
    return pa.Table.from_pandas(part, preserve_index=False)


def _pick_canonical(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values(["n", "uri"], ascending=[False, True], kind="mergesort")
    return pd.DataFrame(
        {"uri": g["uri"], "canonical": g["uri"].iloc[0], "cluster_size": int(g["n"].sum())}
    )


def build_canonical_map(triples: ray.data.Dataset) -> pa.Table:
    """Distributed frequency count per (cluster, uri) -> canonical map table
    (uri, canonical, cluster_size).  Vocabulary-sized — safe to broadcast."""
    from ontoea_ray.functions.shuffle import compact

    partials = triples.map_batches(_partial_uri_counts, batch_format="pyarrow")
    per_uri = compact(partials).groupby(["ckey", "uri"]).aggregate(Sum("n", alias_name="n"))
    merged = per_uri.groupby("ckey").map_groups(_pick_canonical, batch_format="pandas")
    return pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)


def make_canonicalizer(map_ref):
    """Stateless-task canonical substitution (the map is fetched zero-copy
    from the local object store per task; it is vocabulary-sized)."""

    def canonicalize(batch: pa.Table) -> pa.Table:
        tbl: pa.Table = ray.get(map_ref) if isinstance(map_ref, ray.ObjectRef) else map_ref
        uris = tbl["uri"].combine_chunks()
        canon = np.asarray(tbl["canonical"].to_pylist(), dtype=object)

        def sub(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=uris).to_numpy(zero_copy_only=False)
            miss = np.isnan(idx) if idx.dtype.kind == "f" else idx < 0
            idx = np.where(miss, 0, idx).astype(np.int64)
            out = canon[idx]
            if miss.any():
                orig = np.asarray(col.to_pylist(), dtype=object)
                out = np.where(miss, orig, out)
            return pa.array(out.tolist(), pa.string())

        return pa.table(
            {
                "subj": sub(batch["subj"]),
                "pred": batch["pred"],
                "obj": sub(batch["obj"]),
                "url": batch["url"],
            }
        )

    return canonicalize


def _partial_dedup(batch: pa.Table) -> pa.Table:
    """Within-batch combiner: distinct triple + occurrence count + min url."""
    key = pc.binary_join_element_wise(
        batch["subj"].combine_chunks(), batch["pred"].combine_chunks(), batch["obj"].combine_chunks(), SEP
    )
    df = pd.DataFrame(
        {
            "tkey": key.to_pandas(),
            "subj": batch["subj"].to_pandas(),
            "pred": batch["pred"].to_pandas(),
            "obj": batch["obj"].to_pandas(),
            "url": batch["url"].to_pandas(),
        }
    )
    part = df.groupby("tkey", sort=False).agg(
        subj=("subj", "first"), pred=("pred", "first"), obj=("obj", "first"),
        url=("url", "min"), n_mentions=("tkey", "size"),
    ).reset_index()
    return pa.Table.from_pandas(part, preserve_index=False)


def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct over (subj, pred, obj) with provenance counts.

    Native groupby-aggregate merge (no per-group Python): within a tkey
    group subj/pred/obj are constant, so Min is an exact representative."""
    from ontoea_ray.functions.shuffle import compact

    partials = triples.map_batches(_partial_dedup, batch_format="pyarrow")
    out = compact(partials).groupby("tkey").aggregate(
        Min("subj", alias_name="subj"),
        Min("pred", alias_name="pred"),
        Min("obj", alias_name="obj"),
        Min("url", alias_name="first_url"),
        Sum("n_mentions", alias_name="n_mentions"),
    )
    return out.drop_columns(["tkey"])
