"""S6+S7 — entity canonicalization (groupby-aggregate clustering) and exact
triple dedup, designed for skew.

Canonicalization: every linked URI gets a cluster key (normalized local
name); the canonical representative per cluster is the most frequent URI
(ties -> lexicographically smallest).  At web scale hub entities make these
groups enormous, so raw rows are NEVER grouped by cluster key: a vectorized
per-batch combiner reduces each batch to (ckey, uri, partial_count) — the
moral equivalent of salting by block — and only that tiny partial table is
shuffled/collected.  The resulting uri->canonical map is vocabulary-sized,
broadcast via ``ray.put`` and applied with a gather (no second shuffle of
the big table).

Exact dedup is tree-shaped: a per-batch combiner (distinct triple + partial
count + min url) runs FUSED into the scan pass, a block-level combiner runs
after a compact(), and only then does ONE keyed groupby-aggregate shuffle
touch the (already tiny) partials.  Within a tkey group subj/pred/obj are
constant, so Min/Sum aggregates merge exactly.  Reference analog: the
``set()`` dedup on triple load
(`/root/reference/code/src/openea/modules/load/kg.py:56-75`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
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


def _partial_uri_counts(batch: pa.Table, weight_col: str | None = None) -> pa.Table:
    """One pass over subj+obj columns -> (ckey, uri, n) partials.

    ``weight_col`` (e.g. n_mentions on dedup partials) weights each row so
    counts over combiner output equal counts over the raw stream."""
    subj = batch["subj"].combine_chunks().cast(pa.string())
    obj = batch["obj"].combine_chunks().cast(pa.string())
    uris = pa.concat_arrays([subj, obj])
    if weight_col is not None:
        w = batch[weight_col].to_pandas().to_numpy()
        weights = np.concatenate([w, w])
    else:
        weights = np.ones(len(uris), np.int64)
    key = cluster_key(uris)
    df = pd.DataFrame({"ckey": key.to_pandas(), "uri": uris.to_pandas(), "n": weights})
    part = df.groupby(["ckey", "uri"], sort=False)["n"].sum().reset_index()
    return _from_pandas_clean(part)


def _merge_canonical_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Merge (ckey, uri, n) partials of ONE partition: canonical per cluster
    = most frequent uri, ties -> lexicographically smallest."""
    g = df.groupby(["ckey", "uri"], sort=False)["n"].sum().reset_index()
    g = g.sort_values(["ckey", "n", "uri"], ascending=[True, False, True], kind="mergesort")
    first = g.drop_duplicates("ckey")[["ckey", "uri"]].rename(columns={"uri": "canonical"})
    sizes = g.groupby("ckey", sort=False)["n"].sum().rename("cluster_size")
    out = g.merge(first, on="ckey").join(sizes, on="ckey")
    return out[["uri", "canonical", "cluster_size"]]


def build_canonical_map(
    triples: ray.data.Dataset,
    *,
    weight_col: str | None = None,
    driver_merge: bool | None = None,
    driver_max_bytes: int = 64 << 20,
) -> pa.Table:
    """Distributed frequency count per (cluster, uri) -> canonical map table
    (uri, canonical, cluster_size).  Vocabulary-sized — safe to broadcast.

    ``driver_merge=None`` (default) AUTO-selects by measured partial size:
    small partial tables are collected and merged in one pandas pass
    (skipping a shuffle round-trip); anything above ``driver_max_bytes``
    takes the fully distributed path — partials hash-partitioned by cluster
    key, each partition merged in a vectorized pass.  At 100 TB the partial
    table is #blocks × per-block vocab, NOT vocabulary-sized, so the
    default must never assume it fits on the driver."""
    partials = triples.map_batches(
        lambda b: _partial_uri_counts(b, weight_col), batch_format="pyarrow"
    )
    if driver_merge is None:
        partials = partials.materialize()
        driver_merge = (partials.size_bytes() or 0) <= driver_max_bytes
    if driver_merge:
        df = pd.DataFrame(partials.take_all())
        if df.empty:
            return pa.table({"uri": pa.array([], pa.string()), "canonical": pa.array([], pa.string()),
                             "cluster_size": pa.array([], pa.int64())})
        return _from_pandas_clean(_merge_canonical_partition(df))
    from ontoea_ray.functions.shuffle import sized_width, with_partition_key

    try:
        w = sized_width(partials.size_bytes())
    except Exception:
        w = None
    parted = with_partition_key(partials, ["ckey"], width=w)
    merged = parted.groupby("pkey").map_groups(_merge_canonical_partition, batch_format="pandas")
    return pa.Table.from_pylist(merged.take_all())


def _triple_key(subj: pa.Array, pred: pa.Array, obj: pa.Array) -> pa.Array:
    return pc.binary_join_element_wise(subj, pred, obj, SEP)


def make_canonicalizer(map_ref, *, partial: bool = False):
    """Stateless-task canonical substitution (the map is fetched zero-copy
    from the local object store per task; it is vocabulary-sized).

    ``partial=True`` operates on dedup-partial rows (tkey/n_mentions
    present): tkey is recomputed after substitution so merged triples
    re-key correctly."""

    def canonicalize(batch: pa.Table) -> pa.Table:
        tbl: pa.Table = ray.get(map_ref) if isinstance(map_ref, ray.ObjectRef) else map_ref
        uris = tbl["uri"].combine_chunks()
        canon = tbl["canonical"].combine_chunks()

        def sub(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            idx = pc.index_in(col, value_set=uris)
            replaced = canon.take(pc.fill_null(idx, 0))
            return pc.if_else(pc.is_valid(idx), replaced, col)

        subj = sub(batch["subj"])
        obj = sub(batch["obj"])
        pred = batch["pred"].combine_chunks()
        out = {"subj": subj, "pred": pred, "obj": obj, "url": batch["url"]}
        if partial:
            out["tkey"] = _triple_key(subj, pred, obj)
            out["n_mentions"] = batch["n_mentions"]
        # pass through any extra combiner columns (e.g. the edge-lifespan
        # min/max timestamps) — substitution only touches subj/obj/tkey
        for name in batch.column_names:
            if name not in out and name != "tkey":
                out[name] = batch[name]
        return pa.table(out)

    return canonicalize


PARTIAL_SCHEMA = pa.schema(
    [
        ("tkey", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)


def _partial_dedup(batch: pa.Table) -> pa.Table:
    """Within-batch combiner: distinct triple + occurrence count + min url.

    Arrow dictionary-encode + numpy grouping — no per-row string hashing in
    pandas (this combiner runs over every scanned triple, so it is on the
    hot path alongside the scan itself)."""
    if len(batch) == 0:
        return PARTIAL_SCHEMA.empty_table()
    key = _triple_key(
        batch["subj"].combine_chunks(), batch["pred"].combine_chunks(), batch["obj"].combine_chunks()
    )
    enc = pc.dictionary_encode(key)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_groups = len(enc.dictionary)
    n = len(codes)
    first = np.full(n_groups, n, np.int64)
    np.minimum.at(first, codes, np.arange(n, dtype=np.int64))
    counts = np.bincount(codes, minlength=n_groups)
    take = pa.array(first)
    # min url per group: Arrow's native hash aggregation (C++), keyed by the
    # int dictionary code — this combiner runs over every scanned triple, so
    # a pandas groupby here was ~30% of the whole pipeline's task time.
    gb = (
        pa.table({"c": pa.array(codes), "u": batch["url"].combine_chunks()})
        .group_by("c")
        .aggregate([("u", "min")])
    )
    order = pc.sort_indices(gb["c"])
    url_min = gb["u_min"].combine_chunks().take(order)
    return pa.table(
        {
            "tkey": enc.dictionary,
            "subj": batch["subj"].combine_chunks().take(take),
            "pred": batch["pred"].combine_chunks().take(take),
            "obj": batch["obj"].combine_chunks().take(take),
            "url": url_min,
            "n_mentions": pa.array(counts, pa.int64()),
        }
    )


def _merge_dedup_partials(batch: pa.Table) -> pa.Table:
    """Block-level combiner over first-level partials (tree aggregation)."""
    df = batch.to_pandas()
    part = df.groupby("tkey", sort=False).agg(
        subj=("subj", "first"), pred=("pred", "first"), obj=("obj", "first"),
        url=("url", "min"), n_mentions=("n_mentions", "sum"),
    ).reset_index()
    return _from_pandas_clean(part)


def dedup_merge(partials: ray.data.Dataset, *, width: int | None = None) -> ray.data.Dataset:
    """Merge dedup partials: tkey-co-located partitions (pkey column), one
    vectorized pandas merge per partition.

    ``width`` sizes the exchange: pass :func:`sized_width(size_bytes)
    <ontoea_ray.functions.shuffle.sized_width>` when the partial size is
    known (a combiner-sized table needs 1-2 partitions, not cpus//2 — the
    fixed shuffle tail was the dominant cost of the flagship's non-scan
    phase); defaults to the cluster-proportional width."""
    from ontoea_ray.functions.shuffle import shuffle_width, with_partition_key

    def merge_groups(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("tkey", sort=False).agg(
            subj=("subj", "first"), pred=("pred", "first"), obj=("obj", "first"),
            first_url=("url", "min"), n_mentions=("n_mentions", "sum"),
        ).reset_index(drop=True)
        return out

    parted = with_partition_key(partials, ["tkey"], width=width or shuffle_width())
    return parted.groupby("pkey").map_groups(merge_groups, batch_format="pandas")


def dedup_partials_stage(triples: ray.data.Dataset) -> ray.data.Dataset:
    """First-level combiner as a fusable map stage."""
    return triples.map_batches(_partial_dedup, batch_format="pyarrow")


def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct over (subj, pred, obj) with provenance counts."""
    return dedup_merge(dedup_partials_stage(triples))
