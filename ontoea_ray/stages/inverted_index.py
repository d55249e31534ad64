"""Partitioned inverted index: build once, answer term lookups with
read pruning.

Same artifact pattern as the ANN indexes (`stages/ann.build_lsh_index` /
`build_ivf_index`): ONE pass writes the postings table as Parquet
partitioned by ``tb = md5_64(token) % n_buckets`` directories plus a
``_meta.json``; a term lookup then reads only its bucket partition —
1/n_buckets of the index leaves storage, regardless of corpus size.

Postings come from the vectorized ``functions.text.postings`` explode
(token, doc_id, pos).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.dedup import _token_hashes


def build_inverted_index(
    docs: ray.data.Dataset,
    index_dir: str,
    *,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """One streaming pass: postings explode -> bucket column -> partitioned
    Parquet write.  Returns (and persists) the index meta."""
    from ontoea_ray.functions.text import postings

    def explode(batch: pa.Table) -> pa.Table:
        out = postings(
            batch[text_col].combine_chunks(),
            np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64),
        )
        tb = (_token_hashes(out["token"].combine_chunks()) % np.uint64(n_buckets)).astype(np.int64)
        return out.append_column("tb", pa.array(tb, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    docs.map_batches(explode, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["tb"]
    )
    meta = {"n_buckets": n_buckets, "id_col": id_col}
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def lookup_token(
    index_dir: str,
    token: str,
    *,
    return_stats: bool = False,
):
    """Postings (doc_id, pos) for ``token``, reading ONLY its bucket
    partition.  ``return_stats=True`` also reports scanned vs total
    partitions (the read-pruning evidence)."""
    import hashlib

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    tb = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big") % meta["n_buckets"]
    bucket_dir = os.path.join(index_dir, f"tb={tb}")
    total = sum(1 for p in os.listdir(index_dir) if p.startswith("tb="))
    stats = {"scanned_buckets": 1 if os.path.isdir(bucket_dir) else 0, "total_buckets": total}
    empty = pa.table({"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())})
    if not os.path.isdir(bucket_dir):
        return (empty, stats) if return_stats else empty
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(bucket_dir, columns=["token", "doc_id", "pos"])
    out = t.filter(pc.equal(t["token"], token)).select(["doc_id", "pos"])
    out = out.sort_by([("doc_id", "ascending"), ("pos", "ascending")])
    return (out, stats) if return_stats else out
