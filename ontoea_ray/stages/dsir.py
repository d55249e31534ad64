"""DSIR-style importance weighting for data selection.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023) scores
every raw document by how target-like its hashed n-gram distribution is;
resampling by those weights yields a corpus that matches the target domain.
This implementation keeps the hashed-feature trick (tokens hash into
``n_buckets`` slots, so the fitted state is CONSTANT-SIZE regardless of
corpus scale) but scores with exact integer ratios instead of log
probabilities — per token occurrence

    w(tok) = (SCALE * (n_tgt[b] + 1) * (raw_total + B))
             // ((n_raw[b] + 1) * (tgt_total + B)),   b = md5_64(tok) % B

(add-one smoothing on both distributions; > SCALE means the token's bucket
is over-represented in the target).  Every value is a pure integer function
of the corpus, so the DuckDB oracle replays each document's weight
bit-for-bit — the same no-libm-log convention as ``q_lm_score``.

Scale shape: bucket counts are combiner-first (per-block bincount partials,
one keyed aggregate over <= B rows); the fitted weight table is B integers
assembled INSIDE a Ray task and broadcast once per actor; scoring is a
shuffle-free per-block pass (a doc's tokens never leave its block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

DSIR_SCALE = 1_000_000


def bucket_counts(
    docs: ray.data.Dataset,
    *,
    n_buckets: int = 1024,
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> ray.data.Dataset:
    """(bucket, n_raw, n_tgt): hashed-token occurrence counts over the full
    corpus and its target subset, in ONE pass (combiner-first)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.stages.dedup import _token_hashes

    B = int(n_buckets)

    def partial(b: pa.Table) -> pa.Table:
        toks = tokenize(b[text_col])
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        bucket = (_token_hashes(flat) % np.uint64(B)).astype(np.int64)
        is_tgt_row = pc.equal(
            b[target_col].combine_chunks(), pa.scalar(target_value)
        ).to_numpy(zero_copy_only=False)
        is_tgt_tok = np.repeat(is_tgt_row, lens)
        raw = np.bincount(bucket, minlength=B)
        tgt = np.bincount(bucket[is_tgt_tok], minlength=B)
        nz = raw > 0
        return pa.table(
            {
                "bucket": pa.array(np.nonzero(nz)[0].astype(np.int64)),
                "n_raw": pa.array(raw[nz].astype(np.int64)),
                "n_tgt": pa.array(tgt[nz].astype(np.int64)),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow")
    return keyed_aggregate(partials, ["bucket"], sums=["n_raw", "n_tgt"])


def dsir_weights(
    docs: ray.data.Dataset,
    *,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    scale: int = DSIR_SCALE,
) -> ray.data.Dataset:
    """(doc_id, dsir_sum, n_tokens, dsir_mean): per-document importance
    weights — the sum (and floor-mean) of per-token integer ratio scores.

    The fitted state is the <= ``n_buckets``-row count table: assembled
    inside a Ray task, weight array built exactly (Python ints — the
    128-bit intermediate ``scale * (n_tgt+1) * (raw_total+B)`` must not
    wrap) and broadcast once per scoring actor."""
    from ontoea_ray.functions.broadcast import assemble_table_ref
    from ontoea_ray.functions.text import tokenize
    from ontoea_ray.stages.dedup import _token_hashes

    B = int(n_buckets)
    counts = bucket_counts(
        docs, n_buckets=B, text_col=text_col,
        target_col=target_col, target_value=target_value,
    )
    counts, ref = assemble_table_ref(counts, columns=["bucket", "n_raw", "n_tgt"])
    assert ref is not None, "bucket table is <= n_buckets rows; always broadcastable"

    class _Score:
        def __init__(self):
            t = ray.get(ref)
            bucket = np.asarray(t["bucket"].combine_chunks(), np.int64)
            n_raw = np.asarray(t["n_raw"].combine_chunks(), np.int64)
            n_tgt = np.asarray(t["n_tgt"].combine_chunks(), np.int64)
            raw_total = int(n_raw.sum())
            tgt_total = int(n_tgt.sum())
            num_base = scale * (raw_total + B)
            den_base = tgt_total + B
            w = np.full(B, num_base // den_base, dtype=np.int64)  # empty-bucket default
            for bkt, nr, nt in zip(bucket, n_raw, n_tgt):
                w[bkt] = (num_base * (int(nt) + 1)) // ((int(nr) + 1) * den_base)
            assert int(w.max()) < (1 << 62), "weight overflow guard"
            self.w = w

        def __call__(self, b: pa.Table) -> pa.Table:
            toks = tokenize(b[text_col])
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            flat = toks.flatten()
            bucket = (_token_hashes(flat) % np.uint64(B)).astype(np.int64)
            seg = np.repeat(np.arange(len(b), dtype=np.int64), lens)
            sums = (
                pd.Series(self.w[bucket])
                .groupby(seg, sort=True)
                .sum()
                .reindex(range(len(b)), fill_value=0)
                .to_numpy(np.int64)
            )
            safe_n = np.maximum(lens, 1)
            return pa.table(
                {
                    id_col: b[id_col].combine_chunks().cast(pa.int64()),
                    "dsir_sum": pa.array(sums),
                    "n_tokens": pa.array(lens),
                    "dsir_mean": pa.array(sums // safe_n),
                }
            )

    from ontoea_ray.stages.scan_link import default_pool_size

    return docs.map_batches(
        _Score, batch_format="pyarrow", concurrency=(1, default_pool_size(None))
    )
