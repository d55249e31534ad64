"""Benchmark decontamination: flag / drop training documents that share any
word-n-gram with an evaluation ("benchmark") corpus.

The standard LLM-training-data hygiene step (n-gram-overlap decontamination
as described publicly in the GPT-3 / Gopher / Llama reports): any candidate
training document containing an n-gram that also occurs in a held-out
benchmark document is contaminated and must be dropped before training.

Scale shape — deliberately shuffle-free on the corpus side:

- The benchmark's distinct n-gram hash set is the SMALL side by construction
  (eval suites are MBs; the corpus is TBs).  It is reduced distributed
  (per-block ``np.unique`` partials), merged once, sorted, and broadcast
  with ``ray.put``.
- The corpus pass is a single ``map_batches`` actor pool: each actor pulls
  the sorted hash array once in ``__init__`` (zero-copy for numpy), then per
  batch computes shingle hashes with the vectorized rolling kernel from
  :mod:`ontoea_ray.stages.dedup` and tests membership via
  ``np.searchsorted`` — no shuffle, no join, no per-row Python.
- If the benchmark outgrows broadcast size, the same predicate degrades to
  the Bloom semi-join (:mod:`ontoea_ray.stages.bloom`) over the exploded
  shingle table; the broadcast path is the default because real benchmark
  suites are tiny relative to a 100 TB corpus.

Every arithmetic step (md5[:8] token hashes, wrap-mod-2^64 rolling combine)
is DuckDB-replayable, so the driver checks contamination overlap counts
value-exactly (``queries.q_decontaminate``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.stages.dedup import _shingle_hashes


def benchmark_ngram_hashes(
    bench: ray.data.Dataset, *, text_col: str = "text", shingle_n: int = 3
) -> np.ndarray:
    """Sorted distinct uint64 shingle hashes of the benchmark corpus.

    Reduced distributed (per-block unique partials); the driver merge is
    bounded by the benchmark's distinct-n-gram vocabulary — the small side
    of this operator by definition.
    """

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _shingle_hashes(batch[text_col].combine_chunks(), shingle_n)
        return pa.table({"h": pa.array(np.unique(flat))})

    parts = bench.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return np.unique(np.array([r["h"] for r in parts.take_all()], np.uint64))


class _OverlapKernel:
    """Actor-pool kernel: per-batch distinct-overlap count vs the broadcast
    benchmark hash set.  ``ray.get`` once per actor in ``__init__``."""

    def __init__(self, bench_ref, *, id_col: str, text_col: str, shingle_n: int,
                 keep_clean: bool):
        self.bench = (
            ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
        )
        self.id_col, self.text_col = id_col, text_col
        self.shingle_n, self.keep_clean = shingle_n, keep_clean

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offs = _shingle_hashes(batch[self.text_col].combine_chunks(), self.shingle_n)
        n_rows = len(batch)
        row_id = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offs))
        pos = np.searchsorted(self.bench, flat)
        hit = (pos < len(self.bench)) & (self.bench[np.minimum(pos, len(self.bench) - 1)] == flat) \
            if len(self.bench) else np.zeros(len(flat), bool)
        rid, hv = row_id[hit], flat[hit]
        # distinct matched hashes per row: lexsort + neighbor-diff dedup
        order = np.lexsort((hv, rid))
        rid, hv = rid[order], hv[order]
        first = np.ones(len(rid), bool)
        first[1:] = (rid[1:] != rid[:-1]) | (hv[1:] != hv[:-1])
        counts = np.bincount(rid[first], minlength=n_rows)
        if self.keep_clean:
            return batch.filter(pa.array(counts == 0))
        mask = counts > 0
        return pa.table(
            {
                self.id_col: batch[self.id_col].combine_chunks().filter(pa.array(mask)),
                "n_overlap": pa.array(counts[mask], pa.int64()),
            }
        )


def contamination_overlap(
    docs: ray.data.Dataset,
    bench_hashes: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """``(id_col, n_overlap)`` for every document sharing ≥1 distinct
    n-gram with the benchmark.  Single shuffle-free corpus pass."""
    ref = ray.put(np.ascontiguousarray(bench_hashes, np.uint64))
    from ontoea_ray.stages.scan_link import default_pool_size

    return docs.select_columns([id_col, text_col]).map_batches(
        _OverlapKernel,
        fn_constructor_kwargs=dict(
            bench_ref=ref, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n, keep_clean=False,
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(concurrency),
    )


def decontaminate(
    docs: ray.data.Dataset,
    bench_hashes: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """The clean corpus: rows with ZERO benchmark n-gram overlap, all
    columns preserved.  Same single-pass shape as
    :func:`contamination_overlap`."""
    ref = ray.put(np.ascontiguousarray(bench_hashes, np.uint64))
    from ontoea_ray.stages.scan_link import default_pool_size

    return docs.map_batches(
        _OverlapKernel,
        fn_constructor_kwargs=dict(
            bench_ref=ref, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n, keep_clean=True,
        ),
        batch_format="pyarrow",
        concurrency=default_pool_size(concurrency),
    )
