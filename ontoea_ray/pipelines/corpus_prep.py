"""Composite LLM-corpus preparation pipeline.

The standard pre-training data flow, composed from this engine's operators
in one streaming graph:

    quality filter  ->  exact dedup  ->  MinHash-LSH near-dup removal
                    ->  token-budget sequence packing

Every stage is the engine's existing primitive (``queries.q_quality_filter``
rules, ``stages.dedup.exact_dedup`` / ``lsh_near_duplicates``,
``stages.sampling.pack_sequences``), and the WHOLE composite carries one
chained DuckDB oracle (`corpus_prep_sql`) — including the LSH near-dup SQL
replay — so the end-to-end pipeline is value-hash-checked, not just its
pieces.

Near-dup drop rule (deterministic, standard greedy): any document that
appears as ``id_b`` (the larger id) of a verified near-duplicate pair among
the surviving corpus is dropped; the smaller id survives.  Chains like
(1,2),(2,3) drop both 2 and 3.

Scale notes: the filter and dedup are the combiner-first shapes documented
in their own modules; the near-dup drop set is pair-output-sized and ships
via one ``ray.put`` (pairs ≪ corpus by construction); packing's prefix sum
shuffles nothing but per-block token totals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

QUALITY_RULES_SQL = (
    "len(str_split(text, ' ')) >= 30 AND len(str_split(text, ' ')) <= 100000"
    " AND (length(text) - greatest(len(str_split(text, ' ')) - 1, 0)) >= 3 * len(str_split(text, ' '))"
    " AND (length(text) - greatest(len(str_split(text, ' ')) - 1, 0)) <= 10 * len(str_split(text, ' '))"
    " AND len(list_filter(str_split(text, ' '),"
    " t -> t IN ('the','a','of','and','to','in','is','on'))) * 50 >= len(str_split(text, ' '))"
)


def quality_keep_mask(text: pa.Array) -> np.ndarray:
    """The q_quality_filter keep rule as a boolean mask (shared kernel)."""
    from ontoea_ray.functions.text import quality_stats

    q = quality_stats(text)
    nt = q["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = q["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    ns = q["n_stopwords"].to_numpy(zero_copy_only=False).astype(np.int64)
    letters = nc - np.maximum(nt - 1, 0)
    return (
        (nt >= 30) & (nt <= 100000)
        & (letters >= 3 * nt) & (letters <= 10 * nt)
        & (ns * 50 >= nt)
    )


def corpus_prep(
    docs: ray.data.Dataset,
    *,
    budget: int = 4096,
    neardup_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Returns the surviving corpus as (doc_id, pack_id), doc_id-ordered
    packing, after quality filter -> exact dedup -> near-dup removal."""
    from ontoea_ray.stages.dedup import exact_dedup, lsh_near_duplicates
    from ontoea_ray.stages.sampling import pack_sequences

    def keep_quality(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(quality_keep_mask(batch[text_col].combine_chunks())))

    filtered = docs.map_batches(keep_quality, batch_format="pyarrow")

    # exact dedup keeps (text -> min id); semi-join the corpus back to the
    # surviving ids (representative set is vocabulary-of-texts sized)
    reps = exact_dedup(filtered, key_col=text_col, id_col=id_col)
    rep_ids_ref = _ids_ref(reps, id_col)

    def keep_reps(batch: pa.Table) -> pa.Table:
        ids = ray.get(rep_ids_ref)
        return batch.filter(pc.is_in(batch[id_col].combine_chunks(), value_set=pa.array(ids)))

    corpus = filtered.map_batches(keep_reps, batch_format="pyarrow").materialize()

    pairs = lsh_near_duplicates(corpus, threshold=neardup_threshold,
                                id_col=id_col, text_col=text_col)
    drop_ref = _ids_ref(pairs, "id_b")

    def keep_unique(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        if len(drop) == 0:
            return batch
        mask = pc.invert(pc.is_in(batch[id_col].combine_chunks(), value_set=pa.array(drop)))
        return batch.filter(mask)

    survivors = corpus.map_batches(keep_unique, batch_format="pyarrow")
    packed = pack_sequences(survivors, key_col=id_col, budget=budget, text_col=text_col)
    return packed.select_columns([id_col, "pack_id"])


def _ids_ref(ds: ray.data.Dataset, col: str):
    """Distinct values of ``col`` assembled INSIDE a Ray task (object-store
    resident, never a driver list) and returned as an object ref."""

    @ray.remote
    def gather(*tbls: pa.Table):
        # empty blocks out of map_groups can carry a schema without `col`
        parts = [tb.select([col]) for tb in tbls if col in tb.column_names and len(tb)]
        if not parts:
            return pa.array([], pa.int64())
        t = pa.concat_tables(parts)
        u = pc.unique(t[col])
        return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u

    refs = ds.to_arrow_refs()
    if not refs:
        return ray.put(pa.array([], pa.int64()))
    return gather.remote(*refs)


def corpus_prep_sql(*, budget: int = 4096, neardup_threshold: float = 0.5,
                    source: str = "documents") -> str:
    """Chained oracle for :func:`corpus_prep`: quality rules -> min-id per
    text -> LSH near-dup SQL replay over the surviving corpus -> window
    cumsum packing."""
    from ontoea_ray.functions.lsh_sql import lsh_neardup_sql

    nd = lsh_neardup_sql(threshold=neardup_threshold, source="corpus")
    return f"""
WITH filt AS (SELECT doc_id, text FROM {source} WHERE {QUALITY_RULES_SQL}),
  ded AS (SELECT MIN(doc_id) AS doc_id FROM filt GROUP BY text),
  corpus AS (SELECT f.doc_id, f.text FROM filt f JOIN ded ON f.doc_id = ded.doc_id),
  nd AS ({nd}),
  keep AS (SELECT doc_id, text FROM corpus
           WHERE doc_id NOT IN (SELECT id_b FROM nd))
SELECT doc_id,
       CAST(COALESCE(SUM(len(str_split(text, ' ')))
              OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {budget} AS BIGINT) AS pack_id
FROM keep
"""
