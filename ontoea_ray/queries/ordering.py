"""Queries: ordering (split from the former single-module registry)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ontoea_ray.functions.shuffle import compact
from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
from ontoea_ray.queries._core import ORACLE_SQL, QUERIES, _kg_cached, _read, _register


# global order statistics: deterministic shuffle, NTILE bucketing
# ---------------------------------------------------------------------------

from ontoea_ray.functions.lsh_sql import splitmix64_ctes as _sm_ctes

_DET_SHUFFLE_SQL = f"""
    WITH {_sm_ctes("documents", "doc_id")}
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY _h, doc_id) - 1 AS BIGINT) AS pos
    FROM sm3
"""


@_register("q_det_shuffle", _DET_SHUFFLE_SQL)
def q_det_shuffle(sf_dir: str):
    """Deterministic global corpus shuffle with exact position: rank rows
    by splitmix64(doc_id) (uniform, reproducible, resumable — rerunning
    yields the same training order, unlike random_shuffle).  ONE all-to-all
    (the range-partitioned sort); global positions from block-metadata
    offsets appended worker-side (stages/quantiles.with_global_rank) — the
    driver holds one int per block."""
    from ontoea_ray.stages.quantiles import with_global_rank
    from ontoea_ray.stages.sampling import splitmix64

    docs = _read(sf_dir, "documents", ["doc_id"])

    def add_hash(b: pa.Table) -> pa.Table:
        d = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        return pa.table(
            {"doc_id": b["doc_id"], "_h": pa.array(splitmix64(d.view(np.uint64)))}
        )

    ranked = with_global_rank(
        docs.map_batches(add_hash, batch_format="pyarrow"),
        ["_h", "doc_id"],
        rank_col="pos",
    )
    return ranked.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "pos": b["pos"]}),
        batch_format="pyarrow",
    )


_NTILE_K = 8

_NTILE_SQL = f"""
    SELECT doc_id,
           CAST(NTILE({_NTILE_K}) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS bucket
    FROM documents
"""


@_register("q_ntile", _NTILE_SQL)
def q_ntile(sf_dir: str):
    """Exact global quantile bucketing (quality-score NTILE: route docs to
    curriculum tiers by corpus-wide rank, not per-block approximation).
    Global rank via sort + block-metadata offsets, then the 1-based NTILE
    assignment (first n%k buckets take one extra row) computed vectorized
    from (rank, n) — bit-equal to SQL NTILE with a unique tiebreaker."""
    from ontoea_ray.stages.quantiles import with_global_rank

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    ranked = with_global_rank(docs, ["n_chars", "doc_id"], rank_col="_rank")
    n = ranked.count()
    q, r = divmod(n, _NTILE_K)

    def bucket(b: pa.Table) -> pa.Table:
        i = np.asarray(b["_rank"].combine_chunks(), np.int64)
        cut = r * (q + 1)
        big = i // (q + 1)
        small = r + (i - cut) // max(q, 1)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "bucket": pa.array(np.where(i < cut, big, small) + 1),
            }
        )

    return ranked.map_batches(bucket, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# duplicated-span quality signal (MassiveText/RefinedWeb-style dup fraction)
# ---------------------------------------------------------------------------

_DUP_N = 4

_DUP_SPANS_SQL = f"""
    WITH tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i : i + {_DUP_N - 1}], ' ') AS shingle
           FROM tok, LATERAL (SELECT unnest(range(1, greatest(len(t) - {_DUP_N - 2}, 2))) AS i) r),
    cnt AS (SELECT shingle, COUNT(*) AS nd FROM sh GROUP BY 1)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(1000 * SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
             AS dup_frac_milli
    FROM sh JOIN cnt USING (shingle)
    GROUP BY 1
"""


@_register("q_dup_spans", _DUP_SPANS_SQL)
def q_dup_spans(sf_dir: str):
    """Per-doc duplicated-span fraction: how many of a doc's distinct
    4-token shingles occur in more than one document (the
    MassiveText duplicate-fraction quality signal).  Vectorized shingle
    explode (dedup.shingle_strings), then ONE shingle-hash co-location:
    with every copy of a shingle in the same partition, its global doc
    count AND the per-doc dup partials come out of the same in-partition
    pass — no shingle-count join (the earlier count -> full hash-join-back
    plan moved the corpus-sized shingle table through TWO extra exchanges
    and re-ran the explode once per consumer; 2 exchanges now vs 3)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, with_partition_key
    from ontoea_ray.stages.dedup import shingle_strings

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def sh_batch(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].combine_chunks(), np.int64)
        df = shingle_strings(b["text"], ids, _DUP_N)
        return _from_pandas_clean(df.rename(columns={"id": "doc_id"}))

    sh = docs.map_batches(sh_batch, batch_format="pyarrow")
    parted = with_partition_key(sh, ["shingle"])

    def per_part(df: pd.DataFrame) -> pa.Table:
        nd = df.groupby("shingle", sort=False)["doc_id"].transform("size")
        df["n_dup"] = (nd >= 2).astype(np.int64)
        g = (
            df.groupby("doc_id", sort=False)
            .agg(n_shingles=("n_dup", "size"), n_dup=("n_dup", "sum"))
            .reset_index()
        )
        return _from_pandas_clean(g)

    per_doc = keyed_aggregate(
        parted.groupby("pkey").map_groups(per_part, batch_format="pandas"),
        ["doc_id"],
        sums=["n_shingles", "n_dup"],
    )
    return per_doc.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "n_shingles": b["n_shingles"],
                "n_dup": b["n_dup"],
                "dup_frac_milli": pc.divide(
                    pc.multiply(pa.scalar(1000, pa.int64()), b["n_dup"].combine_chunks()),
                    b["n_shingles"].combine_chunks(),
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
