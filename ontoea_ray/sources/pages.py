"""Sources producing the ``pages`` table (BASELINE.json input_hint shape).

Schema: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string``.

Two constructors:

- :func:`pages_from_documents` — deterministically wraps the driver-provided
  ``documents.parquet`` (TESTDATA.md) into the pages shape, so every run at a
  given scale factor sees bit-identical input (no external data).
- :func:`read_pages` — plain ``read_parquet`` over an existing pages table
  (the production path at web scale; pass ``columns`` to prune at the read).
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ontoea_ray.functions.text import wrap_html

_EPOCH = _dt.datetime(2024, 1, 1)


def _docs_to_pages(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"]
    url = pc.binary_join_element_wise(
        "https://",
        batch["source"].combine_chunks() if isinstance(batch["source"], pa.ChunkedArray) else batch["source"],
        ".example.org/doc/",
        pc.cast(doc_id, pa.string()),
        "",
    )
    warc_ts = pc.add(
        pa.scalar(_EPOCH, pa.timestamp("us")).cast(pa.int64()),
        pc.multiply(pc.cast(doc_id, pa.int64()), 1_000_000),
    ).cast(pa.timestamp("us"))
    return pa.table(
        {
            "url": url,
            "warc_ts": warc_ts,
            "html": wrap_html(batch["text"]),
            "text": batch["text"],
            "lang": batch["lang"],
        }
    )


def pages_from_documents(sf_dir: str, *, replicate: int = 1) -> ray.data.Dataset:
    """Deterministic pages table derived from ``{sf_dir}/documents.parquet``.

    ``replicate > 1`` fans each document out to that many distinct urls
    (deterministic ``rep`` offset in doc_id/url) — used by the scaling bench
    to amplify the same input to a compute-bound size without external data.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    if replicate > 1:
        base = 10_000_000
        # Yield ~4k-row sub-tables so the amplified stream is split into
        # many small blocks — downstream stages then parallelize on the
        # POST-fan-out row count instead of inheriting a handful of huge
        # blocks (generator UDFs produce one block per yield).

        def fan_out(batch: pa.Table):
            import numpy as np

            n = len(batch)
            doc_ids = np.asarray(batch["doc_id"].to_pylist(), np.int64)
            chunk = max(1, 16384 // max(n, 1))
            idx_one = np.arange(n, dtype=np.int64)
            for start in range(0, replicate, chunk):
                reps = np.arange(start, min(start + chunk, replicate), dtype=np.int64)
                idx = np.tile(idx_one, len(reps))
                out = batch.take(pa.array(idx))
                new_ids = (doc_ids[None, :] + (reps * base)[:, None]).reshape(-1)
                yield out.set_column(
                    out.schema.get_field_index("doc_id"), "doc_id", pa.array(new_ids, pa.int64())
                )

        # num_cpus differs from the default downstream stages on purpose:
        # mismatched resource requests block operator fusion with the scan
        # actors (fused, batch sizing would see pre-fan-out rows).  Kept
        # BELOW 1 so the producer can still schedule when the actor pool
        # holds all but one CPU (1.001 deadlocked a 4-CPU session with a
        # 3-actor pool: 1 free CPU < 1.001 -> fan_out never ran).
        ds = ds.map_batches(fan_out, batch_format="pyarrow", num_cpus=0.9)
    return ds.map_batches(_docs_to_pages, batch_format="pyarrow")


def pages_from_texts(texts: list[str], *, lang: str = "en", source: str = "test") -> ray.data.Dataset:
    """Canonical pages table from in-memory texts (fixture/bootstrap
    convenience): positional doc ids, urls/warc_ts derived exactly like
    ``pages_from_documents``."""
    n = len(texts)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([lang] * n, pa.string()),
            "source": pa.array([source] * n, pa.string()),
        }
    )
    return ray.data.from_arrow(_docs_to_pages(tbl))


def read_pages(paths, columns: list[str] | None = None) -> ray.data.Dataset:
    """Pages from parquet.  Accepts either the canonical pages schema
    (url/warc_ts/html/text/lang) or the driver's documents schema
    (doc_id/text/lang/source) — the latter is wrapped deterministically
    into pages via the same transform the flagship oracle replays, so
    ``python -m ontoea_ray construct --pages documents.parquet`` works
    directly on the provided testdata."""
    import pyarrow.parquet as pq

    probe = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        import os

        if os.path.isdir(probe):
            inner = sorted(
                os.path.join(probe, f) for f in os.listdir(probe) if f.endswith(".parquet")
            )
            probe = inner[0] if inner else probe
        names = set(pq.read_schema(probe).names)
    except Exception:
        names = set()
    if "url" not in names and {"doc_id", "text", "source"} <= names:
        ds = ray.data.read_parquet(paths, columns=["doc_id", "text", "lang", "source"])
        return ds.map_batches(_docs_to_pages, batch_format="pyarrow")
    return ray.data.read_parquet(paths, columns=columns)


def read_pages_jsonl(paths) -> ray.data.Dataset:
    """Pages from JSONL shards — the common crawl-dump interchange format
    (one JSON object per line: url, warc_ts as ISO-8601 string, text, lang,
    optional html as a UTF-8 string).

    Normalizes into the canonical pages schema: ``warc_ts`` parsed to
    timestamp[us], ``html`` re-encoded to binary (rebuilt deterministically
    from ``text`` when the shard omits it).  ``read_json`` streams per-file
    blocks, so sharded JSONL parallelizes like parquet (just without column
    pruning — convert long-lived corpora to parquet)."""
    ds = ray.data.read_json(paths)

    def norm(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["warc_ts"].combine_chunks(), pa.timestamp("us"))
        text = batch["text"].combine_chunks()
        if "html" in batch.column_names:
            html = pc.cast(batch["html"].combine_chunks(), pa.binary())
        else:
            html = wrap_html(text)
        return pa.table(
            {
                "url": batch["url"].combine_chunks(),
                "warc_ts": ts,
                "html": html,
                "text": text,
                "lang": batch["lang"].combine_chunks(),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")
