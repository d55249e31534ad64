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


def pages_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic pages table derived from ``{sf_dir}/documents.parquet``."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(_docs_to_pages, batch_format="pyarrow")


def read_pages(paths, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(paths, columns=columns)
