"""S1 — text extraction from raw page HTML.

``map_batches`` over zero-copy Arrow; the ``html`` binary column is dropped
immediately after extraction (project early — html rows can be MBs at web
scale, and no downstream stage needs them).

Per-row invariant (BASELINE.json input_hint): the extracted text is
byte-identical to the page's source text; pytest pins
``extract_text(wrap_html(t)) == t``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ontoea_ray.functions.text import extract_text


def _extract(batch: pa.Table) -> pa.Table:
    out = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": extract_text(batch["html"]),
            "lang": batch["lang"],
        }
    )
    return out


def extract_text_stage(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages(url, warc_ts, html, text?, lang) -> (url, warc_ts, text, lang)."""
    return pages.map_batches(_extract, batch_format="pyarrow")
