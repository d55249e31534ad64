"""Web link-graph stages over the pages table.

The Common-Crawl-style link graph: every page's ``href`` attributes become
``(src_url, href)`` edges, and the host-level projection ``(src_domain,
dst_domain)`` feeds indegree / centrality analytics (the same edge table the
public web-graph datasets distribute).  Extraction is one streaming
``map_batches`` pass over zero-copy Arrow — the html column is consumed and
dropped inside the batch, so at web scale the multi-MB payload bytes never
ride past this stage.

Scale notes: the explode multiplies rows by the per-page link count but the
emitted rows are two short strings each (≪ the html they came from);
``domain_indegree`` reduces combiner-first through the engine's
``keyed_aggregate`` (two keyed exchanges over domain-cardinality rows —
domains ≪ pages, so both exchanges move vocabulary-sized tables).

Reference parity note: the reference has no web-link stage (its inputs are
pre-extracted KG triples); this family serves the BASELINE.json north star's
Common-Crawl input shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.functions.text import outlink_lists, url_domain


def _explode(batch: pa.Table) -> pa.Table:
    links = outlink_lists(batch["html"])
    lengths = pa.compute.list_value_length(links).to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths.astype(np.int64))
    src = batch["url"].combine_chunks().take(pa.array(idx))
    return pa.table({"src_url": src, "href": pa.compute.list_flatten(links)})


def outlink_edges(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages(url, html, ...) -> (src_url, href), one row per anchor."""
    return pages.map_batches(_explode, batch_format="pyarrow")


def domain_edges(pages: ray.data.Dataset) -> ray.data.Dataset:
    """Host-level projection of the link graph: (src_domain, dst_domain)."""

    def project(batch: pa.Table) -> pa.Table:
        e = _explode(batch)
        return pa.table(
            {
                "src_domain": url_domain(e["src_url"]),
                "dst_domain": url_domain(e["href"]),
            }
        )

    return pages.map_batches(project, batch_format="pyarrow")


def anchor_edges(pages: ray.data.Dataset) -> ray.data.Dataset:
    """pages(url, html, ...) -> (src_url, href, anchor): one row per
    ``<a href>`` tag, carrying its anchor TEXT — the surface-form signal
    entity-alias tables are built from (anchor text is how the web names
    the page it links to).  Same zero-copy streaming contract as
    :func:`outlink_edges`: html bytes die inside the batch."""
    from ontoea_ray.functions.text import anchor_lists

    def explode(batch: pa.Table) -> pa.Table:
        hrefs, texts = anchor_lists(batch["html"])
        lengths = pa.compute.list_value_length(hrefs).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths.astype(np.int64))
        return pa.table(
            {
                "src_url": batch["url"].combine_chunks().take(pa.array(idx)),
                "href": pa.compute.list_flatten(hrefs),
                "anchor": pa.compute.list_flatten(texts),
            }
        )

    return pages.map_batches(explode, batch_format="pyarrow")


def anchor_text_table(
    pages: ray.data.Dataset, *, width: int | None = None
) -> ray.data.Dataset:
    """Per (dst_domain, anchor) inbound-anchor counts — the alias/surface
    prior table for entity linking (how often the web calls this host by
    this name).  One combiner-first keyed exchange over the (domain, anchor)
    vocabulary; raw anchor rows never shuffle."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dst_domain": url_domain(batch["href"]),
                "anchor": batch["anchor"].combine_chunks(),
            }
        )

    pairs = anchor_edges(pages).map_batches(project, batch_format="pyarrow")
    return keyed_aggregate(
        pairs, ["dst_domain", "anchor"], count_alias="n_anchors", width=width
    )


def domain_indegree(pages: ray.data.Dataset, *, width: int | None = None) -> ray.data.Dataset:
    """Per destination host: total inbound anchors and distinct source hosts.

    Two-level combiner-first reduction: (dst, src) pair counts first (one
    keyed exchange over the distinct pair vocabulary), then per-dst totals
    (second exchange over dst cardinality) — the distinct-source count falls
    out of the first level's group count, so no distinct-aggregate shuffle of
    raw edges ever happens."""
    from ontoea_ray.functions.shuffle import keyed_aggregate

    pairs = keyed_aggregate(
        domain_edges(pages),
        ["dst_domain", "src_domain"],
        count_alias="n_edges",
        width=width,
    )
    return keyed_aggregate(
        pairs,
        ["dst_domain"],
        sums=["n_edges"],
        count_alias="n_src_domains",
        width=width,
    )
