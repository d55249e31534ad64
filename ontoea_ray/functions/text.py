"""Vectorized text kernels used inside ``map_batches`` stages.

All functions are pure Arrow-in / Arrow-out (or numpy) so the hot path never
iterates Python rows.  The HTML wrap/extract pair is deliberately a bijection
on the ``text`` payload: ``extract_text(wrap_html(text)) == text`` byte for
byte, which is the per-row invariant the driver/pytest check
(BASELINE.json input_hint; cf. reference text loaders
``/root/reference/code/src/openea/modules/load/read.py:219-236`` which are
likewise exact, lossless parsers).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ARTICLE_OPEN = "<article>"
ARTICLE_CLOSE = "</article>"
NAV_OPEN = "<nav>"
NAV_CLOSE = "</nav>"
# deterministic outlink fan-out per synthesized page (see nav_links_block)
N_NAV_LINKS = 3

# Minimal HTML entity escaping — order matters: '&' first on escape, last on
# unescape, so the mapping is a bijection for arbitrary input text.
_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# Tiny deterministic stopword profiles for language identification —
# an n-gram/stopword heuristic in the spirit of public langid approaches.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "nicht", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
    "es": ("el", "la", "que", "los", "una", "es", "y"),
}


def _as_array(arr) -> pa.Array:
    """Normalize ChunkedArray (what pa.Table columns are) to a flat Array."""
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


def escape_html_text(arr: pa.Array) -> pa.Array:
    """Escape text for embedding into the deterministic HTML template."""
    for raw, esc in _ESCAPES:
        arr = pc.replace_substring(arr, pattern=raw, replacement=esc)
    return arr


def unescape_html_text(arr: pa.Array) -> pa.Array:
    for raw, esc in reversed(_ESCAPES):
        arr = pc.replace_substring(arr, pattern=esc, replacement=raw)
    return arr


def _list_rebuild(flat: pa.Array, lengths: np.ndarray) -> pa.ListArray:
    """ListArray from a flat child + per-row lengths (offset-safe)."""
    offsets = pa.array(
        np.concatenate([[0], np.cumsum(lengths, dtype=np.int64)]), pa.int32()
    )
    return pa.ListArray.from_arrays(offsets, flat)


def nav_links_block(text: pa.Array) -> pa.Array:
    """Deterministic per-page outlink ``<nav>`` block.

    The first ``N_NAV_LINKS`` space-tokens of the page text each become an
    anchor ``<a href="https://{tok}.example.org/t/{tok}">{tok}</a>`` (tokens
    HTML-escaped like the body).  This is the synthetic stand-in for a real
    page's link section — the Common-Crawl-style web link graph derives from
    it via :func:`outlink_lists` — and the rule is a pure string function of
    ``text``, so DuckDB oracles replay every href exactly.
    """
    esc = escape_html_text(_as_array(text))
    sliced = pc.list_slice(pc.split_pattern(esc, pattern=" "), 0, N_NAV_LINKS)
    lengths = pc.list_value_length(sliced).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(sliced)
    anchors = pc.binary_join_element_wise(
        '<a href="https://', flat, ".example.org/t/", flat, '">', flat, "</a>", ""
    )
    inner = pc.binary_join(_list_rebuild(anchors, lengths), "")
    return pc.binary_join_element_wise(NAV_OPEN, inner, NAV_CLOSE, "")


def wrap_html(text: pa.Array) -> pa.Array:
    """Build deterministic page HTML around ``text`` (binary column out).

    Layout: head, a ``<nav>`` outlink block (:func:`nav_links_block` —
    OUTSIDE the article markers, so text extraction is unaffected), then the
    escaped body between the article markers."""
    esc = escape_html_text(_as_array(text))
    html = pc.binary_join_element_wise(
        "<html><head><meta charset=\"utf-8\"/></head><body>",
        nav_links_block(text),
        ARTICLE_OPEN,
        esc,
        ARTICLE_CLOSE + "</body></html>",
        "",
    )
    return html.cast(pa.binary())


def outlink_lists(html: pa.Array) -> pa.ListArray:
    """All ``href="..."`` attribute values per page, in document order.

    Generic over any HTML bytes (not just :func:`wrap_html` output):
    vectorized split on the ``href="`` opener, drop each row's pre-first-href
    prefix, then cut every fragment at its closing quote.  Attribute values
    are returned as raw bytes (no entity unescaping), matching what a crawler
    link-graph extraction emits."""
    s = _as_array(html).cast(pa.string())
    parts = pc.split_pattern(s, pattern='href="')
    n_list = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(parts)
    starts = np.concatenate([[0], np.cumsum(n_list, dtype=np.int64)])[:-1]
    mask = np.ones(len(flat), bool)
    mask[starts[n_list > 0]] = False  # the before-first-href fragment per row
    kept = flat.filter(pa.array(mask))
    urls = pc.list_element(pc.split_pattern(kept, pattern='"', max_splits=1), 0)
    return _list_rebuild(urls, np.maximum(n_list - 1, 0))


def anchor_lists(html: pa.Array) -> tuple[pa.ListArray, pa.ListArray]:
    """Per-page ``(hrefs, anchor_texts)`` list pair from ``<a href="...">``
    tags, in document order.

    Generic over any HTML bytes: vectorized split on the ``<a href="``
    opener; each fragment's href is the run up to its closing quote (extra
    attributes after the href survive — the cut at ``">`` still lands at the
    tag end), and its anchor text is the run between the tag-closing ``">``
    and ``</a>``.  Unterminated anchors yield "" text, never a crash — the
    crawler-extraction convention."""
    s = _as_array(html).cast(pa.string())
    parts = pc.split_pattern(s, pattern='<a href="')
    n_list = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(parts)
    starts = np.concatenate([[0], np.cumsum(n_list, dtype=np.int64)])[:-1]
    mask = np.ones(len(flat), bool)
    mask[starts[n_list > 0]] = False  # the before-first-anchor fragment
    kept = flat.filter(pa.array(mask))
    hrefs = pc.list_element(pc.split_pattern(kept, pattern='"', max_splits=1), 0)
    after_tag = pc.split_pattern(kept, pattern='">', max_splits=1)
    # rows without a '">' (unterminated tag) have a 1-element split; gather
    # the LAST element then blank the unterminated ones
    lens2 = pc.list_value_length(after_tag).to_numpy(zero_copy_only=False).astype(np.int64)
    tail = pc.list_flatten(after_tag).take(pa.array(np.cumsum(lens2) - 1))
    closed = pc.split_pattern(tail, pattern="</a>", max_splits=1)
    lens3 = pc.list_value_length(closed).to_numpy(zero_copy_only=False).astype(np.int64)
    texts = pc.list_element(closed, 0)
    # blank when the tag never closed ('">' missing) or never terminated
    # ('</a>' missing) — an alias table must not swallow arbitrary tails
    texts = pc.if_else(pa.array((lens2 > 1) & (lens3 > 1)), texts, "")
    lengths = np.maximum(n_list - 1, 0)
    return _list_rebuild(hrefs, lengths), _list_rebuild(texts, lengths)


def url_domain(urls: pa.Array) -> pa.Array:
    """Registrable host of a URL: the segment between ``://`` and the first
    ``/`` (the whole string when either is absent)."""
    u = _as_array(urls)
    after_scheme = pc.split_pattern(u, pattern="://", max_splits=1)
    # last element per row (the whole string when '://' is absent) — gather
    # by offsets, since list_element raises on the length-1 rows
    lengths = pc.list_value_length(after_scheme).to_numpy(zero_copy_only=False).astype(np.int64)
    last_idx = np.cumsum(lengths) - 1
    tail = pc.list_flatten(after_scheme).take(pa.array(last_idx))
    return pc.list_element(pc.split_pattern(tail, pattern="/", max_splits=1), 0)


def extract_text(html: pa.Array) -> pa.Array:
    """Recover the article text from page HTML, byte-identical to the source.

    Vectorized: split on the article markers, take the enclosed segment,
    unescape entities.  Pages without an <article> segment yield "".
    """
    s = _as_array(html).cast(pa.string())
    after_open = pc.list_element(pc.split_pattern(s, pattern=ARTICLE_OPEN, max_splits=1), 1)
    body = pc.list_element(pc.split_pattern(after_open, pattern=ARTICLE_CLOSE, max_splits=1), 0)
    body = pc.if_else(pc.is_valid(body), body, pa.scalar("", pa.string()))
    return unescape_html_text(body)


def tokenize(text: pa.Array) -> pa.ListArray:
    """Split on single spaces (exact, oracle-friendly semantics)."""
    return pc.split_pattern(_as_array(text), pattern=" ")


def token_count(text: pa.Array) -> pa.Array:
    return pc.list_value_length(tokenize(text)).cast(pa.int64())


def stopword_count(text: pa.Array, stopwords=STOPWORDS) -> pa.Array:
    toks = tokenize(text)
    flat = toks.flatten()
    hit = pc.is_in(flat, value_set=pa.array(stopwords)).cast(pa.int64())
    # sum hits back per row using the list offsets
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(hit.to_numpy(zero_copy_only=False))])
    return pa.array(csum[offsets[1:]] - csum[offsets[:-1]], pa.int64())


def predict_lang(text: pa.Array) -> pa.Array:
    """Language ID: argmax of per-language stopword-profile hit counts.

    Deterministic tie-break: languages compared in sorted code order, first
    max wins; rows with zero profile hits get "und".
    """
    toks = tokenize(text)
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((len(langs), len(offsets) - 1), dtype=np.int64)
    for li, lang in enumerate(langs):
        hit = pc.is_in(flat, value_set=pa.array(LANG_PROFILES[lang])).cast(pa.int64())
        csum = np.concatenate([[0], np.cumsum(hit.to_numpy(zero_copy_only=False))])
        scores[li] = csum[offsets[1:]] - csum[offsets[:-1]]
    best = np.argmax(scores, axis=0)
    none = scores.max(axis=0) == 0
    out = np.array(langs, dtype=object)[best]
    out[none] = "und"
    return pa.array(out, pa.string())


def quality_stats(text: pa.Array) -> dict[str, pa.Array]:
    """Quality-scoring signals: char length, token count, stopword ratio,
    mean token length.  Pure Arrow/numpy."""
    text = _as_array(text)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = token_count(text)
    n_stop = stopword_count(text)
    nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = n_stop.to_numpy(zero_copy_only=False) / np.maximum(nt, 1.0)
    mean_tok = (
        (n_chars.to_numpy(zero_copy_only=False) - np.maximum(nt - 1, 0))  # chars minus separators
        / np.maximum(nt, 1.0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_stopwords": n_stop,
        "stopword_ratio": pa.array(ratio, pa.float64()),
        "mean_token_len": pa.array(mean_tok, pa.float64()),
    }


def repetition_stats(text: pa.Array, *, shingle_n: int = 3) -> dict[str, pa.Array]:
    """Duplicate-n-gram repetition signal (a Gopher/RefinedWeb-style quality
    rule): per row, total word-n-gram shingles, distinct shingles, and the
    duplicated fraction in integer milli-units (exact-oracle friendly:
    ``(total - distinct) * 1000 // total``).

    Rows shorter than ``shingle_n`` tokens count as one whole-text shingle
    (total = 1, distinct = 1, dup = 0), mirroring
    ``stages.dedup.shingle_strings``."""
    from ontoea_ray.stages.dedup import shingle_strings

    text = _as_array(text)
    n = len(text)
    counts = pc.list_value_length(tokenize(text)).to_numpy(zero_copy_only=False)
    total = np.maximum(counts.astype(np.int64) - (shingle_n - 1), 1)
    sh = shingle_strings(text, np.arange(n, dtype=np.int64), shingle_n)
    distinct = np.ones(n, np.int64)
    if len(sh):
        grp = sh.groupby("id", sort=False).size()
        distinct[grp.index.to_numpy(np.int64)] = grp.to_numpy(np.int64)
    dup_milli = (total - distinct) * 1000 // total
    return {
        "n_shingles": pa.array(total, pa.int64()),
        "n_distinct_shingles": pa.array(distinct, pa.int64()),
        "dup_ngram_milli": pa.array(dup_milli, pa.int64()),
    }


def postings(text: pa.Array, doc_ids: np.ndarray) -> pa.Table:
    """Inverted-index postings explode: (token, doc_id, pos) rows, pos =
    0-based token position within the document.  Fully vectorized (offsets
    arithmetic, no row loop); the downstream index writer hash-partitions
    by token so a term lookup reads one partition."""
    toks = tokenize(_as_array(text))
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    flat = toks.flatten()
    ids = np.repeat(np.asarray(doc_ids, np.int64), counts)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], counts)
    return pa.table({
        "token": flat,
        "doc_id": pa.array(ids, pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def bigram_counts(text: pa.Array) -> pa.Table:
    """Per-batch partial bigram counts -> (bigram, freq).

    Adjacent pairs via shifted slices of the flattened token array; document
    boundaries are masked with the list offsets (position i pairs with i+1
    only when i+1 is not the start of the next document).  No row loop."""
    toks = tokenize(text)
    flat = toks.flatten().to_pandas()
    if len(flat) < 2:
        return pa.table({"bigram": pa.array([], pa.string()), "freq": pa.array([], pa.int64())})
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    start = np.zeros(len(flat) + 1, np.bool_)
    start[offsets] = True
    valid = ~start[1 : len(flat)]  # pair (i, i+1) stays inside one document
    pairs = (flat.iloc[:-1].reset_index(drop=True) + " " + flat.iloc[1:].reset_index(drop=True))[valid]
    vc = pairs.value_counts()
    return pa.table(
        {"bigram": pa.array(vc.index, pa.string()), "freq": pa.array(vc.to_numpy(), pa.int64())}
    )


def doc_term_frequencies(text: pa.Array, doc_ids: np.ndarray) -> pa.Table:
    """Per-(doc, token) term counts -> (doc_id, token, tf).

    Exact without any shuffle: a document is one input row, so its counts
    are complete inside the batch (explode tokens with the list offsets,
    one grouped value_count)."""
    import pandas as pd

    toks = tokenize(text)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat_docs = np.repeat(doc_ids, np.diff(offsets))
    df = pd.DataFrame({"doc_id": flat_docs, "token": toks.flatten().to_pandas()})
    g = df.groupby(["doc_id", "token"], sort=False).size().reset_index(name="tf")
    return pa.table(
        {
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "token": pa.array(g["token"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy().astype(np.int64), pa.int64()),
        }
    )


# PII patterns shared with the DuckDB oracle (RE2 and Python `re` agree on
# these constructs: \d, \b, bounded repetition).  Replacement ORDER is part
# of the contract — emails first (they contain dots that would otherwise be
# half-eaten by the IP rule), then IPv4, then phone.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+\d[\d-]{7,}\d", "<PHONE>"),
)


def pii_scrub(text: pa.Array) -> pa.Array:
    """Redact emails / IPv4 addresses / international phone numbers with
    typed placeholder tags — the standard pre-training privacy scrub.

    Vectorized: one ``pc.replace_substring_regex`` pass per rule (Arrow's
    RE2, the same engine DuckDB's ``regexp_replace(..., 'g')`` uses, so the
    oracle replays it exactly)."""
    out = _as_array(text)
    for pattern, tag in PII_RULES:
        out = pc.replace_substring_regex(out, pattern=pattern, replacement=tag)
    return out


def fingerprint_md5(text: pa.Array) -> pa.Array:
    """Document fingerprint: md5 hex of the lowercased text.

    SQL-oracle equivalent: ``md5(lower(text))`` in DuckDB.  (hashlib is the
    only loop here; md5 over full strings is C-speed per row.)
    """
    low = pc.utf8_lower(text)
    vals = low.to_pylist()
    return pa.array([hashlib.md5(v.encode("utf-8")).hexdigest() if v is not None else None for v in vals], pa.string())
