"""WARC-lite: a crawl-archive record format source/sink.

Web corpora arrive as WARC — concatenated per-response records, each a
header block plus a body, many records per archive file (ISO 28500).  The
sandbox ships no warcio, so this module implements the same SHAPE as a
self-contained deterministic format the tests can round-trip:

    WARC-LITE/1.0\\n
    url: <url>\\n
    ts: <int64 microseconds since epoch>\\n
    lang: <lang>\\n
    length: <byte length of body>\\n
    \\n
    <body bytes>\\n

Records concatenate back-to-back inside a shard file; shard files are the
parallelism unit exactly like real WARC (a reader task owns whole files,
records never span shards).  Bodies must not contain the magic line — the
writer asserts this (real WARC solves it with Content-Length framing; the
reader here still validates each parsed body against its ``length``
header, so corruption fails loudly rather than silently misparsing).

At 100 TB: ``read_warclite`` streams one task per shard file via
``read_binary_files``; parsing is a vectorized split inside the batch
(records -> Arrow string ops, no per-record Python loops), and the body
bytes never ride past the parsing stage unless the caller keeps them.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_MAGIC = "WARC-LITE/1.0\n"


def _chunks(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def write_warclite(pages: ray.data.Dataset, out_dir: str) -> int:
    """Write a pages Dataset (url, warc_ts, text, lang) as WARC-lite shards
    under ``out_dir`` — one shard per input block, named by the md5 of the
    block's minimum url (deterministic for a deterministic input split;
    re-running overwrites the same shards, so a partial run is resumable
    by re-run).  Record assembly is one vectorized string join per block.
    Returns the number of records written."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        text = _chunks(batch["text"]).cast(pa.string())
        n_magic = pc.sum(pc.count_substring(text, pattern=_MAGIC)).as_py() or 0
        assert n_magic == 0, "body contains the record magic"
        # the reader recovers the body with an rtrim of the writer's one
        # trailing '\n' — a body that itself ends in '\n' would fail its
        # length check on read, so refuse it at write time
        n_trail = pc.sum(pc.ends_with(text, pattern="\n").cast(pa.int64())).as_py() or 0
        assert n_trail == 0, "body ends with a newline (unsupported by warc-lite framing)"
        ts = _chunks(batch["warc_ts"]).cast(pa.int64()).cast(pa.string())
        length = pc.binary_length(text).cast(pa.int64()).cast(pa.string())
        recs = pc.binary_join_element_wise(
            _MAGIC + "url: ",
            _chunks(batch["url"]),
            "\nts: ",
            ts,
            "\nlang: ",
            _chunks(batch["lang"]),
            "\nlength: ",
            length,
            "\n\n",
            text,
            "\n",
            "",
        )
        if len(recs):
            blob = "".join(recs.to_pylist()).encode()
            name = hashlib.md5(pc.min(_chunks(batch["url"])).as_py().encode()).hexdigest()[:16]
            with open(os.path.join(out_dir, f"shard-{name}.warc"), "wb") as f:
                f.write(blob)
        return pa.table({"n": pa.array([len(recs)], pa.int64())})

    parts = pages.map_batches(write_block, batch_format="pyarrow", batch_size=None)
    return int(sum(r["n"] for r in parts.take_all()))


def read_warclite(path) -> ray.data.Dataset:
    """WARC-lite shards -> Dataset(url, warc_ts, lang, text) — one reader
    task per shard file, vectorized record parse inside the batch."""
    files = ray.data.read_binary_files(path, file_extensions=["warc"])

    empty = pa.table(
        {
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us")),
            "lang": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
        }
    )

    def parse(batch: pa.Table) -> pa.Table:
        outs = []
        for blob in _chunks(batch["bytes"]).to_pylist():
            s = pa.array(blob.decode().split(_MAGIC)[1:], pa.string())
            if len(s) == 0:
                continue
            # header | body split at the first blank line (vectorized)
            two = pc.split_pattern(s, pattern="\n\n", max_splits=1)
            head = pc.list_element(two, 0)
            body = pc.list_element(two, 1)
            hl = pc.split_pattern(head, pattern="\n")

            def field(i: int, prefix: str) -> pa.Array:
                line = pc.list_element(hl, i)
                ok = pc.all(pc.starts_with(line, pattern=prefix)).as_py()
                assert ok, f"malformed warc-lite header line: expected {prefix!r}"
                return pc.utf8_slice_codeunits(line, start=len(prefix))

            url = field(0, "url: ")
            ts = field(1, "ts: ").cast(pa.int64())
            lang = field(2, "lang: ")
            length = field(3, "length: ").cast(pa.int64())
            # the writer appends exactly one '\n' after each body
            text = pc.utf8_rtrim(body, characters="\n")
            got = pc.binary_length(text).cast(pa.int64())
            if not pc.all(pc.equal(got, length)).as_py():
                raise ValueError("warc-lite length mismatch: corrupt shard")
            outs.append(
                pa.table(
                    {
                        "url": url,
                        "warc_ts": ts.cast(pa.timestamp("us")),
                        "lang": lang,
                        "text": text,
                    }
                )
            )
        return pa.concat_tables(outs) if outs else empty

    return files.map_batches(parse, batch_format="pyarrow")
