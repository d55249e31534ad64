"""Inverted-index build/lookup: parity with the postings explode, and
read pruning (a term lookup touches one bucket partition)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.inverted_index import build_inverted_index, lookup_token

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_lookup_matches_explode_and_prunes_reads(tmp_path):
    idx = str(tmp_path / "inv")
    build_inverted_index(_docs(), idx, n_buckets=64)

    # pick a token that actually occurs
    first = _docs().take(1)[0]
    token = first["text"].split(" ")[0]

    out, stats = lookup_token(idx, token, return_stats=True)
    assert stats["scanned_buckets"] == 1 and stats["total_buckets"] > 8

    # oracle: recompute postings for that token from the raw corpus
    from ontoea_ray.functions.text import postings

    expect = []
    for r in _docs().take_all():
        for i, t in enumerate(r["text"].split(" ")):
            if t == token:
                expect.append((r["doc_id"], i))
    got = list(zip(out["doc_id"].to_pylist(), out["pos"].to_pylist()))
    assert got == sorted(expect)
    assert len(got) > 0


def test_missing_token_returns_empty(tmp_path):
    idx = str(tmp_path / "inv2")
    build_inverted_index(_docs(), idx, n_buckets=16)
    out = lookup_token(idx, "zz-no-such-token-zz")
    assert len(out) == 0
