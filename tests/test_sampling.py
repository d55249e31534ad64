"""Sampling / splitting / packing semantics (the oracle gate in
test_queries_oracle covers value parity; these pin the invariants)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.sampling import (
    hash_sample,
    hash_split,
    pack_sequences,
    splitmix64,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_splitmix64_reference_vector():
    # splitmix64(0..2) with the canonical gamma/mixer constants
    out = splitmix64(np.arange(3, dtype=np.uint64))
    ref = []
    for x in range(3):
        z = (x + 0x9E3779B97F4A7C15) % (1 << 64)
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
        ref.append(z ^ (z >> 31))
    assert out.tolist() == ref


def test_hash_sample_deterministic_and_join_stable():
    a = sorted(r["doc_id"] for r in hash_sample(_docs(), key_col="doc_id", rate_pct=10).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(_docs(), key_col="doc_id", rate_pct=10).take_all())
    assert a == b and len(a) > 0
    # rate_pct=20 is a superset of rate_pct=10 (hash ranges nest)
    c = set(r["doc_id"] for r in hash_sample(_docs(), key_col="doc_id", rate_pct=20).take_all())
    assert set(a) <= c


def test_hash_split_partitions_everything():
    rows = hash_split(_docs(), key_col="doc_id").take_all()
    n = _docs().count()
    assert len(rows) == n
    from collections import Counter

    counts = Counter(r["split"] for r in rows)
    assert set(counts) <= {"train", "valid", "test"}
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]


def test_pack_sequences_budget_invariants():
    budget = 512
    out = pack_sequences(_docs(), key_col="doc_id", budget=budget).take_all()
    rows = sorted(out, key=lambda r: r["doc_id"])
    toks = [len(r["text"].split(" ")) for r in rows]
    # replay the exclusive-prefix rule serially
    excl = np.concatenate([[0], np.cumsum(toks)[:-1]])
    assert [r["pack_id"] for r in rows] == (excl // budget).tolist()
    # pack ids start at 0 and are non-decreasing in key order
    ids = [r["pack_id"] for r in rows]
    assert ids[0] == 0 and all(b >= a for a, b in zip(ids, ids[1:]))


def test_chunk_token_windows_overlap(ray_session):
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.sampling import chunk_token_windows

    text = " ".join(f"t{i}" for i in range(10))
    docs = ray.data.from_arrow(
        pa.table({"doc_id": [1, 2], "text": [text, "solo"]})
    )
    rows = sorted(
        chunk_token_windows(docs, window=4, stride=3).take_all(),
        key=lambda r: (r["doc_id"], r["chunk_id"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["n_tokens"], r["chunk"]))
    assert by_doc[1] == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
        (3, 1, "t9"),
    ]
    assert by_doc[2] == [(0, 1, "solo")]


def test_rendezvous_assign_hrw_stability(ray_session):
    """HRW property: growing 8 -> 9 shards moves ONLY keys won by the new
    shard (every mover lands on shard 8), and assignment is balanced-ish."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.sampling import rendezvous_assign

    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(2000, dtype=np.int64))})
    )
    a = rendezvous_assign(ds, key_col="k", n_shards=8)
    b = rendezvous_assign(a, key_col="k", n_shards=9, out_col="shard9")
    rows = b.take_all()
    moved = [r for r in rows if r["shard"] != r["shard9"]]
    assert all(r["shard9"] == 8 for r in moved)          # only the new shard wins
    frac = len(moved) / len(rows)
    assert 0.05 < frac < 0.18                             # ~1/9 of keys move
    counts = np.bincount([r["shard"] for r in rows], minlength=8)
    assert counts.min() > 0.5 * counts.mean()             # no starved shard
