"""Dedup-family semantics: exact dedup, LSH precision/recall vs exact
Jaccard, SimHash Hamming behavior."""

import numpy as np
import pytest
import ray.data

from ontoea_ray.stages.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_near_duplicates,
    simhash64,
)


@pytest.fixture(scope="module")
def corpus():
    """Synthetic docs with exact dups, near dups and unrelated content."""
    rng = np.random.default_rng(3)
    vocab = [f"word{i}" for i in range(300)]
    docs = []
    base = " ".join(rng.choice(vocab, size=60))
    docs.append({"doc_id": 0, "text": base})
    docs.append({"doc_id": 1, "text": base})                       # exact dup
    toks = base.split(" ")
    toks[5] = "changed"
    docs.append({"doc_id": 2, "text": " ".join(toks)})             # near dup
    for i in range(3, 40):
        docs.append({"doc_id": i, "text": " ".join(rng.choice(vocab, size=60))})
    return docs


def test_exact_dedup_min_id(corpus):
    ds = ray.data.from_items(corpus)
    out = sorted(r["doc_id"] for r in exact_dedup(ds).take_all())
    assert 0 in out and 1 not in out        # dup collapses to min id
    assert len(out) == len(corpus) - 1


def test_lsh_precision_and_high_sim_recall(corpus):
    ds = ray.data.from_items(corpus)
    exact = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(ds, threshold=0.8).take_all()}
    lsh = {(r["id_a"], r["id_b"]) for r in lsh_near_duplicates(ds, threshold=0.8).take_all()}
    # precision 1.0: every verified LSH pair satisfies the exact predicate
    assert lsh <= exact
    # the exact-dup pair (jaccard 1.0) is guaranteed to collide in every band
    assert (0, 1) in lsh
    # near-dup (1 token changed in 60 -> very high shingle jaccard)
    assert (0, 2) in exact
    assert (0, 2) in lsh  # j ~ 0.9 -> miss probability ~(1-.9^4)^16 ~ 3e-8


def test_lsh_verify_is_distributed(corpus, monkeypatch):
    """The near-dup verify must never collect candidate pairs to the driver:
    build the verified-pairs plan on a replicated input with Dataset.take_all
    forbidden, then execute and check the replicated structure survives."""
    shifted = [{"doc_id": d["doc_id"] + 1000, "text": d["text"]} for d in corpus]
    ds = ray.data.from_items(corpus + shifted)

    calls = []
    orig = ray.data.Dataset.take_all

    def guarded(self, *a, **kw):
        calls.append(self)
        raise AssertionError("take_all called inside lsh_near_duplicates")

    monkeypatch.setattr(ray.data.Dataset, "take_all", guarded)
    try:
        out_ds = lsh_near_duplicates(ds, threshold=0.8)
    finally:
        monkeypatch.setattr(ray.data.Dataset, "take_all", orig)
    assert not calls
    lsh = {(r["id_a"], r["id_b"]) for r in out_ds.take_all()}
    # each replica carries its own exact-dup and near-dup pair
    for base in (0, 1000):
        assert (base, base + 1) in lsh
        assert (base, base + 2) in lsh
    # cross-replica exact dups too (same text, different id range)
    assert (0, 1000) in lsh


def test_simhash_golden_values():
    """Exact regression pin for the SimHash kernel (the driver's check for
    q_simhash is rows-only, so the bit-exact contract lives here)."""
    import pyarrow as pa

    from ontoea_ray.stages.dedup import simhash64_kernel

    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                ["the quick brown fox", "the quick brown fox", "completely different words here"]
            ),
        }
    )
    assert simhash64_kernel(batch)["simhash"].to_pylist() == [
        1140660199213328064,
        1140660199213328064,
        3021932957792431364,
    ]


def test_simhash_hamming_tracks_similarity(corpus):
    ds = ray.data.from_items(corpus)
    sh = {r["doc_id"]: r["simhash"] for r in simhash64(ds).take_all()}
    assert sh[0] == sh[1]                   # identical docs, identical hash
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[10]).count("1")
    assert ham_near < ham_far               # near dup closer in Hamming space


def test_simhash_banding_is_lossless_vs_brute_force(sf_dir):
    """Pigeonhole blocking must find EVERY pair at Hamming <= 3 (and the
    popcount verify must kill everything above): compare against the
    all-pairs popcount over the engine's own signatures."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.dedup import popcount64, simhash64, simhash_neardup_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sig_tbl = pa.Table.from_pylist(simhash64(docs).take_all())
    ids = np.asarray(sig_tbl["doc_id"].to_pylist(), np.int64)
    sh = np.asarray(sig_tbl["simhash"].to_pylist(), np.int64)
    order = np.argsort(ids)
    ids, sh = ids[order], sh[order]
    ii, jj = np.triu_indices(len(ids), k=1)
    d = popcount64(np.bitwise_xor(sh[ii].view(np.uint64), sh[jj].view(np.uint64)))
    ok = d <= 3
    expect = {(int(a), int(b), int(h)) for a, b, h in zip(ids[ii][ok], ids[jj][ok], d[ok])}

    got_tbl = pa.Table.from_pylist(simhash_neardup_pairs(docs, max_hamming=3).take_all())
    got = {
        (int(a), int(b), int(h))
        for a, b, h in zip(
            got_tbl["id_a"].to_pylist(), got_tbl["id_b"].to_pylist(), got_tbl["hamming"].to_pylist()
        )
    }
    assert got == expect and len(got) > 0


def test_fast_hash_backend_equivalent_dedup_results(corpus):
    """The vectorized FNV/splitmix token-hash backend must reproduce the
    md5 backend's VERIFIED outputs (values differ, the dedup semantics must
    not): identical LSH near-dup pair sets on the fixture, and simhash of
    identical docs identical / near-dup docs within the Manku radius."""
    from ontoea_ray.stages.dedup import _fnv_hash_strings, _token_hashes

    ds = ray.data.from_items(corpus)
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_duplicates(ds, threshold=0.8).take_all()
    }
    fast_pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_near_duplicates(ds, threshold=0.8, hash_backend="fast").take_all()
    }
    # verify is exact-string Jaccard in both cases; banding recall at
    # j>=0.9 is ~1 under any uniform hash, so the verified sets coincide
    assert md5_pairs == fast_pairs
    assert (0, 1) in fast_pairs and (0, 2) in fast_pairs

    sim = {r["doc_id"]: r["simhash"] for r in simhash64(ds, hash_backend="fast").take_all()}
    assert sim[0] == sim[1]  # identical docs, identical fingerprint
    assert bin(sim[0] ^ sim[2]).count("1") <= 12  # near dup stays near

    # backend basics: deterministic, distinct on distinct strings, and the
    # fast path agrees with itself across chunking layouts
    import pyarrow as pa

    toks = pa.array([f"tok{i}" for i in range(1000)] * 2)
    h1 = _token_hashes(toks, backend="fast")
    assert (h1[:1000] == h1[1000:]).all()
    assert len(set(h1[:1000].tolist())) == 1000
    direct = _fnv_hash_strings(pa.array(["a", "bb", "ccc"]))
    assert len(set(direct.tolist())) == 3


def test_dedup_tiles_first_occurrence_semantics(ray_session):
    """Tile-level exact-substring dedup: a duplicated 2-token tile survives
    only at its lexicographically-first (doc, tile) position — including
    within-doc repeats — and short docs are one (short) tile."""
    import ray.data

    from ontoea_ray.stages.dedup import dedup_tiles

    docs = ray.data.from_items(
        [
            {"doc_id": 1, "text": "a b c d a b"},   # tiles: 'a b','c d','a b'
            {"doc_id": 2, "text": "c d x"},          # tiles: 'c d','x'
            {"doc_id": 3, "text": "z"},              # one short tile
        ]
    )
    out = {r["doc_id"]: r for r in dedup_tiles(docs, n=2).take_all()}
    assert out[1]["clean_text"] == "a b c d"         # second 'a b' dropped
    assert out[1]["n_tiles"] == 3 and out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "x"               # 'c d' first seen in doc 1
    assert out[2]["n_tiles"] == 2 and out[2]["n_dropped"] == 1
    assert out[3]["clean_text"] == "z" and out[3]["n_dropped"] == 0


def test_boilerplate_tiles_semantics(ray_session):
    """Per-group template tiles: within-doc repeats count ONCE toward the
    doc frequency, groups are isolated, min_docs filters, and share_milli
    is the integer-milli fraction of the GROUP's doc total."""
    import ray.data

    from ontoea_ray.stages.dedup import boilerplate_tiles

    docs = ray.data.from_items(
        [
            # 'a b' in docs 1 and 2 of src A (doc 1 repeats it -> counts once)
            {"doc_id": 1, "text": "a b a b", "source": "A"},
            {"doc_id": 2, "text": "a b x y", "source": "A"},
            {"doc_id": 3, "text": "q r s t", "source": "A"},
            # same tile in src B only once -> no cross-group pooling
            {"doc_id": 4, "text": "a b z z", "source": "B"},
            {"doc_id": 5, "text": "m n o p", "source": "B"},
        ]
    )
    out = boilerplate_tiles(docs, n=2, min_docs=2).take_all()
    assert len(out) == 1
    r = out[0]
    assert (r["source"], r["tile"], r["n_docs"]) == ("A", "a b", 2)
    assert r["share_milli"] == 1000 * 2 // 3


def test_containment_catches_doc_inside_doc(ray_session):
    """A short doc fully contained in a long one: containment fires where
    Jaccard (union-normalized) stays below threshold."""
    import ray.data

    from ontoea_ray.stages.dedup import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"zzz{i}" for i in range(10))
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": short},
            {"doc_id": 2, "text": long},
            {"doc_id": 3, "text": other},
        ]
    )
    cont = {
        (r["id_a"], r["id_b"]): r["cont_milli"]
        for r in containment_pairs(ds, threshold_milli=900).take_all()
    }
    assert cont == {(1, 2): 1000}  # short's shingles all inside long
    jac = {(r["id_a"], r["id_b"]) for r in jaccard_pairs(ds, threshold=0.5).take_all()}
    assert (1, 2) not in jac  # symmetric Jaccard misses it
