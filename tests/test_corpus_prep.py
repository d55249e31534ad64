"""corpus_prep composite semantics (value parity vs the chained DuckDB
oracle is covered by the oracle gate; these pin the stage interactions)."""

import pyarrow as pa
import ray.data

from ontoea_ray.pipelines.corpus_prep import corpus_prep, quality_keep_mask

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_survivors_pass_quality_and_are_unique_texts():
    out = {r["doc_id"]: r["pack_id"] for r in corpus_prep(_docs()).take_all()}
    docs = {r["doc_id"]: r["text"] for r in _docs().take_all()}
    # every survivor passes the quality rules
    surv_texts = [docs[d] for d in out]
    mask = quality_keep_mask(pa.array(surv_texts, pa.string()))
    assert mask.all()
    # no two survivors share an exact text
    assert len(set(surv_texts)) == len(surv_texts)
    # something was actually dropped (filter + dedup + near-dup all bite)
    assert 0 < len(out) < len(docs)


def test_pack_ids_monotone_in_doc_id():
    rows = sorted(corpus_prep(_docs()).take_all(), key=lambda r: r["doc_id"])
    ids = [r["pack_id"] for r in rows]
    assert ids[0] == 0 and all(b >= a for a, b in zip(ids, ids[1:]))


def test_near_duplicate_injection_is_removed():
    # clone a surviving doc with one token changed -> near-dup pair; the
    # larger id (the clone) must be dropped
    base = _docs().take_all()
    keep0 = {r["doc_id"] for r in corpus_prep(_docs()).take_all()}
    victim = next(r for r in base if r["doc_id"] in keep0)
    toks = victim["text"].split(" ")
    toks[0] = toks[0] + "x"
    clone = {"doc_id": 10_000_000, "text": " ".join(toks)}
    ds = ray.data.from_items(base + [clone])
    keep1 = {r["doc_id"] for r in corpus_prep(ds).take_all()}
    assert victim["doc_id"] in keep1 and clone["doc_id"] not in keep1
