"""BM25 ranked retrieval (stages/bm25.py)."""

import pyarrow as pa
import ray.data

from ontoea_ray.stages.bm25 import BM25_SCALE, B_MILLI, K1_MILLI, bm25_topk
from ontoea_ray.stages.inverted_index import build_inverted_index

_DOCS = [
    (0, "cat cat cat dog"),
    (1, "cat dog bird fish bird fish bird fish"),
    (2, "dog dog dog dog"),
    (3, "bird"),
    (4, "fish cat"),
]


def _docs_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in _DOCS], pa.int64()),
                "text": pa.array([t for _, t in _DOCS], pa.string()),
            }
        )
    )


def _scalar_bm25(terms, k):
    texts = {d: t.split() for d, t in _DOCS}
    n = len(texts)
    total = sum(len(t) for t in texts.values())
    scores = {}
    for term in terms:
        df = sum(1 for t in texts.values() if term in t)
        if df == 0:
            continue
        idf = (BM25_SCALE * (n - df + 1)) // (df + 1)
        for d, toks in texts.items():
            tf = toks.count(term)
            if not tf:
                continue
            norm = 1000 - B_MILLI + (B_MILLI * len(toks) * n) // total
            denom = 1000 * tf + (K1_MILLI * norm) // 1000
            scores[d] = scores.get(d, 0) + (idf * tf * (K1_MILLI + 1000)) // denom
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(ranked)]


def test_bm25_matches_scalar_replay(ray_session, tmp_path):
    idx = str(tmp_path / "inv")
    build_inverted_index(_docs_ds(), idx, n_buckets=8)
    out = bm25_topk(idx, _docs_ds(), ["cat", "bird"], k=3)
    got = list(zip(out["doc_id"].to_pylist(), out["score"].to_pylist(), out["rnk"].to_pylist()))
    assert got == _scalar_bm25(["cat", "bird"], 3)


def test_bm25_unknown_term_empty(ray_session, tmp_path):
    idx = str(tmp_path / "inv")
    build_inverted_index(_docs_ds(), idx, n_buckets=8)
    out = bm25_topk(idx, _docs_ds(), ["zzzz"], k=3)
    assert len(out) == 0
    assert out.column_names == ["doc_id", "score", "rnk"]
