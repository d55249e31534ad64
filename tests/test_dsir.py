"""DSIR importance weighting (stages/dsir.py)."""

import pyarrow as pa
import ray.data

from ontoea_ray.stages.dsir import bucket_counts, dsir_weights


def _docs():
    # 'aaa' appears only in target (en) docs, 'zzz' only in non-target ones,
    # 'mid' everywhere
    rows = [
        (0, "aaa aaa mid", "en"),
        (1, "aaa mid", "en"),
        (2, "zzz zzz mid", "fr"),
        (3, "zzz mid", "fr"),
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        )
    )


def test_bucket_counts_one_pass(ray_session):
    rows = bucket_counts(_docs(), n_buckets=64).take_all()
    assert sum(r["n_raw"] for r in rows) == 10  # every token occurrence
    assert sum(r["n_tgt"] for r in rows) == 5   # the two en docs


def test_dsir_weights_order_target_like_docs_first(ray_session):
    out = {r["doc_id"]: r for r in dsir_weights(_docs(), n_buckets=64).take_all()}
    assert set(out) == {0, 1, 2, 3}
    assert all(r["n_tokens"] == len(t.split()) for r, t in zip(
        (out[0], out[1], out[2], out[3]),
        ("aaa aaa mid", "aaa mid", "zzz zzz mid", "zzz mid"),
    ))
    # target-only docs must outrank non-target-only docs on the mean weight
    assert out[0]["dsir_mean"] > out[2]["dsir_mean"]
    assert out[1]["dsir_mean"] > out[3]["dsir_mean"]
    # floor-mean identity
    for r in out.values():
        assert r["dsir_mean"] == r["dsir_sum"] // r["n_tokens"]
