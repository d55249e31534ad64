"""The four former driver-side materializations now have distributed scale
paths gated on the broadcast byte budget (ONTOEA_BROADCAST_BUDGET_BYTES).
These tests FORCE each scale path (budget=1 byte) on a small fixture and
pin it bit-equal (or exactly-subset, where the scale path is approximate
by design) against the broadcast path — so both plans stay correct and
the budget switch provably exists."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture()
def tiny_budget(monkeypatch):
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")


def _df(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        res = pa.Table.from_pylist(res.take_all())
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    df = res[sorted(res.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_rank_score_join_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_rank_score"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_rank_score"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_doc_popularity_join_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_doc_popularity"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_doc_popularity"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_bfs_depth_bloom_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    """Forcing the frontier over budget routes every round through the
    Bloom pre-prune + exact keyed semi-join; depths must be identical."""
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_bfs_depth"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_bfs_depth"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_cosine_neardup_over_budget_flips_to_lsh(tiny_budget):
    """n_planes=0 above the budget auto-flips to the LSH plan: result must
    be a subset of the exact pairs (precision stays exact) and non-trivial
    on a clustered fixture (duplicated vectors always share every bucket)."""
    from ontoea_ray.stages.ann import cosine_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16))
    vecs = np.concatenate([base, base + rng.standard_normal((40, 16)) * 1e-3])
    ids = np.arange(len(vecs), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float64()), 16
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)

    flipped = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(ds, threshold=0.95).take_all()
    }
    import os

    os.environ.pop("ONTOEA_BROADCAST_BUDGET_BYTES", None)
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(ds, threshold=0.95).take_all()
    }
    # exact path must find every (i, i+40) twin; the flipped LSH path keeps
    # precision (subset) and, with identical-direction twins, full recall
    # on the twin pairs
    twins = {(int(i), int(i) + 40) for i in range(40)}
    assert twins <= exact
    assert flipped <= exact
    assert twins <= flipped


def test_exact_cosine_pairs_assembled_off_driver(ray_session):
    """The exact path's broadcast matrix ref comes from a Ray task over the
    dataset's blocks; spot-check correctness on a tiny known case."""
    from ontoea_ray.stages.ann import cosine_neardup_pairs

    v = np.array(
        [[1.0, 0.0], [1.0, 1e-4], [0.0, 1.0], [-1.0, 0.0]], np.float64
    )
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(4, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(v.reshape(-1), pa.float64()), 2
            ),
        }
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(
            ray.data.from_arrow(tbl), threshold=0.95
        ).take_all()
    }
    assert got == {(0, 1)}


def test_source_dup_rate_join_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    """Budget=1 forces the doc->source labeling through the two
    distributed hash joins; the source-pair matrix must match the
    broadcast-gather plan exactly."""
    from ontoea_ray.queries import QUERIES

    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES", raising=False)
    want = _df(QUERIES["q_source_dup_rate"](sf_dir))
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    got = _df(QUERIES["q_source_dup_rate"](sf_dir))
    pd.testing.assert_frame_equal(want, got)


def test_lm_score_join_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    """Budget=1 forces the bigram-exploded hash-join scoring plan; the
    per-doc predictability sums must equal the broadcast searchsorted
    plan bit-for-bit."""
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_lm_score"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_lm_score"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_semi_join_bloom_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_semi_join"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_semi_join"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_anti_join_left_join_path_equals_broadcast(sf_dir, tiny_budget, monkeypatch):
    from ontoea_ray.queries import QUERIES

    forced = _df(QUERIES["q_anti_join"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    base = _df(QUERIES["q_anti_join"](sf_dir))
    pd.testing.assert_frame_equal(forced, base)


def test_prefix_jaccard_budget_paths_equal(sf_dir, tiny_budget, monkeypatch):
    """budget=1 forces the df hash-join + exchange-verify plan; it must be
    pair-identical to the broadcast/batch-local plan (and the hash-verify
    injectivity check must hold on both)."""
    from ontoea_ray.queries import QUERIES

    slow = (
        QUERIES["q_prefix_jaccard"](sf_dir)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    fast = (
        QUERIES["q_prefix_jaccard"](sf_dir)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_katz_budget_paths_equal(sf_dir, tiny_budget, monkeypatch):
    """budget=1 forces katz_rounds' per-round join/sum exchange plan; it
    must be bit-equal to the single-task scatter-add plan."""
    from ontoea_ray.queries import QUERIES

    slow = _df(QUERIES["q_katz"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    fast = _df(QUERIES["q_katz"](sf_dir))
    pd.testing.assert_frame_equal(fast, slow)


def test_matching_budget_paths_equal(sf_dir, tiny_budget, monkeypatch):
    """budget=1 forces matching_rounds' exchange plan (directed argmin
    co-location + proposal self-join + exact removals); it must be
    pair-identical to the single-task plan."""
    from ontoea_ray.queries import QUERIES

    slow = _df(QUERIES["q_matching"](sf_dir))
    monkeypatch.delenv("ONTOEA_BROADCAST_BUDGET_BYTES")
    fast = _df(QUERIES["q_matching"](sf_dir))
    pd.testing.assert_frame_equal(fast, slow)
