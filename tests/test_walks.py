"""Random-walk corpus generation (stages/walks.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.sampling import splitmix64
from ontoea_ray.stages.walks import WALK_SALT, indexed_adjacency, random_walks

_EDGES = [(1, 2), (1, 3), (2, 3), (3, 4)]


def _edges_ds(repartition: int | None = None) -> ray.data.Dataset:
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in _EDGES], pa.int64()),
                "id_b": pa.array([b for _, b in _EDGES], pa.int64()),
            }
        )
    )
    return ds.repartition(repartition) if repartition else ds


def _expected_walks(steps: int) -> dict:
    und: dict[int, set] = {}
    for a, b in _EDGES:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    got = {}
    for w in und:
        cur = w
        got[(w, 0)] = w
        for s in range(1, steps + 1):
            nbrs = sorted(und[cur])
            h = int(splitmix64(np.array([w * WALK_SALT + s], np.uint64))[0])
            cur = nbrs[h % len(nbrs)]
            got[(w, s)] = cur
    return got


def test_indexed_adjacency(ray_session):
    rows = indexed_adjacency(_edges_ds()).take_all()
    got = sorted((r["u"], r["idx"], r["v"], r["deg"]) for r in rows)
    assert got == [
        (1, 0, 2, 2), (1, 1, 3, 2),
        (2, 0, 1, 2), (2, 1, 3, 2),
        (3, 0, 1, 3), (3, 1, 2, 3), (3, 2, 4, 3),
        (4, 0, 3, 1),
    ]


def test_random_walks_match_scalar_replay(ray_session):
    out = random_walks(_edges_ds(), steps=2).take_all()
    got = {(r["walk_id"], r["step"]): r["node"] for r in out}
    assert len(out) == len(got)  # one row per (walk, step)
    assert got == _expected_walks(2)


def test_random_walks_partitioning_invariant(ray_session):
    base = {(r["walk_id"], r["step"], r["node"]) for r in random_walks(_edges_ds(), steps=2).take_all()}
    parted = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(_edges_ds(repartition=5), steps=2).take_all()
    }
    assert base == parted


def test_random_walks_budget_plans_equal(ray_session, monkeypatch):
    bcast = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(_edges_ds(), steps=2).take_all()
    }
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        (r["walk_id"], r["step"], r["node"])
        for r in random_walks(_edges_ds(), steps=2).take_all()
    }
    assert bcast == dist == set(
        (w, s, n) for (w, s), n in _expected_walks(2).items()
    )
