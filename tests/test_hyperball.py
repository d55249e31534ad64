"""HyperBall ball sketches (`stages/graph.hyperball_registers`)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.graph import hyperball_registers
from ontoea_ray.stages.sampling import splitmix64
from ontoea_ray.stages.sketch import hll_rho


def _edges(pairs):
    a, b = zip(*pairs)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    )


def _exact_ball_registers(pairs, rounds, p):
    """Registers of the EXACT radius-r ball per node (reference semantics)."""
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nbits = 64 - p
    out = {}
    for n in adj:
        ball = {n}
        for _ in range(rounds):
            ball |= {w for v in ball for w in adj[v]}
        ids = np.array(sorted(ball), np.uint64)
        h = splitmix64(ids)
        slot = (h >> np.uint64(nbits)).astype(np.int64)
        rho = hll_rho(h & np.uint64((1 << nbits) - 1), nbits)
        for s in np.unique(slot):
            out[(n, int(s))] = int(rho[slot == s].max())
    return out


def test_registers_equal_exact_ball_hll():
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 7), (7, 8), (3, 9)]
    for rounds in (1, 2, 3):
        got = {
            (r["node"], r["slot"]): r["rho"]
            for r in hyperball_registers(_edges(pairs), p=4, rounds=rounds).take_all()
        }
        assert got == _exact_ball_registers(pairs, rounds, 4)


def test_rounds_zero_is_singleton_sketch():
    pairs = [(1, 2), (3, 4)]
    got = {
        (r["node"], r["slot"]): r["rho"]
        for r in hyperball_registers(_edges(pairs), p=4, rounds=0).take_all()
    }
    assert got == _exact_ball_registers(pairs, 0, 4)
    assert len(got) == 4  # one slot per node at radius 0


def test_partitioning_invariance():
    pairs = [(i, i + 1) for i in range(1, 50)]
    one = sorted(
        map(tuple, hyperball_registers(_edges(pairs), p=4, rounds=2).to_pandas().values.tolist())
    )
    many = sorted(
        map(
            tuple,
            hyperball_registers(_edges(pairs).repartition(9), p=4, rounds=2)
            .to_pandas().values.tolist(),
        )
    )
    assert one == many
