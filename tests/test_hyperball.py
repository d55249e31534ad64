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


def _scalar_harmonic(pairs, rounds, p=4):
    """Independent integer replay of harmonic_milli from exact ball regs."""
    from ontoea_ray.stages.graph import _HLL_E_NUM, _HLL_RHO_CAP

    m = 1 << p
    cap = _HLL_RHO_CAP
    nodes = {n for e in pairs for n in e}
    es = {}
    for r in range(rounds + 1):
        regs = _exact_ball_registers(pairs, r, p)
        for n in nodes:
            slots = {s: v for (nn, s), v in regs.items() if nn == n}
            S = sum(1 << (cap - min(v, cap)) for v in slots.values())
            S += (m - len(slots)) * (1 << cap)
            es.setdefault(n, []).append(_HLL_E_NUM // S)
    return {
        n: sum((e[r] - e[r - 1]) // r for r in range(1, rounds + 1))
        for n, e in es.items()
    }


def test_harmonic_matches_scalar_replay():
    from ontoea_ray.stages.graph import harmonic_milli

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 7), (7, 8), (3, 9), (2, 9)]
    got = {
        r["node"]: r["h_milli"]
        for r in harmonic_milli(_edges(pairs).repartition(3), p=4, rounds=3).take_all()
    }
    assert got == _scalar_harmonic(pairs, 3)
    # a hub (node 3: degree 4) should outrank a leaf (node 8)
    assert got[3] > got[8]


def test_neighbourhood_function_scalar_replay():
    from ontoea_ray.stages.graph import neighbourhood_function
    from ontoea_ray.stages.graph import _HLL_E_NUM, _HLL_RHO_CAP

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 7), (7, 8), (3, 9)]
    rounds, p, cap, m = 3, 4, _HLL_RHO_CAP, 16
    nodes = {n for e in pairs for n in e}
    want = []
    for r in range(rounds + 1):
        regs = _exact_ball_registers(pairs, r, p)
        tot = 0
        for n in nodes:
            slots = {s: v for (nn, s), v in regs.items() if nn == n}
            S = sum(1 << (cap - min(v, cap)) for v in slots.values())
            S += (m - len(slots)) * (1 << cap)
            tot += _HLL_E_NUM // S
        want.append(tot)
    got = sorted(
        (r["round"], r["n_milli"], r["reaches_pct"])
        for r in neighbourhood_function(
            _edges(pairs).repartition(3), p=4, rounds=rounds, pct=90
        ).take_all()
    )
    assert [n for _, n, _ in got] == want
    assert got[-1][2] == 1                       # final round always reaches
    for r, n, f in got:
        assert f == (1 if 100 * n >= 90 * want[-1] else 0)
    # mass is nondecreasing with radius
    assert all(got[i][1] <= got[i + 1][1] for i in range(rounds))
