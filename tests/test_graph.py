"""Connected components (stages/graph.py): hand-graph fixpoints."""

import pyarrow as pa
import ray.data

from ontoea_ray.stages.graph import connected_components


def _cc(edge_list):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edge_list], pa.int64()),
                "id_b": pa.array([b for _, b in edge_list], pa.int64()),
            }
        )
    )
    rows = connected_components(ds).take_all()
    return {r["node"]: r["component"] for r in rows}


def test_cc_chain_clique_and_separate_pairs(ray_session):
    # chain 1-2-3-4-5 (diameter forces multiple propagation rounds),
    # clique {10,11,12}, pair {20,21}
    edges = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    got = _cc(edges)
    assert {n: c for n, c in got.items() if n <= 5} == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}
    assert {n: c for n, c in got.items() if 10 <= n <= 12} == {10: 10, 11: 10, 12: 10}
    assert {n: c for n, c in got.items() if n >= 20} == {20: 20, 21: 20}


def test_cc_long_chain_converges(ray_session):
    # a 30-node chain: min label must travel the full diameter
    edges = [(i, i + 1) for i in range(100, 130)]
    got = _cc(edges)
    assert set(got.values()) == {100}
    assert len(got) == 31


def test_merge_entities_transitive(ray_session):
    from ontoea_ray.stages.graph import merge_entities

    triples = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(["e:a", "e:b", "e:c", "e:d"], pa.string()),
                "pred": pa.array(["p", "p", "p", "q"], pa.string()),
                "obj": pa.array(["e:x", "e:x", "e:x", "e:a"], pa.string()),
                "first_url": pa.array(["u3", "u1", "u2", "u9"], pa.string()),
                "n_mentions": pa.array([1, 2, 4, 8], pa.int64()),
            }
        )
    )
    # transitive: a=b, b=c  ->  {a,b,c} merge to "e:a"; d and x untouched
    sameas = ray.data.from_arrow(
        pa.table(
            {
                "a": pa.array(["e:a", "e:b"], pa.string()),
                "b": pa.array(["e:b", "e:c"], pa.string()),
            }
        )
    )
    rows = merge_entities(triples, sameas, src="a", dst="b").take_all()
    got = {(r["subj"], r["pred"], r["obj"]): (r["n_mentions"], r["first_url"]) for r in rows}
    assert got == {
        ("e:a", "p", "e:x"): (7, "u1"),  # a+b+c collapsed, evidence summed, min url
        ("e:d", "q", "e:a"): (8, "u9"),  # obj rewritten too? e:a is already the rep
    }


def test_merge_entities_empty_sameas_is_identity(ray_session):
    from ontoea_ray.stages.graph import merge_entities

    triples = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(["e:a", "e:a"], pa.string()),
                "pred": pa.array(["p", "p"], pa.string()),
                "obj": pa.array(["e:x", "e:x"], pa.string()),
                "first_url": pa.array(["u2", "u1"], pa.string()),
                "n_mentions": pa.array([1, 2], pa.int64()),
            }
        )
    )
    sameas = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
    )
    rows = merge_entities(triples, sameas, src="a", dst="b").take_all()
    assert rows == [
        {"subj": "e:a", "pred": "p", "obj": "e:x", "n_mentions": 3, "first_url": "u1"}
    ]


def test_cc_partitioned_input(ray_session):
    edges = [(i, i + 1) for i in range(0, 40, 2)]  # 20 disjoint pairs
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    ).repartition(7)
    rows = connected_components(ds).take_all()
    got = {r["node"]: r["component"] for r in rows}
    for a, b in edges:
        assert got[a] == got[b] == a


def test_pagerank_hand_oracle(ray_session):
    from ontoea_ray.stages.graph import pagerank

    # a -> b, a -> c, b -> c; c dangling (its mass is dropped, documented)
    edges = ray.data.from_arrow(
        pa.table({"subj": ["a", "a", "b"], "obj": ["b", "c", "c"]})
    )
    S = 10**9
    got = {r["node"]: r["rank_units"] for r in pagerank(edges, iters=2).take_all()}

    def step(m):
        qa, qb = m["a"] // 2, m["b"] // 1
        recv = {"a": 0, "b": qa, "c": qa + qb}
        base = 15 * S // 100
        return {n: base + 85 * recv[n] // 100 for n in m}

    m = {"a": S, "b": S, "c": S}
    m = step(step(m))
    assert got == m


def test_pagerank_deterministic_across_partitionings(ray_session):
    from ontoea_ray.stages.graph import pagerank

    tbl = pa.table(
        {
            "subj": [f"n{i}" for i in range(50)],
            "obj": [f"n{(i * 7 + 3) % 50}" for i in range(50)],
        }
    )
    one = {r["node"]: r["rank_units"]
           for r in pagerank(ray.data.from_arrow(tbl), iters=4).take_all()}
    many = {r["node"]: r["rank_units"]
            for r in pagerank(ray.data.from_arrow(tbl).repartition(13), iters=4).take_all()}
    assert one == many


def _random_oriented_edges(n_nodes=60, n_edges=300, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, n_nodes, n_edges * 2)
    b = rng.randint(0, n_nodes, n_edges * 2)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    keep = lo < hi
    pairs = sorted(set(zip(lo[keep].tolist(), hi[keep].tolist())))[:n_edges]
    return pairs


def _brute_triangles(pairs):
    es = set(pairs)
    return sum(
        1
        for (a, b) in pairs
        for (b2, c) in pairs
        if b2 == b and (a, c) in es
    )


def test_triangle_count_broadcast_vs_brute(ray_session):
    from ontoea_ray.stages.graph import triangle_count_broadcast

    pairs = _random_oriented_edges()
    # duplicate some rows: the CSR build must dedup multiplicity
    dup = pairs + pairs[: len(pairs) // 3]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in dup], pa.int64()),
                "id_b": pa.array([p[1] for p in dup], pa.int64()),
            }
        )
    )
    assert triangle_count_broadcast(ds) == _brute_triangles(pairs)


def test_triangle_searchsorted_fallback_matches_bitset(ray_session, monkeypatch):
    import ontoea_ray.stages.graph as g

    pairs = _random_oriented_edges(seed=11)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                "id_b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    with_bits = g.triangle_count_broadcast(ds)
    monkeypatch.setattr(g, "_BITSET_MAX_BYTES", 0)  # force the searchsorted path
    assert g.triangle_count_broadcast(ds) == with_bits == _brute_triangles(pairs)


def test_two_hop_broadcast_vs_brute(ray_session):
    from ontoea_ray.stages.graph import two_hop_counts_broadcast

    pairs = _random_oriented_edges(seed=3)
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
    expect = {}
    for a, nbrs in adj.items():
        two = set()
        for b in nbrs:
            two |= adj.get(b, set())
        if two:
            expect[a] = len(two)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                "id_b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["n_two_hop"] for r in two_hop_counts_broadcast(ds).take_all()}
    assert got == expect


def test_cc_auto_matches_distributed(ray_session, monkeypatch):
    import ontoea_ray.stages.graph as g

    pairs = _random_oriented_edges(n_nodes=40, n_edges=60, seed=5)
    # add a long chain to exercise multi-round closure
    pairs += [(100 + i, 101 + i) for i in range(20)]
    tbl = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs], pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    auto = {r["node"]: r["component"]
            for r in g.connected_components_auto(ray.data.from_arrow(tbl)).take_all()}
    dist = {r["node"]: r["component"]
            for r in g.connected_components(ray.data.from_arrow(tbl)).take_all()}
    assert auto == dist
    # force the distributed path through the auto gate too
    monkeypatch.setenv("ONTOEA_CC_BROADCAST_MAX_EDGES", "1")
    forced = {r["node"]: r["component"]
              for r in g.connected_components_auto(ray.data.from_arrow(tbl)).take_all()}
    assert forced == dist


def test_kcore_rounds_peeling_cascade(ray_session):
    """k-core peel: a triangle+tail graph — the tail peels away round by
    round (cascade), the triangle survives as the 2-core; k=3 collapses
    everything (empty result, no crash)."""
    import ray.data

    from ontoea_ray.stages.graph import kcore_rounds

    # triangle 1-2-3 plus a path 3-4-5 hanging off it
    edges = ray.data.from_items(
        [
            {"a": 1, "b": 2}, {"a": 1, "b": 3}, {"a": 2, "b": 3},
            {"a": 3, "b": 4}, {"a": 4, "b": 5},
        ]
    )
    core2 = {r["node"]: r["deg"] for r in kcore_rounds(edges, k=2, rounds=4).take_all()}
    assert core2 == {1: 2, 2: 2, 3: 2}   # tail 4,5 peeled (5 first, then 4)
    assert kcore_rounds(edges, k=3, rounds=4).take_all() == []


def test_kcore_distributed_semijoin_path_equals_broadcast(ray_session, monkeypatch):
    """Budget=1 forces every survivor set through the Bloom + exact keyed
    semi-join plan; results must equal the broadcast plan bit-for-bit."""
    import pandas as pd
    import ray.data

    from ontoea_ray.stages.graph import kcore_rounds

    rng = __import__("numpy").random.default_rng(3)
    rows = [
        {"a": int(min(x, y)), "b": int(max(x, y))}
        for x, y in rng.integers(0, 40, (150, 2)) if x != y
    ]
    dedup = {(r["a"], r["b"]): r for r in rows}
    edges = ray.data.from_items(list(dedup.values()))

    def run():
        out = kcore_rounds(edges, k=3, rounds=5).take_all()
        return sorted((r["node"], r["deg"]) for r in out)

    broadcast = run()
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    forced = run()
    assert broadcast == forced and len(broadcast) > 0


def test_kcore_string_nodes_use_distributed_plan(ray_session):
    """Non-integer node ids can't take the single-task numpy peel — they
    must route through the per-round distributed plan and still produce
    the correct core."""
    import ray.data

    from ontoea_ray.stages.graph import kcore_rounds

    edges = ray.data.from_items(
        [
            {"a": "x", "b": "y"}, {"a": "x", "b": "z"}, {"a": "y", "b": "z"},
            {"a": "z", "b": "w"},
        ]
    )
    out = {r["node"]: r["deg"] for r in kcore_rounds(edges, k=2, rounds=3).take_all()}
    assert out == {"x": 2, "y": 2, "z": 2}


def test_labelprop_two_cliques_converge(ray_session):
    """Label propagation on two 4-cliques joined by one bridge edge: each
    clique converges to its minimum node id; the bridge is outvoted by the
    in-clique majority on both sides."""
    import itertools

    import ray.data

    from ontoea_ray.stages.communities import labelprop_rounds

    edges = [
        {"a": int(x), "b": int(y)}
        for grp in ([1, 2, 3, 4], [10, 11, 12, 13])
        for x, y in itertools.combinations(grp, 2)
    ] + [{"a": 4, "b": 10}]
    out = {
        r["node"]: r["label"]
        for r in labelprop_rounds(
            ray.data.from_items(edges), rounds=4
        ).take_all()
    }
    assert out == {n: 1 for n in [1, 2, 3, 4]} | {n: 10 for n in [10, 11, 12, 13]}


def test_labelprop_distributed_plan_equals_broadcast(ray_session, monkeypatch):
    """Budget=1 forces the per-round join + count + argmax plan; results
    must equal the single-task numpy plan bit-for-bit (same R rounds, same
    max-count / min-label tie-break)."""
    import numpy as np
    import ray.data

    from ontoea_ray.stages.communities import labelprop_rounds

    rng = np.random.default_rng(7)
    rows = {
        (int(min(x, y)), int(max(x, y)))
        for x, y in rng.integers(0, 60, (250, 2)) if x != y
    }
    edges = ray.data.from_items([{"a": a, "b": b} for a, b in sorted(rows)])

    def run():
        out = labelprop_rounds(edges, rounds=3).take_all()
        return sorted((r["node"], r["label"]) for r in out)

    broadcast = run()
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    forced = run()
    assert broadcast == forced and len(broadcast) > 0


def test_labelprop_string_nodes_use_distributed_plan(ray_session):
    """String node ids route through the distributed plan (min-label ties
    are lexicographic there, matching SQL ORDER BY label ASC)."""
    import itertools

    import ray.data

    from ontoea_ray.stages.communities import labelprop_rounds

    edges = [
        {"a": x, "b": y}
        for grp in (["a1", "a2", "a3"], ["b1", "b2", "b3"])
        for x, y in itertools.combinations(grp, 2)
    ]
    out = {
        r["node"]: r["label"]
        for r in labelprop_rounds(ray.data.from_items(edges), rounds=3).take_all()
    }
    assert out == {n: "a1" for n in ["a1", "a2", "a3"]} | {
        n: "b1" for n in ["b1", "b2", "b3"]
    }


def test_pagerank_budget_plans_equal(ray_session, monkeypatch):
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.graph import pagerank

    e = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array(["a", "a", "b", "c", "c", "c"], pa.string()),
                "obj": pa.array(["b", "c", "c", "a", "b", "b"], pa.string()),
            }
        )
    )
    bcast = {(r["node"], r["rank_units"]) for r in pagerank(e, iters=3).take_all()}
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {(r["node"], r["rank_units"]) for r in pagerank(e, iters=3).take_all()}
    assert bcast == dist


def _ktruss_scalar(edges, k, rounds):
    """Scalar replay of the R-round truss peel + final support filter."""
    thresh = k - 2
    cur = {tuple(sorted(e)) for e in edges}

    def support(cur):
        adj = {}
        for x, y in cur:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        return {(x, y): len(adj[x] & adj[y]) for x, y in cur}

    for _ in range(rounds):
        sup = support(cur)
        new = {e for e in cur if sup[e] >= thresh}
        if new == cur:
            break
        cur = new
    sup = support(cur)
    return {(a, b, s) for (a, b), s in sup.items() if s >= thresh}


def test_ktruss_hand_graph_vs_scalar(ray_session):
    """K4 + pendant edge, all k levels, against the scalar replay."""
    import itertools

    import ray.data

    from ontoea_ray.stages.graph import ktruss_rounds

    edges = list(itertools.combinations(range(4), 2)) + [(3, 4)]
    ds = ray.data.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    for k in (3, 4, 5):
        got = {
            (r["id_a"], r["id_b"], r["sup"])
            for r in ktruss_rounds(ds, k=k, rounds=4).take_all()
        }
        assert got == _ktruss_scalar(edges, k, 4), k


def test_ktruss_cascade_and_budget_plans_equal(ray_session, monkeypatch):
    """Two K5s sharing one bridge edge + a triangle fringe: the k=4 peel
    must CASCADE (fringe first, then nothing else) and the broadcast and
    exchange plans must emit identical rows."""
    import itertools

    import ray.data

    from ontoea_ray.stages.graph import ktruss_rounds

    edges = (
        list(itertools.combinations(range(5), 2))
        + list(itertools.combinations(range(5, 10), 2))
        + [(0, 5), (0, 10), (5, 10), (10, 11), (0, 11)]
    )
    ds = ray.data.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    exp = _ktruss_scalar(edges, 4, 6)
    assert exp  # the two K5 cliques survive
    assert len(exp) < len(edges)  # the fringe peeled away
    bcast = {
        (r["id_a"], r["id_b"], r["sup"])
        for r in ktruss_rounds(ds, k=4, rounds=6).take_all()
    }
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        (r["id_a"], r["id_b"], r["sup"])
        for r in ktruss_rounds(ds, k=4, rounds=6).take_all()
    }
    assert bcast == exp
    assert dist == exp


def test_ktruss_string_nodes_use_exchange_plan(ray_session):
    """String node ids route to the exchange plan (no int encoding);
    orientation is lexicographic, matching the scalar replay."""
    import itertools

    import ray.data

    from ontoea_ray.stages.graph import ktruss_rounds

    names = ["ant", "bee", "cat", "dog"]
    edges = list(itertools.combinations(names, 2)) + [("dog", "emu")]
    ds = ray.data.from_items([{"id_a": a, "id_b": b} for a, b in edges])
    got = {
        (r["id_a"], r["id_b"], r["sup"])
        for r in ktruss_rounds(ds, k=4, rounds=3).take_all()
    }
    assert got == _ktruss_scalar(edges, 4, 3)


def test_hits_hand_graph_and_budget_plans_equal(ray_session, monkeypatch):
    """Star hub 'h' -> {x, y, z}, plus y -> x: scalar replay of the integer
    max-rescale rounds, and broadcast == exchange plan."""
    import numpy as np
    import ray.data

    from ontoea_ray.stages.graph import hits_rounds

    edges = [("h", "x"), ("h", "y"), ("h", "z"), ("y", "x"), ("h", "x")]
    ds = ray.data.from_items([{"s": a, "d": b} for a, b in edges])

    # scalar replay
    nodes = sorted({n for e in edges for n in e})
    scale, rounds = 1000, 3
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(rounds):
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[d] += h[s]
        mx = max(raw.values())
        a = {n: raw[n] * scale // mx if mx else 0 for n in nodes}
        raw = {n: 0 for n in nodes}
        for s, d in edges:
            raw[s] += a[d]
        mx = max(raw.values())
        h = {n: raw[n] * scale // mx if mx else 0 for n in nodes}
    exp = {(n, h[n], a[n]) for n in nodes}

    got = {
        (r["node"], r["hub_units"], r["auth_units"])
        for r in hits_rounds(ds, src="s", dst="d", rounds=rounds).take_all()
    }
    assert got == exp
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        (r["node"], r["hub_units"], r["auth_units"])
        for r in hits_rounds(ds, src="s", dst="d", rounds=rounds).take_all()
    }
    assert dist == exp


def test_mis_hand_graph_scalar_replay(ray_session):
    """MIS on a path graph replayed scalar: independence (no two adjacent
    members), maximality (every non-member has a member neighbour), and
    the per-round membership matches a direct priority replay."""
    import numpy as np
    import ray.data

    from ontoea_ray.stages.graph import _MIS_SALT, mis_rounds
    from ontoea_ray.stages.sampling import splitmix64

    # path 0-1-2-3-4-5 plus an isolated edge 10-11
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = ray.data.from_items([{"a": a, "b": b} for a, b in pairs])
    out = mis_rounds(edges, rounds=6).take_all()
    mis = {r["node"] for r in out}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independence
    for a, b in pairs:
        assert not (a in mis and b in mis)
    # maximality after convergence: every non-member has a member neighbour
    for v in adj:
        assert v in mis or (adj[v] & mis), v

    # round-0 winners replayed directly from priorities
    def prio(v, r):
        return int(splitmix64(np.array([v], np.uint64) * np.uint64(_MIS_SALT) + np.uint64(r))[0])

    expect_r0 = {
        v for v in adj
        if all((prio(v, 0), v) < (prio(u, 0), u) for u in adj[v])
    }
    got_r0 = {r["node"] for r in out if r["round"] == 0}
    assert got_r0 == expect_r0


def test_mis_budget_plans_equal(ray_session, monkeypatch):
    """Budget=1 forces the per-round distributed plan (loser emission +
    exact node anti-joins + frontier neighbourhoods); results must equal
    the single-task numpy plan exactly."""
    import ray.data

    from ontoea_ray.stages.graph import mis_rounds

    rng = __import__("numpy").random.default_rng(11)
    rows = [
        {"a": int(min(x, y)), "b": int(max(x, y))}
        for x, y in rng.integers(0, 60, (200, 2)) if x != y
    ]
    dedup = {(r["a"], r["b"]): r for r in rows}
    edges = ray.data.from_items(list(dedup.values()))

    def run():
        out = mis_rounds(edges, rounds=4).take_all()
        return sorted((r["node"], r["round"]) for r in out)

    broadcast = run()
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    forced = run()
    assert broadcast == forced and len(broadcast) > 0


def _ppr_scalar(edges, seeds, iters, scale=10**9, damp=85):
    nodes = sorted({n for e in edges for n in e})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    base = (100 - damp) * scale // 100
    m = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += m[s] // deg[s]
        m = {n: (base if n in seeds else 0) + damp * recv[n] // 100 for n in nodes}
    return m


def test_ppr_hand_oracle(ray_session):
    from ontoea_ray.stages.graph import personalized_pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "a")]
    e = ray.data.from_arrow(
        pa.table(
            {
                "subj": pa.array([s for s, _ in edges], pa.string()),
                "obj": pa.array([d for _, d in edges], pa.string()),
            }
        )
    )
    seeds = ray.data.from_arrow(pa.table({"node": pa.array(["a"], pa.string())}))
    got = {
        r["node"]: r["rank_units"]
        for r in personalized_pagerank(e, seeds, iters=3).take_all()
    }
    assert got == _ppr_scalar(edges, {"a"}, 3)
    # restart mass only at the seed: d has no in-edges and is not a seed
    assert got["d"] == 0


def test_ppr_budget_plans_equal(ray_session, monkeypatch):
    from ontoea_ray.stages.graph import personalized_pagerank

    tbl = pa.table(
        {
            "subj": [f"n{i}" for i in range(40)],
            "obj": [f"n{(i * 11 + 5) % 40}" for i in range(40)],
        }
    )
    seeds = pa.table({"node": pa.array([f"n{i}" for i in range(0, 40, 7)])})
    bcast = {
        (r["node"], r["rank_units"])
        for r in personalized_pagerank(
            ray.data.from_arrow(tbl), ray.data.from_arrow(seeds), iters=3
        ).take_all()
    }
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        (r["node"], r["rank_units"])
        for r in personalized_pagerank(
            ray.data.from_arrow(tbl).repartition(9),
            ray.data.from_arrow(seeds),
            iters=3,
        ).take_all()
    }
    assert bcast == dist


def _cc_scalar(edges):
    """Brute per-node triangle + degree counts on an oriented edge list."""
    es = {tuple(e) for e in edges}
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for a, b in es:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in nodes}
    for a, b in es:
        for c in adj[a] & adj[b]:
            tri[a] += 1  # each unordered triangle visits each corner twice
            tri[b] += 1  # (once per incident in-triangle edge)
    tri = {n: v // 2 for n, v in tri.items()}
    return {n: (tri[n], len(adj[n])) for n in nodes}


def test_clustering_counts_hand_and_budget(ray_session, monkeypatch):
    from ontoea_ray.stages.graph import clustering_counts

    # two triangles sharing an edge + a pendant
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (4, 5)]
    e = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    want = _cc_scalar(edges)
    got = {
        r["node"]: (r["tri"], r["deg"]) for r in clustering_counts(e).take_all()
    }
    assert got == want == {1: (1, 2), 2: (2, 3), 3: (2, 3), 4: (1, 3), 5: (0, 1)}

    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        r["node"]: (r["tri"], r["deg"])
        for r in clustering_counts(e.repartition(3)).take_all()
    }
    assert dist == want


def test_clustering_counts_random_graph_plans_equal(ray_session, monkeypatch):
    import numpy as np

    from ontoea_ray.stages.graph import clustering_counts

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 30, size=(200, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    lo, hi = raw.min(1), raw.max(1)
    e = ray.data.from_arrow(
        pa.table({"id_a": pa.array(lo, pa.int64()), "id_b": pa.array(hi, pa.int64())})
    )
    edges = sorted({(int(a), int(b)) for a, b in zip(lo, hi)})
    want = _cc_scalar(edges)
    got = {r["node"]: (r["tri"], r["deg"]) for r in clustering_counts(e).take_all()}
    # NOTE: clustering_counts expects a DISTINCT edge table (like the
    # cached co-purchase edges); dedupe first for the scalar comparison
    e_d = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([a for a, _ in edges], pa.int64()),
                "id_b": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = {r["node"]: (r["tri"], r["deg"]) for r in clustering_counts(e_d).take_all()}
    assert got == want
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        r["node"]: (r["tri"], r["deg"])
        for r in clustering_counts(e_d.repartition(7)).take_all()
    }
    assert dist == want


def test_scc_labels_hand_digraph(ray_session):
    from ontoea_ray.stages.graph import scc_labels

    # cycle a->b->c->a (one SCC), chain c->d->e, back-edge e->d (SCC {d,e})
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"), ("e", "d")]
    e = ray.data.from_arrow(
        pa.table(
            {
                "src_domain": pa.array([s for s, _ in edges], pa.string()),
                "dst_domain": pa.array([d for _, d in edges], pa.string()),
            }
        )
    )
    rows = {r["node"]: (r["fmin"], r["bmin"], r["in_core"])
            for r in scc_labels(e, rounds=4).take_all()}
    # SCC {a,b,c}: every member reaches and is reached by 'a'
    for n in "abc":
        assert rows[n] == ("a", "a", 1)
    # SCC {d,e}: fmin = 'a' (reachable forward) but bmin differs for
    # members whose min-reacher is 'a' too -> d,e are reached BY a but
    # cannot reach back: fmin(d) = 'd'?  d reaches {d, e} -> fmin 'd';
    # bmin(d) = 'a' (a reaches d) -> not in 'a' core.
    assert rows["d"] == ("d", "a", 0)
    assert rows["e"] == ("d", "a", 0)


def test_scc_labels_plans_equal(ray_session, monkeypatch):
    import numpy as np

    from ontoea_ray.stages.graph import scc_labels

    rng = np.random.default_rng(17)
    raw = rng.integers(0, 25, size=(120, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    e = ray.data.from_arrow(
        pa.table(
            {
                "src_domain": pa.array([f"n{a:02d}" for a in raw[:, 0]]),
                "dst_domain": pa.array([f"n{b:02d}" for b in raw[:, 1]]),
            }
        )
    )
    bcast = sorted(
        (r["node"], r["fmin"], r["bmin"], r["in_core"])
        for r in scc_labels(e, rounds=4).take_all()
    )
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = sorted(
        (r["node"], r["fmin"], r["bmin"], r["in_core"])
        for r in scc_labels(e.repartition(5), rounds=4).take_all()
    )
    assert dist == bcast


def _kruskal(edges):
    """Scalar MST replay: unique weights -> unique MSF."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def test_boruvka_mst_matches_kruskal(ray_session):
    import numpy as np

    from ontoea_ray.stages.graph import boruvka_mst

    rng = np.random.default_rng(23)
    raw = rng.integers(0, 40, size=(250, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    lo, hi = np.minimum(raw[:, 0], raw[:, 1]), np.maximum(raw[:, 0], raw[:, 1])
    pairs = sorted(set(zip(lo.tolist(), hi.tolist())))
    # unique weights via a deterministic bijection of the pair
    edges = [(a, b, int(a * 1000 + b)) for a, b in pairs]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([e[0] for e in edges], pa.int64()),
                "id_b": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    ).repartition(5)
    got = {
        (r["id_a"], r["id_b"], r["w"]) for r in boruvka_mst(ds).take_all()
    }
    want = _kruskal(edges)
    assert got == want
    # spanning: |MSF| = |V| - #components
    nodes = {n for e in edges for n in e[:2]}
    comps = len(nodes) - len(want)
    assert len(got) == len(nodes) - comps


def test_boruvka_mst_two_components_and_chain(ray_session):
    from ontoea_ray.stages.graph import boruvka_mst

    # triangle with a heavy edge (dropped) + disjoint pair
    edges = [(1, 2, 5), (2, 3, 7), (1, 3, 90), (10, 11, 4)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id_a": pa.array([e[0] for e in edges], pa.int64()),
                "id_b": pa.array([e[1] for e in edges], pa.int64()),
                "w": pa.array([e[2] for e in edges], pa.int64()),
            }
        )
    )
    got = {(r["id_a"], r["id_b"], r["w"]) for r in boruvka_mst(ds).take_all()}
    assert got == {(1, 2, 5), (2, 3, 7), (10, 11, 4)}


def test_boruvka_budget_plans_equal(ray_session, monkeypatch):
    import numpy as np

    from ontoea_ray.stages.graph import boruvka_mst

    rng = np.random.default_rng(29)
    raw = rng.integers(0, 30, size=(150, 2))
    raw = raw[raw[:, 0] != raw[:, 1]]
    lo, hi = np.minimum(raw[:, 0], raw[:, 1]), np.maximum(raw[:, 0], raw[:, 1])
    pairs = sorted(set(zip(lo.tolist(), hi.tolist())))
    tbl = pa.table(
        {
            "id_a": pa.array([p[0] for p in pairs], pa.int64()),
            "id_b": pa.array([p[1] for p in pairs], pa.int64()),
            "w": pa.array([int(a * 977 + b) for a, b in pairs], pa.int64()),
        }
    )
    bcast = {
        (r["id_a"], r["id_b"], r["w"])
        for r in boruvka_mst(ray.data.from_arrow(tbl)).take_all()
    }
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    dist = {
        (r["id_a"], r["id_b"], r["w"])
        for r in boruvka_mst(ray.data.from_arrow(tbl).repartition(4)).take_all()
    }
    assert bcast == dist == _kruskal([(a, b, int(a * 977 + b)) for a, b in pairs])


def test_jp_coloring_hand_graph_scalar_replay(ray_session):
    """Jones–Plassmann on a path graph replayed scalar: properness (no
    edge monochromatic), FULL coverage once rounds exceed the peel depth,
    and per-color membership matches a direct priority replay in which
    losers stay alive (the one divergence from MIS)."""
    import numpy as np
    import ray.data

    from ontoea_ray.stages.graph import _JP_SALT, jp_coloring
    from ontoea_ray.stages.sampling import splitmix64

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
    edges = ray.data.from_items([{"a": a, "b": b} for a, b in pairs])
    out = jp_coloring(edges, rounds=8).take_all()
    color = {r["node"]: r["color"] for r in out}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # coverage + properness
    assert set(color) == set(adj)
    for a, b in pairs:
        assert color[a] != color[b]

    # full scalar replay: peel winners round by round, losers staying
    def prio(v, r):
        return int(
            splitmix64(np.array([v], np.uint64) * np.uint64(_JP_SALT) + np.uint64(r))[0]
        )

    alive = set(adj)
    expect = {}
    r = 0
    while alive and r < 8:
        win = {
            v
            for v in alive
            if all((prio(v, r), v) < (prio(u, r), u) for u in adj[v] if u in alive)
        }
        for v in win:
            expect[v] = r
        alive -= win
        r += 1
    assert color == expect


def test_jp_coloring_budget_plans_equal(ray_session, monkeypatch):
    """Budget=1 forces the per-round distributed plan (loser emission +
    exact node anti-join + edges-within semi-join); results must equal the
    single-task numpy plan exactly, and the coloring must be proper."""
    import ray.data

    from ontoea_ray.stages.graph import jp_coloring

    rng = __import__("numpy").random.default_rng(13)
    rows = [
        {"a": int(min(x, y)), "b": int(max(x, y))}
        for x, y in rng.integers(0, 60, (200, 2)) if x != y
    ]
    dedup = {(r["a"], r["b"]): r for r in rows}
    edges = ray.data.from_items(list(dedup.values()))

    def run():
        out = jp_coloring(edges, rounds=5).take_all()
        return sorted((r["node"], r["color"]) for r in out)

    broadcast = run()
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    forced = run()
    assert broadcast == forced
    col = dict(broadcast)
    for r in dedup.values():
        if r["a"] in col and r["b"] in col:
            assert col[r["a"]] != col[r["b"]]
