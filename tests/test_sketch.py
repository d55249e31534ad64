"""Count-Min / HLL sketch semantics (SQL value parity is covered by the
oracle gate in test_queries_oracle)."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.sketch import (
    count_min_sketch,
    count_min_topk,
    hll_estimate,
    hyperloglog_registers,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def _exact_counts():
    import collections

    c = collections.Counter()
    for r in _docs().take_all():
        c.update(r["text"].split(" "))
    return c


def test_count_min_never_underestimates():
    exact = _exact_counts()
    top = count_min_topk(_docs(), k=50).to_pandas()
    est = dict(zip(top["token"], top["est"]))
    for tok, e in est.items():
        assert e >= exact[tok], (tok, e, exact[tok])


def test_count_min_finds_true_heavy_hitter():
    exact = _exact_counts()
    true_top = max(exact, key=lambda t: (exact[t], t))
    top = count_min_topk(_docs(), k=5).to_pandas()
    assert true_top in set(top["token"])


def test_count_min_register_table_is_bounded():
    regs = count_min_sketch(_docs(), depth=4, width=1024).take_all()
    assert len(regs) <= 4 * 1024
    assert all(0 <= r["bucket"] < 1024 and 0 <= r["r"] < 4 for r in regs)


def test_hll_estimate_accuracy_and_determinism():
    regs1 = pa.Table.from_pylist(
        hyperloglog_registers(_docs(), col="text", p=10, tokens=True).take_all()
    )
    regs2 = pa.Table.from_pylist(
        hyperloglog_registers(_docs(), col="text", p=10, tokens=True).take_all()
    )
    df1 = regs1.to_pandas().sort_values("bucket").reset_index(drop=True)
    df2 = regs2.to_pandas().sort_values("bucket").reset_index(drop=True)
    assert df1.equals(df2)
    exact = len(_exact_counts())
    est = hll_estimate(regs1, p=10)
    assert abs(est - exact) / exact < 0.15  # p=10 -> ~3.2% typical, generous bound


def test_hll_doc_ids_cardinality():
    # distinct over a non-token column (doc_id as string)
    regs = hyperloglog_registers(_docs(), col="doc_id", p=10)
    est = hll_estimate(pa.Table.from_pylist(regs.take_all()), p=10)
    exact = _docs().count()
    assert abs(est - exact) / exact < 0.15


def test_exact_quantiles_positions_and_ties(ray_session):
    import numpy as np
    import ray.data

    from ontoea_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(7)
    vals = np.concatenate([rng.integers(0, 50, 997), np.full(200, 25)])  # heavy ties
    ds = ray.data.from_items([{"v": int(v)} for v in vals]).repartition(13)
    probs = {"p10": 0.1, "p50": 0.5, "p99": 0.99, "min": 0.0, "max": 1.0}
    t = exact_quantiles(ds, "v", probs)
    got = dict(zip(t["q"].to_pylist(), t["v"].to_pylist()))
    s = np.sort(vals)
    n = len(s)
    for label, p in probs.items():
        assert got[label] == s[int(np.floor(p * (n - 1)))], label
    assert t.schema.field("v").type == __import__("pyarrow").int64()


def test_with_global_rank_exact_and_deterministic(ray_session):
    import numpy as np
    import ray.data

    from ontoea_ray.stages.quantiles import with_global_rank

    rng = np.random.default_rng(11)
    ids = rng.permutation(1201)
    keys = rng.integers(0, 40, 1201)  # heavy ties -> tiebreaker required
    ds = ray.data.from_items(
        [{"id": int(i), "k": int(k)} for i, k in zip(ids, keys)]
    ).repartition(17)
    out = with_global_rank(ds, ["k", "id"], rank_col="rank").to_pandas()
    # rank must be a permutation of 0..n-1 and replay ROW_NUMBER()-1 exactly
    assert sorted(out["rank"]) == list(range(1201))
    order = np.lexsort((out["id"].to_numpy(), out["k"].to_numpy()))
    assert (out["rank"].to_numpy()[order] == np.arange(1201)).all()
    # deterministic across runs
    out2 = with_global_rank(ds, ["k", "id"], rank_col="rank").to_pandas()
    a = out.sort_values("id").reset_index(drop=True)
    b = out2.sort_values("id").reset_index(drop=True)
    assert a.equals(b)


def test_hll_int_estimate_accuracy(ray_session):
    """Integer estimator within the documented sigma on a known set."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.sketch import (
        hll_estimate_milli,
        hll_int_params,
        hyperloglog_registers,
    )

    n = 5000
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(np.arange(n), pa.int64())})
    ).repartition(4)
    regs = hyperloglog_registers(ds, col="k", p=6).take_all()
    _, _, cap = hll_int_params(6)
    term = sum(1 << (cap - min(r["rho"], cap)) for r in regs)
    e = hll_estimate_milli(np.array([term]), np.array([len(regs)]), 6)[0]
    assert abs(e / 1000 - n) < 0.35 * n  # sigma ~13%; 2.7 sigma headroom
