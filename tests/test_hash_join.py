"""hash_join semantics (inner parity vs DuckDB is covered by the oracle
gate; these pin left-join nulls, suffixing, and multi-key joins)."""

import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.join import hash_join


def _df(res) -> pd.DataFrame:
    return pa.Table.from_pylist(res.take_all()).to_pandas()


def test_left_join_carries_nulls():
    l = ray.data.from_items([{"k": 1, "v": 10}, {"k": 2, "v": 20}, {"k": 3, "v": 30}])
    r = ray.data.from_items([{"k": 1, "w": 100}, {"k": 3, "w": 300}])
    out = _df(hash_join(l, r, on=["k"], how="left")).sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3]
    assert out["v"].tolist() == [10, 20, 30]
    assert out["w"][0] == 100 and pd.isna(out["w"][1]) and out["w"][2] == 300


def test_inner_join_drops_non_matches_and_suffixes_collisions():
    l = ray.data.from_items([{"k": 1, "v": 10}, {"k": 2, "v": 20}])
    r = ray.data.from_items([{"kk": 2, "v": 99}, {"kk": 5, "v": 7}])
    out = _df(hash_join(l, r, on=["k"], right_on=["kk"], how="inner"))
    assert out.to_dict("records") == [{"k": 2, "v": 20, "v_r": 99}]


def test_multi_key_join_and_duplicate_matches():
    l = ray.data.from_items([{"a": 1, "b": "x", "v": 1}, {"a": 1, "b": "y", "v": 2}])
    r = ray.data.from_items(
        [{"a": 1, "b": "x", "w": 10}, {"a": 1, "b": "x", "w": 11}, {"a": 1, "b": "z", "w": 12}]
    )
    out = _df(hash_join(l, r, on=["a", "b"], how="inner")).sort_values("w").reset_index(drop=True)
    assert len(out) == 2  # one left row x two right matches
    assert out["w"].tolist() == [10, 11] and out["v"].tolist() == [1, 1]


def test_right_and_outer_join_match_pandas(ray_session):
    import pandas as pd

    lt = pa.table({"k": [1, 2, 3, 3], "lv": ["a", "b", "c", "d"]})
    rt = pa.table({"k": [2, 3, 5], "rv": [20, 30, 50]})
    ld, rd = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    for how in ("right", "outer"):
        got = (
            pd.DataFrame(hash_join(ld, rd, on=["k"], how=how).take_all())
            .sort_values(["k", "lv"], na_position="last")
            .reset_index(drop=True)
        )
        exp = (
            lt.to_pandas()
            .merge(rt.to_pandas(), on="k", how=how)
            .sort_values(["k", "lv"], na_position="last")
            .reset_index(drop=True)
        )
        assert got["k"].tolist() == exp["k"].tolist(), how
        assert got["lv"].fillna("-").tolist() == exp["lv"].fillna("-").tolist(), how
        assert got["rv"].fillna(-1).astype(int).tolist() == exp["rv"].fillna(-1).astype(int).tolist(), how


def test_salted_aggregate_equals_plain_groupby(ray_session):
    import numpy as np
    from ray.data.aggregate import Count, Min, Sum

    from ontoea_ray.functions.shuffle import salted_aggregate

    rng = np.random.default_rng(7)
    n = 5000
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    tbl = pa.table(
        {
            "k": pa.array(keys.tolist(), pa.string()),
            "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = {
        r["k"]: (r["v"], r["n"])
        for r in salted_aggregate(
            ds, ["k"], sums=["v"], count_alias="n", salt=16
        ).take_all()
    }
    plain = {
        r["k"]: (r["v"], r["n"])
        for r in ds.groupby("k")
        .aggregate(Sum("v", alias_name="v"), Count(alias_name="n"))
        .take_all()
    }
    assert got == plain


def test_join_executes_each_input_once(ray_session):
    """Regression guard: hash_join's schema probe must not re-execute lazy
    inputs (ds.schema() on a computed pipeline runs the upstream plan, and
    lineage re-execution would then run it again per consume).  Count
    actual UDF invocations through a named counter actor."""
    import numpy as np

    from ontoea_ray.functions.join import hash_join

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def bump(self, k):
            self.n += k
            return self.n

        def get(self):
            return self.n

    counter = Counter.options(name="join_exec_counter").remote()

    tbl = pa.table(
        {"k": pa.array(np.arange(100, dtype=np.int64)), "v": pa.array(np.arange(100, dtype=np.int64))}
    )

    def counted(b: pa.Table) -> pa.Table:
        c = ray.get_actor("join_exec_counter")
        ray.get(c.bump.remote(len(b)))
        return b

    left = ray.data.from_arrow(tbl).repartition(4).map_batches(counted, batch_format="pyarrow")
    right = ray.data.from_arrow(tbl).repartition(4)
    out = hash_join(left, right, on=["k"])
    assert len(out.take_all()) == 100
    # every row flows through the counted stage EXACTLY once
    assert ray.get(counter.get.remote()) == 100
    ray.kill(counter)


def _jdict(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_broadcast_join_matches_exchange_plan(ray_session):
    """Auto-broadcast (small materialized side) must produce exactly the
    exchange plan's rows for inner and left joins, including null fills
    and collision suffixes."""
    import numpy as np

    from ontoea_ray.functions.join import hash_join

    big = pa.table(
        {
            "k": pa.array(np.arange(200, dtype=np.int64) % 50),
            "v": pa.array(np.arange(200, dtype=np.int64)),
        }
    )
    small = pa.table(
        {
            "k": pa.array(np.arange(0, 40, 2, dtype=np.int64)),
            "v": pa.array(np.arange(20, dtype=np.int64) * 100),
        }
    )
    left = ray.data.from_arrow(big).repartition(4).map_batches(lambda b: b, batch_format="pyarrow")
    right_m = ray.data.from_arrow(small)  # materialized -> broadcastable

    for how in ("inner", "left"):
        got = hash_join(left, right_m, on=["k"], how=how)  # auto -> broadcast right
        ref = hash_join(left, right_m, on=["k"], how=how, broadcast="none")
        cols = ["k", "v", "v_r"]
        assert _jdict(got, cols) == _jdict(ref, cols), how


def test_broadcast_join_inner_either_side(ray_session):
    import numpy as np

    from ontoea_ray.functions.join import hash_join

    small = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "a": pa.array([10, 20, 30], pa.int64())})
    )
    big = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 3, 4], pa.int64()), "b": pa.array([1, 2, 3, 4], pa.int64())})
    ).repartition(2).map_batches(lambda b: b, batch_format="pyarrow")

    got = hash_join(small, big, on=["k"], how="inner")  # broadcast LEFT
    ref = hash_join(small, big, on=["k"], how="inner", broadcast="none")
    assert _jdict(got, ["k", "a", "b"]) == _jdict(ref, ["k", "a", "b"])


def _lazy_parquet(tmp_path, tbl: pa.Table, name: str) -> ray.data.Dataset:
    """A genuinely LAZY dataset with a KNOWN schema (parquet metadata), so
    ensure_known_schema does not materialize it — a from_arrow().map_batches()
    chain has unknown schema and would be materialized, making both sides
    MaterializedDataset and silently disabling the runtime-filter branch."""
    import pyarrow.parquet as pq

    p = str(tmp_path / name)
    pq.write_table(tbl, p)
    return ray.data.read_parquet(p)


def test_runtime_filter_prunes_exchange_but_keeps_results(ray_session, tmp_path):
    """Bloom runtime filter on the exchange plan: identical results for
    inner (prune lazy left vs materialized right) and left joins (prune
    lazy right vs materialized left), compared with runtime_filter=False;
    and the left join still carries its unmatched null-filled rows.
    Asserts (via the driver-side build counter) that the filter ACTUALLY
    activated — a materialized probe side would silently skip it."""
    import numpy as np

    import ontoea_ray.functions.join as joinmod
    from ontoea_ray.functions.join import hash_join

    big = pa.table(
        {
            "k": pa.array(np.arange(300, dtype=np.int64) % 100),
            "v": pa.array(np.arange(300, dtype=np.int64)),
        }
    )
    keys = pa.table(
        {"k": pa.array([5, 7, 11], pa.int64()), "w": pa.array([1, 2, 3], pa.int64())}
    )
    lazy_big = _lazy_parquet(tmp_path, big, "big.parquet")
    assert lazy_big.schema(fetch_if_missing=False) is not None
    assert not isinstance(lazy_big, ray.data.dataset.MaterializedDataset)
    mat_keys = ray.data.from_arrow(keys)

    # inner: right materialized -> left side pruned before the exchange
    before = joinmod.RUNTIME_FILTER_BUILDS
    got = hash_join(lazy_big, mat_keys, on=["k"], how="inner", broadcast="none")
    assert joinmod.RUNTIME_FILTER_BUILDS == before + 1  # filter installed
    ref = hash_join(lazy_big, mat_keys, on=["k"], how="inner", broadcast="none", runtime_filter=False)
    assert _jdict(got, ["k", "v", "w"]) == _jdict(ref, ["k", "v", "w"])

    # left: left materialized -> RIGHT side pruned; every left row survives
    before = joinmod.RUNTIME_FILTER_BUILDS
    got2 = hash_join(mat_keys, lazy_big, on=["k"], how="left", broadcast="none")
    assert joinmod.RUNTIME_FILTER_BUILDS == before + 1
    ref2 = hash_join(mat_keys, lazy_big, on=["k"], how="left", broadcast="none", runtime_filter=False)
    assert _jdict(got2, ["k", "w", "v"]) == _jdict(ref2, ["k", "w", "v"])
    assert {r["k"] for r in got2.take_all()} == {5, 7, 11}


def test_runtime_filter_null_keys_and_type_mismatch(ray_session, tmp_path):
    """The Bloom filter must neither crash on null join keys nor prune
    joinable rows whose raw string renderings differ across types (float
    probe vs int build: '5.0' vs '5') — keys are cast to the normalized
    keytypes before hashing, and null-key rows bypass the filter."""
    import ontoea_ray.functions.join as joinmod
    from ontoea_ray.functions.join import hash_join

    probe = pa.table(
        {
            "k": pa.array([5.0, 7.0, None, 42.0], pa.float64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    build = pa.table(
        {"k": pa.array([5.0, 7.0], pa.float64()), "w": pa.array([50, 70], pa.int64())}
    )
    lazy_probe = _lazy_parquet(tmp_path, probe, "probe.parquet")
    mat_build = ray.data.from_arrow(build)

    before = joinmod.RUNTIME_FILTER_BUILDS
    got = hash_join(lazy_probe, mat_build, on=["k"], how="inner", broadcast="none")
    assert joinmod.RUNTIME_FILTER_BUILDS == before + 1
    ref = hash_join(lazy_probe, mat_build, on=["k"], how="inner", broadcast="none", runtime_filter=False)
    assert _jdict(got, ["k", "v", "w"]) == _jdict(ref, ["k", "v", "w"])
    assert {r["k"] for r in got.take_all()} == {5.0, 7.0}

    # int build side against float probe keys: tag() casts build keys to the
    # probe's float64, so the filter must hash the CAST value, not '5' vs '5.0'
    build_int = ray.data.from_arrow(
        pa.table({"k": pa.array([5, 7], pa.int64()), "w": pa.array([50, 70], pa.int64())})
    )
    before = joinmod.RUNTIME_FILTER_BUILDS
    got2 = hash_join(lazy_probe, build_int, on=["k"], how="inner", broadcast="none")
    assert joinmod.RUNTIME_FILTER_BUILDS == before + 1
    assert sorted(r["k"] for r in got2.take_all()) == [5.0, 7.0]


def test_broadcast_join_empty_small_side(ray_session, tmp_path):
    """A legitimately-empty materialized small side (e.g. after a selective
    filter) must not crash the broadcast plan: inner returns empty, left
    keeps every stream row with typed nulls."""
    import numpy as np

    from ontoea_ray.functions.join import hash_join

    big = pa.table(
        {
            "k": pa.array(np.arange(20, dtype=np.int64)),
            "v": pa.array(np.arange(20, dtype=np.int64)),
        }
    )
    stream = _lazy_parquet(tmp_path, big, "stream.parquet")
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "w": pa.array([], pa.int64())})
    )

    inner = hash_join(stream, empty, on=["k"], how="inner", broadcast="right")
    assert inner.count() == 0

    left = hash_join(stream, empty, on=["k"], how="left", broadcast="right")
    rows = left.take_all()
    assert len(rows) == 20
    assert all(r["w"] is None for r in rows)
    assert sorted(r["k"] for r in rows) == list(range(20))
