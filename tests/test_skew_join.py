"""salted_join: bit-equality with the plain exchange join on a skewed
fixture, salt-spread of the hot key, and the no-hot-keys degenerate path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.join import hash_join, salted_join


def _df(res) -> pd.DataFrame:
    df = pa.Table.from_pylist(res.take_all()).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _skewed_inputs():
    rng = np.random.RandomState(7)
    # 90% of probe rows on key 1, the rest uniform over 2..20
    key = np.where(rng.rand(5000) < 0.9, 1, rng.randint(2, 21, 5000)).astype(np.int64)
    probe = pa.table({"key": key, "v": np.arange(5000, dtype=np.int64)})
    build = pa.table(
        {
            "key": np.arange(1, 26, dtype=np.int64),
            "tag": np.array([f"t{i}" for i in range(1, 26)]),
        }
    )
    left = ray.data.from_arrow(probe).repartition(8)
    right = ray.data.from_arrow(build).repartition(2)
    return left, right


def test_salted_equals_plain():
    left, right = _skewed_inputs()
    got = _df(salted_join(left, right, on=["key"], salts=4, hot_threshold=100))
    exp = _df(hash_join(left, right, on=["key"], how="inner", broadcast="none"))
    pd.testing.assert_frame_equal(got, exp)


def test_salted_spreads_hot_key():
    # the hot key's probe rows must actually land on >1 salt value — probe
    # the pre-drop dataset via the _keep_salt hook and check the (key, salt)
    # groups the exchange sees: 4 salts over ~4500 hot rows hits all 4,
    # while every cold key stays on salt 0
    left, right = _skewed_inputs()
    joined = salted_join(
        left, right, on=["key"], salts=4, hot_threshold=100, _keep_salt=True
    )
    df = pa.Table.from_pylist(joined.take_all()).to_pandas()
    hot_salts = set(df.loc[df["key"] == 1, "_skew_salt"])
    assert hot_salts == {0, 1, 2, 3}, hot_salts
    # the hot key's rows split roughly evenly — no salt holds >50% of them
    counts = df.loc[df["key"] == 1, "_skew_salt"].value_counts()
    assert counts.max() <= 0.5 * counts.sum(), counts.to_dict()
    assert set(df.loc[df["key"] != 1, "_skew_salt"]) == {0}
    # plain join row count preserved exactly (no dup, no loss)
    exp = _df(hash_join(left, right, on=["key"], how="inner", broadcast="none"))
    assert len(df) == len(exp)


def test_no_hot_keys_degenerates_to_plain():
    probe = pa.table(
        {"key": np.arange(100, dtype=np.int64), "v": np.arange(100, dtype=np.int64)}
    )
    build = pa.table(
        {"key": np.arange(0, 200, 2, dtype=np.int64), "w": np.arange(100, dtype=np.int64)}
    )
    left = ray.data.from_arrow(probe).repartition(4)
    right = ray.data.from_arrow(build).repartition(2)
    got = _df(salted_join(left, right, on=["key"], salts=4, hot_threshold=50))
    exp = _df(hash_join(left, right, on=["key"], how="inner", broadcast="none"))
    pd.testing.assert_frame_equal(got, exp)


def test_multi_key_salting():
    rng = np.random.RandomState(3)
    k1 = np.where(rng.rand(2000) < 0.8, 1, rng.randint(2, 6, 2000)).astype(np.int64)
    k2 = np.where(rng.rand(2000) < 0.8, "a", "b").astype(object)
    probe = pa.table(
        {"k1": k1, "k2": pa.array(list(k2), pa.string()), "v": np.arange(2000, dtype=np.int64)}
    )
    build = pa.table(
        {
            "k1": np.repeat(np.arange(1, 6, dtype=np.int64), 2),
            "k2": pa.array(["a", "b"] * 5, pa.string()),
            "w": np.arange(10, dtype=np.int64),
        }
    )
    left = ray.data.from_arrow(probe).repartition(4)
    right = ray.data.from_arrow(build).repartition(2)
    got = _df(salted_join(left, right, on=["k1", "k2"], salts=3, hot_threshold=200))
    exp = _df(hash_join(left, right, on=["k1", "k2"], how="inner", broadcast="none"))
    pd.testing.assert_frame_equal(got, exp)
