"""Temporal operators (stages/temporal.py) vs brute-force oracles on
synthetic data — including window lookbacks that cross time-bucket
boundaries (the halo-replication path)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.stages.temporal import asof_join, range_join_agg, sliding_window_sum


def _events(n: int, n_keys: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.choice(10**9, size=n, replace=False)), unit="us"
    )
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, n_keys, n).astype(np.int64),
            "ts": ts,
            "v": rng.integers(-50, 1000, n).astype(np.int64),
        }
    )


def test_asof_join_matches_merge_asof(ray_session):
    left = _events(400, 13, 1)
    right = _events(300, 13, 2)
    got = pa.Table.from_pylist(
        asof_join(
            ray.data.from_pandas(left).repartition(5),
            ray.data.from_pandas(right).repartition(4),
            key="k",
            on="ts",
            left_cols=["rid"],
            right_cols=["rid", "v"],
            width=7,
        ).take_all()
    ).to_pandas()
    exp = pd.merge_asof(
        left.sort_values("ts")[["k", "ts", "rid"]],
        right.sort_values("ts").rename(columns={"rid": "rid_r", "ts": "ts_r"})[
            ["k", "ts_r", "rid_r", "v"]
        ],
        left_on="ts",
        right_on="ts_r",
        by="k",
        direction="backward",
    )
    exp = exp[exp["ts_r"].notna()]
    g = got.sort_values("rid").reset_index(drop=True)
    e = exp.sort_values("rid").reset_index(drop=True)
    assert len(g) == len(e)
    assert (g["rid"].to_numpy() == e["rid"].to_numpy()).all()
    assert (g["rid_r"].to_numpy(np.int64) == e["rid_r"].to_numpy(np.int64)).all()
    assert (g["v"].to_numpy(np.int64) == e["v"].to_numpy(np.int64)).all()


def test_range_join_agg_matches_bruteforce(ray_session):
    left = _events(250, 9, 3)
    right = _events(350, 9, 4)
    lo, hi = pd.Timedelta(minutes=-7), pd.Timedelta(0)
    got = (
        pa.Table.from_pylist(
            range_join_agg(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                key="k",
                on="ts",
                left_cols=["rid"],
                val="v",
                lo_offset=lo,
                hi_offset=hi,
                width=5,
            ).take_all()
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    ns, sums = [], []
    for _, row in left.sort_values("rid").iterrows():
        m = right[
            (right["k"] == row["k"])
            & (right["ts"] >= row["ts"] + lo)
            & (right["ts"] < row["ts"] + hi)
        ]
        ns.append(len(m))
        sums.append(int(m["v"].sum()))
    assert got["n_matched"].tolist() == ns
    assert got["val_sum"].tolist() == sums


def test_sliding_window_crosses_buckets(ray_session):
    df = _events(500, 1, 5).rename(columns={"k": "part"})
    df["part"] = np.where(df["rid"] % 3 == 0, "a", "b")
    window = pd.Timedelta(minutes=2)
    # tiny bucket (4x window) forces many windows to need halo rows
    got = (
        pa.Table.from_pylist(
            sliding_window_sum(
                ray.data.from_pandas(df).repartition(6),
                part="part",
                on="ts",
                val="v",
                window=window,
                keep_cols=["rid"],
                bucket=window * 4,
                width=8,
            ).take_all()
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    assert len(got) == len(df)
    exp_n, exp_s = [], []
    for _, row in df.sort_values("rid").iterrows():
        m = df[
            (df["part"] == row["part"])
            & (df["ts"] >= row["ts"] - window)
            & (df["ts"] <= row["ts"])
        ]
        exp_n.append(len(m))
        exp_s.append(int(m["v"].sum()))
    assert got["w_n"].tolist() == exp_n
    assert got["w_sum"].tolist() == exp_s
