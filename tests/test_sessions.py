"""stages/sessions.py vs brute-force scalar oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.stages.sessions import session_labels, session_table, sessionize

GAP = 1_000_000  # 1s in us


def _events():
    # user 1: gaps 0.5s / exactly 1s (same session: strictly-greater rule)
    #         then 1.000001s (new session)
    # user 2: single event; user 3: two sessions far apart
    rows = [
        (1, 0, 10),
        (1, 500_000, 11),
        (1, 1_500_000, 12),       # +1.0s  -> same session
        (1, 2_500_001, 13),       # +1.000001s -> NEW session
        (2, 42, 20),
        (3, 0, 30),
        (3, 5_000_000, 31),
        (3, 5_400_000, 32),
    ]
    return pd.DataFrame(rows, columns=["uid", "us", "eid"]).assign(
        ts=lambda d: pd.to_datetime(d["us"], unit="us")
    )


def test_session_labels_boundary():
    df = _events().sort_values(["uid", "ts", "eid"])
    lab = session_labels(df["uid"].to_numpy(np.int64), df["us"].to_numpy(np.int64), GAP)
    assert lab.tolist() == [0, 0, 0, 1, 0, 0, 1, 1]


def test_sessionize_and_table_match_oracle(ray_session):
    df = _events()
    ds = ray.data.from_arrow(
        pa.table({"uid": df["uid"], "ts": df["ts"], "eid": df["eid"]})
    ).repartition(3)  # force keys to cross input blocks

    lab = sessionize(ds, key_col="uid", ts_col="ts", gap_us=GAP, tie_cols=["eid"])
    got = {(r["eid"]): r["session_idx"] for r in lab.take_all()}
    assert got == {10: 0, 11: 0, 12: 0, 13: 1, 20: 0, 30: 0, 31: 1, 32: 1}

    tab = session_table(ds, key_col="uid", ts_col="ts", gap_us=GAP, tie_cols=["eid"])
    rows = sorted(
        (r["uid"], r["session_idx"], r["n_events"], r["start_us"], r["duration_us"])
        for r in tab.take_all()
    )
    assert rows == [
        (1, 0, 3, 0, 1_500_000),
        (1, 1, 1, 2_500_001, 0),
        (2, 0, 1, 42, 0),
        (3, 0, 1, 0, 0),
        (3, 1, 2, 5_000_000, 400_000),
    ]


def test_sessionize_partitioning_invariance(ray_session):
    rng = np.random.default_rng(7)
    n = 600
    df = pd.DataFrame(
        {
            "uid": rng.integers(0, 12, n),
            "us": rng.integers(0, 50_000_000, n),
            "eid": np.arange(n, dtype=np.int64),
        }
    ).assign(ts=lambda d: pd.to_datetime(d["us"], unit="us"))
    tbl = pa.table({"uid": df["uid"], "ts": df["ts"], "eid": df["eid"]})

    def run(width):
        ds = ray.data.from_arrow(tbl).repartition(5)
        out = session_table(
            ds, key_col="uid", ts_col="ts", gap_us=GAP, tie_cols=["eid"], width=width
        )
        return sorted(
            (r["uid"], r["session_idx"], r["n_events"], r["start_us"], r["duration_us"])
            for r in out.take_all()
        )

    assert run(2) == run(7)
