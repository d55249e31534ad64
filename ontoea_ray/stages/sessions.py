"""Gap-based sessionization — the windowed-aggregate primitive event
pipelines (crawl-log analysis, user analytics, training-data curation by
browsing session) are built on, which Ray Data has no native operator for.

A *session* is a maximal run of one key's events where consecutive
timestamps are no more than ``gap_us`` apart (strictly-greater gap starts a
new session).  Sessions are a per-key notion, so the whole computation
needs exactly ONE hash co-location on the key: inside each partition a
stable (key, ts, tie) sort + a vectorized diff/cumsum assigns 0-based
per-key session indices, and — because a session can never span
partitions — the per-session aggregate reduces in the SAME pass with no
second exchange.  No driver state; partitions stream independently, so the
plan is unchanged on a 256-node cluster (the exchange width scales with
``shuffle_width()``).

Determinism: equal-timestamp events order by the ``tie_cols`` (e.g.
event_id), making labels a pure function of the table — the DuckDB oracle
replays them with LAG + a running CASE sum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.shuffle import with_partition_key
from ontoea_ray.functions.tables import from_pandas as _fp


def _ts_us(s: pd.Series) -> np.ndarray:
    return s.to_numpy().astype("datetime64[us]").astype(np.int64)


def session_labels(key: np.ndarray, ts_us: np.ndarray, gap_us: int) -> np.ndarray:
    """0-based per-key session index for rows sorted by (key, ts, tie)."""
    n = len(key)
    if n == 0:
        return np.zeros(0, np.int64)
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = (key[1:] != key[:-1]) | ((ts_us[1:] - ts_us[:-1]) > gap_us)
    s = np.cumsum(new)
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    base = np.repeat(s[starts], np.diff(np.r_[starts, n]))
    return (s - base).astype(np.int64)


def sessionize(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tie_cols: list[str] = (),
    out_col: str = "session_idx",
    width: int | None = None,
) -> ray.data.Dataset:
    """Per-event session labels: input rows + ``out_col`` (int64, 0-based
    per key).  One keyed exchange, vectorized in-partition assignment."""
    parted = with_partition_key(ds, [key_col], width=width)
    sort_cols = [key_col, ts_col, *tie_cols]

    def label(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(sort_cols, kind="mergesort").drop(columns=["pkey"])
        idx = session_labels(
            df[key_col].to_numpy(np.int64), _ts_us(df[ts_col]), gap_us
        )
        df[out_col] = idx
        return _fp(df)

    return parted.groupby("pkey").map_groups(label, batch_format="pandas")


def session_table(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tie_cols: list[str] = (),
    width: int | None = None,
) -> ray.data.Dataset:
    """Per-session aggregate (key, session_idx, n_events, start_us,
    duration_us) in the SAME single-exchange pass as label assignment —
    sessions are partition-local by construction, so no second shuffle is
    ever needed.  Contrast with a per-key ``groupby(key).map_groups``:
    that plan pays one function call per KEY (millions at corpus scale);
    this one pays one per PARTITION (``shuffle_width()``, O(cluster))."""
    parted = with_partition_key(
        ds.select_columns([key_col, ts_col, *tie_cols]), [key_col], width=width
    )
    sort_cols = [key_col, ts_col, *tie_cols]

    def reduce(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(sort_cols, kind="mergesort")
        key = df[key_col].to_numpy(np.int64)
        ts = _ts_us(df[ts_col])
        idx = session_labels(key, ts, gap_us)
        n = len(key)
        if n == 0:
            return _fp(
                pd.DataFrame(
                    {
                        key_col: pd.Series([], dtype="int64"),
                        "session_idx": pd.Series([], dtype="int64"),
                        "n_events": pd.Series([], dtype="int64"),
                        "start_us": pd.Series([], dtype="int64"),
                        "duration_us": pd.Series([], dtype="int64"),
                    }
                )
            )
        starts = np.flatnonzero(np.r_[True, (key[1:] != key[:-1]) | (idx[1:] != idx[:-1])])
        ends = np.r_[starts[1:], n] - 1
        return _fp(
            pd.DataFrame(
                {
                    key_col: key[starts],
                    "session_idx": idx[starts],
                    "n_events": (ends - starts + 1).astype(np.int64),
                    "start_us": ts[starts],
                    "duration_us": ts[ends] - ts[starts],
                }
            )
        )

    return parted.groupby("pkey").map_groups(reduce, batch_format="pandas")
