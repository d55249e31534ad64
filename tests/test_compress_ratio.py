"""q_compress_ratio golden values (no SQL oracle: zlib isn't SQL-expressible)."""

import zlib

import numpy as np
import pyarrow as pa
import ray.data


def test_compress_ratio_goldens(ray_session, tmp_path):
    import pyarrow.parquet as pq

    texts = [
        "spam spam spam spam spam spam spam spam",   # highly compressible
        "the quick brown fox jumps over the lazy dog",
        "a",                                          # tiny: overhead > input
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s"] * 3),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    from ontoea_ray.queries import QUERIES

    rows = {r["doc_id"]: r for r in QUERIES["q_compress_ratio"](str(tmp_path)).take_all()}
    for i, t in enumerate(texts):
        raw = t.encode()
        comp = len(zlib.compress(raw, 6))
        assert rows[i]["n_bytes"] == len(raw)
        assert rows[i]["comp_bytes"] == comp
        assert rows[i]["ratio_milli"] == 1000 * comp // max(len(raw), 1)
    # repetitive text compresses harder than prose
    assert rows[0]["ratio_milli"] < rows[1]["ratio_milli"]


def test_event_lateness_out_of_order_branch(ray_session, tmp_path):
    """The synthetic events are fully in-order (bucket -1 only), so pin the
    LATE branch on a hand sequence: arrival order (event_id) disagrees
    with event time."""
    import pyarrow.parquet as pq
    import pandas as pd

    # user 1 arrivals: t=100s, t=40s (60s late -> bucket log2(6e7us)=25),
    #                  t=90s (10s late -> bucket log2(1e7us)=23), t=200s
    # user 2: single event (in order)
    us = [100_000_000, 40_000_000, 90_000_000, 200_000_000, 5]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 9], pa.int64()),
            "ts": pa.array(pd.to_datetime(us, unit="us")),
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["x"] * 5),
            "value": pa.array([0.0] * 5),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    from ontoea_ray.queries import QUERIES

    got = {r["bucket"]: r["n"] for r in QUERIES["q_event_lateness"](str(tmp_path)).take_all()}
    import math

    b60 = math.floor(math.log2(60_000_000))
    b10 = math.floor(math.log2(10_000_000))
    assert got == {-1: 3, b60: 1, b10: 1}
