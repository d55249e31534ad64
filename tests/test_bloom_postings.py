"""Bloom semi-join superset semantics + inverted-postings roundtrip."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ontoea_ray.stages.bloom import bloom_semi_join, build_bloom

SF = "/root/testdata/sf0.001"


def _orders():
    return ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])


def _rich_customers():
    return ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], 5000)).select(["c_custkey"]),
        batch_format="pyarrow",
    )


def test_bloom_semi_join_is_superset_of_true_semi_join():
    out = bloom_semi_join(
        _orders(), _rich_customers(), probe_key="o_custkey", build_key="c_custkey"
    ).take_all()
    got_keys = {r["o_custkey"] for r in out}
    true_keys = {r["c_custkey"] for r in _rich_customers().take_all()}
    probe_keys = {r["o_custkey"] for r in _orders().take_all()}
    # no false negatives: every probe key actually in build survives
    assert (true_keys & probe_keys) <= got_keys
    # and the filter did something (not a pass-through) at this fill factor
    assert len(got_keys) < len(probe_keys)


def test_bloom_filter_deterministic():
    b1 = build_bloom(_rich_customers(), key_col="c_custkey")
    b2 = build_bloom(_rich_customers(), key_col="c_custkey")
    assert np.array_equal(b1, b2)


def test_postings_roundtrip_reconstructs_text():
    from ontoea_ray.functions.text import postings

    tbl = pa.table({"doc_id": pa.array([7, 9], pa.int64()),
                    "text": pa.array(["a b c", "x y"], pa.string())})
    out = postings(tbl["text"].combine_chunks(), np.asarray([7, 9], np.int64)).to_pandas()
    d7 = out[out.doc_id == 7].sort_values("pos")
    assert " ".join(d7.token) == "a b c" and d7.pos.tolist() == [0, 1, 2]
    d9 = out[out.doc_id == 9].sort_values("pos")
    assert " ".join(d9.token) == "x y"
