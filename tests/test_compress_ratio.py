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
