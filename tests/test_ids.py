"""Frequency-rank id assignment: distributed result vs exact reference
semantics (sort by (freq, uri) desc; interleave KG1 even / KG2 odd with tail
offsets — SURVEY.md §2.3)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.state.ids import (
    element_frequencies,
    interleaved_ids,
    rank_by_frequency,
    token_frequencies,
    zip_with_index,
)


def _ranked_table(ds):
    return pa.Table.from_pylist(ds.take_all()).sort_by("rank")


def test_token_frequencies_vs_duckdb(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    got = pa.Table.from_pylist(token_frequencies(docs).take_all()).sort_by("token")
    exp = duckdb.sql(
        f"""
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest(str_split(text, ' ')) AS token
              FROM '{sf_dir}/documents.parquet')
        GROUP BY token ORDER BY token
        """
    ).arrow()
    assert got.column("token").to_pylist() == exp.column("token").to_pylist()
    assert got.column("freq").to_pylist() == exp.column("freq").to_pylist()


def test_zip_with_index_order():
    ds = ray.data.from_items([{"x": i} for i in range(100)]).repartition(7)
    srt = ds.sort("x", descending=True)
    out = pa.Table.from_pylist(zip_with_index(srt, "rank").take_all()).sort_by("rank")
    xs = out.column("x").to_pylist()
    assert xs == sorted(range(100), reverse=True)
    assert out.column("rank").to_pylist() == list(range(100))


def _reference_order(pairs):
    """Pure-python re-statement of the reference total order
    (freq desc, uri desc) for oracle comparison."""
    return [u for u, f in sorted(pairs.items(), key=lambda x: (x[1], x[0]), reverse=True)]


def test_rank_and_interleave_match_reference_semantics():
    tri1 = [("a", "r1", "b"), ("a", "r1", "c"), ("b", "r2", "c"), ("d", "r1", "a")]
    tri2 = [("x", "s1", "y"), ("x", "s1", "z"), ("y", "s2", "x"), ("y", "s1", "w"), ("q", "s3", "w")]
    ds1 = ray.data.from_items([{"subj": s, "pred": p, "obj": o} for s, p, o in tri1])
    ds2 = ray.data.from_items([{"subj": s, "pred": p, "obj": o} for s, p, o in tri2])
    r1 = _ranked_table(rank_by_frequency(element_frequencies(ds1, ("subj", "obj"))))
    r2 = _ranked_table(rank_by_frequency(element_frequencies(ds2, ("subj", "obj"))))

    # frequency dicts the reference would compute
    def freqs(tri):
        d = {}
        for s, _, o in tri:
            d[s] = d.get(s, 0) + 1
            d[o] = d.get(o, 0) + 1
        return d

    exp1, exp2 = _reference_order(freqs(tri1)), _reference_order(freqs(tri2))
    assert r1.column("uri").to_pylist() == exp1
    assert r2.column("uri").to_pylist() == exp2

    ids1, ids2 = interleaved_ids(r1, r2)
    # reference interleave arithmetic, re-derived
    n1, n2 = len(exp1), len(exp2)
    expected1, expected2 = {}, {}
    for i in range(max(n1, n2)):
        if i < n1 and i < n2:
            expected1[exp1[i]] = 2 * i
            expected2[exp2[i]] = 2 * i + 1
        elif i >= n1:
            expected2[exp2[i]] = n1 * 2 + (i - n1)
        else:
            expected1[exp1[i]] = n2 * 2 + (i - n2)
    assert ids1 == expected1
    assert ids2 == expected2
    # dense, disjoint, complete
    allv = sorted(list(ids1.values()) + list(ids2.values()))
    assert allv == list(range(n1 + n2))


def test_zip_with_index_skips_empty_blocks(ray_session):
    """A zero-row (possibly zero-column) block from an empty sort partition
    must not poison the output schema: every payload column stays visible
    to downstream schema probes (regression: rank-only schema hid `uri`
    from the entity-merge joins at sf0.1)."""
    import pyarrow as pa
    import ray.data

    from ontoea_ray.state.ids import zip_with_index

    blocks = [
        pa.table({"uri": pa.array([], pa.string())}).select([]),  # zero-col empty
        pa.table({"uri": pa.array(["a", "b"], pa.string())}),
        pa.table({"uri": pa.array([], pa.string())}),             # typed empty
        pa.table({"uri": pa.array(["c"], pa.string())}),
    ]
    ds = ray.data.from_arrow(blocks)
    out = zip_with_index(ds, "nid")
    assert set(out.schema().names) == {"uri", "nid"}
    rows = sorted(out.take_all(), key=lambda r: r["nid"])
    assert [r["uri"] for r in rows] == ["a", "b", "c"]
    assert [r["nid"] for r in rows] == [0, 1, 2]
