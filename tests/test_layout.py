"""stages/layout.py — Morton interleave + locality property."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.layout import column_ranges, interleave_bits, zorder_value


def test_interleave_bits_known_values():
    x = np.array([0, 1, 0, 1, 3, 255], np.int64)
    y = np.array([0, 0, 1, 1, 5, 255], np.int64)
    z = interleave_bits(x, y, 8)
    # x bits land even, y bits odd: (1,0)->1, (0,1)->2, (1,1)->3,
    # (3,5)=(011,101)b -> z=100111b=39, (255,255)->65535
    assert z.tolist() == [0, 1, 2, 3, 39, 65535]


def test_zorder_tile_locality(ray_session):
    # after sorting by zv, each 16x16-grid tile is one contiguous run and
    # its 2-D bounding box is tight (<= 1/16 of each axis range)
    rng = np.random.default_rng(5)
    n = 4096
    tbl = pa.table(
        {
            "x": pa.array(rng.integers(0, 100_000, n), pa.int64()),
            "y": pa.array(rng.integers(50, 777, n), pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    ranges = column_ranges(ds, ["x", "y"])
    z = zorder_value(ds, x_col="x", y_col="y", ranges=ranges, bits=8)
    rows = z.sort("zv").take_all()
    tiles = [r["zv"] >> 8 for r in rows]
    assert tiles == sorted(tiles)  # contiguous runs after the z sort
    spanx = ranges["x"][1] - ranges["x"][0] + 1
    spany = ranges["y"][1] - ranges["y"][0] + 1
    by_tile: dict[int, list] = {}
    for r, t in zip(rows, tiles):
        by_tile.setdefault(t, []).append((r["x"], r["y"]))
    for t, pts in by_tile.items():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        # a tile is a 16x16 grid cell -> each axis box <= ceil(span/16)
        assert max(xs) - min(xs) <= (spanx + 15) // 16
        assert max(ys) - min(ys) <= (spany + 15) // 16


def test_compaction_plan_properties(ray_session):
    from ontoea_ray.stages.layout import compaction_plan

    rng = np.random.default_rng(2)
    keys = [f"k{i:03d}" for i in range(40)]
    sizes = rng.integers(100, 5000, 40)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys), "bytes": pa.array(sizes, pa.int64())})
    ).repartition(5)
    plan = compaction_plan(ds, key_cols=["k"], bytes_col="bytes", target_bytes=6000)
    rows = sorted(
        ((r["k"], r["bytes"], r["bucket"]) for r in plan.take_all())
    )
    # buckets are nondecreasing in key order (contiguous ranges)
    bks = [b for _, _, b in rows]
    assert bks == sorted(bks)
    # bucket count bounded by total/target + 1 (the point of compaction)
    total = sum(by for _, by, _ in rows)
    assert len({b for _, _, b in rows}) <= total // 6000 + 1
    # replay: bucket = cumulative start offset // target
    cum = 0
    for _, by, b in rows:
        assert b == cum // 6000
        cum += by


def test_range_bounds_empty_sample_degenerates(ray_session):
    # a denom larger than any sampled hash leaves the deterministic sample
    # empty; bounds must degenerate to "no boundaries" (every row range 0),
    # matching the SQL oracle's NULL-bounds behavior — not IndexError
    from ontoea_ray.stages.layout import range_partition_stats, sample_range_bounds

    tbl = pa.table(
        {
            "v": pa.array(np.arange(100, dtype=np.int64)),
            "rk": pa.array(np.arange(1, 101, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    b = sample_range_bounds(ds, col="v", key_col="rk", n_ranges=8, denom=10**9)
    assert len(b) == 0
    stats = range_partition_stats(ds, col="v", key_col="rk", n_ranges=8, denom=10**9)
    rows = stats.take_all()
    assert len(rows) == 1 and rows[0]["range_id"] == 0
    assert rows[0]["n_rows"] == 100
