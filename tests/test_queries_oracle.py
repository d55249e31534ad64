"""Driver-style correctness gate: every SQL-backed query in
ontoea_ray.queries must match its DuckDB oracle on row count, schema and
order-insensitive values (sf0.01, like the driver's CORRECTNESS check)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ontoea_ray.queries import ORACLE_SQL, QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, ray.data.Dataset):
        res = pa.Table.from_pylist(res.take_all())
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, con):
    got = _canon(_to_df(QUERIES[name](SF_DIR)))
    exp = _canon(con.execute(ORACLE_SQL[name]).fetch_df())
    assert list(got.columns) == list(exp.columns), (list(got.columns), list(exp.columns))
    assert len(got) == len(exp), (len(got), len(exp))
    for col in got.columns:
        a, b = got[col], exp[col]
        # The driver hashes VALUES as typed arrays, so any dtype mismatch
        # (e.g. DuckDB HUGEINT -> float64 vs engine int64, or int32 vs
        # int64 width) is a failure even when the numbers are equal.
        # Compare exact dtypes for numerics, kinds for object/str.
        if a.dtype.kind in "iuf" or b.dtype.kind in "iuf":
            assert a.dtype == b.dtype, (
                f"column {col} dtype differs: engine={a.dtype} oracle={b.dtype}"
            )
        else:
            assert a.dtype.kind == b.dtype.kind, (
                f"column {col} dtype kind differs: engine={a.dtype} oracle={b.dtype}"
            )
        if a.dtype.kind in "fc":
            pd.testing.assert_series_equal(
                a.astype(float), b.astype(float), check_names=False, rtol=0, atol=1e-9
            )
        else:
            assert a.astype(str).tolist() == b.astype(str).tolist(), f"column {col} differs"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(name):
    got = _to_df(QUERIES[name](SF_DIR))
    assert got is not None
    assert len(got.columns) > 0
