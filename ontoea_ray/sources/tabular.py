"""General tabular sources/sinks beyond Parquet: CSV and JSONL.

The reference's inputs are bespoke text files (kg_files.py); a complete
engine also ingests the two interchange formats web corpora actually
arrive in.  Thin, deliberately boring wrappers over Ray Data's native
readers — the value is the CONTRACT: column pruning at the read, explicit
Arrow schema (no per-block re-inference drift), and metadata-free blocks
so downstream wide ops dedup schemas.

At 100 TB: both readers stream per-file blocks exactly like read_parquet;
CSV/JSONL cannot prune COLUMNS at the byte level the way Parquet does, so
the projection here saves object-store and shuffle bytes, not I/O — the
docstring of each pipeline should prefer Parquet for hot paths and treat
these as ingest/export formats.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data


def read_csv_table(
    path: str,
    *,
    columns: list[str] | None = None,
    schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """CSV -> Dataset with projection pushed into the Arrow CSV reader
    (unused columns are dropped at parse time, before blocks form)."""
    convert = pacsv.ConvertOptions(
        include_columns=columns or None,
        column_types=dict(zip(schema.names, schema.types)) if schema else None,
    )
    ds = ray.data.read_csv(path, convert_options=convert)
    return ds.map_batches(
        lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
    )


def read_jsonl_table(
    path: str,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """JSON-lines -> Dataset; projection applied immediately after parse
    (JSONL has no columnar layout to push into)."""
    ds = ray.data.read_json(path)
    if columns:
        cols = list(columns)
        ds = ds.map_batches(
            lambda b: b.select(cols).replace_schema_metadata(None),
            batch_format="pyarrow",
        )
    else:
        ds = ds.map_batches(
            lambda b: b.replace_schema_metadata(None), batch_format="pyarrow"
        )
    return ds


def write_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Dataset -> newline-delimited JSON files (one per block)."""
    ds.write_json(out_dir)


def write_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Dataset -> CSV files (one per block, header per file)."""
    ds.write_csv(out_dir)
