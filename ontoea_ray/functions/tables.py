"""Arrow table interop helpers.

``pa.Table.from_pandas`` embeds a ``b'pandas'`` metadata blob (a dict) in
the schema; Ray Data's block-schema deduplication then fails to hash the
schema and logs ``Failed to hash the schemas (for deduplication)`` on every
wide op.  Route all pandas->Arrow conversions through :func:`from_pandas`,
which strips the metadata so schemas hash and dedup cleanly.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_pandas(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
