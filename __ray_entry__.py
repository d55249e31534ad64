"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 (plus the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible one.  Column names match
between the two on purpose (the driver hashes values after sorting columns
by name).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ontoea_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ontoea_ray.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages -> extract ->
    mention scan -> ontology-aware link -> canonicalize -> dedup edges."""
    from ontoea_ray.context import tune_data_context
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline

    tune_data_context()
    return kg_construct_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
