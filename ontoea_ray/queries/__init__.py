"""Driver-checkable operator queries + DuckDB oracle SQL (package).

Split from the former 10k-line single module into domain modules; the
registry (QUERIES / ORACLE_SQL) lives in ``_core`` and every submodule
import below executes its ``@_register`` decorations.  All top-level names
of every submodule are hoisted into the package namespace so existing
``from ontoea_ray.queries import X`` imports keep working verbatim.
"""

from ontoea_ray.queries._core import (  # noqa: F401
    _KG_EDGE_CACHE,
    _kg_cached,
    _read,
    _register,
    ORACLE_SQL,
    QUERIES,
)

from ontoea_ray.queries import _core
from ontoea_ray.queries import relational
from ontoea_ray.queries import kg_edges
from ontoea_ray.queries import text
from ontoea_ray.queries import dedup
from ontoea_ray.queries import ann
from ontoea_ray.queries import flagship
from ontoea_ray.queries import ordering
from ontoea_ray.queries import graph
from ontoea_ray.queries import reshape
from ontoea_ray.queries import profiling
from ontoea_ray.queries import stats
from ontoea_ray.queries import mixed
from ontoea_ray.queries import weblinks
from ontoea_ray.queries import retrieval
from ontoea_ray.queries import audit
from ontoea_ray.queries import composites

import sys as _sys

_pkg = _sys.modules[__name__]
_submods = [_core, composites, relational, kg_edges, text, dedup, ann, flagship, ordering, graph, reshape, profiling, stats, mixed, weblinks, retrieval, audit]
for _m in _submods:
    for _k in vars(_m):
        if not _k.startswith("__"):
            setattr(_pkg, _k, getattr(_m, _k))
# re-pin submodule attributes in case a hoisted name collided with one
for _m in _submods:
    setattr(_pkg, _m.__name__.rsplit(".", 1)[1], _m)
del _sys, _pkg, _m, _k, _submods
