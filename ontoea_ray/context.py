"""Ray Data execution-context tuning shared by pipelines, tests and bench.

Centralising the knobs keeps every entry point (driver, bench.py, pytest)
on the same block-size / ordering policy.  Never calls ``ray.init``.
"""

from __future__ import annotations

import os


def tune_data_context(*, preserve_order: bool = False, quiet: bool = True) -> None:
    """Apply scale-oriented DataContext defaults.

    - 16 MiB target blocks (override via ``ONTOEA_TARGET_BLOCK_MB``): the
      flagship's fan-out produces text-heavy rows where 128 MiB blocks give
      too few parallel units for the actor pool (measured: 64 blocks of
      50 MB left a 26-actor pool ~40% idle at 10M pages; 16 MiB blocks cut
      flagship wall-clock 26.7s -> 16.9s at 32 CPUs);
    - unordered streaming execution unless an operator needs order;
    - progress bars off for clean JSON-emitting bench/driver output.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    block_mb = int(os.environ.get("ONTOEA_TARGET_BLOCK_MB", "16"))
    ctx.target_max_block_size = block_mb * 1024 * 1024
    # NOTE: the default sort-based shuffle is kept.  HASH_SHUFFLE spawns one
    # HashShuffleAggregator actor per partition, which starves small
    # sessions (observed: 69 aggregator actors on a 4-CPU pytest session).
    # Key co-location for bucket-pair stages is done with an explicit
    # pkey = hash(key) % width partition column instead (stages/dedup.py).
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
