"""Ray Data execution-context tuning shared by pipelines, tests and bench.

Centralising the knobs keeps every entry point (driver, bench.py, pytest)
on the same block-size / ordering policy.  Never calls ``ray.init``.
"""

from __future__ import annotations

import os


def tune_data_context(*, preserve_order: bool = False, quiet: bool = True) -> None:
    """Apply scale-oriented DataContext defaults.

    - default 128 MiB target blocks (Ray default) — overridable via
      ``ONTOEA_TARGET_BLOCK_MB`` for wide-binary (html) workloads;
    - unordered streaming execution unless an operator needs order;
    - progress bars off for clean JSON-emitting bench/driver output.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    block_mb = int(os.environ.get("ONTOEA_TARGET_BLOCK_MB", "128"))
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
