"""CLI entry point — the script a user submits with ``ray job submit``.

    python -m ontoea_ray construct --pages <parquet-or-dir> --out <dir>
        [--num-buckets 16] [--concurrency N] [--batch-size 2048]
    python -m ontoea_ray align --data <reference-layout-dir>
        [--dim 96] [--onto-dim 48] [--max-epoch 200] [--out <artifact-dir>]
    python -m ontoea_ray increment --base-edges <dir> --pages <parquet-or-dir>
        --out <dir> [--gazetteer-pages <parquet-or-dir>]

``construct`` runs the flagship pages -> edge-table pipeline against an
existing pages Parquet table (input_hint schema) and writes the resumable
bucketed sink + manifest.  ``align`` runs the OntoEA parity track on an
OpenEA-style benchmark directory and prints the fused Hits@k/MR/MRR.

Owns a Ray session only when none exists (so the same module works under
``ray job submit``, which pre-initialises, and standalone).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ontoea_ray.context import tune_data_context

    tune_data_context()


def cmd_construct(args) -> int:
    _ensure_ray()
    import ray

    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_from_corpus,
        construct_kg,
        write_edge_table,
    )
    from ontoea_ray.sources.pages import read_pages
    from ontoea_ray.stages.extract import extract_text_stage

    pages = read_pages(args.pages)
    state = bootstrap_linker_from_corpus(extract_text_stage(read_pages(args.pages)))
    triples = construct_kg(
        pages, state,
        concurrency=args.concurrency, batch_size=args.batch_size,
    )
    manifest = write_edge_table(
        triples, args.out, num_buckets=args.num_buckets,
        lineage={"pages": args.pages, "argv": sys.argv[1:]},
    )
    print(json.dumps({"out": args.out, "total_rows": manifest["lineage"]["total_rows"],
                      "partitions": len(manifest["partitions"])}))
    ray.shutdown()
    return 0


def cmd_align(args) -> int:
    _ensure_ray()
    import ray

    from ontoea_ray.pipelines.kg_parity import load_train_data, run_parity
    from ontoea_ray.pipelines.training import (
        OntoEAConfig,
        OntoEATrainer,
        ShardedOntoEATrainer,
    )

    cfg = OntoEAConfig(dim=args.dim, onto_dim=args.onto_dim, max_epoch=args.max_epoch)
    if args.out or args.shards:
        data = load_train_data(args.data)
        if args.shards:
            # parameter-server entity table: scatter mode keeps dense
            # bit-parity; --shard-init never materializes the table
            trainer = ShardedOntoEATrainer(
                data, cfg, num_shards=args.shards, shard_init=args.shard_init
            )
        else:
            trainer = OntoEATrainer(data, cfg)
        res = trainer.run()
        if args.out:
            from ontoea_ray.sources.artifacts import save_trainer_artifacts

            save_trainer_artifacts(trainer, args.out)
    else:
        res = run_parity(args.data, cfg)
    print(json.dumps(res["test"]))
    ray.shutdown()
    return 0


def cmd_increment(args) -> int:
    """Incremental ingest: merge a new crawl increment into an existing
    partitioned edge table (the q_kg_increment contract as a job).

    Reads the base snapshot back from its resumable sink, constructs the
    increment's edge table with the SAME gazetteer discipline (state from
    --gazetteer-pages, default the increment pages), kg_upsert-merges
    (SUM evidence / MIN provenance), writes the merged sink + manifest,
    and prints added/changed/total counts from kg_diff."""
    _ensure_ray()
    import pyarrow.compute as pc
    import ray

    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_from_corpus,
        construct_kg,
        kg_diff,
        kg_upsert,
        write_edge_table,
    )
    from ontoea_ray.sources.pages import read_pages
    from ontoea_ray.stages.extract import extract_text_stage

    base = (
        ray.data.read_parquet(args.base_edges)
        .drop_columns(["part"])
        .materialize()  # consumed twice: merge + diff baseline
    )
    gaz_src = args.gazetteer_pages or args.pages
    state = bootstrap_linker_from_corpus(extract_text_stage(read_pages(gaz_src)))
    inc = construct_kg(
        read_pages(args.pages), state,
        concurrency=args.concurrency, batch_size=args.batch_size,
    )
    merged = kg_upsert(base, inc).materialize()
    d = kg_diff(base, merged)
    status = {}
    for row in (
        d.map_batches(
            lambda b: b.select(["status"]), batch_format="pyarrow"
        ).take_all()
    ):
        status[row["status"]] = status.get(row["status"], 0) + 1
    manifest = write_edge_table(
        merged, args.out, num_buckets=args.num_buckets,
        lineage={
            "base_edges": args.base_edges, "increment_pages": args.pages,
            "argv": sys.argv[1:],
        },
    )
    print(json.dumps({
        "out": args.out,
        "total_rows": manifest["lineage"]["total_rows"],
        "added": status.get("added", 0),
        "changed": status.get("changed", 0),
        "partitions": len(manifest["partitions"]),
    }))
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ontoea_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("construct", help="pages parquet -> partitioned edge table")
    c.add_argument("--pages", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--num-buckets", type=int, default=16)
    c.add_argument("--concurrency", type=int, default=None)
    c.add_argument("--batch-size", type=int, default=2048)
    c.set_defaults(fn=cmd_construct)

    a = sub.add_parser("align", help="OntoEA training + eval on a benchmark dir")
    a.add_argument("--data", required=True)
    a.add_argument("--dim", type=int, default=96)
    a.add_argument("--onto-dim", type=int, default=48)
    a.add_argument("--max-epoch", type=int, default=200)
    a.add_argument("--out", default=None)
    a.add_argument("--shards", type=int, default=0,
                   help="shard the entity table across N parameter-server actors")
    a.add_argument("--shard-init", action="store_true",
                   help="initialize rows shard-side (table never dense anywhere)")
    a.set_defaults(fn=cmd_align)

    i = sub.add_parser(
        "increment", help="merge a crawl increment into an existing edge table"
    )
    i.add_argument("--base-edges", required=True,
                   help="partitioned edge-table dir written by `construct`")
    i.add_argument("--pages", required=True, help="increment pages parquet")
    i.add_argument("--gazetteer-pages", default=None,
                   help="pages corpus for the gazetteer prepass (default: --pages)")
    i.add_argument("--out", required=True)
    i.add_argument("--num-buckets", type=int, default=16)
    i.add_argument("--concurrency", type=int, default=None)
    i.add_argument("--batch-size", type=int, default=2048)
    i.set_defaults(fn=cmd_increment)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
