"""15K-tier OntoEA parity run (the reference's own primary benchmark scale,
/root/reference/code/README.md:122-145, run/args/ontoea_args_15K.json):
train + align a 15K-entity-per-KG OpenEA-style fixture end-to-end through
the sharded parameter-server trainer (shard_init=True — the entity table
never exists densely in any process) or the dense trainer (--dense), then
re-run the reference's full 4-block retest (forward / reversed / stable /
stable+CSLS) from saved artifacts.

Emits ONE JSON line: config, wall times, trainer-actor max-RSS, test
metrics and the retest blocks.  Results are recorded in BASELINE.md; the
metric band is pinned (at a reduced-epoch schedule) in
tests/test_training.py.

Usage:
    python scripts/parity_15k.py [--entities 15000] [--epochs 120]
                                 [--dense] [--dim 128] [--shards 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=15000)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--onto-dim", type=int, default=64)
    ap.add_argument("--dense", action="store_true")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            logging_level="ERROR",
            log_to_driver=False,
        )

    from ontoea_ray.pipelines.training import OntoEAConfig
    from ontoea_ray.sources import fixtures as FX

    t0 = time.time()
    kg = FX.generate_fixture_kg(n_entities=args.entities, seed=args.seed)
    root = tempfile.mkdtemp(prefix=f"ontoea_{args.entities}_")
    FX.write_reference_layout(kg, root)
    gen_sec = round(time.time() - t0, 1)

    # reference-shaped schedule (ontoea_args_15K.json): ent batch 4500,
    # early stop on valid Hits@1; dims reduced from the reference's 300 to
    # keep the numpy trainer's wall time in sandbox range (the metric
    # contract is Hits@k/MRR band parity, not wall-time parity)
    cfg = OntoEAConfig(
        dim=args.dim,
        onto_dim=args.onto_dim,
        max_epoch=args.epochs,
        sub_epoch=10,
        start_valid=40,
        eval_freq=2,
        batch_size=4500,
        neg_triple_num=10,
        seed=args.seed,
    )

    @ray.remote(num_cpus=1)
    class ParityRunner:
        """Hosts the trainer so its process max-RSS is the trainer heap."""

        def run(self, root: str, cfg, dense: bool, shards: int) -> dict:
            import resource

            from ontoea_ray.pipelines.kg_parity import load_train_data
            from ontoea_ray.pipelines.training import (
                OntoEATrainer,
                ShardedOntoEATrainer,
            )
            from ontoea_ray.sources.artifacts import retest, save_trainer_artifacts

            t0 = time.time()
            data = load_train_data(root)
            load_sec = round(time.time() - t0, 1)
            t0 = time.time()
            if dense:
                trainer = OntoEATrainer(data, cfg)
            else:
                trainer = ShardedOntoEATrainer(
                    data, cfg, num_shards=shards, shard_init=True
                )
            res = trainer.run()
            train_sec = round(time.time() - t0, 1)
            t0 = time.time()
            art = tempfile.mkdtemp(prefix="ontoea_art_")
            save_trainer_artifacts(trainer, art)
            blocks = retest(art, full=True)
            retest_sec = round(time.time() - t0, 1)
            # per-pair alignment / matching lists are tier-sized — keep the
            # JSON line metric-only
            for blk in blocks.values():
                blk.pop("alignment", None)
                blk.pop("matching", None)
            return {
                "load_sec": load_sec,
                "train_sec": train_sec,
                "retest_sec": retest_sec,
                "trainer_max_rss_gb": round(
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2
                ),
                "test": res["test"],
                "valid_history": res["valid_history"],
                "retest": blocks,
                "num_entities": data.num_entities,
                "num_relations": data.num_relations,
            }

    runner = ParityRunner.remote()
    out = ray.get(
        runner.run.remote(root, cfg, args.dense, args.shards), timeout=4 * 3600
    )
    out.update(
        {
            "tier": args.entities,
            "mode": "dense" if args.dense else f"sharded_k{args.shards}_shard_init",
            "dim": args.dim,
            "onto_dim": args.onto_dim,
            "max_epoch": args.epochs,
            "fixture_gen_sec": gen_sec,
        }
    )
    print(json.dumps(out))
    sys.stdout.flush()
    ray.shutdown()


if __name__ == "__main__":
    main()
