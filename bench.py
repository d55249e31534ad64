"""Benchmark harness (driver-run per round; also `--scaling`).

Plain run: one Ray session at $RAY_GRAFT_CPUS (default 32) over $GRAFT_SF_DIR
(default /root/testdata/sf0.1); times the flagship KG-construction pipeline
plus representative operator queries; prints ONE JSON line.

`--scaling`: runs the plain bench twice in FRESH processes at num_cpus=8 and
32 on the same input and reports both throughputs plus scaling efficiency
(the in-sandbox evidence for the north_rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "q_pricing_summary",
    "q_top_customers",
    "q_events_hourly",
    "q_sessionize",
    "q_term_freq",
    "q_dedup_exact",
    "q_minhash_lsh",
    "q_simhash",
    "q_ann_topk",
    "q_langid",
]


def _consume(res) -> int:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += len(b)
        return n
    return len(res)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ontoea_ray.context import tune_data_context

    tune_data_context()
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
    from ontoea_ray.queries import QUERIES

    # warm OS page cache AND the Ray worker pool (untimed) so timings
    # measure compute + shuffle, not process cold-start
    import pyarrow.parquet as pq

    for t in ("documents", "lineitem", "orders", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")
    import ray.data as _rd

    _rd.range(NUM_CPUS * 1000, override_num_blocks=NUM_CPUS).map_batches(lambda b: b).materialize()

    t0 = time.time()
    triples = kg_construct_pipeline(SF_DIR)
    n_triples = _consume(triples)
    flagship_sec = time.time() - t0

    n_pages = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows

    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(QUERIES[name](SF_DIR))
        q_times[name] = round(time.time() - t0, 3)

    result = {
        "metric": "flagship_kg_construct_seconds",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "rows_out": n_triples,
        "pages_per_sec": round(n_pages / flagship_sec, 1),
        "triples_per_sec": round(n_triples / flagship_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = one(8), one(32)
    total_lo = lo["value"] + sum(lo["queries"].values())
    total_hi = hi["value"] + sum(hi["queries"].values())
    eff = (total_lo / total_hi) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": round(total_lo, 3),
        "sec_32": round(total_hi, 3),
        "flagship_sec_8": lo["value"],
        "flagship_sec_32": hi["value"],
        "triples_per_sec_8": lo["triples_per_sec"],
        "triples_per_sec_32": hi["triples_per_sec"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
