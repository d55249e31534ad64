"""15K-tier parity band (the reference's primary benchmark scale,
/root/reference/code/README.md:122-145).

The full run takes ~1.5 h per trainer, so the band re-run is OPT-IN
(ONTOEA_RUN_15K=1); the recorded numbers live in BASELINE.md (raw JSONs:
/tmp/parity15k on the round-4 box, reproduced by scripts/parity_15k.py).
The always-on test here validates the runner end-to-end at a reduced tier
so the 15K entry point cannot rot between rounds."""

import json
import os
import subprocess
import sys

import pytest


def _run_parity(args, timeout):
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    r = subprocess.run(
        [sys.executable, "scripts/parity_15k.py", *args],
        capture_output=True, text=True, env=env, timeout=timeout,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_parity_runner_end_to_end_small_tier():
    """scripts/parity_15k.py end-to-end at a small tier: trains, evals,
    emits the full 4-block retest and the RSS record."""
    out = _run_parity(
        ["--entities", "200", "--epochs", "120", "--dim", "48",
         "--onto-dim", "24", "--shards", "2"],
        timeout=600,
    )
    assert out["mode"] == "sharded_k2_shard_init"
    assert set(out["retest"]) == {"forward", "reversed", "stable", "stable_csls"}
    assert out["test"]["hits"]["1"] > 30.0, out["test"]
    assert out["trainer_max_rss_gb"] < 2.0


@pytest.mark.skipif(
    not os.environ.get("ONTOEA_RUN_15K"),
    reason="full 15K tier takes ~1.5h; opt in with ONTOEA_RUN_15K=1 "
    "(recorded band: BASELINE.md round-4 section)",
)
def test_parity_15k_band_sharded():
    """The recorded 15K band, re-run: sharded shard_init trainer at the
    reference's own benchmark scale."""
    out = _run_parity(
        ["--entities", "15000", "--epochs", "400", "--dim", "128",
         "--onto-dim", "64"],
        timeout=3 * 3600,
    )
    t = out["test"]
    assert t["hits"]["1"] >= BAND_15K["hits1_min"], t
    assert t["mrr"] >= BAND_15K["mrr_min"], t
    assert out["retest"]["stable"]["precision_pct"] >= BAND_15K["stable_min"]
    assert out["trainer_max_rss_gb"] <= BAND_15K["rss_gb_max"]


# filled from the round-4 recorded runs (BASELINE.md); conservative floor
# recorded round-4 runs (PARITY15K_sharded.json / PARITY15K_dense.json):
# sharded Hits@1 93.25 / MRR 0.946 / stable 97.34% / RSS 1.01 GB;
# dense    Hits@1 93.18 / MRR 0.947 / stable 97.67% / RSS 0.62 GB.
# floors leave ~5 points of seed/noise headroom
BAND_15K = {
    "hits1_min": 88.0,
    "mrr_min": 0.90,
    "stable_min": 93.0,
    "rss_gb_max": 2.5,
}


BAND_100K = {
    # the 140-epoch mid-curve checkpoint recorded in PARITY100K.json
    # (Hits@1 50.1 / MRR 0.555 / RSS 13.2 GB; valid curve still climbing
    # — see BASELINE.md round-5): a regression below this band means the
    # sharded trainer stopped converging at the reference's second
    # published scale, not that it merely trained slower
    "hits1_min": 45.0,
    "mrr_min": 0.50,
    "rss_gb_max": 16.0,
}


@pytest.mark.skipif(
    not os.environ.get("ONTOEA_RUN_100K"),
    reason="full 100K tier takes ~3.3h; opt in with ONTOEA_RUN_100K=1 "
    "(recorded band: BASELINE.md round-5 section, PARITY100K.json)",
)
def test_parity_100k_band():
    """The recorded 100K band, re-run: sharded shard_init trainer at the
    reference's second published scale (run/args/ontoea_args_100K.json),
    140-epoch wall-clock-bounded checkpoint."""
    out = _run_parity(
        ["--entities", "100000", "--epochs", "140", "--dim", "128",
         "--onto-dim", "64", "--shards", "8"],
        timeout=5 * 3600,
    )
    t = out["test"]
    assert out["mode"] == "sharded_k8_shard_init"
    assert t["hits"]["1"] >= BAND_100K["hits1_min"], t
    assert t["mrr"] >= BAND_100K["mrr_min"], t
    assert out["trainer_max_rss_gb"] <= BAND_100K["rss_gb_max"]
    # the valid curve must be strictly climbing at this tier's checkpoint
    vh = out["valid_history"]
    assert len(vh) >= 3 and vh[-1] > vh[-2] > vh[-3]
