"""CLI entry point (`python -m ontoea_ray`) — the ray-job-submit surface."""

import json
import os
import subprocess
import sys

import pytest

from ontoea_ray.sources import fixtures as FX


@pytest.fixture(scope="module")
def cli_inputs(tmp_path_factory, ray_session):
    tmp = tmp_path_factory.mktemp("cli")
    kg = FX.generate_fixture_kg(n_entities=60, seed=42)
    pages, _ = FX.generate_fixture_pages(kg, n_pages=60, seed=7)
    FX.fixture_pages_dataset(pages).write_parquet(str(tmp / "pages"))
    FX.write_reference_layout(kg, str(tmp / "kg"))
    return tmp


def _run(args):
    env = dict(os.environ, PYTHONPATH=os.getcwd())
    return subprocess.run(
        [sys.executable, "-m", "ontoea_ray", *args],
        capture_output=True, text=True, env=env, timeout=240,
    )


def test_cli_construct(cli_inputs):
    out = cli_inputs / "edges"
    r = _run(["construct", "--pages", str(cli_inputs / "pages"), "--out", str(out), "--num-buckets", "2"])
    assert r.returncode == 0, r.stderr[-500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["total_rows"] > 0
    assert (out / "_manifest.json").exists()


def test_cli_align(cli_inputs):
    r = _run(["align", "--data", str(cli_inputs / "kg"), "--dim", "16", "--onto-dim", "8", "--max-epoch", "10"])
    assert r.returncode == 0, r.stderr[-500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "hits" in payload and "mrr" in payload


def test_cli_align_sharded(cli_inputs):
    r = _run([
        "align", "--data", str(cli_inputs / "kg"), "--dim", "16", "--onto-dim", "8",
        "--max-epoch", "10", "--shards", "2", "--shard-init",
    ])
    assert r.returncode == 0, r.stderr[-500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert "hits" in payload and "mrr" in payload


def test_cli_increment(cli_inputs, tmp_path):
    """construct a base edge table, then merge the same pages as an
    increment: every base edge doubles its evidence (status=changed),
    total rows unchanged, and the merged sink carries a complete
    manifest."""
    base_out = str(tmp_path / "base_edges")
    r1 = _run(["construct", "--pages", str(cli_inputs / "pages"), "--out", base_out])
    assert r1.returncode == 0, r1.stderr[-2000:]
    base = json.loads(r1.stdout.strip().splitlines()[-1])

    inc_out = str(tmp_path / "merged_edges")
    r2 = _run([
        "increment", "--base-edges", base_out,
        "--pages", str(cli_inputs / "pages"), "--out", inc_out,
    ])
    assert r2.returncode == 0, r2.stderr[-2000:]
    got = json.loads(r2.stdout.strip().splitlines()[-1])
    assert got["total_rows"] == base["total_rows"]
    assert got["added"] == 0
    assert got["changed"] == base["total_rows"]
