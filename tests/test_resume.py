"""Resumability (north_rule): restart after partial failure -> identical
final output, completed partitions skipped."""

import json
import os

import pyarrow as pa
import ray.data

from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline, write_edge_table


def _read_sorted(out):
    tbl = pa.Table.from_pylist(ray.data.read_parquet(out).take_all())
    return tbl.sort_by([("subj", "ascending"), ("pred", "ascending"), ("obj", "ascending")])


def test_resume_skips_completed_partitions(sf_dir, tmp_path):
    triples = kg_construct_pipeline(sf_dir, concurrency=2, batch_size=256)
    full = str(tmp_path / "full")
    write_edge_table(triples, full, num_buckets=4)
    expected = _read_sorted(full)

    # simulate a crash after 2 of 4 partitions: keep those files + a partial
    # manifest, delete the rest
    partial = str(tmp_path / "partial")
    os.makedirs(partial)
    for p in range(4):
        src = os.path.join(full, f"part={p}")
        if p < 2:
            os.system(f"cp -r {src} {partial}/")
    with open(os.path.join(partial, "_manifest.json"), "w") as f:
        json.dump(
            {
                "partitions": {
                    "0": {"rows": 0, "complete": True},
                    "1": {"rows": 0, "complete": True},
                },
                "num_buckets": 4,
            },
            f,
        )

    # restart the job into the partially-written directory
    triples2 = kg_construct_pipeline(sf_dir, concurrency=2, batch_size=256)
    manifest = write_edge_table(triples2, partial, num_buckets=4)
    assert manifest["partitions"]["0"]["resumed"] is True
    assert manifest["partitions"]["3"]["resumed"] is False

    got = _read_sorted(partial)
    assert got.column("subj").to_pylist() == expected.column("subj").to_pylist()
    assert got.column("pred").to_pylist() == expected.column("pred").to_pylist()
    assert got.column("obj").to_pylist() == expected.column("obj").to_pylist()

    # the skipped buckets kept their original files (no rewrite): exactly
    # one parquet file set from the first run
    first_run_files = sorted(os.listdir(os.path.join(full, "part=0")))
    resumed_files = sorted(os.listdir(os.path.join(partial, "part=0")))
    assert resumed_files == first_run_files


def test_scan_checkpoint_resumes_without_rescan(sf_dir, tmp_path, monkeypatch):
    """Mid-pipeline checkpoint: with a complete scan checkpoint on disk, a
    restarted construct_kg never touches the corpus scan — proven by making
    the scan stage raise on the second run."""
    from ontoea_ray.pipelines.kg_construct import bootstrap_linker_cached, construct_kg
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.scan_link import ScanAndLink

    state = bootstrap_linker_cached(sf_dir)
    ckpt = str(tmp_path / "scan_ckpt")

    def run():
        return construct_kg(
            pages_from_documents(sf_dir), state,
            concurrency=2, batch_size=256, checkpoint_dir=ckpt,
        )

    first = {(r["subj"], r["pred"], r["obj"], r["n_mentions"]) for r in run().take_all()}
    assert os.path.exists(os.path.join(ckpt, "_SCAN_COMPLETE"))

    def boom(self, batch):
        raise AssertionError("scan ran despite complete checkpoint")

    monkeypatch.setattr(ScanAndLink, "__call__", boom)
    second = {(r["subj"], r["pred"], r["obj"], r["n_mentions"]) for r in run().take_all()}
    assert second == first


def test_pagerank_round_checkpoint_resume(ray_session, tmp_path):
    """A pagerank interrupted after round 2 resumes from the checkpoint and
    produces output bit-identical to an uninterrupted run."""
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.graph import pagerank

    tbl = pa.table(
        {
            "subj": [f"n{i}" for i in range(60)],
            "obj": [f"n{(i * 7 + 3) % 60}" for i in range(60)],
        }
    )
    e = ray.data.from_arrow(tbl)
    want = {r["node"]: r["rank_units"] for r in pagerank(e, iters=4).take_all()}

    ckpt = str(tmp_path / "pr")
    s1: dict = {}
    partial = pagerank(e, iters=2, checkpoint_dir=ckpt, stats=s1)
    partial.count()  # consume: rounds 1-2 checkpointed
    assert s1["rounds_run"] == 2

    s2: dict = {}
    resumed = {
        r["node"]: r["rank_units"]
        for r in pagerank(e, iters=4, checkpoint_dir=ckpt, stats=s2).take_all()
    }
    assert s2["rounds_run"] == 2  # rounds 3-4 only — 1-2 came from disk
    assert resumed == want
