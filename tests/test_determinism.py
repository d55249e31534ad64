"""Determinism across parallelism levels (SURVEY §4/§7.4): the same inputs
must yield identical results regardless of block/batch/actor configuration."""

import pyarrow as pa
import ray.data

from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline
from ontoea_ray.state.ids import element_frequencies, rank_by_frequency


def _triple_set(ds):
    return {(r["subj"], r["pred"], r["obj"], r["n_mentions"]) for r in ds.take_all()}


def test_flagship_invariant_to_parallelism(sf_dir):
    a = _triple_set(kg_construct_pipeline(sf_dir, concurrency=1, batch_size=2048))
    b = _triple_set(kg_construct_pipeline(sf_dir, concurrency=3, batch_size=97))
    assert a == b


def test_rank_invariant_to_block_structure():
    tri = [("e%d" % (i % 7), "r", "e%d" % (i % 3)) for i in range(200)]
    rows = [{"subj": s, "pred": p, "obj": o} for s, p, o in tri]
    for nblocks in (1, 4, 13):
        ds = ray.data.from_items(rows).repartition(nblocks)
        ranked = pa.Table.from_pylist(
            rank_by_frequency(element_frequencies(ds, ("subj", "obj"))).take_all()
        ).sort_by("rank")
        if nblocks == 1:
            expect = ranked.column("uri").to_pylist()
        else:
            assert ranked.column("uri").to_pylist() == expect
