"""OntoEA trainer parity: metric-level Hits@1/MRR on the fixture splits
(BASELINE.md alignment-quality target), gradient sanity, augmentation ops."""

import numpy as np
import pytest
import ray.data

from ontoea_ray.pipelines.training import OntoEAConfig, OntoEATrainer
from ontoea_ray.sources import fixtures as FX
from ontoea_ray.stages.augment import (
    generate_sup_attribute_triples,
    generate_sup_cv_links,
    generate_sup_relation_triples,
)


@pytest.fixture(scope="module")
def parity_result(tmp_path_factory):
    from ontoea_ray.pipelines.kg_parity import run_parity

    kg = FX.generate_fixture_kg(n_entities=120, seed=42)
    root = str(tmp_path_factory.mktemp("parity_kg"))
    FX.write_reference_layout(kg, root)
    cfg = OntoEAConfig(
        dim=64, onto_dim=32, max_epoch=300, sub_epoch=10, start_valid=100,
        eval_freq=2, batch_size=512, neg_triple_num=10,
    )
    return run_parity(root, cfg, as_actor=True)


def test_alignment_quality_on_fixture(parity_result):
    """Alignment-quality gate: the joint embedding + ontology model must
    align the held-out test pairs far above chance on the correlated
    fixture (reference quality contract, metric-level)."""
    t = parity_result["test"]
    assert t["hits"][1] >= 70.0, t
    assert t["hits"][5] >= 95.0, t
    assert t["mrr"] >= 0.8, t


def test_trainer_deterministic_same_seed(tmp_path):
    from ontoea_ray.pipelines.kg_parity import load_train_data

    kg = FX.generate_fixture_kg(n_entities=60, seed=1)
    root = str(tmp_path / "kg")
    FX.write_reference_layout(kg, root)
    data = load_train_data(root)
    cfg = OntoEAConfig(dim=16, onto_dim=8, max_epoch=10, sub_epoch=5, start_valid=100)
    r1 = OntoEATrainer(data, cfg).run()
    r2 = OntoEATrainer(data, cfg).run()
    assert r1["test"] == r2["test"]


def test_limited_loss_decreases(tmp_path):
    """Triple loss must decrease over epochs (gradient sanity)."""
    from ontoea_ray.pipelines.kg_parity import load_train_data

    kg = FX.generate_fixture_kg(n_entities=60, seed=3)
    root = str(tmp_path / "kg")
    FX.write_reference_layout(kg, root)
    data = load_train_data(root)
    tr = OntoEATrainer(data, OntoEAConfig(dim=16, onto_dim=8))
    losses = []
    for _ in range(6):
        losses.append(
            tr._epoch(
                data.rel_triples, 512,
                lambda b: tr._limited_transe_step(b, tr._neg_triples(b, 5)),
            )
        )
    assert losses[-1] < losses[0]


def test_ray_eval_matches_numpy_eval(tmp_path):
    from ontoea_ray.pipelines.kg_parity import load_train_data

    kg = FX.generate_fixture_kg(n_entities=60, seed=5)
    root = str(tmp_path / "kg")
    FX.write_reference_layout(kg, root)
    data = load_train_data(root)
    tr = OntoEATrainer(data, OntoEAConfig(dim=16, onto_dim=8))
    dense = tr.evaluate(data.test_pairs)
    distributed = tr.evaluate(data.test_pairs, use_ray=True)
    assert dense["hits"] == distributed["hits"]
    assert dense["mrr"] == pytest.approx(distributed["mrr"])


def test_sup_relation_triples():
    tri = ray.data.from_items(
        [
            {"subj": "a", "pred": "r", "obj": "b"},
            {"subj": "b", "pred": "s", "obj": "c"},
        ]
    )
    out = generate_sup_relation_triples(tri, {"a": "A", "c": "C"}).take_all()
    got = {(r["subj"], r["pred"], r["obj"]) for r in out}
    # a->A as head of (a,r,b); c->C as tail of (b,s,c)
    assert got == {("A", "r", "b"), ("b", "s", "C")}


def test_sup_attribute_triples():
    tri = ray.data.from_items([{"subj": "a", "attr": "n", "value": "v"}, {"subj": "x", "attr": "n", "value": "w"}])
    out = generate_sup_attribute_triples(tri, {"a": "A"}).take_all()
    assert [(r["subj"], r["attr"], r["value"]) for r in out] == [("A", "n", "v")]


def test_sup_cv_links():
    links = [("e1", "e2"), ("e3", "e4"), ("e5", "e6")]
    cv = {"e1": "C", "e2": "C", "e3": "D", "e5": "E", "e6": "F"}
    out = generate_sup_cv_links(links, cv)
    # e1/e2 same class -> nothing; e4 missing -> inherits D; e5/e6 conflict -> cross-copy
    assert out == {("e4", "D"), ("e5", "F"), ("e6", "E")}


# ---------------------------------------------------------------------------
# sharded parameter-server trainer
# ---------------------------------------------------------------------------

def _small_root(tmp_path, n=60, seed=7):
    kg = FX.generate_fixture_kg(n_entities=n, seed=seed)
    root = str(tmp_path / "kg")
    FX.write_reference_layout(kg, root)
    return root


def test_sharded_trainer_bitwise_matches_dense(tmp_path):
    """Scatter-mode sharded trainer == dense trainer BIT-FOR-BIT: the
    entity table is row-partitioned, per-row Adagrad state is independent,
    and the client's stable masking preserves duplicate-accumulation
    order — so for any shard count the final table and metrics are
    identical, not merely close."""
    from ontoea_ray.pipelines.kg_parity import load_train_data
    from ontoea_ray.pipelines.training import ShardedOntoEATrainer

    data = load_train_data(_small_root(tmp_path))
    cfg = OntoEAConfig(dim=16, onto_dim=8, max_epoch=10, sub_epoch=5, start_valid=100)
    dense = OntoEATrainer(data, cfg)
    r_dense = dense.run()
    sharded = ShardedOntoEATrainer(data, cfg, num_shards=3)
    r_sharded = sharded.run()
    assert r_dense["test"] == r_sharded["test"]
    assert np.array_equal(dense.ent_matrix(), sharded.ent_matrix())
    assert np.array_equal(dense.rel, sharded.rel)
    assert np.array_equal(dense.M, sharded.M)


def test_sharded_trainer_truncated_schedule_bitwise_matches_dense(tmp_path):
    """The FULL truncated schedule — including the kNN hard-negative
    refresh, which the sharded trainer runs blockwise over shard Datasets
    while the dense trainer gathers in-actor — stays bit-identical:
    identical embeddings produce identical argpartition pools, so the rng
    stream and every subsequent update line up exactly."""
    from ontoea_ray.pipelines.kg_parity import load_train_data
    from ontoea_ray.pipelines.training import ShardedOntoEATrainer

    data = load_train_data(_small_root(tmp_path, seed=11))
    cfg = OntoEAConfig(
        dim=16, onto_dim=8, max_epoch=6, sub_epoch=3, start_valid=100,
        neg_sampling="truncated", truncated_freq=1,
    )
    dense = OntoEATrainer(data, cfg)
    r_dense = dense.run()
    tr = ShardedOntoEATrainer(data, cfg, num_shards=2)
    r_sharded = tr.run()
    assert r_dense["test"] == r_sharded["test"]
    assert np.array_equal(dense.ent_matrix(), tr.ent_matrix())
    assert set(dense._neighbors) == set(tr._neighbors)
    assert all(np.array_equal(dense._neighbors[k], tr._neighbors[k]) for k in dense._neighbors)
    ents = set(tr._neighbors)
    assert ents & set(data.kg1_entities.tolist())
    assert ents & set(data.kg2_entities.tolist())


def test_sharded_trainer_shard_init_never_dense(tmp_path):
    """shard_init mode: the trainer process never holds the entity table
    (trainer.ent stays None); training still reaches fixture quality and
    artifacts stream one row group per shard."""
    from ontoea_ray.pipelines.kg_parity import load_train_data
    from ontoea_ray.pipelines.training import ShardedOntoEATrainer
    from ontoea_ray.sources.artifacts import save_trainer_artifacts, _read_vec_table

    data = load_train_data(_small_root(tmp_path, seed=13))
    cfg = OntoEAConfig(dim=16, onto_dim=8, max_epoch=10, sub_epoch=5, start_valid=100)
    tr = ShardedOntoEATrainer(data, cfg, num_shards=3, shard_init=True)
    assert tr.ent is None and tr.opt_ent is None
    r = tr.run()
    assert r["test"]["hits"][1] > 0.0
    out = str(tmp_path / "art")
    save_trainer_artifacts(tr, out)
    ids, vecs = _read_vec_table(f"{out}/ent_embeds.parquet")
    assert np.array_equal(ids, np.arange(data.num_entities))
    assert np.array_equal(vecs, tr.ent_matrix())


def test_sharded_store_gather_update_roundtrip():
    """ShardedEntityStore primitive ops: gather reassembles request order
    across shard boundaries; update applies Adagrad identically to the
    dense optimizer including duplicate-row accumulation."""
    import ray

    from ontoea_ray.pipelines.training import _Adagrad
    from ontoea_ray.state.param_server import ShardedEntityStore

    rng = np.random.default_rng(0)
    init = rng.standard_normal((37, 5)).astype(np.float32)
    store = ShardedEntityStore(37, 5, 0.1, num_shards=4, init_array=init)
    ids = np.array([36, 0, 12, 12, 5, 30], np.int64)
    assert np.array_equal(store.gather(ids), init[ids])

    dense = init.copy()
    opt = _Adagrad(dense.shape, 0.1)
    rows = np.array([3, 3, 20, 36, 3, 11], np.int64)
    grads = rng.standard_normal((6, 5)).astype(np.float32)
    opt.update_rows(dense, rows, grads)
    store.update(rows, grads)
    store.sync()
    assert np.array_equal(store.matrix(), dense)

    ds = store.to_dataset()
    got = {r["ent_id"]: np.asarray(r["vec"], np.float32) for r in ds.take_all()}
    assert len(got) == 37
    assert np.array_equal(got[20], dense[20])


def test_sharded_store_rejects_out_of_range_ids():
    import pytest as _pytest

    from ontoea_ray.state.param_server import ShardedEntityStore

    store = ShardedEntityStore(10, 4, 0.1, num_shards=2, seed=1)
    with _pytest.raises(IndexError):
        store.gather(np.array([3, 10], np.int64))
    with _pytest.raises(IndexError):
        store.update(np.array([-1], np.int64), np.zeros((1, 4), np.float32))
