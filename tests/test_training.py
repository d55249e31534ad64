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
                lambda b: tr._limited_transe_step(
                    b, tr._neg_triples(b, 5), tr.ent, tr.rel, tr.opt_ent, tr.opt_rel
                ),
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
