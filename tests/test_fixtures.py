"""Fixture round-trips: reference on-disk formats through the Ray readers,
silent-drop encode semantics, and flagship triple P/R >= 0.95 on pages with
an exactly-computable oracle (FIXTURES.md)."""

import pyarrow as pa
import pytest
import ray.data

from ontoea_ray.sources import fixtures as FX
from ontoea_ray.sources import kg_files as KF
from ontoea_ray.state.ids import encode_pairs
from ontoea_ray.state.ontology import THING


@pytest.fixture(scope="module")
def kg():
    return FX.generate_fixture_kg(n_entities=120, seed=42)


@pytest.fixture(scope="module")
def layout(kg, tmp_path_factory):
    root = tmp_path_factory.mktemp("fixture_kg")
    return FX.write_reference_layout(kg, str(root))


def test_relation_triples_roundtrip(kg, layout):
    ds = KF.read_relation_triples(f"{layout}/rel_triples_1", sep="\t")
    got = {(r["subj"], r["pred"], r["obj"]) for r in ds.take_all()}
    assert got == set(kg.rel1)


def test_attribute_triples_roundtrip(kg, layout):
    ds = KF.read_attribute_triples(f"{layout}/attr_triples_1", bracket=True)
    got = {(r["subj"], r["attr"], r["value"]) for r in ds.take_all()}
    # the reference parser re-joins multi-token literals and strips the
    # trailing ' .' terminator (and any value-final dots)
    expected = {(e, a, v.rstrip(".").strip()) for e, a, v in kg.attr1}
    assert got == expected


def test_links_and_splits_roundtrip(kg, layout):
    # unordered-executor semantics: compare as multisets (row order of a
    # Dataset is not part of the contract unless preserve_order is set)
    links = [(r["e1"], r["e2"]) for r in KF.read_links(f"{layout}/ent_links").take_all()]
    assert sorted(links) == sorted(kg.links)
    train, valid, test = kg.splits()
    got_train = [(r["e1"], r["e2"]) for r in KF.read_links(f"{layout}/721_5fold/1/train_links").take_all()]
    assert sorted(got_train) == sorted(train)
    assert len(train) + len(valid) + len(test) == len(kg.links)


def test_cv_links_and_ontology_files(kg, layout):
    cv = {r["entity"]: r["cls"] for r in KF.read_cv_links(f"{layout}/crossview_link_1").take_all()}
    assert cv == kg.cls1
    sub = KF.read_onto_functional(f"{layout}/onto_subClassOf_triples")
    assert sub == kg.onto.subclass
    dis = KF.read_onto_functional(f"{layout}/onto_disjointWith_triples")
    assert dis == kg.onto.disjoint
    paths = KF.load_class_path(f"{layout}/class_path.json")
    assert paths == kg.onto.paths()


def test_encode_pairs_silent_drop(kg, layout):
    """Orphan link pairs (URIs absent from the id space) are silently
    dropped — reference uris_pair_2ids semantics (read.py:135-136)."""
    ids1 = {e: i for i, e in enumerate(kg.ent1)}
    ids2 = {e: i for i, e in enumerate(kg.ent2)}
    links = KF.read_links(f"{layout}/ent_links")
    out = encode_pairs(links, ids1, ids2).take_all()
    assert len(out) == len(kg.links) - len(kg.orphan_links)
    assert all(r["id1"] == r["id2"] for r in out)  # gold pairs share index


def test_flagship_precision_recall_on_fixture_pages(kg):
    """north_rule gate: triple P/R >= 0.95 vs the exactly-computed oracle."""
    from ontoea_ray.pipelines.kg_construct import construct_kg

    pages, oracle = FX.generate_fixture_pages(kg, n_pages=200, seed=7)
    ds = FX.fixture_pages_dataset(pages)
    state = FX.fixture_linker_state(kg)
    triples = construct_kg(ds, state, concurrency=2, batch_size=64)
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.take_all()}
    expected = {(s, p, o) for s, p, o, _ in oracle}
    tp = len(got & expected)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(expected), 1)
    assert precision >= 0.95, (precision, len(got), len(expected))
    assert recall >= 0.95, (recall, len(got), len(expected))
    # with unambiguous surfaces the match should in fact be exact
    assert precision == 1.0 and recall == 1.0
