"""Class-complement inference, calibration, truncation, consistency stats
(reference inference.py semantics on hand-built scenarios)."""

import math

import pytest

from ontoea_ray.state import inference as I
from ontoea_ray.state.ontology import THING, Ontology

O = "o://"
AGENT, PERSON, ORG, PLACE = O + "Agent", O + "Person", O + "Org", O + "Place"


@pytest.fixture()
def onto():
    return Ontology(subclass={AGENT: THING, PERSON: AGENT, ORG: AGENT, PLACE: THING})


def _adj(triples):
    return I.build_adjacency(triples)


def test_entropy_top2():
    # two equal children -> entropy 1; skewed -> lower; single -> 0
    assert I.calculate_entropy(["a", "b"], {"a": 5, "b": 5}) == pytest.approx(1.0)
    e = I.calculate_entropy(["a", "b", "c"], {"a": 8, "b": 2, "c": 1})
    p = 8 / 10
    assert e == pytest.approx(-(p * math.log(p, 2) + (1 - p) * math.log(1 - p, 2)))
    assert I.calculate_entropy(["a"], {"a": 3}) == 0


def test_find_class_clean_signal(onto):
    cv = {"p1": PERSON, "p2": PERSON, "p3": PERSON, "o1": ORG, "x": THING}
    triples = [(h, "works_at", "o1") for h in ["p1", "p2", "p3", "x"]]
    pred = I.find_class_by_relation("x", cv, onto, _adj(triples), entropy_threshold=0.4, loc="head")
    assert pred == {PERSON: 0.0}


def test_find_class_entropy_stop(onto):
    # heads evenly split Person/Org -> descent stops at Agent with entropy 1
    cv = {"p1": PERSON, "p2": PERSON, "g1": ORG, "g2": ORG, "o1": ORG, "x": THING}
    triples = [(h, "works_at", "o1") for h in ["p1", "p2", "g1", "g2", "x"]]
    pred = I.find_class_by_relation("x", cv, onto, _adj(triples), entropy_threshold=0.4, loc="head")
    assert set(pred) == {AGENT}
    assert pred[AGENT] == pytest.approx(1.0)


def test_class_complement_verified_and_dropped(onto):
    cv = {"p1": PERSON, "p2": PERSON, "p3": PERSON, "o1": ORG, "x": THING}
    triples = [(h, "works_at", "o1") for h in ["p1", "p2", "p3", "x"]]
    adj = _adj(triples)
    # counterpart typed Person -> containment holds -> accepted
    acc = I.class_complement(dict(cv), {"X2": PERSON}, {"x": "X2"}, onto, adj)
    assert acc == {"x": PERSON}
    # counterpart typed Place -> disjoint-free conflict (LCA Thing) -> dropped
    acc2 = I.class_complement(dict(cv), {"X2": PLACE}, {"x": "X2"}, onto, adj)
    assert acc2 == {}
    # supervised keeps it anyway
    acc3 = I.class_complement(dict(cv), {"X2": PLACE}, {"x": "X2"}, onto, adj, supervised=True)
    assert acc3 == {"x": PERSON}


def test_calibrate_and_truncate(onto):
    cv1 = {"a": THING, "b": PERSON}
    cv2 = {"A": ORG, "B": THING}
    n = I.calibrate_cv_links(cv1, cv2, [("a", "A"), ("b", "B")])
    assert n == 2 and cv1["a"] == ORG and cv2["B"] == PERSON
    deep = {"e": PERSON}  # path [Person, Agent, Thing] depth 3
    I.class_path_truncation(deep, onto, max_depth=2)
    assert deep["e"] == AGENT


def test_check_ills_consistent(onto):
    stats = I.check_ills_consistent(
        onto,
        [(PERSON, PERSON), (PERSON, AGENT), (THING, PERSON), (PERSON, ORG)],
    )
    assert stats["same"] == 1
    assert stats["contained"] >= 1
    assert stats["total"] == 4


def test_class_preprocess_end_to_end(onto):
    cv1 = {"p1": PERSON, "p2": PERSON, "p3": PERSON, "o1": ORG, "x": THING}
    cv2 = {"P1": PERSON, "P2": PERSON, "P3": PERSON, "O1": ORG, "X": PERSON}
    links = [("p1", "P1"), ("p2", "P2"), ("p3", "P3"), ("o1", "O1"), ("x", "X")]
    tri1 = [(h, "works_at", "o1") for h in ["p1", "p2", "p3", "x"]]
    tri2 = [(h, "works_at", "O1") for h in ["P1", "P2", "P3", "X"]]
    c1, c2, stats = I.class_preprocess(
        cv1, cv2, links, onto, _adj(tri1), _adj(tri2), seed_ratio=1.0, epochs=2
    )
    # x is calibrated/inferred to Person, consistency is total
    assert c1["x"] == PERSON
    assert stats["conflict"] == 0
    assert stats["missing"] == 0
