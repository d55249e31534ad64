"""CCM v1–v6 unit tests on a hand-built mini-ontology (FIXTURES.md §4).

Tree (child -> parent):
    Thing
    ├─ Agent
    │   ├─ Person
    │   │    └─ Artist
    │   └─ Organisation
    └─ Place
Disjoint: Person disjointWith Place.
"""

import numpy as np
import pytest

from ontoea_ray.state import ontology as O

THING = O.THING
AGENT = "o://Agent"
PERSON = "o://Person"
ARTIST = "o://Artist"
ORG = "o://Organisation"
PLACE = "o://Place"


@pytest.fixture()
def onto():
    sub = {AGENT: THING, PERSON: AGENT, ARTIST: PERSON, ORG: AGENT, PLACE: THING}
    return O.Ontology(subclass=sub, disjoint={PERSON: PLACE})


def test_paths(onto):
    assert onto.path(ARTIST) == [ARTIST, PERSON, AGENT, THING]
    assert onto.path(THING) == [THING]


def test_disjoint(onto):
    assert O.check_disjoint(onto.disjoint, onto.path(ARTIST), onto.path(PLACE))
    assert not O.check_disjoint(onto.disjoint, onto.path(ORG), onto.path(PLACE))


def test_v1(onto):
    assert O.check_type_v1(onto, THING, THING) == 0.5
    assert O.check_type_v1(onto, PERSON, PERSON) == 1.0
    # equal depth, different class -> 0
    assert O.check_type_v1(onto, PERSON, ORG) == 0.0
    # ancestor alignment: Artist (depth 4) vs Person (depth 3): a[4-3]=Person==b[0] -> 1
    assert O.check_type_v1(onto, ARTIST, PERSON) == 1.0
    # Artist vs Thing: suffix class is Thing -> 0
    assert O.check_type_v1(onto, ARTIST, THING) == 0.0


def test_v2(onto):
    assert O.check_type_v2(onto, THING, THING, unsure_w=0.25) == 0.25
    # disjoint wins over everything
    assert O.check_type_v2(onto, ARTIST, PLACE) == -1.0
    # containment: Artist under Person -> 1
    assert O.check_type_v2(onto, ARTIST, PERSON) == 1.0
    # containment rooted at Thing (Person vs Thing) -> unsure_w
    assert O.check_type_v2(onto, PERSON, THING, unsure_w=0.3) == 0.3
    # siblings under Agent (non-Thing LCA) -> 1
    assert O.check_type_v2(onto, PERSON, ORG) == 1.0
    # LCA is Thing (Org vs Place, not disjoint) -> -1
    assert O.check_type_v2(onto, ORG, PLACE) == -1.0


def test_v3(onto):
    # equal depth, common non-Thing parent -> 1 (the v1 case that was 0)
    assert O.check_type_v3(onto, PERSON, ORG) == 1.0
    # equal depth, parents differ and common grandparent is Thing -> 0
    assert O.check_type_v3(onto, AGENT, PLACE) == 0.0 or True  # depth differs; see below
    # Agent (3) vs Place (2): b[0]=Place, a[3-2]=... -> mismatch -> 0
    assert O.check_type_v3(onto, AGENT, PLACE) == 0.0


def test_v4_diagonal(onto):
    for a in [THING, AGENT, PERSON, ARTIST, ORG, PLACE]:
        for b in [THING, AGENT, PERSON, ARTIST, ORG, PLACE]:
            expect = 1.0 if a == b else 0.0
            assert O.check_type_v4(onto, a, b) == expect


def test_v5_dice(onto):
    # Artist path {A,P,Ag,T} vs Org path {O,Ag,T}: inter=2, sizes 4+3 -> 4/7
    assert abs(O.check_type_v5(onto, ARTIST, ORG) - 4 / 7) < 1e-12
    assert O.check_type_v5(onto, PERSON, PERSON) == 1.0
    assert O.check_type_v5(onto, ARTIST, PLACE) == 0.0  # disjoint
    # smoothing k
    assert abs(O.check_type_v5(onto, ARTIST, ORG, k=1) - 5 / 8) < 1e-12


def test_v6_overlap(onto):
    # inter=2, max(4,3)=4 -> 0.5
    assert abs(O.check_type_v6(onto, ARTIST, ORG) - 0.5) < 1e-12
    assert O.check_type_v6(onto, ARTIST, PLACE) == 0.0


def test_build_ccm_and_supervision(onto):
    ids, mat = O.build_ccm(onto, version=4)
    assert mat.shape == (6, 6)
    assert np.allclose(np.diag(mat), 1.0)
    assert mat[ids[ARTIST], ids[ORG]] == pytest.approx(4 / 7)
    # seed supervision forces a cell to 1, with Thing miss-completion
    links = [("e1", "e2")]
    t1 = {"e1": O.MISS}
    t2 = {"e2": PLACE}
    out = O.supervise_ccm(mat, ids, links, t1, t2, miss_completion=True)
    assert t1["e1"] == PLACE  # completed in place
    assert out[ids[PLACE], ids[PLACE]] == 1.0


def test_padded_class_paths():
    # class 5 path [5, 2, 0]; class 3 path [3, 0]
    depth, paths, w = O.padded_class_paths({5: [5, 2, 0], 3: [3, 0]}, decay_weight=0.5)
    assert depth == 3
    assert paths.tolist() == [[0, 3, 0], [5, 2, 0]]  # sorted by class id: 3 first
    # padding weight ~ 0; real weights are softmax of [1, .5] and [1, .5, .25]
    raw = np.exp([O.NEG_INF, 1.0, 0.5])
    assert np.allclose(w[0], raw / raw.sum())
    raw2 = np.exp([1.0, 0.5, 0.25])
    assert np.allclose(w[1], raw2 / raw2.sum())
