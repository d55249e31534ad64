"""Ontology-aware disambiguation in the fused scan+link stage: an ambiguous
surface (two candidate entities of different classes) must resolve by the
page-context class through the CCM term of the fused score
(reference analog: sim + type_weight * CCM, alignment.py:40-44)."""

import numpy as np
import pyarrow as pa

from ontoea_ray.stages.scan_link import ScanAndLink
from ontoea_ray.state.linker import LinkerState, build_linker_state
from ontoea_ray.state.ontology import THING, Ontology, build_ccm

O = "o://"
PERSON, CITY = O + "Person", O + "City"


def _state(type_weight=10.0) -> LinkerState:
    onto = Ontology(
        subclass={O + "Agent": THING, PERSON: O + "Agent", O + "Place": THING, CITY: O + "Place"},
        disjoint={PERSON: O + "Place"},
    )
    class_ids, ccm = build_ccm(onto, version=4)
    # 'paris' is ambiguous: the person or the city; helpers are unambiguous
    cands = {
        "paris": ["kg://ent/Paris_(city)", "kg://ent/Paris_(person)"],
        "alice": ["kg://ent/Alice"],
        "lyon": ["kg://ent/Lyon"],
    }
    classes = {
        "kg://ent/Paris_(city)": class_ids[CITY],
        "kg://ent/Paris_(person)": class_ids[PERSON],
        "kg://ent/Alice": class_ids[PERSON],
        "kg://ent/Lyon": class_ids[CITY],
    }
    # a large type weight makes the CCM term decisive over the (arbitrary)
    # hash-embedding similarity, isolating the ontology pathway under test
    return build_linker_state(
        cands, classes, ccm, ["knows", "near"],
        root_class=class_ids[THING], type_weight=type_weight,
    )


def _scan(state, texts):
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(texts))]),
            "text": pa.array(texts),
        }
    )
    out = ScanAndLink(state)(batch)
    return list(zip(out["subj"].to_pylist(), out["pred"].to_pylist(), out["obj"].to_pylist()))


def test_context_resolves_ambiguity():
    st = _state()
    # person context: unambiguous 'alice' (Person) dominates the page class
    person_page = "alice knows paris"
    # city context: unambiguous 'lyon' (City)
    city_page = "lyon near paris"
    got_person = _scan(st, [person_page])
    got_city = _scan(st, [city_page])
    assert got_person == [("kg://ent/Alice", "knows", "kg://ent/Paris_(person)")]
    assert got_city == [("kg://ent/Lyon", "near", "kg://ent/Paris_(city)")]


def test_no_context_falls_back_to_embedding_similarity():
    # with zero type weight the CCM cannot disambiguate: the pick is the
    # deterministic embedding-similarity argmax, stable across calls
    st0 = _state(type_weight=0.0)
    a = _scan(st0, ["alice knows paris"])
    b = _scan(st0, ["alice knows paris"])
    assert a == b
    assert a[0][2] in ("kg://ent/Paris_(city)", "kg://ent/Paris_(person)")


def test_batch_mixes_contexts_independently():
    st = _state()
    got = _scan(st, ["alice knows paris", "lyon near paris"])
    assert ("kg://ent/Alice", "knows", "kg://ent/Paris_(person)") in got
    assert ("kg://ent/Lyon", "near", "kg://ent/Paris_(city)") in got
