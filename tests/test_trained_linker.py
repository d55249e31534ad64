"""S4 OntoScorer configuration: the flagship linker running on TRAINED
OntoEA embeddings (train on the fixture KG, feed the learned entity vectors
into the broadcast linker state, construct the KG from fixture pages)."""

import pytest

from ontoea_ray.pipelines.kg_construct import construct_kg
from ontoea_ray.pipelines.kg_parity import load_train_data
from ontoea_ray.pipelines.training import OntoEAConfig, OntoEATrainer
from ontoea_ray.sources import fixtures as FX


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    kg = FX.generate_fixture_kg(n_entities=100, seed=42)
    root = str(tmp_path_factory.mktemp("kg"))
    FX.write_reference_layout(kg, root)
    data = load_train_data(root)
    tr = OntoEATrainer(data, OntoEAConfig(dim=32, onto_dim=16, max_epoch=30, sub_epoch=5, start_valid=1000))
    tr.run()
    # uri -> trained embedding for KG1 entities
    uri_of = {}
    from ontoea_ray.sources.kg_files import read_relation_triples  # noqa: F401
    # rebuild the id dicts the same way load_train_data did
    from ontoea_ray.state.ids import element_frequencies, interleaved_ids, rank_by_frequency
    import pyarrow as pa
    from ontoea_ray.sources import kg_files as KF

    rel1 = KF.read_relation_triples(f"{root}/rel_triples_1", sep="\t")
    rel2 = KF.read_relation_triples(f"{root}/rel_triples_2", sep="\t")
    r1 = pa.Table.from_pylist(rank_by_frequency(element_frequencies(rel1, ("subj", "obj"))).take_all()).sort_by("rank")
    r2 = pa.Table.from_pylist(rank_by_frequency(element_frequencies(rel2, ("subj", "obj"))).take_all()).sort_by("rank")
    ids1, _ = interleaved_ids(r1, r2)
    ent_vectors = {uri: tr.ent[i] for uri, i in ids1.items()}
    return kg, ent_vectors


def test_flagship_with_trained_embeddings(trained, ray_session):
    kg, ent_vectors = trained
    pages, oracle = FX.generate_fixture_pages(kg, n_pages=120, seed=7)
    # restrict the gazetteer to entities that have trained vectors (some
    # fixture entities may not appear in any triple)
    kg_known = [e for e in kg.ent1 if e in ent_vectors]
    missing = set(kg.ent1) - set(kg_known)
    state = FX.fixture_linker_state(
        kg, ent_vectors={u: v for u, v in ent_vectors.items()},
    ) if not missing else None
    if state is None:
        import numpy as np

        for e in missing:  # deterministic fallback vector for unseen URIs
            rng = np.random.default_rng(len(e))
            ent_vectors[e] = rng.standard_normal(32)
        state = FX.fixture_linker_state(kg, ent_vectors=ent_vectors)
    ds = FX.fixture_pages_dataset(pages)
    triples = construct_kg(ds, state, concurrency=2, batch_size=64)
    got = {(r["subj"], r["pred"], r["obj"]) for r in triples.take_all()}
    expected = {(s, p, o) for s, p, o, _ in oracle}
    tp = len(got & expected)
    assert tp / max(len(got), 1) >= 0.95
    assert tp / max(len(expected), 1) >= 0.95
