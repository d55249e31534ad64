"""Named parity loaders: read_ent_ills, load_type_relation,
load_datasets_info, radio_2file, generate_out_folder, onto_check_mat
artifact (reference read.py:261-270/328-333, inference.py:69-96,
util.py:32-38, check.py:25-53, read.py:455-470)."""

import numpy as np
import pytest

from ontoea_ray.sources import artifacts as A
from ontoea_ray.sources import kg_files as KF


def _write(path, lines):
    path.write_text("".join(l + "\n" for l in lines), encoding="utf-8")


def test_read_ent_ills(tmp_path):
    p = tmp_path / "ent_ILLs"
    _write(p, ["a1\tb1", "a2\tb2", "a3\tb3"])
    s, t = KF.read_ent_ills(str(p))
    assert s == ["a1", "a2", "a3"]
    assert t == ["b1", "b2", "b3"]


def test_load_type_relation(tmp_path):
    _write(tmp_path / "onto_subClassOf_triples",
           ["<c1> <subClassOf> <p1>", "<c2> <subClassOf> <p1>"])
    _write(tmp_path / "onto_disjointWith_triples", ["<c1> <disjointWith> <c2>"])
    d = KF.load_type_relation(str(tmp_path))
    assert d["subclassof"] == {"c1": "p1", "c2": "p1"}
    assert d["disjointwith"] == {"c1": "c2"}
    with pytest.raises(FileNotFoundError):
        KF.load_type_relation(str(tmp_path / "missing"))


def test_load_datasets_info(tmp_path, ray_session):
    base = tmp_path / "en_de"
    base.mkdir()
    _write(base / "ent_ILLs", ["e1\tf1", "e2\tf2"])
    _write(base / "en_unify_align_types", ["e1\tPerson", "e2\tPlace"])
    _write(base / "de_unify_align_types", ["f1\tPerson"])
    _write(base / "en_popular_rel_triples", ["e1\tknows\te2"])
    _write(base / "de_popular_rel_triples", ["f1\tkennt\tf2", "f2\tkennt\tf1"])
    _write(tmp_path / "onto_subClassOf_triples", ["<Person> <s> <Thing>"])
    _write(tmp_path / "onto_disjointWith_triples", ["<Person> <d> <Place>"])
    info = KF.load_datasets_info(str(tmp_path), "en_de", unify=0)
    assert info["ent_ills"] == (["e1", "e2"], ["f1", "f2"])
    assert info["lang1_cv_link"] == {"e1": "Person", "e2": "Place"}
    assert info["lang2_cv_link"] == {"f1": "Person"}
    assert info["lang1_kg"]["h_rt"]["e1"] == {("knows", "e2")}
    assert info["lang2_kg"]["r_ht"]["kennt"] == {("f1", "f2"), ("f2", "f1")}
    assert info["onto_dict"]["subclassof"] == {"Person": "Thing"}
    # unify selects a different file suffix, reference-style
    _write(base / "en_types", ["e1\tAgent"])
    _write(base / "de_types", ["f1\tAgent"])
    info1 = KF.load_datasets_info(str(tmp_path), "en_de", unify=1)
    assert info1["lang1_cv_link"] == {"e1": "Agent"}


def test_radio_2file(tmp_path):
    out = A.radio_2file(0.3, str(tmp_path))
    assert out.endswith("0_3/")
    import os
    assert os.path.isdir(out)


def test_generate_out_folder(tmp_path):
    out = A.generate_out_folder(
        str(tmp_path), "/data/EN_DE_100K", "721_5fold/1/", "ontoea_ray",
        timestamp="20260817000000",
    )
    assert "ontoea_ray" in out and "EN_DE_100K" in out and out.rstrip("/").endswith("20260817000000")
    import os
    assert os.path.isdir(out)


def test_onto_check_mat_roundtrip(tmp_path):
    mat = np.array([[1.0, 0.0], [0.5, 1.0]], np.float64)
    d = {"Thing": 0, "Person": 1}
    path = str(tmp_path / "onto_check_mat.h5")
    A.save_onto_check_mat(path, mat, d)
    back = A.load_onto_check_mat(path)
    np.testing.assert_array_equal(back["onto_mat"], mat)
    assert {k: int(v) for k, v in back["onto2id_dict"].items()} == d


def test_eval_test_types_matches_elementwise_gather(tmp_path, ray_session):
    """Named _eval_test_types parity wrapper == the reference's double
    loop over ccm[type1_id][type2_id] (basic_model.py:210-232)."""
    import numpy as np

    from ontoea_ray.pipelines.kg_parity import eval_test_types, load_train_data
    from ontoea_ray.sources import fixtures as FX

    kg = FX.generate_fixture_kg(n_entities=50, seed=5)
    root = str(tmp_path / "kg")
    FX.write_reference_layout(kg, root)
    data = load_train_data(root)
    tm = eval_test_types(root)
    n1, n2 = len(data.test_pairs), len(data.test_pairs)
    assert tm.shape == (n1, n2)
    for i in range(min(n1, 8)):
        for j in range(min(n2, 8)):
            a = data.ent_class[data.test_pairs[i, 0]]
            b = data.ent_class[data.test_pairs[j, 1]]
            assert tm[i, j] == data.ccm[a, b]
    # supervision ON patches seed-pair classes to 1 unless disjoint —
    # matrix entries stay within the CCM's value set
    assert set(np.unique(tm)).issubset(set(np.unique(data.ccm)))
