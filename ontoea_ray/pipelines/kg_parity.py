"""KG-parity track: reference-layout benchmark directory -> Ray loaders ->
distributed id assignment -> ontology kernel -> trainer -> alignment eval.

This reproduces the reference's end-to-end lifecycle (SURVEY.md §3.1) on
OpenEA-style inputs: the data layer (parsers, frequency-rank interleaved
ids, CCM, class paths, splits) runs as Ray Data pipelines; the iterative
trainer is a single actor (reference analog: one TF process).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.pipelines.training import KGTrainData, OntoEAConfig, OntoEATrainer
from ontoea_ray.sources import kg_files as KF
from ontoea_ray.state.ids import (
    element_frequencies,
    encode_pairs,
    interleaved_ids,
    rank_by_frequency,
)
from ontoea_ray.state.ontology import THING, Ontology, build_ccm, padded_class_paths, supervise_ccm


def _ranked(ds) -> pa.Table:
    return pa.Table.from_pylist(ds.take_all()).sort_by("rank")


def _lexsorted(mat: np.ndarray) -> np.ndarray:
    """Canonical row order for a collected id matrix.  Dataset row order is
    NOT part of the executor contract (preserve_order is off), so two loads
    of the same root can collect the same rows differently ordered; sorting
    here makes load_train_data a pure function of the files — the trainer
    re-shuffles per epoch with its seeded rng, eval metrics are row-order
    invariant, and supervision patches become order-stable."""
    if not len(mat):
        return mat
    return mat[np.lexsort(mat.T[::-1])]


def load_train_data(
    root: str,
    *,
    supervise: bool = True,
    miss_completion: bool = False,
    decay_weight: float = 1.0,
    ccm_version: int = 4,
) -> KGTrainData:
    rel1_ds = KF.read_relation_triples(f"{root}/rel_triples_1", sep="\t")
    rel2_ds = KF.read_relation_triples(f"{root}/rel_triples_2", sep="\t")

    # --- interleaved id spaces (entities over subj+obj, relations over pred)
    ent_rank1 = _ranked(rank_by_frequency(element_frequencies(rel1_ds, ("subj", "obj"))))
    ent_rank2 = _ranked(rank_by_frequency(element_frequencies(rel2_ds, ("subj", "obj"))))
    ent_ids1, ent_ids2 = interleaved_ids(ent_rank1, ent_rank2)
    rel_rank1 = _ranked(rank_by_frequency(element_frequencies(rel1_ds, ("pred",))))
    rel_rank2 = _ranked(rank_by_frequency(element_frequencies(rel2_ds, ("pred",))))
    rel_ids1, rel_ids2 = interleaved_ids(rel_rank1, rel_rank2)
    ent_ids = {**ent_ids1, **ent_ids2}
    rel_ids = {**rel_ids1, **rel_ids2}

    def encode_rel(ds) -> np.ndarray:
        # vectorized broadcast-dict encode (state/ids.encode_triples); the
        # collected result is the id-encoded triple matrix the trainer needs
        from ontoea_ray.state.ids import encode_triples

        rows = encode_triples(ds, ent_ids, rel_ids).take_all()
        mat = np.array(
            [[r["subj_id"], r["pred_id"], r["obj_id"]] for r in rows], np.int64
        ).reshape(-1, 3)
        return _lexsorted(mat)

    rel_triples = np.concatenate([encode_rel(rel1_ds), encode_rel(rel2_ds)])

    # --- ontology
    sub = KF.read_onto_functional(f"{root}/onto_subClassOf_triples")
    dis = KF.read_onto_functional(f"{root}/onto_disjointWith_triples")
    onto = Ontology(subclass=sub, disjoint=dis)
    classes = onto.classes()
    class_ids = {c: i for i, c in enumerate(classes)}
    _, ccm = build_ccm(onto, version=ccm_version, class_ids=class_ids)

    onto_triples = np.array(
        [[class_ids[c], 0, class_ids[p]] for c, p in sorted(sub.items())], np.int64
    ).reshape(-1, 3)

    paths_ids = {class_ids[c]: [class_ids[x] for x in onto.path(c)] for c in classes}
    _, path_mat, mask_mat = padded_class_paths(paths_ids, decay_weight=decay_weight)

    # --- cv links (entities missing a type default to owl:Thing)
    cv1 = {r["entity"]: r["cls"] for r in KF.read_cv_links(f"{root}/crossview_link_1").take_all()}
    cv2 = {r["entity"]: r["cls"] for r in KF.read_cv_links(f"{root}/crossview_link_2").take_all()}
    ent_class = np.full(len(ent_ids), class_ids[THING], np.int64)
    cv_rows = []
    for dct, ids in ((cv1, ent_ids1), (cv2, ent_ids2)):
        for e, c in dct.items():
            if e in ids and c in class_ids:
                ent_class[ids[e]] = class_ids[c]
                cv_rows.append((ids[e], class_ids[c]))
    cv_links = np.array(sorted(cv_rows), np.int64).reshape(-1, 2)

    # --- splits (silent-drop encode, reference uris_pair_2ids semantics)
    def pairs(name):
        ds = KF.read_links(f"{root}/721_5fold/1/{name}")
        rows = encode_pairs(ds, ent_ids1, ent_ids2).take_all()
        mat = np.array([[r["id1"], r["id2"]] for r in rows], np.int64).reshape(-1, 2)
        return _lexsorted(mat)

    train_pairs, valid_pairs, test_pairs = pairs("train_links"), pairs("valid_links"), pairs("test_links")

    if supervise and len(train_pairs):
        uri_of1 = {v: k for k, v in ent_ids1.items()}
        uri_of2 = {v: k for k, v in ent_ids2.items()}
        t1 = {uri_of1[i]: classes[ent_class[i]] for i in train_pairs[:, 0]}
        t2 = {uri_of2[i]: classes[ent_class[i]] for i in train_pairs[:, 1]}
        links = [(uri_of1[a], uri_of2[b]) for a, b in train_pairs]
        ccm = supervise_ccm(ccm, class_ids, links, t1, t2, miss_completion=miss_completion)

    return KGTrainData(
        num_entities=len(ent_ids),
        num_relations=len(rel_ids),
        num_classes=len(classes),
        num_onto_relations=1,
        rel_triples=rel_triples,
        onto_triples=onto_triples,
        cv_links=cv_links,
        train_pairs=train_pairs,
        valid_pairs=valid_pairs,
        test_pairs=test_pairs,
        ent_class=ent_class,
        class_paths=path_mat,
        class_masks=mask_mat,
        ccm=ccm,
        kg1_entities=np.fromiter(ent_ids1.values(), np.int64, len(ent_ids1)),
        kg2_entities=np.fromiter(ent_ids2.values(), np.int64, len(ent_ids2)),
    )


def run_parity(root: str, cfg: OntoEAConfig | None = None, *, as_actor: bool = True, verbose: bool = False) -> dict:
    """Train + test on a reference-layout directory.  ``as_actor`` hosts the
    trainer in a Ray actor (num_cpus=1) like a parameter-server stage."""
    data = load_train_data(root)
    cfg = cfg or OntoEAConfig()
    if as_actor:
        Actor = ray.remote(num_cpus=1)(OntoEATrainer)
        trainer = Actor.remote(data, cfg)
        return ray.get(trainer.run.remote(verbose=verbose))
    return OntoEATrainer(data, cfg).run(verbose=verbose)


def eval_test_types(
    root: str,
    *,
    supervise: bool = True,
    miss_completion: bool = False,
    ccm_version: int = 4,
) -> np.ndarray:
    """Reference parity for ``basic_model._eval_test_types``
    (/root/reference/code/src/openea/models/basic_model.py:165-236): the
    (|test1| x |test2|) TYPE MATRIX gathered from the class-coherence
    matrix — type_matrix[i, j] = ccm[class(test1_i), class(test2_j)] after
    class inference, optional complement/truncation, and the seed-link
    supervision patch (disjoint-filtered) that load_train_data applies.

    The reference fills the matrix with a tqdm double loop; here it is one
    vectorized ``np.ix_`` gather over the broadcastable CCM — the actual
    n1 x n2-scale gather during EVALUATION happens blockwise inside
    `pipelines/alignment` (never materialized when n1 x n2 is large); this
    named wrapper exists for the small-matrix parity surface the reference
    exposes."""
    data = load_train_data(
        root,
        supervise=supervise,
        miss_completion=miss_completion,
        ccm_version=ccm_version,
    )
    t1 = data.ent_class[data.test_pairs[:, 0]]
    t2 = data.ent_class[data.test_pairs[:, 1]]
    return data.ccm[np.ix_(t1, t2)]
