"""Artifact sinks/sources: embeddings, id tables, alignment results —
Parquet/NPZ instead of the reference's npy + tab text files
(read.py:335-383), plus the eval-from-artifact ("retest") path
(basic_model.py:289-331) that makes evaluation resumable without retraining.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_vec_table(path: str, ids: np.ndarray, vecs: np.ndarray) -> None:
    d = vecs.shape[1]
    tbl = pa.table(
        {
            "id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(np.ascontiguousarray(vecs, np.float32).reshape(-1), pa.float32()), d
            ),
        }
    )
    pq.write_table(tbl, path)


def _read_vec_table(path: str) -> tuple[np.ndarray, np.ndarray]:
    tbl = pq.read_table(path)
    ids = np.asarray(tbl["id"].to_pylist(), np.int64)
    vec_arr = tbl["vec"].combine_chunks()
    d = vec_arr.type.list_size
    vecs = np.asarray(vec_arr.flatten().to_numpy(zero_copy_only=False), np.float32).reshape(-1, d)
    return ids, vecs


def save_trainer_artifacts(trainer, out_dir: str, *, id_dicts: dict | None = None) -> None:
    """Persist everything the eval needs: embedding tables (parquet), dense
    matrices (npz), config (json), optional uri->id dicts (parquet)."""
    os.makedirs(out_dir, exist_ok=True)
    if getattr(trainer, "ent", None) is None and hasattr(trainer, "ent_store"):
        # sharded trainer: stream one row group per shard — the dense
        # table never concatenates in this process
        trainer.ent_store.write_parquet_stream(os.path.join(out_dir, "ent_embeds.parquet"))
    else:
        ent = trainer.ent_matrix() if hasattr(trainer, "ent_matrix") else trainer.ent
        _write_vec_table(os.path.join(out_dir, "ent_embeds.parquet"), np.arange(len(ent)), ent)
    _write_vec_table(os.path.join(out_dir, "rel_embeds.parquet"), np.arange(len(trainer.rel)), trainer.rel)
    _write_vec_table(os.path.join(out_dir, "onto_embeds.parquet"), np.arange(len(trainer.onto)), trainer.onto)
    np.savez(
        os.path.join(out_dir, "matrices.npz"),
        mapping=trainer.M, cv_W=trainer.cv_W, cv_b=trainer.cv_b,
        hier_W=trainer.hier_W, hier_b=trainer.hier_b,
        class_paths=trainer.d.class_paths, class_masks=trainer.d.class_masks,
        ent_class=trainer.d.ent_class, ccm=trainer.d.ccm,
        test_pairs=trainer.d.test_pairs,
    )
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({k: v for k, v in vars(trainer.cfg).items()}, f)
    if id_dicts:
        for name, dct in id_dicts.items():
            tbl = pa.table(
                {
                    "uri": pa.array(list(dct.keys()), pa.string()),
                    "id": pa.array(list(dct.values()), pa.int64()),
                }
            )
            pq.write_table(tbl, os.path.join(out_dir, f"{name}_ids.parquet"))


def save_onto_check_mat(path: str, onto_mat: np.ndarray, onto2id_dict: dict) -> None:
    """Persist the class-coherence matrix with its class-name -> id mapping —
    the reference's ``onto_check_mat.h5`` artifact (check.py:56-…, keys
    ``onto_mat`` / ``onto_name`` / ``onto_id``).  Written through h5py when
    the library is importable, else an ``.npz`` with the identical keys (the
    sandbox ships no HDF5; the loader accepts both)."""
    names = np.array(list(onto2id_dict.keys()))
    ids = np.array(list(onto2id_dict.values()), np.int64)
    try:
        import h5py  # noqa: F401

        with h5py.File(path, "w") as f:
            f.create_dataset("onto_mat", data=onto_mat)
            f.create_dataset("onto_name", data=[n.encode("utf-8") for n in names])
            f.create_dataset("onto_id", data=ids)
    except ImportError:
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 onto_mat=onto_mat, onto_name=names, onto_id=ids)


def load_onto_check_mat(path: str) -> dict:
    """Inverse of :func:`save_onto_check_mat` -> ``{'onto_mat',
    'onto2id_dict'}`` (reference read.py:455-470; h5 when h5py exists, npz
    fallback with the same keys)."""
    if os.path.exists(path) and not path.endswith(".npz"):
        try:
            import h5py

            with h5py.File(path, "r") as f:
                onto_mat = f["onto_mat"][:]
                names = [n.decode("utf-8") for n in f["onto_name"][()]]
                ids = f["onto_id"][()]
            return {"onto_mat": onto_mat, "onto2id_dict": dict(zip(names, ids))}
        except ImportError:
            pass
    npz_path = path if path.endswith(".npz") else path + ".npz"
    m = np.load(npz_path, allow_pickle=False)
    names = [str(n) for n in m["onto_name"]]
    return {"onto_mat": m["onto_mat"], "onto2id_dict": dict(zip(names, m["onto_id"]))}


def radio_2file(radio: float, folder: str) -> str:
    """Seed-ratio run subdirectory: ``folder/0_3/`` for radio=0.3 — the
    reference's layout (read.py:328-333: ``str(radio)`` with ``.`` -> ``_``,
    created if missing, trailing separator included)."""
    path = os.path.join(folder, str(radio).replace(".", "_"))
    os.makedirs(path, exist_ok=True)
    return path + os.sep


def generate_out_folder(
    out_folder: str,
    training_data_path: str,
    div_path: str,
    method_name: str,
    *,
    timestamp: str | None = None,
) -> str:
    """Timestamped results directory
    ``out_folder/method/dataset/div<YYYYmmddHHMMSS>/`` (util.py:32-38; the
    dataset component is the last element of the training-data path).
    ``timestamp`` can be pinned for reproducible tests/resume."""
    import time as _time

    dataset = training_data_path.strip("/").split("/")[-1]
    stamp = timestamp if timestamp is not None else _time.strftime("%Y%m%d%H%M%S")
    folder = os.path.join(out_folder, method_name, dataset, f"{div_path}{stamp}") + os.sep
    os.makedirs(folder, exist_ok=True)
    return folder


def save_alignment_results(out_dir: str, pairs: list[tuple], name: str = "alignment_results_12") -> None:
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "e1": pa.array([p[0] for p in pairs]),
            "e2": pa.array([p[1] for p in pairs]),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))


def retest(
    out_dir: str,
    *,
    top_k=(1, 5, 10, 50),
    csls_k: int = 0,
    type_weight: float = 1.0,
    full: bool = False,
    stable_csls_k: int = 10,
) -> dict:
    """Re-run the fused alignment evaluation purely from saved artifacts
    (no trainer state) — the reference's retest path, which is also the
    crash-recovery story for evaluation.

    ``full=False``: the conventional (forward) test only, back-compatible.
    ``full=True`` mirrors the reference's whole retest block
    (basic_model.py:289-331): {"forward", "reversed" (embeds2 vs mapped
    embeds1), "stable" (Gale–Shapley), "stable_csls"}."""
    from ontoea_ray.functions.similarity import l2_normalize
    from ontoea_ray.pipelines.alignment import greedy_alignment_eval, stable_alignment_eval

    _, ent = _read_vec_table(os.path.join(out_dir, "ent_embeds.parquet"))
    _, onto = _read_vec_table(os.path.join(out_dir, "onto_embeds.parquet"))
    m = np.load(os.path.join(out_dir, "matrices.npz"))
    pairs = m["test_pairs"]
    cls1 = m["ent_class"][pairs[:, 0]]
    cls2 = m["ent_class"][pairs[:, 1]]
    o = l2_normalize(onto[m["class_paths"]].reshape(-1, onto.shape[1])).reshape(
        m["class_paths"].shape[0], m["class_paths"].shape[1], onto.shape[1]
    )
    pooled = (o * m["class_masks"][:, :, None]).sum(axis=1)
    w1n, w2n = l2_normalize(pooled[cls1]), l2_normalize(pooled[cls2])
    f1 = l2_normalize(ent[pairs[:, 0]] @ m["mapping"]).astype(np.float32)
    f2 = l2_normalize(ent[pairs[:, 1]]).astype(np.float32)
    # type FEATURES (blockwise fusion) — never a dense per-pair type matrix
    forward = greedy_alignment_eval(
        f1, f2, top_k=top_k, csls_k=csls_k,
        type1=w1n, type2=w2n, type_weight=type_weight,
    )
    if not full:
        return forward
    # reversed direction: mapped embeds1 become the RIGHT side (the
    # reference maps first, then swaps the test arguments)
    rev = greedy_alignment_eval(
        f2, f1, top_k=top_k, csls_k=csls_k,
        type1=w2n, type2=w1n, type_weight=type_weight,
    )
    stable = stable_alignment_eval(f1, f2, csls_k=0)
    stable_csls = stable_alignment_eval(f1, f2, csls_k=stable_csls_k)
    return {"forward": forward, "reversed": rev, "stable": stable, "stable_csls": stable_csls}
