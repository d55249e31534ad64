"""Coverage for the smaller operators: alt-label name dicts, id-dict files,
LSH-bucketed ANN recall, replicated pages determinism, manifest lineage."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.sources import kg_files as KF


def test_read_dict_roundtrip(tmp_path):
    p = tmp_path / "ids"
    p.write_text("http://a\t0\nhttp://b\t7\n")
    assert KF.read_dict(str(p)) == {"http://a": 0, "http://b": 7}
    assert KF.read_dict(str(tmp_path / "missing")) is None


def test_load_name_dict_filters_alter_labels():
    rows = [
        {"subj": "e1", "attr": KF.ALTER_LABEL_PREDICATES[0], "value": "Name One"},
        {"subj": "e2", "attr": "http://other/pred", "value": "nope"},
        {"subj": "e3", "attr": KF.ALTER_LABEL_PREDICATES[1], "value": "Name Three"},
    ]
    out = KF.load_name_dict(ray.data.from_items(rows))
    assert out == {"e1": "Name One", "e3": "Name Three"}


def test_lsh_ann_recall_on_clustered_vectors():
    """LSH-bucketed ANN finds the true near neighbor when vectors cluster
    (the bucket containing the query holds its cluster)."""
    from ontoea_ray.stages.ann import brute_force_topk, lsh_bucketed_topk

    rng = np.random.default_rng(8)
    centers = rng.standard_normal((4, 24)) * 3
    vecs, ids = [], []
    for i in range(200):
        c = centers[i % 4]
        vecs.append(c + 0.1 * rng.standard_normal(24))
        ids.append(i)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    q = np.asarray(vecs[0])
    exact = brute_force_topk(ds, q[None, :], k=5)
    approx = lsh_bucketed_topk(ds, q[None, :], k=5, n_planes=6, hamming_radius=1)
    exact_ids = set(exact["vec_id"].to_pylist())
    approx_ids = set(approx["vec_id"].to_pylist())
    assert len(approx_ids & exact_ids) >= 4  # high recall on clustered data
    assert approx["vec_id"].to_pylist()[0] == 0  # the query itself ranks first


def test_replicated_pages_deterministic(sf_dir):
    from ontoea_ray.sources.pages import pages_from_documents

    a = {r["url"] for r in pages_from_documents(sf_dir, replicate=3).take_all()}
    b = {r["url"] for r in pages_from_documents(sf_dir, replicate=3).take_all()}
    assert a == b
    assert len(a) == 3 * 500


def test_manifest_lineage(sf_dir, tmp_path):
    from ontoea_ray.pipelines.kg_construct import kg_construct_pipeline, write_edge_table

    out = str(tmp_path / "edges")
    m = write_edge_table(
        kg_construct_pipeline(sf_dir, concurrency=2), out,
        num_buckets=2, lineage={"source": sf_dir},
    )
    assert m["lineage"]["source"] == sf_dir
    assert m["lineage"]["total_rows"] > 0
    assert m["lineage"]["engine"].startswith("ontoea_ray")
