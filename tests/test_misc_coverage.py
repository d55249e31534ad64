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


def test_read_pair_ids(tmp_path):
    p = tmp_path / "pairs"
    p.write_text("0\t5\n3\t7\n")
    assert KF.read_pair_ids(str(p)) == [(0, 5), (3, 7)]
    assert KF.read_pair_ids(str(tmp_path / "missing")) is None
    bad = tmp_path / "bad"
    bad.write_text("1\t2\t3\n")
    import pytest

    with pytest.raises(ValueError):
        KF.read_pair_ids(str(bad))


def test_load_crossview_link_duplicate_raises(tmp_path):
    ok = tmp_path / "cv"
    ok.write_text("e1 c1\ne2 c2\n")
    assert KF.load_crossview_link(str(ok)) == {"e1": "c1", "e2": "c2"}
    dup = tmp_path / "cv_dup"
    dup.write_text("e1 c1\ne1 c2\n")
    import pytest

    with pytest.raises(ValueError, match="one to many"):
        KF.load_crossview_link(str(dup))


def test_read_word2vec_and_si_init(tmp_path):
    """Reference .vec parse semantics: dim+1 fields only, float-parse skip,
    lowercased keys; SI init differs from pure-random init on matched
    tokens (verdict round-1 item 6)."""
    from ontoea_ray.stages.name_init import NameEmbedInit, local_name_tokens, read_word2vec

    vec = tmp_path / "toy.vec"
    vec.write_text(
        "3 4\n"                       # header line (2 fields -> skipped)
        "Alpha 1.0 0.0 0.0 0.0\n"
        "beta 0.0 1.0 0.0 0.0\n"
        "bad 0.0 x 0.0 0.0\n"         # unparsable float -> skipped
        "short 1.0 2.0\n"             # wrong arity -> skipped
    )
    w2v = read_word2vec(str(vec), 4)
    assert set(w2v) == {"alpha", "beta"}
    assert w2v["alpha"].tolist() == [1.0, 0.0, 0.0, 0.0]

    # MED-BBK @@ quirk: last @@ segment used character-wise
    assert local_name_tokens("kg@@Ab1") == ["a", "b", "1"]
    assert local_name_tokens("http://x/Some_Name") == ["some", "name"]

    init_with = NameEmbedInit(w2v, 4, seed=1)
    init_without = NameEmbedInit({}, 4, seed=1)
    v_match = init_with._one("http://x/alpha")
    v_plain = init_without._one("http://x/alpha")
    v_nomatch_a = init_with._one("http://x/unknowntoken")
    v_nomatch_b = init_without._one("http://x/unknowntoken")
    assert not np.allclose(v_match, v_plain)       # word vector shifted the init
    assert np.allclose(v_nomatch_a, v_nomatch_b)   # unmatched tokens unchanged


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


def test_cosine_neardup_lsh_recall_on_clustered_vectors():
    """Embedding near-dup: the LSH-bucketed scale path recovers (almost)
    all exact pairs on clustered vectors and never emits a false pair."""
    from ontoea_ray.stages.ann import cosine_neardup_pairs

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((5, 32)) * 3
    vecs = [centers[i % 5] + 0.05 * rng.standard_normal(32) for i in range(100)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(100), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    exact = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(ds, threshold=0.95).take_all()}
    lsh = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(ds, threshold=0.95, n_planes=6).take_all()
    }
    assert lsh <= exact                      # precision exact (verified pairs)
    assert len(exact) > 50                   # clusters produce real pairs
    assert len(lsh & exact) / len(exact) >= 0.9  # high recall at high cosine


def test_lsh_index_prunes_reads_and_matches_scan(tmp_path):
    """The persisted bucket-partitioned index answers identically to the
    index-free signature scan AND reads far fewer rows than the table."""
    from ontoea_ray.stages.ann import build_lsh_index, lsh_bucketed_topk, lsh_index_topk

    rng = np.random.default_rng(8)
    centers = rng.standard_normal((4, 24)) * 3
    vecs = [centers[i % 4] + 0.1 * rng.standard_normal(24) for i in range(400)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(400), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "annidx")
    build_lsh_index(ds, idx_dir, n_planes=6)
    q = np.asarray(vecs[0])
    scan = lsh_bucketed_topk(ds, q[None, :], k=5, n_planes=6, hamming_radius=1)
    from_index, stats = lsh_index_topk(idx_dir, q[None, :], k=5, hamming_radius=1, return_stats=True)
    assert from_index["vec_id"].to_pylist() == scan["vec_id"].to_pylist()
    assert from_index["rnk"].to_pylist() == scan["rnk"].to_pylist()
    # read pruning: the scanned partitions hold far fewer rows than the table
    assert 0 < stats["scanned_rows"] < 400 * 0.5
    assert stats["scanned_buckets"] < stats["total_buckets"]


def test_ivf_index_recall_and_pruning(tmp_path):
    """IVF: nprobe lists recover the brute-force top-k on clustered data
    while reading a fraction of the table; deterministic per seed."""
    from ontoea_ray.stages.ann import brute_force_topk, build_ivf_index, ivf_index_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = [centers[i % 8] + 0.1 * rng.standard_normal(24) for i in range(600)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(600), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "ivfidx")
    build_ivf_index(ds, idx_dir, n_centroids=16, sample_size=600, seed=7)
    qs = np.stack([vecs[0], vecs[3]])
    exact = brute_force_topk(ds, qs, k=10)
    approx, stats = ivf_index_topk(idx_dir, qs, k=10, nprobe=3, return_stats=True)
    for qi in (0, 1):
        e = set(exact.filter(pa.compute.equal(exact["query_id"], qi))["vec_id"].to_pylist())
        a = set(approx.filter(pa.compute.equal(approx["query_id"], qi))["vec_id"].to_pylist())
        assert len(a & e) / len(e) >= 0.9, (qi, a, e)
    assert 0 < stats["scanned_rows"] < 600 * 0.6
    assert stats["scanned_lists"] < stats["total_lists"]
    again, _ = ivf_index_topk(idx_dir, qs, k=10, nprobe=3, return_stats=True)
    assert again["vec_id"].to_pylist() == approx["vec_id"].to_pylist()


def test_ivf_integer_quantizer_recall_and_pruning(tmp_path):
    """The SQL-replayable integer-k-means IVF variant (the q_ann_ivf
    oracle path) must keep the same recall/pruning properties as the float
    quantizer on clustered data."""
    from ontoea_ray.stages.ann import brute_force_topk, build_ivf_index, ivf_index_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = [centers[i % 8] + 0.1 * rng.standard_normal(24) for i in range(600)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(600), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "ivfint")
    build_ivf_index(
        ds, idx_dir, n_centroids=16, sample_size=600, iters=4,
        quantizer="integer", scale=1000,
    )
    qs = np.stack([vecs[0], vecs[3]])
    exact = brute_force_topk(ds, qs, k=10)
    approx, stats = ivf_index_topk(idx_dir, qs, k=10, nprobe=3, return_stats=True)
    for qi in (0, 1):
        e = set(exact.filter(pa.compute.equal(exact["query_id"], qi))["vec_id"].to_pylist())
        a = set(approx.filter(pa.compute.equal(approx["query_id"], qi))["vec_id"].to_pylist())
        assert len(a & e) / len(e) >= 0.9, (qi, a, e)
    assert 0 < stats["scanned_rows"] < 600 * 0.6
    assert stats["scanned_lists"] < stats["total_lists"]


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


def test_jsonl_pages_roundtrip(sf_dir, tmp_path):
    """Sharded JSONL pages read back identical to the parquet-derived pages
    table (ISO timestamps parsed, html rebuilt from text when omitted)."""
    import json

    from ontoea_ray.sources.pages import pages_from_documents, read_pages_jsonl

    want = sorted(pages_from_documents(sf_dir).take_all(), key=lambda r: r["url"])
    # write 3 JSONL shards WITHOUT html (the shard-omits-html path)
    shards = [[] for _ in range(3)]
    for i, r in enumerate(want):
        shards[i % 3].append(
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"].isoformat(),
                "text": r["text"],
                "lang": r["lang"],
            }
        )
    paths = []
    for i, rows in enumerate(shards):
        p = tmp_path / f"pages-{i}.jsonl"
        p.write_text("\n".join(json.dumps(x) for x in rows) + "\n")
        paths.append(str(p))
    got = sorted(read_pages_jsonl(paths).take_all(), key=lambda r: r["url"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["url"] == w["url"]
        assert g["warc_ts"] == w["warc_ts"]
        assert g["text"] == w["text"]
        assert g["lang"] == w["lang"]
        assert bytes(g["html"]) == bytes(w["html"])


def test_read_pages_autowraps_documents_schema(sf_dir):
    """read_pages on the driver's documents.parquet must detect the schema
    and produce the identical pages table the canonical wrapper builds
    (the CLI `construct --pages documents.parquet` path)."""
    from ontoea_ray.sources.pages import pages_from_documents, read_pages

    got = sorted(
        read_pages(f"{sf_dir}/documents.parquet").take_all(), key=lambda r: r["url"]
    )
    want = sorted(pages_from_documents(sf_dir).take_all(), key=lambda r: r["url"])
    assert len(got) == len(want)
    assert got == want


def test_pq_index_recall_and_compression(tmp_path):
    """PQ serving pipeline: ADC shortlist over the code table + exact
    rerank of only the shortlisted raw rows recovers the brute-force
    top-k; the code table stores only m int columns (no raw vectors);
    pure-ADC ranking is deterministic and integer-exact."""
    from ontoea_ray.stages.ann import brute_force_topk, build_pq_index, pq_index_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 24)) * 3
    vecs = [centers[i % 8] + 0.8 * rng.standard_normal(24) for i in range(600)]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(600), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    idx_dir = str(tmp_path / "pqidx")
    meta = build_pq_index(ds, idx_dir, m=4, ksub=16, iters=4, sample_size=600)
    assert meta["dsub"] == 6
    qs = np.stack([vecs[0], vecs[3]])
    exact = brute_force_topk(ds, qs, k=10)
    approx = pq_index_topk(idx_dir, qs, k=10, rerank_against=ds, shortlist=100)
    for qi in (0, 1):
        e = set(exact.filter(pa.compute.equal(exact["query_id"], qi))["vec_id"].to_pylist())
        a = set(approx.filter(pa.compute.equal(approx["query_id"], qi))["vec_id"].to_pylist())
        assert len(a & e) / len(e) >= 0.9, (qi, a, e)
    # compression: the code table carries only id + m code columns
    import pyarrow.parquet as pq_mod
    import glob

    files = glob.glob(f"{idx_dir}/*.parquet")
    assert files
    names = set(pq_mod.read_schema(files[0]).names)
    # id + m code columns + the int64 qerr distortion column (the upsert
    # drift baseline; queries column-prune it away at read)
    assert names == {"vec_id", "code_0", "code_1", "code_2", "code_3", "qerr"}
    # pure-ADC ranking (the oracle path): deterministic, integer adist
    adc = pq_index_topk(idx_dir, qs, k=10)
    again = pq_index_topk(idx_dir, qs, k=10)
    assert again["vec_id"].to_pylist() == adc["vec_id"].to_pylist()
    assert again["adist"].to_pylist() == adc["adist"].to_pylist()


def test_pq_codebooks_deterministic_and_subspace_shaped(tmp_path):
    """Codebook training is a pure function of the input (hash-ordered
    sample, integer Lloyd) — two trainings agree bit-for-bit and the
    shape is [m, ksub, dim // m]."""
    from ontoea_ray.stages.ann import train_pq_codebooks_integer

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 16))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs]),
        }
    )
    a = train_pq_codebooks_integer(
        ray.data.from_arrow(tbl), m=2, ksub=4, iters=3, sample_size=200
    )
    b = train_pq_codebooks_integer(
        ray.data.from_arrow(tbl).repartition(7), m=2, ksub=4, iters=3, sample_size=200
    )
    assert a.shape == (2, 4, 8)
    assert (a == b).all()


def test_lsh_index_upsert_equals_full_build(tmp_path):
    """Incremental insert: build on half, upsert the rest -> queries answer
    identically to a from-scratch full build (same seed = same planes)."""
    from ontoea_ray.stages.ann import build_lsh_index, lsh_index_topk, lsh_index_upsert

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = [centers[i % 4] + 0.1 * rng.standard_normal(16) for i in range(300)]

    def _ds(lo, hi):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(lo, hi), pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs[lo:hi]]),
                }
            )
        )

    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")
    build_lsh_index(_ds(0, 150), inc_dir, n_planes=6)
    meta = lsh_index_upsert(_ds(150, 300), inc_dir)
    assert meta["n_added"] == 150
    build_lsh_index(_ds(0, 300), full_dir, n_planes=6)

    q = np.asarray(vecs[7])[None, :]
    a = lsh_index_topk(inc_dir, q, k=8, hamming_radius=1)
    b = lsh_index_topk(full_dir, q, k=8, hamming_radius=1)
    assert a["vec_id"].to_pylist() == b["vec_id"].to_pylist()
    assert a["rnk"].to_pylist() == b["rnk"].to_pylist()
    # the upserted half is actually visible (some hit id >= 150)
    assert any(v >= 150 for v in a["vec_id"].to_pylist())


def test_ivf_index_upsert_equals_full_build(tmp_path):
    """IVF incremental insert: build on half, upsert the rest -> queries
    answer identically to a from-scratch build trained on the SAME half
    (the centroids are persisted, so only the training set matters)."""
    from ontoea_ray.stages.ann import build_ivf_index, ivf_index_topk, ivf_index_upsert

    rng = np.random.default_rng(33)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = [centers[i % 4] + 0.1 * rng.standard_normal(16) for i in range(240)]

    def _ds(lo, hi):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(lo, hi), pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs[lo:hi]]),
                }
            )
        )

    inc_dir = str(tmp_path / "ivf_inc")
    build_ivf_index(_ds(0, 120), inc_dir, n_centroids=4, sample_size=120, iters=8)
    meta = ivf_index_upsert(_ds(120, 240), inc_dir)
    assert meta["n_added"] == 120

    q = np.asarray(vecs[3])[None, :]
    res = ivf_index_topk(inc_dir, q, k=8, nprobe=2)
    ids = res["vec_id"].to_pylist()
    assert len(ids) == 8
    assert any(v >= 120 for v in ids)  # upserted rows surface
    # every hit is from the query's own cluster (index semantics intact)
    assert all(v % 4 == 3 for v in ids)


def test_pq_index_upsert_equals_frozen_codebook_encode(tmp_path):
    """PQ incremental insert: build on half, upsert the rest -> (a) the
    query ranking equals a test-side numpy replay that encodes the FULL
    corpus with the frozen build codebooks (upsert == full re-encode, no
    index rewrite), (b) an in-distribution increment reports drift ~1 /
    no rebuild, (c) a shifted increment trips rebuild_recommended."""
    from ontoea_ray.stages.ann import build_pq_index, pq_index_topk, pq_index_upsert

    rng = np.random.default_rng(44)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = [centers[i % 4] + 0.1 * rng.standard_normal(16) for i in range(240)]

    def _ds(lo, hi, shift=0.0):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(lo, hi), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, np.asarray(v) + shift)) for v in vecs[lo:hi]]
                    ),
                }
            )
        )

    d = str(tmp_path / "pq")
    build_pq_index(_ds(0, 120), d, m=2, ksub=4, iters=3, sample_size=120)
    meta = pq_index_upsert(_ds(120, 240), d)
    assert meta["n_added"] == 120
    assert meta["drift"] is not None and meta["drift"] < 1.5
    assert not meta["rebuild_recommended"]

    # numpy replay: encode EVERY row with the persisted codebooks, rank by
    # the query's asymmetric LUT distance (adist ASC, vec_id ASC)
    books = np.load(f"{d}/_codebooks.npy")
    q = np.asarray(vecs[3])[None, :]
    qq = np.floor(np.asarray(q, np.float64) * 1000).astype(np.int64)[0]
    allq = np.floor(np.asarray(vecs, np.float64) * 1000).astype(np.int64)
    dsub = books.shape[2]
    adist = np.zeros(len(vecs), np.int64)
    for s in range(2):
        sub = allq[:, s * dsub : (s + 1) * dsub]
        dist = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        code = np.argmin(dist, axis=1)
        lut = ((qq[s * dsub : (s + 1) * dsub][None, :] - books[s]) ** 2).sum(axis=1)
        adist += lut[code]
    order = np.lexsort((np.arange(len(vecs)), adist))[:8]
    res = pq_index_topk(d, q, k=8)
    assert res["vec_id"].to_pylist() == [int(i) for i in order]
    assert res["adist"].to_pylist() == [int(adist[i]) for i in order]
    # upserted rows are in the code table (PQ ties break to low ids, so
    # the top-8 itself may legitimately be all build-half rows)
    got_ids = {r["vec_id"] for r in ray.data.read_parquet(d, columns=["vec_id"]).take_all()}
    assert got_ids == set(range(240))

    # far-out-of-distribution increment -> distortion blows past threshold
    d2 = str(tmp_path / "pq2")
    build_pq_index(_ds(0, 120), d2, m=2, ksub=4, iters=3, sample_size=120)
    meta2 = pq_index_upsert(_ds(120, 240, shift=25.0), d2)
    assert meta2["drift"] > 1.5 and meta2["rebuild_recommended"]


def test_pq_upsert_zero_baseline_still_detects_drift(tmp_path):
    """A perfectly-fitting build (mean_qerr == 0: every vector IS a
    centroid) must not disable the drift detector — a distorted increment
    reads drift = inf and trips the rebuild flag."""
    from ontoea_ray.stages.ann import build_pq_index, pq_index_upsert

    base_vecs = np.eye(4, 16) * 2.0  # 4 distinct vectors, 120 copies
    def _ds(lo, hi, shift=0.0):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(lo, hi), pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, base_vecs[i % 4] + shift)) for i in range(lo, hi)]
                    ),
                }
            )
        )

    d = str(tmp_path / "pq0")
    build_pq_index(_ds(0, 120), d, m=2, ksub=4, iters=3, sample_size=120)
    import json as _json

    assert _json.load(open(f"{d}/_meta.json"))["mean_qerr"] == 0.0
    meta = pq_index_upsert(_ds(120, 240, shift=7.0), d)
    assert meta["drift"] == float("inf") and meta["rebuild_recommended"]
    # identical-distribution increment on the zero baseline: drift 1, calm
    d2 = str(tmp_path / "pq1")
    build_pq_index(_ds(0, 120), d2, m=2, ksub=4, iters=3, sample_size=120)
    meta2 = pq_index_upsert(_ds(120, 240), d2)
    assert meta2["drift"] == 1.0 and not meta2["rebuild_recommended"]
