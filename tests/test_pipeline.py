"""Flagship pipeline end-to-end on sf0.001 (M1/M6 milestones)."""

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ontoea_ray.pipelines.kg_construct import (
    bootstrap_linker_from_corpus,
    construct_kg,
    kg_construct_pipeline,
    write_edge_table,
)
from ontoea_ray.sources.pages import pages_from_documents
from ontoea_ray.stages.extract import extract_text_stage


def test_extraction_invariant_byte_identical(sf_dir):
    """north_rule invariant: extracted text per url == source text bytes."""
    pages = pages_from_documents(sf_dir)
    texts = extract_text_stage(pages)
    got = pa.Table.from_pylist(texts.take_all()).sort_by("url")
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    url = [
        f"https://{s}.example.org/doc/{d}"
        for d, s in zip(docs["doc_id"].to_pylist(), docs["source"].to_pylist())
    ]
    exp = pa.table({"url": url, "text": docs["text"]}).sort_by("url")
    assert got.column("url").to_pylist() == exp.column("url").to_pylist()
    for a, b in zip(got.column("text").to_pylist(), exp.column("text").to_pylist()):
        assert a.encode() == b.encode()


def test_kg_construct_end_to_end(sf_dir, tmp_path):
    triples = kg_construct_pipeline(sf_dir, concurrency=2, batch_size=256)
    tbl = pa.Table.from_pylist(triples.take_all())
    assert tbl.num_rows > 0
    assert set(tbl.column_names) >= {"subj", "pred", "obj", "first_url", "n_mentions"}
    # dedup really deduplicated
    keys = list(zip(tbl["subj"].to_pylist(), tbl["pred"].to_pylist(), tbl["obj"].to_pylist()))
    assert len(keys) == len(set(keys))
    # all subjects/objects are canonical entity URIs
    assert all(s.startswith("kg://ent/") for s in tbl["subj"].to_pylist())
    assert all(o.startswith("kg://ent/") for o in tbl["obj"].to_pylist())

    # determinism: a second run yields the identical triple set
    tbl2 = pa.Table.from_pylist(kg_construct_pipeline(sf_dir, concurrency=2, batch_size=256).take_all())
    keys2 = set(zip(tbl2["subj"].to_pylist(), tbl2["pred"].to_pylist(), tbl2["obj"].to_pylist()))
    assert set(keys) == keys2

    # partitioned, resumable sink
    out = str(tmp_path / "edges")
    manifest = write_edge_table(triples, out, num_buckets=4)
    total = sum(v["rows"] for v in manifest["partitions"].values())
    assert total == tbl.num_rows
    back = ray.data.read_parquet(out).take_all()
    assert len(back) == tbl.num_rows


def test_scan_link_oracle_small(sf_dir):
    """Triple extraction P/R vs a directly-computed oracle on a small slice:
    the pipeline's raw scan must equal the pure-python pattern scan."""
    import ray

    from ontoea_ray.stages.scan_link import ScanAndLink

    pages = pages_from_documents(sf_dir)
    texts = extract_text_stage(pages).limit(50)
    state = bootstrap_linker_from_corpus(extract_text_stage(pages_from_documents(sf_dir)))
    rows = texts.take_all()
    got = ScanAndLink(state)(pa.Table.from_pylist(rows))

    surf = set(state.surfaces.tolist())
    preds = set(state.predicates.tolist())
    cand1 = {
        s: state.ent_uris[state.cand_ids[i, 0]]
        for i, s in enumerate(state.surfaces.tolist())
        if state.cand_counts[i] == 1
    }
    expected = []
    for r in rows:
        toks = r["text"].split(" ")
        for i in range(len(toks) - 2):
            if toks[i] in surf and toks[i + 1] in preds and toks[i + 2] in surf:
                expected.append((cand1[toks[i]], toks[i + 1], cand1[toks[i + 2]], r["url"]))
    got_keys = list(zip(got["subj"].to_pylist(), got["pred"].to_pylist(), got["obj"].to_pylist(), got["url"].to_pylist()))
    assert got_keys == expected


def test_kg_upsert_associative_commutative(ray_session):
    import pyarrow as pa
    import ray.data

    from ontoea_ray.pipelines.kg_construct import kg_upsert

    def edges(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "subj": pa.array([r[0] for r in rows], pa.string()),
                    "pred": pa.array([r[1] for r in rows], pa.string()),
                    "obj": pa.array([r[2] for r in rows], pa.string()),
                    "first_url": pa.array([r[3] for r in rows], pa.string()),
                    "n_mentions": pa.array([r[4] for r in rows], pa.int64()),
                }
            )
        )

    a = edges([("s", "p", "o", "u5", 1), ("s2", "p", "o", "u1", 2)])
    b = edges([("s", "p", "o", "u3", 4)])
    c = edges([("s", "p", "o", "u9", 8), ("s3", "q", "o", "u2", 1)])

    def canon(ds):
        return sorted(
            (tuple(sorted(r.items())) for r in ds.take_all()),
        )

    left = canon(kg_upsert(kg_upsert(a, b), c))
    right = canon(kg_upsert(a, kg_upsert(b, c)))
    flipped = canon(kg_upsert(c, kg_upsert(b, a)))
    assert left == right == flipped
    merged = {r["subj"]: (r["n_mentions"], r["first_url"])
              for r in kg_upsert(kg_upsert(a, b), c).take_all()}
    assert merged["s"] == (13, "u3")


def test_triple_precision_recall_meets_north_rule(sf_dir):
    """north_rule headline: emitted-triple precision/recall >= 0.95 against
    an independently computed oracle over the FULL sf0.001 corpus.

    Oracle = pure-Python pattern scan (surface, predicate, surface) over
    the extracted texts, canonicalized through single-candidate surfaces
    (the unambiguous subset — ambiguity resolution has its own gate in
    test_linker_disambiguation); the engine's distinct (subj, pred, obj)
    set restricted to that subset must match it at P and R >= 0.95 (it
    measures exactly 1.0 today — the assert keeps the rule's bound)."""
    from ontoea_ray.pipelines.kg_construct import bootstrap_linker_cached

    state = bootstrap_linker_from_corpus(extract_text_stage(pages_from_documents(sf_dir)))
    surf = set(state.surfaces.tolist())
    preds = set(state.predicates.tolist())
    cand1 = {
        s: state.ent_uris[state.cand_ids[i, 0]]
        for i, s in enumerate(state.surfaces.tolist())
        if state.cand_counts[i] == 1
    }
    texts = pa.Table.from_pylist(
        extract_text_stage(pages_from_documents(sf_dir)).take_all()
    )
    oracle = set()
    for t in texts["text"].to_pylist():
        toks = t.split(" ")
        for i in range(len(toks) - 2):
            a, p, b = toks[i], toks[i + 1], toks[i + 2]
            if a in cand1 and p in preds and b in cand1:
                oracle.add((cand1[a], p, cand1[b]))

    got_tbl = pa.Table.from_pylist(kg_construct_pipeline(sf_dir).take_all())
    unambiguous = set(cand1.values())
    got = {
        (s, p, o)
        for s, p, o in zip(
            got_tbl["subj"].to_pylist(), got_tbl["pred"].to_pylist(), got_tbl["obj"].to_pylist()
        )
        if s in unambiguous and o in unambiguous
    }
    tp = len(got & oracle)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(oracle), 1)
    assert len(oracle) > 100
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
