"""q_kg_construct_fuzzy: deterministic typo injection + fuzzy-blocking
recovery (the north-star typo-robust flagship variant)."""

import numpy as np
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_inject_typos_deterministic_and_rule_exact(ray_session):
    from ontoea_ray.queries.composites import _TYPO_MOD, _TYPO_MULT, _inject_typos
    from ontoea_ray.stages.sampling import splitmix64

    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int64()),
            "text": pa.array(["join the scan table", "key agg row"]),
        }
    )
    out = _inject_typos(batch)
    out2 = _inject_typos(batch)
    assert out["text"].to_pylist() == out2["text"].to_pylist()
    # replay the rule by hand
    for did, txt, got in zip([7, 8], batch["text"].to_pylist(), out["text"].to_pylist()):
        toks = txt.split(" ")
        exp = []
        for i, t in enumerate(toks, start=1):
            h = int(splitmix64(np.array([did * _TYPO_MULT + i], np.uint64))[0])
            exp.append((t[0] + t) if h % _TYPO_MOD == 0 else t)
        assert got == " ".join(exp)


def test_fuzzy_flagship_recovers_typo_mentions(ray_session):
    """On the typo'd corpus, the fuzzy-blocked linker must emit strictly
    more mentions than the same gazetteer WITHOUT fuzzy candidates (typo'd
    entity tokens re-link), and its entity set must stay inside the clean
    gazetteer's URI space (candidates map to ORIGINAL entities only)."""
    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_from_corpus,
        construct_kg,
    )
    from ontoea_ray.queries.composites import typo_pages_from_documents
    from ontoea_ray.sources.pages import pages_from_documents
    from ontoea_ray.stages.extract import extract_text_stage

    typo_pages = typo_pages_from_documents(SF)
    clean_texts = extract_text_stage(pages_from_documents(SF))
    exact_state = bootstrap_linker_from_corpus(clean_texts)
    fuzzy_state = bootstrap_linker_from_corpus(
        extract_text_stage(pages_from_documents(SF)),
        fuzzy_blocking=True,
        fuzzy_jaccard_pct=33,
        fuzzy_max_cands=1,
        mention_texts=extract_text_stage(typo_pages_from_documents(SF)),
    )
    t_exact = pa.Table.from_pylist(
        construct_kg(typo_pages_from_documents(SF), exact_state).take_all()
    )
    t_fuzzy = pa.Table.from_pylist(construct_kg(typo_pages, fuzzy_state).take_all())
    n_exact = sum(t_exact["n_mentions"].to_pylist())
    n_fuzzy = sum(t_fuzzy["n_mentions"].to_pylist())
    assert n_fuzzy > n_exact, (n_fuzzy, n_exact)
    # fuzzy URIs all come from the clean gazetteer (no typo'd entities)
    clean_uris = set(exact_state.ent_uris.tolist())
    got_uris = set(t_fuzzy["subj"].to_pylist()) | set(t_fuzzy["obj"].to_pylist())
    assert got_uris <= clean_uris


def test_increment_resume_across_boundary(ray_session, tmp_path):
    """Restart at the increment boundary: a run that completed the BASE
    snapshot (written through the partitioned sink with its manifest) dies
    before ingesting the increment; the resumed run reads the base edge
    table back from the sink, constructs only the increment (through the
    WARC-lite round-trip), and re-enters the merge tail — the result must
    be row-identical to the fresh end-to-end q_kg_increment run."""
    import pandas as pd
    import ray

    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_cached,
        construct_kg_lifespan,
        write_edge_table,
    )
    from ontoea_ray.queries import QUERIES
    from ontoea_ray.queries.composites import (
        _increment_pages_via_warclite,
        _slice_pages,
        merge_and_label_increment,
    )

    def norm(res):
        df = pa.Table.from_pylist(res.take_all()).to_pandas()
        df = df[sorted(df.columns)]
        return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

    fresh = norm(QUERIES["q_kg_increment"](SF))

    # phase 1 (pre-crash): base snapshot through the resumable sink
    state = ray.put(bootstrap_linker_cached(SF))
    base = construct_kg_lifespan(_slice_pages(SF, keep_increment=False), state)
    out = str(tmp_path / "base_edges")
    manifest = write_edge_table(base.drop_columns(["span_s"]), out)
    assert all(v["complete"] for v in manifest["partitions"].values())

    # phase 2 (restart): base read back from the sink, increment only
    base2 = ray.data.read_parquet(out).drop_columns(["part"])
    inc = construct_kg_lifespan(_increment_pages_via_warclite(SF), state).drop_columns(
        ["span_s"]
    )
    resumed = norm(merge_and_label_increment(base2.materialize(), inc))
    pd.testing.assert_frame_equal(resumed, fresh)
