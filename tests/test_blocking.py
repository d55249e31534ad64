"""Cross-table char-shingle MinHash-LSH candidate blocking
(`stages/blocking.py`) — the north-star entity-linking blocking stage."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.lsh_sql import lsh_cross_verified_sql
from ontoea_ray.stages.blocking import (
    char_shingle_hashes,
    lsh_cross_candidates,
    lsh_link_candidates,
)

MENTIONS = [
    "table scan", "table scans", "tble scan", "merge join", "mrge join",
    "window fn", "windw fn", "hash join", "hash joins", "x", "",
    "completely unrelated surface",
]
ENTITIES = ["table scan", "merge join", "window fn", "hash join", "sort merge"]
KW = dict(jaccard_pct=40, num_perm=16, bands=8, shingle_n=3, seed=7, max_group=4000)


def _ds(col, vals):
    return ray.data.from_arrow(pa.table({col: pa.array(vals, pa.string())}))


def _oracle(mentions, entities, **kw):
    con = duckdb.connect()
    con.execute("CREATE TABLE m(id VARCHAR); CREATE TABLE e(id VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?)", [(x,) for x in mentions])
    con.executemany("INSERT INTO e VALUES (?)", [(x,) for x in entities])
    sql = lsh_cross_verified_sql("SELECT id FROM m", "SELECT id FROM e", **kw)
    return (
        con.execute(sql).df().sort_values(["mention", "entity"]).reset_index(drop=True)
    )


def test_link_candidates_bit_parity_with_oracle():
    out = lsh_link_candidates(_ds("mention", MENTIONS), _ds("entity", ENTITIES), **KW)
    eng = out.to_pandas().sort_values(["mention", "entity"]).reset_index(drop=True)
    ora = _oracle(MENTIONS, ENTITIES, **KW)
    for df in (eng, ora):
        df["inter_sz"] = df["inter_sz"].astype(np.int64)
        df["union_sz"] = df["union_sz"].astype(np.int64)
    assert len(eng) > 0
    pd.testing.assert_frame_equal(eng, ora)
    # typo recovery is the point of the stage
    got = set(zip(eng["mention"], eng["entity"]))
    assert ("tble scan", "table scan") in got
    assert ("mrge join", "merge join") in got
    assert not any(m == "completely unrelated surface" for m, _ in got)


def test_exact_surfaces_self_match_at_jaccard_one():
    out = lsh_link_candidates(_ds("mention", MENTIONS), _ds("entity", ENTITIES), **KW)
    df = out.to_pandas()
    exact = df[df["mention"] == df["entity"]]
    assert set(exact["mention"]) == set(MENTIONS) & set(ENTITIES)
    assert (exact["inter_sz"] == exact["union_sz"]).all()


def test_candidates_are_cross_side_only():
    # mentions contain two near-identical surfaces; they must never pair
    # with EACH OTHER, only with gazetteer rows
    pairs = lsh_cross_candidates(
        _ds("mention", ["abcdefgh", "abcdefgx"]), _ds("entity", ["zzzz"]),
        num_perm=16, bands=8, shingle_n=3, seed=7,
    ).to_pandas()
    assert len(pairs) == 0


def test_char_shingles_ascii_and_unicode_paths_agree():
    ascii_rows = ["table scan", "x", ""]
    # appending one non-ASCII row forces the utf-32 fallback for the batch
    mixed = pa.array(ascii_rows + ["日本語テキスト"], pa.string())
    pure = pa.array(ascii_rows, pa.string())
    fa, oa = char_shingle_hashes(pure, 3)
    fm, om = char_shingle_hashes(mixed, 3)
    n_ascii = int(oa[-1])
    assert np.array_equal(fa, fm[:n_ascii])
    assert np.array_equal(oa, om[: len(oa)])
    # empty string -> exactly one shingle (the FNV offset)
    assert oa[-1] - oa[-2] == 1


def test_short_and_empty_surfaces_round_trip_oracle():
    mentions = ["", "a", "ab", "abc", "ありがとう"]
    entities = ["a", "ab", "abc", "ありがと"]
    kw = dict(jaccard_pct=30, num_perm=16, bands=8, shingle_n=3, seed=7, max_group=100)
    eng = (
        lsh_link_candidates(_ds("mention", mentions), _ds("entity", entities), **kw)
        .to_pandas().sort_values(["mention", "entity"]).reset_index(drop=True)
    )
    ora = _oracle(mentions, entities, **kw)
    for df in (eng, ora):
        df["inter_sz"] = df["inter_sz"].astype(np.int64)
        df["union_sz"] = df["union_sz"].astype(np.int64)
    pd.testing.assert_frame_equal(eng, ora)
    assert ("ありがとう", "ありがと") in set(zip(eng["mention"], eng["entity"]))


def test_hot_bucket_cap_drops_and_survivors_match():
    # 60 mentions sharing one dominant shingle family blow the cap;
    # the oracle replays the same drop
    mentions = [f"aaaa{i:02d}" for i in range(60)] + ["zzzz42"]
    entities = ["aaaa99", "zzzz42"]
    kw = dict(jaccard_pct=10, num_perm=16, bands=8, shingle_n=3, seed=7, max_group=8)
    eng = (
        lsh_link_candidates(_ds("mention", mentions), _ds("entity", entities), **kw)
        .to_pandas().sort_values(["mention", "entity"]).reset_index(drop=True)
    )
    ora = _oracle(mentions, entities, **kw)
    for df in (eng, ora):
        df["inter_sz"] = df["inter_sz"].astype(np.int64)
        df["union_sz"] = df["union_sz"].astype(np.int64)
    pd.testing.assert_frame_equal(eng, ora)
    assert ("zzzz42", "zzzz42") in set(zip(eng["mention"], eng["entity"]))


def test_fuzzy_linker_bootstrap_links_typo_mentions():
    from ontoea_ray.pipelines.kg_construct import (
        bootstrap_linker_from_corpus,
        construct_kg,
    )
    from ontoea_ray.sources.pages import pages_from_texts

    # 'database' is the most frequent (gazetteer-grade) token; 'databasee'
    # is a doubled-letter typo (char-3-shingle Jaccard 6/7 ≈ 0.86) that
    # only appears in two pages
    base = "database stores database rows database index btree pages under load"
    texts = [base] * 30 + ["databasee index rebuild finished quickly today ok yes done"] * 2
    pages = pages_from_texts(texts)
    from ontoea_ray.stages.extract import extract_text_stage

    corpus = extract_text_stage(pages)
    exact = bootstrap_linker_from_corpus(corpus, n_entities=6, n_predicates=3)
    fuzzy = bootstrap_linker_from_corpus(
        corpus, n_entities=6, n_predicates=3, fuzzy_blocking=True, fuzzy_jaccard_pct=50
    )
    assert "databasee" not in set(exact.surfaces)
    assert "databasee" in set(fuzzy.surfaces)
    si = list(fuzzy.surfaces).index("databasee")
    cand_uris = {
        fuzzy.ent_uris[fuzzy.cand_ids[si, j]] for j in range(fuzzy.cand_counts[si])
    }
    assert "kg://ent/database" in cand_uris
    # end-to-end: the typo'd page emits triples through the fuzzy surface
    t_exact = construct_kg(pages, exact).to_pandas()
    t_fuzzy = construct_kg(pages, fuzzy).to_pandas()
    sub_exact = set(t_exact["subj"]) | set(t_exact["obj"])
    sub_fuzzy = set(t_fuzzy["subj"]) | set(t_fuzzy["obj"])
    assert sub_fuzzy >= sub_exact
    # determinism: rebuilt fuzzy state yields the identical edge table
    fuzzy2 = bootstrap_linker_from_corpus(
        corpus, n_entities=6, n_predicates=3, fuzzy_blocking=True, fuzzy_jaccard_pct=50
    )
    t_fuzzy2 = construct_kg(pages, fuzzy2).to_pandas()
    key = ["subj", "pred", "obj"]
    pd.testing.assert_frame_equal(
        t_fuzzy.sort_values(key).reset_index(drop=True),
        t_fuzzy2.sort_values(key).reset_index(drop=True),
    )
