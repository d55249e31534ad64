"""Unit gates for the round-2 analytics kernels that the oracle gate
exercises only end-to-end: Pareto-front edge cases, bottom-k-by-hash
block-structure invariance, and the shared HLL rho kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.queries import _pareto_front
from ontoea_ray.stages.sketch import bit_length64, hll_rho


def _front_brute(df: pd.DataFrame) -> set:
    rows = list(df.itertuples(index=False))
    out = set()
    for a in rows:
        dominated = any(
            b.psize >= a.psize
            and b.price_cents >= a.price_cents
            and (b.psize > a.psize or b.price_cents > a.price_cents)
            for b in rows
        )
        if not dominated:
            out.add((a.p_partkey, a.psize, a.price_cents))
    return out


def test_pareto_front_matches_brute_force_with_ties():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(200, dtype=np.int64),
            "psize": rng.integers(0, 8, 200).astype(np.int64),
            "price_cents": rng.integers(0, 10, 200).astype(np.int64),
        }
    )
    got = {tuple(r) for r in _pareto_front(df)[["p_partkey", "psize", "price_cents"]].to_numpy()}
    assert got == _front_brute(df)


def test_pareto_front_keeps_all_exact_ties():
    df = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], np.int64),
            "psize": np.array([5, 5, 4], np.int64),
            "price_cents": np.array([9, 9, 10], np.int64),
        }
    )
    got = set(_pareto_front(df)["p_partkey"])
    # rows 1 and 2 tie on both axes (neither dominates); row 3 trades size
    # for price — all three are maximal
    assert got == {1, 2, 3}


def test_pareto_front_is_block_decomposable():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "p_partkey": np.arange(500, dtype=np.int64),
            "psize": rng.integers(0, 50, 500).astype(np.int64),
            "price_cents": rng.integers(0, 1000, 500).astype(np.int64),
        }
    )
    whole = _pareto_front(df)[["p_partkey"]].sort_values("p_partkey").reset_index(drop=True)
    parts = [df.iloc[i::3] for i in range(3)]
    merged = _pareto_front(pd.concat([_pareto_front(p) for p in parts], ignore_index=True))
    merged = merged[["p_partkey"]].sort_values("p_partkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(whole, merged)


def test_bottomk_sample_invariant_to_block_structure(sf_dir):
    from ontoea_ray.queries import QUERIES

    base = QUERIES["q_bottomk_sample"](sf_dir)["doc_id"].to_pylist()
    assert len(base) == 100 and len(set(base)) == 100

    # replay the same reduction over a different block decomposition
    import pyarrow.parquet as pq

    from ontoea_ray.stages.sampling import splitmix64

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ids = np.asarray(tbl["doc_id"].to_pylist(), np.int64)
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(ids))
    h = splitmix64(ids[perm].view(np.uint64))
    order = np.lexsort((ids[perm], h))[:100]
    assert sorted(ids[perm][order].tolist()) == sorted(base)


def test_bit_length64_and_hll_rho():
    x = np.array([0, 1, 2, 3, 255, 256, 2**40, 2**63], np.uint64)
    assert bit_length64(x).tolist() == [0, 1, 2, 2, 8, 9, 41, 64]
    # rho over a 56-bit remainder: zero -> nbits+1; top-bit-set -> 1
    rest = np.array([0, 1, 2**55], np.uint64)
    assert hll_rho(rest, 56).tolist() == [57, 56, 1]


def test_retention_counts_match_manual(sf_dir):
    from ontoea_ray.queries import QUERIES

    got = pa.Table.from_pylist(QUERIES["q_retention"](sf_dir).take_all()).to_pandas()
    ev = pa.Table.from_pylist(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).take_all()
    ).to_pandas()
    ev["day"] = (ev["ts"].dt.floor("D") - pd.Timestamp(0)) // pd.Timedelta(seconds=1)
    d = ev[["user_id", "day"]].drop_duplicates()
    coh = d.groupby("user_id")["day"].transform("min")
    man = (
        pd.DataFrame({"cohort": coh, "day_offset": (d["day"] - coh) // 86400})
        .groupby(["cohort", "day_offset"])
        .size()
        .reset_index(name="n_users")
    )
    got = got.sort_values(["cohort", "day_offset"]).reset_index(drop=True)
    man = man.sort_values(["cohort", "day_offset"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), man.astype(np.int64))


def test_edit1_pairs_synthetic_including_nonascii_and_lengths():
    import itertools

    import ray.data as rd

    from ontoea_ray.stages.fuzzy import edit1_pairs

    names = ["abc", "abd", "ab", "abcd", "xyz", "äbc", "äbd", "abc", "a", "b", ""]
    ds = rd.from_items([{"c_name": n} for n in names])
    got = set(
        map(tuple, pa.Table.from_pylist(edit1_pairs(ds, "c_name").take_all()).to_pandas().values)
    )

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev = m[:]
            m[0] = i
            for j, cb in enumerate(b, 1):
                m[j] = min(prev[j] + 1, m[j - 1] + 1, prev[j - 1] + (ca != cb))
        return m[-1]

    uniq = sorted(set(names))
    expect = {(a, b) for a, b in itertools.combinations(uniq, 2) if lev(a, b) == 1}
    assert got == expect


def test_edit1_pairs_mixed_utf8_byte_lengths():
    """Regression: groups with equal CHAR length but mixed UTF-8 BYTE
    lengths (e.g. {'ba', '日a'} — 2 vs 4 bytes, total divisible by group
    size) must not take the misaligned byte-matrix path; and equal-byte
    multi-byte substitutions ('日a' vs 'あa' — edit distance 1 but 3 byte
    diffs) must still be found."""
    import itertools

    import ray.data as rd

    from ontoea_ray.stages.fuzzy import edit1_pairs

    names = ["ba", "日a", "あa", "日b", "za", "日", "あ"]
    ds = rd.from_items([{"c_name": n} for n in names])
    got = set(
        map(tuple, pa.Table.from_pylist(edit1_pairs(ds, "c_name").take_all()).to_pandas().values)
    )

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev = m[:]
            m[0] = i
            for j, cb in enumerate(b, 1):
                m[j] = min(prev[j] + 1, m[j - 1] + 1, prev[j - 1] + (ca != cb))
        return m[-1]

    uniq = sorted(set(names))
    expect = {(a, b) for a, b in itertools.combinations(uniq, 2) if lev(a, b) == 1}
    assert got == expect


def test_weighted_sample_prefers_heavy_rows(sf_dir):
    """Weight = n_chars: the weighted sample's mean doc length must exceed
    the unweighted bottom-k sample's (statistical sanity, deterministic
    given the fixed hash)."""
    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES

    w = QUERIES["q_weighted_sample"](sf_dir)["doc_id"].to_pylist()
    u = QUERIES["q_bottomk_sample"](sf_dir)["doc_id"].to_pylist()
    assert len(w) == 100 and len(set(w)) == 100
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    nm = dict(zip(tbl["doc_id"], tbl["n_chars"]))
    assert np.mean([nm[i] for i in w]) > np.mean([nm[i] for i in u])


def test_csv_jsonl_round_trip_matches_parquet(sf_dir, tmp_path):
    """documents (parquet) -> CSV and JSONL -> read back through the
    tabular sources == the parquet read, column-pruned both ways."""
    import pyarrow.parquet as pq

    from ontoea_ray.sources.tabular import (
        read_csv_table,
        read_jsonl_table,
        write_csv,
        write_jsonl,
    )

    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    csv_dir, jsonl_dir = str(tmp_path / "csv"), str(tmp_path / "jsonl")
    write_csv(base, csv_dir)
    write_jsonl(base, jsonl_dir)

    want = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for rd in (
        read_csv_table(csv_dir, columns=["doc_id", "lang", "n_chars"]),
        read_jsonl_table(jsonl_dir, columns=["doc_id", "lang", "n_chars"]),
    ):
        got = (
            pa.Table.from_pylist(rd.take_all())
            .to_pandas()[["doc_id", "lang", "n_chars"]]
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype({"doc_id": np.int64, "n_chars": np.int64}),
                                      want.astype({"doc_id": np.int64, "n_chars": np.int64}))


def test_bpe_merges_hand_oracle_and_run_semantics():
    """BPE on a crafted corpus: merge 0 must be ('a','a') from 'aaaa'
    (weight 3 words x 3 pairs = 9 pre-merge pairs but SELECTION counts all
    adjacent pairs; after merging, 'aaaa' -> 'aa'+'aa' exercises the
    non-overlapping run rule), and the applied sequences must reflect
    left-to-right greedy merging."""
    import ray.data as rd

    from ontoea_ray.stages.bpe import bpe_merges

    docs = rd.from_items([{"text": "aaaa aaaa aaa bc bc bc bc"}])
    out = bpe_merges(docs, n_merges=2).to_pandas()
    # pair counts at it 0: (a,a) = 2*3 + 1*2 = 8; (b,c) = 4 -> pick (a,a)
    assert (out.loc[0, "left"], out.loc[0, "right"], out.loc[0, "n"]) == ("a", "a", 8)
    # after merge: 'aaaa' -> [aa, aa] (runs merge pairwise), 'aaa' -> [aa, a]
    # it 1 pairs: (aa,aa)=2, (aa,a)=1, (b,c)=4 -> pick (b,c)
    assert (out.loc[1, "left"], out.loc[1, "right"], out.loc[1, "n"]) == ("b", "c", 4)


def test_redirect_chains_properties():
    """Pointer doubling resolves every chain: finals are terminal (their own
    fixpoint), hop counts equal the per-doc halving walk, and redirecting
    docs always advance (n_hops >= 1)."""
    from ontoea_ray.queries import QUERIES
    from ontoea_ray.stages.sampling import splitmix64

    df = QUERIES["q_redirect_chains"]("/root/testdata/sf0.001").to_pandas()
    ids = df["doc_id"].to_numpy(np.int64)
    h = splitmix64(ids.astype(np.uint64))
    redirects = (ids > 0) & (h % np.uint64(3) != 0)
    red = dict(zip(ids.tolist(), redirects.tolist()))

    by_id = df.set_index("doc_id")
    # finals are terminal
    finals = df["final_doc"].unique()
    assert not any(red[int(f)] for f in finals)
    # per-doc replay of the halving walk
    for doc in ids[:200]:
        cur, hops = int(doc), 0
        while red[cur]:
            cur //= 2
            hops += 1
        row = by_id.loc[int(doc)]
        assert int(row["final_doc"]) == cur and int(row["n_hops"]) == hops
    assert (df.loc[redirects, "n_hops"] >= 1).all()
    assert (df.loc[~redirects, "n_hops"] == 0).all()


def test_redirect_chains_budget_paths_equal(monkeypatch):
    """Forcing budget=0 routes q_redirect_chains through the exchange-plan
    doubling loop; it must be row-identical to the single-task plan."""
    from ontoea_ray.queries import QUERIES

    fast = (
        QUERIES["q_redirect_chains"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setenv("ONTOEA_BROADCAST_BUDGET_BYTES", "1")
    slow = (
        QUERIES["q_redirect_chains"]("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_winnow_fingerprints_hand_paths(tmp_path):
    """Winnowing edge paths on a hand corpus: identical docs share digest
    and counts; a short doc (< window shingles) selects exactly its one
    rightmost-min fingerprint; disjoint-vocabulary docs differ."""
    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e f g h",
                    "a b c d e f g h",  # identical to doc 0
                    "x y",              # short: 1 whole-text shingle
                    "p q r s t u v w",  # disjoint vocabulary
                ],
                pa.string(),
            ),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([1, 1, 1, 1], pa.int64()),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    df = (
        QUERIES["q_winnow_fingerprints"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[0].equals(df.loc[1])
    assert df.loc[2, "n_selected"] == 1 and df.loc[2, "n_distinct"] == 1
    assert df.loc[0, "fp_digest"] != df.loc[3, "fp_digest"]


def test_winnow_fingerprints_matches_bruteforce_random():
    """Random-corpus equivalence: the vectorized batch winnow equals a
    per-doc reference loop (windows of md5 3-gram hashes, rightmost min,
    distinct selections) including counts and the xor digest."""
    import tempfile

    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES
    from ontoea_ray.queries.text import _WINNOW_W, _WINNOW_MASK_SQL
    from ontoea_ray.stages.dedup import _token_hashes

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(9)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 30, size=60)
    ]
    tmp = tempfile.mkdtemp(prefix="winnow_prop_")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(60, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * 60),
                "source": pa.array(["s"] * 60),
                "n_chars": pa.array(np.ones(60, np.int64)),
            }
        ),
        f"{tmp}/documents.parquet",
    )

    def brute(text):
        t = text.split(" ")
        shingles = (
            [" ".join(t[i : i + 3]) for i in range(len(t) - 2)]
            if len(t) >= 3
            else [text]
        )
        h = _token_hashes(pa.array(shingles, pa.string()), backend="md5")
        m = len(h)
        sel = set()
        for i in range(max(m - _WINNOW_W + 1, 1)):
            win = [(int(h[p]), -p) for p in range(i, min(i + _WINNOW_W, m))]
            best = min(win)
            sel.add((-best[1], best[0]))
        hs = {hv for _, hv in sel}
        digest = 0
        for hv in hs:
            digest ^= hv % _WINNOW_MASK_SQL
        return len(sel), len(hs), digest

    df = (
        QUERIES["q_winnow_fingerprints"](tmp)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(df) == 60
    for i, text in enumerate(texts):
        ns, nd, dg = brute(text)
        assert df.loc[i, "n_selected"] == ns
        assert df.loc[i, "n_distinct"] == nd
        assert df.loc[i, "fp_digest"] == dg


def test_resample_hand_semantics(tmp_path):
    """Hand events: hourly grid spans trunc(min)..trunc(max); gap hours
    carry the last value forward with n_events=0; same-timestamp ties
    resolve to the larger event_id."""
    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES

    H = 3_600_000_000
    base = 1_700_000_400_000_000  # NOT hour-aligned
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([base, base, base + 3 * H, base + 3 * H + 100], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([1.0, 2.0, 3.0, 4.0]),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(ev, tmp_path / "events.parquet")
    df = (
        QUERIES["q_resample"](str(tmp_path))
        .to_pandas()
        .sort_values("slot_us")
        .reset_index(drop=True)
    )
    slot0 = base - base % H
    assert list(df["slot_us"]) == [slot0 + i * H for i in range(4)]
    # slot0: two events at the same ts -> larger event_id wins (200 cents)
    assert list(df["value_cents"]) == [200, 200, 200, 400]
    assert list(df["n_events"]) == [2, 0, 0, 2]


def test_ohlc_hand_semantics(tmp_path):
    """Hand events: open/close resolve by (ts, event_id) within the hour,
    high/low/n/sum aggregate, and event types bar independently."""
    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES

    H = 3_600_000_000
    t0 = 1_700_000_400_000_000
    ev = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array(
                [t0 + 10, t0 + 10, t0 + 20, t0 + 5, t0 + H + 1], pa.timestamp("us")
            ),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["a", "a", "a", "b", "a"]),
            "value": pa.array([5.0, 1.0, 9.0, 2.0, 7.0]),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(ev, tmp_path / "events.parquet")
    df = (
        QUERIES["q_ohlc"](str(tmp_path))
        .to_pandas()
        .sort_values(["event_type", "slot_us"])
        .reset_index(drop=True)
    )
    slot0 = (t0 + 10) - (t0 + 10) % H
    a0 = df[(df.event_type == "a") & (df.slot_us == slot0)].iloc[0]
    # open: ts t0+10 tie -> smaller event_id (1, 500 cents); close: t0+20 (900)
    assert (a0.open_cents, a0.close_cents, a0.high_cents, a0.low_cents, a0.n, a0.sum_cents) == (
        500, 900, 900, 100, 3, 1500
    )
    a1 = df[(df.event_type == "a") & (df.slot_us == slot0 + H)].iloc[0]
    assert a1.open_cents == a1.close_cents == 700 and a1.n == 1
    b0 = df[df.event_type == "b"].iloc[0]
    assert b0.open_cents == b0.close_cents == 200 and b0.n == 1
    assert len(df) == 3


def test_chash_minimal_remap_property():
    """The consistent-hash ring's defining property: removing one shard
    moves exactly that shard's keys and nothing else."""
    from ontoea_ray.queries import QUERIES

    df = QUERIES["q_chash_remap"]("/root/testdata/sf0.001").to_pandas().set_index("shard")
    removed = df.loc["s3"]
    assert removed.n_after == 0
    assert int(df.n_moved_in.sum()) == int(removed.n_before)
    others = df.drop("s3")
    # every surviving shard keeps all its original keys
    assert (others.n_after >= others.n_before).all()
    assert int(df.n_before.sum()) == int(df.n_after.sum())


def test_katz_overflow_guard_raises():
    """The pre-accumulation overflow guard fails fast (numpy would wrap
    silently): an absurd alpha trips it on round 0 of a 2-edge graph."""
    import pytest
    import ray.data

    from ontoea_ray.stages.graph import katz_rounds

    edges = ray.data.from_arrow(
        pa.table({"a": pa.array([1, 2], pa.int64()), "b": pa.array([2, 3], pa.int64())})
    )
    with pytest.raises(ray.exceptions.RayTaskError, match="overflow"):
        katz_rounds(
            edges, src="a", dst="b", rounds=2, alpha_milli=10**15
        ).take_all()


def test_knn_graph_tiny_corpus_clamps_k(tmp_path):
    """A corpus with N-1 < K must degrade to min(K, N-1) neighbours per
    vector (like the SQL oracle's ROW_NUMBER <= K) instead of crashing on
    mismatched column lengths (round-5 ADVICE fix)."""
    import pyarrow.parquet as pq

    from ontoea_ray.queries import QUERIES

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((2, 64))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(2, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float64()), 64
            ),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = pa.Table.from_pylist(QUERIES["q_knn_graph"](str(tmp_path)).take_all())
    got = {(r["vec_id"], r["rnk"], r["nbr_id"]) for r in out.to_pylist()}
    assert got == {(0, 1, 1), (1, 1, 0)}
