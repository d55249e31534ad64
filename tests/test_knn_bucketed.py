"""Gates for the bucketed kNN-graph scale path (stages.ann.
knn_graph_bucketed — the operator q_knn_graph's over-budget fail-fast
points at): recall vs the exact all-pairs graph, and the pruned-work
evidence that the bucketed plan does far less than N^2 pairwise work.
The bit-exact value oracle is covered by test_queries_oracle
(q_knn_graph_bucketed)."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.01"


def _edges(res) -> set:
    rows = res.take_all()
    return {(r["vec_id"], r["nbr_id"]) for r in rows}


def test_bucketed_recall_vs_exact_graph(ray_session):
    from ontoea_ray.queries import QUERIES

    exact = _edges(QUERIES["q_knn_graph"](SF))
    bucketed = _edges(QUERIES["q_knn_graph_bucketed"](SF))
    assert exact, "exact graph empty — fixture problem"
    recall = len(exact & bucketed) / len(exact)
    # every bucketed edge must also carry its TRUE dot (precision exact):
    # a bucketed pair not in the exact top-k is fine, a fabricated pair is
    # not — checked implicitly by the bit-exact oracle; here we pin recall
    assert recall >= 0.9, f"bucketed kNN-graph recall {recall:.3f} < 0.9"


def test_bucketed_work_is_pruned(ray_session):
    """Seed work (sum_b |queries_b| x |candidates_b|) must be far below
    N*(N-1) — that is the bucketing win; the NN-descent refinement's
    candidate volume must be a PER-VECTOR CONSTANT (~(2*work_list)^2 + a
    capped local join), i.e. linear in N — together the scale story:
    pruned-quadratic seed + linear refinement, never N^2."""
    import ray.data

    from ontoea_ray.stages.ann import knn_graph_bucketed

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    out, stats = knn_graph_bucketed(
        emb, k=3, n_centroids=16, iters=4, scale=1000, nprobe=4,
        work_list=10, refine_rounds=2, return_stats=True,
    )
    n_rows = out.count()
    n = stats["n_vectors"]
    assert n > 0
    assert n_rows == 3 * n
    # nprobe/n_centroids = 1/4 of exact work if lists were perfectly
    # balanced; allow slack for skew but demand a real reduction
    assert stats["seed_pairs"] < 0.5 * stats["exact_pairs"], stats
    assert sum(stats["list_sizes"].values()) == n
    # refinement rounds: candidate rows per vector bounded by a constant
    # independent of N (2L und pairs + <= (2L)^2-ish local-join fan-out)
    L = 10
    for cnt in stats["refine_pairs_per_round"]:
        assert cnt <= n * (2 * L + (2 * L) ** 2), stats


def test_bucketed_tiny_corpus_degrades(ray_session, tmp_path):
    """N-1 < k: emits min(k, N-1) neighbours per vector, like the exact
    operator and both oracles."""
    import pyarrow.parquet as pq
    import ray.data

    from ontoea_ray.stages.ann import knn_graph_bucketed

    rng = np.random.default_rng(5)
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
    ds = ray.data.read_parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        (r["vec_id"], r["rnk"], r["nbr_id"])
        for r in knn_graph_bucketed(ds, k=3, n_centroids=4, nprobe=4).take_all()
    }
    assert got == {(0, 1, 1), (1, 1, 0)}


def test_bucketed_plans_bit_equal(ray_session):
    """Two-plan shape: the single-task small-N plan and the distributed
    plan (forced via small_n=0) must agree bit-for-bit — same seed lists,
    same NN-descent rounds, same caps, ties and stats formulas."""
    import ray.data

    from ontoea_ray.stages.ann import knn_graph_bucketed

    emb = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def run(small_n):
        out, stats = knn_graph_bucketed(
            emb, k=3, n_centroids=16, iters=4, scale=1000, nprobe=4,
            work_list=10, refine_rounds=2, small_n=small_n, return_stats=True,
        )
        rows = sorted(
            (r["vec_id"], r["rnk"], r["nbr_id"], r["dot"]) for r in out.take_all()
        )
        return rows, stats

    small_rows, small_stats = run(4096)
    dist_rows, dist_stats = run(0)
    assert small_rows == dist_rows
    for key in ("seed_pairs", "exact_pairs", "n_vectors", "list_sizes",
                "refine_pairs_per_round"):
        assert small_stats[key] == dist_stats[key], key


def test_graph_ann_serving_pruned_and_bounded(ray_session, tmp_path):
    """Graph-ANN beam search over the persisted kNN-graph index: reads
    only the frontier's shard partitions (scanned << total), driver state
    (the visited pool) stays constant-bounded, and the bucketed-graph
    index serves nearly the same answer as the exact-graph index (the
    exact-graph walk itself is bit-pinned by the q_graph_ann oracle)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pqm
    import ray.data

    from ontoea_ray.stages.ann import build_knn_graph_index, graph_ann_topk

    SF01 = "/root/testdata/sf0.01"
    emb = ray.data.read_parquet(f"{SF01}/embeddings.parquet", columns=["vec_id", "embedding"])
    tbl = pqm.read_table(f"{SF01}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.asarray(tbl.filter(pc.equal(tbl["vec_id"], 0))["embedding"].to_pylist()[0], np.float64)

    d_exact = str(tmp_path / "exact")
    d_buck = str(tmp_path / "buck")
    build_knn_graph_index(emb, d_exact, k=3, exact=True, n_shards=32)
    build_knn_graph_index(emb, d_buck, k=3, exact=False, n_shards=32)

    res_e, st_e = graph_ann_topk(d_exact, q, k=10, beam=4, hops=4, return_stats=True)
    res_b, st_b = graph_ann_topk(d_buck, q, k=10, beam=4, hops=4, return_stats=True)
    for st in (st_e, st_b):
        assert len(st["scanned_shards"]) < st["total_shards"], st  # pruned I/O
        assert st["n_visited"] <= 1 + 4 * 4 * 3, st  # 1 + hops*beam*k bound
    ids_e = set(res_e["vec_id"].to_pylist())
    ids_b = set(res_b["vec_id"].to_pylist())
    assert len(res_e) == 10 and len(res_b) == 10
    assert 0 in ids_e  # the query IS vec 0: the walk must find it (dot max)
    assert len(ids_e & ids_b) >= 6  # bucketed graph serves ~the same pool

    # against brute-force integer-dot truth: a beam walk over a sparse
    # k=3 graph is approximate by design — gate the floor, not parity
    ids = np.asarray(tbl["vec_id"], np.int64)
    flat = np.asarray(tbl["embedding"].combine_chunks().values, np.float32)
    qm = np.floor(flat.reshape(len(ids), -1).astype(np.float64) * 1000).astype(np.int64)
    qq = np.floor(q * 1000).astype(np.int64)
    top = set(ids[np.lexsort((ids, -(qm @ qq)))[:10]].tolist())
    assert len(ids_e & top) >= 4
    assert len(ids_b & top) >= 4
