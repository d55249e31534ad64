

def test_prefix_jaccard_lossless_vs_brute(ray_session):
    """Prefix filtering returns exactly the brute-force shingle-J>=0.5
    pairs on a hand corpus with near-dups, supersets and disjoint docs."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.dedup import prefix_jaccard_pairs

    texts = [
        "a b c d e f",            # 0
        "a b c d e g",            # 1: shares 3 of its 4 trigrams with 0
        "a b c d e f g h",        # 2: superset of 0
        "x y z w q r",            # 3: disjoint
        "a b c d e f",            # 4: exact dup of 0
    ]

    def shingles(t):
        w = t.split()
        if len(w) < 3:
            return {t}
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    def brute(texts, t=0.5):
        sets = [shingles(x) for x in texts]
        out = set()
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                if inter and inter / len(sets[i] | sets[j]) >= t:
                    out.add((i, j))
        return out

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)
    got = {
        (r["id_a"], r["id_b"]) for r in prefix_jaccard_pairs(ds).take_all()
    }
    want = brute(texts)
    assert got == want
    assert (0, 4) in want and (0, 2) in want  # dup + superset found
