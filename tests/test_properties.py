"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ontoea_ray.state.ontology import THING, Ontology, build_ccm


@st.composite
def random_tree(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    names = [f"c{i}" for i in range(n)]
    sub = {}
    for i, c in enumerate(names):
        parent = THING if i == 0 else draw(st.sampled_from([THING] + names[:i]))
        sub[c] = parent
    return Ontology(subclass=sub)


@given(random_tree())
@settings(max_examples=30, deadline=None)
def test_ccm_v5_properties(onto):
    _, m = build_ccm(onto, version=4)
    assert np.allclose(m, m.T)                      # Dice overlap is symmetric
    assert np.allclose(np.diag(m), 1.0)             # self-compatibility
    assert (m >= 0).all() and (m <= 1).all()        # weights in [0, 1]


@given(random_tree())
@settings(max_examples=30, deadline=None)
def test_ccm_v4_is_diagonal(onto):
    _, m = build_ccm(onto, version=3)
    assert np.allclose(m, np.eye(m.shape[0]))


@given(
    st.dictionaries(st.text(alphabet="abcdef", min_size=1, max_size=4),
                    st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
    st.dictionaries(st.text(alphabet="ghijkl", min_size=1, max_size=4),
                    st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
)
@settings(max_examples=50, deadline=None)
def test_interleave_dense_disjoint_order(freq1, freq2):
    """Interleaved ids are a bijection onto 0..n1+n2-1 and order-preserving
    within each KG (higher (freq, uri) -> smaller id)."""
    import numpy as np
    import pyarrow as pa

    from ontoea_ray.state.ids import interleaved_ids

    def ranked(freq):
        order = sorted(freq.items(), key=lambda x: (x[1], x[0]), reverse=True)
        return pa.table(
            {
                "uri": pa.array([u for u, _ in order]),
                "freq": pa.array([f for _, f in order], pa.int64()),
                "rank": pa.array(np.arange(len(order)), pa.int64()),
            }
        )

    ids1, ids2 = interleaved_ids(ranked(freq1), ranked(freq2))
    allv = sorted(list(ids1.values()) + list(ids2.values()))
    assert allv == list(range(len(freq1) + len(freq2)))
    for ids, freq in ((ids1, freq1), (ids2, freq2)):
        order = sorted(freq.items(), key=lambda x: (x[1], x[0]), reverse=True)
        seq = [ids[u] for u, _ in order]
        assert seq == sorted(seq)


@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=1, max_value=40))
@settings(max_examples=25, deadline=None)
def test_minhash_estimates_jaccard(seed, overlap):
    """Signature agreement rate ~ true Jaccard (within statistical slack)."""
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(80)]
    a = set(rng.choice(words, size=40, replace=False))
    b = set(rng.choice(sorted(a), size=min(overlap, 40), replace=False)) | set(
        rng.choice(words, size=10, replace=False)
    )
    true_j = len(a & b) / len(a | b)

    import pyarrow as pa

    from ontoea_ray.stages.dedup import minhash_row_signatures

    fn = minhash_row_signatures(None, num_perm=128, shingle_n=1)
    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array([" ".join(sorted(a)), " ".join(sorted(b))])})
    out = fn(batch)
    s = np.asarray(out["sig"].combine_chunks().flatten().to_numpy(zero_copy_only=False)).reshape(2, 128)
    est = (s[0] == s[1]).mean()
    assert abs(est - true_j) < 0.2
