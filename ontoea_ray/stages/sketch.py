"""Mergeable sketch operators: Count-Min heavy hitters and HyperLogLog
distinct-count.

The 100-TB story: both sketches reduce an unbounded token stream to a
FIXED-SIZE table inside ``map_batches`` (per-block partial sketches), so
the only shuffle is over ``d*w`` (Count-Min) or ``2^p`` (HLL) counter rows
— constant in the corpus size — versus the vocabulary-sized exchange an
exact groupby pays.  Registers merge by ``+`` (Count-Min) / ``max`` (HLL),
which is exactly what ``groupby().aggregate`` does.

Determinism / oracles: token hashes are md5[:8] (``dedup._token_hashes``),
row hashes are seeded ``(a*h + b) mod 2^64`` perms (``dedup._perm_params``)
— DuckDB replays every register bit-for-bit (`functions.lsh_sql`).  HLL's
rho (leading-zero rank) is an integer; the float estimate is computed from
the exact register table, so only the registers need hashing in the
driver gate.

Background (public): Cormode & Muthukrishnan, "An improved data stream
summary: the count-min sketch and its applications", J. Algorithms 2005;
Flajolet et al., "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm", AofA 2007.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean
from ontoea_ray.stages.dedup import _perm_params, _token_hashes

TWO64 = 1 << 64


def _row_buckets(h: np.ndarray, a: np.ndarray, b: np.ndarray, width: int) -> np.ndarray:
    """Bucket per (row r, token): ((a_r * h + b_r) mod 2^64) mod width."""
    return ((a[:, None] * h[None, :] + b[:, None]) % np.uint64(width)).astype(np.int64)


def bit_length64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length of a uint64 array (0 for x == 0):
    float-free (np.log2 is unsafe past 2^53), via binary shift counting."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    nz = x > 0
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    bl[nz] += 1
    return bl


def hll_rho(rest: np.ndarray, nbits: int) -> np.ndarray:
    """HLL rho (1-based leading-zero rank of an nbits-wide remainder;
    nbits+1 for a zero remainder) — shared by the corpus-level register
    table and the per-window variants."""
    rho = np.full(rest.shape, nbits + 1, np.int64)
    nz = rest > 0
    rho[nz] = nbits - bit_length64(rest[nz]) + 1
    return rho


def count_min_sketch(
    docs: ray.data.Dataset,
    *,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
    text_col: str = "text",
) -> ray.data.Dataset:
    """Corpus-wide Count-Min sketch of whitespace-token frequencies.

    Per block: token counts -> ``depth`` bincounts -> (r, bucket, cnt)
    partial rows (<= depth*width per block).  One constant-size groupby
    merges the partials.  Returns the register table
    ``(r, bucket, cnt)`` with zero registers absent."""
    a, b = _perm_params(depth, seed)

    def partial(batch: pa.Table) -> pa.Table:
        from ontoea_ray.functions.text import tokenize

        toks = tokenize(batch[text_col].combine_chunks()).flatten()
        if len(toks) == 0:
            return pa.table({"r": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        counts = pc.value_counts(toks)
        u_vals = counts.field("values")
        u_cnt = counts.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        h = _token_hashes(u_vals)
        buck = _row_buckets(h, a, b, width)  # [depth, n_uniq]
        rs, bs, cs = [], [], []
        for r in range(depth):
            bc = np.bincount(buck[r], weights=u_cnt, minlength=width).astype(np.int64)
            nz = np.nonzero(bc)[0]
            rs.append(np.full(len(nz), r, np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(bc[nz])
        return pa.table({
            "r": pa.array(np.concatenate(rs), pa.int64()),
            "bucket": pa.array(np.concatenate(bs), pa.int64()),
            "cnt": pa.array(np.concatenate(cs), pa.int64()),
        })

    from ray.data.aggregate import Sum

    from ontoea_ray.functions.shuffle import compact

    parts = docs.map_batches(partial, batch_format="pyarrow")
    return compact(parts).groupby(["r", "bucket"]).aggregate(Sum("cnt", alias_name="cnt"))


def count_min_topk(
    docs: ray.data.Dataset,
    *,
    k: int = 20,
    depth: int = 4,
    width: int = 1024,
    seed: int = 7,
    text_col: str = "text",
) -> pa.Table:
    """Heavy hitters by Count-Min estimate: (token, est) for the top-k
    distinct tokens, est = min over rows of the merged registers; ties
    broken by ascending token.  The register table is constant-size, so the
    driver-side densify is bounded by depth*width, never the corpus."""
    a, b = _perm_params(depth, seed)
    regs = count_min_sketch(docs, depth=depth, width=width, seed=seed, text_col=text_col)
    dense = np.zeros((depth, width), np.int64)
    for row in regs.take_all():  # <= depth*width rows by construction
        dense[row["r"], row["bucket"]] = row["cnt"]
    import ray as _ray

    dense_ref = _ray.put(dense)

    def block_est(batch: pa.Table) -> pa.Table:
        from ontoea_ray.functions.text import tokenize

        toks = tokenize(batch[text_col].combine_chunks()).flatten()
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()), "est": pa.array([], pa.int64())})
        uniq = toks.unique()
        h = _token_hashes(uniq)
        buck = _row_buckets(h, a, b, width)
        d = _ray.get(dense_ref)
        est = d[np.arange(depth)[:, None], buck].min(axis=0)
        # block-local top-k pre-prune (est is global, so this is lossless
        # for the global top-k as long as each block keeps its own top-k)
        df = pd.DataFrame({"token": uniq.to_pandas(), "est": est})
        df = df.sort_values(["est", "token"], ascending=[False, True]).head(k)
        return _from_pandas_clean(df)

    parts = docs.map_batches(block_est, batch_format="pyarrow").to_pandas()
    parts = parts.drop_duplicates("token")
    parts = parts.sort_values(["est", "token"], ascending=[False, True]).head(k)
    return _from_pandas_clean(parts.reset_index(drop=True))


def hyperloglog_registers(
    ds: ray.data.Dataset,
    *,
    col: str,
    p: int = 10,
    tokens: bool = False,
) -> ray.data.Dataset:
    """HLL register table (bucket, rho) for distinct values of ``col``
    (or its whitespace tokens with ``tokens=True``): bucket = top ``p``
    bits of the md5[:8] hash, rho = leading-zero rank of the remaining
    64-p bits (1-based; capped at 64-p+1 for a zero remainder).  Merge =
    max per bucket — one constant-size (<= 2^p row) shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch[col].combine_chunks()
        if tokens:
            from ontoea_ray.functions.text import tokenize

            arr = tokenize(arr).flatten()
        if len(arr) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()), "rho": pa.array([], pa.int64())})
        if not pa.types.is_string(arr.type):
            arr = arr.cast(pa.string())
        h = _token_hashes(arr.unique())
        bucket = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = h & np.uint64((1 << (64 - p)) - 1)
        rho = hll_rho(rest, 64 - p)
        df = pd.DataFrame({"bucket": bucket, "rho": rho}).groupby("bucket", sort=False)["rho"].max().reset_index()
        return _from_pandas_clean(df)

    from ray.data.aggregate import Max

    from ontoea_ray.functions.shuffle import compact

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return compact(parts).groupby("bucket").aggregate(Max("rho", alias_name="rho"))


HLL_ALPHA_MILLI = {16: 673, 32: 697, 64: 709}  # exact alpha_m * 1000


def hll_int_params(p: int) -> tuple[int, int, int]:
    """(m, numerator, rho_cap) of the INTEGER HLL estimator
    ``E_milli = numerator // S`` with ``S = Σ_j 2^(cap − min(M_j, cap))``
    (absent registers contribute 2^cap): numerator = α_m·1000·m²·2^cap,
    exact because the published α for m ≤ 64 is a 3-decimal rational; the
    rho cap is the largest keeping the numerator inside int64 (< 2^-cap
    relative error).  Shared by harmonic centrality and the join-
    cardinality estimator so every consumer is bit-replayable in SQL."""
    m = 1 << p
    num = HLL_ALPHA_MILLI[m] * m * m
    cap = 62 - num.bit_length()
    return m, num << cap, cap


def hll_estimate_milli(term_sum: "np.ndarray", cnt: "np.ndarray", p: int) -> "np.ndarray":
    """Vectorized integer estimate from per-set (Σ capped terms, #present
    registers) folds — see :func:`hll_int_params`."""
    m, num, cap = hll_int_params(p)
    s = np.asarray(term_sum, np.int64) + (m - np.asarray(cnt, np.int64)) * (
        np.int64(1) << cap
    )
    return num // s


def hll_estimate(registers: pa.Table | pd.DataFrame, *, p: int = 10) -> float:
    """Cardinality estimate from a register table (absent buckets = 0).

    Standard HLL with the small-range (linear counting) correction."""
    if isinstance(registers, pa.Table):
        registers = registers.to_pandas()
    m = 1 << p
    regs = np.zeros(m, np.int64)
    regs[registers["bucket"].to_numpy(np.int64)] = registers["rho"].to_numpy(np.int64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)
