"""DuckDB SQL generators that reproduce the MinHash-LSH chain bit-for-bit.

The engine's dedup chain (`ontoea_ray.stages.dedup`) was deliberately built
on oracle-reproducible primitives: token hashes are md5[:8] big-endian,
shingle hashes are a wrap-mod-2^64 multiply-accumulate with public
constants, MinHash perms are ``(a*h + b) mod 2^64 mod (2^61-1)`` with
params from a seeded generator, and band keys are an FNV-1a fold.  Every
step is integer arithmetic DuckDB can replay exactly:

- 64-bit wrapping multiply by the golden-ratio constant P (> 2^63) is
  decomposed into hi/lo 32-bit halves so intermediates fit HUGEINT
  (products stay < 2^97 < 2^127).
- multiplies by perm params (< 2^61) and the FNV prime (< 2^41) fit
  HUGEINT directly (< 2^125).
- 64-bit XOR is done on 32-bit halves with BIGINT ``xor()``.

The generated SQL is the driver-side oracle for ``q_minhash_lsh`` and
``q_lsh_neardup`` — turning the "approximate" LSH family into exact,
value-hash-checked queries (the approximation is relative to true Jaccard,
not nondeterminism).
"""

from __future__ import annotations

TWO64 = 1 << 64
TWO32 = 1 << 32
MASK63 = (1 << 63) - 1
P_GOLDEN = 0x9E3779B97F4A7C15  # shingle-hash combine (stages/dedup._shingle_hashes)
FNV_OFFSET = 1469598103934665603
FNV_PRIME = 0x100000001B3
MERSENNE = (1 << 61) - 1


def _h(tok_expr: str) -> str:
    """md5[:8] big-endian token hash as HUGEINT (matches dedup._token_hashes)."""
    return f"CAST(CAST(('0x' || substr(md5({tok_expr}), 1, 16)) AS UBIGINT) AS HUGEINT)"


def _mulmod(x: str, c: int) -> str:
    """(x * c) mod 2^64 via hi/lo split (c > 2^63 would overflow HUGEINT)."""
    return (
        f"((((({x}) // {TWO32}) * {c} % {TWO32}) * {TWO32}"
        f" + (({x}) % {TWO32}) * {c}) % {TWO64})"
    )


def _mulmod_p(x: str) -> str:
    return _mulmod(x, P_GOLDEN)


def _addmod(x: str, y: str) -> str:
    return f"((({x}) + ({y})) % {TWO64})"


def _xor64(a: str, b: str) -> str:
    """64-bit XOR on HUGEINT operands via BIGINT xor over 32-bit halves."""
    return (
        f"(CAST(xor(CAST(({a}) // {TWO32} AS BIGINT), CAST(({b}) // {TWO32} AS BIGINT)) AS HUGEINT) * {TWO32}"
        f" + CAST(xor(CAST(({a}) % {TWO32} AS BIGINT), CAST(({b}) % {TWO32} AS BIGINT)) AS HUGEINT))"
    )


def _shingle_hash_exprs(n: int) -> tuple[str, dict[int, str]]:
    """(full-window expr over t[i..i+n-1], {short_len: expr}) — mirrors
    dedup._shingle_hashes: full windows fold h0 then acc*P+h_j; short rows
    fold from FNV_OFFSET over all tokens."""
    acc = _h("t[i]")
    for j in range(1, n):
        acc = _addmod(_mulmod_p(acc), _h(f"t[i+{j}]"))
    shorts: dict[int, str] = {}
    for ln in range(0, n):
        s = str(FNV_OFFSET)
        for k in range(ln):
            s = _addmod(_mulmod_p(s), _h(f"t[{k + 1}]"))
        shorts[ln] = s
    return acc, shorts


def _perm_values_sql(num_perm: int, seed: int) -> str:
    from ontoea_ray.stages.dedup import _perm_params

    a, b = _perm_params(num_perm, seed)
    rows = ", ".join(f"({p}, {int(a[p])}, {int(b[p])})" for p in range(num_perm))
    return f"(VALUES {rows}) perms(p, a, b)"


def _doc_shingles_cte(shingle_n: int, source: str = "documents") -> str:
    """CTEs tok -> shl: per-doc HUGEINT shingle-hash list (multiset, like
    the engine — minima are unaffected by duplicates)."""
    full, shorts = _shingle_hash_exprs(shingle_n)
    short_cases = " ".join(
        f"WHEN len(t) = {ln} THEN [{expr}]" for ln, expr in sorted(shorts.items()) if ln > 0
    )
    return f"""
  tok AS (SELECT doc_id, str_split(text, ' ') AS t FROM {source}),
  shl AS (
    SELECT doc_id,
      CASE WHEN len(t) >= {shingle_n}
           THEN [{full} FOR i IN range(1, len(t) - {shingle_n - 2})]
           {short_cases}
           ELSE [CAST({FNV_OFFSET} AS HUGEINT)] END AS sh
    FROM tok)
"""


def _band_chain_ctes(
    bands: int, r: int, id_cols: tuple[str, ...] = ("doc_id",), source: str = "docsigs"
) -> str:
    """CTEs c0..c{r}: FNV-1a fold acc = (acc XOR sig_j) * FNV_PRIME mod 2^64
    over each band's r signature slots, staged so the acc expression stays
    one column reference (no exponential text blowup)."""
    idl = ", ".join(id_cols)
    parts = [
        f"  c0 AS (SELECT {idl}, b.band AS band, sigs,"
        f" CAST({FNV_OFFSET} AS HUGEINT) AS acc"
        f" FROM {source}, (SELECT unnest(range({bands})) AS band) b)"
    ]
    for j in range(r):
        x = _xor64("acc", f"sigs[band * {r} + {j + 1}]")
        parts.append(
            f"  c{j + 1} AS (SELECT {idl}, band, sigs,"
            f" (({x}) * {FNV_PRIME}) % {TWO64} AS acc FROM c{j})"
        )
    return ",\n".join(parts)


def minhash_lsh_candidates_sql(
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_group: int = 200,
    source: str = "documents",
) -> str:
    """Exact oracle for ``stages.dedup.lsh_candidate_pairs``: distinct
    (id_a, id_b), id_a < id_b, sharing >= 1 LSH band bucket, hot buckets
    (> max_group members) dropped."""
    assert num_perm % bands == 0
    r = num_perm // bands
    return f"""
WITH
{_doc_shingles_cte(shingle_n, source)},
  mins AS (
    SELECT s.doc_id, perms.p AS p,
           MIN(((perms.a * s.h + perms.b) % {TWO64}) % {MERSENNE}) AS sig
    FROM (SELECT doc_id, unnest(sh) AS h FROM shl) s, {_perm_values_sql(num_perm, seed)}
    GROUP BY s.doc_id, perms.p),
  docsigs AS (SELECT doc_id, list(sig ORDER BY p) AS sigs FROM mins GROUP BY doc_id),
{_band_chain_ctes(bands, r)},
  buck AS (SELECT doc_id, band, acc % {MASK63 + 1} AS band_key FROM c{r}),
  ok AS (SELECT band, band_key FROM buck
         GROUP BY band, band_key HAVING COUNT(*) BETWEEN 2 AND {max_group})
SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b
FROM buck a
JOIN buck b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
JOIN ok ON ok.band = a.band AND ok.band_key = a.band_key
"""


def lsh_neardup_sql(
    *,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seed: int = 42,
    max_group: int = 200,
    source: str = "documents",
) -> str:
    """Exact oracle for ``stages.dedup.lsh_near_duplicates``: LSH candidate
    pairs intersected with exact distinct-string-shingle Jaccard >= t (the
    verify step uses string shingles; candidates use hashed shingles)."""
    cand = minhash_lsh_candidates_sql(
        num_perm=num_perm, bands=bands, shingle_n=shingle_n, seed=seed,
        max_group=max_group, source=source,
    )
    return f"""
WITH cand AS ({cand}),
  jtok AS (SELECT doc_id, str_split(text, ' ') AS t FROM {source}),
  jsh AS (SELECT DISTINCT doc_id,
          unnest(CASE WHEN len(t) >= {shingle_n}
                 THEN [array_to_string(t[i:i+{shingle_n - 1}], ' ')
                       FOR i IN range(1, len(t) - {shingle_n - 2})]
                 ELSE [array_to_string(t, ' ')] END) AS s
          FROM jtok),
  sizes AS (SELECT doc_id, COUNT(*) AS sz FROM jsh GROUP BY doc_id),
  inter AS (SELECT c.id_a, c.id_b, COUNT(*) AS c
            FROM cand c
            JOIN jsh a ON a.doc_id = c.id_a
            JOIN jsh b ON b.doc_id = c.id_b AND a.s = b.s
            GROUP BY c.id_a, c.id_b)
SELECT id_a, id_b
FROM inter JOIN sizes sa ON inter.id_a = sa.doc_id
           JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE c * 1.0 / (sa.sz + sb.sz - c) >= {threshold}
"""


def ann_lsh_topk_sql(
    *,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    hamming_radius: int = 1,
    query_vec_id: int = 0,
    source: str = "embeddings",
) -> str:
    """Oracle for ``stages.ann.lsh_index_topk`` (as driven by q_ann_lsh):
    hyperplane bucket per row (sign bits of raw-vector dot products against
    the seeded plane matrix, inlined below), candidate rows within
    ``hamming_radius`` of the query row's bucket, exact cosine top-k over
    the candidates with (cos DESC, vec_id ASC) tie-break.

    Float caveat: signs and ranks rely on DuckDB's float64 dot product
    agreeing with numpy's — summation order may differ in the last ulp,
    which can only matter for |dot| ~ 1e-13 or exact cosine ties (absent in
    the synthetic tables; validated empirically at every sf)."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in planes[i])}])"
        for i in range(n_planes)
    )
    return f"""
WITH planes(i, w) AS (VALUES {rows}),
  sigs AS (
    SELECT e.vec_id,
           CAST(SUM(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), planes.w) > 0
                         THEN (1 << planes.i) ELSE 0 END) AS BIGINT) AS bucket
    FROM {source} e, planes GROUP BY e.vec_id),
  qsig AS (SELECT bucket AS qb FROM sigs WHERE vec_id = {query_vec_id}),
  cand AS (SELECT s.vec_id FROM sigs s, qsig
           WHERE bit_count(xor(s.bucket, qsig.qb)) <= {hamming_radius})
SELECT vec_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT e.vec_id,
         ROW_NUMBER() OVER (
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                    (SELECT CAST(embedding AS DOUBLE[]) FROM {source}
                     WHERE vec_id = {query_vec_id})) DESC,
                    e.vec_id ASC) AS rnk
  FROM {source} e JOIN cand ON cand.vec_id = e.vec_id
) WHERE rnk <= {k}
"""


def splitmix64_ctes(source: str, key_expr: str, sfx: str = "") -> str:
    """CTE chain sm0{sfx}..sm3{sfx} computing splitmix64(key_expr) over
    ``source``; the final CTE ``sm3{sfx}`` carries every source column plus
    ``_h`` (the 64-bit hash as HUGEINT).  Mirrors ``stages.sampling.
    splitmix64``.  Pass a distinct ``sfx`` to instantiate the chain more
    than once in one statement (e.g. per walk round)."""
    from ontoea_ray.stages.sampling import (
        SPLITMIX_GAMMA,
        SPLITMIX_M1,
        SPLITMIX_M2,
    )

    return f"""
  sm0{sfx} AS (SELECT *, ((CAST({key_expr} AS HUGEINT) + {SPLITMIX_GAMMA}) % {TWO64}) AS _z0 FROM {source}),
  sm1{sfx} AS (SELECT *, {_mulmod(_xor64("_z0", f"(_z0 // {1 << 30})"), SPLITMIX_M1)} AS _z1 FROM sm0{sfx}),
  sm2{sfx} AS (SELECT *, {_mulmod(_xor64("_z1", f"(_z1 // {1 << 27})"), SPLITMIX_M2)} AS _z2 FROM sm1{sfx}),
  sm3{sfx} AS (SELECT *, {_xor64("_z2", f"(_z2 // {1 << 31})")} AS _h FROM sm2{sfx})
"""


# ---------------------------------------------------------------------------
# sketch oracles (stages/sketch.py): Count-Min registers / top-k, HLL
# ---------------------------------------------------------------------------

def _cmin_common(depth: int, width: int, seed: int, source: str, text_col: str) -> str:
    from ontoea_ray.stages.dedup import _perm_params

    a, b = _perm_params(depth, seed)
    perm_rows = ", ".join(f"({r}, {int(a[r])}, {int(b[r])})" for r in range(depth))
    return f"""
  tok AS (SELECT unnest(str_split({text_col}, ' ')) AS token FROM {source}),
  tc AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
  th AS (SELECT token, c, {_h("token")} AS hv FROM tc),
  perms(r, a, b) AS (VALUES {perm_rows}),
  regs AS (
    SELECT perms.r AS r,
           CAST(((perms.a * th.hv + perms.b) % {TWO64}) % {width} AS BIGINT) AS bucket,
           CAST(SUM(th.c) AS BIGINT) AS cnt
    FROM th, perms GROUP BY 1, 2)
"""


def count_min_registers_sql(
    *, depth: int = 4, width: int = 1024, seed: int = 7,
    source: str = "documents", text_col: str = "text",
) -> str:
    """Exact oracle for ``stages.sketch.count_min_sketch``: the merged
    (r, bucket, cnt) register table over whitespace-token counts."""
    return f"WITH {_cmin_common(depth, width, seed, source, text_col)}\nSELECT r, bucket, cnt FROM regs"


def count_min_topk_sql(
    *, k: int = 20, depth: int = 4, width: int = 1024, seed: int = 7,
    source: str = "documents", text_col: str = "text",
) -> str:
    """Exact oracle for ``stages.sketch.count_min_topk``: per distinct
    token, est = MIN over rows of its register; top-k by (est DESC, token
    ASC)."""
    return f"""
WITH {_cmin_common(depth, width, seed, source, text_col)},
  est AS (
    SELECT th.token, MIN(regs.cnt) AS est
    FROM th, perms, regs
    WHERE regs.r = perms.r
      AND regs.bucket = CAST(((perms.a * th.hv + perms.b) % {TWO64}) % {width} AS BIGINT)
    GROUP BY th.token)
SELECT token, CAST(est AS BIGINT) AS est
FROM est ORDER BY est DESC, token ASC LIMIT {k}
"""


def hll_registers_sql(
    *, p: int = 10, source: str = "documents", text_col: str = "text",
) -> str:
    """Exact oracle for ``stages.sketch.hyperloglog_registers`` (token
    mode): bucket = top p bits of the md5[:8] hash, rho = leading-zero rank
    of the low 64-p bits via length(bin(..)) — integer-exact (the low bits
    fit BIGINT for p >= 2, so no float log2)."""
    nbits = 64 - p
    return f"""
WITH tok AS (SELECT DISTINCT unnest(str_split({text_col}, ' ')) AS token FROM {source}),
  h AS (SELECT DISTINCT {_h("token")} AS hv FROM tok),
  parts AS (
    SELECT CAST(hv // {1 << nbits} AS BIGINT) AS bucket,
           CAST(hv % {1 << nbits} AS BIGINT) AS rest
    FROM h)
SELECT bucket,
       CAST(MAX(CASE WHEN rest = 0 THEN {nbits + 1}
                     ELSE {nbits} - length(bin(rest)) + 1 END) AS BIGINT) AS rho
FROM parts GROUP BY bucket
"""


def bloom_semi_join_sql(
    *,
    probe_sql: str,
    probe_key: str,
    build_sql: str,
    build_key: str,
    out_cols: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 11,
) -> str:
    """Exact oracle for ``stages.bloom.bloom_semi_join``: rebuild the bit
    set (distinct ((a_i*h+b_i) mod 2^64) mod m over build keys, md5[:8]
    hashes, perms inlined) and keep probe rows whose n_hashes positions are
    all set — false positives replay identically."""
    from ontoea_ray.stages.dedup import _perm_params

    a, b = _perm_params(n_hashes, seed)
    perm_rows = ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(n_hashes))
    pos = f"CAST(((perms.a * hv + perms.b) % {TWO64}) % {m_bits} AS BIGINT)"
    # positions are materialized as plain columns BEFORE the join so DuckDB
    # hash-joins on them (an expression key over HUGEINT arithmetic falls
    # back to a nested loop — minutes at 15k probe rows)
    return f"""
WITH perms(i, a, b) AS (VALUES {perm_rows}),
  bk AS (SELECT DISTINCT {_h(f"CAST({build_key} AS VARCHAR)")} AS hv FROM ({build_sql})),
  setbits AS (SELECT DISTINCT {pos} AS pos FROM bk, perms),
  pk AS (SELECT DISTINCT {probe_key} AS k FROM ({probe_sql})),
  pkh AS (SELECT k, {_h("CAST(k AS VARCHAR)")} AS hv FROM pk),
  pkpos AS (SELECT k, perms.i AS i, {pos} AS pos FROM pkh, perms),
  hits AS (
    SELECT pkpos.k
    FROM pkpos JOIN setbits ON pkpos.pos = setbits.pos
    GROUP BY pkpos.k
    HAVING COUNT(DISTINCT pkpos.i) = {n_hashes})
SELECT {out_cols} FROM ({probe_sql}) p WHERE p.{probe_key} IN (SELECT k FROM hits)
"""


def decontaminate_overlap_sql(
    *, shingle_n: int = 3, bench_mod: int = 97, source: str = "documents"
) -> str:
    """Exact oracle for ``stages.decontaminate.contamination_overlap``:
    benchmark = docs with ``doc_id % bench_mod == 0``; per corpus doc, the
    count of DISTINCT shingle hashes shared with the benchmark's distinct
    shingle-hash set (same md5[:8] + wrap-mod-2^64 rolling fold as the
    engine, via :func:`_doc_shingles_cte`)."""
    return f"""
WITH {_doc_shingles_cte(shingle_n, source)},
  ex AS (SELECT doc_id, unnest(sh) AS h FROM shl),
  bench AS (SELECT DISTINCT h FROM ex WHERE doc_id % {bench_mod} = 0),
  corp AS (SELECT DISTINCT doc_id, h FROM ex WHERE doc_id % {bench_mod} <> 0)
SELECT c.doc_id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
FROM corp c JOIN bench b USING (h)
GROUP BY 1
"""


def _ivf_sqdist(dim: int):
    """Integer squared-Euclidean list expression factory for dim-wide qv/cv."""
    rng = f"range(1, {dim + 1})"

    def sqdist(qv: str, cv: str) -> str:
        return f"list_sum([({qv}[i] - {cv}[i]) * ({qv}[i] - {cv}[i]) FOR i IN {rng}])"

    return sqdist


def _ivf_training_ctes(
    *,
    source: str,
    n_centroids: int,
    dim: int,
    iters: int,
    scale: int,
    sample_size: int,
) -> str:
    """The shared integer-k-means training chain (mirrors
    ``stages.ann.train_centroids_integer`` + the final full-corpus
    assignment): CTEs ``qall`` (every row's quantized vector + hash rank),
    ``cent{iters}`` (trained centroids) and ``finalasg`` (vec_id -> home
    cid, ties to lowest cid).  Every step is integer-exact and
    order-independent, so the centroids come out bit-identical to the
    engine's.  Used by :func:`ann_ivf_topk_sql` and
    :func:`knn_graph_bucketed_sql`."""
    rng = f"range(1, {dim + 1})"
    sqdist = _ivf_sqdist(dim)
    parts = [f"WITH {splitmix64_ctes(source, 'vec_id')},"]
    parts.append(f"""
  hord AS (SELECT vec_id, embedding,
                  ROW_NUMBER() OVER (ORDER BY _h ASC, vec_id ASC) AS hrank
           FROM sm3),
  qall AS MATERIALIZED (SELECT vec_id, hrank,
                  [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT)
                   FOR i IN {rng}] AS qv
           FROM hord),
  train AS MATERIALIZED (SELECT * FROM qall WHERE hrank <= {sample_size}),
  cent0 AS (SELECT hrank - 1 AS cid, qv AS cv FROM train WHERE hrank <= {n_centroids}),""")
    for t in range(iters):
        parts.append(f"""
  best{t} AS (
    SELECT vec_id, cid, qv FROM (
      SELECT train.vec_id, c.cid, train.qv,
             ROW_NUMBER() OVER (PARTITION BY train.vec_id
                                ORDER BY {sqdist('train.qv', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM train CROSS JOIN cent{t} c)
    WHERE rn = 1),
  upd{t} AS (
    SELECT cid, u.i AS d,
           CAST(FLOOR(CAST(SUM(qv[u.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
    FROM best{t}, UNNEST({rng}) AS u(i)
    GROUP BY cid, u.i),
  cent{t + 1} AS MATERIALIZED (
    SELECT c.cid, COALESCE(n.cv, c.cv) AS cv
    FROM cent{t} c
    LEFT JOIN (SELECT cid, list(cval ORDER BY d) AS cv FROM upd{t} GROUP BY cid) n
      USING (cid)),""")
    parts.append(f"""
  finalasg AS MATERIALIZED (
    SELECT vec_id, cid FROM (
      SELECT qall.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY qall.vec_id
                                ORDER BY {sqdist('qall.qv', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM qall CROSS JOIN cent{iters} c)
    WHERE rn = 1),""")
    return "\n".join(parts)


def knn_graph_bucketed_sql(
    *,
    k: int = 3,
    n_centroids: int = 16,
    dim: int = 64,
    iters: int = 4,
    scale: int = 1000,
    nprobe: int = 4,
    work_list: int = 10,
    refine_rounds: int = 2,
    degree_cap: int = 64,
    sample_size: int = 20_000,
    source: str = "embeddings",
) -> str:
    """FULL value oracle for ``stages.ann.knn_graph_bucketed`` (as driven
    by q_knn_graph_bucketed): re-trains the integer coarse quantizer
    (:func:`_ivf_training_ctes`), replays every vector's home list and
    ``nprobe`` probe lists and the SEED pair enumeration (candidate's
    home list IN query's probes, self excluded, top ``work_list`` per
    vector), then unrolls the ``refine_rounds`` NN-descent rounds — the
    undirected (uncapped) neighbour pairs UNION the shared-vertex local
    join over each vertex's ``degree_cap`` lowest-id undirected
    neighbours, rescored by the integer milli dot and cut back to the
    top ``work_list`` — and finally emits rnk <= k.  There is NO float
    step anywhere, so every output column hash-matches bit-for-bit —
    the approximation is vs the exact kNN graph (recall pinned in
    pytest), not nondeterminism."""
    sqdist = _ivf_sqdist(dim)
    rng = f"range(1, {dim + 1})"
    L = max(work_list, k)
    train = _ivf_training_ctes(
        source=source, n_centroids=n_centroids, dim=dim, iters=iters,
        scale=scale, sample_size=sample_size,
    )
    parts = [f"""{train}
  probes AS (
    SELECT vec_id, cid FROM (
      SELECT q.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                ORDER BY {sqdist('q.qv', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM qall q CROSS JOIN cent{iters} c)
    WHERE rn <= {nprobe}),
  pairs AS (
    SELECT q.vec_id AS vec_id, n.vec_id AS nbr_id,
           CAST(list_sum([q.qv[i] * n.qv[i] FOR i IN {rng}]) AS BIGINT) AS dot
    FROM qall q
    JOIN probes p ON p.vec_id = q.vec_id
    JOIN finalasg f ON f.cid = p.cid AND f.vec_id <> q.vec_id
    JOIN qall n ON n.vec_id = f.vec_id),
  e0 AS MATERIALIZED (
    SELECT vec_id, nbr_id, dot FROM (
      SELECT vec_id, nbr_id, dot,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dot DESC, nbr_id ASC) AS rn
      FROM pairs)
    WHERE rn <= {L}),"""]
    for r in range(refine_rounds):
        parts.append(f"""
  und{r} AS MATERIALIZED (SELECT vec_id AS x, nbr_id AS s FROM e{r}
             UNION SELECT nbr_id, vec_id FROM e{r}),
  undc{r} AS MATERIALIZED (SELECT x, s FROM (
      SELECT x, s, ROW_NUMBER() OVER (PARTITION BY x ORDER BY s ASC) AS rn
      FROM und{r})
    WHERE rn <= {degree_cap}),
  cand{r} AS MATERIALIZED (
    SELECT DISTINCT a.s AS vec_id, b.s AS nbr_id
    FROM undc{r} a JOIN undc{r} b ON a.x = b.x AND a.s <> b.s
    UNION SELECT x, s FROM und{r}),
  sc{r} AS MATERIALIZED (
    SELECT c.vec_id, c.nbr_id,
           CAST(list_sum([q.qv[i] * n.qv[i] FOR i IN {rng}]) AS BIGINT) AS dot
    FROM cand{r} c
    JOIN qall q ON q.vec_id = c.vec_id
    JOIN qall n ON n.vec_id = c.nbr_id),
  e{r + 1} AS MATERIALIZED (
    SELECT vec_id, nbr_id, dot FROM (
      SELECT vec_id, nbr_id, dot,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dot DESC, nbr_id ASC) AS rn
      FROM sc{r})
    WHERE rn <= {L}),""")
    parts.append(f"""
  ranked AS (
    SELECT vec_id, nbr_id, dot,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY dot DESC, nbr_id ASC) AS rnk
    FROM e{refine_rounds})
SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, nbr_id, dot
FROM ranked WHERE rnk <= {k}""")
    return "\n".join(parts)


def graph_ann_topk_sql(
    *,
    k: int = 10,
    beam: int = 4,
    hops: int = 4,
    graph_k: int = 3,
    dim: int = 64,
    scale: int = 1000,
    query_vec_id: int = 0,
    source: str = "embeddings",
) -> str:
    """FULL value oracle for ``stages.ann.graph_ann_topk`` over an
    ``exact=True`` :func:`~ontoea_ray.stages.ann.build_knn_graph_index`
    (as driven by q_graph_ann): rebuilds the exact integer kNN graph,
    then unrolls the deterministic beam walk — entry at MIN(vec_id),
    each hop expands the frontier's out-neighbours, NEW candidates all
    join the visited pool, the top-``beam`` new candidates (integer dot
    DESC, id ASC) become the next frontier, and after ``hops`` hops the
    visited pool's top-``k`` is the answer.  Every dot is an integer
    milli product — no float anywhere, bit-for-bit replay."""
    rng = f"range(1, {dim + 1})"
    parts = [f"""
WITH q AS MATERIALIZED (
    SELECT vec_id,
           [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT)
            FOR i IN {rng}] AS qv
    FROM {source}),
  g AS MATERIALIZED (
    SELECT vec_id, nbr_id FROM (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY list_sum([a.qv[i] * b.qv[i] FOR i IN {rng}]) DESC,
                        b.vec_id ASC) AS rnk
      FROM q a JOIN q b ON a.vec_id <> b.vec_id)
    WHERE rnk <= {graph_k}),
  qv0 AS (SELECT qv FROM q WHERE vec_id = {query_vec_id}),
  sc AS MATERIALIZED (
    SELECT q.vec_id, CAST(list_sum([q.qv[i] * qv0.qv[i] FOR i IN {rng}]) AS BIGINT) AS dot
    FROM q CROSS JOIN qv0),
  v0 AS MATERIALIZED (SELECT MIN(vec_id) AS id FROM q),
  f0 AS (SELECT id FROM v0),"""]
    for t in range(1, hops + 1):
        parts.append(f"""
  c{t} AS MATERIALIZED (
    SELECT DISTINCT g.nbr_id AS id FROM g JOIN f{t - 1} f ON g.vec_id = f.id
    WHERE g.nbr_id NOT IN (SELECT id FROM v{t - 1})),
  f{t} AS MATERIALIZED (
    SELECT id FROM (
      SELECT c.id, ROW_NUMBER() OVER (ORDER BY sc.dot DESC, c.id ASC) AS rn
      FROM c{t} c JOIN sc ON sc.vec_id = c.id)
    WHERE rn <= {beam}),
  v{t} AS MATERIALIZED (SELECT id FROM v{t - 1} UNION SELECT id FROM c{t}),""")
    parts.append(f"""
  fin AS (
    SELECT sc.vec_id, sc.dot,
           ROW_NUMBER() OVER (ORDER BY sc.dot DESC, sc.vec_id ASC) AS rnk
    FROM v{hops} v JOIN sc ON sc.vec_id = v.id)
SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, dot FROM fin WHERE rnk <= {k}""")
    return "\n".join(parts)


def ann_ivf_topk_sql(
    *,
    k: int = 10,
    n_centroids: int = 16,
    dim: int = 64,
    iters: int = 4,
    scale: int = 1000,
    nprobe: int = 4,
    sample_size: int = 20_000,
    query_vec_id: int = 0,
    source: str = "embeddings",
) -> str:
    """Oracle for ``stages.ann.build_ivf_index(quantizer="integer")`` +
    ``ivf_index_topk`` (as driven by q_ann_ivf): replays the ENTIRE trained
    quantizer in SQL, not just its application — every training step is
    integer-exact and order-independent, so the centroids come out
    bit-identical to the engine's:

    - quantize each vector: floor(float64(v[d]) * scale) per dim (BIGINT)
    - training sample = first ``sample_size`` rows by (splitmix64(vec_id),
      vec_id) order; initial centroids = the first ``n_centroids`` of those
    - ``iters`` unrolled Lloyd rounds: assign by integer squared-Euclidean
      argmin (ties -> lowest centroid id), update by per-dim
      floor(sum/count) (FLOOR over DOUBLE division — exact for these
      magnitudes, and matches numpy floor_divide where `//` in DuckDB
      truncates); an empty cluster keeps its previous centroid
    - final lists = all rows assigned to the trained centroids; the query
      probes its ``nprobe`` integer-closest lists

    Only the LAST step (cosine top-k over the probed candidates) is float —
    the same DuckDB-vs-numpy float64 dot-product caveat as
    :func:`ann_lsh_topk_sql`, validated empirically per sf."""
    rng = f"range(1, {dim + 1})"
    sqdist = _ivf_sqdist(dim)
    parts = [
        _ivf_training_ctes(
            source=source, n_centroids=n_centroids, dim=dim, iters=iters,
            scale=scale, sample_size=sample_size,
        )
    ]
    parts.append(f"""
  qvec AS (SELECT qv FROM qall WHERE vec_id = {query_vec_id}),
  probes AS (
    SELECT cid FROM (
      SELECT c.cid,
             ROW_NUMBER() OVER (ORDER BY {sqdist('qvec.qv', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM cent{iters} c CROSS JOIN qvec)
    WHERE rn <= {nprobe}),
  cand AS (SELECT f.vec_id FROM finalasg f JOIN probes USING (cid))
SELECT vec_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT e.vec_id,
         ROW_NUMBER() OVER (
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                    (SELECT CAST(embedding AS DOUBLE[]) FROM {source}
                     WHERE vec_id = {query_vec_id})) DESC,
                    e.vec_id ASC) AS rnk
  FROM {source} e JOIN cand ON cand.vec_id = e.vec_id
) WHERE rnk <= {k}""")
    return "\n".join(parts)


def ann_pq_topk_sql(
    *,
    k: int = 10,
    m: int = 4,
    ksub: int = 8,
    dim: int = 64,
    iters: int = 3,
    scale: int = 1000,
    sample_size: int = 20_000,
    query_vec_id: int = 0,
    source: str = "embeddings",
) -> str:
    """Oracle for ``stages.ann.build_pq_index`` + ``pq_index_topk`` (as
    driven by q_ann_pq): replays the ENTIRE product quantizer in SQL —
    per-subspace integer k-means training (same sample / init / Lloyd
    steps as :func:`ann_ivf_topk_sql`, once per subspace), the code
    assignment of every row, the query's asymmetric-distance LUT and the
    final (adist ASC, vec_id ASC) ranking.  Unlike the LSH/IVF oracles
    even the FINAL ranking is integer — there is no float step anywhere,
    so every output column hash-matches bit-for-bit."""
    assert dim % m == 0
    dsub = dim // m
    rng = f"range(1, {dsub + 1})"

    def sqdist(av: str, bv: str) -> str:
        return f"list_sum([({av}[i] - {bv}[i]) * ({av}[i] - {bv}[i]) FOR i IN {rng}])"

    sv_cols = ", ".join(
        f"qv[{s * dsub + 1}:{(s + 1) * dsub}] AS sv{s}" for s in range(m)
    )
    parts = [f"WITH {splitmix64_ctes(source, 'vec_id')},"]
    parts.append(f"""
  hord AS (SELECT vec_id, embedding,
                  ROW_NUMBER() OVER (ORDER BY _h ASC, vec_id ASC) AS hrank
           FROM sm3),
  qall AS MATERIALIZED (
    SELECT vec_id, hrank, {sv_cols} FROM (
      SELECT vec_id, hrank,
             [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {scale}) AS BIGINT)
              FOR i IN range(1, {dim + 1})] AS qv
      FROM hord)),
  train AS MATERIALIZED (SELECT * FROM qall WHERE hrank <= {sample_size}),""")
    for s in range(m):
        parts.append(
            f"  c{s}_0 AS (SELECT hrank - 1 AS cid, sv{s} AS cv"
            f" FROM train WHERE hrank <= {ksub}),"
        )
        for t in range(iters):
            parts.append(f"""
  b{s}_{t} AS (
    SELECT vec_id, cid, sv FROM (
      SELECT train.vec_id, c.cid, train.sv{s} AS sv,
             ROW_NUMBER() OVER (PARTITION BY train.vec_id
                                ORDER BY {sqdist(f'train.sv{s}', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM train CROSS JOIN c{s}_{t} c)
    WHERE rn = 1),
  u{s}_{t} AS (
    SELECT cid, uu.i AS d,
           CAST(FLOOR(CAST(SUM(sv[uu.i]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
    FROM b{s}_{t}, UNNEST({rng}) AS uu(i)
    GROUP BY cid, uu.i),
  c{s}_{t + 1} AS (
    SELECT c.cid, COALESCE(n.cv, c.cv) AS cv
    FROM c{s}_{t} c
    LEFT JOIN (SELECT cid, list(cval ORDER BY d) AS cv FROM u{s}_{t} GROUP BY cid) n
      USING (cid)),""")
        parts.append(f"""
  code{s} AS MATERIALIZED (
    SELECT vec_id, cid AS code FROM (
      SELECT qall.vec_id, c.cid,
             ROW_NUMBER() OVER (PARTITION BY qall.vec_id
                                ORDER BY {sqdist(f'qall.sv{s}', 'c.cv')} ASC, c.cid ASC) AS rn
      FROM qall CROSS JOIN c{s}_{iters} c)
    WHERE rn = 1),
  qsub{s} AS (SELECT sv{s} AS qsv FROM qall WHERE vec_id = {query_vec_id}),
  sc{s} AS (
    SELECT code{s}.vec_id, {sqdist('q.qsv', 'c.cv')} AS d{s}
    FROM code{s} JOIN c{s}_{iters} c ON code{s}.code = c.cid
    CROSS JOIN qsub{s} q),""")
    joins = " ".join(f"JOIN sc{s} USING (vec_id)" for s in range(1, m))
    dsum = " + ".join(f"d{s}" for s in range(m))
    parts.append(f"""
  tot AS (SELECT sc0.vec_id, {dsum} AS adist FROM sc0 {joins})
SELECT vec_id, CAST(rnk AS BIGINT) AS rnk, CAST(adist AS BIGINT) AS adist FROM (
  SELECT vec_id, adist,
         ROW_NUMBER() OVER (ORDER BY adist ASC, vec_id ASC) AS rnk
  FROM tot
) WHERE rnk <= {k}""")
    return "\n".join(parts)


def _char_shingle_hash_exprs(n: int) -> tuple[str, dict[int, str]]:
    """(full-window expr over chars s[i..i+n-1], {short_len: expr}) —
    mirrors ``stages.blocking.char_shingle_hashes``: a full window folds
    ``acc = acc * P + codepoint`` starting from its FIRST codepoint; short
    rows fold from the FNV offset over all their chars."""

    def cp(pos_expr: str) -> str:
        return f"CAST(unicode(substring(s, {pos_expr}, 1)) AS HUGEINT)"

    acc = cp("i")
    for j in range(1, n):
        acc = _addmod(_mulmod_p(acc), cp(f"i+{j}"))
    shorts: dict[int, str] = {}
    for ln in range(0, n):
        e = str(FNV_OFFSET)
        for k in range(ln):
            e = _addmod(_mulmod_p(e), cp(str(k + 1)))
        shorts[ln] = e
    return acc, shorts


def _char_shingles_cte(shingle_n: int, source: str = "csrc") -> str:
    """CTE shl: per-(side, id) HUGEINT char-shingle-hash list over column
    ``s`` of ``source(side, id, s)`` (multiset — minima unaffected)."""
    full, shorts = _char_shingle_hash_exprs(shingle_n)
    short_cases = " ".join(
        f"WHEN length(s) = {ln} THEN [{expr}]"
        for ln, expr in sorted(shorts.items())
        if ln > 0
    )
    return f"""
  shl AS (
    SELECT side, id,
      CASE WHEN length(s) >= {shingle_n}
           THEN [{full} FOR i IN range(1, length(s) - {shingle_n - 2})]
           {short_cases}
           ELSE [CAST({FNV_OFFSET} AS HUGEINT)] END AS sh
    FROM {source})
"""


def lsh_cross_verified_sql(
    left_sql: str,
    right_sql: str,
    *,
    num_perm: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 7,
    max_group: int = 4000,
    jaccard_pct: int = 40,
    mention_col: str = "mention",
    entity_col: str = "entity",
) -> str:
    """Exact oracle for ``stages.blocking.lsh_link_candidates``: cross-table
    char-shingle MinHash-LSH candidates (mention x gazetteer) verified by
    exact char-shingle Jaccard >= jaccard_pct/100.

    ``left_sql`` / ``right_sql`` are subqueries each producing one string
    column ``id`` of DISTINCT surfaces.  Output: (mention, entity,
    inter_sz, union_sz) — all integer columns bit-exact with the engine."""
    assert num_perm % bands == 0
    r = num_perm // bands
    return f"""
WITH
  csrc AS (
    SELECT 0 AS side, id, id AS s FROM ({left_sql})
    UNION ALL
    SELECT 1 AS side, id, id AS s FROM ({right_sql})),
{_char_shingles_cte(shingle_n)},
  mins AS (
    SELECT s.side, s.id, perms.p AS p,
           MIN(((perms.a * s.h + perms.b) % {TWO64}) % {MERSENNE}) AS sig
    FROM (SELECT side, id, unnest(sh) AS h FROM shl) s, {_perm_values_sql(num_perm, seed)}
    GROUP BY s.side, s.id, perms.p),
  sidesigs AS (SELECT side, id, list(sig ORDER BY p) AS sigs
               FROM mins GROUP BY side, id),
{_band_chain_ctes(bands, r, id_cols=("side", "id"), source="sidesigs")},
  buck AS (SELECT side, id, band, acc % {MASK63 + 1} AS band_key FROM c{r}),
  ok AS (SELECT band, band_key FROM buck
         GROUP BY band, band_key
         HAVING COUNT(*) <= {max_group}
            AND COUNT(*) FILTER (WHERE side = 0) > 0
            AND COUNT(*) FILTER (WHERE side = 1) > 0),
  cand AS (SELECT DISTINCT a.id AS mention, b.id AS entity
           FROM buck a
           JOIN buck b ON a.band = b.band AND a.band_key = b.band_key
                      AND a.side = 0 AND b.side = 1
           JOIN ok ON ok.band = a.band AND ok.band_key = a.band_key),
  dsets AS (SELECT DISTINCT side, id, h
            FROM (SELECT side, id, unnest(sh) AS h FROM shl)),
  szs AS (SELECT side, id, COUNT(*) AS sz FROM dsets GROUP BY side, id),
  inter AS (SELECT a.id AS mention, b.id AS entity, COUNT(*) AS inter_sz
            FROM dsets a JOIN dsets b ON a.h = b.h AND a.side = 0 AND b.side = 1
            GROUP BY a.id, b.id)
SELECT i.mention AS {mention_col}, i.entity AS {entity_col},
       CAST(i.inter_sz AS BIGINT) AS inter_sz,
       CAST(sa.sz + sb.sz - i.inter_sz AS BIGINT) AS union_sz
FROM inter i
JOIN szs sa ON sa.side = 0 AND sa.id = i.mention
JOIN szs sb ON sb.side = 1 AND sb.id = i.entity
JOIN cand c ON c.mention = i.mention AND c.entity = i.entity
WHERE 100 * i.inter_sz >= {jaccard_pct} * (sa.sz + sb.sz - i.inter_sz)
"""
