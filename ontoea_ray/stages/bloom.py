"""Bloom-filter semi-join — the shuffle-free large×large key filter.

At 100 TB a semi-join where BOTH sides are big cannot broadcast the key
set (too large) and should not shuffle the probe side (too expensive).
The standard fix: reduce the build side to an m-bit Bloom filter (a few
MiB for hundreds of millions of keys at ~1% FP), broadcast THAT via
``ray.put``, and filter the probe side streaming — zero shuffles, one
pass over each side.  The result is a superset of the true semi-join
(false positives only, never false negatives); callers either accept the
FP rate or chain the true keyed semi-join over the (much smaller)
survivor set.

Determinism / oracle: bit positions are ``((a_i*h + b_i) mod 2^64) mod m``
over the md5[:8] key hash with seeded perm params — DuckDB can rebuild the
same filter and replay membership exactly (`functions.lsh_sql
.bloom_semi_join_sql`), so even the false positives are value-checked.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.stages.dedup import _perm_params, _token_hashes


def _key_hashes(arr: pa.Array) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string())
    return _token_hashes(arr)


def _bit_positions(h: np.ndarray, a: np.ndarray, b: np.ndarray, m: int) -> np.ndarray:
    """[n_hashes, n_keys] bit indices: ((a_i*h + b_i) mod 2^64) mod m."""
    return ((a[:, None] * h[None, :] + b[:, None]) % np.uint64(m)).astype(np.int64)


def build_bloom(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 11,
) -> np.ndarray:
    """One streaming pass over the build side -> packed bit array
    (uint8[m_bits/8]).  Per-block partial filters are OR-merged; the driver
    holds only the m-bit array (filter-sized, never key-set-sized)."""
    a, b = _perm_params(n_hashes, seed)

    def partial(batch: pa.Table) -> pa.Table:
        h = _key_hashes(batch[key_col])
        bits = np.zeros(m_bits, bool)
        if len(h):
            bits[_bit_positions(np.unique(h), a, b, m_bits).reshape(-1)] = True
        return pa.table({"packed": pa.array([np.packbits(bits).tobytes()], pa.binary())})

    packed = np.zeros(m_bits // 8, np.uint8)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        packed |= np.frombuffer(row["packed"], np.uint8)
    return packed


def bloom_semi_join(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    *,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 11,
) -> ray.data.Dataset:
    """Rows of ``probe`` whose key MAY appear in ``build`` (Bloom superset
    semi-join: no false negatives; FP rate ~ (1-e^(-kn/m))^k)."""
    a, b = _perm_params(n_hashes, seed)
    packed = build_bloom(build, key_col=build_key, m_bits=m_bits, n_hashes=n_hashes, seed=seed)
    bits_ref = ray.put(np.unpackbits(packed).astype(bool))

    def keep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        bits = ray.get(bits_ref)
        h = _key_hashes(batch[probe_key])
        pos = _bit_positions(h, a, b, m_bits)
        return batch.filter(pa.array(bits[pos].all(axis=0)))

    return probe.map_batches(keep, batch_format="pyarrow")
