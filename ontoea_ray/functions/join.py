"""General distributed hash join.

Ray Data 2.49 ships a native ``Dataset.join`` backed by a fleet of
aggregator actors; on small sessions (tests, laptops) that fleet competes
with the read stage for CPUs, and its partition count must be chosen up
front.  This portable implementation reuses the repo's one-exchange
pattern instead: tag each side, schema-align the payload columns, union,
hash-co-locate on the join key (`with_partition_key`), and run one
vectorized ``pandas.merge`` per partition.  Exactly one all-to-all
exchange, partition count = `shuffle_width()` (∝ cluster CPUs), no
standing actors.

Use the native API when a standing aggregator pool is acceptable; use
this when you want the join to behave like every other wide op in the
engine (streaming tasks, width ∝ CPUs, deterministic small-session
behavior).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ontoea_ray.functions.shuffle import with_partition_key
from ontoea_ray.functions.tables import from_pandas as _from_pandas_clean


class _NormSchema:
    def __init__(self, names, types):
        self.names, self.types = names, types


def ensure_known_schema(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Return a dataset whose schema is readable WITHOUT re-executing it.

    ``ds.schema()`` on a lazy map/exchange pipeline executes the upstream
    plan — and because Datasets re-execute from lineage on every consume,
    a join that probes schemas and THEN unions its inputs runs each input
    twice (nested joins compound it exponentially).  Inputs whose schema is
    already known (e.g. Parquet reads) pass through untouched and keep
    streaming; computed inputs are materialized ONCE so the schema probe
    and the downstream consume share the same executed blocks — at scale
    that is a shuffle-boundary checkpoint in the object store (spillable),
    strictly cheaper than executing the pipeline twice."""
    if ds.schema(fetch_if_missing=False) is None:
        ds = ds.materialize()
    return ds


def _arrow_schema(ds: ray.data.Dataset) -> _NormSchema:
    """Dataset schema with every type normalized to a pyarrow DataType.

    Datasets whose blocks are pandas (e.g. a map_groups(pandas) tail)
    report a PandasBlockSchema: numpy dtypes, and the builtin ``object``
    class for string columns.  Map those to Arrow types so the join's
    cast targets are always DataTypes (object -> string: the engine's
    pandas-block string columns are always str)."""
    sch = ds.schema()
    types = []
    for t in sch.types:
        if isinstance(t, pa.DataType):
            types.append(t)
        elif t is object or t is str:
            types.append(pa.string())
        else:
            types.append(pa.from_numpy_dtype(np.dtype(t)))
    return _NormSchema(list(sch.names), types)


BROADCAST_BUDGET_BYTES = 128 << 20  # per-actor copy of the small side

# driver-side count of runtime-filter builds — lets tests assert the Bloom
# prune path actually activated (the prune fns themselves run in workers)
RUNTIME_FILTER_BUILDS = 0


def _broadcastable(ds, how: str, side: str) -> int | None:
    """Size in bytes if this side may run as the broadcast build side.

    Only already-materialized inputs are considered (a lazy side's size is
    unknown without executing it); the stream side must keep ALL its rows
    for the chosen ``how`` — inner joins can broadcast either side, a left
    join can only broadcast the right, a right join only the left, and a
    full outer join must track unmatched rows on both sides, so it never
    broadcasts."""
    ok = {"inner": ("left", "right"), "left": ("right",), "right": ("left",)}
    if side not in ok.get(how, ()):
        return None
    try:
        if isinstance(ds, ray.data.dataset.MaterializedDataset):
            sz = ds.size_bytes()
            if sz is not None and sz <= BROADCAST_BUDGET_BYTES:
                return sz
    except Exception:
        pass
    return None


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    how: str = "inner",
    rsuffix: str = "_r",
    width: int | None = None,
    broadcast: str = "auto",
    runtime_filter: bool = True,
) -> ray.data.Dataset:
    """Distributed hash join (inner / left / right / outer) on equality keys.

    Right-side key columns are renamed to the left's; payload columns that
    collide get ``rsuffix``.  Outer-join non-matches carry typed nulls.

    Physical plan selection (``broadcast``): when one side is already
    materialized, under ``BROADCAST_BUDGET_BYTES``, and compatible with
    ``how`` (see ``_broadcastable``), it ships ONCE per actor via
    ``ray.put`` and the big side streams through a map-side merge — ZERO
    exchange.  Otherwise both sides take the one-exchange plan (tag side,
    co-partition by key hash, per-partition vectorized merge).  Pass
    ``broadcast="none"`` to force the exchange plan, ``"left"``/``"right"``
    to force a side (asserts compatibility)."""
    assert how in ("inner", "left", "right", "outer")
    assert broadcast in ("auto", "none", "left", "right")
    right_on = right_on or on
    assert len(on) == len(right_on)
    ren = dict(zip(right_on, on))

    left, right = ensure_known_schema(left), ensure_known_schema(right)
    lsch, rsch = _arrow_schema(left), _arrow_schema(right)
    lpay = [n for n in lsch.names if n not in on]
    rpay_src = [n for n in rsch.names if n not in right_on]
    rpay = [(n, n + rsuffix if n in lpay or n in on else n) for n in rpay_src]
    out_r_names = [dst for _, dst in rpay]
    rtypes = {dst: rsch.types[rsch.names.index(src)] for src, dst in rpay}
    ltypes = {n: lsch.types[lsch.names.index(n)] for n in lpay}
    keytypes = {k: lsch.types[lsch.names.index(k)] for k in on}

    out_cols_final = on + lpay + [dst for _, dst in rpay]
    out_types_final = {**keytypes, **ltypes, **rtypes}

    # ---- physical plan selection: broadcast map-side merge when legal ----
    bcast_side = None
    if broadcast in ("left", "right"):
        assert _broadcastable(left if broadcast == "left" else right, how, broadcast) is not None, (
            f"side {broadcast!r} is not broadcastable for how={how!r} "
            "(must be materialized, under budget, and keep-all on the stream side)"
        )
        bcast_side = broadcast
    elif broadcast == "auto":
        lsz = _broadcastable(left, how, "left")
        rsz = _broadcastable(right, how, "right")
        if lsz is not None and rsz is not None:
            bcast_side = "left" if lsz <= rsz else "right"
        elif lsz is not None:
            bcast_side = "left"
        elif rsz is not None:
            bcast_side = "right"

    if bcast_side is not None:
        small, stream = (left, right) if bcast_side == "left" else (right, left)
        # normalized small-side frame: key cols under the LEFT's names/types,
        # payload cols under their output names
        small_keys = on if bcast_side == "left" else right_on
        small_pay = (
            [(n, n) for n in lpay] if bcast_side == "left" else rpay
        )

        def to_norm(b: pa.Table) -> pa.Table:
            cols = {
                k: b[sk].combine_chunks().cast(keytypes[k])
                for k, sk in zip(on, small_keys)
            }
            for src, dst in small_pay:
                cols[dst] = b[src].combine_chunks()
            return pa.table(cols)

        small_batches = [to_norm(b) for b in small.iter_batches(batch_format="pyarrow")]
        if small_batches:
            small_tbl = pa.concat_tables(small_batches)
        else:
            # a legitimately-empty small side (e.g. after a selective filter)
            # yields zero batches; synthesize the normalized empty table so
            # inner joins return empty and left/right joins keep their
            # unmatched stream rows with typed nulls
            empty_types = {k: keytypes[k] for k in on}
            empty_types.update(
                (dst, (ltypes if bcast_side == "left" else rtypes)[dst])
                for _, dst in small_pay
            )
            small_tbl = pa.table(
                {c: pa.array([], type=t) for c, t in empty_types.items()}
            )
        # plasma holds the ARROW table (zero-copy, node-shared); each actor
        # converts to its pandas merge frame once in __init__
        small_ref = ray.put(small_tbl)
        stream_keys = right_on if bcast_side == "left" else on
        stream_pay = rpay if bcast_side == "left" else [(n, n) for n in lpay]
        # pandas merge 'how' from the STREAM side's perspective
        merge_how = "inner" if how == "inner" else "left"

        class _BcastJoin:
            def __init__(self):
                self.small = ray.get(small_ref).to_pandas()

            def __call__(self, b: pa.Table) -> pa.Table:
                cols = {
                    k: b[sk].combine_chunks().cast(keytypes[k])
                    for k, sk in zip(on, stream_keys)
                }
                for src, dst in stream_pay:
                    cols[dst] = b[src].combine_chunks()
                df = pa.table(cols).to_pandas()
                out = df.merge(self.small, on=on, how=merge_how, sort=False)
                return pa.table({
                    c: pa.array(out[c], type=out_types_final[c], from_pandas=True)
                    for c in out_cols_final
                })

        from ontoea_ray.stages.scan_link import default_pool_size

        # pool scales with the cluster (the whole point of broadcasting is a
        # map-side merge as wide as the stream), but each actor holds its
        # own pandas frame of the small side (~3x the Arrow bytes for
        # object strings) — cap the pool so actors x copy stays inside a
        # heap budget instead of the old hard cap of 8
        import os

        heap_budget = int(os.environ.get("ONTOEA_BCAST_JOIN_HEAP_BYTES", 4 << 30))
        est_copy = max(1, 3 * small_tbl.nbytes)
        pool = max(2, min(default_pool_size(None), heap_budget // est_copy))
        return stream.map_batches(
            _BcastJoin,
            batch_format="pyarrow",
            concurrency=(1, pool),
        )

    # ---- runtime filter for the exchange plan: when one side is already
    # materialized (any size — the filter is m-bit, never key-set-sized)
    # and `how` allows dropping the other side's non-matches, prune the
    # stream side's batches with a Bloom of the build side's keys BEFORE
    # the exchange.  Superset semantics (false positives only) — pruned-in
    # non-matches simply fail to match after the shuffle, so the result is
    # identical; the exchange just moves selectivity-fewer bytes.
    prune_fns: dict = {0: None, 1: None}
    if runtime_filter:
        import pyarrow.compute as pc

        from ontoea_ray.stages.bloom import _bit_positions, _key_hashes
        from ontoea_ray.stages.dedup import _perm_params

        def _keystr(batch: pa.Table, keycols: list[str]):
            """Canonical key string per row + a 'has a null key' mask.

            Keys are cast to the join's normalized keytypes BEFORE
            stringifying — the same cast ``tag()`` applies — so
            joinable-but-differently-rendered values (decimal '5.00' vs
            float '5.0') hash identically on both sides.  Nulls are
            sentinel-filled for hashing; the caller force-keeps null-key
            rows so they flow through the exchange merge exactly as they
            did without the filter."""
            null_mask = np.zeros(len(batch), bool)
            parts = []
            for k, kt in zip(keycols, (keytypes[c] for c in on)):
                col = batch[k].combine_chunks().cast(kt)
                if col.null_count:
                    null_mask |= pc.is_null(col).to_numpy(zero_copy_only=False)
                parts.append(pc.fill_null(col.cast(pa.string()), ""))
            if len(parts) == 1:
                return parts[0], null_mask
            return pc.binary_join_element_wise(*parts, "\x1f"), null_mask

        def _build_bits(build_ds, keycols):
            global RUNTIME_FILTER_BUILDS
            RUNTIME_FILTER_BUILDS += 1
            n = build_ds.count() or 1
            m_bits = 1 << max(14, min(24, int(np.ceil(np.log2(n * 10)))))
            a, b = _perm_params(4, 11)

            def partial(batch: pa.Table) -> pa.Table:
                keys, null_mask = _keystr(batch, keycols)
                if null_mask.any():
                    keys = keys.filter(pa.array(~null_mask))
                h = _key_hashes(keys)
                bits = np.zeros(m_bits, bool)
                if len(h):
                    bits[_bit_positions(np.unique(h), a, b, m_bits).reshape(-1)] = True
                return pa.table({"packed": pa.array([np.packbits(bits).tobytes()], pa.binary())})

            packed = np.zeros(m_bits // 8, np.uint8)
            for row in build_ds.map_batches(partial, batch_format="pyarrow").take_all():
                packed |= np.frombuffer(row["packed"], np.uint8)
            return ray.put(packed), m_bits, a, b

        def _make_prune(bits_ref, m_bits, a, b, keycols):
            def prune(batch: pa.Table) -> pa.Table:
                if len(batch) == 0:
                    return batch
                packed = ray.get(bits_ref)  # zero-copy from the object store
                keys, null_mask = _keystr(batch, keycols)
                h = _key_hashes(keys)
                pos = _bit_positions(h, a, b, m_bits)
                # test bits on the PACKED array (np.packbits is MSB-first)
                hit = (packed[pos >> 3] >> (7 - (pos & 7))) & 1
                keep = hit.all(axis=0).astype(bool)
                # null-key rows bypass the filter: the merge decides their
                # fate, identically to the unfiltered plan
                keep |= null_mask
                return batch.filter(pa.array(keep))

            return prune

        is_mat = ray.data.dataset.MaterializedDataset
        # build side must be materialized; a side is prunable only when its
        # non-matches are absent from the result: inner -> either side,
        # left -> prune the RIGHT side only (all left rows survive),
        # right -> prune the LEFT side only, outer -> neither.
        if how in ("inner", "right") and isinstance(right, is_mat) and not isinstance(left, is_mat):
            ref, m, a_, b_ = _build_bits(right, right_on)
            prune_fns[0] = _make_prune(ref, m, a_, b_, on)
        elif how in ("inner", "left") and isinstance(left, is_mat) and not isinstance(right, is_mat):
            ref, m, a_, b_ = _build_bits(left, on)
            prune_fns[1] = _make_prune(ref, m, a_, b_, right_on)

    def tag(side: int):
        pre = prune_fns[side]

        def fn(batch: pa.Table) -> pa.Table:
            if pre is not None:
                batch = pre(batch)
            cols: dict = {}
            for k in on:
                src = k if side == 0 else right_on[on.index(k)]
                cols[k] = batch[src].combine_chunks().cast(keytypes[k])
            cols["_side"] = pa.array(np.full(len(batch), side, np.int8), pa.int8())
            for n in lpay:
                cols[n] = batch[n].combine_chunks() if side == 0 else pa.nulls(len(batch), ltypes[n])
            for src, dst in rpay:
                cols[dst] = batch[src].combine_chunks() if side == 1 else pa.nulls(len(batch), rtypes[dst])
            return pa.table(cols)

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    parted = with_partition_key(both, on, width=width)
    out_cols = on + lpay + out_r_names
    out_types = {**keytypes, **ltypes, **rtypes}

    def join_part(df: pd.DataFrame) -> pa.Table:
        l = df[df["_side"] == 0][on + lpay]
        r = df[df["_side"] == 1][on + out_r_names]
        out = l.merge(r, on=on, how=how, sort=False)
        # pandas lifts int columns with typed nulls to float64; cast back to
        # the declared Arrow types (from_pandas=True maps NaN -> null for
        # left-join non-matches)
        return pa.table({
            c: pa.array(out[c], type=out_types[c], from_pandas=True) for c in out_cols
        })

    return parted.groupby("pkey").map_groups(join_part, batch_format="pandas")


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: list[str],
    right_on: list[str] | None = None,
    salts: int = 8,
    hot_threshold: int = 10_000,
    width: int | None = None,
    rsuffix: str = "_r",
    _keep_salt: bool = False,
) -> ray.data.Dataset:
    """Skew-resilient INNER hash join: probe-side hot keys split into
    ``salts`` sub-keys so one dominant key no longer lands on one exchange
    partition.

    The standard hot-key salting construction: a first combiner-first pass
    counts probe keys; keys with >= ``hot_threshold`` rows form the hot set
    (bounded by n_left / hot_threshold BY CONSTRUCTION — that list is the
    only driver state).  Hot probe rows take salt = row-slot % salts, cold
    rows salt 0; build rows whose key is hot REPLICATE once per salt (the
    trade: ``salts``x duplication of the hot slice of the build side),
    cold build rows take salt 0, and the ordinary exchange join runs on
    (key..., salt).  The result set is invariant to the salt assignment —
    every (probe row, build row) key match meets in exactly one salt — so
    the output is row-for-row the plain ``hash_join(..., how='inner')``
    (pinned in tests/test_skew_join.py).

    Probe-side skew only; a skewed BUILD side mirrors the construction
    with the roles swapped.  ``broadcast`` is forced off: salting exists
    precisely for the regime where the build side is too big to ship.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ontoea_ray.functions.shuffle import keyed_aggregate

    right_on = list(right_on or on)
    on = list(on)
    assert len(right_on) == len(on)
    salt_col = "_skew_salt"
    # left is consumed twice (hot-key count pass + the join itself) — pin
    # it to executed blocks ONCE so a lazy probe pipeline does not re-run
    # per consume; the schema assert reuses the now-known schema (a bare
    # ds.schema() would itself have executed the plan a third time)
    left, right = ensure_known_schema(left), ensure_known_schema(right)
    for ds in (left, right):
        sch = ds.schema(fetch_if_missing=False)
        names = sch.names if sch is not None else []
        assert salt_col not in names, salt_col

    # pass 1: combiner-first probe-key counts; the hot SET is tiny by
    # construction (<= n_left / hot_threshold keys)
    totals = keyed_aggregate(
        left.map_batches(lambda b: b.select(on), batch_format="pyarrow"),
        on,
        count_alias="_n",
    )
    hot_tbl = pa.Table.from_pylist(
        totals.filter(lambda r: r["_n"] >= hot_threshold).take_all()
    )

    def _keyvals(batch: pa.Table, cols: list[str]):
        if len(cols) == 1:
            return batch[cols[0]].combine_chunks().cast(pa.string())
        parts = [pc.fill_null(batch[c].combine_chunks().cast(pa.string()), "") for c in cols]
        return pc.binary_join_element_wise(*parts, "\x1f")

    if len(hot_tbl) == 0:
        hot_set = pa.array([], pa.string())
    else:
        hot_set = _keyvals(hot_tbl.select(on), on)
    hot_ref = ray.put(hot_set)

    def salt_probe(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        salt = np.zeros(len(batch), np.int64)
        if len(hs) and len(batch):
            hot = pc.is_in(_keyvals(batch, on), value_set=hs).to_numpy(
                zero_copy_only=False
            )
            salt[hot] = np.arange(int(hot.sum()), dtype=np.int64) % salts
        return batch.append_column(salt_col, pa.array(salt))

    def salt_build(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        n = len(batch)
        if not len(hs) or not n:
            return batch.append_column(salt_col, pa.array(np.zeros(n, np.int64)))
        hot = pc.is_in(_keyvals(batch, right_on), value_set=hs).to_numpy(
            zero_copy_only=False
        )
        idx_hot = np.flatnonzero(hot)
        idx_cold = np.flatnonzero(~hot)
        take = np.concatenate([idx_cold, np.repeat(idx_hot, salts)])
        salt = np.concatenate(
            [
                np.zeros(len(idx_cold), np.int64),
                np.tile(np.arange(salts, dtype=np.int64), len(idx_hot)),
            ]
        )
        return batch.take(pa.array(take)).append_column(salt_col, pa.array(salt))

    joined = hash_join(
        left.map_batches(salt_probe, batch_format="pyarrow"),
        right.map_batches(salt_build, batch_format="pyarrow"),
        on=on + [salt_col],
        right_on=right_on + [salt_col],
        how="inner",
        rsuffix=rsuffix,
        width=width,
        broadcast="none",
        runtime_filter=False,
    )
    if _keep_salt:  # test hook: observe the salt spread pre-drop
        return joined
    return joined.drop_columns([salt_col])
