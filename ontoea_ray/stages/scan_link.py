"""S2+S4+S5 fused — mention scan + ontology-aware linking + triple emit.

One actor-pool ``map_batches`` stage: the gazetteer / candidate index /
embeddings / CCM are fetched from the object store ONCE per actor in
``__init__`` (broadcast via ``ray.put``), then every batch is processed with
pure numpy/Arrow gathers — no Python loop over rows or tokens.

Fusing detection + linking avoids materializing a mentions table and a
url-keyed join for page context (the page-majority class is computed inside
the same batch).  Reference analogs: mention->entity candidate lookup is the
dictionary-encode join family (`read.py:120-163`), scoring is the fused
type-aware similarity (`alignment.py:40-44`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ontoea_ray.functions.text import tokenize
from ontoea_ray.state.linker import LinkerState

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("url", pa.string()),
    ]
)


class ScanAndLink:
    """Callable class for ``map_batches(..., concurrency=N)`` actor pools.

    ``combine_dedup=True`` runs the exact-dedup combiner on each batch's
    triples INSIDE the actor before returning, so only combiner-sized
    partials (distinct triples + counts) ever enter the object store — at
    10M amplified pages this cuts inter-stage traffic from ~7 GB of raw
    triples to tens of MB and removes the separate combiner operator from
    the critical path."""

    def __init__(self, state_ref, *, combine_dedup: bool = False, combine_fn=None):
        # ray.get on a ray.put ref is zero-copy for numpy payloads and runs
        # once per actor, not once per batch.
        self.state: LinkerState = ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        self.combine_dedup = combine_dedup
        # arbitrary in-actor combiner (same contract as combine_dedup: raw
        # mention rows never leave the actor) — lets auxiliary pipelines
        # fuse their own reduction into the scan, e.g. the edge-lifespan
        # min/max-timestamp combiner
        self.combine_fn = combine_fn
        st = self.state
        self._surf_lookup = pa.array(st.surfaces.tolist(), pa.string())
        self._pred_lookup = pa.array(st.predicates.tolist(), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._scan(batch)
        if self.combine_fn is not None:
            return self.combine_fn(out)
        if self.combine_dedup:
            from ontoea_ray.stages.canonicalize import _partial_dedup

            return _partial_dedup(out)
        return out

    def _scan(self, batch: pa.Table) -> pa.Table:
        st = self.state
        toks = tokenize(batch["text"])
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        n_rows = len(batch)
        n_flat = len(flat)
        if n_flat == 0:
            return TRIPLE_SCHEMA.empty_table()
        row_id = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(offsets))

        import pyarrow.compute as pc

        surf_id = pc.index_in(flat, value_set=self._surf_lookup).to_numpy(zero_copy_only=False)
        pred_id = pc.index_in(flat, value_set=self._pred_lookup).to_numpy(zero_copy_only=False)
        is_surf = ~np.isnan(surf_id) if surf_id.dtype.kind == "f" else surf_id >= 0
        is_pred = ~np.isnan(pred_id) if pred_id.dtype.kind == "f" else pred_id >= 0
        surf_id = np.where(is_surf, surf_id, 0).astype(np.int64)

        # --- page context class: majority class of unambiguous mentions ---
        unamb = is_surf & (st.cand_counts[surf_id] == 1)
        C = st.num_classes
        page_class = np.full(n_rows, st.root_class, np.int64)
        if unamb.any():
            cls = st.ent_class[st.cand_ids[surf_id[unamb], 0]].astype(np.int64)
            counts = np.bincount(row_id[unamb] * C + cls, minlength=n_rows * C).reshape(n_rows, C)
            has = counts.sum(axis=1) > 0
            page_class[has] = counts[has].argmax(axis=1)  # ties -> lowest class id

        # --- pattern scan: ENTITY PREDICATE ENTITY at consecutive tokens ---
        m = (
            is_surf[:-2]
            & is_pred[1:-1]
            & is_surf[2:]
            & (row_id[:-2] == row_id[2:])
        )
        pos = np.nonzero(m)[0]
        if len(pos) == 0:
            return TRIPLE_SCHEMA.empty_table()
        rows = row_id[pos]

        def resolve(mention_pos: np.ndarray) -> np.ndarray:
            """Argmax over candidates of sim + type_weight*CCM[class, ctx]."""
            sid = surf_id[mention_pos]
            ctx = page_class[row_id[mention_pos]]
            cid = st.cand_ids[sid]                       # [m, maxC]
            sim = st.cand_sim[sid].astype(np.float64)    # [m, maxC], -inf pads
            cls = st.ent_class[np.maximum(cid, 0)]       # pad-safe gather
            score = sim + st.type_weight * st.ccm[cls, ctx[:, None]]
            score[cid < 0] = -np.inf
            best = score.argmax(axis=1)                  # ties -> lowest slot = lexicographically smallest URI
            return cid[np.arange(len(sid)), best]

        subj_ids = resolve(pos)
        obj_ids = resolve(pos + 2)
        # all gathers stay in Arrow (no to_pylist on the hot path)
        if not hasattr(self, "_uri_lookup"):
            self._uri_lookup = pa.array(st.ent_uris.tolist(), pa.string())
        url_col = batch["url"].combine_chunks()
        return pa.table(
            {
                "subj": self._uri_lookup.take(pa.array(subj_ids)),
                "pred": flat.take(pa.array(pos + 1)),
                "obj": self._uri_lookup.take(pa.array(obj_ids)),
                "url": url_col.take(pa.array(rows)),
            }
        )


def default_pool_size(requested=None) -> int:
    """Actor-pool size that leaves a few CPUs for the surrounding task
    stages (read / fan-out / combiners) — an all-CPU pool starves the
    pipeline, but a half-CPU pool caps the dominant stage's throughput."""
    if requested is not None:
        return requested
    import os

    env = os.environ.get("ONTOEA_SCAN_POOL")
    if env:
        return max(1, int(env))
    total = int(ray.cluster_resources().get("CPU", 4))
    # A fixed 3/4 FRACTION of the session's CPUs at every cluster size, so
    # throughput-per-CPU is comparable across N and 4N (a size-dependent
    # fraction skews the scaling measurement).  Keep >=1 CPU free and the
    # producer stages below 1.0 num_cpus or the streaming executor starves
    # its own input tasks (observed deadlock at pool=total).
    return max(1, min(total - 1, max(1, (3 * total) // 4)))


def scan_and_link_stage(
    texts: ray.data.Dataset,
    state_ref,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 2048,
    num_cpus: float = 1,
    combine_dedup: bool = False,
    combine_fn=None,
) -> ray.data.Dataset:
    concurrency = default_pool_size(concurrency)
    return texts.map_batches(
        ScanAndLink,
        fn_constructor_args=(state_ref,),
        fn_constructor_kwargs={"combine_dedup": combine_dedup, "combine_fn": combine_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
