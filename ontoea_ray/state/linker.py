"""Broadcast linker state: gazetteer + candidate index + embeddings + CCM.

This is the "small side" of the entity-linking similarity join: built once on
the driver (or from a small prepass), shipped to every scorer actor via ONE
``ray.put`` and captured in actor ``__init__`` — never re-serialized per
batch and never shuffled (SURVEY.md §1.3).

Scoring semantics mirror the reference's fused type-aware score
(`/root/reference/code/src/openea/modules/finding/alignment.py:40-44`):
``score = cosine(surface_vec, entity_vec) + type_weight * CCM[class(cand),
context_class]`` — embedding similarity refined by class-hierarchy
compatibility from the ontology DAG.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import numpy as np


def stable_hash64(s: str) -> int:
    """Process-independent 64-bit hash (blake2b, fixed digest)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash_embed(key: str, dim: int = 32, seed: int = 0) -> np.ndarray:
    """Deterministic unit-norm pseudo-embedding for a string key."""
    rng = np.random.default_rng((stable_hash64(key) ^ (seed * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF)
    v = rng.standard_normal(dim).astype(np.float32)
    n = float(np.linalg.norm(v))
    return v / (n if n > 0 else 1.0)


@dataclass
class LinkerState:
    """Dense, gather-friendly candidate index for batched linking.

    surfaces[i] is a mention surface; candidate slots j < cand_counts[i]
    hold entity ids into ``ent_uris`` with a precomputed context-free
    cosine ``cand_sim`` and the candidate's ontology class.
    """

    surfaces: np.ndarray          # [S] object (str) — sorted
    predicates: np.ndarray        # [P] object (str) — sorted
    ent_uris: np.ndarray          # [V] object (str)
    ent_class: np.ndarray         # [V] int32 class id
    cand_ids: np.ndarray          # [S, maxC] int32, -1 padded
    cand_sim: np.ndarray          # [S, maxC] float32, -inf padded
    cand_counts: np.ndarray       # [S] int32
    ccm: np.ndarray               # [C, C] float32 class-compatibility
    root_class: int = 0           # owl:Thing analog (context fallback)
    type_weight: float = 0.2
    dim: int = 32
    meta: dict = field(default_factory=dict)

    @property
    def num_classes(self) -> int:
        return self.ccm.shape[0]


def build_linker_state(
    surface_to_cands: dict[str, list[str]],
    uri_class: dict[str, int],
    ccm: np.ndarray,
    predicates: list[str],
    *,
    root_class: int = 0,
    type_weight: float = 0.2,
    dim: int = 32,
    seed: int = 42,
    ent_vectors: dict[str, np.ndarray] | None = None,
    surf_vectors: dict[str, np.ndarray] | None = None,
) -> LinkerState:
    """Assemble the dense state from dict-shaped inputs.

    Candidate lists are sorted (deterministic tie-breaks); the context-free
    similarity is cosine between the surface embedding and the entity
    embedding.  By default both come from deterministic hash embeddings
    (entity = normalized mean of its surfaces' vectors, so a surface scores
    highest against entities it actually names); pass ``ent_vectors`` /
    ``surf_vectors`` (uri/surface -> vector) to use TRAINED OntoEA
    embeddings instead — the S4 OntoScorer configuration (SURVEY §7.0).
    """
    surfaces = sorted(surface_to_cands)
    ent_uris = sorted({u for cands in surface_to_cands.values() for u in cands})
    uri_idx = {u: i for i, u in enumerate(ent_uris)}

    if ent_vectors is not None:
        dim = len(next(iter(ent_vectors.values())))

    def _norm(v):
        n = float(np.linalg.norm(v))
        return (v / (n if n > 0 else 1.0)).astype(np.float32)

    if surf_vectors is not None:
        surf_vecs = np.stack([_norm(np.asarray(surf_vectors[s])) for s in surfaces])
    elif ent_vectors is not None:
        # surface vector = normalized mean of its candidates' trained
        # embeddings (the mention prior used at scoring time)
        surf_vecs = np.stack(
            [
                _norm(np.mean([np.asarray(ent_vectors[u]) for u in surface_to_cands[s]], axis=0))
                for s in surfaces
            ]
        ) if surfaces else np.zeros((0, dim), np.float32)
    else:
        surf_vecs = np.stack([hash_embed("surf:" + s, dim, seed) for s in surfaces]) if surfaces else np.zeros((0, dim), np.float32)

    if ent_vectors is not None:
        ent_vecs = np.stack([_norm(np.asarray(ent_vectors[u])) for u in ent_uris])
    else:
        ent_acc = np.zeros((len(ent_uris), dim), np.float32)
        ent_n = np.zeros(len(ent_uris), np.int64)
        for si, s in enumerate(surfaces):
            for u in surface_to_cands[s]:
                ent_acc[uri_idx[u]] += surf_vecs[si]
                ent_n[uri_idx[u]] += 1
        ent_vecs = ent_acc / np.maximum(ent_n, 1)[:, None]
        norms = np.linalg.norm(ent_vecs, axis=1, keepdims=True)
        ent_vecs = (ent_vecs / np.maximum(norms, 1e-12)).astype(np.float32)

    max_c = max((len(c) for c in surface_to_cands.values()), default=1)
    S = len(surfaces)
    cand_ids = np.full((S, max_c), -1, np.int32)
    cand_sim = np.full((S, max_c), -np.inf, np.float32)
    cand_counts = np.zeros(S, np.int32)
    for si, s in enumerate(surfaces):
        cands = sorted(surface_to_cands[s])
        cand_counts[si] = len(cands)
        for j, u in enumerate(cands):
            ei = uri_idx[u]
            cand_ids[si, j] = ei
            cand_sim[si, j] = float(surf_vecs[si] @ ent_vecs[ei])

    ent_class = np.array([uri_class.get(u, root_class) for u in ent_uris], np.int32)
    return LinkerState(
        surfaces=np.array(surfaces, dtype=object),
        predicates=np.array(sorted(predicates), dtype=object),
        ent_uris=np.array(ent_uris, dtype=object),
        ent_class=ent_class,
        cand_ids=cand_ids,
        cand_sim=cand_sim,
        cand_counts=cand_counts,
        ccm=ccm.astype(np.float32),
        root_class=root_class,
        type_weight=type_weight,
        dim=dim,
    )
