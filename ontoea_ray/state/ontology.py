"""Ontology kernel: class paths, disjointness, the Class-Conflict Matrix
(CCM) in all six reference variants, seed supervision, and class-path
padding with decay-softmax position weights.

Pure python/numpy (the class universe C is tiny — dozens to hundreds), built
once on the driver and broadcast to scorer actors via ``ray.put``; never
shuffled (SURVEY.md §1.3, §2.9).

Semantics reproduced from the reference (cited, not copied):
- ancestor walk / functional child->parent dict:
  /root/reference/code/src/openea/modules/utils/check.py:25-53,113-119
- disjointness over ancestor lists: check.py:171-181
- CCM variants v1..v6 (version arg 0..5; shipped default version=4 -> v5
  Dice-style path-set overlap): check.py:56-100,103-343 and config
  /root/reference/code/run/args/ontoea_args_15K.json:21
- seed supervision with owl:Thing miss-completion:
  /root/reference/code/src/openea/modules/load/kgs.py:283-307
- class-path padding + decay softmax weights: kgs.py:315-339
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

THING = "http://www.w3.org/2002/07/owl#Thing"
MISS = THING  # a missing entity type is modelled as owl:Thing
NEG_INF = -1e9


@dataclass
class Ontology:
    """Tree-shaped ontology: functional child->parent plus disjoint pairs."""

    subclass: dict[str, str]              # child -> parent (exactly one parent)
    disjoint: dict[str, str] = field(default_factory=dict)

    def classes(self) -> list[str]:
        return sorted(set(self.subclass) | set(self.subclass.values()))

    def path(self, c: str) -> list[str]:
        """Ancestor walk: [c, parent(c), ..., root]."""
        out = [c]
        while c in self.subclass:
            c = self.subclass[c]
            out.append(c)
        return out

    def paths(self) -> dict[str, list[str]]:
        return {c: self.path(c) for c in self.classes()}


def check_disjoint(disjoint: dict[str, str], a_path: list[str], b_path: list[str]) -> bool:
    """True iff any ancestor of one side is declared disjoint with any
    ancestor of the other (either direction of the functional dict)."""
    b_set = set(b_path)
    a_set = set(a_path)
    for a in a_path:
        if disjoint.get(a) in b_set:
            return True
    for b in b_path:
        if disjoint.get(b) in a_set:
            return True
    return False


def _common_suffix_cursor(a_path: list[str], b_path: list[str]) -> tuple[int, int]:
    """Walk both paths from the root end while they agree; return the first
    indices (from the front) where they diverge."""
    i, j = len(a_path) - 1, len(b_path) - 1
    while i >= 0 and j >= 0 and a_path[i] == b_path[j]:
        i -= 1
        j -= 1
    return i, j


def check_type_v1(onto: Ontology, a: str, b: str) -> float:
    """Equal-depth-suffix compatibility; both-Thing -> 0.5; no disjointness."""
    pa_, pb = onto.path(a), onto.path(b)
    la, lb = len(pa_), len(pb)
    if la == lb == 1 and pa_[0] == THING:
        return 0.5
    if la == lb:
        return 1.0 if pa_[0] == pb[0] and THING not in pa_[0] else 0.0
    if la > lb:
        return 1.0 if pa_[la - lb] == pb[0] and THING not in pb[0] else 0.0
    return 1.0 if pb[lb - la] == pa_[0] and THING not in pa_[0] else 0.0


def check_type_v2(onto: Ontology, a: str, b: str, unsure_w: float = 0.5) -> float:
    """Disjoint -> -1; both-Thing -> unsure_w; containment via common-suffix
    walk (Thing-rooted containment -> unsure_w); siblings whose lowest common
    ancestor is Thing -> -1, otherwise 1."""
    pa_, pb = onto.path(a), onto.path(b)
    if check_disjoint(onto.disjoint, pa_, pb):
        return -1.0
    if len(pa_) == len(pb) == 1 and pa_[0] == THING:
        return unsure_w
    i, j = _common_suffix_cursor(pa_, pb)
    if i < 0 or j < 0:  # one path is a suffix of the other (containment)
        if i < 0 and pa_[i + 1] == THING:
            return unsure_w
        if j < 0 and pb[j + 1] == THING:
            return unsure_w
        return 1.0
    # divergence: lowest common ancestor is at i+1 / j+1
    return -1.0 if pa_[i + 1] == THING else 1.0


def check_type_v3(onto: Ontology, a: str, b: str) -> float:
    """v1 plus: equal-depth siblings under a common non-Thing parent -> 1."""
    pa_, pb = onto.path(a), onto.path(b)
    la, lb = len(pa_), len(pb)
    if la == lb:
        if pa_[0] == pb[0]:
            return 1.0
        if pa_[1] == pb[1] and THING not in pa_[1]:
            return 1.0
        return 0.0
    if la > lb:
        return 1.0 if pa_[la - lb] == pb[0] and THING not in pb[0] else 0.0
    return 1.0 if pb[lb - la] == pa_[0] and THING not in pa_[0] else 0.0


def check_type_v4(onto: Ontology, a: str, b: str) -> float:
    """Exact equality only (diagonal matrix)."""
    pa_, pb = onto.path(a), onto.path(b)
    return 1.0 if len(pa_) == len(pb) and pa_[0] == pb[0] else 0.0


def check_type_v5(onto: Ontology, a: str, b: str, k: float = 0) -> float:
    """Dice-style path-set overlap: (2*|A∩B|+k)/(|A|+|B|+k); disjoint -> 0.

    This is the shipped default (reference config check_version: 4)."""
    pa_, pb = onto.path(a), onto.path(b)
    if check_disjoint(onto.disjoint, pa_, pb):
        return 0.0
    if len(pa_) == len(pb) and pa_[0] == pb[0]:
        return 1.0
    aset, bset = set(pa_), set(pb)
    return (2 * len(aset & bset) + k) / (len(aset) + len(bset) + k)


def check_type_v6(onto: Ontology, a: str, b: str, k: float = 0) -> float:
    """Overlap coefficient: (|A∩B|+k)/(max(|A|,|B|)+k); disjoint -> 0."""
    pa_, pb = onto.path(a), onto.path(b)
    if check_disjoint(onto.disjoint, pa_, pb):
        return 0.0
    if len(pa_) == len(pb) and pa_[0] == pb[0]:
        return 1.0
    aset, bset = set(pa_), set(pb)
    return (len(aset & bset) + k) / (max(len(aset), len(bset)) + k)


_VERSIONS = {0: check_type_v1, 1: check_type_v2, 2: check_type_v3, 3: check_type_v4, 4: check_type_v5, 5: check_type_v6}


def build_ccm(
    onto: Ontology,
    *,
    version: int = 4,
    unsure_w: float = 0.0,
    k: float = 0,
    class_ids: dict[str, int] | None = None,
) -> tuple[dict[str, int], np.ndarray]:
    """Materialize the C×C class-compatibility matrix.

    ``version`` follows the reference's 0-based dispatch (0->v1 ... 5->v6,
    default 4 -> v5).  ``class_ids`` fixes the row/col order (the reference
    re-orders the matrix to the ontology-entity id space, kgs.py:273-281);
    defaults to sorted-URI order.
    """
    classes = onto.classes()
    if class_ids is None:
        class_ids = {c: i for i, c in enumerate(classes)}
    fn = _VERSIONS[version]
    C = len(class_ids)
    mat = np.zeros((C, C), dtype=np.float64)
    for a, i in class_ids.items():
        for b, j in class_ids.items():
            if version == 1:
                mat[i, j] = fn(onto, a, b, unsure_w=unsure_w)
            elif version in (4, 5):
                mat[i, j] = fn(onto, a, b, k=k)
            else:
                mat[i, j] = fn(onto, a, b)
    return class_ids, mat


def supervise_ccm(
    ccm: np.ndarray,
    class_ids: dict[str, int],
    seed_links: list[tuple[str, str]],
    kg1_types: dict[str, str],
    kg2_types: dict[str, str],
    *,
    miss_completion: bool = False,
) -> np.ndarray:
    """Seed supervision: for every training link set CCM[type(e1)][type(e2)]=1.

    With ``miss_completion`` a Thing-typed side inherits the other side's
    class first (the dicts are updated in place, matching the reference)."""
    out = ccm.copy()
    for a, b in seed_links:
        atype, btype = kg1_types[a], kg2_types[b]
        if miss_completion:
            if atype == MISS and btype != MISS:
                kg1_types[a] = btype
                atype = btype
            elif atype != MISS and btype == MISS:
                kg2_types[b] = atype
                btype = atype
        out[class_ids[atype], class_ids[btype]] = 1.0
    return out


def padded_class_paths(
    path_ids: dict[int, list[int]], *, decay_weight: float = 1.0
) -> tuple[int, np.ndarray, np.ndarray]:
    """Left-pad id-encoded class paths to uniform depth and compute the
    decay-softmax position weights.

    For a path of length L at max depth D: positions 0..D-L-1 are padding
    (class id 0, weight exp(NEG_INF) ≈ 0); real positions get raw weights
    1, decay, decay², ... (class itself first) before a softmax over all D
    positions.  Returns (max_depth, path_matrix [C,D] int64, weights [C,D])
    with rows ordered by class id.
    """
    max_depth = max((len(p) for p in path_ids.values()), default=0)
    keys = sorted(path_ids)
    paths = np.zeros((len(keys), max_depth), dtype=np.int64)
    weights = np.zeros((len(keys), max_depth), dtype=np.float64)
    for r, c in enumerate(keys):
        p = path_ids[c]
        pad = max_depth - len(p)
        paths[r, pad:] = p
        raw = np.full(max_depth, NEG_INF, dtype=np.float64)
        raw[pad:] = decay_weight ** np.arange(len(p))
        e = np.exp(raw)
        weights[r] = e / e.sum()
    return max_depth, paths, weights
