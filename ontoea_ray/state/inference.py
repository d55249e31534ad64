"""Ontology-guided class inference: entropy-based class complement for
untyped entities, seed calibration, path truncation, consistency stats.

Semantics reproduced (cited, not copied) from
/root/reference/code/src/openea/modules/utils/inference.py:

- top-2 entropy over child-class frequencies (:152-186): frequencies of the
  two most frequent children re-normalized, Shannon entropy base 2;
- find_class_by_relation (:193-282): for an untyped entity, per incident
  relation (head and tail direction) collect the classes of counterpart
  entities, then over all triples of that relation whose counterpart class
  matches, accumulate a class-frequency tree over the typed same-side
  entities' ancestor paths and descend from owl:Thing while the children's
  top-2 entropy stays <= threshold, stepping to the child with the highest
  GLOBAL frequency (reference picks ``max(..., key=class_freq.get)``);
  per-relation predictions keep the minimal stop-entropy;
- class_complement (:416-468): iterate the cv-link dict IN ORDER; each
  accepted prediction is visible to later entities (sequential semantics —
  reproduced; a snapshot-parallel variant is available via
  ``sequential=False``); predictions verified against the aligned
  counterpart's class with check_type_v2 == 1 (the reference's
  exact-equality branch at :302 compares the ``type`` builtin and is dead
  code, so v2-containment is the effective filter), conflicts dropped
  unless ``supervised``;
- calibrate_cv_link_by_seed / _by_supervised_link (:320-359): copy the
  class across a seed pair when exactly one side is Thing;
- class_path_truncation (:497-511): replace classes deeper than max_depth
  by their ancestor at depth max_depth;
- check_ills_consistent (:471-489): same/contained/conflict/missing counts.

The adjacency indexes (h_rt / r_ht / t_hr) are built from a triples Dataset
with a single pass; they are the reference's KG dicts (kg.py:90-100) and at
web scale would be materialized groupby tables — here they are broadcast
driver dicts because class inference runs on the (small) ontology track.
"""

from __future__ import annotations

import math
from collections import defaultdict

import ray.data

from ontoea_ray.state.ontology import THING, Ontology, check_type_v2


def build_adjacency(triples: ray.data.Dataset | list) -> dict:
    """h_rt: head -> {(rel, tail)}, r_ht: rel -> {(head, tail)},
    t_hr: tail -> {(head, rel)} — reference kg.py:90-100 / inference.py:39-66."""
    rows = triples.take_all() if isinstance(triples, ray.data.Dataset) else [
        {"subj": h, "pred": r, "obj": t} for h, r, t in triples
    ]
    h_rt, r_ht, t_hr = defaultdict(set), defaultdict(set), defaultdict(set)
    for row in rows:
        h, r, t = row["subj"], row["pred"], row["obj"]
        h_rt[h].add((r, t))
        r_ht[r].add((h, t))
        t_hr[t].add((h, r))
    return {"h_rt": dict(h_rt), "r_ht": dict(r_ht), "t_hr": dict(t_hr)}


def calculate_freq(children, freq: dict) -> dict:
    total = sum(freq[c] for c in children)
    return {c: freq[c] / total for c in children}


def calculate_entropy(children, freq: dict) -> float:
    """Top-2 entropy: renormalize the two most frequent children, Shannon
    entropy base 2; single child -> 0."""
    if len(children) == 1:
        return 0.0
    ratios = sorted(calculate_freq(children, freq).items(), key=lambda x: x[1], reverse=True)
    a, b = ratios[0][1], ratios[1][1]
    s = a + b
    out = 0.0
    for p in (a / s, b / s):
        out += -p * math.log(p, 2)
    return out


def find_class_by_relation(
    entity: str,
    cv_link: dict,
    onto: Ontology,
    adj: dict,
    *,
    entropy_threshold: float = 0.7,
    loc: str = "head",
) -> dict:
    """Candidate classes (-> stop entropy) for one untyped entity from one
    direction.  See module docstring for the exact descent rules."""
    h_rt, r_ht, t_hr = adj["h_rt"], adj["r_ht"], adj["t_hr"]
    if loc == "head":
        if entity not in h_rt:
            return {}
        incident = [(r, t) for r, t in h_rt[entity]]
    else:
        if entity not in t_hr:
            return {}
        incident = [(r, h) for h, r in t_hr[entity]]
    relations = sorted({r for r, _ in incident})

    other_type: dict[str, set] = {r: set() for r, _ in incident}
    for r, e in incident:
        if e in cv_link and cv_link[e] != THING:
            other_type[r].add(cv_link[e])

    rel_type_prob: dict[str, float] = {}
    for rel in relations:
        pairs = [(h, t) for h, t in r_ht[rel]] if loc == "head" else [(t, h) for h, t in r_ht[rel]]
        same_side = set()
        for h, t in pairs:
            t_type = cv_link.get(t, THING)
            if t_type in other_type[rel] and cv_link.get(h, THING) != THING:
                same_side.add(h)
        class_freq: dict[str, int] = {}
        tree: dict[str, set] = {}
        for e in same_side:
            path = onto.path(cv_link.get(e, THING))
            for c in path:
                class_freq[c] = class_freq.get(c, 0) + 1
            for i in range(len(path) - 1):
                tree.setdefault(path[i + 1], set()).add(path[i])
        node = THING
        entropy = 0.0
        while node in tree:
            children = tree[node]
            entropy = calculate_entropy(children, class_freq)
            if entropy > entropy_threshold:
                break
            node = max(calculate_freq(children, class_freq), key=class_freq.get)
        if node != THING:
            rel_type_prob[node] = min(rel_type_prob.get(node, entropy), entropy)
    return rel_type_prob


def calibrate_cv_links(cv1: dict, cv2: dict, links: list[tuple[str, str]]) -> int:
    """Copy the class across each seed pair when exactly one side is Thing
    (in-place, like the reference).  Returns the number of changes."""
    changed = 0
    for a, b in links:
        ta, tb = cv1.get(a, THING), cv2.get(b, THING)
        if ta == THING and tb != THING:
            cv1[a] = tb
            changed += 1
        elif ta != THING and tb == THING:
            cv2[b] = ta
            changed += 1
    return changed


def class_complement(
    cv_link: dict,
    counterpart_cv: dict,
    links_to_counterpart: dict,
    onto: Ontology,
    adj: dict,
    *,
    entropy_threshold: float = 0.4,
    supervised: bool = False,
    sequential: bool = True,
) -> dict:
    """Infer classes for Thing-typed entities of ONE side.  Returns the
    accepted {entity: predicted_class}; ``cv_link`` is updated in place.

    ``sequential=True`` reproduces the reference's iteration-order-visible
    updates; ``False`` evaluates every entity against a snapshot (the
    embarrassingly parallel variant for map_batches fan-out at scale)."""
    snapshot = dict(cv_link) if not sequential else cv_link
    predictions: dict[str, str] = {}
    for ent, cls in list(cv_link.items()):
        if cls != THING:
            continue
        view = snapshot if not sequential else cv_link
        pred_h = find_class_by_relation(ent, view, onto, adj, entropy_threshold=entropy_threshold, loc="head")
        pred_t = find_class_by_relation(ent, view, onto, adj, entropy_threshold=entropy_threshold, loc="tail")
        merged = {**pred_h, **pred_t}
        best, best_e = THING, 1000.0
        for t, e in merged.items():
            if best_e >= e:
                best_e, best = e, t
        if best_e == 1000.0:
            continue
        predictions[ent] = best
        if sequential:
            cv_link[ent] = best

    # verify vs the aligned counterpart's class (check_type_v2 containment)
    accepted: dict[str, str] = {}
    for ent, pred in predictions.items():
        counterpart = links_to_counterpart.get(ent)
        t_type = counterpart_cv.get(counterpart, THING) if counterpart else THING
        flag = check_type_v2(onto, pred, t_type)
        if flag == 1 or supervised:
            accepted[ent] = pred
            cv_link[ent] = pred
        elif sequential:
            cv_link[ent] = pred  # the reference keeps the in-loop write even
            # when the verification drops the prediction from the result set
    return accepted


def class_path_truncation(cv_link: dict, onto: Ontology, max_depth: int) -> dict:
    """Replace classes whose path exceeds max_depth by the ancestor at that
    depth (in place); returns the new dict view."""
    for ent, cls in list(cv_link.items()):
        path = onto.path(cls)
        if len(path) > max_depth:
            cv_link[ent] = path[len(path) - max_depth]
    return cv_link


def check_ills_consistent(onto: Ontology, type_pairs: list[tuple[str, str]]) -> dict:
    """Same / contained / conflicting / missing counts over aligned class
    pairs (reference prints; we return the dict)."""
    same = contain = conflict = unsure = 0
    for a, b in type_pairs:
        flag = check_type_v2(onto, a, b)
        if a == b and a != THING:
            same += 1
        elif flag == 1:
            contain += 1
        elif flag == -1:
            conflict += 1
        elif a == THING or b == THING:
            unsure += 1
    return {"total": len(type_pairs), "same": same, "contained": contain,
            "conflict": conflict, "missing": unsure}


def class_preprocess(
    cv1: dict,
    cv2: dict,
    links: list[tuple[str, str]],
    onto: Ontology,
    adj1: dict,
    adj2: dict,
    *,
    entropy_threshold: float = 0.4,
    epochs: int = 5,
    truncation: int = 0,
    seed_ratio: float = 0.3,
    supervised_filter: bool = False,
) -> tuple[dict, dict, dict]:
    """Full preprocessing driver (reference class_preprocess,
    inference.py:523-574): seed calibration + iterated two-sided complement
    + optional path truncation.  Returns (cv1, cv2, final stats)."""
    sup = links[: int(len(links) * seed_ratio)] if seed_ratio < 1.0 else links
    l1to2 = dict(sup)
    l2to1 = {b: a for a, b in sup}
    for _ in range(epochs):
        calibrate_cv_links(cv1, cv2, sup)
        class_complement(cv1, cv2, l1to2, onto, adj1,
                         entropy_threshold=entropy_threshold, supervised=supervised_filter)
        class_complement(cv2, cv1, l2to1, onto, adj2,
                         entropy_threshold=entropy_threshold, supervised=supervised_filter)
    if truncation > 0:
        class_path_truncation(cv1, onto, truncation)
        class_path_truncation(cv2, onto, truncation)
    stats = check_ills_consistent(onto, [(cv1.get(a, THING), cv2.get(b, THING)) for a, b in links])
    return cv1, cv2, stats
