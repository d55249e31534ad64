"""Deterministic synthetic fixtures (FIXTURES.md): an OntoEA-style two-KG
benchmark in the reference's on-disk layout, and a pages corpus whose oracle
triple set is exactly computable.

Everything is a pure function of (seed, sizes) — tests and benches see
bit-identical inputs on every run.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

from ontoea_ray.state.ontology import THING, Ontology

PREDICATES = ["works_at", "born_in", "located_in", "founded", "knows", "leads"]


def fixture_ontology() -> Ontology:
    """~12 classes, depth up to 4, one disjoint pair (Person vs Place)."""
    O = "http://fixture.org/onto/"
    sub = {
        O + "Agent": THING,
        O + "Person": O + "Agent",
        O + "Artist": O + "Person",
        O + "Musician": O + "Artist",
        O + "Scientist": O + "Person",
        O + "Organisation": O + "Agent",
        O + "Company": O + "Organisation",
        O + "Place": THING,
        O + "City": O + "Place",
        O + "Country": O + "Place",
        O + "Work": THING,
    }
    disjoint = {O + "Person": O + "Place"}
    return Ontology(subclass=sub, disjoint=disjoint)


@dataclass
class FixtureKG:
    onto: Ontology
    ent1: list[str]
    ent2: list[str]
    cls1: dict[str, str]            # entity -> class URI (may be THING = missing)
    cls2: dict[str, str]
    rel1: list[tuple[str, str, str]]
    rel2: list[tuple[str, str, str]]
    attr1: list[tuple[str, str, str]]
    attr2: list[tuple[str, str, str]]
    links: list[tuple[str, str]]    # gold alignment (includes some orphan pairs)
    orphan_links: list[tuple[str, str]] = field(default_factory=list)

    def splits(self) -> tuple[list, list, list]:
        """7:2:1 deterministic split of the gold links."""
        n = len(self.links)
        n_train = int(n * 0.7)
        n_valid = int(n * 0.2)
        return (
            self.links[:n_train],
            self.links[n_train : n_train + n_valid],
            self.links[n_train + n_valid :],
        )


def generate_fixture_kg(n_entities: int = 200, seed: int = 42) -> FixtureKG:
    rng = np.random.default_rng(seed)
    onto = fixture_ontology()
    classes = [c for c in onto.classes() if c != THING]
    E1 = "http://kg1.fixture.org/resource/"
    E2 = "http://kg2.fixture.org/resource/"
    ent1 = [f"{E1}Ent_{i:04d}" for i in range(n_entities)]
    ent2 = [f"{E2}Ding_{i:04d}" for i in range(n_entities)]
    links = list(zip(ent1, ent2))

    cls_pick = [classes[int(rng.integers(0, len(classes)))] for _ in range(n_entities)]
    # ~8% of entities untyped (owl:Thing) on one side to exercise
    # miss-completion / class-complement paths
    cls1, cls2 = {}, {}
    for i, (a, b) in enumerate(links):
        c = cls_pick[i]
        cls1[a] = THING if rng.random() < 0.08 else c
        cls2[b] = THING if rng.random() < 0.08 else c

    def gen_triples(ents, rng, n_rel, ns):
        # skewed head frequency so frequency-rank ids have non-trivial
        # order; relation URIs are namespaced per KG (as in the OpenEA
        # benchmarks, where the two KGs share no URI space)
        w = 1.0 / (np.arange(len(ents)) + 1.0)
        w /= w.sum()
        triples = set()
        while len(triples) < n_rel:
            h = ents[int(rng.choice(len(ents), p=w))]
            t = ents[int(rng.integers(0, len(ents)))]
            r = PREDICATES[int(rng.integers(0, len(PREDICATES)))]
            if h != t:
                triples.add((h, f"{ns}rel/{r}", t))
        return sorted(triples)

    rel1 = gen_triples(ent1, rng, n_entities * 4, "http://kg1.fixture.org/")
    # KG2 mirrors KG1's structure through the gold alignment (the OpenEA
    # benchmarks describe the same underlying entities), with ~15% of edges
    # dropped and ~15% random edges added so the KGs are not isomorphic.
    e1_to_e2 = dict(zip(ent1, ent2))
    rel2_set = set()
    for h, r, t in rel1:
        if rng.random() < 0.85:
            local = r.rsplit("/", 1)[1]
            rel2_set.add((e1_to_e2[h], f"http://kg2.fixture.org/rel/{local}", e1_to_e2[t]))
    rel2_set.update(gen_triples(ent2, rng, int(n_entities * 0.6), "http://kg2.fixture.org/"))
    rel2 = sorted(rel2_set)

    def gen_attrs(ents, rng):
        out = []
        for e in ents:
            if rng.random() < 0.7:
                out.append((e, "http://fixture.org/attr/name", e.rsplit("/", 1)[1].replace("_", " ")))
            if rng.random() < 0.3:
                out.append((e, "http://fixture.org/attr/note", "a multi token value ."))
        return out

    attr1 = gen_attrs(ent1, rng)
    attr2 = gen_attrs(ent2, rng)

    # orphan alignment pairs referencing URIs absent from the triples — pins
    # the silent-drop semantics of uris_pair_2ids (read.py:135-136)
    orphans = [(f"{E1}Ghost_{i}", f"{E2}Geist_{i}") for i in range(3)]
    all_links = links + orphans
    perm = rng.permutation(len(all_links))
    all_links = [all_links[i] for i in perm]
    return FixtureKG(
        onto=onto, ent1=ent1, ent2=ent2, cls1=cls1, cls2=cls2,
        rel1=rel1, rel2=rel2, attr1=attr1, attr2=attr2,
        links=all_links, orphan_links=orphans,
    )


def write_reference_layout(kg: FixtureKG, root: str) -> str:
    """Write the fixture in the reference's file layout (FIXTURES.md §2) so
    the loader layer is tested against the real formats."""
    os.makedirs(root, exist_ok=True)

    def wlines(name, lines):
        with open(os.path.join(root, name), "w", encoding="utf-8") as f:
            for ln in lines:
                f.write(ln + "\n")

    wlines("rel_triples_1", [f"{h}\t{r}\t{t}" for h, r, t in kg.rel1])
    wlines("rel_triples_2", [f"{h}\t{r}\t{t}" for h, r, t in kg.rel2])
    wlines("attr_triples_1", [f"<{e}> <{a}> {v} ." for e, a, v in kg.attr1])
    wlines("attr_triples_2", [f"<{e}> <{a}> {v} ." for e, a, v in kg.attr2])
    wlines("ent_links", [f"{a}\t{b}" for a, b in kg.links])
    wlines("crossview_link_1", [f"{e}\t{c}" for e, c in sorted(kg.cls1.items())])
    wlines("crossview_link_2", [f"{e}\t{c}" for e, c in sorted(kg.cls2.items())])
    wlines(
        "onto_subClassOf_triples",
        [f"<{c}> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <{p}>" for c, p in sorted(kg.onto.subclass.items())],
    )
    wlines(
        "onto_disjointWith_triples",
        [f"<{a}> <http://www.w3.org/2002/07/owl#disjointWith> <{b}>" for a, b in sorted(kg.onto.disjoint.items())],
    )
    wlines(
        "onto_attr_triples",
        [f"<{c}> <http://fixture.org/attr/label> {c.rsplit('/', 1)[1]}" for c in kg.onto.classes() if c != THING],
    )
    with open(os.path.join(root, "class_path.json"), "w", encoding="utf-8") as f:
        json.dump(kg.onto.paths(), f)

    split_dir = os.path.join(root, "721_5fold", "1")
    os.makedirs(split_dir, exist_ok=True)
    train, valid, test = kg.splits()
    for name, part in (("train_links", train), ("valid_links", valid), ("test_links", test)):
        with open(os.path.join(split_dir, name), "w", encoding="utf-8") as f:
            for a, b in part:
                f.write(f"{a}\t{b}\n")
    return root


def generate_fixture_pages(
    kg: FixtureKG, n_pages: int = 300, seed: int = 7, sentences_per_page: tuple[int, int] = (3, 8)
) -> tuple[list[dict], list[tuple[str, str, str, str]]]:
    """Pages whose text embeds 'surface predicate surface .' sentences drawn
    from the fixture KG — the oracle triple set is exactly computable.

    Hub skew: the 2% most frequent entities appear in >=20% of pages.
    Returns (page rows [url, warc_ts_us, text, lang], oracle mention triples
    [(subj_uri, pred_local, obj_uri, url)]).
    """
    rng = np.random.default_rng(seed)
    ents = kg.ent1
    n_hub = max(1, len(ents) // 50)
    hubs = ents[:n_hub]
    preds = [p for p in PREDICATES]

    def surface(uri: str) -> str:
        return uri.rsplit("/", 1)[1]

    pages, oracle = [], []
    langs = ["en", "de", "fr"]
    for i in range(n_pages):
        url = f"https://fixture.example.org/page/{i:05d}"
        n_sent = int(rng.integers(sentences_per_page[0], sentences_per_page[1]))
        sents = []
        for _ in range(n_sent):
            if rng.random() < 0.25:
                s = hubs[int(rng.integers(0, len(hubs)))]
            else:
                s = ents[int(rng.integers(0, len(ents)))]
            o = ents[int(rng.integers(0, len(ents)))]
            p = preds[int(rng.integers(0, len(preds)))]
            sents.append(f"{surface(s)} {p} {surface(o)} .")
            oracle.append((s, p, o, url))
        text = " ".join(sents)
        pages.append(
            {"url": url, "warc_ts_us": 1_700_000_000_000_000 + i * 1_000_000, "text": text, "lang": langs[i % 3]}
        )
    return pages, oracle


def fixture_pages_dataset(pages: list[dict]):
    """pages rows -> Ray Dataset in the input_hint schema (html built with
    the deterministic template so extraction has an exact oracle)."""
    import pyarrow as pa
    import ray.data

    from ontoea_ray.functions.text import wrap_html

    text = pa.array([p["text"] for p in pages], pa.string())
    tbl = pa.table(
        {
            "url": pa.array([p["url"] for p in pages], pa.string()),
            "warc_ts": pa.array([p["warc_ts_us"] for p in pages], pa.int64()).cast(pa.timestamp("us")),
            "html": wrap_html(text),
            "text": text,
            "lang": pa.array([p["lang"] for p in pages], pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


def fixture_linker_state(
    kg: FixtureKG, *, type_weight: float = 0.2, seed: int = 42, ent_vectors: dict | None = None
):
    """Linker state for fixture pages: surfaces are entity local names; KG1
    entities are the candidate space; classes/CCM from the fixture ontology.
    ``ent_vectors`` (uri -> trained embedding) switches the scorer from hash
    embeddings to the trained OntoEA space."""
    from ontoea_ray.state.linker import build_linker_state
    from ontoea_ray.state.ontology import build_ccm

    class_ids, ccm = build_ccm(kg.onto, version=4)
    surface_to_cands: dict[str, list[str]] = {}
    for e in kg.ent1:
        surface_to_cands.setdefault(e.rsplit("/", 1)[1], []).append(e)
    uri_class = {e: class_ids[kg.cls1[e]] for e in kg.ent1}
    return build_linker_state(
        surface_to_cands,
        uri_class,
        ccm,
        list(PREDICATES),
        root_class=class_ids[THING],
        type_weight=type_weight,
        seed=seed,
        ent_vectors=ent_vectors,
    )
