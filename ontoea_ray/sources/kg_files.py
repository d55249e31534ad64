"""Ray Data readers for the reference's on-disk KG text formats.

Parse semantics reproduced (cited, not copied) from
/root/reference/code/src/openea/modules/load/read.py:

- relation triples (:219-236): split on ``sep`` (default space; the OpenEA
  layout uses tab), 3 or 4 tokens per line, per-token strip, optional
  unconditional ``<...>`` bracket strip of the first/last char.
- attribute triples (:393-424): whitespace split, >=3 tokens, conditional
  bracket strip per token (only if wrapped), multi-token literal re-join,
  ``.``-suffix strip of the value.
- 2-column links / entity-type / dict files (:239-283, :427-439).
- functional ontology files child->parent (:442-452).
- class-path JSON (:470-473).
- wikidata alternative-label name dicts (:476-490) as a vectorized
  predicate filter.

Each reader returns a ``ray.data.Dataset`` built from ``read_text`` +
vectorized per-batch parsing (no Python loop over lines on the hot path);
the tiny driver-side variants (`*_dict`) collect to Python for broadcast.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray.data


def _lines(path: str) -> ray.data.Dataset:
    return ray.data.read_text(path)


def _strip_bracket_unconditional(s: pd.Series) -> pd.Series:
    return s.str.slice(1, -1)


def _strip_bracket_conditional(s: pd.Series) -> pd.Series:
    stripped = s.str.strip()
    wrapped = stripped.str.startswith("<") & stripped.str.endswith(">")
    return stripped.where(~wrapped, stripped.str.slice(1, -1))


def read_relation_triples(path: str, *, bracket: bool = False, sep: str = "\t") -> ray.data.Dataset:
    """-> Dataset(subj, pred, obj).  3-or-4-token lines; extra tokens beyond
    the third are ignored (the reference asserts then uses params[0:3])."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pandas().str.rstrip("\n")
        parts = lines.str.split(sep, expand=True)
        n = parts.notna().sum(axis=1)
        if not ((n == 3) | (n == 4)).all():
            raise ValueError("relation triple line must have 3 or 4 tokens")
        cols = []
        for i in range(3):
            c = parts[i].str.strip()
            if bracket:
                c = _strip_bracket_unconditional(c)
            cols.append(c)
        return pa.table({"subj": cols[0], "pred": cols[1], "obj": cols[2]})

    return _lines(path).map_batches(parse, batch_format="pyarrow")


def read_attribute_triples(path: str, *, bracket: bool = True) -> ray.data.Dataset:
    """-> Dataset(subj, attr, value) with the reference's literal re-join
    and trailing-dot strip.  Lines with <3 tokens are skipped."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pandas().str.strip()
        toks = lines.str.split()
        keep = toks.map(len) >= 3
        toks = toks[keep]
        head = _strip_bracket_conditional(toks.map(lambda t: t[0]))
        attr = _strip_bracket_conditional(toks.map(lambda t: t[1]))

        def join_value(t):
            v = t[2].strip()
            if v.startswith("<") and v.endswith(">"):
                v = v[1:-1]
            for p in t[3:]:
                if p.strip() != ".":
                    v = v + " " + p.strip()
            return v.strip().rstrip(".").strip()

        value = toks.map(join_value)
        return pa.table(
            {
                "subj": pa.array(head.tolist(), pa.string()),
                "attr": pa.array(attr.tolist(), pa.string()),
                "value": pa.array(value.tolist(), pa.string()),
            }
        )

    return _lines(path).map_batches(parse, batch_format="pyarrow")


def read_links(path: str) -> ray.data.Dataset:
    """-> Dataset(e1, e2) from a 2-column tab file."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pandas().str.rstrip("\n")
        parts = lines.str.split("\t", expand=True)
        if parts.shape[1] != 2 or parts.isna().any().any():
            raise ValueError("link line must have exactly 2 tab-separated fields")
        return pa.table({"e1": parts[0].str.strip(), "e2": parts[1].str.strip()})

    return _lines(path).map_batches(parse, batch_format="pyarrow")


def read_cv_links(path: str, *, sep: str = "\t") -> ray.data.Dataset:
    """Cross-view (entity -> class) membership links -> Dataset(entity, cls)."""

    def parse(batch: pa.Table) -> pa.Table:
        lines = batch["text"].to_pandas().str.strip()
        parts = lines.str.split(sep, expand=True)
        if parts.shape[1] != 2 or parts.isna().any().any():
            raise ValueError("cv link line must have exactly 2 fields")
        return pa.table({"entity": parts[0], "cls": parts[1]})

    return _lines(path).map_batches(parse, batch_format="pyarrow")


# ---- tiny driver-side loaders (broadcast side) ----------------------------

def read_dict(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            k, v = line.rstrip("\n").split("\t")
            out[k] = int(v)
    return out


def read_pair_ids(path: str) -> list[tuple[int, int]] | None:
    """2-column tab file of int id pairs -> list[(int, int)]; None when the
    file does not exist (reference read.py:286-296 semantics: strict 2
    fields per line, driver-side — these files are alignment-result sized)."""
    if not os.path.exists(path):
        return None
    pairs: list[tuple[int, int]] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            params = line.rstrip("\n").split("\t")
            if len(params) != 2:
                raise ValueError("pair-id line must have exactly 2 tab-separated fields")
            pairs.append((int(params[0]), int(params[1])))
    return pairs


def load_crossview_link(path: str) -> dict:
    """entity -> class dict with the reference's one-to-many error
    (inference.py:26-36): a duplicate entity raises, it is not silently
    overwritten.  Driver-side — cv-link files are broadcast-sized; use
    :func:`read_cv_links` for the Dataset variant."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            ent, onto = line.split()
            if ent in out:
                raise ValueError(f"one to many ontologies : {ent}")
            out[ent] = onto
    return out


def read_onto_functional(path: str, *, bracket: bool = True) -> dict:
    """Functional child->parent (or a->disjoint-b) dict from a triple file."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = line.strip().split()
            if len(items) < 3:
                raise ValueError("ontology triple line must have >=3 tokens")
            if bracket:
                items = [i[1:-1] for i in items]
            out[items[0]] = items[2]
    return out


def load_class_path(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def read_ent_ills(path: str) -> tuple[list[str], list[str]]:
    """Aligned-entity ILL file -> (source list, target list): the reference's
    paired-list shape (read.py:261-270; whitespace split, strict 2 fields,
    both lists kept in file order)."""
    s_list: list[str] = []
    t_list: list[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            s, t = line.strip().split()
            s_list.append(s)
            t_list.append(t)
    return s_list, t_list


def load_type_relation(dataset_division: str, *, bracket: bool = True) -> dict:
    """``{'subclassof': child->parent, 'disjointwith': a->b}`` read from the
    division's ``onto_subClassOf_triples`` / ``onto_disjointWith_triples``
    (check.py:25-53; both files are required)."""
    sub_path = os.path.join(dataset_division, "onto_subClassOf_triples")
    dis_path = os.path.join(dataset_division, "onto_disjointWith_triples")
    for p in (sub_path, dis_path):
        if not os.path.isfile(p):
            raise FileNotFoundError(p)
    return {
        "subclassof": read_onto_functional(sub_path, bracket=bracket),
        "disjointwith": read_onto_functional(dis_path, bracket=bracket),
    }


_UNIFY_SUFFIX = {0: "_unify_align_types", 1: "_types", 2: "_align_types"}


def load_datasets_info(folder: str, lang: str, unify: int = 0) -> dict:
    """Composed dataset-info loader (inference.py:69-96): entity ILLs +
    per-language cv links (file suffix selected by ``unify`` exactly as the
    reference switches) + per-language triple adjacency dicts + the ontology
    dicts, returned under the reference's keys.  Driver-side by design:
    every piece is broadcast-sized (the big triple sets flow through the
    Dataset readers instead)."""
    lang1, lang2 = lang.split("_")
    base = os.path.join(folder, lang)
    suffix = _UNIFY_SUFFIX[unify]
    lang1_triples = read_relation_triples(os.path.join(base, lang1 + "_popular_rel_triples"), sep="\t")
    lang2_triples = read_relation_triples(os.path.join(base, lang2 + "_popular_rel_triples"), sep="\t")
    from ontoea_ray.state.inference import build_adjacency

    return {
        "ent_ills": read_ent_ills(os.path.join(base, "ent_ILLs")),
        "lang1_cv_link": load_crossview_link(os.path.join(base, lang1 + suffix)),
        "lang2_cv_link": load_crossview_link(os.path.join(base, lang2 + suffix)),
        "lang1_kg": build_adjacency(lang1_triples),
        "lang2_kg": build_adjacency(lang2_triples),
        "onto_dict": load_type_relation(folder),
    }


ALTER_LABEL_PREDICATES = (
    "http://www.wikidata.org/entity/P1476",
    "http://www.wikidata.org/entity/P373",
)


def load_name_dict(attr_triples: ray.data.Dataset) -> dict:
    """entity -> alternative-label name, filtered on the two wikidata
    label predicates (vectorized semi-join filter, then driver collect —
    the result is a broadcast-sized dict)."""
    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["attr"].combine_chunks(), value_set=pa.array(list(ALTER_LABEL_PREDICATES)))
        return batch.filter(keep)

    rows = attr_triples.map_batches(filt, batch_format="pyarrow").take_all()
    return {r["subj"]: r["value"] for r in rows}
