"""Flagship pipeline: Parquet web pages -> partitioned (subj, pred, obj)
edge table (SURVEY.md §7.0).

Stages (all streaming, single pass over the corpus after a vocabulary
prepass):

  S1 extract       map_batches(extract_text)        stateless, zero-copy Arrow
  S2+S4+S5 link    map_batches(ScanAndLink, actors) broadcast gazetteer+CCM
  S6 canonicalize  combiner groupby + broadcast map  skew-safe (no raw-row
                                                     groupby on hub keys)
  S7 dedup         combiner + groupby(triple key)    one shuffle
  sink             write_parquet(partitioned by hash bucket) + manifest

The vocabulary prepass (token frequencies -> gazetteer/ontology/linker
state) is itself a Ray pipeline; its result is vocabulary-sized, broadcast
once via ``ray.put``.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ontoea_ray.stages.canonicalize import (
    build_canonical_map,
    dedup_merge,
    make_canonicalizer,
)
from ontoea_ray.stages.extract import extract_text_stage
from ontoea_ray.stages.scan_link import scan_and_link_stage
from ontoea_ray.state.linker import LinkerState, build_linker_state, stable_hash64
from ontoea_ray.state.ontology import THING, Ontology, build_ccm


def bootstrap_ontology(n_classes: int = 6) -> Ontology:
    """Small deterministic ontology for corpus-bootstrapped linking:
    Thing -> topic_{0,1}; topic_i -> subtopic_{i}_{j}; one disjoint pair."""
    sub: dict[str, str] = {}
    tops = [f"kg://class/topic_{i}" for i in range(2)]
    for t in tops:
        sub[t] = THING
    leaves = []
    i = 0
    while len(leaves) + len(tops) + 1 < n_classes:
        leaf = f"kg://class/subtopic_{i % 2}_{i // 2}"
        sub[leaf] = tops[i % 2]
        leaves.append(leaf)
        i += 1
    disjoint = {tops[0]: tops[1]}
    return Ontology(subclass=sub, disjoint=disjoint)


def bootstrap_linker_from_corpus(
    texts: ray.data.Dataset,
    *,
    n_entities: int = 48,
    n_predicates: int = 12,
    seed: int = 42,
    type_weight: float = 0.2,
    fuzzy_blocking: bool = False,
    fuzzy_jaccard_pct: int = 50,
    fuzzy_max_cands: int = 3,
    mention_texts: ray.data.Dataset | None = None,
    alias_fn=None,
) -> LinkerState:
    """Derive a gazetteer from corpus token frequencies (distributed
    prepass), assign classes from the bootstrap ontology deterministically,
    and build the broadcastable linker state.

    Tokens ranked [0, n_entities) by (freq desc, token desc) become entity
    surfaces; the next n_predicates become predicates.

    ``fuzzy_blocking=True`` adds the north-star candidate-blocking stage:
    MinHash-LSH over CHAR shingles of surface forms
    (`stages/blocking.lsh_link_candidates`) pairs every vocabulary token
    with near-miss gazetteer surfaces (char-shingle Jaccard >=
    ``fuzzy_jaccard_pct``/100), so typo'd mentions ("tble") still reach the
    embedding+CCM disambiguation inner loop with the right candidate set.
    The verified pair table is GAZETTEER-proportional (each entity surface
    attracts only its Jaccard ball), so folding it into the broadcast
    linker dict is dimension-sized driver state — same class as the
    gazetteer head itself, not a corpus pull.
    """
    from ontoea_ray.state.ids import token_frequencies, top_k_by_frequency

    freq = token_frequencies(texts)
    if fuzzy_blocking and mention_texts is None:
        freq = freq.materialize()  # consumed twice: head + mention side
    top = top_k_by_frequency(freq, n_entities + n_predicates, key="token")
    toks = [t for t, _ in top]
    # Small corpora can have fewer distinct tokens than requested: keep the
    # entity/predicate split proportional so both gazetteers are non-empty.
    n_ent = min(n_entities, max(1, (2 * len(toks)) // 3))
    n_pred = min(n_predicates, len(toks) - n_ent)
    ent_surfaces = toks[:n_ent]
    predicates = toks[n_ent : n_ent + n_pred]

    onto = bootstrap_ontology()
    classes = onto.classes()
    class_ids, ccm = build_ccm(onto, version=4)
    non_root = [c for c in classes if c != THING]
    surface_to_cands = {s: [f"kg://ent/{s}"] for s in ent_surfaces}
    if fuzzy_blocking and ent_surfaces:
        from ontoea_ray.stages.blocking import lsh_link_candidates

        # mention vocabulary: by default the gazetteer corpus's own tokens;
        # pass ``mention_texts`` to block against a DIFFERENT corpus's
        # vocabulary (production shape: gazetteer from a curated corpus,
        # mentions from the crawl being scanned)
        mfreq = token_frequencies(mention_texts) if mention_texts is not None else freq
        mentions = mfreq.map_batches(
            lambda b: pa.table({"mention": b["token"]}), batch_format="pyarrow"
        )
        gaz = ray.data.from_arrow(
            pa.table({"entity": pa.array(list(ent_surfaces), pa.string())})
        )
        verified = lsh_link_candidates(
            mentions, gaz, jaccard_pct=fuzzy_jaccard_pct,
            num_perm=16, bands=8, shingle_n=3, seed=seed, max_group=4000,
        )
        # Deterministic candidate order: jaccard desc (integer cross-
        # multiplied), then surface asc.  Only NON-gazetteer mentions gain
        # fuzzy candidates — exact surfaces keep their exact entity.
        rows = sorted(
            verified.take_all(),  # gazetteer-proportional (see docstring)
            key=lambda r: (r["mention"], -r["inter_sz"] * 10**6 // r["union_sz"], r["entity"]),
        )
        for r in rows:
            m = r["mention"]
            if m in surface_to_cands and m in ent_surfaces:
                continue
            cands = surface_to_cands.setdefault(m, [])
            uri = f"kg://ent/{r['entity']}"
            if uri not in cands and len(cands) < fuzzy_max_cands:
                cands.append(uri)
    uri_class = {
        f"kg://ent/{s}": class_ids[non_root[stable_hash64(s) % len(non_root)]]
        for s in ent_surfaces
    }
    if alias_fn is not None:
        # alias registration: each alias surface gets its OWN URI carrying
        # the aliased entity's class — distinct URIs naming the same
        # canonical entity, which is exactly the input shape the
        # canonicalization stage (cluster by lowercased local name, argmax
        # by evidence) exists to merge
        for s in list(ent_surfaces):
            for a in alias_fn(s) or ():
                if a in surface_to_cands:
                    continue
                surface_to_cands[a] = [f"kg://ent/{a}"]
                uri_class[f"kg://ent/{a}"] = uri_class[f"kg://ent/{s}"]
    root = class_ids[THING]
    return build_linker_state(
        surface_to_cands,
        uri_class,
        ccm,
        predicates,
        root_class=root,
        type_weight=type_weight,
        seed=seed,
    )


def construct_kg(
    pages: ray.data.Dataset,
    linker_state: LinkerState,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
    checkpoint_dir: str | None = None,
) -> ray.data.Dataset:
    """pages -> deduplicated canonical triple Dataset
    (subj, pred, obj, first_url, n_mentions).

    ``checkpoint_dir`` persists the scan-stage combiner output (distinct
    triples per block — combiner-sized, NOT corpus-sized) as Parquet with a
    completion marker: a restarted run whose checkpoint is complete skips
    the corpus scan entirely and resumes at canonicalization/merge.  This
    is the mid-pipeline complement to write_edge_table's per-partition
    sink manifest."""
    from ontoea_ray.functions.shuffle import sized_width
    from ontoea_ray.stages.canonicalize import _merge_dedup_partials

    marker = os.path.join(checkpoint_dir, "_SCAN_COMPLETE") if checkpoint_dir else None
    if marker and os.path.exists(marker):
        partials = ray.data.read_parquet(checkpoint_dir).materialize()
    else:
        state_ref = ray.put(linker_state)
        texts = extract_text_stage(pages)
        # The dedup combiner runs INSIDE the scan actors (combine_dedup=True):
        # the corpus is read and scanned exactly once, raw triples never
        # enter the object store, and everything materialized/consumed below
        # is combiner-sized.  The block-level _merge_dedup_partials pass then
        # shrinks the per-batch partials to per-block partials.
        raw = scan_and_link_stage(
            texts, state_ref, concurrency=concurrency, batch_size=batch_size, combine_dedup=True
        )
        partials = raw.map_batches(
            _merge_dedup_partials, batch_format="pyarrow", batch_size=None
        ).materialize()
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            partials.write_parquet(checkpoint_dir)
            with open(marker, "w") as f:
                f.write("complete\n")
    # The three passes below (canonical-map counts, canonical substitution,
    # keyed merge) each pay per-block task overhead; compact the (tiny)
    # combiner output to a data-proportional block count first so the tail
    # is a handful of tasks, not 3 × #scan-blocks.
    w = sized_width(partials.size_bytes())
    if partials.num_blocks() > 4 * w:
        partials = partials.repartition(w).materialize()
    # Canonical-map counts over partials are n_mentions-weighted, which
    # equals counting over the raw stream exactly.
    canon_map = build_canonical_map(partials, weight_col="n_mentions")
    map_ref = ray.put(canon_map)
    canon = partials.map_batches(make_canonicalizer(map_ref, partial=True), batch_format="pyarrow")
    # Size the merge exchange to the measured combiner output: a few MB of
    # partials need 1-2 partitions, a 100 TB run gets the full cluster
    # width — either way the shuffle is proportional to the data, not a
    # fixed fraction of the CPUs.
    return dedup_merge(canon, width=sized_width(partials.size_bytes()))


def write_edge_table(
    triples: ray.data.Dataset,
    out_dir: str,
    *,
    num_buckets: int = 16,
    lineage: dict | None = None,
) -> dict:
    """Resumable partitioned sink: hash-bucketed Parquet directories plus a
    manifest with per-partition lineage + row-count metrics (north_rule).

    Each bucket directory is written atomically by Ray's write_parquet; the
    manifest marks completion so a restarted run can skip finished buckets.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["subj"].combine_chunks(), batch["pred"].combine_chunks(),
            batch["obj"].combine_chunks(), "\x1f",
        )
        try:
            # vectorized row hash (the edge table is corpus-scale; a
            # per-row Python hash in the sink would be the pipeline's only
            # row loop).  Bucket assignment is pinned to the engine
            # install: resume only against manifests this install wrote.
            import polars as pl

            h = pl.DataFrame({"k": pl.from_arrow(key)}).hash_rows(seed=0).to_numpy()
            part = (h % np.uint64(num_buckets)).astype(np.int32)
        except ImportError:  # pragma: no cover - polars is in the base env
            part = np.array(
                [stable_hash64(k) % num_buckets for k in key.to_pylist()], np.int32
            )
        return batch.append_column("part", pa.array(part, pa.int32()))

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_manifest.json")
    done: dict = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            done = {k: v for k, v in json.load(f).get("partitions", {}).items() if v.get("complete")}

    bucketed = triples.map_batches(add_bucket, batch_format="pyarrow")
    skipped = sorted(int(k) for k in done)
    if skipped:
        # resume: completed buckets are skipped entirely — their rows are
        # filtered out before the write, the existing files stay untouched
        skip_ref = ray.put(pa.array(skipped, pa.int32()))

        def drop_done(batch: pa.Table) -> pa.Table:
            s = ray.get(skip_ref)
            return batch.filter(pc.invert(pc.is_in(batch["part"].combine_chunks(), value_set=s)))

        bucketed = bucketed.map_batches(drop_done, batch_format="pyarrow")
    bucketed.write_parquet(out_dir, partition_cols=["part"])

    import pyarrow.parquet as pq

    parts = {}
    for p in range(num_buckets):
        pdir = os.path.join(out_dir, f"part={p}")
        if os.path.isdir(pdir):
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            n = sum(pq.read_metadata(os.path.join(pdir, f)).num_rows for f in files)
            nbytes = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
            parts[str(p)] = {
                "rows": n,
                "bytes": nbytes,
                "files": len(files),
                "complete": True,
                "resumed": str(p) in done,
            }
    import time as _time

    from ontoea_ray import __version__

    manifest = {
        "partitions": parts,
        "num_buckets": num_buckets,
        "lineage": {
            "engine": f"ontoea_ray {__version__}",
            "written_at": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
            "total_rows": sum(v["rows"] for v in parts.values()),
            **(lineage or {}),
        },
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def bootstrap_linker_cached(sf_dir: str) -> LinkerState:
    """Corpus-derived gazetteer/linker state with an on-disk artifact cache
    (keyed by corpus path+mtime).  The gazetteer is built ONCE per corpus
    and reused across runs — the standard shape for broadcast state at
    100 TB, where the vocabulary prepass is its own checkpointed job."""
    import hashlib
    import pickle

    src = f"{sf_dir}/documents.parquet"
    tag = hashlib.blake2b(
        f"{os.path.abspath(src)}:{os.path.getmtime(src)}:v1".encode(), digest_size=8
    ).hexdigest()
    cache = f"/tmp/ontoea_gazetteer/{tag}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            return pickle.load(f)
    from ontoea_ray.sources.pages import pages_from_documents

    state = bootstrap_linker_from_corpus(extract_text_stage(pages_from_documents(sf_dir)))
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    tmp = f"{cache}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, cache)
    return state


def kg_construct_pipeline(sf_dir: str, *, replicate: int = 1, **kwargs) -> ray.data.Dataset:
    """End-to-end flagship over the deterministic pages derived from
    ``{sf_dir}/documents.parquet`` (``replicate`` amplifies the corpus for
    compute-bound benchmarking; the vocabulary prepass always runs on the
    unreplicated corpus — same gazetteer either way, cached as an on-disk
    artifact)."""
    from ontoea_ray.sources.pages import pages_from_documents

    pages = pages_from_documents(sf_dir, replicate=replicate)
    state = bootstrap_linker_cached(sf_dir)
    return construct_kg(pages, state, **kwargs)


def construct_kg_lifespan(
    pages: ray.data.Dataset,
    linker_state,
) -> ray.data.Dataset:
    """pages -> canonical edge table WITH per-edge observation window:
    (subj, pred, obj, first_url, n_mentions, first_seen, last_seen,
    span_s).  The flagship chain with a lifespan-aware combiner inside the
    scan actors (`scan_and_link_stage(combine_fn=...)`): the combiner
    carries (min url, count, min/max seen-second) per distinct triple so
    raw mention rows never enter the object store; canonical substitution
    passes the extra columns through; ONE triple-keyed exchange merges
    with associative min/max/sum.  The crawl second is the url-trailing
    doc id (warc_ts = epoch + doc_id seconds, sources/pages.py)."""
    from ontoea_ray.functions.shuffle import keyed_aggregate, sized_width
    from ontoea_ray.stages.canonicalize import _triple_key

    def lifespan_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "tkey": pa.array([], pa.string()),
                    "subj": pa.array([], pa.string()),
                    "pred": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "url": pa.array([], pa.string()),
                    "n_mentions": pa.array([], pa.int64()),
                    "first_seen": pa.array([], pa.int64()),
                    "last_seen": pa.array([], pa.int64()),
                }
            )
        key = _triple_key(
            batch["subj"].combine_chunks(),
            batch["pred"].combine_chunks(),
            batch["obj"].combine_chunks(),
        )
        enc = pc.dictionary_encode(key)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(codes)
        first = np.full(len(enc.dictionary), n, np.int64)
        np.minimum.at(first, codes, np.arange(n, dtype=np.int64))
        url = batch["url"].combine_chunks()
        doc = pc.cast(
            pc.extract_regex(url, r"(?P<d>[0-9]+)$").field("d"), pa.int64()
        )
        gb = (
            pa.table({"c": pa.array(codes), "u": url, "d": doc})
            .group_by("c")
            .aggregate([("u", "min"), ("d", "min"), ("d", "max"), ("c", "count")])
        )
        order = pc.sort_indices(gb["c"])
        take = pa.array(first)
        return pa.table(
            {
                "tkey": enc.dictionary,
                "subj": batch["subj"].combine_chunks().take(take),
                "pred": batch["pred"].combine_chunks().take(take),
                "obj": batch["obj"].combine_chunks().take(take),
                "url": gb["u_min"].combine_chunks().take(order),
                "n_mentions": gb["c_count"].combine_chunks().take(order).cast(pa.int64()),
                "first_seen": gb["d_min"].combine_chunks().take(order),
                "last_seen": gb["d_max"].combine_chunks().take(order),
            }
        )

    state_ref = (
        linker_state
        if isinstance(linker_state, ray.ObjectRef)
        else ray.put(linker_state)
    )
    partials = scan_and_link_stage(
        extract_text_stage(pages), state_ref, combine_fn=lifespan_partial
    ).materialize()
    canon_map = build_canonical_map(partials, weight_col="n_mentions")
    canon = partials.map_batches(
        make_canonicalizer(ray.put(canon_map), partial=True), batch_format="pyarrow"
    )
    merged = keyed_aggregate(
        canon.drop_columns(["tkey"]),
        ["subj", "pred", "obj"],
        sums=["n_mentions"],
        mins=["url", "first_seen"],
        maxs=["last_seen"],
        width=sized_width(partials.size_bytes()),
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": b["subj"],
                "pred": b["pred"],
                "obj": b["obj"],
                "first_url": b["url"],
                "n_mentions": b["n_mentions"],
                "first_seen": b["first_seen"],
                "last_seen": b["last_seen"],
                "span_s": pc.subtract(b["last_seen"], b["first_seen"]),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def kg_upsert(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    *,
    group_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    sum_cols: tuple[str, ...] = ("n_mentions",),
    min_cols: tuple[str, ...] = ("first_url",),
    max_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Incremental KG update: merge a new crawl increment's edge table into
    an existing one.

    Because every edge attribute is an associative/commutative aggregate
    (evidence counts SUM, provenance url MIN), merging increment edge
    tables is exact — a resumed or incremental ingest equals re-running the
    merge over the union (pytest pins associativity+commutativity;
    q_kg_upsert value-checks against the SQL replay).  One keyed exchange
    over the combined (already combiner-sized) edge tables; no driver
    state.
    """
    from ontoea_ray.functions.shuffle import keyed_aggregate

    return keyed_aggregate(
        base.union(delta),
        list(group_cols),
        sums=list(sum_cols),
        mins=list(min_cols),
        maxs=list(max_cols),
    )


def kg_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    *,
    group_cols: tuple[str, ...] = ("subj", "pred", "obj"),
    cmp_col: str = "n_mentions",
) -> ray.data.Dataset:
    """Edge-table diff between two KG snapshots: rows ``added`` (new only),
    ``removed`` (old only) or ``changed`` (present in both with different
    ``cmp_col``); unchanged edges are dropped.  The audit/monitoring
    complement of :func:`kg_upsert` — one full-outer hash join on the edge
    key, everything else per-batch vectorized.  Null evidence counts are
    surfaced as -1 so the output stays a stable int64 schema."""
    import numpy as np
    import pyarrow.compute as pc

    from ontoea_ray.functions.join import hash_join

    keep = list(group_cols) + [cmp_col]
    o = old.select_columns(keep)
    n = new.select_columns(keep)
    j = hash_join(o, n, on=list(group_cols), how="outer")
    new_col = cmp_col + "_r"

    def classify(b: pa.Table) -> pa.Table:
        ov = np.asarray(
            pc.coalesce(b[cmp_col], pa.scalar(-1, pa.int64())), np.int64
        )
        nv = np.asarray(
            pc.coalesce(b[new_col], pa.scalar(-1, pa.int64())), np.int64
        )
        status = np.where(
            ov < 0, "added", np.where(nv < 0, "removed", np.where(ov != nv, "changed", "same"))
        )
        mask = status != "same"
        out = {c: b[c].combine_chunks().filter(pa.array(mask)) for c in group_cols}
        out["status"] = pa.array(status[mask], pa.string())
        out["old_mentions"] = pa.array(ov[mask])
        out["new_mentions"] = pa.array(nv[mask])
        return pa.table(out)

    return j.map_batches(classify, batch_format="pyarrow")
