"""Name-based embedding initialisation (the reference's word2vec/SI init).

Reference semantics (/root/reference/code/src/openea/approaches/
ontoea.py:68-114): per URI, tokenize the local name (alternative-label dict
first when provided, reference :96-100), add the word vectors of the
(lowercased) tokens to the random unit init, then L2-normalize rows.

Ray-Data-first: the word-vector table is loaded ONCE per actor in
``__init__`` (the reference loads the 1M-row .vec file once per process,
:68-82) and the per-batch work is vectorized lookups — the canonical
stateful-init actor-pool pattern.  The sandbox ships no .vec file, so the
table is an injected dict (tests use a synthetic one); at real scale it
would be a broadcast parquet artifact.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ontoea_ray.state.linker import stable_hash64

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def local_name_tokens(uri: str, name_dict: dict | None = None) -> list[str]:
    """Lowercased alphanumeric tokens of the URI local name (or its
    alternative label when the name dict provides one).

    MED-BBK quirk reproduced (reference ontoea.py:101-105): a ``@@`` in the
    URI means "industry dataset" naming — the last ``@@`` segment is used
    CHARACTER-WISE (the reference iterates the un-listed string, yielding
    chars; intended for Chinese surface forms)."""
    if name_dict and uri in name_dict:
        base = name_dict[uri]
    elif "@@" in uri:
        return [ch.lower() for ch in uri.split("@@")[-1]]
    else:
        base = uri.rsplit("/", 1)[-1]
    return _TOKEN_RE.findall(base.lower().replace("_", " "))


def read_word2vec(path: str, dim: int) -> dict[str, np.ndarray]:
    """Parse a word2vec ``.vec`` text file -> {lowercased word: float64[dim]}.

    Reference semantics (ontoea.py:68-82): space-split lines; lines whose
    field count != dim+1 are skipped; unparsable floats are skipped; later
    duplicates of a word overwrite earlier ones (dict assignment order).
    Parsed distributed (read_text + vectorized float conversion per batch),
    merged into the broadcast-sized dict on the driver."""

    def parse(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lines = batch["text"].to_pandas().str.rstrip("\n")
        parts = lines.str.split(" ")
        keep = parts.map(len) == dim + 1
        parts = parts[keep]
        words, vecs = [], []
        for toks in parts:
            try:
                v = np.asarray([float(x) for x in toks[1:]], np.float64)
            except ValueError:
                continue
            words.append(toks[0].lower())
            vecs.append(v)
        if not words:
            return pa.table({"word": pa.array([], pa.string()),
                             "vec": pa.array([], pa.list_(pa.float64()))})
        return pa.table({"word": pa.array(words, pa.string()),
                         "vec": pa.array([list(v) for v in vecs], pa.list_(pa.float64()))})

    rows = ray.data.read_text(path).map_batches(parse, batch_format="pyarrow").take_all()
    return {r["word"]: np.asarray(r["vec"], np.float64) for r in rows}


class NameEmbedInit:
    """Actor-pool stage: (id, uri) -> (id, vec fixed_size_list<float32>)."""

    def __init__(self, word_vecs_ref, dim: int, *, seed: int = 42, name_dict_ref=None):
        self.word_vecs: dict[str, np.ndarray] = (
            ray.get(word_vecs_ref) if isinstance(word_vecs_ref, ray.ObjectRef) else word_vecs_ref
        )
        self.name_dict = (
            ray.get(name_dict_ref) if isinstance(name_dict_ref, ray.ObjectRef) else name_dict_ref
        ) or {}
        self.dim = dim
        self.seed = seed

    def _one(self, uri: str) -> np.ndarray:
        rng = np.random.default_rng((stable_hash64(uri) ^ self.seed) & 0xFFFFFFFFFFFFFFFF)
        vec = rng.standard_normal(self.dim)
        for tok in local_name_tokens(uri, self.name_dict):
            wv = self.word_vecs.get(tok)
            if wv is not None:
                vec = vec + wv
        n = np.linalg.norm(vec)
        return (vec / max(n, 1e-12)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack([self._one(u) for u in batch["uri"].to_pylist()])
        return pa.table(
            {
                "id": batch["id"],
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1), pa.float32()), self.dim
                ),
            }
        )


def name_based_embeddings(
    uris: ray.data.Dataset,
    word_vecs: dict[str, np.ndarray],
    dim: int,
    *,
    name_dict: dict | None = None,
    seed: int = 42,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 4096,
) -> ray.data.Dataset:
    """uris: Dataset(id, uri) -> Dataset(id, vec)."""
    wv_ref = ray.put(word_vecs)
    nd_ref = ray.put(name_dict) if name_dict else None
    return uris.map_batches(
        NameEmbedInit,
        fn_constructor_args=(wv_ref, dim),
        fn_constructor_kwargs={"seed": seed, "name_dict_ref": nd_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
