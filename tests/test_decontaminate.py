"""Benchmark n-gram decontamination: flag + drop semantics vs a hand oracle."""

import numpy as np
import pyarrow as pa
import ray.data

from ontoea_ray.stages.decontaminate import (
    benchmark_ngram_hashes,
    contamination_overlap,
    decontaminate,
)


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_overlap_counts_and_clean_split(ray_session):
    bench = _docs([(100, "alpha beta gamma delta"), (101, "x y z")])
    corpus = _docs(
        [
            (1, "alpha beta gamma nothing else"),  # shares shingle "alpha beta gamma"
            (2, "beta gamma delta and alpha beta gamma delta"),  # shares two
            (3, "totally disjoint words here"),
            (4, "x y z"),  # short-row whole-fold == bench doc 101's whole fold
        ]
    )
    bh = benchmark_ngram_hashes(bench)
    flagged = {
        r["doc_id"]: r["n_overlap"] for r in contamination_overlap(corpus, bh).take_all()
    }
    assert flagged == {1: 1, 2: 2, 4: 1}
    clean = sorted(r["doc_id"] for r in decontaminate(corpus, bh).take_all())
    assert clean == [3]
    # decontaminate preserves all columns
    cols = set(decontaminate(corpus, bh).schema().names)
    assert cols == {"doc_id", "text"}


def test_empty_benchmark_keeps_everything(ray_session):
    corpus = _docs([(1, "a b c d"), (2, "e f g h")])
    bh = benchmark_ngram_hashes(_docs([]))
    assert bh.dtype == np.uint64 and len(bh) == 0
    assert contamination_overlap(corpus, bh).count() == 0
    assert decontaminate(corpus, bh).count() == 2
