"""ontoea_ray — a Ray-Data-native knowledge-graph-construction engine.

Re-expresses the query/data-processing capabilities of the reference
(ZihengZZH/OntoEA, at /root/reference) as idiomatic Ray Data pipelines:
Parquet web pages -> text extraction -> mention detection -> ontology-aware
entity linking -> triple extraction -> canonicalization -> partitioned
(subj, pred, obj) edge table, plus the reference's alignment/eval kernel
(class-conflict matrix, similarity join, Hits@k/MR/MRR, Gale-Shapley) and
the large-scale training-data operators (dedup, ANN, text analysis).

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — sessions
are owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
