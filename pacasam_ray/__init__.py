"""pacasam_ray — a from-scratch, Ray-Data-native spatial sampling + tiling engine.

Re-expresses the query/data-processing capabilities of IGNF/pacasam
(reference read-only at /root/reference) as idiomatic Ray Data pipelines:
``ray.data.Dataset`` → ``map_batches`` over zero-copy Arrow batches, actor
pools for stateful stages, explicit groupby/sort/shuffle for the wide steps.

Not a port: the reference is a single-machine pandas/geopandas engine
(see SURVEY.md); this engine is designed for streaming execution over
Parquet tables of Common-Crawl-style web pages at cluster scale.

Design invariants
-----------------
- All "randomness" is deterministic integer hash arithmetic
  (:mod:`pacasam_ray.hashing`) that is partition-count invariant and
  SQL-expressible, so results are reproducible under any parallelism and
  oracle-checkable with DuckDB.
- Payload columns (``html``/``text``) never ride through shuffles: the
  sampling path projects to ids + features early and re-joins late by key
  (SURVEY.md §7.4.7).
- Every wide step names its partitioning key; small sides are broadcast
  via the object store, never re-shipped per batch.
"""

__version__ = "0.1.0"

GLOBAL_SEED = 0  # reference: src/pacasam/samplers/algos.py:12 (GLOBAL_RANDOM_STATE = 0)
