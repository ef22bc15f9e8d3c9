"""vectordb_watermark_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of Yejiaxuan/VectorDB-Watermark ("DbWM"),
re-expressed Spark-first for arbitrary scale.

The reference system (see SURVEY.md) is a deep-learning watermarking system for
vector databases: it embeds an AES-GCM-encrypted message into a pseudo-randomly
selected subset of low-in-degree vectors of a kNN proximity graph, and blindly
re-derives that subset at extraction time.  This package re-expresses every
stage as DataFrame operators:

- ``functions``  — scalar/array kernels: bit codecs, CRC-4, AES-GCM, keyed-hash
  randomness, vector math, text analysis.
- ``operators``  — distributed operators: kNN graph + degrees, carrier
  selection, majority vote, attacks, dedup, similarity search, multimodal.
- ``sources``    — vector-table IO, merge/upsert sinks, catalog introspection.
- ``plans``      — end-to-end embed/extract pipelines and the watermark codec.
- ``streaming``  — Structured Streaming extensions (incremental embed,
  windowed event aggregation); the reference itself has no streaming surface
  (SURVEY.md §2.10), these are scale extensions.

Determinism rules (SURVEY.md §7.1): every random choice is a keyed hash
(``sha2(key || id)``), never a stateful RNG; every semantic order is an
explicit ``orderBy``.  This makes the engine reproducible under any
partitioning and lets "random" operators be checked against a DuckDB oracle.
"""

__version__ = "0.1.0"

from vectordb_watermark_spark.session import get_spark  # noqa: F401
