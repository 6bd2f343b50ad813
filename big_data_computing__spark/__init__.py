"""big_data_computing__spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
``Sezgicobanbas/Big-Data-Computing-`` (three RDD/DStream driver scripts:
(M,D)-outlier detection, k-center clustering via Farthest-First Traversal,
and streaming frequent items) as an idiomatic DataFrame / Spark SQL /
Structured Streaming operator library, extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal column plumbing).

Design rules (see SURVEY.md):
- DataFrame in / DataFrame out for every operator; no RDDs, no DStreams.
- Explicit schemas at every source; Parquet as canonical storage.
- Per-row logic compiles to Catalyst expressions; Python appears only in
  Arrow-vectorized kernels (``mapInPandas`` / ``applyInPandas``) where the
  algorithm is genuinely sequential/vectorized (FFT coreset kernel).
- All randomness is either seeded (kernels) or counter-based
  (hash-of-row-id PRNG) so results are deterministic and reproducible
  on any cluster size and partitioning.
"""

__version__ = "0.1.0"

from .session import get_session  # noqa: E402,F401

__all__ = [
    "get_session",
    # operator modules (import as big_data_computing__spark.operators.X)
    "functions",
    "operators",
    "plans",
    "sources",
    "streaming",
]
