"""cpp_near_dedupe_spark — a PySpark-native near-duplicate record-linkage engine.

From-scratch rebuild (not a port) of the query semantics of
SirWaffle/cpp-near-dedupe: k-word shingling, bottom-N MinHash sketches, LSH
banding, Jaccard verification, and transitive duplicate clustering —
expressed as Spark DataFrame dataflow with vectorized Arrow kernels.

See SURVEY.md for the structural analysis of the reference and the mapping
of every reference operator to its Spark-first equivalent.
"""

from .config import DedupeConfig, DEFAULT_CONFIG

__all__ = ["DedupeConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
