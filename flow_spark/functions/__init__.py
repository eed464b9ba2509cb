"""Scalar/column helper functions shared across operators.

Everything here is built from JVM-side ``pyspark.sql.functions`` so it stays
inside whole-stage codegen — no Python UDFs on these paths.
"""

from flow_spark.functions.hashing import (
    portable_hash64,
    portable_hash_expr,
    minhash_band_key,
)
from flow_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "portable_hash64",
    "portable_hash_expr",
    "minhash_band_key",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
