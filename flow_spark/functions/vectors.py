"""Vector math over ``array<float>`` columns, JVM-side.

Uses ``F.zip_with`` + ``F.aggregate`` higher-order functions so the dot
product / norms run inside codegen — no Python round trip.  For very wide
vectors or batched top-k, a vectorized Pandas UDF (numpy matmul) wins; see
``flow_spark.operators.similarity`` which provides both paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
