"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
the full registered inventory (flow_spark.queries — SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL per query for the
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Apply engine session conf to a driver-provided SparkSession."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        # static conf in some builds; catalog falls back to per-read schema
        pass
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from flow_spark.queries.registry import get

    _configure(spark)
    return get("q1_pricing_summary").builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from flow_spark.queries.registry import all_queries

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in all_queries().items():
        def make(builder):  # bind loop var
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                return builder(_configure(spark), sf_dir)

            return run

        out[name] = make(q.builder)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query that has one."""
    from flow_spark.queries.registry import all_queries

    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
