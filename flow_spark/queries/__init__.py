"""Declared query inventory (SURVEY.md §2) with DuckDB oracles."""

from flow_spark.queries.registry import Query, all_queries, get, register

__all__ = ["Query", "all_queries", "get", "register"]
