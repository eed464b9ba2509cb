"""DuckDB-oracle parity for every registered query (mirrors the driver's
correctness gate at a smaller scale factor so failures surface locally)."""

from __future__ import annotations

import pytest

from flow_spark.oracle import check_query
from flow_spark.queries.registry import all_queries

QUERIES = sorted(all_queries().items())


@pytest.mark.parametrize("name,query", QUERIES, ids=[n for n, _ in QUERIES])
def test_oracle_parity(spark, sf_dir, name, query):
    res = check_query(spark, query, sf_dir)
    assert res.ok, f"{name}: {res.detail}"
