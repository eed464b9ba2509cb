"""Smoke tests of the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import importlib


def test_entry_contract(spark):
    mod = importlib.import_module("__spark_entry__")
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert qs, "queries() must not be empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)


def test_all_queries_run(spark, sf_dir):
    mod = importlib.import_module("__spark_entry__")
    for name, fn in mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
