"""sf1 (10x) scale evidence: plan shapes must not change with data volume.

The 100 TB question is not "does it run at 10x" but "does the PLAN stay
the same at 10x" — a broadcast flipping to a shuffle join, or a new
Exchange appearing, is how a query that works at sf0.1 falls over at
scale.  These tests compare the physical-plan operator census of
representative headliners between sf0.1 and the generated sf1 fixtures
(tools/make_sf1.py: disjoint key ranges, so per-key fan-out is identical).

AQE caveat: counts are taken from the INITIAL physical plan (pre-AQE
re-optimization), which is the data-independent artifact; AQE may still
coalesce partitions at runtime — that's the point of keeping it on.
"""

from __future__ import annotations

import re

import pytest

from flow_spark.queries.registry import get

PLAN_OPS = (
    "Exchange",
    "BroadcastExchange",
    "SortMergeJoin",
    "BroadcastHashJoin",
    "HashAggregate",
    "Window",
)

#: ALL 19 bench headliners: a silent broadcast->shuffle flip or a new
#: Exchange in ANY of them at 10x is exactly the regression this guards
from bench import HEADLINE as QUERIES  # noqa: E402


def _census(df) -> dict[str, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {op: len(re.findall(rf"\b{op}\b", plan)) for op in PLAN_OPS}


@pytest.fixture(scope="module")
def sf1_dir():
    from tools.make_sf1 import ensure_sf1

    return ensure_sf1()


SF01 = "/root/testdata/sf0.1"


@pytest.mark.parametrize("name", QUERIES)
def test_plan_shape_invariant_at_10x(spark, sf1_dir, name):
    q = get(name)
    small = _census(q.builder(spark, SF01))
    big = _census(q.builder(spark, sf1_dir))
    # BroadcastHashJoin must not silently degrade to SortMergeJoin (or
    # vice versa), and no new Exchange may appear: data grew 10x, the
    # plan must not.
    assert small == big, f"{name}: plan shape changed at 10x: {small} -> {big}"


def test_sf1_rowcounts_are_10x(spark, sf1_dir):
    from flow_spark.catalog import load_table

    for t, factor in (("lineitem", 10), ("orders", 10), ("region", 1)):
        n_small = load_table(spark, SF01, t).count()
        n_big = load_table(spark, sf1_dir, t).count()
        assert n_big == factor * n_small, (t, n_small, n_big)


def test_sf1_join_integrity(spark, sf1_dir):
    """Replication preserves FK integrity: every lineitem joins exactly one
    order, i.e. replica offsets are consistent across tables."""
    from flow_spark.catalog import load_table

    li = load_table(spark, sf1_dir, "lineitem")
    o = load_table(spark, sf1_dir, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert joined == li.count()


@pytest.mark.parametrize(
    "name",
    ["snap_delete_vectors", "snap_bloom_pointlookup", "stream_cdc_deletes"],
)
def test_lakehouse_oracle_bit_exact_at_10x(spark, sf1_dir, name):
    """The lakehouse tier's pruned-file counts and DV-filtered totals
    must stay BIT-EXACT at 10x data, not just at the fixture scale —
    the bloom replay (every set bit re-derived by the oracle) and the
    delete-vector arithmetic are the likeliest machinery to rot with
    volume.  Full DuckDB-oracle parity at sf1."""
    from flow_spark.oracle import check_query
    from flow_spark.queries.registry import get

    res = check_query(spark, get(name), sf1_dir)
    assert res.ok, f"{name} at sf1: {res.detail}"
