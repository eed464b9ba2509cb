"""Bucketed co-located join: the write-once/join-many shuffle elision.

The assertion that matters: joining two tables bucketed on the join key
produces a sort-merge plan with NO hash-partition shuffle on either side
— at 100 TB that is the difference between re-shuffling two fact tables
per query and reading co-located buckets.

Broadcast joins ignore bucketing (the planner broadcasts the small side
instead — correct at fixture scale), so the tests pin the fact-fact
scenario by disabling auto-broadcast, exactly the regime two 100 TB
tables are in.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flow_spark.sources.bucketing import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    import shutil

    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = f"{spark.conf.get('spark.sql.warehouse.dir').removeprefix('file:')}/{t}"
        shutil.rmtree(loc, ignore_errors=True)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_b", "l_orderkey", 4)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "ord_b", "l_orderkey", 4
    )
    yield "li_b", "ord_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_elides_shuffle(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    plan = _plan(colocated_join(spark, left, right, "l_orderkey"))
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_unbucketed_join_does_shuffle(spark, sf_dir, no_broadcast):
    """Control: the same join on plain parquet shuffles both sides."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = _plan(li.join(orders, li.l_orderkey == orders.o_orderkey))
    assert plan.count(") Exchange") == 2


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    n_bucketed = colocated_join(spark, left, right, "l_orderkey").count()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n_bucketed == n_plain


def test_bucketed_agg_elides_shuffle(spark, bucketed_tables):
    from pyspark.sql import functions as F

    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = _plan(agg)
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
