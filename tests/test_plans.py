"""Physical-plan audits: the scale properties that make these queries
survive a 100x data blow-up, asserted so they can't silently regress.

- filters/pruning must reach the parquet scan (PushedFilters/ReadSchema),
- fact-dim joins must broadcast the dim (BroadcastHashJoin, never a
  shuffle of the fact for a 25-row nation table),
- the bucketized range join must plan as an EQUI join, not a
  BroadcastNestedLoopJoin/CartesianProduct,
- no row-at-a-time Python evaluation in the bench headline path.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flow_spark.queries.registry import all_queries


def plan_of(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].builder(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed_and_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # every predicate column reaches the scan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert f"({col})" in plan or col in plan.split("PushedFilters")[1].split("]")[0]
    # projection pruning: the scan must not read unused money columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_partkey" not in read_schema and "l_returnflag" not in read_schema


def test_q1_scan_pruned(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_suppkey" not in read_schema
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "LessThanOrEqual(l_shipdate" in plan


@pytest.mark.parametrize(
    "name",
    ["q3_shipping_priority", "q5_local_supplier_volume", "q7_volume_shipping", "q10_returned_items", "q14_promo_effect", "q19_disjunctive_pred"],
)
def test_dim_joins_broadcast(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bucketized_range_join_is_equi(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scale_bucketed_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # SortMergeJoin or ShuffledHashJoin on (user_id, bucket)


def test_salted_join_spreads_keys(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scale_salted_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "salt" in plan


def test_asof_join_single_shuffle_no_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "asof_join_backward")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # union + window, not a join node at all
    assert "Window" in plan and "Union" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "win_topk_per_group",
        "join_left_outer",
        "dedup_exact",
        "sim_topk_bruteforce",
        "text_token_stats",
        "stream_window_tumbling",
        "ts_resample_ohlc",
        "dedup_incremental",
        "sim_range_search_quantized",
        "sketch_kmv_union",
        "dq_expectations",
    ],
)
def test_headline_path_stays_jvm_side(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python"


def test_headline_aggs_are_partial(spark, sf_dir):
    """Aggregations must be map-side partial (HashAggregate appears in
    both partial and final mode) so the shuffle carries groups, not rows."""
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_asof_forward_single_shuffle_no_python(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "asof_join_forward")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan and "Union" in plan
    assert "CartesianProduct" not in plan


def test_contamination_check_broadcasts_benchmark(spark, sf_dir):
    """The benchmark-excerpt side is tiny by construction — it must reach
    the shingle stream as a broadcast, never a shuffle of the corpus."""
    plan = plan_of(spark, sf_dir, "text_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_shuffle(spark, sf_dir):
    """lag + cumulative sum + rollup all share the user_id partitioning:
    exactly one Exchange over the events scan."""
    plan = plan_of(spark, sf_dir, "win_sessionize")
    # exactly 2 Exchange nodes (each named twice in the formatted plan:
    # tree + detail): the user_id hash shuffle shared by lag/cumsum/agg,
    # and the range shuffle of the final orderBy.  A third would mean the
    # agg stopped reusing the window partitioning.
    assert plan.count("Exchange") <= 4
    assert plan.count("Window") >= 2
    assert "BatchEvalPython" not in plan


def test_analyze_statistics_drive_broadcast_choice(spark, sf_dir, tmp_path):
    """Cost-based planning from catalog statistics: ANALYZE TABLE writes
    rowCount/sizeInBytes into the catalog, and the STATIC planner (AQE
    disabled) picks a broadcast join for the small side from those stats
    alone — the decision path a 100 TB warehouse relies on when plans
    must be fixed before runtime (AQE fixes it at runtime; stats fix it
    at compile time)."""
    import pyspark.sql.functions as F

    spark.sql("DROP TABLE IF EXISTS stats_nation")
    spark.sql("DROP TABLE IF EXISTS stats_customer")
    spark.sql(
        f"CREATE TABLE stats_nation USING parquet "
        f"LOCATION '{sf_dir}/nation.parquet'"
    )
    spark.sql(
        f"CREATE TABLE stats_customer USING parquet "
        f"LOCATION '{sf_dir}/customer.parquet'"
    )
    try:
        spark.sql("ANALYZE TABLE stats_nation COMPUTE STATISTICS")
        spark.sql("ANALYZE TABLE stats_customer COMPUTE STATISTICS")
        desc = spark.sql("DESC EXTENDED stats_nation").collect()
        stats_row = [r for r in desc if r.col_name == "Statistics"]
        assert stats_row and "rows" in stats_row[0].data_type

        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            plan = (
                spark.table("stats_customer")
                .join(
                    spark.table("stats_nation"),
                    F.col("c_nationkey") == F.col("n_nationkey"),
                )
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        # no broadcast() hint anywhere: the stats alone made the choice
        assert "BroadcastHashJoin" in plan, plan[:2000]
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_nation")
        spark.sql("DROP TABLE IF EXISTS stats_customer")


def test_join_strategy_hints_select_physical_operators(spark, sf_dir):
    """The three join-strategy hints each reach their physical operator —
    the knobs a 100 TB tuning pass turns when the optimizer's default is
    wrong: BROADCAST forces a map-side join regardless of size estimate,
    SHUFFLE_HASH builds a hash table per partition (beats sort-merge when
    one side is much smaller but too big to broadcast), MERGE forces
    sort-merge (the safe choice when both sides are huge and a hash table
    would spill)."""
    from pyspark.sql import functions as F

    from flow_spark.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    def plan_with(hint: str) -> str:
        df = orders.join(cust.hint(hint), orders.o_custkey == cust.c_custkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    assert "BroadcastHashJoin" in plan_with("broadcast")
    assert "ShuffledHashJoin" in plan_with("shuffle_hash")
    assert "SortMergeJoin" in plan_with("merge")


def test_two_level_distinct_rewrite_avoids_expand(spark, sf_dir):
    """Multiple COUNT(DISTINCT ...) in one aggregation plan through an
    Expand that replicates every input row once per distinct aggregate —
    fine on a 5-row group-by, a 3x data blow-up on a 100 TB fact table.
    The scalable rewrite (dedupe each column family separately, then
    join the small per-group results) must produce identical numbers
    with NO Expand in any branch."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    def plan_text(d):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            d.explain("formatted")
        return buf.getvalue()

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")

    direct = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )
    assert "Expand" in plan_text(direct)

    custs = (
        orders.select("o_orderpriority", "o_custkey")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_custs"))
    )
    stats = (
        orders.select("o_orderpriority", "o_orderstatus")
        .distinct()
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_statuses"))
    )
    rewrite = custs.join(stats, "o_orderpriority")
    assert "Expand" not in plan_text(rewrite)

    key = lambda rows: sorted(  # noqa: E731
        (r.o_orderpriority, r.n_custs, r.n_statuses) for r in rows
    )
    assert key(direct.collect()) == key(rewrite.collect())


@pytest.mark.parametrize(
    "name",
    [
        "snap_delete_vectors",
        "snap_bloom_pointlookup",
        "stream_upsert_cdc",
        "stream_cdc_deletes",
    ],
)
def test_lakehouse_tier_stays_jvm_side(spark, sf_dir, name):
    """The DV anti-join and the bloom probe are the newest pieces of
    plan machinery in the lakehouse tier; a Python-eval node sneaking
    into their read path would turn every post-delete scan row-at-a-
    time.  The builders run their snapshot workflow and return the
    final read — that plan must stay JVM-side end to end."""
    plan = plan_of(spark, sf_dir, name)
    assert "BatchEvalPython" not in plan, f"{name} has row-at-a-time Python"
    assert "ArrowEvalPython" not in plan, f"{name} has Python eval"
