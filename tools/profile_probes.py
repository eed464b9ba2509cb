"""Ad-hoc stage-cost probes for the optimization round.

Times sub-plans of headline queries with the noop sink (1 warm + median of
5) so per-operator cost can be separated: parquet decode, filter, per-row
expression work, shuffle, final agg.  Usage:

    python tools/profile_probes.py <probe-set> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flow_spark.catalog import load_table  # noqa: E402
from flow_spark.session import get_spark, release_cached_blocks  # noqa: E402


def bench_df(spark, name, df, n=5):
    spark.sparkContext.setJobDescription(name)
    df.write.format("noop").mode("overwrite").save()
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    med = sorted(runs)[n // 2]
    print(f"{name:44s} {med:7.3f}s  (min {min(runs):.3f} max {max(runs):.3f})")
    release_cached_blocks(spark)
    return med


def probes_q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cols7 = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"]
    flt = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    bench_df(spark, "q1/scan7-noop", li.select(*cols7))
    bench_df(spark, "q1/scan7+filter", li.select(*cols7).filter(flt))
    bench_df(spark, "q1/scan4num", li.select("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    bench_df(spark, "q1/scan2str", li.select("l_returnflag", "l_linestatus"))
    bench_df(spark, "q1/count-only", li.filter(flt).groupBy("l_returnflag", "l_linestatus").count())
    from flow_spark.queries.registry import get
    bench_df(spark, "q1/full", get("q1_pricing_summary").builder(spark, sf_dir))
    # cents arithmetic in the scan task, no rounding: plain double sums
    bench_df(
        spark,
        "q1/double-sums",
        li.filter(flt).groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.sum("l_extendedprice"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))),
            F.sum("l_discount"), F.count(F.lit(1)),
        ),
    )


def probes_scan(spark, sf_dir):
    # aggregate to one row so the noop sink's per-row cost vanishes: the
    # probe then times decode + the (trivial) agg only
    li = load_table(spark, sf_dir, "lineitem")
    bench_df(spark, "scan/li-1num", li.agg(F.sum("l_quantity")))
    bench_df(spark, "scan/li-4num", li.agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.sum("l_discount"), F.sum("l_tax")))
    bench_df(spark, "scan/li-1str", li.agg(F.max("l_returnflag")))
    bench_df(spark, "scan/li-2str", li.agg(F.max("l_returnflag"), F.max("l_linestatus")))
    bench_df(spark, "scan/li-1ts", li.agg(F.max("l_shipdate")))
    bench_df(spark, "scan/li-7col", li.agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.sum("l_discount"), F.sum("l_tax"), F.max("l_returnflag"), F.max("l_linestatus"), F.max("l_shipdate")))
    bench_df(spark, "scan/li-count", li.agg(F.count(F.lit(1))))
    flt = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    bench_df(spark, "scan/li-7col+filter", li.filter(flt).agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.sum("l_discount"), F.sum("l_tax"), F.max("l_returnflag"), F.max("l_linestatus")))
    bench_df(spark, "scan/li-group2str", li.filter(flt).groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1))))


PROBES = {"q1": probes_q1, "scan": probes_scan}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "q1"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile-probes")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    PROBES[which](spark, sf_dir)




def probes_cents(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    flt = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")

    def c_round(col):  # current: BigDecimal HALF_UP per row
        return F.round(F.col(col) * 100, 0).cast("long")

    def c_fp(col):  # candidate: pure FP half-up (nonneg money)
        return (F.col(col) * 100.0 + F.lit(0.5)).cast("long")

    for tag, c in (("round", c_round), ("fp", c_fp)):
        price, disc, tax = c("l_extendedprice"), c("l_discount"), c("l_tax")
        rev = price * (F.lit(100) - disc)
        charge = rev * (tax + F.lit(100))
        df = (
            li.filter(flt)
            .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
            .agg(
                F.sum("l_quantity"), F.sum(price), F.sum(rev), F.sum(charge),
                F.sum(disc), F.count(F.lit(1)),
            )
        )
        bench_df(spark, f"cents/{tag}", df)
    # cross-check both produce identical longs
    price_r, price_f = c_round("l_extendedprice"), c_fp("l_extendedprice")
    disc_r, disc_f = c_round("l_discount"), c_fp("l_discount")
    tax_r, tax_f = c_round("l_tax"), c_fp("l_tax")
    n = li.select(
        F.sum((price_r != price_f).cast("int")).alias("dp"),
        F.sum((disc_r != disc_f).cast("int")).alias("dd"),
        F.sum((tax_r != tax_f).cast("int")).alias("dt"),
    ).collect()[0]
    print("mismatches:", n)


PROBES["cents"] = probes_cents


if __name__ == "__main__":
    main()


def probes_repart(spark, sf_dir):
    """Does an early round-robin repartition of the single-task scan pay?"""
    from flow_spark.queries.registry import get

    li = load_table(spark, sf_dir, "lineitem")
    flt = F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    from flow_spark.queries.util import cents, revenue_cents, charge_cents, partial_cents_merge

    def q1_shape(src):
        n = F.sum("p_n")
        partial = (
            src.filter(flt)
            .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
            .agg(
                F.sum("l_quantity").alias("p_qty"),
                F.sum(cents("l_extendedprice")).alias("p_base"),
                F.sum(revenue_cents()).alias("p_rev"),
                F.sum(charge_cents()).alias("p_charge"),
                F.sum(cents("l_discount")).alias("p_disc"),
                F.count(F.lit(1)).alias("p_n"),
            )
        )
        return (
            partial.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("p_qty").alias("sum_qty"),
                partial_cents_merge("p_base", 2).alias("sum_base_price"),
                partial_cents_merge("p_rev", 4).alias("sum_disc_price"),
                partial_cents_merge("p_charge", 6).alias("sum_charge"),
                F.round(F.sum("p_qty") / n, 4).alias("avg_qty"),
                F.round(F.sum("p_base").cast("double") / 100 / n, 4).alias("avg_price"),
                F.round(F.sum("p_disc").cast("double") / 100 / n, 4).alias("avg_disc"),
                n.alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    cols7 = ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
             "l_returnflag", "l_linestatus", "l_shipdate"]
    bench_df(spark, "repart/q1-asis", q1_shape(li))
    bench_df(spark, "repart/q1-repart32", q1_shape(li.select(*cols7).repartition(32)))
    bench_df(spark, "repart/q9-asis", get("q9_product_profit").builder(spark, sf_dir))
    bench_df(spark, "repart/q21-new", get("q21_waiting_supplier").builder(spark, sf_dir))
    bench_df(spark, "repart/asof-new", get("asof_join_backward").builder(spark, sf_dir))
    bench_df(spark, "repart/minhash-new", get("dedup_minhash_lsh").builder(spark, sf_dir))
    bench_df(spark, "repart/dedup-exact-new", get("dedup_exact").builder(spark, sf_dir))


PROBES["repart"] = probes_repart
