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




def probes_dot(spark, sf_dir):
    from functools import reduce
    from flow_spark.functions.vectors import dot, l2_norm
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")

    def dot64(a, b):
        terms = [F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double") for i in range(1, 65)]
        return reduce(lambda x, y: x + y, terms)

    def l2_64(a):
        terms = [F.element_at(a, i).cast("double") * F.element_at(a, i).cast("double") for i in range(1, 65)]
        return F.sqrt(reduce(lambda x, y: x + y, terms))

    for tag, d, n in (("hof", dot, l2_norm), ("unroll", dot64, l2_64)):
        q = emb.filter(F.col("vec_id") % 50 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"),
            n(F.col("embedding")).alias("qnrm"))
        c = emb.repartition(32).select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec"),
            n(F.col("embedding")).alias("cnrm"))
        scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).withColumn(
            "cos", d(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm")))
        w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
        topk = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5).select(
            "query_id", "neighbor_id", "rank", F.round("cos", 4).alias("cos"))
        bench_df(spark, f"dot/{tag}", topk)
    # equivalence: exact bit-level cos comparison between the two forms
    a, b = F.col("embedding"), F.reverse(F.col("embedding"))
    cmp = emb.select(
        F.sum((dot(a, b) != dot64(a, b)).cast("int")).alias("d_dot"),
        F.sum((l2_norm(a) != l2_64(a)).cast("int")).alias("d_nrm"),
    ).collect()[0]
    print("dot mismatches:", cmp)


PROBES["dot"] = probes_dot




def probes_wintopk(spark, sf_dir):
    from flow_spark.queries.util import revenue_cents
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    rep = li.repartition("l_suppkey")
    rev = rep.groupBy("l_suppkey", "l_partkey").agg(F.sum(revenue_cents()).alias("r"))
    bench_df(spark, "wt/agg-only", rev.groupBy().agg(F.count(F.lit(1))))
    w = W.partitionBy("l_suppkey").orderBy(F.desc("r"), F.asc("l_partkey"))
    ranked = rev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    bench_df(spark, "wt/agg+window", ranked.groupBy().agg(F.count(F.lit(1))))
    from flow_spark.queries.registry import get
    bench_df(spark, "wt/full", get("win_topk_per_group").builder(spark, sf_dir))
    # no-repartition variant: classic partial agg + re-exchange
    rev2 = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(revenue_cents()).alias("r"))
    ranked2 = rev2.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3).select(
        "l_suppkey", "l_partkey",
        (F.expr("(r + 50) div 100").cast("double") / 100).alias("revenue"), "rn"
    ).orderBy("l_suppkey", "rn")
    bench_df(spark, "wt/norepart", ranked2)
    print("groups:", rev.count(), "suppliers:", li.select("l_suppkey").distinct().count())


PROBES["wintopk"] = probes_wintopk




def probes_cfrep(spark, sf_dir):
    import tempfile, time as _t
    from flow_spark.operators.snapshots import (
        snapshot_append, snapshot_delete, snapshot_read, snapshot_upsert, snapshot_write,
    )
    from flow_spark.streaming.sinks import upsert_sink
    from flow_spark.streaming.sources import changefeed_drain, changefeed_stream
    from flow_spark.catalog import load_table
    from flow_spark.queries.streaming_windows import _drain

    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"),
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("val"),
        (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).alias("early"),
    )
    for rep in range(2):
        t = {}
        t0 = _t.perf_counter()
        src = tempfile.mkdtemp(prefix="cfrep_src_")
        snapshot_write(base.filter("early").select("k", "val"), src, stats_col="k")
        t['write'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        snapshot_upsert(spark, base.filter("early and k % 13 = 0").select("k", (F.col("val") + F.lit(11)).alias("val")), src, "k")
        t['upsert'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        snapshot_delete(spark, src, F.expr("k % 29 = 0"))
        t['delete'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        snapshot_append(base.filter("not early").select("k", "val"), src)
        t['append'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        spool = tempfile.mkdtemp(prefix="cfrep_spool_")
        changefeed_drain(spark, src, spool, "k", ["val"])
        t['drain'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        replica = tempfile.mkdtemp(prefix="cfrep_replica_")
        snapshot_write(spark.createDataFrame([], "k long, val long"), replica)
        t['mkreplica'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        stream = changefeed_stream(spark, src, spool, "k", ["val"]).withColumn(
            "op", F.when(F.col("change_type") == "delete", F.lit("D")).otherwise(F.lit("U")))
        q = upsert_sink(stream, replica, key_col="k",
                        checkpoint_dir=tempfile.mkdtemp(prefix="cfrep_ckpt_"),
                        order_col="_commit_version", op_col="op").trigger(availableNow=True).start()
        _drain(q)
        t['stream_merge'] = _t.perf_counter() - t0; t0 = _t.perf_counter()
        snapshot_read(spark, replica).groupBy((F.col("k") % 10).cast("bigint").alias("bucket")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("val").cast("bigint").alias("val_sum")
        ).orderBy("bucket").write.format("noop").mode("overwrite").save()
        t['final_agg'] = _t.perf_counter() - t0
        print(f"cfrep run{rep}: " + " ".join(f"{k}={v:.2f}" for k, v in t.items()), "total=%.2f" % sum(t.values()))


PROBES["cfrep"] = probes_cfrep


if __name__ == "__main__":
    main()
