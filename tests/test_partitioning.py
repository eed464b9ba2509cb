"""Partition-layout evidence: writes partitioned by a predicate column
must prune at the source (PartitionFilters), and a checkpointed stream
must resume exactly-once after a restart."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = str(tmp_path / "ev_by_type")
    ev.write.partitionBy("event_type").parquet(out)

    q = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = _plan(q)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1].split("]")[0]
    assert q.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_checkpointed_stream_resumes_exactly_once(spark, tmp_path):
    """Stop a checkpointed stream, add input, restart with the same
    checkpoint: previously-committed batches must not replay."""
    src = tmp_path / "src"
    sink = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def write_batch(name, lo, hi):
        spark.createDataFrame([(i,) for i in range(lo, hi)], "v long").coalesce(
            1
        ).write.parquet(str(src / name))

    def run_once():
        stream = spark.readStream.schema("v long").parquet(str(src / "*"))
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("a", 0, 50)
    run_once()
    write_batch("b", 50, 80)
    run_once()  # same checkpoint: only batch b is new

    vals = sorted(r.v for r in spark.read.parquet(sink).collect())
    assert vals == list(range(80)), "duplicates or losses across restart"


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join evidence: one key owning ~90% of the fact rows must
    be split at runtime (the final adaptive SortMergeJoin is marked
    skew=true), not processed as one straggler partition. Thresholds are
    lowered so the effect is visible at test scale; at 100 TB the same
    mechanism fires with production defaults (256 MB partitions)."""
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        # 90% of fact rows share key 0; dim is uniform
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 1000).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        # aggregate over pad so column pruning can't drop it: the shuffled
        # fact partitions keep their (skewed) width
        joined = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.max(F.length("pad")).alias("w")
        )
        [row] = joined.collect()
        assert row.n == 200_000 and row.w == 64
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_range_partition_global_sort(spark, sf_dir):
    """Total ordering at scale = repartitionByRange + sortWithinPartitions
    (each task sorts its slice; range boundaries make the concatenation
    globally ordered) — never a single-task global sort. Verify partition
    ranges are disjoint and ordered."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    parts = (
        o.repartitionByRange(8, F.col("o_totalprice"))
        .sortWithinPartitions("o_totalprice")
        .select("o_totalprice")
        .rdd.mapPartitionsWithIndex(
            lambda i, rows: (
                lambda vals: [(i, vals[0], vals[-1], len(vals))] if vals else []
            )([r.o_totalprice for r in rows])
        )
        .collect()
    )
    assert sum(n for _, _, _, n in parts) == o.count()
    parts.sort()
    for (i, lo, hi, _), (j, lo2, hi2, _) in zip(parts, parts[1:]):
        assert hi <= lo2, (i, hi, j, lo2)  # disjoint, ordered ranges
        assert lo <= hi and lo2 <= hi2     # sorted within partition


def test_task_retry_determinism(sf_dir):
    """A task that fails transiently (first attempt of one partition) must
    retry and yield the EXACT same aggregate as a clean run — the
    speculative-execution/determinism claim behind every exact-decimal
    aggregate. Needs task retries, which local mode only grants via
    master local[N, maxFailures], so it runs in its own interpreter."""
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        f"""
        import pandas as pd
        from pyspark import TaskContext
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        spark = (SparkSession.builder.master("local[4, 2]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.ui.enabled", "false").getOrCreate())
        li = spark.read.parquet("{sf_dir}/lineitem.parquet")

        @pandas_udf("double")
        def flaky_identity(v):
            ctx = TaskContext.get()
            if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
                raise RuntimeError("injected transient failure")
            return pd.Series(v)

        clean = li.groupBy("l_returnflag").agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("s"))
        flaky = (li.withColumn("q", flaky_identity(F.col("l_quantity")))
                 .groupBy("l_returnflag")
                 .agg(F.sum(F.col("q").cast("decimal(12,2)")).alias("s")))
        expect = sorted((r.l_returnflag, str(r.s)) for r in clean.collect())
        got = sorted((r.l_returnflag, str(r.s)) for r in flaky.collect())
        assert got == expect, (got, expect)
        print("RETRY_DETERMINISM_OK")
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "RETRY_DETERMINISM_OK" in proc.stdout, proc.stderr[-2000:]


def test_dynamic_partition_overwrite(spark, tmp_path):
    """Partition-level idempotent re-runs: overwrite mode=dynamic replaces
    ONLY the partitions present in the incoming batch — the property that
    makes re-running one day of a 100 TB partitioned table safe (static
    overwrite would wipe every other partition)."""
    path = str(tmp_path / "pt")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, day string").write.partitionBy(
        "day"
    ).parquet(path, mode="overwrite")
    spark.createDataFrame([(10, "a")], "id long, day string").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy("day").parquet(path)
    out = {(r.id, r.day) for r in spark.read.parquet(path).collect()}
    assert out == {(10, "a"), (2, "b")}


def test_morton_interleave_matches_reference(spark):
    """Column-expression Morton key == pure-python reference, and the
    z-curve locality property holds (shared prefix => bounded box)."""
    import random

    from pyspark.sql import functions as F

    from flow_spark.functions.layout import morton_interleave16, morton_interleave16_py

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = (
        df.select("x", "y", morton_interleave16(F.col("x"), F.col("y")).alias("z"))
        .orderBy("x", "y")
        .collect()
    )
    for r in got:
        assert r.z == morton_interleave16_py(r.x, r.y), (r.x, r.y)
    # locality: equal z >> 2k prefix bounds both dims within 2^k
    k = 6
    from collections import defaultdict

    boxes = defaultdict(list)
    for r in got:
        boxes[r.z >> (2 * k)].append((r.x, r.y))
    for pts in boxes.values():
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert max(xs) - min(xs) < (1 << k)
        assert max(ys) - min(ys) < (1 << k)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Spark injects a bloom-filter semijoin reduction on the fact side of
    a selective shuffle join (runtime row-level pruning before the
    exchange).  The production trigger is applicationSideScanSizeThreshold
    = 10GB — i.e. it arms itself exactly at the scan sizes our 100 TB
    target has; here the threshold drops to 0 so sf-scale fixtures
    demonstrate the plan shape, and the result is asserted identical to
    the filter-off plan."""
    from pyspark.sql import functions as F

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )

    def run():
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    old_bloom = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", None)
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        baseline = run()

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        df = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, "bloom filter not injected"
        assert [tuple(r) for r in df.collect()] == [tuple(r) for r in baseline]
    finally:
        for key, val in (
            ("spark.sql.optimizer.runtime.bloomFilter.enabled", old_bloom),
            ("spark.sql.autoBroadcastJoinThreshold", old_bcast),
        ):
            if val is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, val)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    """AQE partition coalescing: a shuffle declared at 32 partitions over
    a small aggregate must execute with FEWER partitions (AQEShuffleRead
    'coalesced') — the runtime right-sizing that keeps 100 TB plans from
    drowning in tiny tasks when a filter makes a stage small."""
    import pyspark.sql.functions as F

    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_custkey") % 97 == 0)  # small surviving set
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    df.collect()  # materialize so AQE finalizes the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:1500]


def test_max_partition_bytes_controls_scan_parallelism(spark, sf_dir):
    """spark.sql.files.maxPartitionBytes is THE scan fan-out knob: shrinking
    it must split the same parquet file into more input partitions (how a
    100 TB read sizes its map side to executor memory)."""
    path = f"{sf_dir}/lineitem.parquet"
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        wide = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(16 * 1024))
        narrow = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    assert narrow > wide
    assert narrow >= 4  # 16k slices of the ~100KB smoke fixture


def test_coalesce_is_narrow_repartition_is_exchange(spark, sf_dir):
    """coalesce shrinks partition count WITHOUT a shuffle (narrow — the
    cheap post-filter compaction); repartition always exchanges.  Getting
    these backwards at 100 TB either serializes the job (coalesce too
    far) or pays a pointless full shuffle."""
    import contextlib
    import io

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter("l_quantity > 49")

    def plan_of(d):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            d.explain("formatted")
        return buf.getvalue()

    assert "Exchange" not in plan_of(df.coalesce(2))
    assert "Exchange" in plan_of(df.repartition(2))


def test_rebalance_hint_inserts_aqe_rebalance(spark, sf_dir):
    """The REBALANCE hint plans an AQE-optimizable exchange that splits
    skewed output partitions before a write — the knob that fixes the
    one-giant-output-file problem without hand-tuning a partition count."""
    import contextlib
    import io

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").hint("rebalance")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" in plan and ("REBALANCE" in plan or "RebalancePartitions" in plan)


def test_incremental_join_maintenance(spark, sf_dir, tmp_path):
    """Incremental ETL delta pattern: maintaining an enriched (fact JOIN
    dim) table by processing only NEW fact partitions and appending must
    equal the full recompute — valid because an inner equi-join
    distributes over union of the fact side.  At 100 TB this is the
    difference between joining a day's delta and re-joining the table;
    the append target is partitioned by the ingest batch so reprocessing
    a batch overwrites only its own partition."""
    import pyspark.sql.functions as SF

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    def enrich(fact):
        return fact.join(SF.broadcast(cust), fact.o_custkey == cust.c_custkey).select(
            "o_orderkey", "o_custkey", "c_mktsegment",
            SF.round(SF.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )

    out = str(tmp_path / "enriched")
    batch0 = orders.filter("o_orderkey % 3 != 0")
    delta = orders.filter("o_orderkey % 3 = 0")

    enrich(batch0).withColumn("batch", SF.lit(0)).write.partitionBy("batch").parquet(out)
    # incremental: ONLY the delta flows through the join, appended
    enrich(delta).withColumn("batch", SF.lit(1)).write.mode("append").partitionBy(
        "batch"
    ).parquet(out)

    incremental = sorted(
        (r.o_orderkey, r.o_custkey, r.c_mktsegment, r.cents)
        for r in spark.read.parquet(out).collect()
    )
    full = sorted(
        (r.o_orderkey, r.o_custkey, r.c_mktsegment, r.cents)
        for r in enrich(orders).collect()
    )
    assert incremental == full


def test_hilbert_rounds_match_reference(spark):
    """The shared-text Hilbert SQL walk (hilbert_rounds_spark) == the
    pure-python xy->d reference, and the curve is a true Hilbert curve:
    bijective on the grid with unit steps between consecutive d (the
    no-diagonal-jumps property Z-order lacks — why per-bucket spans
    stay tighter)."""
    import random

    from flow_spark.functions.layout import (
        HILBERT_BITS,
        hilbert_rounds_spark,
        hilbert_xy2d_py,
    )

    rng = random.Random(11)
    side = 1 << HILBERT_BITS
    rows = [(rng.randrange(side), rng.randrange(side)) for _ in range(400)]
    df = spark.createDataFrame(rows, "x long, y long").selectExpr(
        "x", "y", "x AS rawx", "y AS rawy"
    )
    got = hilbert_rounds_spark(df).collect()
    for r in got:
        assert r.d == hilbert_xy2d_py(r.rawx, r.rawy), (r.rawx, r.rawy)
    # exhaustive bijectivity + unit-step walk on the 16x16 subcurve
    inv = {}
    for x in range(16):
        for y in range(16):
            inv[hilbert_xy2d_py(x, y, 4)] = (x, y)
    assert sorted(inv) == list(range(256))
    assert all(
        abs(inv[i][0] - inv[i + 1][0]) + abs(inv[i][1] - inv[i + 1][1]) == 1
        for i in range(255)
    )
