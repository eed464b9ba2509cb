"""Custom Python Data Source: batch determinism, partition split, and
stream/batch equivalence (the micro-batched reader must drain to exactly
the batch reader's rows)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flow_spark.sources.python_datasource import register, synth_row


def test_batch_rows_deterministic_and_partitioned(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 700)
        .option("n_partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = sorted(
        (r.event_id, r.user_id, r.event_type, r.value) for r in df.collect()
    )
    assert len(rows) == 700
    # spot-check against the one true row definition
    for i in (0, 13, 699):
        assert rows[i] == synth_row(i)
    # re-read with a different split -> identical data
    again = sorted(
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in spark.read.format("synthetic_events")
        .option("n_rows", 700)
        .option("n_partitions", 2)
        .load()
        .collect()
    )
    assert rows == again


def test_stream_drains_to_batch_equivalent(spark, tmp_path):
    register(spark)
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 650)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in spark.read.parquet(out_dir).collect()
    )
    assert len(got) == 650
    assert got == [synth_row(i) for i in range(650)]


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    """Offsets persist: re-running against a GROWN source off the same
    checkpoint emits only the new suffix — exactly-once offset tracking,
    never re-emission."""
    register(spark)
    out_dir = str(tmp_path / "out")

    def run(n_rows):
        s = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", n_rows)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run(200)
    assert spark.read.parquet(out_dir).count() == 200
    run(300)  # the source grew; only rows 200..299 may be emitted
    got = sorted(r.event_id for r in spark.read.parquet(out_dir).collect())
    assert got == list(range(300))  # no duplicates, no gaps


def test_reader_filter_pushdown_prunes_generation(spark):
    """pushFilters (Spark 4.1): the event_id range predicate reaches the
    Python reader BEFORE partition planning, so pruned rows are never
    generated and pruned partitions never scheduled — observable as a
    smaller task count, the Python-source analog of row-group pruning.
    Results must equal the unpruned reader + post-filter."""
    register(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pushed = (
            spark.read.format("synthetic_events")
            .option("n_rows", 1000)
            .option("n_partitions", 8)
            .option("pushdown", "true")
            .load()
            .filter((F.col("event_id") >= 990) & (F.col("event_id") < 998))
        )
        # 8 ids over 8 requested partitions -> 1 id per partition, and the
        # planner schedules only the 8 narrowed partitions' range ceil(8/8)=1
        assert pushed.rdd.getNumPartitions() == 8
        baseline = (
            spark.read.format("synthetic_events")
            .option("n_rows", 1000)
            .load()
            .filter((F.col("event_id") >= 990) & (F.col("event_id") < 998))
        )
        assert sorted(map(tuple, pushed.collect())) == sorted(
            map(tuple, baseline.collect())
        )

        # equality pushdown narrows to a single row / single partition
        one = (
            spark.read.format("synthetic_events")
            .option("n_rows", 1000)
            .option("pushdown", "true")
            .load()
            .filter(F.col("event_id") == 123)
        )
        assert one.rdd.getNumPartitions() == 1
        assert [tuple(r) for r in one.collect()] == [synth_row(123)]
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_jsonl_sink_two_phase_commit(spark, tmp_path):
    """Custom Python batch sink: executors write part-*.tmp, driver-side
    commit renames and writes the _SUCCESS manifest — visible output
    exists only after commit, and every temp file is gone."""
    import json
    import os

    register(spark)
    out = str(tmp_path / "jsonl_out")
    df = spark.range(25).selectExpr("id AS k", "id * 2 AS v").repartition(3)
    df.write.format("jsonl_sink").option("path", out).mode("append").save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not any(n.endswith(".tmp") for n in names)
    rows = []
    for n in names:
        if n.endswith(".jsonl"):
            with open(os.path.join(out, n)) as fh:
                rows += [json.loads(line) for line in fh]
    assert sorted((r["k"], r["v"]) for r in rows) == [(i, 2 * i) for i in range(25)]
    assert open(os.path.join(out, "_SUCCESS")).read() == "25"


def test_jsonl_sink_sweeps_zombie_tmp_files(spark, tmp_path):
    """A failed/zombie task attempt's part-*-aN.jsonl.tmp never reaches
    commit() as a commit message (only returning attempts do) — commit
    must sweep such orphans instead of letting them accumulate forever."""
    import os

    register(spark)
    out = tmp_path / "jsonl_out"
    out.mkdir()
    zombie = out / "part-00007-a999.jsonl.tmp"
    zombie.write_text('{"k": -1, "v": -1}\n')

    df = spark.range(5).selectExpr("id AS k", "id * 2 AS v")
    df.write.format("jsonl_sink").option("path", str(out)).mode("append").save()

    names = sorted(os.listdir(out))
    assert not any(n.endswith(".tmp") for n in names), names
    assert "_SUCCESS" in names


def test_jsonl_stream_sink_batchid_keyed(spark, tmp_path):
    """Custom Python STREAMING sink: files and manifests are keyed by
    batchId, so each micro-batch commits its own namespace (a replayed
    batch would overwrite, not append)."""
    import json
    import os

    register(spark)
    src = tmp_path / "sink_src"
    src.mkdir()
    out = str(tmp_path / "stream_jsonl_out")
    schema = "k long"

    spark.createDataFrame([(1,), (2,)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "a"))
    spark.createDataFrame([(3,)], schema).coalesce(1).write.mode("append").parquet(
        str(src / "b")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sink_ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    names = sorted(os.listdir(out))
    assert "_SUCCESS-00000" in names and "_SUCCESS-00001" in names
    assert not any(n.endswith(".tmp") for n in names)
    rows = []
    for n in names:
        if n.endswith(".jsonl"):
            assert n.startswith("batch-0000")
            with open(os.path.join(out, n)) as fh:
                rows += [json.loads(line)["k"] for line in fh]
    assert sorted(rows) == [1, 2, 3]


def test_simple_stream_reader_drains_same_rows(spark, tmp_path):
    """SimpleDataSourceStreamReader (the driver-side prototype API): the
    same deterministic rows arrive through read(start)->(rows, next) in
    rows_per_batch increments; the availableNow drain must equal the
    batch reader's output exactly."""
    register(spark)
    out = str(tmp_path / "simple_out")
    q = (
        spark.readStream.format("synthetic_events_simple")
        .option("n_rows", 500)
        .option("rows_per_batch", 200)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "simple_ckpt"))
        .start()
    )
    try:
        # the simple reader advances its offset per prefetched read();
        # processAllAvailable drains until read() returns an empty range
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    want = sorted(synth_row(i) for i in range(500))
    assert got == want


def test_pushdown_fully_pruned_range_returns_empty(spark):
    """A predicate that prunes the whole generation range must yield an
    empty result — not crash: Spark substitutes [None] for an empty
    partition list, so the reader returns one degenerate empty-range
    partition instead."""
    register(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (
            spark.read.format("synthetic_events")
            .option("n_rows", 100)
            .option("pushdown", "true")
            .load()
            .filter("event_id < 0")
        )
        assert df.count() == 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.python.filterPushdown.enabled")
        else:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_snapshot_cdc_stream_emits_commits(spark, tmp_path):
    """format('snapshot_cdc'): snapshot versions stream out as
    insert/update/delete rows, offsets = version numbers, and commits
    made WHILE the stream runs are picked up by the next micro-batch."""
    from flow_spark.operators.snapshots import snapshot_upsert, snapshot_write, snapshot_read
    import pyspark.sql.functions as F

    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_upsert(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], "k int, v int"),
        t, "k",
    )
    out = str(tmp_path / "cdc_out")
    q = (
        spark.readStream.format("snapshot_cdc")
        .option("table_dir", t)
        .option("key", "k")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # two commits while the stream is live
        snapshot_upsert(
            spark, spark.createDataFrame([(2, 21), (3, 30)], "k int, v int"), t, "k"
        )
        q.processAllAvailable()
        snapshot_write(
            snapshot_read(spark, t).filter(F.col("k") != 1), t
        )  # delete k=1
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.version, r.change_type, r.k, r.v)
        for r in spark.read.parquet(out).collect()
    }
    assert (1, "insert", 1, 10) in got and (1, "insert", 2, 20) in got
    assert (2, "update", 2, 21) in got and (2, "insert", 3, 30) in got
    assert (3, "delete", 1, 10) in got
    assert len(got) == 5


def test_snapshot_cdc_schema_derived_from_manifest(spark, tmp_path):
    from flow_spark.operators.snapshots import snapshot_upsert

    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_upsert(
        spark,
        spark.createDataFrame([(1, "a", 2.5)], "k int, name string, score double"),
        t, "k",
    )
    df = (
        spark.readStream.format("snapshot_cdc")
        .option("table_dir", t)
        .option("key", "k")
        .load()
    )
    assert df.schema.simpleString() == (
        "struct<version:int,change_type:string,k:int,name:string,score:double>"
    )


def test_snapshot_cdc_drives_incremental_mv(spark, tmp_path):
    """End-to-end lakehouse loop: MERGEs commit snapshot versions, the
    snapshot_cdc stream carries the changefeed, and a foreachBatch
    consumer maintains a (sum, count) MV incrementally — after the
    drain, the MV equals a full recompute of the final table state."""
    import pyspark.sql.functions as F
    from flow_spark.operators.snapshots import snapshot_read, snapshot_upsert

    register(spark)
    t = str(tmp_path / "tbl")
    snapshot_upsert(
        spark,
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30), (12, 5)], "k int, v int"
        ),
        t, "k",
    )
    snapshot_upsert(
        spark, spark.createDataFrame([(2, 25), (13, 7)], "k int, v int"), t, "k"
    )
    mv = {}  # bucket -> (n, s); driver-side dict = the MV "table"
    last = {}  # per-key last value, so updates/deletes can retract

    def apply_delta(df, _bid):
        for r in sorted(df.collect(), key=lambda x: (x.version, x.k)):
            b = r.k % 2
            n, s = mv.get(b, (0, 0))
            if r.change_type == "insert":
                mv[b] = (n + 1, s + r.v)
                last[r.k] = r.v
            elif r.change_type == "update":
                mv[b] = (n, s - last[r.k] + r.v)
                last[r.k] = r.v
            elif r.change_type == "delete":
                mv[b] = (n - 1, s - last.pop(r.k))

    q = (
        spark.readStream.format("snapshot_cdc")
        .option("table_dir", t)
        .option("key", "k")
        .load()
        .writeStream.foreachBatch(apply_delta)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    recomputed = {
        r.b: (r.n, r.s)
        for r in snapshot_read(spark, t)
        .groupBy((F.col("k") % 2).alias("b"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert {b: (n, s) for b, (n, s) in mv.items()} == recomputed
