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
