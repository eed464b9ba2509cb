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
