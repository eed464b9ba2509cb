"""Streaming sources.

Reference receivers (tcp/udp/unix/http, actor/receiver_*.go) are network
servers with per-message acks — Spark's model inverts this: sources are
pull-based and acks become the delivery-result stream (SURVEY.md §3.2).
For the fixture harness the sources are file-based; a production ingest
path would be Kafka (or the asyncio socket bridge sketched in SURVEY §4.2.3
feeding Kafka), which plugs in here unchanged.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from flow_spark.catalog import table_path
from flow_spark.operators.message import events_to_messages


def _as_stream_dir(file_path: str) -> str:
    """Spark's file-stream source monitors a DIRECTORY; the fixtures are
    single parquet files, so expose each through a symlink dir (no copy)."""
    d = tempfile.mkdtemp(prefix="flow_spark_stream_")
    os.symlink(file_path, os.path.join(d, os.path.basename(file_path)))
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture as an unbounded stream of canonical messages."""
    static = spark.read.parquet(table_path(sf_dir, "events"))
    raw = spark.readStream.schema(static.schema).parquet(
        _as_stream_dir(table_path(sf_dir, "events"))
    )
    from flow_spark.catalog import normalize_events_ts

    return events_to_messages(normalize_events_ts(raw))
