"""Sources & sinks: format readers/writers beyond the fixture parquet.

Reference analogues: receivers tcp/udp/unix/http (actor/receiver_*.go) and
sink heads file/tcp/udp/unix (actor/sink_head_*.go, STDOUT dumper at
sink_head_file.go:11-19).  The engine surface is Spark's format matrix;
network heads map to Kafka (gated on the connector jar) and the socket
bridge (SURVEY.md §4.2.3).
"""

from flow_spark.sources.formats import (
    read_any,
    write_any,
    kafka_available,
    READ_FORMATS,
    WRITE_FORMATS,
)

__all__ = ["read_any", "write_any", "kafka_available", "READ_FORMATS", "WRITE_FORMATS"]
