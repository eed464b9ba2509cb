"""The flagship integration: a reference example config (tcp receiver ->
sink) runs LIVE on this engine — real TCP clients, per-message acks,
bridge spool, streaming query, delivered rows."""

from __future__ import annotations

import socket

from flow_spark.plans.builder import Pipeline

EXAMPLE = "/root/reference/examples/tcp2stdout-config.yml"


def test_reference_tcp_example_runs_live(spark, tmp_path):
    yaml_text = open(EXAMPLE).read()
    p = Pipeline.from_yaml(
        spark,
        yaml_text,
        # port 0 = auto-assign so parallel test runs never collide
        cli_overrides={"actors.tcp_rcv.params.bind": "tcp://127.0.0.1:0"},
    )

    delivered: list = []

    def writer(sink_name, df):
        return (
            df.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"live_{sink_name}")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{sink_name}"))
            .start()
        )

    queries = p.run_streaming(sink_writer=writer)
    try:
        port = p._bridges[0].port
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(b"hello\r\nworld\r\nflow\r\n")
            f = s.makefile("rb")
            assert [f.readline().rstrip(b"\r\n") for _ in range(3)] == [b"OK"] * 3
        p._bridges[0].flush()  # publish the partial spool batch
        for q in queries:
            q.processAllAvailable()
        delivered = sorted(
            r.body_str for r in spark.table("live_dumper").collect()
        )
    finally:
        for q in queries:
            q.stop()
        p.stop()
    assert delivered == ["flow", "hello", "world"]
