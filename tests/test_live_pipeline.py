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


def test_reference_udp2tcp_example_delivers_over_socket(spark, tmp_path):
    """udp2tcp-config.yml end-to-end with a REAL outbound socket: receiver
    bridge ingests wire records, the default sink writer dispatches on the
    sink's tcp:// bind (sink_head_factory parity) and delivers each body
    \r\n-framed to a live downstream listener."""
    import time

    from test_streaming import _CaptureServer

    srv = _CaptureServer("tcp", ("127.0.0.1", 0))
    yaml_text = open("/root/reference/examples/udp2tcp-config.yml").read()
    p = Pipeline.from_yaml(
        spark,
        yaml_text,
        cli_overrides={
            "actors.udp_rcv.params.bind": "tcp://127.0.0.1:0",
            "actors.tcp_sink.params.bind": f"tcp://127.0.0.1:{srv.addr[1]}",
        },
    )
    queries = []
    try:
        queries = p.run_streaming(checkpoint_dir=str(tmp_path / "ckpt"))
        port = p._bridges[0].port
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(b"one\r\ntwo\r\n")
            f = s.makefile("rb")
            assert [f.readline().rstrip(b"\r\n") for _ in range(2)] == [b"OK"] * 2
        p._bridges[0].flush()
        for q in queries:
            q.processAllAvailable()
        deadline = time.time() + 15
        while time.time() < deadline and srv.data().count(b"\r\n") < 2:
            time.sleep(0.05)
        assert sorted(r for r in srv.data().split(b"\r\n") if r) == [b"one", b"two"]
    finally:
        for q in queries:
            q.stop()
        p.stop()
        srv.close()


def test_pipeline_jsonl_sink_scheme(spark, tmp_path):
    """A YAML pipeline whose sink binds jsonl://<dir> lands its deliveries
    through the custom Python DataSourceStreamWriter: batchId-keyed
    newline-JSON files plus per-batch _SUCCESS manifests, no temp files
    left behind — the sink-head-factory contract extended with an
    engine-native sink scheme."""
    import json
    import os

    out = tmp_path / "jsonl_sink_out"
    yaml_text = open(EXAMPLE).read()
    p = Pipeline.from_yaml(
        spark,
        yaml_text,
        cli_overrides={
            "actors.tcp_rcv.params.bind": "tcp://127.0.0.1:0",
            "actors.dumper.params.bind": f"jsonl://{out}",
        },
    )
    queries = []
    try:
        queries = p.run_streaming(checkpoint_dir=str(tmp_path / "ckpt"))
        port = p._bridges[0].port
        with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
            s.sendall(b"alpha\r\nbeta\r\n")
            f = s.makefile("rb")
            assert [f.readline().rstrip(b"\r\n") for _ in range(2)] == [b"OK"] * 2
        p._bridges[0].flush()
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()
        p.stop()

    names = sorted(os.listdir(out))
    assert any(n.startswith("_SUCCESS-") for n in names)
    assert not any(n.endswith(".tmp") for n in names)
    bodies = []
    for n in names:
        if n.endswith(".jsonl"):
            with open(out / n) as fh:
                bodies += [json.loads(line)["body_str"] for line in fh]
    assert sorted(bodies) == ["alpha", "beta"]
