"""Socket bridge: real TCP clients -> \r\n framing -> per-message acks ->
spool files -> Spark file stream."""

from __future__ import annotations

import socket

from flow_spark.sources.bridge import SocketBridge, spool_stream


def _send(port: int, payload: bytes, expect_acks: int) -> list[bytes]:
    with socket.create_connection(("127.0.0.1", port), timeout=10) as s:
        s.sendall(payload)
        acks = []
        f = s.makefile("rb")
        for _ in range(expect_acks):
            acks.append(f.readline().rstrip(b"\r\n"))
        return acks


def test_bridge_acks_and_spools(tmp_path):
    bridge = SocketBridge(str(tmp_path / "spool"), flush_every=2).start()
    try:
        acks = _send(bridge.port, b"alpha\r\nbeta\r\ngamma\r\n", expect_acks=3)
        assert acks == [b"OK", b"OK", b"OK"]
    finally:
        bridge.stop()
    spooled = []
    for p in (tmp_path / "spool").iterdir():
        assert not p.name.endswith(".tmp"), "partial file published"
        spooled += p.read_text().splitlines()
    assert sorted(spooled) == ["0\talpha", "1\tbeta", "2\tgamma"]


def test_bridge_silent_mode_no_acks(tmp_path):
    bridge = SocketBridge(str(tmp_path / "spool"), silent=True).start()
    try:
        with socket.create_connection(("127.0.0.1", bridge.port), timeout=10) as s:
            s.sendall(b"quiet\r\n")
            s.settimeout(0.5)
            try:
                data = s.recv(16)
            except TimeoutError:
                data = b""
        assert data == b""
    finally:
        bridge.stop()
    lines = [
        line for p in (tmp_path / "spool").iterdir() for line in p.read_text().splitlines()
    ]
    assert lines == ["0\tquiet"]


def test_bridge_to_spark_stream(spark, tmp_path):
    spool = str(tmp_path / "spool")
    bridge = SocketBridge(spool, flush_every=5).start()
    try:
        msgs = [f"msg-{i}" for i in range(12)]
        payload = ("".join(m + "\r\n" for m in msgs)).encode()
        _send(bridge.port, payload, expect_acks=12)
    finally:
        bridge.stop()  # flushes the partial batch

    df = spool_stream(spark, spool)
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("bridge_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.body_str for r in spark.table("bridge_out").collect())
    assert got == sorted(msgs)
