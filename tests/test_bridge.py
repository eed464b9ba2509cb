"""Socket bridge: real TCP clients -> \r\n framing -> per-message acks ->
spool files -> Spark file stream."""

from __future__ import annotations

import socket

import pytest

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


def test_http_bridge_post_to_stream(spark, tmp_path):
    import urllib.request

    from flow_spark.sources.bridge import HttpBridge, http_spool_stream

    spool = str(tmp_path / "hspool")
    bridge = HttpBridge(spool, flush_every=10).start()
    try:
        for i, (body, q) in enumerate(
            [("payload-a", "sendto=click&user=7"), ("payload-b", ""), ("tab\tbody", "k=v")]
        ):
            url = f"http://127.0.0.1:{bridge.port}/v1alpha1" + (f"?{q}" if q else "")
            req = urllib.request.Request(url, data=body.encode(), method="POST")
            with urllib.request.urlopen(req, timeout=10) as resp:
                assert resp.status == 200
    finally:
        bridge.stop()

    df = http_spool_stream(spark, spool)
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName("http_out")
        .option("checkpointLocation", str(tmp_path / "hckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.event_id: r for r in spark.table("http_out").collect()}
    assert rows[0].body_str == "payload-a"
    assert dict(rows[0].meta) == {"sendto": "click", "user": "7"}
    assert rows[1].body_str == "payload-b" and dict(rows[1].meta) == {}
    assert rows[2].body_str == "tab\tbody" and dict(rows[2].meta) == {"k": "v"}


def test_http_bridge_rejects_get(tmp_path):
    import urllib.error
    import urllib.request

    from flow_spark.sources.bridge import HttpBridge

    bridge = HttpBridge(str(tmp_path / "hspool2")).start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"http://127.0.0.1:{bridge.port}/v1alpha1", timeout=10)
        assert e.value.code == 405
    finally:
        bridge.stop()


def test_unix_bridge_acks_and_spools(tmp_path):
    from flow_spark.sources.bridge import UnixBridge

    sock = str(tmp_path / "flow.sock")
    # pre-create a stale socket file: the bridge must rebind over it
    open(sock, "w").close()
    bridge = UnixBridge(str(tmp_path / "uspool"), sock_path=sock).start()
    try:
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(sock)
            s.sendall(b"via-unix\r\nsecond\r\n")
            f = s.makefile("rb")
            assert [f.readline().rstrip(b"\r\n") for _ in range(2)] == [b"OK", b"OK"]
    finally:
        bridge.stop()
    lines = sorted(
        line
        for p in (tmp_path / "uspool").iterdir()
        for line in p.read_text().splitlines()
    )
    assert lines == ["0\tvia-unix", "1\tsecond"]
