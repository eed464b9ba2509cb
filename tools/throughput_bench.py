"""Single-node message-throughput benchmarks against the reference's
operational constants (BASELINE.md: the throttler example is configured at
10,000 rps on maxprocs=4 — the only quantitative figure the reference
ships).

Two paths, two JSON lines:

- gcra_stream: N synthetic messages through the EXACT streaming GCRA
  throttler (applyInPandasWithState, per-key state) with availableNow —
  end-to-end Structured Streaming msgs/sec.
- tcp_bridge: M framed messages over the live asyncio TCP bridge with
  per-message wire acks (pipelined writer, reader drains acks), the
  reference receiver's own contract.

Run: python tools/throughput_bench.py [n_stream] [n_tcp]
"""

from __future__ import annotations

import json
import os
import shutil
import socket
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flow_spark.session import get_spark  # noqa: E402


def bench_gcra_stream(n: int) -> dict:
    from flow_spark.streaming.stateful import throttle_stream

    spark = get_spark("throughput-gcra")
    work = tempfile.mkdtemp(prefix="thr_bench_")
    src = os.path.join(work, "src")
    try:
        # 64 throttle keys, ~1k msgs/key/sec arrival pattern
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                # 1 µs spacing = a 1M msg/s arrival pattern
                F.timestamp_micros(
                    F.lit(1_704_067_200_000_000) + F.col("id")
                ).alias("ingest_ts"),
                F.lit(b"x").alias("body"),
                F.lit("x").alias("body_str"),
                F.create_map(
                    F.lit("user"), (F.col("id") % 64).cast("string")
                ).alias("meta"),
            )
            .write.mode("overwrite")
            .parquet(src)
        )
        static = spark.read.parquet(src)
        t0 = time.perf_counter()
        msgs = spark.readStream.schema(static.schema).parquet(src)
        out = throttle_stream(msgs, rps=10_000, key_col="user")
        q = (
            out.writeStream.outputMode("append")
            .format("noop")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        return {
            "metric": "gcra_stream_msgs_per_sec",
            "value": round(n / dt),
            "unit": "msgs/sec",
            "n": n,
            "elapsed_sec": round(dt, 2),
        }
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


def bench_tcp_bridge(n: int) -> dict:
    from flow_spark.sources.bridge import SocketBridge

    work = tempfile.mkdtemp(prefix="tcp_bench_")
    bridge = SocketBridge(spool_dir=work, host="127.0.0.1", port=0).start()
    try:
        payload = b"throughput-probe-message-0123456789\r\n"
        with socket.create_connection(("127.0.0.1", bridge.port)) as s:
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            t0 = time.perf_counter()
            sent = 0
            acked = 0
            s.setblocking(False)
            buf = b""
            chunk = payload * 256
            while acked < n:
                if sent < n:
                    try:
                        s.sendall(chunk)
                        sent += 256
                    except BlockingIOError:
                        pass
                try:
                    data = s.recv(1 << 16)
                    buf += data
                    acked += buf.count(b"\n")
                    buf = buf[buf.rfind(b"\n") + 1 :]
                except BlockingIOError:
                    time.sleep(0.0005)
            dt = time.perf_counter() - t0
        return {
            "metric": "tcp_bridge_acked_msgs_per_sec",
            "value": round(n / dt),
            "unit": "msgs/sec",
            "n": n,
            "elapsed_sec": round(dt, 2),
        }
    finally:
        bridge.stop()
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    n_stream = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_tcp = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    gcra = bench_gcra_stream(n_stream)
    tcp = bench_tcp_bridge(n_tcp)
    print(json.dumps(gcra))
    print(json.dumps(tcp))
    # Tracked artifact: THROUGHPUT.json at the repo root so the numbers are
    # regression-diffable round over round instead of living in prose.
    out_path = os.environ.get(
        "SPARK_GRAFT_THROUGHPUT_OUT",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "THROUGHPUT.json"),
    )
    with open(out_path, "w") as f:
        json.dump({"gcra_stream": gcra, "tcp_bridge": tcp}, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
