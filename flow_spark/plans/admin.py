"""Admin web app: the reference's operator console re-expressed for Spark.

The reference serves a small HTTP admin mux next to the daemon
(`web/app/http.go:21-50`) with agents registered per path
(`web/app/agent/agent.go:57`):

- ``/``                   index                  (`web/app/agent/index.go:99`)
- ``/config``             effective config       (`web/app/agent/config.go:19`)
- ``/pipeline/describe``  Graphviz of the DAG    (`web/app/agent/graphviz.go:18-40`)
- ``/expvar``             runtime counters       (`web/app/agent/expvar.go:37`)
- ``/pprof/*``            Go runtime profiling   (`web/app/agent/pprof.go`)

Here the same endpoints serve the Spark pipeline: JSON instead of HTML
templates (an operator console is an API first), DOT from
``plans/topology.py::to_dot`` (same payload the reference renders), and
``/pprof`` answers 501 with a pointer to the Spark UI — Go-runtime
profiling has no meaning in a JVM/Python engine, and the Spark UI's
stages/SQL/executors tabs are its counterpart.

Same asyncio-in-a-thread shape as the ingest bridges
(`sources/bridge.py::SocketBridge.start`): not a Spark component, runs
next to the driver.
"""

from __future__ import annotations

import asyncio
import contextlib
import json
import threading
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from flow_spark.plans.builder import Pipeline

_ENDPOINTS = ("/", "/config", "/pipeline/describe", "/expvar", "/streams")


class AdminServer:
    """Serve the admin endpoints for one :class:`Pipeline`."""

    def __init__(self, pipeline: "Pipeline", host: str = "127.0.0.1", port: int = 0):
        self.pipeline = pipeline
        self.host = host
        self.port = port
        self._server: asyncio.AbstractServer | None = None
        self._loop: asyncio.AbstractEventLoop | None = None
        self._thread: threading.Thread | None = None
        self._hits = 0

    # -- responses -----------------------------------------------------------

    def _body(self, path: str) -> tuple[int, str, str]:
        """(status, content-type, body) for a GET path."""
        cfg = self.pipeline.cfg
        if path == "/":
            return 200, "application/json", json.dumps(
                {
                    "engine": "flow_spark",
                    "endpoints": list(_ENDPOINTS),
                    "actors": sorted(cfg.actors),
                }
            )
        if path == "/config":
            return 200, "application/json", json.dumps(
                {
                    "actors": cfg.actors,
                    "connections": {k: list(v) for k, v in cfg.connections.items()},
                    "system": cfg.system,
                }
            )
        if path == "/pipeline/describe":
            return 200, "text/vnd.graphviz", self.pipeline.explain_dot()
        if path == "/expvar":
            spark = self.pipeline.spark
            return 200, "application/json", json.dumps(
                {
                    "app_id": spark.sparkContext.applicationId,
                    "spark_version": spark.version,
                    "n_actors": len(cfg.actors),
                    "n_connections": sum(len(v) for v in cfg.connections.values()),
                    "active_streams": len(spark.streams.active),
                    "admin_hits": self._hits,
                    "actor_metrics": self.pipeline.metrics(),
                }
            )
        if path == "/streams":
            # per-query streaming progress — the operator's first stop
            # when a pipeline stalls: rates, batch duration, state size
            # (fields straight from StreamingQuery.lastProgress)
            spark = self.pipeline.spark
            out = []
            for q in spark.streams.active:
                p = q.lastProgress or {}
                out.append(
                    {
                        "id": str(q.id),
                        "name": q.name,
                        "active": q.isActive,
                        "batch_id": p.get("batchId"),
                        "input_rows_per_sec": p.get("inputRowsPerSecond"),
                        "processed_rows_per_sec": p.get(
                            "processedRowsPerSecond"
                        ),
                        "num_input_rows": p.get("numInputRows"),
                        "duration_ms": p.get("durationMs"),
                        "state": p.get("stateOperators"),
                    }
                )
            return 200, "application/json", json.dumps({"streams": out})
        if path.startswith("/pprof"):
            return 501, "application/json", json.dumps(
                {
                    "error": "pprof is Go-runtime profiling; use the Spark UI "
                    "(stages/SQL/executors) for this engine"
                }
            )
        return 404, "application/json", json.dumps({"error": f"no handler for {path}"})

    # -- server --------------------------------------------------------------

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            request = await reader.readline()
            if not request:
                return
            try:
                method, target, _ = request.decode().split(" ", 2)
            except ValueError:
                return
            while True:  # drain headers
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
            self._hits += 1
            path, _, _query = target.partition("?")
            if method.upper() != "GET":
                status, ctype, body = 405, "application/json", json.dumps(
                    {"error": "GET only"}
                )
            else:
                status, ctype, body = self._body(path)
            phrase = {200: "OK", 404: "Not Found", 405: "Method Not Allowed", 501: "Not Implemented"}[status]
            payload = body.encode()
            writer.write(
                f"HTTP/1.1 {status} {phrase}\r\ncontent-type: {ctype}\r\n"
                f"content-length: {len(payload)}\r\nconnection: close\r\n\r\n".encode()
                + payload
            )
            await writer.drain()
        finally:
            # the loop may already be closed when the server stops with a
            # live connection (GC'd coroutine) — closing is best-effort
            with contextlib.suppress(Exception):
                writer.close()

    def start(self) -> "AdminServer":
        started = threading.Event()

        def run() -> None:
            self._loop = asyncio.new_event_loop()
            asyncio.set_event_loop(self._loop)

            async def boot():
                self._server = await asyncio.start_server(self._handle, self.host, self.port)
                self.port = self._server.sockets[0].getsockname()[1]
                started.set()

            self._loop.run_until_complete(boot())
            try:
                self._loop.run_forever()
            finally:
                if self._server is not None:
                    self._server.close()
                    with contextlib.suppress(Exception):
                        self._loop.run_until_complete(self._server.wait_closed())
                self._loop.close()

        self._thread = threading.Thread(target=run, daemon=True, name="flow-admin")
        self._thread.start()
        if not started.wait(10):
            raise RuntimeError("admin server failed to start")
        return self

    def stop(self) -> None:
        if self._loop is not None:
            with contextlib.suppress(RuntimeError):
                self._loop.call_soon_threadsafe(self._loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=10)
