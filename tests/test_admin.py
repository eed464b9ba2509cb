"""Admin web app: every reference endpoint answers with live pipeline
state (web/app/http.go + web/app/agent/* analog).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from flow_spark.plans.builder import Pipeline

YAML = """
actors:
  gen:
    module: core.receiver
    params: {bind: "memory://fixture"}
  split:
    module: core.replicator
    params: {mode: each}
  out_a:
    module: core.sink
    params: {target: "null://"}
  out_b:
    module: core.sink
    params: {target: "null://"}
pipeline:
  gen:
    connect: [split]
  split:
    connect: [out_a, out_b]
"""


@pytest.fixture()
def admin(spark):
    ppl = Pipeline.from_yaml(spark, YAML)
    srv = ppl.serve_admin()
    yield srv
    ppl.stop()


def _get(srv, path):
    return urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=10)


def test_index_lists_endpoints_and_actors(admin):
    body = json.load(_get(admin, "/"))
    assert set(body["endpoints"]) >= {"/", "/config", "/pipeline/describe", "/expvar"}
    assert body["actors"] == ["gen", "out_a", "out_b", "split"]


def test_config_roundtrips_pipeline(admin):
    body = json.load(_get(admin, "/config"))
    assert body["actors"]["split"]["module"] == "core.replicator"
    assert sorted(body["connections"]["split"]) == ["out_a", "out_b"]


def test_describe_serves_dot(admin):
    resp = _get(admin, "/pipeline/describe")
    assert resp.headers["content-type"] == "text/vnd.graphviz"
    dot = resp.read().decode()
    assert "digraph" in dot and '"split" -> "out_a"' in dot


def test_expvar_reports_runtime(admin, spark):
    body = json.load(_get(admin, "/expvar"))
    assert body["app_id"] == spark.sparkContext.applicationId
    assert body["n_actors"] == 4
    assert body["n_connections"] == 3
    assert body["admin_hits"] >= 1


def test_pprof_points_at_spark_ui(admin):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(admin, "/pprof/heap")
    assert ei.value.code == 501
    assert "Spark UI" in json.loads(ei.value.read())["error"]


def test_unknown_path_404s_and_post_405s(admin):
    with pytest.raises(urllib.error.HTTPError) as e404:
        _get(admin, "/nope")
    assert e404.value.code == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{admin.port}/config", data=b"x", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as e405:
        urllib.request.urlopen(req, timeout=10)
    assert e405.value.code == 405


def test_expvar_actor_metrics_after_run(spark, sf_dir):
    """Per-actor observe() counters: empty before any action, populated
    with true row counts once the pipeline's frames execute — the counts
    ride the existing job as accumulators (no extra scan)."""
    import json
    import urllib.request

    from tests.test_pipeline_builder import RELAY

    from flow_spark.plans.builder import Pipeline

    pipe = Pipeline.from_yaml(spark, RELAY.format(sf=sf_dir))
    res = pipe.run()
    srv = pipe.serve_admin()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/expvar") as r:
            before = json.loads(r.read())
        assert before["actor_metrics"] == {}  # nothing executed yet

        n = res.sinks["out"].count()  # drive the sink frame
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/expvar") as r:
            after = json.loads(r.read())
        got = after["actor_metrics"]
        assert got, "observed metrics missing after execution"
        assert all(m["rows"] >= n for m in got.values())
    finally:
        pipe.stop()


def test_streams_reports_live_query_progress(admin, spark, tmp_path):
    """/streams lists active streaming queries with their lastProgress
    rates — the console's observability hook for a stalled pipeline."""
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .load()
        .writeStream.format("memory")
        .queryName("admin_probe_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        seen = None
        while time.time() < deadline:
            body = json.load(_get(admin, "/streams"))
            seen = [s for s in body["streams"] if s["name"] == "admin_probe_stream"]
            if seen and seen[0]["batch_id"] is not None:
                break
            time.sleep(0.5)
        assert seen and seen[0]["active"]
        assert seen[0]["batch_id"] is not None  # progress is live
    finally:
        q.stop()
