"""Pipeline builder tests: YAML parsing, strict validation, DAG errors,
batch execution over the events fixture, delivery-status contract.

Mirrors the reference's examples (http2stdout, replicate-to-2-sinks,
throttled relay — /root/reference/examples/*.yml) and error paths
(pipeline.go:136-141 unknown peer, topology.go cycle, cast/types.go:94-101
unknown keys)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from flow_spark.plans.builder import Pipeline, register_plugin
from flow_spark.plans.config import ConfigError, load_pipeline_config
from flow_spark.plans.topology import to_dot, validate_dag

RELAY = """
actors:
  in:
    module: core.receiver
    params:
      bind: events://{sf}
  out:
    module: core.sink
    params:
      bind: memory://out
pipeline:
  in:
    connect: [out]
  out:
"""

ROUTED = """
actors:
  in:
    module: core.receiver
    params:
      bind: events://{sf}
  rtr:
    module: core.router
  click:
    module: core.sink
  purchase:
    module: core.sink
pipeline:
  in:
    connect: [rtr]
  rtr:
    connect: [click, purchase]
  click:
  purchase:
"""

REPLICATED = """
actors:
  in:
    module: core.receiver
    params:
      bind: events://{sf}
  rep:
    module: core.replicator
    params:
      mode: each
  s1:
    module: core.sink
  s2:
    module: core.sink
pipeline:
  in:
    connect: [rep]
  rep:
    connect: [s1, s2]
  s1:
  s2:
"""

THROTTLED = """
actors:
  in:
    module: core.receiver
    params:
      bind: memory://burst
  thr:
    module: core.throttler
    params:
      rps: 1
      msgkey: user
  out:
    module: core.sink
pipeline:
  in:
    connect: [thr]
  thr:
    connect: [out]
  out:
"""


def test_relay_end_to_end(spark, sf_dir):
    p = Pipeline.from_yaml(spark, RELAY.format(sf=sf_dir))
    res = p.run()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert res.sinks["out"].count() == n_events
    dlv = res.delivery.groupBy("status").count().collect()
    assert {r.status: r["count"] for r in dlv} == {"done": n_events}


def test_router_pipeline_splits_and_marks_unroutable(spark, sf_dir):
    p = Pipeline.from_yaml(spark, ROUTED.format(sf=sf_dir))
    res = p.run()
    clicks = res.sinks["click"]
    assert clicks.filter(F.col("meta").getItem("sendto") != "click").count() == 0
    statuses = {
        r.status: r["count"]
        for r in res.delivery.groupBy("status").count().collect()
    }
    assert statuses["unroutable"] > 0  # view/error/signup events
    assert statuses["done"] == clicks.count() + res.sinks["purchase"].count()


def test_replicator_each_delivers_to_both_sinks(spark, sf_dir):
    p = Pipeline.from_yaml(spark, REPLICATED.format(sf=sf_dir))
    res = p.run()
    n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert res.sinks["s1"].count() == n
    assert res.sinks["s2"].count() == n
    # composite fold over the delivery results: every message done on both
    from flow_spark.operators.status import composite_fold

    fold = composite_fold(res.delivery)
    assert fold.filter(F.col("status") != "done").count() == 0


def test_throttled_pipeline_emits_throttled_status(spark, sf_dir):
    # burst: 5 messages from one user inside the same second -> rps=1
    # admits exactly one per second (events spread over a month never
    # trigger per-second limits, so the burst is crafted)
    rows = [
        (i, "2024-01-01 00:00:00.%03d" % i, b"x", "x", {"sendto": "a", "user": "u1"})
        for i in range(5)
    ]
    burst = spark.createDataFrame(
        rows, "event_id long, ingest_ts string, body binary, body_str string, meta map<string,string>"
    ).withColumn("ingest_ts", F.col("ingest_ts").cast("timestamp"))
    p = Pipeline.from_yaml(spark, THROTTLED)
    res = p.run(inputs={"burst": burst})
    statuses = {
        r.status: r["count"]
        for r in res.delivery.groupBy("status").count().collect()
    }
    assert statuses == {"done": 1, "throttled": 4}


def test_plugin_actor(spark, sf_dir):
    @register_plugin("upper_body")
    def upper_body(df, params):
        return df.withColumn("body_str", F.upper("body_str"))

    yaml_text = RELAY.format(sf=sf_dir).replace(
        "connect: [out]", "connect: [up]"
    ) + """
  up:
    connect: [out]
"""
    yaml_text = yaml_text.replace(
        "actors:",
        """actors:
  up:
    module: plugin.upper_body
""",
    )
    p = Pipeline.from_yaml(spark, yaml_text)
    res = p.run()
    row = res.sinks["out"].select("body_str").first()
    assert row.body_str == row.body_str.upper()


# ---- error paths -----------------------------------------------------------


def test_unknown_peer_rejected(spark):
    bad = """
actors:
  a:
    module: core.receiver
    params: {bind: memory://x}
pipeline:
  a:
    connect: [ghost]
"""
    with pytest.raises(ConfigError, match="unknown peer"):
        Pipeline.from_yaml(spark, bad)


def test_cycle_rejected():
    bad = """
actors:
  a:
    module: core.mux
  b:
    module: core.mux
pipeline:
  a:
    connect: [b]
  b:
    connect: [a]
"""
    with pytest.raises(ConfigError, match="cycle"):
        validate_dag(load_pipeline_config(bad))


def test_unknown_actor_key_rejected():
    bad = """
actors:
  a:
    module: core.receiver
    prams: {bind: memory://x}
pipeline:
  a:
"""
    with pytest.raises(ConfigError, match="unknown keys"):
        load_pipeline_config(bad)


def test_unknown_module_rejected(spark, sf_dir):
    bad = RELAY.format(sf=sf_dir).replace("core.sink", "core.telepath")
    with pytest.raises(ConfigError, match="unknown module"):
        Pipeline.from_yaml(spark, bad).run()


def test_ncopy_mode_rejected(spark, sf_dir):
    bad = REPLICATED.format(sf=sf_dir).replace("mode: each", "mode: ncopy")
    with pytest.raises(ConfigError, match="ncopy"):
        Pipeline.from_yaml(spark, bad).run()


def test_env_and_cli_override_precedence(monkeypatch):
    monkeypatch.setenv("FLOW_SYSTEM_MAXPROCS", "4")
    cfg = load_pipeline_config(
        """
actors:
  a:
    module: core.receiver
pipeline:
  a:
""",
        cli_overrides={"system.maxprocs": 8},
    )
    assert cfg.system["maxprocs"] == 8  # cli(30) beats env(10)
    cfg2 = load_pipeline_config(
        "actors:\n  a:\n    module: core.receiver\npipeline:\n  a:\n"
    )
    assert cfg2.system["maxprocs"] == 4  # env beats default


def test_dot_explain(spark, sf_dir):
    p = Pipeline.from_yaml(spark, ROUTED.format(sf=sf_dir))
    dot = p.explain_dot()
    assert dot.startswith("digraph pipeline {")
    assert '"rtr" -> "click";' in dot
