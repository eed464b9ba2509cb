"""Structural invariants for the graph analytics family (queries/graph.py).

Parity with the DuckDB oracle is checked by the sweep; these tests pin the
graph-theoretic properties parity alone wouldn't explain.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flow_spark.queries.registry import get

SF = "/root/testdata/sf0.001"


def test_pagerank_mass_and_domain(spark):
    out = get("graph_pagerank").builder(spark, SF).collect()
    n_nodes = len(out)
    assert n_nodes > 0
    ranks = [r.microrank for r in out]
    # teleport term bounds every rank below; damping bounds total mass:
    # sum(rank) stays within [0.15n, ~1.0n] micro-units (floor-division
    # losses only ever shrink mass, never grow it)
    assert all(r >= 150_000 for r in ranks)
    assert sum(ranks) <= n_nodes * 1_000_000
    # bipartite domain: even ids are parts, odd are suppliers; both present
    assert {r.node % 2 for r in out} == {0, 1}


def test_pagerank_deterministic_across_partitionings(spark):
    q = get("graph_pagerank")
    a = q.builder(spark, SF).collect()
    b = (
        q.builder(spark, SF)
        .repartition(7)
        .sort("node")
        .collect()
    )
    assert [(r.node, r.microrank) for r in a] == sorted(
        (r.node, r.microrank) for r in b
    )


def test_triangle_corner_mass_divisible_by_three(spark):
    out = get("graph_triangle_count").builder(spark, SF)
    total = out.agg(F.sum("n_triangles").alias("s")).collect()[0].s
    # every triangle credits exactly 3 corners
    assert total is None or total % 3 == 0


def test_degree_histogram_accounts_every_node(spark):
    hist = get("graph_degree_histogram").builder(spark, SF)
    n_from_hist = hist.agg(F.sum("n_nodes").alias("s")).collect()[0].s
    from flow_spark.queries.graph import _bipartite_edges

    n_nodes = (
        _bipartite_edges(spark, SF).select("src").distinct().count()
    )
    assert n_from_hist == n_nodes
    # bipartite double-count check: sum(degree * n_nodes) == |E| (directed)
    mass = hist.select(
        F.sum(F.col("degree") * F.col("n_nodes")).alias("m")
    ).collect()[0].m
    assert mass == _bipartite_edges(spark, SF).count()


def test_pagerank_survives_task_retry(spark):
    """Integer-exact PageRank must return identical microranks when a task
    fails transiently mid-iteration and retries — the determinism claim
    that justifies the scaled-integer formulation (a float PageRank's
    re-summed partials could differ in the last ulps).  Runs in its own
    interpreter: local mode only grants retries via local[N, maxFailures].
    """
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import pandas as pd
        from pyspark import TaskContext
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        import sys
        sys.path.insert(0, "/root/repo")
        from flow_spark.queries.registry import get

        spark = (SparkSession.builder.master("local[4, 2]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .config("spark.sql.legacy.parquet.nanosAsLong", "true")
                 .config("spark.ui.enabled", "false").getOrCreate())

        q = get("graph_pagerank")
        clean = sorted((r.node, r.microrank)
                       for r in q.builder(spark, "/root/testdata/sf0.001").collect())

        @pandas_udf("long")
        def flaky_identity(v):
            ctx = TaskContext.get()
            if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
                raise RuntimeError("injected transient failure")
            return pd.Series(v)

        flaky = q.builder(spark, "/root/testdata/sf0.001").withColumn(
            "microrank", flaky_identity(F.col("microrank")))
        got = sorted((r.node, r.microrank) for r in flaky.collect())
        assert got == clean, (got[:3], clean[:3])
        print("PAGERANK_RETRY_OK")
        spark.stop()
        """
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert "PAGERANK_RETRY_OK" in out.stdout, out.stderr[-2000:]
