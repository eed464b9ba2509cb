"""flow_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of awesome-flow/flow, re-expressed Spark-first.

The reference (/root/reference, awesome-flow/flow) is a Go message-pipeline
framework: Message = (body bytes, meta map, delivery status), pipelines are
YAML DAGs of actors (receivers -> links -> sinks).  This engine preserves the
*semantics* (what each operator computes, its config surface, its delivery
status contract) on top of Spark DataFrame / SQL / Structured Streaming:

- ``flow_spark.session``   — SparkSession factory tuned for the harness
- ``flow_spark.catalog``   — fixture-table loading (TESTDATA.md parquet)
- ``flow_spark.operators`` — routing / replication / throttling / codecs /
                             dedup / similarity / text analysis
- ``flow_spark.plans``     — YAML pipeline DAG -> DataFrame graph builder
- ``flow_spark.streaming`` — watermarks, windows, stateful ops
- ``flow_spark.queries``   — the declared query inventory (SURVEY.md §2)
                             with DuckDB oracle SQL per query
"""

__version__ = "0.1.0"
