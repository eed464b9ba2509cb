"""Format readers/writers with scale-correct defaults.

- parquet is the default interchange (columnar, pushdown, pruning).
- csv/json NEVER infer schemas in the engine path (a schema-inference pass
  is a second full scan at 100 TB) — callers pass an explicit schema or a
  sample-derived one from `sample_schema`.
- text reads expose the flow wire format (one opaque record per line,
  \\r\\n tolerated — receiver_tcp.go:177-191 framing).
- kafka/jdbc/avro are gated: the connector/module jars aren't in this image, so the
  helpers raise a clear error unless the classpath provides them.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

READ_FORMATS = ("parquet", "csv", "json", "text", "orc")
WRITE_FORMATS = ("parquet", "csv", "json", "text", "orc", "console", "noop")


def read_any(
    spark: SparkSession,
    fmt: str,
    path: str,
    schema: StructType | str | None = None,
    **options: Any,
) -> DataFrame:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported read format {fmt!r} (have {READ_FORMATS})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} reads require an explicit schema (inference = an extra "
            "full scan at scale); use sample_schema() for ad-hoc work"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    df = reader.options(**{k: str(v) for k, v in options.items()}).format(fmt).load(path)
    if fmt == "text":
        # tolerate \r\n framing (flow's wire records end \r\n)
        df = df.select(F.regexp_replace("value", "\r$", "").alias("value"))
    return df


def sample_schema(
    spark: SparkSession, fmt: str, path: str, sample_rows: int = 1000, **options: Any
) -> StructType:
    """Infer a schema from a bounded sample (ad-hoc/dev only)."""
    reader = spark.read.options(
        **{k: str(v) for k, v in options.items()}, inferSchema="true", header="true"
    )
    return reader.format(fmt).load(path).limit(sample_rows).schema


def write_any(df: DataFrame, fmt: str, path: str | None = None, mode: str = "overwrite", **options: Any) -> None:
    if fmt not in WRITE_FORMATS:
        raise ValueError(f"unsupported write format {fmt!r} (have {WRITE_FORMATS})")
    writer = df.write.mode(mode).options(**{k: str(v) for k, v in options.items()})
    if fmt in ("console",):
        df.show(truncate=False)
        return
    if fmt == "noop":
        writer.format("noop").save()
        return
    if fmt == "csv":
        options.setdefault("header", "true")
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro datasource module is on the classpath.

    The core avro-*.jar ships with Spark, but the DataFrame datasource
    (org.apache.spark:spark-avro) is a separate module not bundled in
    this image.
    """
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True
    except Exception as e:  # noqa: BLE001
        return "AVRO" not in str(e) and "Failed to find data source" not in str(e)


def read_avro(
    spark: SparkSession, path: str, schema: StructType | str | None = None, **options: Any
) -> DataFrame:
    """Avro batch read (row-oriented interchange; no pushdown — prefer
    parquet for analytics).  Requires the spark-avro module."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro module not on the classpath; add "
            "org.apache.spark:spark-avro via spark.jars.packages"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**{k: str(v) for k, v in options.items()}).format("avro").load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite", **options: Any) -> None:
    if not avro_available(df.sparkSession):
        raise NotImplementedError(
            "spark-avro module not on the classpath; add "
            "org.apache.spark:spark-avro via spark.jars.packages"
        )
    df.write.mode(mode).options(**{k: str(v) for k, v in options.items()}).format(
        "avro"
    ).save(path)


def kafka_jar_coordinate(spark: SparkSession) -> str:
    """Exact Maven coordinate of the connector matching THIS runtime.

    Derived from the live Scala binary version + Spark version so the error
    message (and any spark.jars.packages bootstrap) names the one artifact
    that will actually link, e.g.
    ``org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2``.
    """
    scala_full = spark.sparkContext._jvm.scala.util.Properties.versionNumberString()
    scala_bin = ".".join(scala_full.split(".")[:2])
    return f"org.apache.spark:spark-sql-kafka-0-10_{scala_bin}:{spark.version}"


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source: kafka" not in str(e)


def read_kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, **options: Any
) -> DataFrame:
    """Kafka message stream -> canonical message columns.  Requires the
    spark-sql-kafka jar (not bundled in this image)."""
    if not kafka_available(spark):
        raise NotImplementedError(
            f"kafka connector jar not on the classpath; add "
            f"{kafka_jar_coordinate(spark)} via spark.jars.packages, or point "
            f"SPARK_GRAFT_EXTRA_JARS at a local copy of the jar"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .options(**{k: str(v) for k, v in options.items()})
        .load()
    )
    return raw.select(
        F.xxhash64("key", "value", "timestamp").alias("event_id"),
        F.col("timestamp").alias("ingest_ts"),
        F.col("value").alias("body"),
        F.col("value").cast("string").alias("body_str"),
        F.create_map(F.lit("topic"), F.col("topic")).alias("meta"),
    )


def _to_kafka_records(df: DataFrame, topic: str) -> DataFrame:
    """Canonical message columns -> the kafka writer's expected schema.

    key = event_id (string bytes) so replays of the same message land in
    the same partition (ordering per message id); value = raw body.
    Sink-side mapping of the flow sink head (actor/sink.go) onto Kafka's
    at-least-once producer contract.
    """
    cols = [
        F.col("event_id").cast("string").cast("binary").alias("key"),
        F.col("body").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
    ]
    return df.select(*cols)


def write_kafka_batch(
    df: DataFrame, bootstrap: str, topic: str, **options: Any
) -> None:
    """Batch kafka writer (gated on the connector jar, like the reader)."""
    spark = df.sparkSession
    if not kafka_available(spark):
        raise NotImplementedError(
            f"kafka connector jar not on the classpath; add "
            f"{kafka_jar_coordinate(spark)} via spark.jars.packages, or point "
            f"SPARK_GRAFT_EXTRA_JARS at a local copy of the jar"
        )
    (
        _to_kafka_records(df, topic)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .options(**{k: str(v) for k, v in options.items()})
        .save()
    )


def write_kafka_stream(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    checkpoint: str,
    **options: Any,
):
    """Streaming kafka sink: at-least-once with the checkpoint dir as the
    progress log (exactly-once needs an idempotent/transactional consumer
    downstream — same contract the flow TCP sink offers, SURVEY.md §3.2).
    Returns the started StreamingQuery."""
    spark = df.sparkSession
    if not kafka_available(spark):
        raise NotImplementedError(
            f"kafka connector jar not on the classpath; add "
            f"{kafka_jar_coordinate(spark)} via spark.jars.packages, or point "
            f"SPARK_GRAFT_EXTRA_JARS at a local copy of the jar"
        )
    return (
        _to_kafka_records(df, topic)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
        .options(**{k: str(v) for k, v in options.items()})
        .start()
    )


def jdbc_driver_available(spark: SparkSession, driver: str) -> bool:
    """True if the JDBC driver class is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(driver)  # type: ignore[union-attr]
        return True
    except Exception:  # noqa: BLE001 - py4j raises opaque Java errors
        return False


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    **options: Any,
) -> DataFrame:
    """Gated JDBC reader. At scale a JDBC scan MUST be partitioned —
    without partition_column Spark reads through ONE connection on one
    task, so this helper requires the caller to either supply the
    partitioning spec or explicitly pass num_partitions=1 to acknowledge
    a single-connection read."""
    if not jdbc_driver_available(spark, driver):
        raise NotImplementedError(
            f"JDBC driver {driver} not on the classpath; add the driver jar "
            "via spark.jars"
        )
    if partition_column is None and num_partitions != 1:
        raise ValueError(
            "unpartitioned JDBC read: pass partition_column/lower_bound/"
            "upper_bound, or num_partitions=1 to accept a single-connection scan"
        )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.options(**{k: str(v) for k, v in options.items()}).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    driver: str,
    mode: str = "append",
    batch_size: int = 10_000,
    **options: Any,
) -> None:
    """Gated JDBC writer (batched inserts; one connection per partition)."""
    if not jdbc_driver_available(df.sparkSession, driver):
        raise NotImplementedError(
            f"JDBC driver {driver} not on the classpath; add the driver jar "
            "via spark.jars"
        )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .options(**{k: str(v) for k, v in options.items()})
        .mode(mode)
        .save()
    )
