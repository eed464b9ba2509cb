"""Queries over the custom Python Data Source (sources/python_datasource).

The source is a pure function of the row index via the portable md5 hash,
so the DuckDB oracle REGENERATES the source's output from range(n) — an
end-to-end proof that a custom Spark source produces exactly the declared
data under partition-parallel, retry-prone execution.  `sf_dir` is unused
(the source is synthetic by nature); the row count is fixed so both sides
agree at any SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.queries.registry import register

_N = 2000

_SQL_H = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _h_sql(prefix: str) -> str:
    return _SQL_H.format(expr=f"'{prefix}' || CAST(i AS VARCHAR)")


@register(
    "pysource_synthetic_events",
    category="source",
    doc="Custom Python Data Source (Spark 4 DataSource API) end-to-end: "
    "spark.read.format('synthetic_events') generates rows on executors "
    "as a pure function of row index (portable md5), and the oracle "
    "REGENERATES the identical rows from range(n) — proving the "
    "source's partition split and retry behavior cannot change the "
    "data.  The engine-extensibility analog of the reference's "
    "receiver factory (receiver_factory.go scheme dispatch).",
    oracle=f"""
        WITH gen AS (
            SELECT i,
                   {_h_sql('u')} % 50 AS user_id,
                   ['view', 'click', 'purchase', 'signup',
                    'error'][CAST({_h_sql('t')} % 5 AS INT) + 1] AS event_type,
                   {_h_sql('v')} % 100000 AS value_cents
            FROM range(0, {_N}) t(i)
        )
        SELECT event_type,
               COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(value_cents) AS BIGINT) AS value_cents_sum
        FROM gen
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def pysource_synthetic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.sources.python_datasource import register as reg

    reg(spark)
    df = spark.read.format("synthetic_events").option("n_rows", _N).load()
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "value_cents_sum"
            ),
        )
        .orderBy("event_type")
    )
