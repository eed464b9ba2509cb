"""Bucketed tables: the shuffle-free big-big join path.

At 100 TB the lineitem-orders join is two fact tables; a sort-merge join
shuffles BOTH per query.  Writing each bucketed by the join key
(`bucketBy(N, key)` + `sortBy`) pins rows to hash buckets at write time,
so every later join/aggregation on that key reads co-located buckets and
Catalyst elides the Exchange entirely (verified in tests/test_bucketing.py
by asserting the plan has no shuffle).  This trades one write-time shuffle
for every read-time shuffle thereafter — the right trade for
repeatedly-joined fact tables.

Bucket count guidance: buckets are the unit of join parallelism and must
match between the two sides; pick ~(table_size / 256 MB) at the target
scale, and keep it a multiple of the cluster's executor-core count so no
core idles.  Spark bucketing requires the session catalog (`saveAsTable`),
not path-based writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    keys = [key] if isinstance(key, str) else key
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — planner elides
    the Exchange on both sides (and the Sort too, if sortBy matched)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
