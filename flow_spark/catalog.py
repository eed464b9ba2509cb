"""Fixture-table catalog.

Loads the driver-generated TPC-H-ish parquet tables (TESTDATA.md) and
registers them as temp views.  All reads go through ``spark.read.parquet``
so Catalyst gets predicate pushdown / column pruning / partition pruning
for free; at 100 TB these would be partitioned external tables and the same
code path applies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: dimension tables small enough to broadcast at any scale factor that
#: matters (region/nation are bounded; part/supplier/customer are bounded
#: relative to the fact tables — on a real 100 TB run revisit part/customer).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: per-session DataFrame memo: re-listing the files and re-inferring the
#: schema for every query adds a fixed per-query cost (the dominant
#: overhead at small SF; at 100 TB the listing of a large partitioned
#: table is ALSO worth doing once).  A DataFrame is a lazy plan — reusing
#: it shares the resolved relation + file index across queries while every
#: execution still scans fresh.  Keyed by applicationId so a new session
#: (tests spin several) never sees another session's plans.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table: {name!r} (have {TABLES})")
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    cached = _TABLE_MEMO.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    _TABLE_MEMO[key] = df
    return df


def normalize_events_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Canonical contract: events.ts is TimestampType (UTC). Fixture
    generations have varied — timestamp[ns] (surfaced as nanos-long via
    spark.sql.legacy.parquet.nanosAsLong) and timestamp[us] without tz
    metadata (surfaced as TIMESTAMP_NTZ) — normalize both.  The ONE
    definition, shared by the batch catalog and every streaming reader.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, LongType):
        # integer division: ns magnitudes exceed double's 53-bit mantissa,
        # so (ts / 1000).cast(...) could land one microsecond off
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        # session tz is pinned to UTC (session.py), so this cast is an
        # exact reinterpretation, matching the UTC-naive DuckDB oracle
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view named after itself."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
