"""Row-level provenance: stable (source file, row position) lineage.

A 100 TB training-data pipeline must be able to answer "which file and
offset did this example come from?" for audits, dataset cards, and
incremental reprocessing.  Spark's parquet source exposes this for free
through the hidden ``_metadata`` struct — no UDF, no zipWithIndex job,
no monotonically_increasing_id (whose values are partition-dependent and
NOT stable across re-reads).  ``_metadata.row_index`` is the row's
ordinal within its file, identical on every read regardless of
partitioning or task retries, which makes (file_name, row_index) a
durable global key even for tables that lack one.

DuckDB exposes the same pair via ``read_parquet(..., filename=true,
file_row_number=true)``; tests/test_provenance.py proves both engines
agree row-for-row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_with_provenance(
    spark: SparkSession, path: str, fmt: str = "parquet"
) -> DataFrame:
    """Read `path`, attaching prov_file (basename) + prov_pos (row ordinal).

    The _metadata columns are computed by the scan itself (they never
    appear in ReadSchema as data columns), so the provenance costs no
    extra I/O and survives column pruning of the payload.
    """
    df = spark.read.format(fmt).load(path)
    return df.select(
        "*",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "prov_file"
        ),
        F.col("_metadata.row_index").alias("prov_pos"),
    )


def provenance_manifest(df: DataFrame) -> DataFrame:
    """Per-file manifest over a provenance-attached frame: row count and
    the [min, max] position span — the bookkeeping an incremental rerun
    diffs against the previous manifest to find files that grew/changed.
    """
    return (
        df.groupBy("prov_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("prov_pos").alias("first_pos"),
            F.max("prov_pos").alias("last_pos"),
        )
        .orderBy("prov_file")
    )


def stable_example_id(df: DataFrame, out_col: str = "example_id") -> DataFrame:
    """Derive a durable surrogate key from provenance: xxhash64 of
    (file, position).  Unlike monotonically_increasing_id, the value is
    identical across re-reads, repartitionings, and retries — the property
    a resumable labeling/annotation pipeline needs.
    """
    return df.withColumn(
        out_col, F.xxhash64(F.col("prov_file"), F.col("prov_pos"))
    )
