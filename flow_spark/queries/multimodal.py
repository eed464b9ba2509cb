"""Multimodal-column queries: binary payload plumbing via mapInPandas.

The decode step is a deterministic fake (no media libs in the container —
operators/multimodal.py documents the stub); what's verified here is the
REAL Spark plumbing: binary columns through Arrow batches, schema contract,
and byte-level feature extraction matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.operators.multimodal import documents_as_assets, extract_features
from flow_spark.queries.registry import register


@register(
    "mm_extract_features",
    category="multimodal",
    doc="Binary feature extraction over payload blobs via mapInPandas "
    "(byte length, first byte, md5 prefix, simulated frame count).",
    oracle="""
        SELECT doc_id AS asset_id,
               octet_length(encode(text))       AS byte_len,
               ascii(substr(text, 1, 1))        AS first_byte,
               substr(md5(text), 1, 8)          AS sha_prefix,
               CAST(ceil(octet_length(encode(text)) / 1000.0) AS INT) AS n_frames
        FROM documents
        WHERE doc_id % 4 = 0
        ORDER BY asset_id
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    assets = documents_as_assets(docs)
    return extract_features(assets).orderBy("asset_id")


@register(
    "mm_payload_partitioning",
    category="multimodal",
    doc="Typed-metadata handling for media tables: route payloads into "
    "size classes and aggregate bytes per class (the partition-sizing "
    "query a media pipeline runs before repartitioning by payload size).",
    oracle="""
        SELECT CASE WHEN octet_length(encode(text)) < 200 THEN 'small'
                    WHEN octet_length(encode(text)) < 400 THEN 'medium'
                    ELSE 'large' END AS size_class,
               COUNT(*) AS n_assets,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
        ORDER BY size_class
    """,
)
def mm_payload_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = documents_as_assets(load_table(spark, sf_dir, "documents"))
    size = F.length("payload")
    return (
        assets.select(
            F.when(size < 200, "small")
            .when(size < 400, "medium")
            .otherwise("large")
            .alias("size_class"),
            size.alias("nbytes"),
        )
        .groupBy("size_class")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("size_class")
    )
