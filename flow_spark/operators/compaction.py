"""Small-file compaction planner: assign input files to output groups of
~target size.

The "small files problem" is the dominant operational tax on a 100 TB
table: a streaming sink or over-parallel writer leaves thousands of
KB-scale files per partition, and every downstream scan pays a footer
read + task per file.  Compaction rewrites them into ~target-size files.

This operator does the PLANNING as a DataFrame computation so it scales to
tables whose file LISTING is itself big data (millions of files): greedy
exclusive-cumsum bin packing per table partition — the same integer-space
mechanic as sequence packing (queries/chunking.py::text_pack_sequences),
deterministic under retries.  The rewrite step is then one
``spark.read.parquet(group_files).repartition(1).write`` per group, or at
real scale a single job reading all groups with a group-keyed
``repartition``.

No oracle query: file metadata is environment-shaped, not fixture data;
behavior is pinned by tests/test_compaction.py against real written files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def plan_compaction(
    files: DataFrame,
    target_bytes: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign each file a compaction ``group`` within its partition.

    ``files`` needs columns ``path`` (string) and ``size`` (long, bytes);
    ``partition_col`` (optional) keeps files of different table partitions
    in different output groups (a compacted file must not mix partitions).

    group = floor(exclusive_cumsum(size) / target): every group's total is
    < target + one file, and a file larger than target sits alone in its
    own group — the greedy packing that never splits a file.
    """
    part = [partition_col] if partition_col else []
    w = W.partitionBy(*part).orderBy(F.desc("size"), "path").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    incl = F.sum("size").over(w)
    excl = (incl - F.col("size")).cast("long")
    return files.select(
        *part,
        "path",
        "size",
        F.floor(excl / F.lit(target_bytes)).cast("long").alias("group"),
    )


def compaction_summary(plan: DataFrame, partition_col: str | None = None) -> DataFrame:
    """Per-group totals for the plan: files in, bytes in, one file out."""
    part = [partition_col] if partition_col else []
    return (
        plan.groupBy(*part, "group")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("size").alias("total_bytes"),
        )
        .orderBy(*part, "group")
    )
