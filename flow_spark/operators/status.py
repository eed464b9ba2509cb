"""Delivery-status algebra: the composite fold.

Reference: /root/reference/pkg/corev1alpha1/actor/replicator.go:123-146 —
a fan-out node collects N per-copy statuses and folds them into one:

    all Done                       -> Done
    any Done/PartialSend (mixed)   -> PartialSend
    none Done, any TimedOut        -> TimedOut
    otherwise                      -> Failed

and the buffer fold (actor/buffer.go:60-82): first Done/PartialSend wins,
else retry up to 16 attempts -> Failed.

Spark design (SURVEY.md §2.3): delivery results are DATA — each sink emits
(event_id, sink, status, ts) rows; the fold is a groupBy aggregation, which
makes the whole contract an oracle-checkable query instead of an ack chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: buffer retry constants — actor/buffer.go:11-12
BUF_MAX_ATTEMPTS = 16
BUF_CAPACITY = 65536


def composite_fold(delivery_results: DataFrame) -> DataFrame:
    """Fold per-sink delivery statuses into one verdict per message.

    Input schema: (event_id, sink, status, ...), status in
    {done, partial_send, timed_out, failed}.
    """
    agg = delivery_results.groupBy("event_id").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("status") == "done", 1).otherwise(0)).alias("n_done"),
        F.sum(F.when(F.col("status") == "partial_send", 1).otherwise(0)).alias("n_partial"),
        F.sum(F.when(F.col("status") == "timed_out", 1).otherwise(0)).alias("n_timeout"),
    )
    return agg.select(
        "event_id",
        F.when(F.col("n_done") == F.col("n"), F.lit("done"))
        .when((F.col("n_done") > 0) | (F.col("n_partial") > 0), F.lit("partial_send"))
        .when(F.col("n_timeout") > 0, F.lit("timed_out"))
        .otherwise(F.lit("failed"))
        .alias("status"),
    )


def buffer_outcome(df: DataFrame, fail_rounds_col: str) -> DataFrame:
    """Bounded-retry outcome: a message that would fail `fail_rounds` times
    succeeds on attempt fail_rounds+1 if that's within the 16-attempt cap,
    else is failed (buffer.go:60-82 semantics, deterministic form).

    Adds `attempts` (attempts actually consumed) and `buf_status`.
    """
    fail_rounds = F.col(fail_rounds_col)
    succeeds = fail_rounds < BUF_MAX_ATTEMPTS
    return df.withColumn(
        "attempts",
        F.when(succeeds, fail_rounds + 1).otherwise(F.lit(BUF_MAX_ATTEMPTS)).cast("int"),
    ).withColumn(
        "buf_status", F.when(succeeds, F.lit("done")).otherwise(F.lit("failed"))
    )
