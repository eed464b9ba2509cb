"""Rate limiting with per-row `throttled` verdicts.

Reference: /root/reference/pkg/corev1alpha1/actor/throttler.go — a GCRA
(lock-free CAS on theoretical-arrival-time) admitting `rps` messages/sec
globally or per meta[msgkey] bucket; over-limit -> MsgStatusThrottled.

Spark has no row-level admission primitive (sources pace via
maxOffsetsPerTrigger), so the engine provides two forms:

1. **Batch/windowed form** (this module, oracle-checkable): within each
   (key, 1-second event-time window), admit the first `rps` rows in
   arrival order (ties broken by event_id) and mark the rest `throttled`.
   This is GCRA with the burst capacity quantized to wall-clock seconds —
   the same steady-state admission rate.

2. **Streaming stateful form** (flow_spark/streaming/stateful.py): a
   token-bucket per key via applyInPandasWithState, matching GCRA's
   burst semantics with an injectable clock.

Scale: the window+rank is one shuffle on (key, window) — the same key
cardinality the stateful form would hold in the state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def throttle_batch(
    df: DataFrame,
    rps: int,
    ts_col: str = "ingest_ts",
    key: Column | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """Mark rows beyond `rps` per key per second as throttled.

    key=None reproduces the global bucket (msgkey unset,
    throttler.go:91-96).
    """
    sec = F.date_trunc("second", F.col(ts_col))
    key_expr = key if key is not None else F.lit("")
    w = W.partitionBy(key_expr, sec).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    return df.withColumn(
        "throttle_status",
        F.when(F.row_number().over(w) <= rps, F.lit("admitted")).otherwise(
            F.lit("throttled")
        ),
    )
