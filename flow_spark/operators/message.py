"""The canonical message stream: flow's Message re-expressed as a DataFrame.

Reference: /root/reference/pkg/corev1alpha1/message.go:39-45 — a Message is
(body []byte, meta map, status enum, ack channel).  Spark mapping
(SURVEY.md §1.1): a fixed StructType

    event_id   long         -- message identity (replaces the ack channel)
    ingest_ts  timestamp    -- source-assigned arrival time
    body       binary       -- opaque payload
    body_str   string       -- derived text view for text ops
    meta       map<string,string>

Delivery status is NOT carried state — sinks emit a delivery-result
DataFrame (event_id, sink, status, ts) and fan-out nodes fold it
(see operators/status.py), mirroring message.go:10-33's status enum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: delivery status enum — /root/reference/pkg/corev1alpha1/message.go:10-33
STATUSES = (
    "new",
    "done",
    "partial_send",
    "invalid",
    "failed",
    "timed_out",
    "unroutable",
    "throttled",
)


def events_to_messages(events: DataFrame) -> DataFrame:
    """Canonicalize the `events` fixture into the message schema.

    ``event_type`` plays the router key (meta["sendto"],
    actor/router.go:67); ``props``/``user_id`` become metadata; the
    serialized row is the opaque body.
    """
    body_str = F.concat_ws(
        " ",
        F.col("event_type"),
        F.col("value").cast("string"),
        F.col("props"),
    )
    return events.select(
        F.col("event_id"),
        F.col("ts").alias("ingest_ts"),
        body_str.cast("binary").alias("body"),
        body_str.alias("body_str"),
        F.create_map(
            F.lit("sendto"), F.col("event_type"),
            F.lit("user"), F.col("user_id").cast("string"),
            F.lit("props"), F.col("props"),
        ).alias("meta"),
    )
