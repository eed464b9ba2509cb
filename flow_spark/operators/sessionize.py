"""Batch sessionization: split each key's event stream into sessions on
inactivity gaps.

The classic lag-flag-cumsum form: one window partitioned by the key serves
the lag, the new-session flag, and the running session counter — a SINGLE
shuffle on the key no matter how many sessions emerge, versus the
self-join formulations that shuffle once per pass.  At 100 TB the key
partitioning also co-locates the usual downstream per-session rollup
(groupBy(key, session_seq) reuses the exchange — asserted in
tests/test_plans.py::test_sessionize_single_shuffle).

Streaming twin: `F.session_window` (queries/streaming_windows.py) — this
operator is the batch/backfill form that agrees with it on closed
sessions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from pyspark.sql.types import TimestampNTZType, TimestampType


def tag_sessions(
    df: DataFrame,
    ts_col: str,
    by: str,
    gap: int,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Append a 1-based ``session_seq`` per ``by`` key, starting a new
    session whenever the gap since the previous event exceeds ``gap``.

    ``gap`` is in MICROSECONDS when ``ts_col`` is a timestamp, else in the
    column's own units (any numeric ordering column works — useful for
    property tests and pre-bucketed integer time).  ``order_cols`` breaks
    timestamp ties deterministically (engines disagree on ties otherwise).

    Boundary convention: a gap of EXACTLY ``gap`` stays in-session (split
    on strictly-greater), matching the SQL lag-cumsum idiom.  Spark's
    streaming ``F.session_window`` uses half-open ``[ts, ts+gap)`` windows,
    so an exactly-gap event starts a new session there — the two agree on
    all other inputs (tests/test_sessionize_property.py).
    """
    t = df.schema[ts_col].dataType
    ts: Column = (
        F.unix_micros(ts_col)
        if isinstance(t, (TimestampType, TimestampNTZType))
        else F.col(ts_col).cast("long")
    )
    w = W.partitionBy(by).orderBy(ts_col, *(order_cols or []))
    prev = F.lag(ts).over(w)
    new_sess = F.when(prev.isNull() | ((ts - prev) > gap), 1).otherwise(0)
    return df.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
