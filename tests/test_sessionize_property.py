"""Property test: tag_sessions must agree with an independent pandas
reference (sort → diff → cumsum per key) on random inputs — duplicate
timestamps, single-event sessions, empty keys, gap boundary (strictly
greater starts a new session, exactly-gap does not).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flow_spark.operators.sessionize import tag_sessions

row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=40),  # ts
)


def reference(rows, gap):
    df = pd.DataFrame(rows, columns=["k", "ts"]).assign(rid=lambda d: range(len(d)))
    df = df.sort_values(["k", "ts", "rid"])
    out = {}
    for k, g in df.groupby("k"):
        new = (g.ts.diff().isna()) | (g.ts.diff() > gap)
        seq = new.astype(int).cumsum()
        for rid, s in zip(g.rid, seq):
            out[rid] = (k, int(s))
    return out


@pytest.mark.slow
@given(rows=st.lists(row, min_size=1, max_size=12), gap=st.integers(min_value=1, max_value=10))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tag_sessions_matches_pandas(spark, rows, gap):
    df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], "k int, ts int, rid int"
    )
    got = {
        r.rid: (r.k, r.session_seq)
        for r in tag_sessions(df, ts_col="ts", by="k", gap=gap, order_cols=["rid"]).collect()
    }
    assert got == reference(rows, gap)


def test_exactly_gap_is_same_session(spark):
    df = spark.createDataFrame([(1, 0, 0), (1, 5, 1), (1, 11, 2)], "k int, ts int, rid int")
    out = {r.rid: r.session_seq for r in tag_sessions(df, "ts", "k", gap=5, order_cols=["rid"]).collect()}
    # 0 -> 5 is exactly the gap (same session); 5 -> 11 exceeds it
    assert out == {0: 1, 1: 1, 2: 2}


def test_tag_sessions_agrees_with_session_window(spark):
    """Batch sessionize and streaming F.session_window produce the same
    closed sessions (away from the exactly-gap boundary, where the two
    differ by convention: tag_sessions keeps diff == gap in-session,
    session_window's half-open [ts, ts+gap) starts a new one)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(3):
        t = base + dt.timedelta(minutes=u)
        for burst in range(3):
            for i in range(burst + 1):
                rows.append((u, t))
                t += dt.timedelta(seconds=70)
            t += dt.timedelta(minutes=11)  # > 10 min gap -> new session
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")

    from flow_spark.operators.sessionize import tag_sessions

    gap_us = 10 * 60 * 1_000_000
    a = (
        tag_sessions(df, "ts", "user_id", gap=gap_us)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("start"), F.count("*").alias("n"))
        .select("user_id", "start", "n")
    )
    b = (
        df.groupBy(F.session_window("ts", "10 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("user_id", F.col("sw.start").alias("start"), "n")
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
