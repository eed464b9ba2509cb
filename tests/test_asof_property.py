"""Property test: the union+window as-of join must agree with pandas
merge_asof (an independent reference implementation) on random inputs —
keys, duplicate timestamps, empty sides, unmatched rows.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flow_spark.operators.asof import asof_join

row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=50),  # ts
    # value may be NULL: the match must stay ROW-wise (a matched right row
    # with a NULL value yields NULL, never an older row's value)
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
)


def reference(left_rows, right_rows, allow_exact, direction="backward"):
    lp = pd.DataFrame(left_rows, columns=["k", "ts", "v"]).assign(
        lid=lambda d: range(len(d))
    )
    if not right_rows:
        return {(r.k, r.ts, r.lid): None for r in lp.itertuples()}
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).assign(
        rid=lambda d: range(len(d))
    )
    # same tie rule as the operator: latest rid wins per (k, ts) backward,
    # earliest rid wins forward
    rp = (
        rp.sort_values("rid")
        .drop_duplicates(["k", "ts"], keep="last" if direction == "backward" else "first")
        .sort_values(["ts", "rid"])
    )
    merged = pd.merge_asof(
        lp.sort_values(["ts", "lid"]),
        rp.rename(columns={"v": "rv"})[["k", "ts", "rv"]],
        on="ts",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
    )
    return {
        (r.k, r.ts, r.lid): (None if pd.isna(r.rv) else int(r.rv))
        for r in merged.itertuples()
    }


@pytest.mark.slow
@given(
    left=st.lists(row, min_size=0, max_size=8),
    right=st.lists(row, min_size=0, max_size=8),
    allow_exact=st.booleans(),
    direction=st.sampled_from(["backward", "forward"]),
)
@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_merge_asof(spark, left, right, allow_exact, direction):
    if not left:
        return
    lp = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)], "k int, ts int, v int, lid int"
    )
    rp = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(right)],
        "k int, ts int, v int, rid int",
    ) if right else spark.createDataFrame([], "k int, ts int, v int, rid int")
    out = asof_join(
        lp,
        rp,
        ts_col="ts",
        by="k",
        value_cols=["v"],
        right_id_col="rid",
        allow_exact_matches=allow_exact,
        direction=direction,
    ).collect()
    got = {(r.k, r.ts, r.lid): r.asof_v for r in out}
    assert got == reference(left, right, allow_exact, direction)


def _reference_nearest(left_rows, right_rows):
    """Independent O(n^2) reference: closest right row either direction,
    distance tie -> backward (earlier), right (k, ts) ties -> greatest rid."""
    dedup: dict[tuple[int, int], tuple[int, int]] = {}
    for rid, (k, t, v) in enumerate(right_rows):
        if (k, t) not in dedup or rid > dedup[(k, t)][0]:
            dedup[(k, t)] = (rid, v)
    out = {}
    for lid, (k, t, _v) in enumerate(left_rows):
        best = None  # (dist, is_forward, v)
        for (rk, rt), (_rid, rv) in dedup.items():
            if rk != k:
                continue
            cand = (abs(rt - t), rt > t, rv)
            if best is None or cand[:2] < best[:2]:
                best = cand
        out[(k, t, lid)] = None if best is None else best[2]
    return out


@pytest.mark.slow
@given(
    left=st.lists(row, min_size=1, max_size=8),
    right=st.lists(row, min_size=0, max_size=8),
)
@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_nearest_matches_reference(spark, left, right):
    lp = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)], "k int, ts int, v int, lid int"
    )
    rp = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(right)],
        "k int, ts int, v int, rid int",
    ) if right else spark.createDataFrame([], "k int, ts int, v int, rid int")
    out = asof_join(
        lp, rp, ts_col="ts", by="k", value_cols=["v"],
        right_id_col="rid", direction="nearest",
    ).collect()
    got = {(r.k, r.ts, r.lid): r.asof_v for r in out}
    assert got == _reference_nearest(left, right)


def _reference_tolerance(left_rows, right_rows, direction, tol):
    lp = pd.DataFrame(left_rows, columns=["k", "ts", "v"]).assign(
        lid=lambda d: range(len(d))
    )
    if not right_rows:
        return {(r.k, r.ts, r.lid): None for r in lp.itertuples()}
    rp = pd.DataFrame(right_rows, columns=["k", "ts", "v"]).assign(
        rid=lambda d: range(len(d))
    )
    rp = (
        rp.sort_values("rid")
        .drop_duplicates(
            ["k", "ts"], keep="last" if direction == "backward" else "first"
        )
        .sort_values(["ts", "rid"])
    )
    merged = pd.merge_asof(
        lp.sort_values(["ts", "lid"]),
        rp.rename(columns={"v": "rv"})[["k", "ts", "rv"]],
        on="ts",
        by="k",
        direction=direction,
        tolerance=tol,
    )
    return {
        (r.k, r.ts, r.lid): (None if pd.isna(r.rv) else int(r.rv))
        for r in merged.itertuples()
    }


@pytest.mark.slow
@given(
    left=st.lists(row, min_size=1, max_size=8),
    right=st.lists(row, min_size=0, max_size=8),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.integers(min_value=0, max_value=10),
)
@settings(
    max_examples=16,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_tolerance_matches_merge_asof(spark, left, right, direction, tol):
    """tolerance_seconds must null stale matches exactly like pandas
    merge_asof's tolerance — never fall back to an older row."""
    lp = spark.createDataFrame(
        [(k, t, v, i) for i, (k, t, v) in enumerate(left)],
        "k int, ts int, v int, lid int",
    )
    rp = (
        spark.createDataFrame(
            [(k, t, v, i) for i, (k, t, v) in enumerate(right)],
            "k int, ts int, v int, rid int",
        )
        if right
        else spark.createDataFrame([], "k int, ts int, v int, rid int")
    )
    out = asof_join(
        lp,
        rp,
        ts_col="ts",
        by="k",
        value_cols=["v"],
        right_id_col="rid",
        direction=direction,
        tolerance_seconds=tol,
    ).collect()
    got = {(r.k, r.ts, r.lid): r.asof_v for r in out}
    assert got == _reference_tolerance(left, right, direction, tol)


seg_row = st.tuples(
    st.integers(min_value=0, max_value=2),  # key
    st.integers(min_value=0, max_value=600),  # minutes (spans many segments)
    st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left_rows=st.lists(seg_row, max_size=14),
    right_rows=st.lists(seg_row, max_size=14),
)
def test_segmented_asof_equals_plain(spark, left_rows, right_rows):
    """asof_join_segmented must be row-for-row identical to asof_join
    (backward, allow-exact) on arbitrary inputs: duplicate timestamps,
    NULL values, empty sides, rows whose match lives many segments back,
    keys with no right rows at all."""
    import datetime as dt

    from flow_spark.operators.asof import asof_join_segmented

    def mk(rows):
        base = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [
                (k, base + dt.timedelta(minutes=m), v, i)
                for i, (k, m, v) in enumerate(rows)
            ],
            "k int, ts timestamp, v int, rid long",
        )

    if not left_rows:
        return
    left = mk(left_rows).selectExpr("k", "ts", "rid AS lid")
    right = mk(right_rows).selectExpr("k", "ts", "v", "rid AS cid")
    plain = asof_join(
        left, right, ts_col="ts", by="k", value_cols=["v"], right_id_col="cid"
    )
    seg = asof_join_segmented(
        left,
        right,
        ts_col="ts",
        by="k",
        value_cols=["v"],
        right_id_col="cid",
        segment_minutes=60,
    )
    got_plain = sorted((r.k, r.ts, r.lid, r.asof_v) for r in plain.collect())
    got_seg = sorted((r.k, r.ts, r.lid, r.asof_v) for r in seg.collect())
    assert got_seg == got_plain
