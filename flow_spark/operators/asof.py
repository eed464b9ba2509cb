"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no native as-of join (SPARK-22947 stalled); the scalable
implementation is the union+window trick:

    union(left tagged side=1, right tagged side=0)
    -> window PARTITION BY key ORDER BY (ts, side, id)
    -> last(right_value, ignoreNulls=True) over rows UNBOUNDED PRECEDING
    -> keep left rows

Cost: ONE shuffle + sort on (key, ts) — same as a sort-merge join — versus
`applyInPandas` + `pd.merge_asof` per key (Arrow round trip, Python in the
hot path).  At 100 TB the window form also survives skewed keys better
(AQE can split a sort; a single giant pandas group OOMs).

Right-side duplicate timestamps are deduped (latest id wins) so the match
is deterministic — engines disagree on ties otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window as W


def _is_timestamp(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    right_id_col: str | None = None,
    allow_exact_matches: bool = True,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join; returns left columns + matched `value_cols`.

    direction="backward" (default): most recent right row at-or-before the
    left timestamp.  direction="forward": earliest right row at-or-after.
    Same single-shuffle union+window plan either way — only the window
    frame and the tie ordering flip.

    `right_id_col` (if given) breaks right-side timestamp ties
    deterministically: greatest id wins backward (the "latest" row),
    smallest id wins forward (the "next" row) — mirroring how an oracle
    would dedup with ROW_NUMBER ... ORDER BY id DESC/ASC.

    `tolerance_seconds` (pandas merge_asof's knob): a match farther than
    this from the left timestamp is NULLED, not replaced by an older row
    — identical to post-filtering the matched pair, so it adds one
    column to the window pass and zero extra shuffles.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        if not allow_exact_matches:
            raise ValueError("direction='nearest' requires allow_exact_matches")
        if tolerance_seconds is not None:
            raise ValueError("tolerance_seconds unsupported for direction='nearest'")
        return _asof_nearest(left, right, ts_col, by, value_cols, right_id_col)
    if tolerance_seconds is not None:
        # the matched right timestamp rides inside the SAME row-wise match
        # struct as the values (see below), so the gap check validates the
        # exact row that supplied them
        carry_ts = "__asof_ts"
        inner = asof_join(
            left,
            right.withColumn(carry_ts, F.col(ts_col)),
            ts_col,
            by,
            list(value_cols) + [carry_ts],
            right_id_col=right_id_col,
            allow_exact_matches=allow_exact_matches,
            direction=direction,
        )
        # exact integer microseconds for timestamp keys: a double epoch has
        # only ~0.25 us resolution at 2^30-second epochs, so a pair whose
        # true gap is exactly the tolerance boundary could round past it
        # and be NULLed where an engine comparing exact intervals keeps it.
        # Numeric keys subtract in their own type (ints stay exact).
        if _is_timestamp(left, ts_col):
            tol_us = int(round(tolerance_seconds * 1_000_000))
            gap = F.abs(
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.col(f"asof_{carry_ts}"))
            )
            ok = F.col(f"asof_{carry_ts}").isNotNull() & (gap <= F.lit(tol_us))
        else:
            gap = F.abs(F.col(ts_col) - F.col(f"asof_{carry_ts}"))
            ok = F.col(f"asof_{carry_ts}").isNotNull() & (
                gap <= F.lit(tolerance_seconds)
            )
        return inner.select(
            *left.columns,
            *[
                F.when(ok, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
        )
    # Right-side timestamp ties are broken INSIDE the main window ordering
    # instead of a separate ROW_NUMBER dedup pass (r07): ordering right
    # rows by id ASC makes `last()` pick the greatest id backward and
    # `first()` pick the smallest id forward — exactly the row the old
    # (by, ts)-partitioned dedup window kept, minus its Exchange + Sort.
    tie_order: list[Column] = []
    if right_id_col is not None:
        tie_order = [F.asc_nulls_first("__rid")]

    # the right side rides in ONE struct column, picked with ignorenulls as
    # a unit: the match is ROW-wise (merge_asof semantics).  Per-column
    # picks would fill each value column from a DIFFERENT right row when a
    # matched row carries NULL in some value column.
    lcols = left.columns
    rid_cols_l: list[Column] = []
    rid_cols_r: list[Column] = []
    if right_id_col is not None:
        rid_type = right.schema[right_id_col].dataType
        rid_cols_l = [F.lit(None).cast(rid_type).alias("__rid")]
        rid_cols_r = [F.col(right_id_col).alias("__rid")]
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *rid_cols_l,
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
            + ">"
        )
        .alias("__r"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *rid_cols_r,
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r)

    # at equal ts the right row must fall inside the left row's frame iff
    # exact matches are allowed.  Backward frame = [unbounded, current]:
    # right (side 0) sorts first for exact matches.  Forward frame =
    # [current, unbounded]: left (side 1) sorts first for exact matches.
    if direction == "backward":
        side_order = F.asc("__side") if allow_exact_matches else F.desc("__side")
        w = (
            W.partitionBy(by)
            .orderBy(F.col(ts_col).asc(), side_order, *tie_order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        pick = F.last
    else:
        side_order = F.desc("__side") if allow_exact_matches else F.asc("__side")
        w = (
            W.partitionBy(by)
            .orderBy(F.col(ts_col).asc(), side_order, *tie_order)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        pick = F.first
    filled = unioned.select(
        *lcols,
        "__side",
        pick("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__m").getField(c).alias(f"asof_{c}") for c in value_cols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    right_id_col: str | None,
) -> DataFrame:
    """Nearest-direction as-of: closest right row in EITHER direction.

    Both candidate matches come out of ONE shuffle+sort: the same
    union+window pass evaluates the backward frame (last right row at or
    before) and the forward frame (first right row at or after) as two
    frames over one window ordering, then a per-row comparison keeps the
    closer match (exact tie in distance -> the backward/earlier row,
    matching pandas merge_asof's resolution).  Right-side timestamp ties
    dedup to the greatest `right_id_col` (one rule for both directions).
    """
    if right_id_col is not None:
        w_dedup = W.partitionBy(by, ts_col).orderBy(F.desc(right_id_col))
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    carry = list(value_cols) + [ts_col]
    lcols = left.columns
    # one struct per right row, picked as a unit in both frames -> both
    # candidate matches are ROWS, never per-column mixes (see asof_join)
    struct_sql = (
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in carry)
        + ">"
    )
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_sql).alias("__r"),
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r)
    # right rows sort first at equal ts: the backward frame sees an exact
    # match (distance 0), which then beats any forward candidate
    order = [F.col(ts_col).asc(), F.asc("__side")]
    w_b = W.partitionBy(by).orderBy(*order).rowsBetween(W.unboundedPreceding, W.currentRow)
    w_f = W.partitionBy(by).orderBy(*order).rowsBetween(W.currentRow, W.unboundedFollowing)
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w_b).alias("__b"),
        F.first("__r", ignorenulls=True).over(w_f).alias("__f"),
    ).filter(F.col("__side") == 1)
    bwd_ts = F.col("__b").getField(ts_col)
    fwd_ts = F.col("__f").getField(ts_col)
    t = F.col(ts_col)
    # distances in exact integer microseconds for timestamp keys (not
    # double epoch seconds): an exact distance tie must resolve to the
    # backward row on both engines, which double rounding could flip.
    # Numeric keys subtract in their own type.
    if _is_timestamp(left, ts_col):
        b_dist = F.unix_micros(t) - F.unix_micros(bwd_ts)
        f_dist = F.unix_micros(fwd_ts) - F.unix_micros(t)
    else:
        b_dist = t - bwd_ts
        f_dist = fwd_ts - t
    use_backward = fwd_ts.isNull() | (bwd_ts.isNotNull() & (b_dist <= f_dist))
    return filled.select(
        *lcols,
        *[
            F.when(use_backward, F.col("__b").getField(c))
            .otherwise(F.col("__f").getField(c))
            .alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def asof_join_segmented(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    right_id_col: str | None = None,
    segment_minutes: int = 1440,
) -> DataFrame:
    """Backward as-of join with BOUNDED window partitions (skew-safe).

    The plain union+window as-of (`asof_join`) partitions on the key
    alone: one viral key with a billion events is one window partition,
    and a window sort cannot be split by AQE — the one genuine scale
    hazard of the design.  This variant adds the TIME SEGMENT to the
    partition key, bounding every sort by (key, segment_minutes):

    1. per (key, segment), the last right row is aggregated
       (map-side combinable max_by);
    2. a tiny window over the (key, segment) domain — thousands of rows
       per key, not billions — turns those into CARRY-IN rows: the last
       right row from any earlier segment;
    3. the usual union+window runs per (key, segment) with the carry-in
       sorted before all real rows, so a left row early in a segment
       still sees the previous segment's state.

    Semantics are identical to ``asof_join(direction='backward',
    allow_exact_matches=True)`` — proven by the equivalence fuzz in
    tests/test_asof_property.py.  Cost: one extra small aggregate +
    one tiny window versus the unsegmented form; worth it only when a
    key can exceed executor-sort size (the measured crossover is in
    SCALE.md).
    """
    if not _is_timestamp(left, ts_col):
        raise ValueError("segmented as-of requires a timestamp ts_col")
    if right_id_col is not None:
        w_dedup = W.partitionBy(by, ts_col).orderBy(F.desc(right_id_col))
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    seg_us = segment_minutes * 60 * 1_000_000

    def seg_of(c: str):
        return F.floor(F.unix_micros(F.col(c)) / F.lit(seg_us)).cast("long")

    vstruct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    order_key = F.struct(
        F.col(ts_col),
        *([F.col(right_id_col)] if right_id_col is not None else []),
    )
    rseg = (
        right.withColumn("__seg", seg_of(ts_col))
        .groupBy(by, "__seg")
        .agg(F.max_by(vstruct, order_key).alias("__lastr"))
    )
    segs = (
        left.select(F.col(by), seg_of(ts_col).alias("__seg"))
        .unionByName(right.select(F.col(by), seg_of(ts_col).alias("__seg")))
        .distinct()
    )
    w_carry = (
        W.partitionBy(by).orderBy("__seg").rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        segs.join(rseg, [by, "__seg"], "left")
        .withColumn("__carry", F.last("__lastr", ignorenulls=True).over(w_carry))
        .filter(F.col("__carry").isNotNull())
        .select(by, "__seg", "__carry")
    )
    lcols = left.columns
    rtype = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        )
        + ">"
    )
    tagged_l = left.select(
        *lcols,
        seg_of(ts_col).alias("__seg"),
        F.lit(1).alias("__pri"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    tagged_r = right.select(
        *[
            F.col(c)
            if c in (by, ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        seg_of(ts_col).alias("__seg"),
        F.lit(1).alias("__pri"),
        F.lit(0).alias("__side"),
        vstruct.alias("__r"),
    )
    tagged_c = carry.select(
        *[
            F.col(c)
            if c == by
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.col("__seg"),
        F.lit(0).alias("__pri"),
        F.lit(0).alias("__side"),
        F.col("__carry").alias("__r"),
    )
    unioned = tagged_l.unionByName(tagged_r).unionByName(tagged_c)
    w = (
        W.partitionBy(by, "__seg")
        .orderBy(
            F.asc("__pri"), F.col(ts_col).asc_nulls_first(), F.asc("__side")
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__m").getField(c).alias(f"asof_{c}") for c in value_cols],
    )
