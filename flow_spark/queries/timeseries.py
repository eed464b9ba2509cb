"""Time-series gap-filling and forward-fill (hypertable-style companions
to agg_hypertable_rollup).

Scale shape: the grid is generated per group from its own [min, max]
span (`sequence` + `explode` — rows materialize distributed, never on the
driver), the join back to observed buckets is an equi-join on
(user, bucket) co-partitioned with the grid, and the forward fill is one
window per user ordered by bucket — a single shuffle on user_id covers
grid, join, and fill.  DuckDB's `range()` can't take a lateral column
bound, so the oracle uses a constant bound + filter (same rows).

The reference has no time-series operators; north-star engine surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register

_DAY_FMT = "yyyy-MM-dd"


def _user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 10th user: keeps grid output bounded at any SF."""
    return load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)


@register(
    "ts_gap_fill",
    category="timeseries",
    doc="Gap-filling: per user, a dense daily grid spanning the user's "
    "own [first, last] activity day, left-joined to observed daily "
    "counts with zero-fill — days with no events appear as n=0 rows "
    "(the bug this catches: an inner join silently dropping quiet "
    "days). One shuffle on user_id serves span-agg, grid explode, and "
    "the join.",
    oracle="""
        WITH span AS (
            SELECT user_id,
                   date_trunc('day', MIN(ts)) AS lo,
                   date_trunc('day', MAX(ts)) AS hi
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, lo + i * INTERVAL 1 DAY AS bucket
            FROM span CROSS JOIN range(0, 64) t(i)
            WHERE lo + i * INTERVAL 1 DAY <= hi
        ),
        daily AS (
            SELECT user_id, date_trunc('day', ts) AS bucket, COUNT(*) AS cnt
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id, bucket
        )
        SELECT g.user_id,
               strftime(g.bucket, '%Y-%m-%d') AS day,
               COALESCE(d.cnt, 0) AS n
        FROM grid g
        LEFT JOIN daily d ON g.user_id = d.user_id AND g.bucket = d.bucket
        ORDER BY g.user_id, day
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _user_events(spark, sf_dir)
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("bucket"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        grid.join(daily, ["user_id", "bucket"], "left_outer")
        .select(
            "user_id",
            F.date_format("bucket", _DAY_FMT).alias("day"),
            F.coalesce("cnt", F.lit(0)).alias("n"),
        )
        .orderBy("user_id", "day")
    )


@register(
    "ts_forward_fill",
    category="timeseries",
    doc="Forward fill (LOCF) over the gap-filled grid: per user, the "
    "daily value total in exact cents, with quiet days carrying the "
    "last observed day's total via last_value(IGNORE NULLS) over an "
    "unbounded-preceding row frame — the standard Spark ffill idiom. "
    "All values are exact integers so the fill is engine-agnostic. "
    "Same single user_id shuffle as ts_gap_fill.",
    oracle="""
        WITH span AS (
            SELECT user_id,
                   date_trunc('day', MIN(ts)) AS lo,
                   date_trunc('day', MAX(ts)) AS hi
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, lo + i * INTERVAL 1 DAY AS bucket
            FROM span CROSS JOIN range(0, 64) t(i)
            WHERE lo + i * INTERVAL 1 DAY <= hi
        ),
        daily AS (
            SELECT user_id, date_trunc('day', ts) AS bucket,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS BIGINT) AS day_cents
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id, bucket
        )
        SELECT user_id, day,
               last_value(day_cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_cents
        FROM (
            SELECT g.user_id, strftime(g.bucket, '%Y-%m-%d') AS day, d.day_cents
            FROM grid g
            LEFT JOIN daily d ON g.user_id = d.user_id AND g.bucket = d.bucket
        )
        ORDER BY user_id, day
    """,
)
def ts_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _user_events(spark, sf_dir)
    span = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("bucket"),
    )
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("day_cents")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "bucket"], "left_outer")
        .select(
            "user_id",
            F.date_format("bucket", _DAY_FMT).alias("day"),
            "day_cents",
        )
        .withColumn(
            "filled_cents", F.last("day_cents", ignorenulls=True).over(w)
        )
        .drop("day_cents")
        .orderBy("user_id", "day")
    )


@register(
    "scd2_validity_intervals",
    category="timeseries",
    doc="SCD Type-2 dimension build: per customer, the order-priority "
    "attribute's change history as versioned validity intervals — a new "
    "version opens whenever the priority differs from the previous "
    "order (lag + IS DISTINCT FROM), version ids are a running sum of "
    "change flags, and valid_to is the NEXT version's valid_from (lead "
    "over the versioned rows; open version -> NULL). Ties inside a day "
    "break on o_orderkey so both engines see one deterministic order. "
    "Companion to merge_changeset_apply: MERGE maintains the current "
    "row, this builds the full history. Scale shape: one shuffle on "
    "custkey covers both window passes and the version aggregate "
    "(every 10th customer keeps output bounded at any SF).",
    oracle="""
        WITH seq AS (
            SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
                   CASE WHEN o_orderpriority IS DISTINCT FROM
                             LAG(o_orderpriority) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM orders
            WHERE o_custkey % 10 = 0
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ),
        ver AS (
            SELECT o_custkey, o_orderpriority,
                   CAST(SUM(chg) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey
                                       ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS version
            , o_orderdate
            FROM seq
        ),
        spans AS (
            SELECT o_custkey AS custkey, version,
                   ANY_VALUE(o_orderpriority) AS priority,
                   MIN(o_orderdate) AS vf,
                   COUNT(*) AS n_orders
            FROM ver
            GROUP BY o_custkey, version
        )
        SELECT custkey, version, priority,
               strftime(vf, '%Y-%m-%d') AS valid_from,
               strftime(LEAD(vf) OVER (PARTITION BY custkey
                                       ORDER BY version),
                        '%Y-%m-%d') AS valid_to,
               n_orders
        FROM spans
        ORDER BY custkey, version
    """,
)
def scd2_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey"
    ).withColumn(
        "chg",
        F.when(
            ~F.col("o_orderpriority").eqNullSafe(
                F.lag("o_orderpriority").over(w)
            ),
            1,
        ).otherwise(0),
    )
    ver = seq.withColumn(
        "version", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = ver.groupBy(
        F.col("o_custkey").alias("custkey"), "version"
    ).agg(
        F.any_value("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("vf"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    wv = W.partitionBy("custkey").orderBy("version")
    return spans.select(
        "custkey",
        "version",
        "priority",
        F.date_format("vf", _DAY_FMT).alias("valid_from"),
        F.date_format(F.lead("vf").over(wv), _DAY_FMT).alias("valid_to"),
        "n_orders",
    ).orderBy("custkey", "version")


@register(
    "ts_ewma",
    category="timeseries",
    doc="Truncated EWMA (halflife = one observation, last 16 samples) per "
    "user over the event stream — bit-deterministic across engines "
    "because the weighted sum runs entirely in scaled-integer space: "
    "values become cents (exact: value*100 can never sit on a binary "
    ".5 midpoint since k/200 is not binary-representable), weights are "
    "powers of two via shifts, and the single long/long double division "
    "at the end is IEEE-exact-rounded identically everywhere.  Scale "
    "shape: one shuffle on user_id; the 16-row frame keeps state O(1) "
    "per row regardless of history length (contrast: a recursive EWMA "
    "would serialize per key).",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
            FROM events WHERE user_id % 25 = 0
        ),
        wl AS (
            SELECT user_id, event_id, vc,
                   list(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS l
            FROM e
        )
        SELECT user_id, event_id,
               CAST(vc AS DOUBLE) / 100 AS value_cents,
               CAST(list_sum(list_transform(l,
                        (x, i) -> x * ((CAST(1 AS BIGINT) << (i - 1))))) AS DOUBLE)
               / CAST(((CAST(1 AS BIGINT) << len(l)) - 1) * 100 AS DOUBLE) AS ewma
        FROM wl
        ORDER BY user_id, event_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    vc = F.round(F.col("value") * 100, 0).cast("long")
    frame = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, W.currentRow)
    )
    lst = F.collect_list(vc).over(frame)
    # pyspark's F.shiftleft only takes a literal bit count, so the
    # column-varying shifts run as a SQL expression
    ewma = F.expr(
        "cast(aggregate(zip_with(l, sequence(0, size(l) - 1),"
        "                        (x, i) -> x * shiftleft(cast(1 as bigint), i)),"
        "               cast(0 as bigint), (acc, x) -> acc + x) as double)"
        " / cast((shiftleft(cast(1 as bigint), size(l)) - 1) * 100 as double)"
    )
    return (
        ev.select("user_id", "event_id", vc.alias("vc"), lst.alias("l"))
        .select(
            "user_id",
            "event_id",
            (F.col("vc").cast("double") / 100).alias("value_cents"),
            ewma.alias("ewma"),
        )
        .orderBy("user_id", "event_id")
    )


#: spans CTE shared by the point-in-time probe (mirrors
#: scd2_validity_intervals' history build)
_SQL_SCD2_SPANS = """
        seq AS (
            SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
                   CASE WHEN o_orderpriority IS DISTINCT FROM
                             LAG(o_orderpriority) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM orders
            WHERE o_custkey % 10 = 0
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ),
        ver AS (
            SELECT o_custkey, o_orderpriority, o_orderdate,
                   SUM(chg) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey
                                  ROWS UNBOUNDED PRECEDING) AS version
            FROM seq
        ),
        spans AS (
            SELECT o_custkey AS custkey, version,
                   ANY_VALUE(o_orderpriority) AS priority,
                   MIN(o_orderdate) AS vf
            FROM ver
            GROUP BY o_custkey, version
        )
"""


@register(
    "join_pointintime_scd2",
    category="join",
    doc="Point-in-time (temporal validity) join: each lineitem probes the "
    "SCD2 priority history of its customer for the version valid AT "
    "l_shipdate — the leakage-prevention join a training pipeline needs "
    "so features reflect what was knowable at event time, never a later "
    "dimension state.  Runs on the union-based as-of operator "
    "(operators/asof.py): history and probes share ONE shuffle on "
    "custkey and a single window pass finds the last version with "
    "vf <= t, so no per-row subquery and no range-join explosion; "
    "versions tied on a day resolve to the highest version id, "
    "identically to the oracle's arg_max; probes shipped before their "
    "customer's first version (the fixture allows it) surface as an "
    "explicit NULL-priority group rather than silently dropping.",
    oracle=f"""
        WITH {_SQL_SCD2_SPANS},
        spans_dedup AS (
            SELECT custkey, vf, arg_max(priority, version) AS priority
            FROM spans GROUP BY custkey, vf
        ),
        probe AS (
            SELECT o_custkey AS custkey, l_shipdate AS t
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey % 10 = 0
        )
        SELECT s.priority,
               COUNT(*) AS n_items,
               COUNT(DISTINCT p.custkey) AS n_custkeys
        FROM probe p
        ASOF LEFT JOIN spans_dedup s
            ON p.custkey = s.custkey AND s.vf <= p.t
        GROUP BY s.priority
        ORDER BY s.priority NULLS FIRST
    """,
)
def join_pointintime_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.asof import asof_join

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select("o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey").withColumn(
        "chg",
        F.when(
            ~F.col("o_orderpriority").eqNullSafe(F.lag("o_orderpriority").over(w)), 1
        ).otherwise(0),
    )
    ver = seq.withColumn(
        "version", F.sum("chg").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    spans = ver.groupBy(F.col("o_custkey").alias("custkey"), "version").agg(
        F.any_value("o_orderpriority").alias("priority"),
        F.min("o_orderdate").alias("t"),
    )
    li = load_table(spark, sf_dir, "lineitem")
    probe = li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_shipdate").alias("t"),
    )
    matched = asof_join(
        probe,
        spans,
        ts_col="t",
        by="custkey",
        value_cols=["priority", "version"],
        right_id_col="version",
        allow_exact_matches=True,
    )
    return (
        matched.groupBy(F.col("asof_priority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("custkey").alias("n_custkeys"),
        )
        .orderBy("priority")
    )


@register(
    "cohort_retention",
    category="timeseries",
    doc="Cohort retention matrix: users cohorted by first-activity week "
    "(weeks since the corpus epoch, integer floor-div), counted "
    "distinct per (cohort week, week offset) — the standard retention "
    "triangle.  All-integer bucketing; two shuffles (per-user cohort "
    "min, then the matrix rollup) keyed exactly like a 100 TB "
    "events table would partition (user, then small matrix).",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) // 7 AS week
            FROM events
        ),
        cohort AS (
            SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id
        )
        SELECT c.cohort_week,
               a.week - c.cohort_week AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM act a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY c.cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    week = (
        F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).cast("bigint")
    act = ev.select("user_id", week.alias("week")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "ts_longest_streak",
    category="timeseries",
    doc="Longest consecutive-week activity streak per user: distinct "
    "active weeks -> gaps-and-islands on the integer week number "
    "(week - dense row_number is constant within a consecutive run) "
    "-> max run length.  The engagement metric next to "
    "cohort_retention; one shuffle on user_id drives distinct, "
    "window, and the final max.",
    oracle="""
        WITH weeks AS (
            SELECT DISTINCT user_id,
                   datediff('day', DATE '2024-01-01',
                            CAST(date_trunc('day', ts) AS DATE)) // 7 AS week
            FROM events WHERE user_id % 5 = 0
        ),
        runs AS (
            SELECT user_id, week,
                   week - ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY week) AS grp
            FROM weeks
        )
        SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak
        FROM (
            SELECT user_id, grp, COUNT(*) AS run_len
            FROM runs GROUP BY user_id, grp
        )
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def ts_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    week = (
        F.datediff(F.date_trunc("day", "ts").cast("date"), F.lit("2024-01-01").cast("date"))
        / 7
    ).cast("bigint")
    weeks = ev.select("user_id", week.alias("week")).distinct()
    w = W.partitionBy("user_id").orderBy("week")
    runs = weeks.withColumn("grp", F.col("week") - F.row_number().over(w))
    return (
        runs.groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("user_id")
        .agg(F.max("run_len").cast("bigint").alias("longest_streak"))
        .orderBy("user_id")
    )


@register(
    "ts_resample_ohlc",
    category="timeseries",
    doc="OHLC downsampling: per event_type per 6-hour slot, open/close "
    "picked by deterministic (ts, event_id) ordering (row_number over the "
    "slot, never a bare min/max that ties could flip), high/low exact "
    "min/max.  One shuffle on (event_type, day, slot) serves both window "
    "passes and the final agg — the window partition key IS the group key.",
    oracle="""
        WITH based AS (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   CAST(hour(ts) // 6 AS INTEGER)              AS slot,
                   ts, event_id, value
            FROM events
        ),
        ranked AS (
            SELECT *,
                   ROW_NUMBER() OVER (PARTITION BY event_type, day, slot
                                      ORDER BY ts, event_id)      AS rn_f,
                   ROW_NUMBER() OVER (PARTITION BY event_type, day, slot
                                      ORDER BY ts DESC, event_id DESC) AS rn_l
            FROM based
        )
        SELECT event_type, day, slot,
               MAX(CASE WHEN rn_f = 1 THEN value END) AS open,
               MAX(value)                             AS high,
               MIN(value)                             AS low,
               MAX(CASE WHEN rn_l = 1 THEN value END) AS close,
               COUNT(*)                               AS volume
        FROM ranked
        GROUP BY event_type, day, slot
        ORDER BY event_type, day, slot
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        (F.hour("ts").cast("integer") / 6).cast("integer").alias("slot"),
        "ts",
        "event_id",
        "value",
    )
    grp = ["event_type", "day", "slot"]
    w_f = W.partitionBy(*grp).orderBy("ts", "event_id")
    w_l = W.partitionBy(*grp).orderBy(F.desc("ts"), F.desc("event_id"))
    ranked = ev.select(
        *grp,
        "value",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_l).alias("rn_l"),
    )
    return (
        ranked.groupBy(*grp)
        .agg(
            F.max(F.when(F.col("rn_f") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_l") == 1, F.col("value"))).alias("close"),
            F.count("*").alias("volume"),
        )
        .orderBy(*grp)
    )


@register(
    "seq_markov_transitions",
    category="timeseries",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead(event_type) within (user ordered by ts, event_id) "
    "gives the (from, to) pairs, one groupBy counts them, and the "
    "transition probability is a single integer/integer division "
    "(deterministic across engines) rounded to 6 places.  The "
    "user-behavior-model primitive; one shuffle on user_id for the "
    "window, one tiny 25-cell rollup.",
    oracle="""
        WITH seq AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS to_type
            FROM events
        ),
        cnt AS (
            SELECT from_type, to_type, COUNT(*) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n,
               ROUND(CAST(n AS DOUBLE) /
                     SUM(n) OVER (PARTITION BY from_type), 6) AS p
        FROM cnt
        ORDER BY from_type, to_type
    """,
)
def seq_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    cnt = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = W.partitionBy("from_type")
    return cnt.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(wt), 6).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "seq_pattern_extrema",
    category="timeseries",
    doc="Local-extrema pattern detection (MATCH_RECOGNIZE-style): an "
    "interior event is a peak when its value strictly exceeds both "
    "neighbours in the user's (ts, event_id) sequence, a valley when "
    "strictly below; pure double comparisons (no float arithmetic, so "
    "engine-exact).  Output is the per-user peak/valley census — the "
    "shape-mining primitive behind anomaly and changepoint screens.  "
    "One shuffle on user_id serves both lag and lead.",
    oracle="""
        WITH seq AS (
            SELECT user_id, value,
                   LAG(value)  OVER w AS prev,
                   LEAD(value) OVER w AS next
            FROM events WHERE user_id % 7 = 0
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN value > prev AND value > next
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_peaks,
               CAST(SUM(CASE WHEN value < prev AND value < next
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_valleys
        FROM seq
        WHERE prev IS NOT NULL AND next IS NOT NULL
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def seq_pattern_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev"),
        F.lead("value").over(w).alias("next"),
    ).filter(F.col("prev").isNotNull() & F.col("next").isNotNull())
    peak = (F.col("value") > F.col("prev")) & (F.col("value") > F.col("next"))
    valley = (F.col("value") < F.col("prev")) & (F.col("value") < F.col("next"))
    return (
        seq.groupBy("user_id")
        .agg(
            F.sum(F.when(peak, 1).otherwise(0)).cast("bigint").alias("n_peaks"),
            F.sum(F.when(valley, 1).otherwise(0)).cast("bigint").alias("n_valleys"),
        )
        .orderBy("user_id")
    )


@register(
    "seq_pattern_regex",
    category="timeseries",
    doc="Regex pattern matching over whole event sequences "
    "(MATCH_RECOGNIZE analog): each user's history collapses to a "
    "compact symbol string (first letter of event_type, deterministic "
    "(ts, event_id) order via array_sort over structs — never a bare "
    "collect_list, whose order is partition-dependent), then funnel "
    "detection is regexp 'v.*c.*p' and strict-adjacency counting is "
    "the replace-length trick.  One shuffle on user_id; per-user "
    "strings stay KB-scale because they hold one char per event.",
    oracle="""
        WITH seqs AS (
            SELECT user_id,
                   string_agg(substr(event_type, 1, 1), ''
                              ORDER BY ts, event_id) AS s
            FROM events WHERE user_id % 11 = 0
            GROUP BY user_id
        )
        SELECT user_id,
               length(s) AS seq_len,
               CASE WHEN regexp_matches(s, 'v.*c.*p') THEN 1 ELSE 0 END
                   AS has_funnel,
               CAST((length(s) - length(replace(s, 'vcp', ''))) // 3
                    AS BIGINT) AS n_strict_vcp
        FROM seqs
        ORDER BY user_id
    """,
)
def seq_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 11 == 0)
    arr = F.array_sort(
        F.collect_list(
            F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("ch"))
        )
    )
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws("", F.transform(arr, lambda x: x["ch"])).alias("s")
    )
    return seqs.select(
        "user_id",
        F.length("s").alias("seq_len"),
        F.when(F.col("s").rlike("v.*c.*p"), 1).otherwise(0).alias("has_funnel"),
        (
            (F.length("s") - F.length(F.replace(F.col("s"), F.lit("vcp"), F.lit(""))))
            / 3
        )
        .cast("bigint")
        .alias("n_strict_vcp"),
    ).orderBy("user_id")


@register(
    "ts_seasonal_decompose",
    category="timeseries",
    doc="Exact additive seasonal decomposition over a weekly cycle: per "
    "user, each day's value splits into (grand mean + day-of-week "
    "seasonal offset + residual).  All in scaled-integer space — value "
    "cents x n_days x 7 keeps every mean an exact integer ratio, so "
    "both engines agree bit-for-bit (no double division until the "
    "caller's display layer).  Emits the per-(user, dow) seasonal "
    "component numerator and the largest absolute residual numerator.  "
    "Two grouped aggregations over one shuffle key family (user) — the "
    "same shape at 100 TB; the dow re-aggregation is a 7-row-per-user "
    "rollup.",
    oracle="""
        WITH daily AS (
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   isodow(CAST(date_trunc('day', ts) AS DATE)) AS dow,
                   CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                       AS vc
            FROM events WHERE user_id % 10 = 0
            GROUP BY 1, 2, 3
        ),
        tot AS (
            SELECT user_id,
                   CAST(SUM(vc) AS BIGINT) AS sum_all,
                   CAST(COUNT(*) AS BIGINT) AS n_all
            FROM daily GROUP BY user_id
        ),
        dow AS (
            SELECT user_id, dow,
                   CAST(SUM(vc) AS BIGINT) AS sum_dow,
                   CAST(COUNT(*) AS BIGINT) AS n_dow
            FROM daily GROUP BY user_id, dow
        ),
        j AS (
            SELECT dd.user_id, dd.dow, dd.vc,
                   d.n_dow, d.sum_dow, t.n_all, t.sum_all
            FROM daily dd
            JOIN dow d ON d.user_id = dd.user_id AND d.dow = dd.dow
            JOIN tot t ON t.user_id = dd.user_id
        )
        SELECT user_id, dow,
               CAST(ANY_VALUE(n_dow) AS BIGINT) AS n_dow,
               -- seasonal offset numerator, common denominator n_dow*n_all:
               CAST(ANY_VALUE(sum_dow) * ANY_VALUE(n_all)
                    - ANY_VALUE(sum_all) * ANY_VALUE(n_dow) AS BIGINT)
                   AS seasonal_num,
               -- residual numerator per day: vc*n_dow - sum_dow, max |.|
               CAST(MAX(ABS(vc * n_dow - sum_dow)) AS BIGINT)
                   AS max_abs_resid_num
        FROM j
        GROUP BY user_id, dow
        ORDER BY user_id, dow
    """,
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _user_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("vc")
        )
        .withColumn("dow", F.dayofweek(F.col("day")))
        # DuckDB isodow: Mon=1..Sun=7; Spark dayofweek: Sun=1..Sat=7
        .withColumn("dow", ((F.col("dow") + 5) % 7 + 1).cast("int"))
    )
    tot = daily.groupBy("user_id").agg(
        F.sum("vc").cast("long").alias("sum_all"),
        F.count("*").cast("long").alias("n_all"),
    )
    dow = daily.groupBy("user_id", "dow").agg(
        F.sum("vc").cast("long").alias("sum_dow"),
        F.count("*").cast("long").alias("n_dow"),
    )
    return (
        daily.join(dow, ["user_id", "dow"])
        .join(tot, "user_id")
        .groupBy("user_id", "dow")
        .agg(
            F.first("n_dow").cast("long").alias("n_dow"),
            (F.first("sum_dow") * F.first("n_all") - F.first("sum_all") * F.first("n_dow"))
            .cast("long")
            .alias("seasonal_num"),
            F.max(F.abs(F.col("vc") * F.col("n_dow") - F.col("sum_dow")))
            .cast("long")
            .alias("max_abs_resid_num"),
        )
        .orderBy("user_id", "dow")
    )


_PAT = [0, 2000, 4000, 6000, 8000, 6000, 4000, 2000]  # rise-then-fall, cents


@register(
    "ts_pattern_match",
    category="timeseries",
    doc="Subsequence pattern search (the matrix-profile/UCR-suite query "
    "shape): every per-user sliding window of 8 consecutive event "
    "values is scored against a literal rise-then-fall template by "
    "EXACT integer sum-of-squared-differences in cents — no "
    "z-normalization division crosses the oracle boundary, so ranking "
    "is bit-deterministic.  Windows materialize as 7 LEAD columns (one "
    "window pass per user, no self-join, no array state); global top-10 "
    "via TakeOrdered with a total tiebreak.  At 100 TB the window scan "
    "is one shuffle on user_id and the top-k never leaves the "
    "executors.",
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS x0,
                   {", ".join(
                       f"LEAD(CAST(ROUND(value * 100) AS BIGINT), {i}) OVER "
                       f"(PARTITION BY user_id ORDER BY ts, event_id) AS x{i}"
                       for i in range(1, 8)
                   )}
            FROM events
        ),
        scored AS (
            SELECT user_id, event_id,
                   {" + ".join(f"(x{i} - {p}) * (x{i} - {p})" for i, p in enumerate(_PAT))}
                   AS ssd
            FROM seq WHERE x7 IS NOT NULL
        )
        SELECT user_id, event_id, CAST(ssd AS BIGINT) AS ssd
        FROM scored
        ORDER BY ssd, user_id, event_id
        LIMIT 10
    """,
)
def ts_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("bigint")
    seq = ev.select(
        "user_id",
        "event_id",
        cents.alias("x0"),
        *[F.lead(cents, i).over(w).alias(f"x{i}") for i in range(1, 8)],
    ).filter(F.col("x7").isNotNull())
    ssd = None
    for i, p in enumerate(_PAT):
        term = (F.col(f"x{i}") - F.lit(p)) * (F.col(f"x{i}") - F.lit(p))
        ssd = term if ssd is None else ssd + term
    return (
        seq.select("user_id", "event_id", ssd.cast("bigint").alias("ssd"))
        .orderBy("ssd", "user_id", "event_id")
        .limit(10)
    )


# ---- association-rule mining ------------------------------------------------

_AR_ITEM_MOD = 100  # part class universe (item = l_partkey % 100)
_AR_TOPN = 50  # rules kept


@register(
    "seq_assoc_rules",
    category="sequence",
    doc="Association-rule mining (market-basket): baskets are orders, "
    f"items are part classes (l_partkey % {_AR_ITEM_MOD}); co-occurrence "
    "pairs form by a self-join on the basket key restricted to "
    "item_a < item_b AFTER a distinct-items projection, so pair work is "
    "O(sum basket_size^2), never a cross product.  Support, confidence "
    "and lift are all EXACT integer permille — lift_pm = (cab * "
    "n_baskets * 1000) // (ca * cb) — so ranking is bit-identical "
    "across engines; the output is the top-"
    f"{_AR_TOPN} rules by (lift, support) with full deterministic "
    "tie-breaks, not a fixed threshold (on uniform fixtures a fixed "
    "min-support goes degenerate as SF grows).  Plan shape at 100 TB: "
    "distinct-items is one map-side-combinable shuffle on the basket "
    "key, the pair self-join re-uses that partitioning (items of one "
    "basket are co-located), pair counts shuffle on (ia, ib), and the "
    "per-item counts broadcast back — the classic a-priori first pass; "
    "deeper itemsets iterate the same join with the survivor set.",
    oracle=f"""
        WITH items AS (
            SELECT DISTINCT l_orderkey AS bask, l_partkey % {_AR_ITEM_MOD} AS item
            FROM lineitem
        ),
        nb AS (SELECT COUNT(DISTINCT bask) AS n FROM items),
        freq AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
        pairs AS (
            SELECT a.item AS ia, b.item AS ib, COUNT(*) AS cab
            FROM items a JOIN items b
              ON a.bask = b.bask AND a.item < b.item
            GROUP BY a.item, b.item
        ),
        rules AS (
            SELECT p.ia, p.ib, p.cab,
                   (p.cab * 1000) // fa.c AS conf_ab_pm,
                   (p.cab * 1000) // fb.c AS conf_ba_pm,
                   (p.cab * nb.n * 1000) // (fa.c * fb.c) AS lift_pm
            FROM pairs p
            JOIN freq fa ON fa.item = p.ia
            JOIN freq fb ON fb.item = p.ib
            CROSS JOIN nb
        )
        SELECT CAST(ia AS BIGINT) AS ia, CAST(ib AS BIGINT) AS ib,
               CAST(cab AS BIGINT) AS cab,
               CAST(conf_ab_pm AS BIGINT) AS conf_ab_pm,
               CAST(conf_ba_pm AS BIGINT) AS conf_ba_pm,
               CAST(lift_pm AS BIGINT) AS lift_pm,
               CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY lift_pm DESC, cab DESC, ia, ib
            ) AS rnk FROM rules
        ) WHERE rnk <= {_AR_TOPN}
        ORDER BY rank
    """,
)
def seq_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("bask"),
        (F.col("l_partkey") % _AR_ITEM_MOD).alias("item"),
    ).distinct()
    nb = items.agg(F.countDistinct("bask").alias("n"))
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("bask"), F.col("item").alias("ia"))
    b = items.select(F.col("bask").alias("bask_b"), F.col("item").alias("ib"))
    pairs = (
        a.join(b, (a.bask == b.bask_b) & (F.col("ia") < F.col("ib")))
        .groupBy("ia", "ib")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    fa = freq.select(F.col("item").alias("ia"), F.col("c").alias("ca"))
    fb = freq.select(F.col("item").alias("ib"), F.col("c").alias("cb"))
    rules = (
        pairs.join(F.broadcast(fa), "ia")
        .join(F.broadcast(fb), "ib")
        .crossJoin(F.broadcast(nb))
        .select(
            "ia",
            "ib",
            "cab",
            F.expr("(cab * 1000) div ca").alias("conf_ab_pm"),
            F.expr("(cab * 1000) div cb").alias("conf_ba_pm"),
            F.expr("(cab * n * 1000) div (ca * cb)").alias("lift_pm"),
        )
    )
    # top-N first (TakeOrderedAndProject — distributed, no global window
    # over the full rules table), then rank the N survivors; the total
    # ordering key makes the rank deterministic either way
    win = W.orderBy(
        F.desc("lift_pm"), F.desc("cab"), F.asc("ia"), F.asc("ib")
    )
    top = rules.orderBy(
        F.desc("lift_pm"), F.desc("cab"), F.asc("ia"), F.asc("ib")
    ).limit(_AR_TOPN)
    return (
        top.withColumn("rank", F.row_number().over(win))
        .select(
            F.col("ia").cast("bigint").alias("ia"),
            F.col("ib").cast("bigint").alias("ib"),
            F.col("cab").cast("bigint").alias("cab"),
            F.col("conf_ab_pm").cast("bigint").alias("conf_ab_pm"),
            F.col("conf_ba_pm").cast("bigint").alias("conf_ba_pm"),
            F.col("lift_pm").cast("bigint").alias("lift_pm"),
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("rank")
    )


@register(
    "seq_followedby_patterns",
    category="timeseries",
    doc="Sequential-pattern mining lite ('A eventually-followed-by B' "
    "within a session, the PrefixSpan length-2 core): sessionize per "
    "user (24h gap), reduce each session to the FIRST occurrence of "
    "each event type (so a pattern counts once per session — support "
    "semantics, not co-occurrence counts), order those firsts by "
    "(us, event_id), and generate the i<j pairs with the sorted-array "
    "HOF idiom — per-session fan-out is bounded by C(|event types|, 2)"
    " = 10, never by session length.  Support ships exact (n and ppm "
    "of all sessions).  Unlike seq_markov_transitions (ADJACENT "
    "steps), this captures long-range ordering.  One user shuffle + "
    "one pattern groupBy; the oracle generates pairs via a per-session "
    "self-join on the same lexicographic order.",
    oracle="""
        WITH e AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > 86400000000
                          OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                             IS NULL
                        THEN 1 ELSE 0 END AS ns
            FROM events
        ),
        tagged AS (
            SELECT user_id, event_id, event_type, us,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess
            FROM e
        ),
        firsts AS (
            SELECT user_id, sess, event_type,
                   MIN(us) AS us,
                   -- 2^32 shift: the packed key must order exactly like
                   -- Spark's lexicographic min(struct(us, event_id)) —
                   -- a 2^20 shift flips once event ids exceed 1M (sf1
                   -- audit); bound: event_id < 2^32
                   arg_min(event_id,
                           CAST(us AS HUGEINT) * 4294967296 + event_id) AS eid
            FROM tagged GROUP BY user_id, sess, event_type
        ),
        tot AS (SELECT COUNT(*) AS ns FROM
                (SELECT DISTINCT user_id, sess FROM firsts)),
        pairs AS (
            SELECT a.event_type AS a_type, b.event_type AS b_type
            FROM firsts a JOIN firsts b
              ON a.user_id = b.user_id AND a.sess = b.sess
             AND (a.us < b.us OR (a.us = b.us AND a.eid < b.eid))
        )
        SELECT a_type, b_type,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(1000000 * COUNT(*) // tot.ns AS BIGINT) AS support_ppm
        FROM pairs, tot
        GROUP BY a_type, b_type, tot.ns
        ORDER BY n_sessions DESC, a_type, b_type
        LIMIT 15
    """,
)
def seq_followedby_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.sessionize import tag_sessions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    tagged = tag_sessions(
        ev, "us", by="user_id", gap=86_400_000_000, order_cols=["event_id"]
    ).withColumnRenamed("session_seq", "sess")
    firsts = tagged.groupBy("user_id", "sess", "event_type").agg(
        F.min(F.struct("us", "event_id")).alias("k")
    )
    grouped = firsts.groupBy("user_id", "sess").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("k.us").alias("us"),
                    F.col("k.event_id").alias("eid"),
                    F.col("event_type").alias("t"),
                )
            )
        ).alias("ss")
    )
    within = F.flatten(
        F.transform(
            "ss",
            lambda x, i: F.transform(
                F.slice(F.col("ss"), i + 2, F.size("ss")),
                lambda y: F.struct(x.t.alias("a_type"), y.t.alias("b_type")),
            ),
        )
    )
    tot = grouped.agg(F.count(F.lit(1)).alias("ns"))
    return (
        grouped.select(F.explode(within).alias("p"))
        .groupBy(F.col("p.a_type").alias("a_type"), F.col("p.b_type").alias("b_type"))
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .crossJoin(F.broadcast(tot))
        .select(
            "a_type",
            "b_type",
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.expr("(1000000 * n_sessions) div ns")
            .cast("bigint")
            .alias("support_ppm"),
        )
        .orderBy(F.desc("n_sessions"), "a_type", "b_type")
        .limit(15)
    )


@register(
    "ts_holt_linear",
    category="timeseries",
    doc="Holt's linear-trend (double exponential) smoothing per user over "
    "the first 16 events, alpha = beta = 1/2 — bit-deterministic "
    "across engines because the RECURSIVE level/trend updates run in "
    "scaled-integer space: keeping state as (level*4^t, trend*4^t) "
    "turns both halving updates into pure integer adds/multiplies "
    "(L' = 2*(p*y + L + B), B' = p*y - L + 3*B with p = 4^(t-1); no "
    "division anywhere until the single exact power-of-two descale at "
    "the end, and |L| <= 4^16 * max_cents ~ 4e14 stays well inside "
    "int64 AND double's 2^53 exact range).  Spark evaluates the "
    "recursion as ONE aggregate() fold over each user's sorted value "
    "array — no per-key iteration, no UDF; the oracle replays it with "
    "a recursive CTE.  Scale shape: one shuffle on user_id, state O(1) "
    "per user; the 16-obs cap keeps the fold bounded at any SF.",
    oracle="""
        WITH RECURSIVE e AS (
            SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS y,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE user_id % 25 = 0
        ),
        e16 AS (SELECT * FROM e WHERE rn <= 16),
        rec AS (
            SELECT user_id, rn, 4 * y AS l, CAST(0 AS BIGINT) AS b,
                   CAST(4 AS BIGINT) AS p
            FROM e16 WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn,
                   2 * (r.p * e.y + r.l + r.b),
                   r.p * e.y - r.l + 3 * r.b,
                   4 * r.p
            FROM rec r
            JOIN e16 e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        ),
        fin AS (SELECT user_id, MAX(rn) AS n FROM rec GROUP BY user_id)
        SELECT r.user_id,
               CAST(r.rn AS BIGINT) AS n_obs,
               CAST(r.l AS DOUBLE) / CAST(r.p AS DOUBLE) AS level_cents,
               CAST(r.b AS DOUBLE) / CAST(r.p AS DOUBLE) AS trend_cents,
               CAST(r.l + 3 * r.b AS DOUBLE) / CAST(r.p AS DOUBLE)
                   AS forecast3_cents
        FROM rec r JOIN fin f ON r.user_id = f.user_id AND r.rn = f.n
        ORDER BY r.user_id
    """,
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    # row_number cap BEFORE the collect: the fold only ever sees 16 rows
    # per user, so the collect shuffles 16/user, not the whole history
    # (collect-then-slice ships every event; same shuffle key either way)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    rows = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("y"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 16)
    )
    per_user = rows.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rn", "y"))), lambda x: x.y
        ).alias("ys")
    )
    # fold: acc = (l, b, p) with p = 4^t after t steps; p = 0 marks "no
    # observation folded yet" (the init case lv_1 = y_1, tr_1 = 0)
    fold = F.expr(
        """
        aggregate(
            ys,
            named_struct('l', cast(0 as bigint), 'b', cast(0 as bigint),
                         'p', cast(0 as bigint)),
            (acc, y) -> CASE WHEN acc.p = 0
                THEN named_struct('l', 4 * y, 'b', cast(0 as bigint),
                                  'p', cast(4 as bigint))
                ELSE named_struct(
                    'l', 2 * (acc.p * y + acc.l + acc.b),
                    'b', acc.p * y - acc.l + 3 * acc.b,
                    'p', 4 * acc.p)
                END)
        """
    )
    return (
        per_user.select("user_id", F.size("ys").alias("n"), fold.alias("s"))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_obs"),
            (F.col("s.l").cast("double") / F.col("s.p").cast("double")).alias(
                "level_cents"
            ),
            (F.col("s.b").cast("double") / F.col("s.p").cast("double")).alias(
                "trend_cents"
            ),
            (
                (F.col("s.l") + 3 * F.col("s.b")).cast("double")
                / F.col("s.p").cast("double")
            ).alias("forecast3_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_sax_words",
    category="timeseries",
    doc="SAX (Symbolic Aggregate approXimation) words per user: the first "
    "32 events become 8 PAA segments of 4 observations; each segment "
    "mean is discretized against the user's own [min, max] range split "
    "into 4 equal-width letters a-d.  Classic SAX uses Gaussian "
    "breakpoints on z-scores (libm territory); equal-width breakpoints "
    "keep every comparison exact-rational — segment mean S/n vs "
    "threshold mn + k*(mx-mn)/4 cross-multiplies to the integer "
    "predicate 4*S > 4*n*mn + k*n*(mx-mn), so both engines pick "
    "identical letters bit-for-bit.  The word (ordered concat of "
    "letters) is the indexable motif fingerprint: equal words => "
    "similar shapes, and a groupBy on the word finds repeated motifs "
    "across users.  One shuffle on user_id; the 32-obs cap bounds "
    "per-user work at any SF.",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS y,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE user_id % 10 = 0
        ),
        e32 AS (
            SELECT user_id, y, (rn - 1) // 4 AS seg
            FROM e WHERE rn <= 32
        ),
        rng AS (
            SELECT user_id, MIN(y) AS mn, MAX(y) AS mx,
                   COUNT(*) AS n_obs
            FROM e32 GROUP BY user_id
        ),
        segs AS (
            SELECT user_id, seg, SUM(y) AS s, COUNT(*) AS n
            FROM e32 GROUP BY user_id, seg
        ),
        sym AS (
            SELECT s.user_id, s.seg,
                   chr(97 +
                       CASE WHEN 4 * s.s > 4 * s.n * r.mn + 1 * s.n * (r.mx - r.mn) THEN 1 ELSE 0 END +
                       CASE WHEN 4 * s.s > 4 * s.n * r.mn + 2 * s.n * (r.mx - r.mn) THEN 1 ELSE 0 END +
                       CASE WHEN 4 * s.s > 4 * s.n * r.mn + 3 * s.n * (r.mx - r.mn) THEN 1 ELSE 0 END
                   ) AS letter
            FROM segs s JOIN rng r USING (user_id)
        )
        SELECT y.user_id,
               CAST(r.n_obs AS BIGINT) AS n_obs,
               string_agg(y.letter, '' ORDER BY y.seg) AS sax_word
        FROM sym y JOIN rng r USING (user_id)
        GROUP BY y.user_id, r.n_obs
        ORDER BY y.user_id
    """,
)
def ts_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e32 = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("y"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 32)
        .withColumn("seg", F.expr("(rn - 1) div 4"))
    )
    rng = e32.groupBy("user_id").agg(
        F.min("y").alias("mn"),
        F.max("y").alias("mx"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    segs = e32.groupBy("user_id", "seg").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")
    )
    above = lambda k: F.when(  # noqa: E731
        4 * F.col("s") > 4 * F.col("n") * F.col("mn")
        + k * F.col("n") * (F.col("mx") - F.col("mn")),
        1,
    ).otherwise(0)
    sym = segs.join(rng, "user_id").select(
        "user_id",
        "seg",
        "n_obs",
        F.chr(F.lit(97) + above(1) + above(2) + above(3)).alias("letter"),
    )
    return (
        sym.groupBy("user_id", "n_obs")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg", "letter"))),
                    lambda x: x.letter,
                ),
                "",
            ).alias("sax_word")
        )
        .select(
            "user_id", F.col("n_obs").cast("bigint").alias("n_obs"), "sax_word"
        )
        .orderBy("user_id")
    )


@register(
    "ts_holt_winters_seasonal",
    category="timeseries",
    doc="Holt-Winters additive TRIPLE exponential smoothing (level + "
    "trend + period-4 seasonality, alpha = beta = gamma = 1/2) per "
    "user over the first 16 events — the full seasonal extension of "
    "ts_holt_linear, same bit-determinism argument: state rides as "
    "(level*4^t, trend*4^t, [4 seasonals]*4^t), the whole seasonal "
    "array rescales by 4 each step, and with half = p*y - s1 + L + B "
    "every update is integer-only (L' = 2*half, B' = p*y - s1 - L + "
    "3*B, new seasonal = p*y + 3*s1 - L - B; seasonals zero-"
    "initialized).  Spark folds the recursion in ONE aggregate() with "
    "a struct+array accumulator; the oracle replays it in a recursive "
    "CTE carrying a BIGINT[] column.  |state| <= 4^16 * max_cents "
    "~ 4e14: inside int64 and double's 2^53.  One shuffle on user_id, "
    "O(1) state per user, capped fold at any SF.",
    oracle="""
        WITH RECURSIVE e AS (
            SELECT user_id, CAST(ROUND(value * 100, 0) AS BIGINT) AS y,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events WHERE user_id % 25 = 0
        ),
        e16 AS (SELECT * FROM e WHERE rn <= 16),
        rec AS (
            SELECT user_id, rn, 4 * y AS l, CAST(0 AS BIGINT) AS b,
                   CAST(4 AS BIGINT) AS p,
                   [CAST(0 AS BIGINT), 0, 0, 0] AS s
            FROM e16 WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.rn,
                   2 * (r.p * e.y - r.s[1] + r.l + r.b),
                   r.p * e.y - r.s[1] - r.l + 3 * r.b,
                   4 * r.p,
                   list_append(list_transform(r.s[2:4], v -> 4 * v),
                               r.p * e.y + 3 * r.s[1] - r.l - r.b)
            FROM rec r
            JOIN e16 e ON e.user_id = r.user_id AND e.rn = r.rn + 1
        ),
        fin AS (SELECT user_id, MAX(rn) AS n FROM rec GROUP BY user_id)
        SELECT r.user_id,
               CAST(r.rn AS BIGINT) AS n_obs,
               CAST(r.l AS DOUBLE) / CAST(r.p AS DOUBLE) AS level_cents,
               CAST(r.b AS DOUBLE) / CAST(r.p AS DOUBLE) AS trend_cents,
               CAST(r.s[1] AS DOUBLE) / CAST(r.p AS DOUBLE)
                   AS season_next_cents,
               CAST(r.l + r.b + r.s[1] AS DOUBLE) / CAST(r.p AS DOUBLE)
                   AS forecast1_cents
        FROM rec r JOIN fin f ON r.user_id = f.user_id AND r.rn = f.n
        ORDER BY r.user_id
    """,
)
def ts_holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    # same pre-collect row cap as ts_holt_linear (16 rows/user shuffled)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    rows = (
        ev.select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("y"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 16)
    )
    per_user = rows.groupBy("user_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("rn", "y"))), lambda x: x.y
        ).alias("ys")
    )
    fold = F.expr(
        """
        aggregate(
            ys,
            named_struct('l', cast(0 as bigint), 'b', cast(0 as bigint),
                         'p', cast(0 as bigint),
                         's', array(cast(0 as bigint), cast(0 as bigint),
                                    cast(0 as bigint), cast(0 as bigint))),
            (acc, y) -> CASE WHEN acc.p = 0
                THEN named_struct('l', 4 * y, 'b', cast(0 as bigint),
                                  'p', cast(4 as bigint),
                                  's', array(cast(0 as bigint), cast(0 as bigint),
                                             cast(0 as bigint), cast(0 as bigint)))
                ELSE named_struct(
                    'l', 2 * (acc.p * y - element_at(acc.s, 1) + acc.l + acc.b),
                    'b', acc.p * y - element_at(acc.s, 1) - acc.l + 3 * acc.b,
                    'p', 4 * acc.p,
                    's', concat(
                        transform(slice(acc.s, 2, 3), v -> 4 * v),
                        array(acc.p * y + 3 * element_at(acc.s, 1)
                              - acc.l - acc.b)))
                END)
        """
    )
    pd = F.col("s.p").cast("double")
    return (
        per_user.select("user_id", F.size("ys").alias("n"), fold.alias("s"))
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_obs"),
            (F.col("s.l").cast("double") / pd).alias("level_cents"),
            (F.col("s.b").cast("double") / pd).alias("trend_cents"),
            (F.element_at("s.s", 1).cast("double") / pd).alias(
                "season_next_cents"
            ),
            (
                (F.col("s.l") + F.col("s.b") + F.element_at("s.s", 1)).cast(
                    "double"
                )
                / pd
            ).alias("forecast1_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_kaplan_meier",
    category="timeseries",
    doc="Kaplan-Meier survival curve for time-to-first-purchase with "
    "right censoring (users who never purchase are censored at their "
    "last observed event) — the standard churn/conversion estimator.  "
    "Survival probabilities are chained in exact ppm integer space: "
    "S_i = S_{i-1} * (n_i - d_i) div n_i with floor division at every "
    "step, so the sequential product is bit-identical between the "
    "Spark array fold and the DuckDB recursive CTE (a float product "
    "would drift with association order).  Scale shape: ONE groupBy "
    "collapses events to per-user (duration, event) rows, a second "
    "bounds the table to distinct DURATION DAYS (calendar-bounded, "
    "~30 rows at any SF); the unpartitioned risk-set window and the "
    "fold run over that bounded curve, never over data.",
    oracle="""
        WITH RECURSIVE per_user AS (
            SELECT user_id,
                   MIN(CAST(ts AS DATE)) AS first_d,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS p_d,
                   MAX(CAST(ts AS DATE)) AS last_d
            FROM events GROUP BY user_id
        ),
        durs AS (
            SELECT CASE WHEN p_d IS NOT NULL
                        THEN date_diff('day', first_d, p_d)
                        ELSE date_diff('day', first_d, last_d) END AS dur,
                   CASE WHEN p_d IS NOT NULL THEN 1 ELSE 0 END AS ev
            FROM per_user
        ),
        tbl AS (
            SELECT dur, SUM(ev) AS d, SUM(1 - ev) AS c
            FROM durs GROUP BY dur
        ),
        risk AS (
            SELECT dur, d,
                   (SELECT SUM(d + c) FROM tbl)
                   - COALESCE(SUM(d + c) OVER (ORDER BY dur
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS n
            FROM tbl
        ),
        steps AS (
            SELECT row_number() OVER (ORDER BY dur) AS rn, dur, n, d
            FROM risk WHERE d > 0
        ),
        km AS (
            SELECT rn, dur, n, d, 1000000 * (n - d) // n AS s
            FROM steps WHERE rn = 1
            UNION ALL
            SELECT t.rn, t.dur, t.n, t.d, km.s * (t.n - t.d) // t.n
            FROM steps t JOIN km ON t.rn = km.rn + 1
        )
        SELECT CAST(dur AS BIGINT) AS dur_days,
               CAST(n AS BIGINT) AS at_risk,
               CAST(d AS BIGINT) AS events,
               CAST(s AS BIGINT) AS surv_ppm
        FROM km
        ORDER BY dur_days
    """,
)
def ts_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d"),
        F.min(F.when(F.col("event_type") == "purchase", F.to_date("ts"))).alias(
            "p_d"
        ),
        F.max(F.to_date("ts")).alias("last_d"),
    )
    durs = per_user.select(
        F.when(
            F.col("p_d").isNotNull(), F.datediff("p_d", "first_d")
        )
        .otherwise(F.datediff("last_d", "first_d"))
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("p_d").isNotNull(), 1).otherwise(0).cast("bigint").alias("ev"),
    )
    tbl = durs.groupBy("dur").agg(
        F.sum("ev").alias("d"), F.sum(1 - F.col("ev")).alias("c")
    )
    # unpartitioned windows are safe here: tbl is bounded by distinct
    # calendar DAYS, not by data size (see docstring)
    win = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    risk = tbl.select(
        "dur",
        "d",
        (
            F.sum(F.col("d") + F.col("c")).over(
                W.orderBy(F.lit(1)).rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            )
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(win), F.lit(0))
        ).alias("n"),
    ).filter(F.col("d") > 0)
    curve = risk.agg(
        F.sort_array(F.collect_list(F.struct("dur", "n", "d"))).alias("steps")
    )
    folded = curve.select(
        F.expr(
            """
            aggregate(
                steps,
                named_struct('s', cast(1000000 as bigint),
                             'out', cast(array() as
                                 array<struct<dur:bigint,n:bigint,
                                              d:bigint,s:bigint>>)),
                (acc, x) -> named_struct(
                    's', (acc.s * (x.n - x.d)) div x.n,
                    'out', array_append(acc.out,
                        named_struct('dur', x.dur, 'n', x.n, 'd', x.d,
                                     's', (acc.s * (x.n - x.d)) div x.n))),
                acc -> acc.out
            )
            """
        ).alias("curve")
    )
    return (
        folded.select(F.explode("curve").alias("r"))
        .select(
            F.col("r.dur").alias("dur_days"),
            F.col("r.n").alias("at_risk"),
            F.col("r.d").alias("events"),
            F.col("r.s").alias("surv_ppm"),
        )
        .orderBy("dur_days")
    )


@register(
    "ts_cross_correlation",
    category="timeseries",
    doc="Lead-lag cross-correlation between the hourly click and "
    "purchase count series (does activity in one series precede the "
    "other?), fully exact: both series densify onto the calendar hour "
    "grid (missing hours are 0 — sequence/range in either engine), "
    "deviations are N-scaled integers dx = N*x - Sx so no mean "
    "division ever happens, and ccf(lag) = Sum dx_t * dy_{t+lag} for "
    "lags 0..12 is a pure integer dot product via one 13-way lag "
    "explode + equi-join.  Scale shape: events collapse to the hour "
    "grid with ONE map-side-combinable groupBy; the grid is "
    "calendar-bounded (~720 rows/month at ANY SF), so the lag "
    "fan-out and join run over bounded data.",
    oracle="""
        WITH hours AS (
            -- floor(epoch) matches Spark's unix_timestamp (second FLOOR);
            -- a bare BIGINT cast would ROUND fractional seconds and push
            -- hh:59:59.5+ events into the next hour bucket
            SELECT CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h, event_type
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        span AS (
            SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hours
        ),
        grid AS (
            SELECT h0 + t.i AS h FROM span, range(0, 100000) t(i)
            WHERE h0 + t.i <= h1
        ),
        cx AS (
            SELECT h, COUNT(*) AS c FROM hours WHERE event_type = 'click'
            GROUP BY h
        ),
        cy AS (
            SELECT h, COUNT(*) AS c FROM hours WHERE event_type = 'purchase'
            GROUP BY h
        ),
        x AS (
            SELECT g.h, COALESCE(cx.c, 0) AS x FROM grid g
            LEFT JOIN cx ON cx.h = g.h
        ),
        y AS (
            SELECT g.h, COALESCE(cy.c, 0) AS y FROM grid g
            LEFT JOIN cy ON cy.h = g.h
        ),
        tot AS (
            SELECT (SELECT COUNT(*) FROM grid) AS n,
                   (SELECT SUM(x) FROM x) AS sx,
                   (SELECT SUM(y) FROM y) AS sy
        ),
        dx AS (SELECT h, tot.n * x.x - tot.sx AS d FROM x, tot),
        dy AS (SELECT h, tot.n * y.y - tot.sy AS d FROM y, tot),
        lags AS (SELECT i AS lag FROM range(0, 13) t(i))
        SELECT CAST(l.lag AS BIGINT) AS lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(dx.d * dy.d) AS BIGINT) AS ccf_scaled
        FROM lags l
        JOIN dx ON TRUE
        JOIN dy ON dy.h = dx.h + l.lag
        GROUP BY l.lag
        ORDER BY lag
    """,
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    hours = ev.select(
        (F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"), "event_type"
    )
    span = hours.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    cx = (
        hours.filter(F.col("event_type") == "click").groupBy("h").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    cy = (
        hours.filter(F.col("event_type") == "purchase").groupBy("h").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    x = grid.join(cx, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("x")
    )
    y = grid.join(cy, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("y")
    )
    tot = (
        x.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
        .crossJoin(y.agg(F.sum("y").alias("sy")))
    )
    dx = x.crossJoin(F.broadcast(tot)).select(
        "h", (F.col("n") * F.col("x") - F.col("sx")).alias("d")
    )
    dy = y.crossJoin(F.broadcast(tot)).select(
        F.col("h").alias("hy"), (F.col("n") * F.col("y") - F.col("sy")).alias("dy")
    )
    lags = spark.range(13).select(F.col("id").cast("bigint").alias("lag"))
    return (
        dx.crossJoin(F.broadcast(lags))
        .join(dy, F.col("hy") == F.col("h") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("d") * F.col("dy")).cast("bigint").alias("ccf_scaled"),
        )
        .orderBy("lag")
    )


@register(
    "ts_time_weighted_avg",
    category="timeseries",
    doc="Time-weighted average (the irregular-sampling aggregate "
    "TimescaleDB ships as time_weight): each user's value is a step "
    "function that holds between consecutive events, so the mean is "
    "Sum(cents * hold_seconds) / Sum(hold_seconds) — NOT the naive "
    "row mean, which over-weights bursts.  Weights come from lead() "
    "per user (one user-keyed window over one shuffle); the weighted "
    "sum stays in exact cents*seconds integers and the final division "
    "is integer ppk (cents, floor) on both sides.  Users with one "
    "event have no held interval and are excluded by the lead "
    "semantics.  Output per user_id%10 cohort: users, intervals, "
    "held seconds, and the TWA in cents.",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(round(value * 100) AS BIGINT) AS v,
                   CAST(floor(epoch(ts)) AS BIGINT) AS s,
                   lead(CAST(floor(epoch(ts)) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS s_next
            FROM events
        ),
        held AS (
            SELECT user_id, v, s_next - s AS dur
            FROM seq WHERE s_next IS NOT NULL
        )
        SELECT user_id % 10 AS cohort,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               CAST(SUM(dur) AS BIGINT) AS held_seconds,
               CAST(SUM(v * dur) // SUM(dur) AS BIGINT) AS twa_cents
        FROM held
        GROUP BY user_id % 10
        ORDER BY cohort
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id",
        F.expr("cast(round(value * 100, 0) as bigint)").alias("v"),
        F.unix_timestamp("ts").alias("s"),
        F.lead(F.unix_timestamp("ts")).over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("s_next"),
    )
    held = seq.filter(F.col("s_next").isNotNull()).select(
        "user_id", "v", (F.col("s_next") - F.col("s")).alias("dur")
    )
    return (
        held.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur").cast("bigint").alias("held_seconds"),
            F.expr("sum(v * dur) div sum(dur)").cast("bigint").alias("twa_cents"),
        )
        .orderBy("cohort")
    )


_DTW_INF = 9_000_000_000_000_000  # effectively +inf, still bigint-safe to add


@register(
    "ts_dtw_band",
    category="timeseries",
    doc="Dynamic time warping with a Sakoe-Chiba band (r=3) between each "
    "panel user's 30-day spend series and the population mean series — "
    "the alignment distance for 'which users' spending rhythm deviates "
    "from the norm', computed EXACTLY in integer cents.  The DP runs "
    "on ANTI-DIAGONALS: cells on diagonal d depend only on diagonals "
    "d-1 and d-2, so each of the 59 steps is a pure element-wise "
    "transform (no intra-step dependency) — a fold of 59 map steps in "
    "Spark == a 59-row recursive CTE carrying two LIST columns in "
    "DuckDB, bit-identical.  Scale shape: ONE (user, day) groupBy sees "
    "the data; series assembly is a calendar-bounded 30-slot fill; the "
    "DP is constant work (59 x 30 cells) per panel user.  Output: "
    "user_id, exact DTW cost in cents.",
    oracle=f"""
        WITH RECURSIVE d0 AS (
            SELECT MIN(CAST(ts AS DATE)) AS dmin FROM events
        ),
        daily AS (
            SELECT user_id,
                   date_diff('day', d0.dmin, CAST(ts AS DATE)) AS dd,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS c
            FROM events, d0
            WHERE user_id % 25 = 0
              AND date_diff('day', d0.dmin, CAST(ts AS DATE)) < 30
            GROUP BY user_id, dd
        ),
        smap AS (
            SELECT user_id, map_from_entries(list(struct_pack(k := dd, v := c)))
                       AS m
            FROM daily GROUP BY user_id
        ),
        serie AS (
            SELECT user_id,
                   list_transform(range(0, 30), d ->
                       COALESCE(map_extract(m, d)[1], 0)) AS a
            FROM smap
        ),
        refd AS (
            SELECT map_from_entries(list(struct_pack(k := dd, v := tot))) AS m
            FROM (SELECT dd, SUM(c) AS tot FROM daily GROUP BY dd)
        ),
        nref AS (SELECT COUNT(*) AS n FROM serie),
        refs AS (
            SELECT list_transform(range(0, 30), d ->
                       COALESCE(map_extract(m, d)[1], 0) // nref.n) AS b
            FROM refd, nref
        ),
        init AS (
            SELECT s.user_id, s.a, r.b, 0 AS d,
                   list_transform(range(0, 30), i ->
                       CASE WHEN i = 0 THEN ABS(s.a[1] - r.b[1])
                            ELSE {_DTW_INF} END) AS p,
                   list_transform(range(0, 30), i -> {_DTW_INF}) AS pp
            FROM serie s CROSS JOIN refs r
        ),
        dp AS (
            SELECT * FROM init
            UNION ALL
            SELECT user_id, a, b, d + 1,
                   list_transform(range(0, 30), i ->
                       CASE WHEN (d + 1) - i BETWEEN 0 AND 29
                             AND ABS(2 * i - (d + 1)) <= 3
                            THEN ABS(a[i + 1] - b[(d + 1) - i + 1])
                                 + LEAST(
                                     CASE WHEN i > 0 THEN p[i] ELSE {_DTW_INF} END,
                                     p[i + 1],
                                     CASE WHEN i > 0 THEN pp[i] ELSE {_DTW_INF} END)
                            ELSE {_DTW_INF} END) AS p,
                   p AS pp
            FROM dp WHERE d < 58
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(p[30] AS BIGINT) AS dtw_cents
        FROM dp WHERE d = 58
        ORDER BY user_id
    """,
)
def ts_dtw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dmin = ev.agg(F.min(F.to_date("ts")).alias("dmin"))
    daily = (
        ev.filter(F.col("user_id") % 25 == 0)
        .crossJoin(F.broadcast(dmin))
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.col("dmin")).cast("bigint").alias("dd"),
            F.expr("cast(round(value * 100, 0) as bigint)").alias("vc"),
        )
        .filter(F.col("dd") < 30)
        .groupBy("user_id", "dd")
        .agg(F.sum("vc").alias("c"))
    )
    fill = (
        "transform(sequence(0, 29), d -> "
        "coalesce(element_at(map_from_entries(collect_list(struct(dd, c))), d), "
        "cast(0 as bigint)))"
    )
    serie = daily.groupBy("user_id").agg(F.expr(fill).alias("a"))
    refd = daily.groupBy("dd").agg(F.sum("c").alias("c"))
    nref = serie.agg(F.count(F.lit(1)).alias("n"))
    refs = (
        refd.crossJoin(F.broadcast(nref))
        .groupBy("n")
        .agg(F.expr(fill.replace("struct(dd, c)", "struct(dd, c)")).alias("tot"))
        .select(F.expr("transform(tot, t -> t div n)").alias("b"))
    )
    inf = str(_DTW_INF)
    # NB: Spark's arr[i] bracket is 0-BASED (GetArrayItem) while DuckDB's
    # is 1-based — the oracle uses [i+1] for the same cell
    dp = F.expr(
        f"""
        aggregate(
            sequence(1, 58),
            named_struct(
                'p', transform(sequence(0, 29), i ->
                        IF(i = 0, abs(a[0] - b[0]), {inf}L)),
                'pp', transform(sequence(0, 29), i -> {inf}L)),
            (acc, d) -> named_struct(
                'p', transform(sequence(0, 29), i ->
                    CASE WHEN d - i BETWEEN 0 AND 29
                          AND abs(2 * i - d) <= 3
                         THEN abs(a[i] - b[d - i])
                              + least(
                                  IF(i > 0, acc.p[i - 1], {inf}L),
                                  acc.p[i],
                                  IF(i > 0, acc.pp[i - 1], {inf}L))
                         ELSE {inf}L END),
                'pp', acc.p),
            acc -> acc.p[29]
        )
        """
    )
    return (
        serie.crossJoin(F.broadcast(refs))
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            dp.cast("bigint").alias("dtw_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "ts_gap_fill_lerp",
    category="timeseries",
    doc="Time-series gap filling with EXACT linear interpolation: per "
    "panel user (user_id %% 50 == 0), hourly spend cents densify onto "
    "the user's first-48-hour grid; missing hours interpolate linearly "
    "between the neighboring known hours in pure integer space — both "
    "engines TRUNCATE integer division toward zero (Spark `div`, "
    "DuckDB integer `//`: -7//2 is -3 in both, verified), so negative "
    "deltas agree with no emulation (the feature-pipeline imputation "
    "step before any rolling model input).  Neighbor lookup is two "
    "ignore-nulls windows per "
    "user over the union of grid and known rows (known hours beyond "
    "the grid serve as the right neighbor), so the fill is one "
    "user-partition shuffle; the grid is 48 rows per panel user, "
    "bounded regardless of data volume.",
    oracle="""
        WITH known AS (
            SELECT user_id AS u,
                   CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS h,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS v
            FROM events
            WHERE user_id % 50 = 0 AND value IS NOT NULL
            GROUP BY 1, 2
        ),
        b AS (
            SELECT u, MIN(h) AS h0,
                   LEAST(MAX(h), MIN(h) + 47) AS hg1
            FROM known GROUP BY u
        ),
        grid AS (
            SELECT b.u, b.h0 + t.i AS h
            FROM b, range(0, 48) t(i)
            WHERE b.h0 + t.i <= b.hg1
        ),
        g AS (
            SELECT grid.u, grid.h, k.v, 1 AS in_grid
            FROM grid LEFT JOIN known k ON k.u = grid.u AND k.h = grid.h
        ),
        kout AS (
            SELECT k.u, k.h, k.v, 0 AS in_grid
            FROM known k JOIN b ON b.u = k.u
            WHERE k.h > b.hg1
        ),
        un AS (
            SELECT * FROM g UNION ALL SELECT * FROM kout
        ),
        f AS (
            SELECT u, h, v, in_grid,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS vp,
                   last_value(CASE WHEN v IS NOT NULL THEN h END
                              IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS hp,
                   first_value(v IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS vn,
                   first_value(CASE WHEN v IS NOT NULL THEN h END
                               IGNORE NULLS) OVER (
                       PARTITION BY u ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                   ) AS hn
            FROM un
        )
        SELECT CAST(u AS BIGINT) AS user_id,
               CAST(h AS BIGINT) AS hour_n,
               CAST(CASE WHEN v IS NOT NULL THEN v
                         ELSE vp + (vn - vp) * (h - hp) // (hn - hp)
                    END AS BIGINT) AS cents,
               CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT)
                   AS interpolated
        FROM f WHERE in_grid = 1
        ORDER BY user_id, hour_n
    """,
)
def ts_gap_fill_lerp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    known = (
        ev.filter((F.col("user_id") % 50 == 0) & F.col("value").isNotNull())
        .select(
            F.col("user_id").alias("u"),
            (F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
            F.expr("cast(round(value * 100, 0) as bigint)").alias("vc"),
        )
        .groupBy("u", "h")
        .agg(F.sum("vc").alias("v"))
    )
    b = known.groupBy("u").agg(
        F.min("h").alias("h0"),
        F.least(F.max("h"), F.min("h") + 47).alias("hg1"),
    )
    grid = b.select(
        "u", F.explode(F.sequence("h0", "hg1")).alias("h")
    )
    g = grid.join(known, ["u", "h"], "left").select(
        "u", "h", "v", F.lit(1).alias("in_grid")
    )
    kout = (
        known.join(b, "u")
        .filter(F.col("h") > F.col("hg1"))
        .select("u", "h", "v", F.lit(0).alias("in_grid"))
    )
    un = g.unionByName(kout)
    wp = W.partitionBy("u").orderBy("h").rowsBetween(W.unboundedPreceding, 0)
    wn = W.partitionBy("u").orderBy("h").rowsBetween(0, W.unboundedFollowing)
    kh = F.when(F.col("v").isNotNull(), F.col("h"))
    f = un.select(
        "u",
        "h",
        "v",
        "in_grid",
        F.last("v", ignorenulls=True).over(wp).alias("vp"),
        F.last(kh, ignorenulls=True).over(wp).alias("hp"),
        F.first("v", ignorenulls=True).over(wn).alias("vn"),
        F.first(kh, ignorenulls=True).over(wn).alias("hn"),
    )
    # both engines truncate integer division toward zero (Spark div ==
    # DuckDB integer //), so the negative-delta lerp needs no emulation
    lerp = F.expr("vp + ((vn - vp) * (h - hp)) div (hn - hp)")
    return (
        f.filter(F.col("in_grid") == 1)
        .select(
            F.col("u").cast("bigint").alias("user_id"),
            F.col("h").cast("bigint").alias("hour_n"),
            F.coalesce("v", lerp).cast("bigint").alias("cents"),
            F.when(F.col("v").isNull(), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("interpolated"),
        )
        .orderBy("user_id", "hour_n")
    )
