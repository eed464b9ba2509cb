"""Scale patterns: the join shapes that break naively at 100 TB, written
the way a 1000-executor plan needs them.

- **Salted join**: a skewed fact key (a handful of hot users owning a large
  share of events) makes one shuffle partition the straggler.  Salting
  splits each fact key across S sub-partitions and replicates the dim row
  S ways; the result set is IDENTICAL to the plain join (the oracle runs
  the plain join), the skew just disappears.  AQE's skew-join handles sort
  -merge cases automatically; explicit salting is the portable form that
  also covers aggregations and older planners.
- **Bucketized big-big range join**: pairing two fact tables on
  |t_a - t_b| <= W cannot broadcast either side; a raw inequality join is
  a broadcast-nested-loop (O(n*m)).  Bucketing time into W-sized buckets
  and exploding one side to its 3 adjacent buckets turns it into an
  EQUI-join on (key, bucket) — shuffle-partitionable, each pair found
  exactly once (bucket deltas in {-1,0,1} are disjoint) — then the exact
  band predicate filters within the bucket.  Same trick as the LSH band
  join for dedup; the as-of join (operators/asof.py) is the sorted-window
  cousin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash_expr
from flow_spark.functions.layout import HILBERT_BITS, hilbert_rounds_sql
from flow_spark.queries.registry import register

_SALT = 8
_WINDOW_US = 1_800_000_000  # 30 min in microseconds


@register(
    "scale_salted_join",
    category="join",
    doc=f"Skew-proof fact-dim join: fact rows get salt = pmod(event_id, "
    f"{_SALT}), the dim side replicates x{_SALT}, and the join runs on "
    "(key, salt) so one hot key spreads over 8 shuffle partitions. "
    "Result (and oracle) is exactly the plain join.",
    oracle="""
        SELECT c_mktsegment,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2)
                   AS total_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(_SALT)).cast("int")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT - 1))))
    )
    return (
        ev.join(cust, (ev.user_id == cust.c_custkey) & (ev.salt == cust.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2).alias(
                "total_value"
            ),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "scale_bucketed_range_join",
    category="join",
    doc="Big-big range self-join (same-user event pairs within 30 min) as "
    "an equi-join: bucket = ts_us div window; the left side explodes to "
    "buckets {b-1, b, b+1} so every qualifying pair meets in exactly one "
    "bucket; the exact |dt| predicate then filters. No nested loop, no "
    "broadcast of a fact table.",
    oracle=f"""
        SELECT a.user_id,
               COUNT(*) AS n_pairs,
               CAST(MAX(abs(epoch_us(b.ts) - epoch_us(a.ts))) AS BIGINT) AS max_gap_us
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND a.event_id < b.event_id
         AND abs(epoch_us(b.ts) - epoch_us(a.ts)) <= {_WINDOW_US}
        GROUP BY a.user_id
        ORDER BY a.user_id
    """,
)
def scale_bucketed_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    bucket = F.expr(f"us div {_WINDOW_US}")
    a = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("id_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(bucket - 1, bucket, bucket + 1)).alias("bucket"),
    )
    b = ev.select(
        F.col("user_id"),
        F.col("event_id").alias("id_b"),
        F.col("us").alias("us_b"),
        bucket.alias("bucket"),
    )
    pairs = a.join(b, ["user_id", "bucket"]).filter(
        (F.col("id_a") < F.col("id_b"))
        & (F.abs(F.col("us_b") - F.col("us_a")) <= _WINDOW_US)
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count("*").alias("n_pairs"),
            F.max(F.abs(F.col("us_b") - F.col("us_a"))).alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "funnel_conversion",
    category="window",
    doc="Event-sequence funnel (view -> click -> purchase, strictly "
    "ordered per user): each stage is a min-timestamp aggregate joined "
    "against the previous stage's frontier — 3 narrow aggs over a "
    "pre-filtered fact, no per-user sorting of full histories.",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
            WHERE e.event_type = 'click' GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t
            FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
            WHERE e.event_type = 'purchase' GROUP BY e.user_id
        )
        SELECT stage, n_users FROM (
            SELECT 1 AS ord, 'view' AS stage, COUNT(*) AS n_users FROM v
            UNION ALL SELECT 2, 'view>click', COUNT(*) FROM c
            UNION ALL SELECT 3, 'view>click>purchase', COUNT(*) FROM p
        ) ORDER BY ord
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def stage_frontier(event_type: str, prev: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(
                F.broadcast(prev.select(F.col("user_id").alias("pu"), F.col("t").alias("pt"))),
                (F.col("user_id") == F.col("pu")) & (F.col("ts") > F.col("pt")),
            )
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage_frontier("view", None)
    c = stage_frontier("click", v)
    p = stage_frontier("purchase", c)
    rows = [
        v.agg(F.lit(1).alias("ord"), F.lit("view").alias("stage"), F.count("*").alias("n_users")),
        c.agg(F.lit(2).alias("ord"), F.lit("view>click").alias("stage"), F.count("*").alias("n_users")),
        p.agg(F.lit(3).alias("ord"), F.lit("view>click>purchase").alias("stage"), F.count("*").alias("n_users")),
    ]
    out = rows[0].unionByName(rows[1]).unionByName(rows[2])
    return out.orderBy("ord").select("stage", "n_users")


def _sql_zvalue(x: str, y: str) -> str:
    """DuckDB bit-interleave of the low 16 bits of x (even) and y (odd)."""
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "scale_zorder_layout",
    category="scale",
    doc="Z-order (Morton curve) layout key over (custkey, order day): "
    "interleaving the low 16 bits of both dimensions gives a single "
    "sort key whose ranges bound BOTH columns at once — the layout "
    "trick behind multi-dimensional data skipping (Delta/Iceberg "
    "OPTIMIZE ZORDER).  The per-z-bucket min/max spans in the output "
    "ARE the file-skipping stats a 100 TB table would store: both "
    "per-bucket spans come out far under the global span, so a "
    "predicate on either dimension prunes most buckets.  All bit "
    "arithmetic is integer and JVM-side (shiftleft/shiftright/AND "
    "fold into whole-stage codegen; no UDF).",
    oracle=f"""
        WITH z AS (
            SELECT o_custkey AS x,
                   datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS y,
                   {_sql_zvalue("o_custkey",
                                "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))")}
                       AS zval
            FROM orders
        )
        SELECT zval >> 20 AS z_bucket,
               COUNT(*) AS n,
               MIN(x) AS x_min, MAX(x) AS x_max,
               MIN(y) AS y_min, MAX(y) AS y_max,
               MAX(x) - MIN(x) AS x_span,
               MAX(y) - MIN(y) AS y_span
        FROM z
        GROUP BY z_bucket
        ORDER BY z_bucket
    """,
)
def scale_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.layout import morton_interleave16

    orders = load_table(spark, sf_dir, "orders")
    x = F.col("o_custkey")
    y = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).cast("bigint")
    z = orders.select(x.alias("x"), y.alias("y"), morton_interleave16(x, y).alias("zval"))
    return (
        z.groupBy(F.shiftright(F.col("zval"), 20).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            (F.max("x") - F.min("x")).alias("x_span"),
            (F.max("y") - F.min("y")).alias("y_span"),
        )
        .orderBy("z_bucket")
    )


@register(
    "scale_incremental_agg",
    category="scale",
    doc="Incremental aggregate maintenance: the historical per-(user, "
    "day) rollup (events before the cutoff day) is merged with a "
    "freshly-aggregated delta batch (the cutoff day onward) by "
    "unioning partials and re-aggregating — the sum/count partials "
    "compose exactly because they are integers, so the maintained "
    "state is PROVEN equal to a full recompute (the oracle IS the "
    "full recompute).  At 100 TB this is the pattern that replaces "
    "re-reading months of history every run with one delta-sized "
    "read plus a merge keyed like the state (one shuffle).  avg is "
    "derived at read time from (sum, count) — never stored, since "
    "averages don't compose.",
    oracle="""
        SELECT user_id,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS DOUBLE)
                   / (100 * COUNT(*)) AS avg_value
        FROM events
        WHERE user_id % 10 = 0
        GROUP BY user_id, day
        ORDER BY user_id, day
    """,
)
def scale_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("2024-01-25").cast("timestamp")
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    vc = F.round(F.col("value") * 100, 0).cast("long")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("day_ts")
        ).agg(F.count(F.lit(1)).alias("n"), F.sum(vc).alias("cents"))

    state = rollup(ev.filter(F.col("ts") < cutoff))  # persisted rollup
    delta = rollup(ev.filter(F.col("ts") >= cutoff))  # the new batch
    merged = (
        state.unionByName(delta)
        .groupBy("user_id", "day_ts")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    return merged.select(
        "user_id",
        F.date_format("day_ts", "yyyy-MM-dd").alias("day"),
        "n",
        "cents",
        (F.col("cents").cast("double") / (100 * F.col("n"))).alias("avg_value"),
    ).orderBy("user_id", "day")


@register(
    "scale_interval_overlap_join",
    category="scale",
    doc="Interval-overlap join, bucketized: overlapping pairs of 14-day "
    "order windows within each customer, found by exploding every "
    "interval onto the ISO weeks it covers, equi-joining on "
    "(custkey, week) — never a theta-join over the full table — "
    "deduping pairs found in multiple shared weeks, then applying the "
    "exact open-interval overlap predicate (a.start < b.end AND "
    "b.start < a.end).  The oracle does the quadratic-within-customer "
    "join directly; both agree, proving bucketization loses nothing "
    "(a 14-day window spans at most 3 ISO weeks, so the fan-out is "
    "bounded at 3 rows per interval at ANY scale).",
    oracle="""
        WITH iv AS (
            SELECT o_custkey, o_orderkey,
                   o_orderdate AS s,
                   o_orderdate + INTERVAL 14 DAY AS e
            FROM orders WHERE o_custkey % 18 = 0
        )
        SELECT a.o_custkey AS custkey,
               COUNT(*) AS n_overlapping_pairs,
               CAST(SUM(a.o_orderkey + b.o_orderkey) AS BIGINT) AS pair_keysum
        FROM iv a JOIN iv b
          ON a.o_custkey = b.o_custkey
         AND a.o_orderkey < b.o_orderkey
         AND a.s < b.e AND b.s < a.e
        GROUP BY a.o_custkey
        ORDER BY custkey
    """,
)
def scale_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 18 == 0)
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").alias("s"),
        (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("e"),
    )
    week = lambda c: F.floor(  # noqa: E731
        F.datediff(F.col(c).cast("date"), F.lit("2024-01-01").cast("date")) / 7
    )
    # explode each interval onto its covered week buckets (<= 3 of them)
    bucketed = iv.select(
        "o_custkey",
        "o_orderkey",
        "s",
        "e",
        F.explode(F.sequence(week("s"), week("e"))).alias("wk"),
    )
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.wk") == F.col("b.wk"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .filter((F.col("a.s") < F.col("b.e")) & (F.col("b.s") < F.col("a.e")))
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.o_orderkey").alias("ka"),
            F.col("b.o_orderkey").alias("kb"),
        )
        .distinct()  # same pair can share up to 3 week buckets
    )
    return (
        pairs.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_overlapping_pairs"),
            F.sum(F.col("ka") + F.col("kb")).cast("bigint").alias("pair_keysum"),
        )
        .orderBy("custkey")
    )


@register(
    "feat_hashing_trick",
    category="scale-pattern",
    doc="Feature hashing (the hashing trick): categorical event_type maps "
    "to one of 8 feature buckets via the portable hash, with a second "
    "independent hash choosing a +/-1 sign so collisions cancel in "
    "expectation (Weinberger et al. 2009).  Output is the SPARSE long "
    "form (user, bucket, count, signed_sum) — the only shape that "
    "scales: a dense vector column explodes storage at large K, and "
    "the long form is one groupBy shuffle, mergeable incrementally.  "
    "No vocabulary pass needed — the point of the trick at 100 TB: "
    "new categories never require re-fitting an encoder.",
    oracle=f"""
        WITH h AS (
            SELECT user_id,
                   {portable_hash_expr("event_type", salt='fh')} % 8 AS bucket,
                   CASE WHEN {portable_hash_expr("event_type", salt='fhsign')}
                             % 2 = 0 THEN 1 ELSE -1 END AS sgn
            FROM events WHERE user_id % 7 = 0
        )
        SELECT user_id,
               CAST(bucket AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(sgn) AS BIGINT) AS signed_sum
        FROM h
        GROUP BY user_id, bucket
        ORDER BY user_id, bucket
    """,
)
def feat_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    bucket = F.pmod(portable_hash64("event_type", salt="fh"), F.lit(8)).cast("int")
    sgn = F.when(
        F.pmod(portable_hash64("event_type", salt="fhsign"), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        ev.select("user_id", bucket.alias("bucket"), sgn.alias("sgn"))
        .groupBy("user_id", "bucket")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("sgn").cast("bigint").alias("signed_sum"),
        )
        .orderBy("user_id", "bucket")
    )


@register(
    "funnel_time_bounded",
    category="scale-pattern",
    doc="Time-bounded conversion funnel: first view -> first click within "
    "30 minutes -> first purchase within 2 hours of that click, per "
    "user.  Three window passes over ONE shuffle on user_id (each stage "
    "anchor is a windowed conditional min over the previous anchor — no "
    "self-joins, no re-scan), then one global rollup.  Conversion lags "
    "are exact epoch-microsecond integers.  The attribution query shape "
    "that at 100 TB must NOT be written as three joins of the events "
    "table to itself.",
    oracle="""
        WITH va AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                       AS v_us
            FROM events GROUP BY user_id
        ),
        ca AS (
            SELECT e.user_id,
                   MIN(CASE WHEN e.event_type = 'click'
                            AND epoch_us(e.ts) > va.v_us
                            AND epoch_us(e.ts) <= va.v_us + 1800000000
                       THEN epoch_us(e.ts) END) AS c_us,
                   ANY_VALUE(va.v_us) AS v_us
            FROM events e JOIN va ON va.user_id = e.user_id
            WHERE va.v_us IS NOT NULL
            GROUP BY e.user_id
        ),
        pa AS (
            SELECT e.user_id,
                   MIN(CASE WHEN e.event_type = 'purchase'
                            AND epoch_us(e.ts) > ca.c_us
                            AND epoch_us(e.ts) <= ca.c_us + 7200000000
                       THEN epoch_us(e.ts) END) AS p_us,
                   ANY_VALUE(ca.c_us) AS c_us,
                   ANY_VALUE(ca.v_us) AS v_us
            FROM events e JOIN ca ON ca.user_id = e.user_id
            GROUP BY e.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_viewers,
               CAST(COUNT(c_us) AS BIGINT) AS n_clicked_30m,
               CAST(COUNT(p_us) AS BIGINT) AS n_purchased_2h,
               CAST(COALESCE(SUM(c_us - v_us), 0) AS BIGINT)
                   AS total_click_lag_us,
               CAST(COALESCE(SUM(p_us - c_us), 0) AS BIGINT)
                   AS total_purchase_lag_us
        FROM pa
    """,
)
def funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "v_us",
            F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(w),
        )
        .withColumn(
            "c_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("us") > F.col("v_us"))
                    & (F.col("us") <= F.col("v_us") + 1_800_000_000),
                    F.col("us"),
                )
            ).over(w),
        )
        .withColumn(
            "p_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("c_us"))
                    & (F.col("us") <= F.col("c_us") + 7_200_000_000),
                    F.col("us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("v_us").alias("v_us"),
        F.first("c_us").alias("c_us"),
        F.first("p_us").alias("p_us"),
    )
    return per_user.filter(F.col("v_us").isNotNull()).agg(
        F.count("*").alias("n_viewers"),
        F.count("c_us").alias("n_clicked_30m"),
        F.count("p_us").alias("n_purchased_2h"),
        F.coalesce(F.sum(F.col("c_us") - F.col("v_us")), F.lit(0))
        .cast("long")
        .alias("total_click_lag_us"),
        F.coalesce(F.sum(F.col("p_us") - F.col("c_us")), F.lit(0))
        .cast("long")
        .alias("total_purchase_lag_us"),
    )


@register(
    "snap_time_travel",
    category="scale-pattern",
    doc="Manifest-based dataset snapshots (operators/snapshots.py) — the "
    "training-data reproducibility primitive: v1 commits orders before "
    "1997; v2 commits the rest while REUSING v1's files (a new version "
    "is a new manifest, not a data copy — the lakehouse trick).  Both "
    "versions are then read back via their manifests (time travel) and "
    "summarized with exact integers; v1 must be unchanged by v2's "
    "write.  The atomic-rename manifest commit and crash-safety are "
    "runtime-tested in tests/test_snapshots.py.",
    oracle="""
        SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        ORDER BY version
    """,
)
def snap_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_files,
        snapshot_read,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    table_dir = tempfile.mkdtemp(prefix="snap_orders_")
    v1 = snapshot_write(orders.filter(F.col("o_orderdate") < cutoff), table_dir)
    v2 = snapshot_write(
        orders.filter(F.col("o_orderdate") >= cutoff),
        table_dir,
        reuse_files=snapshot_files(table_dir, v1),
    )
    parts = []
    for v in (v1, v2):
        parts.append(
            snapshot_read(spark, table_dir, v).select(
                F.lit(v).cast("int").alias("version"),
                F.lit(1).alias("__one"),
                F.col("o_orderkey"),
            )
        )
    both = parts[0].unionByName(parts[1])
    return (
        both.groupBy("version")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("version")
    )


@register(
    "snap_upsert_merge",
    category="scale-pattern",
    doc="Copy-on-write MERGE at the manifest layer "
    "(operators/snapshots.py:snapshot_upsert) — the CDC-apply primitive "
    "lakehouse tables are built on: an initial customer load takes two "
    "update batches (balance adjustments keyed by custkey, later batch "
    "wins), each committed as a new snapshot version that rewrites ONLY "
    "the parquet files containing an affected key (file-level pruning "
    "via _metadata.file_path semi-join) and reuses the rest by "
    "reference.  The latest version is then summarized in exact integer "
    "cents per custkey%10 bucket; the oracle replays the same two-batch "
    "merge as a CASE expression.  Streaming foreachBatch drives the "
    "identical operator in tests/test_snapshots.py.  At 100 TB a point "
    "update rewrites one file, not the table — and every intermediate "
    "version stays readable (the training-set audit trail).",
    oracle="""
        WITH final AS (
            SELECT c_custkey,
                   CASE
                     WHEN c_custkey % 7 = 0
                       THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) + 2000
                     WHEN c_custkey % 5 = 0
                       THEN CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000
                     ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT)
                   END AS bal_cents
            FROM customer
        )
        SELECT c_custkey % 10 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
        FROM final
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def snap_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import snapshot_read, snapshot_upsert

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    table_dir = tempfile.mkdtemp(prefix="snap_cust_")
    snapshot_upsert(spark, cust.repartitionByRange(4, "c_custkey"), table_dir, "c_custkey")
    batch1 = cust.filter(F.col("c_custkey") % 5 == 0).withColumn(
        "bal_cents", F.col("bal_cents") + 1000
    )
    snapshot_upsert(spark, batch1, table_dir, "c_custkey")
    batch2 = cust.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "bal_cents", F.col("bal_cents") + 2000
    )
    snapshot_upsert(spark, batch2, table_dir, "c_custkey")
    latest = snapshot_read(spark, table_dir)
    return (
        latest.groupBy((F.col("c_custkey") % 10).alias("bucket"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("bal_cents").cast("bigint").alias("sum_bal_cents"),
        )
        .orderBy("bucket")
    )


@register(
    "snap_changefeed",
    category="scale-pattern",
    doc="CDC EXTRACT between snapshot versions "
    "(operators/snapshots.py:snapshot_changes — Delta's table_changes): "
    "v1 loads customers, v2 MERGEs balance updates (custkey%5) and "
    "inserts synthetic new keys (custkey%13, offset +10M), then the "
    "changefeed v1->v2 emits exactly the inserted and updated keys with "
    "change_type.  Manifest-level pruning means only files EXCLUSIVE to "
    "one manifest are read and full-outer-joined — shared files are "
    "byte-identical by construction, so diffing two adjacent versions "
    "of a 100 TB table touches only the rewritten files.  Output is the "
    "per-change_type census in exact integer cents; the oracle replays "
    "the merge algebraically.",
    oracle="""
        WITH updates AS (
            SELECT c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000 AS bal_cents
            FROM customer WHERE c_custkey % 5 = 0
        ),
        inserts AS (
            SELECT c_custkey + 10000000 AS c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM customer WHERE c_custkey % 13 = 0
        ),
        changes AS (
            SELECT 'update' AS change_type, c_custkey, bal_cents FROM updates
            UNION ALL
            SELECT 'insert', c_custkey, bal_cents FROM inserts
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               CAST(SUM(bal_cents) AS BIGINT) AS bal_cents_sum
        FROM changes
        GROUP BY change_type
        ORDER BY change_type
    """,
)
def snap_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import snapshot_changes, snapshot_upsert

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    table_dir = tempfile.mkdtemp(prefix="snap_cdc_")
    v1 = snapshot_upsert(
        spark, cust.repartitionByRange(4, "c_custkey"), table_dir, "c_custkey"
    )
    batch = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .withColumn("bal_cents", F.col("bal_cents") + 1000)
        .unionByName(
            cust.filter(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"), "bal_cents"
            )
        )
    )
    v2 = snapshot_upsert(spark, batch, table_dir, "c_custkey")
    cf = snapshot_changes(
        spark, table_dir, v1, v2, "c_custkey", ["bal_cents"]
    )
    return (
        cf.groupBy("change_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c_custkey").cast("bigint").alias("key_sum"),
            F.sum("bal_cents").cast("bigint").alias("bal_cents_sum"),
        )
        .orderBy("change_type")
    )


@register(
    "snap_incremental_mv",
    category="scale-pattern",
    doc="Incremental materialized-view maintenance from the changefeed: "
    "a per-bucket (sum, count) MV over customers is built at v1, a CDC "
    "batch MERGEs into v2, and the MV is refreshed by applying ONLY the "
    "changefeed delta — update rows retract their old_ contribution and "
    "add the new (include_old=True), inserts add, nothing is "
    "re-aggregated.  The refresh cost tracks the CHANGED keys (which "
    "the changefeed already bounds by exclusive manifest files), not "
    "the table — the standard IVM argument, here end-to-end on the "
    "snapshot layer.  The oracle aggregates the FINAL state directly, "
    "so a pass proves incremental == full recompute in exact integer "
    "cents.",
    oracle="""
        WITH final AS (
            SELECT c_custkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) +
                   CASE WHEN c_custkey % 5 = 0 THEN 1000 ELSE 0 END AS bal_cents
            FROM customer
            UNION ALL
            SELECT c_custkey + 10000000,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT)
            FROM customer WHERE c_custkey % 13 = 0
        )
        SELECT c_custkey % 10 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents
        FROM final
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def snap_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_changes,
        snapshot_read,
        snapshot_upsert,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    table_dir = tempfile.mkdtemp(prefix="snap_mv_")
    v1 = snapshot_upsert(
        spark, cust.repartitionByRange(4, "c_custkey"), table_dir, "c_custkey"
    )
    bucket = (F.col("c_custkey") % 10).alias("bucket")
    mv0 = (
        snapshot_read(spark, table_dir, v1)
        .groupBy(bucket)
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("bal_cents").cast("bigint").alias("sum_bal_cents"),
        )
    )
    batch = (
        cust.filter(F.col("c_custkey") % 5 == 0)
        .withColumn("bal_cents", F.col("bal_cents") + 1000)
        .unionByName(
            cust.filter(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 10000000).alias("c_custkey"), "bal_cents"
            )
        )
    )
    v2 = snapshot_upsert(spark, batch, table_dir, "c_custkey")
    cf = snapshot_changes(
        spark, table_dir, v1, v2, "c_custkey", ["bal_cents"], include_old=True
    )
    # per-bucket delta: inserts add (new, +1 row); updates add (new - old, +0);
    # deletes would subtract (old, -1 row) — none are produced by MERGE
    delta = (
        cf.groupBy((F.col("c_custkey") % 10).alias("bucket"))
        .agg(
            F.sum(
                F.when(F.col("change_type") == "insert", F.lit(1))
                .when(F.col("change_type") == "delete", F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("dn"),
            F.sum(
                F.when(
                    F.col("change_type") == "delete", -F.col("old_bal_cents")
                ).otherwise(
                    F.col("bal_cents") - F.coalesce("old_bal_cents", F.lit(0))
                )
            )
            .cast("bigint")
            .alias("dsum"),
        )
    )
    refreshed = (
        mv0.join(delta, "bucket", "full_outer")
        .select(
            "bucket",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("bigint")
            .alias("n"),
            (
                F.coalesce("sum_bal_cents", F.lit(0))
                + F.coalesce("dsum", F.lit(0))
            )
            .cast("bigint")
            .alias("sum_bal_cents"),
        )
        .filter(F.col("n") > 0)
    )
    return refreshed.orderBy("bucket")


_WINSOR_SQL = """
    WITH b AS (
        SELECT lang,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS hi
        FROM documents
        GROUP BY lang
    ),
    c AS (
        SELECT d.lang,
               d.n_chars,
               CASE WHEN d.n_chars < b.lo THEN b.lo
                    WHEN d.n_chars > b.hi THEN b.hi
                    ELSE d.n_chars END AS w,
               CASE WHEN d.n_chars < b.lo THEN 1 ELSE 0 END AS clip_lo,
               CASE WHEN d.n_chars > b.hi THEN 1 ELSE 0 END AS clip_hi
        FROM documents d JOIN b ON b.lang = d.lang
    )
    SELECT lang,
           COUNT(*) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS sum_raw,
           CAST(SUM(w) AS BIGINT) AS sum_winsorized,
           CAST(SUM(clip_lo) AS BIGINT) AS n_clipped_low,
           CAST(SUM(clip_hi) AS BIGINT) AS n_clipped_high,
           CAST(MIN(w) AS BIGINT) AS w_min,
           CAST(MAX(w) AS BIGINT) AS w_max
    FROM c
    GROUP BY lang
    ORDER BY lang
"""


@register(
    "feat_winsorize",
    category="scale-pattern",
    doc="Percentile winsorization (robust feature clipping): per-group "
    "p05/p95 via percentile_disc — DISCRETE percentiles pick actual "
    "column values, so the clip bounds are integers that match "
    "bit-for-bit across engines (percentile_cont would interpolate "
    "doubles) — then every row clips to its group's bounds and the "
    "clipped distribution re-aggregates exactly.  Plan shape: one "
    "per-group sort for the bounds (at 100 TB: approx_percentile for "
    "the bounds, this exact form as the audit), one broadcast join of "
    "the tiny bounds table, one re-aggregation with map-side combine.",
    oracle=_WINSOR_SQL,
)
def feat_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_WINSOR_SQL)


@register(
    "feat_target_encode_loo",
    category="scale-pattern",
    doc="Leave-one-out target encoding (the leakage-safe categorical "
    "encoder for tree/GBM features): each order's nation encodes as the "
    "mean order value of its nation EXCLUDING the row itself — "
    "loo_cents = (sum_cents - y_cents) // (n - 1), all exact integer "
    "cents so both engines agree bit-for-bit (a double mean would "
    "diverge in accumulation order).  Rows in singleton groups yield "
    "NULL (nothing to borrow).  Plan shape at 100 TB: ONE map-side-"
    "combinable groupBy builds the per-nation (sum, count) table — "
    "25 rows — which broadcast-joins back onto the fact scan; the "
    "encode itself is a scan-speed projection, no second shuffle, and "
    "unlike naive per-fold recomputation the LOO algebra needs no "
    "fold split at all.",
    oracle="""
        WITH o AS (
            SELECT o_orderkey,
                   c.c_nationkey AS nat,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS y_cents
            FROM orders JOIN customer c ON c.c_custkey = o_custkey
        ),
        g AS (
            SELECT nat, SUM(y_cents) AS s, COUNT(*) AS n
            FROM o GROUP BY nat
        )
        SELECT o.o_orderkey,
               CAST(o.nat AS BIGINT) AS nat,
               o.y_cents,
               CAST(CASE WHEN g.n > 1
                         THEN (g.s - o.y_cents) // (g.n - 1)
                         ELSE NULL END AS BIGINT) AS loo_enc_cents
        FROM o JOIN g USING (nat)
        ORDER BY o.o_orderkey
    """,
)
def feat_target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        F.col("c_nationkey").alias("nat"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("y_cents"),
    )
    g = o.groupBy("nat").agg(
        F.sum("y_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        o.join(F.broadcast(g), "nat")
        .select(
            "o_orderkey",
            F.col("nat").cast("bigint").alias("nat"),
            "y_cents",
            F.when(
                F.col("n") > 1,
                F.expr("(s - y_cents) div (n - 1)"),
            )
            .cast("bigint")
            .alias("loo_enc_cents"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scale_two_pass_quantile",
    category="scale",
    doc="Exact p99 at scale WITHOUT a global sort: pass 1 histograms "
    "order-total cents into 1024 fixed-width bins (one map-side-combined "
    "aggregate) and locates the bin containing rank k = ceil(0.99 n); "
    "pass 2 ranks ONLY inside that bin (~1/1024 of the data) via a "
    "per-distinct-value cumulative count.  Everything stays a DataFrame "
    "— the global min/max/count and the target-bin row travel as 1-row "
    "broadcast joins, never driver collects.  A full-sort p99 shuffles "
    "the entire table; this shuffles 1024 bin counts plus one bin.  "
    "Rank arithmetic is exact-integer: k = (99n + 99) div 100, bin "
    "width = span div 1024 + 1 so bins cover [min, max] with index "
    "< 1024.  The oracle is the direct ROW_NUMBER form.",
    oracle="""
        WITH c AS (
            SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
            FROM orders
        ),
        kk AS (
            SELECT COUNT(*) AS n, (99 * COUNT(*) + 99) // 100 AS k FROM c
        ),
        ranked AS (
            SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c
        )
        SELECT CAST(kk.n AS BIGINT) AS n,
               CAST(kk.k AS BIGINT) AS k,
               CAST(r.cents AS BIGINT) AS p99_cents
        FROM kk JOIN ranked r ON r.rn = kk.k
    """,
)
def scale_two_pass_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.queries.util import cents
    from pyspark.sql.window import Window as W

    nbins = 1024
    vals = load_table(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("c")
    )
    stats = vals.agg(
        F.min("c").alias("mn"),
        F.max("c").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "mn",
        "n",
        F.expr(f"(mx - mn) div {nbins}").alias("w0"),
        F.expr("(99 * n + 99) div 100").alias("k"),
    ).select("mn", "n", "k", (F.col("w0") + 1).alias("width"))
    binned = (
        vals.crossJoin(F.broadcast(stats))
        .select(
            "c", "mn", "n", "k", "width",
            F.expr("(c - mn) div width").alias("bin"),
        )
    )
    hist = binned.groupBy("bin", "n", "k", "mn", "width").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    )
    # the single bin whose cumulative count first reaches rank k
    target = (
        cum.where(F.col("cum") >= F.col("k"))
        .orderBy("bin")
        .limit(1)
        .select("bin", "mn", "width", "n", "k", (F.col("cum") - F.col("cnt")).alias("below"))
    )
    # pass 2: rank only inside the target bin, per distinct value
    in_bin = (
        vals.crossJoin(F.broadcast(target))
        .where(F.expr("(c - mn) div width") == F.col("bin"))
    )
    per_val = in_bin.groupBy("c", "n", "k", "below").agg(
        F.count(F.lit(1)).alias("vcnt")
    )
    vcum = per_val.withColumn(
        "vcum",
        F.sum("vcnt").over(W.orderBy("c").rowsBetween(W.unboundedPreceding, 0)),
    )
    return (
        vcum.where(F.col("below") + F.col("vcum") >= F.col("k"))
        .orderBy("c")
        .limit(1)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("k").cast("bigint").alias("k"),
            F.col("c").cast("bigint").alias("p99_cents"),
        )
    )


@register(
    "feat_equidepth_bins",
    category="feature",
    doc="Equi-depth (quantile) feature binning via ntile(10) under a "
    "TOTAL deterministic order (value cents, then orderkey — ties "
    "broken exactly the same in any engine; ntile without a total "
    "order is nondeterministic and a known cross-run poison for "
    "training reproducibility).  Output: per-bin row count and exact "
    "[lo, hi] cent boundaries — the bin edges a feature store "
    "publishes.  Scale note: a global ntile is a full sort; at 100 TB "
    "use scale_two_pass_quantile's histogram pass to get edges from "
    "1024 bin counts instead, then assign bins scan-side — this entry "
    "is the exact-reference form those edges are validated against.",
    oracle="""
        WITH c AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
            FROM orders
        ),
        t AS (
            SELECT cents,
                   NTILE(10) OVER (ORDER BY cents, o_orderkey) AS bin
            FROM c
        )
        SELECT bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(cents) AS BIGINT) AS lo_cents,
               CAST(MAX(cents) AS BIGINT) AS hi_cents
        FROM t GROUP BY bin ORDER BY bin
    """,
)
def feat_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.queries.util import cents
    from pyspark.sql.window import Window as W

    c = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents("o_totalprice").alias("cents")
    )
    binned = c.select(
        "cents",
        F.ntile(10).over(W.orderBy("cents", "o_orderkey")).alias("bin"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").cast("bigint").alias("lo_cents"),
            F.max("cents").cast("bigint").alias("hi_cents"),
        )
        .orderBy("bin")
    )


@register(
    "snap_wap_publish",
    category="scale-pattern",
    doc="Write-audit-publish (the Iceberg WAP workflow) on the manifest "
    "snapshot layer: a candidate batch lands as STAGED files (visible "
    "to no committed version), an audit query runs against only the "
    "staged files, and the batch either publishes — one atomic "
    "manifest commit appending the already-written files, zero data "
    "rewrite — or aborts without ever touching readers.  Here v1 = "
    "pre-1997 orders; a POISONED batch (every 97th total negated) is "
    "staged, fails the audit (negative totals), and is aborted; the "
    "clean remainder is staged, passes, and publishes as v2.  Output "
    "proves the reject never leaked: v1/v2 contents + the rejected "
    "row count, all recomputed by the oracle from the raw table.  "
    "Vacuum treats staged-marker files as live so an in-flight audit "
    "can't be garbage-collected (tests/test_snapshots_wap.py).",
    oracle="""
        SELECT 'v1' AS step, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'v2', CAST(COUNT(*) AS BIGINT), CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'audit_reject', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderkey % 97 = 0
        ORDER BY step
    """,
)
def snap_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_abort_staged,
        snapshot_publish,
        snapshot_read,
        snapshot_stage,
        snapshot_staged_read,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01").cast("timestamp")
    table_dir = tempfile.mkdtemp(prefix="snap_wap_")
    snapshot_write(orders.filter(F.col("o_orderdate") < cutoff), table_dir)

    rest = orders.filter(F.col("o_orderdate") >= cutoff)
    poisoned = rest.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice")).otherwise(
            F.col("o_totalprice")
        ),
    )

    def audit(branch: str) -> DataFrame:
        staged = snapshot_staged_read(spark, table_dir, branch)
        return staged.filter(F.col("o_totalprice") <= 0)

    # WAP round 1: poisoned batch -> audit rejects -> abort
    snapshot_stage(poisoned, table_dir, branch="etl")
    bad = audit("etl")
    reject_stats = bad.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("key_sum")
    ).collect()[0]
    assert reject_stats["n"] > 0
    snapshot_abort_staged(table_dir, branch="etl")

    # WAP round 2: clean batch -> audit passes -> publish
    snapshot_stage(rest, table_dir, branch="etl")
    assert audit("etl").limit(1).count() == 0
    v2 = snapshot_publish(table_dir, branch="etl")

    parts = [
        snapshot_read(spark, table_dir, 1).select(
            F.lit("v1").alias("step"), "o_orderkey"
        ),
        snapshot_read(spark, table_dir, v2).select(
            F.lit("v2").alias("step"), "o_orderkey"
        ),
    ]
    summary = (
        parts[0]
        .unionByName(parts[1])
        .groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
    )
    reject_row = spark.createDataFrame(
        [("audit_reject", int(reject_stats["n"]), int(reject_stats["key_sum"]))],
        "step string, n bigint, key_sum bigint",
    )
    return summary.unionByName(reject_row).orderBy("step")


@register(
    "funnel_attribution",
    category="window",
    doc="Multi-touch conversion attribution: every non-purchase event is "
    "a touchpoint; each touch binds to the user's NEXT purchase (a "
    "forward-looking min over a ROWS frame — one window pass, no "
    "touch-x-purchase join) within a 7-day window.  Two models emit "
    "side by side: last-touch (all credit to the final touch) and "
    "linear (credit split exactly — each touch gets floor(1e6/n) ppm "
    "and the LAST touch absorbs the remainder, so per-conversion "
    "credit sums to exactly 1,000,000 ppm and the channel totals are "
    "reconcilable to the conversion count, a property float splits "
    "lose).  Conversions are keyed by (user, purchase timestamp), so "
    "two purchases at the same microsecond count as ONE conversion — "
    "identical on both engines and the right call for dedup-sensitive "
    "attribution.  Plan shape at 100 TB: one shuffle by user_id serves both "
    "window passes (binding + rank), then one map-side-combinable "
    "groupBy by channel; no self-join of the event log.",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS us
            FROM events
        ),
        bound AS (
            SELECT event_id, user_id, event_type, us,
                   MIN(CASE WHEN event_type = 'purchase' THEN us END)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN CURRENT ROW
                                      AND UNBOUNDED FOLLOWING) AS conv_us
            FROM e
        ),
        touches AS (
            SELECT user_id, event_type AS channel, us, event_id, conv_us
            FROM bound
            WHERE event_type <> 'purchase'
              AND conv_us IS NOT NULL
              AND conv_us - us <= CAST(7 AS BIGINT) * 86400 * 1000000
        ),
        ranked AS (
            SELECT user_id, channel, conv_us,
                   COUNT(*) OVER (PARTITION BY user_id, conv_us) AS n,
                   ROW_NUMBER() OVER (PARTITION BY user_id, conv_us
                                      ORDER BY us DESC, event_id DESC)
                       AS rn
            FROM touches
        ),
        credited AS (
            SELECT channel,
                   CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_last,
                   (1000000 // n)
                       + CASE WHEN rn = 1
                              THEN 1000000 - n * (1000000 // n)
                              ELSE 0 END AS ppm
            FROM ranked
        )
        SELECT channel,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               CAST(SUM(is_last) AS BIGINT) AS last_touch_conversions,
               CAST(SUM(ppm) AS BIGINT) AS linear_credit_ppm
        FROM credited
        GROUP BY channel
        ORDER BY channel
    """,
)
def funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    bound = ev.withColumn(
        "conv_us",
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("us"))
        ).over(w_fwd),
    )
    touches = bound.filter(
        (F.col("event_type") != "purchase")
        & F.col("conv_us").isNotNull()
        & (F.col("conv_us") - F.col("us") <= 7 * 86400 * 1_000_000)
    ).select("user_id", F.col("event_type").alias("channel"), "us", "event_id", "conv_us")
    w_cnt = Window.partitionBy("user_id", "conv_us")
    w_rank = w_cnt.orderBy(F.col("us").desc(), F.col("event_id").desc())
    ranked = touches.select(
        "channel",
        F.count(F.lit(1)).over(w_cnt).alias("n"),
        F.row_number().over(w_rank).alias("rn"),
    )
    credited = ranked.select(
        "channel",
        F.when(F.col("rn") == 1, 1).otherwise(0).alias("is_last"),
        (
            F.expr("1000000L div n")
            + F.when(
                F.col("rn") == 1,
                F.lit(1_000_000) - F.col("n") * F.expr("1000000L div n"),
            ).otherwise(F.lit(0))
        ).alias("ppm"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("is_last").cast("bigint").alias("last_touch_conversions"),
            F.sum("ppm").cast("bigint").alias("linear_credit_ppm"),
        )
        .orderBy("channel")
    )


@register(
    "snap_partition_evolution",
    category="scale-pattern",
    doc="Partition-spec EVOLUTION at the manifest layer (operators/"
    "snapshots.py:snapshot_write_partitioned): v1 commits pre-1997 "
    "orders hive-partitioned by year; the table's strategy then "
    "changes and v2 appends 1997+ orders partitioned by (year, "
    "status) while REUSING v1's files untouched — Iceberg's headline "
    "trick, old data is never rewritten when partitioning evolves.  "
    "The reader prunes EACH FILE by the columns its own spec recorded "
    "(old files can't prune on status -> kept + residual filter), and "
    "because the writer routes one partition value per task (one file "
    "per hive dir), the pruned FILE COUNTS are deterministic and the "
    "oracle value-checks them as distinct-value counts — the pruning "
    "effectiveness itself is correctness-gated, not just the rows.  "
    "At 100 TB this is the difference between rewriting a petabyte "
    "table to re-partition it and committing a manifest.  (The spec "
    "is YEAR granularity: partitioning this table by month produced "
    "228 sub-MB files — the small-file anti-pattern — and the write "
    "fan-out, not the evolution machinery, dominated the family "
    "bench; VERDICT r6 #3.)",
    oracle="""
        WITH o AS (
            SELECT o_orderdate, o_orderstatus,
                   strftime(o_orderdate, '%Y') AS oy,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents
            FROM orders
        ),
        f1 AS (SELECT DISTINCT oy FROM o
               WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        f2 AS (SELECT DISTINCT oy, o_orderstatus FROM o
               WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        tot AS (SELECT (SELECT COUNT(*) FROM f1)
                     + (SELECT COUNT(*) FROM f2) AS n_files_total)
        SELECT 'year_new' AS scenario,
               CAST((SELECT COUNT(*) FROM f1 WHERE oy = '1998')
                  + (SELECT COUNT(*) FROM f2 WHERE oy = '1998')
                    AS BIGINT) AS n_files_read,
               CAST(tot.n_files_total AS BIGINT) AS n_files_total,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM o
                WHERE oy = '1998') AS n_rows,
               (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o
                WHERE oy = '1998') AS cents_sum
        FROM tot
        UNION ALL
        SELECT 'year_old',
               CAST((SELECT COUNT(*) FROM f1 WHERE oy = '1996')
                  + (SELECT COUNT(*) FROM f2 WHERE oy = '1996')
                    AS BIGINT),
               CAST(tot.n_files_total AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM o
                WHERE oy = '1996'),
               (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o
                WHERE oy = '1996')
        FROM tot
        UNION ALL
        SELECT 'status_all',
               CAST((SELECT COUNT(*) FROM f1)
                  + (SELECT COUNT(*) FROM f2 WHERE o_orderstatus = 'F')
                    AS BIGINT),
               CAST(tot.n_files_total AS BIGINT),
               (SELECT CAST(COUNT(*) AS BIGINT) FROM o
                WHERE o_orderstatus = 'F'),
               (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM o
                WHERE o_orderstatus = 'F')
        FROM tot
        ORDER BY scenario
    """,
)
def snap_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_files,
        snapshot_read_pruned,
        snapshot_write_partitioned,
    )
    from flow_spark.queries.util import cents

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "oy", F.date_format("o_orderdate", "yyyy")
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    table_dir = tempfile.mkdtemp(prefix="snap_evo_")
    v1 = snapshot_write_partitioned(
        orders.filter(F.col("o_orderdate") < cutoff), table_dir, spec=["oy"]
    )
    v2 = snapshot_write_partitioned(
        orders.filter(F.col("o_orderdate") >= cutoff),
        table_dir,
        spec=["oy", "o_orderstatus"],
        reuse_files=snapshot_files(table_dir, v1),
    )
    scenarios = [
        ("year_new", {"oy": "1998"}),
        ("year_old", {"oy": "1996"}),
        ("status_all", {"o_orderstatus": "F"}),
    ]
    parts = []
    for name, equals in scenarios:
        df, n_read, n_total = snapshot_read_pruned(spark, table_dir, v2, equals)
        for col, val in equals.items():  # residual filter (unprunable files)
            df = df.filter(F.col(col) == val)
        parts.append(
            df.agg(
                F.lit(name).alias("scenario"),
                F.lit(n_read).cast("bigint").alias("n_files_read"),
                F.lit(n_total).cast("bigint").alias("n_files_total"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(F.sum(cents("o_totalprice")), F.lit(0))
                .cast("bigint")
                .alias("cents_sum"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("scenario")


@register(
    "snap_multi_table_commit",
    category="scale-pattern",
    doc="Multi-table ATOMIC snapshot commit (operators/snapshots."
    "snapshot_commit_tables): fact and dimension tables publish "
    "together under one catalog version — one os.link of a catalog "
    "manifest pinning {table -> version}, Iceberg's catalog-commit "
    "protocol — so no reader can ever join new facts against stale "
    "dims (the torn fact+dimension read that per-table manifests "
    "cannot prevent).  Catalog v1 = pre-1997 per-customer order "
    "counts + the customer dim; catalog v2 updates ONLY the facts "
    "(the dim carries forward pinned, zero rewrite).  Output joins "
    "facts to dims per catalog version — both versions recomputed by "
    "the oracle from the raw tables, proving time travel returns the "
    "complete consistent pair.  A crash between the table writes and "
    "the catalog publish leaves the old catalog fully visible "
    "(tests/test_snapshots.py).",
    oracle="""
        WITH f1 AS (
            SELECT o_custkey AS custkey, COUNT(*) AS n_orders
            FROM orders
            WHERE o_custkey % 10 = 0
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY o_custkey
        ),
        f2 AS (
            SELECT o_custkey AS custkey, COUNT(*) AS n_orders
            FROM orders WHERE o_custkey % 10 = 0
            GROUP BY o_custkey
        ),
        d AS (
            SELECT c_custkey AS custkey, c_mktsegment AS segment
            FROM customer WHERE c_custkey % 10 = 0
        )
        SELECT 1 AS catalog_version, d.segment,
               CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(f1.n_orders) AS BIGINT) AS orders_total
        FROM f1 JOIN d USING (custkey)
        GROUP BY d.segment
        UNION ALL
        SELECT 2, d.segment, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(f2.n_orders) AS BIGINT)
        FROM f2 JOIN d USING (custkey)
        GROUP BY d.segment
        ORDER BY catalog_version, segment
    """,
)
def snap_multi_table_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_commit_tables,
        snapshot_read_catalog,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") % 10 == 0
    )
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 10 == 0
    )
    cutoff = F.lit("1997-01-01").cast("timestamp")
    facts_v1 = orders.filter(F.col("o_orderdate") < cutoff).groupBy(
        F.col("o_custkey").alias("custkey")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    facts_v2 = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    dims = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )

    root = tempfile.mkdtemp(prefix="snap_cat_")
    cv1, _ = snapshot_commit_tables({"facts": facts_v1, "dims": dims}, root)
    cv2, pins2 = snapshot_commit_tables({"facts": facts_v2}, root)
    assert pins2["dims"] == 1  # dim carried forward, never rewritten

    parts = []
    for cv in (cv1, cv2):
        tabs = snapshot_read_catalog(spark, root, version=cv)
        parts.append(
            tabs["facts"]
            .join(tabs["dims"], "custkey")
            .groupBy("segment")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_cust"),
                F.sum("n_orders").cast("bigint").alias("orders_total"),
            )
            .select(
                F.lit(cv).cast("bigint").alias("catalog_version"),
                "segment",
                "n_cust",
                "orders_total",
            )
        )
    return parts[0].unionByName(parts[1]).orderBy("catalog_version", "segment")


@register(
    "snap_zorder_optimize",
    category="scale-pattern",
    doc="OPTIMIZE ZORDER on the snapshot layer (operators/snapshots."
    "snapshot_optimize_zorder): the latest version rewrites clustered "
    "on the Morton curve of (custkey, order day) with DETERMINISTIC "
    "file assignment — z-bucket census to the driver, file id = rows-"
    "in-earlier-buckets div target, one hash repartition, one file per "
    "id — and per-file [min, max] stats on BOTH columns land in the "
    "manifest's col_stats.  Two range probes then read through "
    "snapshot_read's stats pruning, one per dimension: z-ordering is "
    "the layout where BOTH probes skip most files (a single-column "
    "sort can only serve one).  Inputs are range-bucketed into 16-bit "
    "space by driver-computed [min, max] before the interleave (raw "
    "keys above 65535 would wrap).  The oracle replays the scale + "
    "bucket/file rule exactly — selected/total FILE COUNTS are "
    "value-checked, not just the row aggregates.  The probe "
    "predicates re-apply as residual filters (stats pruning only "
    "shrinks the input split set), so row results are provably "
    "unchanged by the rewrite.",
    oracle=f"""
        WITH t AS (
            SELECT o_orderkey AS okey, o_custkey AS ck,
                   datediff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS dayn,
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        rng AS (
            SELECT MIN(ck) AS x_mn, (MAX(ck) - MIN(ck)) // 65536 + 1 AS xdiv,
                   MIN(dayn) AS y_mn,
                   (MAX(dayn) - MIN(dayn)) // 65536 + 1 AS ydiv
            FROM t
        ),
        z AS (
            SELECT t.*,
                   {_sql_zvalue("((t.ck - r.x_mn) // r.xdiv)",
                                "((t.dayn - r.y_mn) // r.ydiv)")} >> 20 AS zb
            FROM t CROSS JOIN rng r
        ),
        census AS (
            SELECT zb, COUNT(*) AS n FROM z GROUP BY zb
        ),
        packed AS (
            SELECT zb,
                   (SUM(n) OVER (ORDER BY zb
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) IS NULL) AS first_b,
                   COALESCE(SUM(n) OVER (ORDER BY zb
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) // 2000 AS zfile
            FROM census
        ),
        rowsf AS (
            SELECT z.*, p.zfile FROM z JOIN packed p USING (zb)
        ),
        fstats AS (
            SELECT zfile, MIN(ck) AS ck_mn, MAX(ck) AS ck_mx,
                   MIN(dayn) AS d_mn, MAX(dayn) AS d_mx
            FROM rowsf
            GROUP BY zfile
        ),
        nfiles AS (SELECT COUNT(*) AS total FROM fstats)
        SELECT p.probe,
               CAST(n.total AS BIGINT) AS files_total,
               CAST((SELECT COUNT(*) FROM fstats f
                     WHERE (p.probe = 'custkey' AND f.ck_mn <= p.hi
                            AND f.ck_mx >= p.lo)
                        OR (p.probe = 'orderday' AND f.d_mn <= p.hi
                            AND f.d_mx >= p.lo)) AS BIGINT)
                   AS files_selected,
               CAST((SELECT COUNT(*) FROM t
                     WHERE (CASE WHEN p.probe = 'custkey' THEN t.ck
                            ELSE t.dayn END) BETWEEN p.lo AND p.hi)
                    AS BIGINT) AS n_rows,
               CAST((SELECT COALESCE(SUM(cents), 0) FROM t
                     WHERE (CASE WHEN p.probe = 'custkey' THEN t.ck
                            ELSE t.dayn END) BETWEEN p.lo AND p.hi)
                    AS BIGINT) AS sum_cents
        FROM (VALUES ('custkey', 100, 300),
                     ('orderday', 9131, 9496)) p(probe, lo, hi)
        CROSS JOIN nfiles n
        ORDER BY p.probe
    """,
)
def snap_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_col_stats,
        snapshot_optimize_zorder,
        snapshot_read,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("dayn"),
        F.expr("cast(round(o_totalprice * 100, 0) as bigint)").alias("cents"),
    )
    td = tempfile.mkdtemp(prefix="snap_zorder_")
    snapshot_write(t.repartition(4), td)
    v2 = snapshot_optimize_zorder(
        spark, td, "ck", "dayn", shift=20, target_rows_per_file=2000
    )
    cs = snapshot_col_stats(td, v2)
    files_total = len({f for col in cs.values() for f in col})
    probes = [("custkey", "ck", 100, 300), ("orderday", "dayn", 9131, 9496)]
    parts = []
    for probe, col, lo, hi in probes:
        n_sel = sum(
            1 for st in cs[col].values() if st[0] <= hi and st[1] >= lo
        )
        got = (
            snapshot_read(spark, td, v2, key_range=(lo, hi), key_col=col)
            .filter(F.col(col).between(lo, hi))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.coalesce(F.sum("cents"), F.lit(0))
                .cast("bigint")
                .alias("sum_cents"),
            )
            .select(
                F.lit(probe).alias("probe"),
                F.lit(files_total).cast("bigint").alias("files_total"),
                F.lit(n_sel).cast("bigint").alias("files_selected"),
                "n_rows",
                "sum_cents",
            )
        )
        parts.append(got)
    return parts[0].unionByName(parts[1]).orderBy("probe")


@register(
    "snap_rollback",
    category="scale-pattern",
    doc="Snapshot RESTORE (operators/snapshots.py:snapshot_rollback) — "
    "the bad-deploy undo: v1 loads pre-1997 orders, v2 accidentally "
    "re-appends the same batch (the classic double-load), v3 rolls the "
    "table back to v1 with ONE atomic manifest commit and zero data "
    "movement; the bad version stays in history for audit.  The query "
    "reads the bad and the restored versions and summarizes both in "
    "exact integers; the oracle replays the double-load arithmetic "
    "(bad = 2x every key).  Concurrency and partitioned-table rollback "
    "are unit-tested in tests/test_snapshots.py.",
    oracle="""
        SELECT 'bad' AS state, CAST(2 * COUNT(*) AS BIGINT) AS n,
               CAST(2 * SUM(o_orderkey) AS BIGINT) AS key_sum
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        UNION ALL
        SELECT 'restored', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(o_orderkey) AS BIGINT)
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        ORDER BY state
    """,
)
def snap_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_files,
        snapshot_read,
        snapshot_rollback,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders")
    batch = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    table_dir = tempfile.mkdtemp(prefix="snap_rb_")
    v1 = snapshot_write(batch, table_dir)
    v2 = snapshot_write(batch, table_dir, reuse_files=snapshot_files(table_dir, v1))
    v3 = snapshot_rollback(table_dir, v1)
    assert v3 == v2 + 1
    parts = []
    for label, v in (("bad", v2), ("restored", v3)):
        parts.append(
            snapshot_read(spark, table_dir, v).select(
                F.lit(label).alias("state"), "o_orderkey"
            )
        )
    return (
        parts[0].unionByName(parts[1])
        .groupBy("state")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        )
        .orderBy("state")
    )


@register(
    "feat_quantile_normalize",
    category="feature",
    doc="Quantile normalization across groups (the batch-effect "
    "remover classic: force every group's value distribution onto the "
    "pooled reference), decided entirely on the distinct-cents-value "
    "histogram — the dq_ks_test scale shape, so no row-level sort "
    "ever happens: per (event_type, cents) the count and running "
    "count assign every DISTINCT VALUE to one of 10 equal-frequency "
    "bins via bin = (cum-1)*10 div n (ties share their last row's "
    "bin — deterministic without a row tiebreak), and the reference "
    "per bin is the pooled floor-mean across all groups.  Output per "
    "(group, bin): row count, group floor-mean, and the reference "
    "value the bin normalizes to — all exact integers.",
    oracle="""
        WITH hist AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
                   COUNT(*) AS c
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, v, c,
                   SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cm,
                   SUM(c) OVER (PARTITION BY event_type) AS n
            FROM hist
        ),
        binned AS (
            SELECT event_type, (cm - 1) * 10 // n AS bin, c, v * c AS sv
            FROM cum
        ),
        grp AS (
            SELECT event_type, bin, SUM(c) AS n, SUM(sv) AS sv
            FROM binned GROUP BY 1, 2
        ),
        ref AS (
            SELECT bin, SUM(sv) // SUM(n) AS ref_cents
            FROM grp GROUP BY bin
        )
        SELECT g.event_type,
               CAST(g.bin AS BIGINT) AS bin,
               CAST(g.n AS BIGINT) AS n,
               CAST(g.sv // g.n AS BIGINT) AS mean_cents,
               CAST(r.ref_cents AS BIGINT) AS ref_cents
        FROM grp g JOIN ref r USING (bin)
        ORDER BY g.event_type, g.bin
    """,
)
def feat_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    v = F.expr("cast(round(value * 100, 0) as bigint)")
    hist = ev.groupBy("event_type", v.alias("v")).agg(F.count(F.lit(1)).alias("c"))
    cum = hist.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(W.partitionBy("event_type").orderBy("v")).alias("cm"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    grp = (
        cum.select(
            "event_type",
            F.expr("(cm - 1) * 10 div n").alias("bin"),
            "c",
            (F.col("v") * F.col("c")).alias("sv"),
        )
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("n"), F.sum("sv").alias("sv"))
    )
    ref = grp.groupBy("bin").agg(F.expr("sum(sv) div sum(n)").alias("ref_cents"))
    return (
        grp.join(F.broadcast(ref), "bin")
        .select(
            "event_type",
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n").cast("bigint").alias("n"),
            F.expr("sv div n").cast("bigint").alias("mean_cents"),
            F.col("ref_cents").cast("bigint").alias("ref_cents"),
        )
        .orderBy("event_type", "bin")
    )


@register(
    "scale_hilbert_layout",
    category="scale",
    doc="Hilbert-curve layout key over (custkey, order day) — the "
    "space-filling curve Databricks liquid clustering and modern "
    "Iceberg writers prefer over Z-order because it has no diagonal "
    "jumps: consecutive d values are always grid neighbors, so "
    "per-bucket spans stay tighter on BOTH dimensions.  Inputs "
    "range-bucket into the 256x256 grid by their own min/max (one "
    "1-row aggregate, broadcast back — no driver round trip), then "
    "the textbook xy->d walk runs one round per bit (MSB-first "
    "quadrant digit + conditional reflect/swap) with IDENTICAL "
    "per-round expression text in Spark (selectExpr chain, "
    "functions/layout.hilbert_rounds_spark) and DuckDB (CTE chain, "
    "hilbert_rounds_sql): +, -, *, &, CASE only, so the curve index "
    "is value-checked bit-for-bit (and against a pure-python "
    "reference in tests).  Output: per-d-bucket counts and raw-key "
    "spans — the file-skipping stats a 100 TB table would store.",
    oracle=f"""
        WITH t AS (
            SELECT o_custkey AS rawx,
                   datediff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS rawy
            FROM orders
        ),
        rng AS (
            SELECT MIN(rawx) AS x_mn,
                   (MAX(rawx) - MIN(rawx)) // 256 + 1 AS xdiv,
                   MIN(rawy) AS y_mn,
                   (MAX(rawy) - MIN(rawy)) // 256 + 1 AS ydiv
            FROM t
        ),
        scaled AS (
            SELECT (t.rawx - r.x_mn) // r.xdiv AS x,
                   (t.rawy - r.y_mn) // r.ydiv AS y,
                   t.rawx, t.rawy
            FROM t CROSS JOIN rng r
        ),
        {hilbert_rounds_sql("scaled")}
        SELECT CAST(d // 64 AS BIGINT) AS h_bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(rawx) AS BIGINT) AS x_min,
               CAST(MAX(rawx) AS BIGINT) AS x_max,
               CAST(MAX(rawx) - MIN(rawx) AS BIGINT) AS x_span,
               CAST(MIN(rawy) AS BIGINT) AS y_min,
               CAST(MAX(rawy) AS BIGINT) AS y_max,
               CAST(MAX(rawy) - MIN(rawy) AS BIGINT) AS y_span
        FROM h{HILBERT_BITS}
        GROUP BY h_bucket ORDER BY h_bucket
    """,
)
def scale_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.layout import hilbert_rounds_spark

    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        F.col("o_custkey").cast("bigint").alias("rawx"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("rawy"),
    )
    rng = t.agg(
        F.min("rawx").alias("x_mn"),
        F.expr("(max(rawx) - min(rawx)) div 256 + 1").alias("xdiv"),
        F.min("rawy").alias("y_mn"),
        F.expr("(max(rawy) - min(rawy)) div 256 + 1").alias("ydiv"),
    )
    scaled = t.crossJoin(F.broadcast(rng)).selectExpr(
        "(rawx - x_mn) div xdiv AS x",
        "(rawy - y_mn) div ydiv AS y",
        "rawx",
        "rawy",
    )
    hd = hilbert_rounds_spark(scaled)
    return (
        hd.groupBy(F.expr("d div 64").cast("bigint").alias("h_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("rawx").cast("bigint").alias("x_min"),
            F.max("rawx").cast("bigint").alias("x_max"),
            (F.max("rawx") - F.min("rawx")).cast("bigint").alias("x_span"),
            F.min("rawy").cast("bigint").alias("y_min"),
            F.max("rawy").cast("bigint").alias("y_max"),
            (F.max("rawy") - F.min("rawy")).cast("bigint").alias("y_span"),
        )
        .orderBy("h_bucket")
    )


@register(
    "snap_version_diff",
    category="scale-pattern",
    doc="Row-level diff between two snapshot versions "
    "(operators/snapshots.snapshot_diff — Delta's table_changes for an "
    "arbitrary version pair): v1 = customer balances, v2 rewrites the "
    "table with every 7th key deleted, every remaining 5th key's cents "
    "bumped, and a synthetic insert per 50th key; ONE full-outer join "
    "on the key classifies every row insert/delete/update/unchanged "
    "with null-safe struct comparison over the value columns.  The "
    "audit query a training-data platform runs to answer 'what changed "
    "between the dataset the model saw and today'.  Output: per-class "
    "counts, key checksum, and old/new cents sums; the oracle replays "
    "the same set algebra straight off the source table.",
    oracle="""
        WITH base AS (
            SELECT c_custkey AS k,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS cents
            FROM customer
        ),
        cls AS (
            SELECT k,
                   CASE WHEN k % 7 = 0 THEN 'delete'
                        WHEN k % 5 = 0 THEN 'update'
                        ELSE 'unchanged' END AS change,
                   cents AS old_cents,
                   CASE WHEN k % 7 = 0 THEN NULL
                        WHEN k % 5 = 0 THEN cents + 1111
                        ELSE cents END AS new_cents
            FROM base
            UNION ALL
            SELECT k + 10000000, 'insert', NULL, cents
            FROM base WHERE k % 50 = 0
        )
        SELECT change,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS key_checksum,
               CAST(COALESCE(SUM(old_cents), 0) AS BIGINT) AS old_cents_sum,
               CAST(COALESCE(SUM(new_cents), 0) AS BIGINT) AS new_cents_sum
        FROM cls GROUP BY change ORDER BY change
    """,
)
def snap_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import snapshot_diff, snapshot_write

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.expr("cast(round(c_acctbal * 100, 0) as bigint)").alias("cents"),
    )
    td = tempfile.mkdtemp(prefix="snap_diff_")
    v1 = snapshot_write(base, td, stats_col="k")
    v2df = (
        base.filter(F.col("k") % 7 != 0)
        .withColumn(
            "cents",
            F.when(F.col("k") % 5 == 0, F.col("cents") + 1111).otherwise(
                F.col("cents")
            ),
        )
        .unionByName(
            base.filter(F.col("k") % 50 == 0).select(
                (F.col("k") + 10000000).alias("k"), "cents"
            )
        )
    )
    v2 = snapshot_write(v2df, td, stats_col="k")
    d = snapshot_diff(spark, td, v1, v2, key_col="k")
    return (
        d.groupBy("change")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("key_checksum"),
            F.coalesce(F.sum("old.cents"), F.lit(0))
            .cast("bigint")
            .alias("old_cents_sum"),
            F.coalesce(F.sum("new.cents"), F.lit(0))
            .cast("bigint")
            .alias("new_cents_sum"),
        )
        .orderBy("change")
    )


def _bloom_oracle_sql() -> str:
    from flow_spark.operators.dedup import MH_P, mh_coeffs

    # bit-array size replays snapshot_build_bloom's AUTO sizing: the
    # smallest power of two >= 10 x the largest per-file distinct-HASH
    # count — the same md5 hashes on both sides, so engine and oracle
    # always resolve the same width (exact integer selection from a
    # value table — no log2 floating point that could flip at an exact
    # power of two)
    pow2 = ", ".join(f"({1 << e})" for e in range(6, 31))
    probes = ",\n                ".join(
        f"(({a} * h + {b}) % {MH_P}) % (SELECT bits FROM bsel)"
        for a, b in (mh_coeffs(i) for i in range(3))
    )
    return f"""
        WITH o AS (
            SELECT o_orderkey // 4096 AS okb, o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                       AS cents
            FROM orders
        ),
        hs AS (
            SELECT okb, o_custkey,
                   CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                        AS BIGINT) % {MH_P} AS h
            FROM o
        ),
        need AS (
            SELECT MAX(cnt) * 10 AS need FROM (
                SELECT okb, COUNT(DISTINCT h) AS cnt
                FROM hs GROUP BY okb)
        ),
        bsel AS (
            SELECT COALESCE(
                MIN(b), {1 << 30}) AS bits
            FROM (VALUES {pow2}) t(b)
            WHERE b >= (SELECT need FROM need)
        ),
        filebits AS MATERIALIZED (
            SELECT DISTINCT okb, unnest([{probes}]) AS pos FROM hs
        ),
        probes AS (
            SELECT o_custkey AS k FROM (
                SELECT DISTINCT o_custkey FROM orders
                ORDER BY o_custkey LIMIT 5)
            UNION ALL SELECT MAX(o_custkey) + 1 FROM orders
            UNION ALL SELECT MAX(o_custkey) + 2 FROM orders
        ),
        ppos AS (
            SELECT k, pos FROM (
                SELECT DISTINCT k,
                       CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))
                            AS BIGINT) % {MH_P} AS h
                FROM probes
            ), LATERAL (SELECT unnest([{probes}]) AS pos)
        ),
        np AS (SELECT k, COUNT(DISTINCT pos) AS n FROM ppos GROUP BY k),
        scanned AS (
            SELECT p.k, b.okb
            FROM (SELECT DISTINCT k, pos FROM ppos) p
            JOIN filebits b ON b.pos = p.pos
            GROUP BY p.k, b.okb
            HAVING COUNT(DISTINCT p.pos) = (SELECT n FROM np WHERE np.k = p.k)
        ),
        tot AS (SELECT COUNT(DISTINCT okb) AS nf FROM o)
        SELECT p.k AS custkey,
               CAST(COALESCE(COUNT(o.o_custkey), 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(SUM(o.cents), 0) AS BIGINT) AS cents_sum,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM scanned s
                WHERE s.k = p.k) AS n_files_scanned,
               (SELECT CAST(nf AS BIGINT) FROM tot) AS n_files_total
        FROM probes p
        LEFT JOIN o ON o.o_custkey = p.k
        GROUP BY p.k
        ORDER BY custkey
    """


@register(
    "snap_bloom_pointlookup",
    category="scale-pattern",
    doc="File-level BLOOM-FILTER index point lookup (operators/"
    "snapshots.snapshot_build_bloom): orders are committed clustered "
    "on o_orderkey range buckets (one file per bucket), where [min, "
    "max] stats are useless for a lookup on the SCATTERED o_custkey — "
    "every file's custkey range matches.  A per-file bloom filter "
    "(bits AUTO-SIZED to the smallest power of two >= 10x the largest "
    "per-file distinct-key count — ~1.7% FPP at k=3, portable md5 "
    "family; the oracle re-derives the same size) answers 'definitely "
    "absent' from the manifest alone; the lookup scans only candidate "
    "files and re-filters rows, so false positives cost an extra scan "
    "but can never miss a row.  Probes: the 5 smallest custkeys plus "
    "two absent keys.  The oracle replays every set bit and every "
    "probe, so the PRUNED FILE COUNTS are value-checked, not just the "
    "rows — Parquet bloom filters / Delta bloom indexes, rebuilt at "
    "the manifest layer.  At 100 TB this turns a needle-in-haystack "
    "scan into reading a handful of files.",
    oracle=_bloom_oracle_sql(),
)
def snap_bloom_pointlookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_bloom_candidates,
        snapshot_build_bloom,
        snapshot_read_point,
        snapshot_write_partitioned,
    )
    from flow_spark.queries.util import cents

    orders = load_table(spark, sf_dir, "orders").select(
        F.expr("o_orderkey div 4096").alias("okb"),
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
    )
    table_dir = tempfile.mkdtemp(prefix="snap_bloom_")
    v1 = snapshot_write_partitioned(orders, table_dir, spec=["okb"])
    v2 = snapshot_build_bloom(
        spark, table_dir, "o_custkey", bits="auto", k=3, version=v1
    )
    # bounded driver-side probe panel (collect-tiny contract): 5 smallest
    # distinct custkeys + 2 keys guaranteed absent
    low = [
        r[0]
        for r in orders.select("o_custkey")
        .distinct()
        .orderBy("o_custkey")
        .limit(5)
        .collect()
    ]
    mx = orders.agg(F.max("o_custkey")).collect()[0][0]
    parts = []
    for key in low + [mx + 1, mx + 2]:
        cands, total = snapshot_bloom_candidates(table_dir, key, v2)
        got = snapshot_read_point(spark, table_dir, key, v2)
        parts.append(
            got.agg(
                F.lit(int(key)).cast("bigint").alias("custkey"),
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.coalesce(F.sum(cents("o_totalprice")), F.lit(0))
                .cast("bigint")
                .alias("cents_sum"),
                F.lit(len(cands)).cast("bigint").alias("n_files_scanned"),
                F.lit(total).cast("bigint").alias("n_files_total"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("custkey")


@register(
    "snap_delete_vectors",
    category="scale-pattern",
    doc="Merge-on-read DELETE via deletion vectors (operators/snapshots."
    "snapshot_delete): two successive DELETEs (GDPR-style scattered "
    "customer purge, then a value-predicate purge) each commit only a "
    "parquet sidecar of (file, row_index) pairs found by one scan — "
    "ZERO data files rewritten, proven by the files_unchanged flag "
    "comparing the manifests' file lists.  Every read path anti-joins "
    "the vectors centrally, deletes accumulate across versions, and "
    "time travel to the pre-delete version still sees every row "
    "(asserted in tests/test_snapshots.py).  Output: per-status live "
    "row counts and exact cents totals after both deletes — the "
    "oracle recomputes them as WHERE NOT (p1 OR p2).  At 100 TB this "
    "is the difference between a GDPR purge rewriting every touched "
    "file (copy-on-write) and writing a row-id sidecar.",
    oracle="""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_live,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents_live,
               CAST(1 AS BIGINT) AS files_unchanged
        FROM orders
        WHERE NOT (o_custkey % 10 = 3 OR o_totalprice > 400000.0)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
)
def snap_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_files,
        snapshot_read,
        snapshot_write,
    )
    from flow_spark.queries.util import cents

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    table_dir = tempfile.mkdtemp(prefix="snap_dv_")
    v1 = snapshot_write(orders.repartition(8), table_dir)
    snapshot_delete(spark, table_dir, "o_custkey % 10 = 3")
    v3 = snapshot_delete(spark, table_dir, "o_totalprice > 400000.0")
    unchanged = int(
        sorted(snapshot_files(table_dir, v3)) == sorted(snapshot_files(table_dir, v1))
    )
    return (
        snapshot_read(spark, table_dir, v3)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_live"),
            F.sum(cents("o_totalprice")).cast("bigint").alias("cents_live"),
            F.lit(unchanged).cast("bigint").alias("files_unchanged"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "snap_purge_key",
    category="scale-pattern",
    doc="Right-to-be-forgotten purge ACROSS HISTORY (operators/snapshots."
    "snapshot_purge_key): a customer table takes a merge-on-read DELETE "
    "(deletion vectors), then a GDPR erasure of the c_custkey % 97 = 11 "
    "subjects — unlike DELETE, the purge rewrites ONLY the affected "
    "files once (shared content stays shared), re-points every "
    "version's deletion vectors at the shifted row indexes, and "
    "republishes the manifests in place, so TIME TRAVEL TO v1 no "
    "longer serves the erased subjects either (Delta/Iceberg cannot "
    "express this as one operation — old versions keep the rows until "
    "retention expires).  Output: per-version live counts and exact "
    "cents totals (v1 = all minus purged; v2 = v1 minus the DV'd "
    "rows), value-checking both the erasure and the vector remap.  "
    "At 100 TB the cost is one column-pruned detection scan plus a "
    "rewrite of just the files that contain the subjects.",
    oracle="""
        WITH v1 AS (
            SELECT CAST(1 AS BIGINT) AS version,
                   CAST(COUNT(*) AS BIGINT) AS n_live,
                   CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents_live
            FROM customer
            WHERE c_custkey % 97 <> 11
        ),
        v2 AS (
            SELECT CAST(2 AS BIGINT) AS version,
                   CAST(COUNT(*) AS BIGINT) AS n_live,
                   CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100
                        AS BIGINT)) AS BIGINT) AS cents_live
            FROM customer
            WHERE c_custkey % 97 <> 11 AND c_custkey % 7 <> 3
        )
        SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY version
    """,
)
def snap_purge_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_delete,
        snapshot_purge_key,
        snapshot_read,
        snapshot_write,
    )
    from flow_spark.queries.util import cents

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    table_dir = tempfile.mkdtemp(prefix="snap_purge_")
    v1 = snapshot_write(
        cust.repartition(8), table_dir, stats_col="c_custkey"
    )
    v2 = snapshot_delete(spark, table_dir, "c_custkey % 7 = 3")
    subjects = [
        r[0]
        for r in cust.filter(F.col("c_custkey") % 97 == 11)
        .select("c_custkey")
        .collect()
    ]
    snapshot_purge_key(spark, table_dir, "c_custkey", subjects)

    def _summary(version: int) -> DataFrame:
        return (
            snapshot_read(spark, table_dir, version)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_live"),
                F.sum(cents("c_acctbal")).cast("bigint").alias("cents_live"),
            )
            .select(
                F.lit(version).cast("bigint").alias("version"),
                "n_live",
                "cents_live",
            )
        )

    return _summary(v1).unionByName(_summary(v2)).orderBy("version")


@register(
    "snap_add_column",
    category="scale-pattern",
    doc="ADD COLUMN with an INITIAL DEFAULT (operators/snapshots."
    "snapshot_add_column — Iceberg v3 initial-default / Delta ALTER "
    "TABLE ADD COLUMN): a customer table gains loyalty_pts in ONE "
    "manifest write (add_files_unchanged value-checks the zero-rewrite "
    "property); every pre-existing row reads the default 100 while an "
    "appended batch carries computed values — the fill applies only to "
    "files that PREDATE the column, so post-add rows (including real "
    "NULLs) are never touched.  At 100 TB widening a table is one "
    "metadata commit instead of a full rewrite.  Output: per-segment "
    "row count and exact loyalty-point sum at the head.",
    oracle="""
        WITH base AS (
            SELECT c_mktsegment AS seg, CAST(100 AS BIGINT) AS pts
            FROM customer
        ),
        appended AS (
            SELECT c_mktsegment AS seg, CAST(c_custkey % 1000 AS BIGINT) AS pts
            FROM customer WHERE c_custkey % 5 = 0
        ),
        unioned AS (
            SELECT * FROM base UNION ALL SELECT * FROM appended
        )
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(pts) AS BIGINT) AS pts_sum,
               CAST(1 AS BIGINT) AS add_files_unchanged
        FROM unioned GROUP BY seg ORDER BY seg
    """,
)
def snap_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_add_column,
        snapshot_append,
        snapshot_files,
        snapshot_read,
        snapshot_write,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    table_dir = tempfile.mkdtemp(prefix="snap_addcol_")
    v1 = snapshot_write(cust.repartition(4), table_dir)
    v2 = snapshot_add_column(table_dir, "loyalty_pts", "bigint", default=100)
    unchanged = int(
        sorted(snapshot_files(table_dir, v2))
        == sorted(snapshot_files(table_dir, v1))
    )
    snapshot_append(
        cust.filter(F.col("c_custkey") % 5 == 0).select(
            "c_custkey",
            "c_mktsegment",
            (F.col("c_custkey") % 1000).cast("bigint").alias("loyalty_pts"),
        ),
        table_dir,
    )
    return (
        snapshot_read(spark, table_dir)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("loyalty_pts").cast("bigint").alias("pts_sum"),
            F.lit(unchanged).cast("bigint").alias("add_files_unchanged"),
        )
        .orderBy("seg")
    )


@register(
    "snap_column_mapping",
    category="scale-pattern",
    doc="Schema evolution via COLUMN MAPPING (operators/snapshots."
    "snapshot_rename_column / snapshot_drop_column, VERDICT r5 #8 'new "
    "execution shape'): a customer-balance table takes a MERGE, then "
    "RENAME COLUMN cents -> balance_cents and DROP COLUMN name — both "
    "METADATA-ONLY commits (the manifests' file lists are compared and "
    "emitted as rename_files_unchanged/drop_files_unchanged, so the "
    "zero-rewrite property is value-checked, not claimed) — then a "
    "second MERGE under the NEW logical name.  Old files keep the "
    "physical column name forever and reads resolve them through the "
    "manifest's logical->physical map; post-rename MERGE survivors are "
    "written with physical names so the one table-wide map stays valid "
    "(exactly Delta's column-mapping invariant); stats_col follows the "
    "rename so MERGE file pruning keeps working.  At 100 TB a rename/"
    "drop that rewrote data would be a full-table job; this is one "
    "manifest write.  Output: per-mktsegment live count and exact "
    "final balance cents plus the two zero-rewrite flags.",
    oracle="""
        WITH u1 AS (
            SELECT o_custkey AS k,
                   arg_max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                AS BIGINT),
                           datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE))
                           * 10000000000 + o_orderkey) AS cents
            FROM orders WHERE o_orderkey % 13 = 0
            GROUP BY o_custkey
        ),
        u2 AS (
            SELECT o_custkey AS k,
                   arg_max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                AS BIGINT),
                           datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE))
                           * 10000000000 + o_orderkey) AS cents
            FROM orders WHERE o_orderkey % 17 = 0
            GROUP BY o_custkey
        ),
        final AS (
            SELECT c.c_mktsegment AS seg,
                   COALESCE(u2.cents, u1.cents,
                            CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                                 AS BIGINT)) AS bal
            FROM customer c
            LEFT JOIN u1 ON u1.k = c.c_custkey
            LEFT JOIN u2 ON u2.k = c.c_custkey
        )
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(bal) AS BIGINT) AS balance_sum,
               CAST(1 AS BIGINT) AS rename_files_unchanged,
               CAST(1 AS BIGINT) AS drop_files_unchanged
        FROM final GROUP BY seg ORDER BY seg
    """,
)
def snap_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_drop_column,
        snapshot_files,
        snapshot_read,
        snapshot_rename_column,
        snapshot_upsert,
        snapshot_write,
    )
    from flow_spark.queries.util import cents

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    initial = cust.select(
        F.col("c_custkey").alias("k"),
        cents("c_acctbal").alias("cents"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_name").alias("name"),
    ).repartitionByRange(4, "k")
    ord_key = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        * F.lit(10_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )

    def upd(mod: int, val_name: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderkey") % mod == 0)
            .groupBy(F.col("o_custkey").alias("k"))
            .agg(F.max_by(cents("o_totalprice"), ord_key).alias(val_name))
        )

    table_dir = tempfile.mkdtemp(prefix="snap_colmap_")
    snapshot_write(initial, table_dir, stats_col="k")
    v2 = snapshot_upsert(
        spark,
        upd(13, "cents").join(
            initial.select("k", "seg", "name"), "k", "inner"
        ),
        table_dir,
        key_col="k",
    )
    # metadata-only evolution: rename the money column, drop the name
    v3 = snapshot_rename_column(table_dir, "cents", "balance_cents")
    rename_unchanged = int(
        snapshot_files(table_dir, v2) == snapshot_files(table_dir, v3)
    )
    v4 = snapshot_drop_column(table_dir, "name")
    drop_unchanged = int(
        snapshot_files(table_dir, v3) == snapshot_files(table_dir, v4)
    )
    # MERGE under the NEW logical name (files keep the physical one)
    v5 = snapshot_upsert(
        spark,
        upd(17, "balance_cents").join(initial.select("k", "seg"), "k", "inner"),
        table_dir,
        key_col="k",
    )
    live = snapshot_read(spark, table_dir, v5)
    return (
        live.groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            F.sum("balance_cents").cast("bigint").alias("balance_sum"),
        )
        .select(
            "seg",
            "n_cust",
            "balance_sum",
            F.lit(rename_unchanged).cast("bigint").alias(
                "rename_files_unchanged"
            ),
            F.lit(drop_unchanged).cast("bigint").alias("drop_files_unchanged"),
        )
        .orderBy("seg")
    )


@register(
    "snap_shallow_clone",
    category="scale-pattern",
    doc="Zero-copy SHALLOW CLONE (operators/snapshots.snapshot_clone — "
    "Delta's CREATE TABLE ... SHALLOW CLONE): the clone's v1 manifest "
    "references the source's current files BY PATH (the zero_copy flag "
    "value-checks that the file lists are identical, i.e. no byte was "
    "copied), then the two tables take DIFFERENT MERGEs and diverge "
    "independently — clone writes land in the clone's own directory and "
    "copy-on-write detaches borrowed files naturally, while each "
    "table's vacuum may only reclaim files under its OWN directory "
    "(runtime-proven in test_shallow_clone_divergence_and_vacuum_"
    "safety).  At 100 TB this is how a dev/test fork or a what-if "
    "branch of a petabyte table costs one manifest write.  Output: "
    "per-side row count and exact balance cents after divergence.",
    oracle="""
        WITH u AS (
            SELECT o_custkey AS k,
                   arg_max(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                                AS BIGINT),
                           datediff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE))
                           * 10000000000 + o_orderkey) AS cents,
                   CAST(o_custkey % 2 AS BIGINT) AS side
            FROM orders WHERE o_orderkey % 19 = 0
            GROUP BY o_custkey, o_custkey % 2
        ),
        sides AS (SELECT 'source' AS side UNION ALL SELECT 'clone'),
        final AS (
            SELECT s.side, c.c_custkey,
                   COALESCE(
                       CASE WHEN s.side = 'source' AND u.side = 0
                                 THEN u.cents
                            WHEN s.side = 'clone' AND u.side = 1
                                 THEN u.cents END,
                       CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS bal
            FROM sides s CROSS JOIN customer c
            LEFT JOIN u ON u.k = c.c_custkey
        )
        SELECT side, CAST(COUNT(*) AS BIGINT) AS n_cust,
               CAST(SUM(bal) AS BIGINT) AS balance_sum,
               CAST(1 AS BIGINT) AS zero_copy
        FROM final GROUP BY side ORDER BY side
    """,
)
def snap_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_clone,
        snapshot_files,
        snapshot_read,
        snapshot_upsert,
        snapshot_write,
    )
    from flow_spark.queries.util import cents

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    initial = cust.select(
        F.col("c_custkey").alias("k"), cents("c_acctbal").alias("bal")
    ).repartitionByRange(4, "k")
    ord_key = (
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        * F.lit(10_000_000_000).cast("bigint")
        + F.col("o_orderkey")
    )
    upd = (
        orders.filter(F.col("o_orderkey") % 19 == 0)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.max_by(cents("o_totalprice"), ord_key).alias("bal"))
    )
    src = tempfile.mkdtemp(prefix="snap_clone_src_")
    tgt = tempfile.mkdtemp(prefix="snap_clone_tgt_")
    snapshot_write(initial, src, stats_col="k")
    snapshot_clone(src, tgt)
    zero_copy = int(snapshot_files(src, 1) == snapshot_files(tgt, 1))
    # diverge: even keys update the source, odd keys update the clone
    snapshot_upsert(spark, upd.filter(F.col("k") % 2 == 0), src, key_col="k")
    snapshot_upsert(spark, upd.filter(F.col("k") % 2 == 1), tgt, key_col="k")

    def side(table_dir: str, name: str) -> DataFrame:
        return (
            snapshot_read(spark, table_dir)
            .agg(
                F.lit(name).alias("side"),
                F.count(F.lit(1)).cast("bigint").alias("n_cust"),
                F.sum("bal").cast("bigint").alias("balance_sum"),
                F.lit(zero_copy).cast("bigint").alias("zero_copy"),
            )
        )

    return side(src, "source").unionByName(side(tgt, "clone")).orderBy("side")


@register(
    "snap_stats_agg",
    category="scale-pattern",
    doc="Metadata-only aggregate (Delta/Iceberg's stats-based query "
    "answering): COUNT(*)/MIN/MAX of the key over a 3-commit snapshot "
    "table — v1 written plain, v2 and v3 via snapshot_append (the "
    "write-once rebase-retry transactional append) — answered from "
    "parquet FOOTERS alone, zero data bytes read, no Spark job on the "
    "fast path.  At 100 TB these three aggregates are a driver-side "
    "manifest walk instead of a full scan.  The fast path proves "
    "exactness or falls back (deletion vectors, non-integer column, "
    "missing footer stats); tests/test_snapshots.py asserts fast==scan "
    "and zero jobs.  Oracle: the same aggregates straight off orders.",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT)      AS n_rows,
               CAST(MIN(o_orderkey) AS BIGINT) AS mn,
               CAST(MAX(o_orderkey) AS BIGINT) AS mx
        FROM orders
    """,
)
def snap_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_append,
        snapshot_stats_agg,
        snapshot_write,
    )

    orders = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01").cast("timestamp")
    later = F.lit("1997-06-01").cast("timestamp")
    table_dir = tempfile.mkdtemp(prefix="snap_statsagg_")
    snapshot_write(orders.filter(F.col("o_orderdate") < cutoff), table_dir)
    snapshot_append(
        orders.filter(
            (F.col("o_orderdate") >= cutoff) & (F.col("o_orderdate") < later)
        ),
        table_dir,
    )
    snapshot_append(orders.filter(F.col("o_orderdate") >= later), table_dir)
    return snapshot_stats_agg(spark, table_dir, "o_orderkey")


@register(
    "snap_hidden_partitioning",
    category="scale-pattern",
    doc="Hidden partitioning (Iceberg transforms): orders commit "
    "partitioned by year(o_orderdate) x bucket(8, o_custkey) — derived "
    "values live only in paths, the logical schema never shows them — "
    "then a point lookup on the minimum custkey prunes through the "
    "recorded transforms (driver-side md5 bucket twin, bit-identical "
    "to the write-side column).  The oracle replays the pruning "
    "arithmetic exactly: total files = distinct (year, bucket) pairs, "
    "selected = distinct years within the probed bucket (one file per "
    "hive dir by construction: rows repartition by the derived "
    "columns).  Output: matched rows, their key sum, and the two file "
    "counts.",
    oracle=f"""
        WITH tgt AS (SELECT MIN(o_custkey) AS k FROM orders),
        b AS (
            SELECT o_orderkey, o_custkey, year(o_orderdate) AS y,
                   {portable_hash_expr("CAST(o_custkey AS VARCHAR)")} % 8
                       AS bkt
            FROM orders
        )
        SELECT CAST((SELECT COUNT(*) FROM b, tgt WHERE o_custkey = tgt.k)
                   AS BIGINT) AS n_rows,
               CAST((SELECT SUM(o_orderkey) FROM b, tgt
                     WHERE o_custkey = tgt.k) AS BIGINT) AS key_sum,
               CAST((SELECT COUNT(DISTINCT y) FROM b, tgt
                     WHERE bkt = {portable_hash_expr("CAST(tgt.k AS VARCHAR)")} % 8)
                   AS BIGINT) AS n_sel,
               CAST((SELECT COUNT(DISTINCT (y, bkt)) FROM b) AS BIGINT)
                   AS n_tot
    """,
)
def snap_hidden_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from flow_spark.operators.snapshots import (
        snapshot_read_hidden,
        snapshot_write_partitioned,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    table_dir = tempfile.mkdtemp(prefix="snap_hidden_")
    snapshot_write_partitioned(
        orders, table_dir, ["year(o_orderdate)", "bucket(8, o_custkey)"]
    )
    k = orders.agg(F.min("o_custkey")).collect()[0][0]
    df, n_sel, n_tot = snapshot_read_hidden(spark, table_dir, {"o_custkey": k})
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
        F.lit(n_sel).cast("bigint").alias("n_sel"),
        F.lit(n_tot).cast("bigint").alias("n_tot"),
    )
