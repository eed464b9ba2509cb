"""As-of join queries (market-data style) over the events fixture:
each purchase matched with the user's most recent click at-or-before it.
Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.operators.asof import asof_join
from flow_spark.queries.registry import register


@register(
    "asof_join_backward",
    category="join",
    doc="As-of (backward) join via union+window — one shuffle, no Python "
    "in the hot path; oracle is DuckDB's native ASOF JOIN.",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(p.value, 2)                 AS purchase_value,
               ROUND(COALESCE(c.value, -1.0), 2) AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks_d c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
)
def asof_join_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("click_id"),
    )
    joined = asof_join(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 2).alias("last_click_value"),
    ).orderBy("event_id")


@register(
    "asof_join_forward",
    category="join",
    doc="As-of (forward) join: each purchase matched with the user's NEXT "
    "click at-or-after it — same single-shuffle union+window plan as the "
    "backward form with the frame flipped; oracle is DuckDB's native "
    "ASOF JOIN with the inequality reversed.",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id ASC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(p.value, 2)                 AS purchase_value,
               ROUND(COALESCE(c.value, -1.0), 2) AS next_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks_d c
          ON p.user_id = c.user_id AND p.ts <= c.ts
        ORDER BY p.event_id
    """,
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("click_id"),
    )
    joined = asof_join(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 2).alias("next_click_value"),
    ).orderBy("event_id")


@register(
    "asof_join_nearest",
    category="join",
    doc="Nearest-direction as-of join: each purchase matched with the "
    "user's CLOSEST click in either direction (sensor-fusion / event "
    "alignment semantics, pandas merge_asof direction='nearest').  "
    "Both candidates come out of ONE shuffle: the union+window pass "
    "evaluates the backward and forward frames over the same sort and "
    "a row-local comparison keeps the closer match (distance ties -> "
    "the earlier row).  The oracle composes two native DuckDB ASOF "
    "joins with the same tie rule.",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        ),
        b AS (
            SELECT p.event_id, c.value AS bv, c.ts AS bts
            FROM purchases p
            ASOF LEFT JOIN clicks_d c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        ),
        f AS (
            SELECT p.event_id, c.value AS fv, c.ts AS fts
            FROM purchases p
            ASOF LEFT JOIN clicks_d c
              ON p.user_id = c.user_id AND p.ts <= c.ts
        )
        SELECT p.event_id, p.user_id,
               ROUND(p.value, 2) AS purchase_value,
               ROUND(COALESCE(
                   CASE WHEN fts IS NULL
                             OR (bts IS NOT NULL
                                 AND epoch(p.ts) - epoch(bts)
                                     <= epoch(fts) - epoch(p.ts))
                        THEN bv ELSE fv END, -1.0), 2) AS nearest_click_value
        FROM purchases p
        JOIN b ON p.event_id = b.event_id
        JOIN f ON p.event_id = f.event_id
        ORDER BY p.event_id
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("click_id"),
    )
    joined = asof_join(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 2).alias(
            "nearest_click_value"
        ),
    ).orderBy("event_id")


@register(
    "asof_join_tolerance",
    category="join",
    doc="As-of backward join with a 30-minute tolerance (pandas "
    "merge_asof's max-gap knob): a stale match is NULLED, never "
    "replaced by an older row.  Same single-shuffle union+window plan "
    "— the matched right timestamp rides along and one comparison "
    "invalidates out-of-tolerance matches.  DuckDB oracle: native ASOF "
    "JOIN post-filtered by the same gap rule.",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(CASE WHEN c.ts IS NOT NULL
                          AND p.ts - c.ts <= INTERVAL 30 MINUTE
                     THEN c.value ELSE -1.0 END, 2) AS recent_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks_d c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("value"),
        F.col("event_id").alias("click_id"),
    )
    joined = asof_join(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
        tolerance_seconds=30 * 60,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 2).alias(
            "recent_click_value"
        ),
    ).orderBy("event_id")


@register(
    "asof_pointintime_features",
    category="join",
    doc="Point-in-time feature assembly (the feature-store join that keeps "
    "training data leakage-free): each purchase ('label event') is "
    "enriched with the user's most recent click value AND most recent "
    "view value at-or-before the purchase timestamp — two chained "
    "as-of joins, each the single-shuffle union+window plan from "
    "operators/asof.py, so features strictly respect event time (no "
    "future leakage) and the whole assembly is 2 shuffles on user_id.  "
    "At 100 TB each feature stream joins independently and the shuffles "
    "share the user_id partitioning.  Oracle: two native DuckDB ASOF "
    "LEFT JOINs.",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        views AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ),
        views_d AS (SELECT user_id, ts, value FROM views WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(p.value, 2)                 AS label_value,
               ROUND(COALESCE(c.value, -1.0), 2) AS f_last_click,
               ROUND(COALESCE(v.value, -1.0), 2) AS f_last_view
        FROM purchases p
        ASOF LEFT JOIN clicks_d c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ASOF LEFT JOIN views_d v
          ON p.user_id = v.user_id AND p.ts >= v.ts
        ORDER BY p.event_id
    """,
)
def asof_pointintime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value"), F.col("event_id").alias("click_id")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value"), F.col("event_id").alias("view_id")
    )
    with_click = asof_join(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
    ).withColumnRenamed("asof_value", "f_click")
    with_both = asof_join(
        with_click,
        views,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="view_id",
    ).withColumnRenamed("asof_value", "f_view")
    return with_both.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("label_value"),
        F.round(F.coalesce("f_click", F.lit(-1.0)), 2).alias("f_last_click"),
        F.round(F.coalesce("f_view", F.lit(-1.0)), 2).alias("f_last_view"),
    ).orderBy("event_id")


@register(
    "asof_join_skewsafe",
    category="join",
    doc="Backward as-of join via the SEGMENTED window plan "
    "(operators/asof.py:asof_join_segmented): the time segment joins "
    "the partition key, so a viral key's window sort is bounded by "
    "segment_minutes instead of the key's full history — the skew "
    "hazard of the plain union+window as-of removed for one extra "
    "map-side aggregate plus a (key, segment)-domain window.  Identical "
    "semantics to asof_join_backward (same DuckDB ASOF JOIN oracle; "
    "also hypothesis-fuzzed against the plain operator).",
    oracle="""
        WITH clicks AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'click'
        ),
        clicks_d AS (SELECT user_id, ts, value FROM clicks WHERE rn = 1),
        purchases AS (
            SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
            FROM events WHERE event_type = 'purchase'
        )
        SELECT p.event_id,
               p.user_id,
               ROUND(p.value, 2)                 AS purchase_value,
               ROUND(COALESCE(c.value, -1.0), 2) AS last_click_value
        FROM purchases p
        ASOF LEFT JOIN clicks_d c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id
    """,
)
def asof_join_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.asof import asof_join_segmented

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value"), F.col("event_id").alias("click_id")
    )
    joined = asof_join_segmented(
        purchases,
        clicks,
        ts_col="ts",
        by="user_id",
        value_cols=["value"],
        right_id_col="click_id",
        segment_minutes=1440,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("purchase_value"),
        F.round(F.coalesce("asof_value", F.lit(-1.0)), 2).alias("last_click_value"),
    ).orderBy("event_id")
