"""Window-function coverage: ranking, analytics (lag/lead), running and
range frames, top-k-per-group, share-of-total.

The reference has no window functions (SURVEY.md §2.2); this is declared
engine surface.  Scale note: each window partitions on a bounded key
(supplier, customer, returnflag) so state per partition stays small; a
window with no PARTITION BY (global total) is computed as a broadcast
scalar instead of a single-partition sort at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register
from flow_spark.queries.util import (
    SQL_REVENUE,
    SQL_REVENUE_CENTS,
    dec,
    revenue_cents,
    revenue_expr,
)


@register(
    "win_topk_per_group",
    category="window",
    doc="Top-3 parts by revenue per supplier: row_number over desc revenue. "
    "Revenue summed as exact scaled integers (util.py cents path) so the "
    "ORDER BY — and thus the ranks — is deterministic across engines and "
    "re-executions, and the hash agg runs on longs.  The fact is "
    "repartitioned by suppkey up front: hash(suppkey) satisfies BOTH the "
    "(suppkey, partkey) aggregation clustering and the window's suppkey "
    "partitioning, so one exchange serves the agg and the window (3 -> 2 "
    "exchanges; the (s,p) re-shuffle it removes carries ~n_groups rows, "
    "the dominant shuffle at high key cardinality).",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey, l_partkey,
                   SUM({SQL_REVENUE_CENTS}) AS r
            FROM lineitem GROUP BY l_suppkey, l_partkey
        ), ranked AS (
            SELECT l_suppkey, l_partkey, r,
                   ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                      ORDER BY r DESC, l_partkey ASC) AS rn
            FROM rev
        )
        SELECT l_suppkey, l_partkey,
               -- integer half-up (see util.cents_sum_money): double ROUND
               -- of .xx5 midpoints diverges between engines
               (CAST((r + 50) // 100 AS DOUBLE) / 100) AS revenue, rn
        FROM ranked WHERE rn <= 3
        ORDER BY l_suppkey, rn
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").repartition("l_suppkey")
    rev = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(revenue_cents()).alias("r"))
    w = W.partitionBy("l_suppkey").orderBy(F.desc("r"), F.asc("l_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_suppkey",
            "l_partkey",
            (F.expr("(r + 50) div 100").cast("double") / 100).alias("revenue"),
            "rn",
        )
        .orderBy("l_suppkey", "rn")
    )


@register(
    "win_rank_dense_ntile",
    category="window",
    doc="rank / dense_rank / ntile / percent_rank battery over customers.",
    oracle="""
        SELECT c_custkey,
               RANK()        OVER w AS rnk,
               DENSE_RANK()  OVER w AS drnk,
               NTILE(4)      OVER w AS quartile,
               ROUND(PERCENT_RANK() OVER w, 4) AS prank
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
        ORDER BY c_custkey
    """,
)
def win_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_custkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("prank"),
        )
        .orderBy("c_custkey")
    )


@register(
    "win_lag_lead_running",
    category="window",
    doc="lag / lead / running sum (rows frame) per customer order history.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(o_totalprice, 2) AS price,
               ROUND(LAG(o_totalprice)  OVER w, 2) AS prev_price,
               ROUND(LEAD(o_totalprice) OVER w, 2) AS next_price,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ORDER BY o_custkey, o_orderkey
    """,
)
def win_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("price"),
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.sum(dec("o_totalprice"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_total"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_range_frame",
    category="window",
    doc="RANGE frame: count of same-segment customers within ±100 acctbal.",
    oracle="""
        SELECT c_custkey,
               COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                              RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING) AS n_near
        FROM customer
        ORDER BY c_custkey
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal"))
        .rangeBetween(-100, 100)
    )
    return cust.select("c_custkey", F.count("*").over(w).alias("n_near")).orderBy("c_custkey")


@register(
    "win_share_of_total",
    category="window",
    doc=(
        "Share-of-total per group: nation revenue / global revenue. "
        "Computed as agg + broadcast scalar join (not a global window) so "
        "there is no single-partition bottleneck at scale."
    ),
    oracle=f"""
        WITH nrev AS (
            SELECT n_name, SUM({SQL_REVENUE}) AS r
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY n_name
        )
        SELECT n_name, CAST(ROUND(r, 2) AS DOUBLE) AS revenue,
               ROUND(CAST(r AS DOUBLE) / CAST(SUM(r) OVER () AS DOUBLE), 4) AS share
        FROM nrev
        ORDER BY n_name
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nrev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).alias("r"))
    )
    # nrev is tiny (bounded by nation count) -> cross-join the scalar total
    # instead of a global window; at 100 TB this avoids one-partition sort.
    total = nrev.agg(F.sum("r").alias("t"))
    return (
        nrev.crossJoin(F.broadcast(total))
        .select(
            "n_name",
            F.round("r", 2).cast("double").alias("revenue"),
            F.round(F.col("r").cast("double") / F.col("t").cast("double"), 4).alias("share"),
        )
        .orderBy("n_name")
    )


@register(
    "win_gaps_islands",
    category="window",
    doc="Gaps-and-islands: maximal runs of consecutive same-type events "
    "per user via the row_number-difference trick (two window passes + "
    "one agg, no self-join).",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) AS island
            FROM events WHERE user_id < 30
        )
        SELECT user_id, event_type,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS island_start,
               COUNT(*) AS run_len
        FROM seq
        GROUP BY user_id, event_type, island
        HAVING COUNT(*) >= 3
        ORDER BY user_id, island_start, event_type
    """,
)
def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w_all = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    return (
        seq.groupBy("user_id", "event_type", "island")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("island_start"),
            F.count("*").alias("run_len"),
        )
        .filter(F.col("run_len") >= 3)
        .select("user_id", "event_type", "island_start", "run_len")
        .orderBy("user_id", "island_start", "event_type")
    )


@register(
    "win_first_nth_value",
    category="window",
    doc="first_value / nth_value / cume_dist battery over each customer's "
    "order history (frame = full partition).",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
               ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price,
               ROUND(CUME_DIST() OVER (PARTITION BY o_custkey
                                       ORDER BY o_totalprice ASC, o_orderkey ASC), 4)
                   AS price_cume
        FROM orders
        WHERE o_custkey % 10 = 0
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate ASC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey
    """,
)
def win_first_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    w_cume = W.partitionBy("o_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
            F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
            F.round(F.cume_dist().over(w_cume), 4).alias("price_cume"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_correlated_decorrelated",
    category="window",
    doc="Correlated aggregate subquery decorrelated into a window: orders "
    "priced >20% above the average of the SAME customer's strictly "
    "earlier orders. The oracle states it as the per-row correlated "
    "subquery; the Spark plan is ONE window over a single shuffle on "
    "custkey with a RANGE frame ending at -1 day (strictly earlier, "
    "tie-safe) — the decorrelation that turns O(n^2) subquery execution "
    "into a linear pass at 100 TB. All comparisons are exact-integer "
    "cents (price*count*10 > 12*sum) so no FP boundary can flip a row "
    "between engines.",
    oracle="""
        WITH o AS (
            SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders
        )
        SELECT o1.o_orderkey, o1.o_custkey,
               CAST(o1.o_totalprice AS DOUBLE) AS price,
               (SELECT COUNT(*) FROM o o2
                WHERE o2.o_custkey = o1.o_custkey
                  AND o2.o_orderdate < o1.o_orderdate) AS n_prior,
               CAST((SELECT SUM(cents) FROM o o2
                     WHERE o2.o_custkey = o1.o_custkey
                       AND o2.o_orderdate < o1.o_orderdate)
                    / (100.0 * (SELECT COUNT(*) FROM o o2
                                WHERE o2.o_custkey = o1.o_custkey
                                  AND o2.o_orderdate < o1.o_orderdate))
                    AS DOUBLE) AS prior_avg
        FROM o o1
        WHERE o1.cents * 10 *
              (SELECT COUNT(*) FROM o o2
               WHERE o2.o_custkey = o1.o_custkey
                 AND o2.o_orderdate < o1.o_orderdate)
              > 12 * (SELECT SUM(cents) FROM o o2
                      WHERE o2.o_custkey = o1.o_custkey
                        AND o2.o_orderdate < o1.o_orderdate)
        ORDER BY o1.o_custkey, o1.o_orderkey
    """,
)
def win_correlated_decorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_totalprice",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "day_no"
        ),
    )
    # strictly-earlier frame: RANGE ends at -1 day, so same-day ties are
    # excluded exactly like the oracle's `<` predicate
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day_no")
        .rangeBetween(W.unboundedPreceding, -1)
    )
    return (
        o.withColumn("n_prior", F.count(F.lit(1)).over(w))
        .withColumn("sum_prior_cents", F.sum("cents").over(w))
        .filter(
            F.col("cents") * 10 * F.col("n_prior")
            > 12 * F.col("sum_prior_cents")
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").cast("double").alias("price"),
            "n_prior",
            (
                F.col("sum_prior_cents") / (100.0 * F.col("n_prior"))
            ).cast("double").alias("prior_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_distribution",
    category="window",
    doc="Distribution window functions: percent_rank and cume_dist of "
    "order price within each priority class, plus the rank they derive "
    "from. Both are single-division rationals of exact integers "
    "((rank-1)/(n-1), peers/n) so the doubles are bit-identical across "
    "engines. The window partitions on 5 priority keys; output is "
    "subsampled by orderkey so result size stays bounded while the "
    "window still computes over full partitions.",
    oracle="""
        WITH w AS (
            SELECT o_orderkey,
                   o_orderpriority,
                   CAST(o_totalprice AS DOUBLE) AS price,
                   RANK() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice) AS rnk,
                   PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice) AS pct_rank,
                   CUME_DIST() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice) AS cume
            FROM orders
        )
        SELECT o_orderkey, o_orderpriority, price, rnk, pct_rank, cume
        FROM w
        WHERE o_orderkey % 200 = 0
        ORDER BY o_orderkey
    """,
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice").cast("double").alias("price"),
            F.rank().over(w).alias("rnk"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter(F.col("o_orderkey") % 200 == 0)
        .orderBy("o_orderkey")
    )


@register(
    "win_rolling_median",
    category="window",
    doc="Rolling exact median over the last 15 observations per user, on "
    "scaled-integer cents: the median of longs is an integer or an "
    "exact .5 — both exactly representable doubles — so the result is "
    "bit-identical in any engine with NO rounding step (rounding a "
    ".5-capable double is the classic cross-engine trap).  One shuffle "
    "on user_id; the 15-row frame keeps per-row state O(frame).",
    oracle="""
        SELECT user_id, event_id,
               median(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 14 PRECEDING AND CURRENT ROW
               ) AS rolling_median_cents
        FROM events
        WHERE user_id % 25 = 0
        ORDER BY user_id, event_id
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's median() refuses a window frame (INVALID_WINDOW_SPEC_FOR_
    # AGGREGATION_FUNC), so the frame median comes from collect_list +
    # array_sort + middle element(s) — identical exact semantics.
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    vc = F.round(F.col("value") * 100, 0).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, W.currentRow)
    )
    med = F.expr(
        "CASE WHEN size(l) % 2 = 1"
        " THEN cast(element_at(array_sort(l), cast((size(l) + 1) div 2 as int)) as double)"
        " ELSE (cast(element_at(array_sort(l), cast(size(l) div 2 as int)) as double)"
        "     + cast(element_at(array_sort(l), cast(size(l) div 2 + 1 as int)) as double)) / 2"
        " END"
    )
    return (
        ev.select("user_id", "event_id", F.collect_list(vc).over(w).alias("l"))
        .select("user_id", "event_id", med.alias("rolling_median_cents"))
        .orderBy("user_id", "event_id")
    )


@register(
    "win_sessionize",
    category="window",
    doc="Batch sessionization: per-user sessions split on >24h inactivity "
    "gaps (lag + flag + running sum = session seq), then per-session "
    "start/end/count/value rollup.  One shuffle on user_id serves the "
    "lag, the cumulative sum, and the final agg; money summed in exact "
    "cents space (integer), converted to double at finalization.",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > 86400000000
                          OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                             IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events WHERE user_id < 40
        ),
        tagged AS (
            SELECT user_id, ts, cents,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM seq
        )
        SELECT user_id,
               CAST(session_seq AS BIGINT)                     AS session_seq,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S')          AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S')          AS session_end,
               COUNT(*)                                        AS n_events,
               CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
        FROM tagged
        GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.sessionize import tag_sessions

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    tagged = tag_sessions(
        ev, ts_col="ts", by="user_id", gap=86_400_000_000, order_cols=["event_id"]
    ).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        "session_seq",
    )
    return (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count("*").alias("n_events"),
            (F.sum("cents").cast("double") / 100.0).alias("total_value"),
        )
        .select(
            "user_id", "session_seq", "session_start", "session_end",
            "n_events", "total_value",
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "win_rolling_distinct",
    category="window",
    doc="Distinct count over a sliding row frame (behavioral diversity of "
    "the user's last 10 events).  Neither engine supports DISTINCT "
    "aggregates over windows natively, so both build the frame list and "
    "dedup it — O(frame) per row, exact, and the idiom stays JVM-side "
    "in Spark (collect_list -> array_distinct -> size).  One shuffle "
    "on user_id.",
    oracle="""
        SELECT user_id, event_id,
               CAST(len(list_distinct(list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
               ))) AS INT) AS n_distinct_types
        FROM events WHERE user_id % 9 = 0
        ORDER BY user_id, event_id
    """,
)
def win_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 9 == 0)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w))).alias(
            "n_distinct_types"
        ),
    ).orderBy("user_id", "event_id")


@register(
    "win_max_drawdown",
    category="window",
    doc="Maximum drawdown per customer over a signed cumulative flow "
    "curve (fulfilled orders add, open orders subtract — a cash-flow "
    "stand-in that actually oscillates): running cents sum, running "
    "peak of the curve, drawdown = peak minus current, answer = max "
    "drawdown.  The nested-window financial analytic, entirely in "
    "exact integer space so curve and extrema are engine-identical; "
    "one shuffle on custkey serves both window passes and the final "
    "aggregate.",
    oracle="""
        SELECT o_custkey AS custkey,
               CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown_cents
        FROM (
            SELECT o_custkey, cum,
                   MAX(cum) OVER (PARTITION BY o_custkey
                                  ORDER BY ord
                                  ROWS UNBOUNDED PRECEDING) AS peak
            FROM (
                SELECT o_custkey, cum,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey)
                           AS ord
                FROM (
                    SELECT o_custkey, o_orderdate, o_orderkey,
                           SUM(CASE WHEN o_orderstatus = 'F'
                                    THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                                    ELSE -CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                               END) OVER (
                               PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS cum
                    FROM orders WHERE o_custkey % 15 = 0
                )
            )
        )
        GROUP BY o_custkey
        ORDER BY custkey
    """,
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 15 == 0)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    delta = F.when(F.col("o_orderstatus") == "F", cents).otherwise(-cents)
    w_cum = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    curve = o.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.sum(delta).over(w_cum).alias("cum"),
    )
    dd = curve.withColumn("peak", F.max("cum").over(w_cum))
    return (
        dd.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.max(F.col("peak") - F.col("cum")).cast("bigint").alias("max_drawdown_cents"))
        .orderBy("custkey")
    )


@register(
    "win_sweepline_concurrency",
    category="window",
    doc="Sweep-line maximum concurrency: each order is 'open' for 30 days "
    "([start, start+30d), end exclusive); explode to +1/-1 boundary "
    "events, running-sum them in (ts, delta, orderkey) order (ends "
    "before starts at the same instant, so touching intervals do not "
    "count as concurrent), and take the per-customer peak — the "
    "interval-scheduling primitive (rooms, sessions, connection "
    "pools) as one explode + one window over a single custkey "
    "shuffle.",
    oracle="""
        WITH ev AS (
            SELECT o_custkey, o_orderdate AS ts, 1 AS delta, o_orderkey
            FROM orders WHERE o_custkey % 12 = 0
            UNION ALL
            SELECT o_custkey, o_orderdate + INTERVAL 30 DAY, -1, o_orderkey
            FROM orders WHERE o_custkey % 12 = 0
        ),
        running AS (
            SELECT o_custkey,
                   SUM(delta) OVER (PARTITION BY o_custkey
                                    ORDER BY ts, delta, o_orderkey
                                    ROWS UNBOUNDED PRECEDING) AS open_now
            FROM ev
        )
        SELECT o_custkey AS custkey,
               CAST(MAX(open_now) AS BIGINT) AS max_concurrent
        FROM running GROUP BY o_custkey ORDER BY custkey
    """,
)
def win_sweepline_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 12 == 0)
    starts = o.select(
        "o_custkey",
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("delta"),
        "o_orderkey",
    )
    ends = o.select(
        "o_custkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(-1).alias("delta"),
        "o_orderkey",
    )
    ev = starts.unionByName(ends)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("ts", "delta", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = ev.withColumn("open_now", F.sum("delta").over(w))
    return (
        running.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.max("open_now").cast("bigint").alias("max_concurrent"))
        .orderBy("custkey")
    )


@register(
    "win_time_range_rolling",
    category="window",
    doc="Time-based rolling aggregate: each order's trailing-28-day spend "
    "per customer via a RANGE frame over the actual timestamp axis "
    "(epoch seconds in Spark, INTERVAL RANGE in DuckDB) — unlike a "
    "ROWS frame this is irregular-sampling-correct: quiet periods "
    "shrink the window's row count instead of reaching further back.  "
    "Cents-exact sums; one custkey shuffle.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 28 DAY PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS trailing_28d_cents,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 28 DAY PRECEDING AND CURRENT ROW
               ) AS n_in_window
        FROM orders WHERE o_custkey % 11 = 0
        ORDER BY o_custkey, o_orderkey
    """,
)
def win_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 11 == 0)
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    # RANGE frames need a numeric ordering key: epoch seconds
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-28 * 86400, 0)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.sum(cents).over(w).cast("bigint").alias("trailing_28d_cents"),
            F.count(F.lit(1)).over(w).alias("n_in_window"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "win_streak_lengths",
    category="window",
    doc="Longest strictly-increasing streak per user over the ts-ordered "
    "event values (gaps-and-islands with a comparison break condition "
    "rather than a time gap): break flag -> running island id -> island "
    "length -> per-user max.  Exact integer cents comparisons; two "
    "window passes and one groupBy over a single user_id shuffle.",
    oracle="""
        WITH v AS (
            SELECT user_id,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
                   ts, event_id
            FROM events WHERE user_id % 6 = 0
        ),
        f AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN LAG(vc) OVER w IS NULL
                             OR vc <= LAG(vc) OVER w
                        THEN 1 ELSE 0 END AS brk
            FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        isl AS (
            SELECT user_id,
                   SUM(brk) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS island
            FROM f
        ),
        lens AS (
            SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len
            FROM isl GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(MAX(len) AS BIGINT) AS longest_streak,
               CAST(COUNT(*) AS BIGINT) AS n_streaks
        FROM lens GROUP BY user_id ORDER BY user_id
    """,
)
def win_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 6 == 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        "ts",
        "event_id",
    ).withColumn(
        "brk",
        F.when(
            F.lag("vc").over(w).isNull() | (F.col("vc") <= F.lag("vc").over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    lens = islands.groupBy("user_id", "island").agg(F.count("*").alias("len"))
    return (
        lens.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.count("*").cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


def _skyline_prune(parts: DataFrame, price: str, size: str) -> DataFrame:
    """Keep only rows not dominated WITHIN their current partition.

    Dominance (minimize price, maximize size): b dominates a iff
    b.price <= a.price AND b.size >= a.size with at least one strict.
    Within one partition a sort by price makes this two running checks:

    - strictly cheaper rows: ``max(size) RANGE UNBOUNDED..-1`` on the
      integer price axis — if that max >= my size, a strictly cheaper
      row is at-least-as-big and dominates me;
    - equal-price rows: ``max(size) PARTITION BY (pid, price)`` — if a
      price-tie has strictly more size it dominates me (equal price AND
      equal size is a duplicate, not dominance: both survive).

    Correctness of partition-local pruning: dominance is transitive and
    partition-local domination implies global domination, so pruning per
    partition never removes a global skyline point — it only shrinks the
    candidate set the (tiny) global pass must sort.
    """
    pid = parts.withColumn("__pid", F.spark_partition_id())
    w_cheaper = (
        W.partitionBy("__pid")
        .orderBy(price)
        .rangeBetween(W.unboundedPreceding, -1)
    )
    w_tie = W.partitionBy("__pid", price)
    pruned = (
        pid.withColumn("__mx_cheaper", F.max(size).over(w_cheaper))
        .withColumn("__mx_tie", F.max(size).over(w_tie))
        .filter(
            ~(
                F.coalesce(F.col("__mx_cheaper") >= F.col(size), F.lit(False))
                | (F.col("__mx_tie") > F.col(size))
            )
        )
        .drop("__pid", "__mx_cheaper", "__mx_tie")
    )
    return pruned


@register(
    "win_skyline_pareto",
    category="window",
    doc="Pareto frontier (skyline) of parts — minimize retail price, "
    "maximize size — WITHOUT a self-join: phase 1 prunes each "
    "partition to its local skyline with two window running-max checks "
    "(local domination implies global domination, so no frontier point "
    "is lost), phase 2 re-runs the same two checks on the tiny survivor "
    "set in one partition.  The classic distributed-skyline shape: the "
    "O(n) data is touched once map-side, only O(frontier) rows reach "
    "the global sort — the NOT EXISTS self-join form the oracle uses "
    "would be quadratic at 100 TB.  Prices compare in exact integer "
    "cents; equal (price, size) duplicates all survive (dominance "
    "requires one strict inequality).",
    oracle="""
        WITH p AS (
            SELECT p_partkey,
                   CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
                   p_size
            FROM part
        )
        SELECT a.p_partkey, a.price_cents, CAST(a.p_size AS INT) AS p_size
        FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.price_cents <= a.price_cents AND b.p_size >= a.p_size
              AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)
        )
        ORDER BY a.p_partkey
    """,
)
def win_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("price_cents"),
        F.col("p_size").cast("int").alias("p_size"),
    )
    local = _skyline_prune(parts, "price_cents", "p_size")
    # survivors are O(frontier) per partition -> one partition is safe
    # for the global pass.  repartition(1), NOT coalesce(1): coalesce
    # would merge the phase-1 stage itself into a single task and run
    # the O(n) local prune serially; the explicit shuffle moves only the
    # tiny survivor set
    global_sky = _skyline_prune(local.repartition(1), "price_cents", "p_size")
    return global_sky.select("p_partkey", "price_cents", "p_size").orderBy(
        "p_partkey"
    )


@register(
    "win_session_paths",
    category="window",
    doc="Top-10 navigation paths: sessionize per user (>24h gap = new "
    "session, the win_sessionize convention), build each session's "
    "ordered event-type path ('view>click>purchase'), and rank paths "
    "by frequency — the product-analytics query behind every 'user "
    "journey' dashboard.  Path assembly is order-sensitive, so the "
    "Spark side sorts each session's collected (us, event_id, type) "
    "structs with array_sort (lexicographic = the oracle's ORDER BY "
    "us, event_id) before joining the types — collect_list alone has "
    "NO deterministic order under retries.  One shuffle on user_id "
    "serves the lag + running-sum sessionization; the path groupBy is "
    "map-side combinable; top-10 is a rank-pushdown sort.  Paths are "
    "capped to sessions of <= 8 events (longer carts dedup to "
    "'...>more') so the path-key cardinality stays bounded at 100 TB.",
    oracle="""
        WITH seq AS (
            SELECT user_id, ts, event_id, event_type,
                   epoch_us(ts) AS us,
                   CASE WHEN epoch_us(ts)
                             - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                       ORDER BY ts, event_id)
                             > 86400000000
                          OR LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)
                             IS NULL
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        ),
        tagged AS (
            SELECT user_id, us, event_id, event_type,
                   SUM(new_sess) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM seq
        ),
        paths AS (
            SELECT user_id, sess,
                   COUNT(*) AS n_events,
                   CASE WHEN COUNT(*) <= 8
                        THEN string_agg(event_type, '>' ORDER BY us, event_id)
                        ELSE '...>more' END AS path
            FROM tagged
            GROUP BY user_id, sess
        )
        SELECT path,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n_events) AS BIGINT) AS n_events
        FROM paths
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT 10
    """,
)
def win_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.sessionize import tag_sessions

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    tagged = tag_sessions(
        ev, "us", by="user_id", gap=86_400_000_000, order_cols=["event_id"]
    )
    paths = (
        tagged.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "event_type"))
            ).alias("evs"),
        )
        .select(
            "n_events",
            F.when(
                F.col("n_events") <= 8,
                F.array_join(
                    F.transform("evs", lambda s: s.event_type), ">"
                ),
            )
            .otherwise("...>more")
            .alias("path"),
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )
