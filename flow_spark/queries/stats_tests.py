"""Distribution-drift statistical tests, all decided in exact integer
space (the ``dq_ab_welch`` design extended to nonparametric tests).

The shared scale shape: every test first shrinks the data with ONE
map-side-combinable aggregation (a distinct-value histogram, a digit
histogram, an hourly count series), and the statistics run over that
bounded summary — at 100 TB only the first groupBy sees data-sized
input.  Decisions are cross-multiplied exact rationals riding
decimal(38,0) (Spark) / HUGEINT (DuckDB), so a re-plan, AQE split, or
speculative retry can never flip a drift alarm.

The reference has no statistics operators; north-star engine surface
for training-data distribution monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register
from flow_spark.queries.util import cents


def _d38(c):
    return c.cast("decimal(38,0)")


#: 10000 * c(0.05)^2 for the two-sample KS critical value c = 1.358
_KS_C2_E4 = 18_438


@register(
    "dq_ks_test",
    category="data-quality",
    doc="Two-sample Kolmogorov-Smirnov test (click vs purchase event "
    "values) decided entirely in exact integer space.  The data "
    "collapses to a distinct-cents-value histogram per arm (ONE "
    "map-side-combinable groupBy — the only shuffle that sees data); "
    "the empirical CDFs are running sums over that histogram, and the "
    "KS distance is kept as the integer numerator "
    "d = max|cdf_a*n_b - cdf_b*n_a| (ties handled exactly: the CDF "
    "steps once per distinct value, so tied observations never split "
    "across a step).  The alpha=0.05 decision d^2*10^4 >= "
    "c^2*10^4*(n_a+n_b)*n_a*n_b (c=1.358) is cross-multiplied in "
    "decimal(38,0)/HUGEINT — no sqrt, no float CDF.  The CDF window is "
    "unpartitioned BY DESIGN: its input is the distinct-value table, "
    "bounded by the cents grid of the metric (~10^4 rows at any SF), "
    "not by data size.  Output: sample sizes, the exact D numerator, "
    "D in ppm, the smallest cents value attaining D, and the flag.",
    oracle=f"""
        WITH e AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS arm,
                   CAST(round(value * 100) AS BIGINT) AS v
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        cell AS (
            SELECT v,
                   SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
            FROM e GROUP BY v
        ),
        tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM cell),
        cum AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v) AS cca,
                   SUM(cb) OVER (ORDER BY v) AS ccb
            FROM cell
        ),
        d AS (
            SELECT cum.v,
                   abs(cca * nb - ccb * na) AS dn
            FROM cum CROSS JOIN tot
        ),
        mx AS (SELECT MAX(dn) AS d_num FROM d),
        amx AS (
            SELECT MIN(v) AS argmax_v_cents
            FROM d JOIN mx ON d.dn = mx.d_num
        )
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(d_num AS BIGINT) AS d_num,
               CAST((1000000 * d_num) // (na * nb) AS BIGINT) AS ks_ppm,
               CAST(argmax_v_cents AS BIGINT) AS argmax_v_cents,
               CAST(CASE WHEN 10000::HUGEINT * d_num * d_num >=
                         {_KS_C2_E4}::HUGEINT * (na + nb) * na * nb
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_drift
        FROM tot CROSS JOIN mx CROSS JOIN amx
    """,
)
def dq_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("arm"),
        cents("value").alias("v"),
    )
    cell = e.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = cell.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    # unpartitioned window over the distinct-value table (bounded by the
    # cents grid, not data size — see docstring)
    cdf = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = cell.select(
        "v",
        F.sum("ca").over(cdf).alias("cca"),
        F.sum("cb").over(cdf).alias("ccb"),
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        F.abs(F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na")).alias("dn"),
        "na",
        "nb",
    )
    mx = d.agg(
        F.max("dn").alias("d_num"),
        F.min_by("v", F.struct((-F.col("dn")).alias("neg"), F.col("v"))).alias(
            "argmax_v_cents"
        ),
        F.first("na").alias("na"),
        F.first("nb").alias("nb"),
    )
    lhs = F.lit(10_000).cast("decimal(38,0)") * _d38(F.col("d_num")) * _d38(
        F.col("d_num")
    )
    rhs = (
        F.lit(_KS_C2_E4).cast("decimal(38,0)")
        * (_d38(F.col("na")) + _d38(F.col("nb")))
        * _d38(F.col("na"))
        * _d38(F.col("nb"))
    )
    return mx.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("d_num").cast("bigint").alias("d_num"),
        F.expr("(1000000 * d_num) div (na * nb)").cast("bigint").alias("ks_ppm"),
        F.col("argmax_v_cents").cast("bigint").alias("argmax_v_cents"),
        F.when(lhs >= rhs, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias(
            "flag_drift"
        ),
    )


@register(
    "dq_mann_whitney",
    category="data-quality",
    doc="Mann-Whitney / Wilcoxon rank-sum test (click vs purchase event "
    "values) in exact integer space: ranks live in DOUBLED units so "
    "midranks of even-sized tie groups stay integral (a tie group of "
    "size t starting after p pooled rows has midrank*2 = 2p + t + 1).  "
    "The pooled distinct-value histogram (one map-side-combinable "
    "groupBy) yields per-value tie sizes; U*2 follows from the rank "
    "sum, and the normal-approximation decision |z| >= 2 with the "
    "exact tie-corrected variance sigma^2 = n_a*n_b*(N^3 - N - "
    "sum(t^3 - t)) / (12*N*(N-1)) is cross-multiplied as "
    "3*N*(N-1)*(U2 - n_a*n_b)^2 >= 4*n_a*n_b*(N^3 - N - sum_t) in "
    "decimal(38,0)/HUGEINT (magnitudes ~1e35 at sf1 under realistic "
    "overlap — inside 128-bit; total separation at >=10x sf1 would "
    "need rank rescaling, documented bound).  Unlike dq_ab_welch this "
    "is distribution-free: it catches median shifts that heavy tails "
    "hide from the t-test.",
    oracle="""
        WITH e AS (
            SELECT CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS arm,
                   CAST(round(value * 100) AS BIGINT) AS v
            FROM events WHERE event_type IN ('click', 'purchase')
        ),
        cell AS (
            SELECT v,
                   SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
            FROM e GROUP BY v
        ),
        rnk AS (
            SELECT v, ca, cb, ca + cb AS ct,
                   2 * (SUM(ca + cb) OVER (ORDER BY v)
                        - (ca + cb)) + (ca + cb) + 1 AS r2
            FROM cell
        ),
        s AS (
            SELECT SUM(ca) AS na, SUM(cb) AS nb,
                   SUM(ca * r2) AS rsum2_a,
                   SUM(ct * ct * ct - ct) AS tie_t
            FROM rnk
        ),
        u AS (
            SELECT na, nb, tie_t,
                   rsum2_a - na * (na + 1) AS u2_a,
                   na + nb AS n
            FROM s
        )
        SELECT CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(u2_a AS BIGINT) AS u2_a,
               CAST(2 * na * nb - u2_a AS BIGINT) AS u2_b,
               CAST(tie_t AS BIGINT) AS tie_term,
               CAST((1000000 * u2_a) // (2 * na * nb) AS BIGINT) AS auc_ppm,
               CAST(CASE WHEN 3::HUGEINT * n * (n - 1)
                              * (u2_a - na * nb) * (u2_a - na * nb) >=
                         4::HUGEINT * na * nb
                              * (n::HUGEINT * n * n - n - tie_t)
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_shift
        FROM u
    """,
)
def dq_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("arm"),
        cents("value").alias("v"),
    )
    cell = e.groupBy("v").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("cb"),
    )
    # unpartitioned window over the bounded distinct-value table
    cdf = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    ct = F.col("ca") + F.col("cb")
    rnk = cell.select(
        "v",
        "ca",
        "cb",
        ct.alias("ct"),
        (2 * (F.sum(ct).over(cdf) - ct) + ct + 1).alias("r2"),
    )
    s = rnk.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.col("ca") * F.col("r2")).alias("rsum2_a"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")).alias("tie_t"),
    )
    u = s.select(
        "na",
        "nb",
        "tie_t",
        (F.col("rsum2_a") - F.col("na") * (F.col("na") + 1)).alias("u2_a"),
        (F.col("na") + F.col("nb")).alias("n"),
    )
    diff = _d38(F.col("u2_a")) - _d38(F.col("na")) * _d38(F.col("nb"))
    lhs = F.lit(3).cast("decimal(38,0)") * _d38(F.col("n")) * (
        _d38(F.col("n")) - 1
    ) * diff * diff
    rhs = (
        F.lit(4).cast("decimal(38,0)")
        * _d38(F.col("na"))
        * _d38(F.col("nb"))
        * (
            _d38(F.col("n")) * _d38(F.col("n")) * _d38(F.col("n"))
            - _d38(F.col("n"))
            - _d38(F.col("tie_t"))
        )
    )
    return u.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("u2_a").cast("bigint").alias("u2_a"),
        (2 * F.col("na") * F.col("nb") - F.col("u2_a"))
        .cast("bigint")
        .alias("u2_b"),
        F.col("tie_t").cast("bigint").alias("tie_term"),
        F.expr("(1000000 * u2_a) div (2 * na * nb)")
        .cast("bigint")
        .alias("auc_ppm"),
        F.when(lhs >= rhs, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias(
            "flag_shift"
        ),
    )


#: Benford expected first-digit probabilities, ppm (sum = exactly 10^6)
_BENFORD_PPM = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]
#: chi-square critical value for df=8 at alpha=0.05, in ppm
_CHI2_CRIT_PPM_DF8 = 15_507_000


@register(
    "dq_benford",
    category="data-quality",
    doc="Benford first-significant-digit conformance test over order "
    "totals — the classic synthetic-data / fraud tripwire.  The digit "
    "is extracted from the exact cents integer (first significant "
    "digit is invariant under *100, so no float formatting is "
    "involved); the 9-bin histogram is one map-side-combinable "
    "groupBy; expectations are the fixed Benford ppm constants "
    "(301030..45757, summing to exactly 10^6) joined from a 9-row "
    "broadcast table, and each cell's chi^2 contribution "
    "(10^6*O - N*e)^2 // (N*e) is exact integer ppm.  Verdict vs the "
    "df=8 critical value 15.507.  (TPC-H prices are near-uniform in "
    "a band, so the flag FIRES — the test's job is to prove the "
    "machinery detects non-Benford data.)",
    oracle=f"""
        WITH b AS (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        obs AS (SELECT digit, COUNT(*) AS o_cnt FROM b GROUP BY digit),
        exp AS (
            SELECT * FROM (VALUES {", ".join(f"({d + 1}, {p})" for d, p in enumerate(_BENFORD_PPM))})
                 t(digit, exp_ppm)
        ),
        n AS (SELECT SUM(o_cnt) AS n FROM obs),
        cells AS (
            SELECT e.digit, COALESCE(o.o_cnt, 0) AS o_cnt, e.exp_ppm, n.n,
                   ((1000000::HUGEINT * COALESCE(o.o_cnt, 0)
                     - n.n::HUGEINT * e.exp_ppm)
                    * (1000000::HUGEINT * COALESCE(o.o_cnt, 0)
                       - n.n::HUGEINT * e.exp_ppm))
                       // (n.n::HUGEINT * e.exp_ppm) AS contrib_ppm
            FROM exp e LEFT JOIN obs o USING (digit) CROSS JOIN n
        ),
        tot AS (SELECT SUM(contrib_ppm) AS chi2_ppm FROM cells)
        SELECT CAST(cells.digit AS BIGINT) AS digit,
               CAST(cells.o_cnt AS BIGINT) AS o_cnt,
               CAST(cells.exp_ppm AS BIGINT) AS exp_ppm,
               CAST((1000000 * cells.o_cnt) // cells.n AS BIGINT) AS obs_ppm,
               CAST(cells.contrib_ppm AS BIGINT) AS contrib_ppm,
               CAST(tot.chi2_ppm AS BIGINT) AS chi2_ppm,
               CAST(CASE WHEN tot.chi2_ppm > {_CHI2_CRIT_PPM_DF8}
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_benford
        FROM cells CROSS JOIN tot
        ORDER BY digit
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    b = o.select(
        F.substring(cents("o_totalprice").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    obs = b.groupBy("digit").agg(F.count(F.lit(1)).alias("o_cnt"))
    exp = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD_PPM)], "digit long, exp_ppm long"
    )
    n = obs.agg(F.sum("o_cnt").alias("n"))
    cells = (
        exp.join(F.broadcast(obs), "digit", "left")
        .na.fill({"o_cnt": 0})
        .crossJoin(F.broadcast(n))
        .select(
            "digit",
            "o_cnt",
            "exp_ppm",
            "n",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * o_cnt"
                " - CAST(n AS DECIMAL(38,0)) * exp_ppm)"
                " * (CAST(1000000 AS DECIMAL(38,0)) * o_cnt"
                "    - CAST(n AS DECIMAL(38,0)) * exp_ppm)"
                " div (CAST(n AS DECIMAL(38,0)) * exp_ppm) AS DECIMAL(38,0))"
            ).alias("contrib_ppm"),
        )
    )
    tot = cells.agg(F.sum("contrib_ppm").alias("chi2_ppm"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("bigint").alias("digit"),
            F.col("o_cnt").cast("bigint").alias("o_cnt"),
            F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
            F.expr("(1000000 * o_cnt) div n").cast("bigint").alias("obs_ppm"),
            F.col("contrib_ppm").cast("bigint").alias("contrib_ppm"),
            F.col("chi2_ppm").cast("bigint").alias("chi2_ppm"),
            F.when(F.col("chi2_ppm") > _CHI2_CRIT_PPM_DF8, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("flag_benford"),
        )
        .orderBy("digit")
    )


@register(
    "ts_autocorrelation",
    category="timeseries",
    doc="Autocorrelation function of the hourly event-count series at "
    "lags 1..3, exact to the last bit: the raw stream collapses to "
    "one count per hour (map-side-combinable groupBy — the only "
    "data-sized shuffle), missing hours are zero-filled from the "
    "global [min,max] span so lag-k really means k HOURS (not k "
    "observed rows), and each lag's Pearson r is carried as the exact "
    "cross-multiplied pair num = n*Sxy - Sx*Sy, den = "
    "(n*Sxx - Sx^2)(n*Syy - Sy^2), reported as sign(num) * "
    "10^6*num^2 // den (signed r^2 in ppm — no sqrt, engines agree "
    "bit-for-bit).  The lag windows are unpartitioned BY DESIGN: "
    "their input is the hourly series, bounded by the time span "
    "(~10^4 rows for a year), not by data size.",
    oracle="""
        WITH hr AS (
            SELECT date_trunc('hour', ts) AS h, COUNT(*) AS x
            FROM events GROUP BY h
        ),
        span AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM hr),
        grid AS (
            SELECT lo + i * INTERVAL 1 HOUR AS h
            FROM span CROSS JOIN range(0, 100000) t(i)
            WHERE lo + i * INTERVAL 1 HOUR <= hi
        ),
        dense AS (
            SELECT g.h, COALESCE(hr.x, 0) AS x
            FROM grid g LEFT JOIN hr ON g.h = hr.h
        ),
        lagd AS (
            SELECT x,
                   LAG(x, 1) OVER (ORDER BY h) AS y1,
                   LAG(x, 2) OVER (ORDER BY h) AS y2,
                   LAG(x, 3) OVER (ORDER BY h) AS y3
            FROM dense
        ),
        pairs AS (
            SELECT 1 AS lag, x, y1 AS y FROM lagd WHERE y1 IS NOT NULL
            UNION ALL
            SELECT 2 AS lag, x, y2 AS y FROM lagd WHERE y2 IS NOT NULL
            UNION ALL
            SELECT 3 AS lag, x, y3 AS y FROM lagd WHERE y3 IS NOT NULL
        ),
        s AS (
            SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                   SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
            FROM pairs GROUP BY lag
        ),
        r AS (
            SELECT lag, n,
                   n::HUGEINT * sxy - sx::HUGEINT * sy AS num,
                   (n::HUGEINT * sxx - sx::HUGEINT * sx)
                       * (n::HUGEINT * syy - sy::HUGEINT * sy) AS den
            FROM s
        )
        SELECT CAST(lag AS BIGINT) AS lag,
               CAST(n AS BIGINT) AS n_pairs,
               CAST(num AS BIGINT) AS r_num,
               CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END
                    * ((1000000::HUGEINT * num * num) // den)
                    AS BIGINT) AS r2_ppm_signed
        FROM r
        ORDER BY lag
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hr = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    span = hr.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    dense = grid.join(hr, "h", "left").na.fill({"x": 0})
    # unpartitioned window over the bounded hourly series (see docstring)
    w = W.orderBy("h")
    lagd = dense.select(
        "x",
        F.lag("x", 1).over(w).alias("y1"),
        F.lag("x", 2).over(w).alias("y2"),
        F.lag("x", 3).over(w).alias("y3"),
    )
    pairs = lagd.select(
        F.col("x"),
        F.stack(
            F.lit(3),
            F.lit(1), F.col("y1"),
            F.lit(2), F.col("y2"),
            F.lit(3), F.col("y3"),
        ).alias("lag", "y"),
    ).filter(F.col("y").isNotNull())
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = _d38(F.col("n")) * _d38(F.col("sxy")) - _d38(F.col("sx")) * _d38(
        F.col("sy")
    )
    den = (
        _d38(F.col("n")) * _d38(F.col("sxx")) - _d38(F.col("sx")) * _d38(F.col("sx"))
    ) * (
        _d38(F.col("n")) * _d38(F.col("syy")) - _d38(F.col("sy")) * _d38(F.col("sy"))
    )
    r = s.select(
        "lag",
        "n",
        num.alias("num"),
        den.alias("den"),
    )
    return r.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("num").cast("bigint").alias("r_num"),
        (
            F.when(F.col("num") < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0)) * num * num"
                " div den AS DECIMAL(38,0))"
            )
        )
        .cast("bigint")
        .alias("r2_ppm_signed"),
    ).orderBy("lag")


#: CUSUM reference drift k (events/day) and alarm threshold h
_CUSUM_K = 3
_CUSUM_H = 8


@register(
    "ts_changepoint_cusum",
    category="timeseries",
    doc="Per-user CUSUM change-point monitor over daily activity counts, "
    "expressed WITHOUT recursion: the classic recurrence "
    "S_t = max(0, S_(t-1) + x_t - k) equals P_t - min(0, min_(j<=t) "
    "P_j) for the prefix sums P of (x - k), so the whole monitor is "
    "one per-user sorted window (running sum + running min) — "
    "integer-exact, one shuffle on user_id, no iterative driver loop.  "
    "Days with no events are zero-filled from each user's own "
    "[first, last] activity span (a quiet day DOES drain the "
    "statistic by k, as a real monitor must).  Output per user: the "
    "peak statistic, the first alarm day (S >= h), and the alarm "
    "value; users without an alarm report NULLs and peak only.",
    oracle=f"""
        WITH d AS (
            SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS x
            FROM events WHERE user_id % 10 = 0
            GROUP BY user_id, day
        ),
        span AS (
            SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
            FROM d GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, lo + i * INTERVAL 1 DAY AS day
            FROM span CROSS JOIN range(0, 1000) t(i)
            WHERE lo + i * INTERVAL 1 DAY <= hi
        ),
        dense AS (
            SELECT g.user_id, g.day, COALESCE(d.x, 0) AS x
            FROM grid g LEFT JOIN d
              ON g.user_id = d.user_id AND g.day = d.day
        ),
        p AS (
            SELECT user_id, day, x,
                   SUM(x - {_CUSUM_K}) OVER
                       (PARTITION BY user_id ORDER BY day) AS pt
            FROM dense
        ),
        s AS (
            SELECT user_id, day, x, pt,
                   pt - LEAST(MIN(pt) OVER
                       (PARTITION BY user_id ORDER BY day), 0) AS st
            FROM p
        )
        SELECT CAST(user_id AS BIGINT) AS user_id,
               CAST(MAX(st) AS BIGINT) AS peak_s,
               strftime(MIN(CASE WHEN st >= {_CUSUM_H} THEN day END),
                        '%Y-%m-%d') AS alarm_day,
               CAST(arg_min(st, day) FILTER (WHERE st >= {_CUSUM_H})
                    AS BIGINT) AS s_at_first_alarm
        FROM s
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    d = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    span = d.groupBy("user_id").agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    dense = grid.join(d, ["user_id", "day"], "left").na.fill({"x": 0})
    w = W.partitionBy("user_id").orderBy("day").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    p = dense.withColumn("pt", F.sum(F.col("x") - _CUSUM_K).over(w))
    s = p.withColumn(
        "st", F.col("pt") - F.least(F.min("pt").over(w), F.lit(0))
    )
    alarm = F.when(F.col("st") >= _CUSUM_H, F.col("day"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("st").cast("bigint").alias("peak_s"),
            F.date_format(F.min(alarm), "yyyy-MM-dd").alias("alarm_day"),
            # first-alarm value: min over (day, st) structs restricted to
            # alarmed rows — lexicographic min = earliest day, its st
            F.min(
                F.when(
                    F.col("st") >= _CUSUM_H,
                    F.struct(F.col("day").alias("d"), F.col("st").alias("s")),
                )
            )["s"]
            .cast("bigint")
            .alias("s_at_first_alarm"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "peak_s",
            "alarm_day",
            "s_at_first_alarm",
        )
        .orderBy("user_id")
    )


@register(
    "dq_psi_drift",
    category="data-quality",
    doc="Population Stability Index between the first and second half of "
    "the event window, per event_type, with the log in exact bit space: "
    "psi = sum_b (p_b - q_b) * ln(p_b / q_b) is approximated by "
    "(p_ppm - q_ppm) * (bits(p_ppm) - bits(q_ppm)) where bits(x) = "
    "length(bin(x)) is the floor-log2 bit length — the same libm-free "
    "trick as text_unigram_surprisal, so the drift alarm is "
    "bit-identical across engines and can never flip under retries or "
    "re-plans.  Bins are 10 fixed $50-wide value buckets; both arms "
    "get Laplace (+1) smoothing over the FULL bin grid (types x 10 via "
    "sequence/range cross join), so empty bins contribute finite, "
    "identical terms.  The industry rule-of-thumb thresholds (0.1 / "
    "0.25) translate to the bit-space units ln(2) ~ 0.693 per bit: "
    "flag_drift fires above ~0.25 / ln2 * 1e6 ppm-bits.  Scale shape: "
    "one map-side-combinable groupBy (type, half, bin) collapses the "
    "data to <= types*20 rows; everything after is driver-sized "
    "arithmetic in the plan.",
    oracle="""
        WITH e AS (
            SELECT event_type,
                   CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
                       AS half,
                   LEAST(CAST(ROUND(value * 100, 0) AS BIGINT) // 5000, 9)
                       AS bin
            FROM events
        ),
        cnt AS (
            SELECT event_type, half, bin, COUNT(*) AS c
            FROM e GROUP BY event_type, half, bin
        ),
        grid AS (
            SELECT DISTINCT e.event_type, r.range AS bin
            FROM e CROSS JOIN range(0, 10) r
        ),
        tot AS (
            SELECT event_type, half, SUM(c) AS t
            FROM cnt GROUP BY event_type, half
        ),
        sm AS (
            SELECT g.event_type, g.bin,
                   (COALESCE(cr.c, 0) + 1) * 1000000
                       // (tr.t + 10) AS p_ppm,
                   (COALESCE(cc.c, 0) + 1) * 1000000
                       // (tc.t + 10) AS q_ppm
            FROM grid g
            JOIN tot tr ON tr.event_type = g.event_type AND tr.half = 0
            JOIN tot tc ON tc.event_type = g.event_type AND tc.half = 1
            LEFT JOIN cnt cr ON cr.event_type = g.event_type
                 AND cr.half = 0 AND cr.bin = g.bin
            LEFT JOIN cnt cc ON cc.event_type = g.event_type
                 AND cc.half = 1 AND cc.bin = g.bin
        )
        SELECT event_type,
               CAST(SUM((p_ppm - q_ppm)
                        * (length(bin(p_ppm)) - length(bin(q_ppm))))
                    AS BIGINT) AS psi_ppm_bits,
               CAST(CASE WHEN SUM((p_ppm - q_ppm)
                                  * (length(bin(p_ppm)) - length(bin(q_ppm))))
                              > 360674
                         THEN 1 ELSE 0 END AS BIGINT) AS flag_drift
        FROM sm
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
        F.least(
            F.expr("cast(round(value * 100, 0) as bigint) div 5000"), F.lit(9)
        ).alias("bin"),
    )
    cnt = e.groupBy("event_type", "half", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = (
        e.select("event_type")
        .distinct()
        .select("event_type", F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"))
    )
    tot = cnt.groupBy("event_type", "half").agg(F.sum("c").alias("t"))
    tr = tot.filter(F.col("half") == 0).select("event_type", F.col("t").alias("t_ref"))
    tc = tot.filter(F.col("half") == 1).select("event_type", F.col("t").alias("t_cur"))
    cr = cnt.filter(F.col("half") == 0).select(
        "event_type", "bin", F.col("c").alias("c_ref")
    )
    cc = cnt.filter(F.col("half") == 1).select(
        "event_type", "bin", F.col("c").alias("c_cur")
    )
    sm = (
        grid.join(tr, "event_type")
        .join(tc, "event_type")
        .join(cr, ["event_type", "bin"], "left")
        .join(cc, ["event_type", "bin"], "left")
        .select(
            "event_type",
            F.expr(
                "(coalesce(c_ref, 0) + 1) * 1000000 div (t_ref + 10)"
            ).alias("p_ppm"),
            F.expr(
                "(coalesce(c_cur, 0) + 1) * 1000000 div (t_cur + 10)"
            ).alias("q_ppm"),
        )
    )
    bits = lambda c: F.length(F.bin(c))  # noqa: E731
    term = (F.col("p_ppm") - F.col("q_ppm")) * (
        bits(F.col("p_ppm")) - bits(F.col("q_ppm"))
    )
    return (
        sm.groupBy("event_type")
        .agg(F.sum(term).cast("bigint").alias("psi_ppm_bits"))
        .select(
            "event_type",
            "psi_ppm_bits",
            F.when(F.col("psi_ppm_bits") > 360674, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("flag_drift"),
        )
        .orderBy("event_type")
    )


#: team-draft pick order for 3 rounds (coin = round parity, deterministic):
#: round 0 -> A,B; round 1 -> B,A; round 2 -> A,B
_TD_ORDER = ["A", "B", "B", "A", "A", "B"]


def _td_oracle() -> str:
    """Generate the unrolled team-draft oracle SQL (one CTE per pick)."""
    steps = []
    prev = "base"
    for i, team in enumerate(_TD_ORDER, start=1):
        lst = "la" if team == "A" else "lb"
        picked = (
            "[]::BIGINT[]"
            if i == 1
            else "[" + ", ".join(f"p{j}" for j in range(1, i)) + "]"
        )
        steps.append(
            f"s{i} AS (SELECT *, COALESCE(list_filter({lst}, "
            f"x -> NOT list_contains({picked}, x))[1], {-i}) AS p{i} "
            f"FROM {prev})"
        )
        prev = f"s{i}"
    pick_rows = " UNION ALL ".join(
        f"SELECT event_type, '{team}' AS team, p{i} AS u FROM s6"
        for i, team in enumerate(_TD_ORDER, start=1)
    )
    return f"""
        WITH per_user AS (
            SELECT event_type, user_id,
                   SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS s_cents,
                   COUNT(*) AS n,
                   MAX(CAST(ROUND(value * 100, 0) AS BIGINT)) AS mx
            FROM events
            GROUP BY event_type, user_id
        ),
        base AS (
            SELECT event_type,
                   (list_sort(list((-s_cents, user_id))))[:6]
                       .list_transform(x -> x[2]) AS la,
                   (list_sort(list((-n, user_id))))[:6]
                       .list_transform(x -> x[2]) AS lb
            FROM per_user
            GROUP BY event_type
        ),
        {", ".join(steps)},
        picks AS ({pick_rows}),
        clicked AS (
            SELECT event_type, user_id FROM per_user WHERE mx >= 20000
        ),
        scores AS (
            SELECT p.event_type, p.team, COUNT(c.user_id) AS hits
            FROM picks p
            LEFT JOIN clicked c
              ON c.event_type = p.event_type AND c.user_id = p.u
            GROUP BY p.event_type, p.team
        )
        SELECT a.event_type,
               CAST(a.hits AS BIGINT) AS score_a,
               CAST(b.hits AS BIGINT) AS score_b,
               CASE WHEN a.hits > b.hits THEN 'A'
                    WHEN b.hits > a.hits THEN 'B'
                    ELSE 'tie' END AS winner
        FROM scores a
        JOIN scores b ON a.event_type = b.event_type
        WHERE a.team = 'A' AND b.team = 'B'
        ORDER BY a.event_type
    """


@register(
    "eval_interleave_teamdraft",
    category="eval",
    doc="Team-draft interleaving (Radlinski et al. 2008), the standard "
    "online ranker A/B evaluation, made fully deterministic: per query "
    "(event_type) ranker A orders candidate users by total spend and "
    "ranker B by event count; three draft rounds pick alternately with "
    "the coin fixed to round parity (A,B / B,A / A,B), each team "
    "taking its highest-ranked candidate not already in the "
    "interleaved list.  The draft is SEQUENTIAL state, but with a "
    "fixed coin it unrolls into 6 set-based pick steps (array filter "
    "+ head), identical in both engines — no per-query loop, no UDF.  "
    "Credit: a pick scores when that user 'clicked' (max event >= "
    "$200 for the query's type); more hits wins the query.  Scale "
    "shape: one groupBy collapses events to (type, user) stats; the "
    "draft runs over 6-element arrays per query — constant work per "
    "query regardless of SF.",
    oracle=_td_oracle(),
)
def eval_interleave_teamdraft(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    yc = F.expr("cast(round(value * 100, 0) as bigint)")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(yc).alias("s_cents"),
        F.count(F.lit(1)).alias("n"),
        F.max(yc).alias("mx"),
    )
    top6 = lambda key: F.slice(  # noqa: E731
        F.transform(
            F.sort_array(
                F.collect_list(F.struct((-F.col(key)).alias("k"), F.col("user_id").alias("u")))
            ),
            lambda x: x.u,
        ),
        1,
        6,
    )
    base = per_user.groupBy("event_type").agg(
        top6("s_cents").alias("la"), top6("n").alias("lb")
    )
    d = base
    for i, team in enumerate(_TD_ORDER, start=1):
        lst = "la" if team == "A" else "lb"
        picked = (
            "array()"
            if i == 1
            else "array(" + ", ".join(f"p{j}" for j in range(1, i)) + ")"
        )
        d = d.withColumn(
            f"p{i}",
            F.expr(
                f"coalesce(element_at(filter({lst}, "
                f"x -> NOT array_contains({picked}, x)), 1), {-i})"
            ),
        )
    picks = d.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(team).alias("team"), F.col(f"p{i}").alias("u")
                    )
                    for i, team in enumerate(_TD_ORDER, start=1)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.team", "p.u")
    clicked = per_user.filter(F.col("mx") >= 20000).select(
        "event_type", F.col("user_id").alias("u"), F.lit(1).alias("hit")
    )
    scores = (
        picks.join(clicked, ["event_type", "u"], "left")
        .groupBy("event_type", "team")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("hits"))
    )
    a = scores.filter(F.col("team") == "A").select(
        "event_type", F.col("hits").alias("score_a")
    )
    b = scores.filter(F.col("team") == "B").select(
        "event_type", F.col("hits").alias("score_b")
    )
    return (
        a.join(b, "event_type")
        .select(
            "event_type",
            F.col("score_a").cast("bigint").alias("score_a"),
            F.col("score_b").cast("bigint").alias("score_b"),
            F.when(F.col("score_a") > F.col("score_b"), "A")
            .when(F.col("score_b") > F.col("score_a"), "B")
            .otherwise("tie")
            .alias("winner"),
        )
        .orderBy("event_type")
    )


# NDCG@8 discount weights round(1e9 / log2(i+1)), i = 1..8 — computed ONCE
# in Python (math.log2) and embedded as the SAME integer literals in the
# Spark plan and the DuckDB oracle, so no engine ever evaluates a log.
_NDCG_W = [
    1_000_000_000,
    630_929_754,
    500_000_000,
    430_676_558,
    386_852_807,
    356_207_187,
    333_333_333,
    315_464_877,
]


def _ndcg_oracle() -> str:
    w_case = " ".join(
        f"WHEN {i + 1} THEN {w}::BIGINT" for i, w in enumerate(_NDCG_W)
    )
    return f"""
        WITH per_user AS (
            SELECT event_type, user_id,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS s_cents,
                   LEAST(3, COUNT(*)) AS grade
            FROM events
            GROUP BY event_type, user_id
        ),
        ranked AS (
            SELECT event_type, grade,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY s_cents DESC, user_id) AS rn
            FROM per_user
        ),
        ideal AS (
            SELECT event_type, grade,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY grade DESC, user_id) AS rn
            FROM per_user
        ),
        dcg AS (
            SELECT event_type,
                   SUM(grade * CASE rn {w_case} END) AS dcg_units
            FROM ranked WHERE rn <= 8 GROUP BY event_type
        ),
        idcg AS (
            SELECT event_type,
                   SUM(grade * CASE rn {w_case} END) AS idcg_units
            FROM ideal WHERE rn <= 8 GROUP BY event_type
        )
        SELECT d.event_type,
               CAST(d.dcg_units AS BIGINT) AS dcg_units,
               CAST(i.idcg_units AS BIGINT) AS idcg_units,
               CAST(d.dcg_units * 1000000 // i.idcg_units AS BIGINT)
                   AS ndcg_ppm
        FROM dcg d JOIN idcg i USING (event_type)
        ORDER BY d.event_type
    """


@register(
    "eval_ndcg_at_k",
    category="eval",
    doc="NDCG@8 ranking-quality evaluation, fully exact: per query "
    "(event_type) the evaluated ranker orders users by total spend "
    "(cents, user_id tiebreak) and the relevance grade is "
    "least(3, event count).  The log2 position discounts are "
    "PRE-COMPUTED integer literals round(1e9/log2(i+1)) baked "
    "identically into both engines, so DCG and ideal-DCG are pure "
    "integer dot products and NDCG is one integer division to ppm — "
    "no engine-side transcendental, no float sum order.  Scale shape: "
    "ONE map-side-combinable groupBy collapses events to (query, "
    "candidate) stats; both rank windows run over that bounded "
    "summary, and the @8 cut means the DCG sums see <= 8 rows per "
    "query.",
    oracle=_ndcg_oracle(),
)
def eval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    yc = F.expr("cast(round(value * 100, 0) as bigint)")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum(yc).alias("s_cents"),
        F.least(F.lit(3), F.count(F.lit(1))).alias("grade"),
    )
    weights = F.array(*[F.lit(w).cast("bigint") for w in _NDCG_W])
    ranked = per_user.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.col("s_cents").desc(), "user_id"
            )
        ),
    )
    ideal = per_user.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(F.col("grade").desc(), "user_id")
        ),
    )

    def _dcg(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col("rn") <= 8)
            .select(
                "event_type",
                (
                    F.col("grade") * F.element_at(weights, F.col("rn").cast("int"))
                ).alias("t"),
            )
            .groupBy("event_type")
            .agg(F.sum("t").cast("bigint").alias(out))
        )

    d = _dcg(ranked, "dcg_units")
    i = _dcg(ideal, "idcg_units")
    return (
        d.join(i, "event_type")
        .select(
            "event_type",
            "dcg_units",
            "idcg_units",
            F.expr("(dcg_units * 1000000) div idcg_units")
            .cast("bigint")
            .alias("ndcg_ppm"),
        )
        .orderBy("event_type")
    )



@register(
    "eval_ece_calibration",
    category="eval",
    doc="Expected-calibration-error of a deterministic propensity model "
    "(per-user click-through rate in exact ppm predicts whether the "
    "user ever makes a >= $150 purchase), the standard reliability "
    "diagnostic for any learned quality/filter score.  Everything is "
    "integer: conf_ppm = clicks*1e6 div events, 10 equal-width bins "
    "by conf div 1e5, per-bin accuracy = positives*1e6 div n, and "
    "ECE_ppm = sum(|acc-conf|*n) div N — no float division anywhere, "
    "so the two engines agree bit-for-bit.  Scale shape: ONE "
    "map-side-combinable groupBy collapses events to per-user stats; "
    "the bin table is 10 rows.",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   COUNT(*) AS n_ev,
                   COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
                   MAX(CASE WHEN event_type = 'purchase'
                             AND CAST(round(value * 100) AS BIGINT) >= 15000
                            THEN 1 ELSE 0 END) AS label
            FROM events GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, label,
                   n_click * 1000000 // n_ev AS conf_ppm
            FROM per_user
        ),
        bins AS (
            SELECT LEAST(9, conf_ppm // 100000) AS bin,
                   COUNT(*) AS n,
                   SUM(conf_ppm) AS sum_conf,
                   SUM(label) AS pos
            FROM scored GROUP BY 1
        ),
        stats AS (
            SELECT bin, n,
                   sum_conf // n AS avg_conf_ppm,
                   pos * 1000000 // n AS acc_ppm
            FROM bins
        ),
        tot AS (
            SELECT SUM(ABS(acc_ppm - avg_conf_ppm) * n) // SUM(n) AS ece_ppm
            FROM stats
        )
        SELECT CAST(s.bin AS BIGINT) AS bin,
               CAST(s.n AS BIGINT) AS n,
               CAST(s.avg_conf_ppm AS BIGINT) AS avg_conf_ppm,
               CAST(s.acc_ppm AS BIGINT) AS acc_ppm,
               CAST(t.ece_ppm AS BIGINT) AS ece_ppm
        FROM stats s CROSS JOIN tot t
        ORDER BY s.bin
    """,
)
def eval_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    yc = F.expr("cast(round(value * 100, 0) as bigint)")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.max(
            F.when((F.col("event_type") == "purchase") & (yc >= 15000), 1).otherwise(0)
        ).alias("label"),
    )
    scored = per_user.select(
        "label", F.expr("n_click * 1000000 div n_ev").alias("conf_ppm")
    )
    bins = scored.groupBy(
        F.least(F.lit(9), F.expr("conf_ppm div 100000")).alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conf_ppm").alias("sum_conf"),
        F.sum("label").alias("pos"),
    )
    stats = bins.select(
        "bin",
        "n",
        F.expr("sum_conf div n").alias("avg_conf_ppm"),
        F.expr("pos * 1000000 div n").alias("acc_ppm"),
    )
    tot = stats.agg(
        F.expr("sum(abs(acc_ppm - avg_conf_ppm) * n) div sum(n)").alias("ece_ppm")
    )
    return (
        stats.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n").cast("bigint").alias("n"),
            F.col("avg_conf_ppm").cast("bigint").alias("avg_conf_ppm"),
            F.col("acc_ppm").cast("bigint").alias("acc_ppm"),
            F.col("ece_ppm").cast("bigint").alias("ece_ppm"),
        )
        .orderBy("bin")
    )


@register(
    "dq_k_anonymity",
    category="data-quality",
    doc="k-anonymity audit of the customer table under the "
    "quasi-identifier (nation, market segment, $100 account-balance "
    "bucket) at k=5 — the training-data governance check that a "
    "record's QI combination hides it among at least k-1 others.  Per "
    "market segment: QI group count, groups below k, rows that would "
    "need suppression, and the suppression rate in exact ppm.  Scale "
    "shape: ONE groupBy on the QI tuple sees data-sized input "
    "(map-side combinable); the per-segment rollup runs over group "
    "counts.  The balance bucket uses floor division on exact cents "
    "(floor semantics identical in both engines for negatives).",
    oracle="""
        WITH qi AS (
            SELECT c_mktsegment,
                   c_nationkey,
                   CAST(floor(round(c_acctbal * 100) / 10000.0) AS BIGINT)
                       AS bal_bucket,
                   COUNT(*) AS cnt
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT c_mktsegment,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(COUNT(*) FILTER (WHERE cnt < 5) AS BIGINT) AS groups_lt_k,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt < 5), 0) AS BIGINT)
                   AS rows_suppressed,
               CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt < 5), 0) * 1000000
                    // SUM(cnt) AS BIGINT) AS suppression_ppm
        FROM qi
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_bucket = F.expr(
        "cast(floor(round(c_acctbal * 100, 0) / 10000.0) as bigint)"
    )
    qi = cust.groupBy(
        "c_mktsegment", "c_nationkey", bal_bucket.alias("bal_bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    small = F.when(F.col("cnt") < 5, F.col("cnt"))
    return (
        qi.groupBy("c_mktsegment")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.count(small).cast("bigint").alias("groups_lt_k"),
            F.coalesce(F.sum(small), F.lit(0)).cast("bigint").alias("rows_suppressed"),
            F.expr(
                "cast(coalesce(sum(case when cnt < 5 then cnt end), 0) "
                "* 1000000 div sum(cnt) as bigint)"
            ).alias("suppression_ppm"),
        )
        .orderBy("c_mktsegment")
    )


#: identical arithmetic for the Wilson 95% lower bound in BOTH engines:
#: only +,-,*,/ and sqrt (all IEEE-754-defined, bit-identical) over the
#: SAME expression tree, from exact integer (k, n) inputs.  z^2 = 3.8416
#: appears only as the same literal on both sides — no engine computes
#: a transcendental.
_WILSON_LOW = (
    "((CAST(k AS DOUBLE) / n + 3.8416 / (2.0 * n)) "
    "- 1.96 * sqrt((CAST(k AS DOUBLE) / n) * (1.0 - CAST(k AS DOUBLE) / n) / n "
    "+ 3.8416 / (4.0 * n * n))) / (1.0 + 3.8416 / n)"
)


@register(
    "eval_wilson_ctr",
    category="eval",
    doc="Conversion rate per event type with the Wilson-score 95% lower "
    "confidence bound — the ranking statistic that beats raw CTR for "
    "small-sample arms (never negative-biased to zero counts, the "
    "standard 'sort by lower bound' pattern).  Counts are exact "
    "integers from ONE map-side-combinable groupBy; the bound itself "
    "uses only +,-,*,/ and sqrt over the identical expression tree in "
    "both engines (IEEE-defined, bit-identical — no log, no erf), "
    "with z^2 baked as the same literal.  Output: n, conversions, "
    "ctr_ppm (integer), and the raw double bound (deliberately "
    "UNROUNDED — it is deterministic).",
    oracle=f"""
        WITH arms AS (
            SELECT event_type,
                   COUNT(*) AS n,
                   COUNT(*) FILTER (
                       WHERE CAST(round(value * 100) AS BIGINT) >= 10000
                   ) AS k
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n,
               CAST(k AS BIGINT) AS conversions,
               CAST(k * 1000000 // n AS BIGINT) AS ctr_ppm,
               {_WILSON_LOW} AS wilson_low
        FROM arms
        ORDER BY event_type
    """,
)
def eval_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    yc = F.expr("cast(round(value * 100, 0) as bigint)")
    arms = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(yc >= 10000, 1)).alias("k"),
    )
    return arms.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("k").cast("bigint").alias("conversions"),
        F.expr("k * 1000000 div n").cast("bigint").alias("ctr_ppm"),
        F.expr(_WILSON_LOW).alias("wilson_low"),
    ).orderBy("event_type")


def _ri_oracle_arm(child: str, fk: str, parent: str, pk: str, label: str) -> str:
    return f"""
        SELECT '{label}' AS relation,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE pk IS NULL) AS BIGINT) AS n_dangling,
               CAST(COUNT(DISTINCT fk)
                    FILTER (WHERE pk IS NULL AND fk IS NOT NULL) AS BIGINT)
                   AS n_dangling_keys,
               CAST(COUNT(*) FILTER (WHERE fk IS NULL) AS BIGINT) AS n_null_fk,
               CAST(COUNT(*) FILTER (WHERE pk IS NULL) * 1000000 // COUNT(*)
                    AS BIGINT) AS orphan_ppm
        FROM (
            SELECT c.{fk} AS fk, p.{pk} AS pk
            FROM {child} c LEFT JOIN {parent} p ON c.{fk} = p.{pk}
        )"""


@register(
    "dq_referential_integrity",
    category="data-quality",
    doc="Cross-table referential-integrity audit — the join-key health "
    "check that catches a broken ingest before a silent inner-join row "
    "loss does: for each FK relation (orders.custkey -> customer, "
    "lineitem.orderkey -> orders, lineitem.suppkey -> supplier) count "
    "referencing rows, dangling rows (no parent), distinct dangling "
    "keys, null FKs, and the orphan rate in exact ppm.  Each relation "
    "is ONE left join against the unique parent key (no fan-out) "
    "folded into conditional aggregates — one pass, no collect, no "
    "correlated subquery; Spark broadcasts the parent when it is "
    "small.  Null FKs never match (SQL join semantics) so they land "
    "in n_dangling AND get their own column.",
    oracle=" UNION ALL ".join(
        [
            _ri_oracle_arm("lineitem", "l_orderkey", "orders", "o_orderkey",
                           "lineitem.orderkey"),
            _ri_oracle_arm("lineitem", "l_suppkey", "supplier", "s_suppkey",
                           "lineitem.suppkey"),
            _ri_oracle_arm("orders", "o_custkey", "customer", "c_custkey",
                           "orders.custkey"),
        ]
    )
    + " ORDER BY relation",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _audit(child: DataFrame, fk: str, parent: DataFrame, pk: str, label: str):
        joined = child.select(F.col(fk).alias("fk")).join(
            parent.select(F.col(pk).alias("pk")),
            F.col("fk") == F.col("pk"),
            "left",
        )
        dang = F.count(F.when(F.col("pk").isNull(), 1))
        return joined.agg(
            F.lit(label).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dang.cast("bigint").alias("n_dangling"),
            F.countDistinct(
                F.when(F.col("pk").isNull(), F.col("fk"))
            ).cast("bigint").alias("n_dangling_keys"),
            F.count(F.when(F.col("fk").isNull(), 1)).cast("bigint").alias(
                "n_null_fk"
            ),
            F.expr(
                "cast(count(case when pk is null then 1 end) * 1000000 "
                "div count(1) as bigint)"
            ).alias("orphan_ppm"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    parts = [
        _audit(li, "l_orderkey", orders, "o_orderkey", "lineitem.orderkey"),
        _audit(li, "l_suppkey", supp, "s_suppkey", "lineitem.suppkey"),
        _audit(orders, "o_custkey", cust, "c_custkey", "orders.custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")


@register(
    "eval_auc_ranksum",
    category="eval",
    doc="Exact ROC-AUC via the Mann-Whitney rank-sum identity, per user "
    "cohort (user_id %% 8): the purchase-vs-view label is scored by the "
    "event's cents value and AUC = (R+ - n+(n+1)/2) / (n+ n-), where R+ "
    "is the sum of AVERAGE ranks of positives.  Ties are exact: the "
    "data collapses to a distinct-score histogram per cohort (the "
    "dq_ks_test shape — the only data-sized shuffle), the cumulative "
    "count gives 2*avg_rank = 2*cum_before + cnt + 1 (always integer), "
    "and AUC lands in ppm via one floor division of nonnegative "
    "integers — identical in both engines, no float ranks, no sort of "
    "raw rows.  At 100 TB the rank window runs over the score "
    "histogram (cents-grid-bounded), never the observations.",
    oracle="""
        WITH e AS (
            SELECT user_id % 8 AS cohort,
                   CAST(round(value * 100) AS BIGINT) AS s,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
            FROM events
            WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
        ),
        h AS (
            SELECT cohort, s, COUNT(*) AS cnt, SUM(pos) AS cpos
            FROM e GROUP BY cohort, s
        ),
        r AS (
            SELECT cohort, cnt, cpos,
                   COALESCE(SUM(cnt) OVER (
                       PARTITION BY cohort ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum
            FROM h
        ),
        a AS (
            SELECT cohort,
                   SUM(cpos * (2 * cum + cnt + 1)) AS two_rpos,
                   SUM(cpos) AS npos,
                   SUM(cnt - cpos) AS nneg
            FROM r GROUP BY cohort
        )
        SELECT CAST(cohort AS BIGINT) AS cohort,
               CAST(npos AS BIGINT) AS n_pos,
               CAST(nneg AS BIGINT) AS n_neg,
               CAST((two_rpos - npos * (npos + 1)) * 1000000
                    // (2 * npos * nneg) AS BIGINT) AS auc_ppm
        FROM a ORDER BY cohort
    """,
)
def eval_auc_ranksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("event_type").isin("purchase", "view")
        & F.col("value").isNotNull()
    ).select(
        (F.col("user_id") % 8).alias("cohort"),
        cents("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("pos"),
    )
    h = e.groupBy("cohort", "s").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("cpos")
    )
    # rank window over the per-cohort score HISTOGRAM (cents-grid-bounded),
    # not the raw observations
    cum_w = (
        W.partitionBy("cohort")
        .orderBy("s")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    r = h.select(
        "cohort",
        "cnt",
        "cpos",
        F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)).alias("cum"),
    )
    a = r.groupBy("cohort").agg(
        F.sum(
            F.col("cpos") * (2 * F.col("cum") + F.col("cnt") + 1)
        ).alias("two_rpos"),
        F.sum("cpos").alias("npos"),
        F.sum(F.col("cnt") - F.col("cpos")).alias("nneg"),
    )
    return a.select(
        F.col("cohort").cast("bigint").alias("cohort"),
        F.col("npos").cast("bigint").alias("n_pos"),
        F.col("nneg").cast("bigint").alias("n_neg"),
        F.expr(
            "cast((two_rpos - npos * (npos + 1)) * 1000000 "
            "div (2 * npos * nneg) as bigint)"
        ).alias("auc_ppm"),
    ).orderBy("cohort")


@register(
    "eval_conformal_coverage",
    category="eval",
    doc="Split-conformal prediction coverage (Vovk et al.; the "
    "distribution-free uncertainty wrapper production ML ships with): "
    "events split deterministically into calibration (event_id %% 3 != "
    "0) and eval; the point predictor is the per-event-type floored "
    "mean cents (sum div count — exact); the conformal radius q is the "
    "calibration order statistic at ceil(0.9 * (n_cal + 1)), found by "
    "a cumulative-count walk over the |residual| HISTOGRAM (never a "
    "sort of raw rows); coverage is the ppm share of eval rows with "
    "|residual| <= q.  Finite-sample theory says coverage >= 90%% in "
    "expectation — the query emits the exact empirical number.  Every "
    "step is integer arithmetic on map-side-combinable aggregates; at "
    "100 TB only the two histogram groupBys see data.",
    oracle="""
        WITH e AS (
            SELECT event_type AS et,
                   CAST(round(value * 100) AS BIGINT) AS v,
                   event_id % 3 = 0 AS is_eval
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('view', 'click', 'purchase')
        ),
        pred AS (
            SELECT et, SUM(v) // COUNT(*) AS p
            FROM e WHERE NOT is_eval GROUP BY et
        ),
        calres AS (
            SELECT e.et, abs(e.v - pred.p) AS r
            FROM e JOIN pred USING (et) WHERE NOT e.is_eval
        ),
        hist AS (
            SELECT et, r, COUNT(*) AS cnt FROM calres GROUP BY et, r
        ),
        walk AS (
            SELECT et, r,
                   SUM(cnt) OVER (PARTITION BY et ORDER BY r
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(cnt) OVER (PARTITION BY et) AS n_cal
            FROM hist
        ),
        q AS (
            SELECT et, MIN(n_cal) AS n_cal,
                   MIN(CASE WHEN cum * 10 >= 9 * (n_cal + 1)
                            THEN r END) AS q_cents
            FROM walk GROUP BY et
        ),
        cov AS (
            SELECT e.et, COUNT(*) AS n_eval,
                   SUM(CASE WHEN abs(e.v - pred.p) <= q.q_cents
                            THEN 1 ELSE 0 END) AS n_in
            FROM e JOIN pred USING (et) JOIN q USING (et)
            WHERE e.is_eval GROUP BY e.et
        )
        SELECT cov.et AS event_type,
               CAST(q.n_cal AS BIGINT) AS n_cal,
               CAST(q.q_cents AS BIGINT) AS q_cents,
               CAST(cov.n_eval AS BIGINT) AS n_eval,
               CAST(cov.n_in * 1000000 // cov.n_eval AS BIGINT)
                   AS coverage_ppm
        FROM cov JOIN q USING (et) ORDER BY event_type
    """,
)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    e = ev.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("view", "click", "purchase")
    ).select(
        F.col("event_type").alias("et"),
        cents("value").alias("v"),
        (F.col("event_id") % 3 == 0).alias("is_eval"),
    )
    # floored-mean predictor: sum div count is exact in both engines for
    # the nonnegative cents domain
    pred = (
        e.filter(~F.col("is_eval"))
        .groupBy("et")
        .agg(F.expr("sum(v) div count(*)").alias("p"))
    )
    calres = (
        e.filter(~F.col("is_eval"))
        .join(F.broadcast(pred), "et")
        .select("et", F.abs(F.col("v") - F.col("p")).alias("r"))
    )
    hist = calres.groupBy("et", "r").agg(F.count(F.lit(1)).alias("cnt"))
    # order-statistic walk over the residual histogram: q = smallest r
    # whose cumulative count reaches the ceil(0.9*(n_cal+1))-th rank;
    # integer k >= ceil(9(n+1)/10)  <=>  10k >= 9(n+1), no fractions
    cum_w = (
        W.partitionBy("et").orderBy("r").rowsBetween(W.unboundedPreceding, 0)
    )
    walk = hist.select(
        "et",
        "r",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(W.partitionBy("et")).alias("n_cal"),
    )
    q = walk.groupBy("et").agg(
        F.min("n_cal").alias("n_cal"),
        F.min(
            F.when(
                F.col("cum") * 10 >= 9 * (F.col("n_cal") + 1), F.col("r")
            )
        ).alias("q_cents"),
    )
    cov = (
        e.filter(F.col("is_eval"))
        .join(F.broadcast(pred), "et")
        .join(F.broadcast(q.select("et", "q_cents")), "et")
        .groupBy("et")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("p")) <= F.col("q_cents"), 1
                ).otherwise(0)
            ).alias("n_in"),
        )
    )
    return (
        cov.join(q, "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
            F.col("q_cents").cast("bigint").alias("q_cents"),
            F.col("n_eval").cast("bigint").alias("n_eval"),
            F.expr("cast(n_in * 1000000 div n_eval as bigint)").alias(
                "coverage_ppm"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "dq_l_diversity",
    category="data-quality",
    doc="l-diversity audit (Machanavajjhala et al. 2007), the governance "
    "check k-anonymity misses: a QI group can hide a record among k "
    "others and STILL leak the sensitive attribute if every member "
    "shares it.  QI = (nation, market segment), sensitive = the $100 "
    "account-balance bucket, l = 3: per market segment, groups whose "
    "members span fewer than 3 distinct buckets let an attacker infer "
    "the balance range of anyone they can place in the group.  Scale "
    "shape: one (QI, sensitive) groupBy sees data-sized input, the "
    "distinct-sensitive census and the per-segment rollup run over "
    "group counts.  Companion to dq_k_anonymity (same cents-exact "
    "bucketing).",
    oracle="""
        WITH cell AS (
            SELECT c_mktsegment, c_nationkey,
                   CAST(floor(round(c_acctbal * 100) / 10000.0) AS BIGINT)
                       AS bal_bucket,
                   COUNT(*) AS cnt
            FROM customer GROUP BY 1, 2, 3
        ),
        grp AS (
            SELECT c_mktsegment, c_nationkey,
                   COUNT(*) AS n_sensitive,
                   SUM(cnt) AS n_rows
            FROM cell GROUP BY 1, 2
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(n_rows) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (WHERE n_sensitive < 3) AS BIGINT)
                   AS groups_lt_l,
               CAST(COALESCE(SUM(n_rows) FILTER (WHERE n_sensitive < 3), 0)
                    AS BIGINT) AS rows_exposed,
               CAST(COALESCE(SUM(n_rows) FILTER (WHERE n_sensitive < 3), 0)
                    * 1000000 // SUM(n_rows) AS BIGINT) AS exposure_ppm
        FROM grp GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bal_bucket = F.expr(
        "cast(floor(round(c_acctbal * 100, 0) / 10000.0) as bigint)"
    )
    cell = cust.groupBy(
        "c_mktsegment", "c_nationkey", bal_bucket.alias("bal_bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    grp = cell.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n_sensitive"), F.sum("cnt").alias("n_rows")
    )
    exposed = F.when(F.col("n_sensitive") < 3, F.col("n_rows"))
    return (
        grp.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.count(exposed).cast("bigint").alias("groups_lt_l"),
            F.coalesce(F.sum(exposed), F.lit(0))
            .cast("bigint")
            .alias("rows_exposed"),
            F.expr(
                "cast(coalesce(sum(case when n_sensitive < 3 then n_rows "
                "end), 0) * 1000000 div sum(n_rows) as bigint)"
            ).alias("exposure_ppm"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "eval_ips_offpolicy",
    category="eval",
    doc="Off-policy evaluation via inverse-propensity scoring (IPS) and "
    "its self-normalized variant (SNIPS) — the counterfactual 'what "
    "would THIS policy have earned on the logged traffic' estimator "
    "behind bandit/recommender/RLHF-reward evaluation (Horvitz-"
    "Thompson; Swaminathan & Joachims 2015).  Logged decisions = "
    "events (context u = user_id, action = event_type, reward = "
    "cents); the logging propensity is a deterministic exact rational "
    "p/10 with p = 1 + (u*7 + length(action)*3) %% 9, so 1/b scales to "
    "the integer 25200 div p (25200 = lcm(1..9) x 10 x ...; exact for "
    "every p).  Two target policies are scored in one scan: "
    "pi_click (click if u even, else view) and pi_buy (purchase if "
    "u %% 3 = 0, else click).  All sums are exact integers; the two "
    "final divisions are single IEEE ops identical in both engines.  "
    "Scale shape: one map-side-combinable aggregation per policy over "
    "one scan — no shuffle beyond the 2-row rollup.",
    oracle="""
        WITH logged AS (
            SELECT user_id AS u, event_type AS a,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   1 + (user_id * 7 + length(event_type) * 3) % 9 AS p
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('view', 'click', 'purchase')
        ),
        scored AS (
            SELECT pol.policy, l.cents, 25200 // l.p AS w,
                   CASE WHEN pol.policy = 'pi_click' THEN
                            CASE WHEN l.u % 2 = 0 THEN 'click'
                                 ELSE 'view' END
                        ELSE CASE WHEN l.u % 3 = 0 THEN 'purchase'
                                  ELSE 'click' END
                   END = l.a AS match
            FROM logged l
            CROSS JOIN (VALUES ('pi_click'), ('pi_buy')) pol(policy)
        )
        SELECT policy,
               CAST(COUNT(*) AS BIGINT) AS n_logged,
               CAST(SUM(CASE WHEN match THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_matched,
               CAST(SUM(CASE WHEN match THEN cents * w ELSE 0 END)
                    AS BIGINT) AS ips_scaled,
               CAST(SUM(CASE WHEN match THEN w ELSE 0 END) AS BIGINT)
                   AS w_scaled,
               CAST(SUM(CASE WHEN match THEN cents * w ELSE 0 END)
                    AS DOUBLE)
                   / (252000.0 * COUNT(*)) AS ips_usd_per_event,
               CAST(SUM(CASE WHEN match THEN cents * w ELSE 0 END)
                    AS DOUBLE)
                   / (100.0 * SUM(CASE WHEN match THEN w ELSE 0 END))
                   AS snips_usd
        FROM scored GROUP BY policy ORDER BY policy
    """,
)
def eval_ips_offpolicy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    logged = ev.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin("view", "click", "purchase")
    ).select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("a"),
        cents("value").alias("cts"),
        (
            1 + (F.col("user_id") * 7 + F.length("event_type") * 3) % 9
        ).alias("p"),
    )
    pols = spark.createDataFrame(
        [("pi_click",), ("pi_buy",)], "policy string"
    )
    scored = logged.crossJoin(F.broadcast(pols)).select(
        "policy",
        "cts",
        F.expr("25200 div p").alias("w"),
        (
            F.when(
                F.col("policy") == "pi_click",
                F.when(F.col("u") % 2 == 0, "click").otherwise("view"),
            ).otherwise(
                F.when(F.col("u") % 3 == 0, "purchase").otherwise("click")
            )
            == F.col("a")
        ).alias("match"),
    )
    m = F.when(F.col("match"), F.col("cts") * F.col("w")).otherwise(F.lit(0))
    mw = F.when(F.col("match"), F.col("w")).otherwise(F.lit(0))
    return (
        scored.groupBy("policy")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_logged"),
            F.sum(F.when(F.col("match"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_matched"),
            F.sum(m).cast("bigint").alias("ips_scaled"),
            F.sum(mw).cast("bigint").alias("w_scaled"),
            (
                F.sum(m).cast("double")
                / (F.lit(252000.0) * F.count(F.lit(1)))
            ).alias("ips_usd_per_event"),
            (F.sum(m).cast("double") / (F.lit(100.0) * F.sum(mw))).alias(
                "snips_usd"
            ),
        )
        .orderBy("policy")
    )
