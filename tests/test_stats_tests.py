"""Independent local-Python verification of the statistical drift tests
(beyond oracle parity): the KS/Mann-Whitney/autocorrelation/CUSUM results
are recomputed from raw collected rows with the textbook formulas."""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import timedelta

from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.queries.registry import get
from flow_spark.queries.stats_tests import _BENFORD_PPM, _CUSUM_H, _CUSUM_K

SF = "/root/testdata/sf0.001"


def _arm_values(spark):
    rows = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"))
        .collect()
    )
    a = sorted(r["v"] for r in rows if r["event_type"] == "click")
    b = sorted(r["v"] for r in rows if r["event_type"] != "click")
    return a, b


def test_ks_matches_textbook(spark):
    a, b = _arm_values(spark)
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    ca = Counter(a)
    cb = Counter(b)
    cum_a = cum_b = 0
    best = (-1, None)
    for v in values:
        cum_a += ca.get(v, 0)
        cum_b += cb.get(v, 0)
        dn = abs(cum_a * nb - cum_b * na)
        if dn > best[0]:
            best = (dn, v)
    row = get("dq_ks_test").builder(spark, SF).collect()[0]
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["d_num"] == best[0]
    assert row["argmax_v_cents"] == best[1]
    assert row["ks_ppm"] == (1_000_000 * best[0]) // (na * nb)
    want_flag = int(10_000 * best[0] ** 2 >= 18_438 * (na + nb) * na * nb)
    assert row["flag_drift"] == want_flag


def test_mann_whitney_matches_textbook(spark):
    a, b = _arm_values(spark)
    na, nb = len(a), len(b)
    pooled = Counter(a) + Counter(b)
    ca = Counter(a)
    # doubled midranks: tie group of size t after p rows -> 2p + t + 1
    prev = 0
    rsum2_a = 0
    tie_t = 0
    for v in sorted(pooled):
        t = pooled[v]
        r2 = 2 * prev + t + 1
        rsum2_a += ca.get(v, 0) * r2
        tie_t += t * t * t - t
        prev += t
    u2_a = rsum2_a - na * (na + 1)
    row = get("dq_mann_whitney").builder(spark, SF).collect()[0]
    assert row["u2_a"] == u2_a
    assert row["u2_b"] == 2 * na * nb - u2_a
    assert row["tie_term"] == tie_t
    assert row["auc_ppm"] == (1_000_000 * u2_a) // (2 * na * nb)
    n = na + nb
    lhs = 3 * n * (n - 1) * (u2_a - na * nb) ** 2
    rhs = 4 * na * nb * (n**3 - n - tie_t)
    assert row["flag_shift"] == int(lhs >= rhs)
    # AUC of two samples from the same generator should be near 1/2
    assert 400_000 < row["auc_ppm"] < 600_000


def test_benford_accounting(spark):
    rows = get("dq_benford").builder(spark, SF).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert sum(_BENFORD_PPM) == 1_000_000
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r["o_cnt"] for r in rows) == n_orders
    chi2 = rows[0]["chi2_ppm"]
    assert all(r["chi2_ppm"] == chi2 for r in rows)
    assert chi2 == sum(r["contrib_ppm"] for r in rows)
    # TPC-H prices are band-uniform, decidedly NOT Benford -> must fire
    assert all(r["flag_benford"] == 1 for r in rows)


def test_autocorrelation_matches_textbook(spark):
    ev = load_table(spark, SF, "events").select(
        F.date_trunc("hour", "ts").alias("h")
    )
    counts = Counter(r["h"] for r in ev.collect())
    lo, hi = min(counts), max(counts)
    xs = []
    t = lo
    while t <= hi:
        xs.append(counts.get(t, 0))
        t += timedelta(hours=1)
    got = {r["lag"]: r for r in get("ts_autocorrelation").builder(spark, SF).collect()}
    assert set(got) == {1, 2, 3}
    for lag in (1, 2, 3):
        x = xs[lag:]
        y = xs[:-lag]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxy = sum(p * q for p, q in zip(x, y))
        sxx = sum(p * p for p in x)
        syy = sum(q * q for q in y)
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r = got[lag]
        assert r["n_pairs"] == n
        assert r["r_num"] == num
        sign = -1 if num < 0 else 1
        assert r["r2_ppm_signed"] == sign * ((1_000_000 * num * num) // den)


def test_cusum_matches_recurrence(spark):
    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("user_id") % 10 == 0)
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .collect()
    )
    per_user = defaultdict(Counter)
    for r in ev:
        per_user[r["user_id"]][r["day"]] += 1
    got = {r["user_id"]: r for r in get("ts_changepoint_cusum").builder(spark, SF).collect()}
    assert set(got) == set(per_user)
    for uid, counts in per_user.items():
        lo, hi = min(counts), max(counts)
        s = 0
        peak = 0
        alarm_day = None
        s_at_alarm = None
        t = lo
        while t <= hi:
            s = max(0, s + counts.get(t, 0) - _CUSUM_K)
            peak = max(peak, s)
            if alarm_day is None and s >= _CUSUM_H:
                alarm_day = t.strftime("%Y-%m-%d")
                s_at_alarm = s
            t += timedelta(days=1)
        r = got[uid]
        assert r["peak_s"] == peak, uid
        assert r["alarm_day"] == alarm_day, uid
        assert r["s_at_first_alarm"] == s_at_alarm, uid
