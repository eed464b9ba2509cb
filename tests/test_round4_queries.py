"""Property tests for the round-4 additions beyond oracle parity:
NDCG bounds, KM monotonicity, Wilson-bound ordering, k-anonymity
accounting, MMR pick invariants, PCA iterate bounds, rollback content.
"""

from __future__ import annotations

from flow_spark.queries.registry import get

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_ndcg_bounds_and_ideal(spark):
    rows = get("eval_ndcg_at_k").builder(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        # DCG can never beat ideal DCG; ppm bounded by 1e6
        assert 0 < r["dcg_units"] <= r["idcg_units"]
        assert 0 < r["ndcg_ppm"] <= 1_000_000


def test_kaplan_meier_monotone(spark):
    rows = get("ts_kaplan_meier").builder(spark, SF01).collect()
    assert rows, "curve must have at least one event time"
    prev_s, prev_n = 1_000_000, None
    for r in sorted(rows, key=lambda r: r["dur_days"]):
        # survival never increases; risk set strictly shrinks over time
        assert r["surv_ppm"] <= prev_s
        assert 0 < r["events"] <= r["at_risk"]
        if prev_n is not None:
            assert r["at_risk"] < prev_n
        prev_s, prev_n = r["surv_ppm"], r["at_risk"]


def test_wilson_lower_bound_below_ctr(spark):
    rows = get("eval_wilson_ctr").builder(spark, SF01).collect()
    for r in rows:
        ctr = r["conversions"] / r["n"]
        assert 0.0 <= r["wilson_low"] <= ctr
        # the bound tightens toward ctr but never reaches it for 0<k<n
        if 0 < r["conversions"] < r["n"]:
            assert r["wilson_low"] < ctr


def test_k_anonymity_accounting(spark):
    rows = get("dq_k_anonymity").builder(spark, SF01).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r["rows_suppressed"] <= r["n_rows"]
        assert 0 <= r["groups_lt_k"] <= r["n_groups"]
        # every below-k group has 1..4 rows
        if r["groups_lt_k"]:
            assert r["rows_suppressed"] < 5 * r["groups_lt_k"] + 1
        assert r["suppression_ppm"] == r["rows_suppressed"] * 1_000_000 // r["n_rows"]


def test_mmr_picks_distinct_and_first_is_top_rel(spark):
    rows = get("sim_mmr_rerank").builder(spark, SF01).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, picks in by_q.items():
        picks.sort(key=lambda r: r["pos"])
        assert [p["pos"] for p in picks] == [1, 2, 3, 4]
        cids = [p["vec_id"] for p in picks]
        assert len(set(cids)) == 4, f"duplicate pick for query {qid}"
        assert qid not in cids, "query must not retrieve itself"
        # pick 1 is pure relevance; later MMR scores can only be lower
        # than twice their own relevance (diversity penalty >= 0 unless
        # all pairwise sims are negative, which the score still bounds)
        p1 = picks[0]
        assert p1["mmr_score"] == 2 * p1["rel_units"]
        assert all(p["rel_units"] <= p1["rel_units"] for p in picks[1:])


def test_pca_iterate_bounded_and_nonzero(spark):
    rows = get("emb_pca_power").builder(spark, SF01).collect()
    assert len(rows) == 64
    comps = [r["comp"] for r in rows]
    # rescale bounds every component to ~1000 units
    assert all(abs(c) <= 1001 for c in comps)
    assert max(abs(c) for c in comps) >= 900, "dominant dim should be near scale"
    assert any(c != 0 for c in comps)


def test_snap_rollback_restores_exactly(spark):
    rows = get("snap_rollback").builder(spark, SF).collect()
    by = {r["state"]: r for r in rows}
    assert by["bad"]["n"] == 2 * by["restored"]["n"]
    assert by["bad"]["key_sum"] == 2 * by["restored"]["key_sum"]


def test_cross_correlation_zero_lag_is_symmetric_baseline(spark):
    rows = get("ts_cross_correlation").builder(spark, SF01).collect()
    assert [r["lag"] for r in rows] == list(range(13))
    # overlap shrinks by exactly one grid row per extra lag step
    n0 = rows[0]["n_pairs"]
    for r in rows:
        assert r["n_pairs"] == n0 - r["lag"]


def test_macro_f1_confusion_consistency(spark):
    rows = get("eval_macro_f1").builder(spark, SF01).collect()
    assert len(rows) == 10
    total_true = sum(r["n_true"] for r in rows)
    assert total_true == 500  # every vector classified exactly once
    for r in rows:
        assert 0 <= r["tp"] <= r["n_true"]
        assert 0 <= r["precision_ppm"] <= 1_000_000
        assert 0 <= r["recall_ppm"] <= 1_000_000
        # F1 is between min and max of P and R (harmonic-mean bound)
        lo, hi = sorted((r["precision_ppm"], r["recall_ppm"]))
        assert r["f1_ppm"] <= hi + 1
        if lo > 0:
            assert r["f1_ppm"] >= lo - 1
    macro = rows[0]["macro_f1_ppm"]
    assert macro == sum(r["f1_ppm"] for r in rows) // 10


def test_vocab_growth_monotone_and_bounded(spark):
    rows = get("text_vocab_growth").builder(spark, SF01).collect()
    assert [r["n_docs_prefix"] for r in rows] == [16, 32, 64, 128, 256]
    prev_v, prev_t = 0, 0
    for r in rows:
        # token mass strictly grows; vocabulary is non-decreasing (the
        # synthetic corpus SATURATES its small vocabulary early) and can
        # never exceed total tokens
        assert r["vocab"] >= max(prev_v, 1)
        assert r["total_tokens"] > prev_t
        assert r["vocab"] <= r["total_tokens"]
        prev_v, prev_t = r["vocab"], r["total_tokens"]
    # Heaps' law: type-token ratio decays as the corpus grows
    ttrs = [r["ttr_ppm"] for r in rows]
    assert ttrs == sorted(ttrs, reverse=True)


def test_time_weighted_avg_bounds(spark):
    rows = get("ts_time_weighted_avg").builder(spark, SF01).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_intervals"] >= r["n_users"]
        assert r["held_seconds"] > 0
        assert 0 <= r["twa_cents"] <= 100_000


def test_dtw_band_matches_python_reference(spark):
    """Independent check: recompute the banded DTW in plain Python from
    the same daily series and compare cell-for-cell."""
    import duckdb

    con = duckdb.connect()
    daily = con.execute(f"""
        WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS dmin
                    FROM '{SF01}/events.parquet'),
        daily AS (
            SELECT user_id,
                   date_diff('day', d0.dmin, CAST(ts AS DATE)) AS dd,
                   SUM(CAST(round(value * 100) AS BIGINT)) AS c
            FROM '{SF01}/events.parquet', d0
            WHERE user_id % 25 = 0
              AND date_diff('day', d0.dmin, CAST(ts AS DATE)) < 30
            GROUP BY user_id, dd)
        SELECT user_id, dd, c FROM daily
    """).fetchall()
    series: dict = {}
    for u, dd, c in daily:
        series.setdefault(u, [0] * 30)[dd] = c
    n_users = len(series)
    ref = [sum(s[d] for s in series.values()) // n_users for d in range(30)]

    def dtw_band(a, b, r=3):
        inf = float("inf")
        dp = [[inf] * 30 for _ in range(30)]
        for i in range(30):
            for j in range(max(0, i - r), min(30, i + r + 1)):
                cost = abs(a[i] - b[j])
                if i == 0 and j == 0:
                    dp[i][j] = cost
                else:
                    best = min(
                        dp[i - 1][j] if i > 0 else inf,
                        dp[i][j - 1] if j > 0 else inf,
                        dp[i - 1][j - 1] if i > 0 and j > 0 else inf,
                    )
                    dp[i][j] = cost + best
        return dp[29][29]

    rows = get("ts_dtw_band").builder(spark, SF01).collect()
    assert len(rows) == n_users
    for r_ in rows:
        assert r_["dtw_cents"] == dtw_band(series[r_["user_id"]], ref)
