"""Property tests for the round-3 preference/retrieval/curation additions
beyond oracle parity: Bradley-Terry conservation + normalization, binary
Hamming vs a naive python re-computation, CCNet tercile balance, and
attribution credit reconciliation."""

from __future__ import annotations

from flow_spark.queries.registry import get

SF = "/root/testdata/sf0.001"


def test_bradley_terry_conservation_and_normalization(spark):
    rows = get("ml_bradley_terry").builder(spark, SF).collect()
    assert len(rows) == 5
    # every match produces exactly one win; n_matches double-counts
    # (directed pair table), so sum(wins) == sum(n_matches) / 2
    assert sum(r["wins"] for r in rows) * 2 == sum(r["n_matches"] for r in rows)
    for it in ("rating_iter1", "rating_iter2"):
        total = sum(r[it] for r in rows)
        # normalization targets n_players * 1e6; each floor division
        # can lose at most 1 micro-unit per player
        assert 5_000_000 - 5 <= total <= 5_000_000, (it, total)
        assert all(r[it] > 0 for r in rows)
    # ratings actually separate the arms (not a degenerate all-equal fix)
    assert len({r["rating_iter2"] for r in rows}) > 1


def test_binary_hamming_matches_naive(spark):
    from flow_spark.catalog import load_table

    emb = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, SF, "embeddings").collect()
    }
    signs = {k: [1 if x > 0 else 0 for x in v] for k, v in emb.items()}

    def ham(a, b):
        return sum(x != y for x, y in zip(signs[a], signs[b]))

    got = {}
    for r in get("emb_binary_hamming_topk").builder(spark, SF).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["hamming"])
        )
    assert got, "no query panel rows"
    for q, lst in got.items():
        naive = sorted(
            (ham(q, c), c) for c in signs if c != q
        )[:5]
        lst.sort()
        assert [(d, c) for _, c, d in lst] == naive, q


def test_ccnet_terciles_balanced_and_kept(spark):
    rows = get("text_ccnet_buckets").builder(spark, SF).collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], 0)
        by_lang[r["lang"]][r["bucket"]] += 1
        assert r["kept"] == (1 if r["bucket"] in ("head", "middle") else 0)
    for lang, buckets in by_lang.items():
        counts = [buckets.get(b, 0) for b in ("head", "middle", "tail")]
        assert max(counts) - min(counts) <= 1, (lang, counts)


def test_attribution_credit_reconciles(spark):
    rows = get("funnel_attribution").builder(spark, SF).collect()
    total_ppm = sum(r["linear_credit_ppm"] for r in rows)
    conversions = sum(r["last_touch_conversions"] for r in rows)
    # exact-integer property: per-conversion credit sums to exactly 1e6
    assert total_ppm == conversions * 1_000_000
    assert all(r["n_touches"] >= r["last_touch_conversions"] for r in rows)


def test_kneser_ney_discounts_below_mle(spark):
    rows = get("text_kneser_ney").builder(spark, SF).collect()
    assert len(rows) == 50
    for r in rows:
        # exact sandwich from the KN formula: the discounted first term
        # alone is a lower bound; the backoff term is at most
        # D*n1f/c1 * 1 (since Pcont = n1b/T <= 1), giving the upper bound
        lo = (1_000_000 * max(4 * r["c12"] - 3, 0)) // (4 * r["c1"])
        hi = r["p_mle_ppm"] + (1_000_000 * 3 * r["n1f"]) // (4 * r["c1"]) + 1
        assert lo <= r["p_kn_ppm"] <= hi, r
        assert 0 < r["p_kn_ppm"]
        assert r["c12"] <= r["c1"]


def test_ann_recall_bounds(spark):
    rows = get("sim_ann_recall_eval").builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] == 10
        assert 0 <= r["n_hit"] <= min(r["n_approx"], r["n_exact"])
        assert r["recall_ppm"] == 1_000_000 * r["n_hit"] // r["n_exact"]


def test_boosting_mw_shape_and_determinism(spark):
    rows1 = get("ml_boosting_mw").builder(spark, SF).collect()
    assert [r["round"] for r in rows1] == [1, 2, 3]
    for r in rows1:
        assert r["pol"] in (-1, 1)
        assert 0 <= r["bucket"] <= 32
        assert r["err_weighted"] > 0
    # weights only ever double: total mass after round r is bounded by
    # 2^r * n_docs, so the weighted error can never exceed that
    n_docs = 500
    for r in rows1:
        assert r["err_weighted"] <= (2 ** (r["round"] - 1)) * n_docs
    # the whole loop (stump picks included) must be retry-deterministic
    rows2 = get("ml_boosting_mw").builder(spark, SF).collect()
    assert [tuple(r) for r in rows1] == [tuple(r) for r in rows2]
