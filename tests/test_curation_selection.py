"""Tests for the round-3 curation/selection additions: SemDeDup semantic
dedup, DSIR importance resampling, and integer-exact BM25 retrieval.

Parity vs the DuckDB oracle is checked by tools/parity_check.py; these
tests pin the OPERATOR-level claims the docs make (recall on planted
dups, target-domain discrimination, retrieval sanity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flow_spark.queries.registry import get


def test_semantic_dedup_recovers_planted_near_dups(spark, sf_dir):
    """Every 10th vector is re-inserted with a deterministic +/-3%
    per-element ramp; the cluster-then-dedup pipeline must recover
    nearly all of them (a pair may straddle a cluster boundary — the
    documented approximate-recall property)."""
    df = get("dedup_semantic").builder(spark, sf_dir).collect()
    removed = {r.removed_id for r in df}
    n_planted = len(
        {r.removed_id for r in df if r.removed_id >= 100000000}
    )
    # all removals are planted copies (no false positives at tau=0.95)
    assert removed and removed == {r for r in removed if r >= 100000000}
    # sf0.001 plants 50 copies; require >= 90% recall
    assert n_planted >= 45, n_planted
    # keep-one policy: the kept partner is always a lower id
    assert all(r.dup_of < r.removed_id for r in df)


def test_semantic_dedup_pair_work_is_within_cluster_only(spark, sf_dir):
    """The within-cluster self-join must never compare across clusters:
    each removal's dup_of partner sits in the same cluster."""
    df = get("dedup_semantic").builder(spark, sf_dir)
    # cent_id is carried through the pair join, so a cross-cluster pair
    # would have been impossible by construction; assert the removal
    # count matches distinct removed ids (no double-count across cents)
    rows = df.collect()
    assert len(rows) == len({r.removed_id for r in rows})


def test_dsir_prefers_target_domain(spark, sf_dir):
    """DSIR keep-rate for the target domain (lang='en') must exceed the
    keep-rate of every other language, and mean scores must order the
    same way — otherwise the importance weights are vacuous."""
    df = get("sample_importance_dsir").builder(spark, sf_dir)
    stats = {
        r.lang: (r.keep_rate, r.mean_score)
        for r in df.groupBy("lang")
        .agg(
            F.avg("keep").alias("keep_rate"),
            F.avg("score_pm").alias("mean_score"),
        )
        .collect()
    }
    en_keep, en_score = stats.pop("en")
    assert stats, "fixture should have non-en languages"
    for lang, (keep, score) in stats.items():
        assert en_keep > keep, (lang, en_keep, keep)
        assert en_score > score, (lang, en_score, score)


def test_bm25_results_contain_query_terms(spark, sf_dir):
    """Every retrieved doc must actually contain at least one term of its
    query, ranks must be 1..k dense per query, and scores non-increasing."""
    from flow_spark.catalog import load_table
    from flow_spark.operators.text import tokens
    from flow_spark.queries.text_analysis import _BM25_QUERIES

    res = get("text_bm25_topk").builder(spark, sf_dir).collect()
    assert res
    by_q: dict[int, list] = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    docs = {
        r.doc_id: set(r.toks)
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .collect()
    }
    terms_by_q: dict[int, set] = {}
    for qid, term in _BM25_QUERIES:
        terms_by_q.setdefault(qid, set()).add(term)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)
        for r in rows:
            assert docs[r.doc_id] & terms_by_q[qid], (qid, r.doc_id)


def test_loo_target_encoding_excludes_self(spark, sf_dir):
    """The LOO encode of a row must equal the group mean computed WITHOUT
    that row — recompute independently for one nation and compare."""
    rows = (
        get("feat_target_encode_loo")
        .builder(spark, sf_dir)
        .filter(F.col("nat") == 7)
        .collect()
    )
    assert len(rows) > 1
    s = sum(r.y_cents for r in rows)
    n = len(rows)
    for r in rows[:20]:
        assert r.loo_enc_cents == (s - r.y_cents) // (n - 1)


def test_assoc_rules_integer_invariants(spark, sf_dir):
    """Confidence can't exceed 1000 permille, ranks are dense, and lift
    is symmetric in its inputs (same pair stats both directions)."""
    rows = get("seq_assoc_rules").builder(spark, sf_dir).collect()
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert 0 < r.conf_ab_pm <= 1000
        assert 0 < r.conf_ba_pm <= 1000
        assert r.ia < r.ib


def test_decision_stump_beats_no_split(spark, sf_dir):
    """The best split's weighted child impurity must not exceed the
    parent impurity (Gini is concave — the optimal stump never hurts),
    and each side must be non-empty."""
    from flow_spark.catalog import load_table

    rows = get("ml_decision_stump").builder(spark, sf_dir).collect()
    assert rows and rows[0].rank == 1
    best = rows[0]
    assert best.n_l > 0 and best.n_r > 0
    emb = load_table(spark, sf_dir, "embeddings")
    counts = [r[1] for r in emb.groupBy("label").count().collect()]
    n = sum(counts)
    assert best.n_l + best.n_r == n
    parent_micro = (n * n - sum(c * c for c in counts)) * 1000000 // n
    assert best.gini_micro <= parent_micro
    # reported candidates are sorted by score
    scores = [r.gini_micro for r in rows]
    assert scores == sorted(scores)
