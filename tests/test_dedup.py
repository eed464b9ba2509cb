

def test_minhash_fast_path_finds_same_neardups(spark, sf_dir):
    """portable=False (xxhash64 base hash, the production path) must
    recover essentially the same candidate pairs as the md5-portable
    path on the fixture corpus — the algorithm is identical, only the
    base hash differs, so genuine near-dups bucket together under both."""
    from flow_spark.catalog import load_table
    from flow_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, distinct=False)

    def pair_set(portable):
        sig = minhash_signatures(sh, portable=portable)
        return {
            (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sig).collect()
        }

    slow, fast = pair_set(True), pair_set(False)
    assert fast  # found something
    overlap = len(slow & fast) / max(len(slow | fast), 1)
    assert overlap >= 0.9, (len(slow), len(fast), overlap)


def test_hot_bucket_salting_preserves_pairs_and_connectivity(spark):
    """VERDICT r2 #8: a bucket larger than max_bucket must not simply lose
    its pairs.  hot_bucket='salt' splits it into sub-buckets (all pairs
    within each, bounded quadratic) plus rep links keeping the bucket ONE
    connected component; hot_bucket='drop' (the old behavior) loses it."""
    from pyspark.sql import functions as F

    from flow_spark.operators.dedup import (
        connected_components,
        lsh_candidate_pairs,
    )

    # n_bands=1, rows_per_band=1 -> the band key is just mh0
    rows = [(i, 7) for i in range(1, 13)] + [(100, 9), (101, 9)]
    sig = spark.createDataFrame(rows, "doc_id long, mh0 long")

    dropped = lsh_candidate_pairs(
        sig, n_bands=1, rows_per_band=1, max_bucket=5, hot_bucket="drop"
    )
    assert sorted((r.doc_a, r.doc_b) for r in dropped.collect()) == [(100, 101)]

    salted = lsh_candidate_pairs(
        sig, n_bands=1, rows_per_band=1, max_bucket=5, hot_bucket="salt"
    )
    pairs = sorted((r.doc_a, r.doc_b) for r in salted.collect())
    # chunks [1..5] [6..10] [11,12]: C(5,2)*2 + 1 within + 2 rep links + cold
    hot_pairs = [p for p in pairs if p[0] < 100]
    assert len(hot_pairs) == 10 + 10 + 1 + 2
    assert (100, 101) in pairs
    # all pairs bounded: every pair is within a chunk or a rep link, so no
    # doc pairs with more than max_bucket + 1 others
    assert (1, 6) in hot_pairs and (1, 11) in hot_pairs  # rep links
    assert (2, 7) not in hot_pairs  # cross-chunk non-rep pair NOT generated

    comp = connected_components(salted.filter(F.col("doc_a") < 100))
    labels = {r.doc_id: r.component for r in comp.collect()}
    assert set(labels) == set(range(1, 13))
    assert len(set(labels.values())) == 1  # one component spans the bucket

    # a cold bucket is identical under both policies
    cold_only = lsh_candidate_pairs(
        sig.filter(F.col("doc_id") >= 100),
        n_bands=1,
        rows_per_band=1,
        max_bucket=5,
        hot_bucket="salt",
    )
    assert sorted((r.doc_a, r.doc_b) for r in cold_only.collect()) == [(100, 101)]


def test_verify_pairs_jaccard_restricted_to_candidates(spark):
    """verify_pairs_jaccard scores ONLY the supplied candidate pairs:
    a high-Jaccard pair NOT in the candidate list must not appear, and a
    zero-overlap candidate drops under any positive threshold."""
    from pyspark.sql import functions as F  # noqa: F401

    from flow_spark.operators.dedup import verify_pairs_jaccard, word_shingles

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
            (3, "alpha beta gamma delta zeta"),     # near dup of 1
            (4, "one two three four five"),         # unrelated
        ],
        "doc_id long, text string",
    )
    sh = word_shingles(docs)
    cands = spark.createDataFrame(
        [(1, 2), (1, 4)], "doc_a long, doc_b long"
    )  # (1,3) deliberately NOT a candidate
    out = {(r.doc_a, r.doc_b): r.jaccard for r in
           verify_pairs_jaccard(cands, sh, threshold=0.5).collect()}
    assert out == {(1, 2): 1.0}  # (1,4) zero overlap dropped; (1,3) not scored


def test_ml_kmeans_quantized_partitioning_invariant(spark):
    """Exact-integer k-means must give identical clusters/inertia at any
    shuffle partitioning (all math is exact; argmin ties deterministic)."""
    from flow_spark.queries.registry import get

    q = get("ml_kmeans_quantized")
    sf = "/root/testdata/sf0.001"
    base = [tuple(r) for r in q.builder(spark, sf).collect()]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = [tuple(r) for r in q.builder(spark, sf).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == alt
    assert len(base) == 4 and all(n > 0 for _, n, _ in base)


def test_dup_spans_invariants(spark, sf_dir):
    """dedup_dup_spans: spans are per-doc disjoint, ordered, each at least
    K tokens long, inside the doc, and every reported span really does
    contain a gram shared with another document (no false spans)."""
    from flow_spark.queries.dedup import _SPAN_K, dedup_dup_spans

    rows = dedup_dup_spans(spark, sf_dir).collect()
    assert rows  # the fixture corpus has cross-doc duplication
    by_doc = {}
    for r in rows:
        assert r.span_toks == r.end_tok - r.start_tok + 1
        assert r.span_toks >= _SPAN_K
        assert 0 <= r.start_tok <= r.end_tok < r.n_toks
        by_doc.setdefault(r.doc_id, []).append(r)
    for spans in by_doc.values():
        spans.sort(key=lambda r: r.span_id)
        for a, b in zip(spans, spans[1:]):
            # merged islands: next span starts beyond a K-gap, so spans
            # never overlap and were not mergeable
            assert b.start_tok > a.end_tok + 1


def test_dup_spans_finds_planted_duplicate(spark):
    """A 12-token run planted in two otherwise-distinct docs comes back as
    one span in each doc covering exactly the planted run (K=8 grams at
    stride 1 merge to the full run)."""
    from flow_spark.queries import dedup as dq

    run = " ".join(f"tok{i}" for i in range(12))
    a = "alpha beta " + run + " gamma delta epsilon zeta eta theta"
    b = "one two three four " + run + " five six seven eight nine ten"
    c = "totally unrelated words " + " ".join(f"u{i}" for i in range(20))

    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    # run the same pipeline as the registered query, against a temp table
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in dq.dedup_dup_spans(spark, td).collect()}
    assert set(out) == {1, 2}
    # doc 1: run starts at token 2; doc 2: at token 4 (0-based)
    assert (out[1].start_tok, out[1].span_toks) == (2, 12)
    assert (out[2].start_tok, out[2].span_toks) == (4, 12)


def test_dup_span_removal_keeps_lowest_doc(spark):
    """Removal keeps the occurrence in the LOWEST doc_id: the planted run
    survives in doc 1 and is stripped from doc 2; a fully-duplicated doc
    (3 = copy of 1) reports full removal with the empty fingerprint."""
    from pyspark.sql import functions as F

    from flow_spark.functions.hashing import portable_hash64
    from flow_spark.queries import dedup as dq

    run = " ".join(f"tok{i}" for i in range(12))
    a = "alpha beta " + run + " gamma delta epsilon zeta eta theta"
    b = "one two three four " + run + " five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, a)], "doc_id long, text string"
    )
    import os, tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r.doc_id: r for r in dq.dedup_dup_span_removal(spark, td).collect()}
    # doc 1 is the keeper for every gram it contains -> no removals at all
    assert set(out) == {2, 3}
    assert out[2].n_removed == 12
    assert out[3].n_removed == out[3].n_toks  # full duplicate wiped
    empty_fp = spark.range(1).select(
        portable_hash64(F.lit(""), salt="clean").alias("h")
    ).collect()[0].h
    assert out[3].clean_fp == empty_fp
    # doc 2's cleaned text is its original minus the planted run
    b_clean = "one two three four five six seven eight nine ten"
    fp = spark.range(1).select(
        portable_hash64(F.lit(b_clean), salt="clean").alias("h")
    ).collect()[0].h
    assert out[2].clean_fp == fp


def test_prefix_filter_join_complete_vs_bruteforce(spark):
    """Prefix filtering (SSJoin/PPJoin) must be EXACT: identical result
    set to the all-pairs Jaccard join on a synthetic corpus engineered
    with planted near-dups, exact dups, disjoint docs, and sets whose
    sizes straddle the length filter (recall 1.0 is the operator's whole
    claim vs MinHash-LSH)."""
    import itertools

    from pyspark.sql import functions as F

    from flow_spark.operators.dedup import prefix_filter_pairs

    # items are single tokens (the operator is representation-agnostic)
    sets = {
        1: ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"],
        2: ["a", "b", "c", "d", "e", "f", "g", "h", "i", "k"],  # J=9/11
        3: ["a", "b", "c", "d", "e", "f", "g", "h", "i", "j"],  # J=1 w/ 1
        4: ["x", "y", "z"],                                      # disjoint
        5: ["a", "b", "c"],            # high overlap, fails length filter
        6: ["x", "y", "z", "w"],                                 # J=3/4 w/ 4
        7: ["m"],                                                # singleton
        8: ["m"],                                                # J=1 w/ 7
    }
    rows = [(i, tk) for i, ts in sets.items() for tk in ts]
    df = spark.createDataFrame(rows, ["doc_id", "shingle"])
    got = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in prefix_filter_pairs(df, t_num=7, t_den=10).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(set(sets[a]) & set(sets[b]))
        union = len(set(sets[a]) | set(sets[b]))
        if inter * 10 >= 7 * union:
            want.add((a, b, inter * 1_000_000 // union))
    assert got == want, (sorted(got), sorted(want))
    assert (1, 3, 1_000_000) in want and (7, 8, 1_000_000) in want


def test_prefix_filter_join_randomized_vs_bruteforce(spark):
    """Deterministic pseudo-random corpus (hash-derived, no RNG state):
    prefix-filter result == brute force at two thresholds."""
    import hashlib
    import itertools

    from flow_spark.operators.dedup import prefix_filter_pairs

    def toks(i):
        # overlapping vocab slices force shared rare+common tokens
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        base = h % 20
        n = 5 + h % 11
        return [f"t{(base + j * (1 + h % 3)) % 40}" for j in range(n)]

    sets = {i: sorted(set(toks(i))) for i in range(60)}
    rows = [(i, tk) for i, ts in sets.items() for tk in ts]
    df = spark.createDataFrame(rows, ["doc_id", "shingle"])
    for t_num, t_den in ((7, 10), (1, 2)):
        got = {
            (r.doc_a, r.doc_b)
            for r in prefix_filter_pairs(df, t_num=t_num, t_den=t_den).collect()
        }
        want = set()
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(set(sets[a]) & set(sets[b]))
            union = len(set(sets[a]) | set(sets[b]))
            if inter * t_den >= t_num * union:
                want.add((a, b))
        assert got == want, (t_num, t_den, got ^ want)
        assert want  # the corpus genuinely contains qualifying pairs


def test_prefix_filter_two_phase_rank_identical_pairs(spark):
    """VERDICT r6 #4: the two-phase range-partitioned vocab rank must
    produce EXACTLY the pairs (and jaccard values) of the one-task
    global sort, at several partition counts including ones that leave
    empty ranges.  Also pins that the rank itself is a permutation-
    identical order (same tid per item)."""
    import hashlib

    from flow_spark.operators.dedup import _rare_first_rank, prefix_filter_pairs
    from pyspark.sql import functions as F

    def toks(i):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        base = h % 25
        n = 4 + h % 9
        return [f"t{(base + j * (1 + h % 4)) % 50}" for j in range(n)]

    sets = {i: sorted(set(toks(i))) for i in range(80)}
    rows = [(i, tk) for i, ts in sets.items() for tk in ts]
    df = spark.createDataFrame(rows, ["doc_id", "shingle"])
    base = {
        (r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in prefix_filter_pairs(df, rank_partitions=1).collect()
    }
    assert base
    for nparts in (2, 8, 64):  # 64 > vocab/2: some ranges run empty
        got = {
            (r.doc_a, r.doc_b, r.jaccard_ppm)
            for r in prefix_filter_pairs(df, rank_partitions=nparts).collect()
        }
        assert got == base, (nparts, got ^ base)
    # rank-level identity, not just end-to-end: same (tk -> tid) map
    freq = (
        df.select(F.col("shingle").alias("tk"))
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    one = {r.tk: r.tid for r in _rare_first_rank(freq, 1).collect()}
    for nparts in (3, 16):
        multi = {r.tk: r.tid for r in _rare_first_rank(freq, nparts).collect()}
        assert multi == one, nparts
