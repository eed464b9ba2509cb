"""End-to-end training-data curation pipeline: the REAL operators from
operators/{text,dedup}.py composed the way a pre-training corpus build
composes them, with row accounting asserted at every stage.

    documents -> quality gate -> exact dedup -> MinHash/LSH near-dup
              -> contamination scrub -> chunk windows -> partitioned write

Each stage's invariant is checked (not just "it ran"): survivors carry no
duplicate normalized text, every near-dup keeper is its component's min
id, seeded contaminated docs are scrubbed, chunk tiling covers every
token, and the written output round-trips with identical accounting.
Stage counts are monotone non-increasing (gates only remove).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flow_spark.catalog import load_table
from flow_spark.operators.dedup import (
    connected_components,
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    normalize_text,
    word_shingles,
)
from flow_spark.operators.text import chunk_windows, quality_score, tokens


def test_e2e_training_pipeline(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    assert n_total > 0

    # --- stage 1: quality gate (pure column expressions) -----------------
    gated = docs.filter(
        (quality_score(F.col("text")) >= 0.3) & (F.col("n_chars") >= 40)
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_total

    # --- stage 2: exact dedup (keeper = min doc_id per normalized text) --
    keepers = exact_dedup_groups(gated)
    exact_kept = gated.join(
        keepers.select(F.col("keeper_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n_exact = exact_kept.count()
    assert n_exact == keepers.count() <= n_gated
    # invariant: no two survivors share normalized text
    assert (
        exact_kept.select(normalize_text(F.col("text")).alias("norm"))
        .groupBy("norm")
        .count()
        .filter("count > 1")
        .count()
        == 0
    )

    # --- stage 3: near-dup scrub (shingle -> minhash -> LSH -> CC) -------
    sh = word_shingles(exact_kept)
    sig = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sig)
    comps = connected_components(pairs)
    # keeper = component min; every non-keeper is dropped
    near_losers = comps.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    neardup_kept = exact_kept.join(near_losers, "doc_id", "left_anti")
    n_near = neardup_kept.count()
    assert n_near == n_exact - near_losers.count()
    # invariant: each component's min id survived
    assert (
        comps.groupBy("component")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("mn") != F.col("component"))
        .count()
        == 0
    )

    # --- stage 4: contamination scrub (seeded excerpts MUST be caught) ---
    seeds = [
        r["text"]
        for r in neardup_kept.orderBy("doc_id").limit(3).select("text").collect()
    ]
    excerpts = [" ".join(s.split()[:8]) for s in seeds if len(s.split()) >= 8]
    assert excerpts
    toks8 = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("toks") - 7, F.lit(1))),
        lambda i: F.array_join(F.slice("toks", i, 8), " "),
    )
    grams = neardup_kept.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select("doc_id", F.explode(toks8).alias("gram8"))
    bench = spark.createDataFrame([(e,) for e in excerpts], "gram8 string")
    dirty = grams.join(F.broadcast(bench), "gram8", "left_semi").select("doc_id").distinct()
    clean = neardup_kept.join(dirty, "doc_id", "left_anti")
    n_clean = clean.count()
    dirty_ids = {r.doc_id for r in dirty.collect()}
    seed_ids = {
        r.doc_id for r in neardup_kept.orderBy("doc_id").limit(3).collect()
    }
    assert seed_ids <= dirty_ids  # every seeded doc was caught
    assert n_clean == n_near - len(dirty_ids)

    # --- stage 5: chunk windows (size 32, stride 24) ---------------------
    chunked = chunk_windows(
        clean.select("doc_id", "source", tokens(F.col("text")).alias("toks"))
    )
    n_chunks = chunked.count()
    assert n_chunks >= n_clean  # every doc yields >= 1 chunk
    # tiling invariant: per doc, chunks cover exactly the token count
    cover = (
        chunked.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_idx") * 24 + F.size("chunk")).alias("covered"),
            F.first(F.size("toks")).alias("n_toks"),
        )
        .filter(F.col("covered") != F.col("n_toks"))
    )
    assert cover.count() == 0

    # --- stage 6: partitioned write + round-trip accounting --------------
    out = str(tmp_path / "corpus")
    (
        chunked.select("doc_id", "source", "chunk_idx", F.array_join("chunk", " ").alias("text"))
        .write.partitionBy("source")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == n_chunks
    assert back.select("doc_id").distinct().count() == n_clean
    # stage counts are monotone non-increasing through the gates
    assert n_total >= n_gated >= n_exact >= n_near >= n_clean > 0
