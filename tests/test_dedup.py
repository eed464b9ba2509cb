

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
