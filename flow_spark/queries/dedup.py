"""Deduplication queries over `documents`, each oracle-checked.

The corpus is augmented with known duplicates (every 10th doc re-inserted
under doc_id+1_000_000) so exact/near-dup operators have true positives to
find; both engines build the same augmented corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash_expr
from flow_spark.operators.dedup import (
    N_BANDS,
    N_HASHES,
    ROWS_PER_BAND,
    connected_components,
    exact_dedup_groups,
    normalize_text,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from flow_spark.operators.similarity import cosine_neardup_pairs
from flow_spark.queries.registry import register

# ---- shared corpus construction -------------------------------------------

_SQL_CORPUS = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""

_SQL_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"

_SQL_SHINGLES = f"""
    corpus AS ({_SQL_CORPUS}),
    normed AS (
        SELECT doc_id, string_split({_SQL_NORM}, ' ') AS w FROM corpus
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               UNNEST(list_transform(range(1, greatest(len(w) - 2, 0) + 1),
                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        FROM normed
    )
"""


def _augment(docs: DataFrame) -> DataFrame:
    # single-scan form of `docs UNION ALL shifted-every-10th`: explode a
    # 1-or-2-element offset array per row instead of unioning two scans of
    # the same file (halves the documents read in every dedup query; at
    # 100 TB the union form reads the corpus twice)
    offsets = F.when(
        F.col("doc_id") % 10 == 0, F.array(F.lit(0), F.lit(1000000))
    ).otherwise(F.array(F.lit(0)))
    return docs.select(
        F.explode(offsets).alias("_off"), "doc_id", "text"
    ).select((F.col("doc_id") + F.col("_off")).alias("doc_id"), "text")


# ---- exact dedup -----------------------------------------------------------


@register(
    "dedup_exact",
    category="dedup",
    doc="Exact dedup via hash-groupBy on normalized text: keeper = min id, "
    "dup count per group. One shuffle with map-side combine.",
    oracle=f"""
        WITH corpus AS ({_SQL_CORPUS})
        SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_dups
        FROM corpus
        GROUP BY {_SQL_NORM}
        ORDER BY keeper_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents"))
    return exact_dedup_groups(corpus).orderBy("keeper_id")


# ---- MinHash + LSH ---------------------------------------------------------


def _min_cols() -> str:
    from flow_spark.operators.dedup import MH_P, mh_coeffs

    base = f"({portable_hash_expr('shingle')} % {MH_P})"
    cols = []
    for i in range(N_HASHES):
        a, b = mh_coeffs(i)
        cols.append(f"MIN(({a} * {base} + {b}) % {MH_P}) AS mh{i}")
    return ",\n               ".join(cols)


def _band_exprs() -> str:
    bands = []
    for b in range(N_BANDS):
        cols = ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        bands.append(f"concat_ws(':', '{b}', {cols})")
    return ", ".join(bands)


@register(
    "dedup_minhash_lsh",
    category="dedup",
    doc="MinHash(16)+LSH(4x4) near-dup candidate pairs: shingle -> salted "
    "min-hashes -> band buckets -> bucket self-join. The full pipeline is "
    "replicated in the oracle via the portable md5 hash.",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        sig AS (
            SELECT doc_id,
               {_min_cols()}
            FROM sh GROUP BY doc_id
        ),
        buckets AS (
            SELECT doc_id, UNNEST([{_band_exprs()}]) AS bucket FROM sig
        ),
        kept AS (
            SELECT doc_id, bucket FROM buckets
            QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 1000
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents"))
    # distinct=False: MIN() is duplicate-insensitive, so skip the set shuffle
    sigs = minhash_signatures(word_shingles(corpus, distinct=False))
    return lsh_candidate_pairs(sigs).orderBy("doc_a", "doc_b")


@register(
    "dedup_minhash_lsh_salted",
    category="dedup",
    doc="MinHash LSH with the hot-bucket SALTING policy (VERDICT r2 #8) "
    "made oracle-checkable: max_bucket=4 forces real hot buckets at "
    "this corpus, which split into contiguous sub-buckets of 4 (all "
    "pairs within each) plus rep links from each later sub-bucket's "
    "first doc to the bucket's first doc — viral clusters keep "
    "within-chunk recall AND stay one connected component at "
    "O(n*cap) pairs instead of being dropped (the production default "
    "keeps cap=1000; cap=4 here is the test harness).  The oracle "
    "replays chunking via 0-based bucket positions: chunk = pos // 4.",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        sig AS (
            SELECT doc_id,
               {_min_cols()}
            FROM sh GROUP BY doc_id
        ),
        buckets AS (
            SELECT doc_id, UNNEST([{_band_exprs()}]) AS bucket FROM sig
        ),
        pos AS (
            SELECT doc_id, bucket,
                   CAST(ROW_NUMBER() OVER (PARTITION BY bucket
                                           ORDER BY doc_id) - 1 AS BIGINT) AS p
            FROM buckets
            QUALIFY COUNT(*) OVER (PARTITION BY bucket) >= 2
        ),
        within AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pos a JOIN pos b
              ON a.bucket = b.bucket AND a.p // 4 = b.p // 4
             AND a.doc_id < b.doc_id
        ),
        rep AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pos a JOIN pos b
              ON a.bucket = b.bucket AND a.p = 0 AND b.p % 4 = 0 AND b.p > 0
        )
        SELECT DISTINCT doc_a, doc_b
        FROM (SELECT * FROM within UNION ALL SELECT * FROM rep)
        ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents"))
    sigs = minhash_signatures(word_shingles(corpus, distinct=False))
    return lsh_candidate_pairs(
        sigs, max_bucket=4, hot_bucket="salt"
    ).orderBy("doc_a", "doc_b")


@register(
    "dedup_lsh_verified",
    category="dedup",
    doc="The CANONICAL two-stage near-dup pipeline composed end-to-end: "
    "MinHash-LSH candidate generation (bucketed, never all-pairs) -> "
    "exact word-3-gram Jaccard verification >= 0.5 restricted to the "
    "candidate list (operators/dedup.py::verify_pairs_jaccard — "
    "O(|candidates| x shingles/doc), two hash joins, linear in the "
    "candidate list).  This is the production form of the standalone "
    "ngram entries, whose shared-shingle pair GENERATION is documented "
    "as quadratic-within-cap; here generation is LSH's job and "
    "verification never expands beyond the candidates.",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        sig AS (
            SELECT doc_id,
               {_min_cols()}
            FROM sh GROUP BY doc_id
        ),
        buckets AS (
            SELECT doc_id, UNNEST([{_band_exprs()}]) AS bucket FROM sig
        ),
        kept AS (
            SELECT doc_id, bucket FROM buckets
            QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 1000
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
            SELECT p.doc_a, p.doc_b, COUNT(*) AS n_common
            FROM pairs p
            JOIN sh a ON a.doc_id = p.doc_a
            JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
            GROUP BY p.doc_a, p.doc_b
        )
        SELECT doc_a, doc_b,
               ROUND(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_common / (sa.sz + sb.sz - n_common) >= 0.5
        ORDER BY doc_a, doc_b
    """,
)
def dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.dedup import verify_pairs_jaccard

    corpus = _augment(load_table(spark, sf_dir, "documents"))
    cands = lsh_candidate_pairs(
        minhash_signatures(word_shingles(corpus, distinct=False))
    )
    return verify_pairs_jaccard(cands, word_shingles(corpus), threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


# ---- connected components over the near-dup graph --------------------------


@register(
    "dedup_components",
    category="dedup",
    doc="Near-dup clusters: connected components of the MinHash-LSH pair "
    "graph via iterative min-label propagation (Pregel pattern; "
    "localCheckpoint truncates lineage per round). Output: canonical "
    "keeper (min doc_id) per cluster + cluster size. Oracle: recursive "
    "CTE transitive closure over the same pairs.",
    oracle=f"""
        WITH RECURSIVE {_SQL_SHINGLES},
        sig AS (
            SELECT doc_id,
               {_min_cols()}
            FROM sh GROUP BY doc_id
        ),
        buckets AS (
            SELECT doc_id, UNNEST([{_band_exprs()}]) AS bucket FROM sig
        ),
        kept AS (
            SELECT doc_id, bucket FROM buckets
            QUALIFY COUNT(*) OVER (PARTITION BY bucket) <= 1000
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
            UNION SELECT doc_a, doc_a FROM pairs
            UNION SELECT doc_b, doc_b FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        comp AS (SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a)
        SELECT component, COUNT(*) AS n_docs
        FROM comp GROUP BY component
        ORDER BY component
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents"))
    pairs = lsh_candidate_pairs(minhash_signatures(word_shingles(corpus, distinct=False)))
    comps = connected_components(pairs)
    return (
        comps.groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("component")
    )


# ---- SimHash ---------------------------------------------------------------

_SIMHASH_BITS = 32


def _bit_sum_cols() -> str:
    h = portable_hash_expr("tok", salt="simhash")
    return ",\n               ".join(
        f"SUM(({h} >> {b}) & 1) AS b{b}" for b in range(_SIMHASH_BITS)
    )


def _sig_expr() -> str:
    terms = " + ".join(
        f"(CASE WHEN 2 * b{b} > n_tok THEN CAST({2**b} AS BIGINT) ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"({terms})"


@register(
    "dedup_simhash",
    category="dedup",
    doc="32-bit SimHash signatures (token-hash bit majority); duplicate "
    "texts collide exactly — output is signature per doc + collision count.",
    oracle=f"""
        WITH corpus AS ({_SQL_CORPUS}),
        toks AS (
            SELECT doc_id, UNNEST(string_split({_SQL_NORM}, ' ')) AS tok
            FROM corpus WHERE doc_id % 5 = 0
        ),
        bits AS (
            SELECT doc_id, COUNT(*) AS n_tok,
               {_bit_sum_cols()}
            FROM toks WHERE length(tok) > 0 GROUP BY doc_id
        ),
        sigs AS (SELECT doc_id, {_sig_expr()} AS simhash FROM bits)
        SELECT doc_id, simhash,
               COUNT(*) OVER (PARTITION BY simhash) AS n_same_sig
        FROM sigs
        ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    corpus = _augment(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 5 == 0
    )
    sigs = simhash(corpus, bits=_SIMHASH_BITS)
    return (
        sigs.withColumn("n_same_sig", F.count("*").over(W.partitionBy("simhash")))
        .select("doc_id", "simhash", "n_same_sig")
        .orderBy("doc_id")
    )


# ---- n-gram Jaccard --------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    category="dedup",
    doc="Exact word-3-gram Jaccard >= 0.5 pairs via shared-shingle join "
    "(at 100 TB this runs on LSH candidates, not standalone — see "
    "dedup_lsh_verified for the composed form, or "
    "dedup_prefix_filter_join for the exact-recall prefix-filtered "
    "alternative whose candidate generation is never all-pairs).",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        kept AS (
            SELECT doc_id, shingle FROM sh
            QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(n_common / (sa.sz + sb.sz - n_common), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_common / (sa.sz + sb.sz - n_common), 4) >= 0.5
        ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(word_shingles(corpus), threshold=0.5).orderBy(
        "doc_a", "doc_b"
    )


# ---- embedding cosine near-dup ---------------------------------------------


@register(
    "dedup_embedding_cosine",
    category="dedup",
    doc="Embedding near-dup: cosine >= 0.4 pairs within the same label "
    "bucket (bucket = IVF/LSH stand-in: pairwise cost stays per-bucket).",
    oracle="""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        -- cosine via the exact Spark expression (left-fold dot /
        -- (sqrt(sumsq) * sqrt(sumsq))), NOT list_cosine_similarity whose
        -- different FP order could flip threshold-boundary pairs
        p AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   list_sum(list_transform(range(1, 65), j -> a.e[j] * b.e[j]))
                     / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(b.e, x -> x * x))))
                     AS cos_raw
            FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b, ROUND(cos_raw, 4) AS cos
        FROM p WHERE cos_raw >= 0.4
        ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")


@register(
    "dedup_editdist_blocked",
    category="dedup",
    doc="Edit-distance near-dup detection with blocking: candidate pairs "
    "are restricted to documents sharing a (length-bucket, 10-char "
    "prefix) block BEFORE any pairwise work, then scored with "
    "levenshtein on an 80-char prefix. At sf0.01 blocking cuts 125k "
    "all-pairs to 38 candidates — the O(n^2)->O(sum b_i^2) reduction "
    "that makes pairwise metrics feasible at 100 TB (blocks shuffle on "
    "the block key and compare locally; a hot block is a skew key to "
    "salt or re-block). levenshtein is exact integer in both engines.",
    oracle="""
        WITH d AS (
            SELECT doc_id, n_chars // 50 AS lb, substr(text, 1, 10) AS blk,
                   substr(text, 1, 80) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               levenshtein(a.prefix, b.prefix) AS dist
        FROM d a JOIN d b
          ON a.lb = b.lb AND a.blk = b.blk AND a.doc_id < b.doc_id
        WHERE levenshtein(a.prefix, b.prefix) <= 20
        ORDER BY doc_a, doc_b
    """,
)
def dedup_editdist_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("n_chars") / 50).cast("bigint").alias("lb"),
        F.substring("text", 1, 10).alias("blk"),
        F.substring("text", 1, 80).alias("prefix"),
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lb").alias("lb_a"),
        F.col("blk").alias("blk_a"),
        F.col("prefix").alias("prefix_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lb").alias("lb_b"),
        F.col("blk").alias("blk_b"),
        F.col("prefix").alias("prefix_b"),
    )
    return (
        a.join(
            b,
            (F.col("lb_a") == F.col("lb_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .withColumn("dist", F.levenshtein("prefix_a", "prefix_b"))
        .filter(F.col("dist") <= 20)
        .select("doc_a", "doc_b", "dist")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_incremental",
    category="dedup",
    doc="Incremental-ingest dedup: a new batch (every 3rd doc + replayed "
    "copies of corpus docs) is deduplicated against the EXISTING corpus "
    "by 60-bit content fingerprint anti-join — the nightly-ingest step of "
    "a training pipeline.  Scale shape: both sides reduce to (doc_id, "
    "fingerprint) before the join, so the shuffle carries 16 bytes/doc "
    "instead of document text; at 100 TB the corpus side is a bucketed "
    "fingerprint index and the anti-join prunes to bucket-local work.",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, {portable_hash_expr(_SQL_NORM, salt='fp')} AS fp
            FROM documents WHERE doc_id % 3 != 0
        ),
        replayed AS (
            SELECT doc_id + 2000000 AS doc_id,
                   {portable_hash_expr(_SQL_NORM, salt='fp')} AS fp
            FROM documents WHERE doc_id % 3 != 0 AND doc_id % 10 = 1
        ),
        batch AS (
            SELECT doc_id, {portable_hash_expr(_SQL_NORM, salt='fp')} AS fp
            FROM documents WHERE doc_id % 3 = 0
            UNION ALL SELECT doc_id, fp FROM replayed
        )
        SELECT b.doc_id, b.fp
        FROM batch b ANTI JOIN corpus c ON b.fp = c.fp
        ORDER BY b.doc_id
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    fp = portable_hash64(normalize_text(F.col("text")), salt="fp")
    corpus = docs.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", fp.alias("fp")
    )
    replayed = (
        docs.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 10 == 1))
        .select((F.col("doc_id") + 2000000).alias("doc_id"), fp.alias("fp"))
    )
    batch = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select("doc_id", fp.alias("fp"))
        .unionByName(replayed)
    )
    return (
        batch.join(corpus.select("fp"), on="fp", how="left_anti")
        .select("doc_id", "fp")
        .orderBy("doc_id")
    )


@register(
    "dedup_ngram_containment",
    category="dedup",
    doc="Asymmetric containment pairs (|A∩B| / min size >= 0.7): the "
    "partial-copy/quote detector Jaccard misses — a short doc embedded "
    "in a long one unions to near-zero Jaccard but containment ~1.  "
    "Same shared-shingle candidate join and hot-gram cap as "
    "dedup_ngram_jaccard; at 100 TB it runs on LSH candidates.",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        kept AS (
            SELECT doc_id, shingle FROM sh
            QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 1000
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
            FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(n_common / LEAST(sa.sz, sb.sz), 4) AS containment
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_common / LEAST(sa.sz, sb.sz), 4) >= 0.7
        ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.dedup import ngram_containment_pairs

    corpus = _augment(load_table(spark, sf_dir, "documents"))
    return ngram_containment_pairs(word_shingles(corpus), threshold=0.7).orderBy(
        "doc_a", "doc_b"
    )


@register(
    "dedup_simhash_hamming",
    category="dedup",
    doc="SimHash near-dup candidates via PIGEONHOLE bucketing: the 32-bit "
    "signature splits into 4 bytes, and any pair within Hamming "
    "distance 3 must agree on at least one byte (4 chunks, <=3 "
    "differing bits -> one chunk untouched) — so candidates come from "
    "4 cheap equi-join buckets, NEVER an all-pairs scan, then the "
    "exact distance bit_count(xor) <= 3 refines.  The multi-index "
    "hashing pattern that makes Hamming search linear at 100 TB; "
    "bucket join + HOF pair expansion mirror the MinHash LSH stage.",
    oracle=f"""
        WITH corpus AS ({{corpus}}),
        toks AS (
            SELECT doc_id, UNNEST(string_split({{norm}}, ' ')) AS tok
            FROM corpus WHERE doc_id % 5 = 0
        ),
        bits AS (
            SELECT doc_id, COUNT(*) AS n_tok,
               {{bitsums}}
            FROM toks WHERE length(tok) > 0 GROUP BY doc_id
        ),
        sigs AS (SELECT doc_id, {{sig}} AS simhash FROM bits),
        bands AS (
            SELECT doc_id, simhash, k,
                   (simhash >> (8 * k)) & 255 AS chunk
            FROM sigs, range(0, 4) t(k)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ANY_VALUE(a.simhash) AS sa, ANY_VALUE(b.simhash) AS sb
            FROM bands a
            JOIN bands b ON a.k = b.k AND a.chunk = b.chunk
                        AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
        FROM pairs
        WHERE bit_count(xor(sa, sb)) <= 3
        ORDER BY doc_a, doc_b
    """.format(
        corpus=_SQL_CORPUS,
        norm=_SQL_NORM,
        bitsums=_bit_sum_cols(),
        sig=_sig_expr(),
    ),
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _augment(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") % 5 == 0
    )
    sigs = simhash(corpus, bits=_SIMHASH_BITS)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("k"),
                    F.shiftright("simhash", 8 * k).bitwiseAND(F.lit(255)).alias("chunk"),
                )
                for k in range(4)
            ])
        ).alias("b"),
    ).select("doc_id", "simhash", "b.k", "b.chunk")
    buckets = (
        chunks.groupBy("k", "chunk")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id").alias("id"), F.col("simhash").alias("sig")))
            ).alias("members")
        )
        .filter(F.size("members") >= 2)
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "members",
                    lambda x, i: F.transform(
                        F.slice(F.col("members"), i + 2, F.size("members")),
                        lambda y: F.struct(
                            x.getField("id").alias("doc_a"),
                            y.getField("id").alias("doc_b"),
                            x.getField("sig").alias("sa"),
                            y.getField("sig").alias("sb"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.sa", "p.sb").distinct()
    hamming = F.bit_count(F.expr("sa ^ sb")).cast("int")
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "dedup_url_canonical",
    category="dedup",
    doc="URL canonicalization dedup — the first stage of every web-crawl "
    "training pipeline: raw URLs differ in scheme/host case, an "
    "explicit default port, tracking (utm_*) params, param order, "
    "fragments and trailing slashes, yet name the same resource.  "
    "Canonical form = lower(scheme+host), strip :443, drop fragment, "
    "drop utm_* params, sort the remaining query params, strip the "
    "trailing slash; then one hash-groupBy counts raw variants per "
    "canonical URL.  Pure column expressions (regexp + array HOFs) in "
    "whole-stage codegen followed by a single shuffle on the canonical "
    "key — scan-speed at 100 TB.  URLs are synthesized deterministically "
    "from order keys (the fixtures carry no real URLs).",
    oracle="""
        WITH raw AS (
            SELECT o_orderkey AS k,
                   (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
                   || '://'
                   || (CASE WHEN o_orderkey % 3 = 0
                            THEN 'Shop.Example.COM' ELSE 'shop.example.com' END)
                   || (CASE WHEN o_orderkey % 4 = 0 THEN ':443' ELSE '' END)
                   || '/cat/' || CAST((o_orderkey % 97) % 7 AS VARCHAR)
                   || '/item'
                   || (CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END)
                   || (CASE WHEN o_orderkey % 2 = 0
                            THEN '?b=' || CAST((o_orderkey % 97) % 10 AS VARCHAR)
                                 || '&a=' || CAST(o_orderkey % 97 AS VARCHAR)
                                 || '&utm_source=mail'
                            ELSE '?a=' || CAST(o_orderkey % 97 AS VARCHAR)
                                 || '&b=' || CAST((o_orderkey % 97) % 10 AS VARCHAR)
                       END)
                   || (CASE WHEN o_orderkey % 3 = 1 THEN '#ref' ELSE '' END)
                   AS url
            FROM orders
        ),
        parts AS (
            SELECT k, url,
                   lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
                   replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/]+)', 1)),
                           ':443', '') AS host,
                   regexp_replace(
                       regexp_extract(url, '^[A-Za-z]+://[^/]+([^?#]*)', 1),
                       '/$', '') AS path,
                   regexp_extract(url, '\\?([^#]*)', 1) AS query
            FROM raw
        ),
        canon AS (
            SELECT k, url,
                   scheme || '://' || host || path ||
                   CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
            FROM (
                SELECT k, url, scheme, host, path,
                       array_to_string(
                           list_sort(
                               list_filter(string_split(query, '&'),
                                           x -> NOT starts_with(x, 'utm_'))),
                           '&') AS q
                FROM parts
            )
        )
        SELECT canonical_url,
               COUNT(*) AS n_raw,
               COUNT(DISTINCT url) AS n_distinct_raw
        FROM canon
        GROUP BY canonical_url
        ORDER BY canonical_url
    """,
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = (k % 97).cast("string")
    b10 = ((k % 97) % 10).cast("string")
    url = F.concat(
        F.when(k % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(k % 3 == 0, F.lit("Shop.Example.COM")).otherwise(
            F.lit("shop.example.com")
        ),
        F.when(k % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/cat/"),
        ((k % 97) % 7).cast("string"),
        F.lit("/item"),
        F.when(k % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(
            k % 2 == 0,
            F.concat(F.lit("?b="), b10, F.lit("&a="), base, F.lit("&utm_source=mail")),
        ).otherwise(F.concat(F.lit("?a="), base, F.lit("&b="), b10)),
        F.when(k % 3 == 1, F.lit("#ref")).otherwise(F.lit("")),
    )
    raw = o.select(F.col("o_orderkey").alias("k"), url.alias("url"))
    parts = raw.select(
        "k",
        "url",
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1)).alias("scheme"),
        F.replace(
            F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/]+)", 1)),
            F.lit(":443"),
            F.lit(""),
        ).alias("host"),
        F.regexp_replace(
            F.regexp_extract("url", r"^[A-Za-z]+://[^/]+([^?#]*)", 1), r"/$", ""
        ).alias("path"),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("query"),
    )
    q = F.array_join(
        F.array_sort(
            F.filter(
                F.split("query", "&"),
                lambda x: ~x.startswith("utm_"),
            )
        ),
        "&",
    )
    canon = parts.select(
        "k",
        "url",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.col("path"),
            F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_raw"),
            F.countDistinct("url").alias("n_distinct_raw"),
        )
        .orderBy("canonical_url")
    )


# ---- duplicated-substring span detection ----------------------------------

_SPAN_K = 8  # tokens per gram; spans are exact to within K-1 tokens


@register(
    "dedup_dup_spans",
    category="dedup",
    doc=f"Duplicated-substring span detection — the sub-document dedup of "
    "Lee et al. 2022 ('Deduplicating Training Data Makes Language Models "
    "Better') re-expressed Spark-first: instead of a suffix array, every "
    f"doc explodes into stride-1 {_SPAN_K}-token gram hashes with "
    "positions; grams seen in >1 document mark duplicated positions; a "
    "per-doc gaps-and-islands window merges overlapping grams (start "
    f"distance <= {_SPAN_K}) into maximal removable spans "
    "[start_tok, end_tok].  Two hash shuffles (gram groupBy + left-semi "
    "join back) and one per-doc window — no suffix array, no all-pairs; "
    "span boundaries are exact to within K-1 tokens of the true maximal "
    "duplicated substring.  At 100 TB the gram table is the cost (one "
    "row per token); both shuffles key on the 60-bit gram hash, so skew "
    "is bounded by true gram popularity and the dup-gram set shrinks "
    "to near-duplicate clusters only.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, len(toks) AS n_toks, i AS pos,
                   {portable_hash_expr(
                       f"array_to_string(list_slice(toks, i + 1,"
                       f" i + {_SPAN_K}), ' ')", salt='dsp')} AS gram_hash
            FROM d CROSS JOIN range(0, 128) t(i)
            WHERE i + {_SPAN_K} <= len(toks)
        ),
        dup AS (
            SELECT gram_hash FROM g
            GROUP BY gram_hash HAVING COUNT(DISTINCT doc_id) > 1
        ),
        p AS (
            SELECT doc_id, n_toks, pos FROM g
            WHERE gram_hash IN (SELECT gram_hash FROM dup)
        ),
        b AS (
            SELECT doc_id, n_toks, pos,
                   CASE WHEN pos - lag(pos) OVER (
                            PARTITION BY doc_id ORDER BY pos
                        ) > {_SPAN_K} THEN 1 ELSE 0 END AS brk
            FROM p
        ),
        s AS (
            SELECT doc_id, n_toks, pos,
                   SUM(brk) OVER (
                       PARTITION BY doc_id ORDER BY pos
                   ) AS span_id
            FROM b
        )
        SELECT doc_id,
               CAST(span_id AS BIGINT) AS span_id,
               CAST(MIN(pos) AS BIGINT) AS start_tok,
               CAST(MAX(pos) + {_SPAN_K} - 1 AS BIGINT) AS end_tok,
               CAST(MAX(pos) + {_SPAN_K} - MIN(pos) AS BIGINT) AS span_toks,
               CAST(MIN(n_toks) AS BIGINT) AS n_toks
        FROM s
        GROUP BY doc_id, span_id
        ORDER BY doc_id, span_id
    """,
)
def dedup_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.functions.hashing import portable_hash64

    K = _SPAN_K
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("toks"),
    )
    g = (
        d.filter(F.size("toks") >= K)
        .select(
            "doc_id",
            F.size("toks").alias("n_toks"),
            F.explode(F.sequence(F.lit(0), F.size("toks") - K)).alias("pos"),
            "toks",
        )
        .select(
            "doc_id",
            "n_toks",
            "pos",
            portable_hash64(
                F.array_join(F.slice("toks", F.col("pos") + 1, K), " "),
                salt="dsp",
            ).alias("gram_hash"),
        )
    )
    dup = (
        g.groupBy("gram_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram_hash")
    )
    p = g.join(dup, "gram_hash", "left_semi")
    w = W.partitionBy("doc_id").orderBy("pos")
    b = p.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(w) > K, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    s = b.withColumn(
        "span_id", F.sum("brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        s.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").alias("_s"),
            F.max("pos").alias("_e"),
            F.min("n_toks").alias("n_toks"),
        )
        .select(
            "doc_id",
            F.col("span_id").cast("bigint").alias("span_id"),
            F.col("_s").cast("bigint").alias("start_tok"),
            (F.col("_e") + K - 1).cast("bigint").alias("end_tok"),
            (F.col("_e") + K - F.col("_s")).cast("bigint").alias("span_toks"),
            F.col("n_toks").cast("bigint"),
        )
        .orderBy("doc_id", "span_id")
    )


@register(
    "dedup_dup_span_removal",
    category="dedup",
    doc="The removal half of substring dedup (companion to "
    "dedup_dup_spans): Lee et al. keep ONE occurrence of each duplicated "
    "substring — here the occurrence in the lowest doc_id survives, and "
    "every later document drops the covered tokens.  A position is "
    "removable iff its gram also occurs in a LOWER doc_id (gram groupBy "
    "keeps min(doc_id) instead of a distinct-count), spans merge exactly "
    "as in detection, and the cleaned text is reconstructed by dropping "
    "covered token positions — the output carries the cleaned-text "
    "fingerprint so the oracle proves byte-identical reconstruction, "
    "not just matching counts.  Same two-shuffle plan as detection plus "
    "one per-doc re-aggregation; the keep-lowest rule is what makes the "
    "pass deterministic under any partitioning (no 'first seen' races).",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, string_split({_SQL_NORM}, ' ') AS toks
            FROM documents
        ),
        tok AS (
            SELECT doc_id, i AS pos, toks[i + 1] AS tok, len(toks) AS n_toks
            FROM d CROSS JOIN range(0, 128) t(i)
            WHERE i < len(toks)
        ),
        g AS (
            SELECT doc_id, i AS pos,
                   {portable_hash_expr(
                       f"array_to_string(list_slice(toks, i + 1,"
                       f" i + {_SPAN_K}), ' ')", salt='dsp')} AS gram_hash
            FROM d CROSS JOIN range(0, 128) t(i)
            WHERE i + {_SPAN_K} <= len(toks)
        ),
        keeper AS (
            SELECT gram_hash, MIN(doc_id) AS keep_doc FROM g GROUP BY gram_hash
        ),
        p AS (
            SELECT g.doc_id, g.pos FROM g
            JOIN keeper k USING (gram_hash)
            WHERE g.doc_id > k.keep_doc
        ),
        cover AS (
            SELECT DISTINCT p.doc_id, p.pos + j.j AS pos
            FROM p CROSS JOIN range(0, {_SPAN_K}) j(j)
        ),
        kept AS (
            SELECT t.doc_id, t.pos, t.tok
            FROM tok t
            LEFT JOIN cover c ON c.doc_id = t.doc_id AND c.pos = t.pos
            WHERE c.pos IS NULL
        ),
        -- a fully-duplicated doc has NO kept rows, but must still report
        -- (n_removed = n_toks, clean_fp = hash of the empty string)
        removed AS (SELECT doc_id, COUNT(*) AS nrem FROM cover GROUP BY doc_id),
        keptagg AS (
            SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean
            FROM kept GROUP BY doc_id
        )
        SELECT r.doc_id,
               CAST(len(d.toks) AS BIGINT) AS n_toks,
               CAST(r.nrem AS BIGINT) AS n_removed,
               {portable_hash_expr("COALESCE(k.clean, '')", salt='clean')}
                   AS clean_fp
        FROM removed r
        JOIN d ON d.doc_id = r.doc_id
        LEFT JOIN keptagg k ON k.doc_id = r.doc_id
        ORDER BY r.doc_id
    """,
)
def dedup_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    K = _SPAN_K
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.split(normalize_text(F.col("text")), " ").alias("toks"),
    )
    g = (
        d.filter(F.size("toks") >= K)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.size("toks") - K)).alias("pos"),
            "toks",
        )
        .select(
            "doc_id",
            "pos",
            portable_hash64(
                F.array_join(F.slice("toks", F.col("pos") + 1, K), " "),
                salt="dsp",
            ).alias("gram_hash"),
        )
    )
    keeper = g.groupBy("gram_hash").agg(F.min("doc_id").alias("keep_doc"))
    # positions whose gram survives in a lower doc -> covered token set
    p = g.join(keeper, "gram_hash").filter(F.col("doc_id") > F.col("keep_doc"))
    cover = (
        p.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(K - 1))
            ).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("covered"))
    )
    cleaned = d.join(cover, "doc_id").select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.filter(
            F.col("toks"),
            lambda t, i: ~F.array_contains(F.col("covered"), i),
        ).alias("kept"),
    )
    return (
        cleaned.select(
            "doc_id",
            "n_toks",
            (F.col("n_toks") - F.size("kept")).cast("bigint").alias("n_removed"),
            portable_hash64(F.array_join("kept", " "), salt="clean").alias(
                "clean_fp"
            ),
        )
        .filter(F.col("n_removed") > 0)
        .orderBy("doc_id")
    )


#: Fellegi-Sunter-style integer agreement weights for record linkage
_RL_W_NAME_CI = 40  # case-insensitive name agreement
_RL_W_BAL = 30  # account balance within 1.00
_RL_W_SEG = 20  # same market segment
_RL_W_NAME_CS = 10  # exact-case name agreement
_RL_THRESHOLD = 60


@register(
    "dedup_record_linkage",
    category="dedup",
    doc="Entity resolution (record linkage) in the Fellegi-Sunter shape, "
    "the identity-dedup pass profile stitching needs: a deterministic "
    "'dirty re-registration feed' B derives from half the customers "
    "(ids offset, every 3rd name lowercased, every 3rd balance shifted "
    "by +0.37), candidates come from BLOCKING on quasi-identifiers that "
    "survive the noise (nationkey + the name's last two digits) — never "
    "an all-pairs compare — and each candidate scores integer agreement "
    f"weights (name ci +{_RL_W_NAME_CI}, balance-within-1.00 "
    f"+{_RL_W_BAL}, segment +{_RL_W_SEG}, exact-case name "
    f"+{_RL_W_NAME_CS}); score >= {_RL_THRESHOLD} links.  Balance "
    "agreement compares exact integer cents, so the threshold never "
    "flaps on FP noise.  At 100 TB the block key bounds the join "
    "fan-out (#nations x 100 buckets) and both sides shuffle once on "
    "it — the standard ER topology.",
    oracle=f"""
        WITH a AS (
            SELECT c_custkey AS a_id, c_name, c_nationkey, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                   right(c_name, 2) AS blk
            FROM customer
        ),
        b AS (
            SELECT c_custkey + 10000000 AS b_id,
                   CASE WHEN c_custkey % 3 = 0 THEN lower(c_name)
                        ELSE c_name END AS c_name,
                   c_nationkey, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT)
                       + CASE WHEN c_custkey % 3 = 1 THEN 37 ELSE 0 END
                       AS bal_cents,
                   right(c_name, 2) AS blk
            FROM customer WHERE c_custkey % 2 = 0
        ),
        scored AS (
            SELECT a.a_id, b.b_id,
                   CASE WHEN lower(a.c_name) = lower(b.c_name)
                        THEN {_RL_W_NAME_CI} ELSE 0 END
                 + CASE WHEN abs(a.bal_cents - b.bal_cents) <= 100
                        THEN {_RL_W_BAL} ELSE 0 END
                 + CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN {_RL_W_SEG} ELSE 0 END
                 + CASE WHEN a.c_name = b.c_name
                        THEN {_RL_W_NAME_CS} ELSE 0 END AS score
            FROM a JOIN b
              ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
        )
        SELECT a_id, b_id, CAST(score AS BIGINT) AS score
        FROM scored WHERE score >= {_RL_THRESHOLD}
        ORDER BY a_id, b_id
    """,
)
def dedup_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.queries.util import cents

    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("a_nat"),
        F.col("c_mktsegment").alias("a_seg"),
        cents("c_acctbal").alias("a_bal"),
        F.substring("c_name", -2, 2).alias("a_blk"),
    )
    b = cust.filter(F.col("c_custkey") % 2 == 0).select(
        (F.col("c_custkey") + 10000000).alias("b_id"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lower("c_name")
        ).otherwise(F.col("c_name")).alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
        F.col("c_mktsegment").alias("b_seg"),
        (
            cents("c_acctbal")
            + F.when(F.col("c_custkey") % 3 == 1, F.lit(37)).otherwise(F.lit(0))
        ).alias("b_bal"),
        F.substring("c_name", -2, 2).alias("b_blk"),
    )
    score = (
        F.when(F.lower("a_name") == F.lower("b_name"), F.lit(_RL_W_NAME_CI)).otherwise(F.lit(0))
        + F.when(F.abs(F.col("a_bal") - F.col("b_bal")) <= 100, F.lit(_RL_W_BAL)).otherwise(F.lit(0))
        + F.when(F.col("a_seg") == F.col("b_seg"), F.lit(_RL_W_SEG)).otherwise(F.lit(0))
        + F.when(F.col("a_name") == F.col("b_name"), F.lit(_RL_W_NAME_CS)).otherwise(F.lit(0))
    )
    return (
        a.join(b, (F.col("a_nat") == F.col("b_nat")) & (F.col("a_blk") == F.col("b_blk")))
        .select("a_id", "b_id", score.cast("bigint").alias("score"))
        .filter(F.col("score") >= _RL_THRESHOLD)
        .orderBy("a_id", "b_id")
    )


# ---- semantic dedup (SemDeDup) ---------------------------------------------

_SEM_CENT_STEP = 64  # centroid count grows with the corpus: k = N / 64
_SEM_PREFIX = 16  # dims used for the (cheap) cluster assignment
_SEM_TAU2_NUM = 9025  # tau = 0.95 -> tau^2 = 9025 / 10000
_SEM_TAU2_DEN = 10000

#: centroid anchor: hash the id (layout-independent density), exclude the
#: planted copies (>= 1e8) so centroids come from the original corpus
_SEM_CENT_PRED_SQL = (
    f"{portable_hash_expr('CAST(vec_id AS VARCHAR)', salt='semc')}"
    f" % {_SEM_CENT_STEP} = 3 AND vec_id < 100000000"
)


def _sem_cent_pred():
    from flow_spark.functions.hashing import portable_hash64

    return (
        portable_hash64(F.col("vec_id").cast("string"), salt="semc")
        % _SEM_CENT_STEP
        == 3
    ) & (F.col("vec_id") < 100000000)


@register(
    "dedup_semantic",
    category="dedup",
    doc="SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the "
    "embedding space, then deduplicate ONLY within clusters — the "
    "pairwise cosine work drops from O(N^2) to O(sum cluster^2), and "
    "because the centroid count grows with the corpus (k = N/"
    f"{_SEM_CENT_STEP} hash-anchored rows — anchoring hashes the id so "
    "centroid density is independent of the id LAYOUT; a modulo anchor "
    "went 10x sparse on the sf1 fixtures' disjoint per-replica ranges) "
    "the per-cluster size — and so total pair work — stays LINEAR in N. "
    f"Assignment scores only the first {_SEM_PREFIX} of 64 dims (the "
    "Matryoshka-prefix trick) so the N x k assign matrix is 4x cheaper; "
    "at 100 TB assignment would ride an IVF index instead of a flat "
    "crossJoin, and the within-cluster stage is untouched.  Every "
    "comparison is integer-exact: vectors quantize to int8 against one "
    "corpus-wide scale (1-row broadcast), cosine >= 0.95 is decided by "
    "BIGINT cross-multiplication (ip^2 * 10000 >= 9025 * |a|^2 * |b|^2), "
    "never a float threshold.  The corpus plants a perturbed copy of "
    "every 10th vector (deterministic +/-3% per-element ramp) under "
    "vec_id+1e8; the query emits the removal list (higher id of each "
    "dup pair, SemDeDup's keep-one policy).  Recall is approximate by "
    "design — a pair whose members straddle a cluster boundary is "
    "missed (49/50 planted dups found at sf0.01).",
    oracle=f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        corpus AS (
            SELECT vec_id, e FROM base
            UNION ALL
            SELECT vec_id + 100000000,
                   list_transform(range(1, 65),
                       j -> e[j] * (1.0 + CAST((vec_id + j) % 7 - 3 AS DOUBLE)
                                          / 100.0))
            FROM base WHERE vec_id % 10 = 0
        ),
        g AS (SELECT MAX(list_max(list_transform(e, x -> abs(x)))) AS gmax
              FROM corpus),
        qv AS (
            SELECT vec_id,
                   list_transform(e, x -> CAST(floor(127.0 * x / g.gmax + 0.5)
                                               AS BIGINT)) AS q
            FROM corpus, g
        ),
        cents AS (
            SELECT vec_id AS cent_id, q AS cq FROM qv
            WHERE {_SEM_CENT_PRED_SQL}
        ),
        assign AS (
            SELECT vec_id, q, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY
                       list_sum(list_transform(range(1, {_SEM_PREFIX + 1}),
                           j -> (q[j]-cq[j])*(q[j]-cq[j]))), cent_id) AS rn
            FROM qv CROSS JOIN cents
        ),
        a AS (SELECT vec_id, q, cent_id FROM assign WHERE rn = 1),
        pairs AS (
            SELECT x.cent_id, x.vec_id AS id_a, y.vec_id AS id_b,
                   list_sum(list_transform(range(1, 65),
                            j -> x.q[j]*y.q[j])) AS ip,
                   list_sum(list_transform(x.q, t -> t*t)) AS na2,
                   list_sum(list_transform(y.q, t -> t*t)) AS nb2
            FROM a x JOIN a y
              ON x.cent_id = y.cent_id AND x.vec_id < y.vec_id
        ),
        dups AS (
            SELECT * FROM pairs
            WHERE ip > 0
              AND ip*ip*{_SEM_TAU2_DEN} >= {_SEM_TAU2_NUM}*na2*nb2
        )
        SELECT CAST(cent_id AS BIGINT) AS cent_id,
               CAST(id_b AS BIGINT) AS removed_id,
               CAST(MIN(id_a) AS BIGINT) AS dup_of,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM dups
        GROUP BY cent_id, id_b
        ORDER BY removed_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    # NOTE: perturb with the BASE vec_id, then re-key (+1e6).  Inside one
    # select the alias `vec_id` would shadow the input column and the ramp
    # phase would come from the re-keyed id, diverging from the oracle.
    perturbed = (
        base.filter(F.col("vec_id") % 10 == 0)
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda j: F.element_at("e", j.cast("int"))
                * (
                    F.lit(1.0)
                    + ((F.col("vec_id") + j) % 7 - 3).cast("double") / F.lit(100.0)
                ),
            ).alias("e"),
        )
        .select((F.col("vec_id") + 100000000).alias("vec_id"), "e")
    )
    corpus = base.unionByName(perturbed)
    gmax = corpus.agg(
        F.max(F.array_max(F.transform("e", lambda x: F.abs(x)))).alias("gmax")
    )
    qv = corpus.crossJoin(F.broadcast(gmax)).select(
        "vec_id",
        F.transform(
            "e",
            lambda x: F.floor(F.lit(127.0) * x / F.col("gmax") + F.lit(0.5)).cast(
                "bigint"
            ),
        ).alias("q"),
    )
    # centroid PREFIXES to the driver (k = N/64 model rows — bounded at
    # fixture SFs; a production corpus assigns against an IVF index
    # instead of a flat panel, see the doc) and ship them back as ONE
    # bound array literal: assignment becomes a zero-shuffle scan map.
    # The earlier crossJoin-against-broadcast form materialized N x k
    # rows carrying full 64-dim arrays through an aggregation — measured
    # 24x at 10x data; this form is the ml_kmeans_quantized /
    # pq_encode bound-literal pattern (linear, plan size ~ k x 16 ints).
    cent_rows = (
        qv.filter(_sem_cent_pred())
        .select("vec_id", F.slice("q", 1, _SEM_PREFIX).alias("cq"))
        .orderBy("vec_id")
        .collect()
    )
    cb = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{int(v)}L" for v in r.cq) + ")" for r in cent_rows
        )
        + ")"
    )
    ids = "array(" + ",".join(f"{int(r.vec_id)}L" for r in cent_rows) + ")"
    # argmin over the literal panel: struct (d, idx) min == ORDER BY
    # d, cent_id of the oracle (ids are sorted ascending, so idx order
    # == cent_id order)
    pick = (
        "array_min(transform(__cb, (cent, i) -> named_struct("
        f"'d', aggregate(zip_with(slice(q, 1, {_SEM_PREFIX}), cent, "
        "(x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v), "
        "'i', i)))"
    )
    zero = F.lit(0).cast("bigint")
    assign = (
        qv.select("vec_id", "q", F.expr(cb).alias("__cb"))
        .select("vec_id", "q", F.expr(pick).alias("m"))
        .select(
            "vec_id",
            "q",
            # per-row squared norm ONCE here (not per pair: the pair
            # stage would fold it |cluster| times per row otherwise)
            F.aggregate(
                F.transform("q", lambda t: t * t), zero, lambda acc, v: acc + v
            ).alias("n2"),
            F.element_at(F.expr(ids), F.col("m.i") + 1).alias("cent_id"),
        )
    )
    x = assign.select(
        F.col("cent_id"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    y = assign.select(
        F.col("cent_id").alias("cent_b"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    pairs = x.join(
        y, (F.col("cent_id") == F.col("cent_b")) & (F.col("id_a") < F.col("id_b"))
    ).select(
        "cent_id",
        "id_a",
        "id_b",
        F.aggregate(
            F.zip_with("qa", "qb", lambda a, b: a * b), zero, lambda acc, v: acc + v
        ).alias("ip"),
        "na2",
        "nb2",
    )
    dups = pairs.filter(
        (F.col("ip") > 0)
        & (
            F.col("ip") * F.col("ip") * F.lit(_SEM_TAU2_DEN)
            >= F.lit(_SEM_TAU2_NUM) * F.col("na2") * F.col("nb2")
        )
    )
    return (
        dups.groupBy("cent_id", F.col("id_b").alias("removed_id"))
        .agg(
            F.min("id_a").cast("bigint").alias("dup_of"),
            F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        )
        .select(
            F.col("cent_id").cast("bigint").alias("cent_id"),
            F.col("removed_id").cast("bigint").alias("removed_id"),
            "dup_of",
            "n_dups",
        )
        .orderBy("removed_id")
    )


# ---- entity-resolution clusters: linkage pairs -> components ---------------

#: the dedup_record_linkage scored-pairs pipeline as a reusable SQL CTE body
_RL_PAIRS_SQL = f"""
        a AS (
            SELECT c_custkey AS a_id, c_name, c_nationkey, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                   right(c_name, 2) AS blk
            FROM customer
        ),
        b AS (
            SELECT c_custkey + 10000000 AS b_id,
                   CASE WHEN c_custkey % 3 = 0 THEN lower(c_name)
                        ELSE c_name END AS c_name,
                   c_nationkey, c_mktsegment,
                   CAST(round(c_acctbal * 100) AS BIGINT)
                       + CASE WHEN c_custkey % 3 = 1 THEN 37 ELSE 0 END
                       AS bal_cents,
                   right(c_name, 2) AS blk
            FROM customer WHERE c_custkey % 2 = 0
        ),
        scored AS (
            SELECT a.a_id, b.b_id,
                   CASE WHEN lower(a.c_name) = lower(b.c_name)
                        THEN {_RL_W_NAME_CI} ELSE 0 END
                 + CASE WHEN abs(a.bal_cents - b.bal_cents) <= 100
                        THEN {_RL_W_BAL} ELSE 0 END
                 + CASE WHEN a.c_mktsegment = b.c_mktsegment
                        THEN {_RL_W_SEG} ELSE 0 END
                 + CASE WHEN a.c_name = b.c_name
                        THEN {_RL_W_NAME_CS} ELSE 0 END AS score
            FROM a JOIN b
              ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
        ),
        pairs AS (
            SELECT a_id, b_id FROM scored WHERE score >= {_RL_THRESHOLD}
        )
"""


@register(
    "dedup_er_clusters",
    category="dedup",
    doc="Entity-resolution CLUSTERS: the dedup_record_linkage match pairs "
    "promoted to identity clusters via large-star/small-star connected "
    "components (operators/graph.cc_star — a record that matches two "
    "different feed rows, or two source rows bridged by one feed row, "
    "must land in ONE cluster; pairwise links alone under-merge).  "
    "Output is the golden-record skeleton per cluster: canonical id "
    "(min member), member counts per side, and an id checksum.  At "
    "100 TB the pair graph is orders smaller than the corpus and "
    "cc_star converges in O(log^2) shuffle rounds regardless of how "
    "long the match chains get (SCALE.md, round 3).  The oracle "
    "computes the same components via a recursive reachability CTE "
    "(viable there because ER components are small; the distributed "
    "engine can't assume that).",
    oracle=f"""
        WITH RECURSIVE {_RL_PAIRS_SQL},
        edges AS (
            SELECT a_id AS src, b_id AS dst FROM pairs
            UNION ALL
            SELECT b_id, a_id FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        walk(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
        ),
        comp AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node)
        SELECT CAST(component AS BIGINT) AS component,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN node < 10000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_source,
               CAST(SUM(CASE WHEN node >= 10000000 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_feed,
               CAST(SUM(node) AS BIGINT) AS id_checksum
        FROM comp
        GROUP BY component
        ORDER BY component
    """,
)
def dedup_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.graph import cc_star

    pairs = dedup_record_linkage(spark, sf_dir).select("a_id", "b_id")
    comps = cc_star(pairs, a_col="a_id", b_col="b_id")
    return (
        comps.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum(F.when(F.col("id") < 10000000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_source"),
            F.sum(F.when(F.col("id") >= 10000000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_feed"),
            F.sum("id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("component")
    )


@register(
    "dedup_golden_record",
    category="dedup",
    doc="Golden-record SURVIVORSHIP, the step after ER clustering that "
    "MDM systems ship: each multi-member identity cluster (from the "
    "dedup_record_linkage pairs promoted to components via "
    "operators/graph.cc_star) collapses to ONE canonical record under "
    "deterministic survivorship rules — canonical id = min member id "
    "(source ids sort before feed ids, so the system of record wins), "
    "surviving name = the canonical member's (min_by on the unique id, "
    "tie-free), surviving balance = max cents across members (the "
    "freshest-amount rule), plus a conflict census (distinct balance "
    "values > 1 means the merge had to choose).  Scale shape: the "
    "cluster labels come from the O(log^2)-round cc_star contraction; "
    "attributes join back by id (one shuffle) and every survivorship "
    "rule is a plain aggregate over members.  The oracle replays the "
    "closure recursively and applies identical rules.",
    oracle=f"""
        WITH RECURSIVE {_RL_PAIRS_SQL},
        edges AS (
            SELECT a_id AS src, b_id AS dst FROM pairs
            UNION ALL
            SELECT b_id, a_id FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        walk(node, lbl) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.node
        ),
        comp AS (SELECT node, MIN(lbl) AS component FROM walk GROUP BY node),
        attrs AS (
            SELECT a_id AS node, c_name AS name, bal_cents FROM a
            UNION ALL
            SELECT b_id AS node, c_name AS name, bal_cents FROM b
        ),
        merged AS (
            SELECT c.component,
                   COUNT(*) AS n_members,
                   MIN(c.node) AS canonical_id,
                   arg_min(t.name, c.node) AS survived_name,
                   MAX(t.bal_cents) AS survived_bal_cents,
                   COUNT(DISTINCT t.bal_cents) AS n_bal_values
            FROM comp c JOIN attrs t ON t.node = c.node
            GROUP BY c.component
        )
        SELECT CAST(component AS BIGINT) AS component,
               CAST(n_members AS BIGINT) AS n_members,
               CAST(canonical_id AS BIGINT) AS canonical_id,
               survived_name,
               CAST(survived_bal_cents AS BIGINT) AS survived_bal_cents,
               CAST(CASE WHEN n_bal_values > 1 THEN 1 ELSE 0 END AS BIGINT)
                   AS bal_conflict
        FROM merged
        ORDER BY component
    """,
)
def dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.graph import cc_star
    from flow_spark.queries.util import cents

    pairs = dedup_record_linkage(spark, sf_dir).select("a_id", "b_id")
    comps = cc_star(pairs, a_col="a_id", b_col="b_id")
    cust = load_table(spark, sf_dir, "customer")
    # the same two record sides the linkage scored: source (a) + dirty
    # re-registration feed (b) — attribute table keyed by the node id
    a = cust.select(
        F.col("c_custkey").alias("node"),
        F.col("c_name").alias("name"),
        cents("c_acctbal").alias("bal_cents"),
    )
    b = cust.filter(F.col("c_custkey") % 2 == 0).select(
        (F.col("c_custkey") + 10000000).alias("node"),
        F.when(F.col("c_custkey") % 3 == 0, F.lower("c_name"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        (
            cents("c_acctbal")
            + F.when(F.col("c_custkey") % 3 == 1, F.lit(37)).otherwise(F.lit(0))
        ).alias("bal_cents"),
    )
    attrs = a.unionByName(b)
    return (
        comps.select(F.col("id").alias("node"), "component")
        .join(attrs, "node")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("node").cast("bigint").alias("canonical_id"),
            F.expr("min_by(name, node)").alias("survived_name"),
            F.max("bal_cents").cast("bigint").alias("survived_bal_cents"),
            F.when(F.countDistinct("bal_cents") > 1, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("bal_conflict"),
        )
        .select(
            F.col("component").cast("bigint").alias("component"),
            "n_members",
            "canonical_id",
            "survived_name",
            "survived_bal_cents",
            "bal_conflict",
        )
        .orderBy("component")
    )


# ---- prefix-filter exact set-similarity join (SSJoin/PPJoin) ---------------


@register(
    "dedup_prefix_filter_join",
    category="dedup",
    doc="EXACT set-similarity self-join via prefix filtering (SSJoin, "
    "Chaudhuri et al. ICDE'06 / PPJoin, Xiao et al. WWW'08) over "
    "word-3-gram shingle sets: shingles ordered rare-first (set "
    "frequency asc, shingle asc); a pair with Jaccard >= 0.7 must "
    "share a shingle in each side's first sz - ceil(0.7*sz) + 1 "
    "shingles under ANY consistent global order, so candidates = docs "
    "sharing a PREFIX shingle (rare by construction — per-shingle "
    "fan-out bounded by rare-shingle frequency) plus the length filter "
    "least(sz)*10 >= greatest(sz)*7; survivors verified with exact "
    "Jaccard.  The complement to MinHash-LSH: deterministic recall "
    "1.0 (no hashing luck, no false negatives), one extra vocab-sized "
    "frequency pass.  jaccard_ppm is an exact integer in both engines.",
    oracle=f"""
        WITH {_SQL_SHINGLES},
        dfq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
        ordered AS MATERIALIZED (
            SELECT doc_id, list(t.shingle ORDER BY d.df, t.shingle) AS toks,
                   COUNT(*) AS sz
            FROM sh t JOIN dfq d USING (shingle)
            GROUP BY doc_id
        ),
        pref AS (
            SELECT doc_id, sz,
                   unnest(toks[1 : CAST(sz - ((sz * 7 + 9) // 10) + 1 AS INT)])
                     AS tk
            FROM ordered
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM pref a JOIN pref b
              ON a.tk = b.tk AND a.doc_id < b.doc_id
            WHERE least(a.sz, b.sz) * 10 >= greatest(a.sz, b.sz) * 7
        ),
        ver AS (
            SELECT doc_a, doc_b,
                   len(list_intersect(oa.toks, ob.toks)) AS n_common,
                   oa.sz AS sa, ob.sz AS sb
            FROM cand
            JOIN ordered oa ON oa.doc_id = doc_a
            JOIN ordered ob ON ob.doc_id = doc_b
        )
        SELECT doc_a, doc_b,
               CAST(n_common * 1000000 // (sa + sb - n_common) AS BIGINT)
                 AS jaccard_ppm
        FROM ver
        WHERE n_common * 10 >= 7 * (sa + sb - n_common)
        ORDER BY doc_a, doc_b
    """,
)
def dedup_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.dedup import prefix_filter_pairs

    corpus = _augment(load_table(spark, sf_dir, "documents"))
    return (
        prefix_filter_pairs(word_shingles(corpus), t_num=7, t_den=10)
        .select(
            F.col("doc_a").cast("bigint").alias("doc_a"),
            F.col("doc_b").cast("bigint").alias("doc_b"),
            F.col("jaccard_ppm").cast("bigint").alias("jaccard_ppm"),
        )
        # the global sort's range-partitioner SAMPLING pass would
        # otherwise re-run the whole candidate+verify lineage a second
        # time (measured +2.2 s at sf1 for a 2k-row result) — truncate
        # it; the surviving pairs are output-sized
        .localCheckpoint()
        .orderBy("doc_a", "doc_b")
    )
