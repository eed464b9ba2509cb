"""Similarity-search queries over `embeddings`, oracle-checked.

Brute-force cosine top-k is the exact baseline; the LSH (random
hyperplane) variant is the 100 TB scale path — both fully deterministic
(portable-hash-derived hyperplanes) so the oracle replicates them exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from flow_spark.queries.registry import register

_DIM = 64
_N_PLANES = 8

#: DuckDB expression for the LSH bucket of a DOUBLE[] column `e` —
#: mirrors operators.similarity.lsh_signature / hyperplane_weight:
#: weight(p, j) = (md5_hash60('lsh' || 'hp{p}_' || j) % 2001 - 1000) / 1000
_SQL_W = (
    "((CAST(('0x' || substr(md5(concat('lsh', 'hp', {p}, '_', CAST(j - 1 AS VARCHAR))), 1, 15)) AS BIGINT)"
    " % 2001 - 1000) / 1000.0)"
)


def _sql_bucket(vec: str) -> str:
    dots = []
    for p in range(_N_PLANES):
        w = _SQL_W.format(p=p)
        dots.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {_DIM + 1}), "
            f"j -> CAST({vec}[j] AS DOUBLE) * {w})) >= 0 THEN {2**p} ELSE 0 END)"
        )
    return "(" + " + ".join(dots) + ")"


def _sql_cos(q: str, c: str) -> str:
    """DuckDB cosine via the EXACT expression the Spark side evaluates.

    Spark computes left-fold dot / (sqrt(left-fold sumsq(q)) * sqrt(
    left-fold sumsq(c))) (functions/vectors.py).  DuckDB's
    list_cosine_similarity divides by sqrt(product-of-sums) — a different
    IEEE evaluation order — so near-tied cosines could flip ROW_NUMBER
    ranks across engines.  Same formula on both sides = bit-identical
    doubles = identical ranks (ADVICE r2).
    """
    return (
        f"(list_sum(list_transform(range(1, {_DIM + 1}), j -> {q}[j] * {c}[j]))"
        f" / (sqrt(list_sum(list_transform({q}, x -> x * x)))"
        f" * sqrt(list_sum(list_transform({c}, x -> x * x)))))"
    )


@register(
    "sim_topk_bruteforce",
    category="similarity",
    doc="Exact cosine top-5 neighbors for each query vector (vec_id % 50 = "
    "0): broadcast queries x one candidate scan + per-query window top-k.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN v c ON c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) AS cos
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return brute_force_topk(queries, emb, k=5).orderBy("query_id", "rank")


@register(
    "sim_lsh_ann",
    category="similarity",
    doc="Approximate NN via 8-hyperplane LSH bucketing: queries only score "
    "same-bucket candidates (the ~2^8 candidate-set reduction that makes "
    "ANN linear at scale); exact cosine top-3 within bucket.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        sig AS (
            SELECT vec_id, e, {_sql_bucket('e')} AS bucket FROM v
        ),
        q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM sig WHERE vec_id % 50 = 0),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN sig c ON c.bucket = q.bucket AND c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) AS cos
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk(queries, emb, dim=_DIM, k=3, n_planes=_N_PLANES).orderBy(
        "query_id", "rank"
    )


_N_CENTROIDS = 8


@register(
    "sim_ivf_ann",
    category="similarity",
    doc="IVF ANN (nprobe=1): vectors partition into inverted lists by "
    "nearest centroid; a probe scores only its own list — |C|/k_centroids "
    "candidates instead of |C|. Centroids here are the 8 lowest-id vectors "
    "(deterministic stand-in for a KMeans fit) so the oracle replicates "
    "the index exactly; assignment ships centroids as literals (zero "
    "shuffle, no model broadcast join).",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cent AS (
            SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {_N_CENTROIDS}
        ),
        assigned AS (
            SELECT vec_id, e, cluster FROM (
                SELECT v.vec_id, v.e, c.cid AS cluster,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY {_sql_cos('v.e', 'c.ce')} DESC, c.cid ASC
                       ) AS rn
                FROM v CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe, cluster
            FROM assigned WHERE vec_id % 50 = 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN assigned c
              ON c.cluster = q.cluster AND c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) AS cos
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # k centroid rows -> driver: this is the model parameter, not data
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(_N_CENTROIDS).collect()
    ]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(queries, emb, cents, k=3).orderBy("query_id", "rank")


@register(
    "sim_label_centroid_dist",
    category="similarity",
    doc="Label-conditioned aggregate over vectors: per-label mean squared "
    "norm and count (array aggregate lambda + groupBy).",
    oracle="""
        SELECT label,
               COUNT(*) AS n,
               ROUND(AVG(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                 x -> x * x))), 4) AS mean_sq_norm
        FROM embeddings
        GROUP BY label
        ORDER BY label
    """,
)
def sim_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(sq_norm), 4).alias("mean_sq_norm"),
        )
        .orderBy("label")
    )


@register(
    "emb_quantize_int8",
    category="similarity",
    doc="Symmetric int8 vector quantization (the 4x compression step "
    "before ANN index build at 100 TB): per-vector scale = max|x|/127, "
    "q_i = floor(x/scale + 0.5). Everything stays in Spark higher-order "
    "functions (transform/aggregate — JVM codegen, no Python, no "
    "explode/shuffle: one narrow pass over the vectors). floor(x+0.5) "
    "is used instead of round() because both engines define floor "
    "identically on IEEE doubles while round-on-double is "
    "implementation-defined at midpoints. Integer outputs (sum, L1 "
    "norm, saturation count) make the check exact.",
    oracle="""
        WITH scaled AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(x))) / 127.0
                       AS scale
            FROM embeddings
        ),
        q AS (
            SELECT vec_id, scale,
                   list_transform(embedding,
                                  x -> CAST(floor(x / scale + 0.5) AS INT)) AS qv
            FROM scaled
        )
        SELECT vec_id,
               CAST(scale AS DOUBLE) AS scale,
               CAST(list_aggregate(qv, 'sum') AS BIGINT) AS sum_q,
               CAST(list_aggregate(list_transform(qv, v -> abs(v)), 'sum')
                    AS BIGINT) AS l1_q,
               len(list_filter(qv, v -> abs(v) = 127)) AS n_saturated
        FROM q
        ORDER BY vec_id
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.withColumn(
        "scale",
        F.array_max(F.transform("embedding", lambda x: F.abs(x))) / F.lit(127.0),
    )
    q = scaled.withColumn(
        "qv",
        F.transform(
            "embedding",
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
        ),
    )
    zero = F.lit(0).cast("long")
    return q.select(
        "vec_id",
        F.col("scale").cast("double").alias("scale"),
        F.aggregate("qv", zero, lambda acc, v: acc + v).alias("sum_q"),
        F.aggregate("qv", zero, lambda acc, v: acc + F.abs(v)).alias("l1_q"),
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).alias("n_saturated"),
    ).orderBy("vec_id")


@register(
    "emb_l2_normalize",
    category="similarity",
    doc="L2 normalization to unit vectors (the preprocessing step before "
    "cosine ANN reduces to dot products): components divide by the l2 "
    "norm via JVM higher-order functions — no shuffle, no Python — and "
    "the output includes the re-computed norm of the normalized vector "
    "(== 1 at 6 decimals) as a self-check.  sqrt and division are "
    "IEEE-defined, and both engines fold the array in element order, "
    "so values agree bit-for-bit before the display rounding.",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id % 20 = 0
        ),
        n AS (
            SELECT vec_id, e,
                   sqrt(list_sum(list_transform(e, x -> x * x))) AS nrm
            FROM v
        ),
        u AS (
            SELECT vec_id, nrm,
                   list_transform(e, x -> x / nrm) AS unit
            FROM n
        )
        SELECT vec_id,
               ROUND(nrm, 6) AS norm,
               ROUND(unit[1], 6) AS u_first,
               ROUND(sqrt(list_sum(list_transform(unit, x -> x * x))), 6)
                   AS unit_norm
        FROM u
        ORDER BY vec_id
    """,
)
def emb_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.vectors import l2_norm

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    e = F.transform("embedding", lambda x: x.cast("double"))
    d = emb.select("vec_id", e.alias("e")).withColumn("nrm", l2_norm(F.col("e")))
    unit = F.transform("e", lambda x: x / F.col("nrm"))
    return (
        d.withColumn("unit", unit)
        .select(
            "vec_id",
            F.round("nrm", 6).alias("norm"),
            F.round(F.element_at("unit", 1), 6).alias("u_first"),
            F.round(l2_norm(F.col("unit")), 6).alias("unit_norm"),
        )
        .orderBy("vec_id")
    )


@register(
    "sim_range_search_quantized",
    category="similarity",
    doc="Radius (range) similarity search over int8-quantized vectors: "
    "L2-normalize, quantize to q_i = floor(127*x + 0.5) (saturation-free "
    "since |x| <= 1), then return every candidate whose INTEGER dot "
    "product with a query clears ~cos 0.25 (4032 = 0.25*127^2).  The "
    "integer score makes the radius predicate exact in both engines — no "
    "FP boundary flapping — and is the SIMD-able 4x-compressed form a "
    "real ANN index stores at 100 TB.  Scale shape: queries broadcast, "
    "one candidate scan, no shuffle before the final sort.",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        n AS (
            SELECT vec_id,
                   list_transform(e, x -> CAST(floor(
                       127.0 * x / sqrt(list_aggregate(
                           list_transform(e, y -> y * y), 'sum')) + 0.5)
                       AS BIGINT)) AS qv
            FROM v
        ),
        q AS (SELECT vec_id AS query_id, qv AS qq FROM n WHERE vec_id % 50 = 0),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(list_dot_product(
                       list_transform(q.qq, x -> CAST(x AS DOUBLE)),
                       list_transform(c.qv, x -> CAST(x AS DOUBLE)))
                       AS BIGINT) AS dot_q
            FROM q JOIN n c ON c.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, dot_q
        FROM scored WHERE dot_q >= 4032
        ORDER BY query_id, neighbor_id
    """,
)
def sim_range_search_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    n = emb.select(
        "vec_id",
        F.transform(e, lambda x: F.floor(F.lit(127.0) * x / norm + F.lit(0.5))).alias("qv"),
    )
    q = n.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    zero = F.lit(0).cast("long")
    dot_q = F.aggregate(
        F.zip_with("qq", "qv", lambda a, b: a * b), zero, lambda acc, x: acc + x
    )
    return (
        n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot_q.alias("dot_q"),
        )
        .filter(F.col("dot_q") >= 4032)
        .orderBy("query_id", "neighbor_id")
    )


@register(
    "sim_pq_adc",
    category="similarity",
    doc="Product-quantization ANN (asymmetric distance computation + "
    "exact re-rank): codebooks trained driver-side on a deterministic "
    "256-vector sample (Lloyd's, 16 subspaces x 16 centroids), "
    "candidates encoded to 16 nibble codes by pure JVM argmin folds, "
    "queries scored by element_at lookups against per-query distance "
    "tables built in-plan, then the 100-candidate ADC shortlist "
    "re-ranked by exact L2 (only the shortlist's full vectors are "
    "read).  Rows-only by design: k-means training is iterative and "
    "not SQL-expressible; pytest pins recall@10 >= 0.75 against the "
    "exact answer and determinism across partitionings "
    "(tests/test_pq.py).  At 100 TB the first-pass scan reads 8-byte "
    "codes instead of 256-byte float32 vectors.",
    oracle=None,
)
def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.similarity import pq_adc_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    sample = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(256).collect()
    ]
    books = pq_train(sample, n_subspaces=16, n_centroids=16)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return pq_adc_topk(queries, emb, books, k=10, rerank=100).orderBy(
        "query_id", "rank"
    )


@register(
    "sim_pq_adc_anchored",
    category="similarity",
    doc="Product-quantization ADC with codebooks ANCHORED to data rows — "
    "the oracle-checkable twin of sim_pq_adc: centroids are the evenly "
    "spaced rows (ranks 0,16,..,240) of the 256-lowest-vec_id sample "
    "with ZERO Lloyd's iterations, so codebook[m][c] is literally a "
    "slice of anchor vector c and DuckDB replays encode + ADC exactly "
    "(bit-identical left-fold distances, struct-min/row_number code "
    "ties to the lower code, sequential m-ordered ADC sum, raw double "
    "output — no cross-engine ROUND).  sim_pq_adc keeps Lloyd's for "
    "recall quality; this entry proves the encode/scan machinery "
    "value-exact (VERDICT r2 #2).  Scan shape is identical: candidates "
    "read 16 nibble codes, queries carry in-plan distance tables, "
    "scoring is element_at lookups inside codegen.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        samp AS (
            SELECT e, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM v ORDER BY vec_id LIMIT 256
        ),
        anchors AS (
            -- pq_train(n_iters=0) init: sample rows 0,16,...,240
            SELECT CAST((rn - 1) // 16 AS INT) AS code, e
            FROM samp WHERE (rn - 1) % 16 = 0
        ),
        subs AS (SELECT UNNEST(range(0, 16)) AS m),
        -- encode: per (vector, subspace) the nearest anchor slice,
        -- distance = left-fold sum of squared diffs over the 4-dim slice
        -- (the exact zip_with/aggregate fold the Spark side runs)
        enc AS (
            SELECT vec_id, m, code FROM (
                SELECT x.vec_id, s.m, a.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY x.vec_id, s.m
                           ORDER BY list_sum(list_transform(range(1, 5),
                               j -> (x.e[s.m * 4 + j] - a.e[s.m * 4 + j])
                                  * (x.e[s.m * 4 + j] - a.e[s.m * 4 + j]))) ASC,
                                    a.code ASC
                       ) AS rnk
                FROM v x CROSS JOIN subs s CROSS JOIN anchors a
            ) WHERE rnk = 1
        ),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
        dtab AS (
            SELECT q.query_id, s.m, a.code,
                   list_sum(list_transform(range(1, 5),
                       j -> (q.qe[s.m * 4 + j] - a.e[s.m * 4 + j])
                          * (q.qe[s.m * 4 + j] - a.e[s.m * 4 + j]))) AS d
            FROM q CROSS JOIN subs s CROSS JOIN anchors a
        ),
        adc AS (
            -- m-ordered list_sum == Spark's sequential dtab0+dtab1+...
            SELECT d.query_id, e.vec_id AS neighbor_id,
                   list_sum(list(d.d ORDER BY d.m)) AS approx_d2
            FROM enc e JOIN dtab d ON d.m = e.m AND d.code = e.code
            WHERE e.vec_id != d.query_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, neighbor_id, approx_d2,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_d2 ASC, neighbor_id ASC)
                       AS rank
            FROM adc
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, approx_d2
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank
    """,
)
def sim_pq_adc_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.similarity import pq_adc_topk, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    sample = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(256).collect()
    ]
    books = pq_train(sample, n_subspaces=16, n_centroids=16, n_iters=0)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return pq_adc_topk(queries, emb, books, k=10, round_digits=None).orderBy(
        "query_id", "rank"
    )


@register(
    "sim_ivf_nprobe2",
    category="similarity",
    doc="IVF ANN with nprobe=2 — the recall/cost knob of a production "
    "IVF index: each query probes its TWO nearest inverted lists "
    "(query-side fan-out via one literal argsort + explode; candidates "
    "stay in exactly one list), so neighbors whose nearest centroid "
    "wasn't the query's first choice become reachable at 2x the scan "
    "cost, still |C| * 2 / k_centroids per probe, never the full table.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cent AS (
            SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {_N_CENTROIDS}
        ),
        ranked_assign AS (
            SELECT v.vec_id, v.e, c.cid AS cluster,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {_sql_cos('v.e', 'c.ce')} DESC, c.cid ASC
                   ) AS rn
            FROM v CROSS JOIN cent c
        ),
        assigned AS (
            SELECT vec_id, e, cluster FROM ranked_assign WHERE rn = 1
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe, cluster
            FROM ranked_assign WHERE vec_id % 50 = 0 AND rn <= 2
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN assigned c
              ON c.cluster = q.cluster AND c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) AS cos
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
)
def sim_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.orderBy("vec_id").limit(_N_CENTROIDS).collect()
    ]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_topk(queries, emb, cents, k=3, nprobe=2).orderBy("query_id", "rank")


@register(
    "sim_topk_inner_product",
    category="similarity",
    doc="Maximum-inner-product search (MIPS) baseline: top-5 neighbors by "
    "raw dot product — the retrieval metric of recommendation and "
    "trained-embedding scoring (unnormalized vectors make magnitude "
    "part of relevance; cosine deliberately discards it).  Same "
    "broadcast-queries / one-candidate-scan / window-top-k shape as "
    "the cosine baseline; ranking keys are the rounded dot plus "
    "neighbor id so ties are deterministic.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
        scored AS (
            -- explicit left-fold sum (not list_inner_product) so the FP
            -- accumulation order matches Spark's aggregate() fold exactly
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, {_DIM + 1}),
                                           j -> q.qe[j] * c.e[j])) AS ip_raw
            FROM q JOIN v c ON c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, ip_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ip_raw DESC, neighbor_id ASC)
                       AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(ip_raw, 4) AS ip
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
)
def sim_topk_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.vectors import dot

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    nparts = emb.sparkSession.sparkContext.defaultParallelism
    c = emb.repartition(nparts).select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec")
    )
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn("ip_raw", dot(F.col("qvec"), F.col("cvec")))
    from pyspark.sql.window import Window as W

    w = W.partitionBy("query_id").orderBy(F.desc("ip_raw"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", F.round("ip_raw", 4).alias("ip"))
        .orderBy("query_id", "rank")
    )


@register(
    "sim_lsh_multiprobe",
    category="similarity",
    doc="Multi-probe LSH ANN: each query probes its own bucket plus all 8 "
    "one-bit-flip neighbor buckets (signature XOR per plane) — the "
    "recall knob for hyperplane LSH, recovering neighbors that fell "
    "just across one hyperplane at 9 bucket lookups instead of a "
    "wider scan.  Query-side fan-out only; candidates stay in one "
    "bucket, so no pair dedup is needed (a query's probe buckets are "
    "distinct).  Completes the ANN cost/recall knob set with "
    "sim_ivf_nprobe2 and sim_pq_adc's re-rank.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        sig AS (
            SELECT vec_id, e, {_sql_bucket('e')} AS bucket FROM v
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe,
                   CASE WHEN i = 0 THEN bucket
                        ELSE xor(bucket, 1 << (i - 1)) END AS bucket
            FROM sig CROSS JOIN range(0, 9) t(i)
            WHERE vec_id % 50 = 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN sig c ON c.bucket = q.bucket AND c.vec_id != q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos_raw,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos_raw DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, ROUND(cos_raw, 4) AS cos
        FROM ranked WHERE rank <= 3
        ORDER BY query_id, rank
    """,
)
def sim_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.similarity import lsh_topk_multiprobe

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_topk_multiprobe(
        queries, emb, dim=_DIM, k=3, n_planes=_N_PLANES
    ).orderBy("query_id", "rank")


@register(
    "sim_hybrid_rrf",
    category="similarity",
    doc="Hybrid retrieval with reciprocal-rank fusion: within each "
    "query's LSH bucket, candidates are ranked TWICE (cosine — "
    "direction, and raw inner product — direction x magnitude), and "
    "the two rank lists fuse via RRF computed in EXACT integers "
    "(floor(1e12 / (60 + rank)) per list, summed) so the fusion score "
    "is bit-identical across engines where the textbook 1/(k+r) double "
    "sum would not be.  The standard two-retriever fusion shape "
    "(semantic + lexical at 100 TB) on one bucket equi-join + two "
    "window ranks over the same shuffle.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        b AS (SELECT vec_id, e, {_sql_bucket('e')} AS bucket FROM v),
        q AS (
            SELECT vec_id AS query_id, e AS qe, bucket
            FROM b WHERE vec_id % 50 = 0
        ),
        cand AS (
            -- cosine via the EXACT expression the Spark side evaluates
            -- (left-fold dot / (sqrt(left-fold sumsq) * sqrt(left-fold
            -- sumsq))), not list_cosine_similarity: that builtin divides
            -- by sqrt(product-of-sums), a different FP evaluation order,
            -- and near-tied cosines could flip cos_rank across engines
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_sum(list_transform(range(1, {_DIM + 1}),
                                           j -> q.qe[j] * c.e[j]))
                     / (sqrt(list_sum(list_transform(q.qe, x -> x * x)))
                        * sqrt(list_sum(list_transform(c.e, x -> x * x))))
                     AS cos,
                   list_sum(list_transform(range(1, {_DIM + 1}),
                                           j -> q.qe[j] * c.e[j])) AS ip
            FROM q JOIN b c USING (bucket)
            WHERE c.vec_id != q.query_id
        ),
        r AS (
            SELECT query_id, neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id)
                       AS cos_rank,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ip DESC, neighbor_id)
                       AS ip_rank
            FROM cand
        ),
        f AS (
            SELECT query_id, neighbor_id,
                   CAST(cos_rank AS INT) AS cos_rank,
                   CAST(ip_rank AS INT) AS ip_rank,
                   CAST(1000000000000 // (60 + cos_rank)
                        + 1000000000000 // (60 + ip_rank) AS BIGINT) AS rrf
            FROM r
        )
        SELECT query_id, neighbor_id, cos_rank, ip_rank, rrf,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY rrf DESC, neighbor_id)
                    AS INT) AS final_rank
        FROM f
        QUALIFY final_rank <= 5
        ORDER BY query_id, final_rank
    """,
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.similarity import dot, l2_norm, lsh_signature

    emb = load_table(spark, sf_dir, "embeddings")
    sig = lsh_signature("embedding", _DIM, _N_PLANES)
    nparts = spark.sparkContext.defaultParallelism
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        sig.alias("bucket"),
        l2_norm(F.col("embedding")).alias("qnrm"),
    )
    c = emb.repartition(nparts).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cvec"),
        sig.alias("bucket"),
        l2_norm(F.col("embedding")).alias("cnrm"),
    )
    scored = (
        c.join(F.broadcast(q), ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("ip", dot(F.col("qvec"), F.col("cvec")))
        .withColumn("cos", F.col("ip") / (F.col("qnrm") * F.col("cnrm")))
    )
    w_cos = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    w_ip = W.partitionBy("query_id").orderBy(F.desc("ip"), F.asc("neighbor_id"))
    ranked = (
        scored.withColumn("cos_rank", F.row_number().over(w_cos).cast("int"))
        .withColumn("ip_rank", F.row_number().over(w_ip).cast("int"))
        .withColumn(
            "rrf",
            F.expr(
                "1000000000000L div (60 + cos_rank)"
                " + 1000000000000L div (60 + ip_rank)"
            ).cast("long"),
        )
    )
    w_f = W.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("final_rank", F.row_number().over(w_f).cast("int"))
        .filter(F.col("final_rank") <= 5)
        .select("query_id", "neighbor_id", "cos_rank", "ip_rank", "rrf", "final_rank")
        .orderBy("query_id", "final_rank")
    )


@register(
    "ml_kmeans_quantized",
    category="ml",
    doc="Iterative ML training as EXACT-integer DataFrame ops: one "
    "unrolled Lloyd's iteration of k-means (k=4) over quantized "
    "embeddings (q_j = floor(e_j * 1000) — floor of identical doubles, "
    "no midpoint risk).  Seeds = the 4 lowest-id vectors; assignment = "
    "integer squared-L2 argmin (struct-min ties to the lower centroid "
    "id); centroid update = floor(sum/count) per dimension (identical "
    "IEEE division + floor on both engines); then re-assignment and "
    "per-cluster (size, integer inertia).  Plan shape per iteration: "
    "one broadcast of k tiny centroid rows + one groupBy — the exact "
    "shape MLlib KMeans runs at 100 TB, here value-checked to the last "
    "integer against DuckDB (the quantization is the algorithm "
    "contract, not a fudge: every compare/sum is exact, so the oracle "
    "proves the ITERATION machinery, complementing sim_pq_adc_anchored "
    "which proves encode/scan).",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(FLOOR(x * 1000.0) AS BIGINT)) AS q
            FROM embeddings
        ),
        seeds AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
                   q AS cent
            FROM v ORDER BY vec_id LIMIT 4
        ),
        a1 AS (
            SELECT vec_id, cid, q FROM (
                SELECT v.vec_id, s.cid, v.q,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_sum(list_transform(range(1, 65),
                               j -> (v.q[j] - s.cent[j]) * (v.q[j] - s.cent[j])))
                               ASC, s.cid ASC) AS rn
                FROM v CROSS JOIN seeds s
            ) WHERE rn = 1
        ),
        dims AS (
            SELECT cid, UNNEST(q) AS qj, UNNEST(range(1, 65)) AS j FROM a1
        ),
        upd AS (
            SELECT cid, j,
                   CAST(FLOOR(CAST(SUM(qj) AS DOUBLE) / COUNT(*)) AS BIGINT)
                       AS cj
            FROM dims GROUP BY cid, j
        ),
        cent2 AS (
            SELECT cid, list(cj ORDER BY j) AS cent FROM upd GROUP BY cid
        ),
        a2 AS (
            SELECT vec_id, cid, d2 FROM (
                SELECT v.vec_id, c.cid,
                       list_sum(list_transform(range(1, 65),
                           j -> (v.q[j] - c.cent[j]) * (v.q[j] - c.cent[j])))
                           AS d2,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_sum(list_transform(range(1, 65),
                               j -> (v.q[j] - c.cent[j]) * (v.q[j] - c.cent[j])))
                               ASC, c.cid ASC) AS rn
                FROM v CROSS JOIN cent2 c
            ) WHERE rn = 1
        )
        SELECT cid, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d2) AS BIGINT) AS inertia
        FROM a2 GROUP BY cid ORDER BY cid
    """,
)
def ml_kmeans_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    k = 4
    q = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))"
        ).alias("q"),
    )

    def assign(cents: "list[list[int]]"):
        # centroids are k tiny model rows shipped as ONE bound literal
        # (the pq_encode pattern): assignment is a pure map, zero shuffle
        cb = (
            "array("
            + ",".join(
                "array(" + ",".join(f"{int(x)}L" for x in c) + ")" for c in cents
            )
            + ")"
        )
        pick = (
            "array_min(transform(__cb, (cent, c) -> named_struct("
            "'d', aggregate(zip_with(q, cent, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, v) -> acc + v), 'cid', c)))"
        )
        return q.select("vec_id", "q", F.expr(cb).alias("__cb")).select(
            "vec_id", "q", F.expr(pick).alias("m")
        )

    # seeds: the k lowest-id quantized vectors (k model rows -> driver)
    seeds = [
        [int(x) for x in r.q] for r in q.orderBy("vec_id").limit(k).collect()
    ]
    a1 = assign(seeds).select(F.col("m.cid").alias("cid"), "q")
    sums = (
        a1.groupBy("cid")
        .agg(
            F.count("*").alias("c"),
            *[F.sum(F.col("q")[j]).alias(f"s{j}") for j in range(_DIM)],
        )
        .collect()
    )
    # centroid update on the driver over k EXACT-integer (sum, count)
    # rows: floor(sum/count) in IEEE double — bit-identical to the
    # oracle's FLOOR(CAST(SUM AS DOUBLE) / COUNT(*))
    cents2 = [
        [int(math.floor(r[f"s{j}"] / r["c"])) for j in range(_DIM)]
        for r in sorted(sums, key=lambda r: r["cid"])
    ]
    a2 = assign(cents2).select(
        F.col("m.cid").alias("cid"), F.col("m.d").alias("d2")
    )
    return (
        a2.groupBy("cid")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("d2").cast("bigint").alias("inertia"),
        )
        .orderBy("cid")
    )


@register(
    "ml_knn_classify",
    category="ml",
    doc="k-NN classification of query vectors: top-7 cosine neighbors "
    "(same broadcast-queries/one-scan/window-top-k shape as the ANN "
    "baselines) -> majority label vote with a deterministic tiebreak "
    "(higher count wins, then smaller label).  The label-propagation / "
    "weak-supervision primitive of a training-data pipeline, exact on "
    "both engines: cosine via the shared left-fold expression, votes "
    "are integers.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 37 = 0
        ),
        scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, c.label,
                   {_sql_cos('q.qe', 'c.e')} AS cos_raw
            FROM q JOIN v c ON c.vec_id != q.query_id
        ),
        topk AS (
            SELECT query_id, neighbor_id, label FROM (
                SELECT query_id, neighbor_id, label,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY cos_raw DESC, neighbor_id ASC)
                           AS rank
                FROM scored
            ) WHERE rank <= 7
        ),
        votes AS (
            SELECT query_id, label, COUNT(*) AS n_votes
            FROM topk GROUP BY query_id, label
        )
        SELECT query_id, label AS predicted,
               CAST(n_votes AS BIGINT) AS n_votes
        FROM (
            SELECT query_id, label, n_votes,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY n_votes DESC, label ASC) AS rn
            FROM votes
        ) WHERE rn = 1
        ORDER BY query_id
    """,
)
def ml_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.functions.vectors import dot, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 37 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnrm"),
    )
    nparts = spark.sparkContext.defaultParallelism
    c = emb.repartition(nparts).select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").alias("cvec"),
        l2_norm(F.col("embedding")).alias("cnrm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos", dot(F.col("qvec"), F.col("cvec")) / (F.col("qnrm") * F.col("cnrm"))
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 7)
        .select("query_id", "label")
    )
    votes = topk.groupBy("query_id", "label").agg(F.count("*").alias("n_votes"))
    w_v = W.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("label"))
    return (
        votes.withColumn("rn", F.row_number().over(w_v))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
        .orderBy("query_id")
    )


@register(
    "sample_negatives_contrastive",
    category="similarity",
    doc="Deterministic negative sampling for contrastive training: each "
    "anchor embedding gets k=3 negatives drawn by MODULAR PROBING — "
    "probe j targets vec_id (anchor*48271 + j*2654435761 + 12345) mod N "
    "— then an equi-join fetches the candidates, same-label and "
    "self collisions are filtered, duplicate probes collapse to their "
    "first slot, and the 3 lowest surviving slots win.  All-integer "
    "and replayable from the ids alone (no RNG state, no shuffle "
    "dependence): retries, re-partitions and the DuckDB oracle all "
    "produce the identical pair set.  One broadcast-able join on the "
    "probe key instead of the anchors x candidates cross join — "
    "O(m*n) rows with m=8 probes, linear at 100 TB.  Hard-negative "
    "variants swap the probe target for an LSH bucket key (see "
    "sim_lsh_ann); the sampling skeleton is identical.",
    oracle="""
        WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
        probes AS (
            SELECT e.vec_id AS anchor_id, e.label AS anchor_label, t.j,
                   (e.vec_id * 48271 + t.j * 2654435761 + 12345) % n.n AS cand_id
            FROM embeddings e, n, range(0, 8) t(j)
        ),
        hits AS (
            SELECT p.anchor_id, p.cand_id AS neg_id, MIN(p.j) AS slot,
                   ANY_VALUE(c.label) AS neg_label
            FROM probes p
            JOIN embeddings c ON c.vec_id = p.cand_id
            WHERE c.label <> p.anchor_label AND p.cand_id <> p.anchor_id
            GROUP BY p.anchor_id, p.cand_id
        ),
        ranked AS (
            SELECT anchor_id, neg_id, neg_label,
                   ROW_NUMBER() OVER (PARTITION BY anchor_id
                                      ORDER BY slot, neg_id) AS neg_rank
            FROM hits
        )
        SELECT anchor_id, neg_rank, neg_id, neg_label
        FROM ranked WHERE neg_rank <= 3
        ORDER BY anchor_id, neg_rank
    """,
)
def sample_negatives_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    n_row = emb.agg(F.count("*").alias("n"))
    anchors = emb.select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("anchor_label")
    )
    probes = (
        anchors.crossJoin(F.broadcast(n_row))
        .select(
            "anchor_id",
            "anchor_label",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("j"),
            F.col("n"),
        )
        .withColumn(
            "cand_id",
            (
                F.col("anchor_id") * F.lit(48271)
                + F.col("j") * F.lit(2654435761)
                + F.lit(12345)
            )
            % F.col("n"),
        )
    )
    cands = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("neg_label")
    )
    hits = (
        probes.join(cands, "cand_id")
        .filter(
            (F.col("neg_label") != F.col("anchor_label"))
            & (F.col("cand_id") != F.col("anchor_id"))
        )
        .groupBy("anchor_id", F.col("cand_id").alias("neg_id"))
        .agg(F.min("j").alias("slot"), F.any_value("neg_label").alias("neg_label"))
    )
    w = W.partitionBy("anchor_id").orderBy("slot", "neg_id")
    return (
        hits.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= 3)
        .select("anchor_id", "neg_rank", "neg_id", "neg_label")
        .orderBy("anchor_id", "neg_rank")
    )


@register(
    "ml_linreg_trend",
    category="ml",
    doc="Closed-form per-group linear regression (value-cents vs hours "
    "since 2024-01-01) carried ENTIRELY in exact integer sums: slope = "
    "(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is emitted as its exact bigint "
    "numerator/denominator pair plus the sign as trend — no FP division "
    "crosses the oracle boundary, so the result is bit-deterministic "
    "under any partitioning (the same one-pass sufficient-statistics "
    "trick as agg_exact_covariance, which is also why it scales: five "
    "map-side-combinable sums per group, one shuffle).  Domain bounds "
    "keep every product under 2^63: hours < 2^13, cents < 2^17, "
    "n < 2^21.",
    oracle="""
        WITH pts AS (
            SELECT event_type,
                   CAST(FLOOR(EXTRACT(EPOCH FROM CAST(ts AS TIMESTAMP)) / 3600)
                        - 473352 AS BIGINT) AS x,
                   CAST(ROUND(value * 100) AS BIGINT) AS y
            FROM events
        ),
        sums AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pts GROUP BY event_type
        )
        SELECT event_type, n,
               CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
               CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
               CASE WHEN n * sxy - sx * sy > 0 THEN 'up'
                    WHEN n * sxy - sx * sy < 0 THEN 'down'
                    ELSE 'flat' END AS trend
        FROM sums
        ORDER BY event_type
    """,
)
def ml_linreg_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # 473352 = hours from epoch to 2024-01-01: keeps x small enough that
    # every product below stays well inside int64
    pts = ev.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) - F.lit(473352))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_type",
        "n",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.when(num > 0, "up").when(num < 0, "down").otherwise("flat").alias("trend"),
    ).orderBy("event_type")


from flow_spark.functions.hashing import portable_hash_expr  # noqa: E402

_LIN_BUCKETS = 64  # hashed feature space of the linear scorer

#: mirrors operators.text.tokens (normalize + whitespace split)
_SQL_TOKS = r"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"


@register(
    "ml_hashed_linear_score",
    category="ml",
    doc="Linear quality-classifier inference (the fasttext / quality-"
    "filter serving shape): tokens hash into a fixed feature space "
    f"({_LIN_BUCKETS} buckets), each bucket carries an integer weight, "
    "the doc score is the exact integer weight sum, accept = score >= 0."
    "  The weights here are a deterministic hash-derived stand-in (mod "
    "2001 - 1000) so both engines replay the same model without a "
    "training artifact; in production the bucket->weight map arrives as "
    "a broadcast join or literal map and nothing else changes.  The "
    "100 TB property is the plan: scoring is a SINGLE scan projection — "
    "tokenize, hash, weight-sum inside one higher-order aggregate — "
    "zero shuffles, zero Python; the final per-doc row IS the scan "
    "output.",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id,
                   list_sum(list_transform(
                       {_SQL_TOKS},
                       t -> {portable_hash_expr(
                           f"concat('w:', CAST({portable_hash_expr('t', salt='mlf')}"
                           f" % {_LIN_BUCKETS} AS VARCHAR))")}
                            % 2001 - 1000
                   )) AS score,
                   len({_SQL_TOKS}) AS n_toks
            FROM documents
        )
        SELECT doc_id,
               CAST(n_toks AS BIGINT) AS n_toks,
               CAST(score AS BIGINT) AS score,
               CAST(CASE WHEN score >= 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS accept
        FROM scored
        ORDER BY doc_id
    """,
)
def ml_hashed_linear_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    bucket = lambda t: portable_hash64(t, salt="mlf") % _LIN_BUCKETS  # noqa: E731
    weight = lambda t: (  # noqa: E731
        portable_hash64(F.concat(F.lit("w:"), bucket(t).cast("string"))) % 2001
        - 1000
    )
    score = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + weight(t)
    )
    return (
        docs.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_toks"),
            score.cast("bigint").alias("score"),
        )
        .withColumn(
            "accept",
            F.when(F.col("score") >= 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"),
        )
        .orderBy("doc_id")
    )


_MRL_DIM = 16  # truncated-prefix dims for candidate generation
_MRL_CAND = 20  # candidates per query surviving stage 1
_MRL_K = 5  # final neighbors after full-dim re-rank


@register(
    "sim_matryoshka_rerank",
    category="similarity",
    doc=f"Matryoshka two-stage retrieval: candidate generation scores only "
    f"the first {_MRL_DIM} of 64 dims (the MRL prefix property: nested "
    "prefixes of a Matryoshka-trained embedding are themselves usable "
    f"embeddings), keeps the top {_MRL_CAND} per query, then re-ranks "
    f"those with the FULL 64-dim dot product to the final top {_MRL_K}."
    "  Both stages score int8-quantized vectors (floor(127x+0.5) after "
    "L2 norm) so every comparison is integer-exact in both engines; "
    "candidates here are quantize-then-truncate (no re-normalization) "
    "to keep the oracle bit-exact.  Scale shape: stage 1 is the only "
    "corpus-wide pass and moves 4x less data than full vectors (16 "
    "int8s); stage 2 touches |queries| x {_MRL_CAND} rows via a "
    "broadcast re-join — exactly how production MRL tiering cuts "
    "brute-force cost 4x without an index.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        n AS (
            SELECT vec_id,
                   list_transform(e, x -> CAST(floor(
                       127.0 * x / sqrt(list_aggregate(
                           list_transform(e, y -> y * y), 'sum')) + 0.5)
                       AS BIGINT)) AS qv
            FROM v
        ),
        q AS (SELECT vec_id AS query_id, qv AS qq FROM n
              WHERE vec_id % 50 = 0 AND vec_id < 2000),
        stage1 AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   CAST(list_dot_product(
                       list_transform(list_slice(q.qq, 1, {_MRL_DIM}),
                                      x -> CAST(x AS DOUBLE)),
                       list_transform(list_slice(c.qv, 1, {_MRL_DIM}),
                                      x -> CAST(x AS DOUBLE)))
                       AS BIGINT) AS dot_prefix
            FROM q JOIN n c ON c.vec_id != q.query_id
        ),
        cand AS (
            SELECT query_id, neighbor_id, dot_prefix
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY query_id
                    ORDER BY dot_prefix DESC, neighbor_id
                ) AS rn
                FROM stage1
            ) WHERE rn <= {_MRL_CAND}
        ),
        rerank AS (
            SELECT cand.query_id, cand.neighbor_id, cand.dot_prefix,
                   CAST(list_dot_product(
                       list_transform(q.qq, x -> CAST(x AS DOUBLE)),
                       list_transform(c.qv, x -> CAST(x AS DOUBLE)))
                       AS BIGINT) AS dot_full
            FROM cand
            JOIN q ON q.query_id = cand.query_id
            JOIN n c ON c.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, dot_prefix, dot_full,
               CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY dot_full DESC, neighbor_id
            ) AS rnk
            FROM rerank
        ) WHERE rnk <= {_MRL_K}
        ORDER BY query_id, rank
    """,
)
def sim_matryoshka_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    n = emb.select(
        "vec_id",
        F.transform(
            e, lambda x: F.floor(F.lit(127.0) * x / norm + F.lit(0.5))
        ).alias("qv"),
    )
    # fixed query panel (vec_id < 2000): the corpus side scales with SF,
    # the query side does NOT — otherwise stage 1 grows quadratically in
    # SF, which is a benchmark artifact rather than the serving shape
    q = n.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    zero = F.lit(0).cast("long")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
        )

    stage1 = n.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        dot(
            F.slice("qq", 1, _MRL_DIM), F.slice("qv", 1, _MRL_DIM)
        ).alias("dot_prefix"),
    )
    w1 = W.partitionBy("query_id").orderBy(
        F.desc("dot_prefix"), "neighbor_id"
    )
    cand = (
        stage1.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= _MRL_CAND)
        .select("query_id", "neighbor_id", "dot_prefix")
    )
    # stage 2: re-join the tiny candidate set to the full vectors
    rerank = (
        cand.join(q, "query_id")
        .join(
            n.select(
                F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("cv")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            "dot_prefix",
            dot(F.col("qq"), F.col("cv")).alias("dot_full"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("dot_full"), "neighbor_id")
    return (
        rerank.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= _MRL_K)
        .select("query_id", "neighbor_id", "dot_prefix", "dot_full", "rank")
        .orderBy("query_id", "rank")
    )


# ---- decision-stump training -----------------------------------------------

_STUMP_TOPN = 5  # best split candidates reported


@register(
    "ml_decision_stump",
    category="ml",
    doc="Decision-stump training (the depth-1 unit of every distributed "
    "tree/GBM learner): find the feature threshold minimizing weighted "
    "Gini impurity, computed EXACTLY — per-side impurity is the "
    "integer-rational (n^2 - sum_c count_c^2) / n, micro-scaled with "
    "floor division so both engines agree on every candidate's score "
    "and the argmin.  The feature is dim 1 of the embedding, int8-"
    "quantized against a corpus max (1-row broadcast), giving <= 255 "
    "candidate thresholds — exactly how LightGBM-style histogram "
    "learners bound split search at scale.  Plan shape at 100 TB: ONE "
    "map-side-combinable groupBy builds the (bin, class) histogram "
    "(tiny), every downstream step — zero-filled grid, per-class "
    "running sums, per-threshold Gini, argmin — runs on <= 255 x "
    "n_classes rows, broadcastable anywhere.  At production row counts "
    "swap the micro-scale products to decimal(38,0).  Emits the top-"
    f"{_STUMP_TOPN} splits (score asc) so the margin over runners-up "
    "is visible.",
    oracle=f"""
        WITH v AS (
            SELECT label, CAST(embedding[1] AS DOUBLE) AS x FROM embeddings
        ),
        g AS (SELECT MAX(abs(x)) AS gmax FROM v),
        q AS (
            SELECT label,
                   CAST(floor(127.0 * x / g.gmax + 0.5) AS BIGINT) AS bin
            FROM v, g
        ),
        hist AS (
            SELECT bin, label, COUNT(*) AS c FROM q GROUP BY bin, label
        ),
        bins AS (SELECT DISTINCT bin FROM hist),
        labels AS (
            SELECT label, SUM(c) AS c_tot FROM hist GROUP BY label
        ),
        grid AS (
            SELECT b.bin, l.label, l.c_tot, COALESCE(h.c, 0) AS c
            FROM bins b CROSS JOIN labels l
            LEFT JOIN hist h ON h.bin = b.bin AND h.label = l.label
        ),
        cum AS (
            SELECT bin, label, c_tot,
                   SUM(c) OVER (PARTITION BY label ORDER BY bin) AS cl
            FROM grid
        ),
        per_t AS (
            SELECT bin AS threshold,
                   SUM(cl) AS n_l,
                   SUM(cl * cl) AS ssq_l,
                   SUM(c_tot) - SUM(cl) AS n_r,
                   SUM((c_tot - cl) * (c_tot - cl)) AS ssq_r
            FROM cum GROUP BY bin
        ),
        scored AS (
            SELECT threshold, n_l, n_r,
                   ((n_l * n_l - ssq_l) * 1000000) // n_l
                   + ((n_r * n_r - ssq_r) * 1000000) // n_r AS gini_micro
            FROM per_t WHERE n_l > 0 AND n_r > 0
        )
        SELECT CAST(threshold AS BIGINT) AS threshold,
               CAST(n_l AS BIGINT) AS n_l,
               CAST(n_r AS BIGINT) AS n_r,
               CAST(gini_micro AS BIGINT) AS gini_micro,
               CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY gini_micro, threshold
            ) AS rnk FROM scored
        ) WHERE rnk <= {_STUMP_TOPN}
        ORDER BY rank
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "label", F.element_at(F.col("embedding"), 1).cast("double").alias("x")
    )
    g = v.agg(F.max(F.abs(F.col("x"))).alias("gmax"))
    q = v.crossJoin(F.broadcast(g)).select(
        "label",
        F.floor(F.lit(127.0) * F.col("x") / F.col("gmax") + F.lit(0.5))
        .cast("bigint")
        .alias("bin"),
    )
    hist = q.groupBy("bin", "label").agg(F.count(F.lit(1)).alias("c"))
    bins = hist.select("bin").distinct()
    labels = hist.groupBy("label").agg(F.sum("c").alias("c_tot"))
    grid = (
        bins.crossJoin(F.broadcast(labels))
        .join(hist, ["bin", "label"], "left")
        .select("bin", "label", "c_tot", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    cum = grid.withColumn(
        "cl", F.sum("c").over(W.partitionBy("label").orderBy("bin"))
    )
    per_t = cum.groupBy(F.col("bin").alias("threshold")).agg(
        F.sum("cl").alias("n_l"),
        F.sum(F.col("cl") * F.col("cl")).alias("ssq_l"),
        (F.sum("c_tot") - F.sum("cl")).alias("n_r"),
        F.sum((F.col("c_tot") - F.col("cl")) * (F.col("c_tot") - F.col("cl"))).alias(
            "ssq_r"
        ),
    )
    scored = per_t.filter((F.col("n_l") > 0) & (F.col("n_r") > 0)).select(
        "threshold",
        "n_l",
        "n_r",
        (
            F.expr("((n_l * n_l - ssq_l) * 1000000) div n_l")
            + F.expr("((n_r * n_r - ssq_r) * 1000000) div n_r")
        ).alias("gini_micro"),
    )
    win = W.orderBy(F.asc("gini_micro"), F.asc("threshold"))
    top = scored.orderBy(F.asc("gini_micro"), F.asc("threshold")).limit(
        _STUMP_TOPN
    )
    return (
        top.withColumn("rank", F.row_number().over(win))
        .select(
            F.col("threshold").cast("bigint").alias("threshold"),
            F.col("n_l").cast("bigint").alias("n_l"),
            F.col("n_r").cast("bigint").alias("n_r"),
            F.col("gini_micro").cast("bigint").alias("gini_micro"),
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("rank")
    )


_CB_TOKENS = 4  # token vectors per doc: 4 x 16-dim slices of the 64-dim emb
_CB_TDIM = 16
_CB_CAND = 16  # stage-1 candidates per query
_CB_K = 5

_CB_QUANT_SQL = """
        n AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                       x -> CAST(floor(127.0 * x / sqrt(list_aggregate(
                           list_transform(CAST(embedding AS DOUBLE[]),
                                          y -> y * y), 'sum')) + 0.5)
                            AS BIGINT)) AS qv
            FROM embeddings
        )
"""


def _cb_maxsim_sql(a: str, b: str) -> str:
    """Sum over query tokens of max over doc tokens of the slice dot."""
    terms = []
    for t in range(_CB_TOKENS):
        dots = ", ".join(
            f"list_sum(list_transform(range(1, {_CB_TDIM + 1}), "
            f"i -> {a}[i + {_CB_TDIM * t}] * {b}[i + {_CB_TDIM * u}]))"
            for u in range(_CB_TOKENS)
        )
        terms.append(f"GREATEST({dots})")
    return " + ".join(terms)


@register(
    "sim_colbert_maxsim",
    category="similarity",
    doc="Late-interaction (ColBERT-style MaxSim) retrieval: each "
    f"embedding is treated as {_CB_TOKENS} token vectors ({_CB_TDIM}-dim "
    "slices); relevance = sum over query tokens of the MAX dot product "
    "against any doc token — the multi-vector scoring that beats "
    "single-vector retrieval on phrase matching.  Serving shape: stage "
    f"1 generates {_CB_CAND} candidates per query with the cheap "
    "whole-vector integer dot (the ANN stand-in), stage 2 computes the "
    f"{_CB_TOKENS}x{_CB_TOKENS} token-dot MaxSim ONLY on candidates — "
    "at 100 TB the expensive late interaction never touches the "
    "corpus, exactly how production ColBERT tiers.  Vectors are int8 "
    "quantized (floor(127x+0.5) after L2 norm) so every dot, max, and "
    "rank is integer-exact in both engines.  Query panel is FIXED "
    "(vec_id % 50 = 0 and < 2000) so stage-1 cost scales linearly, not "
    "quadratically, with SF.",
    oracle=f"""
        WITH {_CB_QUANT_SQL},
        q AS (
            SELECT vec_id AS query_id, qv AS qq FROM n
            WHERE vec_id % 50 = 0 AND vec_id < 2000
        ),
        stage1 AS (
            SELECT q.query_id, c.vec_id AS neighbor_id, q.qq, c.qv AS cv,
                   list_sum(list_transform(range(1, 65),
                                           i -> q.qq[i] * c.qv[i])) AS dot_full,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_sum(list_transform(range(1, 65),
                                    i -> q.qq[i] * c.qv[i])) DESC,
                                c.vec_id) AS rn
            FROM q JOIN n c ON c.vec_id != q.query_id
        ),
        cand AS (SELECT * FROM stage1 WHERE rn <= {_CB_CAND}),
        scored AS (
            SELECT query_id, neighbor_id, dot_full,
                   {_cb_maxsim_sql("qq", "cv")} AS maxsim
            FROM cand
        ),
        ranked AS (
            SELECT query_id, neighbor_id, dot_full, maxsim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY maxsim DESC, neighbor_id) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id,
               CAST(rank AS BIGINT) AS rank,
               CAST(maxsim AS BIGINT) AS maxsim,
               CAST(dot_full AS BIGINT) AS dot_full
        FROM ranked WHERE rank <= {_CB_K}
        ORDER BY query_id, rank
    """,
)
def sim_colbert_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
    n = emb.select(
        "vec_id",
        F.transform(
            e, lambda x: F.floor(F.lit(127.0) * x / norm + F.lit(0.5))
        ).alias("qv"),
    )
    q = n.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    zero = F.lit(0).cast("long")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
        )

    stage1 = n.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "qq",
        F.col("qv").alias("cv"),
        dot(F.col("qq"), F.col("qv")).alias("dot_full"),
    )
    w1 = W.partitionBy("query_id").orderBy(F.desc("dot_full"), "neighbor_id")
    cand = stage1.withColumn("rn", F.row_number().over(w1)).filter(
        F.col("rn") <= _CB_CAND
    )
    maxsim = None
    for t in range(_CB_TOKENS):
        qs = F.slice("qq", 1 + _CB_TDIM * t, _CB_TDIM)
        best = F.greatest(
            *[
                dot(qs, F.slice("cv", 1 + _CB_TDIM * u, _CB_TDIM))
                for u in range(_CB_TOKENS)
            ]
        )
        maxsim = best if maxsim is None else maxsim + best
    scored = cand.select(
        "query_id", "neighbor_id", "dot_full", maxsim.alias("maxsim")
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("maxsim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= _CB_K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("maxsim").cast("bigint").alias("maxsim"),
            F.col("dot_full").cast("bigint").alias("dot_full"),
        )
        .orderBy("query_id", "rank")
    )


@register(
    "sim_ivf_pq_residual",
    category="similarity",
    doc="IVF-PQ with residual encoding — the production ANN disk layout "
    "(FAISS IndexIVFPQ), composed from the engine's IVF routing and PQ "
    "machinery and fully oracle-checked: the coarse quantizer is the 8 "
    "lowest-vec_id rows (squared-L2 assignment, ties to the lower "
    "list), PQ codebooks are ANCHORED data-row residuals (evenly "
    "spaced sample rows minus their own coarse centroid, zero Lloyd's "
    "iterations), queries probe their nprobe=2 nearest lists with "
    "per-list residual distance tables, and the ADC scan joins codes "
    "to tables on (list, subspace, code) — because both residuals are "
    "taken against the SAME list centroid, the ADC sum approximates "
    "the true L2 and every double is bit-identical across engines "
    "(left-fold slice distances, struct-min code ties, m-ordered ADC "
    "sum, raw double output).  At 100 TB the candidate side stores "
    "(id, list, 16 nibble codes) partitioned by list: a probe reads "
    "2/8 of the table and never touches raw floats.",
    oracle="""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cents AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT)
                       AS cid, e AS ce
            FROM v ORDER BY vec_id LIMIT 8
        ),
        cassign AS (
            -- nprobe ranking: squared-L2 to each coarse centroid
            -- (left-fold over 64 dims), distance ties to the lower list
            SELECT vec_id, e, cid AS cluster, ce, rn FROM (
                SELECT v.vec_id, v.e, c.cid, c.ce,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_sum(list_transform(range(1, 65),
                               j -> (v.e[j] - c.ce[j]) * (v.e[j] - c.ce[j])))
                               ASC, c.cid ASC) AS rn
                FROM v CROSS JOIN cents c
            ) WHERE rn <= 2
        ),
        own AS (SELECT vec_id, e, cluster, ce FROM cassign WHERE rn = 1),
        samp AS (
            SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) AS srn
            FROM v ORDER BY vec_id LIMIT 256
        ),
        anchors AS (
            -- pq_train(n_iters=0) on residuals: sample rows 0,16,..,240,
            -- each minus its OWN nearest coarse centroid
            SELECT CAST((s.srn - 1) // 16 AS INT) AS code,
                   list_transform(range(1, 65), j -> s.e[j] - o.ce[j]) AS ae
            FROM samp s JOIN own o ON o.vec_id = s.vec_id
            WHERE (s.srn - 1) % 16 = 0
        ),
        subs AS (SELECT UNNEST(range(0, 16)) AS m),
        enc AS (
            SELECT vec_id, cluster, m, code FROM (
                SELECT o.vec_id, o.cluster, s.m, a.code,
                       ROW_NUMBER() OVER (
                           PARTITION BY o.vec_id, s.m
                           ORDER BY list_sum(list_transform(range(1, 5),
                               j -> ((o.e[s.m * 4 + j] - o.ce[s.m * 4 + j])
                                     - a.ae[s.m * 4 + j])
                                  * ((o.e[s.m * 4 + j] - o.ce[s.m * 4 + j])
                                     - a.ae[s.m * 4 + j]))) ASC,
                           a.code ASC) AS rnk
                FROM own o CROSS JOIN subs s CROSS JOIN anchors a
            ) WHERE rnk = 1
        ),
        q AS (
            SELECT vec_id AS query_id, e AS qe, cluster, ce
            FROM cassign WHERE vec_id % 50 = 0
        ),
        dtab AS (
            SELECT q.query_id, q.cluster, s.m, a.code,
                   list_sum(list_transform(range(1, 5),
                       j -> ((q.qe[s.m * 4 + j] - q.ce[s.m * 4 + j])
                             - a.ae[s.m * 4 + j])
                          * ((q.qe[s.m * 4 + j] - q.ce[s.m * 4 + j])
                             - a.ae[s.m * 4 + j]))) AS d
            FROM q CROSS JOIN subs s CROSS JOIN anchors a
        ),
        adc AS (
            -- m-ordered list_sum == Spark's sequential ADC fold
            SELECT d.query_id, e.vec_id AS neighbor_id,
                   list_sum(list(d.d ORDER BY d.m)) AS approx_d2
            FROM enc e
            JOIN dtab d ON d.cluster = e.cluster AND d.m = e.m
                       AND d.code = e.code
            WHERE e.vec_id != d.query_id
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT query_id, neighbor_id, approx_d2,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx_d2 ASC,
                                               neighbor_id ASC) AS rank
            FROM adc
        )
        SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, approx_d2
        FROM ranked WHERE rank <= 10
        ORDER BY query_id, rank
    """,
)
def sim_ivf_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.similarity import (
        coarse_residuals,
        ivf_pq_topk,
        pq_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sample = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(256).collect()
    ]
    cents = sample[:8]
    books = pq_train(
        coarse_residuals(sample, cents), n_subspaces=16, n_centroids=16, n_iters=0
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_pq_topk(queries, emb, cents, books, k=10, nprobe=2).orderBy(
        "query_id", "rank"
    )


def _pack_sign_bits(col: str, start: int):
    """BIGINT with bit i set iff embedding[start+i] > 0 (32 dims).

    SQL-expr form because F.shiftleft only takes a literal int for
    numBits, while the SQL function accepts the lambda's index column.
    """
    return F.expr(
        f"aggregate(transform(slice({col}, {start + 1}, 32), "
        "(x, i) -> CASE WHEN x > 0 THEN shiftleft(1L, i) ELSE 0L END), "
        "0L, (acc, v) -> acc + v)"
    )


def _sql_pack(vec: str, start: int) -> str:
    lo, hi = start + 1, start + 32
    return (
        f"CAST(list_sum(list_transform({vec}[{lo}:{hi}], "
        "(x, i) -> CASE WHEN x > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) "
        "ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )


@register(
    "emb_binary_hamming_topk",
    category="similarity",
    doc="Binary-quantized retrieval: each 64-dim float vector collapses to "
    "a 2-word sign bitmap (bit i = embedding[i] > 0 — 16 bytes, a 16x "
    "compression), and top-5 neighbors rank by Hamming distance "
    "bit_count(lo^lo') + bit_count(hi^hi').  Sign extraction is exact "
    "(no float arithmetic at all), so both engines agree bit-for-bit.  "
    "Plan shape at 100 TB: packing is a scan-time projection (packed "
    "corpus persists at 16 B/vector vs 256 B raw), the query panel is "
    "SF-PINNED (vec_id < 2000 — a panel growing with the corpus would "
    "make the bench quadratic in SF, the MRL lesson), and the distance "
    "is two XOR+POPCNT ops inside "
    "whole-stage codegen — the standard first-stage filter before "
    "exact re-rank in binary-embedding retrieval stacks.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        packed AS (
            SELECT vec_id,
                   {_sql_pack('e', 0)} AS lo,
                   {_sql_pack('e', 32)} AS hi
            FROM v
        ),
        q AS (
            SELECT vec_id AS query_id, lo AS qlo, hi AS qhi
            FROM packed WHERE vec_id % 50 = 0 AND vec_id < 2000
        ),
        d AS (
            SELECT q.query_id, p.vec_id AS neighbor_id,
                   bit_count(xor(q.qlo, p.lo))
                       + bit_count(xor(q.qhi, p.hi)) AS hamming
            FROM q JOIN packed p ON p.vec_id <> q.query_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, hamming,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY hamming ASC, neighbor_id ASC)
                       AS rank
            FROM d
        )
        SELECT query_id, neighbor_id,
               CAST(hamming AS BIGINT) AS hamming,
               CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5
        ORDER BY query_id, rank
    """,
)
def emb_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    packed = emb.select(
        "vec_id",
        _pack_sign_bits("embedding", 0).alias("lo"),
        _pack_sign_bits("embedding", 32).alias("hi"),
    )
    q = packed.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000)).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    d = (
        packed.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.col("qlo").bitwiseXOR(F.col("lo")))
                + F.bit_count(F.col("qhi").bitwiseXOR(F.col("hi")))
            )
            .cast("bigint")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        d.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "hamming", "rank")
        .orderBy("query_id", "rank")
    )


@register(
    "sim_ann_recall_eval",
    category="similarity",
    doc="ANN quality evaluation as a query: per query vector, exact "
    "brute-force cosine top-10 (ground truth) and LSH same-bucket top-10 "
    "(the index under test) compute in ONE plan, and recall@10 = "
    "|approx ∩ exact| * 1e6 / |exact| ppm — the metric every vector-"
    "index deployment tracks before swapping exact search out.  Both "
    "legs reuse the engine-exact cosine (identical fold order in both "
    "engines), so set membership at the rank-10 boundary is "
    "deterministic and the whole evaluation is value-checked, not just "
    "row-counted.  Plan shape at 100 TB: ground truth restricts to the "
    "(small, sampled) query panel — broadcast queries x one candidate "
    "scan — while the LSH leg is the bucket join; the final intersection "
    "is a join on (query_id, neighbor_id) of two k-bounded lists.",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, e AS qe FROM v
             WHERE vec_id % 50 = 0 AND vec_id < 2000),
        exact AS (
            SELECT query_id, neighbor_id FROM (
                SELECT q.query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY q.query_id
                                          ORDER BY {_sql_cos('q.qe', 'c.e')} DESC,
                                                   c.vec_id ASC) AS rank
                FROM q JOIN v c ON c.vec_id != q.query_id
            ) WHERE rank <= 10
        ),
        sig AS (SELECT vec_id, e, {_sql_bucket('e')} AS bucket FROM v),
        qb AS (
            SELECT vec_id AS query_id, e AS qe, bucket FROM sig
            WHERE vec_id % 50 = 0 AND vec_id < 2000
        ),
        approx AS (
            SELECT query_id, neighbor_id FROM (
                SELECT qb.query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY qb.query_id
                                          ORDER BY {_sql_cos('qb.qe', 'c.e')} DESC,
                                                   c.vec_id ASC) AS rank
                FROM qb JOIN sig c
                  ON c.bucket = qb.bucket AND c.vec_id != qb.query_id
            ) WHERE rank <= 10
        ),
        hits AS (
            SELECT e.query_id, COUNT(*) AS n_hit
            FROM exact e JOIN approx a
              ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
            GROUP BY e.query_id
        ),
        ne AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id),
        na AS (SELECT query_id, COUNT(*) AS n_approx FROM approx GROUP BY query_id)
        SELECT ne.query_id,
               CAST(ne.n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(na.n_approx, 0) AS BIGINT) AS n_approx,
               CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
               CAST(1000000 * COALESCE(h.n_hit, 0) // ne.n_exact AS BIGINT)
                   AS recall_ppm
        FROM ne
        LEFT JOIN na ON na.query_id = ne.query_id
        LEFT JOIN hits h ON h.query_id = ne.query_id
        ORDER BY ne.query_id
    """,
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
    exact = brute_force_topk(queries, emb, k=10).select(
        "query_id", "neighbor_id"
    )
    approx = lsh_topk(queries, emb, dim=_DIM, k=10, n_planes=_N_PLANES).select(
        "query_id", "neighbor_id"
    )
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    ne = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    na = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_approx"))
    return (
        ne.join(na, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.coalesce("n_approx", F.lit(0)).cast("bigint").alias("n_approx"),
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            F.expr("1000000 * coalesce(n_hit, 0L) div n_exact")
            .cast("bigint")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


@register(
    "eval_kendall_tau",
    category="eval",
    doc="Kendall rank agreement between two retrieval rankers — inner "
    "product vs cosine — per query, entirely in exact integer space.  "
    "Vectors quantize at a FIXED scale (q = floor(1000*x + 0.5), no "
    "data-dependent scale), so dot products are exact integers; the "
    "cosine ordering key avoids sqrt/division via the cross-multiplied "
    "floor key sign(ip) * (ip^2 * 1e10 div |c|^2) riding decimal(38,0) "
    "(Spark) / HUGEINT (DuckDB) — identical total orders in both "
    "engines, ties broken by vec_id.  Tau is evaluated top-k style: "
    "the union of both rankers' top-20 lists per query, concordant/"
    "discordant counted over all shortlist pairs with the ORIGINAL "
    "full-corpus ranks, tau_ppm = (C - D) * 1e6 div (C + D).  Scale "
    "shape: queries broadcast against one candidate scan; the "
    "shortlist cap (<= 40 per query) keeps the pair stage constant "
    "per query at any SF — the ranking sweep itself is the only "
    "data-sized pass.",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(1000 * x + 0.5) AS BIGINT))
                       AS qv
            FROM embeddings
        ),
        q AS (SELECT vec_id AS query_id, qv AS qq FROM v
              WHERE vec_id % 50 = 0 AND vec_id < 2500),
        c AS (SELECT vec_id, qv,
                     CAST(list_dot_product(
                         list_transform(qv, x -> CAST(x AS DOUBLE)),
                         list_transform(qv, x -> CAST(x AS DOUBLE)))
                         AS BIGINT) AS n2
              FROM v WHERE vec_id % 5 = 0),
        scored AS (
            SELECT q.query_id, c.vec_id,
                   CAST(list_dot_product(
                       list_transform(q.qq, x -> CAST(x AS DOUBLE)),
                       list_transform(c.qv, x -> CAST(x AS DOUBLE)))
                       AS BIGINT) AS ip,
                   c.n2
            FROM q JOIN c ON c.vec_id != q.query_id
        ),
        keyed AS (
            SELECT query_id, vec_id, ip,
                   CASE WHEN ip >= 0 THEN 1 ELSE -1 END
                   * CAST((CAST(ip AS HUGEINT) * ip * 10000000000) // n2
                          AS BIGINT) AS kcos
            FROM scored
        ),
        ranked AS (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY ip DESC, vec_id) AS r1,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY kcos DESC, vec_id) AS r2
            FROM keyed
        ),
        short AS (
            SELECT * FROM ranked WHERE r1 <= 20 OR r2 <= 20
        ),
        pairs AS (
            SELECT a.query_id,
                   CASE WHEN (a.r1 - b.r1) * (a.r2 - b.r2) > 0
                        THEN 1 ELSE 0 END AS conc
            FROM short a
            JOIN short b ON a.query_id = b.query_id AND a.vec_id < b.vec_id
        )
        SELECT query_id,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(conc) AS BIGINT) AS concordant,
               CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
               CAST((2 * SUM(conc) - COUNT(*)) * 1000000 // COUNT(*)
                    AS BIGINT) AS tau_ppm
        FROM pairs
        GROUP BY query_id
        ORDER BY query_id
    """,
)
def eval_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding",
        lambda x: F.floor(F.lit(1000.0) * x.cast("double") + F.lit(0.5)).cast(
            "long"
        ),
    )
    v = emb.select("vec_id", qv.alias("qv"))
    zero = F.lit(0).cast("long")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
    )
    # SF-pinned query panel (<= 50 queries; the sim_pq_adc convention —
    # an unpinned panel x corpus is quadratic in SF, see SCALE.md)
    q = v.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2500)).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    c = v.filter(F.col("vec_id") % 5 == 0).select(
        "vec_id", "qv", dot("qv", "qv").alias("n2")
    )
    scored = c.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).select("query_id", "vec_id", dot("qq", "qv").alias("ip"), "n2")
    kcos = F.expr(
        "(CASE WHEN ip >= 0 THEN 1 ELSE -1 END) * "
        "cast((cast(ip as decimal(38,0)) * ip * 10000000000) div n2 as bigint)"
    )
    keyed = scored.withColumn("kcos", kcos)
    wq = Window.partitionBy("query_id")
    ranked = keyed.select(
        "query_id",
        "vec_id",
        F.row_number().over(wq.orderBy(F.desc("ip"), "vec_id")).alias("r1"),
        F.row_number().over(wq.orderBy(F.desc("kcos"), "vec_id")).alias("r2"),
    )
    short = ranked.filter((F.col("r1") <= 20) | (F.col("r2") <= 20))
    a = short.select(
        "query_id",
        F.col("vec_id").alias("ida"),
        F.col("r1").alias("r1a"),
        F.col("r2").alias("r2a"),
    )
    b = short.select(
        "query_id",
        F.col("vec_id").alias("idb"),
        F.col("r1").alias("r1b"),
        F.col("r2").alias("r2b"),
    )
    pairs = a.join(b, "query_id").filter(F.col("ida") < F.col("idb")).select(
        "query_id",
        F.when(
            (F.col("r1a") - F.col("r1b")) * (F.col("r2a") - F.col("r2b")) > 0, 1
        )
        .otherwise(0)
        .alias("conc"),
    )
    return (
        pairs.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("conc").cast("bigint").alias("concordant"),
        )
        .select(
            "query_id",
            "n_pairs",
            "concordant",
            (F.col("n_pairs") - F.col("concordant"))
            .cast("bigint")
            .alias("discordant"),
            F.expr(
                "cast((2 * concordant - n_pairs) * 1000000 div n_pairs as bigint)"
            ).alias("tau_ppm"),
        )
        .orderBy("query_id")
    )


@register(
    "sample_coreset_kcenter",
    category="sampling",
    doc="Greedy k-center (farthest-point-first) coreset selection over "
    "the embedding corpus — the classic 2-approximation for coverage-"
    "maximizing data curation (pick the training subset whose furthest "
    "point is closest).  k = 4 centers unroll into 4 set-based steps: "
    "seed = lowest vec_id, then each next center is the argmax of the "
    "running min-squared-distance to the chosen set (exact INTEGER "
    "distances over fixed-scale int8-style quantization q = "
    "floor(1000x + 0.5); ties broken by lowest vec_id via max_by on "
    "dist * 2^20 - vec_id).  Each step is one 1-row broadcast cross "
    "join (the new center's vector) + one scan — no driver loop over "
    "data, no UDF; the coverage radius after each pick is the exact "
    "integer certificate the approximation bound speaks about.  Scale "
    "shape: k scans of the corpus, each a narrow JVM fold — the "
    "standard distributed form of greedy k-center at 100 TB.",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> CAST(floor(1000 * x + 0.5) AS BIGINT))
                       AS qv
            FROM embeddings WHERE vec_id % 3 = 0
        ),
        c1 AS (SELECT MIN(vec_id) AS c FROM v),
        -- O(k*n), never all-pairs: each step scores the corpus against
        -- ONE center row (same shape as the Spark side's k scans)
        m1 AS (
            SELECT a.vec_id, a.qv,
                   CAST(list_sum(list_transform(
                       list_zip(a.qv, c.qv),
                       p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS DOUBLE)))
                       AS BIGINT) AS md
            FROM v a JOIN v c ON c.vec_id = (SELECT c FROM c1)
        ),
        c2 AS (SELECT arg_max(vec_id, md * 4294967296 - vec_id) AS c FROM m1),
        m2 AS (
            SELECT a.vec_id, a.qv,
                   LEAST(a.md, CAST(list_sum(list_transform(
                       list_zip(a.qv, c.qv),
                       p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS DOUBLE)))
                       AS BIGINT)) AS md
            FROM m1 a JOIN v c ON c.vec_id = (SELECT c FROM c2)
        ),
        c3 AS (SELECT arg_max(vec_id, md * 4294967296 - vec_id) AS c FROM m2),
        m3 AS (
            SELECT a.vec_id, a.qv,
                   LEAST(a.md, CAST(list_sum(list_transform(
                       list_zip(a.qv, c.qv),
                       p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS DOUBLE)))
                       AS BIGINT)) AS md
            FROM m2 a JOIN v c ON c.vec_id = (SELECT c FROM c3)
        ),
        c4 AS (SELECT arg_max(vec_id, md * 4294967296 - vec_id) AS c FROM m3),
        m4 AS (
            SELECT a.vec_id,
                   LEAST(a.md, CAST(list_sum(list_transform(
                       list_zip(a.qv, c.qv),
                       p -> CAST((p[1] - p[2]) * (p[1] - p[2]) AS DOUBLE)))
                       AS BIGINT)) AS md
            FROM m3 a JOIN v c ON c.vec_id = (SELECT c FROM c4)
        )
        SELECT s.step, s.center_id, s.radius2
        FROM (
            SELECT 1 AS step, (SELECT c FROM c1) AS center_id,
                   (SELECT MAX(md) FROM m1) AS radius2
            UNION ALL
            SELECT 2, (SELECT c FROM c2), (SELECT MAX(md) FROM m2)
            UNION ALL
            SELECT 3, (SELECT c FROM c3), (SELECT MAX(md) FROM m3)
            UNION ALL
            SELECT 4, (SELECT c FROM c4), (SELECT MAX(md) FROM m4)
        ) s
        ORDER BY s.step
    """,
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 3 == 0)
    qv = F.transform(
        "embedding",
        lambda x: F.floor(F.lit(1000.0) * x.cast("double") + F.lit(0.5)).cast(
            "long"
        ),
    )
    v = emb.select("vec_id", qv.alias("qv")).localCheckpoint()
    zero = F.lit(0).cast("long")
    d2_to = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        zero,
        lambda acc, x: acc + x,
    )
    # seed: lowest vec_id (1-row broadcast)
    center = v.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("cv")
    )
    rows = []
    md = None  # running min distance frame: (vec_id, qv, md)
    cur = v
    for step in range(1, 5):
        withd = cur.crossJoin(F.broadcast(center)).withColumn("d2", d2_to)
        if md is None:
            cur = withd.select("vec_id", "qv", F.col("d2").alias("md"))
        else:
            cur = withd.select(
                "vec_id", "qv", F.least("md", F.col("d2")).alias("md")
            )
        md = True
        stat = cur.agg(
            F.max("md").alias("radius2"),
            F.expr("max_by(vec_id, md * 4294967296 - vec_id)").alias("next_c"),
        )
        rows.append(
            stat.crossJoin(F.broadcast(center)).select(
                F.lit(step).cast("bigint").alias("step"),
                F.col("cid").cast("bigint").alias("center_id"),
                F.col("radius2").cast("bigint").alias("radius2"),
            )
        )
        # the next center's (id, vector) as the next 1-row broadcast
        center = (
            stat.select(F.col("next_c").alias("vec_id"))
            .join(v, "vec_id")
            .select(F.col("vec_id").alias("cid"), F.col("qv").alias("cv"))
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")


def _mmr_oracle() -> str:
    dot = (
        "CAST(list_dot_product("
        "list_transform({a}, x -> CAST(x AS DOUBLE)), "
        "list_transform({b}, x -> CAST(x AS DOUBLE))) AS BIGINT)"
    )
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, qv AS qq FROM v
              WHERE vec_id % 50 = 0 AND vec_id < 2500),
        cand0 AS (
            SELECT q.qid, v.vec_id AS cid, v.qv,
                   {dot.format(a="q.qq", b="v.qv")} AS rel
            FROM q JOIN v ON v.vec_id <> q.qid
        ),
        cand AS MATERIALIZED (
            SELECT qid, cid, qv, rel FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
                FROM cand0
            ) WHERE rn <= 12
        ),
        sims AS MATERIALIZED (
            SELECT a.qid, a.cid AS ca, b.cid AS cb,
                   {dot.format(a="a.qv", b="b.qv")} AS s
            FROM cand a JOIN cand b ON a.qid = b.qid AND a.cid <> b.cid
        ),
        p1 AS MATERIALIZED (
            SELECT qid, cid, rel, 2 * rel AS score FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                              ORDER BY rel DESC, cid) AS rn
                FROM cand
            ) WHERE rn = 1
        ),
        r2 AS (
            SELECT c.qid, c.cid, c.rel, 2 * c.rel - MAX(s.s) AS score
            FROM cand c
            JOIN p1 ON p1.qid = c.qid AND p1.cid <> c.cid
            JOIN sims s ON s.qid = c.qid AND s.ca = c.cid AND s.cb = p1.cid
            GROUP BY c.qid, c.cid, c.rel
        ),
        p2 AS MATERIALIZED (
            SELECT qid, cid, rel, score FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, cid) AS rn
                FROM r2
            ) WHERE rn = 1
        ),
        sel2 AS MATERIALIZED (
            SELECT qid, cid FROM p1 UNION ALL SELECT qid, cid FROM p2
        ),
        r3 AS (
            SELECT c.qid, c.cid, c.rel, 2 * c.rel - MAX(s.s) AS score
            FROM cand c
            JOIN sims s ON s.qid = c.qid AND s.ca = c.cid
            JOIN sel2 e ON e.qid = s.qid AND e.cid = s.cb
            WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                              WHERE x.qid = c.qid AND x.cid = c.cid)
            GROUP BY c.qid, c.cid, c.rel
        ),
        p3 AS MATERIALIZED (
            SELECT qid, cid, rel, score FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, cid) AS rn
                FROM r3
            ) WHERE rn = 1
        ),
        sel3 AS MATERIALIZED (
            SELECT qid, cid FROM sel2 UNION ALL SELECT qid, cid FROM p3
        ),
        r4 AS (
            SELECT c.qid, c.cid, c.rel, 2 * c.rel - MAX(s.s) AS score
            FROM cand c
            JOIN sims s ON s.qid = c.qid AND s.ca = c.cid
            JOIN sel3 e ON e.qid = s.qid AND e.cid = s.cb
            WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                              WHERE x.qid = c.qid AND x.cid = c.cid)
            GROUP BY c.qid, c.cid, c.rel
        ),
        p4 AS (
            SELECT qid, cid, rel, score FROM (
                SELECT *, row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, cid) AS rn
                FROM r4
            ) WHERE rn = 1
        )
        SELECT CAST(qid AS BIGINT) AS query_id, CAST(pos AS BIGINT) AS pos,
               CAST(cid AS BIGINT) AS vec_id,
               CAST(rel AS BIGINT) AS rel_units,
               CAST(score AS BIGINT) AS mmr_score
        FROM (
            SELECT qid, 1 AS pos, cid, rel, score FROM p1
            UNION ALL SELECT qid, 2, cid, rel, score FROM p2
            UNION ALL SELECT qid, 3, cid, rel, score FROM p3
            UNION ALL SELECT qid, 4, cid, rel, score FROM p4
        )
        ORDER BY query_id, pos
    """


@register(
    "sim_mmr_rerank",
    category="similarity",
    doc="Maximal-marginal-relevance diversity re-rank (Carbonell & "
    "Goldstein 1998), the RAG-era answer to near-duplicate retrieval "
    "lists: per query the top-12 candidates by relevance are re-picked "
    "greedily 4 times with score = 2*rel - max sim to the already "
    "selected (lambda = 2/3 in integer space).  Vectors are quantized "
    "to exact integer units (floor(x*1000+0.5) — floor is "
    "IEEE-identical in both engines) so every relevance and pairwise "
    "similarity is an exact integer dot product, and the greedy argmax "
    "(score DESC, vec_id tiebreak) is deterministic.  The sequential "
    "greedy loop unrolls into 4 set-based pick stages (join + groupBy "
    "+ rank window) — no per-query loop, no UDF.  Scale shape: the "
    "SF-pinned query panel (<= 50 queries) broadcasts against the "
    "corpus for ONE candidate scan; every later stage runs over <= 12 "
    "candidates and <= 132 pair sims per query, constant per query "
    "regardless of SF.",
    oracle=_mmr_oracle(),
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    zero = F.lit(0).cast("bigint")
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), zero, lambda acc, x: acc + x
    )
    v = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    q = v.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2500)).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qq")
    )
    cand0 = (
        F.broadcast(q)
        .join(v, v.vec_id != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"), "qv", dot(F.col("qq"), F.col("qv")).alias("rel"))
    )
    wrel = W.partitionBy("qid").orderBy(F.col("rel").desc(), "cid")
    cand = (
        cand0.withColumn("rn", F.row_number().over(wrel))
        .filter(F.col("rn") <= 12)
        .drop("rn")
        .cache()
    )
    a = cand.select("qid", F.col("cid").alias("ca"), F.col("qv").alias("va"))
    b = cand.select("qid", F.col("cid").alias("cb"), F.col("qv").alias("vb"))
    sims = (
        a.join(b, ["qid"])
        .filter(F.col("ca") != F.col("cb"))
        .select("qid", "ca", "cb", dot(F.col("va"), F.col("vb")).alias("s"))
        .cache()
    )
    slim = cand.select("qid", "cid", "rel")
    p1 = (
        slim.withColumn("rn", F.row_number().over(wrel))
        .filter(F.col("rn") == 1)
        .select("qid", "cid", "rel", (2 * F.col("rel")).alias("score"))
    )

    wscore = W.partitionBy("qid").orderBy(F.col("score").desc(), "cid")
    # disjoint column names per join side — slim/sims/sel all share lineage
    # through cand, and same-name Column references across shared lineage
    # resolve to ONE attribute (a trivially-true predicate), silently
    # dropping the intended equi-key
    msims = sims.select(
        F.col("qid").alias("m_qid"), "ca", "cb", F.col("s").alias("s")
    )

    def _next_pick(sel: DataFrame) -> DataFrame:
        rem = slim.join(
            F.broadcast(sel.select("qid", "cid")), ["qid", "cid"], "left_anti"
        )
        esel = sel.select(F.col("qid").alias("e_qid"), F.col("cid").alias("e_cid"))
        scored = (
            rem.join(
                F.broadcast(msims),
                (F.col("qid") == F.col("m_qid")) & (F.col("cid") == F.col("ca")),
            )
            .join(
                F.broadcast(esel),
                (F.col("m_qid") == F.col("e_qid")) & (F.col("cb") == F.col("e_cid")),
            )
            .groupBy("qid", "cid", "rel")
            .agg((2 * F.first("rel") - F.max("s")).alias("score"))
        )
        return (
            scored.withColumn("rn", F.row_number().over(wscore))
            .filter(F.col("rn") == 1)
            .select("qid", "cid", "rel", "score")
        )

    # each pick frame is <= 1 row per query; caching them linearizes the
    # unrolled DAG (without it p4 re-evaluates p3 which re-evaluates p2
    # ... — stage count grows geometrically in the number of picks)
    p1 = p1.cache()
    p2 = _next_pick(p1).cache()
    sel2 = p1.select("qid", "cid").unionByName(p2.select("qid", "cid"))
    p3 = _next_pick(sel2).cache()
    sel3 = sel2.unionByName(p3.select("qid", "cid"))
    p4 = _next_pick(sel3)
    out = None
    for pos, p in enumerate([p1, p2, p3, p4], start=1):
        row = p.select(
            F.col("qid").cast("bigint").alias("query_id"),
            F.lit(pos).cast("bigint").alias("pos"),
            F.col("cid").cast("bigint").alias("vec_id"),
            F.col("rel").cast("bigint").alias("rel_units"),
            F.col("score").cast("bigint").alias("mmr_score"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("query_id", "pos")


def _pca_oracle() -> str:
    # truncation-toward-zero division — Spark's `div` truncates while
    # DuckDB's `//` floors, so negatives MUST go through the sign-aware
    # form in both engines
    tdiv = "(CASE WHEN {u} >= 0 THEN {u} // {d} ELSE -((-({u})) // {d}) END)"
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        dims AS (SELECT i FROM range(0, 64) t(i)),
        sums AS MATERIALIZED (
            SELECT d.i, SUM(qv[d.i + 1]) AS s
            FROM v, dims d GROUP BY d.i
        ),
        n AS (SELECT COUNT(*) AS n FROM v),
        upper_m AS (
            SELECT a.i, b.i AS j, SUM(qv[a.i + 1] * qv[b.i + 1]) AS sp
            FROM v, dims a, dims b
            WHERE b.i >= a.i
            GROUP BY a.i, b.i
        ),
        m0 AS (
            SELECT i, j, sp FROM upper_m
            UNION ALL
            SELECT j, i, sp FROM upper_m WHERE i <> j
        ),
        m AS MATERIALIZED (
            SELECT m0.i, m0.j,
                   n.n * m0.sp - si.s * sj.s AS c
            FROM m0, n
            JOIN sums si ON si.i = m0.i
            JOIN sums sj ON sj.i = m0.j
        ),
        u1 AS (SELECT i, SUM(c) AS u FROM m GROUP BY i),
        d1 AS (SELECT MAX(ABS(u)) // 1000 + 1 AS d FROM u1),
        w1 AS MATERIALIZED (
            SELECT i, {tdiv.format(u="u", d="d")} AS w FROM u1, d1
        ),
        u2 AS (
            SELECT m.i, SUM(m.c * w1.w) AS u
            FROM m JOIN w1 ON w1.i = m.j GROUP BY m.i
        ),
        d2 AS (SELECT MAX(ABS(u)) // 1000 + 1 AS d FROM u2),
        w2 AS MATERIALIZED (
            SELECT i, {tdiv.format(u="u", d="d")} AS w FROM u2, d2
        ),
        u3 AS (
            SELECT m.i, SUM(m.c * w2.w) AS u
            FROM m JOIN w2 ON w2.i = m.j GROUP BY m.i
        ),
        d3 AS (SELECT MAX(ABS(u)) // 1000 + 1 AS d FROM u3),
        w3 AS (
            SELECT i, {tdiv.format(u="u", d="d")} AS w FROM u3, d3
        )
        SELECT CAST(i AS BIGINT) AS dim, CAST(w AS BIGINT) AS comp
        FROM w3 ORDER BY dim
    """


@register(
    "emb_pca_power",
    category="similarity",
    doc="Top principal component of the embedding corpus — the "
    "whitening/compression primitive behind every 'project out the "
    "dominant direction' embedding cleanup (Mu & Viswanath 2018) — "
    "computed with NO floating point at all.  Vectors quantize to "
    "integer units; the scaled covariance N^2*Cov = N*Sum(q_i q_j) - "
    "s_i s_j is an exact integer matrix (summation-order-free, so "
    "Spark's partial aggregation order cannot flip a bit); three "
    "power-iteration rounds run as 64x64 matrix-vector joins with an "
    "integer rescale (sign-aware truncating division — Spark div "
    "truncates, DuckDB // floors, so negatives go through "
    "sign(u)*(|u| div d) in BOTH engines).  Scale shape: the ONLY "
    "data-sized stage is the upper-triangle pair explode (2080 "
    "products/row, map-side combinable to a 4096-row matrix); every "
    "iteration is constant 64x64 work.  The iterate is cached per "
    "round — without it round k re-runs the covariance scan k times.",
    oracle=_pca_oracle(),
)
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("qv")
    )
    pairs = F.expr(
        "flatten(transform(qv, (x, i) -> "
        "transform(slice(qv, i + 1, 64 - i), (y, j) -> "
        "named_struct('i', i, 'j', i + j, 'p', x * y))))"
    )
    upper = (
        v.select(F.explode(pairs).alias("e"))
        .groupBy(F.col("e.i").alias("i"), F.col("e.j").alias("j"))
        .agg(F.sum("e.p").alias("sp"))
    )
    m0 = upper.unionByName(
        upper.filter(F.col("i") != F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "sp"
        )
    )
    sums = (
        v.select(F.posexplode("qv").alias("i", "q"))
        .groupBy("i")
        .agg(F.sum("q").alias("s"))
    )
    n = v.count()
    si = sums.select(F.col("i").alias("si_i"), F.col("s").alias("si"))
    sj = sums.select(F.col("i").alias("sj_i"), F.col("s").alias("sj"))
    m = (
        m0.join(F.broadcast(si), F.col("i") == F.col("si_i"))
        .join(F.broadcast(sj), F.col("j") == F.col("sj_i"))
        .select(
            "i", "j", (F.lit(n) * F.col("sp") - F.col("si") * F.col("sj")).alias("c")
        )
        .cache()
    )

    def _rescale(u: DataFrame) -> DataFrame:
        d = u.agg((F.expr("max(abs(u)) div 1000") + F.lit(1)).alias("d"))
        return (
            u.crossJoin(F.broadcast(d))
            .select(
                "i",
                F.expr(
                    "CASE WHEN u >= 0 THEN u div d ELSE -((-u) div d) END"
                ).alias("w"),
            )
            .cache()
        )

    w = _rescale(m.groupBy("i").agg(F.sum("c").alias("u")))
    for _ in range(2):
        wj = w.select(F.col("i").alias("wj"), "w")
        u = (
            m.join(F.broadcast(wj), F.col("j") == F.col("wj"))
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("w")).alias("u"))
        )
        w = _rescale(u)
    return w.select(
        F.col("i").cast("bigint").alias("dim"), F.col("w").cast("bigint").alias("comp")
    ).orderBy("dim")


@register(
    "eval_macro_f1",
    category="eval",
    doc="Classifier evaluation end-to-end in exact integer space: a "
    "nearest-centroid classifier over the quantized embeddings "
    "(resubstitution protocol), then the confusion matrix and "
    "per-class precision/recall/F1 plus macro-F1 in ppm.  Centroids "
    "are milli-unit FLOOR-of-quotient vectors — Spark's div truncates "
    "toward zero while DuckDB's // floors, so the oracle wraps the "
    "negative-sum case in sign-aware division; distances are pure "
    "bigint sums of squares, and the argmin uses one scalar key "
    "(dist*16 + label) for a deterministic tie.  Scale shape: "
    "centroid sums are ONE map-side-combinable (label, dim) groupBy; "
    "prediction is a broadcast of 10 centroid rows against one corpus "
    "scan; metrics run over the 10x10 confusion matrix.",
    oracle="""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding,
                       x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        dims AS (SELECT i FROM range(0, 64) t(i)),
        sums AS (
            SELECT label, d.i, SUM(qv[d.i + 1]) AS s, COUNT(*) AS n
            FROM v, dims d GROUP BY label, d.i
        ),
        cent AS (
            SELECT label, i,
                   CASE WHEN s >= 0 THEN (s * 1000) // n
                        ELSE -(((-s) * 1000) // n) END AS c
            FROM sums
        ),
        cent_arr AS MATERIALIZED (
            SELECT label AS clbl, list(c ORDER BY i) AS cv
            FROM cent GROUP BY label
        ),
        scored AS (
            SELECT v.vec_id, v.label, a.clbl,
                   SUM((v.qv[d.i + 1] * 1000 - a.cv[d.i + 1])
                       * (v.qv[d.i + 1] * 1000 - a.cv[d.i + 1])) AS dist
            FROM v, cent_arr a, dims d
            GROUP BY v.vec_id, v.label, a.clbl
        ),
        pred AS (
            SELECT vec_id, label,
                   arg_min(clbl, dist * 16 + clbl) AS p
            FROM scored GROUP BY vec_id, label
        ),
        conf AS MATERIALIZED (
            SELECT label, p, COUNT(*) AS c FROM pred GROUP BY label, p
        ),
        classes AS (SELECT DISTINCT label FROM v),
        per_class AS MATERIALIZED (
            SELECT k.label,
                   COALESCE((SELECT SUM(c) FROM conf WHERE conf.label = k.label), 0)
                       AS n_true,
                   COALESCE((SELECT SUM(c) FROM conf
                             WHERE conf.label = k.label AND conf.p = k.label), 0)
                       AS tp,
                   COALESCE((SELECT SUM(c) FROM conf WHERE conf.p = k.label), 0)
                       AS n_pred
            FROM classes k
        ),
        metrics AS MATERIALIZED (
            SELECT label, n_true, tp,
                   CASE WHEN n_pred > 0 THEN tp * 1000000 // n_pred
                        ELSE 0 END AS precision_ppm,
                   tp * 1000000 // n_true AS recall_ppm
            FROM per_class
        ),
        withf1 AS MATERIALIZED (
            SELECT *,
                   CASE WHEN precision_ppm + recall_ppm > 0
                        THEN 2 * precision_ppm * recall_ppm
                             // (precision_ppm + recall_ppm)
                        ELSE 0 END AS f1_ppm
            FROM metrics
        ),
        macro AS (
            SELECT SUM(f1_ppm) // COUNT(*) AS macro_f1_ppm FROM withf1
        )
        SELECT CAST(w.label AS BIGINT) AS label,
               CAST(w.n_true AS BIGINT) AS n_true,
               CAST(w.tp AS BIGINT) AS tp,
               CAST(w.precision_ppm AS BIGINT) AS precision_ppm,
               CAST(w.recall_ppm AS BIGINT) AS recall_ppm,
               CAST(w.f1_ppm AS BIGINT) AS f1_ppm,
               CAST(m.macro_f1_ppm AS BIGINT) AS macro_f1_ppm
        FROM withf1 w CROSS JOIN macro m
        ORDER BY w.label
    """,
)
def eval_macro_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("bigint"),
        ).alias("qv"),
    )
    sums = (
        v.select("label", F.posexplode("qv").alias("i", "q"))
        .groupBy("label", "i")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    # Spark div truncates toward zero natively — the oracle's sign-aware
    # CASE reproduces exactly this for negative sums
    cent = sums.select(
        "label", "i", F.expr("(s * 1000) div n").alias("c")
    )
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("i", "c"))), lambda x: x.c
        ).alias("cv")
    ).select(F.col("label").alias("clbl"), "cv")
    dist = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: (x * 1000 - y) * (x * 1000 - y)),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + t,
    )
    scored = v.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "label", "clbl", dist.alias("dist")
    )
    pred = scored.groupBy("vec_id", "label").agg(
        F.expr("min_by(clbl, dist * 16 + clbl)").alias("p")
    )
    conf = pred.groupBy("label", "p").agg(F.count(F.lit(1)).alias("c")).cache()
    n_true = conf.groupBy("label").agg(F.sum("c").alias("n_true"))
    n_pred = conf.groupBy("p").agg(F.sum("c").alias("n_pred"))
    tp = conf.filter(F.col("label") == F.col("p")).select(
        "label", F.col("c").alias("tp")
    )
    per_class = (
        n_true.join(tp, "label", "left")
        .join(n_pred.withColumnRenamed("p", "label"), "label", "left")
        .select(
            "label",
            "n_true",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
        )
    )
    metrics = per_class.select(
        "label",
        "n_true",
        "tp",
        F.expr(
            "case when n_pred > 0 then tp * 1000000 div n_pred else 0 end"
        ).alias("precision_ppm"),
        F.expr("tp * 1000000 div n_true").alias("recall_ppm"),
    ).withColumn(
        "f1_ppm",
        F.expr(
            "case when precision_ppm + recall_ppm > 0 then "
            "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) "
            "else 0 end"
        ),
    )
    macro = metrics.agg(F.expr("sum(f1_ppm) div count(1)").alias("macro_f1_ppm"))
    return (
        metrics.crossJoin(F.broadcast(macro))
        .select(
            F.col("label").cast("bigint").alias("label"),
            F.col("n_true").cast("bigint").alias("n_true"),
            F.col("tp").cast("bigint").alias("tp"),
            F.col("precision_ppm").cast("bigint").alias("precision_ppm"),
            F.col("recall_ppm").cast("bigint").alias("recall_ppm"),
            F.col("f1_ppm").cast("bigint").alias("f1_ppm"),
            "macro_f1_ppm",
        )
        .orderBy("label")
    )
