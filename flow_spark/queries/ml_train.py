"""Distributed model TRAINING loops expressed as aggregates.

The curation stack already serves models (``ml_hashed_linear_score``,
``ml_naive_bayes_langid``, ``ml_kmeans_quantized``); this module covers the
remaining shape — an iterative *error-driven* training loop — with a batch
perceptron.  The point for 100 TB: one training epoch is exactly

    score  = features ⋈ broadcast(weights)  → groupBy(doc) sum
    update = misclassified ⋈ features       → groupBy(bucket) sum

i.e. two shuffles over the feature table keyed by doc/bucket, with the
model itself (33 rows) traveling as a broadcast — the PS-free pattern that
scales to any corpus size because model state is tiny and data never moves
to the driver.  All arithmetic is integer (counts × ±1 labels), so Spark
and DuckDB agree bit-for-bit and the oracle replays both epochs as chained
CTEs (epoch 1 collapses: with w0 = 0 every doc is misclassified, so
w1 = Σ y·f — the oracle exploits that; the engine runs the generic loop).

Reference parity: none (novel surface; the reference has no ML loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash64, portable_hash_expr
from flow_spark.queries.registry import register

_B = 32  # hashed feature buckets; bucket _B is the bias feature
_SQL_TOKS = r"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, bucket, cnt): hashed bag-of-words + bias feature."""
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    y = F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(-1)).alias("y")
    toks = docs.select(
        "doc_id",
        y,
        F.explode(tokens(F.col("text"))).alias("tok"),
    ).where(F.length("tok") > 0)
    bow = (
        toks.select(
            "doc_id",
            "y",
            F.pmod(portable_hash64(F.col("tok"), salt="pcp"), F.lit(_B)).alias(
                "bucket"
            ),
        )
        .groupBy("doc_id", "y", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bias = docs.select(
        "doc_id",
        y,
        F.lit(_B).cast("bigint").alias("bucket"),
        F.lit(1).cast("bigint").alias("cnt"),
    )
    return bow.unionByName(bias)


@register(
    "ml_perceptron_train",
    category="ml",
    doc="Batch-perceptron training of an is-English classifier over "
    f"hashed bag-of-words features ({_B} buckets + bias), TWO epochs "
    "unrolled, everything exact-integer.  Each epoch = score (features "
    "join broadcast 33-row weights, groupBy doc) + update (misclassified "
    "docs join features, groupBy bucket, w += sum y*cnt); y*score <= 0 "
    "counts as misclassified.  Output: per-bucket weights after each "
    "epoch, the per-epoch error counts (the training curve as a query "
    "result), and the POCKET weights — batch updates oscillate on "
    "non-separable data, so the served model is the epoch with the "
    "fewest training errors.  The oracle replays both epochs "
    "as chained CTEs (epoch 1 simplifies to w1 = sum y*f because w0=0 "
    "misclassifies everything).",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
                   unnest({_SQL_TOKS}) AS tok
            FROM documents
        ),
        feats AS (
            SELECT doc_id, y,
                   {portable_hash_expr("tok", salt="pcp")} % {_B} AS bucket,
                   COUNT(*) AS cnt
            FROM toks WHERE len(tok) > 0
            GROUP BY doc_id, y, bucket
            UNION ALL
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE -1 END,
                   {_B}, 1
            FROM documents
        ),
        spine AS (SELECT CAST(s AS BIGINT) AS bucket FROM generate_series(0, {_B}) t(s)),
        w1 AS (
            SELECT s.bucket, COALESCE(SUM(f.y * f.cnt), 0) AS w
            FROM spine s LEFT JOIN feats f USING (bucket)
            GROUP BY s.bucket
        ),
        score2 AS (
            SELECT f.doc_id, f.y, SUM(f.cnt * w1.w) AS s
            FROM feats f JOIN w1 USING (bucket)
            GROUP BY f.doc_id, f.y
        ),
        mis2 AS (SELECT doc_id, y FROM score2 WHERE y * s <= 0),
        upd2 AS (
            SELECT f.bucket, SUM(f.y * f.cnt) AS d
            FROM feats f JOIN mis2 USING (doc_id)
            GROUP BY f.bucket
        ),
        w2 AS (
            SELECT w1.bucket, w1.w + COALESCE(upd2.d, 0) AS w
            FROM w1 LEFT JOIN upd2 USING (bucket)
        ),
        score3 AS (
            SELECT f.doc_id, f.y, SUM(f.cnt * w2.w) AS s
            FROM feats f JOIN w2 USING (bucket)
            GROUP BY f.doc_id, f.y
        ),
        nm2 AS (SELECT COUNT(*) AS n FROM mis2),
        nm3 AS (SELECT COUNT(*) AS n FROM score3 WHERE y * s <= 0)
        SELECT w1.bucket,
               CAST(w1.w AS BIGINT) AS w_epoch1,
               CAST(w2.w AS BIGINT) AS w_epoch2,
               CAST(nm2.n AS BIGINT) AS n_mis_epoch2,
               CAST(nm3.n AS BIGINT) AS n_mis_final,
               CAST(CASE WHEN nm2.n <= nm3.n THEN w1.w ELSE w2.w END
                    AS BIGINT) AS w_pocket
        FROM w1 JOIN w2 USING (bucket), nm2, nm3
        ORDER BY bucket
    """,
)
def ml_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _features(spark, sf_dir).localCheckpoint()
    weights = spark.range(_B + 1).select(
        F.col("id").alias("bucket"), F.lit(0).cast("bigint").alias("w")
    )
    epoch_weights: list[DataFrame] = []
    n_mis: DataFrame | None = None
    for _ in range(2):
        scores = (
            feats.join(F.broadcast(weights), "bucket")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
        )
        mis = scores.where(F.col("y") * F.col("s") <= 0)
        upd = (
            feats.join(mis.select("doc_id"), "doc_id")
            .groupBy("bucket")
            .agg(F.sum(F.col("y") * F.col("cnt")).alias("d"))
        )
        n_mis = mis.agg(F.count(F.lit(1)).alias("n"))
        weights = (
            weights.join(upd, "bucket", "left")
            .select(
                "bucket",
                (F.col("w") + F.coalesce(F.col("d"), F.lit(0))).alias("w"),
            )
            .localCheckpoint()
        )
        epoch_weights.append(weights)
    final_scores = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "y")
        .agg(F.sum(F.col("cnt") * F.col("w")).alias("s"))
    )
    n_final = final_scores.where(F.col("y") * F.col("s") <= 0).agg(
        F.count(F.lit(1)).alias("nf")
    )
    w1, w2 = epoch_weights
    return (
        w1.withColumnRenamed("w", "w_epoch1")
        .join(w2.withColumnRenamed("w", "w_epoch2"), "bucket")
        .crossJoin(F.broadcast(n_mis))
        .crossJoin(F.broadcast(n_final))
        .select(
            "bucket",
            F.col("w_epoch1").cast("bigint"),
            F.col("w_epoch2").cast("bigint"),
            F.col("n").cast("bigint").alias("n_mis_epoch2"),
            F.col("nf").cast("bigint").alias("n_mis_final"),
            # pocket variant: batch updates oscillate on non-separable
            # data, so serve the epoch with the fewest training errors
            F.when(F.col("n") <= F.col("nf"), F.col("w_epoch1"))
            .otherwise(F.col("w_epoch2"))
            .cast("bigint")
            .alias("w_pocket"),
        )
        .orderBy("bucket")
    )


#: lambda=1 Poisson CDF thresholds in ppm: smallest k with u < CDF(k)*1e6
_POIS_PPM = [367879, 735758, 919698, 981011, 996340, 999405, 999916]
_NREPS = 8


def _pois_case(u_expr: str) -> str:
    """CASE expression mapping a ppm-uniform to a Poisson(1) draw."""
    branches = "".join(
        f" WHEN {u_expr} < {t} THEN {k}" for k, t in enumerate(_POIS_PPM)
    )
    return f"CASE{branches} ELSE {len(_POIS_PPM)} END"


def _boot_u(h_sql: str, rep: int) -> str:
    """ppm-uniform for replicate `rep` from the shared base hash column.

    One md5 per ROW (not per row x replicate) + a universal-family integer
    mix per replicate — the same trick as minhash_signatures; swapping the
    8 per-replicate md5s for integer mixes measured ~3x on this query.
    """
    from flow_spark.operators.dedup import MH_P, mh_coeffs

    a, b = mh_coeffs(rep + 100)  # offset: independent of the minhash family
    return f"(({a} * {h_sql} + {b}) % {MH_P}) % 1000000"


@register(
    "sample_poisson_bootstrap",
    category="sampling",
    doc=f"Online Poisson bootstrap ({_NREPS} replicates) of the mean order "
    "value: instead of resampling-with-replacement (which would shuffle "
    "the whole table per replicate), each row draws a deterministic "
    "Poisson(1) replication count per replicate from a hash-uniform — "
    "the published streaming-bootstrap trick (Poisson(1) ~ binomial"
    "(n, 1/n) resampling as n grows).  ALL replicates compute in ONE "
    "scan as 2x8 conditional integer aggregates (no row inflation; at "
    "100 TB the naive cross-join-by-replicate form 8x's the shuffle), "
    "then unpivot to one row per replicate.  Poisson draws use exact "
    "ppm CDF thresholds over ONE base hash per row + a universal-family "
    "integer mix per replicate (the minhash_signatures trick — 8x less "
    "md5); means are floor-divided cents so every value is engine-"
    "exact.  The replicate spread is the CI machinery for any metric "
    "the engine reports.",
    oracle=f"""
        WITH c AS (
            SELECT o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents,
                   {portable_hash_expr("CAST(o_orderkey AS VARCHAR)",
                                       salt="boot")} % 2147483647 AS h
            FROM orders
        ),
        agg AS (
            SELECT
    {",".join(
        f"SUM({_pois_case(_boot_u('h', r))}) AS w{r},"
        f" SUM(({_pois_case(_boot_u('h', r))}) * cents) AS s{r}"
        for r in range(_NREPS)
    )}
            FROM c
        )
        SELECT rep,
               CAST(sum_w AS BIGINT) AS sum_w,
               CAST(sum_wc AS BIGINT) AS sum_wc,
               CAST(sum_wc // sum_w AS BIGINT) AS mean_cents
        FROM (
    {" UNION ALL ".join(
        f"SELECT {r} AS rep, w{r} AS sum_w, s{r} AS sum_wc FROM agg"
        for r in range(_NREPS)
    )}
        )
        ORDER BY rep
    """,
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.queries.util import cents

    from flow_spark.operators.dedup import MH_P, mh_coeffs

    rows = load_table(spark, sf_dir, "orders").select(
        cents("o_totalprice").alias("cents"),
        F.pmod(
            portable_hash64(F.col("o_orderkey").cast("string"), salt="boot"),
            F.lit(MH_P),
        ).alias("h"),
    )
    aggs = []
    for r in range(_NREPS):
        a, b = mh_coeffs(r + 100)
        u = F.pmod(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MH_P)),
            F.lit(1_000_000),
        )
        k = F.lit(len(_POIS_PPM))
        for kk in range(len(_POIS_PPM) - 1, -1, -1):
            k = F.when(u < _POIS_PPM[kk], F.lit(kk)).otherwise(k)
        aggs.append(F.sum(k).alias(f"w{r}"))
        aggs.append(F.sum(k * F.col("cents")).alias(f"s{r}"))
    one = rows.agg(*aggs)
    stack_args = ", ".join(f"{r}, w{r}, s{r}" for r in range(_NREPS))
    return (
        one.select(
            F.expr(f"stack({_NREPS}, {stack_args}) AS (rep, sum_w, sum_wc)")
        )
        .select(
            "rep",
            F.col("sum_w").cast("bigint").alias("sum_w"),
            F.col("sum_wc").cast("bigint").alias("sum_wc"),
            F.expr("sum_wc div sum_w").cast("bigint").alias("mean_cents"),
        )
        .orderBy("rep")
    )


_BT_SCALE = 10**12  # fixed-point scale for the MM inner fractions
_BT_UNIT = 10**6  # ratings live in micro-units; w0 = 1.0 == 1_000_000


def _bt_mm_step(pairs: DataFrame, wins: DataFrame, r: DataFrame) -> DataFrame:
    """One Bradley-Terry MM update (Hunter 2004) in exact integer space.

    w_i' = W_i / sum_j n_ij / (w_i + w_j), evaluated as
    (W_i * SCALE) div sum_j ((n_ij * SCALE) div (w_i + w_j)), then
    normalized so ratings sum to n_players * UNIT.  Every division is
    floor division on positive bigints (Spark `div` == DuckDB `//`).
    """
    ri = r.select(F.col("player").alias("pi"), F.col("w").alias("wi"))
    rj = r.select(F.col("player").alias("pj"), F.col("w").alias("wj"))
    den = (
        pairs.join(F.broadcast(ri), "pi")
        .join(F.broadcast(rj), "pj")
        .select(
            "pi",
            F.expr(
                f"(n_ij * CAST({_BT_SCALE} AS BIGINT))"
                " div greatest(wi + wj, 1L)"
            ).alias("c"),
        )
        .groupBy("pi")
        .agg(F.sum("c").alias("den"))
    )
    raw = (
        wins.join(den, wins.player == den.pi)
        .select(
            "player",
            F.expr(f"(w_cnt * CAST({_BT_SCALE} AS BIGINT)) div greatest(den, 1L)").alias(
                "raw"
            ),
        )
    )
    tot = raw.agg(
        F.sum("raw").alias("tot"), F.count(F.lit(1)).alias("np")
    )
    return raw.crossJoin(F.broadcast(tot)).select(
        "player",
        F.expr(
            f"(raw * np * CAST({_BT_UNIT} AS BIGINT)) div greatest(tot, 1L)"
        ).alias("w"),
    )


def _bt_sql_step(prev: str, out: str) -> str:
    """The same MM step as chained DuckDB CTEs reading ratings `prev`."""
    return f"""
        den_{out} AS (
            SELECT p.pi,
                   SUM((p.n_ij * CAST({_BT_SCALE} AS BIGINT))
                       // greatest(ri.w + rj.w, 1)) AS den
            FROM pairs p
            JOIN {prev} ri ON ri.player = p.pi
            JOIN {prev} rj ON rj.player = p.pj
            GROUP BY p.pi
        ),
        raw_{out} AS (
            SELECT w.player,
                   (w.w_cnt * CAST({_BT_SCALE} AS BIGINT))
                       // greatest(d.den, 1) AS raw
            FROM wins w JOIN den_{out} d ON d.pi = w.player
        ),
        tot_{out} AS (SELECT SUM(raw) AS tot, COUNT(*) AS np FROM raw_{out}),
        {out} AS (
            SELECT r.player,
                   CAST((r.raw * t.np * CAST({_BT_UNIT} AS BIGINT))
                        // greatest(t.tot, 1) AS BIGINT) AS w
            FROM raw_{out} r CROSS JOIN tot_{out} t
        )"""


@register(
    "ml_bradley_terry",
    category="ml",
    doc="Bradley-Terry preference aggregation — the model behind RLHF "
    "reward-data curation and chat-arena leaderboards.  Duels derive "
    "deterministically from consecutive events with different types "
    "(higher value wins, ties to the earlier event), then TWO "
    "minorization-maximization iterations (Hunter 2004: w_i' = W_i / "
    "sum_j n_ij/(w_i+w_j)) run entirely in fixed-point bigint "
    "arithmetic — every division is floor division on positives, so "
    "Spark and DuckDB agree bit-for-bit with no float anywhere.  Plan "
    "shape at 100 TB: the duel extraction is one sort-merge self-join "
    "on a monotone key + one map-side-combinable groupBy; the model "
    "state (one row per arm) travels as a broadcast through the MM "
    "joins — the same tiny-model/big-data split as the perceptron.",
    oracle=f"""
        WITH a AS (
            SELECT event_id AS id, event_type AS pa, value AS va FROM events
        ),
        b AS (
            SELECT event_id - 1 AS id, event_type AS pb, value AS vb
            FROM events
        ),
        m AS (
            SELECT CASE WHEN va >= vb THEN pa ELSE pb END AS winner,
                   pa, pb
            FROM a JOIN b USING (id)
            WHERE pa <> pb
        ),
        wins AS (
            SELECT p.player, COUNT(m2.winner) AS w_cnt
            FROM (SELECT DISTINCT event_type AS player FROM events) p
            LEFT JOIN m m2 ON m2.winner = p.player
            GROUP BY p.player
        ),
        pairs AS (
            SELECT pi, pj, COUNT(*) AS n_ij FROM (
                SELECT pa AS pi, pb AS pj FROM m
                UNION ALL
                SELECT pb AS pi, pa AS pj FROM m
            ) GROUP BY pi, pj
        ),
        r0 AS (
            SELECT player, CAST({_BT_UNIT} AS BIGINT) AS w FROM wins
        ),{_bt_sql_step("r0", "r1")},{_bt_sql_step("r1", "r2")}
        SELECT w.player,
               CAST(w.w_cnt AS BIGINT) AS wins,
               CAST(COALESCE(nm.n, 0) AS BIGINT) AS n_matches,
               r1.w AS rating_iter1,
               r2.w AS rating_iter2
        FROM wins w
        JOIN r1 ON r1.player = w.player
        JOIN r2 ON r2.player = w.player
        LEFT JOIN (SELECT pi, SUM(n_ij) AS n FROM pairs GROUP BY pi) nm
               ON nm.pi = w.player
        ORDER BY w.player
    """,
)
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    a = e.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("pa"),
        F.col("value").alias("va"),
    )
    b = e.select(
        (F.col("event_id") - 1).alias("id"),
        F.col("event_type").alias("pb"),
        F.col("value").alias("vb"),
    )
    m = (
        a.join(b, "id")
        .filter(F.col("pa") != F.col("pb"))
        .select(
            F.when(F.col("va") >= F.col("vb"), F.col("pa"))
            .otherwise(F.col("pb"))
            .alias("winner"),
            "pa",
            "pb",
        )
        .localCheckpoint()  # duels feed wins + pairs; don't rescan events
    )
    players = e.select(F.col("event_type").alias("player")).distinct()
    wins = (
        players.join(m, players.player == m.winner, "left")
        .groupBy("player")
        .agg(F.count("winner").cast("bigint").alias("w_cnt"))
    )
    pairs = (
        m.select(F.col("pa").alias("pi"), F.col("pb").alias("pj"))
        .unionAll(m.select(F.col("pb").alias("pi"), F.col("pa").alias("pj")))
        .groupBy("pi", "pj")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    )
    r0 = wins.select("player", F.lit(_BT_UNIT).cast("bigint").alias("w"))
    r1 = _bt_mm_step(pairs, wins, r0).localCheckpoint()
    r2 = _bt_mm_step(pairs, wins, r1)
    n_matches = pairs.groupBy("pi").agg(F.sum("n_ij").alias("n"))
    return (
        wins.join(r1.withColumnRenamed("w", "rating_iter1"), "player")
        .join(r2.withColumnRenamed("w", "rating_iter2"), "player")
        .join(n_matches, wins.player == n_matches.pi, "left")
        .select(
            "player",
            F.col("w_cnt").alias("wins"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_matches"),
            F.col("rating_iter1").cast("bigint"),
            F.col("rating_iter2").cast("bigint"),
        )
        .orderBy("player")
    )


_MW_ROUNDS = 3
#: argmin key: err * 256 + bucket * 2 + polarity-bit — one scalar so both
#: engines break ties identically (smallest bucket, then pol=+1 first)
_MW_KEY = 256


def _mw_round(
    presence: DataFrame, wt: DataFrame
) -> "tuple[tuple[int, int, int], DataFrame]":
    """One boosting round: pick the min-weighted-error presence stump,
    double the weights of the docs it misclassifies.

    Returns ((b, pol, err) as plain ints, updated weights DataFrame).
    The winner is a 1-ROW aggregate, so it follows the repo's
    tiny-model-to-driver pattern (sample_temperature_mix, PQ codebooks):
    collect it and re-broadcast as LITERALS — per-round localCheckpoints
    of a 1-row frame cost more than the whole round (measured 19 s ->
    6 s on this query at sf0.001), and literal predicates keep the
    weight-update lineage shallow enough to skip checkpointing entirely.
    """
    tot = wt.agg(
        F.sum(F.when(F.col("y") == 1, F.col("w")).otherwise(F.lit(0))).alias("tp"),
        F.sum(F.when(F.col("y") == -1, F.col("w")).otherwise(F.lit(0))).alias("tn"),
    )
    per_b = (
        presence.join(wt, ["doc_id", "y"])
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("y") == 1, F.col("w")).otherwise(F.lit(0))).alias("sp"),
            F.sum(F.when(F.col("y") == -1, F.col("w")).otherwise(F.lit(0))).alias("sn"),
        )
    )
    errs = per_b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("pol"),
                    (F.col("sn") + F.col("tp") - F.col("sp")).alias("err"),
                ),
                F.struct(
                    F.lit(-1).alias("pol"),
                    (F.col("sp") + F.col("tn") - F.col("sn")).alias("err"),
                ),
            )
        ).alias("e"),
    ).select("bucket", "e.pol", "e.err")
    row = (
        errs.agg(
            F.expr(
                f"min_by(struct(bucket AS b, pol, err), "
                f"err * {_MW_KEY} + bucket * 2 + if(pol = 1, 0, 1))"
            ).alias("c")
        )
        .select("c.b", "c.pol", "c.err")
        .collect()[0]
    )
    b, pol, err = int(row.b), int(row.pol), int(row.err)
    pres_b = presence.filter(F.col("bucket") == b).select(
        "doc_id", F.lit(1).alias("present")
    )
    upd = wt.join(pres_b, "doc_id", "left").select(
        "doc_id",
        "y",
        # stump prediction = pol * (present ? 1 : -1); double on mistake
        F.when(
            F.lit(pol) * F.when(F.col("present").isNotNull(), 1).otherwise(-1)
            != F.col("y"),
            F.col("w") * 2,
        )
        .otherwise(F.col("w"))
        .alias("w"),
    )
    return (b, pol, err), upd


def _mw_sql_round(prev_w: str, r: int) -> str:
    """DuckDB CTEs for round r reading weights `prev_w`."""
    return f"""
        tot_{r} AS MATERIALIZED (
            SELECT SUM(CASE WHEN y = 1 THEN w ELSE 0 END) AS tp,
                   SUM(CASE WHEN y = -1 THEN w ELSE 0 END) AS tn
            FROM {prev_w}
        ),
        perb_{r} AS MATERIALIZED (
            SELECT p.bucket,
                   SUM(CASE WHEN v.y = 1 THEN v.w ELSE 0 END) AS sp,
                   SUM(CASE WHEN v.y = -1 THEN v.w ELSE 0 END) AS sn
            FROM presence p JOIN {prev_w} v USING (doc_id, y)
            GROUP BY p.bucket
        ),
        errs_{r} AS MATERIALIZED (
            SELECT bucket, 1 AS pol, sn + tp - sp AS err
            FROM perb_{r} CROSS JOIN tot_{r}
            UNION ALL
            SELECT bucket, -1, sp + tn - sn
            FROM perb_{r} CROSS JOIN tot_{r}
        ),
        ch_{r} AS MATERIALIZED (
            SELECT arg_min(bucket, err * {_MW_KEY} + bucket * 2
                           + CASE WHEN pol = 1 THEN 0 ELSE 1 END) AS b,
                   arg_min(pol, err * {_MW_KEY} + bucket * 2
                           + CASE WHEN pol = 1 THEN 0 ELSE 1 END) AS pol,
                   MIN(err * {_MW_KEY} + bucket * 2
                       + CASE WHEN pol = 1 THEN 0 ELSE 1 END)
                       // {_MW_KEY} AS err
            FROM errs_{r}
        ),
        w{r} AS MATERIALIZED (
            SELECT v.doc_id, v.y,
                   CASE WHEN c.pol * (CASE WHEN p.doc_id IS NOT NULL
                                           THEN 1 ELSE -1 END) <> v.y
                        THEN v.w * 2 ELSE v.w END AS w
            FROM {prev_w} v
            CROSS JOIN ch_{r} c
            LEFT JOIN (SELECT DISTINCT pr.doc_id, ch_{r}.b
                       FROM presence pr, ch_{r}
                       WHERE pr.bucket = ch_{r}.b) p
                   ON p.doc_id = v.doc_id
        )"""


@register(
    "ml_boosting_mw",
    category="ml",
    doc=f"Boosting with multiplicative weights ({_MW_ROUNDS} rounds): each "
    "round scores ALL 66 presence stumps ('is-English iff bucket b "
    "(not) in doc') by weighted error in ONE groupBy — err(b,+1) = "
    "s_neg(b) + (tot_pos - s_pos(b)), so per-bucket sums + two global "
    "totals price the whole learner family, no per-learner pass — "
    "picks the argmin by one scalar key, and DOUBLES the weights the "
    "winner misclassifies (beta=1/2 multiplicative-weights boosting: "
    "all-integer, unlike AdaBoost's exp(alpha) reweighting, so both "
    "engines replay it bit-for-bit).  Output: per-round chosen stump + "
    "weighted error, plus the 3-vote majority ensemble's training "
    "errors (odd vote count -> no ties).  Plan shape at 100 TB: the "
    "presence matrix is the only big table; each round is one shuffle "
    "over it keyed by bucket + a broadcast of the 1-row winner — the "
    "same tiny-model/big-data split as the perceptron.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
                   unnest({_SQL_TOKS}) AS tok
            FROM documents
        ),
        presence AS MATERIALIZED (
            SELECT DISTINCT doc_id, y,
                   {portable_hash_expr("tok", salt="pcp")} % {_B} AS bucket
            FROM toks WHERE len(tok) > 0
            UNION
            SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END, {_B}
            FROM documents
        ),
        w0 AS MATERIALIZED (
            SELECT DISTINCT doc_id, y, CAST(1 AS BIGINT) AS w FROM presence
        ),
        {",".join(_mw_sql_round(f"w{r - 1}", r) for r in range(1, _MW_ROUNDS + 1))},
        votes AS (
            SELECT v.doc_id, v.y,
                   {" + ".join(
                       f"(SELECT pol FROM ch_{r})"
                       f" * (CASE WHEN p{r}.doc_id IS NOT NULL"
                       f"     THEN 1 ELSE -1 END)"
                       for r in range(1, _MW_ROUNDS + 1)
                   )} AS vote
            FROM w0 v
            {" ".join(
                f"LEFT JOIN (SELECT DISTINCT pr.doc_id FROM presence pr, ch_{r} c"
                f" WHERE pr.bucket = c.b) p{r} ON p{r}.doc_id = v.doc_id"
                for r in range(1, _MW_ROUNDS + 1)
            )}
        ),
        ens AS (
            SELECT COUNT(*) FILTER (WHERE (CASE WHEN vote > 0 THEN 1 ELSE -1 END)
                                          <> y) AS n_mis
            FROM votes
        )
        SELECT r AS round,
               CAST(b AS BIGINT) AS bucket,
               CAST(pol AS BIGINT) AS pol,
               CAST(err AS BIGINT) AS err_weighted,
               (SELECT CAST(n_mis AS BIGINT) FROM ens) AS ensemble_mis
        FROM (
            {" UNION ALL ".join(
                f"SELECT {r} AS r, b, pol, err FROM ch_{r}"
                for r in range(1, _MW_ROUNDS + 1)
            )}
        )
        ORDER BY round
    """,
)
def ml_boosting_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    presence = (
        _features(spark, sf_dir)
        .select("doc_id", "y", "bucket")
        .distinct()
        .localCheckpoint()  # every round and the final vote rescan it
    )
    wt = presence.select("doc_id", "y").distinct().withColumn(
        "w", F.lit(1).cast("bigint")
    )
    rounds: list[tuple[int, int, int]] = []
    for _ in range(_MW_ROUNDS):
        chosen, wt = _mw_round(presence, wt)
        rounds.append(chosen)
    # 3-vote majority ensemble training error (chosen stumps as literals)
    votes = presence.select("doc_id", "y").distinct()
    for i, (b, pol, _err) in enumerate(rounds):
        pres_b = presence.filter(F.col("bucket") == b).select(
            "doc_id", F.lit(1).alias(f"p{i}")
        )
        votes = votes.join(pres_b, "doc_id", "left").withColumn(
            f"v{i}",
            F.lit(pol) * F.when(F.col(f"p{i}").isNotNull(), 1).otherwise(-1),
        )
    ens = votes.select(
        F.when(
            F.when(
                sum(F.col(f"v{i}") for i in range(_MW_ROUNDS)) > 0, 1
            ).otherwise(-1)
            != F.col("y"),
            1,
        )
        .otherwise(0)
        .alias("mis")
    ).agg(F.sum("mis").cast("bigint").alias("n_mis"))
    out = spark.createDataFrame(
        [(r, b, pol, err) for r, (b, pol, err) in enumerate(rounds, start=1)],
        "round int, bucket long, pol long, err_weighted long",
    )
    return (
        out.crossJoin(F.broadcast(ens))
        .select("round", "bucket", "pol", "err_weighted",
                F.col("n_mis").alias("ensemble_mis"))
        .orderBy("round")
    )


_TS_LCM = 27720  # lcm(1..12): clears every pair-gap denominator exactly
_TS_MAXGAP = 12


@register(
    "ml_theil_sen",
    category="ml",
    doc="Theil-Sen robust trend per quarter of 1996: daily revenue "
    f"series, pairwise slopes over day gaps 1..{_TS_MAXGAP}, estimator "
    "= MEDIAN slope.  The novelty is ordering slopes EXACTLY: slope "
    f"dy/g maps to the integer key dy * ({_TS_LCM} / g) (lcm of all "
    "gaps clears the denominator), so the median pick is an integer "
    "sort + row_number — no float division ever enters the ordering, "
    "where near-tied rational slopes would flip ranks across engines.  "
    "Output: per-quarter pair count, the median slope in micro-cents/"
    "day (key * 1e6 // lcm), and the median pair's (day, gap, dy) "
    "witness.  Plan shape at 100 TB: the banded self-join is gap-"
    "bounded (each day joins <= 12 partners — the interval-bucket "
    "trick of scale_bucketed_range_join applies verbatim if days "
    "become billions of device-series keys); the median is one "
    "window pass per group.",
    oracle=f"""
        WITH daily AS (
            SELECT datediff('day', DATE '1996-01-01',
                            CAST(o_orderdate AS DATE)) AS d,
                   CAST(quarter(o_orderdate) AS BIGINT) AS q,
                   SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT)) AS y
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT a.q, a.d, b.d - a.d AS g, b.y - a.y AS dy,
                   (b.y - a.y) * ({_TS_LCM} // (b.d - a.d)) AS key
            FROM daily a JOIN daily b
              ON a.q = b.q AND b.d - a.d BETWEEN 1 AND {_TS_MAXGAP}
        ),
        ranked AS (
            SELECT q, d, g, dy, key,
                   ROW_NUMBER() OVER (PARTITION BY q
                                      ORDER BY key, d, g) AS rn,
                   COUNT(*) OVER (PARTITION BY q) AS n
            FROM pairs
        )
        SELECT q AS quarter,
               CAST(n AS BIGINT) AS n_pairs,
               CAST(key * 1000000 // {_TS_LCM} AS BIGINT)
                   AS median_slope_micro,
               CAST(d AS BIGINT) AS witness_day,
               CAST(g AS BIGINT) AS witness_gap,
               CAST(dy AS BIGINT) AS witness_dy
        FROM ranked WHERE rn = (n + 1) // 2
        ORDER BY quarter
    """,
)
def ml_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.queries.util import cents

    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1996-01-01").cast("date")).alias("d"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
    ).agg(F.sum(cents("o_totalprice")).alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.q") == F.col("b.q"))
        & (F.col("b.d") - F.col("a.d")).between(1, _TS_MAXGAP),
    ).select(
        F.col("a.q").alias("q"),
        F.col("a.d").alias("d"),
        (F.col("b.d") - F.col("a.d")).alias("g"),
        (F.col("b.y") - F.col("a.y")).alias("dy"),
        (
            (F.col("b.y") - F.col("a.y"))
            * F.expr(f"{_TS_LCM} div (b.d - a.d)")
        ).alias("key"),
    )
    wq = W.partitionBy("q")
    ranked = pairs.withColumn(
        "rn", F.row_number().over(wq.orderBy("key", "d", "g"))
    ).withColumn("n", F.count(F.lit(1)).over(wq))
    return (
        ranked.filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            F.col("q").alias("quarter"),
            F.col("n").cast("bigint").alias("n_pairs"),
            F.expr(f"(key * 1000000) div {_TS_LCM}")
            .cast("bigint")
            .alias("median_slope_micro"),
            F.col("d").cast("bigint").alias("witness_day"),
            F.col("g").cast("bigint").alias("witness_gap"),
            F.col("dy").cast("bigint").alias("witness_dy"),
        )
        .orderBy("quarter")
    )
