"""Flow pipeline semantics as oracle-checkable batch queries over `events`.

Each query drives a real operator from flow_spark.operators (router,
replicator, mux, throttler, buffer, codecs, status fold) — the oracle SQL
restates the *semantics* independently, so parity checks the operator
contract, not the implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash64, portable_hash_expr
from flow_spark.operators.message import events_to_messages
from flow_spark.operators.routing import mux, replicate, route
from flow_spark.operators.status import buffer_outcome, composite_fold
from flow_spark.operators.throttler import throttle_batch
from flow_spark.queries.registry import register

ROUTES = ["click", "purchase", "signup"]  # known peers; view/error -> unroutable


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_to_messages(load_table(spark, sf_dir, "events"))


@register(
    "pipe_router",
    category="pipeline",
    doc="Content-based router (actor/router.go:67-75): meta['sendto'] picks "
    "the peer; unknown -> unroutable. Counted per destination.",
    oracle=f"""
        SELECT CASE WHEN event_type IN ('click','purchase','signup')
                    THEN event_type ELSE '<unroutable>' END AS destination,
               CASE WHEN event_type IN ('click','purchase','signup')
                    THEN 'routed' ELSE 'unroutable' END     AS route_status,
               COUNT(*) AS n
        FROM events
        GROUP BY 1, 2
        ORDER BY destination
    """,
)
def pipe_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = route(_messages(spark, sf_dir), ROUTES)
    return (
        routed.groupBy(
            F.coalesce("destination", F.lit("<unroutable>")).alias("destination"),
            "route_status",
        )
        .agg(F.count("*").alias("n"))
        .orderBy("destination")
    )


@register(
    "pipe_mux",
    category="pipeline",
    doc="Fan-in N->1 (actor/mux.go:56-59): union of two routed sub-streams.",
    oracle="""
        SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM events
        WHERE event_type IN ('click', 'purchase')
    """,
)
def pipe_mux(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = _messages(spark, sf_dir)
    clicks = msgs.filter(F.col("meta").getItem("sendto") == "click")
    purchases = msgs.filter(F.col("meta").getItem("sendto") == "purchase")
    return mux(clicks, purchases).agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum("event_id").cast("bigint").alias("id_sum"),
    )


@register(
    "pipe_replicator_each",
    category="pipeline",
    doc="Replicator mode 'each' (replicator.go:93-95): copy to all peers.",
    oracle="""
        SELECT s.sink, COUNT(*) AS n, CAST(SUM(e.event_id) AS BIGINT) AS id_sum
        FROM events e CROSS JOIN (SELECT UNNEST(['sink_a','sink_b','sink_c']) AS sink) s
        GROUP BY s.sink ORDER BY s.sink
    """,
)
def pipe_replicator_each(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = replicate(_messages(spark, sf_dir), ["sink_a", "sink_b", "sink_c"], mode="each")
    return (
        rep.groupBy("sink")
        .agg(F.count("*").alias("n"), F.sum("event_id").cast("bigint").alias("id_sum"))
        .orderBy("sink")
    )


@register(
    "pipe_replicator_fanout",
    category="pipeline",
    doc="Replicator mode 'fanout' (replicator.go:72-83): keyed round-robin, "
    "one peer per message (deterministic pmod rotation, SURVEY §4.2.4).",
    oracle="""
        SELECT ['sink_a','sink_b','sink_c'][CAST(event_id % 3 AS INT) + 1] AS sink,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY sink
    """,
)
def pipe_replicator_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = replicate(_messages(spark, sf_dir), ["sink_a", "sink_b", "sink_c"], mode="fanout")
    return rep.groupBy("sink").agg(F.count("*").alias("n")).orderBy("sink")


@register(
    "pipe_replicator_rand",
    category="pipeline",
    doc="Replicator mode 'rand' (replicator.go:85-87): one pseudo-random "
    "peer, deterministic via the portable md5 hash so it's oracle-checkable.",
    oracle=f"""
        SELECT ['sink_a','sink_b','sink_c'][
                   CAST({portable_hash_expr("CAST(event_id AS VARCHAR)", salt="rand")} % 3 AS INT) + 1
               ] AS sink,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY sink
    """,
)
def pipe_replicator_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    rep = replicate(_messages(spark, sf_dir), ["sink_a", "sink_b", "sink_c"], mode="rand")
    return rep.groupBy("sink").agg(F.count("*").alias("n")).orderBy("sink")


@register(
    "pipe_composite_status",
    category="pipeline",
    doc="Composite delivery-status fold (replicator.go:123-146): replicate "
    "to 3 sinks, derive deterministic per-copy outcomes, fold to one verdict "
    "per message; verdict histogram.",
    oracle=f"""
        WITH copies AS (
            SELECT e.event_id, s.sink,
                   {portable_hash_expr("concat(CAST(e.event_id AS VARCHAR), ':', s.sink)", salt="dlv")} % 10 AS h
            FROM events e
            CROSS JOIN (SELECT UNNEST(['sink_a','sink_b','sink_c']) AS sink) s
        ), results AS (
            SELECT event_id,
                   CASE WHEN h < 7 THEN 'done'
                        WHEN h < 8 THEN 'timed_out'
                        ELSE 'failed' END AS status
            FROM copies
        ), folded AS (
            SELECT event_id,
                   CASE WHEN SUM(CASE WHEN status='done' THEN 1 ELSE 0 END) = COUNT(*) THEN 'done'
                        WHEN SUM(CASE WHEN status='done' THEN 1 ELSE 0 END) > 0 THEN 'partial_send'
                        WHEN SUM(CASE WHEN status='timed_out' THEN 1 ELSE 0 END) > 0 THEN 'timed_out'
                        ELSE 'failed' END AS status
            FROM results GROUP BY event_id
        )
        SELECT status, COUNT(*) AS n FROM folded GROUP BY status ORDER BY status
    """,
)
def pipe_composite_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    copies = replicate(_messages(spark, sf_dir), ["sink_a", "sink_b", "sink_c"], mode="each")
    h = F.pmod(
        portable_hash64(
            F.concat(F.col("event_id").cast("string"), F.lit(":"), F.col("sink")), salt="dlv"
        ),
        F.lit(10),
    )
    results = copies.select(
        "event_id",
        "sink",
        F.when(h < 7, "done").when(h < 8, "timed_out").otherwise("failed").alias("status"),
    )
    return (
        composite_fold(results)
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )


@register(
    "pipe_throttler",
    category="pipeline",
    doc="Throttler (actor/throttler.go:126-147): per-user 2 msg/sec windowed "
    "admission; over-limit -> throttled. Batch GCRA approximation.",
    oracle="""
        WITH ranked AS (
            SELECT user_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('second', CAST(ts AS TIMESTAMP))
                                      ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC) AS rn
            FROM events
        )
        SELECT CASE WHEN rn <= 2 THEN 'admitted' ELSE 'throttled' END AS throttle_status,
               COUNT(*) AS n
        FROM ranked GROUP BY 1 ORDER BY throttle_status
    """,
)
def pipe_throttler(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    msgs = events_to_messages(ev)
    throttled = throttle_batch(
        msgs, rps=2, ts_col="ingest_ts", key=F.col("meta").getItem("user")
    )
    return (
        throttled.groupBy("throttle_status").agg(F.count("*").alias("n")).orderBy(
            "throttle_status"
        )
    )


@register(
    "pipe_buffer_retry",
    category="pipeline",
    doc="Buffer bounded retry (actor/buffer.go:60-82): deterministic "
    "fail-rounds per message; <=16 attempts then failed. Histogram of "
    "attempts and final status.",
    oracle=f"""
        WITH msgs AS (
            SELECT event_id,
                   {portable_hash_expr("CAST(event_id AS VARCHAR)", salt="buf")} % 20 AS fail_rounds
            FROM events
        )
        SELECT CASE WHEN fail_rounds < 16 THEN 'done' ELSE 'failed' END AS buf_status,
               CAST(CASE WHEN fail_rounds < 16 THEN fail_rounds + 1 ELSE 16 END AS INT) AS attempts,
               COUNT(*) AS n
        FROM msgs
        GROUP BY 1, 2 ORDER BY buf_status, attempts
    """,
)
def pipe_buffer_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = _messages(spark, sf_dir).withColumn(
        "fail_rounds",
        F.pmod(portable_hash64(F.col("event_id").cast("string"), salt="buf"), F.lit(20)),
    )
    out = buffer_outcome(msgs, "fail_rounds")
    return (
        out.groupBy("buf_status", "attempts")
        .agg(F.count("*").alias("n"))
        .orderBy("buf_status", "attempts")
    )


@register(
    "pipe_meta_parser",
    category="pipeline",
    doc="Meta parser (x/meta_parser.go:72-88): querystring head -> meta, "
    "remainder -> body; exploded to (key, value) rows for comparison.",
    oracle="""
        SELECT doc_id, 'dlang' AS k, lang AS v FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, 'dsrc' AS k, source AS v FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, 'rest_head' AS k, split_part(text, ' ', 1) AS v
        FROM documents WHERE doc_id % 7 = 0
        ORDER BY doc_id, k
    """,
)
def pipe_meta_parser(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.codecs import parse_meta

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    framed = docs.select(
        "doc_id",
        F.concat(
            F.lit("dlang="), F.col("lang"), F.lit("&dsrc="), F.col("source"), F.lit(" "),
            F.col("text"),
        ).alias("body_str"),
        F.create_map().cast("map<string,string>").alias("meta"),
    )
    parsed = parse_meta(framed)
    pairs = parsed.select(
        "doc_id",
        F.explode(
            F.map_concat(
                F.col("meta"),
                F.create_map(
                    F.lit("rest_head"), F.split_part(F.col("body_str"), F.lit(" "), F.lit(1))
                ),
            )
        ).alias("k", "v"),
    )
    return pairs.orderBy("doc_id", "k")


@register(
    "pipe_codec_base64",
    category="pipeline",
    doc="Base64 codec round trip (x/encoder_base64.go, x/decoder_base64.go): "
    "encode body, decode back, verify identity; invalid input -> null.",
    oracle="""
        SELECT doc_id,
               base64(encode(substr(text, 1, 40))) AS b64,
               TRUE AS roundtrip_ok
        FROM documents WHERE doc_id % 5 = 0
        ORDER BY doc_id
    """,
)
def pipe_codec_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.codecs import decode_base64, encode_base64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    body = F.substring("text", 1, 40).cast("binary")
    enc = docs.select("doc_id", encode_base64(body).alias("b64"), body.alias("orig"))
    return enc.select(
        "doc_id",
        "b64",
        (decode_base64(F.col("b64")) == F.col("orig")).alias("roundtrip_ok"),
    ).orderBy("doc_id")


@register(
    "pipe_codec_compress",
    category="pipeline",
    doc="Compressor (actor/compressor.go): gzip+zlib round trip via Arrow "
    "Pandas UDF; lossless-ness is the oracle-checkable contract (compressed "
    "bytes are library-specific).",
    oracle="""
        SELECT doc_id,
               TRUE AS gzip_ok,
               TRUE AS zlib_ok,
               length(text) AS orig_len
        FROM documents WHERE doc_id % 10 = 0
        ORDER BY doc_id
    """,
)
def pipe_codec_compress(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.codecs import compress, decompress

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    body = F.col("text").cast("binary")
    stage = docs.select(
        "doc_id",
        body.alias("orig"),
        compress(body, "gzip").alias("gz"),
        compress(body, "zlib").alias("zl"),
        F.length("text").alias("orig_len"),
    )
    return stage.select(
        "doc_id",
        (decompress(F.col("gz"), "gzip") == F.col("orig")).alias("gzip_ok"),
        (decompress(F.col("zl"), "zlib") == F.col("orig")).alias("zlib_ok"),
        "orig_len",
    ).orderBy("doc_id")


@register(
    "pipe_yaml_end_to_end",
    category="pipeline",
    doc="Full YAML pipeline compiled to one DataFrame graph: events "
    "receiver -> content router (clicks / purchases) -> replicator 'each' "
    "doubling purchases to two sinks; delivery statuses folded per "
    "(sink, status). Mirrors a complete flowd topology "
    "(pipeline/pipeline.go:120-155) as a single oracle-checkable query.",
    oracle="""
        WITH delivery AS (
            SELECT event_id, 'sink_click' AS sink, 'done' AS status
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT event_id, 'sink_p1', 'done' FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT event_id, 'sink_p2', 'done' FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT event_id, 'route', 'unroutable'
            FROM events WHERE event_type NOT IN ('click', 'purchase')
        )
        SELECT sink, status, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM delivery GROUP BY sink, status
        ORDER BY sink, status
    """,
)
def pipe_yaml_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.plans.builder import Pipeline

    yaml_text = f"""
actors:
  ingest:
    module: core.receiver
    params:
      bind: events://{sf_dir}
  route:
    module: core.router
  click:
    module: core.mux
  purchase:
    module: core.replicator
    params:
      mode: each
  sink_click:
    module: core.sink
  sink_p1:
    module: core.sink
  sink_p2:
    module: core.sink
pipeline:
  ingest:
    connect: [route]
  route:
    connect: [click, purchase]
  click:
    connect: [sink_click]
  purchase:
    connect: [sink_p1, sink_p2]
  sink_click:
  sink_p1:
  sink_p2:
"""
    res = Pipeline.from_yaml(spark, yaml_text).run()
    return (
        res.delivery.groupBy("sink", "status")
        .agg(F.count("*").alias("n"), F.sum("event_id").cast("bigint").alias("id_sum"))
        .orderBy("sink", "status")
    )


@register(
    "pipe_dead_letter",
    category="pipeline",
    doc="Dead-letter queue: messages failing validation gates (unknown "
    "event type, negative value, oversized payload) divert to a DLQ "
    "with a deterministic failure reason (FIRST failing gate in a "
    "declared order — one CASE cascade, single pass) instead of "
    "killing the pipeline; healthy rows continue.  The output is the "
    "DLQ census by reason plus the delivered count — the "
    "poison-message pattern every 100 TB ingest needs, expressed as "
    "one filter split (no UDF, no exceptions as control flow).",
    oracle="""
        WITH dirty AS (
            -- deterministic fault injection (fixture data is clean):
            -- every 13th event gets a bogus type, every 17th a negated
            -- value, every 19th oversized props
            SELECT event_id,
                   CASE WHEN event_id % 13 = 0 THEN 'mystery'
                        ELSE event_type END AS event_type,
                   CASE WHEN event_id % 17 = 0 THEN -value
                        ELSE value END AS value,
                   CASE WHEN event_id % 19 = 0 THEN repeat(props, 8)
                        ELSE props END AS props
            FROM events
        ),
        gated AS (
            SELECT event_id,
                   CASE
                     WHEN event_type NOT IN
                          ('view','click','purchase','signup','error')
                          THEN 'unknown_type'
                     WHEN value < 0 THEN 'negative_value'
                     WHEN length(props) > 40 THEN 'oversized_props'
                     ELSE 'ok'
                   END AS reason
            FROM dirty
        )
        SELECT reason, COUNT(*) AS n,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM gated
        GROUP BY reason
        ORDER BY reason
    """,
)
def pipe_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = load_table(spark, sf_dir, "events")
    ev = raw.select(
        "event_id",
        F.when(F.col("event_id") % 13 == 0, F.lit("mystery"))
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(F.col("event_id") % 17 == 0, -F.col("value"))
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(F.col("event_id") % 19 == 0, F.repeat(F.col("props"), 8))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    known = F.col("event_type").isin(
        "view", "click", "purchase", "signup", "error"
    )
    reason = (
        F.when(~known, F.lit("unknown_type"))
        .when(F.col("value") < 0, F.lit("negative_value"))
        .when(F.length("props") > 40, F.lit("oversized_props"))
        .otherwise(F.lit("ok"))
    )
    return (
        ev.select("event_id", reason.alias("reason"))
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("reason")
    )
