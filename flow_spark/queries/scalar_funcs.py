"""Scalar-function coverage: string, date/time, math, array, map, JSON,
conditional — the §2.2 function groups, each checked against DuckDB.

Reference analogues: the meta parser's querystring split
(/root/reference/pkg/corev1alpha1/x/meta_parser.go:72-88) and base64 codecs
(x/encoder_base64.go, x/decoder_base64.go) are covered in
``pipeline_semantics``; this module is the general function battery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register


@register(
    "fn_string",
    category="string-fn",
    doc="length/lower/upper/substr/concat_ws/replace/split_part/levenshtein/trim.",
    oracle="""
        SELECT doc_id,
               LENGTH(text)                                   AS n_len,
               UPPER(SUBSTR(text, 1, 10))                     AS head_upper,
               LOWER(source)                                  AS src_lower,
               CONCAT_WS('|', lang, source)                   AS lang_src,
               REPLACE(SUBSTR(text, 1, 20), ' ', '_')         AS head_snake,
               SPLIT_PART(text, ' ', 1)                       AS first_word,
               LEVENSHTEIN(lang, 'en')                        AS lev_en,
               LENGTH(TRIM(text))                             AS n_trim
        FROM documents
        ORDER BY doc_id
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_len"),
            F.upper(F.substring("text", 1, 10)).alias("head_upper"),
            F.lower("source").alias("src_lower"),
            F.concat_ws("|", "lang", "source").alias("lang_src"),
            F.replace(F.substring("text", 1, 20), F.lit(" "), F.lit("_")).alias("head_snake"),
            F.split_part(F.col("text"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.levenshtein("lang", F.lit("en")).alias("lev_en"),
            F.length(F.trim("text")).alias("n_trim"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_regexp",
    category="string-fn",
    doc="regexp_extract / regexp_replace / rlike filter.",
    oracle="""
        SELECT doc_id,
               REGEXP_EXTRACT(source, '([0-9]+)', 1)               AS src_num,
               LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g'))    AS n_novowel
        FROM documents
        WHERE REGEXP_MATCHES(text, 'join|merge')
        ORDER BY doc_id
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike("join|merge"))
        .select(
            "doc_id",
            F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
            F.length(F.regexp_replace("text", "[aeiou]", "")).alias("n_novowel"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_datetime",
    category="date-fn",
    doc="year/month/day/hour, date_trunc, datediff, date_add, unix epoch.",
    oracle="""
        SELECT o_orderkey,
               YEAR(o_orderdate)  AS y,
               MONTH(o_orderdate) AS m,
               DAY(o_orderdate)   AS d,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               datediff('day', o_orderdate, TIMESTAMP '2002-01-01')   AS days_to_2002,
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus_30d,
               CAST(epoch(o_orderdate) AS BIGINT)                     AS epoch_s
        FROM orders
        WHERE o_orderkey % 100 = 0
        ORDER BY o_orderkey
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate")).alias(
                "days_to_2002"
            ),
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
                "plus_30d"
            ),
            F.unix_timestamp("o_orderdate").alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_math",
    category="math-fn",
    doc="abs/round/floor/ceil/sqrt/pow/ln/exp/pmod/sign/least/greatest.",
    oracle="""
        SELECT p_partkey,
               ABS(p_size - 25)                              AS dist25,
               ROUND(p_retailprice / 7, 3)                   AS div7,
               CAST(FLOOR(p_retailprice) AS BIGINT)          AS fl,
               CAST(CEIL(p_retailprice) AS BIGINT)           AS ce,
               ROUND(SQRT(p_size), 4)                        AS root,
               ROUND(POW(p_size, 2), 1)                      AS sq,
               ROUND(LN(p_retailprice), 4)                   AS lnp,
               ((p_size % 7) + 7) % 7                        AS pmod7,
               SIGN(p_size - 25)                             AS sgn,
               LEAST(p_size, 25)                             AS lo,
               GREATEST(p_size, 25)                          AS hi
        FROM part
        ORDER BY p_partkey
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.abs(F.col("p_size") - 25).alias("dist25"),
            F.round(F.col("p_retailprice") / 7, 3).alias("div7"),
            F.floor("p_retailprice").alias("fl"),
            F.ceil("p_retailprice").alias("ce"),
            F.round(F.sqrt("p_size"), 4).alias("root"),
            F.round(F.pow("p_size", F.lit(2)), 1).alias("sq"),
            F.round(F.log("p_retailprice"), 4).alias("lnp"),
            F.pmod(F.col("p_size"), F.lit(7)).alias("pmod7"),
            F.signum(F.col("p_size") - 25).cast("double").alias("sgn"),
            F.least("p_size", F.lit(25)).alias("lo"),
            F.greatest("p_size", F.lit(25)).alias("hi"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_array",
    category="array-fn",
    doc="array size/element_at/filter/transform/aggregate over embeddings.",
    oracle="""
        SELECT vec_id,
               len(embedding)                                    AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 4)            AS first_val,
               len(list_filter(embedding, x -> x > 0))           AS n_pos,
               ROUND(list_sum(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
        FROM embeddings
        WHERE vec_id % 10 = 0
        ORDER BY vec_id
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_val"),
            F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
            F.round(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                ),
                4,
            ).alias("sq_norm"),
        )
        .orderBy("vec_id")
    )


@register(
    "fn_json",
    category="json-fn",
    doc="get_json_object / from_json over the events.props JSON column.",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        FROM events
        WHERE event_id % 10 = 0
        ORDER BY event_id
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_variant_semistructured",
    category="json-fn",
    doc="Spark 4 VARIANT type (open-schema semi-structured columns): "
    "each event builds a nested JSON document with a POLYMORPHIC field "
    "(string / number / absent by event_id % 3 — the shape from_json's "
    "fixed schema cannot express), parses it to VARIANT (parse_json), "
    "and extracts typed paths: variant_get into long for object and "
    "array paths, try_variant_get for the polymorphic field (NULL on "
    "type mismatch instead of failing), plus schema_of_variant proving "
    "per-row schema inference — all three inferred schema shapes are "
    "VALUE-checked against literals the oracle derives from the same "
    "event_id rule.  The real props column round-trips through VARIANT "
    "too.  Oracle: DuckDB computes every extraction directly from the "
    "source columns — the JSON+VARIANT round trip is engine-internal, "
    "so any binary-encoding or path bug surfaces as a value mismatch.",
    oracle="""
        SELECT event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
               CAST(event_id % 13 AS BIGINT) AS arr2,
               CASE WHEN event_id % 3 = 1
                    THEN CAST(user_id % 100 AS BIGINT) END AS poly_num,
               CASE WHEN event_id % 3 = 0
                    THEN 'u' || CAST(user_id % 100 AS VARCHAR)
                    WHEN event_id % 3 = 1
                    THEN CAST(user_id % 100 AS VARCHAR) END AS poly_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               CASE event_id % 3
                 WHEN 0 THEN 'OBJECT<arr: ARRAY<BIGINT>, meta: OBJECT<cents: BIGINT, poly: STRING, type: STRING>>'
                 WHEN 1 THEN 'OBJECT<arr: ARRAY<BIGINT>, meta: OBJECT<cents: BIGINT, poly: BIGINT, type: STRING>>'
                 ELSE 'OBJECT<arr: ARRAY<BIGINT>, meta: OBJECT<cents: BIGINT, type: STRING>>'
               END AS vschema
        FROM events
        WHERE event_id % 20 = 0
        ORDER BY event_id
    """,
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # polymorphic field: string ("uNN"), bare number, or absent
    poly = F.when(
        F.col("event_id") % 3 == 0,
        F.concat(
            F.lit('"u'), (F.col("user_id") % 100).cast("string"), F.lit('"')
        ),
    ).when(F.col("event_id") % 3 == 1, (F.col("user_id") % 100).cast("string"))
    j = F.concat(
        F.lit('{"meta": {"cents": '),
        cents.cast("string"),
        F.lit(', "type": "'),
        F.col("event_type"),
        F.lit('"'),
        F.coalesce(F.concat(F.lit(', "poly": '), poly), F.lit("")),
        F.lit('}, "arr": ['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 11).cast("string"),
        F.lit(", "),
        (F.col("event_id") % 13).cast("string"),
        F.lit("]}"),
    )
    return (
        ev.select("event_id", "props", F.parse_json(j).alias("v"))
        .select(
            "event_id",
            F.variant_get("v", "$.meta.cents", "long").alias("cents"),
            F.variant_get("v", "$.arr[2]", "long").alias("arr2"),
            F.try_variant_get("v", "$.meta.poly", "long").alias("poly_num"),
            F.try_variant_get("v", "$.meta.poly", "string").alias("poly_str"),
            F.variant_get(F.parse_json("props"), "$.k", "long").alias("k_val"),
            F.schema_of_variant(F.col("v")).alias("vschema"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_map_ops",
    category="map-fn",
    doc="map construction / map_keys / element access / explode to rows.",
    oracle="""
        WITH m AS (
            SELECT event_id,
                   MAP {'type': event_type, 'user': CAST(user_id AS VARCHAR)} AS meta
            FROM events WHERE event_id % 100 = 0
        )
        SELECT event_id, 'n_keys' AS k, CAST(len(map_keys(meta)) AS VARCHAR) AS v FROM m
        UNION ALL
        SELECT event_id, 'type' AS k, meta['type'][1] AS v FROM m
        UNION ALL
        SELECT event_id, 'user' AS k, meta['user'][1] AS v FROM m
        ORDER BY event_id, k
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 100 == 0)
    m = ev.select(
        "event_id",
        F.create_map(
            F.lit("type"), F.col("event_type"),
            F.lit("user"), F.col("user_id").cast("string"),
        ).alias("meta"),
    )
    n_keys = m.select(
        "event_id", F.lit("n_keys").alias("k"),
        F.size(F.map_keys("meta")).cast("string").alias("v"),
    )
    typ = m.select(
        "event_id", F.lit("type").alias("k"), F.col("meta").getItem("type").alias("v")
    )
    usr = m.select(
        "event_id", F.lit("user").alias("k"), F.element_at("meta", F.lit("user")).alias("v")
    )
    return n_keys.unionByName(typ).unionByName(usr).orderBy("event_id", "k")


@register(
    "fn_posexplode",
    category="array-fn",
    doc="posexplode: array to (pos, element) rows with ordinality.",
    oracle="""
        SELECT vec_id, CAST(i - 1 AS INT) AS pos,
               ROUND(CAST(embedding[i] AS DOUBLE), 4) AS val
        FROM embeddings, range(1, 5) t(i)
        WHERE vec_id % 100 = 0
        ORDER BY vec_id, pos
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 100 == 0)
    return (
        emb.select("vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "v"))
        .select("vec_id", "pos", F.round(F.col("v").cast("double"), 4).alias("val"))
        .orderBy("vec_id", "pos")
    )


@register(
    "fn_conditional",
    category="conditional-fn",
    doc="CASE WHEN / coalesce / nullif / nvl chains.",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END                            AS bucket,
               COALESCE(NULLIF(o_orderstatus, 'O'), 'open')   AS status_or_open
        FROM orders
        WHERE o_orderkey % 50 = 0
        ORDER BY o_orderkey
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return (
        orders.select(
            "o_orderkey",
            F.when(F.col("o_totalprice") >= 200000, "high")
            .when(F.col("o_totalprice") >= 100000, "mid")
            .otherwise("low")
            .alias("bucket"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
                "status_or_open"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_bitwise",
    category="math-fn",
    doc="Bitwise battery: shifts, AND/OR/XOR, bit_count — exact integer "
    "ops, identical across engines by construction.",
    oracle="""
        SELECT event_id,
               event_id << 3                 AS shl,
               event_id >> 2                 AS shr,
               event_id & 255                AS land,
               event_id | 4096               AS lor,
               xor(event_id, 1365)           AS lxor,
               bit_count(event_id)           AS nbits
        FROM events WHERE event_id % 50 = 0
        ORDER BY event_id
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    e = F.col("event_id")
    return ev.select(
        "event_id",
        F.shiftleft(e, 3).alias("shl"),
        F.shiftright(e, 2).alias("shr"),
        e.bitwiseAND(F.lit(255)).alias("land"),
        e.bitwiseOR(F.lit(4096)).alias("lor"),
        e.bitwiseXOR(F.lit(1365)).alias("lxor"),
        F.bit_count(e).alias("nbits"),
    ).orderBy("event_id")


@register(
    "fn_json_malformed",
    category="json-fn",
    doc="Malformed-JSON tolerance: corrupt records classify as unparseable "
    "(get_json_object returns NULL; from_json PERMISSIVE-nulls the "
    "fields) — ingest never aborts on a corrupt record.",
    oracle="""
        WITH raw AS (
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0 THEN '{bad json'
                        ELSE props END AS j
            FROM events WHERE event_id % 3 = 0
        )
        SELECT json_valid(j) AS parseable,
               COUNT(*) AS n,
               CAST(SUM(event_id) AS BIGINT) AS id_sum
        FROM raw GROUP BY parseable ORDER BY parseable
    """,
)
def fn_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 3 == 0)
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit("{bad json")).otherwise(F.col("props")).alias("j"),
    )
    # from_json is PERMISSIVE (a struct of NULLs, never a NULL struct), so
    # validity comes from get_json_object's root probe — same semantics as
    # DuckDB's json_valid
    parsed = raw.select(
        "event_id", F.get_json_object("j", "$").isNotNull().alias("parseable")
    )
    return (
        parsed.groupBy("parseable")
        .agg(F.count("*").alias("n"), F.sum("event_id").cast("bigint").alias("id_sum"))
        .orderBy("parseable")
    )


@register(
    "fn_array_advanced",
    category="array-fn",
    doc="Array battery 2: sort_array, array_distinct, flatten, "
    "arrays_zip+explode_outer over embedding prefixes.",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   -- +0.0 folds IEEE negative zero into +0.0 (engines
                   -- format -0.0 differently)
                   list_transform(CAST(embedding[1:3] AS DOUBLE[]),
                                  x -> ROUND(x, 2) + 0.0) AS a
            FROM embeddings WHERE vec_id % 20 = 0
        )
        SELECT vec_id,
               list_sort(a)                            AS sorted_a,
               len(list_distinct(a))                   AS n_distinct,
               flatten([a, list_reverse(a)])           AS doubled
        FROM v ORDER BY vec_id
    """,
)
def fn_array_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 20 == 0)
    a = F.transform(
        F.slice("embedding", 1, 3), lambda x: F.round(x.cast("double"), 2) + F.lit(0.0)
    )
    return (
        emb.select("vec_id", a.alias("a"))
        .select(
            "vec_id",
            F.sort_array("a").alias("sorted_a"),
            F.size(F.array_distinct("a")).alias("n_distinct"),
            F.flatten(F.array(F.col("a"), F.reverse("a"))).alias("doubled"),
        )
        .orderBy("vec_id")
    )


@register(
    "agg_median_exact",
    category="aggregation",
    doc="Exact median (percentile_cont 0.5) over integral domains: the "
    "result is an integer or a .5 midpoint — both exactly representable, "
    "so outputs stay UNROUNDED (rounding a .5 double diverges between "
    "engines; see util.cents_sum_money).",
    oracle="""
        SELECT l_returnflag,
               CAST(median(l_quantity) AS DOUBLE) AS med_qty,
               CAST(median(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DOUBLE)
                   AS med_price_cents
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.queries.util import cents

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.median("l_quantity").cast("double").alias("med_qty"),
            F.median(cents("l_extendedprice")).cast("double").alias("med_price_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "fn_map_hof",
    category="map-fn",
    doc="Map higher-order functions: map_from_arrays, transform_values, "
    "map_filter, exploded to rows (the oracle reconstructs the same "
    "entries from plain arithmetic — ground truth without map types).",
    oracle="""
        WITH base AS (
            SELECT event_id, ROUND(value, 2) AS v
            FROM events WHERE event_id % 40 = 0
        )
        SELECT event_id, k, val FROM (
            SELECT event_id, 'base' AS k, ROUND(v * 10, 2) AS val FROM base
            UNION ALL
            SELECT event_id, 'double', ROUND(ROUND(v * 2, 2) * 10, 2) FROM base
            WHERE ROUND(v * 2, 2) > 50
        )
        ORDER BY event_id, k
    """,
)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 40 == 0)
    base = ev.select("event_id", F.round("value", 2).alias("v"))
    m = base.select(
        "event_id",
        F.map_from_arrays(
            F.array(F.lit("base"), F.lit("double")),
            F.array(F.col("v"), F.round(F.col("v") * 2, 2)),
        ).alias("m"),
    )
    # keep 'base' always; keep 'double' only when its value > 50
    filtered = m.select(
        "event_id",
        F.map_filter("m", lambda k, v: (k == "base") | (v > 50)).alias("m"),
    )
    xformed = filtered.select(
        "event_id",
        F.transform_values("m", lambda k, v: F.round(v * 10, 2)).alias("m"),
    )
    return (
        xformed.select("event_id", F.explode("m").alias("k", "val"))
        .orderBy("event_id", "k")
    )


@register(
    "fn_string_format",
    category="string-fn",
    doc="Formatting/padding battery: lpad/rpad/translate/format_string/"
    "repeat/reverse/left/right/ascii/chr/initcap/format_number. All are "
    "narrow per-row expressions inside whole-stage codegen (no shuffle; "
    "the only exchange is the final presentation sort). Engine notes: "
    "DuckDB lacks initcap, so the oracle emulates it with upper(substr)||"
    "substr on the single-word segment value; Spark format_number's "
    "grouped decimal rendering maps to DuckDB format('{:,.2f}') — both "
    "format an already-2dp-rounded double, so no rounding-mode divergence "
    "(DuckDB v1.0 only groups integers, so the oracle splits the value "
    "into a grouped integer part and a zero-padded 2-digit fraction).",
    oracle="""
        SELECT c_custkey,
               LPAD(c_mktsegment, 12, '*')                      AS seg_lpad,
               RPAD(c_mktsegment, 12, '.')                      AS seg_rpad,
               TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou')        AS seg_xlate,
               PRINTF('%08d/%s', c_custkey, c_mktsegment)       AS key_fmt,
               REPEAT(LEFT(c_mktsegment, 2), 3)                 AS seg_rep,
               REVERSE(c_mktsegment)                            AS seg_rev,
               LEFT(c_mktsegment, 4)                            AS seg_left,
               RIGHT(c_mktsegment, 4)                           AS seg_right,
               ASCII(c_mktsegment)                              AS seg_ascii,
               CHR(65 + CAST(c_custkey % 26 AS INT))            AS key_chr,
               UPPER(SUBSTR(LOWER(c_mktsegment), 1, 1))
                 || SUBSTR(LOWER(c_mktsegment), 2)              AS seg_initcap,
               CASE WHEN c_acctbal < 0 THEN '-' ELSE '' END
                 || FORMAT('{:,}', CAST(FLOOR(ABS(ROUND(c_acctbal, 2))) AS BIGINT))
                 || '.'
                 || LPAD(CAST(CAST(ROUND(ABS(ROUND(c_acctbal, 2)) * 100) AS BIGINT)
                              % 100 AS VARCHAR), 2, '0')         AS bal_fmt
        FROM customer
        WHERE c_custkey % 25 = 0
        ORDER BY c_custkey
    """,
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 25 == 0)
    return cust.select(
        "c_custkey",
        F.lpad("c_mktsegment", 12, "*").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_xlate"),
        F.format_string("%08d/%s", "c_custkey", "c_mktsegment").alias("key_fmt"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 3).alias("seg_rep"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.substring("c_mktsegment", 1, 4).alias("seg_left"),
        F.col("c_mktsegment").substr(F.length("c_mktsegment") - 3, F.lit(4)).alias("seg_right"),
        F.ascii("c_mktsegment").alias("seg_ascii"),
        F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("key_chr"),
        F.initcap(F.lower("c_mktsegment")).alias("seg_initcap"),
        F.format_number(F.round("c_acctbal", 2), 2).alias("bal_fmt"),
    ).orderBy("c_custkey")


@register(
    "fn_datetime_extended",
    category="datetime-fn",
    doc="Extended calendar battery: last_day/quarter/weekofyear/dayofweek/"
    "add_months/months_between/date_trunc(week)/make_date/date_format. "
    "Cross-engine definition care: Spark dayofweek is 1=Sunday while "
    "DuckDB's is 0=Sunday (oracle adds 1); Spark months_between uses the "
    "31-day-month fractional rule (exact when same day-of-month or both "
    "month-ends), which the oracle reimplements explicitly; both engines "
    "start ISO weeks on Monday and clamp add_months at month ends.",
    oracle="""
        SELECT o_orderkey,
               last_day(o_orderdate)                              AS month_end,
               quarter(o_orderdate)                               AS qtr,
               weekofyear(o_orderdate)                            AS iso_week,
               dayofweek(o_orderdate) + 1                         AS dow,
               dayname(o_orderdate)                               AS dow_name,
               CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)       AS plus3m,
               ROUND((year(o_orderdate) - 1995) * 12
                     + (month(o_orderdate) - 6)
                     + CASE WHEN day(o_orderdate) = 15
                                 OR (o_orderdate = last_day(o_orderdate)
                                     AND DATE '1995-06-15'
                                         = last_day(DATE '1995-06-15'))
                            THEN 0
                            ELSE (day(o_orderdate) - 15) / 31.0 END, 4)
                                                                  AS mb_epoch,
               CAST(date_trunc('week', o_orderdate) AS DATE)      AS week_start,
               make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
               strftime(o_orderdate, '%Y/%m')                     AS ym
        FROM orders
        WHERE o_orderkey % 50 = 0
        ORDER BY o_orderkey
    """,
)
def fn_datetime_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.date_format(d, "EEEE").alias("dow_name"),
        F.add_months(d, 3).alias("plus3m"),
        F.round(F.months_between(d, F.lit("1995-06-15").cast("date")), 4).alias("mb_epoch"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start"),
        F.date_format(d, "yyyy/MM").alias("ym"),
    ).orderBy("o_orderkey")


@register(
    "fn_struct",
    category="struct-fn",
    doc="Struct/nested-type surface: named_struct construction, field "
    "access, nested getField chains, withField updates, and lexicographic "
    "struct comparison — all JVM-side column ops (no shuffle, no Python); "
    "outputs are extracted primitives so the cross-engine hash compare "
    "stays on scalar columns.",
    oracle="""
        WITH s AS (
            SELECT p_partkey,
                   struct_pack(brand := p_brand, size := p_size) AS ps,
                   struct_pack(outer_k := struct_pack(inner_k := p_size * 2)) AS nested
            FROM part WHERE p_partkey % 25 = 0
        )
        SELECT p_partkey,
               ps.brand                    AS brand,
               ps.size + 1                 AS size_plus,
               nested.outer_k.inner_k      AS nested_val,
               ps.size * 10                AS updated_size,
               CASE WHEN struct_pack(a := ps.size, b := ps.brand)
                         < struct_pack(a := ps.size + 1, b := ps.brand)
                    THEN 1 ELSE 0 END      AS lt_flag
        FROM s
        ORDER BY p_partkey
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 25 == 0)
    s = part.select(
        "p_partkey",
        F.named_struct(
            F.lit("brand"), F.col("p_brand"), F.lit("size"), F.col("p_size")
        ).alias("ps"),
        F.named_struct(
            F.lit("outer_k"),
            F.named_struct(F.lit("inner_k"), F.col("p_size") * 2),
        ).alias("nested"),
    )
    return s.select(
        "p_partkey",
        F.col("ps").getField("brand").alias("brand"),
        (F.col("ps").getField("size") + 1).alias("size_plus"),
        F.col("nested").getField("outer_k").getField("inner_k").alias("nested_val"),
        # withField: functional update of a struct, then extract
        F.col("ps")
        .withField("size", F.col("ps.size") * 10)
        .getField("size")
        .alias("updated_size"),
        F.when(
            F.struct(F.col("ps.size").alias("a"), F.col("ps.brand").alias("b"))
            < F.struct(
                (F.col("ps.size") + 1).alias("a"), F.col("ps.brand").alias("b")
            ),
            1,
        )
        .otherwise(0)
        .alias("lt_flag"),
    ).orderBy("p_partkey")


@register(
    "agg_boolean",
    category="aggregation",
    doc="Boolean aggregate battery: count_if, bool_and (every), bool_or "
    "(any) per customer segment-ish grouping — all map-side combinable "
    "single-bit state, the cheapest aggregates there are at scale.",
    oracle="""
        SELECT o_orderpriority,
               CAST(count_if(o_totalprice > 200000) AS BIGINT)  AS n_big,
               bool_and(o_totalprice > 1000)                    AS all_over_1k,
               bool_or(o_orderstatus = 'F')                     AS any_finished,
               CAST(count_if(o_orderdate >= TIMESTAMP '1998-01-01')
                    AS BIGINT) AS n_recent
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
            F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count_if(
                F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
            ).alias("n_recent"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_string_concat",
    category="aggregation",
    doc="Ordered string aggregation (listagg): nation names per region, "
    "comma-joined in sorted order. Spark expresses the deterministic "
    "form as concat_ws over sort_array(collect_list(...)) — collect_list "
    "order is partition-dependent, so the sort is MANDATORY for a "
    "stable answer at any scale; the oracle uses string_agg(... ORDER "
    "BY). Distinct-count alongside proves the group contents match, "
    "not just the formatting.",
    oracle="""
        SELECT r_name,
               string_agg(n_name, ',' ORDER BY n_name) AS nations,
               COUNT(DISTINCT n_name) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
                "nations"
            ),
            F.countDistinct("n_name").alias("n_nations"),
        )
        .orderBy("r_name")
    )


@register(
    "fn_url",
    category="string-fn",
    doc="URL parsing: Spark's parse_url (host/path/query/param) against a "
    "regexp-based oracle — the engines have no shared URL parser, so "
    "equivalence is proven against hand-rolled POSIX regexes on "
    "synthesized URLs (deterministic from order keys). Pure projection: "
    "no shuffle, codegen-friendly.",
    oracle="""
        WITH u AS (
            SELECT o_orderkey,
                   'https://host' || CAST(o_orderkey % 5 AS VARCHAR)
                   || '.example.com/api/v' || CAST(o_orderkey % 3 AS VARCHAR)
                   || '/orders?priority=' || replace(o_orderpriority, ' ', '+')
                   || '&k=' || CAST(o_orderkey AS VARCHAR) AS url
            FROM orders WHERE o_orderkey % 250 = 0
        )
        SELECT o_orderkey,
               regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '\\?(.*)$', 1) AS query,
               regexp_extract(url, '[?&]k=([^&]*)', 1) AS k_param
        FROM u
        ORDER BY o_orderkey
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 250 == 0)
    url = F.concat(
        F.lit("https://host"),
        (F.col("o_orderkey") % 5).cast("string"),
        F.lit(".example.com/api/v"),
        (F.col("o_orderkey") % 3).cast("string"),
        F.lit("/orders?priority="),
        F.replace(F.col("o_orderpriority"), F.lit(" "), F.lit("+")),
        F.lit("&k="),
        F.col("o_orderkey").cast("string"),
    )
    u = o.select("o_orderkey", url.alias("url"))
    return u.select(
        "o_orderkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("k")).alias("k_param"),
    ).orderBy("o_orderkey")


@register(
    "agg_percentiles_exact",
    category="aggregation",
    doc="Exact interpolated percentiles (R-7, what both percentile() and "
    "quantile_cont() implement) of the integral-valued quantity domain "
    "at DYADIC fractions (.25/.5/.75): every interpolation step "
    "(n-1)*p, b-a, a+(b-a)*f is exactly representable, so the doubles "
    "are bit-identical across engines — the midpoint-rounding trap that "
    "forbids round(SUM(double)) does not exist here. Scale note: exact "
    "percentiles need a per-group sort; at 100 TB swap for "
    "percentile_approx (t-digest-style, mergeable) and keep this as "
    "the audit query.",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS p25,
               quantile_cont(l_quantity, 0.50) AS p50,
               quantile_cont(l_quantity, 0.75) AS p75,
               CAST(MIN(l_quantity) AS DOUBLE) AS lo,
               CAST(MAX(l_quantity) AS DOUBLE) AS hi
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
            F.percentile("l_quantity", F.lit(0.50)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.75)).alias("p75"),
            F.min("l_quantity").cast("double").alias("lo"),
            F.max("l_quantity").cast("double").alias("hi"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_histogram",
    category="aggregation",
    doc="Fixed-width histogram of order value: bucket index is exact "
    "integer floor arithmetic on cents (no width_bucket dependency, no "
    "FP boundary ambiguity), share is one int/int division. Map-side "
    "combinable into 12 cells — the constant-size aggregation shape "
    "that costs one near-empty shuffle at any scale.",
    oracle="""
        WITH b AS (
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 5000000
                       AS bucket
            FROM orders
        ),
        n AS (SELECT COUNT(*) AS total FROM orders)
        SELECT bucket,
               CAST(bucket * 50000 AS DOUBLE) AS lo_value,
               COUNT(*) AS n_orders,
               CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(n.total) AS share
        FROM b CROSS JOIN n
        GROUP BY bucket
        ORDER BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        (F.round(F.col("o_totalprice") * 100).cast("bigint") / F.lit(5_000_000))
        .cast("bigint")
        .alias("bucket")
    )
    n = o.agg(F.count(F.lit(1)).alias("total"))
    return (
        b.join(F.broadcast(n))
        .groupBy("bucket")
        .agg(
            (F.col("bucket") * 50000.0).alias("lo_value"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.count(F.lit(1)).cast("double") / F.first("total")).alias("share"),
        )
        .orderBy("bucket")
    )


@register(
    "fn_null_semantics",
    category="conditional-fn",
    doc="Three-valued-logic battery beyond fn_conditional: GROUP BY on a "
    "NULL key (nulls form one group), count(*) vs count(col) (the "
    "latter skips nulls), SUM over an all-null slice (NULL, not 0), "
    "null-safe equality (<=> / IS NOT DISTINCT FROM), and explicit "
    "NULLS FIRST output ordering. The synthesized null key is "
    "nullif(o_orderstatus, 'P'). These are pure expression semantics — "
    "identical plans to their non-null counterparts at any scale.",
    oracle="""
        WITH t AS (
            SELECT NULLIF(o_orderstatus, 'P') AS k,
                   o_totalprice,
                   CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   END AS maybe_cents
            FROM orders
        )
        SELECT k,
               COUNT(*) AS n_rows,
               COUNT(k) AS n_nonnull_key,
               CAST(SUM(CASE WHEN k IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_nullsafe_f,
               CAST(SUM(maybe_cents) AS BIGINT) AS cents_or_null
        FROM t
        GROUP BY k
        ORDER BY k NULLS FIRST
    """,
)
def fn_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        F.nullif("o_orderstatus", F.lit("P")).alias("k"),
        F.when(
            F.col("o_orderstatus") == "P", F.lit(None).cast("bigint")
        ).otherwise(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "maybe_cents"
        ),
    )
    return (
        t.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("k").alias("n_nonnull_key"),
            F.sum(
                F.when(F.col("k").eqNullSafe("F"), 1).otherwise(0)
            ).alias("n_nullsafe_f"),
            F.sum("maybe_cents").alias("cents_or_null"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


@register(
    "fn_try_cast",
    category="conditional-fn",
    doc="Error-safe casts (the ingest-cleaning primitive): try_cast of "
    "dirty numeric strings -> NULL instead of job failure, with "
    "parse-failure accounting. A failed cast that KILLS a 100 TB job "
    "three hours in is the alternative; try_* keeps the pipeline "
    "total. Dirty values are synthesized deterministically (every 7th "
    "value gets a trailing 'x').",
    oracle="""
        WITH dirty AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS VARCHAR)
                   || CASE WHEN o_orderkey % 7 = 0 THEN 'x' ELSE '' END AS s
            FROM orders WHERE o_orderkey % 40 = 0
        )
        SELECT o_orderkey,
               TRY_CAST(s AS DOUBLE) AS parsed,
               TRY_CAST(s AS DOUBLE) IS NULL AS parse_failed
        FROM dirty
        ORDER BY o_orderkey
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 40 == 0)
    dirty = o.select(
        "o_orderkey",
        F.concat(
            F.col("o_totalprice").cast("string"),
            F.when(F.col("o_orderkey") % 7 == 0, "x").otherwise(""),
        ).alias("s"),
    )
    return dirty.select(
        "o_orderkey",
        F.expr("TRY_CAST(s AS DOUBLE)").alias("parsed"),
        F.expr("TRY_CAST(s AS DOUBLE) IS NULL").alias("parse_failed"),
    ).orderBy("o_orderkey")


@register(
    "fn_regexp_extract_all",
    category="string-fn",
    doc="regexp_extract_all returning an array of matches, exploded to "
    "rows and aggregated into corpus frequencies — the array-returning "
    "regex surface (vs fn_regexp's single-match extract). The pattern "
    "([a-z]{4,}) is engine-portable (no lookaround/class shorthands "
    "where Java regex and RE2 diverge). Scale shape: explode is a "
    "narrow per-row fan-out; the only shuffle is the token groupBy.",
    oracle="""
        WITH toks AS (
            SELECT unnest(regexp_extract_all(text, '[a-z]{4,}')) AS tok
            FROM documents
        )
        SELECT tok, COUNT(*) AS n
        FROM toks
        GROUP BY tok
        ORDER BY n DESC, tok
        LIMIT 25
    """,
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(r"[a-z]{4,}"), 0)).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(25)
    )


@register(
    "fn_map_entries",
    category="map-fn",
    doc="map_from_entries round-trip: per-user event-type counts collected "
    "into a map, then read back via element_at — present keys return "
    "values, absent keys return NULL (the map edge case an outer "
    "conditional aggregate must reproduce). size(map) counts distinct "
    "keys. The map assembly is order-independent (lookup by key), so "
    "collect_list's nondeterministic order cannot leak into results.",
    oracle="""
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               CAST(NULL AS BIGINT)                            AS n_missing,
               COUNT(DISTINCT event_type)                      AS n_types
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def fn_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("n_click"),
        F.coalesce(F.element_at("type_counts", "purchase"), F.lit(0)).alias(
            "n_purchase"
        ),
        F.element_at("type_counts", "no_such_type").alias("n_missing"),
        F.size("type_counts").cast("bigint").alias("n_types"),
    ).orderBy("user_id")


@register(
    "agg_percentile_disc",
    category="aggregation",
    doc="SQL-standard discrete percentiles (percentile_disc ... WITHIN "
    "GROUP): the smallest actual data value whose cumulative "
    "distribution reaches p — no interpolation, so the result is a "
    "value that exists in the column and matches bit-for-bit across "
    "engines with no rounding guard (unlike percentile_cont on "
    "arbitrary doubles). Verified both engines implement the standard "
    "ceil(n*p) pick, not the floor((n-1)*p) variant. Exact "
    "percentiles sort per group; at 100 TB swap for approx_percentile "
    "and keep this as the audit query.",
    oracle="""
        SELECT o_orderpriority AS pri,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p25_disc,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p50_disc,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p75_disc,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY pri
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority AS pri,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p25_disc,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p50_disc,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p75_disc,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY pri
        """
    )


@register(
    "fn_generator_outer",
    category="function",
    doc="Generator edge semantics: explode vs explode_outer over empty "
    "and NULL arrays — outer keeps the parent row with a NULL element "
    "(the row-preserving contract an unnest-heavy pipeline relies on; "
    "plain explode silently drops those parents).",
    oracle="""
        WITH src AS (
            SELECT n_nationkey AS k,
                   CASE WHEN n_nationkey % 3 = 0 THEN NULL
                        WHEN n_nationkey % 3 = 1 THEN []
                        ELSE [n_nationkey, n_nationkey * 10] END AS arr
            FROM nation
        ),
        plain AS (
            SELECT k, unnest(arr) AS v FROM src
        ),
        outer_u AS (
            SELECT k, u.v
            FROM src LEFT JOIN LATERAL (SELECT unnest(arr) AS v) u ON TRUE
        )
        SELECT 'plain' AS mode, COUNT(*) AS n_rows,
               COUNT(v) AS n_values, COUNT(DISTINCT k) AS n_parents
        FROM plain
        UNION ALL
        SELECT 'outer', COUNT(*), COUNT(v), COUNT(DISTINCT k) FROM outer_u
        ORDER BY mode
    """,
)
def fn_generator_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    src = nation.select(
        F.col("n_nationkey").alias("k"),
        F.when(F.col("n_nationkey") % 3 == 0, F.lit(None).cast("array<bigint>"))
        .when(F.col("n_nationkey") % 3 == 1, F.array().cast("array<bigint>"))
        .otherwise(F.array(F.col("n_nationkey"), F.col("n_nationkey") * 10))
        .alias("arr"),
    )
    plain = src.select("k", F.explode("arr").alias("v")).agg(
        F.lit("plain").alias("mode"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_values"),
        F.countDistinct("k").alias("n_parents"),
    )
    outer = src.select("k", F.explode_outer("arr").alias("v")).agg(
        F.lit("outer").alias("mode"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v").alias("n_values"),
        F.countDistinct("k").alias("n_parents"),
    )
    return plain.unionByName(outer).orderBy("mode")


@register(
    "fn_variant_json",
    category="json-fn",
    doc="VARIANT semi-structured type (Spark 4): events.props parses once "
    "into a variant and fields extract with typed paths (variant_get) — "
    "the scan-efficient pattern for schema-on-read JSON at scale "
    "(binary-encoded variant beats per-access string re-parsing; "
    "Parquet variant shredding pushes field access into the scan).  "
    "Oracle uses DuckDB's JSON extraction over the same column.",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
               json_extract_string(props, '$.tag') AS tag
        FROM events
        WHERE event_id % 20 = 0
        ORDER BY event_id
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.k", "bigint").alias("k_val"),
            F.try_variant_get(v, "$.tag", "string").alias("tag"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_try_arith",
    category="conditional-fn",
    doc="Error-safe arithmetic, the rest of the try_* family next to "
    "fn_try_cast: try_divide (divide-by-zero -> NULL, not a job "
    "abort), try_add at the bigint ceiling (overflow -> NULL, never a "
    "silent wraparound), and try_element_at past the end of an array "
    "(-> NULL).  DuckDB errors on all three, so the oracle encodes the "
    "same semantics with explicit guards — which is precisely the "
    "boilerplate try_* replaces.",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0 THEN NULL
                    ELSE ROUND(o_totalprice / (o_orderkey % 5), 4)
               END AS safe_div,
               CASE WHEN o_orderkey % 3 > 0 THEN NULL
                    ELSE 9223372036854775807 END AS safe_add,
               CASE WHEN o_orderkey % 4 + 1 <= 2
                    THEN ['a', 'b'][CAST(o_orderkey % 4 + 1 AS INT)]
                    ELSE NULL END AS safe_at
        FROM orders WHERE o_orderkey % 30 = 0
        ORDER BY o_orderkey
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 30 == 0)
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 4
        ).alias("safe_div"),
        F.try_add(
            F.lit(9223372036854775807), F.col("o_orderkey") % 3
        ).alias("safe_add"),
        F.try_element_at(
            F.array(F.lit("a"), F.lit("b")),
            (F.col("o_orderkey") % 4 + 1).cast("int"),
        ).alias("safe_at"),
    ).orderBy("o_orderkey")


@register(
    "agg_exact_covariance",
    category="aggregation",
    doc="Exact integer covariance: the scaled numerator "
    "n*sum(xy) - sum(x)*sum(y) over (quantity, price-cents) per return "
    "flag, computed entirely in integer space — the population "
    "covariance times n^2 * 100, bit-identical across engines under "
    "any partitioning (a float covar_pop diverges in the last ulps "
    "with summation order).  Per-row sums stay in long range; the two "
    "final products run in decimal(38,0)/HUGEINT.  The pattern for "
    "any exact second-moment statistic at 100 TB.",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(l_quantity AS BIGINT)) AS sx,
                   SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
            FROM lineitem
            GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(n * sxy - sx * sy AS VARCHAR) AS cov_numerator
        FROM s
        ORDER BY l_returnflag
    """,
)
def agg_exact_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
    )
    dec = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    num = (dec("n") * dec("sxy") - dec("sx") * dec("sy")).cast("decimal(38,0)")
    # serialized as string: the value exceeds bigint and the driver's
    # hasher must see identical text on both sides
    return s.select(
        "l_returnflag", "n", num.cast("string").alias("cov_numerator")
    ).orderBy("l_returnflag")


@register(
    "fn_mask",
    category="string-fn",
    doc="Data masking (governance surface next to text_pii_redact): "
    "Spark's mask() builtin — uppercase -> X, lowercase -> x, digits -> "
    "n, punctuation kept — applied to customer names plus a "
    "last-4-visible account form via substring composition.  The oracle "
    "spells the same policy as three character-class regex passes, "
    "which is exactly the boilerplate the builtin replaces.",
    oracle="""
        SELECT c_custkey,
               regexp_replace(regexp_replace(regexp_replace(
                   c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
                   '[0-9]', 'n', 'g') AS masked_name,
               regexp_replace(substr(c_name, 1, length(c_name) - 4),
                              '[0-9]', 'n', 'g')
                   || substr(c_name, length(c_name) - 3) AS last4_visible
        FROM customer WHERE c_custkey % 20 = 0
        ORDER BY c_custkey
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 20 == 0
    )
    name = F.col("c_name")
    visible_tail = F.substring(name, F.length(name) - 3, F.lit(4))
    masked_head = F.mask(
        F.substring(name, F.lit(1), F.length(name) - 4),
        upperChar=F.lit(None),
        lowerChar=F.lit(None),
        digitChar=F.lit("n"),
    )
    return cust.select(
        "c_custkey",
        F.mask(name).alias("masked_name"),
        F.concat(masked_head, visible_tail).alias("last4_visible"),
    ).orderBy("c_custkey")


@register(
    "fn_xml",
    category="semistructured-fn",
    doc="Native XML (Spark 4 built-in, the spark-xml merge): orders "
    "rendered to XML strings in-plan, then parsed back with from_xml "
    "against an explicit schema, plus xpath extraction of one field — "
    "the semi-structured format surface next to JSON/variant.  The "
    "round trip must reproduce the original columns exactly (cents "
    "integer for the price), which is what the oracle checks from the "
    "raw table; DuckDB has no XML support, so the oracle IS the "
    "original data — any parse drift fails the hash.",
    oracle="""
        SELECT o_orderkey,
               o_orderpriority AS pri,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               o_orderpriority AS xpath_pri
        FROM orders WHERE o_orderkey % 35 = 0
        ORDER BY o_orderkey
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 35 == 0)
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey"),
        F.lit("</key><pri>"),
        F.col("o_orderpriority"),
        F.lit("</pri><cents>"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        F.lit("</cents></order>"),
    )
    doc = o.select("o_orderkey", xml.alias("x"))
    parsed = doc.select(
        "o_orderkey",
        F.from_xml("x", "key BIGINT, pri STRING, cents BIGINT").alias("p"),
        F.xpath_string("x", F.lit("/order/pri")).alias("xpath_pri"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("p.pri").alias("pri"),
        F.col("p.cents").alias("cents"),
        "xpath_pri",
    ).orderBy("o_orderkey")


@register(
    "fn_datetime_advanced",
    category="date-fn",
    doc="Calendar arithmetic battery beyond fn_datetime: add_months with "
    "end-of-month clamping, months_between (integral for same-day "
    "pairs via first-of-month anchors — add_months CLAMPS month ends "
    "so engines disagree on fractional months otherwise), last_day, "
    "ISO day-of-week, quarter, week-of-year (ISO "
    "8601 — both engines agree on isoyear weeks), and make_date "
    "reconstruction.  All pure calendar math, no timezone dependence "
    "(fixture timestamps are date-valued).",
    oracle="""
        SELECT o_orderkey,
               strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
               CAST(date_diff('month', date_trunc('month', o_orderdate),
                              date_trunc('month', o_orderdate)
                              + INTERVAL 3 MONTH) AS DOUBLE)
                   AS months_fwd,
               strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
               isodow(o_orderdate) AS iso_dow,
               quarter(o_orderdate) AS q,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               strftime(make_date(CAST(year(o_orderdate) AS INT),
                                  CAST(month(o_orderdate) AS INT), 1),
                        '%Y-%m-%d') AS rebuilt_month
        FROM orders WHERE o_orderkey % 45 = 0
        ORDER BY o_orderkey
    """,
)
def fn_datetime_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 45 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.months_between(
            F.add_months(F.date_trunc("month", d), 3), F.date_trunc("month", d)
        ).alias("months_fwd"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofweek(F.date_sub(d.cast("date"), 1)).alias("iso_dow"),
        F.quarter(d).alias("q"),
        F.weekofyear(d).alias("iso_week"),
        F.date_format(
            F.make_date(F.year(d), F.month(d), F.lit(1)), "yyyy-MM-dd"
        ).alias("rebuilt_month"),
    ).orderBy("o_orderkey")


@register(
    "agg_weighted_avg_exact",
    category="aggregation",
    doc="Exact weighted average: quantity-weighted mean price per return "
    "flag carried as an integer numerator (sum of qty * price-cents) "
    "and denominator (sum qty) with ONE double division at the end — "
    "the only FP op, IEEE-identical everywhere.  The pattern for any "
    "exact ratio-of-sums statistic (CTR, yield, per-token loss) at "
    "100 TB: both sums are map-side-combinable longs.",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS BIGINT)
                        * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS num_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS den_qty,
               ROUND(CAST(SUM(CAST(l_quantity AS BIGINT)
                              * CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                          AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                     / 100, 4) AS weighted_avg_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_weighted_avg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    pc = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.sum(q * pc).alias("num_cents"),
        F.sum(q).alias("den_qty"),
    )
    return s.select(
        "l_returnflag",
        "num_cents",
        "den_qty",
        F.round(
            F.col("num_cents").cast("double") / F.col("den_qty").cast("double") / 100,
            4,
        ).alias("weighted_avg_price"),
    ).orderBy("l_returnflag")


@register(
    "agg_mad_outliers",
    category="aggregation",
    doc="Robust outlier census via median absolute deviation: per event "
    "type, the exact median of value-cents, the exact median of "
    "|x - median|, and the count of rows beyond 5 MADs — the "
    "quality-screen statistic that survives the heavy tails that wreck "
    "stddev-based z-scores.  Both medians run on integral cents (so "
    "results are integers or .5, exactly representable — kept "
    "UNROUNDED); the operator shape is two grouped exact medians with "
    "a broadcast join back, all on one event_type shuffle key.",
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
            FROM events
        ),
        med AS (
            SELECT event_type, median(vc) AS med_cents
            FROM v GROUP BY event_type
        ),
        dev AS (
            SELECT v.event_type, v.vc, m.med_cents,
                   abs(v.vc - m.med_cents) AS adev
            FROM v JOIN med m ON v.event_type = m.event_type
        ),
        mad AS (
            SELECT event_type, median(adev) AS mad_cents
            FROM dev GROUP BY event_type
        )
        SELECT d.event_type,
               ANY_VALUE(d.med_cents) AS med_cents,
               ANY_VALUE(ma.mad_cents) AS mad_cents,
               CAST(SUM(CASE WHEN d.adev > 5 * ma.mad_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               COUNT(*) AS n
        FROM dev d JOIN mad ma ON d.event_type = ma.event_type
        GROUP BY d.event_type
        ORDER BY d.event_type
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100, 0).cast("long").alias("vc")
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(vc, 0.5)").alias("med_cents")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("vc") - F.col("med_cents"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med_cents").alias("med_cents"),
            F.any_value("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(F.col("adev") > 5 * F.col("mad_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_third_moment_exact",
    category="aggregation",
    doc="Exact third central moment (skewness numerator) of quantity per "
    "return flag: m3 * n^3 = n^2*Sum(x^3) - 3n*Sum(x^2)*Sum(x) + "
    "2*Sum(x)^3, all in integer space (quantity <= 50 keeps x^3 tiny; "
    "the final products run in decimal(38,0)/HUGEINT, serialized as "
    "strings past bigint range).  Completes the exact-moment family "
    "with agg_exact_covariance — the same one-pass, map-side-"
    "combinable shape extends to any polynomial statistic.",
    oracle="""
        WITH s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(l_quantity AS BIGINT)) AS s1,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS s2,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)
                       * CAST(l_quantity AS BIGINT)) AS s3
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n,
               CAST(n * n * s3 - 3 * n * s2 * s1 + 2 * s1 * s1 * s1
                    AS VARCHAR) AS m3_scaled
        FROM s ORDER BY l_returnflag
    """,
)
def agg_third_moment_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
    )
    d = lambda c: F.col(c).cast("decimal(20,0)")  # noqa: E731
    m3 = (
        d("n") * d("n") * d("s3")
        - F.lit(3).cast("decimal(20,0)") * d("n") * d("s2") * d("s1")
        + F.lit(2).cast("decimal(20,0)") * d("s1") * d("s1") * d("s1")
    ).cast("decimal(38,0)")
    return s.select(
        "l_returnflag", "n", m3.cast("string").alias("m3_scaled")
    ).orderBy("l_returnflag")


@register(
    "agg_gini_impurity",
    category="aggregation",
    doc="Gini impurity of each user's event-type mix, exactly: impurity "
    "= 1 - sum(p_i^2) carried as the integer pair (n^2 - sum(c_i^2), "
    "n^2) — the log-free diversity statistic (entropy needs "
    "transcendentals, which are banned from oracle-compared outputs "
    "because libm rounding differs across engines).  Two grouped "
    "passes on one user_id shuffle; the final double division is the "
    "only FP op.",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, COUNT(*) AS c
            FROM events WHERE user_id % 21 = 0
            GROUP BY user_id, event_type
        ),
        per_user AS (
            SELECT user_id,
                   SUM(c) AS n,
                   SUM(c * c) AS sum_c2
            FROM counts GROUP BY user_id
        )
        SELECT user_id,
               CAST(n AS BIGINT) AS n,
               CAST(n * n - sum_c2 AS BIGINT) AS impurity_num,
               ROUND(CAST(n * n - sum_c2 AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
                   AS gini_impurity
        FROM per_user ORDER BY user_id
    """,
)
def agg_gini_impurity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 21 == 0)
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    per_user = counts.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("sum_c2")
    )
    num = F.col("n") * F.col("n") - F.col("sum_c2")
    return per_user.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        num.cast("bigint").alias("impurity_num"),
        F.round(
            num.cast("double") / (F.col("n") * F.col("n")).cast("double"), 6
        ).alias("gini_impurity"),
    ).orderBy("user_id")


@register(
    "agg_tv_distance_drift",
    category="aggregation",
    doc="Distribution drift via total-variation distance, exactly: the "
    "event-type mix of even-id users vs odd-id users, TV = (1/2) "
    "sum|p_i - q_i| carried as the integer numerator "
    "sum|c_a_i * n_b - c_b_i * n_a| over denominator 2 * n_a * n_b — "
    "the train/serve drift alarm without logs or floats (KL needs "
    "transcendentals; TV bounds it and is exact).  One small "
    "two-column pivot; the only FP op is the final division.",
    oracle="""
        WITH tagged AS (
            SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
                   event_type
            FROM events
        ),
        c AS (
            SELECT event_type,
                   SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS ca,
                   SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS cb
            FROM tagged GROUP BY event_type
        ),
        tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM c)
        SELECT CAST(SUM(ABS(ca * nb - cb * na)) AS BIGINT) AS tv_numerator,
               CAST(2 * ANY_VALUE(na) * ANY_VALUE(nb) AS BIGINT)
                   AS tv_denominator,
               ROUND(CAST(SUM(ABS(ca * nb - cb * na)) AS DOUBLE)
                     / CAST(2 * ANY_VALUE(na) * ANY_VALUE(nb) AS DOUBLE), 8)
                   AS tv_distance
        FROM c CROSS JOIN tot
    """,
)
def agg_tv_distance_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = c.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"))
    num = F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")))
    den = F.lit(2) * F.any_value("na") * F.any_value("nb")
    return c.crossJoin(F.broadcast(tot)).agg(
        num.cast("bigint").alias("tv_numerator"),
        den.cast("bigint").alias("tv_denominator"),
        F.round(num.cast("double") / den.cast("double"), 8).alias("tv_distance"),
    )


@register(
    "agg_density_grid_2d",
    category="aggregation",
    doc="2D density grid (the joint-distribution profile behind heatmap "
    "data-skipping and bivariate skew detection): orders bucketed on "
    "(customer-id bucket, price decile-width bucket) with exact "
    "integer bucket arithmetic, counting rows and exact cents mass "
    "per cell.  One groupBy on the composite cell key — the same "
    "shuffle shape at any scale.",
    oracle="""
        SELECT CAST(o_custkey // 200 AS BIGINT) AS cust_bucket,
               CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    // 5000000 AS BIGINT) AS price_bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS cents_mass
        FROM orders
        GROUP BY cust_bucket, price_bucket
        ORDER BY cust_bucket, price_bucket
    """,
)
def agg_density_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        o.select(
            F.expr("o_custkey div 200").alias("cust_bucket"),
            F.expr(
                "cast(round(o_totalprice * 100, 0) as bigint) div 5000000"
            ).alias("price_bucket"),
            cents.alias("cents"),
        )
        .groupBy("cust_bucket", "price_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("cents_mass"),
        )
        .orderBy("cust_bucket", "price_bucket")
    )


@register(
    "fn_array_predicates",
    category="array-fn",
    doc="Quantified array predicates: exists (any element above a "
    "threshold), forall (every element inside a band), and a "
    "three-argument aggregate fold with a FINISH lambda (mean via "
    "sum-then-divide inside the fold) — the last higher-order "
    "functions the array battery didn't exercise.  DuckDB has no "
    "exists/forall, so the oracle encodes them as filtered-length "
    "tests, which is the boilerplate the quantifiers replace.",
    oracle="""
        SELECT vec_id,
               CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                         x -> x > 0.99)) > 0
                    THEN 1 ELSE 0 END AS has_extreme,
               CASE WHEN len(list_filter(CAST(embedding AS DOUBLE[]),
                                         x -> NOT (x >= -1.0 AND x <= 1.0))) = 0
                    THEN 1 ELSE 0 END AS all_in_band,
               ROUND(list_sum(CAST(embedding AS DOUBLE[]))
                     / len(embedding), 6) AS mean_fold
        FROM embeddings WHERE vec_id % 40 = 0
        ORDER BY vec_id
    """,
)
def fn_array_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 40 == 0)
    e = F.col("embedding").cast("array<double>")
    mean_fold = F.aggregate(
        e,
        F.lit(0.0),
        lambda acc, x: acc + x,
        lambda acc: F.round(acc / F.size(e), 6),
    )
    return emb.select(
        "vec_id",
        F.when(F.exists(e, lambda x: x > 0.99), 1).otherwise(0).alias("has_extreme"),
        F.when(F.forall(e, lambda x: (x >= -1.0) & (x <= 1.0)), 1)
        .otherwise(0)
        .alias("all_in_band"),
        mean_fold.alias("mean_fold"),
    ).orderBy("vec_id")


@register(
    "fn_stack",
    category="array-fn",
    doc="stack(n, ...) generator: the SQL-side wide-to-long unpivot "
    "(each nation row fans out to two metric rows).  Complements "
    "agg_unpivot (the DataFrame melt): stack is a codegen'd generator, "
    "so the fan-out never leaves the JVM and stays a narrow transform.",
    oracle="""
        SELECT n_nationkey, 'name_len' AS metric,
               CAST(LENGTH(n_name) AS BIGINT) AS v
        FROM nation
        UNION ALL
        SELECT n_nationkey, 'region', CAST(n_regionkey AS BIGINT)
        FROM nation
        ORDER BY n_nationkey, metric
    """,
)
def fn_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("stack_nation")
    return spark.sql(
        """
        SELECT n_nationkey, metric, v
        FROM stack_nation
        LATERAL VIEW stack(
            2,
            'name_len', CAST(LENGTH(n_name) AS BIGINT),
            'region',   CAST(n_regionkey AS BIGINT)
        ) s AS metric, v
        ORDER BY n_nationkey, metric
        """
    )


@register(
    "fn_timezone",
    category="datetime-fn",
    doc="Timezone conversion battery: from_utc_timestamp re-renders the "
    "UTC event instant as New-York / Tokyo wall time, and Spark 4's "
    "convert_timezone handles the TIMESTAMP_NTZ path for a half-hour "
    "offset zone (Asia/Kolkata, +05:30).  DuckDB oracle uses the ICU "
    "timezone() double-hop (naive-UTC -> instant -> target wall time).  "
    "Pure column expressions; narrow, codegen'd, scale-free.",
    oracle="""
        SELECT event_id,
               strftime(timezone('America/New_York', timezone('UTC', ts)),
                        '%Y-%m-%d %H:%M:%S') AS ny_wall,
               CAST(EXTRACT(hour FROM timezone('Asia/Tokyo',
                                               timezone('UTC', ts)))
                    AS INT) AS tokyo_hour,
               CAST(EXTRACT(minute FROM timezone('Asia/Kolkata',
                                                 timezone('UTC', ts)))
                    AS INT) AS kolkata_min
        FROM events WHERE event_id % 17 = 0
        ORDER BY event_id
    """,
)
def fn_timezone(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    return (
        ev.select(
            "event_id",
            F.date_format(
                F.from_utc_timestamp("ts", "America/New_York"), "yyyy-MM-dd HH:mm:ss"
            ).alias("ny_wall"),
            F.hour(F.from_utc_timestamp("ts", "Asia/Tokyo")).alias("tokyo_hour"),
            F.minute(
                F.convert_timezone(
                    F.lit("UTC"), F.lit("Asia/Kolkata"), F.col("ts").cast("timestamp_ntz")
                )
            ).alias("kolkata_min"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_string_numeric_format",
    category="string-fn",
    doc="Formatting/bit battery: overlay (string splice), to_char with a "
    "grouping picture ('9,999,999' — right-aligned, comma only between "
    "digits; a value WIDER than the picture prints the overflow fill "
    "'# ### ###', pinned by the oracle since sf1-scale keys exceed 7 "
    "digits), getbit/bit_count over the key, array_repeat join.  DuckDB "
    "lacks overlay/to_char/getbit, so the oracle reconstructs each from "
    "primitives (substr splice, format('{:>7}', format('{:,}', x)), "
    "shift-and-mask) — pinning Spark's exact output contract.",
    oracle="""
        SELECT o_orderkey,
               substr(o_orderpriority, 1, 2) || 'XX'
                   || substr(o_orderpriority, 5) AS spliced,
               CASE WHEN o_orderkey = 0 THEN '         '  -- '9' blanks zero
                    WHEN o_orderkey > 9999999 THEN '# ### ###'  -- overflow
                    ELSE format('{:>9}', format('{:,}', o_orderkey)) END
                   AS key_pic,
               CAST((o_orderkey >> 3) & 1 AS INT) AS bit3,
               CAST(bit_count(o_orderkey) AS INT) AS popcount,
               array_to_string(
                   list_transform(range(3), i -> substr(o_orderstatus, 1, 1)),
                   '*') AS status3
        FROM orders WHERE o_orderkey % 29 = 0
        ORDER BY o_orderkey
    """,
)
def fn_string_numeric_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 29 == 0)
    return (
        orders.select(
            "o_orderkey",
            F.overlay("o_orderpriority", F.lit("XX"), 3).alias("spliced"),
            F.to_char(F.col("o_orderkey"), F.lit("9,999,999")).alias("key_pic"),
            F.getbit("o_orderkey", F.lit(3)).cast("int").alias("bit3"),
            F.bit_count("o_orderkey").cast("int").alias("popcount"),
            F.array_join(
                F.array_repeat(F.substring("o_orderstatus", 1, 1), 3), "*"
            ).alias("status3"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_width_bucket",
    category="math-fn",
    doc="Equi-width binning via width_bucket over exact order-total cents "
    "(bounds 0..60000_00 in 12 bins; out-of-range clamps to bin 13).  "
    "The bucketing primitive behind histograms and numeric-feature "
    "discretization; DuckDB oracle reconstructs the same bin arithmetic "
    "from floor division (integer space, bit-identical).",
    oracle="""
        WITH b AS (
            SELECT CAST(CASE
                     WHEN cents < 0 THEN 0
                     WHEN cents >= 6000000 THEN 13
                     ELSE cents // 500000 + 1
                   END AS INT) AS bin
            FROM (
                SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
                FROM orders
            )
        )
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n
        FROM b GROUP BY bin ORDER BY bin
    """,
)
def fn_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.select(
            F.width_bucket(cents, F.lit(0), F.lit(6000000), F.lit(12))
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


@register(
    "win_period_over_period",
    category="window",
    doc="Period-over-period analytics: monthly revenue per order priority "
    "with month-over-month delta (lag 1) and year-over-year ratio "
    "(lag 12) — the standard reporting pair.  Exact cents throughout; "
    "the YoY ratio is emitted as an integer ppm numerator "
    "(cur*1e6 // prev) so both engines agree bit-for-bit.  One window "
    "shuffle on (priority), frames over the month sequence.",
    oracle="""
        WITH m AS (
            SELECT o_orderpriority AS pri,
                   strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                        AS BIGINT) AS rev_cents
            FROM orders
            GROUP BY 1, 2
        ),
        w AS (
            SELECT pri, mon, rev_cents,
                   LAG(rev_cents, 1) OVER (PARTITION BY pri ORDER BY mon)
                       AS prev_cents,
                   LAG(rev_cents, 12) OVER (PARTITION BY pri ORDER BY mon)
                       AS yoy_cents
            FROM m
        )
        SELECT pri, mon, rev_cents,
               CAST(rev_cents - prev_cents AS BIGINT) AS mom_delta_cents,
               CAST(rev_cents * 1000000 // yoy_cents AS BIGINT) AS yoy_ppm
        FROM w
        WHERE mon >= '1996-01'
        ORDER BY pri, mon
    """,
)
def win_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("mon"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("rev_cents")
    )
    w = Window.partitionBy("pri").orderBy("mon")
    return (
        m.select(
            "pri",
            "mon",
            "rev_cents",
            (F.col("rev_cents") - F.lag("rev_cents", 1).over(w))
            .cast("long")
            .alias("mom_delta_cents"),
            F.lag("rev_cents", 12).over(w).alias("yoy_prev"),
        )
        # exact integer division (div), never floor(double/) — a quotient
        # landing within 1 ulp of an integer would flip the floor
        .withColumn(
            "yoy_ppm",
            F.expr("(rev_cents * 1000000L) div yoy_prev").cast("long"),
        )
        .filter(F.col("mon") >= "1996-01")
        .select("pri", "mon", "rev_cents", "mom_delta_cents", "yoy_ppm")
        .orderBy("pri", "mon")
    )


@register(
    "fn_array_setops",
    category="array-fn",
    doc="Array set algebra battery: except/intersect/union (order-"
    "normalized via array_sort for cross-engine equality), overlap "
    "test, position, insert/remove/compact, zip of two slices.  Arrays "
    "built from each embedding's leading slices scaled to integers via "
    "FLOOR (floor of the same IEEE double is bit-identical in both "
    "engines for ANY value; decimal ROUND disagrees on midpoint-looking "
    "shortest-reprs — surfaced by the sf1 rotated embeddings) so every "
    "element is exact.  Emitted as joined strings (the driver compares "
    "primitives).",
    oracle="""
        WITH v AS (
            -- cast float32 -> DOUBLE BEFORE arithmetic (both engines),
            -- like every other embedding oracle: a float multiply on one
            -- side vs a double multiply on the other flips floor() at
            -- representation boundaries
            SELECT vec_id,
                   list_transform(CAST(embedding[1:6] AS DOUBLE[]),
                                  x -> CAST(FLOOR(x * 100) AS BIGINT)) AS a,
                   list_transform(CAST(embedding[4:9] AS DOUBLE[]),
                                  x -> CAST(FLOOR(x * 100) AS BIGINT)) AS b
            FROM embeddings WHERE vec_id % 23 = 0
        )
        SELECT vec_id,
               -- Spark's array_except/array_intersect dedupe their output.
               -- COALESCE: when a is fully contained in b the filtered
               -- list is empty and DuckDB's sort/distinct chain yields
               -- NULL where Spark's array_join gives '' (sf1 surfaced it)
               COALESCE(array_to_string(list_sort(list_distinct(
                   list_filter(a, x -> NOT list_contains(b, x)))), ','), '')
                   AS a_except_b,
               array_to_string(list_sort(list_distinct(
                   list_filter(a, x -> list_contains(b, x)))), ',')
                   AS a_intersect_b,
               array_to_string(list_sort(list_distinct(list_concat(a, b))), ',')
                   AS a_union_b,
               len(list_filter(a, x -> list_contains(b, x))) > 0 AS overlaps,
               CAST(COALESCE(list_position(a, a[3]), 0) AS BIGINT) AS pos3,
               array_to_string(a[1:2] || [CAST(-1 AS BIGINT)] || a[3:], ',')
                   AS inserted,
               array_to_string(list_filter(a, x -> x != a[1]), ',') AS removed
        FROM v ORDER BY vec_id
    """,
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 23 == 0)
    cents = lambda c: F.transform(c, lambda x: F.floor(x.cast("double") * 100).cast("long"))  # noqa: E731
    v = emb.select(
        "vec_id",
        cents(F.slice("embedding", 1, 6)).alias("a"),
        cents(F.slice("embedding", 4, 6)).alias("b"),
    )
    return v.select(
        "vec_id",
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("a_except_b"),
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias(
            "a_intersect_b"
        ),
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("a_union_b"),
        F.arrays_overlap("a", "b").alias("overlaps"),
        F.array_position(F.col("a"), F.element_at("a", 3)).cast("long").alias("pos3"),
        F.array_join(F.array_insert("a", 3, F.lit(-1)), ",").alias("inserted"),
        F.array_join(F.array_remove("a", F.element_at("a", 1)), ",").alias("removed"),
    ).orderBy("vec_id")


@register(
    "agg_bit_ops",
    category="aggregation",
    doc="Bitwise aggregates: bit_and / bit_or / bit_xor of order keys per "
    "priority — the fold primitives behind permission masks and bitmap "
    "rollups.  Exact integers; identical in DuckDB.",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey) AS BIGINT) AS all_bits,
               CAST(bit_or(o_orderkey)  AS BIGINT) AS any_bits,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS parity_bits
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bit_and("o_orderkey").alias("all_bits"),
            F.bit_or("o_orderkey").alias("any_bits"),
            F.bit_xor("o_orderkey").alias("parity_bits"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "fn_aes_roundtrip",
    category="string-fn",
    doc="AES encrypt/decrypt round trip.  ECB mode is used HERE ONLY for "
    "oracle determinism (the default GCM's random IV defeats value "
    "comparison); ECB is NOT safe for real at-rest encryption — it is "
    "deterministic and leaks equal-plaintext blocks.  Production "
    "column-level PII encryption should use Spark's default GCM mode. "
    "The oracle can't run AES, so it checks what IS deterministic — the "
    "recovered plaintext equals the original and the ciphertext length "
    "is the exact PKCS#7-padded block count.",
    oracle="""
        SELECT doc_id,
               substr(text, 1, 40) AS recovered,
               CAST(((LENGTH(substr(text, 1, 40)) // 16) + 1) * 16 AS INT)
                   AS cipher_len
        FROM documents WHERE doc_id % 31 = 0
        ORDER BY doc_id
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 31 == 0)
    key = F.lit("0123456789abcdef")  # 16-byte key
    head = F.substring("text", 1, 40)
    cipher = F.aes_encrypt(head, key, F.lit("ECB"))
    return docs.select(
        "doc_id",
        F.aes_decrypt(cipher, key, F.lit("ECB")).cast("string").alias("recovered"),
        F.length(cipher).cast("int").alias("cipher_len"),
    ).orderBy("doc_id")


@register(
    "fn_round_modes",
    category="math-fn",
    doc="Rounding-mode battery on EXACT decimal midpoints (cents/100 as "
    "DECIMAL(12,2), so .x5 cases are exact, never the double-midpoint "
    "trap): round (HALF_UP, away from zero) vs bround (HALF_EVEN, "
    "banker's) vs ceil/floor with negative scale.  DuckDB twins: ROUND "
    "/ ROUND_EVEN on decimals.",
    oracle="""
        SELECT o_orderkey,
               -- exact integer deci-units: DuckDB's ROUND_EVEN is
               -- double-only and misrounds exact decimal midpoints
               CAST(c // 10 + CASE WHEN c % 10 >= 5 THEN 1 ELSE 0 END
                    AS BIGINT) AS half_up_deci,
               CAST(c // 10 + CASE WHEN c % 10 > 5
                                   OR (c % 10 = 5 AND (c // 10) % 2 = 1)
                              THEN 1 ELSE 0 END AS BIGINT) AS half_even_deci,
               CAST(CEIL(dec1) AS DOUBLE)           AS ceiled,
               CAST(FLOOR(dec1) AS DOUBLE)          AS floored,
               CAST(ROUND(dec1, -1) AS DOUBLE)      AS tens
        FROM (
            SELECT o_orderkey,
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c,
                   CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS
                        DECIMAL(14,0)) / 100 AS dec1
            FROM orders WHERE o_orderkey % 41 = 0
        )
        ORDER BY o_orderkey
    """,
)
def fn_round_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 41 == 0)
    dec1 = (
        F.round(F.col("o_totalprice") * 100, 0).cast("long").cast("decimal(14,0)") / 100
    ).alias("dec1")
    v = orders.select("o_orderkey", dec1)
    return v.select(
        "o_orderkey",
        (F.round("dec1", 1) * 10).cast("long").alias("half_up_deci"),
        (F.bround("dec1", 1) * 10).cast("long").alias("half_even_deci"),
        F.ceil("dec1").cast("double").alias("ceiled"),
        F.floor("dec1").cast("double").alias("floored"),
        F.round("dec1", -1).cast("double").alias("tens"),
    ).orderBy("o_orderkey")


@register(
    "fn_string_repr",
    category="string-fn",
    doc="Representation battery: bin (binary digits of the key), chr "
    "(codepoint to char), btrim with a custom trim set, bit_length, "
    "left/right slices.",
    oracle="""
        SELECT o_orderkey,
               bin(o_orderkey)                             AS key_bits,
               chr(65 + CAST(o_orderkey % 26 AS INT))      AS key_char,
               trim(o_orderpriority, '0123456789-')        AS pri_word,
               CAST(8 * LENGTH(o_orderstatus) AS INT)      AS status_bits,
               left(o_orderpriority, 3)                    AS l3,
               right(o_orderpriority, 4)                   AS r4
        FROM orders WHERE o_orderkey % 43 = 0
        ORDER BY o_orderkey
    """,
)
def fn_string_repr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 43 == 0)
    return orders.select(
        "o_orderkey",
        F.bin("o_orderkey").alias("key_bits"),
        F.chr(F.lit(65) + F.pmod("o_orderkey", F.lit(26))).alias("key_char"),
        F.btrim("o_orderpriority", F.lit("0123456789-")).alias("pri_word"),
        F.bit_length("o_orderstatus").cast("int").alias("status_bits"),
        F.left(F.col("o_orderpriority"), F.lit(3)).alias("l3"),
        F.right(F.col("o_orderpriority"), F.lit(4)).alias("r4"),
    ).orderBy("o_orderkey")


@register(
    "fn_inline_structs",
    category="array-fn",
    doc="inline() generator over an array of structs: each embedding "
    "yields (pos, cents, sq) rows from a transform-built struct array — "
    "the multi-column generator (explode yields one column, inline "
    "yields the struct's fields as columns).  arrays_zip provides the "
    "struct source; everything stays JVM-side.",
    oracle="""
        SELECT vec_id,
               CAST(i AS INT) AS pos,
               -- FLOOR(double*100 + 0.5): pure double arithmetic, exact
               -- and engine-identical for every input (decimal ROUND on
               -- a float32 product is the midpoint class sf1 surfaced
               -- in fn_array_setops)
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 100 + 0.5)
                    AS BIGINT) AS cents,
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 100 + 0.5)
                    AS BIGINT)
                   * CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS sq
        FROM embeddings, range(1, 5) t(i)
        WHERE vec_id % 29 = 0
        ORDER BY vec_id, pos
    """,
)
def fn_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 29 == 0)
    structs = F.transform(
        F.sequence(F.lit(1), F.lit(4)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.floor(
                F.element_at("embedding", i.cast("int")).cast("double") * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cents"),
        ),
    )
    return (
        emb.select("vec_id", F.inline(structs))
        .withColumn("sq", F.col("cents") * F.col("cents"))
        .orderBy("vec_id", "pos")
    )
