"""Text-analysis queries over `documents`: language ID, quality scoring,
token counting, fingerprinting — all pure column expressions (scan-speed
at 100 TB), each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash_expr
from flow_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_features,
    quality_score,
    token_count_bpe_ish,
    token_count_whitespace,
)
from flow_spark.queries.registry import register

_SQL_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"


def _sql_lang_score(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter({_SQL_TOKS}, t -> t IN ({markers})))"


def _sql_lang_id() -> str:
    """Mirror operators.text.lang_id: asc-lang argmax with > tiebreak."""
    langs = sorted(LANG_MARKERS)
    best_lang = f"'{langs[0]}'"
    best_score = f"s_{langs[0]}"
    for lang in langs[1:]:
        best_lang = f"(CASE WHEN s_{lang} > {best_score} THEN '{lang}' ELSE {best_lang} END)"
        best_score = f"greatest(s_{lang}, {best_score})"
    return f"(CASE WHEN {best_score} > 0 THEN {best_lang} ELSE 'und' END)"


@register(
    "text_lang_id",
    category="text-analysis",
    doc="Heuristic language ID: per-language marker-token evidence, "
    "deterministic argmax; compared with the labeled lang.",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_lang_score('de')} AS s_de,
                   {_sql_lang_score('en')} AS s_en,
                   {_sql_lang_score('es')} AS s_es,
                   {_sql_lang_score('fr')} AS s_fr
            FROM documents
        )
        SELECT doc_id, {_sql_lang_id()} AS predicted,
               CAST(({_sql_lang_id()} = lang) AS BOOLEAN) AS hit
        FROM scored
        ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = lang_id(F.col("text"))
    return docs.select(
        "doc_id",
        pred.alias("predicted"),
        (pred == F.col("lang")).alias("hit"),
    ).orderBy("doc_id")


@register(
    "text_quality",
    category="text-analysis",
    doc="Quality features (length, punct ratio, stopword ratio, mean token "
    "length) and composite score per document.",
    oracle=rf"""
        WITH feats AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len({_SQL_TOKS}) AS n_tokens,
                   (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                       / CAST(length(text) AS DOUBLE) AS punct_ratio,
                   len(list_filter({_SQL_TOKS},
                       t -> t IN ({", ".join(f"'{m}'" for ms in sorted(LANG_MARKERS) for m in LANG_MARKERS[ms])})))
                       / CAST(len({_SQL_TOKS}) AS DOUBLE) AS stopword_ratio,
                   list_sum(list_transform({_SQL_TOKS}, t -> length(t)))
                       / CAST(len({_SQL_TOKS}) AS DOUBLE) AS mean_token_len
            FROM documents WHERE doc_id % 3 = 0
        )
        SELECT doc_id, n_chars, n_tokens,
               ROUND(punct_ratio, 4) AS punct_ratio,
               ROUND(stopword_ratio, 4) AS stopword_ratio,
               ROUND(mean_token_len, 4) AS mean_token_len,
               ROUND(least(n_tokens / 20.0, 1.0)
                     * greatest(0.0, 1.0 - punct_ratio * 5)
                     * (CASE WHEN mean_token_len >= 2 AND mean_token_len <= 12
                             THEN 1.0 ELSE 0.5 END), 4) AS score
        FROM feats
        ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    f = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        F.round(f["punct_ratio"], 4).alias("punct_ratio"),
        F.round(f["stopword_ratio"], 4).alias("stopword_ratio"),
        F.round(f["mean_token_len"], 4).alias("mean_token_len"),
        quality_score(F.col("text")).alias("score"),
    ).orderBy("doc_id")


@register(
    "text_token_stats",
    category="text-analysis",
    doc="Token counting (whitespace + BPE-ish regex pre-tokenizer) rolled "
    "up per language/source.",
    oracle=rf"""
        WITH per_doc AS (
            SELECT lang,
                   len({_SQL_TOKS}) AS n_ws,
                   len(regexp_extract_all(text, '(\w+|[^\w\s])')) AS n_bpe,
                   n_chars
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
               CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
               ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe), 4) AS chars_per_token
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        token_count_whitespace(F.col("text")).alias("n_ws"),
        token_count_bpe_ish(F.col("text")).alias("n_bpe"),
        "n_chars",
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_ws").cast("bigint").alias("total_ws_tokens"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe_tokens"),
            F.round(F.sum("n_chars").cast("double") / F.sum("n_bpe"), 4).alias(
                "chars_per_token"
            ),
        )
        .orderBy("lang")
    )


@register(
    "text_fingerprint",
    category="text-analysis",
    doc="Deterministic 60-bit document fingerprint (md5 of normalized text) "
    "+ per-source duplicate-fingerprint counts.",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, source,
                   {portable_hash_expr(_SQL_NORM, salt='fp')} AS fingerprint
            FROM documents
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT fingerprint) AS n_unique
        FROM fp
        GROUP BY source
        ORDER BY source
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("source", fingerprint(F.col("text")).alias("fingerprint"))
    return (
        fp.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("fingerprint").alias("n_unique"),
        )
        .orderBy("source")
    )


@register(
    "text_top_terms",
    category="text-analysis",
    doc="TF-IDF-style distinguishing terms: top-3 per document scored by "
    "tf/df (rational arithmetic only — no log/exp, whose libm rounding "
    "differs between engines). Document frequency is one agg over the "
    "exploded tokens; per-doc ranking is a bounded window.",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, UNNEST(string_split(
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
            FROM documents
        ),
        toks_f AS (SELECT doc_id, term FROM toks WHERE length(term) > 3),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_f GROUP BY 1, 2),
        df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_f GROUP BY 1),
        scored AS (
            SELECT doc_id, term,
                   CAST(tf AS DOUBLE) / df AS score,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY CAST(tf AS DOUBLE) / df DESC,
                                               term ASC) AS rnk
            FROM tf JOIN df USING (term)
        )
        SELECT doc_id, term, rnk, ROUND(score, 6) AS score
        FROM scored
        WHERE rnk <= 3 AND doc_id % 50 = 0
        ORDER BY doc_id, rnk
    """,
)
def text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 3)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    score = F.col("tf").cast("double") / F.col("df")
    w = W.partitionBy("doc_id").orderBy(F.desc(score), F.asc("term"))
    return (
        tf.join(df, "term")
        .withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") % 50 == 0))
        .select("doc_id", "term", "rnk", F.round(score, 6).alias("score"))
        .orderBy("doc_id", "rnk")
    )


@register(
    "sample_hash_pct",
    category="text-analysis",
    doc="Reproducible sampling: keep rows where pmod(hash(id), 100) < 10. "
    "Unlike rand()-based sampling this is deterministic across engines, "
    "re-runs, and repartitioning — the only sampling that belongs in a "
    "100 TB curation pipeline (rand() resamples on every retry/re-plan).",
    oracle=f"""
        SELECT COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        FROM documents
        WHERE {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='sample')} % 100 < 10
    """,
)
def sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    keep = F.pmod(portable_hash64(F.col("doc_id").cast("string"), salt="sample"), F.lit(100)) < 10
    return docs.filter(keep).agg(
        F.count("*").alias("n_sampled"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
    )


@register(
    "curation_pipeline",
    category="text-analysis",
    doc="End-to-end corpus curation in one declarative pass: language "
    "filter (en) + quality-score threshold + length bounds + exact-dedup "
    "keeper selection, reporting per-source survival counts — the "
    "standard pre-training data funnel, all Catalyst-optimizable.",
    oracle=rf"""
        WITH feats AS (
            SELECT doc_id, source, lang, n_chars, text,
                   len({_SQL_TOKS}) AS n_tokens,
                   (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                       / CAST(length(text) AS DOUBLE) AS punct_ratio,
                   list_sum(list_transform({_SQL_TOKS}, t -> length(t)))
                       / CAST(len({_SQL_TOKS}) AS DOUBLE) AS mean_token_len
            FROM documents
        ),
        scored AS (
            SELECT *,
                   least(n_tokens / 20.0, 1.0)
                   * greatest(0.0, 1.0 - punct_ratio * 5)
                   * (CASE WHEN mean_token_len >= 2 AND mean_token_len <= 12
                           THEN 1.0 ELSE 0.5 END) AS score
            FROM feats
        ),
        kept AS (
            SELECT * FROM scored
            WHERE lang = 'en' AND score >= 0.5
              AND n_chars BETWEEN 100 AND 10000
        ),
        deduped AS (
            SELECT MIN(doc_id) AS keeper, MIN(source) AS source
            FROM kept GROUP BY {_SQL_NORM}
        )
        SELECT source,
               COUNT(*) AS n_kept,
               CAST(SUM(keeper) AS BIGINT) AS id_sum
        FROM deduped GROUP BY source ORDER BY source
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.dedup import normalize_text
    from flow_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    kept = docs.filter(
        (F.col("lang") == "en")
        & (quality_score(F.col("text")) >= 0.5)
        & F.col("n_chars").between(100, 10000)
    )
    deduped = kept.groupBy(normalize_text(F.col("text")).alias("norm")).agg(
        F.min("doc_id").alias("keeper"), F.min("source").alias("source")
    )
    return (
        deduped.groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("keeper").cast("bigint").alias("id_sum"))
        .orderBy("source")
    )


@register(
    "text_tfidf_topk",
    category="text",
    doc="TF-IDF-style keyword extraction, exactly oracle-checked: "
    "score = tf * N / df (one IEEE division of exact integers — no "
    "log(), which differs between libm builds). Plan shape at 100 TB: "
    "tf is a map-side-combinable agg on (doc, term); df is an agg over "
    "the term domain (|vocab| rows, broadcast back); the per-doc top-3 "
    "window partitions by doc_id with a (score desc, term) ordering "
    "whose tiebreak makes the result total-order deterministic.",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok WHERE term <> '' GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df
            FROM tok WHERE term <> '' GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, score
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY score DESC, term) AS rn
              FROM scored)
        WHERE rn <= 3
        ORDER BY doc_id, term
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
        .orderBy("doc_id", "term")
    )


@register(
    "text_bigram_freq",
    category="text-analysis",
    doc="Corpus bigram frequencies (language-model-style n-gram stats): "
    "top-20 word bigrams with counts and document frequency, "
    "deterministic tiebreak on the bigram itself. Spark builds bigrams "
    "with zip_with(words, words[2:]) — one narrow JVM pass, then a "
    "map-side-combinable count on the bigram key; the oracle uses a "
    "constant-bound range + filter (DuckDB range() takes no lateral "
    "column bound). At 100 TB the bigram key space is Zipfian — the "
    "count agg handles hot keys via partial aggregation, unlike a "
    "naive groupBy-collect.",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        big AS (
            SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
            FROM w CROSS JOIN range(1, 512) t(i)
            WHERE i < len(ws) AND ws[i] <> '' AND ws[i + 1] <> ''
        )
        SELECT bigram, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        FROM big
        GROUP BY bigram
        ORDER BY n DESC, bigram
        LIMIT 20
    """,
)
def text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("ws"))
    # zip_with pads to the longer list: the trailing (last, NULL) pair
    # yields NULL, dropped by the filter below
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                "ws",
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.when(
                    (a != "") & (b != ""), F.concat(a, F.lit(" "), b)
                ),
            )
        ).alias("bigram"),
    ).filter(F.col("bigram").isNotNull())
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@register(
    "text_repetition_quality",
    category="text-analysis",
    doc="Gopher-style repetition signals per source: corpus type/token "
    "ratio and top-token mass, plus a per-doc repetitive flag.  Ratios "
    "are single divisions of exact integer sums (not averages of per-doc "
    "doubles) and the flag compares scaled integers, so the result is "
    "bit-stable under any partitioning — the property a 100 TB quality "
    "filter needs (a re-plan must not reclassify documents).",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source, unnest({_SQL_TOKS}) AS tok
            FROM documents
        ),
        cnt AS (
            SELECT doc_id, source, tok, COUNT(*) AS c
            FROM t GROUP BY doc_id, source, tok
        ),
        per_doc AS (
            SELECT doc_id, source,
                   CAST(SUM(c) AS BIGINT)  AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(MAX(c) AS BIGINT)  AS top_c
            FROM cnt GROUP BY doc_id, source
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(ROUND(CAST(SUM(n_types) AS DOUBLE) / SUM(n_tokens), 6)
                    AS DOUBLE) AS type_token_ratio,
               CAST(ROUND(CAST(SUM(top_c) AS DOUBLE) / SUM(n_tokens), 6)
                    AS DOUBLE) AS top_token_mass,
               CAST(SUM(CASE WHEN 2 * n_types < n_tokens
                               OR 25 * top_c >= 3 * n_tokens
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive
        FROM per_doc
        GROUP BY source
        ORDER BY source
    """,
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("tok"))
    cnt = t.groupBy("doc_id", "source", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = cnt.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.max("c").alias("top_c"),
    )
    # repetitive iff TTR < 0.5 or top-token mass >= 0.12, tested in exact
    # integer space (2*types < tokens; 25*top >= 3*tokens)
    repetitive = (2 * F.col("n_types") < F.col("n_tokens")) | (
        25 * F.col("top_c") >= 3 * F.col("n_tokens")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("n_types").cast("double") / F.sum("n_tokens"), 6
            ).alias("type_token_ratio"),
            F.round(
                F.sum("top_c").cast("double") / F.sum("n_tokens"), 6
            ).alias("top_token_mass"),
            F.sum(F.when(repetitive, 1).otherwise(0)).cast("bigint").alias("n_repetitive"),
        )
        .orderBy("source")
    )


@register(
    "sample_stratified",
    category="text-analysis",
    doc="Stratified deterministic sampling: per-language keep rates "
    "(en 25%, zh 5%, others 10%) applied via the portable doc_id hash, "
    "so the SAME documents survive in Spark, DuckDB, and any re-run — "
    "rand()/sampleBy would resample per retry.  At 100 TB this is a "
    "pure scan+filter (no shuffle until the tiny per-stratum rollup).",
    oracle=f"""
        SELECT lang,
               COUNT(*) AS n_sampled,
               CAST(SUM(doc_id) AS BIGINT)  AS id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_sum
        FROM documents
        WHERE {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='strat')} % 100
              < (CASE lang WHEN 'en' THEN 25 WHEN 'zh' THEN 5 ELSE 10 END)
        GROUP BY lang
        ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 25)
        .when(F.col("lang") == "zh", 5)
        .otherwise(10)
    )
    keep = (
        F.pmod(portable_hash64(F.col("doc_id").cast("string"), salt="strat"), F.lit(100))
        < rate
    )
    return (
        docs.filter(keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.sum("n_chars").cast("bigint").alias("chars_sum"),
        )
        .orderBy("lang")
    )


@register(
    "text_pii_redact",
    category="text-analysis",
    doc="PII scrubbing: global regexp redaction of emails and IPv4s with "
    "per-source match accounting.  The fixture corpus contains no PII, so "
    "the query first derives a deterministic contact line per doc "
    "(identically in both engines) and then redacts it — the operator "
    "under test is the redaction pass itself: Spark regexp_replace is "
    "global like DuckDB's 'g' flag, and the patterns stay inside the "
    "Java-regex/RE2 common subset.  At 100 TB this is scan-speed "
    "columnar work, no shuffle before the rollup.",
    oracle=r"""
        WITH lined AS (
            SELECT source,
                   concat('contact user', doc_id, '@example.com ip=10.0.',
                          doc_id % 256, '.1 ', text) AS line
            FROM documents
        ),
        red AS (
            SELECT source,
                   length(line) AS len_raw,
                   len(regexp_extract_all(line,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(line,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                   length(regexp_replace(regexp_replace(line,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '[EMAIL]', 'g'),
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '[IP]', 'g')) AS len_redacted
            FROM lined
        )
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
               CAST(SUM(n_ip) AS BIGINT)    AS ips_redacted,
               CAST(SUM(len_raw - len_redacted) AS BIGINT) AS chars_removed
        FROM red
        GROUP BY source
        ORDER BY source
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    email_pat = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    ip_pat = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    docs = load_table(spark, sf_dir, "documents")
    lined = docs.select(
        "source",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip=10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 "),
            F.col("text"),
        ).alias("line"),
    )
    red = lined.select(
        "source",
        F.length("line").alias("len_raw"),
        F.regexp_count(F.col("line"), F.lit(email_pat)).alias("n_email"),
        F.regexp_count(F.col("line"), F.lit(ip_pat)).alias("n_ip"),
        F.length(
            F.regexp_replace(
                F.regexp_replace("line", email_pat, "[EMAIL]"), ip_pat, "[IP]"
            )
        ).alias("len_redacted"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("emails_redacted"),
            F.sum("n_ip").cast("bigint").alias("ips_redacted"),
            F.sum(F.col("len_raw") - F.col("len_redacted")).cast("bigint").alias(
                "chars_removed"
            ),
        )
        .orderBy("source")
    )


@register(
    "sample_reservoir_per_group",
    category="text-analysis",
    doc="Deterministic per-group 'reservoir': the 3 docs with the "
    "smallest portable hash per language are a uniform-without-"
    "replacement sample that every engine, retry, and re-partitioning "
    "reproduces bit-identically (a true random reservoir depends on "
    "row arrival order — unusable as 100 TB pipeline state).  One "
    "shuffle: hash ranking and selection ride a single window.",
    oracle=f"""
        WITH h AS (
            SELECT lang, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='resv')},
                                doc_id
                   ) AS rn
            FROM documents
        )
        SELECT lang, rn, doc_id, n_chars
        FROM h WHERE rn <= 3
        ORDER BY lang, rn
    """,
)
def sample_reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    hv = portable_hash64(F.col("doc_id").cast("string"), salt="resv")
    w = W.partitionBy("lang").orderBy(hv.asc(), F.col("doc_id").asc())
    return (
        docs.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("lang", "rn", "doc_id", "n_chars")
        .orderBy("lang", "rn")
    )


@register(
    "sample_train_val_test",
    category="text-analysis",
    doc="Deterministic 80/10/10 train/val/test assignment from the "
    "portable doc hash — every engine, re-run, and repartitioning "
    "assigns each document to the SAME split (a rand()-based split "
    "leaks val docs into train on any retry); per-(split, lang) counts "
    "verify both the proportions and the assignment.",
    oracle=f"""
        WITH assigned AS (
            SELECT lang, doc_id, n_chars,
                   CASE WHEN h < 80 THEN 'train'
                        WHEN h < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT *, {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='tvt')}
                          % 100 AS h
                FROM documents
            )
        )
        SELECT split, lang, COUNT(*) AS n,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM assigned
        GROUP BY split, lang
        ORDER BY split, lang
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    h = F.pmod(portable_hash64(F.col("doc_id").cast("string"), salt="tvt"), F.lit(100))
    split = (
        F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    )
    return (
        docs.select("lang", "doc_id", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("doc_id").cast("bigint").alias("id_sum"))
        .orderBy("split", "lang")
    )


@register(
    "text_lang_confusion",
    category="text-analysis",
    doc="Language-ID confusion matrix: predicted (marker-evidence argmax) "
    "vs labeled language, with per-cell counts — the evaluation rollup "
    "that turns the lang_id operator into a measurable classifier; "
    "composition of the same deterministic scorer as text_lang_id, "
    "still pure column expressions at scan speed.",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   {_sql_lang_score('de')} AS s_de,
                   {_sql_lang_score('en')} AS s_en,
                   {_sql_lang_score('es')} AS s_es,
                   {_sql_lang_score('fr')} AS s_fr
            FROM documents
        )
        SELECT lang AS labeled, {_sql_lang_id()} AS predicted,
               COUNT(*) AS n
        FROM scored
        GROUP BY labeled, predicted
        ORDER BY labeled, predicted
    """,
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("lang").alias("labeled"), lang_id(F.col("text")).alias("predicted"))
        .groupBy("labeled", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("labeled", "predicted")
    )


@register(
    "text_contamination_check",
    category="text",
    doc="Benchmark-contamination detection (decontamination pass of an "
    "LLM training pipeline): the 'benchmark' is an 8-word excerpt (words "
    "4..11) of every doc_id %% 53 == 0 document; every corpus document is "
    "8-gram-shingled (JVM higher-order functions, no Python) and probed "
    "against the broadcast excerpt set.  Scale shape: the benchmark side "
    "is tiny by construction -> broadcast hash join against the shingle "
    "stream, zero shuffle of the corpus; the per-doc rollup shuffles "
    "only matching (doc, excerpt) pairs (rare at 100 TB).",
    oracle="""
        WITH normed AS (
            SELECT doc_id, string_split(trim(regexp_replace(lower(text),
                   '\\s+', ' ', 'g')), ' ') AS w
            FROM documents
        ),
        bench AS (
            SELECT doc_id AS bench_id,
                   array_to_string(w[4:11], ' ') AS excerpt
            FROM normed
            WHERE doc_id % 53 = 0 AND len(w) >= 11
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   UNNEST(list_transform(range(1, greatest(len(w) - 7, 0) + 1),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                               w[i+3] || ' ' || w[i+4] || ' ' || w[i+5] || ' ' ||
                               w[i+6] || ' ' || w[i+7])) AS shingle
            FROM normed
        )
        SELECT g.doc_id,
               COUNT(DISTINCT b.bench_id) AS n_bench_hits,
               COUNT(*)                   AS n_gram_hits
        FROM grams g JOIN bench b ON g.shingle = b.excerpt
        GROUP BY g.doc_id
        ORDER BY g.doc_id
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.dedup import normalize_text, word_shingles

    docs = load_table(spark, sf_dir, "documents")
    normed = docs.select("doc_id", F.split(normalize_text(F.col("text")), " ").alias("w"))
    bench = (
        normed.filter((F.col("doc_id") % 53 == 0) & (F.size("w") >= 11))
        .select(
            F.col("doc_id").alias("bench_id"),
            F.concat_ws(" ", F.slice("w", 4, 8)).alias("excerpt"),
        )
    )
    grams = word_shingles(docs, n=8, distinct=True)
    return (
        grams.join(F.broadcast(bench), grams.shingle == bench.excerpt)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("bench_id").alias("n_bench_hits"),
            F.count("*").alias("n_gram_hits"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_weighted_bernoulli",
    category="text-analysis",
    doc="Deterministic WEIGHTED sampling: each doc keeps with probability "
    "proportional to its length (min(1, n_chars / 4000)) — the "
    "importance-sampling step of curation (keep more of the long/rare "
    "material) made reproducible: the coin is pmod(hash(id), 4000) "
    "compared against the doc's own integer threshold, so the decision "
    "is identical across engines, retries, and repartitionings, per "
    "doc.  Contrast rand() < p, which resamples on every re-plan.",
    oracle=f"""
        SELECT source,
               COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum,
               CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM documents
        WHERE {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='wsample')} % 4000
              < LEAST(n_chars, 4000)
        GROUP BY source
        ORDER BY source
    """,
)
def sample_weighted_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    coin = F.pmod(
        portable_hash64(F.col("doc_id").cast("string"), salt="wsample"),
        F.lit(4000),
    )
    kept = docs.filter(coin < F.least(F.col("n_chars"), F.lit(4000)))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


@register(
    "sample_epoch_shuffle",
    category="text-analysis",
    doc="Deterministic EPOCH RESHUFFLE for training-data delivery: each "
    "epoch assigns every doc a shard (hash % 8, epoch-salted) and an "
    "intra-shard position (rank of the salted hash within the shard) — "
    "a fresh pseudo-random permutation per epoch that is reproducible "
    "under retries/re-plans and needs NO GLOBAL SORT: the shard "
    "assignment is one hash, the position a per-shard window over "
    "hash-partitioned data, so at 100 TB every shard ranks "
    "independently (vs. a rank over the whole corpus, which would "
    "funnel through a range-partitioned global sort per epoch).  The "
    "oracle replays both epochs' placements bit-for-bit.",
    oracle=f"""
        WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
        salted AS (
            SELECT d.doc_id, e.epoch,
                   {portable_hash_expr(
                       "concat('ep', CAST(e.epoch AS VARCHAR), ':',"
                       " CAST(d.doc_id AS VARCHAR))")} AS h
            FROM documents d CROSS JOIN e
        ),
        placed AS (
            SELECT doc_id, epoch, h % 8 AS shard,
                   ROW_NUMBER() OVER (
                       PARTITION BY epoch, h % 8 ORDER BY h, doc_id
                   ) - 1 AS pos
            FROM salted
        )
        SELECT doc_id, CAST(epoch AS BIGINT) AS epoch,
               CAST(shard AS BIGINT) AS shard, CAST(pos AS BIGINT) AS pos
        FROM placed
        ORDER BY epoch, shard, pos
    """,
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    salted = docs.crossJoin(epochs).select(
        "doc_id",
        "epoch",
        portable_hash64(
            F.concat(
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    # h is a non-negative 60-bit value: plain % == pmod in both engines
    placed = salted.withColumn("shard", F.col("h") % F.lit(8)).withColumn(
        "pos",
        F.row_number().over(
            W.partitionBy("epoch", "shard").orderBy("h", "doc_id")
        )
        - 1,
    )
    return placed.select(
        "doc_id",
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("shard").cast("bigint").alias("shard"),
        F.col("pos").cast("bigint").alias("pos"),
    ).orderBy("epoch", "shard", "pos")


@register(
    "sample_source_rebalance",
    category="text-analysis",
    doc="Deterministic source-mix rebalancing: every source is downsampled "
    "to the SMALLEST source's document count (uniform target mix), "
    "keeping each source's lowest portable-hash doc_ids — so the "
    "selection is reproducible across retries, engines, and "
    "repartitioning, unlike rand()-based resampling.  This is the "
    "domain-weighting step of a pre-training mix.  Here the exact-n "
    "selection is a per-source window rank (one shuffle on source); at "
    "100 TB swap the rank for a per-source hash THRESHOLD (keep hv < "
    "target/total * 2^60) — no global sort, same determinism, "
    "approximate n within per-bucket noise.",
    oracle=f"""
        WITH h AS (
            SELECT source, doc_id,
                   {portable_hash_expr("CAST(doc_id AS VARCHAR)", salt='rebal')}
                       AS hv
            FROM documents
        ),
        ranked AS (
            SELECT source, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY hv, doc_id) AS rn
            FROM h
        ),
        tgt AS (
            SELECT MIN(cnt) AS target
            FROM (SELECT COUNT(*) AS cnt FROM documents GROUP BY source)
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS id_sum
        FROM ranked, tgt
        WHERE rn <= target
        GROUP BY source
        ORDER BY source
    """,
)
def sample_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from flow_spark.functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        portable_hash64(F.col("doc_id").cast("string"), salt="rebal").alias("hv"),
    )
    target = docs.groupBy("source").count().agg(F.min("count").alias("target"))
    w = Window.partitionBy("source").orderBy("hv", "doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w))
    return (
        ranked.crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("target"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("source")
    )


@register(
    "text_oov_rate",
    category="text-analysis",
    doc="Out-of-vocabulary rate: corpus vocabulary = top-100 tokens by "
    "document frequency (ties broken lexically), each document scored "
    "by how many of its tokens fall outside it — the log-free novelty/"
    "quality feature (high OOV = jargon, noise, or another language).  "
    "Exact integer numerator/denominator; the vocabulary is a broadcast "
    "semi-join, the token explode is the same one the TF-IDF pass uses.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_SQL_TOKS}) AS tok
            FROM documents
        ),
        df AS (
            SELECT tok, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
        ),
        vocab AS (
            SELECT tok FROM df
            ORDER BY df DESC, tok
            LIMIT 100
        )
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (WHERE v.tok IS NULL) AS BIGINT) AS n_oov
        FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        WHERE t.doc_id % 9 = 0
        GROUP BY t.doc_id
        ORDER BY t.doc_id
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    vocab = (
        toks.groupBy("tok")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.desc("df"), F.asc("tok"))
        .limit(100)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.filter(F.col("doc_id") % 9 == 0)
        .join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("in_vocab").isNull()).cast("long").alias("n_oov"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_split_by_group",
    category="text-analysis",
    doc="GROUP-leakage-free train/val/test split: the split key is the "
    "USER hash, not the event hash, so every event of a user lands in "
    "the same split — the assignment a row-level split gets wrong "
    "(a user's history leaking across train and val inflates eval).  "
    "Same portable-hash determinism as sample_train_val_test: retries, "
    "repartitions and both engines agree row for row.  Outputs "
    "per-split distinct-user and event counts plus an exact value sum; "
    "the per-split user counts summing to the global distinct-user "
    "count IS the no-leakage invariant (a user in two splits would "
    "double-count).  One hash + one aggregation: scan-speed at 100 TB.",
    oracle=f"""
        WITH assigned AS (
            SELECT user_id, value,
                   CASE WHEN h < 80 THEN 'train'
                        WHEN h < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (
                SELECT *,
                       {portable_hash_expr("CAST(user_id AS VARCHAR)", salt='grpsplit')}
                       % 100 AS h
                FROM events
            )
        )
        SELECT split,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_cents_sum
        FROM assigned
        GROUP BY split
        ORDER BY split
    """,
)
def sample_split_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    h = F.pmod(
        portable_hash64(F.col("user_id").cast("string"), salt="grpsplit"),
        F.lit(100),
    )
    split = F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    return (
        ev.select("user_id", "value", split.alias("split"))
        .groupBy("split")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("value_cents_sum"),
        )
        .orderBy("split")
    )


@register(
    "sample_temperature_mix",
    category="text-analysis",
    doc="Temperature-scaled source mixing (the Gopher/PaLM data-mixture "
    "recipe at T=2): target share of source s ∝ sqrt(n_s), which "
    "upsamples rare sources and downsamples dominant ones, applied as "
    "a deterministic hash-threshold filter.  The keep decision is the "
    "ALL-INTEGER cross-multiplication h * sumw * n_s < w_s * N * 2^20 "
    "with w_s = floor(sqrt(n_s)*1000) — the only FP op is the "
    "IEEE-exact sqrt, so both engines keep the identical row set "
    "(a normalized-double rate would flip boundary rows on the last "
    "bit).  One aggregate for the mixture table (broadcast back) + one "
    "scan: scan-speed at 100 TB, and retry/repartition stable like "
    "every sampler here.  Source groups are derived skewed (57/29/14%) "
    "from order keys; output = per-group original vs kept counts + "
    "exact id sums proving the assignment.",
    oracle=f"""
        WITH tagged AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0 THEN 'rare'
                        WHEN o_orderkey % 3 = 0 THEN 'mid'
                        ELSE 'common' END AS grp
            FROM orders
        ),
        sizes AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT)
                       AS w
            FROM tagged GROUP BY grp
        ),
        tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS big_n,
                   CAST(SUM(w) AS BIGINT) AS sumw
            FROM sizes
        ),
        kept AS (
            SELECT t.grp, t.o_orderkey, s.n, s.w
            FROM tagged t JOIN sizes s USING (grp), tot
            WHERE CAST(({portable_hash_expr("CAST(o_orderkey AS VARCHAR)", salt='tmix')}
                   % 1048576 + 1048576) % 1048576 AS HUGEINT) * tot.sumw * s.n
                  < CAST(s.w AS HUGEINT) * tot.big_n * 1048576
        )
        SELECT s.grp, s.n AS n_orig,
               CAST(COUNT(k.o_orderkey) AS BIGINT) AS n_kept,
               CAST(COALESCE(SUM(k.o_orderkey), 0) AS BIGINT) AS kept_id_sum
        FROM sizes s LEFT JOIN kept k ON k.grp = s.grp
        GROUP BY s.grp, s.n
        ORDER BY s.grp
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64

    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    grp = (
        F.when(k % 7 == 0, "rare").when(k % 3 == 0, "mid").otherwise("common")
    )
    tagged = o.select(k.alias("o_orderkey"), grp.alias("grp"))
    # the mixture table is tiny (one row per source): compute it ONCE,
    # collect to the driver, and re-broadcast as literals — re-deriving
    # `sizes` in each branch would rescan orders per reference
    size_rows = (
        tagged.groupBy("grp")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.floor(F.sqrt(F.count("*").cast("double")) * 1000)
            .cast("bigint")
            .alias("w"),
        )
        .collect()
    )
    big_n = sum(r.n for r in size_rows)
    sumw = sum(r.w for r in size_rows)
    sizes = spark.createDataFrame(
        [(r.grp, r.n, r.w) for r in size_rows], "grp string, n long, w long"
    )
    h = F.pmod(
        portable_hash64(F.col("o_orderkey").cast("string"), salt="tmix"),
        F.lit(1048576),
    )
    # decimal(38,0) keeps the cross-multiplication exact far past int64
    # (the oracle uses HUGEINT): at 100 TB row counts the int64 product
    # h * sumw * n would wrap silently in non-ANSI mode
    dec = "decimal(38,0)"
    kept = (
        tagged.join(F.broadcast(sizes), "grp")
        .filter(
            h.cast(dec) * F.lit(sumw).cast(dec) * F.col("n").cast(dec)
            < F.col("w").cast(dec)
            * F.lit(big_n).cast(dec)
            * F.lit(1048576).cast(dec)
        )
        .select("grp", "o_orderkey")
    )
    return (
        sizes.join(
            kept.groupBy("grp").agg(
                F.count("*").cast("bigint").alias("n_kept"),
                F.sum("o_orderkey").cast("bigint").alias("kept_id_sum"),
            ),
            "grp",
            "left",
        )
        .select(
            "grp",
            F.col("n").alias("n_orig"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_id_sum", F.lit(0)).cast("bigint").alias("kept_id_sum"),
        )
        .orderBy("grp")
    )


def _surprisal_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_toks, sum_info_bits): per-doc floor-log2 unigram
    surprisal sums — shared by the surprisal score and the CCNet buckets
    (identical pipeline: vocab groupBy, frequency join, 1-row total)."""
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    info = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (
                F.length(F.bin(F.col("n").cast("bigint")))
                - F.length(F.bin(F.col("c").cast("bigint")))
            ).alias("info_bits"),
        )
    )
    return info.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_toks"),
        F.sum("info_bits").cast("bigint").alias("sum_info_bits"),
    )


@register(
    "text_unigram_surprisal",
    category="text-analysis",
    doc="Unigram-LM perplexity proxy in exact integer space: each token's "
    "self-information is approximated by floor-log2 bit lengths — "
    "info_bits = bits(N) - bits(count(token)) where bits(x) = "
    "length(bin(x)) — so the whole scoring path is libm-free and "
    "bit-identical across engines (log/exp never appear; see the "
    "verify-skill gotcha list).  Docs whose mean surprisal is low are "
    "boilerplate/repetitive (common tokens only); very high means "
    "gibberish/rare-token soup — the standard cheap stand-in for a "
    "trained-LM perplexity filter.  Plan shape at 100 TB: one map-side-"
    "combinable groupBy builds the unigram table (vocab << corpus), one "
    "frequency-annotate shuffle join keyed on the token, one per-doc "
    "re-aggregation; the corpus-total N is a 1-row broadcast scalar.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_SQL_TOKS}) AS tok FROM documents
        ),
        vocab AS (
            SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
        ),
        total AS (SELECT SUM(c) AS n FROM vocab),
        info AS (
            SELECT t.doc_id,
                   length(bin(CAST(tt.n AS BIGINT)))
                       - length(bin(CAST(v.c AS BIGINT))) AS info_bits
            FROM toks t
            JOIN vocab v USING (tok)
            CROSS JOIN total tt
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(info_bits) AS BIGINT) AS sum_info_bits,
               CAST(1000 * SUM(info_bits) // COUNT(*) AS BIGINT)
                   AS mean_info_milli,
               CAST(CASE WHEN 1000 * SUM(info_bits) // COUNT(*) < 6000
                         THEN 1 ELSE 0 END AS BIGINT) AS flag_boilerplate
        FROM info
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def text_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = _surprisal_doc_stats(spark, sf_dir)
    # integer floor division on both sides (Spark `div` == DuckDB `//`)
    mean_milli = F.expr("(1000 * sum_info_bits) div n_toks")
    return agg.select(
        "doc_id",
        "n_toks",
        "sum_info_bits",
        mean_milli.cast("bigint").alias("mean_info_milli"),
        F.when(mean_milli < 6000, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flag_boilerplate"),
    ).orderBy("doc_id")


_BPE_VOCAB = 200  # words entering tokenizer training (top by freq)
_BPE_MERGES = 3  # unrolled merge iterations (oracle replays each)


#: re-split the double-space symbol encoding back into a symbol list
_SQL_RESPLIT = r"string_split_regex(trim(s), '\s+')"


def _bpe_encode(word_col):
    """Double-space symbol encoding of a word: '  c1  c2  ...  cN  '."""
    return F.concat(
        F.lit("  "), F.array_join(F.split(word_col, ""), "  "), F.lit("  ")
    )


def _bpe_apply_one(df: DataFrame, best: DataFrame, keep: list[str]) -> DataFrame:
    """Apply one learned merge (1-row frame with a, b) to every row's
    encoding `s`; `keep` lists the passthrough columns."""
    return df.crossJoin(F.broadcast(best)).select(
        *keep,
        F.replace(
            F.col("s"),
            F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"), F.lit(" ")),
            F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
        ).alias("s"),
    )


def _bpe_merge_chain(w: DataFrame):
    """Run _BPE_MERGES training iterations over the (word, freq, s) vocab.

    Returns (bests, states): bests[i] is the 1-row argmax-pair frame of
    iteration i+1; states[0] is the input and states[i] the vocab after
    merge i.  Everything stays lazy — Catalyst sees one chained plan.
    """
    bests, states = [], [w]
    for _ in range(_BPE_MERGES):
        cur = states[-1]
        sy = F.split(F.trim(F.col("s")), r"\s+")
        pairs = (
            # single-symbol words yield no pairs (and F.sequence(0, -1)
            # would DESCEND, so the guard is load-bearing)
            cur.filter(F.size(sy) >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(sy) - 2),
                        lambda j: F.struct(
                            F.element_at(sy, j + 1).alias("a"),
                            F.element_at(sy, j + 2).alias("b"),
                        ),
                    )
                ).alias("pr"),
            )
            .groupBy(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "a", "b").limit(1)
        bests.append(best)
        states.append(_bpe_apply_one(cur, best, ["word", "freq"]))
    return bests, states


def _sql_bpe_final(i: int) -> str:
    """The output row for merge i: the argmax pair + post-merge corpus size."""
    return f"""SELECT {i} AS merge_rank,
                   (SELECT a FROM b{i}) AS left_sym,
                   (SELECT b FROM b{i}) AS right_sym,
                   CAST((SELECT cnt FROM b{i}) AS BIGINT) AS pair_count,
                   CAST((SELECT SUM(freq * len({_SQL_RESPLIT}))
                         FROM w{i}) AS BIGINT) AS corpus_symbols_after
            """


def _sql_bpe_iter(i: int) -> str:
    """One unrolled BPE iteration: pair counts over w{i-1}, argmax pair
    b{i} (count DESC, pair ASC), greedy left-to-right merge into w{i}."""
    return f"""
        p{i} AS (
            SELECT sy[j] AS a, sy[j + 1] AS b, SUM(freq) AS cnt
            FROM (SELECT freq, {_SQL_RESPLIT} AS sy FROM w{i - 1})
            CROSS JOIN range(1, 64) t(j)
            WHERE j + 1 <= len(sy)
            GROUP BY sy[j], sy[j + 1]
        ),
        b{i} AS (SELECT a, b, cnt FROM p{i} ORDER BY cnt DESC, a, b LIMIT 1),
        w{i} AS (
            SELECT word, freq,
                   replace(s,
                           ' ' || (SELECT a FROM b{i}) || '  '
                               || (SELECT b FROM b{i}) || ' ',
                           ' ' || (SELECT a FROM b{i})
                               || (SELECT b FROM b{i}) || ' ') AS s
            FROM w{i - 1}
        )"""


@register(
    "text_bpe_train",
    category="text-analysis",
    doc=f"BPE tokenizer training, the step that turns a curated corpus "
    f"into a vocabulary: {_BPE_MERGES} merge iterations over the top-"
    f"{_BPE_VOCAB} words by frequency.  Each iteration is (1) adjacent-"
    "symbol pair counts weighted by word frequency — one map-side-"
    "combinable groupBy whose key space is the current vocab's pair set, "
    "(2) an exact argmax with full deterministic tiebreak (count DESC, "
    "pair ASC) as a 1-row broadcast, (3) a greedy left-to-right merge "
    "done by literal string replace over a double-space symbol encoding "
    "(' a  b ' -> ' ab ') whose non-overlapping scan IS the BPE merge "
    "rule — both engines replay it byte-identically, including odd runs "
    "like 'a a a' -> 'aa a'.  All iterations stay lazy (crossJoin of "
    "1-row argmax frames), so Catalyst sees one plan.  At 100 TB only "
    "the word-frequency groupBy touches the corpus; every merge "
    "iteration runs over the bounded vocabulary, which is exactly why "
    "distributed BPE training scales.",
    oracle=f"""
        WITH wf AS (
            SELECT tok AS word, COUNT(*) AS freq
            FROM (SELECT UNNEST({_SQL_TOKS}) AS tok FROM documents)
            WHERE tok <> ''
            GROUP BY tok
            ORDER BY freq DESC, word
            LIMIT {_BPE_VOCAB}
        ),
        w0 AS (
            SELECT word, freq,
                   '  ' || array_to_string(string_split(word, ''), '  ')
                        || '  ' AS s
            FROM wf
        ),
        {",".join(_sql_bpe_iter(i) for i in range(1, _BPE_MERGES + 1))}
        {" UNION ALL ".join(_sql_bpe_final(i) for i in range(1, _BPE_MERGES + 1))}
        ORDER BY merge_rank
    """,
)
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(_BPE_VOCAB)
    )
    w = wf.select("word", "freq", _bpe_encode(F.col("word")).alias("s"))
    bests, states = _bpe_merge_chain(w)
    out_rows = []
    for i in range(1, _BPE_MERGES + 1):
        best, w = bests[i - 1], states[i]
        n_after = w.agg(
            F.sum(
                F.col("freq") * F.size(F.split(F.trim(F.col("s")), r"\s+"))
            ).alias("n")
        )
        out_rows.append(
            best.crossJoin(n_after).select(
                F.lit(i).cast("int").alias("merge_rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.col("cnt").cast("bigint").alias("pair_count"),
                F.col("n").cast("bigint").alias("corpus_symbols_after"),
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("merge_rank")


def _sql_bpe_apply(i: int) -> str:
    """Apply learned merge b{i} to the full-corpus word table a{i-1}."""
    return f"""
        a{i} AS (
            SELECT word,
                   replace(s,
                           ' ' || (SELECT a FROM b{i}) || '  '
                               || (SELECT b FROM b{i}) || ' ',
                           ' ' || (SELECT a FROM b{i})
                               || (SELECT b FROM b{i}) || ' ') AS s
            FROM a{i - 1}
        )"""


@register(
    "text_bpe_apply",
    category="text-analysis",
    doc="The serving half of the tokenizer loop: apply the merges learned "
    "by text_bpe_train to EVERY word in the corpus (not just the "
    "training vocab — BPE merges apply wherever the pair occurs) and "
    "account the per-language compression (symbols per 1000 chars).  "
    "The apply path is a replace chain over the DISTINCT-word table, "
    "then one join from the exploded corpus tokens back to per-word "
    "symbol counts — the shape that scales: tokenization cost is "
    "O(vocabulary), corpus cost is one annotate join, and the learned "
    "merges ride along as three 1-row broadcasts.",
    oracle=f"""
        WITH wf AS (
            SELECT tok AS word, COUNT(*) AS freq
            FROM (SELECT UNNEST({_SQL_TOKS}) AS tok FROM documents)
            WHERE tok <> ''
            GROUP BY tok
            ORDER BY freq DESC, word
            LIMIT {_BPE_VOCAB}
        ),
        w0 AS (
            SELECT word, freq,
                   '  ' || array_to_string(string_split(word, ''), '  ')
                        || '  ' AS s
            FROM wf
        ),
        {",".join(_sql_bpe_iter(i) for i in range(1, _BPE_MERGES + 1))},
        allw AS (
            SELECT DISTINCT tok AS word
            FROM (SELECT UNNEST({_SQL_TOKS}) AS tok FROM documents)
            WHERE tok <> ''
        ),
        a0 AS (
            SELECT word,
                   '  ' || array_to_string(string_split(word, ''), '  ')
                        || '  ' AS s
            FROM allw
        ),
        {",".join(_sql_bpe_apply(i) for i in range(1, _BPE_MERGES + 1))},
        wl AS (
            SELECT word, len({_SQL_RESPLIT}) AS n_sym
            FROM a{_BPE_MERGES}
        ),
        dt AS (
            SELECT lang, tok
            FROM (SELECT lang, UNNEST({_SQL_TOKS}) AS tok FROM documents)
            WHERE tok <> ''
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(length(tok)) AS BIGINT) AS n_chars,
               CAST(SUM(n_sym) AS BIGINT) AS n_symbols,
               CAST(1000 * SUM(n_sym) // SUM(length(tok)) AS BIGINT)
                   AS symbols_per_1000_chars
        FROM dt JOIN wl ON wl.word = dt.tok
        GROUP BY lang
        ORDER BY lang
    """,
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    corpus_toks = docs.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok") != "")
    wf = (
        corpus_toks.groupBy(F.col("tok").alias("word"))
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(_BPE_VOCAB)
    )
    w = wf.select("word", "freq", _bpe_encode(F.col("word")).alias("s"))
    bests, _ = _bpe_merge_chain(w)
    allw = corpus_toks.select(F.col("tok").alias("word")).distinct()
    a = allw.select("word", _bpe_encode(F.col("word")).alias("s"))
    for best in bests:
        a = _bpe_apply_one(a, best, ["word"])
    wl = a.select(
        "word", F.size(F.split(F.trim(F.col("s")), r"\s+")).alias("n_sym")
    )
    return (
        corpus_toks.join(wl, corpus_toks.tok == wl.word)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.length("tok")).cast("bigint").alias("n_chars"),
            F.sum("n_sym").cast("bigint").alias("n_symbols"),
        )
        .select(
            "lang",
            "n_words",
            "n_chars",
            "n_symbols",
            F.expr("(1000 * n_symbols) div n_chars")
            .cast("bigint")
            .alias("symbols_per_1000_chars"),
        )
        .orderBy("lang")
    )


# ---- DSIR importance resampling --------------------------------------------

_DSIR_BUCKETS = 64  # hashed n-gram feature space (production: 10k buckets)


@register(
    "sample_importance_dsir",
    category="sampling",
    doc="DSIR (Xie et al. 2023, arXiv:2302.03169) data selection via "
    "importance resampling: documents score by how much their hashed "
    "unigram features look like a TARGET domain (here lang='en', the "
    "quality-corpus stand-in) versus the RAW corpus.  Per bucket b the "
    "importance weight is the EXACT integer permille deviation of the "
    "target/raw probability ratio — w_b = (1000 * (t_b+1) * R) // "
    "((r_b+1) * T) - 1000 with add-1 smoothing (~1000*ln ratio for "
    "small deviations) — floor division on BIGINTs, so the whole path "
    "is libm-free and bit-identical across engines; a doc's score is "
    "the sum of its tokens' bucket weights and keep = score >= 0.  Plan "
    f"shape at 100 TB: ONE explode+groupBy builds the {_DSIR_BUCKETS}-"
    "row weight table (map-side combinable, output tiny), which then "
    "broadcast-joins back onto the token stream — no second shuffle; "
    "the per-doc sum re-uses the doc_id partitioning.  At production "
    "token counts the (count x total) products exceed int64 — swap the "
    "ratio operands to decimal(38,0); nothing else changes.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   UNNEST({_SQL_TOKS}) AS tok
            FROM documents
        ),
        b AS (
            SELECT doc_id, lang,
                   {portable_hash_expr('tok', salt='dsir')} % {_DSIR_BUCKETS}
                       AS bucket
            FROM toks
        ),
        counts AS (
            SELECT bucket,
                   COUNT(*) + 1 AS r_b,
                   SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1 AS t_b
            FROM b GROUP BY bucket
        ),
        tot AS (SELECT SUM(r_b) AS rr, SUM(t_b) AS tt FROM counts),
        w AS (
            SELECT bucket,
                   (1000 * t_b * rr) // (r_b * tt) - 1000 AS w_pm
            FROM counts CROSS JOIN tot
        )
        SELECT b.doc_id,
               MIN(b.lang) AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(w.w_pm) AS BIGINT) AS score_pm,
               CAST(CASE WHEN SUM(w.w_pm) >= 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS keep
        FROM b JOIN w USING (bucket)
        GROUP BY b.doc_id
        ORDER BY b.doc_id
    """,
)
def sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok")
    )
    b = toks.select(
        "doc_id",
        "lang",
        (portable_hash64("tok", salt="dsir") % _DSIR_BUCKETS).alias("bucket"),
    )
    counts = b.groupBy("bucket").agg(
        (F.count(F.lit(1)) + 1).alias("r_b"),
        (F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)) + 1).alias("t_b"),
    )
    tot = counts.agg(F.sum("r_b").alias("rr"), F.sum("t_b").alias("tt"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.expr("(1000 * t_b * rr) div (r_b * tt)") - F.lit(1000)
        ).alias("w_pm"),
    )
    scored = (
        b.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.min("lang").alias("lang"),
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            F.sum("w_pm").cast("bigint").alias("score_pm"),
        )
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_toks",
        "score_pm",
        F.when(F.col("score_pm") >= 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("keep"),
    ).orderBy("doc_id")


# ---- BM25 lexical retrieval -------------------------------------------------

#: (query_id, term) — the lexical query workload; terms are corpus vocabulary
_BM25_QUERIES = [
    (1, "spark"), (1, "hash"), (1, "join"),
    (2, "window"), (2, "sort"), (2, "merge"),
    (3, "table"), (3, "scan"), (3, "fast"),
]
_BM25_K = 10  # results per query


@register(
    "text_bm25_topk",
    category="text-analysis",
    doc="BM25 lexical top-k retrieval (k1=1.2, b=0.75) computed ENTIRELY "
    "in integer space so both engines rank identically: idf is the "
    "exact permille Robertson ratio (1000*(2N-2df+1)) // (2df+1) "
    "(the ratio itself, not its log — a documented monotone variant), "
    "the length-normalized tf term is milli-scaled with the same "
    "floor-division chain in both engines, and the doc score is the "
    "BIGINT sum of idf_pm * tf_milli over matched query terms.  Ranking "
    "ties break on doc_id.  Plan shape at 100 TB: tokens are filtered "
    "to the broadcast query-term set BEFORE any shuffle (the inverted-"
    "index probe analogue: the wide corpus never aggregates), doc "
    "lengths come from the same single token scan, df is a tiny "
    "per-term aggregate, and the final top-k is a per-query "
    "WindowGroupLimit rank pushdown, never a global sort.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_SQL_TOKS}) AS term FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS total_toks FROM dl
        ),
        queries(query_id, term) AS (VALUES
            {", ".join(f"({q}, '{t}')" for q, t in _BM25_QUERIES)}
        ),
        matched AS (
            SELECT q.query_id, t.term, t.doc_id, COUNT(*) AS tf
            FROM toks t JOIN queries q ON t.term = q.term
            GROUP BY q.query_id, t.term, t.doc_id
        ),
        df AS (
            SELECT query_id, term, COUNT(*) AS df
            FROM matched GROUP BY query_id, term
        ),
        scored AS (
            SELECT m.query_id, m.doc_id,
                   SUM(
                     ((1000 * (2*s.n_docs - 2*f.df + 1)) // (2*f.df + 1))
                     * ((2200 * m.tf * 1000) //
                        (1000 * m.tf +
                         (1200 * (250 + (750 * ((1000 * d.dl * s.n_docs)
                                                // s.total_toks)) // 1000))
                         // 1000))
                   ) AS score
            FROM matched m
            JOIN df f ON f.query_id = m.query_id AND f.term = m.term
            JOIN dl d ON d.doc_id = m.doc_id
            CROSS JOIN stats s
            GROUP BY m.query_id, m.doc_id
        )
        SELECT CAST(query_id AS BIGINT) AS query_id,
               CAST(doc_id AS BIGINT) AS doc_id,
               CAST(score AS BIGINT) AS score,
               CAST(rnk AS BIGINT) AS rank
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id
            ) AS rnk FROM scored
        ) WHERE rnk <= {_BM25_K}
        ORDER BY query_id, rank
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_toks")
    )
    queries = spark.createDataFrame(_BM25_QUERIES, ["query_id", "term"])
    matched = (
        toks.join(F.broadcast(queries), "term")
        .groupBy("query_id", "term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = matched.groupBy("query_id", "term").agg(F.count(F.lit(1)).alias("df"))
    term_score = F.expr(
        "((1000 * (2*n_docs - 2*df + 1)) div (2*df + 1))"
        " * ((2200 * tf * 1000) div"
        "    (1000 * tf +"
        "     (1200 * (250 + (750 * ((1000 * dl * n_docs)"
        "                            div total_toks)) div 1000))"
        "     div 1000))"
    )
    scored = (
        matched.join(df_, ["query_id", "term"])
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(term_score).alias("score"))
    )
    win = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _BM25_K)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("score").cast("bigint").alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


_PMI_MIN_PAIR = 5  # bigram support floor
_PMI_TOPK = 40


@register(
    "text_pmi_collocations",
    category="text-analysis",
    doc="Pointwise-mutual-information collocation mining: adjacent-token "
    "bigrams scored by the EXACT PMI odds ratio p(a,b)/(p(a)p(b)) = "
    "c_ab*N^2/(B*c_a*c_b), kept as a scaled integer (ppm) computed in "
    "decimal(38,0)/HUGEINT cross-multiplication — no log, no float, so "
    "the ranking is bit-identical across engines and partitionings.  "
    f"Support floor c_ab >= {_PMI_MIN_PAIR} (PMI's classic low-count "
    "pathology), deterministic (score, bigram) tiebreak, top "
    f"{_PMI_TOPK}.  Plan: one narrow zip_with pass builds bigrams, two "
    "map-side-combinable counts (unigram vocab, bigram vocab), then the "
    "bigram table joins the unigram table twice ON THE TOKEN KEY — at "
    "100 TB both sides are Zipfian-hot and the joins shuffle "
    "vocab-sized data, not corpus-sized; the two corpus totals ride as "
    "1-row broadcast scalars.",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_SQL_TOKS} AS ws FROM documents
        ),
        uni AS (
            SELECT t.tok, COUNT(*) AS c FROM (
                SELECT unnest(ws) AS tok FROM w
            ) t WHERE t.tok <> '' GROUP BY t.tok
        ),
        tot AS (SELECT SUM(c) AS n_tok FROM uni),
        big AS (
            SELECT ws[i] AS a, ws[i + 1] AS b, COUNT(*) AS c_ab
            FROM w CROSS JOIN range(1, 512) t(i)
            WHERE i < len(ws) AND ws[i] <> '' AND ws[i + 1] <> ''
            GROUP BY ws[i], ws[i + 1]
        ),
        btot AS (SELECT SUM(c_ab) AS n_big FROM big),
        scored AS (
            SELECT big.a, big.b, big.c_ab, ua.c AS c_a, ub.c AS c_b,
                   tot.n_tok, btot.n_big,
                   (1000000::HUGEINT * big.c_ab * tot.n_tok * tot.n_tok)
                       // (btot.n_big::HUGEINT * ua.c * ub.c) AS pmi_ratio_ppm
            FROM big
            JOIN uni ua ON ua.tok = big.a
            JOIN uni ub ON ub.tok = big.b
            CROSS JOIN tot CROSS JOIN btot
            WHERE big.c_ab >= {_PMI_MIN_PAIR}
        )
        SELECT a, b,
               CAST(c_ab AS BIGINT) AS c_ab,
               CAST(c_a AS BIGINT) AS c_a,
               CAST(c_b AS BIGINT) AS c_b,
               CAST(n_tok AS BIGINT) AS n_tok,
               CAST(n_big AS BIGINT) AS n_big,
               CAST(pmi_ratio_ppm AS BIGINT) AS pmi_ratio_ppm
        FROM scored
        ORDER BY pmi_ratio_ppm DESC, a, b
        LIMIT {_PMI_TOPK}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", tokens(F.col("text")).alias("ws"))
    uni = (
        words.select(F.explode("ws").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n_tok"))
    pairs = words.select(
        F.explode(
            F.zip_with(
                "ws",
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.when(
                    (a != "") & (b != ""), F.struct(a.alias("a"), b.alias("b"))
                ),
            )
        ).alias("p")
    ).filter(F.col("p").isNotNull())
    big = pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.count(F.lit(1)).alias("c_ab")
    )
    btot = big.agg(F.sum("c_ab").alias("n_big"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    scored = (
        big.filter(F.col("c_ab") >= _PMI_MIN_PAIR)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "a",
            "b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            F.col("n_tok").cast("bigint").alias("n_tok"),
            F.col("n_big").cast("bigint").alias("n_big"),
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * c_ab * n_tok * n_tok)"
                " div (CAST(n_big AS DECIMAL(38,0)) * c_a * c_b) AS BIGINT)"
            ).alias("pmi_ratio_ppm"),
        )
    )
    return scored.orderBy(F.desc("pmi_ratio_ppm"), "a", "b").limit(_PMI_TOPK)


_IDX_TOPK = 100


@register(
    "text_inverted_index",
    category="text-analysis",
    doc="Positional inverted-index construction (the search-engine / "
    "contamination-lookup build step): postings are (token, doc_id, tf, "
    "first_pos) rows from one posexplode pass + one (tok, doc) groupBy; "
    "the per-token dictionary row (df, cf, first_doc, and an exact "
    "posting checksum sum(doc_id*tf + first_pos) standing in for the "
    "non-primitive posting list) comes from a second map-side-"
    "combinable groupBy on the token.  At 100 TB the real sink writes "
    "postings partitioned by hash(token) bucket and sorted by (tok, "
    "doc_id) — both groupBys already shuffle on exactly those keys, so "
    "the index build is two co-keyed aggregations and nothing else.  "
    f"Output: top {_IDX_TOPK} dictionary rows by (df, tok).",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_SQL_TOKS} AS ws FROM documents
        ),
        pos AS (
            SELECT doc_id, ws[i] AS tok, i AS pos
            FROM w CROSS JOIN range(1, 512) t(i)
            WHERE i <= len(ws) AND ws[i] <> ''
        ),
        post AS (
            SELECT tok, doc_id, COUNT(*) AS tf, MIN(pos) AS first_pos
            FROM pos GROUP BY tok, doc_id
        )
        SELECT tok,
               CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(tf) AS BIGINT) AS cf,
               CAST(MIN(doc_id) AS BIGINT) AS first_doc,
               CAST(SUM(doc_id * tf + first_pos) AS BIGINT) AS posting_checksum
        FROM post
        GROUP BY tok
        ORDER BY df DESC, tok
        LIMIT {_IDX_TOPK}
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    )
    post = pos.groupBy("tok", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.min("pos").alias("first_pos")
    )
    return (
        post.groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.sum(F.col("doc_id") * F.col("tf") + F.col("first_pos"))
            .cast("bigint")
            .alias("posting_checksum"),
        )
        .orderBy(F.desc("df"), "tok")
        .limit(_IDX_TOPK)
    )


@register(
    "ml_naive_bayes_langid",
    category="ml",
    doc="Multinomial naive Bayes language classifier, trained and "
    "evaluated in one plan with EXACT integer arithmetic end to end: "
    "train on even doc_ids (per-(lang,token) add-1-smoothed counts, "
    "per-lang token totals, train vocab size V), score odd doc_ids "
    "with the floor-log2 bit-length trick — info = bits(c_lt + 1) - "
    "bits(T_l + V) summed per (doc, lang) plus the class-prior bits — "
    "so no log/exp ever runs and the argmax (row_number tiebroken by "
    "lang) is bit-stable across engines and partitionings.  Unseen "
    "test tokens get the smoothed count 1 via the left join.  Plan at "
    "100 TB: the model IS a DataFrame keyed on (lang, tok) — the "
    "data-sized work is one token-keyed join of test tokens against "
    "it (Zipf-hot, partial-agg friendly), the doc x lang fan-out is "
    "|langs| wide, and the totals are a broadcast of |langs| rows.  "
    "Output: the label confusion matrix with per-cell counts.",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, t.tok
            FROM documents, unnest({_SQL_TOKS}) t(tok)
            WHERE t.tok <> ''
        ),
        train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
        test AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
        langs AS (SELECT DISTINCT lang FROM train),
        model AS (
            SELECT lang, tok, COUNT(*) AS c FROM train GROUP BY lang, tok
        ),
        totals AS (SELECT lang, SUM(c) AS t_l FROM model GROUP BY lang),
        vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM train),
        priors AS (
            SELECT lang, COUNT(DISTINCT doc_id) AS d_l FROM train GROUP BY lang
        ),
        scored AS (
            SELECT te.doc_id, te.lang AS true_lang, l.lang AS cand,
                   SUM(length(bin(COALESCE(m.c, 0) + 1))
                       - length(bin(tt.t_l + vocab.v))) AS tok_bits
            FROM test te
            CROSS JOIN langs l
            LEFT JOIN model m ON m.lang = l.lang AND m.tok = te.tok
            JOIN totals tt ON tt.lang = l.lang
            CROSS JOIN vocab
            GROUP BY te.doc_id, te.lang, l.lang
        ),
        with_prior AS (
            SELECT s.doc_id, s.true_lang, s.cand,
                   s.tok_bits + length(bin(p.d_l)) AS score_bits
            FROM scored s JOIN priors p ON p.lang = s.cand
        ),
        pred AS (
            SELECT doc_id, true_lang, cand AS pred_lang
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_bits DESC, cand) AS rn
                FROM with_prior
            ) WHERE rn = 1
        )
        SELECT true_lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred
        GROUP BY true_lang, pred_lang
        ORDER BY true_lang, pred_lang
    """,
)
def ml_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
    )
    train = toks.filter(F.col("doc_id") % 2 == 0)
    test = toks.filter(F.col("doc_id") % 2 == 1)
    langs = train.select("lang").distinct().select(F.col("lang").alias("cand"))
    model = train.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = model.groupBy("lang").agg(F.sum("c").alias("t_l"))
    vocab = model.select("tok").distinct().agg(F.count(F.lit(1)).alias("v"))
    priors = train.groupBy("lang").agg(F.countDistinct("doc_id").alias("d_l"))
    scored = (
        test.select("doc_id", F.col("lang").alias("true_lang"), "tok")
        .crossJoin(F.broadcast(langs))
        .join(
            model.select(
                F.col("lang").alias("cand"), "tok", F.col("c").alias("c")
            ),
            ["cand", "tok"],
            "left",
        )
        .join(F.broadcast(totals.select(F.col("lang").alias("cand"), "t_l")), "cand")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "true_lang", "cand")
        .agg(
            F.sum(
                F.length(F.bin(F.coalesce(F.col("c"), F.lit(0)) + 1))
                - F.length(F.bin(F.col("t_l") + F.col("v")))
            ).alias("tok_bits")
        )
    )
    with_prior = scored.join(
        F.broadcast(priors.select(F.col("lang").alias("cand"), "d_l")), "cand"
    ).select(
        "doc_id",
        "true_lang",
        "cand",
        (F.col("tok_bits") + F.length(F.bin(F.col("d_l")))).alias("score_bits"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score_bits"), "cand")
    pred = (
        with_prior.select("doc_id", "true_lang", "cand", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("cand").alias("pred_lang"))
    )
    return (
        pred.groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


#: RAKE stopword list: the union of every language's marker words (plus
#: a few frequent English function words), inlined as literals into BOTH
#: engines so segmentation cannot drift.
_RAKE_STOPS = tuple(
    sorted(
        {m for ms in LANG_MARKERS.values() for m in ms}
        | {"in", "is", "it", "on", "for", "with", "as", "at", "by", "an"}
    )
)
_RAKE_MAX_PHRASE = 4
_RAKE_TOPK = 25


@register(
    "text_rake_keywords",
    category="text-analysis",
    doc="RAKE keyword extraction (Rose et al. 2010) done relationally: "
    "phrases are maximal runs of non-stopword tokens, segmented with "
    "the gaps-and-islands trick (phrase_id = running count of stop "
    "tokens per doc — NO regex splitting, so the two engines cannot "
    "disagree on dialect), capped at length "
    f"{_RAKE_MAX_PHRASE}; word scores are the classic degree/frequency "
    "ratio kept as an exact permille integer (deg = sum of lengths of "
    "phrases containing the word, freq = word occurrences — both plain "
    "counts), and a phrase scores the sum of its words' permille "
    "scores.  Identical phrases aggregate; top "
    f"{_RAKE_TOPK} by (score, phrase).  Phrase text is re-assembled "
    "position-sorted (array_sort+array_join / string_agg ORDER BY).  "
    "Plan at 100 TB: one doc-keyed window pass for segmentation, one "
    "token-keyed groupBy for the word table (Zipf-hot, partial-agg), "
    "one token-keyed join back, one (doc, phrase) groupBy — every "
    "shuffle is on a natural key, nothing quadratic anywhere.",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, ws[i] AS tok, i AS pos,
                   CASE WHEN ws[i] IN ({", ".join("'" + s + "'" for s in _RAKE_STOPS)})
                        THEN 1 ELSE 0 END AS is_stop
            FROM (SELECT doc_id, {_SQL_TOKS} AS ws FROM documents)
            CROSS JOIN range(1, 512) t(i)
            WHERE i <= len(ws) AND ws[i] <> ''
        ),
        seg AS (
            SELECT doc_id, tok, pos,
                   SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
            FROM pos
            QUALIFY is_stop = 0
        ),
        plen AS (
            SELECT doc_id, phrase_id, COUNT(*) AS phrase_len
            FROM seg GROUP BY doc_id, phrase_id
        ),
        kept AS (
            SELECT s.doc_id, s.phrase_id, s.tok, s.pos, p.phrase_len
            FROM seg s JOIN plen p
              ON p.doc_id = s.doc_id AND p.phrase_id = s.phrase_id
            WHERE p.phrase_len <= {_RAKE_MAX_PHRASE}
        ),
        words AS (
            SELECT tok, COUNT(*) AS freq, SUM(phrase_len) AS deg
            FROM kept GROUP BY tok
        ),
        scored_toks AS (
            SELECT k.doc_id, k.phrase_id, k.tok, k.pos,
                   1000 * w.deg // w.freq AS word_permille
            FROM kept k JOIN words w ON w.tok = k.tok
        ),
        phrases AS (
            SELECT doc_id, phrase_id,
                   string_agg(tok, ' ' ORDER BY pos) AS phrase,
                   SUM(word_permille) AS score_permille
            FROM scored_toks GROUP BY doc_id, phrase_id
        )
        SELECT phrase,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(ANY_VALUE(score_permille) AS BIGINT) AS score_permille
        FROM phrases
        GROUP BY phrase
        ORDER BY score_permille DESC, phrase
        LIMIT {_RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    stops = F.array(*[F.lit(s) for s in _RAKE_STOPS])
    pos = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "tok",
            (F.col("pos0") + 1).alias("pos"),
            F.when(F.array_contains(stops, F.col("tok")), 1).otherwise(0).alias("is_stop"),
        )
    )
    wseg = W.partitionBy("doc_id").orderBy("pos")
    seg = (
        pos.select(
            "doc_id", "tok", "pos", "is_stop",
            F.sum("is_stop").over(wseg).alias("phrase_id"),
        )
        .filter(F.col("is_stop") == 0)
        .drop("is_stop")
    )
    plen = seg.groupBy("doc_id", "phrase_id").agg(F.count(F.lit(1)).alias("phrase_len"))
    kept = seg.join(plen, ["doc_id", "phrase_id"]).filter(
        F.col("phrase_len") <= _RAKE_MAX_PHRASE
    )
    words = kept.groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq"), F.sum("phrase_len").alias("deg")
    )
    scored_toks = kept.join(words, "tok").select(
        "doc_id",
        "phrase_id",
        "tok",
        "pos",
        F.expr("1000 * deg div freq").alias("word_permille"),
    )
    phrases = scored_toks.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x.tok
            ),
            " ",
        ).alias("phrase"),
        F.sum("word_permille").alias("score_permille"),
    )
    return (
        phrases.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.any_value("score_permille").cast("bigint").alias("score_permille"),
        )
        .orderBy(F.desc("score_permille"), "phrase")
        .limit(_RAKE_TOPK)
    )


_SG_WINDOW = 2
_SG_TOPK = 30


@register(
    "text_skipgram_pairs",
    category="text-analysis",
    doc="Skip-gram (center, context) pair generation, the word2vec/"
    "GloVe co-occurrence build step: every token pairs with its "
    f"neighbors at distance 1..{_SG_WINDOW} on both sides, produced by "
    "a position self-join on (doc_id, pos + offset) — the offsets are "
    "a constant 4-row fan-out, so the pair stream is a single "
    "doc+pos-keyed shuffle join, map-side-combinable into (center, "
    "context) counts with a per-distance breakdown (n_d1/n_d2 via "
    "conditional sums, no pivot shuffle).  At 100 TB this is the "
    "co-occurrence-matrix shard build: counts partial-aggregate, the "
    "Zipf-hot pair keys behave exactly like the unigram agg, and no "
    "window function appears anywhere (position joins beat per-doc "
    f"windows when docs are long).  Top {_SG_TOPK} pairs by (count, "
    "center, context).",
    oracle=f"""
        WITH pos AS (
            SELECT doc_id, ws[i] AS tok, i AS pos
            FROM (SELECT doc_id, {_SQL_TOKS} AS ws FROM documents)
            CROSS JOIN range(1, 512) t(i)
            WHERE i <= len(ws) AND ws[i] <> ''
        ),
        pairs AS (
            SELECT c.tok AS center, x.tok AS context, ABS(o.off) AS dist
            FROM pos c
            JOIN (VALUES (-{_SG_WINDOW}), (-1), (1), ({_SG_WINDOW})) o(off)
              ON TRUE
            JOIN pos x ON x.doc_id = c.doc_id AND x.pos = c.pos + o.off
        )
        SELECT center, context,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN dist = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_d1,
               CAST(SUM(CASE WHEN dist = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_d2
        FROM pairs
        GROUP BY center, context
        ORDER BY n_pairs DESC, center, context
        LIMIT {_SG_TOPK}
    """,
)
def text_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    pos = (
        docs.select("doc_id", F.posexplode(tokens(F.col("text"))).alias("pos0", "tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", "tok", (F.col("pos0") + 1).alias("pos"))
    )
    offs = F.array(*[F.lit(o) for o in (-_SG_WINDOW, -1, 1, _SG_WINDOW)])
    centers = pos.select(
        "doc_id",
        F.col("tok").alias("center"),
        "pos",
        F.explode(offs).alias("off"),
    ).select("doc_id", "center", (F.col("pos") + F.col("off")).alias("cpos"), F.abs("off").alias("dist"))
    ctx = pos.select("doc_id", F.col("tok").alias("context"), F.col("pos").alias("cpos"))
    pairs = centers.join(ctx, ["doc_id", "cpos"])
    return (
        pairs.groupBy("center", "context")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("dist") == 1, 1).otherwise(0)).cast("bigint").alias("n_d1"),
            F.sum(F.when(F.col("dist") == 2, 1).otherwise(0)).cast("bigint").alias("n_d2"),
        )
        .orderBy(F.desc("n_pairs"), "center", "context")
        .limit(_SG_TOPK)
    )


#: stupid-backoff penalty: p(b|a) backs off to 0.4 * p(b).  In bit space
#: 0.4 ~= 2^-1.32; we charge a flat +2 bits (conservative, integral).
_SB_BACKOFF_BITS = 2


@register(
    "text_bigram_surprisal",
    category="text-analysis",
    doc="Bigram-LM perplexity proxy with stupid backoff (Brants et al. "
    "2007, the LM smoothing DESIGNED for distributed count tables — no "
    "normalization pass, just counts): each transition (a -> b) costs "
    "bits(c(a)) - bits(c(a,b)) when the bigram was seen, else backs "
    "off to the unigram cost bits(N) - bits(c(b)) plus a flat "
    f"{_SB_BACKOFF_BITS}-bit penalty — all floor-log2 bit lengths, "
    "libm-free, bit-identical across engines.  A sharper boilerplate/"
    "gibberish filter than text_unigram_surprisal: repeated phrases "
    "score near zero bits because their transitions are predictable, "
    "not merely their words common.  Plan at 100 TB: the bigram count "
    "table is the model (Zipf-hot groupBy, partial agg), scoring is "
    "one join of the transition stream against it plus one unigram "
    "join — the standard count-table LM serving shape.  Per-doc mean "
    "bits in exact milli units, with the backoff rate alongside.",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_SQL_TOKS} AS ws FROM documents
        ),
        trans AS (
            SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
            FROM w CROSS JOIN range(1, 512) t(i)
            WHERE i < len(ws) AND ws[i] <> '' AND ws[i + 1] <> ''
        ),
        uni AS (
            SELECT t.tok, COUNT(*) AS c FROM (
                SELECT unnest(ws) AS tok FROM w
            ) t WHERE t.tok <> '' GROUP BY t.tok
        ),
        tot AS (SELECT SUM(c) AS n FROM uni),
        big AS (
            SELECT a, b, COUNT(*) AS c_ab FROM trans GROUP BY a, b
        ),
        scored AS (
            SELECT tr.doc_id,
                   CASE WHEN bg.c_ab IS NOT NULL
                        THEN length(bin(ua.c)) - length(bin(bg.c_ab))
                        ELSE length(bin(tot.n)) - length(bin(ub.c))
                             + {_SB_BACKOFF_BITS} END AS info_bits,
                   CASE WHEN bg.c_ab IS NULL THEN 1 ELSE 0 END AS backed_off
            FROM trans tr
            JOIN uni ua ON ua.tok = tr.a
            JOIN uni ub ON ub.tok = tr.b
            LEFT JOIN big bg ON bg.a = tr.a AND bg.b = tr.b
            CROSS JOIN tot
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_trans,
               CAST(SUM(info_bits) AS BIGINT) AS sum_info_bits,
               CAST(1000 * SUM(info_bits) // COUNT(*) AS BIGINT)
                   AS mean_info_milli,
               CAST(SUM(backed_off) AS BIGINT) AS n_backoff
        FROM scored
        GROUP BY doc_id
        ORDER BY doc_id
    """,
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", tokens(F.col("text")).alias("ws"))
    trans = words.select(
        "doc_id",
        F.explode(
            F.zip_with(
                "ws",
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.when(
                    (a != "") & (b != ""), F.struct(a.alias("a"), b.alias("b"))
                ),
            )
        ).alias("p"),
    ).filter(F.col("p").isNotNull()).select("doc_id", "p.a", "p.b")
    uni = (
        words.select(F.explode("ws").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.agg(F.sum("c").alias("n"))
    big = trans.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    ua = uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b"))
    scored = (
        trans.join(ua, "a")
        .join(ub, "b")
        .join(big, ["a", "b"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.when(
                F.col("c_ab").isNotNull(),
                F.length(F.bin(F.col("c_a"))) - F.length(F.bin(F.col("c_ab"))),
            )
            .otherwise(
                F.length(F.bin(F.col("n")))
                - F.length(F.bin(F.col("c_b")))
                + _SB_BACKOFF_BITS
            )
            .alias("info_bits"),
            F.when(F.col("c_ab").isNull(), 1).otherwise(0).alias("backed_off"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_trans"),
        F.sum("info_bits").cast("bigint").alias("sum_info_bits"),
        F.sum("backed_off").cast("bigint").alias("n_backoff"),
    )
    return agg.select(
        "doc_id",
        "n_trans",
        "sum_info_bits",
        F.expr("CAST((1000 * sum_info_bits) div n_trans AS BIGINT)").alias(
            "mean_info_milli"
        ),
        "n_backoff",
    ).orderBy("doc_id")


@register(
    "text_watermark_detect",
    category="text",
    doc="Green-list watermark detection (Kirchenbauer-style) over the "
    "corpus: each token is 'green' iff the portable 60-bit hash of "
    "(previous token, token) is even — a deterministic 50% green list "
    "seeded by the preceding context, exactly how decoding-time "
    "watermarks partition the vocabulary — and a document flags as "
    "watermarked when its green fraction exceeds the one-sided z>2 "
    "bound, decided in exact integer space: 2g-n > 0 AND (2g-n)^2 > "
    "4n (no sqrt, no float).  The entire detector is ONE zero-shuffle "
    "scan projection: the bigram green count is a JVM higher-order "
    "fold over the token array (no explode, no groupBy), so at 100 TB "
    "it runs at parquet-scan speed with perfect column pruning.  On "
    "un-watermarked natural text the green rate sits at ~500 "
    "permille and flags fire at the ~2.3% false-positive rate the "
    "z-bound implies.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
        ),
        t AS (
            SELECT doc_id,
                   len(toks) - 1 AS n_scored,
                   list_sum(list_transform(range(2, len(toks) + 1), i ->
                       CASE WHEN ({portable_hash_expr("concat(toks[i-1], '|', toks[i])", salt="wm")}) % 2 = 0
                            THEN 1 ELSE 0 END)) AS n_green
            FROM d WHERE len(toks) >= 2
        )
        SELECT doc_id,
               CAST(n_scored AS BIGINT) AS n_scored,
               CAST(n_green AS BIGINT) AS n_green,
               CAST((1000 * n_green) // n_scored AS BIGINT) AS green_permille,
               CAST(CASE WHEN 2 * n_green - n_scored > 0
                          AND (2 * n_green - n_scored) * (2 * n_green - n_scored)
                              > 4 * n_scored
                    THEN 1 ELSE 0 END AS BIGINT) AS flag_watermarked
        FROM t
        ORDER BY doc_id
    """,
)
def text_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    hash60 = (
        "CAST(conv(substring(md5(concat('wm', element_at(toks, i - 1), '|', "
        "element_at(toks, i))), 1, 15), 16, 10) AS BIGINT)"
    )
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 2
    )
    t = d.select(
        "doc_id",
        (F.size("toks") - 1).cast("bigint").alias("n_scored"),
        F.expr(
            "aggregate(sequence(2, size(toks)), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + (CASE WHEN {hash60} % 2 = 0 "
            "THEN 1 ELSE 0 END))"
        ).alias("n_green"),
    )
    g2 = 2 * F.col("n_green") - F.col("n_scored")
    return t.select(
        "doc_id",
        "n_scored",
        F.col("n_green").cast("bigint").alias("n_green"),
        F.expr("(1000 * n_green) div n_scored").cast("bigint").alias(
            "green_permille"
        ),
        F.when((g2 > 0) & (g2 * g2 > 4 * F.col("n_scored")), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flag_watermarked"),
    ).orderBy("doc_id")


@register(
    "text_ccnet_buckets",
    category="text-analysis",
    doc="CCNet-style quality bucketing (Wenzek et al. 2020): score every "
    "document with the libm-free unigram surprisal proxy (floor-log2 "
    "bit lengths, identical to text_unigram_surprisal), then split EACH "
    "LANGUAGE into head/middle/tail terciles by that score — ntile(3) "
    "ordered by (score, doc_id) so the split is total-order "
    "deterministic — and keep head+middle, the standard pretraining "
    "filter.  Per-language bucketing matters: an absolute threshold "
    "would empty low-resource languages.  Plan shape at 100 TB: vocab "
    "groupBy + frequency join as in the surprisal query, then ntile is "
    "one shuffle partitioned BY LANGUAGE (parallel across languages; "
    "if one language dominates, swap ntile for the two-pass "
    "percentile-threshold pattern of scale_two_pass_quantile).",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, UNNEST({_SQL_TOKS}) AS tok FROM documents
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT SUM(c) AS n FROM vocab),
        scored AS (
            SELECT t.doc_id,
                   CAST(1000 * SUM(length(bin(CAST(tt.n AS BIGINT)))
                                   - length(bin(CAST(v.c AS BIGINT))))
                        // COUNT(*) AS BIGINT) AS score_milli
            FROM toks t JOIN vocab v USING (tok) CROSS JOIN total tt
            GROUP BY t.doc_id
        ),
        bucketed AS (
            SELECT d.doc_id, d.lang, s.score_milli,
                   NTILE(3) OVER (PARTITION BY d.lang
                                  ORDER BY s.score_milli, d.doc_id) AS t3
            FROM documents d JOIN scored s USING (doc_id)
        )
        SELECT doc_id, lang, score_milli,
               CASE t3 WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                       ELSE 'tail' END AS bucket,
               CAST(CASE WHEN t3 <= 2 THEN 1 ELSE 0 END AS BIGINT) AS kept
        FROM bucketed
        ORDER BY doc_id
    """,
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = _surprisal_doc_stats(spark, sf_dir).select(
        "doc_id",
        F.expr("(1000 * sum_info_bits) div n_toks")
        .cast("bigint")
        .alias("score_milli"),
    )
    w = Window.partitionBy("lang").orderBy("score_milli", "doc_id")
    bucketed = (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id")
        .withColumn("t3", F.ntile(3).over(w))
    )
    return bucketed.select(
        "doc_id",
        "lang",
        "score_milli",
        F.when(F.col("t3") == 1, "head")
        .when(F.col("t3") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
        F.when(F.col("t3") <= 2, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("kept"),
    ).orderBy("doc_id")


@register(
    "text_kneser_ney",
    category="text-analysis",
    doc="Interpolated Kneser-Ney bigram probabilities — the standard "
    "n-gram smoothing (the one KenLM ships) — in EXACT rational "
    "arithmetic: with discount D = 3/4, P_KN(w2|w1) = max(c12-D,0)/c1 "
    "+ D*N1+(w1,.)/c1 * N1+(.,w2)/|bigram types|; multiplying through "
    "by 4 clears the fraction, so p_ppm = 1e6*(max(4*c12-3,0)*T + "
    "3*N1f*N1b) // (4*c1*T) is pure integer (decimal38/HUGEINT guards "
    "the cross-product) and both engines agree exactly.  MLE ppm ships "
    "alongside so the output EXHIBITS the discount (KN < MLE on seen "
    "bigrams, mass reserved for continuations).  Plan shape at 100 TB: "
    "bigram assembly is the narrow zip_with pass; c1/N1+ forward stats "
    "fold out of ONE groupBy over the bigram table (vocab-sized), "
    "backward stats out of another; the type count is a 1-row "
    "broadcast.  Nothing touches the driver.",
    oracle="""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        pairs AS (
            SELECT ws[i] AS w1, ws[i + 1] AS w2
            FROM w CROSS JOIN range(1, 512) t(i)
            WHERE i < len(ws) AND ws[i] <> '' AND ws[i + 1] <> ''
        ),
        big AS (
            SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
        ),
        fwd AS (
            SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1f
            FROM big GROUP BY w1
        ),
        bwd AS (SELECT w2, COUNT(*) AS n1b FROM big GROUP BY w2),
        t AS (SELECT COUNT(*) AS ntypes FROM big),
        scored AS (
            SELECT b.w1, b.w2, b.c12, f.c1, f.n1f, d.n1b, t.ntypes,
                   (1000000 * b.c12) // f.c1 AS p_mle_ppm,
                   CAST((CAST(1000000 AS HUGEINT)
                         * (greatest(4 * b.c12 - 3, 0) * CAST(t.ntypes AS HUGEINT)
                            + 3 * CAST(f.n1f AS HUGEINT) * d.n1b))
                        // (4 * CAST(f.c1 AS HUGEINT) * t.ntypes)
                        AS BIGINT) AS p_kn_ppm
            FROM big b
            JOIN fwd f USING (w1)
            JOIN bwd d USING (w2)
            CROSS JOIN t
        )
        SELECT w1, w2,
               CAST(c12 AS BIGINT) AS c12,
               CAST(c1 AS BIGINT) AS c1,
               CAST(n1f AS BIGINT) AS n1f,
               CAST(n1b AS BIGINT) AS n1b,
               CAST(p_mle_ppm AS BIGINT) AS p_mle_ppm,
               p_kn_ppm
        FROM scored
        ORDER BY c12 DESC, w1, w2
        LIMIT 50
    """,
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(F.split("text", " ").alias("ws"))
    pairs = words.select(
        F.explode(
            F.zip_with(
                "ws",
                F.slice(F.col("ws"), 2, F.greatest(F.size("ws") - 1, F.lit(0))),
                lambda a, b: F.when(
                    (a != "") & (b != ""),
                    F.struct(a.alias("w1"), b.alias("w2")),
                ),
            )
        ).alias("p")
    ).filter(F.col("p").isNotNull()).select("p.w1", "p.w2")
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    fwd = big.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    bwd = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    t = big.agg(F.count(F.lit(1)).alias("ntypes"))
    dec = "decimal(38,0)"
    scored = (
        big.join(fwd, "w1")
        .join(bwd, "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("n1f").cast("bigint").alias("n1f"),
            F.col("n1b").cast("bigint").alias("n1b"),
            F.expr("(1000000 * c12) div c1").cast("bigint").alias("p_mle_ppm"),
            # decimal `div` is true integral division (decimal `/` would
            # ROUND at the result scale before a cast could truncate)
            F.expr(
                f"(CAST(1000000 AS {dec})"
                f" * (CAST(greatest(4 * c12 - 3, 0) AS {dec})"
                f"    * CAST(ntypes AS {dec})"
                f"    + CAST(3 AS {dec}) * CAST(n1f AS {dec})"
                f"    * CAST(n1b AS {dec})))"
                f" div (CAST(4 AS {dec}) * CAST(c1 AS {dec})"
                f"      * CAST(ntypes AS {dec}))"
            )
            .cast("bigint")
            .alias("p_kn_ppm"),
        )
    )
    return scored.orderBy(F.desc("c12"), "w1", "w2").limit(50)


@register(
    "text_vocab_growth",
    category="text-analysis",
    doc="Heaps'-law vocabulary-growth curve: distinct vocabulary and "
    "total token count after the first N documents (doc_id order) for "
    "N at powers of two — the corpus-health diagnostic that shows "
    "whether new data still brings new language or is recycling the "
    "same tokens (a flattening curve = diminishing returns / heavy "
    "duplication).  Scale shape: ONE explode+groupBy computes each "
    "token's FIRST document (min doc_id, map-side combinable) and one "
    "more the per-document token counts; both collapse to "
    "document-indexed cumulative histograms (bounded by n_docs, not "
    "token instances), and the power-of-two thresholds read the "
    "running maxima with a tiny broadcast theta-join.  TTR in exact "
    "ppm.",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS t
            FROM documents
        ),
        tok2 AS (SELECT doc_id, t FROM tok WHERE t <> ''),
        firsts AS (
            SELECT t, MIN(doc_id) AS fd FROM tok2 GROUP BY t
        ),
        new_hist AS (
            SELECT fd AS doc_id, COUNT(*) AS c FROM firsts GROUP BY fd
        ),
        tok_hist AS (
            SELECT doc_id, COUNT(*) AS c FROM tok2 GROUP BY doc_id
        ),
        cum AS (
            SELECT th.doc_id,
                   SUM(COALESCE(nh.c, 0)) OVER (ORDER BY th.doc_id) AS cum_new,
                   SUM(th.c) OVER (ORDER BY th.doc_id) AS cum_tok
            FROM tok_hist th LEFT JOIN new_hist nh ON nh.doc_id = th.doc_id
        ),
        thresholds AS (
            SELECT (1 << k.i) AS n FROM range(4, 15) k(i)
            WHERE (1 << k.i) <= (SELECT MAX(doc_id) + 1 FROM documents)
        )
        SELECT CAST(t.n AS BIGINT) AS n_docs_prefix,
               CAST(MAX(c.cum_new) AS BIGINT) AS vocab,
               CAST(MAX(c.cum_tok) AS BIGINT) AS total_tokens,
               CAST(MAX(c.cum_new) * 1000000 // MAX(c.cum_tok) AS BIGINT)
                   AS ttr_ppm
        FROM thresholds t JOIN cum c ON c.doc_id < t.n
        GROUP BY t.n
        ORDER BY n_docs_prefix
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
    )
    firsts = tok.groupBy("t").agg(F.min("doc_id").alias("fd"))
    new_hist = firsts.groupBy(F.col("fd").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("nc")
    )
    tok_hist = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tc"))
    # cumulative curves are doc-count-bound; the unpartitioned window is
    # over n_docs rows, not token instances
    cum = (
        tok_hist.join(new_hist, "doc_id", "left")
        .select(
            "doc_id",
            F.sum(F.coalesce("nc", F.lit(0)))
            .over(W.orderBy("doc_id"))
            .alias("cum_new"),
            F.sum("tc").over(W.orderBy("doc_id")).alias("cum_tok"),
        )
    )
    n_docs = docs.agg((F.max("doc_id") + 1).alias("nd"))
    thresholds = (
        spark.range(4, 15)
        .select(F.expr("shiftleft(1L, cast(id as int))").alias("n"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("n") <= F.col("nd"))
        .select("n")
    )
    return (
        cum.crossJoin(F.broadcast(thresholds))
        .filter(F.col("doc_id") < F.col("n"))
        .groupBy("n")
        .agg(
            F.max("cum_new").cast("bigint").alias("vocab"),
            F.max("cum_tok").cast("bigint").alias("total_tokens"),
            F.expr("cast(max(cum_new) * 1000000 div max(cum_tok) as bigint)").alias(
                "ttr_ppm"
            ),
        )
        .select(
            F.col("n").cast("bigint").alias("n_docs_prefix"),
            "vocab",
            "total_tokens",
            "ttr_ppm",
        )
        .orderBy("n_docs_prefix")
    )


_TR_ITERS = 2
_TR_INIT = 1_000_000
_TR_TELEPORT = 150_000
#: document-frequency floor: a word joins the co-occurrence graph only if
#: it appears in >= this many distinct documents.  The raw bigram vocab
#: grows Heaps-like with the corpus (measured 2.4x edges at 10x data);
#: hapax/rare words can never reach the top-20 anyway, so the floor bounds
#: the edge table (and every rank-round join) without moving the answer.
_TR_DF_FLOOR = 3


def _sql_textrank_step(prev: str, out: str) -> str:
    return f"""
        {out} AS MATERIALIZED (
            SELECT e.b AS word,
                   CAST({_TR_TELEPORT} + (85 * SUM(r.rank * e.w // s.s)) // 100
                        AS BIGINT) AS rank
            FROM wedges e
            JOIN {prev} r ON r.word = e.a
            JOIN strength s ON s.word = e.a
            GROUP BY e.b
        )"""


@register(
    "text_textrank_keywords",
    category="text-analysis",
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): a weighted "
    "PageRank over the word co-occurrence graph (adjacent content "
    "tokens, len >= 4, both directions, weight = corpus co-occurrence "
    f"count), {_TR_ITERS} unrolled rounds entirely in micro-rank "
    "integer arithmetic — contribution = rank * w // strength with "
    "floor division, update = 150000 + 85%% of incoming — so both "
    "engines agree bit-for-bit (the graph_pagerank discipline applied "
    "to text).  Scale shape: ONE corpus scan — each document's token "
    "array emits both its distinct-word stream (df counting) and its "
    "canonicalized (least, greatest) adjacent-pair stream through a "
    "single explode into a single (a, b) groupBy (word rows carry "
    "b = '' as a sentinel key, so both counts ride one shuffle; all "
    "builtin codegen expressions, no lambda HOFs).  The "
    f"document-frequency floor (word in >= {_TR_DF_FLOOR} distinct "
    "docs) is then applied to the aggregated pair table via broadcast "
    "semi-joins, so every rank round runs on the bounded "
    "frequent-vocab graph, not the Heaps-growing raw one (2.4x edges "
    "at 10x data measured).  Tradeoff vs the earlier two-pass form "
    "(floor via semi-join BEFORE the pair shuffle): the fused shuffle "
    "carries map-side-combined raw distinct pairs instead of floored "
    "ones, but saves a whole tokenize+cache pass — measured 1.74 -> "
    "0.86 s at sf0.1 and 3.56 -> 2.58 s at sf1 on the same box; at "
    "extreme vocab skew re-floor before the shuffle.  Each rank round "
    "is one join of the edge list against the word-sized rank table.  "
    "Output: top-20 words by final rank, deterministic (rank DESC, "
    "word) tiebreak.",
    oracle=rf"""
        WITH toks AS (
            SELECT doc_id, string_split(
                trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
            FROM documents
        ),
        vocab AS MATERIALIZED (
            SELECT w FROM (
                SELECT DISTINCT doc_id, ts[t.i] AS w
                FROM toks, range(1, 100000) t(i)
                WHERE t.i <= len(ts) AND length(ts[t.i]) >= 4
            ) GROUP BY w HAVING COUNT(*) >= {_TR_DF_FLOOR}
        ),
        big AS (
            SELECT ts[t.i] AS a, ts[t.i + 1] AS b
            FROM toks, range(1, 100000) t(i)
            WHERE t.i < len(ts)
              AND length(ts[t.i]) >= 4 AND length(ts[t.i + 1]) >= 4
        ),
        cnt AS (
            SELECT least(a, b) AS a, greatest(a, b) AS b, COUNT(*) AS w
            FROM big
            WHERE a <> b
              AND a IN (SELECT w FROM vocab) AND b IN (SELECT w FROM vocab)
            GROUP BY 1, 2
        ),
        wedges AS MATERIALIZED (
            SELECT a, b, w FROM cnt
            UNION ALL SELECT b, a, w FROM cnt
        ),
        strength AS MATERIALIZED (
            SELECT a AS word, SUM(w) AS s FROM wedges GROUP BY a
        ),
        r0 AS (
            SELECT word, CAST({_TR_INIT} AS BIGINT) AS rank FROM strength
        ),
        {",".join(_sql_textrank_step(f"r{i}", f"r{i + 1}") for i in range(_TR_ITERS))}
        SELECT word, CAST(rank AS BIGINT) AS microrank
        FROM r{_TR_ITERS}
        ORDER BY rank DESC, word
        LIMIT 20
    """,
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(tokens(F.col("text")).alias("ts")).filter(F.size("ts") >= 2)
    # ONE scan, ONE shuffle: each doc's token array emits its adjacent
    # pairs (for co-occurrence counting) AND its distinct words (for df
    # counting, sentinel b = '') through a single explode into a single
    # (a, b) groupBy.  Length/identity filters run POST-explode so the
    # whole stream stays in whole-stage codegen (lambda HOFs evaluate
    # interpreted and measured 2.2x slower at sf1); canonicalizing
    # (least, greatest) before the groupBy merges (a,b)/(b,a) instances
    # in one aggregation, and map-side partial agg compresses the
    # shuffle to distinct keys per map partition.
    both = (
        tokd.select(
            F.explode(
                F.concat(
                    F.arrays_zip(
                        F.slice("ts", F.lit(1), F.size("ts") - 1).alias("xs"),
                        F.expr("slice(ts, 2, size(ts) - 1)").alias("ys"),
                    ),
                    F.arrays_zip(
                        F.array_distinct("ts").alias("xs"),
                        F.expr(
                            "array_repeat('', size(array_distinct(ts)))"
                        ).alias("ys"),
                    ),
                )
            ).alias("p")
        )
        .select(F.col("p.xs").alias("x"), F.col("p.ys").alias("y"))
        .filter("length(x) >= 4 AND (y = '' OR (length(y) >= 4 AND x <> y))")
        .select(
            F.expr("CASE WHEN y = '' THEN x ELSE least(x, y) END").alias("a"),
            F.expr("CASE WHEN y = '' THEN '' ELSE greatest(x, y) END").alias("b"),
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()  # feeds vocab + cnt without rescanning the corpus
    )
    # document-frequency floor, applied to the aggregated pair table:
    # the sentinel rows ARE the per-word df counts (array_distinct ran
    # map-side, so each doc contributed each word once), and the floored
    # vocab gates both pair endpoints via broadcast semi-joins so every
    # rank round runs on the bounded frequent-vocab graph.
    vocab = both.filter((F.col("b") == "") & (F.col("w") >= _TR_DF_FLOOR)).select(
        "a"
    )
    cnt = (
        both.filter(F.col("b") != "")
        .join(F.broadcast(vocab), "a", "left_semi")
        .join(F.broadcast(vocab.withColumnRenamed("a", "b")), "b", "left_semi")
    )
    wedges = (
        cnt.unionByName(
            cnt.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
        )
        .localCheckpoint()  # feeds strength + every rank round
    )
    strength = wedges.groupBy(F.col("a").alias("word")).agg(F.sum("w").alias("s"))
    ranks = strength.select(
        "word", F.lit(_TR_INIT).cast("bigint").alias("rank")
    )
    sj = strength.select(F.col("word").alias("a"), "s")
    for _ in range(_TR_ITERS):
        ranks = (
            wedges.join(ranks.withColumnRenamed("word", "a"), "a")
            .join(sj, "a")
            .select("b", F.expr("rank * w div s").alias("contrib"))
            .groupBy("b")
            .agg(
                (
                    F.lit(_TR_TELEPORT) + F.expr("(85 * sum(contrib)) div 100")
                )
                .cast("bigint")
                .alias("rank")
            )
            .select(F.col("b").alias("word"), "rank")
        )
    return (
        ranks.select("word", F.col("rank").alias("microrank"))
        .orderBy(F.desc("microrank"), "word")
        .limit(20)
    )
