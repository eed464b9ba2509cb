"""Document chunking and sequence packing — the two preprocessing steps
between a curated corpus and a training run.

- ``text_chunk_windows``: overlapping fixed-size token windows per doc
  (context-window chunking for training/RAG indexing).
- ``text_pack_sequences``: greedy concat-then-split packing of docs into
  fixed token-budget bins via an exclusive cumulative sum — the
  deterministic form of sequence packing (no bin-packing heuristics, so
  any engine/partitioning produces the same packs).

Both are pure JVM expressions over the shared whitespace tokenizer
(operators/text.py); no Python on the path.  The reference has no text
processing at all (messages are opaque bytes) — north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash_expr
from flow_spark.queries.registry import register

_CHUNK = 32  # tokens per chunk
_STRIDE = 24  # chunk start distance (overlap = 8)
_BUDGET = 512  # tokens per packed sequence

_SQL_NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"


@register(
    "text_chunk_windows",
    category="text-analysis",
    doc=f"Overlapping token-window chunking: windows of {_CHUNK} tokens "
    f"every {_STRIDE} (overlap {_CHUNK - _STRIDE}) per document, with a "
    "portable chunk fingerprint — the context-window split a training/"
    "RAG pipeline runs after curation.  The chunk count derives from "
    "each doc's own length (sequence(0, (n-1) div stride)) so rows "
    "materialize distributed via explode, never on a driver; slicing "
    "is JVM array ops at scan speed.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            WHERE doc_id % 25 = 0
        ),
        chunks AS (
            SELECT doc_id, i AS chunk_idx,
                   list_slice(toks, i * {_STRIDE} + 1,
                              i * {_STRIDE} + {_CHUNK}) AS chunk
            FROM d CROSS JOIN range(0, 128) t(i)
            WHERE i * {_STRIDE} < len(toks)
        )
        SELECT doc_id, chunk_idx,
               len(chunk) AS n_toks,
               chunk[1]  AS first_tok,
               chunk[-1] AS last_tok,
               {portable_hash_expr("array_to_string(chunk, ' ')", salt='chunk')}
                   AS chunk_hash
        FROM chunks
        ORDER BY doc_id, chunk_idx
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64
    from flow_spark.operators.text import chunk_windows, tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    return (
        chunk_windows(d, size=_CHUNK, stride=_STRIDE)
        .select(
            "doc_id",
            "chunk_idx",
            F.size("chunk").alias("n_toks"),
            F.element_at("chunk", 1).alias("first_tok"),
            F.element_at("chunk", -1).alias("last_tok"),
            portable_hash64(F.array_join("chunk", " "), salt="chunk").alias(
                "chunk_hash"
            ),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "text_pack_sequences",
    category="text-analysis",
    doc=f"Sequence packing: docs concatenate in doc_id order per language "
    f"shard and split every {_BUDGET} tokens; a doc belongs to the pack "
    "where its first token lands (pack_id = exclusive-cumsum div "
    "budget).  All-integer window math — deterministic under retries "
    "and engine swaps, unlike greedy bin-packing whose output depends "
    "on visit order.  At 100 TB the lang shard becomes the partition "
    "key: packing never needs more than a per-shard running sum.",
    oracle=f"""
        WITH d AS (
            SELECT lang, doc_id, len({_SQL_TOKS}) AS n_toks
            FROM documents
        ),
        c AS (
            SELECT lang, doc_id, n_toks,
                   COALESCE(SUM(n_toks) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS cum_before
            FROM d
        )
        SELECT lang,
               CAST(cum_before // {_BUDGET} AS BIGINT) AS pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_toks,
               MIN(doc_id) AS first_doc,
               MAX(doc_id) AS last_doc
        FROM c
        GROUP BY lang, pack_id
        ORDER BY lang, pack_id
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("lang", "doc_id", F.size(tokens(F.col("text"))).alias("n_toks"))
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = d.withColumn("cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0)))
    return (
        c.groupBy(
            "lang",
            (F.col("cum_before") / _BUDGET).cast("bigint").alias("pack_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_toks"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "pack_id")
    )


@register(
    "text_dedup_chunks",
    category="dedup",
    doc="Cross-document boilerplate detection composed ON the chunking "
    "operator: chunks whose portable fingerprint appears in more than "
    "one document (shared headers/templates) — the sub-document dedup "
    "pass that exact whole-doc dedup misses.  groupBy on the 60-bit "
    "hash is one shuffle of (hash, doc) pairs, never chunk text.",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
            WHERE doc_id % 5 = 0
        ),
        chunks AS (
            SELECT doc_id,
                   {portable_hash_expr(
                       f"array_to_string(list_slice(toks, i * {_STRIDE} + 1,"
                       f" i * {_STRIDE} + {_CHUNK}), ' ')", salt='chunk')}
                       AS chunk_hash
            FROM d CROSS JOIN range(0, 128) t(i)
            WHERE i * {_STRIDE} < len(toks)
        )
        SELECT chunk_hash,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs,
               MIN(doc_id) AS first_doc
        FROM chunks
        GROUP BY chunk_hash
        HAVING COUNT(DISTINCT doc_id) > 1
        ORDER BY n_docs DESC, chunk_hash
    """,
)
def text_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.functions.hashing import portable_hash64
    from flow_spark.operators.text import chunk_windows, tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    d = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    chunk_hash = portable_hash64(F.array_join("chunk", " "), salt="chunk")
    return (
        chunk_windows(d, size=_CHUNK, stride=_STRIDE)
        .select("doc_id", chunk_hash.alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "chunk_hash")
    )
