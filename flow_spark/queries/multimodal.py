"""Multimodal-column queries: binary payload plumbing via mapInPandas.

The decode step is a deterministic fake (no media libs in the container —
operators/multimodal.py documents the stub); what's verified here is the
REAL Spark plumbing: binary columns through Arrow batches, schema contract,
and byte-level feature extraction matching the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.operators.multimodal import documents_as_assets, extract_features
from flow_spark.queries.registry import register


@register(
    "mm_extract_features",
    category="multimodal",
    doc="Binary feature extraction over payload blobs via mapInPandas "
    "(byte length, first byte, md5 prefix, simulated frame count).",
    oracle="""
        SELECT doc_id AS asset_id,
               octet_length(encode(text))       AS byte_len,
               ascii(substr(text, 1, 1))        AS first_byte,
               substr(md5(text), 1, 8)          AS sha_prefix,
               CAST(ceil(octet_length(encode(text)) / 1000.0) AS INT) AS n_frames
        FROM documents
        WHERE doc_id % 4 = 0
        ORDER BY asset_id
    """,
)
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    assets = documents_as_assets(docs)
    return extract_features(assets).orderBy("asset_id")


@register(
    "mm_payload_partitioning",
    category="multimodal",
    doc="Typed-metadata handling for media tables: route payloads into "
    "size classes and aggregate bytes per class (the partition-sizing "
    "query a media pipeline runs before repartitioning by payload size).",
    oracle="""
        SELECT CASE WHEN octet_length(encode(text)) < 200 THEN 'small'
                    WHEN octet_length(encode(text)) < 400 THEN 'medium'
                    ELSE 'large' END AS size_class,
               COUNT(*) AS n_assets,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        FROM documents
        GROUP BY 1
        ORDER BY size_class
    """,
)
def mm_payload_partitioning(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = documents_as_assets(load_table(spark, sf_dir, "documents"))
    size = F.length("payload")
    return (
        assets.select(
            F.when(size < 200, "small")
            .when(size < 400, "medium")
            .otherwise("large")
            .alias("size_class"),
            size.alias("nbytes"),
        )
        .groupBy("size_class")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("size_class")
    )


@register(
    "mm_frame_sample",
    category="multimodal",
    doc="Frame sampling: each payload explodes to every 2nd 100-byte "
    "'frame' (1 row -> N rows through mapInPandas, the video-sampler "
    "batch shape); per-frame length + md5 checked against byte slicing "
    "in the oracle (corpus is ASCII so VARCHAR substr == byte slice).",
    oracle="""
        WITH d AS (
            SELECT doc_id, text,
                   CAST(ceil(length(text) / 100.0) AS INT) AS n_frames
            FROM documents WHERE doc_id % 25 = 0
        )
        -- constant-bound frame index (max doc ~600B = 6 frames; 64 is
        -- headroom), filtered per doc: DuckDB's range() can't take a
        -- lateral column bound
        SELECT doc_id AS asset_id,
               CAST(i AS INT) AS frame_idx,
               CAST(length(substring(text, i * 100 + 1, 100)) AS INT) AS frame_len,
               substr(md5(substring(text, i * 100 + 1, 100)), 1, 8) AS frame_md5
        FROM d, range(0, 64) t(i)
        WHERE i < n_frames AND i % 2 = 0
        ORDER BY asset_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return sample_frames(documents_as_assets(docs), frame_size=100).orderBy(
        "asset_id", "frame_idx"
    )


@register(
    "mm_resize",
    category="multimodal",
    doc="Resize stand-in: every payload normalized to exactly 256 bytes "
    "(truncate/space-pad) through the binary->binary mapInPandas contract "
    "a real decode+interpolate resize would use.",
    oracle="""
        SELECT doc_id AS asset_id,
               256 AS new_len,
               substr(md5(rpad(substring(text, 1, 256), 256, ' ')), 1, 8)
                   AS payload_md5
        FROM documents WHERE doc_id % 25 = 0
        ORDER BY asset_id
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.multimodal import resize_payload

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return (
        resize_payload(documents_as_assets(docs))
        .select("asset_id", "new_len", "payload_md5")
        .orderBy("asset_id")
    )


@register(
    "mm_payload_dedup",
    category="multimodal",
    doc="Binary payload dedup by content digest: assets group on md5 of "
    "the raw bytes, keeper = min asset id — the exact-dedup pass a "
    "media lake runs before any decode (at 100 TB only 16-byte digests "
    "and ids cross the shuffle, never payloads; dedup-before-decode is "
    "also the cost ordering that matters when decode dominates).",
    oracle="""
        SELECT md5(text) AS digest,
               COUNT(*) AS n_copies,
               MIN(doc_id) AS keeper_id,
               CAST(SUM(octet_length(encode(text))) AS BIGINT)
                   AS bytes_reclaimable
        FROM documents
        GROUP BY digest
        HAVING COUNT(*) > 1
        ORDER BY n_copies DESC, keeper_id
    """,
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assets = documents_as_assets(docs)
    return (
        assets.select(
            "asset_id",
            F.md5(F.col("payload")).alias("digest"),
            F.octet_length("payload").alias("n_bytes"),
        )
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("asset_id").alias("keeper_id"),
            F.sum("n_bytes").cast("bigint").alias("bytes_reclaimable"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy(F.desc("n_copies"), "keeper_id")
    )


def _sql_block_feature(b: int) -> str:
    """DuckDB twin of one block-mean feature over the ASCII payload."""
    lo = f"({b} * length(text)) // 8 + 1"
    hi = f"(({b} + 1) * length(text)) // 8"
    return (
        f"CAST(list_sum(list_transform(range({lo}, {hi} + 1), "
        f"i -> ascii(substr(text, CAST(i AS INT), 1)))) "
        f"// greatest({hi} - ({lo}) + 1, 1) AS BIGINT)"
    )


@register(
    "mm_blockmean_embedding",
    category="multimodal",
    doc="Media-embedding pipeline end-to-end: fake-decode (bytes as "
    "intensities) -> 8-block integer-mean feature vector via "
    "mapInPandas/numpy (the production extractor's exact Arrow batch "
    "shape) -> L1-nearest neighbor per asset over the feature table.  "
    "All-integer features keep every stage engine-exact, so the whole "
    "decode->embed->match chain is value-checked against the oracle's "
    "byte-level reconstruction.  At 100 TB the pairwise stage runs on "
    "LSH/IVF buckets; here the asset subset is bounded (doc_id % 25).",
    oracle=f"""
        WITH feats AS (
            SELECT doc_id AS asset_id,
                   {", ".join(f"{_sql_block_feature(b)} AS f{b}" for b in range(8))}
            FROM documents WHERE doc_id % 25 = 0 AND n_chars >= 100
        ),
        pairs AS (
            SELECT a.asset_id,
                   b.asset_id AS nn_id,
                   ({" + ".join(f"abs(a.f{b} - b.f{b})" for b in range(8))})
                       AS l1,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.asset_id
                       ORDER BY ({" + ".join(f"abs(a.f{b} - b.f{b})" for b in range(8))}),
                                b.asset_id
                   ) AS rn
            FROM feats a JOIN feats b ON a.asset_id != b.asset_id
        )
        SELECT p.asset_id, f.f0, f.f7, p.nn_id, CAST(p.l1 AS BIGINT) AS l1_dist
        FROM pairs p JOIN feats f ON p.asset_id = f.asset_id
        WHERE p.rn = 1
        ORDER BY p.asset_id
    """,
)
def mm_blockmean_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.multimodal import blockmean_embedding

    docs = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 25 == 0) & (F.col("n_chars") >= 100)
    )
    feats = blockmean_embedding(documents_as_assets(docs))
    a = feats.alias("a")
    b = feats.alias("b")
    l1 = None
    for i in range(8):
        term = F.abs(F.col(f"a.f{i}") - F.col(f"b.f{i}"))
        l1 = term if l1 is None else l1 + term
    w = W.partitionBy("a.asset_id").orderBy(F.asc("l1"), F.asc("b.asset_id"))
    pairs = (
        a.join(b, F.col("a.asset_id") != F.col("b.asset_id"))
        .withColumn("l1", l1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return pairs.select(
        F.col("a.asset_id").alias("asset_id"),
        F.col("a.f0").alias("f0"),
        F.col("a.f7").alias("f7"),
        F.col("b.asset_id").alias("nn_id"),
        F.col("l1").cast("bigint").alias("l1_dist"),
    ).orderBy("asset_id")


@register(
    "mm_audio_energy",
    category="multimodal",
    doc="Audio-analog feature extraction: payload bytes as unsigned 8-bit "
    "PCM samples, per-window energy sum((b-128)^2) over non-overlapping "
    "64-sample windows (first 4 windows per asset) — the windowed-"
    "energy/VAD primitive of an audio pipeline, numpy-vectorized inside "
    "mapInPandas (frombuffer -> reshape -> square-sum per row, no "
    "Python loop over samples).  Exact integers end-to-end; the oracle "
    "recomputes each window from ascii codes.  Narrow map, partition-"
    "preserving — same scale shape as the real decode would have.",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(w AS INT) AS win_idx,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> CAST(ascii(substr(text, w * 64 + i, 1)) - 128
                              AS BIGINT)
                         * (ascii(substr(text, w * 64 + i, 1)) - 128)))
                    AS BIGINT) AS energy
        FROM documents, range(0, 4) t(w)
        WHERE doc_id % 11 = 0
          AND octet_length(encode(text)) >= (w + 1) * 64
        ORDER BY asset_id, win_idx
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    def energy_windows(batches):
        import numpy as np

        for pdf in batches:
            out_id, out_w, out_e = [], [], []
            for doc_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_win = min(4, len(buf) // 64)
                if n_win == 0:
                    continue
                w = buf[: n_win * 64].reshape(n_win, 64).astype(np.int64) - 128
                e = (w * w).sum(axis=1)
                out_id += [doc_id] * n_win
                out_w += list(range(n_win))
                out_e += [int(x) for x in e]
            yield pd.DataFrame(
                {"asset_id": out_id, "win_idx": out_w, "energy": out_e}
            )

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    assets = documents_as_assets(docs).select("asset_id", "payload")
    return assets.mapInPandas(
        energy_windows, schema="asset_id long, win_idx int, energy long"
    ).orderBy("asset_id", "win_idx")


@register(
    "mm_scene_cuts",
    category="multimodal",
    doc="Video scene-boundary detection (operators/multimodal.scene_cuts): "
    "payloads split into 100-byte 'frames', per-frame feature = exact "
    "byte-intensity sum, cut flagged where consecutive frames differ by "
    "more than 300 — the shot-segmentation pass before per-scene frame "
    "sampling.  The feature is the documented deterministic fake (a "
    "real pipeline plugs decoder + histogram here); the mapInPandas "
    "fan-out and integer thresholding are real and value-checked: the "
    "oracle recomputes every frame's ASCII byte sum via char-list "
    "aggregation and the same lag/threshold walk.",
    oracle="""
        WITH d AS (
            SELECT doc_id, text,
                   CAST(ceil(length(text) / 100.0) AS INT) AS n
            FROM documents WHERE doc_id % 25 = 0
        ),
        f AS (
            SELECT doc_id, CAST(i AS INT) AS frame_idx,
                   list_aggregate(list_transform(
                       string_split(substring(text, i * 100 + 1, 100), ''),
                       x -> ord(x)), 'sum') AS feat
            -- constant frame-index bound (DuckDB range() can't take a
            -- lateral column bound): 1024 frames = 100 KiB payloads,
            -- ~150x the fixture's longest document; the Spark side is
            -- unbounded, so keep this bound ahead of fixture growth
            FROM d, range(0, 1024) t(i)
            WHERE i < n
        ),
        p AS (
            SELECT doc_id, frame_idx, feat,
                   lag(feat) OVER (PARTITION BY doc_id
                                   ORDER BY frame_idx) AS prev
            FROM f
        )
        SELECT doc_id AS asset_id,
               frame_idx,
               CAST(abs(feat - prev) AS BIGINT) AS delta
        FROM p
        WHERE prev IS NOT NULL AND abs(feat - prev) > 300
        ORDER BY asset_id, frame_idx
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.multimodal import documents_as_assets, scene_cuts

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    return scene_cuts(
        documents_as_assets(docs), frame_size=100, threshold=300
    ).orderBy("asset_id", "frame_idx")
