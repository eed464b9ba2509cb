"""UDF / pandas-UDF / grouped-apply / UDTF coverage — the Python extension
points that replace flow's Go-plugin loader
(/root/reference/pkg/util/plugin/plugin.go:32-62, actor_factory.go:58-85).

Each variant computes something SQL-expressible so the oracle validates the
plumbing (serialization, Arrow batches, grouping, table-function output),
not just "it ran".  Row UDFs are deliberately trivial: they are the slow
path and exist here as the API demonstration.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register


@register(
    "udf_python_row",
    category="udf",
    doc="Row-at-a-time Python UDF (the slow path — serde per row).",
    oracle="""
        SELECT event_id,
               CASE WHEN value >= 150 THEN 'high'
                    WHEN value >= 50  THEN 'mid'
                    ELSE 'low' END AS bucket
        FROM events WHERE event_id % 20 = 0
        ORDER BY event_id
    """,
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(StringType())
    def bucket(v: float) -> str:
        if v >= 150:
            return "high"
        if v >= 50:
            return "mid"
        return "low"

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    return ev.select("event_id", bucket("value").alias("bucket")).orderBy("event_id")


@register(
    "udf_pandas_scalar",
    category="udf",
    doc="Arrow-batched scalar pandas UDF (the sanctioned Python fast path).",
    oracle="""
        SELECT event_id, ROUND(value * 1.1 + 7, 4) AS adjusted
        FROM events WHERE event_id % 20 = 0
        ORDER BY event_id
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(DoubleType())
    def adjust(v: pd.Series) -> pd.Series:
        return (v * 1.1 + 7).round(4)

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 0)
    return ev.select("event_id", adjust("value").alias("adjusted")).orderBy("event_id")


@register(
    "udf_grouped_apply",
    category="udf",
    doc="applyInPandas grouped-map: per-user pandas aggregation.",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n,
               ROUND(MAX(value) - MIN(value), 2) AS value_range
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
)
def udf_grouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(pdf)],
                "value_range": [round(pdf["value"].max() - pdf["value"].min(), 2)],
            }
        )

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .applyInPandas(per_user, schema="user_id long, n long, value_range double")
        .orderBy("user_id")
    )


@register(
    "udtf_tokenize",
    category="udf",
    doc="Python UDTF: one row per leading token (table-function output).",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
            FROM documents WHERE doc_id % 25 = 0
        )
        SELECT doc_id, toks[i] AS token, CAST(i - 1 AS INT) AS pos
        FROM w, range(1, 4) t(i)
        WHERE i <= len(toks)
        ORDER BY doc_id, pos
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class LeadingTokens:
        def eval(self, text: str):  # noqa: D401
            norm = re.sub(r"\s+", " ", text.lower()).strip()
            for i, tok in enumerate(norm.split(" ")[:3]):
                yield tok, i

    spark.udtf.register("leading_tokens", LeadingTokens)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    docs.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.token, t.pos
        FROM udtf_docs, LATERAL leading_tokens(text) t
        ORDER BY doc_id, pos
        """
    )


@register(
    "udtf_partitioned_cusum",
    category="udf",
    doc="Spark 4 table-argument UDTF with PARTITION BY / ORDER BY: a "
    "CUSUM drift detector that consumes each user's event stream in "
    "order inside the UDTF (eval buffers the partition, terminate "
    "emits one summary row) — the custom-stateful-operator surface "
    "the plugin-actor analog needs when per-group logic outgrows "
    "window functions.  All arithmetic is exact integers: values "
    "become cents, and the mean subtraction is cleared of division by "
    "scaling the cusum by n (cs_t * n = n*prefix_t - t*total), so "
    "Python, Spark, and DuckDB agree bit-for-bit.  At scale each "
    "partition streams through one executor worker — same shuffle "
    "shape as applyInPandas, no driver involvement.",
    oracle="""
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(ROUND(value * 100, 0) AS BIGINT) AS vc
            FROM events WHERE user_id % 13 = 0
        ),
        tot AS (
            SELECT user_id, SUM(vc) AS s, COUNT(*) AS n
            FROM e GROUP BY user_id
        ),
        pre AS (
            SELECT e.user_id, t.n, t.s,
                   SUM(vc) OVER (PARTITION BY e.user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run,
                   ROW_NUMBER() OVER (PARTITION BY e.user_id
                                      ORDER BY ts, event_id) AS rn
            FROM e JOIN tot t ON e.user_id = t.user_id
        )
        SELECT user_id,
               CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
               CAST(MAX(ABS(n * run - rn * s)) AS BIGINT)
                   AS max_abs_cusum_scaled
        FROM pre GROUP BY user_id
        ORDER BY user_id
    """,
)
def udtf_partitioned_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_abs_cusum_scaled bigint")
    class CusumDetector:
        def __init__(self) -> None:
            self._user = None
            self._vals: list[int] = []

        def eval(self, row):  # rows arrive ORDER BY (ts, event_id)
            self._user = row["user_id"]
            self._vals.append(row["vc"])

        def terminate(self):
            s = sum(self._vals)
            n = len(self._vals)
            run = 0
            best = 0
            for t, v in enumerate(self._vals, start=1):
                run += v
                best = max(best, abs(n * run - t * s))
            yield self._user, n, best

    spark.udtf.register("cusum_detector", CusumDetector)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 13 == 0)
    ev.select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
    ).createOrReplaceTempView("cusum_events")
    return spark.sql(
        """
        SELECT * FROM cusum_detector(
            TABLE(SELECT user_id, vc, ts, event_id FROM cusum_events)
            PARTITION BY user_id ORDER BY (ts, event_id)
        )
        ORDER BY user_id
        """
    )


@register(
    "udaf_pandas_grouped_agg",
    category="udf",
    doc="Pandas GROUPED_AGG UDAF (Series -> scalar, the custom-aggregate "
    "surface next to scalar UDFs and grouped-map): exact integer Gini "
    "numerator sum((2i - n - 1) * x_(i)) over price cents per return "
    "flag — numpy does the per-group sort/dot in one Arrow batch, and "
    "because the statistic is all-integer the result is bit-identical "
    "to the oracle's window formulation.  At scale each group "
    "aggregates on one executor (same shuffle as any groupBy agg); "
    "groups above executor memory belong in the window form instead.",
    oracle="""
        WITH r AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS xc,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                      ORDER BY ROUND(l_extendedprice * 100, 0))
                       AS i,
                   COUNT(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(SUM((2 * i - n - 1) * xc) AS BIGINT) AS gini_numerator,
               CAST(ANY_VALUE(n) AS BIGINT) AS n
        FROM r GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def udaf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def gini_numerator(cents: pd.Series) -> int:  # GROUPED_AGG: Series -> scalar
        x = np.sort(cents.to_numpy(dtype=np.int64))
        n = len(x)
        w = 2 * np.arange(1, n + 1, dtype=np.int64) - n - 1
        return int(np.dot(w, x))

    @pandas_udf("long")
    def n_rows(cents: pd.Series) -> int:  # companion UDAF: plain aggs
        # cannot mix with a GROUPED_AGG pandas UDF in one agg()
        return len(cents)

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return (
        li.select("l_returnflag", cents.alias("xc"))
        .groupBy("l_returnflag")
        .agg(
            gini_numerator("xc").alias("gini_numerator"),
            n_rows("xc").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "udf_cogrouped_reconcile",
    category="udf",
    doc="Cogrouped applyInPandas (groupBy(...).cogroup(...).applyInPandas): "
    "order-header vs lineitem-detail reconciliation, the classic per-key "
    "two-table custom merge.  CRITICAL scale lesson baked in: the "
    "cogroup key is a BUCKET of the order key (pmod 64), not the order "
    "key itself — cogroup dispatches one Python call per key, so keying "
    "by entity pays per-entity interpreter overhead (measured 19.5s for "
    "~4k keys at sf0.1; bucketed: <1s).  Each call receives one "
    "bucket's (orders, lines) pandas pair and vectorizes the per-order "
    "reconciliation with a groupby-merge; exact integer cents "
    "throughout.  The shuffle shape is unchanged (one co-partitioned "
    "exchange on the bucket for both inputs); bucket count tunes the "
    "Python-batch granularity exactly like shuffle partitions.  "
    "Header-only orders still emit (n_lines=0), matching the oracle's "
    "LEFT JOIN; detail-only orphans are dropped like its INNER side on "
    "orders.",
    oracle="""
        SELECT o.o_orderkey,
               CAST(COUNT(l.l_orderkey) AS BIGINT) AS n_lines,
               CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                                      AS BIGINT)), 0) AS BIGINT)
                   AS line_sum_cents,
               CAST(ROUND(ANY_VALUE(o.o_totalprice) * 100, 0) AS BIGINT)
                   AS total_cents,
               CAST(ROUND(ANY_VALUE(o.o_totalprice) * 100, 0) AS BIGINT)
                   - CAST(COALESCE(SUM(CAST(ROUND(l.l_extendedprice * 100, 0)
                                            AS BIGINT)), 0) AS BIGINT)
                   AS diff_cents
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey % 37 = 0
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
)
def udf_cogrouped_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    def reconcile(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
        if orders_pdf.empty:  # detail-only bucket: oracle's inner side on orders
            return pd.DataFrame(
                columns=[
                    "o_orderkey",
                    "n_lines",
                    "line_sum_cents",
                    "total_cents",
                    "diff_cents",
                ]
            )
        per_order = (
            lines_pdf.groupby("l_orderkey")["line_cents"]
            .agg(["count", "sum"])
            .rename(columns={"count": "n_lines", "sum": "line_sum_cents"})
            if not lines_pdf.empty
            else pd.DataFrame(columns=["n_lines", "line_sum_cents"])
        )
        m = orders_pdf.merge(
            per_order, how="left", left_on="o_orderkey", right_index=True
        )
        m["n_lines"] = m["n_lines"].fillna(0).astype("int64")
        m["line_sum_cents"] = m["line_sum_cents"].fillna(0).astype("int64")
        m["diff_cents"] = m["total_cents"] - m["line_sum_cents"]
        return m[
            ["o_orderkey", "n_lines", "line_sum_cents", "total_cents", "diff_cents"]
        ]

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 37 == 0)
        .select(
            "o_orderkey",
            F.pmod("o_orderkey", F.lit(64)).alias("bucket"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("total_cents"),
        )
    )
    lines = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 37 == 0)
        .select(
            "l_orderkey",
            F.pmod("l_orderkey", F.lit(64)).alias("bucket"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("line_cents"),
        )
    )
    return (
        orders.groupBy("bucket")
        .cogroup(lines.groupBy("bucket"))
        .applyInPandas(
            reconcile,
            schema="o_orderkey long, n_lines long, line_sum_cents long, "
            "total_cents long, diff_cents long",
        )
        .orderBy("o_orderkey")
    )


@register(
    "udf_arrow_optimized",
    category="udf",
    doc="Arrow-optimized row UDF (Spark 4 useArrow=True): same per-row "
    "Python signature as udf_python_row but the exchange is Arrow "
    "batches instead of pickled rows — the drop-in upgrade path when "
    "row logic can't be vectorized.  Exact integer bucketing keeps the "
    "oracle bit-identical.",
    oracle="""
        SELECT event_id,
               event_type || '#' ||
                   CAST(CAST(FLOOR(value / 50) AS BIGINT) AS VARCHAR) AS tag
        FROM events WHERE event_id % 20 = 1
        ORDER BY event_id
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    @F.udf(returnType=StringType(), useArrow=True)
    def tag(event_type: str, value: float) -> str:
        return f"{event_type}#{math.floor(value / 50)}"

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 20 == 1)
    return ev.select("event_id", tag("event_type", "value").alias("tag")).orderBy("event_id")


@register(
    "udf_map_in_arrow",
    category="udf",
    doc="mapInArrow: whole-batch pyarrow RecordBatch transform with NO "
    "pandas materialization — the cheapest Python hop (zero copy in, "
    "columnar compute, zero copy out).  Computes char and space counts "
    "per document with pyarrow.compute kernels; the partition-preserving "
    "narrow map keeps whatever partitioning the scan produced.",
    oracle="""
        SELECT doc_id,
               CAST(LENGTH(text) AS BIGINT) AS nchars,
               CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT)
                   AS nspaces
        FROM documents WHERE doc_id % 7 = 0
        ORDER BY doc_id
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    def batch_stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.record_batch(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                ],
                names=["doc_id", "nchars", "nspaces"],
            )

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", "text")
    )
    return docs.mapInArrow(
        batch_stats, schema="doc_id long, nchars long, nspaces long"
    ).orderBy("doc_id")


@register(
    "udf_grouped_apply_arrow",
    category="udf",
    doc="groupBy().applyInArrow (Spark 4): per-group pyarrow Table "
    "transform — the Arrow-native sibling of grouped applyInPandas, "
    "zero pandas materialization.  Each user bucket's event_ids are "
    "sorted inside the group and the census of LARGE GAPS between "
    "consecutive ids (> 500) is counted — a computation that needs the "
    "whole group ordered, not a per-row or algebraic aggregate.  All "
    "integer outputs; the oracle restates the gap census with a lag "
    "window.  One shuffle on the group key; Arrow batches both ways.",
    oracle="""
        WITH e AS (
            SELECT event_id, user_id % 50 AS ub FROM events
        ),
        d AS (
            SELECT ub,
                   event_id - lag(event_id)
                       OVER (PARTITION BY ub ORDER BY event_id) AS gap
            FROM e
        )
        SELECT ub,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(MAX(gap) AS BIGINT) AS max_gap,
               CAST(COALESCE(SUM(CASE WHEN gap > 500 THEN 1 END), 0)
                    AS BIGINT) AS n_big_gaps
        FROM d
        GROUP BY ub
        ORDER BY ub
    """,
)
def udf_grouped_apply_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    def gap_census(tbl):
        import numpy as np
        import pyarrow as pa

        ids = np.sort(tbl.column("event_id").to_numpy())
        gaps = np.diff(ids)
        return pa.table(
            {
                "ub": pa.array([int(tbl.column("ub")[0].as_py())], pa.int64()),
                "n_events": pa.array([len(ids)], pa.int64()),
                "max_gap": pa.array(
                    [int(gaps.max()) if len(gaps) else None], pa.int64()
                ),
                "n_big_gaps": pa.array(
                    [int((gaps > 500).sum())], pa.int64()
                ),
            }
        )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.col("user_id") % 50).alias("ub")
    )
    return (
        ev.groupBy("ub")
        .applyInArrow(
            gap_census,
            schema="ub long, n_events long, max_gap long, n_big_gaps long",
        )
        .orderBy("ub")
    )
