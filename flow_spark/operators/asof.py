"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no native as-of join (SPARK-22947 stalled); the scalable
implementation is the union+window trick:

    union(left tagged side=1, right tagged side=0)
    -> window PARTITION BY key ORDER BY (ts, side, id)
    -> last(right_value, ignoreNulls=True) over rows UNBOUNDED PRECEDING
    -> keep left rows

Cost: ONE shuffle + sort on (key, ts) — same as a sort-merge join — versus
`applyInPandas` + `pd.merge_asof` per key (Arrow round trip, Python in the
hot path).  At 100 TB the window form also survives skewed keys better
(AQE can split a sort; a single giant pandas group OOMs).

Right-side duplicate timestamps are deduped (latest id wins) so the match
is deterministic — engines disagree on ties otherwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    value_cols: list[str],
    right_id_col: str | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Backward as-of join; returns left columns + matched `value_cols`.

    `right_id_col` (if given) breaks right-side timestamp ties by keeping
    the row with the greatest id.
    """
    if right_id_col is not None:
        w_dedup = W.partitionBy(by, ts_col).orderBy(F.desc(right_id_col))
        right = (
            right.withColumn("__rn", F.row_number().over(w_dedup))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    lcols = left.columns
    tagged_l = left.select(
        *lcols, F.lit(1).alias("__side"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols]
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (by, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)

    # at equal ts: side 0 (right) sorts first so an exact-ts right row is
    # visible to the left row (merge_asof allow_exact_matches=True); for
    # strict inequality the right row must sort AFTER the left one.
    side_order = F.asc("__side") if allow_exact_matches else F.desc("__side")
    w = (
        W.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), side_order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
