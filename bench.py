"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution uses the `noop` sink so the full plan runs (scan -> shuffle ->
agg) without driver-side collect cost distorting the numbers.

Each query runs once untimed, then timed: the untimed pass absorbs
one-off session costs (whole-stage codegen compilation, parquet footer
reads, Python-UDF worker spin-up) so the metric is steady-state engine
throughput — the quantity that actually scales to a long-running cluster —
not JVM warm-up, which would dominate (~60%) at sf0.1 and add run-to-run
noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flow_spark.queries.registry import all_queries
from flow_spark.session import get_spark

#: headline set: one per major operator family (scan/agg, multi-join,
#: window, set-op, dedup exact/minhash, similarity, text, streaming window,
#: throttler) — the mix a training-data pipeline actually runs.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_product_profit",
    "q18_large_orders",
    "q21_waiting_supplier",
    "win_topk_per_group",
    "join_left_outer",
    "asof_join_backward",
    "scale_bucketed_range_join",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_lsh_ann",
    "text_token_stats",
    "stream_window_tumbling",
    "pipe_throttler",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark("flow-spark-bench")

    # warm the JVM/codegen once outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    queries = all_queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = queries[name]
        q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        # median of 5 timed runs: single-run numbers swing +-40% under
        # background load; the median is the stable engine-cost signal
        runs = []
        for _ in range(5):
            t0 = time.perf_counter()
            q.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[2], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
