"""One-off: steady-state sf0.1 vs sf1 timings for this round's new
queries (the SCALE.md wave-table protocol: one untimed warm pass, then
median of 3 timed runs, cache blocks released between queries)."""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from flow_spark.queries.registry import all_queries  # noqa: E402
from flow_spark.session import get_spark, release_cached_blocks  # noqa: E402
from tools.make_sf1 import ensure_sf1  # noqa: E402

NEW = [
    "snap_stats_agg",
    "snap_hidden_partitioning",
    "stream_changefeed_replication",
]


def main() -> int:
    spark = get_spark("sf1-measure", shuffle_partitions=32)
    sf1 = ensure_sf1()
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in NEW:
        q = qs[name]
        row: dict[str, float] = {}
        for label, sf in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", sf1)):
            q.builder(spark, sf).collect()  # warm
            times = []
            for _ in range(3):
                t0 = time.time()
                q.builder(spark, sf).collect()
                times.append(time.time() - t0)
            row[label] = round(statistics.median(times), 2)
            release_cached_blocks(spark)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
