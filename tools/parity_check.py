"""Run the DuckDB-oracle parity check over registered queries.

Usage: python tools/parity_check.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from flow_spark.oracle import check_query
from flow_spark.queries.registry import all_queries
from flow_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    # SPARK_GRAFT_SHUFFLE overrides for adversarial-partitioning sweeps
    # (e.g. 7): results must be identical at ANY partition count
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
    spark = get_spark("parity-check", shuffle_partitions=shuffle)
    failures = 0
    ran = 0
    qs = all_queries()
    for name, q in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        ran += 1
        t0 = time.time()
        try:
            res = check_query(spark, q, sf_dir)
            dt = time.time() - t0
            mark = "PASS" if res.ok else "FAIL"
            print(f"{mark} {name:32s} {dt:6.2f}s rows={res.spark_rows} {res.detail[:200]}")
            if not res.ok:
                failures += 1
        except Exception as e:  # noqa: BLE001
            dt = time.time() - t0
            print(f"ERROR {name:32s} {dt:6.2f}s {type(e).__name__}: {str(e)[:300]}")
            failures += 1
    skipped = len(qs) - ran
    note = f" ({skipped} filtered out)" if skipped else ""
    print(f"\n{failures} failures / {ran} queries run{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
