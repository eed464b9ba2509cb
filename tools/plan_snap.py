"""Snapshot .explain("formatted") per headline query into plans/<round>/.

Usage: python tools/plan_snap.py <suffix> [sf_dir] [name ...]

Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<suffix>.txt (suffix =
before|after; round defaults to r08).  The optimization judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
files, so they are committed verbatim.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from flow_spark.queries.registry import all_queries  # noqa: E402
from flow_spark.session import get_spark  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r08"),
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plan-snap")
    qs = all_queries()
    for name in names:
        df = qs[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        n_py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
        joins = [
            j
            for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin", "BroadcastNestedLoopJoin")
            if j in plan
        ]
        print(f"{name:28s} exchanges={n_exch} python_nodes={n_py} joins={','.join(joins) or '-'}")


if __name__ == "__main__":
    main()
