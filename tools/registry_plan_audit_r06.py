"""Round-6 registry-wide plan audit (guide §7.2): for EVERY queries()
entry, capture the optimized plan's shape signals — Exchange count,
Python-boundary nodes (BatchEvalPython/ArrowEvalPython/MapInPandas),
join strategies, and whether the parquet scans carry PushedFilters —
so the per-query optimization checklist cites fresh evidence instead
of memory. Measurement-only — never run by the driver bench.

Usage: python tools/registry_plan_audit_r06.py [sf_dir] > plans/r06/registry_audit.txt
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from name_matcher_spark import harness  # noqa: E402
from name_matcher_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))

PY_NODES = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "MapInArrow",
            "FlatMapGroupsInPandas")
JOINS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
         "BroadcastNestedLoopJoin", "CartesianProduct")


def main() -> None:
    spark = get_spark(
        app_name="nms-plan-audit", master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    harness.ensure_phonetic_sidecar(spark, SF_DIR)
    qs = dict(harness.QUERIES)
    print(f"# Registry plan audit — sf_dir={SF_DIR}, {len(qs)} queries")
    print("# exchanges = Exchange nodes in the optimized physical plan")
    print("# python    = Python-boundary nodes (BatchEval/ArrowEval/MapIn*)")
    print("# joins     = join operators by strategy")
    print("# pushed    = scans whose PushedFilters list is non-empty / scans")
    print()
    for name, fn in qs.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            continue
        # Count numbered operator headers only ("(12) Exchange"), not
        # the detail-section repeats of the same node name.
        heads = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
        n_ex = sum(1 for h in heads if h == "Exchange")
        pys = {p: sum(1 for h in heads if h == p) for p in PY_NODES
               if any(h == p for h in heads)}
        joins = {j: sum(1 for h in heads if h == j) for j in JOINS
                 if any(h == j for h in heads)}
        scans = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed = sum(1 for s in scans if s.strip())
        print(
            f"{name}: exchanges={n_ex} python={pys or 'NONE'} "
            f"joins={joins or '{}'} pushed_scans={pushed}/{len(scans)}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
