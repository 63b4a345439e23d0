#!/usr/bin/env python
"""Dump .explain("formatted") for registry gates to plans/r13/.

Usage: python tools/explain_gate.py <suffix> gate1 [gate2 ...]
Writes plans/r13/<gate>_<suffix>.txt for each gate.

Runs under the same env contract as bench.py (SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS); plan capture only — nothing is executed beyond
whatever eager artifact work the gate function itself performs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DAM_SHARE_FRAMES", "1")
os.environ.setdefault("SPARK_DAM_SPLIT_SMALL_SCANS", "1")

from database_activity_monitoring_dam_system_spark.plans.registry import (
    all_queries,
)
from database_activity_monitoring_dam_system_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", os.environ.get("PLANS_ROUND", "r14"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dam-explain")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
