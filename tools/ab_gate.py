#!/usr/bin/env python
"""Isolated per-gate bench: one process, one gate, bench protocol
(warmup + min of RUNS). Prints one line: <gate> <seconds>.

Usage: python tools/ab_gate.py gate1 [gate2 ...]
Each gate gets its own fresh timing but shares the process JVM, so
pass ONE gate per invocation for fully isolated numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DAM_SHARE_FRAMES", "1")
os.environ.setdefault("SPARK_DAM_SPLIT_SMALL_SCANS", "1")
os.environ.setdefault("SPARK_DAM_CKPT_SCOPE", "1")  # bench.py parity

from database_activity_monitoring_dam_system_spark import ckpt
from database_activity_monitoring_dam_system_spark.plans.registry import (
    all_queries,
)
from database_activity_monitoring_dam_system_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("BENCH_RUNS", "3"))


def main() -> None:
    spark = get_spark("dam-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for name in sys.argv[1:]:
        fn = specs[name].fn
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        ckpt.release()
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            ckpt.release()  # outside the timing window (bench.py parity)
        print(f"{name} {best:.3f}", flush=True)


if __name__ == "__main__":
    main()
