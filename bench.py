"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with the noop sink (full computation, no driver
collection). A warmup pass absorbs JVM/codegen startup so numbers reflect
steady-state plan execution.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPEAT (default 2,
best-of), BENCH_WARMUP (default 1).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as ent  # noqa: E402
from pyanomalydetector2_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # best-of-3 by default: this sandbox's hosting throughput varies >2×
    # between episodes (BENCH/BASELINE.md §6) — the per-query floor is the
    # stable quantity, and a third repeat costs ~30 s against that noise
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(cpus=cpus, app_name="pyad2-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = ent.queries()
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        for _ in range(warmup):
            force(fn(spark, sf_dir))
        best = float("inf")
        for _ in range(repeat):
            t0 = time.time()
            force(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
        timings[name] = round(best, 4)
        # queries that persist intermediates (shared shingle frames) must
        # not leak cache blocks into later queries' measurements
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
