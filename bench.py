"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit": "sec", "queries": {...}, "sf": ...}.

Each query is forced with the noop sink (full computation, no driver
collection). A warmup pass absorbs JVM/codegen startup so numbers reflect
steady-state plan execution.

Measurement design (VERDICT r02 next-round #7): this sandbox's hosting
throughput varies >2× BETWEEN episodes, so round-robin INTERLEAVING inside
one session is the only layout where per-query numbers are comparable —
every query samples the same episode conditions, and a mid-episode slowdown
taxes all queries equally instead of whichever query it landed on. The
reported per-query figure is the MEDIAN across rounds (robust to one
slow round; best-of hides systematic cost, mean chases outliers).

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_REPEAT (default 3
measured rounds), BENCH_WARMUP (default 1 discarded round), BENCH_ONLY
(comma-separated query subset), BENCH_SAMPLES=1 (include raw per-round
samples in the JSON for noise attribution).
"""

from __future__ import annotations

import json
import os
import re
import statistics
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

    samples: dict[str, list[float]] = {name: [] for name in qs}
    for rnd in range(warmup + repeat):
        for name, fn in qs.items():
            t0 = time.time()
            force(fn(spark, sf_dir))
            dt = time.time() - t0
            if rnd >= warmup:
                samples[name].append(round(dt, 4))
            # queries that persist intermediates (shared shingle frames)
            # must not leak cache blocks into later queries' measurements
            spark.catalog.clearCache()

    timings = {
        name: round(statistics.median(s), 4) for name, s in samples.items()
    }
    total = round(sum(timings.values()), 4)
    out = {
        "metric": "suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "stat": "median_interleaved",
        "rounds": repeat,
    }
    if os.environ.get("BENCH_SAMPLES"):
        out["samples"] = samples
    print(json.dumps(out))


if __name__ == "__main__":
    main()
