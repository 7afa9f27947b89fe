"""Two-cluster-size scaling evidence (BASELINE.md / north_rule).

No real cluster in this sandbox, so the same suite runs at two local
parallelism levels on IDENTICAL materialized input:
  throughput_N  = rows / wall_N
  efficiency    = (throughput_4N / throughput_N) / 4      (ideal = 1.0)

Default levels are local[1] vs local[4] (N and 4N): this sandbox's kernel
page-supply throughput saturates at ~4-8 concurrent memory-allocating
workers (measured: 1 proc first-touches 400 MB in 10.6 s; 4 procs in 4.9 s
aggregate; 16 procs in 8.7 s — i.e. ABOVE ~8 workers the host serializes
allocation and ANY allocation-heavy workload anti-scales). Both measurement
points therefore sit below the host ceiling; the ceiling itself is a
hypervisor property, not an engine property (pure-CPU work scales to 32
procs: 32× md5 work in 0.20 s vs 0.13 s single). See BENCH/BASELINE.md.

Each parallelism level runs in its own subprocess (a JVM's master is fixed
at startup). Results go to BENCH/scaling.jsonl + a summary on stdout.

Usage: python tools/scaling_bench.py [--rows 8000000] [--small 1] [--large 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, warehouse: str, rows: int, out: str, repeat: int) -> dict:
    best = None
    for i in range(repeat):
        ledger = os.path.join(warehouse, "ledger")
        shutil.rmtree(ledger, ignore_errors=True)
        for t in ("results", "verdicts"):
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        r = subprocess.run(
            [
                sys.executable,
                "-m",
                "pyanomalydetector2_spark.run_suite",
                "--rows",
                str(rows),
                "--cpus",
                str(cpus),
                "--skip-datagen",
                "--warehouse",
                warehouse,
                "--run-id",
                f"scale-{cpus}-{i}",
                "--json-out",
                out,
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"run at cpus={cpus} failed")
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        if best is None or summary["wall_sec"] < best["wall_sec"]:
            best = summary
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--large", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--warehouse", default="/tmp/pyad2_scaling_wh")
    ap.add_argument(
        "--reuse-warehouse",
        action="store_true",
        help="skip materialization if the warehouse already has snapshots",
    )
    args = ap.parse_args()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "scaling.jsonl")

    # materialize the input ONCE (both levels read the same files)
    have = os.path.exists(os.path.join(args.warehouse, "clips_current", "_meta.json"))
    if args.reuse_warehouse and have:
        for t in ("results", "verdicts", "ledger"):
            shutil.rmtree(os.path.join(args.warehouse, t), ignore_errors=True)
        time.sleep(5)
        small = run_level(args.small, args.warehouse, args.rows, out, args.repeat)
        time.sleep(10)
        large = run_level(args.large, args.warehouse, args.rows, out, args.repeat)
        _report(args, out, small, large)
        return
    shutil.rmtree(args.warehouse, ignore_errors=True)
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "pyanomalydetector2_spark.run_suite",
            "--rows",
            str(args.rows),
            "--buckets",
            str(args.buckets),
            "--cpus",
            # 16, not 32: materializing 8M rows at 32 python workers
            # crashes workers / GC-thrashes the driver on this host (the
            # known >8-worker allocation convoy) — r04 hit it reproducibly
            "16",
            "--warehouse",
            args.warehouse,
            "--run-id",
            "materialize",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit("materialize run failed")

    time.sleep(10)  # let page-cache writeback settle between measurements
    small = run_level(args.small, args.warehouse, args.rows, out, args.repeat)
    time.sleep(10)
    large = run_level(args.large, args.warehouse, args.rows, out, args.repeat)
    _report(args, out, small, large)


def _report(args, out: str, small: dict, large: dict) -> None:
    thr_s, thr_l = small["value"], large["value"]
    factor = args.large / args.small
    eff = (thr_l / thr_s) / factor
    result = {
        "rows": args.rows,
        "small_cpus": args.small,
        "large_cpus": args.large,
        "small_clips_per_sec": thr_s,
        "large_clips_per_sec": thr_l,
        "small_wall_sec": small["wall_sec"],
        "large_wall_sec": large["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    with open(out, "a") as f:
        f.write(json.dumps({"final": result}) + "\n")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
