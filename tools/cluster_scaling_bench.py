"""Multi-EXECUTOR two-cluster-size scaling evidence (north_rule: "run via
spark-submit --py-files on a multi-executor cluster at two cluster sizes
(N and 4N executors)").

tools/scaling_bench.py measures the N-vs-4N core ladder inside ONE local
JVM — right for isolating engine scaling from this host's quirks, but a
single-JVM local master short-circuits the parts of Spark a real cluster
exercises: executors in separate JVMs, task binaries + closures crossing a
real wire, --py-files actually shipped to and imported by remote workers,
shuffle blocks fetched over netty rather than read in-process.

This bench closes that gap with Spark's `local-cluster[N, cores, mem]`
master: a real standalone-mode cluster manager on one machine, spawning N
SEPARATE executor JVMs. The suite is launched exactly as the north rule
states — `spark-submit --py-files pyad2_pyfiles.zip tools/submit_suite.py`
— at N=--small and N=--large executors (1 core each, so the ladder factor
is executor count, and both total-core levels stay below this host's ~4-8
concurrent-worker page-allocation ceiling, BENCH/BASELINE.md §2).

Same measurement discipline as the other ladders: identical materialized
input for every run, interleaved levels, per-level medians.

Usage: python tools/cluster_scaling_bench.py [--rows 2000000]
       [--small 1] [--large 4] [--repeat 2]
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


def _spark_submit_env() -> dict[str, str]:
    """spark-submit + local-cluster need SPARK_HOME: an existing install
    (e.g. /opt/spark) wins; otherwise the pip-installed pyspark package
    directory works (it ships bin/, sbin/ and jars/)."""
    import pyspark

    env = dict(os.environ)
    if not env.get("SPARK_HOME"):
        env["SPARK_HOME"] = os.path.dirname(
            os.path.abspath(pyspark.__file__)
        )
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return env


def run_level(
    executors: int,
    cores_per_exec: int,
    exec_mem_mb: int,
    warehouse: str,
    rows: int,
    pyfiles: str,
    out: str,
    run_id: str,
) -> dict:
    env = _spark_submit_env()
    # the entry script resolves the master from PYAD2_MASTER (session.py):
    # spark-submit's --master and the in-script builder agree by carrying
    # the same value in both places
    master = f"local-cluster[{executors},{cores_per_exec},{exec_mem_mb}]"
    env["PYAD2_MASTER"] = master
    for t in ("results", "verdicts", "ledger"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    spark_submit = os.path.join(env["SPARK_HOME"], "bin", "spark-submit")
    r = subprocess.run(
        [
            spark_submit,
            "--master", master,
            "--py-files", pyfiles,
            "--conf", f"spark.executor.memory={exec_mem_mb - 512}m",
            # 8g: the 8M-row verdict materialization needs it (BASELINE.md
            # round-4 scaling note)
            "--conf", "spark.driver.memory=8g",
            "tools/submit_suite.py",
            "--rows", str(rows),
            "--cpus", str(executors * cores_per_exec),
            "--skip-datagen",
            "--warehouse", warehouse,
            "--run-id", run_id,
            "--json-out", out,
        ],
        cwd=REPO, capture_output=True, text=True, timeout=3600, env=env,
    )
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"spark-submit at {executors} executors failed")
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    summary["master"] = master
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--large", type=int, default=4)
    ap.add_argument("--cores-per-executor", type=int, default=1)
    ap.add_argument("--executor-mem-mb", type=int, default=3072)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--warehouse", default="/tmp/pyad2_cluster_wh")
    ap.add_argument("--reuse-warehouse", action="store_true")
    args = ap.parse_args()

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "scaling.jsonl")

    have = os.path.exists(
        os.path.join(args.warehouse, "clips_current", "_meta.json")
    )
    if not (args.reuse_warehouse and have):
        shutil.rmtree(args.warehouse, ignore_errors=True)
        r = subprocess.run(
            [
                sys.executable, "-m", "pyanomalydetector2_spark.run_suite",
                "--rows", str(args.rows), "--buckets", str(args.buckets),
                "--cpus", "16",  # >16 workers hits the host alloc convoy
                "--warehouse", args.warehouse, "--run-id", "materialize",
            ],
            cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("materialize run failed")
    time.sleep(10)

    # interleaved levels, per-level medians (BENCH/BASELINE.md discipline)
    walls: dict[int, list[float]] = {args.small: [], args.large: []}
    thr_by_wall: dict[int, dict[float, float]] = {
        args.small: {}, args.large: {},
    }
    for i in range(args.repeat):
        for n_exec in (args.small, args.large):
            s = run_level(
                n_exec, args.cores_per_executor, args.executor_mem_mb,
                args.warehouse, args.rows, _pyfiles(), out,
                f"cluster-{n_exec}x-{i}",
            )
            walls[n_exec].append(s["wall_sec"])
            thr_by_wall[n_exec][s["wall_sec"]] = s["value"]
            time.sleep(5)

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    med = {c: median(ws) for c, ws in walls.items()}
    thr = {c: args.rows / med[c] for c in med}
    factor = args.large / args.small
    eff = (thr[args.large] / thr[args.small]) / factor
    final = {
        "kind": "multi_executor",
        "launcher": "spark-submit --py-files",
        "rows": args.rows,
        "small_executors": args.small,
        "large_executors": args.large,
        "cores_per_executor": args.cores_per_executor,
        "small_clips_per_sec": round(thr[args.small], 1),
        "large_clips_per_sec": round(thr[args.large], 1),
        "small_wall_sec": med[args.small],
        "large_wall_sec": med[args.large],
        "walls": {str(c): ws for c, ws in walls.items()},
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    with open(out, "a") as f:
        f.write(json.dumps({"final": final}) + "\n")
    print(json.dumps(final, indent=2))


_PYFILES: str | None = None


def _pyfiles() -> str:
    global _PYFILES
    if _PYFILES is None:
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from make_pyfiles_zip import main as make_zip

        _PYFILES = make_zip("/tmp/pyad2_pyfiles.zip")
    return _PYFILES


if __name__ == "__main__":
    main()
