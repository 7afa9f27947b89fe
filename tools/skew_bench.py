"""Skewed-key suite benchmark (VERDICT r04 next-round #6): end-to-end
evidence that the suite survives a planted hot key at the 8M tier — not
just the unit-level salted-aggregation tests.

Input: a warehouse materialized with ``--hot-key-share`` (default 0.5 —
half the table is full copies of clip 0: ONE degenerate clip_id, and since
bucket = crc32(clip_id), ONE degenerate bucket carrying half the rows).
Measurement: the suite wall with and without ``--salt-buckets``,
interleaved in one session (the host's episode-noise discipline), with
violations/verdict-fail counts asserted IDENTICAL — salting changes the
physical plan only.

Plan evidence is captured alongside (BENCH/skew_plans.txt): the formatted
plans of the exact-duplicates aggregation with and without salting over the
actual skewed warehouse — the salted plan must show the two-phase
(key, salt) → key aggregation — plus the session's AQE skew-join settings.

Usage: python tools/skew_bench.py [--rows 8000000] [--cpus 4] [--repeat 2]
       [--hot 0.5] [--reuse-warehouse]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(salt: int | None, cpus: int, warehouse: str, rows: int, rep: int) -> dict:
    shutil.rmtree(os.path.join(warehouse, "ledger"), ignore_errors=True)
    for t in ("results", "verdicts"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    cmd = [
        sys.executable, "-m", "pyanomalydetector2_spark.run_suite",
        "--rows", str(rows), "--cpus", str(cpus), "--skip-datagen",
        "--warehouse", warehouse,
        "--run-id", f"skew-{'salt' if salt else 'plain'}-{rep}",
    ]
    if salt:
        cmd += ["--salt-buckets", str(salt)]
    r = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=3600
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"salt={salt} rep {rep} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


def capture_plans(warehouse: str, out_path: str) -> None:
    """Formatted plans of the uniqueness aggregation over the REAL skewed
    table, plain vs salted, plus the session's AQE knobs."""
    if REPO not in sys.path:  # run as a script, sys.path[0] is tools/
        sys.path.insert(0, REPO)
    from pyanomalydetector2_spark.operators.uniqueness import exact_duplicates
    from pyanomalydetector2_spark.plans import explain_formatted
    from pyanomalydetector2_spark.session import get_spark
    from pyanomalydetector2_spark.sources.catalog import open_table

    spark = get_spark(cpus=4, app_name="pyad2-skew-plans")
    spark.sparkContext.setLogLevel("ERROR")
    cur = open_table(spark, os.path.join(warehouse, "clips_current")).read(spark)
    lines = [
        "AQE session settings:",
        f"  spark.sql.adaptive.enabled = "
        f"{spark.conf.get('spark.sql.adaptive.enabled')}",
        f"  spark.sql.adaptive.skewJoin.enabled = "
        f"{spark.conf.get('spark.sql.adaptive.skewJoin.enabled')}",
        "",
        "== exact_duplicates, PLAIN (one shuffle on the hot key) ==",
        explain_formatted(exact_duplicates(cur, "clip_id")),
        "",
        "== exact_duplicates, SALTED 16 (two-phase (key, salt) -> key) ==",
        explain_formatted(exact_duplicates(cur, "clip_id", 16)),
    ]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--hot", type=float, default=0.5)
    ap.add_argument("--salt", type=int, default=16)
    ap.add_argument("--warehouse", default="/tmp/pyad2_skew_wh")
    ap.add_argument("--reuse-warehouse", action="store_true")
    args = ap.parse_args()

    have = os.path.exists(
        os.path.join(args.warehouse, "clips_current", "_meta.json")
    )
    if not (args.reuse_warehouse and have):
        shutil.rmtree(args.warehouse, ignore_errors=True)
        r = subprocess.run(
            [
                sys.executable, "-m", "pyanomalydetector2_spark.run_suite",
                "--rows", str(args.rows), "--buckets", str(args.buckets),
                "--cpus", "16",  # the >8-worker allocation convoy
                "--hot-key-share", str(args.hot),
                "--warehouse", args.warehouse, "--run-id", "materialize",
            ],
            cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("materialize failed")
        time.sleep(10)

    walls: dict[str, list[float]] = {"plain": [], "salted": []}
    counts: dict[str, tuple] = {}
    for rep in range(args.repeat):
        for name, salt in (("plain", None), ("salted", args.salt)):
            s = run_one(salt, args.cpus, args.warehouse, args.rows, rep)
            walls[name].append(s["wall_sec"])
            counts[name] = (s["violations"], s["failed_verdicts"])
            print(
                f"[skew] rep{rep} {name}: wall={s['wall_sec']}s "
                f"viol={s['violations']} fails={s['failed_verdicts']}",
                flush=True,
            )
            time.sleep(5)

    assert counts["plain"] == counts["salted"], counts

    plans_path = os.path.join(REPO, "BENCH", "skew_plans.txt")
    capture_plans(args.warehouse, plans_path)

    med = {k: round(statistics.median(v), 1) for k, v in walls.items()}
    out = {
        "metric": "skewed_suite_wall",
        "rows": args.rows,
        "hot_key_share": args.hot,
        "cpus": args.cpus,
        "walls": walls,
        "medians": med,
        "counts": {k: list(v) for k, v in counts.items()},
        "plans": os.path.relpath(plans_path, REPO),
    }
    path = os.path.join(REPO, "BENCH", "skew.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
