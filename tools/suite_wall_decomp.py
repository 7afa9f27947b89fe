"""Suite-wall decomposition (VERDICT r04 next-round #3): attribute the
r2→r4 8M-row wall growth to ADDED WORK vs HOST, by running ablated suite
configurations interleaved in ONE session on the SAME materialized
warehouse — the only layout this host's >2× between-episode variance
permits for comparisons (BENCH/BASELINE.md §5).

Configs, all over the identical input:
  full      — the current default suite (r05: incl. categorical drift +
              the three cross-modal transcript checks), eager verdicts
  nocat     — full minus codec_drift (categorical drift ablated)
  noxmodal  — full minus the three r05 cross-modal row checks (≈ the r04
              suite shape)
  lazy      — full with --lazy-verdicts (one union job, family scans
              overlap) instead of the sequential localCheckpoint

Each run is its own subprocess/JVM (a fixed master per JVM), configs
round-robin so every config samples the same episode conditions; medians
per config. Violations/verdict counts are asserted IDENTICAL across
full/lazy (the knob is execution-shape only) and recorded for the
ablations.

Usage: python tools/suite_wall_decomp.py [--rows 8000000] [--cpus 4]
       [--repeat 2] [--reuse-warehouse] [--configs full,noxmodal]
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

CONFIGS: dict[str, list[str]] = {
    "full": [],
    "nocat": ["--drop-checks", "codec_drift"],
    "noxmodal": [
        "--drop-checks",
        "transcript_silence_consistent,transcript_speech_labeled,"
        "speaking_rate_sane",
    ],
    "lazy": ["--lazy-verdicts"],
}


def run_one(cfg: str, cpus: int, warehouse: str, rows: int, rep: int) -> dict:
    shutil.rmtree(os.path.join(warehouse, "ledger"), ignore_errors=True)
    for t in ("results", "verdicts"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    r = subprocess.run(
        [
            sys.executable, "-m", "pyanomalydetector2_spark.run_suite",
            "--rows", str(rows), "--cpus", str(cpus), "--skip-datagen",
            "--warehouse", warehouse, "--run-id", f"decomp-{cfg}-{rep}",
            *CONFIGS[cfg],
        ],
        cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"config {cfg} rep {rep} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--warehouse", default="/tmp/pyad2_scaling_wh")
    ap.add_argument("--reuse-warehouse", action="store_true")
    ap.add_argument(
        "--configs", default=",".join(CONFIGS),
        help="comma-separated subset of configs to run (still interleaved)",
    )
    args = ap.parse_args()
    configs = [c.strip() for c in args.configs.split(",") if c.strip()]
    unknown = [c for c in configs if c not in CONFIGS]
    if unknown:
        raise SystemExit(f"unknown configs: {unknown}")

    have = os.path.exists(
        os.path.join(args.warehouse, "clips_current", "_meta.json")
    )
    if not (args.reuse_warehouse and have):
        shutil.rmtree(args.warehouse, ignore_errors=True)
        r = subprocess.run(
            [
                sys.executable, "-m", "pyanomalydetector2_spark.run_suite",
                "--rows", str(args.rows), "--buckets", str(args.buckets),
                # 16, not 32: the known >8-worker allocation convoy
                "--cpus", "16",
                "--warehouse", args.warehouse, "--run-id", "materialize",
            ],
            cwd=REPO, capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit("materialize failed")
        time.sleep(10)

    walls: dict[str, list[float]] = {c: [] for c in configs}
    counts: dict[str, tuple] = {}
    for rep in range(args.repeat):
        for cfg in configs:
            s = run_one(cfg, args.cpus, args.warehouse, args.rows, rep)
            walls[cfg].append(s["wall_sec"])
            counts[cfg] = (s["violations"], s["failed_verdicts"])
            print(
                f"[decomp] rep{rep} {cfg}: wall={s['wall_sec']}s "
                f"viol={s['violations']} fails={s['failed_verdicts']}",
                flush=True,
            )
            # each run writes ~100s of MB of results/verdicts that the next
            # run deletes; without a sync the successor pays the writeback
            # (the ingest ladder's root-cause #3, BENCH/BASELINE.md §10)
            subprocess.run(["sync"], timeout=600)
            time.sleep(5)

    if "full" in counts and "lazy" in counts:
        assert counts["full"][0] == counts["lazy"][0], counts
    med = {c: round(statistics.median(w), 1) for c, w in walls.items()}
    out = {
        "metric": "suite_wall_decomposition",
        "rows": args.rows,
        "cpus": args.cpus,
        "walls": walls,
        "medians": med,
        "counts": {c: list(v) for c, v in counts.items()},
        "deltas_vs_full": {
            c: round(med["full"] - med[c], 1)
            for c in ("nocat", "noxmodal", "lazy")
            if c in med and "full" in med
        },
    }
    path = os.path.join(REPO, "BENCH", "decomp.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
