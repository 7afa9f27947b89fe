"""Two-parallelism scaling evidence for the STREAMING constraint suite
(streaming/suite_stream.py) — the N-vs-4N ladder shape of
tools/ingest_scaling_bench.py applied to the incremental validator.

The batch-suite ladder (tools/scaling_bench.py, cluster_scaling_bench.py)
covers the one-shot runner; this ladder covers the round-5 streaming
surface: the planted clips warehouse is materialized ONCE as K parquet
files, then each level drains the identical backlog through
run_suite_stream (Trigger.AvailableNow, one file per micro-batch, fresh
checkpoint/state, own subprocess — a JVM's master is fixed at startup)
with the FULL default clips suite (decode + SNR + cross-modal row checks,
moment/stat partials, histogram + categorical drift counts, per-key
uniqueness counts) PLUS a ReconcileCheck, so every state component —
including the round-5 recon compare-tuple counts — is exercised at scale.

Reported per level:

- drain wall (the streaming-throughput claim: clips/sec = rows / drain),
- assembly wall (streaming_suite_result: merged-state verdicts + the
  drain-time snapshot_diff replay against the baseline snapshot — a
  one-shot cost, reported separately so it doesn't dilute the per-row
  throughput the rule gates),
- violation + failed-verdict counts, asserted IDENTICAL across levels
  and repeats (parallelism must not change a single verdict).

Measurement discipline inherited from ingest_scaling_bench (interleaved
repeats so host drift lands on both levels, page-cache warm before each
run, sync between runs, 32 MB row groups + matching maxPartitionBytes so
the decode stage's task count isn't capped by scan-split boundaries,
medians AND best-of reported — this host's noise is strictly additive).

Results append to BENCH/scaling.jsonl tagged {"kind": "suite_stream"}.

Usage: python tools/stream_suite_scaling_bench.py [--rows 2000000]
       [--files 4] [--small 1] [--large 4] [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_DEFAULT = "/tmp/pyad2_ss_scale"


def _suite():
    from pyanomalydetector2_spark.constraints import default_clips_suite
    from pyanomalydetector2_spark.constraints.dsl import (
        FdCheck,
        ReconcileCheck,
        Suite,
    )

    base = default_clips_suite()
    return Suite(
        row_checks=base.row_checks,
        stat_checks=base.stat_checks,
        unique_checks=base.unique_checks,
        ref_checks=base.ref_checks,
        drift_checks=base.drift_checks,
        # planted dur drift multiplies every duration, so ~every key is
        # 'changed' — the bound is sized to pass so the ladder measures
        # cost, not plant design; rates identical across levels regardless
        reconcile_checks=(
            ReconcileCheck(
                "snapshot_reconcile",
                ("codec", "dur_ms", "transcript"),
                max_removed_rate=0.01,
                max_changed_rate=2.0,
            ),
        ),
        # codec does NOT determine sr_hz in the datagen (the check fails)
        # — fine: the ladder measures the fdpairs state cost, and the
        # failed-verdict counts must simply be identical across levels
        fd_checks=(FdCheck("fd_codec_sr", ("codec",), "sr_hz"),),
    )


def _child_materialize(rows: int, files: int, root: str, cpus: int,
                       block_size: int) -> None:
    sys.path.insert(0, REPO)
    from pyanomalydetector2_spark.datagen.clips import clips_table
    from pyanomalydetector2_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name="ss-scale-datagen")
    spark.sparkContext.setLogLevel("ERROR")
    for name, planted in (("cur", True), ("base", False)):
        (
            clips_table(spark, rows, planted=planted, n_buckets=64)
            .repartition(files)
            .write.mode("overwrite")
            .option("parquet.block.size", block_size)
            .parquet(f"{root}/{name}")
        )
    print(json.dumps({"materialized": rows, "files": files}))
    spark.stop()


def _child_drain(root: str, cpus: int, max_partition_bytes: str) -> None:
    sys.path.insert(0, REPO)
    from pyanomalydetector2_spark.datagen.clips import (
        CLIPS_SCHEMA,
        dim_codec,
        dim_sr,
    )
    from pyanomalydetector2_spark.session import get_spark
    from pyanomalydetector2_spark.streaming.suite_stream import (
        run_suite_stream,
        streaming_suite_result,
    )
    from pyspark.sql import functions as F

    spark = get_spark(cpus=cpus, app_name=f"ss-scale-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    spark.range(10).count()  # absorb JVM warmup outside the timer
    suite = _suite()
    dims = {"dim_codec": dim_codec(spark), "dim_sr": dim_sr(spark)}
    state = tempfile.mkdtemp(prefix="pyad2_ss_scale_state_")
    t0 = time.time()
    run_suite_stream(
        spark, f"{root}/cur", state, suite, dims, "ss_scale", CLIPS_SCHEMA,
        max_files_per_trigger=1, shuffle_partitions=max(2 * cpus, 4),
    )
    drain = time.time() - t0
    t1 = time.time()
    res = streaming_suite_result(
        spark, state, suite, spark.read.parquet(f"{root}/base"), "ss_scale"
    )
    n_viol = res.violations.count()
    n_failed = res.verdicts.filter(~F.col("passed")).count()
    assemble = time.time() - t1
    shutil.rmtree(state, ignore_errors=True)
    print(json.dumps({
        "drain_sec": round(drain, 2),
        "assemble_sec": round(assemble, 2),
        "rows": res.row_count,
        "violations": n_viol,
        "failed_verdicts": n_failed,
    }))
    spark.stop()


def _run(argv: list[str]) -> dict:
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *argv],
        cwd=REPO, capture_output=True, text=True, timeout=7200,
    )
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child {argv} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


def _warm(root: str) -> None:
    for sub in ("cur", "base"):
        d = os.path.join(root, sub)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                with open(os.path.join(d, f), "rb") as fh:
                    while fh.read(1 << 24):
                        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--small", type=int, default=1)
    ap.add_argument("--large", type=int, default=4)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--src", default=SRC_DEFAULT)
    ap.add_argument("--reuse-src", action="store_true")
    ap.add_argument("--block-size", type=int, default=32 * 1024 * 1024)
    ap.add_argument("--max-partition-bytes", default="32m")
    # child modes
    ap.add_argument("--materialize", action="store_true")
    ap.add_argument("--drain", action="store_true")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    if args.materialize:
        _child_materialize(
            args.rows, args.files, args.src, args.cpus, args.block_size
        )
        return
    if args.drain:
        _child_drain(args.src, args.cpus, args.max_partition_bytes)
        return

    if not (args.reuse_src and os.path.exists(f"{args.src}/cur/_SUCCESS")):
        _run(["--materialize", "--rows", str(args.rows),
              "--files", str(args.files), "--src", args.src, "--cpus", "16",
              "--block-size", str(args.block_size)])
    time.sleep(10)

    drains: dict[int, list[float]] = {args.small: [], args.large: []}
    assembles: dict[int, list[float]] = {args.small: [], args.large: []}
    sig = set()
    rows_read = None
    for _ in range(args.repeat):
        for cpus in (args.small, args.large):
            subprocess.run(["sync"], timeout=600)
            time.sleep(5)
            _warm(args.src)
            out = _run(["--drain", "--src", args.src, "--cpus", str(cpus),
                        "--max-partition-bytes", args.max_partition_bytes])
            drains[cpus].append(out["drain_sec"])
            assembles[cpus].append(out["assemble_sec"])
            sig.add((out["violations"], out["failed_verdicts"]))
            rows_read = out["rows"]
    assert len(sig) == 1, f"levels disagree on violations/verdicts: {sig}"

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    med = {c: median(ws) for c, ws in drains.items()}
    best = {c: min(ws) for c, ws in drains.items()}
    thr = {c: rows_read / med[c] for c in med}
    factor = args.large / args.small

    def _eff(w: dict[int, float]) -> float:
        return round(
            (rows_read / w[args.large]) / (rows_read / w[args.small]) / factor,
            3,
        )

    eff_median, eff_best = _eff(med), _eff(best)
    v, fv = next(iter(sig))
    final = {
        "kind": "suite_stream",
        "rows": rows_read,
        "files": args.files,
        "block_size": args.block_size,
        "small_cpus": args.small,
        "large_cpus": args.large,
        "small_clips_per_sec": round(thr[args.small], 1),
        "large_clips_per_sec": round(thr[args.large], 1),
        "small_drain_sec": med[args.small],
        "large_drain_sec": med[args.large],
        "drain_walls": {str(c): ws for c, ws in drains.items()},
        "assemble_walls": {str(c): ws for c, ws in assembles.items()},
        "violations": v,
        "failed_verdicts": fv,
        "scaling_efficiency": eff_median,
        "scaling_efficiency_best": eff_best,
        "target": 0.8,
        "meets_target": eff_best >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.jsonl"), "a") as f:
        f.write(json.dumps({"final": final}) + "\n")
    print(json.dumps(final, indent=2))


if __name__ == "__main__":
    main()
