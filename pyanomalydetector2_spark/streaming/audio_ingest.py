"""Structured Streaming audio ingest — continuous near-dup detection
against a growing fingerprint index, with container-consistency
quarantine at the door.

The batch-side audio operators (`operators.audio_fp`,
`operators.multimodal`) compose here into the shape a training-data lake
actually runs: clips ARRIVE (file-source stream), each micro-batch is

  1. gated   — declared-vs-container consistency check (same semantics
               as `with_consistency_fields`); rows whose container walk
               fails or whose declared metadata contradicts the header go
               to a quarantine table, never into the index,
  2. hashed  — decode + spectral fingerprint; steps 1–2 run as ONE fused
               Arrow pass (`audio_fp.ingest_gate_fingerprints`) so the
               batch's dominant column (`bytes`) crosses the JVM→Python
               boundary exactly once,
  3. probed  — the batch's bands against the STORED banded index through
               the shared `fp_near_dup_against_index` core (broadcast-semi
               key prune, capped buckets, JVM Hamming re-rank): emitted
               pairs touch at least one new clip,
  4. indexed — the batch's fingerprints + bands are appended to the
               stored index for every later batch to probe.

Because step 3 includes batch-internal pairs and every pair (a, b) is
discovered exactly once — in the micro-batch where its LATER member
arrives — the union of all emitted pairs over any partition of the corpus
into batches equals the one-shot `audio_near_dup` pair set exactly. That
makes the whole streaming pipeline oracle-checkable: the contract query
streams the corpus in file-batches and its accumulated output is
hash-compared against the same SQL as the batch path.

State layout (all per-micro-batch subdirectories keyed by batch id, so a
restarted/replayed batch OVERWRITES its own output — idempotent without a
ledger; Structured Streaming's checkpoint guarantees batch ids are stable
across restarts):

    {state_dir}/pairs/batch=N/       (id_a, id_b, sim)
    {state_dir}/quarantine/batch=N/  offending clip ids + which gate hit
    {state_dir}/fp/batch=N/          (id, frames) index deltas
    {state_dir}/banded/batch=N/      (id, band, key) index deltas
    {state_dir}/fp_base/gen=B/       compacted index thru batch B
    {state_dir}/banded_base/gen=B/   compacted bands, clustered by band
    {state_dir}/ckpt/                Structured Streaming checkpoint

Scale shape: per-batch work is batch-proportional (the index contributes
one pruned scan, never a re-band shuffle), and probe cost stays flat as
batches accumulate because `compact_audio_index` periodically folds the
per-batch deltas into a single generation (readers resolve newest
complete base + later deltas; `vacuum_audio_index` reclaims the folded
dirs) — without it, a long-lived stream pays per-file open cost on
thousands of tiny delta files.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CLIPS_SCHEMA = (
    "clip_id long, bytes binary, codec string, dur_ms int, sr_hz int"
)

# delta-dir state helpers now live in streaming/state.py (shared with the
# streaming constraint suite); the underscore aliases keep this module's
# call sites and the existing test imports unchanged
from pyanomalydetector2_spark.functions import local_rows_df  # noqa: E402
from pyanomalydetector2_spark.streaming.state import (  # noqa: E402
    batch_dirs as _batch_dirs,
    latest_gen as _latest_gen,
    read_state as _read_state,
    state_paths as _state_paths,
)


def process_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    threshold: float = 0.85,
    max_bucket_size: int | None = 10_000,
    dur_tol_ms: int = 50,
) -> None:
    """One micro-batch of the ingest: gate → quarantine split →
    fingerprint → probe the stored index → append to the index (module
    docstring steps 1–4). Module-level rather than a closure so tests can
    drive it directly — in particular the crash-replay contract: writes
    are ordered pairs → fp → banded into ``batch={batch_id}`` dirs, so a
    replay after ANY partial failure overwrites exactly its own output
    and the index can never contain a batch whose pairs were lost.

    The gate + decode + fingerprint run as ONE fused Arrow pass
    (``ingest_gate_fingerprints``): ``bytes`` dominates a clips batch,
    and composing the two operators would pull it across the JVM→Python
    boundary twice; the fused pass pulls it once and materializes only
    the small gate/fingerprint columns, off which the quarantine split
    and the index frames are plain filters.

    Set ``PYAD2_INGEST_TIMING=1`` to log per-phase wall times to stderr
    (gate+fp / quarantine / band / probe+pairs / index-append) — the
    observability that located the drain's scaling ceiling in the scan
    layout rather than the engine (see tools/ingest_scaling_bench.py)."""
    from pyanomalydetector2_spark.operators.audio_fp import (
        fp_banded,
        fp_near_dup_against_index,
        ingest_gate_fingerprints,
    )

    timing = os.environ.get("PYAD2_INGEST_TIMING")
    marks = [("start", time.time())]

    def _mark(label: str) -> None:
        marks.append((label, time.time()))

    from pyspark.sql import Observation

    sess = batch.sparkSession
    gated = ingest_gate_fingerprints(
        batch, dur_tol_ms=dur_tol_ms
    ).localCheckpoint()
    _mark("gate+fp")
    # ops counts ride the EXISTING jobs as observations (CollectMetrics is
    # a filter-pushdown barrier, so the pre-filter count sees every row):
    # zero extra Spark jobs per micro-batch — three extra fixed-cost jobs
    # here measured 13→30 s on the 4-batch sf0.1 drain (BENCH r05)
    quar_cond = (
        F.col("probe_failed") | F.col("dur_mismatch") | F.col("sr_mismatch")
    )
    obs_gate = Observation(f"ingest_gate_{batch_id}")
    gated.observe(
        obs_gate,
        F.count(F.lit(1)).alias("n_clips"),
        F.sum(quar_cond.cast("long")).alias("n_quarantined"),
    ).filter(quar_cond).select(
        F.col("id").alias("clip_id"),
        "codec",
        "container",
        "probe_failed",
        "dur_mismatch",
        "sr_mismatch",
    ).write.mode("overwrite").parquet(
        f"{state_dir}/quarantine/batch={batch_id}"
    )
    _mark("quarantine")
    fp_new = gated.filter(F.col("frames").isNotNull()).select("id", "frames")
    banded_new = fp_banded(fp_new).localCheckpoint()  # banded ONCE:
    # the probe and the index append share this materialization
    _mark("band")
    index_fp = _read_state(sess, state_dir, "fp", "id long, frames array<int>")
    index_banded = _read_state(
        sess, state_dir, "banded", "id long, band int, key int"
    )
    # prune strategy by MEASURED sizes (counts on the checkpointed batch
    # are cached-partition scans; the index count is a parquet
    # footer-stats job): while the index is not much bigger than the
    # batch (young stream, bulk backfill) the key prune discards almost
    # nothing and its distinct + semi join are pure overhead — skip it.
    # Once the index dwarfs the batch the prune is what keeps the bucket
    # aggregation batch-proportional; small batches then broadcast their
    # key set (index stays at one scan), large batches take the shuffled
    # semi (a large broadcast would serialize on the driver collect +
    # per-executor hashtable build).
    new_n = banded_new.count()
    index_n = index_banded.count()
    pairs = fp_near_dup_against_index(
        fp_new,
        index_fp,
        index_banded,
        threshold=threshold,
        max_bucket_size=max_bucket_size,
        banded_new=banded_new,
        broadcast_keys=new_n <= 1_000_000,
        prune=index_n > 4 * new_n,
    )
    obs_pairs = Observation(f"ingest_pairs_{batch_id}")
    pairs.observe(obs_pairs, F.count(F.lit(1)).alias("n_pairs")).write.mode(
        "overwrite"
    ).parquet(f"{state_dir}/pairs/batch={batch_id}")
    _mark("probe+pairs")
    # index the batch only AFTER its pairs landed: a crash between the
    # two writes replays the batch into the same batch= dirs, so the
    # index can never contain a batch whose pairs were lost
    fp_new.write.mode("overwrite").parquet(
        f"{state_dir}/fp/batch={batch_id}"
    )
    banded_new.write.mode("overwrite").parquet(
        f"{state_dir}/banded/batch={batch_id}"
    )
    _mark("index-append")
    # per-batch ops metrics row (VERDICT r04 #7): counts + phase walls +
    # start/finish stamps, durable next to the batch's other outputs so
    # ingest_summary can surface slow batches and quarantine-rate spikes.
    # Counts come from the observations above — already collected by the
    # quarantine and pairs write jobs, so this is pure driver arithmetic.
    gate_m = obs_gate.get
    n_clips = int(gate_m["n_clips"])
    n_quar = int(gate_m["n_quarantined"] or 0)
    n_pairs = int(obs_pairs.get["n_pairs"])
    _mark("obs-get")
    deltas = {
        label: round(t - marks[i][1], 4)
        for i, (label, t) in enumerate(marks[1:])
    }
    finished = time.time()
    # driver-side JSON sidecar (atomic tmp+rename, the suite_stream commit-
    # marker pattern): a one-row-per-batch ops record is DRIVER data — the
    # previous single-row parquet write was a full Spark job costing a
    # measured 4.2-4.5 s of fixed scheduling per micro-batch (the whole
    # 13→30 s sf0.1 drain regression, BENCH r05)
    import json as _json

    os.makedirs(f"{state_dir}/metrics", exist_ok=True)
    mpath = f"{state_dir}/metrics/batch={batch_id}.json"
    with open(f"{mpath}.tmp", "w") as fh:
        _json.dump(
            {
                "batch": int(batch_id),
                "n_clips": n_clips,
                "n_quarantined": n_quar,
                "n_pairs": n_pairs,
                "secs_gate_fp": deltas.get("gate+fp", 0.0),
                "secs_quarantine": deltas.get("quarantine", 0.0),
                "secs_band": deltas.get("band", 0.0),
                "secs_probe": deltas.get("probe+pairs", 0.0),
                "secs_index": deltas.get("index-append", 0.0),
                "secs_total": round(finished - marks[0][1], 4),
                "started_at": marks[0][1],
                "finished_at": finished,
            },
            fh,
        )
    os.replace(f"{mpath}.tmp", mpath)
    if timing:
        print(
            f"[ingest-timing] batch={batch_id} {deltas}",
            file=sys.stderr,
            flush=True,
        )


def ingest_audio_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    threshold: float = 0.85,
    max_bucket_size: int | None = 10_000,
    dur_tol_ms: int = 50,
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
    max_partition_bytes: str | None = None,
    compact_after: int | None = None,
) -> None:
    """Run the ingest over everything currently in ``source_dir``
    (Trigger.AvailableNow: drains the backlog in
    ``max_files_per_trigger``-file micro-batches, then stops — the same
    cron-batch-to-streaming upgrade shape as ``streaming_rollup``).
    Re-invoking after new files arrive continues from the checkpoint:
    already-processed files are not re-ingested.

    ``compact_after``: once the drain stops, if at least that many index
    delta batches sit beyond the newest compacted generation, fold them
    (`compact_audio_index`) and reclaim the folded dirs
    (`vacuum_audio_index`) — post-drain is exactly when no reader is
    mid-query, so the maintenance is safe by construction."""

    def process(batch: DataFrame, batch_id: int) -> None:
        process_batch(
            batch,
            batch_id,
            state_dir,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
            dur_tol_ms=dur_tol_ms,
        )

    # micro-batches are orders of magnitude smaller than a full corpus
    # scan; sizing the shuffle to the BATCH (not the session default) is
    # the knob that keeps per-batch fixed cost flat — values are
    # partitioning-invariant, so this is perf-only
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # the gate+fingerprint stage is decode-CPU-bound, not IO-bound: the
    # default 128m split sizes tasks for scan throughput and leaves a
    # 4-core executor 2 waves deep on a 533 MB file. ~32m splits give
    # seconds-long decode tasks — small enough to balance, large enough
    # that per-task overhead is noise. Splits cannot cross parquet
    # row-group boundaries, so the producer side must cooperate: write
    # the backlog with parquet.block.size at (or below) this value or the
    # knob is a no-op (a 128 MB row group is one task no matter what).
    if max_partition_bytes is not None:
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", max_partition_bytes
        )
    try:
        q = (
            spark.readStream.schema(CLIPS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", f"{state_dir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if compact_after is not None:
            base = _latest_gen(f"{state_dir}/banded_base")
            folded_thru = base[0] if base else -1
            n_deltas = sum(
                1 for n, _ in _batch_dirs(f"{state_dir}/banded")
                if n > folded_thru
            )
            if n_deltas >= compact_after:
                compact_audio_index(spark, state_dir)
                vacuum_audio_index(state_dir)
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if max_partition_bytes is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", prev_mpb)


PAIRS_SCHEMA = "id_a long, id_b long, sim double"
METRICS_SCHEMA = (
    "batch int, n_clips long, n_quarantined long, n_pairs long, "
    "secs_gate_fp double, secs_quarantine double, secs_band double, "
    "secs_probe double, secs_index double, secs_total double, "
    "started_at double, finished_at double"
)
METRICS_FIELDS = [
    f.strip().split(" ")[0] for f in METRICS_SCHEMA.split(",")
]


def _metric_rows(state_dir: str) -> list[dict]:
    """Per-batch ops-metric dicts from the JSON sidecars, batch order."""
    mdir = f"{state_dir}/metrics"
    if not os.path.isdir(mdir):
        return []
    import json as _json

    rows = []
    for f in sorted(os.listdir(mdir)):
        if f.startswith("batch=") and f.endswith(".json"):
            with open(f"{mdir}/{f}") as fh:
                rows.append(_json.load(fh))
    return sorted(rows, key=lambda r: r["batch"])


QUARANTINE_SCHEMA = (
    "clip_id long, codec string, container string, probe_failed boolean, "
    "dur_mismatch boolean, sr_mismatch boolean"
)


def ingested_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """All near-dup pairs emitted so far, across every micro-batch. Equal
    to the one-shot ``audio_near_dup`` pair set over the ingested corpus
    (see module docstring for why no cross-batch dedup is needed).
    Empty-with-the-right-schema before the first batch lands (an empty
    ``spark.read.parquet(*[])`` is a TypeError, not an empty frame)."""
    dirs = [d for _, d in _batch_dirs(f"{state_dir}/pairs")]
    if not dirs:
        return spark.createDataFrame([], PAIRS_SCHEMA)
    # schema pinned: a pair-free batch's delta can plan to zero part files
    # under AQE (dir holds only _SUCCESS), which an inferring read cannot
    # handle (UNABLE_TO_INFER_SCHEMA)
    return spark.read.schema(PAIRS_SCHEMA).parquet(*dirs)


def quarantined(spark: SparkSession, state_dir: str) -> DataFrame:
    """All quarantined clips so far, with the gate(s) each one hit.
    Empty-with-the-right-schema before the first batch lands."""
    dirs = [d for _, d in _batch_dirs(f"{state_dir}/quarantine")]
    if not dirs:
        return spark.createDataFrame([], QUARANTINE_SCHEMA)
    return spark.read.schema(QUARANTINE_SCHEMA).parquet(*dirs)


SUMMARY_SCHEMA = (
    "batch int, n_pairs long, n_quarantined long, "
    "n_probe_failed long, n_dur_mismatch long, n_sr_mismatch long, "
    "n_clips long, quarantine_rate double, secs_total double, "
    "secs_gate_fp double, secs_probe double, queue_lag_secs double"
)


def ingest_summary(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-micro-batch observability: pair and quarantine counts (broken
    out by which gate fired) plus the ops columns a production drain
    watches (VERDICT r04 #7) — per-batch wall time by phase, quarantine
    rate, and queue lag (gap between this batch starting and the previous
    batch finishing: a growing value means arrival outpaces the drain —
    the backpressure signal). Built on the permanent per-batch outputs
    (``pairs``/``quarantine``/``metrics`` survive index compaction), with
    the directory name as a discovered ``batch`` partition column, so one
    partition-pruned scan per side. Batches with no activity on a side
    report 0, driven off the directory spine; metrics columns are NULL
    for batches ingested by pre-metrics versions of this module.
    Empty-with-the-right-schema before the first batch lands."""
    batches = _batch_dirs(f"{state_dir}/pairs")
    if not batches:
        return spark.createDataFrame([], SUMMARY_SCHEMA)
    spine = local_rows_df(spark, [(n,) for n, _ in batches], "batch int")
    # schemas pinned (with the discovered batch partition column included)
    # so all-empty batch dirs cannot break schema inference
    pairs = (
        spark.read.schema(f"{PAIRS_SCHEMA}, batch int")
        .parquet(f"{state_dir}/pairs")
        .groupBy("batch")
        .agg(F.count("*").alias("n_pairs"))
    )
    quar = (
        spark.read.schema(f"{QUARANTINE_SCHEMA}, batch int")
        .parquet(f"{state_dir}/quarantine")
        .groupBy("batch")
        .agg(
            F.count("*").alias("n_quarantined"),
            F.sum(F.col("probe_failed").cast("long")).alias("n_probe_failed"),
            F.sum(F.col("dur_mismatch").cast("long")).alias("n_dur_mismatch"),
            F.sum(F.col("sr_mismatch").cast("long")).alias("n_sr_mismatch"),
        )
    )
    out = spine.join(pairs, "batch", "left").join(quar, "batch", "left")
    out = out.select(
        "batch",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in (
                "n_pairs",
                "n_quarantined",
                "n_probe_failed",
                "n_dur_mismatch",
                "n_sr_mismatch",
            )
        ],
    )
    mrows = _metric_rows(state_dir)
    if mrows:
        m = local_rows_df(
            spark,
            [tuple(r.get(f) for f in METRICS_FIELDS) for r in mrows],
            METRICS_SCHEMA,
        ).select(
            "batch", "n_clips", "secs_total", "secs_gate_fp",
            "secs_probe", "started_at", "finished_at",
        )
        out = out.join(m, "batch", "left")
    else:
        out = out.select(
            "*",
            *[
                F.lit(None).cast("double").alias(c)
                for c in (
                    "n_clips", "secs_total", "secs_gate_fp",
                    "secs_probe", "started_at", "finished_at",
                )
            ],
        ).withColumn("n_clips", F.col("n_clips").cast("long"))
    w = Window.orderBy("batch")
    return out.select(
        "batch", "n_pairs", "n_quarantined", "n_probe_failed",
        "n_dur_mismatch", "n_sr_mismatch", "n_clips",
        F.round(
            F.try_divide(F.col("n_quarantined"), F.col("n_clips")), 6
        ).alias("quarantine_rate"),
        "secs_total", "secs_gate_fp", "secs_probe",
        F.round(
            F.col("started_at") - F.lag("finished_at").over(w), 4
        ).alias("queue_lag_secs"),
    )


def ingest_alarms(
    spark: SparkSession,
    state_dir: str,
    max_quarantine_rate: float = 0.05,
    max_batch_secs: float | None = None,
) -> dict:
    """Threshold alarms over the ingest summary — the reference's alarm
    funnel (reporter.py:7-46: aggregate distributed, assemble the tiny
    nested dict on the driver) re-expressed for the stream. A batch alarms
    when its quarantine RATE breaches ``max_quarantine_rate`` (a corrupt
    upstream shard shows up as a rate spike long before absolute counts
    look scary) or, when ``max_batch_secs`` is set, when its wall breaches
    it (a stuck decoder / hot bucket). Returns
    {"batch_N": {"quarantine_rate": …, "secs_total": …, "reasons": […]}}
    for breaching batches only — O(breaches), collected off O(batches)."""
    s = ingest_summary(spark, state_dir)
    conds = F.col("quarantine_rate") > max_quarantine_rate
    if max_batch_secs is not None:
        conds = conds | (F.col("secs_total") > max_batch_secs)
    rows = s.filter(conds).collect()
    report: dict = {}
    for r in sorted(rows, key=lambda x: x["batch"]):
        reasons = []
        if (
            r["quarantine_rate"] is not None
            and r["quarantine_rate"] > max_quarantine_rate
        ):
            reasons.append("quarantine_rate")
        if (
            max_batch_secs is not None
            and r["secs_total"] is not None
            and r["secs_total"] > max_batch_secs
        ):
            reasons.append("slow_batch")
        report[f"batch_{r['batch']}"] = {
            "quarantine_rate": r["quarantine_rate"],
            "n_quarantined": r["n_quarantined"],
            "n_clips": r["n_clips"],
            "secs_total": r["secs_total"],
            "reasons": reasons,
        }
    return report


def compact_audio_index(spark: SparkSession, state_dir: str) -> int:
    """Fold the per-batch index deltas into one compacted generation —
    the maintenance job that keeps probe cost flat as batches accumulate.

    Each micro-batch appends a tiny ``fp/batch=N`` + ``banded/batch=N``
    directory; after thousands of batches the probe's index scan pays a
    per-file open cost that dwarfs the data (the classic streaming
    small-files problem). This job reads the CURRENT resolved state
    (previous base + deltas) and rewrites it as ``{comp}_base/gen=B``
    where B is the newest batch with its ``banded`` delta on disk — the
    last batch whose writes all completed, since ``process`` writes
    pairs → fp → banded in that order. The banded base is repartitioned
    by band so each band's keys cluster into few files (the same layout
    the batch incremental index uses).

    Crash-safe and read-consistent without coordination: readers only
    trust a gen with ``_SUCCESS`` and keep reading deltas > its id, so a
    torn compaction changes nothing, and a completed one is adopted
    atomically. Run it OFFLINE (between ``ingest_audio_stream``
    invocations — the stream itself reads state only at batch start).

    Only deltas with batch id <= folded_thru are folded — NOT the full
    resolved state. The distinction matters exactly when a batch crashed
    between its fp and banded writes (the ordering ``process_batch``
    deliberately uses): that batch's orphan ``fp/batch=N+1`` delta sits
    on disk with no banded sibling, folded_thru (keyed on the newest
    *banded* delta) is N, and folding the orphan into gen=N would make
    the replayed ``fp/batch=N+1`` rewrite a DUPLICATE of rows already in
    the base — duplicate (id, frames) rows duplicate every re-rank pair
    and break the streaming-equals-batch hash contract (ADVICE r04).
    Bounding the fold at folded_thru leaves the orphan as a plain
    unfolded delta that the replay simply overwrites.

    Deltas stay on disk until ``vacuum_audio_index``. Returns the
    folded-thru batch id, or -1 if there is nothing to fold."""
    banded = _batch_dirs(f"{state_dir}/banded")
    if not banded:
        return -1
    folded_thru = banded[-1][0]
    bases = [_latest_gen(f"{state_dir}/{c}_base") for c in ("fp", "banded")]
    if all(b is not None and b[0] >= folded_thru for b in bases):
        return folded_thru  # both components already at this generation
    fp_schema = "id long, frames array<int>"
    banded_schema = "id long, band int, key int"
    # materialize BEFORE overwriting: the new gen may need to re-read the
    # old one, and dynamic overwrite of the dir being read is undefined
    fp = _read_state(
        spark, state_dir, "fp", fp_schema, thru=folded_thru
    ).localCheckpoint()
    bd = _read_state(
        spark, state_dir, "banded", banded_schema, thru=folded_thru
    ).localCheckpoint()
    fp.write.mode("overwrite").parquet(f"{state_dir}/fp_base/gen={folded_thru}")
    bd.repartition("band").write.mode("overwrite").parquet(
        f"{state_dir}/banded_base/gen={folded_thru}"
    )
    return folded_thru


def vacuum_audio_index(state_dir: str) -> list[str]:
    """Delete index deltas folded into the newest complete generation of
    BOTH components, plus superseded older generations. Pure directory
    surgery — safe any time no reader is mid-query, because readers
    resolve against the newest complete gen, which survives. Returns the
    deleted paths."""
    import shutil

    gens = [_latest_gen(f"{state_dir}/{c}_base") for c in ("fp", "banded")]
    if any(g is None for g in gens):
        return []
    folded_thru = min(g[0] for g in gens)  # only what BOTH bases cover
    doomed = []
    for comp in ("fp", "banded"):
        doomed += [
            d for n, d in _batch_dirs(f"{state_dir}/{comp}") if n <= folded_thru
        ]
        base_dir = f"{state_dir}/{comp}_base"
        doomed += [
            f"{base_dir}/{f}"
            for f in os.listdir(base_dir)
            if f.startswith("gen=") and int(f.split("=", 1)[1]) < folded_thru
        ]
    for d in doomed:
        shutil.rmtree(d)
    return doomed
