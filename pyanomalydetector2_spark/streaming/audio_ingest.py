"""Structured Streaming audio ingest — continuous near-dup detection
against a growing fingerprint index, with container-consistency
quarantine at the door.

The batch-side audio operators (`operators.audio_fp`,
`operators.multimodal`) compose here into the shape a training-data lake
actually runs: clips ARRIVE (file-source stream), each micro-batch is

  1. gated   — declared-vs-container consistency check
               (`with_consistency_fields`); rows whose container walk
               fails or whose declared metadata contradicts the header go
               to a quarantine table, never into the index,
  2. hashed  — decode + spectral fingerprint, one Arrow pass
               (`audio_fingerprints`),
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
    {state_dir}/fp/batch=N/          (id, frames)
    {state_dir}/banded/batch=N/      (id, band, key)
    {state_dir}/ckpt/                Structured Streaming checkpoint

Scale shape: per-batch work is batch-proportional (the index contributes
one pruned scan, never a re-band shuffle); the index grows as appended
parquet, compactable offline by rewriting {state_dir}/banded partitioned
by band (the layout `__spark_entry__.q_audio_near_dup_incremental` uses).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CLIPS_SCHEMA = (
    "clip_id long, bytes binary, codec string, dur_ms int, sr_hz int"
)


def _batch_dirs(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(
        f"{path}/{f}" for f in os.listdir(path) if f.startswith("batch=")
    )


def _read_state(spark: SparkSession, path: str, schema) -> DataFrame:
    """Read an append-state directory, or an empty frame of the right
    schema before the first batch lands. Concrete directory list, not a
    glob: a glob path makes every read re-probe for a streaming-sink
    metadata dir (a logged FileNotFound per read)."""
    dirs = _batch_dirs(path)
    if dirs:
        return spark.read.parquet(*dirs)
    return spark.createDataFrame([], schema)


def ingest_audio_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    threshold: float = 0.85,
    max_bucket_size: int | None = 10_000,
    dur_tol_ms: int = 50,
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
) -> None:
    """Run the ingest over everything currently in ``source_dir``
    (Trigger.AvailableNow: drains the backlog in
    ``max_files_per_trigger``-file micro-batches, then stops — the same
    cron-batch-to-streaming upgrade shape as ``streaming_rollup``).
    Re-invoking after new files arrive continues from the checkpoint:
    already-processed files are not re-ingested."""
    from pyanomalydetector2_spark.operators.audio_fp import (
        audio_fingerprints,
        fp_banded,
        fp_near_dup_against_index,
    )
    from pyanomalydetector2_spark.operators.multimodal import (
        with_consistency_fields,
    )

    fp_schema = "id long, frames array<int>"
    banded_schema = "id long, band int, key int"

    def process(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        # persist, not localCheckpoint: both consumers (quarantine split)
        # reuse the materialized gate lazily without the extra eager job —
        # micro-batches are small enough that per-job overhead dominates
        gated = with_consistency_fields(batch, dur_tol_ms=dur_tol_ms).persist()
        bad = gated.filter(
            ~F.col("container_probe_ok")
            | ~F.col("container_dur_ok")
            | ~F.col("container_sr_ok")
        )
        bad.select(
            "clip_id",
            "codec",
            "container",
            (~F.col("container_probe_ok")).alias("probe_failed"),
            (~F.col("container_dur_ok")).alias("dur_mismatch"),
            (~F.col("container_sr_ok")).alias("sr_mismatch"),
        ).write.mode("overwrite").parquet(
            f"{state_dir}/quarantine/batch={batch_id}"
        )
        ok = gated.filter(
            F.col("container_probe_ok")
            & F.col("container_dur_ok")
            & F.col("container_sr_ok")
        ).select("clip_id", "bytes", "codec")

        fp_new = audio_fingerprints(ok, id_col="clip_id").localCheckpoint()
        index_fp = _read_state(sess, f"{state_dir}/fp", fp_schema)
        index_banded = _read_state(sess, f"{state_dir}/banded", banded_schema)
        pairs = fp_near_dup_against_index(
            fp_new,
            index_fp,
            index_banded,
            threshold=threshold,
            max_bucket_size=max_bucket_size,
        )
        pairs.write.mode("overwrite").parquet(
            f"{state_dir}/pairs/batch={batch_id}"
        )
        # index the batch only AFTER its pairs landed: a crash between the
        # two writes replays the batch into the same batch= dirs, so the
        # index can never contain a batch whose pairs were lost
        fp_new.write.mode("overwrite").parquet(
            f"{state_dir}/fp/batch={batch_id}"
        )
        fp_banded(fp_new).write.mode("overwrite").parquet(
            f"{state_dir}/banded/batch={batch_id}"
        )

    # micro-batches are orders of magnitude smaller than a full corpus
    # scan; sizing the shuffle to the BATCH (not the session default) is
    # the knob that keeps per-batch fixed cost flat — values are
    # partitioning-invariant, so this is perf-only
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
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
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def ingested_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """All near-dup pairs emitted so far, across every micro-batch. Equal
    to the one-shot ``audio_near_dup`` pair set over the ingested corpus
    (see module docstring for why no cross-batch dedup is needed)."""
    return spark.read.parquet(*_batch_dirs(f"{state_dir}/pairs"))


def quarantined(spark: SparkSession, state_dir: str) -> DataFrame:
    """All quarantined clips so far, with the gate(s) each one hit."""
    return spark.read.parquet(*_batch_dirs(f"{state_dir}/quarantine"))
