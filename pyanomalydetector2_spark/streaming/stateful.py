"""Custom stateful streaming operator: per-item running moment stats via
``applyInPandasWithState`` — the Structured Streaming form of the
reference's incremental stats maintenance (data_processing/stats.py:88-124
add-the-new-slice path; the subtract path disappears because streaming
state is cumulative-forward by construction).

State per item = the same mergeable (sum, sqr_sum, cnt) triple as the batch
algebra (operators/stats.py), so the streaming stats agree exactly with a
batch recompute over everything ingested so far — pinned by
tests/test_stateful_stream.py across checkpoint-restored runs.

Arrow-batched: the kernel sees pandas frames per (item, micro-batch), numpy
reduces them; no per-row Python.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "sum double, sqr_sum double, cnt long"
OUTPUT_SCHEMA = (
    "itemid long, sum double, sqr_sum double, cnt long, mean double, std double"
)


def _update_moments(key, pdfs, state: GroupState):
    s, sq, n = state.get if state.exists else (0.0, 0.0, 0)
    for pdf in pdfs:
        # drop nulls BEFORE accumulating — pandas null → NaN under a raw
        # float64 view, and one NaN would poison the running sums forever;
        # the batch algebra (F.sum/F.count) skips nulls, and the streaming
        # state must agree with a batch recompute exactly
        col = pdf["value"]
        v = col[col.notna()].to_numpy(dtype="float64")
        s += float(v.sum())
        sq += float((v * v).sum())
        n += int(len(v))
    state.update((s, sq, n))
    mean = s / n if n else 0.0
    var = (sq - s * s / n) / (n - 1) if n > 1 else 0.0
    yield pd.DataFrame(
        {
            "itemid": [key[0]],
            "sum": [s],
            "sqr_sum": [sq],
            "cnt": [n],
            "mean": [mean],
            "std": [math.sqrt(max(var, 0.0))],
        }
    )


def streaming_moment_state(
    spark: SparkSession,
    input_dir: str,
    schema: str = "itemid long, clock long, value double",
) -> DataFrame:
    """readStream(file source) → per-item cumulative moment stats with
    explicit state. Each micro-batch emits the UPDATED stats for items that
    received data (update output mode)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    return src.groupBy("itemid").applyInPandasWithState(
        _update_moments,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_increment(stats: DataFrame, checkpoint_dir: str, output_dir: str) -> None:
    """Process all currently-available files then stop (availableNow), with
    durable state under ``checkpoint_dir`` — a later call resumes from the
    persisted state exactly like the reference's watermark-driven
    incremental reruns (models/updates.py:10-28).

    Sink = foreachBatch writing each micro-batch to a batch_id-derived
    subdirectory with overwrite (the memory sink cannot recover from a
    checkpoint). Keying the path on batch_id makes a replay after a
    crash-between-commit-and-checkpoint IDEMPOTENT — the retried batch
    overwrites its own output instead of appending duplicates; in
    production the batch function is a MERGE into the stats snapshot."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{output_dir}/batch_id={batch_id}"
        )

    q = (
        stats.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
