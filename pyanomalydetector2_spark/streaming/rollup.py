"""Structured Streaming rollup — the streaming form of the history→trends
tumbling aggregation (A9, reference logan_getter.py:249-263; the reference
itself is cron-batch, SURVEY §2.9 — this is the engine's streaming upgrade
path for continuously-arriving clips/series).

readStream(file source) → watermark → tumbling-window moment aggregation →
sink. The aggregate is the same mergeable (sum, sqr_sum, cnt) triple as the
batch path, so batch and streaming rollups agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.stats import finalize_moments


def streaming_rollup(
    spark: SparkSession,
    input_dir: str,
    schema: str = "itemid long, ts timestamp, value double",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-(item, window) moment stats. The watermark is the
    formalization of the reference's 'end = now - 600' late-data guard band
    (scripts/run_hourly_detection.sh:16-18)."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy("itemid", F.window("ts", window).alias("w"))
        .agg(
            F.sum("value").alias("sum"),
            F.sum(F.col("value") * F.col("value")).alias("sqr_sum"),
            F.count("value").alias("cnt"),
            F.min("value").alias("value_min"),
            F.avg("value").alias("value_avg"),
            F.max("value").alias("value_max"),
        )
    )
    # ONE closed-form implementation: finalize_moments is the same function
    # the batch path uses, so "batch and streaming rollups agree exactly"
    # holds by construction instead of by keeping two copies in sync
    return finalize_moments(agg).select(
        "itemid",
        F.col("w.start").alias("window_start"),
        "cnt",
        "value_min",
        "value_avg",
        "value_max",
        "mean",
        "std",
    )


def run_to_memory_sink(rolled: DataFrame, name: str = "rollup") -> None:
    """Drive the stream to completion against a memory sink (test harness:
    availableNow processes all existing files then stops).

    Complete mode: with a single availableNow batch, append mode would hold
    every window back until a LATER batch advances the watermark past it —
    complete emits the final state of all windows. Production sinks on a
    continuous stream use append + the watermark to finalize windows."""
    q = (
        rolled.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
