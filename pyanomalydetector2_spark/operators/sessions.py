"""Gap-based sessionization — the event-stream rollup a training-data
pipeline runs before any per-session feature extraction.

The reference's analog is its per-item group loops (detector.py:290-298
iterates each item's sorted series in Python); here the whole table
sessionizes in two window expressions over ONE shuffle on the key:

  1. ``lag(ts)`` per key → a boolean "gap exceeded" marker, and
  2. a running ``sum`` of that marker → the session ordinal.

Both windows share the same (partitionBy key, orderBy ts) spec, so Catalyst
plans a single exchange + per-partition sort; the session aggregate then
reuses that partitioning (groupBy on a superset key avoids a second wide
shuffle under AQE's partial aggregation).

Timestamps compare as exact integer microseconds (``unix_micros``) so the
session boundaries are engine-exact against the DuckDB ``epoch_us`` oracle
— no float-seconds rounding at the gap threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _ts_us(df: DataFrame, ts_col: str):
    # NTZ diffs against an NTZ epoch literal: tz-independent naive-as-UTC
    # integer micros, exactly DuckDB's epoch_us convention
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(ts_col))
    return F.col(ts_col).cast("long")


def sessionize(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    gap_us: int = 21_600_000_000,
    order_cols: Sequence[str] = (),
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign a per-key session ordinal (1-based): a new session starts at
    the first event and whenever the gap to the previous event exceeds
    ``gap_us`` microseconds. ``order_cols`` break ts ties deterministically.
    """
    keys = [key] if isinstance(key, str) else list(key)
    us = "__ts_us"
    w = Window.partitionBy(*keys).orderBy(us, *order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_us = df.withColumn(us, _ts_us(df, ts_col))
    is_new = (
        F.coalesce(
            (F.col(us) - F.lag(us).over(w)) > F.lit(gap_us), F.lit(True)
        )
    ).cast("long")
    return (
        with_us.withColumn(out_col, F.sum(is_new).over(run)).drop(us)
    )


def session_stats(
    df: DataFrame,
    key: str | Sequence[str] = "user_id",
    ts_col: str = "ts",
    gap_us: int = 21_600_000_000,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-session rollup: start/end (integer micros — exact), event count,
    duration. One shuffle total: the groupBy key extends the window key, so
    AQE keeps the aggregate on the sessionize exchange."""
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, keys, ts_col, gap_us, order_cols)
    us = _ts_us(s, ts_col)
    return (
        s.withColumn("__ts_us", us)
        .groupBy(*keys, "session_seq")
        .agg(
            F.min("__ts_us").alias("start_us"),
            F.max("__ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max("__ts_us") - F.min("__ts_us")).alias("dur_us"),
        )
    )
