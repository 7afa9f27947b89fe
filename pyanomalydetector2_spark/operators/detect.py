"""The reference's three-stage anomaly screen re-expressed as lazy DataFrame
plans (SURVEY.md §3.1; /root/reference/data_processing/detector.py).

The reference runs 100-item Python batches through pandas; here each stage is
ONE declarative plan over all items — Catalyst partitions the work, and the
stage funnel (cheap screen → expensive confirm, early-exit on empty) survives
as driver control flow exactly as the reference's detect_anomalies.py:79-96.

Stage semantics (thresholds from /root/reference/default.yml:87-93):
- detect1 (detector.py:150-215): |mean_recent - mean_trend| > λ1·std_trend,
  with ignore_diff_rate and min-count guards.
- detect2 (detector.py:262-345): adjacent-peak jump screen — recent extremes
  vs the distribution of trend diffs.
- detect3 (detector.py:395-474): sustained deviation (share of recent samples
  beyond λ·std ≥ valid_count_rate) + local-peak confirmation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.stats import moment_stats
from pyanomalydetector2_spark.operators.windows import adjacent_diff, local_peak


@dataclass(frozen=True)
class DetectParams:
    """Knobs mirroring /root/reference/default.yml:87-93."""

    lambda1: float = 3.0
    lambda2: float = 2.0
    lambda3_1: float = 1.0
    lambda3_2: float = 2.0
    ignore_diff_rate: float = 0.2
    anomaly_valid_count_rate: float = 0.8
    trends_min_count: int = 3


def detect1(
    history: DataFrame,
    trends_stats: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
) -> DataFrame:
    """Stage-1 z-score screen (reference detector.py:150-215).

    ``history`` = recent raw samples (itemid, clock, value);
    ``trends_stats`` = per-item long-window moments (itemid, mean, std, cnt).
    Returns surviving item ids. Both sides are per-item aggregates — tiny
    relative to the raw data — so the join is broadcast-able (J1).

    The reference has an operator-precedence bug at detector.py:212 ('>'
    binds before '&'); we implement the documented INTENT: drop items whose
    relative change is within ignore_diff_rate.
    """
    recent = history.groupBy(key).agg(F.avg("value").alias("mean_h"))
    t = trends_stats.select(
        key,
        F.col("mean").alias("mean_t"),
        F.col("std").alias("std_t"),
        F.col("cnt").alias("cnt_t"),
    )
    j = recent.join(t, key)
    dev = F.abs(F.col("mean_h") - F.col("mean_t"))
    return (
        j.filter(F.col("cnt_t") > params.trends_min_count)
        .filter(F.col("std_t") > 0)
        .filter(dev > params.lambda1 * F.col("std_t"))
        .filter(
            F.when(
                F.col("mean_t") != 0,
                dev / F.abs(F.col("mean_t")) > params.ignore_diff_rate,
            ).otherwise(F.lit(True))
        )
        .select(key)
    )


def detect2(
    history: DataFrame,
    trends: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
) -> DataFrame:
    """Stage-2 jump screen (reference detector.py:262-345).

    Recent min/max per item vs the mean±λ2·std of the trend's adjacent-value
    diffs: an item survives if its recent extreme jumped further from the
    last trend value than typical trend-to-trend movement (up or down,
    reference detector.py:329-345 unions both directions).
    """
    recent = history.groupBy(key).agg(
        F.max("value").alias("max_h"), F.min("value").alias("min_h")
    )
    diffs = adjacent_diff(trends, key=key, order="clock", value="value")
    dstats = moment_stats(diffs, [key], "diff").select(
        key, F.col("mean").alias("dmean"), F.col("std").alias("dstd")
    )
    last_trend = trends.groupBy(key).agg(
        F.max_by("value", "clock").alias("last_t")
    )
    j = recent.join(dstats, key).join(last_trend, key)
    # relative-change guard in both directions (reference detector.py:314,321)
    up = (
        (F.col("max_h") - F.col("last_t"))
        > (F.col("dmean") + params.lambda2 * F.col("dstd"))
    ) & (
        F.coalesce(
            F.try_divide(
                F.abs(F.col("max_h") - F.col("last_t")), F.abs(F.col("last_t"))
            ),
            F.lit(float("inf")),
        )
        > params.ignore_diff_rate
    )
    dn = (
        (F.col("min_h") - F.col("last_t"))
        < (F.col("dmean") - params.lambda2 * F.col("dstd"))
    ) & (
        F.coalesce(
            F.try_divide(
                F.abs(F.col("min_h") - F.col("last_t")), F.abs(F.col("last_t"))
            ),
            F.lit(float("inf")),
        )
        > params.ignore_diff_rate
    )
    return j.filter(F.col("dstd") > 0).filter(up | dn).select(key)


def detect3(
    history: DataFrame,
    trends_stats: DataFrame,
    trends: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
    peak_window_secs: int = 3600,
) -> DataFrame:
    """Stage-3 sustained-deviation + local-peak confirmation (reference
    detector.py:395-474).

    (a) support: share of recent samples beyond mean±λ3_1·std of the trend
        must be ≥ anomaly_valid_count_rate (detector.py:409-417);
    (b) peak: the recent mean must exceed the trend's local-peak window mean
        (up) or undercut its local trough (down) (detector.py:450-474).
    """
    t = trends_stats.select(
        key, F.col("mean").alias("mean_t"), F.col("std").alias("std_t")
    )
    h = history.join(t, key)
    beyond = (
        F.abs(F.col("value") - F.col("mean_t"))
        > params.lambda3_1 * F.col("std_t")
    ).cast("int")
    support = (
        h.filter(F.col("std_t") > 0)
        .groupBy(key)
        .agg(
            F.avg(beyond).alias("anom_rate"),
            F.avg("value").alias("mean_h"),
        )
        .filter(F.col("anom_rate") >= params.anomaly_valid_count_rate)
    )
    peaks = local_peak(trends, peak_window_secs, key=key)
    j = support.join(peaks, key)
    return j.filter(
        (F.col("mean_h") > F.col("peak_up")) | (F.col("mean_h") < F.col("peak_dn"))
    ).select(key)


def detect3_phase2(
    history: DataFrame,
    trends_stats: DataFrame,
    phase1_survivors: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
    recent_count: int = 6,
) -> DataFrame:
    """Stage-3 phase 2 (reference detector.py:519-546): items that FAILED
    phase 1 get a second chance on the recent sub-window (last
    ``recent_count`` samples per item, reference history_recent_count
    default.yml:36) with the stricter λ3_2 threshold.

    Returns the union of phase-1 survivors and phase-2 rescues — the
    reference's list(set(itemIds + itemIds2)) at detector.py:544-546.
    """
    from pyspark.sql import Window

    failed = history.join(phase1_survivors, key, "left_anti")
    w = Window.partitionBy(key).orderBy(F.col("clock").desc())
    recent = (
        failed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= recent_count)
        .drop("_rn")
    )
    t = trends_stats.select(
        key, F.col("mean").alias("mean_t"), F.col("std").alias("std_t")
    )
    rescued = (
        recent.groupBy(key)
        .agg(F.avg("value").alias("mean_r"))
        .join(t, key)
        .filter(F.col("std_t") > 0)
        .filter(
            F.abs(F.col("mean_r") - F.col("mean_t"))
            > params.lambda3_2 * F.col("std_t")
        )
        .select(key)
    )
    return phase1_survivors.select(key).union(rescued).distinct()
