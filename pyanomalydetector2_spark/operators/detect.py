"""The reference's three-stage anomaly screen re-expressed as lazy DataFrame
plans (SURVEY.md §3.1; /root/reference/data_processing/detector.py).

The reference runs 100-item Python batches through pandas; here each stage is
ONE declarative plan over all items — Catalyst partitions the work, and the
stage funnel (cheap screen → expensive confirm, early-exit on empty) survives
as driver control flow exactly as the reference's detect_anomalies.py:79-96.

Stage semantics (thresholds from /root/reference/default.yml:87-93):
- detect1 (detector.py:150-215): |mean_recent - mean_trend| > λ1·std_trend,
  with ignore_diff_rate and min-count guards.
- detect2 (detector.py:275-349): jump screen — the recent window's extremes
  RELATIVE TO ITS FIRST SAMPLE (max−first / min−first, detector.py:334-339)
  vs the distribution of adjacent diffs of the trend's value_max (up side) /
  value_min (down side) series; two-sided |jump − dmean| > λ2·dstd.
- detect3 (detector.py:380-547): sustained deviation (anomalous-sample count
  over the EXPECTED sample count ≥ rate) + local-peak confirmation, per
  side over the value_max / value_min trend series; phase 2 re-tests
  phase-1 failures on the recent sub-window (clock ≥ startep2) with λ3_2.

Documented redefinitions vs the reference (COVERAGE.md "Semantics deltas"):
relative-change guards divide by the ABSOLUTE baseline (the reference divides
by the signed dmean, detector.py:314,321 — items with negative mean trend
movement could never pass); window order specs carry value tiebreaks so
results are deterministic under clock ties (the reference inherits input
order from a stable sort).
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
    # recent sub-window length for the detect3 phase-2 rescue, in history
    # intervals (reference default.yml history_recent_retention;
    # detector.py:531 startep2 = endep − interval·retention)
    history_recent_retention: int = 6


def _side_col(trends: DataFrame, preferred: str) -> str:
    """Reference detect2/detect3 run the up side on value_max and the down
    side on value_min (detector.py:281-285, 496-499); a single-series trends
    frame falls back to 'value' for both."""
    return preferred if preferred in trends.columns else "value"


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
    """Stage-2 jump screen (reference detector.py:275-349, semantics aligned
    r02 per ADVICE):

    - recent jump baseline = the FIRST history sample (detector.py:334-339):
      max_diff = max(h) − first(h), min_diff = min(h) − first(h);
    - trend movement distribution per side: adjacent nonzero diffs of the
      value_max (up) / value_min (down) series → (dmean, dstd);
    - two-sided test |jump − dmean| > λ2·dstd (detector.py:311-313,318-320)
      with the relative guard |jump − dmean| / |dmean| > ignore_diff_rate;
    - survivors = up ∪ down (detector.py:345-347).

    The first sample is selected by min_by over (clock, value) — clock ties
    resolve deterministically (redefinition; see module docstring).
    """
    first = F.min_by("value", F.struct("clock", "value"))
    recent = history.groupBy(key).agg(
        (F.max("value") - first).alias("max_diff"),
        (F.min("value") - first).alias("min_diff"),
    )

    def side(series_col: str, jump_col: str) -> DataFrame:
        series = trends.select(key, "clock", F.col(series_col).alias("value"))
        d = adjacent_diff(series, key=key)
        ds = moment_stats(d, [key], "diff").select(
            key, F.col("mean").alias("dmean"), F.col("std").alias("dstd")
        )
        dev = F.abs(F.col(jump_col) - F.col("dmean"))
        return (
            recent.join(ds, key)
            .filter(F.col("dstd") > 0)
            .filter(dev > params.lambda2 * F.col("dstd"))
            .filter(
                F.coalesce(
                    F.try_divide(dev, F.abs(F.col("dmean"))), F.lit(float("inf"))
                )
                > params.ignore_diff_rate
            )
            .select(key)
        )

    up = side(_side_col(trends, "value_max"), "max_diff")
    dn = side(_side_col(trends, "value_min"), "min_diff")
    return up.union(dn).distinct()


def _detect3_side(
    history: DataFrame,
    trends: DataFrame,
    params: DetectParams,
    lam: float,
    key: str,
    expected_count: int | None,
    peak_window_secs: int,
    is_up: bool,
) -> DataFrame:
    """One direction of the detect3 sustained-deviation + local-peak test
    (reference _filter_anomal_history, detector.py:452-480):

    (a) support: count of history samples beyond mean ± λ·std of the trend
        side-series, divided by the EXPECTED sample count (the base-clock
        grid size, detector.py:512-513) when given — items with missing
        samples are screened against the full grid, not just what arrived;
        falls back to the observed count when expected_count is None;
    (b) peak: the recent mean must exceed the trend's local-peak window mean
        (up) / undercut its local trough (down), detector.py:425-446,474-480.
    """
    series_col = _side_col(trends, "value_max" if is_up else "value_min")
    series = trends.select(key, "clock", F.col(series_col).alias("value"))
    st = moment_stats(series, [key]).select(key, "mean", "std")
    h = history.join(st, key).filter(F.col("std") > 0)
    beyond = (
        F.col("value") > F.col("mean") + lam * F.col("std")
        if is_up
        else F.col("value") < F.col("mean") - lam * F.col("std")
    )
    agg = h.groupBy(key).agg(
        F.sum(beyond.cast("int")).alias("anom_cnt"),
        F.count("value").alias("obs_cnt"),
        F.avg("value").alias("mean_h"),
    )
    # `is not None`: an explicit expected_count of 0 (empty recent grid)
    # must make the support test unpassable, not fall back to obs_cnt
    denom = F.lit(expected_count) if expected_count is not None else F.col("obs_cnt")
    support = agg.filter(
        F.try_divide(F.col("anom_cnt"), denom)
        > params.anomaly_valid_count_rate
    )
    peaks = local_peak(series, peak_window_secs, key=key)
    j = support.join(peaks, key)
    cmp = (
        F.col("mean_h") > F.col("peak_up")
        if is_up
        else F.col("mean_h") < F.col("peak_dn")
    )
    return j.filter(cmp).select(key)


def detect3(
    history: DataFrame,
    trends: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
    expected_count: int | None = None,
    peak_window_secs: int = 3600,
) -> DataFrame:
    """Stage-3 sustained-deviation + local-peak confirmation, phase 1
    (reference _detect3_batch, detector.py:485-521): up over the value_max
    trend series, down over value_min, union of survivors.

    ``expected_count`` = the base-clock grid size len(base_clocks)
    (detector.py:512-513) — the support denominator counts EXPECTED samples
    so items with gaps are screened consistently; None → observed count.
    """
    up = _detect3_side(
        history, trends, params, params.lambda3_1, key, expected_count,
        peak_window_secs, True,
    )
    dn = _detect3_side(
        history, trends, params, params.lambda3_1, key, expected_count,
        peak_window_secs, False,
    )
    return up.union(dn).distinct()


def detect3_phase2(
    history: DataFrame,
    trends: DataFrame,
    phase1_survivors: DataFrame,
    params: DetectParams = DetectParams(),
    key: str = "itemid",
    recent_startep: int | None = None,
    expected_count: int | None = None,
    peak_window_secs: int = 3600,
) -> DataFrame:
    """Stage-3 phase 2 (reference detector.py:524-547): items that FAILED
    phase 1 are re-tested on the recent sub-window (clock ≥ startep2 =
    endep − history_interval·history_recent_retention) with the stricter
    λ3_2 threshold and the recent grid's expected count (base_clocks2,
    detector.py:531-533).

    Returns the union of phase-1 survivors and phase-2 rescues — the
    reference's list(set(itemIds1 + itemIds2)) at detector.py:543-546.

    DELIBERATE REDEFINITION (ADVICE r02 #3): when the recent sub-window has
    no history rows at all, the reference's _detect3_batch
    (detector.py:538-540) returns ALL input itemIds — an empty screen
    passes everything through. Here an empty recent window rescues
    NOTHING (only phase-1 survivors remain): promoting every item on
    missing data inverts the screen's purpose and looks like a reference
    bug, so it is not replicated.
    """
    failed = history.join(phase1_survivors, key, "left_anti")
    if recent_startep is not None:
        failed = failed.filter(F.col("clock") >= recent_startep)
    up = _detect3_side(
        failed, trends, params, params.lambda3_2, key, expected_count,
        peak_window_secs, True,
    )
    dn = _detect3_side(
        failed, trends, params, params.lambda3_2, key, expected_count,
        peak_window_secs, False,
    )
    return phase1_survivors.select(key).union(up).union(dn).distinct()
