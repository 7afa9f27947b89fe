"""Three-stage detection funnel on planted anomalies (reference test pattern
1: pipeline on a frozen fixture, assert survivors — tests/test_detector_*).

Fixture plants (all deterministic):
- items 1, 2: level shift +30 starting at recent sample 3 (15/18 samples
  shifted) — caught by detect1 (mean deviation), detect2 (in-window jump
  from the first sample), and detect3 phase 1 (support 15/18 > 0.8);
- item 3: shift +30 only in the last 6 samples — fails phase-1 support
  (6/18) but is rescued by detect3 phase 2 on the recent sub-window;
- item 4+: flat noise — must never survive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyanomalydetector2_spark.operators.detect import (
    DetectParams,
    detect1,
    detect2,
    detect3,
    detect3_phase2,
)
from pyanomalydetector2_spark.operators.stats import moment_stats

T0 = 1_700_000_000
HIST_START = T0 + 14 * 24 * 3600
PHASE2_START = HIST_START + 12 * 600  # last 6 of the 18 recent samples


@pytest.fixture(scope="module")
def fixture(spark):
    rng = np.random.default_rng(123)
    trend_rows, hist_rows = [], []
    for item in range(1, 21):
        base = 100.0 + item
        # 14 days of hourly trend points; trend-to-trend movement (σ=3) is
        # coarser than history noise (σ=1) as in real rollups — the jump
        # threshold λ2·dstd ≈ 8.5 clears noise maxima (~3) but not the
        # planted +30 shifts
        for k in range(14 * 24):
            v = float(base + rng.normal(0, 3.0))
            trend_rows.append((item, T0 + k * 3600, v - 0.5, v, v + 0.5))
        for k in range(18):  # 3h of 600s samples
            if item in (1, 2):
                shift = 30.0 if k >= 3 else 0.0
            elif item == 3:
                shift = 30.0 if k >= 12 else 0.0
            else:
                shift = 0.0
            hist_rows.append(
                (item, HIST_START + k * 600, float(base + shift + rng.normal(0, 1.0)))
            )
    trends = spark.createDataFrame(
        pd.DataFrame(
            trend_rows,
            columns=["itemid", "clock", "value_min", "value", "value_max"],
        )
    )
    history = spark.createDataFrame(
        pd.DataFrame(hist_rows, columns=["itemid", "clock", "value"])
    )
    tstats = moment_stats(trends, ["itemid"]).cache()
    return history, trends, tstats


def test_detect1_screens_planted_items(fixture):
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect1(history, tstats).collect()}
    # item 3's relative change (10/103) is inside ignore_diff_rate=0.2 —
    # detect1 drops it by design; detect3 phase 2 is its path
    assert ids == {1, 2}


def test_detect2_confirms_in_window_jumps(fixture):
    """The jump baseline is the FIRST recent sample: items whose shift
    starts inside the window jump; flat items don't."""
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect2(history, trends).collect()}
    assert {1, 2, 3} <= ids
    assert not ids & set(range(4, 21))


def test_detect2_pre_window_shift_is_not_a_jump(spark):
    """A level shift that happened BEFORE the recent window is detect1's
    job, not detect2's: max - first stays within trend movement."""
    rng = np.random.default_rng(7)
    trends = spark.createDataFrame(
        pd.DataFrame(
            [(1, T0 + k * 3600, 100.0 + float(rng.normal(0, 3.0))) for k in range(200)],
            columns=["itemid", "clock", "value"],
        )
    )
    history = spark.createDataFrame(
        pd.DataFrame(
            [(1, HIST_START + k * 600, 130.0 + float(rng.normal(0, 1.0))) for k in range(18)],
            columns=["itemid", "clock", "value"],
        )
    )
    assert detect2(history, trends).isEmpty()


def test_detect3_sustained_and_peak(fixture):
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect3(history, trends).collect()}
    assert ids == {1, 2}  # item 3's support is 6/18 < 0.8 — phase 2's job


def test_detect3_expected_count_denominator(fixture):
    """Reference detector.py:512-513: the support rate divides by the
    base-clock grid size. With an inflated expected count nothing passes."""
    history, trends, tstats = fixture
    assert detect3(history, trends, expected_count=100).isEmpty()
    ids = {r.itemid for r in detect3(history, trends, expected_count=18).collect()}
    assert ids == {1, 2}


def test_detect3_phase2_rescues_recent_burst(fixture):
    history, trends, tstats = fixture
    phase1 = detect3(history, trends).cache()
    out = detect3_phase2(
        history,
        trends,
        phase1,
        recent_startep=PHASE2_START,
        expected_count=6,
    )
    assert {r.itemid for r in out.collect()} == {1, 2, 3}


def test_funnel_composes(fixture):
    """Driver-side early-exit funnel (reference detect_anomalies.py:79-96):
    each stage only sees prior survivors."""
    history, trends, tstats = fixture
    s1 = detect1(history, tstats)
    h2 = history.join(s1, "itemid", "left_semi")
    s2 = detect2(h2, trends.join(s1, "itemid", "left_semi"))
    h3 = history.join(s2, "itemid", "left_semi")
    s3 = detect3(h3, trends.join(s2, "itemid", "left_semi"))
    assert {r.itemid for r in s3.collect()} == {1, 2}
