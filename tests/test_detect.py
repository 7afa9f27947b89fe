"""Three-stage detection funnel on planted anomalies (reference test pattern
1: pipeline on a frozen fixture, assert survivors — tests/test_detector_*)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyanomalydetector2_spark.operators.detect import (
    DetectParams,
    detect1,
    detect2,
    detect3,
)
from pyanomalydetector2_spark.operators.stats import moment_stats


@pytest.fixture(scope="module")
def fixture(spark):
    """20 items with flat-noise trends; items 1 and 2 get a planted level
    shift in the recent window; item 3 gets a mild (sub-threshold) shift."""
    rng = np.random.default_rng(123)
    trend_rows, hist_rows = [], []
    t0 = 1_700_000_000
    for item in range(1, 21):
        base = 100.0 + item
        for k in range(14 * 24):  # 14 days of hourly trend points
            trend_rows.append(
                (item, t0 + k * 3600, float(base + rng.normal(0, 1.0)))
            )
        hist_start = t0 + 14 * 24 * 3600
        shift = 30.0 if item in (1, 2) else (1.0 if item == 3 else 0.0)
        for k in range(18):  # 3h of 600s samples
            hist_rows.append(
                (item, hist_start + k * 600, float(base + shift + rng.normal(0, 1.0)))
            )
    trends = spark.createDataFrame(
        pd.DataFrame(trend_rows, columns=["itemid", "clock", "value"])
    )
    history = spark.createDataFrame(
        pd.DataFrame(hist_rows, columns=["itemid", "clock", "value"])
    )
    tstats = moment_stats(trends, ["itemid"]).cache()
    return history, trends, tstats


def test_detect1_screens_planted_items(fixture):
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect1(history, tstats).collect()}
    assert ids == {1, 2}


def test_detect2_confirms_jumps(fixture):
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect2(history, trends).collect()}
    assert {1, 2} <= ids
    assert 4 not in ids


def test_detect3_sustained_and_peak(fixture):
    history, trends, tstats = fixture
    ids = {r.itemid for r in detect3(history, tstats, trends).collect()}
    assert ids == {1, 2}


def test_funnel_composes(fixture):
    """Driver-side early-exit funnel (reference detect_anomalies.py:79-96):
    each stage only sees prior survivors."""
    history, trends, tstats = fixture
    s1 = detect1(history, tstats)
    h2 = history.join(s1, "itemid", "left_semi")
    s2 = detect2(h2, trends.join(s1, "itemid", "left_semi"))
    h3 = history.join(s2, "itemid", "left_semi")
    s3 = detect3(h3, tstats, trends.join(s2, "itemid", "left_semi"))
    assert {r.itemid for r in s3.collect()} == {1, 2}
