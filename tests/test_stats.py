"""Moment-stats algebra vs an independent pandas oracle (the reference's own
test pattern: tests/test_trends_stats.py:31-57 recomputes from source and
assertAlmostEqual's)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyanomalydetector2_spark.operators.stats import (
    column_profile,
    merge_moments,
    moment_stats,
    subtract_moments,
)


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(42)
    n = 5000
    pdf = pd.DataFrame(
        {
            "itemid": rng.integers(1, 50, n),
            "clock": rng.integers(1_700_000_000, 1_700_100_000, n),
            "value": rng.normal(10, 3, n).round(4),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_moment_stats_matches_pandas(series_df):
    df, pdf = series_df
    got = moment_stats(df, ["itemid"]).toPandas().set_index("itemid").sort_index()
    exp = pdf.groupby("itemid")["value"].agg(["sum", "count", "mean", "std"])
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["sum"], exp["sum"], rtol=1e-9)
    np.testing.assert_allclose(got["cnt"], exp["count"])
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(got["std"], exp["std"], rtol=1e-6)


def test_single_sample_and_constant_series_std_zero(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 3.0), (2, 11, 3.0)], "itemid int, clock int, value double"
    )
    got = moment_stats(df, ["itemid"]).toPandas().set_index("itemid")
    assert got.loc[1, "std"] == 0.0  # cnt=1 → Bessel div-by-zero → cleaned to 0
    assert got.loc[2, "std"] == 0.0  # zero variance


def test_merge_then_subtract_roundtrip(series_df, spark):
    """Incremental maintenance algebra (reference stats.py:88-124): stats of
    window A merged with window B, then B subtracted, equals stats of A."""
    df, pdf = series_df
    cut = 1_700_050_000
    a = moment_stats(df.filter(f"clock < {cut}"), ["itemid"])
    b = moment_stats(df.filter(f"clock >= {cut}"), ["itemid"])
    merged = merge_moments(a, b, ["itemid"])
    full = moment_stats(df, ["itemid"]).toPandas().set_index("itemid").sort_index()
    m = merged.toPandas().set_index("itemid").sort_index()
    np.testing.assert_allclose(m["mean"], full["mean"], rtol=1e-9)
    np.testing.assert_allclose(m["std"], full["std"], rtol=1e-6)

    back = subtract_moments(merged, b, ["itemid"]).toPandas().set_index("itemid").sort_index()
    ap = a.toPandas().set_index("itemid").sort_index()
    assert list(back.index) == list(ap.index)
    np.testing.assert_allclose(back["mean"], ap["mean"], rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(back["std"], ap["std"], rtol=1e-5, atol=1e-7)


def test_column_profile(spark):
    pdf = pd.DataFrame(
        {
            "part": ["a"] * 50 + ["b"] * 50,
            "x": list(range(50)) + [None] * 10 + list(range(40)),
            "y": [1.5] * 100,
        }
    )
    df = spark.createDataFrame(pdf)
    prof = (
        column_profile(df, ["x", "y"], group_cols=["part"])
        .toPandas()
        .set_index(["part", "column"])
        .sort_index()
    )
    assert prof.loc[("b", "x"), "null_cnt"] == 10
    assert prof.loc[("b", "x"), "null_rate"] == pytest.approx(0.2)
    assert prof.loc[("a", "x"), "min"] == 0
    assert prof.loc[("a", "x"), "max"] == 49
    assert prof.loc[("a", "x"), "mean"] == pytest.approx(24.5)
    assert prof.loc[("a", "y"), "std"] == 0.0
    exp_std = pd.Series(range(50), dtype=float).std()
    assert prof.loc[("a", "x"), "std"] == pytest.approx(exp_std)
    q = prof.loc[("a", "x"), "quantiles"]
    assert len(q) == 3 and q[0] <= q[1] <= q[2]


def test_freshness_lag_and_fail_closed_nulls(spark):
    from pyanomalydetector2_spark.operators.stats import freshness

    df = spark.createDataFrame(
        [
            ("a", "2024-01-30 23:59:59.500000"),
            ("a", "2024-01-30 22:00:00"),
            ("b", "2024-01-30 12:00:00"),
            ("c", None),
            ("c", None),
        ],
        "g string, ts_s string",
    ).selectExpr("g", "to_timestamp_ntz(ts_s) AS ts")
    got = {
        r["g"]: r
        for r in freshness(
            df, "ts", "2024-01-31 00:00:00", ["g"], max_lag_s=3600
        ).collect()
    }
    assert got["a"].lag_us == 500_000 and got["a"].fresh  # 0.5 s
    assert got["b"].lag_us == 12 * 3600 * 1_000_000 and not got["b"].fresh
    # all-NULL group: no evidence of freshness is not freshness
    assert got["c"].max_ts is None and got["c"].lag_us is None
    assert got["c"].fresh is False
    assert got["c"].n_rows == 2

    # ungrouped: one global row, no 'fresh' column without a threshold
    glob = freshness(df, "ts", "2024-01-31 00:00:00").collect()
    assert len(glob) == 1 and glob[0].lag_us == 500_000
    assert "fresh" not in glob[0].asDict()
