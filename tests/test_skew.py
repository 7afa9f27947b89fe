"""Salted two-phase aggregation: identical results to plain groupBy on a
deliberately skewed key distribution (north_rule skew handling)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyanomalydetector2_spark.operators.skew import salted_count, salted_moment_stats
from pyanomalydetector2_spark.operators.stats import moment_stats


def _skewed(spark):
    rng = np.random.default_rng(4)
    # one hot key holding 90% of rows + a long tail
    hot = pd.DataFrame(
        {"key": "HOT", "value": rng.normal(5, 2, 18000).round(4)}
    )
    tail = pd.DataFrame(
        {
            "key": [f"k{i}" for i in rng.integers(0, 500, 2000)],
            "value": rng.normal(1, 1, 2000).round(4),
        }
    )
    return spark.createDataFrame(pd.concat([hot, tail], ignore_index=True))


def test_salted_count_matches_plain(spark):
    df = _skewed(spark)
    got = {r["key"]: r["cnt"] for r in salted_count(df, ["key"]).collect()}
    exp = {r["key"]: r["count"] for r in df.groupBy("key").count().collect()}
    assert got == exp
    assert got["HOT"] == 18000


def test_salted_moments_match_plain(spark):
    df = _skewed(spark)
    got = (
        salted_moment_stats(df, ["key"]).toPandas().set_index("key").sort_index()
    )
    exp = moment_stats(df, ["key"]).toPandas().set_index("key").sort_index()
    assert (got["cnt"] == exp["cnt"]).all()
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(got["std"], exp["std"], rtol=1e-7)
