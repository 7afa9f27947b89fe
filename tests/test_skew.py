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


def test_suite_salted_uniqueness_identical_on_hot_key(spark):
    """north_rule skew handling wired into the runner: a clips table where
    ONE clip_id holds 90% of rows produces IDENTICAL verdicts + violations
    with and without salting (the salt only changes the physical plan)."""
    import pandas as pd

    from pyanomalydetector2_spark.constraints import default_clips_suite, run_suite
    from pyanomalydetector2_spark.datagen.clips import (
        clips_table,
        dim_codec,
        dim_sr,
    )

    base = clips_table(spark, 400, planted=False, n_buckets=4)
    normal = clips_table(spark, 400, planted=False, n_buckets=4).limit(40)
    hot_pdf = normal.limit(1).toPandas()  # keeps the datagen bucket, so
    # duplicates co-locate exactly as a real ingest bug would
    hot = spark.createDataFrame(pd.concat([hot_pdf] * 360, ignore_index=True))
    cur = normal.unionByName(hot.select(normal.columns)).cache()
    dims = {"dim_codec": dim_codec(spark), "dim_sr": dim_sr(spark)}
    suite = default_clips_suite()

    plain = run_suite(cur, base, dims, suite, "run-plain")
    salted = run_suite(cur, base, dims, suite, "run-salted", salt_buckets=16)

    def verdicts(res):
        return sorted(
            (r["bucket"], r["constraint_id"], r["metric"], r["observed"], r["passed"])
            for r in res.verdicts.collect()
        )

    def violations(res):
        return sorted(
            (r["bucket"], r["clip_id"], r["constraint_id"], r["observed"])
            for r in res.violations.collect()
        )

    assert verdicts(plain) == verdicts(salted)
    assert violations(plain) == violations(salted)
    # the hot key was actually flagged: 361 rows share one clip_id
    dup = [
        r
        for r in salted.violations.collect()
        if r["constraint_id"] == "clip_id_unique"
    ]
    assert len(dup) == 361


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


def test_hot_key_share_datagen_knob(spark):
    """The skew-bench input knob: hot_key_share makes a deterministic
    hash-chosen share of rows full copies of clip 0 — one degenerate
    clip_id AND one degenerate bucket — identically in Spark and in the
    pandas oracle path, and the share lands near the nominal value."""
    import numpy as np

    from pyanomalydetector2_spark.datagen.clips import (
        _gen_batch,
        clips_table,
        u01,
    )

    n = 4000
    df = clips_table(spark, n, planted=False, n_buckets=8, hot_key_share=0.5)
    pdf = df.select("clip_id", "bucket").toPandas()
    hot_mask = u01(np.arange(n, dtype=np.int64), 90) < 0.5
    n_hot = int(hot_mask.sum())
    assert abs(n_hot / n - 0.5) < 0.05  # hash-uniform share
    counts = pdf["clip_id"].value_counts()
    # clip 0's row id is itself outside the hot mask or not — either way
    # the hot rows all collapse onto clip-000000000000
    assert counts["clip-" + "0" * 12] in (n_hot, n_hot + 1)
    # all hot rows share clip 0's bucket (bucket = crc32(clip_id) % B)
    hot_bucket = pdf.loc[pdf["clip_id"] == "clip-" + "0" * 12, "bucket"]
    assert hot_bucket.nunique() == 1
    # pandas-oracle parity (same code path, but pin it anyway)
    o = _gen_batch(np.arange(n, dtype=np.int64), False, hot_key_share=0.5)
    assert (o["clip_id"] == "clip-" + "0" * 12).sum() == counts["clip-" + "0" * 12]
