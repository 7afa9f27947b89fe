"""Deterministic hash sampling: stability across plans, fraction accuracy,
stratified thresholds, and disjoint/exhaustive train-val splits."""

from __future__ import annotations

import pytest

from pyanomalydetector2_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    train_split,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).selectExpr(
        "id AS key", "CASE WHEN id % 10 < 7 THEN 'big' ELSE 'small' END AS stratum"
    )


def test_uniform_fraction_and_stability(spark, ids):
    s1 = {r["key"] for r in hash_sample(ids, "key", 0.3).collect()}
    # re-run with a different physical layout — identical membership
    s2 = {r["key"] for r in hash_sample(ids.repartition(13), "key", 0.3).collect()}
    assert s1 == s2
    assert abs(len(s1) / 20_000 - 0.3) < 0.02  # md5 uniformity
    # nested property: a 10% sample is a subset of the 30% sample
    s3 = {r["key"] for r in hash_sample(ids, "key", 0.1).collect()}
    assert s3 <= s1


def test_stratified_fractions(spark, ids):
    out = stratified_hash_sample(ids, "key", "stratum", {"big": 0.1, "small": 0.9})
    counts = {r["stratum"]: r["count"] for r in out.groupBy("stratum").count().collect()}
    assert abs(counts["big"] / 14_000 - 0.1) < 0.02
    assert abs(counts["small"] / 6_000 - 0.9) < 0.02
    # strata without a fraction are dropped entirely
    only_big = stratified_hash_sample(ids, "key", "stratum", {"big": 0.5})
    assert only_big.filter("stratum = 'small'").isEmpty()


def test_train_split_disjoint_exhaustive(spark, ids):
    out = train_split(ids, "key", 0.8)
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["train"] + counts["val"] == 20_000
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    # split assignment is independent of the sampling salt: sampling first
    # then splitting assigns the same split a full-data split would
    full = {r["key"]: r["split"] for r in out.collect()}
    sampled = train_split(hash_sample(ids, "key", 0.3), "key", 0.8)
    for r in sampled.collect():
        assert full[r["key"]] == r["split"]


def test_group_quota_cap_and_stability(spark, ids):
    """Every group emits exactly min(cap, group size) rows; the surviving
    key set is identical under a different input partitioning (plan
    stability); ranks are 1..n dense per group; and the draw is a subset
    of the same draw with a larger cap (monotone in cap)."""
    from pyanomalydetector2_spark.operators.sampling import (
        group_quota_sample,
    )

    out = group_quota_sample(ids, "key", ["stratum"], cap=50)
    rows = out.collect()
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["stratum"], []).append(r["quota_rank"])
    assert set(by_g) == {"big", "small"}
    for g, ranks in by_g.items():
        assert sorted(ranks) == list(range(1, 51))

    keys = {r["key"] for r in rows}
    reshuffled = group_quota_sample(
        ids.repartition(7, "key"), "key", ["stratum"], cap=50
    )
    assert {r["key"] for r in reshuffled.collect()} == keys

    bigger = group_quota_sample(ids, "key", ["stratum"], cap=80)
    assert keys <= {r["key"] for r in bigger.collect()}

    # a group smaller than the cap survives whole
    tiny = ids.filter("key < 5")
    assert group_quota_sample(tiny, "key", ["stratum"], cap=50).count() == 5
