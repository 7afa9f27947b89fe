"""Classifier (two-level DBSCAN), reporter, streaming rollup, and
hypothesis property tests for the moment algebra."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.classify import (
    classify_charts,
    collect_charts,
)
from pyanomalydetector2_spark.reporter import build_report


def test_classify_charts_two_level():
    """Reference test_dbscan pattern: planted chart families cluster
    together, a lone outlier is noise."""
    rng = np.random.default_rng(3)
    t = np.arange(48, dtype=float)
    spike = np.zeros(48)
    spike[20:24] = 10.0
    charts = {}
    for i in range(4):  # family A: same spike shape + tiny noise
        charts[100 + i] = spike + rng.normal(0, 0.05, 48)
    ramp = np.linspace(0, 10, 48)
    for i in range(3):  # family B: ramps
        charts[200 + i] = ramp + rng.normal(0, 0.05, 48)
    charts[999] = rng.normal(0, 1, 48)  # noise item

    labels = classify_charts(charts, sigma=1.5)
    fam_a = {labels[100 + i] for i in range(4)}
    fam_b = {labels[200 + i] for i in range(3)}
    assert len(fam_a) == 1 and -1 not in fam_a
    assert len(fam_b) == 1 and -1 not in fam_b
    assert fam_a != fam_b
    assert labels[999] == -1


def test_collect_charts(spark):
    df = spark.createDataFrame(
        [(1, 30, 3.0), (1, 10, 1.0), (1, 20, 2.0), (2, 10, 9.0)],
        "itemid long, clock long, value double",
    )
    charts = collect_charts(df)
    np.testing.assert_array_equal(charts[1], [1.0, 2.0, 3.0])  # clock-ordered
    np.testing.assert_array_equal(charts[2], [9.0])


def test_build_report_alarms_on_multi_host_clusters(spark):
    rows = [
        # cluster 0 spans two hosts -> alarms
        (1, 100, "grp/a", 1, 0, "h1", "item1", 0.0, 1.0),
        (2, 100, "grp/a", 2, 0, "h2", "item2", 0.0, 1.0),
        (3, 100, "grp/a", 2, 0, "h2", "item3", 0.0, 1.0),  # same host, dropped by A15
        # cluster 1 is single-host -> silent
        (4, 100, "grp/b", 3, 1, "h3", "item4", 0.0, 1.0),
        # noise
        (5, 100, "grp/b", 4, -1, "h4", "item5", 0.0, 1.0),
        # older epoch ignored (O4)
        (6, 50, "grp/a", 5, 0, "h5", "item6", 0.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "itemid long, created long, group_name string, hostid int, clusterid int,"
        " host_name string, item_name string, trend_mean double, trend_std double",
    )
    rep = build_report(df)
    assert list(rep) == ["cluster_0"]
    hosts = rep["cluster_0"]["grp/a"]
    assert set(hosts) == {"h1", "h2"}
    assert [i["itemid"] for i in hosts["h2"]] == [2]  # first per (cluster,host)


def test_streaming_rollup_matches_batch(spark, tmp_path):
    from pyanomalydetector2_spark.streaming.rollup import (
        run_to_memory_sink,
        streaming_rollup,
    )

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "itemid": rng.integers(1, 5, 500),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_007_200, 500), unit="s"
            ),
            "value": rng.normal(10, 2, 500),
        }
    )
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf).write.parquet(src)

    rolled = streaming_rollup(spark, src, window="1 hour", watermark="2 hours")
    run_to_memory_sink(rolled, "t_rollup")
    got = (
        spark.table("t_rollup")
        .toPandas()
        .set_index(["itemid", "window_start"])
        .sort_index()
    )

    pdf["window_start"] = pdf.ts.dt.floor("h")
    exp = pdf.groupby(["itemid", "window_start"])["value"].agg(
        ["count", "mean", "std", "min", "max"]
    )
    assert len(got) == len(exp)
    np.testing.assert_allclose(got["cnt"], exp["count"])
    np.testing.assert_allclose(got["mean"], exp["mean"], rtol=1e-9)
    np.testing.assert_allclose(got["std"], exp["std"].fillna(0.0), rtol=1e-6)
    spark.sql("DROP TABLE IF EXISTS t_rollup")


# ---------------------------------------------------------- property tests --
@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
    st.lists(st.floats(-1e6, 1e6), min_size=1, max_size=40),
)
def test_moment_merge_associative_commutative(xs, ys):
    """The (sum, sqr_sum, cnt) algebra merges associatively/commutatively —
    the property Catalyst's partial aggregation relies on."""

    def triple(v):
        a = np.array(v, dtype=np.float64)
        return (a.sum(), (a * a).sum(), len(a))

    def merge(p, q):
        return (p[0] + q[0], p[1] + q[1], p[2] + q[2])

    whole = triple(xs + ys)
    merged = merge(triple(xs), triple(ys))
    merged_rev = merge(triple(ys), triple(xs))
    assert merged[2] == whole[2] == merged_rev[2]
    np.testing.assert_allclose(merged[0], whole[0], rtol=1e-9, atol=1e-6)
    np.testing.assert_allclose(merged[0], merged_rev[0], rtol=1e-12)
    np.testing.assert_allclose(merged[1], whole[1], rtol=1e-9, atol=1e-6)


@settings(max_examples=20, deadline=None)
@given(st.integers(0, 10_000), st.integers(2, 50))
def test_datagen_batch_split_invariance(start, width):
    """clips rows are a pure function of the id — any batch split yields
    identical rows (the resume/determinism guarantee)."""
    from pyanomalydetector2_spark.datagen.clips import _gen_batch

    ids = np.arange(start, start + width, dtype=np.int64)
    whole = _gen_batch(ids, True)
    cut = width // 2
    parts = pd.concat(
        [_gen_batch(ids[:cut], True), _gen_batch(ids[cut:], True)],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(
        whole.reset_index(drop=True), parts.reset_index(drop=True)
    )
