"""End-to-end SeriesPipeline tests — incremental stats maintenance against a
full-recompute oracle across successive loads (reference
tests/test_trends_stats.py:31-92 pattern) and the detection funnel with
planted anomalies + metadata enrichment."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyanomalydetector2_spark.operators.detect import DetectParams
from pyanomalydetector2_spark.operators.stats import moment_stats
from pyanomalydetector2_spark.pipeline import SeriesPipeline
from pyspark.sql import functions as F

T0 = 1_700_000_000
INTERVAL = 3600
RETENTION = 24  # 24h sliding window


def gen_trends(spark, n_items: int, upto_ep: int, sigma: float = 1.0):
    rng = np.random.default_rng(5)
    rows = []
    for item in range(1, n_items + 1):
        base = 50.0 + item
        k = T0
        while k <= upto_ep:
            rows.append((item, k, float(base + rng.normal(0, sigma))))
            k += INTERVAL
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["itemid", "clock", "value"])
    )


def test_incremental_stats_match_full_recompute(spark, tmp_path):
    p = SeriesPipeline(
        str(tmp_path), trends_interval=INTERVAL, trends_retention=RETENTION
    )
    end1 = T0 + 40 * INTERVAL
    trends1 = gen_trends(spark, 10, end1)
    s1 = p.update_trends_stats(trends1, end1)

    def oracle(trends, endep):
        lo = endep - INTERVAL * RETENTION
        return (
            moment_stats(
                trends.filter((F.col("clock") > lo) & (F.col("clock") <= endep)),
                ["itemid"],
            )
            .toPandas()
            .set_index("itemid")
            .sort_index()
        )

    got1 = s1.toPandas().set_index("itemid").sort_index()
    exp1 = oracle(trends1, end1)
    np.testing.assert_allclose(got1["mean"], exp1["mean"], rtol=1e-9)
    np.testing.assert_allclose(got1["std"], exp1["std"], rtol=1e-6)

    # second incremental load: 6 more hours of data (delta + expiry path)
    end2 = end1 + 6 * INTERVAL
    trends2 = gen_trends(spark, 10, end2)
    s2 = p.update_trends_stats(trends2, end2)
    got2 = s2.toPandas().set_index("itemid").sort_index()
    exp2 = oracle(trends2, end2)
    np.testing.assert_allclose(got2["cnt"], exp2["cnt"])
    np.testing.assert_allclose(got2["mean"], exp2["mean"], rtol=1e-9)
    np.testing.assert_allclose(got2["std"], exp2["std"], rtol=1e-6)
    assert p.watermark.get_endep() == end2

    # third load after a LONG gap → truncate-and-rebuild path
    end3 = end2 + 10 * INTERVAL
    trends3 = gen_trends(spark, 10, end3)
    s3 = p.update_trends_stats(trends3, end3)
    got3 = s3.toPandas().set_index("itemid").sort_index()
    exp3 = oracle(trends3, end3)
    np.testing.assert_allclose(got3["mean"], exp3["mean"], rtol=1e-9)
    np.testing.assert_allclose(got3["std"], exp3["std"], rtol=1e-6)


def test_detect_funnel_with_enrichment(spark, tmp_path):
    rng = np.random.default_rng(6)
    p = SeriesPipeline(
        str(tmp_path),
        trends_interval=INTERVAL,
        trends_retention=14 * 24,
        params=DetectParams(),
    )
    endep = T0 + 14 * 24 * INTERVAL
    # trend movement (σ=3) coarser than history noise (σ=1): detect2's jump
    # threshold λ2·dstd clears noise but not the planted shift
    trends = gen_trends(spark, 15, endep, sigma=3.0)
    p.update_trends_stats(trends, endep)

    hist_rows = []
    for item in range(1, 16):
        base = 50.0 + item
        for k in range(18):
            # the shift starts INSIDE the recent window (k ≥ 2): detect2's
            # jump baseline is the window's first sample; k ≥ 2 keeps the
            # detect3 support rate above 0.8 on BOTH the raw series (16/18)
            # and the base-clock-regularized one (15/18 — the trailing
            # sample buckets past the exclusive grid end, see W3 docs)
            shift = 25.0 if item in (2, 5) and k >= 2 else 0.0
            # item 9: a burst confined to the RECENT sub-window (6 of 18
            # samples) — passes detect1/detect2 (mean dev 60·6/18 = 20 >
            # λ1·σ_t = 9; jump ≈ 60 ≫ λ2·dstd) but fails detect3 phase 1's
            # full-window support (6/18 < 0.8); the phase-2 rescue re-tests
            # the recent grid (forward-fill shifts samples one grid point
            # later, so k ≥ 12 puts the burst on all 5 recent grid points)
            if item == 9 and k >= 12:
                shift = 60.0
            hist_rows.append(
                (item, endep + k * 600, float(base + shift + rng.normal(0, 1.0)))
            )
    history = spark.createDataFrame(
        pd.DataFrame(hist_rows, columns=["itemid", "clock", "value"])
    )
    items_dim = spark.createDataFrame(
        [(i, f"host{i % 3}", f"item{i}", "grp") for i in range(1, 16)],
        "itemid long, host_name string, item_name string, group_name string",
    )
    out = p.detect(history, trends, items_dim, endep=endep + 18 * 600)
    rows = {r["itemid"]: r for r in out.collect()}
    assert set(rows) == {2, 5}
    assert rows[2]["host_name"] == "host2"
    assert rows[2]["trend_std"] > 0

    # idempotent re-run (MERGE semantics): same keys, no duplicates
    out2 = p.detect(history, trends, items_dim, endep=endep + 18 * 600)
    assert out2.count() == 2

    # regularized funnel (reference update_history, detector.py:113-146):
    # survivors' history snaps to the base-clock grid, detect3 divides by
    # the expected grid size, AND the phase-2 rescue runs (reference
    # detector.py:524-547) — item 9's recent-window burst, dropped by the
    # full-window support test above, is rescued here
    out3 = p.detect(
        history, trends, items_dim,
        endep=endep + 18 * 600, history_interval=600,
    )
    assert {r["itemid"] for r in out3.collect()} == {2, 5, 9}

    # retention expiry removes old rows
    p.expire_anomalies(keep_secs=1, now_ep=endep + 18 * 600 + 10)
    assert p.anomalies_table.read(spark).count() == 0


def test_classify_results_assigns_clusters(spark, tmp_path):
    """classify_charts over the results table (reference
    update_topitems.py:53-74 / detect_anomalies.py:109-131): correlated
    survivor charts share a clusterid, the odd one out is noise (-1), and
    the clusterid lands back in the snapshot via MERGE."""
    p = SeriesPipeline(str(tmp_path), trends_interval=INTERVAL, trends_retention=RETENTION)
    created = T0 + 100
    rows = []
    # items 1,2: same strong sawtooth with one synchronized spike window;
    # item 3: flat noise (no indicator overlap)
    rng = np.random.default_rng(3)
    for item in (1, 2, 3):
        for k in range(40):
            if item in (1, 2):
                v = 10.0 * (1 if 18 <= k < 22 else 0) + k % 3 + rng.normal(0, 0.05)
            else:
                v = rng.normal(0, 0.05)
            rows.append((item, T0 + k * 60, float(v)))
    history = spark.createDataFrame(
        pd.DataFrame(rows, columns=["itemid", "clock", "value"])
    )
    seed = spark.createDataFrame(
        [(i, created, -1, 0.0, 1.0) for i in (1, 2, 3)],
        "itemid long, created long, clusterid int, trend_mean double, trend_std double",
    )
    p.anomalies_table.write_snapshot(seed)

    out = p.classify_results(history, sigma=1.5)
    labels = {r["itemid"]: r["clusterid"] for r in out.collect()}
    assert labels[1] == labels[2] and labels[1] >= 0
    assert labels[3] == -1


def test_update_topitems_pipeline(spark, tmp_path):
    """update_topitems analog (reference update_topitems.py:16-51; the
    'exactly top_n items' pattern of tests/test_topitems_logan.py:39-48):
    per-host top-N by item_count, metadata enrichment, group-map override,
    idempotent MERGE, retention expiry."""
    p = SeriesPipeline(str(tmp_path), trends_interval=INTERVAL, trends_retention=RETENTION)
    endep = T0 + 30 * INTERVAL
    # 12 items over 3 hosts; items get DIFFERENT sample counts so the
    # ranking is meaningful: item i keeps i+5 trend points
    rows = []
    rng = np.random.default_rng(9)
    for item in range(1, 13):
        for k in range(item + 5):
            rows.append((item, endep - k * INTERVAL, float(50 + rng.normal(0, 1))))
    trends = spark.createDataFrame(
        pd.DataFrame(rows, columns=["itemid", "clock", "value"])
    )
    p.update_trends_stats(trends, endep)

    items_dim = spark.createDataFrame(
        [(i, (i - 1) % 3, f"host{(i - 1) % 3}", f"item{i}", "grp") for i in range(1, 13)],
        "itemid long, hostid int, host_name string, item_name string, group_name string",
    )
    out = p.update_topitems(items_dim, created=endep, top_n=2)
    got = out.toPandas().sort_values(["hostid", "itemid"]).reset_index(drop=True)

    # exactly top_n per host, and they are the hosts' highest-count items
    assert got.groupby("hostid").size().tolist() == [2, 2, 2]
    assert set(got["itemid"]) == {7, 10, 8, 11, 9, 12}  # two largest per host
    assert (got["clusterid"] == -1).all()
    assert (got["item_count"] == got["itemid"] + 5).all()

    # group-map override (J10): remap two items into a named group
    gmap = spark.createDataFrame(
        [(7, "special"), (8, "special")], "itemid long, group_name string"
    )
    out2 = p.update_topitems(items_dim, created=endep, top_n=2, group_map=gmap)
    by_item = {r["itemid"]: r["group_name"] for r in out2.collect()}
    assert by_item[7] == "special" and by_item[8] == "special"
    assert by_item[9] == "grp"

    # idempotent MERGE: same created key, no duplicates
    assert out2.count() == 6
    # retention: expire everything older than the next run
    p.update_topitems(items_dim, created=endep + 100, top_n=2, keep_secs=50)
    latest = p.topitems_table.read(spark)
    assert latest.filter(F.col("created") == endep).count() == 0
    assert latest.filter(F.col("created") == endep + 100).count() == 6
