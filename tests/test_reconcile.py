"""Cross-snapshot reconciliation + metrics-repository anomaly detection
(operators/reconcile.py): snapshot_diff, metrics z-scores with the
reference's screen semantics (detector.py:196-215), suite metrics
repository loop, and schema_changes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyanomalydetector2_spark.operators.reconcile import (
    append_suite_metrics,
    metrics_anomalies,
    metrics_zscores,
    next_run_seq,
    schema_changes,
    snapshot_diff,
    suite_metrics_anomalies,
)


def _diff_map(rows):
    return {r["k"]: (r["change"], r["changed_cols"]) for r in rows}


class TestSnapshotDiff:
    def test_added_removed_changed(self, spark):
        base = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
            ["k", "s", "v"],
        )
        cur = spark.createDataFrame(
            [(2, "b", 2.0), (3, "C", 3.0), (4, "d", 9.0), (5, "e", 5.0)],
            ["k", "s", "v"],
        )
        d = _diff_map(snapshot_diff(base, cur, ["k"], ["s", "v"]).collect())
        assert d == {
            1: ("removed", ""),
            3: ("changed", "s"),
            4: ("changed", "v"),
            5: ("added", ""),
        }  # key 2 identical → absent

    def test_null_safe_compare(self, spark):
        schema = T.StructType(
            [
                T.StructField("k", T.LongType()),
                T.StructField("v", T.DoubleType()),
            ]
        )
        base = spark.createDataFrame([(1, None), (2, 2.0), (3, None)], schema)
        cur = spark.createDataFrame([(1, None), (2, None), (3, 3.0)], schema)
        d = _diff_map(
            snapshot_diff(base, cur, ["k"], ["v"])
            .withColumn("changed_cols", F.col("changed_cols"))
            .collect()
        )
        # NULL==NULL equal; NULL vs value is a change in either direction
        assert d == {2: ("changed", "v"), 3: ("changed", "v")}

    def test_multi_column_change_list_order(self, spark):
        base = spark.createDataFrame([(1, "a", 1.0, 10)], ["k", "s", "v", "n"])
        cur = spark.createDataFrame([(1, "x", 9.0, 10)], ["k", "s", "v", "n"])
        [r] = snapshot_diff(base, cur, ["k"], ["s", "v", "n"]).collect()
        assert r["changed_cols"] == "s,v"  # compare_cols order, unchanged omitted


class TestMetricsZscores:
    def _hist(self, spark, values, key="m1"):
        rows = [(key, i + 1, float(v)) for i, v in enumerate(values)]
        return spark.createDataFrame(rows, ["metric", "run_seq", "value"])

    def test_flags_jump_against_history(self, spark):
        h = self._hist(spark, [10.0, 10.1, 9.9, 10.0, 10.2, 15.0])
        [r] = metrics_zscores(h, ["metric"], "run_seq", "value", lam=3.0).collect()
        assert r["flagged"] and r["run"] == 6 and r["n_hist"] == 5
        assert r["z"] > 3.0

    def test_stable_latest_not_flagged(self, spark):
        h = self._hist(spark, [10.0, 10.1, 9.9, 10.0, 10.2, 10.05])
        [r] = metrics_zscores(h, ["metric"], "run_seq", "value", lam=3.0).collect()
        assert not r["flagged"]

    def test_min_support_guard(self, spark):
        # only 3 history runs < min_runs=5: never flagged, however wild
        h = self._hist(spark, [10.0, 10.1, 9.9, 99.0])
        [r] = metrics_zscores(
            h, ["metric"], "run_seq", "value", lam=1.0, min_runs=5
        ).collect()
        assert not r["flagged"] and r["n_hist"] == 3

    def test_zero_variance_history_flags_any_move(self, spark):
        h = self._hist(spark, [5.0] * 6 + [5.0001])
        [r] = metrics_zscores(h, ["metric"], "run_seq", "value", lam=3.0).collect()
        assert r["flagged"] and r["z"] is None and r["std_hist"] == 0.0
        h2 = self._hist(spark, [5.0] * 7)
        [r2] = metrics_zscores(h2, ["metric"], "run_seq", "value").collect()
        assert not r2["flagged"]

    def test_independent_keys(self, spark):
        a = self._hist(spark, [10.0, 10.1, 9.9, 10.0, 10.2, 15.0], key="a")
        b = self._hist(spark, [1.0, 1.1, 0.9, 1.0, 1.1, 1.0], key="b")
        out = metrics_anomalies(
            a.unionByName(b), ["metric"], "run_seq", "value", lam=3.0
        ).collect()
        assert [r["metric"] for r in out] == ["a"]


class TestSuiteMetricsRepo:
    def test_repo_loop_flags_planted_regression(self, spark, tmp_path):
        """Six stable runs then a null-rate jump: the repository z-score
        flags exactly the jumped metric."""
        repo = os.path.join(str(tmp_path), "mrepo")
        schema = ["run_id", "bucket", "constraint_id", "metric", "observed"]

        def verdicts(run, null_rate):
            return spark.createDataFrame(
                [
                    (f"r{run}", 0, "c_null", "transcript.null_rate", null_rate),
                    (f"r{run}", 0, "c_mean", "dur_ms.mean", 5000.0 + run * 0.01),
                ],
                schema,
            )

        for i in range(1, 7):
            seq = next_run_seq(spark, repo)
            assert seq == i
            append_suite_metrics(verdicts(i, 0.01 + 0.001 * (i % 3)), seq, repo)
        anom = suite_metrics_anomalies(spark, repo, lam=3.0).collect()
        assert anom == []
        append_suite_metrics(verdicts(7, 0.25), next_run_seq(spark, repo), repo)
        anom = suite_metrics_anomalies(spark, repo, lam=3.0).collect()
        assert [r["metric"] for r in anom] == ["transcript.null_rate"]
        assert anom[0]["run"] == 7 and anom[0]["n_hist"] == 6

    def test_nan_observations_excluded(self, spark, tmp_path):
        repo = os.path.join(str(tmp_path), "mrepo_nan")
        schema = ["run_id", "bucket", "constraint_id", "metric", "observed"]
        for i in range(1, 8):
            df = spark.createDataFrame(
                [(f"r{i}", 0, "c", "allnull.mean", float("nan"))], schema
            )
            append_suite_metrics(df, i, repo)
        assert suite_metrics_anomalies(spark, repo, lam=3.0).collect() == []

    def test_next_run_seq_fresh(self, spark, tmp_path):
        assert next_run_seq(spark, os.path.join(str(tmp_path), "nope")) == 1


class TestSchemaChanges:
    def test_all_change_kinds(self):
        base = T.StructType(
            [
                T.StructField("clip_id", T.StringType(), False),
                T.StructField("sr_hz", T.IntegerType()),
                T.StructField("gone", T.StringType()),
                T.StructField("loosened", T.StringType(), False),
            ]
        )
        cur = T.StructType(
            [
                T.StructField("clip_id", T.StringType(), False),
                T.StructField("sr_hz", T.LongType()),
                T.StructField("loosened", T.StringType(), True),
                T.StructField("lang", T.StringType()),
            ]
        )
        out = schema_changes(cur, base)
        by = {(d["column"], d["change"]) for d in out}
        assert by == {
            ("sr_hz", "type_changed"),
            ("loosened", "nullability_changed"),
            ("lang", "column_added"),
            ("gone", "column_removed"),
        }
        tc = [d for d in out if d["change"] == "type_changed"][0]
        assert tc["observed"] == "bigint" and tc["expected"] == "int"

    def test_identical_schemas_empty(self):
        s = T.StructType([T.StructField("a", T.StringType())])
        assert schema_changes(s, s) == []
