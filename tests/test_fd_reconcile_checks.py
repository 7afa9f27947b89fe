"""FdCheck + ReconcileCheck: the two group/version-level constraint kinds
(functional dependency, bounded snapshot reconciliation) — operator level,
suite integration, and YAML config parsing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyanomalydetector2_spark.constraints.config import suite_from_dict
from pyanomalydetector2_spark.constraints.dsl import (
    FdCheck,
    ReconcileCheck,
    Suite,
)
from pyanomalydetector2_spark.constraints.suite import run_suite
from pyanomalydetector2_spark.operators.integrity import fd_violations
from pyanomalydetector2_spark.operators.reconcile import snapshot_diff


@pytest.fixture(scope="module")
def fd_frame(spark):
    # codec → container holds except for codec 'flac' (two containers);
    # NULL dependent conflicts with a non-NULL one for codec 'g711'
    rows = [
        # clip_id, bucket, codec, container
        ("c1", 0, "pcm16", "wav"),
        ("c2", 1, "pcm16", "wav"),
        ("c3", 0, "flac", "flac"),
        ("c4", 2, "flac", "ogg"),  # conflict: flac → {flac, ogg}
        ("c5", 1, "g711", "wav"),
        ("c6", 2, "g711", None),  # conflict: g711 → {wav, NULL}
        ("c7", 0, "opus", "ogg"),
    ]
    return spark.createDataFrame(
        rows, "clip_id string, bucket int, codec string, container string"
    )


def test_fd_violations_operator(spark, fd_frame):
    got = {
        r["codec"]: r
        for r in fd_violations(
            fd_frame, ["codec"], "container", carry_min=["clip_id", "bucket"]
        ).collect()
    }
    assert set(got) == {"flac", "g711"}
    f = got["flac"]
    assert (f["n_values"], f["n_rows"]) == (2, 2)
    assert (f["dep_min"], f["dep_max"]) == ("flac", "ogg")
    assert (f["clip_id"], f["bucket"]) == ("c3", 0)
    g = got["g711"]
    # NULL is a distinct group value; min/max skip NULLs → same witness twice
    assert (g["n_values"], g["n_rows"]) == (2, 2)
    assert (g["dep_min"], g["dep_max"]) == ("wav", "wav")
    assert (g["clip_id"], g["bucket"]) == ("c5", 1)


def test_fd_violations_composite_determinant(spark, fd_frame):
    # (codec, container) → clip_id is violated only where a pair repeats
    # with different clip_ids: pcm16/wav has c1 and c2
    got = fd_violations(fd_frame, ["codec", "container"], "clip_id").collect()
    assert len(got) == 1
    assert (got[0]["codec"], got[0]["container"]) == ("pcm16", "wav")
    assert got[0]["n_values"] == 2


def test_fd_check_in_suite(spark, fd_frame):
    suite = Suite(fd_checks=(FdCheck("fd_codec_container", ("codec",), "container"),))
    res = run_suite(fd_frame, fd_frame, {}, suite, "run_fd")
    viol = res.violations.collect()
    assert {v["constraint_id"] for v in viol} == {"fd_codec_container"}
    by_key = {v["clip_id"]: v for v in viol}
    assert set(by_key) == {"c3", "c5"}  # exemplar = min key per group
    assert "codec=flac" in by_key["c3"]["observed"]
    assert "n_values=2" in by_key["c3"]["observed"]
    assert "e.g. flac vs ogg" in by_key["c3"]["observed"]
    # verdicts: violation_cnt metric per bucket; buckets 0,1 fail, 2 passes
    ver = {
        r["bucket"]: r["passed"]
        for r in res.verdicts.filter(
            F.col("constraint_id") == "fd_codec_container"
        ).collect()
    }
    assert ver == {0: False, 1: False, 2: True}
    assert not res.passed()


@pytest.fixture(scope="module")
def rec_frames(spark):
    # baseline: keys 0..19, bucket = key % 4; current: key 5 removed,
    # keys 2 and 6 changed (value +1), key 100 added (bucket 0);
    # bucket 3 fully removed (keys 3,7,11,15,19)
    base = spark.range(20).select(
        F.col("id").cast("string").alias("clip_id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") * 10.0).alias("value"),
    )
    cur = (
        spark.range(20)
        .filter(~F.col("id").isin(5) & (F.col("id") % 4 != 3))
        .select(
            F.col("id").cast("string").alias("clip_id"),
            (F.col("id") % 4).cast("int").alias("bucket"),
            F.when(F.col("id").isin(2, 6), F.col("id") * 10.0 + 1.0)
            .otherwise(F.col("id") * 10.0)
            .alias("value"),
        )
        .unionByName(
            spark.createDataFrame(
                [("100", 0, 1000.0)], "clip_id string, bucket int, value double"
            )
        )
    )
    return base, cur


def test_snapshot_diff_carry_cols(spark, rec_frames):
    base, cur = rec_frames
    d = {
        r["clip_id"]: r
        for r in snapshot_diff(
            base, cur, ["clip_id"], ["value"], carry_cols=["bucket"]
        ).collect()
    }
    assert d["100"]["change"] == "added" and d["100"]["bucket"] == 0
    assert d["5"]["change"] == "removed" and d["5"]["bucket"] == 1
    assert d["2"]["change"] == "changed" and d["2"]["bucket"] == 2
    assert d["2"]["changed_cols"] == "value"
    # bucket-3 keys all removed, carry comes from the baseline side
    assert all(d[str(k)]["bucket"] == 3 for k in (3, 7, 11, 15, 19))


def test_reconcile_check_in_suite(spark, rec_frames):
    base, cur = rec_frames
    # bounds sized to the plant: bucket 1 has 1 removed of 5 baseline rows
    # (0.2), bucket 2 has 2 changed of 5 (0.4), bucket 3 is 100 % removed
    suite = Suite(
        reconcile_checks=(
            ReconcileCheck(
                "rec_value", ("value",), max_removed_rate=0.25, max_changed_rate=0.5
            ),
        )
    )
    res = run_suite(cur, base, {}, suite, "run_rec")
    viol = res.violations.collect()
    # added rows NOT emitted when max_added_rate is None
    kinds = {(v["clip_id"], v["observed"].split(":")[0]) for v in viol}
    assert ("100", "added") not in {(k, c) for k, c in kinds}
    assert ("5", "removed") in kinds and ("2", "changed") in kinds
    ver = {
        (r["bucket"], r["metric"]): r
        for r in res.verdicts.filter(
            F.col("constraint_id") == "rec_value"
        ).collect()
    }
    # bucket 3 exists only in baseline yet still gets verdict rows
    assert ver[(3, "removed_rate")]["observed"] == 1.0
    assert not ver[(3, "removed_rate")]["passed"]
    assert ver[(1, "removed_rate")]["observed"] == pytest.approx(0.2)
    assert ver[(1, "removed_rate")]["passed"]
    assert ver[(2, "changed_rate")]["observed"] == pytest.approx(0.4)
    assert ver[(2, "changed_rate")]["passed"]
    assert ver[(0, "changed_rate")]["violation_cnt"] == 0
    assert ("0", "added_rate") not in ver  # unbounded adds → no verdict
    assert not res.passed()  # bucket 3 removal breaks the bound


def test_reconcile_bounded_added(spark, rec_frames):
    base, cur = rec_frames
    suite = Suite(
        reconcile_checks=(
            ReconcileCheck(
                "rec_add",
                ("value",),
                max_removed_rate=1.0,
                max_changed_rate=1.0,
                max_added_rate=0.0,
            ),
        )
    )
    res = run_suite(cur, base, {}, suite, "run_rec_add")
    kinds = {
        v["clip_id"]
        for v in res.violations.collect()
        if v["observed"].startswith("added")
    }
    assert kinds == {"100"}
    ver = {
        (r["bucket"], r["metric"]): r["passed"]
        for r in res.verdicts.filter(
            F.col("constraint_id") == "rec_add"
        ).collect()
    }
    assert ver[(0, "added_rate")] is False  # 1 added / 5 baseline > 0.0
    assert ver[(1, "added_rate")] is True


def test_reconcile_streaming_equals_batch(spark, tmp_path):
    """Reconcile state merges additively across micro-batches: the current
    snapshot reconstructed from merged (key, compare-tuple) counts diffs
    against the baseline byte-identically to the one-shot batch run —
    including duplicate-key join multiplicity where the duplicate rows
    arrive in DIFFERENT micro-batches."""
    from pyanomalydetector2_spark.streaming.suite_stream import (
        run_suite_stream,
        streaming_suite_result,
    )

    schema = "clip_id string, bucket int, value double"
    base = spark.range(20).select(
        F.col("id").cast("string").alias("clip_id"),
        (F.col("id") % 4).cast("int").alias("bucket"),
        (F.col("id") * 10.0).alias("value"),
    )
    # current, split into 3 files: key 5 removed, keys 2/6 changed, key 100
    # added, bucket 3 fully removed; key 8 DUPLICATED across files 0 and 2
    # with different values (one matching baseline, one changed)
    files = [
        [(str(k), k % 4, k * 10.0) for k in (0, 4, 8, 12)],
        [("2", 2, 21.0), ("6", 2, 61.0), ("100", 0, 1000.0)],
        [(str(k), k % 4, k * 10.0) for k in (1, 9, 13, 17)]
        + [("10", 2, 100.0), ("14", 2, 140.0), ("16", 0, 160.0),
           ("18", 2, 180.0), ("8", 0, 81.0)],
    ]
    src = str(tmp_path / "src")
    for rows in files:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    suite = Suite(
        reconcile_checks=(
            ReconcileCheck(
                "rec_value", ("value",),
                max_removed_rate=0.25, max_changed_rate=0.5,
                max_added_rate=1.0,
            ),
        )
    )
    state = str(tmp_path / "state")
    run_suite_stream(
        spark, src, state, suite, {}, "rec_stream", schema,
        max_files_per_trigger=1,
    )
    stream_res = streaming_suite_result(
        spark, state, suite, base, "rec_stream"
    )
    batch_res = run_suite(
        spark.read.parquet(src), base, {}, suite, "rec_stream"
    )

    cols = ["bucket", "clip_id", "constraint_id", "observed", "expected"]
    sv = sorted(tuple(r) for r in stream_res.violations.select(*cols).collect())
    bv = sorted(tuple(r) for r in batch_res.violations.select(*cols).collect())
    assert sv == bv
    by_kind = {}
    for v in sv:
        by_kind.setdefault(v[3].split(":")[0], []).append(v[1])
    assert "5" in by_kind["removed"]  # single removed key caught
    assert set(by_kind["added"]) == {"100"}
    # key 8's duplicate (81.0, arrived two batches after 80.0) is one of
    # the changed JOIN rows — multiplicity preserved
    assert by_kind["changed"].count("8") == 1
    assert {"2", "6"} <= set(by_kind["changed"])
    sver = sorted(tuple(r) for r in stream_res.verdicts.collect())
    bver = sorted(tuple(r) for r in batch_res.verdicts.collect())
    assert sver == bver
    assert not stream_res.passed()  # bucket 3 is 100 % removed


def test_fd_streaming_equals_batch(spark, tmp_path):
    """FD pair counts merge additively across micro-batches: a conflict
    whose two sides arrive in DIFFERENT batches is still caught, and the
    merged result equals the one-shot batch run byte-for-byte."""
    from pyanomalydetector2_spark.constraints.suite import run_suite
    from pyanomalydetector2_spark.streaming.suite_stream import (
        run_suite_stream,
        streaming_suite_result,
    )

    schema = "clip_id string, bucket int, codec string, container string"
    # file 0: flac→flac; file 2: flac→ogg (cross-batch conflict);
    # file 1: g711→{wav,NULL} in ONE batch (in-batch conflict);
    # pcm16→wav consistent everywhere
    files = [
        [("a1", 0, "flac", "flac"), ("a2", 1, "pcm16", "wav")],
        [("b1", 0, "g711", "wav"), ("b2", 2, "g711", None),
         ("b3", 1, "pcm16", "wav")],
        [("c1", 2, "flac", "ogg"), ("c2", 0, "pcm16", "wav")],
    ]
    src = str(tmp_path / "src")
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    suite = Suite(
        fd_checks=(FdCheck("fd_codec_container", ("codec",), "container"),)
    )
    state = str(tmp_path / "state")
    run_suite_stream(
        spark, src, state, suite, {}, "fd_stream", schema,
        max_files_per_trigger=1,
    )
    stream_res = streaming_suite_result(spark, state, suite, None, "fd_stream")
    batch_res = run_suite(
        spark.read.parquet(src), spark.read.parquet(src), {}, suite, "fd_stream"
    )

    sv = sorted(
        tuple(r)
        for r in stream_res.violations.select(
            "bucket", "clip_id", "constraint_id", "observed", "expected"
        ).collect()
    )
    bv = sorted(
        tuple(r)
        for r in batch_res.violations.select(
            "bucket", "clip_id", "constraint_id", "observed", "expected"
        ).collect()
    )
    assert sv == bv
    assert len(sv) == 2  # flac (cross-batch) + g711 (in-batch w/ NULL)
    assert {v[1] for v in sv} == {"a1", "b1"}  # min-key exemplars
    sver = sorted(
        tuple(r) for r in stream_res.verdicts.collect()
    )
    bver = sorted(tuple(r) for r in batch_res.verdicts.collect())
    assert sver == bver
    assert not stream_res.passed()


def test_config_parses_new_kinds():
    suite = suite_from_dict(
        {
            "fd_checks": [
                {"id": "fd1", "determinant": "codec", "dependent": "container"},
                {
                    "id": "fd2",
                    "determinant": ["codec", "sr_hz"],
                    "dependent": "dur_ms",
                },
            ],
            "reconcile_checks": [
                {
                    "id": "rc1",
                    "compare_cols": ["transcript", "sr_hz"],
                    "max_removed_rate": 0.01,
                    "max_added_rate": 2.0,
                }
            ],
        }
    )
    assert suite.fd_checks[0].determinant == ("codec",)
    assert suite.fd_checks[1].determinant == ("codec", "sr_hz")
    assert suite.reconcile_checks[0].compare_cols == ("transcript", "sr_hz")
    assert suite.reconcile_checks[0].max_removed_rate == 0.01
    assert suite.reconcile_checks[0].max_changed_rate == 0.0
    assert suite.reconcile_checks[0].max_added_rate == 2.0
    assert suite.all_ids() == ["fd1", "fd2", "rc1"]
