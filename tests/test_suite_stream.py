"""Streaming constraint suite: streaming-equals-batch, incremental
resume, per-batch idempotence, torn-batch invisibility, and state
compaction (streaming/suite_stream.py)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyanomalydetector2_spark.constraints import default_clips_suite, run_suite
from pyanomalydetector2_spark.constraints.dsl import (
    AnnCheck,
    DriftCheck,
    StatCheck,
    Suite,
)
from pyanomalydetector2_spark.datagen.clips import (
    CLIPS_SCHEMA,
    clips_table,
    dim_codec,
    dim_sr,
)
from pyanomalydetector2_spark.streaming.suite_stream import (
    batch_metrics,
    compact_suite_state,
    ensure_streamable,
    process_suite_batch,
    run_suite_stream,
    streaming_suite_result,
    vacuum_suite_state,
)

N = 2000
BUCKETS = 8
K_FILES = 3


def _sorted_violations(res):
    return sorted(
        tuple(r)
        for r in res.violations.select(
            "bucket", "clip_id", "constraint_id", "observed", "expected"
        ).collect()
    )


def _sorted_verdicts(res):
    return sorted(
        (
            (r["bucket"], r["constraint_id"], r["metric"]),
            (r["observed"], r["threshold"], r["passed"], r["violation_cnt"]),
        )
        for r in res.verdicts.collect()
    )


def _assert_results_equal(stream_res, batch_res):
    assert _sorted_violations(stream_res) == _sorted_violations(batch_res)
    sv, bv = _sorted_verdicts(stream_res), _sorted_verdicts(batch_res)
    assert [k for k, _ in sv] == [k for k, _ in bv]
    for (key, s), (_, b) in zip(sv, bv):
        # integer-count state (histograms, categories, violation counts,
        # HLL over identical distinct sets) reproduces the one-shot floats
        # bit-for-bit; only the moment sums may differ in ADDITION ORDER
        assert s[0] == pytest.approx(b[0], rel=1e-9, nan_ok=True), key
        assert s[1:] == b[1:], key


@pytest.fixture(scope="module")
def drained(spark, tmp_path_factory):
    """Source files + a full availableNow drain + the matching one-shot
    batch run over the identical frame."""
    root = tmp_path_factory.mktemp("suite_stream")
    src, state = str(root / "src"), str(root / "state")
    cur = clips_table(spark, N, planted=True, n_buckets=BUCKETS)
    cur.repartition(K_FILES).write.mode("overwrite").parquet(src)
    base = clips_table(spark, N, planted=False, n_buckets=BUCKETS).cache()
    dims = {"dim_codec": dim_codec(spark), "dim_sr": dim_sr(spark)}
    suite = default_clips_suite()

    run_suite_stream(
        spark, src, state, suite, dims, "stream_run", CLIPS_SCHEMA,
        max_files_per_trigger=1,
    )
    stream_res = streaming_suite_result(
        spark, state, suite, base, "stream_run"
    )
    batch_res = run_suite(
        spark.read.parquet(src), base, dims, suite, "stream_run"
    )
    return src, state, base, dims, suite, stream_res, batch_res


def test_stream_equals_batch(drained):
    _, state, _, _, _, stream_res, batch_res = drained
    assert stream_res.row_count == batch_res.row_count == N
    assert stream_res.processed_buckets == batch_res.processed_buckets
    _assert_results_equal(stream_res, batch_res)
    # one committed micro-batch per source file, each with lineage metrics
    metrics = batch_metrics(state)
    assert len(metrics) == K_FILES
    assert sum(m["rows"] for m in metrics) == N
    assert all(m["wall_sec"] > 0 for m in metrics)


def test_redelivered_batch_is_noop(spark, drained):
    src, state, base, dims, suite, stream_res, _ = drained
    before = _sorted_verdicts(stream_res)
    one_file = spark.read.parquet(src).limit(50)
    process_suite_batch(  # batch id 0 is already committed
        one_file, 0, state, suite, dims, "stream_run"
    )
    after = _sorted_verdicts(
        streaming_suite_result(spark, state, suite, base, "stream_run")
    )
    assert after == before


def test_torn_batch_is_invisible(spark, drained):
    src, state, base, dims, suite, stream_res, _ = drained
    # a crashed batch wrote SOME component deltas but no commit marker
    torn = 999
    spark.read.parquet(src).limit(100).groupBy("bucket").count().selectExpr(
        "cast(bucket as int) bucket", "cast(count as long) n"
    ).write.parquet(f"{state}/buckets/batch={torn}")
    try:
        res = streaming_suite_result(spark, state, suite, base, "stream_run")
        assert res.row_count == N  # torn rows not counted
        assert _sorted_verdicts(res) == _sorted_verdicts(stream_res)
    finally:
        shutil.rmtree(f"{state}/buckets/batch={torn}", ignore_errors=True)


def test_compaction_preserves_result(spark, drained):
    _, state, base, _, suite, stream_res, _ = drained
    gen = compact_suite_state(spark, state)
    assert gen == K_FILES - 1  # newest committed batch id
    removed = vacuum_suite_state(state)
    assert removed  # folded deltas reclaimed
    res = streaming_suite_result(spark, state, suite, base, "stream_run")
    assert _sorted_violations(res) == _sorted_violations(stream_res)
    assert _sorted_verdicts(res) == _sorted_verdicts(stream_res)


def test_incremental_arrival_resumes(spark, tmp_path):
    """Two drains over a growing source equal one batch run over the
    union — the checkpoint skips already-validated files."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    suite = default_clips_suite()
    dims = {"dim_codec": dim_codec(spark), "dim_sr": dim_sr(spark)}
    base = clips_table(spark, 800, planted=False, n_buckets=BUCKETS).cache()

    cur = clips_table(spark, 800, planted=True, n_buckets=BUCKETS).cache()
    first = cur.filter("crc32(clip_id) % 2 = 0")
    second = cur.filter("crc32(clip_id) % 2 = 1")
    os.makedirs(src, exist_ok=True)
    first.coalesce(1).write.mode("append").parquet(src)
    run_suite_stream(
        spark, src, state, suite, dims, "inc", CLIPS_SCHEMA
    )
    mid = streaming_suite_result(spark, state, suite, base, "inc")
    assert 0 < mid.row_count < 800

    second.coalesce(1).write.mode("append").parquet(src)
    run_suite_stream(
        spark, src, state, suite, dims, "inc", CLIPS_SCHEMA
    )
    final = streaming_suite_result(spark, state, suite, base, "inc")
    assert final.row_count == 800
    batch_res = run_suite(cur, base, dims, suite, "inc")
    _assert_results_equal(final, batch_res)


def test_equi_depth_stream_equals_batch(spark, tmp_path):
    """Equi-depth drift over the stream: edges pinned once from the KLL
    sketch store (bootstrapped by a batch run over the same baseline),
    edge-binned counts merged across micro-batches — verdicts identical to
    the one-shot batch runner using the same stored edges. Without a store
    (and with no pinned edges in the state dir) the stream refuses."""
    import json as _json

    from pyanomalydetector2_spark.sources.catalog import SnapshotTable

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 800, planted=True, n_buckets=4)
    cur.repartition(2).write.mode("overwrite").parquet(src)
    base = clips_table(spark, 800, planted=False, n_buckets=4).cache()
    suite = Suite(
        drift_checks=(
            DriftCheck("dur_eq", "dur_ms", 0, 0, nbins=12, equi_depth=True),
        )
    )

    with pytest.raises(ValueError, match="sketch_store"):
        run_suite_stream(
            spark, src, str(tmp_path / "state2"), suite, None, "eq_run",
            CLIPS_SCHEMA,
        )

    store = SnapshotTable(str(tmp_path / "kll"))
    batch_res = run_suite(
        spark.read.parquet(src), base, {}, suite, "eq_run",
        sketch_store=store,
    )
    run_suite_stream(
        spark, src, state, suite, None, "eq_run", CLIPS_SCHEMA,
        sketch_store=store,
    )
    with open(f"{state}/equi_edges.json") as f:
        pinned = _json.load(f)
    assert pinned["dur_eq"]["column"] == "dur_ms"
    assert len(pinned["dur_eq"]["edges"]) >= 2

    stream_res = streaming_suite_result(spark, state, suite, base, "eq_run")
    _assert_results_equal(stream_res, batch_res)
    # the planted dur_ms shift fails in both engines
    assert not stream_res.passed() and not batch_res.passed()
    base.unpersist()


def test_equi_depth_resume_keeps_pinned_edges(spark, tmp_path):
    """A resumed stream must keep the edges PINNED at first drain even if
    the sketch store moved on meanwhile — otherwise bins from different
    edge sets would merge. The final scores must equal a one-shot funnel
    run using the pinned edges."""
    import json as _json

    from pyanomalydetector2_spark.operators.drift import drift_scores_quantile
    from pyanomalydetector2_spark.operators.kll import kll_build, kll_merge
    from pyanomalydetector2_spark.sources.catalog import SnapshotTable

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 800, planted=True, n_buckets=4)
    part1 = cur.filter("pmod(hash(clip_id), 3) != 0")
    part2 = cur.filter("pmod(hash(clip_id), 3) = 0")  # complement, multiset-safe
    part1.coalesce(1).write.mode("overwrite").parquet(src)
    base = clips_table(spark, 800, planted=False, n_buckets=4).cache()
    suite = Suite(
        drift_checks=(
            DriftCheck("dur_eq", "dur_ms", 0, 0, nbins=10, equi_depth=True),
        )
    )
    store = SnapshotTable(str(tmp_path / "kll"))
    store.write_snapshot(
        kll_build(base, "dur_ms", (), k=8192).withColumn(
            "column", F.lit("dur_ms")
        )
    )
    run_suite_stream(spark, src, state, suite, None, "rs", CLIPS_SCHEMA,
                     sketch_store=store)
    with open(f"{state}/equi_edges.json") as f:
        pinned = _json.load(f)

    # the store moves on: fold a shifted delta in (edges would now differ)
    delta = clips_table(spark, 500, planted=True, n_buckets=4).withColumn(
        "dur_ms", F.col("dur_ms") + F.lit(5000)
    )
    store.write_snapshot(
        kll_merge(
            store.read(spark),
            kll_build(delta, "dur_ms", (), k=8192).withColumn(
                "column", F.lit("dur_ms")
            ),
        )
    )

    part2.coalesce(1).write.mode("append").parquet(src)
    run_suite_stream(spark, src, state, suite, None, "rs", CLIPS_SCHEMA,
                     sketch_store=store)
    with open(f"{state}/equi_edges.json") as f:
        assert _json.load(f) == pinned  # edges survived the store change

    res = streaming_suite_result(spark, state, suite, base, "rs")
    got = {
        (r["bucket"], r["metric"]): r["observed"] for r in res.verdicts.collect()
    }
    expect = drift_scores_quantile(
        cur, base, "dur_ms", 10, group_col="bucket",
        edges=[float(e) for e in pinned["dur_eq"]["edges"]],
    )
    for s in expect:
        assert got[(int(s["group"]), "psi")] == pytest.approx(s["psi"], rel=1e-9)
        assert got[(int(s["group"]), "ks")] == pytest.approx(s["ks"], rel=1e-9)
    base.unpersist()


def test_percentile_stat_stream_equals_batch(spark, tmp_path):
    """pXX StatChecks stream via per-batch KLL sketch partials and agree
    bit-for-bit with the batch runner in the exact regime; the observed
    p-values match a numpy nearest-rank oracle."""
    import math

    import numpy as np

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 900, planted=True, n_buckets=4)
    cur.repartition(3).write.mode("overwrite").parquet(src)
    base = clips_table(spark, 900, planted=False, n_buckets=4).cache()
    suite = Suite(
        stat_checks=(
            StatCheck("dur_p95", "dur_ms", "p95", "<=", 20000.0),
            StatCheck("dur_p50", "dur_ms", "p50", ">", 0.0),
            StatCheck("dur_mean", "dur_ms", "mean", ">", 0.0),
        )
    )
    batch_res = run_suite(spark.read.parquet(src), base, {}, suite, "pq")
    run_suite_stream(spark, src, state, suite, None, "pq", CLIPS_SCHEMA)
    stream_res = streaming_suite_result(spark, state, suite, base, "pq")
    _assert_results_equal(stream_res, batch_res)

    # numpy nearest-rank oracle per bucket (the suite validates CURRENT)
    pdf = spark.read.parquet(src).select("bucket", "dur_ms").toPandas()
    got = {
        (r["bucket"], r["metric"]): r["observed"]
        for r in batch_res.verdicts.collect()
    }
    for b, grp in pdf.dropna().groupby("bucket"):
        s = np.sort(grp["dur_ms"].to_numpy(dtype=float))
        for stat, q in (("p95", 0.95), ("p50", 0.50)):
            idx = max(math.ceil(q * len(s)), 1) - 1
            assert got[(int(b), f"dur_ms.{stat}")] == s[idx], (b, stat)
    base.unpersist()


def test_percentile_stat_survives_compaction(spark, tmp_path):
    """ksketch state folds through compact_suite_state via the KLL merge
    (not a scalar agg) and vacuum drops folded deltas; verdicts identical
    before and after."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 600, planted=False, n_buckets=4)
    cur.repartition(3).write.mode("overwrite").parquet(src)
    base = cur.cache()
    suite = Suite(stat_checks=(StatCheck("p9", "dur_ms", "p90", ">", 0.0),))
    run_suite_stream(spark, src, state, suite, None, "cp", CLIPS_SCHEMA)
    before = _sorted_verdicts(
        streaming_suite_result(spark, state, suite, base, "cp")
    )
    assert compact_suite_state(spark, state) >= 0
    removed = vacuum_suite_state(state)
    assert any("/ksketch/" in d for d in removed)
    after = _sorted_verdicts(
        streaming_suite_result(spark, state, suite, base, "cp")
    )
    assert after == before
    base.unpersist()


def test_mid_stream_check_family_addition_fails_closed(spark, tmp_path):
    """A suite that gains a check family AFTER batches were committed must
    refuse to assemble (the new family's merged state would silently
    exclude those batches); the unchanged suite still drains fine."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 400, planted=False, n_buckets=4)
    cur.repartition(2).write.mode("overwrite").parquet(src)
    lean = Suite(
        stat_checks=(StatCheck("m", "dur_ms", "mean", ">", 0.0),)
    )
    run_suite_stream(spark, src, state, lean, None, "mid", CLIPS_SCHEMA)
    assert streaming_suite_result(spark, state, lean, cur, "mid").passed()

    grown = Suite(
        stat_checks=(
            StatCheck("m", "dur_ms", "mean", ">", 0.0),
            StatCheck("p", "dur_ms", "p95", ">", 0.0),  # added mid-stream
        )
    )
    with pytest.raises(ValueError, match="ksketch.*added after|no delta"):
        streaming_suite_result(spark, state, grown, cur, "mid")


def test_ensure_streamable_rejects_non_mergeable():
    ok = default_clips_suite()
    ensure_streamable(ok)  # the default suite is fully streamable
    with pytest.raises(ValueError, match="AnnChecks"):
        ensure_streamable(
            Suite(ann_checks=(AnnCheck("ann", dims=8),))
        )
    # equi-depth IS streamable (edges pinned from the KLL sketch store);
    # distributed-mode scoring is not
    ensure_streamable(
        Suite(drift_checks=(DriftCheck("d", "dur_ms", 0, 1, equi_depth=True),))
    )
    with pytest.raises(ValueError, match="distributed"):
        ensure_streamable(
            Suite(
                drift_checks=(
                    DriftCheck("d", "dur_ms", 0, 1, distributed=True),
                )
            )
        )
    with pytest.raises(ValueError, match="sketch-backed"):
        ensure_streamable(
            Suite(
                stat_checks=(
                    StatCheck("q", "dur_ms", "quantiles", "<=", 1.0),
                )
            )
        )
    # percentile stats ARE streamable (per-batch KLL sketch partials)
    ensure_streamable(
        Suite(stat_checks=(StatCheck("p", "dur_ms", "p95", "<=", 1.0),))
    )


def test_mid_stream_check_added_to_existing_family_fails_closed(
    spark, tmp_path
):
    """A check added to a family that ALREADY has state (second unique
    column, new row-check id) leaves every component covered, so the
    component guard alone cannot see it — the suite manifest must. A
    threshold-only change is NOT state-affecting and stays allowed."""
    from pyanomalydetector2_spark.constraints.dsl import RowCheck, UniqueCheck

    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 400, planted=False, n_buckets=4)
    cur.repartition(2).write.mode("overwrite").parquet(src)
    suite = Suite(
        unique_checks=(UniqueCheck("u_clip", "clip_id"),),
        stat_checks=(StatCheck("m", "dur_ms", "mean", ">", 0.0),),
    )
    run_suite_stream(spark, src, state, suite, None, "mf", CLIPS_SCHEMA)
    assert streaming_suite_result(spark, state, suite, cur, "mf").passed()

    # second unique column: the ids component has deltas for every batch
    # (written for clip_id), yet codec keys from the early batches are gone
    grown = Suite(
        unique_checks=(
            UniqueCheck("u_clip", "clip_id"),
            UniqueCheck("u_codec", "codec"),
        ),
        stat_checks=suite.stat_checks,
    )
    with pytest.raises(ValueError, match="ids.*added after"):
        streaming_suite_result(spark, state, grown, cur, "mf")
    # new row-check id: same hole via the violations component
    with_rc = Suite(
        unique_checks=suite.unique_checks,
        stat_checks=suite.stat_checks,
        row_checks=(RowCheck("r_new", "dur_ms > 0", "dur_ms", "positive"),),
    )
    with pytest.raises(ValueError, match="violations.*added after"):
        streaming_suite_result(spark, state, with_rc, cur, "mf")
    # removing a check mid-stream is equally a state mismatch
    shrunk = Suite(stat_checks=suite.stat_checks)
    with pytest.raises(ValueError, match="ids"):
        streaming_suite_result(spark, state, shrunk, cur, "mf")
    # a THRESHOLD change shapes no state: still drains fine
    relaxed = Suite(
        unique_checks=suite.unique_checks,
        stat_checks=(StatCheck("m", "dur_ms", "mean", ">", -1.0),),
    )
    assert streaming_suite_result(spark, state, relaxed, cur, "mf").passed()


def test_compaction_refuses_uncovered_component(spark, tmp_path):
    """compact_suite_state must NOT fold a component that lacks deltas for
    some committed batch (manually damaged or legacy state): folding would
    stamp the base past the gap and launder it through the drain's
    coverage guard. The gap must still be detected after compaction."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    cur = clips_table(spark, 400, planted=False, n_buckets=4)
    cur.repartition(2).write.mode("overwrite").parquet(src)
    suite = Suite(stat_checks=(StatCheck("m", "dur_ms", "mean", ">", 0.0),))
    run_suite_stream(spark, src, state, suite, None, "cv", CLIPS_SCHEMA)
    batches = sorted(
        int(d.split("=")[1]) for d in os.listdir(f"{state}/profile")
        if d.startswith("batch=")
    )
    assert len(batches) >= 2
    # simulate the family-added-mid-stream gap: first batch's delta gone
    shutil.rmtree(f"{state}/profile/batch={batches[0]}")
    gen = compact_suite_state(spark, state)
    # profile was NOT folded (no base dir), other components were
    assert not os.path.isdir(f"{state}/profile_base/gen={gen}")
    assert os.path.isdir(f"{state}/buckets_base/gen={gen}")
    with pytest.raises(ValueError, match="profile.*no delta"):
        streaming_suite_result(spark, state, suite, cur, "cv")


def test_duplicate_uniform_drift_columns_rejected():
    """Two uniform DriftChecks on one column would merge their
    differently-binned counts in the column-keyed hist state and silently
    drop one check's verdicts — ensure_streamable must refuse."""
    with pytest.raises(ValueError, match="share column"):
        ensure_streamable(
            Suite(
                drift_checks=(
                    DriftCheck("d1", "dur_ms", 0, 10000, nbins=10),
                    DriftCheck("d2", "dur_ms", 0, 5000, nbins=20),
                )
            )
        )
    # same column is fine across MODES (state keyed by check id / category)
    ensure_streamable(
        Suite(
            drift_checks=(
                DriftCheck("d1", "dur_ms", 0, 10000, nbins=10),
                DriftCheck("d3", "dur_ms", 0, 0, nbins=15, equi_depth=True),
            )
        )
    )


def test_all_null_percentile_column_drains_to_failed_verdict(
    spark, tmp_path
):
    """A percentile-check column that is all-null in EVERY micro-batch
    writes ksketch deltas with zero rows — under AQE those dirs can hold
    no part files at all. The drain must read them against the pinned
    component schema and emit the documented NaN-observed FAILED verdict,
    not die in parquet schema inference."""
    src, state = str(tmp_path / "src"), str(tmp_path / "state")
    spark.createDataFrame(
        [(f"c{i}", i % 2, None) for i in range(40)],
        "clip_id string, bucket int, value double",
    ).repartition(2).write.mode("overwrite").parquet(src)
    suite = Suite(stat_checks=(StatCheck("p", "value", "p95", ">", 0.0),))
    run_suite_stream(
        spark, src, state, suite, None, "nul",
        "clip_id string, bucket int, value double",
    )
    res = streaming_suite_result(spark, state, suite, None, "nul")
    rows = res.verdicts.filter("constraint_id = 'p'").collect()
    assert rows and all(not r["passed"] for r in rows)
