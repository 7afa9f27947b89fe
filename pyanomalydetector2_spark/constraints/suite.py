"""Constraint-suite runner: one distributed pass per check family, verdicts +
violation rows out, checkpoint/resume at partition-bucket granularity.

Execution shape (the scale story):
- ALL row checks ride ONE scan: each predicate compiles to a struct-in-array
  element, failures explode into violation rows. The decoded-PCM invariant
  columns are attached by a single Arrow-batched UDF pass; ``bytes`` is never
  read by any other family (column pruning).
- Stat/drift/uniqueness/referential checks run directly against the source
  table with COLUMN-PRUNED scans (no cache): measured on this hardware, a
  pruned parquet re-scan is ~10× cheaper than building + reading a
  deserialized in-memory cache of all columns, and at 100 TB the same holds
  more strongly — each family's scan reads only its own few columns.
- Verdict assembly happens on the driver over TINY frames (buckets ×
  constraints rows) — the same driver-side funnel the reference uses for
  survivor sets (detect_anomalies.py:79-96); all heavy lifting stays
  distributed.

Violation rows mirror the reference's anomalies upsert contract
(models/anomalies.py:9,59-79 → FIXTURES.md §B3).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyanomalydetector2_spark.constraints.dsl import Suite
from pyanomalydetector2_spark.operators.audio import with_audio_invariants
from pyanomalydetector2_spark.operators.drift import (
    HistSpec,
    drift_scores_multi,
    drift_scores_quantile,
)
from pyanomalydetector2_spark.operators.integrity import (
    fd_det_repr,
    fd_observed,
    fd_violations,
    referential_violations,
)
from pyanomalydetector2_spark.operators.reconcile import snapshot_diff
from pyanomalydetector2_spark.operators.stats import column_profile
from pyanomalydetector2_spark.operators.uniqueness import duplicate_rows
from pyanomalydetector2_spark.streaming.checkpoint import CheckpointLedger
from pyanomalydetector2_spark.functions import local_rows_df

VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("clip_id", T.StringType()),
        T.StructField("constraint_id", T.StringType()),
        T.StructField("observed", T.StringType()),
        T.StructField("expected", T.StringType()),
    ]
)

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("constraint_id", T.StringType()),
        T.StructField("metric", T.StringType()),
        T.StructField("observed", T.DoubleType()),
        T.StructField("threshold", T.DoubleType()),
        T.StructField("passed", T.BooleanType()),
        T.StructField("violation_cnt", T.LongType()),
    ]
)


@dataclass
class SuiteResult:
    run_id: str
    verdicts: DataFrame
    violations: DataFrame
    processed_buckets: list[int]
    skipped_buckets: list[int]
    row_count: int
    wall_sec: float
    # frames persisted on behalf of this result's lazy legs (the verdicts
    # cache; under eager_verdicts=False also the stat profile) — a long-
    # lived session running many suites should release them once the
    # result is materialized, or executor storage memory accrues one
    # cached frame per run
    cached: tuple = ()

    def passed(self) -> bool:
        return self.verdicts.filter(~F.col("passed")).isEmpty()

    def unpersist(self) -> None:
        """Release the caches backing this result (safe after the caller
        has collected/persisted verdicts and violations; lazy legs stay
        valid and simply recompute if re-materialized)."""
        for df in self.cached:
            df.unpersist()


def _row_check_violations(
    base: DataFrame, suite: Suite, run_id: str, key_col: str, bucket_col: str
) -> DataFrame | None:
    if not suite.row_checks:
        return None
    elems = []
    for c in suite.row_checks:
        fails = ~F.coalesce(F.expr(c.predicate), F.lit(False))  # NULL pred → fail
        elems.append(
            F.when(
                fails,
                F.struct(
                    F.lit(c.constraint_id).alias("constraint_id"),
                    F.coalesce(F.expr(c.observed).cast("string"), F.lit("NULL")).alias(
                        "observed"
                    ),
                    F.lit(c.expected).alias("expected"),
                ),
            )
        )
    return (
        base.select(
            F.col(bucket_col).alias("bucket"),
            F.col(key_col).alias("clip_id"),
            F.array_compact(F.array(*elems)).alias("_fails"),
        )
        .filter(F.size("_fails") > 0)
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("bucket").cast("int"),
            "clip_id",
            F.explode("_fails").alias("_f"),
        )
        .select(
            "run_id",
            "bucket",
            "clip_id",
            F.col("_f.constraint_id").alias("constraint_id"),
            F.col("_f.observed").alias("observed"),
            F.col("_f.expected").alias("expected"),
        )
    )


def row_check_base(current: DataFrame, suite: Suite) -> DataFrame:
    """The row-check projection: the source frame plus whatever invariant
    columns the suite's row checks require. Row checks get the
    audio-invariant / container-meta columns; every OTHER family reads the
    source directly so its scan prunes down to its own columns. Container
    meta attaches FIRST (it reads bytes); the audio-invariant projection
    then drops bytes. Shared by the one-shot runner and the streaming
    per-batch path so both evaluate predicates over identical columns."""
    needs_audio = any(c.requires_audio for c in suite.row_checks)
    needs_container = any(
        getattr(c, "requires_container", False) for c in suite.row_checks
    )
    audio_base = current
    if needs_container:
        from pyanomalydetector2_spark.operators.multimodal import (
            with_container_meta,
        )

        audio_base = with_container_meta(audio_base)
    if needs_audio:
        from pyanomalydetector2_spark.constraints.dsl import TOKEN_COUNT_SQL

        # transcript_tokens computed ONCE as a column the cross-modal
        # predicates reference by name — single definition shared by the
        # DSL and the YAML mirror; perf-neutral vs inlining (codegen
        # subexpression elimination, A/B in BENCH/BASELINE.md §13)
        audio_base = with_audio_invariants(audio_base).withColumn(
            "transcript_tokens", F.expr(TOKEN_COUNT_SQL)
        )
    elif needs_container and not any(
        "bytes" in c.predicate or "bytes" in c.observed
        for c in suite.row_checks
    ):
        # prune bytes out of the row-check projection — but never out from
        # under a row check whose own expression references it
        audio_base = audio_base.drop("bytes")
    return audio_base


def verdict_frame(
    df: DataFrame, run_id: str, cid: str, metric, observed, threshold,
    passed, cnt=None,
) -> DataFrame:
    """Shape one family's aggregate frame into VERDICT_SCHEMA columns.
    ``df`` must carry an int ``bucket`` column; the remaining args are
    Column expressions evaluated against it. Shared by the one-shot
    runner and the streaming assembler so both emit identical verdicts."""
    return df.select(
        F.lit(run_id).alias("run_id"),
        F.col("bucket").cast("int").alias("bucket"),
        F.lit(cid).alias("constraint_id"),
        (F.lit(metric) if isinstance(metric, str) else metric).alias(
            "metric"
        ),
        observed.cast("double").alias("observed"),
        threshold.cast("double").alias("threshold"),
        passed.cast("boolean").alias("passed"),
        (F.lit(0) if cnt is None else cnt).cast("long").alias(
            "violation_cnt"
        ),
    )


_CMP_OPS = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b,
}


def stat_verdict_frames(
    prof: DataFrame, stat_checks, run_id: str, bucket_col: str
) -> list[DataFrame]:
    """Per-check verdict frames from a (long-layout) column profile.
    NULL stat (all-null column in a bucket) → observed NaN, failed — and
    NaN must fail EVERY op: Spark orders NaN above all doubles (NaN >= x
    is true), unlike the old driver-side Python comparison where NaN
    compares false — the old semantics are pinned explicitly."""
    out = []
    for c in stat_checks:
        rows = prof.filter(F.col("column") == c.column).withColumn(
            "bucket", F.col(bucket_col).cast("int")
        )
        stat = F.col(c.stat)
        out.append(
            verdict_frame(
                rows,
                run_id,
                c.constraint_id,
                f"{c.column}.{c.stat}",
                F.coalesce(stat.cast("double"), F.lit(float("nan"))),
                F.lit(float(c.threshold)),
                F.when(F.isnan(stat.cast("double")), F.lit(False)).otherwise(
                    F.coalesce(
                        _CMP_OPS[c.op](stat.cast("double"), F.lit(c.threshold)),
                        F.lit(False),
                    )
                ),
            )
        )
    return out


def percentile_sketches(
    df: DataFrame, columns: list[str], bucket_col: str
) -> DataFrame:
    """Per-(column, bucket) KLL sketch rows for percentile StatChecks — ALL
    columns in ONE column-pruned Arrow pass (the transfer is the build's
    dominant cost, BENCH §24; every partition reduces to KBs of sketch
    before the single tiny shuffle). The SAME frame shape the streaming
    suite persists per micro-batch ("ksketch" component), so batch and
    stream share one definition of pXX."""
    from pyanomalydetector2_spark.operators.kll import (
        STAT_SKETCH_K,
        kll_build_multi,
    )

    return kll_build_multi(df, columns, [bucket_col], k=STAT_SKETCH_K).select(
        "column",
        F.col(bucket_col).cast("int").alias("bucket"),
        "kll_k", "kll_n", "kll_levels", "kll_compactions",
    )


def percentile_stat_frame(
    sketches: DataFrame, pct_checks, bucket_df: DataFrame
) -> DataFrame:
    """Long (bucket, column, p<NN>…) frame from merged sketch rows, shaped
    for ``stat_verdict_frames``. Every (bucket, column) pair of the run is
    present: a bucket whose column was all-null/NaN has no sketch row and
    surfaces as NULL → NaN observed → FAILED verdict, matching the moment
    profile's all-null semantics."""
    from pyanomalydetector2_spark.constraints.dsl import parse_percentile_stat
    from pyanomalydetector2_spark.operators.kll import kll_quantiles

    stats = sorted({c.stat for c in pct_checks})
    qs = [parse_percentile_stat(s) for s in stats]
    q = kll_quantiles(sketches, qs, ["column", "bucket"])
    vals = q.select(
        "column",
        "bucket",
        *[
            F.element_at("q_values", i + 1).alias(s)
            for i, s in enumerate(stats)
        ],
    )
    cols_df = local_rows_df(
        vals.sparkSession,
        [(c,) for c in sorted({c.column for c in pct_checks})], "column string",
    )
    grid = bucket_df.select(F.col("bucket").cast("int").alias("bucket")).crossJoin(
        F.broadcast(cols_df)
    )
    return grid.join(vals, ["bucket", "column"], "left")


def drift_verdict_frames(
    frame: DataFrame, c, run_id: str, bucket_col: str, ks_col: str
) -> list[DataFrame]:
    """Per-bucket psi + ks verdict frames from a drift-score DataFrame —
    the scores never reach the driver (VERDICT r03 #7). psi/ks cannot
    be NULL here: the drift APIs validate an empty/all-null baseline
    EAGERLY (raising the contract ValueError) and the ε-smoothed
    algebra is total after that — a hypothetical NULL still FAILS via
    coalesce(False) rather than vacuously passing."""
    rows = frame.withColumn("bucket", F.col(bucket_col).cast("int"))
    psi, ks = F.col("psi"), F.col(ks_col)
    return [
        verdict_frame(
            rows, run_id, c.constraint_id, "psi", psi, F.lit(c.psi_max),
            F.coalesce(psi <= c.psi_max, F.lit(False)),
        ),
        verdict_frame(
            rows, run_id, c.constraint_id, "ks", ks, F.lit(c.ks_max),
            F.coalesce(ks <= c.ks_max, F.lit(False)),
        ),
    ]


def violation_count_verdicts(
    violations: DataFrame,
    bucket_df: DataFrame,
    counted_ids: list[str],
    run_id: str,
) -> DataFrame:
    """(bucket × constraint) grid left-joined to the violation counts so
    zero-violation cells still emit a passing verdict — all
    DataFrame-side, no counts dict on the driver."""
    spark = violations.sparkSession
    cid_df = local_rows_df(
        spark, [(c,) for c in counted_ids], "constraint_id string"
    )
    vcounts = violations.groupBy("bucket", "constraint_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    grid = bucket_df.crossJoin(F.broadcast(cid_df))
    joined = grid.join(vcounts, ["bucket", "constraint_id"], "left")
    n = F.coalesce(F.col("cnt"), F.lit(0))
    return joined.select(
        F.lit(run_id).alias("run_id"),
        F.col("bucket").cast("int").alias("bucket"),
        "constraint_id",
        F.lit("violation_cnt").alias("metric"),
        n.cast("double").alias("observed"),
        F.lit(0.0).alias("threshold"),
        (n == 0).alias("passed"),
        n.cast("long").alias("violation_cnt"),
    )


def reconcile_violation_frame(
    diff: DataFrame, c, run_id: str, key_col: str, bucket_col: str
) -> DataFrame:
    """Shape one ReconcileCheck's ``snapshot_diff`` output into
    VIOLATION_SCHEMA rows. ``max_added_rate=None`` drops added rows —
    appends are normal growth, not violations. Shared by the one-shot
    runner and the streaming assembler so both emit identical reconcile
    violations."""
    if c.max_added_rate is None:
        diff = diff.filter(F.col("change") != "added")
    return diff.select(
        F.lit(run_id).alias("run_id"),
        F.col(bucket_col).cast("int").alias("bucket"),
        F.col(key_col).cast("string").alias("clip_id"),
        F.lit(c.constraint_id).alias("constraint_id"),
        F.concat(
            F.col("change"),
            F.when(
                F.col("changed_cols") != "",
                F.concat(F.lit(":"), F.col("changed_cols")),
            ).otherwise(F.lit("")),
        ).alias("observed"),
        F.lit("unchanged vs baseline snapshot").alias("expected"),
    )


def reconcile_rate_verdicts(
    violations: DataFrame,
    bucket_df: DataFrame,
    baseline: DataFrame,
    checks,
    run_id: str,
    bucket_col: str,
) -> list[DataFrame]:
    """Per-bucket removed/changed/(bounded added) RATE verdict frames for
    every ReconcileCheck: counts from the (cached) violations frame, the
    denominator from ONE tiny per-bucket baseline agg. A bucket present
    only in the baseline (fully removed from current) still gets verdict
    rows — the baseline's buckets are unioned into the grid. Shared by
    the one-shot runner and the streaming assembler so rate arithmetic
    is bit-identical between them."""
    bl_counts = baseline.groupBy(
        F.col(bucket_col).cast("int").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("_base_n"))
    rec_buckets = bucket_df.unionByName(bl_counts.select("bucket")).distinct()
    kind = F.split(F.col("observed"), ":").getItem(0)
    out: list[DataFrame] = []
    for c in checks:
        kc = (
            violations.filter(F.col("constraint_id") == c.constraint_id)
            .groupBy("bucket")
            .agg(
                F.sum((kind == "removed").cast("long")).alias("_rm"),
                F.sum((kind == "changed").cast("long")).alias("_ch"),
                F.sum((kind == "added").cast("long")).alias("_ad"),
            )
        )
        g = (
            rec_buckets.join(kc, "bucket", "left")
            .join(bl_counts, "bucket", "left")
            .select(
                "bucket",
                *[
                    F.coalesce(F.col(x), F.lit(0)).alias(x)
                    for x in ("_rm", "_ch", "_ad", "_base_n")
                ],
            )
        )
        bounded = [("removed_rate", "_rm", c.max_removed_rate),
                   ("changed_rate", "_ch", c.max_changed_rate)]
        if c.max_added_rate is not None:
            bounded.append(("added_rate", "_ad", c.max_added_rate))
        for metric, cnt_col, bound in bounded:
            # empty-baseline bucket: removed/changed are impossible
            # (cnt 0 → rate 0 passes); added with a bound but no
            # baseline denominator fails unless the bound is given —
            # try_divide NULL → coalesce to cnt>0 ? inf : 0
            rate = F.coalesce(
                F.try_divide(
                    F.col(cnt_col).cast("double"),
                    F.col("_base_n").cast("double"),
                ),
                F.when(F.col(cnt_col) > 0, F.lit(float("inf"))).otherwise(
                    F.lit(0.0)
                ),
            )
            out.append(
                verdict_frame(
                    g,
                    run_id,
                    c.constraint_id,
                    metric,
                    rate,
                    F.lit(float(bound)),
                    rate <= F.lit(float(bound)),
                    cnt=F.col(cnt_col),
                )
            )
    return out


def run_suite(
    current: DataFrame,
    baseline: DataFrame,
    dims: dict[str, DataFrame],
    suite: Suite,
    run_id: str,
    key_col: str = "clip_id",
    bucket_col: str = "bucket",
    checkpoint: CheckpointLedger | None = None,
    cache: bool = False,
    verbose: bool = False,
    salt_buckets: int | None = None,
    commit: bool = True,
    embeddings: DataFrame | None = None,
    eager_verdicts: bool = True,
    sketch_store=None,
) -> SuiteResult:
    """Run the full suite over ``current`` (minus already-committed buckets
    when resuming), emit verdicts + violations, commit the ledger.

    ``commit=False`` defers the ledger commit: callers that persist the
    result frames afterwards (run_suite.py) must call
    ``commit_checkpoint(result, checkpoint)`` AFTER the persist succeeds —
    otherwise a crash between validation and persistence marks buckets
    committed whose violations were never written, and --resume silently
    skips them forever.

    ``eager_verdicts`` (VERDICT r04 #3 — a knob, not a hardcode): True
    materializes each family's verdict frame sequentially
    (localCheckpoint) so families execute one job at a time — the shape a
    small-driver host needs (a lazy union runs every family's table scan
    concurrently and blew an 8g driver at the 8M-row materialize tier).
    False leaves the union lazy: one job, families' scans overlap — on a
    real cluster concurrent family scans are an executor-memory question
    and the lazy union recovers the overlapped wall-clock. Both paths
    emit bit-identical verdicts (pytest-pinned).

    ``sketch_store`` (optional catalog table, SnapshotTable/IcebergTable
    shape): persisted per-column global KLL sketches backing the equi-depth
    drift checks' bin edges. First run bootstraps (one baseline pass per
    equi-depth column, merge-upserted under the ``column`` key); later runs
    read KBs of sketch state instead of rescanning the baseline, and
    ``kll_merge`` can fold new baseline snapshots forward out-of-band."""
    t0 = time.time()
    _last = [t0]

    def _tick(label: str) -> None:
        now = time.time()
        if verbose:
            print(f"[suite] {label}: {now - _last[0]:.1f}s", flush=True)
        _last[0] = now

    spark = current.sparkSession

    skipped: list[int] = []
    if checkpoint is not None:
        skipped = checkpoint.committed_buckets(run_id)
        if skipped:
            current = current.filter(~F.col(bucket_col).isin(skipped))

    audio_base = row_check_base(current, suite)
    base = current
    if cache:  # opt-in only: helps tiny inputs, hurts at scale (see module doc)
        audio_base = audio_base.cache()
        base = audio_base

    # ONE aggregation job yields the bucket list, the row count, AND the
    # per-bucket HLL distinct estimates for bucket-key checks (bucket =
    # hash(key) % B ⇒ key duplicates co-locate ⇒ global distinct = Σ
    # per-bucket distinct for key_col ONLY — other columns get a global
    # sketch below) — and materializes the cache as a side effect.
    # HLL over the STRING-CAST key (injective for atomic types, so the
    # distinct count is unchanged) — the streaming suite stores keys
    # string-cast in its ids state and recomputes this screen from them,
    # and feeding HLL++ the same hash inputs keeps the two engines'
    # estimates bit-identical at EVERY cardinality, not just inside the
    # sparse-exact regime.
    hll_aggs = [
        F.approx_count_distinct(F.col(c.column).cast("string"), 0.02).alias(
            f"_hll_{i}"
        )
        for i, c in enumerate(suite.unique_checks)
    ]
    brows = base.groupBy(bucket_col).agg(
        F.count(F.lit(1)).alias("_n"), *hll_aggs
    ).collect()
    buckets = [r[bucket_col] for r in brows]
    row_count = sum(r["_n"] for r in brows)
    # Σ per-bucket distinct is exact ONLY for the bucket key itself
    # (bucket = hash(key_col) co-locates each key in one bucket); any other
    # column appears in every bucket and the sum would overcount by up to
    # ×n_buckets — those checks get a global sketch in one extra tiny agg
    non_key = [
        i for i, c in enumerate(suite.unique_checks) if c.column != key_col
    ]
    grow = (
        base.agg(
            *[
                F.approx_count_distinct(
                    F.col(suite.unique_checks[i].column).cast("string"), 0.02
                ).alias(f"_g_{i}")
                for i in non_key
            ]
        ).first()
        if non_key
        else None
    )
    hll_totals = [
        (
            sum(r[f"_hll_{i}"] for r in brows)
            if c.column == key_col
            else grow[f"_g_{i}"]
        )
        for i, c in enumerate(suite.unique_checks)
    ]
    _tick(f"materialize base ({row_count} rows)")
    if not buckets:  # everything committed already — idempotent no-op
        empty_ver = spark.createDataFrame([], VERDICT_SCHEMA)
        empty_vio = spark.createDataFrame([], VIOLATION_SCHEMA)
        return SuiteResult(run_id, empty_ver, empty_vio, [], skipped, 0, 0.0)

    violation_frames: list[DataFrame] = []
    # Verdicts are assembled as a UNION of per-family aggregate DataFrames
    # (VERDICT r03 next-round #7): driver memory no longer scales with
    # buckets × constraints. ``verdict_rows`` keeps only the handful of
    # scalar whole-table rows (HLL metric, ANN recall); the bucket-shaped
    # families build frames in ``verdict_frames``.
    verdict_frames: list[DataFrame] = []
    verdict_rows: list[tuple] = []
    stat_prof: DataFrame | None = None
    bucket_df = local_rows_df(
        spark, [(int(b),) for b in buckets], "bucket int"
    )

    # ---- row checks: one scan (with audio invariants), all predicates -----
    rc_viol = _row_check_violations(audio_base, suite, run_id, key_col, bucket_col)
    if rc_viol is not None:
        violation_frames.append(rc_viol)
    _tick("row checks (lazy)")

    # ---- uniqueness: HLL screen (recorded metric) + exact confirm ---------
    # The HLL estimate is recorded per run (the cheap observability signal,
    # and at 10^12 rows the early-exit for grossly-duplicated inputs), but
    # pass/fail truth always comes from the exact pass: HLL's relative error
    # (~2%) cannot certify uniqueness at realistic dup rates.
    for i, c in enumerate(suite.unique_checks):
        verdict_rows.append(
            (
                run_id,
                -1,  # whole-table metric, not per-bucket
                c.constraint_id,
                "hll_approx_distinct",
                float(hll_totals[i]),
                float(row_count),
                True,  # informational; exact pass decides
                0,
            )
        )
        # salt_buckets (opt-in, north_rule skew handling): the uniqueness
        # groupBy is the suite's one aggregation whose reduce key is the
        # DATA key — a degenerate hot clip_id pins one reducer there. The
        # other families are immune by construction: profile/drift group on
        # the bucket column with algebraic aggs, so map-side combine
        # collapses any hot key before the exchange.
        dup_rows = duplicate_rows(base, c.column, [bucket_col], salt_buckets).select(
            F.lit(run_id).alias("run_id"),
            F.col(bucket_col).cast("int").alias("bucket"),
            F.col(c.column).cast("string").alias("clip_id"),
            F.lit(c.constraint_id).alias("constraint_id"),
            F.concat(F.lit("dup_cnt="), F.col("dup_cnt")).alias("observed"),
            F.lit(f"unique {c.column}").alias("expected"),
        )
        violation_frames.append(dup_rows)
    _tick("uniqueness")

    # ---- referential integrity: broadcast anti-joins ----------------------
    for c in suite.ref_checks:
        dim = dims[c.dim_name]
        viol = referential_violations(
            base, c.column, dim, keep_cols=[key_col, bucket_col]
        ).select(
            F.lit(run_id).alias("run_id"),
            F.col(bucket_col).cast("int").alias("bucket"),
            F.col(key_col).alias("clip_id"),
            F.lit(c.constraint_id).alias("constraint_id"),
            F.col(c.column).cast("string").alias("observed"),
            F.lit(f"{c.column} in {c.dim_name}").alias("expected"),
        )
        violation_frames.append(viol)

    # ---- functional dependencies: algebraic two-stage agg ------------------
    # Resume semantics match uniqueness: on a bucket-filtered resume the FD
    # is evaluated over the remaining buckets' rows only (determinant-global
    # conflicts already caught in committed buckets were reported then).
    for c in suite.fd_checks:
        det = list(c.determinant)
        grp = fd_violations(base, det, c.dependent, carry_min=[key_col, bucket_col])
        viol = grp.select(
            F.lit(run_id).alias("run_id"),
            F.col(bucket_col).cast("int").alias("bucket"),
            F.col(key_col).cast("string").alias("clip_id"),
            F.lit(c.constraint_id).alias("constraint_id"),
            fd_observed(
                fd_det_repr(det),
                F.col("n_values"),
                F.col("n_rows"),
                F.col("dep_min"),
                F.col("dep_max"),
            ).alias("observed"),
            F.lit(
                f"{c.dependent} functionally determined by ({', '.join(det)})"
            ).alias("expected"),
        )
        violation_frames.append(viol)
    if suite.fd_checks:
        _tick("functional dependencies (lazy)")

    # ---- reconcile vs baseline: removed/changed (and bounded added) rows --
    # Both sides bucket-filtered on resume: bucket = hash(key) is identical
    # across snapshots, so per-bucket resume composes with the diff — a
    # committed bucket's reconcile rows were persisted by the run that
    # committed it.
    baseline_rec = (
        baseline.filter(~F.col(bucket_col).isin(skipped)) if skipped else baseline
    )
    for c in suite.reconcile_checks:
        diff = snapshot_diff(
            baseline_rec,
            current,
            [key_col],
            list(c.compare_cols),
            carry_cols=[bucket_col],
        )
        violation_frames.append(
            reconcile_violation_frame(diff, c, run_id, key_col, bucket_col)
        )

    # ---- materialize violations once, derive per-bucket counts ------------
    if violation_frames:
        violations = violation_frames[0]
        for vf in violation_frames[1:]:
            violations = violations.unionByName(vf)
    else:
        violations = spark.createDataFrame([], VIOLATION_SCHEMA)
    violations = violations.cache()
    # Force the cache NOW (the pre-r04 counts collect did this implicitly):
    # without it the violations scan becomes one more concurrent leg of the
    # final verdicts job, and running every family's scan in ONE job blew
    # the 8 GB driver heap at the 8M-row tier (GC overhead limit).
    violations.count()
    _tick("violations materialized")
    counted_ids = (
        [c.constraint_id for c in suite.row_checks]
        + [c.constraint_id for c in suite.unique_checks]
        + [c.constraint_id for c in suite.ref_checks]
        + [c.constraint_id for c in suite.fd_checks]
    )
    if counted_ids:
        verdict_frames.append(
            violation_count_verdicts(violations, bucket_df, counted_ids, run_id)
        )

    # ---- reconcile rate verdicts: counts from the CACHED violations frame -
    # (the diff join never runs twice), baseline sizes from one tiny
    # algebraic agg; rates per bucket vs the check's bounds. Reconcile ids
    # are deliberately NOT in counted_ids — pass/fail is the rate bound,
    # not zero-violations.
    if suite.reconcile_checks:
        verdict_frames.extend(
            reconcile_rate_verdicts(
                violations, bucket_df, baseline_rec,
                suite.reconcile_checks, run_id, bucket_col,
            )
        )
        _tick("reconcile verdicts (lazy)")

    # ---- stat checks: single-pass per-bucket column profile ---------------
    from pyanomalydetector2_spark.constraints.dsl import parse_percentile_stat

    pct_checks = [
        c for c in suite.stat_checks if parse_percentile_stat(c.stat) is not None
    ]
    moment_checks = [
        c for c in suite.stat_checks if parse_percentile_stat(c.stat) is None
    ]
    if moment_checks:
        stat_cols = sorted({c.column for c in moment_checks})
        # profile rows are O(buckets × columns); persisted so the per-check
        # verdict selects below don't recompute the scan — and they stay
        # DataFrame-side (no driver pmap)
        prof = column_profile(base, stat_cols, group_cols=[bucket_col]).persist()
        stat_prof = prof  # unpersisted after the verdict legs materialize
        _tick("stat profile (lazy)")
        verdict_frames.extend(
            stat_verdict_frames(prof, moment_checks, run_id, bucket_col)
        )
    if pct_checks:
        # percentile stats ride the mergeable KLL sketch — the SAME sketch
        # the streaming suite merges per micro-batch, so exact-regime
        # verdicts agree bit-for-bit between the two engines
        sk = percentile_sketches(
            base, sorted({c.column for c in pct_checks}), bucket_col
        )
        pframe = percentile_stat_frame(sk, pct_checks, bucket_df)
        verdict_frames.extend(
            stat_verdict_frames(pframe, pct_checks, run_id, "bucket")
        )
        _tick("percentile stat verdicts (lazy)")

    # ---- drift checks: ONE histogram pass per side for ALL uniform-bin ----
    # columns; equi-depth checks run per column (edges from the baseline's
    # quantile sketch)
    cat = [c for c in suite.drift_checks if c.categorical]
    numeric = [c for c in suite.drift_checks if not c.categorical]
    uniform = [c for c in numeric if not c.equi_depth and not c.distributed]
    equi = [c for c in numeric if c.equi_depth and not c.distributed]
    dist = [c for c in numeric if c.distributed]
    scored: list[tuple] = []  # (check, score dict)
    if uniform:
        specs = [HistSpec(c.column, c.lo, c.hi, c.nbins) for c in uniform]
        by_col = {c.column: c for c in uniform}
        for s in drift_scores_multi(base, baseline, specs, group_col=bucket_col):
            scored.append((by_col[s["column"]], s))
        # a check that produced NO score means the baseline histogram for
        # that column was empty/all-null — the same condition the
        # equi-depth and distributed paths raise on; silence here would
        # let a misconfigured baseline pass the whole suite
        seen_ids = {c.constraint_id for c, _ in scored}
        for c in uniform:
            if c.constraint_id not in seen_ids:
                raise ValueError(
                    f"drift check {c.constraint_id!r} produced no score — "
                    f"column {c.column!r} is empty/all-null in the baseline "
                    "or in every current bucket (fix the snapshot or drop "
                    "the check)"
                )
    def _equi_edges_map() -> dict[tuple[str, int], list[float] | None]:
        """Equi-depth edges from the persisted KLL store when one is wired
        (``sketch_store``): hit → KBs of sketch state replace the baseline
        percentile_approx rescan; miss → bootstrap so every later run is a
        hit. ALL missing columns bootstrap in ONE kll_build_multi pass —
        the Arrow transfer dominates a sketch build (BENCH §24), so E
        equi-depth columns must not pay E baseline scans. No store → all
        None (inline edge derivation, unchanged)."""
        wanted = [
            (c.column, c.nbins)
            for c in equi + [c for c in dist if c.equi_depth]
        ]
        edges_map: dict[tuple[str, int], list[float] | None] = {
            w: None for w in wanted
        }
        if sketch_store is None or not wanted:
            return edges_map
        from pyanomalydetector2_spark.operators.drift import (
            quantile_edges_from_sketch,
        )
        from pyanomalydetector2_spark.operators.kll import (
            SKETCH_FIELDS,
            kll_build_multi,
        )

        spark = baseline.sparkSession

        def _resolve() -> None:
            state = sketch_store.read(spark)
            for col, nbins in wanted:
                if edges_map[(col, nbins)]:
                    continue
                e = quantile_edges_from_sketch(
                    state.filter(F.col("column") == col).select(*SKETCH_FIELDS),
                    nbins,
                )
                if e:
                    edges_map[(col, nbins)] = e

        if sketch_store.current_snapshot() is not None:
            _resolve()
        missing = sorted({col for (col, _), e in edges_map.items() if not e})
        if missing:
            sk = kll_build_multi(baseline, missing, (), k=4096)
            sketch_store.merge_upsert(sk, keys=["column"])
            _resolve()
        return edges_map

    equi_edges_map = (
        _equi_edges_map()
        if (equi or any(c.equi_depth for c in dist))
        else {}
    )
    for c in equi:
        for s in drift_scores_quantile(
            base, baseline, c.column, c.nbins, group_col=bucket_col,
            edges=equi_edges_map[(c.column, c.nbins)],
        ):
            scored.append((c, s))
    def _drift_verdicts(frame: DataFrame, c, ks_col: str) -> None:
        verdict_frames.extend(
            drift_verdict_frames(frame, c, run_id, bucket_col, ks_col)
        )

    for c in dist:
        # no-histogram-collect path (high-cardinality bucket columns):
        # scores AND verdicts stay DataFrame-side
        from pyanomalydetector2_spark.operators.drift import (
            drift_scores_df,
            drift_scores_quantile_df,
        )

        frame = (
            drift_scores_quantile_df(
                base, baseline, c.column, c.nbins, group_col=bucket_col,
                edges=equi_edges_map[(c.column, c.nbins)],
            )
            if c.equi_depth
            else drift_scores_df(
                base, baseline, c.column, c.lo, c.hi, c.nbins, group_col=bucket_col
            )
        )
        _drift_verdicts(frame, c, "ks")
    for c in cat:
        # categorical: frequency-PSI + linf (reported in the ks verdict
        # slot — the order-free analog, bounded by ks_max). Always the
        # no-collect path.
        from pyanomalydetector2_spark.operators.drift import (
            drift_scores_categorical_df,
        )

        frame = drift_scores_categorical_df(
            base, baseline, c.column, group_col=bucket_col
        )
        _drift_verdicts(frame, c, "linf")
    if suite.drift_checks:
        _tick("drift (all columns)")
    for c, s in scored:
        b = int(s["group"])
        psi, ks = s["psi"], s["ks"]
        verdict_rows.append(
            (run_id, b, c.constraint_id, "psi", psi, c.psi_max, psi <= c.psi_max, 0)
        )
        verdict_rows.append(
            (run_id, b, c.constraint_id, "ks", ks, c.ks_max, ks <= c.ks_max, 0)
        )

    # ---- ANN recall audit (opt-in: needs an embeddings table) -------------
    # Corpus-level metric → bucket -1 (not a per-bucket verdict; excluded
    # from checkpoint commit marks, included in passed()).
    if suite.ann_checks:
        if embeddings is None:
            raise ValueError(
                "suite has ann_checks but run_suite received no embeddings "
                "table — pass embeddings=... (skipping an enabled check "
                "would vacuously pass the suite)"
            )
        from pyanomalydetector2_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
            lsh_bucketed_topk,
            recall_audit,
            sample_queries,
        )

        for c in suite.ann_checks:
            q = sample_queries(embeddings, c.n_queries)
            exact = brute_force_topk(embeddings, q, k=c.k)
            if c.method == "lsh":
                ann = lsh_bucketed_topk(
                    embeddings, q, dims=c.dims, k=c.k, planes=c.planes
                )
            elif c.method == "ivf":
                ann = ivf_topk(
                    embeddings, q, k=c.k, n_cells=c.n_cells, nprobe=c.nprobe
                )
            else:
                raise ValueError(f"unknown ann method {c.method!r}")
            row = recall_audit(ann, exact).agg(
                F.avg("recall").alias("r")
            ).first()
            mean_r = float(row["r"]) if row and row["r"] is not None else 0.0
            verdict_rows.append(
                (
                    run_id,
                    -1,
                    c.constraint_id,
                    f"recall_at_{c.k}",
                    mean_r,
                    c.min_recall,
                    mean_r >= c.min_recall,
                    0,
                )
            )
        _tick("ann recall audit")

    # Family verdict frames: eager (default) materializes each frame
    # sequentially via localCheckpoint — rows stay distributed, driver
    # memory independent of bucket count, families execute one job at a
    # time (the small-driver-safe shape). Lazy leaves one union job whose
    # family scans overlap — the cluster shape. See the docstring knob.
    verdicts = local_rows_df(spark, verdict_rows, VERDICT_SCHEMA)
    for vf in verdict_frames:
        verdicts = verdicts.unionByName(
            vf.localCheckpoint() if eager_verdicts else vf
        )
    verdicts = verdicts.cache()
    if stat_prof is not None and eager_verdicts:
        # its verdict legs are materialized above; under lazy verdicts the
        # legs still reference the persisted profile — keep the cache
        stat_prof.unpersist()

    if checkpoint is not None and commit:
        # per-bucket fail counts via ONE aggregation over the verdicts
        # frame — the driver holds O(buckets) ledger marks (the ledger is
        # per-bucket by design), never buckets × constraints
        per_bucket_fail = dict.fromkeys((int(b) for b in buckets), 0)
        for r in (
            verdicts.filter(~F.col("passed"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ):
            if int(r["bucket"]) in per_bucket_fail:
                per_bucket_fail[int(r["bucket"])] = int(r["cnt"])
        for b in buckets:
            checkpoint.mark_committed(
                run_id,
                int(b),
                metrics={
                    "rows": row_count,
                    "failed_constraints": per_bucket_fail[int(b)],
                },
            )

    return SuiteResult(
        run_id,
        verdicts,
        violations,
        sorted(int(b) for b in buckets),
        skipped,
        row_count,
        time.time() - t0,
        cached=(
            (verdicts,)
            if stat_prof is None or eager_verdicts
            else (verdicts, stat_prof)
        ),
    )


def commit_checkpoint(res: SuiteResult, checkpoint: CheckpointLedger) -> None:
    """Mark the result's processed buckets committed in the ledger — call
    this AFTER the verdicts/violations have been durably persisted (the
    write-ahead ordering --resume correctness depends on)."""
    fails = dict.fromkeys(res.processed_buckets, 0)
    for r in (
        res.verdicts.filter(~F.col("passed")).groupBy("bucket").count().collect()
    ):
        if int(r["bucket"]) in fails:
            fails[int(r["bucket"])] = int(r["count"])
    for b in res.processed_buckets:
        checkpoint.mark_committed(
            res.run_id,
            int(b),
            metrics={"rows": res.row_count, "failed_constraints": fails[b]},
        )
