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
from pyanomalydetector2_spark.operators.integrity import referential_violations
from pyanomalydetector2_spark.operators.stats import column_profile
from pyanomalydetector2_spark.operators.uniqueness import duplicate_rows
from pyanomalydetector2_spark.streaming.checkpoint import CheckpointLedger

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

    def passed(self) -> bool:
        return self.verdicts.filter(~F.col("passed")).isEmpty()


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
) -> SuiteResult:
    """Run the full suite over ``current`` (minus already-committed buckets
    when resuming), emit verdicts + violations, commit the ledger.

    ``commit=False`` defers the ledger commit: callers that persist the
    result frames afterwards (run_suite.py) must call
    ``commit_checkpoint(result, checkpoint)`` AFTER the persist succeeds —
    otherwise a crash between validation and persistence marks buckets
    committed whose violations were never written, and --resume silently
    skips them forever."""
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

    needs_audio = any(c.requires_audio for c in suite.row_checks)
    needs_container = any(
        getattr(c, "requires_container", False) for c in suite.row_checks
    )
    # row checks get the audio-invariant / container-meta columns; every
    # OTHER family reads the source directly so its scan prunes down to
    # its own columns. Container meta attaches FIRST (it reads bytes);
    # the audio-invariant projection then drops bytes as before.
    audio_base = current
    if needs_container:
        from pyanomalydetector2_spark.operators.multimodal import (
            with_container_meta,
        )

        audio_base = with_container_meta(audio_base)
    if needs_audio:
        audio_base = with_audio_invariants(audio_base)
    elif needs_container and not any(
        "bytes" in c.predicate or "bytes" in c.observed
        for c in suite.row_checks
    ):
        # prune bytes out of the row-check projection — but never out from
        # under a row check whose own expression references it
        audio_base = audio_base.drop("bytes")
    base = current
    if cache:  # opt-in only: helps tiny inputs, hurts at scale (see module doc)
        audio_base = audio_base.cache()
        base = audio_base

    # ONE aggregation job yields the bucket list, the row count, AND the
    # per-bucket HLL distinct estimates for bucket-key checks (bucket =
    # hash(key) % B ⇒ key duplicates co-locate ⇒ global distinct = Σ
    # per-bucket distinct for key_col ONLY — other columns get a global
    # sketch below) — and materializes the cache as a side effect.
    hll_aggs = [
        F.approx_count_distinct(c.column, 0.02).alias(f"_hll_{i}")
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
                    suite.unique_checks[i].column, 0.02
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
    verdict_rows: list[tuple] = []  # assembled driver-side from tiny frames

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

    # ---- materialize violations once, derive per-bucket counts ------------
    if violation_frames:
        violations = violation_frames[0]
        for vf in violation_frames[1:]:
            violations = violations.unionByName(vf)
    else:
        violations = spark.createDataFrame([], VIOLATION_SCHEMA)
    violations = violations.cache()
    counts = {
        (r["bucket"], r["constraint_id"]): r["cnt"]
        for r in violations.groupBy("bucket", "constraint_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    _tick("violations materialized + counted")
    counted_ids = (
        [c.constraint_id for c in suite.row_checks]
        + [c.constraint_id for c in suite.unique_checks]
        + [c.constraint_id for c in suite.ref_checks]
    )
    for cid in counted_ids:
        for b in buckets:
            n = counts.get((b, cid), 0)
            verdict_rows.append(
                (run_id, int(b), cid, "violation_cnt", float(n), 0.0, n == 0, n)
            )

    # ---- stat checks: single-pass per-bucket column profile ---------------
    if suite.stat_checks:
        stat_cols = sorted({c.column for c in suite.stat_checks})
        prof = column_profile(base, stat_cols, group_cols=[bucket_col])
        pmap = {
            (r[bucket_col], r["column"]): r.asDict() for r in prof.collect()
        }
        _tick("stat profile")
        for c in suite.stat_checks:
            for b in buckets:
                row = pmap.get((b, c.column))
                val = float(row[c.stat]) if row and row[c.stat] is not None else float("nan")
                ok = row is not None and c.passes(val)
                verdict_rows.append(
                    (
                        run_id,
                        int(b),
                        c.constraint_id,
                        f"{c.column}.{c.stat}",
                        val,
                        float(c.threshold),
                        bool(ok),
                        0,
                    )
                )

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
    for c in equi:
        for s in drift_scores_quantile(
            base, baseline, c.column, c.nbins, group_col=bucket_col
        ):
            scored.append((c, s))
    for c in dist:
        # no-histogram-collect path (high-cardinality bucket columns): only
        # the per-bucket scores ever reach the driver
        from pyanomalydetector2_spark.operators.drift import (
            drift_scores_df,
            drift_scores_quantile_df,
        )

        frame = (
            drift_scores_quantile_df(
                base, baseline, c.column, c.nbins, group_col=bucket_col
            )
            if c.equi_depth
            else drift_scores_df(
                base, baseline, c.column, c.lo, c.hi, c.nbins, group_col=bucket_col
            )
        )
        for r in frame.collect():
            if r["psi"] is None or r["ks"] is None:
                # empty/all-null baseline: base_n is NULL through the whole
                # algebra — same explicit error as the equi-depth paths
                raise ValueError(
                    f"drift baseline for column {c.column!r} is empty or "
                    "all-null — cannot score distributed drift (fix the "
                    "baseline snapshot)"
                )
            scored.append(
                (c, {"group": r[bucket_col], "psi": r["psi"], "ks": r["ks"]})
            )
    for c in cat:
        # categorical: frequency-PSI + linf (reported in the ks verdict
        # slot — the order-free analog, bounded by ks_max). Always the
        # no-collect path; scores are O(buckets) rows.
        from pyanomalydetector2_spark.operators.drift import (
            drift_scores_categorical_df,
        )

        frame = drift_scores_categorical_df(
            base, baseline, c.column, group_col=bucket_col
        )
        for r in frame.collect():
            scored.append(
                (c, {"group": r[bucket_col], "psi": r["psi"], "ks": r["linf"]})
            )
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

    verdicts = spark.createDataFrame(verdict_rows, VERDICT_SCHEMA)

    if checkpoint is not None and commit:
        per_bucket_fail = {
            b: sum(
                1
                for v in verdict_rows
                if v[1] == b and not v[6]
            )
            for b in buckets
        }
        for b in buckets:
            checkpoint.mark_committed(
                run_id,
                int(b),
                metrics={
                    "rows": row_count,
                    "failed_constraints": per_bucket_fail[b],
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
