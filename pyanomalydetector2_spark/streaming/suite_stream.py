"""Streaming constraint validation: the batch suite's semantics over a
Structured Streaming drain, with per-micro-batch incremental state.

The batch runner (constraints/suite.py) makes one pass per check family
over the full table. At 10^12 rows with continuous arrival, re-validating
the corpus per delivery is not an option — but every family the default
clips suite uses is **algebraically mergeable**, so the stream keeps
per-batch partial state and the one-shot result is reproducible at any
time without touching a single already-processed row:

- row / referential checks are stateless per row → violation rows append;
- column stats keep (row_cnt, cnt, null_cnt, min, max, sum, sqr_sum) per
  (bucket, column) — counts/sums add, min/max combine
  (stats.column_profile_partial; same closed-form mean/std finalize as
  the one-shot profile);
- percentile StatChecks ("p95" etc.) keep one KLL sketch row per
  (column, bucket) per batch (operators/kll.py — weight-conserving merge
  is exact state algebra); sketches merge at drain/compaction and the
  nearest-rank quantile is finalized once, sharing the batch runner's
  percentile_stat_frame so pXX has ONE definition;
- numeric drift keeps integer histogram-bin counts, categorical drift
  keeps category counts — exactly additive, so merged counts score
  bit-identically to the one-shot pass (drift.histogram_counts_df /
  categorical_counts share the scoring arithmetic);
- uniqueness keeps per-(bucket, key) counts — additive; the HLL screen
  estimate recomputed over the stored (string-cast) key set equals the
  batch estimate bit-for-bit because the batch runner hashes the SAME
  string cast — identical HLL++ inputs at every cardinality;
- functional dependencies keep per-(check, determinant, dependent) pair
  counts with min key/bucket exemplars — additive; the n_values > 1
  group decision over merged pairs is exact. Values cross the shared
  state schema STRINGIFIED (same policy as the ids component): exact for
  atomic types (Spark's numeric→string casts are injective), with the
  min/max conflict witnesses becoming lexicographic, and composite
  determinants whose values contain ',' can collide in the group label —
  use the batch suite for those;
- reconcile checks keep per-(check, key, compare-tuple, bucket) row
  counts — additive, and exactly the information ``snapshot_diff``'s
  full-outer join consumes. At drain time the current snapshot is
  reconstructed from the merged counts (multiplicity replayed by
  exploding each count) and diffed against the static baseline with the
  batch runner's own operator + the SHARED violation/rate-verdict
  helpers, so added/removed/changed rows — including duplicate-key join
  multiplicity — are byte-identical to the one-shot run. Compare values
  cross the state schema STRINGIFIED like the other components: exact
  for atomic types, with two documented seams — Spark's typed compare
  treats -0.0 == 0.0 and array/struct compare columns have no injective
  string form; use the batch suite for those.

- equi-depth drift streams too, via the persisted KLL sketch store
  (operators/kll.py): bin edges are resolved ONCE from the baseline's
  sketch state and PINNED in the state dir (``equi_edges.json``) so every
  batch's edge-binned counts — and the drain's baseline binning — share
  one meaning across restarts; from there it is the same exactly-additive
  integer-count state as uniform drift.

Checks that are NOT mergeable are rejected up front
(``ensure_streamable``): ANN recall audits, distributed-mode drift (drain
scoring is the driver funnel over merged counts), StatChecks on the raw
``quantiles``/``approx_distinct`` profile outputs (use pXX percentile
stats, which stream exactly) — a silently-wrong streaming verdict would
be worse than an error.

State layout (streaming/state.py delta-dir pattern, shared with the
audio-ingest index): each component writes ``<comp>/batch=N`` parquet
deltas; a ``commit/batch=N.json`` marker (with per-batch lineage metrics:
rows, buckets, wall) lands LAST, so a torn batch is invisible to readers
and Structured Streaming's redelivery overwrites it idempotently —
exactly-once state without a transactional store. ``compact_suite_state``
folds committed deltas into a ``gen=N`` base (additive merge for counts,
plain concat for violations) so read cost stays flat over thousands of
micro-batches; the fold reads only COMMITTED batch ids, which closes the
torn-batch-orphan-delta hazard (ADVICE r04) by construction.

Reference analog: the incremental trends_stats maintenance
(trends_stats.py:24-60 — per-epoch moment upsert) generalized to every
check family; resumability mirrors the reference's per-run checkpoint
(detect_anomalies.py:49-77) at micro-batch granularity.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanomalydetector2_spark.constraints.dsl import Suite, parse_percentile_stat
from pyanomalydetector2_spark.constraints.suite import (
    VIOLATION_SCHEMA,
    VERDICT_SCHEMA,
    SuiteResult,
    _row_check_violations,
    drift_verdict_frames,
    reconcile_rate_verdicts,
    reconcile_violation_frame,
    row_check_base,
    stat_verdict_frames,
    violation_count_verdicts,
)
from pyanomalydetector2_spark.operators.drift import (
    HistSpec,
    binned_counts_edges,
    drift_scores_categorical_from_counts,
    hist_rows_to_arrays,
    histogram_counts,
    histogram_counts_df,
    categorical_counts,
    psi_ks,
)
from pyanomalydetector2_spark.operators.integrity import referential_violations
from pyanomalydetector2_spark.operators.stats import (
    column_profile_partial,
    finalize_profile_partial,
    merge_profile_partials,
)
from pyanomalydetector2_spark.functions import local_rows_df
from pyanomalydetector2_spark.streaming.state import batch_dirs, latest_gen

_MERGEABLE_STATS = {
    "row_cnt", "cnt", "null_cnt", "null_rate", "min", "max", "sum",
    "sqr_sum", "mean", "std",
}

_BUCKETS_SCHEMA = "bucket int, n long"
_PROFILE_SCHEMA = (
    "bucket int, column string, row_cnt long, cnt long, null_cnt long, "
    "min double, max double, sum double, sqr_sum double"
)
_HIST_SCHEMA = "g int, c string, b int, n long"
_EHIST_SCHEMA = "cid string, g int, b int, n long"
_KSKETCH_SCHEMA = (
    "column string, bucket int, kll_k int, kll_n long, "
    "kll_levels array<array<double>>, kll_compactions array<int>"
)
_CATS_SCHEMA = "column string, bucket int, cat string, cur_cat_n long"
_IDS_SCHEMA = "column string, bucket int, key string, cnt long"
_FDPAIRS_SCHEMA = "cid string, det string, dep string, cnt long, k string, b int"
_RECON_SCHEMA = "cid string, key string, vals array<string>, b int, cnt long"


def ensure_streamable(suite: Suite) -> None:
    """Reject checks whose state cannot be maintained from mergeable
    scalars — erroring beats a silently-wrong streaming verdict."""
    if suite.ann_checks:
        raise ValueError(
            "streaming suite: AnnChecks are not streamable (recall audits "
            "need the full embedding corpus per run) — run them in the "
            "batch suite"
        )
    for c in suite.drift_checks:
        if c.distributed:
            raise ValueError(
                f"streaming suite: drift check {c.constraint_id!r} uses "
                "distributed mode — streaming drain scoring is the driver "
                "funnel over merged counts; use uniform/equi-depth/"
                "categorical drift"
            )
    uni_cols = [
        c.column
        for c in suite.drift_checks
        if not c.categorical and not c.equi_depth
    ]
    dup_cols = sorted({c for c in uni_cols if uni_cols.count(c) > 1})
    if dup_cols:
        raise ValueError(
            "streaming suite: multiple uniform drift checks share "
            f"column(s) {dup_cols} — the hist state is keyed by column, so "
            "their differently-binned counts would merge and one check "
            "would silently lose its verdicts; use distinct columns or the "
            "equi-depth/categorical variants (keyed by check id)"
        )
    for c in suite.stat_checks:
        if c.stat not in _MERGEABLE_STATS and parse_percentile_stat(c.stat) is None:
            raise ValueError(
                f"streaming suite: stat check {c.constraint_id!r} uses "
                f"sketch-backed stat {c.stat!r} which is not mergeable "
                "from per-batch scalars (percentiles ARE streamable as "
                "'p<NN>' — per-batch KLL sketch partials merge exactly)"
            )


def _committed(state_dir: str) -> list[int]:
    cdir = f"{state_dir}/commit"
    if not os.path.isdir(cdir):
        return []
    return sorted(
        int(f[len("batch="):-len(".json")])
        for f in os.listdir(cdir)
        if f.startswith("batch=") and f.endswith(".json")
    )


def batch_metrics(state_dir: str) -> list[dict]:
    """Per-batch lineage/metrics rows (rows, buckets, wall, finish time) —
    the stream's observability surface, written with the commit marker."""
    out = []
    for n in _committed(state_dir):
        with open(f"{state_dir}/commit/batch={n}.json") as f:
            out.append(json.load(f))
    return out


def _component_state(
    state_dir: str, comp: str, committed: set[int]
) -> tuple[int, list[str], list[int]]:
    """Resolve one component's readable state: ``(folded_thru, paths,
    missing)``. ``paths`` is the compacted base (if any) plus every
    COMMITTED delta strictly after it; ``missing`` lists committed batch
    ids after the base with NO delta — i.e. checks of this family were
    added after those batches were processed. ONE resolver shared by the
    drain read, the coverage guard, and compaction, so the base/delta
    interaction (which once let compaction defeat the coverage guard) is
    decided in exactly one place."""
    base = latest_gen(f"{state_dir}/{comp}_base")
    folded_thru = base[0] if base else -1
    deltas = [
        (n, d)
        for n, d in batch_dirs(f"{state_dir}/{comp}")
        if n > folded_thru and n in committed
    ]
    have = {n for n, _ in deltas}
    missing = sorted(n for n in committed if n > folded_thru and n not in have)
    paths = ([base[1]] if base else []) + [d for _, d in deltas]
    return folded_thru, paths, missing


def _require_component_coverage(state_dir: str, comp: str) -> None:
    """A component the suite needs must have a delta (or be inside the
    folded base) for EVERY committed batch. A committed batch with no delta
    means checks of this family were ADDED after that batch was processed —
    merged state would silently exclude its rows, and a silently-partial
    verdict is the engine's stated nightmare. Erroring sends the operator
    to a fresh state dir (or a batch backfill). ``compact_suite_state``
    refuses to fold an uncovered component, so compaction can never launder
    the gap into the base."""
    _, _, missing = _component_state(state_dir, comp, set(_committed(state_dir)))
    if missing:
        raise ValueError(
            f"streaming state at {state_dir}: component {comp!r} has no "
            f"delta for committed batch(es) {missing} — checks of this "
            "family were added after those batches were processed; use a "
            "fresh state dir (merged state would silently exclude them)"
        )


def _suite_state_signature(
    suite: Suite, key_col: str, bucket_col: str
) -> dict:
    """The suite's STATE-AFFECTING shape, per component: which check ids /
    columns / bin definitions each component's per-batch deltas were built
    from. Thresholds (StatCheck.threshold, drift psi_max/ks_max, reconcile
    rates) are drain-time arithmetic and deliberately NOT part of the
    signature — they may change freely across a stream's life."""
    sig: dict = {"key_col": key_col, "bucket_col": bucket_col}
    vio = [
        ["row", c.constraint_id, c.predicate] for c in suite.row_checks
    ] + [
        ["ref", c.constraint_id, c.column, c.dim_name]
        for c in suite.ref_checks
    ]
    if vio:
        sig["violations"] = sorted(vio)
    mom = sorted(
        {
            c.column
            for c in suite.stat_checks
            if parse_percentile_stat(c.stat) is None
        }
    )
    if mom:
        sig["profile"] = mom
    pct = sorted(
        {
            c.column
            for c in suite.stat_checks
            if parse_percentile_stat(c.stat) is not None
        }
    )
    if pct:
        sig["ksketch"] = pct
    uni = sorted(
        [s.column, float(s.lo), float(s.hi), int(s.nbins)]
        for s in _uniform_specs(suite)
    )
    if uni:
        sig["hist"] = uni
    eq = sorted([c.constraint_id, c.column] for c in _equi_checks(suite))
    if eq:
        sig["ehist"] = eq
    cats = sorted({c.column for c in suite.drift_checks if c.categorical})
    if cats:
        sig["cats"] = cats
    ids = sorted({c.column for c in suite.unique_checks})
    if ids:
        sig["ids"] = ids
    fd = sorted(
        [c.constraint_id, list(c.determinant), c.dependent]
        for c in suite.fd_checks
    )
    if fd:
        sig["fdpairs"] = fd
    rec = sorted(
        [c.constraint_id, list(c.compare_cols)]
        for c in suite.reconcile_checks
    )
    if rec:
        sig["recon"] = rec
    return sig


def _pin_suite_manifest(
    state_dir: str, suite: Suite, key_col: str, bucket_col: str
) -> None:
    """Pin the suite's state signature in the state dir and fail closed on
    any later change. The component-level coverage guard only catches a
    check family that is entirely NEW (its component has no deltas for old
    batches); a check added to an EXISTING family — a second UniqueCheck
    column, a new RowCheck id, another percentile column — leaves every
    component covered while its merged state silently excludes all earlier
    batches' rows. The manifest closes that hole: while any batch is
    committed, the suite's state-shaping definitions must be EXACTLY the
    pinned ones (thresholds excluded — see _suite_state_signature)."""
    sig = _suite_state_signature(suite, key_col, bucket_col)
    path = f"{state_dir}/suite_manifest.json"
    if not _committed(state_dir):
        # nothing processed yet — (re)pin freely
        os.makedirs(state_dir, exist_ok=True)
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(sig, f, indent=1, sort_keys=True)
        os.replace(tmp, path)
        return
    if not os.path.exists(path):
        raise ValueError(
            f"streaming state at {state_dir} has committed batches but no "
            "suite manifest — the state predates per-check pinning or was "
            "written outside this module; use a fresh state dir"
        )
    with open(path) as f:
        pinned = json.load(f)
    if pinned != sig:
        changed = sorted(
            set(pinned) ^ set(sig)
            | {k for k in set(pinned) & set(sig) if pinned[k] != sig[k]}
        )
        raise ValueError(
            f"streaming state at {state_dir}: suite state signature changed "
            f"for component(s) {changed} — checks of this component were "
            "added after batches were committed (or removed/redefined), so "
            f"merged state would silently misreport them (pinned in {path}; "
            "thresholds may change freely, state-shaping definitions may "
            "not) — use a fresh state dir"
        )


def _needed_components(suite: Suite) -> list[str]:
    """Which state components this suite's drain will read."""
    needed = ["buckets"]
    if suite.row_checks or suite.ref_checks:
        needed.append("violations")
    if suite.unique_checks:
        needed.append("ids")
    if suite.fd_checks:
        needed.append("fdpairs")
    if suite.reconcile_checks:
        needed.append("recon")
    if any(parse_percentile_stat(c.stat) is None for c in suite.stat_checks):
        needed.append("profile")
    if any(parse_percentile_stat(c.stat) is not None for c in suite.stat_checks):
        needed.append("ksketch")
    if _uniform_specs(suite):
        needed.append("hist")
    if _equi_checks(suite):
        needed.append("ehist")
    if any(c.categorical for c in suite.drift_checks):
        needed.append("cats")
    return needed


def _read_component(
    spark: SparkSession, state_dir: str, comp: str, schema: str
) -> DataFrame:
    """Read a component's compacted base (if any) plus every COMMITTED
    delta after it. Uncommitted (torn) deltas are invisible. The schema is
    PINNED on the read: a delta whose frame was empty can plan to zero
    part files under AQE (dir holds only _SUCCESS), and an inferring read
    over such dirs dies with UNABLE_TO_INFER_SCHEMA instead of producing
    the documented empty-state verdicts."""
    _, paths, _ = _component_state(state_dir, comp, set(_committed(state_dir)))
    if paths:
        return spark.read.schema(schema).parquet(*paths)
    return spark.createDataFrame([], schema)


def _uniform_specs(suite: Suite) -> list[HistSpec]:
    return [
        HistSpec(c.column, c.lo, c.hi, c.nbins)
        for c in suite.drift_checks
        if not c.categorical and not c.equi_depth
    ]


def _equi_checks(suite: Suite):
    return [c for c in suite.drift_checks if c.equi_depth and not c.categorical]


def resolve_equi_edges(
    spark: SparkSession,
    state_dir: str,
    suite: Suite,
    sketch_store=None,
) -> dict[str, dict]:
    """Resolve the equi-depth drift checks' bin edges ONCE per stream and
    pin them in the state dir (``equi_edges.json``, atomic write): every
    batch's edge-binned counts and the drain's baseline binning MUST use the
    same edges, across process restarts and sketch-store compactions, or
    merged bins would mix meanings. Edges come from the persisted KLL sketch
    store (operators/kll.py — bootstrap it with a batch run_suite(
    sketch_store=...) or an offline kll_build over the baseline); a stream
    has no baseline frame to rescan, which is exactly the point."""
    eq = _equi_checks(suite)
    if not eq:
        return {}
    path = f"{state_dir}/equi_edges.json"
    if os.path.exists(path):
        with open(path) as f:
            stored = json.load(f)
        missing = [c.constraint_id for c in eq if c.constraint_id not in stored]
        if missing:
            raise ValueError(
                f"streaming state at {state_dir} has pinned equi-depth edges "
                f"but not for check(s) {missing} — new equi-depth checks "
                "cannot join a stream mid-flight (their earlier batches were "
                "never binned); start a fresh state dir"
            )
        return stored
    if sketch_store is None:
        raise ValueError(
            "equi-depth drift in the streaming suite needs a sketch_store "
            "(persisted per-column KLL baseline state, operators/kll.py) — "
            "bootstrap it via the batch suite's run_suite(sketch_store=...) "
            "or an offline kll_build over the baseline snapshot"
        )
    if sketch_store.current_snapshot() is None:
        raise ValueError(
            "equi-depth drift: the sketch_store is empty — bootstrap it "
            "from the baseline snapshot first"
        )
    from pyanomalydetector2_spark.operators.drift import (
        quantile_edges_from_sketch,
    )
    from pyanomalydetector2_spark.operators.kll import SKETCH_FIELDS

    state = sketch_store.read(spark)
    out: dict[str, dict] = {}
    for c in eq:
        edges = quantile_edges_from_sketch(
            state.filter(F.col("column") == c.column).select(*SKETCH_FIELDS),
            c.nbins,
        )
        if not edges:
            raise ValueError(
                f"equi-depth drift check {c.constraint_id!r}: the sketch "
                f"store has no state for column {c.column!r}"
            )
        out[c.constraint_id] = {"column": c.column, "edges": edges}
    os.makedirs(state_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out, f)
    os.replace(tmp, path)
    return out


def process_suite_batch(
    batch: DataFrame,
    batch_id: int,
    state_dir: str,
    suite: Suite,
    dims: dict[str, DataFrame] | None,
    run_id: str,
    key_col: str = "clip_id",
    bucket_col: str = "bucket",
    equi_edges: dict[str, dict] | None = None,
) -> None:
    """Validate one micro-batch and append its partial state. Idempotent
    per batch id: a redelivered batch overwrites its own deltas; the
    commit marker lands last, so a crash mid-batch leaves no visible
    state."""
    marker = f"{state_dir}/commit/batch={batch_id}.json"
    if os.path.exists(marker):
        return  # redelivery of a fully committed batch — no-op
    _pin_suite_manifest(state_dir, suite, key_col, bucket_col)
    t0 = time.time()
    spark = batch.sparkSession

    # Build every component frame lazily, then run ALL the writes as
    # CONCURRENT Spark jobs: each component reads its own column-pruned
    # slice of the batch, so the jobs don't contend on anything but
    # executor slots, and the per-batch wall is max(job) not sum(job) —
    # the knob that keeps small-micro-batch fixed cost flat. (The audio
    # decode pass, when present, rides ONLY the violations job.)
    writes: list[tuple[str, DataFrame]] = []

    # row + referential violations (stateless per row → append)
    vio_frames = []
    rc = _row_check_violations(
        row_check_base(batch, suite), suite, run_id, key_col, bucket_col
    )
    if rc is not None:
        vio_frames.append(rc)
    for c in suite.ref_checks:
        dim = (dims or {})[c.dim_name]
        vio_frames.append(
            referential_violations(
                batch, c.column, dim, keep_cols=[key_col, bucket_col]
            ).select(
                F.lit(run_id).alias("run_id"),
                F.col(bucket_col).cast("int").alias("bucket"),
                F.col(key_col).alias("clip_id"),
                F.lit(c.constraint_id).alias("constraint_id"),
                F.col(c.column).cast("string").alias("observed"),
                F.lit(f"{c.column} in {c.dim_name}").alias("expected"),
            )
        )
    if vio_frames:
        vio = vio_frames[0]
        for vf in vio_frames[1:]:
            vio = vio.unionByName(vf)
        writes.append((f"{state_dir}/violations/batch={batch_id}", vio))

    # mergeable stat partials
    mom_stat_cols = sorted(
        {
            c.column
            for c in suite.stat_checks
            if parse_percentile_stat(c.stat) is None
        }
    )
    if mom_stat_cols:
        writes.append(
            (
                f"{state_dir}/profile/batch={batch_id}",
                column_profile_partial(
                    batch, mom_stat_cols, group_cols=[bucket_col]
                )
                .withColumn("bucket", F.col(bucket_col).cast("int"))
                .select(
                    "bucket", "column", "row_cnt", "cnt", "null_cnt",
                    "min", "max", "sum", "sqr_sum",
                ),
            )
        )

    # percentile stat partials: per-(column, bucket) KLL sketch rows — the
    # sketch merge is exact state algebra (operators/kll.py), the quantile
    # itself is finalized once at drain time
    pct_cols = sorted(
        {
            c.column
            for c in suite.stat_checks
            if parse_percentile_stat(c.stat) is not None
        }
    )
    if pct_cols:
        from pyanomalydetector2_spark.constraints.suite import (
            percentile_sketches,
        )

        writes.append(
            (
                f"{state_dir}/ksketch/batch={batch_id}",
                percentile_sketches(batch, pct_cols, bucket_col),
            )
        )

    # drift histogram / category counts (integer → exactly additive)
    specs = _uniform_specs(suite)
    if specs:
        writes.append(
            (
                f"{state_dir}/hist/batch={batch_id}",
                histogram_counts_df(batch, specs, group_col=bucket_col),
            )
        )
    # equi-depth drift: edge-binned counts with the stream's PINNED edges
    # (resolve_equi_edges) — integer counts, exactly additive like the
    # uniform histograms
    if equi_edges:
        frames = [
            binned_counts_edges(
                batch, meta["column"], [float(e) for e in meta["edges"]],
                bucket_col,
            ).select(
                F.lit(cid).alias("cid"),
                F.col(bucket_col).cast("int").alias("g"),
                F.col("bin").cast("int").alias("b"),
                F.col("n").cast("long").alias("n"),
            )
            for cid, meta in sorted(equi_edges.items())
        ]
        eh = frames[0]
        for f2 in frames[1:]:
            eh = eh.unionByName(f2)
        writes.append((f"{state_dir}/ehist/batch={batch_id}", eh))

    cat_checks = [c for c in suite.drift_checks if c.categorical]
    if cat_checks:
        frames = [
            categorical_counts(batch, c.column, bucket_col).select(
                F.lit(c.column).alias("column"),
                F.col(bucket_col).cast("int").alias("bucket"),
                "cat",
                "cur_cat_n",
            )
            for c in cat_checks
        ]
        cats = frames[0]
        for f2 in frames[1:]:
            cats = cats.unionByName(f2)
        writes.append((f"{state_dir}/cats/batch={batch_id}", cats))

    # uniqueness key counts (cast to string at the shared-schema boundary;
    # the HLL screen re-runs on these keys and the default clips key is
    # already a string)
    if suite.unique_checks:
        frames = [
            batch.groupBy(
                F.col(bucket_col).cast("int").alias("bucket"),
                F.col(c.column).cast("string").alias("key"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(F.lit(c.column).alias("column"), "bucket", "key", "cnt")
            for c in suite.unique_checks
        ]
        ids = frames[0]
        for f2 in frames[1:]:
            ids = ids.unionByName(f2)
        writes.append((f"{state_dir}/ids/batch={batch_id}", ids))

    # FD pair counts: (check, determinant repr, dependent) → additive cnt
    # plus min key/bucket exemplars. Values are STRINGIFIED at the shared-
    # schema boundary (same policy as the ids component): the n_values>1
    # decision is exact for atomic types (Spark's numeric→string casts are
    # injective); only the min/max conflict WITNESSES become lexicographic.
    if suite.fd_checks:
        from pyanomalydetector2_spark.operators.integrity import fd_det_repr

        frames = [
            batch.groupBy(
                fd_det_repr(list(c.determinant)).alias("det"),
                F.col(c.dependent).cast("string").alias("dep"),
            )
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min(F.col(key_col).cast("string")).alias("k"),
                F.min(F.col(bucket_col).cast("int")).alias("b"),
            )
            .select(F.lit(c.constraint_id).alias("cid"), "det", "dep", "cnt", "k", "b")
            for c in suite.fd_checks
        ]
        fd = frames[0]
        for f2 in frames[1:]:
            fd = fd.unionByName(f2)
        writes.append((f"{state_dir}/fdpairs/batch={batch_id}", fd))

    # reconcile row counts: (check, key, STRINGIFIED compare tuple, bucket)
    # → additive cnt — exactly what snapshot_diff's full-outer join needs,
    # including duplicate-key multiplicity (replayed at drain time by
    # exploding the merged count)
    if suite.reconcile_checks:
        frames = [
            batch.groupBy(
                F.col(key_col).cast("string").alias("key"),
                F.array(
                    *[F.col(x).cast("string") for x in c.compare_cols]
                ).alias("vals"),
                F.col(bucket_col).cast("int").alias("b"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(
                F.lit(c.constraint_id).alias("cid"), "key", "vals", "b", "cnt"
            )
            for c in suite.reconcile_checks
        ]
        rec = frames[0]
        for f2 in frames[1:]:
            rec = rec.unionByName(f2)
        writes.append((f"{state_dir}/recon/batch={batch_id}", rec))

    from concurrent.futures import ThreadPoolExecutor

    def _write(path: str, df: DataFrame) -> None:
        # conform to the component's DECLARED schema before writing: the
        # drain and compaction read with that schema pinned (empty deltas
        # have no footer to infer from), and parquet's vectorized reader
        # refuses width mismatches like an INT64 file column under an int
        # pinned type — writes and reads must share one source of truth
        comp = os.path.relpath(path, state_dir).split(os.sep)[0]
        sch = _component_schema(comp)
        if sch is not None:
            target = spark.createDataFrame([], sch).schema
            df = df.select(
                *[F.col(f.name).cast(f.dataType) for f in target.fields]
            )
        df.write.mode("overwrite").parquet(path)

    def _bucket_counts() -> list:
        return (
            batch.groupBy(bucket_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )

    with ThreadPoolExecutor(max_workers=len(writes) + 1) as ex:
        fut_counts = ex.submit(_bucket_counts)
        futs = [ex.submit(_write, p, df) for p, df in writes]
        brows = fut_counts.result()
        for f in futs:
            f.result()
    rows = sum(r["n"] for r in brows)
    # Arrow-backed local frame: the classic list createDataFrame pickles
    # the rows, so this 8-row write paid a ~4 s Python-worker launch per
    # BATCH (functions.local_rows_df docstring has the measurement)
    local_rows_df(
        spark, [(int(r[bucket_col]), int(r["n"])) for r in brows],
        _BUCKETS_SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{state_dir}/buckets/batch={batch_id}"
    )

    # commit marker LAST — with the batch's lineage metrics
    os.makedirs(f"{state_dir}/commit", exist_ok=True)
    tmp = f"{marker}.tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "batch": int(batch_id),
                "rows": int(rows),
                "buckets": len(brows),
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.time(),
            },
            f,
        )
    os.replace(tmp, marker)


def run_suite_stream(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    suite: Suite,
    dims: dict[str, DataFrame] | None,
    run_id: str,
    schema: str,
    key_col: str = "clip_id",
    bucket_col: str = "bucket",
    max_files_per_trigger: int = 1,
    shuffle_partitions: int | None = None,
    sketch_store=None,
) -> None:
    """Drain everything currently in ``source_dir`` through the validator
    (Trigger.AvailableNow), micro-batch by micro-batch. Re-invoking after
    new files arrive resumes from the stream checkpoint — already-
    validated files are never re-read, and ``streaming_suite_result``
    reflects all committed batches at any point."""
    ensure_streamable(suite)
    equi_edges = resolve_equi_edges(spark, state_dir, suite, sketch_store)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))

    def process(b: DataFrame, i: int) -> None:
        process_suite_batch(
            b, i, state_dir, suite, dims, run_id,
            key_col=key_col, bucket_col=bucket_col, equi_edges=equi_edges,
        )

    try:
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", f"{state_dir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def streaming_suite_result(
    spark: SparkSession,
    state_dir: str,
    suite: Suite,
    baseline: DataFrame | None,
    run_id: str,
    key_col: str = "clip_id",
    bucket_col: str = "bucket",
    with_verdicts: bool = True,
) -> SuiteResult:
    """Assemble the suite verdict over everything committed so far — the
    same VERDICT/VIOLATION frames the one-shot runner emits over the union
    of all processed batches, computed purely from merged state (no source
    re-scan). Equality with the batch runner is pytest-pinned.

    ``with_verdicts=False`` (optimization r06, the streaming analog of the
    batch runner's ``eager_verdicts`` knob): skip verdict assembly — the
    stat/KLL merges and the uniform/equi/categorical drift driver funnels
    — and return ``verdicts`` as an EMPTY frame; the violations frame is
    computed exactly as before. For consumers that read only violations
    (the violation sink of an ops pipeline), the drift/stat funnels are
    pure overhead per drain; re-assemble with the default to get verdicts
    from the same state."""
    ensure_streamable(suite)
    # fail closed on a suite that changed shape mid-stream: the manifest
    # pins per-check state signatures (catches additions WITHIN a family),
    # and every component this drain reads must cover every committed
    # batch (catches a family that is entirely new, or legacy state dirs
    # without a manifest)
    _pin_suite_manifest(state_dir, suite, key_col, bucket_col)
    for comp in _needed_components(suite):
        _require_component_coverage(state_dir, comp)
    t0 = time.time()

    # the baseline frame is scanned once per reconcile check (snapshot
    # diff + rate verdicts) and once per uniform/equi/categorical drift
    # check below - when it is a DERIVED frame (the contract's 10^6-row
    # arithmetic projection over events) every reference re-executes the
    # derivation. Materialize it once; values are unchanged (guide 7.2:
    # duplicated subtrees).
    if baseline is not None:
        baseline = baseline.localCheckpoint()

    bcounts = _read_component(spark, state_dir, "buckets", _BUCKETS_SCHEMA)
    brows = bcounts.groupBy("bucket").agg(F.sum("n").alias("n")).collect()
    buckets = [int(r["bucket"]) for r in brows]
    row_count = int(sum(r["n"] for r in brows))
    if not buckets:
        return SuiteResult(
            run_id,
            spark.createDataFrame([], VERDICT_SCHEMA),
            spark.createDataFrame([], VIOLATION_SCHEMA),
            [], [], 0, 0.0,
        )
    bucket_df = local_rows_df(spark, [(b,) for b in buckets], "bucket int")

    # ---- violations: stored row/ref deltas + uniqueness from merged ids --
    violations = _read_component(
        spark, state_dir, "violations", VIOLATION_SCHEMA
    )
    ids_all = _read_component(spark, state_dir, "ids", _IDS_SCHEMA)
    merged_ids = (
        ids_all.groupBy("column", "bucket", "key")
        .agg(F.sum("cnt").alias("cnt"))
        if suite.unique_checks
        else None
    )
    if merged_ids is not None:
        merged_ids = merged_ids.cache()
    verdict_rows: list[tuple] = []
    hll_frames: list[DataFrame] = []
    for c in suite.unique_checks:
        col_ids = merged_ids.filter(F.col("column") == c.column)
        # HLL screen recomputed over the stored key set — identical to the
        # batch estimate: keys cross the state schema string-cast
        # (injective for atomic types), and the batch runner hashes the
        # SAME string cast (constraints/suite.py hll_aggs), so both sides
        # feed HLL++ identical hash inputs at every cardinality. The
        # bucket-key column sums per-bucket estimates; others get a global
        # sketch — same split as the batch runner. Built LAZILY as a 1-row
        # verdict frame (not a collected scalar): assembling the result
        # no longer runs an eager HLL job per unique check — consumers
        # that never force the verdicts frame never pay for the estimate.
        if c.column == key_col:
            est_df = (
                col_ids.groupBy("bucket")
                .agg(F.approx_count_distinct("key", 0.02).alias("ad"))
                .agg(F.sum("ad").alias("est"))
            )
        else:
            est_df = col_ids.agg(
                F.approx_count_distinct("key", 0.02).alias("est")
            )
        hll_frames.append(
            est_df.select(
                F.lit(run_id).alias("run_id"),
                F.lit(-1).cast("int").alias("bucket"),
                F.lit(c.constraint_id).alias("constraint_id"),
                F.lit("hll_approx_distinct").alias("metric"),
                F.coalesce(F.col("est").cast("double"), F.lit(0.0)).alias(
                    "observed"
                ),
                F.lit(float(row_count)).alias("threshold"),
                F.lit(True).alias("passed"),
                F.lit(0).cast("long").alias("violation_cnt"),
            )
        )
        # exact violations: one row PER PARTICIPATING ROW of a duplicated
        # key — the batch runner's duplicate_rows multiset, reproduced by
        # exploding the merged per-(bucket, key) count. The dup decision
        # groups by KEY ONLY (matching exact_duplicates): a key duplicated
        # ACROSS buckets is still a duplicate, and observed carries the
        # key's TOTAL count while each row keeps its own bucket.
        totals = col_ids.groupBy("key").agg(
            F.sum("cnt").alias("dup_cnt")
        ).filter(F.col("dup_cnt") > 1)
        # plain equi-join, NOT a forced broadcast: the duplicated-key set
        # is data-proportional (a few % dup rate at 10^12 rows is billions
        # of keys), so the driver must never be required to hold it; AQE
        # still broadcasts when the actual total is small
        dup = (
            col_ids.join(totals, "key", "inner")
            .select(
                F.lit(run_id).alias("run_id"),
                F.col("bucket").cast("int").alias("bucket"),
                F.col("key").alias("clip_id"),
                F.lit(c.constraint_id).alias("constraint_id"),
                F.concat(F.lit("dup_cnt="), F.col("dup_cnt")).alias(
                    "observed"
                ),
                F.lit(f"unique {c.column}").alias("expected"),
                F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("_i"),
            )
            .drop("_i")
        )
        violations = violations.unionByName(dup)

    # ---- FD violations from merged pair counts ----------------------------
    if suite.fd_checks:
        from pyanomalydetector2_spark.operators.integrity import fd_observed

        merged_fd = (
            _read_component(spark, state_dir, "fdpairs", _FDPAIRS_SCHEMA)
            .groupBy("cid", "det", "dep")
            .agg(
                F.sum("cnt").alias("cnt"),
                F.min("k").alias("k"),
                F.min("b").alias("b"),
            )
            .groupBy("cid", "det")
            .agg(
                F.count(F.lit(1)).alias("n_values"),
                F.sum("cnt").alias("n_rows"),
                F.min("dep").alias("dep_min"),
                F.max("dep").alias("dep_max"),
                F.min("k").alias("k"),
                F.min("b").alias("b"),
            )
            .filter(F.col("n_values") > 1)
        )
        expected_by_cid = {
            c.constraint_id: (
                f"{c.dependent} functionally determined by "
                f"({', '.join(c.determinant)})"
            )
            for c in suite.fd_checks
        }
        expected = F.lit(None).cast("string")
        for cid, text in expected_by_cid.items():
            expected = F.when(F.col("cid") == cid, F.lit(text)).otherwise(
                expected
            )
        fd_viol = merged_fd.select(
            F.lit(run_id).alias("run_id"),
            F.col("b").cast("int").alias("bucket"),
            F.col("k").alias("clip_id"),
            F.col("cid").alias("constraint_id"),
            fd_observed(
                F.col("det"),
                F.col("n_values"),
                F.col("n_rows"),
                F.col("dep_min"),
                F.col("dep_max"),
            ).alias("observed"),
            expected.alias("expected"),
        )
        violations = violations.unionByName(fd_viol)

    # ---- reconcile violations: reconstruct the current snapshot from ------
    # merged (key, compare-tuple, bucket) counts — multiplicity replayed by
    # exploding each count — then run the batch runner's OWN snapshot_diff
    # against the string-cast baseline. String casts are injective for
    # atomic types, so the null-safe compares match the typed batch diff.
    if suite.reconcile_checks:
        if baseline is None:
            raise ValueError(
                "streaming suite has reconcile checks but no baseline "
                "frame was provided"
            )
        from pyanomalydetector2_spark.operators.reconcile import snapshot_diff

        recon = _read_component(spark, state_dir, "recon", _RECON_SCHEMA)
        for c in suite.reconcile_checks:
            cols = list(c.compare_cols)
            merged_rec = (
                recon.filter(F.col("cid") == c.constraint_id)
                .groupBy("key", "vals", "b")
                .agg(F.sum("cnt").alias("cnt"))
            )
            cur_re = merged_rec.select(
                F.col("key").alias(key_col),
                *[F.col("vals").getItem(i).alias(x) for i, x in enumerate(cols)],
                F.col("b").alias("bucket"),
                F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("_i"),
            ).drop("_i")
            base_cast = baseline.select(
                F.col(key_col).cast("string").alias(key_col),
                *[F.col(x).cast("string").alias(x) for x in cols],
                F.col(bucket_col).cast("int").alias("bucket"),
            )
            diff = snapshot_diff(
                base_cast, cur_re, [key_col], cols, carry_cols=["bucket"]
            )
            violations = violations.unionByName(
                reconcile_violation_frame(diff, c, run_id, key_col, "bucket")
            )
    violations = violations.cache()
    violations.count()

    if not with_verdicts:
        if merged_ids is not None:
            merged_ids.unpersist()
        return SuiteResult(
            run_id,
            spark.createDataFrame([], VERDICT_SCHEMA),
            violations,
            sorted(buckets),
            [],
            row_count,
            time.time() - t0,
        )

    verdict_frames: list[DataFrame] = list(hll_frames)
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

    # ---- reconcile rate verdicts: the SHARED helper over the cached ------
    # violations frame — identical rate arithmetic to the batch runner
    if suite.reconcile_checks:
        verdict_frames.extend(
            reconcile_rate_verdicts(
                violations, bucket_df, baseline,
                suite.reconcile_checks, run_id, bucket_col,
            )
        )

    # ---- stat verdicts from merged partials ------------------------------
    mom_checks = [
        c for c in suite.stat_checks if parse_percentile_stat(c.stat) is None
    ]
    pct_checks = [
        c for c in suite.stat_checks if parse_percentile_stat(c.stat) is not None
    ]
    if mom_checks:
        prof = finalize_profile_partial(
            merge_profile_partials(
                _read_component(spark, state_dir, "profile", _PROFILE_SCHEMA),
                group_cols=["bucket"],
            )
        )
        verdict_frames.extend(
            stat_verdict_frames(prof, mom_checks, run_id, "bucket")
        )
    if pct_checks:
        from pyanomalydetector2_spark.constraints.suite import (
            percentile_stat_frame,
        )
        from pyanomalydetector2_spark.operators.kll import kll_merge_rows

        merged_sk = kll_merge_rows(
            _read_component(spark, state_dir, "ksketch", _KSKETCH_SCHEMA),
            ["column", "bucket"],
        )
        verdict_frames.extend(
            stat_verdict_frames(
                percentile_stat_frame(merged_sk, pct_checks, bucket_df),
                pct_checks, run_id, "bucket",
            )
        )

    # ---- uniform drift: merged integer bins → identical psi/ks -----------
    specs = _uniform_specs(suite)
    if specs:
        if baseline is None:
            raise ValueError(
                "streaming suite has drift checks but no baseline frame "
                "was provided"
            )
        merged = (
            _read_component(spark, state_dir, "hist", _HIST_SCHEMA)
            .groupBy("g", "c", "b")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        cur_h = hist_rows_to_arrays(merged, specs)
        base_h = histogram_counts(baseline, specs, None)
        by_col = {s.column: s for s in specs}
        checks = {
            c.column: c
            for c in suite.drift_checks
            if not c.categorical and not c.equi_depth
        }
        for s in specs:
            if (None, s.column) not in base_h:
                raise ValueError(
                    f"drift baseline for column {s.column!r} is empty or "
                    "all-null — no histogram to compare against (fix the "
                    "baseline snapshot)"
                )
        seen = set()
        for (g, col), counts in sorted(
            cur_h.items(), key=lambda kv: (str(kv[0][0]), kv[0][1])
        ):
            psi, ks = psi_ks(counts, base_h[(None, col)])
            c = checks[col]
            seen.add(c.constraint_id)
            verdict_rows.append(
                (run_id, int(g), c.constraint_id, "psi", psi, c.psi_max,
                 psi <= c.psi_max, 0)
            )
            verdict_rows.append(
                (run_id, int(g), c.constraint_id, "ks", ks, c.ks_max,
                 ks <= c.ks_max, 0)
            )
        for c in checks.values():
            if c.constraint_id not in seen:
                raise ValueError(
                    f"drift check {c.constraint_id!r} produced no score — "
                    f"column {c.column!r} is empty/all-null in the baseline "
                    "or in every current bucket (fix the snapshot or drop "
                    "the check)"
                )

    # ---- equi-depth drift: merged edge-binned counts vs the baseline ------
    # binned with the SAME pinned edges — integer counts, so scores are
    # bit-identical to a one-shot pass using those edges
    eq_checks = _equi_checks(suite)
    if eq_checks:
        import numpy as np

        if baseline is None:
            raise ValueError(
                "streaming suite has drift checks but no baseline frame "
                "was provided"
            )
        stored = resolve_equi_edges(spark, state_dir, suite, None)
        merged_eq = (
            _read_component(spark, state_dir, "ehist", _EHIST_SCHEMA)
            .groupBy("cid", "g", "b")
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        by_cid: dict[str, dict[int, dict[int, int]]] = {}
        for r in merged_eq:
            by_cid.setdefault(r["cid"], {}).setdefault(int(r["g"]), {})[
                int(r["b"])
            ] = int(r["n"])
        for c in eq_checks:
            edges = [float(e) for e in stored[c.constraint_id]["edges"]]
            nb = len(edges) + 1
            base_arr = np.zeros(nb)
            for r in binned_counts_edges(baseline, c.column, edges, None).collect():
                base_arr[int(r["bin"])] = int(r["n"])
            if base_arr.sum() == 0:
                raise ValueError(
                    f"drift baseline for column {c.column!r} is empty or "
                    "all-null — no histogram to compare against (fix the "
                    "baseline snapshot)"
                )
            groups = by_cid.get(c.constraint_id, {})
            if not groups:
                raise ValueError(
                    f"drift check {c.constraint_id!r} produced no score — "
                    f"column {c.column!r} is empty/all-null in every "
                    "processed batch (fix the stream or drop the check)"
                )
            for g in sorted(groups):
                arr = np.zeros(nb)
                for b, n in groups[g].items():
                    arr[b] = n
                psi, ks = psi_ks(arr, base_arr)
                verdict_rows.append(
                    (run_id, int(g), c.constraint_id, "psi", psi, c.psi_max,
                     psi <= c.psi_max, 0)
                )
                verdict_rows.append(
                    (run_id, int(g), c.constraint_id, "ks", ks, c.ks_max,
                     ks <= c.ks_max, 0)
                )

    # ---- categorical drift from merged category counts -------------------
    cat_checks = [c for c in suite.drift_checks if c.categorical]
    if cat_checks:
        if baseline is None:
            raise ValueError(
                "streaming suite has drift checks but no baseline frame "
                "was provided"
            )
        cats = _read_component(spark, state_dir, "cats", _CATS_SCHEMA)
        for c in cat_checks:
            cur_cnt = (
                cats.filter(F.col("column") == c.column)
                .groupBy("bucket", "cat")
                .agg(F.sum("cur_cat_n").alias("cur_cat_n"))
            )
            frame = drift_scores_categorical_from_counts(
                cur_cnt, baseline, c.column, group_col="bucket"
            )
            verdict_frames.extend(
                drift_verdict_frames(frame, c, run_id, "bucket", "linf")
            )

    verdicts = local_rows_df(spark, verdict_rows, VERDICT_SCHEMA)
    for vf in verdict_frames:
        verdicts = verdicts.unionByName(vf)
    verdicts = verdicts.cache()
    if merged_ids is not None:
        merged_ids.unpersist()

    return SuiteResult(
        run_id,
        verdicts,
        violations,
        sorted(buckets),
        [],
        row_count,
        time.time() - t0,
    )


# ---------------------------------------------------------------------------
# state maintenance


_ADDITIVE: dict[str, tuple[str, list[str], dict[str, str]]] = {
    # comp -> (schema, group keys, {col: agg})
    "buckets": (_BUCKETS_SCHEMA, ["bucket"], {"n": "sum"}),
    "profile": (
        _PROFILE_SCHEMA,
        ["bucket", "column"],
        {
            "row_cnt": "sum", "cnt": "sum", "null_cnt": "sum",
            "min": "min", "max": "max", "sum": "sum", "sqr_sum": "sum",
        },
    ),
    "hist": (_HIST_SCHEMA, ["g", "c", "b"], {"n": "sum"}),
    "ehist": (_EHIST_SCHEMA, ["cid", "g", "b"], {"n": "sum"}),
    "cats": (_CATS_SCHEMA, ["column", "bucket", "cat"], {"cur_cat_n": "sum"}),
    "ids": (_IDS_SCHEMA, ["column", "bucket", "key"], {"cnt": "sum"}),
    "fdpairs": (
        _FDPAIRS_SCHEMA,
        ["cid", "det", "dep"],
        {"cnt": "sum", "k": "min", "b": "min"},
    ),
    "recon": (
        _RECON_SCHEMA,
        ["cid", "key", "vals", "b"],
        {"cnt": "sum"},
    ),
}


def _component_schema(comp: str):
    """The declared (pinned) schema for a state component, or None for
    components with their own explicit write schema (buckets)."""
    if comp == "violations":
        return VIOLATION_SCHEMA
    if comp == "ksketch":
        return _KSKETCH_SCHEMA
    if comp in _ADDITIVE:
        return _ADDITIVE[comp][0]
    return None


def compact_suite_state(spark: SparkSession, state_dir: str) -> int:
    """Fold all COMMITTED deltas of every component into a new compacted
    generation (additive merge for count state, plain concat for the
    violation log), keyed on the newest committed batch id. Only committed
    ids are folded — an uncommitted (torn) trailing batch keeps its
    deltas for the stream's redelivery, closing the orphan-delta hazard.
    Returns the new generation id, or -1 if there was nothing to fold."""
    committed = _committed(state_dir)
    if not committed:
        return -1
    gen_id = committed[-1]
    comps = list(_ADDITIVE) + ["violations", "ksketch"]
    for comp in comps:
        folded_thru, paths, missing = _component_state(
            state_dir, comp, set(committed)
        )
        if missing:
            # this component does NOT cover every committed batch (its
            # check family was added mid-stream). Folding it would stamp
            # the base with gen_id and LAUNDER the gap past the drain's
            # coverage guard — leave its deltas untouched so
            # _require_component_coverage still fails closed.
            continue
        if not paths or folded_thru == gen_id:
            continue
        # schema pinned for the same reason as _read_component: an all-
        # empty delta dir has no part files to infer from
        df = spark.read.schema(_component_schema(comp)).parquet(*paths)
        if comp in _ADDITIVE:
            _, keys, aggs = _ADDITIVE[comp]
            df = df.groupBy(*keys).agg(
                *[getattr(F, fn)(c).alias(c) for c, fn in aggs.items()]
            )
        elif comp == "ksketch":
            # sketch state folds via the KLL merge, not a scalar agg
            from pyanomalydetector2_spark.operators.kll import kll_merge_rows

            df = kll_merge_rows(df, ["column", "bucket"])
        out = f"{state_dir}/{comp}_base/gen={gen_id}"
        df.write.mode("overwrite").parquet(out)
        # parquet write emits _SUCCESS; latest_gen only trusts dirs that
        # have it, so an interrupted fold is invisible
    return gen_id


def vacuum_suite_state(state_dir: str) -> list[str]:
    """Delete delta dirs already folded into each component's newest
    complete generation. Safe any time: readers resolve base + deltas
    strictly AFTER the base's id."""
    import shutil

    removed = []
    for comp in list(_ADDITIVE) + ["violations", "ksketch"]:
        base = latest_gen(f"{state_dir}/{comp}_base")
        if base is None:
            continue
        for n, d in batch_dirs(f"{state_dir}/{comp}"):
            if n <= base[0]:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
    return removed
