"""Constraint suggestion: profile a table once, propose the checks it
currently satisfies (the Deequ `ConstraintSuggestionRunner` idea).

A validation engine that only RUNS checks leaves the hardest step manual:
writing the first suite for a 10^12-row table nobody fully knows. This
module closes the loop — profile → suggested constraints → ``Suite`` —
so the suggested suite is green on the profiled snapshot by construction
and future snapshots are validated against today's observed invariants.

Suggestion kinds (all decided by EXACT aggregates, so a SQL replay of the
same stats emits the identical set):

- ``not_null``    — the column had zero NULLs;
- ``unique``      — exact distinct count == row count (and zero NULLs);
- ``range``       — numeric column: observed [min, max] envelope;
- ``non_negative``— numeric column whose observed min is ≥ 0;
- ``domain``      — string column with ≤ ``max_domain`` exact distinct
  values: the sorted value set, '|'-joined.

Scale shape: three jobs total, none per-column —

1. ``stats.column_profile`` (ONE scan: counts, null counts, min/max,
   moments, HLL distinct for every column);
2. one exact-distinct aggregation (``count(DISTINCT c)`` per column in a
   single agg — Spark's expand multiplies the scan by |columns|, the same
   cost Deequ pays; ``distinct_mode="prefilter"`` uses pass 1's HLL to
   rule columns out first, so only near-unique / small-domain columns
   reach the exact pass — HLL's ±2 % error cannot misclassify against the
   50 % slack used, so the emitted set is unchanged, pytest-pinned);
3. one value aggregation for the domain columns that qualified
   (``sort_array(collect_set(c))`` — map-side combine keeps the set at
   ≤ max_domain entries per partition, KBs at any row count).

The per-column stat rows themselves (|columns| rows) are a bounded driver
funnel, same convention as the suite's verdict assembly.

Reference analog: none — the reference's thresholds are operator-supplied
config (``detectors/detector.py`` lambda/min-support parameters); this is
the missing bootstrap that derives them from the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyanomalydetector2_spark.constraints.dsl import (
    RowCheck,
    StatCheck,
    Suite,
    UniqueCheck,
)
from pyanomalydetector2_spark.operators.stats import column_profile
from pyanomalydetector2_spark.functions import local_rows_df

SUGGESTION_SCHEMA = (
    "column string, kind string, lo double, hi double, domain string"
)

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

# prefilter slack: HLL (approx_count_distinct default rsd 5 %) must only
# EXCLUDE columns, never admit a wrong one — the exact pass re-decides
# every admitted column, so slack only trades a wasted exact aggregate
# against a missed suggestion; 0.5 is ~10 sigma past the sketch's rsd
_PREFILTER_SLACK = 0.5


def suggest_constraints(
    df: DataFrame,
    columns: Sequence[str],
    max_domain: int = 20,
    distinct_mode: str = "exact",
) -> DataFrame:
    """One suggestion row per constraint the snapshot satisfies:
    (column, kind, lo, hi, domain) — lo/hi populated for range /
    non_negative (hi NULL for the latter), domain for domain rows.

    ``distinct_mode``: "exact" always runs the exact-distinct aggregation
    over every column; "prefilter" consults the profile's HLL first and
    sends only plausibly-unique / plausibly-small-domain columns to the
    exact pass (the 10^12-row mode).

    A domain whose values contain the '|' join separator cannot round-trip
    through the domain string — that suggestion is dropped (pytest-pinned)
    rather than silently corrupted into a wrong IN-list."""
    if distinct_mode not in ("exact", "prefilter"):
        raise ValueError(f"unknown distinct_mode {distinct_mode!r}")
    spark = df.sparkSession
    # three sequential aggregation passes (profile, exact distinct,
    # domain sets) each do their map-side work on the scan partitions: a
    # tiny/single-split snapshot would run all three single-core. Spread
    # it once; a real-scale table (splits ≥ slots) makes this a no-op.
    from pyanomalydetector2_spark.functions import rebalance_for_expansion

    df = rebalance_for_expansion(df, min_bytes=1_000_000)
    dtypes = dict(df.dtypes)
    fields = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in columns if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    prof = {
        r["column"]: r
        for r in column_profile(df, list(columns)).collect()
    }

    # -- pass 2: exact distinct counts (one agg; expand, not per-column
    # jobs). prefilter mode uses HLL to skip columns that provably need
    # no exact decision.
    def _needs_exact(c: str) -> bool:
        if distinct_mode == "exact":
            return True
        r = prof[c]
        approx, total = r["approx_distinct"], r["row_cnt"]
        near_unique = (
            r["null_cnt"] == 0
            and approx >= (1.0 - _PREFILTER_SLACK) * total
        )
        small_domain = isinstance(
            fields[c], T.StringType
        ) and approx <= max_domain * (1.0 + _PREFILTER_SLACK)
        return near_unique or small_domain

    exact_cols = [c for c in columns if _needs_exact(c)]
    exact_distinct: dict[str, int] = {}
    if exact_cols:
        row = df.agg(
            *[
                F.countDistinct(F.col(c)).alias(c)
                for c in exact_cols
            ]
        ).collect()[0]
        exact_distinct = {c: row[c] for c in exact_cols}

    # -- pass 3: value sets for the string columns whose exact distinct
    # count qualified
    domain_cols = [
        c
        for c in columns
        if isinstance(fields[c], T.StringType)
        and exact_distinct.get(c, max_domain + 1) <= max_domain
    ]
    domains: dict[str, str] = {}
    if domain_cols:
        # the raw value array rides next to the join so a value containing
        # the '|' separator (which suite_from_suggestions splits on) can be
        # detected and the unrepresentable suggestion DROPPED rather than
        # silently corrupted into a wrong IN-list
        row = df.agg(
            *[
                F.struct(
                    F.array_join(
                        F.sort_array(F.collect_set(F.col(c))), "|"
                    ).alias("joined"),
                    F.sort_array(F.collect_set(F.col(c))).alias("vals"),
                ).alias(c)
                for c in domain_cols
            ]
        ).collect()[0]
        domains = {
            c: row[c]["joined"]
            for c in domain_cols
            if not any("|" in v for v in row[c]["vals"])
        }

    out: list[tuple] = []
    for c in columns:
        r = prof[c]
        numeric = isinstance(fields[c], _NUMERIC)
        if r["null_cnt"] == 0:
            out.append((c, "not_null", None, None, None))
        if (
            r["null_cnt"] == 0
            and exact_distinct.get(c) == r["row_cnt"]
            and r["row_cnt"] > 0
        ):
            out.append((c, "unique", None, None, None))
        if numeric and r["cnt"] > 0:
            lo, hi = float(r["min"]), float(r["max"])
            out.append((c, "range", lo, hi, None))
            if lo >= 0:
                out.append((c, "non_negative", lo, None, None))
        if c in domains:
            out.append((c, "domain", None, None, domains[c]))
    return local_rows_df(spark, out, SUGGESTION_SCHEMA)


def _sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


def suite_from_suggestions(suggestions: DataFrame) -> Suite:
    """Materialize suggestion rows into a runnable ``Suite`` — by
    construction green on the snapshot that produced them (pytest-pinned):

    - not_null → RowCheck ``c IS NOT NULL``;
    - unique → UniqueCheck (two-stage HLL screen → exact salted count,
      the suite's existing machinery);
    - range → StatChecks ``min(c) >= lo`` and ``max(c) <= hi``;
    - non_negative → StatCheck ``min(c) >= 0`` (kept alongside range:
      survives a future legitimate envelope widening);
    - domain → RowCheck ``c IS NULL OR c IN (...)`` (null-ness is
      not_null's job, so the domain check judges only present values)."""
    rows: list[RowCheck] = []
    stats: list[StatCheck] = []
    uniques: list[UniqueCheck] = []
    for r in suggestions.collect():
        c, kind = r["column"], r["kind"]
        if kind == "not_null":
            rows.append(
                RowCheck(
                    constraint_id=f"{c}_not_null",
                    predicate=f"{c} IS NOT NULL",
                    observed=f"coalesce(cast({c} AS STRING), 'NULL')",
                    expected="value present",
                )
            )
        elif kind == "unique":
            uniques.append(UniqueCheck(f"{c}_unique", c))
        elif kind == "range":
            stats.append(
                StatCheck(f"{c}_min", c, "min", ">=", float(r["lo"]))
            )
            stats.append(
                StatCheck(f"{c}_max", c, "max", "<=", float(r["hi"]))
            )
        elif kind == "non_negative":
            stats.append(
                StatCheck(f"{c}_non_negative", c, "min", ">=", 0.0)
            )
        elif kind == "domain":
            vals = ", ".join(
                _sql_str(v) for v in r["domain"].split("|")
            )
            rows.append(
                RowCheck(
                    constraint_id=f"{c}_domain",
                    predicate=f"{c} IS NULL OR {c} IN ({vals})",
                    observed=f"coalesce(cast({c} AS STRING), 'NULL')",
                    expected=f"one of {r['domain']}",
                )
            )
        else:
            raise ValueError(f"unknown suggestion kind {kind!r}")
    return Suite(
        row_checks=tuple(rows),
        stat_checks=tuple(stats),
        unique_checks=tuple(uniques),
    )
