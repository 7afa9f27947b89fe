"""As-of (most-recent-match) join — a custom operator Spark's DataFrame API
lacks natively.

The reference engine never needs one (its per-item Python loops walk both
series in step, e.g. detector.py:290-298 / utils.py fit loops); at cluster
scale the two standard encodings both fail:

- a range join (``probe.ts >= build.ts`` + window-max) explodes to
  O(|probe| x |build|) per key before the filter, and
- a per-key ``collect_list`` + UDF caps each key at driver/executor memory.

This is the union + running-last encoding instead: tag each side, union by
name, and take ``last(build_payload, ignorenulls=True)`` over a running
window ordered by (ts, side). Cost is ONE shuffle on the key and a
per-partition sort — identical shape to any other window aggregate, so it
scales exactly as far as the key partitioning does (skewed keys hurt the
same way they hurt every window; salt upstream if a key is hot). There is
no join operator in the plan at all.

Tie semantics match DuckDB's ``ASOF JOIN`` (the oracle used by the
contract query): a build row at exactly probe.ts DOES match (build side
sorts before probe at equal ts). Build rows must be unique per
(key, build_ts) — pre-aggregate otherwise — because among tied build rows
``last`` is order-nondeterministic; pass ``build_order`` tiebreak columns
when duplicates are legitimate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.types import TimestampType, TimestampNTZType

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAYLOAD = "__asof_build"
_MATCH_TS = "__matched_ts"


def _ordering_expr(df: DataFrame, ts_col: str):
    """Timestamps order by exact integer microseconds (no float rounding —
    the contract oracle compares in epoch_us). NTZ columns diff against an
    NTZ epoch literal: tz-independent, naive-as-UTC — exactly DuckDB's
    ``epoch_us`` convention. Numerics order as-is."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        )
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(ts_col))
    return F.col(ts_col)


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str | Sequence[str],
    probe_ts: str = "ts",
    build_ts: str = "ts",
    build_cols: Sequence[str] | None = None,
    tolerance_us: int | None = None,
    build_order: Sequence[str] = (),
    suffix: str = "_b",
) -> DataFrame:
    """Left as-of join: every probe row, plus the payload of the latest
    build row with ``build.ts <= probe.ts`` on the same key (or nulls).

    tolerance_us: if set, a nearest match older than this many microseconds
    (or plain ts units for numeric ts columns) is nulled out — the standard
    asof-with-tolerance semantics (no fallback to an even older row).

    Output: all probe columns, then ``<build_col><suffix>`` for each
    requested build column, then ``asof_lag`` (probe.ts - matched build.ts
    in the ordering units; null when unmatched).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if build_cols is None:
        build_cols = [
            c for c in build.columns if c not in keys and c != build_ts
        ]

    payload = F.struct(
        _ordering_expr(build, build_ts).alias(_MATCH_TS),
        *[F.col(c).alias(c) for c in build_cols],
    )
    # a null-ts build row would sort FIRST (nulls-first asc) and then leak
    # into every probe row via last(ignorenulls) — it carries no "as of"
    # information, drop it; null-ts probe rows sort first too, match
    # nothing, and come back unmatched (correct)
    build = build.filter(F.col(build_ts).isNotNull())
    build_side = build.select(
        *keys,
        _ordering_expr(build, build_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__tb_{c}") for c in build_order],
        payload.alias(_PAYLOAD),
    )
    probe_side = probe.select(
        "*",
        _ordering_expr(probe, probe_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
    )

    unioned = probe_side.unionByName(build_side, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(_TS, _SIDE, *[f"__tb_{c}" for c in build_order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    lag = F.col(_TS) - F.col(_PAYLOAD)[_MATCH_TS]
    if tolerance_us is not None:
        in_tol = lag <= F.lit(tolerance_us)
        matched = matched.withColumn(
            _PAYLOAD, F.when(in_tol, F.col(_PAYLOAD))
        )
        lag = F.col(_TS) - F.col(_PAYLOAD)[_MATCH_TS]

    out_cols = [F.col(c) for c in probe.columns]
    out_cols += [
        F.col(_PAYLOAD)[c].alias(f"{c}{suffix}") for c in build_cols
    ]
    out_cols.append(lag.alias("asof_lag"))
    return matched.select(*out_cols)
