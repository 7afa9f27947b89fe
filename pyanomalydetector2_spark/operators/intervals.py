"""Interval (range) join — point-in-interval matching, the second classic
operator Spark's DataFrame API lacks (alongside the as-of join in
operators/asof.py).

A naive ``points.join(intervals, pt >= start AND pt <= end)`` has no equi
condition, so Spark plans BroadcastNestedLoopJoin — O(|points| x
|intervals|) compared rows and a broadcast of one whole side; it dies long
before cluster scale. The standard fix is temporal bucketing:

  1. each interval explodes to one row per fixed-width time bucket it
     touches (``sequence(floor(start/W), floor(end/W))``),
  2. each point maps to exactly ONE bucket (``floor(ts/W)``),
  3. an ordinary hash equi-join on (key..., bucket) meets every
     point/interval pair that can possibly match — in exactly one bucket,
     the point's own, so no dedup is needed —
  4. and the exact containment predicate filters the bucket collisions.

Cost: one shuffle per side on (key, bucket); the interval side grows by
``avg_span / W + 1``. Pick W near the typical span so the blow-up stays
O(1) while each bucket's candidate set stays small. Long-tail intervals
(span >> W) are the skew hazard — they fan out to many buckets; cap-aware
callers should split or clamp them upstream, the same discipline as the
LSH hot-bucket caps in operators/dedup.py.

Reference analog: none (the reference joins series only on exact clocks);
this extends the training-data-pipeline family (attribute events to
experiment/maintenance/session windows) mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.asof import _ordering_expr

_BUCKET = "__iv_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | Sequence[str],
    point_ts: str = "ts",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 86_400_000_000,
    how: str = "inner",
    suffix: str = "_iv",
) -> DataFrame:
    """Join each point to every interval of the same key containing it
    (inclusive on both ends: ``start <= pt <= end``).

    ``point_ts`` may be a timestamp (compared in exact integer micros) or a
    numeric column in the same units as ``start_col``/``end_col``.
    ``how="inner"`` keeps matched pairs; ``how="left"`` keeps unmatched
    points with null interval columns (implemented as inner + anti union so
    the bucket join itself stays an equi inner join). The left variant
    identifies points by (keys, point_ts) — callers with duplicate points
    at the same key+timestamp should add a tiebreak column to ``on``.

    Output: all point columns, then ``<interval_col><suffix>`` for each
    non-key interval column.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    iv_payload = [c for c in intervals.columns if c not in keys]

    pt_us = _ordering_expr(points, point_ts)
    p = points.withColumn(_BUCKET, F.floor(pt_us / F.lit(bucket_us)))
    # start > end would make sequence() count DOWN (default step -1),
    # fanning garbage buckets — an empty interval matches nothing, drop it
    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).select(
        *keys,
        *[F.col(c).alias(f"{c}{suffix}") for c in iv_payload],
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_us)),
                F.floor(F.col(end_col) / F.lit(bucket_us)),
            )
        ).alias(_BUCKET),
    )
    contained = (pt_us >= F.col(f"{start_col}{suffix}")) & (
        pt_us <= F.col(f"{end_col}{suffix}")
    )
    matched = (
        p.join(iv, [*keys, _BUCKET]).filter(contained).drop(_BUCKET)
    )
    if how == "inner":
        return matched
    ident = [*keys, point_ts]
    unmatched = points.join(
        matched.select(*ident).distinct(), ident, "left_anti"
    )
    for c in iv_payload:
        unmatched = unmatched.withColumn(
            f"{c}{suffix}",
            F.lit(None).cast(intervals.schema[c].dataType),
        )
    return matched.unionByName(unmatched)
