"""Skew handling (north_rule: "salted groupBy plus AQE skew-join hints").

AQE skew-join splitting is enabled session-wide (session.py). For
AGGREGATIONS over skewed keys, AQE cannot split a single hot reduce key —
salting can: two-phase aggregation where phase 1 groups on (key, salt) so a
hot key's rows spread over ``salt_buckets`` reducers, and phase 2 merges the
partials. Works for any algebraic aggregate; here for counts and the moment
triple (the engine's universal aggregate).

At 10^12 rows a degenerate clip_id (e.g. an ingest bug writing one id a
billion times) would otherwise pin the uniqueness check on one reducer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.stats import finalize_moments


def salted_count(
    df: DataFrame, keys: Sequence[str], salt_buckets: int = 16
) -> DataFrame:
    """COUNT per key that survives hot keys: (key, salt) partial counts,
    then merge. Result identical to a plain groupBy().count()."""
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    return partial.groupBy(*keys).agg(F.sum("_c").alias("cnt"))


def salted_moment_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    salt_buckets: int = 16,
) -> DataFrame:
    """Moment stats with salted two-phase aggregation — same output as
    stats.moment_stats (the triple is associative, so the salt merge is
    exact), hot-key safe."""
    v = F.col(value_col)
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(v).alias("sum"),
            F.sum(v * v).alias("sqr_sum"),
            F.count(v).alias("cnt"),
        )
    )
    merged = partial.groupBy(*keys).agg(
        F.sum("sum").alias("sum"),
        F.sum("sqr_sum").alias("sqr_sum"),
        F.sum("cnt").alias("cnt"),
    )
    return finalize_moments(merged)
