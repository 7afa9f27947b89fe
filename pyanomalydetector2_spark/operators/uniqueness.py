"""Uniqueness validation (north_rule): HLL cheap screen → exact confirm.

The two-stage shape mirrors the reference's detect1→detect2 funnel
(detect_anomalies.py:79-96): a cheap whole-table screen short-circuits the
expensive pass when the data is clean — on a 10^12-row table the screen is
one shuffle-free-ish aggregate (HLL partials merge on the map side), and the
exact pass only runs when the screen smells duplicates.

The exact pass is a groupBy(key) count — for a near-unique key there is no
skew by construction (every group ≈1 row, partial aggregation collapses each
map partition to its local distincts). ``approx_count_distinct`` relative
error defaults to 2% (rsd=0.02); the screen threshold accounts for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_unique_screen(df: DataFrame, key: str, rsd: float = 0.02) -> dict:
    """Stage 1: HyperLogLog estimate vs exact row count. Returns the two
    numbers; caller decides (dup_ratio_upper_bound > 0 → run exact)."""
    row = df.agg(
        F.count(key).alias("cnt"),
        F.approx_count_distinct(key, rsd).alias("approx_distinct"),
    ).first()
    cnt, ad = row["cnt"], row["approx_distinct"]
    # HLL can over- or under-estimate by ~rsd; anything below this floor is
    # indistinguishable from sketch noise
    suspicious = ad < cnt * (1.0 - 2.0 * rsd)
    return {"cnt": cnt, "approx_distinct": ad, "suspicious": bool(suspicious)}


def exact_duplicates(
    df: DataFrame, key: str, salt_buckets: int | None = None
) -> DataFrame:
    """Stage 2: exact duplicate groups → (key, dup_cnt) with dup_cnt > 1.
    One shuffle on the key; map-side combine means the exchange carries at
    most |distinct keys per partition| rows.

    ``salt_buckets`` opts into the salted two-phase count
    (skew.salted_count): a degenerate hot key (ingest bug writing one
    clip_id 10^9 times) spreads over that many reducers in phase 1 instead
    of pinning one. Results are identical — the count merge is exact."""
    if salt_buckets:
        from pyanomalydetector2_spark.operators.skew import salted_count

        counts = salted_count(df.select(key), [key], salt_buckets)
        return counts.withColumnRenamed("cnt", "dup_cnt").filter(
            F.col("dup_cnt") > 1
        )
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("dup_cnt"))
        .filter(F.col("dup_cnt") > 1)
    )


def duplicate_rows(
    df: DataFrame,
    key: str,
    extra_cols: list[str] | None = None,
    salt_buckets: int | None = None,
) -> DataFrame:
    """All rows participating in a duplicated key (violation rows). The dup
    key set is small (violations are rare) → broadcast semi join back."""
    dups = exact_duplicates(df, key, salt_buckets)
    cols = [key] + (extra_cols or [])
    return df.select(*cols).join(F.broadcast(dups), key, "inner")
