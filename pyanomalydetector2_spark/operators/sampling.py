"""Deterministic (hash-based) sampling for training-data pipelines.

``df.sample()`` is seed-dependent per partition-split and not reproducible
across engines or re-shuffles; production data pipelines instead sample on
a content hash so that (a) the same row always lands in the same sample /
split regardless of execution plan, (b) samples are repeatable across
engines — which also makes every operator here oracle-checkable, and
(c) train/validation splits are disjoint by construction.

All hashing is the portable h60 (md5) over ``salt:key``; the acceptance
test is ``h % 1_000_000 < fraction·1_000_000`` — pure Column expressions,
one scan, no shuffle (the filter pushes past everything stateless).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.dedup import h60

_DENOM = 1_000_000


def sample_bucket(key: Column, salt: str = "sample") -> Column:
    """The row's stable sample bucket in [0, 1e6): pmod(h60(salt:key), 1e6).
    DuckDB equivalent: (('0x'||substr(md5('salt:'||key),1,15))::BIGINT) %
    1000000 (non-negative, so % == pmod)."""
    return F.pmod(h60(F.concat(F.lit(f"{salt}:"), key.cast("string"))), F.lit(_DENOM))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Stable uniform sample: keeps a row iff its bucket < fraction·1e6.
    Same key ⇒ same verdict, every run, every engine, every plan."""
    return df.filter(sample_bucket(F.col(key_col), salt) < int(fraction * _DENOM))


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict, salt: str = "sample"
) -> DataFrame:
    """Per-stratum stable sampling (e.g. downsample dominant languages):
    strata absent from ``fractions`` are dropped (fraction 0)."""
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, int(frac * _DENOM)) if expr is None else expr.when(
            cond, int(frac * _DENOM)
        )
    thresh = expr.otherwise(F.lit(0)) if expr is not None else F.lit(0)
    return df.filter(sample_bucket(F.col(key_col), salt) < thresh)


def train_split(
    df: DataFrame,
    key_col: str,
    train_fraction: float = 0.9,
    salt: str = "split",
) -> DataFrame:
    """Stable train/validation assignment: adds ``split`` ∈ {train, val}.
    Disjoint and exhaustive by construction (one bucket comparison), stable
    under re-runs and engine changes — the property that matters when the
    validation set must never leak into training across pipeline versions."""
    return df.withColumn(
        "split",
        F.when(
            sample_bucket(F.col(key_col), salt) < int(train_fraction * _DENOM),
            F.lit("train"),
        ).otherwise(F.lit("val")),
    )


def group_quota_sample(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    cap: int,
    salt: str = "quota",
) -> DataFrame:
    """At most ``cap`` rows per group, chosen deterministically — the
    training-mix primitive ("≤ K documents per source/domain/language")
    that fraction-based stratified sampling cannot express when group
    sizes are unknown or wildly skewed.

    Rows rank within their group by (sample_bucket, key): the bucket makes
    the pick a stable uniform draw (same rows survive every run, engine,
    and plan — same property as hash_sample), the key breaks bucket ties
    totally. Adds ``quota_rank`` (1-based) so callers can audit the draw.

    Scale: one hash-partitioned window per group — the same single-shuffle
    shape as W5 top-N-per-group; a pathologically hot group costs one
    partition's sort of (bucket, key) pairs, not a global sort. Oracle:
    row_number() OVER (PARTITION BY group ORDER BY bucket, key)."""
    from pyspark.sql import Window

    b = sample_bucket(F.col(key_col), salt)
    w = Window.partitionBy(*group_cols).orderBy(b.asc(), F.col(key_col).asc())
    return (
        df.withColumn("quota_rank", F.row_number().over(w))
        .filter(F.col("quota_rank") <= cap)
    )
