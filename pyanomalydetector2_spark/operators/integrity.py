"""Referential-integrity validation (north_rule): broadcast anti-join of fact
columns against dimension tables — the Spark re-expression of the reference's
existing/nonexisting id split (models/model.py:44-59, J9 in SURVEY §2.3).

Dims are tiny (codec/sr_hz domains) → always broadcast; at 10^12 rows the
anti-join is a map-side hash probe, zero shuffle of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referential_violations(
    fact: DataFrame, column: str, dim: DataFrame, keep_cols: list[str] | None = None
) -> DataFrame:
    """Rows whose ``column`` value is absent from ``dim`` (nulls excluded —
    null-rate is a separate stat constraint)."""
    cols = list(dict.fromkeys((keep_cols or []) + [column]))
    return (
        fact.select(*cols)
        .filter(F.col(column).isNotNull())
        .join(F.broadcast(dim.select(column).distinct()), column, "left_anti")
    )


def domain_summary(fact: DataFrame, column: str, dim: DataFrame) -> DataFrame:
    """Per-value violation counts (observed domain − allowed domain)."""
    return (
        referential_violations(fact, column, dim)
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("violation_cnt"))
    )
