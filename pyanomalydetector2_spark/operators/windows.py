"""Ordered / window computations (SURVEY.md §2.5 W1-W6, §2.6 O3-O4).

Every per-item Python loop in the reference (detector.py:290-298, 425-444)
becomes a window spec: the sort happens per-partition inside the exchange for
the partitionBy key — never a global orderBy (SURVEY §2.6 O1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyanomalydetector2_spark.functions import safe_div


def adjacent_diff(
    df: DataFrame,
    key: str = "itemid",
    order: str = "clock",
    value: str = "value",
    drop_zeros: bool = True,
) -> DataFrame:
    """W1 — per-key lag diff, fillna(0), optionally drop zero diffs
    (reference detector.py:288-298 builds this with a Python loop +
    pd.concat; here it is one window expression). The order spec carries the
    value column as tiebreak so the diff sequence is deterministic under
    clock ties (the reference inherits input order from a stable sort)."""
    w = Window.partitionBy(key).orderBy(order, value)
    out = df.withColumn(
        "diff", F.coalesce(F.col(value) - F.lag(value).over(w), F.lit(0.0))
    )
    if drop_zeros:
        out = out.filter(F.col("diff") != 0)
    return out


def local_peak(
    df: DataFrame,
    window_secs: int,
    key: str = "itemid",
    order: str = "clock",
    value: str = "value",
) -> DataFrame:
    """W2 — sliding local-peak window means (reference detector.py:424-446):
    per key, mean of value over the trailing ``window_secs`` range, then the
    running extreme of those window means. Emits
    (key, peak_up = max window-mean, peak_dn = min window-mean)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order).cast("long"))
        .rangeBetween(-window_secs, 0)
    )
    means = df.withColumn("win_mean", F.avg(value).over(w))
    return means.groupBy(key).agg(
        F.max("win_mean").alias("peak_up"), F.min("win_mean").alias("peak_dn")
    )


def base_clocks(startep: int, endep: int, unit: int):
    """W3 grid (reference utils/normalizer.py:10-14): regular clock grid
    [s - s%u, e - e%u) step u, as a one-column DataFrame builder (use with
    spark.range or F.sequence+explode)."""
    s0 = startep - startep % unit
    e0 = endep - endep % unit
    return s0, e0, unit


def fit_to_base_clocks(
    df: DataFrame,
    startep: int,
    endep: int,
    unit: int,
    key: str = "itemid",
    order: str = "clock",
    value: str = "value",
) -> DataFrame:
    """W3 — regularize each series onto the base-clock grid. DELIBERATE
    REDEFINITION of reference utils/normalizer.py:31-72 (whose semantics its
    tests/test_normalizer.py:14-27 pin as next-sample BACK-fill over an
    endpoint-INCLUSIVE grid range(s0, e0+u, u)); this implementation chooses
    the cleaner forward-fill over an endpoint-EXCLUSIVE grid (SURVEY §7
    "redefine cleanly" risk note; pinned by tests/test_windows.py and the
    fit_base_clocks contract oracle):

    - samples are bucketed to the grid point at-or-after them
      (ceil-to-grid); multiple samples in one bucket are averaged;
    - grid points with no sample carry the previous value forward;
    - leading grid points before the first sample back-fill from the first
      available value;
    - trailing samples in (e0−u, e0) bucket to e0, which is OUTSIDE the
      exclusive grid, and are dropped (the reference folds them into its
      inclusive e0 endpoint) — callers wanting them must extend endep by
      one unit.

    Spark-first: grid = sequence+explode cross-joined to the distinct key
    set, left join bucket averages, forward-fill via last(ignorenulls) over
    an unbounded-preceding window, then a back-fill via first(ignorenulls)
    over the following window. Two window passes on the same partitioning —
    one shuffle."""
    s0, e0, u = base_clocks(startep, endep, unit)
    spark = df.sparkSession
    grid = spark.range(s0, e0, u).select(F.col("id").cast("long").alias(order))
    keys = df.select(key).distinct()
    full = keys.crossJoin(grid)  # grid is tiny; Spark broadcasts the range side

    # ceil each sample clock to its grid point, average within buckets
    bucketed = (
        df.filter((F.col(order) > s0 - u) & (F.col(order) < e0))
        .withColumn(
            "_g",
            (F.ceil((F.col(order) - F.lit(s0)) / F.lit(u)) * u + F.lit(s0)).cast(
                "long"
            ),
        )
        .groupBy(key, "_g")
        .agg(F.avg(value).alias("_v"))
    )
    joined = full.join(
        bucketed.withColumnRenamed("_g", order), [key, order], "left"
    )
    w_ff = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bf = (
        Window.partitionBy(key)
        .orderBy(order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return joined.select(
        key,
        order,
        F.coalesce(
            F.last("_v", ignorenulls=True).over(w_ff),
            F.first("_v", ignorenulls=True).over(w_bf),
            F.lit(0.0),
        ).alias(value),
    )


def minmax_normalize(
    df: DataFrame, key: str = "itemid", value: str = "value"
) -> DataFrame:
    """W4 — per-key (x-min)/(max-min), NaN→0 (reference
    utils/normalizer.py:74-91 via groupby.transform). min/max skip NaN
    inputs like the pandas transform does (Spark's max() would otherwise
    treat one NaN as the key's maximum and poison every row of the key);
    the NaN row itself normalizes to 0 via clean_float."""
    from pyanomalydetector2_spark.functions import clean_float

    v = F.col(value).cast("double")
    nan_safe = F.when(~F.isnan(v), v)
    w = Window.partitionBy(key)
    rng = F.max(nan_safe).over(w) - F.min(nan_safe).over(w)
    return df.withColumn(
        "norm", clean_float(safe_div(v - F.min(nan_safe).over(w), rng))
    )


def top_n_per_group(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    n: int,
    ascending: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """W5/O3 — per-group top-N (reference detector.py:628-638 nlargest).
    Pass ``tiebreak`` columns for a deterministic cut at rank boundaries.
    Nulls sort LAST in both directions (Spark ASC defaults nulls first,
    which would let null order values occupy top-N slots; pandas
    nlargest/nsmallest exclude them)."""
    ob = (
        F.col(order_col).asc_nulls_last()
        if ascending
        else F.col(order_col).desc_nulls_last()
    )
    w = Window.partitionBy(*group).orderBy(ob, *[F.col(t).asc() for t in tiebreak])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def first_row_per_group(
    df: DataFrame, group: Sequence[str], order_col: str, ascending: bool = True
) -> DataFrame:
    """A15 — first row per group, deterministic via explicit order
    (reference reporter.py:25 relies on pre-sorted frames)."""
    ob = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*group).orderBy(ob)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def groups_with_min_size(
    df: DataFrame, group: str, min_size: int = 2
) -> DataFrame:
    """A14 — keep rows whose group has ≥ min_size members (reference
    reporter.py:28-32) — window count, no join."""
    w = Window.partitionBy(group)
    return df.withColumn("_c", F.count(F.lit(1)).over(w)).filter(
        F.col("_c") >= min_size
    ).drop("_c")
