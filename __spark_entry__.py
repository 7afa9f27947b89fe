"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry re-expresses an operator from SURVEY.md §2 over the
driver testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL.
The events table is projected onto the reference's canonical series shape
``(itemid, clock, value)`` (models/history.py:10 → user_id/ts/value).

All float outputs are rounded to 6 dp on BOTH sides so the driver's
value-hash compare is stable across engines' summation orders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.stats import moment_stats
from pyanomalydetector2_spark.operators.windows import top_n_per_group
from pyanomalydetector2_spark.sources.tables import events_as_series, load_table

# recent/trend split for the detect1-style screen (events span 2024-01)
_CUT = "2024-01-28 00:00:00"
# thresholds scaled to the synthetic events distribution so the screen has a
# non-trivial survivor set (semantics identical to the reference's λ1 screen)
_LAMBDA1 = 0.5
_IGNORE_DIFF_RATE = 0.05
_TRENDS_MIN_COUNT = 3


def _r(c, n=6):
    return F.round(c, n)


# ---------------------------------------------------------------- queries --
def q_stats_moment(spark: SparkSession, sf: str) -> DataFrame:
    """A1 — per-item moment sketch (reference stats.py:75-135)."""
    ev = events_as_series(spark, sf)
    s = moment_stats(ev, ["itemid"])
    return s.select(
        "itemid",
        F.col("cnt").cast("long").alias("cnt"),
        _r("sum").alias("sum_v"),
        _r("mean").alias("mean_v"),
        _r("std").alias("std_v"),
    )


def q_zscore_screen(spark: SparkSession, sf: str) -> DataFrame:
    """detect1 — λ-threshold z-score screen of recent window vs trend
    (reference detector.py:150-215), verbose output for value checks."""
    ev = load_table(spark, sf, "events").select(
        F.col("user_id").alias("itemid"), "ts", "value"
    )
    trend = moment_stats(ev.filter(F.col("ts") < _CUT), ["itemid"]).select(
        "itemid",
        F.col("mean").alias("mean_t"),
        F.col("std").alias("std_t"),
        F.col("cnt").alias("cnt_t"),
    )
    recent = (
        ev.filter(F.col("ts") >= _CUT)
        .groupBy("itemid")
        .agg(F.avg("value").alias("mean_h"))
    )
    dev = F.abs(F.col("mean_h") - F.col("mean_t"))
    out = (
        recent.join(trend, "itemid")
        .filter(F.col("cnt_t") > _TRENDS_MIN_COUNT)
        .filter(F.col("std_t") > 0)
        .filter(dev > _LAMBDA1 * F.col("std_t"))
        .filter(
            (F.col("mean_t") == 0)
            | (F.try_divide(dev, F.abs(F.col("mean_t"))) > _IGNORE_DIFF_RATE)
        )
    )
    return out.select(
        "itemid",
        _r("mean_h").alias("mean_h"),
        _r("mean_t").alias("mean_t"),
        _r("std_t").alias("std_t"),
    )


def q_time_bucket_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """A9 — tumbling-window rollup history→trends (reference
    logan_getter.py:249-263): daily buckets per event_type."""
    ev = load_table(spark, sf, "events")
    epoch = F.unix_timestamp("ts").cast("long")
    bucket = (epoch - epoch % 86400).alias("clock")
    return (
        ev.groupBy("event_type", bucket)
        .agg(
            F.count("value").cast("long").alias("cnt"),
            _r(F.avg("value")).alias("value_avg"),
            _r(F.min("value")).alias("value_min"),
            _r(F.max("value")).alias("value_max"),
        )
    )


def q_adjacent_diff_stats(spark: SparkSession, sf: str) -> DataFrame:
    """W1+A5 — per-item adjacent-diff distribution stats (reference
    detector.py:288-301)."""
    ev = load_table(spark, sf, "events").select(
        F.col("user_id").alias("itemid"), "ts", "event_id", "value"
    )
    w = Window.partitionBy("itemid").orderBy("ts", "event_id")
    d = ev.withColumn("diff", F.col("value") - F.lag("value").over(w)).filter(
        F.col("diff").isNotNull() & (F.col("diff") != 0)
    )
    s = moment_stats(d, ["itemid"], "diff")
    return s.select(
        "itemid",
        F.col("cnt").cast("long").alias("cnt"),
        _r("mean").alias("mean_d"),
        _r("std").alias("std_d"),
    )


def q_minmax_first(spark: SparkSession, sf: str) -> DataFrame:
    """A4 — per-item min/max/first-by-time (reference detector.py:333)."""
    ev = load_table(spark, sf, "events")
    return ev.groupBy(F.col("user_id").alias("itemid")).agg(
        _r(F.min("value")).alias("min_v"),
        _r(F.max("value")).alias("max_v"),
        _r(F.min_by("value", F.struct("ts", "event_id"))).alias("first_v"),
    )


def q_topn_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """W5/O3 — deterministic top-3 per event_type by value (reference
    detector.py:628-638 nlargest)."""
    ev = load_table(spark, sf, "events").select(
        "event_type", "event_id", "user_id", "value"
    )
    top = top_n_per_group(ev, ["event_type"], "value", 3, tiebreak=["event_id"])
    return top.select(
        "event_type", "event_id", "user_id", _r("value").alias("value")
    )


def q_star_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """J8 — star join over dimension tables, broadcast both dims."""
    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region")
    j = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("order_cnt"),
        _r(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_anti_join_ids(spark: SparkSession, sf: str) -> DataFrame:
    """P10/U5/J9 — anti-membership: items with 'error' events but no
    'purchase' events (reference detector.py:527, models/model.py:44-59);
    broadcast left-anti join."""
    ev = load_table(spark, sf, "events")
    err = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 95))
        .select(F.col("user_id").alias("itemid"))
        .distinct()
    )
    buy = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 95))
        .select(F.col("user_id").alias("itemid"))
        .distinct()
    )
    return err.join(F.broadcast(buy), "itemid", "left_anti")


def q_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """U2/U4 — union-distinct of id sets from two overlapping scans
    (reference zabbix_getter.py:65-76)."""
    ev = load_table(spark, sf, "events")
    a = ev.filter(F.col("value") > 50).select(F.col("user_id").alias("itemid"))
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("itemid")
    )
    return a.union(b).distinct()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the detect1-style z-score screen on sf0.001."""
    return q_zscore_screen(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stats_moment": q_stats_moment,
        "zscore_screen": q_zscore_screen,
        "time_bucket_rollup": q_time_bucket_rollup,
        "adjacent_diff_stats": q_adjacent_diff_stats,
        "minmax_first": q_minmax_first,
        "topn_per_group": q_topn_per_group,
        "star_join_agg": q_star_join_agg,
        "anti_join_ids": q_anti_join_ids,
        "union_distinct": q_union_distinct,
    }


# ----------------------------------------------------------------- oracle --
_STD_CLOSED = (
    "CASE WHEN count({v}) > 1 THEN sqrt((sum({v}*{v}) - sum({v})*sum({v})/count({v}))"
    " / (count({v}) - 1)) ELSE 0 END"
)


def oracle_sql() -> dict[str, str]:
    std_v = _STD_CLOSED.format(v="value")
    std_d = _STD_CLOSED.format(v="diff")
    return {
        "stats_moment": f"""
            SELECT user_id AS itemid, count(value) AS cnt,
                   round(sum(value), 6) AS sum_v,
                   round(sum(value)/count(value), 6) AS mean_v,
                   round({std_v}, 6) AS std_v
            FROM events GROUP BY 1
        """,
        "zscore_screen": f"""
            WITH trend AS (
              SELECT user_id AS itemid, count(value) AS cnt_t,
                     sum(value)/count(value) AS mean_t, {std_v} AS std_t
              FROM events WHERE ts < TIMESTAMP '{_CUT}' GROUP BY 1
            ), recent AS (
              SELECT user_id AS itemid, avg(value) AS mean_h
              FROM events WHERE ts >= TIMESTAMP '{_CUT}' GROUP BY 1
            )
            SELECT r.itemid, round(mean_h, 6) AS mean_h,
                   round(mean_t, 6) AS mean_t, round(std_t, 6) AS std_t
            FROM recent r JOIN trend t USING (itemid)
            WHERE cnt_t > {_TRENDS_MIN_COUNT} AND std_t > 0
              AND abs(mean_h - mean_t) > {_LAMBDA1} * std_t
              AND (mean_t = 0 OR abs(mean_h - mean_t)/abs(mean_t) > {_IGNORE_DIFF_RATE})
        """,
        "time_bucket_rollup": """
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT)
                     - CAST(floor(epoch(ts)) AS BIGINT) % 86400 AS clock,
                   count(value) AS cnt,
                   round(avg(value), 6) AS value_avg,
                   round(min(value), 6) AS value_min,
                   round(max(value), 6) AS value_max
            FROM events GROUP BY 1, 2
        """,
        "adjacent_diff_stats": f"""
            WITH d AS (
              SELECT user_id AS itemid,
                     value - lag(value) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS diff
              FROM events
            )
            SELECT itemid, count(diff) AS cnt,
                   round(sum(diff)/count(diff), 6) AS mean_d,
                   round({std_d}, 6) AS std_d
            FROM d WHERE diff IS NOT NULL AND diff <> 0 GROUP BY 1
        """,
        "minmax_first": """
            WITH ranked AS (
              SELECT user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT e.user_id AS itemid,
                   round(min(e.value), 6) AS min_v,
                   round(max(e.value), 6) AS max_v,
                   round(any_value(r.value), 6) AS first_v
            FROM events e
            JOIN (SELECT user_id, value FROM ranked WHERE rn = 1) r
              ON e.user_id = r.user_id
            GROUP BY 1
        """,
        "topn_per_group": """
            SELECT event_type, event_id, user_id, round(value, 6) AS value
            FROM (
              SELECT event_type, event_id, user_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id) AS rn
              FROM events
            ) WHERE rn <= 3
        """,
        "star_join_agg": """
            SELECT r_name AS region_name, n_name AS nation_name,
                   count(*) AS order_cnt,
                   round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        """,
        "anti_join_ids": """
            SELECT DISTINCT user_id AS itemid FROM events
             WHERE event_type = 'error' AND value > 95
            EXCEPT
            SELECT DISTINCT user_id AS itemid FROM events
             WHERE event_type = 'purchase' AND value > 95
        """,
        "union_distinct": """
            SELECT user_id AS itemid FROM events WHERE value > 50
            UNION
            SELECT user_id AS itemid FROM events WHERE event_type = 'click'
        """,
    }
