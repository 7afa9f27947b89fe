"""JDBC / multi-table source shapes (SURVEY §2.1 S5-S7).

The reference scans Zabbix Postgres tables with hand-built SQL: history ∪
history_uint with pushed time/id predicates (zabbix_getter.py:29-55), trends
∪ trends_uint with DISTINCT dedup (:58-84). Here:

- ``jdbc_table`` is the thin seam over ``spark.read.format("jdbc")`` —
  predicate pushdown happens via the ``predicates``/``pushDownPredicate``
  options and partitioned reads via (partitionColumn, lowerBound,
  upperBound, numPartitions), which is what bounds per-task fetch size at
  scale. No live database exists in this sandbox; the function is exercised
  through its plan shape only.
- the UNION shapes are plain DataFrame ops and are unit-tested with
  in-memory frames (the semantics, not the wire protocol, are what the
  reference encodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyanomalydetector2_spark.functions import local_rows_df


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 16,
    **options: str,
) -> DataFrame:
    """S5 seam — partitioned JDBC scan. ``partition_column`` bounds are the
    reference's clock-range predicates turned into parallel range reads."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower is None or upper is None:
            raise ValueError(
                "partition_column requires lower and upper bounds — "
                "str(None) would reach the JDBC reader as the literal 'None'"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower))
            .option("upperBound", str(upper))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def union_history(float_tbl: DataFrame, uint_tbl: DataFrame) -> DataFrame:
    """S5 — UNION ALL of the float/uint history tables
    (zabbix_getter.py:36-47): duplicates across tables are impossible by
    schema, so no distinct."""
    return float_tbl.unionByName(uint_tbl.select(float_tbl.columns))


def union_trends_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """S6 — UNION (distinct) of trends tables (zabbix_getter.py:58-84):
    the reference uses plain UNION because rows can overlap."""
    return a.unionByName(b.select(a.columns)).distinct()


def scan_with_id_set(df: DataFrame, ids: list[int], key: str = "itemid") -> DataFrame:
    """S7 — itemid IN (...) predicate; literal isin for small sets (pushed
    into JDBC/parquet), broadcast semi-join for large ones (P3)."""
    if len(ids) <= 1000:
        return df.filter(F.col(key).isin(ids))
    spark = df.sparkSession
    id_df = local_rows_df(spark, [(i,) for i in ids], f"{key} long")
    return df.join(F.broadcast(id_df), key, "left_semi")
