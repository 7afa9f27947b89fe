"""CSV sources/sinks (SURVEY §2.1 S1-S4, S20).

The reference's CsvGetter (data_getter/csv_getter.py:25-112) hand-rolls:
gzip read, dtype coercion, malformed-row drops, repeated-header filtering,
time+id filters, global sorts. Here: ``spark.read.csv`` with an explicit
schema + DROPMALFORMED does the coercion/drop in the scan (headers that
repeat mid-file coerce to null → dropped), filters push down, and sorting
moves into downstream window specs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("clock", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

TRENDS_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("clock", T.LongType()),
        T.StructField("value_min", T.DoubleType()),
        T.StructField("value_avg", T.DoubleType()),
        T.StructField("value_max", T.DoubleType()),
    ]
)

ITEMS_SCHEMA = T.StructType(
    [
        T.StructField("group_name", T.StringType()),
        T.StructField("hostid", T.IntegerType()),
        T.StructField("host_name", T.StringType()),
        T.StructField("itemid", T.LongType()),
        T.StructField("item_name", T.StringType()),
    ]
)



def _read_csv_strict(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: list[str] | None = None,
) -> DataFrame:
    """CSV read that drops malformed rows CONSISTENTLY: DROPMALFORMED only
    drops a row when a column the query actually reads fails to parse, so
    with column pruning the same file yields different row sets per query
    (and the corrupt-record-column trick is pruned away the same way).
    Instead, row validity = every REQUIRED column parsed: the filter
    references the required columns regardless of projection, so no
    projection can prune the parse, and a row with a bad/missing required
    field is dropped for every consumer. ``required`` defaults to ALL
    schema columns (the reference CsvGetter's whole-row history semantics,
    csv_getter.py:25-69); trends/items restrict it to their key columns
    per the reference's per-feed behavior (ADVICE r02 #1)."""
    df = spark.read.csv(path, header=True, schema=schema, mode="PERMISSIVE")
    cond = None
    for name in required if required is not None else schema.fieldNames():
        c = F.col(name).isNotNull()
        cond = c if cond is None else cond & c
    return df.filter(cond)


def read_history_csv(
    spark: SparkSession,
    path: str,
    startep: int | None = None,
    endep: int | None = None,
    item_ids: list[int] | None = None,
) -> DataFrame:
    """S1 — history scan with coercion + filters (csv_getter.py:25-69).
    Gzip is handled transparently by the .gz extension."""
    df = _read_csv_strict(spark, path, HISTORY_SCHEMA)
    df = df.filter(F.col("itemid").isNotNull() & F.col("clock").isNotNull())
    if startep is not None:
        df = df.filter(F.col("clock") >= startep)
    if endep is not None:
        df = df.filter(F.col("clock") <= endep)
    if item_ids:
        df = df.filter(F.col("itemid").isin(item_ids))
    return df


def read_trends_csv(
    spark: SparkSession,
    path: str,
    startep: int | None = None,
    endep: int | None = None,
    item_ids: list[int] | None = None,
) -> DataFrame:
    """S2 — trends scan, 5 columns (csv_getter.py:80-112). Explicit
    keywords (no **kw): a typo'd or unsupported option must fail loudly,
    not silently skip the filter.

    Per-feed strictness matches the reference: only itemid/clock must
    parse; rows with null value_min/avg/max are KEPT with the values
    filled to 0 — the reference's get_trends_full_data does fillna(0)
    (csv_getter.py:80-112), it does not drop partially-filled rows."""
    df = _read_csv_strict(
        spark, path, TRENDS_SCHEMA, required=["itemid", "clock"]
    )
    df = df.fillna(0.0, subset=["value_min", "value_avg", "value_max"])
    if startep is not None:
        df = df.filter(F.col("clock") >= startep)
    if endep is not None:
        df = df.filter(F.col("clock") <= endep)
    if item_ids:
        df = df.filter(F.col("itemid").isin(item_ids))
    return df


def trends_as_value(trends: DataFrame) -> DataFrame:
    """S3 — trends→value projection: value := value_avg (csv_getter.py:71-77)."""
    return trends.select("itemid", "clock", F.col("value_avg").alias("value"))


def read_items_csv(
    spark: SparkSession, path: str, item_ids: list[int] | None = None
) -> DataFrame:
    """S4 — items dimension scan (csv_getter.py:150-158). The reference's
    get_items_details drops nothing; only the itemid key must parse here
    (a keyless dimension row is unjoinable either way)."""
    df = _read_csv_strict(spark, path, ITEMS_SCHEMA, required=["itemid"])
    if item_ids:
        df = df.filter(F.col("itemid").isin(item_ids))
    return df


def export_gzip_csv(df: DataFrame, path: str) -> None:
    """S20 — gzip CSV exporter (tools/get_zabbix_data.py:36-59)."""
    df.write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
