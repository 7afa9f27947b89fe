"""Logan log-group ingest — S8/S9 + the itemidmap surrogate-key table
(SURVEY §2.1; reference data_getter/logan_getter.py, models/itemidmap.py).

The reference fetches per-host CSVs over HTTP and caches them to disk
(logan_getter.py:98-112: ``{base_url}/{host}/{file}`` → ``{data_dir}/…``);
every downstream consumer then reads the cache. This source consumes the
SAME per-host layout from any Hadoop-readable base path (``file:///`` in
tests, ``hdfs://`` / ``s3a://`` on a cluster):

    base/
      host1/logGroups.csv   (itemid, count, score, text — logan_getter.py:28)
      host1/history.csv     (itemid, clock, value)

The HTTP mirror step stays a driver-side bootstrap outside the engine (the
reference's own cache write), so ingest itself is pure distributed scans.

Surrogate keys — DELIBERATE REDEFINITION (COVERAGE.md "Semantics deltas"):
the reference builds ids as int(f"{hostId}{itemId}") (logan_getter.py:84),
which collides (host 1 + item 23 == host 12 + item 3). Here the surrogate is
``hostid · 2^32 + org_itemid`` — collision-free for org ids < 2^32 and a
pure Column expression (no lookup join in the data path); the mapping is
recorded in an itemidmap snapshot (itemid, hostid, org_itemid, updated) for
reverse lookups, mirroring models/itemidmap.py:5-49.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyanomalydetector2_spark.sources.catalog import SnapshotTable
from pyanomalydetector2_spark.streaming.watermark import WatermarkLedger

LOGGROUPS_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("count", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("text", T.StringType()),
    ]
)

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("itemid", T.LongType()),
        T.StructField("clock", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

SURROGATE_BASE = 1 << 32


def surrogate_itemid(hostid: int, org_itemid: Column) -> Column:
    """hostid · 2^32 + org_itemid (collision-free re-expression of
    logan_getter.py:84's string concat)."""
    return (F.lit(int(hostid)) * F.lit(SURROGATE_BASE) + org_itemid).cast("long")


def read_host_csv(
    spark: SparkSession, base: str, host: str, file_name: str, schema: T.StructType
) -> DataFrame:
    """One per-host CSV scan from the mirrored layout (the reference's
    ``_get_data_by_http`` disk-cache read, logan_getter.py:98-112)."""
    return spark.read.csv(
        os.path.join(base, host, file_name),
        header=True,
        schema=schema,
        mode="DROPMALFORMED",
    )


@dataclass
class LoganIngest:
    """Per-source ingest state: history + itemidmap + item-details snapshots
    and the history watermark (the reference's ModelsSet slice used by
    logan_getter, models/models_set.py:25-42)."""

    warehouse: str
    source_name: str = "logan"
    minimal_group_size: int = 1000
    trends_interval: int = 86400
    trends_retention: int = 14
    history: SnapshotTable = field(init=False)
    itemidmap: SnapshotTable = field(init=False)
    item_details: SnapshotTable = field(init=False)
    watermark: WatermarkLedger = field(init=False)

    def __post_init__(self) -> None:
        root = os.path.join(self.warehouse, self.source_name)
        self.history = SnapshotTable(os.path.join(root, "history"))
        self.itemidmap = SnapshotTable(os.path.join(root, "itemidmap"))
        self.item_details = SnapshotTable(os.path.join(root, "item_details"))
        self.watermark = WatermarkLedger(os.path.join(root, "history_updates.jsonl"))

    def import_host(
        self,
        spark: SparkSession,
        base: str,
        hostid: int,
        host: str,
        group_names: tuple[str, ...] = (),
        updated: int = 0,
    ) -> int:
        """_import_host_data re-expressed (logan_getter.py:156-197): filter
        loggroups by minimal_group_size, remap ids, record itemidmap +
        item-details, MERGE history, advance the watermark, expire old rows.
        Returns the number of history rows merged."""
        lg = read_host_csv(spark, base, host, "logGroups.csv", LOGGROUPS_SCHEMA)
        lg = lg.filter(F.col("count") >= self.minimal_group_size)
        sid = surrogate_itemid(hostid, F.col("itemid"))
        lg = lg.select(
            sid.alias("itemid"),
            F.col("itemid").alias("org_itemid"),
            "count",
            "score",
            "text",
        )
        if lg.isEmpty():  # reference early-outs the whole host (·py:162-163)
            return 0

        self.itemidmap.merge_upsert(
            lg.select(
                "itemid",
                F.lit(int(hostid)).alias("hostid"),
                "org_itemid",
                F.lit(int(updated)).alias("updated"),
            ),
            keys=["itemid"],
        )
        # item details: one row per (group, item); item_name = text truncated
        # to the reference's VARCHAR(255) (models/anomalies.py:69)
        for group_name in group_names or ("",):
            self.item_details.merge_upsert(
                lg.select(
                    F.lit(group_name).alias("group_name"),
                    F.lit(int(hostid)).alias("hostid"),
                    F.lit(host).alias("host_name"),
                    "itemid",
                    F.substring("text", 1, 255).alias("item_name"),
                ),
                keys=["group_name", "itemid"],
            )

        hist = read_host_csv(spark, base, host, "history.csv", HISTORY_SCHEMA)
        hist = hist.select(
            surrogate_itemid(hostid, F.col("itemid")).alias("itemid"),
            "clock",
            "value",
        ).cache()  # consumed by count+max agg AND the merge — one CSV scan
        agg = hist.agg(
            F.count(F.lit(1)).alias("n"), F.max("clock").alias("m")
        ).first()
        n = int(agg["n"])
        if n == 0:
            hist.unpersist()
            return 0
        self.history.merge_upsert(hist, keys=["itemid", "clock"])
        hist.unpersist()

        endep = max(int(agg["m"]), self.watermark.get_endep() or 0)
        startep = endep - self.trends_interval * self.trends_retention
        self.watermark.upsert(startep, endep)
        self.history.delete_where(f"clock < {startep}")  # S18 retention
        return n

    def import_data(
        self,
        spark: SparkSession,
        base: str,
        groups: dict[str, dict[int, str]],
        updated: int = 0,
    ) -> dict[int, int]:
        """import_data over the config's groups → hosts structure
        (logan_getter.py:44-49, 199-203). Returns rows merged per host."""
        host_groups: dict[int, list[str]] = {}
        hosts: dict[int, str] = {}
        for group_name, members in groups.items():
            for hostid, host in members.items():
                hosts[int(hostid)] = host
                host_groups.setdefault(int(hostid), []).append(group_name)
        return {
            hostid: self.import_host(
                spark, base, hostid, host,
                tuple(host_groups[hostid]), updated,
            )
            for hostid, host in sorted(hosts.items())
        }
