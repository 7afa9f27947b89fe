"""Parquet-backed snapshot catalog with an Iceberg-shaped API.

The sandbox has no Iceberg runtime jars, so this provides the same surface
the engine needs from Iceberg (SURVEY §1.4 / §7 risk note: "detect and
degrade to parquet + manual snapshot dirs while keeping the same API shape"):

- immutable snapshots with monotonically increasing ids (time travel),
- MERGE-style upsert producing a new snapshot (the reference's
  ON CONFLICT upserts, S14-S16 in SURVEY §2.1),
- partition-directory layout (``bucket=<k>``) so bucket-filtered reads prune
  at the file level exactly like Iceberg partition pruning.

On a real cluster, swap ``SnapshotTable`` for ``spark.table("cat.db.t")`` +
``MERGE INTO`` / ``VERSION AS OF``; every caller goes through this seam.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- metadata ----------------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"current": None, "snapshots": []}
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)  # atomic commit, Iceberg-style

    def snapshots(self) -> list[int]:
        return [s["id"] for s in self._meta()["snapshots"]]

    def current_snapshot(self) -> int | None:
        return self._meta()["current"]

    def _snap_dir(self, sid: int) -> str:
        return os.path.join(self.path, f"snap={sid}")

    # -- write paths ---------------------------------------------------------
    def write_snapshot(
        self, df: DataFrame, partition_by: list[str] | None = None
    ) -> int:
        meta = self._meta()
        sid = (meta["current"] or 0) + 1
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._snap_dir(sid))
        meta["snapshots"].append(
            {"id": sid, "ts": time.time(), "partition_by": partition_by or []}
        )
        meta["current"] = sid
        self._write_meta(meta)
        return sid

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """New snapshot = previous rows ∪ new rows."""
        cur = self.current_snapshot()
        if cur is None:
            return self.write_snapshot(df, partition_by)
        old = self.read(df.sparkSession)
        return self.write_snapshot(old.unionByName(df), partition_by)

    def merge_upsert(
        self, df: DataFrame, keys: list[str], partition_by: list[str] | None = None
    ) -> int:
        """MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT: keep old
        rows whose key is absent from the new frame, take all new rows.
        (reference: per-row ON CONFLICT loops, models/stats.py:21-32 — here
        one anti-join + union, a single distributed pass)."""
        cur = self.current_snapshot()
        if cur is None:
            return self.write_snapshot(df, partition_by)
        spark = df.sparkSession
        old = self.read(spark)
        kept = old.join(df.select(*keys).distinct(), keys, "left_anti")
        return self.write_snapshot(kept.unionByName(df.select(old.columns)), partition_by)

    def delete_where(self, condition: str) -> int:
        """Row-level delete (reference S18 retention deletes)."""
        spark = SparkSession.getActiveSession()
        remaining = self.read(spark).filter(~F.expr(condition))
        return self.write_snapshot(remaining)

    # -- read paths ----------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot()
        if sid is None:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        return spark.read.parquet(self._snap_dir(sid))

    def expire_snapshots(self, keep_last: int = 2) -> list[int]:
        """Iceberg expire_snapshots analog: drop all but the newest N."""
        meta = self._meta()
        drop = meta["snapshots"][:-keep_last] if keep_last else meta["snapshots"]
        kept = meta["snapshots"][-keep_last:] if keep_last else []
        for s in drop:
            shutil.rmtree(self._snap_dir(s["id"]), ignore_errors=True)
        meta["snapshots"] = kept
        if not kept:  # everything expired → table is empty, not bricked
            meta["current"] = None
        self._write_meta(meta)
        return [s["id"] for s in drop]
