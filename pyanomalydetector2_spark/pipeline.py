"""The reference's top-level pipelines re-expressed (SURVEY §3.1/§3.2):

- ``update_trends_stats`` = trends_stats.update_stats (trends_stats.py:15-68 +
  data_processing/stats.py:69-160): incremental moment maintenance — add the
  new slice, subtract the expired slice, advance the watermark, with the
  gap-truncate rebuild of detector.py:88-97. The reference's 100-id batch
  loops and per-row upserts disappear: one merge per increment, one MERGE
  INTO the stats snapshot.

- ``detect`` = detect_anomalies.run (detect_anomalies.py:37-105): the
  three-stage funnel with driver-side early exit, then result enrichment
  with the items dimension (J7, detector.py:575-618) and an idempotent
  upsert into the anomalies results table (S16).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyanomalydetector2_spark.operators.detect import (
    DetectParams,
    detect1,
    detect2,
    detect3,
)
from pyanomalydetector2_spark.operators.stats import (
    merge_moments,
    moment_stats,
    subtract_moments,
)
from pyanomalydetector2_spark.sources.catalog import SnapshotTable
from pyanomalydetector2_spark.streaming.watermark import WatermarkLedger
from pyanomalydetector2_spark.functions import local_rows_df

STATS_COLS = ["itemid", "sum", "sqr_sum", "cnt", "mean", "std"]


class SeriesPipeline:
    """One pipeline instance per data source (the reference's per-source
    table-set, models/models_set.py:25-42)."""

    def __init__(
        self,
        warehouse: str,
        source_name: str = "default",
        trends_interval: int = 86400,
        trends_retention: int = 14,
        params: DetectParams | None = None,
        spark=None,
    ):
        """Pass ``spark`` to route the pipeline's tables through the
        backend-probed catalog seam (real Iceberg when the session carries
        the runtime); the default stays the parquet SnapshotTable so
        construction needs no session."""
        from pyanomalydetector2_spark.sources.catalog import open_table

        root = os.path.join(warehouse, source_name)

        def table(name: str):
            path = os.path.join(root, name)
            return open_table(spark, path) if spark is not None else SnapshotTable(path)

        self.stats_table = table("trends_stats")
        self.anomalies_table = table("anomalies")
        self.topitems_table = table("topitems")
        self.watermark = WatermarkLedger(os.path.join(root, "trends_updates.jsonl"))
        self.trends_interval = trends_interval
        self.trends_retention = trends_retention
        self.params = params or DetectParams()

    # -- incremental stats maintenance (SURVEY §3.2) -------------------------
    def update_trends_stats(self, trends: DataFrame, endep: int) -> DataFrame:
        """Maintain per-item moment stats over the sliding
        [endep − interval·retention, endep] window incrementally."""
        spark = trends.sparkSession
        startep = endep - self.trends_interval * self.trends_retention
        last_endep = self.watermark.get_endep()
        last_startep = self.watermark.get_startep()

        gap = (
            last_endep is not None
            and endep - last_endep > 2 * self.trends_interval
        )
        if last_endep is None or gap:
            # full (re)build — reference detector.py:88-97 truncates on gap
            stats = moment_stats(
                trends.filter(
                    (F.col("clock") > startep) & (F.col("clock") <= endep)
                ),
                ["itemid"],
            )
        else:
            stored = self.stats_table.read(spark)
            delta = moment_stats(
                trends.filter(
                    (F.col("clock") > last_endep) & (F.col("clock") <= endep)
                ),
                ["itemid"],
            )
            merged = merge_moments(stored, delta, ["itemid"])
            expired = moment_stats(
                trends.filter(
                    (F.col("clock") > last_startep) & (F.col("clock") <= startep)
                ),
                ["itemid"],
            )
            stats = subtract_moments(merged, expired, ["itemid"])

        self.stats_table.write_snapshot(stats.select(*STATS_COLS))
        self.watermark.upsert(startep, endep)
        return self.stats_table.read(spark)

    # -- detection funnel (SURVEY §3.1) --------------------------------------
    def detect(
        self,
        history: DataFrame,
        trends: DataFrame,
        items_dim: DataFrame | None = None,
        endep: int | None = None,
        history_interval: int | None = None,
    ) -> DataFrame:
        """detect1 → detect2 → detect3 with driver-side early exit
        (reference detect_anomalies.py:79-96), then enrichment + upsert.

        When ``history_interval`` is given, survivor history is regularized
        onto the base-clock grid before the confirm stages and detect3's
        support denominator becomes the expected grid size — the
        re-expression of the reference's update_history step
        (detect_anomalies.py:85 → detector.py:113-146: survivors only, so
        the expensive regularization runs on the post-screen funnel)."""
        spark = history.sparkSession
        tstats = self.stats_table.read(spark)

        s1 = detect1(history, tstats, self.params)
        s1 = s1.cache()
        if s1.isEmpty():  # early exit — survivor sets are tiny by design
            return self._empty_anomalies(spark)

        h2 = history.join(s1, "itemid", "left_semi")
        expected_count = None
        if history_interval is not None and endep is not None:
            from pyanomalydetector2_spark.operators.windows import (
                base_clocks,
                fit_to_base_clocks,
            )

            row = history.agg(F.min("clock").alias("m")).first()
            startep = int(row["m"])
            s0, e0, u = base_clocks(startep, endep, history_interval)
            expected_count = max((e0 - s0) // u, 1)
            h2 = fit_to_base_clocks(h2, startep, endep, history_interval)
        t2 = trends.join(s1, "itemid", "left_semi")
        s2 = detect2(h2, t2, self.params).cache()
        if s2.isEmpty():
            return self._empty_anomalies(spark)

        h3 = h2.join(s2, "itemid", "left_semi")
        t3 = trends.join(s2, "itemid", "left_semi")
        s3 = detect3(h3, t3, self.params, expected_count=expected_count)

        if history_interval is not None and endep is not None:
            # phase-2 rescue (reference detector.py:524-547): items failing
            # phase 1's full-window support are re-tested on the recent
            # sub-window (clock ≥ endep − interval·retention) with λ3_2 and
            # the recent grid's expected count — a burst confined to the
            # recent window is rescued instead of dropped
            from pyanomalydetector2_spark.operators.detect import detect3_phase2

            recent_startep = (
                endep - history_interval * self.params.history_recent_retention
            )
            expected2 = max((e0 - max(recent_startep, s0)) // u, 1)
            s3 = detect3_phase2(
                h3,
                t3,
                s3,
                self.params,
                recent_startep=recent_startep,
                expected_count=expected2,
            )

        created = endep or int(time.time())
        out = (
            s3.join(tstats.select("itemid", "mean", "std"), "itemid")
            .select(
                "itemid",
                F.lit(created).alias("created"),
                F.lit(-1).alias("clusterid"),  # assigned by classify_results
                F.col("mean").alias("trend_mean"),
                F.col("std").alias("trend_std"),
            )
        )
        if items_dim is not None:  # J7 metadata star join — broadcast dim
            out = out.join(F.broadcast(items_dim), "itemid", "left")
        self.anomalies_table.merge_upsert(out, ["itemid", "created"])
        return self.anomalies_table.read(spark).filter(F.col("created") == created)

    def expire_anomalies(self, keep_secs: int, now_ep: int) -> None:
        """S18 retention delete (reference detector.py:621-625)."""
        self.anomalies_table.delete_where(f"created < {now_ep - keep_secs}")

    # -- topitems report (SURVEY §3.3) ----------------------------------------
    def update_topitems(
        self,
        items_dim: DataFrame,
        created: int,
        top_n: int,
        group_map: DataFrame | None = None,
        keep_secs: int | None = None,
    ) -> DataFrame:
        """update_topitems.run → Detector.update_topitems (reference
        update_topitems.py:16-51, detector.py:628-638): enrich the current
        trend stats with item metadata (J7, broadcast dim), rank per host,
        keep the top ``top_n`` by item_count, upsert into the topitems
        table with clusterid = -1, expire old rows.

        ``item_count`` is the per-item trend sample count (``cnt``) — the
        reference renames the stats columns into that name at
        detector.py:600; the ranking semantics (nlargest per hostid,
        detector.py:635) are preserved with an itemid tiebreak for
        determinism. ``group_map`` (itemid → group_name overrides,
        J10/detector.py:607-610) applies as a broadcast left join +
        coalesce instead of a per-row dict lookup."""
        from pyanomalydetector2_spark.operators.windows import top_n_per_group

        spark = items_dim.sparkSession
        tstats = self.stats_table.read(spark)
        enriched = tstats.join(F.broadcast(items_dim), "itemid")
        if group_map is not None:
            gm = group_map.select(
                "itemid", F.col("group_name").alias("_gm_group")
            )
            enriched = enriched.join(F.broadcast(gm), "itemid", "left").withColumn(
                "group_name", F.coalesce("_gm_group", "group_name")
            ).drop("_gm_group")
        ranked = top_n_per_group(
            enriched.withColumnRenamed("cnt", "item_count"),
            ["hostid"],
            "item_count",
            top_n,
            tiebreak=["itemid"],
        )
        out = ranked.select(
            "itemid",
            F.lit(created).cast("long").alias("created"),
            "group_name",
            "hostid",
            F.lit(-1).alias("clusterid"),
            "host_name",
            "item_name",
            F.col("item_count").cast("long"),
            F.col("mean").alias("trend_mean"),
            F.col("std").alias("trend_std"),
        )
        self.topitems_table.merge_upsert(out, ["itemid", "created"])
        if keep_secs is not None:
            self.topitems_table.delete_where(f"created < {created - keep_secs}")
        return self.topitems_table.read(spark).filter(F.col("created") == created)

    # -- survivor clustering (SURVEY §3.1 classify_charts) --------------------
    def classify_results(
        self,
        history: DataFrame,
        table: SnapshotTable | None = None,
        created: int | None = None,
        sigma: float = 2.0,
    ) -> DataFrame:
        """classify_charts over the latest results (anomalies by default,
        pass ``self.topitems_table`` for the topitems flow —
        update_topitems.py:53-74): collect the survivors' charts, run the
        two-level DBSCAN on the driver (the survivor set is tiny by the
        funnel's construction), MERGE clusterid back
        (models/anomalies.py:81-84 update_clusterid)."""
        from pyanomalydetector2_spark.operators.classify import (
            classify_charts,
            collect_charts,
        )

        spark = history.sparkSession
        table = table or self.anomalies_table
        res = table.read(spark)
        if created is None:
            created = res.agg(F.max("created")).first()[0]
        latest = res.filter(F.col("created") == created)
        surv = latest.select("itemid").distinct()
        charts = collect_charts(history.join(surv, "itemid", "left_semi"))
        labels = classify_charts(charts, sigma=sigma)
        if labels:
            lab_df = local_rows_df(
                spark,
                [(int(k), int(v)) for k, v in labels.items()],
                "itemid long, clusterid int",
            )
            updated = (
                latest.drop("clusterid")
                .join(F.broadcast(lab_df), "itemid", "left")
                .withColumn("clusterid", F.coalesce("clusterid", F.lit(-1)))
                .select(*res.columns)
            )
            table.merge_upsert(updated, ["itemid", "created"])
        return table.read(spark).filter(F.col("created") == created)

    @staticmethod
    def _empty_anomalies(spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            [],
            "itemid long, created long, clusterid int, trend_mean double, "
            "trend_std double",
        )
