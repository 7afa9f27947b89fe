"""SparkSession factory tuned for the validation engine.

Defaults chosen for scale (see SURVEY.md §4): AQE on (runtime coalescing +
skew-join splitting), Arrow on (every pandas UDF crosses via Arrow batches,
never per-row pickling), shuffle partitions sized to the parallelism level so
local benchmarks at local[8] vs local[32] exercise the same plan shapes a
multi-executor cluster would.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cpus: int | None = None,
    app_name: str = "pyad2-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cpus=None → local[*]. ``shuffle_partitions`` defaults to 2× the core
    count: big enough that AQE has room to coalesce, small enough that
    sf-small benchmarks aren't dominated by task scheduling.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else 0
    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or max(2 * (cpus or os.cpu_count() or 8), 8)
    # -Xms must track the RESOLVED heap size: an extra_conf override of
    # spark.driver.memory below the env default would otherwise pair
    # -Xms8g with a smaller -Xmx and the JVM refuses to start
    driver_mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g")
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, dynamic join-strategy switch. At 100 TB this is what
        # keeps a skewed groupBy/join from stalling on one hot partition.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for all pandas <-> Spark transfer (pandas UDFs, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # Keep scan splits reasonable for local parquet; on a cluster this
        # is the knob that bounds per-task memory at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", driver_mem)
        # this class of host serializes first-touch page supply (~67 MB/s)
        # while reused pages run at memory speed: pre-touch the whole heap
        # once at startup (outside any measured region) so the JVM never
        # grows mid-job, and keep GC from shrinking/regrowing it.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xms" + driver_mem + " -XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
