"""SparkSession factory tuned for the local[N] harness but configured the way
a 1000-executor cluster job would be: AQE on (runtime re-plan, skew-join
handling, partition coalescing), shuffle partitions sized to the parallelism,
UTC session timezone (so timestamp semantics match the DuckDB oracle), and
Arrow enabled for the few pandas-interchange paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "neumann_spark") -> SparkSession:
    """Create (or fetch) the tuned session.

    Scale notes (100 TB design): every knob here is also what you'd set on a
    real cluster — AQE re-plans shuffles from runtime stats (skew join
    splitting, dynamic coalescing), and broadcast threshold lets small dims
    (region/nation/supplier) avoid shuffles entirely. On a cluster the
    master/memory settings come from spark-submit instead.
    """
    n = cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # compute-dense stages (the ANN builds' pair-distance joins: tiny
        # shuffle BYTES, heavy per-row array math) are mis-coalesced by
        # byte-targeting AQE — at N=131K it folded the NN-descent joins
        # to 4 partitions, idling 28 of 32 cores. The env knob lets such
        # jobs pin a smaller advisory size (more post-AQE partitions)
        # without changing the default plan shape of everything else.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("NEUMANN_SPARK_ADVISORY_PARTITION_BYTES",
                               "67108864"))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("NEUMANN_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.crossJoin.enabled", "true")
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]")
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    spark = builder.master(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
