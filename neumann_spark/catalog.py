"""Fixture catalog: parquet sources under a scale-factor directory.

The reference ingests rows via INSERT/EMBED/NODE commands into its tensor
store (SURVEY.md §2.1); this engine's sources are columnar parquet scans —
the idiomatic Spark entry point, with predicate pushdown and column pruning
for free. `load` is lazy: nothing is read until an action runs, so Catalyst
can push filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan for one fixture table.

    Mirrors the reference's table catalog (`relational_engine/src/lib.rs:2653`
    create_table / `:2815` list_tables) — here the catalog is the filesystem
    plus Spark's own catalog of temp views.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # Timestamp values hash against a UTC-naive DuckDB oracle; pin the
    # session timezone defensively in case the caller's session differs.
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # The events fixture has shipped `ts` as both TIMESTAMP(MICROS) and
        # TIMESTAMP(NANOS) across driver versions; Spark rejects nanos
        # natively, so branch on the dtype the reader actually produces and
        # only apply the nanos->micros truncation when `ts` came back as a
        # long (the `nanosAsLong` escape hatch).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = raw.schema["ts"].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            return raw.withColumn("ts", F.col("ts").cast("timestamp"))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API path."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
