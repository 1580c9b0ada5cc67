"""Source/sink format coverage beyond parquet: CSV, JSON-lines, and ORC
round-trips (SURVEY.md §2.1 scans/sources/sinks).

The reference ingests via INSERT and serves results as JSON
(`query_router/src/lib.rs:657-666` to_json); an analytics engine on Spark
additionally speaks the lake formats natively. Each query here WRITES a
fixture table to the format under /tmp and READS it back with an explicit
schema — the oracle is the same projection over the original parquet, so a
hash match proves the round-trip is lossless (sink encode + source decode +
schema application).

Scale notes: all three writers/readers are the built-in distributed ones
(per-partition files, no driver funnel); explicit schemas skip the
inference scan (an extra full read at 100 TB); CSV/JSON are line-splittable
so reads parallelize per HDFS block.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from neumann_spark.catalog import load
from neumann_spark.registry import register

_IO_ROOT = "/tmp/neumann_spark_io"

_NATION_ORACLE = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


def _tag(sf_dir: str) -> str:
    return os.path.basename(sf_dir.rstrip("/"))


@register("source_csv_roundtrip", oracle=_NATION_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV (headered) → read with explicit schema. Distributed
    write (one file per partition), splittable read, no inference pass."""
    path = f"{_IO_ROOT}/{_tag(sf_dir)}/nation_csv"
    df = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    df.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).option("header", True).csv(path)


@register("source_json_roundtrip", oracle=_NATION_ORACLE)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → JSON lines → schema'd read (the reference's result wire
    format, `query_router/src/lib.rs:659`)."""
    path = f"{_IO_ROOT}/{_tag(sf_dir)}/nation_json"
    df = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    df.write.mode("overwrite").json(path)
    return spark.read.schema(
        "n_nationkey int, n_name string, n_regionkey int"
    ).json(path)


@register(
    "source_orc_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region → ORC → read. Columnar alternative to parquet; predicate
    pushdown and column pruning work identically through the ORC reader."""
    path = f"{_IO_ROOT}/{_tag(sf_dir)}/region_orc"
    df = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df.write.mode("overwrite").orc(path)
    return spark.read.orc(path)
