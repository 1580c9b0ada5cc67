"""Bucketed tables: pre-shuffled persistent layout so equi-joins on the
bucket key co-locate without an Exchange — the 100 TB answer to repeated
big-big joins (pyspark guide: `bucketBy` → later joins co-locate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_shuffle(spark):
    from neumann_spark.catalog import load

    # managed tables land in ./spark-warehouse (warehouse.dir is a static
    # config); DROP TABLE in the finally removes the files
    try:
        load(spark, SF_DIR, "orders").write.bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).mode("overwrite").saveAsTable("b_orders")
        load(spark, SF_DIR, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).mode("overwrite").saveAsTable("b_lineitem")

        # force the sort-merge path (tiny fixtures would broadcast and skip
        # bucketing entirely); at 100 TB neither side broadcasts anyway
        prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_lineitem").join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: no shuffle (hash-partitioning Exchange)
            assert "Exchange hashpartitioning" not in plan, plan[:2000]
            assert "SortMergeJoin" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

        # and it is still correct
        expected = (
            load(spark, SF_DIR, "lineitem")
            .join(
                load(spark, SF_DIR, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_cluster_partition_pruning(spark, tmp_path):
    """The ANN scale claim made physical: write embeddings partitioned by
    their IVF cluster id, probe two lists, and assert the parquet scan
    prunes to exactly those partitions (PartitionFilters in the plan) —
    at 100 TB this is why a probe reads nprobe/k of the data."""
    from neumann_spark.pipeline.ann import ivf_index

    state, _ = ivf_index(spark, SF_DIR)
    dst = str(tmp_path / "emb_by_cluster")
    state.select("vec_id", "cluster").write.partitionBy("cluster").mode(
        "overwrite"
    ).parquet(dst)
    part = spark.read.parquet(dst)
    probed = part.filter(F.col("cluster").isin(2, 5))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split(
        "PartitionFilters"
    )[1][:200]
    # pruning is semantics-preserving
    expected = state.filter(F.col("cluster").isin(2, 5)).count()
    assert probed.count() == expected and expected > 0
