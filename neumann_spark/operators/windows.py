"""Window functions — SURVEY.md §2.5 (superset; zero parity requirement).

The reference has no OVER clause anywhere in parser or engines; its closest
behavior is `top_k` on algorithm results (`graph_engine/src/lib.rs:1451`).
Spark's window functions are the idiomatic expression of that and far more.
Window aggs shuffle once on the partition key and sort within partitions —
at 100 TB the partition key (suppkey/orderkey) must be high-cardinality, as
here, so no single partition explodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.sqlutil import sql_dsum


@register(
    "win_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the Spark form of the reference's `top_k` result
    helpers (`graph_engine/src/lib.rs:1451`): row_number over a
    (partition, order) window, filtered to k. Unique-key tiebreak keeps it
    deterministic."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "win_running_sum",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate over an ordered frame — analytic
    superset (SURVEY.md §2.5). Decimal accumulation keeps the running totals
    bit-identical with the oracle."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


@register(
    "win_rank_lag",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           RANK()       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS drnk,
           LAG(s_suppkey)  OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS prev_supp,
           LEAD(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS next_supp
    FROM supplier
    """,
)
def win_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + lag/lead analytics (superset — SURVEY.md §2.5)."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("s_suppkey").over(w).alias("prev_supp"),
        F.lead("s_suppkey").over(w).alias("next_supp"),
    )


@register(
    "win_distribution_functions",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           NTILE(4)       OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS quartile,
           ROUND(PERCENT_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey), 8) AS pct_rank,
           ROUND(CUME_DIST()    OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey), 8) AS cume
    FROM supplier
    """,
)
def win_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions NTILE / PERCENT_RANK / CUME_DIST
    (superset — SURVEY.md §2.5; same single shuffle on the partition key as
    the ranking family). percent_rank/cume_dist are ratios of integer ranks
    — identical doubles in both engines, rounded defensively at 1e-8."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey")
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )
