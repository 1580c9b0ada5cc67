"""As-of (temporal) join — training-data-pipeline extension.

Neither the reference nor vanilla Spark has a native as-of join (SURVEY.md
§2.3 "not present"; pyspark guide: bucketize or merge_asof). The scalable
formulation used here is the union+window trick: interleave both streams on
(key, time), then `last_value` of the right-side payload over the ordered
window gives each left row its most recent right match — one shuffle on the
key, no range explosion, works at any scale. (A `pd.merge_asof` per group
via applyInPandas is the alternative; that path is Python-side and loses
whole-stage codegen, so the window form is preferred.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: str,
) -> DataFrame:
    """For each left row, attach the greatest right_time ≤ left_time (and its
    payload) within the same key — backward as-of join."""
    l_tag = left.select(
        F.col(left_key).alias("k"),
        F.col(left_time).alias("t"),
        F.lit(1).alias("is_left"),
        F.lit(None).cast("double").alias("pl"),
    )
    r_tag = right.select(
        F.col(right_key).alias("k"),
        F.col(right_time).alias("t"),
        F.lit(0).alias("is_left"),
        F.col(payload).cast("double").alias("pl"),
    )
    both = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal t (is_left ascending) so an
    # exactly-equal timestamp matches, per merge_asof backward semantics
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t"), F.col("is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn("asof_t", F.last(F.when(F.col("is_left") == 0, F.col("t")), ignorenulls=True).over(w)) \
        .withColumn("asof_pl", F.last(F.when(F.col("is_left") == 0, F.col("pl")), ignorenulls=True).over(w))
    return matched.filter(F.col("is_left") == 1).select(
        F.col("k").alias(left_key),
        F.col("t").alias(left_time),
        F.col("asof_t"),
        F.col("asof_pl"),
    )


@register(
    "rel_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate FROM orders
      WHERE o_custkey < 150 AND o_orderkey % 11 = 0
    )
    SELECT o.o_custkey AS user_id, o.o_orderdate,
           MAX(e.ts) AS asof_t,
           (SELECT e2.value FROM events e2
             WHERE e2.user_id = o.o_custkey AND e2.ts = MAX(e.ts)
             ORDER BY e2.event_id LIMIT 1) AS asof_pl
    FROM o
    LEFT JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    GROUP BY o.o_orderkey, o.o_custkey, o.o_orderdate
    """,
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each sampled order picks up its customer's most
    recent event at or before the order date. The oracle states the same
    semantics as a correlated max; the Spark plan is the single-shuffle
    union+window form."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") < 150) & (F.col("o_orderkey") % 11 == 0)
    )
    ev = load(spark, sf_dir, "events")
    # deterministic payload at equal ts: keep min event_id's value
    ev_dedup = (
        ev.groupBy("user_id", "ts")
        .agg(F.min(F.struct("event_id", "value")).alias("s"))
        .select("user_id", "ts", F.col("s.value").alias("value"))
    )
    out = asof_join(
        o.select("o_custkey", "o_orderdate"),
        ev_dedup,
        left_key="o_custkey",
        right_key="user_id",
        left_time="o_orderdate",
        right_time="ts",
        payload="value",
    )
    return out.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "asof_t",
        "asof_pl",
    )
