"""DML emulation — SURVEY.md §2.12.

The reference supports UPDATE/DELETE with a condition
(`relational_engine/src/lib.rs:3842,3954`) against its mutable slab. A batch
analytics engine over immutable parquet expresses the same semantics as
*recompute-and-replace*: UPDATE = projection with a CASE, DELETE = negated
filter; a real lakehouse deployment would land these as Delta/Iceberg MERGE
(jars not in this image — see `neumann_spark.sources`). The queries return
post-DML aggregates so the oracle can verify the transformed state.

Transactions (`relational_engine/src/transaction.rs`) are an explicit
non-goal for the batch engine (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.sqlutil import dsum, sql_dsum


def update_where(df: DataFrame, cond, assignments: dict) -> DataFrame:
    """UPDATE tbl SET col=expr WHERE cond (`relational_engine/src/lib.rs:3842`)
    as an immutable projection: rows matching `cond` get the new values.

    ONE select, not chained withColumn: SQL UPDATE is simultaneous
    assignment — every SET expression AND the WHERE predicate evaluate
    against the ORIGINAL row. Chaining withColumn made later assignments
    (and cond itself) re-resolve against already-rewritten columns, so
    `SET id = id + 100, v = 0 WHERE id IN (1, 3)` silently skipped the
    second assignment and `SET a = a + 1, b = a` committed b = old_a + 1
    while the engine validated b = old_a."""
    unknown = set(assignments) - set(df.columns)
    if unknown:
        raise ValueError(f"UPDATE of unknown column(s): {sorted(unknown)}")
    return df.select(*[
        (F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
         if c in assignments else F.col(c))
        for c in df.columns
    ])


def delete_where(df: DataFrame, cond) -> DataFrame:
    """DELETE FROM tbl WHERE cond (`relational_engine/src/lib.rs:3954`) as a
    negated filter (the reference itself uses a deletion bitmap, i.e. also
    logical deletion — `tensor_store/src/relational_slab.rs:2-13`).

    SQL three-valued logic: a row whose predicate evaluates to NULL is NOT
    deleted — a bare `filter(~cond)` would silently drop it (NULL negates
    to NULL, and filters drop non-TRUE), so survivors are rows where cond
    is anything but exactly TRUE."""
    return df.filter(~cond.eqNullSafe(F.lit(True)))


@register(
    "dml_update",
    oracle=f"""
    WITH updated AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    )
    SELECT o_orderstatus, {sql_dsum('o_totalprice', 4)} AS sum_price, COUNT(*) AS n
    FROM updated GROUP BY o_orderstatus
    """,
)
def dml_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE … WHERE as recompute-and-replace; verified via post-state agg."""
    o = load(spark, sf_dir, "orders")
    updated = update_where(
        o,
        F.col("o_orderstatus") == "F",
        {"o_totalprice": F.col("o_totalprice") * 1.1},
    )
    return updated.groupBy("o_orderstatus").agg(
        dsum("o_totalprice", 4).alias("sum_price"), F.count("*").alias("n")
    )


@register(
    "dml_delete",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE NOT (o_orderstatus = 'P' OR o_totalprice < 2000.0)
    GROUP BY o_orderpriority
    """,
)
def dml_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE … WHERE as negated filter; verified via post-state counts."""
    o = load(spark, sf_dir, "orders")
    kept = delete_where(
        o, (F.col("o_orderstatus") == "P") | (F.col("o_totalprice") < 2000.0)
    )
    return kept.groupBy("o_orderpriority").agg(F.count("*").alias("n"))
