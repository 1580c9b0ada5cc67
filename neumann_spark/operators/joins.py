"""Joins — SURVEY.md §2.3.

The reference implements INNER/LEFT/RIGHT/FULL/CROSS/NATURAL hash joins
(`relational_engine/src/lib.rs:4021-4410`), always building on the right
table, with a rayon-parallel probe, and its router allows exactly ONE join
per query with `col = col` equality only (`query_router/src/lib.rs:3986-4112`).

Spark-first: we declare the join and let Catalyst choose broadcast-hash /
shuffled-hash / sort-merge from stats + AQE; small dims (region, nation,
supplier) broadcast so the 600k-row (→100 TB) fact side never shuffles for
them. We also lift the reference's restrictions (SURVEY.md §2.3 "not
present"): multi-join chains, semi/anti joins (the executable form of
EXISTS/IN subqueries the reference parses but rejects), and col-to-col /
theta predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.sqlutil import dsum, sql_dsum


def natural_join(a: DataFrame, b: DataFrame, how: str = "inner") -> DataFrame:
    """NATURAL JOIN: equi-join on all same-named columns
    (`relational_engine/src/lib.rs:4350-4410`). The reference degenerates to a
    cross join when no common columns exist — we mirror that."""
    common = [c for c in a.columns if c in set(b.columns)]
    if not common:
        return a.crossJoin(b)
    return a.join(b, on=common, how=how)


@register(
    "join_inner",
    oracle=f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS sum_price
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY c.c_mktsegment
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INNER hash join (`relational_engine/src/lib.rs:4021-4154`). customer
    is small relative to orders → broadcast-hash join, no shuffle of the
    fact side; at 100 TB the same plan holds as long as the dim fits the
    broadcast threshold, else AQE falls back to sort-merge."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        o.join(F.broadcast(c), c.c_custkey == o.o_custkey, "inner")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join (`relational_engine/src/lib.rs:4162-4202`); unmatched
    customers keep NULL order columns — COUNT(col) then counts 0 for them
    (non-null-only COUNT semantics, `:4480`)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM (SELECT * FROM customer WHERE c_acctbal < -900.0) c
    RIGHT JOIN (SELECT * FROM orders WHERE o_totalprice > 480000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join (`relational_engine/src/lib.rs:4210-4250`) — every
    qualifying order survives, customer side nullable."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -900.0)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 480000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "right").select("o_orderkey", "c_name")


@register(
    "join_full",
    oracle="""
    WITH poor AS (SELECT * FROM customer WHERE c_acctbal < -500.0),
         big  AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                  WHERE o_totalprice > 450000.0 GROUP BY o_custkey)
    SELECT COALESCE(p.c_custkey, b.o_custkey) AS custkey,
           p.c_acctbal, b.n
    FROM poor p FULL JOIN big b ON p.c_custkey = b.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with matched-set tracking
    (`relational_engine/src/lib.rs:4258-4307`): unmatched rows from BOTH
    sides survive with nulls."""
    poor = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < -500.0)
    big = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000.0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    j = poor.join(big, poor.c_custkey == big.o_custkey, "full")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_acctbal", "n"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join (`relational_engine/src/lib.rs:4316-4341`). The reference
    guards with MAX_CROSS_JOIN_ROWS; on Spark a cartesian of two broadcastable
    dims is a BroadcastNestedLoopJoin — cheap; large×large cartesians should
    be rejected at plan review instead (125 rows here)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_natural",
    oracle="""
    SELECT nationkey, n_name, r_name
    FROM (SELECT CAST(n_nationkey AS INT) AS nationkey, n_name,
                 CAST(n_regionkey AS INT) AS regionkey FROM nation) a
    NATURAL JOIN
    (SELECT CAST(r_regionkey AS INT) AS regionkey, r_name FROM region) b
    """,
)
def join_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL join on all shared column names
    (`relational_engine/src/lib.rs:4350-4410`), here `regionkey`."""
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("regionkey"),
    )
    r = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").cast("int").alias("regionkey"), "r_name"
    )
    return natural_join(n, r).select("nationkey", "n_name", "r_name")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 490000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — the executable form of the EXISTS subqueries the
    reference parses but rejects (`neumann_parser/src/ast.rs` EXISTS;
    `query_router/src/lib.rs:3920-3924` rejection). Semi-join shuffles only
    keys, never duplicates the probe side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS (SURVEY.md §2.3 'not present' list)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_acctbal"
    )


@register(
    "join_multi_q5",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def join_multi_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join chain (TPC-H Q5 shape) — the reference's router caps at ONE
    join per query (`query_router/src/lib.rs:3986` 'only 1 join'); lifted
    here. Plan shape at scale: lineitem⋈orders is the only big shuffle
    (AQE may pick SMJ); customer/supplier/nation/region broadcast."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), c.c_custkey == o.o_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@register(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, COUNT(*) AS n_richer
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    GROUP BY s.s_suppkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Col-to-col + inequality join predicate — the reference's WHERE
    translation only allows `col op literal` (`query_router/src/lib.rs:
    5769-5821`); Catalyst executes the equi-part as the join key and the
    inequality as a post-join filter."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer"))
    )


SALT_BUCKETS = 8


def salted_join(big: DataFrame, small: DataFrame, key: str, salt_src: Column, how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: salt the skewed big side into SALT_BUCKETS
    sub-keys and replicate the small side once per salt value, so one hot key
    spreads over SALT_BUCKETS tasks instead of one straggler. Semantically
    identical to `big.join(small, key, how)`.

    This is the manual form; `spark.sql.adaptive.skewJoin` does the same
    split from runtime stats. Kept explicit because (a) AQE only handles
    sort-merge joins and (b) at 100 TB you often know the hot keys up front
    (SURVEY.md §4: partition routing / skew is ours to encode)."""
    # pmod, not %: Spark's % keeps the sign of the dividend, and a negative
    # salt would never match the replicated 0..N-1 salt values (silent row
    # loss — caught by the salted-join property test)
    big_s = big.withColumn("_salt", F.pmod(salt_src, F.lit(SALT_BUCKETS)).cast("int"))
    salts = big.sparkSession.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(F.broadcast(salts))
    return big_s.join(small_r, [key, "_salt"], how).drop("_salt")


@register(
    "join_salted_skew",
    oracle=f"""
    WITH dim AS (
      SELECT DISTINCT l_returnflag AS flag,
             CASE l_returnflag WHEN 'R' THEN 'returned'
                               WHEN 'A' THEN 'acknowledged'
                               ELSE 'none' END AS flag_desc
      FROM lineitem
    )
    SELECT d.flag_desc,
           COUNT(*) AS n,
           {sql_dsum('l.l_extendedprice')} AS sum_price
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    GROUP BY d.flag_desc
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed join via explicit salting: lineitem has only 3 distinct
    l_returnflag values (extreme key skew — each key is ~1/3 of the table);
    the salted plan spreads each across 8 sub-partitions. The oracle is the
    plain join — salting must not change semantics."""
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_returnflag", "flag")
    dim = (
        li.select("flag").distinct()
        .withColumn(
            "flag_desc",
            F.when(F.col("flag") == "R", "returned")
            .when(F.col("flag") == "A", "acknowledged")
            .otherwise("none"),
        )
    )
    joined = salted_join(li, dim, "flag", F.col("l_orderkey"))
    return joined.groupBy("flag_desc").agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price")
    )
