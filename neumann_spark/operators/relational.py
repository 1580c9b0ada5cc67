"""Relational core — SURVEY.md §2.1-2.2, §2.4, §2.6-2.8.

Capability parity with the reference's relational engine, expressed as
declarative DataFrame plans so Catalyst does pushdown/pruning/codegen:

* filter scans + condition trees     (`relational_engine/src/lib.rs:3045-3224`,
  `Condition` IR `:561-655`, SIMD columnar path `:6165-6447` — Spark analog is
  whole-stage codegen + parquet predicate pushdown)
* projection / column pruning        (`relational_engine/src/lib.rs:6455-6482`)
* DISTINCT full + subset             (`relational_engine/src/lib.rs:3485-3580`)
* aggregates COUNT/COUNT(col)/SUM/AVG/MIN/MAX, GROUP BY + HAVING
  (`relational_engine/src/lib.rs:4423-4767`, `select_grouped` `:3581-3674`)
* ORDER BY multi-key w/ null ordering, LIMIT/OFFSET
  (`query_router/src/lib.rs:4182-4253`, `:3961-3980`)
* the *parsed-but-unexecuted* expression surface of the reference — BETWEEN /
  IN / LIKE / NOT / arithmetic / CASE / string concat
  (`neumann_parser/src/expr.rs:7-18`) — executed here because Catalyst gives
  the full expression language for free (SURVEY.md §2.2 note)
* set operations UNION/INTERSECT/EXCEPT (§2.7 — absent in the reference,
  superset here)

Scale notes: every query below is a single scan → (optional shuffle) → agg
pipeline. Filters and projections reach the parquet reader (PushedFilters in
`.explain("formatted")`); group-bys use partial aggregation map-side; sorts
are total-order range-partitioned by Spark. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register
from neumann_spark.sqlutil import davg, dsum, sql_davg, sql_dsum


# --- §2.2 projection + predicate pushdown --------------------------------


@register(
    "rel_scan_projection",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45.0
    """,
)
def rel_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter scan + column pruning (`select_with_projection`,
    `relational_engine/src/lib.rs:6455`). Both the predicate and the 4-column
    projection push into the parquet scan — at 100 TB this reads ~4/11 of the
    columns and skips row groups via min/max stats."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 45.0).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "rel_filter_condition_tree",
    oracle=f"""
    SELECT l_linestatus,
           COUNT(*) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE (l_returnflag = 'R' AND l_quantity < 5.0)
       OR (l_discount > 0.09 AND l_tax < 0.02)
    GROUP BY l_linestatus
    """,
)
def rel_filter_condition_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR condition tree (`Condition::And/Or`,
    `relational_engine/src/lib.rs:561-655`). The reference evaluates this
    per-row (or via SIMD bitmap intersect/union `:6291-6447`); Spark compiles
    it into whole-stage-codegen'd vectorized predicates."""
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_returnflag") == "R") & (F.col("l_quantity") < 5.0)) | (
        (F.col("l_discount") > 0.09) & (F.col("l_tax") < 0.02)
    )
    return (
        li.filter(cond)
        .groupBy("l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )


@register(
    "rel_filter_expr_superset",
    oracle="""
    SELECT p_partkey, p_name, p_size,
           CASE WHEN p_size >= 25 THEN 'big' WHEN p_size >= 10 THEN 'mid' ELSE 'small' END AS size_class,
           p_brand || '/' || p_type AS brand_type,
           p_partkey % 7 AS bucket
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('ECONOMY', 'PROMO', 'STANDARD')
      AND p_name LIKE '%bolt%'
      AND NOT (p_brand = 'Brand#13')
    """,
)
def rel_filter_expr_superset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expression surface the reference *parses* but never executes —
    BETWEEN/IN/LIKE/NOT/CASE/concat/modulo (`neumann_parser/src/expr.rs:7-18`,
    router rejection `query_router/src/lib.rs:5812-5820`). Free in Catalyst;
    capability superset per SURVEY.md §2.2."""
    part = load(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_size").between(10, 30)
            & F.col("p_type").isin("ECONOMY", "PROMO", "STANDARD")
            & F.col("p_name").like("%bolt%")
            & ~(F.col("p_brand") == "Brand#13")
        )
        .select(
            "p_partkey",
            "p_name",
            "p_size",
            F.when(F.col("p_size") >= 25, "big")
            .when(F.col("p_size") >= 10, "mid")
            .otherwise("small")
            .alias("size_class"),
            F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
            (F.col("p_partkey") % 7).alias("bucket"),
        )
    )


# --- §2.4 DISTINCT --------------------------------------------------------


@register(
    "rel_select_distinct",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def rel_select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select_distinct` over all projected columns
    (`relational_engine/src/lib.rs:3485`). Spark: hash-dedupe with partial
    map-side combine — shuffles only the distinct keys."""
    return load(spark, sf_dir, "customer").select("c_mktsegment").distinct()


@register(
    "rel_distinct_subset",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def rel_distinct_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT on a column subset (`select_distinct` subset path,
    `relational_engine/src/lib.rs:3530-3580`) = `dropDuplicates(cols)`."""
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .dropDuplicates(["l_returnflag", "l_linestatus"])
    )


# --- §2.4 aggregates ------------------------------------------------------


@register(
    "rel_agg_global",
    oracle=f"""
    SELECT COUNT(*) AS count_all,
           COUNT(l_quantity) AS count_qty,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_davg('l_quantity')} AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def rel_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 6 ungrouped aggregates (COUNT(*)/COUNT(col)/SUM/AVG/
    MIN/MAX, `relational_engine/src/lib.rs:4423-4767`) in one pass. Spark
    computes all eight in a single scan with partial aggregation; COUNT(*)
    alone would be answered from parquet row-group metadata (the analog of
    the reference's O(1) `row_count` counter `:4423-4446`)."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("count_all"),
        F.count("l_quantity").alias("count_qty"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "rel_count_star",
    oracle="SELECT COUNT(*) AS n FROM orders",
)
def rel_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) without filter — the reference short-circuits to a metadata
    counter (`relational_engine/src/lib.rs:4423`); Spark answers from parquet
    footer row counts without reading data pages."""
    return load(spark, sf_dir, "orders").agg(F.count("*").alias("n"))


@register(
    "rel_agg_group_having",
    oracle=f"""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_davg('l_extendedprice')} AS avg_price
    FROM lineitem
    GROUP BY l_suppkey
    HAVING {sql_dsum('l_quantity')} > 14000.0
    """,
)
def rel_agg_group_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select_grouped` hash aggregation + HAVING
    (`relational_engine/src/lib.rs:3581-3674`, `HavingCondition` `:858-945`).
    Spark: map-side partial agg → shuffle on l_suppkey → final agg → filter.
    At 100 TB the shuffle carries only (suppkey, partials), not rows."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            davg("l_extendedprice").alias("avg_price"),
        )
        .filter(F.col("sum_qty") > 14000.0)
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount', 4)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship relational query — TPC-H Q1 shape over the reference's
    filter→group→agg→sort spine (`select_columnar` `relational_engine/src/
    lib.rs:6165` + `select_grouped` `:3581` + router ORDER BY
    `query_router/src/lib.rs:4182`). One scan, 4-wide group key space,
    partial agg makes the shuffle negligible at any scale."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "rel_agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def rel_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates — parsed by the reference (`ast.rs:1895-1903`
    `distinct` flag) but ignored by its executor; executed here
    (SURVEY.md §2.4 gap). Spark expands to a two-phase partial-distinct agg."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderpriority").alias("n_prios"),
    )


@register(
    "rel_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — absent in the reference (SURVEY.md §2.4
    "grouping sets / cube / rollup: free in Spark"); exposed as superset."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "rel_cube",
    oracle=f"""
    SELECT l_returnflag, l_linenumber, COUNT(*) AS n,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linenumber)
    """,
)
def rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (superset, SURVEY.md §2.4 — same family as
    `rel_rollup`): all 2^k group-by combinations in one pass, Spark expands
    to a single shuffle with a grouping-id column."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linenumber").agg(
        F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price")
    )


# --- §2.6 sorts / limits --------------------------------------------------


@register(
    "rel_order_limit_offset",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
)
def rel_order_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY multi-key + OFFSET/LIMIT (`query_router/src/lib.rs:4182-4253`,
    `:3961-3980`). Unique-key tiebreak makes the page deterministic. Spark
    turns sort+limit into a TakeOrdered top-k — no full sort materialization."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


@register(
    "rel_null_ordering",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, {sql_dsum('l_extendedprice')} AS big_price
      FROM lineitem WHERE l_quantity > 48.0 GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, b.big_price
    FROM orders o LEFT JOIN big b ON o.o_orderkey = b.l_orderkey
    WHERE o.o_totalprice > 450000.0
    ORDER BY b.big_price DESC NULLS LAST, o.o_orderkey
    """,
)
def rel_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS-LAST default ordering (`query_router/src/lib.rs:4243` — the
    reference sorts nulls last by default). Nulls are produced by an outer
    join, then ordered explicitly."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.filter(F.col("l_quantity") > 48.0)
        .groupBy("l_orderkey")
        .agg(dsum("l_extendedprice").alias("big_price"))
    )
    return (
        o.filter(F.col("o_totalprice") > 450000.0)
        .join(big, o.o_orderkey == big.l_orderkey, "left")
        .select("o_orderkey", "big_price")
        .orderBy(F.col("big_price").desc_nulls_last(), F.col("o_orderkey"))
    )


# --- §2.7 set operations (superset) ---------------------------------------


@register(
    "rel_set_ops",
    oracle="""
    WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer WHERE c_acctbal > 9000.0),
         sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier WHERE s_acctbal > 5000.0)
    SELECT nationkey, 'union' AS op FROM (SELECT * FROM cn UNION SELECT * FROM sn)
    UNION ALL
    SELECT nationkey, 'intersect' AS op FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
    UNION ALL
    SELECT nationkey, 'except' AS op FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
    """,
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION/INTERSECT/EXCEPT — absent in the reference (SURVEY.md §2.7);
    superset via Spark's native set operators."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    cn = (
        c.filter(F.col("c_acctbal") > 9000.0)
        .select(F.col("c_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    sn = (
        s.filter(F.col("s_acctbal") > 5000.0)
        .select(F.col("s_nationkey").cast("int").alias("nationkey"))
        .distinct()
    )
    return (
        cn.union(sn).distinct().withColumn("op", F.lit("union"))
        .unionAll(cn.intersect(sn).withColumn("op", F.lit("intersect")))
        .unionAll(cn.exceptAll(sn).distinct().withColumn("op", F.lit("except")))
    )


@register(
    "rel_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: rotate l_linestatus values into columns (absent in the
    reference; Spark-native superset per pyspark guide 'pivot/unpivot').
    The oracle states the same thing as conditional aggregation."""
    li = load(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")))
    )
    return pv.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_o"),
        F.col("F").cast("double").alias("qty_f"),
    )


@register(
    "rel_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90) per group — Spark's
    `percentile` == DuckDB's `quantile_cont` (continuous interpolation).
    The approximate production variant is `percentile_approx` (SURVEY.md
    §2.4 'approximate aggregates: superset')."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
    )


@register(
    "sql_api_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_api_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark SQL API path: same Catalyst plan as the DataFrame API, via
    `spark.sql` over registered temp views — the `SELECT` branch of the
    reference's keyword dispatch (`query_router/src/lib.rs:1499`, exec_select
    `:6119`) lowered onto a full SQL engine."""
    from neumann_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate > TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@register(
    "rel_json_extract",
    oracle=f"""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n,
           {sql_dsum('value', 4)} AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON access functions — the reference stores Json as an opaque column
    type with NO access functions (`relational_engine/src/lib.rs:86`,
    SURVEY.md §2.8); superset via get_json_object, aggregating events by the
    extracted key."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), dsum("value", 4).alias("sum_value"))
    )


@register(
    "rel_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year
    FROM orders WHERE o_orderkey % 997 = 0
    """,
)
def rel_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full typed surface of the reference's *parser* (INT/VARCHAR/
    DECIMAL/DATE/TIMESTAMP, `neumann_parser/src/ast.rs:354-391`) which its
    engine collapses to 6 types (SURVEY.md §1.2) — executed natively here:
    casts between long/string/decimal/date plus date-part extraction."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 997 == 0)
    # DATE/DECIMAL are exercised as intermediate types but emitted as
    # string/double: pandas round-trips them differently per engine
    # (duckdb dates → datetime64, decimals → float), which breaks hashing.
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price_dec"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    )


@register(
    "rel_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(1 AS INT) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct counting (HyperLogLog++) — SURVEY.md §2.4
    'approximate aggregates: absent in reference; superset'. HLL estimates
    aren't oracle-reproducible, so the registered output is the exact
    COUNT(DISTINCT) pair plus `approx_ok` = 1 iff the HLL estimate (rsd
    0.02) lands within 10% (5 sigma) of exact — a tolerance-free hash check
    that still fails if the sketch ever degrades. The tight 2%-error bound
    is asserted separately in tests."""
    li = load(spark, sf_dir, "lineitem")
    ok = (
        (
            F.abs(
                F.col("approx_orders").cast("double") - F.col("exact_orders")
            )
            <= 0.10 * F.col("exact_orders")
        )
        & (
            F.abs(F.col("approx_parts").cast("double") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        )
    ).cast("int")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select("l_returnflag", "exact_orders", "exact_parts", ok.alias("approx_ok"))
    )


@register(
    "rel_approx_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
           CAST(1 AS INT) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def rel_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch via
    `percentile_approx`) — the 100 TB path next to `rel_percentiles`'
    exact interpolation: exact per-group quantiles need the group's full
    sorted values, while the GK sketch is a bounded-size mergeable state
    (one map-side partial per partition, no sort). Sketch estimates aren't
    oracle-reproducible across engines, so (the `rel_approx_distinct`
    pattern) the registered output pins the EXACT quantiles plus
    `approx_ok` = 1 iff each approx value sits within the value span of
    the exact p50..p99 band edges widened by 10% — a hash-stable check
    that still fails if the sketch degrades."""
    li = load(spark, sf_dir, "lineitem")
    qs = [0.5, 0.9, 0.99]
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", F.array(*[F.lit(q) for q in qs]), 10_000
        ).alias("ap"),
        *[
            F.percentile("l_extendedprice", F.lit(q)).alias(f"ex{i}")
            for i, q in enumerate(qs)
        ],
    )
    span = F.col("ex2") - F.col("ex0")
    ok = None
    for i in range(len(qs)):
        cond = F.abs(F.col("ap")[i] - F.col(f"ex{i}")) <= 0.10 * span
        ok = cond if ok is None else (ok & cond)
    return agg.select(
        "l_returnflag",
        F.round("ex0", 4).alias("exact_p50"),
        F.round("ex1", 4).alias("exact_p90"),
        F.round("ex2", 4).alias("exact_p99"),
        ok.cast("int").alias("approx_ok"),
    )
