"""Graph CRUD/lookup operators — SURVEY.md §2.9 (table 1).

Label/property lookups, degrees, 1-hop neighbors, and pattern (motif)
matching as DataFrame filters and joins. Each shuffles at most once on the
node/edge key; at 100 TB the edges table would be bucketed by `src` so
degree counts and neighbor expansion are map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.graph.model import (
    GRAPH_SQL_CTE,
    NATION_BASE,
    edges_df,
    nodes_df,
    undirected_edges,
)
from neumann_spark.registry import register


@register(
    "graph_find_nodes_by_label",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT id, label FROM nodes WHERE label = 'supplier'
    """,
)
def graph_find_nodes_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find_nodes_by_label` (`graph_engine/src/lib.rs:2897`) — a label
    filter over the nodes DataFrame (label would be a partition column at
    scale, making this partition pruning)."""
    return nodes_df(spark, sf_dir).filter(F.col("label") == "supplier")


@register(
    "graph_find_edges_by_type",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT src, dst, weight FROM edges
    WHERE edge_type = 'supplies' AND weight > 100000.0
    """,
)
def graph_find_edges_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`find_edges_by_type` + property predicate
    (`graph_engine/src/lib.rs:3064,3009`; `PropertyFilter` `:490-505`)."""
    e = edges_df(spark, sf_dir)
    return e.filter(
        (F.col("edge_type") == "supplies") & (F.col("weight") > 100000.0)
    ).select("src", "dst", "weight")


@register(
    "graph_degrees",
    oracle=GRAPH_SQL_CTE
    + """
    , outd AS (SELECT src AS id, COUNT(*) AS out_deg FROM edges GROUP BY src),
      ind  AS (SELECT dst AS id, COUNT(*) AS in_deg  FROM edges GROUP BY dst)
    SELECT n.id,
           COALESCE(o.out_deg, 0) AS out_deg,
           COALESCE(i.in_deg, 0) AS in_deg,
           COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) AS degree
    FROM nodes n
    LEFT JOIN outd o ON n.id = o.id
    LEFT JOIN ind  i ON n.id = i.id
    WHERE COALESCE(o.out_deg, 0) + COALESCE(i.in_deg, 0) >= 5
    """,
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """in/out/total degree (`graph_engine/src/lib.rs:3836-3923`) =
    `edges.groupBy(src/dst).count()` — two key-only shuffles, no node data
    movement. Filtered to degree ≥ 5 to keep output focused on hubs."""
    n = nodes_df(spark, sf_dir)
    e = edges_df(spark, sf_dir)
    outd = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_deg"))
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_deg"))
    return (
        n.join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias(
                "degree"
            ),
        )
        .filter(F.col("degree") >= 5)
    )


@register(
    "graph_neighbors",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT e.dst AS neighbor_id, n.label, e.edge_type, ROUND(e.weight, 2) AS weight
    FROM uedges e JOIN nodes n ON e.dst = n.id
    WHERE e.src = 17
    """,
)
def graph_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`neighbors(node, direction=Both)` (`graph_engine/src/lib.rs:4016-4093`)
    — 1-hop expansion of customer#17 (a supplies-dense node): filter on src
    (pushed down) + join to nodes for labels."""
    e = undirected_edges(edges_df(spark, sf_dir)).filter(F.col("src") == 17)
    n = nodes_df(spark, sf_dir)
    return e.join(n, e.dst == n.id).select(
        F.col("dst").alias("neighbor_id"),
        "label",
        "edge_type",
        F.round("weight", 2).alias("weight"),
    )


@register(
    "graph_neighbors_by_type",
    oracle=GRAPH_SQL_CTE
    + f"""
    , nation_members AS (
        SELECT src AS member_id, dst AS nation_id FROM edges
        WHERE edge_type = 'located_in'
    )
    SELECT nation_id - {NATION_BASE} AS nationkey, COUNT(*) AS n_members
    FROM nation_members GROUP BY nation_id
    """,
)
def graph_neighbors_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`neighbors` with an edge-type filter + degree-by-type
    (`graph_engine/src/lib.rs:3891` degree_by_type): members per nation via
    located_in in-degree."""
    e = edges_df(spark, sf_dir).filter(F.col("edge_type") == "located_in")
    return e.groupBy((F.col("dst") - NATION_BASE).alias("nationkey")).agg(
        F.count("*").alias("n_members")
    )


@register(
    "graph_motif_pattern",
    oracle=GRAPH_SQL_CTE
    + f"""
    SELECT a.dst - {NATION_BASE} AS nationkey,
           COUNT(*) AS n_pairs
    FROM edges a
    JOIN edges b ON a.dst = b.dst
    JOIN nodes na ON na.id = a.src AND na.label = 'customer'
    JOIN nodes nb ON nb.id = b.src AND nb.label = 'supplier'
    WHERE a.edge_type = 'located_in' AND b.edge_type = 'located_in'
    GROUP BY a.dst
    """,
)
def graph_motif_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern matching `match_pattern` / `count_pattern_matches`
    (`graph_engine/src/lib.rs:5945-6073`): the motif
    (a:customer)-[:located_in]->(n)<-[:located_in]-(b:supplier), counted per
    nation — GraphFrames-style motif as a self-join on the shared dst."""
    e = edges_df(spark, sf_dir).filter(F.col("edge_type") == "located_in")
    n = nodes_df(spark, sf_dir)
    a = (
        e.join(n.filter(F.col("label") == "customer"), e.src == n.id)
        .select(F.col("src").alias("cust"), F.col("dst").alias("nation"))
    )
    b = (
        e.join(n.filter(F.col("label") == "supplier"), e.src == n.id)
        .select(F.col("src").alias("supp"), F.col("dst").alias("nation_b"))
    )
    return (
        a.join(b, a.nation == b.nation_b)
        .groupBy((F.col("nation") - NATION_BASE).alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "cypher_match_edges",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT e.src AS c_id, e.dst AS n_id, e.weight
    FROM edges e
    WHERE e.edge_type = 'located_in' AND e.src < 1000000
      AND e.src % 50 = 1
    """,
)
def cypher_match_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher relationship-pattern MATCH through the engine facade
    (`neumann_parser/src/cypher.rs:15-210` parse; `query_router/src/
    cypher.rs:47` exec): `(c:customer)-[:located_in]->(n:nation)` with a
    WHERE filter — the pattern lowers to an edges⋈nodes⋈nodes join, driver
    hash-checked against the derived-graph SQL."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute(
        "MATCH (c:customer)-[:located_in]->(n:nation) "
        "WHERE c_id % 50 = 1 RETURN c, n, weight"
    )


@register(
    "cypher_node_match",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT id AS s_id, label AS s_label FROM nodes
    WHERE label = 'supplier' AND id % 5 = 3
    ORDER BY id LIMIT 40
    """,
)
def cypher_node_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher node-only MATCH with WHERE/ORDER BY/LIMIT through the engine
    facade (`neumann_parser/src/cypher.rs` CypherNode clauses)."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute(
        "MATCH (s:supplier) WHERE s.id % 5 = 3 "
        "RETURN s, s_label ORDER BY s.id LIMIT 40"
    )


@register(
    "cypher_count_aggregate",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT e.dst AS n_id, COUNT(*) AS n_customers,
           CAST(COUNT(DISTINCT e.src) AS BIGINT) AS distinct_customers
    FROM edges e
    WHERE e.edge_type = 'located_in' AND e.src < 1000000
    GROUP BY e.dst
    """,
)
def cypher_count_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher RETURN aggregation (`neumann_parser/src/cypher.rs:158`
    `COUNT(p) AS total`, the documented aggregate return item): COUNT and
    COUNT(DISTINCT) with Cypher's implicit grouping — non-aggregated
    RETURN items become the grouping keys. Lowers to groupBy over the
    pattern join; hash-checked against the derived-graph SQL."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute(
        "MATCH (c:customer)-[:located_in]->(n:nation) "
        "RETURN n, COUNT(c) AS n_customers, "
        "COUNT(DISTINCT c) AS distinct_customers"
    )


@register(
    "cypher_varlength_filtered",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT l.src AS c_id, p.dst AS x_id, CAST(2 AS INT) AS hops
    FROM edges l JOIN edges p ON l.dst = p.src
    WHERE l.edge_type = 'located_in' AND p.edge_type = 'part_of'
      AND l.src < 1000000 AND l.src % 100 = 7
    """,
)
def cypher_varlength_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cypher variable-length pattern with WHERE and a property-map
    endpoint filter (`neumann_parser/src/cypher.rs:15-210` allows
    `MATCH (a)-[*1..5]->(b) WHERE ...`; `find_variable_paths`
    `graph_engine/src/lib.rs:5405`): customers reaching a region within
    two hops (customer -> nation -> region over the directed fixture
    edges), destination constrained by `{label: 'region'}` rather than a
    label tag, source thinned by the WHERE. The oracle states the only
    2-hop derivation explicitly (located_in ∘ part_of)."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute(
        "MATCH (c:customer)-[*1..2]->(x {label: 'region'}) "
        "WHERE c.id % 100 = 7 RETURN c, x, hops"
    )
