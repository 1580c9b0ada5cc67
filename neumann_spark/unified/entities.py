"""Unified cross-engine operators — SURVEY.md §2.11, the reference's
signature capability: one entity key resolves to relational fields + an
embedding + graph edges simultaneously (`TensorData` well-known fields
`tensor_store/src/lib.rs:565-617`; `tensor_unified/src/lib.rs:475-1439`).

Spark mapping: an `entities` DataFrame joining the three surfaces on a
string key (`customer:<id>` / `supplier:<id>` …), plus composition
operators:

* `find_rows` — FIND … WHERE over entity fields → UnifiedItem-schema result
  (`tensor_unified/src/lib.rs:1129`; router `query_router/src/lib.rs:5453`)
* `find_similar_connected` — kNN ∩ graph reachability
  (`SIMILAR 'k' CONNECTED TO 'a'`, `tensor_unified/src/lib.rs:884`)
* `find_neighbors_by_similarity` — 1-hop neighbors ranked by embedding
  similarity (`NEIGHBORS … BY SIMILARITY`, `tensor_unified/src/lib.rs:1021`)

Embedding↔entity mapping (deterministic, oracle-reproducible):
vec_id < 250 → customer vec_id; vec_id ≥ 250 → supplier (vec_id - 250);
keys that don't exist at a given SF prune out via the entity join.

Scale shape: kNN side is a map-only scoring scan; reachability side is a
bounded BFS (frontier joins); their composition is a *semi-join* on node id,
so only candidate keys shuffle — never embeddings against the whole graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.functions.vector import cosine_expr
from neumann_spark.graph.model import SUPPLIER_BASE, edges_df, undirected_edges
from neumann_spark.graph.traversal import RECURSIVE_CTE, bfs_levels
from neumann_spark.registry import register
from neumann_spark.session import local_df

EMB_SUPPLIER_SPLIT = 250

# SQL mirror of the embedding→graph-node mapping
_EMB_NODES_SQL = f"""
, emb_nodes AS MATERIALIZED (
    SELECT CASE WHEN vec_id < {EMB_SUPPLIER_SPLIT} THEN CAST(vec_id AS BIGINT)
                ELSE CAST({SUPPLIER_BASE} + vec_id - {EMB_SUPPLIER_SPLIT} AS BIGINT)
           END AS node_id,
           vec_id, embedding
    FROM embeddings
)
"""


def entity_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings keyed by graph node id (`set_entity_embedding`,
    `vector_engine/src/lib.rs:3072-3235`)."""
    emb = load(spark, sf_dir, "embeddings")
    node_id = F.when(
        F.col("vec_id") < EMB_SUPPLIER_SPLIT, F.col("vec_id").cast("bigint")
    ).otherwise((F.lit(SUPPLIER_BASE) + F.col("vec_id") - EMB_SUPPLIER_SPLIT).cast("bigint"))
    return emb.select(node_id.alias("node_id"), "vec_id", "embedding")


def entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unified entities DataFrame: key, type, relational props, embedding
    flag, degree — one row per customer/supplier entity
    (`create_entity_unified`, `tensor_unified/src/lib.rs:475`)."""
    c = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("customer:"), F.col("c_custkey")).alias("key"),
        F.lit("customer").alias("type"),
        F.col("c_custkey").cast("bigint").alias("node_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("supplier:"), F.col("s_suppkey")).alias("key"),
        F.lit("supplier").alias("type"),
        (F.lit(SUPPLIER_BASE) + F.col("s_suppkey")).cast("bigint").alias("node_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    ent = c.unionAll(s)
    emb = entity_embeddings(spark, sf_dir).select("node_id", F.lit(True).alias("has_embedding"))
    deg = (
        undirected_edges(edges_df(spark, sf_dir))
        .groupBy(F.col("src").alias("node_id"))
        .agg(F.count("*").alias("degree"))
    )
    return (
        ent.join(emb, "node_id", "left")
        .join(deg, "node_id", "left")
        .select(
            "key",
            "type",
            "node_id",
            "name",
            "acctbal",
            F.coalesce("has_embedding", F.lit(False)).alias("has_embedding"),
            F.coalesce("degree", F.lit(0)).alias("degree"),
        )
    )


@register(
    "unified_entity_stats",
    oracle=RECURSIVE_CTE
    + _EMB_NODES_SQL
    + """
    , ent AS (
      SELECT CAST(c_custkey AS BIGINT) AS node_id, 'customer' AS type FROM customer
      UNION ALL
      SELECT CAST(1000000 + s_suppkey AS BIGINT), 'supplier' FROM supplier
    ),
    deg AS (SELECT src AS node_id, COUNT(*) AS degree FROM uedges GROUP BY src)
    SELECT e.type,
           COUNT(*) AS n_entities,
           CAST(SUM(CASE WHEN en.node_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_embedding,
           CAST(SUM(COALESCE(d.degree, 0)) AS BIGINT) AS total_degree
    FROM ent e
    LEFT JOIN emb_nodes en ON en.node_id = e.node_id
    LEFT JOIN deg d ON d.node_id = e.node_id
    GROUP BY e.type
    """,
)
def unified_entity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-store introspection: per-type counts, embedding coverage,
    total degree — the unified analog of list/count APIs
    (`tensor_unified/src/lib.rs:1326`)."""
    ent = entities(spark, sf_dir)
    return ent.groupBy("type").agg(
        F.count("*").alias("n_entities"),
        F.sum(F.col("has_embedding").cast("bigint")).alias("n_with_embedding"),
        F.sum("degree").alias("total_degree"),
    )


@register(
    "unified_find_rows",
    oracle="""
    SELECT 'relational' AS source,
           'customer:' || c_custkey AS id,
           c_name AS name,
           c_acctbal AS acctbal
    FROM customer
    WHERE c_acctbal > 9900.0
    """,
)
def unified_find_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIND ROWS WHERE condition → UnifiedItem schema (source, id, fields)
    (`find_rows` `tensor_unified/src/lib.rs:1129`, UnifiedItem schema per
    SURVEY.md §2.11)."""
    ent = entities(spark, sf_dir)
    return (
        ent.filter((F.col("type") == "customer") & (F.col("acctbal") > 9900.0))
        .select(
            F.lit("relational").alias("source"),
            F.col("key").alias("id"),
            "name",
            "acctbal",
        )
    )


@register(
    "unified_similar_connected",
    oracle=RECURSIVE_CTE
    + _EMB_NODES_SQL
    + """
    , anchor AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    reach AS (
      SELECT CAST(17 AS BIGINT) AS node, 0 AS dist
      UNION ALL
      SELECT e.dst, r.dist + 1 FROM reach r JOIN uedges e ON e.src = r.node
      WHERE r.dist < 2
    ),
    reachable AS (SELECT node, MIN(dist) AS dist FROM reach GROUP BY node),
    scored AS (
      SELECT en.node_id, en.vec_id,
             SUM(CAST(en.embedding[t.i] AS DOUBLE) * CAST(a.qv[t.i] AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(en.embedding[t.i] AS DOUBLE) * CAST(en.embedding[t.i] AS DOUBLE))) AS ne,
             SQRT(SUM(CAST(a.qv[t.i] AS DOUBLE) * CAST(a.qv[t.i] AS DOUBLE))) AS nq
      FROM emb_nodes en CROSS JOIN anchor a
      CROSS JOIN generate_series(1, 64) AS t(i)
      WHERE en.vec_id <> 0
      GROUP BY en.node_id, en.vec_id
    )
    SELECT s.node_id, s.vec_id, r.dist,
           ROUND(s.dot / (s.ne * s.nq), 6) AS score
    FROM scored s JOIN reachable r ON r.node = s.node_id
    ORDER BY s.dot / (s.ne * s.nq) DESC, s.node_id
    LIMIT 10
    """,
)
def unified_similar_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SIMILAR 'customer:0' TOP 10 CONNECTED TO 'customer:17'` — the
    flagship cross-engine composition (`find_similar_connected`,
    `tensor_unified/src/lib.rs:884`; router `query_router/src/lib.rs:5326`):
    cosine-kNN to entity 0's embedding, restricted (semi-join) to nodes
    within 2 hops of node 17, top 10.

    Scale shape: the BFS frontier is tiny (bounded hops), so the reachable
    set is broadcast-joined against the embeddings BEFORE the cosine
    projection — the reference's pre-filter strategy for selective filters
    (`vector_engine/src/lib.rs:387-399`, <10% selectivity → filter first).
    At 100 TB the dot product runs over only the few-hundred reachable
    vectors, never the full corpus."""
    emb = entity_embeddings(spark, sf_dir)
    anchor = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
    )
    e = undirected_edges(edges_df(spark, sf_dir))
    src = local_df(e.sparkSession, [(17, 17)], "source bigint, node bigint")
    reach = bfs_levels(e, src, 2).select("node", "dist")
    cand = emb.filter(F.col("vec_id") != 0).join(
        F.broadcast(reach), emb.node_id == reach.node
    )
    return (
        cand.crossJoin(F.broadcast(anchor))
        .select(
            "node_id",
            "vec_id",
            "dist",
            cosine_expr(F.col("embedding"), F.col("qv")).alias("raw_score"),
        )
        .orderBy(F.col("raw_score").desc(), F.col("node_id"))
        .limit(10)
        .select(
            "node_id", "vec_id", "dist", F.round("raw_score", 6).alias("score")
        )
    )


@register(
    "unified_neighbors_by_similarity",
    oracle=RECURSIVE_CTE
    + _EMB_NODES_SQL
    + f"""
    , anchor AS (
        SELECT embedding AS qv FROM embeddings
        WHERE vec_id = {EMB_SUPPLIER_SPLIT} + 5
    ),
    nbrs AS (SELECT DISTINCT dst AS node FROM uedges WHERE src = {SUPPLIER_BASE} + 5),
    scored AS (
      SELECT en.node_id, en.vec_id,
             SUM(CAST(en.embedding[t.i] AS DOUBLE) * CAST(a.qv[t.i] AS DOUBLE)) AS dot,
             SQRT(SUM(CAST(en.embedding[t.i] AS DOUBLE) * CAST(en.embedding[t.i] AS DOUBLE))) AS ne,
             SQRT(SUM(CAST(a.qv[t.i] AS DOUBLE) * CAST(a.qv[t.i] AS DOUBLE))) AS nq
      FROM emb_nodes en
      JOIN nbrs nb ON nb.node = en.node_id
      CROSS JOIN anchor a
      CROSS JOIN generate_series(1, 64) AS t(i)
      GROUP BY en.node_id, en.vec_id
    )
    SELECT node_id, ROUND(dot / (ne * nq), 6) AS score
    FROM scored
    ORDER BY dot / (ne * nq) DESC, node_id
    LIMIT 10
    """,
)
def unified_neighbors_by_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`NEIGHBORS 'supplier:5' BY SIMILARITY` (`find_neighbors_by_similarity`,
    `tensor_unified/src/lib.rs:1021`): 1-hop neighbors of supplier#5 ranked
    by cosine to its embedding (neighbors without embeddings are skipped,
    matching the reference's behavior)."""
    anchor_vec = EMB_SUPPLIER_SPLIT + 5
    emb = entity_embeddings(spark, sf_dir)
    anchor = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == anchor_vec)
        .select(F.col("embedding").alias("qv"))
    )
    nbrs = (
        undirected_edges(edges_df(spark, sf_dir))
        .filter(F.col("src") == SUPPLIER_BASE + 5)
        .select(F.col("dst").alias("node"))
        .distinct()
    )
    return (
        emb.join(nbrs, emb.node_id == nbrs.node)
        .crossJoin(F.broadcast(anchor))
        .select(
            "node_id",
            cosine_expr(F.col("embedding"), F.col("qv")).alias("raw"),
        )
        .orderBy(F.col("raw").desc(), F.col("node_id"))
        .limit(10)
        .select("node_id", F.round("raw", 6).alias("score"))
    )
