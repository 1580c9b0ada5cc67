"""Facade-verb driver queries — the command-language surface itself
(`query_router/src/lib.rs:1499-1538` dispatch) exercised end-to-end and
hash-checked, not just its DataFrame-level equivalents.

Each query constructs the engine (registers fixture views + derived graph
overlays) and runs one command string, so the driver evidence covers the
parse → dispatch → execute path the reference's users actually hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from neumann_spark.functions.vector import _DOT_CTE
from neumann_spark.graph.model import GRAPH_SQL_CTE
from neumann_spark.registry import register


@register(
    "facade_similar",
    oracle=_DOT_CTE.format(anchor=0, where="WHERE e.vec_id <> 0")
    + """
    SELECT CAST(vec_id AS VARCHAR) AS key,
           ROUND(dot / (n_e * n_q), 6) AS score
    FROM scored
    ORDER BY dot / (n_e * n_q) DESC, CAST(vec_id AS VARCHAR)
    LIMIT 10
    """,
)
def facade_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SIMILAR 'key' TOP k COSINE` through the facade (`neumann_parser`
    SimilarStmt → brute kNN): string-keyed store, anchor excluded, rounded
    cosine scores, (raw score, key) ordering."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute("SIMILAR '0' TOP 10 COSINE")


@register(
    "facade_neighbors",
    oracle=GRAPH_SQL_CTE
    + """
    SELECT u.dst AS neighbor_id, n.label, u.edge_type, u.weight
    FROM uedges u JOIN nodes n ON n.id = u.dst
    WHERE u.src = 1000001
    """,
)
def facade_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`NEIGHBORS id BOTH` through the facade (`neumann_parser`
    NeighborsStmt): supplier#1's undirected neighborhood (its nation +
    supplied customers), joined to node labels."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute("NEIGHBORS 1000001 BOTH")


@register(
    "facade_path",
    oracle=GRAPH_SQL_CTE.replace("WITH nodes", "WITH RECURSIVE nodes", 1)
    + """
    , walk AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS dist
      UNION ALL
      SELECT e.dst, w.dist + 1 FROM walk w JOIN uedges e ON e.src = w.node
      WHERE w.dist < 3
    )
    SELECT node, MIN(dist) AS dist FROM walk WHERE node = 17 GROUP BY node
    """,
)
def facade_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`PATH SHORTEST a -> b MAX d` through the facade (`neumann_parser`
    PathStmt): BFS hop distance between two customers, hash-checked against
    the recursive-walk oracle."""
    from neumann_spark.engine import NeumannSparkEngine

    eng = NeumannSparkEngine(spark, sf_dir)
    return eng.execute("PATH SHORTEST 1 -> 17 MAX 3")
