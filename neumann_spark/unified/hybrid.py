"""Hybrid keyword+vector retrieval with reciprocal-rank fusion.

The reference ships both retrieval engines — ranked full-text over an
inverted index (`graph_engine/src/fulltext.rs`, tokenize → index → rank)
and cosine kNN over embeddings (`vector_engine/src/lib.rs:1950`) — and a
unified router that composes engines in one query
(`tensor_unified/src/lib.rs:884` `find_similar_connected`). Hybrid RRF is
the standard fusion of exactly those two lists (Cormack & Clarke's
reciprocal-rank fusion, public IR literature): each retriever contributes
1/(K + rank), so documents found by BOTH modalities outrank documents
that only one retriever likes, without any score normalization across
incomparable scales (BM25 vs cosine).

Scale shape: each side is already the scale-correct form — BM25 is the
broadcast term-list inverted-index join with one doc_id shuffle, cosine
kNN is a map-only score + TakeOrderedAndProject. The fusion itself
full-outer-joins two K-row (top-K) frames — Spark plans full outer as a
sort-merge, whose exchange moves only ~2K rows — so the hybrid's cost is
the more expensive of its two legs, not a new data-sized shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from neumann_spark.catalog import load
from neumann_spark.pipeline.ann import DIM
from neumann_spark.registry import register

RRF_K = 60          # standard RRF damping constant
FUSE_TOPN = 50      # per-retriever candidate list length
HYBRID_TOPK = 10

# the keyword leg IS the registered BM25 surface — same Spark pipeline,
# same oracle CTEs, so the hybrid legs cannot drift from fulltext_bm25
from neumann_spark.pipeline.fulltext import (  # noqa: E402
    BM25_CORE_CTES,
    BM25_SCORE_FROM,
    BM25_SCORE_SQL,
    fulltext_bm25,
)
from neumann_spark.session import local_df  # noqa: E402


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25): the registered `fulltext_bm25` pipeline, projected
    to the fusion's two columns."""
    return fulltext_bm25(spark, sf_dir).select("doc_id", "bm25")


# keyword-leg CTEs (terms -> ranked top-K), shared by both hybrid oracles
_BM25_RANK_CTES = f"""{BM25_CORE_CTES},
    bm25 AS (
      SELECT tf.doc_id,
             {BM25_SCORE_SQL} AS bm25
      {BM25_SCORE_FROM}
    ),
    trank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank_text FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM bm25
      ) WHERE rn <= {FUSE_TOPN}
    )"""

# RRF fusion of trank (doc_id, rank_text) x vrank (doc_id, rank_vec)
_FUSION_SELECT = f"""
    SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
           t.rank_text, v.rank_vec,
           ROUND(COALESCE(1.0 / ({RRF_K} + t.rank_text), 0.0)
                 + COALESCE(1.0 / ({RRF_K} + v.rank_vec), 0.0), 6) AS rrf
    FROM trank t FULL OUTER JOIN vrank v ON v.doc_id = t.doc_id
    ORDER BY COALESCE(1.0 / ({RRF_K} + t.rank_text), 0.0)
             + COALESCE(1.0 / ({RRF_K} + v.rank_vec), 0.0) DESC,
             COALESCE(t.doc_id, v.doc_id)
    LIMIT {HYBRID_TOPK}
"""

_HYBRID_SQL = f"""
    WITH {_BM25_RANK_CTES},
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE))
               AS dot,
             SQRT(SUM(CAST(e.embedding[t.i] AS DOUBLE)
                      * CAST(e.embedding[t.i] AS DOUBLE))) AS n_e,
             SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE)
                      * CAST(q.qv[t.i] AS DOUBLE))) AS n_q
      FROM embeddings e
      CROSS JOIN q
      CROSS JOIN generate_series(1, {DIM}) AS t(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ),
    vrank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank_vec FROM (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND(dot / (n_e * n_q), 6) DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {FUSE_TOPN}
    )
    {_FUSION_SELECT}"""


def _hybrid_ann_sql() -> str:
    """Oracle for `hybrid_rrf_ann`: the graph-ANN build + T_LOW search
    CTEs produce the vector leg's top-10 (`vtop`, the same rescore the
    `ann_graph_rescore` oracle hashes), the shared BM25 CTEs produce the
    keyword top-50, and the shared fusion SELECT fuses them."""
    from neumann_spark.pipeline.ann import (
        GRAPH_T_LOW,
        PQ_TOPK,
        _graph_anchor_parts,
        _graph_build_parts,
    )

    parts = _graph_build_parts() + _graph_anchor_parts(0, GRAPH_T_LOW)
    parts.append(f""",
    vtop AS MATERIALIZED (
      SELECT s.vec_id, ROUND(SUM(uv.val * q.val), 6) AS score
      FROM short s
      JOIN u uv ON uv.vec_id = s.vec_id
      JOIN u q ON q.vec_id = 0 AND q.i = uv.i
      GROUP BY s.vec_id
      ORDER BY score DESC, s.vec_id
      LIMIT {PQ_TOPK}
    ),
    vrank AS (
      SELECT vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, vec_id) AS BIGINT)
               AS rank_vec
      FROM vtop
    ),
    {_BM25_RANK_CTES}
    {_FUSION_SELECT}""")
    return "".join(parts)


@register("hybrid_rrf_search", oracle=_HYBRID_SQL)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 keyword top-50 fused with cosine-kNN top-50
    by reciprocal-rank fusion (rrf = Σ 1/(60 + rank)), top-10 overall.
    The vector leg embeds the anchor document (vec_id 0 is doc 0's
    embedding; at SFs where |documents| > |embeddings| the un-embedded
    docs simply have no vector rank — RRF's COALESCE handles one-sided
    hits by construction).

    Both ranks order by the ROUNDED score (bm25@4dp, cosine@6dp) with a
    doc_id tiebreak — the same grid the oracles hash, so rank integers
    are engine-independent. Ranks are assigned AFTER each leg's top-K
    (TakeOrderedAndProject), so the window runs over a K-row frame, never
    a global single-partition sort; the fusion full-outer join moves two
    K-row frames. Reference anchors: ranked fulltext
    `graph_engine/src/fulltext.rs` (tokenize→index→rank), cosine kNN
    `vector_engine/src/lib.rs:1950`, cross-engine composition
    `tensor_unified/src/lib.rs:884`."""
    from neumann_spark.functions.vector import cosine_expr

    trank = _text_rank(spark, sf_dir)

    # vector leg: cosine vs anchor 0, rounded, top-K, rank the K-row frame
    emb = load(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(anchor))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_expr(F.col("embedding"), F.col("qv")), 6)
            .alias("cos"),
        )
    )
    v_top = scored.orderBy(F.col("cos").desc(), "doc_id").limit(FUSE_TOPN)
    wv = Window.orderBy(F.col("cos").desc(), "doc_id")
    vrank = v_top.select(
        "doc_id", F.row_number().over(wv).cast("bigint").alias("rank_vec")
    )
    return _fuse(trank, vrank)


def _text_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rank_text): BM25 top-K ranked on the rounded grid — the
    keyword leg shared by both hybrid surfaces."""
    bm = _bm25_scores(spark, sf_dir)
    t_top = bm.orderBy(F.col("bm25").desc(), "doc_id").limit(FUSE_TOPN)
    wt = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return t_top.select(
        "doc_id", F.row_number().over(wt).cast("bigint").alias("rank_text")
    )


def _fuse(trank: DataFrame, vrank: DataFrame) -> DataFrame:
    """RRF fusion of the two ranked legs — full-outer join of two K-row
    frames, fused score descending, doc_id tiebreak, top-10."""
    fused = trank.join(vrank, "doc_id", "full_outer")
    rrf_raw = (
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_text")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("rank_vec")), F.lit(0.0))
    )
    return (
        fused.withColumn("_rrf", rrf_raw)
        .orderBy(F.col("_rrf").desc(), "doc_id")
        .limit(HYBRID_TOPK)
        .select(
            "doc_id", "rank_text", "rank_vec",
            F.round("_rrf", 6).alias("rrf"),
        )
    )


@register("hybrid_rrf_ann", oracle=_hybrid_ann_sql())
def hybrid_rrf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval SERVED BY THE ANN INDEX (new r8): the vector leg
    is the kNN-graph index's round-synchronous search (the production
    path — bounded-frontier probes + ADC + exact rescore), not a brute
    corpus scan; fused with the BM25 keyword top-50 by the same RRF
    contract as `hybrid_rrf_search`. This is the composition a serving
    deployment actually runs — the exact-leg variant stays registered as
    the recall ceiling. The oracle chains the full graph build + search
    replay with the shared BM25 and fusion CTEs, so an index-side
    regression surfaces here too. Reference anchors: cross-engine router
    `tensor_unified/src/lib.rs:884`, HNSW serving path
    `tensor_store/src/hnsw.rs:1434-1533`."""
    from neumann_spark.pipeline.ann import (
        GRAPH_T_LOW,
        _graph_rescore_from,
        knn_graph_index,
    )

    vtop = _graph_rescore_from(
        spark, sf_dir, knn_graph_index(spark, sf_dir), GRAPH_T_LOW)
    wv = Window.orderBy(F.col("score").desc(), "vec_id")
    vrank = vtop.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wv).cast("bigint").alias("rank_vec"),
    )
    return _fuse(_text_rank(spark, sf_dir), vrank)


# --- three-engine flagship: hybrid RRF ∩ graph reachability (new r9) --------

CONNECTED_ANCHOR_NODE = 17   # same anchor as unified_similar_connected
CONNECTED_HOPS = 2


def _hybrid_connected_sql() -> str:
    """Oracle for `hybrid_rrf_connected`: the unified graph CTEs
    (recursive 2-hop reachability from node 17) + the embedding↔node
    mapping produce the allowed vec_id set; the BM25 CTEs score on
    corpus-global stats with the top-K restricted to allowed docs; the
    vector leg scores only allowed vectors; the shared fusion SELECT
    fuses the two ranked lists."""
    from neumann_spark.graph.traversal import RECURSIVE_CTE
    from neumann_spark.unified.entities import _EMB_NODES_SQL

    return (RECURSIVE_CTE + _EMB_NODES_SQL + f""",
    {BM25_CORE_CTES},
    bm25 AS (
      SELECT tf.doc_id,
             {BM25_SCORE_SQL} AS bm25
      {BM25_SCORE_FROM}
    ),
    reach AS (
      SELECT CAST({CONNECTED_ANCHOR_NODE} AS BIGINT) AS node, 0 AS dist
      UNION ALL
      SELECT e.dst, r.dist + 1 FROM reach r JOIN uedges e ON e.src = r.node
      WHERE r.dist < {CONNECTED_HOPS}
    ),
    reachable AS (SELECT node FROM reach GROUP BY node),
    alw AS MATERIALIZED (
      SELECT en.vec_id FROM emb_nodes en
      JOIN reachable r ON r.node = en.node_id
    ),
    trank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank_text FROM (
        SELECT b.doc_id,
               ROW_NUMBER() OVER (ORDER BY b.bm25 DESC, b.doc_id) AS rn
        FROM bm25 b JOIN alw a ON a.vec_id = b.doc_id
      ) WHERE rn <= {FUSE_TOPN}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id,
             SUM(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qv[t.i] AS DOUBLE))
               AS dot,
             SQRT(SUM(CAST(e.embedding[t.i] AS DOUBLE)
                      * CAST(e.embedding[t.i] AS DOUBLE))) AS n_e,
             SQRT(SUM(CAST(q.qv[t.i] AS DOUBLE)
                      * CAST(q.qv[t.i] AS DOUBLE))) AS n_q
      FROM embeddings e
      JOIN alw a ON a.vec_id = e.vec_id
      CROSS JOIN q
      CROSS JOIN generate_series(1, {DIM}) AS t(i)
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id
    ),
    vrank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank_vec FROM (
        SELECT vec_id AS doc_id,
               ROW_NUMBER() OVER (
                 ORDER BY ROUND(dot / (n_e * n_q), 6) DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= {FUSE_TOPN}
    )
    {_FUSION_SELECT}""")


@register("hybrid_rrf_connected", oracle=_hybrid_connected_sql())
def hybrid_rrf_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-engine flagship (new r9): hybrid BM25+cosine RRF retrieval
    restricted to entities within 2 graph hops of node 17 — the
    reference's signature cross-engine composition
    (`find_similar_connected`, `tensor_unified/src/lib.rs:884`) extended
    to its ranked-fulltext engine (`graph_engine/src/fulltext.rs`) in one
    query: SIMILAR ∩ CONNECTED TO ∩ MATCH, fused by RRF.

    Scale shape: the bounded BFS produces a tiny reachable set, mapped to
    allowed vec_ids and BROADCAST to both legs BELOW their top-Ks (the
    `find_similar_connected` pre-filter pattern,
    `vector_engine/src/lib.rs:387-399`): the vector leg scores ONLY
    allowed vectors (semi-join below the cosine projection — at 100 TB
    the dot product runs over hundreds of rows, not the corpus); the
    keyword leg keeps corpus-global BM25 stats (df/avgdl are properties
    of the index, not the filter) but semi-joins the per-doc scores to
    allowed docs before its top-K, so the TakeOrdered ranks a bounded
    frame. Fusion is the shared K-row full-outer RRF."""
    from neumann_spark.functions.vector import cosine_expr
    from neumann_spark.graph.model import edges_df, undirected_edges
    from neumann_spark.graph.traversal import bfs_levels
    from neumann_spark.unified.entities import entity_embeddings

    e = undirected_edges(edges_df(spark, sf_dir))
    src = local_df(spark,
        [(CONNECTED_ANCHOR_NODE, CONNECTED_ANCHOR_NODE)],
        "source bigint, node bigint")
    reach = bfs_levels(e, src, CONNECTED_HOPS).select("node")
    en = entity_embeddings(spark, sf_dir)
    allowed = (
        en.join(F.broadcast(reach), en.node_id == reach.node)
        .select("vec_id")
    )

    # keyword leg: corpus-stat BM25, allowed-set semi-join BELOW the top-K
    bm = _bm25_scores(spark, sf_dir).join(
        F.broadcast(allowed.withColumnRenamed("vec_id", "doc_id")),
        "doc_id", "semi")
    t_top = bm.orderBy(F.col("bm25").desc(), "doc_id").limit(FUSE_TOPN)
    wt = Window.orderBy(F.col("bm25").desc(), "doc_id")
    trank = t_top.select(
        "doc_id", F.row_number().over(wt).cast("bigint").alias("rank_text"))

    # vector leg: pre-filter BELOW the cosine projection, then top-K
    emb = load(spark, sf_dir, "embeddings")
    anchor = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv"))
    cand = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(allowed), "vec_id", "semi")
    )
    scored = cand.crossJoin(F.broadcast(anchor)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(cosine_expr(F.col("embedding"), F.col("qv")), 6).alias("cos"),
    )
    v_top = scored.orderBy(F.col("cos").desc(), "doc_id").limit(FUSE_TOPN)
    wv = Window.orderBy(F.col("cos").desc(), "doc_id")
    vrank = v_top.select(
        "doc_id", F.row_number().over(wv).cast("bigint").alias("rank_vec"))
    return _fuse(trank, vrank)
