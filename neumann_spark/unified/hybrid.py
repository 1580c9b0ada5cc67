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
from neumann_spark.registry import register

RRF_K = 60          # standard RRF damping constant
FUSE_TOPN = 50      # per-retriever candidate list length
HYBRID_TOPK = 10

# the keyword leg reuses the BM25 query surface (same terms, k1, b)
from neumann_spark.pipeline.fulltext import BM25_B, BM25_K1, SEARCH_TERMS  # noqa: E402


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25): disjunctive BM25 over SEARCH_TERMS — the same
    single-shuffle inverted-index shape as `fulltext_bm25`."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    terms = spark.createDataFrame([(t,) for t in SEARCH_TERMS], "term string")
    dl = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score = idf * F.col("tf") * (BM25_K1 + 1.0) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
    )


_HYBRID_SQL = f"""
    WITH terms AS (SELECT UNNEST(['hash', 'merge', 'stream']) AS term),
    tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    dl AS (
      SELECT doc_id, len(str_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             AVG(CAST(dl AS DOUBLE)) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT t.doc_id, t.term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM tok t JOIN terms q ON t.term = q.term
      GROUP BY t.doc_id, t.term
    ),
    df AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ),
    bm25 AS (
      SELECT tf.doc_id,
             ROUND(SUM(
               LN(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * ({BM25_K1} + 1.0)
               / (tf.tf + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * d.dl / s.avgdl))
             ), 4) AS bm25
      FROM tf
      JOIN df ON df.term = tf.term
      JOIN dl d ON d.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    ),
    trank AS (
      SELECT doc_id, CAST(rn AS BIGINT) AS rank_text FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rn
        FROM bm25
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
      CROSS JOIN q
      CROSS JOIN generate_series(1, 64) AS t(i)
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

    # keyword leg: top-K on the rounded grid, then rank the K-row frame
    bm = _bm25_scores(spark, sf_dir)
    t_top = bm.orderBy(F.col("bm25").desc(), "doc_id").limit(FUSE_TOPN)
    wt = Window.orderBy(F.col("bm25").desc(), "doc_id")
    trank = t_top.select(
        "doc_id", F.row_number().over(wt).cast("bigint").alias("rank_text")
    )

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
