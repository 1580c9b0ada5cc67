"""Full-text search — SURVEY.md §2.9 (graph fulltext over properties,
`graph_engine/src/fulltext.rs`, 723 LoC: tokenize → inverted index → ranked
match).

Spark-first: the "inverted index" is a (term, doc) DataFrame built by
explode — at scale it would be written once, partitioned by term, and
queries become partition-pruned lookups. Ranking is plain term-frequency
(the reference scores by match count too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register

SEARCH_TERMS = ("hash", "merge", "stream")


@register(
    "fulltext_search",
    oracle=f"""
    WITH terms AS (SELECT UNNEST(['hash', 'merge', 'stream']) AS term),
    tok AS (
      SELECT doc_id, u.w AS term
      FROM documents, UNNEST(str_split(text, ' ')) AS u(w)
    ),
    hits AS (
      SELECT t.doc_id, t.term, COUNT(*) AS tf
      FROM tok t JOIN terms q ON t.term = q.term
      GROUP BY t.doc_id, t.term
    )
    SELECT doc_id,
           COUNT(*) AS n_terms_matched,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM hits
    GROUP BY doc_id
    HAVING COUNT(*) = 3
    """,
)
def fulltext_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive (AND) full-text search for {hash, merge, stream} over
    documents, ranked by term frequency (`graph_engine/src/fulltext.rs`
    tokenize + match + rank). explode → term join → per-doc agg; the term
    list broadcasts."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    terms = spark.createDataFrame([(t,) for t in SEARCH_TERMS], "term string")
    hits = (
        tok.join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_terms_matched"), F.sum("tf").alias("total_tf"))
        .filter(F.col("n_terms_matched") == len(SEARCH_TERMS))
    )
