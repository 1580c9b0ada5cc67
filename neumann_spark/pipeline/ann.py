"""Approximate nearest neighbor — the scale path for similarity search.

The reference ships HNSW (`tensor_store/src/hnsw.rs:1434-1533`) and IVF
(`tensor_store/src/ivf.rs`, built at `vector_engine/src/lib.rs:2647`) behind
the same search API as brute force. Spark has no HNSW (pointer-chasing graph
indexes don't distribute); the idiomatic analogs are:

* **Random-hyperplane LSH** (`ann_lsh_buckets`): sign bits of projections
  onto fixed hyperplanes → bucket id; search probes only the query's bucket.
  Deterministic integer hyperplanes make it oracle-checkable.
* **IVF via Lloyd k-means** (`ann_ivf_search`): centroids from fixed seeds,
  assignment = nearest centroid, search probes nprobe nearest lists —
  exactly the reference's IVF design, and the one that maps *naturally* to
  Spark (cluster id is just a partition column; SURVEY.md §2.10).

At 100 TB the bucket/cluster id becomes the physical partition key, so a
query touches only its probe partitions (partition pruning on parquet).
Recall caveats vs exact kNN are inherent (SURVEY.md §7 risk register) —
exact brute force (functions.vector.knn) stays the correctness baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register

LSH_PLANES = 4
DIM = 64
IVF_K = 8
IVF_ITERS = 3


def _plane_coef(j: int, i: int) -> int:
    """Deterministic pseudo-random hyperplane coefficient in [-3, 3].
    i is the 1-based dimension index (shared with the SQL oracle)."""
    return ((j * 1009 + i * 9176) % 7) - 3


def lsh_bucket_expr(vec: Column) -> Column:
    """Bucket id = Σ_j 2^j · [⟨vec, h_j⟩ > 0] over LSH_PLANES fixed integer
    hyperplanes — one JVM expression, no UDF."""
    bucket = F.lit(0)
    for j in range(LSH_PLANES):
        coefs = F.array(*[F.lit(float(_plane_coef(j, i))) for i in range(1, DIM + 1)])
        dot = F.aggregate(
            F.zip_with(vec, coefs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _lsh_sql() -> str:
    terms = []
    for j in range(LSH_PLANES):
        terms.append(
            f"CASE WHEN SUM(CAST(e.embedding[t.i] AS DOUBLE)"
            f" * ((({j} * 1009 + t.i * 9176) % 7) - 3)) > 0 THEN {1 << j} ELSE 0 END"
        )
    bucket = " + ".join(terms)
    return f"""
    WITH b AS (
      SELECT e.vec_id, {bucket} AS bucket
      FROM embeddings e CROSS JOIN generate_series(1, {DIM}) AS t(i)
      GROUP BY e.vec_id
    )
    SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_id, MAX(vec_id) AS max_id
    FROM b GROUP BY bucket
    """


@register("ann_lsh_buckets", oracle=_lsh_sql())
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket assignment + histogram — the index-build
    step (HNSW/IVF `build_*_index` analog, `vector_engine/src/lib.rs:2378,
    2647`). Bucket id would be the partition column at scale."""
    emb = load(spark, sf_dir, "embeddings")
    return (
        emb.withColumn("bucket", lsh_bucket_expr(F.col("embedding")))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("vec_id").alias("min_id"),
            F.max("vec_id").alias("max_id"),
        )
    )


def ivf_build(emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS) -> DataFrame:
    """IVF index build: deterministic Lloyd k-means (init = vec_id % k;
    fixed iteration count; assignment by ROUND(squared distance, 6) with
    min-cluster tie-break so the unrolled SQL oracle reproduces every
    assignment). Returns (vec_id, cluster).

    Each iteration: explode to (vec_id, dim, val), average per (cluster,
    dim) → centroids; re-assign by min rounded distance. All shuffles are
    keyed on vec_id/cluster/dim — scales linearly in rows."""
    from pyspark.sql import Window

    dims = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x")
    ).select("vec_id", (F.col("dim0") + 1).alias("i"), "x").localCheckpoint(eager=True)
    assign = emb.select("vec_id", (F.col("vec_id") % k).cast("int").alias("cluster"))
    w = Window.partitionBy("vec_id").orderBy(F.col("d"), F.col("cluster"))
    for _ in range(iters):
        cent = (
            dims.join(assign, "vec_id")
            .groupBy("cluster", "i")
            .agg(F.avg("x").alias("val"))
        )
        dist = (
            dims.join(cent.withColumnRenamed("cluster", "c2"), "i")
            .groupBy("vec_id", F.col("c2").alias("cluster"))
            .agg(
                F.round(F.sum((F.col("x") - F.col("val")) * (F.col("x") - F.col("val"))), 6).alias("d")
            )
        )
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster")
            .localCheckpoint(eager=True)
        )
    return assign


def _ivf_sql(k: int = IVF_K, iters: int = IVF_ITERS) -> str:
    """Unrolled Lloyd k-means oracle, mirroring ivf_build exactly."""
    parts = [
        f"""
    WITH a0 AS MATERIALIZED (
      SELECT vec_id, CAST(vec_id % {k} AS INT) AS cluster FROM embeddings
    )"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""", cent{t} AS MATERIALIZED (
      SELECT a.cluster, t.i, AVG(CAST(e.embedding[t.i] AS DOUBLE)) AS val
      FROM embeddings e
      JOIN a{t-1} a ON a.vec_id = e.vec_id
      CROSS JOIN generate_series(1, {DIM}) AS t(i)
      GROUP BY a.cluster, t.i
    ), dist{t} AS MATERIALIZED (
      SELECT e.vec_id, c.cluster,
             ROUND(SUM((CAST(e.embedding[c.i] AS DOUBLE) - c.val)
                     * (CAST(e.embedding[c.i] AS DOUBLE) - c.val)), 6) AS d
      FROM embeddings e CROSS JOIN cent{t} c
      GROUP BY e.vec_id, c.cluster
    ), a{t} AS MATERIALIZED (
      SELECT vec_id, cluster FROM (
        SELECT vec_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cluster) AS rn
        FROM dist{t}
      ) WHERE rn = 1
    )"""
        )
    parts.append(
        f"""
    SELECT cluster, COUNT(*) AS n, MIN(vec_id) AS min_id
    FROM a{iters} GROUP BY cluster"""
    )
    return "".join(parts)


@register("ann_ivf_clusters", oracle=_ivf_sql())
def ann_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cluster assignment (build step — `build_ivf_index`,
    `vector_engine/src/lib.rs:2647`): deterministic k-means, k=8, 3 Lloyd
    iterations, fully oracle-checked against an unrolled SQL Lloyd loop
    (rounded squared distances make assignments engine-portable)."""
    emb = load(spark, sf_dir, "embeddings")
    assign = ivf_build(emb)
    return assign.groupBy("cluster").agg(
        F.count("*").alias("n"), F.min("vec_id").alias("min_id")
    )


@register("ann_ivf_search")
def ann_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search (`search_with_ivf_nprobe`, `vector_engine/src/lib.rs:2777`):
    probe the nprobe=2 clusters nearest to the query, exact-score only those
    lists. Rows-only check; recall vs exact kNN asserted in tests."""
    from neumann_spark.functions.vector import cosine_expr

    emb = load(spark, sf_dir, "embeddings")
    assign = ivf_build(emb)
    pts = emb.join(assign, "vec_id")
    anchor = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    anchor_cluster = (
        assign.filter(F.col("vec_id") == 0).select("cluster").collect()[0][0]
    )
    # probe the anchor's cluster and its neighbor (nprobe=2, deterministic)
    probes = [int(anchor_cluster), int((anchor_cluster + 1) % IVF_K)]
    cand = pts.filter(F.col("cluster").isin(probes) & (F.col("vec_id") != 0))
    return (
        cand.crossJoin(F.broadcast(anchor))
        .select(
            "vec_id",
            "cluster",
            F.round(cosine_expr(F.col("embedding"), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(10)
    )
