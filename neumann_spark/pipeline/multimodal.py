"""Multimodal columns — LLM-pipeline extension (BASELINE.json north star).

Images/audio/video are opaque `binary` columns with typed metadata; decode /
feature-extract run as Arrow-batched `mapInPandas` stages. The decode step
itself is STUBBED (no image/audio libs in this container — clearly marked
below); everything Spark-side is real and tested: schema, batch iteration,
partition-preserving plumbing, and deterministic fake features so the
pipeline is end-to-end verifiable.

At 100 TB: binary payloads dominate I/O — the scan projects only (id, blob)
for decode stages, metadata-only queries never touch the blob column
(parquet column pruning), and `mapInPandas` streams batches without
materializing a partition in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neumann_spark.catalog import load
from neumann_spark.registry import register

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, media_type string, n_bytes int, checksum string"
)
FEATURE_SCHEMA = f"doc_id bigint, media_type string, n_bytes int, feature array<float>"


def media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the opaque-binary media table from documents: the text
    bytes stand in for an encoded image/audio payload. On real data this is
    `spark.read.format('binaryFile')` or a parquet with a binary column."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("checksum"),
    )


def decode_media(payload: bytes, media_type: str) -> bytes:
    """STUB: real deployments decode via PIL/ffmpeg/torchaudio here.
    Those libs are not in this container, so decoding raises — callers must
    use `extract_features` (deterministic fake) for tests."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg — not available in this image; "
        "use extract_features() which consumes the raw bytes deterministically"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    The *feature computation* is a deterministic stand-in (byte histogram
    folded to FEATURE_DIM floats) so the distributed plumbing — batch
    iteration, schema contract, no driver collect — is fully exercised; swap
    the inner function for a real model/decoder in production."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["media"]:
                acc = [0.0] * FEATURE_DIM
                for i, byte in enumerate(blob):
                    acc[i % FEATURE_DIM] += byte
                total = sum(acc) or 1.0
                feats.append([round(x / total, 6) for x in acc])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
                WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    WHERE doc_id % 2 = 0
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary media — the metadata-only path that
    must never read blob bytes at scale (column pruning does that here)."""
    m = media_df(spark, sf_dir).filter(F.col("doc_id") % 2 == 0)
    return m.select("doc_id", "media_type", "n_bytes", "checksum")


@register("multimodal_features")
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → feature vectors via mapInPandas (deterministic fake decode).
    Rows-only check (array<float> features; the plumbing is the product).
    Returns per-type feature aggregates to keep output compact."""
    feats = extract_features(media_df(spark, sf_dir))
    return (
        feats.select(
            "doc_id",
            "media_type",
            F.round(F.element_at("feature", 1).cast("double"), 6).alias("f0"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("f0"), 6).alias("avg_f0"),
        )
    )
