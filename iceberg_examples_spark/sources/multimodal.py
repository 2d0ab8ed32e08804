"""Multimodal column plumbing (north-star extension, SURVEY §2.9).

Design: media payloads are opaque ``binary`` columns beside a typed
metadata struct — the lakehouse-native layout for images/audio/video at
100 TB (payload bytes stay columnar+compressed in parquet; metadata is
queryable without touching payloads; column pruning means metadata-only
queries never read the bytes).

The decode step (JPEG/PNG/audio codecs) requires libraries not present in
this container, so decoding is STUBBED behind ``NotImplementedError``
with a deterministic fake feature extractor in its place — the Spark-side
plumbing (schema, Arrow batch shape, mapInPandas signature, partitioning)
is real and tested; swapping the fake for Pillow/librosa is a one-function
change inside the batch loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table

MEDIA_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<kind: string, source: string, n_bytes: long>"
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from ``documents``: payload = utf-8 bytes
    of the text (a deterministic stand-in for image bytes), metadata
    struct alongside. Real pipelines land here straight from ingestion."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text-bytes").alias("kind"),
            F.col("source").alias("source"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder — requires an image library not present in this
    container. The pipeline wiring calls :func:`fake_features` instead."""
    raise NotImplementedError(
        "image decoding requires e.g. Pillow; not available in this "
        "environment — use fake_features() for the plumbing path"
    )


def fake_features(payload: bytes, n_features: int = 8) -> list[int]:
    """Deterministic stand-in for feature extraction: byte-histogram over
    ``n_features`` buckets. Same shape/contract as a real embedding head."""
    feats = [0] * n_features
    for byt in payload:
        feats[byt % n_features] += 1
    return feats


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the payload column — the real
    decode/extract stage shape: mapInPandas, no shuffle, payload bytes
    never leave the executor."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [
                        fake_features(p, n_features) for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        compute, schema="media_id long, features array<long>"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the opaque payload (stand-in for video frame
    extraction): slice every n-th byte window as a new payload row.
    Demonstrates the 1→N explode shape of frame pipelines."""
    # (len-1) div n is the last frame index; exact multiples of the frame
    # size must not emit a trailing empty frame, and empty payloads get none
    return media.filter(F.expr("octet_length(payload) > 0")).select(
        "media_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int((octet_length(payload) - 1) / {every_n_bytes})),"
                f" i -> substring(payload, i * {every_n_bytes} + 1, {every_n_bytes}))"
            )
        ).alias("frame_idx", "frame_bytes"),
    )


# ---- declared query -----------------------------------------------------

def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata + payload-integrity query over the media table: per
    (kind, source) count, total bytes, and distinct payload digests.
    Exercises binary columns end-to-end (encode → md5 over bytes →
    aggregate) while reading metadata via column pruning."""
    media = build_media_table(spark, sf_dir)
    return (
        media.select(
            F.col("meta.kind").alias("kind"),
            F.col("meta.source").alias("source"),
            F.col("meta.n_bytes").alias("n_bytes"),
            F.md5("payload").alias("digest"),
        )
        .groupBy("kind", "source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("digest").alias("n_distinct_payloads"),
        )
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing query: byte-histogram features for the
    first 50 media items (bounded output), exploded to (media_id,
    feature_idx, value) for SQL-comparable form."""
    media = build_media_table(spark, sf_dir).filter(F.col("media_id") < 50)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.posexplode("features").alias("feature_idx", "value"),
    ).select(
        "media_id",
        F.col("feature_idx").cast("bigint").alias("feature_idx"),
        F.col("value").cast("bigint").alias("value"),
    )
