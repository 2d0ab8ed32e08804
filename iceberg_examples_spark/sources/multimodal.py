"""Multimodal column plumbing (north-star extension, SURVEY §2.9).

Design: media payloads are opaque ``binary`` columns beside a typed
metadata struct — the lakehouse-native layout for images/audio/video at
100 TB (payload bytes stay columnar+compressed in parquet; metadata is
queryable without touching payloads; column pruning means metadata-only
queries never read the bytes).

The decode stage is REAL for uncompressed 24-bit BMP (pure-Python header +
pixel-row parser below — no codec library needed): payloads are encoded as
genuine BMP files and ``decode_image`` walks the actual byte layout
(magic, pixel-data offset, signed height, bottom-up row order, 4-byte row
padding).  Compressed codecs (JPEG/PNG/audio) would slot into the same
``mapInPandas`` batch loop via Pillow/librosa — a one-function change —
and remain out of scope in this container.
"""

from __future__ import annotations

import struct
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


# ---- real BMP codec (pure Python, no external library) ------------------
#
# 24-bit uncompressed Windows BMP: BITMAPFILEHEADER (14 bytes) +
# BITMAPINFOHEADER (40 bytes) + BGR pixel rows, each row padded to a
# 4-byte boundary, rows stored bottom-up unless height is negative.

IMG_W, IMG_H = 13, 7  # odd width on purpose: exercises nonzero row padding


def _pixel(doc_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic generative pixel (b, g, r) for synthetic images —
    closed-form so the DuckDB oracle can recompute decoded statistics
    analytically without running any Python."""
    b = (doc_id + 7 * x + 13 * y) % 256
    g = (3 * doc_id + 5 * x + y) % 256
    r = (5 * doc_id + x + 11 * y) % 256
    return b, g, r


def encode_bmp(doc_id: int, width: int = IMG_W, height: int = IMG_H) -> bytes:
    """Encode the deterministic synthetic image for ``doc_id`` as a real
    24-bit BMP file (bottom-up rows, padded): a byte-faithful stand-in for
    ingested image payloads that any image viewer could open."""
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    pixel_bytes = (row_bytes + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            rows.extend(_pixel(doc_id, x, y))
        rows.extend(b"\x00" * pad)
    return header + bytes(rows)


def decode_image(payload: bytes) -> dict:
    """Real BMP decoder: parses the actual byte layout (magic, pixel-data
    offset, signed height / bottom-up row order, 24bpp, 4-byte row
    padding) and returns dimensions plus per-channel statistics, including
    a position-weighted checksum (``wsum_b`` = Σ (1 + x + width·y)·blue)
    that is wrong if row order, padding, or channel order is mishandled —
    the oracle recomputes it analytically."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, height_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    if dib_size < 40 or planes != 1 or bpp != 24:
        raise ValueError(f"unsupported BMP variant (dib={dib_size}, bpp={bpp})")
    height = abs(height_raw)
    bottom_up = height_raw > 0
    row_stride = (width * 3 + 3) & ~3
    sum_b = sum_g = sum_r = wsum_b = 0
    for row in range(height):
        y = (height - 1 - row) if bottom_up else row
        base = data_offset + row * row_stride
        for x in range(width):
            b = payload[base + 3 * x]
            g = payload[base + 3 * x + 1]
            r = payload[base + 3 * x + 2]
            sum_b += b
            sum_g += g
            sum_r += r
            wsum_b += (1 + x + width * y) * b
    return {
        "width": width,
        "height": height,
        "sum_b": sum_b,
        "sum_g": sum_g,
        "sum_r": sum_r,
        "wsum_b": wsum_b,
    }


def build_image_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads are REAL BMP files (one deterministic
    image per document id), encoded executor-side in Arrow batches — the
    payload bytes never visit the driver."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [encode_bmp(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "kind": "bmp",
                    "source": pdf["source"],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    flat = docs.mapInPandas(
        encode,
        schema=(
            "media_id long, payload binary, kind string, "
            "source string, n_bytes long"
        ),
    )
    return flat.select(
        "media_id",
        "payload",
        F.struct("kind", "source", "n_bytes").alias("meta"),
    )


def image_stats(media: DataFrame) -> DataFrame:
    """Decode → feature-extract stage over real BMP payloads: Arrow-batched
    ``mapInPandas`` calling :func:`decode_image` per payload; no shuffle,
    bytes stay on the executor."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_image(p) for p in pdf["payload"]]
            out = pd.DataFrame(stats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema=(
            "media_id long, width long, height long, "
            "sum_b long, sum_g long, sum_r long, wsum_b long"
        ),
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
    """End-to-end real decode: encode each doc's deterministic image as an
    actual BMP payload, then parse those bytes back with the pure-Python
    BMP decoder (header, bottom-up rows, padding) and emit per-image
    dimension + channel statistics.  The oracle recomputes the same
    statistics analytically from the generative pixel formula, so any
    encode- or decode-side byte-layout bug (row order, stride padding,
    BGR channel order) hash-mismatches — the decode step is genuinely
    exercised, not stubbed."""
    media = build_image_media_table(spark, sf_dir).filter(
        F.col("media_id") < 50
    )
    return image_stats(media)
