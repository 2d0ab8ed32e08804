"""Multimodal column plumbing (north-star extension, SURVEY §2.9).

Design: media payloads are opaque ``binary`` columns beside a typed
metadata struct — the lakehouse-native layout for images/audio/video at
100 TB (payload bytes stay columnar+compressed in parquet; metadata is
queryable without touching payloads; column pruning means metadata-only
queries never read the bytes).

The decode stage is REAL for two uncompressed formats (pure-Python
parsers below — no codec library needed):

- 24-bit BMP images: payloads are genuine BMP files and ``decode_image``
  walks the actual byte layout (magic, pixel-data offset, signed height,
  bottom-up row order, 4-byte row padding);
- 16-bit PCM WAV audio: payloads are genuine RIFF/WAVE files and
  ``decode_audio`` walks the chunk list (fmt validation, word alignment,
  little-endian int16 samples).

Compressed codecs (JPEG/PNG/FLAC/video) would slot into the same
``mapInPandas`` batch loop via Pillow/librosa — a one-function change —
and remain out of scope in this container.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_examples_spark.catalog import load_table, scratch_dir

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


def build_image_media_table(
    spark: SparkSession, sf_dir: str, max_media_id: int | None = None
) -> DataFrame:
    """Media table whose payloads are REAL BMP files (one deterministic
    image per document id), encoded executor-side in Arrow batches — the
    payload bytes never visit the driver.

    ``max_media_id`` bounds the table BEFORE the encode stage: a filter
    above ``mapInPandas`` cannot push through it, so filtering the input
    frame is the difference between encoding 50 payloads and encoding the
    whole corpus to keep 50."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    if max_media_id is not None:
        docs = docs.filter(F.col("doc_id") < max_media_id)

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


# ---- real WAV codec (pure Python, no external library) ------------------
#
# 16-bit PCM mono RIFF/WAVE: "RIFF" <size> "WAVE" + "fmt " chunk (PCM,
# channels, rate, block align, bits) + "data" chunk of little-endian
# int16 samples. Like the BMP path, payloads are genuine WAV files any
# audio player could open, and the decoder walks the actual chunk layout.

WAV_RATE = 8000


def _n_samples(doc_id: int) -> int:
    return 200 + doc_id % 50


def _sample(doc_id: int, i: int) -> int:
    """Deterministic generative sample in [-2048, 2047] — closed-form so
    the DuckDB oracle recomputes decoded statistics analytically."""
    return (doc_id * 31 + i * 37) % 4096 - 2048


def encode_wav(doc_id: int, rate: int = WAV_RATE) -> bytes:
    """Encode the deterministic synthetic clip for ``doc_id`` as a real
    16-bit PCM mono WAV file."""
    n = _n_samples(doc_id)
    data = b"".join(
        struct.pack("<h", _sample(doc_id, i)) for i in range(n)
    )
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_audio(payload: bytes) -> dict:
    """Real WAV decoder: walks the RIFF chunk list (not fixed offsets —
    tolerates extra chunks), validates PCM/16-bit/mono, and returns
    sample-rate, duration, and exact integer signal statistics (sum,
    energy = Σ s², min, max) that the oracle recomputes analytically."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            # a silent slice here would decode half a truncated clip and
            # return plausible-but-wrong statistics — reject instead
            raise ValueError(
                f"truncated WAV: chunk {cid!r} claims {size} bytes, "
                f"{len(payload) - pos - 8} remain"
            )
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"truncated WAV fmt chunk ({size} bytes)")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16 or rate <= 0:
                raise ValueError(
                    f"unsupported WAV variant (fmt={audio_fmt}, "
                    f"ch={channels}, rate={rate}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    sum_s = energy = 0
    min_s, max_s = 32767, -32768
    for i in range(n):
        (s,) = struct.unpack_from("<h", data, 2 * i)
        sum_s += s
        energy += s * s
        min_s = min(min_s, s)
        max_s = max(max_s, s)
    return {
        "n_samples": n,
        "sample_rate": rate,
        "duration_us": n * 1_000_000 // rate,
        "sum_s": sum_s,
        "energy": energy,
        "min_s": min_s,
        "max_s": max_s,
    }


def build_audio_media_table(
    spark: SparkSession, sf_dir: str, max_media_id: int | None = None
) -> DataFrame:
    """Media table whose payloads are REAL WAV files (one deterministic
    clip per document id), encoded executor-side in Arrow batches.
    ``max_media_id`` filters BEFORE the encode stage (see
    :func:`build_image_media_table`)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    if max_media_id is not None:
        docs = docs.filter(F.col("doc_id") < max_media_id)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [encode_wav(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "payload": payloads,
                    "kind": "wav",
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


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode → feature-extract stage over real WAV payloads: Arrow-batched
    ``mapInPandas`` calling :func:`decode_audio` per payload; no shuffle,
    bytes stay on the executor."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [decode_audio(p) for p in pdf["payload"]]
            out = pd.DataFrame(stats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.select("media_id", "payload").mapInPandas(
        compute,
        schema=(
            "media_id long, n_samples long, sample_rate long, "
            "duration_us long, sum_s long, energy long, "
            "min_s long, max_s long"
        ),
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
    media = build_image_media_table(spark, sf_dir, max_media_id=50)
    return image_stats(media)


def binary_files_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source coverage — how raw media corpora actually
    enter Spark: a directory of opaque files becomes (path,
    modificationTime, length, content) rows, keys recovered from
    filenames. Stage 1 exports real BMP files (one per sampled doc,
    ``encode_bmp`` payloads, atomic tmp+rename) from an Arrow-batched
    ``mapInPandas`` partition loop — the distributed file-export shape;
    on a cluster ``out`` is shared storage, in local mode the shared
    local FS. Stage 2 reads them back via ``binaryFile`` with a
    ``pathGlobFilter`` (pushed to the listing, so stray files are never
    opened), recovers doc_id from the filename, joins to the source rows
    (key-recovery check), and aggregates file/content byte totals. The
    oracle recomputes the totals analytically (BMP size is closed-form:
    54-byte headers + padded 40 B/row × 7 rows = 334 B/file). Scale
    notes: binaryFile caps per-file size (spark.sql.sources.binaryFile.
    maxLength) and is listing-bound for tiny files — exactly why the
    media TABLE layout (payload as a parquet binary column, multimodal_*
    queries) is this engine's primary format; this query is the
    ingestion edge that feeds it."""
    out = scratch_dir(sf_dir, "binary_files", fresh=True)
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.expr("doc_id % 20 = 0")
    ).select("doc_id")

    def export(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sizes = []
            for did in pdf["doc_id"]:
                payload = encode_bmp(int(did))
                tmp = os.path.join(out, f".{int(did)}.bmp.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(payload)
                os.replace(tmp, os.path.join(out, f"{int(did)}.bmp"))
                sizes.append(len(payload))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "n_bytes": sizes})

    # Materialize the export (the write job) before the listing-based read.
    docs.mapInPandas(export, schema="doc_id long, n_bytes long").count()

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bmp")
        .load(out)
    )
    keyed = files.select(
        F.regexp_extract(
            F.element_at(F.split("path", "/"), -1), r"^(\d+)\.bmp$", 1
        ).cast("long").alias("doc_id"),
        F.col("length"),
        F.octet_length("content").cast("long").alias("content_bytes"),
    )
    return keyed.join(docs, "doc_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("length").alias("total_bytes"),
        F.sum("content_bytes").alias("total_content_bytes"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end real audio decode: encode each doc's deterministic clip
    as an actual 16-bit PCM WAV payload, then parse those bytes back with
    the pure-Python RIFF decoder (chunk walk, fmt validation) and emit
    per-clip duration + exact signal statistics. The oracle recomputes
    the same statistics analytically from the generative sample formula,
    so any encode- or decode-side byte-layout bug (endianness, chunk
    offsets, sign handling) hash-mismatches."""
    media = build_audio_media_table(spark, sf_dir, max_media_id=50)
    return audio_stats(media)
