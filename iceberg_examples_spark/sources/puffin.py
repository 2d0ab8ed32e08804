"""Puffin container + 64-bit roaring bitmaps: Iceberg v3's DELETION
VECTOR storage, from the public specs.

Puffin (iceberg.apache.org/puffin-spec): ``Magic Blob₁...Blobₙ Footer``
where Footer = ``Magic FooterPayload FooterPayloadSize Flags Magic``;
FooterPayload is JSON FileMetadata ({"blobs": [...], "properties":
{...}}), FooterPayloadSize a 4-byte LE int, Flags 4 bytes (bit 0 =
payload compressed — this writer never compresses). BlobMetadata
carries type / fields / snapshot-id / sequence-number / offset /
length / properties.

Deletion vector blob (iceberg spec v3, blob type
``deletion-vector-v1``): the positions of deleted rows in ONE data
file as a 64-bit roaring bitmap, laid out as
``combined-length (4B big-endian) | magic D1 D3 39 64 | portable
64-bit roaring bitmap | crc32c of (magic + bitmap) (4B big-endian)``.
Blob properties carry ``referenced-data-file`` and ``cardinality``.

The roaring serialization is the RoaringFormatSpec "portable" layout:
64-bit = u64 bucket count (8B LE) + per bucket (high-32-bits key, 4B
LE) a standard 32-bit roaring bitmap; 32-bit = cookie 12346
(no-run-containers, 4B LE), container count (4B LE), descriptive
headers (key u16, cardinality-1 u16), 4B offsets, then containers —
sorted u16 arrays up to 4096 values, 8 KiB bitmaps above. Run
containers are never EMITTED (this writer always serializes with
cookie 12346), but the READ path also accepts the run-format cookie
12347 — real Iceberg Java writers call runOptimize() before
serializing, so interop with upstream-written deletion vectors
requires decoding run containers: u16 cookie + u16 (container
count - 1), a run-flag bitset of ceil(n/8) bytes (bit i set = container
i is a run container), descriptive headers, offsets ONLY when n >= 4
(NO_OFFSET_THRESHOLD per the RoaringFormatSpec), then containers; a
run container is u16 run count then (start u16, length u16) pairs,
each covering [start, start+length] inclusive.

All pure Python over ``bytes`` — executor-friendly (a deletion vector
decodes inside a task, no SparkSession anywhere here).
"""

from __future__ import annotations

import json
import struct

MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DV_BLOB_TYPE = "deletion-vector-v1"

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX = 4096
_NO_OFFSET_THRESHOLD = 4  # RoaringFormatSpec: run format omits offsets below this

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected poly 0x82F63B78) — table-driven
# ---------------------------------------------------------------------------

_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = (c >> 8) ^ _CRC32C_TABLE[(c ^ b) & 0xFF]
    return c ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# roaring bitmaps (portable serialization)
# ---------------------------------------------------------------------------


def _serialize_roaring32(values: list[int]) -> bytes:
    """Portable 32-bit roaring over SORTED distinct uint32 values."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offsets: from the start of THIS 32-bit serialization
    off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
    for k in keys:
        out += struct.pack("<I", off)
        n = len(containers[k])
        off += 2 * n if n <= _ARRAY_MAX else 8192
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
    return bytes(out)


def _deserialize_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """-> (sorted uint32 values, next offset). Accepts both the
    no-run-container format this module writes (cookie 12346) and the
    run format real Iceberg Java writers emit after runOptimize()
    (cookie 12347) — see module docstring for the run layout."""
    cookie16 = struct.unpack_from("<H", buf, pos)[0]
    if cookie16 == _SERIAL_COOKIE_RUN:
        (size_m1,) = struct.unpack_from("<H", buf, pos + 2)
        n = size_m1 + 1
        p = pos + 4
        run_bits = buf[p : p + (n + 7) // 8]
        p += (n + 7) // 8
        headers = []
        for i in range(n):
            k, card_m1 = struct.unpack_from("<HH", buf, p)
            is_run = (run_bits[i >> 3] >> (i & 7)) & 1
            headers.append((k, card_m1 + 1, bool(is_run)))
            p += 4
        if n >= _NO_OFFSET_THRESHOLD:
            p += 4 * n  # offsets (recomputable; skipped)
    else:
        cookie32, n = struct.unpack_from("<ii", buf, pos)
        if cookie32 != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"unrecognized roaring cookie {cookie32}")
        p = pos + 8
        headers = []
        for _ in range(n):
            k, card_m1 = struct.unpack_from("<HH", buf, p)
            headers.append((k, card_m1 + 1, False))
            p += 4
        p += 4 * n  # offsets (recomputable; skipped)
    values: list[int] = []
    for k, card, is_run in headers:
        base = k << 16
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, p)
            p += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, p)
                p += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, p)
            values.extend(base | v for v in vals)
            p += 2 * card
        else:
            words = struct.unpack_from("<1024Q", buf, p)
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base | (wi << 6) | low.bit_length() - 1)
                    w ^= low
            p += 8192
    return values, p


def serialize_roaring64(positions) -> bytes:
    """Portable 64-bit roaring: u64 bucket count then (high-32 key,
    32-bit roaring) per bucket, keys ascending."""
    buckets: dict[int, list[int]] = {}
    for v in positions:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for k in sorted(buckets):
        out += struct.pack("<I", k)
        out += _serialize_roaring32(sorted(set(buckets[k])))
    return bytes(out)


def deserialize_roaring64(buf: bytes) -> list[int]:
    (n_buckets,) = struct.unpack_from("<Q", buf, 0)
    p = 8
    values: list[int] = []
    for _ in range(n_buckets):
        (key,) = struct.unpack_from("<I", buf, p)
        p += 4
        vals, p = _deserialize_roaring32(buf, p)
        values.extend((key << 32) | v for v in vals)
    return values


# ---------------------------------------------------------------------------
# deletion-vector blob payload
# ---------------------------------------------------------------------------


def encode_deletion_vector(positions) -> bytes:
    """positions (any iterable of int row ordinals) -> the v3 blob
    payload: length-prefixed magic+bitmap with a crc32c trailer."""
    bm = serialize_roaring64(sorted(set(positions)))
    body = DV_MAGIC + bm
    return struct.pack(">i", len(body)) + body + struct.pack(
        ">I", crc32c(body)
    )


def decode_deletion_vector(payload: bytes) -> list[int]:
    (n,) = struct.unpack_from(">i", payload, 0)
    body = payload[4 : 4 + n]
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    (crc,) = struct.unpack_from(">I", payload, 4 + n)
    if crc != crc32c(body):
        raise ValueError("deletion-vector crc32c mismatch")
    return deserialize_roaring64(body[4:])


# ---------------------------------------------------------------------------
# Puffin container
# ---------------------------------------------------------------------------


def write_puffin(
    path: str,
    blobs: list[dict],
    file_properties: dict | None = None,
) -> list[dict]:
    """Write a Puffin file. Each input blob dict: ``payload`` (bytes),
    ``type``, optional ``fields`` / ``snapshot-id`` / ``sequence-number``
    / ``properties``. Returns the BlobMetadata list (with offsets) as
    written to the footer — what manifest entries reference."""
    metas: list[dict] = []
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        off = len(MAGIC)
        for b in blobs:
            payload = b["payload"]
            meta = {
                "type": b["type"],
                "fields": b.get("fields", []),
                "snapshot-id": b.get("snapshot-id", -1),
                "sequence-number": b.get("sequence-number", -1),
                "offset": off,
                "length": len(payload),
            }
            if b.get("properties"):
                meta["properties"] = b["properties"]
            metas.append(meta)
            fh.write(payload)
            off += len(payload)
        footer_payload = json.dumps(
            {"blobs": metas, "properties": file_properties or {}}
        ).encode()
        fh.write(MAGIC)
        fh.write(footer_payload)
        fh.write(struct.pack("<i", len(footer_payload)))
        fh.write(b"\x00\x00\x00\x00")  # flags: payload not compressed
        fh.write(MAGIC)
    return metas


def read_puffin_footer(path: str) -> dict:
    """-> FileMetadata (the footer JSON)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError(f"{path!r} is not a Puffin file")
    (size,) = struct.unpack_from("<i", data, len(data) - 12)
    flags = data[len(data) - 8 : len(data) - 4]
    if flags[0] & 1:
        raise ValueError("compressed Puffin footers are not supported")
    payload = data[len(data) - 12 - size : len(data) - 12]
    return json.loads(payload.decode())


def read_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(offset)
        return fh.read(length)
