"""Iceberg partition transforms (spec Appendix B) in pure Python/numpy.

The reference's partitioned-table demo builds its spec with
``PartitionSpec.builderFor(schema).identity("name").bucket("age", 5)``
(IcebergPartitionedTable.java:31). Iceberg's ``bucket[N]`` is defined as
``(murmur3_x86_32(encode(v)) & Integer.MAX_VALUE) % N`` with spec-fixed
encodings: int/long/date/timestamp hash their value as an 8-byte
little-endian long, strings hash their UTF-8 bytes — seed 0, NOT Spark's
``hash()`` (seed 42, different layout), so an engine that wants its
bucket values to agree with Java-written Iceberg tables must implement
the spec hash itself.

Two call paths:

- :func:`bucket_value` — one driver-side value (planning: transform a
  predicate literal to prune manifests);
- :func:`bucket_series` — a numpy-vectorized batch for the WRITE path:
  murmur3 over a fixed 8-byte block has a constant two-block structure,
  so the whole hash runs as uint32 array arithmetic inside a pandas UDF
  (no per-row Python in the distributed path). String buckets fall back
  to a per-row loop over UTF-8 bytes (variable-length input defeats the
  fixed-block vectorization; string bucket columns are planning-time
  literals far more often than write-path columns).

``truncate[W]``, ``year/month/day`` for dates complete the transform
set the engine's format layer supports (iceberg_native.py).
"""

from __future__ import annotations

import datetime
import decimal as _decimal
import struct
import uuid as _uuid

import numpy as np

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x: np.ndarray | np.uint32, r: int):
    # uint32 arithmetic wraps; numpy emits overflow warnings we silence
    # at the call sites via errstate
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def _mix_block(h: np.ndarray | np.uint32, k: np.ndarray | np.uint32):
    k = (k * _C1) & np.uint32(0xFFFFFFFF)
    k = _rotl32(k, 15)
    k = (k * _C2) & np.uint32(0xFFFFFFFF)
    h = h ^ k
    h = _rotl32(h, 13)
    return (h * np.uint32(5) + np.uint32(0xE6546B64)) & np.uint32(0xFFFFFFFF)


def _fmix(h):
    h = h ^ (h >> np.uint32(16))
    h = (h * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
    h = h ^ (h >> np.uint32(13))
    h = (h * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
    return h ^ (h >> np.uint32(16))


def murmur3_long_series(values: np.ndarray) -> np.ndarray:
    """murmur3_x86_32(little-endian 8 bytes of each int64), seed 0 —
    fully vectorized: an 8-byte input is exactly two 4-byte blocks, no
    tail, len=8 finalization."""
    with np.errstate(over="ignore"):
        v = values.astype(np.int64).view(np.uint64)
        k1 = (v & np.uint64(0xFFFFFFFF)).astype(np.uint32)  # LE block 1
        k2 = (v >> np.uint64(32)).astype(np.uint32)         # LE block 2
        h = np.uint32(0)
        h = _mix_block(h, k1)
        h = _mix_block(h, k2)
        h = h ^ np.uint32(8)  # total byte length
        return _fmix(h)


def murmur3_bytes(data: bytes) -> int:
    """Scalar murmur3_x86_32 over arbitrary bytes, seed 0 (strings)."""
    with np.errstate(over="ignore"):
        h = np.uint32(0)
        n_blocks = len(data) // 4
        for i in range(n_blocks):
            (k,) = struct.unpack_from("<I", data, i * 4)
            h = _mix_block(h, np.uint32(k))
        tail = data[n_blocks * 4 :]
        if tail:
            k = np.uint32(int.from_bytes(tail, "little"))
            k = (k * _C1) & np.uint32(0xFFFFFFFF)
            k = _rotl32(k, 15)
            k = (k * _C2) & np.uint32(0xFFFFFFFF)
            h = h ^ k
        h = h ^ np.uint32(len(data))
        return int(_fmix(h))


_EPOCH = datetime.date(1970, 1, 1)


def _encode_days(v) -> int:
    return (v - _EPOCH).days if isinstance(v, datetime.date) else int(v)


def decimal_unscaled_bytes(v: "_decimal.Decimal") -> bytes:
    """The spec's decimal encoding: the UNSCALED value as a MINIMAL
    two's-complement big-endian byte array (hashing and single-value
    serialization share it; 14.20 -> 1420 -> 0x058C). The value's own
    exponent defines the scale — callers pruning against a typed column
    must quantize the literal to the COLUMN's scale first (a literal
    Decimal('5') hashes unscaled 5; the column's files carry 500 at
    scale 2)."""
    exp = v.as_tuple().exponent
    unscaled = int(v.scaleb(-exp))
    # minimal length: -128 is ONE byte (0x80), not two (0xFF80) — the
    # +8 padding form diverged from the spec at every -2^(8k-1)
    m = unscaled + 1 if unscaled < 0 else unscaled
    return unscaled.to_bytes(m.bit_length() // 8 + 1, "big", signed=True)


def bucket_value(v, n: int) -> int | None:
    """Driver-side bucket of one value (planning / predicate literals).
    null is never bucketed (spec: transforms preserve null)."""
    if v is None:
        return None
    if isinstance(v, str):
        h = murmur3_bytes(v.encode("utf-8"))
    elif isinstance(v, _decimal.Decimal):
        h = murmur3_bytes(decimal_unscaled_bytes(v))
    elif isinstance(v, _uuid.UUID):
        h = murmur3_bytes(v.bytes)  # the UUID's 16 big-endian bytes
    elif isinstance(v, (int, np.integer)) or isinstance(v, datetime.date):
        h = int(murmur3_long_series(np.array([_encode_days(v)]))[0])
    else:
        raise ValueError(f"bucket transform unsupported for {type(v)}")
    return (h & 0x7FFFFFFF) % n


def bucket_series(
    values, n: int, is_string: bool = False, is_decimal: bool = False
) -> np.ndarray:
    """Write-path batch bucketing (pandas UDF body)."""
    if is_decimal:
        return np.array(
            [
                -1
                if v is None
                else (murmur3_bytes(decimal_unscaled_bytes(v)) & 0x7FFFFFFF) % n
                for v in values
            ],
            dtype=np.int64,
        )
    if is_string:
        return np.array(
            [
                -1 if v is None else (murmur3_bytes(str(v).encode()) & 0x7FFFFFFF) % n
                for v in values
            ],
            dtype=np.int64,
        )
    arr = np.asarray(values, dtype=np.int64)
    return (
        (murmur3_long_series(arr).astype(np.int64) & 0x7FFFFFFF) % n
    ).astype(np.int64)


def truncate_value(v, w: int):
    """truncate[W]: strings → first W chars; integers → v - (v mod W)
    (mod takes the sign of the divisor, so negatives round DOWN —
    truncate(-1, 10) = -10, per spec)."""
    if v is None:
        return None
    if isinstance(v, str):
        return v[:w]
    if isinstance(v, _decimal.Decimal):
        # truncate on the UNSCALED value (spec: truncate(d, W) for
        # decimals scales W into the unscaled space)
        exp = v.as_tuple().exponent
        unscaled = int(v.scaleb(-exp))
        return _decimal.Decimal(unscaled - (unscaled % w)).scaleb(exp)
    return v - (v % w)


def temporal_value(v, unit: str) -> int | None:
    """year/month/day of a date, as Iceberg's integer partition values:
    years since 1970, months since 1970-01, days since epoch."""
    if v is None:
        return None
    if not isinstance(v, datetime.date):
        raise ValueError(f"temporal transform needs a date, got {type(v)}")
    if unit == "year":
        return v.year - 1970
    if unit == "month":
        return (v.year - 1970) * 12 + (v.month - 1)
    if unit == "day":
        return (v - _EPOCH).days
    raise ValueError(f"unknown temporal unit {unit!r}")
