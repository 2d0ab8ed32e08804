"""Iceberg transform functions vs the spec's published test vectors.

Appendix B of the Iceberg spec publishes reference hash values
(hash(34L) = 2017239379, hash("iceberg") = 1210000089, ...) precisely so
independent implementations can prove bucket-compatibility — an engine
whose buckets disagree would read a Java-written partitioned table
correctly but PRUNE the wrong files. These tests pin our murmur3 to
those vectors, the vectorized path to the scalar path, and the
truncate/temporal transforms to the spec's worked examples.
"""

from __future__ import annotations

import datetime

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.functions.iceberg_transforms import (
    bucket_series,
    bucket_value,
    murmur3_bytes,
    murmur3_long_series,
    temporal_value,
    truncate_value,
)


def _signed(u: int) -> int:
    return u - (1 << 32) if u >= (1 << 31) else u


def test_spec_appendix_b_hash_vectors():
    # int and long 34 hash identically (ints are hashed as 8-byte longs)
    assert _signed(int(murmur3_long_series(np.array([34]))[0])) == 2017239379
    # string "iceberg" hashes its UTF-8 bytes
    assert _signed(murmur3_bytes(b"iceberg")) == 1210000089
    # date 2017-11-16 hashes its days-from-epoch as a long
    days = (datetime.date(2017, 11, 16) - datetime.date(1970, 1, 1)).days
    assert days == 17486
    assert _signed(int(murmur3_long_series(np.array([days]))[0])) == -653330422


def test_bucket_value_examples():
    # spec worked example: bucket[16] of 34 = 2017239379 mod 16... the
    # positive-masked value
    assert bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_value("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16
    assert bucket_value(None, 16) is None
    assert bucket_value(datetime.date(2017, 11, 16), 8) == bucket_value(17486, 8)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_vectorized_long_hash_matches_bytes_hash(v):
    """The numpy two-block fast path equals the generic byte-stream
    implementation on the spec's little-endian-8-byte encoding."""
    expect = murmur3_bytes(v.to_bytes(8, "little", signed=True))
    got = int(murmur3_long_series(np.array([v], dtype=np.int64))[0])
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**31), max_value=2**31 - 1), min_size=1, max_size=64),
    st.sampled_from([2, 5, 16, 1024]),
)
def test_bucket_series_matches_scalar(vals, n):
    arr = bucket_series(vals, n)
    assert list(arr) == [bucket_value(v, n) for v in vals]


def test_bucket_series_strings():
    got = bucket_series(["iceberg", "a", None], 16, is_string=True)
    assert got[0] == bucket_value("iceberg", 16)
    assert got[2] == -1  # null sentinel on the write path


def test_truncate_transform():
    assert truncate_value(1, 10) == 0
    assert truncate_value(-1, 10) == -10  # rounds DOWN (spec)
    assert truncate_value(99, 10) == 90
    assert truncate_value("iceberg", 3) == "ice"
    assert truncate_value(None, 3) is None


def test_temporal_transforms():
    d = datetime.date(2017, 11, 16)
    assert temporal_value(d, "year") == 47
    assert temporal_value(d, "month") == 47 * 12 + 10
    assert temporal_value(d, "day") == 17486
    assert temporal_value(None, "month") is None


def test_spec_appendix_b_decimal_uuid_string_vectors():
    """The spec's remaining published hash vectors: decimal hashes the
    minimal two's-complement big-endian unscaled bytes, uuid its 16
    big-endian bytes, string its UTF-8 bytes."""
    import decimal
    import uuid

    from iceberg_examples_spark.functions.iceberg_transforms import (
        decimal_unscaled_bytes,
        murmur3_bytes,
    )

    assert decimal_unscaled_bytes(decimal.Decimal("14.20")) == b"\x05\x8c"
    assert _signed(murmur3_bytes(b"\x05\x8c")) == -500754589
    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert _signed(murmur3_bytes(u.bytes)) == 1488055340
    assert _signed(murmur3_bytes("iceberg".encode())) == 1210000089


def test_bucket_and_truncate_decimal_values():
    import decimal

    from iceberg_examples_spark.functions.iceberg_transforms import (
        bucket_series,
        bucket_value,
        truncate_value,
    )

    d = decimal.Decimal("14.20")
    assert bucket_value(d, 16) == ((-500754589) & 0x7FFFFFFF) % 16
    assert list(bucket_series([d, None, d], 16, is_decimal=True)) == [
        bucket_value(d, 16),
        -1,
        bucket_value(d, 16),
    ]
    # truncate[50] in the unscaled space: 14.20 -> 1420 -> 1400 -> 14.00
    assert truncate_value(d, 50) == decimal.Decimal("14.00")
    import uuid

    u = uuid.UUID("f79c3e09-677c-4bbd-a479-3f349cb785e7")
    assert bucket_value(u, 7) == (1488055340 & 0x7FFFFFFF) % 7
