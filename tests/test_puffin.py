"""Puffin container + roaring bitmap codec pins (public specs:
iceberg.apache.org/puffin-spec, RoaringFormatSpec portable layout,
Iceberg v3 deletion-vector blob)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.sources.puffin import (
    DV_MAGIC,
    MAGIC,
    crc32c,
    decode_deletion_vector,
    deserialize_roaring64,
    encode_deletion_vector,
    read_blob,
    read_puffin_footer,
    serialize_roaring64,
    write_puffin,
)


def test_crc32c_known_answer():
    # the canonical CRC-32C check vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_roaring_layout_pins():
    """Byte-level pins: cookie 12346, container count, array container
    values — so the writer stays on the portable no-run layout."""
    blob = serialize_roaring64([1, 2, 70000])
    n_buckets, key = struct.unpack_from("<QI", blob, 0)
    assert (n_buckets, key) == (1, 0)
    cookie, n_containers = struct.unpack_from("<ii", blob, 12)
    assert cookie == 12346
    assert n_containers == 2  # low-16 split: 1,2 vs 70000
    # bitmap container kicks in above 4096 values
    dense = serialize_roaring64(list(range(5000)))
    assert len(dense) > 8192  # one 8 KiB bitmap container


def test_roaring_run_cookie_rejected():
    bad = struct.pack("<QI", 1, 0) + struct.pack("<ii", 12347, 1)
    with pytest.raises(ValueError, match="12347"):
        deserialize_roaring64(bad)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        max_size=2000,
    )
)
def test_roaring64_roundtrip(vals):
    want = sorted(set(vals))
    assert deserialize_roaring64(serialize_roaring64(want)) == want


def test_deletion_vector_blob_layout_and_crc():
    pos = [0, 5, 1 << 33]
    payload = encode_deletion_vector(pos)
    (n,) = struct.unpack_from(">i", payload, 0)
    assert payload[4:8] == DV_MAGIC
    assert len(payload) == 4 + n + 4
    assert decode_deletion_vector(payload) == pos
    # corrupt one byte: crc must catch it
    corrupt = bytearray(payload)
    corrupt[10] ^= 0xFF
    with pytest.raises(ValueError, match="crc32c|magic"):
        decode_deletion_vector(bytes(corrupt))


def test_puffin_container_roundtrip(tmp_path):
    p = str(tmp_path / "t.puffin")
    b1 = encode_deletion_vector([1, 2, 3])
    b2 = encode_deletion_vector(list(range(100)))
    metas = write_puffin(
        p,
        [
            {
                "payload": b1,
                "type": "deletion-vector-v1",
                "snapshot-id": 7,
                "sequence-number": 7,
                "properties": {
                    "referenced-data-file": "/a.parquet",
                    "cardinality": "3",
                },
            },
            {"payload": b2, "type": "deletion-vector-v1"},
        ],
        file_properties={"created-by": "iceberg_examples_spark"},
    )
    raw = open(p, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    ft = read_puffin_footer(p)
    assert ft["properties"]["created-by"] == "iceberg_examples_spark"
    assert [b["offset"] for b in ft["blobs"]] == [4, 4 + len(b1)]
    assert ft["blobs"][0]["snapshot-id"] == 7
    assert (
        ft["blobs"][0]["properties"]["referenced-data-file"] == "/a.parquet"
    )
    for m, want in zip(metas, ([1, 2, 3], list(range(100)))):
        got = decode_deletion_vector(
            read_blob(p, m["offset"], m["length"])
        )
        assert got == want


def test_puffin_rejects_non_puffin(tmp_path):
    p = str(tmp_path / "x.bin")
    with open(p, "wb") as f:
        f.write(b"not a puffin file")
    with pytest.raises(ValueError, match="not a Puffin"):
        read_puffin_footer(p)
