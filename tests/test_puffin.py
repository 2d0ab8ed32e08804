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


def _run_format32(containers):
    """Hand-serialize a 32-bit roaring in the RUN format real Iceberg
    Java writers emit after runOptimize() (RoaringFormatSpec, cookie
    12347): containers = [(key, is_run, payload)] where payload is a
    run list [(start, length)] or a sorted value list."""
    n = len(containers)
    out = bytearray(struct.pack("<HH", 12347, n - 1))
    bits = bytearray((n + 7) // 8)
    for i, (_, is_run, _) in enumerate(containers):
        if is_run:
            bits[i >> 3] |= 1 << (i & 7)
    out += bits
    bodies = []
    for key, is_run, payload in containers:
        if is_run:
            card = sum(ln + 1 for _, ln in payload)
            body = struct.pack("<H", len(payload))
            for start, ln in payload:
                body += struct.pack("<HH", start, ln)
        else:
            card = len(payload)
            body = struct.pack(f"<{card}H", *payload)
        out += struct.pack("<HH", key, card - 1)
        bodies.append(body)
    if n >= 4:  # NO_OFFSET_THRESHOLD: offsets only at 4+ containers
        off = len(out) + 4 * n
        for body in bodies:
            out += struct.pack("<I", off)
            off += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def test_roaring_run_container_decode_small():
    # single run container, below NO_OFFSET_THRESHOLD (no offset block)
    blob = struct.pack("<QI", 1, 0) + _run_format32(
        [(0, True, [(5, 3)])]
    )
    assert deserialize_roaring64(blob) == [5, 6, 7, 8]


def test_roaring_run_container_decode_mixed_with_offsets():
    # 4 containers (offset block present): runs + arrays interleaved,
    # across two 16-bit keys, inside a high 64-bit bucket
    c32 = _run_format32(
        [
            (0, True, [(0, 1), (10, 0)]),  # 0,1,10
            (1, False, [7, 9]),  # 65543, 65545
            (2, True, [(100, 2)]),  # 131172..131174
            (3, False, [0]),  # 196608
        ]
    )
    blob = struct.pack("<QI", 1, 5) + c32  # high bucket key = 5
    base = 5 << 32
    want = [
        base + v
        for v in [0, 1, 10, 65543, 65545, 131172, 131173, 131174, 196608]
    ]
    assert deserialize_roaring64(blob) == want


def test_deletion_vector_run_format_interop():
    """A DV payload whose bitmap uses run containers (as an upstream
    Java writer would emit) must decode: length-prefix + magic + crc
    framing around a run-format roaring64."""
    bm = struct.pack("<QI", 1, 0) + _run_format32([(0, True, [(2, 4)])])
    body = DV_MAGIC + bm
    payload = (
        struct.pack(">i", len(body)) + body + struct.pack(">I", crc32c(body))
    )
    assert decode_deletion_vector(payload) == [2, 3, 4, 5, 6]


def test_roaring_unknown_cookie_rejected():
    bad = struct.pack("<QI", 1, 0) + struct.pack("<ii", 9999, 1)
    with pytest.raises(ValueError, match="9999"):
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
