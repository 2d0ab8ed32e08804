"""Pure-Python Avro codec + avrolite DataSource.

The codec implements the public Apache Avro spec (binary encoding +
object container files); the datasource replaces spark-avro in this
jar-less container. The golden-bytes test is HAND-ENCODED from the spec
text, independent of our writer, so the reader and writer can't be
wrong in the same mirrored way (the circularity trap of testing a codec
only against itself).
"""

from __future__ import annotations

import json
import os
import zlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_examples_spark.sources.avro_codec import (
    Decoder,
    parse_schema,
    read_container,
    read_datum,
    write_container,
    write_datum,
)

FULL_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"]},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "small", "type": "int"},
            {"name": "ratio", "type": "float"},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "long"}},
            {"name": "raw", "type": "bytes"},
            {
                "name": "kind",
                "type": {"type": "enum", "name": "K", "symbols": ["A", "B"]},
            },
            {
                "name": "fx",
                "type": {"type": "fixed", "name": "F8", "size": 8},
            },
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "N",
                    "fields": [{"name": "x", "type": "long"}],
                },
            },
        ],
    }
)


def _full_rows(n: int) -> list[dict]:
    import struct as _struct

    return [
        {
            "id": i - 5,
            "name": None if i % 3 == 0 else f"n{i}",
            "score": i * 1.5,
            "flag": i % 2 == 0,
            "small": -i,
            "ratio": _struct.unpack("<f", _struct.pack("<f", i * 0.25))[0],
            "tags": [f"t{j}" for j in range(i % 4)],
            "props": {"a": i, "b": -i},
            "raw": bytes([i % 256]) * 3,
            "kind": "A" if i % 2 else "B",
            "fx": (i).to_bytes(8, "little"),
            "nested": {"x": i * i},
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(codec):
    rows = _full_rows(1000)
    # block_rows=64 forces many blocks — exercises block framing + sync
    data = write_container(FULL_SCHEMA, iter(rows), codec=codec, block_rows=64)
    schema_text, _, it = read_container(data)
    assert json.loads(schema_text) == json.loads(FULL_SCHEMA)
    assert list(it) == rows


def test_long_zigzag_edges():
    sch = '{"type":"record","name":"E","fields":[{"name":"v","type":"long"}]}'
    edge = [
        {"v": v}
        for v in (0, -1, 1, 63, 64, -64, -65, 2**62, -(2**62), 2**63 - 1, -(2**63))
    ]
    data = write_container(sch, iter(edge), codec="null")
    assert list(read_container(data)[2]) == edge


def test_golden_bytes_hand_encoded_from_spec():
    """A container file assembled BY HAND from the Avro 1.11 spec text
    (not via write_container): magic, metadata map as one block of 2
    entries, 16-byte sync, then one data block of 2 records of
    {"type":"record","fields":[{"name":"a","type":"long"},
    {"name":"b","type":"string"}]} — a=1/b='hi', a=-2/b=''.
    Spec encodings used: zigzag(1)=0x02, zigzag(-2)=0x03, zigzag(2)=0x04,
    string = zigzag(len) + utf8 bytes, map = count + (key,value)* + 0."""
    schema = b'{"type":"record","name":"G","fields":[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    sync = bytes(range(16))

    def zz(n: int) -> bytes:  # independent zigzag-varint reference
        u = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = u & 0x7F
            u >>= 7
            if u:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    meta = (
        zz(2)  # map block: 2 entries
        + zz(len(b"avro.schema")) + b"avro.schema"
        + zz(len(schema)) + schema
        + zz(len(b"avro.codec")) + b"avro.codec"
        + zz(len(b"null")) + b"null"
        + zz(0)  # map terminator
    )
    rec1 = zz(1) + zz(2) + b"hi"   # a=1, b="hi"
    rec2 = zz(-2) + zz(0)          # a=-2, b=""
    payload = rec1 + rec2
    blob = (
        b"Obj\x01" + meta + sync
        + zz(2) + zz(len(payload)) + payload + sync
    )
    schema_text, _, it = read_container(blob)
    assert json.loads(schema_text)["name"] == "G"
    assert list(it) == [{"a": 1, "b": "hi"}, {"a": -2, "b": ""}]


def test_deflate_is_raw_rfc1951():
    """The spec requires the deflate codec write RAW DEFLATE streams (no
    zlib header) — a reader from another implementation would reject a
    zlib-wrapped block. Verified against zlib's raw-window decoder on the
    block bytes directly."""
    sch = '{"type":"record","name":"D","fields":[{"name":"v","type":"string"}]}'
    data = write_container(sch, iter([{"v": "xyz" * 50}]), codec="deflate")
    dec = Decoder(data)
    dec.read(4)
    read_datum(parse_schema('{"type":"map","values":"bytes"}'), dec)
    dec.read(16)  # sync
    dec.read_long()  # count
    size = dec.read_long()
    block = dec.read(size)
    raw = zlib.decompress(block, -15)  # raises if zlib-wrapped
    inner = Decoder(raw)
    assert inner.read_string() == "xyz" * 50


def test_sync_marker_mismatch_detected():
    sch = '{"type":"record","name":"S","fields":[{"name":"v","type":"long"}]}'
    data = bytearray(write_container(sch, iter([{"v": 7}]), codec="null"))
    data[-1] ^= 0xFF  # corrupt the block's trailing sync
    with pytest.raises(ValueError, match="sync"):
        list(read_container(bytes(data))[2])


def test_named_type_reference_resolves():
    """A named record referenced by name after first definition (the
    pattern Iceberg's manifest schemas use for r102 partition records)."""
    sch = json.dumps(
        {
            "type": "record",
            "name": "Top",
            "fields": [
                {
                    "name": "first",
                    "type": {
                        "type": "record",
                        "name": "Point",
                        "fields": [{"name": "x", "type": "long"}],
                    },
                },
                {"name": "second", "type": "Point"},  # by-name reference
            ],
        }
    )
    rows = [{"first": {"x": 1}, "second": {"x": 2}}]
    data = write_container(sch, iter(rows), codec="null")
    assert list(read_container(data)[2]) == rows


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "name": st.one_of(st.none(), st.text(max_size=40)),
                "score": st.floats(allow_nan=False, width=64),
                "tags": st.lists(st.text(max_size=10), max_size=5),
            }
        ),
        max_size=50,
    ),
    codec=st.sampled_from(["null", "deflate"]),
    block_rows=st.sampled_from([1, 3, 4096]),
)
def test_roundtrip_property(rows, codec, block_rows):
    sch = json.dumps(
        {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
                {"name": "score", "type": "double"},
                {"name": "tags", "type": {"type": "array", "items": "string"}},
            ],
        }
    )
    data = write_container(sch, iter(rows), codec=codec, block_rows=block_rows)
    assert list(read_container(data)[2]) == rows


# ---------------------------------------------------------------------------
# the Spark datasource
# ---------------------------------------------------------------------------


def test_avrolite_source_roundtrip(spark, tmp_path):
    """df.write.format('avrolite') → spark.read.format('avrolite') is
    lossless across the mapped type surface, including date/timestamp
    logical types, arrays, maps, binary, nested structs, and nulls."""
    import datetime

    from iceberg_examples_spark.sources.avro_source import AvroLiteSource

    spark.dataSource.register(AvroLiteSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    rows = [
        (
            1,
            "a",
            1.5,
            datetime.date(2024, 2, 29),
            datetime.datetime(2024, 2, 29, 12, 30, 45, 123456),
            [1, 2],
            {"k": 2.0},
            bytearray(b"\x00\x01"),
            (7, "in"),
        ),
        (2, None, -0.25, None, None, [], {}, None, (8, None)),
    ]
    ddl = (
        "id long, name string, score double, d date, ts timestamp, "
        "xs array<long>, m map<string,double>, raw binary, "
        "nest struct<x: long, s: string>"
    )
    df = spark.createDataFrame(rows, ddl)
    out = str(tmp_path / "av")
    df.write.format("avrolite").mode("overwrite").save(out)
    back = spark.read.format("avrolite").load(out)
    assert back.schema == df.schema
    a = sorted(back.collect(), key=lambda r: r["id"])
    b = sorted(df.collect(), key=lambda r: r["id"])
    assert a == b
    # files really are spec-level Avro container files
    part = next(p for p in os.listdir(out) if p.endswith(".avro"))
    with open(os.path.join(out, part), "rb") as f:
        assert f.read(4) == b"Obj\x01"


def test_avrolite_pushdown_filters_rows_in_decoder(spark, tmp_path):
    """pushFilters accepts simple comparisons and the decode loop drops
    rows before they cross to the JVM; unsupported filters are returned
    to Spark. Checked at both the unit level (which filters are
    retained) and end-to-end (results match the unfiltered truth)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

    from iceberg_examples_spark.sources.avro_source import (
        AvroLiteReader,
        AvroLiteSource,
    )

    from pyspark.sql.types import _parse_datatype_string

    r = AvroLiteReader(
        {"path": "/dev/null"}, _parse_datatype_string("a long, b string")
    )
    leftover = list(
        r.pushFilters(
            [GreaterThan(("a",), 5), StringContains(("b",), "x"), EqualTo(("a",), 9)]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["StringContains"]
    assert [type(f).__name__ for f in r.pushed] == ["GreaterThan", "EqualTo"]

    spark.dataSource.register(AvroLiteSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(100)], "k long, s string"
    )
    out = str(tmp_path / "avp")
    df.write.format("avrolite").mode("overwrite").save(out)
    got = (
        spark.read.format("avrolite")
        .load(out)
        .filter("k > 90 and s != 's93'")
        .collect()
    )
    assert sorted(r["k"] for r in got) == [91, 92, 94, 95, 96, 97, 98, 99]


def test_avrolite_multi_file_parallel_read(spark, tmp_path):
    """One Spark task per container file: a multi-partition write yields
    multiple files and the read sees every row exactly once."""
    from iceberg_examples_spark.sources.avro_source import AvroLiteSource

    spark.dataSource.register(AvroLiteSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = spark.range(0, 1000).repartition(7)
    out = str(tmp_path / "avm")
    df.write.format("avrolite").mode("overwrite").save(out)
    assert len([p for p in os.listdir(out) if p.endswith(".avro")]) == 7
    back = spark.read.format("avrolite").load(out)
    assert back.rdd.getNumPartitions() == 7
    assert back.count() == 1000
    assert back.agg({"id": "sum"}).collect()[0][0] == 999 * 1000 // 2


def test_avrolite_reader_schema_resolution(spark, tmp_path):
    """Avro schema resolution on read: a user-supplied .schema() that
    reorders, projects, widens (long→double), and ADDS a column binds
    by NAME against the file's writer schema — added columns read as
    null, widened columns promote, order follows the reader schema.
    (Before this, read() silently yielded file-order tuples — a
    reordered schema would have transposed columns.)"""
    from iceberg_examples_spark.sources.avro_source import AvroLiteSource

    spark.dataSource.register(AvroLiteSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    out = str(tmp_path / "res")
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, n long"
    ).coalesce(1).write.format("avrolite").mode("overwrite").save(out)

    # reordered + projected + widened + an added column
    back = (
        spark.read.format("avrolite")
        .schema("n double, k long, extra string")
        .load(out)
        .orderBy("k")
        .collect()
    )
    assert [tuple(r) for r in back] == [(10.0, 1, None), (20.0, 2, None)]
    # pushdown still binds by reader-schema position
    got = (
        spark.read.format("avrolite")
        .schema("n double, k long, extra string")
        .load(out)
        .filter("k > 1")
        .collect()
    )
    assert [r["n"] for r in got] == [20.0]
    # a filter on the column the FILE never had matches nothing
    assert (
        spark.read.format("avrolite")
        .schema("n double, k long, extra string")
        .load(out)
        .filter("extra = 'x'")
        .count()
        == 0
    )


def test_timestamp_micros_roundtrip_exact():
    """Value conversion is integer-exact for every microsecond
    timestamp — the float total_seconds() path corrupted ~1.25% of
    values by 1us (round-9 self-review, reproduced before the fix)."""
    import datetime
    import random

    from pyspark.sql.types import TimestampType

    from iceberg_examples_spark.sources.avro_source import (
        _converter,
        _to_avro_value,
    )

    conv = _converter({"type": "long", "logicalType": "timestamp-micros"})
    # the concrete corrupting value from the review
    v = datetime.datetime(1970, 1, 1) + datetime.timedelta(
        seconds=1112038970, microseconds=536110
    )
    assert _to_avro_value(TimestampType(), v) == 1112038970536110
    assert conv(_to_avro_value(TimestampType(), v)) == v
    rng = random.Random(7)
    for _ in range(20_000):
        t = datetime.datetime(1970, 1, 1) + datetime.timedelta(
            seconds=rng.randrange(2**31), microseconds=rng.randrange(1_000_000)
        )
        assert conv(_to_avro_value(TimestampType(), t)) == t


def test_nested_record_names_are_unique():
    """Avro forbids redefining a named type: two same-named struct
    fields at different paths must emit distinct record names, or real
    Avro tooling rejects the file (round-9 self-review)."""
    from pyspark.sql.types import StructField, StructType, LongType, StringType

    from iceberg_examples_spark.sources.avro_codec import parse_schema
    from iceberg_examples_spark.sources.avro_source import _spark_to_avro

    inner_x = StructType([StructField("x", LongType())])
    inner_y = StructType([StructField("y", StringType())])
    top = StructType(
        [
            StructField("a", StructType([StructField("meta", inner_x)])),
            StructField("b", StructType([StructField("meta", inner_y)])),
        ]
    )
    j = json.dumps(_spark_to_avro(top))
    assert j.count('"rec_meta"') == 1 and j.count('"rec_meta_2"') == 1
    parse_schema(j)  # and the full schema still parses


def test_read_header_works_on_prefix():
    """Schema inference must not need the whole file: read_header
    parses from a prefix that ends before the first data block."""
    from iceberg_examples_spark.sources.avro_codec import read_header

    sch = '{"type":"record","name":"H","fields":[{"name":"v","type":"long"}]}'
    data = write_container(sch, iter([{"v": i} for i in range(5000)]))
    # cut right after the header region (magic+meta+sync is < 300 bytes)
    text, schema, codec = read_header(data[:300])
    assert json.loads(text)["name"] == "H" and codec == "deflate"


def test_timestamp_micros_are_utc_epoch_in_any_timezone():
    """Round-9 ADVICE: Avro timestamp-micros is UTC epoch micros; a
    non-UTC session must not write local-wall-clock micros. The
    conversion helpers interpret Spark's naive datetimes through the
    local timezone both ways (pure-Python check with TZ swapped — no
    Spark session restart needed)."""
    import datetime as dt
    import os
    import time

    from pyspark.sql.types import TimestampType

    from iceberg_examples_spark.sources.avro_source import (
        _from_utc_micros,
        _to_avro_value,
    )

    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        naive = dt.datetime(2021, 6, 1, 12, 0, 0, 123456)  # EDT, UTC-4
        us = _to_avro_value(TimestampType(), naive)
        expected_utc = dt.datetime(
            2021, 6, 1, 16, 0, 0, 123456, tzinfo=dt.timezone.utc
        )
        assert us == int(expected_utc.timestamp() * 1_000_000)
        assert _from_utc_micros(us) == naive  # lossless roundtrip
        # winter date: offset flips to EST (UTC-5), so the conversion is
        # per-instant, not a constant shift
        naive2 = dt.datetime(2021, 1, 1, 12, 0, 0, 1)
        us2 = _to_avro_value(TimestampType(), naive2)
        expected2 = dt.datetime(
            2021, 1, 1, 17, 0, 0, 1, tzinfo=dt.timezone.utc
        )
        assert us2 == int(expected2.timestamp() * 1_000_000)
        assert _from_utc_micros(us2) == naive2
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()
