"""Pure-Python Apache Avro codec (binary encoding + object container files).

The reference stack reads/writes Avro through the ``spark-avro`` JVM
datasource, which is unobtainable in this offline container (verified
every round since 3: DNS fails, no jar on disk). Avro's wire format is a
small PUBLIC spec (https://avro.apache.org/docs/current/specification/),
so this module implements it directly:

- binary encoding: zigzag-varint ints/longs, little-endian IEEE
  float/double, length-prefixed bytes/strings, records as field
  concatenation, block-encoded arrays/maps, index-prefixed unions,
  raw fixed, int-indexed enums;
- object container files: ``Obj\\x01`` magic, file-metadata map carrying
  the writer schema JSON and codec, 16-byte sync marker, then
  (count, byte-size, payload, sync) blocks with ``null`` and ``deflate``
  (raw zlib, RFC 1951) codecs.

Two consumers sit on top:

- :mod:`iceberg_examples_spark.sources.avro_source` — a Spark-4 Python
  DataSource exposing ``spark.read.format("avrolite")`` /
  ``df.write.format("avrolite")`` (the spark-avro replacement surface);
- :mod:`iceberg_examples_spark.sources.iceberg_native` — Iceberg
  manifest lists and manifest files ARE Avro container files, so this
  codec is what lets the engine read a real Iceberg table's metadata
  tree without the JVM connector.

Deliberately NOT implemented (absent from both consumers' needs):
decimal logical types, snappy codec (no library in the container —
deflate is the spec's only mandatory compressed codec), and RPC
framing. Datum decode always uses the writer schema embedded in the
file; READER-schema resolution (projection, reorder, null-for-added,
promotions) lives one layer up in avro_source, where the Spark schema
is known.

Scale posture: this codec is executor-side decode logic — the DataSource
schedules one Spark task per file/block and each task streams its bytes
through these functions, so parallelism comes from file layout exactly
like any file scan. Python-side decode is the slow path vs parquet's
vectorized JVM reader; the documented 100 TB pattern is ingest-once
through this source, then persist to parquet (see avro_source docstring).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------

PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

NAMED_KINDS = {"record", "enum", "fixed"}


def parse_schema(schema: str | dict | list):
    """Parse an Avro schema (JSON text or already-parsed structure) into
    the normalized form the codec walks: primitive name strings, dicts
    for complex types, lists for unions — with NAMED TYPE REFERENCES
    resolved in place (the spec allows a record/enum/fixed to be referred
    to by name after first definition; Iceberg's manifest schemas use
    this for the r2 partition-field types)."""
    if isinstance(schema, str) and schema not in PRIMITIVES:
        schema = json.loads(schema)
    names: dict[str, dict] = {}
    return _resolve(schema, names)


def _resolve(s, names: dict[str, dict]):
    if isinstance(s, str):
        if s in PRIMITIVES:
            return s
        if s in names:
            return names[s]
        raise ValueError(f"unknown type name {s!r}")
    if isinstance(s, list):  # union
        return [_resolve(b, names) for b in s]
    if not isinstance(s, dict):
        raise ValueError(f"malformed schema node: {s!r}")
    t = s.get("type")
    if t in NAMED_KINDS:
        # register BEFORE resolving children so self-referential records
        # (linked lists etc.) terminate; fullname = namespace.name
        name = s["name"]
        full = f"{s['namespace']}.{name}" if s.get("namespace") else name
        names[full] = s
        names.setdefault(name, s)
        if t == "record":
            for f in s["fields"]:
                f["type"] = _resolve(f["type"], names)
        return s
    if t == "array":
        s["items"] = _resolve(s["items"], names)
        return s
    if t == "map":
        s["values"] = _resolve(s["values"], names)
        return s
    if isinstance(t, (dict, list)):
        # {"type": {...}} wrapper or inline union
        return _resolve(t, names)
    if t in PRIMITIVES:
        return s  # primitive carrying logicalType / extra attrs
    raise ValueError(f"unsupported schema node: {s!r}")


def schema_type(s) -> str:
    """The type tag of a normalized schema node ('union' for lists)."""
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


# ---------------------------------------------------------------------------
# binary decoding
# ---------------------------------------------------------------------------


class Decoder:
    """Streaming decoder over a bytes buffer (one Avro datum after
    another — the container-file block payload layout)."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        p = self.pos
        if p + n > len(self.buf):
            raise EOFError("truncated Avro data")
        self.pos = p + n
        return self.buf[p : p + n]

    def read_long(self) -> int:
        """Zigzag varint — the encoding of both int and long."""
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_boolean(self) -> bool:
        return self.read(1) == b"\x01"

    def read_float(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def read_double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")


def read_datum(schema, dec: Decoder):
    """Decode one datum of ``schema`` (records → dicts, unions →
    branch value, enums → symbol string, fixed → bytes)."""
    t = schema_type(schema)
    if t == "null":
        return None
    if t == "boolean":
        return dec.read_boolean()
    if t in ("int", "long"):
        return dec.read_long()
    if t == "float":
        return dec.read_float()
    if t == "double":
        return dec.read_double()
    if t == "bytes":
        return dec.read_bytes()
    if t == "string":
        return dec.read_string()
    if t == "union":
        return read_datum(schema[dec.read_long()], dec)
    if t == "record":
        return {f["name"]: read_datum(f["type"], dec) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:  # block-size variant: size precedes items
                n = -n
                dec.read_long()
            for _ in range(n):
                out.append(read_datum(schema["items"], dec))
    if t == "map":
        out = {}
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                dec.read_long()
            for _ in range(n):
                k = dec.read_string()
                out[k] = read_datum(schema["values"], dec)
    if t == "fixed":
        return dec.read(schema["size"])
    if t == "enum":
        return schema["symbols"][dec.read_long()]
    raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# binary encoding
# ---------------------------------------------------------------------------


def _zigzag(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
    # equivalent of (n << 1) ^ (n >> 63) in two's complement
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def write_datum(schema, value, out: bytearray) -> None:
    t = schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
        return
    if t in ("int", "long"):
        _zigzag(out, value)
        return
    if t == "float":
        out += struct.pack("<f", value)
        return
    if t == "double":
        out += struct.pack("<d", value)
        return
    if t == "bytes":
        _zigzag(out, len(value))
        out += value
        return
    if t == "string":
        b = value.encode("utf-8")
        _zigzag(out, len(b))
        out += b
        return
    if t == "union":
        # branch pick: None → the null branch; else first non-null branch
        # whose tag accepts the value (sufficient for [null, X] — the only
        # union shape our writers emit; readers handle arbitrary unions)
        for i, branch in enumerate(schema):
            bt = schema_type(branch)
            if value is None and bt == "null":
                _zigzag(out, i)
                return
            if value is not None and bt != "null":
                _zigzag(out, i)
                write_datum(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r}")
    if t == "record":
        for f in schema["fields"]:
            write_datum(f["type"], value[f["name"]], out)
        return
    if t == "array":
        if value:
            _zigzag(out, len(value))
            for item in value:
                write_datum(schema["items"], item, out)
        _zigzag(out, 0)
        return
    if t == "map":
        if value:
            _zigzag(out, len(value))
            for k, v in value.items():
                write_datum("string", k, out)
                write_datum(schema["values"], v, out)
        _zigzag(out, 0)
        return
    if t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out += value
        return
    if t == "enum":
        _zigzag(out, schema["symbols"].index(value))
        return
    raise ValueError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


def read_header(data: bytes):
    """(schema_text, normalized_schema, codec) from a container file's
    header only — ``data`` may be a PREFIX of the file (schema
    inference reads a bounded prefix, not a multi-GB file)."""
    dec = Decoder(data)
    if dec.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = read_datum({"type": "map", "values": "bytes"}, dec)
    schema_text = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    return schema_text, parse_schema(schema_text), codec


def read_container(data: bytes):
    """Parse an Avro object container file → (writer_schema_json_text,
    normalized_schema, iterator of decoded rows). The schema comes from
    the file's own metadata (the spec's self-describing property), so a
    reader never guesses."""
    schema_text, schema, _meta, rows = read_container_with_meta(data)
    return schema_text, schema, rows


def read_container_with_meta(data: bytes):
    """Like :func:`read_container` but also returns the file-metadata
    map in the SAME pass — Iceberg manifest planning needs both the
    rows and the embedded ``schema`` key, and decoding the header twice
    doubled coordinator-side manifest parsing."""
    dec = Decoder(data)
    if dec.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta = read_datum({"type": "map", "values": "bytes"}, dec)
    schema_text = meta["avro.schema"].decode("utf-8")
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = parse_schema(schema_text)
    sync = dec.read(16)

    def rows():
        while dec.pos < len(dec.buf):
            count = dec.read_long()
            size = dec.read_long()
            payload = dec.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)  # raw RFC1951
            if dec.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            block = Decoder(payload)
            for _ in range(count):
                yield read_datum(schema, block)

    return schema_text, schema, meta, rows()


def write_container(
    schema: str | dict,
    rows,
    codec: str = "deflate",
    block_rows: int = 4096,
    sync: bytes = b"\x00" * 8 + b"avrolite",
    meta: dict[str, bytes] | None = None,
    sink=None,
) -> bytes | None:
    """Serialize ``rows`` (dicts for records) into one container file.

    ``sync`` is deterministic by default so fixture bytes are
    reproducible run-over-run (the spec only requires the 16 bytes be
    consistent within a file; randomness is an anti-feature for tests).
    ``block_rows`` bounds block memory — a 100 TB writer streams blocks,
    never materializing the file's rows at once. ``meta`` adds extra
    file-metadata entries (Iceberg manifests carry ``schema`` /
    ``partition-spec`` / ``content`` keys alongside avro.schema).
    ``sink``: a binary file-like — blocks FLUSH to it as they fill and
    the function returns None, so a multi-GB partition never
    materializes its container file in memory (without a sink the whole
    file accumulates in a BytesIO and is returned — fixture/manifest
    sized use only)."""
    schema_text = schema if isinstance(schema, str) else json.dumps(schema)
    parsed = parse_schema(schema_text)
    out = sink if sink is not None else io.BytesIO()
    out.write(MAGIC)
    head = bytearray()
    write_datum(
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": schema_text.encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
            **(meta or {}),
        },
        head,
    )
    out.write(bytes(head))
    out.write(sync)

    def flush(block: bytearray, n: int) -> None:
        payload = bytes(block)
        if codec == "deflate":
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        header = bytearray()
        _zigzag(header, n)
        _zigzag(header, len(payload))
        out.write(bytes(header))
        out.write(payload)
        out.write(sync)

    block = bytearray()
    n = 0
    for row in rows:
        write_datum(parsed, row, block)
        n += 1
        if n >= block_rows:
            flush(block, n)
            block = bytearray()
            n = 0
    if n:
        flush(block, n)
    return None if sink is not None else out.getvalue()
