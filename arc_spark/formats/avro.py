"""Pure-Python Avro Object Container File (OCF) codec.

The sandbox ships Spark without the ``spark-avro`` datasource module, so
the Avro stages fall back to this from-scratch implementation of the
PUBLIC Avro 1.x specification (binary encoding + object container files):

- varint/zigzag longs, IEEE little-endian float/double, length-prefixed
  bytes/strings
- records, arrays, maps, unions, enums, fixed
- container files: ``Obj\\x01`` magic, metadata map (``avro.schema``,
  ``avro.codec``), 16-byte sync marker, blocks of (count, byte-size,
  payload); ``null`` and ``deflate`` codecs

Scale model: the Spark stages read OCF files through ``binaryFile`` +
``mapInPandas`` (one Arrow batch per file — per-FILE parallelism; a single
giant file does not split, unlike spark-avro's block splitting — noted in
AvroExtract) and write one OCF per partition from ``mapPartitions``-style
pandas iterators. Spec compliance is cross-validated in tests against the
JVM ``org.apache.avro`` classes that DO ship with Spark (write here → read
there, and vice versa).

Reference parity: extract/AvroExtract.scala:170-190, load/AvroLoad.scala:
140-152 (the reference delegates to spark-avro; semantics match for the
types Arc's schema system emits).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("unexpected end of avro data")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (python ints: arithmetic shift ok)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


# ---------------------------------------------------------------------------
# schema-driven decode / encode
# ---------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)  # block byte size (skippable encoding)
                    n = -n
                out.extend(_decode(schema["items"], buf) for _ in range(n))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
            return out
        if t == "enum":
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            return buf.read(schema["size"])
        return _decode(t, buf)  # {"type": "string", ...} primitive wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported avro type: {schema!r}")


def _encode(schema, value, out: bytearray) -> None:
    if isinstance(schema, list):  # union — pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError(f"value {value!r} matches no union branch {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], None if value is None else value.get(f["name"]), out)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out.extend(kb)
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            out.extend(value)
            return
        _encode(t, value, out)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.extend(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.extend(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        b = bytes(value)
        _write_long(out, len(b))
        out.extend(b)
        return
    if schema == "string":
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out.extend(b)
        return
    raise ValueError(f"unsupported avro type: {schema!r}")


def _matches(schema, value) -> bool:
    if schema == "null":
        return value is None
    if value is None:
        return False
    if schema == "boolean":
        return isinstance(value, bool)
    if schema in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if schema in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if schema == "string":
        return isinstance(value, str)
    if schema == "bytes":
        return isinstance(value, (bytes, bytearray))
    return True  # records/arrays/maps: first complex branch wins


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------


def read_ocf_bytes(data: bytes) -> tuple[dict | str | list, list]:
    """Parse one OCF byte blob → (schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, os.SEEK_CUR)
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        records.extend(_decode(schema, bbuf) for _ in range(count))
        if buf.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records


def read_ocf_schema(data: bytes) -> dict | str | list:
    """Schema only (header parse, no block decode) — the driver probe."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file (bad magic)")
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            v = _read_bytes(buf)
            if k == "avro.schema":
                return json.loads(v.decode("utf-8"))
    raise ValueError("avro.schema missing from container metadata")


def write_ocf_bytes(
    schema, records, *, codec: str = "deflate", sync: bytes | None = None,
    extra_meta: dict | None = None,
) -> bytes:
    """``extra_meta``: additional container-metadata entries (str -> bytes)
    — e.g. Iceberg manifests carry schema/partition-spec/format-version
    keys beside avro.schema."""
    sync = sync or os.urandom(16)
    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
        **{k: (v if isinstance(v, bytes) else str(v).encode("utf-8"))
           for k, v in (extra_meta or {}).items()},
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        _write_long(out, len(kb))
        out.extend(kb)
        _write_long(out, len(v))
        out.extend(v)
    _write_long(out, 0)
    out.extend(sync)
    body = bytearray()
    for rec in records:
        _encode(schema, rec, body)
    payload = bytes(body)
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate (no zlib wrapper)
    elif codec != "null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.extend(payload)
    out.extend(sync)
    return bytes(out)


# ---------------------------------------------------------------------------
# schema mapping avro <-> spark
# ---------------------------------------------------------------------------


def avro_to_spark_type(schema):
    from pyspark.sql import types as T

    prim = {
        "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
        "bytes": T.BinaryType(), "string": T.StringType(),
    }
    if isinstance(schema, str):
        return prim[schema]
    if isinstance(schema, list):  # union: nullable branch
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise ValueError(f"only nullable unions supported, got {schema!r}")
        return avro_to_spark_type(non_null[0])
    t = schema["type"]
    if t == "record":
        from pyspark.sql.types import StructField, StructType

        return StructType(
            [
                StructField(
                    f["name"],
                    avro_to_spark_type(f["type"]),
                    nullable=isinstance(f["type"], list) and "null" in f["type"],
                )
                for f in schema["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"]))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"]))
    if t in ("enum",):
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    return avro_to_spark_type(t)


def spark_to_avro_schema(struct, name: str = "topLevelRecord"):
    from pyspark.sql import types as T

    def conv(dt, field_name: str):
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            return "int"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType)):
            return "string"  # temporal types serialized as ISO strings
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": conv(dt.elementType, field_name)}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": conv(dt.valueType, field_name)}
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": f"{field_name}_rec",
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
                    for f in dt.fields
                ],
            }
        raise ValueError(f"unsupported spark type for avro: {dt}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": ["null", conv(f.dataType, f.name)]}
            for f in struct.fields
        ],
    }


# ---------------------------------------------------------------------------
# Spark-side fallback IO (binaryFile + mapInPandas)
# ---------------------------------------------------------------------------


def _sanitize(v):
    """pandas/numpy scalars → plain python for the encoder (NaN → null)."""
    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return None if pd.isna(v) else float(v)
    if isinstance(v, (np.bool_,)):
        return bool(v)
    if isinstance(v, float) and pd.isna(v):
        return None
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat(sep=" ")
    if isinstance(v, np.ndarray):
        return [_sanitize(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_sanitize(x) for x in v]
    if isinstance(v, dict):
        return {k: _sanitize(x) for k, x in v.items()}
    return v


def read_avro_fallback(spark, uri: str):
    """Read an OCF directory/glob without spark-avro: binaryFile scan +
    one Arrow decode pass per file. Parallelism is per FILE (a single
    giant file does not split — unlike spark-avro's block splitting; at
    scale write many files, which every distributed writer does)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(uri)
    head = files.select("content").first()
    if head is None:
        raise ValueError(f"no avro files at {uri!r}")
    avro_schema = read_ocf_schema(bytes(head[0]))
    spark_type = avro_to_spark_type(avro_schema)
    names = [f.name for f in spark_type.fields]

    def decode(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                _, recs = read_ocf_bytes(bytes(blob))
                yield pd.DataFrame(
                    {n: [r.get(n) for r in recs] for n in names}
                )

    return files.select("content").mapInPandas(decode, schema=spark_type)


def write_avro_fallback(df, uri: str, *, codec: str = "deflate") -> int:
    """Write a DataFrame as OCF files without spark-avro: one file per
    Arrow batch per partition, written on the executors."""
    import uuid

    import pandas as pd

    avro_schema = spark_to_avro_schema(df.schema)
    os.makedirs(uri, exist_ok=True)

    def encode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            recs = [
                {k: _sanitize(v) for k, v in row.items()}
                for row in pdf.to_dict("records")
            ]
            data = write_ocf_bytes(avro_schema, recs, codec=codec)
            path = os.path.join(uri, f"part-{uuid.uuid4().hex}.avro")
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame({"path": [path], "rows": [len(recs)]})

    written = df.mapInPandas(encode, schema="path string, rows long").collect()
    return sum(r["rows"] for r in written)


def decode_datum(schema, data: bytes):
    """Decode ONE raw Avro datum (no container framing) — the from_avro
    binary-column primitive used for binlog payload decode."""
    return _decode(schema, io.BytesIO(data))


def encode_datum(schema, value) -> bytes:
    """Encode ONE raw Avro datum (no container framing) — the to_avro
    twin, used by tests to build binlog payloads."""
    out = bytearray()
    _encode(schema, value, out)
    return bytes(out)
