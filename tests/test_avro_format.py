"""Pure-Python Avro OCF codec: round trips plus SPEC cross-validation
against the JVM ``org.apache.avro`` classes that ship with Spark (the
spark-avro datasource module is absent in this sandbox; the stages fall
back to this codec)."""

from __future__ import annotations

import json

import pytest

from arc_spark.formats.avro import (
    avro_to_spark_type,
    read_ocf_bytes,
    read_ocf_schema,
    write_ocf_bytes,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": ["null", "long"]},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "tags", "type": ["null", {"type": "array", "items": "string"}]},
        {"name": "flag", "type": ["null", "boolean"]},
        {"name": "blob", "type": ["null", "bytes"]},
    ],
}
RECORDS = [
    {"id": 1, "name": "a", "score": 1.5, "tags": ["x", "y"], "flag": True, "blob": b"\x00\x01"},
    {"id": 2, "name": None, "score": -2.25, "tags": [], "flag": False, "blob": b""},
    {"id": None, "name": "unicode é中", "score": None, "tags": None, "flag": None, "blob": None},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_python_round_trip(codec):
    data = write_ocf_bytes(SCHEMA, RECORDS, codec=codec)
    schema, recs = read_ocf_bytes(data)
    assert schema == SCHEMA
    assert recs == RECORDS
    assert read_ocf_schema(data) == SCHEMA


def test_jvm_reads_python_written_ocf(spark):
    jvm = spark._sc._jvm
    data = write_ocf_bytes(SCHEMA, RECORDS, codec="deflate")
    sbin = jvm.org.apache.avro.file.SeekableByteArrayInput(bytearray(data))
    reader = jvm.org.apache.avro.file.DataFileReader(
        sbin, jvm.org.apache.avro.generic.GenericDatumReader()
    )
    got = []
    while reader.hasNext():
        got.append(reader.next())
    assert len(got) == len(RECORDS)
    assert got[0].get("id") == 1 and str(got[0].get("name")) == "a"
    assert got[1].get("score") == -2.25 and got[1].get("name") is None
    assert str(got[2].get("name")) == "unicode é中"


def test_python_reads_jvm_written_ocf(spark):
    jvm = spark._sc._jvm
    jschema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    w = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    baos = jvm.java.io.ByteArrayOutputStream()
    dfw = jvm.org.apache.avro.file.DataFileWriter(w)
    dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(jschema, baos)
    rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    # py4j auto-unboxes java.lang.Long returns to python ints, which rebox
    # as Integer on put(); a value beyond int range forces Long boxing
    rec.put("id", 42_000_000_000)
    rec.put("name", "jvm")
    rec.put("score", 3.5)
    rec.put("tags", None)
    rec.put("flag", True)
    rec.put("blob", jvm.java.nio.ByteBuffer.wrap(bytearray(b"zz")))
    dfw.append(rec)
    dfw.close()
    schema, recs = read_ocf_bytes(bytes(baos.toByteArray()))
    assert recs == [
        {"id": 42_000_000_000, "name": "jvm", "score": 3.5, "tags": None, "flag": True, "blob": b"zz"}
    ]


def test_avro_to_spark_type():
    st = avro_to_spark_type(SCHEMA)
    assert [f.name for f in st.fields] == ["id", "name", "score", "tags", "flag", "blob"]
    assert st["id"].dataType.simpleString() == "bigint"
    assert st["tags"].dataType.simpleString() == "array<string>"
