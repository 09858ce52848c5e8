"""IO-stage coverage: avro glob + from_avro binary decode (the CDC
binlog-decode primitive, AvroExtract.scala:183-184), delimited/json
from-view, bytes extract, text load singleFile, ORC roundtrip."""

from __future__ import annotations

import json
import os

import pytest

from arc_spark.pipeline import run_config


def test_avro_roundtrip_and_binary_decode(spark, tmp_path):
    """Runs with OR without the spark-avro datasource: the stages fall back
    to the from-scratch OCF codec, and the binlog binary decode falls back
    to raw-datum decoding — the payloads here are built with our own
    encode_datum (spec-validated against the JVM in test_avro_format)."""
    from pyspark.sql import functions as F

    from arc_spark.formats.avro import encode_datum

    src = spark.createDataFrame(
        [(1, "alice", 10.5), (2, "bob", -3.25)], "id long, name string, bal double"
    )
    src.createOrReplaceTempView("avro_rt_src")
    avro_dir = str(tmp_path / "avro")
    cfg0 = {
        "stages": [
            {"type": "AvroLoad", "name": "w", "inputView": "avro_rt_src",
             "outputURI": avro_dir},
            {"type": "AvroExtract", "name": "a", "inputURI": avro_dir,
             "outputView": "va"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg0))
    assert df.count() == 2 and {"id", "name", "bal"} <= set(df.columns)

    # binary-column decode (binlog-style): encode rows to an avro binary
    # column, then decode through the stage with an .avsc
    avsc = {
        "type": "record", "name": "rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "bal", "type": "double"},
        ],
    }
    rows = [(encode_datum(avsc, {"id": 1, "name": "alice", "bal": 10.5}),),
            (encode_datum(avsc, {"id": 2, "name": "bob", "bal": -3.25}),)]
    spark.createDataFrame(rows, "payload binary").createOrReplaceTempView("binlog")
    cfg2 = {
        "stages": [
            {"type": "AvroExtract", "name": "d", "inputView": "binlog",
             "inputField": "payload", "avroSchema": avsc, "outputView": "decoded"}
        ]
    }
    df2, _ = run_config(spark, json.dumps(cfg2))
    out = {r["id"]: r for r in df2.collect()}
    assert out[1]["name"] == "alice" and out[2]["bal"] == -3.25


def test_delimited_and_json_from_view(spark):
    spark.createDataFrame(
        [("1,alice",), ("2,bob",)], "value string"
    ).createOrReplaceTempView("lines")
    cfg = {
        "stages": [
            {"type": "DelimitedExtract", "name": "c", "inputView": "lines",
             "outputView": "parsed",
             "schema": [{"name": "id", "type": "integer"}, {"name": "nm", "type": "string"}]}
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert {(r["id"], r["nm"]) for r in df.collect()} == {(1, "alice"), (2, "bob")}

    spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ('{"a": 2, "b": "y"}',)], "value string"
    ).createOrReplaceTempView("jlines")
    cfg2 = {
        "stages": [
            {"type": "JSONExtract", "name": "j", "inputView": "jlines", "outputView": "jp"}
        ]
    }
    df2, _ = run_config(spark, json.dumps(cfg2))
    assert {(r["a"], r["b"]) for r in df2.collect()} == {(1, "x"), (2, "y")}


def test_bytes_extract(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.bin").write_bytes(bytes([i]) * 10)
    cfg = {
        "stages": [
            {"type": "BytesExtract", "name": "b", "inputURI": str(tmp_path),
             "outputView": "blobs"}
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    rows = df.collect()
    assert len(rows) == 3
    assert {len(r["value"]) for r in rows} == {10}
    assert all(r["_filename"].startswith("file:") for r in rows)
    # _filename carries internal metadata
    assert dict(zip(df.columns, df.schema.fields))["_filename"].metadata["internal"] is True


def test_text_load_single_file(spark, tmp_path):
    spark.createDataFrame([("b",), ("a",), ("c",)], "value string").createOrReplaceTempView("txt")
    out = str(tmp_path / "one.txt")
    cfg = {
        "stages": [
            {"type": "TextLoad", "name": "t", "inputView": "txt", "outputURI": out,
             "singleFile": True, "prefix": "[", "separator": ",", "suffix": "]"}
        ]
    }
    run_config(spark, json.dumps(cfg))
    content = open(out).read()
    assert content.startswith("[") and content.endswith("]")
    assert sorted(content[1:-1].split(",")) == ["a", "b", "c"]


def test_orc_load_then_extract(spark, tmp_path):
    spark.createDataFrame([(1, "x")], "id long, v string").createOrReplaceTempView("src_orc")
    uri = str(tmp_path / "orc")
    cfg = {
        "stages": [
            {"type": "ORCLoad", "name": "w", "inputView": "src_orc", "outputURI": uri},
            {"type": "ORCExtract", "name": "r", "inputURI": uri, "outputView": "back"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    assert df.first()["v"] == "x"


def test_typing_failfast_mode(spark):
    spark.createDataFrame([("12",), ("oops",)], "n string").createOrReplaceTempView("nums_raw")
    cfg = {
        "stages": [
            {"type": "TypingTransform", "name": "t", "inputView": "nums_raw",
             "outputView": "typed", "failMode": "failfast",
             "schema": [{"name": "n", "type": "integer"}]}
        ]
    }
    with pytest.raises(ValueError, match="failfast"):
        run_config(spark, json.dumps(cfg))


def _make_png(w: int, h: int, rgb: tuple) -> bytes:
    """Minimal valid RGB PNG, no image library needed."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c) & 0xFFFFFFFF)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return sig + ihdr + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_image_extract_reads_png(spark, tmp_path):
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "red.png").write_bytes(_make_png(4, 3, (255, 0, 0)))
    (d / "blue.png").write_bytes(_make_png(8, 2, (0, 0, 255)))
    cfg = {
        "stages": [
            {"type": "ImageExtract", "name": "img", "inputURI": str(d),
             "outputView": "imgs", "dropInvalid": True}
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    rows = {r["image"]["width"]: r["image"] for r in df.collect()}
    assert rows[4]["height"] == 3 and rows[8]["height"] == 2
    assert all(img["nChannels"] in (3, 4) for img in rows.values())


def test_avro_stage_fallback_roundtrip(spark, tmp_path):
    """Without the spark-avro datasource, AvroLoad/AvroExtract fall back to
    the from-scratch OCF codec (arc_spark.formats.avro) — and the files it
    writes are REAL Avro (the JVM org.apache.avro reader parses them)."""
    import glob as _glob

    src = spark.createDataFrame(
        [
            (1, "alice", 10.5, ["a", "b"]),
            (2, None, -3.25, []),
            (3, "cés", None, None),
        ],
        "id long, name string, bal double, tags array<string>",
    )
    src.createOrReplaceTempView("avro_src")
    out = str(tmp_path / "avro_out")
    cfg = {
        "stages": [
            {"type": "AvroLoad", "name": "w", "inputView": "avro_src", "outputURI": out},
            {"type": "AvroExtract", "name": "r", "inputURI": out, "outputView": "back"},
        ]
    }
    df, _ = run_config(spark, json.dumps(cfg))
    back = {r["id"]: r for r in df.collect()}
    assert len(back) == 3
    assert back[1]["name"] == "alice" and back[1]["tags"] == ["a", "b"]
    assert back[2]["name"] is None and back[2]["bal"] == -3.25
    assert back[3]["name"] == "cés" and back[3]["bal"] is None and back[3]["tags"] is None
    # spec check: the JVM avro reader parses the fallback-written file
    jvm = spark._sc._jvm
    f = sorted(_glob.glob(f"{out}/*.avro"))[0]
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(f), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    assert rdr.hasNext()


def test_extract_schema_view_roundtrip(spark, tmp_path):
    """MetadataExtract of a typed view -> schemaView on a DelimitedExtract
    applies the produced schema to the raw CSV (the reference's schemaView
    on every extract, extract/DelimitedExtract.scala:57)."""
    from arc_spark.pipeline import run_config

    csv = tmp_path / "sv.csv"
    csv.write_text("7,x\n8,y\n")
    typed = tmp_path / "typed.parquet"
    spark.createDataFrame([(1, "a")], "n: int, s: string").write.parquet(str(typed))
    cfg = {"stages": [
        {"type": "ParquetExtract", "name": "t", "inputURI": str(typed),
         "outputView": "sv_typed", "internalColumns": False},
        {"type": "MetadataExtract", "name": "m", "inputView": "sv_typed",
         "outputView": "sv_schema"},
        {"type": "DelimitedExtract", "name": "d", "inputURI": str(csv),
         "outputView": "sv_out", "schemaView": "sv_schema",
         "internalColumns": False},
    ]}
    df, _ = run_config(spark, cfg)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == \
        [("n", "int"), ("s", "string")]
    assert {(r["n"], r["s"]) for r in df.collect()} == {(7, "x"), (8, "y")}


def test_bytes_extract_input_view_and_fail_mode(spark, tmp_path):
    from arc_spark.pipeline import run_config

    p1 = tmp_path / "b1.bin"
    p1.write_bytes(b"\x01\x02")
    p2 = tmp_path / "b2.bin"
    p2.write_bytes(b"\x03")
    spark.createDataFrame([(str(p1),), (str(p2),)], "value: string") \
        .createOrReplaceTempView("bytes_paths")
    cfg = {"stages": [
        {"type": "BytesExtract", "name": "b", "inputView": "bytes_paths",
         "outputView": "bytes_out"},
    ]}
    df, _ = run_config(spark, cfg)
    got = {bytes(r["value"]) for r in df.collect()}
    assert got == {b"\x01\x02", b"\x03"}
    # permissive missing path -> typed empty; failfast -> raises
    spark.createDataFrame([(str(tmp_path / "nope.bin"),)], "value: string") \
        .createOrReplaceTempView("bytes_missing")
    cfg_p = {"stages": [
        {"type": "BytesExtract", "name": "b", "inputView": "bytes_missing",
         "outputView": "bytes_empty", "failMode": "permissive"},
    ]}
    df, _ = run_config(spark, cfg_p)
    assert df.count() == 0 and set(df.columns) == {"value", "_filename"}
    cfg_f = {"stages": [
        {"type": "BytesExtract", "name": "b", "inputView": "bytes_missing",
         "outputView": "bytes_err"},
    ]}
    import pytest as _pytest
    with _pytest.raises(Exception):
        run_config(spark, cfg_f)
    # permissive with SOME paths missing keeps the data from the ones
    # that exist (one absent path must not drop everything)
    spark.createDataFrame(
        [(str(p1),), (str(tmp_path / "gone.bin"),), (str(p2),)],
        "value: string",
    ).createOrReplaceTempView("bytes_partial")
    cfg_pp = {"stages": [
        {"type": "BytesExtract", "name": "b", "inputView": "bytes_partial",
         "outputView": "bytes_partial_out", "failMode": "permissive"},
    ]}
    df, _ = run_config(spark, cfg_pp)
    assert {bytes(r["value"]) for r in df.collect()} == {b"\x01\x02", b"\x03"}


def test_image_extract_base_path_and_missing(spark, tmp_path):
    from arc_spark.pipeline import run_config

    # missing path -> typed empty image frame (ImageExtract.scala:143-145)
    cfg = {"stages": [
        {"type": "ImageExtract", "name": "i",
         "inputURI": str(tmp_path / "none"), "outputView": "img_empty",
         "basePath": str(tmp_path)},
    ]}
    df, _ = run_config(spark, cfg)
    assert df.count() == 0
    assert df.schema["image"].dataType.simpleString().startswith("struct<origin:string")


def test_image_extract_streaming_lint(spark, tmp_path):
    """Streaming branch builds a readStream plan with the fixed image
    schema + watermark (lint only: no sink started)."""
    from arc_spark.pipeline.config import parse_pipeline
    from arc_spark.pipeline.core import PipelineContext

    d = tmp_path / "imgs"
    d.mkdir()
    ctx = PipelineContext(spark=spark, streaming=True)
    pipeline = parse_pipeline({"stages": [
        {"type": "ImageExtract", "name": "i", "inputURI": str(d),
         "outputView": "img_stream"},
    ]}, ctx)
    df = pipeline.stages[0].execute(ctx)
    assert df.isStreaming
