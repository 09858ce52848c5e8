"""Multimodal plumbing: binary columns through Arrow-batched operators —
schema, batch shape, one-to-many frame explosion (codecs stubbed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_spark.operators.multimodal import (
    decode_images,
    real_image_decoder,
    resize_images,
    sample_video_frames,
)


@pytest.fixture()
def binary_df(spark, tmp_path):
    # materialize deterministic binary blobs via the binaryFile source path
    for i in range(6):
        (tmp_path / f"blob{i}.bin").write_bytes(bytes([i]) * (100 + i))
    return (
        spark.read.format("binaryFile")
        .load(str(tmp_path))
        .select(F.col("content").alias("value"), F.col("path").alias("_filename"))
    )


def test_decode_images_schema_and_determinism(spark, binary_df):
    out = decode_images(binary_df)
    assert "image_meta" in out.columns and "features" in out.columns
    rows = out.orderBy("_filename").collect()
    assert len(rows) == 6
    for r in rows:
        assert 16 <= r["image_meta"]["width"] < 80
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic across runs
    rows2 = decode_images(binary_df).orderBy("_filename").collect()
    assert [r["features"] for r in rows] == [r["features"] for r in rows2]


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_image_decoder(b"x")


def test_resize_images_roundtrip_schema(spark, binary_df):
    out = resize_images(binary_df, 32, 32)
    assert out.schema == binary_df.schema
    r = out.first()
    assert r["value"][:8] == b" \x00\x00\x00 \x00\x00\x00"  # 32,32 stamp


def test_sample_video_frames_explodes(spark, binary_df):
    frames = sample_video_frames(binary_df, every_n=2)
    assert [f.name for f in frames.schema.fields] == ["source", "frame_index", "frame"]
    n_frames = frames.count()
    assert n_frames >= 6  # at least one frame per blob
    per_src = frames.groupBy("source").count().collect()
    assert len(per_src) == 6
    # frame indexes contiguous from 0
    firsts = frames.groupBy("source").agg(F.min("frame_index").alias("m")).collect()
    assert all(r["m"] == 0 for r in firsts)
