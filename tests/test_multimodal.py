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


def test_real_decoder_rejects_unknown_bytes():
    with pytest.raises(ValueError, match="unsupported image format"):
        real_image_decoder(b"not-an-image")


# -- real_image_decoder: from-scratch PNG/BMP/JPEG (Pillow-preferred) ------

def _encode_png(px, filters=None):
    """Minimal PNG encoder (spec-faithful) used ONLY to feed the decoder:
    8-bit RGB, one chosen filter byte per scanline. Filtering here is the
    ENCODER transform (the inverse of decode unfiltering), so a decoder
    bug can't cancel out against an encoder bug."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    assert c == 3
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int64)
        f = filters[y]
        if f == 0:
            enc = row.copy()
        elif f == 1:
            left = np.concatenate([np.zeros(c, np.int64), row[:-c]])
            enc = (row - left) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(c, np.int64), row[:-c]])
            enc = (row - (left + prev) // 2) % 256
        elif f == 4:
            enc = np.zeros_like(row)
            for i in range(w * c):
                a = int(row[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (int(row[i]) - pr) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(typ, payload):
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", zlib.crc32(typ + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _gradient(h, w):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 255 // max(w - 1, 1)), (y * 255 // max(h - 1, 1)),
         np.full((h, w), 7)], axis=-1
    ).astype(np.uint8)


def test_real_decoder_png_gradient():
    import numpy as np

    px = _gradient(8, 8)
    d = real_image_decoder(_encode_png(px))
    assert (d["width"], d["height"], d["channels"], d["format"]) == (8, 8, 3, "png")
    # features = 2x2 grid means of channels 0..1, matching direct numpy
    want = []
    for ci in range(2):
        c = px[:, :, ci].astype(float)
        for ys in (slice(0, 4), slice(4, 8)):
            for xs in (slice(0, 4), slice(4, 8)):
                want.append(c[ys, xs].mean() / 255.0)
    assert np.allclose(d["features"], want)
    # left half darker than right half in channel 0 (x-gradient)
    assert d["features"][0] < d["features"][1]


def test_real_decoder_png_all_filter_types_agree():
    """The same pixels encoded under every PNG filter type (0-4) decode
    identically — exercising each unfilter branch for real."""
    px = _gradient(10, 6)
    base = real_image_decoder(_encode_png(px))["features"]
    for f in (1, 2, 3, 4):
        got = real_image_decoder(_encode_png(px, filters=[f] * 10))["features"]
        assert got == base, f"filter {f} decode diverged"
    mixed = real_image_decoder(
        _encode_png(px, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    )["features"]
    assert mixed == base


def test_real_decoder_bmp_and_jpeg_header():
    import struct

    import numpy as np

    px = _gradient(4, 4)
    # minimal 24-bit uncompressed BMP, bottom-up rows padded to 4 bytes
    stride = (4 * 3 + 3) & ~3
    body = bytearray()
    for y in range(3, -1, -1):
        row = px[y][:, ::-1].tobytes()  # RGB -> BGR
        body.extend(row + b"\x00" * (stride - len(row)))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 24, 0, len(body),
                            2835, 2835, 0, 0))
    d = real_image_decoder(bytes(header) + bytes(body))
    assert (d["width"], d["height"], d["format"]) == (4, 4, "bmp")
    want = real_image_decoder(_encode_png(px))["features"]
    assert np.allclose(d["features"], want)

    # JPEG: SOF0 marker carries the dimensions (header-only decode)
    jpeg = (b"\xff\xd8"                              # SOI
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 480, 640) + b"\x03" + b"\x00" * 2)
    d = real_image_decoder(jpeg)
    assert (d["width"], d["height"], d["channels"], d["format"]) == (
        640, 480, 3, "jpeg")
    assert d["features"] is None


def test_decode_images_with_real_decoder_arrow_path(spark):
    """real_image_decoder through the SAME mapInPandas plumbing the fake
    uses: a real PNG decodes inside an Arrow batch on executors."""
    pngs = [(i, _encode_png(_gradient(6 + i, 5))) for i in range(3)]
    df = spark.createDataFrame(pngs, "id long, value binary")
    out = decode_images(df, decoder=real_image_decoder).orderBy("id").collect()
    assert [r["image_meta"]["height"] for r in out] == [6, 7, 8]
    assert all(r["image_meta"]["format"] == "png" for r in out)
    assert all(len(r["features"]) == 8 for r in out)


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
