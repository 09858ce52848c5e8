"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested. Decoders are injectable
(``decoder=`` callables): ``fake_image_decoder`` is the deterministic
test stand-in; ``real_image_decoder`` prefers Pillow when importable
(full-format pixel decode) and otherwise falls back to from-scratch
readers of the PUBLIC file-format specs — full decode for 8-bit PNG
(IDAT inflate + scanline unfilter) and 24-bit BMP, header metadata for
JPEG. Audio remains injection-only (no stdlib-expressible codec).

Scale notes:
- Binary payloads never pass through Python row-at-a-time: mapInPandas
  streams Arrow record batches; ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounds per-batch memory, and media tables should
  set it low (e.g. 64) since rows are MBs, not bytes.
- Ingest uses Spark's binaryFile source (BytesExtract stage); metadata
  (width/height/duration/codec) lives in sibling typed columns so filters
  like ``duration_s < 600`` prune BEFORE any decode runs.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# typed metadata schemas
# ---------------------------------------------------------------------------

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)


def fake_image_decoder(data: bytes) -> dict:
    """Deterministic stand-in for a real image decode: derives metadata and
    an 8-float 'embedding' from the bytes (sha256-seeded). Replace with a
    real codec in deployment."""
    if data is None:
        return None
    h = hashlib.sha256(data).digest()
    w = 16 + h[0] % 64
    ht = 16 + h[1] % 64
    feats = [x / 255.0 for x in h[:8]]
    return {"width": w, "height": ht, "channels": 3, "format": "fake", "features": feats}


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _grid_features(px) -> list[float]:
    """8-float feature vector: mean intensity over a 2x2 spatial grid for
    the first two channels (normalized to [0,1]) — same shape as
    ``fake_image_decoder`` so downstream columns don't care which decoder
    produced them."""
    import numpy as np

    if px.shape[0] < 2:
        px = np.repeat(px, 2, axis=0)
    if px.shape[1] < 2:
        px = np.repeat(px, 2, axis=1)
    h, w = px.shape[:2]
    feats = []
    for ci in range(2):
        c = px[:, :, min(ci, px.shape[2] - 1)].astype(float)
        for ys in (slice(0, h // 2), slice(h // 2, h)):
            for xs in (slice(0, w // 2), slice(w // 2, w)):
                feats.append(float(c[ys, xs].mean() / 255.0))
    return feats


def _png_decode(data: bytes) -> dict:
    """From-scratch PNG decode (public spec, www.w3.org/TR/png): IHDR
    dims, IDAT inflate + per-scanline unfilter (types 0-4) for 8-bit
    gray/RGB/RGBA. Palette/16-bit/interlaced images return header-only
    metadata (features=None) rather than guessing."""
    import zlib

    import numpy as np

    pos, ihdr, idat = 8, None, b""
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos:pos + 4], "big")
        typ = data[pos + 4:pos + 8]
        if typ == b"IHDR":
            ihdr = data[pos + 8:pos + 8 + ln]
        elif typ == b"IDAT":
            idat += data[pos + 8:pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, interlace = ihdr[8], ihdr[9], ihdr[12]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    meta = {"width": w, "height": h, "channels": channels, "format": "png"}
    if depth != 8 or interlace != 0 or ctype == 3:
        return {**meta, "features": None}
    raw = zlib.decompress(idat)
    stride = w * channels
    img = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    off = 0
    for y in range(h):
        f = raw[off]
        row = np.frombuffer(raw[off + 1:off + 1 + stride], np.uint8).copy()
        off += 1 + stride
        if f == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (int(row[i]) + int(row[i - channels])) & 0xFF
        elif f == 2:  # Up
            row = (row + prev).astype(np.uint8)
        elif f == 3:  # Average
            for i in range(stride):
                a = int(row[i - channels]) if i >= channels else 0
                row[i] = (int(row[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - channels]) if i >= channels else 0
                b = int(prev[i])
                c = int(prev[i - channels]) if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pr) & 0xFF
        img[y] = row
        prev = row
    px = img.reshape(h, w, channels)
    return {**meta, "features": _grid_features(px)}


def _bmp_decode(data: bytes) -> dict:
    """Uncompressed 24-bit BMP (public spec); other variants header-only."""
    import numpy as np

    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    meta = {"width": abs(w), "height": abs(h), "channels": max(1, bpp // 8),
            "format": "bmp"}
    if bpp != 24 or comp != 0:
        return {**meta, "features": None}
    off = int.from_bytes(data[10:14], "little")
    stride = (abs(w) * 3 + 3) & ~3
    rows = []
    for y in range(abs(h)):
        line = np.frombuffer(data[off + y * stride:off + y * stride + abs(w) * 3],
                             np.uint8).reshape(abs(w), 3)
        rows.append(line[:, ::-1])  # BGR -> RGB
    px = np.stack(rows[::-1] if h > 0 else rows)  # bottom-up unless h<0
    return {**meta, "features": _grid_features(px)}


def _jpeg_header(data: bytes) -> dict:
    """JPEG dimensions from the SOF marker (public spec) — header-only
    (features=None): a from-scratch Huffman+IDCT is out of scope; Pillow
    handles pixels where installed."""
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(data[pos + 5:pos + 7], "big")
            w = int.from_bytes(data[pos + 7:pos + 9], "big")
            ch = data[pos + 9]
            return {"width": w, "height": h, "channels": ch,
                    "format": "jpeg", "features": None}
        pos += 2 + ln
    raise ValueError("no SOF marker found in JPEG stream")


def real_image_decoder(data: bytes) -> dict:
    """Real image decode with the same signature/output shape as
    ``fake_image_decoder``. Prefers Pillow when importable (any format it
    supports, full pixels); otherwise falls back to the from-scratch
    decoders above — full decode for 8-bit PNG and 24-bit BMP, header
    metadata for JPEG. Raises ValueError on formats neither path can
    read (the mapInPandas batch fails loudly instead of fabricating)."""
    if data is None:
        return None
    try:  # optional dependency — the deployment's full-format path
        import io

        import numpy as np
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        fmt = (img.format or "unknown").lower()
        img = img.convert("RGB") if img.mode not in ("L", "RGB", "RGBA") else img
        px = np.asarray(img)
        if px.ndim == 2:
            px = px[:, :, None]
        return {"width": img.width, "height": img.height,
                "channels": px.shape[2], "format": fmt,
                "features": _grid_features(px)}
    except ImportError:
        pass
    if data[:8] == _PNG_MAGIC:
        return _png_decode(data)
    if data[:2] == b"BM":
        return _bmp_decode(data)
    if data[:2] == b"\xff\xd8":
        return _jpeg_header(data)
    raise ValueError(
        "unsupported image format for the built-in decoders (png/bmp/jpeg "
        "headers) — install Pillow for full-format decode"
    )


def decode_images(
    df: DataFrame,
    *,
    data_col: str = "value",
    decoder: Callable[[bytes], dict] = fake_image_decoder,
    features: bool = True,
) -> DataFrame:
    """binary column → image_meta struct (+ float feature vector).

    One Arrow pass; per-batch memory = maxRecordsPerBatch × payload size.
    """
    fields = list(df.schema.fields) + [T.StructField("image_meta", IMAGE_META, True)]
    if features:
        fields.append(T.StructField("features", T.ArrayType(T.FloatType()), True))
    out_schema = T.StructType(fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas, feats = [], []
            for data in pdf[data_col]:
                d = decoder(bytes(data)) if data is not None else None
                metas.append(
                    None
                    if d is None
                    else {k: d.get(k) for k in ("width", "height", "channels", "format")}
                )
                feats.append(None if d is None else d.get("features"))
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            if features:
                pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    data_col: str = "value",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """binary → binary resize. Stub resizer: sha-stamped truncation (keeps
    the plumbing testable); deployment injects a real one."""

    def fake_resize(data: bytes, w: int, h: int) -> bytes:
        stamp = _struct.pack("<II", w, h)
        return stamp + hashlib.sha256(data).digest()

    fn = resizer or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[data_col] = [
                None if d is None else fn(bytes(d), width, height) for d in pdf[data_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int,
    *,
    data_col: str = "value",
    id_col: str = "_filename",
    frame_extractor: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """video binary → exploded (id, frame_index, frame binary) rows.

    The one-to-many shape is the important part: mapInPandas yields MORE
    rows than it consumes, so frame explosion never buffers a whole video's
    frames in one Python object; downstream repartition spreads frames.
    """

    def fake_frames(data: bytes, n: int) -> list[bytes]:
        # deterministic: derive "frames" by chunking the sha-extended bytes
        h = hashlib.sha256(data).digest()
        count = 1 + h[0] % 7
        return [h + bytes([i]) for i in range(0, count, n)]

    fn = frame_extractor or fake_frames
    out_schema = T.StructType(
        [
            T.StructField("source", T.StringType(), True),
            T.StructField("frame_index", T.IntegerType(), True),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"source": [], "frame_index": [], "frame": []}
            for src, data in zip(pdf[id_col], pdf[data_col]):
                if data is None:
                    continue
                for i, frame in enumerate(fn(bytes(data), every_n)):
                    out["source"].append(str(src))
                    out["frame_index"].append(i)
                    out["frame"].append(frame)
            if out["source"]:
                yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=out_schema)
