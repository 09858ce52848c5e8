"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas`` operators.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual codec calls are STUBBED
behind ``decoder=`` callables because no image/audio libraries exist in
this container (a deployment passes e.g. a Pillow/torchaudio-backed
decoder with the same signature). A deterministic fake decoder ships for
tests.

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


def real_image_decoder(data: bytes) -> dict:  # pragma: no cover
    """The deployment slot: identical signature, backed by a real library."""
    raise NotImplementedError(
        "no image codec in this container — inject a Pillow/opencv-backed "
        "decoder with the same signature"
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
