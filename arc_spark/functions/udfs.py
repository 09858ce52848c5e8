"""Built-in SQL function registry — the UDFPlugin analogue.

Reference parity: ``plugins/udf/ARC.scala:37-211`` registers
get_json_double_array / get_json_integer_array / get_json_long_array
(JSON-pointer array extraction, :62-113), random (:115-117), struct_keys
(:119-125), probit / probnorm (:205-211).

Two tiers here:
- **Column helpers** (this module's functions): pure JVM expressions for
  DataFrame-API users — zero serde, preferred in pipelines.
- **SQL-registered functions** (``register_udfs``): the same names callable
  from SQLTransform SQL text; json-array extraction registers as
  Arrow-vectorized pandas UDFs (SQL registration can't wrap a parametrized
  JVM expression), probit/probnorm as pandas UDFs over erf / Acklam's
  inverse-normal approximation (public-domain constants).

get_uri / get_uri_array (:127-202): executor-side URL fetching with
auto-decompression — tested against a localhost server (external egress
is unavailable in this sandbox, but the code path is identical).
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@pandas_udf(DoubleType())
def _probnorm(p: pd.Series) -> pd.Series:
    """Gaussian CDF (plugins/udf/ARC.scala:209-211)."""
    return p.map(
        lambda x: None if x is None else 0.5 * (1.0 + math.erf(float(x) / math.sqrt(2.0)))
    )


def _inv_norm_scalar(p: float) -> float:
    # Acklam's rational approximation of the inverse normal CDF —
    # standard public-domain constants; |relative error| < 1.15e-9.
    if p <= 0.0 or p >= 1.0:
        return float("nan")
    a = [-3.969683028665376e01, 2.209460984245205e02, -2.759285104469687e02,
         1.383577518672690e02, -3.066479806614716e01, 2.506628277459239e00]
    b = [-5.447609879822406e01, 1.615858368580409e02, -1.556989798598866e02,
         6.680131188771972e01, -1.328068155288572e01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e00,
         -2.549732539343734e00, 4.374664141464968e00, 2.938163982698783e00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e00,
         3.754408661907416e00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    if p > phigh:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1
    )


@pandas_udf(DoubleType())
def _probit(p: pd.Series) -> pd.Series:
    """Gaussian inverse CDF (plugins/udf/ARC.scala:205-207)."""
    return p.map(lambda x: None if x is None else _inv_norm_scalar(float(x)))


def _json_array_udf(py_type):
    def extract(js: pd.Series, path: pd.Series) -> pd.Series:
        def one(j, p):
            if j is None or p is None:
                return None
            try:
                node = json.loads(j)
                for part in p.lstrip("$").strip(".").split("."):
                    if part:
                        node = node[part]
                return [None if v is None else py_type(v) for v in node]
            except (ValueError, KeyError, TypeError):
                return None

        return pd.Series([one(j, p) for j, p in zip(js, path)])

    return extract


def _fetch_uri(uri: str) -> bytes | None:
    """Executor-side fetch with transparent gzip/deflate/bz2/lz4-frame
    decompression by suffix or content-encoding
    (plugins/udf/ARC.scala:127-202)."""
    import bz2
    import gzip
    import urllib.request

    if uri is None:
        return None
    scheme = uri.split("://", 1)[0] if "://" in uri else ("file" if uri.startswith(("/", "file:")) else "")
    if scheme not in ("http", "https", "file"):
        # Executors have no JVM access, so Hadoop-FS fetches can't run
        # inside a Python UDF. pyarrow.fs covers the common cluster
        # schemes natively (s3://, gs://, hdfs:// where libhdfs exists) —
        # try it, and only if pyarrow can't resolve the scheme point at
        # BytesExtract (Spark binaryFile handles any configured scheme,
        # with pushdown + a parallel scan besides).
        try:
            return _fetch_via_pyarrow(uri)
        except (ImportError, OSError, ValueError) as e:
            raise ValueError(
                f"get_uri could not fetch {scheme!r} URI via pyarrow.fs "
                f"({e}); for object storage prefer BytesExtract (Spark "
                f"binaryFile source handles any cluster-configured scheme)"
            ) from e
    if not uri.startswith(("http://", "https://", "file:")):
        uri = "file://" + uri
    with urllib.request.urlopen(uri) as resp:
        data = resp.read()
        enc = (resp.headers.get("Content-Encoding") or "").lower()
    return _decompress_by_suffix(uri, data, enc)


def _fetch_via_pyarrow(uri: str) -> bytes:
    """Fetch any pyarrow.fs-resolvable URI (s3://, gs://, hdfs:// where
    libhdfs is present — and file://, which unit tests exercise) with the
    same suffix-based decompression as the http path."""
    from pyarrow import fs as pa_fs

    filesystem, path = pa_fs.FileSystem.from_uri(uri)
    # compression=None: pyarrow would otherwise auto-decompress by
    # extension — suffix handling stays in _decompress_by_suffix so all
    # fetch routes share one behavior
    with filesystem.open_input_stream(path, compression=None) as f:
        data = f.read()
    return _decompress_by_suffix(uri, data, "")


def _decompress_by_suffix(uri: str, data: bytes, enc: str) -> bytes:
    import bz2
    import gzip

    if uri.endswith(".gz") or enc == "gzip":
        return gzip.decompress(data)
    if uri.endswith(".bz2"):
        return bz2.decompress(data)
    if uri.endswith(".zz") or enc == "deflate":
        import zlib

        return zlib.decompress(data)
    return data


@pandas_udf(BinaryType())
def _get_uri(uris: pd.Series) -> pd.Series:
    return uris.map(_fetch_uri)


def _get_uri_array_impl(uris: pd.Series) -> pd.Series:
    def many(u):
        if u is None:
            return None
        return [_fetch_uri(x) for x in str(u).split(",")]

    return uris.map(many)


def _expand_uri(uri: str) -> list[tuple[bytes, str]]:
    """(content, filename) pairs for a URI; file URIs may be GLOB patterns
    (plugins/udf/ARC.scala:146-202 getURIFilenameArray)."""
    if uri.startswith(("http://", "https://")):
        return [(_fetch_uri(uri), uri)]
    import glob as _glob

    path = uri[7:] if uri.startswith("file://") else uri
    matches = sorted(_glob.glob(path))
    if not matches:
        raise FileNotFoundError(f"no files found for uri '{uri}'")
    return [(_fetch_uri("file://" + os.path.abspath(m)), m) for m in matches]


def _get_uri_filename_array_impl(uris: pd.Series) -> pd.Series:
    def many(u):
        if u is None:
            return None
        return [{"value": v, "filename": f} for v, f in _expand_uri(str(u))]

    return uris.map(many)


def register_udfs(spark: SparkSession) -> list[str]:
    """Register the built-in function set for SQL callers; returns the
    registered names (mirrors udf/UDF.scala:11-29 catalog diffing)."""
    registered = []
    spark.udf.register("probit", _probit)
    spark.udf.register("probnorm", _probnorm)
    registered += ["probit", "probnorm"]

    for name, elem, py in (
        ("get_json_double_array", DoubleType(), float),
        ("get_json_integer_array", IntegerType(), int),
        ("get_json_long_array", LongType(), int),
    ):
        spark.udf.register(name, pandas_udf(_json_array_udf(py), ArrayType(elem)))
        registered.append(name)

    # driver-free URI fetching (http(s)/file incl. globs) with
    # auto-decompression
    spark.udf.register("get_uri", _get_uri)
    spark.udf.register(
        "get_uri_array", pandas_udf(_get_uri_array_impl, ArrayType(BinaryType()))
    )
    spark.udf.register(
        "get_uri_filename_array",
        pandas_udf(
            _get_uri_filename_array_impl,
            ArrayType(
                StructType(
                    [
                        StructField("value", BinaryType()),
                        StructField("filename", StringType()),
                    ]
                )
            ),
        ),
    )
    registered += ["get_uri", "get_uri_array", "get_uri_filename_array"]

    # random (plugins/udf/ARC.scala:115-117) — newer Spark ships a native
    # `random()` alias of rand(); register a fallback only if absent so
    # SQL written against the reference always resolves
    try:
        spark.sql("SELECT random()").collect()
    except Exception:
        import random as _random

        spark.udf.register("random", lambda: _random.random(), DoubleType())
    registered.append("random")

    # struct_keys (plugins/udf/ARC.scala:119-125): SQL callers get a
    # row-level UDF (structs reach Python as Rows); DataFrame pipelines
    # should prefer the JVM column helper `struct_keys` below
    spark.udf.register(
        "struct_keys",
        lambda row: None if row is None else list(row.asDict().keys()),
        ArrayType(StringType()),
    )
    registered.append("struct_keys")
    return registered


# -- column-level JVM equivalents (preferred in DataFrame pipelines) ---------


def get_json_double_array(json_col: Column, path: str) -> Column:
    return F.from_json(F.get_json_object(json_col, path), ArrayType(DoubleType()))


def get_json_integer_array(json_col: Column, path: str) -> Column:
    return F.from_json(F.get_json_object(json_col, path), ArrayType(IntegerType()))


def get_json_long_array(json_col: Column, path: str) -> Column:
    return F.from_json(F.get_json_object(json_col, path), ArrayType(LongType()))


def struct_keys(struct_col: Column) -> Column:
    """plugins/udf/ARC.scala:119-125 — keys of a struct column."""
    return F.json_object_keys(F.to_json(struct_col))
