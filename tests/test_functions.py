"""UDF registry tests (plugins/udf/ARC.scala parity)."""

from __future__ import annotations

import math

import pytest

from arc_spark.functions import register_udfs
from arc_spark.functions.udfs import (
    get_json_double_array,
    get_json_integer_array,
    struct_keys,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_udfs(spark)
    assert "probit" in names and "get_json_long_array" in names


def test_probit_probnorm_roundtrip(spark):
    rows = spark.sql(
        "SELECT probit(0.975) AS q, probnorm(1.959963984540054) AS p"
    ).first()
    assert abs(rows["q"] - 1.959963984540054) < 1e-6
    assert abs(rows["p"] - 0.975) < 1e-12
    # roundtrip over a range
    got = spark.sql(
        "SELECT max(abs(probnorm(probit(p)) - p)) AS err FROM "
        "(SELECT id / 100 + 0.005 AS p FROM RANGE(99))"
    ).first()["err"]
    assert got < 1e-8


def test_get_json_array_sql(spark):
    row = spark.sql(
        """SELECT get_json_double_array('{"a": [1.5, 2.5]}', '$.a') AS d,
                  get_json_integer_array('{"a": [1, 2, 3]}', '$.a') AS i,
                  get_json_long_array('{"x": {"y": [9999999999]}}', '$.x.y') AS l"""
    ).first()
    assert row["d"] == [1.5, 2.5]
    assert row["i"] == [1, 2, 3]
    assert row["l"] == [9999999999]


def test_get_json_array_columns(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([('{"a": [1.5, 2.5], "b": [7]}',)], "js string")
    row = df.select(
        get_json_double_array(F.col("js"), "$.a").alias("d"),
        get_json_integer_array(F.col("js"), "$.b").alias("i"),
    ).first()
    assert row["d"] == [1.5, 2.5] and row["i"] == [7]


def test_struct_keys(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(F.struct(F.lit(1).alias("x"), F.lit("a").alias("y")).alias("s"))
    assert df.select(struct_keys(F.col("s")).alias("k")).first()["k"] == ["x", "y"]


def test_random_is_builtin(spark):
    # reference registers `random` (ARC.scala:115-117); Spark SQL has rand()
    v = spark.sql("SELECT rand(42) AS r").first()["r"]
    assert 0.0 <= v < 1.0


def test_get_uri_pyarrow_route(tmp_path):
    """Cluster-scheme URIs route through pyarrow.fs. The happy path is
    exercised with file:// (from_uri resolves it like s3://gs://hdfs://),
    including suffix decompression; an unreachable object-store URI
    surfaces the actionable BytesExtract pointer."""
    import gzip

    import pytest as _pytest

    from arc_spark.functions.udfs import _fetch_uri, _fetch_via_pyarrow

    p = tmp_path / "payload.txt"
    p.write_bytes(b"hello arrow fs")
    assert _fetch_via_pyarrow(f"file://{p}") == b"hello arrow fs"

    gz = tmp_path / "payload.bin.gz"
    gz.write_bytes(gzip.compress(b"zipped bytes"))
    assert _fetch_via_pyarrow(f"file://{gz}") == b"zipped bytes"

    with _pytest.raises(ValueError, match="BytesExtract"):
        _fetch_uri("abfss://container@acct.dfs.example/path")
