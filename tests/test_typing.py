"""Typing-kernel tests mirroring the reference's per-type suites
(src/test/scala/ai/tripl/arc/transform/typing/*) and the KnownData
golden fixture (util/TestUtils.scala:26-37,127-159)."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest

from arc_spark.schema import ColumnSpec, parse_arc_schema, to_struct_type
from arc_spark.operators.typing import error_rate, typing_transform


def _one(spark, spec: ColumnSpec, value):
    df = spark.createDataFrame([(value,)], f"{spec.name} string")
    row = typing_transform(df, [spec]).first()
    return row[spec.name], row["_errors"]


def test_integer_basic(spark):
    spec = ColumnSpec("v", "integer")
    assert _one(spark, spec, "17") == (17, [])
    v, errs = _one(spark, spec, "abc")
    assert v is None and len(errs) == 1 and errs[0]["field"] == "v"


def test_integer_trim_and_overflow(spark):
    spec = ColumnSpec("v", "integer", trim=True)
    assert _one(spark, spec, "   88  ")[0] == 88
    v, errs = _one(spark, spec, "9999999999")  # > int32
    assert v is None and len(errs) == 1


def test_long_and_double(spark):
    assert _one(spark, ColumnSpec("v", "long"), "1520828868")[0] == 1520828868
    assert _one(spark, ColumnSpec("v", "double"), "42.4242")[0] == 42.4242


def test_formatted_number_grouping(spark):
    spec = ColumnSpec("v", "integer", formatters=["#,##0"])
    assert _one(spark, spec, "1,234,567")[0] == 1234567


def test_decimal_precision_scale(spark):
    spec = ColumnSpec("v", "decimal", precision=10, scale=3)
    assert _one(spark, spec, "54.321")[0] == Decimal("54.321")
    # overflow precision → error
    v, errs = _one(spark, ColumnSpec("v", "decimal", precision=4, scale=3), "54.321")
    assert v is None and len(errs) == 1


def test_boolean_true_false_values(spark):
    spec = ColumnSpec("v", "boolean", true_values=["true", "Y"], false_values=["false", "N"])
    assert _one(spark, spec, "Y")[0] is True
    assert _one(spark, spec, "N")[0] is False
    v, errs = _one(spark, spec, "maybe")
    assert v is None and len(errs) == 1


def test_date_formatters_in_order(spark):
    spec = ColumnSpec("v", "date", formatters=["yyyy-MM-dd", "dd/MM/yyyy"])
    assert _one(spark, spec, "2016-12-18")[0] == datetime.date(2016, 12, 18)
    assert _one(spark, spec, "18/12/2016")[0] == datetime.date(2016, 12, 18)
    v, errs = _one(spark, spec, "12-18-2016")
    assert v is None and len(errs) == 1


def test_timestamp_with_timezone(spark):
    spec = ColumnSpec("v", "timestamp", formatters=["yyyy-MM-dd HH:mm:ss"], timezone_id="UTC")
    got, _ = _one(spark, spec, "2017-12-20 21:46:54")
    assert got == datetime.datetime(2017, 12, 20, 21, 46, 54)
    # +01:00 zone: 21:46 wall clock = 20:46 UTC
    spec2 = ColumnSpec("v", "timestamp", formatters=["yyyy-MM-dd HH:mm:ss"], timezone_id="Europe/Paris")
    got2, _ = _one(spark, spec2, "2017-12-20 21:46:54")
    assert got2 == datetime.datetime(2017, 12, 20, 20, 46, 54)


def test_time_is_iso_string(spark):
    # Arc stores time-of-day as string (api/API.scala:196-198)
    assert _one(spark, ColumnSpec("v", "time"), "12:34:56")[0] == "12:34:56"
    v, errs = _one(spark, ColumnSpec("v", "time"), "25:99:99x")
    assert v is None and len(errs) == 1


def test_binary_encodings(spark):
    assert _one(spark, ColumnSpec("v", "binary"), "YWJj")[0] == bytearray(b"abc")
    assert (
        _one(spark, ColumnSpec("v", "binary", encoding="hexadecimal"), "616263")[0]
        == bytearray(b"abc")
    )
    v, errs = _one(spark, ColumnSpec("v", "binary", encoding="hexadecimal"), "zz")
    assert v is None and len(errs) == 1


def test_string_constraints(spark):
    spec = ColumnSpec("v", "string", min_length=2, max_length=5, regex="^[a-z]+$")
    assert _one(spark, spec, "abc")[0] == "abc"
    for bad in ("a", "abcdefgh", "ABC"):
        v, errs = _one(spark, spec, bad)
        assert v is None and len(errs) == 1, bad


def test_nullable_values_and_replacement(spark):
    spec = ColumnSpec("v", "integer", nullable_values=["", "null"], null_replacement_value="42")
    assert _one(spark, spec, "")[0] == 42
    assert _one(spark, spec, "null")[0] == 42
    spec2 = ColumnSpec("v", "integer", nullable_values=[""])
    assert _one(spark, spec2, "")[0] is None


def test_non_nullable_null_is_error(spark):
    spec = ColumnSpec("v", "integer", nullable=False, nullable_values=[""])
    v, errs = _one(spark, spec, "")
    assert v is None
    assert len(errs) == 1 and "non-nullable" in errs[0]["message"]


def test_known_dataset_end_to_end(spark):
    """KnownData analogue: every type in one row, string-cast then typed."""
    schema_json = """[
      {"name": "booleanDatum", "type": "boolean"},
      {"name": "dateDatum", "type": "date"},
      {"name": "decimalDatum", "type": "decimal", "precision": 10, "scale": 3},
      {"name": "doubleDatum", "type": "double"},
      {"name": "integerDatum", "type": "integer", "trim": true},
      {"name": "longDatum", "type": "long"},
      {"name": "stringDatum", "type": "string"},
      {"name": "timeDatum", "type": "time"},
      {"name": "timestampDatum", "type": "timestamp",
       "formatters": ["yyyy-MM-dd HH:mm:ss"], "timezoneId": "UTC"},
      {"name": "nullDatum", "type": "string", "nullableValues": ["", "null"]}
    ]"""
    specs = parse_arc_schema(schema_json)
    df = spark.createDataFrame(
        [
            ("true", "2016-12-18", "54.321", "42.4242", "  17 ", "1520828868",
             "test,breakdelimiter", "12:34:56", "2017-12-20 21:46:54", "null"),
            ("false", "2016-12-19", "12.345", "3.14", "88", "1520828869",
             "second", "23:59:59", "2017-12-29 17:21:49", ""),
        ],
        "booleanDatum string, dateDatum string, decimalDatum string, doubleDatum string,"
        "integerDatum string, longDatum string, stringDatum string, timeDatum string,"
        "timestampDatum string, nullDatum string",
    )
    out = typing_transform(df, specs)
    rows = out.orderBy("integerDatum").collect()
    assert rows[0]["integerDatum"] == 17 and rows[1]["integerDatum"] == 88
    assert rows[0]["booleanDatum"] is True
    assert rows[0]["decimalDatum"] == Decimal("54.321")
    assert rows[0]["nullDatum"] is None
    assert rows[0]["_errors"] == [] and rows[1]["_errors"] == []
    assert error_rate(out) == 0.0
    # metadata survived
    f = dict(zip(out.schema.names, out.schema.fields))
    assert f["_errors"].metadata.get("internal") is True
    # declared→Spark schema mapping
    st = to_struct_type(specs)
    assert st["timeDatum"].dataType.simpleString() == "string"
    assert st["decimalDatum"].dataType.simpleString() == "decimal(10,3)"


def test_parse_arc_schema_error_accumulation(spark):
    with pytest.raises(ValueError) as ei:
        parse_arc_schema('[{"name": "a", "type": "nope"}, {"type": "string"}]')
    msg = str(ei.value)
    assert "field[0]" in msg and "field[1]" in msg
