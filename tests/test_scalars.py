"""The reference's scalar operator set (SURVEY.md 2.8) as column
expressions — semantics asserted value-by-value."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from hhek2sqlite_spark.functions import scalars


def _vals(spark, col_expr, data, in_type=StringType()):
    schema = StructType([StructField("x", in_type)])
    df = spark.createDataFrame([(d,) for d in data], schema)
    return [r[0] for r in df.select(col_expr).collect()]


def test_comma2point_forward(spark):
    # F3: '1,10' -> '1.10' (/root/reference/hhek2sqlite.go:161-167)
    assert _vals(spark, scalars.comma2point("x"), ["1,10", "0,0001", "5"]) == [
        "1.10", "0.0001", "5",
    ]


def test_point2comma_reverse(spark):
    assert _vals(spark, scalars.point2comma("x"), ["1.10", "5"]) == ["1,10", "5"]


def test_money_from_locale_string_exact(spark):
    out = _vals(spark, scalars.money_from_locale_string("x"), ["1,10", "1.10", "", None])
    assert out == [Decimal("1.1000"), Decimal("1.1000"), None, None]


def test_money_roundtrip_locale(spark):
    money = scalars.money_from_locale_string("x")
    out = _vals(spark, scalars.money_to_locale_string(money, comma=True), ["1234,5678"])
    assert out == ["1234,5678"]


def test_empty_to_null_vs_blank(spark):
    # F8/P3: only zero-length routes to NULL (reference checks byte length);
    # blank_to_null is the stricter ingest variant
    assert _vals(spark, scalars.empty_to_null("x"), ["", " ", "a"]) == [None, " ", "a"]
    assert _vals(spark, scalars.blank_to_null("x"), ["", " ", "a"]) == [None, None, "a"]


def test_decode_cp1252_euro_and_swedish(spark):
    # F1: euro is 0x80 in windows-1252; å=0xE5 ä=0xE4 ö=0xF6
    data = [bytes([0x80]), "räksmörgås".encode("cp1252")]
    out = _vals(spark, scalars.decode_cp1252("x"), data, BinaryType())
    assert out == ["€", "räksmörgås"]


def test_encode_decode_roundtrip(spark):
    df = spark.createDataFrame([("Tom € räksmörgås",)], "s string")
    out = df.select(scalars.decode_cp1252(scalars.encode_cp1252("s")).alias("r")).collect()
    assert out[0].r == "Tom € räksmörgås"


def test_iso_date_parse_and_format(spark):
    import datetime

    d = _vals(spark, scalars.iso_date("x"), ["2020-12-24"])
    assert d == [datetime.date(2020, 12, 24)]
    df = spark.createDataFrame([("2020-12-24",)], "x string")
    out = df.select(scalars.iso_format(scalars.iso_date("x")).alias("s")).collect()
    assert out[0].s == "2020-12-24"


def test_year_int(spark):
    assert _vals(spark, scalars.year_int("x"), ["1999", "0", ""]) == [1999, 0, None]


def test_no_python_udfs_in_core():
    """Policy check (SURVEY.md 2.10): the functions module must compile to
    pure Column expressions — no pyspark UDF wrappers."""
    import inspect

    src = inspect.getsource(scalars)
    assert "udf" not in src.lower().replace("udfs", "")
