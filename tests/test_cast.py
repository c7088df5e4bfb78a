"""Cast-kernel parity (SURVEY §2.6, cast.cc): safe overflow/truncation
semantics, unit conversions, uint logical bounds, list casts."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.utils import PythonException

from apache_arrow_spark.compute.cast import (
    CastOptions,
    cast_expr,
    date32_to_date64,
    date64_to_date32,
    time_shift,
    timestamp_from_long,
    timestamp_to_long,
)

try:  # Spark surfaces assert_true failures as different exception classes
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    RAISES = (SparkRuntimeException, PythonException, Exception)
except ImportError:  # pragma: no cover
    RAISES = (Exception,)


def _one(spark, value, dtype, expr):
    df = spark.createDataFrame([(value,)], f"v {dtype}")
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_int_narrowing_ok(spark):
    assert _one(spark, 120, "int", cast_expr(F.col("v"), "int8")) == 120


def test_int_overflow_raises(spark):
    with pytest.raises(RAISES):
        _one(spark, 300, "int", cast_expr(F.col("v"), "int8"))


def test_int_overflow_allowed_wraps(spark):
    out = _one(spark, 300, "int", cast_expr(F.col("v"), "int8", CastOptions(allow_int_overflow=True)))
    assert out == 300 - 256  # two's-complement wrap, like static_cast


def test_uint_logical_bounds(spark):
    # uint8 widens to short but still rejects >255 (SURVEY §1.2)
    assert _one(spark, 255, "int", cast_expr(F.col("v"), "uint8")) == 255
    with pytest.raises(RAISES):
        _one(spark, 256, "int", cast_expr(F.col("v"), "uint8"))
    with pytest.raises(RAISES):
        _one(spark, -1, "int", cast_expr(F.col("v"), "uint8"))


def test_uint64_to_decimal(spark):
    out = _one(spark, 2**62, "bigint", cast_expr(F.col("v"), "uint64"))
    assert int(out) == 2**62


def test_float_to_int_truncates_toward_zero(spark):
    assert _one(spark, 2.9, "double", cast_expr(F.col("v"), "int32")) == 2


def test_bool_numeric_casts(spark):
    assert _one(spark, True, "boolean", cast_expr(F.col("v"), "int32")) == 1
    assert _one(spark, 1, "int", cast_expr(F.col("v"), "bool")) is True


def test_null_to_any(spark):
    assert _one(spark, 1, "int", cast_expr(F.col("v"), "null")) is None


def test_time_shift_upscale(spark):
    assert _one(spark, 5, "bigint", time_shift(F.col("v"), "s", "ms")) == 5000


def test_time_shift_truncation_guard(spark):
    opts = CastOptions(allow_time_truncate=True)
    assert _one(spark, 1234567, "bigint", time_shift(F.col("v"), "ns", "us", opts)) == 1234
    with pytest.raises(RAISES):
        _one(spark, 1234567, "bigint", time_shift(F.col("v"), "ns", "us"))
    # exact multiple needs no allowance
    assert _one(spark, 1234000, "bigint", time_shift(F.col("v"), "ns", "us")) == 1234


def test_time_shift_exact_at_nano_magnitude(spark):
    # doubles would misround here (~1.7e18); decimal division must not
    v = 1704067589165275999
    got = _one(spark, v, "bigint", time_shift(F.col("v"), "ns", "us", CastOptions(True, True)))
    assert got == v // 1000


def test_timestamp_long_roundtrip(spark):
    us = 1704067798778549
    ts = timestamp_from_long(F.col("v"), "us")
    back = timestamp_to_long(ts, "us")
    assert _one(spark, us, "bigint", back) == us


def test_date32_date64(spark):
    assert _one(spark, 19723, "int", date32_to_date64(F.col("v"))) == 19723 * 86400000
    assert _one(spark, 19723 * 86400000, "bigint", date64_to_date32(F.col("v"))) == 19723
    with pytest.raises(RAISES):
        _one(spark, 19723 * 86400000 + 1, "bigint", date64_to_date32(F.col("v")))


def test_list_cast(spark):
    df = spark.createDataFrame([([1.9, 2.2],)], "v array<double>")
    out = df.select(cast_expr(F.col("v"), "list<int32>").alias("o")).collect()[0]["o"]
    assert out == [1, 2]


def test_decimal_cast(spark):
    out = _one(spark, 12.345, "double", cast_expr(F.col("v"), "decimal(10,2)"))
    assert str(out) == "12.35"  # round-half-up rescale (util/decimal.h Rescale)
