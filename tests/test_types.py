"""Type-mapping parity (SURVEY §1.2) over the reference integration corpus
type families (FIXTURES.md A1-A5)."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from apache_arrow_spark.types import (
    arrow_to_spark_schema,
    arrow_to_spark_type,
    roundtrip_lossless,
    spark_to_arrow_type,
)

PRIMITIVES = [
    (pa.bool_(), T.BooleanType()),
    (pa.int8(), T.ByteType()),
    (pa.int16(), T.ShortType()),
    (pa.int32(), T.IntegerType()),
    (pa.int64(), T.LongType()),
    (pa.uint8(), T.ShortType()),
    (pa.uint16(), T.IntegerType()),
    (pa.uint32(), T.LongType()),
    (pa.uint64(), T.DecimalType(20, 0)),
    (pa.float16(), T.FloatType()),
    (pa.float32(), T.FloatType()),
    (pa.float64(), T.DoubleType()),
    (pa.string(), T.StringType()),
    (pa.binary(), T.BinaryType()),
    (pa.date32(), T.DateType()),
    (pa.date64(), T.DateType()),
]


@pytest.mark.parametrize("at,expected", PRIMITIVES)
def test_primitive_mapping(at, expected):
    st, _ = arrow_to_spark_type(at)
    assert st == expected


@pytest.mark.parametrize(
    "at",
    [
        pa.bool_(), pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
        pa.float32(), pa.float64(), pa.string(), pa.binary(),
        pa.date32(), pa.binary(19), pa.binary(120),
        pa.time32("s"), pa.time32("ms"), pa.time64("us"), pa.time64("ns"),
        pa.timestamp("s"), pa.timestamp("ms"), pa.timestamp("us"), pa.timestamp("ns"),
        pa.timestamp("ms", tz="US/Eastern"), pa.timestamp("ns", tz="US/Pacific"),
        pa.decimal128(3, 2), pa.decimal128(38, 2),
        pa.list_(pa.int32()),
        pa.struct([pa.field("f1", pa.int32()), pa.field("f2", pa.string())]),
    ],
)
def test_metadata_roundtrip(at):
    """arrow -> spark(+meta) -> arrow restores the exact original type for
    every integration-corpus family (A1 primitive, A2 decimal, A3 datetime,
    A4 nested)."""
    assert roundtrip_lossless(at), at


def test_dictionary_decodes(at=pa.dictionary(pa.int8(), pa.string())):
    st, meta = arrow_to_spark_type(at)
    assert st == T.StringType()
    assert meta["dictionary_indices"] == "int8"


def test_union_tagged_struct():
    at = pa.union([pa.field("a", pa.int32()), pa.field("b", pa.string())], mode="dense")
    st, meta = arrow_to_spark_type(at)
    assert isinstance(st, T.StructType)
    assert st.fields[0].name == "tag"
    assert meta["type"] == "union"


@pytest.mark.parametrize("mode", ["dense", "sparse"])
def test_union_roundtrip_lossless(mode):
    at = pa.union(
        [pa.field("a", pa.int32()), pa.field("b", pa.string()), pa.field("c", pa.uint16())],
        mode=mode,
    )
    assert roundtrip_lossless(at), at


def test_schema_mapping_carries_field_metadata():
    sch = pa.schema([pa.field("u", pa.uint32()), pa.field("s", pa.string())])
    spark_schema = arrow_to_spark_schema(sch)
    assert spark_schema["u"].metadata["arrow"]["type"] == "uint32"
    assert spark_schema["s"].metadata == {}


def test_time_types_are_integers():
    st, meta = arrow_to_spark_type(pa.time64("ns"))
    assert st == T.LongType() and meta == {"type": "time64", "unit": "ns"}
    assert spark_to_arrow_type(st, meta) == pa.time64("ns")
