"""Reader for the reference's cross-implementation JSON test format
(SURVEY §2.1 'JSON integration format'; cpp/src/arrow/ipc/json-internal.cc,
integration/integration_test.py, sample: integration/data/simple.json).

Test-harness-only utility (as in the reference — it is NOT df.write.json):
parses {schema, batches[{count, columns[{VALIDITY, DATA, OFFSET,
children}]}]} into pyarrow arrays, then a Spark DataFrame through the
engine's type mapping.  Covers the corpus families the harness generates
(FIXTURES.md A1-A4): ints/uints, floats, bool, utf8/binary, decimal,
date/time/timestamp, list, struct.
"""

from __future__ import annotations

import json
from decimal import Decimal

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def _arrow_type(t: dict, children: list) -> pa.DataType:
    name = t["name"]
    if name == "int":
        bits, signed = t["bitWidth"], t.get("isSigned", True)
        return {
            (8, True): pa.int8(), (16, True): pa.int16(), (32, True): pa.int32(), (64, True): pa.int64(),
            (8, False): pa.uint8(), (16, False): pa.uint16(), (32, False): pa.uint32(), (64, False): pa.uint64(),
        }[(bits, signed)]
    if name == "floatingpoint":
        return {"HALF": pa.float16(), "SINGLE": pa.float32(), "DOUBLE": pa.float64()}[t["precision"]]
    if name == "bool":
        return pa.bool_()
    if name == "utf8":
        return pa.string()
    if name == "binary":
        return pa.binary()
    if name == "fixedsizebinary":
        return pa.binary(t["byteWidth"])
    if name == "decimal":
        return pa.decimal128(t["precision"], t["scale"])
    if name == "date":
        return pa.date32() if t["unit"] == "DAY" else pa.date64()
    if name == "time":
        unit = {"SECOND": "s", "MILLISECOND": "ms", "MICROSECOND": "us", "NANOSECOND": "ns"}[t["unit"]]
        return pa.time32(unit) if unit in ("s", "ms") else pa.time64(unit)
    if name == "timestamp":
        unit = {"SECOND": "s", "MILLISECOND": "ms", "MICROSECOND": "us", "NANOSECOND": "ns"}[t["unit"]]
        return pa.timestamp(unit, tz=t.get("timezone"))
    if name == "list":
        return pa.list_(children[0])
    if name == "struct":
        return pa.struct(children)
    raise NotImplementedError(f"json-integration type {name}")


def _field(f: dict) -> pa.Field:
    children = [_field(c) for c in f.get("children", [])]
    if f["type"]["name"] == "list":
        at = _arrow_type(f["type"], [children[0].type])
    elif f["type"]["name"] == "struct":
        at = _arrow_type(f["type"], children)
    else:
        at = _arrow_type(f["type"], [])
    return pa.field(f["name"], at, nullable=f.get("nullable", True))


def _build_array(col: dict, field: pa.Field) -> pa.Array:
    at = field.type
    count = col["count"]
    validity = col.get("VALIDITY") or [1] * count

    def valid(i):
        return bool(validity[i])

    if pa.types.is_list(at):
        offsets = [int(x) for x in col["OFFSET"]]
        child_field = pa.field("item", at.value_type)
        child = _build_array(col["children"][0], child_field)
        values = [
            child.take(pa.array(range(offsets[i], offsets[i + 1]))).to_pylist()
            if valid(i)
            else None
            for i in range(count)
        ]
        return pa.array(values, type=at)
    if pa.types.is_struct(at):
        kids = {
            at.field(j).name: _build_array(col["children"][j], at.field(j))
            for j in range(at.num_fields)
        }
        values = [
            {n: kids[n][i].as_py() for n in kids} if valid(i) else None
            for i in range(count)
        ]
        return pa.array(values, type=at)

    data = col.get("DATA", [])

    def conv(v):
        if pa.types.is_integer(at) or pa.types.is_temporal(at):
            return int(v)
        if pa.types.is_floating(at):
            return float(v)
        if pa.types.is_decimal(at):
            return Decimal(str(v)).scaleb(-at.scale) if isinstance(v, (int, str)) and "." not in str(v) else Decimal(str(v))
        if pa.types.is_binary(at) or pa.types.is_fixed_size_binary(at):
            return bytes.fromhex(v) if isinstance(v, str) else bytes(v)
        return v

    values = [conv(data[i]) if valid(i) else None for i in range(count)]
    if pa.types.is_temporal(at):
        return pa.array(values, type=pa.int64()).cast(at)
    return pa.array(values, type=at)


def read_json_integration(spark: SparkSession, path: str) -> DataFrame:
    """JSON-integration file -> Spark DataFrame (all batches concatenated),
    through the engine's arrow->spark type mapping (uint widening etc.)."""
    from apache_arrow_spark.io.pandas_bridge import from_arrow

    with open(path) as fh:
        doc = json.load(fh)
    fields = [_field(f) for f in doc["schema"]["fields"]]
    schema = pa.schema(fields)
    batches = []
    for b in doc["batches"]:
        arrays = [
            _build_array(b["columns"][j], fields[j]) for j in range(len(fields))
        ]
        batches.append(pa.RecordBatch.from_arrays(arrays, schema=schema))
    table = pa.Table.from_batches(batches) if batches else schema.empty_table()
    return from_arrow(spark, table)


def validate_json_integration(spark: SparkSession, path: str) -> dict:
    """The harness's VALIDATE mode analog: row/column counts + null tallies
    per column, for comparing against another implementation's read."""
    df = read_json_integration(spark, path)
    out = {"rows": df.count(), "columns": len(df.columns)}
    import pyspark.sql.functions as F

    nulls = df.select(
        [F.sum(F.col(c).isNull().cast("int")).alias(c) for c in df.columns]
    ).collect()[0]
    out["null_counts"] = {c: int(nulls[c]) for c in df.columns}
    return out
