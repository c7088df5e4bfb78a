"""Reader + writer for the reference's cross-implementation JSON test
format (SURVEY §2.1 'JSON integration format'; cpp/src/arrow/ipc/
json-internal.cc, integration/integration_test.py, sample:
integration/data/simple.json).

Test-harness-only utility (as in the reference — it is NOT df.write.json):
parses {schema, batches[{count, columns[{VALIDITY, DATA, OFFSET,
children}]}]} into pyarrow arrays, then a Spark DataFrame through the
engine's type mapping.  Covers the corpus families the harness generates
(FIXTURES.md A1-A4): ints/uints, floats, bool, utf8/binary, decimal,
date/time/timestamp, list, struct, and dictionary-encoded fields (the
generate_dictionary_case family: top-level "dictionaries" entry + per-field
dictionary {id, indexType, isOrdered}, integration_test.py:667-715,874).

The writer is the harness's ``ARROW_TO_JSON`` mode
(cpp/src/arrow/ipc/json-integration-test.cc:193-224): any engine table can
be emitted as integration JSON and re-read, giving the bidirectional
golden-corpus round trip every reference implementation must pass
(integration/integration_test.py:810-921).  Conventions follow
json-internal.cc: 64-bit ints quoted as strings, binary as upper-hex,
decimals as unscaled-integer strings, utf8 offsets in utf-8 bytes.
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
    if "dictionary" in f:
        # Dictionary-encoded field (integration_test.py:686-715): the field's
        # "type" is the VALUE type; indexType + id + isOrdered live under the
        # "dictionary" entry, and the values themselves in the file's
        # top-level "dictionaries" list (resolved in read_json_integration_arrow).
        # The id rides along as field metadata so the writer re-emits the
        # same ids (byte fixpoint) and shared dictionaries stay shared.
        idx = _arrow_type(f["dictionary"]["indexType"], [])
        at = pa.dictionary(idx, at, ordered=f["dictionary"].get("isOrdered", False))
        return pa.field(
            f["name"],
            at,
            nullable=f.get("nullable", True),
            metadata={b"aas_dict_id": str(f["dictionary"]["id"]).encode()},
        )
    return pa.field(f["name"], at, nullable=f.get("nullable", True))


def _build_array(col: dict, field: pa.Field, dictionaries: dict | None = None) -> pa.Array:
    at = field.type
    count = col["count"]
    validity = col.get("VALIDITY") or [1] * count

    def valid(i):
        return bool(validity[i])

    if pa.types.is_dictionary(at):
        # The record-batch column of a dictionary field carries the INDEX
        # data only; values come from the file-level dictionary by id.
        if dictionaries is None:
            raise NotImplementedError(
                "json-integration: nested dictionary fields are not supported"
            )
        values = dictionaries[field.metadata[b"aas_dict_id"].decode()]
        indices = _build_array(col, pa.field(field.name, at.index_type))
        return pa.DictionaryArray.from_arrays(indices, values, ordered=at.ordered)

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
        phys = pa.int32() if at.bit_width == 32 else pa.int64()
        return pa.array(values, type=phys).cast(at)
    return pa.array(values, type=at)


# ---------------------------------------------------------------------------
# Writer (ARROW_TO_JSON mode)
# ---------------------------------------------------------------------------

_TIME_UNITS = {"s": "SECOND", "ms": "MILLISECOND", "us": "MICROSECOND", "ns": "NANOSECOND"}


def _type_json(at: pa.DataType) -> dict:
    if pa.types.is_integer(at):
        return {
            "name": "int",
            "isSigned": pa.types.is_signed_integer(at),
            "bitWidth": at.bit_width,
        }
    if pa.types.is_floating(at):
        prec = {2: "HALF", 4: "SINGLE", 8: "DOUBLE"}[at.byte_width]
        return {"name": "floatingpoint", "precision": prec}
    if pa.types.is_boolean(at):
        return {"name": "bool"}
    if pa.types.is_string(at):
        return {"name": "utf8"}
    if pa.types.is_fixed_size_binary(at):
        return {"name": "fixedsizebinary", "byteWidth": at.byte_width}
    if pa.types.is_binary(at):
        return {"name": "binary"}
    if pa.types.is_decimal(at):
        return {"name": "decimal", "precision": at.precision, "scale": at.scale}
    if pa.types.is_date32(at):
        return {"name": "date", "unit": "DAY"}
    if pa.types.is_date64(at):
        return {"name": "date", "unit": "MILLISECOND"}
    if pa.types.is_time32(at) or pa.types.is_time64(at):
        return {"name": "time", "unit": _TIME_UNITS[at.unit], "bitWidth": at.bit_width}
    if pa.types.is_timestamp(at):
        out = {"name": "timestamp", "unit": _TIME_UNITS[at.unit]}
        if at.tz:
            out["timezone"] = at.tz
        return out
    if pa.types.is_list(at):
        return {"name": "list"}
    if pa.types.is_struct(at):
        return {"name": "struct"}
    raise NotImplementedError(f"json-integration writer: type {at}")


def _field_json(f: pa.Field, dict_ids: dict[str, int] | None = None) -> dict:
    at = f.type
    if pa.types.is_dictionary(at):
        # Emit the VALUE type as the field type plus the dictionary entry
        # (id / indexType / isOrdered), per integration_test.py:697-708.
        out = _field_json(pa.field(f.name, at.value_type, nullable=f.nullable))
        out["dictionary"] = {
            "id": (dict_ids or {})[f.name],
            "indexType": _type_json(at.index_type),
            "isOrdered": at.ordered,
        }
        return out
    if pa.types.is_list(at):
        children = [_field_json(pa.field("item", at.value_type))]
    elif pa.types.is_struct(at):
        children = [_field_json(at.field(i)) for i in range(at.num_fields)]
    else:
        children = []
    return {
        "name": f.name,
        "type": _type_json(at),
        "nullable": f.nullable,
        "children": children,
    }


def _column_json(arr: pa.Array, name: str) -> dict:
    """One column entry: VALIDITY + DATA/OFFSET/children per json-internal.cc
    conventions (64-bit ints as strings, binary upper-hex, decimal unscaled
    string).  Null slots carry zero-filler DATA, as the C++ writer emits."""
    at = arr.type
    if pa.types.is_dictionary(at):
        # Batch column of a dictionary field = the index array only; the
        # values are written once in the file-level dictionaries entry.
        return _column_json(arr.indices, name)
    count = len(arr)
    values = arr.to_pylist()
    validity = [0 if v is None else 1 for v in values]
    out: dict = {"name": name, "count": count, "VALIDITY": validity}

    if pa.types.is_list(at):
        offsets, off = [0], 0
        for v in values:
            off += len(v) if v is not None else 0
            offsets.append(off)
        flat = [x for v in values if v is not None for x in v]
        child = pa.array(flat, type=at.value_type)
        out["OFFSET"] = offsets
        out["children"] = [_column_json(child, "item")]
        return out
    if pa.types.is_struct(at):
        out["children"] = [
            _column_json(arr.field(i), at.field(i).name) for i in range(at.num_fields)
        ]
        return out

    if pa.types.is_string(at):
        offsets, off = [0], 0
        for v in values:
            off += len(v.encode("utf-8")) if v is not None else 0
            offsets.append(off)
        out["OFFSET"] = offsets
        out["DATA"] = [v if v is not None else "" for v in values]
        return out
    if pa.types.is_binary(at) and not pa.types.is_fixed_size_binary(at):
        offsets, off = [0], 0
        for v in values:
            off += len(v) if v is not None else 0
            offsets.append(off)
        out["OFFSET"] = offsets
        out["DATA"] = [v.hex().upper() if v is not None else "" for v in values]
        return out
    if pa.types.is_fixed_size_binary(at):
        filler = "00" * at.byte_width
        out["DATA"] = [v.hex().upper() if v is not None else filler for v in values]
        return out
    if pa.types.is_boolean(at):
        out["DATA"] = [bool(v) if v is not None else False for v in values]
        return out
    if pa.types.is_decimal(at):
        scale = at.scale
        out["DATA"] = [
            str(int(v.scaleb(scale))) if v is not None else "0" for v in values
        ]
        return out
    if pa.types.is_temporal(at) or pa.types.is_integer(at):
        if pa.types.is_temporal(at):
            ints = arr.cast(pa.int32() if at.bit_width == 32 else pa.int64())
        else:
            ints = arr
        raw = ints.to_pylist()
        as_str = at.bit_width == 64  # spec: 64-bit ints quoted for JS readers
        out["DATA"] = [
            (str(v) if as_str else int(v)) if v is not None else ("0" if as_str else 0)
            for v in raw
        ]
        return out
    if pa.types.is_floating(at):
        out["DATA"] = [float(v) if v is not None else 0.0 for v in values]
        return out
    raise NotImplementedError(f"json-integration writer: column type {at}")


def write_json_integration(data, path: str) -> None:
    """ARROW_TO_JSON: emit a pyarrow Table / RecordBatch / Spark DataFrame
    as integration-format JSON readable by ``read_json_integration`` (and by
    the reference harness)."""
    if isinstance(data, DataFrame):
        data = data.toArrow()
    if isinstance(data, pa.RecordBatch):
        data = pa.Table.from_batches([data])

    # Dictionary registry: unify per-chunk dictionaries so one values array
    # serves every batch, then assign ids — a field's metadata id (set by the
    # reader) wins so a read->write round trip is a byte fixpoint; otherwise
    # first-appearance order, deduped on (value type, values) so columns
    # sharing a dictionary share an id (the reference's shared-dict case).
    dict_ids: dict[str, int] = {}
    dict_values: dict[int, pa.Array] = {}
    if any(pa.types.is_dictionary(f.type) for f in data.schema):
        data = data.unify_dictionaries()
        by_content: dict[tuple, int] = {}
        next_id = 0
        for f in data.schema:
            if not pa.types.is_dictionary(f.type):
                continue
            col = data.column(f.name)
            vals = (
                col.chunk(0).dictionary
                if col.num_chunks
                else pa.array([], type=f.type.value_type)
            )
            if f.metadata and b"aas_dict_id" in f.metadata:
                did = int(f.metadata[b"aas_dict_id"].decode())
            else:
                key = (str(vals.type), tuple(vals.to_pylist()))
                if key in by_content:
                    did = by_content[key]
                else:
                    did = next_id
                    next_id += 1
                    by_content[key] = did
            dict_ids[f.name] = did
            dict_values.setdefault(did, vals)

    doc = {
        "schema": {"fields": [_field_json(f, dict_ids) for f in data.schema]},
    }
    if dict_values:
        doc["dictionaries"] = [
            {
                "id": did,
                "data": {
                    "count": len(vals),
                    "columns": [_column_json(vals, f"DICT{did}")],
                },
            }
            for did, vals in sorted(dict_values.items())
        ]
    doc["batches"] = [
        {
            "count": batch.num_rows,
            "columns": [
                _column_json(batch.column(j), data.schema[j].name)
                for j in range(batch.num_columns)
            ],
        }
        for batch in data.to_batches()
    ]
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2)


def read_json_integration_arrow(path: str) -> pa.Table:
    """JSON-integration file -> pyarrow Table (no Spark session needed);
    the common core of read/VALIDATE and the writer fixpoint test."""
    with open(path) as fh:
        doc = json.load(fh)
    fields = [_field(f) for f in doc["schema"]["fields"]]
    schema = pa.schema(fields)
    # Resolve file-level dictionaries (id -> value array).  The dictionaries
    # entry itself carries no type; the value type comes from the first
    # schema field referencing each id (integration_test.py:667-684).
    dictionaries: dict[str, pa.Array] = {}
    if doc.get("dictionaries"):
        value_fields: dict[str, pa.Field] = {}
        for fld in fields:
            if pa.types.is_dictionary(fld.type):
                did = fld.metadata[b"aas_dict_id"].decode()
                value_fields.setdefault(
                    did, pa.field(fld.name, fld.type.value_type)
                )
        for entry in doc["dictionaries"]:
            did = str(entry["id"])
            col = entry["data"]["columns"][0]
            dictionaries[did] = _build_array(col, value_fields[did])
    batches = []
    for b in doc["batches"]:
        arrays = [
            _build_array(b["columns"][j], fields[j], dictionaries)
            for j in range(len(fields))
        ]
        batches.append(pa.RecordBatch.from_arrays(arrays, schema=schema))
    return pa.Table.from_batches(batches) if batches else schema.empty_table()


def read_json_integration(spark: SparkSession, path: str) -> DataFrame:
    """JSON-integration file -> Spark DataFrame (all batches concatenated),
    through the engine's arrow->spark type mapping (uint widening etc.)."""
    from apache_arrow_spark.io.pandas_bridge import from_arrow

    t = read_json_integration_arrow(path)
    # Spark has no dictionary type: decode to dense values (the engine's
    # documented dictionary->dense identity stance, compute/cast.py).
    if any(pa.types.is_dictionary(f.type) for f in t.schema):
        t = pa.table(
            {
                f.name: t.column(f.name).cast(f.type.value_type)
                if pa.types.is_dictionary(f.type)
                else t.column(f.name)
                for f in t.schema
            }
        )
    return from_arrow(spark, t)


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
