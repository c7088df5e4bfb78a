"""JSON integration format reader vs the reference's own golden files
(/root/reference/integration/data/*.json — read-only inputs)."""

import os

import pytest

from apache_arrow_spark.io.json_integration import (
    read_json_integration,
    read_json_integration_arrow,
    validate_json_integration,
    write_json_integration,
)

SIMPLE = "/root/reference/integration/data/simple.json"
STRUCT = "/root/reference/integration/data/struct_example.json"


@pytest.mark.skipif(not os.path.exists(SIMPLE), reason="reference goldens absent")
def test_simple_golden(spark):
    df = read_json_integration(spark, SIMPLE)
    assert df.schema.simpleString() == "struct<foo:int,bar:double,baz:string>"
    rows = df.collect()
    assert len(rows) == 15  # three batches of 5
    assert rows[0]["foo"] == 1 and rows[1]["foo"] is None
    assert rows[0]["baz"] == "aa"


@pytest.mark.skipif(not os.path.exists(SIMPLE), reason="reference goldens absent")
def test_validate_mode(spark):
    v = validate_json_integration(spark, SIMPLE)
    assert v["rows"] == 15 and v["columns"] == 3
    assert v["null_counts"]["foo"] >= 1


@pytest.mark.skipif(not os.path.exists(STRUCT), reason="reference goldens absent")
def test_struct_golden(spark):
    df = read_json_integration(spark, STRUCT)
    assert "struct" in df.schema.simpleString()
    assert df.count() > 0


def test_roundtrip_generated(spark, tmp_path):
    """Generate a type-diverse file (FIXTURES A1-ish) and read it back."""
    import json

    doc = {
        "schema": {
            "fields": [
                {"name": "i8", "type": {"name": "int", "isSigned": True, "bitWidth": 8}, "nullable": True, "children": []},
                {"name": "u32", "type": {"name": "int", "isSigned": False, "bitWidth": 32}, "nullable": True, "children": []},
                {"name": "f", "type": {"name": "floatingpoint", "precision": "DOUBLE"}, "nullable": True, "children": []},
                {"name": "b", "type": {"name": "bool"}, "nullable": True, "children": []},
                {"name": "s", "type": {"name": "utf8"}, "nullable": True, "children": []},
                {
                    "name": "l",
                    "type": {"name": "list"},
                    "nullable": True,
                    "children": [
                        {"name": "item", "type": {"name": "int", "isSigned": True, "bitWidth": 32}, "nullable": True, "children": []}
                    ],
                },
            ]
        },
        "batches": [
            {
                "count": 3,
                "columns": [
                    {"name": "i8", "count": 3, "VALIDITY": [1, 0, 1], "DATA": [-5, 0, 7]},
                    {"name": "u32", "count": 3, "VALIDITY": [1, 1, 1], "DATA": [0, 4000000000, 17]},
                    {"name": "f", "count": 3, "VALIDITY": [1, 1, 0], "DATA": [1.5, -2.25, 0]},
                    {"name": "b", "count": 3, "VALIDITY": [1, 1, 1], "DATA": [True, False, True]},
                    {"name": "s", "count": 3, "VALIDITY": [1, 1, 1], "OFFSET": [0, 1, 3, 6], "DATA": ["x", "yy", "zzz"]},
                    {
                        "name": "l",
                        "count": 3,
                        "VALIDITY": [1, 0, 1],
                        "OFFSET": [0, 2, 2, 5],
                        "children": [
                            {"name": "item", "count": 5, "VALIDITY": [1, 1, 1, 1, 1], "DATA": [1, 2, 3, 4, 5]}
                        ],
                    },
                ],
            }
        ],
    }
    p = str(tmp_path / "gen.json")
    with open(p, "w") as fh:
        json.dump(doc, fh)
    df = read_json_integration(spark, p)
    # uint32 widens to bigint (SURVEY §1.2)
    assert df.schema["u32"].dataType.simpleString() == "bigint"
    rows = df.orderBy("s").collect()
    assert rows[0]["l"] == [1, 2]
    got = {r["u32"] for r in rows}
    assert 4000000000 in got


# ---------------------------------------------------------------------------
# Writer (ARROW_TO_JSON) fixpoint: read golden -> write -> read -> write;
# the two reads must be equal tables and the two writes identical bytes
# (json-integration-test.cc:193-224 bidirectional harness).
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.exists(SIMPLE), reason="reference goldens absent")
@pytest.mark.parametrize("golden", [SIMPLE, STRUCT], ids=["simple", "struct"])
def test_writer_fixpoint_goldens(tmp_path, golden):
    t1 = read_json_integration_arrow(golden)
    p1 = str(tmp_path / "w1.json")
    write_json_integration(t1, p1)
    t2 = read_json_integration_arrow(p1)
    assert t2.schema == t1.schema
    assert t2.combine_chunks().equals(t1.combine_chunks())
    p2 = str(tmp_path / "w2.json")
    write_json_integration(t2, p2)
    with open(p1, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()  # byte fixpoint of the canonical form


def test_writer_wide_types(tmp_path):
    """Writer covers the harness's full type families: 64-bit ints as
    strings, decimals as unscaled strings, binary as upper-hex, temporal."""
    import datetime
    from decimal import Decimal

    import pyarrow as pa

    t = pa.table(
        {
            "i64": pa.array([2**40, None, -(2**40)], pa.int64()),
            "u64": pa.array([2**63, 1, None], pa.uint64()),
            "dec": pa.array([Decimal("12.34"), None, Decimal("-0.01")], pa.decimal128(10, 2)),
            "bin": pa.array([b"\x00\xff", None, b"ok"], pa.binary()),
            "fsb": pa.array([b"abcd", None, b"wxyz"], pa.binary(4)),
            "d32": pa.array([datetime.date(2020, 1, 1), None, datetime.date(1969, 12, 31)]),
            "ts": pa.array(
                [datetime.datetime(2021, 5, 4, 3, 2, 1), None, datetime.datetime(1970, 1, 1)],
                pa.timestamp("us"),
            ),
            "t64": pa.array([1, None, 86399999999], pa.time64("us")),
        }
    )
    p = str(tmp_path / "wide.json")
    write_json_integration(t, p)
    back = read_json_integration_arrow(p)
    assert back.schema == t.schema
    assert back.combine_chunks().equals(t.combine_chunks())
    # spec spot-checks on the raw JSON
    import json as _json

    with open(p) as fh:
        doc = _json.load(fh)
    cols = {c["name"]: c for c in doc["batches"][0]["columns"]}
    assert cols["i64"]["DATA"][0] == str(2**40)  # 64-bit quoted
    assert cols["dec"]["DATA"][0] == "1234"  # unscaled integer string
    assert cols["bin"]["DATA"][0] == "00FF"  # upper-hex
    assert cols["u64"]["DATA"][0] == str(2**63)


def test_writer_from_spark_dataframe(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, None)], "k int, v string")
    p = str(tmp_path / "sdf.json")
    write_json_integration(df, p)
    back = read_json_integration(spark, p)
    assert back.schema == df.schema
    assert sorted(r["k"] for r in back.collect()) == [1, 2]


# ---------------------------------------------------------------------------
# Dictionary batches (generate_dictionary_case, integration_test.py:874):
# shared string dictionary referenced by two fields at different index
# widths + an int64 dictionary, two batches, read -> write -> read fixpoint.
# ---------------------------------------------------------------------------


def _dictionary_golden_doc():
    import random

    rng = random.Random(7)
    dict1_vals = [f"str{i}" for i in range(10)]  # utf8 dictionary, id 0
    dict2_vals = [rng.randrange(-(2**40), 2**40) for _ in range(50)]  # int64, id 1

    def idx_col(name, n, card, seed):
        r = random.Random(seed)
        validity = [1 if r.random() > 0.2 else 0 for _ in range(n)]
        return {
            "name": name,
            "count": n,
            "VALIDITY": validity,
            "DATA": [r.randrange(card) for _ in range(n)],
        }

    def dict_field(name, bits, did, vtype):
        return {
            "name": name,
            "type": vtype,
            "nullable": True,
            "children": [],
            "dictionary": {
                "id": did,
                "indexType": {"name": "int", "isSigned": True, "bitWidth": bits},
                "isOrdered": False,
            },
        }

    utf8 = {"name": "utf8"}
    i64 = {"name": "int", "isSigned": True, "bitWidth": 64}
    str_off = [0]
    for v in dict1_vals:
        str_off.append(str_off[-1] + len(v))
    return {
        "schema": {
            "fields": [
                dict_field("dict1_0", 8, 0, utf8),
                dict_field("dict1_1", 32, 0, utf8),
                dict_field("dict2_0", 16, 1, i64),
            ]
        },
        "dictionaries": [
            {
                "id": 0,
                "data": {
                    "count": 10,
                    "columns": [
                        {
                            "name": "DICT0",
                            "count": 10,
                            "VALIDITY": [1] * 10,
                            "OFFSET": str_off,
                            "DATA": dict1_vals,
                        }
                    ],
                },
            },
            {
                "id": 1,
                "data": {
                    "count": 50,
                    "columns": [
                        {
                            "name": "DICT1",
                            "count": 50,
                            "VALIDITY": [1] * 50,
                            "DATA": [str(v) for v in dict2_vals],
                        }
                    ],
                },
            },
        ],
        "batches": [
            {
                "count": n,
                "columns": [
                    idx_col("dict1_0", n, 10, seed),
                    idx_col("dict1_1", n, 10, seed + 1),
                    idx_col("dict2_0", n, 50, seed + 2),
                ],
            }
            for n, seed in ((7, 11), (10, 13))
        ],
    }, dict1_vals, dict2_vals


def test_dictionary_case_read(tmp_path):
    import json

    import pyarrow as pa

    doc, dict1_vals, dict2_vals = _dictionary_golden_doc()
    p = str(tmp_path / "dict.json")
    with open(p, "w") as fh:
        json.dump(doc, fh)
    t = read_json_integration_arrow(p)
    assert pa.types.is_dictionary(t.schema[0].type)
    assert t.schema[0].type.index_type == pa.int8()
    assert t.schema[1].type.index_type == pa.int32()
    assert t.schema[2].type.value_type == pa.int64()
    assert t.num_rows == 17
    # decoded values land inside the dictionary domains
    dense0 = set(t.column("dict1_0").cast(pa.string()).to_pylist()) - {None}
    assert dense0 <= set(dict1_vals) and len(dense0) > 0
    dense2 = set(t.column("dict2_0").cast(pa.int64()).to_pylist()) - {None}
    assert dense2 <= set(dict2_vals) and len(dense2) > 0


def test_dictionary_case_writer_fixpoint(tmp_path):
    import json

    doc, _, _ = _dictionary_golden_doc()
    p0 = str(tmp_path / "dict.json")
    with open(p0, "w") as fh:
        json.dump(doc, fh)
    t1 = read_json_integration_arrow(p0)
    p1 = str(tmp_path / "w1.json")
    write_json_integration(t1, p1)
    with open(p1) as fh:
        emitted = json.load(fh)
    # shared string dictionary keeps ONE id across both referencing fields
    assert len(emitted["dictionaries"]) == 2
    assert (
        emitted["schema"]["fields"][0]["dictionary"]["id"]
        == emitted["schema"]["fields"][1]["dictionary"]["id"]
    )
    t2 = read_json_integration_arrow(p1)
    assert t2.schema == t1.schema
    assert t2.combine_chunks().equals(t1.combine_chunks())
    p2 = str(tmp_path / "w2.json")
    write_json_integration(t2, p2)
    with open(p1, "rb") as a, open(p2, "rb") as b:
        assert a.read() == b.read()


def test_dictionary_case_fresh_table_ids(tmp_path):
    """A table built directly in pyarrow (no metadata ids) gets
    deterministic first-appearance ids with content dedupe."""
    import json

    import pyarrow as pa

    d = pa.array(["a", "b", "c"])
    arr1 = pa.DictionaryArray.from_arrays(pa.array([0, 2, None, 1], pa.int8()), d)
    arr2 = pa.DictionaryArray.from_arrays(pa.array([2, 2, 0, None], pa.int32()), d)
    t = pa.table({"x": arr1, "y": arr2})
    p = str(tmp_path / "fresh.json")
    write_json_integration(t, p)
    with open(p) as fh:
        doc = json.load(fh)
    assert [e["id"] for e in doc["dictionaries"]] == [0]
    back = read_json_integration_arrow(p)
    assert back.column("x").cast(pa.string()).to_pylist() == ["a", "c", None, "b"]
    assert back.column("y").cast(pa.string()).to_pylist() == ["c", "c", "a", None]


def test_dictionary_spark_read(spark, tmp_path):
    import json

    doc, dict1_vals, _ = _dictionary_golden_doc()
    p = str(tmp_path / "dict.json")
    with open(p, "w") as fh:
        json.dump(doc, fh)
    df = read_json_integration(spark, p)
    assert df.schema["dict1_0"].dataType.simpleString() == "string"
    assert df.schema["dict2_0"].dataType.simpleString() == "bigint"
    assert df.count() == 17
    got = {r["dict1_0"] for r in df.collect()} - {None}
    assert got <= set(dict1_vals)
