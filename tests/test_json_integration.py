"""JSON integration format reader vs the reference's own golden files
(/root/reference/integration/data/*.json — read-only inputs)."""

import os

import pytest

from apache_arrow_spark.io.json_integration import (
    read_json_integration,
    validate_json_integration,
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
