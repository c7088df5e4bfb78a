"""Testdata schema contract.

The round driver REGENERATES /root/testdata between rounds and has already
changed column types once (events.ts: int64-nanos -> timestamp[us], round
1 -> round 2).  The engine adapts at the scan edge
(`session.normalize_engine_schema`); this test pins what the engine
expects AFTER normalization so any future drift fails loudly here instead
of surfacing as dozens of opaque AnalysisExceptions in the query suite.

If this test fails after a testdata regeneration: extend
``normalize_engine_schema`` (keep the canonical model stable), don't patch
individual queries.
"""

import pyspark.sql.types as T

from apache_arrow_spark.session import TABLE_NAMES, load_table

# column -> canonical engine-facing type (post-normalization), per table.
# Only the columns queries depend on are pinned; new driver-added columns
# are allowed.
EXPECTED = {
    "events": {
        "event_id": T.LongType(),
        "ts": T.LongType(),  # canonical: epoch NANOSECONDS
        "user_id": T.LongType(),
        "event_type": T.StringType(),
        "value": T.DoubleType(),
        "props": T.StringType(),
    },
    "documents": {
        "doc_id": T.LongType(),
        "text": T.StringType(),
        "lang": T.StringType(),
        "source": T.StringType(),
    },
    "embeddings": {
        "vec_id": T.LongType(),
        "embedding": T.ArrayType(T.FloatType()),
        "label": T.IntegerType(),
    },
    "lineitem": {
        "l_orderkey": T.LongType(),
        "l_quantity": T.DoubleType(),
        "l_extendedprice": T.DoubleType(),
        "l_discount": T.DoubleType(),
        "l_shipdate": T.TimestampNTZType(),
        "l_returnflag": T.StringType(),
    },
    "orders": {
        "o_orderkey": T.LongType(),
        "o_custkey": T.LongType(),
        "o_orderdate": T.TimestampNTZType(),
        "o_totalprice": T.DoubleType(),
    },
}


def test_engine_facing_schemas(spark, sf_dir):
    problems = []
    for table, cols in EXPECTED.items():
        schema = {f.name: f.dataType for f in load_table(spark, sf_dir, table).schema}
        for col, want in cols.items():
            got = schema.get(col)
            if got != want:
                problems.append(f"{table}.{col}: expected {want}, got {got}")
    assert not problems, (
        "testdata drifted from the engine's canonical model — extend "
        "session.normalize_engine_schema: " + "; ".join(problems)
    )


def test_all_tables_load(spark, sf_dir):
    for t in TABLE_NAMES:
        assert load_table(spark, sf_dir, t).limit(1).count() >= 0, t


def test_table_digest_tracks_file_changes(tmp_path):
    """The fixture-cache digest (q159 layout, q291 row-group file) must
    move whenever a backing file is rewritten — regardless of which
    column changed — and stay put otherwise."""
    import os
    import time

    from apache_arrow_spark.session import table_digest

    # table_digest only stats files, so any bytes work — no dependency on
    # a real testdata location
    (tmp_path / "nation.parquet").write_bytes(b"not-really-parquet")
    d1 = table_digest(str(tmp_path), "nation")
    assert d1 == table_digest(str(tmp_path), "nation")  # stable
    time.sleep(0.01)
    os.utime(tmp_path / "nation.parquet")  # a rewrite always moves mtime
    assert table_digest(str(tmp_path), "nation") != d1
    assert table_digest(str(tmp_path), "missing") != d1  # absence keys too
    # in-place rewrite, same size + FROZEN mtime/inode (the coarse-mtime
    # filesystem hazard, ADVICE r6): the footer-tail sample must move
    st = os.stat(tmp_path / "nation.parquet")
    (tmp_path / "nation.parquet").write_bytes(b"not-really-parqueX")
    os.utime(tmp_path / "nation.parquet", ns=(st.st_atime_ns, st.st_mtime_ns))
    d3 = table_digest(str(tmp_path), "nation")
    assert d3 != d1
