"""Round-2 operators: batch sessionization, merge-upsert, Z-order layout,
dimension stats."""

from __future__ import annotations

import glob
import math

import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.similarity import dimension_stats
from apache_arrow_spark.functions.zorder import (
    normalize_to_bits,
    read_zordered,
    write_zordered,
    zvalue,
)
from apache_arrow_spark.operators.sessionize import session_summary, sessionize
from apache_arrow_spark.operators.upsert import merge_upsert


def test_sessionize_gap_splits(spark):
    # user 1: events at t=0, 10, 200, 210 with gap 50 -> sessions {0,10}, {200,210}
    rows = [(1, 0, 100), (1, 10, 101), (1, 200, 102), (1, 210, 103), (2, 5, 104)]
    df = spark.createDataFrame(rows, "u bigint, t bigint, eid bigint")
    out = sessionize(df, "u", "t", 50, ["eid"]).orderBy("u", "t").collect()
    assert [(r.u, r.t, r.session_seq) for r in out] == [
        (1, 0, 1),
        (1, 10, 1),
        (1, 200, 2),
        (1, 210, 2),
        (2, 5, 1),
    ]


def test_sessionize_boundary_gap_not_split(spark):
    # gap exactly equal does NOT start a new session (strictly greater)
    df = spark.createDataFrame([(1, 0, 1), (1, 50, 2)], "u bigint, t bigint, eid bigint")
    out = sessionize(df, "u", "t", 50, ["eid"]).collect()
    assert {r.session_seq for r in out} == {1}


def test_session_summary(spark):
    rows = [(1, 0, 100), (1, 10, 101), (1, 200, 102)]
    df = spark.createDataFrame(rows, "u bigint, t bigint, eid bigint")
    out = {
        (r.u, r.session_seq): (r.n_events, r.start, r.end)
        for r in session_summary(df, "u", "t", 50, ["eid"]).collect()
    }
    assert out == {(1, 1): (2, 0, 10), (1, 2): (1, 200, 200)}


def test_merge_upsert_updates_win(spark):
    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b")], "k bigint, v bigint, payload string"
    )
    updates = spark.createDataFrame([(1, 20, "a2")], "k bigint, v bigint, payload string")
    out = {r.k: r.payload for r in merge_upsert(base, updates, ["k"], ["v"]).collect()}
    assert out == {1: "a2", 2: "b"}


def test_merge_upsert_tie_prefers_update(spark):
    base = spark.createDataFrame([(1, 10, "old")], "k bigint, v bigint, payload string")
    updates = spark.createDataFrame([(1, 10, "new")], "k bigint, v bigint, payload string")
    out = merge_upsert(base, updates, ["k"], ["v"]).collect()
    assert out[0].payload == "new"


def test_merge_upsert_delete_tombstone(spark):
    base = spark.createDataFrame(
        [(1, 10, False), (2, 10, False)], "k bigint, v bigint, deleted boolean"
    )
    updates = spark.createDataFrame([(1, 20, True)], "k bigint, v bigint, deleted boolean")
    out = merge_upsert(
        base, updates, ["k"], ["v"], delete_predicate=F.col("deleted")
    ).collect()
    assert [r.k for r in out] == [2]


def test_zvalue_interleaves_bits(spark):
    # x=0b11, y=0b01, 2 bits -> z bits: pos0=x0=1, pos1=y0=1, pos2=x1=1, pos3=y1=0 -> 0b0111
    df = spark.createDataFrame([(3, 1)], "x bigint, y bigint")
    z = df.select(zvalue([F.col("x"), F.col("y")], bits=2).alias("z")).first().z
    assert z == 0b0111


def test_normalize_to_bits_bounds(spark):
    df = spark.createDataFrame([(0,), (50,), (100,), (200,), (-5,)], "x bigint")
    vals = [
        r.b for r in df.select(normalize_to_bits(F.col("x"), 0, 100, 4).alias("b")).collect()
    ]
    assert vals[0] == 0 and vals[2] == 15  # lo -> 0, hi -> top bucket
    assert vals[3] == 15 and vals[4] == 0  # out-of-range clamps
    assert 0 < vals[1] < 15


def test_zorder_roundtrip_and_tiling(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    lo, hi, dlo, dhi = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min(day), F.max(day)
    ).first()
    z = zvalue(
        [normalize_to_bits(F.col("o_custkey"), lo, hi, 16), normalize_to_bits(day, dlo, dhi, 16)],
        16,
    )
    path = str(tmp_path / "zo")
    write_zordered(o, path, z, num_files=8)
    back = read_zordered(spark, path)
    # content-preserving
    assert back.count() == o.count()
    assert back.agg(F.sum("o_orderkey")).first()[0] == o.agg(F.sum("o_orderkey")).first()[0]
    # tiling: each non-trivial file's custkey span is a fraction of the
    # domain (a custkey-oblivious layout would give every file ~full span)
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["o_custkey"])
        if t.num_rows < 50:
            continue
        col = t.column("o_custkey").to_pylist()
        spans.append((max(col) - min(col)) / max(hi - lo, 1))
    assert spans and sorted(spans)[len(spans) // 2] < 0.75


def test_zorder_scan_prunes_files(spark, sf_dir, tmp_path):
    # a 2-D range predicate must NOT read every z-ordered file
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
    lo, hi, dlo, dhi = o.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min(day), F.max(day)
    ).first()
    z = zvalue(
        [normalize_to_bits(F.col("o_custkey"), lo, hi, 16), normalize_to_bits(day, dlo, dhi, 16)],
        16,
    )
    path = str(tmp_path / "zo2")
    write_zordered(o, path, z, num_files=8)
    back = read_zordered(spark, path)
    ck_hi = lo + (hi - lo) // 8
    q = back.filter((F.col("o_custkey") >= lo) & (F.col("o_custkey") <= ck_hi))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_custkey" in plan
    # correctness of the pruned scan
    expected = o.filter((F.col("o_custkey") >= lo) & (F.col("o_custkey") <= ck_hi)).count()
    assert q.count() == expected


def test_dimension_stats_matches_pandas(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.rand(40, 5).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = {r.dim: r for r in dimension_stats(df, "embedding").collect()}
    micro = np.floor(vecs.astype("float64") * 1e6)
    for d in range(5):
        m = micro[:, d]
        n = len(m)
        mean = m.sum() / n / 1e6
        var = (np.sum(m * m) - m.sum() ** 2 / n) / ((n - 1) * 1e12)
        assert out[d].n == n
        assert out[d].mean == pytest.approx(mean, abs=1e-6)
        assert out[d].std == pytest.approx(math.sqrt(max(var, 0.0)), abs=1e-6)


def test_scd2_intervals_contiguous_and_current(spark):
    from apache_arrow_spark.operators.scd import scd2_intervals

    rows = [
        (1, "2020-01-01", "a"),
        (1, "2020-03-01", "b"),
        (1, "2020-02-01", "c"),
        (2, "2021-01-01", "x"),
    ]
    df = spark.createDataFrame(rows, "k long, ts string, attr string")
    out = scd2_intervals(df, "k", ["ts"]).orderBy("k", "version").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [r["attr"] for r in k1] == ["a", "c", "b"]  # ordered by ts
    # intervals chain: each effective_to == next effective_from
    assert k1[0]["effective_to"] == k1[1]["effective_from"]
    assert k1[1]["effective_to"] == k1[2]["effective_from"]
    assert k1[2]["effective_to"] is None and k1[2]["is_current"]
    assert sum(1 for r in k1 if r["is_current"]) == 1
    k2 = [r for r in out if r["k"] == 2]
    assert len(k2) == 1 and k2[0]["is_current"] and k2[0]["version"] == 1
