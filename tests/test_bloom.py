"""Bloom membership sketch: no false negatives, bounded false positives,
and the pruned incremental dedup is bit-identical to the exact path."""

import pyspark.sql.functions as F
import pytest

from apache_arrow_spark.functions.bloom import (
    BloomSketch,
    bloom_build,
    exact_dedup_bloom,
    optimal_params,
    with_might_contain,
)
from apache_arrow_spark.functions.dedup import exact_dedup_incremental


def test_no_false_negatives(spark):
    inserted = spark.range(0, 2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    sketch = bloom_build(inserted, "k", num_bits=1 << 16, num_hashes=5)
    probed = with_might_contain(inserted, "k", sketch, "maybe")
    assert probed.filter(~F.col("maybe")).count() == 0


def test_false_positive_rate_bounded(spark):
    inserted = spark.range(0, 2000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    absent = spark.range(100_000, 104_000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    sketch = bloom_build(inserted, "k", num_bits=1 << 16, num_hashes=5)
    fp = with_might_contain(absent, "k", sketch, "maybe").filter("maybe").count()
    # theoretical fpp at n=2000, m=65536, k=5 is ~0.1%; allow 10x slack
    assert fp / 4000 < 0.01
    assert sketch.estimated_fpp(2000) < 0.002


def test_empty_build_rejects_everything(spark):
    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))
    sketch = bloom_build(empty, "k", num_bits=1 << 10, num_hashes=3)
    assert sketch.bits == bytes(1 << 7)
    probe = spark.range(50).select(F.col("id").cast("string").alias("k"))
    assert (
        with_might_contain(probe, "k", sketch, "maybe").filter("maybe").count() == 0
    )


def test_optimal_params_shape():
    m, k = optimal_params(1_000_000, 0.01)
    assert m % 8 == 0
    assert 9_000_000 < m < 10_500_000  # ~9.6 bits per element at 1% fpp
    assert 6 <= k <= 8


def test_num_bits_must_be_byte_aligned(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=1001)


def test_bloom_dedup_matches_exact_path(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = d.filter(F.col("doc_id") % 3 == 0)
    incoming = d.filter(F.col("doc_id") % 3 != 0)
    exact = exact_dedup_incremental(incoming, seen, "text", "doc_id")
    pruned = exact_dedup_bloom(
        incoming, seen, "text", "doc_id", num_bits=1 << 16
    )
    a = sorted(r["doc_id"] for r in exact.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in pruned.select("doc_id").collect())
    assert a == b
    assert len(a) > 0


def test_bloom_dedup_correct_under_tiny_filter(spark, sf_dir):
    # a deliberately undersized filter saturates -> everything reads as
    # "maybe"; the verify join must still keep the result exact.
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = d.filter(F.col("doc_id") % 3 == 0)
    incoming = d.filter(F.col("doc_id") % 3 != 0)
    exact = exact_dedup_incremental(incoming, seen, "text", "doc_id")
    pruned = exact_dedup_bloom(incoming, seen, "text", "doc_id", num_bits=64)
    assert sorted(r["doc_id"] for r in exact.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in pruned.select("doc_id").collect()
    )


def test_sketch_merge_is_bitwise_or(spark):
    # partial bitsets OR associatively: building over the union equals
    # OR-ing builds over the parts (same partition-merge algebra the
    # build itself uses)
    import numpy as np

    a = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    b = spark.range(500, 1000).select(F.col("id").cast("string").alias("k"))
    both = a.unionByName(b)
    s_all = bloom_build(both, "k", num_bits=1 << 12, num_hashes=4)
    s_a = bloom_build(a, "k", num_bits=1 << 12, num_hashes=4)
    s_b = bloom_build(b, "k", num_bits=1 << 12, num_hashes=4)
    merged = (
        np.frombuffer(s_a.bits, dtype=np.uint8)
        | np.frombuffer(s_b.bits, dtype=np.uint8)
    ).tobytes()
    assert merged == s_all.bits
    s_m = BloomSketch(merged, s_all.num_bits, s_all.num_hashes)
    probed = with_might_contain(both, "k", s_m, "maybe")
    assert probed.filter(~F.col("maybe")).count() == 0


# ---------------------------------------------------------------------------
# Sharded filter (the 10^10-scale path: distributed sketch table, cogroup
# probe, no driver merge / monolithic broadcast)
# ---------------------------------------------------------------------------


def test_sharded_no_false_negatives(spark):
    from apache_arrow_spark.functions.bloom import (
        bloom_build_sharded,
        with_might_contain_sharded,
    )

    keys = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    sketch = bloom_build_sharded(keys, "k", shard_bits=3, num_bits_per_shard=1 << 12)
    probed = with_might_contain_sharded(
        keys, "k", sketch, shard_bits=3, num_bits_per_shard=1 << 12, out="maybe"
    )
    assert probed.filter(~F.col("maybe")).count() == 0  # Bloom invariant


def test_sharded_absent_shard_probes_false(spark):
    from apache_arrow_spark.functions.bloom import with_might_contain_sharded

    keys = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    empty_sketch = spark.createDataFrame([], "shard int, bits binary")
    probed = with_might_contain_sharded(
        keys, "k", empty_sketch, shard_bits=3, num_bits_per_shard=1 << 12, out="maybe"
    )
    assert probed.filter(F.col("maybe")).count() == 0


def test_sharded_sketch_covers_all_shards_once(spark):
    from apache_arrow_spark.functions.bloom import bloom_build_sharded

    keys = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    sketch = bloom_build_sharded(keys, "k", shard_bits=3, num_bits_per_shard=1 << 10)
    rows = sketch.collect()
    shards = [r["shard"] for r in rows]
    assert len(shards) == len(set(shards))  # one fully-merged row per shard
    assert set(shards) <= set(range(8))
    assert all(len(r["bits"]) == (1 << 10) // 8 for r in rows)


def test_sharded_vs_monolithic_dedup_equivalence(spark, sf_dir):
    """The sharded prune layer changes shape, never output: sharded,
    monolithic, and exact incremental dedup all agree."""
    from apache_arrow_spark.functions.dedup import exact_dedup_incremental

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = d.filter(F.col("doc_id") % 3 == 0)
    incoming = d.filter(F.col("doc_id") % 3 != 0)
    exact = sorted(
        r["doc_id"]
        for r in exact_dedup_incremental(incoming, seen, "text", "doc_id")
        .select("doc_id")
        .collect()
    )
    # tiny per-shard bitsets force false positives through the verify join
    sharded = sorted(
        r["doc_id"]
        for r in exact_dedup_bloom(
            incoming, seen, "text", "doc_id", num_bits=64, shard_bits=3
        )
        .select("doc_id")
        .collect()
    )
    mono = sorted(
        r["doc_id"]
        for r in exact_dedup_bloom(incoming, seen, "text", "doc_id", num_bits=512)
        .select("doc_id")
        .collect()
    )
    assert sharded == exact and mono == exact


def test_sharded_probe_ors_unioned_sketch_tables(spark):
    """A sketch table that is the UNION of two per-batch builds (two rows
    per shard) must probe with the OR of both — no false negatives."""
    from apache_arrow_spark.functions.bloom import (
        bloom_build_sharded,
        with_might_contain_sharded,
    )

    b1 = spark.range(0, 500).select(F.col("id").cast("string").alias("k"))
    b2 = spark.range(500, 1000).select(F.col("id").cast("string").alias("k"))
    sk = bloom_build_sharded(b1, "k", 3, 1 << 12).unionByName(
        bloom_build_sharded(b2, "k", 3, 1 << 12)
    )
    both = b1.unionByName(b2)
    probed = with_might_contain_sharded(both, "k", sk, 3, 1 << 12, out="maybe")
    assert probed.filter(~F.col("maybe")).count() == 0


def test_bloom_join_matches_plain_join(spark, sf_dir):
    from apache_arrow_spark.functions.bloom import bloom_join

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = o.filter(F.col("o_orderkey") % 17 == 0).select("o_orderkey")
    plain = li.join(dim, li["l_orderkey"] == dim["o_orderkey"]).count()
    # tiny bitset forces false positives through the join's own filter
    pruned = bloom_join(li, dim, "l_orderkey", "o_orderkey", num_bits=4096)
    assert pruned.count() == plain
