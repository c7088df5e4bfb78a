"""Bloom-filter membership sketches for 100 TB dedup-on-ingest.

The incremental-dedup anti-join (dedup.exact_dedup_incremental) shuffles
every incoming digest against the ingested-corpus digest table.  At crawl
scale the incoming batch is overwhelmingly NEW documents, so that shuffle
is almost entirely wasted motion.  A Bloom filter inverts the cost: a
fixed-size bitset summarizes the corpus digest set with no false
negatives, the incoming batch probes it map-side (broadcast bits, zero
shuffle), and only the tiny "maybe seen" slice — true duplicates plus an
``fpp``-bounded trickle of false positives — pays the exact anti-join.
The result is BIT-IDENTICAL to the exact path (the maybes are verified),
so the filter is a pure pruning layer, same contract as parquet row-group
statistics.

Mergeability (the property that makes it a sketch, functions/sketches.py's
HLL/GK discipline): per-partition bitsets OR together associatively, so
the build is one corpus scan with map-side-combined partial state — the
shuffle-free analog of ``bloom_filter_agg`` on the JVM (Spark SQL has the
expression but does not register it for external use; this module keeps
the same double-hashing design in numpy).  At 10^10 ingested docs a 1%
filter is ~12 GB — too big for one broadcast — so shard the digest space
by hash prefix and build one sketch per shard (each incoming partition
probes only its shard's bits); the per-shard math below is unchanged.

No reference analog (nearest machinery is the Unique hash kernel,
cpp/src/arrow/compute/kernels/hash.h:36); the hash discipline follows
util/hashing-style multiply-shift mixing (splitmix64 finalizer) with
Kirsch-Mitzenmacher double hashing — k positions from one 64-bit base
hash, standard public construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "BloomSketch",
    "bloom_build",
    "bloom_build_sharded",
    "with_might_contain",
    "with_might_contain_sharded",
    "exact_dedup_bloom",
    "bloom_join",
]


@dataclass(frozen=True)
class BloomSketch:
    """Immutable bitset summary of a key set: no false negatives,
    ``estimated_fpp``-bounded false positives."""

    bits: bytes  # packed bitset, bit i = bits[i >> 3] & (1 << (i & 7))
    num_bits: int
    num_hashes: int

    def estimated_fpp(self, n_items: int) -> float:
        """Classic (1 - e^{-kn/m})^k bound for ``n_items`` inserted keys."""
        k, m = self.num_hashes, self.num_bits
        return (1.0 - math.exp(-k * n_items / m)) ** k


def optimal_params(n_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, num_hashes) sized for ``n_items`` at target ``fpp``;
    num_bits is rounded up to a whole byte."""
    m = max(64, int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2))))
    m = (m + 7) & ~7
    k = max(1, round(m / max(1, n_items) * math.log(2)))
    return m, k


def _positions(h: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(num_hashes, n) bit positions via double hashing: pos_i =
    (h + i * h2) mod m with h2 an odd splitmix64 mix of h — k independent-
    enough probes from ONE base hash, so the JVM computes exactly one
    xxhash64 per key and Python does only integer mixing."""
    x = h.astype(np.uint64, copy=False)
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h2 = (z ^ (z >> np.uint64(31))) | np.uint64(1)
    m = np.uint64(num_bits)
    out = np.empty((num_hashes, x.shape[0]), dtype=np.uint64)
    acc = x.copy()
    for i in range(num_hashes):
        out[i] = acc % m
        acc = acc + h2
    return out


def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> BloomSketch:
    """One corpus scan -> BloomSketch.  Each partition accumulates a local
    bitset over the JVM-hashed key column and emits it as ONE binary row
    (fixed ``num_bits/8`` bytes, independent of partition size); the
    driver ORs the partial bitsets — a collect of numPartitions * m/8
    bytes, never keys.  This is the same partial-state shape as an HLL
    merge, just with OR instead of sketch-union."""
    nb, nh = int(num_bits), int(num_hashes)
    if nb % 8:
        raise ValueError("num_bits must be a multiple of 8")
    nbytes = nb // 8
    hashed = df.select(F.xxhash64(F.col(col)).alias("__h"))

    def partition_bits(batches):
        bits = np.zeros(nbytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
            pos = _positions(h, nb, nh).ravel()
            np.bitwise_or.at(
                bits,
                (pos >> np.uint64(3)).astype(np.int64),
                np.left_shift(
                    np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)
                ),
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    merged = np.zeros(nbytes, dtype=np.uint8)
    for row in hashed.mapInPandas(partition_bits, "bits binary").collect():
        merged |= np.frombuffer(row["bits"], dtype=np.uint8)
    return BloomSketch(merged.tobytes(), nb, nh)


def _shard_col(col: Column, shard_bits: int) -> Column:
    """Shard id = top ``shard_bits`` bits of the key's xxhash64 — the hash
    PREFIX, independent of the in-shard bit positions (which mix the full
    hash), so sharding never correlates with probe positions."""
    return F.shiftrightunsigned(F.xxhash64(col), 64 - shard_bits).cast("int")


def bloom_build_sharded(
    df: DataFrame,
    col: str,
    shard_bits: int = 4,
    num_bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """The 10^10-scale build (SCALE.md "Bloom-pruned dedup"): shard the
    digest space by hash prefix into ``2**shard_bits`` independent bitsets
    and return them as a DISTRIBUTED DataFrame (shard int, bits binary) —
    no driver merge, no monolithic broadcast, total filter size bounded
    only by cluster memory.  One corpus scan: digests repartition by shard
    id (each shard lands wholly in one task), each task emits its shards'
    fully-built bitsets.  Persist the result as parquet to amortize across
    ingest batches; a shard with no keys emits no row (probed as empty).
    Per-shard math is identical to :func:`bloom_build`."""
    nb, nh = int(num_bits_per_shard), int(num_hashes)
    if nb % 8:
        raise ValueError("num_bits_per_shard must be a multiple of 8")
    nbytes = nb // 8
    num_shards = 1 << shard_bits
    hashed = df.select(
        F.xxhash64(F.col(col)).alias("__h"),
        _shard_col(F.col(col), shard_bits).alias("__s"),
    ).repartition(num_shards, "__s")

    def partition_bits(batches):
        shards: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            for s, grp in pdf.groupby("__s"):
                bits = shards.setdefault(int(s), np.zeros(nbytes, dtype=np.uint8))
                h = grp["__h"].to_numpy(dtype=np.int64).view(np.uint64)
                pos = _positions(h, nb, nh).ravel()
                np.bitwise_or.at(
                    bits,
                    (pos >> np.uint64(3)).astype(np.int64),
                    np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
                )
        if shards:
            yield pd.DataFrame(
                {
                    "shard": list(shards),
                    "bits": [b.tobytes() for b in shards.values()],
                }
            )

    return hashed.mapInPandas(partition_bits, "shard int, bits binary")


def with_might_contain_sharded(
    df: DataFrame,
    col: str,
    sketch_df: DataFrame,
    shard_bits: int = 4,
    num_bits_per_shard: int = 1 << 20,
    num_hashes: int = 5,
    out: str = "__maybe",
) -> DataFrame:
    """Probe a sharded sketch without ever assembling it in one place: the
    batch co-groups with the sketch table on shard id
    (``groupBy(shard).cogroup(...).applyInPandas``), so each shard's bits
    move to exactly the tasks holding that shard's rows — one shuffle of
    the batch keyed by shard, bits shipped once per shard, never
    row-multiplied through a join.  A shard absent from ``sketch_df``
    probes as all-False (nothing was ever inserted there)."""
    nb, nh = int(num_bits_per_shard), int(num_hashes)
    base_cols = df.columns
    b = df.withColumn("__h", F.xxhash64(F.col(col))).withColumn(
        "__s", _shard_col(F.col(col), shard_bits)
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in b.schema.fields
    ) + f", {out} boolean"

    def probe(key, batch_pdf: pd.DataFrame, sketch_pdf: pd.DataFrame) -> pd.DataFrame:
        res = batch_pdf.copy()
        if not len(sketch_pdf):
            res[out] = False
            return res
        # OR all rows for this shard: a sketch table may be the UNION of
        # per-batch builds (the amortization the build docstring invites);
        # reading only one row would turn the other rows' keys into false
        # NEGATIVES — the one failure mode a Bloom layer must never have.
        bits = np.zeros(nb // 8, dtype=np.uint8)
        for raw in sketch_pdf["bits"]:
            bits = bits | np.frombuffer(raw, dtype=np.uint8)
        hv = batch_pdf["__h"].to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(hv, nb, nh)
        ok = np.ones(hv.shape[0], dtype=bool)
        for i in range(nh):
            p = pos[i]
            byte = bits[(p >> np.uint64(3)).astype(np.int64)]
            ok &= (
                np.right_shift(byte, (p & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            ).astype(bool)
        res[out] = ok
        return res

    probed = (
        b.groupBy("__s")
        .cogroup(sketch_df.groupBy("shard"))
        .applyInPandas(probe, out_schema)
    )
    return probed.select(*base_cols, out)


def with_might_contain(
    df: DataFrame,
    col: str,
    sketch: BloomSketch,
    out: str = "__maybe",
) -> DataFrame:
    """Append boolean ``out``: False is definitive (the key was never
    inserted), True means "verify exactly".  The bitset ships to executors
    once via a Spark broadcast; the probe is a vectorized Arrow-batched
    pandas UDF over the JVM-computed xxhash64 — no per-row Python."""
    bc = df.sparkSession.sparkContext.broadcast(
        (sketch.bits, sketch.num_bits, sketch.num_hashes)
    )

    @F.pandas_udf("boolean")
    def _probe(h: pd.Series) -> pd.Series:
        bits_raw, nb, nh = bc.value
        bits = np.frombuffer(bits_raw, dtype=np.uint8)
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        pos = _positions(hv, nb, nh)
        ok = np.ones(hv.shape[0], dtype=bool)
        for i in range(nh):
            p = pos[i]
            byte = bits[(p >> np.uint64(3)).astype(np.int64)]
            ok &= (
                np.right_shift(byte, (p & np.uint64(7)).astype(np.uint8))
                & np.uint8(1)
            ).astype(bool)
        return pd.Series(ok)

    return df.withColumn(out, _probe(F.xxhash64(F.col(col))))


def exact_dedup_bloom(
    new_df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    shard_bits: int | None = None,
) -> DataFrame:
    """Bloom-pruned incremental exact dedup — bit-identical output to
    dedup.exact_dedup_incremental, with the corpus anti-join scoped to the
    "maybe seen" slice instead of the whole batch.

    Cost shape: one shuffle-free scan of ``seen`` digests (bitset build),
    one map-side probe of the batch, then the exact anti-join over only
    true-dups + ~fpp * batch false positives.  On a mostly-novel crawl
    batch that join shrinks ~100x; correctness never depends on fpp
    because every True is re-checked.

    ``shard_bits=None`` (default) uses the single broadcast bitset — right
    up to ~10^9 digests.  Setting ``shard_bits`` switches to the sharded
    build/probe (:func:`bloom_build_sharded`), which never materializes
    the filter in one place: ``num_bits`` then means bits PER SHARD and
    the output stays bit-identical (the prune layer only changes shape).
    """
    from apache_arrow_spark.functions.text import fingerprint

    if "__fp" in seen.columns:
        seen_fp = seen.select("__fp")
    else:
        seen_fp = seen.select(fingerprint(F.col(text_col)).alias("__fp"))

    with_fp = new_df.select(
        F.col(id_col).alias("__id"), fingerprint(F.col(text_col)).alias("__fp")
    )
    if shard_bits is not None:
        sketch_df = bloom_build_sharded(
            seen_fp, "__fp", shard_bits, num_bits, num_hashes
        )
        probed = with_might_contain_sharded(
            with_fp, "__fp", sketch_df, shard_bits, num_bits, num_hashes
        )
    else:
        sketch = bloom_build(seen_fp, "__fp", num_bits, num_hashes)
        probed = with_might_contain(with_fp, "__fp", sketch)
    definite_new = probed.filter(~F.col("__maybe")).drop("__maybe")
    maybes = (
        probed.filter(F.col("__maybe"))
        .drop("__maybe")
        .join(seen_fp.distinct(), on="__fp", how="left_anti")
    )
    fresh = definite_new.unionByName(maybes)
    winners = fresh.groupBy("__fp").agg(F.min("__id").alias("__id")).select("__id")
    return new_df.join(
        winners.withColumnRenamed("__id", id_col), on=id_col, how="left_semi"
    )


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom-pruned equi-join — the RUNTIME-FILTER pattern Spark applies
    to parquet row groups, made explicit for any join: build a bitset
    over the (small) dim side's keys, prune the fact side MAP-SIDE before
    its shuffle, then run the normal join.  Output is row-identical to
    ``fact.join(dim, ...)`` (false positives are eliminated by the join
    itself; false negatives cannot occur), but the fact shuffle carries
    only rows whose key might match — on a selective dim this cuts the
    dominant shuffle by orders of magnitude.  At 10^10+ dim keys switch
    the build/probe to the sharded pair (:func:`bloom_build_sharded`).
    """
    sketch = bloom_build(dim.select(dim_key), dim_key, num_bits, num_hashes)
    pruned = (
        with_might_contain(fact, fact_key, sketch, "__maybe")
        .filter(F.col("__maybe"))
        .drop("__maybe")
    )
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])
