"""Mergeable sketches for 100 TB cardinality work.

Exact COUNT(DISTINCT) is the classic scale killer: it shuffles every
distinct key.  A Datasketches HLL sketch is a few KB of mergeable state —
per-partition sketches combine associatively, so distinct-cardinality
becomes an ordinary partial aggregation (map-side combine, tiny shuffle),
and PRE-AGGREGATED sketches (per day, per source file) can be unioned later
to answer any coarser rollup without touching raw data — the same algebra
as operators/rollup.py, extended to the non-additive "distinct" metric.

The reference has nothing like this (its only cardinality machinery is the
exact Unique hash kernel, cpp/src/arrow/compute/kernels/hash.h:36); these
wrap Spark's built-in Datasketches HLL expressions (JVM-side, codegen'd).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 14,
) -> DataFrame:
    """Per-group HLL sketch of ``key_col``'s distinct set.  lgk=14 → ~16 KB
    max per sketch, relative error ~0.8%.  Output: *group_cols, sketch
    (binary) — a materializable, mergeable summary table."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), F.lit(lgk)).alias("sketch")
    )


def merge_distinct(
    sketches: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Union pre-aggregated sketches up to a coarser grouping and estimate.
    Output: *group_cols, approx_distinct (bigint)."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("approx_distinct")
    )


def distinct_within_tolerance(
    df: DataFrame,
    key_col: str,
    fine_cols: list[str],
    coarse_cols: list[str],
    rel_tol: float = 0.05,
    lgk: int = 14,
) -> DataFrame:
    """Sketch at a fine grouping, merge to a coarse one, and check the
    estimate against the exact distinct count computed independently.

    Returns *coarse_cols, exact_distinct, within_tol (boolean) — the form a
    correctness oracle can verify: the exact count must match and the
    estimate must sit inside ``rel_tol`` of it.  (At sf0.01 cardinalities
    are far below 2^lgk, where the HLL operates in exact mode, so
    within_tol is deterministically true — the tolerance is the contract
    for corpus scale.)
    """
    est = merge_distinct(distinct_sketches(df, key_col, fine_cols, lgk), coarse_cols)
    exact = df.groupBy(*coarse_cols).agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    err = F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
    return (
        exact.join(est, on=coarse_cols)
        .select(
            *coarse_cols,
            "exact_distinct",
            (err <= F.col("exact_distinct") * F.lit(rel_tol)).alias("within_tol"),
        )
    )


def _cms_positions(key: Column, width: int, depth: int) -> list[Column]:
    """``depth`` row positions from ONE md5 digest of the key: row d reads
    hex digits [1+8d, 8+8d] (32 bits, independent across rows).  DuckDB
    twin: ``('0x' || substr(md5(CAST(k AS VARCHAR)), 1+8*d, 8))::BIGINT %
    width``.  depth <= 4 (a 128-bit digest holds four 32-bit slices)."""
    assert depth <= 4, "md5 digest holds at most four 32-bit row hashes"
    h = F.md5(key.cast("string"))
    return [
        (F.conv(F.substring(h, 1 + 8 * d, 8), 16, 10).cast("bigint") % width)
        for d in range(depth)
    ]


def count_min_cells(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch as a mergeable cell table: (*group_cols, d, pos,
    cnt) with cnt = occurrences of keys hashing to ``pos`` under row
    ``d``'s hash.  At most ``depth * width`` rows per group regardless of
    stream size — the frequency analog of the HLL/GK sketches above:
    per-partition partial counts combine map-side, pre-aggregated cell
    tables for different slices merge by summing on (d, pos), and point
    frequency estimates never rescan raw data.

    The hash is an md5 digest computable VERBATIM in ANSI SQL, so
    estimates are oracle-checkable end to end (the importance.py /
    md5_hash60 discipline) — and the ``depth`` rows all slice ONE digest
    (row d reads hex digits [1+8d, 8+8d] = 32 independent bits), so the
    expensive md5 runs once per key occurrence, not ``depth`` times.
    """
    group_cols = group_cols or []
    cell = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), pos.alias("pos"))
                for d, pos in enumerate(_cms_positions(F.col(key_col), width, depth))
            ]
        )
    ).alias("__c")
    return (
        df.select(*group_cols, F.col(key_col))
        .select(*group_cols, cell)
        .groupBy(*group_cols, F.col("__c.d").alias("d"), F.col("__c.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def count_min_merge(
    cells: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union pre-aggregated cell tables to a coarser grouping: counters are
    additive, so the merge is a plain sum on (d, pos)."""
    group_cols = group_cols or []
    return cells.groupBy(*group_cols, "d", "pos").agg(
        F.sum("cnt").alias("cnt")
    )


def count_min_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (one row per distinct key):
    est = min over d of the key's cell counter (0 when the cell is empty).
    Classic CMS guarantee: est >= true count always; est <= true +
    eps * N with probability 1 - delta for width = e/eps, depth =
    ln(1/delta).  Output: key_col, est (bigint).

    Probes explode to ``depth`` rows per key and join cells on (d, pos) —
    with a materialized sketch this is a broadcast-scale join (the cell
    table is <= depth * width rows), so estimation cost is independent of
    the original stream size.
    """
    probe = F.explode(
        F.array(
            *[
                F.struct(F.lit(d).alias("d"), pos.alias("pos"))
                for d, pos in enumerate(_cms_positions(F.col(key_col), width, depth))
            ]
        )
    ).alias("__p")
    probes = keys.select(F.col(key_col)).distinct().select(key_col, probe).select(
        key_col, F.col("__p.d").alias("d"), F.col("__p.pos").alias("pos")
    )
    joined = probes.join(F.broadcast(cells.select("d", "pos", "cnt")), on=["d", "pos"], how="left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est")
    )


def quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate percentiles via Spark's mergeable quantile
    sketch (``approx_percentile``, Greenwald-Khanna).  Exact percentiles
    sort every group's values; the sketch is bounded partial state that
    combines map-side, so the shuffle carries sketch summaries instead of
    the value stream — the quantile analog of the HLL path above.
    Output: *group_cols, q0..qN (one column per requested percentile)."""
    aggs = [
        F.percentile_approx(F.col(value_col), F.lit(p), F.lit(accuracy)).alias(f"q{i}")
        for i, p in enumerate(percentiles)
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def quantiles_within_tolerance(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    percentiles: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Exact percentiles plus a sketch-vs-exact check, in the
    oracle-checkable form of :func:`distinct_within_tolerance`: the exact
    (interpolated) values pin the hash compare; the boolean pins the
    sketch's error contract.

    GK's guarantee is on RANK, not value (it returns an actual element
    whose rank is within n/accuracy of the target), so the check verifies
    that each sketch answer's rank window [count(<q), count(<=q)]
    intersects the target rank ± n/accuracy (+1 element of slack for the
    floor/ceil boundary) — one extra conditional aggregation over the
    data, no sort.
    """
    approx = quantile_sketches(df, value_col, group_cols, percentiles, accuracy)
    exact = df.groupBy(*group_cols).agg(
        *[
            F.percentile(F.col(value_col), F.lit(p)).alias(f"e{i}")
            for i, p in enumerate(percentiles)
        ]
    )
    # rank of each sketch answer, via conditional counts against the
    # (broadcast, one-row-per-group) sketch table
    j = df.join(F.broadcast(approx), on=group_cols)
    rank_aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(len(percentiles)):
        v = F.col(value_col)
        rank_aggs.append(F.sum((v < F.col(f"q{i}")).cast("long")).alias(f"lt{i}"))
        rank_aggs.append(F.sum((v <= F.col(f"q{i}")).cast("long")).alias(f"le{i}"))
    ranks = j.groupBy(*group_cols).agg(*rank_aggs)
    ok = F.lit(True)
    for i, p in enumerate(percentiles):
        target = F.lit(p) * F.col("n")
        slack = F.col("n") / F.lit(float(accuracy)) + F.lit(1.0)
        ok = ok & (F.col(f"lt{i}") <= target + slack) & (
            F.col(f"le{i}") >= target - slack
        )
    return (
        exact.join(ranks, on=group_cols)
        .select(
            *group_cols,
            *[
                F.round(F.col(f"e{i}"), 6).alias(f"p{int(p * 100)}")
                for i, p in enumerate(percentiles)
            ],
            ok.alias("within_tol"),
        )
    )


def intersection_estimate(
    df: DataFrame,
    key_col: str,
    tag_col: str,
    tag_a: str,
    tag_b: str,
    lgk: int = 14,
) -> DataFrame:
    """Estimated |A ∩ B| of two keyed sets via HLL inclusion-exclusion:
    est(A) + est(B) - est(A ∪ B), where A/B are the distinct ``key_col``
    values carrying ``tag_a``/``tag_b`` in ``tag_col`` (audience-overlap /
    cohort-intersection, the sketch-algebra question HLL alone can't
    answer directly).  One pass builds both tag sketches; the union is a
    sketch merge — no re-scan, no exact distinct shuffle.  Exactness
    contract mirrors distinct_within_tolerance: below 2^lgk cardinality
    the sketches are exact, so the estimate equals the true intersection;
    at corpus scale the error is bounded by ~3x the per-sketch error
    (inclusion-exclusion compounds).  Returns one row:
    (exact_intersection, within_tol)."""
    tagged = df.filter(F.col(tag_col).isin([tag_a, tag_b])).select(
        F.col(key_col).alias("k"), F.col(tag_col).alias("t")
    )
    sk = tagged.groupBy("t").agg(
        F.hll_sketch_agg(F.col("k"), F.lit(lgk)).alias("sketch")
    )
    # coalesce: aggregates over ZERO sketch rows (neither tag present) are
    # NULL — an empty input must report est 0, not poison within_tol
    est = sk.agg(
        F.coalesce(
            F.sum(F.hll_sketch_estimate(F.col("sketch"))), F.lit(0.0)
        ).alias("sum_each"),
        F.coalesce(
            F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))), F.lit(0)
        ).alias("est_union"),
    ).select((F.col("sum_each") - F.col("est_union")).alias("est_inter"))
    a = tagged.filter(F.col("t") == tag_a).select("k")
    b = tagged.filter(F.col("t") == tag_b).select("k")
    exact = (
        a.intersect(b)
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    # the inclusion-exclusion error scales with the UNION (each sketch's
    # ~0.8% relative error applies to its own ~union-sized operand), so
    # the tolerance must be union-relative — an intersection-relative
    # tolerance would flag correct estimates whenever the overlap is a
    # small fraction of two large sets
    exact_u = (
        a.unionByName(b).distinct().agg(F.count(F.lit(1)).alias("exact_union"))
    )
    return exact.crossJoin(est).crossJoin(exact_u).select(
        "exact_intersection",
        (
            F.abs(F.col("est_inter") - F.col("exact_intersection"))
            <= F.greatest(F.col("exact_union") * F.lit(0.05), F.lit(1.0))
        ).alias("within_tol"),
    )


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    mg_capacity: int = 64,
    n_shards: int = 32,
) -> DataFrame:
    """EXACT top-k heavy hitters via a Misra-Gries candidate pass — the
    two-pass recipe for key spaces too large to aggregate exactly in one
    shot: shard BY KEY (each key's whole mass lands in one shard), run a
    capacity-bounded Misra-Gries summary per shard inside one
    applyInPandas pass (candidates only — MG never reports exact
    counts), then count and rank ONLY the candidate keys exactly.

    Completeness: MG guarantees any key with shard frequency >
    shard_rows / capacity survives its shard's summary; key-sharding
    makes shard frequency == global frequency, so every key whose count
    clears every shard's bound is a candidate.  The function ASSERTS the
    k-th result clears the largest shard bound and raises otherwise
    (fail loud, never silently wrong) — at real scale you size
    ``mg_capacity`` ~10x k and the bound is loose.

    Returns (rnk, key_col, n) — identical to the exact one-pass top-k,
    which is what the oracle computes; the sketch is pure pruning, the
    bloom/q99 contract."""
    import pandas as pd

    from apache_arrow_spark.functions.pipeline import hash_bucket

    # persisted: the shard stream feeds the MG pass, the exact verify,
    # the non-empty probe, and the bound check — without the cache the
    # "two-pass" algorithm would re-scan the source four times
    sharded = df.select(
        F.col(key_col).alias("key"),
        (hash_bucket(F.col(key_col), "mgshard") % n_shards).alias("shard"),
    ).persist()

    def mg(pdf: pd.DataFrame) -> pd.DataFrame:
        counters: dict = {}
        for key in pdf["key"]:
            if key in counters:
                counters[key] += 1
            elif len(counters) < mg_capacity:
                counters[key] = 1
            else:
                dead = [c for c in counters if counters[c] == 1]
                for c in counters:
                    counters[c] -= 1
                for c in dead:
                    del counters[c]
        return pd.DataFrame(
            {"key": list(counters), "shard_rows": len(pdf)}
        )

    # the candidate schema carries the caller's key type — hardcoding
    # bigint here would break string (or any non-integer) keys at runtime
    from pyspark.sql.types import LongType, StructField, StructType

    cand_schema = StructType(
        [
            StructField("key", df.schema[key_col].dataType),
            StructField("shard_rows", LongType()),
        ]
    )
    cand = sharded.groupBy("shard").applyInPandas(mg, cand_schema)
    cand_keys = cand.select("key").distinct()
    exact = (
        sharded.join(F.broadcast(cand_keys), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as _W

    w = _W.orderBy(F.col("n").desc(), F.col("key").asc())
    top = (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("rnk").cast("int"), F.col("key").alias(key_col),
                F.col("n").cast("bigint"))
    )
    # fail-loud completeness check (conservative): on non-empty input the
    # k-th count must STRICTLY clear the loosest shard bound
    # (shard_rows / capacity) — below it, a non-candidate key could
    # outrank the result.  Near-uniform data can even churn MG to an
    # empty candidate set; that's the same failure, not an empty corpus.
    rows = top.collect()
    if sharded.take(1):
        max_bound = (
            cand.agg(F.max("shard_rows").alias("m")).first()["m"] or 0
        ) / mg_capacity
        kth = min((r["n"] for r in rows), default=0)
        if not rows or kth <= max_bound:
            sharded.unpersist()
            raise ValueError(
                f"MG capacity too small for exact top-{k}: kth count {kth} "
                f"<= shard bound {max_bound}; raise mg_capacity"
            )
    sharded.unpersist()
    return df.sparkSession.createDataFrame(rows, top.schema)
