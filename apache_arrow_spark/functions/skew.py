"""Skew-handling: salted two-stage aggregation.

At 100 TB a groupBy on a power-law key (user id, domain, language) puts one
key's entire volume through one reducer.  Salting splits each key into
``n_salts`` shards for the partial aggregate, then combines shards — the
hot key's work spreads across ``n_salts`` tasks and the final stage only
sees #keys x n_salts pre-aggregated rows.

For joins, AQE's skew-join splitting — enabled in session confs — covers
the common sort-merge case at runtime; ``salted_join`` below is the
explicit, portable form for the cases AQE cannot re-balance (stream-static
joins, bucketed-scan joins that must not be re-planned, engines/configs
without AQE, or when the skew is known up front and the replication factor
should be chosen deliberately).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


# combinable aggregates: (partial expr builder, final expr builder)
_COMBINERS = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: output_name -> (fn, column) with fn in sum/count/min/max
    (the decomposable aggregates; avg = sum/count composed by the caller).

    Example::

        salted_agg(li, ["l_returnflag"],
                   {"n": ("count", "*"), "qty": ("sum", "l_quantity")})
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _COMBINERS:
            raise ValueError(f"{fn} is not decomposable; use sum/count/min/max")
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(n_salts))
    partial_exprs = [
        _COMBINERS[fn][0](F.lit(1) if col == "*" else F.col(col)).alias(f"__p_{name}")
        for name, (fn, col) in aggs.items()
    ]
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    final_exprs = [
        _COMBINERS[fn][1](F.col(f"__p_{name}")).alias(name)
        for name, (fn, _col) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_exprs)


def skew_report(
    df: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """Join-skew diagnosis: the top-``k`` heaviest keys with their row
    counts, self-join fan-out (n^2 — the row product a key contributes to
    an equi-self-join), and share of total fan-out in exact micro-units.
    This is the report run BEFORE a big join to decide between salting
    (q53), AQE skew splitting, or a broadcast rewrite; at 100 TB it is one
    map-side-combinable count aggregate + a TakeOrdered of k rows —
    diagnosis never costs more than a scan."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # decimal fan-out sum: ANSI bigint sum would raise on overflow at
    # extreme skew; decimal(38,0) is exact to ~10^38 total row products
    tot = counts.agg(
        F.sum((F.col("n") * F.col("n")).cast("decimal(38,0)")).alias("total_fanout")
    )
    # share in double space: n*n*1e6 in bigint overflows (ANSI raise) at
    # n ~ 3.04M rows per key — routine for the very skewed keys this
    # report exists to find.  fanout itself stays exact bigint to
    # n <= ~3.03e9 rows/key (beyond that the count column has already
    # told the story).
    n_d = F.col("n").cast("double")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            (F.col("n") * F.col("n")).alias("fanout"),
            F.floor(n_d * n_d * F.lit(1e6) / F.col("total_fanout").cast("double"))
            .cast("bigint")
            .alias("share_micro"),
        )
        .orderBy(F.col("fanout").desc(), F.col("key").asc())
        .limit(k)
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: spread each hot fact key over ``n_salts``
    reducer shards.

    The fact side gets an arbitrary per-row salt (its value never affects
    the result — every fact row meets the FULL dim row set for its key);
    the dim side is replicated once per salt with ``explode(sequence)``
    (JVM-side fan-out, no Python).  The join key becomes (key, salt), so
    a key holding 1% of a 100 TB table spreads over ``n_salts`` tasks
    instead of stalling one reducer.  Cost: dim shuffle volume grows by
    ``n_salts`` — pick it from :func:`skew_report`'s fan-out shares.

    Supports ``inner`` and ``left`` joins (each unmatched fact row exists
    under exactly one salt, so left-join semantics are preserved
    verbatim; right/full would need a dim-side dedup pass — not offered).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__dsalt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__dsalt"])
    return f.join(d, cond, how).drop("__salt", "__dsalt")
