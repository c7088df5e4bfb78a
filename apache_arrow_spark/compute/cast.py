"""Cast kernel — the reference's big scalar-function surface (SURVEY.md §2.6).

Re-expresses ``Cast(ctx, array, to_type, CastOptions)`` from
cpp/src/arrow/compute/kernels/cast.h:37-76 / cast.cc (matrix at
cast.cc:830-944) as Catalyst column expressions.  Semantics preserved:

- ``safe=True`` default: integer overflow raises (cast.cc:218-260 safe-check)
  unless ``allow_int_overflow``; temporal downscale raises on sub-unit loss
  (cast.cc:422-449 ``ShiftTime``) unless ``allow_time_truncate``.
- float->int truncates toward zero (static_cast), like the reference.
- Unsigned types are *logical* here (Spark has none): range checks enforce
  the original unsigned bounds on the widened physical type (uint8->short,
  uint16->int, uint32->long, uint64->decimal(20,0)) — SURVEY §1.2.
- Timestamps: Spark is µs-only, so s/ms/us/ns conversions operate on int64
  columns tagged with a unit, exactly the reference's physical model.
- list<A>->list<B> casts the child through ``transform`` (ListCastKernel,
  cast.cc:470-508).
- dictionary->dense is identity (dictionary is physical in Spark/Parquet).

All checks are Catalyst expressions (``assert_true``) — they ride
whole-stage codegen; no Python in the row path.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass
class CastOptions:
    """cpp/src/arrow/compute/kernels/cast.h:30-45."""

    allow_int_overflow: bool = False
    allow_time_truncate: bool = False


# target-type bounds: signed from Spark, unsigned from the reference's
# logical types (format/Schema.fbs int widths)
_INT_BOUNDS = {
    "int8": (-(2**7), 2**7 - 1),
    "int16": (-(2**15), 2**15 - 1),
    "int32": (-(2**31), 2**31 - 1),
    "int64": (-(2**63), 2**63 - 1),
    "uint8": (0, 2**8 - 1),
    "uint16": (0, 2**16 - 1),
    "uint32": (0, 2**32 - 1),
    "uint64": (0, 2**64 - 1),
}

# physical Spark type each arrow logical type is stored as (SURVEY §1.2)
_SPARK_TYPE = {
    "bool": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "uint8": "smallint",  # widened
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float16": "float",  # widened (HALF_FLOAT)
    "float32": "float",
    "float64": "double",
    "string": "string",
    "binary": "binary",
    "date32": "date",
    "date64": "date",
}

_TIME_UNIT_MICROS = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}  # ns is finer
_UNIT_FACTOR = {"s": 10**0, "ms": 10**3, "us": 10**6, "ns": 10**9}  # per second


def _checked(ok: Column, msg: str, result: Column) -> Column:
    """Attach a row-level assertion to ``result`` (raises like the reference's
    Status::Invalid on unsafe cast).  assert_true is non-foldable so Catalyst
    keeps it; the branch is codegen'd, no Python involved."""
    return F.when(F.assert_true(ok, F.lit(msg)).isNull(), result)


def _int_cast(col: Column, target: str, opts: CastOptions) -> Column:
    lo, hi = _INT_BOUNDS[target]
    spark_t = _SPARK_TYPE[target]
    result = col.cast(spark_t)
    if opts.allow_int_overflow:
        # reference static_cast wraps two's-complement (cast.cc:195 functor
        # with allow_int_overflow).  Spark 4 is ANSI by default (cast raises),
        # so wrap explicitly: ((v - lo) mod span) + lo in decimal arithmetic
        # (span can exceed int64 for uint64).
        span = F.lit(str(hi - lo + 1)).cast("decimal(38,0)")
        v = col.cast("decimal(38,0)")
        wrapped = F.pmod(v - F.lit(lo).cast("decimal(38,0)"), span) + F.lit(lo).cast("decimal(38,0)")
        return wrapped.cast(spark_t)
    # overflow guard (cast.cc:218 SafeMinimum/SafeMaximum check); truncation
    # toward zero for floats first, as static_cast does.  The comparison runs
    # on a double view of the source so it types against bool/any-numeric
    # inputs; exactness only degrades within ~1024 of the int64 extremes.
    v = col.cast("double")
    ok = v.isNull() | ((v >= F.lit(float(lo))) & (v <= F.lit(float(hi))))
    return _checked(ok, f"arrow cast overflow: value out of {target} range", result)


def time_shift(col: Column, from_unit: str, to_unit: str, opts: CastOptions | None = None) -> Column:
    """Unit conversion over int64 temporal columns (cast.cc ShiftTime,
    :422-449): upscale multiplies, downscale divides with a remainder guard
    unless ``allow_time_truncate``."""
    opts = opts or CastOptions()
    f_from, f_to = _UNIT_FACTOR[from_unit], _UNIT_FACTOR[to_unit]
    if f_from == f_to:
        return col
    if f_to > f_from:  # upscale: e.g. s -> ms
        return (col * F.lit(f_to // f_from)).cast("bigint")
    factor = f_from // f_to  # downscale: e.g. ns -> us
    # NB: Column `/` is double division — at epoch-nanos magnitude (~1.7e18)
    # doubles can't represent the operand exactly and the floor flips by ±1µs.
    # Decimal division is exact; Catalyst codegens it, still JVM-side.
    result = F.floor(col.cast("decimal(38,0)") / F.lit(factor)).cast("bigint")
    if opts.allow_time_truncate:
        return result
    ok = col.isNull() | (col % F.lit(factor) == 0)
    return _checked(ok, f"arrow cast: {from_unit}->{to_unit} would truncate", result)


def timestamp_from_long(col: Column, unit: str, opts: CastOptions | None = None) -> Column:
    """int64 epoch in ``unit`` -> TimestampNTZ (µs).  The reference's
    int64->timestamp reinterpret (cast.cc:852-860) + unit shift.  ns requires
    a truncation guard since Spark is µs-only."""
    micros = time_shift(col, unit, "us", opts or CastOptions())
    return F.timestamp_micros(micros).cast("timestamp_ntz")


def timestamp_to_long(col: Column, unit: str) -> Column:
    """timestamp -> int64 epoch in ``unit`` (temporal->int, cast.cc:863-886)."""
    micros = F.unix_micros(col.cast("timestamp"))
    return time_shift(micros, "us", unit, CastOptions(allow_time_truncate=True))


def date32_to_date64(col: Column) -> Column:
    """days->millis (cast.cc:452-467): x * 86400000, returned as int64."""
    return (col.cast("bigint") * F.lit(86_400_000)).cast("bigint")


def date64_to_date32(col: Column, opts: CastOptions | None = None) -> Column:
    """millis->days with truncation guard (cast.cc:452-467)."""
    opts = opts or CastOptions()
    result = F.floor(col.cast("decimal(38,0)") / F.lit(86_400_000)).cast("int")
    if opts.allow_time_truncate:
        return result
    ok = col.isNull() | (col % F.lit(86_400_000) == 0)
    return _checked(ok, "arrow cast: date64->date32 would truncate sub-day", result)


def cast_expr(col: Column, target: str, opts: CastOptions | None = None) -> Column:
    """Cast a column to an arrow-named target type with reference semantics.

    ``target`` uses arrow names: bool, int8..int64, uint8..uint64, float32,
    float64, decimal(p,s), string, binary, date32, date64(ms int64),
    timestamp[s|ms|us|ns] (-> TimestampNTZ), list<T>.
    """
    opts = opts or CastOptions()
    t = target.strip()
    if t in _INT_BOUNDS:
        return _int_cast(col, t, opts)
    if t in ("float32", "float64", "bool", "string", "binary"):
        return col.cast(_SPARK_TYPE.get(t, t))
    if t.startswith("decimal"):
        return col.cast(t)
    if t == "date32":
        return col.cast("date")
    if t == "date64":
        # physical form: epoch millis int64 (format/Schema.fbs DATE64)
        return date32_to_date64(F.datediff(col.cast("date"), F.lit("1970-01-01")))
    if t.startswith("timestamp"):
        # Spark timestamps are µs-only; finer/coarser units live as int64 +
        # time_shift/timestamp_from_long.  A timestamp-typed target is thus
        # always the µs representation.
        return col.cast("timestamp_ntz")
    if t.startswith("list<"):
        child = t[5:-1]
        return F.transform(col, lambda x: cast_expr(x, child, opts))
    if t == "null":
        return F.lit(None)
    # fall through to Spark's own cast for anything else
    return col.cast(t)


def cast(df: DataFrame, column: str, target: str, safe: bool = True, **options) -> Column:
    """Array.cast parity entrypoint (python/pyarrow/array.pxi:274):
    ``safe=False`` flips both allow flags, like pyarrow's safe parameter."""
    opts = CastOptions(**options) if options else (
        CastOptions() if safe else CastOptions(allow_int_overflow=True, allow_time_truncate=True)
    )
    return cast_expr(F.col(column), target, opts).alias(column)
