"""Predicate / value DSL — the JS DataFrame query layer re-expressed on Spark.

Mirrors the reference's predicate tree (js/src/predicate.ts:110-240): values
(``col``/``lit``), comparisons ``eq``/``lteq``/``gteq``, combinators
``and_``/``or_`` (with conjunction flattening, predicate.ts:117 ``ands``),
and ``custom`` row predicates (predicate.ts:225-240).

The reference *binds* a predicate per RecordBatch and specializes closures
(dictionary fast path, predicate.ts:143-167).  Here binding is Catalyst's
job: each node lowers to a ``pyspark.sql.Column`` expression, so codegen +
parquet dictionary/row-group filtering provide the same (better) fast paths.
``custom`` is the one escape hatch and lowers to an Arrow-batched pandas UDF
— the slow path, as in the reference.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.types import BooleanType


class Value:
    """A scalar-producing node: column reference or literal."""

    def to_column(self) -> Column:
        raise NotImplementedError

    # comparisons (js/src/predicate.ts:127-223)
    def eq(self, other) -> "Predicate":
        return Equals(self, _wrap(other))

    def lteq(self, other) -> "Predicate":
        return LTeq(self, _wrap(other))

    def gteq(self, other) -> "Predicate":
        return GTeq(self, _wrap(other))


class Col(Value):
    """Named column reference (js/src/predicate.ts:96 ``Col``)."""

    def __init__(self, name: str):
        self.name = name

    def to_column(self) -> Column:
        return F.col(self.name)

    def __repr__(self) -> str:
        return f"col({self.name!r})"


class Literal(Value):
    """Literal value (js/src/predicate.ts:88 ``Literal``)."""

    def __init__(self, value):
        self.value = value

    def to_column(self) -> Column:
        return F.lit(self.value)

    def __repr__(self) -> str:
        return f"lit({self.value!r})"


def _wrap(v) -> Value:
    return v if isinstance(v, Value) else Literal(v)


class Predicate:
    """Boolean-producing node."""

    def to_column(self) -> Column:
        raise NotImplementedError

    def and_(self, other: "Predicate") -> "Predicate":
        return And(self, other)

    def or_(self, other: "Predicate") -> "Predicate":
        return Or(self, other)

    def negate(self) -> "Predicate":
        return Not(self)

    # pythonic aliases
    __and__ = and_
    __or__ = or_
    __invert__ = negate

    def ands(self) -> list["Predicate"]:
        """Flatten a conjunction tree (js/src/predicate.ts:117)."""
        return [self]


class ComparisonPredicate(Predicate):
    def __init__(self, left: Value, right: Value):
        self.left = left
        self.right = right


class Equals(ComparisonPredicate):
    def to_column(self) -> Column:
        return self.left.to_column() == self.right.to_column()


class LTeq(ComparisonPredicate):
    def to_column(self) -> Column:
        return self.left.to_column() <= self.right.to_column()


class GTeq(ComparisonPredicate):
    def to_column(self) -> Column:
        return self.left.to_column() >= self.right.to_column()


class And(Predicate):
    def __init__(self, *children: Predicate):
        self.children = list(children)

    def to_column(self) -> Column:
        out = self.children[0].to_column()
        for c in self.children[1:]:
            out = out & c.to_column()
        return out

    def ands(self) -> list[Predicate]:
        out: list[Predicate] = []
        for c in self.children:
            out.extend(c.ands())
        return out


class Or(Predicate):
    def __init__(self, *children: Predicate):
        self.children = list(children)

    def to_column(self) -> Column:
        out = self.children[0].to_column()
        for c in self.children[1:]:
            out = out | c.to_column()
        return out


class Not(Predicate):
    def __init__(self, child: Predicate):
        self.child = child

    def to_column(self) -> Column:
        return ~self.child.to_column()


class IsIn(Predicate):
    """Set-membership predicate (reference hash.h:94-96 IsIn, a TODO
    upstream).  Lowers to ``Column.isin`` over the literal member set —
    a codegen In expression that Catalyst pushes into the Parquet scan
    (``PushedFilters: [In(col, ...)]``), so the member test happens at
    scan speed with row-group pruning.  NULL is never a member (Arrow
    set semantics), and the result must be a DEFINITE boolean — not SQL
    IN's three-valued NULL — or ``Not(IsIn(...))`` would silently drop
    NULL rows (~NULL = NULL) instead of keeping them.  The lowering
    ``In(col, ...) AND IsNotNull(col)`` achieves that without blocking
    pushdown: NULL AND FALSE = FALSE collapses the NULL leg, and
    Catalyst splits the conjunction so both predicates still reach
    ``PushedFilters`` (a coalesce(.., false) wrapper would not)."""

    def __init__(self, value: Value, members):
        self.value = value
        self.members = [m for m in members if m is not None]

    def to_column(self) -> Column:
        if not self.members:
            return F.lit(False)
        c = self.value.to_column()
        return c.isin(*self.members) & c.isNotNull()


class CustomPredicate(Predicate):
    """User-function predicate (js/src/predicate.ts:225-240).

    ``fn`` receives a ``pandas.DataFrame`` batch (the Spark analog of the
    reference's per-RecordBatch bind) and returns a boolean ``pandas.Series``.
    Lowers to an Arrow-batched pandas UDF over a struct of ``columns``.
    """

    def __init__(self, fn: Callable, columns: list[str]):
        self.fn = fn
        self.columns = columns

    def to_column(self) -> Column:
        from pyspark.sql.pandas.functions import pandas_udf

        fn = self.fn

        @pandas_udf(BooleanType())
        def _pred(batch):  # batch: pd.DataFrame of the struct fields
            return fn(batch)

        return _pred(F.struct(*[F.col(c) for c in self.columns]))


def col(name: str) -> Col:
    return Col(name)


def lit(value) -> Literal:
    return Literal(value)


def custom(fn: Callable, columns: list[str]) -> CustomPredicate:
    return CustomPredicate(fn, columns)


def isin(value, members) -> IsIn:
    return IsIn(_wrap(value), members)
