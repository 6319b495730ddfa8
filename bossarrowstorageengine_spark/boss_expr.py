"""BOSS-style s-expression compiler → Spark DataFrames.

The reference is a storage-engine plugin for the BOSS kernel-composition
architecture: hosts hand engines *partially evaluatable s-expressions*
(``Head(arg, ...)`` terms — public BOSS architecture; in-repo evidence is
the plugin packaging and BOSS dependency, ``/root/reference/CMakeLists.txt:
64-84,98-102``, and the ``BOSSExpression`` ABI in
``Source/BOSSArrowStorageEngine.cpp:52-56``).  The reference snapshot
evaluates every expression as the identity; a USER of that stack still
writes queries in the expression language.  This module gives those users a
direct on-ramp: the common relational heads compile to DataFrame operations
(so Catalyst plans/optimizes them), and — like the reference — any
expression this engine has no handler for passes through unchanged
(contract C2).

Expression encoding: a Python tuple ``("Head", arg0, arg1, ...)``; bare
strings are column references; ints/floats/bools are literals;
``("Symbol", s)`` forces a string literal where a bare string would read as
a column.

Relational heads::

    ("Table", name)
    ("Select", input, ("Where", cond))
    ("Project", input, ("As", out_name, expr), ... | "col", ...)
    ("Group", input, ("By", "col", ...),
              ("As", out_name, ("Sum"|"Avg"|"Min"|"Max"|"Count", expr?)), ...)
    ("Join", left, right, ("Where", ("Equal", lcol, rcol)))
    ("Order", input, ("By", "col", ...) | ("DescBy", "col", ...))
    ("Top", input, ("By", ...), n)
    ("Union", a, b)          # bag union (UNION ALL), by column name
    ("Distinct", input)

Scalar heads: ``Plus Minus Times Divide Greater GreaterEqual Lesser
LesserEqual Equal NotEqual And Or Not``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bossarrowstorageengine_spark import catalog


class UnknownHead(Exception):
    """Raised internally to signal pass-through (contract C2)."""


_BINOPS = {
    "Plus": lambda a, b: a + b,
    "Minus": lambda a, b: a - b,
    "Times": lambda a, b: a * b,
    "Divide": lambda a, b: a / b,
    "Greater": lambda a, b: a > b,
    "GreaterEqual": lambda a, b: a >= b,
    "Lesser": lambda a, b: a < b,
    "LesserEqual": lambda a, b: a <= b,
    "Equal": lambda a, b: a == b,
    "NotEqual": lambda a, b: a != b,
    "And": lambda a, b: a & b,
    "Or": lambda a, b: a | b,
}

_AGGS = {
    "Sum": F.sum,
    "Avg": F.avg,
    "Min": F.min,
    "Max": F.max,
    "Count": lambda c=None: F.count(F.lit(1) if c is None else c),
}


def _need(ok: bool, e: Any) -> None:
    """Arity/shape guard: a KNOWN head with the wrong argument count is just
    as un-compilable as an unknown head, so it takes the same C2
    pass-through path (raising IndexError instead would reify an
    EngineError — an inconsistent totality contract for equally
    un-compilable inputs)."""
    if not ok:
        raise UnknownHead(repr(e))


def _scalar(e: Any):
    """Compile a scalar expression to a Column."""
    if isinstance(e, str):
        return F.col(e)
    if isinstance(e, (int, float)) and not isinstance(e, bool):
        return F.lit(e)
    if isinstance(e, bool):
        return F.lit(e)
    if isinstance(e, tuple) and e:
        head, *args = e
        if head == "Symbol":
            _need(len(args) == 1, e)
            return F.lit(args[0])
        if head in _BINOPS:
            _need(len(args) == 2, e)
            left, right = (_scalar(a) for a in args)
            return _BINOPS[head](left, right)
        if head == "Not":
            _need(len(args) == 1, e)
            return ~_scalar(args[0])
    raise UnknownHead(repr(e))


def _is_head(e: Any, name) -> bool:
    names = (name,) if isinstance(name, str) else name
    return isinstance(e, tuple) and bool(e) and e[0] in names


def compile_expr(spark: SparkSession, e: Any, sf_dir: str) -> DataFrame:
    """Compile a relational s-expression to a DataFrame (raises
    ``UnknownHead`` for anything outside the dialect — callers translate
    that into C2 pass-through)."""
    if not (isinstance(e, tuple) and e and isinstance(e[0], str)):
        raise UnknownHead(repr(e))
    head, *args = e

    if head == "Table":
        _need(len(args) == 1 and isinstance(args[0], str), e)
        return catalog.load_table(spark, sf_dir, args[0])

    if head == "Select":
        _need(len(args) == 2, e)
        df = compile_expr(spark, args[0], sf_dir)
        if not (_is_head(args[1], "Where") and len(args[1]) == 2):
            raise UnknownHead(repr(args[1]))
        return df.filter(_scalar(args[1][1]))

    if head == "Project":
        _need(len(args) >= 2, e)
        df = compile_expr(spark, args[0], sf_dir)
        cols = []
        for a in args[1:]:
            if _is_head(a, "As"):
                _need(len(a) == 3 and isinstance(a[1], str), a)
                cols.append(_scalar(a[2]).alias(a[1]))
            else:
                cols.append(_scalar(a))
        return df.select(*cols)

    if head == "Group":
        _need(len(args) >= 2, e)
        df = compile_expr(spark, args[0], sf_dir)
        rest = list(args[1:])
        by: list[str] = []
        if rest and _is_head(rest[0], "By"):
            by = list(rest.pop(0)[1:])
            _need(all(isinstance(c, str) for c in by), e)
        aggs = []
        for a in rest:
            if _is_head(a, "As") and len(a) == 3 \
                    and isinstance(a[1], str) and isinstance(a[2], tuple) \
                    and a[2] and a[2][0] in _AGGS and len(a[2]) <= 2:
                fn = _AGGS[a[2][0]]
                col = _scalar(a[2][1]) if len(a[2]) > 1 else None
                agg = fn(col) if col is not None else fn()
                aggs.append(agg.alias(a[1]))
            else:
                raise UnknownHead(repr(a))
        _need(bool(aggs), e)
        grouped = df.groupBy(*[F.col(c) for c in by]) if by else df.groupBy()
        return grouped.agg(*aggs)

    if head == "Join":
        _need(len(args) == 3, e)
        left = compile_expr(spark, args[0], sf_dir)
        right = compile_expr(spark, args[1], sf_dir)
        cond_expr = args[2]
        if not (_is_head(cond_expr, "Where") and len(cond_expr) == 2
                and _is_head(cond_expr[1], "Equal")
                and len(cond_expr[1]) == 3):
            raise UnknownHead(repr(cond_expr))
        _, lcol, rcol = cond_expr[1]
        _need(isinstance(lcol, str) and isinstance(rcol, str), cond_expr)
        return left.join(right, left[lcol] == right[rcol])

    if head == "Union":
        _need(len(args) == 2, e)
        return compile_expr(spark, args[0], sf_dir).unionByName(
            compile_expr(spark, args[1], sf_dir))

    if head == "Distinct":
        _need(len(args) == 1, e)
        return compile_expr(spark, args[0], sf_dir).distinct()

    if head == "Order":
        _need(len(args) == 2, e)
        df = compile_expr(spark, args[0], sf_dir)
        spec = args[1]
        if _is_head(spec, ("By", "DescBy")):
            _need(len(spec) >= 2
                  and all(isinstance(c, str) for c in spec[1:]), spec)
            order = F.asc if spec[0] == "By" else F.desc
            return df.orderBy(*[order(c) for c in spec[1:]])
        raise UnknownHead(repr(spec))

    if head == "Top":
        _need(len(args) == 3, e)
        df = compile_expr(spark, args[0], sf_dir)
        spec, n = args[1], args[2]
        _need(isinstance(n, int) and not isinstance(n, bool) and n >= 0, e)
        if _is_head(spec, ("By", "DescBy")):
            _need(len(spec) >= 2
                  and all(isinstance(c, str) for c in spec[1:]), spec)
            order = F.asc if spec[0] == "By" else F.desc
            return df.orderBy(*[order(c) for c in spec[1:]]).limit(n)
        raise UnknownHead(repr(spec))

    raise UnknownHead(head)
