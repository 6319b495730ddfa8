"""Differential property test for the BOSS s-expression dialect: random
expression trees compile (boss_expr) AND render to SQL; both faces must
agree row-for-row.  A dialect bug in either the compiler or the renderer
shows as a mismatch; agreement pins the semantics of every head."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bossarrowstorageengine_spark.boss_expr import compile_expr
from bossarrowstorageengine_spark.catalog import load_table

SF = "/root/testdata/sf0.001"

#: (table, numeric columns, string columns, group-able column)
_NATION = ("nation", ["n_nationkey", "n_regionkey"], ["n_name"], "n_regionkey")


def _render_scalar(e) -> str:
    ops = {"Plus": "+", "Minus": "-", "Times": "*",
           "Greater": ">", "GreaterEqual": ">=", "Lesser": "<",
           "LesserEqual": "<=", "Equal": "=", "NotEqual": "<>",
           "And": "AND", "Or": "OR"}
    if isinstance(e, str):
        return e
    if isinstance(e, bool):
        return "TRUE" if e else "FALSE"
    if isinstance(e, (int, float)):
        return repr(e)
    head, *args = e
    if head == "Symbol":
        return "'" + args[0].replace("'", "''") + "'"
    if head == "Not":
        return f"(NOT {_render_scalar(args[0])})"
    return f"({_render_scalar(args[0])} {ops[head]} {_render_scalar(args[1])})"


def _render_sql(e) -> str:
    head, *args = e
    if head == "Table":
        return args[0]
    if head == "Select":
        inner = _render_sql(args[0])
        return (f"(SELECT * FROM {inner} t_{id(e) % 9973} "
                f"WHERE {_render_scalar(args[1][1])})")
    if head == "Group":
        inner = _render_sql(args[0])
        by = ", ".join(args[1][1:])
        aggs = []
        for a in args[2:]:
            fn, *fargs = a[2]
            arg = _render_scalar(fargs[0]) if fargs else "*"
            fn_sql = {"Sum": "sum", "Avg": "avg", "Min": "min",
                      "Max": "max", "Count": "count"}[fn]
            aggs.append(f"{fn_sql}({arg}) AS {a[1]}")
        return (f"(SELECT {by}, {', '.join(aggs)} FROM {inner} "
                f"g_{id(e) % 9973} GROUP BY {by})")
    raise AssertionError(head)


@st.composite
def scalar_pred(draw):
    num = draw(st.sampled_from(_NATION[1]))
    cmp = draw(st.sampled_from(
        ["Greater", "GreaterEqual", "Lesser", "LesserEqual", "Equal",
         "NotEqual"]))
    lit = draw(st.integers(min_value=0, max_value=25))
    base = (cmp, num, lit)
    if draw(st.booleans()):
        num2 = draw(st.sampled_from(_NATION[1]))
        lit2 = draw(st.integers(min_value=0, max_value=25))
        comb = draw(st.sampled_from(["And", "Or"]))
        return (comb, base, ("Lesser", num2, lit2))
    return base


@st.composite
def rel_expr(draw):
    e = ("Table", _NATION[0])
    if draw(st.booleans()):
        e = ("Select", e, ("Where", draw(scalar_pred())))
    if draw(st.booleans()):
        agg = draw(st.sampled_from(["Sum", "Min", "Max", "Count"]))
        col = draw(st.sampled_from(_NATION[1]))
        spec = (agg, col) if agg != "Count" else ("Count",)
        e = ("Group", e, ("By", _NATION[3]), ("As", "m", spec))
    return e


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(expr=rel_expr())
def test_compiled_matches_rendered_sql(spark, expr):
    load_table(spark, SF, "nation").createOrReplaceTempView("nation")
    df = compile_expr(spark, expr, SF)
    sql_src = _render_sql(expr)
    sql_df = spark.sql(f"SELECT * FROM {sql_src} q")
    got = sorted(map(tuple, df.collect()))
    exp = sorted(map(tuple, sql_df.select(*df.columns).collect()))
    assert got == exp
