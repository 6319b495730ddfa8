"""Engine-contract tests (SURVEY.md §1.2 C1–C5 — the behaviors ported from
the reference, ``/root/reference/Source/BOSSArrowStorageEngine.cpp:29-59``)."""

from __future__ import annotations

from bossarrowstorageengine_spark import Engine

SF = "/root/testdata/sf0.001"


def test_c1_total_function_reifies_errors(spark):
    eng = Engine(spark, sf_dir=SF)
    res = eng.evaluate("SELECT * FROM table_that_does_not_exist")
    assert not res.ok
    assert res.error is not None
    assert res.error.exception_type == "AnalysisException"
    assert "table_that_does_not_exist" in res.error.message
    # the offending payload is carried in the error (ErrorWhenEvaluatingExpression shape)
    assert "table_that_does_not_exist" in str(res.error.payload)


def test_c2_pass_through_unhandled_payload(spark):
    eng = Engine(spark, sf_dir=SF)
    for payload in (42, {"not": "a query"}, None):
        res = eng.evaluate(payload)
        assert res.ok
        assert res.value == payload


def test_c2_identity_on_dataframe(spark):
    eng = Engine(spark, sf_dir=SF)
    df = spark.range(3)
    res = eng.evaluate(df)
    assert res.ok and res.value is df  # returned unchanged, not copied


def test_evaluate_sql_and_callable(spark):
    eng = Engine(spark, sf_dir=SF)
    r1 = eng.evaluate("SELECT count(*) AS n FROM lineitem")
    assert r1.ok and r1.value.collect()[0].n == 6000
    r2 = eng.evaluate(lambda s: s.table("nation").count())
    assert r2.ok and r2.value == 25


def test_c4_reset_lifecycle(spark):
    eng = Engine(spark, sf_dir=SF)
    assert eng.evaluate("SELECT 1 AS x").ok
    eng.reset()
    # temp views are gone until lazily re-registered by the next evaluate
    res = eng.evaluate("SELECT count(*) AS n FROM orders")
    assert res.ok and res.value.collect()[0].n == 1500


def test_table_accessor(spark):
    eng = Engine(spark, sf_dir=SF)
    assert eng.table("region").count() == 5


def test_observation_metrics_piggyback_on_query(spark):
    """df.observe(Observation, ...) collects accumulator-style metrics on
    the same pass as the query — no second scan; the observability hook a
    production pipeline uses for row-count/quality gauges."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity")).alias("total_qty"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
    )
    out = observed.groupBy("l_returnflag").count()
    n_groups = out.count()  # triggers the single pass
    got = obs.get
    assert n_groups >= 1
    assert got["n_rows"] == li.count()
    exp_qty = li.agg(F.sum("l_quantity")).first()[0]
    assert abs(got["total_qty"] - exp_qty) < 1e-6
    assert 0 < got["n_discounted"] < got["n_rows"]


def test_boss_expression_compiles_to_dataframe(spark):
    """The BOSS s-expression dialect (boss_expr) compiles through
    Engine.evaluate to real DataFrames with values matching the native
    DataFrame formulation."""
    from pyspark.sql import functions as F

    from bossarrowstorageengine_spark.catalog import load_table
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    res = eng.evaluate((
        "Group",
        ("Select", ("Table", "orders"),
         ("Where", ("Greater", "o_totalprice", 100000.0))),
        ("By", "o_orderstatus"),
        ("As", "n", ("Count",)),
        ("As", "s", ("Sum", "o_totalprice")),
    ))
    assert res.ok
    got = {r.o_orderstatus: (r.n, round(r.s, 2)) for r in res.value.collect()}
    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    exp_df = (o.filter(F.col("o_totalprice") > 100000.0)
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("o_totalprice").alias("s")))
    exp = {r.o_orderstatus: (r.n, round(r.s, 2)) for r in exp_df.collect()}
    assert got == exp


def test_boss_unknown_head_passes_through(spark):
    """C2: a tuple whose head the dialect lacks returns unchanged — the
    reference's behavior for expressions it has no handler for."""
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    payload = ("FrobnicateRelation", ("Table", "orders"), 42)
    res = eng.evaluate(payload)
    assert res.ok and res.value is payload

    # ...including unknown SCALAR heads nested inside a known relational one
    payload2 = ("Select", ("Table", "orders"),
                ("Where", ("Quux", "o_totalprice")))
    res2 = eng.evaluate(payload2)
    assert res2.ok and res2.value is payload2


def test_boss_top_and_order(spark):
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    res = eng.evaluate((
        "Top", ("Table", "nation"), ("DescBy", "n_name"), 3))
    assert res.ok
    names = [r.n_name for r in res.value.collect()]
    assert names == sorted(names, reverse=True) and len(names) == 3


def test_boss_union_distinct(spark):
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    proj = ("Project", ("Table", "nation"), "n_regionkey")
    res = eng.evaluate(("Distinct", ("Union", proj, proj)))
    assert res.ok
    vals = sorted(r.n_regionkey for r in res.value.collect())
    assert vals == [0, 1, 2, 3, 4]


def test_engine_explain_renders_plan_for_boss_and_sql(spark):
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    plan = eng.explain(("Select", ("Table", "lineitem"),
                        ("Where", ("Greater", "l_quantity", 30.0))))
    assert "Physical Plan" in plan and "PushedFilters" in plan
    plan2 = eng.explain("SELECT count(*) FROM nation")
    assert "Physical Plan" in plan2
    import pytest as _pytest
    with _pytest.raises(TypeError):
        eng.explain(("NotARelation", 1))  # C2 pass-through → not a DataFrame


def test_boss_malformed_known_head_passes_through(spark):
    """C2 uniformity (round-4 advice): a KNOWN head with the wrong arity or
    argument shape is just as un-compilable as an unknown head, so it takes
    the same pass-through path — it must NOT reify an IndexError as an
    EngineError (an inconsistent totality contract for equally
    un-compilable inputs)."""
    from bossarrowstorageengine_spark.engine import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    malformed = [
        ("Select", ("Table", "orders")),                       # missing Where
        ("Select", ("Table", "orders"), ("Where",)),           # empty Where
        ("Top", ("Table", "orders"), ("By", "o_orderkey")),    # missing n
        ("Top", ("Table", "orders"), ("By", "o_orderkey"), "five"),  # n: str
        ("Join", ("Table", "orders"), ("Table", "customer")),  # missing cond
        ("Union", ("Table", "orders")),                        # one input
        ("Table",),                                            # no name
        ("Table", "orders", "extra"),                          # too many args
        ("Project", ("Table", "orders"), ("As", "x")),         # As arity
        ("Project", ("Table", "orders")),                      # no columns
        ("Select", ("Table", "orders"),
         ("Where", ("Greater", "o_totalprice"))),              # binop arity
        ("Order", ("Table", "orders"), ("By", 7)),             # non-str col
        ("Group", ("Table", "orders"), ("By", "o_orderstatus")),  # no aggs
    ]
    for payload in malformed:
        res = eng.evaluate(payload)
        assert res.ok, (payload, res.error)
        assert res.value is payload, payload

    # Well-formed expressions still compile after the arity guards.
    ok = eng.evaluate(("Top", ("Table", "orders"), ("By", "o_orderkey"), 3))
    from pyspark.sql import DataFrame
    assert ok.ok and isinstance(ok.value, DataFrame)
    assert ok.value.count() == 3
