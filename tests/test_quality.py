"""Declarative data-quality constraints (operators/quality.py) —
violations must COUNT correctly per kind, with the documented null
semantics (range/accepted/fk never count nulls; not_null does)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from movie_rec_spark.operators.quality import (
    accepted_values,
    check_constraints,
    foreign_key,
    in_range,
    not_null,
    q_data_quality,
    unique,
)


def _report(df, constraints):
    return {r.constraint_name: (r.n_rows, r.violations, r.passed)
            for r in check_constraints(df, constraints).collect()}


def test_row_local_constraints_count_and_null_semantics(spark):
    df = spark.createDataFrame(
        [(1, 5.0, "a"), (2, 99.0, "b"), (3, None, None), (4, -1.0, "z")],
        "id bigint, x double, s string")
    rep = _report(df, [
        not_null("x"),
        in_range("x", lo=0, hi=10),
        accepted_values("s", ["a", "b"]),
    ])
    assert rep["x not_null"] == (4, 1, False)
    # 99 and -1 violate; the NULL does NOT (not_null's job)
    assert rep["x in_range"] == (4, 2, False)
    # 'z' violates; NULL does not
    assert rep["s accepted_values"] == (4, 1, False)


def test_unique_and_foreign_key(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, None), (5, 99)],
        "id bigint, fk bigint")
    ref = spark.createDataFrame([(10,), (20,)], "k bigint")
    rep = _report(child, [
        unique(["id"]),
        unique(["fk"]),
        foreign_key("fk", ref, "k"),
    ])
    assert rep["(id) unique"] == (5, 0, True)
    # two rows share fk=10 → 1 extra row beyond distinct
    assert rep["(fk) unique"][1] >= 1
    # fk=99 is an orphan; the NULL fk is not audited
    assert rep["fk foreign_key"] == (4, 1, False)


def test_row_local_constraints_share_one_scan(spark):
    """All row-local constraints must compile into a single aggregate —
    one scan of the table regardless of constraint count."""
    df = spark.createDataFrame([(1, 2.0)], "id bigint, x double")
    rep = check_constraints(df, [
        not_null("id"), not_null("x"),
        in_range("x", 0, 10), accepted_values("id", [1]),
    ])
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_declared_report_has_both_verdicts(spark):
    sf = "/root/testdata/sf0.001"
    from movie_rec_spark.sources.catalog import load_table

    rep = q_data_quality(load_table(spark, sf, "orders"),
                         load_table(spark, sf, "customer"),
                         load_table(spark, sf, "lineitem")).collect()
    verdicts = {r.passed for r in rep}
    assert verdicts == {True, False}
    assert all(r.violations >= 0 and r.n_rows > 0 for r in rep)
