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


def _cust(spark, rows):
    """rows: (custkey, nationkey, acctbal, segment)"""
    return spark.createDataFrame(
        [Row(c_custkey=c, c_name=f"Customer#{c}", c_nationkey=n,
             c_acctbal=float(b), c_mktsegment=s)
         for c, n, b, s in rows])


def test_kanon_audit_flags_small_classes(spark):
    """Classes below k violate; the $1k banding groups balances by
    floor(cents/100k) so 999.99 and 0.00 share band 0 while 1000.00
    starts band 1."""
    from movie_rec_spark.operators.quality import q_kanon

    rows = ([(i, 1, 500.0, "AUTO") for i in range(5)]      # class of 5
            + [(10, 1, 1500.0, "AUTO"),                    # class of 1
               (11, 2, 500.0, "AUTO")])                    # class of 1
    out = {(r.c_nationkey, r.c_mktsegment, r.bal_band):
           (r.group_size, r.violates)
           for r in q_kanon(_cust(spark, rows), k=5).collect()}
    assert out[(1, "AUTO", 0)] == (5, 0)
    assert out[(1, "AUTO", 1)] == (1, 1)
    assert out[(2, "AUTO", 0)] == (1, 1)


def test_kanon_generalize_ladder_all_levels(spark):
    """Each row gets the MINIMAL ladder level reaching k=3:
    level 0 (full qid), level 1 (segment + $5k band), level 2
    (segment only), level 3 (suppressed)."""
    from movie_rec_spark.operators.quality import q_kanon_generalize

    rows = (
        # 3 identical fine classes -> level 0
        [(i, 1, 100.0, "AUTO") for i in range(3)]
        # nations differ (fine class of 1 each) but same $5k band ->
        # level 1 once pooled (3 rows in (AUTO, band1=0))... these
        # three also pool with the level-0 trio in band1, so use a
        # distinct segment to isolate: BLDG spread across nations,
        # same coarse band
        + [(10, 1, 1000.0, "BLDG"), (11, 2, 2000.0, "BLDG"),
           (12, 3, 3000.0, "BLDG")]
        # same segment, coarse bands all differ -> only the segment
        # class reaches 3 -> level 2
        + [(20, 1, 5000.0, "MACH"), (21, 2, 10000.0, "MACH"),
           (22, 3, 15000.0, "MACH")]
        # a segment with fewer than k rows total -> level 3
        + [(30, 1, 100.0, "SHIP")])
    got = {r.c_custkey: (r.level, r.group_size)
           for r in q_kanon_generalize(
               _cust(spark, rows), k=3).collect()}
    for i in range(3):
        assert got[i] == (0, 3)
    for i in (10, 11, 12):
        assert got[i] == (1, 3)
    for i in (20, 21, 22):
        assert got[i] == (2, 3)
    assert got[30] == (3, 1)


def test_ldiversity_flags_homogeneous_classes(spark):
    """A class whose members all share one sensitive value violates
    even when it is k-large (the homogeneity attack k-anonymity
    misses); a class with >= l distinct sensitive values passes."""
    from movie_rec_spark.operators.quality import q_ldiversity

    rows = ([(i, 1, 100.0, "AUTO") for i in range(5)]        # 5 rows, 1 segment
            + [(10, 2, 100.0, "AUTO"), (11, 2, 200.0, "BLDG"),
               (12, 2, 300.0, "MACH")])                      # 3 rows, 3 segments
    out = {(r.c_nationkey, r.bal_band):
           (r.group_size, r.n_sensitive, r.violates)
           for r in q_ldiversity(_cust(spark, rows), l_min=3).collect()}
    assert out[(1, 0)] == (5, 1, 1)
    assert out[(2, 0)] == (3, 3, 0)
