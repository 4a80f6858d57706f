"""Storage-layout proofs: bucketed joins need no Exchange; partitioned
layouts prune directories at planning time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from movie_rec_spark.plans import (
    count_exchanges,
    partition_filters,
    scanned_bucketed,
)
from movie_rec_spark.sources.catalog import load_table
from movie_rec_spark.sources.layout import (
    write_bucketed,
    write_partitioned,
    write_zordered,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    write_bucketed(
        load_table(spark, SF, "orders"), "t_orders_b",
        "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"),
        "t_lineitem_b", "o_orderkey", 8, sort_col="o_orderkey")
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


@pytest.fixture()
def no_broadcast(spark):
    """At test scale everything fits the broadcast threshold, which
    (correctly) beats bucketing; disable it to exercise the layout the
    way a 100 TB fact-fact join would."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, bucketed_tables, no_broadcast):
    ot, lt = bucketed_tables
    joined = spark.table(lt).join(spark.table(ot), "o_orderkey")
    assert scanned_bucketed(joined)
    assert count_exchanges(joined) == 0, (
        "bucketed co-located join must not shuffle")
    # and it computes the same rows as the shuffled join
    plain = (
        load_table(spark, SF, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey")
        .join(load_table(spark, SF, "orders"), "o_orderkey")
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables, no_broadcast):
    ot, _ = bucketed_tables
    agg = spark.table(ot).groupBy("o_orderkey").agg(
        F.sum("o_totalprice").alias("s"))
    assert count_exchanges(agg) == 0, (
        "groupBy on the bucket key must reuse the bucketed distribution")


def test_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    write_partitioned(
        load_table(spark, SF, "events"), path, "event_type")
    df = spark.read.parquet(path).filter(F.col("event_type") == "purchase")
    pf = partition_filters(df)
    assert pf and any("purchase" in f for f in pf), (
        f"expected a planning-time partition filter, got {pf!r}")
    got = df.count()
    want = (load_table(spark, SF, "events")
            .filter(F.col("event_type") == "purchase").count())
    assert got == want


def test_zvalue_interleaves_bits(spark):
    """Morton interleave of known values: z(a=0b11, b=0b01) =
    0b0111 = 7; z(1,1)=3; z(2,0)=4; dimension order (a even bits)."""
    from pyspark.sql import functions as F
    from movie_rec_spark.sources.layout import zvalue
    df = spark.createDataFrame(
        [(3, 1), (1, 1), (2, 0), (0, 0)], "a int, b int")
    out = {(r.a, r.b): r.z for r in
           df.select("a", "b", zvalue(F.col("a"), F.col("b"))
                     .alias("z")).collect()}
    assert out == {(3, 1): 7, (1, 1): 3, (2, 0): 4, (0, 0): 0}


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    """Files of a z-ordered write cover tight rectangles: the summed
    per-file custkey span is far below files x full-span (which is
    what a date-sorted layout would give), while date spans stay
    bounded — both dimensions cluster at once."""
    from pyspark.sql import functions as F
    from movie_rec_spark.sources.catalog import load_table
    from movie_rec_spark.sources.layout import write_zordered
    import glob
    import pyarrow.parquet as pq

    orders = load_table(spark, "/root/testdata/sf0.01", "orders") \
        .withColumn("_day", F.datediff(
            F.to_date("o_orderdate"),
            F.lit("1970-01-01").cast("date")).cast("long"))
    path = str(tmp_path / "z")
    write_zordered(orders, path, "o_custkey", "_day", n_files=8)
    spans_c, full_c = [], [0, 0]
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        st = md.row_group(0).column(idx["o_custkey"]).statistics
        lo, hi = st.min, st.max
        for rg in range(1, md.num_row_groups):
            s2 = md.row_group(rg).column(idx["o_custkey"]).statistics
            lo, hi = min(lo, s2.min), max(hi, s2.max)
        spans_c.append(hi - lo)
        full_c = [min(full_c[0], lo) if spans_c[1:] else lo,
                  max(full_c[1], hi)]
    full = full_c[1] - full_c[0]
    assert len(spans_c) >= 4
    assert sum(spans_c) < len(spans_c) * full * 0.7, \
        "z-order must tighten per-file custkey ranges vs the full span"


def test_zorder_rejects_empty_and_non_numeric(spark, tmp_path):
    """Edge-input guards: empty input and non-numeric cluster columns
    fail with a clear ValueError instead of a TypeError deep in the
    min/max float cast."""
    empty = spark.createDataFrame([], "a long, b long")
    with pytest.raises(ValueError, match="empty input"):
        write_zordered(empty, str(tmp_path / "e"), "a", "b")
    dated = spark.createDataFrame(
        [(1, "2024-01-01")], "a long, d string"
    ).withColumn("d", F.to_date("d"))
    with pytest.raises(ValueError, match="must be numeric"):
        write_zordered(dated, str(tmp_path / "d"), "a", "d")


def test_bucketed_catalog_drops_agg_exchange(spark):
    """q_top_movies over the maintained bucketed lineitem (bucketed on
    the grouping key l_partkey) loses the aggregation Exchange the
    parquet path needs, and the rows are identical — layout must never
    change the answer."""
    from movie_rec_spark.operators.relational import q_top_movies
    from movie_rec_spark.plans import count_exchanges, scanned_bucketed
    from movie_rec_spark.sources.layout import bucketed_table

    part = load_table(spark, SF, "part")
    plain = q_top_movies(load_table(spark, SF, "lineitem"), part)
    li_b = bucketed_table(spark, SF, "lineitem", "l_partkey", 8)
    buck = q_top_movies(li_b, part)
    assert scanned_bucketed(buck)
    assert count_exchanges(buck) < count_exchanges(plain), (
        f"bucketed plan must drop the groupBy Exchange: "
        f"{count_exchanges(buck)} vs {count_exchanges(plain)}")
    assert [tuple(r) for r in buck.collect()] == \
        [tuple(r) for r in plain.collect()]


def test_bucketed_catalog_reregisters_without_rewrite(spark):
    """A fresh session (no table metadata) finds the finished files and
    re-registers via DDL instead of rewriting: the parquet part files
    must be byte-identical (same inodes untouched) after re-entry."""
    import glob
    import os

    from movie_rec_spark.sources.layout import bucketed_table

    bucketed_table(spark, SF, "lineitem", "l_partkey", 8)
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir").removeprefix("file:")
    loc = glob.glob(os.path.join(warehouse, "mrs_b_lineitem_l_partkey_8_*"))
    assert loc, "bucketed table location missing"
    before = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(loc[0], "*.parquet"))}
    assert before
    # simulate the fresh-session path: drop ONLY the metadata
    name = os.path.basename(loc[0])
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # DROP TABLE on an external table keeps files; re-entry must
    # re-register, not rewrite
    df = bucketed_table(spark, SF, "lineitem", "l_partkey", 8)
    assert df.count() > 0
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(loc[0], "*.parquet"))}
    assert after == before, "re-registration must not rewrite data files"


def test_zvalue_n_three_dims_and_overflow_guard(spark):
    """3-D Morton: dim d's bit i lands at position 3i+d —
    z(1,0,0)=1, z(0,1,0)=2, z(0,0,1)=4, z(1,1,1)=7, z(2,0,0)=8;
    2-col zvalue stays bit-identical to zvalue_n([a,b]); >62 z-bits
    raises."""
    from movie_rec_spark.sources.layout import zvalue, zvalue_n
    df = spark.createDataFrame(
        [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1), (2, 0, 0)],
        "a int, b int, c int")
    out = {(r.a, r.b, r.c): r.z for r in df.select(
        "a", "b", "c",
        zvalue_n([F.col("a"), F.col("b"), F.col("c")], bits=8)
        .alias("z")).collect()}
    assert out == {(1, 0, 0): 1, (0, 1, 0): 2, (0, 0, 1): 4,
                   (1, 1, 1): 7, (2, 0, 0): 8}
    two = df.select(
        (zvalue(F.col("a"), F.col("b"))
         == zvalue_n([F.col("a"), F.col("b")])).alias("same")).collect()
    assert all(r.same for r in two)
    with pytest.raises(ValueError, match="overflows"):
        zvalue_n([F.col("a")] * 4, bits=16)


def test_zorder_write_three_dims(spark, tmp_path):
    """write_zordered with a third cluster column produces per-file
    stats tighter than the full span on ALL THREE dimensions."""
    import glob
    import pyarrow.parquet as pq

    orders = load_table(spark, "/root/testdata/sf0.01", "orders") \
        .withColumn("_day", F.datediff(
            F.to_date("o_orderdate"),
            F.lit("1970-01-01").cast("date")).cast("long")) \
        .withColumn("_price", F.col("o_totalprice").cast("long"))
    path = str(tmp_path / "z3")
    write_zordered(orders, path, "o_custkey", "_day", "_price",
                   n_files=8)
    for col in ("o_custkey", "_day", "_price"):
        spans, lo_all, hi_all = [], None, None
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[col]).statistics
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans.append(hi - lo)
            lo_all = lo if lo_all is None else min(lo_all, lo)
            hi_all = hi if hi_all is None else max(hi_all, hi)
        full = hi_all - lo_all
        assert len(spans) >= 4
        assert sum(spans) < len(spans) * full * 0.85, \
            f"{col}: z-order must tighten per-file ranges"


def test_cobucketed_fact_join_drops_exchanges_and_sorts(
        spark, no_broadcast):
    """q_bucketed_join's layout: both facts co-bucketed AND sorted on
    the order key, so the fact-fact sort-merge join needs neither an
    Exchange nor a Sort before the zip; the raw-table twin needs both.
    Rows identical — layout must never change the answer."""
    from movie_rec_spark.operators.relational import (
        order_priority_revenue,
    )
    from movie_rec_spark.plans import count_exchanges, physical_plan
    from movie_rec_spark.sources.layout import bucketed_table

    plain = order_priority_revenue(
        load_table(spark, SF, "lineitem"), load_table(spark, SF, "orders"))
    buck = order_priority_revenue(
        bucketed_table(spark, SF, "lineitem", "l_orderkey", 8,
                       sort_col="l_orderkey"),
        bucketed_table(spark, SF, "orders", "o_orderkey", 8,
                       sort_col="o_orderkey"))
    # one Exchange remains (the 5-key priority agg); the join's two
    # fact shuffles are gone
    assert count_exchanges(buck) <= 1 < count_exchanges(plain)
    # The SMJ's Sort nodes remain by default: since SPARK-28632 the
    # scan only advertises bucket-sortedness under
    # spark.sql.legacy.bucketedTableScan.outputOrdering (one file per
    # bucket isn't guaranteed in general — our writer does guarantee
    # it, so the flag is a safe opt-in here). Even unflagged, the Sort
    # is per-partition over already-sorted runs — no shuffle, and
    # TimSort-style merges on sorted input — so the Exchange win is
    # the one that matters. Prove the opt-in removes the Sort too:
    old = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        buck2 = order_priority_revenue(
            bucketed_table(spark, SF, "lineitem", "l_orderkey", 8,
                           sort_col="l_orderkey"),
            bucketed_table(spark, SF, "orders", "o_orderkey", 8,
                           sort_col="o_orderkey"))
        join_part = physical_plan(buck2).split("SortMergeJoin")[-1]
        assert "Sort " not in join_part
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", old)
    assert sorted(map(tuple, buck.collect())) == \
        sorted(map(tuple, plain.collect()))
