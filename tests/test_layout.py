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
