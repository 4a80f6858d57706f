"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``movie_rec_spark/``; this module only binds the
query builders to the parquet catalog and declares the DuckDB oracles.
Every computed column is aliased identically in the DataFrame build and
the oracle SQL; every LIMIT ordering ends in a unique key so the cut is
deterministic across engines; float aggregates are rounded identically on
both sides so value hashes match bit-for-bit.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from movie_rec_spark.operators import mutation as M  # noqa: E402
from movie_rec_spark.operators import relational as R  # noqa: E402
from movie_rec_spark.sources.catalog import load_table  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (q_top_movies) on /root/testdata/sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    return R.q_top_movies(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


def _t(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def get(spark: SparkSession, sf_dir: str) -> DataFrame:
        return load_table(spark, sf_dir, name)
    return get


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "q_top_movies": lambda s, d: R.q_top_movies(
            _t("lineitem")(s, d), _t("part")(s, d)),
        "q_user_latest_ratings": lambda s, d: R.q_user_latest_ratings(
            _t("orders")(s, d), _t("customer")(s, d)),
        "q_user_top_ratings": lambda s, d: R.q_user_top_ratings(
            _t("orders")(s, d), _t("customer")(s, d)),
        "q_movie_stats": lambda s, d: R.q_movie_stats(_t("lineitem")(s, d)),
        "q_user_rated_movies": lambda s, d: R.q_user_rated_movies(
            _t("lineitem")(s, d), _t("orders")(s, d), _t("part")(s, d)),
        "q_avg_recommendations": lambda s, d: R.q_avg_recommendations(
            _t("lineitem")(s, d), _t("orders")(s, d)),
        "q_distinct_users": lambda s, d: R.q_distinct_users(_t("orders")(s, d)),
        "q_candidates": lambda s, d: R.q_candidates(
            _t("customer")(s, d), _t("part")(s, d),
            _t("lineitem")(s, d), _t("orders")(s, d)),
        "q_candidates_scalable": lambda s, d: R.candidate_counts_scalable(
            _t("customer")(s, d), _t("part")(s, d),
            _t("lineitem")(s, d), _t("orders")(s, d)),
        "q_user_topn": lambda s, d: R.q_user_topn(_t("orders")(s, d)),
        "q_scalar_funcs": lambda s, d: R.q_scalar_funcs(_t("events")(s, d)),
        "q_set_ops": lambda s, d: R.q_set_ops(
            _t("orders")(s, d), _t("events")(s, d)),
        "q_upsert_latest": lambda s, d: M.q_upsert_latest(_t("events")(s, d)),
        "q_delete_antijoin": lambda s, d: M.q_delete_antijoin(_t("events")(s, d)),
        "q_implicit_fill": lambda s, d: M.q_implicit_fill(_t("events")(s, d)),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    K = R.FOCUS_CUSTKEY
    return {
        "q_top_movies": f"""
            SELECT p.p_partkey, p.p_name, a.cnt_orders, a.avg_price
            FROM (SELECT l_partkey, count(l_orderkey) AS cnt_orders,
                         round(avg(l_extendedprice), 2) AS avg_price
                  FROM lineitem WHERE l_quantity >= {R.QTY_THRESHOLD}
                  GROUP BY l_partkey) a
            JOIN part p ON a.l_partkey = p.p_partkey
            ORDER BY cnt_orders DESC, avg_price DESC, p.p_partkey
            LIMIT {R.TOP_LIMIT}
        """,
        "q_user_latest_ratings": f"""
            SELECT o.o_orderkey, c.c_name, o.o_totalprice, o.o_orderdate
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey = {K}
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT {R.TOP_N}
        """,
        "q_user_top_ratings": f"""
            SELECT o.o_orderkey, c.c_name, o.o_totalprice, o.o_orderdate
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_custkey = {K}
            ORDER BY o.o_totalprice DESC, o.o_orderdate DESC, o.o_orderkey
            LIMIT {R.TOP_N}
        """,
        "q_movie_stats": f"""
            SELECT l_partkey, count(l_orderkey) AS cnt_users,
                   round(avg(l_quantity), 2) AS avg_qty
            FROM lineitem WHERE l_returnflag <> 'R'
            GROUP BY l_partkey HAVING count(l_orderkey) > {R.STAT_LOWER_LIMIT}
            ORDER BY cnt_users DESC, l_partkey
        """,
        "q_user_rated_movies": f"""
            SELECT p_partkey, p_name, p_brand FROM part
            WHERE p_partkey IN (
                SELECT l.l_partkey FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey = {K})
        """,
        "q_avg_recommendations": f"""
            WITH top AS (
                SELECT l_partkey, count(l_orderkey) AS cnt_orders,
                       round(avg(l_extendedprice), 2) AS avg_price
                FROM lineitem WHERE l_quantity >= {R.QTY_THRESHOLD}
                GROUP BY l_partkey),
            seen AS (
                SELECT DISTINCT l.l_partkey FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                WHERE o.o_custkey = {K})
            SELECT t.l_partkey AS p_partkey, t.cnt_orders, t.avg_price
            FROM top t
            WHERE t.l_partkey NOT IN (SELECT l_partkey FROM seen)
            ORDER BY cnt_orders DESC, avg_price DESC, p_partkey
            LIMIT {R.REC_LIMIT}
        """,
        "q_distinct_users": "SELECT DISTINCT o_custkey FROM orders",
        "q_candidates": """
            WITH pairs AS (
                SELECT DISTINCT o.o_custkey, l.l_partkey FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT c.c_custkey, count(*) AS n_candidates
            FROM customer c CROSS JOIN part p
            LEFT JOIN pairs pr
              ON c.c_custkey = pr.o_custkey AND p.p_partkey = pr.l_partkey
            WHERE pr.o_custkey IS NULL
            GROUP BY c.c_custkey
        """,
        "q_candidates_scalable": """
            WITH seen AS (
                SELECT o.o_custkey, count(DISTINCT l.l_partkey) AS n_seen
                FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                GROUP BY o.o_custkey)
            SELECT c.c_custkey,
                   (SELECT count(*) FROM part) - coalesce(s.n_seen, 0) AS n_candidates
            FROM customer c LEFT JOIN seen s ON c.c_custkey = s.o_custkey
        """,
        "q_user_topn": f"""
            SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= {R.TOP_N}
        """,
        "q_scalar_funcs": f"""
            SELECT event_id,
                   round(value * 2, 0) / 2 AS value_half,
                   CAST(year(ts) AS INTEGER) AS event_year,
                   concat_ws(';', event_type, CAST(user_id AS VARCHAR)) AS tag,
                   CAST(len(string_split(props, ':')) AS INTEGER) AS n_props_parts,
                   coalesce(value, {R.DEFAULT_VALUE}) AS value_filled,
                   CAST(floor(value) AS BIGINT) AS value_floor,
                   CAST(value AS VARCHAR) AS value_str
            FROM events
        """,
        "q_set_ops": """
            WITH a AS (SELECT o_custkey AS uid FROM orders
                       INTERSECT SELECT user_id FROM events),
                 b AS (SELECT o_custkey AS uid FROM orders
                       WHERE o_totalprice > 400000
                       EXCEPT SELECT user_id FROM events
                       WHERE event_type = 'error')
            SELECT DISTINCT uid
            FROM (SELECT uid FROM a UNION SELECT uid FROM b)
        """,
        "q_upsert_latest": """
            SELECT event_id, user_id, event_type, value, ts
            FROM (SELECT e.*, row_number() OVER (
                      PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events e)
            WHERE rn = 1
        """,
        "q_delete_antijoin": """
            SELECT event_id, user_id, event_type, value, ts
            FROM events e
            WHERE NOT EXISTS (
                SELECT 1 FROM events t
                WHERE t.event_type = 'error'
                  AND t.user_id = e.user_id
                  AND CAST(t.ts AS DATE) = CAST(e.ts AS DATE))
        """,
        "q_implicit_fill": f"""
            SELECT e.event_id, e.user_id,
                   coalesce(s.avg_purchase, {M.DEFAULT_VALUE}) AS implied_value
            FROM events e
            LEFT JOIN (SELECT user_id, round(avg(value), 2) AS avg_purchase
                       FROM events WHERE event_type = 'purchase'
                       GROUP BY user_id) s
              ON e.user_id = s.user_id
            WHERE e.event_type = 'view'
        """,
    }
