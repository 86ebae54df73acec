"""Queries exercising the SQL front-end (plans/): PG-dialect text in,
Spark execution, DuckDB oracle on the ANSI equivalent."""

from __future__ import annotations

from materialize_spark.plans.sqlfront import MzSession
from materialize_spark.queries import register


@register(
    "sqlfront_pg_idioms",
    """
    -- NB: engine CAST(double AS int) truncates toward zero (ANSI/Spark);
    -- PG/DuckDB round — oracle uses trunc() to pin the documented semantics
    SELECT c_custkey, CAST(trunc(c_acctbal) AS BIGINT) AS bal_int,
           c_name LIKE 'Customer#00000001%' AS name_like,
           CAST(json_extract_string(
               '{"seg": "' || c_mktsegment || '"}', '$.seg') AS VARCHAR) AS seg_json
    FROM customer WHERE c_custkey <= 100
    """,
    "sqlfront", "dialect",
)
def sqlfront_pg_idioms(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    # ::casts, ~~ like operator, jsonb ->> arrow — all PG spellings.
    return sess.sql("""
        SELECT c_custkey, c_acctbal::int8 AS bal_int,
               c_name ~~ 'Customer#00000001%' AS name_like,
               concat('{"seg": "', c_mktsegment, '"}') ->> 'seg' AS seg_json
        FROM customer WHERE c_custkey <= 100
    """)


@register(
    "sqlfront_distinct_on",
    """
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
    FROM orders WHERE o_custkey <= 200
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    "sqlfront", "distinct-on",
)
def sqlfront_distinct_on(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    return sess.sql("""SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey
        FROM orders WHERE o_custkey <= 200
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")


@register(
    "sqlfront_matview_roundtrip",
    """
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "sqlfront", "matview", "ddl",
)
def sqlfront_matview_roundtrip(spark, sf_dir):
    sess = MzSession(spark, sf_dir)
    sess.execute("""CREATE MATERIALIZED VIEW cust_by_nation AS
        SELECT n_name, count(*)::int8 AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name""")
    # served from the maintained snapshot (fast path), not re-planned
    out = sess.sql("SELECT n_name, n_cust FROM cust_by_nation")
    sess.execute("DROP VIEW cust_by_nation")
    return out
