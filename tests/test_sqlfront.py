"""SQL front-end: dialect rewrites + DDL surface."""

from materialize_spark.plans.dialect import rewrite
from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def test_rewrite_casts():
    assert rewrite("SELECT a::int8 FROM t") == "SELECT CAST(a AS BIGINT) FROM t"
    assert rewrite("SELECT (a + b)::float8") == "SELECT CAST((a + b) AS DOUBLE)"
    # chained
    assert "CAST(CAST(a AS INT) AS STRING)" in rewrite("SELECT a::int4::text")


def test_rewrite_like_and_regex():
    assert rewrite("a ~~ 'x%'") == "a LIKE 'x%'"
    assert rewrite("a !~~ 'x%'") == "a NOT LIKE 'x%'"
    assert rewrite("a ~ '^x'") == "a RLIKE '^x'"


def test_rewrite_literals_untouched():
    out = rewrite("SELECT 'a::b ~~ c' FROM t WHERE x::int4 = 1")
    assert "'a::b ~~ c'" in out and "CAST(x AS INT)" in out


def test_rewrite_json_arrow_and_series():
    assert rewrite("props ->> 'k'") == "get_json_object(props, '$.k')"
    assert rewrite("SELECT generate_series(1, 5)") == \
        "SELECT explode(sequence(1, 5))"


def test_rewrite_mz_now():
    assert rewrite("WHERE mz_now() > ts") == "WHERE current_timestamp() > ts"


def test_session_ddl_and_fastpath(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE VIEW big_orders AS SELECT * FROM orders "
                 "WHERE o_totalprice > 100000")
    n_view = sess.sql("SELECT count(*) AS n FROM big_orders").collect()[0].n
    sess.execute("CREATE MATERIALIZED VIEW big_orders_mv AS "
                 "SELECT * FROM orders WHERE o_totalprice > 100000")
    n_mv = sess.sql("SELECT count(*) AS n FROM big_orders_mv").collect()[0].n
    assert n_view == n_mv > 0
    shown = {r.name for r in sess.execute("SHOW VIEWS").collect()}
    assert {"big_orders", "big_orders_mv"} <= shown
    sess.execute("CREATE INDEX orders_by_cust ON orders (o_custkey)")
    assert "orders_by_cust" in {r.name for r in sess.execute("SHOW INDEXES").collect()}
    sess.execute("DROP VIEW big_orders")
    sess.execute("DROP VIEW big_orders_mv")
    sess.execute("DROP INDEX orders_by_cust")
    assert "big_orders" not in {r.name for r in sess.execute("SHOW VIEWS").collect()}
