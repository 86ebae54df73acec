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


def test_create_table_insert_subscribe(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE t1 (k STRING, v BIGINT)")
    s.execute("INSERT INTO t1 VALUES ('a', 1), ('b', 2)")
    s.execute("CREATE MATERIALIZED VIEW mv1 AS "
              "SELECT k, sum(v) AS total FROM t1 GROUP BY k")
    snap = s.sql("SUBSCRIBE mv1").collect()
    assert sorted((r.k, r.total, r.diff) for r in snap) == [
        ("a", 1, 1), ("b", 2, 1)]
    # insert + refresh -> SUBSCRIBE emits only the changed group's diff pair
    s.execute("INSERT INTO t1 VALUES ('a', 10)")
    s.execute("REFRESH MATERIALIZED VIEW mv1")
    delta = s.sql("SUBSCRIBE mv1").collect()
    assert sorted((r.k, r.total, r.diff) for r in delta) == [
        ("a", 1, -1), ("a", 11, 1)]


def test_create_table_as_and_source_file(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE big_orders AS "
              "SELECT * FROM orders WHERE o_totalprice > 100000")
    n = s.sql("SELECT count(*) AS n FROM big_orders").first().n
    assert n > 0
    s.execute(f"CREATE SOURCE ext FROM FILE '{SF_DIR}/region.parquet' "
              "FORMAT PARQUET")
    assert s.sql("SELECT count(*) AS n FROM ext").first().n == 5


def test_insert_select_appends(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE nat2 AS SELECT * FROM nation")
    before = s.sql("SELECT count(*) AS n FROM nat2").first().n
    s.execute("INSERT INTO nat2 SELECT * FROM nation WHERE n_regionkey = 0")
    after = s.sql("SELECT count(*) AS n FROM nat2").first().n
    assert after > before


def test_explain_stages(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    phys = "\n".join(r.plan for r in s.sql(
        "EXPLAIN SELECT count(*) FROM lineitem WHERE l_quantity > 10").collect())
    assert "HashAggregate" in phys or "Aggregate" in phys
    raw = "\n".join(r.plan for r in s.sql(
        "EXPLAIN RAW SELECT 1 AS x").collect())
    assert "Project" in raw or "1" in raw
    opt = "\n".join(r.plan for r in s.sql(
        "EXPLAIN OPTIMIZED SELECT l_orderkey FROM lineitem "
        "WHERE l_quantity > 10").collect())
    assert "Filter" in opt


def test_copy_to_statement(spark, tmp_path):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    dest = str(tmp_path / "out")
    s.execute(f"COPY (SELECT r_regionkey, r_name FROM region) TO '{dest}' "
              "WITH (FORMAT PARQUET)")
    back = spark.read.parquet(dest)
    assert back.count() == 5 and set(back.columns) == {"r_regionkey", "r_name"}


def test_as_of_time_travel_on_matview(spark):
    """SELECT ... AS OF reads every retained refresh epoch exactly;
    RETAIN HISTORY compacts epochs out of the window (SinceViolation)."""
    import pytest

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.streaming.history import SinceViolation

    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE tt (k STRING, v BIGINT)")
    s.execute("INSERT INTO tt VALUES ('a', 1)")
    s.execute("CREATE MATERIALIZED VIEW mv_t AS "
              "SELECT k, sum(v) AS total FROM tt GROUP BY k")
    s.execute("INSERT INTO tt VALUES ('a', 10), ('b', 2)")
    s.execute("REFRESH MATERIALIZED VIEW mv_t")
    s.execute("INSERT INTO tt VALUES ('b', 5)")
    s.execute("REFRESH MATERIALIZED VIEW mv_t")

    def rows(df):
        return sorted((r.k, r.total) for r in df.collect())

    assert rows(s.sql("SELECT * FROM mv_t AS OF 0")) == [("a", 1)]
    assert rows(s.sql("SELECT * FROM mv_t AS OF 1")) == [("a", 11), ("b", 2)]
    assert rows(s.sql("SELECT * FROM mv_t AS OF 2")) == [("a", 11), ("b", 7)]
    # current read and newest AS OF agree
    assert rows(s.sql("SELECT * FROM mv_t")) == rows(
        s.sql("SELECT * FROM mv_t AS OF 2"))

    # SUBSCRIBE ... AS OF: updates strictly after the epoch
    delta = s.sql("SUBSCRIBE mv_t AS OF 1").collect()
    assert sorted((r.k, r.total, r.diff) for r in delta) == [
        ("b", 2, -1), ("b", 7, 1)]

    s.execute("ALTER MATERIALIZED VIEW mv_t SET (RETAIN HISTORY FOR 1)")
    with pytest.raises(SinceViolation):
        s.sql("SELECT * FROM mv_t AS OF 0")
    assert rows(s.sql("SELECT * FROM mv_t AS OF 1")) == [("a", 11), ("b", 2)]


def test_mz_catalog_introspection(spark):
    """mz_catalog system relations are queryable with plain SELECTs and
    reflect live DDL state (reference system catalog surface)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE VIEW v_intro AS SELECT r_name FROM region")
    s.execute("CREATE MATERIALIZED VIEW mv_intro AS "
              "SELECT count(*) AS n FROM nation")
    s.execute("CREATE INDEX idx_intro ON orders (o_custkey)")

    views = {r.name for r in s.sql(
        "SELECT name FROM mz_views").collect()}
    assert "v_intro" in views and "mv_intro" not in views
    mvs = {(r.name, r.definition) for r in s.sql(
        "SELECT name, definition FROM mz_materialized_views").collect()}
    assert any(n == "mv_intro" and "nation" in d for n, d in mvs)
    idx = {(r.name, r.key) for r in s.sql(
        "SELECT name, key FROM mz_indexes").collect()}
    assert ("idx_intro", "o_custkey") in idx
    objs = {r.name: r.type for r in s.sql(
        "SELECT name, type FROM mz_objects").collect()}
    assert objs["orders"] == "table"
    assert objs["mv_intro"] == "materialized-view"
    # mz_columns joins against mz_objects like the reference's catalog
    cols = s.sql(
        "SELECT c.name, c.position, c.type FROM mz_columns c "
        "JOIN mz_objects o ON c.id = o.id WHERE o.name = 'region' "
        "ORDER BY c.position").collect()
    assert [r.name for r in cols][:2] == ["r_regionkey", "r_name"]
    # introspection reflects drops
    s.execute("DROP VIEW v_intro")
    views2 = {r.name for r in s.sql("SELECT name FROM mz_views").collect()}
    assert "v_intro" not in views2


def test_show_create_and_show_columns(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE VIEW v_sc AS SELECT r_name FROM region")
    s.execute("CREATE MATERIALIZED VIEW mv_sc AS "
              "SELECT count(*) AS n FROM nation")
    row = s.sql("SHOW CREATE VIEW v_sc").first()
    assert row.name == "v_sc" and row.create_sql.startswith(
        "CREATE VIEW v_sc AS") and "region" in row.create_sql
    row = s.sql("SHOW CREATE MATERIALIZED VIEW mv_sc").first()
    assert "CREATE MATERIALIZED VIEW mv_sc AS" in row.create_sql
    cols = s.sql("SHOW COLUMNS FROM region").collect()
    assert [(r.name, r.type) for r in cols][:2] == [
        ("r_regionkey", "int"), ("r_name", "string")]
