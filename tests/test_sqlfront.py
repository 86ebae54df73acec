"""SQL front-end: dialect rewrites + DDL surface."""

import pytest

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
    # the reference separates the namespaces: SHOW VIEWS excludes
    # materialized views, which have their own SHOW statement
    shown = {r.name for r in sess.execute("SHOW VIEWS").collect()}
    assert "big_orders" in shown and "big_orders_mv" not in shown
    shown_mv = {r.name for r in
                sess.execute("SHOW MATERIALIZED VIEWS").collect()}
    assert "big_orders_mv" in shown_mv
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


def test_create_table_nested_parens(spark):
    """decimal(12,2) next to other columns must not break the column list."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE nt (id int8, bal decimal(12,2), note text)")
    sess.execute("INSERT INTO nt VALUES (1, 3.50, 'a')")
    row = sess.sql("SELECT * FROM nt").first()
    assert (row.id, float(row.bal), row.note) == (1, 3.5, "a")
    schema = {f.name: f.dataType.simpleString()
              for f in sess.catalog.table("nt").schema.fields}
    assert schema["bal"] == "decimal(12,2)"
    sess.execute("DROP TABLE nt")


def test_update_and_delete(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE ud (k int8, v int8)")
    sess.execute("INSERT INTO ud VALUES (1, 10), (2, 20), (3, NULL)")
    # assignments see OLD values; NULL predicate rows untouched
    sess.execute("UPDATE ud SET v = v + k WHERE v >= 10")
    got = {r.k: r.v for r in sess.sql("SELECT * FROM ud").collect()}
    assert got == {1: 11, 2: 22, 3: None}
    # DELETE with NULL predicate keeps the row (PG semantics)
    sess.execute("DELETE FROM ud WHERE v > 20")
    assert {r.k for r in sess.sql("SELECT * FROM ud").collect()} == {1, 3}
    sess.execute("DELETE FROM ud")
    assert sess.sql("SELECT count(*) AS n FROM ud").first().n == 0
    sess.execute("DROP TABLE ud")


def test_strict_division_by_zero(spark):
    """Reference PG semantics: SELECT 1/0 errors (BinaryFunc::Div,
    src/expr/src/scalar/func.rs) instead of returning NULL."""
    import pytest as _pytest
    sess = MzSession(spark, SF_DIR)
    with _pytest.raises(Exception, match="(?i)divi.*zero|DIVIDE_BY_ZERO"):
        sess.sql("SELECT 1/0 AS x").collect()
    # invalid cast also raises under strict mode
    with _pytest.raises(Exception):
        sess.sql("SELECT CAST('abc' AS INT) AS x").collect()
    # lenient opt-out preserves NULL-returning behavior
    lenient = MzSession(spark, SF_DIR, strict_errors=False)
    assert lenient.sql("SELECT 1/0 AS x").first().x is None


def test_wmr_sql_counter(spark):
    sess = MzSession(spark, SF_DIR)
    out = sess.sql("""
        WITH MUTUALLY RECURSIVE
          cnt (n int8) AS (SELECT 1 AS n
                           UNION SELECT n + 1 AS n FROM cnt WHERE n < 4)
        SELECT * FROM cnt
    """)
    assert sorted(r.n for r in out.collect()) == [1, 2, 3, 4]


def test_wmr_sql_mutual_bindings(spark):
    """Two mutually referencing bindings reach the joint fixpoint."""
    sess = MzSession(spark, SF_DIR)
    out = sess.sql("""
        WITH MUTUALLY RECURSIVE
          evens (n int8) AS (SELECT 0 AS n
                             UNION SELECT n + 1 AS n FROM odds WHERE n < 6),
          odds (n int8) AS (SELECT n + 1 AS n FROM evens WHERE n < 6)
        SELECT 'e' AS side, n FROM evens
        UNION ALL SELECT 'o' AS side, n FROM odds
    """)
    rows = {(r.side, r.n) for r in out.collect()}
    assert {n for s, n in rows if s == "e"} == {0, 2, 4, 6}
    assert {n for s, n in rows if s == "o"} == {1, 3, 5}


def test_wmr_binding_does_not_shadow_tables(spark):
    """A WMR binding named like a base table must not clobber the view."""
    sess = MzSession(spark, SF_DIR)
    before = spark.table("nation").count()
    sess.sql("""
        WITH MUTUALLY RECURSIVE
          nation (n int8) AS (SELECT 1 AS n)
        SELECT * FROM nation
    """).collect()
    assert spark.table("nation").count() == before


def test_create_sink_file_roundtrip(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE SINK s1 FROM region INTO FILE '{tmp_path}/r' "
                 f"FORMAT JSON ENVELOPE DEBEZIUM")
    back = spark.read.json(f"{tmp_path}/r")
    assert back.count() == sess.catalog.table("region").count()
    assert "after" in back.columns
    assert sess._sinks["s1"]["envelope"] == "debezium"


def test_webhook_source_roundtrip(spark):
    """CREATE SOURCE ... FROM WEBHOOK: posts become rows of the relation
    (reference src/adapter/src/webhook.rs, statement.rs:52)."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE hooks FROM WEBHOOK BODY FORMAT JSON")
    assert sess.sql("SELECT count(*) AS n FROM hooks").first().n == 0
    sess.webhook("hooks").post({"event": "signup", "user": 7},
                               headers={"x-app": "t1"})
    sess.webhook("hooks").post({"event": "login", "user": 7})
    out = sess.sql("""
        SELECT get_json_object(body, '$.event') AS event,
               headers['x-app'] AS app
        FROM hooks
    """).collect()
    got = {(r.event, r.app) for r in out}
    assert got == {("signup", "t1"), ("login", None)}


def test_subscribe_envelope_sql(spark):
    """SUBSCRIBE ... ENVELOPE UPSERT/DEBEZIUM (KEY (...)) +
    WITHIN TIMESTAMP ORDER BY (reference src/sql/src/plan.rs:907-930)."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE sub_t (k int8, v int8)")
    sess.execute("INSERT INTO sub_t VALUES (1, 10), (2, 20)")
    snap = sess.sql("SUBSCRIBE sub_t ENVELOPE UPSERT (KEY (k))").collect()
    assert {(r.k, r.v) for r in snap} == {(1, 10), (2, 20)}
    # delete key 2, update key 1
    sess.execute("DELETE FROM sub_t WHERE k = 2")
    sess.execute("UPDATE sub_t SET v = 11 WHERE k = 1")
    upd = sess.sql("SUBSCRIBE sub_t ENVELOPE UPSERT (KEY (k))").collect()
    got = {(r.k, r.v) for r in upd}
    assert got == {(1, 11), (2, None)}  # tombstone for the deleted key
    # debezium shape on a fresh subscription state
    sess2 = MzSession(spark, SF_DIR)
    sess2.execute("CREATE TABLE sub_d (k int8, v int8)")
    sess2.execute("INSERT INTO sub_d VALUES (1, 10)")
    sess2.sql("SUBSCRIBE sub_d ENVELOPE DEBEZIUM (KEY (k))").collect()
    sess2.execute("UPDATE sub_d SET v = 99")
    dbz = sess2.sql("SUBSCRIBE sub_d ENVELOPE DEBEZIUM (KEY (k))").collect()
    assert len(dbz) == 1
    assert dbz[0].before.v == 10 and dbz[0].after.v == 99
    # ordered diff presentation
    sess.execute("INSERT INTO sub_t VALUES (0, 1), (9, 2)")
    ordered = sess.sql("SUBSCRIBE sub_t WITHIN TIMESTAMP ORDER BY k").collect()
    ks = [r.k for r in ordered]
    assert ks == sorted(ks)


def test_ddl_with_nested_subquery(spark):
    """DDL whose body contains nested parenthesized subqueries."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("""CREATE VIEW v_sub AS
        SELECT n_name, (SELECT count(*) FROM customer
                        WHERE c_nationkey = n_nationkey) AS n_cust
        FROM nation
        WHERE n_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = (SELECT min(n_regionkey)
                                                   FROM nation))""")
    out = sess.sql("SELECT count(*) AS n FROM v_sub").first()
    assert out.n > 0
    sess.execute("DROP VIEW v_sub")
    sess.execute("""CREATE TABLE t_sub AS
        SELECT * FROM (SELECT o_orderkey, o_totalprice FROM orders
                       WHERE o_totalprice > (SELECT avg(o_totalprice)
                                             FROM orders)) x""")
    assert sess.sql("SELECT count(*) AS n FROM t_sub").first().n > 0
    sess.execute("DROP TABLE t_sub")


def test_copy_from_bulk_append(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE cf (k int8, v string)")
    sess.execute("INSERT INTO cf VALUES (1, 'a')")
    import json
    with open(tmp_path / "in.json", "w") as f:
        f.write(json.dumps({"k": 2, "v": "b"}) + "\n")
        f.write(json.dumps({"k": 3, "v": "c"}) + "\n")
    sess.execute(f"COPY cf FROM '{tmp_path}/in.json' WITH (FORMAT JSON)")
    got = {(r.k, r.v) for r in sess.sql("SELECT * FROM cf").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    sess.execute("DROP TABLE cf")


def test_show_sources_sinks_and_explain_timestamp(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE wh1 FROM WEBHOOK")
    sess.execute(f"CREATE SINK sk1 FROM region INTO FILE '{tmp_path}/s' "
                 f"FORMAT JSON")
    assert [r.name for r in sess.sql("SHOW SOURCES").collect()] == ["wh1"]
    sinks = sess.sql("SHOW SINKS").collect()
    assert [(r.name, r.source, r.envelope) for r in sinks] == \
        [("sk1", "region", "none")]
    # EXPLAIN TIMESTAMP on an MV reports its history frontiers
    sess.execute("CREATE MATERIALIZED VIEW mv_ts AS SELECT 1 AS x")
    sess.execute("REFRESH MATERIALIZED VIEW mv_ts")
    row = sess.sql("EXPLAIN TIMESTAMP FOR mv_ts").first()
    assert row.since == 0 and row.upper == 2 and row.query_timestamp == 1
    sess.execute("DROP VIEW mv_ts")


def test_create_source_format_debezium(spark, tmp_path):
    """FORMAT DEBEZIUM file source: change events consolidate to current
    state (insert k1, insert+update k2, insert+delete k3)."""
    import json
    events = [
        {"before": None, "after": {"k": 1, "v": "a"}, "op": "c"},
        {"before": None, "after": {"k": 2, "v": "b"}, "op": "c"},
        {"before": {"k": 2, "v": "b"}, "after": {"k": 2, "v": "B"}, "op": "u"},
        {"before": None, "after": {"k": 3, "v": "c"}, "op": "c"},
        {"before": {"k": 3, "v": "c"}, "after": None, "op": "d"},
    ]
    with open(tmp_path / "cdc.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    sess = MzSession(spark, SF_DIR)
    sess.execute(f"CREATE SOURCE cdc FROM FILE '{tmp_path}/cdc.json' "
                 f"FORMAT DEBEZIUM")
    got = {(r.k, r.v) for r in sess.sql("SELECT * FROM cdc").collect()}
    assert got == {(1, "a"), (2, "B")}


def test_prepare_execute_deallocate(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("PREPARE topn AS SELECT n_nationkey, n_name FROM nation "
                 "WHERE n_regionkey = $1 ORDER BY n_nationkey LIMIT $2")
    rows = sess.sql("EXECUTE topn(0, 3)").collect()
    assert len(rows) == 3 and all(r.n_nationkey is not None for r in rows)
    one = sess.sql("EXECUTE topn(1, 1)").collect()
    assert len(one) == 1
    sess.execute("DEALLOCATE topn")
    assert "topn" not in sess._prepared


def test_declare_fetch_close(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("DECLARE c1 CURSOR FOR SELECT n_nationkey FROM nation "
                 "ORDER BY n_nationkey")
    first = [r.n_nationkey for r in sess.sql("FETCH 10 FROM c1").collect()]
    assert first == list(range(10))
    nxt = [r.n_nationkey for r in sess.sql("FETCH 5 c1").collect()]
    assert nxt == list(range(10, 15))
    rest = sess.sql("FETCH ALL c1").collect()
    assert len(rest) == 10  # 25 nations total
    assert sess.sql("FETCH 5 c1").count() == 0  # drained
    sess.execute("CLOSE c1")
    assert "c1" not in sess._cursors


def test_transaction_commit_and_rollback(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE txn_t (k int8)")
    sess.execute("INSERT INTO txn_t VALUES (1)")
    sess.execute("BEGIN")
    sess.execute("INSERT INTO txn_t VALUES (2)")
    sess.execute("UPDATE txn_t SET k = k * 10 WHERE k = 1")
    assert {r.k for r in sess.sql("SELECT * FROM txn_t").collect()} == {10, 2}
    sess.execute("ROLLBACK")
    assert {r.k for r in sess.sql("SELECT * FROM txn_t").collect()} == {1}
    sess.execute("BEGIN")
    sess.execute("DELETE FROM txn_t")
    sess.execute("COMMIT")
    assert sess.sql("SELECT count(*) AS n FROM txn_t").first().n == 0
    sess.execute("DROP TABLE txn_t")


def test_alter_rename(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE rn_old (k int8)")
    sess.execute("INSERT INTO rn_old VALUES (7)")
    sess.execute("ALTER TABLE rn_old RENAME TO rn_new")
    assert sess.sql("SELECT k FROM rn_new").first().k == 7
    sess.execute("CREATE VIEW rv_old AS SELECT 1 AS x")
    sess.execute("ALTER VIEW rv_old RENAME TO rv_new")
    assert sess.sql("SELECT x FROM rv_new").first().x == 1


def test_secrets_connections_show_like_table(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SECRET kafka_pw AS 's3cr3t'")
    sess.execute("CREATE CONNECTION kc TO KAFKA "
                 "(BROKER 'host:9092', PASSWORD SECRET kafka_pw)")
    assert [r.name for r in sess.sql("SHOW SECRETS").collect()] == ["kafka_pw"]
    conns = sess.sql("SHOW CONNECTIONS").collect()
    assert [(r.name, r.type) for r in conns] == [("kc", "kafka")]
    # secret resolved into the connection, never echoed by SHOW
    assert sess._connections["kc"]["password"] == "s3cr3t"
    assert sess._connections["kc"]["broker"] == "host:9092"
    # SHOW ... LIKE patterns
    sess.execute("CREATE VIEW like_a AS SELECT 1 AS x")
    sess.execute("CREATE VIEW like_b AS SELECT 2 AS x")
    sess.execute("CREATE VIEW other_v AS SELECT 3 AS x")
    got = [r.name for r in sess.sql("SHOW VIEWS LIKE 'like%'").collect()]
    assert got == ["like_a", "like_b"]
    # TABLE t shorthand
    assert sess.sql("TABLE nation").count() == 25


def test_wmr_recursion_limit(spark):
    """RETURN AT RECURSION LIMIT n yields the state at iteration n
    (reference with_mutually_recursive.slt:39 non-erroring form)."""
    sess = MzSession(spark, SF_DIR)
    out = sess.sql("""
        WITH MUTUALLY RECURSIVE (RETURN AT RECURSION LIMIT 3)
          cnt (n int8) AS (SELECT 1 AS n
                           UNION SELECT n + 1 AS n FROM cnt WHERE n < 100)
        SELECT max(n) AS m FROM cnt
    """)
    # bindings start EMPTY; iteration k yields {1..k} → limit 3 gives 3
    assert out.first().m == 3


def test_subscribe_as_of_up_to(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE MATERIALIZED VIEW upto_mv AS SELECT 1 AS x")
    for _ in range(3):
        sess.execute("REFRESH MATERIALIZED VIEW upto_mv")
    # epochs 0..3 recorded; AS OF 0 UP TO 2 sees only epoch-1 updates
    rows = sess.sql("SUBSCRIBE upto_mv AS OF 0 UP TO 2").collect()
    assert all(0 < r.mz_timestamp < 2 for r in rows)
    unbounded = sess.sql("SUBSCRIBE upto_mv AS OF 0").collect()
    assert len(unbounded) >= len(rows)
    sess.execute("DROP VIEW upto_mv")


def test_drop_semantics_and_if_not_exists(spark):
    import pytest as _pytest
    sess = MzSession(spark, SF_DIR)
    with _pytest.raises(KeyError):
        sess.execute("DROP TABLE never_existed")
    sess.execute("DROP TABLE IF EXISTS never_existed")  # no-op
    sess.execute("CREATE TABLE ine (k int8)")
    sess.execute("INSERT INTO ine VALUES (1)")
    sess.execute("CREATE TABLE IF NOT EXISTS ine (k int8)")  # keeps data
    assert sess.sql("SELECT count(*) AS n FROM ine").first().n == 1
    sess.execute("DROP TABLE ine")


def test_run_script_multi_statement(spark):
    sess = MzSession(spark, SF_DIR)
    results = sess.run_script("""
        CREATE TABLE scr (k int8, s text);
        INSERT INTO scr VALUES (1, 'a;b');
        UPDATE scr SET s = 'x;y' WHERE k = 1;
        SELECT k, s FROM scr;
        DROP TABLE scr
    """)
    assert results[0] is None and results[1] is None
    row = results[3].first()
    assert (row.k, row.s) == (1, "x;y")  # ';' inside literals survives


def test_mz_sources_sinks_introspection(spark, tmp_path):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE SOURCE wh_i FROM WEBHOOK")
    sess.execute(f"CREATE SINK sk_i FROM region INTO FILE '{tmp_path}/s' "
                 f"FORMAT JSON ENVELOPE UPSERT")
    srcs = [(r.name, r.type) for r in
            sess.sql("SELECT name, type FROM mz_sources").collect()]
    assert srcs == [("wh_i", "webhook")]
    sinks = [(r.name, r.source, r.envelope) for r in
             sess.sql("SELECT name, source, envelope FROM mz_sinks").collect()]
    assert sinks == [("sk_i", "region", "upsert")]


def test_mz_arrangement_sizes_introspection(spark):
    sess = MzSession(spark, SF_DIR)
    rows = {r.name: r for r in sess.execute(
        "SELECT * FROM mz_arrangement_sizes ORDER BY name").collect()}
    # base arrangements carry their dominant join key and decoded size
    assert "lineitem" in rows
    li = rows["lineitem"]
    assert li.kind == "base" and li.key == "l_orderkey"
    assert li.size_bytes and li.size_bytes > 0
    # CREATE INDEX arrangements appear with their declared key
    sess.execute("CREATE INDEX nat_idx ON nation (n_nationkey)")
    rows2 = {r.name: r for r in sess.execute(
        "SELECT * FROM mz_arrangement_sizes").collect()}
    assert rows2["nat_idx"].kind == "create_index"
    assert rows2["nat_idx"].key == "n_nationkey"


def test_show_materialized_views(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE VIEW just_a_view AS SELECT 1 AS x")
    sess.execute("CREATE MATERIALIZED VIEW mv_show_test AS "
                 "SELECT count(*) AS n FROM nation")
    mvs = [r.name for r in
           sess.execute("SHOW MATERIALIZED VIEWS").collect()]
    assert "mv_show_test" in mvs and "just_a_view" not in mvs
    views = [r.name for r in sess.execute("SHOW VIEWS").collect()]
    assert "just_a_view" in views and "mv_show_test" not in views
    liked = [r.name for r in sess.execute(
        "SHOW MATERIALIZED VIEWS LIKE 'mv%'").collect()]
    assert liked == ["mv_show_test"]


def test_refresh_every_schedule(spark):
    import time

    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE rev_src (v BIGINT)")
    sess.execute("INSERT INTO rev_src VALUES (1)")
    sess.execute("CREATE MATERIALIZED VIEW rev_mv "
                 "WITH (REFRESH EVERY '1 hour') AS "
                 "SELECT sum(v) AS total FROM rev_src")
    assert sess.execute("SELECT total FROM rev_mv").collect()[0].total == 1
    sess.execute("INSERT INTO rev_src VALUES (10)")
    # not due yet: the MV holds its last refresh, and a tick is a no-op
    assert sess.tick_refreshes() == []
    assert sess.execute("SELECT total FROM rev_mv").collect()[0].total == 1
    # advance past the period: the tick refreshes it
    due = time.monotonic() + 3601
    assert sess.tick_refreshes(now=due) == ["rev_mv"]
    assert sess.execute("SELECT total FROM rev_mv").collect()[0].total == 11
    # immediately after, nothing is due again
    assert sess.tick_refreshes(now=due + 1) == []


def test_refresh_every_interval_parsing():
    from materialize_spark.plans.parser import _interval_seconds
    assert _interval_seconds("1 hour") == 3600.0
    assert _interval_seconds("30 seconds") == 30.0
    assert _interval_seconds("1 hour 30 minutes") == 5400.0
    assert _interval_seconds("2 days") == 172800.0
    import pytest as _pt
    with _pt.raises(ValueError):
        _interval_seconds("fortnight")


def test_drop_clears_refresh_schedule_and_sub_state(spark):
    import time

    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE drop_src (v BIGINT)")
    sess.execute("INSERT INTO drop_src VALUES (1)")
    sess.execute("CREATE MATERIALIZED VIEW drop_mv "
                 "WITH (REFRESH EVERY '1 second') AS "
                 "SELECT sum(v) AS total FROM drop_src")
    sess.execute("SUBSCRIBE drop_mv")  # seeds subscription state
    sess.execute("DROP VIEW drop_mv")
    # a tick after the drop must not try to refresh the dropped MV
    assert sess.tick_refreshes(now=time.monotonic() + 10) == []
    assert "drop_mv" not in sess._exec_subs
    assert not any(s["node"].name == "drop_mv"
                   for s in sess._subscriptions.values())


def test_rename_migrates_mv_state(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE ren_src (v BIGINT)")
    sess.execute("INSERT INTO ren_src VALUES (1)")
    sess.execute("CREATE MATERIALIZED VIEW ren_mv AS "
                 "SELECT sum(v) AS total FROM ren_src")
    sess.execute("ALTER MATERIALIZED VIEW ren_mv RENAME TO ren_mv2")
    assert sess.execute("SELECT total FROM ren_mv2").collect()[0].total == 1
    # REFRESH works under the new name (definition followed the rename)
    sess.execute("INSERT INTO ren_src VALUES (9)")
    sess.execute("REFRESH MATERIALIZED VIEW ren_mv2")
    assert sess.execute("SELECT total FROM ren_mv2").collect()[0].total == 10
    assert "ren_mv" not in sess._matview_sql


def test_alter_table_add_column(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE addcol_t (k BIGINT)")
    sess.execute("INSERT INTO addcol_t VALUES (1), (2)")
    sess.execute("ALTER TABLE addcol_t ADD COLUMN note TEXT")
    rows = sess.execute(
        "SELECT k, note FROM addcol_t ORDER BY k").collect()
    assert [(r.k, r.note) for r in rows] == [(1, None), (2, None)]
    sess.execute("INSERT INTO addcol_t VALUES (3, 'hi')")
    got = {r.k: r.note for r in
           sess.execute("SELECT * FROM addcol_t").collect()}
    assert got == {1: None, 2: None, 3: "hi"}
    import pytest as _pt
    with _pt.raises(ValueError, match="already exists"):
        sess.execute("ALTER TABLE addcol_t ADD COLUMN note TEXT")


def test_comment_on_and_mz_comments(spark):
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE cm_t (k BIGINT)")
    sess.execute("COMMENT ON TABLE cm_t IS 'the key table'")
    sess.execute("COMMENT ON COLUMN cm_t.k IS 'the key'")
    got = {(r.object_type, r.name): r.comment for r in sess.execute(
        "SELECT * FROM mz_comments").collect()}
    assert got == {("table", "cm_t"): "the key table",
                   ("column", "cm_t.k"): "the key"}
    sess.execute("COMMENT ON TABLE cm_t IS NULL")
    left = [r.name for r in
            sess.execute("SELECT * FROM mz_comments").collect()]
    assert left == ["cm_t.k"]


def test_comment_lifecycle_drop_and_rename(spark):
    """Comments follow the object id (ADVICE r5): DROP takes the
    object's and its columns' comments with it; ALTER RENAME migrates
    them like every other per-object store."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE cml_t (k BIGINT)")
    sess.execute("COMMENT ON TABLE cml_t IS 'obj'")
    sess.execute("COMMENT ON COLUMN cml_t.k IS 'col'")
    sess.execute("ALTER TABLE cml_t RENAME TO cml_u")
    got = {r.name: r.comment for r in sess.execute(
        "SELECT * FROM mz_comments WHERE name LIKE 'cml%'").collect()}
    assert got == {"cml_u": "obj", "cml_u.k": "col"}
    sess.execute("DROP TABLE cml_u")
    assert sess.execute(
        "SELECT * FROM mz_comments WHERE name LIKE 'cml%'").count() == 0


def test_explain_analyze_metrics(spark):
    sess = MzSession(spark, SF_DIR)
    rows = sess.execute(
        "EXPLAIN ANALYZE SELECT n_regionkey, count(*) AS n "
        "FROM nation GROUP BY n_regionkey").collect()
    ops = {r.operator for r in rows}
    assert any("HashAggregate" in o for o in ops)
    out = [r for r in rows if r.metric == "numOutputRows"
           and "HashAggregate" in r.operator]
    # the final aggregate emitted exactly the 5 region groups
    assert any(r.value == 5 for r in out)


def test_pg_catalog_compat(spark):
    """pg_catalog shim: pg_class/pg_namespace/pg_attribute/pg_tables/
    pg_views/pg_description — enough for PG tooling introspection,
    including the obj_description/col_description join shape."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE pgt (a BIGINT NOT NULL, b TEXT)")
    sess.execute("CREATE VIEW pgv AS SELECT a FROM pgt")
    sess.execute("COMMENT ON TABLE pgt IS 'tbl doc'")
    sess.execute("COMMENT ON COLUMN pgt.b IS 'col doc'")
    cls = {r.relname: r.relkind for r in sess.execute(
        "SELECT relname, relkind FROM pg_class "
        "WHERE relname IN ('pgt','pgv')").collect()}
    assert cls == {"pgt": "r", "pgv": "v"}
    ns = {r.nspname for r in sess.execute(
        "SELECT nspname FROM pg_namespace").collect()}
    assert {"public", "pg_catalog"} <= ns
    atts = sess.execute(
        "SELECT a.attname, a.attnum, a.attnotnull FROM pg_attribute a "
        "JOIN pg_class c ON a.attrelid = c.oid "
        "WHERE c.relname = 'pgt' ORDER BY a.attnum").collect()
    assert [(r.attname, r.attnum) for r in atts] == [("a", 1), ("b", 2)]
    assert atts[0].attnotnull is True and atts[1].attnotnull is False
    assert [r.tablename for r in sess.execute(
        "SELECT tablename FROM pg_tables WHERE tablename='pgt'"
    ).collect()] == ["pgt"]
    assert [r.viewname for r in sess.execute(
        "SELECT viewname FROM pg_views WHERE viewname='pgv'"
    ).collect()] == ["pgv"]
    # obj_description / col_description join shape over pg_description
    tbl_doc = sess.execute(
        "SELECT d.description FROM pg_description d "
        "JOIN pg_class c ON d.objoid = c.oid "
        "WHERE c.relname = 'pgt' AND d.objsubid = 0").collect()
    assert [r.description for r in tbl_doc] == ["tbl doc"]
    col_doc = sess.execute(
        "SELECT d.description FROM pg_description d "
        "JOIN pg_class c ON d.objoid = c.oid "
        "JOIN pg_attribute a ON a.attrelid = c.oid "
        " AND a.attnum = d.objsubid "
        "WHERE c.relname = 'pgt' AND a.attname = 'b'").collect()
    assert [r.description for r in col_doc] == ["col doc"]


def test_pg_system_information_functions(spark):
    """System-information tail (reference pg-compat builtins): pg_typeof,
    format_type, obj_description/col_description, current_user/schema(s),
    pg_table_is_visible."""
    sess = MzSession(spark, SF_DIR)
    sess.execute("CREATE TABLE sysi_t (a BIGINT, b TEXT)")
    sess.execute("COMMENT ON TABLE sysi_t IS 'sys doc'")
    sess.execute("COMMENT ON COLUMN sysi_t.b IS 'b doc'")
    r = sess.sql(
        "SELECT pg_typeof(1::int4) AS t_int, pg_typeof(1.5::float8) AS t_f,"
        " pg_typeof('x') AS t_s, pg_typeof(1.5::numeric) AS t_n,"
        " current_user AS cu, current_schema AS cs,"
        " current_schemas(true) AS css,"
        " format_type(23, NULL) AS ft_int,"
        " format_type(1043, NULL) AS ft_vc").first()
    assert r.t_int == "integer" and r.t_f == "double precision"
    assert r.t_s == "text" and r.t_n == "numeric"
    assert r.cu == "materialize" and r.cs == "public"
    assert "pg_catalog" in r.css and "public" in r.css
    assert r.ft_int == "integer" and r.ft_vc == "character varying"
    # description functions join through pg_class/pg_description
    d = sess.sql(
        "SELECT obj_description(c.oid) AS od,"
        " col_description(c.oid, 2) AS cd,"
        " pg_table_is_visible(c.oid) AS vis"
        " FROM pg_class c WHERE c.relname = 'sysi_t'").first()
    assert d.od == "sys doc" and d.cd == "b doc" and d.vis is True


def test_session_variables(spark):
    """SET/SHOW session variables (reference vars.rs): known names set
    and read back; unknown names error like PG."""
    import pytest as _pt
    sess = MzSession(spark, SF_DIR)
    assert sess.sql("SHOW transaction_isolation").first()[0] \
        == "strict serializable"
    sess.execute("SET application_name = 'etl-job'")
    assert sess.sql("SHOW application_name").first()[0] == "etl-job"
    sess.execute("SET search_path TO 'public'")
    assert sess.sql("SHOW search_path").first()[0] == "public"
    with _pt.raises(KeyError, match="unrecognized"):
        sess.execute("SET nonsense_parameter = 1")
    with _pt.raises(KeyError, match="unrecognized"):
        sess.execute("SHOW nonsense_parameter")
    # timezone SET flows through to the engine conf
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        sess.execute("SET timezone = 'UTC'")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_show_all_and_reset(spark):
    """SHOW ALL lists every variable with its description; RESET <var>
    and RESET ALL restore defaults (reference ShowAllStatement /
    ResetVariableStatement, vars.rs)."""
    import pytest as _pt
    sess = MzSession(spark, SF_DIR)
    rows = {r.name: (r.setting, r.description)
            for r in sess.sql("SHOW ALL").collect()}
    assert rows["cluster"][0] == "quickstart"
    assert "search order" in rows["search_path"][1]
    assert set(rows) == set(MzSession.VAR_DEFAULTS)
    sess.execute("SET application_name = 'abc'")
    sess.execute("RESET application_name")
    assert sess.sql("SHOW application_name").first()[0] == ""
    with _pt.raises(KeyError, match="unrecognized"):
        sess.execute("RESET nonsense_parameter")
    sess.execute("SET application_name = 'abc'")
    sess.execute("SET statement_timeout = '5s'")
    sess.execute("RESET ALL")
    assert sess.sql("SHOW application_name").first()[0] == ""
    assert sess.sql("SHOW statement_timeout").first()[0] == "0"
    # RESET ROLE still routes to the role path
    sess.execute("RESET ROLE")


def test_alter_system_set_and_reset(spark):
    """ALTER SYSTEM SET moves the default layer: sessions that did not
    explicitly SET the name observe it, an explicit session SET wins,
    and ALTER SYSTEM RESET restores the built-in (vars.rs precedence:
    session > system > default)."""
    import pytest as _pt
    sess = MzSession(spark, SF_DIR)
    sess.execute("ALTER SYSTEM SET statement_timeout = '30s'")
    assert sess.sql("SHOW statement_timeout").first()[0] == "30s"
    # a session-level SET shadows the system value...
    sess.execute("SET statement_timeout = '5s'")
    sess.execute("ALTER SYSTEM SET statement_timeout = '60s'")
    assert sess.sql("SHOW statement_timeout").first()[0] == "5s"
    # ...and RESET falls back to the system layer, not the built-in
    sess.execute("RESET statement_timeout")
    assert sess.sql("SHOW statement_timeout").first()[0] == "60s"
    sess.execute("ALTER SYSTEM RESET statement_timeout")
    assert sess.sql("SHOW statement_timeout").first()[0] == "0"
    with _pt.raises(KeyError, match="unrecognized"):
        sess.execute("ALTER SYSTEM SET nonsense_parameter = 1")
    # superuser-only, like the reference's system vars
    sess.execute("CREATE ROLE analyst")
    sess.execute("SET ROLE analyst")
    try:
        with _pt.raises(PermissionError, match="superuser"):
            sess.execute("ALTER SYSTEM SET statement_timeout = '1s'")
    finally:
        sess.execute("RESET ROLE")


def test_max_result_size_enforced(spark):
    """max_result_size bounds collected results (reference vars.rs
    max_result_size; the coordinator rejects oversized peeks)."""
    import pytest as _pt
    sess = MzSession(spark, SF_DIR)
    rows = sess.sql("SELECT n_name FROM nation").collect()
    assert sess.check_result_size(rows) is rows  # default 1GB: fine
    sess.execute("SET max_result_size = '16'")
    with _pt.raises(ValueError, match="exceeds max size"):
        sess.check_result_size(rows)
    # suffixed values parse (vars.rs ByteSize forms)
    sess.execute("SET max_result_size = '1MB'")
    assert sess.check_result_size(rows) is rows


# -- clusters (compute pools) ----------------------------------------------
def test_cluster_lifecycle(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE CLUSTER compute (SIZE '400cc', REPLICATION FACTOR 2)")
    rows = {r.name: (r.size, r.replicas)
            for r in s.execute("SHOW CLUSTERS").collect()}
    assert rows["quickstart"] == ("1", 1)
    assert rows["compute"] == ("400cc", 2)
    reps = [(r.cluster, r.replica) for r in
            s.execute("SHOW CLUSTER REPLICAS").collect()]
    assert ("compute", "r1") in reps and ("compute", "r2") in reps
    s.execute("CREATE CLUSTER REPLICA compute.r3 (SIZE '800cc')")
    reps = [(r.cluster, r.replica, r.size) for r in
            s.execute("SHOW CLUSTER REPLICAS").collect()]
    assert ("compute", "r3", "800cc") in reps
    s.execute("DROP CLUSTER REPLICA compute.r3")
    # SET cluster routes queries to the pool; unknown cluster errors
    s.execute("SET cluster = compute")
    assert s.sql("SHOW cluster").first()[0] == "compute"
    assert s.sql("SELECT count(*) AS n FROM region").first().n == 5
    assert spark.sparkContext.getLocalProperty(
        "spark.scheduler.pool") == "compute"
    with pytest.raises(KeyError, match="unknown cluster"):
        s.execute("SET cluster = nope")
    # the active cluster cannot be dropped; others can
    with pytest.raises(PermissionError, match="active cluster"):
        s.execute("DROP CLUSTER compute")
    s.execute("SET cluster = quickstart")
    s.execute("DROP CLUSTER compute")
    assert "compute" not in {
        r.name for r in s.execute("SHOW CLUSTERS").collect()}


def test_mz_clusters_introspection(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE CLUSTER serving (SIZE '100cc')")
    got = {r.name: r.replication_factor for r in s.sql(
        "SELECT name, replication_factor FROM mz_clusters").collect()}
    assert got["serving"] == 1 and "quickstart" in got
    reps = s.sql("SELECT cluster, name FROM mz_cluster_replicas "
                 "WHERE cluster = 'serving'").collect()
    assert [(r.cluster, r.name) for r in reps] == [("serving", "r1")]


def test_show_objects_lists_all_kinds(spark):
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE TABLE so_t (x BIGINT)")
    s.execute("CREATE VIEW so_v AS SELECT 1 AS one")
    s.execute("CREATE MATERIALIZED VIEW so_mv AS SELECT 2 AS two")
    got = {r.name: r.type for r in s.execute("SHOW OBJECTS").collect()}
    assert got["so_t"] == "table"
    assert got["so_v"] == "view"
    assert got["so_mv"] == "materialized-view"
    assert got["region"] == "table"  # base tables included


def test_alter_cluster(spark):
    s = MzSession(spark, "/root/testdata/sf0.001")
    s.execute("CREATE CLUSTER elastic (SIZE '100cc', REPLICATION FACTOR 1)")
    s.execute("ALTER CLUSTER elastic SET (REPLICATION FACTOR 3)")
    reps = [r.replica for r in s.execute("SHOW CLUSTER REPLICAS").collect()
            if r.cluster == "elastic"]
    assert reps == ["r1", "r2", "r3"]
    s.execute("ALTER CLUSTER elastic SET (SIZE '400cc', "
              "REPLICATION FACTOR 1)")
    rows = {r.name: (r.size, r.replicas)
            for r in s.execute("SHOW CLUSTERS").collect()}
    assert rows["elastic"] == ("400cc", 1)
    with pytest.raises(KeyError, match="unknown cluster"):
        s.execute("ALTER CLUSTER nope SET (SIZE '1')")


def test_show_objects_includes_sources_and_secrets(spark):
    """SHOW OBJECTS lists sources and secrets (reference mz_objects spans
    all object kinds; round-7 ADVICE)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute(f"CREATE SOURCE objsrc FROM FILE '{SF_DIR}/region.parquet' "
              "FORMAT PARQUET")
    s.execute("CREATE SECRET objsec AS 'hunter2'")
    kinds = {r.name: r.type for r in s.execute("SHOW OBJECTS").collect()}
    assert kinds.get("objsrc") == "source"
    assert kinds.get("objsec") == "secret"


def test_cluster_replicas_have_distinct_ids(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE CLUSTER c1 (SIZE '2', REPLICATION FACTOR 2)")
    s.execute("CREATE CLUSTER c2 (SIZE '1', REPLICATION FACTOR 2)")
    rows = s.sql("SELECT cluster_id, cluster, name "
                 "FROM mz_cluster_replicas").collect()
    ids = [r.cluster_id for r in rows]
    assert len(ids) == len(set(ids)) >= 4


def test_wmr_materialized_view_snapshot_and_refresh(spark):
    """A recursive MATERIALIZED VIEW works with snapshot semantics: the
    fixpoint re-runs on REFRESH (batch-only WMR, SURVEY §2.8.9)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE wmr_edges (src BIGINT, dst BIGINT)")
    s.execute("INSERT INTO wmr_edges VALUES (1, 2), (2, 3)")
    s.execute("""
        CREATE MATERIALIZED VIEW wmr_reach AS
        WITH MUTUALLY RECURSIVE
          reach (src int8, dst int8) AS (
            SELECT src, dst FROM wmr_edges
            UNION
            SELECT r.src AS src, e.dst AS dst
            FROM reach r JOIN wmr_edges e ON r.dst = e.src)
        SELECT * FROM reach
    """)
    got = {(r.src, r.dst) for r in s.sql("SELECT * FROM wmr_reach"
                                         ).collect()}
    assert got == {(1, 2), (2, 3), (1, 3)}
    # snapshot: a base update shows up only after REFRESH
    s.execute("INSERT INTO wmr_edges VALUES (3, 4)")
    assert {(r.src, r.dst) for r in s.sql(
        "SELECT * FROM wmr_reach").collect()} == got
    s.execute("REFRESH MATERIALIZED VIEW wmr_reach")
    got2 = {(r.src, r.dst) for r in s.sql("SELECT * FROM wmr_reach"
                                          ).collect()}
    assert (1, 4) in got2 and (3, 4) in got2


def test_wmr_streaming_mv_clean_error(spark):
    """REFRESH EVERY (scheduled/streaming maintenance) of a recursive
    view errors explicitly instead of going silently stale."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    with pytest.raises(ValueError, match="MUTUALLY RECURSIVE.*not "
                                         "supported"):
        s.execute("""
            CREATE MATERIALIZED VIEW wmr_bad
            WITH (REFRESH EVERY '10 seconds') AS
            WITH MUTUALLY RECURSIVE
              c (n int8) AS (SELECT 1 AS n UNION
                             SELECT n + 1 AS n FROM c WHERE n < 3)
            SELECT * FROM c
        """)


def test_wmr_plain_view_clean_error(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    with pytest.raises(ValueError, match="MATERIALIZED"):
        s.execute("""
            CREATE VIEW wmr_v AS
            WITH MUTUALLY RECURSIVE
              c (n int8) AS (SELECT 1 AS n)
            SELECT * FROM c
        """)


def test_delta_maintained_mv_always_fresh(spark):
    """WITH (MAINTENANCE 'delta'): the MV updates on WRITE — no REFRESH
    — through insert, update, and delete, including threshold crossings
    in both directions (streaming/delta_ivm at the SQL surface)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dmv_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO dmv_t VALUES ('a', 6), ('a', 6), ('b', 4)")
    s.execute("CREATE MATERIALIZED VIEW dmv WITH (MAINTENANCE 'delta') "
              "AS SELECT k, SUM(v) AS total FROM dmv_t "
              "GROUP BY k HAVING SUM(v) > 10")

    def rows():
        return sorted((r.k, r.total) for r in
                      s.sql("SELECT * FROM dmv").collect())

    assert rows() == [("a", 12)]
    # NO refresh between any of these — always fresh
    s.execute("INSERT INTO dmv_t VALUES ('b', 8)")
    assert rows() == [("a", 12), ("b", 12)]
    s.execute("DELETE FROM dmv_t WHERE k = 'a' AND v = 6")
    # one of the two (a,6) rows is gone? DELETE removes BOTH matching
    # rows (predicate semantics), so 'a' drops below the threshold
    assert rows() == [("b", 12)]
    s.execute("UPDATE dmv_t SET v = v + 100 WHERE k = 'b' AND v = 4")
    assert rows() == [("b", 112)]
    # REFRESH is a harmless no-op
    s.execute("REFRESH MATERIALIZED VIEW dmv")
    assert rows() == [("b", 112)]
    # SUBSCRIBE sees the maintained diffs
    delta = s.sql("SUBSCRIBE dmv").collect()
    assert sorted((r.k, r.total, r.diff) for r in delta)[-1][0] == "b"


def test_delta_mv_where_clause_and_drop(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dmv2_t (k STRING, v BIGINT, ok BOOLEAN)")
    s.execute("CREATE MATERIALIZED VIEW dmv2 WITH (MAINTENANCE 'delta') "
              "AS SELECT k, SUM(v) AS total FROM dmv2_t "
              "WHERE ok GROUP BY k HAVING SUM(v) > 5")
    s.execute("INSERT INTO dmv2_t VALUES ('x', 10, true), "
              "('x', 99, false)")  # the false row must not count
    got = [(r.k, r.total) for r in s.sql("SELECT * FROM dmv2").collect()]
    assert got == [("x", 10)]
    s.execute("DROP VIEW dmv2")
    assert "dmv2" not in {r.name for r in
                          s.execute("SHOW MATERIALIZED VIEWS").collect()}


def test_delta_mv_unsupported_shape_errors(spark):
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dmv3_t (k STRING, v BIGINT)")
    # a grouped count with no HAVING is now the multi-aggregate shape —
    # a join is still out of scope and must error explicitly
    with pytest.raises(ValueError, match="MAINTENANCE .delta."):
        s.execute("CREATE MATERIALIZED VIEW bad WITH "
                  "(MAINTENANCE 'delta') AS "
                  "SELECT a.k, count(*) AS n FROM dmv3_t a JOIN "
                  "dmv3_t b ON a.k = b.k GROUP BY a.k")
    # collection-valued aggregates (array_agg etc.) stay out of scope
    with pytest.raises(ValueError, match="MAINTENANCE .delta."):
        s.execute("CREATE MATERIALIZED VIEW bad3 WITH "
                  "(MAINTENANCE 'delta') AS "
                  "SELECT k, array_agg(v) AS n FROM dmv3_t "
                  "GROUP BY k")
    with pytest.raises(ValueError, match="unknown MAINTENANCE"):
        s.execute("CREATE MATERIALIZED VIEW bad2 WITH "
                  "(MAINTENANCE 'magic') AS SELECT 1 AS x")


def test_delta_mv_count_star(spark):
    """COUNT(*) thresholds maintain the same way (every row weighs 1)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dmvc_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW dmvc WITH (MAINTENANCE 'delta') "
              "AS SELECT k, COUNT(*) AS n FROM dmvc_t "
              "GROUP BY k HAVING COUNT(*) > 2")
    s.execute("INSERT INTO dmvc_t VALUES ('a', 1), ('a', 2), ('b', 1)")
    assert s.sql("SELECT * FROM dmvc").count() == 0
    s.execute("INSERT INTO dmvc_t VALUES ('a', 3)")
    got = [(r.k, r.n) for r in s.sql("SELECT * FROM dmvc").collect()]
    assert got == [("a", 3)]
    s.execute("DELETE FROM dmvc_t WHERE k = 'a' AND v = 1")
    assert s.sql("SELECT * FROM dmvc").count() == 0
    # mismatched aggregates error
    with pytest.raises(ValueError, match="repeat the SELECT aggregate"):
        s.execute("CREATE MATERIALIZED VIEW dmvx WITH "
                  "(MAINTENANCE 'delta') AS SELECT k, SUM(v) AS t "
                  "FROM dmvc_t GROUP BY k HAVING COUNT(*) > 1")


@pytest.mark.soak
def test_delta_mv_random_write_soak_equals_recompute(spark):
    """Property soak: 20 random INSERT/UPDATE/DELETE statements against
    a delta-maintained MV; after EVERY statement the maintained result
    must equal re-running the view SQL over the table (incremental ==
    recompute, the defining IVM property, at the SQL surface)."""
    import random

    from materialize_spark.plans.sqlfront import MzSession
    rng = random.Random(29)
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE soak_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW soak_mv WITH "
              "(MAINTENANCE 'delta') AS SELECT k, SUM(v) AS total "
              "FROM soak_t GROUP BY k HAVING SUM(v) > 20")
    keys = ["a", "b", "c", "d"]
    for step in range(20):
        op = rng.random()
        k = rng.choice(keys)
        if op < 0.6:
            vals = ", ".join(f"('{rng.choice(keys)}', "
                             f"{rng.randrange(1, 15)})"
                             for _ in range(rng.randrange(1, 4)))
            s.execute(f"INSERT INTO soak_t VALUES {vals}")
        elif op < 0.8:
            s.execute(f"UPDATE soak_t SET v = v + "
                      f"{rng.randrange(-5, 6)} WHERE k = '{k}'")
        else:
            s.execute(f"DELETE FROM soak_t WHERE k = '{k}' "
                      f"AND v % 3 = {rng.randrange(3)}")
        got = sorted((r.k, r.total) for r in
                     s.sql("SELECT * FROM soak_mv").collect())
        want = sorted((r.k, r.total) for r in s.sql(
            "SELECT k, SUM(v) AS total FROM soak_t "
            "GROUP BY k HAVING SUM(v) > 20").collect())
        assert got == want, f"diverged at step {step}"


# -- role membership / ownership administration (round 8) --------------------

def test_role_membership_inheritance(spark):
    """GRANT <role> TO <member> confers privileges transitively
    (reference GrantRoleStatement + rbac.rs role graph)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE memb_t AS SELECT r_regionkey FROM region")
    for r in ("m_eng", "m_dev", "m_intern", "m_lone"):
        s.execute(f"CREATE ROLE {r}")
    s.execute("GRANT SELECT ON memb_t TO m_eng")
    s.execute("GRANT m_eng TO m_dev")
    s.execute("GRANT m_dev TO m_intern")

    def can(role):
        s.execute(f"SET ROLE {role}")
        try:
            s.sql("SELECT count(*) AS n FROM memb_t").collect()
            return True
        except PermissionError:
            return False
        finally:
            s.execute("RESET ROLE")

    assert can("m_dev")            # direct member
    assert can("m_intern")         # transitive member
    assert not can("m_lone")       # no membership
    # REVOKE severs the chain
    s.execute("REVOKE m_eng FROM m_dev")
    assert not can("m_dev") and not can("m_intern")
    # circular membership rejected like PG
    s.execute("GRANT m_eng TO m_dev")
    with pytest.raises(ValueError):
        s.execute("GRANT m_dev TO m_eng")
    with pytest.raises(ValueError):
        s.execute("GRANT m_eng TO m_eng")
    # introspection
    rows = {(r.role, r.member)
            for r in s.sql("SELECT * FROM mz_role_members").collect()}
    assert ("m_eng", "m_dev") in rows and ("m_dev", "m_intern") in rows


def test_alter_owner_and_reassign(spark):
    """ALTER ... OWNER TO / REASSIGN OWNED / DROP OWNED (reference
    AlterOwnerStatement, ReassignOwnedStatement, DropOwnedStatement)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE ROLE own_a")
    s.execute("CREATE ROLE own_b")
    s.execute("CREATE TABLE own_t AS SELECT 1 AS x")
    s.execute("CREATE VIEW own_v AS SELECT x + 1 AS y FROM own_t")
    s.execute("ALTER TABLE own_t OWNER TO own_a")
    s.execute("ALTER VIEW own_v OWNER TO own_a")
    # owner reads without a grant; non-owner is denied
    s.execute("SET ROLE own_a")
    assert s.sql("SELECT count(*) AS n FROM own_t").first().n == 1
    s.execute("RESET ROLE")
    s.execute("SET ROLE own_b")
    with pytest.raises(PermissionError):
        s.sql("SELECT * FROM own_t").collect()
    s.execute("RESET ROLE")
    # non-owner cannot take ownership
    s.execute("SET ROLE own_b")
    with pytest.raises(PermissionError):
        s.execute("ALTER TABLE own_t OWNER TO own_b")
    s.execute("RESET ROLE")
    # REASSIGN moves every owned object
    s.execute("REASSIGN OWNED BY own_a TO own_b")
    assert s._owners["own_t"] == "own_b" and s._owners["own_v"] == "own_b"
    # a role that still owns objects cannot be dropped
    with pytest.raises(ValueError):
        s.execute("DROP ROLE own_b")
    # DROP OWNED removes the objects and unblocks the role drop
    s.execute("DROP OWNED BY own_b")
    shown = {r.name for r in s.execute("SHOW OBJECTS").collect()}
    assert "own_t" not in shown and "own_v" not in shown
    s.execute("DROP ROLE own_b")


def test_default_privileges_and_role_vars(spark):
    """ALTER DEFAULT PRIVILEGES materializes grants at CREATE time;
    ALTER ROLE ... SET applies at SET ROLE (reference
    AlterDefaultPrivilegesStatement, AlterRoleStatement)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE ROLE dp_reader")
    s.execute("ALTER DEFAULT PRIVILEGES FOR ROLE materialize "
              "GRANT SELECT ON TABLES TO dp_reader")
    s.execute("CREATE TABLE dp_t AS SELECT 1 AS x")
    s.execute("SET ROLE dp_reader")
    assert s.sql("SELECT count(*) AS n FROM dp_t").first().n == 1
    s.execute("RESET ROLE")
    # REVOKE form removes the default; later tables aren't granted
    s.execute("ALTER DEFAULT PRIVILEGES FOR ROLE materialize "
              "REVOKE SELECT ON TABLES FROM dp_reader")
    s.execute("CREATE TABLE dp_t2 AS SELECT 2 AS x")
    s.execute("SET ROLE dp_reader")
    with pytest.raises(PermissionError):
        s.sql("SELECT * FROM dp_t2").collect()
    s.execute("RESET ROLE")
    # role default vars apply on SET ROLE unless session SET wins
    s.execute("CREATE ROLE rv_role")
    s.execute("ALTER ROLE rv_role SET application_name = 'etl'") \
        if "application_name" in s._vars else None
    var = "application_name" if "application_name" in s._vars \
        else "cluster"
    s.execute(f"ALTER ROLE rv_role SET {var} = quickstart")
    s.execute("SET ROLE rv_role")
    assert s._vars[var] == "quickstart"
    s.execute("RESET ROLE")


def test_swap_discard_alter_secret(spark):
    """ALTER ... SWAP WITH (blue/green cutover), DISCARD ALL, ALTER
    SECRET/CONNECTION (reference AlterObjectSwapStatement,
    DiscardStatement, AlterSecretStatement)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE VIEW swap_blue AS SELECT 1 AS x")
    s.execute("CREATE VIEW swap_green AS SELECT 2 AS x")
    s.execute("ALTER VIEW swap_blue SWAP WITH swap_green")
    assert s.sql("SELECT x FROM swap_blue").first().x == 2
    assert s.sql("SELECT x FROM swap_green").first().x == 1
    s.execute("CREATE SECRET swp_sec AS 'v1'")
    s.execute("ALTER SECRET swp_sec AS 'v2'")
    assert s._secrets["swp_sec"] == "v2"
    s.execute("CREATE CONNECTION swp_conn TO KAFKA (BROKER 'h:9092')")
    s.execute("ALTER CONNECTION swp_conn SET (BROKER 'h2:9092')") \
        if False else None
    s.execute("ALTER CONNECTION swp_conn SET (port = 9093)")
    assert s._connections["swp_conn"]["port"] == "9093"
    s.execute("ALTER CONNECTION swp_conn RESET (port)")
    assert "port" not in s._connections["swp_conn"]
    # DISCARD ALL resets prepared statements, cursors, vars, role
    s.execute("CREATE ROLE disc_r")
    s.execute("SET ROLE disc_r")
    s.execute("PREPARE disc_p AS SELECT 1")
    s.execute("DISCARD ALL")
    assert s._role == "materialize" and not s._prepared


def test_create_type_list_and_map(spark):
    """CREATE TYPE ... AS LIST/MAP: custom types resolve at cast sites
    and in column definitions; mz_types lists them; DROP TYPE removes
    (reference CreateTypeStatement, ddl.rs plan_create_type)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TYPE ct_ints AS LIST (ELEMENT TYPE = int4)")
    s.execute("CREATE TYPE ct_scores AS MAP (KEY TYPE = text, "
              "VALUE TYPE = int8)")
    s.execute("CREATE TYPE ct_matrix AS LIST (ELEMENT TYPE = ct_ints)")
    assert s.sql("SELECT array(1,2)::ct_ints AS a").first().a == [1, 2]
    assert s.sql("SELECT CAST(map('k', 9) AS ct_scores) AS m") \
        .first().m == {"k": 9}
    assert s.sql("SELECT array(array(1),array(2,3))::ct_matrix AS m") \
        .first().m == [[1], [2, 3]]
    s.execute("CREATE TABLE ct_t (k STRING, vals ct_ints)")
    s.execute("INSERT INTO ct_t VALUES ('a', array(1,2,3))")
    assert s.sql("SELECT size(vals) AS n FROM ct_t").first().n == 3
    cats = {(r.name, r.category)
            for r in s.sql("SELECT * FROM mz_types").collect()}
    assert ("ct_ints", "list") in cats and ("ct_scores", "map") in cats
    create = s.execute("SHOW CREATE TYPE ct_ints").first().create_sql
    assert create.startswith("CREATE TYPE ct_ints AS LIST")
    # map keys must be text like the reference
    with pytest.raises(ValueError):
        s.execute("CREATE TYPE ct_bad AS MAP (KEY TYPE = int4, "
                  "VALUE TYPE = int8)")
    s.execute("DROP TYPE ct_matrix")
    assert s.execute("SHOW TYPES").count() == 2
    with pytest.raises(KeyError):
        s.execute("DROP TYPE ct_matrix")


def test_network_policy_enforcement(spark):
    """Network policies gate connections by peer CIDR: pgwire denies a
    client outside the active policy's allow rules (reference
    CreateNetworkPolicyStatement + adapter session checks)."""
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE NETWORK POLICY np_office (RULES (ny (ACTION = "
              "'allow', DIRECTION = 'ingress', ADDRESS = '10.1.0.0/16')))")
    # session-level check: default policy is open
    s.check_network("127.0.0.1")
    s.execute("ALTER SYSTEM SET network_policy = np_office")
    with pytest.raises(PermissionError):
        s.check_network("127.0.0.1")
    s.check_network("10.1.2.3")
    # active policy cannot be dropped; unknown policy cannot be set
    with pytest.raises(PermissionError):
        s.execute("DROP NETWORK POLICY np_office")
    with pytest.raises(KeyError):
        s.execute("ALTER SYSTEM SET network_policy = nonexistent")
    # pgwire: denied while the policy excludes localhost, fine after
    # ALTER NETWORK POLICY re-admits it
    with MzPgServer(s) as srv:
        with pytest.raises(ValueError, match="network policy"):
            PgWireClient(srv.host, srv.port)
        s.execute("ALTER NETWORK POLICY np_office SET (RULES (lo "
                  "(ACTION = 'allow', DIRECTION = 'ingress', "
                  "ADDRESS = '127.0.0.0/8')))")
        c = PgWireClient(srv.host, srv.port)
        assert c.query("SELECT 1 AS x")[0]["rows"] == [["1"]]
        c.close()
    s.execute("ALTER SYSTEM RESET network_policy")
    # rules are validated eagerly
    with pytest.raises(ValueError):
        s.execute("CREATE NETWORK POLICY np_bad (RULES (r (ACTION = "
                  "'deny', DIRECTION = 'ingress', ADDRESS = '1.2.3.0/24')))")
    with pytest.raises(ValueError):
        s.execute("CREATE NETWORK POLICY np_bad2 (RULES (r (ACTION = "
                  "'allow', DIRECTION = 'ingress', ADDRESS = 'nonsense')))")


def test_explain_filter_pushdown(spark):
    """EXPLAIN FILTER PUSHDOWN reports, per scan, the predicates that
    reach storage (reference ExplainPushdownStatement): parquet scans
    show PushedFilters, cached arrangements show their batch-pruning
    predicate list."""
    s = MzSession(spark, SF_DIR)
    rows = s.sql("EXPLAIN FILTER PUSHDOWN FOR SELECT l_orderkey FROM "
                 "lineitem WHERE l_quantity > 40").collect()
    assert rows and any("l_quantity" in r.pushed_filters for r in rows)
    # raw parquet path: the filter must reach the reader
    spark.read.parquet(f"{SF_DIR}/orders.parquet") \
        .createOrReplaceTempView("efp_orders_raw")
    rows = s.sql("EXPLAIN FILTER PUSHDOWN FOR SELECT o_orderkey FROM "
                 "efp_orders_raw WHERE o_totalprice > 100000").collect()
    assert any("GreaterThan(o_totalprice" in r.pushed_filters
               for r in rows), rows


@pytest.mark.soak
def test_delta_mv_minmax_soak(spark):
    """WITH (MAINTENANCE 'delta') multi-aggregate shape: sum/count/avg
    maintain accumulably, min/max hierarchically from support — exact
    against recompute across a 20-step insert/update/delete soak
    (reference reduce plans Accumulable vs Hierarchical,
    src/compute-types/src/plan/reduce.rs)."""
    import random
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE dmm_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW dmm_mv WITH (MAINTENANCE "
              "'delta') AS SELECT k, SUM(v) AS total, COUNT(*) AS n, "
              "MIN(v) AS lo, MAX(v) AS hi FROM dmm_t GROUP BY k")
    rng = random.Random(31)
    keys = list("abc")
    for step in range(20):
        op = rng.random()
        if op < 0.55:
            vals = ", ".join(
                f"('{rng.choice(keys)}', {rng.randrange(1, 30)})"
                for _ in range(rng.randrange(1, 4)))
            s.execute(f"INSERT INTO dmm_t VALUES {vals}")
        elif op < 0.8:
            s.execute(f"UPDATE dmm_t SET v = v + {rng.randrange(-6, 7)} "
                      f"WHERE k = '{rng.choice(keys)}'")
        else:
            s.execute(f"DELETE FROM dmm_t WHERE k = "
                      f"'{rng.choice(keys)}' AND v % 2 = "
                      f"{rng.randrange(2)}")
        got = sorted((r.k, r.total, r.n, r.lo, r.hi) for r in
                     s.sql("SELECT * FROM dmm_mv").collect())
        want = sorted((r.k, r.total, r.n, r.lo, r.hi) for r in s.sql(
            "SELECT k, SUM(v) AS total, COUNT(*) AS n, MIN(v) AS lo, "
            "MAX(v) AS hi FROM dmm_t GROUP BY k").collect())
        assert got == want, f"diverged at step {step}"


@pytest.mark.soak
def test_delta_mv_topk_soak(spark):
    """WITH (MAINTENANCE 'delta') grouped-TopK shape (the ROW_NUMBER
    idiom): deletes that evict a current top-k row pull evicted rows
    back in, exact against recompute (reference non-monotonic TopK
    plan, src/compute-types/src/plan/top_k.rs)."""
    import random
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE tks_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW tks_mv WITH (MAINTENANCE "
              "'delta') AS SELECT k, v FROM (SELECT k, v, ROW_NUMBER() "
              "OVER (PARTITION BY k ORDER BY v DESC) AS rn FROM tks_t) "
              "WHERE rn <= 2")
    rng = random.Random(13)
    for step in range(16):
        if rng.random() < 0.6:
            vals = ", ".join(
                f"('{rng.choice('ab')}', {rng.randrange(1, 40)})"
                for _ in range(rng.randrange(1, 4)))
            s.execute(f"INSERT INTO tks_t VALUES {vals}")
        else:
            s.execute(f"DELETE FROM tks_t WHERE k = "
                      f"'{rng.choice('ab')}' AND v > 25")
        got = sorted((r.k, r.v) for r in
                     s.sql("SELECT * FROM tks_mv").collect())
        want = sorted((r.k, r.v) for r in s.sql(
            "SELECT k, v FROM (SELECT k, v, ROW_NUMBER() OVER "
            "(PARTITION BY k ORDER BY v DESC) AS rn FROM tks_t) "
            "WHERE rn <= 2").collect())
        assert got == want, f"diverged at step {step}"


@pytest.mark.soak
def test_delta_mv_join_soak(spark):
    """WITH (MAINTENANCE 'delta') equi-join shapes: bilinear delta-join
    maintenance (never re-joining histories), plain projection and
    grouped-aggregate forms, exact against recompute under churn on
    BOTH sides (reference linear_join.rs delta terms)."""
    import random
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE djs_ord (ok BIGINT, o_ck BIGINT, "
              "amt BIGINT)")
    s.execute("CREATE TABLE djs_cust (c_ck BIGINT, seg STRING)")
    s.execute("INSERT INTO djs_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    s.execute("CREATE MATERIALIZED VIEW djs_rev WITH (MAINTENANCE "
              "'delta') AS SELECT seg, SUM(amt) AS rev, COUNT(*) AS n "
              "FROM djs_ord JOIN djs_cust ON o_ck = c_ck GROUP BY seg")
    s.execute("CREATE MATERIALIZED VIEW djs_flat WITH (MAINTENANCE "
              "'delta') AS SELECT ok, seg, amt FROM djs_ord JOIN "
              "djs_cust ON o_ck = c_ck WHERE amt > 5")
    oracle_rev = ("SELECT seg, SUM(amt) AS rev, COUNT(*) AS n FROM "
                  "djs_ord JOIN djs_cust ON o_ck = c_ck GROUP BY seg")
    oracle_flat = ("SELECT ok, seg, amt FROM djs_ord JOIN djs_cust "
                   "ON o_ck = c_ck WHERE amt > 5")
    rng = random.Random(5)
    next_ok = 100
    for step in range(14):
        op = rng.random()
        if op < 0.5:
            vals = ", ".join(
                f"({next_ok + i}, {rng.randrange(1, 4)}, "
                f"{rng.randrange(1, 20)})"
                for i in range(rng.randrange(1, 4)))
            next_ok += 3
            s.execute(f"INSERT INTO djs_ord VALUES {vals}")
        elif op < 0.7:
            s.execute(f"DELETE FROM djs_ord WHERE amt % 3 = "
                      f"{rng.randrange(3)}")
        elif op < 0.85:
            s.execute(f"UPDATE djs_ord SET amt = amt + "
                      f"{rng.randrange(-4, 8)} WHERE o_ck = "
                      f"{rng.randrange(1, 4)}")
        elif rng.random() < 0.5:
            s.execute(f"INSERT INTO djs_cust VALUES "
                      f"({rng.randrange(3, 6)}, 'MACH')")
        else:
            s.execute("DELETE FROM djs_cust WHERE c_ck >= 3")
        got = sorted((r.seg, r.rev, r.n) for r in
                     s.sql("SELECT * FROM djs_rev").collect())
        want = sorted((r.seg, r.rev, r.n) for r in
                      s.sql(oracle_rev).collect())
        assert got == want, f"rev diverged at step {step}"
        gf = sorted((r.ok, r.seg, r.amt) for r in
                    s.sql("SELECT * FROM djs_flat").collect())
        wf = sorted((r.ok, r.seg, r.amt) for r in
                    s.sql(oracle_flat).collect())
        assert gf == wf, f"flat diverged at step {step}"


def test_delta_mv_three_way_join(spark):
    """Left-deep delta-join chains: a 3-way join MV stays exact under
    churn on every table including the middle one (each link's output
    delta feeds the next link — the reference's linear join plans)."""
    import random
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE d3s_li (lk BIGINT, l_ok BIGINT, amt BIGINT)")
    s.execute("CREATE TABLE d3s_ord (o_ok BIGINT, o_ck BIGINT)")
    s.execute("CREATE TABLE d3s_cust (c_ck BIGINT, seg STRING)")
    s.execute("INSERT INTO d3s_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    s.execute("INSERT INTO d3s_ord VALUES (10, 1), (11, 2), (12, 1)")
    s.execute("CREATE MATERIALIZED VIEW d3s_mv WITH (MAINTENANCE "
              "'delta') AS SELECT seg, SUM(amt) AS rev, COUNT(*) AS n "
              "FROM d3s_li JOIN d3s_ord ON l_ok = o_ok "
              "JOIN d3s_cust ON o_ck = c_ck GROUP BY seg")
    oracle = ("SELECT seg, SUM(amt) AS rev, COUNT(*) AS n FROM d3s_li "
              "JOIN d3s_ord ON l_ok = o_ok JOIN d3s_cust ON "
              "o_ck = c_ck GROUP BY seg")
    rng = random.Random(17)
    nxt = 100
    for step in range(12):
        op = rng.random()
        if op < 0.5:
            vals = ", ".join(
                f"({nxt + i}, {rng.randrange(10, 13)}, "
                f"{rng.randrange(1, 20)})"
                for i in range(rng.randrange(1, 4)))
            nxt += 3
            s.execute(f"INSERT INTO d3s_li VALUES {vals}")
        elif op < 0.65:
            s.execute(f"DELETE FROM d3s_li WHERE amt % 3 = "
                      f"{rng.randrange(3)}")
        elif op < 0.8:
            if rng.random() < 0.5:
                s.execute(f"INSERT INTO d3s_ord VALUES "
                          f"({rng.randrange(13, 16)}, "
                          f"{rng.randrange(1, 3)})")
            else:
                s.execute("DELETE FROM d3s_ord WHERE o_ok >= 13")
        else:
            seg = rng.choice(("MACH", "BLDG"))
            s.execute(f"UPDATE d3s_cust SET seg = '{seg}' "
                      "WHERE c_ck = 2")
        got = sorted((r.seg, r.rev, r.n) for r in
                     s.sql("SELECT * FROM d3s_mv").collect())
        want = sorted((r.seg, r.rev, r.n) for r in
                      s.sql(oracle).collect())
        assert got == want, f"diverged at step {step}"


def test_delta_mv_join_catalog_restore(spark):
    """Join delta MVs survive a catalog restart: the journal replays
    base tables, the MV definition, and subsequent DML, and the
    restored MV is exact (reference: durable catalog reconciliation
    re-hydrates dataflows on boot)."""
    import os
    import tempfile
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE djr_ord (ok BIGINT, o_ck BIGINT, "
              "amt BIGINT)")
    s.execute("CREATE TABLE djr_cust (c_ck BIGINT, seg STRING)")
    s.execute("INSERT INTO djr_cust VALUES (1, 'AUTO'), (2, 'BLDG')")
    s.execute("CREATE MATERIALIZED VIEW djr_mv WITH (MAINTENANCE "
              "'delta') AS SELECT seg, SUM(amt) AS rev FROM djr_ord "
              "JOIN djr_cust ON o_ck = c_ck GROUP BY seg")
    s.execute("INSERT INTO djr_ord VALUES (1, 1, 10), (2, 2, 7)")
    s.execute("DELETE FROM djr_cust WHERE c_ck = 2")
    path = os.path.join(tempfile.mkdtemp(prefix="mz_djr_"), "cat.json")
    s.persist_catalog(path)
    restored = MzSession.restore_catalog(spark.newSession(), SF_DIR,
                                         path)
    got = [(r.seg, r.rev) for r in
           restored.sql("SELECT seg, rev FROM djr_mv").collect()]
    assert got == [("AUTO", 10)], got
    # the restored MV keeps maintaining
    restored.execute("INSERT INTO djr_ord VALUES (3, 1, 5)")
    got = [(r.seg, r.rev) for r in
           restored.sql("SELECT seg, rev FROM djr_mv").collect()]
    assert got == [("AUTO", 15)], got


def test_explain_sink_schema_and_set_cluster(spark):
    """EXPLAIN KEY|VALUE SCHEMA FOR CREATE SINK emits the Avro schema
    without creating the sink; ALTER ... SET CLUSTER reassigns an
    object's placement; SET TRANSACTION ISOLATION LEVEL maps to the
    transaction_isolation variable (reference ExplainSinkSchema/
    AlterSetCluster/SetTransaction statements)."""
    import json
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE ess_t (k BIGINT, name STRING, "
              "price DECIMAL(12,2), ts TIMESTAMP)")
    doc = json.loads(s.sql(
        "EXPLAIN VALUE SCHEMA AS JSON FOR CREATE SINK ess_snk FROM "
        "ess_t INTO FILE '/tmp/ess' FORMAT json").first().schema)
    assert doc["type"] == "record" and doc["name"] == "envelope"
    by_name = {f["name"]: f["type"] for f in doc["fields"]}
    assert by_name["k"] == ["null", "long"]
    assert by_name["price"][1]["logicalType"] == "decimal"
    assert by_name["ts"][1]["logicalType"] == "timestamp-micros"
    # the sink was NOT created
    assert "ess_snk" not in s._sinks
    # SET TRANSACTION ISOLATION LEVEL
    s.execute("SET TRANSACTION ISOLATION LEVEL serializable")
    assert s._vars["transaction_isolation"] == "serializable"
    s.execute("SET TRANSACTION ISOLATION LEVEL strict serializable")
    assert s._vars["transaction_isolation"] == "strict serializable"
    # ALTER ... SET CLUSTER with validation
    s.execute("CREATE CLUSTER ess_c (SIZE '1')")
    s.execute("CREATE VIEW ess_v AS SELECT k FROM ess_t")
    s.execute("ALTER VIEW ess_v SET CLUSTER ess_c")
    assert s._object_clusters["ess_v"] == "ess_c"
    with pytest.raises(KeyError):
        s.execute("ALTER VIEW ess_v SET CLUSTER missing_cluster")


def test_mz_objects_owner_column(spark):
    """mz_objects carries the owner (reference mz_objects.owner_id)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE ROLE moc_r")
    s.execute("CREATE TABLE moc_t AS SELECT 1 AS x")
    s.execute("ALTER TABLE moc_t OWNER TO moc_r")
    rows = {r.name: r.owner for r in s.sql(
        "SELECT name, owner FROM mz_objects").collect()}
    assert rows["moc_t"] == "moc_r"
    assert rows.get("region", "materialize") == "materialize"


def test_show_privileges_and_role_membership(spark):
    """SHOW PRIVILEGES [FOR role] and SHOW ROLE MEMBERSHIP [FOR role]
    (reference ShowObjectsStatement::Privileges / RoleMembership)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE spv_t AS SELECT 1 AS x")
    for r in ("spv_a", "spv_b"):
        s.execute(f"CREATE ROLE {r}")
    s.execute("GRANT SELECT, INSERT ON spv_t TO spv_a")
    s.execute("GRANT spv_a TO spv_b")
    rows = {(r.object, r.grantee, r.privilege) for r in
            s.execute("SHOW PRIVILEGES FOR spv_a").collect()}
    assert ("spv_t", "spv_a", "select") in rows
    assert ("spv_t", "spv_a", "insert") in rows
    mem = {(r.role, r.member) for r in
           s.execute("SHOW ROLE MEMBERSHIP").collect()}
    assert ("spv_a", "spv_b") in mem
    mem_b = {(r.role, r.member) for r in
             s.execute("SHOW ROLE MEMBERSHIP FOR spv_b").collect()}
    assert ("spv_a", "spv_b") in mem_b


def test_explain_all_five_stages_distinct(spark):
    """EXPLAIN RAW | DECORRELATED | LOCALLY OPTIMIZED | OPTIMIZED |
    PHYSICAL all return non-empty, pairwise-distinct plan text
    (reference stages, doc/developer/101-query-compilation.md:50-91)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    q = ("FOR SELECT o_orderstatus, count(*) AS n FROM orders "
         "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) "
         "GROUP BY o_orderstatus")
    texts = {}
    for stage in ("RAW", "DECORRELATED", "LOCALLY OPTIMIZED",
                  "OPTIMIZED", "PHYSICAL"):
        rows = s.sql(f"EXPLAIN {stage} PLAN {q}").collect()
        assert rows, f"{stage}: empty plan"
        texts[stage] = "\n".join(r.plan for r in rows)
    # resolution happened between RAW and DECORRELATED
    assert "unresolved" in texts["RAW"].lower() \
        or texts["RAW"] != texts["DECORRELATED"]
    # the optimizer did something between DECORRELATED and OPTIMIZED
    assert texts["DECORRELATED"] != texts["OPTIMIZED"]
    # the physical plan is not logical text
    assert texts["PHYSICAL"] != texts["OPTIMIZED"]
    assert len(set(texts.values())) >= 4


def test_ssh_tunnel_connection_validates_and_privatelink_rejected(spark):
    """CREATE CONNECTION ... TO SSH TUNNEL is a REAL connection kind
    (reference connections.rs SshTunnel; sources/ssh_tunnel.py speaks
    the SSH-2 transport) — VALIDATE runs the full handshake including
    password auth. AWS PRIVATELINK stays an explicit rejection."""
    import base64

    from materialize_spark.plans.sqlfront import MzSession
    from materialize_spark.sources.ssh_tunnel import SshTunnelServer
    s = MzSession(spark, SF_DIR)
    with SshTunnelServer({"mz": "hunter2"}) as srv:
        hk = base64.b64encode(srv.host_public_key).decode()
        s.execute("CREATE SECRET sshpw AS 'hunter2'")
        s.execute(
            f"CREATE CONNECTION tun TO SSH TUNNEL (HOST '{srv.host}', "
            f"PORT {srv.port}, USER 'mz', PASSWORD SECRET sshpw, "
            f"HOST_KEY '{hk}')")
        s.execute("VALIDATE CONNECTION tun")
        # bad credentials fail validation with the auth error surfaced
        s.execute(
            f"CREATE CONNECTION tunbad TO SSH TUNNEL (HOST "
            f"'{srv.host}', PORT {srv.port}, USER 'mz', "
            f"PASSWORD 'wrong')")
        with pytest.raises(ConnectionError, match="failed validation"):
            s.execute("VALIDATE CONNECTION tunbad")
    with pytest.raises(Exception, match="PRIVATELINK is not supported"):
        s.execute("CREATE CONNECTION pl TO AWS PRIVATELINK "
                  "(SERVICE NAME 'com.amazonaws.vpce.svc')")


def test_projection_join_mv_publish_is_odelta_no_exceptall(spark):
    """The commit→publish path of a projection-shaped join delta MV
    consumes the join chain's OWN output delta: no exceptAll (full
    result anti-join) anywhere — the frames a subscriber receives are
    the chain's consolidated diffs (reference: the MV sink reads its
    input arrangement's deltas, src/compute/src/sink/
    materialized_view.rs)."""
    from pyspark.sql import DataFrame

    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE pjm_ord (ok BIGINT, ck BIGINT, amt BIGINT)")
    s.execute("CREATE TABLE pjm_cust (cst BIGINT, nm STRING)")
    s.execute("INSERT INTO pjm_ord VALUES (1, 10, 5), (2, 20, 7)")
    s.execute("INSERT INTO pjm_cust VALUES (10, 'a'), (20, 'b')")
    s.execute("CREATE MATERIALIZED VIEW pjm WITH (MAINTENANCE 'delta') "
              "AS SELECT ok, nm, amt FROM pjm_ord "
              "JOIN pjm_cust ON ck = cst")
    sid, first, _ = s.subscribe_open("SUBSCRIBE pjm")
    assert {(r.ok, r.nm, r.amt) for r in first.collect()} == {
        (1, "a", 5), (2, "b", 7)}

    calls = []
    orig = DataFrame.exceptAll

    def spy(self, other):
        calls.append(True)
        return orig(self, other)

    DataFrame.exceptAll = spy
    try:
        s.execute("INSERT INTO pjm_ord VALUES (3, 10, 9)")
        s.execute("DELETE FROM pjm_ord WHERE ok = 2")
    finally:
        DataFrame.exceptAll = orig
    assert calls == []  # O(delta) end-to-end: no snapshot diffing
    out = s.subscribe_poll(sid)
    got = {}
    for r in out.collect():
        k = (r.ok, r.nm, r.amt)
        got[k] = got.get(k, 0) + r.diff
    assert got == {(3, "a", 9): 1, (2, "b", 7): -1}
    # the maintained result matches a from-scratch evaluation
    want = {(r.ok, r.nm, r.amt) for r in s.execute(
        "SELECT ok, nm, amt FROM pjm_ord JOIN pjm_cust ON ck = cst"
    ).collect()}
    assert {(r.ok, r.nm, r.amt)
            for r in s.execute("SELECT * FROM pjm").collect()} == want
    s.subscribe_close(sid)
    s.execute("DROP VIEW pjm")
    s.execute("DROP TABLE pjm_ord")
    s.execute("DROP TABLE pjm_cust")


def test_agg_mv_publish_scoped_to_touched_groups(spark):
    """Reduce-shaped delta MVs publish diffs confined to the touched
    groups (semi-probe + exceptAll over those rows only), and the
    frames are value-correct under inserts, updates and deletes."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE agt_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO agt_t VALUES ('a', 1), ('b', 2), ('c', 3)")
    s.execute("CREATE MATERIALIZED VIEW agt WITH (MAINTENANCE 'delta') "
              "AS SELECT k, SUM(v) AS total FROM agt_t GROUP BY k")
    sid, first, _ = s.subscribe_open("SUBSCRIBE agt")
    assert {(r.k, r.total) for r in first.collect()} == {
        ("a", 1), ("b", 2), ("c", 3)}
    s.execute("INSERT INTO agt_t VALUES ('a', 10)")
    out = s.subscribe_poll(sid)
    got = {}
    for r in out.collect():
        got[(r.k, r.total)] = got.get((r.k, r.total), 0) + r.diff
    # ONLY group a's diff pair — untouched groups publish nothing
    assert got == {("a", 1): -1, ("a", 11): 1}
    s.execute("DELETE FROM agt_t WHERE k = 'b'")
    out = s.subscribe_poll(sid)
    got = {}
    for r in out.collect():
        got[(r.k, r.total)] = got.get((r.k, r.total), 0) + r.diff
    assert got == {("b", 2): -1}
    s.subscribe_close(sid)
    s.execute("DROP VIEW agt")
    s.execute("DROP TABLE agt_t")


def test_delta_mv_union_all_churn(spark):
    """UNION ALL delta MV under interleaved inserts/updates/deletes on
    BOTH branches: always equal to a from-scratch evaluation, and a
    subscriber receives exactly the diff-sum frames (no exceptAll on
    the commit path — the spine publish)."""
    import random

    from pyspark.sql import DataFrame

    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE unl (k STRING, v BIGINT)")
    s.execute("CREATE TABLE unr (k STRING, v BIGINT)")
    s.execute("INSERT INTO unl VALUES ('a', 1)")
    s.execute("INSERT INTO unr VALUES ('b', 2)")
    s.execute("CREATE MATERIALIZED VIEW unmv WITH (MAINTENANCE 'delta')"
              " AS SELECT k, v FROM unl WHERE v < 100"
              " UNION ALL SELECT k, v FROM unr")
    sid, first, _ = s.subscribe_open("SUBSCRIBE unmv")
    state = {}
    for r in first.collect():
        state[(r.k, r.v)] = state.get((r.k, r.v), 0) + 1

    calls = []
    orig = DataFrame.exceptAll

    def spy(self, other):
        calls.append(True)
        return orig(self, other)

    rng = random.Random(7)
    DataFrame.exceptAll = spy
    try:
        for step in range(10):
            t = "unl" if step % 2 == 0 else "unr"
            roll = rng.random()
            if roll < 0.5:
                s.execute(f"INSERT INTO {t} VALUES "
                          f"('k{step}', {rng.randrange(150)})")
            elif roll < 0.75:
                s.execute(f"UPDATE {t} SET v = v + 10 WHERE "
                          f"v % 3 = {step % 3}")
            else:
                s.execute(f"DELETE FROM {t} WHERE v % 5 = {step % 5}")
    finally:
        DataFrame.exceptAll = orig
    assert calls == []  # commit path is spine-published, O(delta)
    # subscriber frames net to the recomputed truth
    out = s.subscribe_poll(sid)
    if out is not None:
        for r in out.collect():
            k = (r.k, r.v)
            state[k] = state.get(k, 0) + r.diff
    want = {}
    for r in s.execute("SELECT k, v FROM unl WHERE v < 100 "
                       "UNION ALL SELECT k, v FROM unr").collect():
        want[(r.k, r.v)] = want.get((r.k, r.v), 0) + 1
    assert {k: n for k, n in state.items() if n != 0} == want
    # the maintained view itself matches too
    got = {}
    for r in s.execute("SELECT * FROM unmv").collect():
        got[(r.k, r.v)] = got.get((r.k, r.v), 0) + 1
    assert got == want
    s.subscribe_close(sid)
    s.execute("DROP VIEW unmv")
    s.execute("DROP TABLE unl")
    s.execute("DROP TABLE unr")


def test_delta_mv_union_setop_capability_ladder(spark):
    """Round 11 made UNION [DISTINCT] / EXCEPT / INTERSECT first-class
    maintained shapes; round 12 added mixed-operator chains; round 13
    added STATEFUL branches (each plans as an internal __sbr_ delta
    MV) — the former rejections are capabilities now."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE unx (k STRING)")
    s.execute("INSERT INTO unx VALUES ('a'), ('a'), ('b')")
    # round 12: mixed-operator chains MAINTAIN (pairwise stacked
    # internal nodes with SQL precedence)
    s.execute("CREATE MATERIALIZED VIEW okmix WITH "
              "(MAINTENANCE 'delta') AS SELECT k FROM unx "
              "UNION ALL SELECT k FROM unx "
              "EXCEPT SELECT k FROM unx")
    s.execute("DROP VIEW okmix")
    # round 13: a stateful branch (GROUP BY inside a set-op chain)
    # maintains via the internal-MV branch desugar
    s.execute("CREATE MATERIALIZED VIEW okstate WITH "
              "(MAINTENANCE 'delta') AS SELECT k FROM unx "
              "INTERSECT SELECT k FROM unx GROUP BY k")
    got = sorted(r.k for r in
                 s.sql("SELECT * FROM okstate").collect())
    assert got == ["a", "b"]
    s.execute("DELETE FROM unx WHERE k = 'b'")
    assert sorted(r.k for r in
                  s.sql("SELECT * FROM okstate").collect()) == ["a"]
    s.execute("DROP VIEW okstate")
    assert not any(n.startswith("__sbr_") for n in s._delta_mvs)
    # the formerly-rejected plain UNION maintains (Distinct over
    # the diff-sum)
    s.execute("CREATE MATERIALIZED VIEW unok WITH (MAINTENANCE "
              "'delta') AS SELECT k FROM unx UNION SELECT k FROM unx")
    s.execute("DROP VIEW unok")
    s.execute("DROP TABLE unx")


def test_join_subquery_alias_sub_skips_string_literals(spark):
    """Alias substitution into outer clauses is token-wise: an alias
    word appearing INSIDE a string literal of the outer WHERE must not
    rewrite (the raw-regex version changed predicate semantics)."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE jsl_o (ok BIGINT, ck BIGINT, note STRING)")
    s.execute("CREATE TABLE jsl_c (cst BIGINT, seg STRING)")
    s.execute("INSERT INTO jsl_o VALUES (1, 10, 'grp'), (2, 20, 'x')")
    s.execute("INSERT INTO jsl_c VALUES (10, 'A'), (20, 'B')")
    # inner aliases ok -> grp (the literal 'grp' in the outer WHERE
    # must stay a literal, not become '(ok)')
    s.execute(
        "CREATE MATERIALIZED VIEW jsl WITH (MAINTENANCE 'delta') AS "
        "SELECT grp, COUNT(*) AS n FROM "
        "(SELECT ok AS grp, note FROM jsl_o JOIN jsl_c ON ck = cst) "
        "WHERE note = 'grp' GROUP BY grp")
    rows = {(r.grp, r.n) for r in s.sql("SELECT * FROM jsl").collect()}
    assert rows == {(1, 1)}
    s.execute("INSERT INTO jsl_o VALUES (3, 10, 'grp')")
    rows = {(r.grp, r.n) for r in s.sql("SELECT * FROM jsl").collect()}
    assert rows == {(1, 1), (3, 1)}
    s.execute("DROP VIEW jsl")
    s.execute("DROP TABLE jsl_o")
    s.execute("DROP TABLE jsl_c")


def test_delta_mv_nested_stateless_subqueries(spark):
    """Agg over ARBITRARILY NESTED stateless subqueries: each layer's
    Map/Filter composes as a per-delta transform (mfp fusion), so the
    MV stays always-fresh under writes at any nesting depth."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE nst_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO nst_t VALUES ('a', 1), ('a', 2), ('b', 3), "
              "('b', -5)")
    s.execute(
        "CREATE MATERIALIZED VIEW nst WITH (MAINTENANCE 'delta') AS "
        "SELECT grp, SUM(dbl) AS total FROM "
        "(SELECT k2 AS grp, v2 * 2 AS dbl FROM "
        " (SELECT k AS k2, v + 1 AS v2 FROM nst_t WHERE v > 0) "
        " WHERE v2 < 100) "
        "GROUP BY grp")
    spec = s._delta_mvs["nst"]
    assert len(spec["pre_layers"]) == 2  # both layers flattened
    rows = {(r.grp, r.total) for r in s.sql("SELECT * FROM nst").collect()}
    # a: (1+1)*2 + (2+1)*2 = 10 ; b: (3+1)*2 = 8 (v=-5 filtered)
    assert rows == {("a", 10), ("b", 8)}
    s.execute("INSERT INTO nst_t VALUES ('b', 4), ('c', -1)")
    rows = {(r.grp, r.total) for r in s.sql("SELECT * FROM nst").collect()}
    assert rows == {("a", 10), ("b", 18)}
    s.execute("DELETE FROM nst_t WHERE k = 'a' AND v = 2")
    rows = {(r.grp, r.total) for r in s.sql("SELECT * FROM nst").collect()}
    assert rows == {("a", 4), ("b", 18)}
    s.execute("DROP VIEW nst")
    s.execute("DROP TABLE nst_t")


def test_delta_mv_join_non_equi_residual(spark):
    """INNER join links accept non-equi ON conjuncts alongside the equi
    keys: the residual filters each bilinear term (join-then-filter is
    linear, so the delta rule is unchanged); outer links reject it."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE neq_o (ok BIGINT, ck BIGINT, amt BIGINT)")
    s.execute("CREATE TABLE neq_c (cst BIGINT, cap BIGINT)")
    s.execute("INSERT INTO neq_o VALUES (1, 10, 5), (2, 10, 50), "
              "(3, 20, 7)")
    s.execute("INSERT INTO neq_c VALUES (10, 30), (20, 3)")
    s.execute(
        "CREATE MATERIALIZED VIEW neq WITH (MAINTENANCE 'delta') AS "
        "SELECT ok, amt, cap FROM neq_o "
        "JOIN neq_c ON ck = cst AND amt < cap")
    def snap():
        return {(r.ok, r.amt, r.cap)
                for r in s.sql("SELECT * FROM neq").collect()}
    assert snap() == {(1, 5, 30)}  # amt<cap only for ok=1
    s.execute("INSERT INTO neq_o VALUES (4, 20, 2)")
    assert snap() == {(1, 5, 30), (4, 2, 3)}
    # a dim update flips which orders qualify
    s.execute("UPDATE neq_c SET cap = 60 WHERE cst = 10")
    assert snap() == {(1, 5, 60), (2, 50, 60), (4, 2, 3)}
    s.execute("DELETE FROM neq_o WHERE ok = 1")
    assert snap() == {(2, 50, 60), (4, 2, 3)}
    # truth check vs recompute
    want = {(r.ok, r.amt, r.cap) for r in s.execute(
        "SELECT ok, amt, cap FROM neq_o JOIN neq_c "
        "ON ck = cst AND amt < cap").collect()}
    assert snap() == want
    import pytest as _pytest
    # an outer link's residual referencing the LEFT side can't push
    # down to the right input — still rejected (right-only residuals
    # push down since r13, the q13 o_comment conjunct)
    with _pytest.raises(ValueError,
                        match="right input's columns"):
        s.execute(
            "CREATE MATERIALIZED VIEW neqbad WITH (MAINTENANCE "
            "'delta') AS SELECT ok, amt FROM neq_o "
            "LEFT JOIN neq_c ON ck = cst AND amt < cap")
    s.execute("DROP VIEW neq")
    s.execute("DROP TABLE neq_o")
    s.execute("DROP TABLE neq_c")


def test_delta_mv_agg_over_union_all(spark):
    """Grouped aggregate over a UNION ALL subquery: the union's
    diff-sum feeds the maintained reduce; DISTINCT over a union works
    too; commits on either branch update only touched groups."""
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE uag_l (k STRING, v BIGINT)")
    s.execute("CREATE TABLE uag_r (k STRING, v BIGINT)")
    s.execute("INSERT INTO uag_l VALUES ('a', 1), ('b', 2)")
    s.execute("INSERT INTO uag_r VALUES ('a', 10), ('c', 3)")
    s.execute(
        "CREATE MATERIALIZED VIEW uag WITH (MAINTENANCE 'delta') AS "
        "SELECT k, SUM(v) AS total FROM "
        "(SELECT k, v FROM uag_l WHERE v < 100 "
        " UNION ALL SELECT k, v FROM uag_r) "
        "GROUP BY k")
    def snap():
        return {(r.k, r.total)
                for r in s.sql("SELECT * FROM uag").collect()}
    assert snap() == {("a", 11), ("b", 2), ("c", 3)}
    s.execute("INSERT INTO uag_r VALUES ('b', 20)")
    assert snap() == {("a", 11), ("b", 22), ("c", 3)}
    s.execute("DELETE FROM uag_l WHERE k = 'a'")
    assert snap() == {("a", 10), ("b", 22), ("c", 3)}
    s.execute("UPDATE uag_r SET v = 300 WHERE k = 'c'")  # filtered? no:
    # the branch filter is on uag_l only; c moves to 300
    assert snap() == {("a", 10), ("b", 22), ("c", 300)}
    # truth vs recompute
    want = {(r.k, r.total) for r in s.execute(
        "SELECT k, SUM(v) AS total FROM "
        "(SELECT k, v FROM uag_l WHERE v < 100 "
        " UNION ALL SELECT k, v FROM uag_r) GROUP BY k").collect()}
    assert snap() == want
    # DISTINCT terminal
    s.execute(
        "CREATE MATERIALIZED VIEW udi WITH (MAINTENANCE 'delta') AS "
        "SELECT DISTINCT k FROM "
        "(SELECT k, v FROM uag_l UNION ALL SELECT k, v FROM uag_r)")
    got = {r.k for r in s.sql("SELECT * FROM udi").collect()}
    assert got == {"a", "b", "c"}
    s.execute("DELETE FROM uag_r WHERE k = 'a'")
    s.execute("DELETE FROM uag_l WHERE k = 'a'")
    got = {r.k for r in s.sql("SELECT * FROM udi").collect()}
    assert got == {"b", "c"}
    s.execute("DROP VIEW uag")
    s.execute("DROP VIEW udi")
    s.execute("DROP TABLE uag_l")
    s.execute("DROP TABLE uag_r")


def test_topk_publish_confined_to_touched_groups(spark):
    """A grouped-TopK MV whose projection keeps the group keys
    publishes touched-group-confined diffs: _publish_delta_mv receives
    touched+keys (the old-vs-new diff runs over the touched groups'
    slice, never the full leaderboard — O(k·touched), not O(k·groups)
    per commit)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE tkp_t (g STRING, item STRING, sc BIGINT)")
    s.execute("INSERT INTO tkp_t VALUES ('a', 'x', 5), ('a', 'y', 9), "
              "('a', 'z', 1), ('b', 'p', 3)")
    s.execute(
        "CREATE MATERIALIZED VIEW tkp WITH (MAINTENANCE 'delta') AS "
        "SELECT g, item, sc FROM (SELECT g, item, sc, ROW_NUMBER() "
        "OVER (PARTITION BY g ORDER BY sc DESC) AS rn FROM tkp_t) "
        "WHERE rn <= 2")
    seen = []
    orig = s._publish_delta_mv

    def spy(name, result, initial=False, **kw):
        seen.append((name, initial, kw.get("touched") is not None,
                     kw.get("keys")))
        return orig(name, result, initial, **kw)

    s._publish_delta_mv = spy
    s.execute("INSERT INTO tkp_t VALUES ('a', 'w', 7)")
    s._publish_delta_mv = orig
    assert seen == [("tkp", False, True, ["g"])]
    got = sorted((r.g, r.item, r.sc)
                 for r in s.execute("SELECT * FROM tkp").collect())
    assert got == [("a", "w", 7), ("a", "y", 9), ("b", "p", 3)]
    s.execute("DROP MATERIALIZED VIEW tkp")
    s.execute("DROP TABLE tkp_t")


def test_global_agg_having_threshold(spark):
    """HAVING without GROUP BY: the whole input is ONE group — the
    predicate filters the maintained single row, and it applies AFTER
    the empty-input synthesis (empty table → COUNT=0/SUM NULL row →
    filtered, matching SQL)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE ghv (v BIGINT);
        INSERT INTO ghv VALUES (3), (4);
        CREATE MATERIALIZED VIEW ghv_m WITH (MAINTENANCE 'delta') AS
          SELECT SUM(v) AS s, COUNT(*) AS c FROM ghv
          HAVING SUM(v) > 5;
    """)
    rows = lambda: [tuple(r) for r in  # noqa: E731
                    s.sql("SELECT * FROM ghv_m").collect()]
    assert rows() == [(7, 2)]
    s.execute("DELETE FROM ghv WHERE v = 4")   # 3: below threshold
    assert rows() == []
    s.execute("INSERT INTO ghv VALUES (10)")   # 13: back
    assert rows() == [(13, 2)]
    s.execute("DELETE FROM ghv")               # empty: NULL > 5 false
    assert rows() == []
    s.run_script("DROP MATERIALIZED VIEW ghv_m; DROP TABLE ghv;")


def test_distinct_join_projection_aliases(spark):
    """SELECT DISTINCT with aliased plain columns over a join chain:
    the distinct state keys on the OUTPUT names and the published
    schema carries the aliases."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE dja (g BIGINT, v BIGINT);
        CREATE TABLE djd (g BIGINT, nm STRING);
        INSERT INTO dja VALUES (1, 10), (1, 20), (2, 20);
        INSERT INTO djd VALUES (1, 'x'), (2, 'y');
        CREATE MATERIALIZED VIEW dj_m WITH (MAINTENANCE 'delta') AS
          SELECT DISTINCT djd.nm AS label
          FROM dja JOIN djd ON dja.g = djd.g;
    """)
    out = s.sql("SELECT * FROM dj_m")
    assert out.columns == ["label"]
    rows = lambda: sorted(r.label for r in  # noqa: E731
                          s.sql("SELECT * FROM dj_m").collect())
    assert rows() == ["x", "y"]
    s.execute("DELETE FROM dja WHERE g = 1")
    assert rows() == ["y"]
    s.execute("INSERT INTO dja VALUES (1, 5)")
    assert rows() == ["x", "y"]
    s.run_script("DROP MATERIALIZED VIEW dj_m; "
                 "DROP TABLE dja; DROP TABLE djd;")


def test_window_over_join_chain(spark):
    """Window functions over a join chain: the join part plans as an
    internal delta MV (__jsub_) and the window plan stacks above —
    frameless aggregates AND ordered windows, JOIN and comma-FROM
    syntax, WHERE applied before the window (SQL order)."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE wja (g BIGINT, v BIGINT);
        CREATE TABLE wjd (g BIGINT, nm STRING);
        INSERT INTO wja VALUES (1, 10), (1, 20), (2, 5), (1, -4);
        INSERT INTO wjd VALUES (1, 'x'), (2, 'y');
        CREATE MATERIALIZED VIEW wj_sum WITH (MAINTENANCE 'delta') AS
          SELECT nm, v, SUM(v) OVER (PARTITION BY nm) AS tot
          FROM wja JOIN wjd ON wja.g = wjd.g WHERE v > 0;
        CREATE MATERIALIZED VIEW wj_rn WITH (MAINTENANCE 'delta') AS
          SELECT nm, v,
                 ROW_NUMBER() OVER (PARTITION BY nm ORDER BY v DESC)
                     AS rn
          FROM wja, wjd WHERE wja.g = wjd.g AND v > 0;
    """)

    def recheck(step):
        for mv, body in (
            ("wj_sum",
             "SELECT nm, v, SUM(v) OVER (PARTITION BY nm) AS tot "
             "FROM wja JOIN wjd ON wja.g = wjd.g WHERE v > 0"),
            ("wj_rn",
             "SELECT nm, v, ROW_NUMBER() OVER (PARTITION BY nm "
             "ORDER BY v DESC) AS rn "
             "FROM wja JOIN wjd ON wja.g = wjd.g WHERE v > 0"),
        ):
            got = sorted(tuple(r) for r in
                         s.sql(f"SELECT * FROM {mv}").collect())
            exp = sorted(tuple(r) for r in
                         s.spark.sql(body).collect())
            assert got == exp, (step, mv, got[:4], exp[:4])

    recheck("initial")
    for sql in ("INSERT INTO wja VALUES (2, 50)",
                "DELETE FROM wja WHERE v = 10",
                "INSERT INTO wjd VALUES (3, 'z')",
                "INSERT INTO wja VALUES (3, 7)"):
        s.execute(sql)
        recheck(sql)
    s.run_script("DROP MATERIALIZED VIEW wj_sum; "
                 "DROP MATERIALIZED VIEW wj_rn;")
    assert not any(n.startswith("__jsub_") for n in s._delta_mvs)
    s.run_script("DROP TABLE wja; DROP TABLE wjd;")


def test_expression_projection_over_join(spark):
    """Stateless EXPRESSION projections over a join chain (no GROUP
    BY): the join part plans as an internal delta MV and the Map
    stacks above — arithmetic and CASE over columns of BOTH sides."""
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark)
    s.run_script("""
        CREATE TABLE epa (g BIGINT, price DOUBLE, disc DOUBLE);
        CREATE TABLE epd (g BIGINT, nm STRING);
        INSERT INTO epa VALUES (1, 100.0, 0.1), (1, 50.0, 0.2),
                               (2, 30.0, 0.0);
        INSERT INTO epd VALUES (1, 'x'), (2, 'y');
        CREATE MATERIALIZED VIEW ep_m WITH (MAINTENANCE 'delta') AS
          SELECT nm, price * (1 - disc) AS net,
                 CASE WHEN disc > 0.1 THEN 'deep' ELSE 'shallow' END
                     AS band
          FROM epa JOIN epd ON epa.g = epd.g
          WHERE price > 20;
    """)
    body = ("SELECT nm, price * (1 - disc) AS net, CASE WHEN disc > "
            "0.1 THEN 'deep' ELSE 'shallow' END AS band FROM epa "
            "JOIN epd ON epa.g = epd.g WHERE price > 20")

    def recheck(step):
        got = sorted(tuple(r) for r in
                     s.sql("SELECT * FROM ep_m").collect())
        exp = sorted(tuple(r) for r in s.spark.sql(body).collect())
        assert got == exp, (step, got[:4], exp[:4])
        assert s.sql("SELECT * FROM ep_m").columns \
            == ["nm", "net", "band"]

    recheck("initial")
    for sql in ("INSERT INTO epa VALUES (2, 200.0, 0.5)",
                "DELETE FROM epa WHERE disc = 0.2",
                "INSERT INTO epd VALUES (3, 'z')",
                "INSERT INTO epa VALUES (3, 21.0, 0.3)"):
        s.execute(sql)
        recheck(sql)
    s.execute("DROP MATERIALIZED VIEW ep_m")
    assert not any(n.startswith("__jsub_") for n in s._delta_mvs)
    s.run_script("DROP TABLE epa; DROP TABLE epd;")
