"""Database / schema namespaces: CREATE DATABASE/SCHEMA, 3-part names,
search_path resolution.

Reference surface: 3-part object naming + search_path
(/root/reference/src/sql/src/names.rs PartialItemName resolution;
session vars `database`/`search_path` in src/sql/src/session/vars.rs;
CREATE DATABASE/SCHEMA in src/sql-parser/src/ast/defs/statement.rs).
"""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def sess(spark):
    return MzSession(spark, SF_DIR)


def test_create_show_drop_database(sess):
    sess.execute("CREATE DATABASE analytics")
    names = {r.name for r in sess.execute("SHOW DATABASES").collect()}
    assert {"materialize", "analytics"} <= names
    with pytest.raises(KeyError, match="already exists"):
        sess.execute("CREATE DATABASE analytics")
    sess.execute("CREATE DATABASE IF NOT EXISTS analytics")  # no-op
    sess.execute("DROP DATABASE analytics")
    assert "analytics" not in {
        r.name for r in sess.execute("SHOW DATABASES").collect()}
    with pytest.raises(PermissionError):
        sess.execute("DROP DATABASE materialize")


def test_schemas_and_qualified_names(sess):
    sess.execute("CREATE SCHEMA staging")
    sess.execute("CREATE SCHEMA analytics")
    schemas = {r.name for r in sess.execute("SHOW SCHEMAS").collect()}
    assert {"public", "staging", "analytics"} <= schemas
    # same-named objects in different schemas coexist
    sess.execute("CREATE TABLE staging.metrics (k STRING, v BIGINT)")
    sess.execute("CREATE TABLE analytics.metrics (k STRING, v BIGINT)")
    sess.execute("INSERT INTO staging.metrics VALUES ('s', 1)")
    sess.execute("INSERT INTO analytics.metrics VALUES ('a', 2)")
    assert sess.sql("SELECT k FROM staging.metrics").first().k == "s"
    assert sess.sql("SELECT k FROM analytics.metrics").first().k == "a"
    # 3-part names resolve too
    assert sess.sql(
        "SELECT v FROM materialize.staging.metrics").first().v == 1
    # qualified column refs through the schema prefix
    assert sess.sql(
        "SELECT m.v FROM analytics.metrics m WHERE m.k = 'a'"
    ).first().v == 2


def test_search_path_resolution(sess):
    sess.execute("CREATE SCHEMA s1")
    sess.execute("CREATE SCHEMA s2")
    sess.execute("CREATE TABLE s1.t (x BIGINT)")
    sess.execute("CREATE TABLE s2.t (x BIGINT)")
    sess.execute("INSERT INTO s1.t VALUES (1)")
    sess.execute("INSERT INTO s2.t VALUES (2)")
    sess.execute("SET search_path = s1, public")
    assert sess.sql("SELECT x FROM t").first().x == 1
    sess.execute("SET search_path = s2, public")
    assert sess.sql("SELECT x FROM t").first().x == 2
    # public objects still resolve when path includes public
    assert sess.sql("SELECT count(*) AS n FROM region").first().n == 5
    # first schema in path shadows later ones
    sess.execute("SET search_path = s1, s2")
    assert sess.sql("SELECT x FROM t").first().x == 1
    sess.execute("SET search_path = public")


def test_unqualified_create_lands_in_first_path_schema(sess):
    sess.execute("CREATE SCHEMA app")
    sess.execute("SET search_path = app, public")
    sess.execute("CREATE TABLE widgets (w STRING)")
    sess.execute("INSERT INTO widgets VALUES ('x')")
    # it is app.widgets, not public.widgets
    assert sess.sql("SELECT w FROM app.widgets").first().w == "x"
    sess.execute("SET search_path = public")
    with pytest.raises(Exception):
        sess.sql("SELECT w FROM widgets").collect()


def test_cross_database_resolution(sess):
    sess.execute("CREATE DATABASE warehouse")
    sess.execute("CREATE SCHEMA warehouse.facts")
    sess.execute("CREATE TABLE warehouse.facts.sales (amt BIGINT)")
    sess.execute("INSERT INTO warehouse.facts.sales VALUES (10)")
    assert sess.sql(
        "SELECT amt FROM warehouse.facts.sales").first().amt == 10
    # switch the session database: 2-part names resolve against it
    sess.execute("SET database = warehouse")
    assert sess.sql("SELECT amt FROM facts.sales").first().amt == 10
    schemas = {r.name for r in sess.execute("SHOW SCHEMAS").collect()}
    assert {"public", "facts"} <= schemas
    sess.execute("SET database = materialize")
    with pytest.raises(KeyError, match="unknown database"):
        sess.execute("SET database = nope")


def test_drop_schema_takes_objects(sess):
    sess.execute("CREATE SCHEMA doomed")
    sess.execute("CREATE TABLE doomed.t1 (x BIGINT)")
    sess.execute("CREATE VIEW doomed.v1 AS SELECT 1 AS one")
    sess.execute("DROP SCHEMA doomed CASCADE")
    assert "doomed" not in {
        r.name for r in sess.execute("SHOW SCHEMAS").collect()}
    with pytest.raises(Exception):
        sess.sql("SELECT * FROM doomed.t1").collect()
    with pytest.raises(PermissionError):
        sess.execute("DROP SCHEMA public")


def test_views_and_matviews_in_schemas(sess):
    sess.execute("CREATE SCHEMA rpt")
    sess.execute("CREATE VIEW rpt.region_names AS "
                 "SELECT r_name FROM region ORDER BY r_name")
    assert sess.sql(
        "SELECT count(*) AS n FROM rpt.region_names").first().n == 5
    sess.execute("CREATE MATERIALIZED VIEW rpt.nation_count AS "
                 "SELECT count(*) AS n FROM nation")
    assert sess.sql("SELECT n FROM rpt.nation_count").first().n == 25


def test_pg_namespace_lists_user_schemas(sess):
    sess.execute("CREATE SCHEMA custom")
    rows = sess.sql("SELECT nspname FROM pg_namespace "
                    "ORDER BY nspname").collect()
    assert "custom" in {r.nspname for r in rows}


def test_aliases_not_captured(sess):
    # a table alias sharing a schema name must not be rewritten
    sess.execute("CREATE SCHEMA n")
    out = sess.sql("SELECT n.n_name FROM nation n "
                   "WHERE n.n_nationkey = 0").first()
    expected = sess.sql("SELECT n_name FROM nation "
                        "WHERE n_nationkey = 0").first().n_name
    assert out.n_name == expected


def test_mz_databases_and_schemas_introspection(sess):
    sess.execute("CREATE DATABASE d2")
    sess.execute("CREATE SCHEMA d2.raw")
    dbs = {r.name for r in sess.sql(
        "SELECT name FROM mz_databases").collect()}
    assert {"materialize", "d2"} <= dbs
    rows = sess.sql(
        "SELECT d.name AS db, s.name AS schema FROM mz_schemas s "
        "JOIN mz_databases d ON s.database_id = d.id").collect()
    pairs = {(r.db, r.schema) for r in rows}
    assert ("d2", "raw") in pairs and ("d2", "public") in pairs
    assert ("materialize", "public") in pairs


def test_comma_from_list_resolves_search_path(sess):
    """The second (and later) tables of a comma-separated FROM list are in
    table position even though the preceding token is a comma, not FROM
    (round-7 ADVICE: namespaces.py bare-name resolution)."""
    sess.execute("CREATE SCHEMA app")
    sess.execute("CREATE TABLE app.users (uid BIGINT)")
    sess.execute("CREATE TABLE app.orders_t (uid BIGINT, amt BIGINT)")
    sess.execute("INSERT INTO app.users VALUES (1)")
    sess.execute("INSERT INTO app.orders_t VALUES (1, 7)")
    sess.execute("SET search_path = app")
    got = sess.sql(
        "SELECT o.amt FROM users u, orders_t o WHERE u.uid = o.uid"
    ).first().amt
    assert got == 7
    # three-element list, mixed with a qualified name
    got3 = sess.sql(
        "SELECT count(*) AS n FROM users, orders_t, app.users"
    ).first().n
    assert got3 == 1
    # a comma in a GROUP BY after the FROM list must NOT put bare words
    # back in table position (they are columns)
    grouped = sess.sql(
        "SELECT uid, amt, count(*) AS n FROM orders_t "
        "GROUP BY uid, amt").first()
    assert (grouped.uid, grouped.amt, grouped.n) == (1, 7, 1)


def test_copy_target_resolves_search_path(sess, tmp_path):
    """COPY <bare-name> TO resolves the table through search_path."""
    sess.execute("CREATE SCHEMA app2")
    sess.execute("CREATE TABLE app2.snap (x BIGINT)")
    sess.execute("INSERT INTO app2.snap VALUES (42)")
    sess.execute("SET search_path = app2")
    dest = str(tmp_path / "snap_out")
    sess.execute(f"COPY snap TO '{dest}' WITH (FORMAT csv)")
    import glob
    data = "".join(open(p).read() for p in glob.glob(dest + "/*.csv"))
    assert "42" in data


def test_drop_schema_restrict_default(sess):
    """Plain DROP SCHEMA (or RESTRICT) on a non-empty schema errors;
    CASCADE is required to take the contained objects (PG semantics,
    round-7 ADVICE on parser.py DROP)."""
    sess.execute("CREATE SCHEMA full_s")
    sess.execute("CREATE TABLE full_s.t (x BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        sess.execute("DROP SCHEMA full_s")
    with pytest.raises(ValueError, match="not empty"):
        sess.execute("DROP SCHEMA full_s RESTRICT")
    sess.execute("DROP SCHEMA full_s CASCADE")
    assert "full_s" not in {
        r.name for r in sess.execute("SHOW SCHEMAS").collect()}
    # an EMPTY schema drops without CASCADE
    sess.execute("CREATE SCHEMA empty_s")
    sess.execute("DROP SCHEMA empty_s")


def test_drop_database_restrict_default(sess):
    sess.execute("CREATE DATABASE full_db")
    sess.execute("CREATE TABLE full_db.public.t (x BIGINT)")
    with pytest.raises(ValueError, match="not empty"):
        sess.execute("DROP DATABASE full_db")
    sess.execute("DROP DATABASE full_db CASCADE")
    # empty database (public schema only, no objects) drops plain
    sess.execute("CREATE DATABASE empty_db")
    sess.execute("DROP DATABASE empty_db")
