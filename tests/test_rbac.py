"""RBAC: CREATE ROLE / GRANT / REVOKE / SET ROLE + enforcement.

Reference surface: role + privilege statements
(/root/reference/src/sql-parser/src/ast/defs/statement.rs:63-65,
GRANT/REVOKE privilege AST) and the privilege-check flow in
src/sql/src/rbac.rs: superusers and owners bypass; everyone else needs an
explicit grant per (privilege, object). Session-scoped here — clusters/
replicas and LDAP-style role attributes stay out of scope (SURVEY §7).
"""

import pytest

from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def _sess(spark):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE rbac_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO rbac_t VALUES ('a', 1)")
    return s


def test_roles_lifecycle(spark):
    s = _sess(spark)
    s.execute("CREATE ROLE analyst")
    s.execute("CREATE ROLE etl")
    roles = {r.name for r in s.execute("SHOW ROLES").collect()}
    assert {"materialize", "analyst", "etl"} <= roles
    with pytest.raises(KeyError, match="already exists"):
        s.execute("CREATE ROLE analyst")
    s.execute("DROP ROLE etl")
    assert "etl" not in {r.name for r in s.execute("SHOW ROLES").collect()}
    with pytest.raises(PermissionError):
        s.execute("DROP ROLE materialize")


def test_select_requires_grant(spark):
    s = _sess(spark)
    s.execute("CREATE ROLE analyst")
    s.execute("SET ROLE analyst")
    with pytest.raises(PermissionError, match="rbac_t"):
        s.sql("SELECT * FROM rbac_t").collect()
    s.execute("RESET ROLE")
    s.execute("GRANT SELECT ON rbac_t TO analyst")
    s.execute("SET ROLE analyst")
    assert s.sql("SELECT count(*) AS n FROM rbac_t").first().n == 1
    # but INSERT still denied
    with pytest.raises(PermissionError, match="INSERT"):
        s.execute("INSERT INTO rbac_t VALUES ('b', 2)")
    s.execute("RESET ROLE")
    s.execute("REVOKE SELECT ON rbac_t FROM analyst")
    s.execute("SET ROLE analyst")
    with pytest.raises(PermissionError):
        s.sql("SELECT * FROM rbac_t").collect()


def test_grant_all_and_owner_bypass(spark):
    s = _sess(spark)
    s.execute("CREATE ROLE writer")
    s.execute("GRANT ALL PRIVILEGES ON rbac_t TO writer")
    s.execute("SET ROLE writer")
    s.execute("INSERT INTO rbac_t VALUES ('b', 2)")
    assert s.sql("SELECT count(*) AS n FROM rbac_t").first().n == 2
    # objects the role creates are owned by it: no grant needed
    s.execute("CREATE TABLE own_t (x BIGINT)")
    s.execute("INSERT INTO own_t VALUES (9)")
    assert s.sql("SELECT x FROM own_t").first().x == 9
    # and a non-owner, non-super role cannot drop it
    s.execute("RESET ROLE")
    s.execute("CREATE ROLE other")
    s.execute("SET ROLE other")
    with pytest.raises(PermissionError, match="owner"):
        s.execute("DROP TABLE own_t")
    s.execute("RESET ROLE")
    s.execute("DROP TABLE own_t")  # superuser may


def test_delete_and_copy_require_grants(spark, tmp_path):
    # DELETE needs the DELETE privilege and COPY FROM needs INSERT —
    # without these checks a grantless role could wipe or bulk-load any
    # table (PG/reference rbac.rs check the same privileges).
    s = _sess(spark)
    s.execute("CREATE ROLE intruder")
    s.execute("SET ROLE intruder")
    with pytest.raises(PermissionError, match="DELETE"):
        s.execute("DELETE FROM rbac_t")
    path = str(tmp_path / "rows.json")
    with pytest.raises(PermissionError, match="INSERT"):
        s.execute(f"COPY rbac_t FROM '{path}' WITH (FORMAT JSON)")
    s.execute("RESET ROLE")
    assert s.sql("SELECT count(*) AS n FROM rbac_t").first().n == 1
    s.execute("GRANT DELETE ON rbac_t TO intruder")
    s.execute("SET ROLE intruder")
    s.execute("DELETE FROM rbac_t WHERE k = 'a'")
    s.execute("RESET ROLE")
    assert s.sql("SELECT count(*) AS n FROM rbac_t").first().n == 0


def test_view_creation_cannot_launder_select(spark):
    # CREATE VIEW / CTAS / CREATE MATERIALIZED VIEW require SELECT on the
    # base relations: otherwise a denied role could own a view over the
    # table and read it through the owner bypass.
    s = _sess(spark)
    s.execute("CREATE ROLE analyst")
    s.execute("SET ROLE analyst")
    with pytest.raises(PermissionError, match="rbac_t"):
        s.execute("CREATE VIEW leak_v AS SELECT * FROM rbac_t")
    with pytest.raises(PermissionError, match="rbac_t"):
        s.execute("CREATE TABLE leak_t AS SELECT * FROM rbac_t")
    with pytest.raises(PermissionError, match="rbac_t"):
        s.execute(
            "CREATE MATERIALIZED VIEW leak_mv AS SELECT * FROM rbac_t")
    s.execute("RESET ROLE")
    s.execute("GRANT SELECT ON rbac_t TO analyst")
    s.execute("SET ROLE analyst")
    s.execute("CREATE VIEW ok_v AS SELECT k FROM rbac_t")
    assert s.sql("SELECT count(*) AS n FROM ok_v").first().n == 1


def test_current_user_tracks_set_role(spark):
    # The reference returns the ACTIVE role from current_user /
    # session_user / current_role, not a fixed literal.
    s = _sess(spark)
    assert s.sql("SELECT current_user AS u").first().u == "materialize"
    s.execute("CREATE ROLE analyst")
    s.execute("GRANT SELECT ON rbac_t TO analyst")
    s.execute("SET ROLE analyst")
    assert s.sql("SELECT current_user AS u").first().u == "analyst"
    assert s.sql("SELECT current_role AS u").first().u == "analyst"
    assert s.sql("SELECT session_user AS u").first().u == "analyst"
    s.execute("RESET ROLE")
    assert s.sql("SELECT current_user AS u").first().u == "materialize"


def test_revoked_role_grants_die_with_role(spark):
    s = _sess(spark)
    s.execute("CREATE ROLE temp_r")
    s.execute("GRANT SELECT ON rbac_t TO temp_r")
    s.execute("DROP ROLE temp_r")
    s.execute("CREATE ROLE temp_r")  # same name, fresh role
    s.execute("SET ROLE temp_r")
    with pytest.raises(PermissionError):
        s.sql("SELECT * FROM rbac_t").collect()
