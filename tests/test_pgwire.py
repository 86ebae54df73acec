"""pgwire server front-end: simple-query protocol over MzSession.

Protocol under test: the PUBLIC PG wire protocol (startup/auth,
ParameterStatus, Q/T/D/C/E/Z message flow); semantics mirrored: the
reference serving clients over pgwire (src/pgwire/src/protocol.rs).
"""

import pytest

from materialize_spark.plans.pgwire import MzPgServer, PgWireClient
from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def served(spark):
    sess = MzSession(spark, SF_DIR)
    with MzPgServer(sess) as srv:
        with PgWireClient(srv.host, srv.port) as c:
            yield sess, c


def test_startup_parameters(served):
    _sess, c = served
    assert c.parameters.get("server_version") == "9.5.0"
    assert c.parameters.get("TimeZone") == "UTC"


def test_select_over_the_wire(served):
    _sess, c = served
    [res] = c.query("SELECT r_regionkey, r_name FROM region "
                    "ORDER BY r_regionkey")
    assert [n for n, _ in res["columns"]] == ["r_regionkey", "r_name"]
    oids = dict(res["columns"])
    assert oids["r_regionkey"] in (20, 23) and oids["r_name"] == 25
    assert len(res["rows"]) == 5
    assert res["rows"][0][0] == "0"
    assert res["tag"] == "SELECT 5"


def test_ddl_dml_multistatement_and_types(served):
    _sess, c = served
    results = c.query(
        "CREATE TABLE wire_t (k STRING, v BIGINT, ok BOOLEAN); "
        "INSERT INTO wire_t VALUES ('a', 1, true), ('b', NULL, false); "
        "SELECT * FROM wire_t ORDER BY k")
    assert results[0]["tag"] == "CREATE TABLE"
    assert results[1]["tag"] == "INSERT INTO"
    rows = results[2]["rows"]
    assert rows == [["a", "1", "t"], ["b", None, "f"]]


def test_pg_dialect_through_the_wire(served):
    _sess, c = served
    [res] = c.query("SELECT 42::int8 AS x, 'abc' ~~ 'a%' AS m, "
                    "pg_typeof(1.5::float8) AS t")
    assert res["rows"] == [["42", "t", "double precision"]]


def test_errors_keep_session_alive(served):
    _sess, c = served
    with pytest.raises(ValueError):
        c.query("SELECT * FROM no_such_relation_xyz")
    # session survives the error, like a real server
    [res] = c.query("SELECT 1 AS one")
    assert res["rows"] == [["1"]]


def test_rbac_enforced_over_the_wire(served):
    sess, c = served
    c.query("CREATE TABLE wire_sec (x BIGINT)")
    c.query("CREATE ROLE wire_role")
    c.query("SET ROLE wire_role")
    with pytest.raises(ValueError, match="permission denied"):
        c.query("SELECT * FROM wire_sec")
    c.query("RESET ROLE")
    assert sess._role == "materialize"


def test_shared_session_across_connections(spark):
    sess = MzSession(spark, SF_DIR)
    with MzPgServer(sess) as srv:
        with PgWireClient(srv.host, srv.port) as c1:
            c1.query("CREATE TABLE wire_shared (x BIGINT)")
            c1.query("INSERT INTO wire_shared VALUES (7)")
        with PgWireClient(srv.host, srv.port) as c2:
            [res] = c2.query("SELECT x FROM wire_shared")
            assert res["rows"] == [["7"]]
