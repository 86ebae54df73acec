"""Round-9 regression tests for the round-8 advisory findings:

1. COPY append paths must feed delta-maintained MVs (both the SQL
   ``COPY t FROM '<path>'`` path and the pgwire COPY-FROM-STDIN
   sub-protocol) — a write that bypasses the diff feed leaves an
   always-fresh MV permanently wrong.
2. SHOW CREATE and mz_activity_log must redact inline credential
   literals (the reference scrubs both surfaces).
3. Binary result-format validation is per column TYPE, so a NULL in
   the probed row cannot smuggle an unsupported type past the check.
4. Custom-type substitution is confined to CAST sites: a column alias
   equal to a registered type name must survive.
5. HTTP Basic auth pays the PBKDF2 cost for unknown users too (no
   user enumeration by timing).
"""

import json

import pytest

from materialize_spark.plans.sqlfront import MzSession, redact_sql

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# 1. COPY feeds delta MVs
# ---------------------------------------------------------------------------

def test_copy_from_feeds_delta_mv(spark, tmp_path):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE cpd_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW cpd_mv WITH (MAINTENANCE 'delta') "
              "AS SELECT k, SUM(v) AS total FROM cpd_t "
              "GROUP BY k HAVING SUM(v) > 10")
    s.execute("INSERT INTO cpd_t VALUES ('a', 6)")
    assert s.sql("SELECT * FROM cpd_mv").count() == 0
    with open(tmp_path / "in.json", "w") as f:
        f.write(json.dumps({"k": "a", "v": 6}) + "\n")
        f.write(json.dumps({"k": "b", "v": 99}) + "\n")
    s.execute(f"COPY cpd_t FROM '{tmp_path}/in.json' WITH (FORMAT JSON)")
    got = sorted((r.k, r.total) for r in
                 s.sql("SELECT * FROM cpd_mv").collect())
    assert got == [("a", 12), ("b", 99)]
    s.execute("DROP VIEW cpd_mv")
    s.execute("DROP TABLE cpd_t")


def test_pgwire_copy_stdin_feeds_delta_mv(spark):
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE cps_t (k STRING, v BIGINT)")
    s.execute("CREATE MATERIALIZED VIEW cps_mv WITH (MAINTENANCE 'delta') "
              "AS SELECT k, SUM(v) AS total FROM cps_t "
              "GROUP BY k HAVING SUM(v) > 10")
    with MzPgServer(s, port=0) as srv:
        with PgWireClient("127.0.0.1", srv.port) as cli:
            cli.copy_in("COPY cps_t FROM STDIN",
                        [["a", "6"], ["a", "6"], ["b", "4"]])
            got = sorted((r.k, r.total) for r in
                         s.sql("SELECT * FROM cps_mv").collect())
            assert got == [("a", 12)]
    s.execute("DROP VIEW cps_mv")
    s.execute("DROP TABLE cps_t")


# ---------------------------------------------------------------------------
# 2. credential redaction
# ---------------------------------------------------------------------------

def test_redact_sql_patterns():
    assert "hunter2" not in redact_sql(
        "CREATE SECRET s AS 'hunter2'")
    assert "hunter2" not in redact_sql(
        "ALTER SECRET s AS 'hunter2'")
    assert "hunter2" not in redact_sql(
        "CREATE CONNECTION c TO KAFKA (BROKER 'b:9092', "
        "PASSWORD = 'hunter2')")
    assert "hunter2" not in redact_sql(
        "CREATE CONNECTION c TO KAFKA (SASL PASSWORD = 'hunter2')")
    # references-by-name stay intact
    out = redact_sql("CREATE CONNECTION c TO KAFKA (BROKER 'b:9092', "
                     "PASSWORD = SECRET kafka_pw)")
    assert "SECRET kafka_pw" in out
    # non-credential literals stay intact
    assert redact_sql("SELECT 'hunter2' AS x") == "SELECT 'hunter2' AS x"


def test_show_create_and_activity_log_redacted(spark):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE SECRET adv_sec AS 'topsecretvalue'")
    s.execute("CREATE CONNECTION adv_conn TO KAFKA "
              "(BROKER 'localhost:9092', PASSWORD = 'wirepass')")
    create = s.sql("SHOW CREATE CONNECTION adv_conn").collect()[0][1]
    assert "wirepass" not in create
    assert "<REDACTED>" in create
    log = " ".join(r.sql for r in
                   s.sql("SELECT sql FROM mz_activity_log").collect())
    assert "topsecretvalue" not in log
    assert "wirepass" not in log
    s.execute("DROP CONNECTION adv_conn")
    s.execute("DROP SECRET adv_sec")


# ---------------------------------------------------------------------------
# 3. binary result format validated by type
# ---------------------------------------------------------------------------

def test_binary_encodable_by_type():
    from materialize_spark.plans.pgwire import _binary_encodable
    for ok in ("boolean", "int", "bigint", "double", "string", "date",
               "timestamp", "binary"):
        assert _binary_encodable(ok)
    for bad in ("decimal(12,2)", "array<int>", "map<string,int>",
                "interval"):
        assert not _binary_encodable(bad)


def test_binary_result_null_first_row_clean_error(spark):
    """First row NULL in a decimal column + binary result format must
    yield a clean ErrorResponse, not a mid-stream hard close."""
    from materialize_spark.plans.pgwire import MzPgServer, PgWireClient
    s = MzSession(spark, SF_DIR)
    with MzPgServer(s, port=0) as srv:
        with PgWireClient("127.0.0.1", srv.port) as cli:
            cli.prepare("bd", "SELECT CAST(NULL AS DECIMAL(10,2)) AS d "
                              "UNION ALL "
                              "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
            with pytest.raises(ValueError,
                               match="binary result format"):
                cli.execute_prepared("bd", [], binary_results=True)
            # the connection survives to serve the next query
            rows = cli.query("SELECT 42 AS x")
            assert rows[0]["rows"][0][0] == "42"


# ---------------------------------------------------------------------------
# 4. custom types only rewritten at CAST sites
# ---------------------------------------------------------------------------

def test_custom_type_name_as_alias_survives(spark):
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TYPE adv_ints AS LIST (ELEMENT TYPE = int4)")
    out = s.sql("SELECT 1 AS adv_ints").collect()
    assert out[0].adv_ints == 1
    # the cast site still resolves
    out = s.sql("SELECT CAST(NULL AS adv_ints) AS xs").collect()
    assert out[0].xs is None
    s.execute("DROP TYPE adv_ints")


# ---------------------------------------------------------------------------
# 5. HTTP auth constant cost for unknown users
# ---------------------------------------------------------------------------

def test_http_unknown_user_pays_pbkdf2(spark, monkeypatch):
    from materialize_spark.plans import http_api

    calls = []
    real = http_api._verify_password

    def spy(ver, pw):
        calls.append(ver)
        return real(ver, pw)

    monkeypatch.setattr(http_api, "_verify_password", spy)
    s = MzSession(spark, SF_DIR)
    with http_api.MzHttpServer(s, port=0, auth={"alice": "pw"}) as srv:
        import base64
        import http.client
        conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                          timeout=10)
        hdr = {"Authorization": "Basic "
               + base64.b64encode(b"nobody:guess").decode()}
        conn.request("POST", "/api/sql",
                     body=json.dumps({"query": "SELECT 1"}), headers=hdr)
        assert conn.getresponse().status == 401
        conn.close()
    assert len(calls) == 1  # the dummy verifier ran for the unknown user
