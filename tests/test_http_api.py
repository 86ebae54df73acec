"""HTTP SQL API: POST /api/sql (reference environmentd http/sql.rs)."""

import base64
import json
import ssl
import urllib.error
import urllib.request

import pytest

from materialize_spark.plans.http_api import MzHttpServer
from materialize_spark.plans.sqlfront import MzSession

SF_DIR = "/root/testdata/sf0.001"


def _post(url, payload, *, user=None, pw=None, ctx=None):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    if user is not None:
        tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
        req.add_header("Authorization", f"Basic {tok}")
    with urllib.request.urlopen(req, timeout=30, context=ctx) as r:
        return json.loads(r.read())


@pytest.fixture()
def http(spark):
    sess = MzSession(spark, SF_DIR)
    with MzHttpServer(sess) as srv:
        yield f"http://{srv.host}:{srv.port}/api/sql"


def test_simple_query(http):
    out = _post(http, {"query": "SELECT r_regionkey, r_name FROM region "
                                "ORDER BY r_regionkey"})
    [res] = out["results"]
    assert res["tag"] == "SELECT 5"
    assert [c["name"] for c in res["desc"]["columns"]] == \
        ["r_regionkey", "r_name"]
    assert res["rows"][0][1] == "AFRICA"


def test_simple_multi_statement_and_ok_tags(http):
    out = _post(http, {"query": "CREATE TABLE ht (x BIGINT); "
                                "INSERT INTO ht VALUES (1), (2); "
                                "SELECT sum(x) AS s FROM ht"})
    r = out["results"]
    assert r[0]["ok"] == "CREATE TABLE"
    assert r[1]["ok"] == "INSERT INTO"
    assert r[2]["rows"] == [[3]]


def test_extended_with_params(http):
    out = _post(http, {"queries": [
        {"query": "SELECT r_name FROM region WHERE r_regionkey = $1",
         "params": ["2"]},
        {"query": "SELECT $1 AS a, $2 AS b", "params": ["x", None]},
    ]})
    r = out["results"]
    assert r[0]["rows"] == [["ASIA"]]
    assert r[1]["rows"] == [["x", None]]


def test_error_shape_and_batch_stop(http):
    out = _post(http, {"query": "SELECT 1 AS one; "
                                "SELECT * FROM no_such_http_table; "
                                "SELECT 2 AS two"})
    r = out["results"]
    assert r[0]["rows"] == [[1]]
    assert "message" in r[1]["error"]
    assert len(r) == 2  # batch stops at the first error


def test_bad_body_rejected(http):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(http, {"nonsense": True})
    assert e.value.code == 400


def test_basic_auth(spark):
    sess = MzSession(spark, SF_DIR)
    with MzHttpServer(sess, auth={"materialize": "hun athe r2"}) as srv:
        url = f"http://{srv.host}:{srv.port}/api/sql"
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"query": "SELECT 1 AS x"})
        assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(url, {"query": "SELECT 1 AS x"},
                  user="materialize", pw="wrong")
        assert e.value.code == 401
        out = _post(url, {"query": "SELECT 1 AS x"},
                    user="materialize", pw="hun athe r2")
        assert out["results"][0]["rows"] == [[1]]


def test_https(spark):
    from tests.tlsutil import server_ctx
    sess = MzSession(spark, SF_DIR)
    with MzHttpServer(sess, ssl_context=server_ctx()) as srv:
        cctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        cctx.check_hostname = False
        cctx.verify_mode = ssl.CERT_NONE
        out = _post(f"https://{srv.host}:{srv.port}/api/sql",
                    {"query": "SELECT count(*) AS n FROM region"},
                    ctx=cctx)
        assert out["results"][0]["rows"] == [[5]]


def test_subscribe_over_http(spark):
    """SUBSCRIBE works through /api/sql (the reference streams it over
    chunked HTTP; the batch engine returns the snapshot diff set)."""
    sess = MzSession(spark, SF_DIR)
    with MzHttpServer(sess) as srv:
        url = f"http://{srv.host}:{srv.port}/api/sql"
        _post(url, {"query": "CREATE TABLE hsub (k STRING, v BIGINT); "
                             "INSERT INTO hsub VALUES ('a', 1); "
                             "CREATE MATERIALIZED VIEW hmv AS "
                             "SELECT k, sum(v) AS total FROM hsub "
                             "GROUP BY k"})
        out = _post(url, {"query": "SUBSCRIBE hmv"})
        [res] = out["results"]
        cols = [c["name"] for c in res["desc"]["columns"]]
        assert "diff" in cols
        assert res["rows"] == [["a", 1, 1]]
