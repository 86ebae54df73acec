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


# -- WebSocket SQL endpoint (/api/experimental/sql) --------------------------

class _WsClient:
    """Minimal RFC 6455 client for the tests (masked client frames)."""

    def __init__(self, host, port, path="/api/experimental/sql"):
        import base64
        import os
        import socket
        self.sock = socket.create_connection((host, port), timeout=30)
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
             f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
             f"Sec-WebSocket-Key: {key}\r\n"
             f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
        buf = b""
        while b"\r\n\r\n" not in buf:
            buf += self.sock.recv(4096)
        assert b"101" in buf.split(b"\r\n", 1)[0], buf
        # frames may ride in the same packet as the handshake headers
        self._buf = buf.split(b"\r\n\r\n", 1)[1]

    def send(self, obj):
        import json as _json
        import os
        import struct
        data = _json.dumps(obj).encode()
        mask = os.urandom(4)
        hdr = bytes([0x81])
        n = len(data)
        if n < 126:
            hdr += bytes([0x80 | n])
        else:
            hdr += bytes([0x80 | 126]) + struct.pack(">H", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
        self.sock.sendall(hdr + mask + masked)

    def recv(self):
        import json as _json
        import struct

        def exact(n):
            b = b""
            while len(b) < n:
                if self._buf:
                    take = self._buf[:n - len(b)]
                    self._buf = self._buf[len(take):]
                    b += take
                    continue
                c = self.sock.recv(n - len(b))
                if not c:
                    return None
                b += c
            return b

        head = exact(2)
        if head is None:
            return None
        op = head[0] & 0x0F
        n = head[1] & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", exact(8))
        data = exact(n) if n else b""
        if op != 1:
            return {"type": "__ctrl__", "opcode": op}
        return _json.loads(data.decode())

    def close(self):
        self.sock.close()


def test_websocket_sql_roundtrip(spark):
    """The WS surface runs ordinary statements with the reference's
    message shapes (Rows / Row / CommandComplete / ReadyForQuery)."""
    from materialize_spark.plans.http_api import MzHttpServer
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    with MzHttpServer(s, port=0) as srv:
        cli = _WsClient(srv.host, srv.port)
        assert cli.recv()["type"] == "ReadyForQuery"
        cli.send({"query": "SELECT r_regionkey AS rk FROM region "
                           "WHERE r_regionkey < 2 ORDER BY 1"})
        msgs = []
        while True:
            m = cli.recv()
            msgs.append(m)
            if m["type"] == "ReadyForQuery":
                break
        kinds = [m["type"] for m in msgs]
        assert kinds == ["Rows", "Row", "Row", "CommandComplete",
                         "ReadyForQuery"]
        assert [m["payload"] for m in msgs if m["type"] == "Row"] == \
            [[0], [1]]
        cli.close()


def test_websocket_subscribe_streams(spark):
    """SUBSCRIBE over the WS surface pushes each commit's delta rows
    without the client re-issuing anything; a client frame cancels
    with PG 57014 and the connection stays usable."""
    from materialize_spark.plans.http_api import MzHttpServer
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    s.execute("CREATE TABLE wssub_t (k STRING, v BIGINT)")
    s.execute("INSERT INTO wssub_t VALUES ('a', 1)")
    with MzHttpServer(s, port=0) as srv:
        cli = _WsClient(srv.host, srv.port)
        assert cli.recv()["type"] == "ReadyForQuery"
        cli.send({"query": "SUBSCRIBE wssub_t"})
        assert cli.recv()["type"] == "Rows"
        snap = cli.recv()
        assert snap["type"] == "Row" and snap["payload"][:2] == ["a", 1]
        # a write committed while the stream is open arrives as a Row
        s.execute("INSERT INTO wssub_t VALUES ('b', 2)")
        nxt = cli.recv()
        assert nxt["type"] == "Row" and nxt["payload"][:2] == ["b", 2]
        # cancel: any client frame ends the stream with 57014
        cli.send({"cancel": True})
        msgs = []
        while True:
            m = cli.recv()
            msgs.append(m)
            if m["type"] == "ReadyForQuery":
                break
        assert any(m["type"] == "Error"
                   and m["payload"]["code"] == "57014" for m in msgs)
        # connection reusable
        cli.send({"query": "SELECT 7 AS x"})
        out = []
        while True:
            m = cli.recv()
            out.append(m)
            if m["type"] == "ReadyForQuery":
                break
        assert [m["payload"] for m in out if m["type"] == "Row"] == [[7]]
        cli.close()
    s.execute("DROP TABLE wssub_t")


def test_websocket_auth_first_frame(spark):
    from materialize_spark.plans.http_api import MzHttpServer
    from materialize_spark.plans.sqlfront import MzSession
    s = MzSession(spark, SF_DIR)
    with MzHttpServer(s, port=0, auth={"alice": "pw"}) as srv:
        bad = _WsClient(srv.host, srv.port)
        bad.send({"user": "alice", "password": "wrong"})
        m = bad.recv()
        assert m["type"] == "Error" and m["payload"]["code"] == "28P01"
        bad.close()
        good = _WsClient(srv.host, srv.port)
        good.send({"user": "alice", "password": "pw"})
        assert good.recv()["type"] == "ReadyForQuery"
        good.send({"query": "SELECT 1 AS one"})
        kinds = []
        while True:
            m = good.recv()
            kinds.append(m["type"])
            if m["type"] == "ReadyForQuery":
                break
        assert "Row" in kinds
        good.close()


def test_two_concurrent_http_pollers_via_named_cursors(spark):
    """Two HTTP pollers each DECLARE their own SUBSCRIBE cursor: each
    receives the COMPLETE delta sequence (the old shared per-object
    execute-path state split one stream between concurrent pollers).
    This is the reference's polling idiom: DECLARE c CURSOR FOR
    SUBSCRIBE ...; FETCH c."""
    sess = MzSession(spark, SF_DIR)
    with MzHttpServer(sess) as srv:
        url = f"http://{srv.host}:{srv.port}/api/sql"
        _post(url, {"query": "CREATE TABLE hconc (k STRING, v BIGINT); "
                             "INSERT INTO hconc VALUES ('a', 1)"})
        # both pollers open their own cursor and take the snapshot
        out = _post(url, {"query": "DECLARE p1 CURSOR FOR "
                                   "SUBSCRIBE hconc; FETCH ALL p1"})
        assert out["results"][1]["rows"] == [["a", 1, 1]]
        out = _post(url, {"query": "DECLARE p2 CURSOR FOR "
                                   "SUBSCRIBE hconc; FETCH ALL p2"})
        assert out["results"][1]["rows"] == [["a", 1, 1]]
        # a commit lands; BOTH pollers see it on their next poll
        _post(url, {"query": "INSERT INTO hconc VALUES ('b', 2)"})
        r1 = _post(url, {"query": "FETCH ALL p1"})["results"][0]["rows"]
        r2 = _post(url, {"query": "FETCH ALL p2"})["results"][0]["rows"]
        assert r1 == [["b", 2, 1]] and r2 == [["b", 2, 1]]
        # another commit; polls in the other order, still full streams
        _post(url, {"query": "INSERT INTO hconc VALUES ('c', 3)"})
        r2 = _post(url, {"query": "FETCH ALL p2"})["results"][0]["rows"]
        r1 = _post(url, {"query": "FETCH ALL p1"})["results"][0]["rows"]
        assert r1 == [["c", 3, 1]] and r2 == [["c", 3, 1]]
        # chunked FETCH n keeps the remainder buffered per cursor
        _post(url, {"query": "INSERT INTO hconc VALUES ('d', 4); "
                             "INSERT INTO hconc VALUES ('e', 5)"})
        r1a = _post(url, {"query": "FETCH 1 p1"})["results"][0]["rows"]
        r1b = _post(url, {"query": "FETCH 1 p1"})["results"][0]["rows"]
        assert len(r1a) == 1 and len(r1b) == 1 and r1a != r1b
        _post(url, {"query": "CLOSE p1; CLOSE p2"})
        assert sess._subscriptions == {} or all(
            s["node"].name != "hconc"
            for s in sess._subscriptions.values())
